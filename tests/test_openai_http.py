"""OpenAI-compatible HTTP frontend tests (serve/openai_http.py).

The REST adapter rides the same continuous-batching core as the
WebSocket server, so these focus on protocol shape, streaming/stop
semantics, and chat-template construction; engine numerics are covered
by test_serve.py / test_engine.py.
"""

import asyncio
import json

import pytest

from nano_tpu.tokenizer import bpe
from .test_serve import make_ctx

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402


def _make_client(tmp_path, **kw):
    from nano_tpu.serve.wss import WSServer
    from nano_tpu.serve.openai_http import OpenAIServer
    ctx = make_ctx(tmp_path, **kw)
    pool = WSServer(ctx, n_slots=4, template=True, model_name="toy.bin")
    return TestClient(TestServer(OpenAIServer(pool).app()))


GREEDY = {"temperature": 0.0, "repetition_penalty": 1.0}


async def _sse_events(resp):
    events = []
    async for line in resp.content:
        line = line.decode().strip()
        if not line.startswith("data: "):
            continue
        body = line[len("data: "):]
        if body == "[DONE]":
            events.append(None)
            break
        events.append(json.loads(body))
    return events


def test_models_and_chat_completion(tmp_path):
    async def run():
        client = _make_client(tmp_path)
        await client.start_server()
        try:
            r = await client.get("/v1/models")
            assert r.status == 200
            m = await r.json()
            assert m["data"][0]["id"] == "toy.bin"

            req = {"messages": [{"role": "user", "content": "abc"}],
                   "max_tokens": 8, **GREEDY}
            r = await client.post("/v1/chat/completions", json=req)
            assert r.status == 200
            out = await r.json()
            assert out["object"] == "chat.completion"
            assert out["id"].startswith("chatcmpl-")
            ch = out["choices"][0]
            assert ch["message"]["role"] == "assistant"
            assert ch["finish_reason"] in ("stop", "length")
            assert out["usage"]["completion_tokens"] >= 1
            assert (out["usage"]["total_tokens"]
                    == out["usage"]["prompt_tokens"]
                    + out["usage"]["completion_tokens"])

            # greedy determinism across requests
            r2 = await client.post("/v1/chat/completions", json=req)
            out2 = await r2.json()
            assert out2["choices"][0]["message"]["content"] \
                == ch["message"]["content"]
            return ch["message"]["content"]
        finally:
            await client.close()

    content = asyncio.run(run())
    assert isinstance(content, str)


def test_completions_stream_matches_oneshot(tmp_path):
    async def run():
        client = _make_client(tmp_path)
        await client.start_server()
        try:
            req = {"prompt": "abcd", "max_tokens": 10, **GREEDY}
            r = await client.post("/v1/completions", json=req)
            assert r.status == 200
            full = (await r.json())["choices"][0]["text"]

            r = await client.post("/v1/completions",
                                  json={**req, "stream": True})
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            events = await _sse_events(r)
            assert events[-1] is None          # [DONE]
            fin = events[-2]
            assert fin["choices"][0]["finish_reason"] in ("stop", "length")
            streamed = "".join(e["choices"][0]["text"]
                               for e in events[:-2])
            assert streamed == full

            # chat streaming: role handshake first, deltas after
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "ab"}],
                "max_tokens": 6, "stream": True, **GREEDY})
            events = await _sse_events(r)
            assert events[0]["choices"][0]["delta"] == {"role": "assistant"}
            assert events[0]["object"] == "chat.completion.chunk"
            assert events[-1] is None
            text = "".join(e["choices"][0]["delta"].get("content", "")
                           for e in events[1:-2])
            assert len(text) > 0
        finally:
            await client.close()

    asyncio.run(run())


def test_stop_sequences(tmp_path):
    async def run():
        client = _make_client(tmp_path)
        await client.start_server()
        try:
            base = {"prompt": "abcd", "max_tokens": 12, **GREEDY}
            r = await client.post("/v1/completions", json=base)
            full = (await r.json())["choices"][0]["text"]
            assert len(full) >= 4
            stop = full[2:4]        # a substring the output provably hits

            r = await client.post("/v1/completions",
                                  json={**base, "stop": stop})
            body = await r.json()
            out = body["choices"][0]
            assert out["text"] == full[:full.find(stop)]
            assert out["finish_reason"] == "stop"
            # usage reflects what was GENERATED before the stop match —
            # the stream is abandoned at the hit, not run to max_tokens
            # and truncated after the fact
            used = body["usage"]["completion_tokens"]
            assert 1 <= used <= full.find(stop) + len(stop) + 2
            assert used < base["max_tokens"]

            # streamed: same truncation even when the stop string spans
            # token boundaries (scanner holds back len(stop)-1 chars)
            r = await client.post("/v1/completions",
                                  json={**base, "stop": [stop],
                                        "stream": True})
            events = await _sse_events(r)
            streamed = "".join(e["choices"][0]["text"]
                               for e in events[:-2])
            assert streamed == full[:full.find(stop)]
        finally:
            await client.close()

    asyncio.run(run())


def test_validation_and_concurrency(tmp_path):
    async def run():
        client = _make_client(tmp_path)
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "x"}], "n": 2})
            assert r.status == 400
            assert (await r.json())["error"]["type"] \
                == "invalid_request_error"
            r = await client.post("/v1/chat/completions",
                                  json={"messages": []})
            assert r.status == 400
            r = await client.post("/v1/completions",
                                  json={"prompt": ["a", "b"]})
            assert r.status == 400

            # several concurrent requests share the slot pool
            async def one(p):
                rr = await client.post("/v1/completions", json={
                    "prompt": p, "max_tokens": 6, **GREEDY})
                return (await rr.json())["choices"][0]["text"]

            outs = await asyncio.gather(*[one(p) for p in
                                          ("ab", "cd", "ef", "gh", "ij")])
            assert all(isinstance(o, str) and o for o in outs)

            # serving metrics reflect the completed work
            r = await client.get("/stats")
            st = await r.json()
            assert st["model"] == "toy.bin"
            assert st["requests_total"] >= 5
            assert st["tokens_total"] >= 5
            assert st["slots_active"] == 0
            assert st["tok_s_60s"] > 0
        finally:
            await client.close()

    asyncio.run(run())


def test_wss_stats_verb(tmp_path):
    """{"stats": true} over the WebSocket returns the same metrics."""
    websockets = pytest.importorskip("websockets")
    from nano_tpu.serve.wss import WSServer

    ctx = make_ctx(tmp_path)

    async def run():
        server = WSServer(ctx, n_slots=2, template=False,
                          model_name="toy.bin")
        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = list(srv.sockets)[0].getsockname()[1]
            import websockets as wslib
            async with wslib.connect(f"ws://127.0.0.1:{port}") as c:
                await c.send(json.dumps({"prompt": "abc", "template": False,
                                         "max_new_tokens": 5,
                                         "temperature": 0.0,
                                         "repetition_penalty": 1.0}))
                while True:
                    m = json.loads(await asyncio.wait_for(c.recv(), 120))
                    if m.get("done"):
                        break
                await c.send(json.dumps({"stats": True}))
                st = json.loads(await asyncio.wait_for(c.recv(), 60))
                assert st["model"] == "toy.bin"
                assert st["requests_total"] == 1
                assert st["tokens_total"] >= 1
                assert st["slots_total"] == 2

    asyncio.run(run())


def test_build_chat_ids_nano_multiturn(tmp_path):
    """Nano arch renders one instruct/response pair per exchange (the
    training format, reference data.py:170-178), folding a system
    message into the next user question."""
    ctx = make_ctx(tmp_path)
    msgs = [{"role": "system", "content": "sys"},
            {"role": "user", "content": "ab"},
            {"role": "assistant", "content": "cd"},
            {"role": "user", "content": "ef"}]
    expect = ctx.encode("<|instruct_mark|>sys\nab<|response_mark|>"
                        "cd<|eos|><|instruct_mark|>ef<|response_mark|>")
    assert ctx.build_chat_ids(msgs) == expect


def test_openai_multi_adapter_routing(tmp_path):
    """The REST surface routes by "model" to a served LoRA variant;
    unknown ids fall through to the base (OpenAI clients often send
    arbitrary model names)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nano_tpu.io import binfmt as bf
    from nano_tpu.models import gpt as gptm
    from nano_tpu.serve.wss import WSServer
    from nano_tpu.serve.openai_http import OpenAIServer

    ctx = make_ctx(tmp_path)
    rng = np.random.RandomState(0)
    lora = gptm.init_lora_params(jax.random.PRNGKey(9), ctx.cfg, rank=4)
    lora = jax.tree.map(lambda x: jnp.asarray(
        rng.randn(*x.shape).astype(np.float32) * 0.3), lora)
    lora_path = str(tmp_path / "l.bin")
    bf.write_lora(lora_path, lora, ctx.cfg, rank=4, alpha=32)

    async def run():
        pool = WSServer(ctx, n_slots=2, template=False, model_name="base",
                        adapters={"tuned": lora_path})
        client = TestClient(TestServer(OpenAIServer(pool).app()))
        await client.start_server()
        try:
            r = await client.get("/v1/models")
            ids = [m["id"] for m in (await r.json())["data"]]
            assert ids == ["base", "tuned"]

            async def text(**extra):
                rr = await client.post("/v1/completions", json={
                    "prompt": "abcd", "max_tokens": 8, **GREEDY, **extra})
                return (await rr.json())["choices"][0]["text"]

            base = await text()
            tuned = await text(model="tuned")
            assert base != tuned
            # unknown ids fall through to base rather than erroring
            assert await text(model="gpt-4o") == base
        finally:
            await client.close()

    asyncio.run(run())


def test_stream_decoder_utf8_boundaries():
    """Byte-level BPE tokens ending mid-character stream without U+FFFD:
    the incremental decoder holds incomplete tails until they complete
    (used by both the WS handler and the SSE stream)."""
    from nano_tpu.infer.engine import StreamDecoder

    raw = "你好".encode()                      # 6 bytes, 2 chars
    tok = bpe.BpeTokenizer([raw[:2], raw[2:4], raw[4:]], [0.0] * 3)
    d = StreamDecoder(tok)
    pieces = [d.feed(i) for i in range(3)] + [d.flush()]
    assert "".join(pieces) == "你好"
    assert all("�" not in p for p in pieces)
    # the naive per-token decode this replaces WOULD mangle it
    assert "�" in tok.decode([0])
    # a stream ending mid-character flushes the replacement char
    d2 = StreamDecoder(tok)
    assert d2.feed(0) == ""
    assert d2.flush() == "�"


def test_bpe_chat_template_messages_structure():
    """Canonical Qwen block structure for multi-turn messages (the
    single-turn prefix must agree with apply_chat_template, reference
    infer/tokenizer.c:214-262)."""
    class _FakeQwenBpe(bpe.BpeTokenizer):
        def __init__(self):
            self.vocab_size = 200000       # control ids in range

        def encode(self, s):               # one fake id per char
            return [1000 + ord(c) for c in s]

    tok = _FakeQwenBpe()
    single = tok.apply_chat_template("hi")
    multi = tok.apply_chat_template_messages(
        [{"role": "user", "content": "hi"}])
    # the messages variant encodes the role word where the single-turn
    # path uses the canonical id; both otherwise agree
    assert multi == ([bpe.QWEN_IM_START] + tok.encode("user")
                     + single[2:])
    two = tok.apply_chat_template_messages(
        [{"role": "system", "content": "s"},
         {"role": "user", "content": "hi"}])
    assert two[:1] == [bpe.QWEN_IM_START]
    assert two.count(bpe.QWEN_IM_END) == 2
    assert two[-6:] == [bpe.QWEN_THINK_OPEN, bpe.QWEN_NEWLINE,
                        bpe.QWEN_NEWLINE, bpe.QWEN_THINK_CLOSE,
                        bpe.QWEN_NEWLINE, bpe.QWEN_NEWLINE]


def test_stop_completed_in_flush_tail_reports_stop(tmp_path, monkeypatch):
    """A stop sequence that only materializes when the UTF-8 stream
    decoder flushes its held-back tail must still report
    finish_reason="stop" (the text IS truncated either way — reason and
    truncation must agree)."""

    class HoldAll:
        """Decoder that emits nothing until flush — the extreme case of
        a held-back multi-byte tail."""
        def __init__(self, tok):
            self.tok = tok
            self.toks = []

        def feed(self, t):
            self.toks.append(t)
            return ""

        def flush(self):
            out = self.tok.decode(self.toks)
            self.toks = []
            return out

    async def run():
        client = _make_client(tmp_path)
        await client.start_server()
        try:
            base = {"prompt": "abcd", "max_tokens": 6, **GREEDY}
            r = await client.post("/v1/completions", json=base)
            full = (await r.json())["choices"][0]["text"]
            stop = full[2:4]
            idx = full.find(stop)

            # now hold the whole reply back until the flush
            from nano_tpu.infer.engine import LLMContext
            monkeypatch.setattr(LLMContext, "stream_decoder",
                                lambda self: HoldAll(self.tokenizer))
            for stream in (False, True):
                r = await client.post(
                    "/v1/completions",
                    json={**base, "stop": stop, "stream": stream})
                if stream:
                    events = await _sse_events(r)
                    text = "".join(e["choices"][0]["text"]
                                   for e in events[:-2])
                    reason = events[-2]["choices"][0]["finish_reason"]
                else:
                    out = (await r.json())["choices"][0]
                    text, reason = out["text"], out["finish_reason"]
                assert text == full[:idx]
                assert reason == "stop"      # pre-fix: "length"
        finally:
            await client.close()

    asyncio.run(run())
