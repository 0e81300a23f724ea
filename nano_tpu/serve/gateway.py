"""Model gateway: serve transformers causal-LMs OR llama.cpp GGUF models
over the same WebSocket protocol as the TPU engine.

Parity with the reference's "Mio" gateway (reference: infer/web/server.py
— a flask-socketio bridge to llama.cpp/HF models with streaming via
TextIteratorStreamer and model hot-swap): the browser UI (web/index.html)
can point at either this gateway or the TPU server interchangeably.

    python -m nano_tpu.serve.gateway --model /path/to/hf_model --port 8081
    python -m nano_tpu.serve.gateway --model model.gguf        # llama.cpp

The backend is picked by file extension (`.gguf` -> llama.cpp, anything
else -> transformers) or forced with --backend.  The GGUF path needs
llama-cpp-python installed (reference: infer/web/server.py:211-256 uses
the same library); without it the gateway refuses with a clear error
instead of importing lazily mid-request.

Streaming runs on a worker thread; one generation at a time per model
(neither HF generate nor llama.cpp is batched-reentrant), queued
requests wait.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import threading

logger = logging.getLogger("nano_tpu.gateway")


class _Gateway:
    """Shared WebSocket protocol; subclasses provide _generate_stream
    returning (iterator-of-text-pieces, error-list)."""

    MAX_NEW_TOKENS = 65536     # cap unvalidated client requests

    async def handle(self, websocket):
        async for message in websocket:
            try:
                if isinstance(message, bytes):     # binary frames carry
                    message = message.decode(      # the same protocols
                        "utf-8", errors="replace")
                req = json.loads(message) if message.lstrip().startswith("{") \
                    else {"prompt": message[5:5 + int(message[:5])]}
                async with self.lock:
                    streamer, err, stop = self._generate_stream(
                        req.get("prompt", ""), bool(req.get("template", True)),
                        min(int(req.get("max_new_tokens", 256)),
                            self.MAX_NEW_TOKENS),
                        float(req.get("temperature", 1.0)),
                        float(req.get("top_p", 0.8)),
                        float(req.get("repetition_penalty", 1.05)))
                    loop = asyncio.get_running_loop()
                    it = iter(streamer)
                    ended = False
                    try:
                        while True:
                            piece = await loop.run_in_executor(
                                None, lambda: next(it, None))
                            if piece is None:
                                ended = True
                                break
                            if piece:
                                await websocket.send(json.dumps(
                                    {"text": piece}, ensure_ascii=False))
                    finally:
                        if not ended:
                            # client went away mid-stream: the generation
                            # must not keep running after the lock frees
                            # (the next request would generate
                            # concurrently) — signal stop and drain the
                            # remaining pieces until the backend ends
                            stop()
                            await loop.run_in_executor(
                                None, lambda: all(False for _ in it))
                    if err:
                        raise err[0]
                    await websocket.send(json.dumps({"done": True,
                                                     "reason": "stop"}))
            except Exception as e:   # pragma: no cover - network edge
                logger.exception("gateway request failed")
                try:
                    await websocket.send(json.dumps({"error": str(e)}))
                except Exception:
                    break


class HFGateway(_Gateway):
    def __init__(self, model_path: str, device: str = "cpu",
                 dtype: str = "float32"):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer
        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForCausalLM.from_pretrained(
            model_path, torch_dtype=getattr(torch, dtype))
        self.model.eval().to(device)
        self.device = device
        self.lock = asyncio.Lock()      # one generation at a time

    def _generate_stream(self, prompt: str, template: bool,
                         max_new_tokens: int, temperature: float,
                         top_p: float, repetition_penalty: float):
        from transformers import TextIteratorStreamer
        tok = self.tokenizer
        if template and tok.chat_template:
            text = tok.apply_chat_template(
                [{"role": "user", "content": prompt}], tokenize=False,
                add_generation_prompt=True)
        else:
            text = prompt
        inputs = tok(text, return_tensors="pt").to(self.device)
        inputs = {k: v for k, v in inputs.items()
                  if k in ("input_ids", "attention_mask")}
        # timeout so a crashed generate thread cannot deadlock the stream
        streamer = TextIteratorStreamer(tok, skip_prompt=True,
                                        skip_special_tokens=True,
                                        timeout=300.0)
        pad_id = tok.eos_token_id
        if pad_id is None:
            pad_id = int(inputs["input_ids"][0, -1])
        kwargs = dict(**inputs, streamer=streamer,
                      max_new_tokens=max_new_tokens,
                      repetition_penalty=repetition_penalty,
                      pad_token_id=pad_id)
        if temperature and temperature > 0:
            kwargs.update(do_sample=True, temperature=temperature,
                          top_p=top_p)
        else:
            kwargs.update(do_sample=False)
        err: list = []
        stop_event = threading.Event()
        try:
            from transformers import StoppingCriteria, StoppingCriteriaList

            class _ClientGone(StoppingCriteria):
                def __call__(self, input_ids, scores, **kw):
                    return stop_event.is_set()

            kwargs["stopping_criteria"] = StoppingCriteriaList(
                [_ClientGone()])
        except ImportError:            # stubbed transformers in tests
            pass

        def run():
            try:
                self.model.generate(**kwargs)
            except Exception as e:     # surface through the streamer
                err.append(e)
                streamer.end()
        thread = threading.Thread(target=run, daemon=True)
        thread.start()
        return streamer, err, stop_event.set


class GGUFGateway(_Gateway):
    """llama.cpp backend: stream a local GGUF model (reference: the Mio
    server's llama-cpp-python path, infer/web/server.py:211-256)."""

    def __init__(self, model_path: str, n_ctx: int = 4096,
                 n_threads: int = 0, n_gpu_layers: int = 0):
        try:
            from llama_cpp import Llama
        except ImportError as e:
            raise RuntimeError(
                "GGUF backend needs llama-cpp-python (pip install "
                "llama-cpp-python); use an HF model path for the "
                "transformers backend") from e
        self.llama = Llama(model_path=model_path, n_ctx=n_ctx,
                           n_threads=n_threads or None,
                           n_gpu_layers=n_gpu_layers, verbose=False)
        self.lock = asyncio.Lock()

    def _generate_stream(self, prompt: str, template: bool,
                         max_new_tokens: int, temperature: float,
                         top_p: float, repetition_penalty: float):
        kwargs = dict(max_tokens=max_new_tokens,
                      temperature=max(temperature, 0.0), top_p=top_p,
                      repeat_penalty=repetition_penalty, stream=True)

        def pieces():
            if template:
                # GGUF metadata carries the chat template; llama.cpp
                # applies it (create_chat_completion)
                for chunk in self.llama.create_chat_completion(
                        [{"role": "user", "content": prompt}], **kwargs):
                    delta = chunk["choices"][0].get("delta", {})
                    if "content" in delta and delta["content"]:
                        yield delta["content"]
            else:
                for chunk in self.llama.create_completion(prompt, **kwargs):
                    text = chunk["choices"][0].get("text", "")
                    if text:
                        yield text

        gen = pieces()
        # llama.cpp's streaming generator is lazily driven — closing it
        # is the whole stop story (no background thread)
        return gen, [], gen.close


def make_gateway(model_path: str, backend: str = "auto", **kw):
    """Pick the backend: explicit --backend wins, else .gguf extension."""
    if backend == "auto":
        backend = "gguf" if model_path.endswith(".gguf") else "hf"
    if backend == "gguf":
        return GGUFGateway(model_path,
                           n_ctx=kw.get("n_ctx", 4096),
                           n_threads=kw.get("n_threads", 0),
                           n_gpu_layers=kw.get("n_gpu_layers", 0))
    if backend == "hf":
        return HFGateway(model_path, device=kw.get("device", "cpu"),
                         dtype=kw.get("dtype", "float32"))
    raise ValueError(f"unknown gateway backend: {backend!r}")


async def serve(model_path: str, host: str, port: int, **kw):
    import websockets
    gw = make_gateway(model_path, **kw)
    async with websockets.serve(gw.handle, host, port, max_size=2 ** 22):
        logger.info("%s gateway on ws://%s:%d (%s)",
                    type(gw).__name__, host, port, model_path)
        await asyncio.Future()


def main():
    ap = argparse.ArgumentParser(description="Model WebSocket gateway "
                                             "(transformers or llama.cpp)")
    ap.add_argument("--model", required=True,
                    help="HF model path/name or .gguf file")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "hf", "gguf"])
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--device", default="cpu", help="hf backend")
    ap.add_argument("--dtype", default="float32", help="hf backend")
    ap.add_argument("--n_ctx", type=int, default=4096, help="gguf backend")
    ap.add_argument("--n_threads", type=int, default=0, help="gguf backend")
    ap.add_argument("--n_gpu_layers", type=int, default=0,
                    help="gguf backend")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    asyncio.run(serve(args.model, args.host, args.port,
                      backend=args.backend, device=args.device,
                      dtype=args.dtype, n_ctx=args.n_ctx,
                      n_threads=args.n_threads,
                      n_gpu_layers=args.n_gpu_layers))


if __name__ == "__main__":
    main()
