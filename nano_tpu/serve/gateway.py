"""HF-model gateway: serve any transformers causal-LM over the same
WebSocket protocol as the TPU engine.

Parity with the reference's "Mio" gateway (reference: infer/web/server.py
— a flask-socketio bridge to llama.cpp/HF models with streaming via
TextIteratorStreamer and model hot-swap): the browser UI (web/index.html)
can point at either this gateway or the TPU server interchangeably.

    python -m nano_tpu.serve.gateway --model /path/to/hf_model --port 8081

Streaming uses transformers' TextIteratorStreamer on a worker thread; one
generation at a time per model (HF generate is not batched-reentrant),
queued requests wait.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import logging
import threading

logger = logging.getLogger("nano_tpu.gateway")


class HFGateway:
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

        def run():
            try:
                self.model.generate(**kwargs)
            except Exception as e:     # surface through the streamer
                err.append(e)
                streamer.end()
        thread = threading.Thread(target=run, daemon=True)
        thread.start()
        return streamer, err

    async def handle(self, websocket):
        async for message in websocket:
            try:
                req = json.loads(message) if message.lstrip().startswith("{") \
                    else {"prompt": message[5:5 + int(message[:5])]}
                async with self.lock:
                    streamer, err = self._generate_stream(
                        req.get("prompt", ""), bool(req.get("template", True)),
                        int(req.get("max_new_tokens", 256)),
                        float(req.get("temperature", 1.0)),
                        float(req.get("top_p", 0.8)),
                        float(req.get("repetition_penalty", 1.05)))
                    loop = asyncio.get_running_loop()
                    it = iter(streamer)
                    while True:
                        piece = await loop.run_in_executor(
                            None, lambda: next(it, None))
                        if piece is None:
                            break
                        if piece:
                            await websocket.send(json.dumps(
                                {"text": piece}, ensure_ascii=False))
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


async def serve(model_path: str, host: str, port: int, device: str,
                dtype: str):
    import websockets
    gw = HFGateway(model_path, device=device, dtype=dtype)
    async with websockets.serve(gw.handle, host, port, max_size=2 ** 22):
        logger.info("HF gateway on ws://%s:%d (%s)", host, port, model_path)
        await asyncio.Future()


def main():
    ap = argparse.ArgumentParser(description="HF-model WebSocket gateway")
    ap.add_argument("--model", required=True, help="HF model path/name")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    asyncio.run(serve(args.model, args.host, args.port, args.device,
                      args.dtype))


if __name__ == "__main__":
    main()
