/* WebWorker wrapper for the NanoJS engine (web/nano_infer.js).
 *
 * Counterpart of the reference's worker (reference:
 * infer/web/nano_worker.js:105-330), driving our pure-JS engine instead
 * of a WASM build (no wasm toolchain in this environment; the JS engine
 * covers F32/Q80/Q4K .bin files).
 *
 * Protocol (postMessage):
 *   -> {type:"init", buffer}            model .bin ArrayBuffer
 *   -> {type:"lora", buffer|null}       hot-swap / unload LoRA
 *   -> {type:"generate", id, prompt, opts}
 *   -> {type:"abort"}
 *   <- {type:"ready", config}           after init
 *   <- {type:"token", id, tokenId, text}
 *   <- {type:"done", id, nTokens}
 *   <- {type:"error", message}
 */
"use strict";
importScripts("nano_infer.js");

let engine = null;
let aborted = false;

self.onmessage = async (ev) => {
  const msg = ev.data;
  try {
    if (msg.type === "init") {
      engine = new NanoJS.Engine(msg.buffer, msg.opts || {});
      const c = engine.cfg;
      self.postMessage({ type: "ready", config: {
        nLayer: c.nLayer, nEmbd: c.nEmbd, nHead: c.nHead,
        vocabSize: c.vocabSize, blockSize: c.blockSize,
        quantType: c.quantType } });
    } else if (msg.type === "lora") {
      if (!engine) throw new Error("init first");
      if (msg.buffer) engine.loadLora(msg.buffer);
      else engine.unloadLora();
      self.postMessage({ type: "lora_ok", loaded: !!msg.buffer });
    } else if (msg.type === "generate") {
      if (!engine) throw new Error("init first");
      aborted = false;
      let n = 0;
      for await (const tok of engine.generate(msg.prompt, msg.opts || {})) {
        if (aborted) break;
        self.postMessage({ type: "token", id: msg.id, tokenId: tok.id,
                           text: tok.text });
        n++;
      }
      self.postMessage({ type: "done", id: msg.id, nTokens: n });
    } else if (msg.type === "abort") {
      aborted = true;
      if (engine) engine.abort();
    }
  } catch (e) {
    self.postMessage({ type: "error", message: String(e && e.message || e) });
  }
};
