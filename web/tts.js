/* Browser text-to-speech for the chat UI.
 *
 * Counterpart of the reference's in-browser TTS (reference:
 * infer/web/tts.js:1-193 + piper_worker.js — Piper WASM).  Default
 * backend is the browser's speechSynthesis (no model blobs needed); a
 * Piper-style worker can be plugged in via NanoTTS.setBackend().
 *
 * Streams sentence-by-sentence like the reference: feed() accumulates
 * decoded text and speaks each completed sentence, so speech starts
 * while the model is still generating (reference tts.js sentence split).
 */
"use strict";

const NanoTTS = (() => {
  let backend = null;
  let buffer = "";
  let enabled = false;
  const SENTENCE_END = /[。！？!?.;；\n]/;

  // offline backend: text -> voice bridge (nano_tpu/serve/voice_ws.py)
  // -> WAV bytes -> AudioContext playback.  Fully self-hosted; the
  // bridge's synthesizer is pluggable (morse DSP by default).
  function serverBackend(url) {
    let ctx = null;
    let queue = Promise.resolve();
    let gen = 0;   // bumped by cancel(): utterances queued (or still in
                   // flight to the bridge) before the bump never play —
                   // their chain continuations and late WAV replies
                   // check the generation and no-op
    function play(buf, g) {
      queue = queue.then(() => new Promise(res => {
        if (g !== gen) return res();       // cancelled while queued
        if (!ctx) ctx = new (window.AudioContext || window.webkitAudioContext)();
        ctx.decodeAudioData(buf.slice(0), decoded => {
          if (g !== gen) return res();     // cancelled while decoding
          const src = ctx.createBufferSource();
          src.buffer = decoded;
          src.connect(ctx.destination);
          src.onended = res;
          src.start();
        }, () => res());
      }));
    }
    return {
      name: "server",
      speak(text) {
        const g = gen;
        const ws = new WebSocket(url);
        ws.binaryType = "arraybuffer";
        ws.onopen = () => ws.send(JSON.stringify({ type: "tts", text }));
        ws.onmessage = ev => {
          if (typeof ev.data === "string") return;   // header frame
          play(ev.data, g);
          ws.close();
        };
      },
      cancel() {
        gen++;
        queue = Promise.resolve();
        if (ctx) { ctx.close(); ctx = null; }
      },
    };
  }

  function synthBackend() {
    if (typeof speechSynthesis === "undefined") return null;
    return {
      name: "speechsynthesis",
      speak(text, lang) {
        const u = new SpeechSynthesisUtterance(text);
        u.lang = lang || navigator.language || "zh-CN";
        speechSynthesis.speak(u);
      },
      cancel() { speechSynthesis.cancel(); },
    };
  }

  function flush(force) {
    if (!backend || !enabled) return;
    for (;;) {
      const m = buffer.match(SENTENCE_END);
      if (!m) break;
      const end = m.index + m[0].length;
      const sentence = buffer.slice(0, end).trim();
      buffer = buffer.slice(end);
      if (sentence) backend.speak(sentence);
    }
    if (force && buffer.trim()) {
      backend.speak(buffer.trim());
      buffer = "";
    }
  }

  return {
    available() { return !!(backend || synthBackend()); },
    setBackend(b) { backend = b; },
    useServer(url) { backend = serverBackend(url); },
    setEnabled(on) {
      enabled = on;
      if (!backend) backend = synthBackend();
      if (!on && backend) { backend.cancel(); buffer = ""; }
    },
    get enabled() { return enabled; },
    feed(text) {                      // call per streamed token/chunk
      if (!enabled) return;
      buffer += text;
      flush(false);
    },
    finish() { flush(true); },        // end of reply: speak the tail
    cancel() {
      if (backend) backend.cancel();
      buffer = "";
    },
  };
})();
if (typeof self !== "undefined") self.NanoTTS = NanoTTS;
