/* Browser speech-to-text for the chat UI.
 *
 * Counterpart of the reference's browser ASR stack (reference:
 * infer/web/asr.js:1-340 + whisper_worker.js — whisper.cpp WASM or a
 * FunASR server).  This environment cannot ship model blobs (no
 * network), so the default backend is the browser's built-in
 * SpeechRecognition API; a custom recognizer (e.g. a whisper.cpp WASM
 * worker) can be plugged in via NanoASR.setBackend() without touching
 * the UI.
 *
 * Usage:
 *   NanoASR.available()                 -> bool
 *   NanoASR.start(onText, onState)      -> begin push-to-talk capture
 *   NanoASR.stop()                      -> finish; onText(final) fires
 *   NanoASR.setBackend({start, stop})   -> swap in a custom engine
 */
"use strict";

const NanoASR = (() => {
  let backend = null;
  let active = false;

  function webSpeechBackend() {
    const SR = window.SpeechRecognition || window.webkitSpeechRecognition;
    if (!SR) return null;
    let rec = null;
    return {
      name: "webspeech",
      start(onText, onState, lang) {
        rec = new SR();
        rec.lang = lang || navigator.language || "zh-CN";
        rec.continuous = true;
        rec.interimResults = true;
        let finalText = "";
        rec.onresult = ev => {
          let interim = "";
          for (let i = ev.resultIndex; i < ev.results.length; i++) {
            const r = ev.results[i];
            if (r.isFinal) finalText += r[0].transcript;
            else interim += r[0].transcript;
          }
          onText(finalText + interim, false);
        };
        rec.onend = () => { onState("idle"); onText(finalText, true); };
        rec.onerror = e => onState("error: " + e.error);
        rec.start();
        onState("listening");
      },
      stop() { if (rec) rec.stop(); },
    };
  }

  return {
    available() {
      return !!(backend || webSpeechBackend());
    },
    setBackend(b) { backend = b; },
    start(onText, onState, lang) {
      if (active) return;
      if (!backend) backend = webSpeechBackend();
      if (!backend) { onState("no ASR backend in this browser"); return; }
      active = true;
      backend.start(onText, s => {
        if (s === "idle") active = false;
        onState(s);
      }, lang);
    },
    stop() {
      if (backend && active) backend.stop();
      active = false;
    },
  };
})();
if (typeof self !== "undefined") self.NanoASR = NanoASR;
