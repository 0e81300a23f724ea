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
 * Two built-in backends:
 *   webspeech  — the browser's SpeechRecognition API (vendor service)
 *   server     — OFFLINE: stream mic PCM to the self-hosted voice
 *                bridge (nano_tpu/serve/voice_ws.py), which runs the
 *                same pluggable recognizers as the appliance FIFO loop
 *                (sherpa / local HF whisper / the DSP morse decoder).
 *                NanoASR.useServer("ws://host:8790") switches to it.
 *
 * Usage:
 *   NanoASR.available()                 -> bool
 *   NanoASR.start(onText, onState)      -> begin push-to-talk capture
 *   NanoASR.stop()                      -> finish; onText(final) fires
 *   NanoASR.setBackend({start, stop})   -> swap in a custom engine
 *   NanoASR.useServer(url)              -> offline voice-bridge backend
 */
"use strict";

const NanoASR = (() => {
  let backend = null;
  let active = false;

  // offline backend: mic -> 16 kHz s16le PCM -> voice_ws.py -> text
  function serverBackend(url) {
    let ws = null, ctx = null, node = null, stream = null;
    let stopRequested = false;   // stop() raced an in-flight start()
    const RATE = 16000;
    async function cleanup() {
      if (node) { try { node.disconnect(); } catch (e) {} node = null; }
      if (ctx) { try { await ctx.close(); } catch (e) {} ctx = null; }
      if (stream) {
        stream.getTracks().forEach(t => t.stop());
        stream = null;
      }
    }
    return {
      name: "server",
      async start(onText, onState) {
        stopRequested = false;
        try {
          ws = new WebSocket(url);
          ws.binaryType = "arraybuffer";
          await new Promise((res, rej) => {
            ws.onopen = res;
            ws.onerror = () => rej(new Error("voice bridge unreachable"));
          });
          // bridge dies / hangs up without a transcript: never leave
          // the mic hot waiting for a reply that cannot come
          ws.onclose = async () => { await cleanup(); onState("idle"); };
          ws.onmessage = async ev => {
            if (typeof ev.data !== "string") return;
            const m = JSON.parse(ev.data);
            if (m.type === "asr") { onText(m.text || "", true); onState("idle"); }
            else if (m.type === "error") onState("error: " + m.error);
            ws.onclose = null;        // normal end: keep the final state
            ws.close();
            await cleanup();
          };
          stream = await navigator.mediaDevices.getUserMedia({ audio: true });
          // let the AudioContext resample the mic to the wire rate
          ctx = new AudioContext({ sampleRate: RATE });
          const src = ctx.createMediaStreamSource(stream);
          node = ctx.createScriptProcessor(4096, 1, 1);
          node.onaudioprocess = ev => {
            if (!ws || ws.readyState !== WebSocket.OPEN) return;
            const f32 = ev.inputBuffer.getChannelData(0);
            const i16 = new Int16Array(f32.length);
            for (let i = 0; i < f32.length; i++) {
              const s = Math.max(-1, Math.min(1, f32[i]));
              i16[i] = s < 0 ? s * 0x8000 : s * 0x7fff;
            }
            ws.send(i16.buffer);
          };
          src.connect(node);
          node.connect(ctx.destination);   // keep the node pulled
          ws.send(JSON.stringify({ type: "start", rate: RATE }));
          if (stopRequested) {      // user hit stop during connect/mic
            ws.send(JSON.stringify({ type: "stop" }));
            onState("processing");
            return;
          }
          onState("listening");
        } catch (e) {
          await cleanup();
          onState("error: " + (e && e.message ? e.message : e));
        }
      },
      stop() {
        if (ws && ws.readyState === WebSocket.OPEN)
          ws.send(JSON.stringify({ type: "stop" }));
        else
          stopRequested = true;   // start() is mid-flight: it stops on
        // arrival; socket + audio close once the transcript (or close)
        // event fires
      },
    };
  }

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
    useServer(url) { backend = serverBackend(url); },
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
