/* Runtime parity harness for the pure-JS engine (web/nano_infer.js).
 *
 * Runs under ANY modern JS runtime with Node-style fs (node >= 16, bun,
 * deno with --allow-read).  Consumes the golden fixtures produced by
 * tools/make_js_fixtures.py (committed in tests/js/fixtures/), whose
 * expected values come from the Python engine — itself asserted equal to
 * the reference C engine by tests/test_cross_engine.py.
 *
 *   node tests/js/run_parity.mjs          (from the repo root)
 *
 * Checks, strongest last:
 *   1. unit vectors: nearestInt, quantQ80Act, quantQ4KAct (bit-exact
 *      integer decisions), readQ4KFrame decode, matvecQ4K (incl. a
 *      DOCTORED nonzero pad nibble a correct kernel must ignore)
 *   2. tokenizer encode parity (plain + instruct template)
 *   3. greedy token ids: f32 / q80 / q4k / f32+template / f32+LoRA
 */

import { readFileSync } from "node:fs";
import { createRequire } from "node:module";
import { fileURLToPath } from "node:url";
import { dirname, join } from "node:path";

const here = dirname(fileURLToPath(import.meta.url));
const require = createRequire(import.meta.url);
const NanoJS = require(join(here, "..", "..", "web", "nano_infer.js"));
const FIX = join(here, "fixtures");

const expected = JSON.parse(readFileSync(join(FIX, "expected.json"), "utf8"));
const U = expected.units;
const I = NanoJS._internals;

let failures = 0;
function check(name, ok, detail = "") {
  if (ok) { console.log(`ok   ${name}`); }
  else { failures++; console.error(`FAIL ${name} ${detail}`); }
}
function arrEq(a, b) {
  if (a.length !== b.length) return false;
  for (let i = 0; i < a.length; i++) if (a[i] !== b[i]) return false;
  return true;
}
function b64bytes(s) {
  if (typeof Buffer !== "undefined")
    return new Uint8Array(Buffer.from(s, "base64"));
  return Uint8Array.from(atob(s), c => c.charCodeAt(0));
}
function loadBin(name) {
  const b = readFileSync(join(FIX, name));
  return b.buffer.slice(b.byteOffset, b.byteOffset + b.byteLength);
}

// ------------------------------------------------------ 1. unit vectors

{
  const { x, y } = U.nearest_int;
  const got = x.map(NanoJS.nearestInt);
  check("nearestInt", arrEq(got, y), `got=${got} want=${y}`);
}

{
  const { x, gs, q, s } = U.quant_q80_act;
  const xq = new Int8Array(x.length), xs = new Float32Array(x.length / gs);
  I.quantQ80Act(Float32Array.from(x), x.length, gs, xq, xs);
  check("quantQ80Act values", arrEq(Array.from(xq), q));
  check("quantQ80Act scales", arrEq(Array.from(xs), s.map(Math.fround)));
}

for (const n of [64, 256]) {
  const { x, npad, v, s, b } = U[`quant_q4k_act_${n}`];
  const xv = new Uint8Array(npad), xs = new Float32Array(npad >> 5),
        xb = new Float32Array(npad >> 5);
  I.quantQ4KAct(Float32Array.from(x), n, npad, xv, xs, xb);
  check(`quantQ4KAct(${n}) values`, arrEq(Array.from(xv), v));
  check(`quantQ4KAct(${n}) s_eff`, arrEq(Array.from(xs), s.map(Math.fround)));
  check(`quantQ4KAct(${n}) b_eff`, arrEq(Array.from(xb), b.map(Math.fround)));
}

{
  // readQ4KFrame: nibble + 6-bit scale decode, bit-exact
  const { frame_b64, shape, v, s, b } = U.q4k_frame;
  const bytes = b64bytes(frame_b64);
  const buf = bytes.buffer.slice(bytes.byteOffset,
                                 bytes.byteOffset + bytes.byteLength);
  const r = new I.Reader(buf, 0);
  const { data, shape: gotShape } = I.readQ4KFrame(r);
  check("readQ4KFrame shape", arrEq(gotShape, shape));
  check("readQ4KFrame values", arrEq(Array.from(data.v), v));
  check("readQ4KFrame scales", arrEq(Array.from(data.s), s.map(Math.fround)));
  check("readQ4KFrame biases", arrEq(Array.from(data.b), b.map(Math.fround)));
}

{
  // matvecQ4K over a weight whose PAD nibbles are doctored nonzero —
  // a kernel that reads past the line length gets this wrong
  const { w_blocks_b64, n, n_out, xv, xs, xb, y, y_rtol } = U.matvec_q4k;
  const raw = b64bytes(w_blocks_b64);
  const nbpl = Math.ceil(n / 256), npad = nbpl * 256;
  // unpack blocks exactly like readQ4KFrame does (shared layout)
  const v = new Uint8Array(n_out * npad);
  const s = new Float32Array(n_out * (npad >> 5));
  const b = new Float32Array(n_out * (npad >> 5));
  const dv = new DataView(raw.buffer, raw.byteOffset, raw.byteLength);
  for (let blk = 0; blk < n_out * nbpl; blk++) {
    const p = blk * 160;
    const row = (blk / nbpl) | 0, blkInRow = blk % nbpl;
    const sScale = dv.getFloat32(p + 12, true);
    const sBias = dv.getFloat32(p + 16, true);
    const gBase = row * (npad >> 5) + blkInRow * 8;
    for (let g = 0; g < 4; g++) {
      const sb0 = raw[p + 20 + g], sb4 = raw[p + 24 + g], sb8 = raw[p + 28 + g];
      s[gBase + g] = Math.fround((sb0 & 0x3f) * sScale);
      s[gBase + g + 4] = Math.fround(((((sb0 >> 6) << 4) | (sb8 & 0x0f)) & 0x3f) * sScale);
      b[gBase + g] = Math.fround((sb4 & 0x3f) * sBias);
      b[gBase + g + 4] = Math.fround(((((sb4 >> 6) << 4) | (sb8 >> 4)) & 0x3f) * sBias);
    }
    const base = row * npad + blkInRow * 256;
    for (let i = 0; i < 128; i++) {
      const byte = raw[p + 32 + i];
      v[base + 2 * i] = byte & 0x0f;
      v[base + 2 * i + 1] = byte >> 4;
    }
  }
  const W = { kind: "q4k", v, s, b, n, npad };
  const out = new Float32Array(n_out);
  I.matvecQ4K(out, W, Uint8Array.from(xv), Float32Array.from(xs),
              Float32Array.from(xb), n_out);
  const maxAbs = Math.max(1, ...y.map(Math.abs));
  const bad = [];
  for (let i = 0; i < n_out; i++)
    if (Math.abs(out[i] - y[i]) > y_rtol * maxAbs) bad.push(i);
  check("matvecQ4K (doctored pads)", bad.length === 0,
        `got=${Array.from(out)} want=${y}`);
}

// ------------------------------------------------- 2. tokenizer parity

const engF32 = new NanoJS.Engine(loadBin("tiny_f32.bin"),
                                 { maxSeqLen: 64,
                                   normEps: expected.config.norm_eps });
check("tokenizer encode",
      arrEq(engF32.tokenizer.encode(expected.prompt), expected.prompt_ids));
check("tokenizer encode (template)",
      arrEq(engF32.tokenizer.encode(
                NanoJS.applyInstructTemplate(expected.prompt)),
            expected.template_ids));

// -------------------------------------------------- 3. greedy token ids

function greedyCheck(name, engine, opts = {}) {
  const got = engine.greedy(expected.prompt, 16, opts.template || false);
  const want = expected.greedy[name];
  check(`greedy ${name}`, arrEq(got, want), `got=${got} want=${want}`);
}

greedyCheck("f32", engF32);
greedyCheck("f32_template", engF32, { template: true });
engF32.loadLora(loadBin("tiny_lora.bin"));
greedyCheck("f32_lora", engF32);
engF32.unloadLora();

for (const quant of ["q80", "q4k"]) {
  const eng = new NanoJS.Engine(loadBin(`tiny_${quant}.bin`),
                                { maxSeqLen: 64,
                                  normEps: expected.config.norm_eps });
  greedyCheck(quant, eng);
}

console.log(failures === 0 ? "ALL PASS" : `${failures} FAILURES`);
process.exit(failures === 0 ? 0 : 1);
