/* NanoJS — pure-JavaScript inference engine for BD4SURLM .bin models.
 *
 * Capability parity with the reference's in-browser fallback engine
 * (reference: infer/web/infer.js:27-826), re-implemented fresh against
 * the published .bin format (reference README.md:239-255; parser
 * semantics mirror nano_tpu/io/binfmt.py and infer/infer.c:220-320):
 *   - model_type 0 (Nano) in F32, Q80 and Q4K — quantized weights STAY
 *     quantized and run the C engine's integer dots with quantized
 *     activations (beyond the reference JS, which is F32-only)
 *   - embedded trie tokenizer (greedy longest match)
 *   - KV-cached forward: RMSNorm, GQA attention, interleaved RoPE from
 *     the file's tables, SwiGLU
 *   - LoRA .bin hot-swap (type 10)
 *   - samplers: argmax / multinomial / top-k / top-p with repetition
 *     penalty; xorshift64* RNG for reproducibility
 *
 * Numerics: matmul accumulation and quantization decisions use
 * Math.fround to mirror the C engine's f32 arithmetic (quantized integer
 * sums are exact); transcendentals (exp in softmax/SiLU) use JS doubles
 * where C uses expf, so greedy outputs track the C engine with at most
 * rare near-tie divergence.
 *
 * Classic script: exposes a single global `NanoJS`; usable from a page
 * or a WebWorker (importScripts).  No dependencies.
 */
"use strict";

const NanoJS = (() => {

const HEADER_BYTES = 256;
const MAGIC_0 = 0x42443453, MAGIC_1 = 0x55524c4d;
const QUANT_F32 = 0x00, QUANT_Q80 = 0x80, QUANT_Q4K = 0x42;
const STOP_TOKENS = [0, 3];          // <|padding|>, <|eos|>
const UNKNOWN_ID = 1, BOS_ID = 2;
const fr = Math.fround;
const FLT_TRUE_MIN = 1.401298464324817e-45;

// ---------------------------------------------------------------- utils

const _nbuf = new Float32Array(1);
const _ibuf = new Int32Array(_nbuf.buffer);

function nearestInt(f) {
  // magic-number rounding, bit-exact with the C engine
  // (reference: infer/tensor.c:4-9)
  _nbuf[0] = fr(f) + 12582912.0;     // f64 sum is exact; store rounds f32
  return (_ibuf[0] & 0x007fffff) - 0x00400000;
}

function roundAway(f) {              // C round(): half away from zero
  return Math.sign(f) * Math.floor(Math.abs(f) + 0.5);
}

function f32At(buf, byteOff, count) {
  return new Float32Array(buf.slice(byteOff, byteOff + 4 * count));
}

class Reader {
  constructor(buf, pos) { this.buf = buf; this.dv = new DataView(buf); this.pos = pos; }
  u32() { const v = this.dv.getUint32(this.pos, true); this.pos += 4; return v; }
  i32() { const v = this.dv.getInt32(this.pos, true); this.pos += 4; return v; }
  f32s(n) { const v = f32At(this.buf, this.pos, n); this.pos += 4 * n; return v; }
  i8s(n) { const v = new Int8Array(this.buf.slice(this.pos, this.pos + n)); this.pos += n; return v; }
}

// ------------------------------------------------- weight representations
// f32: {kind:"f32", d}                       row-major (nOut, nIn)
// q80: {kind:"q80", q, s, gs}                int8 + f32 group scales
// q4k: {kind:"q4k", v, s, b, n, npad}        4-bit values (1/byte) + f32
//                                            per-32-group scale/bias

function readQ80(r, numel, gs) {
  const q = r.i8s(numel);
  const s = r.f32s((numel / gs) | 0);
  return { kind: "q80", q, s, gs };
}

function readQ4KFrame(r) {
  // frame: u64 total, u32 header, u32 ndim, u32 shape[6], u32 nb, blocks
  // (reference: infer/tensor.c:71-110; nano_tpu/ops/q4k.py)
  const start = r.pos;
  const totalLo = r.u32(), totalHi = r.u32();
  const total = totalHi * 4294967296 + totalLo;
  if (r.u32() !== QUANT_Q4K) throw new Error("bad Q4K frame header");
  const ndim = r.u32();
  const shape = [];
  for (let i = 0; i < 6; i++) { const v = r.u32(); if (i < ndim) shape.push(v); }
  const nb = r.u32();
  const n = shape[shape.length - 1];
  const rows = shape.slice(0, -1).reduce((a, b) => a * b, 1);
  const nbpl = Math.ceil(n / 256);
  const npad = nbpl * 256;
  const v = new Uint8Array(rows * npad);
  const s = new Float32Array(rows * (npad >> 5));
  const b = new Float32Array(rows * (npad >> 5));
  const bytes = new Uint8Array(r.buf);
  const dv = r.dv;
  let p = r.pos;
  for (let blk = 0; blk < nb; blk++, p += 160) {
    const row = (blk / nbpl) | 0, blkInRow = blk % nbpl;
    const sScale = dv.getFloat32(p + 12, true);
    const sBias = dv.getFloat32(p + 16, true);
    const gBase = row * (npad >> 5) + blkInRow * 8;
    for (let g = 0; g < 4; g++) {
      const sb0 = bytes[p + 20 + g], sb4 = bytes[p + 24 + g], sb8 = bytes[p + 28 + g];
      s[gBase + g] = fr((sb0 & 0x3f) * sScale);
      s[gBase + g + 4] = fr(((((sb0 >> 6) << 4) | (sb8 & 0x0f)) & 0x3f) * sScale);
      b[gBase + g] = fr((sb4 & 0x3f) * sBias);
      b[gBase + g + 4] = fr(((((sb4 >> 6) << 4) | (sb8 >> 4)) & 0x3f) * sBias);
    }
    const base = row * npad + blkInRow * 256;
    for (let i = 0; i < 128; i++) {
      const byte = bytes[p + 32 + i];
      v[base + 2 * i] = byte & 0x0f;
      v[base + 2 * i + 1] = byte >> 4;
    }
  }
  r.pos = start + total;
  return { data: { kind: "q4k", v, s, b, n, npad }, shape };
}

function q4kSlice(t, rowsPer, l, n, npad) {
  // view of layer l out of a stacked (L, out, n) q4k tensor
  return { kind: "q4k",
           v: t.v.subarray(l * rowsPer * npad, (l + 1) * rowsPer * npad),
           s: t.s.subarray(l * rowsPer * (npad >> 5), (l + 1) * rowsPer * (npad >> 5)),
           b: t.b.subarray(l * rowsPer * (npad >> 5), (l + 1) * rowsPer * (npad >> 5)),
           n, npad };
}

// -------------------------------------------- activation quantization

function quantQ80Act(x, n, gs, qbuf, sbuf) {
  // scale = absmax/127 in f32, values = round(x/scale) half away from
  // zero (reference: infer/tensor.c:21-47)
  const ng = (n / gs) | 0;
  for (let g = 0; g < ng; g++) {
    let wmax = 0;
    const base = g * gs;
    for (let i = 0; i < gs; i++) {
      const a = Math.abs(x[base + i]);
      if (a > wmax) wmax = a;
    }
    const scale = fr(wmax / 127.0);
    sbuf[g] = scale;
    if (scale === 0) {
      for (let i = 0; i < gs; i++) qbuf[base + i] = 0;
    } else {
      for (let i = 0; i < gs; i++)
        qbuf[base + i] = roundAway(fr(x[base + i] / scale));
    }
  }
}

function quantQ4KAct(x, n, npad, vbuf, sbuf, bbuf) {
  // Q4K in-situ quantization, bit-exact with the C engine
  // (reference: infer/tensor.c:144-251; mirrors ops/q4k.py fake-quant)
  const ng = npad >> 5;
  const sRaw = new Float32Array(8), bRaw = new Float32Array(8);
  for (let blk = 0; blk < npad / 256; blk++) {
    let sMax = FLT_TRUE_MIN, bMax = FLT_TRUE_MIN;
    for (let g = 0; g < 8; g++) {
      const gi = blk * 8 + g;
      const base = gi * 32;
      let vmax = FLT_TRUE_MIN, vmin = Infinity, any = false;
      for (let i = 0; i < 32; i++) {
        const idx = base + i;
        if (idx >= n) break;
        any = true;
        const val = x[idx];
        if (val > vmax) vmax = val;
        if (val < vmin) vmin = val;
      }
      if (!any) { sRaw[g] = 0; bRaw[g] = 0; continue; }
      if (vmin === Infinity) vmin = 0;
      const neg = vmin <= 0;
      sRaw[g] = neg ? fr(fr(vmax - vmin) / 15.0) : fr(vmax / 15.0);
      bRaw[g] = neg ? -vmin : 0;
      if (sRaw[g] > sMax) sMax = sRaw[g];
      if (bRaw[g] > bMax) bMax = bRaw[g];
    }
    const sScale = fr(sMax / 63.0), sBias = fr(bMax / 63.0);
    for (let g = 0; g < 8; g++) {
      const gi = blk * 8 + g;
      const sq = sScale === 0 ? 0 : (nearestInt(fr(sRaw[g] / sScale)) & 0x3f);
      const bq = sBias === 0 ? 0 : (nearestInt(fr(bRaw[g] / sBias)) & 0x3f);
      const sEff = fr(sq * sScale), bEff = fr(bq * sBias);
      sbuf[gi] = sEff;
      bbuf[gi] = bEff;
      const base = gi * 32;
      for (let i = 0; i < 32; i++) {
        const idx = base + i;
        if (idx >= n || sRaw[g] === 0) { vbuf[base + i] = 0; continue; }
        vbuf[base + i] =
          nearestInt(fr(fr(x[idx] + bRaw[g]) / sRaw[g])) & 0x0f;
      }
    }
  }
}

// ------------------------------------------------------------- matvec

function matvecF32(out, d, x, nIn, nOut) {
  // f32 accumulation order mirrors the C engine's sequential dot
  for (let o = 0; o < nOut; o++) {
    let acc = 0;
    const base = o * nIn;
    for (let i = 0; i < nIn; i++)
      acc = fr(acc + fr(d[base + i] * x[i]));
    out[o] = acc;
  }
}

function matvecQ80(out, W, xq, xs, nIn, nOut) {
  // per-group int32 dot, f32 scale combine
  // (reference: infer/infer.c:654-679)
  const gs = W.gs, ng = (nIn / gs) | 0;
  for (let o = 0; o < nOut; o++) {
    let val = 0;
    const rowBase = o * nIn;
    for (let g = 0; g < ng; g++) {
      const base = g * gs;
      let ival = 0;
      for (let i = 0; i < gs; i++)
        ival += xq[base + i] * W.q[rowBase + base + i];
      val = fr(val + fr(fr(fr(ival) * W.s[((rowBase + base) / gs) | 0]) * xs[g]));
    }
    out[o] = val;
  }
}

function matvecQ4K(out, W, xv, xsv, xbv, nOut) {
  // affine expansion per 32-group, f32 term order as the C kernel
  // (reference: infer/tensor.c:359-436)
  const { v, s, b, n, npad } = W;
  const ng = npad >> 5;
  for (let o = 0; o < nOut; o++) {
    const rowV = o * npad, rowG = o * ng;
    let dot = 0;
    for (let g = 0; g < ng; g++) {
      const len = Math.min(32, n - g * 32);
      if (len <= 0) break;
      const base = g * 32;
      let sumPQ = 0, sumP = 0, sumQ = 0;
      for (let i = 0; i < len; i++) {
        // i < len only: pad nibbles beyond the line length are zero in
        // OUR exporter but not guaranteed in foreign .bin files (the
        // reference toolchain has partial-block quirks) — mirror the
        // wn[] zeroing in cpp/nano.cpp matmul_q4k_int
        const pv = v[rowV + base + i], qv = xv[base + i];
        sumPQ += pv * qv;
        sumP += pv;
        sumQ += qv;
      }
      const sp = s[rowG + g], bp = b[rowG + g];
      const sq = xsv[g], bq = xbv[g];
      const term = fr(fr(fr(fr(sp * sq) * sumPQ)
                    - fr(fr(sp * bq) * sumP))
                    - fr(fr(fr(sq * bp) * sumQ)
                    - fr(fr(len * bp) * bq)));
      dot = fr(dot + term);
    }
    out[o] = dot;
  }
}

// ------------------------------------------------------------ tokenizer

class TrieTokenizer {
  constructor(itos, specials) {
    this.itos = itos;
    this.specials = specials;          // Set of special token STRINGS
    this.stoi = new Map();
    itos.forEach((t, i) => { if (t.length) this.stoi.set(t, i); });
    this.root = new Map();             // char-trie; node: Map + .id
    for (const [t, i] of this.stoi) {
      let node = this.root;
      for (const ch of t) {
        if (!node.has(ch)) node.set(ch, new Map());
        node = node.get(ch);
      }
      node.id = i;
    }
  }

  encode(text) {
    const chars = Array.from(text);    // codepoint-aware
    const ids = [];
    let i = 0;
    while (i < chars.length) {
      let node = this.root, best = -1, bestLen = 0;
      for (let j = i; j < chars.length; j++) {
        node = node.get(chars[j]);
        if (!node) break;
        if (node.id !== undefined) { best = node.id; bestLen = j - i + 1; }
      }
      if (best >= 0) { ids.push(best); i += bestLen; }
      else { ids.push(UNKNOWN_ID); i += 1; }
    }
    return ids;
  }

  decode(ids) {
    let out = "";
    for (const id of ids) out += this.itos[id] || "";
    return out;
  }
}

function parseTokenizer(r) {
  r.u32();                             // total length
  const vocabSize = r.u32();
  const itos = new Array(vocabSize).fill("");
  const specials = new Set();
  for (let t = 0; t < vocabSize; t++) {
    const len = r.dv.getUint8(r.pos);
    const isSpecial = r.dv.getUint8(r.pos + 1);
    const id = r.dv.getUint32(r.pos + 4, true);
    let str = "";
    for (let c = 0; c < len; c++)
      str += String.fromCodePoint(r.dv.getUint32(r.pos + 8 + 4 * c, true));
    itos[id] = str;
    if (isSpecial) specials.add(str);
    r.pos += 8 + 4 * len;
  }
  return new TrieTokenizer(itos, specials);
}

function applyInstructTemplate(q) {
  return "<|instruct_mark|>" + q + "<|response_mark|>";
}

// --------------------------------------------------------- model parse

function parseModel(buf) {
  const dv = new DataView(buf);
  if (dv.getUint32(0, true) !== MAGIC_0 || dv.getUint32(4, true) !== MAGIC_1)
    throw new Error("not a BD4SURLM .bin file");
  const modelType = dv.getInt32(16, true);
  if (modelType !== 0)
    throw new Error("NanoJS runs Nano-arch models (model_type 0); " +
                    "got model_type " + modelType);
  const cfg = {
    blockSize: dv.getInt32(24, true),
    vocabSize: dv.getInt32(28, true),
    nLayer: dv.getInt32(32, true),
    nEmbd: dv.getInt32(36, true),
    nHead: dv.getInt32(40, true),
    nKvHead: dv.getInt32(44, true),
    nHidden: dv.getInt32(48, true),
    sharedClassifier: dv.getInt32(52, true) !== 0,
    headDim: dv.getInt32(56, true),
    quantType: dv.getInt32(60, true),
    groupSize: dv.getInt32(64, true),
  };
  if (!cfg.headDim) cfg.headDim = (cfg.nEmbd / cfg.nHead) | 0;

  const r = new Reader(buf, HEADER_BYTES);
  const tokenizer = parseTokenizer(r);

  const { nLayer: L, nEmbd: E, vocabSize: V, nHead: H, nKvHead: KV,
          headDim: D, nHidden: F, groupSize: gs } = cfg;

  const attnNorm = [], ffnNorm = [];
  for (let l = 0; l < L; l++) attnNorm.push(r.f32s(E));
  for (let l = 0; l < L; l++) ffnNorm.push(r.f32s(E));
  const finalNorm = r.f32s(E);

  const w = { attnNorm, ffnNorm, finalNorm };
  function tensor(numel) {
    if (cfg.quantType === QUANT_F32)
      return { kind: "f32", d: r.f32s(numel) };
    if (cfg.quantType === QUANT_Q80) return readQ80(r, numel, gs);
    throw new Error("bad quant for flat tensor");
  }

  if (cfg.quantType === QUANT_Q4K) {
    const names = ["tokEmb", "wq", "wk", "wv", "wo", "w1", "w2", "w3"];
    for (const name of names) {
      const { data, shape } = readQ4KFrame(r);
      if (name === "tokEmb") { w.tokEmb = data; continue; }
      const rowsPer = shape[1];
      w[name] = [];
      for (let l = 0; l < L; l++)
        w[name].push(q4kSlice(data, rowsPer, l, data.n, data.npad));
    }
  } else {
    w.tokEmb = tensor(V * E);
    const stacks = [["wq", H * D * E], ["wk", KV * D * E], ["wv", KV * D * E],
                    ["wo", E * H * D], ["w1", F * E], ["w2", E * F],
                    ["w3", F * E]];
    for (const [name, numel] of stacks) {
      w[name] = [];
      for (let l = 0; l < L; l++) w[name].push(tensor(numel));
    }
  }

  const D2 = D >> 1;
  w.ropeCos = r.f32s(cfg.blockSize * D2);
  w.ropeSin = r.f32s(cfg.blockSize * D2);

  if (!cfg.sharedClassifier) {
    if (cfg.quantType === QUANT_Q4K)
      throw new Error("Q4K files use a shared classifier");
    w.wcls = tensor(V * E);
  } else {
    w.wcls = w.tokEmb;
  }
  return { cfg, tokenizer, w };
}

function parseLora(buf, cfg) {
  const dv = new DataView(buf);
  if (dv.getUint32(0, true) !== MAGIC_0 || dv.getUint32(4, true) !== MAGIC_1)
    throw new Error("not a BD4SURLM .bin file");
  if (dv.getInt32(16, true) !== 10) throw new Error("not a LoRA .bin");
  const rank = dv.getInt32(24, true), alpha = dv.getInt32(28, true);
  const L = dv.getInt32(32, true), E = dv.getInt32(36, true);
  const H = dv.getInt32(40, true), KV = dv.getInt32(44, true);
  if (L !== cfg.nLayer || E !== cfg.nEmbd || H !== cfg.nHead ||
      KV !== cfg.nKvHead)
    throw new Error("LoRA file does not match base model config");
  const D = cfg.headDim;
  const r = new Reader(buf, HEADER_BYTES);
  const stack = (out_, in_) => {
    const a = [];
    for (let l = 0; l < L; l++) a.push(r.f32s(out_ * in_));
    return a;
  };
  // order: wq_a[L], wq_b[L], wk_a... (reference export.py:119-224)
  return {
    rank, alpha,
    wqA: stack(rank, E), wqB: stack(H * D, rank),
    wkA: stack(rank, E), wkB: stack(KV * D, rank),
    wvA: stack(rank, E), wvB: stack(KV * D, rank),
    woA: stack(rank, H * D), woB: stack(E, rank),
  };
}

// ------------------------------------------------------------- math

function rmsnorm(out, x, weight, n, eps) {
  let ss = 0;
  for (let i = 0; i < n; i++) ss = fr(ss + fr(x[i] * x[i]));
  const inv = fr(1.0 / Math.sqrt(fr(fr(ss / n) + eps)));
  for (let i = 0; i < n; i++) out[i] = fr(fr(x[i] * inv) * weight[i]);
}

function loraAdd(out, A, B, x, nIn, nOut, rank, scale, tmp) {
  // out += B @ (A @ x) * scale;  A (rank, nIn), B (nOut, rank)
  for (let rI = 0; rI < rank; rI++) {
    let acc = 0;
    const base = rI * nIn;
    for (let i = 0; i < nIn; i++) acc = fr(acc + fr(A[base + i] * x[i]));
    tmp[rI] = acc;
  }
  for (let o = 0; o < nOut; o++) {
    let acc = 0;
    const base = o * rank;
    for (let rI = 0; rI < rank; rI++)
      acc = fr(acc + fr(B[base + rI] * tmp[rI]));
    out[o] = fr(out[o] + fr(acc * scale));
  }
}

function softmaxInPlace(x, n) {
  let mx = -Infinity;
  for (let i = 0; i < n; i++) if (x[i] > mx) mx = x[i];
  let sum = 0;
  for (let i = 0; i < n; i++) { x[i] = Math.exp(x[i] - mx); sum += x[i]; }
  for (let i = 0; i < n; i++) x[i] /= sum;
}

// ------------------------------------------------------------ sampler

function makeRng(seed) {
  // xorshift64* (reference: infer/utils.c:959-968)
  let s = BigInt(seed) || 0x2545f4914f6cdd1dn;
  return () => {
    s ^= s >> 12n; s ^= (s << 25n) & 0xffffffffffffffffn; s ^= s >> 27n;
    const v = (s * 0x2545f4914f6cdd1dn) & 0xffffffffffffffffn;
    return Number(v >> 40n) / 16777216.0;      // top 24 bits -> [0,1)
  };
}

function sample(logits, V, opts, seenSet, rng) {
  const { temperature, topP, topK, repetitionPenalty } = opts;
  if (repetitionPenalty && repetitionPenalty !== 1.0)
    for (const t of seenSet) logits[t] /= repetitionPenalty;
  if (!temperature || temperature <= 0) {
    let best = 0;
    for (let i = 1; i < V; i++) if (logits[i] > logits[best]) best = i;
    return best;
  }
  for (let i = 0; i < V; i++) logits[i] /= temperature;
  softmaxInPlace(logits, V);
  const r = rng();
  if (topP && topP > 0 && topP < 1) {
    // cutoff prefilter + sort, like the C engine (infer/infer.c:1062-1109)
    const cutoff = (1.0 - topP) / (V - 1);
    const cand = [];
    for (let i = 0; i < V; i++)
      if (logits[i] >= cutoff) cand.push(i);
    cand.sort((a, b) => logits[b] - logits[a]);
    let cum = 0, last = cand.length - 1;
    for (let i = 0; i < cand.length; i++) {
      cum += logits[cand[i]];
      if (cum > topP) { last = i; break; }
    }
    let x = r * cum, acc = 0;
    for (let i = 0; i <= last; i++) {
      acc += logits[cand[i]];
      if (acc >= x) return cand[i];
    }
    return cand[last];
  }
  if (topK && topK > 0) {
    const idx = Array.from({ length: V }, (_, i) => i)
      .sort((a, b) => logits[b] - logits[a]).slice(0, topK);
    let sum = 0;
    for (const i of idx) sum += logits[i];
    let x = r * sum, acc = 0;
    for (const i of idx) { acc += logits[i]; if (acc >= x) return i; }
    return idx[idx.length - 1];
  }
  let acc = 0;
  for (let i = 0; i < V; i++) { acc += logits[i]; if (acc >= r) return i; }
  return V - 1;
}

// ------------------------------------------------------------- engine

class Engine {
  constructor(buf, opts = {}) {
    const { cfg, tokenizer, w } = parseModel(buf);
    this.cfg = cfg;
    this.tokenizer = tokenizer;
    this.w = w;
    this.lora = null;
    this.maxSeqLen = Math.min(opts.maxSeqLen || cfg.blockSize,
                              cfg.blockSize);
    this.normEps = opts.normEps || 1e-5;   // C engine default
    const { nEmbd: E, nHead: H, nKvHead: KV, headDim: D, nHidden: F,
            vocabSize: V, nLayer: L } = cfg;
    const T = this.maxSeqLen;
    const maxIn = Math.max(E, H * D, F);
    const maxPad = Math.ceil(maxIn / 256) * 256;
    this.buf = {
      x: new Float32Array(E), xb: new Float32Array(E),
      q: new Float32Array(H * D), k: new Float32Array(KV * D),
      v: new Float32Array(KV * D),
      att: new Float32Array(T), attOut: new Float32Array(H * D),
      h1: new Float32Array(F), h3: new Float32Array(F),
      loraTmp: new Float32Array(1024),
      logits: new Float32Array(V),
      kCache: new Float32Array(L * T * KV * D),
      vCache: new Float32Array(L * T * KV * D),
      // activation-quant scratch
      aq: new Int8Array(maxIn), as: new Float32Array(maxIn / 8),
      a4v: new Uint8Array(maxPad), a4s: new Float32Array(maxPad >> 5),
      a4b: new Float32Array(maxPad >> 5),
    };
  }

  loadLora(buf) { this.lora = parseLora(buf, this.cfg); }
  unloadLora() { this.lora = null; }

  /* one matvec with weight-kind dispatch; the activation is quantized
   * once per (x, nIn) and reused across consecutive calls on the same x
   * (the C engine does the same: quantize s->xq, then 3 matmuls). */
  _mv(out, W, x, nIn, nOut, actKey) {
    const bufs = this.buf;
    if (W.kind === "f32") { matvecF32(out, W.d, x, nIn, nOut); return; }
    if (W.kind === "q80") {
      if (this._aqKey !== actKey) {
        quantQ80Act(x, nIn, W.gs, bufs.aq, bufs.as);
        this._aqKey = actKey;
      }
      matvecQ80(out, W, bufs.aq, bufs.as, nIn, nOut);
      return;
    }
    if (this._a4Key !== actKey) {
      bufs.a4v.fill(0);
      quantQ4KAct(x, nIn, W.npad, bufs.a4v, bufs.a4s, bufs.a4b);
      this._a4Key = actKey;
    }
    matvecQ4K(out, W, bufs.a4v, bufs.a4s, bufs.a4b, nOut);
  }

  _embedRow(token, out) {
    const { nEmbd: E } = this.cfg;
    const t = this.w.tokEmb;
    if (t.kind === "f32") { out.set(t.d.subarray(token * E, (token + 1) * E)); return; }
    if (t.kind === "q80") {
      const base = token * E, gs = t.gs;
      for (let i = 0; i < E; i++)
        out[i] = fr(t.q[base + i] * t.s[((base + i) / gs) | 0]);
      return;
    }
    const base = token * t.npad, gBase = token * (t.npad >> 5);
    for (let i = 0; i < E; i++) {
      const g = gBase + (i >> 5);
      out[i] = fr(fr(t.v[base + i] * t.s[g]) - t.b[g]);
    }
  }

  forward(token, pos) {
    const { cfg, w, buf } = this;
    const { nEmbd: E, nHead: H, nKvHead: KV, headDim: D, nHidden: F,
            vocabSize: V, nLayer: L } = cfg;
    const T = this.maxSeqLen;
    const D2 = D >> 1, rep = (H / KV) | 0;
    const { x, xb, q, k, v, att, attOut, h1, h3, logits, kCache, vCache,
            loraTmp } = buf;
    const lora = this.lora;
    const lScale = lora ? lora.alpha / lora.rank : 0;
    this._aqKey = this._a4Key = null;

    this._embedRow(token, x);

    for (let l = 0; l < L; l++) {
      rmsnorm(xb, x, w.attnNorm[l], E, this.normEps);
      const aKey = "attn" + l;
      this._mv(q, w.wq[l], xb, E, H * D, aKey);
      this._mv(k, w.wk[l], xb, E, KV * D, aKey);
      this._mv(v, w.wv[l], xb, E, KV * D, aKey);
      if (lora) {
        loraAdd(q, lora.wqA[l], lora.wqB[l], xb, E, H * D, lora.rank,
                lScale, loraTmp);
        loraAdd(k, lora.wkA[l], lora.wkB[l], xb, E, KV * D, lora.rank,
                lScale, loraTmp);
        loraAdd(v, lora.wvA[l], lora.wvB[l], xb, E, KV * D, lora.rank,
                lScale, loraTmp);
      }

      // interleaved-pair RoPE from the file tables
      // (reference: infer/infer.c:681-691)
      const cBase = pos * D2;
      for (let h = 0; h < H; h++) {
        const base = h * D;
        for (let i = 0; i < D; i += 2) {
          const c = w.ropeCos[cBase + (i >> 1)], s = w.ropeSin[cBase + (i >> 1)];
          const v0 = q[base + i], v1 = q[base + i + 1];
          q[base + i] = fr(fr(v0 * c) - fr(v1 * s));
          q[base + i + 1] = fr(fr(v0 * s) + fr(v1 * c));
        }
      }
      for (let h = 0; h < KV; h++) {
        const base = h * D;
        for (let i = 0; i < D; i += 2) {
          const c = w.ropeCos[cBase + (i >> 1)], s = w.ropeSin[cBase + (i >> 1)];
          const v0 = k[base + i], v1 = k[base + i + 1];
          k[base + i] = fr(fr(v0 * c) - fr(v1 * s));
          k[base + i + 1] = fr(fr(v0 * s) + fr(v1 * c));
        }
      }

      const cacheBase = l * T * KV * D + pos * KV * D;
      kCache.set(k, cacheBase);
      vCache.set(v, cacheBase);

      // attention over the cache, per head
      const scale = 1.0 / Math.sqrt(D);
      for (let h = 0; h < H; h++) {
        const qBase = h * D;
        const kvh = (h / rep) | 0;
        for (let t = 0; t <= pos; t++) {
          const kBase = l * T * KV * D + t * KV * D + kvh * D;
          let acc = 0;
          for (let i = 0; i < D; i++)
            acc = fr(acc + fr(q[qBase + i] * kCache[kBase + i]));
          att[t] = fr(acc * scale);
        }
        softmaxInPlace(att, pos + 1);
        for (let i = 0; i < D; i++) attOut[qBase + i] = 0;
        for (let t = 0; t <= pos; t++) {
          const vBase = l * T * KV * D + t * KV * D + kvh * D;
          const a = att[t];
          for (let i = 0; i < D; i++)
            attOut[qBase + i] =
              fr(attOut[qBase + i] + fr(a * vCache[vBase + i]));
        }
      }

      this._mv(xb, w.wo[l], attOut, H * D, E, "wo" + l);
      if (lora)
        loraAdd(xb, lora.woA[l], lora.woB[l], attOut, H * D, E, lora.rank,
                lScale, loraTmp);
      for (let i = 0; i < E; i++) x[i] = fr(x[i] + xb[i]);

      rmsnorm(xb, x, w.ffnNorm[l], E, this.normEps);
      const fKey = "ffn" + l;
      this._mv(h1, w.w1[l], xb, E, F, fKey);
      this._mv(h3, w.w3[l], xb, E, F, fKey);
      for (let i = 0; i < F; i++)
        h1[i] = fr(fr(h1[i] / (1.0 + Math.exp(-h1[i]))) * h3[i]);  // SwiGLU
      this._mv(xb, w.w2[l], h1, F, E, "w2" + l);
      for (let i = 0; i < E; i++) x[i] = fr(x[i] + xb[i]);
    }

    rmsnorm(xb, x, w.finalNorm, E, this.normEps);
    this._mv(logits, w.wcls, xb, E, V, "clf");
    return logits;
  }

  encodePrompt(prompt, template) {
    const text = template ? applyInstructTemplate(prompt) : prompt;
    let ids = this.tokenizer.encode(text);
    if (ids.length === 0) ids = [BOS_ID];
    if (ids.length >= this.maxSeqLen)
      ids = ids.slice(-(this.maxSeqLen - 1));
    return ids;
  }

  /* Async generator yielding {id, text}; yields to the event loop every
   * token so the UI stays responsive (cooperative scheduling, like the
   * reference's one-token-per-tick session API). */
  async *generate(prompt, opts = {}) {
    const o = {
      maxNewTokens: opts.maxNewTokens || 256,
      temperature: opts.temperature !== undefined ? opts.temperature : 1.0,
      topP: opts.topP !== undefined ? opts.topP : 0.8,
      topK: opts.topK || 0,
      repetitionPenalty: opts.repetitionPenalty || 1.0,
      template: opts.template !== undefined ? opts.template : true,
      seed: opts.seed || 39,
    };
    const ids = this.encodePrompt(prompt, o.template);
    const rng = makeRng(o.seed);
    const seen = new Set(ids);
    let logits = null, pos = 0;
    for (; pos < ids.length; pos++)
      logits = this.forward(ids[pos], pos);

    for (let nOut = 0; nOut < o.maxNewTokens &&
                       pos < this.maxSeqLen; nOut++) {
      const next = sample(logits, this.cfg.vocabSize, o, seen, rng);
      if (STOP_TOKENS.includes(next)) return;
      seen.add(next);
      yield { id: next, text: this.tokenizer.itos[next] || "" };
      await new Promise(res => setTimeout(res, 0));
      if (this._abort) { this._abort = false; return; }
      logits = this.forward(next, pos);
      pos++;
    }
  }

  abort() { this._abort = true; }

  /* Synchronous greedy decode returning token ids — the cross-engine
   * parity surface (compare against the Python/C engines). */
  greedy(prompt, maxNewTokens, template = false) {
    const ids = this.encodePrompt(prompt, template);
    let logits = null, pos = 0;
    for (; pos < ids.length; pos++)
      logits = this.forward(ids[pos], pos);
    const out = [];
    while (out.length < maxNewTokens && pos < this.maxSeqLen) {
      let best = 0;
      for (let i = 1; i < this.cfg.vocabSize; i++)
        if (logits[i] > logits[best]) best = i;
      if (STOP_TOKENS.includes(best)) break;
      out.push(best);
      logits = this.forward(best, pos);
      pos++;
    }
    return out;
  }
}

return { Engine, parseModel, parseLora, TrieTokenizer,
         applyInstructTemplate, makeRng, nearestInt,
         // numeric internals, exported for the runtime parity harness
         // (tests/js/run_parity.mjs + web/test_parity.html)
         _internals: { quantQ80Act, quantQ4KAct, matvecF32, matvecQ80,
                       matvecQ4K, rmsnorm, roundAway, readQ4KFrame,
                       Reader } };
})();

// worker/module interop
if (typeof module !== "undefined" && module.exports) module.exports = NanoJS;
if (typeof self !== "undefined") self.NanoJS = NanoJS;
