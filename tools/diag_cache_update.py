"""Cache-update strategy A/B for the batched decode scan.

The serving step's dominant cost is cache-buffer traffic: the layer
scan takes the stacked cache as xs and returns the updated layer slice
as ys, so XLA MATERIALIZES a full cache copy every layer, every step
(PERF.md r5: right-sizing capacity 1024 -> 512 halved the step).  The
untried alternative: carry the FULL (L, B, T, KV, D) cache through the
layer scan and scatter only the B written rows per layer — if XLA
aliases the carry in place, traffic drops from O(L*B*T) copies to
O(L*B) row writes.

This measures both strategies on an identical simplified layer body
(same matmuls, same attention reads, same scatter positions) so the
DELTA is purely the update strategy.  bf16 cache (no scale buffers) to
keep the body simple; the strategy question is dtype-independent.

Run solo on the real TPU from /root/repo.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import nano_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS before the
#                  axon plugin can override it — CLAUDE.md)
import jax
import jax.numpy as jnp

L, B, T, KV, REP, D = 28, 32, 512, 8, 2, 128
if os.environ.get("DIAG_TINY"):       # CPU smoke: correctness of the
    L, B, T, D = 2, 4, 64, 32         # scan structures, not timing
E = KV * REP * D                      # toy hidden width
N_STEPS = int(os.environ.get("DIAG_STEPS", "64"))


def make_state(key):
    ks = jax.random.split(key, 4)
    w = jax.random.normal(ks[0], (L, E, E), jnp.bfloat16) / np.float32(E) ** 0.5
    cache_k = jax.random.normal(ks[1], (L, B, T, KV, D), jnp.bfloat16)
    cache_v = jax.random.normal(ks[2], (L, B, T, KV, D), jnp.bfloat16)
    h0 = jax.random.normal(ks[3], (B, E), jnp.bfloat16)
    pos = jnp.full((B,), min(384, T - N_STEPS - 2), jnp.int32)
    return w, cache_k, cache_v, h0, pos


def layer_body(h, w_l, k_l, v_l, pos):
    """Shared compute: one dense matmul -> new k/v rows -> attention."""
    q = (h @ w_l).reshape(B, KV, REP, D)
    new_k = q[:, :, 0, :]                      # (B, KV, D)
    new_v = q[:, :, 1 % REP, :]
    bidx = jnp.arange(B)
    k_l = k_l.at[bidx, pos].set(new_k)         # per-slot row scatter
    v_l = v_l.at[bidx, pos].set(new_v)
    scores = jnp.einsum("bkrd,btkd->bkrt", q.astype(jnp.float32),
                        k_l.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrt,btkd->bkrd", probs, v_l.astype(jnp.float32))
    return out.reshape(B, E).astype(jnp.bfloat16), k_l, v_l


@partial(jax.jit, static_argnames=("n_steps",))
def run_ys_stack(w, ck, cv, h0, pos, n_steps):
    """Current strategy: cache as layer-scan xs -> ys (full copy/layer)."""
    def step(carry, _):
        h, ck, cv, pos = carry

        def layer(h, xs):
            w_l, k_l, v_l = xs
            h, k_l, v_l = layer_body(h, w_l, k_l, v_l, pos)
            return h, (k_l, v_l)

        h, (ck, cv) = jax.lax.scan(layer, h, (w, ck, cv))
        return (h, ck, cv, pos + 1), h[0, 0]

    (h, ck, cv, pos), trace = jax.lax.scan(
        step, (h0, ck, cv, pos), None, length=n_steps)
    return jnp.sum(trace.astype(jnp.float32))


@partial(jax.jit, static_argnames=("n_steps",))
def run_carry_scatter(w, ck, cv, h0, pos, n_steps):
    """Alternative: full cache in the layer-scan CARRY; per-layer the
    body reads its slice (traced-index gather) and scatters only the B
    new rows back into the 5D buffer."""
    def step(carry, _):
        h, ck, cv, pos = carry

        def layer(carry2, xs):
            h, ck, cv = carry2
            w_l, li = xs
            k_l = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
            h, k_l, v_l = layer_body(h, w_l, k_l, v_l, pos)
            ck = jax.lax.dynamic_update_index_in_dim(ck, k_l, li, 0)
            cv = jax.lax.dynamic_update_index_in_dim(cv, v_l, li, 0)
            return (h, ck, cv), None

        (h, ck, cv), _ = jax.lax.scan(
            layer, (h, ck, cv), (w, jnp.arange(L)))
        return (h, ck, cv, pos + 1), h[0, 0]

    (h, ck, cv, pos), trace = jax.lax.scan(
        step, (h0, ck, cv, pos), None, length=n_steps)
    return jnp.sum(trace.astype(jnp.float32))


@partial(jax.jit, static_argnames=("n_steps",))
def run_row_scatter(w, ck, cv, h0, pos, n_steps):
    """Sharpest variant: scatter ONLY the (L?, B, KV, D) new rows into
    the 5D carry per layer (no full-slice write-back)."""
    def step(carry, _):
        h, ck, cv, pos = carry

        def layer(carry2, xs):
            h, ck, cv = carry2
            w_l, li = xs
            k_l = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
            q = (h @ w_l).reshape(B, KV, REP, D)
            new_k = q[:, :, 0, :]
            new_v = q[:, :, 1 % REP, :]
            bidx = jnp.arange(B)
            # read slices updated LOCALLY for attention...
            k_l = k_l.at[bidx, pos].set(new_k)
            v_l = v_l.at[bidx, pos].set(new_v)
            scores = jnp.einsum("bkrd,btkd->bkrt", q.astype(jnp.float32),
                                k_l.astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bkrt,btkd->bkrd", probs,
                             v_l.astype(jnp.float32))
            h = out.reshape(B, E).astype(jnp.bfloat16)
            # ...but the CARRY gets only the B new rows
            li_b = jnp.full((B,), li)
            ck = ck.at[li_b, bidx, pos].set(new_k)
            cv = cv.at[li_b, bidx, pos].set(new_v)
            return (h, ck, cv), None

        (h, ck, cv), _ = jax.lax.scan(
            layer, (h, ck, cv), (w, jnp.arange(L)))
        return (h, ck, cv, pos + 1), h[0, 0]

    (h, ck, cv, pos), trace = jax.lax.scan(
        step, (h0, ck, cv, pos), None, length=n_steps)
    return jnp.sum(trace.astype(jnp.float32))


def time_fn(fn, state, label):
    w, ck, cv, h0, pos = state
    np.asarray(fn(w, ck, cv, h0, pos, N_STEPS))          # compile+warm
    best = float("inf")
    for rep in range(3):
        h = h0 + jnp.bfloat16(rep + 1)                   # chain values
        t0 = time.time()
        np.asarray(fn(w, ck, cv, h, pos, N_STEPS))
        best = min(best, time.time() - t0)
    print(f"{label:16s} {best / N_STEPS * 1e3:7.2f} ms/step", flush=True)
    return best


def main():
    state = make_state(jax.random.PRNGKey(0))
    only = os.environ.get("DIAG_ONLY", "")
    for name, fn in (("ys_stack", run_ys_stack),
                     ("carry_slice", run_carry_scatter),
                     ("carry_rows", run_row_scatter)):
        if only and name not in only.split(","):
            continue
        try:
            time_fn(fn, state, name)
        except Exception as e:
            print(f"{name:16s} ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
