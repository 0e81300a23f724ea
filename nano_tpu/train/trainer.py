"""Trainer — pretrain / SFT / LoRA fine-tune on a TPU mesh.

Capability parity with the reference trainer (reference: train.py:122-494):
AdamW with decay/no-decay parameter groups, cosine LR schedule with linear
warmup, gradient accumulation, mixed precision, eval-gated 3-tier
checkpoint policy (save when val loss improves OR every forced_save_every
steps, at eval_interval cadence), resume (full or LoRA), continued-pretrain
batch replay, and throughput/FLOPS logging.

TPU-native design (replaces DDP/NCCL, reference train.py:171-191,289-291):
  * one jit-compiled `train_step` over a ("data","model") Mesh; the global
    batch is sharded over "data", params are replicated (or TP-sharded),
    and XLA emits the gradient all-reduce — there is no wrapper module,
    no process group, no `require_backward_grad_sync` bookkeeping.
  * gradient accumulation is a `lax.scan` over microbatches inside the
    step, so the accumulation loop costs one compile and zero Python.
  * bf16 activations/matmuls with fp32 master params — no GradScaler
    (bf16 has fp32's exponent range; the reference's fp16 scaler machinery
    is unnecessary on TPU, SURVEY §2.2).
"""

from __future__ import annotations

import logging
import math
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from nano_tpu.config import ModelConfig, TrainConfig
from nano_tpu.models import gpt
from nano_tpu.parallel import mesh as meshlib
from nano_tpu.io import checkpoint as ckpt_io
from nano_tpu.tokenizer.trie import TrieTokenizer
from nano_tpu.train.data import DataLoader

logger = logging.getLogger(__name__)


# =====================================================================
# LR schedule (reference: train.py:346-358)
# =====================================================================

def make_lr_schedule(cfg: TrainConfig):
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.learning_rate * (step + 1) / max(cfg.warmup_iters, 1)
        decay_ratio = jnp.clip(
            (step - cfg.warmup_iters)
            / max(cfg.lr_decay_iters - cfg.warmup_iters, 1), 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * decay_ratio))
        cos_lr = cfg.min_lr + coeff * (cfg.learning_rate - cfg.min_lr)
        out = jnp.where(step < cfg.warmup_iters, warm, cos_lr)
        if not cfg.decay_lr:
            out = jnp.full_like(out, cfg.learning_rate)
        return out
    return lr


# =====================================================================
# optimizer: AdamW with decay only on matrix-like params
# (reference: model.py:453-477 — dim>=2 decays; our stacked norm weights
# are (L, E) so we mask by NAME, which is the semantically faithful rule)
# =====================================================================

_NO_DECAY_NAMES = ("attn_norm", "ffn_norm", "norm", "q_norm", "k_norm",
                   "bq", "bk", "bv")


def _decay_mask(params: Any) -> Any:
    def walk(tree, under_name=None):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        return under_name not in _NO_DECAY_NAMES
    return walk(params)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip > 0
        else optax.identity(),
        optax.adamw(
            learning_rate=make_lr_schedule(cfg),
            b1=cfg.beta1, b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
            # bf16 first moment halves that optimizer buffer (the update
            # math still runs f32; stochastic-rounding-free bf16 mu is
            # the standard memory lever) — frees HBM for faster remat
            # policies on the 16 GB chip
            mu_dtype=cfg.adam_mu_dtype,
            mask=_decay_mask(params)),
    )


# =====================================================================
# Trainer
# =====================================================================

class Trainer:
    """End-to-end training driver (reference TrainGPT, train.py:122).

    usage:
        t = Trainer(model_cfg_dict, train_cfg_dict, max_steps=...)
        t.init()
        t.load_data()
        t.start()
    """

    def __init__(self, model_config, train_config,
                 max_steps: int = 10 ** 10,
                 ckpt_filename: Optional[str] = None,
                 is_continued_pretrain: bool = False,
                 mesh: Optional[Any] = None):
        self.model_config = (model_config if isinstance(model_config, ModelConfig)
                             else ModelConfig.from_dict(model_config))
        self.train_config = (train_config if isinstance(train_config, TrainConfig)
                             else TrainConfig.from_dict(train_config))
        self.max_steps = max_steps
        self.ckpt_filename = ckpt_filename or "checkpoint.npz"
        self.is_continued_pretrain = is_continued_pretrain

        self.mesh = mesh
        self.params = None
        self.lora = None
        self.opt_state = None
        self.step_count = 0
        self.tokenizer: Optional[TrieTokenizer] = None
        self.train_data: Optional[DataLoader] = None
        self.val_data: Optional[DataLoader] = None
        self.best_val_loss = float("inf")
        self._pending_skip = 0          # continued-pretrain replay batches
        self.forced_save_every = 1000   # reference: train.py:391-396
        self.loss_history: list = []

        self._train_step = None
        self._eval_step = None
        self._tx = None
        self.log_file: Optional[str] = None
        self._file_handler: Optional[logging.Handler] = None

        self.dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                      "float16": jnp.bfloat16}[self.train_config.dtype]

    # ------------------------------------------------------------
    def log(self, msg: str) -> None:
        if jax.process_index() == 0:
            logger.info(msg)
            print(msg, flush=True)

    def _open_log_file(self) -> None:
        """Timestamped train_*.log file for plot_loss.py, master rank only
        (reference: train.py:162-165).  Lands next to the checkpoints when
        a save path is configured, else in the cwd."""
        if jax.process_index() != 0 or self._file_handler is not None:
            return
        tc = self.train_config
        dest = tc.save_checkpoint_to or "."
        log_dir = (os.path.dirname(dest) or ".") if dest.endswith(".npz") else dest
        os.makedirs(log_dir, exist_ok=True)
        self.log_file = os.path.join(
            log_dir, time.strftime("train_%Y%m%d_%H%M%S.log"))
        self._file_handler = logging.FileHandler(self.log_file,
                                                 encoding="utf-8")
        self._file_handler.setFormatter(
            logging.Formatter("%(asctime)s | %(message)s"))
        logger.addHandler(self._file_handler)
        if logger.getEffectiveLevel() > logging.INFO:
            logger.setLevel(logging.INFO)

    def close_log_file(self) -> None:
        if self._file_handler is not None:
            logger.removeHandler(self._file_handler)
            self._file_handler.close()
            self._file_handler = None

    # ------------------------------------------------------------
    def init(self) -> None:
        tc, mc = self.train_config, self.model_config

        if self.mesh is None:
            shape = tc.mesh_shape or {}
            n_model = shape.get("model", 1)
            n_seq = shape.get("seq", 1)
            n_pipe = shape.get("pipe", 1)
            n_other = n_model * n_seq * n_pipe
            n_data = shape.get("data")
            if n_data is None:
                n_data = len(jax.devices()) // n_other
            if n_data < 1:
                raise ValueError(
                    f"mesh_shape {shape} needs {n_other} devices per "
                    f"data-parallel replica but only "
                    f"{len(jax.devices())} exist")
            # the global batch is sharded over "data": shrink the axis to
            # the largest divisor of batch_size rather than erroring
            while tc.batch_size % n_data != 0:
                n_data -= 1
            if n_data * n_other < len(jax.devices()):
                self.log(f"WARNING: using {n_data * n_other}/"
                         f"{len(jax.devices())} devices (batch_size="
                         f"{tc.batch_size} not divisible)")
            devices = jax.devices()[:n_data * n_other]
            self.mesh = meshlib.make_mesh(n_data=n_data, n_model=n_model,
                                          n_seq=n_seq, n_pipe=n_pipe,
                                          devices=devices)
        self.log(f"mesh: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}")

        key = jax.random.PRNGKey(tc.random_seed)

        resume = tc.from_checkpoint if tc.from_checkpoint else None
        if resume:
            ck = ckpt_io.Checkpoint(resume)
            self.model_config = mc = ModelConfig.from_dict(ck.model_config)
            # a run saved without a tokenizer stores tokenizer_config=None
            self.tokenizer = (TrieTokenizer.from_config_dict(
                ck.tokenizer_config) if ck.tokenizer_config else None)
            # structure/dtype template only — eval_shape materializes
            # nothing (a real init_params would allocate and randomize
            # the full model just to be overwritten)
            like = jax.eval_shape(lambda k: gpt.init_params(k, mc), key)
            self.params = ck.load_params(like)
            if tc.use_lora:
                # LoRA fine-tune on a pretrained base: fresh LoRA, step 0
                # (reference: train.py:225-237)
                self.step_count = 0
                self.lora = gpt.init_lora_params(key, mc, tc.lora_rank)
                self.log(f"LoRA fine-tune from `{resume}` (rank={tc.lora_rank})")
            else:
                self.step_count = ck.step
                self.log(f"resumed from `{resume}` at step {self.step_count}")
        else:
            if tc.tokenizer_path:
                self.tokenizer = TrieTokenizer.from_file(tc.tokenizer_path)
                if self.tokenizer.vocab_size > mc.vocab_size:
                    self.log("WARNING: model vocab_size < tokenizer vocab_size")
            self.params = gpt.init_params(key, mc)
            self.log("initialized new model")

        # shard/replicate over the mesh
        tp = (tc.mesh_shape or {}).get("model", 1) > 1
        pp = meshlib.PIPE_AXIS in self.mesh.axis_names
        if pp:
            assert not tp and not tc.use_lora, \
                "pipeline parallel composes with DP (not TP/LoRA)"
            from nano_tpu.parallel import pipeline
            self.params = pipeline.shard_params_pp(self.params, self.mesh)
        else:
            self.params = meshlib.shard_params(self.params, self.mesh,
                                               tensor_parallel=tp)
        if self.lora is not None:
            self.lora = meshlib.shard_params(self.lora, self.mesh)

        trainable = self.lora if tc.use_lora else self.params
        self._tx = make_optimizer(tc, trainable)
        self.opt_state = self._tx.init(trainable)
        if resume and not tc.use_lora:
            if ck.has("opt"):                  # same Checkpoint as params
                self.opt_state = ck.load_opt_state(self.opt_state)

        n_params = gpt.count_params(self.params, mc)
        n_train = sum(int(x.size) for x in jax.tree.leaves(trainable))
        self.flop_per_token = gpt.estimate_flops_per_token(mc, n_params)
        self.log(f"params: total={n_params:,} trainable={n_train:,}")

        self._build_steps()

    # ------------------------------------------------------------
    def _build_steps(self) -> None:
        tc, mc = self.train_config, self.model_config
        dtype = self.dtype
        use_lora = tc.use_lora
        lora_scale = tc.lora_alpha / tc.lora_rank if use_lora else 0.0
        remat = (tc.remat_policy if (tc.remat and
                 tc.remat_policy != "full") else tc.remat)
        tx = self._tx

        ce_chunk = tc.ce_chunk

        if meshlib.PIPE_AXIS in self.mesh.axis_names:
            # pipeline-parallel loss (parallel/pipeline.py): shard_map'd
            # GPipe schedule; drop-in for gpt.loss_fn in the grad path
            from nano_tpu.parallel import pipeline
            pp_loss = pipeline.make_pp_loss(
                mc, self.mesh, dtype=dtype,
                n_micro=tc.pp_microbatches, remat=remat,
                ce_chunk=ce_chunk)

            def compute_loss(trainable, frozen, x, y, m):
                return pp_loss(trainable, x, y, m)
        else:
            def compute_loss(trainable, frozen, x, y, m):
                if use_lora:
                    return gpt.loss_fn(frozen, x, y, m, mc, dtype=dtype,
                                       lora=trainable,
                                       lora_scale=lora_scale,
                                       remat=remat, ce_chunk=ce_chunk)
                return gpt.loss_fn(trainable, x, y, m, mc, dtype=dtype,
                                   remat=remat, ce_chunk=ce_chunk)

        def train_step(trainable, frozen, opt_state, xs, ys, ms):
            """xs: (accum, B, S) — scan over microbatches, one update."""
            def micro(acc, mb):
                x, y, m = mb
                loss, g = jax.value_and_grad(compute_loss)(
                    trainable, frozen, x, y, m)
                return jax.tree.map(jnp.add, acc, g), loss

            zero = jax.tree.map(jnp.zeros_like, trainable)
            grads, losses = jax.lax.scan(micro, zero, (xs, ys, ms))
            grads = jax.tree.map(lambda g: g / xs.shape[0], grads)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, jnp.mean(losses)

        def eval_step(trainable, frozen, x, y, m):
            return compute_loss(trainable, frozen, x, y, m)

        repl = NamedSharding(self.mesh, P())
        bspec = meshlib.batch_spec(self.mesh)      # (B[, S]) incl. "seq"
        batch_sh = NamedSharding(self.mesh, P(None, *bspec))
        eval_sh = NamedSharding(self.mesh, bspec)
        self._train_step = jax.jit(
            train_step,
            in_shardings=(None, None, None, batch_sh, batch_sh, batch_sh),
            donate_argnums=(0, 2))
        self._eval_step = jax.jit(
            eval_step, in_shardings=(None, None, eval_sh, eval_sh, eval_sh))

    # ------------------------------------------------------------
    def load_data(self) -> None:
        tc = self.train_config
        assert tc.dataset_path, "train_config.dataset_path required"
        train_files = [p[0] for p in tc.dataset_path]
        val_files = [p[1] for p in tc.dataset_path]
        self.train_data = DataLoader(train_files, seed=tc.random_seed,
                                     max_resident=tc.max_resident_shards)
        self.val_data = DataLoader(val_files, seed=tc.random_seed,
                                   max_resident=tc.max_resident_shards)
        self.log(f"dataset: {self.train_data.total_samples:,} train / "
                 f"{self.val_data.total_samples:,} val samples")
        if self.is_continued_pretrain and self.step_count > 0:
            # deferred to _run(): denoise replay must also burn the RNG
            # draws get_batch made, and denoise-ness is only known there
            self._pending_skip = self.step_count * \
                tc.gradient_accumulation_steps

    # ------------------------------------------------------------
    def _get_accum_batch(self, denoise: bool = False):
        tc, mc = self.train_config, self.model_config
        A = tc.gradient_accumulation_steps
        xs, ys, ms = [], [], []
        for _ in range(A):
            x, y, m = self.train_data.get_batch(
                tc.batch_size, mc.block_size, is_causal=mc.is_causal,
                denoise=denoise)
            xs.append(x)
            ys.append(y)
            ms.append(m)
        return (np.stack(xs), np.stack(ys), np.stack(ms))

    def estimate_loss(self, trainable=None, frozen=None) -> Tuple[float, float]:
        """(train_loss, val_loss) over eval_iters batches (train.py:331-344)."""
        tc, mc = self.train_config, self.model_config
        if trainable is None:
            trainable = self.lora if tc.use_lora else self.params
            frozen = self.params if tc.use_lora else None
        losses = {"train": [], "val": []}
        for split, loader in (("train", self.train_data), ("val", self.val_data)):
            st = loader.state()   # eval must not advance the training
            # stream (it would desync continued-pretrain replay)
            for _ in range(tc.eval_iters):
                x, y, m = loader.get_batch(tc.batch_size, mc.block_size,
                                           is_causal=mc.is_causal)
                losses[split].append(float(self._eval_step(
                    trainable, frozen, x, y, m)))
            loader.set_state(st)
        return float(np.mean(losses["train"])), float(np.mean(losses["val"]))

    def save_checkpoint(self, path: Optional[str] = None) -> str:
        tc = self.train_config
        if path is None:
            dest = tc.save_checkpoint_to or "."
            if dest.endswith(".npz"):    # a file path, not a directory
                path = dest
                os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
            else:
                os.makedirs(dest, exist_ok=True)
                path = os.path.join(dest, self.ckpt_filename)
        ckpt_io.save_checkpoint(
            path,
            params=None if tc.use_lora else self.params,
            lora=self.lora if tc.use_lora else None,
            opt_state=self.opt_state,
            step=self.step_count,
            model_config=self.model_config.to_dict(),
            train_config=self.train_config.to_dict(),
            tokenizer_config=self.tokenizer.config if self.tokenizer else None)
        self.log(f"checkpoint saved to {path}")
        return path

    # ------------------------------------------------------------
    def start(self, denoise: bool = False) -> None:
        self._open_log_file()
        try:
            self._run(denoise=denoise)
        finally:
            self.close_log_file()

    def _run(self, denoise: bool = False) -> None:
        tc = self.train_config
        if self._pending_skip:
            self.log(f"replaying {self._pending_skip} batches for "
                     f"continued pretrain")
            self.train_data.skip_batches(
                self._pending_skip, tc.batch_size, denoise=denoise,
                block_size=self.model_config.block_size)
            self._pending_skip = 0
        trainable = self.lora if tc.use_lora else self.params
        frozen = self.params if tc.use_lora else None

        tokens_per_step = (tc.batch_size * tc.gradient_accumulation_steps *
                           self.model_config.block_size)
        self.log(f"training: batch={tc.batch_size} accum="
                 f"{tc.gradient_accumulation_steps} tokens/step={tokens_per_step}")

        start_step = self.step_count
        win_t0, win_steps = time.time(), 0
        while self.step_count < self.max_steps:
            # eval + checkpoint policy (reference: train.py:391-430,
            # incl. its `iter > start_step` gate: no untrained-model
            # checkpoint at step 0, no redundant eval+save on resume)
            if (self.step_count % tc.eval_interval == 0
                    and self.step_count > start_step):
                tr_loss, val_loss = self.estimate_loss(trainable, frozen)
                self.log(f"Step {self.step_count} | Eval | TrainLoss: "
                         f"{tr_loss:.4f} | ValLoss: {val_loss:.4f}")
                improved = val_loss < self.best_val_loss
                if improved:
                    self.best_val_loss = val_loss
                if improved or self.step_count % self.forced_save_every == 0:
                    self.save_checkpoint()

            # timing window restarts AFTER eval/checkpoint so the logged
            # ms/step + GFLOP/s never fold eval time in
            if self.step_count % tc.eval_interval == 0:
                win_t0, win_steps = time.time(), 0
            # NOTE: batch prep overlaps device compute for free — the
            # previous _train_step call dispatched asynchronously, so
            # this host-side work runs while the chip is still busy (the
            # reference needed an explicit async prefetch between fwd
            # and bwd, train.py:448-449; JAX's async dispatch subsumes it)
            xs, ys, ms = self._get_accum_batch(denoise=denoise)
            trainable, self.opt_state, loss = self._train_step(
                trainable, frozen, self.opt_state, xs, ys, ms)
            # keep the public handles pointing at live (non-donated) buffers
            if tc.use_lora:
                self.lora = trainable
            else:
                self.params = trainable

            self.step_count += 1
            win_steps += 1
            # throttle async dispatch: without an occasional readback an
            # unbounded in-flight queue can wedge XLA:CPU's in-process
            # collectives (observed as a stuck AllReduce check-failure
            # after ~100 steps with log_interval=inf); one scalar sync
            # every 16 steps costs nothing
            if self.step_count % 16 == 0:
                jax.block_until_ready(loss)
            if self.step_count % tc.log_interval == 0:
                # the loss READBACK is the completion barrier: dispatch is
                # async (and block_until_ready does not force completion
                # through the axon tunnel), so ms/step must be averaged
                # over the whole window AFTER fetching a value that
                # depends on every step in it — per-step host timing
                # reported dispatch cost, inflating GFLOP/s ~5x past the
                # chip's peak
                loss_f = float(loss)
                dt = (time.time() - win_t0) / max(win_steps, 1)
                win_t0, win_steps = time.time(), 0
                self.loss_history.append((self.step_count, loss_f))
                # flop_per_token is the PaLM fwd+bwd formula (6N + 12LHQT)
                # already — no extra factor, same semantics as the
                # reference's log line (reference: train.py:485)
                flops = self.flop_per_token * tokens_per_step / dt
                self.log(
                    f"Epoch: {self.train_data.epoch} | Step: {self.step_count} "
                    f"| Loss: {loss_f:.4f} | {dt*1000:.0f} ms/step, "
                    f"{flops/1e9:.1f} GFLOP/s, {tokens_per_step/dt:.0f} tokens/s")

        self.save_checkpoint()
        self.log("training finished")
