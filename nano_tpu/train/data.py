"""Training data loader: curriculum over shards, epoch tracking, batch
construction for causal / seq2seq / denoise objectives.

Behavior parity with the reference DataLoader (reference: train.py:30-119):
  * a curriculum ("course") is an ordered list of dataset files; when one
    is exhausted the loader moves to the next, and wraps back to the first
    incrementing `epoch`.
  * causal batches: x = ids[:, 0:block], y = ids[:, 1:block+1], mask = all
    ones (pretrain) or the stored SFT mask shifted like y.
  * seq2seq (non-causal) batches: x = ids[:, 0:block], y = ids[:, block:2*block].
  * denoise batches: y = x; x gets random positions replaced by the mask
    token with a per-sample masking probability.

Differences by design: shards are dense .npz matrices (mmap-able, random
access) instead of base64-pickle lines, the reference's per-rank
interleaved batch skipping (train.py:311-318) is replaced by a global
batch that the mesh shards over the "data" axis, and `skip_batches`
provides resume-replay (reference: train.py:374-377).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from nano_tpu.data.preprocess import load_shard, read_base64_dataset

MASK_TOKEN_ID = 7  # <|nano_meta_0|> (reference: train.py:26)


class _Shard:
    def __init__(self, path: str):
        self.path = path
        if path.endswith(".npz"):
            self.ids, self.mask = load_shard(path)
        else:  # reference base64-line format
            self.ids, self.mask = read_base64_dataset(path)
        self.n = len(self.ids)


class DataLoader:
    """Curriculum loader over token shards."""

    def __init__(self, filepath_list: Sequence[str], seed: int = 39,
                 shuffle: bool = False):
        assert len(filepath_list) > 0
        self.shards = [_Shard(p) for p in filepath_list]
        self.course = 0
        self.pos = 0
        self.epoch = 0
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)
        self._orders = [np.arange(s.n) for s in self.shards]
        if shuffle:
            for o in self._orders:
                self._rng.shuffle(o)

    def _advance_course(self) -> None:
        self.course += 1
        self.pos = 0
        if self.course >= len(self.shards):
            self.course = 0
            self.epoch += 1
            if self.shuffle:
                for o in self._orders:
                    self._rng.shuffle(o)

    def _take(self, n: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Take n samples, crossing shard boundaries as needed."""
        ids_parts, mask_parts = [], []
        need = n
        width = None
        while need > 0:
            shard = self.shards[self.course]
            order = self._orders[self.course]
            if self.pos >= shard.n:
                self._advance_course()
                continue
            take = min(need, shard.n - self.pos)
            sel = order[self.pos:self.pos + take]
            ids = shard.ids[sel]
            width = max(width or 0, ids.shape[1])
            ids_parts.append(ids)
            if shard.mask is not None:
                mask_parts.append(shard.mask[sel])
            else:
                mask_parts.append(np.ones_like(ids, np.uint8))
            self.pos += take
            need -= take
            if self.pos >= shard.n:
                self._advance_course()

        def fit(a, w):  # batches may span shards of different widths
            if a.shape[1] == w:
                return a
            if a.shape[1] > w:
                return a[:, :w]
            return np.pad(a, ((0, 0), (0, w - a.shape[1])))

        return (np.concatenate([fit(a, width) for a in ids_parts]
                               ).astype(np.int32),
                np.concatenate([fit(a, width) for a in mask_parts]
                               ).astype(np.int32))

    def get_batch(self, batch_size: int, block_size: int,
                  is_causal: bool = True, denoise: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids, mask = self._take(batch_size)
        if denoise:
            x = ids[:, :block_size]
            m = mask[:, :block_size]
            if x.shape[1] < block_size:
                # normalize to block_size: widths vary across shards and
                # a ragged width would recompile (or crash np.stack in)
                # the accum scan; padded positions carry mask 0
                pad = block_size - x.shape[1]
                x = np.pad(x, ((0, 0), (0, pad)))
                m = np.pad(m, ((0, 0), (0, pad)))
            x = x.copy()
            y = x.copy()
            p = self._rng.rand(batch_size, 1)
            noise = self._rng.rand(batch_size, block_size) < p
            x[noise] = MASK_TOKEN_ID
            return x, y, m.astype(np.int32)
        if is_causal:
            x = ids[:, 0:block_size]
            y = ids[:, 1:block_size + 1]
            m = mask[:, 1:block_size + 1]
            if m.shape[1] < block_size:  # shard narrower than block+1
                pad = block_size - m.shape[1]
                y = np.pad(y, ((0, 0), (0, pad)))
                m = np.pad(m, ((0, 0), (0, pad)))
                x = np.pad(x, ((0, 0), (0, block_size - x.shape[1])))
            return x, y, m
        # seq2seq: input | output halves (reference: train.py:110-118)
        x = ids[:, 0:block_size]
        y = ids[:, block_size:block_size * 2]
        m = mask[:, 0:block_size]
        if x.shape[1] < block_size:
            pad = block_size - x.shape[1]
            x = np.pad(x, ((0, 0), (0, pad)))
            m = np.pad(m, ((0, 0), (0, pad)))
        y_valid = y.shape[1]
        if y_valid < block_size:
            # short output half: padded TARGET positions must weigh 0
            # or the loss trains against fake token-0 targets
            y = np.pad(y, ((0, 0), (0, block_size - y_valid)))
            m = m.copy()
            m[:, y_valid:] = 0
        return x, y, m

    def state(self) -> tuple:
        """Full stream snapshot: position plus RNG state and shuffle
        orders, so save/restore is side-effect free even when an eval read
        crosses an epoch boundary (which reshuffles) or uses denoise
        (which draws from the RNG)."""
        return (self.course, self.pos, self.epoch,
                self._rng.get_state(),
                [o.copy() for o in self._orders] if self.shuffle else None)

    def set_state(self, st: tuple) -> None:
        self.course, self.pos, self.epoch = st[:3]
        if len(st) > 3:
            self._rng.set_state(st[3])
            if st[4] is not None:
                self._orders = [o.copy() for o in st[4]]

    def skip_batches(self, n: int, batch_size: int) -> None:
        """Fast-forward the stream by index arithmetic (resume replay,
        reference: train.py:374-377).

        Walks the exact (course, pos, epoch) trajectory of n _take calls
        — including the per-epoch reshuffles — but gathers no data: a
        resume at step 100k previously re-read the entire dataset
        through fancy-indexing just to discard it.
        """
        remaining = n * batch_size
        while remaining > 0:
            shard = self.shards[self.course]
            if self.pos >= shard.n:
                self._advance_course()
                continue
            take = min(remaining, shard.n - self.pos)
            self.pos += take
            remaining -= take
            if self.pos >= shard.n:
                self._advance_course()

    @property
    def total_samples(self) -> int:
        return sum(s.n for s in self.shards)
