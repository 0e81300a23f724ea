"""ctypes binding for the C++ host engine (cpp/, built as libnano.so).

The C++ engine is the framework's portable CPU artifact — same role as
the reference's C engine (reference: infer/infer.c): it consumes the same
.bin files as the TPU engine and serves as a cross-engine numerics oracle
and an edge-deploy target.  This module wraps its flat C API (cpp/capi.cpp).

Build: ``make -C cpp all`` (produces build/libnano.so, build/nano_cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB_PATH = os.path.join(_REPO, "build", "libnano.so")


CLI_PATH = os.path.join(_REPO, "build", "nano_cpp")


def build(force: bool = False) -> bool:
    """Build libnano.so + nano_cpp via the cpp/ Makefile; returns success.

    Builds ``all`` (not just ``lib``): the test suite also drives the
    ``build/nano_cpp`` CLI, and a clean tree must self-build both.
    """
    if os.path.exists(LIB_PATH) and os.path.exists(CLI_PATH) and not force:
        return True
    r = subprocess.run(["make", "-C", os.path.join(_REPO, "cpp"), "all"],
                       capture_output=True)
    return (r.returncode == 0 and os.path.exists(LIB_PATH)
            and os.path.exists(CLI_PATH))


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(LIB_PATH) and not build():
        raise RuntimeError("libnano.so not built; run `make -C cpp lib`")
    lib = ctypes.CDLL(LIB_PATH)
    lib.nano_open.restype = ctypes.c_void_p
    lib.nano_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.nano_close.argtypes = [ctypes.c_void_p]
    lib.nano_vocab_size.argtypes = [ctypes.c_void_p]
    lib.nano_vocab_size.restype = ctypes.c_int
    lib.nano_set_sampler.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                     ctypes.c_float, ctypes.c_float,
                                     ctypes.c_ulonglong]
    lib.nano_attach_lora.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.nano_attach_lora.restype = ctypes.c_int
    lib.nano_detach_lora.argtypes = [ctypes.c_void_p]
    lib.nano_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.nano_encode.restype = ctypes.c_int
    lib.nano_decode.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                                ctypes.c_char_p, ctypes.c_int]
    lib.nano_decode.restype = ctypes.c_int
    lib.nano_generate.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.nano_generate.restype = ctypes.c_int
    lib.nano_forward.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_float)]
    lib.nano_forward.restype = ctypes.c_int
    lib.nano_seq2seq.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int)]
    lib.nano_seq2seq.restype = ctypes.c_int
    _lib = lib
    return lib


class CppEngine:
    """One loaded model + runtime (KV cache) + sampler."""

    def __init__(self, model_path: str, max_seq_len: int = 0,
                 temperature: float = 1.0, top_p: float = 0.8,
                 repetition_penalty: float = 1.1, seed: int = 39):
        self._lib = _load()
        self._h = self._lib.nano_open(model_path.encode(), max_seq_len)
        if not self._h:
            raise RuntimeError(f"C++ engine failed to load {model_path}")
        self.set_sampler(temperature, top_p, repetition_penalty, seed)

    def close(self):
        if self._h:
            self._lib.nano_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def vocab_size(self) -> int:
        return self._lib.nano_vocab_size(self._h)

    def set_sampler(self, temperature: float, top_p: float = 0.8,
                    repetition_penalty: float = 1.1, seed: int = 39):
        self._lib.nano_set_sampler(self._h, temperature, top_p,
                                   repetition_penalty, seed)

    def attach_lora(self, path: str):
        if self._lib.nano_attach_lora(self._h, path.encode()) != 0:
            raise RuntimeError(f"failed to attach LoRA {path}")

    def detach_lora(self):
        self._lib.nano_detach_lora(self._h)

    def encode(self, text: str) -> List[int]:
        cap = max(16, len(text) * 4 + 16)
        buf = (ctypes.c_int * cap)()
        n = self._lib.nano_encode(self._h, text.encode(), buf, cap)
        if n < 0:
            raise RuntimeError("nano_encode failed")
        return list(buf[:min(n, cap)])

    def decode(self, ids: List[int]) -> str:
        arr = (ctypes.c_int * len(ids))(*ids)
        cap = len(ids) * 16 + 16
        while True:
            out = ctypes.create_string_buffer(cap)
            n = self._lib.nano_decode(self._h, arr, len(ids), out, cap)
            if n + 1 <= cap:
                return out.raw[:n].decode("utf-8", errors="replace")
            cap = n + 1          # some tokens exceed 16 bytes; retry

    def generate(self, prompt_ids: List[int], max_new_tokens: int
                 ) -> List[int]:
        arr = (ctypes.c_int * len(prompt_ids))(*prompt_ids)
        out = (ctypes.c_int * max_new_tokens)()
        n = self._lib.nano_generate(self._h, arr, len(prompt_ids),
                                    max_new_tokens, out, max_new_tokens)
        if n < 0:
            raise RuntimeError(
                "nano_generate failed (invalid prompt ids?)")
        return list(out[:n])

    def forward(self, token: int, pos: int) -> "list[float]":
        import numpy as np
        out = np.zeros(self.vocab_size, np.float32)
        rc = self._lib.nano_forward(
            self._h, token, pos,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc < 0:
            raise RuntimeError(
                f"nano_forward failed (token={token}, pos={pos})")
        return out

    def seq2seq(self, input_ids: List[int]) -> List[int]:
        arr = (ctypes.c_int * len(input_ids))(*input_ids)
        out = (ctypes.c_int * len(input_ids))()
        n = self._lib.nano_seq2seq(self._h, arr, len(input_ids), out)
        if n < 0:
            raise RuntimeError(
                "nano_seq2seq failed (too-long input or non-nano arch?)")
        return list(out[:n])
