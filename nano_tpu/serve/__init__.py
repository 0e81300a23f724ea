"""Serving: continuous batching + WebSocket streaming (phase-7 frontends)."""

from nano_tpu.serve.batching import BatchedEngine  # noqa: F401
