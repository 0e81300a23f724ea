"""Closed-loop problems harness: train tiny task models to high exact-match
accuracy — the framework's end-to-end integration test (SURVEY §4)."""

import random

import numpy as np
import pytest

from nano_tpu import problems


def test_q_function_values():
    # q(2024)=1, q(888)=6 (reference examples)
    assert problems.q_function(2024, 4) == "1"
    assert problems.q_function(888, 3) == "6"
    assert problems.q_function(0, 1) == "1"
    assert problems.q_function(11111111, 8) == "0"


def test_gen_sample_shapes():
    p = problems.make_problem("sort", seq_length=4)
    rng = random.Random(0)
    ids, mask = p.gen_sample(rng)
    assert len(ids) == 8 and mask is None
    s = p.tokenizer.decode(ids)
    assert s[4:] == "".join(sorted(s[:4]))

    p = problems.make_problem("q", seq_length=4)
    ids, mask = p.gen_sample(rng)
    assert len(ids) == 7 and sum(mask) == 1

    p = problems.make_problem("calculator", expr_max_length=32)
    ids, mask = p.gen_sample(rng)
    assert len(ids) == 33 and sum(mask) == 2


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_sort_task_end_to_end(tmp_path):
    """Train the sort model to >=90% exact match (reference trains to ~100%
    at larger scale; we use seq_length=4 for CPU runtime)."""
    acc = problems.run_problem(
        "sort", str(tmp_path), seq_length=4, max_steps=800, batch_size=64,
        n_train=8000, n_val=500, n_eval=300, learning_rate=2e-3,
        dtype="float32")
    assert acc >= 0.9, acc


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_palindrome_task_end_to_end(tmp_path):
    acc = problems.run_problem(
        "palindrome", str(tmp_path), seq_length=4, max_steps=800,
        batch_size=64, n_train=8000, n_val=500, n_eval=300,
        learning_rate=2e-3, dtype="float32")
    assert acc >= 0.9, acc
