"""Trie tokenizer tests: round-trip, greedy longest-match, reference parity."""

import json
import os

import pytest

from nano_tpu.tokenizer.trie import TrieTokenizer, SPECIAL_TOKENS, apply_instruct_template
from .conftest import REFERENCE_DIR, reference_available


def make_toy_tokenizer():
    tok = TrieTokenizer()
    tok.build(list("abcdefgh 0123456789") + ["ab", "abc", "hello"])
    return tok


def test_build_special_ids():
    tok = make_toy_tokenizer()
    for name, tid in SPECIAL_TOKENS.items():
        assert tok.stoi[name] == tid
    assert tok.itos[0] == "<|padding|>"
    assert tok.vocab_size == len(tok.itos)


def test_greedy_longest_match():
    tok = make_toy_tokenizer()
    ids = tok.encode("abc")
    # "abc" is in vocab -> single token, not a+b+c or ab+c
    assert len(ids) == 1
    assert tok.itos[ids[0]] == "abc"
    ids = tok.encode("abd")
    assert [tok.itos[i] for i in ids] == ["ab", "d"]


def test_unknown_maps_to_unknown_token():
    tok = make_toy_tokenizer()
    ids = tok.encode("aXb")
    assert ids[1] == SPECIAL_TOKENS["<|unknown|>"]


def test_special_token_literals_encode():
    tok = make_toy_tokenizer()
    text = apply_instruct_template("abc")
    ids = tok.encode(text)
    assert ids[0] == SPECIAL_TOKENS["<|instruct_mark|>"]
    assert ids[-1] == SPECIAL_TOKENS["<|response_mark|>"]


def test_roundtrip():
    tok = make_toy_tokenizer()
    text = "hello 123 abc abd"
    assert tok.decode(tok.encode(text)) == text


def test_config_roundtrip(tmp_path):
    tok = make_toy_tokenizer()
    p = tmp_path / "tok.json"
    tok.dump_config_file(str(p))
    tok2 = TrieTokenizer.from_file(str(p))
    assert tok2.encode("abc hello") == tok.encode("abc hello")
    assert tok2.vocab_size == tok.vocab_size


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_vocab_parity():
    """Load a real reference vocab file and match the reference algorithm."""
    path = os.path.join(REFERENCE_DIR, "tokenizer", "tokenizer_16384_v2.json")
    tok = TrieTokenizer.from_file(path)
    assert tok.vocab_size == 16384

    text = "人类（包括BD4SUR的操作员）的本质是<|response_mark|>复读\t机！<|eos|>\nFour score and seven years ago."
    ids = tok.encode(text)
    assert tok.decode(ids) == text

    # cross-check against the reference implementation itself
    from .conftest import import_reference_module
    ref_tok_mod = import_reference_module("tokenizer")
    ref = ref_tok_mod.Tokenizer()
    ref.load_from_config_file(path)
    assert ref.encode(text) == ids
