"""Derive standalone charset + prebuilt vocab files for the small presets.

The 4096/6000/8192 preset recipes read a charset file in FILE ORDER
(reference: tokenizer.py:378-414).  The reference ships those charsets as
data (tokenizer/charset_*.txt); this repo derives its own copies from the
published vocab JSONs (`presets.extract_content_tokens` — the reverse of
`build_from_tokens`, a round-trip the parity tests assert) so that
`build_preset` and the encode-parity tests work on a clean tree with no
reference checkout mounted.

Writes, for each size in {4096, 6000, 8192}:
    tokenizer/charset_<size>.txt    one token per line, C-escapes
    tokenizer/nano_<size>.json      the prebuilt vocab (matches the
                                    reference file byte-for-values)

Run once:  python tools/make_charsets.py [reference_tokenizer_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nano_tpu.tokenizer import presets  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tokenizer")

_ESCAPES = [("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
            ("\f", "\\f"), ("\b", "\\b")]


def escape(tok: str) -> str:
    for ch, esc in _ESCAPES:
        tok = tok.replace(ch, esc)
    return tok


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tokenizer"
    for size in (4096, 6000, 8192):
        src = os.path.join(ref, f"tokenizer_{size}.json")
        tokens = presets.extract_content_tokens(src)
        charset_path = os.path.join(OUT, f"charset_{size}.txt")
        with open(charset_path, "w", encoding="utf-8") as f:
            for t in tokens:
                f.write(escape(t) + "\n")
        # verify the round-trip BEFORE shipping: charset file -> build ->
        # identical itos/stoi as the source vocab
        tok = presets.build_from_charset_file(charset_path)
        import json
        with open(src, "r", encoding="utf-8") as f:
            want = json.load(f)
        assert tok.itos == want["itos"], f"itos mismatch for {size}"
        assert tok.stoi == {k: int(v) for k, v in want["stoi"].items()}, \
            f"stoi mismatch for {size}"
        vocab_path = os.path.join(OUT, f"nano_{size}.json")
        tok.dump_config_file(vocab_path)
        print(f"wrote charset_{size}.txt ({len(tokens)} tokens) + "
              f"nano_{size}.json")

    # The big presets: rebuild through OUR recipe from the reference v2
    # content (the v2 files predate the 5 nano_meta specials, so ids
    # shift by construction — token-level parity is the contract, which
    # test_preset_decompose_rebuild_roundtrip asserts).  The result is a
    # FIXED POINT of presets.build_preset(size, from_vocab=...): running
    # the decompose->recompose cycle on the shipped file reproduces it
    # exactly, which the standalone test relies on.  Sizes run a few
    # tokens over the nominal power of two (12 specials vs v2's 7).
    for size in (16384, 32768):
        src = os.path.join(ref, f"tokenizer_{size}_v2.json")
        tok = presets.build_preset(size, from_vocab=src)
        out_path = os.path.join(OUT, f"nano_{size}.json")
        tok.dump_config_file(out_path)
        # fixed-point check
        tok2 = presets.build_preset(size, from_vocab=out_path)
        assert tok2.itos == tok.itos, f"not a fixed point: {size}"
        print(f"wrote nano_{size}.json ({tok.vocab_size} tokens, "
              "fixed point of the preset recipe)")


if __name__ == "__main__":
    main()
