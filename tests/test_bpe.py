"""CLIP BPE engine parity vs transformers.CLIPTokenizer on shared files.

The real OpenAI vocab cannot ship in this zero-egress environment, so the
algorithm is pinned instead: a synthetic vocab/merges pair is written to
disk and both tokenizers — the framework's ``ClipBPETokenizer`` and HF's
``CLIPTokenizer`` — load the SAME files; ids must match exactly.  This is
the executed-parity analog of tests/test_clip_parity.py for the text side
(reference: graph generation (1).ipynb cells 12-15 CLIP tokenization).
"""

import json

import numpy as np
import pytest

from patent_tpu.data.bpe import ClipBPETokenizer, _bytes_to_unicode, load_clip_bpe


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    """GPT-2-fixture-style tiny vocab: every printable ASCII byte symbol,
    its </w> form, a few merges, and the CLIP special tokens."""
    d = tmp_path_factory.mktemp("clip_tok")
    b2u = _bytes_to_unicode()
    syms = [b2u[b] for b in range(33, 127)] + [b2u[ord(" ")]]
    vocab = {}
    for s in syms:
        vocab.setdefault(s, len(vocab))
        vocab.setdefault(s + "</w>", len(vocab))
    merges = ["#version: 0.2", "l o", "lo w</w>", "e r</w>", "l l",
              "h e", "he ll", "hell o</w>"]
    for m in merges[1:]:
        vocab.setdefault("".join(m.split()), len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text("\n".join(merges) + "\n", encoding="utf-8")
    return d


@pytest.fixture(scope="module")
def hf_tok(vocab_dir):
    transformers = pytest.importorskip("transformers")
    return transformers.CLIPTokenizer(str(vocab_dir / "vocab.json"),
                                      str(vocab_dir / "merges.txt"))


TEXTS = [
    "lower newer",
    "hello hello world",
    "A01G: horticulture; cultivation of vegetables",
    "Display screen with graphical user interface!",
    "x",
    "",
    "  spaced   out\ttabs  ",
    "mix3d 4lphanumer1c t0kens",
]


def test_ids_match_hf_exactly(vocab_dir, hf_tok):
    ours = ClipBPETokenizer(str(vocab_dir / "vocab.json"),
                            str(vocab_dir / "merges.txt"))
    for text in TEXTS:
        got = ours.encode(text)
        want = hf_tok(text, add_special_tokens=False)["input_ids"]
        assert got == want, f"mismatch on {text!r}: {got} vs {want}"


def test_framed_row_matches_hf_padding(vocab_dir, hf_tok):
    ours = ClipBPETokenizer(str(vocab_dir / "vocab.json"),
                            str(vocab_dir / "merges.txt"), context_length=16)
    for text in TEXTS:
        got = ours(text)
        want = hf_tok(text, padding="max_length", truncation=True,
                      max_length=16)["input_ids"]
        assert got.shape == (16,)
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, np.asarray(want))


def test_merge_order_respected(vocab_dir):
    ours = ClipBPETokenizer(str(vocab_dir / "vocab.json"),
                            str(vocab_dir / "merges.txt"))
    # "hello" → h e l l o</w> → (h e) → (l l) → (he ll) → (hell o</w>)
    assert ours._bpe("hello") == ["hello</w>"]
    # "low" → l o w</w> → (l o) → (lo w</w>)
    assert ours._bpe("low") == ["low</w>"]


def test_eot_always_survives_truncation(vocab_dir):
    ours = ClipBPETokenizer(str(vocab_dir / "vocab.json"),
                            str(vocab_dir / "merges.txt"), context_length=8)
    row = ours("hello " * 50)
    assert row[0] == ours.sot
    assert row[-1] == ours.eot


def test_load_clip_bpe_gates_on_files(vocab_dir, tmp_path):
    assert load_clip_bpe(str(vocab_dir)) is not None
    assert load_clip_bpe(str(tmp_path)) is None


def test_tokenizer_preference_order(vocab_dir):
    from patent_tpu.data.text_features import clip_tokenizer_or_fallback
    from patent_tpu.models.vit import TEXT_TINY

    tok = clip_tokenizer_or_fallback(str(vocab_dir), TEXT_TINY)
    assert isinstance(tok, ClipBPETokenizer)
    tok2 = clip_tokenizer_or_fallback(None, TEXT_TINY)
    assert not isinstance(tok2, ClipBPETokenizer)   # hashing fallback
