"""Tokenizer checks: golden ids for canonical CLIP strings, round-trip
decode, prompt-set shape, and (when constructible) parity with the
independent HuggingFace CLIPTokenizer implementation."""

import gzip
import json
import os

import numpy as np
import pytest

from aaclip_tpu.text.bpe import VOCAB_PATH, default_tokenizer, tokenize
from aaclip_tpu.data.registry import build_prompts


def test_golden_ids_canonical_clip():
    # canonical tokenization of CLIP's favorite sentence
    ids = tokenize(["a photo of a cat."])[0]
    assert ids[0] == 49406  # <|startoftext|>
    eot_pos = int(np.argmax(ids))
    assert ids[eot_pos] == 49407
    assert list(ids[1:eot_pos]) == [320, 1125, 539, 320, 2368, 269]
    assert ids.dtype == np.int32
    assert (ids[eot_pos + 1:] == 0).all()


def test_special_token_literals_map_to_special_ids():
    """The reference tokenizer pre-seeds its BPE cache so the special-token
    literals encode to their reserved ids instead of being greedy-merged
    into subwords (model/tokenizer.py:87) — round-3 parity fix."""
    tok = default_tokenizer()
    assert tok.encode("<|startoftext|>") == [tok.sot_token]
    assert tok.encode("<|endoftext|>") == [tok.eot_token]
    assert tok.encode("a <|endoftext|> b")[1] == tok.eot_token


def test_round_trip():
    tok = default_tokenizer()
    s = "a damaged dark bottle with flaw."
    # BPE decode re-spaces word boundaries, so punctuation gains a space
    assert tok.decode(tok.encode(s)).replace(" .", ".").strip() == s


def test_prompt_set_shapes():
    normal, abnormal = build_prompts("dark bottle")
    assert len(normal) == 6 and len(abnormal) == 10
    assert normal[0] == "dark bottle."
    assert normal[1] == "a photo of dark bottle."
    assert abnormal[0] == "a damaged dark bottle."
    toks = tokenize(normal + abnormal)
    assert toks.shape == (16, 77)


def test_vocab_size():
    assert default_tokenizer().vocab_size == 49408


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    """Build a HuggingFace slow CLIPTokenizer from the same merge table."""
    try:
        from transformers import CLIPTokenizer
    except ImportError:
        pytest.skip("transformers unavailable")
    d = tmp_path_factory.mktemp("hf_tok")
    with gzip.open(VOCAB_PATH, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    merges = lines[1: 49152 - 256 - 2 + 1]
    tok = default_tokenizer()
    vocab_file = os.path.join(d, "vocab.json")
    merges_file = os.path.join(d, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump(tok.encoder, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges))
    try:
        return CLIPTokenizer(vocab_file, merges_file)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"could not build HF tokenizer: {e}")


def test_parity_with_huggingface(hf_tokenizer):
    tok = default_tokenizer()
    sentences = []
    for rn in ["dark bottle", "metal nut which has four notched edges",
               "oval white pill with small red speckles and the letters 'FF' engraved",
               "colon endoscopy image", "scan"]:
        n, a = build_prompts(rn)
        sentences += n + a
    for s in sentences:
        ours = tok.encode(s)
        theirs = hf_tokenizer(s, add_special_tokens=False)["input_ids"]
        assert ours == theirs, f"mismatch for {s!r}: {ours} vs {theirs}"


def test_fuzz_parity_with_huggingface(hf_tokenizer):
    """Random printable-ASCII fuzz: the merge loop, byte encoder, cache,
    and whitespace cleanup must match HF on arbitrary text, not just
    prompt-shaped sentences."""
    import random

    rng = random.Random(1234)
    alphabet = ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
                "0123456789 .,!?-_'\"()/:;%$#@&*+=<>[]{}|\\~`^\n\t")
    tok = default_tokenizer()
    for _ in range(200):
        n = rng.randint(1, 60)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        ours = tok.encode(s)
        theirs = hf_tokenizer(s, add_special_tokens=False)["input_ids"]
        assert ours == theirs, f"mismatch for {s!r}: {ours} vs {theirs}"
