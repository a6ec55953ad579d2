"""Disk-cached text anchors: key coverage, hit/miss behavior, corruption
recovery, and the serving-engine wiring (reference re-derives anchors from
scratch every process start, forward_utils.py:131-192; the cache is a
TPU-deployment addition for slow-link cold-start)."""

import numpy as np
import pytest

from aaclip_tpu.text.anchors import (
    SENTENCES_PER_CLASS,
    dataset_prompt_tokens,
    encode_dataset_anchors,
    encode_dataset_anchors_cached,
)

CLASSES = ["bottle", "cable"]
D = 8


def _make_encode_fn():
    """Deterministic token->embedding map with a call counter."""
    rng = np.random.default_rng(7)
    W = rng.standard_normal((77, D)).astype(np.float32)
    calls = []

    def encode_fn(tokens):
        calls.append(1)
        return np.asarray(tokens, np.float32) @ W

    return encode_fn, calls


def test_cached_matches_uncached_and_skips_recompute(tmp_path):
    enc, calls = _make_encode_fn()
    want = {k: np.asarray(v) for k, v in
            encode_dataset_anchors(enc, "MVTec", CLASSES).items()}
    assert len(calls) == 1

    got = encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path),
                                        CLASSES)
    assert len(calls) == 2  # miss: computed and wrote
    assert set(got) == set(CLASSES)
    for k in CLASSES:
        np.testing.assert_array_equal(got[k], want[k])

    again = encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path),
                                          CLASSES)
    assert len(calls) == 2  # hit: encode_fn not called
    for k in CLASSES:
        np.testing.assert_array_equal(again[k], want[k])
    assert len(list(tmp_path.glob("anchors_*.npz"))) == 1


def test_key_separates_identity_dataset_and_classes(tmp_path):
    enc, calls = _make_encode_fn()
    encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path), CLASSES)
    encode_dataset_anchors_cached(enc, "MVTec", "id-b", str(tmp_path), CLASSES)
    encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path),
                                  ["bottle"])
    assert len(calls) == 3  # three distinct keys, three computes
    assert len(list(tmp_path.glob("anchors_*.npz"))) == 3


def test_corrupt_entry_is_rebuilt(tmp_path):
    enc, calls = _make_encode_fn()
    first = encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path),
                                          CLASSES)
    (entry,) = tmp_path.glob("anchors_*.npz")
    entry.write_bytes(b"not an npz")
    rebuilt = encode_dataset_anchors_cached(enc, "MVTec", "id-a",
                                            str(tmp_path), CLASSES)
    assert len(calls) == 2
    for k in CLASSES:
        np.testing.assert_array_equal(rebuilt[k], first[k])
    # and the rebuilt entry is a valid hit again
    encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path), CLASSES)
    assert len(calls) == 2


def test_wrong_class_count_entry_is_not_trusted(tmp_path):
    """A shape-mismatched entry (e.g. stale from a different split with a
    colliding key) recomputes instead of mis-indexing."""
    enc, calls = _make_encode_fn()
    encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path), CLASSES)
    (entry,) = tmp_path.glob("anchors_*.npz")
    with np.load(entry) as z:
        arr = z["anchors"]
    np.savez(entry, anchors=arr[:1])  # truncate to 1 class
    got = encode_dataset_anchors_cached(enc, "MVTec", "id-a", str(tmp_path),
                                        CLASSES)
    assert len(calls) == 2
    assert got["cable"].shape == arr[1].shape


def test_engine_anchor_cache_roundtrip(tmp_path):
    """The engine with anchor_cache produces the fixture engine's anchors
    bit-exactly and leaves reusable entries on disk."""
    from aaclip_tpu.serve.server import InferenceEngine

    kwargs = dict(model_name="tiny-test", img_size=70, datasets=("MVTec",),
                  precision="fp32", max_batch=4,
                  adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                                   text_adapt_until=1))
    plain = InferenceEngine(**kwargs)
    try:
        want = plain.anchors["MVTec"]
    finally:
        plain.shutdown()

    cached = InferenceEngine(anchor_cache=str(tmp_path), **kwargs)
    try:
        got = cached.anchors["MVTec"]
    finally:
        cached.shutdown()
    assert set(got) == set(want)
    for k, v in want.items():
        np.testing.assert_array_equal(got[k], np.asarray(v))
    assert len(list(tmp_path.glob("anchors_*.npz"))) == 1


def test_serve_cli_anchor_cache_flag():
    """The flag exists on the real CLI (main() maps '' -> disabled)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "serve.py", "--help"], cwd=repo,
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "--anchor_cache" in out.stdout
