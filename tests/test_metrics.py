"""Metric parity vs sklearn and sanity of AUPRO / metrics_eval."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from aaclip_tpu.eval.metrics import (
    aupro,
    auroc,
    average_precision,
    metrics_eval,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auroc_ap_match_sklearn(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    labels = rng.random(n) > 0.8
    scores = rng.standard_normal(n) + labels * rng.uniform(0, 2)
    # inject ties
    scores = np.round(scores, 2)
    np.testing.assert_allclose(auroc(labels, scores),
                               roc_auc_score(labels, scores), atol=1e-10)
    np.testing.assert_allclose(average_precision(labels, scores),
                               average_precision_score(labels, scores),
                               atol=1e-10)


def test_aupro_perfect_predictor():
    rng = np.random.default_rng(3)
    masks = np.zeros((4, 32, 32), bool)
    masks[0, 5:12, 5:12] = True
    masks[1, 20:28, 3:9] = True
    masks[2, 10:14, 10:30] = True
    preds = masks.astype(np.float64) + rng.random(masks.shape) * 0.01
    assert aupro(masks, preds) > 0.95


def test_aupro_random_predictor_is_low():
    rng = np.random.default_rng(4)
    masks = np.zeros((4, 32, 32), bool)
    masks[0, 5:12, 5:12] = True
    preds = rng.random(masks.shape)
    v = aupro(masks, preds)
    assert 0.0 <= v < 0.5


def test_metrics_eval_reference_semantics():
    rng = np.random.default_rng(5)
    n, h = 8, 16
    masks = np.zeros((n, 1, h, h), np.float32)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    for i in range(4, 8):
        masks[i, 0, 2:6, 2:6] = 1
    preds = rng.random((n, h, h)) * 0.2 + masks[:, 0] * 0.7
    img_preds = rng.random(n) * 0.2 + labels * 0.7
    row = metrics_eval(masks, labels, preds, img_preds, "bottle",
                       "Industrial", compute_aupro=True)
    assert row["class name"] == "bottle"
    assert row["pixel AUC"] > 95
    assert row["image AUC"] > 95
    assert "pixel AUPRO" in row
    # single-label image set -> image metrics forced to 0
    row2 = metrics_eval(masks[4:], labels[4:], preds[4:], img_preds[4:],
                        "x", "Medical")
    assert row2["image AUC"] == 0 and row2["image AP"] == 0


def test_metrics_eval_medical_uses_pixel_max_only():
    rng = np.random.default_rng(6)
    n, h = 6, 8
    masks = np.zeros((n, 1, h, h), np.float32)
    masks[3:, 0, 1:4, 1:4] = 1
    labels = np.array([0, 0, 0, 1, 1, 1])
    preds = rng.random((n, h, h)) * 0.1 + masks[:, 0]
    # image_preds deliberately anti-correlated: Medical must ignore them
    img_preds = 1.0 - labels.astype(np.float64)
    row = metrics_eval(masks, labels, preds, img_preds, "Brain", "Medical")
    assert row["image AUC"] == 100.0


def test_native_matches_numpy_paths():
    """Native C++ kernel vs numpy fallback vs sklearn on tied data."""
    from aaclip_tpu import native
    from aaclip_tpu.eval.metrics import _ap_numpy, _auroc_numpy

    if not native.native_available():
        pytest.skip("no compiler")
    rng = np.random.default_rng(7)
    labels = rng.random(20000) > 0.7
    scores = np.round(rng.standard_normal(20000) + labels, 2).astype(np.float32)
    a_n, p_n = native.auroc_ap(labels, scores)
    np.testing.assert_allclose(a_n, _auroc_numpy(labels, scores), atol=1e-10)
    np.testing.assert_allclose(p_n, _ap_numpy(labels, scores), atol=1e-10)
    np.testing.assert_allclose(a_n, roc_auc_score(labels, scores), atol=1e-10)
    np.testing.assert_allclose(p_n, average_precision_score(labels, scores), atol=1e-10)


def test_native_label_components_matches_scipy():
    from aaclip_tpu import native

    if not native.native_available():
        pytest.skip("no compiler")
    from scipy import ndimage
    rng = np.random.default_rng(8)
    m = rng.random((64, 64)) > 0.6
    lab_n, n_n = native.label_components(m)
    lab_s, n_s = ndimage.label(m)
    assert n_n == n_s
    # identical partitions modulo label permutation
    mapping = {}
    for a, b in zip(lab_n.ravel(), lab_s.ravel()):
        assert (a == 0) == (b == 0)
        if a:
            assert mapping.setdefault(a, b) == b
