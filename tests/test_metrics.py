"""Metric parity vs sklearn and sanity of AUPRO / metrics_eval."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score

from aaclip_tpu.eval.metrics import (
    aupro,
    auroc,
    auroc_ap,
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


def test_metrics_eval_single_class_pixels_are_zero_not_nan():
    """A class with zero anomalous pixels (or all-anomalous pixels) has
    undefined pixel AUROC; sklearn (the reference) would raise. We report
    0.0, mirroring the reference's image-level degenerate-label convention
    (forward_utils.py:264-271) so NaN never reaches the table mean."""
    rng = np.random.default_rng(7)
    n, h = 4, 8
    all_normal = np.zeros((n, 1, h, h), np.float32)
    preds = rng.random((n, h, h))
    img_preds = rng.random(n)
    labels = np.array([0, 0, 1, 1])
    row = metrics_eval(all_normal, labels, preds, img_preds, "x",
                       "Industrial", compute_aupro=True)
    for k in ("pixel AUC", "pixel AP", "pixel AUPRO"):
        assert row[k] == 0.0 and np.isfinite(row[k])
    # image metrics unaffected by the pixel guard
    assert np.isfinite(row["image AUC"])

    all_anom = np.ones((n, 1, h, h), np.float32)
    row = metrics_eval(all_anom, labels, preds, img_preds, "x", "Medical")
    assert row["pixel AUC"] == 0.0 and row["pixel AP"] == 0.0


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


def _naive_aupro(masks, preds, fpr_limit=0.3):
    """Independent oracle: direct transcription of the MVTec AUPRO protocol
    — binarize at EVERY distinct score, FPR over negative pixels, PRO =
    mean per-region overlap, trapezoid to the limit. O(T·P); test-only."""
    from scipy import ndimage

    regions = []
    for i in range(masks.shape[0]):
        lab, n = ndimage.label(masks[i])
        for r in range(1, n + 1):
            regions.append((i, lab == r))
    neg = ~masks
    thresholds = np.unique(preds)[::-1]
    fprs, pros = [0.0], [0.0]
    for t in thresholds:
        b = preds >= t
        fprs.append((b & neg).sum() / neg.sum())
        pros.append(np.mean([b[i][sel].mean() for i, sel in regions]))
    fprs, pros = np.array(fprs), np.array(pros)
    idx = int(np.searchsorted(fprs, fpr_limit, side="right"))
    f, p = fprs[:idx], pros[:idx]
    if f[-1] < fpr_limit and idx < fprs.size:
        w = (fpr_limit - f[-1]) / (fprs[idx] - f[-1])
        f = np.r_[f, fpr_limit]
        p = np.r_[p, p[-1] + w * (pros[idx] - p[-1])]
    return float(np.trapezoid(p, f) / fpr_limit)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_aupro_matches_naive_oracle(seed):
    """Exact event-sweep AUPRO == brute-force all-thresholds protocol, on
    data with multiple images, multiple regions per image, ties, and
    region/background score overlap."""
    rng = np.random.default_rng(seed)
    masks = np.zeros((3, 24, 24), bool)
    masks[0, 2:8, 2:8] = True
    masks[0, 14:20, 14:22] = True   # two regions in one image
    masks[1, 5:7, 5:19] = True
    masks[2, 10:11, 3:4] = True     # single-pixel region
    preds = rng.random(masks.shape)
    preds[masks] += rng.uniform(-0.3, 0.6)  # partial separation
    preds = np.round(preds, 2)              # force ties
    got = aupro(masks, preds)
    want = _naive_aupro(masks, preds)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_auroc_ap_preserves_sub_float32_differences():
    """All auroc_ap paths (native C++ included) must rank at float64: a
    float32 cast would merge sub-f32-ulp score differences into ties and
    diverge from the numpy/sklearn paths (round-3 review finding)."""
    n = 10000
    labels = np.tile([False, True], n // 2)
    scores = np.full(n, 0.5)
    scores[labels] += 1e-9
    auc, ap = auroc_ap(labels, scores)
    assert auc == 1.0 and ap == 1.0


def test_aupro_plateau_boundary_interpolation():
    """A saturated top-score plateau covering more than fpr_limit of the
    negatives leaves only ONE distinct-threshold curve point past the
    limit: the clipped area must interpolate from (0, 0) toward that first
    event like every other boundary crossing — not score a perfect-overlap
    detector 0 (round-3 review finding, verified against the oracle)."""
    masks = np.zeros((1, 24, 24), bool)
    masks[0, 8:16, 8:16] = True            # defect inside the plateau
    preds = np.zeros(masks.shape)
    preds[0, 4:20, 4:20] = 1.0             # plateau: 192/512 negatives (>0.3)
    got = aupro(masks, preds)
    want = _naive_aupro(masks, preds)
    assert got > 0.0
    np.testing.assert_allclose(got, want, atol=1e-12)
    # a constant map interpolates the same way
    const = np.full(masks.shape, 0.7)
    np.testing.assert_allclose(aupro(masks, const),
                               _naive_aupro(masks, const), atol=1e-12)


def test_aupro_analytic_value():
    """Hand-computed AUPRO: one 2-pixel region; negatives dense-uniform on
    [0, 1); region scores 0.85 and 0.55.

    PRO(t) = 0 for t > 0.85, 0.5 for 0.55 < t <= 0.85, 1 for t <= 0.55;
    FPR(t) = 1 - t. As a function of FPR f: PRO = 0 on [0, .15), 0.5 on
    (.15, .45), 1 above. AUPRO@0.3 = (0·0.15 + 0.5·0.15)/0.3 = 0.25.
    """
    side = 100  # 10k negative pixels -> discretization error O(1e-4)
    masks = np.zeros((1, side, side + 1), bool)
    masks[0, 50, 50:52] = True
    preds = np.zeros_like(masks, np.float64)
    neg_vals = np.linspace(0.0, 1.0, side * (side + 1) - 2, endpoint=False)
    preds[~masks] = np.random.default_rng(0).permutation(neg_vals)
    preds[0, 50, 50] = 0.85
    preds[0, 50, 51] = 0.55
    np.testing.assert_allclose(aupro(masks, preds), 0.25, atol=1e-3)

    # AUPRO of a perfect predictor is exactly 1
    perfect = masks.astype(np.float64)
    np.testing.assert_allclose(aupro(masks, perfect), 1.0, atol=1e-12)
