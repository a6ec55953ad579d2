"""Evaluation metrics: pixel/image AUROC + AP (reference
forward_utils.py:233-280 semantics, including min-max normalization and the
domain-dependent image-score aggregation), plus AUPRO (per-region overlap),
which the reference does not compute but the baseline spec requires.

AUROC/AP run through a native C++ kernel (parallel sort + single-pass
curve accumulation, aaclip_tpu/native/) — ~12x faster than sklearn on the
~20M-pixel arrays a full class evaluation produces — with a numpy
sort/cumsum fallback; all paths equal sklearn's roc_auc_score /
average_precision_score.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _binary_clf_curve(labels: np.ndarray, scores: np.ndarray):
    """(fps, tps, thresholds) at each distinct score cut, descending —
    sklearn's internal curve."""
    order = np.argsort(-scores, kind="stable")
    scores = scores[order]
    labels = labels[order]
    distinct = np.where(np.diff(scores))[0]
    idxs = np.r_[distinct, labels.size - 1]
    tps = np.cumsum(labels)[idxs]
    fps = 1 + idxs - tps
    return fps, tps, scores[idxs]


def auroc_ap(labels: np.ndarray, scores: np.ndarray) -> tuple[float, float]:
    """(ROC AUC, AP) — native C++ kernel (parallel sort) when available,
    numpy otherwise; both == sklearn."""
    from aaclip_tpu import native

    res = native.auroc_ap(labels, scores)
    if res is not None:
        return res
    return _auroc_numpy(labels, scores), _ap_numpy(labels, scores)


def auroc(labels: np.ndarray, scores: np.ndarray) -> float:
    """ROC AUC by trapezoidal integration (== sklearn.roc_auc_score)."""
    return auroc_ap(labels, scores)[0]


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """AP = sum (R_i - R_{i-1}) P_i (== sklearn.average_precision_score)."""
    return auroc_ap(labels, scores)[1]


def _auroc_numpy(labels: np.ndarray, scores: np.ndarray) -> float:
    labels = labels.reshape(-1).astype(bool)
    scores = scores.reshape(-1).astype(np.float64)
    fps, tps, _ = _binary_clf_curve(labels, scores)
    if tps[-1] == 0 or fps[-1] == 0:
        return float("nan")
    tpr = np.r_[0.0, tps] / tps[-1]
    fpr = np.r_[0.0, fps] / fps[-1]
    return float(np.trapezoid(tpr, fpr))


def _ap_numpy(labels: np.ndarray, scores: np.ndarray) -> float:
    labels = labels.reshape(-1).astype(bool)
    scores = scores.reshape(-1).astype(np.float64)
    fps, tps, _ = _binary_clf_curve(labels, scores)
    if tps[-1] == 0:
        return float("nan")
    precision = tps / (tps + fps)
    recall = tps / tps[-1]
    return float(np.sum(np.diff(np.r_[0.0, recall]) * precision))


def aupro(masks: np.ndarray, preds: np.ndarray, fpr_limit: float = 0.3) -> float:
    """Area under the per-region-overlap curve up to ``fpr_limit``
    (MVTec-AD protocol), normalized to [0, 1].

    masks: [N, H, W] binary ground truth; preds: [N, H, W] scores.
    Connected components via scipy.ndimage.label (4-connectivity, the
    standard protocol structure).

    Exact over ALL distinct score thresholds — no quantile grid. One event
    sweep: sort every pixel's score descending; each negative pixel
    contributes 1/n_neg to FPR, each pixel of region r contributes
    1/(|r|·n_regions) to PRO; cumulative sums sampled at the last event of
    each distinct score give the full (FPR, PRO) curve for the ``>= t``
    binarization, which is then trapezoid-integrated to ``fpr_limit`` (with
    linear interpolation at the boundary) and normalized.
    """
    from aaclip_tpu import native

    masks = masks.reshape(masks.shape[0], *masks.shape[-2:]).astype(bool)
    preds = preds.reshape(preds.shape[0], *preds.shape[-2:]).astype(np.float64)
    if not masks.any():
        return float("nan")

    def _label(m):
        res = native.label_components(m)
        if res is not None:
            return res
        from scipy import ndimage
        return ndimage.label(m)

    # per-region score arrays across all images — grouped with one masked
    # gather + a sort of only the positive pixels (a per-region full-image
    # boolean scan would be O(n_regions * H * W) per image)
    regions = []
    for i in range(masks.shape[0]):
        if not masks[i].any():
            continue
        lab, n = _label(masks[i])
        lab_f = lab.ravel()
        sel = lab_f > 0
        labs_sel = lab_f[sel]
        vals = preds[i].ravel()[sel]
        order = np.argsort(labs_sel, kind="stable")
        counts = np.bincount(labs_sel, minlength=n + 1)[1:]
        regions.extend(np.split(vals[order], np.cumsum(counts)[:-1]))

    neg_scores = preds[~masks].ravel()
    n_neg = neg_scores.size
    n_regions = len(regions)
    if n_neg == 0:
        return float("nan")

    # ONE big value-sort (the negatives are ~99% of pixels); the region
    # events are merged in with an O(P) np.insert — this avoids a 21M-element
    # argsort and mass searchsorted, which dominate wall-clock on this metric
    sn = np.sort(neg_scores)
    reg_all = np.concatenate(regions)
    rw = np.concatenate(
        [np.full(r.size, 1.0 / (r.size * n_regions)) for r in regions])
    o = np.argsort(reg_all, kind="stable")
    rs, rw_s = reg_all[o], rw[o]
    ins = np.searchsorted(sn, rs, side="left")
    s = np.insert(sn, ins, rs)               # merged ascending, all pixels
    mi = ins + np.arange(rs.size)            # region-event indices in s
    total = s.size
    w_fpr = np.full(total, 1.0 / n_neg)
    w_fpr[mi] = 0.0
    w_pro = np.zeros(total)
    w_pro[mi] = rw_s

    # descending-threshold cumulative curve for the `pred >= t` binarization
    fpr_c = np.cumsum(w_fpr[::-1])
    pro_c = np.cumsum(w_pro[::-1])
    sd = s[::-1]
    distinct = np.r_[np.where(np.diff(sd))[0], total - 1]
    fprs = np.r_[0.0, fpr_c[distinct]]
    pros = np.r_[0.0, pro_c[distinct]]

    # clip at the fpr limit with boundary interpolation, then integrate.
    # idx == 1 (the FIRST distinct threshold already exceeds fpr_limit,
    # e.g. a saturated plateau covering >limit of the negatives) must take
    # the same interpolation: the curve is linear from (0,0) to the first
    # event, so the clipped area is a triangle — returning 0 there would
    # score a perfect-overlap detector as worthless.
    idx = int(np.searchsorted(fprs, fpr_limit, side="right"))
    if idx < 1:
        return 0.0  # unreachable (fprs[0] == 0.0); defensive only
    f, p = fprs[:idx], pros[:idx]
    if f[-1] < fpr_limit and idx < fprs.size:
        w = (fpr_limit - f[-1]) / max(fprs[idx] - f[-1], 1e-12)
        f = np.r_[f, fpr_limit]
        p = np.r_[p, p[-1] + w * (pros[idx] - p[-1])]
    area = np.trapezoid(p, f)
    return float(area / fpr_limit)


def _min_max(x: np.ndarray) -> np.ndarray:
    """Reference normalization guarded by ``max != 1``
    (forward_utils.py:241-248)."""
    if x.max() != 1:
        span = x.max() - x.min()
        if span == 0:
            return np.zeros_like(x)
        return (x - x.min()) / span
    return x


def metrics_eval(
    pixel_label: np.ndarray,
    image_label: np.ndarray,
    pixel_preds: np.ndarray,
    image_preds: np.ndarray,
    class_name: str,
    domain: str,
    compute_aupro: bool = False,
) -> Dict[str, float]:
    """Per-class metric rows matching the reference's table
    (forward_utils.py:233-280), with optional AUPRO."""
    pixel_preds = _min_max(np.asarray(pixel_preds, np.float64))
    image_preds = _min_max(np.asarray(image_preds, np.float64))

    pmax = pixel_preds.reshape(pixel_preds.shape[0], -1).max(axis=1)
    if domain != "Medical":
        image_preds = pmax * 0.5 + image_preds * 0.5
    else:
        image_preds = pmax

    pl = np.asarray(pixel_label).reshape(-1) != 0
    if pl.any() and not pl.all():
        pixel_auc, pixel_ap = auroc_ap(pl, pixel_preds)
    else:
        # single-class pixel labels (e.g. a class with zero anomalous
        # pixels): AUROC is undefined — sklearn (and hence the reference)
        # would raise here (forward_utils.py:260-262 has no pixel guard);
        # we mirror the reference's IMAGE-level convention of reporting 0
        # for degenerate label sets (forward_utils.py:264-271) instead of
        # crashing or propagating NaN into the table mean. docs/PARITY.md
        # "Metric edge cases".
        pixel_auc = 0.0
        pixel_ap = 0.0

    il = np.asarray(image_label)
    if il.max() != il.min():
        image_auc, image_ap = auroc_ap(il != 0, image_preds)
    else:
        image_auc = 0.0
        image_ap = 0.0

    result = {
        "class name": class_name,
        "pixel AUC": round(pixel_auc, 4) * 100,
        "pixel AP": round(pixel_ap, 4) * 100,
        "image AUC": round(image_auc, 4) * 100,
        "image AP": round(image_ap, 4) * 100,
    }
    if compute_aupro:
        masks3 = np.asarray(pixel_label)
        masks3 = masks3.reshape(masks3.shape[0], *masks3.shape[-2:])
        pro = aupro(masks3, pixel_preds.reshape(masks3.shape))
        result["pixel AUPRO"] = round(pro, 4) * 100 if np.isfinite(pro) else 0.0
    return result
