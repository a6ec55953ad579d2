"""Qualitative visualization: JET-colormap overlays of ground-truth mask and
predicted anomaly map on the original image, vertically stacked (reference
forward_utils.py:283-327).  Unlike the reference (MVTec-only filenames),
any dataset works — nested image paths are flattened with underscores.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from aaclip_tpu.data.registry import DATASETS


def apply_scoremap(image: np.ndarray, scoremap: np.ndarray,
                   alpha: float = 0.5) -> np.ndarray:
    import cv2

    colored = cv2.applyColorMap(scoremap, cv2.COLORMAP_JET)
    return (alpha * image + (1 - alpha) * colored).astype(np.uint8)


def visualize(pixel_label: np.ndarray, pixel_preds: np.ndarray,
              file_names: List[str], save_dir: str, dataset_name: str,
              class_name: str) -> None:
    import cv2

    preds = pixel_preds.astype(np.float64)
    if preds.max() != 1:
        span = preds.max() - preds.min()
        preds = (preds - preds.min()) / span if span else preds * 0
    preds_u8 = (preds * 255).astype(np.uint8)
    labels = pixel_label.reshape(pixel_label.shape[0], *pixel_label.shape[-2:])
    labels_u8 = ((labels != 0) * 255).astype(np.uint8)

    out_dir = os.path.join(save_dir, "visualization", dataset_name, class_name)
    os.makedirs(out_dir, exist_ok=True)
    data_path = DATASETS[dataset_name].data_path
    size = preds_u8.shape[-2:]
    used: set = set()
    for idx, rel in enumerate(file_names):
        img = cv2.imread(os.path.join(data_path, rel))
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (size[1], size[0]))
        gt = cv2.cvtColor(labels_u8[idx], cv2.COLOR_GRAY2RGB)
        pr = cv2.cvtColor(preds_u8[idx], cv2.COLOR_GRAY2RGB)
        panel = np.vstack([img, apply_scoremap(img, gt), apply_scoremap(img, pr)])
        fname = rel.replace("/", "_")
        stem, ext = os.path.splitext(fname)
        if fname in used:
            # two rel paths can flatten to the same name (slash vs
            # underscore placement); never silently overwrite a panel
            # from THIS run (re-runs still replace previous outputs)
            k = 1
            while f"{stem}.{k}{ext}" in used:
                k += 1
            fname = f"{stem}.{k}{ext}"
        else:
            # first writer of this stem: drop numbered variants left by a
            # PREVIOUS run whose collisions no longer exist, so stale
            # panels cannot masquerade as current output
            import glob as _glob
            for old in _glob.glob(os.path.join(
                    out_dir, _glob.escape(stem) + ".[0-9]*" + ext)):
                os.unlink(old)
        used.add(fname)
        cv2.imwrite(os.path.join(out_dir, fname), panel)
