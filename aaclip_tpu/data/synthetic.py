"""Synthetic anomaly-dataset generator: tiny PNG images + masks + jsonl
metadata in the reference's on-disk layout (reference README.md:28-33
schema; dataset/metadata/*/full-shot.jsonl records).

Used by the test suite and by examples/synthetic_end_to_end.py; also a
user-facing way to smoke-test an installation end-to-end without any of
the benchmark datasets: point AACLIP_DATA / AACLIP_METADATA at the
returned roots and run the normal train.py / test.py CLIs."""

import json
import os

import numpy as np
from PIL import Image


def make_synthetic_dataset(root: str, dataset_name: str = "MVTec",
                           class_names=None,
                           n_normal: int = 3, n_anomalous: int = 3,
                           img_px: int = 64, seed: int = 0,
                           hard: bool = False):
    """Creates {root}/data/<spec.rel_path>/... images and
    {root}/metadata/<dataset>/full-shot.jsonl; returns (data_root, meta_root).

    Anomalous images get a bright square whose mask marks it.

    hard=True makes the image-level task unsaturated by construction (for
    precision-fidelity A/Bs where AUROC 100.0 would hide rank flips):
    defect squares get per-image intensity drawn from a range that overlaps
    the background texture (so faint defects rank below bright background
    patches) and variable size, and normal images get a bright distractor
    patch with probability 0.5 (bright but un-masked, pulling some normals
    above faint defects).  The pixel-level task stays well-posed: masks
    still mark exactly the defect square.
    """
    from aaclip_tpu.data.registry import DATASETS

    spec = DATASETS[dataset_name]
    if class_names is None:
        class_names = tuple(spec.class_names[:2])
    data_root = os.path.join(root, "data")
    base = os.path.join(data_root, spec.rel_path)
    meta_root = os.path.join(root, "metadata")
    meta_dir = os.path.join(meta_root, dataset_name)
    os.makedirs(meta_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    records = []
    for cls in class_names:
        for kind, n, label in [("good", n_normal, 0), ("defect", n_anomalous, 1)]:
            for i in range(n):
                rel = f"{cls}/test/{kind}/{i:03d}.png"
                path = os.path.join(base, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                img = (rng.random((img_px, img_px, 3)) * 80 + 60).astype(np.uint8)
                rec = {"image_path": rel, "label": label, "class_name": cls}
                if hard and not label and rng.random() < 0.5:
                    # bright distractor on a NORMAL image (no mask entry)
                    dy, dx = rng.integers(8, img_px - 24, size=2)
                    ds = int(rng.integers(6, 14))
                    img[dy:dy + ds, dx:dx + ds] = int(rng.integers(150, 210))
                if label:
                    if hard:
                        side = int(rng.integers(6, 21))
                        val = int(rng.integers(110, 231))
                    else:
                        side, val = 16, 230
                    y, x = rng.integers(8, img_px - 8 - side, size=2)
                    img[y:y + side, x:x + side] = val
                    mask = np.zeros((img_px, img_px), np.uint8)
                    mask[y:y + side, x:x + side] = 255
                    mrel = f"{cls}/ground_truth/{kind}/{i:03d}_mask.png"
                    mpath = os.path.join(base, mrel)
                    os.makedirs(os.path.dirname(mpath), exist_ok=True)
                    Image.fromarray(mask).save(mpath)
                    rec["mask_path"] = mrel
                Image.fromarray(img).save(path)
                records.append(rec)
    with open(os.path.join(meta_dir, "full-shot.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    # also a small few-shot file (2-shot)
    with open(os.path.join(meta_dir, "2-shot.jsonl"), "w") as f:
        for cls in class_names:
            picked = [r for r in records if r["class_name"] == cls][:2]
            for r in picked:
                f.write(json.dumps(r) + "\n")
    return data_root, meta_root
