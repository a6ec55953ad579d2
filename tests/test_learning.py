"""End-to-end learning sanity: stage-2 training on synthetic bright-square
anomalies must substantially improve pixel AUROC over untrained adapters,
even with a random CLIP backbone (the seg projections learn to separate
bright patches)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.synthetic import make_synthetic_dataset


@pytest.fixture()
def synth_env(tmp_path):
    data_root, meta_root = make_synthetic_dataset(
        str(tmp_path), n_normal=8, n_anomalous=8, img_px=70)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    yield
    os.environ.pop("AACLIP_DATA", None)
    os.environ.pop("AACLIP_METADATA", None)


def test_stage2_training_improves_pixel_auroc(synth_env):
    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.datasets import (
        BatchLoader, get_test_datasets, get_train_datasets)
    from aaclip_tpu.eval.metrics import auroc
    from aaclip_tpu.eval.predict import make_predict_fn, run_class_predictions
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    cfg = get_config("tiny-test")
    acfg = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    clip = create_clip_params(cfg, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg)
    rng = np.random.default_rng(3)
    table = rng.standard_normal((2, cfg.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    predict = make_predict_fn(clip, cfg, acfg)

    def eval_auroc(image_adapter):
        ds = get_test_datasets("MVTec", 70)
        all_m, all_p = [], []
        for i, cls in enumerate(["bottle", "cable"]):
            loader = BatchLoader(ds[cls], 8, num_workers=2)
            masks, _, preds, _, _ = run_class_predictions(
                predict, image_adapter, loader, table[i],
                "Industrial", 70, cfg.vision.grid)
            all_m.append(masks.reshape(-1))
            all_p.append(preds.reshape(-1))
        return auroc(np.concatenate(all_m) != 0, np.concatenate(all_p))

    before = eval_auroc(adapters["image"])

    _, image_ds = get_train_datasets("MVTec", 70)
    tx = make_image_optimizer(lr=2e-3)
    step = make_stage2_step(clip, cfg, acfg, tx, table)
    state = init_state(adapters["image"], tx)
    cls_to_idx = {"bottle": 0, "cable": 1}
    loader = BatchLoader(image_ds, 8, shuffle=True, num_workers=2)
    for _ in range(12):
        for batch in loader:
            img = jnp.asarray(batch["image"])
            m = jnp.asarray(batch["mask"].reshape(img.shape[0], 70, 70))
            lab = jnp.asarray(batch["label"])
            ci = jnp.asarray([cls_to_idx[c] for c in batch["class_name"]])
            v = jnp.asarray(
                (np.arange(img.shape[0]) < batch["n_valid"]).astype(np.float32))
            state, _ = step(state, img, m, lab, ci, v)

    after = eval_auroc(state.params)
    assert after > before + 0.1, (before, after)
    assert after > 0.75, (before, after)
