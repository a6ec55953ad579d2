"""Data pipeline: transform semantics, jsonl reading, loader
batching/padding/sharding, determinism.  (torchvision is not in the image,
so geometric checks use closed-form expectations.)"""

import os

import numpy as np
import pytest
from PIL import Image

from aaclip_tpu.data import transforms as T
from aaclip_tpu.data.datasets import (
    BatchLoader,
    get_test_datasets,
    get_train_datasets,
    read_jsonl,
)
from tests.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    data_root, meta_root = make_synthetic_dataset(root)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    yield data_root, meta_root
    os.environ.pop("AACLIP_DATA", None)
    os.environ.pop("AACLIP_METADATA", None)


def test_normalize_formula():
    rng = np.random.default_rng(0)
    arr = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    got = T.to_normalized_chw(Image.fromarray(arr))
    want = ((arr.astype(np.float32) / 255.0 - T.CLIP_MEAN) / T.CLIP_STD
            ).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (3, 20, 20)


def test_translate_is_exact_shift():
    rng = np.random.default_rng(3)
    x = rng.random((2, 16, 16)).astype(np.float32)
    got = T._affine_nearest(x.copy(), 0.0, (-2.0, 3.0))  # dy=-2, dx=+3
    want = np.zeros_like(x)
    want[:, :14, 3:] = x[:, 2:, :13]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotation_invariants():
    """Rotation preserves content near center, zero-fills corners, and
    rotating the mask jointly keeps image/mask aligned."""
    x = np.zeros((1, 41, 41), np.float32)
    x[0, 18:23, 18:23] = 1.0  # center blob survives any rotation
    got = T._affine_nearest(x.copy(), 45.0, (0.0, 0.0))
    assert got[0, 20, 20] == 1.0
    # 90-degree rotation maps (y, x) -> exact transpose-flip
    y = np.arange(9, dtype=np.float32).reshape(1, 3, 3)
    r90 = T._affine_nearest(np.pad(y, ((0, 0), (3, 3), (3, 3))), 90.0, (0.0, 0.0))
    inner = r90[0, 3:6, 3:6]
    np.testing.assert_allclose(inner, np.rot90(y[0], 1), atol=1e-6)


def test_joint_augment_keeps_image_mask_aligned():
    rng = np.random.default_rng(7)
    img = np.zeros((3, 32, 32), np.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    img[:, 10:20, 10:20] = 1.0
    mask[:, 10:20, 10:20] = 1.0
    ai, am = T.joint_geometric_augment(img, mask, rng)
    # wherever the mask is 1, the image block must be 1 (moved together)
    np.testing.assert_allclose(ai[0][am[0] == 1.0], 1.0)
    assert set(np.unique(am)) <= {0.0, 1.0}


def test_color_jitter_changes_image_deterministically():
    rng = np.random.default_rng(11)
    arr = (np.random.default_rng(1).random((16, 16, 3)) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    j1 = T.color_jitter(img, np.random.default_rng(5))
    j2 = T.color_jitter(img, np.random.default_rng(5))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    j3 = T.color_jitter(img, np.random.default_rng(6))
    assert not np.array_equal(np.asarray(j1), np.asarray(j3))


def test_datasets_and_loader(synth):
    text_ds, image_ds = get_train_datasets("MVTec", img_size=56, shot=-1)
    assert len(text_ds) == len(image_ds) == 12
    s = image_ds.get(0, epoch=0)
    assert s["image"].shape == (3, 56, 56)
    assert s["mask"].shape == (1, 56, 56)
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}
    # determinism: same (epoch, idx) -> same augmentation
    s2 = image_ds.get(0, epoch=0)
    np.testing.assert_array_equal(s["image"], s2["image"])
    s3 = image_ds.get(0, epoch=1)
    assert not np.array_equal(s["image"], s3["image"])

    labels = [image_ds.get(i, 0)["label"] for i in range(len(image_ds))]
    assert sum(labels) == 6

    loader = BatchLoader(image_ds, batch_size=5, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (5, 3, 56, 56)
    assert batches[-1]["n_valid"] == 2  # 12 = 5 + 5 + 2 (padded)
    assert batches[-1]["image"].shape == (5, 3, 56, 56)
    # epoch advanced -> new shuffle order
    batches2 = list(loader)
    assert [b["file_name"] for b in batches] != [b["file_name"] for b in batches2]


def test_test_datasets_per_class(synth):
    ds = get_test_datasets("MVTec", img_size=56)
    # registry lists 15 MVTec classes; synthetic data covers 2
    assert len(ds) == 15
    assert len(ds["bottle"]) == 6 and len(ds["cable"]) == 6
    assert len(ds["zipper"]) == 0
    s = ds["bottle"].get(3)
    assert s["class_name"] == "bottle"


def test_loader_host_sharding(synth):
    _, image_ds = get_train_datasets("MVTec", img_size=56)
    l0 = BatchLoader(image_ds, 4, shuffle=False, host_id=0, num_hosts=2)
    l1 = BatchLoader(image_ds, 4, shuffle=False, host_id=1, num_hosts=2)
    f0 = [f for b in l0 for f in b["file_name"][:b["n_valid"]]]
    f1 = [f for b in l1 for f in b["file_name"][:b["n_valid"]]]
    assert not set(f0) & set(f1)
    assert len(f0) + len(f1) == 12


def test_loader_multihost_equal_batch_counts(synth):
    """Hosts must run the SAME number of batches (collective training steps
    desync otherwise): shards are equalized with at most one wrap-around
    pad index per host, reported invalid via n_valid — the union of VALID
    samples is still exactly the dataset (round-3 review finding)."""
    _, image_ds = get_train_datasets("MVTec", img_size=56)  # 12 samples
    loaders = [BatchLoader(image_ds, 2, shuffle=False, host_id=h,
                           num_hosts=5) for h in range(5)]
    lens = [len(l) for l in loaders]
    assert len(set(lens)) == 1
    valid_files = []
    for l in loaders:
        batches = list(l)
        assert len(batches) == lens[0]
        valid_files += [f for b in batches
                        for f in b["file_name"][:b["n_valid"]]]
    assert len(valid_files) == 12 and len(set(valid_files)) == 12


def test_loader_early_break_advances_epoch(synth):
    """A consumer that stops early must still advance the epoch, or the
    next pass replays the identical shuffle order and augmentation
    streams (round-3 review finding)."""
    _, image_ds = get_train_datasets("MVTec", img_size=56)
    loader = BatchLoader(image_ds, 2, shuffle=True, num_workers=2)
    it = iter(loader)
    next(it)
    it.close()
    assert loader.epoch == 1


def test_anomalous_sample_without_mask_raises(synth, tmp_path):
    """label=1 with no mask_path is malformed metadata: fail loudly like
    the reference (which indexes meta['mask_path'] unconditionally) —
    a silent zero mask would corrupt the seg loss and pixel metrics."""
    img = tmp_path / "x.png"
    Image.new("RGB", (8, 8)).save(img)
    with pytest.raises(ValueError, match="mask_path"):
        T.preprocess_test(str(img), None, 56, label=1)
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="mask_path"):
        T.preprocess_train(str(img), None, 56, label=1, rng=rng,
                           text_stage=True)


def test_shipped_metadata_loads():
    """The packaged full-shot.jsonl files parse and cover all registries."""
    import aaclip_tpu.data as data_pkg
    packaged = os.path.join(os.path.dirname(data_pkg.__file__), "metadata")
    recs = read_jsonl(os.path.join(packaged, "MVTec", "full-shot.jsonl"))
    assert len(recs) > 1000
    assert all(r.class_name for r in recs)
    anomalous = [r for r in recs if r.label]
    assert all(r.mask_path for r in anomalous)


def test_loader_propagates_worker_errors(synth):
    """A failing dataset.get must raise in the consumer, not hang."""
    _, image_ds = get_train_datasets("MVTec", img_size=56)

    class Broken:
        def __len__(self):
            return 4

        def get(self, idx, epoch):
            raise OSError("corrupt image")

    loader = BatchLoader(Broken(), 2, num_workers=2)
    with pytest.raises(OSError, match="corrupt image"):
        list(loader)


def test_loader_abandoned_iterator_does_not_hang(synth):
    """Breaking out of iteration early must not leave a stuck producer."""
    import threading

    _, image_ds = get_train_datasets("MVTec", img_size=56)
    loader = BatchLoader(image_ds, 2, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # abandon
    # all non-main threads should wind down shortly
    import time
    deadline = time.time() + 5
    while time.time() < deadline:
        workers = [t for t in threading.enumerate()
                   if t.name.startswith("Thread-") and t.is_alive()]
        if not workers:
            break
        time.sleep(0.1)
