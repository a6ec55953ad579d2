"""Serving-artifact export/load (aaclip_tpu/deploy.py): bit-exact parity
with the live prediction path, bucket padding, precision-leaf survival,
trained-adapter wiring, and load-time validation.  The reference has no
deployment story (each start rebuilds the torch model + prompts, reference
test.py:29-49); the artifact is the TPU production equivalent."""

import json
import os

import numpy as np
import pytest

import jax

from aaclip_tpu.deploy import (ARTIFACT_VERSION, export_serving_artifact,
                               load_serving_artifact)

ACFG = dict(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
IMG = 70
SEED = 7


def _export(tmp_path, **kw):
    kw.setdefault("model_name", "tiny-test")
    kw.setdefault("img_size", IMG)
    kw.setdefault("precision", "fp32")
    kw.setdefault("adapter_cfg", ACFG)
    kw.setdefault("seed", SEED)
    kw.setdefault("datasets", ("MVTec",))
    kw.setdefault("batch_sizes", (2, 4))
    out = str(tmp_path / "artifact")
    manifest = export_serving_artifact(out, **kw)
    return out, manifest


def _imgs(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (n, 3, IMG, IMG), dtype=np.uint8)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    out, manifest = _export(tmp_path_factory.mktemp("deploy"))
    return out, manifest


def _live_predict(imgs, class_name="bottle"):
    """The non-exported path the artifact must reproduce, built exactly as
    the exporter builds it."""
    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.registry import DOMAINS
    from aaclip_tpu.eval.predict import make_anchor_encoder, make_predict_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix
    from aaclip_tpu.text.anchors import encode_dataset_anchors

    policy = DtypePolicy.from_name("fp32")
    cfg = get_config("tiny-test", IMG)
    acfg = AdapterConfig(**ACFG)
    clip = create_clip_params(cfg, seed=SEED, policy=policy)
    adapters = init_adapter_params(jax.random.PRNGKey(SEED), cfg, acfg,
                                   policy)
    pred = make_predict_fn(clip, cfg, acfg, img_size=IMG, policy=policy,
                           uint8_inputs=True)
    enc = make_anchor_encoder(clip, cfg, acfg, None, policy=policy)
    anchors = np.asarray(encode_dataset_anchors(enc, "MVTec")[class_name])
    M = np.asarray(fused_postproc_matrix(cfg.vision.grid, IMG,
                                         DOMAINS["MVTec"]))
    anc = np.broadcast_to(anchors, (imgs.shape[0],) + anchors.shape)
    pix, score = pred(adapters["image"], imgs, np.asarray(anc, np.float32),
                      M)
    return np.asarray(pix), np.asarray(score)


def test_artifact_matches_live_path_bit_exactly(exported):
    out, manifest = exported
    art = load_serving_artifact(out)
    imgs = _imgs(4)
    got_maps, got_scores = art.predict_class(imgs, "MVTec", "bottle")
    want_maps, want_scores = _live_predict(imgs)
    np.testing.assert_array_equal(got_maps, want_maps)
    np.testing.assert_array_equal(got_scores, want_scores)
    assert manifest["untrained"] is True
    assert art.untrained is True


def test_padding_and_chunking_match_exact_buckets(exported):
    out, _ = exported
    art = load_serving_artifact(out)
    # n=5 with buckets (2,4): chunk of 4 + chunk of 1 padded to 2.
    # Comparisons stay within one bucket shape: across shapes XLA reduction
    # order shifts results at float tolerance (true of the live path too).
    imgs = _imgs(5, seed=3)
    got_maps, got_scores = art.predict_class(imgs, "MVTec", "bottle")
    assert got_maps.shape == (5, IMG, IMG) and got_scores.shape == (5,)
    m4, s4 = art.predict_class(imgs[:4], "MVTec", "bottle")
    np.testing.assert_array_equal(got_maps[:4], m4)
    np.testing.assert_array_equal(got_scores[:4], s4)
    # padding invisibility: the pad lane (edge replica) never leaks into
    # the valid lane — same bucket, different companion sample
    other = np.stack([imgs[4], imgs[0]])
    mo, so = art.predict_class(other, "MVTec", "bottle")
    np.testing.assert_array_equal(got_maps[4], mo[0])
    np.testing.assert_array_equal(got_scores[4], so[0])


def test_mixed_class_per_sample_anchors(exported):
    out, _ = exported
    art = load_serving_artifact(out)
    imgs = _imgs(2, seed=5)
    a = np.stack([art.anchors["MVTec"]["bottle"],
                  art.anchors["MVTec"]["cable"]])
    maps, scores = art.predict(imgs, a, "MVTec")
    mb, sb = art.predict_class(imgs[:1], "MVTec", "bottle")
    mc, sc = art.predict_class(imgs[1:], "MVTec", "cable")
    np.testing.assert_array_equal(maps[0], mb[0])
    np.testing.assert_array_equal(maps[1], mc[0])
    np.testing.assert_array_equal(scores, np.concatenate([sb, sc]))


def test_unknown_dataset_and_class_raise(exported):
    out, _ = exported
    art = load_serving_artifact(out)
    with pytest.raises(KeyError, match="VisA"):
        art.predict_class(_imgs(1), "VisA", "bottle")
    with pytest.raises(KeyError, match="nope"):
        art.predict_class(_imgs(1), "MVTec", "nope")
    with pytest.raises(ValueError, match="empty"):
        art.predict(_imgs(1)[:0], np.zeros((0, art.embed_dim, 2)), "MVTec")


def test_platform_and_version_validation(exported, tmp_path):
    out, _ = exported
    import shutil

    bad = str(tmp_path / "badplat")
    shutil.copytree(out, bad)
    mpath = os.path.join(bad, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["platforms"] = ["tpu"]
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="exported for platforms"):
        load_serving_artifact(bad)

    m["platforms"] = [jax.default_backend()]
    m["artifact_version"] = ARTIFACT_VERSION + 1
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="artifact version"):
        load_serving_artifact(bad)


def test_bf16_leaves_survive_and_run(tmp_path):
    """npz mangles ml_dtypes (void round-trip) — the raw-bytes leaf store
    must preserve bf16 exactly and the loaded artifact must run."""
    out, _ = _export(tmp_path, precision="bf16", batch_sizes=(2,))
    art = load_serving_artifact(out)
    dtypes = {str(x.dtype) for x in jax.tree.leaves(art.visual)}
    assert "bfloat16" in dtypes, dtypes
    maps, scores = art.predict_class(_imgs(2), "MVTec", "bottle")
    assert maps.shape == (2, IMG, IMG)
    assert np.isfinite(np.asarray(maps, np.float32)).all()


def test_integrity_digests(tmp_path, exported):
    """The manifest carries sha256 per payload file; a flipped byte fails
    at load (corruption must never become silently wrong maps). Pre-digest
    manifests (no sha256 key) and check_integrity=False still load."""
    import shutil

    src, manifest = exported
    assert set(manifest["sha256"]) >= {"params.npz", "anchors_MVTec.npz"}

    bad = str(tmp_path / "tampered")
    shutil.copytree(src, bad)
    gname = next(iter(manifest["graphs"].values()))
    with open(os.path.join(bad, gname), "r+b") as f:
        f.seek(128)
        b = f.read(1)
        f.seek(128)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="sha256"):
        load_serving_artifact(bad)
    art = load_serving_artifact(bad, check_integrity=False)  # explicit
    assert art.batch_sizes == manifest["batch_sizes"]        # opt-out

    gone = str(tmp_path / "missing")
    shutil.copytree(src, gone)
    os.remove(os.path.join(gone, "params.npz"))
    with pytest.raises(ValueError, match="missing"):
        load_serving_artifact(gone)

    legacy = str(tmp_path / "legacy")
    shutil.copytree(src, legacy)
    with open(os.path.join(legacy, "manifest.json")) as f:
        m = json.load(f)
    del m["sha256"]
    with open(os.path.join(legacy, "manifest.json"), "w") as f:
        json.dump(m, f)
    art = load_serving_artifact(legacy)
    maps, _ = art.predict_class(_imgs(1), "MVTec", "bottle")
    assert maps.shape == (1, IMG, IMG)


def test_int8_leaves_survive_and_run(tmp_path):
    """precision=int8 freezes the QUANTIZED trunk (int8 weight leaves +
    fp32 scales) into the artifact; the loaded graphs must run it."""
    out, m = _export(tmp_path, precision="int8", batch_sizes=(2,))
    assert m["precision"] == "int8"
    art = load_serving_artifact(out)
    dtypes = {str(x.dtype) for x in jax.tree.leaves(art.visual)}
    assert "int8" in dtypes, dtypes
    maps, scores = art.predict_class(_imgs(2), "MVTec", "bottle")
    assert maps.shape == (2, IMG, IMG)
    assert np.isfinite(np.asarray(maps, np.float32)).all()


def test_trained_adapters_are_exported(tmp_path):
    """An adapter checkpoint under save_path changes the artifact's output
    and clears the untrained flag."""
    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    cfg = get_config("tiny-test", IMG)
    trained = init_adapter_params(jax.random.PRNGKey(999), cfg,
                                  AdapterConfig(**ACFG),
                                  DtypePolicy.from_name("fp32"))
    ckdir = tmp_path / "run"
    ckdir.mkdir()
    save_adapter_checkpoint(str(ckdir / "image_adapter_2.npz"), 2,
                            trained["image"])

    plain_dir, _ = _export(tmp_path / "plain", batch_sizes=(2,))
    trained_dir, manifest = _export(tmp_path / "trained", batch_sizes=(2,),
                                    save_path=str(ckdir))
    assert manifest["untrained"] is False
    imgs = _imgs(2, seed=9)
    m0, s0 = load_serving_artifact(plain_dir).predict_class(
        imgs, "MVTec", "bottle")
    m1, s1 = load_serving_artifact(trained_dir).predict_class(
        imgs, "MVTec", "bottle")
    assert not np.array_equal(m0, m1)


def test_export_cli_runs_and_verifies(tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "tools/export_artifact.py", "--out",
         str(tmp_path / "art"), "--model_name", "tiny-test", "--img_size",
         str(IMG), "--precision", "fp32", "--levels", "1", "2",
         "--image_adapt_until", "1", "--text_adapt_until", "1",
         "--batch_sizes", "2", "--verify"],
        cwd=repo, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "verify OK" in out.stdout, out.stdout
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["graphs"] == 1 and last["untrained"] is True
    assert "RANDOM-INIT" in out.stderr


def test_engine_serves_artifact(tmp_path):
    """InferenceEngine(artifact=...) matches the live engine bit-exactly
    and enforces bucket/dataset coverage."""
    from aaclip_tpu.serve.server import InferenceEngine

    out, _ = _export(tmp_path, batch_sizes=(1, 2, 4))
    live = InferenceEngine(model_name="tiny-test", img_size=IMG,
                           datasets=("MVTec",), precision="fp32",
                           max_batch=4, seed=SEED, adapter_cfg=ACFG)
    try:
        img = _imgs(1, seed=11)[0]
        want_map, want_score = live.submit(img, "MVTec", "bottle")
    finally:
        live.shutdown()

    eng = InferenceEngine(artifact=out, datasets=("MVTec",), max_batch=4)
    try:
        assert eng.untrained is True
        got_map, got_score = eng.submit(img, "MVTec", "bottle")
    finally:
        eng.shutdown()
    np.testing.assert_array_equal(np.asarray(got_map), np.asarray(want_map))
    assert got_score == want_score

    # datasets=None serves everything the artifact bundled (the CLI
    # default for --artifact with no --datasets)
    eng = InferenceEngine(artifact=out, max_batch=4)
    try:
        assert sorted(eng.anchors) == ["MVTec"]
        m, s = eng.submit(img, "MVTec", "bottle")
    finally:
        eng.shutdown()
    np.testing.assert_array_equal(np.asarray(m), np.asarray(want_map))

    # bucket coverage: max_batch 8 needs a b=8 graph the artifact lacks
    with pytest.raises(ValueError, match="lacks graphs"):
        InferenceEngine(artifact=out, max_batch=8)
    # dataset coverage
    with pytest.raises(ValueError, match="lacks datasets"):
        InferenceEngine(artifact=out, datasets=("MVTec", "VisA"),
                        max_batch=4)


def test_engine_artifact_data_parallel_replicas(tmp_path):
    """data_parallel over a frozen artifact = one replica per device with
    round-robin dispatch: every device must produce the single-replica
    result bit-exactly, whichever one a request lands on."""
    import threading

    from aaclip_tpu.serve.server import InferenceEngine

    out, _ = _export(tmp_path, batch_sizes=(1, 2, 4))
    imgs = _imgs(8, seed=23)

    single = InferenceEngine(artifact=out, max_batch=4)
    try:
        want = [single.submit(im, "MVTec", "bottle") for im in imgs]
    finally:
        single.shutdown()

    eng = InferenceEngine(artifact=out, max_batch=4, data_parallel=True)
    try:
        assert eng._dp_devices == len(jax.local_devices())
        # serial submits: each lands in its own micro-batch, so the
        # round-robin walks the devices one by one
        rr0 = eng._rr
        got = [eng.submit(im, "MVTec", "bottle") for im in imgs[:3]]
        # 3 one-request micro-batches advanced the ring by exactly 3
        assert eng._rr == (rr0 + 3) % eng._dp_devices
        got += [eng.submit(im, "MVTec", "bottle") for im in imgs[3:]]
        # concurrent submits: mixed co-batching across replicas
        results = [None] * len(imgs)

        def fire(i):
            results[i] = eng.submit(imgs[i], "MVTec", "bottle", timeout=60)

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=90)
    finally:
        eng.shutdown()
    for w, g, r in zip(want, got, results):
        # serial requests hit the same bucket-1 graph on every replica:
        # bit-exact whichever device served them
        np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(w[0]))
        assert g[1] == w[1]
        # concurrent requests co-batch into larger buckets; bucket shape
        # changes XLA tiling (~1e-6, same as in the live engine)
        np.testing.assert_allclose(np.asarray(r[0]), np.asarray(w[0]),
                                   atol=1e-4)
        assert abs(r[1] - w[1]) < 1e-4


def test_engine_pads_to_larger_exported_bucket(tmp_path):
    """An artifact exporting only b=4 serves every engine bucket <= 4 by
    padding up (e.g. single-request batches), instead of demanding a graph
    per power-of-2."""
    from aaclip_tpu.serve.server import InferenceEngine

    out, _ = _export(tmp_path, batch_sizes=(4,))
    eng = InferenceEngine(artifact=out, max_batch=4)
    try:
        img = _imgs(1, seed=13)[0]
        got_map, got_score = eng.submit(img, "MVTec", "bottle")
    finally:
        eng.shutdown()
    art = load_serving_artifact(out)
    want_map, want_score = art.predict_class(img[None], "MVTec", "bottle")
    np.testing.assert_array_equal(np.asarray(got_map), want_map[0])
    assert got_score == want_score[0]


def test_manifest_records_provenance(tmp_path):
    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    cfg = get_config("tiny-test", IMG)
    ad = init_adapter_params(jax.random.PRNGKey(1), cfg,
                             AdapterConfig(**ACFG),
                             DtypePolicy.from_name("fp32"))
    ckdir = tmp_path / "run"
    ckdir.mkdir()
    save_adapter_checkpoint(str(ckdir / "image_adapter_1.npz"), 1,
                            ad["image"])
    out, manifest = _export(tmp_path, batch_sizes=(2,),
                            save_path=str(ckdir))
    assert manifest["clip_checkpoint"] == f"seed{SEED}"
    assert manifest["image_adapter_ckpt"].endswith("image_adapter_1.npz")
    assert manifest["text_adapter_ckpt"] is None


def test_native_kernels_unavailable_raises(tmp_path):
    """On a non-TPU host the Pallas kernels don't exist; native_kernels
    must fail loudly rather than writing a manifest that lies."""
    with pytest.raises(ValueError, match="native_kernels"):
        _export(tmp_path, batch_sizes=(2,), native_kernels=True)


def test_reexport_into_same_dir_refreshes_manifest(tmp_path):
    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    out, m0 = _export(tmp_path, batch_sizes=(2,))
    assert m0["untrained"] is True
    cfg = get_config("tiny-test", IMG)
    ad = init_adapter_params(jax.random.PRNGKey(1), cfg,
                             AdapterConfig(**ACFG),
                             DtypePolicy.from_name("fp32"))
    ckdir = tmp_path / "run"
    ckdir.mkdir()
    save_adapter_checkpoint(str(ckdir / "image_adapter_1.npz"), 1,
                            ad["image"])
    _, m1 = _export(tmp_path, batch_sizes=(2,), save_path=str(ckdir))
    art = load_serving_artifact(out)
    assert art.untrained is False
    assert art.manifest["image_adapter_ckpt"] is not None


def test_memory_bank_artifact(tmp_path):
    """memory_bank_shot=K (round 5): banks + fused bank graphs bundle into
    the artifact; predict_class auto-uses the bank and reproduces the live
    memory-bank predictor bit-exactly (fp32, same support draw); text-only
    and bank paths differ; use_bank=True on a bank-less artifact raises."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.synthetic import make_synthetic_dataset

    data_root, meta_root = make_synthetic_dataset(str(tmp_path / "synth"),
                                                  img_px=IMG)
    old = dict(os.environ)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    try:
        out, manifest = _export(tmp_path, memory_bank_shot=2)
        mbm = manifest["memory_bank"]
        assert mbm["shot"] == 2 and set(mbm["graphs"]) == {"2", "4"}
        art = load_serving_artifact(out)
        assert art.shot == 2 and art.bank_weight == 0.5
        assert "bottle" in art.banks["MVTec"]
        assert (tuple(art.banks["MVTec"]["bottle"].shape)
                == tuple(mbm["bank_shape"]))

        imgs = _imgs(4)
        pix_b, sc_b = art.predict_class(imgs, "MVTec", "bottle")  # auto
        pix_t, sc_t = art.predict_class(imgs, "MVTec", "bottle",
                                        use_bank=False)
        assert np.abs(pix_b - pix_t).max() > 1e-6  # bank changed the maps

        # live memory-bank predictor on the same support == the frozen one
        from aaclip_tpu.core.config import (AdapterConfig, DtypePolicy,
                                            get_config)
        from aaclip_tpu.core.params import (create_clip_params,
                                            init_adapter_params)
        from aaclip_tpu.data.registry import DOMAINS
        from aaclip_tpu.eval import memory_bank as mb
        from aaclip_tpu.eval.predict import make_anchor_encoder
        from aaclip_tpu.ops.similarity import fused_postproc_matrix
        from aaclip_tpu.text.anchors import encode_dataset_anchors

        policy = DtypePolicy.from_name("fp32")
        cfg = get_config("tiny-test", IMG)
        acfg = AdapterConfig(**ACFG)
        clip = create_clip_params(cfg, seed=SEED, policy=policy)
        adapters = init_adapter_params(jax.random.PRNGKey(SEED), cfg, acfg,
                                       policy)
        live = mb.make_mb_predict_fn(clip, cfg, acfg, img_size=IMG,
                                     policy=policy, uint8_inputs=True,
                                     bank_weight=0.5)
        support = mb.collect_support_sets("MVTec", 2, IMG, uint8=True)
        bank = mb.collect_bank(live.features_fn, adapters["image"],
                               support["bottle"])
        bank = mb.pad_banks_to_common_size(
            {"bottle": bank}, n_max=mbm["bank_shape"][1])["bottle"]
        enc = make_anchor_encoder(clip, cfg, acfg, None, policy=policy)
        anchors = np.asarray(
            encode_dataset_anchors(enc, "MVTec")["bottle"])
        M = np.asarray(fused_postproc_matrix(cfg.vision.grid, IMG,
                                             DOMAINS["MVTec"]))
        # the bundled bank BYTES are bit-identical (same construction
        # code, run live at export time — not through an exported graph)
        np.testing.assert_array_equal(art.banks["MVTec"]["bottle"],
                                      np.asarray(bank))
        pix_l, sc_l = live(adapters["image"], imgs,
                           np.asarray(anchors, np.float32), M, bank)
        # the fused map tolerates ~2 fp32 ulps: the deserialized
        # StableHLO's bank max-similarity scan fuses slightly differently
        # from the live jit (the TEXT-only path stays bit-exact — see
        # test_artifact_matches_live_path_bit_exactly)
        np.testing.assert_allclose(pix_b, np.asarray(pix_l),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(sc_b, np.asarray(sc_l),
                                   rtol=1e-6, atol=1e-6)

        # a bank-less artifact refuses an explicit use_bank=True
        out2, _ = _export(tmp_path / "nobank")
        art2 = load_serving_artifact(out2)
        with pytest.raises(KeyError, match="no bank"):
            art2.predict_class(imgs, "MVTec", "bottle", use_bank=True)
    finally:
        os.environ.clear()
        os.environ.update(old)
