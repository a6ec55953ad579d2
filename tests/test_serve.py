"""Serving path: engine micro-batching and the HTTP surface end-to-end
(tiny model, random anchors, real sockets)."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from aaclip_tpu.serve.server import InferenceEngine, serve


@pytest.fixture(scope="module")
def engine():
    eng = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="fp32", max_batch=4,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def server(engine):
    httpd = serve(engine, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _png_bytes(seed=0, size=48):
    rng = np.random.default_rng(seed)
    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_engine_submit(engine):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
    amap, score = engine.submit(img, "MVTec", "bottle")
    assert amap.shape == (70, 70)
    assert 0.0 <= score <= 1.0


def test_engine_map_stride_device_slice(engine):
    """map_stride slices on device; values must equal the full map's
    stride view exactly, scores unchanged; strides co-batch per request."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
    full, s_full = engine.submit(img, "MVTec", "bottle")
    strided, s7 = engine.submit(img, "MVTec", "bottle", map_stride=7)
    assert strided.shape == (10, 10)
    np.testing.assert_array_equal(strided, full[::7, ::7])
    assert s7 == s_full
    # mixed strides in ONE batch: concurrent submits group by stride
    results = {}

    def go(stride):
        results[stride] = engine.submit(img, "MVTec", "bottle",
                                        map_stride=stride)

    ts = [threading.Thread(target=go, args=(s,)) for s in (1, 5, 7)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # strided results must equal the SAME batch's full map sliced (exact:
    # one device buffer); vs the solo-run `full` only to fp tolerance
    # (different batch buckets compile different XLA programs)
    base = results[1][0]
    np.testing.assert_allclose(base, full, atol=1e-4, rtol=1e-5)
    np.testing.assert_array_equal(results[5][0], base[::5, ::5])
    np.testing.assert_array_equal(results[7][0], base[::7, ::7])
    with pytest.raises(ValueError, match="map_stride"):
        engine.submit(img, "MVTec", "bottle", map_stride=0)


def test_engine_int8_precision():
    """precision='int8' serves through the quantized trunk and tracks the
    fp32 engine's outputs (quality bounds in test_quant.py)."""
    eng = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="int8", max_batch=4,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    ref = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="fp32", max_batch=4,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    try:
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
        amap, score = eng.submit(img, "MVTec", "bottle")
        amap0, score0 = ref.submit(img, "MVTec", "bottle")
        assert amap.shape == (70, 70) and 0.0 <= score <= 1.0
        corr = np.corrcoef(amap.reshape(-1), amap0.reshape(-1))[0, 1]
        assert corr > 0.999, corr
        assert abs(score - score0) < 5e-3
    finally:
        eng.shutdown()
        ref.shutdown()


def test_engine_concurrent_batching(engine):
    """Concurrent submits share forward passes and all return."""
    rng = np.random.default_rng(2)
    results = [None] * 6

    def worker(i):
        img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
        results[i] = engine.submit(img, "MVTec", "bottle")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert all(r is not None for r in results)


def test_engine_mixed_class_batching(engine):
    """Requests for different classes share one forward (per-sample
    anchors): results must equal sequential per-class submissions."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
            for _ in range(4)]
    classes = ["bottle", "cable", "bottle", "cable"]
    ref = [engine.submit(im, "MVTec", c) for im, c in zip(imgs, classes)]

    results = [None] * 4

    def worker(i):
        results[i] = engine.submit(imgs[i], "MVTec", classes[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for (m_ref, s_ref), got in zip(ref, results):
        assert got is not None
        np.testing.assert_allclose(got[0], m_ref, atol=1e-5)
        np.testing.assert_allclose(got[1], s_ref, atol=1e-6)


def test_bucket_sizing():
    eng = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="fp32", max_batch=8,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    try:
        assert [eng._bucket(n) for n in (1, 2, 3, 5, 8)] == [1, 2, 4, 8, 8]
    finally:
        eng.shutdown()
    dp = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="fp32", max_batch=8, data_parallel=True, precompile=True,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    try:
        # 8-device mesh: buckets round up to mesh-size multiples
        assert [dp._bucket(n) for n in (1, 3, 8)] == [8, 8, 8]
        img = np.random.default_rng(0).integers(0, 256, (3, 70, 70),
                                                dtype=np.uint8)
        amap, score = dp.submit(img, "MVTec", "bottle")
        assert amap.shape == (70, 70)
    finally:
        dp.shutdown()


def test_engine_unknown_class(engine):
    with pytest.raises(KeyError):
        engine.submit(np.zeros((3, 70, 70), np.uint8), "MVTec", "spaceship")


def test_http_predict(server):
    req = urllib.request.Request(
        server + "/predict?dataset=MVTec&class_name=bottle&map_stride=7",
        data=_png_bytes(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = json.loads(resp.read())
    assert resp.status == 200
    assert 0.0 <= payload["image_score"] <= 1.0
    assert payload["map_shape"] == [10, 10]
    assert len(payload["anomaly_map"]) == 10
    # the test engine has no checkpoint: responses must be flagged
    assert payload["untrained"] is True


def test_http_predict_binary_encodings(server):
    """map_encoding=f16/u8: the binary map body must decode to the JSON
    path's map (f16 within float16 rounding, u8 within scale/2), with
    score / shape / untrained riding X-* headers — the respond-side
    transfer lever next to device-side map_stride."""
    png = _png_bytes()
    base = server + "/predict?dataset=MVTec&class_name=bottle&map_stride=7"
    req = urllib.request.Request(base, data=png, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        ref = json.loads(resp.read())
    ref_map = np.asarray(ref["anomaly_map"], np.float32)

    req = urllib.request.Request(base + "&map_encoding=f16", data=png,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        body, hdr = resp.read(), resp.headers
    assert hdr["Content-Type"] == "application/octet-stream"
    assert hdr["X-Map-Dtype"] == "float16"
    shape = tuple(int(x) for x in hdr["X-Map-Shape"].split(","))
    assert shape == (10, 10) and len(body) == 2 * 100
    f16 = np.frombuffer(body, "<f2").reshape(shape).astype(np.float32)
    # JSON rounds to 4 decimals, f16 rounds at ~2^-11 relative
    np.testing.assert_allclose(f16, ref_map, atol=2e-3)
    assert abs(float(hdr["X-Image-Score"]) - ref["image_score"]) < 1e-4
    assert hdr["X-Untrained"] == "1"

    req = urllib.request.Request(base + "&map_encoding=u8", data=png,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        body, hdr = resp.read(), resp.headers
    assert hdr["X-Map-Dtype"] == "uint8" and len(body) == 100
    scale = float(hdr["X-Map-Scale"])
    off = float(hdr["X-Map-Offset"])
    rec = off + scale * np.frombuffer(body, np.uint8).reshape(
        shape).astype(np.float32)
    assert np.abs(rec - ref_map).max() <= max(scale / 2, 1e-6) + 1e-4


def test_http_bad_map_encoding(server):
    req = urllib.request.Request(
        server + "/predict?dataset=MVTec&class_name=bottle"
                 "&map_encoding=gzip",
        data=_png_bytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_http_health_and_classes(server):
    with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["datasets"] == ["MVTec"]
    assert h["untrained"] is True
    with urllib.request.urlopen(server + "/classes?dataset=MVTec",
                                timeout=10) as r:
        c = json.loads(r.read())
    assert "bottle" in c["classes"] and len(c["classes"]) == 15


def test_http_statz(server, engine):
    # self-sufficient: serve at least one request first (module test order
    # must not matter)
    img = np.random.default_rng(11).integers(0, 256, (3, 70, 70),
                                             dtype=np.uint8)
    engine.submit(img, "MVTec", "bottle")
    with urllib.request.urlopen(server + "/statz", timeout=10) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 1 and s["batches"] >= 1
    assert s["errors"] == 0
    assert 1.0 <= s["mean_batch_occupancy"] <= engine.max_batch
    assert s["latency_ms"]["p50"] > 0
    assert s["latency_ms"]["p95"] >= s["latency_ms"]["p50"]
    # phase decomposition: the engine-side phases must be present after a
    # served request (http_read/decode/respond need an HTTP-path request)
    for phase in ("queue_wait", "stack_pad", "dispatch", "device_wait",
                  "map_fetch"):
        row = s["phases"][phase]
        assert row["n"] >= 1, (phase, row)
        assert row["total_s"] >= 0 and row["p95_ms"] >= row["p50_ms"] >= 0


def test_http_statz_http_phases(server):
    """The HTTP-handler phases (body read / decode / response write) land
    in /statz after a POST /predict."""
    req = urllib.request.Request(
        server + "/predict?dataset=MVTec&class_name=bottle&map_stride=7",
        data=_png_bytes(), method="POST")
    with urllib.request.urlopen(req, timeout=30):
        pass
    with urllib.request.urlopen(server + "/statz", timeout=10) as r:
        s = json.loads(r.read())
    for phase in ("http_read", "decode", "respond"):
        assert s["phases"][phase]["n"] >= 1, phase


def test_engine_phase_probe(monkeypatch):
    """AACLIP_SERVE_PHASE_PROBE=1 splits input upload out of device_wait
    (h2d_probe phase appears; numbers stay sane)."""
    monkeypatch.setenv("AACLIP_SERVE_PHASE_PROBE", "1")
    eng = InferenceEngine(model_name="tiny-test", img_size=70,
                          datasets=["MVTec"], max_batch=2, seed=0,
                          adapter_cfg=dict(levels=(1, 2),
                                           image_adapt_until=1,
                                           text_adapt_until=1))
    try:
        img = np.random.default_rng(3).integers(0, 256, (3, 70, 70),
                                                dtype=np.uint8)
        eng.submit(img, "MVTec", "bottle")
        s = eng.stats()
        assert s["phases"]["h2d_probe"]["n"] >= 1
        assert s["phases"]["device_wait"]["n"] >= 1
    finally:
        eng.shutdown()


def test_http_error_paths(server):
    # missing class_name
    req = urllib.request.Request(server + "/predict?dataset=MVTec",
                                 data=_png_bytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    # garbage body
    req = urllib.request.Request(
        server + "/predict?dataset=MVTec&class_name=bottle",
        data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    # unknown class
    req = urllib.request.Request(
        server + "/predict?dataset=MVTec&class_name=spaceship",
        data=_png_bytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 404
    # non-numeric map_stride: 400 up front, BEFORE any compute
    req = urllib.request.Request(
        server + "/predict?dataset=MVTec&class_name=bottle&map_stride=abc",
        data=_png_bytes(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_engine_data_parallel_matches_single_device(engine):
    """--data_parallel serving: same image -> same map/score as the
    single-device engine (8 virtual CPU devices, batch sharded)."""
    import jax

    n = len(jax.devices())
    assert n == 8  # conftest's virtual mesh
    dp = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="fp32", max_batch=8, data_parallel=True,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    try:
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
        m_dp, s_dp = dp.submit(img, "MVTec", "bottle")
        m_sd, s_sd = engine.submit(img, "MVTec", "bottle")
        np.testing.assert_allclose(m_dp, m_sd, atol=1e-5)
        np.testing.assert_allclose(s_dp, s_sd, atol=1e-6)
    finally:
        dp.shutdown()


def test_engine_data_parallel_rejects_indivisible_batch():
    with pytest.raises(ValueError, match="divisible"):
        InferenceEngine(
            model_name="tiny-test", img_size=70, datasets=("MVTec",),
            precision="fp32", max_batch=3, data_parallel=True,
            adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                             text_adapt_until=1))


def test_engine_open_loop_overload():
    """Open-loop burst far above capacity: admission control must bound the
    backlog at max_queue and FAST-FAIL the excess with
    EngineOverloadedError (no request ever burns its full timeout), while
    accepted requests all complete and /statz stays consistent."""
    from aaclip_tpu.serve.server import EngineOverloadedError

    engine = InferenceEngine(
        model_name="tiny-test", img_size=70, datasets=("MVTec",),
        precision="fp32", max_batch=2, max_queue=4,
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1))
    try:
        # slow the dispatch stage so the burst genuinely outruns service
        orig_predict = engine._predict

        def slow_predict(*a):
            time.sleep(0.25)
            return orig_predict(*a)

        engine._predict = slow_predict

        rng = np.random.default_rng(13)
        n = 30
        outcomes = [None] * n

        def fire(i):
            img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
            t0 = time.perf_counter()
            try:
                outcomes[i] = ("ok", time.perf_counter() - t0,
                               engine.submit(img, "MVTec", "bottle",
                                             timeout=60))
            except EngineOverloadedError:
                outcomes[i] = ("rejected", time.perf_counter() - t0, None)
            except Exception as e:
                outcomes[i] = ("err", time.perf_counter() - t0, str(e))

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=90)
        assert all(o is not None for o in outcomes)        # nothing hung
        kinds = [o[0] for o in outcomes]
        assert "err" not in kinds                          # no timeouts/500s
        rejects = [o for o in outcomes if o[0] == "rejected"]
        assert rejects, "burst above max_queue must shed load, not queue it"
        # fast-fail: a reject returns immediately, nowhere near the 60s
        # submit timeout (bounded-memory backlog => bounded reject latency)
        assert max(o[1] for o in rejects) < 2.0
        oks = [o for o in outcomes if o[0] == "ok"]
        assert oks, "admitted requests must still complete"
        s = engine.stats()
        assert s["requests"] == n
        assert s["rejected"] == len(rejects)
        assert s["max_queue"] == 4
        assert s["latency_ms"]["p95"] is not None
    finally:
        engine.shutdown()


def test_engine_artifact_replica_overload(tmp_path):
    """Admission control must still bound the backlog in artifact replica
    mode, where the completion pipeline is deepened to the replica count:
    a burst above max_queue sheds fast instead of queueing."""
    from aaclip_tpu.deploy import export_serving_artifact
    from aaclip_tpu.serve.server import EngineOverloadedError

    out = str(tmp_path / "art")
    export_serving_artifact(
        out, model_name="tiny-test", img_size=70, precision="fp32",
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1),
        datasets=("MVTec",), batch_sizes=(1, 2))
    eng = InferenceEngine(artifact=out, max_batch=2, max_queue=4,
                          data_parallel=True)
    try:
        orig = eng._dispatch  # the replica round-robin closure

        def slow_dispatch(*a):
            time.sleep(0.25)
            return orig(*a)

        eng._dispatch = slow_dispatch
        rng = np.random.default_rng(17)
        n = 30
        outcomes = [None] * n

        def fire(i):
            img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
            t0 = time.perf_counter()
            try:
                eng.submit(img, "MVTec", "bottle", timeout=60)
                outcomes[i] = ("ok", time.perf_counter() - t0)
            except EngineOverloadedError:
                outcomes[i] = ("rejected", time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                outcomes[i] = ("err", time.perf_counter() - t0, str(e))

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=90)
        assert all(o is not None for o in outcomes)
        kinds = [o[0] for o in outcomes]
        assert "err" not in kinds
        rejects = [o for o in outcomes if o[0] == "rejected"]
        assert rejects and max(o[1] for o in rejects) < 2.0
        assert any(o[0] == "ok" for o in outcomes)
        s = eng.stats()
        assert s["requests"] == n and s["rejected"] == len(rejects)
    finally:
        eng.shutdown()


def test_http_429_when_overloaded(server, engine):
    """The HTTP layer maps EngineOverloadedError to 429 + Retry-After."""
    from aaclip_tpu.serve.server import EngineOverloadedError

    orig = engine.submit

    def overloaded(*a, **k):
        raise EngineOverloadedError("request queue full (test)")

    engine.submit = overloaded
    try:
        req = urllib.request.Request(
            f"{server}/predict?dataset=MVTec&class_name=bottle",
            data=_png_bytes(9), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 429
        assert ei.value.headers.get("Retry-After") == "1"
        assert "queue full" in json.loads(ei.value.read())["error"]
    finally:
        engine.submit = orig


def test_engine_submit_rejects_malformed_image(engine):
    """Shape/dtype are validated in submit(): requests are co-batched, so
    a malformed array reaching the serve loop would fail every request in
    its group (round-3 review finding)."""
    rng = np.random.default_rng(2)
    with pytest.raises(ValueError, match="image must be uint8"):
        engine.submit(rng.integers(0, 256, (3, 48, 48), dtype=np.uint8),
                      "MVTec", "bottle")
    with pytest.raises(ValueError, match="image must be uint8"):
        engine.submit(rng.random((3, 70, 70)).astype(np.float32),
                      "MVTec", "bottle")


def test_engine_picks_latest_epoch_snapshot(tmp_path):
    """Snapshots are named image_adapter_{epoch}.npz with no zero padding:
    the latest must be picked by PARSED epoch, not lexicographically
    (which would serve epoch 9 on a 10-epoch run — round-3 review
    finding)."""
    import jax

    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    acfg = dict(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    cfg = get_config("tiny-test")
    old = init_adapter_params(jax.random.PRNGKey(7), cfg,
                              AdapterConfig(**acfg))
    new = init_adapter_params(jax.random.PRNGKey(8), cfg,
                              AdapterConfig(**acfg))
    save_adapter_checkpoint(str(tmp_path / "image_adapter_2.npz"), 2,
                            old["image"])
    save_adapter_checkpoint(str(tmp_path / "image_adapter_10.npz"), 10,
                            new["image"])
    eng = InferenceEngine(model_name="tiny-test", img_size=70,
                          datasets=("MVTec",), precision="fp32",
                          max_batch=2, save_path=str(tmp_path),
                          adapter_cfg=acfg)
    try:
        for got, want in zip(jax.tree.leaves(eng.image_adapter),
                             jax.tree.leaves(new["image"])):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        eng.shutdown()


def test_engine_loads_adapter_checkpoints(tmp_path):
    """save_path adapters change the engine's predictions."""
    import jax
    import numpy as np

    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    acfg = dict(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    base = InferenceEngine(model_name="tiny-test", img_size=70,
                           datasets=("MVTec",), precision="fp32",
                           max_batch=2, adapter_cfg=acfg)
    cfg = get_config("tiny-test")
    other = init_adapter_params(jax.random.PRNGKey(99), cfg,
                                AdapterConfig(**acfg))
    save_adapter_checkpoint(str(tmp_path / "image_adapter_7.npz"), 7,
                            other["image"])
    loaded = InferenceEngine(model_name="tiny-test", img_size=70,
                             datasets=("MVTec",), precision="fp32",
                             max_batch=2, save_path=str(tmp_path),
                             adapter_cfg=acfg)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (3, 70, 70), dtype=np.uint8)
    assert base.untrained and not loaded.untrained
    m1, s1 = base.submit(img, "MVTec", "bottle")
    m2, s2 = loaded.submit(img, "MVTec", "bottle")
    base.shutdown(); loaded.shutdown()

    # orbax-format snapshots are discovered too
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint_any, \
        wait_for_async_saves
    orbax_dir = tmp_path / "orbax_run"
    orbax_dir.mkdir()
    save_adapter_checkpoint_any(str(orbax_dir / "image_adapter_2.npz"), 2,
                                other["image"], backend="orbax")
    wait_for_async_saves()
    ob = InferenceEngine(model_name="tiny-test", img_size=70,
                         datasets=("MVTec",), precision="fp32",
                         max_batch=2, save_path=str(orbax_dir),
                         adapter_cfg=acfg)
    assert not ob.untrained
    m3, s3 = ob.submit(img, "MVTec", "bottle")
    np.testing.assert_allclose(m3, m2, atol=1e-6)
    ob.shutdown()
    assert not np.allclose(m1, m2)  # different adapters -> different maps


def test_engine_falls_back_to_rolling_checkpoint(tmp_path, caplog):
    """A deployment dir with only the rolling image_adapter.npz (no
    per-epoch snapshots) must serve the trained adapter, not random init —
    train.py treats that file as the canonical resume checkpoint.  A
    trained image adapter WITHOUT a text_adapter checkpoint also warns:
    the anchors then come from the frozen text encoder."""
    import logging as _logging

    import jax

    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    acfg = dict(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    cfg = get_config("tiny-test")
    trained = init_adapter_params(jax.random.PRNGKey(21), cfg,
                                  AdapterConfig(**acfg))
    save_adapter_checkpoint(str(tmp_path / "image_adapter.npz"), 5,
                            trained["image"])
    with caplog.at_level(_logging.WARNING, logger="aaclip.serve"):
        eng = InferenceEngine(model_name="tiny-test", img_size=70,
                              datasets=("MVTec",), precision="fp32",
                              max_batch=2, save_path=str(tmp_path),
                              adapter_cfg=acfg)
    try:
        assert not eng.untrained
        for got, want in zip(jax.tree.leaves(eng.image_adapter),
                             jax.tree.leaves(trained["image"])):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert any("FROZEN text encoder" in r.message for r in caplog.records)
    finally:
        eng.shutdown()


def test_engine_ignores_crash_leftover_tmp_snapshots(tmp_path):
    """A crash between the rolling save and the snapshot os.replace leaves
    a truncated image_adapter_1.npz.tmp-<pid>.npz next to a VALID rolling
    image_adapter.npz.  The tmp name matches the snapshot glob but not the
    epoch pattern — it must be filtered out (not fed to the loader, and
    not allowed to defeat the rolling fallback)."""
    import jax

    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import save_adapter_checkpoint

    acfg = dict(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    cfg = get_config("tiny-test")
    trained = init_adapter_params(jax.random.PRNGKey(23), cfg,
                                  AdapterConfig(**acfg))
    save_adapter_checkpoint(str(tmp_path / "image_adapter.npz"), 7,
                            trained["image"])
    (tmp_path / "image_adapter_1.npz.tmp-999.npz").write_bytes(b"trunc")
    eng = InferenceEngine(model_name="tiny-test", img_size=70,
                          datasets=("MVTec",), precision="fp32",
                          max_batch=2, save_path=str(tmp_path),
                          adapter_cfg=acfg)
    try:
        assert not eng.untrained
        for got, want in zip(jax.tree.leaves(eng.image_adapter),
                             jax.tree.leaves(trained["image"])):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        eng.shutdown()


def test_http_413_on_oversized_body(server, monkeypatch):
    """A client-declared Content-Length past the cap is rejected BEFORE
    the body buffer is allocated (413), so a handful of handler threads
    cannot exhaust host RAM.  The body here exceeds kernel socket buffers
    so the bounded post-response drain is what lets the client read the
    413 (closing with unread data would RST the socket)."""
    import urllib.error
    import urllib.request

    import aaclip_tpu.serve.server as srv

    monkeypatch.setattr(srv, "MAX_BODY_BYTES", 1_000_000)
    body = b"x" * 3_000_000
    req = urllib.request.Request(
        f"{server}/predict?dataset=MVTec&class_name=bottle", data=body,
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413
    payload = json.loads(e.value.read())
    assert "exceeds" in payload["error"]
    # and a normal-sized request still works after the rejection
    png = _png_bytes(3)
    req = urllib.request.Request(
        f"{server}/predict?dataset=MVTec&class_name=bottle&map_stride=10",
        data=png, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert json.loads(r.read())["image_score"] is not None
