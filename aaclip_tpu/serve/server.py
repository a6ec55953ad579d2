"""Anomaly-detection inference server.

A production-shaped serving path the reference lacks entirely: one process
holds the compiled model; HTTP requests carry encoded images and receive
pixel anomaly maps + image scores.  Requests are micro-batched — a
collector thread drains the queue up to ``max_batch`` and pads to the
next power-of-2 BUCKET, so concurrent clients share forward passes
without paying max_batch transfer + compute at low occupancy (jit
specializes once per bucket; ``precompile=True`` warms every bucket at
startup so no client ever waits on a compile).

Endpoints
---------
POST /predict?dataset=MVTec&class_name=bottle
    body: PNG/JPEG bytes.  Response JSON:
    {"image_score": float, "anomaly_map": [[...]] (img_size^2, row-major,
     downsampled by "map_stride" query arg if given)}
    "map_encoding=f16" / "map_encoding=u8" switch the response to a raw
    binary map body (application/octet-stream; little-endian C-order
    float16, or affine-quantized uint8 with X-Map-Scale/X-Map-Offset),
    with image_score / map shape / untrained riding X-* headers — 2 or 1
    bytes per pixel instead of ~7 ASCII bytes under JSON.
    429 (Retry-After: 1) when the request queue is at max_queue —
    admission control sheds load instead of queuing past capacity.
GET /healthz          -> {"status": "ok", "img_size": N,
                          "datasets": [...], "untrained": bool}
GET /classes?dataset= -> per-dataset class list
GET /statz            -> serving counters: requests, batches, mean batch
                         occupancy, request-latency p50/p95/max (ms), and
                         a per-phase wall-time decomposition ("phases":
                         http_read / decode / queue_wait / stack_pad /
                         dispatch / device_wait / map_fetch / respond,
                         each with n, total_s, mean/p50/p95 ms; set
                         AACLIP_SERVE_PHASE_PROBE=1 to split input upload
                         out as h2d_probe)

Start with ``python serve.py`` (repo root) or
``python -m aaclip_tpu.serve.server``.
"""

from __future__ import annotations

import io
import json
import logging
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

# request-body allocation cap (bytes): a PNG/JPEG of any sane camera frame
# is far below this; override via AACLIP_SERVE_MAX_BODY_MB for exotic inputs
MAX_BODY_BYTES = int(float(os.environ.get(
    "AACLIP_SERVE_MAX_BODY_MB", "64")) * 1024 * 1024)


def _path_digest(path: str, content: bool = True) -> str:
    """Identity string for a checkpoint path, for anchor-cache keys.

    Small files (adapter npz) hash by content; large ones (the ~900MB CLIP
    .pt — ``content=False``) and orbax directories key on (path, size,
    mtime) per entry, the ccache-style compromise.
    """
    import hashlib

    h = hashlib.sha256()
    path = os.path.abspath(path)
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}|".encode())
    elif content and os.path.getsize(path) <= 256 * 1024 * 1024:
        from aaclip_tpu.utils.hashing import sha256_file

        return sha256_file(path)[:24]
    else:
        st = os.stat(path)
        h.update(f"{os.path.abspath(path)}|{st.st_size}|"
                 f"{st.st_mtime_ns}|".encode())
    return h.hexdigest()[:24]


class EngineOverloadedError(RuntimeError):
    """Raised by ``submit`` when the request queue is at ``max_queue``:
    admission control under sustained open-loop overload. Callers should
    shed load (the HTTP layer maps this to 429) instead of queuing requests
    that would only burn their full timeout."""


class InferenceEngine:
    """Owns the compiled predict function and per-class anchors; serves
    micro-batched requests from a queue."""

    def __init__(self, model_name: str = "ViT-L-14-336", img_size: int = 518,
                 datasets=None, save_path: Optional[str] = None,
                 precision: str = "bf16", max_batch: Optional[int] = 8,
                 batch_window_ms: float = 5.0, seed: int = 111,
                 clip_checkpoint: Optional[str] = None,
                 adapter_cfg: Optional[dict] = None,
                 data_parallel: bool = False,
                 precompile: bool = True,
                 max_queue: Optional[int] = None,
                 anchor_cache: Optional[str] = None,
                 artifact: Optional[str] = None):
        from aaclip_tpu.utils.platform import honor_env_platform
        honor_env_platform()
        import jax

        from aaclip_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self.img_size = img_size
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1000.0
        if artifact is not None:
            # frozen graphs are single-device programs, so data_parallel
            # here means REPLICAS: each device gets its own copy of the
            # graphs + weights and whole micro-batches dispatch round-robin
            # (no cross-device collectives, no bucket divisibility rule)
            self._shard_batches = False
            devs = list(jax.local_devices()) if data_parallel else None
            self._dp_devices = len(devs) if devs else 1
            self.cfg = self.policy = None
            self._init_from_artifact(artifact, datasets, devs)
            self._start_runtime(max_queue, precompile)
            return
        # live engine: anchors are computed, so a dataset list is required
        # up front (None = the reference's default benchmark)
        datasets = tuple(datasets) if datasets is not None else ("MVTec",)

        from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
        from aaclip_tpu.core.params import create_clip_params, init_adapter_params
        from aaclip_tpu.eval.predict import make_anchor_encoder, make_predict_fn
        from aaclip_tpu.ops.similarity import fused_postproc_matrix
        from aaclip_tpu.text.anchors import encode_dataset_anchors

        if self.max_batch is None:  # None only means something in artifact
            self.max_batch = 8      # mode; live keeps the documented default
        max_batch = self.max_batch
        mesh = None
        if data_parallel:
            # validate BEFORE the expensive param/checkpoint setup: a bad
            # flag combination should fail in milliseconds, not after the
            # ~1.7GB on-device param generation
            from aaclip_tpu.parallel import sharding as sh

            sh.initialize_multihost()
            mesh = sh.make_data_mesh()
            if self.max_batch % mesh.devices.size:
                raise ValueError(
                    f"max_batch {max_batch} must be divisible by the "
                    f"{mesh.devices.size}-device mesh for --data_parallel")
        self._dp_devices = mesh.devices.size if mesh is not None else 1
        self._shard_batches = mesh is not None  # live dp shards each batch
        policy = DtypePolicy.from_name(precision)
        self.policy = policy
        cfg = get_config(model_name, img_size)
        self.cfg = cfg
        acfg = AdapterConfig(**(adapter_cfg or {}))
        if max(acfg.levels) > cfg.vision.layers:
            raise ValueError(
                f"adapter levels {acfg.levels} exceed the {cfg.vision.layers}"
                f"-layer tower of {model_name}; pass adapter_cfg/--levels "
                f"matching the model")
        clip = create_clip_params(cfg, checkpoint=clip_checkpoint, seed=seed,
                                  policy=policy)
        adapters = init_adapter_params(jax.random.PRNGKey(seed), cfg, acfg,
                                       policy)
        text_adapter = None
        text_adapter_id = "none"
        self.image_adapter = adapters["image"]
        self.untrained = True  # until a real image-adapter checkpoint loads
        if save_path:
            from aaclip_tpu.train import checkpoint as ckpt

            self.image_adapter, text_adapter, img_path, text_path = \
                ckpt.discover_serving_adapters(save_path, adapters["image"],
                                               adapters["text"])
            if text_path:
                text_adapter_id = _path_digest(text_path)
            else:
                text_adapter = None
            self.untrained = img_path is None
            if not self.untrained and text_adapter is None:
                # trained image adapters were optimized against ADAPTED-text
                # anchors (unless --text_epoch 0); serving them with frozen-
                # text anchors silently degrades quality — say so
                logging.getLogger("aaclip.serve").warning(
                    "image adapter loaded but no text_adapter checkpoint "
                    "under save_path=%r — anchors come from the FROZEN text "
                    "encoder (only correct for --text_epoch 0 runs)",
                    save_path)
        if self.untrained:
            # random-init adapters produce syntactically valid but
            # meaningless maps; refuse to pretend otherwise silently
            logging.getLogger("aaclip.serve").warning(
                "serving with RANDOM-INIT adapters (no image_adapter_*.npz "
                "under save_path=%r) — /predict responses are not anomaly "
                "detections; responses carry \"untrained\": true", save_path)
        self.image_adapter = jax.tree.map(jax.numpy.asarray, self.image_adapter)

        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn

        attn_fn = maybe_make_attn_fn(cfg, policy)
        self._predict = make_predict_fn(
            clip, cfg, acfg, img_size=img_size, policy=policy,
            attn_fn=attn_fn, uint8_inputs=True, mesh=mesh)

        # anchors + postproc matrices per dataset/class.  With anchor_cache
        # set, anchors load from disk keyed by everything that determines
        # them (prompts via the token bytes; params provenance, adapter
        # digest, adapter config, precision, backend here) — on a slow
        # device link the text tower is minutes of serving cold-start for
        # a result that is a pure function of those inputs.
        enc = make_anchor_encoder(clip, cfg, acfg, text_adapter, policy=policy)
        from aaclip_tpu.data.registry import DOMAINS

        if anchor_cache:
            from aaclip_tpu.core.params import resolve_clip_checkpoint
            from aaclip_tpu.text.anchors import encode_dataset_anchors_cached
            # key on the checkpoint create_clip_params actually LOADED —
            # with no explicit --clip_checkpoint it may have discovered
            # one (AACLIP_CKPT / bundled weights), and installing or
            # removing weights between runs must change the key
            effective_ckpt = resolve_clip_checkpoint(cfg, clip_checkpoint)
            clip_id = (_path_digest(effective_ckpt, content=False)
                       if effective_ckpt else f"seed{seed}")
            identity = "|".join([
                model_name, f"clip={clip_id}", f"text_ad={text_adapter_id}",
                f"acfg={acfg!r}", f"policy={policy!r}",
                # anchors are device-computed numerics: both the library
                # version and the hardware generation can shift them
                f"jax={jax.__version__}",
                f"backend={jax.default_backend()}",
                f"device={jax.devices()[0].device_kind}"])
        self.anchors: Dict[str, Dict[str, np.ndarray]] = {}
        self.postproc: Dict[str, np.ndarray] = {}
        for ds in datasets:
            if anchor_cache:
                self.anchors[ds] = encode_dataset_anchors_cached(
                    enc, ds, identity, anchor_cache)
            else:
                self.anchors[ds] = {
                    k: np.asarray(v)
                    for k, v in encode_dataset_anchors(enc, ds).items()
                }
            self.postproc[ds] = np.asarray(
                fused_postproc_matrix(cfg.vision.grid, img_size, DOMAINS[ds]))

        self._start_runtime(max_queue, precompile)

    def _init_from_artifact(self, artifact: str, datasets,
                            devs=None) -> None:
        """Serve a frozen jax.export artifact (aaclip_tpu/deploy.py): no
        torch, no checkpoint parse, no text tower — load graphs + constants
        and go.  The engine's power-of-2 buckets must all exist as exported
        graphs; requests dispatch to the artifact's jit-wrapped calls.

        ``devs``: replica device list (data_parallel). Each device gets its
        own copy of the weights/anchors/postproc; micro-batches dispatch
        whole to one device, round-robin."""
        from aaclip_tpu.deploy import load_serving_artifact

        art = load_serving_artifact(artifact)
        self._artifact = art
        if datasets is None:  # the artifact IS the dataset selection
            datasets = tuple(sorted(art.anchors))
        self.img_size = art.img_size
        if self.max_batch is None:  # default to the artifact's own shape
            self.max_batch = art.batch_sizes[-1]
        # each engine bucket dispatches to the smallest exported graph that
        # fits it (equal when the export used the same power-of-2 ladder;
        # padded up otherwise, e.g. --max_batch 12 over a 16 graph)
        need = sorted({self._bucket(n)
                       for n in range(1, self.max_batch + 1)})
        graph_for = {}
        for b in need:
            fit = [x for x in art.batch_sizes if x >= b]
            if not fit:
                raise ValueError(
                    f"artifact at {artifact!r} lacks graphs for buckets "
                    f">= {b} required by max_batch={self.max_batch} "
                    f"(exported: {art.batch_sizes}) — re-export with "
                    "--batch_sizes covering them or lower --max_batch")
            graph_for[b] = fit[0]
        want = set(datasets) - set(art.anchors)
        if want:
            raise ValueError(
                f"artifact at {artifact!r} lacks datasets {sorted(want)} "
                f"(has {sorted(art.anchors)}) — re-export with --datasets")
        self.anchors = {ds: dict(art.anchors[ds]) for ds in datasets}
        self.postproc = {ds: art.postproc[ds] for ds in datasets}
        self.image_adapter = art.image_adapter
        self.untrained = art.untrained
        if self.untrained:
            logging.getLogger("aaclip.serve").warning(
                "artifact %s carries RANDOM-INIT adapters "
                "(manifest.untrained=true) — /predict responses are not "
                "anomaly detections", artifact)

        def _call(visual, image_adapter, imgs, anch, M):
            import jax.numpy as jnp

            b = imgs.shape[0]
            g = graph_for[b]
            if g > b:  # pad up to the graph's shape (edge replication —
                pad = g - b  # never feed l2-normalization a zero lane)
                imgs = jnp.concatenate(
                    [imgs, jnp.broadcast_to(imgs[-1:], (pad,) +
                                            imgs.shape[1:])])
                anch = jnp.concatenate(
                    [anch, jnp.broadcast_to(anch[-1:], (pad,) +
                                            anch.shape[1:])])
            pix, score = art._fns[g](visual, image_adapter, imgs, anch, M)
            return pix[:b], score[:b]

        def _predict(image_adapter, imgs, anch, M):
            return _call(art.visual, image_adapter, imgs, anch, M)

        self._predict = _predict
        if devs:
            import jax

            # one copy of everything per device, placed once; jit executes
            # on whichever device the (committed) inputs live on
            visual_rep = [jax.device_put(art.visual, d) for d in devs]
            adapter_rep = [jax.device_put(art.image_adapter, d)
                           for d in devs]
            postproc_rep = {ds: [jax.device_put(self.postproc[ds], d)
                                 for d in devs] for ds in self.postproc}
            rr_lock = threading.Lock()
            self._rr = 0

            def _dispatch_replica(imgs, anch, ds):
                with rr_lock:
                    i = self._rr
                    self._rr = (i + 1) % len(devs)
                d = devs[i]
                return _call(visual_rep[i], adapter_rep[i],
                             jax.device_put(np.asarray(imgs), d),
                             jax.device_put(np.asarray(anch, np.float32), d),
                             postproc_rep[ds][i])

            self._dispatch = _dispatch_replica

    def _start_runtime(self, max_queue: Optional[int],
                       precompile: bool) -> None:
        import jax.numpy as jnp

        # stats fields first: the precompile loop below goes through
        # _dispatch, which notes phase timings
        self._stats_lock = threading.Lock()
        self._phase_stats: Dict[str, list] = {}   # name -> ring of ms
        self._phase_total: Dict[str, list] = {}   # name -> [count, sum_ms]
        self._phase_probe = False  # enabled after warmup (below) so the
        # precompile dispatches don't pollute the h2d_probe numbers

        # postproc matrices live on device once (re-uploading ~77KB per
        # micro-batch through a slow host link is pure per-forward overhead)
        self._postproc_dev = {ds: jnp.asarray(m)
                              for ds, m in self.postproc.items()}
        if precompile:
            # compile every bucket up front: a jit compile inside the
            # request path would blow past submit()'s timeout on the first
            # request hitting each new bucket size. Replica mode warms
            # every device (jit caches per placement).
            ds0 = next(iter(self.anchors))
            a0 = np.asarray(next(iter(self.anchors[ds0].values())))
            for b in sorted({self._bucket(n)
                             for n in range(1, self.max_batch + 1)}):
                imgs = np.zeros((b, 3, self.img_size, self.img_size),
                                np.uint8)
                anch = np.tile(a0[None], (b, 1, 1))
                for _ in range(self._dp_devices
                               if not self._shard_batches else 1):
                    _, sc = self._dispatch(imgs, anch, ds0)
                    # MATERIALIZE: dispatch alone only queues the work —
                    # on relay backends the compile+run happen remotely
                    # and /healthz would report ready while minutes of
                    # bucket compiles still sit in front of the first
                    # request, which then burns its submit timeout (the
                    # exact failure the chip artifact smoke hit —
                    # docs/PERFORMANCE.md "Artifact serving")
                    np.asarray(sc)

        # admission control: reject (fast-fail) once the backlog exceeds
        # max_queue instead of letting requests pile up to burn their full
        # submit timeout under sustained open-loop overload
        self.max_queue = (max_queue if max_queue is not None
                          else 4 * self.max_batch)
        if self.max_queue < 1:
            raise ValueError(f"max_queue must be >= 1, got {self.max_queue}")
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.max_queue)
        # bounded: put() blocks the dispatcher when the completion stage
        # falls behind, so a bounded number of batches of device results
        # are ever in flight (without this, async dispatch would let the
        # serve loop run unboundedly ahead of materialization under
        # open-loop load). Replica mode needs depth >= replica count or
        # round-robin dispatch could never keep all devices busy.
        depth = 2 if self._shard_batches else max(2, self._dp_devices)
        self._completion_q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._n_requests = 0
        self._n_errors = 0
        self._n_rejected = 0
        self._n_batches = 0
        self._n_batched_requests = 0
        self._latencies_ms: list = []  # ring buffer, last 1024 requests
        # request-path phase decomposition (/statz "phases"): cumulative
        # totals + a recent-window ring per phase, fields initialized at
        # the top of this method.  This is what turns "the 10.9 maps/s
        # ceiling is relay-transfer-bound" from an inference into a
        # measured split: http_read/decode are host request work,
        # queue_wait is batching backpressure, stack_pad + dispatch are
        # host batch assembly + async submit, device_wait is
        # input-transfer + forward (blocks on the first fetched scalar),
        # map_fetch is the [B, H, W] result readback.  The optional h2d
        # probe (AACLIP_SERVE_PHASE_PROBE=1) splits input upload out of
        # device_wait at the cost of one extra device roundtrip per batch;
        # its forced upload wait happens INSIDE _dispatch, so the dispatch
        # phase subtracts it (round-5 lesson: before the subtraction a
        # probe-mode run read "dispatch 257 ms" that was 250 ms of h2d,
        # and the overlap was misdiagnosed as call overhead).
        self._phase_probe = os.environ.get(
            "AACLIP_SERVE_PHASE_PROBE", "") == "1"
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()
        # completion stage: jax dispatch is async, so materializing batch
        # k's device->host results here overlaps with batch k+1's
        # transfer + forward in the dispatch thread (a 2-stage pipeline)
        self._completer = threading.Thread(target=self._completion_loop,
                                           daemon=True)
        self._completer.start()

    def _dispatch(self, imgs, anch, ds):
        """One padded host micro-batch -> async device (maps, scores).
        Base: place on the default device and run the live predict fn.
        The artifact replica path overrides this per instance with
        round-robin device placement."""
        import jax.numpy as jnp

        imgs_dev = jnp.asarray(imgs)
        if self._phase_probe:
            # measurement mode: force the input upload to finish and time
            # it, splitting h2d out of device_wait. One extra scalar
            # roundtrip per batch — off by default so steady-state numbers
            # stay unperturbed (AACLIP_SERVE_PHASE_PROBE=1 to enable).
            t0 = time.perf_counter()
            float(imgs_dev[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            self._note_phase("h2d_probe", dt * 1e3)
            # let the caller's dispatch timing exclude this blocking wait
            # (single dispatch-loop thread; replica overrides that skip
            # this attribute simply report un-split dispatch)
            self._probe_wait_s = dt
        return self._predict(self.image_adapter, imgs_dev,
                             jnp.asarray(anch), self._postproc_dev[ds])

    def _bucket(self, n: int) -> int:
        """Smallest power-of-2 >= n (clamped to max_batch; rounded up to a
        mesh-size multiple under data parallelism).  Bounds the compiled
        shapes to log2(max_batch) variants while keeping transfer + compute
        proportional to actual occupancy instead of always max_batch."""
        b = 1
        while b < n:
            b *= 2
        # artifact replicas take whole micro-batches on one device each, so
        # only the sharded (live dp) mode needs mesh-multiple buckets
        m = self._dp_devices if self._shard_batches else 1
        if m > 1:
            b = ((max(b, m) + m - 1) // m) * m
        return min(b, self.max_batch)

    # -- request plumbing ---------------------------------------------------

    def submit(self, image_u8: np.ndarray, dataset: str, class_name: str,
               timeout: float = 30.0, map_stride: int = 1):
        """image_u8: [3, img_size, img_size] uint8.  Blocks for the result.

        Shape/dtype are validated HERE: requests are co-batched, so one
        malformed array reaching the serve loop would fail (or silently
        recompile an unwarmed bucket for) every request in its group.

        ``map_stride > 1`` returns ``map[::s, ::s]`` — sliced ON DEVICE
        before the readback.  The phase split measured the full-map fetch
        at ~45% of batch wall on the relay rig (docs/PERFORMANCE.md), so
        striding at the engine (not the HTTP layer) turns a decorative
        downsample into a serving-throughput lever.  Strides are
        per-request and co-batchable (the completion stage groups by
        stride); values must equal full-map-then-stride exactly.
        """
        map_stride = int(map_stride)
        if map_stride < 1:
            raise ValueError(f"map_stride must be >= 1, got {map_stride}")
        image_u8 = np.asarray(image_u8)
        want = (3, self.img_size, self.img_size)
        if image_u8.dtype != np.uint8 or image_u8.shape != want:
            raise ValueError(
                f"image must be uint8 {list(want)}, got {image_u8.dtype} "
                f"{list(image_u8.shape)}")
        if dataset not in self.anchors:
            raise KeyError(f"dataset {dataset} not loaded; have "
                           f"{sorted(self.anchors)}")
        if class_name not in self.anchors[dataset]:
            raise KeyError(
                f"class {class_name} unknown for {dataset}; have "
                f"{sorted(self.anchors[dataset])}")
        done = threading.Event()
        slot: dict = {"stride": map_stride}
        t0 = time.perf_counter()
        slot["t_enq"] = t0  # queue_wait phase start (read by _serve_loop)
        try:
            self._queue.put_nowait((image_u8, dataset, class_name, slot, done))
        except queue.Full:
            with self._stats_lock:
                self._n_requests += 1
                self._n_rejected += 1
            raise EngineOverloadedError(
                f"request queue full ({self.max_queue} pending); retry "
                f"later") from None
        if not done.wait(timeout):
            with self._stats_lock:
                self._n_requests += 1
                self._n_errors += 1
            raise TimeoutError("inference timed out")
        with self._stats_lock:
            self._n_requests += 1
            if "error" in slot:
                self._n_errors += 1
            else:
                self._latencies_ms.append((time.perf_counter() - t0) * 1e3)
                del self._latencies_ms[:-1024]
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["map"], slot["score"]

    def _note_phase(self, name: str, ms: float) -> None:
        with self._stats_lock:
            ring = self._phase_stats.setdefault(name, [])
            ring.append(ms)
            del ring[:-512]
            tot = self._phase_total.setdefault(name, [0, 0.0])
            tot[0] += 1
            tot[1] += ms

    def stats(self) -> dict:
        """Serving counters for /statz (mean batch occupancy measures how
        well micro-batching amortizes forwards under the current load;
        "phases" decomposes where request wall time goes — see
        _start_runtime's field comment)."""
        with self._stats_lock:
            lat = sorted(self._latencies_ms)
            nb, nr = self._n_batches, self._n_batched_requests
            total, errors = self._n_requests, self._n_errors
            rejected = self._n_rejected
            phases = {
                name: (sorted(ring), list(self._phase_total[name]))
                for name, ring in self._phase_stats.items()
            }

        def pct(p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))], 2) \
                if lat else None

        def phase_row(ring, tot):
            n, s = tot
            return {
                "n": n,
                "total_s": round(s / 1e3, 3),
                "mean_ms": round(s / n, 2) if n else None,
                "p50_ms": round(ring[min(len(ring) - 1,
                                         len(ring) // 2)], 2),
                "p95_ms": round(ring[min(len(ring) - 1,
                                         int(0.95 * len(ring)))], 2),
            }

        return {
            "requests": total,
            "errors": errors,
            "rejected": rejected,
            "batches": nb,
            "mean_batch_occupancy": round(nr / nb, 3) if nb else None,
            "max_batch": self.max_batch,
            "max_queue": self.max_queue,
            "latency_ms": {"p50": pct(0.50), "p95": pct(0.95),
                           "max": round(lat[-1], 2) if lat else None},
            "phases": {name: phase_row(ring, tot)
                       for name, (ring, tot) in sorted(phases.items())},
        }

    def _serve_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # group by dataset only: classes share a forward via per-sample
            # anchors [B, D, 2] (the postproc matrix is domain- i.e.
            # dataset-dependent, so datasets cannot mix)
            groups: Dict[str, list] = {}
            for item in batch:
                groups.setdefault(item[1], []).append(item)
            for ds, items in groups.items():
                with self._stats_lock:
                    self._n_batches += 1
                    self._n_batched_requests += len(items)
                try:
                    t_group = time.perf_counter()
                    for it in items:  # queue_wait: enqueue -> group start
                        self._note_phase(
                            "queue_wait", (t_group - it[3]["t_enq"]) * 1e3)
                    imgs = np.stack([it[0] for it in items])
                    anch = np.stack([self.anchors[ds][it[2]] for it in items])
                    n = imgs.shape[0]
                    bucket = self._bucket(n)
                    if n < bucket:  # pad to the bucket's compiled shape
                        pad = bucket - n
                        imgs = np.concatenate(
                            [imgs, np.repeat(imgs[-1:], pad, axis=0)])
                        anch = np.concatenate(
                            [anch, np.repeat(anch[-1:], pad, axis=0)])
                    t_stacked = time.perf_counter()
                    self._note_phase("stack_pad",
                                     (t_stacked - t_group) * 1e3)
                    self._probe_wait_s = 0.0
                    pix, score = self._dispatch(imgs, anch, ds)
                    self._note_phase(
                        "dispatch",
                        (time.perf_counter() - t_stacked
                         - getattr(self, "_probe_wait_s", 0.0)) * 1e3)
                    # hand the (async) device arrays to the completion
                    # stage; this thread immediately collects the next batch
                    self._completion_q.put((items, pix, score))
                except Exception as e:  # propagate to all waiters
                    for _, _, _, slot, done in items:
                        slot["error"] = f"{type(e).__name__}: {e}"
                        done.set()

    def _completion_loop(self):
        while not self._stop.is_set():
            try:
                items, pix, score = self._completion_q.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                # fetch the [B] scores FIRST: the small array materializes
                # when the forward (and its input transfer) completes, so
                # this wait is the device phase; the big [B, H, W] map
                # readback is then pure result D2H — the split the
                # "relay-transfer-bound" analysis needs
                t0 = time.perf_counter()
                score = np.asarray(score)
                t1 = time.perf_counter()
                self._note_phase("device_wait", (t1 - t0) * 1e3)
                # map readback, grouped by requested stride: striding on
                # DEVICE shrinks the dominant D2H phase by stride^2.
                # Each stride slices the WHOLE padded bucket — a STATIC
                # shape, so XLA compiles one slice program per
                # (bucket, stride) pair and every later batch reuses it
                # (a dynamic per-item gather here compiled per occupancy
                # and burned seconds per fresh shape through the relay —
                # measured, docs/PERFORMANCE.md serving section)
                strides = {slot.get("stride", 1)
                           for _, _, _, slot, _ in items}
                fetched = {}
                for s in strides:
                    sub = pix if s == 1 else pix[:, ::s, ::s]
                    fetched[s] = np.asarray(sub)
                self._note_phase("map_fetch",
                                 (time.perf_counter() - t1) * 1e3)
                for i, (_, _, _, slot, done) in enumerate(items):
                    slot["map"] = fetched[slot.get("stride", 1)][i]
                    slot["score"] = float(score[i])
                    done.set()
            except Exception as e:
                for _, _, _, slot, done in items:
                    slot["error"] = f"{type(e).__name__}: {e}"
                    done.set()

    def shutdown(self):
        self._stop.set()
        self._worker.join(timeout=2)
        self._completer.join(timeout=2)
        # fast-fail anything still queued so waiters don't sit out their
        # full submit timeout.  Loop until both threads are actually dead:
        # the dispatch thread can be blocked in the bounded
        # _completion_q.put — draining unblocks it, after which it may
        # enqueue ONE more batch before seeing _stop, so a single drain
        # pass would strand those waiters for their full timeout.
        deadline = time.perf_counter() + 5.0
        while True:
            drained = False
            for q in (self._queue, self._completion_q):
                while True:
                    try:
                        item = q.get_nowait()
                    except queue.Empty:
                        break
                    drained = True
                    items = item[0] if q is self._completion_q else [item]
                    for _, _, _, slot, done in items:
                        slot["error"] = "engine shutting down"
                        done.set()
            workers_dead = (not self._worker.is_alive()
                            and not self._completer.is_alive())
            if (workers_dead and not drained) or \
                    time.perf_counter() > deadline:
                break
            time.sleep(0.01)


def _decode_image(body: bytes, img_size: int) -> np.ndarray:
    from PIL import Image

    from aaclip_tpu.data.transforms import resize_image, to_uint8_chw

    img = Image.open(io.BytesIO(body)).convert("RGB")
    return to_uint8_chw(resize_image(img, img_size))


def make_handler(engine: InferenceEngine):
    class Handler(BaseHTTPRequestHandler):
        # socket timeout: without it a client that announces a larger
        # Content-Length than it sends parks this handler thread in
        # rfile.read forever — a few such requests permanently leak
        # ThreadingHTTPServer threads
        timeout = 65

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict,
                  headers: Optional[dict] = None):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "img_size": engine.img_size,
                    "datasets": sorted(engine.anchors),
                    "untrained": engine.untrained,
                    "map_encodings": ["json", "f16", "u8"],
                })
            elif url.path == "/statz":
                self._json(200, engine.stats())
            elif url.path == "/classes":
                q = parse_qs(url.query)
                ds = q.get("dataset", [next(iter(engine.anchors))])[0]
                if ds not in engine.anchors:
                    self._json(404, {"error": f"dataset {ds} not loaded"})
                    return
                self._json(200, {"dataset": ds,
                                 "classes": sorted(engine.anchors[ds])})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            q = parse_qs(url.query)
            ds = q.get("dataset", [next(iter(engine.anchors))])[0]
            cls = q.get("class_name", [None])[0]
            if cls is None:
                self._json(400, {"error": "class_name query arg required"})
                return
            # parse ALL client-controlled numerics up front: a bad
            # map_stride discovered after the forward pass would waste the
            # compute and escape do_POST as an uncaught ValueError
            try:
                stride = max(1, int(q.get("map_stride", ["1"])[0]))
            except ValueError:
                self._json(400, {"error": "map_stride must be an integer"})
                return
            encoding = q.get("map_encoding", ["json"])[0]
            if encoding not in ("json", "f16", "u8"):
                self._json(400, {"error": "map_encoding must be one of "
                                          "json, f16, u8"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._json(400, {"error": "bad Content-Length header"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body (expected image bytes)"})
                return
            if length > MAX_BODY_BYTES:
                # cap the allocation BEFORE reading: a client-declared
                # Content-Length otherwise buys an arbitrary buffer per
                # handler thread — a cheaper DoS than the queue overload
                # the 429 admission control sheds
                self._json(413, {"error": f"body {length} bytes exceeds "
                                          f"the {MAX_BODY_BYTES} limit"})
                # drain the in-flight body AFTER responding: closing with
                # unread data in the receive queue RSTs the socket and the
                # client sees a connection reset instead of the 413; bound
                # the drain so an abusive Content-Length cannot hold the
                # handler thread forever
                remaining = min(length, 4 * MAX_BODY_BYTES)
                while remaining > 0:
                    chunk = self.rfile.read(min(65536, remaining))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                self.close_connection = True
                return
            t0 = time.perf_counter()
            body = self.rfile.read(length)
            t1 = time.perf_counter()
            engine._note_phase("http_read", (t1 - t0) * 1e3)
            try:
                img = _decode_image(body, engine.img_size)
            except Exception as e:
                self._json(400, {"error": f"could not decode image: {e}"})
                return
            engine._note_phase("decode", (time.perf_counter() - t1) * 1e3)
            try:
                # stride inside the engine: the map is sliced on DEVICE,
                # so the readback (the dominant phase on relay rigs)
                # shrinks by stride^2 instead of only the JSON payload
                amap, score = engine.submit(img, ds, cls,
                                            map_stride=stride)
            except KeyError as e:
                self._json(404, {"error": str(e)})
                return
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            except EngineOverloadedError as e:
                self._json(429, {"error": str(e)},
                           headers={"Retry-After": "1"})
                return
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            t2 = time.perf_counter()
            if encoding == "json":
                payload = {
                    "image_score": score,
                    "map_shape": list(amap.shape),  # engine already strided
                    "anomaly_map": np.round(amap, 4).tolist(),
                }
                if engine.untrained:
                    payload["untrained"] = True
                self._json(200, payload)
            else:
                # binary map body (map_encoding=f16/u8): the respond phase
                # JSON-encodes ~7 ASCII bytes per pixel — on a full 518^2
                # map that is megabytes of text per request.  f16 sends the
                # raw little-endian C-order float16 buffer (2 B/px, ~2^-11
                # relative rounding); u8 sends an affine-quantized byte map
                # (1 B/px): value = offset + scale * byte, scale/offset in
                # headers (max quantization error scale/2 on a map whose
                # dynamic range is ~[0,1]).  Everything scalar rides
                # response headers so the body is exactly the map buffer.
                amap = np.ascontiguousarray(amap, np.float32)
                if encoding == "f16":
                    body = amap.astype("<f2").tobytes()
                    headers = {"X-Map-Dtype": "float16"}
                else:
                    lo = float(amap.min()) if amap.size else 0.0
                    hi = float(amap.max()) if amap.size else 0.0
                    scale = (hi - lo) / 255.0
                    qmap = (np.zeros(amap.shape, np.uint8) if scale == 0.0
                            else np.clip(np.rint((amap - lo) / scale),
                                         0, 255).astype(np.uint8))
                    body = qmap.tobytes()
                    headers = {"X-Map-Dtype": "uint8",
                               "X-Map-Scale": repr(scale),
                               "X-Map-Offset": repr(lo)}
                headers["X-Image-Score"] = repr(float(score))
                headers["X-Map-Shape"] = ",".join(
                    str(d) for d in amap.shape)
                if engine.untrained:
                    headers["X-Untrained"] = "1"
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                for k, v in headers.items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)
            engine._note_phase("respond", (time.perf_counter() - t2) * 1e3)

    return Handler


def serve(engine: InferenceEngine, host: str = "127.0.0.1",
          port: int = 8400) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer((host, port), make_handler(engine))
    return httpd


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="aaclip_tpu inference server")
    parser.add_argument("--artifact", default=None,
                        help="serve a frozen jax.export artifact directory "
                             "(tools/export_artifact.py). Model/adapter/"
                             "precision flags are ignored — the artifact "
                             "IS the model; --datasets selects among the "
                             "artifact's bundled datasets")
    parser.add_argument("--model_name", default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--datasets", nargs="+", default=None,
                        help="datasets to build anchors for (default: "
                             "MVTec); with --artifact, selects among the "
                             "bundled datasets (default: all of them)")
    parser.add_argument("--save_path", default=None,
                        help="adapter checkpoint dir (optional)")
    parser.add_argument("--precision", default="bf16",
                        choices=["fp32", "fp32_high", "bf16", "int8"])
    parser.add_argument("--max_batch", type=int, default=None,
                        help="largest micro-batch (default 8; with "
                             "--artifact, the artifact's largest exported "
                             "bucket)")
    parser.add_argument("--max_queue", type=int, default=None,
                        help="pending-request cap (default 4 x max_batch); "
                             "submits beyond it fast-fail with HTTP 429")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--clip_checkpoint", default=None)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard each micro-batch over all local devices "
                             "(max_batch must divide by the device count). "
                             "With --artifact: one replica per device "
                             "instead, whole micro-batches round-robin "
                             "(no divisibility rule)")
    parser.add_argument("--no_precompile", action="store_true",
                        help="skip compiling every batch bucket at startup. "
                             "Faster boot, but on a COLD compile cache the "
                             "first request hitting each bucket size will "
                             "fail with a 500 timeout (the compile exceeds "
                             "the 30s submit window) and only retries "
                             "succeed — use with a warm persistent cache")
    parser.add_argument("--anchor_cache", default=os.environ.get(
                            "AACLIP_ANCHOR_CACHE",
                            os.path.expanduser("~/.cache/aaclip_tpu/anchors")),
                        help="disk cache dir for text anchors (content-"
                             "keyed; cuts minutes of text-tower cold-start "
                             "on a slow device link). Default from "
                             "AACLIP_ANCHOR_CACHE; --anchor_cache '' "
                             "disables")
    parser.add_argument("--levels", type=int, nargs="+",
                        default=[6, 12, 18, 24])
    parser.add_argument("--image_adapt_until", type=int, default=6)
    parser.add_argument("--text_adapt_until", type=int, default=3)
    parser.add_argument("--relu", action="store_true")
    args = parser.parse_args(argv)

    # Engine startup alone takes minutes on the TPU (params + anchors +
    # bucket precompiles) — bound the FIRST backend contact so a dead
    # relay is a fast diagnosable exit, not an apparent engine hang.
    from aaclip_tpu.utils.platform import probe_devices_or_exit
    probe_devices_or_exit()

    datasets = tuple(args.datasets) if args.datasets else None
    if args.artifact:
        engine = InferenceEngine(
            artifact=args.artifact, datasets=datasets,
            max_batch=args.max_batch, max_queue=args.max_queue,
            data_parallel=args.data_parallel,
            precompile=not args.no_precompile)
    else:
        engine = InferenceEngine(
            model_name=args.model_name, img_size=args.img_size,
            datasets=datasets, save_path=args.save_path,
            precision=args.precision, max_batch=args.max_batch,
            max_queue=args.max_queue,
            clip_checkpoint=args.clip_checkpoint,
            data_parallel=args.data_parallel,
            precompile=not args.no_precompile,
            anchor_cache=args.anchor_cache or None,
            adapter_cfg=dict(levels=tuple(args.levels),
                             image_adapt_until=args.image_adapt_until,
                             text_adapt_until=args.text_adapt_until,
                             proj_relu=args.relu))
    httpd = serve(engine, args.host, args.port)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(datasets: {sorted(engine.anchors)})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
