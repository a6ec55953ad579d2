"""Self-contained serving artifacts: ``jax.export``-frozen prediction
graphs plus every derived constant needed to serve them, in one directory.

The reference has no deployment story — each process start rebuilds the
torch model from the ~1.7 GB checkpoint and re-encodes the prompt set
(reference ``test.py:29-49``, ``forward_utils.py:131-192``).  A production
TPU serving host wants the opposite: trace and freeze the graph ONCE
(StableHLO, versioned, callable without torch or any model-building code),
bundle the prepared trunk weights, adapter weights, text anchors and
postproc matrices next to it, and let the host just ``load_serving_artifact
(dir).predict(...)``.

Artifact layout::

    manifest.json     version, config echo, pytree skeletons, platforms
    graph_b{N}.bin    serialized StableHLO per batch bucket
    params.npz        prepared trunk + adapter leaves (raw bytes: bf16 and
                      int8 leaves do not survive npz dtype round-trips)
    anchors_{ds}.npz  [D, 2] text anchors per class
    postproc_{ds}.npy fused blur+upsample matrix per dataset domain

Graph stability caveat: a graph exported with the Pallas attention kernels
embeds TPU Mosaic custom calls, which are compiler-version-pinned rather
than StableHLO-stable; the exporter therefore defaults to the pure-XLA
attention path (portable across jax releases) and takes Pallas only on
explicit opt-in.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from aaclip_tpu.utils.hashing import sha256_file

ARTIFACT_VERSION = 1
_MANIFEST = "manifest.json"


# ---------------------------------------------------------------------------
# pytree <-> (JSON skeleton, leaf list): Exported.call requires the exact
# pytree structure it was traced with, so the structure ships in the
# manifest and the leaves ship as raw bytes in params.npz.


def _skeletonize(tree, leaves: list):
    if isinstance(tree, dict):
        return {"t": "dict",
                "items": {k: _skeletonize(tree[k], leaves)
                          for k in sorted(tree)}}
    if isinstance(tree, (list, tuple)):
        return {"t": "list" if isinstance(tree, list) else "tuple",
                "items": [_skeletonize(v, leaves) for v in tree]}
    arr = np.asarray(tree)
    leaves.append(arr)
    return {"t": "leaf", "i": len(leaves) - 1,
            "shape": list(arr.shape), "dtype": arr.dtype.name}


def _rebuild(skel, leaves: list):
    kind = skel["t"]
    if kind == "dict":
        return {k: _rebuild(v, leaves) for k, v in skel["items"].items()}
    if kind in ("list", "tuple"):
        seq = [_rebuild(v, leaves) for v in skel["items"]]
        return seq if kind == "list" else tuple(seq)
    return leaves[skel["i"]]


def _leaf_bytes(arr: np.ndarray) -> np.ndarray:
    return np.frombuffer(arr.tobytes(), np.uint8)


def _leaf_from_bytes(buf: np.ndarray, shape, dtype_name: str) -> np.ndarray:
    import jax.numpy as jnp  # resolves bfloat16 via ml_dtypes

    dt = jnp.dtype(dtype_name)
    return np.frombuffer(buf.tobytes(), dt).reshape(shape)


def _sds_of(tree):
    import jax

    # leaves are jax/np arrays: read shape/dtype attributes, never
    # np.asarray (which would pull every trunk leaf across the device link)
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        tree)


# ---------------------------------------------------------------------------
# export


def export_serving_artifact(
        out_dir: str, *,
        model_name: str = "ViT-L-14-336", img_size: int = 518,
        precision: str = "bf16", adapter_cfg: Optional[dict] = None,
        clip_checkpoint: Optional[str] = None, seed: int = 111,
        save_path: Optional[str] = None,
        datasets: Sequence[str] = ("MVTec",),
        batch_sizes: Sequence[int] = (1, 2, 4, 8, 16, 32),
        platforms: Optional[Sequence[str]] = None,
        native_kernels: bool = False,
        memory_bank_shot: int = 0, bank_weight: float = 0.5,
        bank_chunk: int = 1024) -> dict:
    """Build the serving pipeline exactly like the HTTP engine and freeze
    it into ``out_dir``.  Returns the manifest dict.

    ``platforms``: target platform list for ``jax.export`` (e.g.
    ``("tpu",)`` — cross-platform lowering works from a CPU host); defaults
    to the current backend.  ``native_kernels=True`` keeps the Pallas
    attention kernels in the graph (TPU-only, compiler-version-pinned —
    see module docstring).

    ``memory_bank_shot=K`` (round 5) additionally bundles the few-shot
    protocol: per-class memory banks built from K support normals (the
    SAME draw as ``test.py --memory_bank`` — eval/memory_bank.
    collect_support_sets, so the export host needs AACLIP_DATA/METADATA),
    padded to one common bank size, plus a second graph family
    (``graph_mb_b{N}.bin``) that fuses nearest-neighbor bank scores with
    the text-anchor prediction at ``bank_weight``.  ``predict_class`` on
    the loaded artifact then uses the bank graphs; the per-sample-anchor
    ``predict`` path (mixed-class serving batches) stays text-only —
    banks are per-class.
    """
    from aaclip_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import jax
    from jax import export as jexport

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import (create_clip_params,
                                        init_adapter_params,
                                        resolve_clip_checkpoint)
    from aaclip_tpu.data.registry import DOMAINS
    from aaclip_tpu.eval.predict import make_anchor_encoder, make_predict_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix
    from aaclip_tpu.text.anchors import encode_dataset_anchors

    if not datasets:
        raise ValueError("datasets must be non-empty — the artifact's "
                         "anchors/postproc ARE the serving surface")
    policy = DtypePolicy.from_name(precision)
    cfg = get_config(model_name, img_size)
    acfg = AdapterConfig(**(adapter_cfg or {}))
    clip = create_clip_params(cfg, checkpoint=clip_checkpoint, seed=seed,
                              policy=policy)
    adapters = init_adapter_params(jax.random.PRNGKey(seed), cfg, acfg,
                                   policy)
    image_adapter, text_adapter = adapters["image"], None
    untrained = True
    img_path = text_path = None
    if save_path:
        from aaclip_tpu.train import checkpoint as ckpt

        image_adapter, text_adapter, img_path, text_path = \
            ckpt.discover_serving_adapters(save_path, adapters["image"],
                                           adapters["text"])
        if not text_path:
            text_adapter = None
        untrained = img_path is None
    if img_path and not text_path:
        # the live engine warns about this per process; an artifact bakes
        # the frozen-text anchors in FOREVER, so say it loudly at export
        import logging

        logging.getLogger("aaclip.deploy").warning(
            "image adapter found but no text_adapter checkpoint under "
            "save_path=%r — anchors are encoded with the FROZEN text "
            "encoder and frozen into the artifact (only correct for "
            "--text_epoch 0 runs)", save_path)

    attn_fn = None
    if native_kernels:
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn

        attn_fn = maybe_make_attn_fn(cfg, policy)
        if attn_fn is None:
            raise ValueError(
                "native_kernels=True but the Pallas attention kernel is "
                "unavailable on this host backend "
                f"({jax.default_backend()!r}) — the graph would silently "
                "fall back to XLA attention while the manifest claims "
                "otherwise. Export with native kernels from a TPU host, "
                "or drop the flag (the XLA graph is also the portable one)")
    predict = make_predict_fn(clip, cfg, acfg, img_size=img_size,
                              policy=policy, attn_fn=attn_fn,
                              uint8_inputs=True)

    enc = make_anchor_encoder(clip, cfg, acfg, text_adapter, policy=policy)
    anchors = {ds: {k: np.asarray(v)
                    for k, v in encode_dataset_anchors(enc, ds).items()}
               for ds in datasets}
    postproc = {ds: np.asarray(fused_postproc_matrix(cfg.vision.grid,
                                                     img_size, DOMAINS[ds]))
                for ds in datasets}

    os.makedirs(out_dir, exist_ok=True)
    # re-export into an existing artifact dir: drop the old manifest FIRST,
    # so a crash mid-rewrite leaves an unloadable dir, never an old
    # manifest validating a mix of old and new files
    stale = os.path.join(out_dir, _MANIFEST)
    if os.path.exists(stale):
        os.remove(stale)
    visual_leaves: list = []
    visual_skel = _skeletonize(jax.device_get(predict.visual), visual_leaves)
    adapter_leaves: list = []
    adapter_skel = _skeletonize(jax.device_get(image_adapter), adapter_leaves)

    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    platforms = tuple(platforms) if platforms else (jax.default_backend(),)
    # Mosaic kernels reach StableHLO as tpu_custom_call; pre-authorize the
    # target ONLY on the explicit opt-in — on the default (advertised as
    # portable) path the safety check must keep firing if a custom call
    # ever sneaks into the trace
    checks = ([jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
              if native_kernels else [])
    D = anchors[datasets[0]][next(iter(anchors[datasets[0]]))].shape[0]
    M_shapes = {postproc[ds].shape for ds in datasets}
    if len(M_shapes) != 1:
        raise ValueError(f"postproc matrix shapes differ across datasets "
                         f"({M_shapes}) — one graph per batch size assumes "
                         "a single M signature")
    graph_files = {}
    for b in batch_sizes:
        exp = jexport.export(predict.raw, platforms=platforms,
                             disabled_checks=checks)(
            _sds_of(predict.visual), _sds_of(image_adapter),
            jax.ShapeDtypeStruct((b, 3, img_size, img_size), np.uint8),
            jax.ShapeDtypeStruct((b, D, 2), np.float32),
            jax.ShapeDtypeStruct(next(iter(M_shapes)), np.float32))
        name = f"graph_b{b}.bin"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        graph_files[str(b)] = name

    bank_graph_files: dict = {}
    bank_files: dict = {}
    mb_manifest = None
    if memory_bank_shot:
        from aaclip_tpu.eval import memory_bank as mb

        mb_predict = mb.make_mb_predict_fn(
            clip, cfg, acfg, img_size=img_size, policy=policy,
            attn_fn=attn_fn, uint8_inputs=True, bank_weight=bank_weight,
            chunk=bank_chunk)
        raw_banks: dict = {}
        for ds in datasets:
            support = mb.collect_support_sets(ds, memory_bank_shot,
                                              img_size, uint8=True)
            raw_banks[ds] = {
                cls: mb.collect_bank(mb_predict.features_fn, image_adapter,
                                     imgs)
                for cls, imgs in support.items()}
        all_banks = [b for per in raw_banks.values() for b in per.values()]
        if not all_banks:
            raise ValueError(
                "memory_bank_shot set but no support images found — the "
                "export host needs AACLIP_DATA/AACLIP_METADATA for the "
                "bundled datasets")
        n_max = max(b.shape[1] for b in all_banks)
        banks = {ds: {cls: np.asarray(v, np.float32) for cls, v in
                      mb.pad_banks_to_common_size(per, n_max).items()}
                 for ds, per in raw_banks.items()}
        bank_shape = (len(acfg.levels), n_max, int(D))
        for b in batch_sizes:
            # trace against the SAME cast visual tree the plain graphs
            # (and params.npz) use — the mb impl casts at use, so feeding
            # pre-cast leaves is numerically identical
            exp = jexport.export(mb_predict.raw, platforms=platforms,
                                 disabled_checks=checks)(
                _sds_of(predict.visual), _sds_of(image_adapter),
                jax.ShapeDtypeStruct((b, 3, img_size, img_size), np.uint8),
                jax.ShapeDtypeStruct((b, D, 2), np.float32),
                jax.ShapeDtypeStruct(next(iter(M_shapes)), np.float32),
                jax.ShapeDtypeStruct(bank_shape, np.float32))
            name = f"graph_mb_b{b}.bin"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            bank_graph_files[str(b)] = name
        for ds in datasets:
            bank_files[ds] = f"banks_{ds}.npz"
            np.savez(os.path.join(out_dir, bank_files[ds]), **banks[ds])
        mb_manifest = {"shot": int(memory_bank_shot),
                       "bank_weight": float(bank_weight),
                       "bank_shape": list(bank_shape),
                       "graphs": bank_graph_files,
                       "bank_files": bank_files}

    np.savez(os.path.join(out_dir, "params.npz"),
             **{f"v{i}": _leaf_bytes(a) for i, a in enumerate(visual_leaves)},
             **{f"a{i}": _leaf_bytes(a) for i, a in enumerate(adapter_leaves)})
    for ds in datasets:
        np.savez(os.path.join(out_dir, f"anchors_{ds}.npz"), **anchors[ds])
        np.save(os.path.join(out_dir, f"postproc_{ds}.npy"), postproc[ds])

    # content digests over every payload file: a truncated rsync/scp or a
    # bit-flipped blob store must fail AT LOAD, not as silently wrong maps
    payload = sorted(graph_files.values()) + ["params.npz"] + \
        sorted(bank_graph_files.values()) + sorted(bank_files.values()) + \
        [f"anchors_{ds}.npz" for ds in datasets] + \
        [f"postproc_{ds}.npy" for ds in datasets]
    digests = {name: sha256_file(os.path.join(out_dir, name))
               for name in payload}

    effective_ckpt = resolve_clip_checkpoint(cfg, clip_checkpoint)
    manifest = {
        "sha256": digests,
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "model_name": model_name, "img_size": img_size,
        "precision": precision, "adapter_cfg": adapter_cfg or {},
        "embed_dim": int(D), "grid": int(cfg.vision.grid),
        "platforms": list(platforms), "native_kernels": native_kernels,
        "batch_sizes": batch_sizes, "datasets": list(datasets),
        "graphs": graph_files, "untrained": untrained,
        # provenance: which weights produced this artifact (paths, not
        # digests — enough to tell two artifacts apart in an incident)
        "clip_checkpoint": (os.path.abspath(effective_ckpt)
                            if effective_ckpt else f"seed{seed}"),
        "image_adapter_ckpt": os.path.abspath(img_path) if img_path else None,
        "text_adapter_ckpt": (os.path.abspath(text_path)
                              if text_path else None),
        "visual_skeleton": visual_skel, "adapter_skeleton": adapter_skel,
        "memory_bank": mb_manifest,
    }
    # the manifest is the commit marker: written last, atomically, so a
    # crashed export never looks loadable
    tmp = os.path.join(out_dir, f".{_MANIFEST}.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


# ---------------------------------------------------------------------------
# load + run


class ServingArtifact:
    """A loaded artifact: frozen graphs + constants, ready to call.

    ``predict`` pads each request chunk up to the nearest exported batch
    bucket by edge-replicating the last sample (per-sample independence
    makes padding invisible; replication rather than zeros so no lane ever
    feeds l2-normalization a zero vector) and trims the outputs.
    """

    def __init__(self, path: str, check_integrity: bool = True):
        import jax
        from jax import export as jexport

        with open(os.path.join(path, _MANIFEST)) as f:
            m = json.load(f)
        if m["artifact_version"] != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {m['artifact_version']} at {path!r} "
                f"not supported (this library reads {ARTIFACT_VERSION})")
        if check_integrity:
            # fail a truncated copy or bit-flipped blob HERE, not as
            # silently wrong maps (absent on pre-digest artifacts: skip)
            for name, want in m.get("sha256", {}).items():
                fpath = os.path.join(path, name)
                if not os.path.exists(fpath):
                    raise ValueError(
                        f"artifact file {name!r} listed in the manifest "
                        f"is missing at {path!r} — truncated copy; "
                        "re-copy or re-export")
                if sha256_file(fpath) != want:
                    raise ValueError(
                        f"artifact file {name!r} at {path!r} fails its "
                        "manifest sha256 — corrupted or truncated "
                        "transfer; re-copy or re-export")
        backend = jax.default_backend()
        if backend not in m["platforms"]:
            raise ValueError(
                f"artifact at {path!r} was exported for platforms "
                f"{m['platforms']}, but the current backend is {backend!r} "
                "— re-export with platforms=('" + backend + "',)")
        self.manifest = m
        self.path = path
        self.img_size = m["img_size"]
        self.embed_dim = m["embed_dim"]
        self.untrained = m["untrained"]
        self.batch_sizes = list(m["batch_sizes"])

        with np.load(os.path.join(path, "params.npz")) as z:
            vis_leaves = _collect_leaves(m["visual_skeleton"])
            ad_leaves = _collect_leaves(m["adapter_skeleton"])
            v = [_leaf_from_bytes(z[f"v{i}"], s, d)
                 for i, (s, d) in enumerate(vis_leaves)]
            a = [_leaf_from_bytes(z[f"a{i}"], s, d)
                 for i, (s, d) in enumerate(ad_leaves)]
        # one device_put up front; every predict reuses the on-device copies
        self.visual = jax.device_put(_rebuild(m["visual_skeleton"], v))
        self.image_adapter = jax.device_put(_rebuild(m["adapter_skeleton"],
                                                     a))
        self.anchors: Dict[str, Dict[str, np.ndarray]] = {}
        self.postproc: Dict[str, np.ndarray] = {}
        for ds in m["datasets"]:
            with np.load(os.path.join(path, f"anchors_{ds}.npz")) as z:
                self.anchors[ds] = {k: np.asarray(z[k]) for k in z.files}
            self.postproc[ds] = np.load(
                os.path.join(path, f"postproc_{ds}.npy"))

        self._fns = {}
        for b, name in m["graphs"].items():
            with open(os.path.join(path, name), "rb") as f:
                exp = jexport.deserialize(f.read())
            # Exported.call re-dispatches through the export primitive each
            # call; one jit wrapper gives cached-dispatch steady state
            self._fns[int(b)] = jax.jit(exp.call)

        # bundled few-shot memory banks (round 5): per-class padded banks
        # + the fused bank-graph family; predict_class uses them, the
        # per-sample-anchor predict path stays text-only (banks are
        # per-class)
        mbm = m.get("memory_bank")
        self.banks: Dict[str, Dict[str, np.ndarray]] = {}
        self._bank_fns = {}
        self.shot = self.bank_weight = None
        if mbm:
            self.shot = mbm["shot"]
            self.bank_weight = mbm["bank_weight"]
            for ds, fname in mbm["bank_files"].items():
                with np.load(os.path.join(path, fname)) as z:
                    self.banks[ds] = {k: np.asarray(z[k]) for k in z.files}
            for b, name in mbm["graphs"].items():
                with open(os.path.join(path, name), "rb") as f:
                    exp = jexport.deserialize(f.read())
                self._bank_fns[int(b)] = jax.jit(exp.call)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def predict(self, images_u8: np.ndarray, anchors: np.ndarray,
                dataset: str, *,
                bank: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        """images [n,3,S,S] uint8, anchors per-sample [n,D,2] ->
        (maps [n,S,S], scores [n]) as numpy.  ``bank`` (a bundled
        per-class bank, [n_levels, N, D]) routes through the fused
        bank-graph family instead of the text-only graphs."""
        n = int(images_u8.shape[0])
        if n == 0:
            raise ValueError("empty batch")
        if dataset not in self.postproc:
            raise KeyError(
                f"dataset {dataset!r} not in artifact ({list(self.postproc)})")
        M = self.postproc[dataset]
        maps, scores = [], []
        cap = self.batch_sizes[-1]
        for lo in range(0, n, cap):
            chunk = images_u8[lo:lo + cap]
            anc = np.asarray(anchors[lo:lo + cap], np.float32)
            b = self._bucket(chunk.shape[0])
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
                anc = np.concatenate([anc, np.repeat(anc[-1:], pad, axis=0)])
            if bank is None:
                pix, sc = self._fns[b](self.visual, self.image_adapter,
                                       chunk, anc, M)
            else:
                pix, sc = self._bank_fns[b](self.visual, self.image_adapter,
                                            chunk, anc, M, bank)
            valid = b - pad
            maps.append(np.asarray(pix)[:valid])
            scores.append(np.asarray(sc)[:valid])
        return np.concatenate(maps), np.concatenate(scores)

    def predict_class(self, images_u8: np.ndarray, dataset: str,
                      class_name: str,
                      use_bank: Optional[bool] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-class prediction.  ``use_bank``: None (default) uses the
        bundled memory bank when the artifact carries one for this class
        (that is what it was exported for); False forces text-only;
        True demands a bank and raises when absent."""
        cls = self.anchors[dataset]
        if class_name not in cls:
            raise KeyError(f"class {class_name!r} not in artifact "
                           f"dataset {dataset!r} ({sorted(cls)})")
        bank = self.banks.get(dataset, {}).get(class_name)
        if use_bank is False:
            bank = None
        elif use_bank is True and bank is None:
            raise KeyError(
                f"use_bank=True but the artifact has no bank for "
                f"{dataset!r}/{class_name!r} — re-export with "
                "memory_bank_shot")
        anc = np.broadcast_to(
            cls[class_name], (images_u8.shape[0],) + cls[class_name].shape)
        return self.predict(images_u8, anc, dataset, bank=bank)


def _collect_leaves(skel, out=None):
    """(shape, dtype) per leaf in index order, from a manifest skeleton."""
    if out is None:
        out = []
    if skel["t"] == "leaf":
        assert skel["i"] == len(out), "leaf indices must be depth-first"
        out.append((tuple(skel["shape"]), skel["dtype"]))
    elif skel["t"] == "dict":
        for k in skel["items"]:
            _collect_leaves(skel["items"][k], out)
    else:
        for v in skel["items"]:
            _collect_leaves(v, out)
    return out


def load_serving_artifact(path: str,
                          check_integrity: bool = True) -> ServingArtifact:
    return ServingArtifact(path, check_integrity=check_integrity)
