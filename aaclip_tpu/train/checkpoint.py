"""Checkpointing: pytree save/restore plus converters for the reference's
torch ``.pth`` adapter checkpoints.

Native format: a single ``.npz`` with '/'-joined pytree paths — fast,
dependency-free, and deterministic.  Files mirror the reference layout
(``text_adapter``/``image_adapter`` + optimizer state + epoch counter,
reference train.py:105-113,161-173) so resume semantics match.

Converters accept the reference's torch state dicts
(SimpleAdapter -> ``{i}.fc.0.weight``; SimpleProj -> ``fc.weight`` or
``fc.0.weight`` depending on the --relu flag) in both directions, making
checkpoints interchangeable with the PyTorch implementation.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Flat-npz pytree io


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[prefix + key] = np.asarray(leaf)
    return out


def _restore_subtree_from(data, root: str, template):
    prefix = root + "/" if root else ""
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = prefix + "/".join(
            str(getattr(x, "key", getattr(x, "idx", x))) for x in p)
        if key not in data:
            raise KeyError(
                f"checkpoint is missing '{key}' — was it saved with "
                f"different adapter flags (levels/adapt_until)?")
        arr = data[key]
        leaf_np = np.asarray(leaf)
        # exact-shape check: a size-only check would let e.g. a transposed
        # leaf silently reshape into scrambled weights
        if arr.shape != leaf_np.shape:
            raise ValueError(
                f"checkpoint entry '{key}' has shape {arr.shape} but the "
                f"current config expects {leaf_np.shape} — adapter flags "
                f"(levels/adapt_until/model) do not match the checkpoint")
        leaves.append(jnp.asarray(arr, dtype=leaf_np.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)


def save_adapter_checkpoint(path: str, epoch: int, adapter: dict,
                            opt_state=None, step: int = 0) -> None:
    payload = {"adapter": adapter}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    flat = _flatten(payload)
    flat["__epoch__"] = np.asarray(epoch, np.int64)
    flat["__step__"] = np.asarray(step, np.int64)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # atomic + durable write: a crash mid-savez must not corrupt an
    # existing checkpoint (resume reads these; the reference's torch.save
    # has the same exposure).  fsync the tmp data before the rename and
    # the directory after it, or a power loss can commit the rename ahead
    # of the data blocks.  The tmp name keeps the .npz suffix so numpy
    # does not append one.
    tmp = f"{path}.tmp-{os.getpid()}.npz"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        dir_fd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_adapter_checkpoint(path: str, adapter_template,
                            opt_state_template=None) -> Tuple[int, dict, Any, int]:
    """Returns (epoch, adapter, opt_state_or_None, step)."""
    with np.load(path, allow_pickle=False) as data:
        epoch = int(data["__epoch__"])
        step = int(data["__step__"]) if "__step__" in data else 0
        adapter = _restore_subtree(data, "adapter", adapter_template)
        opt_state = None
        if opt_state_template is not None and any(
                k.startswith("opt_state/") for k in data.files):
            opt_state = _restore_subtree(data, "opt_state",
                                         opt_state_template)
    return epoch, adapter, opt_state, step


def _restore_subtree(data, root: str, template):
    return _restore_subtree_from(data, root, template)


# ---------------------------------------------------------------------------
# Orbax backend (opt-in: async saves, multi-host-safe directory format)

_ORBAX_SUFFIX = ".orbax"
_async_checkpointer = None


def _orbax():
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _async_checkpointer


def orbax_path(path: str) -> str:
    """npz checkpoint path -> the orbax directory for the same snapshot."""
    base = path[:-4] if path.endswith(".npz") else path
    return os.path.abspath(base + _ORBAX_SUFFIX)


def save_adapter_checkpoint_orbax(path: str, epoch: int, adapter: dict,
                                  opt_state=None, step: int = 0) -> None:
    """Async save (returns immediately; the write completes in the
    background — call wait_for_async_saves() before process exit)."""
    import orbax.checkpoint as ocp

    payload = {"adapter": adapter, "epoch": int(epoch), "step": int(step)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    _orbax().save(orbax_path(path), args=ocp.args.StandardSave(payload),
                  force=True)


def load_adapter_checkpoint_orbax(path: str, adapter_template,
                                  opt_state_template=None) -> Tuple[int, dict, Any, int]:
    """Returns (epoch, adapter, opt_state_or_None, step) — same contract as
    the npz loader.  ``path`` may be the .orbax directory or the sibling
    .npz name."""
    import orbax.checkpoint as ocp

    d = path if path.endswith(_ORBAX_SUFFIX) else orbax_path(path)
    ck = _orbax()
    ck.wait_until_finished()  # a just-issued async save of this path
    if opt_state_template is not None:
        template = {"adapter": adapter_template, "epoch": 0, "step": 0,
                    "opt_state": opt_state_template}
        try:
            out = ck.restore(d, args=ocp.args.StandardRestore(template))
            opt_state = out["opt_state"]
            adapter = out["adapter"]
        except Exception:
            # snapshot saved WITHOUT optimizer state (eval-style export):
            # degrade to opt_state=None like the npz loader instead of a
            # tree-structure crash.  A genuine adapter mismatch fails this
            # restore too and surfaces below.
            out = ck.restore(d, args=ocp.args.StandardRestore(
                {"adapter": adapter_template, "epoch": 0, "step": 0}))
            opt_state = None
            adapter = out["adapter"]
    else:
        # eval-style load: the on-disk tree may carry optimizer state we
        # have no template for; restore raw and re-type the adapter leaves
        out = ck.restore(d)
        opt_state = None
        adapter = jax.tree.map(
            lambda t, x: jnp.asarray(x, np.asarray(t).dtype),
            adapter_template, out["adapter"])
    return int(out["epoch"]), adapter, opt_state, int(out["step"])


def wait_for_async_saves() -> None:
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def save_adapter_checkpoint_any(path: str, epoch: int, adapter: dict,
                                opt_state=None, step: int = 0,
                                backend: str = "npz") -> None:
    if backend == "orbax":
        save_adapter_checkpoint_orbax(path, epoch, adapter, opt_state, step)
    else:
        save_adapter_checkpoint(path, epoch, adapter, opt_state, step)


def find_adapter_checkpoint(path: str):
    """Resolve an adapter snapshot saved by EITHER backend: returns the
    concrete path (npz file or orbax dir) or None.  When both exist (the
    run switched --ckpt_backend), the NEWER one wins so resume never
    restarts from a stale snapshot of the other format."""
    d = orbax_path(path)
    has_npz, has_orbax = os.path.isfile(path), os.path.isdir(d)
    if has_npz and has_orbax:
        return path if os.path.getmtime(path) >= os.path.getmtime(d) else d
    if has_npz:
        return path
    if has_orbax:
        return d
    return None


def load_adapter_checkpoint_any(path: str, adapter_template,
                                opt_state_template=None):
    if path.endswith(_ORBAX_SUFFIX):
        return load_adapter_checkpoint_orbax(path, adapter_template,
                                             opt_state_template)
    return load_adapter_checkpoint(path, adapter_template, opt_state_template)


def discover_serving_adapters(save_path: str, image_template, text_template):
    """Resolve the adapter checkpoints a serving process should load from a
    training output directory (the reference loads the single epoch named on
    the CLI, reference test.py:29-37; a deployment dir is resolved instead).

    Returns ``(image_adapter, text_adapter, image_path, text_path)`` where
    the adapters are the loaded pytrees or the given templates when nothing
    was found (``image_path``/``text_path`` None in that case — callers use
    that to flag untrained serving).  Selection rules, shared by the HTTP
    engine and the artifact exporter:

    * text: the rolling ``text_adapter.npz``/orbax dir.
    * image: the highest-EPOCH ``image_adapter_{e}`` snapshot — parsed, not
      lexicographic (10 sorts before 2), skipping crash-leftover tmp files —
      falling back to the rolling ``image_adapter.npz``/orbax, the canonical
      resume file (a deployment dir often carries only the final copy).
    """
    import glob
    import re

    text_adapter, text_path = text_template, None
    found = find_adapter_checkpoint(os.path.join(save_path,
                                                 "text_adapter.npz"))
    if found:
        _, text_adapter, _, _ = load_adapter_checkpoint_any(found,
                                                            text_template)
        text_path = found

    def _snap_epoch(path):
        m = re.search(r"image_adapter_(\d+)\.(npz|orbax)$", path)
        return int(m.group(1)) if m else -1

    snaps = sorted(
        (p for p in
         glob.glob(os.path.join(save_path, "image_adapter_*.npz"))
         + glob.glob(os.path.join(save_path, "image_adapter_*.orbax"))
         if _snap_epoch(p) >= 0),
        key=_snap_epoch)
    image_adapter, image_path = image_template, None
    if snaps:
        _, image_adapter, _, _ = load_adapter_checkpoint_any(snaps[-1],
                                                             image_template)
        image_path = snaps[-1]
    else:
        rolling = find_adapter_checkpoint(os.path.join(save_path,
                                                       "image_adapter.npz"))
        if rolling:
            _, image_adapter, _, _ = load_adapter_checkpoint_any(
                rolling, image_template)
            image_path = rolling
    return image_adapter, text_adapter, image_path, text_path


# ---------------------------------------------------------------------------
# Reference .pth interop (host-side, uses torch)


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(x.detach().cpu().float().numpy())


def _proj_key(sd: dict, prefix: str) -> str:
    """SimpleProj weight key: 'fc.weight' (relu=False) or 'fc.0.weight'."""
    for suffix in ("fc.weight", "fc.0.weight"):
        if f"{prefix}.{suffix}" in sd:
            return f"{prefix}.{suffix}"
    raise KeyError(f"no projection weight under {prefix}")


def text_adapter_from_torch(sd: dict, n_adapt: int = 3) -> dict:
    """Reference ``text_adapter`` state dict (ModuleList: n SimpleAdapters +
    final SimpleProj, model/adapter.py:41-44) -> pytree."""
    return {
        "layer_adapters": {"w": np.stack([
            _np(sd[f"{i}.fc.0.weight"]).T for i in range(n_adapt)])},
        "proj": {"w": _np(sd[_proj_key(sd, str(n_adapt))]).T},
    }


def image_adapter_from_torch(sd: dict, n_adapt: int = 6, n_levels: int = 4) -> dict:
    """Reference ``image_adapter`` ModuleDict state dict -> pytree."""
    return {
        "layer_adapters": {"w": np.stack([
            _np(sd[f"layer_adapters.{i}.fc.0.weight"]).T
            for i in range(n_adapt)])},
        "seg_proj": [
            {"w": _np(sd[_proj_key(sd, f"seg_proj.{i}")]).T}
            for i in range(n_levels)
        ],
        "det_proj": {"w": _np(sd[_proj_key(sd, "det_proj")]).T},
    }


def load_reference_checkpoint(path: str, kind: str, *, n_adapt: int,
                              n_levels: int = 4) -> Tuple[int, dict]:
    """Load a reference .pth ({epoch, text_adapter|image_adapter, ...});
    returns (epoch, adapter_pytree)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    epoch = int(obj.get("epoch", 0))
    if kind == "text":
        return epoch, text_adapter_from_torch(obj["text_adapter"], n_adapt)
    if kind == "image":
        return epoch, image_adapter_from_torch(obj["image_adapter"], n_adapt, n_levels)
    raise ValueError(f"kind must be 'text' or 'image', got {kind}")


def adapters_to_torch_state_dicts(adapters: dict, proj_relu: bool) -> Tuple[dict, dict]:
    """Export (text_sd, image_sd) loadable by the reference implementation."""
    import torch

    def t(w):
        return torch.from_numpy(np.asarray(w).T.copy())

    text = adapters["text"]
    tw = np.asarray(text["layer_adapters"]["w"])
    n = tw.shape[0]
    text_sd = {f"{i}.fc.0.weight": t(tw[i]) for i in range(n)}
    text_sd[f"{n}.fc.0.weight"] = t(text["proj"]["w"])  # final proj always relu=True

    image = adapters["image"]
    proj_suffix = "fc.0.weight" if proj_relu else "fc.weight"
    image_sd = {}
    iw = np.asarray(image["layer_adapters"]["w"])
    for i in range(iw.shape[0]):
        image_sd[f"layer_adapters.{i}.fc.0.weight"] = t(iw[i])
    for i, p in enumerate(image["seg_proj"]):
        image_sd[f"seg_proj.{i}.{proj_suffix}"] = t(p["w"])
    image_sd[f"det_proj.{proj_suffix}"] = t(image["det_proj"]["w"])
    return text_sd, image_sd
