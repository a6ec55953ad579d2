"""Data-parallel execution over a device mesh.

The reference is strictly single-device (SURVEY §2: no torch.distributed
anywhere); this framework gets first-class data parallelism instead:
batches are sharded over a 1-D ``('data',)`` mesh, parameters are
replicated, and jit partitions the training/eval step — gradient psums ride
the ICI collectives XLA inserts.  Multi-host runs initialize
``jax.distributed`` and shard the input pipeline per host.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if not 1 <= num_devices <= len(devices):
        # silent truncation would desync shard-count math computed from
        # the REQUESTED size against the actual mesh
        raise ValueError(
            f"num_devices={num_devices} outside 1..{len(devices)} "
            f"available devices")
    return Mesh(np.asarray(devices[:num_devices]), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place batch-leading arrays sharded over the data axis.

    Returns a tuple for 2+ arrays, the bare array for exactly one (the
    dominant call shape); at least one array is required."""
    if not arrays:
        raise ValueError("shard_batch needs at least one array")
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def pad_batch_to_devices(arrays: Iterable[np.ndarray], valid: np.ndarray,
                         n_devices: int):
    """Pad leading dims to a multiple of the mesh size, extending the
    validity mask with zeros so losses/metrics ignore padding."""
    arrays = list(arrays)
    b = arrays[0].shape[0]
    for a in arrays[1:]:
        if a.shape[0] != b:
            raise ValueError(
                f"pad_batch_to_devices: leading dims differ "
                f"({a.shape[0]} vs {b}) — padding from arrays[0] would "
                f"produce inconsistent batches")
    if len(valid) != b:
        raise ValueError(
            f"pad_batch_to_devices: valid mask length {len(valid)} != "
            f"batch {b}")
    target = ((b + n_devices - 1) // n_devices) * n_devices
    if target == b:
        return arrays, valid
    pad = target - b
    out = []
    for a in arrays:
        reps = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        out.append(reps)
    valid = np.concatenate([valid, np.zeros((pad,), valid.dtype)])
    return out, valid


def initialize_multihost() -> None:
    """Initialize the JAX distributed runtime when launched across hosts.

    Contract: set ``JAX_COORDINATOR_ADDRESS`` (host:port of process 0) on
    every process, plus ``JAX_NUM_PROCESSES`` and ``JAX_PROCESS_ID`` when
    not under a cluster manager jax auto-detects (SLURM etc.).  No-op in
    single-process runs.  Rehearsed on two CPU processes by
    ``tests/test_multihost.py`` (no multi-host TPU hardware needed).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    n_proc = os.environ.get("JAX_NUM_PROCESSES")
    proc_id = os.environ.get("JAX_PROCESS_ID")
    if bool(n_proc) != bool(proc_id):
        # one without the other either KeyErrors or silently falls back
        # to auto-detection that hangs on the coordinator
        raise RuntimeError(
            "set BOTH JAX_NUM_PROCESSES and JAX_PROCESS_ID (or neither, "
            "under a cluster manager jax auto-detects)")
    if n_proc:
        kwargs["num_processes"] = int(n_proc)
        kwargs["process_id"] = int(proc_id)
    jax.distributed.initialize(**kwargs)


def global_data_mesh() -> Mesh:
    """Alias of ``make_data_mesh()`` kept for multi-host-intent call sites:
    after jax.distributed.initialize, jax.devices() is the GLOBAL device
    list, so the default data mesh already spans every host."""
    return make_data_mesh()
