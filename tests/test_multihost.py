"""Two-process multi-host rehearsal on CPU.

The reference has no distributed execution at all (SURVEY §2); this
framework's multi-host path (jax.distributed over DCN + per-host input
sharding) has real TPU pods as its target, which this environment lacks.
jax.distributed supports multi-PROCESS CPU, so the wiring is rehearsed
here: two subprocesses, each with 2 virtual CPU devices, initialize
through ``sharding.initialize_multihost`` (the exact code path train.py
runs), build the global 4-device mesh, assemble a global array from
per-process shards, and run a cross-host reduction and a cross-host
data-parallel gradient psum.
"""

import os
import socket
import subprocess
import sys


_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax.sharding import NamedSharding, PartitionSpec as P

from aaclip_tpu.parallel import sharding as sh

sh.initialize_multihost()
rank = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert len(jax.devices()) == 4

import jax.numpy as jnp
mesh = sh.global_data_mesh()
spec = NamedSharding(mesh, P("data"))

# per-process local shard: rank 0 holds [1, 2], rank 1 holds [3, 4]
local = np.asarray([1.0, 2.0] if rank == 0 else [3.0, 4.0], np.float32)
arr = jax.make_array_from_process_local_data(spec, local, global_shape=(4,))

total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 10.0, float(total)

# cross-host data-parallel gradient: grad of sum(w * x) w.r.t. w with x
# sharded over both hosts must equal sum(x) on every host
def loss(w, x):
    return jnp.sum(w * x)

g = jax.jit(jax.grad(loss), in_shardings=(NamedSharding(mesh, P()), spec),
            out_shardings=NamedSharding(mesh, P()))(jnp.float32(2.0), arr)
assert float(g) == 10.0, float(g)
print(f"rank {rank}: multihost rehearsal OK")
"""


def test_two_process_cpu_multihost(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("_AACLIP_DRYRUN_INNER", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = [p.communicate(timeout=240) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-2000:]}"
        assert "multihost rehearsal OK" in out
