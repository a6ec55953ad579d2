"""bench.py smoke: the driver's benchmark entry runs and emits the JSON
contract on CPU with the tiny model, in all three modes."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMMON = ["--model_name", "tiny-test", "--img_size", "70",
          "--batch_size", "4", "--steps", "2", "--warmup", "1",
          "--precision", "fp32"]


def _run(args):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = ['bench.py'] + {args!r}\n"
        "import bench; bench.main()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-1500:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("mode,metric", [
    ("infer", "anomaly_maps_per_sec_per_chip"),
    ("train", "stage2_train_images_per_sec_per_chip"),
    ("train_stage1", "stage1_train_images_per_sec_per_chip"),
])
def test_bench_modes_emit_contract(mode, metric):
    payload = _run(COMMON + ["--mode", mode])
    assert payload["metric"] == metric
    assert payload["value"] > 0
    assert "vs_baseline" in payload and "unit" in payload
