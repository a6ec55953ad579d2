"""bench.py smoke: the driver's benchmark entry runs and emits the JSON
contract on CPU with the tiny model, in all four modes."""

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
    ("serve", "serve_maps_per_sec_per_chip"),
])
def test_bench_modes_emit_contract(mode, metric):
    payload = _run(COMMON + ["--mode", mode])
    assert payload["metric"] == metric
    assert payload["value"] > 0
    assert "vs_baseline" in payload and "unit" in payload


def test_bench_default_precision_resolution():
    """The driver runs bare `python bench.py`: with no --precision every
    mode resolves to bf16.  int8 was the round-3 infer headline but failed
    the round-4 scaled image-metric fidelity gate (PERFORMANCE.md
    "Task-level fidelity"), so it is opt-in only."""
    base = [a for a in COMMON if a not in ("--precision", "fp32")]
    payload = _run(base)
    assert "bf16" in payload["unit"] and "int8" not in payload["unit"]
    payload = _run(base + ["--mode", "train"])
    assert "bf16" in payload["unit"]


def test_bench_infer_int8_precision():
    """--precision int8 quantizes the trunk and records int8 in the unit
    string (quality gate lives in test_quant.py)."""
    payload = _run(COMMON + ["--precision", "int8"])
    assert payload["metric"] == "anomaly_maps_per_sec_per_chip"
    assert "int8" in payload["unit"]
    assert payload["value"] > 0


def test_bench_warmup_zero_and_mode_mismatched_flags():
    """--warmup 0 must measure cold-start instead of NameError'ing, and
    mode-mismatched perf levers are rejected rather than silently ignored
    (round-3 review findings)."""
    base = [a for a in COMMON if a not in ("--warmup", "1")]
    payload = _run(base + ["--warmup", "0"])
    assert payload["value"] > 0
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = ['bench.py'] + {COMMON!r} + "
        "['--mode', 'infer', '--grad_accum', '4']\n"
        "import bench; bench.main()\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=120)
    assert r.returncode != 0 and "train only" in r.stderr


def test_bench_train_rejects_int8():
    """int8 is inference-only: an int8-labeled train bench would silently
    measure the bf16 path, so bench.py must refuse (round-3 review
    finding)."""
    args = [a for a in COMMON if a not in ("--precision", "fp32")] + [
        "--mode", "train", "--precision", "int8"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = ['bench.py'] + {args!r}\n"
        "import bench; bench.main()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=120)
    assert r.returncode != 0
    assert "inference-only" in r.stderr


def test_bench_train_grad_accum_flag():
    """--grad_accum K runs the microbatched stage-2 step and records K in
    the unit string."""
    payload = _run(COMMON + ["--mode", "train", "--grad_accum", "2"])
    assert payload["metric"] == "stage2_train_images_per_sec_per_chip"
    assert "grad_accum=2" in payload["unit"]
    assert payload["value"] > 0


def test_bench_stage1_vv_mode_flag():
    """--vv_mode spatial selects the per-sample V-V form for the stage-1
    bench; the unit string records which semantics were measured."""
    payload = _run(COMMON + ["--mode", "train_stage1",
                             "--vv_mode", "spatial"])
    assert payload["metric"] == "stage1_train_images_per_sec_per_chip"
    assert "vv=spatial" in payload["unit"]


def test_bench_serve_open_loop():
    """--open_loop RPS: fixed-rate arrivals for --steps seconds; the JSON
    contract holds and the unit string carries the ok/rejected accounting."""
    payload = _run(COMMON + ["--mode", "serve", "--open_loop", "10",
                             "--steps", "2", "--clients", "4"])
    assert payload["metric"] == "serve_maps_per_sec_per_chip"
    assert payload["value"] > 0
    assert "open-loop 10 rps" in payload["unit"]
    assert "rejected" in payload["unit"]


def test_bench_serve_data_parallel():
    """--data_parallel serve: micro-batches shard over the 8-device CPU
    mesh (max_batch divisible by the mesh) and report per-chip rate."""
    args = [a for a in COMMON]  # batch_size must divide by 8 devices
    args[args.index("--batch_size") + 1] = "8"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = ['bench.py'] + "
        f"{args + ['--mode', 'serve', '--data_parallel', '--steps', '2']!r}\n"
        "import bench; bench.main()\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-1500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "serve_maps_per_sec_per_chip"
    assert payload["value"] > 0
    assert "dp=8 chips" in payload["unit"]


def test_bench_open_loop_rejected_outside_serve():
    code = (
        "import sys; sys.argv = ['bench.py', '--mode', 'infer', "
        "'--open_loop', '5']\n"
        "import bench; bench.main()\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"), timeout=120)
    assert r.returncode != 0
    assert "--open_loop applies to --mode serve only" in r.stderr


def test_profile_report_tool(tmp_path):
    """tools/profile_report.py parses a trace archive and buckets ops."""
    import gzip
    import json
    import subprocess
    import sys

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "X", "name": "while.3", "dur": 5000, "ts": 0},
        {"ph": "X", "name": "fusion.12", "dur": 2000, "ts": 0},
        {"ph": "X", "name": "closed_call.1", "dur": 1000, "ts": 0},
        {"ph": "X", "name": "pad.9", "dur": 250, "ts": 0},
        {"ph": "X", "name": "$api.py block_until_ready", "dur": 9e9, "ts": 0},
        {"ph": "M", "name": "metadata"},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/profile_report.py", str(tmp_path), "--top", "3"],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    assert "scan/while" in r.stdout and "Pallas" in r.stdout
    assert "while.3" in r.stdout
    assert "block_until_ready" not in r.stdout  # python spans excluded


def test_predict_folder_tool(tmp_path):
    """tools/predict_folder.py: folder of images -> scores.csv + heatmaps."""
    import subprocess
    import sys

    import numpy as np
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(d / f"im{i}.png")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/predict_folder.py", str(d),
         "--class_name", "bottle", "--model_name", "tiny-test",
         "--img_size", "70", "--levels", "1", "2", "--precision", "fp32",
         "--batch_size", "2", "--heatmaps"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "running zero-shot with random" in r.stderr  # loud warning
    out = d / "aaclip_out"
    lines = (out / "scores.csv").read_text().strip().split("\n")
    assert lines[0] == "file,image_score" and len(lines) == 4
    assert sorted(p.name for p in out.glob("*_heatmap.png")) == [
        "im0_heatmap.png", "im1_heatmap.png", "im2_heatmap.png"]


def test_bench_serve_artifact(tmp_path):
    """--artifact: bench serve drives a frozen deploy.py artifact; the unit
    string records the manifest's model/precision with the +artifact tag.
    Exported VisA-only: bench must take dataset/classes from the artifact,
    not assume the live path's MVTec anchors."""
    from aaclip_tpu.deploy import export_serving_artifact

    out = str(tmp_path / "art")
    export_serving_artifact(
        out, model_name="tiny-test", img_size=70, precision="fp32",
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1),
        datasets=("VisA",), batch_sizes=(1, 2, 4))
    payload = _run(COMMON + ["--mode", "serve", "--artifact", out])
    assert payload["metric"] == "serve_maps_per_sec_per_chip"
    assert payload["value"] > 0
    assert "fp32+artifact" in payload["unit"]
    # replica-per-device data parallelism over the same frozen artifact
    payload = _run(COMMON + ["--mode", "serve", "--artifact", out,
                             "--data_parallel"])
    assert payload["value"] > 0
    assert "dp=8 chips" in payload["unit"]


def test_bench_artifact_rejected_outside_serve():
    code = (
        "import sys; sys.argv = ['bench.py', '--mode', 'infer', "
        "'--artifact', '/tmp/nope']\n"
        "import bench; bench.main()\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"), timeout=120)
    assert r.returncode != 0
    assert "--artifact applies to --mode serve only" in r.stderr


def test_predict_folder_artifact(tmp_path):
    """tools/predict_folder.py --artifact: frozen-graph inference over a
    folder, scores identical to the same artifact's library path."""
    import numpy as np
    from PIL import Image

    from aaclip_tpu.deploy import export_serving_artifact

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)
                        ).save(d / f"im{i}.png")
    art = str(tmp_path / "art")
    export_serving_artifact(
        art, model_name="tiny-test", img_size=70, precision="fp32",
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1),
        datasets=("MVTec",), batch_sizes=(2,))
    r = subprocess.run(
        [sys.executable, "tools/predict_folder.py", str(d),
         "--class_name", "bottle", "--artifact", art, "--batch_size", "2"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RANDOM-INIT" in r.stderr
    lines = (d / "aaclip_out" / "scores.csv").read_text().strip().split("\n")
    assert lines[0] == "file,image_score" and len(lines) == 4

    from aaclip_tpu.data.transforms import load_rgb_chw
    from aaclip_tpu.deploy import load_serving_artifact

    loaded = load_serving_artifact(art)
    imgs = np.stack([load_rgb_chw(str(d / f"im{i}.png"), 70, uint8=True)
                     for i in range(2)])
    _, want = loaded.predict_class(imgs, "MVTec", "bottle")
    got = [float(l.split(",")[1]) for l in lines[1:3]]
    np.testing.assert_allclose(got, want, atol=1e-6)
