"""End-to-end CLI smoke: train both stages on synthetic data with the tiny
model, then evaluate — exercising checkpoint save/resume, anchor building,
prediction, metrics, and the log format."""

import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    data_root, meta_root = make_synthetic_dataset(root, img_px=64)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    yield root
    os.environ.pop("AACLIP_DATA", None)
    os.environ.pop("AACLIP_METADATA", None)


COMMON = [
    "--model_name", "tiny-test", "--img_size", "70",
    "--dataset", "MVTec",
    "--text_adapt_until", "1", "--image_adapt_until", "1",
    "--levels", "1", "2",
    "--num_workers", "2",
]


def test_train_then_eval(env):
    import train as train_cli
    import test as test_cli

    save = os.path.join(env, "ckpt")
    train_cli.main(COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "2",
        "--text_batch_size", "4", "--image_batch_size", "4",
        "--surgery_until_layer", "2",
    ])
    assert os.path.isfile(os.path.join(save, "text_adapter.npz"))
    assert os.path.isfile(os.path.join(save, "image_adapter_1.npz"))
    assert os.path.isfile(os.path.join(save, "image_adapter_2.npz"))
    log = open(os.path.join(save, "train.log")).read()
    assert "training text epoch 0" in log
    assert "training image epoch 1" in log
    losses = [float(m) for m in re.findall(r"loss: ([\d.]+)", log)]
    assert all(np.isfinite(losses)) and len(losses) == 3

    test_cli.main(COMMON + [
        "--save_path", save, "--batch_size", "4", "--aupro", "--csv",
    ])
    tlog = open(os.path.join(save, "test.log")).read()
    assert "final results" in tlog
    assert "Average" in tlog
    assert "pixel AUPRO" in tlog
    # two snapshots evaluated
    assert tlog.count("load model from epoch") == 2
    # per-class rows present for the two synthetic classes
    assert "bottle" in tlog and "cable" in tlog
    # CSV export per evaluated epoch snapshot
    import pandas as pd
    csv1 = os.path.join(save, "results_1.csv")
    csv2 = os.path.join(save, "results_2.csv")
    assert os.path.isfile(csv1) and os.path.isfile(csv2)
    df = pd.read_csv(csv1)
    assert list(df["class name"])[-1] == "Average"
    assert "pixel AUPRO" in df.columns


def test_eval_int8_precision_cli(env):
    """test.py --precision int8: the quantized trunk (uint8 fused inputs
    by default) runs the full eval protocol and produces the per-class
    table."""
    import train as train_cli
    import test as test_cli

    save = os.path.join(env, "ckpt_int8")
    train_cli.main(COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
    ])
    test_cli.main(COMMON + [
        "--save_path", save, "--batch_size", "4", "--precision", "int8",
    ])
    tlog = open(os.path.join(save, "test.log")).read()
    assert "final results" in tlog and "Average" in tlog
    assert "'precision': 'int8'" in tlog


def test_eval_artifact_cli(env):
    """test.py --artifact evaluates the frozen export of a trained
    checkpoint — the exact bytes serve.py --artifact runs — and reproduces
    the live eval's metric table (same uint8 input path, fp32)."""
    import pandas as pd

    import test as test_cli
    import train as train_cli
    from aaclip_tpu.deploy import export_serving_artifact

    save = os.path.join(env, "ckpt_art")
    train_cli.main(COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
    ])
    test_cli.main(COMMON + [
        "--save_path", save, "--batch_size", "4", "--csv",
        "--fused_preprocess",  # the artifact pipeline ships uint8 too
    ])
    art = os.path.join(env, "art")
    export_serving_artifact(
        art, model_name="tiny-test", img_size=70, precision="fp32",
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1),
        save_path=save, datasets=("MVTec",), batch_sizes=(1, 2, 4))
    out = os.path.join(env, "art_results")
    test_cli.main(["--artifact", art, "--dataset", "MVTec",
                   "--save_path", out, "--batch_size", "4", "--csv"])
    tlog = open(os.path.join(out, "test.log")).read()
    assert "artifact manifest" in tlog and "final results" in tlog
    live = pd.read_csv(os.path.join(save, "results_1.csv"))
    frozen = pd.read_csv(os.path.join(out, "results_artifact.csv"))
    assert list(frozen["class name"]) == list(live["class name"])
    for col in live.columns:
        if col != "class name":
            np.testing.assert_allclose(frozen[col], live[col], atol=1e-6)


def test_eval_artifact_memory_bank_cli(env):
    """test.py --artifact --memory_bank (round 5): an artifact exported
    with --memory_bank_shot bundles per-class banks + fused graphs, and
    its eval table matches the live --memory_bank eval of the same
    checkpoint (same support draw, same fp32 math)."""
    import pandas as pd

    import test as test_cli
    import train as train_cli
    from aaclip_tpu.deploy import export_serving_artifact

    save = os.path.join(env, "ckpt_art_mb")
    train_cli.main(COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
    ])
    test_cli.main(COMMON + [
        "--save_path", save, "--batch_size", "4", "--csv",
        "--fused_preprocess", "--memory_bank", "--shot", "2",
    ])
    art = os.path.join(env, "art_mb")
    export_serving_artifact(
        art, model_name="tiny-test", img_size=70, precision="fp32",
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1),
        save_path=save, datasets=("MVTec",), batch_sizes=(1, 2, 4),
        memory_bank_shot=2)
    out = os.path.join(env, "art_mb_results")
    test_cli.main(["--artifact", art, "--dataset", "MVTec",
                   "--save_path", out, "--batch_size", "4", "--csv",
                   "--memory_bank"])
    tlog = open(os.path.join(out, "test.log")).read()
    assert "artifact memory bank: 2-shot" in tlog
    live = pd.read_csv(os.path.join(save, "results_1.csv"))
    frozen = pd.read_csv(os.path.join(out, "results_artifact.csv"))
    assert list(frozen["class name"]) == list(live["class name"])
    for col in live.columns:
        if col != "class name":
            np.testing.assert_allclose(frozen[col], live[col], atol=0.011)

    # an artifact WITHOUT banks refuses --memory_bank loudly
    art_plain = os.path.join(env, "art_plain_for_mb")
    export_serving_artifact(
        art_plain, model_name="tiny-test", img_size=70, precision="fp32",
        adapter_cfg=dict(levels=(1, 2), image_adapt_until=1,
                         text_adapt_until=1),
        save_path=save, datasets=("MVTec",), batch_sizes=(2,))
    with pytest.raises(SystemExit, match="banks bundled"):
        test_cli.main(["--artifact", art_plain, "--dataset", "MVTec",
                       "--save_path", out, "--memory_bank"])


def test_eval_artifact_rejects_parallel_flags(env):
    import test as test_cli

    for flag in ("--data_parallel", "--sequence_parallel",
                 "--tensor_parallel"):
        args = ["--artifact", "/tmp/nope", flag]
        if flag == "--tensor_parallel":
            args.append("2")
        with pytest.raises(SystemExit):
            test_cli.main(args)


def test_nondefault_img_size(env):
    """img_size != the tiny config's native 70 flows through train + eval
    (static-shape pipeline re-specializes; masks/maps track the size)."""
    import train as train_cli
    import test as test_cli

    save = os.path.join(env, "ckpt_size84")
    common = [c if c != "70" else "84" for c in COMMON]
    train_cli.main(common + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "4", "--surgery_until_layer", "2"])
    test_cli.main(common + ["--save_path", save, "--batch_size", "4"])
    tlog = open(os.path.join(save, "test.log")).read()
    assert "'img_size': 84" in tlog and "Average" in tlog


def test_train_data_parallel_cli(env):
    """train.py --data_parallel shards batches over all (virtual) devices."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_dp")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "1",
        "--text_batch_size", "8", "--image_batch_size", "8",
        "--surgery_until_layer", "2", "--data_parallel",
    ]
    # env vars alone don't switch off a registered TPU plugin; force via
    # jax.config inside the subprocess, then assert 8 devices were used
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {args!r}\n"
        "import train; train.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    log = open(os.path.join(save, "train.log")).read()
    assert "training text epoch 0" in log and "training image epoch 0" in log
    assert os.path.isfile(os.path.join(save, "image_adapter_1.npz"))


def test_eval_data_parallel_cli(env):
    """test.py --data_parallel shards eval batches over all (virtual)
    devices; results table must still be produced per class."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_dp_eval")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
    ]
    # batch_size 6 is not divisible by 8 devices: exercises the round-up
    test_args = COMMON + ["--save_path", save, "--batch_size", "6",
                          "--data_parallel"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
        f"sys.argv = ['test.py'] + {test_args!r}\n"
        "import test; test.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    tlog = open(os.path.join(save, "test.log")).read()
    assert "batch_size rounded up to 8" in tlog
    assert "final results" in tlog and "Average" in tlog
    assert "bottle" in tlog and "cable" in tlog


def test_eval_tensor_parallel_cli(env):
    """test.py --tensor_parallel 2: 2-D (data=4, model=2) mesh — the
    Megatron-sharded trunk must produce the per-class results table."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_tp_eval")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
    ]
    test_args = COMMON + ["--save_path", save, "--batch_size", "4",
                          "--tensor_parallel", "2"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
        f"sys.argv = ['test.py'] + {test_args!r}\n"
        "import test; test.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    tlog = open(os.path.join(save, "test.log")).read()
    assert "mesh: data=4 x model=2" in tlog
    assert "final results" in tlog and "Average" in tlog
    assert "bottle" in tlog and "cable" in tlog


def test_eval_pipeline_parallel_cli(env):
    """test.py --pipeline_parallel 2 (then + --data_parallel): GPipe over
    the tap-aligned trunk (one level per stage on tiny-test) must produce
    the per-class results table, identical protocol to single-device; with
    --data_parallel the remaining devices form the data axis of the
    ('stage','data') mesh."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_pp_eval")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
    ]
    test_args = COMMON + ["--save_path", save, "--batch_size", "4",
                          "--pipeline_parallel", "2"]
    test_args_dp = test_args + ["--data_parallel"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
        f"sys.argv = ['test.py'] + {test_args!r}\n"
        "import test; test.main()\n"
        f"sys.argv = ['test.py'] + {test_args_dp!r}\n"
        "test.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    tlog = open(os.path.join(save, "test.log")).read()
    assert "mesh: stage=2 x data=1 (GPipe, 2 microbatches)" in tlog
    assert "mesh: stage=2 x data=4 (GPipe, 2 microbatches)" in tlog
    assert "final results" in tlog and "Average" in tlog
    assert "bottle" in tlog and "cable" in tlog


def test_train_pipeline_parallel_cli(env):
    """train.py --pipeline_parallel 2 --data_parallel: stage-1 extracts
    surgery features through the GPipe trunk (batch-mode V-V couples per
    microbatch), stage-2 trains GPipe-style over the ('stage','data')
    mesh (2 stages x 4 data shards), and the resulting checkpoint
    evaluates through the standard test.py path."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_pp_train")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "1",
        "--text_batch_size", "8",
        "--image_batch_size", "8", "--surgery_until_layer", "2",
        "--pipeline_parallel", "2", "--data_parallel",
    ]
    test_args = COMMON + ["--save_path", save, "--batch_size", "4"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
        f"sys.argv = ['test.py'] + {test_args!r}\n"
        "import test; test.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    tlog = open(os.path.join(save, "train.log")).read()
    assert "mesh: stage=2 x data=4 (GPipe stage-1+2, 2 microbatches)" in tlog
    assert "training text epoch 0" in tlog  # stage-1 ran under pp
    elog = open(os.path.join(save, "test.log")).read()
    assert "final results" in elog and "Average" in elog


def test_train_pipeline_parallel_stage1_spatial_dp_cli(env):
    """Stage-1 PP with --vv_mode spatial composes with --data_parallel
    (the s1_pp_dp branch: per-sample features shard over the pipeline's
    data axis; batch-mode V-V would reject the explicit data sharding)."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_pp_s1_sp")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "0",
        "--text_batch_size", "8", "--surgery_until_layer", "2",
        "--vv_mode", "spatial",
        "--pipeline_parallel", "2", "--data_parallel",
    ]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    tlog = open(os.path.join(save, "train.log")).read()
    assert "training text epoch 0" in tlog
    assert os.path.isfile(os.path.join(save, "text_adapter.npz"))


def test_train_tensor_parallel_cli(env):
    """train.py --tensor_parallel 2 --sequence_parallel: stage-2 trains
    through the Megatron-sharded trunk (sequence-sharded residual stream)
    on the (data=4, model=2) mesh; the checkpoint must then evaluate
    normally single-device."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_tp_train")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "1",
        "--text_batch_size", "4", "--image_batch_size", "8",
        "--surgery_until_layer", "2", "--tensor_parallel", "2",
        "--sequence_parallel", "--grad_accum", "2",
    ]
    test_args = COMMON + ["--save_path", save, "--batch_size", "4"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
        f"sys.argv = ['test.py'] + {test_args!r}\n"
        "import test; test.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    trlog = open(os.path.join(save, "train.log")).read()
    assert "mesh: data=4 x model=2" in trlog
    tlog = open(os.path.join(save, "test.log")).read()
    assert "final results" in tlog and "Average" in tlog


def test_stage1_resume_skip_quirk(env):
    """Reference quirk (train.py:277-288): when the saved text epoch equals
    text_epoch-1, stage 1 is SKIPPED entirely on resume."""
    import train as train_cli

    save = os.path.join(env, "ckpt_quirk")
    base = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--image_epoch", "0", "--text_batch_size", "4",
        "--surgery_until_layer", "2",
    ]
    train_cli.main(base + ["--text_epoch", "1"])  # saves epoch counter 1
    log = open(os.path.join(save, "train.log")).read()
    assert log.count("training text epoch 0:") == 1
    # resume with text_epoch=2: saved(1) == text_epoch-1 -> skip stage 1
    train_cli.main(base + ["--text_epoch", "2"])
    log = open(os.path.join(save, "train.log")).read()
    assert "training text epoch 1:" not in log
    # but text_epoch=3 resumes normally from epoch 1
    train_cli.main(base + ["--text_epoch", "3"])
    log = open(os.path.join(save, "train.log")).read()
    assert "training text epoch 1:" in log and "training text epoch 2:" in log


def test_eval_reference_pth_checkpoints_and_visualize(env):
    """test.py consumes reference-format .pth adapters and writes
    visualization panels."""
    import jax
    import torch

    import test as test_cli
    from aaclip_tpu.core.config import AdapterConfig, get_config
    from aaclip_tpu.core.params import init_adapter_params
    from aaclip_tpu.train.checkpoint import adapters_to_torch_state_dicts

    save = os.path.join(env, "ckpt_pth")
    os.makedirs(save, exist_ok=True)
    cfg = get_config("tiny-test")
    acfg = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    adapters = init_adapter_params(jax.random.PRNGKey(3), cfg, acfg)
    text_sd, image_sd = adapters_to_torch_state_dicts(adapters, proj_relu=False)
    torch.save({"epoch": 1, "text_adapter": text_sd},
               os.path.join(save, "text_adapter.pth"))
    torch.save({"epoch": 1, "image_adapter": image_sd},
               os.path.join(save, "image_adapter_1.pth"))

    test_cli.main(COMMON + ["--save_path", save, "--batch_size", "4",
                            "--visualize"])
    tlog = open(os.path.join(save, "test.log")).read()
    assert "load model from epoch 1" in tlog and "Average" in tlog
    vis_dir = os.path.join(save, "visualization", "MVTec", "bottle")
    assert os.path.isdir(vis_dir) and len(os.listdir(vis_dir)) == 6


def test_medical_domain_eval(env, tmp_path):
    """Medical datasets take the other eval path: k9/sigma1.5 blur,
    image score = pixel max only; and an all-anomalous set must force the
    image metrics to 0 (reference forward_utils.py:264-271)."""
    import test as test_cli
    import train as train_cli

    root = str(tmp_path)
    data_root, meta_root = make_synthetic_dataset(
        root, dataset_name="Brain", n_normal=3, n_anomalous=3, img_px=64)
    old = os.environ["AACLIP_DATA"], os.environ["AACLIP_METADATA"]
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    try:
        save = os.path.join(root, "ckpt")
        common = ["--model_name", "tiny-test", "--img_size", "70",
                  "--dataset", "Brain", "--text_adapt_until", "1",
                  "--image_adapt_until", "1", "--levels", "1", "2",
                  "--num_workers", "2"]
        train_cli.main(common + [
            "--save_path", save, "--training_mode", "full_shot",
            "--text_epoch", "0", "--image_epoch", "1",
            "--image_batch_size", "3", "--surgery_until_layer", "2"])
        test_cli.main(common + ["--save_path", save, "--batch_size", "3"])
        tlog = open(os.path.join(save, "test.log")).read()
        assert "Brain" in tlog and "final results" in tlog
        # mixed labels -> image metrics nonzero possible; now all-anomalous:
        meta = os.path.join(meta_root, "Brain", "full-shot.jsonl")
        lines = [l for l in open(meta) if '"label": 1' in l]
        with open(meta, "w") as f:
            f.writelines(lines)
        save2 = os.path.join(root, "ckpt2")
        os.makedirs(save2, exist_ok=True)
        import shutil
        shutil.copy(os.path.join(save, "image_adapter_1.npz"),
                    os.path.join(save2, "image_adapter_1.npz"))
        test_cli.main(common + ["--save_path", save2, "--batch_size", "3"])
        tlog2 = open(os.path.join(save2, "test.log")).read()
        import re
        row = [l for l in tlog2.splitlines() if re.search(r"^\s*Brain\s", l)][-1]
        cols = row.split()
        # columns: name, pixel AUC, pixel AP, image AUC, image AP
        assert float(cols[3]) == 0.0 and float(cols[4]) == 0.0, row
    finally:
        os.environ["AACLIP_DATA"], os.environ["AACLIP_METADATA"] = old


def test_eval_memory_bank_cli(env):
    """test.py --memory_bank: per-class few-shot banks from training
    normals fused with the text-anchor prediction at --bank_weight; the
    flag guard rejects tp/pp/artifact composition.  --data_parallel
    composes (round 5): the table must match the single-device run."""
    import test as test_cli

    save = os.path.join(env, "ckpt")  # reuses test_train_then_eval's run
    assert os.path.isfile(os.path.join(save, "image_adapter_2.npz"))
    test_cli.main(COMMON + [
        "--save_path", save, "--batch_size", "4", "--csv",
        "--memory_bank", "--shot", "2", "--bank_weight", "0.5",
        "--bank_chunk", "5",
    ])
    tlog = open(os.path.join(save, "test.log")).read()
    assert "memory_bank: fusing 2-shot" in tlog
    assert "memory bank: " in tlog  # per-class bank size line
    assert "final results" in tlog and "Average" in tlog
    import pandas as pd
    df = pd.read_csv(os.path.join(save, "results_2.csv"))
    assert list(df["class name"])[-1] == "Average"
    assert np.isfinite(df["image AUC"].astype(float)).all()

    # dp composition: same protocol, batch sharded over the 8 devices
    save_dp = os.path.join(env, "ckpt_mb_dp")
    os.makedirs(save_dp, exist_ok=True)
    import glob
    import shutil
    # copy the TEXT adapter too: anchors come from it — an image-only
    # copy would silently fall back to the frozen text encoder and
    # produce a legitimately different table
    for f in glob.glob(os.path.join(save, "*.npz")):
        shutil.copy(f, save_dp)
    test_cli.main(COMMON + [
        "--save_path", save_dp, "--batch_size", "4", "--csv",
        "--memory_bank", "--shot", "2", "--bank_weight", "0.5",
        "--bank_chunk", "5", "--data_parallel",
    ])
    df_dp = pd.read_csv(os.path.join(save_dp, "results_2.csv"))
    pd.testing.assert_frame_equal(
        df_dp.reset_index(drop=True), df.reset_index(drop=True),
        check_exact=False, atol=0.11)  # tables round to 2-3 decimals

    import pytest
    with pytest.raises(SystemExit):
        test_cli.main(COMMON + ["--save_path", save, "--memory_bank",
                                "--tensor_parallel", "2"])
    with pytest.raises(SystemExit):
        test_cli.main(COMMON + ["--save_path", save, "--memory_bank",
                                "--shot", "0"])


def test_few_shot_flow(env):
    """tools/make_few_shot.py generates K-shot metadata; train.py consumes
    it in few_shot mode (the reference's default training mode)."""
    import subprocess
    import sys

    import train as train_cli

    r = subprocess.run(
        [sys.executable, "tools/make_few_shot.py", "--dataset", "MVTec",
         "--shots", "3", "--seed", "7"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ),
    )
    assert r.returncode == 0, r.stderr
    meta = os.path.join(os.environ["AACLIP_METADATA"], "MVTec", "3-shot.jsonl")
    assert os.path.isfile(meta)
    lines = open(meta).read().strip().split("\n")
    assert len(lines) == 6  # 3 shots x 2 synthetic classes

    save = os.path.join(env, "ckpt_fewshot")
    train_cli.main(COMMON + [
        "--save_path", save, "--training_mode", "few_shot", "--shot", "3",
        "--text_epoch", "0", "--image_epoch", "1",
        "--image_batch_size", "3", "--surgery_until_layer", "2",
    ])
    assert os.path.isfile(os.path.join(save, "image_adapter_1.npz"))


def test_vv_mode_spatial_cli(env):
    """--vv_mode spatial trains stage-1 with per-sample V-V attention (the
    opt-in intended semantics) plus chunked feature extraction; the default
    batch quirk mode is covered by every other stage-1 test
    (docs/PARITY.md)."""
    import train as train_cli

    save = os.path.join(env, "ckpt_vv_spatial")
    train_cli.main(COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "0",
        "--text_batch_size", "4", "--surgery_until_layer", "2",
        "--vv_mode", "spatial", "--feature_chunk", "2",
    ])
    assert os.path.isfile(os.path.join(save, "text_adapter.npz"))


def test_train_resume(env):
    """Stage-2 resume: rerunning with a higher epoch count continues from
    the stored epoch instead of restarting (reference train.py:289-296)."""
    import train as train_cli

    save = os.path.join(env, "ckpt_resume")
    base = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "0",
        "--text_batch_size", "4", "--image_batch_size", "4",
        "--surgery_until_layer", "2",
    ]
    train_cli.main(base + ["--image_epoch", "1"])
    assert os.path.isfile(os.path.join(save, "image_adapter_1.npz"))
    train_cli.main(base + ["--image_epoch", "2"])
    assert os.path.isfile(os.path.join(save, "image_adapter_2.npz"))
    log = open(os.path.join(save, "train.log")).read()
    # epoch 0 trained once, epoch 1 trained once after resume
    assert log.count("training image epoch 0:") == 1
    assert log.count("training image epoch 1:") == 1


def test_orbax_backend_cli(env):
    """train.py --ckpt_backend orbax writes directory snapshots; resume
    works across backends; test.py evaluates the .orbax snapshots."""
    import train as train_cli
    import test as test_cli

    save = os.path.join(env, "ckpt_orbax")
    base = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--text_batch_size", "4",
        "--image_batch_size", "4", "--surgery_until_layer", "2",
        "--ckpt_backend", "orbax",
    ]
    train_cli.main(base + ["--image_epoch", "1"])
    assert os.path.isdir(os.path.join(save, "image_adapter_1.orbax"))
    assert os.path.isdir(os.path.join(save, "text_adapter.orbax"))
    assert not os.path.exists(os.path.join(save, "image_adapter_1.npz"))
    # resume from the orbax snapshot, continuing to epoch 2
    train_cli.main(base + ["--image_epoch", "2"])
    assert os.path.isdir(os.path.join(save, "image_adapter_2.orbax"))
    log = open(os.path.join(save, "train.log")).read()
    assert log.count("training image epoch 0:") == 1
    assert log.count("training image epoch 1:") == 1

    test_cli.main(COMMON + ["--save_path", save, "--batch_size", "4"])
    tlog = open(os.path.join(save, "test.log")).read()
    assert tlog.count("load model from epoch") == 2
    assert "Average" in tlog


def test_combined_features_cli(env):
    """Feature interaction: --data_parallel + --device_augment +
    --ckpt_backend orbax in ONE run (device augmentation must partition
    over the sharded batch), then data-parallel eval of the orbax snapshot."""
    import subprocess
    import sys

    save = os.path.join(env, "ckpt_combo")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    train_args = COMMON + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "1",
        "--text_batch_size", "8", "--image_batch_size", "8",
        "--surgery_until_layer", "2", "--data_parallel",
        "--device_augment", "--ckpt_backend", "orbax",
    ]
    test_args = COMMON + ["--save_path", save, "--batch_size", "8",
                          "--data_parallel"]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        f"import sys; sys.argv = ['train.py'] + {train_args!r}\n"
        "import train; train.main()\n"
        f"sys.argv = ['test.py'] + {test_args!r}\n"
        "import test; test.main()\n"
    )
    envv = dict(os.environ)
    envv["JAX_PLATFORMS"] = "cpu"
    envv["XLA_FLAGS"] = (envv.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=repo, env=envv, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isdir(os.path.join(save, "image_adapter_1.orbax"))
    tlog = open(os.path.join(save, "test.log")).read()
    assert "final results" in tlog and "Average" in tlog
