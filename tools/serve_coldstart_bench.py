"""A/B the serving cold-start: frozen artifact vs live engine.

Measures what `docs/PERFORMANCE.md` ("Artifact serving") describes:

  1. `tools/export_artifact.py` wall time (+ `--verify` reload),
  2. `serve.py --artifact` readiness (spawn -> /healthz OK) + request smoke,
  3. live `serve.py` readiness with the same model config — on the TPU
     relay this is the ~400 s params + anchors + bucket-precompile path,
  4. optionally (`--native_kernels`) a Pallas-in-graph export compile
     check (TPU-only Mosaic custom-call path).

The reference has no serving or deployment story at all (each start
rebuilds the torch model + prompts, reference ``test.py:29-49``), so both
sides of this A/B are this framework's own.

Child process output goes to files under --workdir (XLA/relay startup
output is chatty; a PIPE would deadlock an undrained parent). Prints one
JSON summary line, e.g.::

    python tools/serve_coldstart_bench.py --workdir /tmp/coldstart   # ViT-L
    python tools/serve_coldstart_bench.py --tiny                     # CPU smoke
"""

import argparse
import io
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_step(name, cmd, timeout, workdir, env):
    path = os.path.join(workdir, name + ".log")
    t0 = time.time()
    with open(path, "w") as f:
        try:
            r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                               cwd=REPO, env=env, timeout=timeout)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "TIMEOUT"
    dt = time.time() - t0
    log(f"{name}: rc={rc} in {dt:.0f}s -> {path}")
    return rc, dt


def spawn_serve(name, extra, workdir, env):
    path = os.path.join(workdir, name + ".log")
    f = open(path, "w")
    p = subprocess.Popen([sys.executable, "-u", "serve.py"] + extra,
                         stdout=f, stderr=subprocess.STDOUT,
                         cwd=REPO, env=env)
    return p, f


def wait_health(port, proc, timeout):
    t0 = time.time()
    url = f"http://127.0.0.1:{port}/healthz"
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            return None, f"server exited rc={proc.returncode}"
        try:
            json.load(urllib.request.urlopen(url, timeout=2))
            return time.time() - t0, "ok"
        except Exception:  # noqa: BLE001 — not up yet
            time.sleep(3)
    return None, "healthz timeout"


def smoke(port, img_size, n=3):
    import numpy as np
    from PIL import Image

    base = f"http://127.0.0.1:{port}"
    cls_info = json.load(urllib.request.urlopen(base + "/classes",
                                                timeout=10))
    cls, ds = cls_info["classes"][0], cls_info["dataset"]
    arr = np.random.default_rng(0).integers(
        0, 255, (img_size, img_size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "PNG")
    lat = []
    for _ in range(n):
        t0 = time.time()
        req = urllib.request.Request(
            f"{base}/predict?dataset={ds}&class_name={cls}&map_stride=14",
            data=buf.getvalue(), method="POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                json.load(r)
        except urllib.error.HTTPError as e:
            # surface the engine's error body — a bare "HTTP 500" hides
            # the actual server-side exception
            raise SystemExit(
                f"smoke request failed: HTTP {e.code}: "
                f"{e.read().decode(errors='replace')[:500]}")
        lat.append(round(time.time() - t0, 3))
    return lat


def stop(proc):
    proc.terminate()
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=30)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="artifact vs live serving cold-start A/B")
    p.add_argument("--workdir", default="/tmp/serve_coldstart",
                   help="artifact output + child logs")
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--ports", type=int, nargs=2, default=[8791, 8792])
    p.add_argument("--startup_timeout", type=float, default=1800.0)
    p.add_argument("--native_kernels", action="store_true",
                   help="also compile-check a Pallas-in-graph export "
                        "(TPU host only)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-test @ 70px (CPU smoke of the harness)")
    args = p.parse_args(argv)

    env = dict(os.environ)
    tiny_flags = []
    if args.tiny:
        args.model_name, args.img_size = "tiny-test", 70
        tiny_flags = ["--levels", "1", "2", "--image_adapt_until", "1",
                      "--text_adapt_until", "1"]
    os.makedirs(args.workdir, exist_ok=True)
    art = os.path.join(args.workdir, "artifact")
    model_flags = ["--model_name", args.model_name,
                   "--img_size", str(args.img_size), *tiny_flags]
    res = {"model": args.model_name, "img_size": args.img_size,
           "precision": args.precision}

    rc, dt = run_step("export", [
        sys.executable, "-u", "tools/export_artifact.py", "--out", art,
        *model_flags, "--precision", args.precision,
        "--batch_sizes", *map(str, args.batch_sizes), "--verify"],
        3600, args.workdir, env)
    res["export_rc"], res["export_s"] = rc, round(dt, 1)
    if rc != 0:
        print("SUMMARY " + json.dumps(res), flush=True)
        return 1

    p1, f1 = spawn_serve("artifact_serve",
                         ["--artifact", art, "--port", str(args.ports[0])],
                         args.workdir, env)
    try:
        t_ready, why = wait_health(args.ports[0], p1, args.startup_timeout)
        res["artifact_ready_s"] = round(t_ready, 1) if t_ready else why
        if t_ready:
            res["artifact_req_lat_s"] = smoke(args.ports[0], args.img_size)
    finally:
        stop(p1)
        f1.close()

    p2, f2 = spawn_serve("live_serve", [
        *model_flags, "--precision", args.precision, "--max_batch",
        str(max(args.batch_sizes)), "--port", str(args.ports[1]),
        "--anchor_cache", ""],  # a warm anchor cache would flatter live
        args.workdir, env)
    try:
        t_ready, why = wait_health(args.ports[1], p2, args.startup_timeout)
        res["live_ready_s"] = round(t_ready, 1) if t_ready else why
    finally:
        stop(p2)
        f2.close()

    if args.native_kernels:
        rc, dt = run_step("export_nk", [
            sys.executable, "-u", "tools/export_artifact.py", "--out",
            art + "_nk", *model_flags, "--precision", args.precision,
            "--batch_sizes", str(max(args.batch_sizes)),
            "--native_kernels", "--verify"], 3600, args.workdir, env)
        res["export_native_kernels_rc"] = rc
        res["export_nk_s"] = round(dt, 1)

    print("SUMMARY " + json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
