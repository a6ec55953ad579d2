"""A/B the HTTP response encodings (json vs f16 vs u8 binary maps).

The serving phase split showed the respond phase JSON-encodes ~7 ASCII
bytes per map pixel; ``map_encoding=f16``/``u8`` (serve/server.py) cut
that to 2/1 binary bytes.  This tool measures the end-to-end HTTP
request throughput for each encoding x map_stride against a REAL server
process — closed loop, ``--clients`` threads, ``--seconds`` per cell —
and reports req/s, mean response bytes, and mean latency.

    JAX_PLATFORMS=cpu python -u tools/serve_http_ab.py \
        --model_name tiny-test --img_size 70 --tiny_adapters \
        --seconds 5                                  # CPU, ~1 min
    python -u tools/serve_http_ab.py --seconds 30    # production ViT-L

Spawns ``serve.py`` like tools/serve_smoke.py (same stale-port guard and
file-logged startup), or targets a running server with ``--url``.
Startup through the axon relay takes ~400 s — budget the timeout.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn_server(args):
    cmd = [sys.executable, "-u", "serve.py", "--port", str(args.port),
           "--model_name", args.model_name, "--img_size",
           str(args.img_size), "--precision", args.precision,
           "--max_batch", str(args.max_batch)]
    if args.tiny_adapters:
        cmd += ["--levels", "1", "2", "--image_adapt_until", "1",
                "--text_adapt_until", "1"]
    if args.artifact:
        cmd += ["--artifact", args.artifact]
    base = f"http://127.0.0.1:{args.port}"
    # stale-port guard (see serve_smoke.py: a survivor would answer the
    # healthz poll while the new child dies unnoticed)
    try:
        urllib.request.urlopen(base + "/healthz", timeout=2)
        live = True
    except urllib.error.HTTPError:
        live = True
    except (urllib.error.URLError, ConnectionError, OSError):
        live = False
    if live:
        raise SystemExit(f"something is already serving on port "
                         f"{args.port} — kill it or pass --port")
    # file-logged startup: an undrained pipe deadlocks chatty startups
    logf = tempfile.NamedTemporaryFile("w", suffix="_serve_ab.log",
                                       delete=False)
    print(f"server log: {logf.name}", flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=logf,
                            stderr=subprocess.STDOUT, text=True)
    t0 = time.time()
    while True:
        if proc.poll() is not None:
            with open(logf.name) as f:
                print(f.read()[-3000:])
            raise SystemExit("server exited during startup")
        try:
            urllib.request.urlopen(base + "/healthz", timeout=2)
            break
        except Exception:
            time.sleep(2)
        if time.time() - t0 > args.startup_timeout:
            proc.terminate()
            raise SystemExit("healthz timeout")
    print(f"server ready after {time.time() - t0:.0f}s", flush=True)
    return proc, base


def _png(img_size: int) -> bytes:
    rng = np.random.default_rng(0)
    img = (rng.random((img_size, img_size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return buf.getvalue()


def _warm_stride(base, png, cls, stride, clients, max_batch,
                 timeout=600.0):
    """Compile every occupancy bucket for ``stride`` before timing.

    Bursts of exactly 1, 2, 4, ... <= min(clients, max_batch) concurrent
    requests: the engine pads each dispatch to the enclosing power-of-2
    bucket, so each burst forces one bucket's slice program to compile
    (no-op once cached).  A burst failure is fatal only if EVERY request
    in it fails — a single slow compile finishing after some requests
    is fine.
    """
    url = (f"{base}/predict?dataset=MVTec&class_name={cls}"
           f"&map_stride={stride}")
    cap = min(clients, max_batch)
    b = 1
    while True:
        results = []
        lock = threading.Lock()

        def one():
            try:
                req = urllib.request.Request(url, data=png, method="POST")
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    r.read()
                ok = True
            except Exception:
                ok = False
            with lock:
                results.append(ok)

        threads = [threading.Thread(target=one) for _ in range(b)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        print(f"warm stride={stride} bucket={b}: "
              f"{sum(results)}/{b} ok in {time.time() - t0:.1f}s",
              flush=True)
        if not any(results):
            raise SystemExit(
                f"warmup burst failed entirely (stride={stride}, "
                f"bucket={b}) — server wedged or compile exceeded "
                f"{timeout:.0f}s")
        if b >= cap:
            return
        b = min(b * 2, cap)


def _run_cell(base, png, cls, encoding, stride, clients, seconds):
    """Closed-loop clients against one (encoding, stride) config."""
    url = (f"{base}/predict?dataset=MVTec&class_name={cls}"
           f"&map_stride={stride}")
    if encoding != "json":
        url += f"&map_encoding={encoding}"
    stop = time.time() + seconds
    lock = threading.Lock()
    acc = {"n": 0, "bytes": 0, "lat": 0.0, "errors": 0}

    def worker():
        while time.time() < stop:
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(url, data=png, method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    body = r.read()
            except Exception:
                with lock:
                    acc["errors"] += 1
                continue
            with lock:
                acc["n"] += 1
                acc["bytes"] += len(body)
                acc["lat"] += time.perf_counter() - t0

    threads = [threading.Thread(target=worker) for _ in range(clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    n = max(acc["n"], 1)
    return {"encoding": encoding, "stride": stride,
            "req_s": acc["n"] / wall,
            "mean_bytes": acc["bytes"] // n,
            "mean_lat_ms": acc["lat"] / n * 1e3,
            "errors": acc["errors"]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--port", type=int, default=8437)
    p.add_argument("--url", default=None,
                   help="target a running server instead of spawning one")
    p.add_argument("--artifact", default=None,
                   help="serve.py --artifact passthrough")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0,
                   help="measurement window per (encoding, stride) cell")
    p.add_argument("--encodings", default="json,f16,u8")
    p.add_argument("--strides", default="1,4")
    p.add_argument("--class_name", default="bottle")
    p.add_argument("--startup_timeout", type=float, default=900.0)
    p.add_argument("--tiny_adapters", action="store_true")
    args = p.parse_args(argv)

    proc = None
    if args.url:
        base = args.url.rstrip("/")
    else:
        proc, base = _spawn_server(args)
    png = _png(args.img_size)
    try:
        # warm EVERY (stride x occupancy-bucket) before timing: the
        # engine compiles one device slice program per bucket x
        # map_stride, and through the relay each compile takes seconds
        # to minutes — a fixed-window warmup (the first version used 3 s)
        # leaves some buckets uncompiled and the next timed cell's
        # requests stall behind the in-flight compile until the client
        # timeout, reading as spurious errors=clients rows.  Instead,
        # issue success-gated bursts of 1, 2, 4, ... concurrent requests
        # (each burst pads to exactly one bucket) with a generous
        # timeout, so timing starts only once every program this run can
        # hit exists.
        for stride in (int(s) for s in args.strides.split(",")):
            _warm_stride(base, png, args.class_name, stride,
                         args.clients, args.max_batch)
        rows = []
        for stride in (int(s) for s in args.strides.split(",")):
            for enc in args.encodings.split(","):
                row = _run_cell(base, png, args.class_name, enc.strip(),
                                stride, args.clients, args.seconds)
                rows.append(row)
                print(f"stride={stride:>2} {row['encoding']:>4}: "
                      f"{row['req_s']:7.2f} req/s  "
                      f"{row['mean_bytes']:>9} B/resp  "
                      f"{row['mean_lat_ms']:7.1f} ms  "
                      f"errors={row['errors']}", flush=True)
        print(json.dumps({"serve_http_ab": rows}))
    finally:
        if proc is not None:
            proc.terminate()
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()
