"""Summarize a jax.profiler trace into an op-time table.

Usage:
    python bench.py --profile_dir /tmp/prof ...
    python tools/profile_report.py /tmp/prof [--top 20]

Finds the newest ``*.trace.json.gz`` under the directory, aggregates the
complete-event durations per op name, groups XLA/Pallas op families
(fusion kernels, scan bodies, custom calls, copies/pads), and prints a
table of where device time goes.  This replaces eyeballing the raw
TensorBoard trace, which is unavailable in headless environments.

CAVEAT (axon relay): traces captured through the relayed TPU report
COMPILER COST-MODEL durations, not measured wall times — the numbers are
bit-identical across runs and insensitive to some numeric-mode changes.
They are still useful for relative op-family weighting; trust end-to-end
wall times (bench.py's scalar-fetch timing) for absolute numbers.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

_FAMILIES = (
    (re.compile(r"^(while|body|condition)"), "scan/while (tower segments)"),
    (re.compile(r"^(closed_call|custom-call|tpu_custom_call)"), "custom calls (Pallas kernels)"),
    (re.compile(r"fusion"), "XLA fusions (matmul/LN/elementwise)"),
    (re.compile(r"^(copy|pad|transpose|bitcast|reshape|slice|concatenate)"), "data movement"),
    (re.compile(r"^(dot|convolution)"), "bare matmuls/convs"),
    (re.compile(r"^(all-reduce|all-gather|reduce-scatter|collective)"), "collectives"),
    (re.compile(r"^(infeed|outfeed|send|recv)"), "host transfer"),
)


def load_trace(profile_dir: str) -> list:
    paths = sorted(glob.glob(os.path.join(
        profile_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {profile_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"]


def summarize(events: list) -> tuple:
    """(per-op Counter, per-family Counter) of total durations in ms."""
    per_op: collections.Counter = collections.Counter()
    per_family: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        if name.startswith("$") or name.startswith("jit_"):
            continue  # python-side / whole-program spans (double counting)
        ms = e["dur"] / 1e3
        per_op[name] += ms
        for pat, fam in _FAMILIES:
            if pat.search(name):
                per_family[fam] += ms
                break
        else:
            per_family["other"] += ms
    return per_op, per_family


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("profile_dir")
    parser.add_argument("--top", type=int, default=20)
    args = parser.parse_args(argv)

    per_op, per_family = summarize(load_trace(args.profile_dir))
    total = sum(per_family.values())
    print(f"== op families ({total:.1f} ms total device-op time) ==")
    print("   note: scan/while spans CONTAIN their body ops (fusions,")
    print("   custom calls), which are also reported on their own rows")
    for fam, ms in per_family.most_common():
        print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  {fam}")
    print(f"\n== top {args.top} ops ==")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
