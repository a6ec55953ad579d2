#!/bin/bash
# Round-5 follow-up chip measurements — runs AFTER round5_chip_session.sh
# (gate on its done-marker so the chip is never shared between sessions).
# Covers the two artifact follow-ups the cold-start A/B left open:
#   A. Pallas-in-graph (Mosaic custom-call) export compile check
#   B. steady-state serving bench from the already-exported artifact
# Usage: bash tools/round5_followup.sh [results_log] [done_marker]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round5_followup.log}
MARKER=${2:-/tmp/r5_session.done}
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "waiting for $MARKER"
while [ ! -e "$MARKER" ]; do sleep 30; done

say "step A: native-kernels export compile check (Mosaic custom-call in graph)"
timeout 3600 python -u tools/export_artifact.py --out /tmp/serve_coldstart/artifact_nk \
  --model_name ViT-L-14-336 --img_size 518 --precision bf16 \
  --batch_sizes 8 --native_kernels --verify >> "$LOG" 2>&1

say "step B: bench serve steady state from the exported artifact"
timeout 3600 python bench.py --mode serve --steps 60 \
  --artifact /tmp/serve_coldstart/artifact >> "$LOG" 2>&1

say "DONE"
