#!/bin/bash
# Round-5 production-point train A/B — CORRECTED rerun of the session's
# steps 5/6, which accidentally ran at the default --precision fp32
# (reference-exact numerics, ~6 img/s: the step dominates so the A/B
# couldn't resolve anything).  The production point is bf16 (35.6 img/s
# bare-step bench): batch 32, --grad_accum 4, --device_augment,
# --cache_device.  Three legs, shared synthetic dataset, separate save
# paths, per-leg train.log echoed into $LOG:
#   A. baseline  (loss_fetch_every default 8)    — the lf8 point
#   B. + --fused_assemble                        — assembly-fold A/B vs A
#   C. --loss_fetch_every 1                      — throttle A/B vs A
# Usage: bash tools/round5_train_ab.sh [results_log] [done_marker]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round5_train_ab.log}
MARKER=${2:-/tmp/r5_session.done}
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "waiting for $MARKER"
while [ ! -e "$MARKER" ]; do sleep 30; done

say "generating the shared 192-image dataset"
rm -rf /tmp/r5b
timeout 600 python -u - <<'EOF' >> "$LOG" 2>&1
import sys
sys.path.insert(0, ".")
from aaclip_tpu.data.synthetic import make_synthetic_dataset
make_synthetic_dataset("/tmp/r5b", img_px=518, n_normal=192,
                       n_anomalous=0, class_names=("bottle",))
EOF

run_leg() {  # $1 = leg name, rest = extra train flags
  leg=$1; shift
  say "leg $leg: train bf16 --cache_device $*"
  timeout 3000 python -u - "$leg" "$@" <<'EOF' >> "$LOG" 2>&1
import sys, os
sys.path.insert(0, ".")
leg, extra = sys.argv[1], sys.argv[2:]
os.environ["AACLIP_DATA"] = "/tmp/r5b/data"
os.environ["AACLIP_METADATA"] = "/tmp/r5b/metadata"
sys.argv = ["train.py", "--model_name", "ViT-L-14-336", "--img_size", "518",
            "--dataset", "MVTec", "--save_path", f"/tmp/r5b/ckpt_{leg}",
            "--training_mode", "full_shot", "--text_epoch", "0",
            "--image_epoch", "3", "--image_batch_size", "32",
            "--grad_accum", "4", "--precision", "bf16",
            "--device_augment", "--cache_device"] + extra
import train; train.main()
EOF
  grep -E "throughput|loss:" "/tmp/r5b/ckpt_$leg/train.log" >> "$LOG" 2>&1
}

run_leg base
run_leg fused --fused_assemble
run_leg lf1 --loss_fetch_every 1

say "DONE"
