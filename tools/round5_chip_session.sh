#!/bin/bash
# Round-5 chip measurement queue (docs/PERFORMANCE.md "Round-5 relay
# status").  Each step is bounded and appends to $LOG.  Ordering: the
# cheap microbenches run first (high value per minute, and they warm the
# compile cache), then the two-round-old artifact-serving debt (verdict
# item 1), then the production-point train session, then the remaining
# serve/quant/soak measurements — so a flapping relay window harvests
# the highest-priority items first.
# Usage: bash tools/round5_chip_session.sh [results_log]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round5_chip_results.log}
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "step 0: relay sanity"
# The returned round-5 relay answers jax.devices() instantly but takes a
# WILDLY variable time to execute the FIRST program of each process
# (tunnel handshake: measured 52 s, 223 s, 278 s, and one >600 s window
# on 2026-08-21) — so retry up to 3 x 900 s before declaring it dead.
ok=0
for i in 1 2 3; do
  timeout 900 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()), jax.devices())" >> "$LOG" 2>&1 && { ok=1; break; }
  say "  sanity attempt $i timed out; retrying"
done
[ "$ok" = 1 ] || { say "relay dead after 3 attempts; aborting"; exit 1; }

say "step 1: bench.py infer headline (bf16)"
timeout 1800 python bench.py >> "$LOG" 2>&1

say "step 2: microbench_attn_k (K=128 packing)"
timeout 1800 python -u tools/microbench_attn_k.py >> "$LOG" 2>&1

say "step 3: microbench_augment --with_step"
timeout 1800 python -u tools/microbench_augment.py --with_step >> "$LOG" 2>&1

say "step 4: artifact serving cold-start A/B (the round-3/4 debt)"
timeout 5400 python -u tools/serve_coldstart_bench.py >> "$LOG" 2>&1

say "step 5: train production point — fused_assemble A/B (3 epochs each)"
for extra in "" "--fused_assemble"; do
  say "  train --cache_device $extra"
  rm -rf /tmp/r5_train_ab
  timeout 3000 python -u - <<EOF >> "$LOG" 2>&1
import sys, os
sys.path.insert(0, ".")
from aaclip_tpu.data.synthetic import make_synthetic_dataset
root = "/tmp/r5_train_ab"
data_root, meta_root = make_synthetic_dataset(root, img_px=518, n_normal=192, n_anomalous=0, class_names=("bottle",))
os.environ["AACLIP_DATA"] = data_root
os.environ["AACLIP_METADATA"] = meta_root
sys.argv = ["train.py", "--model_name", "ViT-L-14-336", "--img_size", "518",
            "--dataset", "MVTec", "--save_path", root + "/ckpt$extra",
            "--training_mode", "full_shot", "--text_epoch", "0",
            "--image_epoch", "3", "--image_batch_size", "32",
            "--grad_accum", "4", "--precision", "bf16",
            "--device_augment", "--cache_device"] + "$extra".split()
import train; train.main()
EOF
done

say "step 6: loss_fetch_every A/B (1 vs 8) at the production point"
for k in 1 8; do
  say "  loss_fetch_every $k"
  rm -rf "/tmp/r5_train_lf$k"  # a leftover checkpoint would resume past
                               # --image_epoch and train ZERO steps
  timeout 3000 python -u - <<EOF >> "$LOG" 2>&1
import sys, os
sys.path.insert(0, ".")
from aaclip_tpu.data.synthetic import make_synthetic_dataset
root = "/tmp/r5_train_lf$k"
data_root, meta_root = make_synthetic_dataset(root, img_px=518, n_normal=192, n_anomalous=0, class_names=("bottle",))
os.environ["AACLIP_DATA"] = data_root
os.environ["AACLIP_METADATA"] = meta_root
sys.argv = ["train.py", "--model_name", "ViT-L-14-336", "--img_size", "518",
            "--dataset", "MVTec", "--save_path", root + "/ckpt",
            "--training_mode", "full_shot", "--text_epoch", "0",
            "--image_epoch", "2", "--image_batch_size", "32",
            "--grad_accum", "4", "--precision", "bf16",
            "--device_augment", "--cache_device",
            "--loss_fetch_every", "$k"]
import train; train.main()
EOF
done

say "step 7: bench serve steady state (live engine)"
timeout 3600 python bench.py --mode serve --steps 60 >> "$LOG" 2>&1

say "step 8: serve HTTP encoding A/B (ViT-L)"
timeout 3600 python -u tools/serve_http_ab.py --seconds 20 \
  --startup_timeout 1200 >> "$LOG" 2>&1

say "step 9: mixed-int8 isolated bench (int8_until 18)"
timeout 1800 python bench.py --precision int8 --int8_until 18 >> "$LOG" 2>&1
timeout 1800 python bench.py --precision int8 >> "$LOG" 2>&1

say "step 10: mixed-int8 task gate (precision_ab --hard)"
timeout 3600 python -u tools/precision_ab.py --hard --baseline bf16 \
  --candidate int8 --candidate_int8_until 18 --n_classes 4 \
  --n_normal 32 --n_anomalous 32 >> "$LOG" 2>&1

say "step 11: few-shot soak with memory bank (2-shot)"
timeout 3600 python -u tools/few_shot_soak.py --shots 2 --text_epoch 1 \
  --image_epoch 1 --memory_bank >> "$LOG" 2>&1

say "DONE"
