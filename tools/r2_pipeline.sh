#!/bin/bash
# Round-2 TPU run pipeline: after the base training finishes, evaluate it,
# run the main15c-style robustness fine-tune, evaluate that, then the
# strided-family ablation (main14b_2).  Designed to run unattended with
# all output under runs/.
set -u
cd /root/repo

BASE_PID=${1:-$(cat /tmp/train_base.pid 2>/dev/null || echo 0)}
if [ "$BASE_PID" != "0" ]; then
  while ps -p "$BASE_PID" > /dev/null 2>&1; do sleep 30; done
fi

mkdir -p runs/r2_ft runs/r2_strided

echo "== demo_eval base =="
python tools/demo_eval.py --ckpt runs/r2_base/ckpt_best \
  > runs/r2_base/demo_eval.json 2> runs/r2_base/demo_eval.log

echo "== fine-tune (robust curriculum) =="
python -m awm_tpu train --synthetic-n 24576 --batch-size 128 --epochs 15 \
  --augment --attack-prob 0.35 --lr 1e-4 \
  --init-from runs/r2_base/ckpt_best \
  --ckpt-dir runs/r2_ft --log-csv runs/r2_ft/metrics.csv \
  > runs/r2_ft/train.log 2>&1

echo "== demo_eval ft =="
python tools/demo_eval.py --ckpt runs/r2_ft/ckpt_best --sections quality,robust \
  > runs/r2_ft/demo_eval.json 2> runs/r2_ft/demo_eval.log

echo "== strided ablation (main14b_2) =="
python -m awm_tpu train --preset strided --synthetic-n 10240 --batch-size 128 \
  --epochs 15 --ckpt-dir runs/r2_strided --log-csv runs/r2_strided/metrics.csv \
  > runs/r2_strided/train.log 2>&1

echo "== demo_eval strided =="
python tools/demo_eval.py --ckpt runs/r2_strided/ckpt_best --preset strided \
  --synthetic-n 10240 --sections quality \
  > runs/r2_strided/demo_eval.json 2> runs/r2_strided/demo_eval.log

echo "pipeline done"
