#!/bin/bash
# Band-limited capstone pipeline (round-3 open item: resample@8k under
# decode pressure).  Rebuilds the proven staged-head decode curriculum
# (DEMO.md "Capstone") with --delta-band-hz 3000: the carrier is kept
# inside the resample@8k passband BY CONSTRUCTION, so the down-up trip
# cannot strip it.  Legs:
#   bl0  scratch clean pretrain, decode arch (bits + shared + mean dec)
#   bl1  shared-head hot dec leg (dec=5, select dec)
#   bl2  dilated head added FRESH (restore_params keeps init for new leaves)
#   blR  robust curriculum (capR3 recipe: dec=2, p=0.45, 10-40 dB,
#        lowpass cutoff curriculum) + resample@8k exposure (in --augment)
set -e
cd /root/repo
COMMON="--synthetic-n 24576 --batch-size 128 --message-encoding bits --dec-loss mean --delta-band-hz 3000"

mkdir -p runs/bl0 runs/bl1 runs/bl2 runs/blR

if [ ! -e runs/bl0/.done ]; then
python -m awm_tpu train $COMMON --epochs 30 --patience 99 \
    --ckpt-dir runs/bl0 --log-csv runs/bl0/metrics.csv \
    > runs/bl0/train.log 2>&1
touch runs/bl0/.done
fi

if [ ! -e runs/bl1/.done ]; then
python -m awm_tpu train $COMMON --epochs 40 --patience 8 \
    --loss-weights dec=5 --select-metric dec \
    --init-from runs/bl0/ckpt_best \
    --ckpt-dir runs/bl1 --log-csv runs/bl1/metrics.csv \
    > runs/bl1/train.log 2>&1
touch runs/bl1/.done
fi

if [ ! -e runs/bl2/.done ]; then
python -m awm_tpu train $COMMON --epochs 40 --patience 8 \
    --decode-head dilated --loss-weights dec=5 --select-metric dec \
    --init-from runs/bl1/ckpt_best \
    --ckpt-dir runs/bl2 --log-csv runs/bl2/metrics.csv \
    > runs/bl2/train.log 2>&1
touch runs/bl2/.done
fi

if [ ! -e runs/blR/.done ]; then
python -m awm_tpu train $COMMON --epochs 30 --patience 99 \
    --decode-head dilated --loss-weights dec=2 --select-metric loc,dec \
    --augment --attack-prob 0.45 --noise-snr 10,40 --lowpass-hz 3500,5000,7000 \
    --init-from runs/bl2/ckpt_best \
    --ckpt-dir runs/blR --log-csv runs/blR/metrics.csv \
    > runs/blR/train.log 2>&1
touch runs/blR/.done
fi

python tools/demo_eval.py --ckpt runs/blR/ckpt_best \
    > runs/blR/demo_eval_stdout.log 2>&1
echo PIPELINE_DONE
