#!/bin/bash
# blS2: the 2-leg minimal curriculum probe (round-2 open item).
#
# Question: can {clean scratch w/ balance} -> {robust w/ balance} replace
# the 5-leg staged curriculum (bl0 -> blP1 -> blP2 -> blR2 -> blB)?
#
# blS showed balance does NOT fix the attacks-from-scratch wedge, so a
# clean pretrain leg stays required.  blS2 asks whether that clean leg can
# train the FULL decode arch (bits + mean + dilated head) in one shot when
# the budget is relaxed (dec=10, loud=3, mel=1) and --dec-bit-balance is on
# from epoch 0 — i.e. whether the staged-head dance (shared head to
# convergence, THEN dilated fresh; capB/C/D wedged without it) was an
# artifact of the tight budget rather than a structural requirement.
#
# Leg 2 is the blR2 robust recipe with balance held on.
set -e
cd /root/repo
COMMON="--synthetic-n 24576 --batch-size 128 --message-encoding bits --dec-loss mean --delta-band-hz 3000 --decode-head dilated --dec-bit-balance 1.0"

mkdir -p runs/blS2a runs/blS2b

# leg 1: clean scratch, full decode arch, relaxed budget, balance on
if [ ! -e runs/blS2a/.done ]; then
python -m awm_tpu train $COMMON --epochs 30 --patience 8 \
    --loss-weights dec=10,loud=3,mel=1 --select-metric dec \
    --ckpt-dir runs/blS2a --log-csv runs/blS2a/metrics.csv \
    > runs/blS2a/train.log 2>&1
touch runs/blS2a/.done
fi

# leg 2: robust curriculum, budget HELD (the blR2 recipe), balance on
if [ ! -e runs/blS2b/.done ]; then
python -m awm_tpu train $COMMON --epochs 24 --patience 99 \
    --loss-weights dec=10,loud=3,mel=1 --select-metric loc,dec \
    --augment --attack-prob 0.45 --noise-snr 10,40 --lowpass-hz 3500,5000,7000 \
    --init-from runs/blS2a/ckpt_best \
    --ckpt-dir runs/blS2b --log-csv runs/blS2b/metrics.csv \
    > runs/blS2b/train.log 2>&1
touch runs/blS2b/.done
fi

# full default section set (quality,robust,ecc,music,cross) — the probe's
# point is the per-attack detection + decode table (ADVICE.md round-2 fix)
python tools/demo_eval.py --ckpt runs/blS2b/ckpt_best \
    > runs/blS2b/demo_eval.json 2> runs/blS2b/demo_eval.err
echo PIPELINE_DONE
