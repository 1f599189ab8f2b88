#!/bin/bash
# arc3: round-3 rebuild of the band-limited decode+robustness arc, compressed
# from round 2's 7 legs to 4 using everything measured there (DEMO.md
# "Band-limited carrier"):
#   - --dec-bit-balance 1.0 held on from epoch 0 of every leg (blB showed it
#     revives dead bit channels; blS2a showed it does NOT wedge a clean
#     scratch leg) instead of a separate balance leg,
#   - staged heads kept (shared -> +dilated fresh; the co-train wedge is
#     structural — capB/C/D, and blS2's 0.61 ceiling reconfirmed it),
#   - blT's intermediate tighten leg folded into one patient tighten at the
#     blF3 budget (loud=8, mel=1.75, patience 99),
# plus the two round-3 curriculum axes from VERDICT.md:
#   - --music-frac 0.15: tonal clips in the training mix (item 3),
#   - --resample-hz 8000,11025,22050: arbitrary-ratio resample attacks via
#     the polyphase resampler (item 5).
set -e
cd /root/repo
COMMON="--synthetic-n 24576 --batch-size 128 --message-encoding bits --dec-loss mean --delta-band-hz 3000 --dec-bit-balance 1.0 --music-frac 0.15"
ROBUST="--augment --attack-prob 0.45 --noise-snr 10,40 --lowpass-hz 3500,5000,7000 --resample-hz 8000,11025,22050"

mkdir -p runs/arcA runs/arcB runs/arcC runs/arcD

# leg A: clean scratch, SHARED decode head, relaxed budget (the blP1 leg)
if [ ! -e runs/arcA/.done ]; then
python -m awm_tpu train $COMMON --epochs 22 --patience 6 \
    --loss-weights dec=10,loud=3,mel=1 --select-metric dec \
    --ckpt-dir runs/arcA --log-csv runs/arcA/metrics.csv \
    > runs/arcA/train.log 2>&1
touch runs/arcA/.done
fi

# leg B: dilated head added FRESH (restore_params keeps init for the new
# leaves), same budget (the blP2 leg)
if [ ! -e runs/arcB/.done ]; then
python -m awm_tpu train $COMMON --decode-head dilated --epochs 18 --patience 6 \
    --loss-weights dec=10,loud=3,mel=1 --select-metric dec \
    --init-from runs/arcA/ckpt_best \
    --ckpt-dir runs/arcB --log-csv runs/arcB/metrics.csv \
    > runs/arcB/train.log 2>&1
touch runs/arcB/.done
fi

# leg C: robust curriculum, budget HELD (the blR2 leg, + the new resample
# rate curriculum)
if [ ! -e runs/arcC/.done ]; then
python -m awm_tpu train $COMMON --decode-head dilated --epochs 22 --patience 99 \
    --loss-weights dec=10,loud=3,mel=1 --select-metric loc,dec \
    $ROBUST \
    --init-from runs/arcB/ckpt_best \
    --ckpt-dir runs/arcC --log-csv runs/arcC/metrics.csv \
    > runs/arcC/train.log 2>&1
touch runs/arcC/.done
python tools/demo_eval.py --ckpt runs/arcC/ckpt_best \
    > runs/arcC/demo_eval.json 2> runs/arcC/demo_eval.err || true
fi

# leg D: patient tighten at the blF3 budget, attacks held
if [ ! -e runs/arcD/.done ]; then
python -m awm_tpu train $COMMON --decode-head dilated --epochs 34 --patience 99 \
    --loss-weights dec=10,loud=8,mel=1.75 --select-metric loc,dec \
    $ROBUST \
    --init-from runs/arcC/ckpt_best \
    --ckpt-dir runs/arcD --log-csv runs/arcD/metrics.csv \
    > runs/arcD/train.log 2>&1
touch runs/arcD/.done
python tools/demo_eval.py --ckpt runs/arcD/ckpt_best \
    --sections quality,robust,variance,ecc,music,cross \
    > runs/arcD/demo_eval.json 2> runs/arcD/demo_eval.err || true
fi
echo ARC3_DONE
