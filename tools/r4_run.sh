#!/bin/bash
# HISTORICAL (round 5+): superseded by tools/r4b_run.sh (reordered queue,
# orphan-trainer wait) and then tools/r5_run.sh.  Do NOT run: it shares
# runs/cur3 + evidence/cur3 state with r4b under a DIFFERENT queue order
# and lacks the orphan-trainer wait, so running it alongside/after r4b
# risks a second process contending for the single-tenant chip (ADVICE r4).
#
# r4_run: the round-4 TPU queue, crash-proof in the r3_run style.
#
# Round-3's fused "tighten+balance" leg (cur3 D_tighten, and arc3b D2
# before it) wedged decode at ~0.64 in winner-take-all collapse (4 live /
# 12 dead bit channels — evidence/cur3/*/per_bit*.txt).  The measured
# blR2->blT->blB->blF3 micro-order (budget step WITHOUT balance, then
# balance AT THE HELD budget, then patient tighten) reached 0.93.  The
# recipe now encodes that order (awm_tpu/__main__.py _CURRICULA); this
# driver resumes the cur3 arc from the committed C_robust checkpoint:
#
#   D2_budget   loud=6, NO balance          (blT replica: 0.66 -> ~0.76)
#   E2_balance  loud=6 + balance            (blB replica: -> ~0.85, 16 live)
#   F2_tighten  loud=8, patient 40          (blF3 replica: -> ~0.93)
#   G2_tighten  loud=10                     (imperceptibility push, VERDICT 2)
#   H2_tighten  loud=13 + loc=14            (stretch)
#   shapecap    hard --shape-max-rms 0.010  (VERDICT item 4)
#   cur_s1      seed-1 compressed recipe    (VERDICT item 3)
#
# Each leg commits metrics + ckpt_best + demo_eval + per-bit diagnostic
# into evidence/ before the next starts, so a restart resumes from the
# last finished leg.
set -e
cd /root/repo
OUT=runs/cur3
LOG=runs/cur3.log
mkdir -p "$OUT" evidence/cur3
bash tools/r3_restore.sh || true

run_leg() { # leg sections   (curriculum legs continuing in runs/cur3)
    local leg=$1 sections=$2
    if [ -f "evidence/cur3/$leg/.done" ]; then
        echo "r4_run: $leg already committed, skipping"
        return 0
    fi
    python -m awm_tpu curriculum robust_decode --out "$OUT" \
        --stop-after "$leg" >> "$LOG" 2>&1
    mkdir -p "evidence/cur3/$leg"
    cp "$OUT/$leg/metrics.csv" "evidence/cur3/$leg/" 2>/dev/null || true
    # copy-to-tmp + verify + mv (ADVICE r3: never rm the committed ckpt
    # before the replacement copy is known-good), and .done only on success
    rm -rf "evidence/cur3/$leg/ckpt_best.tmp"
    if cp -r "$OUT/$leg/ckpt_best" "evidence/cur3/$leg/ckpt_best.tmp"; then
        rm -rf "evidence/cur3/$leg/ckpt_best"
        mv "evidence/cur3/$leg/ckpt_best.tmp" "evidence/cur3/$leg/ckpt_best"
    else
        echo "r4_run: $leg ckpt copy FAILED, leg left un-done" >&2
        return 1
    fi
    if [ -n "$sections" ]; then
        python tools/demo_eval.py --ckpt "$OUT/$leg/ckpt_best" \
            --sections "$sections" \
            > "evidence/cur3/$leg/demo_eval.json" \
            2> "evidence/cur3/$leg/demo_eval.err" || true
    fi
    # per-bit decode profile (CPU; the collapse-vs-uniform diagnostic)
    timeout 1800 python tools/bit_diagnostic.py --platform cpu \
        --ckpt "$OUT/$leg/ckpt_best" \
        > "evidence/cur3/$leg/per_bit.txt" 2>/dev/null || true
    touch "evidence/cur3/$leg/.done"
    git add evidence/cur3 2>/dev/null || true
    git commit -q -m "cur3 flagship arc: leg $leg complete" || true
    echo "r4_run: $leg committed"
}

# --- 1. the corrected decode arc + imperceptibility push --------------------
run_leg D2_budget  "quality,robust"
run_leg E2_balance "quality,robust"
run_leg F2_tighten "quality,robust,ecc,music,cross,variance"
run_leg G2_tighten "quality,robust,ecc,music,cross,variance"
run_leg H2_tighten "quality,robust,ecc,music,cross,variance"

# --- 2. hard-RMS-cap leg (from the flagship best) ---------------------------
FLAG=runs/cur3/H2_tighten/ckpt_best
[ -d "$FLAG" ] || FLAG=runs/cur3/G2_tighten/ckpt_best
[ -d "$FLAG" ] || FLAG=runs/cur3/F2_tighten/ckpt_best
if [ ! -f evidence/shapecap/.done ]; then
    mkdir -p runs/shapecap evidence/shapecap
    python -m awm_tpu train \
        --synthetic-n 24576 --batch-size 128 --music-frac 0.15 \
        --message-encoding bits --dec-loss mean --delta-band-hz 3000 \
        --decode-head dilated --epochs 16 --patience 99 \
        --dec-bit-balance 1.0 --shape-max-rms 0.010 \
        --loss-weights dec=10,loud=8,mel=1.75 --select-metric loc,dec \
        --augment --attack-prob 0.45 --noise-snr 10,40 \
        --lowpass-hz 3500,5000,7000 --resample-hz 8000,11025,22050 \
        --init-from "$FLAG" \
        --ckpt-dir runs/shapecap --log-csv runs/shapecap/metrics.csv \
        > runs/shapecap/train.log 2>&1
    cp runs/shapecap/metrics.csv evidence/shapecap/ 2>/dev/null || true
    rm -rf evidence/shapecap/ckpt_best.tmp
    if cp -r runs/shapecap/ckpt_best evidence/shapecap/ckpt_best.tmp; then
        rm -rf evidence/shapecap/ckpt_best
        mv evidence/shapecap/ckpt_best.tmp evidence/shapecap/ckpt_best
    fi
    python tools/demo_eval.py --ckpt runs/shapecap/ckpt_best \
        --sections quality,robust \
        > evidence/shapecap/demo_eval.json \
        2> evidence/shapecap/demo_eval.err || true
    touch evidence/shapecap/.done
    git add evidence/shapecap && git commit -q -m "shapecap leg: hard RMS cap 0.010 fine-tune + eval" || true
    echo "r4_run: shapecap committed"
fi

# --- 3. seed-1 compressed curriculum ----------------------------------------
if [ ! -f evidence/cur_s1/.done ]; then
    mkdir -p runs/cur_s1 evidence/cur_s1
    python -m awm_tpu curriculum robust_decode --out runs/cur_s1 --seed 1 \
        --epochs-scale 0.35 --stop-after F2_tighten \
        > runs/cur_s1.json 2> runs/cur_s1.err || true
    for leg in runs/cur_s1/*/; do
        cp "$leg/metrics.csv" "evidence/cur_s1/$(basename "$leg")_metrics.csv" 2>/dev/null || true
    done
    python tools/demo_eval.py --ckpt runs/cur_s1/F2_tighten/ckpt_best \
        --sections quality,robust \
        > evidence/cur_s1/demo_eval.json \
        2> evidence/cur_s1/demo_eval.err || true
    rm -rf evidence/cur_s1/ckpt_best.tmp
    if cp -r runs/cur_s1/F2_tighten/ckpt_best evidence/cur_s1/ckpt_best.tmp; then
        rm -rf evidence/cur_s1/ckpt_best
        mv evidence/cur_s1/ckpt_best.tmp evidence/cur_s1/ckpt_best
    fi
    touch evidence/cur_s1/.done
    git add evidence/cur_s1 && git commit -q -m "seed-1 compressed curriculum: recipe stability evidence" || true
    echo "r4_run: cur_s1 committed"
fi

echo R4_RUN_DONE
