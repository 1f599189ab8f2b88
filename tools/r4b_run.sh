#!/bin/bash
# HISTORICAL (round 5+): superseded by tools/r5_run.sh after the D2/E2 legs
# failed to replicate the blT/blB targets (VERDICT r4 weak #1; diagnosis and
# corrected arc live in r5_run.sh).  Known flaw kept for the record: the
# backgrounded bit_diagnostic raced the leg commit, so per_bit.txt could be
# committed empty (ADVICE r4 medium — fixed in r5_run's tmp+mv+wait scheme).
#
# r4b_run: the rebalanced round-4 TPU queue (supersedes tools/r4_run.sh).
#
# Same crash-proof structure (each leg commits metrics + ckpt_best +
# evals into evidence/ before the next starts; every step idempotent),
# with the queue reordered so the items VERDICT r3 explicitly demanded
# land BEFORE the stretch imperceptibility legs:
#
#   D2_budget   loud=6, NO balance          (blT replica: 0.66 -> ~0.76)
#   E2_balance  loud=6 + balance            (blB replica: -> ~0.85, 16 live)
#   F2_tighten  loud=8, patient 40          (blF3 replica: -> ~0.93) + FULL eval
#   shapecap    hard --shape-max-rms 0.010 from F2   (VERDICT item 4)
#   cur_s1      seed-1 compressed recipe, half data  (VERDICT item 3)
#   G2_tighten  loud=10                     (imperceptibility push, VERDICT 2)
#   H2_tighten  loud=13 + loc=14            (stretch; next round if cut)
#
# vs r4_run: D2/E2 drop their TPU demo_evals (the per-bit CPU diagnostic
# carries the decode evidence for intermediate legs and now runs in the
# BACKGROUND so the TPU never idles); shapecap keys off F2 directly;
# cur_s1 runs at --synthetic-n 12288 to fit the wall clock (documented:
# seed AND budget both vary — it is recipe-region evidence, not a
# controlled seed ablation).
set -e
cd /root/repo
OUT=runs/cur3
LOG=runs/cur3.log
mkdir -p "$OUT" evidence/cur3
# The chip is single-tenant AND curriculum leg-skip decisions are made
# from .done markers BEFORE device acquisition — starting while an
# orphaned trainer is still mid-leg would re-train that leg.  Wait
# (detection only; never kill by pattern) until no foreign awm_tpu
# process is alive.
while pgrep -f "python -m awm_tpu" >/dev/null 2>&1; do sleep 30; done
bash tools/r3_restore.sh || true

bitdiag_bg() { # ckpt out_txt — per-bit decode profile on CPU, backgrounded
    ( timeout 2400 python tools/bit_diagnostic.py --platform cpu \
        --ckpt "$1" > "$2" 2>/dev/null || true ) &
}

run_leg() { # leg sections   (curriculum legs continuing in runs/cur3)
    local leg=$1 sections=$2
    if [ -f "evidence/cur3/$leg/.done" ]; then
        echo "r4b_run: $leg already committed, skipping"
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
        echo "r4b_run: $leg ckpt copy FAILED, leg left un-done" >&2
        return 1
    fi
    if [ -n "$sections" ]; then
        python tools/demo_eval.py --ckpt "$OUT/$leg/ckpt_best" \
            --sections "$sections" \
            > "evidence/cur3/$leg/demo_eval.json" \
            2> "evidence/cur3/$leg/demo_eval.err" || true
    fi
    # per-bit decode profile (CPU, background: the collapse-vs-uniform
    # diagnostic; committed by whichever git add comes next)
    bitdiag_bg "evidence/cur3/$leg/ckpt_best" "evidence/cur3/$leg/per_bit.txt"
    touch "evidence/cur3/$leg/.done"
    git add evidence/cur3 2>/dev/null || true
    git commit -q -m "cur3 flagship arc: leg $leg complete" || true
    echo "r4b_run: $leg committed"
}

# --- 1. the corrected decode arc to the flagship point ----------------------
run_leg D2_budget  ""
run_leg E2_balance ""
run_leg F2_tighten "quality,robust,ecc,music,cross,variance"

# --- 2. hard-RMS-cap leg (from the F2 flagship point; VERDICT item 4) -------
FLAG=runs/cur3/F2_tighten/ckpt_best
if [ ! -f evidence/shapecap/.done ] && [ -d "$FLAG" ]; then
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
    bitdiag_bg evidence/shapecap/ckpt_best evidence/shapecap/per_bit.txt
    touch evidence/shapecap/.done
    git add evidence/shapecap evidence/cur3 && git commit -q -m "shapecap leg: hard RMS cap 0.010 fine-tune + eval" || true
    echo "r4b_run: shapecap committed"
fi

# --- 3. seed-1 compressed curriculum (VERDICT item 3) ------------------------
if [ ! -f evidence/cur_s1/.done ]; then
    mkdir -p runs/cur_s1 evidence/cur_s1
    python -m awm_tpu curriculum robust_decode --out runs/cur_s1 --seed 1 \
        --epochs-scale 0.35 --synthetic-n 12288 --stop-after F2_tighten \
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
    git add evidence/cur_s1 evidence/cur3 evidence/shapecap && git commit -q -m "seed-1 compressed curriculum: recipe-region stability evidence" || true
    echo "r4b_run: cur_s1 committed"
fi

# --- 4. imperceptibility push (VERDICT item 2; stretch) ----------------------
run_leg G2_tighten "quality,robust,ecc,music,cross,variance"
run_leg H2_tighten "quality,robust,variance"
echo R4B_RUN_DONE
