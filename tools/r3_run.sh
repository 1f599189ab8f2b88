#!/bin/bash
# r3_run: the round-3 flagship arc as a crash-proof driver.
#
# HISTORICAL (round 4+): superseded by tools/r4_run.sh.  The fused
# D/E/F_tighten legs this driver ran wedged decode in winner-take-all
# collapse (evidence/cur3/D_tighten, E_tighten per_bit.txt); the recipe
# now uses the split budget-then-balance order (D2_budget..H2_tighten),
# so the leg names below no longer exist in `curriculum robust_decode`.
#
# Round 3's first VM restart wiped runs/ (gitignored) and with it every
# checkpoint of the arc3/arc3b legs — ~8 h of TPU time.  This driver runs
# the ONE canonical recipe (`awm_tpu curriculum robust_decode`) leg by leg
# via --stop-after, and after each leg snapshots metrics + demo_eval into
# evidence/cur3/ and COMMITS, so any future restart resumes from the last
# finished leg's committed evidence instead of zero.
#
# Expected arc (round-2/3 measured history, CLAUDE.md):
#   A_shared   clean, shared head          -> decode trains (dec BCE falls)
#   B_dilated  +dilated head fresh         -> clean decode ~0.87
#   C_robust   10-attack curriculum        -> 10/10 detect, decode 0.62-0.66
#   D_tighten  loud=6  + bit-balance       -> decode ~0.85, all bits live
#   E_tighten  loud=8, patient             -> decode ~0.93 (blF3 point)
#   F_tighten  loud=10                     -> imperceptibility push (new)
set -e
cd /root/repo
OUT=runs/cur3
LOG=runs/cur3.log
mkdir -p "$OUT" evidence/cur3

run_leg() { # leg sections
    local leg=$1 sections=$2
    if [ -f "evidence/cur3/$leg/.done" ]; then
        echo "r3_run: $leg already committed, skipping"
        return 0
    fi
    python -m awm_tpu curriculum robust_decode --out "$OUT" \
        --stop-after "$leg" >> "$LOG" 2>&1
    mkdir -p "evidence/cur3/$leg"
    cp "$OUT/$leg/metrics.csv" "evidence/cur3/$leg/" 2>/dev/null || true
    # copy-to-tmp + mv (ADVICE r3: never rm the committed ckpt before the
    # replacement copy is known-good); .done only on success
    rm -rf "evidence/cur3/$leg/ckpt_best.tmp"
    if cp -r "$OUT/$leg/ckpt_best" "evidence/cur3/$leg/ckpt_best.tmp"; then
        rm -rf "evidence/cur3/$leg/ckpt_best"
        mv "evidence/cur3/$leg/ckpt_best.tmp" "evidence/cur3/$leg/ckpt_best"
    else
        echo "r3_run: $leg ckpt copy FAILED, leg left un-done" >&2
        return 1
    fi
    if [ -n "$sections" ]; then
        python tools/demo_eval.py --ckpt "$OUT/$leg/ckpt_best" \
            --sections "$sections" \
            > "evidence/cur3/$leg/demo_eval.json" \
            2> "evidence/cur3/$leg/demo_eval.err" || true
    fi
    touch "evidence/cur3/$leg/.done"
    git add evidence/cur3 runs/cur3.log 2>/dev/null || true
    git add evidence/cur3
    git commit -q -m "cur3 flagship arc: leg $leg complete" || true
    echo "r3_run: $leg committed"
}

run_leg A_shared  ""
run_leg B_dilated ""
run_leg C_robust  "quality,robust"
run_leg D_tighten "quality,robust,variance"
run_leg E_tighten "quality,robust,ecc,music,cross,variance"
run_leg F_tighten "quality,robust,ecc,music,cross,variance"
echo R3_RUN_DONE
