#!/bin/bash
# r5_run: round-5 TPU queue — diagnose the E2_balance replication failure,
# then land the flagship decode checkpoint (VERDICT r4 items 1/3/6).
#
# Background (VERDICT r4 weak #1): the cur3 arc's D2_budget (blT replica)
# went 0.65->0.636 where blT went 0.66->0.76, and E2_balance (blB replica)
# landed 0.665 with 5 live bits where blB revived all 16 (0.85).  The
# training/loss code is UNCHANGED since blB (git diff 0a3ae9c..HEAD on
# losses.py is empty); what changed between the successful bl arc and cur3
# is the ENVIRONMENT, both from commit 60f52d9 (after blB):
#   (a) --music-frac 0.15 synthetic-music mix (bl arc: speech-only),
#   (b) the resample attack: new Kaiser-polyphase impl at 3 rates
#       8000,11025,22050 (bl arc: old 65-tap FIR impl, 8000 only).
# Early-leg convergence is NOT the difference (B_dilated dec 0.558 vs
# blP2 0.522-0.554 — comparable).
#
# Probe matrix (12 epochs each, from committed evidence ckpts):
#   P1_blenv  from E2_balance: balance 1.0, bl environment (music 0,
#             resample 8000 only)          -> tests the env hypothesis
#   P2_bal2   from E2_balance: balance 2.0, cur3 environment
#             -> tests "stronger balance overcomes"
#   P3_relax  from C_robust: balance 1.0 at the RELAXED budget (loud=3),
#             cur3 environment             -> tests balance-before-budget
# blB's signature is visible within 12 epochs (balanced dec fell
# monotonically 0.62->0.43 from epoch 1), so short probes are decisive.
# Winner = highest per-bit aggregate ml accuracy (tools/bit_diagnostic).
# Then: continue the winner long, (budget step if P3 won,) tighten to
# loud=8 with balance held (blF3 schedule, patience is load-bearing),
# full demo_eval on the endpoint, and shapecap if time remains.
#
# ADVICE r4 fixes baked in: bit diagnostics write per_bit.txt.tmp and mv
# on completion; every diag is wait-ed before the commit that should carry
# it; the script ends with wait + a straggler-diagnostics commit.  A
# global deadline (R5_DEADLINE, epoch secs) gates every leg start and
# bounds each trainer's timeout so the round-end bench never contends
# with a live trainer.
set -e
cd /root/repo
mkdir -p runs/r5 evidence/r5
LOG=runs/r5.log
: "${R5_DEADLINE:=$(( $(date +%s) + 23400 ))}"   # default: 6.5 h from launch
echo "r5_run: deadline $(date -d @"$R5_DEADLINE" '+%H:%M' 2>/dev/null || echo "$R5_DEADLINE")"

# single-tenant chip: wait (detection only, never kill) for foreign trainers
while pgrep -f "python -m awm_tpu" >/dev/null 2>&1; do sleep 30; done

COMMON="--synthetic-n 24576 --batch-size 128 --message-encoding bits \
 --dec-loss mean --delta-band-hz 3000 --decode-head dilated \
 --patience 99 --select-metric loc,dec"
ATTACKS="--augment --attack-prob 0.45 --noise-snr 10,40 --lowpass-hz 3500,5000,7000"
BLENV="--music-frac 0.0 --resample-hz 8000"
CURENV="--music-frac 0.15 --resample-hz 8000,11025,22050"
W3="--loss-weights dec=10,loud=3,mel=1"
W6="--loss-weights dec=10,loud=6,mel=1.5"
W8="--loss-weights dec=10,loud=8,mel=1.75"

declare -A DIAG_PID
bitdiag_bg() { # ckpt out_txt — per-bit profile on CPU; tmp lives under runs/
    # (NOT in evidence/, so a later `git add evidence/r5` can never stage a
    # half-written diagnostic — ADVICE r4 medium), mv on completion
    local ckpt=$1 out=$2 tmp
    tmp=runs/r5/diag_$(basename "$(dirname "$out")").tmp
    ( timeout 2400 python tools/bit_diagnostic.py --platform cpu \
        --ckpt "$ckpt" > "$tmp" 2>/dev/null && mv "$tmp" "$out" ) &
    DIAG_PID[$out]=$!
}
diag_wait() { # out_txt — block until that diagnostic has landed
    local pid=${DIAG_PID[$1]:-}
    [ -n "$pid" ] && wait "$pid" 2>/dev/null || true
}

secs_left() { echo $(( R5_DEADLINE - $(date +%s) )); }

run_leg() { # name epochs init_ckpt need_secs extra-flags...
    local name=$1 epochs=$2 init=$3 need=$4; shift 4
    local dir=runs/r5/$name ev=evidence/r5/$name
    if [ -f "$ev/.done" ]; then
        echo "r5_run: $name already committed, skipping"; return 0
    fi
    if [ "$(secs_left)" -lt "$need" ]; then
        echo "r5_run: $name skipped — $(secs_left)s left < ${need}s needed"
        return 1
    fi
    mkdir -p "$dir" "$ev"
    local tmo=$(( $(secs_left) - 900 )); [ "$tmo" -gt 14400 ] && tmo=14400
    echo "r5_run: $name starting ($epochs epochs, timeout ${tmo}s)"
    timeout "$tmo" python -m awm_tpu train $COMMON $ATTACKS "$@" \
        --epochs "$epochs" --init-from "$init" \
        --ckpt-dir "$dir" --log-csv "$dir/metrics.csv" \
        >> "$LOG" 2>&1 || echo "r5_run: $name trainer exited nonzero (timeout?)"
    [ -d "$dir/ckpt_best" ] || { echo "r5_run: $name produced no ckpt"; return 1; }
    cp "$dir/metrics.csv" "$ev/" 2>/dev/null || true
    rm -rf "$ev/ckpt_best.tmp"
    if cp -r "$dir/ckpt_best" "$ev/ckpt_best.tmp"; then
        rm -rf "$ev/ckpt_best"; mv "$ev/ckpt_best.tmp" "$ev/ckpt_best"
    else
        echo "r5_run: $name ckpt copy FAILED" >&2; return 1
    fi
    bitdiag_bg "$ev/ckpt_best" "$ev/per_bit.txt"
    touch "$ev/.done"
    git add evidence/r5 >/dev/null 2>&1 || true
    git commit -q -m "r5 diagnosis/flagship arc: leg $name complete" || true
    echo "r5_run: $name committed"
}

# --- Phase 1: probe matrix ---------------------------------------------------
E2=evidence/cur3/E2_balance/ckpt_best
C=evidence/cur3/C_robust/ckpt_best
run_leg P1_blenv 12 "$E2" 4200 $BLENV  $W6 --dec-bit-balance 1.0 || true
run_leg P2_bal2  12 "$E2" 4200 $CURENV $W6 --dec-bit-balance 2.0 || true
run_leg P3_relax 12 "$C"  4200 $CURENV $W3 --dec-bit-balance 1.0 || true

# --- Phase 2: pick the winner ------------------------------------------------
for p in P1_blenv P2_bal2 P3_relax; do diag_wait "evidence/r5/$p/per_bit.txt"; done
python - <<'EOF' > evidence/r5/winner.json
import json, os
best, rows = None, {}
for p in ("P1_blenv", "P2_bal2", "P3_relax"):
    f = f"evidence/r5/{p}/per_bit.txt"
    if not os.path.isfile(f):
        continue
    line = [l for l in open(f) if l.startswith("{")]
    if not line:
        continue
    d = json.loads(line[-1])
    agg = sum(d["ml_acc"]) / len(d["ml_acc"])
    live = sum(a > 0.7 for a in d["ml_acc"])
    rows[p] = {"agg_ml": round(agg, 4), "live_bits": live}
    if best is None or (agg, live) > (rows[best]["agg_ml"], rows[best]["live_bits"]):
        best = p
print(json.dumps({"winner": best, "probes": rows}, indent=1))
EOF
git add evidence/r5 >/dev/null 2>&1 || true
git commit -q -m "r5 probe matrix: winner selection" || true
WINNER=$(python -c "import json; print(json.load(open('evidence/r5/winner.json'))['winner'])")
echo "r5_run: winner = $WINNER"

# --- Phase 3/4: winner continuation -> flagship tighten ----------------------
case "$WINNER" in
  P3_relax)
    run_leg L_relax  24 evidence/r5/P3_relax/ckpt_best 2400 $CURENV $W3 --dec-bit-balance 1.0 || true
    run_leg M_budget 16 evidence/r5/L_relax/ckpt_best  2400 $CURENV $W6 --dec-bit-balance 1.0 || true
    run_leg T_flagship 28 evidence/r5/M_budget/ckpt_best 2400 $CURENV $W8 --dec-bit-balance 1.0 || true
    ;;
  P2_bal2)
    run_leg L_long   26 evidence/r5/P2_bal2/ckpt_best  2400 $CURENV $W6 --dec-bit-balance 2.0 || true
    run_leg T_flagship 36 evidence/r5/L_long/ckpt_best 2400 $CURENV $W8 --dec-bit-balance 2.0 || true
    ;;
  *)  # P1_blenv (default)
    run_leg L_long   26 evidence/r5/P1_blenv/ckpt_best 2400 $BLENV $W6 --dec-bit-balance 1.0 || true
    run_leg T_flagship 36 evidence/r5/L_long/ckpt_best 2400 $BLENV $W8 --dec-bit-balance 1.0 || true
    ;;
esac

# --- Phase 5: full eval on the flagship --------------------------------------
FLAG=""
for c in runs/r5/T_flagship/ckpt_best runs/r5/M_budget/ckpt_best \
         runs/r5/L_long/ckpt_best runs/r5/L_relax/ckpt_best; do
    [ -d "$c" ] && { FLAG=$c; break; }
done
if [ -n "$FLAG" ] && [ ! -f evidence/r5/flagship/.done ]; then
    mkdir -p evidence/r5/flagship
    echo "r5_run: demo_eval on $FLAG"
    timeout 3600 python tools/demo_eval.py --ckpt "$FLAG" \
        --sections quality,robust,ecc,music,cross,variance \
        > evidence/r5/flagship/demo_eval.json \
        2> evidence/r5/flagship/demo_eval.err || true
    echo "{\"ckpt\": \"$FLAG\"}" > evidence/r5/flagship/which.json
    touch evidence/r5/flagship/.done
    git add evidence/r5 >/dev/null 2>&1 || true
    git commit -q -m "r5 flagship: full demo_eval (quality/robust/ecc/music/cross/variance)" || true
fi

# --- Phase 6 (time permitting): shapecap from the flagship -------------------
if [ -n "$FLAG" ]; then
    WENV=$CURENV; [ "$WINNER" = "P1_blenv" ] && WENV=$BLENV
    run_leg shapecap 16 "$FLAG" 4200 $WENV $W8 --dec-bit-balance 1.0 \
        --shape-max-rms 0.010 || true
fi

# --- straggler diagnostics (ADVICE r4 low #2) --------------------------------
wait
git add evidence/r5 >/dev/null 2>&1 || true
git commit -q -m "r5: straggler per-bit diagnostics" || true
echo R5_RUN_DONE
