#!/bin/bash
# Snapshot the flagship arc's live state into committed evidence.
#
# ckpt_best is updated by fit() every time the select metric improves, so
# committing it mid-leg means a VM wipe costs at most the training since
# the last improvement — not the whole arc (which is what round 3's first
# restart cost).  evidence/cur3/<leg>/.done is only written once the leg's
# runs/.done exists, so a restarted tools/r3_run.sh re-runs demo_eval only
# for genuinely unfinished legs.
set -e
cd /root/repo
changed=0
for d in runs/cur3/*/; do
    leg=$(basename "$d")
    [ -d "$d/ckpt_best" ] || continue
    mkdir -p "evidence/cur3/$leg"
    if ! diff -qr "$d/ckpt_best" "evidence/cur3/$leg/ckpt_best" >/dev/null 2>&1; then
        rm -rf "evidence/cur3/$leg/ckpt_best.tmp"
        cp -r "$d/ckpt_best" "evidence/cur3/$leg/ckpt_best.tmp"
        # the live trainer may replace ckpt_best mid-copy (orbax swap);
        # only promote the .tmp copy if the source is STILL identical to
        # it — otherwise skip this round and catch it on the next snapshot
        # (ADVICE r3: torn-checkpoint race)
        if diff -qr "$d/ckpt_best" "evidence/cur3/$leg/ckpt_best.tmp" >/dev/null 2>&1; then
            rm -rf "evidence/cur3/$leg/ckpt_best"
            mv "evidence/cur3/$leg/ckpt_best.tmp" "evidence/cur3/$leg/ckpt_best"
            changed=1
        else
            rm -rf "evidence/cur3/$leg/ckpt_best.tmp"
        fi
    fi
    cp "$d/metrics.csv" "evidence/cur3/$leg/" 2>/dev/null || true
    if [ -f "$d/.done" ] && [ ! -f "evidence/cur3/$leg/.done" ]; then
        touch "evidence/cur3/$leg/.done"
        changed=1
    fi
done
if [ "$changed" = 1 ] || ! git diff --quiet --stat -- evidence/cur3 2>/dev/null; then
    git add evidence/cur3 && git commit -q -m "cur3 snapshot: $(date -u +%H:%M) $(tail -1 runs/cur3/*/metrics.csv 2>/dev/null | tail -1 | cut -d, -f1 | sed 's/^/epoch /')" || true
fi
git log --oneline -1
