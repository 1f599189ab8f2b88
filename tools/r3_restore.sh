#!/bin/bash
# Seed runs/cur3 from committed evidence/cur3 snapshots after a VM restart.
#
# runs/ is gitignored and dies with the VM; evidence/cur3/<leg>/ carries
# each finished leg's metrics, demo_eval AND ckpt_best (2.2 MB orbax tree).
# Restoring ckpt_best + the .done marker makes `awm_tpu curriculum`'s
# skip-finished-legs logic resume the arc from the last committed leg.
set -e
cd /root/repo
for d in evidence/cur3/*/; do
    leg=$(basename "$d")
    [ -f "$d/.done" ] || continue
    [ -d "$d/ckpt_best" ] || continue
    if [ ! -f "runs/cur3/$leg/.done" ]; then
        mkdir -p "runs/cur3/$leg"
        cp -r "$d/ckpt_best" "runs/cur3/$leg/ckpt_best"
        touch "runs/cur3/$leg/.done"
        echo "restored $leg"
    fi
done
