"""Unit tests for tools/demo_eval.py helpers (the variance section's
aggregation and the section-name validation contract)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import demo_eval  # noqa: E402


def test_aggregate_tables():
    t1 = {"none": {"wm_prob": 0.9, "bit_accuracy": 0.8}}
    t2 = {"none": {"wm_prob": 0.7, "bit_accuracy": 0.9}}
    agg = demo_eval.aggregate_tables([t1, t2])
    row = agg["none"]["wm_prob"]
    assert row["mean"] == 0.8 and row["min"] == 0.7 and row["max"] == 0.9
    assert abs(row["std"] - 0.1) < 1e-9
    assert agg["none"]["bit_accuracy"]["mean"] == 0.85


def test_unknown_section_fails_loudly():
    # ADVICE.md round-2 finding: typo'd section names must error, not
    # silently produce a partial evaluation
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(demo_eval.__file__), "demo_eval.py"),
         "--ckpt", "/nonexistent", "--sections", "robustness"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
