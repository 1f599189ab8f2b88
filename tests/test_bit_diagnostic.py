"""CLI smoke test for tools/bit_diagnostic.py — the per-bit decode
profiler that the round-4 arc driver (tools/r4_run.sh) captures per leg
as collapse-vs-uniform evidence (DEMO.md 'Band-limited carrier')."""

import dataclasses
import json
import os
import subprocess
import sys

import jax

from awm_tpu import checkpoint as ck
from awm_tpu import train as tr
from awm_tpu.config import get_config

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "bit_diagnostic.py")


def test_cli_smoke(tmp_path):
    cfg = dataclasses.replace(get_config("base"), audio_len=512)
    state, _, _ = tr.init_state(cfg, jax.random.key(0))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=1, best_val=1.0, model_cfg=cfg.model)

    r = subprocess.run(
        [sys.executable, TOOL, "--ckpt", p, "--platform", "cpu",
         "--audio-len", "512", "--synthetic-n", "128", "--n-eval", "8",
         "--batch-size", "8"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert r.returncode == 0, r.stderr
    tail = json.loads(r.stdout[r.stdout.rindex("{"):])
    bits = cfg.model.message_bits
    assert len(tail["vote_acc"]) == bits == len(tail["ml_acc"])
    assert tail["n_eval"] == 8 and tail["attack"] is None
    assert all(0.0 <= a <= 1.0 for a in tail["ml_acc"])
    # an attacked run exercises the default_attacks path end-to-end
    r = subprocess.run(
        [sys.executable, TOOL, "--ckpt", p, "--platform", "cpu",
         "--audio-len", "512", "--synthetic-n", "128", "--n-eval", "8",
         "--batch-size", "8", "--attack", "volume_0.5"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert r.returncode == 0, r.stderr
    tail = json.loads(r.stdout[r.stdout.rindex("{"):])
    assert tail["attack"] == "volume_0.5"
