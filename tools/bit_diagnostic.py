"""Per-bit-position decode diagnostic.

Answers one question about a checkpoint whose aggregate bit accuracy is
below ~1: are decode errors spread uniformly over the 16 bit positions
(carrier-SNR-limited — a budget/band problem), or concentrated in a few
dead channels (an architecture/head problem)?  The reference never asks
this (its decode collapsed to chance outright, BASELINE.md: 0.5009,
ref: py/main14.py:925-929 decode rule); this build's staged-head runs
sit at 0.66-0.93 so the error *shape* matters for the next experiment.

Usage:
    python tools/bit_diagnostic.py --ckpt runs/blR2/ckpt_best \
        [--platform cpu] [--n-eval 256] [--batch-size 128]

Prints a per-bit table (accuracy under both decode rules + mean |time-mean
logit| as a channel-strength proxy) and a JSON line for evidence capture.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--preset", default="base")
    ap.add_argument("--synthetic-n", type=int, default=24576)
    ap.add_argument("--n-eval", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--audio-len", type=int, default=None,
                    help="override chunk length in samples (tests use short "
                         "chunks; production checkpoints are 16000)")
    ap.add_argument("--attack", default=None,
                    help="apply a named channel attack to the watermarked "
                         "audio before detection (names from "
                         "eval.default_attacks, e.g. resample_8k) — shows "
                         "which bit channels survive that attack")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from awm_tpu import checkpoint as ck
    from awm_tpu import train as tr
    from awm_tpu.api import InferenceSession
    from awm_tpu.config import ModelConfig, get_config
    from awm_tpu.data import SyntheticClips, split_indices

    cfg = get_config(args.preset)
    if args.audio_len:
        cfg = dataclasses.replace(cfg, audio_len=args.audio_len)
    arch = ck.read_arch(args.ckpt)
    if arch is not None:
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        arch = {k: v for k, v in arch.items() if k in known}
        if "strides" in arch:
            arch["strides"] = tuple(arch["strides"])
        cfg = dataclasses.replace(cfg, model=ModelConfig(**arch))
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    state, _, _ = ck.restore_params(args.ckpt, state)
    sess = InferenceSession.from_state(cfg, gen, det, state)

    # same held-out test split as tools/demo_eval.py::_test_clips
    ds = SyntheticClips(n=args.synthetic_n, audio_len=cfg.audio_len)
    _, _, te_idx = split_indices(len(ds), (0.8, 0.1, 0.1), seed=cfg.train.seed)
    clips = np.stack([ds[i] for i in te_idx[: args.n_eval]])

    attack_fn = None
    if args.attack:
        from awm_tpu.eval import default_attacks

        table = default_attacks(cfg.sample_rate, seed=args.seed)
        if args.attack not in table:
            raise SystemExit(f"--attack must be one of {sorted(table)}")
        attack_fn = table[args.attack]

    bits = cfg.model.message_bits
    rng = np.random.default_rng(args.seed)
    vote_hits = np.zeros(bits)
    ml_hits = np.zeros(bits)
    abs_logit = np.zeros(bits)
    n = 0
    for i in range(0, len(clips), args.batch_size):
        s = clips[i : i + args.batch_size]
        msgs = rng.integers(0, 2**bits, size=len(s)).astype(np.int32)
        if attack_fn is None:
            out = sess.embed_detect(s, msgs)
            mlm, mvf = out["msg_logit_mean"], out["msg_vote_frac"]
        else:
            import jax.numpy as jnp

            wm = s + sess.embed_chunks(s, msgs)
            _, mlm, mvf, _ = sess.detect_summary(np.asarray(attack_fn(jnp.asarray(wm))))
        target = (msgs[:, None] & (1 << np.arange(bits))) > 0
        vote_hits += ((mvf > 0.5) == target).sum(axis=0)
        ml_hits += ((mlm > 0) == target).sum(axis=0)
        abs_logit += np.abs(mlm).sum(axis=0)
        n += len(s)

    vote_acc = vote_hits / n
    ml_acc = ml_hits / n
    strength = abs_logit / n
    print(f"{'bit':>3} {'vote_acc':>9} {'ml_acc':>8} {'|logit|':>8}")
    for b in range(bits):
        print(f"{b:>3} {vote_acc[b]:>9.4f} {ml_acc[b]:>8.4f} {strength[b]:>8.3f}")
    print(
        f"agg vote {vote_acc.mean():.4f}  ml {ml_acc.mean():.4f}  "
        f"ml min/max {ml_acc.min():.4f}/{ml_acc.max():.4f}  "
        f"std {ml_acc.std():.4f}"
    )
    print(json.dumps({
        "ckpt": args.ckpt,
        "attack": args.attack,
        "n_eval": n,
        "vote_acc": [round(float(v), 4) for v in vote_acc],
        "ml_acc": [round(float(v), 4) for v in ml_acc],
        "mean_abs_logit": [round(float(v), 3) for v in strength],
    }))


if __name__ == "__main__":
    main()
