"""Batch-size sweep for the two headline throughput paths (real TPU).

Sweeps the fused embed+detect kernel and the full train step across batch
sizes, printing clips/s/chip for each point — the tuning companion to
bench.py (which pins the shipping sweet spots).  Optionally captures a
jax.profiler trace of the best train point.

Usage: python tools/bench_sweep.py [--infer 128,256,512,1024]
       [--train 64,128,256,512] [--trace-dir /tmp/trace]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_clips(n: int, audio_len: int, sample_rate: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(audio_len) / sample_rate
    return np.stack(
        [
            0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(audio_len)
            for f in np.linspace(150, 450, n)
        ]
    ).astype(np.float32)


def sweep_infer(cfg, gen, det, state, batches, n_iter=12):
    from awm_tpu.api import InferenceSession

    sess = InferenceSession.from_state(cfg, gen, det, state)
    rows = []
    for b in batches:
        clips = make_clips(b, cfg.audio_len, cfg.sample_rate)
        cj = jax.device_put(jnp.asarray(clips))
        mj = jax.device_put(jnp.arange(b, dtype=jnp.int32))
        lj = jax.device_put(jnp.full((b,), cfg.audio_len, jnp.int32))
        try:
            out = sess._embed_detect(cj, mj, lj)
            float(out["wm_prob"][0])
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = sess._embed_detect(cj, mj, lj)
            float(out["wm_prob"][0])
            dt = (time.perf_counter() - t0) / n_iter
            rows.append((b, b / dt))
            print(f"infer B={b:5d}: {b / dt:9.1f} clips/s")
        except Exception as e:  # OOM at the top of the sweep is expected
            print(f"infer B={b:5d}: FAILED ({type(e).__name__})")
            break
    return rows


def sweep_train(cfg, gen, det, state, batches, n_iter=15, trace_dir=None):
    from awm_tpu import train as tr

    tx = tr.make_optimizer(cfg)
    key = jax.random.key(2)
    rows = []
    for b in batches:
        clips = make_clips(b, cfg.audio_len, cfg.sample_rate)
        bj = jax.device_put(jnp.asarray(clips))
        try:
            st, terms = tr.train_step(cfg, gen, det, tx, state, bj, key)
            float(terms["total"])
            t0 = time.perf_counter()
            for _ in range(n_iter):
                st, terms = tr.train_step(cfg, gen, det, tx, st, bj, key)
            float(terms["total"])
            dt = (time.perf_counter() - t0) / n_iter
            rows.append((b, b / dt))
            print(f"train B={b:5d}: {b / dt:9.1f} clips/s")
        except Exception as e:
            print(f"train B={b:5d}: FAILED ({type(e).__name__})")
            break
    if trace_dir and rows:
        best_b = max(rows, key=lambda r: r[1])[0]
        clips = make_clips(best_b, cfg.audio_len, cfg.sample_rate)
        bj = jax.device_put(jnp.asarray(clips))
        st, terms = tr.train_step(cfg, gen, det, tx, state, bj, key)
        float(terms["total"])
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                st, terms = tr.train_step(cfg, gen, det, tx, st, bj, key)
            float(terms["total"])
        print(f"trace written to {trace_dir} (B={best_b})")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--infer", default="128,256,512,1024")
    ap.add_argument("--train", default="64,128,256,512")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--preset", default="base")
    args = ap.parse_args()

    from awm_tpu.config import get_config
    from awm_tpu import train as tr

    cfg = get_config(args.preset)
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    if args.infer:
        sweep_infer(cfg, gen, det, state, [int(x) for x in args.infer.split(",")])
    if args.train:
        sweep_train(
            cfg, gen, det, state, [int(x) for x in args.train.split(",")],
            trace_dir=args.trace_dir,
        )


if __name__ == "__main__":
    main()
