"""Benchmark: 1-s clips/sec/chip — fused embed+detect (the BASELINE.json
north-star metric) plus full training-step throughput.

Baselines (BASELINE.md, executed reference notebook outputs):
- validation (embed+detect, no grad): 17.1-17.4 it/s @ B=16 ~= 278 clips/s
- training (gen fwd+bwd + det on 2B + 5 losses + Adam): 4.6-4.95 it/s
  @ B=16 ~= 74-79 clips/s -> 76.5 midpoint

Prints ONE JSON line.  The primary metric keys ("metric"/"value"/"unit"/
"vs_baseline") carry embed+detect; the training number rides along as
"train_clips_per_sec_per_chip" / "train_vs_baseline" in the same object.

Timing note: through the axon tunnel, block_until_ready on a remote buffer
can return before the chained steps finish — fetching a scalar to host
(float(...)) is the reliable fence, used for both loops below.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_CLIPS_PER_SEC = 278.0  # BASELINE.md main14 validation rate
REF_TRAIN_CLIPS_PER_SEC = 76.5  # BASELINE.md main14 train rate midpoint


def _bench_inference(cfg, gen, det, state) -> "tuple[float, float]":
    """Returns (embed+detect clips/s, detect-only clips/s) at B=512 — the
    measured sweet spot (PERF.md sweep: 256 -> 4638, 512 -> 4786, 1024 ->
    4755 pre-unroll).  One batch shape only: every extra shape is another
    remote compile with minutes-wide latency variance."""
    from awm_tpu.api import InferenceSession

    sess = InferenceSession.from_state(cfg, gen, det, state)
    rng = np.random.default_rng(0)
    t = np.arange(cfg.audio_len) / cfg.sample_rate
    batch, n_iter = 512, 12

    clips = np.stack(
        [
            0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(cfg.audio_len)
            for f in np.linspace(150, 450, batch)
        ]
    ).astype(np.float32)
    cj = jax.device_put(jnp.asarray(clips))
    mj = jax.device_put(jnp.arange(batch, dtype=jnp.int32))
    lj = jax.device_put(jnp.full((batch,), cfg.audio_len, jnp.int32))

    out = sess._embed_detect(cj, mj, lj)  # compile
    float(out["wm_prob"][0])
    # steady-state: data stays device-resident (streaming pipelines keep
    # H2D off the critical path; the tunnel H2D here is an artifact of
    # the benchmarking harness, not the serving design)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = sess._embed_detect(cj, mj, lj)
    float(out["wm_prob"][0])  # host fence
    fused = batch * n_iter / (time.perf_counter() - t0)

    # detect-only (the dominant serving op: verify arbitrary content)
    out = sess._detect_reduced(cj, lj)
    float(out[3][0])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = sess._detect_reduced(cj, lj)
    float(out[3][0])
    detect = batch * n_iter / (time.perf_counter() - t0)
    return fused, detect


def _bench_train(cfg, gen, det, state) -> float:
    """Full train-step throughput (gen fwd+bwd, det on 2B, 5 losses, Adam)
    at the measured single-chip sweet spot B=128, bf16 mixed precision."""
    from awm_tpu import train as tr

    batch = 128
    tx = tr.make_optimizer(cfg)
    rng = np.random.default_rng(1)
    b = jax.device_put(
        jnp.asarray((0.3 * rng.standard_normal((batch, cfg.audio_len))).astype(np.float32))
    )
    key = jax.random.key(2)
    state, terms = tr.train_step(cfg, gen, det, tx, state, b, key)  # compile
    float(terms["total"])
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, terms = tr.train_step(cfg, gen, det, tx, state, b, key)
    float(terms["total"])  # host fence
    dt = (time.perf_counter() - t0) / n_iter
    return batch / dt


def _wait_for_exclusive_chip(max_wait_s: float = 2700.0) -> None:
    """Block (bounded) while any other awm_tpu process is alive.

    The chip is single-tenant; benchmarking next to a live trainer measures
    contention, not the framework (BENCH_r04's detect-only read 18.7k vs the
    27.0k it re-measures clean — the r4 'regression' was exactly this).
    Detection only, via /proc cmdline scan: never kills anything."""
    import os
    import sys

    me = os.getpid()
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        busy = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ")
            except OSError:
                continue
            if b"awm_tpu" in cmd and b"bench.py" not in cmd:
                busy.append(pid)
        if not busy:
            return
        print(f"bench: waiting for awm_tpu process(es) {busy} to release the "
              f"chip ({int(deadline - time.time())}s left)", file=sys.stderr)
        time.sleep(30)
    print("bench: proceeding despite a live awm_tpu process — numbers may "
          "reflect chip contention", file=sys.stderr)


def main():
    from awm_tpu.config import get_config
    from awm_tpu import train as tr

    _wait_for_exclusive_chip()

    cfg = get_config("base")  # bf16 mixed-precision training by default
    state, gen, det = tr.init_state(cfg, jax.random.key(0))

    infer, detect = _bench_inference(cfg, gen, det, state)
    train = _bench_train(cfg, gen, det, state)

    print(
        json.dumps(
            {
                "metric": "embed_detect_clips_per_sec_per_chip",
                "value": round(infer, 1),
                "unit": "1s-16kHz clips/s",
                "vs_baseline": round(infer / REF_CLIPS_PER_SEC, 2),
                "train_clips_per_sec_per_chip": round(train, 1),
                "train_vs_baseline": round(train / REF_TRAIN_CLIPS_PER_SEC, 2),
                "detect_only_clips_per_sec_per_chip": round(detect, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
