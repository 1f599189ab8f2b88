"""Jointly-trained generator+detector: one jitted train step, one XLA graph.

The reference's hot loop (ref: py/main14.py:185-239) runs generator forward,
detector on the concatenated [watermarked; clean] 2B batch, five loss terms,
backward, and a single Adam step over both nets' parameters
(ref: py/main14.py:402), syncing .item() to host every batch.  Here the
entire step — message sampling, generator, delta shaping, channel sim,
detector, all loss terms, gradients, optimizer update — is ONE jitted
function; metrics stay on device and are fetched asynchronously.

Schedules: constant Adam lr (main14) or OneCycle cosine
(main14d, ref: py/main14d.py:496-507) via optax.cosine_onecycle_schedule.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from awm_tpu.config import Config
from awm_tpu.losses import total_loss
from awm_tpu.models import (
    build_models,
    decode_bits_majority,
    decode_bits_mean_logit,
    message_to_bits,
)
from awm_tpu.shaping import apply_channel, shape_delta


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # {'gen': ..., 'det': ...}
    batch_stats: Any  # {'gen': ..., 'det': ...}
    opt_state: Any


def compute_dtype_of(cfg: Config):
    """Map TrainConfig.compute_dtype to a module dtype (None = fp32)."""
    name = cfg.train.compute_dtype
    if name in (None, "float32", "fp32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unknown compute_dtype {name!r}")


def make_schedule(cfg: Config, steps_per_epoch: int = 1000):
    sch = cfg.train.schedule
    if sch.kind == "constant":
        return sch.lr
    if sch.kind == "onecycle":
        # optax's cosine_onecycle returns NaN for EVERY step when a phase
        # has zero length: pct_start outside (0, 1) always does, and
        # pct_start * total_steps < 1 rounds to it — smoke-sized runs then
        # train on NaN lr and never improve val.  Reject the former, clamp
        # total_steps so the warmup phase is always at least one step.
        if not 0.0 < sch.pct_start < 1.0:
            raise ValueError(
                f"onecycle pct_start must be in (0, 1), got {sch.pct_start}"
            )
        total_steps = steps_per_epoch * cfg.train.epochs
        min_steps = math.ceil(1.0 / min(sch.pct_start, 1.0 - sch.pct_start))
        total_steps = max(total_steps, min_steps, 2)
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=sch.max_lr,
            pct_start=sch.pct_start,
            div_factor=sch.div_factor,
            final_div_factor=sch.final_div_factor,
        )
    raise ValueError(f"unknown schedule {sch.kind!r}")


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    """Single Adam over gen+det params (ref: py/main14.py:402).

    cfg.train.freeze = "gen"|"det" zeroes that network's updates
    (optax.multi_transform with set_to_zero), so only the other net trains;
    train_step additionally pins the frozen net's batch stats."""
    tx = optax.adam(make_schedule(cfg, steps_per_epoch))
    frozen = cfg.train.freeze
    if frozen is None:
        return tx
    if frozen not in ("gen", "det"):
        raise ValueError(f"TrainConfig.freeze must be 'gen', 'det' or None, got {frozen!r}")
    labels = lambda params: {
        k: jax.tree.map(lambda _: "frozen" if k == frozen else "train", v)
        for k, v in params.items()
    }
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )


def init_state(
    cfg: Config, rng: jax.Array, steps_per_epoch: int = 1000
) -> Tuple[TrainState, Any, Any]:
    """Initialize params/batch_stats for both nets + optimizer state.

    Returns (state, generator_module, detector_module).
    """
    gen, det = build_models(cfg.model, dtype=compute_dtype_of(cfg))
    kg, kd = jax.random.split(rng)
    s = jnp.zeros((2, cfg.audio_len), jnp.float32)
    msg = jnp.zeros((2,), jnp.int32)
    gvars = gen.init(kg, s, msg)
    dvars = det.init(kd, s)
    params = {"gen": gvars["params"], "det": dvars["params"]}
    batch_stats = {
        "gen": gvars.get("batch_stats", {}),
        "det": dvars.get("batch_stats", {}),
    }
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return state, gen, det


def _forward(cfg, gen, det, params, batch_stats, s, message, *, train: bool, aug_key=None):
    """Shared generator->shaping->detector forward.  Returns
    (terms-ready tensors, new batch_stats)."""
    gkw = dict(mutable=["batch_stats"]) if train else {}
    gvars = {"params": params["gen"], "batch_stats": batch_stats["gen"]}
    if train:
        delta, gups = gen.apply(gvars, s, message, train=True, **gkw)
        new_gbs = gups["batch_stats"]
    else:
        delta = gen.apply(gvars, s, message, train=False)
        new_gbs = batch_stats["gen"]

    # DSP shaping, channel sim and every loss reduction run fp32 regardless
    # of the models' compute dtype (mixed-precision boundary)
    delta = shape_delta(delta.astype(jnp.float32), cfg.shaping, cfg.sample_rate)
    s_w = s + delta
    if cfg.shaping.clamp_watermarked:
        s_w = jnp.clip(s_w, -1.0, 1.0)
    s_w = apply_channel(s_w, cfg.shaping, cfg.sample_rate)

    combined = jnp.concatenate([s_w, s], axis=0)
    if cfg.augment is not None and aug_key is not None:
        # Attack BOTH halves of the detector batch.  Attacking only the
        # watermarked half (as main15c's postprocess does, ref: main15c.ipynb
        # cell 6) lets the detector use attack artifacts as the label cue —
        # measured: a lowpass-only-on-s_w curriculum drove the clean
        # false-positive rate under lowpass attacks to 1.0.
        from awm_tpu.augment import apply_augment

        combined = apply_augment(combined, aug_key, cfg.augment)
    dvars = {"params": params["det"], "batch_stats": batch_stats["det"]}
    if train:
        logits, dups = det.apply(dvars, combined, train=True, mutable=["batch_stats"])
        new_dbs = dups["batch_stats"]
    else:
        logits = det.apply(dvars, combined, train=False)
        new_dbs = batch_stats["det"]

    return delta, s_w, logits.astype(jnp.float32), {"gen": new_gbs, "det": new_dbs}


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "det", "tx"))
def train_step(
    cfg: Config,
    gen,
    det,
    tx,
    state: TrainState,
    s: jnp.ndarray,
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step on a (B, T) batch of clean clips."""
    b = s.shape[0]
    step_key = jax.random.fold_in(rng, state.step)
    msg_key, aug_key = jax.random.split(step_key)
    message = jax.random.randint(msg_key, (b,), 0, 2**cfg.message_bits, dtype=jnp.int32)

    def loss_fn(params):
        delta, s_w, logits, new_bs = _forward(
            cfg, gen, det, params, state.batch_stats, s, message, train=True,
            aug_key=aug_key,
        )
        terms = total_loss(
            cfg.loss,
            s=s,
            s_w=s_w,
            delta=delta,
            logits=logits,
            message=message,
            message_bits=cfg.message_bits,
        )
        return terms["total"], (terms, new_bs)

    (_, (terms, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if cfg.train.freeze is not None:
        # frozen net: BN statistics must not drift either — a frozen
        # generator must embed bit-identical watermarks throughout
        new_bs = dict(new_bs)
        new_bs[cfg.train.freeze] = state.batch_stats[cfg.train.freeze]
    new_state = TrainState(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt,
    )
    return new_state, terms


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "det"))
def eval_step(
    cfg: Config,
    gen,
    det,
    state: TrainState,
    s: jnp.ndarray,
    rng: jax.Array,
    aug_key: jax.Array | None = None,
) -> Dict[str, jnp.ndarray]:
    """Validation: same losses without grad, eval-mode BN
    (ref: py/main14.py:241-283).  Returns the per-term dict.

    When the run has an attack curriculum (cfg.augment) the trainer passes a
    deterministic ``aug_key`` so validation measures detection UNDER the
    curriculum's attacks — the clean-val loc/dec terms are already converged
    when a robustness fine-tune starts, so selecting on them freezes the run
    at epoch 0 (measured: runs/r2_ft4 clean-val select picked epoch 0 while
    the attacked detect-rate climbed 0.33→0.875 through epoch 8)."""
    b = s.shape[0]
    message = jax.random.randint(rng, (b,), 0, 2**cfg.message_bits, dtype=jnp.int32)
    delta, s_w, logits, _ = _forward(
        cfg, gen, det, state.params, state.batch_stats, s, message, train=False,
        aug_key=aug_key,
    )
    return total_loss(
        cfg.loss,
        s=s,
        s_w=s_w,
        delta=delta,
        logits=logits,
        message=message,
        message_bits=cfg.message_bits,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "gen", "det"))
def evaluate_step(
    cfg: Config,
    gen,
    det,
    state: TrainState,
    s: jnp.ndarray,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Quality metrics batch: detection probs for both halves, bit accuracy
    via per-timestep majority vote, delta RMS (ref: py/main14.py:289-340)."""
    b = s.shape[0]
    message = jax.random.randint(rng, (b,), 0, 2**cfg.message_bits, dtype=jnp.int32)
    delta, s_w, logits, _ = _forward(
        cfg, gen, det, state.params, state.batch_stats, s, message, train=False
    )
    detection_probs = jax.nn.sigmoid(logits[:, :, 0]).mean(axis=1)  # (2B,)
    decoded = decode_bits_majority(logits[:b, :, 1:])
    target_bits = message_to_bits(message, cfg.message_bits)
    bit_acc = (decoded == target_bits).astype(jnp.float32).mean(axis=1)
    # the detect_watermark rule (time-mean logit > 0, ref: py/main14.py:925-929)
    decoded_ml = decode_bits_mean_logit(logits[:b, :, 1:])
    bit_acc_ml = (decoded_ml == target_bits).astype(jnp.float32).mean(axis=1)
    return {
        "watermarked_prob": detection_probs[:b],
        "clean_prob": detection_probs[b:],
        "bit_accuracy": bit_acc,
        "bit_accuracy_mean_logit": bit_acc_ml,
        "delta_rms": jnp.sqrt(jnp.mean(jnp.square(delta), axis=1)),
    }


class EarlyStopping:
    """patience/min_delta early stop on total val loss
    (ref: py/main14.py:409-426)."""

    def __init__(self, patience: int = 3, min_delta: float = 0.001):
        self.patience = patience
        self.min_delta = min_delta
        self.best_loss = float("inf")
        self.counter = 0
        self.early_stop = False

    def step(self, val_loss: float) -> None:
        if self.best_loss - val_loss > self.min_delta:
            self.best_loss = val_loss
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
