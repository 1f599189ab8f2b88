"""Epoch-level training driver: the reference's script loops as one function.

Reproduces (SURVEY.md sections 2.2 / 3.4):
- epoch loop with per-term loss tables (ref: py/main15.py:190-308,468-470)
- mid-epoch quick-val every N steps (main14d, ref: py/main14d.py:266-279)
- best-model + resumable latest checkpoints, auto-resume
  (ref: py/main14d.py:540-623)
- early stopping (ref: py/main14.py:409-426)
- loss-curve PNGs (ref: py/main14d.py:629-641) + CSV metrics log
- optional data-parallel mesh: shard state/batches, same jitted step

The fine-tune flow (main15c) is fit() with the ft_robust preset and
init_from pointing at a previous run's best checkpoint
(ref: main15c.ipynb cells 14-15).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from awm_tpu import checkpoint as ck
from awm_tpu import train as tr
from awm_tpu.config import Config


class MetricsLogger:
    """CSV + stdout per-epoch metric log (structured replacement for the
    reference's print tables)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.rows: List[Dict] = []
        self._fieldnames: Optional[List[str]] = None

    def log(self, row: Dict) -> None:
        self.rows.append(row)
        if self.path:
            write_header = self._fieldnames is None
            if write_header:
                self._fieldnames = list(row)
                os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames)
                if write_header:
                    w.writeheader()
                w.writerow({k: row.get(k) for k in self._fieldnames})


def _mean_terms(term_list: List[Dict[str, float]]) -> Dict[str, float]:
    keys = term_list[0].keys()
    return {k: float(np.mean([t[k] for t in term_list])) for k in keys}


def _fetch(terms) -> Dict[str, float]:
    return {k: float(v) for k, v in terms.items()}


def fit(
    cfg: Config,
    train_batches: Iterable,
    val_batches,
    *,
    ckpt_dir: Optional[str] = None,
    epochs: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
    seed: int = 42,
    mesh=None,
    init_from: Optional[str] = None,
    log_path: Optional[str] = None,
    plot_path: Optional[str] = None,
    select_metric: Optional[str] = None,
    verbose: bool = True,
) -> Dict:
    """Train gen+det jointly.  train_batches: re-iterable of (B, T) arrays
    (e.g. awm_tpu.data.BatchLoader); val_batches: same or None.

    select_metric: comma-separated val loss-term keys (e.g. "loc,dec") whose
    SUM drives best-checkpoint selection and early stopping instead of the
    weighted total.  Robustness fine-tunes need this: an attack curriculum
    deliberately trades the converged quality terms for detection under
    attack, so total val loss bottoms out at epoch 0 while the detection
    terms are still improving (measured: runs/r2_ft2).  None = "total".

    Returns {state, gen, det, history, best_val, stopped_early}.
    """
    import contextlib

    with contextlib.ExitStack() as stack:
        if mesh is not None:
            # mesh context: lets mesh-aware ops (the shard_map-wrapped
            # Pallas LSTM, ops/pallas/lstm_fused_auto) see the mesh while
            # the step traces; all step calls share one trace context
            stack.enter_context(jax.sharding.set_mesh(mesh))
        return _fit(
            cfg, train_batches, val_batches, ckpt_dir=ckpt_dir, epochs=epochs,
            steps_per_epoch=steps_per_epoch, seed=seed, mesh=mesh,
            init_from=init_from, log_path=log_path, plot_path=plot_path,
            select_metric=select_metric, verbose=verbose,
        )


def _fit(
    cfg: Config,
    train_batches: Iterable,
    val_batches,
    *,
    ckpt_dir: Optional[str] = None,
    epochs: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
    seed: int = 42,
    mesh=None,
    init_from: Optional[str] = None,
    log_path: Optional[str] = None,
    plot_path: Optional[str] = None,
    select_metric: Optional[str] = None,
    verbose: bool = True,
) -> Dict:
    epochs = epochs if epochs is not None else cfg.train.epochs
    select_keys = [k.strip() for k in select_metric.split(",")] if select_metric else ["total"]
    from awm_tpu.losses import term_keys

    unknown = [k for k in select_keys if k not in term_keys(cfg.loss)]
    if unknown:  # fail BEFORE training: a typo'd key would otherwise make
        # val inf forever, never write ckpt_best, and early-stop the run
        raise ValueError(
            f"select_metric key(s) {unknown} not in loss terms {list(term_keys(cfg.loss))}"
        )
    rng = jax.random.key(seed)
    spe = steps_per_epoch or (len(train_batches) if hasattr(train_batches, "__len__") else 1000)

    state, gen, det = tr.init_state(cfg, rng, steps_per_epoch=spe)
    tx = tr.make_optimizer(cfg, steps_per_epoch=spe)

    if init_from:  # fine-tune entry (main15c): start from a previous best
        # params-only restore: the source run may have used a different
        # preset's optimizer (opt_state trees differ), and the opt_state is
        # reinitialized below anyway.  allow_missing: cross-architecture
        # warm-starts (e.g. --message-encoding bits from a table ckpt) keep
        # init values for new params — restore_params prints which
        state, _, _ = ck.restore_params(init_from, state, allow_missing=True)
        state = state.replace(step=jnp.zeros((), jnp.int32), opt_state=tx.init(state.params))

    start_epoch, best_val = 0, float("inf")
    if ckpt_dir:
        state, start_epoch, best_val, resumed = ck.maybe_resume(ckpt_dir, state)
        if resumed and verbose:
            print(f"resumed from {ck.latest_path(ckpt_dir)} (next epoch = {start_epoch})")

    if mesh is not None:
        from awm_tpu.parallel import shard_batch, shard_state

        state = shard_state(state, mesh)
        put = lambda b: shard_batch(jnp.asarray(b), mesh)
    else:
        put = lambda b: jnp.asarray(b)

    early = tr.EarlyStopping(cfg.train.early_stop_patience, cfg.train.early_stop_min_delta)
    logger = MetricsLogger(log_path)
    history: List[Dict] = []
    quick_every = cfg.train.quick_val_every
    val_iterable = val_batches if val_batches is not None else []

    # persistent cycling val iterator for quick-val, matching the reference's
    # next(val_iter)-with-restart pattern (ref: py/main14d.py:266-279) — each
    # quick-val sees a DIFFERENT val batch instead of re-scoring the first one
    _val_iter = [None]

    def next_val_batch():
        if val_batches is None:
            return None
        for _ in range(2):
            if _val_iter[0] is None:
                _val_iter[0] = iter(val_iterable)
            try:
                return next(_val_iter[0])
            except StopIteration:
                _val_iter[0] = None
        return None

    # Validation under the attack curriculum: keys are folded from the run
    # seed and the BATCH INDEX only (never the epoch), so every epoch's val
    # sees the identical attack realizations — the select metric is
    # comparable across epochs instead of jittering with attack draws.
    def _val_aug_key(i: int):
        if cfg.augment is not None and cfg.augment.val_attacks:
            return jax.random.fold_in(rng, 70_000 + i)
        return None

    def run_validation() -> Dict[str, float]:
        terms = [
            _fetch(tr.eval_step(cfg, gen, det, state, put(b), jax.random.fold_in(rng, 7_000 + i),
                                aug_key=_val_aug_key(i)))
            for i, b in enumerate(val_iterable)
        ]
        return _mean_terms(terms) if terms else {}

    stopped = False
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        train_terms: List[Dict[str, float]] = []
        pending = None  # fetch metrics one step late: keeps device busy
        for i, batch in enumerate(train_batches):
            state, terms = tr.train_step(cfg, gen, det, tx, state, put(batch), rng)
            if pending is not None:
                train_terms.append(_fetch(pending))
            pending = terms
            if quick_every and (i + 1) % quick_every == 0 and val_iterable:
                # one val batch only, mid-epoch proxy (ref: py/main14d.py:266-279)
                qb = next_val_batch()
                if qb is not None:
                    qv = _fetch(
                        tr.eval_step(cfg, gen, det, state, put(qb), jax.random.fold_in(rng, 9_000 + i),
                                     aug_key=_val_aug_key(i))
                    )
                    if verbose:
                        print(f"  [quick-val @ step {i+1}] total={qv['total']:.4f} mel={qv.get('mel', 0):.4f}")
        if pending is not None:
            train_terms.append(_fetch(pending))
        train_mean = _mean_terms(train_terms) if train_terms else {}

        val_mean = run_validation()
        src = val_mean or train_mean
        val_total = sum(src.get(k, float("inf")) for k in select_keys)

        row = {
            "epoch": epoch,
            "seconds": round(time.time() - t0, 2),
            **{f"train_{k}": v for k, v in train_mean.items()},
            **{f"val_{k}": v for k, v in val_mean.items()},
        }
        logger.log(row)
        history.append(row)
        if verbose:
            sel = "" if select_keys == ["total"] else f" select[{'+'.join(select_keys)}] {val_total:.4f}"
            print(
                f"epoch {epoch}: train {train_mean.get('total', float('nan')):.4f} "
                f"val {src.get('total', float('nan')):.4f}{sel} ({row['seconds']}s)"
            )

        if ckpt_dir:
            if val_total < best_val:
                best_val = val_total
                ck.save_checkpoint(ck.best_path(ckpt_dir), state, epoch=epoch + 1,
                                   best_val=best_val, model_cfg=cfg.model,
                                   shaping_cfg=cfg.shaping)
            ck.save_checkpoint(ck.latest_path(ckpt_dir), state, epoch=epoch + 1,
                               best_val=best_val, model_cfg=cfg.model,
                               shaping_cfg=cfg.shaping)
        else:
            best_val = min(best_val, val_total)

        early.step(val_total)
        if early.early_stop:
            stopped = True
            if verbose:
                print(f"early stopping at epoch {epoch}")
            break

    if plot_path and history:
        _plot_curves(history, plot_path)

    return {
        "state": state,
        "gen": gen,
        "det": det,
        "history": history,
        "best_val": best_val,
        "stopped_early": stopped,
    }


def _plot_curves(history: List[Dict], path: str) -> None:
    """Loss-curve PNG (ref: py/main14d.py:629-641)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [h["epoch"] for h in history]
    plt.figure(figsize=(10, 6))
    for key in ("train_total", "val_total"):
        if key in history[0]:
            plt.plot(epochs, [h[key] for h in history], label=key)
    plt.xlabel("epoch")
    plt.ylabel("total loss")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
