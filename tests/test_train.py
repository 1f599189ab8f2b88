"""Training-step integration tests: loss decreases, detector learns on a
tiny overfit problem (SURVEY.md section 4: '2-batch overfit integration
test')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awm_tpu.config import get_config
from awm_tpu import train as tr


def _tiny_cfg(preset="base", t=800):
    import dataclasses

    cfg = get_config(preset)
    return dataclasses.replace(cfg, audio_len=t)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    t = np.arange(800) / 16000.0
    tones = [
        0.3 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(800)
        for f in (220, 330, 440, 550)
    ]
    return jnp.asarray(np.stack(tones).astype(np.float32))


def test_train_step_runs_and_updates(batch):
    cfg = _tiny_cfg()
    rng = jax.random.key(0)
    state, gen, det = tr.init_state(cfg, rng)
    tx = tr.make_optimizer(cfg)
    new_state, terms = tr.train_step(cfg, gen, det, tx, state, batch, rng)
    assert int(new_state.step) == 1
    for k in ("total", "loc", "dec", "l1", "mel", "loud"):
        assert np.isfinite(float(terms[k])), k
    # params actually changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_train_step_freeze(batch):
    """freeze='gen' pins the generator's params AND batch stats exactly
    (embedded watermarks bit-identical) while the detector still trains;
    symmetric for 'det'."""
    import dataclasses

    for frozen, trained in (("gen", "det"), ("det", "gen")):
        cfg = _tiny_cfg()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, freeze=frozen)
        )
        rng = jax.random.key(0)
        state, gen, det = tr.init_state(cfg, rng)
        tx = tr.make_optimizer(cfg)
        new_state, _ = tr.train_step(cfg, gen, det, tx, state, batch, rng)
        for a, b in zip(jax.tree.leaves(state.params[frozen]),
                        jax.tree.leaves(new_state.params[frozen])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.batch_stats[frozen]),
                        jax.tree.leaves(new_state.batch_stats[frozen])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.params[trained], new_state.params[trained])
        assert max(jax.tree.leaves(diff)) > 0, f"{trained} did not train"


def test_overfit_two_batches_detector_learns(batch):
    """After a few hundred steps on 4 fixed clips, the detector must separate
    watermarked from clean and the decoder must beat chance decisively."""
    cfg = _tiny_cfg()
    rng = jax.random.key(1)
    state, gen, det = tr.init_state(cfg, rng)
    tx = tr.make_optimizer(cfg)

    first_total = None
    for i in range(150):
        state, terms = tr.train_step(cfg, gen, det, tx, state, batch, rng)
        if first_total is None:
            first_total = float(terms["total"])
    last_total = float(terms["total"])
    assert last_total < first_total, (first_total, last_total)

    m = tr.evaluate_step(cfg, gen, det, state, batch, jax.random.key(7))
    wm = float(np.mean(np.asarray(m["watermarked_prob"])))
    clean = float(np.mean(np.asarray(m["clean_prob"])))
    assert wm > clean + 0.2, (wm, clean)
    # Decode converges far slower than detection — the reference's own full
    # 10-epoch run sat at 0.5009 bit accuracy (BASELINE.md).  150 steps with
    # fresh random messages per step only needs to be not-broken here.
    assert float(np.mean(np.asarray(m["bit_accuracy"]))) > 0.4


def test_eval_step_terms(batch):
    cfg = _tiny_cfg()
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    terms = tr.eval_step(cfg, gen, det, state, batch, jax.random.key(3))
    assert set(terms) >= {"total", "loc", "dec", "l1", "mel", "loud"}


def test_eval_step_attacked_val(batch):
    """With an attack curriculum, eval_step must measure detection UNDER the
    attacks when given an aug_key (else robustness fine-tunes select on the
    already-converged clean terms and freeze at epoch 0), and must be
    deterministic in that key so the metric is comparable across epochs."""
    import dataclasses

    from awm_tpu.augment import AugmentConfig

    cfg = dataclasses.replace(
        _tiny_cfg(), augment=AugmentConfig(noise_snr_db=(5.0, 6.0), attack_prob=1.0)
    )
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    clean = tr.eval_step(cfg, gen, det, state, batch, jax.random.key(3))
    att1 = tr.eval_step(cfg, gen, det, state, batch, jax.random.key(3), aug_key=jax.random.key(9))
    att2 = tr.eval_step(cfg, gen, det, state, batch, jax.random.key(3), aug_key=jax.random.key(9))
    att3 = tr.eval_step(cfg, gen, det, state, batch, jax.random.key(3), aug_key=jax.random.key(10))
    # same key -> bit-identical terms; attacks actually change the losses
    assert float(att1["loc"]) == float(att2["loc"])
    assert float(att1["loc"]) != float(clean["loc"])
    assert float(att1["loc"]) != float(att3["loc"])


def test_quality_preset_step(batch):
    """main16 preset: shaping chain active + hf term present; RMS cap holds."""
    cfg = _tiny_cfg("quality")
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    state, terms = tr.train_step(cfg, gen, det, tx, state, batch, jax.random.key(2))
    assert "hf" in terms and np.isfinite(float(terms["hf"]))


def test_ft_robust_preset_step(batch):
    """main15c preset: in-graph lowpass+quantize channel sim."""
    cfg = _tiny_cfg("ft_robust")
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    state, terms = tr.train_step(cfg, gen, det, tx, state, batch, jax.random.key(2))
    assert np.isfinite(float(terms["total"]))


def test_onecycle_schedule_shape():
    cfg = get_config("onecycle20")
    sched = tr.make_schedule(cfg, steps_per_epoch=100)
    lrs = [float(sched(s)) for s in [0, 200, 1999]]
    sch = cfg.train.schedule
    assert abs(lrs[0] - sch.max_lr / sch.div_factor) < 1e-9
    assert abs(lrs[1] - sch.max_lr) < 1e-6  # peak at pct_start
    assert lrs[2] < sch.max_lr / 1000  # annealed way down


def test_onecycle_schedule_finite_at_tiny_step_counts():
    """optax's cosine_onecycle yields NaN for EVERY step when a phase rounds
    to zero length (pct_start * total < 1); make_schedule clamps total_steps
    so smoke-sized runs (3 steps/epoch, 1 epoch) still get a finite lr."""
    import dataclasses

    cfg = get_config("onecycle20")
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=1))
    sched = tr.make_schedule(cfg, steps_per_epoch=3)
    lrs = [float(sched(s)) for s in range(4)]
    assert all(np.isfinite(v) and v > 0 for v in lrs), lrs


def test_early_stopping():
    es = tr.EarlyStopping(patience=2, min_delta=0.001)
    for v in [1.0, 0.9, 0.8999, 0.8999]:
        es.step(v)
    assert es.early_stop


def test_bf16_fp32_loss_trajectory_parity(batch):
    """Mixed-precision invariants: identical init (init is dtype-independent),
    a tracking loss trajectory, fp32 params/grads, and bf16 progress."""
    import dataclasses

    traj = {}
    for dt in ("float32", "bfloat16"):
        cfg = _tiny_cfg()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, compute_dtype=dt)
        )
        state, gen, det = tr.init_state(cfg, jax.random.key(0))
        tx = tr.make_optimizer(cfg)
        losses = []
        for _ in range(60):
            state, terms = tr.train_step(cfg, gen, det, tx, state, batch, jax.random.key(5))
            losses.append(float(terms["total"]))
        traj[dt] = np.asarray(losses)
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.params)), dt
    a, b = traj["float32"], traj["bfloat16"]
    # the raw trajectory is noisy (the loud term swings 4x step to step), so:
    # learning = windowed means; parity = per-step rel diff over the first 10
    # steps, before bf16 rounding compounds through the weights
    assert np.mean(b[-10:]) < np.mean(b[:10])  # bf16 path learns
    rel = np.abs(a[:5] - b[:5]) / np.maximum(np.abs(a[:5]), 1e-6)
    assert rel.max() < 0.10, (rel.max(), a[:5], b[:5])
    # end state in the same regime (quadratic loud term amplifies the
    # compounding bf16 rounding, so only a coarse bound is meaningful)
    assert abs(np.mean(a[-10:]) - np.mean(b[-10:])) / np.mean(a[-10:]) < 0.5
