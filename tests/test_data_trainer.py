"""Input pipeline + trainer driver + augmentation tests."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awm_tpu.augment import AugmentConfig, add_noise, apply_augment, resample_roundtrip
from awm_tpu.config import get_config
from awm_tpu.data import BatchLoader, OneSecClips, SyntheticClips, split_indices
from awm_tpu.trainer import fit
from awm_tpu.utils.audio_io import save_wav


def _cfg(t=512, **kw):
    return dataclasses.replace(get_config("base"), audio_len=t, **kw)


# -- dataset ---------------------------------------------------------------


def test_one_sec_clips_semantics(tmp_path, rng):
    d = tmp_path / "wavs" / "deep"
    d.mkdir(parents=True)
    # long stereo 22k clip -> truncated; short mono 16k clip -> padded
    save_wav(str(d / "long.wav"), rng.standard_normal((2, 30000)).astype(np.float32).clip(-1, 1), 22050)
    save_wav(str(d / "short.wav"), rng.standard_normal(4000).astype(np.float32).clip(-1, 1), 16000)
    ds = OneSecClips(str(tmp_path / "wavs"))
    assert len(ds) == 2
    for i in range(2):
        x = ds[i]
        assert x.shape == (16000,) and x.dtype == np.float32
    # short one is zero-padded at the end
    short = ds[[os.path.basename(p) for p in ds.filepaths].index("short.wav")]
    assert short[4000:].sum() == 0


def test_split_indices_deterministic():
    a = split_indices(100, (0.8, 0.1, 0.1), seed=42)
    b = split_indices(100, (0.8, 0.1, 0.1), seed=42)
    assert [len(x) for x in a] == [80, 10, 10]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    all_idx = np.concatenate(a)
    assert len(np.unique(all_idx)) == 100


def test_batch_loader_shapes_and_shuffle():
    ds = SyntheticClips(n=20, audio_len=256)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert all(b.shape == (8, 256) for b in batches)
    # next epoch shuffles differently
    batches2 = list(loader)
    assert not np.allclose(batches[0], batches2[0])


def test_batch_loader_no_drop_last():
    ds = SyntheticClips(n=10, audio_len=128)
    loader = BatchLoader(ds, batch_size=4, drop_last=False, shuffle=False)
    sizes = [b.shape[0] for b in loader]
    assert sizes == [4, 4, 2]


def test_synthetic_music_clips():
    from awm_tpu.data import SyntheticMusicClips

    ds = SyntheticMusicClips(n=6, audio_len=16000, seed=7)
    a = ds[0]
    assert a.shape == (16000,) and a.dtype == np.float32
    assert np.allclose(a, ds[0])  # deterministic
    assert not np.allclose(a, ds[1])
    assert np.abs(a).max() <= 0.5  # normalized headroom
    # out-of-domain vs the speech-like distribution: different envelope
    # statistics (music decays on a beat grid; speech AM is sinusoidal)
    speech = SyntheticClips(n=1, audio_len=16000)[0]
    assert np.abs(a).mean() != np.abs(speech).mean()


# -- augment ---------------------------------------------------------------


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    y = add_noise(x, jax.random.key(0), (20.0, 20.0))
    noise = np.asarray(y - x)
    snr = 10 * np.log10((np.asarray(x) ** 2).mean(axis=1) / (noise**2).mean(axis=1))
    assert np.all(np.abs(snr - 20.0) < 1.0)


def test_resample_roundtrip_lowpasses():
    t = np.arange(16000) / 16000.0
    hi = jnp.asarray(np.sin(2 * np.pi * 7000 * t).astype(np.float32))[None]
    lo = jnp.asarray(np.sin(2 * np.pi * 1000 * t).astype(np.float32))[None]
    hi_out = np.asarray(resample_roundtrip(hi, 8000))
    lo_out = np.asarray(resample_roundtrip(lo, 8000))
    assert np.sqrt((hi_out**2).mean()) < 0.1 * np.sqrt((np.asarray(hi) ** 2).mean())
    assert np.sqrt((lo_out**2).mean()) > 0.8 * np.sqrt((np.asarray(lo) ** 2).mean())


def test_lowpass_curriculum_selects_per_example():
    """A tuple lowpass_hz draws a cutoff per example: with attack_prob=1 and
    choices (c,), every row equals lowpass_biquad(x, c); with two distinct
    choices each row matches exactly one of the two filters, and both
    appear across a large-enough batch."""
    from awm_tpu.dsp import lowpass_biquad

    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal((16, 512)) * 0.2).astype(np.float32))
    key = jax.random.key(5)

    one = apply_augment(x, key, AugmentConfig(lowpass_hz=(3500.0,), attack_prob=1.0))
    np.testing.assert_allclose(one, lowpass_biquad(x, 16000, 3500.0), rtol=0, atol=1e-6)

    cur = np.asarray(
        apply_augment(x, key, AugmentConfig(lowpass_hz=(3500.0, 7000.0), attack_prob=1.0))
    )
    a = np.asarray(lowpass_biquad(x, 16000, 3500.0))
    b = np.asarray(lowpass_biquad(x, 16000, 7000.0))
    is_a = np.isclose(cur, a, atol=1e-6).all(axis=-1)
    is_b = np.isclose(cur, b, atol=1e-6).all(axis=-1)
    assert (is_a | is_b).all()
    assert is_a.any() and is_b.any()


def test_lowpass_fir_is_steeper_than_biquad():
    """lowpass_filter='fir' must actually close the biquad's rolloff leak:
    a 5 kHz tone through a 3.5 kHz cutoff keeps well over 10% of its RMS
    under the biquad but almost nothing under the 101-tap FIR."""
    t = np.arange(2048) / 16000.0
    tone = jnp.asarray(np.sin(2 * np.pi * 5000 * t).astype(np.float32))[None]
    rms = lambda a: float(jnp.sqrt(jnp.mean(jnp.square(a))))
    bi = apply_augment(
        tone, jax.random.key(0),
        AugmentConfig(lowpass_hz=(3500.0,), attack_prob=1.0),
    )
    fir = apply_augment(
        tone, jax.random.key(0),
        AugmentConfig(lowpass_hz=(3500.0,), lowpass_filter="fir", attack_prob=1.0),
    )
    assert rms(bi) > 0.1 * rms(tone)  # the leak the curriculum was missing
    assert rms(fir) < 0.02 * rms(tone)
    assert rms(fir) < 0.1 * rms(bi)


def test_augmented_train_step_runs():
    cfg = _cfg(augment=AugmentConfig(noise_snr_db=(25.0, 35.0), volume_range=(0.5, 1.0), quantize=True))
    from awm_tpu import train as tr

    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    b = jnp.asarray(np.random.default_rng(0).standard_normal((4, 512)).astype(np.float32) * 0.3)
    state, terms = tr.train_step(cfg, gen, det, tx, state, b, jax.random.key(1))
    assert np.isfinite(float(terms["total"]))


def test_fit_attacked_validation_deterministic():
    """fit() with a curriculum validates UNDER the attacks, deterministically
    across runs (epoch-independent val keys), and val_attacks=False restores
    clean validation — the trainer-level contract behind --select-metric."""
    rng = np.random.default_rng(0)
    clips = (rng.standard_normal((24, 256)) * 0.1).astype(np.float32)
    tr_b, val_b = [clips[:16]], [clips[16:]]

    def run(val_attacks):
        cfg = _cfg(256, augment=AugmentConfig(
            noise_snr_db=(5.0, 8.0), attack_prob=1.0, val_attacks=val_attacks))
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=2))
        return fit(cfg, tr_b, val_b, seed=7, verbose=False,
                   select_metric="loc,dec")["history"]

    att, att2, clean = run(True), run(True), run(False)
    assert [r["val_loc"] for r in att] == [r["val_loc"] for r in att2]
    assert att[0]["val_loc"] != clean[0]["val_loc"]


# -- trainer ---------------------------------------------------------------


def test_fit_end_to_end(tmp_path):
    cfg = dataclasses.replace(
        _cfg(256), train=dataclasses.replace(_cfg(256).train, epochs=2)
    )
    ds = SyntheticClips(n=16, audio_len=256)
    train_loader = BatchLoader(ds, batch_size=4, seed=0, num_workers=2)
    val_loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    out = fit(
        cfg,
        train_loader,
        val_loader,
        ckpt_dir=str(tmp_path / "ck"),
        log_path=str(tmp_path / "metrics.csv"),
        plot_path=str(tmp_path / "loss.png"),
        verbose=False,
    )
    assert len(out["history"]) == 2
    assert np.isfinite(out["best_val"])
    assert os.path.isdir(str(tmp_path / "ck" / "ckpt_latest"))
    assert os.path.isdir(str(tmp_path / "ck" / "ckpt_best"))
    assert os.path.exists(str(tmp_path / "metrics.csv"))
    assert os.path.exists(str(tmp_path / "loss.png"))
    # per-term columns present (main15-style logging)
    assert "train_mel" in out["history"][0] and "val_loud" in out["history"][0]


def test_fit_select_metric(tmp_path):
    """select_metric drives checkpoint selection/early stopping on the SUM
    of the named val terms instead of the weighted total (robustness
    fine-tune flow, see trainer.fit docstring)."""
    cfg = dataclasses.replace(
        _cfg(256), train=dataclasses.replace(_cfg(256).train, epochs=2)
    )
    ds = SyntheticClips(n=8, audio_len=256)
    mk = lambda: BatchLoader(ds, batch_size=4, seed=0, num_workers=1)
    out = fit(
        cfg, mk(), mk(), ckpt_dir=str(tmp_path / "ck"),
        select_metric="loc,dec", verbose=False,
    )
    h = out["history"]
    assert len(h) == 2
    # best_val tracks min over epochs of val_loc + val_dec, not val_total
    expect = min(r["val_loc"] + r["val_dec"] for r in h)
    assert out["best_val"] == pytest.approx(expect, rel=1e-6)
    assert abs(out["best_val"] - min(r["val_total"] for r in h)) > 1e-6


def test_fit_select_metric_typo_fails_fast(tmp_path):
    """A typo'd select_metric key must raise BEFORE any training — silently
    producing val=inf would never write ckpt_best and early-stop the run."""
    cfg = _cfg(256)
    ds = SyntheticClips(n=8, audio_len=256)
    mk = lambda: BatchLoader(ds, batch_size=4, seed=0, num_workers=1)
    with pytest.raises(ValueError, match="los"):
        fit(cfg, mk(), mk(), select_metric="los,dec", verbose=False)


def test_fit_resume(tmp_path):
    cfg = dataclasses.replace(
        _cfg(256), train=dataclasses.replace(_cfg(256).train, epochs=1)
    )
    ds = SyntheticClips(n=8, audio_len=256)
    mk = lambda: BatchLoader(ds, batch_size=4, seed=0, num_workers=2)
    fit(cfg, mk(), mk(), ckpt_dir=str(tmp_path), verbose=False)
    # fit records the architecture next to the weights (self-describing
    # checkpoints: inference auto-configures decode_head/message_encoding)
    from awm_tpu import checkpoint as ck

    arch = ck.read_arch(str(tmp_path / "ckpt_latest"))
    assert arch is not None and arch["decode_head"] == cfg.model.decode_head
    # second call resumes at epoch 1 == epochs -> zero additional epochs
    out = fit(cfg, mk(), mk(), ckpt_dir=str(tmp_path), verbose=False)
    assert out["history"] == []


def test_fit_finetune_init_from(tmp_path):
    cfg = dataclasses.replace(
        _cfg(256), train=dataclasses.replace(_cfg(256).train, epochs=1)
    )
    ds = SyntheticClips(n=8, audio_len=256)
    mk = lambda: BatchLoader(ds, batch_size=4, seed=0, num_workers=2)
    fit(cfg, mk(), mk(), ckpt_dir=str(tmp_path / "pre"), verbose=False)

    ft_cfg = dataclasses.replace(get_config("ft_robust"), audio_len=256)
    ft_cfg = dataclasses.replace(ft_cfg, train=dataclasses.replace(ft_cfg.train, epochs=1))
    out = fit(
        ft_cfg, mk(), mk(),
        init_from=str(tmp_path / "pre" / "ckpt_best"),
        verbose=False,
    )
    assert len(out["history"]) == 1


def test_fit_freeze_init_from(tmp_path):
    """fit() with TrainConfig.freeze='gen' + init_from keeps the generator's
    params bit-identical across a whole epoch (the decode-head fine-tune
    contract: embedded watermarks provably unchanged) while the detector
    trains."""
    cfg = dataclasses.replace(
        _cfg(256), train=dataclasses.replace(_cfg(256).train, epochs=1)
    )
    ds = SyntheticClips(n=8, audio_len=256)
    mk = lambda: BatchLoader(ds, batch_size=4, seed=0, num_workers=2)
    pre = fit(cfg, mk(), mk(), ckpt_dir=str(tmp_path / "pre"), verbose=False)

    frz_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, freeze="gen")
    )
    out = fit(
        frz_cfg, mk(), mk(),
        init_from=str(tmp_path / "pre" / "ckpt_best"),
        verbose=False,
    )
    for a, b in zip(jax.tree.leaves(pre["state"].params["gen"]),
                    jax.tree.leaves(out["state"].params["gen"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        pre["state"].params["det"], out["state"].params["det"])
    assert max(jax.tree.leaves(diff)) > 0, "detector did not train under freeze='gen'"


class _RecordingLoader:
    """Re-iterable batch list that records the index of every yielded batch."""

    def __init__(self, batches):
        self.batches = batches
        self.yielded = []

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for i, b in enumerate(self.batches):
            self.yielded.append(i)
            yield b


def test_quick_val_cycles_val_batches():
    """Quick-val must CYCLE the val iterator (ref: py/main14d.py:266-279),
    not re-score the first val batch every time (round-1 regression)."""
    cfg = _cfg(256)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=1, quick_val_every=1)
    )
    r = np.random.default_rng(0)
    train_batches = [
        (0.3 * r.standard_normal((2, 256))).astype(np.float32) for _ in range(3)
    ]
    val = _RecordingLoader(
        [(0.3 * r.standard_normal((2, 256))).astype(np.float32) for _ in range(2)]
    )
    fit(cfg, train_batches, val, verbose=False)
    # 3 quick-vals cycling 2 val batches -> 0,1,0; end-of-epoch validation
    # then consumes 0,1.  The buggy behavior yields 0,0,0 first.
    assert val.yielded[:3] == [0, 1, 0], val.yielded


def test_resample_curriculum_selects_per_example():
    """A tuple resample_hz draws a target rate per example (polyphase,
    arbitrary rational ratios): each row matches exactly one of the two
    round trips and both appear across the batch."""
    rng = np.random.default_rng(4)
    x = jnp.asarray((rng.standard_normal((16, 2048)) * 0.2).astype(np.float32))
    key = jax.random.key(6)

    cur = np.asarray(
        apply_augment(x, key, AugmentConfig(resample_hz=(8000, 22050), attack_prob=1.0))
    )
    a = np.asarray(resample_roundtrip(x, 8000))
    b = np.asarray(resample_roundtrip(x, 22050))
    is_a = np.isclose(cur, a, atol=1e-6).all(axis=-1)
    is_b = np.isclose(cur, b, atol=1e-6).all(axis=-1)
    assert (is_a | is_b).all()
    assert is_a.any() and is_b.any()


def test_concat_clips_mix():
    """ConcatClips lays datasets end to end (speech+music training mix)."""
    from awm_tpu.data import ConcatClips, SyntheticClips, SyntheticMusicClips

    a = SyntheticClips(n=6, audio_len=800)
    b = SyntheticMusicClips(n=3, audio_len=800, seed=1)
    ds = ConcatClips(a, b)
    assert len(ds) == 9 and ds.audio_len == 800
    np.testing.assert_array_equal(ds[0], a[0])
    np.testing.assert_array_equal(ds[5], a[5])
    np.testing.assert_array_equal(ds[6], b[0])
    np.testing.assert_array_equal(ds[8], b[2])
