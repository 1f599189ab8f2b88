"""Configuration dataclasses and named presets.

The reference hard-codes hyperparameters as module-level constants in five
script variants (ref: py/main14.py:26-38, py/main14b_2.py:43-48,
py/main14d.py:50-57, py/main16.py:29-43, main15c.ipynb cell 0).  Here every
variant is a named preset over one config tree so a single training entry
point reproduces all of them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

SAMPLE_RATE = 16000
AUDIO_LEN = 16000


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters.

    family="base" is the main14-family CNN->LSTM->CNN generator and residual
    CNN detector (ref: py/main14.py:90-148).  family="strided" is the
    main14b_2 strided residual encoder/decoder (ref: py/main14b_2.py:105-224).
    """

    family: str = "base"  # "base" | "strided"
    message_bits: int = 16
    # LSTM implementation: 'auto' (Pallas kernels on TPU for B>=8, scan
    # elsewhere), 'scan', or 'pallas'.  Multi-chip safe: under an active
    # mesh context (trainer/dryrun install jax.sharding.set_mesh) the kernel
    # is shard_map-wrapped over the data axis (ops/pallas/lstm_fused_auto).
    lstm_impl: str = "auto"
    channels: int = 64  # base family conv width (ref: py/main14.py:95)
    # Message pathway: "table" = the reference's Embedding(2^16, 64) lookup;
    # "bits" = bit-compositional encoder (16 learned directions, sign-flipped
    # per bit) — fixes the reference's decode collapse (models/generator.py).
    # "bits" generators have no .pth importer (the reference has no such
    # weights); all other params warm-start normally via restore_params.
    message_encoding: str = "table"
    # Detector bit-channel head: "shared" = the reference's single 1x1 conv
    # (15-sample RF); "dilated" = dilated-conv decode head (~147 ms RF) —
    # see models/detector.py.  Detection is unaffected either way.
    decode_head: str = "shared"
    # Band-limit the watermark carrier BY CONSTRUCTION: a fixed zero-phase
    # 101-tap sinc FIR applied to delta as the generator's final op, so the
    # constraint holds identically in training and inference and is recorded
    # in the checkpoint's arch sidecar.  Motivation (DEMO.md capstone): a
    # resample@8k round trip erases any carrier above its ~3.6 kHz anti-alias
    # edge, and attack-exposure curricula alone could not force a decodable
    # carrier below it (capR4 probe collapsed).  delta_band_hz=3000 keeps the
    # carrier inside the resample passband so the attack is near-transparent.
    delta_band_hz: Optional[float] = None
    # strided family (ref: py/main14b_2.py:43-48)
    base_channels: int = 32
    hidden_dim: int = 32
    output_channels: int = 128
    strides: Tuple[int, ...] = (2, 4, 5, 8)
    lstm_layers: int = 2


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (ref: py/main14.py:34-38; main16 values py/main16.py:38-43)."""

    lambda_l1: float = 0.1
    lambda_msspec: float = 2.0
    lambda_loud: float = 10.0
    lambda_loc: float = 10.0
    lambda_dec: float = 1.0
    # "per_sample" = reference objective (bit target expanded over all T,
    # ref: py/main14.py:220-223) — collapses to chance in the reference's own
    # runs.  "mean" = BCE on the time-mean logit, the statistic the decode
    # rule actually thresholds (losses.dec_loss).
    dec_loss_mode: str = "per_sample"
    # >0 re-weights each bit position's dec BCE by (its batch BCE / mean)^γ
    # (dec_loss_mode="mean" only): counteracts the winner-take-all carrier
    # collapse measured on band-limited runs (losses.dec_loss docstring).
    dec_bit_balance: float = 0.0
    hf_penalty_w: float = 0.0  # main16 only (ref: py/main16.py:43)
    hf_cutoff_hz: float = 3500.0
    hf_n_fft: int = 512
    # (n_fft, hop) scales for the mel loss.  The reference's
    # "MultiScaleMelLoss" is single-scale (ref: py/main14.py:154-164);
    # add more tuples for a true multi-scale loss.
    mel_scales: Tuple[Tuple[int, int], ...] = ((1024, 256),)


@dataclasses.dataclass(frozen=True)
class ShapingConfig:
    """Differentiable delta-shaping chain (main16, ref: py/main16.py:53-72)
    and channel-simulation postprocess (main15c, ref: main15c.ipynb cell 4)."""

    enabled: bool = False  # fir_lowpass -> clamp_peak -> limit_rms on delta
    fir_cutoff_hz: float = 4000.0
    fir_taps: int = 101
    clamp_thr: float = 0.02
    max_rms: float = 0.005  # ref: py/main16.py:29
    # main15c perceptual postprocess on s_w inside the training graph
    postprocess: bool = False
    postprocess_cutoff_hz: float = 7000.0
    # main14b_2 clamps the watermarked signal to [-1, 1] (ref: py/main14b_2.py:305)
    clamp_watermarked: bool = False


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """Optimizer schedule.  Constant Adam (ref: py/main14.py:402) or OneCycle
    cosine (ref: py/main14d.py:50-57,496-507)."""

    kind: str = "constant"  # "constant" | "onecycle"
    lr: float = 1e-3
    max_lr: float = 3e-4
    pct_start: float = 0.1
    div_factor: float = 25.0
    final_div_factor: float = 1e4


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    epochs: int = 10
    seed: int = 42
    schedule: ScheduleConfig = dataclasses.field(default_factory=ScheduleConfig)
    early_stop_patience: int = 3
    early_stop_min_delta: float = 0.001
    quick_val_every: Optional[int] = None  # main14d: 2000 (ref: py/main14d.py:56)
    # TPU-specific: conv/BN compute dtype for the TRAINING graph.  bfloat16
    # halves activation HBM traffic; params, BN statistics, LSTM recurrence,
    # DSP shaping and all loss reductions stay fp32 (awm_tpu.train._forward).
    # Use "float32" for strict reference-parity training dynamics.
    compute_dtype: str = "bfloat16"
    # Freeze one network during training: "gen" pins the generator's params
    # AND batch stats (embedded watermarks stay bit-identical — quality and
    # robustness provably unchanged) while the detector trains; "det" is the
    # symmetric option.  The decode-head fine-tune mode; None trains both.
    # Changing freeze changes the opt_state tree: resume via --init-from
    # (params-only), not in-place --ckpt-dir resume of an unfrozen run.
    freeze: Optional[str] = None
    data_axis: str = "data"
    model_axis: str = "model"


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "base"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    shaping: ShapingConfig = dataclasses.field(default_factory=ShapingConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # on-device channel-attack augmentation of s_w during training
    # (awm_tpu.augment.AugmentConfig); None = off
    augment: Optional[object] = None
    sample_rate: int = SAMPLE_RATE
    audio_len: int = AUDIO_LEN
    message_bits: int = 16


def _base() -> Config:
    """main14: baseline + full diagnostics (ref: py/main14.py:26-38)."""
    return Config(name="base")


def _light() -> Config:
    """main15: same model/losses as main14, per-term logging, lowpass save
    path (ref: py/main15.py)."""
    return Config(name="light")


def _onecycle20() -> Config:
    """main14d: 20-epoch OneCycleLR + resumable checkpoints
    (ref: py/main14d.py:50-57,540-623)."""
    return Config(
        name="onecycle20",
        train=TrainConfig(
            epochs=20,
            schedule=ScheduleConfig(kind="onecycle"),
            quick_val_every=2000,
        ),
    )


def _quality() -> Config:
    """main16: tightened imperceptibility weights + delta shaping chain +
    high-frequency penalty (ref: py/main16.py:29-81)."""
    return Config(
        name="quality",
        loss=LossConfig(
            lambda_l1=1.0,
            lambda_msspec=4.0,
            lambda_loud=20.0,
            lambda_loc=10.0,
            lambda_dec=1.0,
            hf_penalty_w=5.0,
        ),
        shaping=ShapingConfig(enabled=True),
    )


def _ft_robust() -> Config:
    """main15c: robustness fine-tune — 7 kHz lowpass + int16 quantization of
    s_w inside the training graph, lr=1e-5, 3 epochs
    (ref: main15c.ipynb cells 0, 4, 6, 14-15)."""
    return Config(
        name="ft_robust",
        shaping=ShapingConfig(postprocess=True),
        train=TrainConfig(
            epochs=3,
            schedule=ScheduleConfig(kind="constant", lr=1e-5),
        ),
    )


def _strided() -> Config:
    """main14b_2: strided residual encoder/decoder architecture exploration
    (ref: py/main14b_2.py:43-48).  Known-collapsed in the reference run —
    kept as a cautionary ablation (BASELINE.md)."""
    return Config(
        name="strided",
        model=ModelConfig(family="strided"),
        shaping=ShapingConfig(clamp_watermarked=True),
    )


PRESETS = {
    "base": _base,
    "light": _light,
    "onecycle20": _onecycle20,
    "quality": _quality,
    "ft_robust": _ft_robust,
    "strided": _strided,
}


def get_config(name: str = "base") -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; choose from {sorted(PRESETS)}")
    return PRESETS[name]()
