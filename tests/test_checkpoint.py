"""Checkpoint tests: orbax save/restore round-trip, resume semantics, and
numerical parity of the imported reference detector_best.pth
(BASELINE.json: 'message embedding/decoding path preserved bit-exactly')."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awm_tpu import checkpoint as ck
from awm_tpu import train as tr
from awm_tpu.config import get_config
from awm_tpu.models import Detector

REF_DET = "/root/reference/models/detector_best.pth"


def _cfg(t=512):
    return dataclasses.replace(get_config("base"), audio_len=t)


def test_orbax_roundtrip(tmp_path):
    cfg = _cfg()
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    b = jnp.asarray(np.random.default_rng(0).standard_normal((4, 512)).astype(np.float32))
    state, _ = tr.train_step(cfg, gen, det, tx, state, b, jax.random.key(1))

    p = str(tmp_path / "ckpt_latest")
    ck.save_checkpoint(p, state, epoch=3, best_val=1.25)

    template, _, _ = tr.init_state(cfg, jax.random.key(9))
    restored, epoch, best_val = ck.restore_checkpoint(p, template)
    assert epoch == 3 and abs(best_val - 1.25) < 1e-12
    for a, b_ in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert int(restored.step) == int(state.step)


def test_restore_params_across_presets(tmp_path):
    """restore_params loads weights from a checkpoint trained with a
    DIFFERENT preset's optimizer (onecycle vs plain adam opt_state trees
    differ, which restore_checkpoint rejects — the demo_eval/oc20 bug)."""
    oc = dataclasses.replace(get_config("onecycle20"), audio_len=512)
    state, gen, det = tr.init_state(oc, jax.random.key(0))
    tx = tr.make_optimizer(oc)
    b = jnp.asarray(np.random.default_rng(0).standard_normal((4, 512)).astype(np.float32))
    state, _ = tr.train_step(oc, gen, det, tx, state, b, jax.random.key(1))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=5, best_val=2.5)

    base_template, _, _ = tr.init_state(_cfg(), jax.random.key(9))
    with pytest.raises(Exception):
        ck.restore_checkpoint(p, base_template)  # opt_state trees differ
    restored, epoch, best_val = ck.restore_params(p, base_template)
    assert epoch == 5 and abs(best_val - 2.5) < 1e-12
    for a, b_ in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    for a, b_ in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(restored.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_restore_is_platform_independent(tmp_path):
    """Restores must not depend on the device layout recorded at save time:
    orbax's default re-creates the saved sharding, which crashes when a
    TPU-trained checkpoint is opened with --platform cpu ("sharding ...
    Got None").  The fix restores every leaf to HOST memory
    (checkpoint._host_template + restore_type=np.ndarray); this pins that
    mechanism — the cross-platform path itself was driven on a real
    TPU-saved checkpoint (runs/bl1) restored under jax_platforms=cpu."""
    cfg = _cfg()
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=1, best_val=0.5)

    template, _, _ = tr.init_state(cfg, jax.random.key(9))
    for restore in (ck.restore_checkpoint, ck.restore_params):
        restored = restore(p, template)[0]
        for leaf in jax.tree.leaves(restored.params):
            assert isinstance(leaf, np.ndarray), (
                f"{restore.__name__} returned a device-committed "
                f"{type(leaf).__name__}; cross-platform restore requires "
                f"host arrays"
            )


def test_restore_params_allow_missing_cross_arch(tmp_path):
    """Warm-start a message_encoding='bits' model from a 'table' checkpoint:
    shared conv/LSTM/detector weights restore, the new bit_proj keeps its
    init (and the on-disk 64k-row table is ignored)."""
    cfg = _cfg()
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    tx = tr.make_optimizer(cfg)
    b = jnp.asarray(np.random.default_rng(0).standard_normal((4, 512)).astype(np.float32))
    state, _ = tr.train_step(cfg, gen, det, tx, state, b, jax.random.key(1))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=2, best_val=3.0)

    bits_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, message_encoding="bits")
    )
    template, _, _ = tr.init_state(bits_cfg, jax.random.key(9))
    with pytest.raises(Exception):
        ck.restore_params(p, template)  # strict: bit_proj absent on disk
    restored, _, _ = ck.restore_params(p, template, allow_missing=True)
    np.testing.assert_array_equal(
        np.asarray(restored.params["gen"]["enc_conv"]["w"]),
        np.asarray(state.params["gen"]["enc_conv"]["w"]),
    )
    for a, b_ in zip(
        jax.tree.leaves(state.params["det"]), jax.tree.leaves(restored.params["det"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # the new head kept its INIT values, untouched by the restore
    np.testing.assert_array_equal(
        np.asarray(restored.params["gen"]["bit_proj"]["kernel"]),
        np.asarray(template.params["gen"]["bit_proj"]["kernel"]),
    )
    assert "embedding" not in restored.params["gen"]


def test_arch_sidecar_roundtrip(tmp_path):
    """Self-describing checkpoints: save_checkpoint(model_cfg=...) records the
    exact ModelConfig (awm_arch.json sidecar) and read_arch recovers it; a
    sidecar-less checkpoint reads as None (pre-feature = default arch)."""
    from awm_tpu.config import ModelConfig

    cfg = _cfg()
    variant = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, message_encoding="bits", decode_head="dilated",
            delta_band_hz=3000.0)
    )
    state, _, _ = tr.init_state(variant, jax.random.key(0))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=1, best_val=9.0, model_cfg=variant.model)

    arch = ck.read_arch(p)
    assert arch is not None
    known = {f.name for f in dataclasses.fields(ModelConfig)}
    arch = {k: v for k, v in arch.items() if k in known}
    arch["strides"] = tuple(arch["strides"])
    assert ModelConfig(**arch) == variant.model

    # the foreign sidecar file must not break the orbax restore itself
    template, _, _ = tr.init_state(variant, jax.random.key(9))
    restored, epoch, _ = ck.restore_params(p, template)
    assert epoch == 1

    p2 = str(tmp_path / "ckpt_plain")
    ck.save_checkpoint(p2, state, epoch=1, best_val=9.0)
    assert ck.read_arch(p2) is None


def test_restore_params_zero_overlap_raises(tmp_path):
    """A checkpoint sharing NO parameter leaves with the template (wrong
    model family) must raise even under allow_missing=True — 'warm-starting'
    from nothing would silently train from scratch."""
    cfg = _cfg()
    state, _, _ = tr.init_state(cfg, jax.random.key(0))
    p = str(tmp_path / "ckpt_best")
    ck.save_checkpoint(p, state, epoch=1, best_val=1.0)

    strided = dataclasses.replace(get_config("strided"), audio_len=640)
    template, _, _ = tr.init_state(strided, jax.random.key(9))
    with pytest.raises(ValueError, match="no parameter leaves"):
        ck.restore_params(p, template, allow_missing=True)


def test_restore_params_missing_path_fails_fast(tmp_path):
    """A nonexistent or empty checkpoint path must raise FileNotFoundError
    with the path in the message, not a TypeError from orbax metadata."""
    cfg = _cfg()
    template, _, _ = tr.init_state(cfg, jax.random.key(0))
    with pytest.raises(FileNotFoundError, match="no orbax checkpoint"):
        ck.restore_params(str(tmp_path / "does_not_exist"), template)
    empty = tmp_path / "empty_dir"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no orbax checkpoint"):
        ck.restore_params(str(empty), template)


def test_maybe_resume(tmp_path):
    cfg = _cfg()
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    s2, epoch, bv, resumed = ck.maybe_resume(str(tmp_path), state)
    assert not resumed and epoch == 0
    ck.save_checkpoint(ck.latest_path(str(tmp_path)), state, epoch=7, best_val=0.5)
    s3, epoch, bv, resumed = ck.maybe_resume(str(tmp_path), state)
    assert resumed and epoch == 7 and bv == 0.5


def test_strip_prefix():
    sd = {"_orig_mod.model.0.weight": 1, "model.0.bias": 2}
    out = ck.strip_prefix(sd)
    assert set(out) == {"model.0.weight", "model.0.bias"}


@pytest.mark.skipif(not os.path.exists(REF_DET), reason="reference ckpt absent")
def test_imported_detector_matches_torch_reference():
    """Load the shipped detector_best.pth into our flax Detector and compare
    logits against a torch functional replay of the reference architecture
    (Conv k7 -> 2x[conv-bn-relu-conv-bn + skip, relu] -> Conv k1,
    ref: py/main14.py:74-148) on the same input."""
    import torch
    import torch.nn.functional as F

    variables = ck.import_torch_detector(REF_DET)
    det = Detector(message_bits=16)
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal((2, 2000))).astype(np.float32)
    ours = np.asarray(det.apply(variables, jnp.asarray(x)))  # (B, T, 17)

    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in ck._load_torch_state_dict(REF_DET).items()
    }

    def bn(h, key):
        return F.batch_norm(
            h, sd[f"{key}.running_mean"], sd[f"{key}.running_var"],
            sd[f"{key}.weight"], sd[f"{key}.bias"], training=False, eps=1e-5,
        )

    def resblock(h, key):
        y = F.conv1d(h, sd[f"{key}.block.0.weight"], sd[f"{key}.block.0.bias"], padding=1)
        y = F.relu(bn(y, f"{key}.block.1"))
        y = F.conv1d(y, sd[f"{key}.block.3.weight"], sd[f"{key}.block.3.bias"], padding=1)
        y = bn(y, f"{key}.block.4")
        return F.relu(h + y)

    with torch.no_grad():
        h = torch.from_numpy(x).unsqueeze(1)  # (B, 1, T)
        h = F.conv1d(h, sd["model.0.weight"], sd["model.0.bias"], padding=3)
        h = resblock(h, "model.1")
        h = resblock(h, "model.2")
        h = F.conv1d(h, sd["model.3.weight"], sd["model.3.bias"])
        ref = h.permute(0, 2, 1).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    # decision-level parity: identical per-sample detection decisions
    np.testing.assert_array_equal(ours[:, :, 0] > 0, ref[:, :, 0] > 0)


@pytest.mark.skipif(not os.path.exists(REF_DET), reason="reference ckpt absent")
def test_imported_detector_element_count():
    variables = ck.import_torch_detector(REF_DET)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    # 52,053 in torch counts 4 num_batches_tracked scalars we don't carry
    assert n == 52053 - 4


def _torch_strided_pair(message_bits=4, base=8, hidden=8, out_ch=16, strides=(2, 4)):
    """Small torch replica of the main14b_2 Generator/Detector, built from
    the documented architecture (ref: py/main14b_2.py:86-224) with matching
    state-dict key names — the golden source for the strided importers."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Res(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.downsample = stride != 1 or cin != cout
            self.conv1 = nn.Conv1d(cin, cout, 3, stride=stride, padding=1)
            self.conv2 = nn.Conv1d(cout, cout, 3, padding=1)
            if self.downsample:
                self.skip_conv = nn.Conv1d(cin, cout, 1, stride=stride)

        def forward(self, x):
            y = self.conv2(F.elu(self.conv1(x)))
            r = self.skip_conv(x) if self.downsample else x
            return F.elu(y + r)

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.E = nn.Embedding(2**message_bits, hidden)
            self.init_conv = nn.Conv1d(1, base, 7, padding=3)
            ch = base
            blocks = []
            for st in strides:
                blocks.append(Res(ch, ch * 2, st))
                ch *= 2
            self.encoder_blocks = nn.Sequential(*blocks)
            self.proj = nn.Linear(ch, hidden)
            self.lstm = nn.LSTM(hidden, hidden, num_layers=2, batch_first=True)
            self.final_conv_enc = nn.Conv1d(hidden, out_ch, 7, padding=3)
            dec, cin = [], out_ch
            for st in reversed(strides):
                dec += [nn.ConvTranspose1d(cin, cin // 2, 2 * st, stride=st, padding=st // 2),
                        Res(cin // 2, cin // 2)]
                cin //= 2
            self.decoder_blocks = nn.Sequential(*dec)
            self.final_conv_dec = nn.Conv1d(cin, 1, 7, padding=3)

        def forward(self, s, message):
            t = s.shape[-1]
            x = self.encoder_blocks(self.init_conv(s))
            x = self.proj(x.transpose(1, 2))
            x = x + self.E(message).unsqueeze(1)
            x, _ = self.lstm(x)
            x = self.decoder_blocks(self.final_conv_enc(x.transpose(1, 2)))
            d = self.final_conv_dec(x)
            return d[:, :, :t]

    class Det(nn.Module):
        def __init__(self):
            super().__init__()
            self.init_conv = nn.Conv1d(1, base, 7, padding=3)
            ch = base
            blocks = []
            for st in strides:
                blocks.append(Res(ch, ch * 2, st))
                ch *= 2
            self.encoder_blocks = nn.Sequential(*blocks)
            up, cin = [], ch
            for st in reversed(strides):
                up += [nn.ConvTranspose1d(cin, cin // 2, 2 * st, stride=st, padding=st // 2),
                       Res(cin // 2, cin // 2)]
                cin //= 2
            self.upsample_blocks = nn.Sequential(*up)
            self.final_conv = nn.Conv1d(base, 1 + message_bits, 7, padding=3)

        def forward(self, x):
            t = x.shape[-1]
            h = self.upsample_blocks(self.encoder_blocks(self.init_conv(x)))
            return self.final_conv(h)[:, :, :t]

    torch.manual_seed(0)
    return Gen(), Det()


def test_strided_importers_match_torch(tmp_path):
    """Strided-family .pth importers: flax forward must match the torch
    reference replica on the same weights and input."""
    import torch

    from awm_tpu.models import StridedGenerator, StridedDetector

    bits, base, hidden, out_ch, strides = 4, 8, 8, 16, (2, 4)
    tgen, tdet = _torch_strided_pair(bits, base, hidden, out_ch, strides)
    gp, dp = str(tmp_path / "g.pth"), str(tmp_path / "d.pth")
    torch.save(tgen.state_dict(), gp)
    torch.save(tdet.state_dict(), dp)

    gvars = ck.import_torch_strided_generator(gp, n_strides=len(strides))
    dvars = ck.import_torch_strided_detector(dp, n_strides=len(strides))

    fgen = StridedGenerator(message_bits=bits, base_channels=base, hidden_dim=hidden,
                            output_channels=out_ch, strides=strides, lstm_layers=2)
    fdet = StridedDetector(message_bits=bits, base_channels=base, strides=strides)

    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal((2, 160))).astype(np.float32)
    msg = np.array([3, 9], dtype=np.int64)

    with torch.no_grad():
        ref_d = tgen(torch.from_numpy(x).unsqueeze(1), torch.from_numpy(msg))[:, 0].numpy()
        ref_l = tdet(torch.from_numpy(x).unsqueeze(1)).permute(0, 2, 1).numpy()

    ours_d = np.asarray(fgen.apply(gvars, jnp.asarray(x), jnp.asarray(msg, jnp.int32)))
    ours_l = np.asarray(fdet.apply(dvars, jnp.asarray(x)))

    np.testing.assert_allclose(ours_d, ref_d, atol=2e-5)
    np.testing.assert_allclose(ours_l, ref_l, atol=2e-5)
