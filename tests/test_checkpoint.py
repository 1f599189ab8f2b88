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
