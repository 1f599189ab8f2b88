"""Pallas LSTM kernel tests.  On CPU the kernel runs in interpreter mode
(slow but exact); the TPU-compiled path is exercised by bench.py and the
verify drives (bit-exactness vs scan confirmed on hardware: max err 0.0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from awm_tpu.ops.lstm import lstm_forward
from awm_tpu.ops.pallas.lstm_kernel import _pick_tc, lstm_pallas_forward


def test_pick_tc():
    mb4 = 4 * 1024 * 1024  # pin the budget: AWM_LSTM_TILE_MB changes the default
    assert _pick_tc(512, 16000, 64, budget=mb4) == 8
    assert _pick_tc(256, 16000, 64, budget=mb4) == 16
    assert _pick_tc(32, 16000, 64, budget=mb4) == 128
    assert _pick_tc(512, 16000, 64, budget=4 * mb4) == 32  # larger budget -> longer tile
    assert 16000 % _pick_tc(1, 16000, 64, budget=mb4) == 0
    # non-pow2-divisible T falls back to a divisor
    assert 800 % _pick_tc(4, 800, 64, budget=mb4) == 0


@pytest.mark.parametrize("b,t", [(2, 256), (1, 128)])
def test_pallas_matches_scan_interpret(rng, b, t):
    d = h = 64
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray(rng.standard_normal((4 * h, d)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((4 * h, h)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((4 * h,)).astype(np.float32) * 0.1)
    ref = lstm_forward(x, w_ih, w_hh, bias)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = lstm_pallas_forward(x, w_ih, w_hh, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_lstm_module_auto_uses_scan_on_cpu(rng):
    """On the CPU test platform, impl='auto' must route to scan (no Pallas
    compile) and produce the same params/output as impl='scan'."""
    from awm_tpu.models.layers import LSTM

    x = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    m_auto = LSTM(hidden=64, impl="auto")
    m_scan = LSTM(hidden=64, impl="scan")
    v = m_auto.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(m_auto.apply(v, x)), np.asarray(m_scan.apply(v, x)), atol=1e-6
    )


def test_pallas_backward_matches_scan_interpret(rng):
    """Full custom_vjp (Pallas fwd + Pallas bwd) vs autodiff-of-scan grads,
    interpreter mode."""
    from jax.experimental.pallas import tpu as pltpu

    from awm_tpu.ops.pallas.lstm_kernel import lstm_fused

    b, t, d = 2, 128, 64
    h = 64
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray(rng.standard_normal((4 * h, d)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((4 * h, h)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((4 * h,)).astype(np.float32) * 0.1)

    def loss_s(*a):
        return jnp.sum(jnp.sin(lstm_forward(*a)))

    def loss_p(*a):
        return jnp.sum(jnp.sin(lstm_fused(*a)))

    ref = jax.grad(loss_s, argnums=(0, 1, 2, 3))(x, w_ih, w_hh, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_p, argnums=(0, 1, 2, 3))(x, w_ih, w_hh, bias)
    for name, a, c in zip(("dx", "dw_ih", "dw_hh", "db"), got, ref):
        denom = float(jnp.abs(c).max()) + 1e-9
        rel = float(jnp.abs(a - c).max()) / denom
        assert rel < 5e-3, (name, rel)


def test_pallas_bf16_path_interpret(rng):
    """bf16 inputs select the bf16-matmul variant: outputs stay close to
    the fp32 scan (weights/h rounded to bf16; state + accumulation fp32)
    and the custom_vjp returns cotangents in the primal dtypes."""
    from jax.experimental.pallas import tpu as pltpu

    from awm_tpu.ops.pallas.lstm_kernel import lstm_fused, lstm_pallas_forward

    b, t, d = 2, 128, 64
    h = 64
    x32 = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray(rng.standard_normal((4 * h, d)).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((4 * h, h)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((4 * h,)).astype(np.float32) * 0.1)
    x16 = x32.astype(jnp.bfloat16)

    ref = lstm_forward(x32, w_ih, w_hh, bias)
    with pltpu.force_tpu_interpret_mode():
        out = lstm_pallas_forward(x16, w_ih, w_hh, bias)
    assert out.dtype == jnp.bfloat16
    # bf16 rounding of x/weights/recurrent h: loose but bounded agreement
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err < 5e-2, err

    def loss(*a):
        return jnp.sum(jnp.sin(lstm_fused(*a).astype(jnp.float32)))

    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x16, w_ih, w_hh, bias)
    assert grads[0].dtype == jnp.bfloat16  # dx matches primal dtype
    assert all(g.dtype == jnp.float32 for g in grads[1:])

    def loss_s(*a):
        return jnp.sum(jnp.sin(lstm_forward(*a)))

    ref_g = jax.grad(loss_s, argnums=(1, 2, 3))(x32, w_ih, w_hh, bias)
    for name, a, c in zip(("dw_ih", "dw_hh", "db"), grads[1:], ref_g):
        denom = float(jnp.abs(c).max()) + 1e-9
        rel = float(jnp.abs(a - c).max()) / denom
        assert rel < 6e-2, (name, rel)
