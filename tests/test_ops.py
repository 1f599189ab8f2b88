"""Golden parity tests for conv/LSTM primitives against torch CPU.

These ops must match torch semantics exactly for reference-checkpoint import
(SURVEY.md "hard parts": LSTM gate math, ConvTranspose padding arithmetic).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from awm_tpu.ops import conv1d, conv_transpose1d, lstm_forward, lstm_stack


@pytest.mark.parametrize("stride,padding,k", [(1, 3, 7), (1, 1, 3), (2, 1, 3), (5, 2, 10), (1, 0, 1)])
def test_conv1d_matches_torch(rng, stride, padding, k):
    import torch

    b, cin, cout, t = 2, 3, 5, 64
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), stride=stride, padding=padding))

    tx = torch.from_numpy(x).permute(0, 2, 1)  # NCH
    tw = torch.from_numpy(w).permute(2, 1, 0)  # (out, in, k)
    ref = torch.nn.functional.conv1d(tx, tw, torch.from_numpy(bias), stride=stride, padding=padding)
    ref = ref.permute(0, 2, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("dilation", [2, 16, 128])
def test_conv1d_dilation_matches_torch(rng, dilation):
    import torch

    b, cin, cout, t, k = 2, 3, 4, 2048, 3
    pad = dilation * (k - 1) // 2
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), stride=1, padding=pad, dilation=dilation))
    tx = torch.from_numpy(x).permute(0, 2, 1)
    tw = torch.from_numpy(w).permute(2, 1, 0)
    ref = torch.nn.functional.conv1d(tx, tw, stride=1, padding=pad, dilation=dilation)
    ref = ref.permute(0, 2, 1).numpy()
    assert ours.shape == ref.shape == (b, t, cout)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize(
    "stride,padding,out_pad,k",
    [(1, 3, 0, 7), (2, 1, 0, 4), (4, 2, 0, 8), (5, 2, 0, 10), (8, 4, 0, 16), (3, 1, 1, 5)],
)
def test_conv_transpose1d_matches_torch(rng, stride, padding, out_pad, k):
    import torch

    b, cin, cout, t = 2, 4, 3, 25
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ours = np.asarray(
        conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
            stride=stride, padding=padding, output_padding=out_pad,
        )
    )
    tx = torch.from_numpy(x).permute(0, 2, 1)
    tw = torch.from_numpy(w).permute(1, 2, 0)  # torch convT weight (in, out, k)
    ref = torch.nn.functional.conv_transpose1d(
        tx, tw, torch.from_numpy(bias), stride=stride, padding=padding, output_padding=out_pad
    ).permute(0, 2, 1).numpy()
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_lstm_matches_torch(rng):
    import torch

    b, t, d, h = 3, 50, 8, 16
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    ref_lstm = torch.nn.LSTM(d, h, batch_first=True)
    with torch.no_grad():
        ref_out, _ = ref_lstm(torch.from_numpy(x))
    w_ih = ref_lstm.weight_ih_l0.detach().numpy()
    w_hh = ref_lstm.weight_hh_l0.detach().numpy()
    bsum = (ref_lstm.bias_ih_l0 + ref_lstm.bias_hh_l0).detach().numpy()

    ours = np.asarray(
        lstm_forward(jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(bsum))
    )
    np.testing.assert_allclose(ours, ref_out.numpy(), atol=2e-5)


def test_lstm_stack_matches_torch_two_layers(rng):
    import torch

    b, t, h = 2, 40, 12
    x = rng.standard_normal((b, t, h)).astype(np.float32)
    ref_lstm = torch.nn.LSTM(h, h, num_layers=2, batch_first=True)
    with torch.no_grad():
        ref_out, _ = ref_lstm(torch.from_numpy(x))
    layers = []
    for i in range(2):
        layers.append(
            {
                "w_ih": jnp.asarray(getattr(ref_lstm, f"weight_ih_l{i}").detach().numpy()),
                "w_hh": jnp.asarray(getattr(ref_lstm, f"weight_hh_l{i}").detach().numpy()),
                "b": jnp.asarray(
                    (getattr(ref_lstm, f"bias_ih_l{i}") + getattr(ref_lstm, f"bias_hh_l{i}")).detach().numpy()
                ),
            }
        )
    ours = np.asarray(lstm_stack(jnp.asarray(x), tuple(layers)))
    np.testing.assert_allclose(ours, ref_out.numpy(), atol=5e-5)
