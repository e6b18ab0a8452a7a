"""Numerical parity of the core encoder/decoder against the reference
PyTorch implementation (used read-only as an oracle with random weights).

Gates follow the reference test strategy of loss-delta style equivalence
(reference ctest category 2, CMakeLists.txt:103-110) but tightened to
elementwise allclose since both sides run noise-free.
"""

import numpy as np
import pytest

import jax

from radae_tpu.config import RADAEConfig
from radae_tpu.models.core import CoreEncoder, CoreDecoder, distortion_loss
from radae_tpu.convert import torch_state_dict_to_params


@pytest.fixture(scope="module")
def oracle_models(reference_oracle):
    torch = reference_oracle.torch
    from radae import radae_base
    torch.manual_seed(42)
    enc = radae_base.CoreEncoder(20, 80, bottleneck=1)
    dec = radae_base.CoreDecoder(80, 20)
    return enc, dec


def test_encoder_parity(reference_oracle, oracle_models):
    torch = reference_oracle.torch
    enc_t, _ = oracle_models
    params = torch_state_dict_to_params(
        {f"core_encoder.{k}": v for k, v in enc_t.state_dict().items()})

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 24, 20)).astype(np.float32)

    with reference_oracle.no_quant_noise():
        with torch.no_grad():
            z_ref = enc_t(torch.tensor(feats)).numpy()

    enc = CoreEncoder(20, 80, bottleneck=1)
    z, _ = enc(params["encoder"], feats, key=None)
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=1e-4, atol=1e-5)


def test_decoder_parity(reference_oracle, oracle_models):
    torch = reference_oracle.torch
    _, dec_t = oracle_models
    params = torch_state_dict_to_params(
        {f"core_decoder.{k}": v for k, v in dec_t.state_dict().items()})

    rng = np.random.default_rng(1)
    z = np.tanh(rng.standard_normal((2, 6, 80))).astype(np.float32)

    with reference_oracle.no_quant_noise():
        with torch.no_grad():
            f_ref = dec_t(torch.tensor(z)).numpy()

    dec = CoreDecoder(80, 20)
    f, _ = dec(params["decoder"], z, key=None)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-4, atol=1e-5)


def test_distortion_loss_parity(reference_oracle):
    torch = reference_oracle.torch
    from radae import radae_base
    rng = np.random.default_rng(2)
    for nf in (20, 21):
        y_true = rng.standard_normal((3, 50, nf)).astype(np.float32)
        y_pred = rng.standard_normal((3, 50, nf)).astype(np.float32)
        ref = radae_base.distortion_loss(
            torch.tensor(y_true), torch.tensor(y_pred)).numpy()
        ours = np.asarray(distortion_loss(y_true, y_pred))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_stateful_encoder_parity(reference_oracle, oracle_models):
    """Streaming (chunked, carried state) must equal the batch path exactly
    — the property the reference gates with loss_delta < 0.01
    (stateful_encoder.py:101-105); here exact by construction."""
    enc_t, _ = oracle_models
    params = torch_state_dict_to_params(
        {f"core_encoder.{k}": v for k, v in enc_t.state_dict().items()})

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 48, 20)).astype(np.float32)

    enc = CoreEncoder(20, 80)
    z_full, _ = enc(params["encoder"], feats, key=None)

    state = None
    chunks = []
    for i in range(0, 48, 12):     # stream 12 frames (3 z-steps) at a time
        z_c, state = enc(params["encoder"], feats[:, i:i + 12], key=None,
                         state=state)
        chunks.append(np.asarray(z_c))
    z_stream = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(z_stream, np.asarray(z_full), rtol=1e-5, atol=1e-6)


def test_stateful_decoder_parity(reference_oracle, oracle_models):
    _, dec_t = oracle_models
    params = torch_state_dict_to_params(
        {f"core_decoder.{k}": v for k, v in dec_t.state_dict().items()})
    rng = np.random.default_rng(4)
    z = np.tanh(rng.standard_normal((1, 9, 80))).astype(np.float32)

    dec = CoreDecoder(80, 20)
    f_full, _ = dec(params["decoder"], z, key=None)

    state = None
    chunks = []
    for i in range(9):             # one z-step at a time, like streaming rx
        f_c, state = dec(params["decoder"], z[:, i:i + 1], key=None, state=state)
        chunks.append(np.asarray(f_c))
    f_stream = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(f_stream, np.asarray(f_full), rtol=1e-5, atol=1e-6)


def test_quant_noise_statistics():
    """n(x) adds U(-1/254, 1/254) noise and clamps to [-1, 1]
    (reference: radae_base.py:80-81)."""
    from radae_tpu.models.layers import quant_noise
    x = np.zeros((10000,), np.float32)
    y = np.asarray(quant_noise(jax.random.PRNGKey(0), x))
    assert np.abs(y).max() <= 0.5 / 127 + 1e-7
    assert abs(float(y.mean())) < 1e-4
    # clamping
    x1 = np.full((100,), 1.0, np.float32)
    y1 = np.asarray(quant_noise(jax.random.PRNGKey(1), x1))
    assert y1.max() <= 1.0
