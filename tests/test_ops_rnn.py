"""Pallas RNN scan kernel vs the lax.scan reference (interpret mode on
CPU; numerics must match exactly — same update rule, same dtypes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sse_tpu.models import TowerConfig, init_tower
from sse_tpu.models.towers import encode_raw
from sse_tpu.ops import pallas_rnn

B, L = 8, 12


def tower(cell):
    # hidden=128 to satisfy the kernel's lane alignment
    return TowerConfig(
        vocab_size=50, embed_dim=128, hidden=128, num_layers=2,
        encoding_dim=16, cell=cell,
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_rnn_matches_scan(cell):
    cfg = tower(cell)
    params = init_tower(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(B, L, 128)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(2, L + 1, size=(B,)), jnp.int32)
    valid = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)

    fin_pallas = pallas_rnn.rnn_encode(params, cfg, emb, valid, interpret=True)

    # reference: the scan path's final hidden (replicate encode_raw internals)
    from sse_tpu.models.towers import _rnn_layer, _COMPUTE_DTYPE

    xs = emb.transpose(1, 0, 2).astype(_COMPUTE_DTYPE)
    mask = valid.T[:, :, None]
    fin_scan = None
    for layer in params["layers"]:
        xs, fin_scan = _rnn_layer(layer, xs, mask, cell)

    np.testing.assert_allclose(
        np.asarray(fin_pallas), np.asarray(fin_scan), atol=2e-3, rtol=1e-3
    )


def test_supported_gates():
    assert pallas_rnn.supported(tower("gru"), 8)
    assert not pallas_rnn.supported(tower("gru"), 7)  # batch misaligned
    assert not pallas_rnn.supported(
        dataclasses.replace(tower("gru"), hidden=100), 8
    )
    assert not pallas_rnn.supported(
        dataclasses.replace(tower("gru"), cell="transformer"), 8
    )


def test_encode_raw_flag_fallback():
    """use_pallas_scan on an unsupported shape silently falls back."""
    cfg = dataclasses.replace(tower("gru"), hidden=24, embed_dim=24,
                              use_pallas_scan=True)
    params = init_tower(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(2, 50, size=(B, L)), jnp.int32)
    lengths = jnp.full((B,), L, jnp.int32)
    out = encode_raw(params, cfg, tokens, lengths)
    assert out.shape == (B, 16)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_pallas_rnn_matches_scan_residual(cell):
    """Residual stacking must agree between the Pallas kernel path and
    the lax.scan path (both apply the identity skip OUTSIDE the scan)."""
    cfg = dataclasses.replace(tower(cell), num_layers=3, residual=True)
    params = init_tower(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(B, L, 128)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(2, L + 1, size=(B,)), jnp.int32)
    valid = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)

    fin_pallas = pallas_rnn.rnn_encode(params, cfg, emb, valid, interpret=True)

    from sse_tpu.models.towers import _rnn_layer, _COMPUTE_DTYPE

    xs = emb.transpose(1, 0, 2).astype(_COMPUTE_DTYPE)
    mask = valid.T[:, :, None]
    fin_scan = None
    for li, layer in enumerate(params["layers"]):
        ys, fin = _rnn_layer(layer, xs, mask, cell)
        if li > 0:
            fin_scan = fin + xs[-1].astype(jnp.float32)
            xs = xs + ys
        else:
            fin_scan, xs = fin, ys

    np.testing.assert_allclose(
        np.asarray(fin_pallas), np.asarray(fin_scan), atol=2e-3, rtol=1e-3
    )
