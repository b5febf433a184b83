"""Causal spectral gating: no-future-leak + exact decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_tpu.config import SpectreConfig
from fft_tpu.decode import (
    cache_init, spectre_block_decode_step, spectre_multihead_decode_step,
)
from fft_tpu.layers import (
    spectre_block_apply, spectre_block_init, spectre_multihead_apply,
    spectre_multihead_init,
)
from tests.golden_utils import rel_err


def _cfg(**kw):
    base = dict(embed_dim=32, num_heads=4, n_fft=16, pooling_type="mean",
                wavelet_on_rate=0.0, causal=True, fft_impl="jnp")
    base.update(kw)
    return SpectreConfig(**base)


@pytest.mark.parametrize("pooling", ["mean", "dct", "attention"])
def test_causal_no_future_leak(pooling):
    """Perturbing token p must not change outputs at positions < p — for any
    chunking and any pooler (the cumulative descriptor includes at most the
    current chunk's first token; the conv kernel is strictly past-facing)."""
    cfg = _cfg(causal_chunk=4, pooling_type=pooling)
    params = spectre_block_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 16, 32))
    p = 9
    x2 = x.at[:, p].add(3.0)
    out1 = spectre_block_apply(params, cfg, x)
    out2 = spectre_block_apply(params, cfg, x2)
    np.testing.assert_allclose(np.asarray(out1[:, :p]),
                               np.asarray(out2[:, :p]), atol=1e-5)
    # and the perturbed position itself must change
    assert float(jnp.max(jnp.abs(out1[:, p] - out2[:, p]))) > 1e-3


@pytest.mark.parametrize("pooling", ["mean", "dct", "attention"])
def test_causal_chunk1_equals_decode(pooling):
    """causal_chunk=1 training forward == token-by-token decode (the
    train/decode consistency the reference lacks, SURVEY §3.6-C) — for all
    three poolers.  mean matches the reference decode descriptor sum_q/N;
    dct/attention match the framework's 'window' streaming descriptor (the
    reference has no streaming counterpart for them at all)."""
    descr = "reference" if pooling == "mean" else "window"
    cfg = _cfg(causal_chunk=1, pooling_type=pooling,
               decode_descriptor=descr)
    params = spectre_multihead_init(jax.random.key(2), cfg)
    x = jax.random.normal(jax.random.key(3), (2, 12, 32)) * 0.5

    fwd = spectre_multihead_apply(params, cfg, x)           # (2, 12, 32)

    cache = cache_init(2, cfg.num_heads, cfg.n_fft, cfg.head_dim)
    step = jax.jit(
        lambda p, xt, c: spectre_multihead_decode_step(p, cfg, xt, c))
    for i in range(12):
        y, cache = step(params, x[:, i], cache)
        assert rel_err(y, np.asarray(fwd[:, i])) < 5e-5, i


def test_causal_block_with_memory_equals_decode():
    cfg = _cfg(causal_chunk=1, memory_size=4)
    params = spectre_block_init(jax.random.key(4), cfg)
    x = jax.random.normal(jax.random.key(5), (1, 10, 32)) * 0.5
    fwd = spectre_block_apply(params, cfg, x)
    cache = cache_init(1, cfg.num_heads, cfg.n_fft, cfg.head_dim)
    step = jax.jit(
        lambda p, xt, c: spectre_block_decode_step(p, cfg, xt, c))
    for i in range(10):
        y, cache = step(params, x[:, i], cache)
        assert rel_err(y, np.asarray(fwd[:, i])) < 5e-5, i


def test_causal_chunked_close_to_chunk1():
    """Chunked gating only lags the descriptor; outputs stay close to the
    per-token gate version (sanity that chunking is an approximation knob,
    not a different layer)."""
    x = jax.random.normal(jax.random.key(6), (2, 16, 32)) * 0.5
    cfg1 = _cfg(causal_chunk=1)
    cfg4 = _cfg(causal_chunk=4)
    params = spectre_multihead_init(jax.random.key(7), cfg1)
    o1 = np.asarray(spectre_multihead_apply(params, cfg1, x))
    o4 = np.asarray(spectre_multihead_apply(params, cfg4, x))
    # with random (untrained) gates the descriptor lag shifts outputs; the
    # two variants must still be strongly correlated, and chunk boundaries
    # (where descriptors coincide) must agree more closely
    corr = np.corrcoef(o1.ravel(), o4.ravel())[0, 1]
    assert corr > 0.8, corr
    # position 0 uses the identical descriptor in both -> near-identical
    assert rel_err(o4[:, 0], o1[:, 0]) < 1e-4
