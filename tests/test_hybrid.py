"""Hybrid SPECTRE + sliding-window-attention LM: causality, decode==forward,
SWA unit checks."""

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers.attention import sliding_window_attention
from fft_tpu.models.hybrid import (
    HybridConfig, hybrid_apply, hybrid_decode_init, hybrid_decode_step,
    hybrid_init,
)
from tests.golden_utils import rel_err


def _tiny_hybrid(seq=32, window=8):
    return HybridConfig(
        vocab_size=32, num_groups=2, spectre_per_group=1,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=1, fft_impl="jnp"),
        attn_heads=4, attn_window=window, max_seq=seq)


def test_swa_matches_dense_masked_attention():
    """Blockwise sliding-window attention == dense attention with an
    explicit causal band mask."""
    b, n, h, hd, w = 2, 32, 2, 8, 8
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, hd)),
                           dtype=jnp.float32) for _ in range(3))
    out = sliding_window_attention(q, k, v, w)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    qi = jnp.arange(n)[:, None]
    kj = jnp.arange(n)[None, :]
    mask = (qi - kj >= 0) & (qi - kj < w)
    scores = jnp.where(mask, scores, -jnp.inf)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), v)
    assert rel_err(np.asarray(out), np.asarray(ref)) < 1e-5


def test_hybrid_causality():
    cfg = _tiny_hybrid()
    params = hybrid_init(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (2, 32), 0, 32)
    logits = hybrid_apply(params, cfg, toks)
    assert logits.shape == (2, 32, 32)
    toks2 = toks.at[:, 15].set((toks[:, 15] + 1) % 32)
    logits2 = hybrid_apply(params, cfg, toks2)
    np.testing.assert_allclose(np.asarray(logits[:, :15]),
                               np.asarray(logits2[:, :15]), atol=2e-4)
    assert float(jnp.max(jnp.abs(logits[:, 15:] - logits2[:, 15:]))) > 1e-3


def test_hybrid_decode_equals_forward():
    cfg = _tiny_hybrid(seq=16, window=4)
    params = hybrid_init(jax.random.key(2), cfg)
    toks = jax.random.randint(jax.random.key(3), (2, 12), 0, 32)
    fwd = hybrid_apply(params, cfg, toks)

    caches = hybrid_decode_init(cfg, 2)
    step = jax.jit(lambda p, t, i, c: hybrid_decode_step(p, cfg, t, i, c))
    for i in range(12):
        logits, caches = step(params, toks[:, i], i, caches)
        assert rel_err(np.asarray(logits),
                       np.asarray(fwd[:, i])) < 1e-4, i
