"""Mixed precision: bf16 compute vs fp32 within the BASELINE bf16 budget
(<=1e-2 rel), and training stability in bf16."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.models.lm import LMConfig, lm_apply, lm_init
from tests.golden_utils import rel_err


def test_block_bf16_close_to_fp32():
    cfg32 = SpectreConfig(embed_dim=64, num_heads=4, n_fft=128,
                          pooling_type="mean", wavelet_on_rate=0.0,
                          memory_size=8, fft_impl="matmul")
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = spectre_block_init(jax.random.key(0), cfg32)
    x = jax.random.normal(jax.random.key(1), (2, 128, 64))
    out32 = spectre_block_apply(params, cfg32, x)
    out16 = spectre_block_apply(params, cfg16, x)
    assert out16.dtype == jnp.bfloat16
    assert rel_err(np.asarray(out16, np.float32), np.asarray(out32)) < 1e-2


def test_lm_bf16_loss_close_and_logits_fp32():
    import optax
    block = SpectreConfig(embed_dim=32, num_heads=4, n_fft=32,
                          pooling_type="mean", wavelet_on_rate=0.0,
                          causal=True, causal_chunk=8, fft_impl="matmul")
    cfg32 = LMConfig(vocab_size=32, num_layers=2, max_seq=32, block=block)
    cfg16 = LMConfig(vocab_size=32, num_layers=2, max_seq=32,
                     block=dataclasses.replace(block,
                                               compute_dtype="bfloat16"))
    params = lm_init(jax.random.key(0), cfg32)
    toks = jax.random.randint(jax.random.key(1), (2, 32), 0, 32)
    l32 = lm_apply(params, cfg32, toks)
    l16 = lm_apply(params, cfg16, toks)
    assert l16.dtype == jnp.float32
    ce32 = float(jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        l32[:, :-1], toks[:, 1:])))
    ce16 = float(jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        l16[:, :-1], toks[:, 1:])))
    assert abs(ce16 - ce32) / ce32 < 2e-2, (ce32, ce16)
