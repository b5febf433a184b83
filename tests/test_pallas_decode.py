"""Fused decode-step kernel vs the jnp decode path (interpreter mode).

The fused kernel (kernels/pallas_decode.py) collapses the prefix-FFT
phasor update + gated mix + pruned irFFT (spectre.py:799-806, 605-609)
into one pass; these tests drive it through the full block decode loop —
past the window wrap, so eviction runs — and require trajectory match
with the three-pass jnp path.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fft_tpu.kernels.pallas_decode as pd
from fft_tpu.config import SpectreConfig
from fft_tpu.decode import (
    cache_init, spectre_block_decode_step, spectre_block_prefill,
)
from fft_tpu.layers import spectre_block_init


def _run(cfg, params, x, steps):
    b, n, d = x.shape
    cache = cache_init(b, cfg.num_heads, cfg.n_fft,
                       d // cfg.num_heads)
    cache = spectre_block_prefill(params, cfg, x, cache)
    xt = x[:, -1]
    outs = []
    for _ in range(steps):
        xt, cache = spectre_block_decode_step(params, cfg, xt, cache)
        outs.append(xt)
    return jnp.stack(outs), cache


def test_fused_decode_matches_jnp():
    cfg = SpectreConfig(embed_dim=128, num_heads=2, n_fft=64,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=8)
    params = spectre_block_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 128))

    old = (pd.INTERPRET, pd.ENABLE)
    try:
        pd.INTERPRET = False          # backend is cpu -> jnp path
        ref, cr = _run(cfg, params, x, 70)
        pd.INTERPRET = True           # fused path via the interpreter
        pd.ENABLE = True
        got, cg = _run(cfg, params, x, 70)
    finally:
        pd.INTERPRET, pd.ENABLE = old
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel
    assert float(jnp.max(jnp.abs(cg.prefix_re - cr.prefix_re))) < 1e-4
    assert float(jnp.max(jnp.abs(cg.sum_q - cr.sum_q))) < 1e-4
