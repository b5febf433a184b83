"""Toeplitz gate smoothing end-to-end (the reference's use_toeplitz=True
crashes at construction — SURVEY §3.6-A; we implement the intended op and
validate it against the separately-goldened complex_conv1d)."""

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig, SpectreHeadConfig
from fft_tpu.decode import cache_init, spectre_multihead_decode_step
from fft_tpu.layers import (
    spectre_head_apply, spectre_head_init, spectre_multihead_apply,
    spectre_multihead_init,
)


def test_toeplitz_head_forward_and_grads():
    cfg = SpectreHeadConfig(embed_dim=16, n_fft=32, pooling_type="mean",
                            use_toeplitz=True, toeplitz_bw=2, fft_impl="jnp")
    params = spectre_head_init(jax.random.key(0), cfg)
    assert params["toeplitz_kernel"].shape == (2, 5)     # [re;im] x (2bw+1)
    x = jax.random.normal(jax.random.key(1), (2, 32, 16))
    out, _ = spectre_head_apply(params, cfg, x)
    assert bool(jnp.all(jnp.isfinite(out)))

    # the kernel genuinely participates
    p2 = dict(params, toeplitz_kernel=params["toeplitz_kernel"] * 3.0)
    out2, _ = spectre_head_apply(p2, cfg, x)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-4

    g = jax.grad(lambda p: jnp.sum(
        spectre_head_apply(p, cfg, x)[0] ** 2))(params)
    assert float(jnp.max(jnp.abs(g["toeplitz_kernel"]))) > 0.0


def test_toeplitz_decode_equals_forward():
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=16,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        use_toeplitz=True, toeplitz_bw=1, fft_impl="jnp")
    params = spectre_multihead_init(jax.random.key(2), cfg)
    n = cfg.n_fft
    x = jax.random.normal(jax.random.key(3), (1, n + 2, 32)) * 0.5

    heads = params["heads"]
    xh = jnp.moveaxis(x[:, :n].reshape(1, n, 4, 8), 2, 1)
    q = jnp.einsum("bhli,hio->bhlo", xh, heads["w_q"]["w"])
    v = jnp.einsum("bhli,hio->bhlo", xh, heads["w_v"]["w"])
    cache = cache_init(1, 4, n, 8)
    from fft_tpu.decode import cache_prefill
    cache = cache_prefill(cache, q, v, fft_impl="jnp")

    for i in range(2):
        y, cache = spectre_multihead_decode_step(params, cfg, x[:, n + i],
                                                 cache)
        fwd = spectre_multihead_apply(params, cfg, x[:, i + 1:n + i + 1])
        err = float(jnp.max(jnp.abs(y - fwd[:, -1]))
                    / jnp.max(jnp.abs(fwd[:, -1])))
        assert err < 5e-5, (i, err)
