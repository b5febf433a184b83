"""Pipeline parallelism: PP block stack == sequential scan (values + grads)
on the fake CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.parallel.pipeline import pipeline_apply
from tests.golden_utils import rel_err


def _make_stage_mesh(num_stages):
    devices = np.asarray(jax.devices()[:num_stages])
    return Mesh(devices, ("stage",))


def _stacked_blocks(cfg, layers, key):
    keys = jax.random.split(key, layers)
    return jax.vmap(lambda k: spectre_block_init(k, cfg))(keys)


@pytest.mark.parametrize("stages,layers,micro", [(2, 4, 2), (4, 4, 4),
                                                 (4, 8, 2)])
def test_pipeline_matches_sequential(stages, layers, micro):
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=32,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        fft_impl="matmul")
    params = _stacked_blocks(cfg, layers, jax.random.key(0))
    mesh = _make_stage_mesh(stages)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32))

    def seq(params, x):
        def body(h, p):
            return spectre_block_apply(p, cfg, h), None
        h, _ = jax.lax.scan(body, x, params)
        return h

    expected = np.asarray(jax.jit(seq)(params, x))

    apply_one = lambda p, h: spectre_block_apply(p, cfg, h)  # noqa: E731
    got = np.asarray(jax.jit(
        lambda p, x: pipeline_apply(p, apply_one, x, mesh=mesh,
                                    num_microbatches=micro))(params, x))
    assert rel_err(got, expected) < 2e-5


def test_pipeline_gradients_match():
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=16,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        fft_impl="matmul")
    params = _stacked_blocks(cfg, 4, jax.random.key(2))
    mesh = _make_stage_mesh(2)
    x = jax.random.normal(jax.random.key(3), (4, 16, 32))
    apply_one = lambda p, h: spectre_block_apply(p, cfg, h)  # noqa: E731

    def loss_pp(params):
        return jnp.sum(pipeline_apply(params, apply_one, x, mesh=mesh,
                                      num_microbatches=2) ** 2)

    def loss_seq(params):
        def body(h, p):
            return spectre_block_apply(p, cfg, h), None
        h, _ = jax.lax.scan(body, x, params)
        return jnp.sum(h ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        assert rel_err(np.asarray(a), np.asarray(b)) < 5e-4
