"""Segmented (overlap-save) causal mix == 2N-FFT causal mix, single-device
and sequence-sharded."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_multihead_apply, spectre_multihead_init
from fft_tpu.parallel import make_mesh
from tests.golden_utils import rel_err


def _cfg(impl, chunk=8, seq=32):
    return SpectreConfig(embed_dim=32, num_heads=4, n_fft=seq,
                         pooling_type="mean", wavelet_on_rate=0.0,
                         causal=True, causal_chunk=chunk, causal_impl=impl,
                         fft_impl="matmul")


def test_segmented_equals_fft2n():
    params = spectre_multihead_init(jax.random.key(0), _cfg("fft2n"))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32))
    a = spectre_multihead_apply(params, _cfg("fft2n"), x)
    b = spectre_multihead_apply(params, _cfg("segmented"), x)
    assert rel_err(np.asarray(b), np.asarray(a)) < 2e-5


def test_segmented_gradients_match():
    params = spectre_multihead_init(jax.random.key(2), _cfg("fft2n"))
    x = jax.random.normal(jax.random.key(3), (1, 32, 32))

    def loss(p, impl):
        return jnp.sum(spectre_multihead_apply(p, _cfg(impl), x) ** 2)

    ga = jax.grad(lambda p: loss(p, "fft2n"))(params)
    gb = jax.grad(lambda p: loss(p, "segmented"))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        assert rel_err(np.asarray(b), np.asarray(a)) < 1e-4


def test_segmented_sequence_sharded():
    """Causal SP: sequence sharded over 4 devices, segmented algorithm ==
    single-device 2N result (config 4's 'causal gating + sharded FFT')."""
    mesh = make_mesh(data=1, seq=4, model=1)
    cfg = _cfg("segmented", chunk=8, seq=64)
    params = spectre_multihead_init(jax.random.key(4), cfg)
    x = jax.random.normal(jax.random.key(5), (2, 64, 32))
    expected = np.asarray(
        spectre_multihead_apply(params, _cfg("fft2n", 8, 64), x))

    @jax.jit
    def run(params, x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, "seq", None)))
        return spectre_multihead_apply(params, cfg, x)

    got = np.asarray(run(params, x))
    assert rel_err(got, expected) < 2e-5
