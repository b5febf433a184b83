"""Fused banded+inverse causal kernel vs the jnp segmented path
(interpreter mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fft_tpu.kernels.pallas_causal as pc
from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_multihead_apply, spectre_multihead_init
from tests.golden_utils import rel_err


@pytest.fixture(autouse=True)
def _interpret():
    old = pc.INTERPRET
    pc.INTERPRET = True
    yield
    pc.INTERPRET = old


def _cfg(fft_impl):
    return SpectreConfig(embed_dim=128, num_heads=2, n_fft=64,
                         pooling_type="mean", wavelet_on_rate=0.0,
                         causal=True, causal_chunk=16, causal_impl="segmented",
                         fft_impl=fft_impl)


def test_banded_inverse_matches_ref():
    rng = np.random.default_rng(0)
    b, nc, chunk, d, cols = 2, 4, 16, 128, 8
    f2 = chunk + 1
    vfr = jnp.asarray(rng.standard_normal((b, nc, f2, d)).astype(np.float32))
    vfi = jnp.asarray(rng.standard_normal((b, nc, f2, d)).astype(np.float32))
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, nc, f2, cols)).astype(np.float32))
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, nc, f2, cols)).astype(np.float32))
    got = pc.banded_inverse(vfr, vfi, kfr, kfi, chunk, False, True)
    ref = pc._banded_inverse_ref(vfr, vfi, kfr, kfi, chunk)
    assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5


def test_banded_inverse_blocked_f2_matches_ref():
    """Shapes past the single-block VMEM bound: exercises the nf > 1
    frequency-blocked accumulation path (round-2 extension)."""
    rng = np.random.default_rng(1)
    b, nc, chunk, d, cols = 1, 8, 512, 128, 8
    f2 = chunk + 1
    fb, nf = pc._fb_plan(nc, f2)
    assert nf > 1, (fb, nf)          # must actually hit the blocked path
    vfr = jnp.asarray(rng.standard_normal((b, nc, f2, d)).astype(np.float32))
    vfi = jnp.asarray(rng.standard_normal((b, nc, f2, d)).astype(np.float32))
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, nc, f2, cols)).astype(np.float32))
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, nc, f2, cols)).astype(np.float32))
    got = pc.banded_inverse(vfr, vfi, kfr, kfi, chunk, False, True)
    ref = pc._banded_inverse_ref(vfr, vfi, kfr, kfi, chunk)
    assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5


def test_causal_multihead_pallas_matches_matmul():
    params = spectre_multihead_init(jax.random.key(0), _cfg("matmul"))
    x = jax.random.normal(jax.random.key(1), (2, 64, 128))
    ref = np.asarray(spectre_multihead_apply(params, _cfg("matmul"), x))
    got = np.asarray(spectre_multihead_apply(params, _cfg("pallas"), x))
    assert rel_err(got, ref) < 1e-5


def test_causal_pallas_grads():
    params = spectre_multihead_init(jax.random.key(2), _cfg("matmul"))
    x = jax.random.normal(jax.random.key(3), (1, 64, 128))

    def loss(p, impl):
        return jnp.sum(spectre_multihead_apply(p, _cfg(impl), x) ** 2)

    ga = jax.grad(lambda p: loss(p, "matmul"))(params)
    gb = jax.grad(lambda p: loss(p, "pallas"))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        assert rel_err(np.asarray(b), np.asarray(a)) < 1e-4
