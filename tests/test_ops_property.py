"""Property tests for the numerics core (no reference needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_tpu.ops import (
    dct2, haar_decompose, haar_reconstruct, modrelu, pruned_irfft_single,
    rfft_phasor,
)


@pytest.mark.parametrize("length", [8, 64, 96, 128, 197, 1024])
def test_haar_pr_roundtrip(length):
    """Perfect reconstruction for ANY length — incl. 96/197 where the
    reference crashes (SURVEY §3.6-D)."""
    x = jax.random.normal(jax.random.key(0), (2, 3, length))
    coeffs, lengths = haar_decompose(x)
    recon = haar_reconstruct(coeffs, lengths)
    assert recon.shape == x.shape
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=2e-5)


def test_haar_orthonormal_energy():
    x = jax.random.normal(jax.random.key(1), (4, 64))
    coeffs, _ = haar_decompose(x)
    energy = sum(float(jnp.sum(jnp.square(c))) for c in coeffs)
    np.testing.assert_allclose(energy, float(jnp.sum(jnp.square(x))), rtol=1e-5)


def test_dct2_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 17)).astype(np.float32)
    n = x.shape[-1]
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    basis = 2.0 * np.cos(np.pi * k * (2 * m + 1) / (2 * n))   # (k, n)
    ref = x @ basis.T
    out = np.asarray(dct2(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_modrelu_kills_small_magnitudes():
    z = jnp.asarray([0.01 + 0.01j, 1.0 + 1.0j])
    out = modrelu(z, jnp.asarray(-0.1))
    assert jnp.abs(out[0]) == 0.0          # relu(|z|+b) = 0 for |z| < 0.1
    assert jnp.abs(out[1]) > 0.0


def test_pruned_irfft_matches_full_irfft_all_positions():
    rng = np.random.default_rng(1)
    n = 16
    xh = (rng.standard_normal((n // 2 + 1, 4))
          + 1j * rng.standard_normal((n // 2 + 1, 4))).astype(np.complex64)
    full = np.fft.irfft(xh, n=n, axis=0)
    for pos in range(n):
        single = np.asarray(pruned_irfft_single(jnp.asarray(xh), n, pos))
        np.testing.assert_allclose(single, full[pos], atol=1e-5)


def test_gate_bias_neg_inf_zeroes_output():
    """modReLU bias -> -inf kills the gate, so the whole mixed output (sans
    memory) is zero (SURVEY §4.2 property)."""
    from fft_tpu.config import SpectreHeadConfig
    from fft_tpu.layers import spectre_head_apply, spectre_head_init

    cfg = SpectreHeadConfig(embed_dim=16, n_fft=32, pooling_type="mean",
                            fft_impl="jnp")
    params = spectre_head_init(jax.random.key(0), cfg)
    params = dict(params, modrelu_bias=jnp.full_like(
        params["modrelu_bias"], -1e9))
    x = jax.random.normal(jax.random.key(1), (2, 32, 16))
    out, _ = spectre_head_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_memory_injection_equals_time_domain_add():
    """Adding memory_fft in frequency == adding irfft(memory) in time
    (SURVEY §4.2 property), including the DC/Nyquist convention."""
    from fft_tpu.config import SpectreHeadConfig
    from fft_tpu.layers import spectre_head_apply, spectre_head_init

    cfg = SpectreHeadConfig(embed_dim=16, n_fft=32, pooling_type="mean",
                            fft_impl="jnp")
    params = spectre_head_init(jax.random.key(2), cfg)
    x = jax.random.normal(jax.random.key(3), (2, 32, 16))
    rng = np.random.default_rng(0)
    mem = jnp.asarray((rng.standard_normal((17, 16))
                       + 1j * rng.standard_normal((17, 16))
                       ).astype(np.complex64))
    out_mem, _ = spectre_head_apply(params, cfg, x, memory_fft=mem)
    out_plain, _ = spectre_head_apply(params, cfg, x)
    mem_time = jnp.fft.irfft(mem, n=32, axis=0)
    np.testing.assert_allclose(np.asarray(out_mem),
                               np.asarray(out_plain + mem_time), atol=1e-5)


def test_rfft_phasor_is_rank1_fft_update():
    """Appending token v at position p adds exp(-2pi i k p / n) * v to the
    zero-padded window rFFT — the cache invariant (spectre.py:805-806)."""
    rng = np.random.default_rng(2)
    n, d = 16, 3
    v = rng.standard_normal((n, d)).astype(np.float32)
    acc = np.zeros((n // 2 + 1, d), np.complex64)
    for p in range(n):
        acc += np.asarray(rfft_phasor(n, p))[:, None] * v[p]
    np.testing.assert_allclose(acc, np.fft.rfft(v, axis=0), atol=1e-4)
