"""MXU matmul-FFT vs jnp.fft across sizes + autodiff exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_tpu.kernels.matfft import irfft_matmul, plan_factors, rfft_matmul


@pytest.mark.parametrize("n", [8, 128, 256, 384, 1024, 4096, 16384, 65536])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n, 4)).astype(np.float32)
    ours = np.asarray(rfft_matmul(jnp.asarray(x), n, axis=1))
    ref = np.fft.rfft(x, n=n, axis=1)
    rel = np.max(np.abs(ours - ref)) / np.max(np.abs(ref))
    assert rel < 2e-6, rel


@pytest.mark.parametrize("n", [128, 1024, 4096])
def test_roundtrip(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n, 4)).astype(np.float32)
    back = np.asarray(irfft_matmul(rfft_matmul(jnp.asarray(x), n, axis=1),
                                   n, axis=1))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_zero_pad_semantics():
    """rfft(x, n > len): implicit zero-padding, like torch.fft.rfft(n=...)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 100, 4)).astype(np.float32)
    ours = np.asarray(rfft_matmul(jnp.asarray(x), 256, axis=1))
    ref = np.fft.rfft(x, n=256, axis=1)
    assert np.max(np.abs(ours - ref)) / np.max(np.abs(ref)) < 2e-6


def test_irfft_nonhermitian_convention():
    """Complex DC/Nyquist bins: numpy/torch irfft ignore their imaginary
    parts; the spectral-mix output spectrum hits this case (gate * V_fft is
    not hermitian-derived)."""
    rng = np.random.default_rng(3)
    xh = (rng.standard_normal((65, 4))
          + 1j * rng.standard_normal((65, 4))).astype(np.complex64)
    ours = np.asarray(irfft_matmul(jnp.asarray(xh), 128, axis=0))
    ref = np.fft.irfft(xh, n=128, axis=0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_plan_factors():
    assert plan_factors(1024) is not None
    assert plan_factors(65536) is not None
    assert plan_factors(2 * 131) is None      # prime 131 > 128
    assert plan_factors(7) is None            # odd
    # large powers of two trade radix_sum for one fewer recursion level
    # (HBM passes dominate there — see benchmarks/ablate_fft_plan.py);
    # radix 256 is still a single dense MXU contraction
    assert all(f <= 256 for f in plan_factors(65536))
    assert len(plan_factors(65536)) == 2


def test_autodiff_matches_jnp_fft():
    """The transform is linear; grads must agree with jnp.fft's."""
    x = jax.random.normal(jax.random.key(0), (2, 64, 4))

    def loss_ours(x):
        f = rfft_matmul(x, 64, axis=1)
        return jnp.sum(jnp.abs(f) ** 2)

    def loss_ref(x):
        f = jnp.fft.rfft(x, n=64, axis=1)
        return jnp.sum(jnp.abs(f) ** 2)

    g1 = jax.grad(loss_ours)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_irfft_gradient():
    xh = jax.random.normal(jax.random.key(1), (2, 33, 4), dtype=jnp.complex64)

    def loss_ours(z):
        return jnp.sum(irfft_matmul(z, 64, axis=1) ** 2)

    def loss_ref(z):
        return jnp.sum(jnp.fft.irfft(z, n=64, axis=1) ** 2)

    g1 = jax.grad(loss_ours, holomorphic=False)(xh)
    g2 = jax.grad(loss_ref, holomorphic=False)(xh)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_mix_matmul_bf16_matches_complex_composition():
    """Split-real bf16-resident mix (the fast-mode 16k+ dispatch) vs the
    f32 complex composition: same math, bf16 storage between levels only
    (~5e-3 rel at bf16-activation level)."""
    from fft_tpu.kernels.matfft import mix_matmul_bf16
    from fft_tpu.kernels.pallas_fft import _unfused_mix
    rng = np.random.default_rng(0)
    for n, d, hg in ((512, 256, 32), (2048, 128, 16)):
        v = jnp.asarray(rng.standard_normal((2, n, d)), jnp.bfloat16)
        gr = jnp.asarray(rng.standard_normal((2, n // 2 + 1, hg)),
                         jnp.float32)
        gi = jnp.asarray(rng.standard_normal((2, n // 2 + 1, hg)),
                         jnp.float32)
        ref = np.asarray(_unfused_mix(v, jax.lax.complex(gr, gi), None, n,
                                      fast=False), np.float32)
        got = np.asarray(mix_matmul_bf16(v, gr, gi, n), np.float32)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, (n, d, hg, rel)


def test_mix_matmul_bf16_gradients_flow():
    """The split-real path is plain jnp (linear in v and bilinear in the
    gate): autodiff must produce finite cotangents for both."""
    from fft_tpu.kernels.matfft import mix_matmul_bf16
    rng = np.random.default_rng(1)
    n, d, hg = 256, 128, 16
    v = jnp.asarray(rng.standard_normal((1, n, d)), jnp.bfloat16)
    gr = jnp.asarray(rng.standard_normal((1, n // 2 + 1, hg)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((1, n // 2 + 1, hg)), jnp.float32)

    def loss(v, gr, gi):
        return jnp.sum(mix_matmul_bf16(v, gr, gi, n).astype(jnp.float32)
                       ** 2)

    gv, ggr, ggi = jax.grad(loss, argnums=(0, 1, 2))(v, gr, gi)
    for g in (gv, ggr, ggi):
        assert np.isfinite(np.asarray(g, np.float32)).all()
        assert np.abs(np.asarray(g, np.float32)).max() > 0
