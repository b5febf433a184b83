"""Fused Pallas spectral-mix kernel vs the jnp composition (interpreter mode
on CPU; the same kernel is compiled by Mosaic on the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fft_tpu.kernels.pallas_fft as pf
from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from tests.golden_utils import rel_err


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pf.INTERPRET
    pf.INTERPRET = True
    yield
    pf.INTERPRET = old


@pytest.mark.parametrize("n", [64, 512, 2048])
@pytest.mark.parametrize("with_mem", [False, True])
def test_fused_mix_matches_jnp(n, with_mem):
    rng = np.random.default_rng(0)
    b, d = 2, 128
    f = n // 2 + 1
    v = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(
        (rng.standard_normal((b, f, d))
         + 1j * rng.standard_normal((b, f, d))).astype(np.complex64))
    mem = None
    if with_mem:
        mem = jnp.asarray(
            (rng.standard_normal((f, d))
             + 1j * rng.standard_normal((f, d))).astype(np.complex64))
    mixed = gate * jnp.fft.rfft(v, axis=1)
    if mem is not None:
        mixed = mixed + mem
    ref = np.asarray(jnp.fft.irfft(mixed, n=n, axis=1))
    got = np.asarray(pf.fused_spectral_mix(v, gate, mem, n_fft=n))
    assert rel_err(got, ref) < 2e-6


@pytest.mark.parametrize("n,with_mem", [(16384, False), (16384, True),
                                        (32768, False), (65536, False)])
def test_twopass_mix_matches_jnp(n, with_mem, monkeypatch):
    """The two-pass streamed kernel vs the composition; compact
    (H*G)-column gate like the production layer path.  The kernel is
    dispatch-gated OFF in production (not yet faster than unfused on
    chip — see pallas_mix_supported); parity stays pinned here."""
    monkeypatch.setattr(pf, "TWOPASS_ENABLE", True)
    rng = np.random.default_rng(1)
    b, d, hg = 1, 128, 32
    f = n // 2 + 1
    v = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(
        (rng.standard_normal((b, f, hg))
         + 1j * rng.standard_normal((b, f, hg))).astype(np.complex64))
    mem = None
    if with_mem:
        mem = jnp.asarray(
            (rng.standard_normal((f, d))
             + 1j * rng.standard_normal((f, d))).astype(np.complex64))
    gate_full = jnp.repeat(gate, d // hg, axis=-1)
    mixed = gate_full * jnp.fft.rfft(v, axis=1)
    if mem is not None:
        mixed = mixed + mem
    ref = np.asarray(jnp.fft.irfft(mixed, n=n, axis=1))
    assert pf.pallas_mix_supported(n)
    got = np.asarray(pf.fused_spectral_mix(v, gate, mem, n_fft=n))
    assert rel_err(got, ref) < 2e-6


def test_pallas_block_and_grads_match_jnp():
    base = dict(embed_dim=128, num_heads=2, n_fft=64, pooling_type="mean",
                wavelet_on_rate=0.0, memory_size=8)
    cfg_ref = SpectreConfig(**base, fft_impl="jnp")
    cfg_pl = SpectreConfig(**base, fft_impl="pallas")
    params = spectre_block_init(jax.random.key(0), cfg_ref)
    x = jax.random.normal(jax.random.key(1), (2, 64, 128))
    ref = np.asarray(spectre_block_apply(params, cfg_ref, x))
    got = np.asarray(spectre_block_apply(params, cfg_pl, x))
    assert rel_err(got, ref) < 1e-6

    # short sequence -> zero-pad path
    x2 = jax.random.normal(jax.random.key(2), (2, 50, 128))
    ref2 = np.asarray(spectre_block_apply(params, cfg_ref, x2))
    got2 = np.asarray(spectre_block_apply(params, cfg_pl, x2))
    assert rel_err(got2, ref2) < 1e-6

    # exact adjoint via the custom VJP
    def loss(p, cfg):
        return jnp.sum(spectre_block_apply(p, cfg, x) ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg_ref))(params)
    g_pl = jax.grad(lambda p: loss(p, cfg_pl))(params)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        assert rel_err(np.asarray(a), np.asarray(b)) < 1e-5


def test_pallas_support_predicate():
    assert pf.pallas_mix_supported(1024)
    assert pf.pallas_mix_supported(2048)
    assert pf.pallas_mix_supported(4096)          # raised VMEM scoped limit
    assert pf.pallas_mix_supported(8192)
    assert not pf.pallas_mix_supported(16384)     # two-pass gated off
    assert not pf.pallas_mix_supported(63)        # odd
    try:
        pf.TWOPASS_ENABLE = True
        assert pf.pallas_mix_supported(16384)     # two-pass streamed kernel
        assert pf.pallas_mix_supported(32768)
        assert pf.pallas_mix_supported(65536)
        assert not pf.pallas_mix_supported(131072)  # beyond the plan table
    finally:
        pf.TWOPASS_ENABLE = False


def test_direct_bwd_kernel_matches_vjp():
    """Fused adjoint kernel == jax.vjp of the unfused composition, incl.
    the complex-cotangent conjugation and the multi-j-block gate
    accumulation path."""
    n, b, d, hg = 128, 2, 256, 8
    f_half = n // 2 + 1
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    gate = jnp.asarray(
        rng.standard_normal((b, f_half, hg))
        + 1j * rng.standard_normal((b, f_half, hg)), jnp.complex64)
    mem = jnp.asarray(
        rng.standard_normal((f_half, d))
        + 1j * rng.standard_normal((f_half, d)), jnp.complex64)
    ybar = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)

    # fast=True routes the fused adjoint kernel (exact-mode _mix_bwd uses
    # the plain jax.vjp fallback); under interpret mode the dots are f32
    # either way, so the 1e-5 tolerance holds.
    for m in (mem, None):
        got = pf._mix_bwd(n, True, (v, gate, m), ybar)
        _, vjp = jax.vjp(
            lambda v_, g_, m_: pf._unfused_mix(v_, g_, m_, n, False),
            v, gate, m)
        ref = vjp(ybar)
        for g_, r_ in zip(got, ref):
            if r_ is None:
                assert g_ is None
                continue
            assert rel_err(np.asarray(g_), np.asarray(r_)) < 1e-5

    # explicit narrow dblk exercises the j-accumulated gate cotangent
    g = gate
    vbar, gbr, gbi = pf._direct_mix_bwd_call(
        v, jnp.real(g), jnp.imag(g), ybar, n_fft=n, interpret=True,
        dblk=128)
    _, vjp = jax.vjp(
        lambda v_, g_, m_: pf._unfused_mix(v_, g_, m_, n, False),
        v, gate, None)
    rv, rg, _ = vjp(ybar)
    assert rel_err(np.asarray(vbar), np.asarray(rv)) < 1e-5
    assert rel_err(np.asarray(jax.lax.complex(gbr, -gbi)),
                   np.asarray(rg)) < 1e-5
