"""Real-backend kernel smoke tests (suite of record for chip behavior).

These compile and run the fused Pallas kernels on the live (non-CPU)
backend and check numerics against the matmul-FFT composition.  They are
SKIPPED on CPU — the interpreter-mode tests cover semantics there — and
exist because interpreter-green kernels have shipped with chip-only
lowering bugs twice (dynamic_slice on values, FB%128 block rule).
Run: PYTHONPATH=.:/root/.axon_site python -m pytest tests/test_tpu_smoke.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="needs the real TPU backend")


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


@requires_tpu
def test_fused_mix_chip():
    from fft_tpu.kernels.pallas_fft import _unfused_mix, fused_spectral_mix
    b, n, d, hg = 4, 1024, 512, 32
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_r = jnp.asarray(rng.standard_normal((b, n // 2 + 1, hg)), jnp.float32)
    g_i = jnp.asarray(rng.standard_normal((b, n // 2 + 1, hg)), jnp.float32)

    @jax.jit
    def run(v, g_r, g_i):
        g = jax.lax.complex(g_r, g_i)
        return (fused_spectral_mix(v, g, None, n_fft=n, interpret=False),
                _unfused_mix(v, g, None, n))

    y, ref = run(v, g_r, g_i)
    assert _rel(y, ref) < 1e-5


@requires_tpu
def test_fused_causal_bwd_chip():
    from fft_tpu.kernels import pallas_causal as pc
    b, nc, chunk, d, cols = 2, 8, 256, 512, 32
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    ybar = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    got = pc._fused_causal_bwd_call(v, kfr, kfi, ybar, chunk=chunk,
                                    cols=cols, fast=False, interpret=False)
    ref = jax.jit(pc._fused_causal_bwd,
                  static_argnums=(4, 5, 6))(v, kfr, kfi, ybar, chunk, cols,
                                            jax.lax.Precision.HIGHEST)
    for g, r in zip(got, ref):
        assert _rel(g, r) < 1e-5


@requires_tpu
def test_fused_causal_v2_chip():
    from fft_tpu.kernels import pallas_causal as pc
    b, nc, chunk, d, cols = 2, 8, 256, 512, 32
    assert pc.fused_mix_supported(nc, chunk, d)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    y = pc.fused_causal_mix(v, kfr, kfi, chunk, cols, False, False)
    ref = jax.jit(pc._fused_causal_ref,
                  static_argnums=(3, 4))(v, kfr, kfi, chunk, cols)
    assert _rel(y, ref) < 1e-5


@requires_tpu
def test_banded_inverse_v1_chip():
    from fft_tpu.kernels import pallas_causal as pc
    b, nc, chunk, d, cols = 1, 8, 2048, 256, 32
    f2 = chunk + 1
    rng = np.random.default_rng(2)
    vfr = jnp.asarray(rng.standard_normal((b, nc, f2, d)), jnp.float32)
    vfi = jnp.asarray(rng.standard_normal((b, nc, f2, d)), jnp.float32)
    kfr = jnp.asarray(rng.standard_normal((b, nc, nc, f2, cols)), jnp.float32)
    kfi = jnp.asarray(rng.standard_normal((b, nc, nc, f2, cols)), jnp.float32)
    y = pc.banded_inverse(vfr, vfi, kfr, kfi, chunk, False, False)
    ref = jax.jit(pc._banded_inverse_ref, static_argnums=4)(
        vfr, vfi, kfr, kfi, chunk)
    assert _rel(y, ref) < 1e-4


@requires_tpu
def test_causal_block_pallas_chip():
    """bench-config causal block end-to-end on chip: pallas vs matmul."""
    from fft_tpu.config import SpectreConfig
    from fft_tpu.layers import spectre_block_apply, spectre_block_init

    def cfg(impl):
        return SpectreConfig(embed_dim=512, num_heads=8, n_fft=2048,
                             pooling_type="mean", wavelet_on_rate=0.0,
                             causal=True, causal_chunk=256,
                             causal_impl="segmented", fft_impl=impl,
                             compute_dtype="bfloat16")

    params = spectre_block_init(jax.random.key(0), cfg("matmul"))
    x = jax.random.normal(jax.random.key(1), (2, 2048, 512), jnp.bfloat16)
    ref = np.asarray(jax.jit(
        lambda p, x: spectre_block_apply(p, cfg("matmul"), x))(params, x))
    got = np.asarray(jax.jit(
        lambda p, x: spectre_block_apply(p, cfg("pallas"), x))(params, x))
    assert _rel(got, ref) < 5e-2     # bf16 fast path vs bf16 matmul path


@requires_tpu
def test_kf_spectra_chip():
    from fft_tpu.kernels import pallas_causal as pc
    n_fft, chunk, L = 1024, 256, 128
    assert pc.kf_spectra_supported(n_fft, chunk)
    rng = np.random.default_rng(3)
    f = n_fft // 2 + 1
    gr = jnp.asarray(rng.standard_normal((2, f, L)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((2, f, L)), jnp.float32)
    kr, ki = pc.kf_spectra(gr, gi, n_fft, chunk, False, False)
    rr, ri = jax.jit(pc._kf_spectra_ref, static_argnums=(2, 3))(
        gr, gi, n_fft, chunk)
    assert _rel(kr, rr) < 1e-5
    assert _rel(ki, ri) < 1e-5


@requires_tpu
def test_fused_causal_v2_staged_out_chip():
    """chunk >= 512: staged-inverse output stage (delay identity)."""
    from fft_tpu.kernels import pallas_causal as pc
    b, nc, chunk, d, cols = 1, 4, 512, 512, 32
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    y = pc._fused_causal_call(v, kfr, kfi, chunk=chunk, cols=cols,
                              fast=False, interpret=False, staged=True,
                              dblk=128)
    ref = jax.jit(pc._fused_causal_ref,
                  static_argnums=(3, 4))(v, kfr, kfi, chunk, cols)
    assert _rel(y, ref) < 1e-5


@requires_tpu
def test_fused_causal_bwd_staged_chip():
    from fft_tpu.kernels import pallas_causal as pc
    b, nc, chunk, d, cols = 1, 4, 512, 512, 32
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    ybar = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    got = pc._fused_causal_bwd_call(v, kfr, kfi, ybar, chunk=chunk,
                                    cols=cols, fast=False, interpret=False,
                                    staged=True, dblk=128)
    ref = jax.jit(pc._fused_causal_bwd,
                  static_argnums=(4, 5, 6))(v, kfr, kfi, ybar, chunk, cols,
                                            jax.lax.Precision.HIGHEST)
    for g, r in zip(got, ref):
        assert _rel(g, r) < 1e-5


@requires_tpu
def test_fused_causal_bf16_scratch_chip():
    from fft_tpu.kernels import pallas_causal as pc
    b, nc, chunk, d, cols = 1, 4, 512, 512, 32
    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.bfloat16)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    got = pc._fused_causal_call(v, kfr, kfi, chunk=chunk, cols=cols,
                                fast=True, interpret=False, scr_bf16=True)
    ref = jax.jit(pc._fused_causal_ref,
                  static_argnums=(3, 4))(v, kfr, kfi, chunk, cols)
    assert _rel(np.asarray(got, np.float32),
                np.asarray(ref, np.float32)) < 3e-2


@requires_tpu
def test_exact_f32_2048_deep_scan_chain_chip():
    """Regression for the scoped-VMEM overrun (9b884f7): exact-mode (f32,
    HIGHEST-precision) direct mix at n_fft 2048 inside a DEEP scan chain
    tripped the 116 MB limit by ~5 MB at dblk 512; the dispatch now caps
    exact-mode dblk at 256 for n_fft >= 2048.  This pins the formerly
    failing configuration: compile + run a 24-step chained scan and check
    the chain end against the matmul-FFT composition."""
    from fft_tpu.kernels.pallas_fft import _unfused_mix, fused_spectral_mix
    b, n, d, hg = 4, 2048, 512, 32
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    g_r = jnp.asarray(
        rng.standard_normal((b, n // 2 + 1, hg)) * 0.1, jnp.float32)
    g_i = jnp.asarray(
        rng.standard_normal((b, n // 2 + 1, hg)) * 0.1, jnp.float32)
    # complex64 must be built INSIDE jit on this backend — an eager
    # lax.complex produces a device complex array the relay cannot hold

    def chain(mix_fn, v, g_r, g_i):
        g = jax.lax.complex(g_r, g_i)

        def body(h, _):
            out = mix_fn(h, g)
            # data-dependent chaining, same as the bench harness
            return (h + 0.25 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=24)
        return h

    run = jax.jit(lambda v, gr, gi: chain(
        lambda h, g: fused_spectral_mix(h, g, None, n_fft=n, fast=False,
                                        interpret=False), v, gr, gi))
    ref = jax.jit(lambda v, gr, gi: chain(
        lambda h, g: _unfused_mix(h, g, None, n, fast=False), v, gr, gi))
    assert _rel(run(v, g_r, g_i), ref(v, g_r, g_i)) < 1e-5


@requires_tpu
def test_mix_matmul_bf16_16k_chip():
    """Round-5 regression: the split-real bf16-resident composition (the
    fast-mode dispatch past the fused kernels' reach, n_fft >= 16384)
    must run on chip and stay at bf16-activation distance from the f32
    complex composition, including the radix-256 level-minimized plan at
    64k complex-half lengths."""
    from fft_tpu.kernels.matfft import mix_matmul_bf16
    from fft_tpu.kernels.pallas_fft import _unfused_mix
    rng = np.random.default_rng(7)
    for n in (16384, 65536):
        d, hg = 256, 32
        v = jnp.asarray(rng.standard_normal((1, n, d)), jnp.bfloat16)
        gr = jnp.asarray(rng.standard_normal((1, n // 2 + 1, hg)),
                         jnp.float32)
        gi = jnp.asarray(rng.standard_normal((1, n // 2 + 1, hg)),
                         jnp.float32)
        got = jax.jit(mix_matmul_bf16,
                      static_argnums=(3,))(v, gr, gi, n)
        ref = jax.jit(lambda v, gr, gi, n=n: _unfused_mix(
            v, jax.lax.complex(gr, gi), None, n, fast=False))(v, gr, gi)
        assert _rel(np.asarray(got, np.float32),
                    np.asarray(ref, np.float32)) < 3e-2, n
