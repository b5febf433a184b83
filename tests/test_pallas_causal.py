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


def test_fused_causal_v2_matches_ref():
    """v2 whole-mix kernel (segment rFFTs in-kernel) vs the jnp pipeline;
    K in the lane-folded producer layout (B, j, F2, c*cols)."""
    rng = np.random.default_rng(3)
    b, nc, chunk, d, cols = 2, 4, 128, 256, 8
    assert pc.fused_mix_supported(nc, chunk, d)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    got = pc.fused_causal_mix(v, kfr, kfi, chunk, cols, False, True)
    ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
    assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5


def test_fused_causal_v2_grads():
    rng = np.random.default_rng(4)
    b, nc, chunk, d, cols = 1, 3, 128, 128, 4
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)

    def loss(fn):
        return lambda v, kr, ki: jnp.sum(fn(v, kr, ki) ** 2)

    ga = jax.grad(loss(lambda v, kr, ki: pc.fused_causal_mix(
        v, kr, ki, chunk, cols, False, True)), argnums=(0, 1, 2))(v, kfr, kfi)
    gb = jax.grad(loss(lambda v, kr, ki: pc._fused_causal_ref(
        v, kr, ki, chunk, cols)), argnums=(0, 1, 2))(v, kfr, kfi)
    for a, b_ in zip(ga, gb):
        assert rel_err(np.asarray(a), np.asarray(b_)) < 1e-4


def test_causal_multihead_pallas_v2_matches_matmul():
    """Layer-level dispatch into the v2 kernel (chunk >= 128)."""
    def cfg(impl):
        return SpectreConfig(embed_dim=128, num_heads=2, n_fft=512,
                             pooling_type="mean", wavelet_on_rate=0.0,
                             causal=True, causal_chunk=128,
                             causal_impl="segmented", fft_impl=impl)
    params = spectre_multihead_init(jax.random.key(5), cfg("matmul"))
    x = jax.random.normal(jax.random.key(6), (1, 512, 128))
    ref = np.asarray(spectre_multihead_apply(params, cfg("matmul"), x))
    got = np.asarray(spectre_multihead_apply(params, cfg("pallas"), x))
    assert rel_err(got, ref) < 1e-5


def test_kf_spectra_matches_ref():
    """Fused kf kernel (irfft_N + segment rfft_2C in one pass) vs the
    matfft composition."""
    rng = np.random.default_rng(7)
    n_fft, chunk, L = 512, 128, 128
    assert pc.kf_spectra_supported(n_fft, chunk)
    f = n_fft // 2 + 1
    gr = jnp.asarray(rng.standard_normal((2, f, L)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((2, f, L)), jnp.float32)
    kr, ki = pc.kf_spectra(gr, gi, n_fft, chunk, False, True)
    rr, ri = pc._kf_spectra_ref(gr, gi, n_fft, chunk)
    assert rel_err(np.asarray(kr), np.asarray(rr)) < 1e-5
    assert rel_err(np.asarray(ki), np.asarray(ri)) < 1e-5


def test_kf_spectra_grads():
    rng = np.random.default_rng(8)
    n_fft, chunk, L = 256, 64, 128
    f = n_fft // 2 + 1
    gr = jnp.asarray(rng.standard_normal((1, f, L)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((1, f, L)), jnp.float32)

    def loss(fn):
        return lambda a, b: sum(jnp.sum(o ** 2) for o in fn(a, b))

    ga = jax.grad(loss(lambda a, b: pc.kf_spectra(
        a, b, n_fft, chunk, False, True)), argnums=(0, 1))(gr, gi)
    gb = jax.grad(loss(lambda a, b: pc._kf_spectra_ref(
        a, b, n_fft, chunk)), argnums=(0, 1))(gr, gi)
    for a, b_ in zip(ga, gb):
        assert rel_err(np.asarray(a), np.asarray(b_)) < 1e-4


def test_causal_multihead_fully_fused_matches_matmul():
    """Layer-level dispatch where BOTH the kf kernel and the v2 mix kernel
    engage (nc * heads * groups lanes divisible by 128, n == n_fft)."""
    def cfg(impl):
        return SpectreConfig(embed_dim=128, num_heads=4, n_fft=1024,
                             pooling_type="mean", wavelet_on_rate=0.0,
                             causal=True, causal_chunk=128,
                             causal_impl="segmented", fft_impl=impl)
    c = cfg("pallas")
    nc = c.n_fft // c.causal_chunk
    assert (nc * c.num_heads * c.num_groups) % 128 == 0
    assert pc.kf_spectra_supported(c.n_fft, c.causal_chunk)
    params = spectre_multihead_init(jax.random.key(9), cfg("matmul"))
    x = jax.random.normal(jax.random.key(10), (1, 1024, 128))
    ref = np.asarray(spectre_multihead_apply(params, cfg("matmul"), x))
    got = np.asarray(spectre_multihead_apply(params, c, x))
    assert rel_err(got, ref) < 1e-5


def test_fused_causal_v2_staged_out_matches_ref():
    """chunk >= 512 routes the output stage through the staged inverse
    (delay identity) instead of the dense (C, F2) partial-irFFT matrices."""
    rng = np.random.default_rng(11)
    b, nc, chunk, d, cols = 1, 3, 512, 128, 4
    assert pc.fused_mix_supported(nc, chunk, d)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    got = pc._fused_causal_call(v, kfr, kfi, chunk=chunk, cols=cols,
                                fast=False, interpret=True, staged=True,
                                dblk=128)
    ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
    assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5


def test_fused_causal_dense_fwd_matches_ref():
    """Dense segment-FFT forward variant (two MXU matmuls per segment
    instead of the packed staged DFT + untangle VPU passes) against the
    jnp reference, under both output stages."""
    rng = np.random.default_rng(21)
    for staged, chunk, nc in ((False, 512, 3), (True, 512, 3),
                              (False, 128, 4)):
        b, d, cols = 1, 128, 4
        v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)),
                        jnp.float32)
        kfr = jnp.asarray(
            rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
        kfi = jnp.asarray(
            rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
        got = pc._fused_causal_call(v, kfr, kfi, chunk=chunk, cols=cols,
                                    fast=False, interpret=True,
                                    staged=staged, dblk=128,
                                    dense_fwd=True)
        ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
        assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5, (staged,
                                                                  chunk)


def test_fused_causal_bwd_staged_matches_jnp_adjoint():
    """Staged adjoint-irFFT output stage of the fused bwd kernel (chunk >=
    512) vs the hand-derived jnp adjoint."""
    rng = np.random.default_rng(12)
    b, nc, chunk, d, cols = 1, 3, 512, 128, 4
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    ybar = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    got = pc._fused_causal_bwd_call(v, kfr, kfi, ybar, chunk=chunk,
                                    cols=cols, fast=False, interpret=True,
                                    staged=True, dblk=128)
    ref = pc._fused_causal_bwd(v, kfr, kfi, ybar, chunk, cols,
                               jax.lax.Precision.HIGHEST)
    for a, b_ in zip(got, ref):
        assert rel_err(np.asarray(a), np.asarray(b_)) < 1e-5


def test_fused_causal_bf16_scratch_matches_ref():
    """The fast-mode bf16 spectra/accumulator scratch variant (what lets
    nc=16 x chunk=2048 — seq 32k — fit VMEM) stays inside the bf16
    activation budget."""
    assert pc.fused_mix_supported(16, 2048, 512, fast=True)
    # v2 resident layout needs the bf16 scratch for this shape; exact mode
    # is still admitted at the dispatch level via the v3 grid-banded plan
    assert pc._fused_plan(16, 2048, 512, 2, False, 64) is None
    assert pc._fused_plan_v3(16, 2048, 512, 2, False, 64) is not None
    rng = np.random.default_rng(13)
    b, nc, chunk, d, cols = 1, 3, 512, 128, 4
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.bfloat16)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    got = pc._fused_causal_call(v, kfr, kfi, chunk=chunk, cols=cols,
                                fast=True, interpret=True, scr_bf16=True)
    ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
    assert rel_err(np.asarray(got, np.float32),
                   np.asarray(ref, np.float32)) < 3e-2


def test_fused_causal_bwd_bf16_scratch_matches_jnp_adjoint():
    """The fast-mode bf16-scratch bwd variant (what lets the 350M seq-16k
    training shape — nc=8, chunk=2048, d=1024 — run the fused bwd kernel
    instead of the ~4x jnp adjoint) stays inside the bf16 grad budget."""
    assert pc._bwd_plan(8, 2048, 1024, 64, 2, True) is not None
    assert pc._bwd_plan(8, 2048, 1024, 64, 2, False) is None
    rng = np.random.default_rng(14)
    b, nc, chunk, d, cols = 1, 3, 512, 128, 4
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.bfloat16)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    ybar = jnp.asarray(rng.standard_normal((b, nc * chunk, d)),
                       jnp.bfloat16)
    got = pc._fused_causal_bwd_call(v, kfr, kfi, ybar, chunk=chunk,
                                    cols=cols, fast=True, interpret=True,
                                    staged=True, dblk=128, scr_bf16=True)
    ref = pc._fused_causal_bwd(v, kfr, kfi, ybar, chunk, cols,
                               jax.lax.Precision.HIGHEST)
    # cotangents must keep the PRIMAL dtypes (the kernel's bf16 K copy must
    # not leak into the K grads — jax.vjp rejects mismatched cotangents)
    assert got[0].dtype == v.dtype and got[1].dtype == kfr.dtype
    for a, b_ in zip(got, ref):
        assert rel_err(np.asarray(a, np.float32),
                       np.asarray(b_, np.float32)) < 3e-2


def test_fused_causal_v3_matches_ref():
    """v3 grid-banded kernel (c, delta on the grid; single-chunk acc and
    output windows) vs the jnp pipeline — dense and staged output stages,
    plus the kb=128 select path (ncg == 128 -> gpb = 4)."""
    rng = np.random.default_rng(21)
    b, nc, chunk, d, cols = 2, 4, 128, 256, 32
    assert pc._v3_kb(nc, cols) == (128, 4)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
    for staged in (False, True):
        got = pc._fused_causal_call_v3(v, kfr, kfi, chunk=chunk, cols=cols,
                                       fast=False, interpret=True,
                                       staged=staged, dblk=128,
                                       scr_bf16=False)
        assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5, staged


def test_fused_causal_v3_small_ncg_matches_ref():
    """v3 with ncg < 128 (full-width K block, kb = ncg)."""
    rng = np.random.default_rng(22)
    b, nc, chunk, d, cols = 1, 3, 128, 128, 8
    assert pc._v3_kb(nc, cols) == (24, 3)
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    got = pc._fused_causal_call_v3(v, kfr, kfi, chunk=chunk, cols=cols,
                                   fast=False, interpret=True,
                                   staged=False, dblk=128, scr_bf16=False)
    ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
    assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5


def test_fused_causal_v3_plan_covers_long_context():
    """The 350M training shapes the v2 plan rejects are covered by v3:
    seq 32k (nc=16) at d=1024 with EXACT f32 scratch, and seq 64k (nc=32)
    at least in fast mode — and the top-level dispatch admits them."""
    assert pc._fused_plan(16, 2048, 1024, 2, True, 64) is None
    plan = pc._fused_plan_v3(16, 2048, 1024, 2, False, 64)
    assert plan is not None and plan[2] is False        # exact f32 scratch
    assert pc._fused_plan_v3(32, 2048, 1024, 2, True, 64) is not None
    assert pc.fused_mix_supported(16, 2048, 1024, True, 64)
    assert pc.fused_mix_supported(32, 2048, 1024, True, 64)


def test_fused_causal_dispatch_v3_via_public_entry():
    """fused_causal_mix routes a v2-plan-less shape to v3 (interpret)."""
    rng = np.random.default_rng(23)
    b, nc, chunk, d, cols = 1, 4, 128, 256, 32
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), jnp.float32)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)), jnp.float32)
    # interpret path ignores VMEM truth, so force-compare both entries
    got = pc.fused_causal_mix(v, kfr, kfi, chunk, cols, False, True)
    ref = pc._fused_causal_ref(v, kfr, kfi, chunk, cols)
    assert rel_err(np.asarray(got), np.asarray(ref)) < 1e-5


def test_kf_seg_rfft_matches_ref():
    """Segment-rFFT kernel (kf part B for n_fft past the fused kf bound)
    vs the matfft composition."""
    rng = np.random.default_rng(21)
    n, chunk, L = 1024, 128, 128
    assert pc.kf_seg_rfft_supported(n, chunk)
    kt = jnp.asarray(rng.standard_normal((2, n, L)), jnp.float32)
    kr, ki = pc.kf_seg_rfft(kt, chunk, False, True)
    rr, ri = pc._kf_seg_rfft_ref(kt, chunk)
    assert rel_err(np.asarray(kr), np.asarray(rr)) < 1e-5
    assert rel_err(np.asarray(ki), np.asarray(ri)) < 1e-5


def test_kf_seg_rfft_grads():
    rng = np.random.default_rng(22)
    n, chunk, L = 256, 64, 128
    kt = jnp.asarray(rng.standard_normal((1, n, L)), jnp.float32)

    def loss(fn):
        return lambda a: sum(jnp.sum(o ** 2) for o in fn(a))

    ga = jax.grad(loss(lambda a: pc.kf_seg_rfft(a, chunk, False, True)))(kt)
    gb = jax.grad(loss(lambda a: pc._kf_seg_rfft_ref(a, chunk)))(kt)
    assert rel_err(np.asarray(ga), np.asarray(gb)) < 1e-4


def test_causal_multihead_seg_rfft_path_matches_matmul(monkeypatch):
    """Layer-level dispatch where the fused mix engages but the fused kf
    kernel does NOT (n_fft=2048 with nc*G=128 < 256 is excluded by the
    measured-win gate), so the segment spectra go through kf_seg_rfft.
    KF_SEG_MIN_N is forced down — at real sizes the seg-rfft kernel only
    engages at n_fft >= 8192, too big for interpret mode."""
    monkeypatch.setattr(pc, "KF_SEG_MIN_N", 0)

    def cfg(impl):
        return SpectreConfig(embed_dim=256, num_heads=8, n_fft=2048,
                             pooling_type="mean", wavelet_on_rate=0.0,
                             causal=True, causal_chunk=512,
                             causal_impl="segmented", fft_impl=impl)
    c = cfg("pallas")
    nc = c.n_fft // c.causal_chunk
    g = c.num_heads * c.num_groups
    assert (nc * g) % 128 == 0 and nc * g < 256
    assert pc.kf_seg_rfft_supported(c.n_fft, c.causal_chunk)
    params = spectre_multihead_init(jax.random.key(23), cfg("matmul"))
    x = jax.random.normal(jax.random.key(24), (1, 2048, 256))
    ref = np.asarray(spectre_multihead_apply(params, cfg("matmul"), x))
    got = np.asarray(spectre_multihead_apply(params, c, x))
    assert rel_err(got, ref) < 1e-5


def test_fused_causal_bwd_v3_matches_jnp_adjoint():
    """Grid-banded bwd kernel (the nc>=16 long-context training path) vs
    the hand-derived jnp adjoint, including the multi-dblk K-grad partial
    sum and the outside overlap-add."""
    # the 350M seq-32k training shape is exactly what this kernel exists
    # for: v2 bwd has no plan there, v3 does
    assert pc._bwd_plan(16, 2048, 1024, 64, 2, True) is None
    assert pc._bwd_plan_v3(16, 2048, 1024, 64, 2, True) is not None
    rng = np.random.default_rng(15)
    b, nc, chunk, cols = 1, 3, 512, 4
    for d in (128, 256):                  # 256 exercises njb=2 partials
        v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)),
                        jnp.float32)
        kfr = jnp.asarray(
            rng.standard_normal((b, nc, chunk + 1, nc * cols)),
            jnp.float32)
        kfi = jnp.asarray(
            rng.standard_normal((b, nc, chunk + 1, nc * cols)),
            jnp.float32)
        ybar = jnp.asarray(rng.standard_normal((b, nc * chunk, d)),
                           jnp.float32)
        got = pc._fused_causal_bwd_call_v3(
            v, kfr, kfi, ybar, chunk=chunk, cols=cols, fast=False,
            interpret=True, dblk=128)
        ref = pc._fused_causal_bwd(v, kfr, kfi, ybar, chunk, cols,
                                   jax.lax.Precision.HIGHEST)
        for a, b_ in zip(got, ref):
            assert rel_err(np.asarray(a), np.asarray(b_)) < 1e-5
