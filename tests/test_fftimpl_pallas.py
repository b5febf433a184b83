"""Regression tests: ``fft_impl="pallas"`` must never reach a dead end.

Round-1 verdict item 4: the production config (fft_impl="pallas") crashed in
the decode prefill path because standalone transforms dispatched into
NotImplementedError stubs.  Now every standalone transform under that config
resolves to the matmul FFT, and the fused-kernel predicate falls back to the
unfused composition instead of asserting (reference: torch.fft.rfft works
under every config — spectre.py:777).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.models.lm import (
    LMConfig, lm_apply, lm_decode_step, lm_generate, lm_init, lm_prefill,
)
from tests.golden_utils import rel_err


def _lm_cfg(fft_impl: str) -> LMConfig:
    return LMConfig(
        vocab_size=64, num_layers=2, max_seq=64,
        block=SpectreConfig(
            embed_dim=32, num_heads=4, n_fft=64, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True, causal_chunk=16,
            memory_size=4, fft_impl=fft_impl))


def test_pallas_lm_prefill_decode_runs_and_matches_matmul():
    """bench-style causal LM with fft_impl='pallas': prefill + decode must
    run (the round-1 crash) and equal the explicit matmul config exactly."""
    cfg_p = _lm_cfg("pallas")
    cfg_m = _lm_cfg("matmul")
    params = lm_init(jax.random.key(0), cfg_p)
    tokens = jax.random.randint(jax.random.key(1), (2, 48), 0, 64)

    logits_p, caches_p = lm_prefill(params, cfg_p, tokens)
    logits_m, caches_m = lm_prefill(params, cfg_m, tokens)
    assert rel_err(logits_p, logits_m) < 1e-6
    step_p, _ = lm_decode_step(params, cfg_p, jnp.zeros((2,), jnp.int32),
                               48, caches_p)
    step_m, _ = lm_decode_step(params, cfg_m, jnp.zeros((2,), jnp.int32),
                               48, caches_m)
    assert rel_err(step_p, step_m) < 1e-6
    # full generate loop (prefill -> sample -> decode) under "pallas"
    toks = lm_generate(params, cfg_p, tokens[:, :16], steps=4)
    assert toks.shape == (2, 4)


def test_pallas_causal_train_step_runs():
    """fft_impl='pallas' + the fft2n causal branch used to crash in
    training (ADVICE round 1); must now train."""
    cfg = _lm_cfg("pallas")
    params = lm_init(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 64), 0, 64)

    def loss(p):
        lg = lm_apply(p, cfg, tokens)
        return jnp.mean(lg ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gn = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gn))


def test_pallas_unsupported_nfft_falls_back():
    """Non-causal fused path with n_fft outside every kernel plan (odd
    sizes; 16384 is two-pass-kernel territory since r3 but still falls
    back HERE because the backend is CPU and the interpreter is off):
    silently uses the unfused matmul composition (was an AssertionError)."""
    mk = lambda impl: SpectreConfig(
        embed_dim=128, num_heads=4, n_fft=16384, pooling_type="mean",
        wavelet_on_rate=0.0, fft_impl=impl)
    cfg_p, cfg_m = mk("pallas"), mk("matmul")
    params = spectre_block_init(jax.random.key(0), cfg_p)
    x = jax.random.normal(jax.random.key(1), (1, 4096, 128))
    out_p = spectre_block_apply(params, cfg_p, x)
    out_m = spectre_block_apply(params, cfg_m, x)
    assert rel_err(out_p, out_m) < 1e-6


def test_pallas_unsupported_width_falls_back():
    """d not a multiple of the kernel's 128-lane block: falls back."""
    mk = lambda impl: SpectreConfig(
        embed_dim=64, num_heads=4, n_fft=256, pooling_type="mean",
        wavelet_on_rate=0.0, fft_impl=impl)
    cfg_p, cfg_m = mk("pallas"), mk("matmul")
    params = spectre_block_init(jax.random.key(0), cfg_p)
    x = jax.random.normal(jax.random.key(1), (2, 256, 64))
    out_p = spectre_block_apply(params, cfg_p, x)
    out_m = spectre_block_apply(params, cfg_m, x)
    assert rel_err(out_p, out_m) < 1e-6


def test_fftops_pallas_resolves():
    """Standalone transforms under impl='pallas' equal the jnp reference."""
    from fft_tpu.ops import fftops
    x = jax.random.normal(jax.random.key(0), (2, 256, 8))
    ref = jnp.fft.rfft(x, n=256, axis=-2)
    got = fftops.rfft(x, 256, axis=-2, impl="pallas")
    assert rel_err(got, ref) < 1e-5
    y = fftops.irfft(got, 256, axis=-2, impl="pallas")
    assert rel_err(y, x) < 1e-5


def test_wide_unfused_16k_matches_per_head_path():
    """Non-causal blocks past the fused kernels' reach (n_fft >= 16384)
    now run ALL heads as one d-wide matmul-FFT composition instead of
    per-head hd-wide transforms (round-5).  Same math: the d-wide compact
    gate broadcast must equal the vmapped per-head result."""
    def cfg_for(impl):
        return SpectreConfig(
            embed_dim=128, num_heads=2, n_fft=16384, pooling_type="mean",
            wavelet_on_rate=0.0, causal=False, fft_impl=impl)

    cfg_w = cfg_for("pallas")    # wide path (no fused kernel at 16k)
    cfg_p = cfg_for("matmul")    # per-head fallback path
    params = spectre_block_init(jax.random.key(0), cfg_w)
    x = jax.random.normal(jax.random.key(1), (1, 16384, 128), jnp.float32)
    y_w = spectre_block_apply(params, cfg_w, x)
    y_p = spectre_block_apply(params, cfg_p, x)
    assert rel_err(y_w, y_p) < 1e-5


def test_wide_unfused_16k_bf16_close_to_f32():
    """The fast-mode 16k+ dispatch stores intermediates in bf16 planes;
    it must stay within bf16-activation distance of the f32 composition."""
    def cfg_for(dtype):
        return SpectreConfig(
            embed_dim=128, num_heads=2, n_fft=16384, pooling_type="mean",
            wavelet_on_rate=0.0, causal=False, fft_impl="pallas",
            compute_dtype=dtype)

    cfg_b = cfg_for("bfloat16")
    cfg_f = cfg_for("float32")
    params = spectre_block_init(jax.random.key(0), cfg_f)
    x = jax.random.normal(jax.random.key(1), (1, 16384, 128), jnp.float32)
    y_b = spectre_block_apply(params, cfg_b, x.astype(jnp.bfloat16))
    y_f = spectre_block_apply(params, cfg_f, x)
    assert rel_err(y_b, y_f) < 5e-2
