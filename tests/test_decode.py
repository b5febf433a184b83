"""Decode path: golden parity vs reference decode_step + decode==forward
invariants + eviction-drift regression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_tpu.config import SpectreConfig, SpectreHeadConfig
from fft_tpu.decode import (
    cache_decode_step, cache_init, cache_prefill,
    spectre_block_decode_step, spectre_block_prefill,
    spectre_multihead_decode_step,
)
from fft_tpu.layers import (
    spectre_block_apply, spectre_block_init, spectre_multihead_apply,
    spectre_multihead_init,
)
from tests.golden_utils import load, map_block_params, map_head_params, rel_err


def _single_head_multihead_params(head_params, d):
    """Wrap one head's params as an H=1 multihead with identity out_proj."""
    heads = jax.tree.map(lambda x: jnp.asarray(x)[None], head_params)
    return {"heads": heads, "out_proj": {"w": jnp.eye(d, dtype=jnp.float32)}}


def test_decode_golden_parity():
    """Bit-level parity with the reference decode loop (reference_compat:
    Nyquist bug + sum_q/N descriptor + scrambled cubic interp)."""
    g = load("decode")
    hcfg = SpectreHeadConfig(embed_dim=16, n_fft=32, pooling_type="mean",
                             fft_impl="jnp", interp_reference_compat=True)
    head_params = map_head_params(g, hcfg)
    cfg = SpectreConfig(embed_dim=16, num_heads=1, n_fft=32,
                        pooling_type="mean", fft_impl="jnp",
                        interp_reference_compat=True)
    mh_params = _single_head_multihead_params(head_params, 16)

    prompt = jnp.asarray(g["prompt"])                        # (32, 16)
    extra = jnp.asarray(g["extra"])                          # (6, 16)

    w_q = jnp.asarray(head_params["w_q"]["w"])
    w_v = jnp.asarray(head_params["w_v"]["w"])
    cache = cache_init(1, 1, 32, 16)
    cache = cache_prefill(cache, (prompt @ w_q)[None, None],
                          (prompt @ w_v)[None, None], fft_impl="jnp")

    for i in range(extra.shape[0]):
        y, cache = spectre_multihead_decode_step(
            mh_params, cfg, extra[i][None], cache, reference_compat=True)
        assert rel_err(y[0], g["outs"][i]) < 2e-5, f"step {i}"
        prefix = np.asarray(cache.prefix_re[0, 0]) \
            + 1j * np.asarray(cache.prefix_im[0, 0])
        assert rel_err(prefix, g["cache_fft"][i]) < 2e-5, f"cache step {i}"


def test_decode_equals_forward_multihead():
    """With the corrected math (default), each decoded token equals the
    forward pass on its window's last position — the reference's own
    invariant, which its Nyquist bug breaks at odd positions (SURVEY §3.3)."""
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=16,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        fft_impl="jnp")
    params = spectre_multihead_init(jax.random.key(0), cfg)
    n = cfg.n_fft
    x = jax.random.normal(jax.random.key(1), (2, n + 5, 32)) * 0.5

    heads = params["heads"]
    def proj(xs):  # (B, L, d) -> (B, H, L, hd)
        xh = jnp.moveaxis(
            xs.reshape(xs.shape[0], xs.shape[1], 4, 8), 2, 1)
        q = jnp.einsum("bhli,hio->bhlo", xh, heads["w_q"]["w"])
        v = jnp.einsum("bhli,hio->bhlo", xh, heads["w_v"]["w"])
        return q, v

    cache = cache_init(2, 4, n, 8)
    q0, v0 = proj(x[:, :n])
    cache = cache_prefill(cache, q0, v0, fft_impl="jnp")

    step = jax.jit(lambda p, xt, c: spectre_multihead_decode_step(p, cfg, xt, c))
    for i in range(5):
        y, cache = step(params, x[:, n + i], cache)
        window = x[:, i + 1:n + i + 1]
        fwd = spectre_multihead_apply(params, cfg, window)
        err = rel_err(y, np.asarray(fwd[:, -1]))
        assert err < 5e-5, (i, err)


def test_block_decode_equals_forward_with_memory():
    """Block-level: prefill (auto memory injection) + decode == block forward
    last token, including the truncated spectral memory path."""
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=16,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=5, fft_impl="jnp")
    params = spectre_block_init(jax.random.key(2), cfg)
    n = cfg.n_fft
    x = jax.random.normal(jax.random.key(3), (2, n + 3, 32)) * 0.5

    cache = cache_init(2, 4, n, 8)
    cache = spectre_block_prefill(params, cfg, x[:, :n], cache)
    for i in range(3):
        y, cache = spectre_block_decode_step(params, cfg, x[:, n + i], cache)
        fwd = spectre_block_apply(params, cfg, x[:, i + 1:n + i + 1])
        assert rel_err(y, np.asarray(fwd[:, -1])) < 5e-5, i


def test_decode_window_descriptor_attention_pooling():
    """decode_descriptor='window' runs the configured pooler over the ring
    buffer: decode == forward holds for ATTENTION pooling too (the
    reference's decode always mean-pools, SURVEY §3.6-C2)."""
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=16,
                        pooling_type="attention", wavelet_on_rate=0.0,
                        decode_descriptor="window", fft_impl="jnp")
    params = spectre_multihead_init(jax.random.key(10), cfg)
    n = cfg.n_fft
    x = jax.random.normal(jax.random.key(11), (2, n + 4, 32)) * 0.5

    heads = params["heads"]
    xh = jnp.moveaxis(x[:, :n].reshape(2, n, 4, 8), 2, 1)
    q0 = jnp.einsum("bhli,hio->bhlo", xh, heads["w_q"]["w"])
    v0 = jnp.einsum("bhli,hio->bhlo", xh, heads["w_v"]["w"])
    cache = cache_prefill(cache_init(2, 4, n, 8), q0, v0, fft_impl="jnp")

    for i in range(4):
        y, cache = spectre_multihead_decode_step(params, cfg, x[:, n + i],
                                                 cache)
        fwd = spectre_multihead_apply(params, cfg, x[:, i + 1:n + i + 1])
        assert rel_err(y, np.asarray(fwd[:, -1])) < 5e-5, i


def test_eviction_drift_bounded():
    """Decode far past the window (t >> N): the incrementally-maintained
    spectrum must stay close to the exact rFFT of the current window
    (regression for phasor drift; we use t mod N phasors)."""
    n, d = 16, 4
    rng = np.random.default_rng(0)
    tokens = rng.standard_normal((n + 200, d)).astype(np.float32)
    cache = cache_init(1, 1, n, d)
    cache = cache_prefill(
        cache, jnp.asarray(tokens[:n])[None, None],
        jnp.asarray(tokens[:n])[None, None], fft_impl="jnp")
    step = jax.jit(cache_decode_step)
    for i in range(n, n + 200):
        tok = jnp.asarray(tokens[i])[None, None]
        cache = step(cache, tok, tok)
    # Exact spectrum of the ring buffer (slot s holds token s mod n).
    window = np.zeros((n, d), np.float32)
    for s in range(n):
        # last occupant of slot s among indices <= t
        t = n + 200 - 1
        idx = t - ((t - s) % n)
        window[s] = tokens[idx]
    exact = np.fft.rfft(window, axis=0)
    got = np.asarray(cache.prefix_re[0, 0]) + 1j * np.asarray(cache.prefix_im[0, 0])
    assert rel_err(got, exact) < 1e-4


def test_decode_descriptor_scale_invariance():
    """The reference divides sum_q by N even for a partially-filled window
    (SURVEY §3.6-C2).  Because the descriptor immediately passes through
    LayerNorm — which is invariant to positive scaling — the 'reference' and
    'consistent' (divide-by-true-count) descriptors are IDENTICAL post-norm:
    the C2 quirk is mathematically harmless.  This test pins that fact."""
    from fft_tpu.decode.cache import _decode_descriptor
    cfg_ref = SpectreHeadConfig(embed_dim=8, n_fft=16,
                                decode_descriptor="reference")
    cfg_con = SpectreHeadConfig(embed_dim=8, n_fft=16,
                                decode_descriptor="consistent")
    params = {"q_norm": {"scale": jnp.ones(8) * 1.3,
                         "bias": jnp.full((8,), 0.2)}}
    q = jax.random.normal(jax.random.key(0), (1, 1, 4, 8))  # 4 of 16 tokens
    cache = cache_prefill(cache_init(1, 1, 16, 8), q, q, fft_impl="jnp")
    d_ref = _decode_descriptor(params, cfg_ref, cache)
    d_con = _decode_descriptor(params, cfg_con, cache)
    # equal up to LayerNorm's eps regularization (the scaled-down variance
    # makes eps relatively larger), not bitwise:
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_con),
                               atol=5e-3)


def test_lm_prefill_split_matches_lm_prefill():
    """The relay-friendly two-module prefill (lm_prefill_split) computes
    exactly lm_prefill's (logits, caches)."""
    from fft_tpu.models.lm import (LMConfig, lm_init, lm_prefill,
                                   lm_prefill_split)

    cfg = LMConfig(
        vocab_size=64, num_layers=3, max_seq=128,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=128,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=16,
                            fft_impl="matmul"))
    params = lm_init(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 100), 0, 64)
    logits_a, caches_a = jax.jit(lambda t: lm_prefill(params, cfg, t))(tokens)
    logits_b, caches_b = lm_prefill_split(params, cfg, tokens)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=2e-5, atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        caches_a, caches_b)


def test_decode_chain_flat_matches_lm_decode_step():
    """The benchmark's flat (one-layer-body) decode chain is bit-level the
    same computation as chaining lm_decode_step."""
    from benchmarks.bench_350m_decode import decode_chain_flat
    from fft_tpu.models.lm import (LMConfig, lm_decode_step, lm_init,
                                   lm_prefill)

    cfg = LMConfig(
        vocab_size=64, num_layers=3, max_seq=128,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=128,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=16,
                            fft_impl="matmul"))
    params = lm_init(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 100), 0, 64)
    logits, caches = jax.jit(lambda t: lm_prefill(params, cfg, t))(tokens)
    pos0, k = tokens.shape[1], 5

    got = jax.jit(lambda c, l: decode_chain_flat(params, cfg, c, l,
                                                 pos0, k))(caches, logits)

    lg, cc = logits, caches
    for i in range(k):
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
        lg, cc = lm_decode_step(params, cfg, tok, pos0 + i, cc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(lg[0]),
                               rtol=2e-5, atol=2e-5)
