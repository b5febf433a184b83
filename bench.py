"""Headline benchmark — prints ONE JSON line.

Metric: fwd+bwd tokens/sec/chip of a single SPECTRE block at BASELINE
config 1 shapes (B=8, L=1024, d_model=512).  Measured config: mean
pooling, wavelet_on_rate=0.0, memory_size=16, bf16 compute, fused Pallas
mix — the framework's production flagship semantics.  The anchor is the
reference PyTorch implementation measured in BASELINE.md: 1726 ms/iter ==
4,747 tok/s (fwd+bwd, fp32, DCT-fallback-to-mean pooling,
wavelet_on_rate=0.1 — the only runnable first-party anchor; the reference
publishes no numbers).  The configs differ (wavelet on vs off): the
anchor is a scale reference, not a same-config A/B — see
benchmarks/RESULTS.md for same-config comparisons vs attention.

Methodology: the TPU here sits behind an async relay where
``block_until_ready`` returns early and every dispatch pays a ~30-40 ms
round trip, so per-call wall timing is meaningless.  We instead time a
k-step dependency chain (lax.scan of grad+update) inside ONE jit with one
final scalar transfer, at two k values, and take the slope — pure device
time, RTT cancelled.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init

BASELINE_TOKS_PER_S = 8 * 1024 / 1.726          # reference fwd+bwd, CPU fp32
B, L, D = 8, 1024, 512

# The real competitive target (BASELINE.md: "beat FlashAttention beyond
# seq 8k"): causal SPECTRE block vs the strongest attention baseline at a
# seq sweep, fwd, bf16, 32k tokens/step.  Same machinery as
# benchmarks/mix_vs_attention.py; bounded so a relay hiccup can't sink
# the whole artifact.
SWEEP_SEQS = (1024, 8192, 32768)
SWEEP_BUDGET_S = 900.0


def causal_vs_attention_sweep():
    from benchmarks.mix_vs_attention import (
        attn_block_apply, attn_block_init, slope_time)
    from fft_tpu.layers.causal_seg import preferred_causal_chunk

    attn_params = attn_block_init(jax.random.key(0))
    out = {}
    t_start = time.perf_counter()
    for seq in SWEEP_SEQS:
        if time.perf_counter() - t_start > SWEEP_BUDGET_S:
            break
        batch = max(1, 32768 // seq)
        x = jax.random.normal(jax.random.key(1), (batch, seq, D),
                              jnp.bfloat16)
        cfg = SpectreConfig(embed_dim=D, num_heads=8, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True,
                            causal_chunk=preferred_causal_chunk(seq, D),
                            compute_dtype="bfloat16")
        sp_params = spectre_block_init(jax.random.key(2), cfg)
        t_sp = slope_time(lambda p, h: spectre_block_apply(p, cfg, h),
                          sp_params, x, backward=False)
        t_attn = slope_time(lambda p, h: attn_block_apply(p, h, "flash"),
                            attn_params, x, backward=False)
        if seq <= 4096:
            t_attn = min(t_attn, slope_time(
                lambda p, h: attn_block_apply(p, h, "xla"), attn_params, x,
                backward=False))
        out[str(seq)] = round(t_attn / t_sp, 2)
    return out


def main():
    # Production configuration: bf16 compute + the fused Pallas spectral-mix
    # kernel (fp32 path and golden parity are covered by tests/).
    cfg = SpectreConfig(embed_dim=D, num_heads=8, n_fft=L,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=16, compute_dtype="bfloat16",
                        fft_impl="pallas")
    params = spectre_block_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (B, L, D))

    def loss(p, x):
        return jnp.sum(spectre_block_apply(p, cfg, x).astype(jnp.float32)
                       ** 2)

    def chain(params, x, k):
        def body(p, _):
            g = jax.grad(loss)(p, x)
            return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), ()
        p, _ = jax.lax.scan(body, params, None, length=k)
        return p["ln1"]["scale"][0]

    k_lo, k_hi = 5, 25
    f_lo = jax.jit(lambda p, x: chain(p, x, k_lo))
    f_hi = jax.jit(lambda p, x: chain(p, x, k_hi))
    float(np.asarray(f_lo(params, x)))           # compile + sanity transfer
    float(np.asarray(f_hi(params, x)))

    def timed_once(f):
        t0 = time.perf_counter()
        float(np.asarray(f(params, x)))
        return time.perf_counter() - t0

    # Mean ± spread over independent slope estimates (VERDICT r3 weak 3:
    # a single best-of-3 slope wobbled ±4% between artifacts).  Each round
    # interleaves a fresh lo/hi pair so relay drift hits both ends.
    slopes = []
    for _ in range(4):
        t_lo = min(timed_once(f_lo), timed_once(f_lo))
        t_hi = min(timed_once(f_hi), timed_once(f_hi))
        slopes.append((t_hi - t_lo) / (k_hi - k_lo))
    dt = float(np.mean(slopes))
    spread_pct = float(100.0 * np.std(slopes) / dt)
    toks_per_s = B * L / dt

    try:
        sweep = causal_vs_attention_sweep()
    except Exception as e:                        # never sink the artifact
        sweep = {"error": f"{type(e).__name__}: {e}"[:200]}

    print(json.dumps({
        "metric": "spectre_block_fwdbwd_tokens_per_sec_per_chip",
        "value": round(toks_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / BASELINE_TOKS_PER_S, 2),
        "spread_pct": round(spread_pct, 1),
        "slope_samples_ms": [round(s * 1e3, 3) for s in slopes],
        "config": (f"B={B} L={L} d={D} bf16 fused-pallas mean-pool "
                   f"mem=16 fwd+bwd, slope k={k_lo}->{k_hi}"),
        "causal_vs_attention_fwd": sweep,
    }))


if __name__ == "__main__":
    main()
