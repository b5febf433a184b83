"""Fused spectral-mix kernel vs roofline (the BASELINE north-star metric).

Measures the Pallas rFFT->gate->irFFT kernel (exact f32 and fast bf16
modes) against the unfused matmul-FFT composition and the HBM roofline
(read v + compact gate, write y, at the I/O dtype width; v5e = 819 GB/s).

Timing: slope method (chained scan at two depths, single transfer) — see
bench.py for why per-call walls lie on this relay.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_fused_mix.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels.pallas_fft import (
    _unfused_mix, fused_spectral_mix, pallas_mix_supported,
)

HBM_GBPS = 819.0  # TPU v5e


def slope_time(fn, args, k_lo=8, k_hi=72):
    """Device ms per fn application via the two-depth chain slope."""
    v = args[0]

    def chain(v, k):
        def body(h, _):
            out = fn(h, *args[1:])
            return (h + 1e-12 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=k)
        return h[0, 0, 0].astype(jnp.float32)

    f_lo = jax.jit(lambda v: chain(v, k_lo))
    f_hi = jax.jit(lambda v: chain(v, k_hi))
    float(np.asarray(f_lo(v)))
    float(np.asarray(f_hi(v)))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(v)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="512,1024,2048")
    ap.add_argument("--tokens", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--hg", type=int, default=32, help="gate columns (H*G)")
    args = ap.parse_args()
    d = args.dim

    for n in (int(s) for s in args.seqs.split(",")):
        if not pallas_mix_supported(n):
            print(json.dumps({"seq": n, "skipped": "unsupported"}))
            continue
        b = max(1, args.tokens // n)
        f = n // 2 + 1
        rng = np.random.default_rng(0)
        # complex64 can't cross the host->device boundary on this relay:
        # ship re/im planes and lax.complex them inside the jit.
        g_r = jnp.asarray(rng.standard_normal((b, f, args.hg)), jnp.float32)
        g_i = jnp.asarray(rng.standard_normal((b, f, args.hg)), jnp.float32)

        rec = {"seq": n, "batch": b, "d": d}
        for mode, dtype in (("fast_bf16", jnp.bfloat16),
                            ("exact_f32", jnp.float32)):
            v = jax.random.normal(jax.random.key(1), (b, n, d), dtype)
            ms = slope_time(
                lambda h, gr, gi: fused_spectral_mix(
                    h, jax.lax.complex(gr, gi), None, n_fft=n,
                    fast=(dtype == jnp.bfloat16)),
                (v, g_r, g_i))
            bytes_io = (2 * b * n * d * dtype.dtype.itemsize
                        + 2 * b * f * args.hg * 4)
            roof_ms = bytes_io / (HBM_GBPS * 1e9) * 1e3
            rec[mode] = {
                "ms": round(ms, 4),
                "roofline_ms": round(roof_ms, 4),
                "pct_roofline": round(100 * roof_ms / ms, 1),
            }
        # unfused baselines at MATCHED precision (fast bf16 vs fast bf16,
        # exact f32 vs exact f32) so the fused/unfused ratio is honest
        vb = jax.random.normal(jax.random.key(1), (b, n, d), jnp.bfloat16)
        rec["unfused_fast_bf16_ms"] = round(
            slope_time(lambda h, gr, gi: _unfused_mix(
                h, jax.lax.complex(gr, gi), None, n, fast=True),
                (vb, g_r, g_i)), 4)
        v32 = jax.random.normal(jax.random.key(1), (b, n, d), jnp.float32)
        rec["unfused_exact_f32_ms"] = round(
            slope_time(lambda h, gr, gi: _unfused_mix(
                h, jax.lax.complex(gr, gi), None, n), (v32, g_r, g_i)),
            4)
        rec["fused_vs_unfused"] = round(
            rec["unfused_fast_bf16_ms"] / rec["fast_bf16"]["ms"], 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
