"""Repeatable roofline protocol for the fused spectral-mix kernels.

The BASELINE north star ("fused kernel >= 80% of roofline") needs a
measurement you can re-run and trust, not a single slope sample with
relay noise.  Protocol (VERDICT r2 item 5):

1. ONE process, shapes measured back-to-back (chip jobs serialized —
   nothing else may run on the chip during this).
2. Chip constants are MEASURED first (utils/prof.py::
   measure_chip_constants): achieved HBM GB/s from a 256 MB streaming
   add, achieved MXU TFLOPs from 4096^3 matmuls (bf16 and f32 inputs) —
   not the nominal v5e datasheet numbers.
3. Each (n_fft, mode) point is slope-timed (chained scan at two depths,
   single transfer — per-call walls lie on this relay) and the slope
   estimate itself is REPEATED --trials times; we report mean +- std and
   min across trials.
4. Two bounds per point, and the GOVERNING one is named:
   - hbm: read v + compact gate, write y at the I/O dtype width over the
     measured bandwidth.  Implementation-independent.
   - mxu: the direct kernel's folded-constant matmul flops
     (utils/prof.py::direct_mix_cost) over the measured matmul peak at
     the kernel's accumulate precision.  Kernel-specific: the direct
     kernel trades O(N log N) arithmetic for dense MXU work, so with
     bf16 I/O it is compute-bound by design.
   Governing bound = max(hbm, mxu); pct = 100 * bound / measured.

Reference call sites for the op: /root/reference/spectre.py:506,551.

Usage (chip):
  PYTHONPATH=.:/root/.axon_site PYTHONUNBUFFERED=1 \
    python benchmarks/roofline_protocol.py [--seqs 1024,2048] [--trials 7]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels.pallas_fft import (_direct_supported, _unfused_mix,
                                        fused_spectral_mix,
                                        pallas_mix_supported)
from fft_tpu.utils.prof import (direct_mix_cost, measure_chip_constants,
                                spectral_mix_cost, staged_mix_cost)


def slope_sampler(fn, args, k_lo=8, k_hi=72):
    """Compile the two chain depths once; return a callable producing one
    fresh slope estimate (ms) per invocation."""
    v = args[0]

    def chain(v, k):
        def body(h, _):
            out = fn(h, *args[1:])
            return (h + 1e-12 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=k)
        return h[0, 0, 0].astype(jnp.float32)

    f_lo = jax.jit(lambda v: chain(v, k_lo))
    f_hi = jax.jit(lambda v: chain(v, k_hi))
    float(np.asarray(f_lo(v)))                      # compile + warm
    float(np.asarray(f_hi(v)))

    def sample():
        def timed(f):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(f(v)))
                best = min(best, time.perf_counter() - t0)
            return best
        return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo) * 1e3

    return sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="1024,2048,4096,8192")
    ap.add_argument("--tokens", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--hg", type=int, default=32)
    ap.add_argument("--trials", type=int, default=7)
    args = ap.parse_args()
    d = args.dim

    cc = measure_chip_constants()
    print(json.dumps({"chip_constants": {
        "hbm_gbps": round(cc.hbm_gbps, 1),
        "mxu_tflops_bf16": round(cc.mxu_tflops_bf16, 1),
        "mxu_tflops_f32": round(cc.mxu_tflops_f32, 1),
        "mxu_tflops_f32_highest": round(cc.mxu_tflops_f32_highest, 1),
        "vpu_gops": round(cc.vpu_gops, 1)}}), flush=True)

    for n in (int(s) for s in args.seqs.split(",")):
        b = max(1, args.tokens // n)
        f = n // 2 + 1
        rng = np.random.default_rng(0)
        g_r = jnp.asarray(rng.standard_normal((b, f, args.hg)), jnp.float32)
        g_i = jnp.asarray(rng.standard_normal((b, f, args.hg)), jnp.float32)

        for mode, dtype in (("fast_bf16", jnp.bfloat16),
                            ("exact_f32", jnp.float32)):
            v = jax.random.normal(jax.random.key(1), (b, n, d), dtype)
            # past the fused kernels' reach, measure the DISPATCHED path
            # (the unfused matmul-FFT composition) against the same
            # bounds — the documented 16k-64k answer (VERDICT r3 item 3)
            fast = dtype == jnp.bfloat16
            if pallas_mix_supported(n):
                def mix(h, gr, gi, n=n, fast=fast):
                    return fused_spectral_mix(h, jax.lax.complex(gr, gi),
                                              None, n_fft=n, fast=fast)
            else:
                # what the layer actually dispatches past the fused
                # kernels' reach (layers/spectre.py:434-441 gates on
                # pallas_mix_supported and falls through to the
                # matmul-FFT composition)
                def mix(h, gr, gi, n=n, fast=fast):
                    return _unfused_mix(h, jax.lax.complex(gr, gi), None,
                                        n, fast=fast)
            sample = slope_sampler(mix, (v, g_r, g_i))
            xs = np.asarray([sample() for _ in range(args.trials)])

            # exact mode runs every MXU pass at Precision.HIGHEST — use
            # the MEASURED HIGHEST peak (VERDICT r3: no estimated /6).
            tflops = (cc.mxu_tflops_bf16 if dtype == jnp.bfloat16
                      else cc.mxu_tflops_f32_highest)
            vpu_ms = 0.0
            if _direct_supported(n):
                kern = "direct"
                cost = direct_mix_cost(b, n, d, hg=args.hg,
                                       bytes_per_el=dtype.dtype.itemsize)
                mm_flops, hbm_bytes = cost.flops, cost.hbm_bytes
            elif pallas_mix_supported(n):
                kern = "staged"
                cost = staged_mix_cost(b, n, d, hg=args.hg,
                                       bytes_per_el=dtype.dtype.itemsize)
                mm_flops, hbm_bytes = cost.mm_flops, cost.hbm_bytes
                if np.isfinite(cc.vpu_gops):
                    vpu_ms = cost.vpu_ops / (cc.vpu_gops * 1e9) * 1e3
            else:
                # 16k-64k: the dispatched path is the unfused matmul-FFT
                # composition.  Bound = minimal HBM (v in, y out, compact
                # gate) + the mixed-radix matmul-FFT flops — how far the
                # unfused answer sits from ideal is the recorded verdict.
                from fft_tpu.kernels.matfft import cfft_factors
                kern = "unfused"
                cost = spectral_mix_cost(
                    b, n, d, radix_sum=sum(cfft_factors(n // 2) or [n]),
                    bytes_per_el=dtype.dtype.itemsize)
                mm_flops, hbm_bytes = cost.flops, cost.hbm_bytes
            hbm_ms = hbm_bytes / (cc.hbm_gbps * 1e9) * 1e3
            mxu_ms = mm_flops / (tflops * 1e12) * 1e3
            bound_ms = max(hbm_ms, mxu_ms, vpu_ms)
            governing = {hbm_ms: "hbm", mxu_ms: "mxu",
                         vpu_ms: "vpu"}[bound_ms]
            print(json.dumps({
                "seq": n, "batch": b, "d": d, "mode": mode,
                "kernel": kern, "trials": args.trials,
                "ms_mean": round(float(xs.mean()), 4),
                "ms_std": round(float(xs.std()), 4),
                "ms_min": round(float(xs.min()), 4),
                "hbm_bound_ms": round(hbm_ms, 4),
                "mxu_bound_ms": round(mxu_ms, 4),
                "vpu_bound_ms": round(vpu_ms, 4),
                "governing": governing,
                "pct_of_bound_mean": round(100 * bound_ms / xs.mean(), 1),
                "pct_of_bound_best": round(100 * bound_ms / xs.min(), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
