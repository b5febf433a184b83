"""A/B the mixed-radix plan for the 64k unfused spectral mix on chip.

The round-5 roofline close-out measured the dispatched 16k-64k unfused
composition at 1.31 / 3.35 / 14.14 ms (bf16, 16k/32k/64k, one batch row,
d=512) — 64k is 2.1x WORSE per token than 32k.  Cause hypothesis: the
complex-half length 32768 is the first power of two that needs a 3-factor
plan under the 128-radix cap, and `cfft_factors` balances it to
(32, 32, 32) — minimal radix_sum (FLOPs) but one extra recursion level,
i.e. one extra full-size swapaxes transpose + twiddle pass per FFT on
~270 MB complex intermediates.  The composition is HBM-pass-bound there,
so plans that cut LEVELS at the cost of FLOPs should win:

  (32,32,32) sum=96  3 levels   (current)
  (128,128,2) / (2,128,128) sum=258  3 levels (lopsided)
  (256,128) / (128,256) sum=384  2 levels (needs radix 256 — a 256x256
      DFT matmul is still MXU-friendly; the cap at 128 was a tiling
      choice, not a hardware limit)
  (64,64,8) sum=136  3 levels (middle ground)

Usage (chip, serialized):
  PYTHONPATH=.:/root/.axon_site PYTHONUNBUFFERED=1 \
    python benchmarks/ablate_fft_plan.py [--n 65536] [--plans ...]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels import matfft
from fft_tpu.kernels.pallas_fft import _unfused_mix


def slope(fn, v, gr, gi, k_lo=4, k_hi=20, reps=3):
    def chain(v, gr, gi, k):
        def body(h, _):
            out = fn(h, gr, gi)
            return (h + 1e-12 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=k)
        return h[0, 0, 0].astype(jnp.float32)

    f_lo = jax.jit(lambda v, gr, gi: chain(v, gr, gi, k_lo))
    f_hi = jax.jit(lambda v, gr, gi: chain(v, gr, gi, k_hi))
    float(np.asarray(f_lo(v, gr, gi)))
    float(np.asarray(f_hi(v, gr, gi)))

    def timed(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(v, gr, gi)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--hg", type=int, default=32)
    ap.add_argument("--plans", default=None,
                    help="semicolon-separated comma plans, e.g. "
                         "'32,32,32;256,128'")
    args = ap.parse_args()
    n, d = args.n, args.dim
    half = n // 2

    if args.plans:
        plans = [tuple(int(x) for x in p.split(","))
                 for p in args.plans.split(";")]
    else:
        plans = [matfft.cfft_factors(half), (128, 128, 2), (2, 128, 128),
                 (256, 128), (128, 256), (64, 64, 8)]

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((1, n, d)), jnp.bfloat16)
    gr = jnp.asarray(rng.standard_normal((1, half + 1, args.hg)),
                     jnp.float32)
    gi = jnp.asarray(rng.standard_normal((1, half + 1, args.hg)),
                     jnp.float32)

    orig = matfft.cfft_factors
    ref_out = None
    for plan in plans:
        assert int(np.prod(plan)) == half, (plan, half)
        matfft.cfft_factors = lambda m, plan=plan, orig=orig: (
            plan if m == half else orig(m))
        try:
            def mix(h, gr, gi):
                return _unfused_mix(h, jax.lax.complex(gr, gi), None, n,
                                    fast=True)
            out = np.asarray(
                jax.jit(mix)(v, gr, gi)[:, :4, :4], np.float32)
            if ref_out is None:
                ref_out = out
            rel = (np.abs(out - ref_out).max()
                   / max(1e-6, np.abs(ref_out).max()))
            ms = slope(mix, v, gr, gi)
            print(json.dumps({"plan": list(plan),
                              "radix_sum": int(sum(plan)),
                              "levels": len(plan),
                              "ms": round(float(ms), 4),
                              "rel_vs_first": float(rel)}), flush=True)
        finally:
            matfft.cfft_factors = orig


if __name__ == "__main__":
    main()
