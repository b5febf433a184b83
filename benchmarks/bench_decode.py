"""Decode latency: SPECTRE block decode ms/token (B=8, d=512, n_fft=1024).

Measures ``spectre_block_decode_step`` chained under ``lax.scan`` (the
shape generation actually runs) via the slope method.  The step is
bandwidth-bound on prefix-FFT state traffic (read+write for the phasor
update, read for the gated mix) — the fused decode kernel collapses those
to one read + one write.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_decode.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.decode import (
    cache_init, spectre_block_decode_step, spectre_block_prefill,
)
from fft_tpu.layers import spectre_block_init


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--n-fft", type=int, default=1024)
    args = ap.parse_args()
    b, d, h, n = args.batch, args.dim, args.heads, args.n_fft

    cfg = SpectreConfig(embed_dim=d, num_heads=h, n_fft=n,
                        pooling_type="mean", wavelet_on_rate=0.0)
    params = spectre_block_init(jax.random.key(0), cfg)
    prompt = jax.random.normal(jax.random.key(1), (b, n, d))
    cache = cache_init(b, h, n, d // h)
    cache = jax.jit(
        lambda p, x, c: spectre_block_prefill(p, cfg, x, c)
    )(params, prompt, cache)

    def chain(k):
        def body(carry, _):
            x_t, c = carry
            y, c = spectre_block_decode_step(params, cfg, x_t, c)
            return (y, c), None

        x0 = prompt[:, -1]
        (y, c), _ = jax.lax.scan(body, (x0, cache), None, length=k)
        return y[0, 0] + c.prefix_re[0, 0, 0, 0]

    k_lo, k_hi = 16, 144
    f_lo = jax.jit(lambda: chain(k_lo))
    f_hi = jax.jit(lambda: chain(k_hi))
    float(np.asarray(f_lo())); float(np.asarray(f_hi()))

    def t(f):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); float(np.asarray(f()))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (t(f_hi) - t(f_lo)) / (k_hi - k_lo) * 1e3
    state_mb = 3 * b * h * (n // 2 + 1) * (d // h) * 4 / 1e6
    print(json.dumps({
        "batch": b, "d": d, "n_fft": n,
        "ms_per_token": round(ms, 4),
        "decode_tok_s": round(b / (ms / 1e3)),
        "prefix_traffic_mb_per_step": round(state_mb, 2),
        "bw_floor_ms": round(state_mb / 819.0, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
