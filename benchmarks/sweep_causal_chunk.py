"""Chunk-size sweep for the causal block at the short-seq margin sizes.

VERDICT r3 item 1: the causal-vs-attention margin at seq 1k (1.25x) and
4k (1.19x) sits below the 1.3x bar.  The ablation (ablate_causal_path.py,
on-chip 2026-08-19) shows the fused v2 mix is the dominant SPECTRE-side
slice (1.30 ms at 1k, 2.62 ms at 4k of 4.3/5.6 ms blocks).  The
`preferred_causal_chunk` defaults were tuned on an older kernel
generation (pre kf-spectra, pre bf16-scratch); this sweep re-measures
block fwd AND mix-only across chunk sizes with the CURRENT kernels and
prints the plan each shape dispatches to.

Usage: PYTHONPATH=.:... python benchmarks/sweep_causal_chunk.py [seq ...]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.layers.spectre import causal_chunk_gates
from fft_tpu.layers.common import linear_apply
from fft_tpu.kernels import pallas_causal as pc

D = 512
HEADS = 8
TOKENS = 32768


def slope(fn, *args, k_lo=3, k_hi=12):
    def chain(k):
        def run(*a):
            def body(c, _):
                out = fn(*a, c)
                return out.astype(jnp.float32).reshape(-1)[0] * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        return jax.jit(run)

    f_lo, f_hi = chain(k_lo), chain(k_hi)
    float(np.asarray(f_lo(*args)))
    float(np.asarray(f_hi(*args)))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo)


def sweep(seq: int):
    batch = max(1, TOKENS // seq)
    for chunk in (64, 128, 256, 512, 1024, 2048):
        if chunk > seq // 2 or seq % chunk:
            continue
        nc = seq // chunk
        cfg = SpectreConfig(embed_dim=D, num_heads=HEADS, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=chunk,
                            compute_dtype="bfloat16")
        hcfg = cfg.head_config()
        g_cols = HEADS * hcfg.num_groups
        if not pc.fused_mix_supported(nc, chunk, D, True, g_cols):
            print(json.dumps({"seq": seq, "chunk": chunk,
                              "skip": "fused_mix_unsupported"}), flush=True)
            continue
        plan = pc._fused_plan(nc, chunk, D, 2, True, g_cols)
        params = spectre_block_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (batch, seq, D),
                              jnp.bfloat16)

        t_block = slope(
            lambda p, h, c: spectre_block_apply(
                p, cfg, h + (c * 1e-20).astype(h.dtype)), params, x)

        # mix-only on precomputed kf (the same feed the block uses)
        hp = params["mix"]["heads"]
        xh = jnp.moveaxis(x.reshape(batch, seq, HEADS, D // HEADS), 2, 0)

        def mk_vg(hp, xh):
            def per_head(hpp, xi):
                q = linear_apply(hpp["w_q"], xi)
                vv = linear_apply(hpp["w_v"], xi)
                g = causal_chunk_gates(hpp, hcfg, q, nc, chunk)
                return vv, g
            vh, gate = jax.vmap(per_head)(hp, xh)
            v_all = jnp.moveaxis(vh, 0, 2).reshape(batch, seq, D)
            g_l = jnp.transpose(gate, (1, 4, 2, 0, 3)).reshape(
                batch, hcfg.f_half, nc * g_cols)
            return v_all, g_l

        v_all, g_l = jax.jit(mk_vg)(hp, xh)
        kfr0, kfi0 = jax.jit(lambda g: pc.kf_spectra(
            jnp.real(g), jnp.imag(g), seq, chunk, True,
            pc.INTERPRET))(g_l) if pc.kf_spectra_supported(seq, chunk) \
            and (nc * g_cols) % 128 == 0 else (None, None)
        if kfr0 is None:
            from fft_tpu.ops import fftops
            from fft_tpu.kernels.matfft import precision_for
            prec = precision_for(cfg.compute_dtype)
            kf = jax.jit(lambda g: fftops.rfft(
                fftops.irfft(g, seq, axis=-2, impl="matmul",
                             precision=prec)[:, :seq]
                .reshape(batch, nc, chunk, nc * g_cols),
                2 * chunk, axis=-2, impl="matmul", precision=prec))(g_l)
            kfr0, kfi0 = jnp.real(kf), jnp.imag(kf)

        def mix_only(v, kfr, kfi, c):
            y = pc.fused_causal_mix(v + (c * 1e-20).astype(v.dtype),
                                    kfr, kfi, chunk, g_cols, True, False)
            return y.astype(jnp.float32).sum()[None]

        t_mix = slope(mix_only, v_all, kfr0, kfi0)
        print(json.dumps({
            "seq": seq, "chunk": chunk, "nc": nc, "batch": batch,
            "plan_dblk_staged_scrbf16": plan,
            "block_ms": round(t_block * 1e3, 3),
            "mix_ms": round(t_mix * 1e3, 3),
        }), flush=True)


def main():
    seqs = [int(s) for s in sys.argv[1:]] or [1024, 4096]
    for s in seqs:
        sweep(s)


if __name__ == "__main__":
    main()
