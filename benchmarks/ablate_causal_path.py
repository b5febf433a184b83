"""Ablation: where does the causal SPECTRE block's forward time go?

Times (slope method, chained scans) at a given seq/chunk:
  block   — full spectre_block_apply fwd
  proj    — Q/V projections + causal chunk gates (GEMM + gate MLP side)
  kf      — the kernel-segment spectra pipeline: gate transpose ->
            irfft(n_fft) -> segment rfft(2C)   [the candidate hot spot]
  mix     — fused_causal_mix given precomputed (v, kf)
  mlp     — block MLP + LNs + out_proj (everything but the mix)

Usage: PYTHONPATH=.:... python benchmarks/ablate_causal_path.py [seq] [chunk]
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
from fft_tpu.layers.causal_seg import preferred_causal_chunk
from fft_tpu.layers.spectre import causal_chunk_gates
from fft_tpu.layers.common import layernorm_apply, linear_apply
from fft_tpu.ops import fftops
from fft_tpu.kernels.matfft import precision_for

D = 512
HEADS = 8
TOKENS = 32768


def slope(fn, *args, k_lo=3, k_hi=12):
    """fn(args, h) -> array; chain by feeding a scalar perturbation."""
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


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    batch = max(1, TOKENS // seq)
    chunk = (int(sys.argv[2]) if len(sys.argv) > 2
             else preferred_causal_chunk(seq, D))
    nc = seq // chunk
    cfg = SpectreConfig(embed_dim=D, num_heads=HEADS, n_fft=seq,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        causal=True, causal_chunk=chunk,
                        compute_dtype="bfloat16")
    hcfg = cfg.head_config()
    params = spectre_block_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (batch, seq, D), jnp.bfloat16)
    print(f"seq={seq} batch={batch} chunk={chunk} nc={nc}", flush=True)

    t_block = slope(
        lambda p, h, c: spectre_block_apply(p, cfg, h + (c * 1e-20).astype(h.dtype)),
        params, x)

    # pieces --------------------------------------------------------------
    hp = params["mix"]["heads"]
    xh = jnp.moveaxis(x.reshape(batch, seq, HEADS, D // HEADS), 2, 0)

    def proj_gates(hp, xh, c):
        def per_head(hpp, xi):
            q = linear_apply(hpp["w_q"], xi + (c * 1e-20).astype(xi.dtype))
            vv = linear_apply(hpp["w_v"], xi)
            g = causal_chunk_gates(hpp, hcfg, q, nc, chunk)
            return vv, g
        vh, gate = jax.vmap(per_head)(hp, xh)
        return jnp.real(gate).sum()[None] + vh.sum()[None]

    t_proj = slope(proj_gates, hp, xh, k_lo=3, k_hi=12)

    # materialize (v, gate) once for the downstream pieces
    def mk_vg(hp, xh):
        def per_head(hpp, xi):
            q = linear_apply(hpp["w_q"], xi)
            vv = linear_apply(hpp["w_v"], xi)
            g = causal_chunk_gates(hpp, hcfg, q, nc, chunk)
            return vv, g
        vh, gate = jax.vmap(per_head)(hp, xh)
        v_all = jnp.moveaxis(vh, 0, 2).reshape(batch, seq, D)
        g_all = jnp.transpose(gate, (1, 2, 0, 3, 4)).reshape(
            batch, nc, HEADS * hcfg.num_groups, hcfg.f_half)
        return v_all, g_all

    v_all, g_all = jax.jit(mk_vg)(hp, xh)
    g_cols = HEADS * hcfg.num_groups
    prec = precision_for(cfg.compute_dtype)

    def kf_pipeline(gate, c):
        g_l = jnp.transpose(gate + (c * 1e-20).astype(gate.dtype), (0, 3, 1, 2)).reshape(
            batch, hcfg.f_half, nc * g_cols)
        k_time = fftops.irfft(g_l, cfg.n_fft, axis=-2, impl="matmul",
                              precision=prec)
        k_seg = k_time[:, :seq].reshape(batch, nc, chunk, nc * g_cols)
        kf_l = fftops.rfft(k_seg, 2 * chunk, axis=-2, impl="matmul",
                           precision=prec)
        return jnp.real(kf_l).sum()[None]

    t_kf = slope(kf_pipeline, g_all, k_lo=3, k_hi=12)

    # kf parts: irfft alone / rfft alone
    g_l0 = jax.jit(lambda g: jnp.transpose(g, (0, 3, 1, 2)).reshape(
        batch, hcfg.f_half, nc * g_cols))(g_all)

    def irfft_only(g_l, c):
        k_time = fftops.irfft(g_l + (c * 1e-20).astype(g_l.dtype), cfg.n_fft, axis=-2,
                              impl="matmul", precision=prec)
        return k_time.sum()[None]

    t_irfft = slope(irfft_only, g_l0, k_lo=3, k_hi=12)

    k_time0 = jax.jit(lambda g: fftops.irfft(
        g, cfg.n_fft, axis=-2, impl="matmul", precision=prec))(g_l0)

    def rfft_only(k_time, c):
        k_seg = (k_time[:, :seq] + (c * 1e-20).astype(k_time.dtype)).reshape(
            batch, nc, chunk, nc * g_cols)
        kf_l = fftops.rfft(k_seg, 2 * chunk, axis=-2, impl="matmul",
                           precision=prec)
        return jnp.real(kf_l).sum()[None]

    t_rfft = slope(rfft_only, k_time0, k_lo=3, k_hi=12)

    # fused mix given (v, kf)
    from fft_tpu.kernels import pallas_causal as pc
    kf0 = jax.jit(lambda g: fftops.rfft(
        fftops.irfft(jnp.transpose(g, (0, 3, 1, 2)).reshape(
            batch, hcfg.f_half, nc * g_cols),
            cfg.n_fft, axis=-2, impl="matmul", precision=prec)[:, :seq]
        .reshape(batch, nc, chunk, nc * g_cols),
        2 * chunk, axis=-2, impl="matmul", precision=prec))(g_all)
    kfr0, kfi0 = jnp.real(kf0), jnp.imag(kf0)
    fused_ok = pc.fused_mix_supported(nc, chunk, D)
    print(f"fused_mix_supported={fused_ok}", flush=True)
    if fused_ok:
        def mix_only(v, kfr, kfi, c):
            y = pc.fused_causal_mix(v + (c * 1e-20).astype(v.dtype), kfr, kfi, chunk,
                                    g_cols, True, False)
            return y.astype(jnp.float32).sum()[None]
        t_mix = slope(mix_only, v_all, kfr0, kfi0, k_lo=3, k_hi=12)
    else:
        t_mix = float("nan")

    # the non-mix side: LN -> MLP -> residual + out_proj (what both the
    # SPECTRE and the attention block pay identically)
    from fft_tpu.layers.common import gelu_exact

    def mlp_side(p, h, c):
        h = h + (c * 1e-20).astype(h.dtype)
        y = linear_apply(p["mix"]["out_proj"], h)
        z = layernorm_apply(p["ln2"], h + y)
        z = linear_apply(p["mlp"]["fc2"],
                         gelu_exact(linear_apply(p["mlp"]["fc1"], z)))
        return (y + z).astype(jnp.float32).sum()[None]

    t_mlp = slope(mlp_side, params, x, k_lo=3, k_hi=12)

    print(json.dumps({
        "seq": seq, "chunk": chunk, "batch": batch,
        "block_ms": round(t_block * 1e3, 3),
        "proj_gates_ms": round(t_proj * 1e3, 3),
        "kf_pipeline_ms": round(t_kf * 1e3, 3),
        "kf_irfft_ms": round(t_irfft * 1e3, 3),
        "kf_rfft_ms": round(t_rfft * 1e3, 3),
        "fused_mix_ms": round(t_mix * 1e3, 3),
        "mlp_outproj_ms": round(t_mlp * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
