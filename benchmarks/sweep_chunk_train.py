"""Chunk sweep for the causal block in TRAINING (fwd+bwd, bf16).

The round-4 `preferred_causal_chunk` retune was measured on the forward
only (the bench.py competitive sweep); the round-5 training-sweep refresh
showed fwd+bwd regressed at 8k (16.5 -> 26.7 ms vs round 3, which ran
chunk 1024).  This sweeps block fwd+bwd across chunks with the CURRENT
kernels so the default can serve both modes.

Usage (chip): PYTHONPATH=.:/root/.axon_site PYTHONUNBUFFERED=1 \
    python benchmarks/sweep_chunk_train.py [seq ...]
"""

import json
import sys

import jax
import jax.numpy as jnp

from benchmarks.mix_vs_attention import slope_time
from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init

D, HEADS = 512, 8


def main():
    seqs = [int(s) for s in sys.argv[1:]] or [8192, 32768]
    for seq in seqs:
        batch = max(1, 32768 // seq)
        x = jax.random.normal(jax.random.key(1), (batch, seq, D),
                              jnp.bfloat16)
        for chunk in (256, 512, 1024, 2048):
            if chunk > seq // 2 or seq % chunk:
                continue
            if seq // chunk > 64:
                # nc^2-scaled segment spectra (f32[nc,nc,F2,G], last dim
                # padded 32->128 by T(8,128) tiling) blow 16 GB HBM in
                # the bwd: chunk 256 at seq 32k (nc=128) OOM'd by 1 GB
                continue
            cfg = SpectreConfig(
                embed_dim=D, num_heads=HEADS, n_fft=seq,
                pooling_type="mean", wavelet_on_rate=0.0, causal=True,
                causal_chunk=chunk, compute_dtype="bfloat16")
            params = spectre_block_init(jax.random.key(2), cfg)
            t_f = slope_time(lambda p, h: spectre_block_apply(p, cfg, h),
                             params, x, backward=False)
            t_fb = slope_time(lambda p, h: spectre_block_apply(p, cfg, h),
                              params, x, backward=True)
            print(json.dumps({
                "seq": seq, "chunk": chunk,
                "fwd_ms": round(t_f * 1e3, 3),
                "fwdbwd_ms": round(t_fb * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
