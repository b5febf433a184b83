"""SPECTRE block vs. attention-block throughput across sequence lengths.

The BASELINE target: beat a FlashAttention-class baseline in tokens/s beyond
seq 8k.  On TPU the strongest practical baseline is XLA's fused
dot-product attention (jax.nn.dot_product_attention) inside an otherwise
identical pre-LN block — same d_model, heads, MLP — so the only difference
is the token mixer: O(N^2) attention vs O(N log N) spectral mixing.

Timing: slope method (chained lax.scan at two depths, single transfer) —
see bench.py for why per-call timing lies on this relay.

Usage: PYTHONPATH=.:... python benchmarks/mix_vs_attention.py [--bwd]
"""

from __future__ import annotations

import argparse
import math
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.layers.common import (
    gelu_exact, layernorm_apply, layernorm_init, linear_apply, linear_init,
)

D = 512
HEADS = 8


def attn_block_init(key):
    ks = jax.random.split(key, 6)
    return {
        "ln1": layernorm_init(D), "ln2": layernorm_init(D),
        "w_q": linear_init(ks[0], D, D, bias=False),
        "w_k": linear_init(ks[1], D, D, bias=False),
        "w_v": linear_init(ks[2], D, D, bias=False),
        "w_o": linear_init(ks[3], D, D, bias=False),
        "mlp": {"fc1": linear_init(ks[4], D, 4 * D),
                "fc2": linear_init(ks[5], 4 * D, D)},
    }


QBLK = 512


def _flash_causal_attention(q, k, v):
    """Memory-efficient blockwise causal attention (FlashAttention-style
    online softmax, O(N) memory): queries in blocks of QBLK, keys scanned.
    Dense attention materializes an O(N^2) score matrix and OOMs at seq 8k
    on one chip — this is the strong baseline."""
    b, n, h, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    nq = n // QBLK
    qb = jnp.moveaxis(q.reshape(b, nq, QBLK, h, hd), 3, 2)   # (B,nq,H,Q,hd)
    kb = jnp.moveaxis(k.reshape(b, nq, QBLK, h, hd), 3, 2)
    vb = jnp.moveaxis(v.reshape(b, nq, QBLK, h, hd), 3, 2)

    qi = jnp.arange(QBLK)[:, None]
    kj = jnp.arange(QBLK)[None, :]

    def per_qblock(ci, qc):
        # scan over key blocks 0..ci with running max/denominator.
        # checkpoint: without it the scan's grad saves every block's score
        # matrix -> O(N^2) memory, OOMing the bwd at seq 8k (flash
        # attention's whole point is recomputing these in bwd).
        @jax.checkpoint
        def body(carry, cj):
            m, l, acc = carry
            kc = kb[:, cj]
            vc = vb[:, cj]
            s = jnp.einsum("bhqd,bhkd->bhqk", qc, kc,
                           preferred_element_type=jnp.float32) * scale
            mask = jnp.where(cj < ci, True, qi >= kj)        # causal
            active = cj <= ci
            s = jnp.where(mask & active, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(vc.dtype), vc)
            return (m_new, l, acc), None

        m0 = jnp.full((b, h, QBLK), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, QBLK), jnp.float32)
        a0 = jnp.zeros((b, h, QBLK, hd), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), jnp.arange(nq))
        return acc / l[..., None]

    out = jax.lax.map(lambda ci: per_qblock(ci, qb[:, ci]),
                      jnp.arange(nq))                        # (nq,B,H,Q,hd)
    out = jnp.moveaxis(out, 0, 1)                            # (B,nq,H,Q,hd)
    out = jnp.moveaxis(out, 2, 3).reshape(b, n, h, hd)
    return out.astype(q.dtype)


def attn_block_apply(p, x, impl="auto"):
    b, n, d = x.shape
    h = layernorm_apply(p["ln1"], x)
    q = linear_apply(p["w_q"], h).reshape(b, n, HEADS, d // HEADS)
    k = linear_apply(p["w_k"], h).reshape(b, n, HEADS, d // HEADS)
    v = linear_apply(p["w_v"], h).reshape(b, n, HEADS, d // HEADS)
    if impl == "xla" or (impl == "auto" and n <= 4096):
        o = jax.nn.dot_product_attention(q, k, v, is_causal=True)
    else:
        o = _flash_causal_attention(q, k, v)
    x = x + linear_apply(p["w_o"], o.reshape(b, n, d))
    h2 = layernorm_apply(p["ln2"], x)
    return x + linear_apply(p["mlp"]["fc2"],
                            gelu_exact(linear_apply(p["mlp"]["fc1"], h2)))


def slope_time(apply_fn, params, x, backward, k_lo=3, k_hi=9):
    if backward:
        def one(p, h):
            g = jax.grad(lambda p: jnp.sum(
                apply_fn(p, h).astype(jnp.float32) ** 2))(p)
            return jax.tree.leaves(g)[0].reshape(-1)[0]

        def chain(p, x, k):
            def body(c, _):
                return c + one(p, x + c * 1e-12), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
    else:
        def chain(p, x, k):
            def body(h, _):
                return apply_fn(p, h).astype(x.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=k)
            return h[0, 0, 0]

    f_lo = jax.jit(lambda p, x: chain(p, x, k_lo))
    f_hi = jax.jit(lambda p, x: chain(p, x, k_hi))
    float(np.asarray(f_lo(params, x)))
    float(np.asarray(f_hi(params, x)))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(params, x)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--seqs", default="1024,2048,4096,8192,16384,32768")
    ap.add_argument("--tokens", type=int, default=32768,
                    help="tokens per batch (batch = tokens/seq)")
    args = ap.parse_args()

    attn_params = attn_block_init(jax.random.key(0))
    for seq in (int(s) for s in args.seqs.split(",")):
        batch = max(1, args.tokens // seq)
        x = jax.random.normal(jax.random.key(1), (batch, seq, D),
                              jnp.bfloat16)
        from fft_tpu.layers.causal_seg import preferred_causal_chunk
        cfg = SpectreConfig(embed_dim=D, num_heads=HEADS, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True,
                            causal_chunk=preferred_causal_chunk(
                                seq, D, train=args.bwd),
                            compute_dtype="bfloat16")
        sp_params = spectre_block_init(jax.random.key(2), cfg)

        t_spectre = slope_time(
            lambda p, h: spectre_block_apply(p, cfg, h), sp_params, x,
            args.bwd)
        # strongest-baseline policy: time BOTH attention implementations
        # (XLA fused <=4k where dense scores fit; blockwise online-softmax
        # everywhere) and score SPECTRE against the better one.
        t_attn = slope_time(
            lambda p, h: attn_block_apply(p, h, "flash"), attn_params, x,
            args.bwd)
        if seq <= 4096:
            t_xla = slope_time(
                lambda p, h: attn_block_apply(p, h, "xla"), attn_params, x,
                args.bwd)
            t_attn = min(t_attn, t_xla)
        toks = batch * seq
        print(json.dumps({
            "seq": seq, "batch": batch, "mode": "fwd+bwd" if args.bwd else "fwd",
            "spectre_ms": round(t_spectre * 1e3, 3),
            "attention_ms": round(t_attn * 1e3, 3),
            "spectre_tok_s": round(toks / t_spectre),
            "attention_tok_s": round(toks / t_attn),
            "speedup": round(t_attn / t_spectre, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
