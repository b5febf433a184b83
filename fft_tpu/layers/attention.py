"""Causal sliding-window attention (for the hybrid model, BASELINE config 5).

TPU-native blockwise formulation: the sequence is split into static blocks
of ``window`` tokens; each block attends to itself and the previous block
under a causal + window-band mask.  All shapes static, einsum-only — O(N*W*d)
and MXU-friendly.  This is the layer family where classic context
parallelism (halo exchange of the previous KV block over the 'seq' axis)
applies; the SPECTRE layers use the distributed-FFT path instead.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fft_tpu.layers.common import (
    gelu_exact, layernorm_apply, layernorm_init, linear_apply, linear_init,
)


def swa_init(key, embed_dim: int, num_heads: int, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "w_q": linear_init(kq, embed_dim, embed_dim, bias=False, dtype=dtype),
        "w_k": linear_init(kk, embed_dim, embed_dim, bias=False, dtype=dtype),
        "w_v": linear_init(kv, embed_dim, embed_dim, bias=False, dtype=dtype),
        "w_o": linear_init(ko, embed_dim, embed_dim, bias=False, dtype=dtype),
    }


def sliding_window_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window: int
) -> jnp.ndarray:
    """q, k, v: (B, N, H, hd); causal attention restricted to the last
    ``window`` tokens.  Sequences that don't divide into window blocks are
    zero-padded at the end (causality makes trailing pad invisible to real
    queries)."""
    b, n, h, hd = q.shape
    w = window
    if n % w:
        pad = w - n % w
        cfgpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        out = sliding_window_attention(jnp.pad(q, cfgpad), jnp.pad(k, cfgpad),
                                       jnp.pad(v, cfgpad), w)
        return out[:, :n]
    nb = n // w
    qb = q.reshape(b, nb, w, h, hd)
    kb = k.reshape(b, nb, w, h, hd)
    vb = v.reshape(b, nb, w, h, hd)
    # keys/values for block i: blocks i-1 and i (2W tokens)
    k_halo = jnp.zeros_like(kb[:, 0])
    v_halo = jnp.zeros_like(vb[:, 0])
    out = _banded_block_attention(qb, kb, vb, k_halo, v_halo,
                                  jnp.asarray(0, jnp.int32))
    return out.reshape(b, n, h, hd)


def _banded_block_attention(qb, kb, vb, k_halo, v_halo, gi0):
    """Blockwise causal window attention over (B, nb, W, H, hd) blocks.
    ``k_halo/v_halo`` (B, W, H, hd) is the block BEFORE qb's first block
    (zeros at the true sequence start); ``gi0`` is the global index of the
    first block, used to mask the nonexistent previous block at gi0 == 0."""
    b, nb, w, h, hd = qb.shape
    scale = 1.0 / math.sqrt(hd)
    k_prev = jnp.concatenate([k_halo[:, None], kb[:, :-1]], axis=1)
    v_prev = jnp.concatenate([v_halo[:, None], vb[:, :-1]], axis=1)
    k2 = jnp.concatenate([k_prev, kb], axis=2)            # (B, nb, 2W, H, hd)
    v2 = jnp.concatenate([v_prev, vb], axis=2)

    # mask: query position (in-block) i attends key position j of the 2W
    # span iff 0 <= (i + W - j) < W  (causal, window length W), and global
    # block 0 has no previous block.
    qi = jnp.arange(w)[:, None]
    kj = jnp.arange(2 * w)[None, :]
    dist = qi + w - kj
    band = (dist >= 0) & (dist < w)                        # (W, 2W)

    # checkpointed: without it the backward of the lax.map saves every
    # block's f32 scores + probs + mask as stacked scan residuals —
    # (nb, B, H, W, 2W) in f32+bf16+pred, 3.5 GB at the 1B seq-16k shape,
    # which alone overflowed the chip.  Recomputing one einsum+softmax per
    # block in backward costs a few percent of the step.
    @jax.checkpoint
    def one_block(args):
        i, qc, kc, vc = args
        s = jnp.einsum("bqhd,bkhd->bhqk", qc, kc,
                       preferred_element_type=jnp.float32) * scale
        valid = band & ~((gi0 + i == 0) & (kj < w))
        s = jnp.where(valid[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(vc.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vc)

    # lax.map over query blocks bounds live score memory to one
    # (B, H, W, 2W) tile (the all-blocks einsum is O(N*W) scores — 4.3 GB
    # at seq 32k, window 1024, which starves large-model training).
    out = jax.lax.map(one_block,
                      (jnp.arange(nb), jnp.moveaxis(qb, 1, 0),
                       jnp.moveaxis(k2, 1, 0), jnp.moveaxis(v2, 1, 0)))
    return jnp.moveaxis(out, 0, 1)                         # (B, nb, W, H, hd)


def sliding_window_attention_cp(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window: int,
    mesh, seq_axis: str = "seq",
) -> jnp.ndarray:
    """Context-parallel SWA (SURVEY:133, config 5): the sequence axis is
    sharded over ``mesh[seq_axis]`` and each shard attends locally after a
    SINGLE halo exchange — a ``ppermute`` shipping every shard's last
    (W, H, hd) KV block to its right neighbor.  That is the entire
    communication cost: one (B, W, d) hop per layer, riding ICI.

    Requires the shard-local length to be a multiple of ``window``."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    b, n, h, hd = q.shape
    s = mesh.shape[seq_axis]
    w = window
    assert (n // s) % w == 0, (
        f"shard-local length {n // s} must divide into windows of {w}")
    nb_local = n // s // w

    def local(q, k, v):
        idx = jax.lax.axis_index(seq_axis)
        bb = q.shape[0]
        qb = q.reshape(bb, nb_local, w, h, hd)
        kb = k.reshape(bb, nb_local, w, h, hd)
        vb = v.reshape(bb, nb_local, w, h, hd)
        # halo: my last block -> right neighbor (shard 0 receives zeros,
        # which is exactly the sequence-start boundary condition)
        perm = [(i, i + 1) for i in range(s - 1)]
        k_halo = jax.lax.ppermute(kb[:, -1], seq_axis, perm)
        v_halo = jax.lax.ppermute(vb[:, -1], seq_axis, perm)
        out = _banded_block_attention(qb, kb, vb, k_halo, v_halo,
                                      idx * nb_local)
        return out.reshape(bb, nb_local * w, h, hd)

    axes = dict(mesh.shape)
    bspec = "data" if axes.get("data", 1) > 1 else None
    hspec = "model" if axes.get("model", 1) > 1 else None
    spec = P(bspec, seq_axis, hspec, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)


def swa_apply(params, x: jnp.ndarray, num_heads: int, window: int,
              cp_mesh=None, seq_axis: str = "seq") -> jnp.ndarray:
    """(B, N, d) -> (B, N, d) causal sliding-window multi-head attention.
    With ``cp_mesh``, runs context-parallel with halo exchange."""
    b, n, d = x.shape
    hd = d // num_heads
    q = linear_apply(params["w_q"], x).reshape(b, n, num_heads, hd)
    k = linear_apply(params["w_k"], x).reshape(b, n, num_heads, hd)
    v = linear_apply(params["w_v"], x).reshape(b, n, num_heads, hd)
    if cp_mesh is not None:
        out = sliding_window_attention_cp(q, k, v, window, cp_mesh,
                                          seq_axis).reshape(b, n, d)
    else:
        out = sliding_window_attention(q, k, v, window).reshape(b, n, d)
    return linear_apply(params["w_o"], out)


def swa_block_init(key, embed_dim: int, num_heads: int, mlp_ratio: int = 4,
                   dtype=jnp.float32):
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "ln1": layernorm_init(embed_dim, dtype),
        "attn": swa_init(ka, embed_dim, num_heads, dtype),
        "ln2": layernorm_init(embed_dim, dtype),
        "mlp": {
            "fc1": linear_init(k1, embed_dim, mlp_ratio * embed_dim,
                               dtype=dtype),
            "fc2": linear_init(k2, mlp_ratio * embed_dim, embed_dim,
                               dtype=dtype),
        },
    }


def swa_block_apply(params, x: jnp.ndarray, num_heads: int, window: int,
                    compute_dtype=None, cp_mesh=None) -> jnp.ndarray:
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    x = x + swa_apply(params["attn"], layernorm_apply(params["ln1"], x),
                      num_heads, window, cp_mesh=cp_mesh)
    h = layernorm_apply(params["ln2"], x)
    h = linear_apply(params["mlp"]["fc2"],
                     gelu_exact(linear_apply(params["mlp"]["fc1"], h)))
    return x + h


# ---------------------------------------------------------------------------
# Decode cache for sliding-window attention
# ---------------------------------------------------------------------------

class SWACache(NamedTuple):
    """Ring-buffer KV cache over the attention window."""
    k_buf: jnp.ndarray   # (B, H, W, hd)
    v_buf: jnp.ndarray   # (B, H, W, hd)
    t: jnp.ndarray       # () int32 last filled position


def swa_cache_init(batch: int, num_heads: int, window: int, head_dim: int,
                   dtype=jnp.float32) -> SWACache:
    shape = (batch, num_heads, window, head_dim)
    return SWACache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                    jnp.asarray(-1, jnp.int32))


def swa_block_decode_step(params, x_t: jnp.ndarray, cache: SWACache,
                          num_heads: int) -> Tuple[jnp.ndarray, SWACache]:
    """Single-token decode: attend over the ring window."""
    b, d = x_t.shape
    hd = d // num_heads
    w = cache.k_buf.shape[-2]
    h_ln = layernorm_apply(params["ln1"], x_t)
    q = linear_apply(params["attn"]["w_q"], h_ln).reshape(b, num_heads, hd)
    k = linear_apply(params["attn"]["w_k"], h_ln).reshape(b, num_heads, hd)
    v = linear_apply(params["attn"]["w_v"], h_ln).reshape(b, num_heads, hd)

    t = cache.t + 1
    j = jnp.mod(t, w)
    k_buf = jax.lax.dynamic_update_slice_in_dim(
        cache.k_buf, k[..., None, :], j, axis=2)
    v_buf = jax.lax.dynamic_update_slice_in_dim(
        cache.v_buf, v[..., None, :], j, axis=2)

    scores = jnp.einsum("bhd,bhwd->bhw", q, k_buf,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    slot_valid = jnp.arange(w) <= t                        # before first wrap
    scores = jnp.where(slot_valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x_t.dtype)
    attn = jnp.einsum("bhw,bhwd->bhd", probs, v_buf).reshape(b, d)
    x_t = x_t + linear_apply(params["attn"]["w_o"], attn)

    h2 = layernorm_apply(params["ln2"], x_t)
    h2 = linear_apply(params["mlp"]["fc2"],
                      gelu_exact(linear_apply(params["mlp"]["fc1"], h2)))
    return x_t + h2, SWACache(k_buf, v_buf, t)
