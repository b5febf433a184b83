"""Hybrid LM: interleaved SPECTRE + causal sliding-window attention layers
(BASELINE.json config 5: 1B params, seq 32k).

Layer pattern: repeating groups of (spectre_per_group SPECTRE blocks +
1 sliding-window attention block), scanned over stacked group params — the
spectral layers carry global context; the attention layers sharpen local
structure within a window.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fft_tpu.config import SpectreConfig
from fft_tpu.decode import (
    PrefixFFTCache, cache_init, spectre_block_decode_step,
)
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.layers.attention import (
    SWACache, swa_block_apply, swa_block_decode_step, swa_block_init,
    swa_cache_init,
)
from fft_tpu.layers.common import layernorm_apply, layernorm_init


@dataclasses.dataclass(frozen=True)
class HybridConfig:
    vocab_size: int
    num_groups: int                      # layer groups
    spectre_per_group: int               # SPECTRE blocks per group
    block: SpectreConfig                 # SPECTRE block config (causal)
    attn_heads: int
    attn_window: int
    max_seq: int
    tie_embeddings: bool = True
    # rematerialize each (SPECTRE + SWA) group in backward — required to
    # train config 5 at long context on one chip (models/lm.py:36 does
    # the same per block)
    remat: bool = False

    @property
    def embed_dim(self) -> int:
        return self.block.embed_dim

    @property
    def num_layers(self) -> int:
        return self.num_groups * (self.spectre_per_group + 1)


def hybrid_tiny_config(vocab_size: int = 256, seq: int = 2048
                       ) -> HybridConfig:
    """Small hybrid for CLI smoke runs and tests: 2x (SPECTRE + SWA)."""
    return HybridConfig(
        vocab_size=vocab_size,
        num_groups=2, spectre_per_group=1,
        block=SpectreConfig(
            embed_dim=256, num_heads=4, n_fft=seq, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True,
            causal_chunk=max(128, seq // 8)),
        attn_heads=4, attn_window=max(64, seq // 8), max_seq=seq,
    )


def hybrid_1b_config(vocab_size: int = 50432, seq: int = 32768
                     ) -> HybridConfig:
    """Config 5: ~1B params, d=2048, seq 32k, SWA window 1024."""
    return HybridConfig(
        vocab_size=vocab_size,
        num_groups=8, spectre_per_group=1,   # 8x (SPECTRE + SWA) = 16 layers
        block=SpectreConfig(
            embed_dim=2048, num_heads=16, n_fft=seq, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True, causal_chunk=1024,
            compute_dtype="bfloat16"),
        attn_heads=16, attn_window=1024, max_seq=seq, remat=True,
    )


def hybrid_init(key, cfg: HybridConfig, dtype=jnp.float32):
    ke, kp, ks, ka = jax.random.split(key, 4)
    d = cfg.embed_dim
    s_keys = jax.random.split(ks, cfg.num_groups * cfg.spectre_per_group)
    a_keys = jax.random.split(ka, cfg.num_groups)
    spectre_blocks = jax.vmap(
        lambda k: spectre_block_init(k, cfg.block, dtype))(s_keys)
    # reshape stacked spectre params to (groups, per_group, ...)
    spectre_blocks = jax.tree.map(
        lambda x: x.reshape(cfg.num_groups, cfg.spectre_per_group,
                            *x.shape[1:]), spectre_blocks)
    attn_blocks = jax.vmap(
        lambda k: swa_block_init(k, d, cfg.attn_heads))(a_keys)
    return {
        "tok_emb": jax.random.normal(ke, (cfg.vocab_size, d), dtype) * 0.02,
        "pos_emb": jax.random.normal(kp, (cfg.max_seq, d), dtype) * 0.02,
        "spectre": spectre_blocks,           # (G, S, ...)
        "attn": attn_blocks,                 # (G, ...)
        "ln_f": layernorm_init(d, dtype),
    }


def _apply_group(group_params, cfg: HybridConfig, h: jnp.ndarray,
                 deterministic: bool = True, cp_mesh=None) -> jnp.ndarray:
    """One layer group: spectre_per_group SPECTRE blocks + one SWA block.
    group_params: {'spectre': stacked (S, ...), 'attn': (...)}.

    Context parallelism (SURVEY:133): the causal SPECTRE blocks shard their
    sequence axis through GSPMD (the segmented algorithm is shard-local up
    to one all-gather of segment spectra); the SWA block uses the explicit
    halo-exchange CP path when ``cp_mesh`` is given."""
    def sp_body(h, p):
        return spectre_block_apply(p, cfg.block, h,
                                   deterministic=deterministic), None

    h, _ = jax.lax.scan(sp_body, h, group_params["spectre"])
    return swa_block_apply(group_params["attn"], h, cfg.attn_heads,
                           cfg.attn_window,
                           compute_dtype=cfg.block.compute_dtype,
                           cp_mesh=cp_mesh)


def hybrid_hidden(params, cfg: HybridConfig, tokens: jnp.ndarray, *,
                  rngs: Optional[dict] = None, deterministic: bool = True,
                  cp_mesh=None):
    """tokens (B, N) -> final-LN hidden states (B, N, d)."""
    n = tokens.shape[-1]
    h = (params["tok_emb"][tokens] + params["pos_emb"][:n]).astype(
        cfg.block.compute_dtype)

    def group(h, xs):
        sp_params, at_params = xs
        return _apply_group({"spectre": sp_params, "attn": at_params},
                            cfg, h, deterministic=deterministic,
                            cp_mesh=cp_mesh), None

    if cfg.remat:
        group = jax.checkpoint(group)
    h, _ = jax.lax.scan(group, h, (params["spectre"], params["attn"]))
    return layernorm_apply(params["ln_f"], h)


def hybrid_head_matrix(params, cfg: HybridConfig):
    return params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]


def hybrid_apply(params, cfg: HybridConfig, tokens: jnp.ndarray, *,
                 rngs: Optional[dict] = None, deterministic: bool = True,
                 cp_mesh=None):
    """tokens (B, N) -> logits (B, N, vocab)."""
    h = hybrid_hidden(params, cfg, tokens, rngs=rngs,
                      deterministic=deterministic, cp_mesh=cp_mesh)
    head = hybrid_head_matrix(params, cfg)
    return (h @ head.astype(h.dtype)).astype(jnp.float32)


def hybrid_decode_init(cfg: HybridConfig, batch: int):
    sp_one = cache_init(batch, cfg.block.num_heads, cfg.block.n_fft,
                        cfg.block.head_dim)
    sp = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x, (cfg.num_groups, cfg.spectre_per_group) + x.shape), sp_one)
    at_one = swa_cache_init(batch, cfg.attn_heads, cfg.attn_window,
                            cfg.embed_dim // cfg.attn_heads)
    at = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_groups,) + x.shape), at_one)
    return sp, at


def hybrid_generate(params, cfg: HybridConfig, prompt: jnp.ndarray,
                    steps: int, *, rng=None, temperature: float = 0.0):
    """Greedy/sampled generation for the hybrid stack via its decode caches
    (SPECTRE prefix-FFT + SWA ring KV).  Returns (B, steps) tokens."""
    b, length = prompt.shape
    assert length + steps <= cfg.max_seq, (
        f"generation to position {length + steps} exceeds max_seq "
        f"{cfg.max_seq} (pos_emb would silently clamp)")
    caches = hybrid_decode_init(cfg, b)

    def feed(carry, i):
        caches, _ = carry
        logits, caches = hybrid_decode_step(params, cfg, prompt[:, i], i,
                                            caches)
        return (caches, logits), None

    (caches, logits), _ = jax.lax.scan(
        feed, (caches, jnp.zeros((b, cfg.vocab_size))), jnp.arange(length))

    def sample(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature, axis=-1)

    def gen(carry, i):
        caches, logits, key = carry
        key, sub = jax.random.split(key)
        tok = sample(logits, sub)
        logits, caches = hybrid_decode_step(params, cfg, tok, length + i,
                                            caches)
        return (caches, logits, key), tok

    key0 = rng if rng is not None else jax.random.key(0)
    _, toks = jax.lax.scan(gen, (caches, logits, key0), jnp.arange(steps))
    return jnp.moveaxis(toks, 0, 1)


def hybrid_decode_step(params, cfg: HybridConfig, token: jnp.ndarray, pos,
                       caches):
    """One autoregressive step for the hybrid stack."""
    sp_caches, at_caches = caches
    h = params["tok_emb"][token] + params["pos_emb"][pos]
    h = h.astype(cfg.block.compute_dtype)

    def group(h, xs):
        sp_params, sp_cache, at_params, at_cache = xs

        def sp_body(h, ps):
            p, c = ps
            h, c = spectre_block_decode_step(p, cfg.block, h, c)
            return h, c

        h, sp_cache = jax.lax.scan(sp_body, h, (sp_params, sp_cache))
        h, at_cache = swa_block_decode_step(at_params, h, at_cache,
                                            cfg.attn_heads)
        return h, (sp_cache, at_cache)

    h, (sp_caches, at_caches) = jax.lax.scan(
        group, h, (params["spectre"], sp_caches, params["attn"], at_caches))
    h = layernorm_apply(params["ln_f"], h)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    logits = (h @ head.astype(h.dtype)).astype(jnp.float32)
    return logits, (sp_caches, at_caches)
