"""SPECTRE language models (BASELINE.json configs 2 and 4).

The reference ships no models (SURVEY §2.4); this is the framework's causal
LM: token + learned positional embeddings, a stack of SPECTRE blocks run
under ``lax.scan`` (one compiled block body regardless of depth), final
LayerNorm, and a (tied) LM head.  Causal spectral gating
(``SpectreConfig.causal=True``) keeps training consistent with the O(F)
streaming decode path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from fft_tpu.config import SpectreConfig
from fft_tpu.decode import (
    PrefixFFTCache, cache_init, spectre_block_decode_step,
)
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.layers.causal_seg import preferred_causal_chunk as _preferred_chunk
from fft_tpu.layers.common import layernorm_apply, layernorm_init


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int
    num_layers: int
    block: SpectreConfig
    max_seq: int
    tie_embeddings: bool = True
    emb_init_std: float = 0.02
    # rematerialize each block in backward (trade FLOPs for activation
    # memory — required for the 350M/seq-16k configs on one chip)
    remat: bool = False

    @property
    def embed_dim(self) -> int:
        return self.block.embed_dim

    def __post_init__(self):
        assert self.max_seq <= self.block.n_fft or not self.block.causal, (
            "causal LM sequences must fit the spectral window")


def tiny_lm_config(vocab_size: int = 256, seq: int = 2048) -> LMConfig:
    """Config 2: 6-layer tiny LM, d=512, 8 heads, char-level, seq 2048."""
    return LMConfig(
        vocab_size=vocab_size,
        num_layers=6,
        max_seq=seq,
        block=SpectreConfig(
            embed_dim=512, num_heads=8, n_fft=seq, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True, causal_chunk=128,
            memory_size=0),
    )


def spectre_350m_config(vocab_size: int = 50432, seq: int = 16384) -> LMConfig:
    """Config 4: long-context causal SPECTRE-350M, seq 16k-64k."""
    return LMConfig(
        vocab_size=vocab_size,
        num_layers=24,
        max_seq=seq,
        remat=True,
        # preferred_causal_chunk picks the fastest measured fused-kernel
        # chunk per regime (see its docstring): dense-forward regime
        # (seq <= 8k) prefers min(512, seq/4); large-seq regime tries
        # seq/4 down to seq/32.  The floor of 512 keeps the segmented
        # working set — which scales with nc^2 * chunk = nc * seq —
        # inside one chip's HBM at seq 64k.
        block=SpectreConfig(
            embed_dim=1024, num_heads=16, n_fft=seq, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True,
            causal_chunk=max(512, _preferred_chunk(seq, 1024)),
            memory_size=0),
    )


def lm_init(key, cfg: LMConfig, dtype=jnp.float32):
    ke, kp, kb, kh = jax.random.split(key, 4)
    d = cfg.embed_dim
    layer_keys = jax.random.split(kb, cfg.num_layers)
    blocks = jax.vmap(
        lambda k: spectre_block_init(k, cfg.block, dtype))(layer_keys)
    params = {
        "tok_emb": jax.random.normal(ke, (cfg.vocab_size, d), dtype)
        * cfg.emb_init_std,
        "pos_emb": jax.random.normal(kp, (cfg.max_seq, d), dtype)
        * cfg.emb_init_std,
        "blocks": blocks,                      # stacked over layers
        "ln_f": layernorm_init(d, dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(kh, (d, cfg.vocab_size),
                                              dtype) * cfg.emb_init_std
    return params


def _run_blocks(params, cfg: LMConfig, h, rngs, deterministic,
                sp_mesh=None, pp_mesh=None):
    """Scan the block stack: one compiled body for all layers.

    ``pp_mesh`` (a mesh with a 'stage' axis) runs the stack as a GPipe
    pipeline instead (parallel/pipeline.py); dropout keys are not threaded
    through the pipeline, so PP training runs the blocks deterministically
    (the tiny/350m presets have dropout_p=0 anyway)."""
    if pp_mesh is not None:
        from fft_tpu.parallel.pipeline import pipeline_apply
        return pipeline_apply(
            params["blocks"],
            lambda p, x: spectre_block_apply(p, cfg.block, x),
            h, mesh=pp_mesh)

    if rngs is None:
        layer_rngs = jnp.zeros((cfg.num_layers, 2), jnp.uint32)
        use_rngs = False
    else:
        base = rngs.get("dropout", jax.random.key(0))
        layer_rngs = jax.random.split(base, cfg.num_layers)
        use_rngs = True

    def body(h, xs):
        block_params, rng = xs
        r = {"dropout": rng, "wavelet": jax.random.fold_in(rng, 1)} \
            if use_rngs else None
        h = spectre_block_apply(block_params, cfg.block, h, rngs=r,
                                deterministic=deterministic,
                                sp_mesh=sp_mesh)
        return h, None

    if cfg.remat:
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, h, (params["blocks"], layer_rngs))
    return h


def _seq_shards(mesh) -> int:
    return mesh.shape.get("seq", 1) if mesh is not None else 1


def lm_hidden(params, cfg: LMConfig, tokens: jnp.ndarray, *,
              rngs: Optional[dict] = None, deterministic: bool = True,
              mesh=None, pp_mesh=None):
    """tokens (B, N) -> final-LN hidden states (B, N, d).

    With ``mesh`` carrying a 'seq' axis of size > 1, activations are
    sequence-sharded (SP): the embedding output gets an explicit
    ``with_sharding_constraint`` on P('data', 'seq', None) and GSPMD
    propagates it through the stack — shard-local for the segmented causal
    algorithm (layers/causal_seg.py), via the distributed four-step FFT for
    the non-causal mix (sp_mesh threaded into the blocks)."""
    n = tokens.shape[-1]
    h = (params["tok_emb"][tokens] + params["pos_emb"][:n]).astype(
        cfg.block.compute_dtype)
    sp_mesh = None
    if _seq_shards(mesh) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P("data", "seq", None)))
        if not cfg.block.causal:
            sp_mesh = mesh    # four-step distributed FFT inside the mix
    h = _run_blocks(params, cfg, h, rngs, deterministic,
                    sp_mesh=sp_mesh, pp_mesh=pp_mesh)
    return layernorm_apply(params["ln_f"], h)


def lm_head_matrix(params, cfg: LMConfig):
    return params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]


def lm_apply(params, cfg: LMConfig, tokens: jnp.ndarray, *,
             rngs: Optional[dict] = None, deterministic: bool = True,
             mesh=None, pp_mesh=None):
    """tokens (B, N) int32 -> logits (B, N, vocab)."""
    h = lm_hidden(params, cfg, tokens, rngs=rngs,
                  deterministic=deterministic, mesh=mesh, pp_mesh=pp_mesh)
    head = lm_head_matrix(params, cfg)
    # logits in fp32 for a stable softmax/loss regardless of compute dtype
    return (h @ head.astype(h.dtype)).astype(jnp.float32)


def lm_decode_init(cfg: LMConfig, batch: int) -> PrefixFFTCache:
    """Stacked per-layer decode caches (leading axis = layer)."""
    one = cache_init(batch, cfg.block.num_heads, cfg.block.n_fft,
                     cfg.block.head_dim)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_layers,) + x.shape), one)


def lm_decode_step(params, cfg: LMConfig, token: jnp.ndarray, pos,
                   caches: PrefixFFTCache):
    """One autoregressive step: token (B,) int32 at position ``pos`` ->
    (logits (B, vocab), updated caches)."""
    h = params["tok_emb"][token] + params["pos_emb"][pos]

    def body(h, xs):
        block_params, cache = xs
        h, cache = spectre_block_decode_step(block_params, cfg.block, h, cache)
        return h, cache

    h, caches = jax.lax.scan(body, h, (params["blocks"], caches))
    h = layernorm_apply(params["ln_f"], h)
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    return h @ head, caches


def lm_prefill(params, cfg: LMConfig, tokens: jnp.ndarray):
    """Batched prompt ingestion: ONE causal forward pass builds every
    layer's decode cache (rfft prefill + ring buffers), instead of feeding
    the prompt token-by-token.  Returns (last-position logits, caches).

    Requires the causal model (training forward == decode semantics), so
    continuing with lm_decode_step is exactly equivalent to having decoded
    the prompt step-by-step."""
    from fft_tpu.decode.cache import spectre_block_prefill

    b, length = tokens.shape
    h = (params["tok_emb"][tokens] + params["pos_emb"][:length]).astype(
        cfg.block.compute_dtype)

    one = cache_init(b, cfg.block.num_heads, cfg.block.n_fft,
                     cfg.block.head_dim)

    def body(h, block_params):
        cache = spectre_block_prefill(block_params, cfg.block,
                                      h.astype(jnp.float32), one)
        h = spectre_block_apply(block_params, cfg.block, h)
        return h, cache

    h, caches = jax.lax.scan(body, h, params["blocks"])
    h = layernorm_apply(params["ln_f"], h[:, -1])
    head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    logits = (h @ head.astype(h.dtype)).astype(jnp.float32)
    return logits, caches


def lm_prefill_split(params, cfg: LMConfig, tokens: jnp.ndarray):
    """``lm_prefill`` in TWO separately-jitted modules (identical math).

    On the relay-tunneled backend a single XLA module containing both the
    full 24-layer forward AND every layer's cache-building rFFT exceeds
    what the remote compile server will finish before dropping the HTTP
    connection ("Broken pipe" after ~25-45 min, observed twice at 350M /
    seq 16k).  Splitting at the natural seam — (1) forward pass collecting
    each layer's input hidden states, (2) cache build over the stacked
    states — halves the per-module compile load; the Python boundary costs
    one extra dispatch round trip and one (layers, B, N, d) HBM-resident
    stack.  Asserted equal to ``lm_prefill`` in tests/test_decode.py."""
    fwd, build_caches = _prefill_split_fns(cfg)
    logits, hs = fwd(params, tokens)
    return logits, build_caches(params, hs)


@functools.lru_cache(maxsize=8)
def _prefill_split_fns(cfg: LMConfig):
    """The two jitted halves of lm_prefill_split, cached per config (a
    fresh jax.jit per call would retrace every invocation)."""
    from fft_tpu.decode.cache import spectre_block_prefill

    @jax.jit
    def fwd(params, tokens):
        b, length = tokens.shape
        h = (params["tok_emb"][tokens] + params["pos_emb"][:length]).astype(
            cfg.block.compute_dtype)

        def body(h, block_params):
            h_in = h
            h = spectre_block_apply(block_params, cfg.block, h)
            return h, h_in

        h, hs = jax.lax.scan(body, h, params["blocks"])
        h = layernorm_apply(params["ln_f"], h[:, -1])
        head = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
        return (h @ head.astype(h.dtype)).astype(jnp.float32), hs

    @jax.jit
    def build_caches(params, hs):
        b = hs.shape[1]
        one = cache_init(b, cfg.block.num_heads, cfg.block.n_fft,
                         cfg.block.head_dim)

        def body(carry, xs):
            block_params, h_in = xs
            return carry, spectre_block_prefill(
                block_params, cfg.block, h_in.astype(jnp.float32), one)

        _, caches = jax.lax.scan(body, None, (params["blocks"], hs))
        return caches

    return fwd, build_caches


def lm_generate(params, cfg: LMConfig, prompt: jnp.ndarray, steps: int,
                *, rng=None, temperature: float = 0.0):
    """Greedy/sampled generation from a (B, L) prompt: batched prefill, then
    the O(F)-per-token decode path.  Returns (B, steps) generated tokens."""
    b, length = prompt.shape
    assert length + steps <= cfg.max_seq, (
        f"generation to position {length + steps} exceeds max_seq "
        f"{cfg.max_seq} (pos_emb would silently clamp)")
    logits, caches = lm_prefill(params, cfg, prompt)

    def sample(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature, axis=-1)

    def gen(carry, i):
        caches, logits, key = carry
        key, sub = jax.random.split(key)
        tok = sample(logits, sub)
        logits, caches = lm_decode_step(params, cfg, tok, length + i, caches)
        return (caches, logits, key), tok

    key0 = rng if rng is not None else jax.random.key(0)
    _, toks = jax.lax.scan(gen, (caches, logits, key0), jnp.arange(steps))
    return jnp.moveaxis(toks, 0, 1)                          # (B, steps)
