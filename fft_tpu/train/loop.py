"""Training loop: optax AdamW with frozen-memory masking, LM/classification
losses, pure train_step (jit/pjit-able).

The reference has no training machinery (SURVEY §3.5); gradient flow rules
come from its semantics: everything trains except the frozen spectral memory
(spectre.py:959) and the detached wavelet path (spectre.py:885) — the former
enforced both by stop_gradient in the layer and an optimizer mask here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.95
    warmup_steps: int = 100
    total_steps: int = 10000
    grad_clip: float = 1.0
    min_lr_ratio: float = 0.1
    # AdamW first-moment dtype ("bfloat16" halves it — the standard state
    # compression for billion-param configs on one 16 GB chip; the second
    # moment stays fp32 for range).  None = fp32.
    mu_dtype: Optional[str] = None


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray     # raw key data (uint32), not a typed key —
                         # checkpointable and device-transferable


def _trainable_mask(params):
    """False for frozen leaves (the spectral memory banks)."""
    def mask(path, leaf):
        return not any(
            getattr(p, "key", None) == "memory_fft" for p in path)
    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(tcfg: TrainConfig, params) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tcfg.learning_rate,
        warmup_steps=tcfg.warmup_steps,
        decay_steps=max(tcfg.total_steps, tcfg.warmup_steps + 1),
        end_value=tcfg.learning_rate * tcfg.min_lr_ratio,
    )
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(schedule, b1=tcfg.beta1, b2=tcfg.beta2,
                    weight_decay=tcfg.weight_decay,
                    mu_dtype=tcfg.mu_dtype),
    )
    return optax.masked(opt, _trainable_mask(params))


def lm_loss(params, model_cfg, tokens: jnp.ndarray, *,
            rngs: Optional[dict] = None, deterministic: bool = False,
            mesh=None, pp_mesh=None, logits_chunk: int = 2048):
    """Next-token cross entropy; tokens (B, N+1) -> scalar mean nats.

    The fp32 logits tensor (B, N, vocab) dominates memory at long context
    (3.3 GB at seq 16k x 50k vocab), so the head matmul + softmax runs in
    rematerialized sequence chunks — full-length logits never exist."""
    from fft_tpu.models.lm import lm_head_matrix, lm_hidden
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    h = lm_hidden(params, model_cfg, inputs, rngs=rngs,
                  deterministic=deterministic, mesh=mesh, pp_mesh=pp_mesh)
    head = lm_head_matrix(params, model_cfg)
    return chunked_softmax_ce(h, head, targets, logits_chunk)


def chunked_softmax_ce(h, head, targets, logits_chunk: int = 2048):
    """Mean next-token CE from hidden states, without ever materializing
    the full (B, N, vocab) fp32 logits tensor: the head matmul + softmax
    runs in rematerialized sequence chunks."""
    n = h.shape[1]
    chunk = min(logits_chunk, n)
    if n % chunk:
        chunk = n                        # fall back to one shot
    nchunks = n // chunk

    @jax.checkpoint
    def chunk_ce(hc, tc):
        logits = (hc @ head.astype(hc.dtype)).astype(jnp.float32)
        return jnp.sum(
            optax.softmax_cross_entropy_with_integer_labels(logits, tc))

    def body(acc, idx):
        hc = jax.lax.dynamic_slice_in_dim(h, idx * chunk, chunk, axis=1)
        tc = jax.lax.dynamic_slice_in_dim(targets, idx * chunk, chunk,
                                          axis=1)
        return acc + chunk_ce(hc, tc), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(nchunks))
    return total / (targets.shape[0] * n)


def hybrid_loss(params, model_cfg, tokens: jnp.ndarray, *,
                rngs: Optional[dict] = None, deterministic: bool = False,
                cp_mesh=None, logits_chunk: int = 2048):
    """Next-token cross entropy for the hybrid SPECTRE+SWA LM (config 5)."""
    from fft_tpu.models.hybrid import hybrid_head_matrix, hybrid_hidden
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    h = hybrid_hidden(params, model_cfg, inputs, rngs=rngs,
                      deterministic=deterministic, cp_mesh=cp_mesh)
    head = hybrid_head_matrix(params, model_cfg)
    # chunked CE: at the hybrid's seq 32k x 50k vocab the full fp32
    # logits tensor alone is 6.6 GB/batch-row — never materialize it
    return chunked_softmax_ce(h, head, targets, logits_chunk)


def hybrid_train_step(state: TrainState, batch: jnp.ndarray, *, model_cfg,
                      optimizer, cp_mesh=None) -> tuple[TrainState, dict]:
    """One optimizer step on a hybrid-LM batch (B, N+1); with ``cp_mesh``
    the SWA layers run context-parallel (halo exchange) and the SPECTRE
    layers sequence-shard through GSPMD."""
    rng, step_rng = jax.random.split(jax.random.wrap_key_data(state.rng))
    rng = jax.random.key_data(rng)

    def loss_fn(p):
        return hybrid_loss(p, model_cfg, batch, rngs={"dropout": step_rng},
                           deterministic=True, cp_mesh=cp_mesh)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    metrics = {"loss": loss, "grad_norm": gnorm, "step": state.step}
    return TrainState(params, opt_state, state.step + 1, rng), metrics


def classification_loss(params, model_cfg, images: jnp.ndarray,
                        labels: jnp.ndarray, *,
                        rngs: Optional[dict] = None,
                        deterministic: bool = False):
    """Softmax cross entropy for the ViT classifier (config 3)."""
    from fft_tpu.models.vit import vit_apply
    logits = vit_apply(params, model_cfg, images, rngs=rngs,
                       deterministic=deterministic)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(losses)


def train_init(key, params, tcfg: TrainConfig) -> tuple[TrainState, Any]:
    opt = make_optimizer(tcfg, params)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.asarray(0, jnp.int32), rng=key), opt


def train_step(state: TrainState, batch: jnp.ndarray, *, model_cfg,
               optimizer, mesh=None, pp_mesh=None
               ) -> tuple[TrainState, dict]:
    """One optimizer step on an LM batch (B, N+1).  Pure; jit/pjit it.

    ``mesh`` with a 'seq' axis > 1 sequence-shards the activations (SP);
    ``pp_mesh`` (a 'stage' mesh) pipelines the block stack — PP runs the
    blocks without dropout keys (see models/lm.py:_run_blocks)."""
    rng, step_rng = jax.random.split(jax.random.wrap_key_data(state.rng))
    rng = jax.random.key_data(rng)

    def loss_fn(p):
        return lm_loss(p, model_cfg, batch,
                       rngs={"dropout": step_rng} if pp_mesh is None
                       else None,
                       deterministic=pp_mesh is not None,
                       mesh=mesh, pp_mesh=pp_mesh)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    metrics = {"loss": loss, "grad_norm": gnorm, "step": state.step}
    return TrainState(params, opt_state, state.step + 1, rng), metrics
