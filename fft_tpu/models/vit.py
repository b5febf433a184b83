"""ViT-S-style image classifier with SPECTRE replacing attention
(BASELINE.json config 3: L = 197 patch tokens, ImageNet-1k).

The 197-token sequence (196 patches + CLS) exercises the odd-length wavelet
pyramid — the case that crashes the PyTorch reference outright (SURVEY
§3.6-D); our PR Haar handles any length, so wavelet refinement can stay on.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fft_tpu.config import SpectreConfig
from fft_tpu.layers import spectre_block_apply, spectre_block_init
from fft_tpu.layers.common import (
    layernorm_apply, layernorm_init, linear_apply, linear_init,
)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    num_classes: int = 1000
    num_layers: int = 12
    block: SpectreConfig = dataclasses.field(
        default_factory=lambda: SpectreConfig(
            embed_dim=384, num_heads=6, n_fft=256, pooling_type="mean",
            wavelet_on_rate=0.1))
    pool: str = "cls"                     # "cls" | "mean"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1       # + CLS

    def __post_init__(self):
        assert self.image_size % self.patch_size == 0
        assert self.seq_len <= self.block.n_fft


def vit_s_config(num_classes: int = 1000) -> ViTConfig:
    """ViT-S/16 geometry (d=384, 12 layers, 6 heads), L = 197."""
    return ViTConfig(num_classes=num_classes)


def vit_init(key, cfg: ViTConfig, dtype=jnp.float32):
    d = cfg.block.embed_dim
    kp, kc, kpos, kb, kh = jax.random.split(key, 5)
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_channels
    layer_keys = jax.random.split(kb, cfg.num_layers)
    return {
        "patch_proj": linear_init(kp, patch_dim, d, dtype=dtype),
        "cls_token": jax.random.normal(kc, (1, 1, d), dtype) * 0.02,
        "pos_emb": jax.random.normal(kpos, (cfg.seq_len, d), dtype) * 0.02,
        "blocks": jax.vmap(
            lambda k: spectre_block_init(k, cfg.block, dtype))(layer_keys),
        "ln_f": layernorm_init(d, dtype),
        "head": linear_init(kh, d, cfg.num_classes, dtype=dtype),
    }


def _patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C) without convs: reshape +
    transpose only (XLA fuses this into the following matmul)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def vit_apply(params, cfg: ViTConfig, images: jnp.ndarray, *,
              rngs: Optional[dict] = None, deterministic: bool = True):
    """images (B, H, W, C) -> logits (B, num_classes)."""
    b = images.shape[0]
    x = linear_apply(params["patch_proj"],
                     _patchify(images.astype(cfg.block.compute_dtype),
                               cfg.patch_size))
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"].astype(x.dtype)

    if rngs is None:
        layer_rngs = jnp.zeros((cfg.num_layers, 2), jnp.uint32)
        use_rngs = False
    else:
        layer_rngs = jax.random.split(rngs.get("dropout", jax.random.key(0)),
                                      cfg.num_layers)
        use_rngs = True

    def body(h, xs):
        block_params, rng = xs
        r = {"dropout": rng, "wavelet": jax.random.fold_in(rng, 1)} \
            if use_rngs else None
        return spectre_block_apply(block_params, cfg.block, h, rngs=r,
                                   deterministic=deterministic), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], layer_rngs))
    x = layernorm_apply(params["ln_f"], x)
    feat = x[:, 0] if cfg.pool == "cls" else jnp.mean(x, axis=1)
    return linear_apply(params["head"], feat).astype(jnp.float32)
