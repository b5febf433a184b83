"""ViT-SPECTRE classifier: shapes, L=197 wavelet-on forward (crashes the
reference), overfit sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fft_tpu.config import SpectreConfig
from fft_tpu.models.vit import ViTConfig, vit_apply, vit_init
from fft_tpu.train.loop import classification_loss


def _tiny_vit(wavelet=0.1):
    return ViTConfig(
        image_size=32, patch_size=8, num_classes=10, num_layers=2,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=32,
                            pooling_type="mean", wavelet_on_rate=wavelet,
                            fft_impl="jnp"))


def test_vit_forward_l197_wavelet_on():
    """Full ViT-S geometry token count (197 = odd) with wavelet always on —
    the exact configuration that crashes the PyTorch reference."""
    cfg = ViTConfig(image_size=224, patch_size=16, num_classes=10,
                    num_layers=1,
                    block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=256,
                                        pooling_type="mean",
                                        wavelet_on_rate=1.0, fft_impl="jnp"))
    assert cfg.seq_len == 197
    params = vit_init(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (2, 224, 224, 3))
    logits = vit_apply(params, cfg, img)
    assert logits.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_vit_overfit_small():
    cfg = _tiny_vit(wavelet=0.0)
    params = vit_init(jax.random.key(0), cfg)
    imgs = jax.random.normal(jax.random.key(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 10

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(classification_loss)(
            params, cfg, imgs, labels, deterministic=True)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(150):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.1, float(loss)


def test_vit_stochastic_wavelet_rng():
    """With 0 < on_rate < 1 the wavelet branch needs an explicit rng in
    training mode and is OFF in deterministic mode (unlike the reference,
    which is random even in eval — SURVEY §3.6-E)."""
    cfg = _tiny_vit(wavelet=0.5)
    params = vit_init(jax.random.key(0), cfg)
    img = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    a = vit_apply(params, cfg, img, deterministic=True)
    b = vit_apply(params, cfg, img, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = vit_apply(params, cfg, img, rngs={"dropout": jax.random.key(2)},
                  deterministic=False)
    assert float(jnp.max(jnp.abs(c - a))) > 0.0
