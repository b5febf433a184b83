"""LM model + training loop: shapes, causality end-to-end, overfit-one-batch,
generation == teacher forcing."""

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.models.lm import (
    LMConfig, lm_apply, lm_decode_init, lm_decode_step, lm_generate, lm_init,
)
from fft_tpu.train import TrainConfig, lm_loss, train_init, train_step
from fft_tpu.train.data import CharDataset


def _tiny_cfg(seq=32, vocab=64, layers=2, d=32, heads=4, memory=0):
    return LMConfig(
        vocab_size=vocab, num_layers=layers, max_seq=seq,
        block=SpectreConfig(
            embed_dim=d, num_heads=heads, n_fft=seq, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True, causal_chunk=8,
            memory_size=memory, fft_impl="jnp"),
    )


def test_lm_forward_shapes_and_causality():
    cfg = _tiny_cfg()
    params = lm_init(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (2, 32), 0, cfg.vocab_size)
    logits = lm_apply(params, cfg, toks)
    assert logits.shape == (2, 32, cfg.vocab_size)
    # causality at the model level: changing token p leaves logits < p alone
    toks2 = toks.at[:, 20].set((toks[:, 20] + 1) % cfg.vocab_size)
    logits2 = lm_apply(params, cfg, toks2)
    np.testing.assert_allclose(np.asarray(logits[:, :20]),
                               np.asarray(logits2[:, :20]), atol=1e-4)
    assert float(jnp.max(jnp.abs(logits[:, 20:] - logits2[:, 20:]))) > 1e-3


def test_overfit_one_batch():
    """The canonical training sanity: loss on a single repeated batch must
    collapse (SURVEY §4.2 model/integration tests)."""
    cfg = _tiny_cfg(seq=16, vocab=32, layers=2, d=32)
    params = lm_init(jax.random.key(0), cfg)
    tcfg = TrainConfig(learning_rate=3e-3, warmup_steps=10, total_steps=300,
                       weight_decay=0.0)
    state, opt = train_init(jax.random.key(1), params, tcfg)
    batch = jax.random.randint(jax.random.key(2), (4, 17), 0, cfg.vocab_size)

    step = jax.jit(lambda s, b: train_step(s, b, model_cfg=cfg,
                                           optimizer=opt))
    first = None
    for i in range(300):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.1, (first, last)
    assert first > 2.0  # started near ln(32) ~ 3.5


def test_memory_frozen_under_training():
    cfg = _tiny_cfg(seq=16, vocab=32, memory=4)
    params = lm_init(jax.random.key(0), cfg)
    mem0 = np.asarray(params["blocks"]["memory_fft"])
    tcfg = TrainConfig(learning_rate=1e-2, warmup_steps=1, total_steps=10)
    state, opt = train_init(jax.random.key(1), params, tcfg)
    batch = jax.random.randint(jax.random.key(2), (2, 17), 0, cfg.vocab_size)
    step = jax.jit(lambda s, b: train_step(s, b, model_cfg=cfg,
                                           optimizer=opt))
    for _ in range(5):
        state, _ = step(state, batch)
    np.testing.assert_array_equal(
        np.asarray(state.params["blocks"]["memory_fft"]), mem0)
    assert float(np.max(np.abs(
        np.asarray(state.params["blocks"]["mlp"]["fc1"]["w"])
        - np.asarray(params["blocks"]["mlp"]["fc1"]["w"])))) > 0


def test_generate_matches_teacher_forcing():
    """Greedy generation through the O(F) decode caches must produce the
    same tokens as argmax over the training forward (train/decode
    consistency at the full model level)."""
    cfg = _tiny_cfg(seq=24, vocab=32, layers=2, d=32)
    cfg = LMConfig(**{**cfg.__dict__,
                      "block": SpectreConfig(
                          **{**cfg.block.__dict__, "causal_chunk": 1})})
    params = lm_init(jax.random.key(5), cfg)
    prompt = jax.random.randint(jax.random.key(6), (2, 8), 0, cfg.vocab_size)
    gen = lm_generate(params, cfg, prompt, steps=6)
    # teacher-forced re-check: feed prompt+gen through lm_apply, compare
    seq = jnp.concatenate([prompt, gen], axis=1)
    logits = lm_apply(params, cfg, seq)
    for i in range(6):
        expect = jnp.argmax(logits[:, 8 + i - 1], axis=-1)
        np.testing.assert_array_equal(np.asarray(gen[:, i]),
                                      np.asarray(expect))


def test_char_dataset():
    ds = CharDataset(n_chars=10000)
    it = ds.batches(4, 16, seed=0)
    b = next(it)
    assert b.shape == (4, 17) and b.dtype == np.int32
    assert b.min() >= 0 and b.max() < 256
