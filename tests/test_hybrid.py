"""Hybrid SPECTRE + sliding-window-attention LM: causality, decode==forward,
SWA unit checks."""

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig
from fft_tpu.layers.attention import sliding_window_attention
from fft_tpu.models.hybrid import (
    HybridConfig, hybrid_apply, hybrid_decode_init, hybrid_decode_step,
    hybrid_init,
)
from tests.golden_utils import rel_err


def _tiny_hybrid(seq=32, window=8):
    return HybridConfig(
        vocab_size=32, num_groups=2, spectre_per_group=1,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=1, fft_impl="jnp"),
        attn_heads=4, attn_window=window, max_seq=seq)


def test_swa_matches_dense_masked_attention():
    """Blockwise sliding-window attention == dense attention with an
    explicit causal band mask."""
    b, n, h, hd, w = 2, 32, 2, 8, 8
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, hd)),
                           dtype=jnp.float32) for _ in range(3))
    out = sliding_window_attention(q, k, v, w)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    qi = jnp.arange(n)[:, None]
    kj = jnp.arange(n)[None, :]
    mask = (qi - kj >= 0) & (qi - kj < w)
    scores = jnp.where(mask, scores, -jnp.inf)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1), v)
    assert rel_err(np.asarray(out), np.asarray(ref)) < 1e-5


def test_hybrid_causality():
    cfg = _tiny_hybrid()
    params = hybrid_init(jax.random.key(0), cfg)
    toks = jax.random.randint(jax.random.key(1), (2, 32), 0, 32)
    logits = hybrid_apply(params, cfg, toks)
    assert logits.shape == (2, 32, 32)
    toks2 = toks.at[:, 15].set((toks[:, 15] + 1) % 32)
    logits2 = hybrid_apply(params, cfg, toks2)
    np.testing.assert_allclose(np.asarray(logits[:, :15]),
                               np.asarray(logits2[:, :15]), atol=2e-4)
    assert float(jnp.max(jnp.abs(logits[:, 15:] - logits2[:, 15:]))) > 1e-3


def test_hybrid_generate_matches_teacher_forcing():
    from fft_tpu.models.hybrid import hybrid_generate

    cfg = _tiny_hybrid(seq=16, window=4)
    params = hybrid_init(jax.random.key(7), cfg)
    prompt = jax.random.randint(jax.random.key(8), (2, 6), 0, 32)
    gen = hybrid_generate(params, cfg, prompt, steps=4)
    seq = jnp.concatenate([prompt, gen], axis=1)
    logits = hybrid_apply(params, cfg, seq)
    for i in range(4):
        expect = jnp.argmax(logits[:, 6 + i - 1], axis=-1)
        np.testing.assert_array_equal(np.asarray(gen[:, i]),
                                      np.asarray(expect))


def test_hybrid_group_pipeline():
    """The hybrid's (SPECTRE + SWA) group is itself a homogeneous unit, so
    the generic pipeline helper runs heterogeneous stacks by pipelining
    groups."""
    from fft_tpu.models.hybrid import _apply_group
    from fft_tpu.parallel.pipeline import pipeline_apply
    from jax.sharding import Mesh

    cfg = _tiny_hybrid(seq=16, window=4)
    params = hybrid_init(jax.random.key(9), cfg)
    group_params = {"spectre": params["spectre"], "attn": params["attn"]}
    x = jax.random.normal(jax.random.key(10), (4, 16, 32))

    def seq_run(gp, x):
        def body(h, g):
            return _apply_group(g, cfg, h, deterministic=True), None
        return jax.lax.scan(body, x, gp)[0]

    expected = np.asarray(jax.jit(seq_run)(group_params, x))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    got = np.asarray(jax.jit(lambda gp, x: pipeline_apply(
        gp, lambda g, h: _apply_group(g, cfg, h, deterministic=True), x,
        mesh=mesh, num_microbatches=2))(group_params, x))
    assert rel_err(got, expected) < 2e-5


def test_hybrid_train_smoke():
    import optax
    from fft_tpu.train.loop import hybrid_loss

    cfg = _tiny_hybrid(seq=16, window=4)
    params = hybrid_init(jax.random.key(11), cfg)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    batch = jax.random.randint(jax.random.key(12), (4, 17), 0, 32)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(hybrid_loss)(
            params, cfg, batch, deterministic=True)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.8 and np.isfinite(float(loss))


def test_hybrid_decode_equals_forward():
    cfg = _tiny_hybrid(seq=16, window=4)
    params = hybrid_init(jax.random.key(2), cfg)
    toks = jax.random.randint(jax.random.key(3), (2, 12), 0, 32)
    fwd = hybrid_apply(params, cfg, toks)

    caches = hybrid_decode_init(cfg, 2)
    step = jax.jit(lambda p, t, i, c: hybrid_decode_step(p, cfg, t, i, c))
    for i in range(12):
        logits, caches = step(params, toks[:, i], i, caches)
        assert rel_err(np.asarray(logits),
                       np.asarray(fwd[:, i])) < 1e-4, i


def test_swa_cp_matches_single_device():
    """Context-parallel SWA (halo exchange over the 'seq' mesh axis) ==
    the single-device blockwise result (SURVEY:133, config 5 CP row)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fft_tpu.layers.attention import sliding_window_attention_cp
    from fft_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, seq=4, model=1)
    b, n, h, hd, w = 2, 64, 2, 8, 8
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, hd)),
                           dtype=jnp.float32) for _ in range(3))
    ref = np.asarray(sliding_window_attention(q, k, v, w))

    @jax.jit
    def run(q, k, v):
        sh = NamedSharding(mesh, P(None, "seq", None, None))
        q, k, v = (jax.lax.with_sharding_constraint(t, sh) for t in (q, k, v))
        return sliding_window_attention_cp(q, k, v, w, mesh)

    got = np.asarray(run(q, k, v))
    assert rel_err(got, ref) < 1e-6


def test_hybrid_cp_train_step_matches_single_device():
    """One hybrid train step with the sequence axis sharded over 4 devices
    (SWA halo-exchange CP + GSPMD-sharded segmented SPECTRE) == the
    single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fft_tpu.parallel import make_mesh
    from fft_tpu.train import TrainConfig, hybrid_train_step, train_init

    seq, window = 64, 16
    cfg = HybridConfig(
        vocab_size=32, num_groups=2, spectre_per_group=1,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=16,
                            causal_impl="segmented", fft_impl="matmul"),
        attn_heads=4, attn_window=window, max_seq=seq)
    params = hybrid_init(jax.random.key(0), cfg)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=10)
    state, opt = train_init(jax.random.key(1), params, tcfg)
    batch = jax.random.randint(jax.random.key(2), (2, seq + 1), 0, 32)

    ref_state, ref_metrics = jax.jit(
        lambda s, b: hybrid_train_step(s, b, model_cfg=cfg, optimizer=opt)
    )(state, batch)

    mesh = make_mesh(data=1, seq=4, model=1)
    got_state, got_metrics = jax.jit(
        lambda s, b: hybrid_train_step(s, b, model_cfg=cfg, optimizer=opt,
                                       cp_mesh=mesh))(state, batch)

    assert abs(float(ref_metrics["loss"]) - float(got_metrics["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(got_state.params)):
        assert rel_err(np.asarray(b), np.asarray(a)) < 1e-4


def test_hybrid_cp_chunked_ce_matches_single_device():
    """Multi-chunk CE (logits_chunk < shard length) under the CP mesh ==
    single-device: the CE scan's dynamic_slice + its scatter-add adjoint
    must survive the sequence-sharded hidden states."""
    import jax.numpy as jnp
    from fft_tpu.parallel import make_mesh
    from fft_tpu.train.loop import hybrid_loss

    seq, window = 64, 16
    cfg = HybridConfig(
        vocab_size=32, num_groups=2, spectre_per_group=1,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=16,
                            causal_impl="segmented", fft_impl="matmul"),
        attn_heads=4, attn_window=window, max_seq=seq)
    params = hybrid_init(jax.random.key(0), cfg)
    batch = jax.random.randint(jax.random.key(2), (2, seq + 1), 0, 32)

    def loss(p, mesh):
        return hybrid_loss(p, cfg, batch, deterministic=True,
                           cp_mesh=mesh, logits_chunk=8)  # 8 chunks

    ref_l, ref_g = jax.jit(jax.value_and_grad(
        lambda p: loss(p, None)))(params)
    mesh = make_mesh(data=1, seq=4, model=1)
    got_l, got_g = jax.jit(jax.value_and_grad(
        lambda p: loss(p, mesh)))(params)
    assert abs(float(ref_l) - float(got_l)) < 1e-5
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        assert rel_err(np.asarray(b), np.asarray(a)) < 1e-4


def test_hybrid_remat_matches():
    """remat=True (per-group jax.checkpoint) changes memory, not math."""
    import dataclasses
    from fft_tpu.train.loop import hybrid_loss

    seq = 32
    cfg = HybridConfig(
        vocab_size=32, num_groups=2, spectre_per_group=1,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=8,
                            causal_impl="segmented", fft_impl="matmul"),
        attn_heads=4, attn_window=8, max_seq=seq)
    params = hybrid_init(jax.random.key(0), cfg)
    batch = jax.random.randint(jax.random.key(2), (2, seq + 1), 0, 32)
    lg = jax.jit(lambda p, c: jax.value_and_grad(
        lambda q: hybrid_loss(q, c, batch, deterministic=True))(p),
        static_argnums=(1,))
    ref_l, ref_g = lg(params, cfg)
    got_l, got_g = lg(params, dataclasses.replace(cfg, remat=True))
    assert abs(float(ref_l) - float(got_l)) < 1e-6
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
