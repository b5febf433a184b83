"""Golden parity: SPECTRE head / multi-head / block vs PyTorch reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from fft_tpu.config import SpectreConfig, SpectreHeadConfig
from fft_tpu.layers import (
    spectre_block_apply, spectre_head_apply, spectre_multihead_apply,
)
from tests.golden_utils import (
    load, map_block_params, map_head_params, map_multihead_params, rel_err,
)

TOL = 1e-5


@pytest.mark.parametrize("tag,pooling", [
    ("mean_96", "mean"), ("mean_128", "mean"), ("attn_96", "attention"),
])
def test_head_forward(tag, pooling):
    g = load(f"head_{tag}")
    cfg = SpectreHeadConfig(embed_dim=16, n_fft=128, pooling_type=pooling,
                            fft_impl="jnp", interp_reference_compat=True)
    params = map_head_params(g, cfg)
    x = jnp.asarray(g["x"])
    out, q_pool = spectre_head_apply(params, cfg, x,
                                     memory_fft=jnp.asarray(g["memory"]))
    assert rel_err(q_pool, g["q_pool"]) < TOL
    assert rel_err(out, g["out"]) < TOL
    out_nomem, _ = spectre_head_apply(params, cfg, x)
    assert rel_err(out_nomem, g["out_nomem"]) < TOL


def test_head_forward_matmul_fft():
    """Same parity bound through the MXU matmul-FFT path."""
    g = load("head_mean_128")
    cfg = SpectreHeadConfig(embed_dim=16, n_fft=128, pooling_type="mean",
                            fft_impl="matmul", interp_reference_compat=True)
    params = map_head_params(g, cfg)
    out, _ = spectre_head_apply(params, cfg, jnp.asarray(g["x"]),
                                memory_fft=jnp.asarray(g["memory"]))
    assert rel_err(out, g["out"]) < TOL


def test_head_forward_pos_phase():
    """Explicit absolute-position phase injection (spectre.py:534-536)."""
    g = load("head_posphase")
    cfg = SpectreHeadConfig(embed_dim=16, n_fft=64, pooling_type="mean",
                            fft_impl="jnp", interp_reference_compat=True)
    params = map_head_params(g, cfg)
    out, _ = spectre_head_apply(params, cfg, jnp.asarray(g["x"]),
                                pos_phase=jnp.asarray(g["pos_phase"])[None])
    assert rel_err(out, g["out"]) < TOL


def test_multihead_no_wavelet():
    g = load("multihead_nowave")
    cfg = SpectreConfig(embed_dim=64, num_heads=4, n_fft=128,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        fft_impl="jnp", interp_reference_compat=True)
    params = map_multihead_params(g, cfg)
    out = spectre_multihead_apply(params, cfg, jnp.asarray(g["x"]),
                                  memory_fft=jnp.asarray(g["memory"]))
    assert rel_err(out, g["out"]) < TOL
    out_nomem = spectre_multihead_apply(params, cfg, jnp.asarray(g["x"]))
    assert rel_err(out_nomem, g["out_nomem"]) < TOL


def test_multihead_wavelet_always_on():
    """wavelet_on_rate=1.0 is deterministic; reference_compat reproduces the
    reference's (lossy) Haar arithmetic on a power-of-two length."""
    g = load("multihead_wave")
    cfg = SpectreConfig(embed_dim=64, num_heads=4, n_fft=64,
                        pooling_type="mean", wavelet_on_rate=1.0,
                        wavelet_reference_compat=True, fft_impl="jnp", interp_reference_compat=True)
    params = map_multihead_params(g, cfg)
    out = spectre_multihead_apply(params, cfg, jnp.asarray(g["x"]))
    assert rel_err(out, g["out"]) < TOL


@pytest.mark.parametrize("tag,mem_size", [
    ("nomem", 0), ("fullmem", 1), ("truncmem", 16),
])
def test_block_forward(tag, mem_size):
    g = load(f"block_{tag}")
    cfg = SpectreConfig(embed_dim=64, num_heads=4, n_fft=128,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=mem_size, fft_impl="jnp", interp_reference_compat=True)
    params = map_block_params(g, cfg)
    out = spectre_block_apply(params, cfg, jnp.asarray(g["x"]))
    assert rel_err(out, g["out"]) < TOL


def test_block_gradients_flow():
    """Backward through the block: finite grads everywhere, zero grad for the
    frozen memory (stop_gradient), matching the reference's frozen memory_fft
    (spectre.py:959) and detached wavelet branch."""
    import jax

    g = load("block_fullmem")
    cfg = SpectreConfig(embed_dim=64, num_heads=4, n_fft=128,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=1, fft_impl="jnp", interp_reference_compat=True)
    params = jax.tree.map(jnp.asarray, map_block_params(g, cfg))

    def loss(p):
        return jnp.sum(spectre_block_apply(p, cfg, jnp.asarray(g["x"])) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(jnp.abs(leaf)))) for leaf in leaves)
    assert float(jnp.max(jnp.abs(grads["memory_fft"]))) == 0.0
    assert float(jnp.max(jnp.abs(grads["mix"]["heads"]["w_q"]["w"]))) > 0.0
