"""Distributed four-step spectral mix on an 8-fake-device CPU mesh:
sharded result == single-device result (SURVEY §4.2 distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fft_tpu.parallel import make_mesh
from fft_tpu.parallel.dist_fft import (
    sp_plan, sp_plan_strided, sp_spectral_mix, sp_spectral_mix_strided,
    sp_stride_permute,
)
from tests.golden_utils import rel_err


def _reference_mix(v, gate_half, memory):
    vf = jnp.fft.rfft(v, axis=-2)
    mixed = gate_half * vf
    if memory is not None:
        mixed = mixed + memory
    return jnp.fft.irfft(mixed, n=v.shape[-2], axis=-2)


@pytest.mark.parametrize("seq_shards,n", [(2, 64), (4, 64), (8, 128),
                                          (4, 96)])
def test_sp_mix_matches_single_device(seq_shards, n):
    if len(jax.devices()) < seq_shards:
        pytest.skip("not enough devices")
    mesh = make_mesh(data=1, seq=seq_shards, model=1)
    b, d = 2, 8
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(
        (rng.standard_normal((b, n // 2 + 1, d))
         + 1j * rng.standard_normal((b, n // 2 + 1, d))).astype(np.complex64))
    mem = jnp.asarray(
        (rng.standard_normal((n // 2 + 1, d))
         + 1j * rng.standard_normal((n // 2 + 1, d))).astype(np.complex64))

    expected = np.asarray(_reference_mix(v, gate, mem))

    @jax.jit
    def run(v):
        v = jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(None, "seq", None)))
        return sp_spectral_mix(v, gate, mem, n_fft=n, mesh=mesh)

    got = np.asarray(run(v))
    assert rel_err(got, expected) < 2e-5


def test_sp_mix_no_memory_and_grads():
    mesh = make_mesh(data=1, seq=4, model=1)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((1, 64, 4)).astype(np.float32))
    gate = jnp.asarray(
        (rng.standard_normal((1, 33, 4)) + 1j * rng.standard_normal((1, 33, 4))
         ).astype(np.complex64))

    def loss_sp(v):
        return jnp.sum(sp_spectral_mix(v, gate, None, n_fft=64, mesh=mesh) ** 2)

    def loss_ref(v):
        return jnp.sum(_reference_mix(v, gate, None) ** 2)

    g_sp = np.asarray(jax.jit(jax.grad(loss_sp))(v))
    g_ref = np.asarray(jax.grad(loss_ref)(v))
    assert rel_err(g_sp, g_ref) < 5e-5


def test_sp_plan():
    assert sp_plan(1024, 8) % 8 == 0
    assert 1024 % sp_plan(1024, 8) == 0
    assert sp_plan(96, 4) % 4 == 0


def test_sp_block_matches_single_device():
    """Whole SPECTRE block (heads vmapped, memory on) sequence-sharded over
    4 devices == single-device output."""
    from fft_tpu.config import SpectreConfig
    from fft_tpu.layers import spectre_block_apply, spectre_block_init

    mesh = make_mesh(data=1, seq=4, model=1)
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=64,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=8, fft_impl="matmul")
    params = spectre_block_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 32))

    expected = np.asarray(spectre_block_apply(params, cfg, x))

    @jax.jit
    def run(params, x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, "seq", None)))
        return spectre_block_apply(params, cfg, x, sp_mesh=mesh)

    got = np.asarray(run(params, x))
    assert rel_err(got, expected) < 2e-5


@pytest.mark.parametrize("seq_shards,n", [(2, 64), (4, 64), (8, 128)])
def test_sp_strided_matches_single_device(seq_shards, n):
    """The 2-all-to-all strided layout: permute in, mix, permute out ==
    the natural-order reference."""
    if len(jax.devices()) < seq_shards:
        pytest.skip("not enough devices")
    mesh = make_mesh(data=1, seq=seq_shards, model=1)
    n1 = sp_plan_strided(n, seq_shards)
    n2 = n // n1
    b, d = 2, 8
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    gate = jnp.asarray(
        (rng.standard_normal((b, n // 2 + 1, d))
         + 1j * rng.standard_normal((b, n // 2 + 1, d))).astype(np.complex64))
    mem = jnp.asarray(
        (rng.standard_normal((n // 2 + 1, d))
         + 1j * rng.standard_normal((n // 2 + 1, d))).astype(np.complex64))
    expected = np.asarray(_reference_mix(v, gate, mem))

    @jax.jit
    def run(v):
        vs = sp_stride_permute(v, n1, n2)
        vs = jax.lax.with_sharding_constraint(
            vs, NamedSharding(mesh, P(None, "seq", None)))
        ys = sp_spectral_mix_strided(vs, gate, mem, n_fft=n, mesh=mesh)
        return sp_stride_permute(ys, n1, n2, inverse=True)

    got = np.asarray(run(v))
    assert rel_err(got, expected) < 2e-5


def test_sp_strided_exactly_two_all_to_alls():
    """The optimal layout's whole point: 2 all-to-alls per mix (the
    contiguous path needs 4)."""
    import re
    mesh = make_mesh(data=1, seq=4, model=1)
    n = 64
    v = jnp.ones((1, n, 4), jnp.float32)
    gate = jnp.ones((1, n // 2 + 1, 4), jnp.complex64)

    @jax.jit
    def run(v):
        v = jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(None, "seq", None)))
        return sp_spectral_mix_strided(v, gate, None, n_fft=n, mesh=mesh)

    txt = run.lower(v).compile().as_text()
    n_a2a = len(re.findall(r"all-to-all(?:-start)?\(", txt))
    assert n_a2a == 2, f"expected exactly 2 all-to-alls, found {n_a2a}"


def test_sp_block_strided_matches_single_device():
    """Whole block in the strided layout == single device (permute only at
    the boundary — blocks chain with no extra collectives)."""
    from fft_tpu.config import SpectreConfig
    from fft_tpu.layers import spectre_block_apply, spectre_block_init

    mesh = make_mesh(data=1, seq=4, model=1)
    n = 64
    n1 = sp_plan_strided(n, 4)
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=n,
                        pooling_type="mean", wavelet_on_rate=0.0,
                        memory_size=8, fft_impl="matmul")
    params = spectre_block_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, n, 32))
    expected = np.asarray(spectre_block_apply(params, cfg, x))

    @jax.jit
    def run(params, x):
        xs = sp_stride_permute(x, n1, n // n1)
        xs = jax.lax.with_sharding_constraint(
            xs, NamedSharding(mesh, P(None, "seq", None)))
        ys = spectre_block_apply(params, cfg, xs, sp_mesh=mesh,
                                 sp_layout="strided")
        return sp_stride_permute(ys, n1, n // n1, inverse=True)

    got = np.asarray(run(params, x))
    assert rel_err(got, expected) < 2e-5


def test_sp_mix_contains_all_to_all():
    """The compiled module must actually reshard via all-to-all (not
    all-gather): the four-step transpose is the point."""
    mesh = make_mesh(data=1, seq=4, model=1)
    v = jnp.ones((1, 64, 4), jnp.float32)
    gate = jnp.ones((1, 33, 4), jnp.complex64)

    @jax.jit
    def run(v):
        v = jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(None, "seq", None)))
        return sp_spectral_mix(v, gate, None, n_fft=64, mesh=mesh)

    txt = run.lower(v).compile().as_text()
    assert "all-to-all" in txt, "expected an all-to-all in the SP mix"


def test_sp_block_wavelet_matches_single_device():
    """Wavelet refinement under contiguous SP: Haar pairs never cross
    even-length shard boundaries, so the pyramid stays shard-local until
    the residue is tiny; GSPMD handles the rest.  on_rate=1 makes the
    branch deterministic."""
    from fft_tpu.config import SpectreConfig
    from fft_tpu.layers import spectre_block_apply, spectre_block_init

    mesh = make_mesh(data=1, seq=4, model=1)
    cfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=64,
                        pooling_type="mean", wavelet_on_rate=1.0,
                        fft_impl="matmul")
    params = spectre_block_init(jax.random.key(2), cfg)
    x = jax.random.normal(jax.random.key(3), (2, 64, 32))

    expected = np.asarray(spectre_block_apply(params, cfg, x))

    @jax.jit
    def run(params, x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, "seq", None)))
        return spectre_block_apply(params, cfg, x, sp_mesh=mesh)

    got = np.asarray(run(params, x))
    assert rel_err(got, expected) < 2e-5


def test_sp_strided_rejects_order_sensitive_config():
    """Order-sensitive pieces fail FAST at trace time with a ValueError
    under the strided layout (not a stripped-under-python-O assert):
    wavelet refinement and DCT pooling both pair/scan NATURAL positions,
    which the residue-class layout scrambles (docs/DESIGN.md)."""
    from fft_tpu.config import SpectreConfig
    from fft_tpu.layers import spectre_block_apply, spectre_block_init

    mesh = make_mesh(data=1, seq=4, model=1)
    n = 64
    x = jax.random.normal(jax.random.key(1), (2, n, 32))

    wcfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=n,
                         pooling_type="mean", wavelet_on_rate=0.5,
                         fft_impl="matmul")
    wparams = spectre_block_init(jax.random.key(0), wcfg)
    with pytest.raises(ValueError, match="wavelet refinement"):
        spectre_block_apply(wparams, wcfg, x, sp_mesh=mesh,
                            sp_layout="strided")

    dcfg = SpectreConfig(embed_dim=32, num_heads=4, n_fft=n,
                         pooling_type="dct", wavelet_on_rate=0.0,
                         fft_impl="matmul")
    dparams = spectre_block_init(jax.random.key(0), dcfg)
    with pytest.raises(ValueError, match="order-invariant pooler"):
        spectre_block_apply(dparams, dcfg, x, sp_mesh=mesh,
                            sp_layout="strided")
