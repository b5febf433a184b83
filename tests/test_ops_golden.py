"""Golden parity: numerics core vs. the PyTorch reference (<=1e-5 rel, fp32)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fft_tpu.ops import (
    attention_pool, complex_circular_conv1d, haar_decompose, haar_reconstruct,
    interp_complex_1d, modrelu, pruned_irfft_single,
)
from fft_tpu.ops.interp import interp_complex_1d_ref_compat
from tests.golden_utils import load, rel_err

TOL = 1e-5


@pytest.mark.parametrize("mode", ["linear", "nearest"])
@pytest.mark.parametrize("size", [65, 33])
def test_interp_complex_1d(mode, size):
    g = load("interp")
    out = interp_complex_1d(jnp.asarray(g["x"]), size, mode)
    assert rel_err(out, g[f"out_{mode}_{size}"]) < TOL


def test_interp_cubic_intended_math():
    """The intended complex cubic interp == reference cubic on a G=1 layout
    (where the reference's real/imag re-pairing is the identity)."""
    g = load("interp")
    x_g1 = jnp.asarray(g["x"]).reshape(12, 1, 8)
    out = interp_complex_1d(x_g1, 65, "cubic")
    assert rel_err(out, g["out_cubic_g1_65"]) < TOL


@pytest.mark.parametrize("size", [65, 33])
def test_interp_cubic_reference_compat(size):
    """reference_compat reproduces the reference's G>1 cubic path exactly,
    including its real/imag scrambling (see ops/interp.py docstring)."""
    g = load("interp")
    out = interp_complex_1d_ref_compat(jnp.asarray(g["x"]), size)
    assert rel_err(out, g[f"out_cubic_{size}"]) < TOL
    # and the intended math intentionally diverges on G>1:
    naive = interp_complex_1d(jnp.asarray(g["x"]), size, "cubic")
    assert rel_err(naive, g[f"out_cubic_{size}"]) > 1e-3


def test_interp_endpoint_exact():
    g = load("interp")
    out = np.asarray(interp_complex_1d(jnp.asarray(g["x"]), 65, "cubic"))
    np.testing.assert_allclose(out[..., 0], g["x"][..., 0], rtol=1e-6)
    np.testing.assert_allclose(out[..., -1], g["x"][..., -1], rtol=1e-6)


def test_modrelu():
    g = load("modrelu")
    out = modrelu(jnp.asarray(g["z"]), jnp.asarray(g["bias"]))
    assert rel_err(out, g["out"]) < TOL


def test_complex_circular_conv1d():
    g = load("complex_conv")
    out = complex_circular_conv1d(jnp.asarray(g["x"]), jnp.asarray(g["kernel"]))
    assert rel_err(out, g["out"]) < TOL


def test_haar_reference_compat():
    g = load("haar_ref")
    n = int(g["n_coeffs"])
    coeffs, lengths = haar_decompose(jnp.asarray(g["x"]), reference_compat=True)
    assert len(coeffs) == n
    for i in range(n):
        assert rel_err(coeffs[i], g[f"coeff_{i}"]) < TOL, f"coeff {i}"
    recon = haar_reconstruct(coeffs, lengths)
    assert rel_err(recon, g["recon"]) < TOL


def test_pruned_irfft_single():
    g = load("pruned_irfft")
    x = jnp.asarray(g["x"])
    n = int(g["n"])
    # Even position: reference is correct; both modes match it.
    out4 = pruned_irfft_single(x, n, 4)
    assert rel_err(out4, g["out_pos4"]) < TOL
    assert rel_err(out4, g["full_irfft"][4]) < TOL
    # Odd position: reference_compat reproduces the reference's Nyquist bug;
    # default mode matches the true irfft (the corrected math, SURVEY §3.6-B).
    out7_compat = pruned_irfft_single(x, n, 7, reference_compat=True)
    assert rel_err(out7_compat, g["out_pos7"]) < TOL
    out7 = pruned_irfft_single(x, n, 7)
    assert rel_err(out7, g["full_irfft"][7]) < TOL
    # And the reference's odd-position output really is wrong:
    assert rel_err(g["out_pos7"], g["full_irfft"][7]) > 1e-3


def test_attention_pool():
    g = load("attn_pool")
    params = {
        "w1": g["param:w1.weight"].T, "b1": g["param:w1.bias"],
        "w2": g["param:w2.weight"].T, "b2": g["param:w2.bias"],
    }
    out = attention_pool({k: jnp.asarray(v) for k, v in params.items()},
                         jnp.asarray(g["x"]))
    assert rel_err(out, g["out"]) < TOL
