"""Gate-descriptor poolers: mean / attention / DCT (spectre.py:136-178).

Pure functions: parameters (for the attention pooler) are passed explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fft_tpu.ops.dct import dct2


def mean_pool(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, d) -> (B, d) (spectre.py:175-178)."""
    return jnp.mean(x, axis=-2)


def attention_pool(params, x: jnp.ndarray) -> jnp.ndarray:
    """2-layer scorer w2(GELU(w1(x))) -> softmax over sequence -> weighted sum
    (spectre.py:159-172).  GELU is the exact (erf) variant as in torch's
    default ``nn.GELU()``.

    params: {'w1': (d, hidden), 'b1': (hidden,), 'w2': (hidden, 1), 'b2': (1,)}
    """
    h = jax.nn.gelu(x @ params["w1"] + params["b1"], approximate=False)
    scores = h @ params["w2"] + params["b2"]          # (B, N, 1)
    weights = jax.nn.softmax(scores, axis=-2)
    return jnp.sum(x * weights, axis=-2)


def dct_pool(x: jnp.ndarray, dct_components: int = 64) -> jnp.ndarray:
    """DCT-II along the sequence axis; mean of the first ``dct_components``
    coefficients per channel (spectre.py:143-156, intended path — the
    reference silently degrades to mean pooling when torch_dct is missing;
    we implement the real thing on our own FFT).

    x: (B, N, d) -> (B, d)
    """
    n = x.shape[-2]
    coeffs = dct2(jnp.swapaxes(x, -1, -2))            # (B, d, N)
    k = min(dct_components, n)
    return jnp.mean(coeffs[..., :k], axis=-1)
