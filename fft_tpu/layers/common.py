"""Shared layer primitives: torch-convention linear init, layernorm, MLPs.

Parameter convention: linear kernels are stored ``(fan_in, fan_out)`` and
applied as ``x @ w + b``.  Initialization follows torch's ``nn.Linear``
default (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for both weight and bias) so training dynamics match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key, fan_in: int, fan_out: int, bias: bool = True,
                dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(float(fan_in))
    wk, bk = jax.random.split(key)
    p = {"w": jax.random.uniform(wk, (fan_in, fan_out), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (fan_out,), dtype, -bound, bound)
    return p


def linear_apply(p, x):
    """x @ w + b in x's dtype (params are cast down for bf16 compute; params
    themselves stay fp32 masters)."""
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis, torch convention (biased variance,
    eps inside the sqrt, default eps 1e-5).  Statistics in fp32 regardless
    of the compute dtype; output in x's dtype."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return ((x - mean) * inv * p["scale"] + p["bias"]).astype(dtype)


def gelu_exact(x):
    """torch ``nn.GELU()`` default: the exact erf formulation."""
    return jax.nn.gelu(x, approximate=False)


def mlp2_init(key, d_in: int, d_hidden: int, d_out: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, d_in, d_hidden, dtype=dtype),
        "fc2": linear_init(k2, d_hidden, d_out, dtype=dtype),
    }
