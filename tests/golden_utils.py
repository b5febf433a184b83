"""Helpers to load golden npz dumps and map torch state_dicts to our pytrees."""

from __future__ import annotations

import pathlib

import jax
import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"


def load(name: str) -> dict:
    with np.load(GOLDEN_DIR / f"{name}.npz") as z:
        return {k: z[k] for k in z.files}


def rel_err(a, b) -> float:
    a = np.asarray(a)
    b = np.asarray(b)
    denom = np.max(np.abs(b))
    if denom == 0:
        return float(np.max(np.abs(a - b)))
    return float(np.max(np.abs(a - b)) / denom)


def _p(g: dict, key: str):
    return np.asarray(g[f"param:{key}"])


def map_head_params(g: dict, cfg, prefix: str = "") -> dict:
    """torch SpectreHead state_dict -> fft_tpu head param pytree.

    Torch linear weights are (out, in); ours are (in, out) -> transpose.
    The flat modReLU bias (F_half*G,) reshapes to (G, F_half) matching the
    reference's flatten order (spectre.py:531).
    """
    p = lambda k: _p(g, prefix + k)  # noqa: E731
    params = {
        "w_q": {"w": p("W_q.weight").T},
        "w_v": {"w": p("W_v.weight").T},
        "gate_mlp": {
            "fc1": {"w": p("gate_mlp.0.weight").T, "b": p("gate_mlp.0.bias")},
            "fc2": {"w": p("gate_mlp.2.weight").T, "b": p("gate_mlp.2.bias")},
        },
        "q_norm": {"scale": p("q_norm.weight"), "bias": p("q_norm.bias")},
        "modrelu_bias": p("modrelu.bias").reshape(cfg.num_groups, cfg.f_half),
    }
    if cfg.pooling_type == "attention":
        params["pool"] = {
            "fc1": {"w": p("pooling.w1.weight").T, "b": p("pooling.w1.bias")},
            "fc2": {"w": p("pooling.w2.weight").T, "b": p("pooling.w2.bias")},
        }
    if cfg.use_toeplitz:
        params["toeplitz_kernel"] = p("toeplitz_kernel")
    return params


def map_multihead_params(g: dict, cfg, prefix: str = "") -> dict:
    head_list = [
        map_head_params(g, cfg.head_config(), prefix=f"{prefix}heads.{i}.")
        for i in range(cfg.num_heads)
    ]
    heads = jax.tree.map(lambda *xs: np.stack(xs), *head_list)
    return {
        "heads": heads,
        "out_proj": {"w": _p(g, prefix + "out_proj.weight").T},
        "wavelet": {
            "fc1": {
                "w": _p(g, prefix + "wavelet_refinement.gate_mlp.0.weight").T,
                "b": _p(g, prefix + "wavelet_refinement.gate_mlp.0.bias"),
            },
            "fc2": {
                "w": _p(g, prefix + "wavelet_refinement.gate_mlp.2.weight").T,
                "b": _p(g, prefix + "wavelet_refinement.gate_mlp.2.bias"),
            },
        },
    }


def map_block_params(g: dict, cfg, prefix: str = "") -> dict:
    params = {
        "ln1": {"scale": _p(g, prefix + "ln1.weight"),
                "bias": _p(g, prefix + "ln1.bias")},
        "mix": map_multihead_params(g, cfg, prefix=prefix + "mix."),
        "ln2": {"scale": _p(g, prefix + "ln2.weight"),
                "bias": _p(g, prefix + "ln2.bias")},
        "mlp": {
            "fc1": {"w": _p(g, prefix + "mlp.0.weight").T,
                    "b": _p(g, prefix + "mlp.0.bias")},
            "fc2": {"w": _p(g, prefix + "mlp.2.weight").T,
                    "b": _p(g, prefix + "mlp.2.bias")},
        },
    }
    if f"param:{prefix}memory_fft" in g:
        mem = _p(g, prefix + "memory_fft")
        # our params store complex memory as a real (2, bins, d) [re; im] pair
        params["memory_fft"] = np.stack([mem.real, mem.imag]).astype(np.float32)
    return params
