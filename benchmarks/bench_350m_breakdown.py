"""Where does the 350M step go?  Slope-timed components at the config-4
shape (b=1, seq 16384, d=1024, 24 layers, vocab 50432, bf16 + remat):

  step        - full train_step (fwd+bwd+adamw)
  hidden_fwd  - lm_hidden forward (24 blocks, no CE)
  loss_fwd    - lm_loss forward (blocks + chunked CE)
  block_fwd   - ONE block forward
  block_fb    - ONE block fwd+bwd
  mix_fwd/fb  - ONE multihead mix (no MLP/LN) fwd / fwd+bwd

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_350m_breakdown.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fft_tpu.models.lm import lm_init, spectre_350m_config, lm_hidden
from fft_tpu.train.loop import TrainState, lm_loss, train_step
from fft_tpu.layers import (spectre_block_apply, spectre_block_init,
                            spectre_multihead_apply, spectre_multihead_init)

SEQ = 16384
VOCAB = 50432


def slope(fn, *args, k_lo=2, k_hi=6):
    """fn(*args, carry) -> scalar-ish array; returns s/iter."""
    def chain(k):
        def run(*a):
            def body(c, _):
                out = fn(*a, c)
                return out.astype(jnp.float32).reshape(-1)[0] * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        return jax.jit(run)

    f_lo, f_hi = chain(k_lo), chain(k_hi)
    float(np.asarray(f_lo(*args)))
    float(np.asarray(f_hi(*args)))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo)


def main():
    cfg = spectre_350m_config(vocab_size=VOCAB, seq=SEQ)
    cfg = dataclasses.replace(
        cfg, block=dataclasses.replace(cfg.block, compute_dtype="bfloat16"))
    bcfg = cfg.block
    params = lm_init(jax.random.key(0), cfg)
    opt = optax.adamw(1e-4)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       rng=jax.random.key_data(jax.random.key(2)))
    batch = jax.random.randint(jax.random.key(1), (1, SEQ + 1), 0, VOCAB)
    out = {}

    # Every measured fn must mix the scan carry ``c`` into its INPUTS —
    # otherwise the computation is loop-invariant and XLA hoists it out
    # of the timing chain (first version of this script under-reported
    # ``step`` and ``loss_fwd`` exactly that way).
    def step_fn(st, bt, c):
        s2, m = train_step(st, bt + (c * 0).astype(bt.dtype),
                           model_cfg=cfg, optimizer=opt)
        return m["loss"][None] + c
    out["step"] = slope(step_fn, state, batch)

    def hid_fn(p, bt, c):
        h = lm_hidden(p, cfg, bt[:, :-1] + (c * 0).astype(bt.dtype),
                      deterministic=True)
        return h.reshape(-1)[:1]
    out["hidden_fwd"] = slope(hid_fn, params, batch)

    def loss_fn(p, bt, c):
        bt = bt + (c * 0).astype(bt.dtype)
        return lm_loss(p, cfg, bt, deterministic=True)[None] + c
    out["loss_fwd"] = slope(loss_fn, params, batch)

    def loss_fb(p, bt, c):
        bt = bt + (c * 0).astype(bt.dtype)
        g = jax.grad(lambda q: lm_loss(q, cfg, bt, deterministic=True))(p)
        return jax.tree.leaves(g)[0].reshape(-1)[:1] + c
    out["loss_fwdbwd"] = slope(loss_fb, params, batch)

    def hid_fb(p, bt, c):
        bt = bt + (c * 0).astype(bt.dtype)
        g = jax.grad(lambda q: jnp.sum(
            lm_hidden(q, cfg, bt[:, :-1], deterministic=True
                      ).astype(jnp.float32) ** 2))(p)
        return jax.tree.leaves(g)[0].reshape(-1)[:1] + c
    out["hidden_fwdbwd"] = slope(hid_fb, params, batch)

    x = jax.random.normal(jax.random.key(3), (1, SEQ, bcfg.embed_dim),
                          jnp.bfloat16)
    bp = spectre_block_init(jax.random.key(4), bcfg)

    def blk_fwd(p, h, c):
        return spectre_block_apply(p, bcfg, h + c.astype(h.dtype)
                                   ).reshape(-1)[:1]
    out["block_fwd"] = slope(blk_fwd, bp, x)

    def blk_fb(p, h, c):
        g = jax.grad(lambda q: jnp.sum(
            spectre_block_apply(q, bcfg, h + c.astype(h.dtype)
                                ).astype(jnp.float32) ** 2))(p)
        return jax.tree.leaves(g)[0].reshape(-1)[:1]
    out["block_fwdbwd"] = slope(blk_fb, bp, x)

    mp = spectre_multihead_init(jax.random.key(5), bcfg)

    def mix_fwd(p, h, c):
        return spectre_multihead_apply(p, bcfg, h + c.astype(h.dtype)
                                       ).reshape(-1)[:1]
    out["mix_fwd"] = slope(mix_fwd, mp, x)

    def mix_fb(p, h, c):
        g = jax.grad(lambda q: jnp.sum(
            spectre_multihead_apply(q, bcfg, h + c.astype(h.dtype)
                                    ).astype(jnp.float32) ** 2))(p)
        return jax.tree.leaves(g)[0].reshape(-1)[:1]
    out["mix_fwdbwd"] = slope(mix_fb, mp, x)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in out.items()}
                     | {"unit": "ms", "seq": SEQ,
                        "layers": cfg.num_layers}), flush=True)


if __name__ == "__main__":
    main()
