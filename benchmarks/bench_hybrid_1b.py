"""Hybrid 1B (config 5) training step time on one chip.

Chunked CE + per-group remat + donated train state are what make this
config a candidate for a single 16 GB chip at all: params + AdamW
moments alone are ~12 GB f32.  Reports s/step via the slope method.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_hybrid_1b.py
         [--seq N] [--groups G]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fft_tpu.models.hybrid import hybrid_1b_config, hybrid_init
from fft_tpu.train.loop import TrainState, hybrid_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--vocab", type=int, default=50432)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--mu-bf16", action="store_true",
                    help="bf16 AdamW first moment (train.loop mu_dtype)")
    args = ap.parse_args()

    cfg = hybrid_1b_config(vocab_size=args.vocab, seq=args.seq)
    cfg = dataclasses.replace(cfg, num_groups=args.groups)
    params = hybrid_init(jax.random.key(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    opt = optax.adamw(1e-4, mu_dtype="bfloat16" if args.mu_bf16 else None)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       rng=jax.random.key_data(jax.random.key(2)))
    batch = jax.random.randint(jax.random.key(1),
                               (args.batch, args.seq + 1), 0, args.vocab)

    def chain(st, bt, k):
        def body(s, _):
            s, metrics = hybrid_train_step(s, bt, model_cfg=cfg,
                                           optimizer=opt)
            return s, metrics["loss"]
        s, losses = jax.lax.scan(body, st, None, length=k)
        return s, losses[-1]

    k_lo, k_hi = 1, 3
    f_lo = jax.jit(lambda st, bt: chain(st, bt, k_lo), donate_argnums=(0,))
    f_hi = jax.jit(lambda st, bt: chain(st, bt, k_hi), donate_argnums=(0,))
    state, l0 = f_lo(state, batch)
    float(np.asarray(l0))
    state, l0 = f_hi(state, batch)
    float(np.asarray(l0))

    holder = [state]

    def t(f):
        def run():
            st, loss = f(holder.pop(), batch)
            holder.append(st)
            return loss

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter(); float(np.asarray(run()))
            best = min(best, time.perf_counter() - t0)
        return best

    s = (t(f_hi) - t(f_lo)) / (k_hi - k_lo)
    print(json.dumps({
        "model": "hybrid-1b", "params": n_params,
        "seq": args.seq, "batch": args.batch, "groups": args.groups,
        "mu_bf16": args.mu_bf16,
        "s_per_step": round(s, 3),
        "tok_s": round(args.batch * args.seq / s),
    }), flush=True)


if __name__ == "__main__":
    main()
