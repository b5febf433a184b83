"""Command-line entry points for the BASELINE.json workloads.

Usage:
    python -m fft_tpu.cli train-lm   [--preset tiny|350m] [--steps N]
                                     [--data FILE] [--batch B] [--seq L]
                                     [--ckpt DIR] [--resume] [--bf16]
                                     [--dp N --sp N --tp N]
    python -m fft_tpu.cli train-vit  [--steps N] [--batch B]
    python -m fft_tpu.cli tokenize   --out FILE [--data TEXT] [--vocab-size V]
    python -m fft_tpu.cli generate   [--ckpt DIR] [--prompt TEXT] [--steps N]
    python -m fft_tpu.cli bench-mix  [--seqs 1024,4096,...] [--batch B]

All commands run hermetically (synthetic data) when no dataset is given.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _lm_config(args):
    from fft_tpu.models.lm import spectre_350m_config, tiny_lm_config
    vk = ({"vocab_size": args.vocab_size}
          if getattr(args, "vocab_size", None) else {})
    cfg = (spectre_350m_config(seq=args.seq, **vk) if args.preset == "350m"
           else tiny_lm_config(seq=args.seq, **vk))
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, block=dataclasses.replace(cfg.block,
                                           compute_dtype="bfloat16"))
    return cfg


def _default_bpe_corpus(vocab_size: int) -> str:
    """Build (once, cached) a BPE-tokenized synthetic corpus so the
    50k-vocab presets train on their declared vocab end-to-end even with
    no dataset on disk (this sandbox has no network)."""
    import pathlib
    from fft_tpu.train.bpe import is_token_file, tokenize_file
    from fft_tpu.train.data import synthetic_corpus

    cache = pathlib.Path.home() / ".cache" / "fft_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    out = cache / f"synth_v{vocab_size}.tokens"
    if not is_token_file(str(out)):
        print(f"building BPE corpus at {out} ...")
        tokenize_file(synthetic_corpus(2_000_000), str(out),
                      vocab_size=vocab_size)
    return str(out)


def cmd_train_lm(args):
    from fft_tpu.models.lm import lm_init
    from fft_tpu.parallel import (lm_batch_sharding, lm_state_shardings,
                                  make_mesh)
    from fft_tpu.train import TrainConfig, train_init, train_step
    from fft_tpu.train.bpe import Tokenizer, is_token_file, vocab_sidecar
    from fft_tpu.train.checkpoint import (AsyncCheckpointWriter, latest_step,
                                          restore_checkpoint)
    from fft_tpu.train.data import CharDataset, TokenDataset
    from fft_tpu.utils import MetricsLogger

    cfg = _lm_config(args)
    data_path = args.data
    if data_path is None and args.preset == "350m":
        data_path = _default_bpe_corpus(cfg.vocab_size)
    token_mode = is_token_file(data_path)
    if token_mode:
        tok_vocab = Tokenizer.load(vocab_sidecar(data_path)).vocab_size
        if tok_vocab > cfg.vocab_size:  # user input: must survive python -O
            raise SystemExit(
                f"corpus vocab {tok_vocab} exceeds model vocab "
                f"{cfg.vocab_size}")
    if args.sp > 1 and cfg.block.causal:
        # SP needs the shard-local segmented causal algorithm
        # (layers/causal_seg.py); the 2N-FFT chunked path is global.
        cfg = dataclasses.replace(
            cfg, block=dataclasses.replace(cfg.block,
                                           causal_impl="segmented"))
    tcfg = TrainConfig(learning_rate=args.lr, total_steps=args.steps)
    params = lm_init(jax.random.key(args.seed), cfg)
    state, opt = train_init(jax.random.key(args.seed + 1), params, tcfg)

    pp_mesh = None
    if getattr(args, "pp", 1) > 1:
        # PP uses its own 'stage' mesh over the first pp devices; the
        # dp/sp/tp mesh must stay trivial (mixing device sets in one jit
        # is not supported).
        assert args.dp == args.sp == args.tp == 1, (
            "--pp composes with dp/sp/tp via multi-mesh jit, which this "
            "CLI keeps simple: use --pp alone")
        assert cfg.num_layers % args.pp == 0, (cfg.num_layers, args.pp)
        from jax.sharding import Mesh
        pp_mesh = Mesh(np.asarray(jax.devices()[:args.pp]), ("stage",))
        mesh = None
        state_sh = batch_sh = None
    else:
        mesh = make_mesh(data=args.dp, seq=args.sp, model=args.tp)
        state_sh = lm_state_shardings(mesh, state)
        batch_sh = lm_batch_sharding(mesh)
        state = jax.device_put(state, state_sh)

    start = 0
    if args.resume and args.ckpt and latest_step(args.ckpt) is not None:
        state = restore_checkpoint(args.ckpt, state)
        start = int(np.asarray(state.step))
        print(f"resumed at step {start}")

    # donated state: in-place param/opt updates — without it XLA keeps
    # HLO-temp copies of params + AdamW moments (~2.1 GB at 350M) and the
    # seq-32k config overflows the chip
    step_fn = jax.jit(lambda s, b: train_step(s, b, model_cfg=cfg,
                                              optimizer=opt, mesh=mesh,
                                              pp_mesh=pp_mesh),
                      in_shardings=(state_sh, batch_sh),
                      out_shardings=(state_sh, None),
                      donate_argnums=(0,))

    def make_batches(seed):
        if data_path is not None:
            try:
                from fft_tpu.train.native_loader import NativeCharLoader
                it = iter(NativeCharLoader(
                    data_path, args.batch, args.seq, seed=seed,
                    elem_size=2 if token_mode else 1))
                print("using native C++ data loader"
                      + (" (uint16 BPE tokens)" if token_mode else ""))
                return it
            except Exception as e:      # fall back to the Python pipeline
                print(f"native loader unavailable ({e}); "
                      "using Python loader")
            if token_mode:
                return TokenDataset(data_path).batches(
                    args.batch, args.seq, seed=seed)
        data = CharDataset(path=data_path)
        return data.batches(args.batch, args.seq, seed=seed)

    # Resumed runs re-seed by the resumed step so the stream continues with
    # fresh batches instead of repeating the run's first ones.
    batches = make_batches(args.seed + start)
    ckpt_writer = (AsyncCheckpointWriter(args.ckpt) if args.ckpt else None)
    logger = MetricsLogger(args.metrics, print_every=args.log_every)
    tokens_per_step = args.batch * args.seq

    eval_fn = eval_batches = None
    if args.eval_every:
        from fft_tpu.train import lm_loss
        eval_fn = jax.jit(lambda p, b: lm_loss(p, cfg, b,
                                               deterministic=True))
        # Separately-seeded held-out stream: eval never consumes (or
        # overlaps with) training batches.
        eval_batches = make_batches(args.seed + 7919)

    # Fault injection for recovery drills (train/supervisor.py): crash at
    # step FFT_TPU_FAULT_STEP on fresh runs only (a transient failure — a
    # resumed run sails past it).
    import os
    fault_step = int(os.environ.get("FFT_TPU_FAULT_STEP", "0"))

    try:
        _train_lm_loop(args, state, batch_sh, step_fn, batches, ckpt_writer,
                       eval_fn, eval_batches, logger, start, tokens_per_step,
                       fault_step)
    finally:
        # Drain any in-flight async checkpoint write even when the loop
        # raises — a crash must not lose (or leave uncommitted) the last
        # checkpoint the supervisor will resume from.  When a training
        # exception is already propagating, a deferred background-write
        # error must not replace it (the supervisor/operator needs the
        # real crash cause): log it instead.
        if ckpt_writer is not None:
            in_flight_exc = sys.exc_info()[0] is not None
            try:
                ckpt_writer.wait()
            except Exception as ckpt_err:
                if not in_flight_exc:
                    raise
                print(f"async checkpoint write failed during crash "
                      f"handling: {ckpt_err!r}", file=sys.stderr)
    logger.close()


def _train_lm_loop(args, state, batch_sh, step_fn, batches, ckpt_writer,
                   eval_fn, eval_batches, logger, start, tokens_per_step,
                   fault_step):
    for i, batch in zip(range(start, args.steps), batches):
        if fault_step and start == 0 and i + 1 == fault_step:
            raise RuntimeError(f"injected fault at step {i + 1}")
        batch = jax.device_put(batch, batch_sh)
        if args.profile and i == start + 2:   # one post-compile step
            from fft_tpu.utils import profile_trace
            with profile_trace(args.profile):
                state, metrics = step_fn(state, batch)
                jax.block_until_ready(metrics["loss"])
        else:
            state, metrics = step_fn(state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            rec = {"loss": metrics["loss"],
                   "grad_norm": metrics["grad_norm"]}
            if eval_fn is not None and i % args.eval_every == 0:
                eval_batch = jax.device_put(next(eval_batches), batch_sh)
                ce = float(eval_fn(state.params, eval_batch))
                rec["eval_loss"] = ce
                rec["eval_ppl"] = float(np.exp(min(ce, 20.0)))
            logger.log(i, rec, tokens=tokens_per_step)
        if ckpt_writer is not None and (i + 1) % args.ckpt_every == 0:
            # snapshot-to-host is synchronous; the disk write overlaps the
            # next training steps
            ckpt_writer.save(state, i + 1)
    # Final save, unless the loop just checkpointed the last step or the
    # run resumed past its end (writing the restored state under a
    # directory named args.steps would mislabel it).
    if (ckpt_writer is not None and start < args.steps
            and args.steps % args.ckpt_every != 0):
        ckpt_writer.save(state, args.steps)


def cmd_train_hybrid(args):
    """Train the hybrid SPECTRE+SWA LM (BASELINE config 5).  ``--sp N``
    runs context-parallel: SWA layers exchange a KV halo over the 'seq'
    axis, SPECTRE layers sequence-shard via GSPMD (both inside
    hybrid_train_step's cp_mesh path)."""
    from fft_tpu.models.hybrid import (hybrid_1b_config, hybrid_init,
                                       hybrid_tiny_config)
    from fft_tpu.parallel import make_mesh, shardings_for_tree
    from fft_tpu.train import TrainConfig, train_init
    from fft_tpu.train.loop import hybrid_loss, hybrid_train_step
    from fft_tpu.train.checkpoint import (AsyncCheckpointWriter, latest_step,
                                          restore_checkpoint)
    from fft_tpu.train.data import CharDataset
    from fft_tpu.utils import MetricsLogger
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = (hybrid_1b_config(seq=args.seq) if args.preset == "1b"
           else hybrid_tiny_config(seq=args.seq))
    if args.sp > 1:
        assert (args.seq // args.sp) % cfg.attn_window == 0, (
            "shard-local length must divide into SWA windows")
        cfg = dataclasses.replace(
            cfg, block=dataclasses.replace(cfg.block,
                                           causal_impl="segmented"))
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, block=dataclasses.replace(cfg.block,
                                           compute_dtype="bfloat16"))
    tcfg = TrainConfig(learning_rate=args.lr, total_steps=args.steps)
    params = hybrid_init(jax.random.key(args.seed), cfg)
    state, opt = train_init(jax.random.key(args.seed + 1), params, tcfg)

    mesh = make_mesh(data=args.dp, seq=args.sp, model=1)
    cp_mesh = mesh if args.sp > 1 else None
    state_sh = shardings_for_tree(mesh, state)
    batch_sh = NamedSharding(mesh, P("data", None))
    state = jax.device_put(state, state_sh)

    start = 0
    if args.resume and args.ckpt and latest_step(args.ckpt) is not None:
        state = restore_checkpoint(args.ckpt, state)
        start = int(np.asarray(state.step))
        print(f"resumed at step {start}")

    step_fn = jax.jit(lambda s, b: hybrid_train_step(
        s, b, model_cfg=cfg, optimizer=opt, cp_mesh=cp_mesh),
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, None),
        donate_argnums=(0,))

    data = CharDataset(path=args.data)
    batches = data.batches(args.batch, args.seq, seed=args.seed + start)
    ckpt_writer = (AsyncCheckpointWriter(args.ckpt) if args.ckpt else None)
    logger = MetricsLogger(args.metrics, print_every=args.log_every)

    eval_fn = eval_batches = None
    if args.eval_every:
        eval_fn = jax.jit(lambda p, b: hybrid_loss(p, cfg, b,
                                                   deterministic=True,
                                                   cp_mesh=cp_mesh))
        eval_batches = data.batches(args.batch, args.seq,
                                    seed=args.seed + 7919)

    try:
        _train_lm_loop(args, state, batch_sh, step_fn, batches, ckpt_writer,
                       eval_fn, eval_batches, logger, start,
                       args.batch * args.seq, 0)
    finally:
        if ckpt_writer is not None:
            in_flight_exc = sys.exc_info()[0] is not None
            try:
                ckpt_writer.wait()
            except Exception as ckpt_err:
                if not in_flight_exc:
                    raise
                print(f"async checkpoint write failed during crash "
                      f"handling: {ckpt_err!r}", file=sys.stderr)
    logger.close()


def cmd_train_vit(args):
    import optax
    from fft_tpu.models.vit import ViTConfig, vit_init
    from fft_tpu.train import TrainState
    from fft_tpu.train.checkpoint import (AsyncCheckpointWriter, latest_step,
                                          restore_checkpoint)
    from fft_tpu.train.loop import classification_loss
    from fft_tpu.utils import MetricsLogger

    from fft_tpu.train.images import (ImageFolderDataset,
                                      synthetic_image_batches)

    dataset = None
    if args.data is not None:
        dataset = ImageFolderDataset(args.data)
        if args.classes != dataset.num_classes:
            print(f"--classes {args.classes} -> {dataset.num_classes} "
                  f"(from {args.data})")
            args.classes = dataset.num_classes
    cfg = ViTConfig(num_classes=args.classes, num_layers=args.layers)
    params = vit_init(jax.random.key(args.seed), cfg)
    opt = optax.adamw(args.lr)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       rng=jax.random.key_data(jax.random.key(args.seed)))
    logger = MetricsLogger(args.metrics, print_every=args.log_every)

    start = 0
    if args.resume and args.ckpt and latest_step(args.ckpt) is not None:
        state = restore_checkpoint(args.ckpt, state)
        start = int(np.asarray(state.step))
        print(f"resumed at step {start}")
    ckpt_writer = (AsyncCheckpointWriter(args.ckpt) if args.ckpt else None)

    @jax.jit
    def step(state, imgs, labels):
        key, sub = jax.random.split(jax.random.wrap_key_data(state.rng))
        loss, grads = jax.value_and_grad(classification_loss)(
            state.params, cfg, imgs, labels, rngs={"dropout": sub},
            deterministic=False)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        return TrainState(optax.apply_updates(state.params, updates),
                          opt_state, state.step + 1,
                          jax.random.key_data(key)), loss

    # resumed runs continue the data stream from the restored step
    batches = (dataset.batches(args.batch, seed=args.seed + start)
               if dataset is not None
               else synthetic_image_batches(args.batch, cfg.image_size,
                                            args.classes,
                                            seed=args.seed + start))
    try:
        for i in range(start, args.steps):
            imgs_np, labels_np = next(batches)
            imgs, labels = jnp.asarray(imgs_np), jnp.asarray(labels_np)
            state, loss = step(state, imgs, labels)
            if i % args.log_every == 0:
                logger.log(i, {"loss": loss})
            if ckpt_writer is not None and (i + 1) % args.ckpt_every == 0:
                ckpt_writer.save(state, i + 1)
        if (ckpt_writer is not None and start < args.steps
                and args.steps % args.ckpt_every != 0):
            ckpt_writer.save(state, args.steps)
    finally:
        if ckpt_writer is not None:
            in_flight_exc = sys.exc_info()[0] is not None
            try:
                ckpt_writer.wait()
            except Exception as ckpt_err:
                if not in_flight_exc:
                    raise
                print(f"async checkpoint write failed during crash "
                      f"handling: {ckpt_err!r}", file=sys.stderr)
    logger.close()


def cmd_tokenize(args):
    """Train a byte-level BPE tokenizer on a text corpus and write the
    uint16 token stream + vocab sidecar (train/bpe.py)."""
    import pathlib
    from fft_tpu.train.bpe import tokenize_file
    from fft_tpu.train.data import synthetic_corpus

    text = (pathlib.Path(args.data).read_text(encoding="utf-8")
            if args.data else synthetic_corpus(args.chars))
    tok = tokenize_file(text, args.out, vocab_size=args.vocab_size,
                        max_merges=args.max_merges)
    n_tok = pathlib.Path(args.out).stat().st_size // 2
    print(json.dumps({
        "out": args.out, "vocab_size": tok.vocab_size,
        "merges_learned": len(tok.merges), "chars": len(text),
        "tokens": n_tok,
        "compression": round(len(text) / max(n_tok, 1), 3),
    }))


def cmd_generate(args):
    from fft_tpu.models.lm import lm_generate, lm_init
    from fft_tpu.train.checkpoint import restore_checkpoint

    cfg = _lm_config(args)
    params = lm_init(jax.random.key(args.seed), cfg)
    if args.ckpt:
        from fft_tpu.train import TrainConfig, train_init
        state, _ = train_init(jax.random.key(0), params, TrainConfig())
        state = restore_checkpoint(args.ckpt, state)
        params = state.params
    tok = None
    if args.vocab:
        from fft_tpu.train.bpe import Tokenizer, is_token_file, vocab_sidecar
        path = (vocab_sidecar(args.vocab) if is_token_file(args.vocab)
                else args.vocab)
        tok = Tokenizer.load(path)
        prompt_ids = tok.encode(args.prompt)[None]
    else:
        prompt_ids = np.frombuffer(args.prompt.encode("utf-8"),
                                   np.uint8)[None].astype(np.int32)
    toks = lm_generate(params, cfg, jnp.asarray(prompt_ids),
                       steps=args.steps, rng=jax.random.key(args.seed),
                       temperature=args.temperature)
    ids = np.asarray(toks[0])
    text = (tok.decode(ids) if tok is not None
            else bytes(int(t) % 256 for t in ids).decode(
                "utf-8", errors="replace"))
    print(args.prompt + text)


def cmd_bench_mix(args):
    from fft_tpu.config import SpectreConfig
    from fft_tpu.layers import spectre_block_apply, spectre_block_init
    from fft_tpu.utils.prof import spectral_mix_cost

    for seq in (int(s) for s in args.seqs.split(",")):
        cfg = SpectreConfig(embed_dim=args.dim, num_heads=8, n_fft=seq,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            compute_dtype="bfloat16")
        params = spectre_block_init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (args.batch, seq, args.dim))

        def chain(p, x, k):
            def body(h, _):
                return spectre_block_apply(p, cfg, h), None
            h, _ = jax.lax.scan(body, x, None, length=k)
            return h[0, 0, 0]

        f_lo = jax.jit(lambda p, x: chain(p, x, 4))
        f_hi = jax.jit(lambda p, x: chain(p, x, 16))
        float(np.asarray(f_lo(params, x)))
        float(np.asarray(f_hi(params, x)))

        def timed(f):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(f(params, x)))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(f_hi) - timed(f_lo)) / 12
        cost = spectral_mix_cost(args.batch, seq, args.dim)
        print(json.dumps({
            "seq": seq,
            "block_fwd_ms": round(dt * 1e3, 3),
            "tokens_per_sec": round(args.batch * seq / dt, 1),
            "mix_roofline_ms": round(cost.roofline_ms(), 4),
        }))


def main(argv=None):
    # Multi-host bring-up (no-op on a single host): must run before any
    # backend touch so jax.devices() spans the whole slice/pod.
    from fft_tpu.parallel.multihost import distributed_init
    distributed_init()

    p = argparse.ArgumentParser(prog="fft_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    lm = sub.add_parser("train-lm")
    lm.add_argument("--preset", default="tiny", choices=["tiny", "350m"])
    lm.add_argument("--steps", type=int, default=1000)
    lm.add_argument("--batch", type=int, default=8)
    lm.add_argument("--seq", type=int, default=2048)
    lm.add_argument("--lr", type=float, default=3e-4)
    lm.add_argument("--data", default=None,
                    help="text corpus, or a .tokens BPE stream (with its "
                         ".vocab.json sidecar) from the tokenize command")
    lm.add_argument("--vocab-size", type=int, default=None,
                    help="override the preset's vocab size")
    lm.add_argument("--ckpt", default=None)
    lm.add_argument("--ckpt-every", type=int, default=500)
    lm.add_argument("--resume", action="store_true")
    lm.add_argument("--bf16", action="store_true")
    lm.add_argument("--metrics", default=None)
    lm.add_argument("--log-every", type=int, default=10)
    lm.add_argument("--eval-every", type=int, default=0,
                    help="held-out loss/perplexity every N steps")
    lm.add_argument("--profile", default=None,
                    help="capture an XProf trace of one step to this dir")
    lm.add_argument("--dp", type=int, default=1)
    lm.add_argument("--sp", type=int, default=1)
    lm.add_argument("--tp", type=int, default=1)
    lm.add_argument("--pp", type=int, default=1,
                    help="pipeline stages (uses a dedicated 'stage' mesh)")
    lm.add_argument("--seed", type=int, default=0)
    lm.set_defaults(fn=cmd_train_lm)

    hy = sub.add_parser("train-hybrid")
    hy.add_argument("--preset", default="tiny", choices=["tiny", "1b"])
    hy.add_argument("--steps", type=int, default=1000)
    hy.add_argument("--batch", type=int, default=1)
    hy.add_argument("--seq", type=int, default=2048)
    hy.add_argument("--lr", type=float, default=1e-4)
    hy.add_argument("--data", default=None)
    hy.add_argument("--ckpt", default=None)
    hy.add_argument("--ckpt-every", type=int, default=500)
    hy.add_argument("--resume", action="store_true")
    hy.add_argument("--bf16", action="store_true")
    hy.add_argument("--metrics", default=None)
    hy.add_argument("--log-every", type=int, default=10)
    hy.add_argument("--eval-every", type=int, default=0)
    hy.add_argument("--profile", default=None)
    hy.add_argument("--dp", type=int, default=1)
    hy.add_argument("--sp", type=int, default=1,
                    help="context parallelism (SWA halo exchange + "
                         "sequence-sharded SPECTRE)")
    hy.add_argument("--seed", type=int, default=0)
    hy.set_defaults(fn=cmd_train_hybrid)

    vit = sub.add_parser("train-vit")
    vit.add_argument("--steps", type=int, default=100)
    vit.add_argument("--batch", type=int, default=32)
    vit.add_argument("--data", default=None,
                     help="ImageFolder root (class-per-subdir); default: "
                          "synthetic class-conditional images")
    vit.add_argument("--classes", type=int, default=1000)
    vit.add_argument("--layers", type=int, default=12)
    vit.add_argument("--lr", type=float, default=3e-4)
    vit.add_argument("--ckpt", default=None)
    vit.add_argument("--ckpt-every", type=int, default=100)
    vit.add_argument("--resume", action="store_true")
    vit.add_argument("--metrics", default=None)
    vit.add_argument("--log-every", type=int, default=10)
    vit.add_argument("--seed", type=int, default=0)
    vit.set_defaults(fn=cmd_train_vit)

    tz = sub.add_parser("tokenize")
    tz.add_argument("--data", default=None,
                    help="UTF-8 text corpus (default: synthetic)")
    tz.add_argument("--out", required=True,
                    help="output token stream (.tokens)")
    tz.add_argument("--vocab-size", type=int, default=50432)
    tz.add_argument("--max-merges", type=int, default=None)
    tz.add_argument("--chars", type=int, default=2_000_000,
                    help="synthetic corpus size when no --data")
    tz.set_defaults(fn=cmd_tokenize)

    gen = sub.add_parser("generate")
    gen.add_argument("--preset", default="tiny", choices=["tiny", "350m"])
    gen.add_argument("--seq", type=int, default=2048)
    gen.add_argument("--bf16", action="store_true")
    gen.add_argument("--ckpt", default=None)
    gen.add_argument("--prompt", default="the ")
    gen.add_argument("--steps", type=int, default=64)
    gen.add_argument("--temperature", type=float, default=0.0)
    gen.add_argument("--vocab", default=None,
                    help="BPE vocab json (or .tokens file) for encode/decode")
    gen.add_argument("--vocab-size", type=int, default=None)
    gen.add_argument("--seed", type=int, default=0)
    gen.set_defaults(fn=cmd_generate)

    bm = sub.add_parser("bench-mix")
    bm.add_argument("--seqs", default="1024,4096,16384")
    bm.add_argument("--batch", type=int, default=8)
    bm.add_argument("--dim", type=int, default=512)
    bm.set_defaults(fn=cmd_bench_mix)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
