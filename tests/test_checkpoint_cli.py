"""Checkpoint save/restore bitwise roundtrip + CLI smoke (train-lm few steps,
resume, generate)."""

import json
import pathlib

import jax
import numpy as np
import pytest

from fft_tpu.config import SpectreConfig
from fft_tpu.models.lm import LMConfig, lm_init
from fft_tpu.train import TrainConfig, train_init
from fft_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                      save_checkpoint)


def _tiny():
    return LMConfig(
        vocab_size=32, num_layers=2, max_seq=16,
        block=SpectreConfig(embed_dim=32, num_heads=4, n_fft=16,
                            pooling_type="mean", wavelet_on_rate=0.0,
                            causal=True, causal_chunk=4, memory_size=4,
                            fft_impl="jnp"))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny()
    params = lm_init(jax.random.key(0), cfg)
    state, _ = train_init(jax.random.key(1), params, TrainConfig())
    save_checkpoint(tmp_path / "ck", state, 7)
    assert latest_step(tmp_path / "ck") == 7
    restored = restore_checkpoint(tmp_path / "ck", state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_prunes_old(tmp_path):
    cfg = _tiny()
    params = lm_init(jax.random.key(0), cfg)
    state, _ = train_init(jax.random.key(1), params, TrainConfig())
    for s in (1, 2, 3, 4, 5):
        save_checkpoint(tmp_path / "ck", state, s, keep=2)
    kept = sorted(int(p.name) for p in (tmp_path / "ck").iterdir()
                  if p.name.isdigit())
    assert kept == [4, 5]


def test_cli_train_multidevice(tmp_path):
    """CLI training on a dp=2 x tp=2 mesh over the fake CPU devices."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from fft_tpu.cli import main
    metrics = str(tmp_path / "m.jsonl")
    main(["train-lm", "--steps", "3", "--batch", "4", "--seq", "16",
          "--dp", "2", "--tp", "2", "--metrics", metrics,
          "--log-every", "1"])
    lines = [json.loads(l) for l in
             pathlib.Path(metrics).read_text().splitlines()]
    assert all(l["loss"] > 0 for l in lines)


def test_cli_train_resume_generate(tmp_path, capsys):
    from fft_tpu.cli import main
    ck = str(tmp_path / "ck")
    metrics = str(tmp_path / "m.jsonl")
    argv = ["train-lm", "--steps", "4", "--batch", "2", "--seq", "16",
            "--ckpt", ck, "--ckpt-every", "2", "--metrics", metrics,
            "--log-every", "1"]
    main(argv)
    assert latest_step(ck) == 4
    lines = [json.loads(l) for l in
             pathlib.Path(metrics).read_text().splitlines()]
    assert any("loss" in l for l in lines)
    # resume continues from the saved step (runs 0 new steps if done)
    main(argv + ["--resume"])
    # generation smoke (untrained weights, greedy)
    main(["generate", "--seq", "16", "--prompt", "ab", "--steps", "3"])
    out = capsys.readouterr().out
    assert "ab" in out


def test_async_writer_roundtrip_and_order(tmp_path):
    from fft_tpu.train.checkpoint import AsyncCheckpointWriter
    cfg = _tiny()
    params = lm_init(jax.random.key(0), cfg)
    state, _ = train_init(jax.random.key(1), params, TrainConfig())
    with AsyncCheckpointWriter(tmp_path / "ck", keep=2) as w:
        for s in (1, 2, 3):
            w.save(state, s)
    assert latest_step(tmp_path / "ck") == 3
    kept = sorted(int(p.name) for p in (tmp_path / "ck").iterdir()
                  if p.name.isdigit())
    assert kept == [2, 3]
    restored = restore_checkpoint(tmp_path / "ck", state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_writer_surfaces_write_errors(tmp_path):
    from fft_tpu.train.checkpoint import AsyncCheckpointWriter
    target = tmp_path / "notadir"
    target.write_text("occupied")      # file where the ckpt dir must go
    w = AsyncCheckpointWriter(target)
    with pytest.raises(BaseException):
        w.save({"x": np.zeros(3)}, 1)  # mkdir fails, or the join raises
        w.wait()


def test_supervisor_recovers_from_injected_fault(tmp_path, monkeypatch):
    """Fault at step 3 (fresh run), checkpoint every 2: the supervisor
    restarts with --resume from step 2 and finishes all 4 steps."""
    from fft_tpu.cli import main as cli_main
    from fft_tpu.train.supervisor import supervise
    ck = str(tmp_path / "ck")
    argv = ["train-lm", "--steps", "4", "--batch", "2", "--seq", "16",
            "--ckpt", ck, "--ckpt-every", "2", "--log-every", "1"]
    monkeypatch.setenv("FFT_TPU_FAULT_STEP", "3")

    attempts = []

    def runner(a):
        attempts.append(list(a))
        try:
            cli_main(a)
            return 0
        except RuntimeError:
            return 1

    restarts = supervise(argv, runner=runner, max_restarts=2)
    assert restarts == 1
    assert latest_step(ck) == 4
    assert "--resume" in attempts[1] and "--resume" not in attempts[0]


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    from fft_tpu.train.supervisor import supervise
    calls = []

    def runner(a):
        calls.append(1)
        return 9

    with pytest.raises(RuntimeError, match="giving up"):
        supervise(["train-lm", "--ckpt", str(tmp_path / "ck")],
                  runner=runner, max_restarts=2)
    assert len(calls) == 3
