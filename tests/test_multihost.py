"""Multi-process (multi-host) runtime: a REAL 2-process CPU
`jax.distributed` cluster driving one DP train step through the CLI.

The reference has no distributed runtime at all (SURVEY §5: no
NCCL/MPI/Gloo anywhere in /root/reference/spectre.py); the TPU-native
equivalent is `jax.distributed.initialize` + GSPMD over a global mesh
(fft_tpu/parallel/multihost.py).  Everything else in the suite runs the
fake 8-device mesh inside ONE process; this test is the one place the
cross-process path (Gloo collectives on CPU) actually executes, per
VERDICT r3 missing-item 3.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step(tmp_path):
    port = _free_port()
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "PYTHONPATH": str(REPO), "PATH": "/opt/venv/bin:/usr/bin:/bin",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs, metric_paths = [], []
    for pid in range(2):
        m = tmp_path / f"metrics_{pid}.jsonl"
        metric_paths.append(m)
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             f"localhost:{port}", "2", str(pid), str(m)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "worker_ok" in out, out[-3000:]

    # Both processes ran the SAME global computation: per-step losses must
    # agree bitwise-ish (identical program, deterministic data stream).
    losses = []
    for m in metric_paths:
        recs = [json.loads(l) for l in m.read_text().splitlines()]
        assert len(recs) == 2 and all(np.isfinite(r["loss"]) for r in recs)
        losses.append([r["loss"] for r in recs])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
