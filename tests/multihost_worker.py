"""One process of a 2-process CPU `jax.distributed` cluster — spawned by
tests/test_multihost.py (never collected by pytest itself).

Exercises the multi-host bring-up path the reference lacks entirely
(SURVEY §5 communication-backend row): `distributed_init` with an explicit
local coordinator, then one real DP training step through the public CLI
(`fft_tpu.cli.main`), with the global batch sharded across both processes'
devices via Gloo collectives.

Usage: multihost_worker.py <coordinator> <num_processes> <process_id>
                           <metrics_path>
"""

import json
import sys


def main() -> None:
    coord, nproc, pid, metrics = sys.argv[1:5]

    # Must run before any backend touch (see multihost.distributed_init).
    from fft_tpu.parallel.multihost import distributed_init

    distributed_init(coordinator_address=coord, num_processes=int(nproc),
                     process_id=int(pid))

    import jax

    assert jax.process_count() == int(nproc), jax.process_count()
    # XLA_FLAGS forces 2 local CPU devices per process -> 4 global.
    assert jax.device_count() == 2 * int(nproc), jax.devices()
    assert len(jax.local_devices()) == 2

    from fft_tpu import cli
    from fft_tpu.parallel.multihost import global_batch_slice, is_primary

    # The CLI's own distributed_init() call is an idempotent no-op now.
    cli.main(["train-lm", "--preset", "tiny", "--steps", "2", "--batch",
              "4", "--seq", "128", "--dp", "4", "--metrics", metrics,
              "--log-every", "1"])

    assert is_primary() == (int(pid) == 0)
    sl = global_batch_slice(8)
    assert (sl.start, sl.stop) == (4 * int(pid), 4 * int(pid) + 4)
    print(json.dumps({"worker_ok": True, "process_index": int(pid)}),
          flush=True)


if __name__ == "__main__":
    main()
