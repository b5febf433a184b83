"""Test configuration: force an 8-fake-device CPU platform.

The image boots JAX onto a remote-tunneled TPU ('axon' platform) via
sitecustomize; tests must run on CPU with 8 virtual devices so sharded code
paths are exercised without a pod (SURVEY §4.2).  The axon registration has
already happened by the time this conftest imports, so we both set the env
and clear any initialized backends before switching the platform.

Set FFT_TPU_REAL=1 to SKIP the CPU forcing and run against the live
backend instead — used by the real-chip kernel smoke tests
(tests/test_tpu_smoke.py), which are skipped on CPU.
"""

import os

if not os.environ.get("FFT_TPU_REAL"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    try:
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    except Exception:  # pragma: no cover - defensive
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
