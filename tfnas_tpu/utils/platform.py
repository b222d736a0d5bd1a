"""Backend-selection helper for driver processes.

The axon TPU plugin overrides JAX_PLATFORMS via jax.config at interpreter
start, so exporting JAX_PLATFORMS=cpu alone does not reach the CPU fake
backend. Tests (tests/conftest.py) and the graft entry re-assert the
request via jax.config; drivers launched as SUBPROCESSES (multi-process
smokes, watchdogged runs on a dead relay) need the same hook.
"""

import os


def honor_cpu_platform_request():
    """Re-assert an explicit JAX_PLATFORMS=cpu env request. Must run before
    any JAX backend initializes (first device/array use); call it at the
    top of a driver's main()."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized — leave it be
