"""Process-level JAX initialization helpers.

``enable_compilation_cache()`` turns on JAX's persistent compilation cache
so repeated CLI/bench invocations don't re-pay TPU compile latency (~100s
per kernel shape through a remote-compile relay). Called by the CLI, the
bench harness, and the driver entry — not on library import.
"""

from __future__ import annotations

import os


def ensure_n_devices(n_devices: int) -> list:
    """Return ≥ n_devices JAX devices, re-initializing onto virtual CPU
    devices if the current backend has too few.

    Handles environments whose ``sitecustomize`` imports jax and
    initializes a 1-chip accelerator backend at interpreter startup
    (before any ``JAX_PLATFORMS``/``XLA_FLAGS`` override can take
    effect): backends are torn down and rebuilt as an ``n_devices``-way
    CPU platform via ``jax_num_cpu_devices``. Used by the driver's
    ``dryrun_multichip`` entry; real chips are preferred when present.
    """
    import jax

    devices = jax.devices()
    if len(devices) >= n_devices:
        return devices
    # NOTE: tears down live backends — any device arrays created before
    # this call become invalid. Only safe at process start (the dryrun
    # entry), never mid-computation.
    try:
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        if hasattr(xb.get_backend, "cache_clear"):
            xb.get_backend.cache_clear()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        # private-API drift in a future jax, or an older jax without
        # jax_num_cpu_devices: fall through — the caller asserts on the
        # device count and reports the XLA_FLAGS env-var recipe.
        pass
    return jax.devices()


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "EAGLE_TPU_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "eagle_tpu_xla"),
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
