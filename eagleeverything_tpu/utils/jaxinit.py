"""Process-level JAX initialization helpers.

``enable_compilation_cache()`` turns on JAX's persistent compilation cache
so repeated CLI/bench invocations don't re-pay TPU compile latency (~100s
per kernel shape through a remote-compile relay). Called by the CLI, the
bench harness, and the driver entry — not on library import.
"""

from __future__ import annotations

import os


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
