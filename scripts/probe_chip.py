#!/usr/bin/env python
"""One tiny-matmul liveness probe against the TPU relay.

Exit 0 iff a 256x256 f32 matmul completes and returns the right sum.
Used by bench.py's pre-flight stage and by the background recovery loop
(the sandbox relay wedges intermittently and recovers after minutes of
tiny-op probing — see BENCHMARKS.md "Environment caveat").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    t0 = time.time()
    from eagleeverything_tpu.utils.jaxinit import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    x = jnp.ones((256, 256), jnp.float32)
    y = float((x @ x).sum())
    ok = abs(y - 256.0 ** 3) < 1.0
    print(f"probe {'ok' if ok else 'BAD-VALUE'} in {time.time()-t0:.1f}s "
          f"backend={jax.default_backend()}", flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
