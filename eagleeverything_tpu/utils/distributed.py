"""Multi-host runtime initialization (SURVEY.md §3.4/§6.8: the rebuild's
distributed backend is the JAX runtime + XLA collectives — no hand-rolled
transport).

Set three env vars on every host and call :func:`maybe_initialize` (the
CLI does this automatically):

  EAGLE_COORD_ADDR  coordinator host:port (host 0's address)
  EAGLE_NUM_PROCS   total process count
  EAGLE_PROC_ID     this process's rank

After initialization, ``jax.devices()`` spans the whole pod slice and the
SNP-sharded scan runs SPMD: every host executes the same program; genotype
shards stay host-local (store shard k ↔ host k); the decision path is
replicated host-f64 (deterministic — every host computes identical REML /
extBIC results from the replicated kernel).
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Initialize jax.distributed from EAGLE_* env vars; no-op without them."""
    addr = os.environ.get("EAGLE_COORD_ADDR")
    if not addr:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["EAGLE_NUM_PROCS"]),
        process_id=int(os.environ["EAGLE_PROC_ID"]),
    )
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def is_host0() -> bool:
    return process_index() == 0
