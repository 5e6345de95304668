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


# ---------------------------------------------------------------------------
# Host-level f64 collectives (bit-exact transport)
#
# The matrix-free engine's decision path is host float64 (SURVEY.md §8
# "hardest parts" (1)), but JAX CPU transport defaults to f32 without
# jax_enable_x64. These helpers move f64 payloads across processes as raw
# uint8 bytes through ``multihost_utils.process_allgather`` (XLA collectives
# — no hand-rolled transport) and reduce ON THE HOST in fixed process
# order, so every host computes bit-identical results.
# ---------------------------------------------------------------------------


def _allgather_bytes(buf):
    """(k,) uint8, same k on all hosts → (P, k) uint8."""
    import numpy as np
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(buf))


def allgather_f64(x):
    """x (any shape, same on all hosts) → (P, *x.shape) f64, bit-exact."""
    import jax
    import numpy as np

    x = np.ascontiguousarray(x, dtype=np.float64)
    if jax.process_count() == 1:
        return x[None]
    g = _allgather_bytes(x.view(np.uint8).reshape(-1))
    return np.ascontiguousarray(g).view(np.float64).reshape(
        (jax.process_count(),) + x.shape)


def allreduce_sum_f64(x):
    """Deterministic cross-process sum of a host f64 array (summed in
    process order on every host — identical bits everywhere)."""
    import jax

    if jax.process_count() == 1:
        return x
    return allgather_f64(x).sum(axis=0)


def allgather_concat_f64(x_local, sizes):
    """Concatenate per-process arrays along axis 0 in process order.
    ``sizes`` is the known per-process axis-0 length (same list on every
    host); trailing dims must match."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return np.ascontiguousarray(x_local, dtype=np.float64)
    m = max(sizes)
    pad = np.zeros((m,) + x_local.shape[1:], dtype=np.float64)
    pad[: x_local.shape[0]] = x_local
    parts = allgather_f64(pad)
    return np.concatenate(
        [parts[i, : sizes[i]] for i in range(len(sizes))], axis=0)


def allgather_varlen_f64(x_local):
    """Variable-length concat along axis 0 (sizes exchanged first)."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return np.ascontiguousarray(x_local, dtype=np.float64)
    sizes = allgather_f64(np.array([x_local.shape[0]], dtype=np.float64))
    sizes = [int(s[0]) for s in sizes]
    return allgather_concat_f64(x_local, sizes)


def process_snp_range(p: int) -> tuple[int, int]:
    """This process's contiguous SNP range [lo, hi) under the near-equal
    split every multi-host component agrees on."""
    import jax

    nproc, pid = jax.process_count(), jax.process_index()
    return (p * pid) // nproc, (p * (pid + 1)) // nproc


def local_snp_sizes(p: int) -> list[int]:
    """Per-process SNP counts under :func:`process_snp_range`'s split."""
    import jax

    nproc = jax.process_count()
    return [(p * (i + 1)) // nproc - (p * i) // nproc for i in range(nproc)]
