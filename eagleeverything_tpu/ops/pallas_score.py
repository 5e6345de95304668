"""Pallas TPU kernel for the score-sweep quadratic form.

The sweep's dominant cost is vara = rowsum((Wt·Lp)²) — a (p,n)×(n,m) GEMM
whose (p,m) product is immediately squared and row-reduced. XLA materializes
the product tile-by-tile to HBM before the reduction; this kernel keeps each
(BLOCK_P, BLOCK_M) product tile in VMEM, squares and reduces it on the VPU,
and accumulates directly into the (p,1) output — the product never touches
HBM. Reference hot loop: ``calculate_a_and_vara_rcpp`` (SURVEY.md §3.3);
pattern: the classic Pallas accumulation matmul with a fused epilogue.

Grid: (p/BLOCK_P, m/BLOCK_M); the m axis is the accumulation ("arbitrary")
dimension, revisiting the same output block.

Constraints (callers fall back to the XLA kernel otherwise):
- p  divisible by BLOCK_P, m divisible by BLOCK_M (engine pads SNP tiles;
  Lp columns are zero-padded — zero columns add nothing to vara)
- n (contraction dim) ≤ ~8k so one (n, BLOCK_M) Lp stripe fits in VMEM
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_P = 512
BLOCK_M = 512
MAX_N = 8192


def _vara_kernel(w_ref, lp_ref, out_ref):
    j = pl.program_id(1)
    b = jnp.dot(w_ref[:], lp_ref[:], preferred_element_type=jnp.float32)
    part = jnp.sum(b * b, axis=1, keepdims=True)  # (BLOCK_P, 1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = part

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def vara_pallas(Wt: jax.Array, Lp: jax.Array, interpret: bool = False) -> jax.Array:
    """rowsum((Wt·Lp)²) → (p,) via the fused Pallas kernel.

    Wt (p, n) and Lp (n, m) must satisfy the block constraints above.
    """
    p, n = Wt.shape
    m = Lp.shape[1]
    bp = min(BLOCK_P, p)
    bm = min(BLOCK_M, m)
    assert p % bp == 0 and m % bm == 0, (p, m)
    grid = (p // bp, m // bm)
    out = pl.pallas_call(
        _vara_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * n * m,
            bytes_accessed=p * n * Wt.dtype.itemsize
            + n * m * Lp.dtype.itemsize + p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Wt, Lp)
    return out[:, 0]


def supports(p: int, n: int, m: int) -> bool:
    """Shape gate for the Pallas path."""
    return p % BLOCK_P == 0 and n <= MAX_N


def pad_factor_cols(Lp, block: int = BLOCK_M):
    """Zero-pad Lp's columns to a BLOCK_M multiple (vara-invariant)."""
    import numpy as np
    m = Lp.shape[1]
    m_pad = ((m + block - 1) // block) * block
    if m_pad == m:
        return Lp
    return np.concatenate(
        [Lp, np.zeros((Lp.shape[0], m_pad - m), dtype=Lp.dtype)], axis=1
    )


def score_sweep_pallas(
    Wt: jax.Array, Lp: jax.Array, Py: jax.Array, sigma2_g,
    interpret: bool = False,
) -> jax.Array:
    """Full score statistic with the Pallas vara kernel: t = â²/(σ²_g·vara)."""
    ahat = jnp.dot(Wt, Py, preferred_element_type=jnp.float32)
    vara = jnp.asarray(sigma2_g, jnp.float32) * vara_pallas(
        Wt, Lp, interpret=interpret
    )
    return jnp.where(vara > 1e-12, (ahat * ahat) / vara, 0.0)
