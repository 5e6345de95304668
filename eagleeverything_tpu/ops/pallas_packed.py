"""Fused 2-bit-unpack × GEMM Pallas TPU kernels for the packed stack.

The XLA path (`kernels.unpack_recode_tile` + `jnp.dot`) materializes each
unpacked f32 tile (tile_p × n — ~16× the packed bytes) before the GEMM;
when the fusion doesn't hold, every sweep pays ~32× the HBM traffic of
the packed bytes themselves. These kernels keep the unpack IN VMEM: each
grid step DMAs a (BLK_P, NW_BLK) block of packed words, shifts out the
sixteen 2-bit planes on the VPU, mean-imputes missing codes, and feeds
the MXU — the only HBM traffic is the packed bytes, the skinny operand,
and the skinny result (reference hot loops: ``calculateMMt_rcpp`` /
``calculate_a_and_vara_rcpp``, SURVEY.md §3.3).

Stack dtype (the r4 fix for the r3 OOM): the packed stack is typed
**int32** — shape (p_pad, nw), nw = ⌈⌈n/4⌉/4⌉ words, little-endian view
of the 2-bit byte stream, so word w holds genotypes j = 16w+k at bits 2k.
The r3 uint8-typed (p_pad, 4·nw) form made XLA stage a full layout copy
of the buffer when feeding pallas_call (16.15 GB transient at the
12.8 GB 50k×1M stack → OOM); int32's native (8, 128) tiling matches the
default layout, so the kernels read the resident bytes in place.

Plane layout (the trick that avoids an in-kernel deinterleave): word w of
a packed row holds genotypes j = 16w+k in bits 2k. Unpacking plane k as a
contiguous block W'[:, k·nw + w] is just ``(raw >> 2k) & 3`` — no lane
shuffles — and turns the true W into W' = W·Πᵀ for a FIXED column
permutation Π (i' = k·nw + w ↔ j = 16w + k). So W·A = W'·(Π·A): permute
the skinny operand's rows once per call (O(n·r), noise next to the n·p
pass) and every result is exact, not approximate. The n..16·nw padding
positions are handled by zeroing the corresponding operand rows
(packed_dot) / output rows (packed_tdot).

Missing codes (3) are imputed to the per-SNP mean dose, supplied as a
precomputed (p_pad,) vector (one pass at stack-build time) — identical
values to unpack_recode_tile's on-the-fly tile means.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Max SNP rows per grid step (also the stack's row-padding alignment).
# The row block is the lever that bounds the SKINNY-OPERAND re-fetch:
# the (PLANES, NW_BLK, r) a-block changes every inner j step, so its
# total DMA volume is (p_pad/blk)·|A3| — at the r4 fixed 512 that was
# ~0.8·r MB × 1954 steps ≈ 16× the 12.5 GB stack read at r=130
# (measured: the r=130 stats pass ran 4.4 s where the stack-bound
# roofline is <0.5 s). Kernels pick the LARGEST row block that fits the
# ~16 MB/core VMEM budget for their r (_pick_blk) — measured: 2048 at
# r=137 exceeds the scoped-vmem limit by 0.9 MB, so wide calls step
# down; every candidate divides BLK_P, which is what the stack pads to.
BLK_P = int(_os.environ.get("EAGLE_PALLAS_BLK_P", "2048"))
NW_BLK = 128    # packed int32 words per grid step (128 genotype
#                 cols/plane); does NOT affect a-block traffic (the
#                 per-step block shrinks as the step count grows)
PLANES = 16     # 2-bit planes per int32 word


def _pick_blk(r: int) -> int:
    """Largest row block whose VMEM working set (double-buffered wp/a
    blocks, out accumulator, unpack scratch — Mosaic's scoped stack) fits
    the ~16 MB/core budget with headroom. Thresholds are set from the
    measured 16.88 MB failure at (blk=2048, r=137)."""
    if r <= 64:
        return BLK_P
    if r <= 192:
        return min(BLK_P, 1024)
    return min(BLK_P, 512)


def _auto_interpret() -> bool:
    """Interpret mode off TPU — lets CPU tests force the engine's Pallas
    path (config.pallas_packed=True) through the same call sites."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def plane_perm(n: int, nw: int) -> np.ndarray:
    """perm[i'] = original genotype column j for plane position i'
    (i' = k·nw + w ↔ j = 16w + k); entries with j ≥ n are marked -1."""
    k = np.arange(PLANES * nw) // nw
    w = np.arange(PLANES * nw) % nw
    j = PLANES * w + k
    return np.where(j < n, j, -1)


@functools.partial(jax.jit, static_argnames=("n", "nw"))
def to_plane(V: jax.Array, n: int, nw: int) -> jax.Array:
    """(n, r) → plane-space (16·nw, r); padding positions are zero."""
    perm = jnp.asarray(plane_perm(n, nw))
    safe = jnp.maximum(perm, 0)
    return jnp.where((perm >= 0)[:, None], V[safe], 0.0)


@functools.partial(jax.jit, static_argnames=("n", "nw"))
def from_plane(T: jax.Array, n: int, nw: int) -> jax.Array:
    """plane-space (16·nw, r) → (n, r) (inverse gather of to_plane)."""
    j = jnp.arange(n)
    idx = (j % PLANES) * nw + j // PLANES
    return T[idx]


def _plane_w(raw, mean_col, k):
    """Recoded f32 block of plane k: codes 0/1/2 → dose−1, 3 → mean−1.
    ``raw`` is already int32 (arithmetic >> then &3 masks the sign bits),
    so no widening is needed — Mosaic supports neither uint8 shifts nor
    uint8→f32 casts, which the int32 stack sidesteps entirely."""
    c = ((raw >> (2 * k)) & 3).astype(jnp.float32)
    return jnp.where(c == 3.0, mean_col - 1.0, c - 1.0)


def _dot_kernel(wp_ref, a_ref, mean_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    raw = wp_ref[:]
    mean_col = mean_ref[:]            # (blk, 1)
    # ONE K = 16·NW_BLK dot instead of 16 separate K = NW_BLK plane-dots:
    # the skinny-K form ran the MXU at ~9% of f32 peak (measured 4.5
    # TFLOPS at 50k×1M); concatenating the unpacked planes column-wise
    # (their order matches A3's plane-major row layout) feeds one
    # large-contraction GEMM per step.
    w_full = jnp.concatenate(
        [_plane_w(raw, mean_col, k) for k in range(PLANES)], axis=1)
    a_flat = a_ref[:].reshape(PLANES * a_ref.shape[1], a_ref.shape[2])
    out_ref[:] = out_ref[:] + jnp.dot(
        w_full, a_flat, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_dot(Wp: jax.Array, A3: jax.Array, means: jax.Array,
               interpret: bool = False) -> jax.Array:
    """(p_pad, r) = W'·A3 for plane-space operand A3 (16, nw, r).

    Wp (p_pad, nw) int32, means (p_pad, 1) f32. p_pad % BLK_P == 0 and
    nw % NW_BLK == 0 (the stack builder pads both)."""
    p_pad, nw = Wp.shape
    r = A3.shape[2]
    interpret = interpret or _auto_interpret()
    # the concatenated w_full buffer costs 8 KB·blk of VMEM, so the dot
    # kernel runs narrower row blocks than tdot; with the large-K dot the
    # kernel is MXU-bound, not operand-DMA-bound, and 512 rows keeps the
    # whole working set ≲8 MB for r up to ~500
    blk = min(BLK_P, 512)
    grid = (p_pad // blk, nw // NW_BLK)
    return pl.pallas_call(
        _dot_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, NW_BLK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANES, NW_BLK, r), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, r), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, r), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * PLANES * nw * r,
            bytes_accessed=(p_pad * nw * 4 + p_pad * r * 4
                            + PLANES * nw * r * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Wp, A3, means)


def _tdot_kernel(wp_ref, t_ref, mean_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    raw = wp_ref[:]
    mean_col = mean_ref[:]
    t = t_ref[:]                      # (BLK_P, r)
    planes = [
        jax.lax.dot_general(          # (NW_BLK, r) per plane
            _plane_w(raw, mean_col, k), t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for k in range(PLANES)
    ]
    # stack instead of .at[k].add — Mosaic has no scatter-add lowering
    out_ref[:] = out_ref[:] + jnp.stack(planes, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_tdot(Wp: jax.Array, T: jax.Array, means: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Plane-space (16, nw, r) = W'ᵀ·T for T (p_pad, r).

    Output rows at padding positions carry pad-word garbage — callers
    mask them (to_plane/from_plane never read them)."""
    p_pad, nw = Wp.shape
    r = T.shape[1]
    interpret = interpret or _auto_interpret()
    blk = _pick_blk(r)
    grid = (nw // NW_BLK, p_pad // blk)
    return pl.pallas_call(
        _tdot_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, NW_BLK), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, r), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PLANES, NW_BLK, r), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PLANES, nw, r), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * PLANES * nw * r,
            bytes_accessed=(p_pad * nw * 4 + p_pad * r * 4
                            + PLANES * nw * r * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Wp, T, means)


def kernel_matvec(Wp: jax.Array, V: jax.Array, means: jax.Array,
                  n: int, interpret: bool = False) -> jax.Array:
    """K·V = WᵀW·V (n, r) via one fused dot + one fused tdot — the
    packed Krylov matvec at packed-bytes HBM traffic."""
    nw = Wp.shape[1]
    V3 = to_plane(V, n, nw).reshape(PLANES, nw, -1)
    T1 = packed_dot(Wp, V3, means, interpret=interpret)
    T2 = packed_tdot(Wp, T1, means, interpret=interpret)
    return from_plane(T2.reshape(PLANES * nw, -1), n, nw)


def supports() -> bool:
    """True when the compiled TPU kernels can run (not CPU interpret)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
