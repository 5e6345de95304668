"""The TPU-native scan engine: device kernels + host-f64 decision path.

Production counterpart of models/oracle.py (identical algorithm, SURVEY.md
§4.2 call stack) with the reference's native layer replaced the TPU way
(SURVEY.md §3.3 rightmost column):

- p-scale work (MMt formation, per-SNP score sweep) runs on-device via the
  jitted SNP-major kernels in ops/kernels.py — tiled/streamed out-of-core,
  or SNP-sharded across the mesh with explicit collectives
  (parallel/collectives.py).
- n-scale decision work (eigendecomposition, REML δ-optimization, P̃
  projector, extBIC accept/stop) runs on the host in float64 via the same
  models/reml_core used by the oracle, so the discrete selection path is
  engine-invariant (SURVEY.md §8 "hardest parts" (1)).

Zmat designs reduce to host-side transforms of the n×n algebra
(P_eff = Zᵀ·P̃·Z, Py_eff = Zᵀ·P̃·y), so the device kernels never see Z.
"""

from __future__ import annotations


import functools
import os
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.models import reml_core
from eagleeverything_tpu.models.oracle import AMResult
from eagleeverything_tpu.ops import kernels
from eagleeverything_tpu.parallel import collectives, mesh as meshlib
from eagleeverything_tpu.utils.config import DEFAULT_CONFIG, EagleConfig

MISSING = -9
_PAD_VALUE = 1  # pad tiles with heterozygote → W = 0 → t = 0, inert in K


# ---------------------------------------------------------------------------
# Tile sources: host-side streaming (the ReadBlock contract, SURVEY.md §3.3)
# ---------------------------------------------------------------------------


class TileSource:
    """Yields SNP-major int8 tiles (b, n_kept) and single columns."""

    n: int
    p: int

    def tiles(self, tile_snps: int) -> Iterator[tuple[int, np.ndarray]]:
        raise NotImplementedError

    def tiles_in(self, lo: int, hi: int, tile_snps: int
                 ) -> Iterator[tuple[int, np.ndarray]]:
        """Tiles restricted to the SNP range [lo, hi) — multi-host SPMD
        locality: each host decodes only its own shard range. Generic
        fallback filters/clips the full stream; store sources override to
        avoid decoding foreign shards."""
        for j0, tile in self.tiles(tile_snps):
            j1 = j0 + tile.shape[0]
            a, b = max(j0, lo), min(j1, hi)
            if a < b:
                yield a, tile[a - j0 : b - j0]

    def column(self, j: int) -> np.ndarray:
        raise NotImplementedError


class DenseTileSource(TileSource):
    def __init__(self, geno: np.ndarray, keep: Optional[np.ndarray] = None):
        G = np.asarray(geno, dtype=np.int8)
        if keep is not None:
            G = G[keep]
        self._Gt = np.ascontiguousarray(G.T)  # (p, n)
        self.p, self.n = self._Gt.shape

    def tiles(self, tile_snps: int):
        for j0 in range(0, self.p, tile_snps):
            yield j0, self._Gt[j0 : j0 + tile_snps]

    def column(self, j: int) -> np.ndarray:
        return self._Gt[j]


class StoreTileSource(TileSource):
    def __init__(self, store_dir: str, keep: Optional[np.ndarray] = None):
        from eagleeverything_tpu.io.genostore import GenotypeStore
        self._store = GenotypeStore.open(store_dir)
        self._keep = keep
        self.p = self._store.p
        self.n = self._store.n if keep is None else int(len(keep))

    def tiles(self, tile_snps: int):
        for j0, tile in self._store.iter_tiles(tile_snps):
            if self._keep is not None:
                tile = tile[:, self._keep]
            yield j0, tile

    def tiles_in(self, lo: int, hi: int, tile_snps: int):
        """Range-restricted tiles: only shards intersecting [lo, hi) are
        opened and decoded (host-local shard reads in multi-host SPMD)."""
        st = self._store
        for k in range(st.n_shards):
            s0, s1 = st.shard_offsets[k], st.shard_offsets[k + 1]
            if s1 <= lo or s0 >= hi:
                continue
            raw = st._shard_raw(k)
            a, b = max(s0, lo), min(s1, hi)
            for t0 in range(a, b, tile_snps):
                t1 = min(t0 + tile_snps, b)
                from eagleeverything_tpu.io.genostore import _decode
                tile = _decode(np.asarray(raw[t0 - s0 : t1 - s0]),
                               st.n, st.packed)
                if self._keep is not None:
                    tile = tile[:, self._keep]
                yield t0, tile

    def raw_packed_tiles(self, tile_snps: int):
        """(offset, packed-bytes) tiles for device-side unpack, or None if
        the store isn't 2-bit packed / individuals are masked."""
        if not self._store.packed or self._keep is not None:
            return None
        return self._store.iter_raw_tiles(tile_snps)

    def raw_packed_tiles_in(self, lo: int, hi: int, tile_snps: int):
        """Range-restricted raw tiles (host-local shards in SPMD), or
        None under the same conditions as raw_packed_tiles."""
        if not self._store.packed or self._keep is not None:
            return None
        return self._store.iter_raw_tiles_in(lo, hi, tile_snps)

    def column(self, j: int) -> np.ndarray:
        col = self._store.column(j)
        return col if self._keep is None else col[self._keep]


class RangeTileSource(TileSource):
    """A view of a base source restricted to the SNP range [lo, hi) with
    re-zeroed offsets — the process-local slice of the global genotype
    matrix in multi-host SPMD runs (store shard ↔ host locality,
    SURVEY.md §6.8)."""

    def __init__(self, base: TileSource, lo: int, hi: int):
        self.base, self.lo, self.hi = base, lo, hi
        self.n = base.n
        self.p = hi - lo

    def tiles(self, tile_snps: int):
        for j0, tile in self.base.tiles_in(self.lo, self.hi, tile_snps):
            yield j0 - self.lo, tile

    def raw_packed_tiles(self, tile_snps: int):
        """Local-range packed tiles with re-zeroed offsets — lets the
        per-host packed stack (engine: _packed_stack) serve multi-host
        SPMD: each process keeps only ITS shard's bytes HBM-resident."""
        get = getattr(self.base, "raw_packed_tiles_in", None)
        it = get(self.lo, self.hi, tile_snps) if get is not None else None
        if it is None:
            return None
        return ((j0 - self.lo, raw) for j0, raw in it)

    def column(self, j: int) -> np.ndarray:
        return self.base.column(self.lo + j)


def _make_source(handle: GenoHandle, keep: Optional[np.ndarray]) -> TileSource:
    if handle.geno is not None:
        return DenseTileSource(handle.geno, keep)
    if handle.store_dir is not None:
        return StoreTileSource(handle.store_dir, keep)
    raise ValueError("GenoHandle has neither in-memory genotypes nor a store")


def normalized_kernel(
    K_raw: np.ndarray, Z: Optional[np.ndarray] = None
) -> np.ndarray:
    """Mean-diagonal normalization of the raw MMt (+ Zᵀ record-level
    transform) — the shared prologue of every scan-level entry point."""
    s0 = float(np.mean(np.diag(K_raw)))
    K = K_raw / (s0 if s0 > 0 else 1.0)
    return Z @ K @ Z.T if Z is not None else K


class EigenBasis:
    """The kernel eigenbasis with a host-or-device-resident U.

    Below ``host_eigh_max_n`` U lives on the host in float64 (decision
    path exactness); above it U is computed AND kept on device in float32
    — at n = 50k a host f64 U would be 20 GB, while the only things the
    host decision path ever needs are O(n·q) projections Uᵀ·v, which are
    device matvecs here (SURVEY.md §8 hardest parts (1)/(2))."""

    def __init__(self, d: np.ndarray, U_host: Optional[np.ndarray],
                 U_dev: Optional[jax.Array]):
        self.d = d
        self._U_host = U_host
        self._U_dev = U_dev

    def project(self, M: np.ndarray) -> np.ndarray:
        """Uᵀ·M → host f64 (M is (n,) or (n, q) — small output)."""
        if self._U_host is not None:
            return self._U_host.T @ M
        out = jax.lax.dot_general(
            self._U_dev, jnp.asarray(M, jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return np.asarray(out, dtype=np.float64)

    def device_basis(self) -> jax.Array:
        if self._U_dev is None:
            self._U_dev = jnp.asarray(self._U_host, dtype=jnp.float32)
        return self._U_dev

    @property
    def host_f64(self) -> Optional[np.ndarray]:
        return self._U_host


def _eigh_kernel(K: np.ndarray, config: EagleConfig) -> tuple[np.ndarray, np.ndarray]:
    """Backward-compat wrapper: (d, U_host) — only valid when U fits on
    the host (n ≤ host_eigh_max_n uses host LAPACK; above it the f32
    device eigenvectors are pulled back). Prefer :func:`eigh_basis`."""
    basis = eigh_basis(K, config)
    U = basis.host_f64
    if U is None:
        U = np.asarray(basis.device_basis(), dtype=np.float64)
    return basis.d, U


def eigh_basis(K: np.ndarray, config: EagleConfig) -> EigenBasis:
    n = K.shape[0]
    if n <= config.host_eigh_max_n:
        d, U = np.linalg.eigh(K)
        return EigenBasis(np.maximum(d, 0.0), U, None)
    d_dev, U_dev = jnp.linalg.eigh(jnp.asarray(K, dtype=jnp.float32))
    d = np.maximum(np.asarray(d_dev, dtype=np.float64), 0.0)
    return EigenBasis(d, None, U_dev)


def _recode_tile_np(tile: np.ndarray) -> np.ndarray:
    """Host float32 mirror of kernels.recode_impute_tile for SNP-major
    int8 tiles (b, n): per-SNP mean-impute, minus 1 (all-missing → W=0)."""
    g = tile.astype(np.float32)
    miss = tile == MISSING
    cnt = (~miss).sum(axis=1)
    s = np.where(miss, 0.0, g).sum(axis=1)
    mean = np.where(cnt > 0, s / np.maximum(cnt, 1), 1.0).astype(np.float32)
    return np.where(miss, mean[:, None], g) - 1.0


def _impute_column_f64(col_raw: np.ndarray) -> np.ndarray:
    """Recode one raw int8 column to the f64 W column the oracle would
    produce (mean-impute, minus 1) — used for the fixed-effects update so
    the REML decision inputs stay f64-exact."""
    col = col_raw.astype(np.float64)
    miss = col_raw == MISSING
    if miss.any():
        obs = col[~miss]
        mean = float(obs.mean()) if obs.size else 1.0
        col[miss] = mean
    return col - 1.0


def _pad_tile(tile: np.ndarray, tile_snps: int) -> np.ndarray:
    b = tile.shape[0]
    if b == tile_snps:
        return tile
    pad = np.full((tile_snps - b, tile.shape[1]), _PAD_VALUE, dtype=np.int8)
    return np.vstack([tile, pad])


# ---------------------------------------------------------------------------
# Scan backends
# ---------------------------------------------------------------------------


def _dense_kv(W: jax.Array, V: jax.Array) -> jax.Array:
    """Wᵀ(W·V) for a device-resident recoded stack W (p_pad, n)."""
    BV = jnp.dot(W, V, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        W, BV, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _packed_kv(Wp: jax.Array, V: jax.Array, n: int, tile: int) -> jax.Array:
    """Wᵀ(W·V) over a device-resident 2-BIT PACKED stack Wp (p_pad,
    ⌈⌈n/4⌉/4⌉ int32 words — see _packed_stack), unpacking one tile at a
    time INSIDE the loop.

    This is the biobank-n enabler on one chip: at 50k×1M the packed bytes
    (12.5 GB) fit v5e HBM while the recoded f32/bf16 stack (100–200 GB)
    cannot, so every Krylov matvec is an HBM-bandwidth pass instead of a
    host→device re-stream (reference analog: the per-iteration ReadBlock
    sweep of ``calculate_a_and_vara_rcpp``, SURVEY.md §4.2 — with the
    "disk" now being HBM). Rows padded with 0x55 (four het codes) unpack
    to W = 0 and are inert."""
    nb = Wp.shape[1]
    n_tiles = Wp.shape[0] // tile

    def body(i, acc):
        raw = jax.lax.dynamic_slice(Wp, (i * tile, 0), (tile, nb))
        w = kernels.unpack_recode_tile(raw, n=n, compute_dtype="float32")
        bv = jnp.dot(w, V, preferred_element_type=jnp.float32)
        return acc + jax.lax.dot_general(
            w, bv, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(0, n_tiles, body, jnp.zeros_like(V))


def _packed_kv_any(Wp: jax.Array, V: jax.Array, n: int, tile: int,
                   means, pallas: bool) -> jax.Array:
    """Wᵀ(W·V) over the packed stack — fused Pallas kernels when enabled
    (packed-bytes HBM traffic only), else the XLA unpack-per-tile loop."""
    if pallas:
        from eagleeverything_tpu.ops import pallas_packed as pp
        return pp.kernel_matvec(Wp, V, means, n)
    return _packed_kv(Wp, V, n, tile)


def _cg_loop(matvec_h, B: jax.Array, tol: jax.Array,
             maxiter: int, b_norm2: Optional[jax.Array] = None) -> jax.Array:
    """Blocked CG for H·X = B with converged columns frozen (as in
    bigscan.blocked_cg); one while_loop, two GEMMs per iteration.
    ``matvec_h`` applies the full shifted operator H = K/s0 + δI.
    ``b_norm2`` lets a warm-started caller (B here is the residual
    B_orig − H·x0) keep convergence relative to the ORIGINAL right-hand
    side: ‖R0‖ can exceed ‖B_orig‖ under a poor warm start, and testing
    vs ‖R0‖ would then return a looser solve than a cold one."""
    if b_norm2 is None:
        b_norm2 = jnp.sum(B * B, axis=0)
    b_norm2 = jnp.maximum(b_norm2, 1e-30)

    def cond(state):
        _, _, _, rs, k = state
        return (k < maxiter) & jnp.any(rs > tol * tol * b_norm2)

    def body(state):
        X, R, P, rs, k = state
        active = rs > tol * tol * b_norm2
        HP = matvec_h(P)
        pHp = jnp.sum(P * HP, axis=0)
        alpha = jnp.where(active & (pHp > 0),
                          rs / jnp.maximum(pHp, 1e-30), 0.0)
        X = X + P * alpha[None, :]
        R = R - HP * alpha[None, :]
        rs_new = jnp.sum(R * R, axis=0)
        beta = jnp.where(active, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        P = R + P * beta[None, :]
        return X, R, P, rs_new, k + 1

    X0 = jnp.zeros_like(B)
    rs0 = jnp.sum(B * B, axis=0)
    X, _, _, _, _ = jax.lax.while_loop(cond, body, (X0, B, B, rs0, 0))
    return X


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _device_cg_jit(W: jax.Array, B: jax.Array, delta: jax.Array,
                   s0: jax.Array, tol: jax.Array, maxiter: int,
                   b_norm2: Optional[jax.Array] = None) -> jax.Array:
    """Device CG on H = WᵀW/s0 + δI with a dense recoded stack W."""
    return _cg_loop(lambda V: _dense_kv(W, V) / s0 + delta * V,
                    B, tol, maxiter, b_norm2)


@functools.partial(jax.jit, static_argnames=("maxiter", "n_ind"))
def _device_cg_z_jit(W: jax.Array, B: jax.Array, z_idx: jax.Array,
                     delta: jax.Array, s0: jax.Array, tol: jax.Array,
                     maxiter: int, n_ind: int,
                     b_norm2: Optional[jax.Array] = None) -> jax.Array:
    """Record-space device CG on H = Z·(WᵀW)·Zᵀ/s0 + δI — the 0/1
    incidence Z carried as z_idx (see _packed_cg_chunk_z_jit)."""

    def mv(V):
        Vi = jax.ops.segment_sum(V, z_idx, num_segments=n_ind)
        return _dense_kv(W, Vi)[z_idx] / s0 + delta * V

    return _cg_loop(mv, B, tol, maxiter, b_norm2)


@functools.partial(jax.jit, static_argnames=("m", "reorth", "n_ind"))
def _device_lanczos_z_jit(W: jax.Array, Z: jax.Array, z_idx: jax.Array,
                          s0: jax.Array, m: int, reorth: bool, n_ind: int):
    """Record-space device Lanczos on K_eff = Z·(WᵀW)·Zᵀ/s0."""

    def mv(V):
        Vi = jax.ops.segment_sum(V, z_idx, num_segments=n_ind)
        return _dense_kv(W, Vi)[z_idx] / s0

    return _lanczos_loop(mv, Z, m, reorth)


def _cg_chunk_steps(matvec_h, X, R, P, rs, b_norm2, tol, chunk: int):
    """``chunk`` CG iterations with a generic shifted operator —
    identical math to _cg_loop (converged columns frozen), termination
    check hoisted to the host (the caller reads rs between chunks)."""

    def body(_, st):
        X, R, P, rs = st
        active = rs > tol * tol * b_norm2
        HP = matvec_h(P)
        pHp = jnp.sum(P * HP, axis=0)
        alpha = jnp.where(active & (pHp > 0),
                          rs / jnp.maximum(pHp, 1e-30), 0.0)
        X = X + P * alpha[None, :]
        R = R - HP * alpha[None, :]
        rs_new = jnp.sum(R * R, axis=0)
        beta = jnp.where(active, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        P = R + P * beta[None, :]
        return X, R, P, rs_new

    return jax.lax.fori_loop(0, chunk, body, (X, R, P, rs))


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n", "tile", "pallas"))
def _packed_cg_chunk_jit(Wp: jax.Array, X: jax.Array, R: jax.Array,
                         P: jax.Array, rs: jax.Array, b_norm2: jax.Array,
                         delta: jax.Array, s0: jax.Array, tol: jax.Array,
                         means: jax.Array,
                         chunk: int, n: int, tile: int, pallas: bool):
    """``chunk`` CG iterations on the packed stack, one dispatch.

    The full-solve single-dispatch form (a while_loop over hundreds of
    matvecs, each a 12.5 GB HBM pass at 50k×1M) runs multi-minute device
    programs, which this sandbox's relay worker kills; chunking bounds
    each dispatch to a few seconds with the Krylov state staying device-
    resident between calls — the host only reads the (r,) residual block
    to decide convergence."""
    return _cg_chunk_steps(
        lambda P_: _packed_kv_any(Wp, P_, n, tile, means, pallas) / s0
        + delta * P_,
        X, R, P, rs, b_norm2, tol, chunk)


@functools.partial(jax.jit, static_argnames=("n", "tile", "pallas"))
def _packed_cg_step_jit(Wp: jax.Array, means: jax.Array, X: jax.Array,
                        R: jax.Array, P: jax.Array, rs: jax.Array,
                        b_norm2: jax.Array, delta: jax.Array,
                        s0: jax.Array, tol: jax.Array,
                        n: int, tile: int, pallas: bool):
    """ONE CG iteration on the packed stack, one dispatch, state resident.

    The TPU packed path's CG: the host drives the loop but X/R/P stay in
    HBM and only the (r,) residual norms cross the relay per step — the
    host-CG form moved the full (n, r) blocks down AND up every
    iteration (≈25 MB/step at r=64 on a 25–45 MB/s relay, which was the
    measured warm-sweep wall). A single step per dispatch keeps the
    stack out of any loop-carried program (the r4 layout-copy trap bites
    fori_loop bodies that carry state past the stack, not one-shot
    reads)."""
    active = rs > tol * tol * b_norm2
    HP = _packed_kv_any(Wp, P, n, tile, means, pallas) / s0 + delta * P
    pHp = jnp.sum(P * HP, axis=0)
    alpha = jnp.where(active & (pHp > 0),
                      rs / jnp.maximum(pHp, 1e-30), 0.0)
    X = X + P * alpha[None, :]
    R = R - HP * alpha[None, :]
    rs_new = jnp.sum(R * R, axis=0)
    beta = jnp.where(active, rs_new / jnp.maximum(rs, 1e-30), 0.0)
    P = R + P * beta[None, :]
    return X, R, P, rs_new


@functools.partial(jax.jit, static_argnames=("n", "tile", "pallas",
                                             "n_ind"))
def _packed_cg_step_z_jit(Wp: jax.Array, means: jax.Array, z_idx: jax.Array,
                          X: jax.Array, R: jax.Array, P: jax.Array,
                          rs: jax.Array, b_norm2: jax.Array,
                          delta: jax.Array, s0: jax.Array, tol: jax.Array,
                          n: int, tile: int, pallas: bool, n_ind: int):
    """Record-space single CG step (Zmat designs; see _packed_cg_step_jit)."""
    active = rs > tol * tol * b_norm2
    Vi = jax.ops.segment_sum(P, z_idx, num_segments=n_ind)
    HP = _packed_kv_any(Wp, Vi, n, tile, means, pallas)[z_idx] / s0 \
        + delta * P
    pHp = jnp.sum(P * HP, axis=0)
    alpha = jnp.where(active & (pHp > 0),
                      rs / jnp.maximum(pHp, 1e-30), 0.0)
    X = X + P * alpha[None, :]
    R = R - HP * alpha[None, :]
    rs_new = jnp.sum(R * R, axis=0)
    beta = jnp.where(active, rs_new / jnp.maximum(rs, 1e-30), 0.0)
    P = R + P * beta[None, :]
    return X, R, P, rs_new


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n", "tile", "pallas",
                                    "n_ind"))
def _packed_cg_chunk_z_jit(Wp: jax.Array, X: jax.Array, R: jax.Array,
                           P: jax.Array, rs: jax.Array, b_norm2: jax.Array,
                           delta: jax.Array, s0: jax.Array, tol: jax.Array,
                           means: jax.Array, z_idx: jax.Array,
                           chunk: int, n: int, tile: int, pallas: bool,
                           n_ind: int):
    """Record-space CG chunk for Zmat designs: H = Z·K·Zᵀ/s0 + δI where
    the 0/1 incidence Z (one individual per record, api/read.read_zmat's
    validated contract) is carried as the index vector z_idx (n_rec,) —
    Zᵀ·V is a segment-sum and Z·U a gather, so repeated-measures designs
    keep the one-dispatch device Krylov path instead of falling back to
    streamed host CG (VERDICT r3 item 9; reference: the with-Z variants
    of ``calculate_a_and_vara``/``emma.*.w.Z``, SURVEY.md §3.2/§3.3)."""

    def mv(P_):
        Vi = jax.ops.segment_sum(P_, z_idx, num_segments=n_ind)
        KVi = _packed_kv_any(Wp, Vi, n, tile, means, pallas)
        return KVi[z_idx] / s0 + delta * P_

    return _cg_chunk_steps(mv, X, R, P, rs, b_norm2, tol, chunk)


def _lanczos_loop(matvec_k, Z: jax.Array, m: int, reorth: bool):
    """Batched Lanczos on the UNSHIFTED kernel K (one fori_loop; basis
    kept in HBM). Returns (alphas (m,r), betas (m-1,r), z_norm (r,),
    basis (m,n,r)) for bigscan.ShiftedKrylov."""
    n, r = Z.shape
    z_norm = jnp.linalg.norm(Z, axis=0)
    V0 = Z / jnp.maximum(z_norm, 1e-30)[None, :]
    basis = jnp.zeros((m + 1, n, r), jnp.float32).at[0].set(V0)
    alphas = jnp.zeros((m, r), jnp.float32)
    betas = jnp.zeros((m, r), jnp.float32)

    def body(k, st):
        basis, alphas, betas = st
        V = basis[k]
        km1 = jnp.maximum(k - 1, 0)
        V_prev = jnp.where(k > 0, basis[km1], jnp.zeros_like(V))
        beta_prev = jnp.where(k > 0, betas[km1], jnp.zeros((r,), jnp.float32))
        Hv = matvec_k(V)
        alpha = jnp.sum(V * Hv, axis=0)
        Wv = Hv - V * alpha[None, :] - V_prev * beta_prev[None, :]
        if reorth:
            mask = (jnp.arange(m + 1) <= k).astype(jnp.float32)
            coef = jnp.einsum("mnr,nr->mr", basis, Wv) * mask[:, None]
            Wv = Wv - jnp.einsum("mnr,mr->nr", basis, coef)
        beta = jnp.linalg.norm(Wv, axis=0)
        # breakdown guard — see _lanczos_chunk_steps
        ok = beta > 1e-5 * (jnp.abs(alpha) + beta_prev + 1e-3)
        beta = jnp.where(ok, beta, 0.0)
        Vn = jnp.where(ok[None, :], Wv / jnp.maximum(beta, 1e-30), 0.0)
        return (basis.at[k + 1].set(Vn), alphas.at[k].set(alpha),
                betas.at[k].set(beta))

    basis, alphas, betas = jax.lax.fori_loop(0, m, body,
                                             (basis, alphas, betas))
    return alphas, betas[: m - 1], z_norm, basis[:m]


@functools.partial(jax.jit, static_argnames=("m", "reorth"))
def _device_lanczos_jit(W: jax.Array, Z: jax.Array, s0: jax.Array,
                        m: int, reorth: bool):
    """Device Lanczos on K = WᵀW/s0 with a dense recoded stack W."""
    return _lanczos_loop(lambda V: _dense_kv(W, V) / s0, Z, m, reorth)


def _lanczos_chunk_steps(matvec_k, basis, alphas, betas, k0,
                         m: int, reorth: bool, chunk: int):
    """``chunk`` Lanczos steps [k0, k0+chunk) with a generic kernel
    matvec; body identical to _lanczos_loop's."""
    r = basis.shape[2]

    def body(i, st):
        basis, alphas, betas = st
        k = k0 + i
        V = basis[k]
        km1 = jnp.maximum(k - 1, 0)
        V_prev = jnp.where(k > 0, basis[km1], jnp.zeros_like(V))
        beta_prev = jnp.where(k > 0, betas[km1],
                              jnp.zeros((r,), jnp.float32))
        Hv = matvec_k(V)
        alpha = jnp.sum(V * Hv, axis=0)
        Wv = Hv - V * alpha[None, :] - V_prev * beta_prev[None, :]
        if reorth:
            mask = (jnp.arange(m + 1) <= k).astype(jnp.float32)
            coef = jnp.einsum("mnr,nr->mr", basis, Wv) * mask[:, None]
            Wv = Wv - jnp.einsum("mnr,mr->nr", basis, coef)
        beta = jnp.linalg.norm(Wv, axis=0)
        # breakdown guard: a β at the f32 roundoff floor means the column
        # hit an invariant subspace (e.g. rank-deficient Z·K·Zᵀ). Zero the
        # new vector instead of dividing — the tridiagonal decouples there
        # (trailing zero block has no weight in the quadrature/solve) and
        # the already-built space is exact; dividing by ~0 cascades to
        # inf/NaN within a few steps in f32.
        ok = beta > 1e-5 * (jnp.abs(alpha) + beta_prev + 1e-3)
        beta = jnp.where(ok, beta, 0.0)
        Vn = jnp.where(ok[None, :], Wv / jnp.maximum(beta, 1e-30), 0.0)
        return (basis.at[k + 1].set(Vn), alphas.at[k].set(alpha),
                betas.at[k].set(beta))

    return jax.lax.fori_loop(0, chunk, body, (basis, alphas, betas))


@functools.partial(jax.jit, static_argnames=(
    "m", "reorth", "chunk", "n", "tile", "pallas"))
def _packed_lanczos_chunk_jit(Wp: jax.Array, basis: jax.Array,
                              alphas: jax.Array, betas: jax.Array,
                              k0: jax.Array, s0: jax.Array,
                              means: jax.Array,
                              m: int, reorth: bool, chunk: int,
                              n: int, tile: int, pallas: bool):
    """``chunk`` Lanczos steps [k0, k0+chunk) on the packed stack, one
    dispatch — same relay-bounded-dispatch rationale as
    _packed_cg_chunk_jit; the (m+1, n, r) basis stays device-resident
    across chunks."""
    return _lanczos_chunk_steps(
        lambda V: _packed_kv_any(Wp, V, n, tile, means, pallas) / s0,
        basis, alphas, betas, k0, m, reorth, chunk)


@functools.partial(jax.jit, static_argnames=(
    "m", "reorth", "chunk", "n", "tile", "pallas", "n_ind"))
def _packed_lanczos_chunk_z_jit(Wp: jax.Array, basis: jax.Array,
                                alphas: jax.Array, betas: jax.Array,
                                k0: jax.Array, s0: jax.Array,
                                means: jax.Array, z_idx: jax.Array,
                                m: int, reorth: bool, chunk: int,
                                n: int, tile: int, pallas: bool,
                                n_ind: int):
    """Record-space Lanczos chunk on K_eff = Z·K·Zᵀ/s0 (see
    _packed_cg_chunk_z_jit for the z_idx incidence representation)."""

    def mv(V):
        Vi = jax.ops.segment_sum(V, z_idx, num_segments=n_ind)
        return _packed_kv_any(Wp, Vi, n, tile, means, pallas)[z_idx] / s0

    return _lanczos_chunk_steps(mv, basis, alphas, betas, k0,
                                m, reorth, chunk)


@functools.partial(jax.jit, static_argnames=("n", "tile"))
def _packed_kernel_matvec_jit(Wp: jax.Array, V: jax.Array,
                              n: int, tile: int) -> jax.Array:
    """Unnormalized K·V = Wᵀ(W·V) over the packed stack, one dispatch."""
    return _packed_kv(Wp, V, n, tile)


@functools.partial(jax.jit, static_argnames=("n", "tile"))
def _packed_rowmeans_jit(Wp: jax.Array, n: int, tile: int) -> jax.Array:
    """Per-SNP mean dose of valid codes ((p_pad, 1) f32) — the impute
    values the Pallas kernels consume; identical arithmetic to
    kernels.unpack_recode_tile's on-the-fly tile means."""
    nw = Wp.shape[1]
    n_tiles = Wp.shape[0] // tile

    def body(i, out):
        raw = jax.lax.dynamic_slice(Wp, (i * tile, 0), (tile, nw))
        # bitcast → 4-shift uint8 unpack (see kernels.unpack_recode_tile
        # for why the 16-way int32 form is avoided)
        raw8 = jax.lax.bitcast_convert_type(
            raw, jnp.uint8).reshape(tile, -1)
        codes = jnp.stack(
            [(raw8 >> s) & jnp.uint8(3) for s in (0, 2, 4, 6)], axis=2
        ).reshape(tile, -1)[:, :n]
        miss = codes == 3
        g = codes.astype(jnp.float32)
        cnt = jnp.sum(~miss, axis=1)
        s = jnp.sum(jnp.where(miss, 0.0, g), axis=1)
        mean = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 1.0)
        return jax.lax.dynamic_update_slice(out, mean[:, None], (i * tile, 0))

    return jax.lax.fori_loop(
        0, n_tiles, body, jnp.ones((Wp.shape[0], 1), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n", "tile", "q"))
def _packed_matfree_stats_jit(Wp: jax.Array, A: jax.Array, Minv: jax.Array,
                              n: int, tile: int, q: int) -> jax.Array:
    """Fused matfree sweep statistics over the packed stack, one dispatch.

    A = [P̃y, H⁻¹X (q cols), H^(-1/2)Z probes (r cols)] (n, 1+q+r);
    Minv = (XᵀH⁻¹X)⁻¹ (q, q). For every SNP row w: â = w·A[:,0],
    u = w·A[:,1:1+q], Hutchinson diag = mean((w·probes)²), proj = uᵀMinv·u.
    Returns (p_pad, q+3) f32 rows [â, u, diag, proj] — the r probe columns
    are REDUCED ON DEVICE, so the host transfer is (p, q+3) instead of
    (p, 1+q+r): ~30× less device→host traffic per scan iteration
    (reference hot loop: ``calculate_a_and_vara_rcpp``, SURVEY.md §4.2)."""
    nb = Wp.shape[1]
    n_tiles = Wp.shape[0] // tile
    r = A.shape[1] - 1 - q

    def body(i, out):
        raw = jax.lax.dynamic_slice(Wp, (i * tile, 0), (tile, nb))
        w = kernels.unpack_recode_tile(raw, n=n, compute_dtype="float32")
        D = jnp.dot(w, A, preferred_element_type=jnp.float32)
        ahat = D[:, :1]
        U = D[:, 1 : 1 + q]
        WHZ = D[:, 1 + q :]
        diag = jnp.sum(WHZ * WHZ, axis=1, keepdims=True) / r
        proj = jnp.einsum("jq,qr,jr->j", U, Minv, U)[:, None]
        rows = jnp.concatenate([ahat, U, diag, proj], axis=1)
        return jax.lax.dynamic_update_slice(out, rows, (i * tile, 0))

    out0 = jnp.zeros((Wp.shape[0], q + 3), jnp.float32)
    return jax.lax.fori_loop(0, n_tiles, body, out0)


@functools.partial(jax.jit, static_argnames=("q",))
def _stats_from_D_jit(D: jax.Array, Minv: jax.Array, q: int) -> jax.Array:
    """The matfree sweep's per-SNP statistics from a full dot block D
    ((p_pad, 1+q+r), device-resident — the Pallas path's epilogue):
    returns (p_pad, q+3) rows [â, u, diag, proj]."""
    ahat = D[:, :1]
    U = D[:, 1 : 1 + q]
    WHZ = D[:, 1 + q :]
    diag = jnp.sum(WHZ * WHZ, axis=1, keepdims=True) / WHZ.shape[1]
    proj = jnp.einsum("jq,qr,jr->j", U, Minv, U)[:, None]
    return jnp.concatenate([ahat, U, diag, proj], axis=1)


@functools.partial(jax.jit, static_argnames=("n", "tile", "q", "R"))
def _packed_matfree_stats_multi_jit(Wp: jax.Array, A: jax.Array,
                                    Minv: jax.Array, n: int, tile: int,
                                    q: int, R: int) -> jax.Array:
    """R traits' fused matfree sweep statistics in ONE stack pass.

    A = column-concat of R per-trait [P̃y_t, H⁻¹X_t (q), H^(-1/2)probes_t
    (r)] blocks, (n, R·(1+q+r)); Minv (R, q, q). The W·A GEMM serves every
    trait from one read of the resident packed stack — the per-trait HBM
    traffic the serial form paid R× (VERDICT r4 item 2; SURVEY.md §4.3's
    batching rule applied to the packed-stack regime). Returns
    (p_pad, R·(q+3)) rows [â, u, diag, proj] per trait."""
    nb = Wp.shape[1]
    n_tiles = Wp.shape[0] // tile
    c = A.shape[1] // R
    r = c - 1 - q

    def body(i, out):
        raw = jax.lax.dynamic_slice(Wp, (i * tile, 0), (tile, nb))
        w = kernels.unpack_recode_tile(raw, n=n, compute_dtype="float32")
        D = jnp.dot(w, A, preferred_element_type=jnp.float32)
        D3 = D.reshape(tile, R, c)
        ahat = D3[:, :, :1]
        U = D3[:, :, 1 : 1 + q]
        WHZ = D3[:, :, 1 + q :]
        diag = jnp.sum(WHZ * WHZ, axis=2, keepdims=True) / r
        proj = jnp.einsum("jtq,tqk,jtk->jt", U, Minv, U)[..., None]
        rows = jnp.concatenate([ahat, U, diag, proj],
                               axis=2).reshape(tile, R * (q + 3))
        return jax.lax.dynamic_update_slice(out, rows, (i * tile, 0))

    out0 = jnp.zeros((Wp.shape[0], R * (q + 3)), jnp.float32)
    return jax.lax.fori_loop(0, n_tiles, body, out0)


@functools.partial(jax.jit, static_argnames=("q", "R"))
def _stats_from_D_multi_jit(D: jax.Array, Minv: jax.Array, q: int,
                            R: int) -> jax.Array:
    """Multi-trait epilogue on a device-resident dot block D
    ((p_pad, R·(1+q+r)) — the wide Pallas packed_dot output): reduces the
    probe columns per trait on device, returns (p_pad, R·(q+3))."""
    c = D.shape[1] // R
    D3 = D.reshape(D.shape[0], R, c)
    ahat = D3[:, :, :1]
    U = D3[:, :, 1 : 1 + q]
    WHZ = D3[:, :, 1 + q :]
    diag = jnp.sum(WHZ * WHZ, axis=2, keepdims=True) / WHZ.shape[2]
    proj = jnp.einsum("jtq,tqk,jtk->jt", U, Minv, U)[..., None]
    return jnp.concatenate([ahat, U, diag, proj],
                           axis=2).reshape(D.shape[0], R * (q + 3))


@functools.partial(jax.jit, static_argnames=("n", "tile"))
def _packed_sweep_dots_jit(Wp: jax.Array, A: jax.Array,
                           n: int, tile: int) -> jax.Array:
    """Per-SNP dots W·A ((p_pad, r)) over the packed stack, one dispatch
    (the matfree probe sweep without re-streaming the store)."""
    nb = Wp.shape[1]
    n_tiles = Wp.shape[0] // tile

    def body(i, out):
        raw = jax.lax.dynamic_slice(Wp, (i * tile, 0), (tile, nb))
        w = kernels.unpack_recode_tile(raw, n=n, compute_dtype="float32")
        d = jnp.dot(w, A, preferred_element_type=jnp.float32)
        return jax.lax.dynamic_update_slice(out, d, (i * tile, 0))

    out0 = jnp.zeros((Wp.shape[0], A.shape[1]), jnp.float32)
    return jax.lax.fori_loop(0, n_tiles, body, out0)


def _shift_param(delta, r_pad: int) -> np.ndarray:
    """CG shift as a device parameter: a scalar δ, or PER-COLUMN shifts
    (δ_t per trait/permutation — the multi-shift batched solve; operators
    H_t = K/s0 + δ_t·I differ only in the diagonal, and `delta * V`
    broadcasts per column) padded to the padded RHS width. Pad value 1.0
    is inert: padded columns start with rs = 0 and stay frozen."""
    d = np.asarray(delta, dtype=np.float32)
    if d.ndim == 0:
        return d
    out = np.ones(r_pad, np.float32)
    out[: d.shape[0]] = d
    return out


def _pad_cols8(B: np.ndarray) -> np.ndarray:
    """Zero-pad trailing columns to a multiple of 8 so device programs
    keyed on the RHS width don't recompile as the model grows one fixed
    effect per iteration (zero columns are inert: zero norm → frozen)."""
    r = B.shape[1]
    r_pad = -(-r // 8) * 8
    if r_pad == r:
        return B
    return np.pad(B, ((0, 0), (0, r_pad - r)))


class TiledScan:
    """Single-device scan with host→device tile streaming and optional
    on-device W-tile caching (out-of-core path; reference: the per-iteration
    ReadBlock sweep of ``calculate_a_and_vara_rcpp``, SURVEY.md §4.2)."""

    def __init__(self, src: TileSource, config: EagleConfig):
        self.src = src
        self.config = config
        # observability: full passes over the genotype rows (matvecs,
        # sweeps, stat rows) — the unit the relay-bound dispatch budget
        # is spent in; readable by benchmarks/scanlogs
        self.stack_passes = 0
        self.tile_snps = config.resolve_snp_tile(
            src.n, meshlib.pad_to_multiple(src.p, 128))
        itemsize = 2 if config.compute_dtype == "bfloat16" else 4
        cache_bytes = src.p * src.n * itemsize
        # cached W tiles live in device HBM — budgeted by device_cache_gb,
        # NOT the host-RAM availmem knob
        self.cache_device = cache_bytes <= config.device_cache_gb * 1e9 * 0.5
        # when the recoded stack is too big but the 2-BIT PACKED bytes fit
        # (16× smaller than f32), keep the packed store itself resident in
        # HBM and unpack per tile inside the device loops — at 50k×1M the
        # 12.5 GB packed store fits one v5e chip and every sweep/Krylov
        # pass becomes HBM-bound instead of host→device-bound
        self._pstack: Optional[jax.Array] = None
        self._pmeans: Optional[jax.Array] = None
        # fused unpack×GEMM Pallas kernels over the packed stack: auto on
        # TPU (ops/pallas_packed), forceable via config.pallas_packed
        from eagleeverything_tpu.ops import pallas_packed
        self._use_pallas = (
            config.pallas_packed if config.pallas_packed is not None
            else pallas_packed.supports())
        # budget the stack at its PADDED size (Pallas grids need BLK_P/
        # NW_BLK-aligned dims — ≤2.5% overhead at 50k×1M)
        import math
        p_pad0 = -(-src.p // self.tile_snps) * self.tile_snps
        nw0 = -(-(-(-src.n // 4)) // 4)      # int32 words per packed row
        p_pad, nw_est = p_pad0, nw0
        if self._use_pallas:
            blk = math.lcm(self.tile_snps, pallas_packed.BLK_P)
            p_pad = -(-p_pad0 // blk) * blk
            nw_est = -(-nw0 // pallas_packed.NW_BLK) \
                * pallas_packed.NW_BLK
        # r3's uint8-typed stack made XLA stage a full layout copy when
        # entering pallas_call (16.15 GB transient at 12.8 GB → OOM); the
        # int32-typed stack ((8,128)-native tiling) reads in place, so
        # the auto-gate is now only a TOTAL-HBM guard: above ~14 GB of
        # packed bytes the stack + Krylov workspace won't fit 15.75 GB
        # usable v5e HBM regardless of kernel path. Gate BEFORE the
        # cache-eligibility budget, so a store whose smaller XLA-path
        # stack fits isn't declined on the Pallas-padded size (ADVICE r3)
        if (config.pallas_packed is None and self._use_pallas
                and p_pad * nw_est * 4 > 14e9):
            self._use_pallas = False
            p_pad, nw_est = p_pad0, nw0
        packed_bytes = p_pad * nw_est * 4
        self.cache_packed_device = (
            not self.cache_device
            and getattr(src, "raw_packed_tiles", None) is not None
            and packed_bytes <= config.device_cache_gb * 1e9 * 0.9)
        # multi-device: place each streamed tile SNP-sharded over the mesh;
        # jit propagates the sharding through recode/MMt/score and inserts
        # the psum for the MMt contraction (GSPMD) — the streamed analog of
        # ShardedScan for data larger than one chip's HBM
        self._tile_sharding = None
        n_dev = jax.device_count()
        if n_dev > 1 and self.tile_snps % n_dev == 0:
            mesh = meshlib.make_mesh(config.mesh_shape)
            if self.tile_snps % (mesh.shape[meshlib.SNP_AXIS] or 1) == 0:
                self._tile_sharding = meshlib.snp_sharding(mesh)
        # cache entries: (global_snp_offset, valid_rows, device W tile)
        self._wcache: Optional[list[tuple[int, int, jax.Array]]] = None
        self._score = (
            kernels.score_tile_sqrt_bf16
            if config.compute_dtype == "bfloat16"
            else kernels.score_tile_sqrt
        )

    def _packed_stack(self) -> Optional[jax.Array]:
        """The whole 2-bit packed store as ONE device-resident (p_pad,
        ⌈⌈n/4⌉/4⌉) **int32** array (little-endian word view of the byte
        stream: word w holds genotypes 16w+k at bits 2k), or None when
        ineligible. int32 typing matters: XLA's native (8,128) tiling
        for int32 lets pallas_call read the resident buffer in place —
        the r3 uint8 form triggered a full staged layout copy (16.15 GB
        transient at 50k×1M → OOM). Built incrementally with donated
        dynamic_update_slice so peak HBM is 1× the packed size (a
        concatenate would transiently need 2×). Rows p..p_pad are
        0x55555555 (sixteen het codes → W = 0, inert)."""
        if self._pstack is not None:
            return self._pstack
        if not self.cache_packed_device:
            return None
        get_raw = getattr(self.src, "raw_packed_tiles", None)
        it = get_raw(self.tile_snps) if get_raw is not None else None
        if it is None:  # store not packed / rows masked — checked at call
            self.cache_packed_device = False
            return None
        nb = -(-self.src.n // 4)             # real bytes per packed row
        nw = -(-nb // 4)                     # int32 words per stack row
        p_pad = -(-self.src.p // self.tile_snps) * self.tile_snps
        if self._use_pallas:
            # the Pallas grid needs BLK_P/NW_BLK-aligned dims; extra pad
            # words are 0x55… (inert) and pad plane positions are masked
            # by to_plane/from_plane — ≤2.5% HBM overhead at 50k×1M
            from eagleeverything_tpu.ops import pallas_packed as pp
            import math
            p_pad = -(-p_pad // math.lcm(self.tile_snps, pp.BLK_P)) \
                * math.lcm(self.tile_snps, pp.BLK_P)
            nw = -(-nw // pp.NW_BLK) * pp.NW_BLK
        upd = jax.jit(
            lambda buf, t, o: jax.lax.dynamic_update_slice(buf, t, (o, 0)),
            donate_argnums=(0,))
        buf = jnp.full((p_pad, nw), 0x55555555, dtype=jnp.int32)
        verbose = os.environ.get("EAGLE_STACK_PROGRESS") == "1"
        import time as _time
        t0 = _time.perf_counter()
        done_rows = 0
        for j0, raw in it:  # shard-bounded tiles: contiguous, varying b
            # uint8 (b, nb) tile → little-endian int32 (b, nw) words
            # (x86 host is little-endian, so a view is the right bits)
            wb = np.full((raw.shape[0], nw * 4), 0x55, dtype=np.uint8)
            wb[:, : raw.shape[1]] = raw
            buf = upd(buf, jnp.asarray(wb.view(np.int32)), j0)
            done_rows = j0 + raw.shape[0]
            if verbose and (done_rows // self.tile_snps) % 64 == 0:
                jax.block_until_ready(buf)
                el = _time.perf_counter() - t0
                print(f"[packed-stack] {done_rows}/{self.src.p} SNPs "
                      f"({el:.0f}s, "
                      f"{done_rows * raw.shape[1] / max(el, 1e-9) / 1e6:.0f}"
                      f" MB/s)", flush=True)
        jax.block_until_ready(buf)
        self._pstack = buf
        if self._use_pallas:
            self._pmeans = _packed_rowmeans_jit(
                buf, n=self.src.n, tile=self.tile_snps)
        return buf

    def _pallas_state(self) -> tuple[jax.Array, bool]:
        """(means, pallas_on) for the packed-kernel dispatch — a dummy
        (1,1) means block when the Pallas path is off (inert operand)."""
        if self._use_pallas and self._pmeans is not None:
            return self._pmeans, True
        return jnp.zeros((1, 1), jnp.float32), False

    def _device_tiles(self) -> Iterator[tuple[int, int, jax.Array]]:
        if self.cache_packed_device:
            Wp = self._packed_stack()
            if Wp is not None:
                # resident packed bytes: unpack per tile on device — no
                # host→device traffic, uniform tile chunking
                for t0 in range(0, self.src.p, self.tile_snps):
                    b = min(self.tile_snps, self.src.p - t0)
                    w = kernels.unpack_recode_tile(
                        Wp[t0 : t0 + self.tile_snps], n=self.src.n,
                        compute_dtype=self.config.compute_dtype)
                    yield t0, b, w
                return
        if getattr(self, "_wstack", None) is not None:
            # the W stack superseded the per-tile cache (same bytes once,
            # not twice) — serve tiles as row slices of it
            off = 0
            for j0, b in self._wstack_meta:
                yield j0, b, self._wstack[off : off + self.tile_snps]
                off += self.tile_snps
            return
        if self._wcache is not None:
            yield from self._wcache
            return
        cache = [] if self.cache_device else None

        # 2-bit packed stores ship raw bytes and unpack on-device (4× less
        # H2D); pad rows with 0x55 = four het codes → W = 0, inert
        raw_iter = None
        get_raw = getattr(self.src, "raw_packed_tiles", None)
        if get_raw is not None:
            raw_iter = get_raw(self.tile_snps)

        # EAGLE_SYNC_STREAM=1: issue every device op from the CALLING
        # thread (no producer thread / no H2D-compute overlap). Fallback
        # for PJRT transports that deadlock on device ops from secondary
        # threads — observed on this sandbox's relay backend in degraded
        # states; harmless elsewhere (just loses the overlap).
        import os as _os
        if _os.environ.get("EAGLE_SYNC_STREAM") == "1":
            if raw_iter is not None:
                for j0, raw in raw_iter:
                    b = raw.shape[0]
                    if b < self.tile_snps:
                        pad = np.full((self.tile_snps - b, raw.shape[1]),
                                      0x55, dtype=np.uint8)
                        raw = np.vstack([raw, pad])
                    w = kernels.unpack_recode_tile(
                        jnp.asarray(raw), n=self.src.n,
                        compute_dtype=self.config.compute_dtype)
                    if cache is not None:
                        cache.append((j0, b, w))
                    yield j0, b, w
            else:
                for j0, tile in self.src.tiles(self.tile_snps):
                    b = tile.shape[0]
                    w = kernels.recode_impute_tile(
                        jnp.asarray(_pad_tile(tile, self.tile_snps)),
                        compute_dtype=self.config.compute_dtype)
                    if cache is not None:
                        cache.append((j0, b, w))
                    yield j0, b, w
            if cache is not None:
                self._wcache = cache
            return

        # double-buffered host→device streaming: a producer thread reads
        # the next tile from the store and enqueues its H2D transfer while
        # the device computes on the current one (the rebuild's overlap of
        # ReadBlock I/O with GEMM, SURVEY.md §3.3 "ReadBlock streaming")
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            try:
                if raw_iter is not None:
                    for j0, raw in raw_iter:
                        b = raw.shape[0]
                        if b < self.tile_snps:
                            pad = np.full(
                                (self.tile_snps - b, raw.shape[1]),
                                0x55, dtype=np.uint8)
                            raw = np.vstack([raw, pad])
                        g = (jax.device_put(raw, self._tile_sharding)
                             if self._tile_sharding is not None
                             else jnp.asarray(raw))
                        q.put((j0, b, g, True))
                else:
                    for j0, tile in self.src.tiles(self.tile_snps):
                        b = tile.shape[0]
                        padded = _pad_tile(tile, self.tile_snps)
                        g = (jax.device_put(padded, self._tile_sharding)
                             if self._tile_sharding is not None
                             else jnp.asarray(padded))
                        q.put((j0, b, g, False))
                q.put(None)
            except BaseException as e:  # surface I/O errors to the consumer
                q.put(e)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            j0, b, g, packed = item
            if packed:
                w = kernels.unpack_recode_tile(
                    g, n=self.src.n,
                    compute_dtype=self.config.compute_dtype)
            else:
                w = kernels.recode_impute_tile(
                    g, compute_dtype=self.config.compute_dtype)
            if cache is not None:
                cache.append((j0, b, w))
            yield j0, b, w
        th.join()
        if cache is not None:
            self._wcache = cache

    def compute_K(self) -> np.ndarray:
        n = self.src.n
        K = jnp.zeros((n, n), dtype=jnp.float32)
        for _, _, w in self._device_tiles():
            K = kernels.mmt_accumulate(K, w)  # padded rows are W=0: inert
        return np.asarray(jax.device_get(K), dtype=np.float64)

    def sweep(self, Lp: np.ndarray, Py: np.ndarray, sigma2_g: float) -> np.ndarray:
        """Score all SNPs given the projector factor Lp (P̃ = Lp·Lpᵀ)."""
        Lp_d = jnp.asarray(Lp, dtype=jnp.float32)
        Py_d = jnp.asarray(Py, dtype=jnp.float32)
        s2g = jnp.float32(sigma2_g)
        out = np.empty(self.src.p)
        for j0, b, w in self._device_tiles():
            out[j0 : j0 + b] = np.asarray(self._score(w, Lp_d, Py_d, s2g))[:b]
        return out

    # ---- eigenbasis sweep: U device-resident, T = Wt·U cached per tile,
    # per-iteration device work is O(p·n·q) skinny ops only
    def set_eigenbasis(self, U_eff: np.ndarray) -> None:
        """Place the (possibly Zᵀ-projected) eigenbasis on device once per
        scan; subsequent sweeps take only O(n·q) per-iteration inputs."""
        self._U_dev = jnp.asarray(U_eff, dtype=jnp.float32)
        self._tcache: Optional[list[tuple[int, int, jax.Array]]] = None

    def _T_tiles(self) -> Iterator[tuple[int, int, jax.Array]]:
        """Eigenbasis tiles T = Wt·U — iteration-invariant, so cached on
        device; the W-tile cache is released once T exists (same bytes)."""
        if self._tcache is not None:
            yield from self._tcache
            return
        cache = [] if self.cache_device else None
        for j0, b, w in self._device_tiles():
            T = kernels.eig_T_tile(w, self._U_dev)
            if cache is not None:
                cache.append((j0, b, T))
            yield j0, b, T
        if cache is not None:
            self._tcache = cache
            self._wcache = None  # W no longer needed by the exact scan

    def sweep_eig(self, s: np.ndarray, Q: np.ndarray, z3: np.ndarray,
                  sigma2_g: float) -> np.ndarray:
        """Eigenbasis score sweep on the cached T tiles
        (kernels.score_from_T); s, Q, z3 are the host-f64 per-iteration
        state."""
        s_d = jnp.asarray(s, jnp.float32)
        Q_d = jnp.asarray(Q, jnp.float32)
        z3_d = jnp.asarray(z3, jnp.float32)
        s2g = jnp.float32(sigma2_g)
        out = np.empty(self.src.p)
        for j0, b, T in self._T_tiles():
            out[j0 : j0 + b] = np.asarray(
                kernels.score_from_T(T, s_d, Q_d, z3_d, s2g))[:b]
        return out

    def sweep_eig_batched(self, s: np.ndarray, Q: np.ndarray,
                          z3: np.ndarray, sigma2_g: np.ndarray) -> np.ndarray:
        """Batched eigenbasis sweep: s (R,n), Q (R,n,q), z3 (R,n) → (R,p).
        The cached T tiles are shared across the whole batch."""
        s_d = jnp.asarray(s, jnp.float32)
        Q_d = jnp.asarray(Q, jnp.float32)
        z3_d = jnp.asarray(z3, jnp.float32)
        s2g = jnp.asarray(sigma2_g, jnp.float32)
        R = s_d.shape[0]
        out = np.empty((R, self.src.p))
        for j0, b, T in self._T_tiles():
            out[:, j0 : j0 + b] = np.asarray(
                kernels.score_from_T_batched(T, s_d, Q_d, z3_d, s2g))[:, :b]
        return out

    def kernel_matvec(self, V: np.ndarray) -> np.ndarray:
        """Raw-kernel matvec MMt·V (V (n, r)) via streamed tiles — K is
        never materialized (biobank n; docs/design_biobank_scale.md)."""
        self.stack_passes += 1
        V_d = jnp.asarray(V, dtype=jnp.float32)
        if self.cache_packed_device:
            Wp = self._packed_stack()
            if Wp is not None:  # one dispatch over the resident bytes
                means, pallas = self._pallas_state()
                if pallas:
                    from eagleeverything_tpu.ops import pallas_packed as pp
                    acc = pp.kernel_matvec(Wp, V_d, means, self.src.n)
                else:
                    acc = _packed_kernel_matvec_jit(
                        Wp, V_d, n=self.src.n, tile=self.tile_snps)
                return np.asarray(acc, dtype=np.float64)
        acc = jnp.zeros((self.src.n, V_d.shape[1]), dtype=jnp.float32)
        for _, _, w in self._device_tiles():
            acc = acc + kernels.kernel_matvec_tile(w, V_d)
        return np.asarray(acc, dtype=np.float64)

    def _w_stack(self) -> Optional[jax.Array]:
        """All W tiles as one device-resident (p_pad, n) array (padded rows
        are W=0, inert under WᵀW·V). None when HBM caching is off. The
        stack REPLACES the per-tile cache (transient 2× during the
        concatenate, steady-state 1×); _device_tiles then yields slices."""
        if not self.cache_device:
            return None
        if getattr(self, "_wstack", None) is None:
            tiles = list(self._device_tiles())
            meta = [(j0, b) for j0, b, _ in tiles]
            stack = jnp.concatenate([w for _, _, w in tiles], axis=0)
            del tiles
            self._wcache = None
            self._wstack, self._wstack_meta = stack, meta
        return self._wstack

    def _h_apply_host(self, X: np.ndarray, delta: float, s0: float,
                      z_idx: Optional[np.ndarray]) -> np.ndarray:
        """H·X on the host for warm-start residuals — record space when a
        Zmat index is given (H = Z·K·Zᵀ/s0 + δI), else individual space."""
        if z_idx is None:
            return self.kernel_matvec(X) / s0 + delta * X
        Vi = np.zeros((self.src.n, X.shape[1]))
        np.add.at(Vi, z_idx, X)
        return self.kernel_matvec(Vi)[z_idx] / s0 + delta * X

    def device_cg(self, B: np.ndarray, delta: float, s0: float,
                  tol: float = 1e-6, maxiter: int = 400,
                  x0: Optional[np.ndarray] = None,
                  z_idx: Optional[np.ndarray] = None
                  ) -> Optional[np.ndarray]:
        """Solve (WᵀW/s0 + δI)·X = B with the ENTIRE CG loop in one jitted
        device program (lax.while_loop) — the matrix-free engine's Krylov
        iterations without one host↔device dispatch per matvec. Returns
        None when the genotype tiles aren't device-cached (caller falls
        back to the streamed host CG). f32 end-to-end, so tol is floored
        at 1e-6; the host CG's matvec is f32 too, so the achievable
        accuracy is the same (reference hot loop: SURVEY.md §3.3's
        ``calculate_a_and_vara``-era Eigen solves, re-aimed at CG).
        ``x0`` warm-starts the iteration (one extra matvec dispatch to
        form the initial residual; convergence is still vs ‖B‖).
        ``z_idx`` (record → individual index of a 0/1 incidence Zmat)
        switches the operator to record space H = Z·K·Zᵀ/s0 + δI — the
        repeated-measures designs keep the device Krylov path."""
        r = B.shape[1]
        if x0 is not None and x0.shape != B.shape:
            x0 = None
        zi = (jnp.asarray(z_idx, jnp.int32) if z_idx is not None else None)
        W = self._w_stack()
        if W is not None:
            # convergence stays relative to the ORIGINAL ‖B‖ even in the
            # warm-started residual form (a poor warm start can make
            # ‖R0‖ > ‖B‖, which would otherwise loosen the solve)
            bn2 = jnp.sum(jnp.asarray(_pad_cols8(B), jnp.float32) ** 2,
                          axis=0)
            if x0 is not None:
                # residual-form warm start: H·D = B − H·x0, X = x0 + D
                R0 = B - self._h_apply_host(x0, delta, s0, z_idx)
            else:
                R0, x0 = B, np.zeros_like(B)
            R0p = _pad_cols8(R0)
            dlt = jnp.asarray(_shift_param(delta, R0p.shape[1]))
            if zi is not None:
                D = _device_cg_z_jit(
                    W, jnp.asarray(R0p, jnp.float32), zi,
                    dlt, jnp.float32(s0),
                    jnp.float32(max(tol, 1e-6)), maxiter, self.src.n,
                    b_norm2=bn2)
            else:
                D = _device_cg_jit(
                    W, jnp.asarray(R0p, jnp.float32),
                    dlt, jnp.float32(s0),
                    jnp.float32(max(tol, 1e-6)), maxiter, b_norm2=bn2)
            return x0 + np.asarray(D, dtype=np.float64)[:, :r]
        Wp = self._packed_stack()
        if Wp is None:
            return None
        if jax.default_backend() == "tpu":
            # The loop-carried chunk programs are RETIRED on TPU for the
            # int32 stack: XLA's layout assignment prefers a transposed
            # stack inside fori_loop bodies and inserts an 11.9 GB
            # whole-stack copy (OOM at 50k×1M; measured r4). Instead:
            # HOST-ORCHESTRATED, DEVICE-RESIDENT CG — one single-step
            # jitted program per iteration (_packed_cg_step_jit; the
            # stack enters each dispatch as a one-shot read, so no
            # layout trap), with X/R/P resident in HBM and only the (r,)
            # residual norms fetched per step. This retires the r4 form
            # (host CG round-tripping the full (n, r) block per matvec —
            # ~25 MB/step at r=64 through the relay, the measured
            # warm-sweep wall).
            means, pallas = self._pallas_state()
            r_pad = _pad_cols8(B).shape[1]
            bn2_np = np.maximum(
                np.sum(_pad_cols8(B).astype(np.float32) ** 2, axis=0),
                1e-30)
            if x0 is not None:
                R0 = B - self._h_apply_host(x0, delta, s0, z_idx)
            else:
                R0, x0 = B, np.zeros_like(B)
            Rd = jnp.asarray(_pad_cols8(R0), jnp.float32)
            Xd = jnp.zeros_like(Rd)
            Pd = Rd
            rs = jnp.sum(Rd * Rd, axis=0)
            bn2 = jnp.asarray(bn2_np, jnp.float32)
            dlt = jnp.asarray(_shift_param(delta, r_pad))
            tol_e = max(tol, 1e-6)
            tol_d = jnp.float32(tol_e)
            # stall detection: the f32 matvec floors the reachable
            # residual; once no active column has QUARTERED its norm² in
            # 10 steps, further iterations only burn dispatches
            floor = np.asarray(rs, dtype=np.float64)
            since = 0
            for it_cg in range(maxiter):
                # convergence/stall test every OTHER step: np.asarray(rs)
                # forces a device sync per call, and converged columns
                # are frozen on-device anyway, so one overshoot step is
                # cheaper than a sync per step on the relay
                if it_cg % 2 == 0:
                    rs_h = np.asarray(rs, dtype=np.float64)
                    if not np.any(rs_h > tol_e * tol_e * bn2_np):
                        break
                    if np.all(rs_h >= 0.25 * floor):
                        since += 1
                        if since >= 5:
                            break
                    else:
                        since = 0
                    floor = np.minimum(floor, rs_h)
                if zi is not None:
                    Xd, Rd, Pd, rs = _packed_cg_step_z_jit(
                        Wp, means, zi, Xd, Rd, Pd, rs, bn2, dlt,
                        jnp.float32(s0), tol_d, n=self.src.n,
                        tile=self.tile_snps, pallas=pallas,
                        n_ind=self.src.n)
                else:
                    Xd, Rd, Pd, rs = _packed_cg_step_jit(
                        Wp, means, Xd, Rd, Pd, rs, bn2, dlt,
                        jnp.float32(s0), tol_d, n=self.src.n,
                        tile=self.tile_snps, pallas=pallas)
                self.stack_passes += 1
            return x0 + np.asarray(Xd, dtype=np.float64)[:, :r]
        chunk = max(1, int(os.environ.get("EAGLE_PACKED_CHUNK", "8")))
        B_d = jnp.asarray(_pad_cols8(B), jnp.float32)
        b_norm2 = jnp.maximum(jnp.sum(B_d * B_d, axis=0), 1e-30)
        tol_d = jnp.float32(max(tol, 1e-6))
        if x0 is not None:
            # warm init of the CG state: X = x0, R = P = B − H·x0; the
            # convergence check keeps b_norm2 from the ORIGINAL B, so the
            # result meets the same relative tolerance as a cold solve
            R0 = np.asarray(_pad_cols8(
                B - self._h_apply_host(x0, delta, s0, z_idx)))
            R0_d = jnp.asarray(R0, jnp.float32)
            st = (jnp.asarray(_pad_cols8(x0), jnp.float32), R0_d, R0_d,
                  jnp.sum(R0_d * R0_d, axis=0))
        else:
            st = (jnp.zeros_like(B_d), B_d, B_d, jnp.sum(B_d * B_d, axis=0))
        done = 0
        # Pallas stays OUT of the loop-carried chunk programs: inside a
        # fori_loop the custom call's forced operand layouts propagate
        # into the carried state and XLA inserts padded layout copies
        # (measured at 50k×1M: r-minor basis 16×-padded to 2.88 GB +
        # the (p,1) means 128×-padded to 0.48 GB → 16.15 G > 15.75 G).
        # The XLA unpack chunks are relay-dispatch-bound anyway; the
        # Pallas 7.7× win is taken by the ONE-DISPATCH callers
        # (kernel_matvec, matfree_stat_rows, sweep_dots, and the host
        # Lanczos loop — see device_lanczos).
        means, pallas = jnp.zeros((1, 1), jnp.float32), False
        dlt = jnp.asarray(_shift_param(delta, int(B_d.shape[1])))
        while done < maxiter:
            if zi is not None:
                st = _packed_cg_chunk_z_jit(
                    Wp, *st, b_norm2, dlt, jnp.float32(s0),
                    tol_d, means, zi, chunk=min(chunk, maxiter - done),
                    n=self.src.n, tile=self.tile_snps, pallas=pallas,
                    n_ind=self.src.n)
            else:
                st = _packed_cg_chunk_jit(
                    Wp, *st, b_norm2, dlt, jnp.float32(s0),
                    tol_d, means, chunk=min(chunk, maxiter - done),
                    n=self.src.n, tile=self.tile_snps, pallas=pallas)
            done += chunk
            rs = np.asarray(st[3])  # (r,) — the only host read per chunk
            if not np.any(rs > max(tol, 1e-6) ** 2 * np.asarray(b_norm2)):
                break
        return np.asarray(st[0], dtype=np.float64)[:, :r]

    def device_lanczos(self, Z: np.ndarray, m: int, reorth: bool,
                       s0: float, z_idx: Optional[np.ndarray] = None):
        """One-dispatch batched Lanczos on K = WᵀW/s0 (device-resident
        basis). Returns (alphas, betas, z_norm — host f64; basis — device
        (m,n,r) f32) or None when tiles aren't HBM-cached. Columns are
        zero-padded to a multiple of 8 (inert) to bound recompiles.
        ``z_idx`` switches to the record-space kernel Z·K·Zᵀ/s0 (Zmat
        designs; see device_cg)."""
        n_rows = Z.shape[0]
        zi = (jnp.asarray(z_idx, jnp.int32) if z_idx is not None else None)
        W = self._w_stack()
        if W is not None:
            if zi is not None:
                a, b, zn, basis = _device_lanczos_z_jit(
                    W, jnp.asarray(_pad_cols8(Z), jnp.float32), zi,
                    jnp.float32(s0), min(m, n_rows), bool(reorth),
                    self.src.n)
            else:
                a, b, zn, basis = _device_lanczos_jit(
                    W, jnp.asarray(_pad_cols8(Z), jnp.float32),
                    jnp.float32(s0), min(m, n_rows), bool(reorth))
            return (np.asarray(a, np.float64), np.asarray(b, np.float64),
                    np.asarray(zn, np.float64), basis)
        Wp = self._packed_stack()
        if Wp is None:
            return None
        if jax.default_backend() == "tpu":
            # Retired on TPU like the CG chunk path (see device_cg): the
            # fori_loop form transpose-copies the 11.9 GB int32 stack.
            # ShiftedKrylov's host Lanczos fallback runs one
            # kernel_matvec dispatch per step (Pallas fused when on) +
            # f64 reorthogonalization — measured faster per pass than
            # the chunked XLA loop ever was.
            return None
        m = min(m, n_rows)
        chunk = max(1, int(os.environ.get("EAGLE_PACKED_CHUNK", "8")))
        Z_d = jnp.asarray(_pad_cols8(Z), jnp.float32)
        n_, r = Z_d.shape
        z_norm = jnp.linalg.norm(Z_d, axis=0)
        V0 = Z_d / jnp.maximum(z_norm, 1e-30)[None, :]
        basis = jnp.zeros((m + 1, n_, r), jnp.float32).at[0].set(V0)
        alphas = jnp.zeros((m, r), jnp.float32)
        betas = jnp.zeros((m, r), jnp.float32)
        means, pallas = self._pallas_state()
        for k0 in range(0, m, chunk):
            if zi is not None:
                basis, alphas, betas = _packed_lanczos_chunk_z_jit(
                    Wp, basis, alphas, betas, jnp.int32(k0),
                    jnp.float32(s0), means, zi, m=m, reorth=bool(reorth),
                    chunk=min(chunk, m - k0), n=self.src.n,
                    tile=self.tile_snps, pallas=pallas, n_ind=self.src.n)
            else:
                basis, alphas, betas = _packed_lanczos_chunk_jit(
                    Wp, basis, alphas, betas, jnp.int32(k0),
                    jnp.float32(s0), means, m=m, reorth=bool(reorth),
                    chunk=min(chunk, m - k0), n=self.src.n,
                    tile=self.tile_snps, pallas=pallas)
        return (np.asarray(alphas, np.float64),
                np.asarray(betas, np.float64)[: m - 1],
                np.asarray(z_norm, np.float64), basis[:m])

    def sweep_dots(self, A: np.ndarray) -> np.ndarray:
        """Per-SNP dot products Wᵀ·A ((p, r)) via streamed tiles."""
        if self.cache_packed_device:
            Wp = self._packed_stack()
            if Wp is not None:  # one dispatch; rows map 1:1 to SNPs.
                # A's width is 1+q+r and q grows each iteration — pad to
                # a multiple of 8 so the jitted program doesn't recompile
                # per forward-selection step (zero cols are inert).
                r = A.shape[1]
                means, pallas = self._pallas_state()
                if pallas:
                    # the Pallas kernel re-tiles over the packed words and
                    # has no XLA unrolled-loop compile wall — wide blocks
                    # ride ONE stack pass (a (p,136) request costs one
                    # 12.5 GB HBM read, not four; VERDICT r4 weak 6)
                    from eagleeverything_tpu.ops import pallas_packed as pp
                    A8 = jnp.asarray(_pad_cols8(A), jnp.float32)
                    nw = Wp.shape[1]
                    A3 = pp.to_plane(A8, self.src.n, nw).reshape(
                        pp.PLANES, nw, A8.shape[1])
                    out = pp.packed_dot(Wp, A3, means)
                    return np.asarray(out, dtype=np.float64)[
                        : self.src.p, :r]
                # XLA unpack path: width CAPPED at 40 columns per
                # dispatch — the one-shot (p, 136)-output form of this
                # program twice hit a >18-minute XLA compile wall at
                # 50k×1M (r3), so wide blocks are column-chunked; each
                # chunk re-reads the resident stack (HBM-bound, ~1 s at
                # 12.5 GB), noise next to a multi-minute compile. The
                # engine's default per-iteration pass is
                # matfree_stat_rows' (p, 3+q8) fused program, NOT this.
                ch = 40
                if A.shape[1] > ch:
                    parts = [self.sweep_dots(A[:, c0 : c0 + ch])
                             for c0 in range(0, A.shape[1], ch)]
                    return np.concatenate(parts, axis=1)
                A8 = jnp.asarray(_pad_cols8(A), jnp.float32)
                out = _packed_sweep_dots_jit(
                    Wp, A8, n=self.src.n, tile=self.tile_snps)
                return np.asarray(out, dtype=np.float64)[: self.src.p, :r]
        A_d = jnp.asarray(A, dtype=jnp.float32)
        out = np.empty((self.src.p, A.shape[1]))
        for j0, b, w in self._device_tiles():
            out[j0 : j0 + b] = np.asarray(
                kernels.sweep_dots_tile(w, A_d))[:b]
        return out

    def matfree_stat_rows(
        self, A: np.ndarray, q: int, XtHiX_inv: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Per-SNP matfree sweep statistics (â, u, Hutchinson diag, proj)
        for A = [P̃y, H⁻¹X, H^(-1/2)·probes] — the bigscan sweep's device
        pass. With the packed stack resident, the probe block is reduced
        ON DEVICE (one dispatch, (p, q+3) transfer); otherwise one
        streamed sweep_dots pass + host reduction. q is padded to a
        multiple of 8 in the fused path so the program doesn't recompile
        as the model grows (zero u/Minv columns are inert)."""
        self.stack_passes += 1
        if self.cache_packed_device:
            Wp = self._packed_stack()
            if Wp is not None:
                r = A.shape[1] - 1 - q
                q8 = -(-max(q, 1) // 8) * 8
                A_pad = np.zeros((A.shape[0], 1 + q8 + r))
                A_pad[:, 0] = A[:, 0]
                A_pad[:, 1 : 1 + q] = A[:, 1 : 1 + q]
                A_pad[:, 1 + q8 :] = A[:, 1 + q :]
                M_pad = np.zeros((q8, q8))
                M_pad[:q, :q] = XtHiX_inv
                means, pallas = self._pallas_state()
                if pallas:
                    # fused Pallas dot → on-device probe reduction; the
                    # (p, 1+q8+r) D block never leaves HBM
                    from eagleeverything_tpu.ops import pallas_packed as pp
                    nw = Wp.shape[1]
                    A_d = jnp.asarray(A_pad, jnp.float32)
                    A3 = pp.to_plane(A_d, self.src.n, nw).reshape(
                        pp.PLANES, nw, A_d.shape[1])
                    D = pp.packed_dot(Wp, A3, means)
                    out = np.asarray(_stats_from_D_jit(
                        D, jnp.asarray(M_pad, jnp.float32), q=q8),
                        dtype=np.float64)[: self.src.p]
                else:
                    out = np.asarray(
                        _packed_matfree_stats_jit(
                            Wp, jnp.asarray(A_pad, jnp.float32),
                            jnp.asarray(M_pad, jnp.float32),
                            n=self.src.n, tile=self.tile_snps, q=q8),
                        dtype=np.float64)[: self.src.p]
                return (out[:, 0], out[:, 1 : 1 + q],
                        out[:, 1 + q8], out[:, 2 + q8])
        D = self.sweep_dots(A)
        ahat = D[:, 0]
        U = D[:, 1 : 1 + q]
        WHZ = D[:, 1 + q :]
        diag = np.mean(WHZ * WHZ, axis=1)
        proj = np.einsum("jq,qr,jr->j", U, XtHiX_inv, U)
        return ahat, U, diag, proj

    def matfree_stat_rows_multi(
        self, A_list: list[np.ndarray], q_list: list[int],
        Minv_list: list[np.ndarray],
    ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """R traits'/permutations' sweep statistics from ONE pass over the
        genotype rows (matfree_stat_rows batched along a trait axis —
        SURVEY.md §4.3's batching rule; VERDICT r4 item 2).

        A_list[t] = [P̃y_t, H⁻¹X_t (q_t cols), H^(-1/2)probes_t (r cols)]
        with a COMMON probe count r; q_t may differ (selections diverge
        across traits) — every trait is padded to a shared multiple-of-8
        q so the device program compiles once per (R, q8, r) and zero
        columns stay inert. Returns per-trait (ahat, U, diag, proj), rows
        local to this process on a multi-host backend (like
        matfree_stat_rows)."""
        R = len(A_list)
        if R == 1:
            return [self.matfree_stat_rows(A_list[0], q_list[0],
                                           Minv_list[0])]
        # width cap: a large permutation chunk × wide probe blocks can
        # request thousands of columns; sub-batch so one pass stays
        # within the device working set (each sub-batch is still ONE
        # stack pass for its traits)
        cap = int(os.environ.get("EAGLE_MULTI_STAT_COLS", "640"))
        c_est = 1 + (-(-max(max(q_list), 1) // 8) * 8) \
            + (A_list[0].shape[1] - 1 - q_list[0])
        if R * c_est > cap and R > 1:
            half = max(1, cap // c_est) if cap // c_est >= 1 else 1
            out = []
            for s in range(0, R, half):
                out.extend(self.matfree_stat_rows_multi(
                    A_list[s : s + half], q_list[s : s + half],
                    Minv_list[s : s + half]))
            return out
        self.stack_passes += 1
        r = A_list[0].shape[1] - 1 - q_list[0]
        n_rec = A_list[0].shape[0]
        q8 = -(-max(max(q_list), 1) // 8) * 8
        c = 1 + q8 + r
        A_cat = np.zeros((n_rec, R * c))
        M_cat = np.zeros((R, q8, q8))
        for t in range(R):
            qt = q_list[t]
            assert A_list[t].shape[1] - 1 - qt == r, \
                "matfree_stat_rows_multi needs a common probe count"
            A_cat[:, t * c] = A_list[t][:, 0]
            A_cat[:, t * c + 1 : t * c + 1 + qt] = A_list[t][:, 1 : 1 + qt]
            A_cat[:, t * c + 1 + q8 : (t + 1) * c] = A_list[t][:, 1 + qt :]
            M_cat[t, :qt, :qt] = Minv_list[t]
        if self.cache_packed_device:
            Wp = self._packed_stack()
            if Wp is not None:
                means, pallas = self._pallas_state()
                if pallas:
                    # wide fused Pallas dot (no XLA compile wall) + the
                    # on-device multi-trait probe reduction: the
                    # (p, R·c) D block never leaves HBM
                    from eagleeverything_tpu.ops import pallas_packed as pp
                    nw = Wp.shape[1]
                    A_d = jnp.asarray(A_cat, jnp.float32)
                    A3 = pp.to_plane(A_d, self.src.n, nw).reshape(
                        pp.PLANES, nw, A_d.shape[1])
                    D = pp.packed_dot(Wp, A3, means)
                    out = np.asarray(_stats_from_D_multi_jit(
                        D, jnp.asarray(M_cat, jnp.float32), q=q8, R=R),
                        dtype=np.float64)[: self.src.p]
                else:
                    out = np.asarray(_packed_matfree_stats_multi_jit(
                        Wp, jnp.asarray(A_cat, jnp.float32),
                        jnp.asarray(M_cat, jnp.float32),
                        n=self.src.n, tile=self.tile_snps, q=q8, R=R),
                        dtype=np.float64)[: self.src.p]
                w = q8 + 3
                return [(out[:, t * w], out[:, t * w + 1 : t * w + 1 + qt],
                         out[:, t * w + 1 + q8], out[:, t * w + 2 + q8])
                        for t, qt in enumerate(q_list)]
        # streamed fallback: ONE sweep_dots pass over the concatenated
        # block (the store is still read once for all traits), host
        # per-trait reductions
        D = self.sweep_dots(A_cat)
        res = []
        for t, qt in enumerate(q_list):
            Dt = D[:, t * c : (t + 1) * c]
            ahat = Dt[:, 0]
            U = Dt[:, 1 : 1 + qt]
            WHZ = Dt[:, 1 + q8 :]
            diag = np.mean(WHZ * WHZ, axis=1)
            proj = np.einsum("jq,qr,jr->j", U, Minv_list[t], U)
            res.append((ahat, U, diag, proj))
        return res

    def sweep_batched(
        self, Lp: np.ndarray, Py: np.ndarray, sigma2_g: np.ndarray
    ) -> np.ndarray:
        """Batched sweep over R projector factors at once: Lp (R,n,m),
        Py (R,n), sigma2_g (R,) → t (R, p). One pass over the genotype
        tiles serves all R permutations (SURVEY.md §4.3)."""
        Lp_d = jnp.asarray(Lp, dtype=jnp.float32)
        Py_d = jnp.asarray(Py, dtype=jnp.float32)
        s2g = jnp.asarray(sigma2_g, dtype=jnp.float32)
        R = Lp_d.shape[0]
        out = np.empty((R, self.src.p))
        for j0, b, w in self._device_tiles():
            out[:, j0 : j0 + b] = np.asarray(
                kernels.score_tile_batched(w, Lp_d, Py_d, s2g)
            )[:, :b]
        return out

    def column_f64(self, j: int) -> np.ndarray:
        """The f64 recoded W column for global SNP j (reference:
        ``extract_geno_rcpp``, SURVEY.md §3.3). On the single-process
        backend this is a local store read; MultiHostTiledScan overrides
        it with an owning-host broadcast so host-local shards suffice."""
        return _impute_column_f64(self.src.column(j))


class MultiHostTiledScan(TiledScan):
    """Multi-process SPMD backend for the matrix-free engine (BASELINE
    config 4: biobank n × multi-host p).

    Each process streams ONLY its SNP range [lo, hi) (store shard ↔ host
    locality via ``tiles_in``); the two primitives the matfree engine
    needs compose across processes:

    - ``kernel_matvec``: K·V = Σ_hosts W_hᵀ(W_h·V) — the local partial
      from the streamed device tiles, merged with one deterministic
      host-f64 all-reduce (XLA collectives underneath; SURVEY.md §3.4's
      psum-over-the-contraction-axis pattern at host granularity).
    - ``sweep_dots``: returns the LOCAL (p_local, r) rows; the matfree
      sweep gathers only the O(p) statistic vector and the O(k·q)
      shortlist rows, never the full (p, r) dot block.

    The one-dispatch device Krylov fast paths are disabled: their W stack
    would hold only local rows, so the fused matvec would silently drop
    the other hosts' contribution; the streamed host CG with the
    collective matvec is the correct multi-host form.
    """

    def __init__(self, src: TileSource, config: EagleConfig):
        from eagleeverything_tpu.utils import distributed

        self.p_global = src.p
        self.global_src = src
        self.snp_range = distributed.process_snp_range(src.p)
        self.local_sizes = distributed.local_snp_sizes(src.p)
        super().__init__(RangeTileSource(src, *self.snp_range), config)
        # per-host local streaming: never place tiles on a global-mesh
        # sharding from a single process (non-addressable devices)
        self._tile_sharding = None

    def kernel_matvec(self, V: np.ndarray) -> np.ndarray:
        from eagleeverything_tpu.utils import distributed

        return distributed.allreduce_sum_f64(super().kernel_matvec(V))

    def compute_K(self) -> np.ndarray:
        from eagleeverything_tpu.utils import distributed

        return distributed.allreduce_sum_f64(super().compute_K())

    # ---- collective device Krylov (VERDICT r2 weak #3's "obvious next
    # form"): instead of streaming tiles + one host-f64 allreduce per CG/
    # Lanczos iteration, the W stack lives SNP-sharded on a GLOBAL mesh
    # spanning every process's devices, and the whole Krylov loop runs as
    # ONE jitted GSPMD program — XLA inserts the psum for the Wᵀ(W·V)
    # contraction, so each iteration costs one ICI all-reduce of the
    # (n, r) block instead of a gRPC host round-trip. Falls back to the
    # streamed host CG (collective matvec) when the local shard doesn't
    # fit the device-cache budget.

    def _global_krylov_w(self):
        if getattr(self, "_gw", None) is not None:
            return self._gw
        if getattr(self, "_gw_failed", False) or not self.config:
            return None
        n = self.src.n
        ldc = jax.local_device_count()
        rows_pp = max(self.local_sizes)
        rows_pp = -(-rows_pp // (8 * ldc)) * (8 * ldc)
        # per-device share of the f32 stack must fit the HBM cache budget
        if rows_pp // ldc * n * 4 > self.config.device_cache_gb * 1e9 * 0.5:
            self._gw_failed = True
            return None
        Wl = np.zeros((rows_pp, n), dtype=np.float32)
        for j0, tile in self.src.tiles(self.tile_snps):
            Wl[j0 : j0 + tile.shape[0]] = _recode_tile_np(tile)
        mesh = jax.sharding.Mesh(
            np.asarray(jax.devices()).reshape(-1), ("snp",))
        self._gmesh = mesh
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("snp"))
        nproc = jax.process_count()
        self._gw = jax.make_array_from_process_local_data(
            sharding, Wl, (rows_pp * nproc, n))
        return self._gw

    def _replicated(self, x) -> jax.Array:
        """Host array (identical on every process) → fully-replicated
        global f32 array on the Krylov mesh."""
        sh = jax.sharding.NamedSharding(
            self._gmesh, jax.sharding.PartitionSpec())
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(x, dtype=np.float32))

    def device_cg(self, B: np.ndarray, delta: float, s0: float,
                  tol: float = 1e-6, maxiter: int = 400,
                  x0: Optional[np.ndarray] = None,
                  z_idx: Optional[np.ndarray] = None
                  ) -> Optional[np.ndarray]:
        W = self._global_krylov_w()
        if W is None:
            return None
        r = B.shape[1]
        # convergence vs the ORIGINAL ‖B‖ (not ‖R0‖) — see TiledScan
        bn2 = np.sum(_pad_cols8(B).astype(np.float32) ** 2, axis=0)
        if x0 is not None and x0.shape == B.shape:
            # residual-form warm start (collective: every host passes the
            # same replicated x0, so the extra kernel_matvec stays lockstep)
            R0 = B - self._h_apply_host(x0, delta, s0, z_idx)
        else:
            R0, x0 = B, np.zeros_like(B)
        R0p = _pad_cols8(R0)
        dlt = self._replicated(_shift_param(delta, R0p.shape[1]))
        if z_idx is not None:
            D = _device_cg_z_jit(
                W, self._replicated(R0p),
                self._replicated(np.asarray(z_idx, np.int32)),
                dlt, self._replicated(np.float32(s0)),
                self._replicated(np.float32(max(tol, 1e-6))), maxiter,
                self.src.n, b_norm2=self._replicated(bn2))
        else:
            D = _device_cg_jit(
                W, self._replicated(R0p),
                dlt, self._replicated(np.float32(s0)),
                self._replicated(np.float32(max(tol, 1e-6))), maxiter,
                b_norm2=self._replicated(bn2))
        return x0 + np.asarray(D.addressable_data(0),
                               dtype=np.float64)[:, :r]

    def device_lanczos(self, Z: np.ndarray, m: int, reorth: bool,
                       s0: float, z_idx: Optional[np.ndarray] = None):
        W = self._global_krylov_w()
        if W is None:
            return None
        if z_idx is not None:
            a, b, zn, basis = _device_lanczos_z_jit(
                W, self._replicated(_pad_cols8(Z)),
                self._replicated(np.asarray(z_idx, np.int32)),
                self._replicated(np.float32(s0)),
                min(m, Z.shape[0]), bool(reorth), self.src.n)
        else:
            a, b, zn, basis = _device_lanczos_jit(
                W, self._replicated(_pad_cols8(Z)),
                self._replicated(np.float32(s0)),
                min(m, self.src.n), bool(reorth))
        # the basis is replicated (no p axis); hand ShiftedKrylov a LOCAL
        # single-device view so its einsum epilogue needs no global mesh
        return (np.asarray(a.addressable_data(0), np.float64),
                np.asarray(b.addressable_data(0), np.float64),
                np.asarray(zn.addressable_data(0), np.float64),
                basis.addressable_data(0))

    def column_f64(self, j: int) -> np.ndarray:
        """Owning-host broadcast of global SNP column j: the host whose
        SNP range contains j reads + mean-imputes it from its LOCAL shard;
        everyone else contributes zeros; one deterministic f64 all-reduce
        delivers the column everywhere. No host ever touches a foreign
        shard file (store shard ↔ host locality, SURVEY.md §6.8) — this is
        a COLLECTIVE call: every process must invoke it with the same j."""
        from eagleeverything_tpu.utils import distributed

        lo, hi = self.snp_range
        if lo <= j < hi:
            col = _impute_column_f64(self.src.column(j - lo))
        else:
            col = np.zeros(self.src.n, dtype=np.float64)
        return distributed.allreduce_sum_f64(col)

    # fpr4am / am_multi compose with SPMD through the plain TiledScan
    # sweep surface: the local (p_local,) rows are gathered into the
    # global O(p) statistic vector (the only cross-host payload, as in
    # the matfree sweep). sweep_dots intentionally stays LOCAL — the
    # matfree sweep gathers selectively (bigscan.score_sweep_matfree).
    def _gather_rows(self, t_local: np.ndarray) -> np.ndarray:
        from eagleeverything_tpu.utils import distributed

        return distributed.allgather_concat_f64(t_local, self.local_sizes)

    def sweep(self, Lp, Py, sigma2_g):
        return self._gather_rows(super().sweep(Lp, Py, sigma2_g))

    def sweep_eig(self, s, Q, z3, sigma2_g):
        return self._gather_rows(super().sweep_eig(s, Q, z3, sigma2_g))

    def sweep_eig_batched(self, s, Q, z3, sigma2_g):
        t_l = super().sweep_eig_batched(s, Q, z3, sigma2_g)  # (R, p_local)
        return self._gather_rows(t_l.T).T

    def sweep_batched(self, Lp, Py, sigma2_g):
        return self._gather_rows(super().sweep_batched(Lp, Py, sigma2_g).T).T


class ShardedScan:
    """Multi-device SNP-sharded scan: the full genotype matrix lives sharded
    across the mesh; MMt merges with psum; sweep + argmax are collective
    (SURVEY.md §3.4, §6.8)."""

    def __init__(self, src: TileSource, config: EagleConfig,
                 devices: Optional[list] = None):
        self.src = src
        self.config = config
        self.mesh = meshlib.make_mesh(config.mesh_shape, devices)
        n_shards = self.mesh.shape[meshlib.SNP_AXIS]
        self.p_pad = meshlib.pad_to_multiple(src.p, n_shards * 128)
        sharding = meshlib.snp_sharding(self.mesh)
        if jax.process_count() > 1:
            # SPMD multi-host: each process materializes ONLY its SNP rows
            # (store shard ↔ host locality, SURVEY.md §6.8) and contributes
            # them as process-local shards of the global array
            rows_per_proc = self.p_pad // jax.process_count()
            r0 = jax.process_index() * rows_per_proc
            hi = min(r0 + rows_per_proc, src.p)
            local = np.full((rows_per_proc, src.n), _PAD_VALUE, dtype=np.int8)
            for j0, tile in src.tiles_in(r0, hi, max(rows_per_proc, 128)):
                local[j0 - r0 : j0 - r0 + tile.shape[0]] = tile
            g_dev = jax.make_array_from_process_local_data(
                sharding, local, (self.p_pad, src.n)
            )
        else:
            # single process: assemble the padded SNP-major matrix directly
            Gt = np.full((self.p_pad, src.n), _PAD_VALUE, dtype=np.int8)
            for j0, tile in src.tiles(max(self.p_pad // n_shards, 128)):
                Gt[j0 : j0 + tile.shape[0]] = tile
            g_dev = jax.device_put(Gt, sharding)
        self.Wt = jax.jit(
            kernels.recode_impute_tile,
            static_argnames=("compute_dtype",),
            out_shardings=sharding,
        )(g_dev, compute_dtype=config.compute_dtype)

    def compute_K(self) -> np.ndarray:
        K = collectives.mmt_psum(self.Wt, self.mesh)
        return np.asarray(jax.device_get(K), dtype=np.float64)

    def set_eigenbasis(self, U_eff: np.ndarray) -> None:
        self._U_dev = jnp.asarray(U_eff, dtype=jnp.float32)
        # T = Wt·U, sharded like Wt's rows; iteration-invariant, built once
        self._T = jax.jit(kernels.eig_T_tile)(self.Wt, self._U_dev)

    def sweep_eig(self, s, Q, z3, sigma2_g,
                  exclude: Optional[list[int]] = None):
        """Eigenbasis sweep + collective argmax on the sharded T tiles."""
        mask_dev = self._mask(exclude)
        t, i_glob, m_glob = collectives.score_and_argmax_from_T(
            self._T,
            jnp.asarray(s, jnp.float32), jnp.asarray(Q, jnp.float32),
            jnp.asarray(z3, jnp.float32), sigma2_g, mask_dev, self.mesh,
        )
        return (np.asarray(t)[: self.src.p], int(i_glob), float(m_glob))

    def _mask(self, exclude: Optional[list[int]]):
        mask = np.ones(self.p_pad, dtype=np.float32)
        mask[self.src.p :] = 0.0
        if exclude:
            mask[np.asarray(exclude)] = 0.0
        mask_sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(meshlib.SNP_AXIS))
        if jax.process_count() > 1:
            rows = self.p_pad // jax.process_count()
            r0 = jax.process_index() * rows
            return jax.make_array_from_process_local_data(
                mask_sharding, mask[r0 : r0 + rows], (self.p_pad,))
        return jax.device_put(mask, mask_sharding)

    def sweep(self, Lp, Py, sigma2_g, exclude: Optional[list[int]] = None):
        t, i_glob, m_glob = collectives.score_and_argmax(
            self.Wt,
            jnp.asarray(Lp, jnp.float32),
            jnp.asarray(Py, jnp.float32),
            sigma2_g,
            self._mask(exclude),
            self.mesh,
        )
        return (np.asarray(t)[: self.src.p], int(i_glob), float(m_glob))

    def column_f64(self, j: int) -> np.ndarray:
        """Global SNP column j as f64 W (reference: ``extract_geno_rcpp``).
        Multi-process: owning-host read + deterministic f64 broadcast, so
        each process only ever touches its own store shards (collective —
        call with the same j everywhere)."""
        if jax.process_count() == 1:
            return _impute_column_f64(self.src.column(j))
        from eagleeverything_tpu.utils import distributed

        rows = self.p_pad // jax.process_count()
        r0 = jax.process_index() * rows
        if r0 <= j < min(r0 + rows, self.src.p):
            col = _impute_column_f64(self.src.column(j))
        else:
            col = np.zeros(self.src.n, dtype=np.float64)
        return distributed.allreduce_sum_f64(col)


# ---------------------------------------------------------------------------
# Forward-selection driver (shared decision path)
# ---------------------------------------------------------------------------


def forward_select(
    y: np.ndarray,
    X0: np.ndarray,
    handle: GenoHandle,
    maxit: int = 40,
    fixit: bool = False,
    lam_ebic: float = 1.0,
    Z: Optional[np.ndarray] = None,
    quiet: bool = True,
    config: EagleConfig = DEFAULT_CONFIG,
    keep_records: Optional[np.ndarray] = None,
    sharded: bool = False,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    log_jsonl: Optional[str] = None,
) -> AMResult:
    """The AM forward-selection loop on the TPU engine (SURVEY.md §4.2).

    With ``ckpt_dir``, the n×n MMt is cached keyed by the genotype source
    (iteration/permutation-invariant, SURVEY.md §6.4) and the tiny scan
    state is checkpointed at every accepted iteration; ``resume=True``
    restarts a killed scan from the last iteration boundary (§6.3).
    """
    from eagleeverything_tpu.utils import checkpoint as ckpt
    from eagleeverything_tpu.utils.logging import Phase, ScanLogger

    y = np.asarray(y, dtype=np.float64)
    X0 = np.asarray(X0, dtype=np.float64)
    src = _make_source(handle, keep_records)
    n = y.shape[0]
    p = src.p
    logger = ScanLogger(quiet=quiet, jsonl_path=log_jsonl,
                        is_host0=jax.process_index() == 0)

    backend = ShardedScan(src, config) if sharded else TiledScan(src, config)

    K_raw = None
    mmt_key = None
    if ckpt_dir is not None:
        mmt_key = ckpt.mmt_cache_key(
            handle.source, src.n, src.p, keep_records,
            content_token=ckpt.genotype_content_token(handle))
        K_raw = ckpt.load_mmt(ckpt_dir, mmt_key)
        if K_raw is not None and K_raw.shape != (src.n, src.n):
            K_raw = None
    if K_raw is None:
        with Phase(logger, "mmt", items=p):
            K_raw = backend.compute_K()
        if ckpt_dir is not None:
            ckpt.save_mmt(ckpt_dir, mmt_key, K_raw)
    if Z is None and n != src.n:
        raise ValueError(f"trait has {n} records but {src.n} genotyped individuals")
    K_eff = normalized_kernel(K_raw, Z)

    selected: list[int] = []
    extbic_path: list[float] = []
    loglik_path: list[float] = []
    outlier_stats: list[np.ndarray] = []

    X = X0
    if resume and ckpt_dir is not None:
        state = ckpt.load_scan_state(ckpt_dir)
        if state is not None:
            meta = state.get("meta", {})
            expect = {"trait_n": n, "p": p, "lam_ebic": lam_ebic}
            mismatch = {k: (meta.get(k), v) for k, v in expect.items()
                        if meta.get(k) != v}
            if mismatch:
                raise ValueError(
                    f"refusing to resume: checkpoint in {ckpt_dir} was "
                    f"written for different inputs {mismatch} "
                    "(saved vs current)")
            selected = [int(j) for j in state["selected"]]
            for j in selected:
                w_col = backend.column_f64(j)
                x_col = Z @ w_col if Z is not None else w_col
                X = np.hstack([X, x_col[:, None]])
            extbic_path = [float(v) for v in state["extbic_path"][:-1]]
            loglik_path = [float(v) for v in state["loglik_path"][:-1]]
            logger.event("resume", markers=len(selected))

    # One eigendecomposition of K for the whole scan (FaST-LMM style):
    # every subsequent REML fit is O(n·q²) in this basis, and the sweep's
    # projector factor is an O(n²·q) rank-q update — no per-iteration n³.
    # Cached alongside MMt (it is iteration/permutation-invariant, §6.4).
    basis = None
    eig_key = None
    if ckpt_dir is not None and Z is None:
        # key by kernel CONTENT, not just source: a changed/invalidated MMt
        # cache must not serve a stale eigendecomposition
        import hashlib
        eig_key = (mmt_key + "-"
                   + hashlib.sha256(np.ascontiguousarray(K_eff).tobytes())
                     .hexdigest()[:16])
        cached = ckpt.load_eig(ckpt_dir, eig_key)
        if cached is not None and cached[0].shape[0] == n:
            basis = EigenBasis(np.maximum(cached[0], 0.0), cached[1], None)
    if basis is None:
        with Phase(logger, "eigh", items=n):
            basis = eigh_basis(K_eff, config)
        if eig_key is not None and basis.host_f64 is not None:
            ckpt.save_eig(ckpt_dir, eig_key, basis.d, basis.host_f64)
    d_eig = basis.d
    y_star = basis.project(y)
    Xs = basis.project(X)
    # device-resident eigenbasis: every sweep (tiled or sharded) runs in
    # K's eigenbasis (cached T = Wt·U tiles, kernels.score_from_T /
    # collectives.score_and_argmax_from_T) — per-iteration work drops
    # from O(n²) to O(n·q); at big n U never exists on the host at all
    if Z is None:
        backend.set_eigenbasis(basis.device_basis())
    elif basis.host_f64 is not None:
        backend.set_eigenbasis(Z.T @ basis.host_f64)
    else:
        # big-n Zmat: fold the incidence matrix into the device-resident
        # eigenbasis on device (T_j = (Z·w_j)ᵀU = w_jᵀ·(ZᵀU); U never
        # touches the host)
        backend.set_eigenbasis(jnp.dot(
            jnp.asarray(Z.T, dtype=jnp.float32), basis.device_basis(),
            preferred_element_type=jnp.float32))
    qmax = -(-(X0.shape[1] + maxit + 1) // 8) * 8

    fit = reml_core.reml_maximize_diag(d_eig, y_star, Xs)
    best = reml_core.extbic(fit.loglik, n, p, len(selected), lam_ebic)
    extbic_path.append(best)
    loglik_path.append(fit.loglik)
    if not quiet:
        print(f"[engine] start: extBIC={best:.4f} delta={fit.delta:.4g} "
              f"k={len(selected)}")

    for it in range(len(selected), maxit):
        with Phase(logger, "sweep", items=p):
            s_vec, Qp, z3 = _eig_iteration_state(
                d_eig, y_star, Xs, fit.delta, qmax)
            if sharded:
                t, cand, _ = backend.sweep_eig(s_vec, Qp, z3, fit.sigma2_g,
                                               exclude=selected)
            else:
                t = backend.sweep_eig(s_vec, Qp, z3, fit.sigma2_g)
                t[selected] = 0.0
                cand = int(np.argmax(t))
        outlier_stats.append(t.astype(np.float64))
        if t[cand] <= 0.0:
            # exhausted: every remaining SNP is selected or zero-variance
            # (the collective argmax returns index 0 with max 0 here) —
            # matches the oracle's stop, incl. under fixit/maxit > p
            break

        w_col = backend.column_f64(cand)
        x_col = Z @ w_col if Z is not None else w_col
        X_new = np.hstack([X, x_col[:, None]])
        Xs_new = np.hstack([Xs, basis.project(x_col)[:, None]])  # incremental UᵀX
        fit_new = reml_core.reml_maximize_diag(d_eig, y_star, Xs_new)
        ebic_new = reml_core.extbic(fit_new.loglik, n, p, len(selected) + 1, lam_ebic)
        if not quiet:
            print(f"[engine] it={it} cand={cand} t_max={t[cand]:.4f} "
                  f"extBIC {best:.4f} -> {ebic_new:.4f}")
        accepted = ebic_new < best or fixit
        logger.event(
            "iteration", it=it, candidate=cand, t_max=float(t[cand]),
            extbic=float(ebic_new), accepted=accepted,
            sigma2_g=float(fit_new.sigma2_g), sigma2_e=float(fit_new.sigma2_e),
        )
        if accepted:
            selected.append(cand)
            X, Xs, fit, best = X_new, Xs_new, fit_new, ebic_new
            extbic_path.append(ebic_new)
            loglik_path.append(fit_new.loglik)
            if ckpt_dir is not None:
                ckpt.save_scan_state(
                    ckpt_dir, selected, extbic_path, loglik_path,
                    fit.delta, fit.sigma2_g, fit.sigma2_e,
                    meta={"trait_n": n, "p": p, "lam_ebic": lam_ebic},
                )
        else:
            break

    logger.close()
    return AMResult(
        indices=selected, extbic_path=extbic_path,
        outlier_stats=outlier_stats, loglik_path=loglik_path,
        sigma2_g=fit.sigma2_g, sigma2_e=fit.sigma2_e, delta=fit.delta,
        n=n, p=p, lam_ebic=lam_ebic,
    )


def forward_select_multi(
    ys: np.ndarray,
    X0: np.ndarray,
    handle: GenoHandle,
    maxit: int = 40,
    fixit: bool = False,
    lam_ebic: float = 1.0,
    quiet: bool = True,
    config: EagleConfig = DEFAULT_CONFIG,
    keep_records: Optional[np.ndarray] = None,
    trait_names: Optional[list[str]] = None,
) -> list[AMResult]:
    """Lockstep multi-trait scan (BASELINE config 5: multi-trait /
    covariate-rich batched REML runs).

    All T traits share one MMt, one kernel eigendecomposition, and the
    cached device genotype tiles; at each iteration the still-active
    traits' score sweeps run as ONE batched device pass (the same
    leading-axis batching the FPR4AM permutations use, SURVEY.md §4.3).
    Each trait keeps its own forward-selection state and extBIC stopping.
    """
    from eagleeverything_tpu.utils.logging import Phase, ScanLogger

    ys = np.asarray(ys, dtype=np.float64)
    T, n = ys.shape
    X0 = np.asarray(X0, dtype=np.float64)
    src = _make_source(handle, keep_records)
    logger = ScanLogger(quiet=quiet, is_host0=jax.process_index() == 0)

    # SPMD: local-range streaming + collective K, globally-gathered
    # batched sweeps, owning-host column broadcast — per-trait decisions
    # are replicated host-f64, so every process selects identically
    backend = (MultiHostTiledScan(src, config) if jax.process_count() > 1
               else TiledScan(src, config))
    p = getattr(backend, "p_global", src.p)
    if n > config.host_eigh_max_n:
        # the eigenbasis route below needs U as a HOST f64 matrix (ystars
        # = ys·U etc.) — above host_eigh_max_n that is an n² f64 surprise
        # (20 GB at n=50k) hiding behind _eigh_kernel's device fallback.
        # am_multi's auto routing already picks matfree above
        # matfree_min_n; forcing engine="jax" here gets a loud error, not
        # an OOM (VERDICT r4 weak 4).
        raise ValueError(
            f"forward_select_multi's eigenbasis path materializes the "
            f"n×n eigenvector matrix on the host (n={n} > "
            f"host_eigh_max_n={config.host_eigh_max_n} → "
            f"{8 * n * n / 1e9:.0f} GB f64). Use engine='matfree' "
            f"(bigscan.forward_select_matfree_multi) at this scale, or "
            f"raise config.host_eigh_max_n explicitly if the host truly "
            f"has the memory.")
    with Phase(logger, "mmt", items=p):
        K_raw = backend.compute_K()
    if n != src.n:
        raise ValueError(f"traits have {n} records but {src.n} individuals")
    K = normalized_kernel(K_raw)

    with Phase(logger, "eigh", items=n):
        d_eig, U_eig = _eigh_kernel(K, config)
    ystars = ys @ U_eig          # (T, n): row t is Uᵀ·y_t
    Xs0 = U_eig.T @ X0
    backend.set_eigenbasis(U_eig)
    qmax = -(-(X0.shape[1] + maxit + 1) // 8) * 8

    class _TraitState:
        def __init__(self, t):
            self.t = t
            self.selected: list[int] = []
            self.Xs = Xs0
            self.X = X0
            self.extbic_path: list[float] = []
            self.loglik_path: list[float] = []
            self.outlier: list[np.ndarray] = []
            self.fit = reml_core.reml_maximize_diag(d_eig, ystars[t], Xs0)
            self.best = reml_core.extbic(self.fit.loglik, n, p, 0, lam_ebic)
            self.extbic_path.append(self.best)
            self.loglik_path.append(self.fit.loglik)
            self.active = True

    states = [_TraitState(t) for t in range(T)]

    for it in range(maxit):
        active = [s for s in states if s.active]
        if not active:
            break
        B = len(active)
        s_all = np.empty((B, n))
        Q_all = np.empty((B, n, qmax))
        z3_all = np.empty((B, n))
        for b, st in enumerate(active):
            s_all[b], Q_all[b], z3_all[b] = _eig_iteration_state(
                d_eig, ystars[st.t], st.Xs, st.fit.delta, qmax)
        with Phase(logger, "sweep", items=p * B):
            t_all = backend.sweep_eig_batched(
                s_all, Q_all, z3_all,
                np.array([st.fit.sigma2_g for st in active])
            )
        for b, s in enumerate(active):
            t_vec = t_all[b]
            t_vec[s.selected] = 0.0
            s.outlier.append(t_vec.astype(np.float64))
            cand = int(np.argmax(t_vec))
            if t_vec[cand] <= 0.0:
                s.active = False  # exhausted for this trait
                continue
            w_col = backend.column_f64(cand)
            Xs_new = np.hstack([s.Xs, (U_eig.T @ w_col)[:, None]])
            fit_new = reml_core.reml_maximize_diag(d_eig, ystars[s.t], Xs_new)
            ebic_new = reml_core.extbic(
                fit_new.loglik, n, p, len(s.selected) + 1, lam_ebic)
            if ebic_new < s.best or fixit:
                s.selected.append(cand)
                s.Xs, s.fit, s.best = Xs_new, fit_new, ebic_new
                s.X = np.hstack([s.X, w_col[:, None]])
                s.extbic_path.append(ebic_new)
                s.loglik_path.append(fit_new.loglik)
            else:
                s.active = False
            logger.event("iteration", it=it, trait=s.t, candidate=cand,
                         accepted=s.active or fixit,
                         extbic=float(ebic_new))

    logger.close()
    return [
        AMResult(
            indices=s.selected, extbic_path=s.extbic_path,
            outlier_stats=s.outlier, loglik_path=s.loglik_path,
            sigma2_g=s.fit.sigma2_g, sigma2_e=s.fit.sigma2_e,
            delta=s.fit.delta, n=n, p=p, lam_ebic=lam_ebic,
            trait_name=(trait_names[s.t] if trait_names else f"trait{s.t}"),
        )
        for s in states
    ]



def _eig_iteration_state(
    d: np.ndarray, y_star: np.ndarray, Xs: np.ndarray, delta: float,
    qmax: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-iteration host state for the eigenbasis sweep: s = (d+δ)^(-1/2),
    Q = orth basis of S·X* (zero-padded to qmax columns so the jitted
    sweep keeps one shape for the whole scan — zero columns leave QQᵀ
    unchanged), and z3 with P̃y = U·z3:
      z3 = s ∘ [(I−QQᵀ)(s ∘ y*)].
    All O(n·q) — the only n² object is the device-resident U."""
    s = 1.0 / np.sqrt(d + delta)
    Xr, _ = reml_core.independent_cols(np.asarray(Xs, np.float64))
    V = Xr * s[:, None]
    Q, _ = np.linalg.qr(V)
    z1 = s * y_star
    z2 = z1 - Q @ (Q.T @ z1)
    z3 = s * z2
    if Q.shape[1] < qmax:
        Q = np.concatenate(
            [Q, np.zeros((Q.shape[0], qmax - Q.shape[1]))], axis=1)
    elif Q.shape[1] > qmax:
        raise ValueError(f"q={Q.shape[1]} exceeds qmax={qmax}")
    return s, Q, z3



