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

import dataclasses
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

    def column(self, j: int) -> np.ndarray:
        col = self._store.column(j)
        return col if self._keep is None else col[self._keep]


def _make_source(handle: GenoHandle, keep: Optional[np.ndarray]) -> TileSource:
    if handle.geno is not None:
        return DenseTileSource(handle.geno, keep)
    if handle.store_dir is not None:
        return StoreTileSource(handle.store_dir, keep)
    raise ValueError("GenoHandle has neither in-memory genotypes nor a store")


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


class TiledScan:
    """Single-device scan with host→device tile streaming and optional
    on-device W-tile caching (out-of-core path; reference: the per-iteration
    ReadBlock sweep of ``calculate_a_and_vara_rcpp``, SURVEY.md §4.2)."""

    def __init__(self, src: TileSource, config: EagleConfig):
        self.src = src
        self.config = config
        self.tile_snps = min(config.snp_tile, meshlib.pad_to_multiple(src.p, 128))
        itemsize = 2 if config.compute_dtype == "bfloat16" else 4
        cache_bytes = src.p * src.n * itemsize
        self.cache_device = cache_bytes <= config.availmem_gb * 1e9 * 0.5
        # cache entries: (global_snp_offset, valid_rows, device W tile)
        self._wcache: Optional[list[tuple[int, int, jax.Array]]] = None
        self._score = (
            kernels.score_tile_bf16
            if config.compute_dtype == "bfloat16"
            else kernels.score_tile
        )

    def _device_tiles(self) -> Iterator[tuple[int, int, jax.Array]]:
        if self._wcache is not None:
            yield from self._wcache
            return
        cache = [] if self.cache_device else None
        for j0, tile in self.src.tiles(self.tile_snps):
            b = tile.shape[0]
            g = jnp.asarray(_pad_tile(tile, self.tile_snps))
            w = kernels.recode_impute_tile(g, compute_dtype=self.config.compute_dtype)
            if cache is not None:
                cache.append((j0, b, w))
            yield j0, b, w
        if cache is not None:
            self._wcache = cache

    def compute_K(self) -> np.ndarray:
        n = self.src.n
        K = jnp.zeros((n, n), dtype=jnp.float32)
        for _, _, w in self._device_tiles():
            K = kernels.mmt_accumulate(K, w)  # padded rows are W=0: inert
        return np.asarray(jax.device_get(K), dtype=np.float64)

    def sweep(self, Pm: np.ndarray, Py: np.ndarray, sigma2_g: float) -> np.ndarray:
        Pm_d = jnp.asarray(Pm, dtype=jnp.float32)
        Py_d = jnp.asarray(Py, dtype=jnp.float32)
        s2g = jnp.float32(sigma2_g)
        out = np.empty(self.src.p)
        for j0, b, w in self._device_tiles():
            out[j0 : j0 + b] = np.asarray(self._score(w, Pm_d, Py_d, s2g))[:b]
        return out


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
        # assemble padded SNP-major int8 host matrix, then shard-place W
        Gt = np.full((self.p_pad, src.n), _PAD_VALUE, dtype=np.int8)
        for j0, tile in src.tiles(max(self.p_pad // n_shards, 128)):
            Gt[j0 : j0 + tile.shape[0]] = tile
        sharding = meshlib.snp_sharding(self.mesh)
        g_dev = jax.device_put(Gt, sharding)
        self.Wt = jax.jit(
            kernels.recode_impute_tile,
            static_argnames=("compute_dtype",),
            out_shardings=sharding,
        )(g_dev, compute_dtype=config.compute_dtype)

    def compute_K(self) -> np.ndarray:
        K = collectives.mmt_psum(self.Wt, self.mesh)
        return np.asarray(jax.device_get(K), dtype=np.float64)

    def sweep(self, Pm, Py, sigma2_g, exclude: Optional[list[int]] = None):
        mask = np.ones(self.p_pad, dtype=np.float32)
        mask[self.src.p :] = 0.0
        if exclude:
            mask[np.asarray(exclude)] = 0.0
        t, i_glob, m_glob = collectives.score_and_argmax(
            self.Wt,
            jnp.asarray(Pm, jnp.float32),
            jnp.asarray(Py, jnp.float32),
            sigma2_g,
            jax.device_put(mask,
                           jax.sharding.NamedSharding(
                               self.mesh, jax.sharding.PartitionSpec(meshlib.SNP_AXIS))),
            self.mesh,
        )
        return (np.asarray(t)[: self.src.p], int(i_glob), float(m_glob))


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
) -> AMResult:
    """The AM forward-selection loop on the TPU engine (SURVEY.md §4.2)."""
    y = np.asarray(y, dtype=np.float64)
    X0 = np.asarray(X0, dtype=np.float64)
    src = _make_source(handle, keep_records)
    n = y.shape[0]
    p = src.p

    backend = ShardedScan(src, config) if sharded else TiledScan(src, config)

    K_raw = backend.compute_K()
    s0 = float(np.mean(np.diag(K_raw)))
    K = K_raw / (s0 if s0 > 0 else 1.0)
    if Z is not None:
        K_eff = Z @ K @ Z.T
    else:
        K_eff = K
        if n != src.n:
            raise ValueError(f"trait has {n} records but {src.n} genotyped individuals")

    selected: list[int] = []
    extbic_path: list[float] = []
    loglik_path: list[float] = []
    outlier_stats: list[np.ndarray] = []

    X = X0
    lam, eta2, _ = reml_core.spectral_inputs(y, X, K_eff)
    fit = reml_core.reml_maximize(lam, eta2)
    best = reml_core.extbic(fit.loglik, n, p, 0, lam_ebic)
    extbic_path.append(best)
    loglik_path.append(fit.loglik)
    if not quiet:
        print(f"[engine] null: extBIC={best:.4f} delta={fit.delta:.4g}")

    for it in range(maxit):
        # host-f64 projector on the record-level covariance
        Pm = _projector(X, K_eff, fit.delta)
        Py = Pm @ y
        if Z is not None:
            Pm_g = Z.T @ Pm @ Z
            Py_g = Z.T @ Py
        else:
            Pm_g, Py_g = Pm, Py

        if sharded:
            t, cand, _ = backend.sweep(Pm_g, Py_g, fit.sigma2_g, exclude=selected)
        else:
            t = backend.sweep(Pm_g, Py_g, fit.sigma2_g)
            t[selected] = 0.0
            cand = int(np.argmax(t))
        outlier_stats.append(t.astype(np.float64))

        w_col = _impute_column_f64(src.column(cand))
        x_col = Z @ w_col if Z is not None else w_col
        X_new = np.hstack([X, x_col[:, None]])
        lam_s, eta2_s, _ = reml_core.spectral_inputs(y, X_new, K_eff)
        fit_new = reml_core.reml_maximize(lam_s, eta2_s)
        ebic_new = reml_core.extbic(fit_new.loglik, n, p, len(selected) + 1, lam_ebic)
        if not quiet:
            print(f"[engine] it={it} cand={cand} t_max={t[cand]:.4f} "
                  f"extBIC {best:.4f} -> {ebic_new:.4f}")
        if ebic_new < best or fixit:
            selected.append(cand)
            X, fit, best = X_new, fit_new, ebic_new
            extbic_path.append(ebic_new)
            loglik_path.append(fit_new.loglik)
        else:
            break

    return AMResult(
        indices=selected, extbic_path=extbic_path,
        outlier_stats=outlier_stats, loglik_path=loglik_path,
        sigma2_g=fit.sigma2_g, sigma2_e=fit.sigma2_e, delta=fit.delta,
        n=n, p=p, lam_ebic=lam_ebic,
    )


def _projector(X: np.ndarray, K: np.ndarray, delta: float) -> np.ndarray:
    n = K.shape[0]
    H = K + delta * np.eye(n)
    Hinv = np.linalg.inv(H)
    HinvX = Hinv @ X
    XtHinvX = X.T @ HinvX
    return Hinv - HinvX @ np.linalg.solve(XtHinvX, HinvX.T)
