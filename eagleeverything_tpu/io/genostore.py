"""Sharded, SNP-major, on-disk genotype store — the out-of-core layer.

The rebuild's analog of the reference's packed binary ``M``/``Mt`` files
plus the ``ReadBlock`` streaming contract (SURVEY.md §3.3 L1/L2, §6.4):
ingestion runs once, the store is the durable artifact, and every p-scale
sweep streams SNP-major tiles host-RAM → device.

Layout: ``<dir>/manifest.json`` + ``<dir>/shard_{k:05d}.bin``. Shard k is a
contiguous SNP range stored int8 row-major ``(p_k, n)`` — one row per SNP —
so per-SNP (column) access is sequential on disk, which is why the
reference maintains the transpose ``Mt`` (SURVEY.md §3.3 "Transpose
ingest": the SNP-major store makes the explicit transpose artifact
unnecessary). Shard boundaries align with the device mesh: shard k feeds
device/host k in the SNP-sharded scan.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterator, Optional

import numpy as np

MISSING = -9
_MANIFEST = "manifest.json"


@dataclasses.dataclass
class GenotypeStore:
    dir: str
    n: int                  # individuals
    p: int                  # SNPs
    shard_offsets: list[int]  # start SNP index of each shard (len n_shards+1)
    source: str = ""

    # ---------------- creation ----------------

    @classmethod
    def create_from_row_blocks(
        cls,
        dir: str,
        row_blocks: Iterator[np.ndarray],
        n_shards: Optional[int] = None,
        availmem_gb: float = 8.0,
        source: str = "",
    ) -> "GenotypeStore":
        """Ingest from individuals-major row blocks (as text parsers yield)
        via an out-of-core blocked transpose (reference: ``createM`` then
        ``createMt``, SURVEY.md §4.1).

        A temporary individuals-major memmap is filled block by block, then
        transposed shard-by-shard within the ``availmem_gb`` budget.
        """
        os.makedirs(dir, exist_ok=True)
        tmp = os.path.join(dir, "_rowmajor.tmp")
        n = 0
        p = None
        with open(tmp, "wb") as f:
            for blk in row_blocks:
                blk = np.ascontiguousarray(blk, dtype=np.int8)
                if p is None:
                    p = blk.shape[1]
                elif blk.shape[1] != p:
                    raise ValueError("inconsistent SNP count across row blocks")
                f.write(blk.tobytes())
                n += blk.shape[0]
        if p is None:
            raise ValueError("no genotype rows")
        M = np.memmap(tmp, dtype=np.int8, mode="r", shape=(n, p))
        store = cls._write_shards_from_colmajor_source(
            dir, lambda j0, j1: np.ascontiguousarray(M[:, j0:j1].T),
            n=n, p=p, n_shards=n_shards, availmem_gb=availmem_gb, source=source,
        )
        del M
        os.remove(tmp)
        return store

    @classmethod
    def create_from_dense(
        cls, dir: str, geno: np.ndarray, n_shards: Optional[int] = None,
        availmem_gb: float = 8.0, source: str = "",
    ) -> "GenotypeStore":
        geno = np.asarray(geno, dtype=np.int8)
        n, p = geno.shape
        return cls._write_shards_from_colmajor_source(
            dir, lambda j0, j1: np.ascontiguousarray(geno[:, j0:j1].T),
            n=n, p=p, n_shards=n_shards, availmem_gb=availmem_gb, source=source,
        )

    @classmethod
    def _write_shards_from_colmajor_source(
        cls, dir, get_cols, n, p, n_shards, availmem_gb, source
    ) -> "GenotypeStore":
        os.makedirs(dir, exist_ok=True)
        if n_shards is None:
            n_shards = _default_shards()
        n_shards = max(1, min(n_shards, p))
        base, rem = divmod(p, n_shards)
        sizes = [base + (1 if k < rem else 0) for k in range(n_shards)]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).tolist()
        # column-block size bounded by the host-RAM budget
        block_cols = max(1, int(availmem_gb * 1e9 / max(n, 1) / 4))
        for k in range(n_shards):
            j0, j1 = offsets[k], offsets[k + 1]
            with open(os.path.join(dir, f"shard_{k:05d}.bin"), "wb") as f:
                for c0 in range(j0, j1, block_cols):
                    c1 = min(c0 + block_cols, j1)
                    f.write(get_cols(c0, c1).astype(np.int8).tobytes())
        manifest = {
            "version": 1, "dtype": "int8", "layout": "snp_major",
            "n": int(n), "p": int(p), "shard_offsets": offsets,
            "source": source, "missing": MISSING,
        }
        with open(os.path.join(dir, _MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        return cls(dir=dir, n=n, p=p, shard_offsets=offsets, source=source)

    # ---------------- access ----------------

    @classmethod
    def open(cls, dir: str) -> "GenotypeStore":
        with open(os.path.join(dir, _MANIFEST)) as f:
            m = json.load(f)
        if m.get("layout") != "snp_major" or m.get("dtype") != "int8":
            raise ValueError(f"unsupported store manifest: {m}")
        return cls(dir=dir, n=m["n"], p=m["p"],
                   shard_offsets=m["shard_offsets"], source=m.get("source", ""))

    @property
    def n_shards(self) -> int:
        return len(self.shard_offsets) - 1

    def shard_mmap(self, k: int) -> np.ndarray:
        """Memory-mapped SNP-major view of shard k, shape (p_k, n)."""
        j0, j1 = self.shard_offsets[k], self.shard_offsets[k + 1]
        return np.memmap(os.path.join(self.dir, f"shard_{k:05d}.bin"),
                         dtype=np.int8, mode="r", shape=(j1 - j0, self.n))

    def iter_tiles(self, tile_snps: int) -> Iterator[tuple[int, np.ndarray]]:
        """Yield (global_snp_offset, int8 tile (b, n)) SNP-major tiles —
        the ``ReadBlock`` streaming contract (SURVEY.md §3.3 L1)."""
        for k in range(self.n_shards):
            mm = self.shard_mmap(k)
            j0 = self.shard_offsets[k]
            for t0 in range(0, mm.shape[0], tile_snps):
                t1 = min(t0 + tile_snps, mm.shape[0])
                yield j0 + t0, np.asarray(mm[t0:t1])

    def column(self, j: int) -> np.ndarray:
        """One genotype column (SNP j) — reference: ``extract_geno_rcpp``
        (SURVEY.md §3.3): a single sequential row read in SNP-major layout."""
        k = int(np.searchsorted(np.asarray(self.shard_offsets), j, side="right") - 1)
        mm = self.shard_mmap(k)
        return np.asarray(mm[j - self.shard_offsets[k]])

    def to_dense(self) -> np.ndarray:
        """Dense individuals-major (n, p) matrix (small data only)."""
        out = np.empty((self.n, self.p), dtype=np.int8)
        for j0, tile in self.iter_tiles(tile_snps=65536):
            out[:, j0 : j0 + tile.shape[0]] = tile.T
        return out


def _default_shards() -> int:
    try:
        import jax
        return max(1, jax.local_device_count())
    except Exception:
        return 1
