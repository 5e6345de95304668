"""Synthetic GWAS data with planted QTL — the test/tutorial data generator.

Stands in for the reference's bundled simulated tutorial data
(``inst/extdata/`` geno/pheno/map text files, ~150 individuals × ~5k SNPs;
SURVEY.md §3.5). Deterministic given a seed, so golden tests are stable.
Also writes the reference's text file formats so the ingestion layer
(``read_marker`` et al.) can be tested end-to-end.
"""

from __future__ import annotations

import dataclasses
import os


import numpy as np


@dataclasses.dataclass
class SimData:
    geno: np.ndarray        # (n, p) int8 {0,1,2}
    y: np.ndarray           # (n,) trait
    qtl_idx: np.ndarray     # planted causal SNP indices
    qtl_beta: np.ndarray    # planted effect sizes
    chrom: np.ndarray       # (p,) chromosome labels (1-based ints)
    pos: np.ndarray         # (p,) base-pair positions
    marker_names: list[str]
    covariate: np.ndarray   # (n,) a numeric covariate ("age")
    group: np.ndarray       # (n,) a 2-level factor covariate ("sex")


def simulate_dataset(
    n: int = 150,
    p: int = 5000,
    n_qtl: int = 3,
    h2_qtl: float = 0.35,
    h2_poly: float = 0.30,
    seed: int = 7,
    missing_rate: float = 0.0,
) -> SimData:
    """Simulate genotypes with LD blocks and a trait with planted QTL.

    Genotypes: per-SNP allele frequencies from Beta(2,2); individuals get
    correlated SNPs within small LD blocks (AR(1)-style latent Gaussian)
    so the scan faces realistic local correlation. Trait = planted additive
    QTL effects + polygenic background (from all SNPs) + noise, with the
    QTL/polygenic variance shares controlled by h2_qtl/h2_poly.
    """
    rng = np.random.default_rng(seed)
    freqs = rng.beta(2.0, 2.0, size=p) * 0.9 + 0.05

    block = 25  # SNPs per LD block
    rho = 0.7
    G = np.empty((n, p), dtype=np.int8)
    for start in range(0, p, block):
        end = min(start + block, p)
        width = end - start
        # latent AR(1) Gaussian per haplotype, thresholded at the allele freq
        for hap in range(2):
            z = np.empty((n, width))
            z[:, 0] = rng.standard_normal(n)
            for j in range(1, width):
                z[:, j] = rho * z[:, j - 1] + np.sqrt(1 - rho**2) * rng.standard_normal(n)
            thresh = _norm_ppf(freqs[start:end])
            allele = (z < thresh[None, :]).astype(np.int8)
            if hap == 0:
                G[:, start:end] = allele
            else:
                G[:, start:end] += allele

    qtl_idx = np.sort(rng.choice(p, size=n_qtl, replace=False))
    qtl_beta = rng.choice([-1.0, 1.0], size=n_qtl) * (1.0 + rng.random(n_qtl))

    Wq = G[:, qtl_idx].astype(np.float64)
    Wq = Wq - Wq.mean(axis=0)
    g_qtl = Wq @ qtl_beta

    Wall = G.astype(np.float64)
    Wall = Wall - Wall.mean(axis=0)
    u = Wall @ rng.standard_normal(p) / np.sqrt(p)

    def _scaled(x, target_var):
        v = np.var(x)
        return x * np.sqrt(target_var / v) if v > 0 else x

    h2_e = max(1.0 - h2_qtl - h2_poly, 0.05)
    y = (
        _scaled(g_qtl, h2_qtl)
        + _scaled(u, h2_poly)
        + rng.standard_normal(n) * np.sqrt(h2_e)
    )

    covariate = rng.uniform(20, 60, size=n).round(1)
    group = rng.integers(0, 2, size=n)
    y = y + 0.01 * (covariate - covariate.mean()) + 0.2 * (group - 0.5)

    if missing_rate > 0:
        mask = rng.random((n, p)) < missing_rate
        G = G.copy()
        G[mask] = -9

    snps_per_chr = (p + 3) // 4
    chrom = (np.arange(p) // snps_per_chr + 1).astype(np.int64)
    pos = np.concatenate(
        [np.sort(rng.integers(1, 50_000_000, size=int((chrom == c).sum())))
         for c in np.unique(chrom)]
    )
    names = [f"snp{j:06d}" for j in range(p)]
    return SimData(
        geno=G, y=y, qtl_idx=qtl_idx, qtl_beta=qtl_beta,
        chrom=chrom, pos=pos, marker_names=names,
        covariate=covariate, group=group,
    )


def _norm_ppf(q: np.ndarray) -> np.ndarray:
    from scipy.stats import norm
    return norm.ppf(q)


# ---------------------------------------------------------------------------
# Writers for the reference's text formats (exercised by the ingest tests)
# ---------------------------------------------------------------------------

def write_ascii_geno(
    sim: SimData, path: str, AA: str = "AA", AB: str = "AB", BB: str = "BB",
    missing: str = "NA", sep: str = " ",
) -> None:
    """Space-separated ASCII genotypes, one row per individual (reference:
    ``ReadMarker(type='text')`` input, SURVEY.md §3.1/§4.1)."""
    codes = {0: AA, 1: AB, 2: BB, -9: missing}
    with open(path, "w") as f:
        for row in sim.geno:
            f.write(sep.join(codes[int(v)] for v in row) + "\n")


def write_ascii_geno_nospace(sim: SimData, path: str) -> None:
    """Single-character no-space coding 0/1/2 (reference supports a no-space
    text variant; missing = 'X' here)."""
    codes = {0: "0", 1: "1", 2: "2", -9: "X"}
    with open(path, "w") as f:
        for row in sim.geno:
            f.write("".join(codes[int(v)] for v in row) + "\n")


def write_pheno(sim: SimData, path: str, trait_name: str = "y") -> None:
    """Space-separated phenotype table with header (reference:
    ``ReadPheno()`` input). Columns: trait, numeric covariate, factor."""
    with open(path, "w") as f:
        f.write(f"{trait_name} age sex\n")
        for yi, c, g in zip(sim.y, sim.covariate, sim.group):
            f.write(f"{yi:.6f} {c:.1f} {'M' if g else 'F'}\n")


def write_map(sim: SimData, path: str) -> None:
    """Marker map: Mrk Chr Pos (reference: ``ReadMap()`` input)."""
    with open(path, "w") as f:
        f.write("Mrk Chr Pos\n")
        for name, c, bp in zip(sim.marker_names, sim.chrom, sim.pos):
            f.write(f"{name} {c} {bp}\n")


def write_plink_ped(sim: SimData, ped_path: str, map_path: str) -> None:
    """PLINK .ped/.map pair (reference: ``ReadMarker(type='PLINK')``).

    .ped: FID IID PID MID SEX PHENO then two allele chars per SNP
    (A=ref, B=alt → AA/AB/BB; 0 0 = missing).
    """
    with open(ped_path, "w") as f:
        for i, row in enumerate(sim.geno):
            lead = f"FAM{i+1} IND{i+1} 0 0 {1 + int(sim.group[i])} {sim.y[i]:.6f}"
            alleles = []
            for v in row:
                v = int(v)
                if v == 0:
                    alleles.append("A A")
                elif v == 1:
                    alleles.append("A B")
                elif v == 2:
                    alleles.append("B B")
                else:
                    alleles.append("0 0")
            f.write(lead + " " + " ".join(alleles) + "\n")
    with open(map_path, "w") as f:
        for name, c, bp in zip(sim.marker_names, sim.chrom, sim.pos):
            f.write(f"{c} {name} 0 {bp}\n")


def write_plink_bed(sim: SimData, bed_path: str) -> None:
    """Binary PLINK .bed/.bim/.fam trio (SNP-major, 2-bit).

    Codes per PLINK spec: 00=hom A1, 01=missing, 10=het, 11=hom A2, with
    dose = count of A1, so dose {2,1,0,missing} → {00,10,11,01}.
    """
    base = bed_path[:-4] if bed_path.endswith(".bed") else bed_path
    n, p = sim.geno.shape
    code = {2: 0b00, -9: 0b01, 1: 0b10, 0: 0b11}
    with open(base + ".bed", "wb") as f:
        f.write(bytes([0x6C, 0x1B, 0x01]))
        bpr = (n + 3) // 4
        for j in range(p):
            row = bytearray(bpr)
            for i in range(n):
                row[i >> 2] |= code[int(sim.geno[i, j])] << (2 * (i & 3))
            f.write(bytes(row))
    with open(base + ".bim", "w") as f:
        for name, c, bp in zip(sim.marker_names, sim.chrom, sim.pos):
            f.write(f"{c}\t{name}\t0\t{bp}\tA\tB\n")
    with open(base + ".fam", "w") as f:
        for i in range(n):
            f.write(f"FAM{i+1} IND{i+1} 0 0 {1 + int(sim.group[i])} "
                    f"{sim.y[i]:.6f}\n")


def write_vcf(sim: SimData, path: str) -> None:
    """Minimal VCF with GT fields (reference: ``ReadMarker(type='vcf')``).

    Note the orientation: VCF rows are SNPs, columns are individuals."""
    n, p = sim.geno.shape
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("##source=eagleeverything_tpu.simulate\n")
        header = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
        header += [f"IND{i+1}" for i in range(n)]
        f.write("\t".join(header) + "\n")
        gt = {0: "0/0", 1: "0/1", 2: "1/1", -9: "./."}
        for j in range(p):
            row = [str(sim.chrom[j]), str(sim.pos[j]), sim.marker_names[j],
                   "A", "B", ".", "PASS", ".", "GT"]
            row += [gt[int(sim.geno[i, j])] for i in range(n)]
            f.write("\t".join(row) + "\n")


def write_zmat(Z: np.ndarray, path: str) -> None:
    """0/1 incidence matrix, space-separated (reference: ``ReadZmat()``)."""
    np.savetxt(path, Z, fmt="%d")


def write_tutorial(outdir: str, n: int = 150, p: int = 5000, seed: int = 7) -> SimData:
    """Generate and write the full tutorial dataset in every format."""
    os.makedirs(outdir, exist_ok=True)
    sim = simulate_dataset(n=n, p=p, seed=seed)
    write_ascii_geno(sim, os.path.join(outdir, "geno.txt"))
    write_pheno(sim, os.path.join(outdir, "pheno.txt"))
    write_map(sim, os.path.join(outdir, "map.txt"))
    np.savetxt(os.path.join(outdir, "qtl_truth.txt"),
               np.c_[sim.qtl_idx, sim.qtl_beta], fmt="%.6f")
    return sim
