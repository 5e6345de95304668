"""``am()`` — the multiple-locus forward-selection LMM scan.

Reference: ``AM()`` (SURVEY.md §3.1, call stack §4.2). This is the driver:
input validation and NA bookkeeping on the host, then dispatch to an
engine — the dense float64 oracle or the TPU-native JAX engine (sharded
MMt, device score sweeps, collective argmax) — both of which share the
same host-f64 REML/extBIC decision path (models/reml_core).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from eagleeverything_tpu.api.common import prepare_inputs
from eagleeverything_tpu.api.read import GenoHandle, MapHandle, PhenoHandle
from eagleeverything_tpu.models import oracle
from eagleeverything_tpu.models.oracle import AMResult
from eagleeverything_tpu.utils.config import DEFAULT_CONFIG, EagleConfig


def am(
    trait: str,
    geno: Union[GenoHandle, np.ndarray],
    pheno: Union[PhenoHandle, dict, np.ndarray],
    fformula: Optional[str] = None,
    map: Optional[MapHandle] = None,
    Zmat: Optional[np.ndarray] = None,
    maxit: int = 40,
    fixit: bool = False,
    lam: float = 1.0,
    quiet: bool = True,
    engine: str = "auto",
    config: EagleConfig = DEFAULT_CONFIG,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    log_jsonl: Optional[str] = None,
) -> AMResult:
    """Run the whole-genome multiple-locus scan (reference: ``AM()``).

    Args:
      trait: phenotype column name holding the trait.
      geno: handle from :func:`read_marker` (or a raw int8 {0,1,2,-9} n×p
        matrix for programmatic use).
      pheno: handle from :func:`read_pheno`, a dict of named columns, or a
        bare trait vector.
      fformula: fixed-effects formula RHS over phenotype columns
        (e.g. ``"age + sex"``); intercept is always included.
      map: optional marker map; selected markers are reported with
        name/chr/pos when given.
      Zmat: optional incidence matrix linking trait records to genotyped
        individuals (reference: ``ReadZmat``).
      maxit: maximum forward-selection steps (reference default 40).
      fixit: force exactly ``maxit`` selections, ignoring extBIC.
      lam: extBIC sparsity weight λ/gamma (calibrate with :func:`fpr4am`).
      engine: "auto" (JAX engine; switches to "matfree" above
        ``config.matfree_min_n`` individuals, where the n×n kernel no
        longer fits), "jax", "oracle", "sharded" (explicit multi-device
        shard_map path), or "matfree".
    """
    prep = prepare_inputs(trait, geno, pheno, fformula, Zmat)

    if engine == "auto":
        n_ind = prep.handle.n
        engine = "matfree" if n_ind > config.matfree_min_n else "jax"
    if engine == "oracle":
        geno_raw = prep.handle.materialize()
        if prep.keep_individuals is not None:
            geno_raw = geno_raw[prep.keep_individuals]
        res = oracle.forward_select(
            prep.y, prep.X0, geno_raw, maxit=maxit, fixit=fixit,
            lam_ebic=lam, Z=prep.Z, quiet=quiet,
        )
    elif engine in ("jax", "sharded"):
        from eagleeverything_tpu.models import engine_jax
        res = engine_jax.forward_select(
            prep.y, prep.X0, prep.handle, maxit=maxit, fixit=fixit,
            lam_ebic=lam, Z=prep.Z, quiet=quiet, config=config,
            keep_records=prep.keep_individuals, sharded=(engine == "sharded"),
            ckpt_dir=ckpt_dir, resume=resume, log_jsonl=log_jsonl,
        )
    elif engine == "matfree":
        # biobank n-scale mode: K never materialized — CG/SLQ REML and the
        # two-stage probe/exact score sweep (docs/design_biobank_scale.md).
        # In a multi-process SPMD run each host streams only its SNP range
        # and the kernel matvec psums across hosts (BASELINE config 4).
        import jax
        from eagleeverything_tpu.models import bigscan, engine_jax
        src = engine_jax._make_source(prep.handle, prep.keep_individuals)
        backend = (engine_jax.MultiHostTiledScan(src, config)
                   if jax.process_count() > 1
                   else engine_jax.TiledScan(src, config))
        res = bigscan.forward_select_matfree(
            prep.y, prep.X0, backend, maxit=maxit, fixit=fixit,
            lam_ebic=lam, quiet=quiet, Z=prep.Z, log_jsonl=log_jsonl,
            probes=config.matfree_probes,
            lanczos_m=config.matfree_lanczos_m,
            diag_probes=config.matfree_diag_probes,
            exact_topk=config.matfree_exact_topk,
            solve_m=config.matfree_solve_m,
            solve_m_refit=config.matfree_solve_m_refit,
            cache_max_bytes=int(config.matfree_cache_gb * 1e9),
            # backend.column_f64: local read single-process; owning-host
            # broadcast in SPMD (no shared-filesystem assumption)
            column_f64=backend.column_f64,
            ckpt_dir=ckpt_dir, resume=resume,
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")

    # enrich with map info (reference AMclass: Mrk/Chr/Pos)
    res.trait_name = trait
    res.dropped_records = prep.dropped
    handle = prep.handle
    if map is not None:
        if map.p != handle.p:
            raise ValueError(f"map has {map.p} rows but genotypes have {handle.p} SNPs")
        res.marker_names = [map.marker_names[j] for j in res.indices]
        res.chr = [str(map.chrom[j]) for j in res.indices]
        res.pos = [float(map.pos[j]) for j in res.indices]
    elif handle.marker_names is not None:
        res.marker_names = [handle.marker_names[j] for j in res.indices]
        res.chr = [str(handle.chrom[j]) for j in res.indices]
        res.pos = [float(handle.pos[j]) for j in res.indices]
    if not quiet:
        _print_result(res)
    return res


def am_multi(
    traits: list[str],
    geno: Union[GenoHandle, np.ndarray],
    pheno: Union[PhenoHandle, dict],
    fformula: Optional[str] = None,
    map: Optional[MapHandle] = None,
    maxit: int = 40,
    fixit: bool = False,
    lam: float = 1.0,
    quiet: bool = True,
    engine: str = "auto",
    config: EagleConfig = DEFAULT_CONFIG,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    log_jsonl: Optional[str] = None,
) -> dict[str, AMResult]:
    """Scan several traits in one pass (BASELINE config 5).

    MMt, its eigendecomposition, and the device genotype tiles are shared;
    per-iteration sweeps for all still-active traits are batched through
    the device together. Records with a missing value in ANY trait or
    covariate are dropped for all traits (union NA rule) so the shared
    kernel stays valid. Returns {trait_name: AMResult}.

    ``engine``: "auto" (eigenbasis engine; switches to "matfree" above
    ``config.matfree_min_n`` individuals — same routing as :func:`am`),
    "jax" (force eigenbasis), or "matfree" (force the lockstep matrix-
    free multi-trait scan sharing one union Krylov basis across traits,
    ``bigscan.forward_select_matfree_multi``).
    """
    from eagleeverything_tpu.api.design import build_design, na_rows
    from eagleeverything_tpu.models import engine_jax

    if isinstance(pheno, PhenoHandle):
        columns = pheno.columns
    else:
        columns = {k: np.asarray(v) for k, v in pheno.items()}
    missing = [t for t in traits if t not in columns]
    if missing:
        raise KeyError(f"traits {missing} not in phenotype columns "
                       f"{sorted(columns)}")
    ys_full = np.stack([np.asarray(columns[t], dtype=np.float64)
                        for t in traits])
    n_rec = ys_full.shape[1]
    X_full, _ = build_design(columns, fformula, n_rec)
    used = [ys_full[i] for i in range(len(traits))] + [
        X_full[:, j] for j in range(1, X_full.shape[1])]
    drop = na_rows(*used)
    keep = np.setdiff1d(np.arange(n_rec), drop)

    handle = geno if isinstance(geno, GenoHandle) else None
    if handle is None:
        arr = np.asarray(geno)
        handle = GenoHandle(n=arr.shape[0], p=arr.shape[1],
                            source="<array>", geno=arr)
    if handle.n != n_rec:
        raise ValueError(f"{n_rec} phenotype records vs {handle.n} individuals")

    if engine == "auto":
        engine = "matfree" if handle.n > config.matfree_min_n else "jax"
    if engine == "matfree":
        # biobank n-scale multi-trait: shared resident stack + ONE union
        # Krylov basis per iteration for every trait (BASELINE config 5
        # at config-4 n; VERDICT r3 item 6)
        import jax
        from eagleeverything_tpu.models import bigscan
        keep_idx = keep if len(keep) != n_rec else None
        src = engine_jax._make_source(handle, keep_idx)
        backend = (engine_jax.MultiHostTiledScan(src, config)
                   if jax.process_count() > 1
                   else engine_jax.TiledScan(src, config))
        results = bigscan.forward_select_matfree_multi(
            ys_full[:, keep], X_full[keep], backend,
            maxit=maxit, fixit=fixit, lam_ebic=lam, quiet=quiet,
            probes=config.matfree_probes,
            lanczos_m=config.matfree_lanczos_m,
            diag_probes=config.matfree_diag_probes,
            exact_topk=config.matfree_exact_topk,
            solve_m=config.matfree_solve_m,
            solve_m_refit=config.matfree_solve_m_refit,
            cache_max_bytes=int(config.matfree_cache_gb * 1e9),
            column_f64=backend.column_f64, trait_names=list(traits),
            log_jsonl=log_jsonl, ckpt_dir=ckpt_dir, resume=resume,
        )
    elif engine == "jax":
        results = engine_jax.forward_select_multi(
            ys_full[:, keep], X_full[keep], handle,
            maxit=maxit, fixit=fixit, lam_ebic=lam, quiet=quiet,
            config=config,
            keep_records=keep if len(keep) != n_rec else None,
            trait_names=list(traits),
        )
    else:
        raise ValueError(f"unknown engine {engine!r}")
    out = {}
    for res in results:
        res.dropped_records = drop
        if map is not None:
            res.marker_names = [map.marker_names[j] for j in res.indices]
            res.chr = [str(map.chrom[j]) for j in res.indices]
            res.pos = [float(map.pos[j]) for j in res.indices]
        out[res.trait_name] = res
        if not quiet:
            _print_result(res)
    return out


def _print_result(res: AMResult) -> None:
    print(f"\nAM scan complete: {len(res.indices)} marker(s) selected "
          f"(n={res.n}, p={res.p}, lambda={res.lam_ebic})")
    for rank, j in enumerate(res.indices):
        name = res.marker_names[rank] if res.marker_names else f"snp[{j}]"
        loc = (f" chr={res.chr[rank]} pos={res.pos[rank]:.0f}" if res.chr else "")
        print(f"  {rank+1}. {name} (index {j}){loc} "
              f"extBIC={res.extbic_path[rank+1]:.3f}")
