#!/usr/bin/env python
"""BASELINE config 3 at TRUE scale: 50k individuals x 1M SNPs, one host.

Two phases (resumable — the packed store is the durable artifact,
SURVEY.md §6.4):

  --gen   stream-generate the 2-bit packed genotype store (12.5 GB on
          disk; never materializes the 50 GB dense matrix) plus a trait
          with planted QTL and a phenotype file.
  --run   run the scan end-to-end on the real chip with phase logging
          (MMt, eigh, T-stream sweep per iteration) via --log-jsonl.

Usage:
  python scripts/cohort_run.py --gen  [--n 50000] [--p 1000000]
  python scripts/cohort_run.py --run  [--maxit 3]
  (both flags together do gen-if-absent then run)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DIR = os.environ.get("EAGLE_COHORT_DIR", "/tmp/eagle_cohort")


def generate(dir: str, n: int, p: int, n_qtl: int = 8,
             seed: int = 7, block: int = 4096) -> None:
    from eagleeverything_tpu.io.genostore import GenotypeStore

    os.makedirs(dir, exist_ok=True)
    store_dir = os.path.join(dir, "store")
    rng = np.random.default_rng(seed)
    # QTL planted in the first block so their columns are kept in memory
    qtl_idx = np.sort(rng.choice(block, size=n_qtl, replace=False))
    qtl_cols = {}

    def blocks():
        t0 = time.perf_counter()
        for j0 in range(0, p, block):
            b = min(block, p - j0)
            # per-SNP MAF in [0.05, 0.5]; HWE genotypes 0/1/2. uint16
            # randoms + two thresholded bool views: ~4× less random bits
            # and no int64 temporaries vs the float64 formulation (13 min
            # for the full 50k×1M store on this 2-core host, not 7.5 h).
            # 16-bit thresholds keep quantization ≤1.5e-5 per class even
            # at small maf (uint8 floored 256·maf² to 0 below maf=0.0625,
            # zeroing the hom-alt class — ADVICE r3)
            maf = rng.uniform(0.05, 0.5, size=(b, 1))
            t_hom = np.broadcast_to(
                np.rint(65536.0 * maf**2).astype(np.uint16), (b, n))
            t_het = np.broadcast_to(
                np.rint(65536.0 * (maf**2 + 2 * maf * (1 - maf))
                        ).astype(np.uint16), (b, n))
            u = rng.integers(0, 65536, size=(b, n), dtype=np.uint16)
            lt1 = np.empty((b, n), dtype=bool)
            lt2 = np.empty((b, n), dtype=bool)
            np.less(u, t_hom, out=lt1)
            np.less(u, t_het, out=lt2)
            blk = lt1.view(np.int8) + lt2.view(np.int8)
            if j0 == 0:
                for q in qtl_idx:
                    qtl_cols[int(q)] = blk[q].astype(np.float64)
            if j0 % (block * 32) == 0:
                el = time.perf_counter() - t0
                done = j0 + b
                print(f"[gen] {done}/{p} SNPs ({el:.0f}s, "
                      f"{done / max(el, 1e-9) / 1e3:.1f}k SNPs/s)",
                      flush=True)
            yield j0, blk
    t0 = time.perf_counter()
    GenotypeStore.create_from_snp_blocks(
        store_dir, blocks(), n=n, p=p, n_shards=8, packed=True,
        source=f"cohort-sim-seed{seed}")
    gen_s = time.perf_counter() - t0

    beta = rng.normal(0, 1.0, size=n_qtl) * np.sqrt(0.4 / n_qtl)
    g = sum(beta[i] * (qtl_cols[int(q)] - qtl_cols[int(q)].mean())
            for i, q in enumerate(qtl_idx))
    y = g + rng.normal(0, np.sqrt(max(1e-6, 1.0 - float(np.var(g)))), size=n)
    np.save(os.path.join(dir, "y.npy"), y)
    meta = {"n": n, "p": p, "qtl_indices": [int(q) for q in qtl_idx],
            "beta": beta.tolist(), "seed": seed, "gen_seconds": gen_s,
            "store_bytes": sum(
                os.path.getsize(os.path.join(store_dir, f))
                for f in os.listdir(store_dir))}
    with open(os.path.join(dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[gen] done in {gen_s:.0f}s; store "
          f"{meta['store_bytes'] / 1e9:.2f} GB", flush=True)


def _cohort_cfg(pallas: str, host_eigh_max_n: int = 32768):
    """Engine config for the 50k×1M scan. ``pallas``: 'on'/'off' force
    the fused kernels; 'auto' lets the engine's 14 GB total-HBM gate
    decide (the int32-typed stack removed the r3 uint8 layout-copy OOM —
    measure with --pallas-bench before committing a long scan)."""
    from eagleeverything_tpu.utils.config import EagleConfig
    flag = {"on": True, "off": False, "auto": None}[pallas]
    # device_cache_gb=14.5 admits the DEVICE-RESIDENT PACKED STACK at
    # 50k×1M (12.5 GB of 2-bit bytes in 16 GB v5e HBM; engine_jax
    # _packed_stack): every Krylov matvec / probe sweep is then an
    # HBM-bandwidth pass with in-loop unpack instead of re-streaming the
    # store host→device. snp_tile=1024 bounds the unpacked f32 transient
    # to ~200 MB per loop step.
    return EagleConfig(host_eigh_max_n=host_eigh_max_n,
                       device_cache_gb=14.5, snp_tile=1024,
                       pallas_packed=flag)


def pallas_bench(dir: str) -> None:
    """Measure the fused Pallas kernels vs the XLA in-loop unpack at the
    TRUE 50k×1M stack (VERDICT r3 item 3): kernel_matvec (the Krylov
    unit) and matfree_stat_rows (the per-iteration sweep) both ways,
    with equivalence checks. Writes docs/pallas_cohort_bench.json."""
    from eagleeverything_tpu.models import engine_jax
    from eagleeverything_tpu.utils.jaxinit import enable_compilation_cache
    enable_compilation_cache()

    with open(os.path.join(dir, "meta.json")) as f:
        meta = json.load(f)
    n = meta["n"]
    rng = np.random.default_rng(0)
    V = rng.standard_normal((n, 8)).astype(np.float64)
    A = rng.standard_normal((n, 10))
    Minv = np.ones((1, 1))
    out = {"n": n, "p": meta["p"]}
    for mode, flag in (("xla", "off"), ("pallas", "on")):
        src = engine_jax.StoreTileSource(os.path.join(dir, "store"))
        scan = engine_jax.TiledScan(src, _cohort_cfg(flag))
        t0 = time.perf_counter()
        assert scan._packed_stack() is not None, "stack ineligible"
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        kv = scan.kernel_matvec(V)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            kv = scan.kernel_matvec(V)
            ts.append(time.perf_counter() - t0)
        st0 = time.perf_counter()
        rows = scan.matfree_stat_rows(A, 1, Minv)
        stats_compile_s = time.perf_counter() - st0
        st = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = scan.matfree_stat_rows(A, 1, Minv)
            st.append(time.perf_counter() - t0)
        out[mode] = {
            "stack_upload_s": round(up, 1),
            "matvec_s_median": round(float(np.median(ts)), 3),
            "matvec_first_s": round(compile_s, 1),
            "stats_s_median": round(float(np.median(st)), 3),
            "stats_first_s": round(stats_compile_s, 1),
            "kv_checksum": float(np.sum(kv)),
            "stats_checksum": float(np.sum(rows[0])),
        }
        del scan, src
        print(f"[pallas-bench] {mode}: {out[mode]}", flush=True)
    x, p_ = out["xla"], out["pallas"]
    out["matvec_speedup"] = round(x["matvec_s_median"]
                                  / p_["matvec_s_median"], 3)
    out["stats_speedup"] = round(x["stats_s_median"]
                                 / p_["stats_s_median"], 3)
    out["kv_rel_err"] = abs(x["kv_checksum"] - p_["kv_checksum"]) / (
        abs(x["kv_checksum"]) + 1e-30)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "pallas_cohort_bench.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def rescore_truth(dir: str) -> None:
    """Power cross-check (VERDICT r3 item 7): under the scan's FINAL
    model, exact-rescore every planted truth SNP — outlier t and the
    extBIC delta its addition would give — turning 'the stop was
    correct on this trait's power' from assertion into evidence.
    Writes docs/cohort_power_check.json."""
    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.models import bigscan, engine_jax, reml_core
    from eagleeverything_tpu.utils.jaxinit import enable_compilation_cache
    enable_compilation_cache()

    with open(os.path.join(dir, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(dir, "result.json")) as f:
        result = json.load(f)
    y = np.load(os.path.join(dir, "y.npy"))
    n, p = meta["n"], meta["p"]
    handle = GenoHandle(n=n, p=p, source="cohort",
                        store_dir=os.path.join(dir, "store"))
    src = engine_jax._make_source(handle, None)
    backend = engine_jax.TiledScan(src, _cohort_cfg("off"))
    ctx = bigscan.make_context(backend, n)
    col = backend.column_f64

    selected = [int(j) for j in result["selected"]]
    X = np.ones((n, 1))
    for j in selected:
        X = np.hstack([X, col(j)[:, None]])
    # re-enter the delta-search at the scan's checkpointed optimum: the
    # unhinted profile at a multi-marker X can edge-peak at tiny delta
    # (SLQ smears near-zero spectrum mass into a spurious boundary
    # divergence); the hinted fit keeps the base extBIC on the scan's
    # own delta scale
    hint = None
    try:
        from eagleeverything_tpu.utils import checkpoint as ckptmod
        st = ckptmod.load_scan_state(os.path.join(dir, "ckpt"))
        if st is not None:
            hint = float(st.get("delta"))
    except Exception:
        pass
    fit, sk = bigscan.reml_maximize_matfree(ctx, y, X, return_sk=True,
                                            delta_hint=hint)
    ebic_base = reml_core.extbic(fit.loglik, n, p, len(selected), 1.0)

    B = np.column_stack([X, y])
    Sol = ctx.solve_block(fit.delta, B,
                          x0=sk.solve(fit.delta) if sk else None)
    q = X.shape[1]
    HiX, Hiy = Sol[:, :q], Sol[:, q]
    XtHiX = X.T @ HiX
    Py = Hiy - HiX @ np.linalg.solve(XtHiX, X.T @ Hiy)
    XtHiX_inv = np.linalg.inv(XtHiX)

    truth = [int(j) for j in meta["qtl_indices"]]
    rows = []
    for j in truth:
        w = col(j)
        Hiw = ctx.solve_block(fit.delta, w[:, None])[:, 0]
        ahat = float(w @ Py)
        u = HiX.T @ w
        vara = fit.sigma2_g * max(
            float(w @ Hiw) - float(u @ XtHiX_inv @ u), 1e-12)
        t_j = ahat * ahat / vara if vara > 1e-12 else 0.0
        row = {"snp": j, "selected": j in selected, "t": round(t_j, 3)}
        if j not in selected:
            fit_j = bigscan.reml_maximize_matfree(
                ctx, y, np.hstack([X, w[:, None]]), delta_hint=fit.delta)
            ebic_j = reml_core.extbic(fit_j.loglik, n, p,
                                      len(selected) + 1, 1.0)
            row["extbic_delta_if_added"] = round(ebic_j - ebic_base, 3)
        rows.append(row)
        print(f"[power-check] {row}", flush=True)

    out = {"config": result.get("config"), "n": n, "p": p,
           "selected": selected, "extbic_base": round(ebic_base, 3),
           "delta": fit.delta, "truth_snps": rows,
           "note": "extbic_delta_if_added > 0 means adding that truth "
                   "SNP would WORSEN extBIC — the scan's stop was the "
                   "criterion-correct decision for this trait's power"}
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "cohort_power_check.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def run(dir: str, maxit: int, engine: str,
        host_eigh_max_n: int = 32768, pallas: str = "off") -> None:
    from eagleeverything_tpu.api.am import am
    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.utils.config import EagleConfig
    from eagleeverything_tpu.utils.jaxinit import enable_compilation_cache

    enable_compilation_cache()
    with open(os.path.join(dir, "meta.json")) as f:
        meta = json.load(f)
    y = np.load(os.path.join(dir, "y.npy"))
    handle = GenoHandle(n=meta["n"], p=meta["p"], source="cohort",
                        store_dir=os.path.join(dir, "store"))
    log = os.path.join(dir, "scan_log.jsonl")
    cfg = _cohort_cfg(pallas, host_eigh_max_n)
    ckpt = os.path.join(dir, "ckpt")
    t0 = time.perf_counter()
    res = am("y", handle, {"y": y}, maxit=maxit, engine=engine,
             quiet=False, log_jsonl=log, config=cfg,
             ckpt_dir=ckpt, resume=os.path.exists(ckpt))
    wall = time.perf_counter() - t0
    out = {
        "config": "BASELINE-3 (50k x 1M, 1 host)" if meta["n"] >= 50000
                  else f"cohort {meta['n']} x {meta['p']}",
        "n": meta["n"], "p": meta["p"], "engine": engine,
        "selected": res.indices, "qtl_truth": meta["qtl_indices"],
        "extbic_path": res.extbic_path, "wall_seconds": round(wall, 1),
        "iterations": len(res.extbic_path),
    }
    with open(os.path.join(dir, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def warm_sweep(dir: str, pallas: str = "on") -> None:
    """Measure ONE warm steady-state sweep at the checkpointed model
    (VERDICT r4 item 4's 'Done' row): resume state from the scan
    checkpoint, delta-hinted refit, then one full score_sweep_matfree —
    reporting wall, escalation rounds, and the stack-pass dispatch count
    (backend.stack_passes). r4 baseline: 136–163 s with ~77 s of
    sequential escalation-CG rescoring; the merged escalation + batched
    rescore should land ≤100 s."""
    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils import checkpoint as ckpt
    from eagleeverything_tpu.utils.jaxinit import enable_compilation_cache

    enable_compilation_cache()
    with open(os.path.join(dir, "meta.json")) as f:
        meta = json.load(f)
    y = np.load(os.path.join(dir, "y.npy"))
    state = ckpt.load_scan_state(os.path.join(dir, "ckpt"))
    assert state is not None, "no scan checkpoint — run --run first"
    handle = GenoHandle(n=meta["n"], p=meta["p"], source="cohort",
                        store_dir=os.path.join(dir, "store"))
    src = engine_jax._make_source(handle, None)
    backend = engine_jax.TiledScan(src, _cohort_cfg(pallas))
    selected = [int(j) for j in state["selected"]]
    X = np.ones((meta["n"], 1))
    for j in selected:
        X = np.hstack([X, backend.column_f64(j)[:, None]])
    ctx = bigscan.make_context(backend, meta["n"])
    ctx.solve_m, ctx.solve_m_refit = 128, 64

    t0 = time.perf_counter()
    d0 = backend.stack_passes
    fit, sk = bigscan.reml_maximize_matfree(
        ctx, y, X, delta_hint=state.get("delta"), return_sk=True)
    refit_s = time.perf_counter() - t0
    refit_passes = backend.stack_passes - d0

    t1 = time.perf_counter()
    d1 = backend.stack_passes
    t, cand, info = bigscan.score_sweep_matfree(
        ctx, backend, y, X, fit, column_f64=backend.column_f64,
        exclude=selected, sol0=sk.solve(fit.delta) if sk else None)
    sweep_s = time.perf_counter() - t1
    out = {
        "what": "warm steady-state sweep at the checkpointed "
                f"{len(selected)}-marker model (50k x 1M)",
        "selected_model": selected,
        "refit_s": round(refit_s, 1), "refit_stack_passes": refit_passes,
        "sweep_s": round(sweep_s, 1),
        "sweep_stack_passes": backend.stack_passes - d1,
        "snps_per_s": round(meta["p"] / sweep_s, 1),
        "candidate": int(cand), "t_cand": float(t[cand]),
        "escalation": info, "pallas": pallas,
    }
    with open(os.path.join(dir, "warm_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=DEFAULT_DIR)
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--p", type=int, default=1000000)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--maxit", type=int, default=3)
    # matfree is the ONLY single-chip-feasible engine at 50k×1M: the
    # eigenbasis path needs T = Wᵀ·U once per scan — 2·n²·p ≈ 5×10^18
    # flops (≈7 h of v5e peak) plus a 200 GB T cache — while matfree is
    # O(n·p·r) per iteration over the HBM-resident packed stack. "auto"
    # routes here too (n > matfree_min_n = 32768).
    ap.add_argument("--engine", default="matfree")
    ap.add_argument("--pallas", default="off",
                    choices=["auto", "on", "off"],
                    help="fused unpack-GEMM kernels for the resident "
                         "stack (measure with --pallas-bench first)")
    ap.add_argument("--pallas-bench", action="store_true",
                    help="measure Pallas vs XLA matvec/stats at the "
                         "true stack size, then exit")
    ap.add_argument("--rescore-truth", action="store_true",
                    help="power cross-check: exact t + extBIC delta of "
                         "every planted truth SNP under the final model")
    ap.add_argument("--warm-sweep", action="store_true",
                    help="measure one warm steady-state sweep at the "
                         "checkpointed model (wall + dispatch count)")
    args = ap.parse_args()
    if args.gen or not os.path.exists(os.path.join(args.dir, "meta.json")):
        generate(args.dir, args.n, args.p)
    if args.pallas_bench:
        return pallas_bench(args.dir)
    if args.warm_sweep:
        return warm_sweep(args.dir, "on" if args.pallas == "auto"
                          else args.pallas)
    if args.run:
        run(args.dir, args.maxit, args.engine, pallas=args.pallas)
    if args.rescore_truth:
        rescore_truth(args.dir)


if __name__ == "__main__":
    main()
