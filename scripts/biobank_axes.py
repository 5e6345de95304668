#!/usr/bin/env python
"""BASELINE config 4's axes instantiated at TRUE scale on this host.

The full 500k × 5M biobank config needs a pod + 625 GB of store; this
host (2 cores, 120 GB disk, one chip) can still run each AXIS at its
real size — which is where config 4's risks live (VERDICT r3 item 2):

  --axis n   n = 500,000 × p = 32,768 (≈4 GB packed, 2 shards):
             a PHYSICALLY split 2-process store (each process dir holds
             only its own shard) scanned end-to-end by am-engine matfree
             on the CPU mesh — CG/Lanczos/escalation/basis-cache budgets
             at the n where f64 n-vectors are 4 MB and the Krylov cache
             budget actually binds.
  --axis p   p = 5,000,000 × n = 2,048 (≈2.5 GB packed):
             ASCII no-space genotypes (10 GB text) → NATIVE ingest →
             packed store → ONE full matfree stat sweep + argmax —
             manifest/shard arithmetic and the O(p) statistic paths at
             the real p.

Usage:
  python scripts/biobank_axes.py --axis n --gen [--run]
  python scripts/biobank_axes.py --axis p --gen [--run]

Results land in docs/biobank_axis_{n,p}_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("EAGLE_BIOBANK_DIR", "/tmp/eagle_biobank")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_AXIS = dict(n=500_000, p=32_768, n_qtl=6, seed=11)
P_AXIS = dict(n=2_048, p=5_000_000, n_qtl=4, seed=12)


# ---------------------------------------------------------------------------
# axis n: 500k individuals × 32k SNPs, 2-process split store
# ---------------------------------------------------------------------------


def gen_n(dir: str, n_override: int = 0, p_override: int = 0) -> None:
    from eagleeverything_tpu.io.genostore import GenotypeStore

    n, p, n_qtl, seed = (N_AXIS[k] for k in ("n", "p", "n_qtl", "seed"))
    # --n/--p overrides: the COMBINED-axes config (VERDICT r4 item 7,
    # e.g. 131072 × 262144) reuses this generator + split-store worker
    # with both axes non-trivial; everything downstream reads meta_n.json
    n = n_override or n
    p = p_override or p
    os.makedirs(dir, exist_ok=True)
    full = os.path.join(dir, "store_full")
    rng = np.random.default_rng(seed)
    block = 512
    qtl_idx = np.sort(rng.choice(block, size=n_qtl, replace=False))
    qtl_cols = {}

    def blocks():
        t0 = time.perf_counter()
        for j0 in range(0, p, block):
            b = min(block, p - j0)
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
            if (j0 // block) % 16 == 0:
                el = time.perf_counter() - t0
                print(f"[gen-n] {j0 + b}/{p} SNPs ({el:.0f}s)", flush=True)
            yield j0, blk

    t0 = time.perf_counter()
    GenotypeStore.create_from_snp_blocks(
        full, blocks(), n=n, p=p, n_shards=2, packed=True,
        source=f"biobank-n-axis-seed{seed}")
    gen_s = time.perf_counter() - t0

    beta = rng.normal(0, 1.0, size=n_qtl) * np.sqrt(0.5 / n_qtl)
    g = sum(beta[i] * (qtl_cols[int(q)] - qtl_cols[int(q)].mean())
            for i, q in enumerate(qtl_idx))
    y = g + rng.normal(0, np.sqrt(max(1e-6, 1.0 - float(np.var(g)))), size=n)
    np.save(os.path.join(dir, "y_n.npy"), y)

    # physically split per-process dirs: manifest + OWN shard only
    for pid in (0, 1):
        d = os.path.join(dir, f"proc{pid}")
        os.makedirs(d, exist_ok=True)
        shutil.copy(os.path.join(full, "manifest.json"), d)
        shutil.move(os.path.join(full, f"shard_{pid:05d}.bin"),
                    os.path.join(d, f"shard_{pid:05d}.bin"))
    meta = {"axis": "n", **N_AXIS, "qtl_indices": [int(q) for q in qtl_idx],
            "beta": beta.tolist(), "gen_seconds": round(gen_s, 1)}
    with open(os.path.join(dir, "meta_n.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[gen-n] done in {gen_s:.0f}s", flush=True)


_WORKER_N = r"""
import json, os, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["EAGLE_COORD_ADDR"],
    num_processes=2, process_id=int(os.environ["EAGLE_PROC_ID"]))
pid = jax.process_index()
import numpy as np
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.models import bigscan, engine_jax
from eagleeverything_tpu.utils.config import EagleConfig

base = os.environ["EAGLE_BIOBANK_DIR"]
with open(os.path.join(base, "meta_n.json")) as f:
    meta = json.load(f)
y = np.load(os.path.join(base, "y_n.npy"))
n, p = meta["n"], meta["p"]
handle = GenoHandle(n=n, p=p, source="<split>",
                    store_dir=os.path.join(base, f"proc{pid}"))
src = engine_jax._make_source(handle, None)
cfg = EagleConfig(device_cache_gb=8.0)
backend = engine_jax.MultiHostTiledScan(src, cfg)
X0 = np.ones((n, 1))
t0 = time.time()
# Krylov depths sized to this 2-core host: every matvec at n=500k is
# ~1.3e11 flops × (r/8) through the CPU unpack, so probe widths and
# basis depths are the wall-clock. The DECISION path stays exact: the
# shortlist + escalation guard rescore by exact CG at cg_tol.
# checkpoint dir OUTSIDE /tmp (which is wiped between sessions): the scan
# state is kilobytes and the store regen is deterministic from its seed,
# so a killed multi-hour run resumes from the last accepted marker
ckpt_dir = os.environ.get("EAGLE_CKPT", "/root/eagle_nscan_ckpt")
_sp = os.path.join(ckpt_dir, "scan_state.json")
ck0 = json.load(open(_sp)) if os.path.exists(_sp) else {}
res = bigscan.forward_select_matfree(
    y, X0, backend, maxit=int(os.environ.get("EAGLE_MAXIT", "3")),
    probes=8, lanczos_m=12, diag_probes=16, exact_topk=2,
    solve_m=24, solve_m_refit=16, cache_max_bytes=8 << 30,
    cg_tol=1e-6, cg_maxiter=100,
    column_f64=backend.column_f64, quiet=(pid != 0),
    ckpt_dir=ckpt_dir, resume=True,
    log_jsonl=(os.path.join(base, "scan_n.jsonl") if pid == 0 else None))
wall = time.time() - t0
if pid == 0:
    out = {"axis": "n", "n": n, "p": p,
           "selected": res.indices, "extbic_path": res.extbic_path,
           "qtl_planted": meta["qtl_indices"],
           "selected_all_planted": all(j in meta["qtl_indices"]
                                       for j in res.indices),
           "escalation_exhausted": res.escalation_exhausted,
           "wall_seconds": round(wall, 1),
           "ckpt_dir": ckpt_dir,
           "resumed_from": ({"selected": ck0.get("selected"),
                             "provenance": ck0.get("meta", {})
                             .get("seeded_from", "scan_state.json written "
                                  "by a prior run of this script")}
                            if ck0 else None),
           "protocol": "2-process physically split store, CPU mesh, "
                       "collective matfree (probes=8 lanczos_m=12 "
                       "diag_probes=16 topk=2 solve_m=24/16 "
                       "cg_tol=1e-6)"}
    with open(os.environ["EAGLE_OUT"], "w") as f:
        json.dump(out, f, indent=1)
print("proc", pid, "done in", round(wall, 1), "s", flush=True)
"""


def run_n(dir: str, maxit: int, out_name: str = "biobank_axis_n_result.json",
          ckpt: str = "") -> None:
    out_file = os.path.join(REPO, "docs", out_name)
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(EAGLE_COORD_ADDR=f"127.0.0.1:{port}",
                   EAGLE_PROC_ID=str(pid), EAGLE_BIOBANK_DIR=dir,
                   EAGLE_OUT=out_file, EAGLE_MAXIT=str(maxit),
                   JAX_PLATFORMS="cpu")
        if ckpt:
            env["EAGLE_CKPT"] = ckpt
        logf = open(os.path.join(dir, f"run_n_proc{pid}.log"), "w")
        procs.append((subprocess.Popen(
            [sys.executable, "-c", _WORKER_N], env=env,
            stdout=logf, stderr=subprocess.STDOUT, cwd=REPO), logf))
    rc = [pr.wait() for pr, _ in procs]
    for _, f in procs:
        f.close()
    print(f"[run-n] exit codes {rc}; result at {out_file}", flush=True)
    if any(rc):
        for pid in (0, 1):
            with open(os.path.join(dir, f"run_n_proc{pid}.log")) as f:
                print(f"--- proc{pid} tail ---\n" + f.read()[-2000:])
        raise SystemExit(1)


# ---------------------------------------------------------------------------
# axis p: 5M SNPs × 2k individuals — native ingest + one sweep
# ---------------------------------------------------------------------------


def gen_p(dir: str) -> None:
    """10 GB no-space ASCII genotype file with planted QTL columns."""
    n, p, n_qtl, seed = (P_AXIS[k] for k in ("n", "p", "n_qtl", "seed"))
    os.makedirs(dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    qtl_idx = np.sort(rng.choice(p, size=n_qtl, replace=False))
    qtl_geno = rng.integers(0, 3, size=(n_qtl, n), dtype=np.uint8)
    path = os.path.join(dir, "geno_p.txt")
    t0 = time.perf_counter()
    with open(path, "wb", buffering=1 << 22) as f:
        for i in range(n):
            row = rng.integers(0, 3, size=p, dtype=np.uint8)
            row[qtl_idx] = qtl_geno[:, i]
            f.write((row + ord("0")).tobytes())
            f.write(b"\n")
            if i % 256 == 0:
                el = time.perf_counter() - t0
                print(f"[gen-p] row {i}/{n} ({el:.0f}s)", flush=True)
    write_s = time.perf_counter() - t0
    beta = rng.normal(0, 1.0, size=n_qtl) * np.sqrt(0.6 / n_qtl)
    W = qtl_geno.astype(np.float64)
    g = sum(beta[i] * (W[i] - W[i].mean()) for i in range(n_qtl))
    y = g + rng.normal(0, np.sqrt(max(1e-6, 1.0 - float(np.var(g)))), size=n)
    np.save(os.path.join(dir, "y_p.npy"), y)
    meta = {"axis": "p", **P_AXIS, "qtl_indices": [int(q) for q in qtl_idx],
            "beta": beta.tolist(), "text_bytes": os.path.getsize(path),
            "write_seconds": round(write_s, 1)}
    with open(os.path.join(dir, "meta_p.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[gen-p] wrote {os.path.getsize(path)/1e9:.1f} GB "
          f"in {write_s:.0f}s", flush=True)


def run_p(dir: str) -> None:
    from eagleeverything_tpu.api.read import read_marker
    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    with open(os.path.join(dir, "meta_p.json")) as f:
        meta = json.load(f)
    y = np.load(os.path.join(dir, "y_p.npy"))
    n, p = meta["n"], meta["p"]
    store = os.path.join(dir, "store_p")

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(store, "manifest.json")):
        handle = read_marker(os.path.join(dir, "geno_p.txt"), type="text",
                             AA="0", AB="1", BB="2", missing="9",
                             store_dir=store, n_shards=4, packed=True,
                             availmemGb=16.0,
                             ncpu=int(os.environ.get("EAGLE_NCPU", "0")))
        ingest_s = time.perf_counter() - t0
    else:
        from eagleeverything_tpu.api.read import GenoHandle
        handle = GenoHandle(n=n, p=p, source="<store>", store_dir=store)
        ingest_s = 0.0
    assert handle.n == n and handle.p == p, (handle.n, handle.p)

    # one full matfree stat sweep + argmax over all 5M SNPs
    src = engine_jax._make_source(handle, None)
    cfg = EagleConfig(device_cache_gb=8.0)
    backend = engine_jax.TiledScan(src, cfg)
    ctx = bigscan.make_context(backend, n, probes=16, lanczos_m=24)
    X0 = np.ones((n, 1))
    fit = bigscan.reml_maximize_matfree(ctx, y, X0)
    t1 = time.perf_counter()
    t, cand, info = bigscan.score_sweep_matfree(
        ctx, backend, y, X0, fit,
        diag_probes=int(os.environ.get("EAGLE_DIAG_PROBES", "32")),
        exact_topk=int(os.environ.get("EAGLE_TOPK", "8")),
        column_f64=backend.column_f64)
    sweep_s = time.perf_counter() - t1

    qtl = meta["qtl_indices"]
    out = {"axis": "p", "n": n, "p": p,
           "ingest_seconds": round(ingest_s, 1),
           "text_gb": round(meta["text_bytes"] / 1e9, 2),
           "sweep_seconds": round(sweep_s, 1),
           "snps_per_second_sweep": round(p / sweep_s, 1),
           "argmax": int(cand), "argmax_is_planted": bool(cand in qtl),
           "qtl_planted": qtl,
           "t_at_planted": [float(t[j]) for j in qtl],
           "t_quantiles": {q: float(np.quantile(t, float(q)))
                           for q in ("0.5", "0.99", "0.999")},
           "escalation": info,
           "column_roundtrip_ok": bool(_col_check(backend, meta))}
    out_file = os.path.join(REPO, "docs", "biobank_axis_p_result.json")
    with open(out_file, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def _col_check(backend, meta) -> bool:
    """Random + QTL column reads at 5M-scale offsets: the manifest/shard
    arithmetic must address the right bytes at the REAL p."""
    rng = np.random.default_rng(0)
    p = meta["p"]
    ok = True
    for j in list(meta["qtl_indices"]) + [0, p - 1] + list(
            rng.integers(0, p, size=4)):
        col = backend.column_f64(int(j))
        ok &= col.shape[0] == meta["n"] and np.all(np.isfinite(col))
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--axis", choices=["n", "p"], required=True)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--maxit", type=int, default=3)
    ap.add_argument("--dir", default=BASE)
    ap.add_argument("--n", type=int, default=0,
                    help="override n for --axis n (combined-axes runs)")
    ap.add_argument("--p", type=int, default=0,
                    help="override p for --axis n (combined-axes runs)")
    ap.add_argument("--out-name", default="biobank_axis_n_result.json",
                    help="result filename under docs/ for --axis n")
    ap.add_argument("--ckpt", default="",
                    help="checkpoint dir override for --axis n")
    args = ap.parse_args()
    if args.axis == "n":
        if args.gen:
            gen_n(args.dir, args.n, args.p)
        if args.run:
            run_n(args.dir, args.maxit, args.out_name, args.ckpt)
    else:
        if args.gen:
            gen_p(args.dir)
        if args.run:
            run_p(args.dir)


if __name__ == "__main__":
    main()
