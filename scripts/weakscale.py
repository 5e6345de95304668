#!/usr/bin/env python
"""Weak-scaling harness (BASELINE north star: ">=90% weak-scaling
efficiency, 500k x 5M, N>=2 hosts" — SURVEY.md §7 scaling row).

Runs the two SPMD scan paths at FIXED per-process shard size over
1/2/4/8 `jax.distributed` CPU processes on one machine and reports a
weak-scaling efficiency table:

  (a) sharded eigenbasis scan: per-iteration `sweep_eig` (cached-T local
      compute + the O(p) statistic gather) — the exact per-iteration
      device path of BASELINE configs 2-4;
  (b) matfree kernel matvec K·V (local stream + one host-f64 allreduce)
      — the per-CG-iteration unit of the biobank-n engine;
  (c) MMt formation (compute_K: local accumulate + n×n allreduce).

Per-phase the workers ALSO time the collective calls alone, so the
report separates "communication overhead" (what ICI would carry on TPU)
from "compute slowdown" (which on this CPU host includes core
oversubscription once N exceeds the core count — flagged per row).

HONESTY NOTE (recorded into the output): localhost CPU collectives are
gRPC loops, not ICI; they OVERSTATE latency and UNDERSTATE bandwidth
relative to a TPU pod slice. The collective-fraction column bounds the
damage: on TPU the same payload crosses ICI at >100 GB/s with ~µs
latency, so the TPU efficiency at equal shapes is >= 1 - (collective
fraction measured here). Core oversubscription (N > ncores) slows the
COMPUTE side only; rows where that bites are marked.

Usage: python scripts/weakscale.py [--quick] [--out weakscale.json]
       [--procs 1,2,4,8] [--n 512] [--p-local 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, time
# ONE compute thread per process: without this the N=1 baseline's XLA
# pool spans every core while the N-process points get 1/N of the
# machine each, and the "efficiency" measures thread-pool shrinkage,
# not communication. With 1 thread each, per-process compute is a
# constant and the efficiency isolates collective + runtime overhead
# (up to core oversubscription once N > ncores, flagged in the table).
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1 "
                           "--xla_cpu_multi_thread_eigen=false")
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["OPENBLAS_NUM_THREADS"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
nproc = int(os.environ["EAGLE_NUM_PROCS"])
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=os.environ["EAGLE_COORD_ADDR"],
        num_processes=nproc,
        process_id=int(os.environ["EAGLE_PROC_ID"]),
    )
import numpy as np
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.models import bigscan, engine_jax
from eagleeverything_tpu.utils import distributed
from eagleeverything_tpu.utils.config import EagleConfig

n = int(os.environ["WS_N"]); p_local = int(os.environ["WS_P_LOCAL"])
reps = int(os.environ["WS_REPS"])
store = os.environ["WS_STORE"]
src = engine_jax.StoreTileSource(store)
cfg = EagleConfig()
backend = (engine_jax.MultiHostTiledScan(src, cfg) if nproc > 1
           else engine_jax.TiledScan(src, cfg))
p_glob = getattr(backend, "p_global", src.p)
rng = np.random.default_rng(0)

def med(f, k=reps):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

out = {}

# (c) MMt formation: local accumulate + n^2 allreduce
t0 = time.perf_counter()
K = backend.compute_K()
out["mmt_s"] = time.perf_counter() - t0
out["mmt_collective_s"] = (
    med(lambda: distributed.allreduce_sum_f64(K)) if nproc > 1 else 0.0)

# (a) eigenbasis sweep: cached-T local compute + O(p) gather
d, U = np.linalg.eigh(engine_jax.normalized_kernel(K))
backend.set_eigenbasis(np.ascontiguousarray(U))
qmax = 8
s = 1.0 / np.sqrt(np.maximum(d, 0) + 1.0)
Q = np.linalg.qr(rng.standard_normal((n, qmax)))[0]
z3 = rng.standard_normal(n)
backend.sweep_eig(s, Q, z3, 1.0)   # compile + build T cache
out["sweep_eig_s"] = med(lambda: backend.sweep_eig(s, Q, z3, 1.0))
if nproc > 1:
    t_l = np.zeros(backend.src.p)
    out["sweep_gather_s"] = med(lambda: backend._gather_rows(t_l))
else:
    out["sweep_gather_s"] = 0.0

# (b) matfree kernel matvec: local stream + (n, r) allreduce
V = rng.standard_normal((n, 16))
backend.kernel_matvec(V)           # compile
out["matvec_s"] = med(lambda: backend.kernel_matvec(V))
KV = backend.kernel_matvec(V)
out["matvec_collective_s"] = (
    med(lambda: distributed.allreduce_sum_f64(KV)) if nproc > 1 else 0.0)

# (d) whole-CG-solve comparison: streamed host CG (one gRPC allreduce
# per iteration) vs the collective device Krylov (one jitted GSPMD
# program, XLA-inserted psum per iteration)
from eagleeverything_tpu.models import bigscan
B = rng.standard_normal((n, 8))
s0 = float(np.mean(np.diag(K)))
host_cg = lambda: bigscan.blocked_cg(
    lambda X: backend.kernel_matvec(X) / s0 + 0.5 * X, B, tol=1e-6)
host_cg()
out["cg_host_s"] = med(host_cg, k=max(2, reps // 2))
dev = backend.device_cg(B, 0.5, s0, tol=1e-6)
if dev is not None:
    out["cg_device_s"] = med(
        lambda: backend.device_cg(B, 0.5, s0, tol=1e-6),
        k=max(2, reps // 2))
else:
    out["cg_device_s"] = None

out["p_local"] = backend.src.p
out["p_global"] = p_glob
if int(os.environ["EAGLE_PROC_ID"]) == 0:
    with open(os.environ["WS_OUT"], "w") as f:
        json.dump(out, f)
print("worker", os.environ["EAGLE_PROC_ID"], "done", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_point(nproc: int, n: int, p_local: int, reps: int, tmp: str) -> dict:
    """One weak-scaling point: store with nproc*p_local SNPs, nproc procs."""
    import numpy as np

    sys.path.insert(0, REPO)
    from eagleeverything_tpu.io.genostore import GenotypeStore

    p_total = p_local * nproc
    store = os.path.join(tmp, f"store_{nproc}")
    if not os.path.isdir(store):
        rng = np.random.default_rng(7)
        geno = rng.integers(0, 3, size=(n, p_total), dtype=np.int8)
        GenotypeStore.create_from_dense(store, geno, n_shards=nproc,
                                        packed=True)
    out_file = os.path.join(tmp, f"ws_{nproc}.json")
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            EAGLE_COORD_ADDR=f"127.0.0.1:{port}",
            EAGLE_NUM_PROCS=str(nproc), EAGLE_PROC_ID=str(pid),
            WS_N=str(n), WS_P_LOCAL=str(p_local), WS_REPS=str(reps),
            WS_STORE=store, WS_OUT=out_file,
        )
        # hard-pin each worker to one core (taskset): XLA's CPU client
        # sizes its compute pool by visible cores regardless of flags, so
        # without affinity the N=1 baseline silently uses the whole
        # machine and "efficiency" measures thread contention
        ncores = os.cpu_count() or 1
        argv = [sys.executable, "-c", _WORKER]
        if shutil.which("taskset"):
            argv = ["taskset", "-c", str(pid % ncores)] + argv
        procs.append(subprocess.Popen(
            argv, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for pr in procs:
        out, _ = pr.communicate(timeout=900)
        if pr.returncode != 0:
            raise RuntimeError(
                f"worker failed (nproc={nproc}):\n"
                + out.decode(errors="replace")[-3000:])
    with open(out_file) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--p-local", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.quick:
        args.n, args.p_local, args.reps = 128, 2048, 3
        args.procs = "1,2"
    procs = [int(x) for x in args.procs.split(",")]
    ncores = os.cpu_count() or 1

    results = {}
    with tempfile.TemporaryDirectory(prefix="eagle_ws_") as tmp:
        for nproc in procs:
            print(f"[weakscale] N={nproc} "
                  f"(p_global={nproc * args.p_local}) ...", flush=True)
            results[nproc] = run_point(nproc, args.n, args.p_local,
                                       args.reps, tmp)

    base = results[procs[0]]
    report = {"n": args.n, "p_local": args.p_local, "ncores": ncores,
              "points": {}, "note": (
        "localhost CPU collectives (gRPC) overstate latency vs TPU ICI; "
        "rows with N > ncores additionally timeshare the compute — "
        "collective_fraction bounds the true communication cost")}
    hdr = (f"{'N':>3} {'phase':<12} {'t(1) s':>9} {'t(N) s':>9} "
           f"{'eff':>6} {'coll s':>8} {'coll%':>6} {'oversub':>8}")
    print("\n" + hdr)
    print("-" * len(hdr))
    for nproc in procs:
        r = results[nproc]
        pt = {}
        for phase, coll_key in (("sweep_eig", "sweep_gather_s"),
                                ("matvec", "matvec_collective_s"),
                                ("mmt", "mmt_collective_s")):
            key = f"{phase}_s"
            t1, tn = base[key], r[key]
            eff = t1 / tn if tn > 0 else float("nan")
            coll = r.get(coll_key, 0.0)
            frac = coll / tn if tn > 0 else 0.0
            over = "yes" if nproc > ncores else "no"
            print(f"{nproc:>3} {phase:<12} {t1:>9.4f} {tn:>9.4f} "
                  f"{eff:>6.2f} {coll:>8.4f} {100 * frac:>5.1f}% "
                  f"{over:>8}")
            pt[phase] = {"t_s": tn, "efficiency": round(eff, 4),
                         "collective_s": coll,
                         "collective_fraction": round(frac, 4),
                         "oversubscribed": nproc > ncores}
        pt["cg_host_s"] = r.get("cg_host_s")
        pt["cg_device_s"] = r.get("cg_device_s")
        if r.get("cg_device_s"):
            print(f"{nproc:>3} {'cg (full solve)':<12} host "
                  f"{r['cg_host_s']:.4f}s vs collective-device "
                  f"{r['cg_device_s']:.4f}s "
                  f"({r['cg_host_s'] / r['cg_device_s']:.2f}x)")
        report["points"][nproc] = pt

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"\n[weakscale] wrote {args.out}")


if __name__ == "__main__":
    main()
