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

# (e) matfree stat-rows pass: the (batched) sweep's per-iteration device
# unit — one local dot block over the shard; its only cross-host cost is
# the O(p) statistic gather, timed as the collective component. R traits
# ride the SAME pass (matfree_stat_rows_multi), so this row's collective
# fraction bounds the batched multi-trait sweep too.
A_sr = np.ascontiguousarray(rng.standard_normal((n, 1 + 8 + 16)))
Minv_sr = np.eye(8)
backend.matfree_stat_rows(A_sr, 8, Minv_sr)
out["statrows_s"] = med(lambda: backend.matfree_stat_rows(A_sr, 8, Minv_sr))
if nproc > 1:
    te_l = np.zeros(backend.src.p)
    out["statrows_collective_s"] = med(lambda: (
        distributed.allgather_concat_f64(te_l, backend.local_sizes)))
else:
    out["statrows_collective_s"] = 0.0

# collective payload bytes per phase — published so the report can state
# the ICI/DCN time budget these payloads imply at pod scale
out["payload_bytes"] = {
    "mmt": n * n * 8, "matvec": n * 16 * 8,
    "sweep_eig": int(p_glob * 8), "statrows": int(p_glob * 8)}

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


PHASES = (("sweep_eig", "sweep_gather_s"),
          ("matvec", "matvec_collective_s"),
          ("mmt", "mmt_collective_s"),
          ("statrows", "statrows_collective_s"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--p-local", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=5,
                    help="independent repeats of EVERY point; efficiencies "
                         "are paired per round and the MEDIAN across "
                         "rounds is reported with its min..max spread "
                         "(r3's single-pair numbers moved by ±0.1-0.4 "
                         "between same-day runs — VERDICT r3 item 4)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.quick:
        args.n, args.p_local, args.reps = 128, 2048, 3
        args.procs = "1,2"
        args.rounds = 2
    procs = [int(x) for x in args.procs.split(",")]
    ncores = os.cpu_count() or 1

    # rounds outer, procs inner: each round yields one PAIRED set of
    # points measured back-to-back, so per-round efficiency ratios see
    # the same machine state and the across-round median absorbs drift
    rounds: list[dict] = []
    with tempfile.TemporaryDirectory(prefix="eagle_ws_") as tmp:
        for rd in range(args.rounds):
            results = {}
            for nproc in procs:
                print(f"[weakscale] round {rd + 1}/{args.rounds} "
                      f"N={nproc} (p_global={nproc * args.p_local}) ...",
                      flush=True)
                results[nproc] = run_point(nproc, args.n, args.p_local,
                                           args.reps, tmp)
            rounds.append(results)

    import numpy as np
    report = {"n": args.n, "p_local": args.p_local, "ncores": ncores,
              "rounds": args.rounds, "points": {}, "note": (
        "localhost CPU collectives (gRPC) overstate latency vs TPU ICI; "
        "rows with N > ncores additionally timeshare the compute — "
        "collective_fraction bounds the true communication cost. "
        "HEADLINE: the structurally sound claim is the collective "
        "fraction (tpu_efficiency_lower_bound = 1 - collective_fraction "
        "at equal shapes, since TPU ICI moves the same payload with ~µs "
        "latency at >100 GB/s); the measured CPU efficiencies support "
        "it but carry this host's scheduler noise, quoted as min..max "
        "across the paired rounds.")}
    hdr = (f"{'N':>3} {'phase':<10} {'t(N) med s':>11} {'eff med':>8} "
           f"{'eff range':>13} {'coll% med':>10} {'oversub':>8}")
    print("\n" + hdr)
    print("-" * len(hdr))
    for nproc in procs:
        pt = {}
        for phase, coll_key in PHASES:
            key = f"{phase}_s"
            tns = np.array([r[nproc][key] for r in rounds], float)
            effs = np.array([r[procs[0]][key] / r[nproc][key]
                             for r in rounds if r[nproc][key] > 0])
            fracs = np.array([r[nproc].get(coll_key, 0.0) / r[nproc][key]
                              for r in rounds if r[nproc][key] > 0])
            over = "yes" if nproc > ncores else "no"
            print(f"{nproc:>3} {phase:<10} {np.median(tns):>11.4f} "
                  f"{np.median(effs):>8.2f} "
                  f"{effs.min():>6.2f}..{effs.max():<5.2f} "
                  f"{100 * np.median(fracs):>9.1f}% {over:>8}")
            pt[phase] = {
                "t_s_median": float(np.median(tns)),
                "t_s_range": [float(tns.min()), float(tns.max())],
                "efficiency_median": round(float(np.median(effs)), 4),
                "efficiency_range": [round(float(effs.min()), 4),
                                     round(float(effs.max()), 4)],
                "collective_fraction_median": round(
                    float(np.median(fracs)), 4),
                "tpu_efficiency_lower_bound": round(
                    1.0 - float(np.median(fracs)), 4),
                "oversubscribed": nproc > ncores,
            }
        cgh = [r[nproc].get("cg_host_s") for r in rounds]
        cgd = [r[nproc].get("cg_device_s") for r in rounds]
        pt["cg_host_s_median"] = (float(np.median([x for x in cgh if x]))
                                  if any(cgh) else None)
        pt["cg_device_s_median"] = (float(np.median([x for x in cgd if x]))
                                    if any(cgd) else None)
        pt["collective_payload_bytes"] = rounds[0][nproc].get(
            "payload_bytes")
        report["points"][nproc] = pt

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"\n[weakscale] wrote {args.out}")


if __name__ == "__main__":
    main()
