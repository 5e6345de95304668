#!/usr/bin/env python
"""Reproduce the resumed 5-column REML fit at 50k×1M with diagnostics
(the r4 scan6 NaN). Prints the δ-grid LLs, Krylov health, and solve
residuals so the NaN's birthplace is visible."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eagleeverything_tpu.utils.jaxinit import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from eagleeverything_tpu.api.read import GenoHandle  # noqa: E402
from eagleeverything_tpu.models import bigscan, engine_jax, reml_core  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cohort_run import _cohort_cfg  # noqa: E402

d = os.environ.get("EAGLE_COHORT_DIR", "/tmp/eagle_cohort")
with open(os.path.join(d, "meta.json")) as f:
    meta = json.load(f)
y = np.load(os.path.join(d, "y.npy"))
n, p = meta["n"], meta["p"]
handle = GenoHandle(n=n, p=p, source="cohort",
                    store_dir=os.path.join(d, "store"))
src = engine_jax._make_source(handle, None)
backend = engine_jax.TiledScan(src, _cohort_cfg("on"))
ctx = bigscan.make_context(backend, n)
col = backend.column_f64
selected = [3175, 3863, 922, 2366]
X = np.ones((n, 1))
for j in selected:
    X = np.hstack([X, col(j)[:, None]])

t0 = time.time()
Xi, _ = reml_core.independent_cols(X)
B = np.column_stack([Xi, y])
print(f"[dbg] X rank {Xi.shape[1]} of {X.shape[1]}; B finite:",
      bool(np.all(np.isfinite(B))), flush=True)

sk = bigscan.ShiftedKrylov(ctx.kernel_matvec, B, m=ctx.solve_m,
                           reorth=True, device_lanczos=ctx.device_lanczos)
print(f"[dbg] sk built in {time.time()-t0:.0f}s; w finite:",
      bool(np.all(np.isfinite(sk.w))), "w range",
      float(np.min(sk.w)), float(np.max(sk.w)),
      "znorm", sk.z_norm.tolist(), flush=True)

for d_ in np.exp(np.linspace(-6.0, 8.0, 25)):
    Sol = sk.solve(d_)
    ld = ctx.logdet(d_)
    ll, yPy = bigscan._ll_from_solution(y, Xi, Sol, ld)
    print(f"[dbg] delta={d_:10.4g} logdet={ld:14.3f} ll={ll:16.4f} "
          f"yPy={yPy:12.4f} sol_finite={bool(np.all(np.isfinite(Sol)))}",
          flush=True)
