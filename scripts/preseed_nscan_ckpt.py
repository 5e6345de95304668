#!/usr/bin/env python
"""Reconstruct the 500k-individual scan's checkpoint from the committed
evidence (docs/biobank_axis_n_result.json), so the multi-hour scan can
resume on a FRESH host after the sandbox machine (and /tmp, and the
original /root checkpoint dir) is recycled between sessions.

The genotype store and the trait vector regenerate deterministically from
meta_n.json's seed (scripts/biobank_axes.py --axis n --gen); what is NOT
cheaply recomputable is the scan's decision state — the selected-marker
list and the extBIC/loglik trajectory — and, at biobank n, the exact
REML fit at the current model (tens of minutes of store passes). Both
are in the committed result JSON: the extBIC path is recorded at full
precision (loglik is recovered by inverting reml_core.extbic at each k),
and the r5 run's final exact fit (delta, sigma2_g, sigma2_e at the
k-marker model) was snapshotted, so the seeded state can stamp
meta["fit_exact"] and resume goes STRAIGHT to the next sweep — the same
fast-resume path bigscan's own checkpoint writer produces (the r5 run's
demonstrated mid-scan resumes re-entered in 67-71 s).

If the result JSON predates the fit snapshot (r4 format: iteration 0
only, no delta_final), fit_exact is omitted and resume takes the
delta-hinted refit path instead — every forward decision value is still
computed fresh; only the logged trajectory prefix is carried over.

Provenance is stamped into meta["seeded_from"] so the result JSON can
say which iterations were run live in which round.
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eagleeverything_tpu.models import reml_core
from eagleeverything_tpu.utils import checkpoint as ckpt

BASE = os.environ.get("EAGLE_BIOBANK_DIR", "/tmp/eagle_biobank")
CKPT = os.environ.get("EAGLE_CKPT", "/root/eagle_nscan_ckpt")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT = os.environ.get(
    "EAGLE_NSCAN_RESULT",
    os.path.join(REPO, "docs", "biobank_axis_n_result.json"))

LAM = 1.0


def invert_extbic(e: float, n: int, p: int, k: int) -> float:
    """loglik from extBIC = -2*LL + k*log n + 2*lam*log C(p,k)."""
    return -(e - k * math.log(n) - 2.0 * LAM * reml_core.log_choose(p, k)) / 2.0


def main() -> None:
    with open(RESULT) as f:
        res = json.load(f)
    n, p = int(res["n"]), int(res["p"])
    selected = [int(j) for j in res["selected"]]
    extbic_path = [float(v) for v in res["extbic_path"]]
    assert len(extbic_path) == len(selected) + 1, \
        "extbic_path must have one entry per accepted model incl. k=0"
    loglik_path = [invert_extbic(e, n, p, k)
                   for k, e in enumerate(extbic_path)]
    # round-trip check against the engine's own extbic()
    for k, (ll, e) in enumerate(zip(loglik_path, extbic_path)):
        assert abs(reml_core.extbic(ll, n, p, k, LAM) - e) < 1e-6

    y = np.load(os.path.join(BASE, "y_n.npy"))
    assert y.shape == (n,)

    meta = {"trait_n": n, "p": p, "lam_ebic": LAM,
            "trait_sum": round(float(np.sum(y)), 6),
            "trait_sq": round(float(y @ y), 6)}
    exact = "delta_final" in res and "sigma2_g" in res
    if exact:
        delta = float(res["delta_final"])
        s2g, s2e = float(res["sigma2_g"]), float(res["sigma2_e"])
        meta["fit_exact"] = True
        meta["seeded_from"] = (
            f"{os.path.basename(RESULT)} (committed run evidence): "
            f"k={len(selected)} exact fit snapshot -> resume enters the "
            f"next sweep directly")
    else:
        delta, s2g, s2e = float(res.get("delta_initial", 1.779)), 0.0, 0.0
        meta["seeded_from"] = (
            f"{os.path.basename(RESULT)} (committed run evidence, no fit "
            f"snapshot) -> resume refits at the delta hint before the "
            f"next sweep")
    ckpt.save_scan_state(CKPT, selected, extbic_path, loglik_path,
                         delta, s2g, s2e, meta=meta)
    print(f"seeded {CKPT}/scan_state.json: selected={selected} "
          f"k={len(selected)} fit_exact={exact} delta={delta:.6g}")


if __name__ == "__main__":
    main()
