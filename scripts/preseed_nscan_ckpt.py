#!/usr/bin/env python
"""Reconstruct the 500k-individual scan's iteration-0 checkpoint from the
round-4 run's committed evidence (docs/biobank_axis_n_result.json +
docs/biobank_axis_n_partial.jsonl).

The r4 run completed iteration 0 (candidate 254 ACCEPTED, extBIC
1304315.3189 -> 1291391.5893, initial delta=1.779) but was launched
without ckpt_dir wired (VERDICT r4 item 1), so no scan_state.json was
written before the round wall-clock SIGTERM. The genotype store and the
trait vector SURVIVED in /tmp/eagle_biobank, so the decision state those
logs record is exactly what bigscan's own save_scan_state would have
persisted: the selected list and the extBIC/loglik trajectory (loglik is
recovered from extBIC by inverting reml_core.extbic at the known k).

The seeded state deliberately OMITS meta["fit_exact"]: sigma2_g/e at the
post-accept model were never logged, so resume takes the refit path
(delta-hinted reml_maximize_matfree) and recomputes the exact fit before
sweep 1 — every forward decision value is computed fresh; only the
already-logged trajectory prefix is carried over.

Provenance is stamped into meta["seeded_from"] so the result JSON can
say which iterations were run live in which round.
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eagleeverything_tpu.models import reml_core
from eagleeverything_tpu.utils import checkpoint as ckpt

BASE = os.environ.get("EAGLE_BIOBANK_DIR", "/tmp/eagle_biobank")
CKPT = os.environ.get("EAGLE_CKPT", "/root/eagle_nscan_ckpt")

N, P, LAM = 500_000, 32_768, 1.0
# committed r4 evidence (docs/biobank_axis_n_result.json "events")
EXTBIC_0 = 1304315.3189        # initial model, k=0
EXTBIC_1 = 1291391.5893227712  # after accepting SNP 254, k=1 (jsonl, full prec.)
DELTA_0 = 1.779                # initial REML optimum (hint only)
SELECTED = [254]


def invert_extbic(e: float, k: int) -> float:
    """loglik from extBIC = -2*LL + k*log n + 2*lam*log C(p,k)."""
    return -(e - k * math.log(N) - 2.0 * LAM * reml_core.log_choose(P, k)) / 2.0


def main() -> None:
    y = np.load(os.path.join(BASE, "y_n.npy"))
    assert y.shape == (N,)
    ll0, ll1 = invert_extbic(EXTBIC_0, 0), invert_extbic(EXTBIC_1, 1)
    # round-trip check against the engine's own extbic()
    assert abs(reml_core.extbic(ll1, N, P, 1, LAM) - EXTBIC_1) < 1e-6
    ckpt.save_scan_state(
        CKPT, SELECTED,
        extbic_path=[EXTBIC_0, EXTBIC_1],
        loglik_path=[ll0, ll1],
        delta=DELTA_0, sigma2_g=0.0, sigma2_e=0.0,  # unused: no fit_exact
        meta={"trait_n": N, "p": P, "lam_ebic": LAM,
              "trait_sum": round(float(np.sum(y)), 6),
              "trait_sq": round(float(y @ y), 6),
              "seeded_from": "r4 logs (docs/biobank_axis_n_result.json); "
                             "iteration 0 ran 2026-08-21 round 4; no "
                             "fit_exact -> resume refits before sweep 1"})
    print(f"seeded {CKPT}/scan_state.json: selected={SELECTED} "
          f"ll0={ll0:.4f} ll1={ll1:.4f}")


if __name__ == "__main__":
    main()
