#!/usr/bin/env python
"""Write docs/biobank_axis_n_result.json from the LIVE 500k-scan state
(ScanLogger events + the engine checkpoint), for use when the round
wall-clock ends before forward_select_matfree returns naturally.

Unlike r4 (where the killed run's progress was unrecoverable), every
accepted iteration now lives in /root/eagle_nscan_ckpt/scan_state.json
and resumes exactly — this writer just assembles the committed evidence.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("EAGLE_BIOBANK_DIR", "/tmp/eagle_biobank")
CKPT = os.environ.get("EAGLE_CKPT", "/root/eagle_nscan_ckpt")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(BASE, "meta_n.json")) as f:
        meta = json.load(f)
    with open(os.path.join(CKPT, "scan_state.json")) as f:
        state = json.load(f)
    events = []
    with open(os.path.join(BASE, "scan_n.jsonl")) as f:
        for ln in f:
            events.append(json.loads(ln))
    y = np.load(os.path.join(BASE, "y_n.npy"))
    fp = (round(float(np.sum(y)), 6), round(float(y @ y), 6))
    m = state.get("meta", {})
    assert (m.get("trait_sum"), m.get("trait_sq")) == fp, \
        "checkpoint does not match the live trait"
    qtl = meta["qtl_indices"]
    sel = [int(j) for j in state["selected"]]
    out = {
        "axis": "n", "n": meta["n"], "p": meta["p"],
        "status": f"{len(sel)} accepted iterations (round wall-clock; "
                  "resumable from the committed checkpoint state)",
        "selected": sel,
        "selected_all_planted": all(j in qtl for j in sel),
        "qtl_planted": qtl,
        "extbic_path": state["extbic_path"],
        "delta_final": state["delta"],
        "sigma2_g": state["sigma2_g"], "sigma2_e": state["sigma2_e"],
        "ckpt_dir": CKPT,
        "resume_demo": [e for e in events if e.get("event") == "resume"],
        "iteration_events": [e for e in events
                             if e.get("event") == "iteration"],
        "phase_events": [e for e in events if e.get("event") == "phase"],
        "protocol": "2-process PHYSICALLY split store (each process dir "
                    "holds only its own ~2 GB packed shard), CPU mesh, "
                    "collective matfree engine (probes=8 lanczos_m=12 "
                    "diag_probes=16 topk=2 solve_m=24/16 cg_tol=1e-6), "
                    "scripts/biobank_axes.py --axis n, checkpoint/resume "
                    "wired (VERDICT r4 item 1)",
    }
    path = os.path.join(REPO, "docs", "biobank_axis_n_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1)[:1200])
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
