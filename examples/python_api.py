"""End-to-end Python-API walk-through (the reference vignette's
ReadMarker → ReadPheno → ReadMap → AM → SummaryAM → PlotAM flow,
SURVEY.md §5, plus the FPR calibration and the matrix-free engine).

Run from the repo root:  python examples/python_api.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import eagleeverything_tpu as ee

HERE = os.path.join(os.path.dirname(__file__), "tutorial")

# 1. ingest -----------------------------------------------------------------
geno = ee.read_marker(os.path.join(HERE, "geno.txt"), type="text")
pheno = ee.read_pheno(os.path.join(HERE, "pheno.txt"))
map_h = ee.read_map(os.path.join(HERE, "map.txt"))
print(f"genotypes: {geno.n} individuals x {geno.p} SNPs")

# 2. scan (reference AM()) ----------------------------------------------------
res = ee.am(trait="y", fformula="age + sex", geno=geno, pheno=pheno,
            map=map_h, maxit=8, quiet=False)
print("selected:", res.marker_names)

# 3. inference (reference SummaryAM()) ---------------------------------------
s = ee.summary_am(res, trait="y", geno=geno, pheno=pheno)

# 4. plot (reference PlotAM()) ------------------------------------------------
ee.plot_am(res, map=map_h, save="/tmp/example_manhattan.png")
ee.plot_am(res, type="trace", save="/tmp/example_extbic.png")
print("plots: /tmp/example_manhattan.png /tmp/example_extbic.png")

# 5. extBIC-lambda calibration (reference FPR4AM()) — permutations are
#    device-batched through a shared kernel eigenbasis
cal = ee.fpr4am(trait="y", fformula="age + sex", geno=geno, pheno=pheno,
                numreps=10, falseposrate=0.05)
print(f"calibrated lambda for 5% FPR: {cal['lambda']:.3f}")

# 6. the matrix-free engine (biobank n-scale path: no n x n kernel matrix,
#    CG + stochastic Lanczos REML, device-resident Krylov loops)
res_mf = ee.am(trait="y", fformula="age + sex", geno=geno, pheno=pheno,
               map=map_h, maxit=8, engine="matfree")
assert res_mf.indices == res.indices, "engines must agree on selection"
print("matfree selection identical:", res_mf.marker_names)
