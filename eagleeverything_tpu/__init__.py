"""eagleeverything_tpu — TPU-native whole-genome multiple-locus association mapping.

A from-scratch JAX/XLA/Pallas rebuild of the Eagle multiple-locus linear
mixed-model (LMM) association-mapping method (reference: the
jcbowden/EagleEverything R + Rcpp/Eigen package; see SURVEY.md at the repo
root for the structural analysis of the reference and its provenance
caveats — the reference mount was empty, so parity targets are specified by
SURVEY.md §3-4 and BASELINE.json rather than file:line citations).

Public API (mirrors the reference's exported R surface, SURVEY.md §3.1):

- :func:`read_marker`  — genotype ingestion (ASCII / PLINK .ped / VCF) into
  a sharded, SNP-major genotype store            (reference: ``ReadMarker()``)
- :func:`read_pheno`   — phenotype table reader   (reference: ``ReadPheno()``)
- :func:`read_map`     — marker map reader        (reference: ``ReadMap()``)
- :func:`read_zmat`    — incidence matrix reader  (reference: ``ReadZmat()``)
- :func:`am`           — multiple-locus forward-selection LMM scan
                                                  (reference: ``AM()``)
- :func:`fpr4am`       — extBIC lambda calibration for a target
  false-positive rate via trait permutation       (reference: ``FPR4AM()``)
- :func:`summary_am`   — Wald tests / p-values / variance explained for the
  selected markers                                (reference: ``SummaryAM()``)
- :func:`plot_am`      — Manhattan-style plot of the outlier statistics
                                                  (reference: ``PlotAM()``)
"""

from eagleeverything_tpu.api.read import (
    read_marker,
    read_pheno,
    read_map,
    read_zmat,
)
from eagleeverything_tpu.api.am import am, am_multi
from eagleeverything_tpu.api.fpr import fpr4am
from eagleeverything_tpu.api.summary import summary_am
from eagleeverything_tpu.api.plot import plot_am
from eagleeverything_tpu.gui import open_gui
from eagleeverything_tpu.utils.config import EagleConfig

__version__ = "0.1.0"

__all__ = [
    "read_marker",
    "read_pheno",
    "read_map",
    "read_zmat",
    "am",
    "am_multi",
    "fpr4am",
    "summary_am",
    "plot_am",
    "open_gui",
    "EagleConfig",
    "__version__",
]
