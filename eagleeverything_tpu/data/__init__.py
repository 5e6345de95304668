"""Bundled example data and simulators (reference: ``inst/extdata/``
tutorial datasets, SURVEY.md §3.5)."""

from eagleeverything_tpu.data.simulate import simulate_dataset, SimData

__all__ = ["simulate_dataset", "SimData"]
