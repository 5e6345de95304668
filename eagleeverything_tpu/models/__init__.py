"""Statistical models: the LMM/REML engine, the forward-selection driver,
and the dense NumPy oracle that anchors numerical correctness."""
