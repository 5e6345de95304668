"""Device compute kernels: recode/impute, MMt tiles, score sweep — the
TPU-native replacements for the reference's Rcpp/Eigen/OpenMP layer
(``calculateMMt_rcpp``, ``calculate_a_and_vara_rcpp``; SURVEY.md §3.3)."""
