"""``fpr4am()`` — calibrate the extBIC sparsity weight λ for a target
false-positive rate by trait permutation.

Reference: ``FPR4AM()`` (SURVEY.md §3.1, call stack §4.3): permute the
trait ``numreps`` times, find per permutation the smallest λ at which a
(false) marker would be selected, and return the λ achieving the desired
FPR. The rebuild exploits the permutation-invariances the survey flags
(§4.3): MMt and the null-model eigendecomposition are computed ONCE and
shared across all permutations; each permutation then costs one cheap
host REML (on permuted η), one device sweep, and one candidate REML.

The accept rule at the first step (k: 0→1) is
  −2·LL₁ + log n + 2λ·log C(p,1)  <  −2·LL₀
so the critical weight is  λ_crit = (2(LL₁−LL₀) − log n) / (2·log p),
and a permutation yields a false positive iff λ < λ_crit. λ* for a target
FPR α is the (1−α) empirical quantile of the λ_crit sample.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import numpy as np

from eagleeverything_tpu.api.common import prepare_inputs
from eagleeverything_tpu.api.read import GenoHandle, PhenoHandle
from eagleeverything_tpu.models import engine_jax, reml_core
from eagleeverything_tpu.utils.config import DEFAULT_CONFIG, EagleConfig


def fpr4am(
    trait: str,
    geno: Union[GenoHandle, np.ndarray],
    pheno: Union[PhenoHandle, dict, np.ndarray],
    fformula: Optional[str] = None,
    Zmat: Optional[np.ndarray] = None,
    falseposrate: float = 0.05,
    numreps: int = 100,
    seed: int = 0,
    quiet: bool = True,
    config: EagleConfig = DEFAULT_CONFIG,
) -> dict:
    """Return the calibrated λ (``setlambda``) for :func:`am`.

    Returns a dict with keys ``lambda`` (the calibrated weight),
    ``lambda_crits`` (the per-permutation critical weights), and
    ``falseposrate``/``numreps`` bookkeeping.
    """
    prep = prepare_inputs(trait, geno, pheno, fformula, Zmat)
    y, X0, Z = prep.y, prep.X0, prep.Z
    n = y.shape[0]

    src = engine_jax._make_source(prep.handle, prep.keep_individuals)
    backend = engine_jax.TiledScan(src, config)
    p = src.p

    K_raw = backend.compute_K()
    s0 = float(np.mean(np.diag(K_raw)))
    K = K_raw / (s0 if s0 > 0 else 1.0)
    K_eff = Z @ K @ Z.T if Z is not None else K

    # shared across permutations: the null-model spectral basis (X0 fixed)
    lam_spec, _, q = reml_core.spectral_inputs(y, X0, K_eff)
    U = _null_basis(X0, K_eff, q)

    rng = np.random.default_rng(seed)
    log_choose_p1 = math.log(p)
    lam_crits = np.empty(numreps)
    for r in range(numreps):
        y_perm = rng.permutation(y)
        eta = U.T @ y_perm
        fit0 = reml_core.reml_maximize(lam_spec, eta * eta)

        Pm = engine_jax._projector(X0, K_eff, fit0.delta)
        Py = Pm @ y_perm
        Pm_g = Z.T @ Pm @ Z if Z is not None else Pm
        Py_g = Z.T @ Py if Z is not None else Py
        t = backend.sweep(Pm_g, Py_g, fit0.sigma2_g)
        cand = int(np.argmax(t))

        w_col = engine_jax._impute_column_f64(src.column(cand))
        x_col = Z @ w_col if Z is not None else w_col
        X1 = np.hstack([X0, x_col[:, None]])
        lam1, eta21, _ = reml_core.spectral_inputs(y_perm, X1, K_eff)
        fit1 = reml_core.reml_maximize(lam1, eta21)

        lam_crits[r] = (2.0 * (fit1.loglik - fit0.loglik) - math.log(n)) / (
            2.0 * log_choose_p1
        )
        if not quiet:
            print(f"[fpr4am] rep={r} cand={cand} lambda_crit={lam_crits[r]:.4f}")

    # λ* = (1-α) quantile; FPR(λ*) = P(λ_crit > λ*) ≈ α
    lam_star = float(np.quantile(lam_crits, 1.0 - falseposrate))
    lam_star = max(lam_star, 0.0)
    if not quiet:
        print(f"[fpr4am] lambda* = {lam_star:.4f} for target FPR {falseposrate}")
    return {
        "lambda": lam_star,
        "lambda_crits": lam_crits,
        "falseposrate": falseposrate,
        "numreps": numreps,
    }


def _null_basis(X0: np.ndarray, K: np.ndarray, q: int) -> np.ndarray:
    """Eigenvector basis U of S(K+I)S restricted to the top n−q eigenpairs
    (the permutation-invariant part of the REML spectral inputs)."""
    n = K.shape[0]
    S = np.eye(n) - X0 @ np.linalg.pinv(X0)
    A = S @ (K + np.eye(n)) @ S
    A = 0.5 * (A + A.T)
    _, U = np.linalg.eigh(A)
    return U[:, q:]
