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
    perm_batch: Optional[int] = None,
    engine: str = "auto",
) -> dict:
    """Return the calibrated λ (``setlambda``) for :func:`am`.

    Returns a dict with keys ``lambda`` (the calibrated weight),
    ``lambda_crits`` (the per-permutation critical weights), and
    ``falseposrate``/``numreps`` bookkeeping.

    ``engine``: "auto" uses the shared-eigenbasis device-batched path and
    switches to "matfree" above ``config.matfree_min_n`` individuals
    (like :func:`am`); "eig"/"matfree" force a path.
    """
    prep = prepare_inputs(trait, geno, pheno, fformula, Zmat)
    y, X0, Z = prep.y, prep.X0, prep.Z
    n = y.shape[0]

    src = engine_jax._make_source(prep.handle, prep.keep_individuals)
    # SPMD: each process streams only its SNP range; K/matvec merge with
    # collectives, sweeps gather the global statistic vector, and columns
    # broadcast from their owning host (SURVEY.md §4.3 × §6.8)
    import jax as _jax
    backend = (engine_jax.MultiHostTiledScan(src, config)
               if _jax.process_count() > 1
               else engine_jax.TiledScan(src, config))
    p = getattr(backend, "p_global", src.p)
    if p < 2:
        raise ValueError(
            f"FPR calibration needs at least 2 SNPs (got p={p}): the "
            "extBIC penalty difference log C(p,1) is zero at p=1")

    if engine == "auto":
        engine = "matfree" if prep.handle.n > config.matfree_min_n else "eig"
    if engine == "matfree":
        lam_crits = _matfree_lam_crits(prep, src, backend, numreps, seed,
                                       quiet)
        return _calibrate(lam_crits, falseposrate, numreps, quiet)
    if engine != "eig":
        raise ValueError(f"unknown fpr4am engine {engine!r}")

    K_eff = engine_jax.normalized_kernel(backend.compute_K(), Z)

    # shared across ALL permutations: one eigendecomposition of the kernel
    # (FaST-LMM basis) — every per-permutation REML fit is then O(n·q²)
    d_eig, U = engine_jax._eigh_kernel(K_eff, config)
    Xs0 = U.T @ X0
    backend.set_eigenbasis(U if Z is None else Z.T @ U)
    q0 = Xs0.shape[1]

    rng = np.random.default_rng(seed)
    log_choose_p1 = math.log(p)
    lam_crits = np.empty(numreps)

    # permutations are batched through the device sweep (SURVEY.md §4.3:
    # "batch permutations as a leading axis"); per-permutation device
    # state is O(n·q), so the batch can be large
    chunk = perm_batch or max(1, min(numreps, int(5e8 / max(n * q0, 1))))
    for c0 in range(0, numreps, chunk):
        B = min(chunk, numreps - c0)
        y_perms = np.stack([rng.permutation(y) for _ in range(B)])
        fits0 = []
        ystars = np.empty((B, n))
        s_all = np.empty((B, n))
        Q_all = np.empty((B, n, q0))
        z3_all = np.empty((B, n))
        for b in range(B):
            ystars[b] = U.T @ y_perms[b]
            fit0 = reml_core.reml_maximize_diag(d_eig, ystars[b], Xs0)
            fits0.append(fit0)
            s_all[b], Q_all[b], z3_all[b] = engine_jax._eig_iteration_state(
                d_eig, ystars[b], Xs0, fit0.delta, q0)
        t_all = backend.sweep_eig_batched(
            s_all, Q_all, z3_all, np.array([f.sigma2_g for f in fits0])
        )
        for b in range(B):
            r = c0 + b
            fit0 = fits0[b]
            cand = int(np.argmax(t_all[b]))
            w_col = backend.column_f64(cand)
            x_col = Z @ w_col if Z is not None else w_col
            Xs1 = np.hstack([Xs0, (U.T @ x_col)[:, None]])
            fit1 = reml_core.reml_maximize_diag(d_eig, ystars[b], Xs1)
            lam_crits[r] = (
                2.0 * (fit1.loglik - fit0.loglik) - math.log(n)
            ) / (2.0 * log_choose_p1)
            if not quiet:
                print(f"[fpr4am] rep={r} cand={cand} "
                      f"lambda_crit={lam_crits[r]:.4f}")

    return _calibrate(lam_crits, falseposrate, numreps, quiet)


def _calibrate(lam_crits: np.ndarray, falseposrate: float, numreps: int,
               quiet: bool) -> dict:
    """λ* = (1-α) quantile of the λ_crit sample; FPR(λ*) = P(λ_crit>λ*) ≈ α.
    Shared tail of both calibration engines."""
    lam_star = max(float(np.quantile(lam_crits, 1.0 - falseposrate)), 0.0)
    if not quiet:
        print(f"[fpr4am] lambda* = {lam_star:.4f} for target FPR {falseposrate}")
    return {
        "lambda": lam_star,
        "lambda_crits": lam_crits,
        "falseposrate": falseposrate,
        "numreps": numreps,
    }


def _matfree_lam_crits(prep, src, backend, numreps: int,
                       seed: int, quiet: bool) -> np.ndarray:
    """FPR calibration at biobank n: the kernel is never materialized.

    Same λ_crit algebra as the eigenbasis path, but LL₀/LL₁ come from
    matrix-free REML (blocked-CG solves + cached SLQ logdet,
    models/bigscan) and the per-permutation sweep is the two-stage
    probe/exact score sweep. The SLQ probe set and Hutchinson scale s0
    are shared across all permutations; each null fit warm-starts its δ
    grid from the previous permutation's optimum (permutations are
    exchangeable, so the optima cluster)."""
    from eagleeverything_tpu.models import bigscan

    y, X0, Z = prep.y, prep.X0, prep.Z
    n = y.shape[0]
    p = src.p
    ctx = bigscan.make_context(backend, n, Z=Z)
    column_f64 = backend.column_f64

    rng = np.random.default_rng(seed)
    log_choose_p1 = math.log(p)
    lam_crits = np.empty(numreps)
    hint = None
    for r in range(numreps):
        y_perm = rng.permutation(y)
        fit0 = bigscan.reml_maximize_matfree(ctx, y_perm, X0,
                                             delta_hint=hint)
        hint = fit0.delta
        _, cand, _ = bigscan.score_sweep_matfree(
            ctx, backend, y_perm, X0, fit0, column_f64=column_f64, Z=Z)
        w_col = column_f64(cand)
        x_col = Z @ w_col if Z is not None else w_col
        X1 = np.hstack([X0, x_col[:, None]])
        fit1 = bigscan.reml_maximize_matfree(ctx, y_perm, X1,
                                             delta_hint=fit0.delta)
        lam_crits[r] = (
            2.0 * (fit1.loglik - fit0.loglik) - math.log(n)
        ) / (2.0 * log_choose_p1)
        if not quiet:
            print(f"[fpr4am:matfree] rep={r} cand={cand} "
                  f"lambda_crit={lam_crits[r]:.4f}")
    return lam_crits
