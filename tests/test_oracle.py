"""Phase-0 oracle tests: the dense NumPy reference implementation."""

import numpy as np
import pytest

from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import oracle, reml_core


@pytest.fixture(scope="module")
def sim():
    return simulate_dataset(n=150, p=1200, n_qtl=3, seed=11)


def _design(sim):
    n = sim.y.shape[0]
    return np.column_stack(
        [np.ones(n), sim.covariate - sim.covariate.mean(), sim.group.astype(float)]
    )


def test_reml_loglik_matches_direct_restricted_likelihood():
    """Spectral LL(δ) must equal the direct dense REML log-likelihood up to a
    model-constant; check via differences across δ values."""
    rng = np.random.default_rng(0)
    n, q = 40, 3
    X = np.column_stack([np.ones(n), rng.standard_normal((n, q - 1))])
    A = rng.standard_normal((n, n))
    K = A @ A.T / n
    y = rng.standard_normal(n)

    lam, eta2, qr = reml_core.spectral_inputs(y, X, K)
    assert qr == q
    assert lam.shape[0] == n - q

    def direct_profiled_ll(delta):
        # profiled (over sigma2) restricted LL, direct dense formula
        H = K + delta * np.eye(n)
        Hinv = np.linalg.inv(H)
        XtHinvX = X.T @ Hinv @ X
        P = Hinv - Hinv @ X @ np.linalg.solve(XtHinvX, X.T @ Hinv)
        yPy = float(y @ P @ y)
        nq = n - q
        sign1, logdetH = np.linalg.slogdet(H)
        sign2, logdetXtHinvX = np.linalg.slogdet(XtHinvX)
        assert sign1 > 0 and sign2 > 0
        # up to an additive constant independent of delta:
        return -0.5 * (nq * np.log(yPy) + logdetH + logdetXtHinvX)

    deltas = [0.1, 1.0, 5.0]
    spec = [reml_core.reml_loglik(d, lam, eta2) for d in deltas]
    direct = [direct_profiled_ll(d) for d in deltas]
    for i in range(1, len(deltas)):
        assert spec[i] - spec[0] == pytest.approx(direct[i] - direct[0], abs=1e-8)


def test_reml_recovers_variance_ratio():
    """Known-answer: data simulated from the model should give δ̂ ≈ δ_true."""
    rng = np.random.default_rng(42)
    n = 400
    A = rng.standard_normal((n, 3 * n)) / np.sqrt(3 * n)
    K = A @ A.T
    K /= np.mean(np.diag(K))
    X = np.ones((n, 1))
    sigma2_g, sigma2_e = 2.0, 1.0
    L = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    y = (
        X[:, 0] * 0.5
        + np.sqrt(sigma2_g) * (L @ rng.standard_normal(n))
        + np.sqrt(sigma2_e) * rng.standard_normal(n)
    )
    fit = oracle.fit_reml(y, X, K)
    assert fit.delta == pytest.approx(sigma2_e / sigma2_g, rel=0.5)
    assert fit.sigma2_g == pytest.approx(sigma2_g, rel=0.5)


def test_recode_and_impute():
    G = np.array([[0, 1, -9], [2, -9, 2], [0, 1, 0]], dtype=np.int8)
    W = oracle.recode_and_impute(G)
    assert W[0, 0] == -1.0 and W[1, 0] == 1.0
    assert W[1, 1] == 0.0          # imputed to col mean 1.0, then -1
    assert W[0, 2] == 0.0          # imputed to col mean (2+0)/2=1, then -1
    assert np.isfinite(W).all()


def test_forward_select_finds_planted_qtl(sim):
    X0 = _design(sim)
    res = oracle.forward_select(sim.y, X0, sim.geno, maxit=10, quiet=True)
    assert len(res.indices) >= 1
    # every selected SNP should tag a planted QTL (exact index or tight LD
    # neighborhood — the simulator uses 25-SNP LD blocks)
    for j in res.indices:
        assert np.min(np.abs(sim.qtl_idx - j)) <= 25, (j, sim.qtl_idx)
    # at least two of the three planted QTL recovered
    hits = sum(np.min(np.abs(np.array(res.indices) - q)) <= 25 for q in sim.qtl_idx)
    assert hits >= 2
    # extBIC strictly decreases along accepted path
    assert all(b < a for a, b in zip(res.extbic_path, res.extbic_path[1:]))


def test_forward_select_fixit_forces_steps(sim):
    X0 = _design(sim)
    res = oracle.forward_select(sim.y, X0, sim.geno, maxit=3, fixit=True)
    assert len(res.indices) == 3


def test_forward_select_null_trait_selects_nothing():
    """Pure-noise trait: extBIC should reject the first candidate."""
    sim = simulate_dataset(n=120, p=800, n_qtl=1, seed=3)
    rng = np.random.default_rng(99)
    y = rng.standard_normal(sim.y.shape[0])
    X0 = np.ones((y.shape[0], 1))
    res = oracle.forward_select(y, X0, sim.geno, maxit=5)
    assert len(res.indices) == 0


def test_wald_summary(sim):
    X0 = _design(sim)
    res = oracle.forward_select(sim.y, X0, sim.geno, maxit=10)
    s = oracle.wald_summary(sim.y, X0, sim.geno, res.indices)
    assert len(s.indices) == len(res.indices)
    assert (s.pvalue < 0.05).all()       # selected markers are significant
    assert (s.var_explained >= 0).all()
    assert np.isfinite(s.beta).all() and np.isfinite(s.se).all()


def test_missing_genotypes_handled(sim):
    simm = simulate_dataset(n=150, p=1200, n_qtl=3, seed=11, missing_rate=0.02)
    X0 = _design(simm)
    res = oracle.forward_select(simm.y, X0, simm.geno, maxit=10)
    # planted signal strong enough to survive 2% missingness
    assert len(res.indices) >= 1
    for j in res.indices:
        assert np.min(np.abs(simm.qtl_idx - j)) <= 25


def test_zmat_repeated_measures():
    """With Z mapping 2 records per individual, selection should still find
    the planted QTL."""
    sim = simulate_dataset(n=100, p=600, n_qtl=2, seed=5, h2_qtl=0.45)
    n = sim.y.shape[0]
    reps = 2
    Z = np.kron(np.eye(n), np.ones((reps, 1)))
    rng = np.random.default_rng(1)
    y_rec = Z @ sim.y + 0.3 * rng.standard_normal(n * reps)
    X0 = np.ones((n * reps, 1))
    res = oracle.forward_select(y_rec, X0, sim.geno, maxit=6, Z=Z)
    assert len(res.indices) >= 1
    for j in res.indices:
        assert np.min(np.abs(sim.qtl_idx - j)) <= 25


def test_diag_reml_matches_emma_form():
    """FaST-LMM diagonal-basis REML (engine path) must agree with the
    EMMA spectral form (oracle path): same δ*, same logLik."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        n, q = 80, 3
        X = np.column_stack([np.ones(n), rng.standard_normal((n, q - 1))])
        A = rng.standard_normal((n, 2 * n))
        K = A @ A.T / (2 * n)
        y = (rng.standard_normal(n)
             + A[:, 0] * (trial % 2))  # vary signal share across trials
        lam, eta2, _ = reml_core.spectral_inputs(y, X, K)
        fit_emma = reml_core.reml_maximize(lam, eta2)
        d, U = np.linalg.eigh(K)
        fit_diag = reml_core.reml_maximize_diag(d, U.T @ y, U.T @ X)
        assert fit_diag.loglik == pytest.approx(fit_emma.loglik, abs=1e-7)
        assert fit_diag.delta == pytest.approx(fit_emma.delta, rel=1e-5)
        assert fit_diag.sigma2_g == pytest.approx(fit_emma.sigma2_g, rel=1e-5)


def test_extbic_monotone_in_k():
    ll = -100.0
    e1 = reml_core.extbic(ll, 100, 5000, 1, 1.0)
    e2 = reml_core.extbic(ll, 100, 5000, 2, 1.0)
    assert e2 > e1  # more parameters, same fit → worse criterion


def test_forward_select_exhaustion_no_duplicates():
    """fixit with maxit > p must stop when every SNP is selected instead
    of re-selecting duplicates via the all-zero statistic vector."""
    from eagleeverything_tpu.data.simulate import simulate_dataset
    simt = simulate_dataset(n=60, p=4, n_qtl=2, seed=8, h2_qtl=0.6)
    X0 = np.ones((60, 1))
    res = oracle.forward_select(simt.y, X0, simt.geno, maxit=10, fixit=True)
    assert len(res.indices) == len(set(res.indices)) <= 4
    assert all(np.isfinite(res.extbic_path))

    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.models import engine_jax
    handle = GenoHandle(n=60, p=4, source="<exh>", geno=simt.geno)
    res_e = engine_jax.forward_select(simt.y, X0, handle, maxit=10,
                                      fixit=True)
    assert res_e.indices == res.indices


def test_forward_select_collinear_design():
    """A rank-deficient X0 (aliased covariate) must not crash the oracle
    and must select the same markers as the engine (both reduce X to its
    independent columns)."""
    from eagleeverything_tpu.data.simulate import simulate_dataset
    simt = simulate_dataset(n=100, p=500, n_qtl=2, seed=21, h2_qtl=0.5)
    rng = np.random.default_rng(0)
    cov = rng.standard_normal(100)
    X0 = np.column_stack([np.ones(100), cov, 2.0 * cov])  # exact aliasing
    res_o = oracle.forward_select(simt.y, X0, simt.geno, maxit=4)
    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.models import engine_jax
    handle = GenoHandle(n=100, p=500, source="<coll>", geno=simt.geno)
    res_e = engine_jax.forward_select(simt.y, X0, handle, maxit=4)
    assert res_o.indices == res_e.indices
    assert len(res_o.indices) >= 1
