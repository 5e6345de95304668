"""Matrix-free (biobank-mode) scan tests: CG/SLQ/Lanczos primitives
against dense linear algebra, and the full matfree forward selection
against the exact engine (docs/design_biobank_scale.md)."""

import numpy as np
import pytest

from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import bigscan, engine_jax, oracle, reml_core
from eagleeverything_tpu.utils.config import EagleConfig


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(1)
    n = 120
    A = rng.standard_normal((n, 3 * n)) / np.sqrt(3 * n)
    K = A @ A.T
    K /= np.mean(np.diag(K))
    H = K + 0.8 * np.eye(n)
    return K, H, rng


def test_blocked_cg(problem):
    K, H, rng = problem
    B = rng.standard_normal((H.shape[0], 5))
    X = bigscan.blocked_cg(lambda V: H @ V, B, tol=1e-10)
    np.testing.assert_allclose(X, np.linalg.solve(H, B), rtol=1e-6, atol=1e-8)


def test_slq_logdet(problem):
    K, H, rng = problem
    n = H.shape[0]
    probes = rng.choice((-1.0, 1.0), size=(n, 64))
    est = bigscan.slq_logdet(lambda V: H @ V, n, probes, m=40)
    _, exact = np.linalg.slogdet(H)
    assert est == pytest.approx(exact, rel=0.02)


def test_lanczos_isqrt(problem):
    K, H, rng = problem
    n = H.shape[0]
    Z = rng.standard_normal((n, 4))
    approx = bigscan.lanczos_isqrt_apply(lambda V: H @ V, Z, m=60)
    w, U = np.linalg.eigh(H)
    exact = U @ ((U.T @ Z) / np.sqrt(w)[:, None])
    np.testing.assert_allclose(approx, exact, rtol=1e-4, atol=1e-6)


def test_shifted_krylov_all_functions(problem):
    """One unshifted Lanczos pass must reproduce shifted solves, isqrt
    applications, and SLQ logdets across a RANGE of shifts."""
    K, _, rng = problem
    n = K.shape[0]
    w_K, U_K = np.linalg.eigh(K)

    B = rng.standard_normal((n, 3))
    sk = bigscan.ShiftedKrylov(lambda V: K @ V, B, m=n, reorth=True)
    probes = rng.choice((-1.0, 1.0), size=(n, 96))
    sk_p = bigscan.ShiftedKrylov(lambda V: K @ V, probes, m=40)
    for delta in (0.05, 0.8, 12.0):
        H = K + delta * np.eye(n)
        np.testing.assert_allclose(sk.solve(delta), np.linalg.solve(H, B),
                                   rtol=1e-6, atol=1e-8)
        exact_isqrt = (U_K * (1.0 / np.sqrt(w_K + delta))[None, :]) @ (U_K.T @ B)
        np.testing.assert_allclose(sk.isqrt(delta), exact_isqrt,
                                   rtol=1e-5, atol=1e-7)
        _, ld = np.linalg.slogdet(H)
        # SLQ is stochastic: rel bound for large |ld|, abs floor for the
        # small-|ld| shifts where relative error is ill-posed
        assert sk_p.logdet(delta) == pytest.approx(ld, rel=0.05, abs=1.0)


def test_device_cg_matches_host_cg():
    """The one-dispatch jitted CG (engine_jax._device_cg_jit via
    TiledScan.device_cg) must agree with the streamed host CG."""
    sim = simulate_dataset(n=100, p=800, n_qtl=2, seed=9)
    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    rng = np.random.default_rng(3)
    B = rng.standard_normal((100, 4))
    s0 = float(np.mean(np.sum(
        (sim.geno.astype(np.float64) - 1.0) ** 2, axis=0)))  # rough scale
    delta = 0.7
    X_dev = backend.device_cg(B, delta, s0)
    assert X_dev is not None
    X_host = bigscan.blocked_cg(
        lambda V: backend.kernel_matvec(V) / s0 + delta * V, B)
    np.testing.assert_allclose(X_dev, X_host, rtol=5e-4, atol=5e-5)


def test_matfree_reml_matches_exact(problem):
    K, H, rng = problem
    n = K.shape[0]
    X = np.column_stack([np.ones(n), rng.standard_normal(n)])
    L = np.linalg.cholesky(K + 1e-10 * np.eye(n))
    y = 0.3 + 1.2 * (L @ rng.standard_normal(n)) + rng.standard_normal(n)

    d, U = np.linalg.eigh(K)
    exact = reml_core.reml_maximize_diag(np.maximum(d, 0), U.T @ y, U.T @ X)

    ctx = bigscan.MatfreeContext(
        kernel_matvec=lambda V: K @ V, n=n,
        probes=rng.choice((-1.0, 1.0), size=(n, 48)), lanczos_m=40,
    )
    mf = bigscan.reml_maximize_matfree(ctx, y, X)
    assert mf.delta == pytest.approx(exact.delta, rel=0.15)
    assert mf.loglik == pytest.approx(exact.loglik, abs=1.5)  # SLQ noise
    assert mf.sigma2_g == pytest.approx(exact.sigma2_g, rel=0.15)


def test_matfree_forward_select_matches_exact_engine():
    sim = simulate_dataset(n=130, p=900, n_qtl=2, seed=31, h2_qtl=0.5)
    X0 = np.ones((130, 1))
    handle = GenoHandle(n=130, p=900, source="<bigscan>", geno=sim.geno)

    exact = engine_jax.forward_select(sim.y, X0, handle, maxit=5)

    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())

    def column_f64(j):
        return engine_jax._impute_column_f64(src.column(j))

    mf = bigscan.forward_select_matfree(
        sim.y, X0, backend, maxit=5, probes=32, diag_probes=96,
        exact_topk=32, column_f64=column_f64,
    )
    assert mf.indices == exact.indices
    np.testing.assert_allclose(mf.extbic_path, exact.extbic_path,
                               rtol=0.02)  # SLQ-noise tolerance


def test_matfree_sharded_device_krylov():
    """Matfree over a (1,8) SNP-sharded mesh: the W stack keeps its GSPMD
    sharding through concatenate, so the one-dispatch CG/Lanczos programs
    are partitioned across devices (psum inserted by XLA) — selection must
    match the exact engine."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    sim = simulate_dataset(n=110, p=1024, n_qtl=2, seed=17, h2_qtl=0.5)
    X0 = np.ones((110, 1))
    from eagleeverything_tpu.api.read import GenoHandle
    handle = GenoHandle(n=110, p=1024, source="<mshard>", geno=sim.geno)
    exact = engine_jax.forward_select(sim.y, X0, handle, maxit=4)

    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig(mesh_shape=(1, 8)))
    assert backend._tile_sharding is not None
    mf = bigscan.forward_select_matfree(
        sim.y, X0, backend, maxit=4, probes=32, diag_probes=96,
        exact_topk=32,
        column_f64=lambda j: engine_jax._impute_column_f64(src.column(j)))
    assert backend._w_stack().sharding.spec[0] == "snp"
    assert mf.indices == exact.indices


def test_matfree_with_zmat_matches_exact():
    """Z incidence designs through the matrix-free path (K_eff = Z·K·Zᵀ
    reached via wrapped matvecs) reproduce the exact engine."""
    sim = simulate_dataset(n=80, p=400, n_qtl=1, seed=5, h2_qtl=0.6)
    Z = np.kron(np.eye(80), np.ones((2, 1)))
    rng = np.random.default_rng(2)
    y_rec = Z @ sim.y + 0.3 * rng.standard_normal(160)
    X0 = np.ones((160, 1))

    from eagleeverything_tpu.api.read import GenoHandle
    handle = GenoHandle(n=80, p=400, source="<mz>", geno=sim.geno)
    exact = engine_jax.forward_select(y_rec, X0, handle, maxit=3, Z=Z)

    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    mf = bigscan.forward_select_matfree(
        y_rec, X0, backend, maxit=3, probes=32, diag_probes=96,
        exact_topk=32, Z=Z,
        column_f64=lambda j: engine_jax._impute_column_f64(src.column(j)))
    assert mf.indices == exact.indices


def test_matfree_checkpoint_resume(tmp_path):
    sim = simulate_dataset(n=100, p=400, n_qtl=2, seed=31, h2_qtl=0.55)
    X0 = np.ones((100, 1))
    src = engine_jax.DenseTileSource(sim.geno)

    def make_backend():
        return engine_jax.TiledScan(src, EagleConfig())

    def col(j):
        return engine_jax._impute_column_f64(src.column(j))

    kw = dict(probes=32, diag_probes=96, exact_topk=32, column_f64=col)
    fresh = bigscan.forward_select_matfree(sim.y, X0, make_backend(),
                                           maxit=4, **kw)
    assert len(fresh.indices) >= 2
    d = str(tmp_path / "ck")
    bigscan.forward_select_matfree(sim.y, X0, make_backend(), maxit=1,
                                   fixit=True, ckpt_dir=d, **kw)
    resumed = bigscan.forward_select_matfree(sim.y, X0, make_backend(),
                                             maxit=4, ckpt_dir=d,
                                             resume=True, **kw)
    assert resumed.indices == fresh.indices

    # legacy/seeded states (no fit_exact in meta — e.g. reconstructed from
    # scan logs, scripts/preseed_nscan_ckpt.py) take the refit-on-resume
    # path and must reach the same selection
    import json as _json
    import os as _os
    sp = _os.path.join(d, "scan_state.json")
    with open(sp) as f:
        st = _json.load(f)
    st["meta"].pop("fit_exact", None)
    st["sigma2_g"] = st["sigma2_e"] = 0.0  # seeded states lack the fit
    with open(sp, "w") as f:
        _json.dump(st, f)
    reseeded = bigscan.forward_select_matfree(sim.y, X0, make_backend(),
                                              maxit=4, ckpt_dir=d,
                                              resume=True, **kw)
    assert reseeded.indices == fresh.indices


def test_sweep_state_checkpoint_reuse(tmp_path):
    """Intra-iteration durability: the sweep's stat-rows output is cached
    keyed by the exact decision state — a resumed sweep skips the CG +
    stack pass and still returns identical statistics; a CHANGED state
    (different δ) misses the cache."""
    sim = simulate_dataset(n=100, p=400, n_qtl=2, seed=31, h2_qtl=0.55)
    X0 = np.ones((100, 1))
    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    ctx = bigscan.make_context(backend, 100, probes=32)
    fit = bigscan.reml_maximize_matfree(ctx, sim.y, X0)
    d = str(tmp_path / "sw")
    kw = dict(diag_probes=96, exact_topk=16,
              column_f64=backend.column_f64, sweep_ckpt=d)
    t1, c1, _ = bigscan.score_sweep_matfree(ctx, backend, sim.y, X0, fit,
                                            **kw)

    calls = {"n": 0}
    orig = backend.matfree_stat_rows

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    backend.matfree_stat_rows = spy
    t2, c2, _ = bigscan.score_sweep_matfree(ctx, backend, sim.y, X0, fit,
                                            **kw)
    assert calls["n"] == 0          # cache hit: no stack pass
    assert c2 == c1
    np.testing.assert_allclose(t2, t1, rtol=1e-9)

    fit2 = dataclasses_replace_delta(fit, fit.delta * 1.5)
    t3, _, _ = bigscan.score_sweep_matfree(ctx, backend, sim.y, X0, fit2,
                                           **kw)
    assert calls["n"] == 1          # state changed: cache miss


def dataclasses_replace_delta(fit, new_delta):
    import dataclasses as _dc
    return _dc.replace(fit, delta=new_delta)


def test_fpr4am_matfree_matches_eig():
    """FPR calibration via the matrix-free engine tracks the eigenbasis
    path: identical permutations (same seed), λ_crit agrees per-rep up to
    probe/CG tolerance, and the calibrated λ* is close."""
    from eagleeverything_tpu.api.fpr import fpr4am

    sim = simulate_dataset(n=80, p=400, seed=11)
    r_eig = fpr4am("y", sim.geno, {"y": sim.y}, numreps=8, seed=5,
                   engine="eig")
    r_mf = fpr4am("y", sim.geno, {"y": sim.y}, numreps=8, seed=5,
                  engine="matfree")
    d = np.abs(np.asarray(r_eig["lambda_crits"])
               - np.asarray(r_mf["lambda_crits"]))
    assert float(np.median(d)) < 0.05
    assert abs(r_eig["lambda"] - r_mf["lambda"]) < 0.2


def _guard_setup(seed, diag_probes):
    sim = simulate_dataset(n=120, p=300, n_qtl=3, seed=seed, h2_qtl=0.4)
    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    ctx = bigscan.make_context(backend, 120)
    X0 = np.ones((120, 1))
    fit = bigscan.reml_maximize_matfree(ctx, sim.y, X0)
    col = lambda j: engine_jax._impute_column_f64(src.column(int(j)))
    def sweep(**kw):
        return bigscan.score_sweep_matfree(
            ctx, backend, sim.y, X0, fit, diag_probes=diag_probes,
            column_f64=col, **kw)
    return sweep


def test_matfree_escalation_guard_rescues_misranked_argmax():
    """Adversarial case for the two-stage sweep (VERDICT weak #1): with
    few Hutchinson probes the diag estimate misranks the true argmax out
    of a small shortlist. Without the escalation guard the selection is
    wrong; the guard rescored its way back to the exact argmax."""
    sweep = _guard_setup(seed=4, diag_probes=16)
    # ground truth: every SNP rescored exactly
    _, cand_exact, _ = sweep(exact_topk=300)
    # ungated two-stage sweep: the old behavior (argmax of the shortlist)
    _, cand_noguard, info_ng = sweep(exact_topk=4, max_escalation_rounds=0)
    assert cand_noguard != cand_exact  # the adversarial premise holds
    # the unproven argmax must be LOUD, not silent (VERDICT r2 weak #6)
    assert info_ng["exhausted"] is True
    # guarded sweep recovers the exact argmax
    _, cand_guard, _ = sweep(exact_topk=4)
    assert cand_guard == cand_exact


@pytest.mark.parametrize("seed", [0, 3, 7, 11, 15])
def test_matfree_escalation_guard_property(seed):
    """Property: across seeds, the guarded two-stage sweep with a tiny
    shortlist agrees with the rescore-everything sweep."""
    sweep = _guard_setup(seed=seed, diag_probes=16)
    _, cand_exact, _ = sweep(exact_topk=300)
    _, cand_guard, _ = sweep(exact_topk=4)
    assert cand_guard == cand_exact


def test_matfree_sweep_exclude_never_returns_selected():
    """VERDICT r2 weak #5: with the true argmax excluded (as a selected
    SNP would be), the sweep must return the best NON-excluded SNP from
    the exactly-rescored set — never an excluded index, and never a
    fallback argmax over non-rescored probe estimates."""
    sweep = _guard_setup(seed=4, diag_probes=16)
    _, best, _ = sweep(exact_topk=300)
    # ground truth runner-up: rescore everything with the winner excluded
    _, runner_exact, _ = sweep(exact_topk=300, exclude=[best])
    assert runner_exact != best
    # two-stage sweep with a tiny shortlist must agree
    t, runner_guard, info = sweep(exact_topk=4, exclude=[best])
    assert runner_guard == runner_exact
    assert t[best] == 0.0  # excluded entries report t = 0 (engine contract)


def test_matfree_forward_select_excludes_selected_in_sweep():
    """The forward loop passes exclude=selected into the sweep: selected
    SNPs never reappear as candidates, and the per-iteration outlier
    vectors report 0 for them (matches the exact engine's t[selected]=0)."""
    from eagleeverything_tpu.data.simulate import simulate_dataset

    sim = simulate_dataset(n=120, p=300, n_qtl=3, seed=4, h2_qtl=0.5)
    src = engine_jax.DenseTileSource(sim.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    res = bigscan.forward_select_matfree(
        sim.y, np.ones((120, 1)), backend, maxit=4,
        column_f64=backend.column_f64, diag_probes=64)
    assert len(res.indices) == len(set(res.indices))  # no re-selection
    for it, t in enumerate(res.outlier_stats):
        for rank, j in enumerate(res.indices):
            if rank < it:  # j was already selected before iteration it
                assert t[j] == 0.0
    assert res.escalation_exhausted is None  # all argmax decisions proven
