"""Multi-trait lockstep scan tests (BASELINE config 5)."""

import numpy as np
import pytest

import eagleeverything_tpu as ee
from eagleeverything_tpu.data.simulate import simulate_dataset


@pytest.fixture(scope="module")
def multi():
    """Two traits over the same genotypes with different planted QTL."""
    sim1 = simulate_dataset(n=130, p=900, n_qtl=2, seed=31, h2_qtl=0.45)
    rng = np.random.default_rng(8)
    # trait 2: different planted QTL on the SAME genotype matrix
    q2 = np.array([123, 700])
    W = sim1.geno.astype(np.float64)
    W = W - W.mean(axis=0)
    g = W[:, q2] @ np.array([1.5, -1.5])
    y2 = g / g.std() * np.sqrt(0.5) + rng.standard_normal(130) * np.sqrt(0.5)
    pheno = {"y1": sim1.y, "y2": y2,
             "age": sim1.covariate, "sex": np.where(sim1.group, "M", "F")}
    return sim1, q2, pheno


def test_am_multi_matches_single_trait(multi):
    sim1, q2, pheno = multi
    results = ee.am_multi(["y1", "y2"], geno=sim1.geno, pheno=pheno,
                          fformula="age + sex", maxit=6)
    assert set(results) == {"y1", "y2"}
    r1_single = ee.am(trait="y1", geno=sim1.geno, pheno=pheno,
                      fformula="age + sex", maxit=6)
    r2_single = ee.am(trait="y2", geno=sim1.geno, pheno=pheno,
                      fformula="age + sex", maxit=6)
    assert results["y1"].indices == r1_single.indices
    assert results["y2"].indices == r2_single.indices
    np.testing.assert_allclose(results["y1"].extbic_path,
                               r1_single.extbic_path, rtol=1e-8)


def test_am_multi_finds_per_trait_qtl(multi):
    sim1, q2, pheno = multi
    results = ee.am_multi(["y1", "y2"], geno=sim1.geno, pheno=pheno,
                          fformula="age + sex", maxit=6)
    hits2 = sum(np.min(np.abs(np.array(results["y2"].indices) - q)) <= 25
                for q in q2)
    assert hits2 == len(q2)  # both planted QTL of trait 2 recovered
    extras2 = sum(np.min(np.abs(q2 - j)) > 25 for j in results["y2"].indices)
    assert extras2 <= 2      # polygenic background → occasional extras
    hits1 = sum(np.min(np.abs(np.array(results["y1"].indices) - q)) <= 25
                for q in sim1.qtl_idx)
    assert hits1 >= 1


def test_am_multi_union_na(multi):
    sim1, q2, pheno = multi
    cols = {k: np.asarray(v).copy() for k, v in pheno.items()}
    cols["y1"] = cols["y1"].astype(float)
    cols["y1"][5] = np.nan
    cols["y2"] = cols["y2"].astype(float)
    cols["y2"][10] = np.nan
    results = ee.am_multi(["y1", "y2"], geno=sim1.geno, pheno=cols,
                          fformula="age", maxit=4)
    assert results["y1"].n == 128  # union NA drop
    assert sorted(results["y1"].dropped_records) == [5, 10]


def test_am_multi_unknown_trait(multi):
    sim1, _, pheno = multi
    with pytest.raises(KeyError):
        ee.am_multi(["y1", "zzz"], geno=sim1.geno, pheno=pheno)


def test_am_multi_matfree_matches_single_trait(multi):
    """The lockstep matfree multi-trait scan (union Krylov basis shared
    across traits) selects exactly what per-trait am(engine='matfree')
    selects — BASELINE config 5 at config-4 n (VERDICT r3 item 6)."""
    sim1, q2, pheno = multi
    results = ee.am_multi(["y1", "y2"], geno=sim1.geno, pheno=pheno,
                          fformula="age + sex", maxit=6, engine="matfree")
    for t in ("y1", "y2"):
        single = ee.am(trait=t, geno=sim1.geno, pheno=pheno,
                       fformula="age + sex", maxit=6, engine="matfree")
        assert results[t].indices == single.indices, t
        np.testing.assert_allclose(results[t].extbic_path,
                                   single.extbic_path, rtol=1e-6)


def test_am_multi_auto_routes_to_matfree(multi, monkeypatch):
    """engine='auto' must switch am_multi to matfree above
    config.matfree_min_n, mirroring am()'s routing."""
    from eagleeverything_tpu.models import bigscan
    from eagleeverything_tpu.utils.config import EagleConfig

    sim1, _, pheno = multi
    called = {}
    orig = bigscan.forward_select_matfree_multi

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(bigscan, "forward_select_matfree_multi", spy)
    cfg = EagleConfig(matfree_min_n=64)   # n=130 > 64 → matfree
    ee.am_multi(["y1"], geno=sim1.geno, pheno=pheno, maxit=2, config=cfg)
    assert called.get("yes")


def test_am_multi_matfree_checkpoint_resume(multi, tmp_path):
    """A killed lockstep multi-trait scan resumes from its checkpoint to
    the identical selection (VERDICT r4 item 3: §6.3/§6.4 at the one
    scale forward_select_matfree_multi exists for)."""
    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    sim1, q2, pheno = multi
    src = engine_jax.DenseTileSource(sim1.geno)
    ys = np.stack([np.asarray(pheno["y1"], np.float64),
                   np.asarray(pheno["y2"], np.float64)])
    X0 = np.ones((130, 1))
    kw = dict(probes=32, diag_probes=96, exact_topk=16)

    def backend():
        return engine_jax.TiledScan(src, EagleConfig())

    col = backend().column_f64
    fresh = bigscan.forward_select_matfree_multi(
        ys, X0, backend(), maxit=5, column_f64=col, **kw)
    assert any(len(r.indices) >= 2 for r in fresh)
    d = str(tmp_path / "mck")
    # "kill" after 1 iteration, then resume to the same maxit
    bigscan.forward_select_matfree_multi(
        ys, X0, backend(), maxit=1, fixit=True, column_f64=col,
        ckpt_dir=d, **kw)
    resumed = bigscan.forward_select_matfree_multi(
        ys, X0, backend(), maxit=5, column_f64=col, ckpt_dir=d,
        resume=True, **kw)
    for t in range(2):
        assert resumed[t].indices == fresh[t].indices, t
        np.testing.assert_allclose(resumed[t].extbic_path,
                                   fresh[t].extbic_path, rtol=1e-6)

    # a checkpoint for DIFFERENT traits must refuse to resume
    ys_bad = ys.copy()
    ys_bad[0] = ys_bad[0] + 1.0
    with pytest.raises(ValueError, match="refusing to resume"):
        bigscan.forward_select_matfree_multi(
            ys_bad, X0, backend(), maxit=5, column_f64=col, ckpt_dir=d,
            resume=True, **kw)


def test_matfree_resume_unfingerprinted_starts_fresh(multi, tmp_path):
    """Single-trait resume with a pre-fingerprint checkpoint warns and
    starts fresh instead of aborting the run (advisor r4)."""
    import json

    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    sim1, _, _ = multi
    src = engine_jax.DenseTileSource(sim1.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    X0 = np.ones((130, 1))
    kw = dict(probes=32, diag_probes=96, exact_topk=16,
              column_f64=backend.column_f64)
    d = str(tmp_path / "ck")
    bigscan.forward_select_matfree(sim1.y, X0, backend, maxit=1,
                                   fixit=True, ckpt_dir=d, **kw)
    sp = tmp_path / "ck" / "scan_state.json"
    st = json.loads(sp.read_text())
    for k in ("trait_sum", "trait_sq", "fit_exact"):
        st["meta"].pop(k, None)
    sp.write_text(json.dumps(st))
    with pytest.warns(UserWarning, match="no trait fingerprint"):
        res = bigscan.forward_select_matfree(
            sim1.y, X0, engine_jax.TiledScan(src, EagleConfig()),
            maxit=3, ckpt_dir=d, resume=True, **kw)
    fresh = bigscan.forward_select_matfree(
        sim1.y, X0, engine_jax.TiledScan(src, EagleConfig()),
        maxit=3, **kw)
    assert res.indices == fresh.indices  # started from scratch


def test_score_sweep_matfree_multi_matches_serial(multi):
    """The batched sweep (one multi-shift CG + one matfree_stat_rows_multi
    pass for all traits) returns the same statistics, candidate, and
    proof bookkeeping as per-trait score_sweep_matfree — including with
    DIVERGED per-trait models (different q_t and exclude sets)."""
    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    sim1, q2, pheno = multi
    src = engine_jax.DenseTileSource(sim1.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    ctx = bigscan.make_context(backend, 130, probes=32)
    X0 = np.ones((130, 1))
    col = backend.column_f64
    y2 = np.asarray(pheno["y2"], np.float64)
    ys = [np.asarray(sim1.y, np.float64), y2]
    # diverge the models: trait 2 already carries one selected marker
    Xs = [X0, np.column_stack([X0, col(123)])]
    excludes = [[], [123]]
    fits = [bigscan.reml_maximize_matfree(ctx, ys[t], Xs[t])
            for t in range(2)]

    serial = [bigscan.score_sweep_matfree(
        ctx, backend, ys[t], Xs[t], fits[t], diag_probes=96,
        exact_topk=16, column_f64=col, exclude=excludes[t])
        for t in range(2)]
    batched = bigscan.score_sweep_matfree_multi(
        ctx, backend, ys, Xs, fits, diag_probes=96, exact_topk=16,
        column_f64=col, excludes=excludes)
    for t in range(2):
        ts, cs, _ = serial[t]
        tb, cb, infob = batched[t]
        assert cb == cs, t
        # every exactly-rescored entry agrees to CG tolerance; probe
        # estimates are identical (same probe block)
        np.testing.assert_allclose(tb[cs], ts[cs], rtol=1e-5)
        assert not infob["exhausted"]


def test_solve_block_shifts_matches_per_delta(multi):
    """One multi-shift CG equals per-δ blocked solves column by column."""
    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    sim1, _, _ = multi
    src = engine_jax.DenseTileSource(sim1.geno)
    backend = engine_jax.TiledScan(src, EagleConfig())
    ctx = bigscan.make_context(backend, 130, probes=16)
    rng = np.random.default_rng(3)
    B = rng.standard_normal((130, 5))
    shifts = np.array([0.3, 0.3, 2.0, 7.0, 0.01])
    Xm = ctx.solve_block_shifts(shifts, B)
    for c in range(5):
        ref = ctx.solve_block(float(shifts[c]), B[:, c : c + 1])
        np.testing.assert_allclose(Xm[:, c], ref[:, 0], rtol=2e-4,
                                   atol=1e-7)


def test_multi_jax_engine_guards_host_eigh(multi):
    """Forcing engine='jax' above host_eigh_max_n errors loudly instead
    of materializing an n-squared f64 eigenbasis on the host."""
    from eagleeverything_tpu.utils.config import EagleConfig

    sim1, _, pheno = multi
    cfg = EagleConfig(host_eigh_max_n=64)   # n=130 > 64
    with pytest.raises(ValueError, match="matfree"):
        ee.am_multi(["y1"], geno=sim1.geno, pheno=pheno, maxit=2,
                    engine="jax", config=cfg)


def test_am_multi_matfree_no_signal_trait(multi):
    """A pure-noise trait in the lockstep matfree scan selects nothing
    and never perturbs its co-scanned signal trait (traits go inactive
    independently; the union Krylov basis shrinks with them)."""
    sim1, _, pheno = multi
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(130)
    cols = {"y1": np.asarray(pheno["y1"]), "noise": noise}
    res = ee.am_multi(["y1", "noise"], geno=sim1.geno, pheno=cols,
                      maxit=4, engine="matfree")
    s_y = ee.am(trait="y1", geno=sim1.geno, pheno=cols, maxit=4,
                engine="matfree")
    s_n = ee.am(trait="noise", geno=sim1.geno, pheno=cols, maxit=4,
                engine="matfree")
    assert res["y1"].indices == s_y.indices
    assert res["noise"].indices == s_n.indices
