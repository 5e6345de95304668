"""API-surface tests: the exported functions end-to-end via file handles
(reference: R CMD check runs the man-page examples as integration tests,
SURVEY.md §5 — this file is the rebuild's equivalent)."""

import json
import os

import numpy as np
import pytest

import eagleeverything_tpu as ee
from eagleeverything_tpu.data import simulate as simmod


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tutorial")
    sim = simmod.write_tutorial(str(d), n=120, p=1000, seed=13)
    return str(d), sim


@pytest.fixture(scope="module")
def handles(data_dir):
    d, sim = data_dir
    geno = ee.read_marker(os.path.join(d, "geno.txt"))
    pheno = ee.read_pheno(os.path.join(d, "pheno.txt"))
    map_h = ee.read_map(os.path.join(d, "map.txt"))
    return geno, pheno, map_h, sim


def test_am_end_to_end(handles):
    geno, pheno, map_h, sim = handles
    res = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                map=map_h, maxit=8)
    assert len(res.indices) >= 1
    # all planted QTL recovered (within the 25-SNP LD block); the polygenic
    # background makes occasional extra selections legitimate — allow ≤ 2
    hits = sum(np.min(np.abs(np.array(res.indices) - q)) <= 25
               for q in sim.qtl_idx)
    assert hits == len(sim.qtl_idx)
    extras = sum(np.min(np.abs(sim.qtl_idx - j)) > 25 for j in res.indices)
    assert extras <= 2
    assert res.marker_names[0] == map_h.marker_names[res.indices[0]]
    assert res.trait_name == "y"


def test_am_oracle_engine_agrees(handles):
    geno, pheno, map_h, _ = handles
    r1 = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
               maxit=8, engine="jax")
    r2 = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
               maxit=8, engine="oracle")
    assert r1.indices == r2.indices


def test_am_auto_routes_to_matfree(handles, tmp_path):
    """engine='auto' switches to the matrix-free engine above
    config.matfree_min_n (selection unchanged), and am() forwards
    ckpt_dir/resume to it."""
    geno, pheno, _, _ = handles
    r_jax = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                  maxit=6, engine="jax")
    cfg = ee.EagleConfig(matfree_min_n=10)  # force matfree at tutorial n
    d = str(tmp_path / "mfck")
    r_auto = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                   maxit=6, engine="auto", config=cfg, ckpt_dir=d)
    assert r_auto.indices == r_jax.indices
    import os
    assert any("scan_state" in f for f in os.listdir(d))  # ckpt forwarded


def test_am_sharded_engine_agrees(handles):
    geno, pheno, _, _ = handles
    r1 = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
               maxit=8, engine="jax")
    r3 = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
               maxit=8, engine="sharded")
    assert r1.indices == r3.indices


def test_am_with_na_phenotypes(handles):
    geno, pheno, _, sim = handles
    cols = dict(pheno.columns)
    y = cols["y"].copy()
    y[3] = np.nan
    y[77] = np.nan
    cols["y"] = y
    res = ee.am(trait="y", geno=geno, pheno=cols, fformula="age + sex",
                maxit=6)
    assert res.n == 118
    assert list(res.dropped_records) == [3, 77]
    assert len(res.indices) >= 1


def test_summary_am(handles):
    geno, pheno, map_h, _ = handles
    res = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                maxit=8)
    s = ee.summary_am(res, trait="y", geno=geno, pheno=pheno,
                      fformula="age + sex", quiet=True)
    assert len(s.indices) == len(res.indices)
    assert (s.pvalue < 0.05).all()
    # matfree Wald path (biobank-n summary): same betas/se to CG+f32
    # tolerance — it reuses the scan's (delta, sigma2) rather than refit,
    # so allow a modest relative band
    sm = ee.summary_am(res, trait="y", geno=geno, pheno=pheno,
                       fformula="age + sex", quiet=True, engine="matfree")
    np.testing.assert_allclose(sm.beta, s.beta, rtol=0.05)
    np.testing.assert_allclose(sm.se, s.se, rtol=0.10)
    assert (sm.pvalue < 0.05).all()


def test_fpr4am_batched(handles):
    geno, pheno, _, _ = handles
    out = ee.fpr4am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                    numreps=6, seed=1)
    assert out["lambda"] >= 0
    assert len(out["lambda_crits"]) == 6
    assert np.isfinite(out["lambda_crits"]).all()


def test_fpr4am_batching_invariance(handles):
    """Permutation batching must not change the calibration (SURVEY.md §5
    property tests: permutation batching equivalence)."""
    geno, pheno, _, _ = handles
    a = ee.fpr4am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                  numreps=5, seed=3, perm_batch=1)
    b = ee.fpr4am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                  numreps=5, seed=3, perm_batch=5)
    np.testing.assert_allclose(a["lambda_crits"], b["lambda_crits"],
                               rtol=1e-8)


def test_plot_am_smoke(handles, tmp_path):
    pytest.importorskip("matplotlib")
    geno, pheno, map_h, _ = handles
    res = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                maxit=6)
    out = str(tmp_path / "p.png")
    ee.plot_am(res, map=map_h, save=out)
    assert os.path.getsize(out) > 1000
    out2 = str(tmp_path / "t.png")
    ee.plot_am(res, type="trace", save=out2)
    assert os.path.getsize(out2) > 1000
    # interactive standalone export (reference PlotAM's plotly mode)
    out3 = str(tmp_path / "p.html")
    ret = ee.plot_am(res, map=map_h, save=out3)
    assert ret == out3
    html = open(out3).read()
    assert "eeDrawManhattan" in html and '"rank"' in html
    for j in res.indices:  # every selected marker's name ships in the data
        assert str(map_h.marker_names[j]) in html


def test_am_checkpoint_via_api(handles, tmp_path):
    geno, pheno, _, _ = handles
    ck = str(tmp_path / "ck")
    r1 = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
               maxit=1, fixit=True, ckpt_dir=ck)
    r2 = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
               maxit=8, ckpt_dir=ck, resume=True)
    r_fresh = ee.am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                    maxit=8)
    assert r2.indices == r_fresh.indices


def test_cli_end_to_end(data_dir, tmp_path):
    from eagleeverything_tpu.cli import main
    d, sim = data_dir
    out_json = str(tmp_path / "r.json")
    rc = main([
        "am", "--geno", os.path.join(d, "geno.txt"),
        "--pheno", os.path.join(d, "pheno.txt"),
        "--trait", "y", "--fformula", "age + sex",
        "--map", os.path.join(d, "map.txt"),
        "--maxit", "6", "--json", out_json,
    ])
    assert rc == 0
    payload = json.load(open(out_json))
    assert payload["trait"] == "y"
    assert len(payload["indices"]) >= 1


def test_cli_error_paths(data_dir):
    from eagleeverything_tpu.cli import main
    d, _ = data_dir
    rc = main(["am", "--geno", os.path.join(d, "geno.txt"),
               "--pheno", os.path.join(d, "pheno.txt"), "--trait", "zzz"])
    assert rc == 2
    rc = main(["am", "--geno", "/does/not/exist",
               "--pheno", os.path.join(d, "pheno.txt"), "--trait", "y"])
    assert rc == 2


def test_fpr_lambda_crit_semantics(handles):
    """λ_crit is the exact accept/reject threshold: scanning the SAME
    permuted trait with λ just below λ_crit must select ≥1 marker, just
    above must select none."""
    geno, pheno, _, _ = handles
    out = ee.fpr4am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                    numreps=1, seed=11)
    lam_crit = float(out["lambda_crits"][0])
    if lam_crit <= 0:
        pytest.skip("permutation rejected even at lambda=0")
    # reproduce the permutation fpr4am drew (same rng stream)
    from eagleeverything_tpu.api.common import prepare_inputs
    prep = prepare_inputs("y", geno, pheno, "age + sex", None)
    y_perm = np.random.default_rng(11).permutation(prep.y)
    cols = {"y": _reinsert(y_perm, prep), "age": pheno.columns["age"],
            "sex": pheno.columns["sex"]}
    r_low = ee.am(trait="y", geno=geno, pheno=cols, fformula="age + sex",
                  maxit=1, lam=lam_crit * 0.98)
    r_high = ee.am(trait="y", geno=geno, pheno=cols, fformula="age + sex",
                   maxit=1, lam=lam_crit * 1.02)
    assert len(r_low.indices) >= 1
    assert len(r_high.indices) == 0


def _reinsert(y_kept, prep):
    """Scatter kept-record values back to full record order (no NA in the
    fixture, so this is the identity)."""
    assert len(prep.keep) == len(y_kept)
    out = np.empty(len(prep.keep))
    out[:] = y_kept
    return out


def test_cli_profile_flag(data_dir, tmp_path):
    """--profile writes a jax.profiler trace directory (works on CPU too)."""
    from eagleeverything_tpu.cli import main
    d, _ = data_dir
    prof = str(tmp_path / "trace")
    rc = main(["am", "--geno", os.path.join(d, "geno.txt"),
               "--pheno", os.path.join(d, "pheno.txt"),
               "--trait", "y", "--maxit", "1", "--fixit",
               "--profile", prof])
    assert rc == 0
    assert os.path.isdir(prof)
    found = []
    for root, _dirs, files in os.walk(prof):
        found += files
    assert found, "no trace files written"


def test_fpr_calibration_out_of_sample(handles):
    """λ* calibrated on one permutation sample must control the false-
    positive rate on an INDEPENDENT permutation sample (loose statistical
    bounds; 40 reps each)."""
    geno, pheno, _, _ = handles
    kw = dict(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
              numreps=40)
    cal = ee.fpr4am(falseposrate=0.10, seed=101, **kw)
    fresh = ee.fpr4am(falseposrate=0.10, seed=202, **kw)
    crits = np.asarray(fresh["lambda_crits"])
    fpr_at_star = float(np.mean(crits > cal["lambda"]))
    # binomial(40, 0.10): p(≥13 successes) < 1e-5 → generous upper bound
    assert fpr_at_star <= 0.30, fpr_at_star
    # monotonicity: a larger lambda can only reduce the FP fraction
    assert float(np.mean(crits > cal["lambda"] * 2)) <= fpr_at_star
    # and lambda=0 would fire on (nearly) every permutation
    assert float(np.mean(crits > 0)) >= 0.8


def test_fpr_lambda_crit_brute_force_grid(handles):
    """Brute-force verification of the FPR4AM semantics (SURVEY §4.3): for
    several permutations, rerunning the FULL am() over a λ grid must
    reproduce "≥1 (false) marker selected ⇔ λ < λ_crit" at every grid
    point. (A scan selects ≥1 marker iff its FIRST step accepts — extBIC
    acceptance is monotone in λ — so the analytic first-step rule equals
    the reference's 'smallest λ with ≥1 false selection'; PARITY.md
    deviation ledger row F1.)"""
    geno, pheno, _, _ = handles
    numreps = 4
    out = ee.fpr4am(trait="y", geno=geno, pheno=pheno, fformula="age + sex",
                    numreps=numreps, seed=23)
    from eagleeverything_tpu.api.common import prepare_inputs
    prep = prepare_inputs("y", geno, pheno, "age + sex", None)
    rng = np.random.default_rng(23)
    perms = [rng.permutation(prep.y) for _ in range(numreps)]
    checked = 0
    for r in range(numreps):
        lam_crit = float(out["lambda_crits"][r])
        cols = {"y": _reinsert(perms[r], prep),
                "age": pheno.columns["age"], "sex": pheno.columns["sex"]}
        for lam in (0.05, 0.5, 1.0, 2.0):
            if abs(lam - lam_crit) < 0.02:
                continue  # knife-edge: numerically undefined side
            res = ee.am(trait="y", geno=geno, pheno=cols,
                        fformula="age + sex", maxit=5, lam=lam)
            assert (len(res.indices) >= 1) == (lam < lam_crit), \
                (r, lam, lam_crit, res.indices)
            checked += 1
    assert checked >= 12
