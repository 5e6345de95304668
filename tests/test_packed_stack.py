"""Device-resident 2-bit packed stack (the 50k×1M single-chip enabler).

When the recoded f32/bf16 W stack exceeds the HBM cache budget but the
2-bit PACKED bytes fit (16× smaller), TiledScan keeps the packed store
itself resident on device and unpacks per tile inside the jitted loops
(engine_jax._packed_kv). Every path that consumes tiles — kernel_matvec,
device CG/Lanczos, sweep_dots, compute_K, the full matfree scan — must
be numerically identical to the streamed form (reference analog: the
ReadBlock sweep of ``calculate_a_and_vara_rcpp``, SURVEY.md §4.2, with
HBM standing in for disk)."""

import numpy as np
import pytest

from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.io.genostore import GenotypeStore
from eagleeverything_tpu.models import engine_jax
from eagleeverything_tpu.utils.config import EagleConfig

N, P = 64, 700


@pytest.fixture(scope="module")
def packed_store(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pstore"))
    sim = simulate_dataset(n=N, p=P, n_qtl=2, seed=11, missing_rate=0.02)
    GenotypeStore.create_from_dense(d, sim.geno, n_shards=3, packed=True)
    return d, sim


def _scans(d):
    """(packed-stack scan, streamed reference scan) over the same store.

    snp_tile=256 forces several tiles; the tiny budget rules out the
    recoded W cache (64·700·4 B > 0.5·budget) while the packed bytes
    (≈ 768·16 B) stay inside 0.9·budget."""
    src = engine_jax.StoreTileSource(d)
    cfg_packed = EagleConfig(snp_tile=256, device_cache_gb=1.5e-4)
    sc_p = engine_jax.TiledScan(src, cfg_packed)
    assert not sc_p.cache_device and sc_p.cache_packed_device
    sc_s = engine_jax.TiledScan(engine_jax.StoreTileSource(d),
                                EagleConfig(snp_tile=256))
    assert sc_s.cache_device  # default budget: plain recoded-cache path
    return sc_p, sc_s


def test_packed_stack_eligibility_guards(packed_store, tmp_path):
    d, sim = packed_store
    # unpacked store → stack builder declines and falls back
    d2 = str(tmp_path / "unpacked")
    GenotypeStore.create_from_dense(d2, sim.geno, n_shards=2, packed=False)
    sc = engine_jax.TiledScan(engine_jax.StoreTileSource(d2),
                              EagleConfig(snp_tile=256,
                                          device_cache_gb=1.5e-4))
    assert sc._packed_stack() is None and not sc.cache_packed_device
    # NA row mask → raw tiles unavailable → streamed path
    keep = np.ones(N, dtype=bool)
    keep[0] = False
    sc2 = engine_jax.TiledScan(engine_jax.StoreTileSource(d, keep=keep),
                               EagleConfig(snp_tile=256,
                                           device_cache_gb=1.5e-4))
    assert sc2._packed_stack() is None


def test_packed_kernel_matvec_matches(packed_store):
    d, _ = packed_store
    sc_p, sc_s = _scans(d)
    rng = np.random.default_rng(0)
    V = rng.standard_normal((N, 5))
    got = sc_p.kernel_matvec(V)
    ref = sc_s.kernel_matvec(V)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_packed_compute_K_matches(packed_store):
    d, _ = packed_store
    sc_p, sc_s = _scans(d)
    np.testing.assert_allclose(sc_p.compute_K(), sc_s.compute_K(),
                               rtol=1e-5, atol=1e-4)


def test_packed_sweep_dots_matches(packed_store):
    d, _ = packed_store
    sc_p, sc_s = _scans(d)
    rng = np.random.default_rng(1)
    A = rng.standard_normal((N, 9))
    np.testing.assert_allclose(sc_p.sweep_dots(A), sc_s.sweep_dots(A),
                               rtol=1e-5, atol=1e-4)


def test_packed_device_cg_matches(packed_store):
    d, _ = packed_store
    sc_p, sc_s = _scans(d)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((N, 3))
    s0 = float(np.trace(sc_s.compute_K()) / N)
    Xp = sc_p.device_cg(B, delta=0.7, s0=s0, tol=1e-6, maxiter=400)
    Xs = sc_s.device_cg(B, delta=0.7, s0=s0, tol=1e-6, maxiter=400)
    assert Xp is not None and Xs is not None
    np.testing.assert_allclose(Xp, Xs, rtol=5e-4, atol=5e-4)
    # against the dense f64 solve
    K = sc_s.compute_K() / s0 + 0.7 * np.eye(N)
    np.testing.assert_allclose(Xp, np.linalg.solve(K, B),
                               rtol=5e-3, atol=5e-3)


def test_packed_device_lanczos_matches(packed_store):
    d, _ = packed_store
    sc_p, sc_s = _scans(d)
    rng = np.random.default_rng(3)
    Z = rng.standard_normal((N, 4))
    s0 = float(np.trace(sc_s.compute_K()) / N)
    ap, bp, znp_, _ = sc_p.device_lanczos(Z, m=20, reorth=True, s0=s0)
    as_, bs, zns, _ = sc_s.device_lanczos(Z, m=20, reorth=True, s0=s0)
    np.testing.assert_allclose(znp_, zns, rtol=1e-6)
    # early Lanczos coefficients are well-conditioned; later ones drift in
    # f32 — compare the leading block, which pins the same Krylov space
    np.testing.assert_allclose(ap[:8, :4], as_[:8, :4], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(bp[:8, :4], bs[:8, :4], rtol=1e-3, atol=1e-3)


def test_packed_matfree_stat_rows_matches_host_reduction(packed_store):
    """The fused device statistics (â, u, Hutchinson diag, proj) must
    match the sweep_dots + host-reduction fallback, including the q→q8
    zero-padding of u/Minv."""
    d, _ = packed_store
    sc_p, sc_s = _scans(d)
    rng = np.random.default_rng(4)
    q, r = 3, 16  # q=3 exercises the pad-to-8 path
    A = np.column_stack([rng.standard_normal((N, 1 + q)),
                         rng.choice((-1.0, 1.0), size=(N, r))])
    M = rng.standard_normal((q, q))
    Minv = M @ M.T + np.eye(q)  # any symmetric matrix works here
    a_p, U_p, d_p, pr_p = sc_p.matfree_stat_rows(A, q, Minv)
    a_s, U_s, d_s, pr_s = sc_s.matfree_stat_rows(A, q, Minv)
    np.testing.assert_allclose(a_p, a_s, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(U_p, U_s, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(d_p, d_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pr_p, pr_s, rtol=1e-4, atol=1e-3)


NP_, PP_ = 256, 3000  # pallas fixture: nb pads 64→512, so a larger shape
                      # keeps padded packed bytes below the recoded cache


@pytest.fixture(scope="module")
def pallas_store(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ppstore"))
    sim = simulate_dataset(n=NP_, p=PP_, n_qtl=2, seed=13,
                           missing_rate=0.02)
    GenotypeStore.create_from_dense(d, sim.geno, n_shards=2, packed=True)
    return d, sim


def _pallas_scans(d):
    """(pallas-forced packed scan, streamed reference scan) — interpret
    mode on CPU, same call sites as the compiled TPU path. Budget 3e-3 GB:
    recoded f32 cache (256·3000·4 B) ineligible, padded packed bytes
    (3072·512 B) eligible."""
    src = engine_jax.StoreTileSource(d)
    cfg = EagleConfig(snp_tile=256, device_cache_gb=3e-3,
                      pallas_packed=True)
    sc = engine_jax.TiledScan(src, cfg)
    assert sc.cache_packed_device and sc._use_pallas
    sc_s = engine_jax.TiledScan(engine_jax.StoreTileSource(d),
                                EagleConfig(snp_tile=256))
    assert sc_s.cache_device
    return sc, sc_s


def test_pallas_kernel_matvec_matches(pallas_store):
    d, _ = pallas_store
    sc_p, sc_s = _pallas_scans(d)
    rng = np.random.default_rng(0)
    V = rng.standard_normal((NP_, 5))
    np.testing.assert_allclose(sc_p.kernel_matvec(V),
                               sc_s.kernel_matvec(V),
                               rtol=1e-4, atol=1e-2)


def test_pallas_sweep_dots_and_stats_match(pallas_store):
    d, _ = pallas_store
    sc_p, sc_s = _pallas_scans(d)
    rng = np.random.default_rng(1)
    A = rng.standard_normal((NP_, 9))
    np.testing.assert_allclose(sc_p.sweep_dots(A), sc_s.sweep_dots(A),
                               rtol=1e-4, atol=1e-3)
    q, r = 3, 12
    A2 = np.column_stack([rng.standard_normal((NP_, 1 + q)),
                          rng.choice((-1.0, 1.0), size=(NP_, r))])
    M = rng.standard_normal((q, q))
    Minv = M @ M.T + np.eye(q)
    for got, ref in zip(sc_p.matfree_stat_rows(A2, q, Minv),
                        sc_s.matfree_stat_rows(A2, q, Minv)):
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)


def test_pallas_device_cg_matches(pallas_store):
    d, _ = pallas_store
    sc_p, sc_s = _pallas_scans(d)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((NP_, 3))
    s0 = float(np.trace(sc_s.compute_K()) / NP_)
    Xp = sc_p.device_cg(B, delta=0.7, s0=s0, tol=1e-6, maxiter=400)
    Xs = sc_s.device_cg(B, delta=0.7, s0=s0, tol=1e-6, maxiter=400)
    np.testing.assert_allclose(Xp, Xs, rtol=5e-3, atol=5e-3)


def test_matfree_scan_on_pallas_stack_matches_dense(pallas_store):
    d, sim = pallas_store
    from eagleeverything_tpu.api.am import am
    from eagleeverything_tpu.api.read import GenoHandle

    h_store = GenoHandle(n=NP_, p=PP_, source="t", store_dir=d)
    h_dense = GenoHandle(n=NP_, p=PP_, source="t", geno=sim.geno)
    cfg = EagleConfig(snp_tile=256, device_cache_gb=3e-3,
                      pallas_packed=True)
    res_p = am("y", h_store, {"y": sim.y}, maxit=3, engine="matfree",
               config=cfg)
    res_d = am("y", h_dense, {"y": sim.y}, maxit=3, engine="matfree")
    assert res_p.indices == res_d.indices


def test_matfree_scan_on_packed_stack_matches_dense(packed_store):
    """Full am(engine='matfree') forced onto the packed-stack backend must
    select the same markers as the in-memory dense engine."""
    d, sim = packed_store
    from eagleeverything_tpu.api.am import am
    from eagleeverything_tpu.api.read import GenoHandle

    pheno = {"y": sim.y}
    h_store = GenoHandle(n=N, p=P, source="t", store_dir=d)
    h_dense = GenoHandle(n=N, p=P, source="t", geno=sim.geno)
    cfg = EagleConfig(snp_tile=256, device_cache_gb=1.5e-4)
    res_p = am("y", h_store, pheno, maxit=4, engine="matfree", config=cfg)
    res_d = am("y", h_dense, pheno, maxit=4, engine="matfree")
    assert res_p.indices == res_d.indices
    np.testing.assert_allclose(res_p.extbic_path, res_d.extbic_path,
                               rtol=1e-3)


def test_zmat_device_krylov(packed_store):
    """Zmat designs keep the device Krylov path (VERDICT r3 item 9): the
    one-hot incidence is carried as an index vector into the jitted CG/
    Lanczos programs (record-space H = Z·K·Zᵀ/s0 + δI), matching the
    streamed host form on both the packed-stack and dense-stack
    backends."""
    from eagleeverything_tpu.models import bigscan

    d, sim = packed_store
    rng = np.random.default_rng(5)
    n_rec = N + 20                      # repeated measures: n_rec > n_ind
    z_idx = np.concatenate([np.arange(N),
                            rng.integers(0, N, size=n_rec - N)])
    Z = np.zeros((n_rec, N))
    Z[np.arange(n_rec), z_idx] = 1.0
    sc_p, sc_s = _scans(d)
    s0 = 120.0
    B = rng.standard_normal((n_rec, 3))

    def host_mv(V):
        return Z @ sc_s.kernel_matvec(Z.T @ V) / s0 + 0.3 * V

    X_host = bigscan.blocked_cg(host_mv, B, tol=1e-7)
    for sc in (sc_p, sc_s):
        X_dev = sc.device_cg(B, 0.3, s0, tol=1e-7, z_idx=z_idx)
        assert X_dev is not None, "device path did not engage with Zmat"
        np.testing.assert_allclose(X_dev, X_host, rtol=2e-4, atol=2e-5)
        # warm start: exact same solution from a perturbed guess
        X_warm = sc.device_cg(B, 0.3, s0, tol=1e-7, z_idx=z_idx,
                              x0=X_host + 0.01)
        np.testing.assert_allclose(X_warm, X_host, rtol=2e-4, atol=2e-5)

    # Lanczos: record-space tridiagonal matches the host recurrence
    Zc = rng.standard_normal((n_rec, 2))
    dev = sc_p.device_lanczos(Zc, 10, True, s0, z_idx=z_idx)
    assert dev is not None
    a_d, b_d, zn_d, _ = dev
    a_h, b_h, zn_h, _ = bigscan._lanczos(
        lambda V: Z @ (sc_s.kernel_matvec(Z.T @ V)) / s0, Zc, 10,
        reorth=True)
    np.testing.assert_allclose(a_d[:, :2], a_h, rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(zn_d[:2], zn_h, rtol=1e-6)

    # the matfree context wires the hooks for one-hot Z
    ctx = bigscan.make_context(sc_p, n_rec, Z=Z)
    assert ctx.device_solve is not None
    Sol = ctx.solve_block(0.3, B / s0 * s0)
    np.testing.assert_allclose(
        Sol, bigscan.blocked_cg(ctx.h_matvec(0.3), B, tol=1e-8),
        rtol=5e-3, atol=5e-4)
