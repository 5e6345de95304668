"""Engine parity tests: the TPU-native JAX engine (tiled, out-of-core,
SNP-sharded) must reproduce the dense f64 oracle's marker selection and
extBIC trajectory (SURVEY.md §5 "Oracle tests without R")."""

import numpy as np
import pytest

import jax

from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import engine_jax, oracle
from eagleeverything_tpu.utils.config import EagleConfig


@pytest.fixture(scope="module")
def sim():
    return simulate_dataset(n=150, p=1200, n_qtl=3, seed=11)


@pytest.fixture(scope="module")
def oracle_res(sim):
    X0 = _design(sim)
    return oracle.forward_select(sim.y, X0, sim.geno, maxit=10)


def _design(sim):
    n = sim.y.shape[0]
    return np.column_stack(
        [np.ones(n), sim.covariate - sim.covariate.mean(), sim.group.astype(float)]
    )


def _handle(sim):
    return GenoHandle(n=sim.geno.shape[0], p=sim.geno.shape[1],
                      source="<test>", geno=sim.geno)


def _check_matches_oracle(res, oracle_res):
    assert res.indices == oracle_res.indices
    assert np.allclose(res.extbic_path, oracle_res.extbic_path, rtol=1e-3)
    assert res.delta == pytest.approx(oracle_res.delta, rel=1e-2)
    for t_e, t_o in zip(res.outlier_stats, oracle_res.outlier_stats):
        assert np.allclose(t_e, t_o, rtol=1e-2, atol=1e-3)


def test_tiled_engine_matches_oracle(sim, oracle_res):
    res = engine_jax.forward_select(sim.y, _design(sim), _handle(sim), maxit=10)
    _check_matches_oracle(res, oracle_res)


def test_tiled_engine_small_tiles_match(sim, oracle_res):
    """Tile-size invariance of the streamed path (SURVEY.md §5 property
    tests: block-size invariance)."""
    cfg = EagleConfig(snp_tile=256)
    res = engine_jax.forward_select(
        sim.y, _design(sim), _handle(sim), maxit=10, config=cfg
    )
    _check_matches_oracle(res, oracle_res)


def test_store_engine_matches_oracle(sim, oracle_res, tmp_path):
    """Out-of-core genotype store path (streamed tiles from disk)."""
    from eagleeverything_tpu.io.genostore import GenotypeStore
    d = str(tmp_path / "store")
    GenotypeStore.create_from_dense(d, sim.geno, n_shards=3)
    handle = GenoHandle(n=sim.geno.shape[0], p=sim.geno.shape[1],
                        source="<store>", store_dir=d)
    cfg = EagleConfig(snp_tile=256, device_cache_gb=1e-6)  # forbid device cache
    res = engine_jax.forward_select(
        sim.y, _design(sim), handle, maxit=10, config=cfg
    )
    _check_matches_oracle(res, oracle_res)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_engine_matches_oracle(sim, oracle_res):
    """SNP-sharded shard_map path: psum MMt + collective argmax
    (SURVEY.md §5: shard-count invariance)."""
    res = engine_jax.forward_select(
        sim.y, _design(sim), _handle(sim), maxit=10, sharded=True
    )
    _check_matches_oracle(res, oracle_res)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_shard_count_invariance(sim):
    """1 vs 2 vs 8 shards → identical selections (SURVEY.md §5)."""
    picks = []
    for ndev in (1, 2, 8):
        cfg = EagleConfig(mesh_shape=(1, ndev))
        backend_devices = jax.devices()[:ndev]
        src = engine_jax.DenseTileSource(sim.geno)
        scan = engine_jax.ShardedScan(src, cfg, devices=backend_devices)
        K = scan.compute_K()
        picks.append(K)
    assert np.allclose(picks[0], picks[1], rtol=1e-5, atol=1e-4)
    assert np.allclose(picks[0], picks[2], rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_full_scan_shard_count_invariance(sim):
    """Complete sharded scans on 2 vs 8 devices select identically
    (SURVEY.md §5: shard-count invariance at the decision level)."""
    X0 = _design(sim)
    results = []
    for ndev in (2, 8):
        cfg = EagleConfig(mesh_shape=(1, ndev))
        src = engine_jax.DenseTileSource(sim.geno)
        backend = engine_jax.ShardedScan(src, cfg,
                                         devices=jax.devices()[:ndev])
        # drive the full forward loop manually against this backend via
        # the public entry (engine picks mesh from config)
        res = engine_jax.forward_select(
            sim.y, X0, _handle(sim), maxit=6, sharded=True, config=cfg)
        results.append(res)
    assert results[0].indices == results[1].indices
    np.testing.assert_allclose(results[0].extbic_path,
                               results[1].extbic_path, rtol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_engine_2axis_mesh(sim, oracle_res):
    """Full explicit-collective scan on an (ind=2, snp=4) mesh: the
    ind-aware collectives (psum-merged partial contractions) must select
    the oracle's markers."""
    cfg = EagleConfig(mesh_shape=(2, 4))
    res = engine_jax.forward_select(
        sim.y, _design(sim), _handle(sim), maxit=10, sharded=True,
        config=cfg)
    assert res.indices == oracle_res.indices


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_2d_mesh_tiled_engine_matches_oracle(sim, oracle_res):
    """(ind=2, snp=4) mesh: streamed tiles sharded on BOTH axes through
    GSPMD (SNP rows + individual columns) still reproduce the oracle."""
    cfg = EagleConfig(mesh_shape=(2, 4))
    res = engine_jax.forward_select(
        sim.y, _design(sim), _handle(sim), maxit=10, config=cfg)
    _check_matches_oracle(res, oracle_res)


def test_engine_missing_genotypes(sim):
    simm = simulate_dataset(n=150, p=1200, n_qtl=3, seed=11, missing_rate=0.02)
    X0 = _design(simm)
    res_o = oracle.forward_select(simm.y, X0, simm.geno, maxit=10)
    res_e = engine_jax.forward_select(simm.y, X0, _handle(simm), maxit=10)
    assert res_e.indices == res_o.indices


def test_engine_zmat(sim):
    simz = simulate_dataset(n=100, p=600, n_qtl=2, seed=5, h2_qtl=0.45)
    n = simz.y.shape[0]
    Z = np.kron(np.eye(n), np.ones((2, 1)))
    rng = np.random.default_rng(1)
    y_rec = Z @ simz.y + 0.3 * rng.standard_normal(2 * n)
    X0 = np.ones((2 * n, 1))
    res_o = oracle.forward_select(y_rec, X0, simz.geno, maxit=6, Z=Z)
    res_e = engine_jax.forward_select(y_rec, X0, _handle(simz), maxit=6, Z=Z)
    assert res_e.indices == res_o.indices
    assert np.allclose(res_e.extbic_path, res_o.extbic_path, rtol=1e-3)


def test_bf16_policy_finds_same_markers(sim, oracle_res):
    """bfloat16 sweep policy: argmax selection should survive the reduced
    precision on well-separated signals."""
    cfg = EagleConfig(compute_dtype="bfloat16")
    res = engine_jax.forward_select(
        sim.y, _design(sim), _handle(sim), maxit=10, config=cfg
    )
    assert res.indices == oracle_res.indices


def test_device_only_eigenbasis_matches_host(sim, oracle_res):
    """Forcing the device-f32 eigendecomposition (big-n regime: U never
    materialized on the host) must reproduce the host-f64 selection."""
    cfg = EagleConfig(host_eigh_max_n=8)  # force the device path at any n
    res = engine_jax.forward_select(
        sim.y, _design(sim), _handle(sim), maxit=10, config=cfg)
    assert res.indices == oracle_res.indices


def test_device_only_eigenbasis_with_zmat(sim):
    """Zmat designs in the big-n regime: Zᵀ·U folds into the device
    eigenbasis (U never on the host) and must match the host-f64 path."""
    simz = simulate_dataset(n=100, p=600, n_qtl=2, seed=5, h2_qtl=0.45)
    n = simz.y.shape[0]
    Z = np.kron(np.eye(n), np.ones((2, 1)))
    rng = np.random.default_rng(1)
    y_rec = Z @ simz.y + 0.3 * rng.standard_normal(2 * n)
    X0 = np.ones((2 * n, 1))
    res_h = engine_jax.forward_select(y_rec, X0, _handle(simz), maxit=6, Z=Z)
    cfg = EagleConfig(host_eigh_max_n=8)
    res_d = engine_jax.forward_select(y_rec, X0, _handle(simz), maxit=6,
                                      Z=Z, config=cfg)
    assert res_d.indices == res_h.indices


def test_sync_stream_matches_threaded(monkeypatch):
    """EAGLE_SYNC_STREAM=1 (no producer thread — fallback for PJRT
    transports that deadlock on secondary-thread device ops) must yield
    identical tiles/results to the default double-buffered path."""
    import os

    from eagleeverything_tpu.data.simulate import simulate_dataset
    from eagleeverything_tpu.io.genostore import GenotypeStore
    from eagleeverything_tpu.models import engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    sim = simulate_dataset(n=60, p=700, n_qtl=1, seed=3)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        GenotypeStore.create_from_dense(d, sim.geno, n_shards=2,
                                        packed=True)
        src = engine_jax.StoreTileSource(d)
        K_thr = engine_jax.TiledScan(src, EagleConfig()).compute_K()
        monkeypatch.setenv("EAGLE_SYNC_STREAM", "1")
        K_sync = engine_jax.TiledScan(src, EagleConfig()).compute_K()
    np.testing.assert_array_equal(K_thr, K_sync)
