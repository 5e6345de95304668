"""Ops-layer tests: checkpoint/resume, MMt cache, structured logging,
collective argmax tie-breaking (SURVEY.md §6.3-6.5, §8 Phase 3)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import engine_jax
from eagleeverything_tpu.parallel import collectives, mesh as meshlib
from eagleeverything_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def sim():
    return simulate_dataset(n=120, p=800, n_qtl=3, seed=21, h2_qtl=0.45)


def _handle(sim):
    return GenoHandle(n=sim.geno.shape[0], p=sim.geno.shape[1],
                      source="<ops-test>", geno=sim.geno)


def _X0(sim):
    return np.ones((sim.y.shape[0], 1))


def test_checkpoint_resume_matches_fresh(sim, tmp_path):
    """Kill-after-k-iterations resume must produce the identical result."""
    d = str(tmp_path / "ck")
    fresh = engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=6)
    assert len(fresh.indices) >= 2

    # partial run: stop after 1 selection (maxit=1), checkpointing
    engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=1,
                              fixit=True, ckpt_dir=d)
    state = ckpt.load_scan_state(d)
    assert state is not None and len(state["selected"]) == 1
    assert state["selected"][0] == fresh.indices[0]

    # resume to completion
    resumed = engine_jax.forward_select(sim.y, _X0(sim), _handle(sim),
                                        maxit=6, ckpt_dir=d, resume=True)
    assert resumed.indices == fresh.indices
    np.testing.assert_allclose(resumed.extbic_path, fresh.extbic_path,
                               rtol=1e-10)


def test_mmt_cache_reused(sim, tmp_path):
    d = str(tmp_path / "ck2")
    handle = _handle(sim)
    key = ckpt.mmt_cache_key("<ops-test>", sim.geno.shape[0],
                             sim.geno.shape[1], None,
                             content_token=ckpt.genotype_content_token(handle))
    assert ckpt.load_mmt(d, key) is None
    engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=1,
                              fixit=True, ckpt_dir=d)
    K = ckpt.load_mmt(d, key)
    assert K is not None and K.shape == (sim.geno.shape[0],) * 2
    # poison the cache; if it is really used, selection changes
    rng = np.random.default_rng(0)
    A = rng.standard_normal(K.shape)
    ckpt.save_mmt(d, key, (A @ A.T).astype(np.float64))
    res2 = engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=1,
                                     fixit=True, ckpt_dir=d)
    res1 = engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=1,
                                     fixit=True)
    # poisoned-K run differs from clean run in delta (cache demonstrably used)
    assert res2.delta != pytest.approx(res1.delta, rel=1e-6)


def test_mmt_cache_not_served_for_different_data(sim, tmp_path):
    """Content keying: same source label + shape but different genotypes
    must NOT reuse the cached kernel."""
    d = str(tmp_path / "ck3")
    engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=1,
                              fixit=True, ckpt_dir=d)
    rng = np.random.default_rng(123)
    other = rng.integers(0, 3, size=sim.geno.shape).astype(np.int8)
    other_handle = GenoHandle(n=other.shape[0], p=other.shape[1],
                              source="<ops-test>", geno=other)
    res_ck = engine_jax.forward_select(sim.y, _X0(sim), other_handle,
                                       maxit=1, fixit=True, ckpt_dir=d)
    res_fresh = engine_jax.forward_select(sim.y, _X0(sim), other_handle,
                                          maxit=1, fixit=True)
    assert res_ck.delta == pytest.approx(res_fresh.delta, rel=1e-9)


def test_resume_refuses_mismatched_checkpoint(sim, tmp_path):
    d = str(tmp_path / "ck4")
    engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=1,
                              fixit=True, ckpt_dir=d)
    with pytest.raises(ValueError, match="refusing to resume"):
        engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=3,
                                  lam_ebic=2.5, ckpt_dir=d, resume=True)


def test_structured_log(sim, tmp_path):
    path = str(tmp_path / "scan.jsonl")
    engine_jax.forward_select(sim.y, _X0(sim), _handle(sim), maxit=2,
                              fixit=True, log_jsonl=path)
    records = [json.loads(ln) for ln in open(path)]
    kinds = [r["event"] for r in records]
    assert "phase" in kinds and "iteration" in kinds
    sweeps = [r for r in records if r.get("phase") == "sweep"]
    assert sweeps and all("items_per_s" in r for r in sweeps)  # SNPs/s metric
    its = [r for r in records if r["event"] == "iteration"]
    assert all(r["accepted"] for r in its) and len(its) == 2


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_collective_argmax_tie_break():
    """Equal maxima on different shards → lowest global index wins
    (SURVEY.md §8 Phase 3 hard part: deterministic tie-breaking)."""
    mesh = meshlib.make_mesh((1, 4), jax.devices()[:4])
    n, p = 8, 4 * 8
    # craft Wt so two SNPs (on shards 1 and 3) have identical scores:
    # duplicate the same row pattern
    rng = np.random.default_rng(3)
    Wt = rng.standard_normal((p, n)).astype(np.float32)
    Wt[9] = Wt[25]  # identical rows → identical t_j
    Pm = np.eye(n, dtype=np.float32)
    Py = (Wt[9] * 10).astype(np.float32)  # make row 9/25 the clear argmax
    tmask = np.ones(p, dtype=np.float32)
    Wt_dev = jax.device_put(Wt, meshlib.snp_sharding(mesh))
    mask_dev = jax.device_put(
        tmask, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(meshlib.SNP_AXIS)))
    t, i_glob, m_glob = collectives.score_and_argmax(
        Wt_dev, jnp.asarray(Pm), jnp.asarray(Py), 1.0, mask_dev, mesh)
    t = np.asarray(t)
    assert t[9] == t[25] == np.max(t)
    assert int(i_glob) == 9  # lowest global index, not shard-local winner


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_gather_column_matches_local():
    mesh = meshlib.make_mesh((1, 4), jax.devices()[:4])
    rng = np.random.default_rng(5)
    Wt = rng.standard_normal((32, 16)).astype(np.float32)
    Wt_dev = jax.device_put(Wt, meshlib.snp_sharding(mesh))
    for j in (0, 7, 8, 31):
        col = np.asarray(collectives.gather_column(Wt_dev, j, mesh))
        np.testing.assert_allclose(col, Wt[j], rtol=1e-6)


def test_collectives_2axis_mesh_match_single():
    """(ind=2, snp=4) mesh: the ind-aware collectives (partial
    contractions + psum over 'ind') must reproduce the plain
    single-device computations exactly."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from eagleeverything_tpu.ops import kernels

    rng = np.random.default_rng(4)
    p_pad, n = 512, 64
    mesh = meshlib.make_mesh((2, 4))
    Wt = rng.standard_normal((p_pad, n)).astype(np.float32)
    Wt_dev = jax.device_put(Wt, meshlib.snp_sharding(mesh))
    assert meshlib.snp_sharding(mesh).spec == ("snp", "ind")

    # MMt
    K = np.asarray(collectives.mmt_psum(Wt_dev, mesh))
    np.testing.assert_allclose(K, Wt.T @ Wt, rtol=2e-5, atol=1e-3)

    # sqrt-form sweep + argmax
    Lp = rng.standard_normal((n, 16)).astype(np.float32)
    Py = rng.standard_normal(n).astype(np.float32)
    mask = np.ones(p_pad, dtype=np.float32)
    mask[7] = 0.0
    t, i_glob, m_glob = collectives.score_and_argmax(
        Wt_dev, jnp.asarray(Lp), jnp.asarray(Py), 1.0,
        jnp.asarray(mask), mesh)
    t_ref = np.asarray(kernels.score_tile_sqrt(
        jnp.asarray(Wt), jnp.asarray(Lp), jnp.asarray(Py),
        jnp.float32(1.0))) * mask
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=2e-4, atol=1e-5)
    assert int(i_glob) == int(np.argmax(t_ref))

    # eigenbasis sweep + argmax
    q = 8
    s = rng.standard_normal(n).astype(np.float32)
    Q, _ = np.linalg.qr(rng.standard_normal((n, q)))
    z3 = rng.standard_normal(n).astype(np.float32)
    T_dev = jax.device_put(Wt, meshlib.snp_sharding(mesh))
    t2, i2, _ = collectives.score_and_argmax_from_T(
        T_dev, jnp.asarray(s), jnp.asarray(Q, jnp.float32),
        jnp.asarray(z3), 1.0, jnp.asarray(mask), mesh)
    t2_ref = np.asarray(kernels.score_from_T(
        jnp.asarray(Wt), jnp.asarray(s), jnp.asarray(Q, jnp.float32),
        jnp.asarray(z3), jnp.float32(1.0))) * mask
    np.testing.assert_allclose(np.asarray(t2), t2_ref, rtol=2e-4, atol=1e-5)
    assert int(i2) == int(np.argmax(t2_ref))

    # winning-column gather
    col = np.asarray(collectives.gather_column(Wt_dev, 37, mesh))
    np.testing.assert_allclose(col, Wt[37], rtol=1e-6)
