"""Randomized cross-engine parity: many small random datasets through the
dense f64 oracle and the TPU engine must select identical markers — the
strongest internal stand-in for the (R-unavailable) golden-output
acceptance bar (SURVEY.md §5)."""

import numpy as np
import pytest

from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import engine_jax, oracle


@pytest.mark.parametrize("seed", range(41, 61))
def test_engine_matches_oracle_fuzz(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 140))
    p = int(rng.integers(150, 500))
    n_qtl = int(rng.integers(0, 4))
    h2 = float(rng.uniform(0.15, 0.6))
    miss = float(rng.choice([0.0, 0.0, 0.03]))
    sim = simulate_dataset(n=n, p=p, n_qtl=max(n_qtl, 1), h2_qtl=h2,
                           h2_poly=float(rng.uniform(0.1, 0.4)),
                           seed=seed, missing_rate=miss)
    y = sim.y if n_qtl > 0 else rng.standard_normal(n)  # sometimes pure noise
    X0 = np.column_stack([np.ones(n), sim.covariate])

    res_o = oracle.forward_select(y, X0, sim.geno, maxit=4)
    handle = GenoHandle(n=n, p=p, source=f"<fuzz{seed}>", geno=sim.geno)
    res_e = engine_jax.forward_select(y, X0, handle, maxit=4)

    assert res_e.indices == res_o.indices, (
        f"seed={seed} n={n} p={p}: engine {res_e.indices} "
        f"vs oracle {res_o.indices}")
    np.testing.assert_allclose(res_e.extbic_path, res_o.extbic_path,
                               rtol=2e-3)


@pytest.mark.parametrize("seed", range(70, 80))
def test_engine_matches_oracle_fuzz_zmat(seed):
    """Random unbalanced repeated-measures designs (1-3 records per
    individual, random order) through the Zmat path: engine ≡ oracle."""
    rng = np.random.default_rng(seed)
    n_ind = int(rng.integers(50, 90))
    p = int(rng.integers(150, 350))
    sim = simulate_dataset(n=n_ind, p=p, n_qtl=2,
                           h2_qtl=float(rng.uniform(0.3, 0.6)), seed=seed)
    reps = rng.integers(1, 4, size=n_ind)
    owners = np.repeat(np.arange(n_ind), reps)
    rng.shuffle(owners)
    n_rec = owners.shape[0]
    Z = np.zeros((n_rec, n_ind))
    Z[np.arange(n_rec), owners] = 1.0
    y_rec = Z @ sim.y + 0.3 * rng.standard_normal(n_rec)
    X0 = np.ones((n_rec, 1))

    res_o = oracle.forward_select(y_rec, X0, sim.geno, maxit=3, Z=Z)
    handle = GenoHandle(n=n_ind, p=p, source=f"<fz{seed}>", geno=sim.geno)
    res_e = engine_jax.forward_select(y_rec, X0, handle, maxit=3, Z=Z)
    assert res_e.indices == res_o.indices, (
        f"seed={seed}: engine {res_e.indices} vs oracle {res_o.indices}")
