"""Pallas fused-vara kernel: exactness vs the XLA scorer (interpret mode
on CPU; the compiled path is an experimental alternate on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eagleeverything_tpu.ops import kernels, pallas_score


@pytest.mark.parametrize("p,n,m", [(1024, 256, 256), (512, 128, 512),
                                   (2048, 150, 1024)])
def test_pallas_vara_matches_xla(p, n, m):
    rng = np.random.default_rng(0)
    Wt = jnp.asarray(rng.standard_normal((p, n)).astype(np.float32))
    Lp = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    Py = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    t_ref = kernels.score_tile_sqrt(Wt, Lp, Py, jnp.float32(1.3))
    t_pl = pallas_score.score_sweep_pallas(Wt, Lp, Py, 1.3, interpret=True)
    np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_pad_factor_cols():
    rng = np.random.default_rng(1)
    Lp = rng.standard_normal((64, 100)).astype(np.float32)
    padded = pallas_score.pad_factor_cols(Lp, block=128)
    assert padded.shape == (64, 128)
    np.testing.assert_array_equal(padded[:, :100], Lp)
    assert (padded[:, 100:] == 0).all()
