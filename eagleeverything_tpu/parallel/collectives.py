"""shard_map kernels: psum-merged MMt, sharded score sweep, collective
argmax, winning-column gather.

These are the explicit-collective forms of the scan's communication
pattern (SURVEY.md §3.4 / §6.8): per-iteration the SNP-sharded sweep
communicates exactly once — a collective argmax (pmax + index pmin) — plus
one broadcast of the winning genotype column. MMt communicates once per
run (psum over the SNP contraction axis). XLA lowers the collectives to
ICI intra-slice / DCN inter-slice; there is no hand-rolled transport.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from eagleeverything_tpu.parallel.mesh import SNP_AXIS

_INT_MAX = jnp.iinfo(jnp.int32).max


def mmt_psum(Wt: jax.Array, mesh: Mesh) -> jax.Array:
    """K = Wtᵀ·Wt with Wt (p, n) SNP-sharded; per-shard GEMM tiles merged
    with psum over the ``snp`` axis (reference hot loop: ``calculateMMt``;
    the all-reduce-over-contraction-axis pattern, SURVEY.md §3.4)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, None),), out_specs=P(None, None),
    )
    def _mmt(wt_local):
        k_local = jax.lax.dot_general(
            wt_local, wt_local,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(k_local, SNP_AXIS)

    return _mmt(Wt)


def score_and_argmax(
    Wt: jax.Array, Lp: jax.Array, Py: jax.Array, sigma2_g: jax.Array,
    tmask: jax.Array, mesh: Mesh,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sharded score sweep + collective argmax in one jitted step.

    Args:
      Wt: (p_pad, n) SNP-major genotype tiles, sharded over ``snp``.
      Lp: (n, m) replicated projector factor (P̃ = Lp·Lpᵀ, H-scale).
      Py: (n,) replicated P̃·y.
      sigma2_g: scalar σ²_g.
      tmask: (p_pad,) float {0,1} — 0 for already-selected / padded SNPs,
        sharded like Wt's rows.

    Returns (t (p_pad,), global argmax index, global max) with the
    reference's deterministic tie-break: lowest global SNP index wins
    (within a shard via argmax's first-match contract; across shards via
    pmin over candidate indices at the pmax value). Reference:
    ``find_qtl`` + ``calculate_a_and_vara_rcpp`` (SURVEY.md §3.3).
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, None), P(None, None), P(None,), P(), P(SNP_AXIS)),
        out_specs=(P(None,), P(), P()),
        # t is replicated by the explicit all_gather below; the checker
        # can't infer that statically on a 2-axis mesh
        check_vma=False,
    )
    def _sweep(wt, lp, py, s2g, mask):
        ahat = jnp.dot(wt, py, preferred_element_type=jnp.float32)
        b = jnp.dot(wt, lp, preferred_element_type=jnp.float32)
        vara = s2g * jnp.sum(b * b, axis=1)
        t = jnp.where(vara > 1e-12, (ahat * ahat) / vara, 0.0) * mask
        # local argmax (first-match = lowest local index)
        i_loc = jnp.argmax(t)
        m_loc = t[i_loc]
        p_loc = t.shape[0]
        shard_id = jax.lax.axis_index(SNP_AXIS)
        g_idx = shard_id * p_loc + i_loc
        m_glob = jax.lax.pmax(m_loc, SNP_AXIS)
        cand = jnp.where(m_loc >= m_glob, g_idx.astype(jnp.int32), _INT_MAX)
        i_glob = jax.lax.pmin(cand, SNP_AXIS)
        # replicate t so multi-process hosts can record the full statistic
        # vector (p floats — negligible next to the sweep GEMM)
        t_rep = jax.lax.all_gather(t, SNP_AXIS, axis=0, tiled=True)
        return t_rep, i_glob, m_glob

    return _sweep(Wt, Lp, Py, jnp.asarray(sigma2_g, jnp.float32), tmask)



def score_and_argmax_from_T(
    T: jax.Array, s: jax.Array, Q: jax.Array, z3: jax.Array,
    sigma2_g: jax.Array, tmask: jax.Array, mesh: Mesh,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Collective sweep over the cached eigenbasis tiles T = Wt·U
    (see ops/kernels.score_from_T): all heavy FLOPs were paid once when T
    was built; per iteration each shard does only skinny rank-q work plus
    the argmax pmax/pmin pair and the t all_gather."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, None), P(None,), P(None, None), P(None,),
                  P(), P(SNP_AXIS)),
        out_specs=(P(None,), P(), P()),
        check_vma=False,
    )
    def _sweep(t_local, s_r, q_r, z3_r, s2g, mask):
        ahat = jnp.dot(t_local, z3_r, preferred_element_type=jnp.float32)
        Ts = t_local * s_r[None, :]
        ts2 = jnp.sum(Ts * Ts, axis=1)
        TQ = jnp.dot(Ts, q_r, preferred_element_type=jnp.float32)
        vara_raw = ts2 - jnp.sum(TQ * TQ, axis=1)
        vara = s2g * vara_raw
        valid = vara_raw > 1e-6 * jnp.maximum(ts2, 1e-12)
        t = jnp.where(valid & (vara > 1e-12),
                      (ahat * ahat) / vara, 0.0) * mask
        i_loc = jnp.argmax(t)
        m_loc = t[i_loc]
        p_loc = t.shape[0]
        shard_id = jax.lax.axis_index(SNP_AXIS)
        g_idx = shard_id * p_loc + i_loc
        m_glob = jax.lax.pmax(m_loc, SNP_AXIS)
        cand = jnp.where(m_loc >= m_glob, g_idx.astype(jnp.int32), _INT_MAX)
        i_glob = jax.lax.pmin(cand, SNP_AXIS)
        t_rep = jax.lax.all_gather(t, SNP_AXIS, axis=0, tiled=True)
        return t_rep, i_glob, m_glob

    return _sweep(T, s, Q, z3, jnp.asarray(sigma2_g, jnp.float32), tmask)


def gather_column(Wt: jax.Array, j: int, mesh: Mesh) -> jax.Array:
    """Broadcast the winning SNP's genotype row to all shards (reference:
    ``extract_geno_rcpp`` — trivial gather on the SNP-sharded array,
    SURVEY.md §3.3)."""
    p_pad = Wt.shape[0]
    n_shards = mesh.shape[SNP_AXIS]
    p_loc = p_pad // n_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, None), P()), out_specs=P(None,),
    )
    def _gather(wt, jj):
        shard_id = jax.lax.axis_index(SNP_AXIS)
        owner = jj // p_loc
        local_j = jj - owner * p_loc
        row = jnp.where(shard_id == owner, wt[local_j], jnp.zeros_like(wt[0]))
        return jax.lax.psum(row, SNP_AXIS)

    return _gather(Wt, jnp.asarray(j, jnp.int32))
