"""shard_map kernels: psum-merged MMt, sharded score sweep, collective
argmax, winning-column gather.

These are the explicit-collective forms of the scan's communication
pattern (SURVEY.md §3.4 / §6.8): per-iteration the SNP-sharded sweep
communicates exactly once — a collective argmax (pmax + index pmin) — plus
one broadcast of the winning genotype column. MMt communicates once per
run (psum over the SNP contraction axis). XLA lowers the collectives to
ICI intra-slice / DCN inter-slice; there is no hand-rolled transport.

Two implementation notes:

- Every shard_map program is built ONCE PER MESH (lru-cached factory +
  ``jax.jit``), so the per-iteration calls hit JAX's dispatch cache
  instead of re-tracing a fresh closure each time.
- All in_specs split the individuals/eigen axis over the ``ind`` mesh
  axis too (a no-op on 1×N meshes). On (ind>1, snp) meshes each device
  holds only its column slice; the contractions are computed as partials
  and merged with one psum over ``ind`` — without this, shard_map would
  silently all-gather the genotype columns on every call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from eagleeverything_tpu.ops import kernels
from eagleeverything_tpu.parallel.mesh import IND_AXIS, SNP_AXIS

_INT_MAX = jnp.iinfo(jnp.int32).max


def _argmax_over_snp(t: jax.Array):
    """Deterministic collective argmax of the shard-local statistics t:
    lowest global SNP index wins ties (within a shard via argmax's
    first-match contract; across shards via pmin over candidate indices
    at the pmax value). Returns (t replicated, global index, global max);
    a global max of 0 means "nothing scoreable" (callers treat it as
    exhaustion — index 0 is NOT a valid selection then). Reference:
    ``find_qtl`` (SURVEY.md §3.3)."""
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


@functools.lru_cache(maxsize=8)
def _mmt_fn(mesh: Mesh):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, IND_AXIS),), out_specs=P(None, None),
        check_vma=False,
    )
    def _mmt(wt_local):
        # columns may be ind-sharded: gather them once (explicitly) for
        # the n×n contraction — MMt needs cross-blocks between column
        # shards, so this gather is inherent to the op, not incidental
        wt_full = jax.lax.all_gather(wt_local, IND_AXIS, axis=1, tiled=True)
        k_local = jax.lax.dot_general(
            wt_full, wt_full,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(k_local, SNP_AXIS)

    return _mmt


def mmt_psum(Wt: jax.Array, mesh: Mesh) -> jax.Array:
    """K = Wtᵀ·Wt with Wt (p, n) SNP-sharded; per-shard GEMM tiles merged
    with psum over the ``snp`` axis (reference hot loop: ``calculateMMt``;
    the all-reduce-over-contraction-axis pattern, SURVEY.md §3.4)."""
    return _mmt_fn(mesh)(Wt)


@functools.lru_cache(maxsize=8)
def _score_argmax_fn(mesh: Mesh):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, IND_AXIS), P(IND_AXIS, None), P(IND_AXIS),
                  P(), P(SNP_AXIS)),
        out_specs=(P(None,), P(), P()),
        # t is replicated by the explicit all_gather; the checker can't
        # infer that statically on a 2-axis mesh
        check_vma=False,
    )
    def _sweep(wt, lp, py, s2g, mask):
        # partial contractions over the local column slice, merged with
        # ONE psum over the ind axis (no-op when ind = 1)
        ahat_p = jnp.dot(wt, py, preferred_element_type=jnp.float32)
        b_p = jnp.dot(wt, lp, preferred_element_type=jnp.float32)
        ahat, b = jax.lax.psum((ahat_p, b_p), IND_AXIS)
        vara = s2g * jnp.sum(b * b, axis=1)
        t = kernels.t_from_ahat_vara(ahat, vara) * mask
        return _argmax_over_snp(t)

    return _sweep


def score_and_argmax(
    Wt: jax.Array, Lp: jax.Array, Py: jax.Array, sigma2_g: jax.Array,
    tmask: jax.Array, mesh: Mesh,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sharded score sweep + collective argmax in one jitted step.

    Args:
      Wt: (p_pad, n) SNP-major genotype tiles, sharded over ``snp`` (and
        columns over ``ind`` on 2-axis meshes).
      Lp: (n, m) projector factor (P̃ = Lp·Lpᵀ, H-scale).
      Py: (n,) P̃·y.
      sigma2_g: scalar σ²_g.
      tmask: (p_pad,) float {0,1} — 0 for already-selected / padded SNPs,
        sharded like Wt's rows.

    Returns (t (p_pad,), global argmax index, global max). A returned max
    of 0 signals exhaustion (see :func:`_argmax_over_snp`). The scoring
    epilogue is kernels.t_from_ahat_vara — the same guard as the tiled
    sweep. Reference: ``calculate_a_and_vara_rcpp`` (SURVEY.md §3.3).
    """
    return _score_argmax_fn(mesh)(
        Wt, Lp, Py, jnp.asarray(sigma2_g, jnp.float32), tmask)


@functools.lru_cache(maxsize=8)
def _score_argmax_from_T_fn(mesh: Mesh):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, IND_AXIS), P(IND_AXIS), P(IND_AXIS, None),
                  P(IND_AXIS), P(), P(SNP_AXIS)),
        out_specs=(P(None,), P(), P()),
        check_vma=False,
    )
    def _sweep(t_local, s_r, q_r, z3_r, s2g, mask):
        ahat_p = jnp.dot(t_local, z3_r, preferred_element_type=jnp.float32)
        Ts = t_local * s_r[None, :]
        ts2_p = jnp.sum(Ts * Ts, axis=1)
        TQ_p = jnp.dot(Ts, q_r, preferred_element_type=jnp.float32)
        ahat, ts2, TQ = jax.lax.psum((ahat_p, ts2_p, TQ_p), IND_AXIS)
        t = kernels.score_from_T_parts(ahat, ts2, TQ, s2g) * mask
        return _argmax_over_snp(t)

    return _sweep


def score_and_argmax_from_T(
    T: jax.Array, s: jax.Array, Q: jax.Array, z3: jax.Array,
    sigma2_g: jax.Array, tmask: jax.Array, mesh: Mesh,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Collective sweep over the cached eigenbasis tiles T = Wt·U
    (see ops/kernels.score_from_T): all heavy FLOPs were paid once when T
    was built; per iteration each shard does only skinny rank-q work plus
    one psum over ``ind``, the argmax pmax/pmin pair, and the t
    all_gather. The scoring epilogue is kernels.score_from_T_parts — the
    identical f32-cancellation guard as the tiled path."""
    return _score_argmax_from_T_fn(mesh)(
        T, s, Q, z3, jnp.asarray(sigma2_g, jnp.float32), tmask)


@functools.lru_cache(maxsize=8)
def _gather_fn(mesh: Mesh, p_loc: int):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(SNP_AXIS, IND_AXIS), P()), out_specs=P(None,),
        check_vma=False,
    )
    def _gather(wt, jj):
        shard_id = jax.lax.axis_index(SNP_AXIS)
        owner = jj // p_loc
        local_j = jj - owner * p_loc
        row = jnp.where(shard_id == owner, wt[local_j], jnp.zeros_like(wt[0]))
        row = jax.lax.psum(row, SNP_AXIS)
        return jax.lax.all_gather(row, IND_AXIS, axis=0, tiled=True)

    return _gather


def gather_column(Wt: jax.Array, j: int, mesh: Mesh) -> jax.Array:
    """Broadcast the winning SNP's genotype row to all shards (reference:
    ``extract_geno_rcpp`` — trivial gather on the SNP-sharded array,
    SURVEY.md §3.3)."""
    p_loc = Wt.shape[0] // mesh.shape[SNP_AXIS]
    return _gather_fn(mesh, p_loc)(Wt, jnp.asarray(j, jnp.int32))
