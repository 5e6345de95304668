"""Jitted XLA kernels over SNP-major genotype tiles.

These are the TPU-native equivalents of the reference's native hot loops
(SURVEY.md §3.3):

- :func:`recode_impute_tile` ← the on-the-fly recode/scale inside
  ``calculateMMt_rcpp`` (genotype int8 → mean-imputed, het-centered float)
- :func:`mmt_accumulate`     ← ``calculateMMt_rcpp`` (blocked M·Mᵀ)
- :func:`score_tile`         ← ``calculate_a_and_vara_rcpp`` (per-SNP
  BLUP â_j and var(â_j) → outlier statistic t_j)

All kernels take SNP-major tiles ``Wt`` of shape (b, n) — one row per SNP —
matching the store layout, so host→device transfers are contiguous and the
GEMMs are large, static-shaped, and MXU-tileable. Accumulation is always
float32 (``preferred_element_type``); the optional bfloat16 policy casts
GEMM inputs only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MISSING = -9


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def recode_impute_tile(g_tile: jax.Array, compute_dtype: str = "float32") -> jax.Array:
    """int8 (b, n) {0,1,2,-9} → W tile: mean-imputed per SNP, minus 1.

    Per-SNP statistics are row-local to the tile, so imputation needs no
    global pass. All-missing SNPs impute to the heterozygote (W = 0).
    """
    g = g_tile.astype(jnp.float32)
    miss = g_tile == MISSING
    cnt = jnp.sum(~miss, axis=1)
    s = jnp.sum(jnp.where(miss, 0.0, g), axis=1)
    mean = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 1.0)
    W = jnp.where(miss, mean[:, None], g) - 1.0
    return W.astype(jnp.dtype(compute_dtype))


@functools.partial(jax.jit, static_argnames=("n", "compute_dtype"))
def unpack_recode_tile(
    packed: jax.Array, n: int, compute_dtype: str = "float32"
) -> jax.Array:
    """2-bit packed tile → recoded W tile (b, n).

    Accepts BOTH packed layouts (same byte stream, two typings):
    - uint8 (b, ⌈n/4⌉): byte b holds genotypes 4b+k at bits 2k — the
      streamed host→device tile format;
    - int32 (b, ⌈⌈n/4⌉/4⌉): little-endian word view, word w holds
      genotypes 16w+k at bits 2k — the HBM-resident stack format
      (int32's native (8,128) tiling avoids the layout copy XLA staged
      for a big uint8 buffer entering pallas_call; see ops/pallas_packed).

    Unpacks the store's packed encoding (codes 0/1/2 = dose, 3 = missing)
    ON DEVICE and fuses the mean-impute/center recode — host→device
    traffic drops 4× vs shipping int8 (and 16× vs f32).
    """
    b = packed.shape[0]
    if packed.dtype == jnp.int32:
        # bitcast back to the byte stream and use the SAME 4-shift
        # unpack as the streamed path: a 16-way int32 shift/stack made
        # XLA's layout assignment prefer a transposed stack layout and
        # insert an 11.9 GB whole-stack copy inside the Krylov chunk
        # programs at 50k×1M (r4 OOM #2); the bitcast form keeps the
        # r3-proven uint8 program shape over the int32-resident buffer
        packed = jax.lax.bitcast_convert_type(
            packed, jnp.uint8).reshape(b, -1)
    codes = jnp.stack(
        [(packed >> s) & jnp.uint8(3) for s in (0, 2, 4, 6)], axis=2
    ).reshape(b, -1)[:, :n]
    miss = codes == 3
    g = codes.astype(jnp.float32)
    cnt = jnp.sum(~miss, axis=1)
    s = jnp.sum(jnp.where(miss, 0.0, g), axis=1)
    mean = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 1.0)
    W = jnp.where(miss, mean[:, None], g) - 1.0
    return W.astype(jnp.dtype(compute_dtype))


@jax.jit
def mmt_accumulate(K: jax.Array, Wt: jax.Array) -> jax.Array:
    """K (n,n) f32 += Wtᵀ·Wt for a SNP-major tile Wt (b, n).

    The contraction runs over the tile's SNPs; summing over tiles gives the
    full MMt (reference: the ReadBlock → GEMM → accumulate loop of
    ``calculateMMt_rcpp``, SURVEY.md §4.2)."""
    return K + jax.lax.dot_general(
        Wt, Wt,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def score_tile(
    Wt: jax.Array, Pm: jax.Array, Py: jax.Array, sigma2_g: jax.Array
) -> jax.Array:
    """Outlier statistics t_j for one SNP-major tile Wt (b, n).

      â_j      = (Wt · P̃y)_j
      var(â_j) = σ²_g · (Wt · P̃ · Wtᵀ)_jj  — computed as rowsum(Wt ∘ WtP̃)
      t_j      = â_j² / var(â_j)   (0 where var ≤ ε: monomorphic/padded SNPs)

    One (b,n)×(n,n) GEMM + one matvec per tile; this is the dominant
    per-iteration cost and the SNPs/s/chip north-star loop (BASELINE.md).
    """
    ahat = jnp.dot(Wt, Py, preferred_element_type=jnp.float32)
    WtP = jnp.dot(Wt, Pm, preferred_element_type=jnp.float32)
    vara = sigma2_g * jnp.sum(Wt.astype(jnp.float32) * WtP, axis=1)
    return t_from_ahat_vara(ahat, vara)


@jax.jit
def score_tile_sqrt(
    Wt: jax.Array, Lp: jax.Array, Py: jax.Array, sigma2_g: jax.Array
) -> jax.Array:
    """Score sweep via the projector's symmetric square root (P̃ = L·Lᵀ):

      var(â_j)/σ²_g = w_jᵀ·P̃·w_j = ‖Lᵀ·w_j‖²  →  vara = rowsum((Wt·L)²)

    Same FLOPs as :func:`score_tile` but the elementwise Wt∘(WtP̃) pass
    (an extra full read of Wt plus a (b,n) f32 intermediate) becomes a
    square-accumulate epilogue XLA fuses into the GEMM — measurably higher
    MXU utilization on the HBM-bound side. L comes from the host-f64
    eigendecomposition of P̃ (clipped at zero: P̃ is PSD of rank n−q).
    """
    ahat = jnp.dot(Wt, Py, preferred_element_type=jnp.float32)
    B = jnp.dot(Wt, Lp, preferred_element_type=jnp.float32)
    vara = sigma2_g * jnp.sum(B * B, axis=1)
    return t_from_ahat_vara(ahat, vara)


@jax.jit
def score_tile_sqrt_bf16(
    Wt: jax.Array, Lp: jax.Array, Py: jax.Array, sigma2_g: jax.Array
) -> jax.Array:
    """bfloat16-input variant of :func:`score_tile_sqrt` (f32 accumulation)."""
    Wb = Wt.astype(jnp.bfloat16)
    ahat = jnp.dot(Wb, Py.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    B = jnp.dot(Wb, Lp.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    vara = sigma2_g * jnp.sum(B * B, axis=1)
    return t_from_ahat_vara(ahat, vara)



@jax.jit
def eig_T_tile(Wt: jax.Array, U: jax.Array) -> jax.Array:
    """T = Wt·U — the genotype tile expressed in K's eigenbasis.

    T is ITERATION-INVARIANT (U is fixed for the whole scan), so it is
    computed once per tile and cached; every subsequent sweep needs only
    the O(b·n·q) work of :func:`score_from_T`. This one GEMM carries all
    the scan's heavy FLOPs."""
    return jnp.dot(Wt, U, preferred_element_type=jnp.float32)


def t_from_ahat_vara(ahat: jax.Array, vara: jax.Array) -> jax.Array:
    """t = â²/var(â) with the zero-variance guard — THE scoring epilogue,
    shared by every sweep form (tiled, sharded, batched) so the guard has
    a single source of truth."""
    return jnp.where(vara > 1e-12, (ahat * ahat) / vara, 0.0)


def score_from_T_parts(
    ahat: jax.Array, ts2: jax.Array, TQ: jax.Array, sigma2_g: jax.Array,
) -> jax.Array:
    """Eigenbasis scoring epilogue from the three contraction results
    (â = T·z3, ts2 = ‖Ts‖²_row, TQ = Ts·Q) — factored out so the sharded
    collective sweep (which psums the contractions over the ``ind`` axis
    first) applies the IDENTICAL cancellation guard as the tiled path."""
    vara_raw = ts2 - jnp.sum(TQ * TQ, axis=1)
    vara = sigma2_g * vara_raw
    valid = vara_raw > 1e-6 * jnp.maximum(ts2, 1e-12)
    return jnp.where(valid, t_from_ahat_vara(ahat, vara), 0.0)


@jax.jit
def score_from_T(
    T: jax.Array, s: jax.Array, Q: jax.Array, z3: jax.Array,
    sigma2_g: jax.Array,
) -> jax.Array:
    """Outlier statistics from the cached eigenbasis tile T (b, n).

    With Ts = T∘s and ORTHONORMAL Q (zero-padded columns are inert):

      â      = T·z3                      (P̃y = U·z3 ⇒ Wt·P̃y = T·z3)
      vara   = σ²_g·(‖Ts‖²_row − ‖Ts·Q‖²_row)   (Pythagoras on I−QQᵀ)

    Per-iteration cost is one skinny (b,n)×(n,q) GEMM + elementwise —
    ~n/q times cheaper than re-running the dense sweep GEMM. The relative
    guard on vara protects the difference-of-squares against f32
    cancellation when a SNP is almost fully captured by the model (its â
    is then ≈0 as well, so t must be 0)."""
    ahat = jnp.dot(T, z3, preferred_element_type=jnp.float32)
    Ts = T * s[None, :]
    ts2 = jnp.sum(Ts * Ts, axis=1)
    TQ = jnp.dot(Ts, Q, preferred_element_type=jnp.float32)
    return score_from_T_parts(ahat, ts2, TQ, sigma2_g)


@jax.jit
def score_from_T_batched(
    T: jax.Array, s: jax.Array, Q: jax.Array, z3: jax.Array,
    sigma2_g: jax.Array,
) -> jax.Array:
    """Batched :func:`score_from_T`: s (R,n), Q (R,n,q), z3 (R,n) → (R,b)."""
    return jax.vmap(score_from_T, in_axes=(None, 0, 0, 0, 0))(
        T, s, Q, z3, sigma2_g)



@jax.jit
def kernel_matvec_tile(Wt: jax.Array, V: jax.Array) -> jax.Array:
    """Per-tile contribution to K·V without materializing K:
    Wtᵀ·(Wt·V) for a SNP-major tile Wt (b, n) and block V (n, r).
    Summed over tiles this is (WᵀW)·V = MMt·V — the matrix-free kernel
    matvec for biobank-scale n (docs/design_biobank_scale.md)."""
    BV = jnp.dot(Wt, V, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        Wt, BV, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def sweep_dots_tile(Wt: jax.Array, A: jax.Array) -> jax.Array:
    """Wt·A for one tile: per-SNP dot products against a block of vectors
    A (n, r) → (b, r). Streams the cross-products WᵀA the matrix-free
    score sweep needs (â, XᵀH⁻¹-projections, Hutchinson probes)."""
    return jnp.dot(Wt, A, preferred_element_type=jnp.float32)


def projector_sqrt(Pm: "np.ndarray") -> "np.ndarray":
    """Host-f64 symmetric square root L of the PSD projector P̃ (P̃=LLᵀ)."""
    import numpy as np
    w, U = np.linalg.eigh(0.5 * (Pm + Pm.T))
    return U * np.sqrt(np.clip(w, 0.0, None))[None, :]


@jax.jit
def score_tile_batched(
    Wt: jax.Array, Lp: jax.Array, Py: jax.Array, sigma2_g: jax.Array
) -> jax.Array:
    """Permutation-batched score sweep: (R,n,m) projector factors /
    (R,n) P̃y / (R,) σ²_g against one genotype tile → (R, b) statistics.

    The FPR4AM calibration path (SURVEY.md §4.3): permutations ride a
    leading batch axis through one fused device pass over each genotype
    tile instead of R separate streams."""
    return jax.vmap(score_tile_sqrt, in_axes=(None, 0, 0, 0))(Wt, Lp, Py, sigma2_g)


@jax.jit
def score_tile_bf16(
    Wt: jax.Array, Pm: jax.Array, Py: jax.Array, sigma2_g: jax.Array
) -> jax.Array:
    """bfloat16-input variant of :func:`score_tile` (f32 accumulation).

    Genotype values {−1,0,1} are exact in bf16; imputed means round to
    ~2 decimal digits, which perturbs t_j at ~1e-2 relative — acceptable
    for the scan argmax on well-separated signals, and ~2× MXU throughput.
    """
    Wb = Wt.astype(jnp.bfloat16)
    ahat = jnp.dot(Wb, Py.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    WtP = jnp.dot(Wb, Pm.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    vara = sigma2_g * jnp.sum(Wt.astype(jnp.float32) * WtP, axis=1)
    return t_from_ahat_vara(ahat, vara)
