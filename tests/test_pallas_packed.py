"""Fused unpack×GEMM Pallas kernels vs the XLA unpack reference.

Interpret mode on CPU pins the math (plane permutation, mean-impute,
padding masks); the real-hardware path is exercised by the engine's
packed-stack equivalence run on TPU (BENCHMARKS.md config-3 section).

The stack is int32 word-packed (16 genotypes/word, little-endian view of
the 2-bit byte stream) — see ops/pallas_packed's module docstring for
why the r3 uint8 typing was retired."""

import numpy as np
import pytest
import jax.numpy as jnp

from eagleeverything_tpu.ops import pallas_packed as pp
from eagleeverything_tpu.ops import kernels

N, P = 1000, 400          # logical shape
P_PAD = pp.BLK_P          # BLK_P multiple (env-tunable, default 2048)
NW = 128                  # NW_BLK multiple (holds ⌈⌈N/4⌉/4⌉ = 63 real words)


@pytest.fixture(scope="module")
def packed():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 3, size=(P, N)).astype(np.uint8)
    miss = rng.random((P, N)) < 0.03
    codes[miss] = 3
    # reference recode (matches kernels.unpack_recode_tile)
    g = codes.astype(np.float64)
    cnt = np.sum(codes != 3, axis=1)
    s = np.where(codes == 3, 0, g).sum(axis=1)
    mean = np.where(cnt > 0, s / np.maximum(cnt, 1), 1.0)
    W = np.where(codes == 3, mean[:, None], g) - 1.0
    # pack: byte b bits 2k hold genotype 4b+k; pad cols to 4·4·NW with
    # 0x55 (het → W=0) and rows to P_PAD, then view the little-endian
    # byte stream as int32 words (genotype 16w+k at word-bit 2k) — the
    # stack builder's exact construction (engine_jax._packed_stack)
    full = np.full((P_PAD, 16 * NW), 1, dtype=np.uint8)
    full[:P, :N] = codes
    Wb = (full[:, 0::4] | (full[:, 1::4] << 2)
          | (full[:, 2::4] << 4) | (full[:, 3::4] << 6)).astype(np.uint8)
    Wp = np.ascontiguousarray(Wb).view(np.int32)
    assert Wp.shape == (P_PAD, NW)
    means = np.ones((P_PAD, 1), np.float32)
    means[:P, 0] = mean
    return Wp, means, W


def test_plane_perm_roundtrip():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((N, 5)).astype(np.float32)
    T = pp.to_plane(jnp.asarray(V), N, NW)
    assert T.shape == (pp.PLANES * NW, 5)
    back = np.asarray(pp.from_plane(T, N, NW))
    np.testing.assert_array_equal(back, V)
    # padding positions are zeroed
    perm = pp.plane_perm(N, NW)
    assert np.all(np.asarray(T)[perm < 0] == 0.0)


def test_packed_dot_matches_reference(packed):
    Wp, means, W = packed
    rng = np.random.default_rng(1)
    A = rng.standard_normal((N, 9)).astype(np.float32)
    A3 = pp.to_plane(jnp.asarray(A), N, NW).reshape(pp.PLANES, NW, 9)
    D = np.asarray(pp.packed_dot(jnp.asarray(Wp), A3,
                                 jnp.asarray(means), interpret=True))
    np.testing.assert_allclose(D[:P], W @ A, rtol=1e-5, atol=1e-4)


def test_packed_tdot_matches_reference(packed):
    Wp, means, W = packed
    rng = np.random.default_rng(2)
    T = np.zeros((P_PAD, 7), np.float32)
    T[:P] = rng.standard_normal((P, 7))
    T3 = np.asarray(pp.packed_tdot(jnp.asarray(Wp), jnp.asarray(T),
                                   jnp.asarray(means), interpret=True))
    got = np.asarray(pp.from_plane(
        jnp.asarray(T3.reshape(pp.PLANES * NW, 7)), N, NW))
    np.testing.assert_allclose(got, W.T @ T[:P], rtol=1e-5, atol=1e-4)


def test_packed_kernel_matvec_matches_reference(packed):
    Wp, means, W = packed
    rng = np.random.default_rng(4)
    V = rng.standard_normal((N, 3)).astype(np.float32)
    got = np.asarray(pp.kernel_matvec(jnp.asarray(Wp), jnp.asarray(V),
                                      jnp.asarray(means), N, interpret=True))
    # padded rows (P..P_PAD) are 0x55… = het codes → W row 0 → inert
    np.testing.assert_allclose(got, W.T @ (W @ V), rtol=1e-5, atol=1e-3)


def test_unpack_recode_consistency(packed):
    """The XLA 16-plane int32 unpack (word order, padded tail) agrees
    with the reference W on the real columns — the two engine paths
    recode identically from the SAME resident int32 stack."""
    Wp, _, W = packed
    w_xla = np.asarray(kernels.unpack_recode_tile(
        jnp.asarray(Wp[:P]), n=N, compute_dtype="float32"))
    np.testing.assert_allclose(w_xla, W, rtol=1e-6, atol=1e-5)


def test_uint8_and_int32_unpack_agree(packed):
    """The streamed-tile uint8 unpack and the resident-stack int32 unpack
    decode the identical byte stream to the identical W."""
    Wp, _, W = packed
    Wb = np.ascontiguousarray(Wp[:P]).view(np.uint8)
    w_u8 = np.asarray(kernels.unpack_recode_tile(
        jnp.asarray(Wb), n=N, compute_dtype="float32"))
    np.testing.assert_allclose(w_u8, W, rtol=1e-6, atol=1e-5)
