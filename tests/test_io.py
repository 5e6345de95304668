"""Ingestion-layer tests: parsers for every supported format round-trip the
simulated truth, and the sharded store preserves data exactly
(SURVEY.md §5: ReadMarker recoding correctness on each input type)."""

import numpy as np
import pytest

from eagleeverything_tpu.api.read import read_map, read_marker, read_pheno, read_zmat
from eagleeverything_tpu.data import simulate as simmod
from eagleeverything_tpu.io.genostore import GenotypeStore


@pytest.fixture(scope="module")
def sim():
    return simmod.simulate_dataset(n=60, p=300, seed=2, missing_rate=0.03)


def test_ascii_roundtrip(sim, tmp_path):
    f = str(tmp_path / "geno.txt")
    simmod.write_ascii_geno(sim, f)
    h = read_marker(f, type="text")
    assert (h.n, h.p) == sim.geno.shape
    np.testing.assert_array_equal(h.geno, sim.geno)


def test_ascii_custom_codes(sim, tmp_path):
    f = str(tmp_path / "geno.txt")
    simmod.write_ascii_geno(sim, f, AA="0", AB="1", BB="2", missing="9")
    h = read_marker(f, type="text", AA="0", AB="1", BB="2", missing="9")
    np.testing.assert_array_equal(h.geno, sim.geno)


def test_ascii_nospace_roundtrip(sim, tmp_path):
    f = str(tmp_path / "geno.txt")
    simmod.write_ascii_geno_nospace(sim, f)
    h = read_marker(f, type="text", AA="0", AB="1", BB="2", missing="X")
    np.testing.assert_array_equal(h.geno, sim.geno)


def test_plink_ped_roundtrip(sim, tmp_path):
    ped = str(tmp_path / "g.ped")
    pmap = str(tmp_path / "g.map")
    simmod.write_plink_ped(sim, ped, pmap)
    h = read_marker(ped, type="PLINK")
    # monomorphic SNPs lose allele orientation in .ped ('B B'-only columns
    # are indistinguishable from 'A A'-only) — compare them as constants
    truth = sim.geno
    obs_mask = truth != -9
    poly = np.array([
        len(np.unique(truth[obs_mask[:, j], j])) > 1
        for j in range(truth.shape[1])
    ])
    np.testing.assert_array_equal(h.geno[:, poly], truth[:, poly])
    for j in np.where(~poly)[0]:
        col = h.geno[obs_mask[:, j], j]
        assert len(np.unique(col)) <= 1
    np.testing.assert_array_equal(h.geno == -9, truth == -9)


def test_vcf_roundtrip(sim, tmp_path):
    f = str(tmp_path / "g.vcf")
    simmod.write_vcf(sim, f)
    h = read_marker(f, type="vcf")
    np.testing.assert_array_equal(h.geno, sim.geno)
    assert h.marker_names == sim.marker_names
    assert [int(c) for c in h.chrom] == sim.chrom.tolist()


def test_pheno_reader(sim, tmp_path):
    f = str(tmp_path / "pheno.txt")
    simmod.write_pheno(sim, f)
    ph = read_pheno(f)
    assert ph.names == ["y", "age", "sex"]
    np.testing.assert_allclose(ph.columns["y"], sim.y, atol=1e-6)
    assert ph.columns["sex"].dtype.kind in "UO"  # stays a string factor


def test_map_reader(sim, tmp_path):
    f = str(tmp_path / "map.txt")
    simmod.write_map(sim, f)
    mh = read_map(f)
    assert mh.p == sim.geno.shape[1]
    assert mh.marker_names[:2] == sim.marker_names[:2]


def test_zmat_reader(tmp_path):
    Z = np.kron(np.eye(3), np.ones((2, 1)))
    f = str(tmp_path / "z.txt")
    simmod.write_zmat(Z, f)
    Z2 = read_zmat(f)
    np.testing.assert_array_equal(Z, Z2)
    bad = np.array([[1, 1, 0], [0, 0, 1]])
    simmod.write_zmat(bad, f)
    with pytest.raises(ValueError):
        read_zmat(f)


def test_store_roundtrip(sim, tmp_path):
    d = str(tmp_path / "store")
    GenotypeStore.create_from_dense(d, sim.geno, n_shards=4)
    st = GenotypeStore.open(d)
    assert (st.n, st.p) == sim.geno.shape
    assert st.n_shards == 4
    np.testing.assert_array_equal(st.to_dense(), sim.geno)
    # column access = extract_geno analog
    for j in (0, 77, sim.geno.shape[1] - 1):
        np.testing.assert_array_equal(st.column(j), sim.geno[:, j])
    # tiles cover exactly once, in order
    seen = np.zeros(st.p, dtype=int)
    for j0, tile in st.iter_tiles(64):
        seen[j0 : j0 + tile.shape[0]] += 1
        np.testing.assert_array_equal(tile.T, sim.geno[:, j0 : j0 + tile.shape[0]])
    assert (seen == 1).all()


def test_store_partial_ingest_detected(sim, tmp_path):
    """A killed ingest must not look like a valid store: the manifest is
    the commit record (written last, atomically), so a directory with
    shards but no manifest is refused by open()."""
    import os
    import pytest
    d = str(tmp_path / "store")
    GenotypeStore.create_from_dense(d, sim.geno, n_shards=2)
    os.remove(os.path.join(d, "manifest.json"))  # simulate kill-before-commit
    with pytest.raises(FileNotFoundError):
        GenotypeStore.open(d)


def test_store_from_row_blocks(sim, tmp_path):
    """Out-of-core blocked transpose (createM→createMt analog)."""
    d = str(tmp_path / "store2")

    def blocks():
        for i0 in range(0, sim.geno.shape[0], 17):
            yield sim.geno[i0 : i0 + 17]

    GenotypeStore.create_from_row_blocks(d, blocks(), n_shards=3,
                                         availmem_gb=1e-4)
    st = GenotypeStore.open(d)
    np.testing.assert_array_equal(st.to_dense(), sim.geno)


def test_read_marker_into_store(sim, tmp_path):
    f = str(tmp_path / "geno.txt")
    simmod.write_ascii_geno(sim, f)
    d = str(tmp_path / "store3")
    h = read_marker(f, type="text", store_dir=d, n_shards=2)
    assert h.geno is None and h.store_dir == d
    np.testing.assert_array_equal(h.materialize(), sim.geno)


def test_gzip_vcf_and_text(sim, tmp_path):
    """Transparent .gz ingest: identical handles vs the plain files."""
    import gzip
    import shutil

    vcf = str(tmp_path / "g.vcf")
    simmod.write_vcf(sim, vcf)
    with open(vcf, "rb") as s, gzip.open(str(tmp_path / "g.vcf.gz"), "wb") as d:
        shutil.copyfileobj(s, d)
    h_plain = read_marker(vcf, type="vcf")
    h_gz = read_marker(str(tmp_path / "g.vcf.gz"), type="vcf")
    np.testing.assert_array_equal(h_plain.materialize(), h_gz.materialize())
    assert h_plain.marker_names == h_gz.marker_names

    txt = str(tmp_path / "g.txt")
    simmod.write_ascii_geno(sim, txt)
    with open(txt, "rb") as s, gzip.open(str(tmp_path / "g.txt.gz"), "wb") as d:
        shutil.copyfileobj(s, d)
    np.testing.assert_array_equal(
        read_marker(txt).materialize(),
        read_marker(str(tmp_path / "g.txt.gz")).materialize(),
    )
    # decompressed sibling is cached and reused
    from eagleeverything_tpu.io import parsers
    p1 = parsers.ensure_plain_text(str(tmp_path / "g.vcf.gz"))
    p2 = parsers.ensure_plain_text(str(tmp_path / "g.vcf.gz"))
    assert p1 == p2 and p1.endswith(".ungz.vcf")


def test_gzip_ped_finds_map_companion(sim, tmp_path):
    """x.ped.gz picks up marker metadata from x.map (not x.ungz.map)."""
    import gzip
    import os
    import shutil

    ped = str(tmp_path / "g.ped")
    pmap = str(tmp_path / "g.map")
    simmod.write_plink_ped(sim, ped, pmap)
    plain = read_marker(ped, type="PLINK")
    with open(ped, "rb") as s, gzip.open(ped + ".gz", "wb") as d:
        shutil.copyfileobj(s, d)
    os.unlink(ped)
    h = read_marker(ped + ".gz", type="PLINK")
    np.testing.assert_array_equal(h.materialize(), plain.materialize())
    assert h.marker_names is not None
    assert list(h.marker_names) == list(plain.marker_names)


def test_bed_gz_clear_error(tmp_path):
    import gzip
    with gzip.open(str(tmp_path / "g.bed.gz"), "wb") as d:
        d.write(b"\x6c\x1b\x01")
    with pytest.raises(ValueError, match="gunzip"):
        read_marker(str(tmp_path / "g.bed.gz"), type="PLINK")


def test_store_from_row_blocks_packed_multiflush(tmp_path):
    """Biobank-safe chunked transpose, 2-bit packed: many buffer flushes
    with a non-multiple-of-4 trailing slab must still produce byte-aligned
    packed rows; no scratch temp may survive."""
    import os
    rng = np.random.default_rng(123)
    geno = rng.integers(0, 3, size=(57, 101)).astype(np.int8)
    geno[rng.random(geno.shape) < 0.05] = -9
    d = str(tmp_path / "storep")

    def blocks():
        for i0 in range(0, 57, 13):
            yield geno[i0 : i0 + 13]

    st = GenotypeStore.create_from_row_blocks(
        d, blocks(), n_shards=3, availmem_gb=2e-6, packed=True)
    np.testing.assert_array_equal(st.to_dense(), geno)
    st2 = GenotypeStore.open(d)
    np.testing.assert_array_equal(st2.column(100), geno[:, 100])
    leftovers = [f for f in os.listdir(d) if f.endswith(".tmp")]
    assert leftovers == []
