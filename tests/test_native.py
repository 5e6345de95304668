"""Native C++ ingest library tests: native/python parser equivalence,
2-bit packing, PLINK .bed, packed store round-trips."""

import numpy as np
import pytest

from eagleeverything_tpu.api.read import read_marker
from eagleeverything_tpu.data import simulate as simmod
from eagleeverything_tpu.io import native, parsers
from eagleeverything_tpu.io.genostore import GenotypeStore


@pytest.fixture(scope="module")
def sim():
    return simmod.simulate_dataset(n=57, p=310, seed=9, missing_rate=0.03)


def test_native_lib_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of the native ingest library failed"


def test_native_ascii_matches_python(sim, tmp_path):
    f = str(tmp_path / "g.txt")
    simmod.write_ascii_geno(sim, f)
    nat = np.vstack(list(parsers.iter_ascii_blocks(f, use_native=True)))
    py = np.vstack(list(parsers.iter_ascii_blocks(f, use_native=False)))
    np.testing.assert_array_equal(nat, py)
    np.testing.assert_array_equal(nat, sim.geno)


def test_native_ascii_nospace(sim, tmp_path):
    f = str(tmp_path / "g.txt")
    simmod.write_ascii_geno_nospace(sim, f)
    nat = np.vstack(list(
        parsers.iter_ascii_blocks(f, AA="0", AB="1", BB="2", missing="X")
    ))
    np.testing.assert_array_equal(nat, sim.geno)


def test_native_ascii_small_blocks(sim, tmp_path):
    f = str(tmp_path / "g.txt")
    simmod.write_ascii_geno(sim, f)
    blocks = list(parsers.iter_ascii_blocks(f, block_rows=13))
    assert all(b.shape[0] <= 13 for b in blocks)
    np.testing.assert_array_equal(np.vstack(blocks), sim.geno)


def test_native_ascii_bad_token(tmp_path):
    f = str(tmp_path / "g.txt")
    with open(f, "w") as fh:
        fh.write("AA AB BB\nAA XX BB\n")
    with pytest.raises(ValueError):
        list(parsers.iter_ascii_blocks(f))


def test_pack2_roundtrip(sim):
    flat = sim.geno.reshape(-1)
    for count in (1, 3, 4, 5, flat.size):
        packed = native.pack2(flat[:count])
        assert packed.size == (count + 3) // 4
        out = native.unpack2(packed, count)
        np.testing.assert_array_equal(out, flat[:count])


def test_pack2_python_fallback_matches_native(sim):
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    flat = sim.geno.reshape(-1)[:1001]
    lib_packed = native.pack2(flat)
    # force the python path
    orig, native._lib, native._lib_failed = native._lib, None, True
    try:
        py_packed = native.pack2(flat)
        py_out = native.unpack2(lib_packed, flat.size)
    finally:
        native._lib, native._lib_failed = orig, False
    np.testing.assert_array_equal(lib_packed, py_packed)
    np.testing.assert_array_equal(py_out, flat)


def test_packed_store_roundtrip(sim, tmp_path):
    d = str(tmp_path / "pstore")
    GenotypeStore.create_from_dense(d, sim.geno, n_shards=3, packed=True)
    st = GenotypeStore.open(d)
    assert st.packed
    np.testing.assert_array_equal(st.to_dense(), sim.geno)
    for j in (0, 100, sim.geno.shape[1] - 1):
        np.testing.assert_array_equal(st.column(j), sim.geno[:, j])
    # packed shards are ~4x smaller than int8
    import os
    sz = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
             if f.endswith(".bin"))
    n, p = sim.geno.shape
    assert sz == p * ((n + 3) // 4)


def test_plink_bed_roundtrip(sim, tmp_path):
    bed = str(tmp_path / "g.bed")
    simmod.write_plink_bed(sim, bed)
    h = read_marker(bed, type="PLINK")
    np.testing.assert_array_equal(h.geno, sim.geno)
    assert h.marker_names == sim.marker_names


def test_plink_bed_into_packed_store(sim, tmp_path):
    bed = str(tmp_path / "g.bed")
    simmod.write_plink_bed(sim, bed)
    d = str(tmp_path / "bstore")
    h = read_marker(bed, type="PLINK", store_dir=d, n_shards=2, packed=True)
    np.testing.assert_array_equal(h.materialize(), sim.geno)


def test_vcf_into_store(sim, tmp_path):
    f = str(tmp_path / "g.vcf")
    simmod.write_vcf(sim, f)
    d = str(tmp_path / "vstore")
    h = read_marker(f, type="vcf", store_dir=d, n_shards=2)
    np.testing.assert_array_equal(h.materialize(), sim.geno)
    assert h.marker_names == sim.marker_names


# ---- native VCF GT scanner (ee_vcf_*) --------------------------------------


def _collect_vcf(path, block_snps=4096, use_native=True):
    genos, names, chroms, poss = [], [], [], []
    for g, nm, ch, po in parsers.iter_vcf_blocks(
        path, block_snps=block_snps, use_native=use_native
    ):
        genos.append(g)
        names += nm
        chroms += ch
        poss += po
    return np.hstack(genos), names, chroms, poss


def test_native_vcf_matches_python(sim, tmp_path):
    f = str(tmp_path / "g.vcf")
    simmod.write_vcf(sim, f)
    gn, nn, cn, pn = _collect_vcf(f, use_native=True)
    gp, np_, cp, pp_ = _collect_vcf(f, use_native=False)
    np.testing.assert_array_equal(gn, gp)
    assert nn == np_ and cn == cp and pn == pp_
    np.testing.assert_array_equal(gn, sim.geno)


def test_native_vcf_block_boundaries(sim, tmp_path):
    f = str(tmp_path / "g.vcf")
    simmod.write_vcf(sim, f)
    g1 = _collect_vcf(f, block_snps=7)[0]
    g2 = _collect_vcf(f, block_snps=100000)[0]
    np.testing.assert_array_equal(g1, g2)


def test_native_vcf_edge_calls(tmp_path):
    """Phased |, haploid, multi-allelic clamp, '.' in call, GT not first
    in FORMAT, '.' ID fallback naming — native ≡ python on each."""
    f = str(tmp_path / "edge.vcf")
    hdr = "\t".join(
        ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO",
         "FORMAT", "S1", "S2", "S3"]
    )
    rows = [
        # phased and unphased mix
        ["1", "100", "rs1", "A", "B", ".", "PASS", ".", "GT",
         "0|1", "1|1", "0/0"],
        # '.' anywhere in the call → missing; haploid → missing
        ["1", "200", "rs2", "A", "B", ".", ".", ".", "GT",
         "./.", "1/.", "1"],
        # multi-allelic: alleles clamp to 1 (2/2 → dose 2, 0/2 → dose 1)
        ["2", "300", "rs3", "A", "B,C", ".", ".", ".", "GT",
         "2/2", "0/2", "1/2"],
        # GT not first in FORMAT; extra subfields present
        ["2", "400", "rs4", "A", "B", ".", ".", ".", "DP:GT:GQ",
         "9:0/1:33", "7:1/1:12", "4:./.:0"],
        # '.' ID → name falls back to chrom:pos
        ["3", "500", ".", "A", "B", ".", ".", ".", "GT",
         "0/0", "0/1", "1/1"],
        # triploid call: first two alleles used unless any '.' present
        ["3", "600", "rs6", "A", "B", ".", ".", ".", "GT",
         "0/1/1", "1/0/.", "0|0|1"],
    ]
    with open(f, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n" + hdr + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    gn, nn, cn, pn = _collect_vcf(f, use_native=True)
    gp, np_, cp, pp_ = _collect_vcf(f, use_native=False)
    np.testing.assert_array_equal(gn, gp)
    assert nn == np_ and cn == cp and pn == pp_
    expected = np.array(
        [[1, 2, 0],
         [-9, -9, -9],
         [2, 1, 2],
         [1, 2, -9],
         [0, 1, 2],
         [1, -9, 0]], dtype=np.int8
    ).T
    np.testing.assert_array_equal(gn, expected)
    assert nn[4] == "3:500" and nn[0] == "rs1"
    assert parsers.vcf_dims(f) == (3, 6)


def test_native_vcf_malformed_raises(tmp_path):
    f = str(tmp_path / "bad.vcf")
    with open(f, "w") as fh:
        fh.write("##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                 "\tFORMAT\tS1\n")
        fh.write("1\t100\trs1\tA\tB\t.\t.\t.\tGT\t0/x\n")
    with pytest.raises(ValueError):
        _collect_vcf(f, use_native=True)
    with pytest.raises(Exception):
        _collect_vcf(f, use_native=False)


def test_native_vcf_declines_oversized_metadata(tmp_path):
    """Legal VCF with a >=128-char ID: native path declines at open,
    the Python fallback parses it, results still correct."""
    f = str(tmp_path / "wide.vcf")
    long_id = ";".join(f"rs{i}" for i in range(60))  # > 128 chars
    with open(f, "w") as fh:
        fh.write("##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                 "\tFORMAT\tS1\tS2\n")
        fh.write(f"1\t100\t{long_id}\tA\tB\t.\t.\t.\tGT\t0/1\t1/1\n")
        fh.write("1\t200\trs_ok\tA\tB\t.\t.\t.\tGT\t0/0\t./.\n")
    assert len(long_id) >= 128
    assert native.iter_vcf_blocks_native(f) is None  # declines whole file
    g, names, chroms, poss = _collect_vcf(f, use_native=True)  # falls back
    np.testing.assert_array_equal(
        g, np.array([[1, 2], [0, -9]], dtype=np.int8).T)
    assert names[0] == long_id


def test_ncpu_knob_scopes_env_and_matches_default(sim, tmp_path):
    """read_marker(ncpu=k) caps the native recode pool via EE_NCPU for the
    duration of the call only, and a 1-thread ingest is bit-identical to
    the all-threads ingest (reference: the ncpu argument, SURVEY §3.4)."""
    import os
    f = str(tmp_path / "g.txt")
    simmod.write_ascii_geno(sim, f)
    assert "EE_NCPU" not in os.environ
    h1 = read_marker(f, ncpu=1)
    assert "EE_NCPU" not in os.environ  # restored after the call
    h_all = read_marker(f)
    np.testing.assert_array_equal(h1.geno, h_all.geno)
    os.environ["EE_NCPU"] = "3"
    try:
        h2 = read_marker(f, ncpu=2)  # override then restore the prior value
        assert os.environ["EE_NCPU"] == "3"
        np.testing.assert_array_equal(h2.geno, h_all.geno)
    finally:
        os.environ.pop("EE_NCPU", None)
    with pytest.raises(ValueError):
        read_marker(f, ncpu=-2)
