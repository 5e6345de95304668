"""Per-host HBM-resident packed stacks under multi-host SPMD.

Config-4 composition of the round-3 packed stack (test_packed_stack):
each process keeps ONLY its own shard's 2-bit bytes device-resident
(RangeTileSource.raw_packed_tiles → engine _packed_stack) and the
matfree engine's collective primitives run over them — the kernel
matvec is the local packed one-dispatch pass + one deterministic f64
all-reduce, the sweep statistics stay host-local rows. Store dirs are
physically split (foreign shards ABSENT), so any non-local read fails
loudly (SURVEY.md §6.8 "store shard ↔ host locality")."""

import json
import os
import shutil
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["EAGLE_COORD_ADDR"],
    num_processes=int(os.environ["EAGLE_NUM_PROCS"]),
    process_id=int(os.environ["EAGLE_PROC_ID"]),
)
pid = jax.process_index()

import numpy as np
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import bigscan, engine_jax
from eagleeverything_tpu.utils.config import EagleConfig

store_dir = os.environ[f"EAGLE_TEST_STORE_{pid}"]
sim = simulate_dataset(n=100, p=512, n_qtl=2, seed=17, h2_qtl=0.5)
handle = GenoHandle(n=100, p=512, source="<split>", store_dir=store_dir)

# tiny budget: recoded tile cache ineligible, packed local bytes fit →
# the per-host PACKED stack must engage (and the dense global-mesh
# Krylov stack must NOT: its per-device share exceeds the budget, so CG
# falls back to the streamed host form whose matvec is the packed pass)
cfg = EagleConfig(snp_tile=128, device_cache_gb=2e-5)
src = engine_jax._make_source(handle, None)
backend = engine_jax.MultiHostTiledScan(src, cfg)
assert not backend.cache_device
assert backend.cache_packed_device
assert backend._packed_stack() is not None
assert backend.device_cg(np.ones((100, 2)), 0.5, 100.0) is None

out = {}
rng = np.random.default_rng(7)
V = rng.standard_normal((100, 5))
out["kv"] = backend.kernel_matvec(V).tolist()

X0 = np.ones((100, 1))
res = bigscan.forward_select_matfree(
    sim.y, X0, backend, maxit=4, diag_probes=16, exact_topk=2,
    column_f64=backend.column_f64)
out["mf_indices"] = res.indices
out["mf_extbic"] = res.extbic_path

if pid == 0:
    with open(os.environ["EAGLE_TEST_OUT"], "w") as f:
        json.dump(out, f)
print("proc", pid, "ok")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def split_setup(tmp_path_factory):
    from eagleeverything_tpu.data.simulate import simulate_dataset
    from eagleeverything_tpu.io.genostore import GenotypeStore

    tmp = tmp_path_factory.mktemp("pstack_split")
    sim = simulate_dataset(n=100, p=512, n_qtl=2, seed=17, h2_qtl=0.5)
    full = str(tmp / "full")
    GenotypeStore.create_from_dense(full, sim.geno, n_shards=2, packed=True)
    dirs = []
    for pid in (0, 1):
        d = str(tmp / f"proc{pid}")
        os.makedirs(d)
        shutil.copy(os.path.join(full, "manifest.json"), d)
        shutil.copy(os.path.join(full, f"shard_{pid:05d}.bin"), d)
        dirs.append(d)
    return sim, full, dirs, tmp


def test_spmd_packed_stacks_match_single_process(split_setup):
    sim, full, dirs, tmp = split_setup
    out_file = str(tmp / "out.json")
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            EAGLE_COORD_ADDR=f"127.0.0.1:{port}",
            EAGLE_NUM_PROCS="2",
            EAGLE_PROC_ID=str(pid),
            EAGLE_TEST_OUT=out_file,
            EAGLE_TEST_STORE_0=dirs[0],
            EAGLE_TEST_STORE_1=dirs[1],
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for pr, out in zip(procs, outs):
        assert pr.returncode == 0, out[-3000:]
    with open(out_file) as f:
        got = json.load(f)

    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.models import bigscan, engine_jax
    from eagleeverything_tpu.utils.config import EagleConfig

    handle = GenoHandle(n=100, p=512, source="<split>", store_dir=full)
    src = engine_jax._make_source(handle, None)
    backend = engine_jax.TiledScan(src, EagleConfig())
    rng = np.random.default_rng(7)
    V = rng.standard_normal((100, 5))
    np.testing.assert_allclose(np.asarray(got["kv"]),
                               backend.kernel_matvec(V),
                               rtol=1e-5, atol=1e-4)

    X0 = np.ones((100, 1))
    res_ref = bigscan.forward_select_matfree(
        sim.y, X0, backend, maxit=4, diag_probes=16, exact_topk=2,
        column_f64=backend.column_f64)
    assert got["mf_indices"] == res_ref.indices
    np.testing.assert_allclose(got["mf_extbic"], res_ref.extbic_path,
                               rtol=1e-3)
