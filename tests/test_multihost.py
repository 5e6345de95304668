"""True multi-process SPMD test: two jax.distributed processes on one
machine (4 virtual CPU devices each → one global 8-device mesh) run the
SNP-sharded scan and must reproduce the single-process selection
(SURVEY.md §5 "Multi-host without a cluster")."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["EAGLE_COORD_ADDR"],
    num_processes=int(os.environ["EAGLE_NUM_PROCS"]),
    process_id=int(os.environ["EAGLE_PROC_ID"]),
)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import engine_jax

sim = simulate_dataset(n=100, p=512, n_qtl=2, seed=17, h2_qtl=0.5)
store_dir = os.environ.get("EAGLE_TEST_STORE", "")
if store_dir:
    # store-backed SPMD: every host opens the shared store; each decodes
    # only its own SNP shard range (tiles_in host locality)
    handle = GenoHandle(n=100, p=512, source="<mh-store>",
                        store_dir=store_dir)
else:
    handle = GenoHandle(n=100, p=512, source="<mh>", geno=sim.geno)
X0 = np.ones((100, 1))
res = engine_jax.forward_select(sim.y, X0, handle, maxit=4, sharded=True)
if jax.process_index() == 0:
    with open(os.environ["EAGLE_TEST_OUT"], "w") as f:
        json.dump({"indices": res.indices,
                   "extbic_path": res.extbic_path}, f)
print("proc", jax.process_index(), "ok", res.indices)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, store_dir=""):
    out_file = str(tmp_path / "mh.json")
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
            EAGLE_TEST_STORE=store_dir,
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=480)
        outs.append(out.decode(errors="replace"))
    for pr, out in zip(procs, outs):
        assert pr.returncode == 0, out[-3000:]
    with open(out_file) as f:
        return json.load(f)


def _reference_result():
    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.data.simulate import simulate_dataset
    from eagleeverything_tpu.models import engine_jax

    sim = simulate_dataset(n=100, p=512, n_qtl=2, seed=17, h2_qtl=0.5)
    handle = GenoHandle(n=100, p=512, source="<mh>", geno=sim.geno)
    ref = engine_jax.forward_select(sim.y, np.ones((100, 1)), handle,
                                    maxit=4, sharded=True)
    return sim, ref


def test_two_process_sharded_scan(tmp_path):
    _, ref = _reference_result()
    got = _run_two_process(tmp_path)
    assert got["indices"] == ref.indices
    np.testing.assert_allclose(got["extbic_path"], ref.extbic_path,
                               rtol=1e-8)


def test_two_process_store_backed_scan(tmp_path):
    """Shared on-disk packed store + two SPMD processes: each host decodes
    only its shard range (tiles_in locality) and the selection matches the
    single-process in-memory run."""
    from eagleeverything_tpu.io.genostore import GenotypeStore

    sim, ref = _reference_result()
    store_dir = str(tmp_path / "mhstore")
    GenotypeStore.create_from_dense(store_dir, sim.geno, n_shards=2,
                                    packed=True)
    got = _run_two_process(tmp_path, store_dir=store_dir)
    assert got["indices"] == ref.indices
    np.testing.assert_allclose(got["extbic_path"], ref.extbic_path,
                               rtol=1e-6)
