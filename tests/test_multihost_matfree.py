"""Matfree × multi-host SPMD composition test (BASELINE config 4's
executable path): two jax.distributed processes share an on-disk packed
store; each streams only its own SNP range (MultiHostTiledScan), the
kernel matvec psums across hosts, the two-stage sweep's shortlist and
escalations are agreed collectively — and the selection must reproduce
the single-process matfree run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

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
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np
from eagleeverything_tpu.api.am import am
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset

sim = simulate_dataset(n=100, p=512, n_qtl=2, seed=17, h2_qtl=0.5)
handle = GenoHandle(n=100, p=512, source="<mh-matfree>",
                    store_dir=os.environ["EAGLE_TEST_STORE"])
res = am("y", handle, {"y": sim.y}, engine="matfree", maxit=4)
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


def test_two_process_matfree_scan(tmp_path):
    from eagleeverything_tpu.api.am import am
    from eagleeverything_tpu.api.read import GenoHandle
    from eagleeverything_tpu.data.simulate import simulate_dataset
    from eagleeverything_tpu.io.genostore import GenotypeStore

    sim = simulate_dataset(n=100, p=512, n_qtl=2, seed=17, h2_qtl=0.5)
    store_dir = str(tmp_path / "mfstore")
    GenotypeStore.create_from_dense(store_dir, sim.geno, n_shards=2,
                                    packed=True)
    handle = GenoHandle(n=100, p=512, source="<mh-matfree>",
                        store_dir=store_dir)
    ref = am("y", handle, {"y": sim.y}, engine="matfree", maxit=4)

    out_file = str(tmp_path / "mf.json")
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
        got = json.load(f)

    # selection must match exactly; the likelihood path agrees to the
    # f32-matvec noise floor (single-process uses the fused device Krylov
    # fast paths, multi-host the streamed collective CG)
    assert got["indices"] == ref.indices
    np.testing.assert_allclose(got["extbic_path"], ref.extbic_path,
                               rtol=1e-4)
