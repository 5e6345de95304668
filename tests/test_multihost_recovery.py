"""Multi-host failure recovery (SURVEY §6.3): SIGKILL one of two SPMD
processes mid-scan, terminate the stranded peer, restart the job with
``resume=True`` — the resumed run must restart from the last iteration
boundary and reproduce the uninterrupted run's final selection exactly."""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np

_WORKER = r"""
import json, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["EAGLE_COORD_ADDR"],
    num_processes=2,
    process_id=int(os.environ["EAGLE_PROC_ID"]),
)
import numpy as np
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset
from eagleeverything_tpu.models import engine_jax

sim = simulate_dataset(n=100, p=512, n_qtl=3, seed=29, h2_qtl=0.6)
handle = GenoHandle(n=100, p=512, source="<mh-recover>", geno=sim.geno)
res = engine_jax.forward_select(
    sim.y, np.ones((100, 1)), handle, maxit=4, fixit=True, sharded=True,
    ckpt_dir=os.environ["EAGLE_CKPT"],
    resume=os.environ.get("EAGLE_RESUME") == "1",
)
if jax.process_index() == 0:
    with open(os.environ["EAGLE_TEST_OUT"], "w") as f:
        json.dump({"indices": res.indices,
                   "extbic_path": res.extbic_path}, f)
print("proc", jax.process_index(), "done", res.indices)
"""


# matfree engine over PHYSICALLY split store shards (each process's dir
# holds only its own shard): kill/resume must work with the owning-host
# column broadcast on the resume path too
_WORKER_MF = r"""
import json, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["EAGLE_COORD_ADDR"],
    num_processes=2,
    process_id=int(os.environ["EAGLE_PROC_ID"]),
)
pid = jax.process_index()
import numpy as np
from eagleeverything_tpu.api.am import am
from eagleeverything_tpu.api.read import GenoHandle
from eagleeverything_tpu.data.simulate import simulate_dataset

sim = simulate_dataset(n=100, p=512, n_qtl=3, seed=29, h2_qtl=0.6)
handle = GenoHandle(n=100, p=512, source="<mf-recover>",
                    store_dir=os.environ[f"EAGLE_TEST_STORE_{pid}"])
res = am("y", handle, {"y": sim.y}, engine="matfree", maxit=3, fixit=True,
         ckpt_dir=os.environ["EAGLE_CKPT"],
         resume=os.environ.get("EAGLE_RESUME") == "1")
if pid == 0:
    with open(os.environ["EAGLE_TEST_OUT"], "w") as f:
        json.dump({"indices": res.indices,
                   "extbic_path": res.extbic_path}, f)
print("proc", pid, "done", res.indices)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid, port, ckpt, out_file, resume, worker=_WORKER, extra=None):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(
        EAGLE_COORD_ADDR=f"127.0.0.1:{port}",
        EAGLE_PROC_ID=str(pid),
        EAGLE_CKPT=ckpt,
        EAGLE_TEST_OUT=out_file,
        EAGLE_RESUME="1" if resume else "0",
    )
    if extra:
        env.update(extra)
    return subprocess.Popen(
        [sys.executable, "-c", worker], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def _run_pair(ckpt, out_file, resume, worker=_WORKER, extra=None):
    port = _free_port()
    procs = [_spawn(pid, port, ckpt, out_file, resume, worker, extra)
             for pid in (0, 1)]
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=480)
        outs.append(out.decode(errors="replace"))
    for pr, out in zip(procs, outs):
        assert pr.returncode == 0, out[-3000:]
    with open(out_file) as f:
        return json.load(f)


def test_multihost_kill_and_resume(tmp_path):
    # uninterrupted reference run (own checkpoint dir)
    ref = _run_pair(str(tmp_path / "ckpt_ref"), str(tmp_path / "ref.json"),
                    resume=False)
    assert len(ref["indices"]) == 4  # fixit drives all 4 iterations

    # interrupted run: kill process 1 the moment the checkpoint records
    # at least one accepted marker; process 0 is then stranded on a
    # collective and gets terminated too (a dead host kills the SPMD job
    # — recovery is restarting the JOB from the last boundary, §6.3)
    ckpt = str(tmp_path / "ckpt")
    out_file = str(tmp_path / "out.json")
    port = _free_port()
    procs = [_spawn(pid, port, ckpt, out_file, resume=False)
             for pid in (0, 1)]
    state_path = os.path.join(ckpt, "scan_state.json")
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if os.path.exists(state_path):
            try:
                with open(state_path) as f:
                    st = json.load(f)
            except (json.JSONDecodeError, OSError):
                time.sleep(0.05)
                continue
            if len(st.get("selected", [])) >= 1 and len(
                    st["selected"]) < 4:
                procs[1].send_signal(signal.SIGKILL)
                killed = True
                break
        if any(pr.poll() is not None for pr in procs):
            break  # finished before we could kill — shouldn't happen
        time.sleep(0.02)
    assert killed, "never saw a mid-scan checkpoint to kill at"
    procs[1].wait(timeout=60)
    try:
        procs[0].wait(timeout=20)   # barrier/heartbeat may surface the loss
    except subprocess.TimeoutExpired:
        # stranded inside a C++ collective: SIGTERM is ignored there, so
        # reap it the way a scheduler would — SIGKILL
        procs[0].send_signal(signal.SIGKILL)
        procs[0].wait(timeout=60)
    for pr in procs:
        if pr.stdout:
            pr.stdout.close()

    # the checkpoint survived the kill with ≥1 accepted marker
    with open(state_path) as f:
        st = json.load(f)
    n_before = len(st["selected"])
    assert 1 <= n_before < 4
    assert st["selected"] == ref["indices"][:n_before]

    # restart the job with resume=True: identical final selection
    got = _run_pair(ckpt, out_file, resume=True)
    assert got["indices"] == ref["indices"]
    np.testing.assert_allclose(got["extbic_path"], ref["extbic_path"],
                               rtol=1e-8)


def test_matfree_split_store_kill_and_resume(tmp_path):
    """The same kill/resume discipline for the BIOBANK path: matfree
    engine, each process owning only its own store shard, collective
    Krylov live. The resume path's fixed-effect rebuild goes through the
    owning-host column broadcast."""
    import shutil

    from eagleeverything_tpu.data.simulate import simulate_dataset
    from eagleeverything_tpu.io.genostore import GenotypeStore

    sim = simulate_dataset(n=100, p=512, n_qtl=3, seed=29, h2_qtl=0.6)
    full = str(tmp_path / "full")
    GenotypeStore.create_from_dense(full, sim.geno, n_shards=2, packed=True)
    dirs = []
    for pid in (0, 1):
        d = str(tmp_path / f"proc{pid}")
        os.makedirs(d)
        shutil.copy(os.path.join(full, "manifest.json"), d)
        shutil.copy(os.path.join(full, f"shard_{pid:05d}.bin"), d)
        dirs.append(d)
    extra = {"EAGLE_TEST_STORE_0": dirs[0], "EAGLE_TEST_STORE_1": dirs[1]}

    ref = _run_pair(str(tmp_path / "ckpt_ref"), str(tmp_path / "ref.json"),
                    resume=False, worker=_WORKER_MF, extra=extra)
    assert len(ref["indices"]) == 3  # fixit drives all 3 iterations

    ckpt = str(tmp_path / "ckpt")
    out_file = str(tmp_path / "out.json")
    port = _free_port()
    procs = [_spawn(pid, port, ckpt, out_file, resume=False,
                    worker=_WORKER_MF, extra=extra) for pid in (0, 1)]
    state_path = os.path.join(ckpt, "scan_state.json")
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if os.path.exists(state_path):
            try:
                with open(state_path) as f:
                    st = json.load(f)
            except (json.JSONDecodeError, OSError):
                time.sleep(0.05)
                continue
            if 1 <= len(st.get("selected", [])) < 3:
                procs[1].send_signal(signal.SIGKILL)
                killed = True
                break
        if any(pr.poll() is not None for pr in procs):
            break
        time.sleep(0.02)
    assert killed, "never saw a mid-scan checkpoint to kill at"
    procs[1].wait(timeout=60)
    try:
        procs[0].wait(timeout=20)
    except subprocess.TimeoutExpired:
        procs[0].send_signal(signal.SIGKILL)
        procs[0].wait(timeout=60)
    for pr in procs:
        if pr.stdout:
            pr.stdout.close()

    with open(state_path) as f:
        st = json.load(f)
    n_before = len(st["selected"])
    assert 1 <= n_before < 3
    assert st["selected"] == ref["indices"][:n_before]

    got = _run_pair(ckpt, out_file, resume=True, worker=_WORKER_MF,
                    extra=extra)
    assert got["indices"] == ref["indices"]
    np.testing.assert_allclose(got["extbic_path"], ref["extbic_path"],
                               rtol=1e-4)
