"""GUI smoke test: the stdlib HTTP app end-to-end (read → scan → summary →
plot), reference ``OpenGUI()``/Shiny analog (SURVEY.md §4.5)."""

import json
import os
import time
import urllib.request

import pytest

from eagleeverything_tpu.data import simulate as simmod


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import eagleeverything_tpu.gui as gui
    d = str(tmp_path_factory.mktemp("guidata"))
    simmod.write_tutorial(d, n=100, p=500, seed=4)
    srv = gui.open_gui(port=0, open_browser=False, block=False)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, d
    srv.shutdown()


def test_gui_full_workflow(server):
    base, d = server
    page = _get(base + "/")
    assert b"eagle-tpu" in page and b"Run AM" in page

    r = _post(base + "/api/read", {
        "geno": os.path.join(d, "geno.txt"), "gtype": "text",
        "pheno": os.path.join(d, "pheno.txt"),
        "map": os.path.join(d, "map.txt"),
    })
    assert r["genotypes"].startswith("100 individuals")

    r = _post(base + "/api/am", {"trait": "y", "fformula": "age + sex",
                                 "maxit": "5", "lam": "1.0"})
    assert r.get("started")
    for _ in range(120):
        st = json.loads(_get(base + "/api/status"))
        if not st["running"]:
            break
        time.sleep(1)
    assert st["error"] is None, st
    assert st["result"] is not None
    assert len(st["result"]["indices"]) >= 0  # may select 0 on tiny data
    if st["result"]["indices"]:
        s = json.loads(_get(base + "/api/summary"))
        assert "pvalue" in s
        png = _get(base + "/api/plot.png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # interactive Manhattan payload: aligned per-SNP arrays + selected
        # ranks present (the tooltip data contract of drawManhattan())
        pd = json.loads(_get(base + "/api/plotdata"))
        assert len(pd["x"]) == len(pd["t"]) == len(pd["name"]) \
            == len(pd["rank"]) == len(pd["change_it"])
        assert max(pd["rank"]) == len(st["result"]["indices"])
        assert pd["tick_labels"]  # map was loaded → chromosome ticks


def test_plotdata_cap_enforced():
    """The interactive-plot payload honors max_points even when the whole
    genome is change-flagged (priority fill: selected > changed > top-t >
    background)."""
    import numpy as np
    from eagleeverything_tpu.gui import _plot_data
    from eagleeverything_tpu.models.oracle import AMResult
    p = 60000
    rng = np.random.default_rng(0)
    for stats in ([rng.uniform(0, 50, p), rng.uniform(0, 50, p)],
                  [np.zeros(p)]):
        res = AMResult(indices=[5, 70], extbic_path=[1.0],
                       outlier_stats=stats, loglik_path=[0.0], sigma2_g=1,
                       sigma2_e=1, delta=1, n=100, p=p, lam_ebic=1.0)
        d = _plot_data(res, None, max_points=20000)
        assert len(d["x"]) <= 20002
        assert max(d["rank"]) == 2  # selected markers always survive


def test_gui_error_paths(server):
    base, _ = server
    r = _post(base + "/api/read", {"geno": "/nope", "pheno": "/nope"})
    assert "error" in r


def test_gui_fpr_endpoint(server):
    """VERDICT r2 #9: the GUI wraps fpr4am like the reference Shiny app."""
    base, d = server
    _post(base + "/api/read", {
        "geno": os.path.join(d, "geno.txt"), "gtype": "text",
        "pheno": os.path.join(d, "pheno.txt")})
    r = _post(base + "/api/fpr", {"trait": "y", "numreps": "4"})
    assert r.get("started"), r
    for _ in range(120):
        st = json.loads(_get(base + "/api/fpr_status"))
        if not st["running"]:
            break
        time.sleep(1)
    assert st["error"] is None, st
    assert st["result"]["lambda"] >= 0.0
    assert len(st["result"]["lambda_crits"]) == 4


def test_gui_multi_trait_endpoint(server):
    base, d = server
    _post(base + "/api/read", {
        "geno": os.path.join(d, "geno.txt"), "gtype": "text",
        "pheno": os.path.join(d, "pheno.txt")})
    r = _post(base + "/api/multi", {"traits": "y,age", "maxit": "3"})
    assert r.get("started"), r
    for _ in range(120):
        st = json.loads(_get(base + "/api/multi_status"))
        if not st["running"]:
            break
        time.sleep(1)
    assert st["error"] is None, st
    assert set(st["result"].keys()) == {"y", "age"}
    assert "extbic_path" in st["result"]["y"]


def test_gui_zmat_scan(server, tmp_path):
    """Zmat upload + scan through the GUI: identity Z must reproduce the
    no-Z selection."""
    import numpy as np
    base, d = server
    zpath = str(tmp_path / "z.txt")
    np.savetxt(zpath, np.eye(100), fmt="%d")

    def scan(with_z):
        _post(base + "/api/read", {
            "geno": os.path.join(d, "geno.txt"), "gtype": "text",
            "pheno": os.path.join(d, "pheno.txt"),
            "zmat": zpath if with_z else ""})
        _post(base + "/api/am", {"trait": "y", "maxit": "3"})
        for _ in range(120):
            st = json.loads(_get(base + "/api/status"))
            if not st["running"]:
                break
            time.sleep(1)
        assert st["error"] is None, st
        return st["result"]["indices"]

    r = _post(base + "/api/read", {
        "geno": os.path.join(d, "geno.txt"), "gtype": "text",
        "pheno": os.path.join(d, "pheno.txt"), "zmat": zpath})
    assert "100 records x 100 individuals" in r["zmat"]
    assert scan(True) == scan(False)
