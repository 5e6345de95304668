"""Utility-layer tests: config resolution, distributed env glue, logging."""

import json
import os

import numpy as np
import pytest

from eagleeverything_tpu.utils import distributed
from eagleeverything_tpu.utils.config import EagleConfig
from eagleeverything_tpu.utils.logging import Phase, ScanLogger


def test_config_validation():
    with pytest.raises(ValueError):
        EagleConfig(compute_dtype="float16")
    with pytest.raises(ValueError):
        EagleConfig(snp_tile=100)
    EagleConfig(snp_tile=256)  # ok


def test_config_tile_autosize():
    cfg = EagleConfig()
    assert cfg.resolve_snp_tile(512, 10**9) % 128 == 0
    # small n → big tiles; big n → smaller tiles
    assert cfg.resolve_snp_tile(256, 10**9) > cfg.resolve_snp_tile(65536, 10**9)
    # explicit setting wins, clipped to p
    assert EagleConfig(snp_tile=256).resolve_snp_tile(4096, 10**9) == 256
    assert EagleConfig(snp_tile=512).resolve_snp_tile(4096, 128) == 128


def test_distributed_noop_without_env(monkeypatch):
    monkeypatch.delenv("EAGLE_COORD_ADDR", raising=False)
    assert distributed.maybe_initialize() is False
    assert distributed.is_host0() in (True, False)


def test_scan_logger_jsonl(tmp_path):
    path = str(tmp_path / "log.jsonl")
    lg = ScanLogger(quiet=True, jsonl_path=path)
    with Phase(lg, "work", items=500):
        pass
    lg.event("iteration", it=0, accepted=True)
    lg.close()
    recs = [json.loads(ln) for ln in open(path)]
    assert recs[0]["event"] == "phase" and "items_per_s" in recs[0]
    assert recs[1]["event"] == "iteration"


def test_scan_logger_numpy_fields(tmp_path):
    """numpy scalars (np.bool_ from bare comparisons, np.float64, arrays)
    must serialize — a 50k×1M scan died on exactly this (r3)."""
    import numpy as np

    path = str(tmp_path / "log.jsonl")
    lg = ScanLogger(quiet=True, jsonl_path=path)
    lg.event("iteration", it=np.int64(0),
             accepted=(np.float64(1.0) < np.float64(2.0)),
             extbic=np.float64(3.5), arr=np.arange(3))
    lg.close()
    rec = json.loads(open(path).read())
    assert rec["accepted"] is True and rec["extbic"] == 3.5
    assert rec["arr"] == [0, 1, 2]


def test_scan_logger_non_host0_writes_nothing(tmp_path):
    path = str(tmp_path / "log.jsonl")
    lg = ScanLogger(quiet=True, jsonl_path=path, is_host0=False)
    lg.event("iteration", it=0)
    lg.close()
    assert not os.path.exists(path)
