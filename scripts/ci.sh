#!/usr/bin/env bash
# CI entry (SURVEY.md §8 Phase 6): full test suite on the virtual CPU mesh,
# native-ingest ThreadSanitizer check, bench harness smoke.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== pytest (8-virtual-device CPU mesh) ==="
python -m pytest tests/ -q

echo "=== native ingest TSAN ==="
make -C eagleeverything_tpu/io/native tsan

echo "=== bench smoke (backend: whatever is available) ==="
python bench.py --quick || echo "bench smoke failed (device unavailable) — non-fatal"

echo "CI OK"
