#!/usr/bin/env bash
# Cold-cache CI lane: run the fast suite WITHOUT the persistent XLA
# compile cache (and with the native kernel rebuilt from source), so the
# suite's stability never silently depends on tests/conftest.py's
# cache-stamping scheme or a stale committed binary.
set -euo pipefail
cd "$(dirname "$0")/../.."
rm -f llavamod_tpu/native/libimageprep-*.so
LLAVAMOD_TEST_NO_COMPILE_CACHE=1 python -m pytest tests/ -x -q -m 'not slow' "$@"
