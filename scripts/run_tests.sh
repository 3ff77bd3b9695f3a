#!/bin/bash
# Crash-isolated test policy for the 1-CPU host (CLAUDE.md "KNOWN FLAKE"):
# the 8-virtual-device CPU backend can SIGABRT under contention, killing
# the whole pytest process. Run the bulk of the suite first, then the
# mesh-heavy modules in their own process; retry the mesh group once if
# it dies with a signal (rc >= 128) rather than a test failure.
set -u
cd "$(dirname "$0")/.."

# any future SIGABRT dumps the Python stacks of all threads — the
# round-2/3 flake investigation's standing instrumentation
export PYTHONFAULTHANDLER=1

python -m pytest tests/ -m "not mesh" -q "$@"
rc_bulk=$?

python -m pytest tests/ -m mesh -q "$@"
rc_mesh=$?
if [ "$rc_mesh" -ge 128 ]; then
    echo "[run_tests] mesh group crashed (rc=$rc_mesh; known contention" \
         "flake) - retrying once" >&2
    python -m pytest tests/ -m mesh -q "$@"
    rc_mesh=$?
fi

[ "$rc_bulk" -eq 0 ] && [ "$rc_mesh" -eq 0 ]
