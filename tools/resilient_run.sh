#!/bin/bash
# Restart-on-failure wrapper around a case's execute.sh: if the solver exits
# nonzero (e.g. the axon tunnel's intermittent UNAVAILABLE device errors --
# see BASELINE.md "1M-particle Turek-Hron"), resume from the newest .prof
# snapshot (the reference's restart contract: any .prof is a valid grid
# argument, src/main.cpp:788-955) and keep going, up to MAX_RETRIES.
#
# Usage: tools/resilient_run.sh <case_dir> [extra execute.sh args...]
set -u
CASE_DIR=$1; shift
MAX_RETRIES=${MAX_RETRIES:-5}
cd "$CASE_DIR" || exit 1
STEM=$(basename "$(ls *.data | head -1)" .data)

try=0
args=("$@")
while :; do
    newest=$(ls -t "${STEM}"[0-9]*.prof 2>/dev/null | head -1)
    if [ -n "${newest:-}" ] && [ "$try" -gt 0 ]; then
        echo "[resilient] retry $try: restarting from $newest"
        ./execute.sh --restart-grid "$newest" "${args[@]}" && exit 0
    else
        ./execute.sh "${args[@]}" && exit 0
    fi
    rc=$?
    try=$((try + 1))
    if [ "$try" -gt "$MAX_RETRIES" ]; then
        echo "[resilient] giving up after $MAX_RETRIES retries (rc=$rc)"
        exit "$rc"
    fi
    sleep 30  # let a wedged device tunnel settle (observed after kills)
done
