#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli rolling.data rolling.grid 'rolling%03d.prof' 'rolling%03d.vtk' rolling.log 4 --scene rolling --rebuild-margin 0.5 --metrics rolling_metrics.jsonl "$@"
