#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli bar.data bar.grid 'bar%03d.prof' 'bar%03d.vtk' bar.log 4 --scene bar --apply-velocity-profile --metrics bar_metrics.jsonl "$@"
