#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli dam.data dam.grid 'dam%03d.prof' 'dam%03d.vtk' dam.log 4 --scene dam --rebuild-margin 0.5 --metrics dam_metrics.jsonl "$@"
