#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli gate3d.data gate3d.grid 'gate3d%03d.prof' 'gate3d%03d.vtk' gate3d.log 4 --scene dam --rebuild-margin 0.5 --metrics gate3d_metrics.jsonl "$@"
