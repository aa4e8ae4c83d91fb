#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli hydro.data hydro.grid 'hydro%03d.prof' 'hydro%03d.vtk' hydro.log 4 --scene hydroelastic --rebuild-margin 0.5 --metrics hydro_metrics.jsonl "$@"
