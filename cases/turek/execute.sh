#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli turek.data turek.grid 'turek%03d.prof' 'turek%03d.vtk' turek.log 4 --scene turek_hron --rebuild-margin 1.0 --metrics turek_metrics.jsonl "$@"
