#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
python -m particlemethod_fsi_tpu.cli gate.data gate.grid 'gate%03d.prof' 'gate%03d.vtk' gate.log 4 --scene dam --metrics gate_metrics.jsonl "$@"
