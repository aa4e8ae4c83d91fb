#!/bin/sh
# repo root on sys.path so the scripts run standalone (package is not pip-installed)
PYTHONPATH="$(cd "$(dirname "$0")/../.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"; export PYTHONPATH
# single chip:   ./execute.sh
# multi-chip:    ./execute.sh --mesh 8 --mode halo          (pod slice)
# virtual test:  ./execute.sh --mesh 8 --mode halo --host-devices 8
python -m particlemethod_fsi_tpu.cli wave.data wave.grid 'wave%03d.prof' 'wave%03d.vtk' wave.log 4 --scene dam --rebuild-margin 0.5 --metrics wave_metrics.jsonl "$@"
