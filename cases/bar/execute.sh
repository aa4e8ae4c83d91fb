#!/bin/sh
python -m particlemethod_fsi_tpu.cli bar.data bar.grid 'bar%03d.prof' 'bar%03d.vtk' bar.log 4 --scene bar --apply-velocity-profile --metrics bar_metrics.jsonl "$@"
