#!/bin/sh
python -m particlemethod_fsi_tpu.cli dam.data dam.grid 'dam%03d.prof' 'dam%03d.vtk' dam.log 4 --scene dam --rebuild-margin 0.5 --metrics dam_metrics.jsonl "$@"
