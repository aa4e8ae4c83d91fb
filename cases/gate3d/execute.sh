#!/bin/sh
python -m particlemethod_fsi_tpu.cli gate3d.data gate3d.grid 'gate3d%03d.prof' 'gate3d%03d.vtk' gate3d.log 4 --scene dam --rebuild-margin 0.5 --metrics gate3d_metrics.jsonl "$@"
