#!/bin/sh
python -m particlemethod_fsi_tpu.cli gate.data gate.grid 'gate%03d.prof' 'gate%03d.vtk' gate.log 4 --scene dam --metrics gate_metrics.jsonl "$@"
