#!/bin/sh
python -m particlemethod_fsi_tpu.generator ./gate3d
