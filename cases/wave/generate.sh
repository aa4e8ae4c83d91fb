#!/bin/sh
python generate.py --scale "${WAVE_SCALE:-0.2}"
