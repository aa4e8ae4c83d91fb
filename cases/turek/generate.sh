#!/bin/sh
python generate.py
