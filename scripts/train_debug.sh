#!/usr/bin/env bash
# 10-step/epoch smoke run (reference `debug: true` flag, train.py:168-170)
exec python train.py -c "${1:-configs/r50_baseline.yaml}" debug=true "${@:2}"
