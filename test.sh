#!/usr/bin/env bash
# Evaluation launch (reference test.sh analogue).
#   usage: ./test.sh <config> <checkpoint.npz> --backbone <converted.npz> [args...]
set -e
exec python tools/test.py "$@"
