#!/usr/bin/env bash
# Single-host training launch (reference train.sh analogue).
#   usage: ./train.sh <config> [args...]
set -e
exec python tools/train.py "$@"
