#!/usr/bin/env bash
# Multi-host training launch (the torch.distributed.launch analogue,
# reference tools/dist_train.sh). On TPU pods, run this once per host; jax
# discovers the pod topology from the environment.
#   usage: tools/dist_train.sh <config> [train.py args...]
set -e
CONFIG=$1; shift
exec python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
