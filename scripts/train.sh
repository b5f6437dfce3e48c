#!/bin/bash
# usage: bash scripts/train.sh CONFIG [extra flags...]
# (reference scripts/train.sh pins CUDA_VISIBLE_DEVICES; TPU runs pick up the
# local chips automatically)
CONFIG=${1:?usage: train.sh CONFIG [flags]}
shift
python -m sola_tpu.cli.train --config "$CONFIG" "$@"
