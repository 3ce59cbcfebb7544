#!/usr/bin/env bash
# Zero-decision real-FID one-shot (VERDICT r2 task 3).
#
# The single command between "assets arrive" and "FID vs the reference's
# 3.5" (/root/reference/examples/images/cifar10/README.md:3,14, protocol
# compute_fid.py:30-109):
#
#   tools/fid_real.sh <pt_inception-2015-12-05.pth> <cifar_data_dir> [model]
#
#   <pt_inception-...>.pth : the pytorch-fid Inception checkpoint
#                            (state_dict; mirrors.github/pt_inception-2015-12-05-6726825d.pth)
#   <cifar_data_dir>       : directory containing cifar-10-batches-py/
#   [model]                : otcfm (default) | icfm | fm | si
#
# Steps (all automatic, idempotent):
#   1. Port the torch state_dict -> flax npz (skipped if already ported).
#   2. Run the 50k legacy-TF protocol against the latest checkpoint under
#      results/checkpoints/cifar10_<model>: dopri5 atol=rtol=1e-5, uint8
#      quantization, full train-split reference statistics.
#
# Extra compute_fid.py flags (e.g. --step 400000, --num_gen 10000) can be
# appended after [model]. FID_REHEARSAL_ARGS is prepended for the dress-
# rehearsal test (tests/test_fid.py) so the test drives the IDENTICAL path.
set -euo pipefail

WEIGHTS_PTH=${1:?usage: tools/fid_real.sh <inception_weights.pth> <cifar_dir> [model] [extra compute_fid args...]}
CIFAR_DIR=${2:?usage: tools/fid_real.sh <inception_weights.pth> <cifar_dir> [model] [extra compute_fid args...]}
MODEL=${3:-otcfm}
shift $(( $# > 3 ? 3 : $# ))

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)
PYTHON=${PYTHON:-$(command -v python3 || command -v python)}
NPZ="${WEIGHTS_PTH%.pth}.ported.npz"

if [ ! -f "$NPZ" ]; then
  echo "[fid_real] porting $WEIGHTS_PTH -> $NPZ"
  REPO_DIR="$REPO_DIR" "$PYTHON" - "$WEIGHTS_PTH" "$NPZ" <<'PY'
import os
import sys

import torch

sys.path.insert(0, os.environ["REPO_DIR"])
from cfm_tpu.eval.inception import port_torch_inception_weights

obj = torch.load(sys.argv[1], map_location="cpu", weights_only=False)
state = obj.state_dict() if hasattr(obj, "state_dict") else obj
port_torch_inception_weights(state, sys.argv[2])
print(f"[fid_real] ported {len(state)} tensors")
PY
else
  echo "[fid_real] reusing ported weights $NPZ"
fi

export CFM_TPU_INCEPTION_WEIGHTS="$NPZ"
# shellcheck disable=SC2086
exec "$PYTHON" "$REPO_DIR/examples/compute_fid.py" \
  --model "$MODEL" \
  --data_dir "$CIFAR_DIR" \
  --integration_method dopri5 \
  --mode legacy_tensorflow \
  --num_gen 50000 \
  ${FID_REHEARSAL_ARGS:-} \
  "$@"
