#!/usr/bin/env bash
# Reproduce the ICLR'20 MNIST marginal-LL table (IWAE-500): all dim-6
# latent geometries, fixed and learnable curvature.
# Parity with the reference's scripts/ experiment grids (SURVEY.md §2).
#
# Usage: scripts/mnist_table.sh [extra cli flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-100}"
SEED="${SEED:-42}"

MODELS=(
  e6
  h6 d6
  s6 s6:wrapped p6
  u6
  "h2,s2,e2"
  2h3 3h2 2s3 3s2
  "h2,e2,s2"
)

for model in "${MODELS[@]}"; do
  for fixed in true false; do
    # euclidean has no curvature to learn
    if [[ "$model" == e6 && "$fixed" == false ]]; then continue; fi
    echo "=== dataset=mnist model=$model fixed_curvature=$fixed"
    python -m mvae_tpu.cli --dataset mnist --model "$model" \
      --fixed_curvature "$fixed" --epochs "$EPOCHS" --seed "$SEED" \
      --likelihood_n 500 "$@"
  done
done
