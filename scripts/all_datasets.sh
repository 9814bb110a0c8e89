#!/usr/bin/env bash
# The five judged configs from BASELINE.json, end to end.
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${EPOCHS:-100}"

# 1. Euclidean baseline
python -m mvae_tpu.cli --dataset mnist --model e6 --epochs "$EPOCHS" "$@"
# 2. hyperbolic (both parameterizations), wrapped normal
python -m mvae_tpu.cli --dataset mnist --model h6 --epochs "$EPOCHS" "$@"
python -m mvae_tpu.cli --dataset mnist --model d6 --epochs "$EPOCHS" "$@"
# 3. spherical with vMF and wrapped posteriors
python -m mvae_tpu.cli --dataset mnist --model s6 --epochs "$EPOCHS" "$@"
python -m mvae_tpu.cli --dataset mnist --model s6:wrapped --epochs "$EPOCHS" "$@"
# 4. product manifold with learnable curvature, MNIST + Omniglot
python -m mvae_tpu.cli --dataset mnist --model h2,s2,e2 \
  --fixed_curvature false --epochs "$EPOCHS" "$@"
python -m mvae_tpu.cli --dataset omniglot --model h2,s2,e2 \
  --fixed_curvature false --epochs "$EPOCHS" "$@"
# 5. universal sign-agnostic curvature, conv VAE, CIFAR
python -m mvae_tpu.cli --dataset cifar --model u6 \
  --fixed_curvature false --epochs "$EPOCHS" "$@"
