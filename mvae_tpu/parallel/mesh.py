"""Device mesh + sharding layout (new design — the reference is single-device).

The reference (oskopek/mvae) has no parallelism of any kind (SURVEY.md §2:
no torch.distributed/NCCL anywhere); this module is the TPU-native scaling
surface the rebuild adds: a ("data", "model") mesh over ICI,

* batch axis sharded over "data" (pure DP — the workload's natural axis);
* the wide encoder/decoder GEMMs sharded over "model" (hidden dimension for
  MLP weights, output channels for conv kernels) — tensor parallelism that
  XLA turns into all-gather/reduce-scatter collectives on ICI via sharding
  propagation, no hand-written collectives needed;
* everything small (component heads, biases, curvature scalars) replicated.

Gradient reduction over "data" is likewise inserted by XLA (the params are
replicated, so dL/dparams contracts the sharded batch axis -> psum on ICI).
One jitted train step covers any mesh shape, including 1x1 (single chip).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}")
    dev_array = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, leaf) -> P:
    """Model-parallel layout: shard the wide hidden dimension."""
    if leaf.ndim == 2:
        # Linear kernels (in, out): encoder hidden out / decoder hidden in
        if "encoder" in path and "w" in path:
            return P(None, "model")
        if "decoder" in path and "w" in path:
            # fc layers into/out of the hidden dim: shard hidden side
            return P("model", None) if path.endswith("out/w") else P(
                None, "model")
    if leaf.ndim == 4 and "conv" in path:  # HWIO kernels: shard out channels
        return P(None, None, None, "model")
    return P()


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for the model params."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in kp)

    specs = {path_str(kp): _spec_for_param(path_str(kp), leaf)
             for kp, leaf in flat}

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh))
