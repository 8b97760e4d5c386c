"""Device mesh and sharding utilities - the framework's entire "distributed
backend".

The reference's distributed layer is one process per GPU with NCCL DDP
(mp.spawn src/main.py:501, init_process_group :72-73, apex DDP :148,
DistributedSampler :83-87). Here the same data parallelism is a mesh +
sharding declaration: batches are sharded over the 'data' axis, parameters
are replicated, and GSPMD emits the gradient all-reduce and cross-replica
BatchNorm reductions over ICI automatically. Multi-host extends this with
``jax.distributed.initialize()`` - no user-visible communication code.

A 'model' axis is provisioned for tensor-parallel sharding of oversized
backbones (not required for parity - Swin-L fits on one chip).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: Optional[str], n_devices: int) -> Dict[str, int]:
    """Parse "data:4,model:2" into an axis dict; default all-data."""
    if not spec:
        return {"data": n_devices}
    axes = {}
    for part in spec.split(","):
        name, size = part.split(":")
        axes[name.strip()] = int(size)
    total = int(np.prod(list(axes.values())))
    if total != n_devices:
        raise ValueError(f"mesh {axes} needs {total} devices, have {n_devices}")
    return axes


def create_mesh(
    mesh_shape: Optional[str] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_shape(mesh_shape, len(devices))
    dev_array = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded along 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim > 0 else x,
        batch,
    )


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host runtime init — the TPU-native replacement for the
    reference's NCCL env-var rendezvous (src/main.py:6-7,72-73). On TPU pods
    all arguments are auto-detected from the environment; on other platforms
    pass them explicitly. Safe to call when already initialised."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialised (or single-process run)
        if "already" not in str(e).lower():
            raise


def process_info() -> Dict[str, int]:
    """Host-sharding identity for the input pipeline (the DistributedSampler
    rank/world_size equivalent)."""
    import jax

    return {"host_index": jax.process_index(), "host_count": jax.process_count()}


def state_sharding(state, mesh: Mesh, min_size: int = 2**16):
    """Tensor-parallel sharding rules for a TrainState over a mesh with a
    'model' axis: large parameters (>= min_size elements) whose trailing
    (output-feature) dimension divides the model-axis size are sharded on it;
    everything else (and the whole state when the mesh is data-only) is
    replicated. GSPMD then inserts the TP collectives — this framework never
    writes them by hand (the reference has no TP at all, SURVEY.md 2.5)."""
    import jax

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_size = axes.get("model", 1)

    def spec(x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, state)
