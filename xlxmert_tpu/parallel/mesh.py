"""Device mesh + sharding helpers.

Replaces the reference's NCCL DDP substrate (lxmert_pretrain.py:694-700,
102-106; utils.py:11-39): one jitted SPMD program over a `jax.sharding.Mesh`
instead of process-per-GPU + explicit all-reduce/barriers. Gradients and
metrics are averaged by XLA-inserted collectives over the ICI `data` axis;
program order replaces every `dist.barrier()`.

The mesh is N-D by design: the default is a 1-D ("data",) mesh (the model
is ~240M params — DP is the right strategy, SURVEY.md §2.4), but callers
may request ("data", "model") shapes for layer-sharded variants.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host init over DCN (replaces the reference's fixed
    tcp://127.0.0.1:9000 NCCL rendezvous, lxmert_pretrain.py:694-700).

    On Cloud TPU pods, `jax.distributed.initialize()` auto-discovers the
    coordinator from the TPU metadata; explicit args cover bare-metal
    clusters. With no args, failures are swallowed (single-process
    environment); with EXPLICIT args, a failed rendezvous raises — a
    silent fall-back to process_count()==1 would make every host train
    the full data independently and race on the output dir."""
    import jax

    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # already initialized or single-process environment
    else:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_CLUSTER",
    # standard single-slice Cloud TPU pod launches set these (and none
    # of the above): the libtpu-injected worker topology
    "TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES",
)


def maybe_initialize_multihost() -> None:
    """Called by every training CLI before touching jax.devices():
    initializes jax.distributed only when the environment looks like a
    multi-process launch (cluster / TPU-pod env vars, SLURM with >1
    tasks, or XLXMERT_MULTIHOST=1 to force), so local/single-chip runs
    pay nothing and pod launches don't silently run N duplicate
    single-process jobs."""
    import os

    if os.environ.get("XLXMERT_MULTIHOST"):
        initialize_multihost()
        return
    if any(os.environ.get(v) for v in _CLUSTER_ENV_VARS):
        initialize_multihost()
        return
    if int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1:
        initialize_multihost()


def make_mesh(shape: Tuple[int, ...] = (),
              axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh. Empty `shape` puts every device on the first axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, process_local: Optional[bool] = None):
    """Place a host batch (dict of arrays) onto the mesh, sharded along
    `data`. Replaces DistributedSampler (lxmert_data.py:663-667) + per-rank
    H2D copies.

    Single-process: `batch` is the global batch; leaves are device_put
    with a batch-dim NamedSharding.

    Multi-host (`jax.process_count() > 1`, or `process_local=True`): each
    host passes only ITS slice of the global batch — what its
    `dataset.shard(process_index, process_count)`-ed loader yields, the
    same per-rank contract as the reference's DistributedSampler — and the
    global jax.Array is assembled from the process-local shards via
    `jax.make_array_from_process_local_data` (no host ever materializes
    the full batch). The global batch is therefore
    `local_batch * process_count`, matching the reference's per-rank
    `--batchSize` semantics (lxmert_pretrain.py:743-755).
    """
    if process_local is None:
        process_local = jax.process_count() > 1
    sh = data_sharding(mesh)
    leaves = jax.tree.leaves(batch)

    if process_local:
        n_proc = jax.process_count()
        if mesh.shape["data"] % n_proc:
            raise ValueError(
                f"data axis ({mesh.shape['data']} devices) must be "
                f"divisible by the process count ({n_proc}) so each host "
                f"owns an equal device slice")
        local_devices = mesh.shape["data"] // n_proc
        if leaves and leaves[0].shape[0] % local_devices:
            raise ValueError(
                f"per-host batch size {leaves[0].shape[0]} must be divisible "
                f"by the {local_devices} local devices on the data axis")

        def put(x):
            global_shape = (x.shape[0] * n_proc,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sh, x, global_shape)

        return jax.tree.map(put, batch)

    n_data = mesh.shape["data"]
    if leaves and leaves[0].shape[0] % n_data:
        raise ValueError(
            f"global batch size {leaves[0].shape[0]} must be divisible by "
            f"the data-axis size {n_data} (devices in the mesh); "
            f"pick --batchSize as a multiple of {n_data}")
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate params/opt state across the mesh (pure DP)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
