"""Mesh construction and sharding helpers — the distributed layer.

Replaces the reference's NCCL/Lightning-DDP + torch.multiprocessing stack
(reference: src/config/diffsep/trainer/allgpus.yaml:7-8, src/utils/ddp.py,
src/utils/processing_pool.py) with the TPU-native model: one global
`jax.sharding.Mesh`, NamedSharding annotations on jitted functions, and
XLA-inserted collectives over ICI within a slice (DCN across slices).
There are no explicit collective calls anywhere in the framework — data
parallelism is expressed entirely through shardings on the batch axis.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host setup (`jax.distributed.initialize`). No-op single-host.

    The reference's equivalent is Lightning's DDP process launch + NCCL
    init; here every host runs the same program and XLA handles cross-host
    collectives over DCN.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(n_data: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Device mesh; 1-D data-parallel by default.

    The reference has only data parallelism (SURVEY section 2.11); extra
    axes exist for future tensor/sequence sharding. For a genuinely
    multi-axis layout pass ``shape`` explicitly (e.g.
    axis_names=('data', 'model'), shape=(4, 2) on 8 devices) — its
    product must cover the selected devices. Without ``shape``, all
    devices land on the FIRST axis and any extra axes have size 1 (a
    PartitionSpec over them is then a no-op by construction).
    """
    devs = jax.devices()
    if n_data is not None and shape is None:
        devs = devs[:n_data]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    else:
        if len(shape) != len(axis_names):
            raise ValueError(f"shape {shape} does not match axis_names "
                             f"{axis_names}")
        total = 1
        for d in shape:
            total *= d
        if total > n:
            raise ValueError(f"mesh shape {shape} needs {total} devices, "
                             f"only {n} available")
        devs = devs[:total]
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batched arrays with the batch axis sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def is_rank_zero() -> bool:
    """(reference: src/utils/ddp.py:4-10)."""
    return jax.process_index() == 0


def pad_batch_to_devices(batch, n_devices: int):
    """Pad the leading axis up to a multiple of the device count (static
    shapes require full batches on every chip); returns (batch, n_real)."""
    def pad(x):
        b = x.shape[0]
        rem = b % n_devices
        if rem == 0:
            return x
        reps = n_devices - rem
        return np.concatenate([x, np.repeat(x[-1:], reps, axis=0)], axis=0)

    leaves = jax.tree.leaves(batch)
    n_real = leaves[0].shape[0] if leaves else 0
    return jax.tree.map(pad, batch), n_real
