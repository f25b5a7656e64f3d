"""Device mesh setup and sharding rules.

The reference's only distribution is Lightning DDP data-parallelism over NCCL
(infer_one_shot.py:638; SURVEY.md §2.7). The TPU-native design is a 2D
``Mesh(("data", "model"))``:

- ``data``: batch/frames (DCN-friendly axis across hosts)
- ``model``: the Gaussian/primitive axis within a host (ICI): point features,
  interaction attention sequence, and rasterizer pair lists shard here; XLA
  inserts the all-gathers / reduce-scatters (collectives ride ICI), and
  parameter gradients are psum-reduced over both axes overlapped with the
  backward pass by the XLA latency-hiding scheduler.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: single jax.distributed.initialize call (the TPU
    counterpart of the reference's RANK/LOCAL_RANK env sniffing,
    tgs/utils/misc.py:14-22 — on TPU pods jax discovers topology itself)."""
    import jax

    kwargs = {}
    if coordinator:
        kwargs = {"coordinator_address": coordinator,
                  "num_processes": num_processes, "process_id": process_id}
    jax.distributed.initialize(**kwargs)


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = 1, n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# --- explicit-exchange context -------------------------------------------
# The renderer lives deep inside the flax model and cannot take a Mesh
# argument through the batch; the sharded fit step publishes its mesh here
# (trace-time context, captured into the jitted computation) and the
# renderer opts in via RendererConfig.sharded_exchange. The stack is
# thread-local: a retrace from another thread must not observe (or mutate)
# this thread's exchange context.
import threading

_EXCHANGE_TLS = threading.local()


def _stack() -> list:
    if not hasattr(_EXCHANGE_TLS, "stack"):
        _EXCHANGE_TLS.stack = [None]
    return _EXCHANGE_TLS.stack


def exchange_mesh() -> Optional[Mesh]:
    return _stack()[-1]


class use_exchange_mesh:
    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        _stack().append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _stack().pop()
        return False


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, points_axis: Optional[int] = None
                   ) -> NamedSharding:
    """Shard axis 0 over data; optionally shard ``points_axis`` over model."""
    spec = [None] * ndim
    spec[0] = "data"
    if points_axis is not None:
        spec[points_axis] = "model"
    return NamedSharding(mesh, P(*spec))
