"""Device mesh + sharding rules.

Layout policy (SURVEY.md §2.2):
  * batch arrays: rows over 'data' (pure DP; grads psum'd implicitly by XLA
    from the sharded-input jit);
  * encoder tower params: replicated (they're small — hidden ≤ a few
    hundred; TP would only add latency);
  * the big matrices — the learned target table (source-encoder-only mode)
    and the built embedding index — row-sharded over 'model' so the
    per-step full-softmax matmul and the serving matmul both run as
    shard-local MXU work + one small collective.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh. data=-1 → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        devices = devices[: data * model]
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((data, model), devices=devices)
    except Exception:  # non-TPU topologies (cpu fakes): plain reshape
        arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def index_sharding(mesh: Mesh, over: str = "model") -> NamedSharding:
    """Index / target-table rows over a mesh axis."""
    return NamedSharding(mesh, P(over))


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Sharding pytree for model params: target_table rows over 'model',
    everything else replicated."""
    rep = replicated(mesh)
    table = NamedSharding(mesh, P("model", None))

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return table if "target_table" in names else rep

    return jax.tree_util.tree_map_with_path(rule, params)
