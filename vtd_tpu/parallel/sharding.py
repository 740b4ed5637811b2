"""Sharding rules for multi-chip execution.

The reference scales with Celery worker replicas and has no model/tensor
parallelism (SURVEY.md §2.3). The TPU-native design shards over a
(data, model) ``Mesh``:

  * **data** axis: frame/sample batches (leading dim). Gradients are
    reduced by XLA-inserted psums over ICI — the collective-comm
    equivalent of the reference's "N GPU workers each take a video".
  * **model** axis: tensor parallelism for wide parameters — any kernel
    whose output-channel (last) dim is divisible by the axis size and
    large enough to be worth splitting is sharded on that dim; XLA/GSPMD
    inserts the matching all-gathers/reduce-scatters.

These rules are deliberately simple and uniform: with jit +
NamedSharding inputs, GSPMD propagates layouts through the whole
program, so one annotation point (params + batch) suffices.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading-dim data parallelism for an ndim-array batch."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def _param_spec(path: str, x: Any, n_model: int, min_size: int) -> P:
    shape = getattr(x, "shape", ())
    if len(shape) == 0:
        return P()
    last = shape[-1]
    if (
        n_model > 1
        and last % n_model == 0
        and last >= min_size
        and np.prod(shape) >= min_size * min_size
    ):
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def infer_param_shardings(
    variables: Any, mesh: Mesh, min_size: int = 256
) -> Any:
    """Pytree of NamedShardings: wide kernels sharded over the model
    axis (output channels), everything else replicated."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    specs = []
    for path, leaf in flat:
        name = "/".join(str(p) for p in path)
        specs.append(NamedSharding(mesh, _param_spec(name, leaf, n_model, min_size)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_variables(variables: Any, mesh: Mesh, min_size: int = 256) -> Any:
    """Place a variables pytree onto the mesh per infer_param_shardings."""
    shardings = infer_param_shardings(variables, mesh, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), variables, shardings
    )
