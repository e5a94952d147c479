"""Device-mesh construction and sharding rules.

The reference is single-process single-GPU (SURVEY.md §2.5); parallelism is a
new, first-class subsystem here. Axes:

* ``data``  — batch-parallel axis. Batches are sharded over it; gradients are
  reduced by XLA-inserted psums. InnerComp/InterComp contract over the
  *global* batch, so GSPMD inserts an all-gather of the per-shard peer banks
  over this axis (the batch-axis analogue of ring/Ulysses attention for this
  workload).
* ``model`` — embedding-table axis. Item tables are row-sharded over it
  (amid_tpu.parallel.embedding).

Shardings lay out so collectives ride ICI within a slice; DCN would only
carry the data axis across slices (jax.distributed multi-host init).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from amid_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    # Fully explicit axes may use a SUBSET of the visible devices (e.g. a
    # 1x1 mesh on an 8-device host — used by the shard_map-vs-plain parity
    # test, or pinning a job to part of a slice). NOT under multi-process:
    # a mesh that excludes some processes' devices would leave those
    # processes executing programs they hold no shards of (hang/failure,
    # not a clear error) — every process must participate.
    if cfg.data_axis > 0 and cfg.model_axis > 0:
        need = cfg.data_axis * cfg.model_axis
        if need < len(devices) and jax.process_count() > 1:
            raise ValueError(
                f"explicit mesh {cfg.data_axis}x{cfg.model_axis} covers "
                f"{need} of {len(devices)} global devices; multi-process "
                "runs must use all devices (every process participates)"
            )
        if need <= len(devices):
            devices = devices[:need]
    data, model = cfg.axis_sizes(len(devices))
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded embedding table over `model`."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def _path_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
    return "/".join(parts)


def param_shardings(mesh: Mesh, tree) -> object:
    """Sharding pytree for a param (or optimizer-state) tree: embedding
    tables — any 2-D leaf under an 'item_embedding' key, including the Adam
    mu/nu moments that mirror it — row-sharded over `model`, everything else
    replicated."""

    def rule(path, x):
        if "item_embedding" in _path_name(path) and getattr(x, "ndim", 0) == 2:
            return table_sharding(mesh)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, tree)


def state_shardings(mesh: Mesh, state) -> object:
    """Sharding tree for a full TrainState (train.steps / train.lazy):
    params + dense optax moments via param_shardings; a LazyTableState's
    per-row mu/nu follow the table (row-sharded over `model`), its step
    count replicated."""
    from amid_tpu.train.lazy import LazyTableState
    from amid_tpu.train.steps import TrainState

    def opt_sh(opt):
        if opt is None:
            return None
        if isinstance(opt, LazyTableState):
            return LazyTableState(
                dense_opt=param_shardings(mesh, opt.dense_opt),
                mu=table_sharding(mesh),
                nu=table_sharding(mesh),
                count=replicated(mesh),
            )
        return param_shardings(mesh, opt)

    return TrainState(
        param_shardings(mesh, state.params),
        opt_sh(state.opt_state),
        opt_sh(state.opt_state2),
    )
