"""Multi-host initialization (new subsystem; the reference is single-process,
SURVEY.md §2.5).

On a multi-host TPU slice each host runs the same program;
`initialize_distributed()` wires them into one JAX runtime
(jax.distributed.initialize — coordinator discovery is automatic on Cloud
TPU). The mesh helpers in parallel.mesh then span all hosts' devices:
`data` parallelism crosses hosts over DCN, while the `model` axis (embedding
row shards, whose mask-and-psum lookup is latency-sensitive) should stay
within a slice so its collectives ride ICI — `make_host_aligned_mesh` lays
devices out accordingly.

Per-host data: every process loads the same (seed-deterministic) dataset and
iterates the same global batch order; `put_global` assembles the global
sharded arrays by handing each process's addressable shards their slice of
the host copy (batch rows = the `host_local_slice` semantics; replicated and
model-sharded trees fall out of the same callback). The trainer
(train.loop.run_seed) runs unchanged across processes — proven by a full DR
epoch under 2 real gloo processes with metric parity vs single-process GSPMD
(tests/test_distributed.py::test_two_process_trainer_dr), including
model_axis=2 with the sharded-lookup collectives crossing the process
boundary.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from amid_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize; no-op for single process.

    MUST run before any other JAX call: touching a backend (even
    jax.process_count()) initializes it single-process, after which
    distributed init cannot take effect. Idempotence is therefore checked
    against the distributed client, not the backend."""
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if (
            coordinator_address is not None
            or num_processes is not None
            or process_id is not None
        ):
            # ANY explicit multi-process arg failing must surface —
            # swallowing it would leave N processes each training
            # independently into the same model_dir
            raise
        # auto-discovery unavailable — single-process environment
        pass


def make_host_aligned_mesh(model_axis: int = 1) -> Mesh:
    """Mesh whose `model` axis stays within each host's local devices (ICI)
    and `data` axis spans hosts (DCN)."""
    local = jax.local_device_count()
    if model_axis > local or local % model_axis != 0:
        raise ValueError(
            f"model_axis={model_axis} must divide local device count {local}"
        )
    devices = np.array(jax.devices()).reshape(
        jax.process_count() * (local // model_axis), model_axis
    )
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def host_local_slice(n_rows: int) -> tuple[int, int]:
    """This host's contiguous [start, end) row range of a global batch."""
    per = n_rows // jax.process_count()
    start = jax.process_index() * per
    return start, start + per


def put_global(tree, shardings):
    """device_put that also works across processes.

    Single-process: plain jax.device_put. Multi-process: every process holds
    an identical full host copy of each array (the trainer's loaders/init are
    deterministic per seed, so they do — train.loop), and
    jax.make_array_from_callback hands each process's addressable shards
    their slice of it. This covers every trainer sharding uniformly:
    replicated (full copy), batch P(data) (host-local rows — the
    host_local_slice semantics), and row-sharded tables P(model) even when
    the model axis crosses processes.

    `shardings` is a matching pytree of NamedShardings, or one sharding
    applied to every leaf."""
    import jax.sharding as jsh

    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    if isinstance(shardings, jsh.Sharding):
        shardings = jax.tree_util.tree_map(lambda _: shardings, tree)

    def one(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(one, tree, shardings)
