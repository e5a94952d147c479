"""SPMD context: lets model-internal ops know they are running inside a
shard_map region and which mesh axes to use for collectives.

The model code (embedding lookup, InnerComp/InterComp peer banks) is written
once; under plain jit it sees global arrays and GSPMD partitions it, while
inside `parallel.spmd.make_spmd_train_step`'s shard_map the context makes
the same code issue explicit collectives:

* embedding lookup -> mask-and-psum over the `model` axis
  (parallel.embedding.sharded_lookup),
* peer message passing -> all_gather of the per-shard peer bank over the
  `data` axis (the batch-axis analogue of sequence-parallel attention,
  SURVEY.md §2.5).
"""

from __future__ import annotations

import contextlib
import contextvars
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class SpmdAxes:
    data_axis: str = "data"
    model_axis: str = "model"
    model_shards: int = 1
    data_shards: int = 1


_ctx: contextvars.ContextVar[Optional[SpmdAxes]] = contextvars.ContextVar(
    "amid_spmd_axes", default=None
)


def current() -> Optional[SpmdAxes]:
    return _ctx.get()


@contextlib.contextmanager
def spmd(axes: SpmdAxes):
    token = _ctx.set(axes)
    try:
        yield
    finally:
        _ctx.reset(token)


# ---- lazy-rows redirection (train.lazy: sparse table updates) ----------
# Holds (sorted_unique_ids [U], gathered_rows [U, D]); embedding lookups
# inside the region index the gathered rows (searchsorted) instead of the
# full table, so the table gradient is never materialized.

_lazy: contextvars.ContextVar = contextvars.ContextVar(
    "amid_lazy_rows", default=None
)


def current_lazy():
    return _lazy.get()


@contextlib.contextmanager
def lazy_rows(uids, rows):
    token = _lazy.set((uids, rows))
    try:
        yield
    finally:
        _lazy.reset(token)
