#!/usr/bin/env python
"""Measure checkpoint save cost on the real chip (VERDICT r4 weak #2).

Builds a flagship-size TrainState (mybank vocab: 894,822-row item table x
emb 128, dense Adam -> params + mu + nu ~ 1.4 GB) and times save() and
save()+wait for each mode:

  sync full          — the pre-round-5 behavior (save blocks to completion)
  async full         — orbax async: save() returns after staging
  async bf16_moments — moments cast to bf16 (half the moment bytes)
  async params_only  — no optimizer state

Writes results/ckpt_cost.json. Run on the TPU chip (no flags needed); the
trainer consumes these via --checkpoint_async/--checkpoint_payload.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from amid_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from amid_tpu.train.steps import TrainState  # noqa: E402


def flagship_state() -> TrainState:
    # mybank vocab (config.REF_ITEM_LENGTH * 2 = 894,822 rows incl. pads)
    # x emb 128 — the dominant payload; small dense leaves alongside.
    key = jax.random.PRNGKey(0)
    params = {
        "item_embedding": {
            "table": jax.random.normal(key, (894822, 128), jnp.float32)
        },
        "head": {"w": jnp.zeros((128, 128), jnp.float32)},
    }
    tx = optax.adam(1e-3)
    return TrainState(params, tx.init(params), tx.init(params))


def time_mode(state: TrainState, async_save: bool, payload: str) -> dict:
    d = tempfile.mkdtemp(prefix="ckpt_cost_")
    try:
        mgr = CheckpointManager(d, keep=2, async_save=async_save,
                                payload=payload)
        # one warm-up save (directory creation, tracer caches)
        mgr.save(0, state)
        mgr.wait_until_finished()
        t0 = time.perf_counter()
        mgr.save(1, state)
        t_return = time.perf_counter() - t0
        mgr.wait_until_finished()
        t_total = time.perf_counter() - t0
        mgr.close()
        nbytes = sum(
            f.stat().st_size for f in Path(d).rglob("*") if f.is_file()
        )
        return {
            "save_return_s": round(t_return, 3),
            "save_total_s": round(t_total, 3),
            "dir_bytes": nbytes,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    state = flagship_state()
    n = sum(x.size for x in jax.tree_util.tree_leaves(state))
    print(f"state leaves: {n:,} elements "
          f"({n * 4 / 1e9:.2f} GB fp32)", flush=True)
    out = {"platform": jax.devices()[0].platform, "state_elements": int(n)}
    for name, async_save, payload in (
        ("sync_full", False, "full"),
        ("async_full", True, "full"),
        ("async_bf16_moments", True, "bf16_moments"),
        ("async_params_only", True, "params_only"),
    ):
        out[name] = time_mode(state, async_save, payload)
        print(f"{name}: {out[name]}", flush=True)
    Path("results").mkdir(exist_ok=True)
    Path("results/ckpt_cost.json").write_text(json.dumps(out, indent=1))
    print("wrote results/ckpt_cost.json", flush=True)


if __name__ == "__main__":
    main()
