"""NaN-policy failure detection in the train loop."""

import logging

import pytest

from amid_tpu.config import TrainConfig
from amid_tpu.train.loop import NonFiniteLossError, _handle_nan


class _FakeCkpt:
    def __init__(self, restored):
        self._restored = restored
        self.restore_calls = 0

    def restore(self, state):
        self.restore_calls += 1
        return self._restored

    def latest_step(self):
        return 7


def test_halt_policy_raises():
    cfg = TrainConfig(nan_policy="halt")
    with pytest.raises(NonFiniteLossError):
        _handle_nan(cfg, logging.getLogger(), None, "state", 3, 10)


def test_restore_policy_rolls_back():
    cfg = TrainConfig(nan_policy="restore")
    ckpt = _FakeCkpt(restored="restored-state")
    out = _handle_nan(cfg, logging.getLogger(), ckpt, "state", 3, 10)
    assert out == "restored-state"
    assert ckpt.restore_calls == 1


def test_restore_policy_without_checkpoint_continues():
    cfg = TrainConfig(nan_policy="restore")
    out = _handle_nan(cfg, logging.getLogger(), None, "state", 3, 10)
    assert out == "state"


def test_ignore_policy_continues():
    cfg = TrainConfig(nan_policy="ignore")
    ckpt = _FakeCkpt(restored="restored-state")
    out = _handle_nan(cfg, logging.getLogger(), ckpt, "state", 0, 0)
    assert out == "state"
    assert ckpt.restore_calls == 0


def test_nan_at_non_log_step_triggers_policy(tmp_path, rng, monkeypatch):
    """A NaN at a step that is NOT a log step must still trip the policy:
    every step ORs its on-device `nonfinite` flag into a latch that the loop
    fetches at log cadence and at epoch end (VERDICT r1 weak #3)."""
    import jax.numpy as jnp

    import amid_tpu.train.loop as loop_mod
    from amid_tpu.train.loop import run_seed
    from amid_tpu.train.steps import make_train_step as real_make
    from test_train_smoke import _cfg, synth_dataset

    def patched_make(*a, **k):
        real = real_make(*a, **k)
        count = {"i": 0}

        def step(state, batch, pools, pool_sizes, key):
            state, m = real(state, batch, pools, pool_sizes, key)
            count["i"] += 1
            if count["i"] == 3:  # log_every=20 -> step 3 is never a log step
                m = dict(m)
                m["loss"] = jnp.float32(jnp.nan)
                m["nonfinite"] = jnp.float32(1.0)
            return state, m

        return step

    monkeypatch.setattr(loop_mod, "make_train_step", patched_make)
    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    cfg = _cfg(tmp_path)
    cfg.nan_policy = "halt"
    cfg.log_every = 20
    # per-step injection counts host CALLS — that is the per-step loop's
    # dispatch model; the scanned path traces the step once (its latch is
    # covered by test_nan_policy_triggers_on_fast_train_path below)
    cfg.fast_train = False
    with pytest.raises(NonFiniteLossError):
        run_seed(cfg, seed=0, train_ds=train, val_ds=val)


def test_nan_policy_triggers_on_fast_train_path(tmp_path, rng, monkeypatch):
    """fast_train covers the same policy: the chunk runner returns the max
    of every scanned step's on-device `nonfinite` flag and _run_chunked
    trips the policy at the chunk boundary (the loop path's log-step
    check). Per-host-call injection can't reach inside lax.scan, so inject
    at the runner layer: OR a nonfinite flag in whenever the chunk's
    traced global-index vector covers step 3 — equivalent to step 3's
    on-device flag latching."""
    import jax.numpy as jnp

    import amid_tpu.train.loop as loop_mod
    from amid_tpu.train.loop import run_seed
    from amid_tpu.train.steps import (
        make_resident_chunk_runner as real_make_runner,
    )
    from test_train_smoke import _cfg, synth_dataset

    def patched_make_runner(step, batch_size, **kw):
        real_runner = real_make_runner(step, batch_size, **kw)

        def runner(state, arrays, perm, pools, pool_sizes, base_key,
                   kidxs, bidxs):
            state, m0, nf = real_runner(
                state, arrays, perm, pools, pool_sizes, base_key,
                kidxs, bidxs)
            hit = jnp.any(kidxs == 3).astype(jnp.float32)
            return state, m0, jnp.maximum(nf, hit)

        return runner

    monkeypatch.setattr(
        loop_mod, "make_resident_chunk_runner", patched_make_runner)
    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    cfg = _cfg(tmp_path)
    cfg.nan_policy = "halt"
    cfg.log_every = 20  # step 3 is mid-chunk, never a chunk boundary itself
    assert cfg.fast_train
    with pytest.raises(NonFiniteLossError):
        run_seed(cfg, seed=0, train_ds=train, val_ds=val)
