"""Checkpoint save/restore round-trip and resume-from-epoch semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from amid_tpu.train.checkpoint import CheckpointManager
from amid_tpu.train.steps import TrainState


def _state(rng, seed_val=0.0):
    params = {
        "w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)) + seed_val,
        "b": jnp.asarray(rng.normal(size=(4,)).astype(np.float32)),
    }
    tx = optax.adam(1e-3)
    return TrainState(params, tx.init(params), None)


def test_checkpoint_roundtrip(tmp_path, rng):
    state = _state(rng)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    mgr.save(3, state)
    assert mgr.latest_step() == 3

    blank = _state(rng, seed_val=99.0)
    restored = mgr.restore(blank)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    # optimizer moments restored too
    got_mu = jax.tree_util.tree_leaves(restored.opt_state)
    want_mu = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(got_mu, want_mu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_empty_returns_none(tmp_path, rng):
    mgr = CheckpointManager(str(tmp_path / "empty"), keep=1)
    assert mgr.restore(_state(rng)) is None
    mgr.close()


def test_resume_continues_training(tmp_path, rng):
    """run_seed with resume=True picks up at latest_step + 1."""
    from amid_tpu.config import DataConfig, ModelConfig, TrainConfig
    from amid_tpu.train.loop import run_seed
    from tests.test_train_smoke import synth_dataset

    train = synth_dataset(rng, n_rows=32)
    val = synth_dataset(rng, n_rows=16)
    model = ModelConfig(
        backbone="gru4rec", emb_dim=8, hid_dim=4, seq_len=6, batch_size=8,
        item_length=90, user_length=90, kernels="xla",
    )
    cfg = TrainConfig(
        epochs=1, lr=1e-3, seeds=1, model_dir=str(tmp_path),
        checkpoint=True, model=model, data=DataConfig(neg_nums=5),
    )
    run_seed(cfg, seed=0, train_ds=train, val_ds=val)

    cfg2 = TrainConfig(
        epochs=2, lr=1e-3, seeds=1, model_dir=str(tmp_path),
        checkpoint=True, resume=True, model=model, data=DataConfig(neg_nums=5),
    )
    best = run_seed(cfg2, seed=0, train_ds=train, val_ds=val)
    assert "mrr_d1" in best
    # first run saved epoch 0; resume must start at 1 (step 0 is falsy —
    # regression guard for the `latest_step() or -1` bug)
    assert best["start_epoch"] == 1.0


def test_lazy_state_roundtrip(tmp_path, rng):
    """LazyTableState (incl. the DR second moment slot) survives orbax
    save/restore — NamedTuple opt states restore into the same structure."""
    import optax

    from amid_tpu.train.lazy import init_lazy_state

    params = {
        "item_embedding": jnp.asarray(
            rng.normal(size=(16, 4)).astype(np.float32)
        ),
        "w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
    }
    state = init_lazy_state(params, optax.adam(1e-3), optax.adam(1e-4))
    state = state._replace(
        opt_state=state.opt_state._replace(
            mu=state.opt_state.mu + 1.5,
            count=jnp.asarray(7, jnp.int32),
        )
    )
    mgr = CheckpointManager(str(tmp_path / "lz"), keep=1)
    mgr.save(5, state)

    blank = init_lazy_state(
        {k: v * 0 for k, v in params.items()}, optax.adam(1e-3),
        optax.adam(1e-4),
    )
    restored = mgr.restore(blank)
    np.testing.assert_array_equal(
        np.asarray(restored.opt_state.mu), np.asarray(state.opt_state.mu)
    )
    assert int(restored.opt_state.count) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["item_embedding"]),
        np.asarray(state.params["item_embedding"]),
    )
    assert restored.opt_state2 is not None
    mgr.close()


def test_async_roundtrip(tmp_path, rng):
    """async_save: save() returns immediately; restore() waits for the
    in-flight write (the NaN-rollback path relies on this)."""
    state = _state(rng)
    mgr = CheckpointManager(str(tmp_path / "as"), keep=1, async_save=True)
    mgr.save(2, state)
    restored = mgr.restore(_state(rng, seed_val=50.0))
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    mgr.close()


def test_bf16_moments_roundtrip(tmp_path, rng):
    """payload=bf16_moments: params exact, moments within bf16 rounding,
    restored dtype back at fp32, integer leaves (Adam count) untouched."""
    state = _state(rng)
    # make moments non-trivial
    mu = jax.tree_util.tree_map(lambda x: x + 0.123, state.params)
    inner = state.opt_state[0]._replace(mu=mu, count=jnp.asarray(5, jnp.int32))
    state = state._replace(opt_state=(inner,) + state.opt_state[1:])

    mgr = CheckpointManager(
        str(tmp_path / "bf"), keep=1, payload="bf16_moments"
    )
    mgr.save(1, state)
    restored = mgr.restore(_state(rng, seed_val=9.0))
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    r_inner = restored.opt_state[0]
    assert r_inner.mu["w"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(r_inner.mu["w"]), np.asarray(mu["w"]),
        rtol=1e-2,  # bf16 has ~3 decimal digits
    )
    assert int(r_inner.count) == 5
    mgr.close()


def test_params_only_zeroes_moments(tmp_path, rng):
    """params_only restore must ZERO the moments, not keep the template's:
    on the NaN-rollback path the template IS the contaminated state."""
    state = _state(rng)
    mgr = CheckpointManager(
        str(tmp_path / "po"), keep=1, payload="params_only"
    )
    mgr.save(1, state)
    blank = _state(rng, seed_val=3.0)
    # poison the template's moments as the NaN-rollback path would see them
    poisoned = blank._replace(
        opt_state=jax.tree_util.tree_map(
            lambda x: x + np.nan if x.dtype == jnp.float32 else x,
            blank.opt_state,
        )
    )
    restored = mgr.restore(poisoned)
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    for leaf in jax.tree_util.tree_leaves(restored.opt_state):
        np.testing.assert_array_equal(
            np.asarray(leaf), np.zeros_like(np.asarray(leaf))
        )
    mgr.close()


def test_payload_mode_mismatch_rejected(tmp_path, rng):
    """A resume with a different --checkpoint_payload than the dir was
    written with fails loudly, not with an orbax structure error (or a
    silent moment drop)."""
    import pytest

    state = _state(rng)
    d = str(tmp_path / "pm")
    mgr = CheckpointManager(d, keep=1, payload="params_only")
    mgr.save(1, state)
    mgr.close()
    with pytest.raises(ValueError, match="payload=params_only"):
        CheckpointManager(d, keep=1, payload="full")
