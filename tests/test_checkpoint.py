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
