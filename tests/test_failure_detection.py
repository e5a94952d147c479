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
