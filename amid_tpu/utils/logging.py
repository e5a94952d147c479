"""Logging + running-mean utilities (reference: utils.py:262-294)."""

from __future__ import annotations

import logging
from pathlib import Path


class AverageMeter:
    """Running means keyed by metric name (utils.py:262-280)."""

    def __init__(self, *keys: str) -> None:
        self.totals = {k: 0.0 for k in keys}
        self.counts = {k: 0 for k in keys}

    def update(self, **kwargs: float) -> None:
        for k, v in kwargs.items():
            if k not in self.totals:
                self.totals[k] = 0.0
                self.counts[k] = 0
            self.totals[k] += float(v)
            self.counts[k] += 1

    def mean(self, key: str) -> float:
        c = self.counts.get(key, 0)
        return self.totals.get(key, 0.0) / c if c else 0.0

    def __getattr__(self, attr: str) -> float:
        if attr.startswith("_") or attr in ("totals", "counts"):
            raise AttributeError(attr)
        return self.mean(attr)


def init_logger(log_dir: str, log_file: str) -> logging.Logger:
    """Console + file logger (utils.py:282-294: model_dir/log{seed}.txt).

    Multi-process runs (parallel/distributed.py): only process 0 gets the
    file handler — every process runs the same trainer code, and N
    processes appending to one model_dir file (shared filesystem on a real
    slice) would interleave/clobber. Non-zero processes keep console
    output tagged with their index."""
    logger = logging.getLogger("amid_tpu")
    logger.setLevel(logging.INFO)
    # jax.process_index() touches the backend, which is already initialized
    # by the time any trainer logs (parse_cli joins the runtime first);
    # avoid importing jax for plain tools that log before using it.
    import sys

    pid = 0
    if "jax" in sys.modules:
        try:
            pid = sys.modules["jax"].process_index()
        except Exception:
            pid = 0
    tag = f" p{pid}" if pid else ""
    fmt = logging.Formatter(
        f"[%(asctime)s{tag}] %(message)s", "%Y/%m/%d %H:%M:%S"
    )
    # reset handlers so per-seed files don't stack
    for h in list(logger.handlers):
        logger.removeHandler(h)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if pid == 0:
        d = Path(log_dir)
        d.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(str(d / log_file))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
