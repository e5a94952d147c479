"""amid_tpu — a TPU-native cross-domain sequential recommendation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the AMID
reference (WujiangXu/AMID, WWW 2024 "Rethinking Cross-Domain Sequential
Recommendation under Open-World Assumptions"):

* dual-domain sequential datasets with leave-one-out targets and in-domain
  negative sampling (reference: dataset_seq.py),
* three sequence-encoder backbones — GRU4Rec, SASRec, BERT4Rec (reference:
  model_seq.py:56,248,390),
* AMID's multi-interest discovery / message-passing modules InnerComp and
  InterComp as batch-collective ops (reference: model_seq.py:450,474),
* the doubly-robust (IPS + imputation) estimator and its two-phase training
  schedule (reference: train_sr_dr.py),
* leave-one-out evaluation with HR@k / NDCG@k / MRR, overlap-bucketed
  (reference: utils.py:296-313, train_sr.py:31-128).

The design is TPU-first: packed int32 arrays instead of per-row JSON parsing,
device-side negative sampling, jit-compiled train/eval steps over a
`jax.sharding.Mesh` (data x model axes), row-sharded embedding tables, and
Pallas kernels for the hot ops (batch-affinity contraction, fused attention,
sampled scoring).
"""

__version__ = "0.1.0"

from amid_tpu.config import (  # noqa: F401
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
