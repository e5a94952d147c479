"""Typed configuration for the amid_tpu framework.

Replaces the reference's argparse flag soup (train_sr.py:359-389,
train_sr_dr.py:547-577) with dataclasses. Dead reference flags (graph_nums,
head_nums, m1..m4_layers, mask_rate_*, bs_ratio — defined but never read in the
reference) are intentionally dropped. Reference boolean flags used `type=bool`
(so `--overlap False` was truthy); here booleans are real booleans.

Hard-coded reference constants (train_sr.py:447-457) become explicit fields:
`user_vocab` / `item_vocab` default to the reference's doubled sizes and
`pad_id = item_length + 1`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional

# Reference hard-coded vocab constants (train_sr.py:447-450). The reference
# then doubles them "for pad id" (train_sr.py:456-457); we keep the raw value
# and expose the doubled table size via properties.
REF_USER_LENGTH = 895510
REF_ITEM_LENGTH = 447410


@dataclass
class ModelConfig:
    """Model hyper-parameters. Mirrors reference constructor args

    (model_seq.py:56-58 etc.): emb_dim=128, hid_dim=32, seq_len per dataset,
    batch-size-tied InnerComp/InterComp thresholds ts1/ts2.
    """

    backbone: str = "sasrec"  # one of {"gru4rec", "sasrec", "bert4rec"}
    emb_dim: int = 128
    hid_dim: int = 32
    seq_len: int = 20  # 20 for mybank, 150 for amazon (train_sr.py:366)
    batch_size: int = 256  # InnerComp/InterComp tie a weight to this (model_seq.py:457)
    is_inc: bool = False  # intra-domain multi-interest message passing
    is_itc: bool = False  # cross-domain message passing
    ts1: float = 0.5  # InnerComp hard threshold (model_seq.py:467)
    ts2: float = 0.5  # InterComp hard threshold (model_seq.py:492)
    is_dr: bool = False  # doubly-robust heads (model_seq.py:412-414)
    # C2DSR mode (dataset_seq.py:283-441 + train/c2dsr.py objective):
    # device-sampled corrupted-sequence views + contrastive infomax loss.
    is_c2dsr: bool = False
    item_length: int = REF_ITEM_LENGTH
    user_length: int = REF_USER_LENGTH
    # Transformer dims for SASRec encoder (model_seq.py:331-357): 2 blocks,
    # 8 heads, dropout 0.5.
    sasrec_blocks: int = 2
    sasrec_heads: int = 8
    sasrec_dropout: float = 0.5
    # BERT4Rec stack (model_seq.py:264-267): hard-coded 2 blocks of
    # TransformerBlock(128, 4, 512, 0.1) in the reference.
    bert_blocks: int = 2
    bert_heads: int = 4
    bert_ff_dim: int = 512
    bert_dropout: float = 0.1
    # The reference's InnerComp/InterComp affinity is a degenerate broadcast:
    # torch.matmul(seq_self [b,n,d], seq1 [b,b,d,n]) aligns seq_self to the
    # SECOND batch dim (model_seq.py:462-465), so the affinity row is
    # independent of the receiving user and the aggregated message is one
    # shared [n,d] tensor per batch (verified by torch oracle,
    # tests/test_comp.py). True reproduces that published behavior; False
    # uses the idealized all-pairs affinity the paper describes.
    comp_broadcast_quirk: bool = True
    # Reference BERT4Rec builds its padding mask from seq_d2 for BOTH domains
    # (model_seq.py:286-294). True preserves that quirk for parity; False uses
    # each domain's own ids.
    bert_d2_mask_quirk: bool = True
    # Numerics: parameters are stored fp32. On TPU, f32 matmuls ALREADY run
    # at bf16 input precision / fp32 accumulate by default (the MXU-native
    # DEFAULT precision) — measured bit-identical metrics with and without
    # an explicit bfloat16 context (results/bf16_drive*). use_bf16 therefore
    # only matters off-TPU; matmul_precision overrides the jax precision
    # context explicitly ("", "bfloat16", "highest"/"float32" = true-fp32
    # 3-pass matmuls — the expensive direction worth measuring).
    use_bf16: bool = False
    matmul_precision: str = ""
    # Rematerialize encoder-block internals in the backward (nn.remat):
    # trades recompute for activation memory; for big-batch / 50M-row-table
    # configs (docs/PERF.md). Param tree unchanged.
    remat: bool = False
    # Kernel selection: "xla" (let XLA fuse) or "pallas" (custom TPU kernels)
    # for the hot ops. "auto" uses pallas on TPU backends, xla elsewhere.
    kernels: str = "auto"

    @property
    def item_table_size(self) -> int:
        # Reference doubles item_length "for pad id" (train_sr.py:456).
        return self.item_length * 2

    @property
    def user_table_size(self) -> int:
        return self.user_length * 2

    @property
    def pad_id(self) -> int:
        # pad_id = item_length + 1 (train_sr.py:451)
        return self.item_length + 1

    @property
    def enc_seq_len(self) -> int:
        """Encoder input length: doubled when InnerComp concatenates the
        aggregated peer message along time (model_seq.py:66,471) and when the
        C2DSR interleaved views (2L) pass through the towers — the SASRec
        position table must cover the longest input."""
        mult = (2 if self.is_inc else 1) * (2 if self.is_c2dsr else 1)
        return self.seq_len * mult


@dataclass
class DataConfig:
    """Dataset selection + leave-one-out protocol constants.

    Mirrors reference path assembly (train_sr.py:451: csv =
    `{ds}_dataset/{dm}_train{int(ratio*100)}.csv`) and sampling protocol
    (dataset_seq.py:177-250).
    """

    dataset_type: str = "amazon"
    domain_type: str = "cloth_sport"
    data_root: str = "/root/reference"
    overlap_ratio: float = 0.25
    seq_len: int = 20
    neg_nums: int = 199  # eval negatives (999 in run.sh)
    long_length: int = 7  # long-tail threshold (dataset_seq.py:13)
    pad_id: int = REF_ITEM_LENGTH + 1

    def train_csv(self) -> str:
        return (
            f"{self.data_root}/{self.dataset_type}_dataset/"
            f"{self.domain_type}_train{int(self.overlap_ratio * 100)}.csv"
        )

    def train_dr_csv(self) -> str:
        return (
            f"{self.data_root}/{self.dataset_type}_dataset/"
            f"{self.domain_type}_train{int(self.overlap_ratio * 100)}_DR.csv"
        )

    def test_csv(self) -> str:
        return (
            f"{self.data_root}/{self.dataset_type}_dataset/"
            f"{self.domain_type}_test.csv"
        )


@dataclass
class MeshConfig:
    """Device mesh layout: `data` axis for batch parallelism, `model` axis for
    row-sharded embedding tables. (New in the TPU build; the reference is
    single-GPU, SURVEY.md §2.5.)"""

    data_axis: int = -1  # -1: all remaining devices
    model_axis: int = 1

    def axis_sizes(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model_axis)
        if n_devices % model != 0:
            raise ValueError(f"n_devices={n_devices} not divisible by model={model}")
        data = self.data_axis if self.data_axis > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != n_devices {n_devices}"
            )
        return data, model


@dataclass
class TrainConfig:
    """Training loop configuration (reference defaults: train_sr.py:360-389)."""

    epochs: int = 50
    lr: float = 5e-4
    lr2: float = 0.01  # DR phase-B lr multiplier: optimizer2 lr = lr*lr2 (train_sr_dr.py:669)
    dr_e_w: float = 0.1  # weight on loss_dr_e in phase A (train_sr_dr.py:221)
    seeds: int = 5  # 5-seed protocol (train_sr.py:439)
    seed_offset: int = 0  # first seed index (extend a committed 3-seed table to 5)
    overlap_eval: bool = False  # bucket metrics by overlap users (train_sr.py:75)
    model_dir: str = "model/"
    log_every: int = 20  # log train loss every N steps (train_sr.py:218)
    checkpoint: bool = True  # real checkpointing (absent in reference, SURVEY §5)
    checkpoint_keep: int = 1
    # Minimum epochs between checkpoint saves. Fetching the full TrainState
    # off-device is expensive (~1.8 GB through the TPU tunnel at the mybank
    # vocab); best-epoch METRICS come from logs, so frequent saves buy
    # nothing. 0 = save on every improvement.
    checkpoint_every: int = 10
    # Async orbax saves: save() returns after staging the device→host fetch,
    # serialization happens on a background thread (restore/close wait).
    # Payload modes cut the fetched bytes: "bf16_moments" halves the Adam
    # moments, "params_only" drops them (resume restarts the optimizer).
    # Costs measured in results/ckpt_cost.json (train/checkpoint.py).
    checkpoint_async: bool = True
    checkpoint_payload: str = "full"
    profile_steps: int = 0  # >0: capture a jax.profiler trace of the first N
    #                         steps of epoch 0 into model_dir/profile
    resume: bool = False  # restore latest checkpoint and continue
    subdomain: int = -1  # >=0: single-domain training (dataset_seq.py:24-28)
    # Failure detection (new; reference has none, SURVEY §5): on a
    # non-finite train loss — "restore" rolls back to the last checkpoint
    # once and continues, "halt" raises, "ignore" logs only.
    nan_policy: str = "restore"
    # Mesh training: False = single-device jit (parity default). True (set
    # automatically by any non-default --data_axis/--model_axis) shards the
    # existing steps over `mesh` — GSPMD (device_put + jit) or shard_map per
    # mesh_impl.
    use_mesh: bool = False
    mesh_impl: str = "gspmd"
    # Sparse embedding updates (train/lazy.py): only touched table rows'
    # params/moments move. ~3 GB/step less HBM traffic at the mybank vocab;
    # lazy-Adam semantics (untouched rows' moments don't decay). Covers both
    # DR phases (optimizer2 gets its own per-row moment set).
    lazy_table_adam: bool = False
    # C2DSR contrastive weight (train/c2dsr.py; active when model.is_c2dsr).
    cl_w: float = 0.1
    eval_batch_drop_last: bool = True  # reference val loader drop_last=True (train_sr.py:455)
    # Eval pass as ONE lax.scan over the device-resident stacked val batches
    # (steps.make_scanned_eval) instead of nb host-dispatched steps; metrics
    # are bit-identical to the loop path (same fold_in(key, i) draws —
    # test_fast_eval). Applies to single-device AND gspmd-mesh runs (the
    # stacked batches are pre-sharded P(None, data)); shard_map keeps the
    # per-step loop.
    fast_eval: bool = True
    # Train epochs as log-cadence lax.scan chunks (steps.make_resident_chunk_runner):
    # ~log_every x fewer dispatches, one stacked slice per epoch, identical
    # batch/rng streams and log sampling; exact metric parity on CPU
    # (test_fast_train), float-rounding drift on TPU (recompiled program —
    # well below seed noise). gspmd-mesh runs scan too (replicated resident
    # arrays + batch sharding constraint, test_mesh_trainer);
    # shard_map/profiling runs keep the per-step loop.
    fast_train: bool = True
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def __post_init__(self) -> None:
        # Keep seq_len / batch size / pad_id consistent between sub-configs.
        self.data.seq_len = self.model.seq_len
        self.data.pad_id = self.model.pad_id

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _add_reference_flags(p: argparse.ArgumentParser) -> None:
    """Reference-compatible CLI surface (train_sr.py:359-389)."""
    p.add_argument("--epoch", type=int, default=50)
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr2", type=float, default=0.01)
    p.add_argument("--emb_dim", type=int, default=128)
    p.add_argument("--hid_dim", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=20)
    p.add_argument("--long_length", type=int, default=7)
    p.add_argument("--neg_nums", type=int, default=199)
    p.add_argument("--overlap_ratio", type=float, default=0.5)
    p.add_argument("-md", "--model-dir", type=str, default="model/")
    p.add_argument("--model", type=str, default="sasrec")
    p.add_argument("-ds", "--dataset_type", type=str, default="amazon")
    p.add_argument("-dm", "--domain_type", type=str, default="movie_book")
    # Real booleans (the reference's `type=bool` made "--overlap False" truthy).
    p.add_argument("--isInC", type=_parse_bool, default=False)
    p.add_argument("--isItC", type=_parse_bool, default=False)
    p.add_argument("--ts1", type=float, default=0.5)
    p.add_argument("--ts2", type=float, default=0.5)
    p.add_argument("--comp_broadcast_quirk", type=_parse_bool, default=True,
                   help="True (default): reproduce the reference's degenerate "
                        "broadcast affinity (shared per-batch message); "
                        "False: idealized all-pairs affinity")
    p.add_argument("--overlap", type=_parse_bool, default=False)
    p.add_argument("--isDR", type=_parse_bool, default=False)
    p.add_argument("--dr_e_w", type=float, default=0.1)
    p.add_argument("--isC2DSR", type=_parse_bool, default=False,
                   help="corrupted-sequence contrastive mode "
                        "(dataset_seq.py:283-441 semantics, train/c2dsr.py)")
    p.add_argument("--cl_w", type=float, default=0.1,
                   help="C2DSR contrastive loss weight")
    p.add_argument("--data_root", type=str, default="/root/reference")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--seed_offset", type=int, default=0,
                   help="first seed index; seeds run in "
                        "[seed_offset, seed_offset+seeds)")
    p.add_argument("--kernels", type=str, default="auto")
    p.add_argument("--remat", type=_parse_bool, default=False,
                   help="rematerialize encoder blocks in the backward "
                        "(activation memory <-> recompute)")
    p.add_argument("--matmul_precision", type=str, default="",
                   choices=["", "bfloat16", "highest", "float32"],
                   help="jax matmul precision override; TPU default is "
                        "already bf16-input/fp32-accumulate")
    p.add_argument("--profile_steps", type=int, default=0)
    p.add_argument("--bf16", type=_parse_bool, default=False)
    p.add_argument("--lazy_table_adam", type=_parse_bool, default=False)
    p.add_argument("--fast_eval", type=_parse_bool, default=True,
                   help="eval pass as one lax.scan over device-resident val "
                        "batches (metric-identical to the loop path)")
    p.add_argument("--fast_train", type=_parse_bool, default=True,
                   help="train epochs as log-cadence lax.scan chunks "
                        "(exact metric parity vs per-step dispatch on CPU; "
                        "float-rounding-level trajectory drift on TPU — "
                        "different compiled program)")
    p.add_argument("--checkpoint", type=_parse_bool, default=True)
    p.add_argument("--checkpoint_async", type=_parse_bool, default=True,
                   help="orbax async saves: serialization on a background "
                        "thread (restore/close wait for in-flight saves)")
    p.add_argument("--checkpoint_payload", type=str, default="full",
                   choices=["full", "bf16_moments", "params_only"],
                   help="bf16_moments halves the optimizer-moment bytes; "
                        "params_only drops them (resume restarts Adam)")
    p.add_argument("--resume", type=_parse_bool, default=False)
    p.add_argument("--subdomain", type=int, default=-1,
                   help=">=0: single-domain mode — keep only rows of this "
                        "domain (reference SingleDomainSeqDataset)")
    # Device-mesh training (new vs reference, SURVEY §2.5). Any non-default
    # axis (or --mesh True) turns the trainer's steps into mesh programs:
    # batch sharded over `data`, item table row-sharded over `model`.
    p.add_argument("--data_axis", type=int, default=-1,
                   help="data-parallel axis size (-1: all remaining devices)")
    p.add_argument("--model_axis", type=int, default=1,
                   help="model axis size (row-sharded embedding tables)")
    p.add_argument("--mesh", type=_parse_bool, default=False,
                   help="force mesh training even at the default 1x1 layout")
    p.add_argument("--mesh_impl", type=str, default="gspmd",
                   choices=("gspmd", "shard_map"),
                   help="gspmd: jit + sharded arrays (XLA inserts "
                        "collectives); shard_map: explicit collectives")
    # Multi-host launch (parallel/distributed.py): every process runs this
    # same CLI; jax.distributed wires them into one runtime and run_seed's
    # mesh path assembles global arrays per process. On Cloud TPU the
    # coordinator is auto-discovered (--distributed True alone); elsewhere
    # pass --coordinator host:port --num_processes N --process_id I.
    p.add_argument("--distributed", type=_parse_bool, default=False,
                   help="join a multi-process jax runtime before training "
                        "(implies --mesh True, gspmd)")
    p.add_argument("--coordinator", type=str, default="",
                   help="coordinator address host:port (empty: auto)")
    p.add_argument("--num_processes", type=int, default=-1)
    p.add_argument("--process_id", type=int, default=-1)


def _parse_bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    return v.strip().lower() in ("1", "true", "yes", "y", "t")


def parse_cli(argv: Optional[list[str]] = None, is_dr: bool = False) -> TrainConfig:
    """Build a TrainConfig from reference-style CLI flags."""
    p = argparse.ArgumentParser(description="amid_tpu trainer")
    _add_reference_flags(p)
    a = p.parse_args(argv)
    if a.distributed:
        # must run before anything touches a jax backend (distributed.py)
        from amid_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(
            coordinator_address=a.coordinator or None,
            num_processes=a.num_processes if a.num_processes > 0 else None,
            process_id=a.process_id if a.process_id >= 0 else None,
        )
    model = ModelConfig(
        backbone=a.model.lower(),
        emb_dim=a.emb_dim,
        hid_dim=a.hid_dim,
        seq_len=a.seq_len,
        batch_size=a.bs,
        is_inc=a.isInC,
        is_itc=a.isItC,
        ts1=a.ts1,
        ts2=a.ts2,
        comp_broadcast_quirk=a.comp_broadcast_quirk,
        is_dr=a.isDR or is_dr,
        is_c2dsr=a.isC2DSR,
        kernels=a.kernels,
        use_bf16=a.bf16,
        matmul_precision=a.matmul_precision,
        remat=a.remat,
    )
    data = DataConfig(
        dataset_type=a.dataset_type,
        domain_type=a.domain_type,
        data_root=a.data_root,
        overlap_ratio=a.overlap_ratio,
        seq_len=a.seq_len,
        neg_nums=a.neg_nums,
        long_length=a.long_length,
    )
    return TrainConfig(
        epochs=a.epoch,
        lr=a.lr,
        lr2=a.lr2,
        dr_e_w=a.dr_e_w,
        seeds=a.seeds,
        seed_offset=a.seed_offset,
        overlap_eval=a.overlap,
        model_dir=a.model_dir,
        profile_steps=a.profile_steps,
        resume=a.resume,
        subdomain=a.subdomain,
        lazy_table_adam=a.lazy_table_adam,
        fast_eval=a.fast_eval,
        fast_train=a.fast_train,
        cl_w=a.cl_w,
        checkpoint=a.checkpoint,
        checkpoint_async=a.checkpoint_async,
        checkpoint_payload=a.checkpoint_payload,
        use_mesh=a.mesh or a.model_axis != 1 or a.data_axis > 0
        or a.distributed,
        mesh_impl=a.mesh_impl,
        model=model,
        data=data,
        mesh=MeshConfig(data_axis=a.data_axis, model_axis=a.model_axis),
    )
