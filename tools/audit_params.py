"""Parameter-tree audit: flax modules vs the ACTUAL reference torch modules.

VERDICT r1 item 5: instantiate each reference backbone (model_seq.py) on CPU
and diff parameter trees — total counts and shape multisets — against the
corresponding amid_tpu flax model. Catches silent omissions like the
out_proj bias (fixed round 2) or extra/missing layers.

Known, documented differences (excluded from the diff):
* none — after the out_proj-bias fix every torch parameter has a flax
  counterpart shape-for-shape. (embUserLayerEnhance is commented out of
  every reference backbone, model_seq.py:396,425, so it appears on neither
  side; torch GRU keeps bias_ih/bias_hh as two [3H] vectors where flax-side
  TorchGRU also keeps both — shape parity holds.)

Usage: python tools/audit_params.py  (exits nonzero on any mismatch)
"""

from __future__ import annotations

import sys
from collections import Counter

import numpy as np

REF = "/root/reference"


def torch_param_shapes(model):
    import torch  # noqa: F401

    return Counter(
        tuple(p.shape) for _, p in model.named_parameters()
    ), {n: tuple(p.shape) for n, p in model.named_parameters()}


def flax_param_shapes(params):
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(params)
    shapes = Counter(tuple(x.shape) for _, x in leaves)
    names = {jax.tree_util.keystr(p): tuple(x.shape) for p, x in leaves}
    return shapes, names


def build_reference(backbone: str, dims: dict):
    sys.path.insert(0, REF)
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    from model_seq import BERT4Rec, GRU4Rec, SASRec

    cls = {"gru4rec": GRU4Rec, "sasrec": SASRec, "bert4rec": BERT4Rec}[backbone]
    return cls(
        user_length=dims["user_table"], user_emb_dim=dims["emb"],
        item_length=dims["item_table"], item_emb_dim=dims["emb"],
        seq_len=dims["seq_len"], hid_dim=dims["hid"], bs=dims["bs"],
        isInC=dims["inc"], isItC=dims["itc"],
        threshold1=0.5, threshold2=0.5, isDR=dims["dr"],
    )


def build_flax(backbone: str, dims: dict):
    import jax

    from amid_tpu.config import ModelConfig
    from amid_tpu.models.amid import build_model

    cfg = ModelConfig(
        backbone=backbone, emb_dim=dims["emb"], hid_dim=dims["hid"],
        seq_len=dims["seq_len"], batch_size=dims["bs"],
        is_inc=dims["inc"], is_itc=dims["itc"], is_dr=dims["dr"],
        item_length=dims["item_table"] // 2,
        user_length=dims["user_table"] // 2,
        kernels="xla",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    b, l, v = dims["bs"], dims["seq_len"], dims["item_table"]
    batch = {
        "target": rng.integers(0, v, b, dtype=np.int32),
        "neg_samples": rng.integers(0, v, (b, 1), dtype=np.int32),
        "seq_d1": rng.integers(0, v, (b, l), dtype=np.int32),
        "seq_d2": rng.integers(0, v, (b, l), dtype=np.int32),
    }
    key = jax.random.PRNGKey(0)
    return model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]


def audit(backbone: str, inc: bool, itc: bool, dr: bool) -> bool:
    # BERT4Rec hard-codes TransformerBlock(128, 4, 512) regardless of emb_dim
    # (model_seq.py:264-267) — the reference is only RUNNABLE at emb_dim=128,
    # where our parameterized blocks coincide; audit it there.
    emb = 128 if backbone == "bert4rec" else 16
    dims = dict(
        user_table=64, item_table=90, emb=emb, hid=8, seq_len=6, bs=8,
        inc=inc, itc=itc, dr=dr,
    )
    ref = build_reference(backbone, dims)
    t_shapes, t_names = torch_param_shapes(ref)
    f_params = build_flax(backbone, dims)
    f_shapes, f_names = flax_param_shapes(f_params)

    # flax kernels are transposed torch weights, torch Conv1d(k=1) weights
    # carry a trailing singleton, and Linear(bs,1) rows are (1, bs) vs our
    # (bs,) vector — canonicalize by dropping singleton dims then sorting.
    def canon_shape(s):
        s = tuple(d for d in s if d != 1) or (1,)
        return tuple(sorted(s))

    def canon(counter):
        return Counter(canon_shape(s) for s in counter.elements())

    tc, fc = canon(t_shapes), canon(f_shapes)
    t_total = sum(int(np.prod(s)) for s in t_names.values())
    f_total = sum(int(np.prod(s)) for s in f_names.values())
    label = (f"{backbone} inc={int(inc)} itc={int(itc)} dr={int(dr)}")
    ok = tc == fc and t_total == f_total
    print(f"{label}: torch={t_total:,} flax={f_total:,} "
          f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        missing = tc - fc
        extra = fc - tc
        if missing:
            print(f"  shapes in torch but not flax: {dict(missing)}")
            for n, s in sorted(t_names.items()):
                if canon_shape(s) in missing:
                    print(f"    torch: {n} {s}")
        if extra:
            print(f"  shapes in flax but not torch: {dict(extra)}")
            for n, s in sorted(f_names.items()):
                if canon_shape(s) in extra:
                    print(f"    flax:  {n} {s}")
    return ok


def main() -> int:
    ok = True
    for backbone in ("gru4rec", "sasrec", "bert4rec"):
        ok &= audit(backbone, inc=False, itc=False, dr=False)
        ok &= audit(backbone, inc=True, itc=True, dr=False)
    ok &= audit("sasrec", inc=False, itc=True, dr=True)
    print("AUDIT", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.exit(main())
