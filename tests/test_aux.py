"""Aux losses vs torch oracles; C2DSR interleave; single-domain filtering;
DR-split tool."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_sce_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from amid_tpu.train.aux_losses import sce_loss

    x = rng.normal(size=(6, 16)).astype(np.float32)
    y = rng.normal(size=(6, 16)).astype(np.float32)
    got = float(sce_loss(jnp.asarray(x), jnp.asarray(y), alpha=3))
    tx, ty = F.normalize(torch.tensor(x), p=2, dim=-1), F.normalize(
        torch.tensor(y), p=2, dim=-1
    )
    want = float(((1 - (tx * ty).sum(-1)) ** 3).mean())
    assert abs(got - want) < 1e-6


def test_info_nce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from amid_tpu.train.aux_losses import info_nce_loss

    a = rng.normal(size=(5, 8)).astype(np.float32)
    b = rng.normal(size=(5, 8)).astype(np.float32)
    got = float(info_nce_loss(jnp.asarray(a), jnp.asarray(b)))
    ta = F.normalize(torch.tensor(a), dim=-1)
    tb = F.normalize(torch.tensor(b), dim=-1)
    logit = torch.exp(ta @ tb.T / 0.07)
    want = float((-torch.log(torch.diag(logit) / logit.sum(1))).mean())
    assert abs(got - want) < 1e-5


def test_contrastive_margin_matches_torch(rng):
    from amid_tpu.train.aux_losses import contrastive_margin_loss

    x0 = rng.normal(size=(4, 8)).astype(np.float32)
    x1 = rng.normal(size=(4, 8)).astype(np.float32)
    y = np.array([1, 0, 1, 0], np.float32)
    got = float(
        contrastive_margin_loss(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(y))
    )
    diff = x0 - x1
    d2 = (diff**2).sum(1)
    d = np.sqrt(d2)
    md = np.clip(1.0 - d, 0, None)
    want = float((y * d2 + (1 - y) * md**2).sum() / 2.0 / 4)
    assert abs(got - want) < 1e-5


def test_interleave_corr_seq():
    from amid_tpu.data.sampler import interleave_corr_seq

    real = jnp.asarray([[1, 2, 3]])
    fake = jnp.asarray([[9, 8, 7]])
    out = np.asarray(interleave_corr_seq(real, fake))
    np.testing.assert_array_equal(out, [[1, 9, 2, 8, 3, 7]])


def test_single_domain_filter(tmp_path):
    from amid_tpu.data.packed import load_dual_domain_csv

    p = tmp_path / "d.csv"
    p.write_text(
        'user_id,seq_d1,seq_d2,domain_id\n'
        '1,"[1, 2]","[]",0\n'
        '2,"[]","[5, 6]",1\n'
        '3,"[3, 4]","[7]",0\n'
    )
    ds = load_dual_domain_csv(str(p), seq_len=4, pad_id=99, subdomain=0)
    assert len(ds) == 2
    np.testing.assert_array_equal(ds.user, [1, 3])
    assert (ds.domain_id == 0).all()


def test_dr_split_tool(tmp_path):
    import subprocess
    import sys

    src = tmp_path / "x_train100.csv"
    rows = ['user_id,seq_d1,seq_d2,domain_id']
    for i in range(20):
        if i < 5:  # overlap users
            rows.append(f'{i},"[1, 2]","[3, 4]",0')
        else:
            rows.append(f'{i},"[1, 2]","[]",0')
    src.write_text("\n".join(rows) + "\n")
    out = subprocess.run(
        [sys.executable, "tools/filter_dr_dataset.py", str(src),
         str(tmp_path / "x"), "--ratios", "0.2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    from amid_tpu.data.packed import read_dual_domain_csv

    users, s1, s2, dom, ob = read_dual_domain_csv(
        str(tmp_path / "x_train20_DR.csv"), with_ob_label=True
    )
    assert len(users) == 20
    # 5 overlap + 3 sampled non-overlap observed
    assert sum(ob) == 5 + 3


def test_param_audit_sasrec_dr():
    """Parameter-tree parity vs the actual reference module (tools/
    audit_params.py; full sweep runs standalone — this pins the flagship)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.audit_params import audit

    assert audit("sasrec", inc=False, itc=True, dr=True)


def test_prepare_raw_pipeline(tmp_path):
    """tools/prepare_raw.py (notebook semantics, SURVEY §2.4): min-events
    filter, contiguous remap with domain-offset items, time-ordered per-domain
    sequences, 80/20 split — and output format identical to the shipped CSVs
    (loadable by the packed loader)."""
    import csv
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.prepare_raw import prepare
    from amid_tpu.data.packed import load_dual_domain_csv, read_dual_domain_csv

    src = tmp_path / "events.csv"
    rows = [
        # user A: 6 events across both domains (kept)
        ("A", "i1", 3.0, 0), ("A", "i2", 1.0, 0), ("A", "j1", 2.0, 1),
        ("A", "i3", 4.0, 0), ("A", "j2", 5.0, 1), ("A", "i1", 6.0, 0),
        # user B: 2 events (dropped by min_events=5)
        ("B", "i1", 1.0, 0), ("B", "j1", 2.0, 1),
        # user C: 5 events, ends in domain 1 (kept)
        ("C", "j3", 1.0, 1), ("C", "j1", 2.0, 1), ("C", "i2", 3.0, 0),
        ("C", "j4", 4.0, 1), ("C", "j5", 5.0, 1),
    ]
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["user_id", "item_id", "timestamp", "domain_id"])
        w.writerows(rows)

    prepare(str(src), str(tmp_path / "out"), min_events=5, test_frac=0.0,
            seed=0)
    users, s1, s2, dom = read_dual_domain_csv(str(tmp_path / "out_train100.csv"))[:4]
    assert sorted(users) == [0, 1]  # contiguous remap, B dropped
    by_user = {u: (a, b, d) for u, a, b, d in zip(users, s1, s2, dom)}
    a1, a2, ad = by_user[0]
    c1, c2, cd = by_user[1]
    # A's d0 sequence is time-ordered: i2(1.0), i1(3.0), i3(4.0), i1(6.0)
    assert len(a1) == 4 and a1[0] != a1[1]
    assert a1[1] == a1[3]  # i1 repeats at ts 3.0 and 6.0
    assert ad == 0 and cd == 1  # last event's domain
    # domain-1 item ids are offset after ALL domain-0 ids
    d0_ids = set(a1) | set(c1)
    d1_ids = set(a2) | set(c2)
    assert max(d0_ids) < min(d1_ids)
    # format parity with shipped CSVs: header + packed-loader round trip
    with open(tmp_path / "out_train100.csv") as f:
        assert f.readline().strip() == "user_id,seq_d1,seq_d2,domain_id"
    ds = load_dual_domain_csv(str(tmp_path / "out_train100.csv"), 6, 999)
    assert len(ds) == 2


def test_pooled_seed_aggregate_is_exact():
    """report_results.merge_aggregates reconstructs the mean/std over the
    union of seeds exactly from per-dir (mean, population-std) blocks —
    the 3-seed + 2-seed -> 5-seed protocol upgrade path."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from report_results import merge_aggregates

    rng = np.random.default_rng(0)
    a, b = rng.normal(size=3), rng.normal(size=2)
    groups = [
        (3, {"mrr_d1": (float(a.mean()), float(a.std()))}),
        (2, {"mrr_d1": (float(b.mean()), float(b.std()))}),
    ]
    got = merge_aggregates(groups)["mrr_d1"]
    full = np.concatenate([a, b])
    assert got[0] == pytest.approx(full.mean(), abs=1e-12)
    assert got[1] == pytest.approx(full.std(), abs=1e-12)


def test_cli_distributed_flag(monkeypatch):
    """--distributed joins the multi-process runtime BEFORE any backend
    touch and implies mesh training; single-process it reduces to a no-op
    join (auto-discovery unavailable) so the same CLI line works at any
    process count."""
    import amid_tpu.config as config_mod
    from amid_tpu.parallel import distributed as dist_mod

    calls = []
    monkeypatch.setattr(
        dist_mod, "initialize_distributed",
        lambda **kw: calls.append(kw),
    )
    cfg = config_mod.parse_cli(
        ["--distributed", "True", "--coordinator", "h:1", "--num_processes",
         "2", "--process_id", "1"]
    )
    assert cfg.use_mesh
    assert calls == [dict(coordinator_address="h:1", num_processes=2,
                          process_id=1)]

    cfg = config_mod.parse_cli([])
    assert len(calls) == 1  # no join without the flag
