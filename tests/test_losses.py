"""Loss math vs torch oracles (reference formulas train_sr.py:210-212,
train_sr_dr.py:217-221,392-394)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from amid_tpu.train import losses  # noqa: E402


def _rand_out(rng, b, c, dr=True):
    out = {
        "logits_d1": rng.uniform(0.05, 0.95, (b, c)).astype(np.float32),
        "logits_d2": rng.uniform(0.05, 0.95, (b, c)).astype(np.float32),
    }
    if dr:
        for k in ("ips_d1", "ips_d2", "gfunc_d1", "gfunc_d2"):
            out[k] = rng.uniform(0.1, 0.9, (b, c)).astype(np.float32)
    return out


def test_masked_bce_matches_torch(rng):
    b, c = 6, 3
    out = _rand_out(rng, b, c, dr=False)
    labels = np.zeros((b, c), np.float32)
    labels[:, 0] = 1
    dom = rng.integers(0, 2, b).astype(np.int32)

    got = float(
        losses.masked_bce_loss(
            jnp.asarray(out["logits_d1"]), jnp.asarray(out["logits_d2"]),
            jnp.asarray(labels), jnp.asarray(dom),
        )
    )
    crit = torch.nn.BCELoss(reduction="none")
    p1, p2 = torch.tensor(out["logits_d1"]), torch.tensor(out["logits_d2"])
    lab = torch.tensor(labels)
    m1 = (1 - torch.tensor(dom)).unsqueeze(1).float()
    m2 = torch.tensor(dom).unsqueeze(1).float()
    want = float(torch.mean(crit(p1, lab) * m1 + crit(p2, lab) * m2))
    assert abs(got - want) < 1e-6


def test_dr_losses_match_torch(rng):
    b, c = 5, 2
    out = _rand_out(rng, b, c, dr=True)
    labels = np.zeros((b, c), np.float32)
    labels[:, 0] = 1
    dom = rng.integers(0, 2, b).astype(np.int32)
    ob = rng.integers(0, 2, b).astype(np.int32)

    jout = {k: jnp.asarray(v) for k, v in out.items()}
    got_e = float(losses.dr_e_loss(jout, jnp.asarray(labels), jnp.asarray(dom)))
    got_r = float(
        losses.dr_r_loss(jout, jnp.asarray(labels), jnp.asarray(dom), jnp.asarray(ob))
    )

    crit = torch.nn.BCELoss(reduction="none")
    t = {k: torch.tensor(v) for k, v in out.items()}
    lab = torch.tensor(labels)
    m1 = (1 - torch.tensor(dom)).unsqueeze(1).float()
    m2 = torch.tensor(dom).unsqueeze(1).float()
    # train_sr_dr.py:219
    want_e = float(
        torch.mean(
            (crit(t["logits_d1"], lab) - t["gfunc_d1"]) ** 2 / t["ips_d1"] * m1
            + (crit(t["logits_d2"], lab) - t["gfunc_d2"]) ** 2 / t["ips_d2"] * m2
        )
    )
    # train_sr_dr.py:392-393 (ob tiled over the candidate axis)
    obt = torch.tensor(ob).unsqueeze(1).repeat(1, c).float()
    want_r = float(
        torch.mean(
            (
                t["gfunc_d1"] ** 2
                + obt * ((crit(t["logits_d1"], lab) ** 2 - t["gfunc_d1"] ** 2) ** 2)
                / t["ips_d1"]
            ) * m1
            + (
                t["gfunc_d2"] ** 2
                + obt * ((crit(t["logits_d2"], lab) ** 2 - t["gfunc_d2"] ** 2) ** 2)
                / t["ips_d2"]
            ) * m2
        )
    )
    assert abs(got_e - want_e) < 1e-5
    assert abs(got_r - want_r) < 1e-5
