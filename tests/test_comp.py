"""InnerComp/InterComp semantics tests.

Two modes are covered (see amid_tpu/models/comp.py):

* broadcast_quirk=True (default) — the reference's ACTUAL numerics. The
  oracle here is a faithful torch transcription of model_seq.py:459-497
  (same unsqueeze/repeat/permute/matmul pipeline, so torch's broadcast
  alignment is exercised, not re-derived by hand), plus a test that runs the
  real reference modules from /root/reference when present.
* broadcast_quirk=False — the idealized all-pairs affinity; oracle is the
  dense numpy re-computation.
"""

import pathlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from amid_tpu.models.comp import InnerComp, InterComp
from amid_tpu.ops.affinity import diag_max_affinity, max_affinity_xla

REFERENCE = pathlib.Path("/root/reference/model_seq.py")


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def torch_reference_comp(seq_self, seq_peer, w_nn, b_nn, w_bs, b_bs, threshold):
    """Line-faithful torch transcription of the reference InterComp.forward
    (model_seq.py:483-497; InnerComp :459-472 is the seq_peer=seq_self case).
    Uses the exact same unsqueeze/repeat/permute/matmul/squeeze sequence so
    torch's broadcast semantics (the degenerate-affinity quirk) are the
    oracle, not a hand re-derivation."""
    seq_self = torch.as_tensor(seq_self)
    seq_peer = torch.as_tensor(seq_peer)
    bs = seq_self.shape[0]
    trans_nn = torch.nn.Linear(seq_self.shape[-1], seq_self.shape[-1])
    trans_bs = torch.nn.Linear(bs, 1)
    with torch.no_grad():
        # flax stores trans_nn_kernel as (in, out) applied x @ w; torch
        # Linear.weight is (out, in).
        trans_nn.weight.copy_(torch.as_tensor(w_nn).T)
        trans_nn.bias.copy_(torch.as_tensor(b_nn))
        trans_bs.weight.copy_(torch.as_tensor(w_bs)[None, :])
        trans_bs.bias.copy_(torch.as_tensor(np.atleast_1d(b_bs)))
    with torch.no_grad():
        seq1 = seq_peer.unsqueeze(0).repeat(bs, 1, 1, 1)
        seq1 = seq1.permute(0, 1, 3, 2)
        group_bool = torch.matmul(seq_self, seq1)
        group_bool = torch.max(torch.max(group_bool, dim=2)[0], dim=2)[0]
        group_bool = torch.nn.Softmax(dim=1)(group_bool)
        one = torch.ones_like(group_bool)
        zero = torch.zeros_like(group_bool)
        group_bool = torch.where(group_bool > threshold, one, zero)
        seq1 = seq1 * group_bool.unsqueeze(-1).unsqueeze(-1)
        seq1 = trans_nn(seq1.permute(0, 1, 3, 2)).permute(0, 3, 2, 1)
        seq1 = trans_bs(seq1).squeeze().permute(0, 2, 1)
        seq_merge = torch.cat((seq_self, seq1), 1)
    return seq_merge.numpy()


def pairwise_reference_comp(seq_self, seq_peer, w_nn, b_nn, w_bs, b_bs, threshold):
    """Dense numpy re-computation of the IDEALIZED all-pairs reading
    (broadcast_quirk=False): materializes [b,c,n,m] scores, masks, applies
    trans_nn AFTER masking (bias leaks), then trans_bs over the peer axis."""
    scores = np.einsum("bid,cjd->bcij", seq_self, seq_peer)
    aff = scores.max(axis=(2, 3))  # [b, c]
    gate = _softmax(aff, axis=1)
    adj = (gate > threshold).astype(np.float32)
    masked = seq_peer[None, :, :, :] * adj[:, :, None, None]  # [b,c,m,d]
    trans = masked @ w_nn + b_nn  # trans_nn after masking -> bias leaks
    msg = np.einsum("c,bcmd->bmd", w_bs, trans) + b_bs  # Linear(bs,1)
    return np.concatenate([seq_self, msg], axis=1)


def _flax_params(params):
    p = params["params"]["PeerMessage_0"]
    return (
        np.asarray(p["trans_nn_kernel"]),
        np.asarray(p["trans_nn_bias"]),
        np.asarray(p["trans_bs_kernel"]),
        np.asarray(p["trans_bs_bias"])[0],
    )


# ---------------------------------------------------------------------------
# broadcast_quirk=True (reference semantics) vs torch-transcription oracle
# ---------------------------------------------------------------------------

def test_intercomp_quirk_matches_torch_broadcast(rng):
    b, n, d = 8, 5, 16
    seq1 = rng.normal(size=(b, n, d)).astype(np.float32)
    seq2 = rng.normal(size=(b, n, d)).astype(np.float32)
    mod = InterComp(batch_size=b, threshold=0.3, kernels="xla",
                    broadcast_quirk=True)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(seq1), jnp.asarray(seq2))
    got = np.asarray(mod.apply(params, jnp.asarray(seq1), jnp.asarray(seq2)))
    want = torch_reference_comp(seq1, seq2, *_flax_params(params), 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_innercomp_quirk_matches_torch_broadcast(rng):
    b, n, d = 8, 4, 8
    seq = rng.normal(size=(b, n, d)).astype(np.float32)
    mod = InnerComp(batch_size=b, threshold=0.3, kernels="xla",
                    broadcast_quirk=True)
    params = mod.init(jax.random.PRNGKey(5), jnp.asarray(seq))
    got = np.asarray(mod.apply(params, jnp.asarray(seq)))
    want = torch_reference_comp(seq, seq, *_flax_params(params), 0.3)
    assert got.shape == (b, 2 * n, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_quirk_message_is_shared_across_batch(rng):
    """The reference's aggregated message is the SAME [n,d] tensor for every
    user in the batch (degenerate broadcast, model_seq.py:462-470)."""
    b, n, d = 6, 4, 8
    seq = rng.normal(size=(b, n, d)).astype(np.float32)
    mod = InnerComp(batch_size=b, threshold=0.1, kernels="xla",
                    broadcast_quirk=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(seq))
    out = np.asarray(mod.apply(params, jnp.asarray(seq)))
    msg = out[:, n:, :]
    np.testing.assert_allclose(msg[0], msg[-1], rtol=1e-6, atol=1e-7)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_quirk_matches_actual_reference_modules(rng):
    """Run the REAL reference modules (model_seq.py:450-497) on CPU with the
    flax weights copied in — the end-to-end oracle VERDICT.md asked for."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_model_seq", str(REFERENCE))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    b, n, d = 8, 5, 12
    seq1 = rng.normal(size=(b, n, d)).astype(np.float32)
    seq2 = rng.normal(size=(b, n, d)).astype(np.float32)

    for cls, flax_mod, args in [
        (ref.InnerComp, InnerComp(batch_size=b, threshold=0.25, kernels="xla",
                                  broadcast_quirk=True), (seq1,)),
        (ref.InterComp, InterComp(batch_size=b, threshold=0.25, kernels="xla",
                                  broadcast_quirk=True), (seq1, seq2)),
    ]:
        params = flax_mod.init(jax.random.PRNGKey(7), *map(jnp.asarray, args))
        w_nn, b_nn, w_bs, b_bs = _flax_params(params)
        tmod = cls(d, b, 0.25)
        with torch.no_grad():
            tmod.trans_nn.weight.copy_(torch.as_tensor(w_nn).T)
            tmod.trans_nn.bias.copy_(torch.as_tensor(b_nn))
            tmod.trans_bs.weight.copy_(torch.as_tensor(w_bs)[None, :])
            tmod.trans_bs.bias.copy_(torch.as_tensor(np.atleast_1d(b_bs)))
            want = tmod(*map(torch.as_tensor, args)).numpy()
        got = np.asarray(flax_mod.apply(params, *map(jnp.asarray, args)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# broadcast_quirk=False (idealized pairwise mode) vs dense numpy oracle
# ---------------------------------------------------------------------------

def test_intercomp_pairwise_matches_dense(rng):
    b, n, d = 8, 5, 16
    seq1 = rng.normal(size=(b, n, d)).astype(np.float32)
    seq2 = rng.normal(size=(b, n, d)).astype(np.float32)
    mod = InterComp(batch_size=b, threshold=0.3, kernels="xla",
                    broadcast_quirk=False)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(seq1), jnp.asarray(seq2))
    got = np.asarray(mod.apply(params, jnp.asarray(seq1), jnp.asarray(seq2)))
    want = pairwise_reference_comp(seq1, seq2, *_flax_params(params), 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_innercomp_pairwise_matches_dense(rng):
    b, n, d = 8, 4, 8
    seq = rng.normal(size=(b, n, d)).astype(np.float32)
    mod = InnerComp(batch_size=b, threshold=0.3, kernels="xla",
                    broadcast_quirk=False)
    params = mod.init(jax.random.PRNGKey(5), jnp.asarray(seq))
    got = np.asarray(mod.apply(params, jnp.asarray(seq)))
    want = pairwise_reference_comp(seq, seq, *_flax_params(params), 0.3)
    assert got.shape == (b, 2 * n, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# affinity ops
# ---------------------------------------------------------------------------

def test_max_affinity_blocked_equals_naive(rng):
    a = rng.normal(size=(16, 7, 12)).astype(np.float32)
    b = rng.normal(size=(16, 9, 12)).astype(np.float32)
    got = np.asarray(max_affinity_xla(jnp.asarray(a), jnp.asarray(b), chunk=4))
    want = np.einsum("bid,cjd->bcij", a, b).max(axis=(2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_diag_max_affinity_equals_naive(rng):
    a = rng.normal(size=(6, 7, 12)).astype(np.float32)
    b = rng.normal(size=(6, 9, 12)).astype(np.float32)
    got = np.asarray(diag_max_affinity(jnp.asarray(a), jnp.asarray(b)))
    want = np.einsum("bid,bjd->bij", a, b).max(axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hard_gate_blocks_gradient_to_affinity(rng):
    """getBinaryTensor passes no gradient to the affinity (model_seq.py:445-448);
    gradients flow only through peer values."""
    b, n, d = 4, 3, 8
    seq = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    for quirk in (True, False):
        mod = InnerComp(batch_size=b, threshold=0.3, kernels="xla",
                        broadcast_quirk=quirk)
        params = mod.init(jax.random.PRNGKey(0), seq)

        def f(s):
            return jnp.sum(mod.apply(params, s) ** 2)

        g = jax.grad(f)(seq)
        assert np.all(np.isfinite(np.asarray(g)))
