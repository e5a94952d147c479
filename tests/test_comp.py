"""InnerComp/InterComp: the TPU-native factorized formulation must equal a
direct dense re-computation of the reference pipeline (model_seq.py:459-497)
on tiny shapes, including the trans_nn-bias-leak quirk."""

import numpy as np
import jax
import jax.numpy as jnp

from amid_tpu.models.comp import InnerComp, InterComp
from amid_tpu.ops.affinity import max_affinity_xla


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def reference_comp(seq_self, seq_peer, w_nn, b_nn, w_bs, b_bs, threshold):
    """Dense numpy re-computation of the reference InnerComp/InterComp math
    (model_seq.py:459-472): materializes [b,b,n,m] scores, masks, applies
    trans_nn AFTER masking (bias leaks), then trans_bs over the peer axis."""
    b, n, d = seq_self.shape
    _, m, _ = seq_peer.shape
    # scores[b,c,i,j] = seq_self[b,i] . seq_peer[c,j]
    scores = np.einsum("bid,cjd->bcij", seq_self, seq_peer)
    aff = scores.max(axis=(2, 3))  # [b, c]
    gate = _softmax(aff, axis=1)
    adj = (gate > threshold).astype(np.float32)
    masked = seq_peer[None, :, :, :] * adj[:, :, None, None]  # [b,c,m,d]
    trans = masked @ w_nn + b_nn  # trans_nn after masking -> bias leaks
    msg = np.einsum("c,bcmd->bmd", w_bs, trans) + b_bs  # Linear(bs,1)
    return np.concatenate([seq_self, msg], axis=1)


def test_intercomp_matches_dense_reference(rng):
    b, n, d = 8, 5, 16
    # Scale up so affinities are decisive: a threshold sitting exactly at the
    # uniform softmax mass (1/b) would let fp noise flip gates between the
    # two formulations.
    seq1 = rng.normal(size=(b, n, d)).astype(np.float32)
    seq2 = rng.normal(size=(b, n, d)).astype(np.float32)

    mod = InterComp(batch_size=b, threshold=0.3, kernels="xla")
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(seq1), jnp.asarray(seq2))
    got = np.asarray(mod.apply(params, jnp.asarray(seq1), jnp.asarray(seq2)))

    p = params["params"]["PeerMessage_0"]
    want = reference_comp(
        seq1, seq2,
        np.asarray(p["trans_nn_kernel"]), np.asarray(p["trans_nn_bias"]),
        np.asarray(p["trans_bs_kernel"]), np.asarray(p["trans_bs_bias"])[0],
        0.3,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_innercomp_matches_dense_reference(rng):
    b, n, d = 8, 4, 8
    seq = rng.normal(size=(b, n, d)).astype(np.float32)
    mod = InnerComp(batch_size=b, threshold=0.3, kernels="xla")
    params = mod.init(jax.random.PRNGKey(5), jnp.asarray(seq))
    got = np.asarray(mod.apply(params, jnp.asarray(seq)))
    p = params["params"]["PeerMessage_0"]
    want = reference_comp(
        seq, seq,
        np.asarray(p["trans_nn_kernel"]), np.asarray(p["trans_nn_bias"]),
        np.asarray(p["trans_bs_kernel"]), np.asarray(p["trans_bs_bias"])[0],
        0.3,
    )
    assert got.shape == (b, 2 * n, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_max_affinity_blocked_equals_naive(rng):
    a = rng.normal(size=(16, 7, 12)).astype(np.float32)
    b = rng.normal(size=(16, 9, 12)).astype(np.float32)
    got = np.asarray(max_affinity_xla(jnp.asarray(a), jnp.asarray(b), chunk=4))
    want = np.einsum("bid,cjd->bcij", a, b).max(axis=(2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hard_gate_blocks_gradient_to_affinity(rng):
    """getBinaryTensor passes no gradient to the affinity (model_seq.py:445-448);
    gradients flow only through peer values."""
    b, n, d = 4, 3, 8
    seq = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    mod = InnerComp(batch_size=b, threshold=0.3, kernels="xla")
    params = mod.init(jax.random.PRNGKey(0), seq)

    def f(s):
        return jnp.sum(mod.apply(params, s) ** 2)

    g = jax.grad(f)(seq)
    assert np.all(np.isfinite(np.asarray(g)))
