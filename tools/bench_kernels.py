#!/usr/bin/env python
"""Per-kernel microbenchmarks on the TPU chip with roofline accounting.

Times each op with a device-side lax.scan loop (the axon tunnel adds ~ms of
per-dispatch latency that would otherwise dominate), reports achieved
TFLOP/s and GB/s vs the v5e roofline (197 TFLOP/s bf16, ~819 GB/s HBM).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


_RTT_CACHE = [None]


def tunnel_rtt() -> float:
    """Fixed round-trip cost of one compiled-call + host fetch through the
    axon tunnel (~24 ms measured 2026-08-18; varies with tunnel conditions —
    re-measured per process). Every timing must subtract this floor or it
    dominates: at 20 iters/call it contributes ~1.2 ms/iter of pure bias."""
    if _RTT_CACHE[0] is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def noop(x):
            return x + 1.0

        c = noop.lower(jnp.float32(0)).compile()
        float(c(jnp.float32(0)))  # warmup
        _RTT_CACHE[0] = min(
            _timed(lambda: float(c(jnp.float32(0)))) for _ in range(5)
        )
    return _RTT_CACHE[0]


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def device_time(f, args, iters=100):
    """Per-application wall time of f, RTT-corrected.

    Runs `iters` applications inside ONE jit program (lax.scan) and
    subtracts the measured no-op tunnel round-trip — the per-call fetch
    costs ~24 ms here and would otherwise swamp any op under ~1 ms."""
    import jax

    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(carry, _):
            *xs, salt = carry
            out = f(*xs, salt)
            # full-sum probe: consuming every output element stops XLA from
            # slicing the computation down to a corner (a [:1,:1] probe let a
            # gather benchmark "run" in 8us); salt defeats cross-iteration CSE
            return (*xs, salt + 1), jnp.sum(out)

        (_, *_r), probes = jax.lax.scan(
            body, (*args, jnp.float32(0)), None, length=iters
        )
        return probes

    compiled = loop.lower(args).compile()
    np.asarray(compiled(args))  # warmup; host fetch forces real completion
    times = []
    for _ in range(3):
        # block_until_ready is decoupled from device execution through the
        # axon tunnel — a device->host fetch is the only true sync point
        times.append(_timed(lambda: np.asarray(compiled(args))))
    return max(min(times) - tunnel_rtt(), 0.0) / iters


def bench_affinity(report):
    import jax
    import jax.numpy as jnp

    from amid_tpu.ops.affinity import max_affinity_xla
    from amid_tpu.ops.pallas_affinity import (
        max_affinity_pallas, max_affinity_pallas_smalln, smalln_fits,
    )

    rng = np.random.default_rng(0)
    for n in (20, 160):
        B, D = 256, 128
        a = jnp.asarray(rng.normal(size=(B, n, D)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(B, n, D)).astype(np.float32))
        flops = 2 * B * B * n * n * D

        def f_pallas(x, y, salt):
            return max_affinity_pallas(x + 0.0 * salt, y)

        def f_smalln(x, y, salt):
            return max_affinity_pallas_smalln(x + 0.0 * salt, y)

        def f_xla(x, y, salt):
            return max_affinity_xla(x + 0.0 * salt, y)

        err = float(
            jnp.max(jnp.abs(max_affinity_pallas(a, b) - max_affinity_xla(a, b)))
        )
        variants = [("pallas", f_pallas), ("xla", f_xla)]
        if smalln_fits(B, n, B, n, D):
            variants.append(("smalln", f_smalln))
        for name, f in variants:
            try:
                dt = device_time(f, (a, b))
            except Exception as e:  # noqa: BLE001
                report(f"affinity[N={n}] {name}: FAILED {type(e).__name__}")
                continue
            tf = flops / dt / 1e12
            report(
                f"affinity[B={B},N={n},D={D}] {name}: {dt*1e6:8.0f} us "
                f"{tf:7.2f} TF/s ({100*tf/V5E_BF16_TFLOPS:5.1f}% SOL) "
                f"maxdiff={err:.2e}"
            )


def bench_attention(report):
    import jax
    import jax.numpy as jnp

    from amid_tpu.ops.pallas_attention import fused_attention
    from tests.test_pallas_attention import xla_attention

    rng = np.random.default_rng(0)
    for t in (20, 160):
        B, D, H = 256, 128, 8
        q = jnp.asarray(rng.normal(size=(B, t, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, t, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, t, D)).astype(np.float32))
        bias = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)[None, None]
        seed = jnp.zeros((1,), jnp.int32)
        flops = 2 * 2 * B * H * t * t * (D // H)  # qk^T + pv

        def f_pallas(q, k, v, salt):
            return fused_attention(q + 0 * salt, k, v, bias, seed, H, 0.0)

        def f_xla(q, k, v, salt):
            return xla_attention(q + 0 * salt, k, v, bias, H)

        def g_pallas(q, k, v, salt):
            return jax.grad(
                lambda q: jnp.sum(
                    fused_attention(q, k, v, bias, seed, H, 0.0)
                )
            )(q + 0 * salt)

        def g_xla(q, k, v, salt):
            return jax.grad(
                lambda q: jnp.sum(xla_attention(q, k, v, bias, H))
            )(q + 0 * salt)

        err = float(jnp.max(jnp.abs(
            fused_attention(q, k, v, bias, seed, H, 0.0)
            - xla_attention(q, k, v, bias, H)
        )))
        for name, f, mult in (
            ("pallas fwd", f_pallas, 1), ("xla fwd", f_xla, 1),
            ("pallas fwd+bwd", g_pallas, 3), ("xla fwd+bwd", g_xla, 3),
        ):
            try:
                dt = device_time(f, (q, k, v))
            except Exception as e:  # noqa: BLE001
                report(f"attention[T={t}] {name}: FAILED {type(e).__name__}: {e}")
                continue
            tf = mult * flops / dt / 1e12
            report(
                f"attention[B={B},T={t},D={D},h={H}] {name}: {dt*1e6:8.0f} us "
                f"~{tf:6.2f} TF/s  maxdiff={err:.2e}"
            )


def bench_scoring(report):
    import jax
    import jax.numpy as jnp

    from amid_tpu.ops.pallas_scoring import scoring_head_pallas

    rng = np.random.default_rng(0)
    B, C, D, H = 256, 1000, 128, 32
    user = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(B, C, D)).astype(np.float32))
    ku = jnp.asarray(rng.normal(size=(D, H)).astype(np.float32) * 0.05)
    ki = jnp.asarray(rng.normal(size=(D, H)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((H,), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(H, 1)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((1,), jnp.float32)

    def xla_head(user, items, salt):
        u_part = (user + 0 * salt) @ ku
        i_part = jnp.einsum("bcd,dh->bch", items, ki)
        hidden = jax.nn.relu(u_part[:, None, :] + i_part + b1)
        return jax.nn.sigmoid(jnp.einsum("bch,ho->bco", hidden, k2)[..., 0] + b2[0])

    def f_pallas(user, items, salt):
        return scoring_head_pallas(user + 0 * salt, items, ku, ki, b1, k2, b2)

    flops = 2 * B * C * (2 * D * H + H)
    for name, f in (("pallas", f_pallas), ("xla", xla_head)):
        try:
            dt = device_time(f, (user, items))
        except Exception as e:  # noqa: BLE001
            report(f"scoring {name}: FAILED {type(e).__name__}: {e}")
            continue
        gb = (B * C * D * 4) / dt / 1e9
        report(
            f"scoring[B={B},C={C},D={D},H={H}] {name}: {dt*1e6:8.0f} us "
            f"{flops/dt/1e12:6.2f} TF/s  {gb:6.0f} GB/s item-read"
        )


def bench_embedding(report):
    import jax
    import jax.numpy as jnp

    from amid_tpu.ops.pallas_embedding import embedding_gather_pallas

    rng = np.random.default_rng(0)
    V, D = 894820, 128
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    n = 256 * 302  # one flagship step's worth of lookups
    ids = jnp.asarray(rng.integers(0, V, (n,), dtype=np.int32))
    w = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))

    # Non-factorable consumer (XLA rewrites sum-of-gather into a row-sum
    # precompute + scalar gather otherwise); salt perturbs ids via roll.
    def f_xla(table, ids, w, salt):
        i = jnp.roll(ids, salt.astype(jnp.int32))
        return jnp.take(table, i, axis=0) * w

    def f_pallas(table, ids, w, salt):
        i = jnp.roll(ids, salt.astype(jnp.int32))
        return embedding_gather_pallas(table, i) * w

    err = float(jnp.max(jnp.abs(
        embedding_gather_pallas(table, ids[:1024])
        - jnp.take(table, ids[:1024], axis=0)
    )))
    bytes_ = n * D * 4 * 3  # row read + weighted write (+w read)
    for name, f in (("pallas", f_pallas), ("xla", f_xla)):
        try:
            dt = device_time(f, (table, ids, w), iters=10)
        except Exception as e:  # noqa: BLE001
            report(f"embedding {name}: FAILED {type(e).__name__}: {e}")
            continue
        report(
            f"embedding-gather[{n} rows of {V}x{D}] {name}: {dt*1e6:8.0f} us "
            f"{bytes_/dt/1e9:6.0f} GB/s  maxdiff={err:.1e}"
        )


def device_time_carry(step, init, probe, iters=50):
    """Like device_time, but the op maps carry->carry (table-update chains):
    iteration i+1 consumes iteration i's output buffer, so a donated
    (input-output-aliased) kernel is timed without a phantom full-table copy,
    and the per-iteration probe reads a few updated rows (cheap) instead of
    summing the whole table (a 3.5 GB read that would swamp the scatter).
    RTT-corrected like device_time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(init):
        def body(c, _):
            c2 = step(c)
            return c2, probe(c2)

        _, probes = jax.lax.scan(body, init, None, length=iters)
        return probes

    compiled = loop.lower(init).compile()
    np.asarray(compiled(init))  # warmup; host fetch forces real completion
    times = []
    for _ in range(3):
        times.append(_timed(lambda: np.asarray(compiled(init))))
    return max(min(times) - tunnel_rtt(), 0.0) / iters


def bench_scatter(report):
    """Table-update primitives: the train step's scatter-add (grad transpose),
    the lazy path's unique-row scatter (XLA vs the per-row-DMA pallas
    kernel), vs full-table traffic. NB: standalone scatter numbers here do
    NOT predict in-step cost — XLA's scatter fused into the donated lazy
    train step runs ~3x faster than standalone (docs/PERF.md scatter
    study); dispatch decisions were made on in-situ step timings."""
    import jax.numpy as jnp

    from amid_tpu.ops.pallas_scatter import scatter_set_unique_pallas

    rng = np.random.default_rng(0)
    V, D, N, U = 894820, 128, 10752, 8192
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, N, dtype=np.int32))
    uniq = jnp.asarray(np.unique(rng.integers(0, V, N).astype(np.int32))[:U])
    upd = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 1e-6)

    def probe(c):
        t, _ = c
        return jnp.sum(jnp.take(t, uniq[:8], axis=0))

    def mk(update):
        return lambda c: (update(c[0], c[1]), c[1] + 1)

    cases = (
        (f"scatter-add {N} dup rows", 3 * N * D * 4,
         lambda t, s: t.at[ids].add(upd * (1.0 + 1e-9 * s))),
        (f"xla scatter-add {U} sorted-unique rows", 3 * U * D * 4,
         lambda t, s: t.at[uniq].add(upd[:U] * (1.0 + 1e-9 * s))),
        (f"xla scatter-set {U} sorted-unique rows", 2 * U * D * 4,
         lambda t, s: t.at[uniq].set(upd[:U] * (1.0 + 1e-9 * s))),
        (f"pallas scatter-set {U} sorted-unique rows", 2 * U * D * 4,
         lambda t, s: scatter_set_unique_pallas(
             t, uniq, upd[:U] * (1.0 + 1e-9 * s))),
        ("full-table elementwise (3.5 GB r+w)", 2 * V * D * 4,
         lambda t, s: t * (1.0 + 1e-9 * s)),
    )
    for name, bytes_, update in cases:
        try:
            dt = device_time_carry(mk(update), (table, jnp.float32(0)), probe)
        except Exception as e:  # noqa: BLE001
            report(f"scatter {name}: FAILED {type(e).__name__}: {e}")
            continue
        report(f"scatter[{name}]: {dt*1e6:8.0f} us {bytes_/dt/1e9:6.0f} GB/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="all")
    args = ap.parse_args()
    lines = []

    def report(s):
        print(s, flush=True)
        lines.append(s)

    if args.kernel in ("all", "affinity"):
        bench_affinity(report)
    if args.kernel in ("all", "attention"):
        bench_attention(report)
    if args.kernel in ("all", "scoring"):
        bench_scoring(report)
    if args.kernel in ("all", "embedding"):
        bench_embedding(report)
    if args.kernel in ("all", "scatter"):
        bench_scatter(report)
