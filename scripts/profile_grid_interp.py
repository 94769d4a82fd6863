"""Prototype: gather/scatter-free SKI pieces on TPU.

Hypotheses (from prof_ski.log: matvec 47 ms = scatter 43 + kron 29 + gather 31
isolated, all dynamic-index bound at the per-row DMA floor):
  a) ToeplitzLinearOperator.to_dense's fancy-index gather (col[|i-j|], 65k
     elements) is what makes the "dense" grid matvec cost 29 ms; a one-hot
     matmul densification or precomputed dense factors should cut it to ~2 ms.
  b) The grid interpolation W (row-wise Khatri-Rao over dims) can be applied
     with NO dynamic indexing: per-dim one-hot (iota comparison, VPU) +
     dense MXU matmuls, blocked over points.

Run: timeout 1200 python scripts/profile_grid_interp.py > /tmp/prof_gi.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def timed(name, fn, *args, runs=5):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(jnp.asarray(out).astype(jnp.float32)))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s (sum {s:.3e})", flush=True)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
        s = float(jnp.sum(jnp.asarray(out).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / runs
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# ---------------- one-hot grid interpolation prototypes ----------------

def _onehot_w(idx, w, m, dtype):
    # idx/w: (B, k) -> dense (B, m) row-interp matrix; pure VPU iota compare.
    oh = (idx[..., None] == jnp.arange(m, dtype=idx.dtype)).astype(dtype)
    return jnp.sum(oh * w[..., None], axis=-2)


def grid_t_interp_2d(i1, w1, i2, w2, v, m1, m2, block, precision):
    """W^T v for W = rowwise-kron(W1, W2): (n, t) -> (m1*m2, t), no scatter."""
    n, t = v.shape
    pad = (-n) % block
    if pad:
        i1 = jnp.pad(i1, ((0, pad), (0, 0)))
        i2 = jnp.pad(i2, ((0, pad), (0, 0)))
        w1 = jnp.pad(w1, ((0, pad), (0, 0)))
        w2 = jnp.pad(w2, ((0, pad), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0)))
    nb = (n + pad) // block
    xs = tuple(
        a.reshape(nb, block, a.shape[-1]) for a in (i1, w1, i2, w2, v)
    )

    def body(acc, xs):
        bi1, bw1, bi2, bw2, bv = xs
        W1 = _onehot_w(bi1, bw1, m1, v.dtype)  # (B, m1)
        W2 = _onehot_w(bi2, bw2, m2, v.dtype)  # (B, m2)
        Q = (W2[:, :, None] * bv[:, None, :]).reshape(block, m2 * t)
        acc = acc + jnp.matmul(W1.T, Q, precision=precision)
        return acc, None

    acc0 = jnp.zeros((m1, m2 * t), v.dtype)
    acc, _ = lax.scan(body, acc0, xs)
    return acc.reshape(m1 * m2, t)


def grid_interp_2d(i1, w1, i2, w2, g, m1, m2, block, precision):
    """W g for the same W: (m1*m2, t) -> (n, t), no gather."""
    t = g.shape[-1]
    n = i1.shape[0]
    pad = (-n) % block
    if pad:
        i1 = jnp.pad(i1, ((0, pad), (0, 0)))
        i2 = jnp.pad(i2, ((0, pad), (0, 0)))
        w1 = jnp.pad(w1, ((0, pad), (0, 0)))
        w2 = jnp.pad(w2, ((0, pad), (0, 0)))
    nb = (n + pad) // block
    xs = tuple(a.reshape(nb, block, a.shape[-1]) for a in (i1, w1, i2, w2))
    gr = g.reshape(m1, m2 * t)

    def body(_, xs):
        bi1, bw1, bi2, bw2 = xs
        W1 = _onehot_w(bi1, bw1, m1, g.dtype)
        W2 = _onehot_w(bi2, bw2, m2, g.dtype)
        C = jnp.matmul(W1, gr, precision=precision).reshape(block, m2, t)
        out = jnp.sum(C * W2[:, :, None], axis=1)  # (B, t)
        return None, out

    _, outs = lax.scan(body, None, xs)
    return outs.reshape(-1, t)[:n]


def toeplitz_dense_onehot(col):
    n = col.shape[-1]
    i = jnp.arange(n)
    d = jnp.abs(i[:, None] - i[None, :])  # (n, n)
    oh = (d[..., None] == jnp.arange(n)).astype(col.dtype)  # (n, n, n)
    return jnp.einsum("ijk,k->ij", oh, col)


def toeplitz_dense_gather(col):
    n = col.shape[-1]
    i = jnp.arange(n)
    idx = jnp.abs(i[:, None] - i[None, :])
    return col[idx]


def main():
    from linear_operator_tpu.models.ski import (
        GridSpec,
        SKIGPRegression,
        linear_interp_weights,
    )
    from linear_operator_tpu.utils.sparse import left_interp, left_t_interp

    n, gs, t = 200_000, 256, 11
    key = jax.random.PRNGKey(0)

    # STATIC grid bounds (x ~ U[0,1]; pad 0.1 like make_grid) — avoids eager
    # reductions and const-embedded device arrays, both of which hang/crawl
    # over the axon tunnel.
    grid = GridSpec(
        mins=jnp.array([-0.1, -0.1], jnp.float32),
        maxs=jnp.array([1.1, 1.1], jnp.float32),
        sizes=(gs, gs),
    )
    mins = (-0.1, -0.1)
    maxs = (1.1, 1.1)
    model = SKIGPRegression(grid)

    @jax.jit
    def make_data():
        x = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(2), (n, t), dtype=jnp.float32)
        vg = jax.random.normal(jax.random.PRNGKey(3), (gs * gs, t), dtype=jnp.float32)
        params = model.init_params(2)

        # per-dim interp weights with static bounds
        idxs, ws = [], []
        for d in range(2):
            m = gs
            h = (maxs[d] - mins[d]) / (m - 1)
            pos = jnp.clip((x[:, d] - mins[d]) / h, 0.0, m - 1 - 1e-6)
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            idxs.append(jnp.stack([i0, i0 + 1], axis=-1))
            ws.append(jnp.stack([1.0 - frac, frac], axis=-1))
        li, lv = linear_interp_weights(x, grid)
        return x, v, vg, params, idxs[0], idxs[1], ws[0], ws[1], li, lv

    t0 = time.perf_counter()
    x, v, vg, params, i1, i2, w1, w2, li, lv = make_data()
    print(f"make_data: {time.perf_counter()-t0:.1f}s", flush=True)

    # --- correctness on small slice (jitted, all arrays as args) ---
    ns = 4096

    @jax.jit
    def corr_checks(li, lv, v, vg, i1, w1, i2, w2):
        ref_s = left_t_interp(li[:ns], lv[:ns], v[:ns], gs * gs)
        new_s = grid_t_interp_2d(
            i1[:ns], w1[:ns], i2[:ns], w2[:ns], v[:ns], gs, gs, 1024,
            jax.lax.Precision.HIGHEST,
        )
        err = jnp.max(jnp.abs(ref_s - new_s)) / (jnp.max(jnp.abs(ref_s)) + 1e-30)
        ref_g = left_interp(li[:ns], lv[:ns], vg)
        new_g = grid_interp_2d(
            i1[:ns], w1[:ns], i2[:ns], w2[:ns], vg, gs, gs, 1024,
            jax.lax.Precision.HIGHEST,
        )
        errg = jnp.max(jnp.abs(ref_g - new_g)) / (jnp.max(jnp.abs(ref_g)) + 1e-30)
        return err, errg

    err, errg = corr_checks(li, lv, v, vg, i1, w1, i2, w2)
    print(f"scatter-free correctness (rel max err): {float(err):.2e}", flush=True)
    print(f"gather-free correctness (rel max err): {float(errg):.2e}", flush=True)

    # --- baselines ---
    timed("scatter left_t_interp (current)",
          jax.jit(lambda li, lv, v: left_t_interp(li, lv, v, gs * gs)), li, lv, v, runs=10)
    timed("gather left_interp (current)",
          jax.jit(lambda li, lv, vg: left_interp(li, lv, vg)), li, lv, vg, runs=10)

    # --- one-hot prototypes: block sizes x precision ---
    for B in (4096, 16384):
        for prec, pname in ((jax.lax.Precision.DEFAULT, "bf16"),
                            (jax.lax.Precision.HIGH, "3pass")):
            timed(
                f"onehot t_interp B={B} {pname}",
                jax.jit(lambda i1, w1, i2, w2, v, B=B, prec=prec: grid_t_interp_2d(
                    i1, w1, i2, w2, v, gs, gs, B, prec)),
                i1, w1, i2, w2, v, runs=10,
            )
            timed(
                f"onehot interp B={B} {pname}",
                jax.jit(lambda i1, w1, i2, w2, vg, B=B, prec=prec: grid_interp_2d(
                    i1, w1, i2, w2, vg, gs, gs, B, prec)),
                i1, w1, i2, w2, vg, runs=10,
            )

    # --- toeplitz densification + kron matvec ---
    timed("kron matvec via operator (current)",
          jax.jit(lambda params, vg: model.grid_operator(params)._matmul(vg)),
          params, vg, runs=10)

    timed("toeplitz to_dense gather (n=256)",
          jax.jit(lambda params: toeplitz_dense_gather(
              model.grid_operator(params).factors[0].column)), params, runs=10)
    timed("toeplitz to_dense onehot (n=256)",
          jax.jit(lambda params: toeplitz_dense_onehot(
              model.grid_operator(params).factors[0].column)), params, runs=10)

    def kron_dense_matvec(params, vg):
        kg = model.grid_operator(params)
        T1 = toeplitz_dense_gather(kg.factors[0].column)
        T2 = toeplitz_dense_gather(kg.factors[1].column)
        z = vg.reshape(gs, gs, t)
        z = jnp.einsum("ij,jkt->ikt", T1, z, precision=jax.lax.Precision.HIGH)
        z = jnp.einsum("kl,ilt->ikt", T2, z, precision=jax.lax.Precision.HIGH)
        return z.reshape(gs * gs, t)

    timed("kron matvec densify+dense (fused)", jax.jit(kron_dense_matvec),
          params, vg, runs=10)

    # --- full SKI operator matvec: flat (scatter/gather) vs grid (one-hot) ---
    def ski_matvec(params, x, v, flat):
        K = (
            model.covariance(params, x)
            if not flat
            else _flat_cov(params, x)
        ).add_diagonal(jnp.asarray(0.1, v.dtype))
        return K._matmul(v)

    def _flat_cov(params, x):
        from linear_operator_tpu.operators import InterpolatedLinearOperator
        from linear_operator_tpu.models.ski import linear_interp_weights

        kg = model.grid_operator(params)
        li2, lv2 = linear_interp_weights(x, grid)
        return InterpolatedLinearOperator(kg, li2, lv2, li2, lv2)

    timed("SKI matvec flat scatter (current)",
          jax.jit(lambda params, x, v: ski_matvec(params, x, v, True)),
          params, x, v, runs=10)
    timed("SKI matvec grid one-hot (new)",
          jax.jit(lambda params, x, v: ski_matvec(params, x, v, False)),
          params, x, v, runs=10)

    @jax.jit
    def ski_err(params, x, v):
        a = ski_matvec(params, x, v[:, :2], True)
        b = ski_matvec(params, x, v[:, :2], False)
        return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30)

    print(f"SKI grid-vs-flat matvec rel err: {float(ski_err(params, x, v)):.2e}",
          flush=True)

    # sanity: dense-kron vs operator
    @jax.jit
    def kron_err(params, vg):
        ref_k = model.grid_operator(params)._matmul(vg)
        new_k = kron_dense_matvec(params, vg)
        return jnp.max(jnp.abs(ref_k - new_k)) / (jnp.max(jnp.abs(ref_k)) + 1e-30)

    errk = float(kron_err(params, vg))
    print(f"kron dense correctness (rel max err): {errk:.2e}", flush=True)
    print("exit-ok", flush=True)


if __name__ == "__main__":
    main()
