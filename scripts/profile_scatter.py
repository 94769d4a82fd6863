"""Compare scatter-add strategies for left_t_interp (SKI W^T @ rhs) at the
config-4b scale: n=200k points, k=16 weights, t=11 columns, M=65536 grid.

Run: timeout 890 python scripts/profile_scatter.py > /tmp/prof_scatter.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, runs=10):
    t0 = time.perf_counter()
    s = float(jnp.sum(fn(*args)))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s (sum {s:.4e})",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(runs):
        s = float(jnp.sum(fn(*args)))
    dt = (time.perf_counter() - t0) / runs
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    n, k, t, M = 200_000, 4, 11, 65_536
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    @jax.jit
    def make():
        # clustered indices like real SKI cells: base cell + local offsets
        base = jax.random.randint(k1, (n, 1), 0, M - 260)
        off = jnp.asarray([0, 1, 256, 257])
        idx = base + off[None, :]  # (n, 4)
        vals = jax.random.normal(k2, (n, k), dtype=jnp.float32)
        rhs = jax.random.normal(k3, (n, t), dtype=jnp.float32)
        return idx.astype(jnp.int32), vals, rhs

    idx, vals, rhs = make()
    _ = float(jnp.sum(rhs))

    def scatter_at(idx, vals, rhs):
        contrib = vals[..., None] * rhs[:, None, :]  # (n, k, t)
        flat_idx = idx.reshape(-1)
        flat_c = contrib.reshape(-1, t)
        out = jnp.zeros((M, t), jnp.float32)
        return out.at[flat_idx, :].add(flat_c)

    def seg_sorted(idx, vals, rhs):
        contrib = vals[..., None] * rhs[:, None, :]
        flat_idx = idx.reshape(-1)
        flat_c = contrib.reshape(-1, t)
        order = jnp.argsort(flat_idx)
        return jax.ops.segment_sum(
            flat_c[order], flat_idx[order], num_segments=M,
            indices_are_sorted=True,
        )

    def seg_sorted_precomp(order, sidx, vals, rhs):
        # sort permutation precomputed once per operator (indices are static
        # per dataset); per-iteration cost = gather by order + segment_sum
        contrib = vals[..., None] * rhs[:, None, :]
        flat_c = contrib.reshape(-1, t)
        return jax.ops.segment_sum(
            flat_c[order], sidx, num_segments=M, indices_are_sorted=True
        )

    def onehot_mm(idx, vals, rhs):
        # blocked one-hot matmul: MXU does the reduction; cost M*n_blk flops
        contrib = vals[..., None] * rhs[:, None, :]  # (n, k, t)
        flat_idx = idx.reshape(-1)
        flat_c = contrib.reshape(-1, t)

        def body(carry, blk):
            bi, bc = blk
            oh = jax.nn.one_hot(bi, M, dtype=jnp.float32)  # (blk, M)
            return carry + oh.T @ bc, None

        nb = 16
        bi = flat_idx.reshape(nb, -1)
        bc = flat_c.reshape(nb, -1, t)
        out, _ = jax.lax.scan(body, jnp.zeros((M, t), jnp.float32), (bi, bc))
        return out

    timed("scatter_at", jax.jit(scatter_at), idx, vals, rhs)
    timed("seg_sorted(in-graph sort)", jax.jit(seg_sorted), idx, vals, rhs)

    flat_idx = idx.reshape(-1)
    order = jnp.argsort(flat_idx)
    sidx = flat_idx[order]
    _ = float(jnp.sum(sidx))
    timed("seg_sorted(precomputed)", jax.jit(seg_sorted_precomp),
          order, sidx, vals, rhs)

    r1 = jax.jit(scatter_at)(idx, vals, rhs)
    r2 = jax.jit(seg_sorted)(idx, vals, rhs)
    r3 = jax.jit(seg_sorted_precomp)(order, sidx, vals, rhs)
    print("max|seg-scatter|:", float(jnp.max(jnp.abs(r2 - r1))), flush=True)
    print("max|pre-scatter|:", float(jnp.max(jnp.abs(r3 - r1))), flush=True)
    print("exit-ok", flush=True)


if __name__ == "__main__":
    main()
