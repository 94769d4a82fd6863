"""Measure XLA's batched Cholesky vs a hand-blocked right-looking version.

Bench config 2 (64 x 1k x 1k) spends ~97 ms in lax.linalg.cholesky (~0.5%
MFU).  A right-looking blocked formulation turns the trailing update into
large batched matmuls (MXU) with only n/block sequential steps.

Run: timeout 900 python scripts/profile_blocked_chol.py > /tmp/prof_bchol.log 2>&1
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def blocked_cholesky(a: jax.Array, block: int = 256) -> jax.Array:
    """Lower Cholesky of PSD ``a`` (..., n, n), right-looking, unrolled.

    Requires n % block == 0 (caller pads).  Trailing updates at HIGHEST
    precision (f32-true on TPU).
    """
    n = a.shape[-1]
    nb = n // block
    out = jnp.zeros_like(a)
    for i in range(nb):
        s = i * block
        # diagonal block, updated by previously computed panels
        li = out[..., s : s + block, :s]
        aii = a[..., s : s + block, s : s + block]
        aii = aii - jnp.matmul(li, jnp.swapaxes(li, -1, -2), precision=HIGHEST)
        lii = lax.linalg.cholesky(aii)
        out = out.at[..., s : s + block, s : s + block].set(lii)
        if i + 1 < nb:
            lj = out[..., s + block :, :s]
            aji = a[..., s + block :, s : s + block]
            aji = aji - jnp.matmul(lj, jnp.swapaxes(li, -1, -2), precision=HIGHEST)
            panel = lax.linalg.triangular_solve(
                lii, aji, left_side=False, lower=True, transpose_a=True
            )
            out = out.at[..., s + block :, s : s + block].set(panel)
    return out


def timed(name, fn, *args, runs=5):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s (sum {s:.3e})", flush=True)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / runs
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


@functools.partial(jax.jit, static_argnums=(0, 1))
def make_psd(b, n):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, n), dtype=jnp.float32) / jnp.sqrt(float(n))
    return jnp.matmul(x, jnp.swapaxes(x, -1, -2), precision=HIGHEST) + 2.0 * jnp.eye(
        n, dtype=jnp.float32
    )


def main():
    b, n = 64, 1024
    a = make_psd(b, n)
    a.block_until_ready()

    # correctness on CPU-ish small check first (still on device, compare)
    ref = jax.jit(lax.linalg.cholesky)
    timed("xla_cholesky", ref, a)

    for blk in (128, 256, 512):
        fn = jax.jit(functools.partial(blocked_cholesky, block=blk))
        dt = timed(f"blocked_chol(b={blk})", fn, a)
        # correctness vs reconstruction
        err_fn = jax.jit(
            lambda a, fn=fn: jnp.max(
                jnp.abs(
                    jnp.matmul(
                        fn(a), jnp.swapaxes(fn(a), -1, -2), precision=HIGHEST
                    )
                    - a
                )
            )
        )
        print(f"  max |LL^T - A| = {float(err_fn(a)):.2e}", flush=True)

    # bigger single matrix: n=4096, b=4
    a2 = make_psd(4, 4096)
    a2.block_until_ready()
    timed("xla_cholesky_4x4096", ref, a2)
    for blk in (256, 512):
        fn = jax.jit(functools.partial(blocked_cholesky, block=blk))
        timed(f"blocked_chol_4x4096(b={blk})", fn, a2)
    print("exit-ok", flush=True)


if __name__ == "__main__":
    main()
