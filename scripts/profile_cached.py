"""Profile the cached bf16-triangle-tile mat-vec engine on the real TPU.

Run:  timeout 560 python scripts/profile_cached.py > /tmp/prof5.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n, d, t = 100_000, 3, 11
    tile = 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (n, t), dtype=jnp.float32)

    from linear_operator_tpu.ops.rbf import (
        rbf_build_sym_tiles,
        rbf_matvec_sym_cached,
    )

    build = jax.jit(lambda: rbf_build_sym_tiles(x, tile))
    t0 = time.perf_counter()
    tiles = build()
    float(tiles[0, 0, 0].astype(jnp.float32))  # fence
    print(f"build compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        tiles = None  # drop the old buffer BEFORE rebuilding (2x 9.7GB OOMs)
        tiles = build()
        float(tiles[0, 0, 0].astype(jnp.float32))
    print(f"build steady: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

    for passes in (2, 1):
        # tiles must be a jit ARGUMENT — capturing a 10GB device array as a
        # closure constant makes jax embed it in the MLIR (host-fetch crash)
        mv = jax.jit(
            lambda tl, vv, p=passes: jnp.sum(rbf_matvec_sym_cached(tl, vv, n, tile, p))
        )
        t0 = time.perf_counter()
        out = float(mv(tiles, v))
        print(f"cached p{passes} compile: {time.perf_counter()-t0:.1f}s out={out:.6g}", flush=True)
        t0 = time.perf_counter()
        for _ in range(5):
            out = float(mv(tiles, v))
        dt = (time.perf_counter() - t0) / 5
        print(f"cached matvec {passes}-pass: {dt*1e3:.2f} ms = {n*n/dt/1e9:.0f} G entries/s", flush=True)

    # accuracy check at n=8192
    ns = 8192
    xs, vs = x[:ns], v[:ns]
    ref = jax.jit(
        lambda: jnp.sum(
            jnp.dot(
                jnp.exp(-0.5 * ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)),
                vs,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    )
    r = float(ref())
    ts = jax.jit(lambda: rbf_build_sym_tiles(xs, tile))()
    for passes in (2, 1):
        got = float(
            jax.jit(
                lambda tl, p=passes: jnp.sum(rbf_matvec_sym_cached(tl, vs, ns, tile, p))
            )(ts)
        )
        print(f"check p{passes}: rel={abs(got-r)/abs(r):.2e}", flush=True)


if __name__ == "__main__":
    main()
