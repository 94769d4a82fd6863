"""Isolate the cached-tile mat-vec floor: DMA streaming vs dot cost vs
per-step overhead.

Run:  timeout 1800 python scripts/profile_cached2.py > /tmp/prof_c2.log 2>&1
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linear_operator_tpu.ops.rbf import (
    _pad_axis,
    _round_up,
    _triangle_maps,
    rbf_build_sym_tiles,
)


def make_variant_kernel(tile: int, variant: str):
    def _contract(vt, k, trans_k, passes):
        dims = (((1,), (1 if trans_k else 0,)), ((), ()))

        def dd(a, b):
            return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)

        vh = vt.astype(jnp.bfloat16)
        if passes == 1:
            return dd(vh, k)
        vl = (vt - vh.astype(jnp.float32)).astype(jnp.bfloat16)
        return dd(vh, k) + dd(vl, k)

    use_scratch = variant.startswith("scratch")

    def _kernel(i_ref, j_ref, k_ref, vtj_ref, vti_ref, orow_ref, ocol_ref, *scr):
        s = pl.program_id(0)
        i = i_ref[s]
        j = j_ref[s]
        k = k_ref[0]
        acc = scr[0] if use_scratch else ocol_ref

        @pl.when(s == 0)
        def _():
            acc[:] = jnp.zeros(acc.shape, acc.dtype)

        if variant == "dma_only":
            @pl.when(j >= i)
            def _():
                orow_ref[:] = k[: orow_ref.shape[0], : orow_ref.shape[1]].astype(
                    jnp.float32
                )
            return

        if variant == "noocol_1pass":
            crow = _contract(vtj_ref[:], k, True, 1)

            @pl.when(j == i)
            def _():
                orow_ref[:] = crow

            @pl.when(j > i)
            def _():
                orow_ref[:] = orow_ref[:] + crow
            return

        passes = 1 if variant.endswith("1pass") else 2
        crow = _contract(vtj_ref[:], k, True, passes)

        @pl.when(j == i)
        def _():
            orow_ref[:] = crow

        @pl.when(j > i)
        def _():
            orow_ref[:] = orow_ref[:] + crow

        @pl.when(j > i)
        def _():
            ccol = _contract(vti_ref[:], k, False, passes)
            sl = pl.dslice(j * tile, tile)
            acc[:, sl] = acc[:, sl] + ccol

        if use_scratch:
            @pl.when(s == pl.num_programs(0) - 1)
            def _():
                ocol_ref[:] = acc[:]

    return _kernel


def run_variant(tiles, v, n, tile, variant):
    t = v.shape[1]
    nblk = -(-n // tile)
    npad = nblk * tile
    tp = _round_up(t, 8)
    vt = _pad_axis(_pad_axis(v.T, 0, tp), 1, npad)
    imap, jmap = _triangle_maps(nblk)

    scratch = (
        [pltpu.VMEM((tp, npad), jnp.float32)] if variant.startswith("scratch") else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(int(imap.shape[0]),),
        in_specs=[
            pl.BlockSpec((1, tile, tile), lambda s, im, jm: (s, 0, 0)),
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, jm[s])),
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, im[s])),
        ],
        out_specs=[
            pl.BlockSpec((tp, tile), lambda s, im, jm: (0, im[s])),
            pl.BlockSpec((tp, npad), lambda s, im, jm: (0, 0)),
        ],
        scratch_shapes=scratch,
    )
    orow, ocol = pl.pallas_call(
        make_variant_kernel(tile, variant),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tp, npad), jnp.float32),
            jax.ShapeDtypeStruct((tp, npad), jnp.float32),
        ),
    )(imap, jmap, tiles, vt, vt)
    return jnp.sum(orow) + jnp.sum(ocol)


def main():
    n, d, t = 100_000, 3, 11
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(1), (n, t), dtype=jnp.float32)

    for tile in (1024,):
        build = jax.jit(lambda tl=tile: rbf_build_sym_tiles(x, tl))
        t0 = time.perf_counter()
        tiles = build()
        float(tiles[0, 0, 0].astype(jnp.float32))
        print(f"tile {tile}: build {time.perf_counter()-t0:.1f}s "
              f"({tiles.nbytes/2**30:.2f} GiB)", flush=True)
        for variant in ("noocol_1pass", "scratch_1pass", "scratch_2pass"):
            try:
                f = jax.jit(functools.partial(run_variant, n=n, tile=tile, variant=variant))
                t0 = time.perf_counter()
                out = float(f(tiles, v))
                tc = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(5):
                    out = float(f(tiles, v))
                dt = (time.perf_counter() - t0) / 5
                gbps = tiles.nbytes / dt / 2**30
                print(f"tile {tile} {variant}: {dt*1e3:.2f} ms "
                      f"({gbps:.0f} GiB/s tiles; compile {tc:.0f}s)", flush=True)
            except Exception as e:
                print(f"tile {tile} {variant}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        tiles = None

if __name__ == "__main__":
    main()
