"""Row-gather microbenchmark: XLA gather vs Pallas DMA gather.

The E+F step is gather-bound (r3 session-5 audit: ~58 GB/s effective on
XLA row gathers while the r4 calib row measures ~400 GB/s HBM stream).
Every layout application in the TP-scatter family is a row gather of a
[E, D] array (D=288 node features, 352 radial weights, 9 SH): if a Pallas
kernel with many outstanding per-row DMAs beats jnp.take, the whole glue
layer gets faster.

Measures, on the real chip:
  * jnp.take(src, idx, axis=0)  (XLA gather, the current _take_ib)
  * pallas_row_gather(src, idx) (N_BUF outstanding row DMAs per chunk)
for [E, D] f32/bf16 at the 23k-scale shapes.

Run: python tools/gather_microbench.py [--rows 430080] [--dim 288]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_row_gather(src, idx, block_e: int = 512, n_buf: int = 16):
    """out[i] = src[idx[i]]: per-row HBM->VMEM DMAs, n_buf outstanding.

    Mosaic cannot DMA a single row of a (8,128)-tiled 2D HBM memref
    ("slice along dim 0 must be aligned to tiling (8)"), so both source and
    destination are viewed as 1D with the row width padded to a multiple of
    128 lanes — 1D refs tile as (128,), and row offsets stay lane-aligned.
    """
    E = idx.shape[0]
    D = src.shape[1]
    # 1D HBM memrefs tile at (1024,) f32: slice offsets/sizes must be
    # 1024-aligned, so rows pad to 1024 floats (read amplification
    # 1024/D; the DMA's raw bandwidth must beat XLA's gather by more
    # than that factor to win)
    Dp = ((D + 1023) // 1024) * 1024
    if Dp != D:
        src = jnp.pad(src, ((0, 0), (0, Dp - D)))
    E_pal = ((E + block_e - 1) // block_e) * block_e
    idx_pal = jnp.pad(idx, (0, E_pal - E))
    G = E_pal // block_e
    src1 = src.reshape(-1)

    def kernel(idx_ref, src_ref, out_ref):
        # idx_ref: [1, block_e] int32 in SMEM (blocked per grid step — the
        # full index array is 1.7 MB at 430k rows, over the 1 MB SMEM budget
        # that sank the scalar-prefetch version; 1D SMEM blocks must tile at
        # 1024 so it rides as a 2D (G, block_e) view)
        def body(sem):
            def get_dma(i):
                row = idx_ref[0, 0, i]
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(row * Dp, Dp)],
                    out_ref.at[pl.ds(i * Dp, Dp)],
                    sem.at[i % n_buf],
                )

            for i in range(n_buf):
                get_dma(i).start()

            def loop(i, _):
                get_dma(i).wait()

                @pl.when(i + n_buf < block_e)
                def _():
                    get_dma(i + n_buf).start()

                return ()

            jax.lax.fori_loop(0, block_e, loop, ())

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((n_buf,)))

    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1, block_e), lambda g: (g, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((block_e * Dp,), lambda g: (g,)),
        out_shape=jax.ShapeDtypeStruct((E_pal * Dp,), src.dtype),
        interpret=(jax.default_backend() == "cpu"),
    )(idx_pal.reshape(G, 1, block_e), src1)
    return out.reshape(E_pal, Dp)[:E, :D]


def bench(fn, *args, steps=8):
    out = fn(*args)
    np.asarray(out[0, 0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / steps


def make_idx(pattern, rows, src_rows, block_e, rng):
    """Index streams with different locality, modelling layout choices.

    * ``random``  — r4 baseline: uniform rows (the un-sorted x_lay gather).
    * ``sorted``  — globally ascending with duplicates (best case).
    * ``local``   — per-``block_e`` chunk: ascending draws from a +-window
      around the chunk's node-tile position — the pattern a within-tile
      src-sort of the edge stream produces (chunks revisit overlapping
      windows, rows ascend within each chunk).
    * ``tilewin`` — like ``local`` but NOT sorted within the chunk
      (window-local random): isolates window locality from sortedness.
    """
    if pattern == "random":
        v = rng.randint(0, src_rows, rows)
    elif pattern == "sorted":
        v = np.sort(rng.randint(0, src_rows, rows))
    elif pattern in ("local", "tilewin"):
        G = rows // block_e
        win = max(4 * block_e, src_rows // 16)  # ~6k-row window at 23k scale
        v = np.empty(rows, np.int64)
        for g in range(G):
            center = int((g + 0.5) * src_rows / G)
            lo = max(0, min(center - win // 2, src_rows - win))
            chunk = lo + rng.randint(0, win, block_e)
            if pattern == "local":
                chunk = np.sort(chunk)
            v[g * block_e : (g + 1) * block_e] = chunk
    else:
        raise SystemExit(f"unknown --pattern {pattern}")
    return jnp.asarray(v, dtype=jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=430080)  # ~23k-scale E_pal
    ap.add_argument("--src-rows", type=int, default=430080)
    ap.add_argument("--dim", type=int, default=288)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--block-e", type=int, default=512)
    ap.add_argument("--n-buf", type=int, default=16)
    ap.add_argument("--pattern", type=str, default="random",
                    help="random|sorted|local|tilewin (see make_idx)")
    ap.add_argument("--skip-pallas", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    idx = make_idx(args.pattern, args.rows, args.src_rows, args.block_e, rng)

    # XLA gather bandwidth vs row width (is jnp.take width-bound?)
    take = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    for D in (128, 288, 352, 1024, 1120):
        src = jnp.asarray(
            rng.standard_normal((args.src_rows, D)), dtype=args.dtype
        )
        nbytes = args.rows * D * src.dtype.itemsize
        dt = bench(take, src, idx)
        print(
            f"jnp.take[{args.pattern}]  D={D:5d} : {dt * 1e3:8.2f} ms  "
            f"{nbytes / dt / 1e9:7.1f} GB/s"
        )

    src = jnp.asarray(
        rng.standard_normal((args.src_rows, args.dim)), dtype=args.dtype
    )
    nbytes = args.rows * args.dim * src.dtype.itemsize
    if args.skip_pallas:
        return
    for n_buf in (8, 16, 32):
        pg = jax.jit(
            functools.partial(
                pallas_row_gather, block_e=args.block_e, n_buf=n_buf
            )
        )
        dt = bench(pg, src, idx)
        Dp = ((args.dim + 1023) // 1024) * 1024
        raw = args.rows * Dp * src.dtype.itemsize
        print(
            f"pallas DMA gather  : {dt * 1e3:8.2f} ms  {nbytes / dt / 1e9:7.1f}"
            f" GB/s useful ({raw / dt / 1e9:7.1f} raw)"
            f"   (block_e={args.block_e}, n_buf={n_buf}, Dp={Dp})"
        )

    # correctness
    pg = jax.jit(functools.partial(pallas_row_gather, block_e=args.block_e))
    np.testing.assert_array_equal(
        np.asarray(pg(src, idx)), np.asarray(take(src, idx))
    )
    print("parity OK")


if __name__ == "__main__":
    main()
