"""Does XLA's TPU row-gather speed depend on the index pattern?

Times jnp.take(x, idx) for several index distributions at model shapes
(N=23328 nodes, E=430k edges, D=288 f32) to decide whether re-ordering the
relaid edge stream (within-chunk src-sort — free at layout time) or any
other index massaging can raise the ~33 GB/s effective gather bandwidth
(tools/gather_microbench.py, ROUND4_NOTES.md).

Patterns:
  random    — uniform random rows (the microbench baseline)
  sorted    — globally sorted indices (best case: monotone, coalescable)
  blocksort — sorted within each 256-row block (what a within-chunk
              src-sort of the relaid stream would give)
  local     — random within a +-650-row window sliding with the stream
              (what spatial node ordering gives without any sort)
  iota      — contiguous 0..N-1 repeating (degenerate best case)
  same      — all rows identical (pure row-reuse)

Usage: python tools/gather_pattern_probe.py [--rows 430080] [--n 23328] [--d 288]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=430080)
    ap.add_argument("--n", type=int, default=23328)
    ap.add_argument("--d", type=int, default=288)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    E, N, D = args.rows, args.n, args.d
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    idx_random = rng.randint(0, N, E)
    idx_sorted = np.sort(idx_random)
    idx_blocksort = idx_random.reshape(-1, 256).copy()
    idx_blocksort.sort(axis=1)
    idx_blocksort = idx_blocksort.reshape(-1)
    centers = (np.arange(E) * (N / E)).astype(np.int64)
    idx_local = np.clip(
        centers + rng.randint(-650, 651, E), 0, N - 1
    ).astype(np.int32)
    idx_iota = (np.arange(E) % N).astype(np.int32)
    idx_same = np.full(E, N // 2, np.int32)

    take = jax.jit(lambda a, i: jnp.take(a, i, axis=0, mode="clip"))

    for name, idx in [
        ("random", idx_random),
        ("sorted", idx_sorted),
        ("blocksort", idx_blocksort),
        ("local", idx_local),
        ("iota", idx_iota),
        ("same", idx_same),
    ]:
        ij = jnp.asarray(idx, jnp.int32)
        out = take(x, ij)
        np.asarray(out[0, 0])  # sync
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = take(x, ij)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / args.reps
        gb = E * D * 4 / 1e9
        print(f"{name:10s} {dt*1e3:8.2f} ms  {gb/dt:7.1f} GB/s  {dt/E*1e9:6.1f} ns/row")


if __name__ == "__main__":
    main()
