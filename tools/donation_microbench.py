"""Isolate the buffer-donation pathology (ROUND5 train-step attribution).

The full fr train step runs 34x slower when jitted with
``donate_argnums=(0,)`` (16.3 s vs 0.47 s at 23k atoms, same function, same
inputs).  This micro-probe times a trivial elementwise program over a large
buffer with and without donation, and a small-pytree variant shaped like a
TrainState (many small param leaves), to establish whether the pathology is
(a) runtime-level (any donated executable pays it), (b) buffer-count-level
(many aliased leaves), or (c) specific to the train step's structure.

Usage: python tools/donation_microbench.py [--mib 1024] [--iters 8]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--leaves", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    def timed(label, mk_fn, mk_x, donate):
        fn = jax.jit(mk_fn, donate_argnums=(0,) if donate else ())
        x = mk_x()
        x = fn(x)  # warm/compile
        jax.block_until_ready(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])  # tunnel-safe sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = fn(x)
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:52s} {ms:9.2f} ms", flush=True)
        return ms

    n = args.mib * 1024 * 1024 // 4

    # (a) one big buffer, elementwise
    for donate in (False, True):
        timed(
            f"big-buffer ({args.mib} MiB) donate={donate}",
            lambda x: x * 1.0000001 + 1e-9,
            lambda: jnp.ones((n,), jnp.float32),
            donate,
        )

    # (b) many small leaves (TrainState-shaped pytree)
    def tree_fn(tree):
        return jax.tree.map(lambda a: a * 1.0000001 + 1e-9, tree)

    for donate in (False, True):
        timed(
            f"pytree ({args.leaves} leaves x 64 KiB) donate={donate}",
            tree_fn,
            lambda: {f"p{i}": jnp.ones((128, 128), jnp.float32)
                     for i in range(args.leaves)},
            donate,
        )

    # (c) mixed: one big donated buffer + a chain of matmuls reading it
    def chain(x, w):
        y = x
        for _ in range(4):
            y = jnp.tanh(y @ w)
        return y, w

    for donate in (False, True):
        fn = jax.jit(chain, donate_argnums=(0, 1) if donate else ())
        x = jnp.ones((4096, 4096), jnp.float32)
        w = jnp.eye(4096, dtype=jnp.float32) * 0.99
        x, w = fn(x, w)
        np.asarray(x[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x, w = fn(x, w)
        np.asarray(x[0, 0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{'matmul chain (4096^2) donate=' + str(donate):52s} {ms:9.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
