"""Attribute MDDriver fused-block overhead at 23k (round-3 VERDICT item 9).

The r3 bench matrix measured 951 ms per MD step at 23k while the bare E+F
inference step is 270 ms — this probe decomposes the gap:

  * per-block time WITHOUT a skin rebuild (is the in-loop model call itself
    slower than the bare jit?),
  * per-block time WITH a forced rebuild (nl_pos displaced beyond half-skin),
  * device_neighbor_list alone,
  * attach_edge_layouts alone (the in-graph argsort/scan prep).

Run on the chip:  python tools/md_attribution.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _fcc_frame, _flagship_model
from nequip_tpu.data import _keys
from nequip_tpu.integrations.md import (
    MDDriver,
    VelocityVerlet,
    maxwell_boltzmann_velocities,
)

N_REQ = int(os.environ.get("NEQUIP_BENCH_ATOMS", 23000))


def main():
    model = _flagship_model(model_dtype="float32", tp_impl="pallas_fused")
    params = model.init_params()
    frame = _fcc_frame(N_REQ)
    n = len(frame[_keys.POSITIONS_KEY])
    print(f"atoms={n}")
    driver = MDDriver(
        model, params, frame, VelocityVerlet(dt_fs=2.0),
        masses=np.full(n, 63.546), skin=0.5, steps_per_block=10,
        nl_backend="device",
    )
    vel = maxwell_boltzmann_velocities(np.full(n, 63.546), 300.0, seed=1)

    # --- bare jitted E+F step for reference -----------------------------
    pos0 = jnp.asarray(driver._frame[_keys.POSITIONS_KEY], dtype=driver._dtype)
    br0 = driver._batch_rest
    driver._block_fn()
    f = driver._force_fn(pos0, br0)
    np.asarray(f[0])
    t0 = time.perf_counter()
    for _ in range(3):
        f = driver._force_fn(pos0, br0)
    np.asarray(f[0])
    bare_ms = (time.perf_counter() - t0) / 3 * 1e3
    print(f"bare E+F force_fn: {bare_ms:.1f} ms/step")

    # --- device NL alone -------------------------------------------------
    out = driver._nl_fn(pos0)
    np.asarray(out[3])
    t0 = time.perf_counter()
    for _ in range(3):
        out = driver._nl_fn(pos0)
    np.asarray(out[3])
    print(f"device_neighbor_list: {(time.perf_counter()-t0)/3*1e3:.1f} ms")

    # --- attach_edge_layouts alone ---------------------------------------
    from nequip_tpu.ops.pallas.tp_scatter import attach_edge_layouts

    stripped = {
        k: v for k, v in driver._batch.items() if not k.startswith("__edge_layout")
    }
    att = jax.jit(attach_edge_layouts)
    lay = att(stripped)
    jax.block_until_ready(lay)
    t0 = time.perf_counter()
    for _ in range(3):
        lay = att(stripped)
    jax.block_until_ready(lay)
    print(f"attach_edge_layouts (jit): {(time.perf_counter()-t0)/3*1e3:.1f} ms")

    # --- fused blocks ------------------------------------------------------
    fused = driver._fused_block_fn()
    batch_rest = jax.tree.map(jnp.asarray, driver._batch_rest)
    nl_pos = jnp.asarray(driver._nl_pos, dtype=driver._dtype)
    state = (
        pos0,
        jnp.asarray(vel, dtype=driver._dtype),
        driver._force_fn(pos0, driver._batch_rest),
        driver.integrator.init_aux(),
    )
    overflow = jnp.zeros((), bool)
    # warm-up block (compile)
    t0 = time.perf_counter()
    state, batch_rest, nl_pos, overflow = fused(state, batch_rest, nl_pos, overflow)
    jax.block_until_ready(state[0])
    print(f"fused block compile+run: {(time.perf_counter()-t0):.1f} s")

    for i in range(4):
        t0 = time.perf_counter()
        state, batch_rest, nl_pos, overflow = fused(state, batch_rest, nl_pos, overflow)
        jax.block_until_ready(state[0])
        dt = time.perf_counter() - t0
        # did this block rebuild?  nl_pos equality with current pos tells us
        print(f"block {i}: {dt*1e3:.1f} ms total, {dt*1e2:.1f} ms/MD-step")

    # --- forced rebuild block ---------------------------------------------
    nl_far = nl_pos + 1.0  # displacement >> half-skin => need=True
    t0 = time.perf_counter()
    state, batch_rest, nl_pos, overflow = fused(state, batch_rest, nl_far, overflow)
    jax.block_until_ready(state[0])
    dt = time.perf_counter() - t0
    print(f"FORCED-rebuild block: {dt*1e3:.1f} ms total ({dt*1e2:.1f} ms/MD-step)")
    print(f"overflow={bool(np.asarray(overflow))}")


if __name__ == "__main__":
    main()
