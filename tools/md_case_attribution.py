"""Where does the bench md row's wall-clock go?  (VERDICT r5 item 2)

Runs the exact bench md configuration (23k atoms, pallas_fused, f32,
host-NL MDDriver) with a stopwatch around every phase: driver init
(host NL + layout attach), warmup block (compile), per-block timed
loop, and any skin-rebuild recompiles.  Prints one line per phase.

Usage: timeout 900 python tools/md_case_attribution.py [n_atoms]
"""

import os
import sys
import time

os.environ.setdefault("NEQUIP_BENCH_SUBPROC", "0")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - T0:8.1f}s] {label}", flush=True)


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 23000
    mark("start")
    from __graft_entry__ import _fcc_frame, _flagship_model
    from nequip_tpu.data import _keys
    from nequip_tpu.integrations.md import (
        MDDriver,
        VelocityVerlet,
        maxwell_boltzmann_velocities,
    )

    mark("imports done")
    model = _flagship_model(model_dtype="float32", tp_impl="pallas_fused")
    params = model.init_params()
    frame = _fcc_frame(n_atoms)
    n_real = len(frame[_keys.POSITIONS_KEY])
    mark(f"model+frame built (n={n_real})")

    driver = MDDriver(
        model,
        params,
        frame,
        VelocityVerlet(dt_fs=2.0),
        masses=np.full(n_real, 63.546),
        skin=0.5,
        steps_per_block=10,
        nl_backend="host",
    )
    mark(f"driver init (host NL + pad + layouts); cap={driver._cap}")

    vel = maxwell_boltzmann_velocities(
        np.full(n_real, 63.546), temperature_K=300.0, seed=1
    )
    # warmup: compiles block + force_fn
    driver.run(driver.steps_per_block, velocities=vel)
    mark("warmup block done (compiles block + force_fn)")

    # timed: 30 steps = 3 blocks, as the bench does
    cap_before = driver._cap
    t0 = time.perf_counter()
    out = driver.run(30, velocities=vel)
    np.asarray(out["positions"][0])
    dt = (time.perf_counter() - t0) / 30
    mark(
        f"30-step run done: {dt*1e3:.1f} ms/step, {n_real/dt:.0f} atom-steps/s, "
        f"cap {cap_before} -> {driver._cap}"
        + (" (RECOMPILED)" if driver._cap != cap_before else "")
    )

    # second 30-step run: does a rebuild/recompile fire at steady state?
    cap_before = driver._cap
    t0 = time.perf_counter()
    out = driver.run(30, velocities=None)
    np.asarray(out["positions"][0])
    dt = (time.perf_counter() - t0) / 30
    mark(
        f"30-step run #2: {dt*1e3:.1f} ms/step, {n_real/dt:.0f} atom-steps/s, "
        f"cap {cap_before} -> {driver._cap}"
        + (" (RECOMPILED)" if driver._cap != cap_before else "")
    )


if __name__ == "__main__":
    main()
