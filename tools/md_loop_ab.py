"""Same-process A/B: why is the MD per-step loop ~3x the bare force step?

Builds the 23k pallas_fused E+F force program ONCE, then times:
  a) bare force loop: forces = force_fn(pos, rest); sync a force leaf
     (the infer bench pattern — should reproduce ~155 ms/step)
  b) half-step loop: half_a -> force -> half_b(+disp2); sync disp2
     (the MDDriver integration='host' pattern)
  c) half-step loop syncing a CHEAP leaf of state instead of disp2
  d) b but with the force output fetched fully (np.asarray(forces))

Usage: timeout 900 python tools/md_loop_ab.py [n_atoms] [n_steps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - T0:8.1f}s] {label}", flush=True)


def med_loop(n, fn):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 23000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_frame, _flagship_model
    from nequip_tpu.data import _keys
    from nequip_tpu.integrations.md import MDDriver, VelocityVerlet

    model = _flagship_model(model_dtype="float32", tp_impl="pallas_fused")
    params = model.init_params()
    frame = _fcc_frame(n_atoms)
    n_real = len(frame[_keys.POSITIONS_KEY])
    driver = MDDriver(
        model, params, frame, VelocityVerlet(dt_fs=2.0),
        masses=np.full(n_real, 63.546), skin=0.5, steps_per_block=10,
        nl_backend="host", integration="host",
    )
    mark(f"driver init (n={n_real}, cap={driver._cap})")

    driver._block_fn()
    rest = driver._batch_rest
    dtype = driver._dtype
    pos = jnp.asarray(driver._frame[_keys.POSITIONS_KEY], dtype=dtype)
    f = driver._force_fn(pos, rest)
    np.asarray(f[0])
    mark("force program compiled + warm")

    # a) bare force loop (same pos each call, sync one force row)
    def case_a():
        out = driver._force_fn(pos, rest)
        np.asarray(out[0])

    ms = med_loop(n_steps, case_a)
    mark(f"a) bare force loop: {ms:.1f} ms/step")

    # b) the real host-integration step
    half_a_fn, half_b_fn = driver.integrator.make_half_steps(driver.masses)
    half_a = jax.jit(half_a_fn)

    def half_b_disp(pos_new, carry, forces_new, nl_pos):
        state = half_b_fn(pos_new, carry, forces_new)
        disp2 = jnp.max(jnp.sum((pos_new - nl_pos) ** 2, axis=1))
        return state, disp2

    half_b = jax.jit(half_b_disp)
    nl_pos = jnp.asarray(driver._nl_pos, dtype=dtype)
    vel = jnp.zeros_like(pos)
    state = (pos, vel, f, jnp.zeros((), dtype))
    # warm the tiny programs
    p1, c1 = half_a(state)
    s1, d1 = half_b(p1, c1, f, nl_pos)
    float(np.asarray(d1))

    holder = {"state": state}

    def case_b():
        st = holder["state"]
        pos_new, carry = half_a(st)
        forces_new = driver._force_fn(pos_new, rest)
        st, disp2 = half_b(pos_new, carry, forces_new, nl_pos)
        holder["state"] = st
        float(np.asarray(disp2))

    ms = med_loop(n_steps, case_b)
    mark(f"b) half-step loop (sync disp2): {ms:.1f} ms/step")

    # c) sync a single force row instead of disp2
    holder["state"] = state

    def case_c():
        st = holder["state"]
        pos_new, carry = half_a(st)
        forces_new = driver._force_fn(pos_new, rest)
        st, disp2 = half_b(pos_new, carry, forces_new, nl_pos)
        holder["state"] = st
        np.asarray(st[2][0])

    ms = med_loop(n_steps, case_c)
    mark(f"c) half-step loop (sync state[2][0] row): {ms:.1f} ms/step")

    # d) unthreaded half-step loop (state never advances: isolates threading)
    def case_d():
        pos_new, carry = half_a(state)
        forces_new = driver._force_fn(pos_new, rest)
        st, disp2 = half_b(pos_new, carry, forces_new, nl_pos)
        float(np.asarray(disp2))

    ms = med_loop(n_steps, case_d)
    mark(f"d) half-step loop UNTHREADED: {ms:.1f} ms/step")


if __name__ == "__main__":
    main()
