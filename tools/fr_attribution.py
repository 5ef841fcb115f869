"""Attribute the fr (reverse-over-forward) train step's cost piecewise.

VERDICT r4 item 1: the official 23k f32 train row is 16.6 s/step — 111x
slower than same-size inference at 4.1x the FLOPs.  This probe times each
stage of the fr step separately on the real chip so the dominant term is a
measurement, not a hypothesis:

  1. fwd E+F                       (the infer step; pass 1's model call)
  2. fwd E only                    (the energy graph the surrogate augments)
  3. surrogate VALUE               (dual sweep: primal+tangent energy fwd)
  4. grad(surrogate)               (pass 2 of the fr step — THE suspect)
  5. pass 1 complete               (fwd E+F + loss + output cotangents)
  6. full train step               (the bench number)

Usage: python tools/fr_attribution.py [--atoms 23000] [--tf32] [--chunks N]
       [--steps 3] [--hlo <stage>]
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
    ap.add_argument("--atoms", type=int, default=23000)
    ap.add_argument("--impl", type=str, default="pallas_fused")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tf32", action="store_true")
    ap.add_argument("--chunks", type=int, default=0)
    ap.add_argument("--remat", type=str, default="save_tp")
    ap.add_argument("--stages", type=str, default="1,2,3,4,5,6",
                    help="comma list of stage numbers to run")
    ap.add_argument("--hlo", type=str, default="",
                    help="print HLO op census for this stage number")
    args = ap.parse_args()
    stages = {int(s) for s in args.stages.split(",") if s}

    if args.chunks:
        os.environ["NEQUIP_FR_EDGE_CHUNKS"] = str(args.chunks)
    else:
        os.environ.pop("NEQUIP_FR_EDGE_CHUNKS", None)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss
    from nequip_tpu.utils.global_state import set_tf32

    set_tf32(bool(args.tf32))

    model, params, data = _example_model_and_batch(
        model_dtype="float32", n_atoms=args.atoms, l_max=2,
        tp_impl=args.impl, remat=args.remat,
    )
    rng = np.random.RandomState(2)
    data = dict(data)
    data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(
        rng.standard_normal((2, 1)), jnp.float32)
    data[_keys.FORCE_KEY] = jnp.asarray(
        rng.standard_normal(data[_keys.POSITIONS_KEY].shape), jnp.float32)

    module = EMATrainModule(
        model=model,
        loss=EnergyForceLoss(type_names=["Cu"]),
        optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
        force_grad_mode="fr",
    )
    state = module.init_state()
    coeffs = module.loss.coeff_vector()
    loss_mgr = module.loss
    fso = model.model

    def timeit(label, fn, sync):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn()
        sync(out)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{label:40s} {ms:9.1f} ms  (first {t_first*1e3:.0f} ms)",
              flush=True)
        return ms

    def hlo_census(jitted, argv, label):
        import re
        from collections import Counter
        compiled = jitted.lower(*argv).compile()
        txt = compiled.as_text()
        ops = Counter()
        # HLO text: "%name = f32[128]{0} op-name(..." or "%name = op-name(..."
        for m in re.finditer(
            r"= (?:\([^)]*\)|[a-z0-9]+\[[^\]]*\]\S*)?\s*([a-z][a-z0-9-]+)\(",
            txt,
        ):
            ops[m.group(1)] += 1
        print(f"=== HLO census: {label} ({len(txt)/1e6:.1f} MB) ===", flush=True)
        for k, v in ops.most_common(30):
            print(f"  {k:28s} {v}")
        for pat in ("sort", "scatter", "while", "custom-call",
                    "dynamic-update-slice"):
            shapes = Counter(
                m.strip()[:100]
                for m in re.findall(
                    rf"= ((?:\([^)]*\)|[a-z0-9]+\[[^\]]*\])\S*)\s*{pat}\(", txt
                )
            )
            for shape, cnt in shapes.most_common(10):
                print(f"  {pat:22s} {cnt:4d}x {shape}")
        try:
            mem = compiled.memory_analysis()
            print(f"  temp={mem.temp_size_in_bytes/1e9:.2f}GB "
                  f"arg={mem.argument_size_in_bytes/1e9:.2f}GB")
        except Exception:
            pass

    # --- the pieces -----------------------------------------------------
    # stage 1: fwd E+F
    fwd = jax.jit(lambda p, d: model(p, d))
    # stage 2: energy-only fwd (same graph the surrogate augments)
    def e_only(p, d):
        return fso.func(p, d)[_keys.TOTAL_ENERGY_KEY]
    fwd_e = jax.jit(e_only)

    # cotangent construction mirrored from _make_train_step_fr
    def _cotangents(p, d):
        out = model(p, d)
        bs = loss_mgr.batch_state(out, d)
        loss, values = loss_mgr.values(bs, coeffs_vec=coeffs)
        fields = module._loss_output_fields(out)

        def loss_of_fields(fd):
            o = dict(out)
            o.update(fd)
            bs2 = loss_mgr.batch_state(o, d)
            return loss_mgr.values(bs2, coeffs_vec=coeffs)[0]

        v = jax.grad(loss_of_fields)({f: out[f] for f in fields})
        return jax.lax.stop_gradient(v), loss

    pass1 = jax.jit(_cotangents)

    def _inputs_of(d):
        inputs = {k: d[k] for k in model.input_fields if k in d}
        inputs.update({k: v for k, v in d.items()
                       if k.startswith("__edge_layout_")})
        if getattr(model, "uses_pallas_kernels", False):
            from nequip_tpu.ops.pallas.tp_scatter import relayout_edge_stream
            inputs = relayout_edge_stream(inputs)
        return inputs

    # fixed random cotangents (so surrogate stages don't include pass 1)
    vF = jnp.asarray(rng.standard_normal(
        data[_keys.POSITIONS_KEY].shape), jnp.float32)
    vE = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
    vfix = {_keys.FORCE_KEY: vF, _keys.TOTAL_ENERGY_KEY: vE}

    surr_val = jax.jit(
        lambda p, d: fso.loss_surrogate(p, _inputs_of(d), vfix))
    surr_grad = jax.jit(
        lambda p, d: jax.grad(
            lambda pp: fso.loss_surrogate(pp, _inputs_of(d), vfix))(p))
    step = jax.jit(module.make_train_step(), donate_argnums=(0,))

    # bisection stages for the combined-program anomaly (the pieces are
    # fast, the assembled step is ~30x their sum — ROUND5 attribution):
    # 7 = pass1 + pass2 fused in ONE jit, nothing else
    def _both(p, d):
        v, loss = _cotangents(p, d)
        grads = jax.grad(
            lambda pp: fso.loss_surrogate(pp, _inputs_of(d), v))(p)
        return loss, grads

    both = jax.jit(_both)

    # 8 = 7 + optimizer update + EMA (functionally the full step, but with
    # plain args instead of the TrainState pytree and no donation)
    opt = module.optimizer

    def _step8(p, opt_state, ema, d):
        loss, grads = _both(p, d)
        updates, opt_state = opt.update(grads, opt_state, p)
        import optax as _ox
        p = _ox.apply_updates(p, updates)
        ema = jax.tree.map(lambda e, q: e * 0.999 + 0.001 * q, ema, p)
        return p, opt_state, ema, loss

    step8 = jax.jit(_step8)

    # 9 = the full train step WITHOUT donation
    step9 = jax.jit(module.make_train_step())

    jitted = {
        "1": (fwd, (state.params, data)),
        "2": (fwd_e, (state.params, data)),
        "3": (surr_val, (state.params, data)),
        "4": (surr_grad, (state.params, data)),
        "5": (pass1, (state.params, data)),
        "6": (step, (state, data, coeffs)),
        "7": (both, (state.params, data)),
        "8": (step8, (state.params, state.opt_state, state.ema_params, data)),
        "9": (step9, (state, data, coeffs)),
    }
    if args.hlo:
        f, argv = jitted[args.hlo]
        hlo_census(f, argv, f"stage {args.hlo}")
        return

    r = {}
    if 1 in stages:
        r[1] = timeit("1. fwd E+F (infer)", lambda: fwd(state.params, data),
                      lambda o: np.asarray(o[_keys.FORCE_KEY][0]))
    if 2 in stages:
        r[2] = timeit("2. fwd E only", lambda: fwd_e(state.params, data),
                      lambda o: np.asarray(o[0]))
    if 3 in stages:
        r[3] = timeit("3. surrogate value (dual sweep fwd)",
                      lambda: surr_val(state.params, data),
                      lambda o: np.asarray(o))
    if 4 in stages:
        r[4] = timeit("4. grad(surrogate) (fr pass 2)",
                      lambda: surr_grad(state.params, data),
                      lambda o: np.asarray(
                          jax.tree.leaves(o)[0]).ravel()[0])
    if 5 in stages:
        r[5] = timeit("5. pass 1 (fwd + loss + cotangents)",
                      lambda: pass1(state.params, data),
                      lambda o: np.asarray(o[1]))
    if 6 in stages:
        # donation deletes the input buffers — run on a private copy so the
        # shared `state` stays alive for other stages
        st = jax.tree.map(jnp.array, state)
        def run6():
            nonlocal st
            st, logs = step(st, data, coeffs)
            return logs
        r[6] = timeit("6. full fr train step", run6,
                      lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 7 in stages:
        r[7] = timeit("7. pass1+pass2 in one jit",
                      lambda: both(state.params, data),
                      lambda o: np.asarray(o[0]))
    if 8 in stages:
        r[8] = timeit("8. 7 + adam + ema (no TrainState/donate)",
                      lambda: step8(state.params, state.opt_state,
                                    state.ema_params, data),
                      lambda o: np.asarray(o[3]))
    if 9 in stages:
        r[9] = timeit("9. full step, NO donation",
                      lambda: step9(state, data, coeffs)[1],
                      lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 10 in stages:
        # like 9 but THREADING the state (the bench/production pattern:
        # step k+1 consumes step k's output state)
        st10 = state
        def run10():
            nonlocal st10
            st10, logs = step9(st10, data, coeffs)
            return logs
        r[10] = timeit("10. full step, no donation, THREADED", run10,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 11 in stages:
        # discriminator: re-feed a FIXED executable-produced state.  Slow =>
        # the produced arrays themselves are the problem (layout mismatch
        # forcing a per-call relayout/transfer); fast => the dependency
        # chain is.
        st11, _ = step9(state, data, coeffs)
        jax.block_until_ready(st11)
        r[11] = timeit("11. full step, FIXED output-state input",
                       lambda: step9(st11, data, coeffs)[1],
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 12 in stages:
        # second discriminator: thread ONLY the params leaf (fresh optimizer
        # state each call) — isolates which part of TrainState is slow
        st12, _ = step9(state, data, coeffs)
        jax.block_until_ready(st12)
        def run12():
            st = state.replace(params=st12.params)
            return step9(st, data, coeffs)[1]
        r[12] = timeit("12. full step, produced PARAMS only",
                       run12,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 13 in stages:
        # threaded + block_until_ready between steps: if fast, the threaded
        # slowness is a client-side pathology of dispatching with PENDING
        # input handles (and one blocking round-trip per step is the fix)
        st13 = state
        def run13():
            nonlocal st13
            st13, logs = step9(st13, data, coeffs)
            jax.block_until_ready(st13)
            return logs
        r[13] = timeit("13. threaded + block_until_ready/step", run13,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 14 in stages:
        # threaded + a SCALAR host sync per step (np.asarray of the loss):
        # cheaper than blocking the whole state if it also restores speed
        st14 = state
        def run14():
            nonlocal st14
            st14, logs = step9(st14, data, coeffs)
            np.asarray(logs["train_loss_step/weighted_sum"])
            return logs
        r[14] = timeit("14. threaded + scalar sync/step", run14,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 15 in stages:
        # exactly the bench path: AOT step.lower().compile() FIRST, then the
        # jit call loop (threaded + scalar sync).  If slow while 14 is fast,
        # the bench's AOT pre-compile poisons the jit's own executable.
        step15 = jax.jit(module.make_train_step())
        lowered = step15.lower(state, data, coeffs)
        compiled = lowered.compile()
        del lowered
        st15 = state
        def run15():
            nonlocal st15
            st15, logs = step15(st15, data, coeffs)
            np.asarray(logs["train_loss_step/weighted_sum"])
            return logs
        r[15] = timeit("15. stage14 + bench's AOT precompile", run15,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 16 in stages:
        # threaded + sync on a STATE leaf scalar (the produced state's step
        # counter) instead of the loss: if fast while 14 is slow, awaiting a
        # state output settles the state handles in a way the loss scalar
        # (a separate output) does not
        st16 = state
        def run16():
            nonlocal st16
            st16, logs = step9(st16, data, coeffs)
            np.asarray(st16.step)
            return logs
        r[16] = timeit("16. threaded + state.step sync/step", run16,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 17 in stages:
        # threaded + BOTH syncs (loss + state.step)
        st17 = state
        def run17():
            nonlocal st17
            st17, logs = step9(st17, data, coeffs)
            np.asarray(logs["train_loss_step/weighted_sum"])
            np.asarray(st17.step)
            return logs
        r[17] = timeit("17. threaded + loss AND state.step sync", run17,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 18 in stages:
        # the EXACT bench path post-fix: AOT lower().compile() first, then
        # the jit loop threaded + state.step sync — isolates whether the AOT
        # precompile poisons the STATE-synced loop (stage 15 only tested it
        # against the loss-synced one)
        step18 = jax.jit(module.make_train_step())
        step18.lower(state, data, coeffs).compile()
        st18 = state
        def run18():
            nonlocal st18
            st18, logs = step18(st18, data, coeffs)
            np.asarray(st18.step)
            return logs
        r[18] = timeit("18. AOT precompile + threaded + state.step sync", run18,
                       lambda o: np.asarray(o["train_loss_step/weighted_sum"]))
    if 19 in stages:
        # decisive interleave: alternate unthreaded-control and
        # threaded+state-sync trios in ONE process.  If the contrast holds
        # within each round, threading is the mechanism; if both swing
        # together, it's co-tenant chip state and the sync variant was a red
        # herring.  memory_stats (when the backend reports it) rides along.
        import time as _t
        st19 = state
        def trio(threaded):
            nonlocal st19
            ts = []
            for _ in range(3):
                t0 = _t.perf_counter()
                if threaded:
                    st19, logs = step9(st19, data, coeffs)
                    np.asarray(st19.step)
                else:
                    out_state, logs = step9(state, data, coeffs)
                    np.asarray(out_state.step)
                ts.append(_t.perf_counter() - t0)
            return sorted(ts)[1]
        # warm
        _ = trio(False)
        for rnd in range(4):
            try:
                ms = jax.local_devices()[0].memory_stats() or {}
                free = (ms.get("bytes_limit", 0) - ms.get("bytes_in_use", 0)) / 2**30
            except Exception:
                free = float("nan")
            a = trio(False)
            b = trio(True)
            print(f"  19. round {rnd}: unthreaded {a*1e3:8.1f} ms | "
                  f"threaded+sync {b*1e3:8.1f} ms | free_hbm~{free:.1f} GiB",
                  flush=True)

    if 4 in r and 5 in r and 6 in r:
        print(f"\n  pass1 + pass2 = {r[5] + r[4]:.1f} ms; "
              f"step - (p1+p2) = {r[6] - r[5] - r[4]:.1f} ms "
              f"(optimizer/EMA/accounting)")


if __name__ == "__main__":
    main()
