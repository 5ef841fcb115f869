"""Benchmark: NequIP-TPU throughput on one chip, with FLOP accounting.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

Headline metric (BASELINE.json north-star scenario): MD-inference
atom-steps/s for a ~100k-atom periodic Cu system at l_max=2 (energy+forces).
``vs_baseline`` is measured against an assumed A100-class reference
throughput of 1.0e6 atom-steps/s/GPU for a NequIP l_max=2 model (the
reference repo publishes no numbers — see BASELINE.md — so this is an
order-of-magnitude anchor from the Tan et al. performance paper's hardware
class; the target is >= 2x).

``extras`` carries the full measurement matrix — a ``calib`` row (bare
MXU matmul TFLOP/s per precision mode + an HBM stream probe, i.e. the
*achievable* ceiling of this chip/tunnel), then {4k, 23k, 100k-class} x
{infer, train, md} x {f32, tf32, bf16} — with per-step FLOPs from the
compiled executable's ``cost_analysis()``, the implied TFLOP/s, MFU vs the
v5e bf16 peak of 197 TFLOP/s (NEQUIP_BENCH_PEAK_TFLOPS overrides), and
``pct_of_achievable`` = case TFLOP/s / the calib row's matmul TFLOP/s for
the matching precision mode.  The calib row exists to settle whether low
absolute MFU is environment throttle or model code: FLOP counts are exact
either way, and pct_of_achievable is the environment-corrected utilization.

Env knobs (single-case mode, used for kernel tuning):
  NEQUIP_BENCH_ATOMS, NEQUIP_BENCH_STEPS (default 6), NEQUIP_BENCH_DTYPE
  (float32), NEQUIP_BENCH_MODE (infer|train), NEQUIP_BENCH_TP_IMPL
  (xla|pallas|pallas_fused), NEQUIP_BENCH_REMAT (0|1).
"""

import json
import os
import time

import numpy as np

_A100_BASELINE_ATOM_STEPS_PER_S = 1.0e6

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


# XLA's cost_analysis cannot see inside Pallas custom calls, so kernels
# would under-report FLOPs.  The canonical per-step FLOP count for a given
# (size, mode) is therefore taken from the pure-XLA implementation of the
# SAME computation (compiled once, cached); the train/infer FLOP ratio is
# calibrated at a small size where the XLA train step compiles quickly.
_CANON_FWD: dict = {}
_TRAIN_RATIO: dict = {}


def _canonical_fwd_flops(n_atoms: int, dtype: str) -> float:
    import jax

    from __graft_entry__ import _example_model_and_batch

    key = (n_atoms, dtype)
    if key not in _CANON_FWD:
        if n_atoms > 50000:
            # the XLA impl NEVER compiles above ~50k (HBM for [E, mid]) and
            # the failing remote compile burns ~5 min of bench budget per
            # dtype — scale linearly from 23k instead (edge count, hence
            # FLOPs, is linear in atoms for bulk systems)
            base = _canonical_fwd_flops(23000, dtype)
            _CANON_FWD[key] = base * n_atoms / 23328.0
            return _CANON_FWD[key]
        try:
            model, params, data = _example_model_and_batch(
                model_dtype=dtype, n_atoms=n_atoms, l_max=2, tp_impl="xla"
            )
            fwd = jax.jit(lambda p, d: model(p, d))
            _CANON_FWD[key] = _flops_of(fwd.lower(params, data).compile())
        except Exception:
            base = _canonical_fwd_flops(23000, dtype)
            _CANON_FWD[key] = base * n_atoms / 23328.0
    return _CANON_FWD[key]


def _train_flop_ratio(dtype: str, fgm: str = "rr") -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss

    key = (dtype, fgm)
    if key not in _TRAIN_RATIO:
        try:
            model, params, data = _example_model_and_batch(
                model_dtype=dtype, n_atoms=4000, l_max=2, tp_impl="xla"
            )
            fwd_flops = _flops_of(
                jax.jit(lambda p, d: model(p, d)).lower(params, data).compile()
            )
            rng = np.random.RandomState(2)
            data = dict(data)
            data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(
                rng.standard_normal((2, 1)), dtype=dtype
            )
            data[_keys.FORCE_KEY] = jnp.asarray(
                rng.standard_normal(data[_keys.POSITIONS_KEY].shape), dtype=dtype
            )
            module = EMATrainModule(
                model=model,
                loss=EnergyForceLoss(type_names=["Cu"]),
                optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
                force_grad_mode=fgm,
            )
            state = module.init_state()
            step = jax.jit(module.make_train_step())
            train_flops = _flops_of(
                step.lower(state, data, module.loss.coeff_vector()).compile()
            )
            _TRAIN_RATIO[key] = train_flops / fwd_flops
        except Exception:
            # E+F-loss training = fwd + bwd through the double-backward
            # force graph; ~4x forward is the standard estimate
            _TRAIN_RATIO[key] = 4.0
    return _TRAIN_RATIO[key]


def run_case(n_atoms, mode, tp_impl, dtype="float32", n_steps=6, remat=False, tf32=False,
             fgm=None, fr_chunks=None):
    """One measurement with retries: the tunneled chip is multi-tenant and
    surfaces transient RESOURCE_EXHAUSTED when another tenant holds HBM;
    returns a dict or {'error': ...} after the retries (a real OOM fails
    consistently).  Total retry sleep is capped at ~50 s per case so a
    congested chip cannot eat the driver's wall-clock budget (round-2
    post-mortem: 3x90 s sleeps per failing case starved the whole matrix)."""
    last = None
    tf32 = tf32 or os.environ.get("NEQUIP_BENCH_TF32", "0") == "1"
    if fgm is None:
        fgm = os.environ.get("NEQUIP_BENCH_FORCE_GRAD", "rr")
    attempts_left = 2
    while attempts_left > 0:
        last = _run_case_once(
            n_atoms, mode, tp_impl, dtype, n_steps, remat, tf32, fgm, fr_chunks
        )
        err = last.get("error", "")
        # tpu_compile_helper exit 1 / HTTP 500 through the tunnel is either a
        # transient backend failure or a compile-time memory blowup at >50k —
        # both deserve the same remat-ladder + retry treatment as runtime OOM
        # (r3 matrix log: 100k f32 rows died on it while 108k bf16 compiled)
        transient = (
            "RESOURCE_EXHAUSTED" in err
            or "tpu_compile_helper" in err
            or "HTTP 500" in err
        )
        if not err or not transient:
            return last
        # ladder eligibility: >50k always (activations alone overflow a
        # co-tenanted chip), and 23k-class TRAIN (the f32 train program needs
        # 15.3 GB temp without remat — r3 attribution)
        ladder_ok = n_atoms > 50000 or (mode == "train" and n_atoms > 15000)
        if ladder_ok:
            # HBM fallback ladder (does not consume retry attempts or sleep):
            # save_tp keeps one [N, mid] residual per layer; full remat drops
            # that too at ~30% step-time recompute cost.  For TRAIN this
            # ladder is only effective in fr mode (the dual-sweep surrogate,
            # training_module.py): under rr, per-layer remat cannot bound the
            # force-VJP residuals (14-15 GiB at 23k regardless of policy; fr
            # + save_tp measures 6.0 GiB, 2.65 with fr_chunks=8 — see the
            # matrix-plan comment), so OOM'd rr rows switch to fr.
            if mode == "train" and fgm == "rr":
                fgm = "fr"
                remat = "save_tp"
                continue
            nxt = {False: "save_tp", "save_tp": True}.get(remat)
            if nxt is not None:
                remat = nxt
                continue
            # final rung: edge-chunked fr sweeps (scan over stream slices,
            # tp_scatter.py chunked_jvp_conv) — 6.0 -> 2.7 GiB at 23k f32,
            # the only policy whose 100k f32 train step fits 16 GB HBM
            if mode == "train" and fgm == "fr" and not fr_chunks:
                fr_chunks = 8
                remat = "save_tp"
                continue
        attempts_left -= 1
        if attempts_left:
            time.sleep(25)
    return last


def hbm_probe(gib: float = 6.0) -> bool:
    """True if the chip can allocate `gib` GiB right now.  The tunneled chip
    is multi-tenant: when a co-tenant holds HBM, 100k-class cases fail with
    RESOURCE_EXHAUSTED after minutes of compile — probing once up front lets
    the bench SKIP them (recording why) instead of burning the budget."""
    try:
        import jax.numpy as jnp

        x = jnp.ones((int(gib * (1024**3) // 4),), jnp.float32)
        np.asarray(x[0])  # tunnel-safe sync
        del x
        return True
    except Exception:
        return False


def run_calib(n: int = 4096, iters: int = 128) -> dict:
    """Measure this chip's ACHIEVABLE ceiling, on the record (VERDICT r3 #1).

    Three bare-MXU matmul ladders (``lax.fori_loop`` of ``iters`` chained
    [n,n]x[n,n] dots inside ONE dispatch, so tunnel latency amortizes) give
    the sustained TFLOP/s for each precision mode the matrix uses:

    * ``bfloat16``       — what bf16 cases run at
    * ``float32``        (default matmul precision, one bf16 pass w/ f32
      accumulation) — what tf32-mode cases run at
    * ``float32_highest`` (bf16x6 passes) — what strict-f32 cases run at

    plus an HBM stream probe (elementwise scale of a 256 MiB buffer, read +
    write per iteration) in GB/s, and the round-trip dispatch latency of a
    trivial program.  Every matrix case then reports ``pct_of_achievable``
    against the matching mode.  First on-chip run (2026-08-18, v5e via
    axon): bf16 137.6 TFLOP/s (70% of datasheet), f32-default 115.9, strict
    f32 29.4, HBM ~400 GB/s, dispatch round-trip ~41 ms — i.e. the r1-r3
    assumption that the tunnel throttles compute to ~1 TFLOP/s was FALSE;
    the chip delivers near-datasheet compute and the tunnel cost is
    per-dispatch latency, so low model TFLOP/s is model-side (bandwidth/
    glue/latency-bound), not environment-bound."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    out = {"mode": "calib", "matmul_n": n, "matmul_iters": iters}
    try:
        # y ~= 0.999*I keeps magnitudes stable over `iters` chained dots in
        # bf16; XLA does not exploit the near-identity structure (still a
        # full [n,n,n] dot per iteration)
        for label, dtype, precision in (
            ("bfloat16", jnp.bfloat16, None),
            ("float32", jnp.float32, "default"),
            ("float32_highest", jnp.float32, "highest"),
        ):
            x = jnp.full((n, n), 0.5, dtype)
            y = (jnp.eye(n) * 0.999).astype(dtype)

            def f(x, y, _p=precision):
                def body(_, a):
                    return lax.dot(a, y, precision=_p)

                return lax.fori_loop(0, iters, body, x)

            g = jax.jit(f)
            r = g(x, y)
            np.asarray(r[0, 0])  # warm + tunnel-safe sync
            t0 = time.perf_counter()
            r = g(x, y)
            np.asarray(r[0, 0])
            dt = time.perf_counter() - t0
            out[f"matmul_tflops_{label}"] = round(2.0 * n**3 * iters / dt / 1e12, 2)
        # HBM stream: read+write 256 MiB per iteration, 64 iterations
        size = 256 * 1024**2 // 4
        sx = jnp.ones((size,), jnp.float32)

        def s(x):
            def body(_, a):
                return a * 1.0000001

            return lax.fori_loop(0, 64, body, x)

        gs = jax.jit(s)
        r = gs(sx)
        np.asarray(r[0])
        t0 = time.perf_counter()
        r = gs(sx)
        np.asarray(r[0])
        dt = time.perf_counter() - t0
        out["hbm_stream_gbps"] = round(2.0 * size * 4 * 64 / dt / 1e9, 1)
        # round-trip dispatch+sync latency of a trivial program: the floor a
        # single synchronous device call pays through the tunnel (bench
        # cases amortize it by enqueuing n_steps dispatches per sync)
        tiny = jax.jit(lambda a: a + 1.0)
        z = jnp.zeros((8,), jnp.float32)
        np.asarray(tiny(z)[0])
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(tiny(z)[0])
        out["dispatch_roundtrip_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    return out


# which calib matmul mode bounds a given case: bf16 cases ride the bf16
# ladder; f32 under tf32 (default precision) rides the single-pass ladder;
# strict f32 rides the bf16x6 ladder
def _calib_key_for(case: dict) -> str:
    if case.get("dtype") == "bfloat16":
        return "matmul_tflops_bfloat16"
    if case.get("tf32"):
        return "matmul_tflops_float32"
    return "matmul_tflops_float32_highest"


def _run_md_case(n_atoms, tp_impl, dtype, n_md_steps):
    """The north-star metric as actually defined (BASELINE.json: atom-steps/s
    in *MD*): drive the real ``MDDriver`` loop — device neighborlist, skin
    rebuild checks, Verlet integration — not bare model calls, so the NL
    amortization is part of the number."""
    from __graft_entry__ import _fcc_frame, _flagship_model
    from nequip_tpu.integrations.md import (
        MDDriver,
        VelocityVerlet,
        maxwell_boltzmann_velocities,
    )

    try:
        from nequip_tpu.data import _keys

        model = _flagship_model(model_dtype=dtype, tp_impl=tp_impl)
        params = model.init_params()
        frame = _fcc_frame(n_atoms)
        n_real = len(frame[_keys.POSITIONS_KEY])
        driver = MDDriver(
            model,
            params,
            frame,
            VelocityVerlet(dt_fs=2.0),
            masses=np.full(n_real, 63.546),
            skin=0.5,
            steps_per_block=int(os.environ.get("NEQUIP_BENCH_MD_BLOCK", 10)),
            # host NL + host integration for the BENCH row.  Budget math from
            # tools/md_case_attribution.py (real chip, 23k atoms): the jitted
            # block loop compiles TWO big programs (block + force_fn, 694 s
            # cold through the tunnel) and burned the 600 s case cap in
            # r2-r5; integration="host" compiles ONLY the force program (the
            # same E+F program as the infer row) and integrates on the host
            # — the reference's own MD pattern (ASE calculator).  The jitted
            # block loop stays the production default (199.8 ms/step vs
            # ~230 ms measured) and is integration-tested; NEQUIP_BENCH_MD_NL
            # =device restores the fully device-resident path here.
            nl_backend=os.environ.get("NEQUIP_BENCH_MD_NL", "host"),
            integration=(
                "block"
                if os.environ.get("NEQUIP_BENCH_MD_NL") == "device"
                else os.environ.get("NEQUIP_BENCH_MD_INTEGRATION", "host")
            ),
        )
        vel = maxwell_boltzmann_velocities(
            np.full(n_real, 63.546), temperature_K=300.0, seed=1
        )
        driver.run(driver.steps_per_block, velocities=vel)  # compile + warm
        driver.run(5, velocities=vel)  # settle dispatch path post-compile
        t0 = time.perf_counter()
        out = driver.run(n_md_steps, velocities=vel)
        np.asarray(out["positions"][0])
        dt = (time.perf_counter() - t0) / n_md_steps
        return {
            "atoms": n_real,
            "mode": "md",
            "tp_impl": tp_impl,
            "dtype": dtype,
            "tf32": False,
            "step_ms": round(dt * 1e3, 2),
            "atom_steps_per_s": round(n_real / dt, 1),
            "md_steps": n_md_steps,
            "note": (
                f"full MDDriver loop (nl={driver.nl_backend}, "
                f"integration={driver.integration}, skin rebuilds included)"
            ),
        }
    except Exception as e:
        return {
            "atoms": n_atoms,
            "mode": "md",
            "tp_impl": tp_impl,
            "dtype": dtype,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }


def _run_case_once(
    n_atoms, mode, tp_impl, dtype="float32", n_steps=6, remat=False, tf32=False,
    fgm="rr", fr_chunks=None,
):
    import jax

    from nequip_tpu.utils.global_state import set_tf32

    set_tf32(bool(tf32))
    if fr_chunks:
        # edge-chunked fr sweep (trace-time env gate, see interaction_block.py)
        os.environ["NEQUIP_FR_EDGE_CHUNKS"] = str(int(fr_chunks))
    else:
        # falsy (None or 0) means unchunked — always clear the env var so a
        # chunked case run earlier in the SAME process (NEQUIP_BENCH_SUBPROC=0)
        # cannot leak its chunking into later infer/md cases (ADVICE r4)
        os.environ.pop("NEQUIP_FR_EDGE_CHUNKS", None)

    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys

    peak = float(os.environ.get("NEQUIP_BENCH_PEAK_TFLOPS", 197.0)) * 1e12

    if mode == "calib":
        return run_calib()
    if mode == "md":
        return _run_md_case(n_atoms, tp_impl, dtype, n_md_steps=max(30, 5 * n_steps))

    try:
        model, params, data = _example_model_and_batch(
            model_dtype=dtype, n_atoms=n_atoms, l_max=2, tp_impl=tp_impl, remat=remat
        )
        if os.environ.get("NEQUIP_BENCH_ENERGY_ONLY", "0") == "1":
            # ablation probe (step-time attribution): skip the force backward
            model.model.do_derivatives = False
        n_real = int(np.asarray(data[_keys.NODE_MASK_KEY]).sum())

        if mode == "train":
            import jax.numpy as jnp

            from nequip_tpu.train import EMATrainModule, EnergyForceLoss

            rng = np.random.RandomState(2)
            data = dict(data)
            data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(
                rng.standard_normal((2, 1)), dtype=dtype
            )
            data[_keys.FORCE_KEY] = jnp.asarray(
                rng.standard_normal(data[_keys.POSITIONS_KEY].shape), dtype=dtype
            )
            module = EMATrainModule(
                model=model,
                loss=EnergyForceLoss(type_names=["Cu"]),
                optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
                force_grad_mode=fgm,
            )
            state = module.init_state()
            coeffs = module.loss.coeff_vector()
            # NO buffer donation: aliased executables run ~30x slower on this
            # runtime (r5 attribution — the entire 16.6 s/step r4 train row
            # was donation; see utils.global_state.donate_argnums)
            from nequip_tpu.utils.global_state import donate_argnums

            step = jax.jit(
                module.make_train_step(), donate_argnums=donate_argnums(0)
            )
            lowered = step.lower(state, data, coeffs)
            compiled = lowered.compile()
            flops = _flops_of(compiled)
            state, logs = step(state, data, coeffs)
            np.asarray(state.step)  # tunnel-safe sync
            # per-step sync IS the timing boundary, so time each step
            # individually and report the MEDIAN: co-tenant load swings the
            # same executable 0.5 <-> 15 s/step minute-to-minute (r5 session
            # 4), and a single mean window records whichever state the chip
            # happened to be in.  The sync must await a THREADED-STATE leaf
            # (state.step): syncing the loss (a side output) does NOT settle
            # the state handles and leaves the ~25x-slower in-flight client
            # path (ROUND5_NOTES stages 14 vs 16: 12.4 s vs 0.50 s).  The
            # production Trainer loop syncs the same way.
            per_step = []
            for _ in range(n_steps):
                t0 = time.perf_counter()
                state, logs = step(state, data, coeffs)
                np.asarray(state.step)
                per_step.append(time.perf_counter() - t0)
            dt = float(np.median(per_step))
            step_extras = {
                "step_ms_min": round(min(per_step) * 1e3, 2),
                "step_ms_max": round(max(per_step) * 1e3, 2),
            }
        else:
            fwd = jax.jit(lambda p, d: model(p, d))
            compiled = fwd.lower(params, data).compile()
            flops = _flops_of(compiled)
            sync_key = (
                _keys.FORCE_KEY
                if model.model.do_derivatives
                else _keys.TOTAL_ENERGY_KEY
            )
            out = fwd(params, data)
            np.asarray(out[sync_key][0])  # tunnel-safe sync
            t0 = time.perf_counter()
            for _ in range(n_steps):
                out = fwd(params, data)
            np.asarray(out[sync_key][0])
            dt = (time.perf_counter() - t0) / n_steps

        flops_source = "cost_analysis"
        if tp_impl != "xla":
            # cost_analysis can't see Pallas custom-call FLOPs; use the
            # XLA-impl FLOP count of the same computation as canonical
            # (keyed on the REAL atom count — the fcc frame rounds the
            # requested size up, and throughput divides by n_real)
            flops = _canonical_fwd_flops(n_real, dtype)
            if mode == "train":
                flops *= _train_flop_ratio(dtype, fgm)
            flops_source = "xla_canonical"
        tflops = flops / dt / 1e12 if np.isfinite(flops) else None
        return {
            "atoms": n_real,
            "mode": mode,
            "tp_impl": tp_impl,
            "dtype": dtype,
            "tf32": bool(tf32),
            **({"force_grad": fgm} if mode == "train" else {}),
            **(
                {"fr_chunks": int(fr_chunks or os.environ.get("NEQUIP_FR_EDGE_CHUNKS", 0))}
                if mode == "train"
                and (fr_chunks or os.environ.get("NEQUIP_FR_EDGE_CHUNKS"))
                else {}
            ),
            "remat": (
                remat
                if remat is not None
                else ("save_tp" if n_atoms > 50000 else False)
            ),
            "step_ms": round(dt * 1e3, 2),
            "atom_steps_per_s": round(n_real / dt, 1),
            "gflops_per_step": round(flops / 1e9, 2) if np.isfinite(flops) else None,
            "flops_source": flops_source,
            "tflops_per_s": round(tflops, 3) if tflops is not None else None,
            "mfu": round(flops / dt / peak, 5) if np.isfinite(flops) else None,
            **(step_extras if mode == "train" else {}),
        }
    except Exception as e:  # OOM at large sizes is a result, not a crash
        return {
            "atoms": n_atoms,
            "mode": mode,
            "tp_impl": tp_impl,
            "dtype": dtype,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }


_CASE_MARK = "===CASE_JSON==="


def _run_case_guarded(atoms, mode, impl, dtype, steps, remat, tf32, fgm, timeout_s,
                      fr_chunks=None):
    """run_case in a child process with a hard timeout (hang-proof)."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    payload = json.dumps([atoms, mode, impl, dtype, steps, remat, tf32, fgm, fr_chunks])
    code = (
        "import json, sys\n"
        f"sys.path.insert(0, {here!r})\n"
        "import bench\n"
        f"a = json.loads({payload!r})\n"
        "r = bench.run_case(a[0], a[1], a[2], a[3], a[4],"
        " remat=a[5], tf32=a[6], fgm=a[7], fr_chunks=a[8])\n"
        f"print({_CASE_MARK!r} + json.dumps(r), flush=True)\n"
    )
    base = {"atoms": atoms, "mode": mode, "tp_impl": impl, "dtype": dtype}
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, cwd=here,
        )
    except subprocess.TimeoutExpired:
        return {**base, "error": f"case timed out after {timeout_s:.0f}s "
                                 "(hung TPU tunnel or runaway compile)"}
    for line in reversed(p.stdout.splitlines()):
        if line.startswith(_CASE_MARK):
            return json.loads(line[len(_CASE_MARK):])
    return {**base, "error": f"case subprocess rc={p.returncode}: "
                             f"{(p.stderr or p.stdout)[-300:]}"}


def _hbm_probe_guarded(gib: float = 6.0, timeout_s: float = 300.0) -> bool:
    """hbm_probe in a child process: False on failure, timeout, or hang."""
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    code = (
        "import sys\n"
        f"sys.path.insert(0, {here!r})\n"
        "import bench\n"
        f"ok = bench.hbm_probe({gib!r})\n"
        "sys.exit(0 if ok else 3)\n"
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, cwd=here,
        )
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    n_steps = int(os.environ.get("NEQUIP_BENCH_STEPS", 6))
    dtype = os.environ.get("NEQUIP_BENCH_DTYPE", "float32")

    if "NEQUIP_BENCH_ATOMS" in os.environ:
        # single-case mode (kernel tuning / ad-hoc runs)
        n_atoms = int(os.environ["NEQUIP_BENCH_ATOMS"])
        # pallas_fused beats the XLA path at every measured size since the
        # transposed layout + be=256 backward (86.2k vs 72.1k at 23k)
        default_impl = "pallas_fused"
        mode = os.environ.get("NEQUIP_BENCH_MODE", "infer")
        if mode == "train":
            # 23k-class: pallas (fused pays a 1.10x duplicated-primal cost);
            # >50k: pallas_fused is the only impl that compiles at all
            default_impl = (
                "pallas_fused"
                if n_atoms > 50000
                else ("pallas" if n_atoms > 15000 else "xla")
            )
        remat_env = os.environ.get("NEQUIP_BENCH_REMAT")
        case = run_case(
            n_atoms,
            mode,
            os.environ.get("NEQUIP_BENCH_TP_IMPL", default_impl),
            dtype,
            n_steps,
            # run_case clears the env gate when fr_chunks is falsy, so a
            # user-set NEQUIP_FR_EDGE_CHUNKS must be passed through explicitly
            fr_chunks=int(os.environ.get("NEQUIP_FR_EDGE_CHUNKS", 0)) or None,
            # unset = auto (save_tp above 50k); "0"/"1" bool, any other
            # string ("save_tp"/"force"/"force_full") passes through
            remat=(
                None
                if remat_env is None
                else (
                    remat_env == "1"
                    if remat_env in ("0", "1")
                    else remat_env
                )
            ),
        )
        value = case.get("atom_steps_per_s", 0.0) or 0.0
        quantity = (
            "E" if os.environ.get("NEQUIP_BENCH_ENERGY_ONLY", "0") == "1" else "E+F"
        )
        print(
            json.dumps(
                {
                    "metric": f"{mode} throughput ({case['atoms']} atoms, l_max=2, {quantity})",
                    "value": value,
                    "unit": "atom-steps/s/chip",
                    "vs_baseline": round(value / _A100_BASELINE_ATOM_STEPS_PER_S, 4),
                    "extras": {"cases": [case]},
                }
            )
        )
        return

    # default: the measurement matrix.  Round-2 post-mortem (BENCH_r02 was a
    # driver-timeout kill with zero headline): CHEAP CASES RUN FIRST so a
    # nonzero number is on the record within minutes; 100k-class cases (cold
    # Mosaic compiles take minutes each) are gated behind an up-front HBM
    # probe (multi-tenant chip) and a wall-clock budget kept well below any
    # plausible driver timeout.  emit() prints best-so-far after EVERY case,
    # so even a hard kill mid-matrix leaves the last good line.
    # r3 post-mortem: the 1500 s self-imposed budget expired with 6 of 10
    # rows unrun while the DRIVER had headroom (rc=0, no kill); r4 raised it
    # to 2700 s and the DRIVER killed the run at rc=124 with 6 of 12 rows
    # missing.  Two rc=124 kills (r2, r4) bound the driver window from
    # below: the budget must leave the driver margin.  Default 1800 s
    # (VERDICT r4 item 2), case timeouts capped at 600 s, and the round's
    # compile cache is pre-warmed interactively so the driver run mostly
    # hits /tmp/jax_cache.
    budget_s = float(os.environ.get("NEQUIP_BENCH_BUDGET_S", 1800))
    t_start = time.perf_counter()

    def emit(cases):
        # headline: the fastest successful inference-class case at the >50k
        # north-star scale — dtype/tf32-mode is part of the label; falls
        # back to any successful inference-class case (23k/4k), so the
        # headline is nonzero as soon as the FIRST cheap case lands.
        # vs_baseline is only computed for float32 headlines: the A100 anchor
        # is TF32-class, so a float32+tf32 run is the precision-MATCHED
        # comparison and strict float32 ("highest", bf16x6) is conservative —
        # both are fair ratios.  bf16 is looser than the anchor, so a bf16
        # headline emits null instead of mixing precisions (ADVICE r2 #4);
        # the best f32/tf32 ratio is then surfaced as vs_baseline_comparable
        # so the comparable number stays on the record (VERDICT r3 weak #3).
        calib = next(
            (c for c in cases if c.get("mode") == "calib" and "error" not in c), None
        )
        if calib:
            for c in cases:
                t = c.get("tflops_per_s")
                ceil = calib.get(_calib_key_for(c)) if t else None
                if t and ceil:
                    c["pct_of_achievable"] = round(100.0 * t / ceil, 1)
        infer_like = [
            c for c in cases if c.get("mode") in ("infer", "md") and "error" not in c
        ]
        big = [c for c in cases if c in infer_like and c["atoms"] > 50000]
        pool = big or infer_like
        headline = max(pool, key=lambda c: c["atom_steps_per_s"]) if pool else cases[0]
        value = headline.get("atom_steps_per_s", 0.0) or 0.0
        qualifier = " tf32" if headline.get("tf32") else ""
        baseline_comparable = headline.get("dtype") == "float32"
        comp_pool = [c for c in pool if c.get("dtype") == "float32"]
        comp_big = [c for c in comp_pool if c["atoms"] > 50000]
        comp = max(
            comp_big or comp_pool, key=lambda c: c["atom_steps_per_s"], default=None
        )
        mode_label = "MD" if headline.get("mode") == "md" else "MD inference"
        print(
            json.dumps(
                {
                    "metric": (
                        f"{mode_label} throughput ({headline.get('atoms')} atoms, "
                        f"l_max=2, energy+forces, {headline.get('dtype')}{qualifier})"
                    ),
                    "value": value,
                    "unit": "atom-steps/s/chip",
                    "vs_baseline": (
                        round(value / _A100_BASELINE_ATOM_STEPS_PER_S, 4)
                        if baseline_comparable
                        else None
                    ),
                    **(
                        {
                            "vs_baseline_comparable": round(
                                comp["atom_steps_per_s"]
                                / _A100_BASELINE_ATOM_STEPS_PER_S,
                                4,
                            ),
                            "comparable_case": (
                                f"{comp['atoms']} atoms {comp['dtype']}"
                                f"{' tf32' if comp.get('tf32') else ''} {comp['mode']}"
                            ),
                        }
                        if comp is not None
                        else {}
                    ),
                    "extras": {"cases": cases},
                }
            ),
            flush=True,
        )

    # (atoms, mode, impl, dtype, steps, remat, tf32, fgm, tier)
    # tier "cheap" always runs; tier "big" needs the HBM probe AND remaining
    # budget; tier "mid" needs remaining budget only.
    # Ordering rationale (r4, after r3 left 6 of 10 rows unrun): calib first
    # (seconds, and every later case's pct_of_achievable needs it), then the
    # two cheap anchors, then ALL fast-compiling 23k rows — bf16 (the repo's
    # best-ever number), train (fr+save_tp), xla — so the full story is on
    # the record before any slow-compiling case; the >50k rows and the
    # md row (cold Mosaic+XLA compile took >20 min through the tunnel in r3)
    # run last.  Train rows use fr (dual-sweep surrogate) + save_tp: the
    # only combination whose temp memory is boundable (6.0 GiB at 23k since
    # the structural VJPs, 2.65 with the r4 edge-chunked sweep, vs rr's
    # 14-15 at ANY remat policy) — robust next to a co-tenant's 16 GB chip.
    # r5 matrix: trimmed to the rows the record needs (VERDICT r4 item 2 —
    # "calib, 23k f32/bf16 infer, 23k train, md, >=1 100k infer + the 100k
    # f32 train row"), ordered so they land in priority order within the
    # 1800 s budget.  Dropped the 23k xla infer row (4k xla is the XLA
    # anchor) and the 100k f32-tf32 infer row (strict f32 + bf16 cover the
    # comparison).  The md row (host-integration loop — ONE infer-sized
    # compile) moved BEFORE the 100k rows: it is the north-star metric and
    # never landed in rounds 1-4.
    # Compile-cache reality (r5, corrected): the persistent cache DOES hit
    # across processes when the program is bit-identical (same shapes/dtype/
    # tf32/fr_chunks/remat/kernel env) — measured 190 s -> 14 s on the 23k
    # E+F program — but the 100k f32 train compile is >1100 s COLD (rc=124
    # probe, 2026-08-20), far beyond any per-case cap.  100k rows therefore
    # land only when tools/warm_bench_cache.py has run beforehand (it
    # compiles every matrix program once, uncapped); cold they record a
    # timeout error row and the budget moves on.
    plan = [
        (0, "calib", "-", "-", 0, False, False, None, "cheap"),
        (4000, "infer", "xla", dtype, n_steps, False, False, None, "cheap"),
        (23000, "infer", "pallas_fused", dtype, n_steps, False, False, None, "cheap"),
        (23000, "infer", "pallas_fused", "bfloat16", n_steps, False, False, None, "mid"),
        (23000, "train", "pallas_fused", dtype, max(3, n_steps // 2), "save_tp", True,
         "fr", "mid"),
        (23000, "md", "pallas_fused", dtype, n_steps, False, False, None, "mid"),
        (100000, "infer", "pallas_fused", dtype, n_steps, False, True, None, "big"),
        # 100k f32 TRAIN (edge-chunked fr sweep, fr_chunks=8 set below):
        # first possible in r4 (12.33 GiB vs ~27 unchunked); pallas_fused is
        # the only impl that compiles at 100k (VERDICT r2).  Runs BEFORE the
        # optional 100k bf16 rows: the verdict-required record is {calib,
        # 23k f32/bf16 infer, 23k train, md, >=1 100k infer, 100k f32 train}
        # — the bf16 100k rows are extras and take the budget-skip if tight.
        (100000, "train", "pallas_fused", dtype, 2, "save_tp", True, "fr", "big"),
        (100000, "infer", "pallas_fused", "bfloat16", n_steps, False, False, None, "big"),
        (100000, "train", "pallas_fused", "bfloat16", 2, "save_tp", False, "fr", "big"),
    ]

    # every case (and the HBM probe) runs in a CHILD process with its own
    # timeout: the axon tunnel has been observed in a HUNG state (device ops
    # block forever instead of erroring — r3, 2026-08-17 outage), and an
    # in-process hang would stall the whole matrix past the driver's kill
    # timeout with nothing on stdout (the round-2 failure mode).  A hung
    # case becomes an error row and the matrix moves on; compiled programs
    # are shared across children via the on-disk JAX compilation cache.
    subproc = os.environ.get("NEQUIP_BENCH_SUBPROC", "1") == "1"
    cases = []
    probe_ok = None
    for i, (atoms, mode, impl, dt_, steps, remat, tf32, fgm, tier) in enumerate(plan):
        elapsed = time.perf_counter() - t_start
        if i > 0 and tier != "cheap" and elapsed > budget_s:
            cases.append(
                {"atoms": atoms, "mode": mode, "tp_impl": impl, "dtype": dt_,
                 "error": "skipped: bench time budget exhausted"}
            )
            continue
        if tier == "big":
            if probe_ok is None:
                probe_ok = _hbm_probe_guarded() if subproc else hbm_probe()
            if not probe_ok:
                cases.append(
                    {"atoms": atoms, "mode": mode, "tp_impl": impl, "dtype": dt_,
                     "error": "skipped: HBM probe failed (co-tenant holds chip memory or tunnel down)"}
                )
                continue
        # every fr train row runs the edge-chunked sweep: at >50k it is
        # required (unchunked window ~27 GiB f32 vs a 16 GB chip) and at 23k
        # it is FREE — measured A/B 493.2 (chunked) vs 495.2 ms (unchunked)
        # on a calm chip (2026-08-20, /tmp/train_chunk_ab.py) — while cutting
        # the temp floor 6.0 -> 2.65 GiB, so the row now matches the
        # production recommendation (VERDICT r4 weak #6)
        fr_chunks = 8 if mode == "train" else None
        if subproc:
            elapsed = time.perf_counter() - t_start
            # cap 600 s: in r4 two 900 s rows ate a third of the budget and
            # the driver killed the matrix before the 100k/md rows ran
            timeout_s = min(600.0, max(300.0, budget_s - elapsed + 120.0))
            case = _run_case_guarded(
                atoms, mode, impl, dt_, steps, remat, tf32, fgm, timeout_s,
                fr_chunks=fr_chunks,
            )
        else:
            case = run_case(
                atoms, mode, impl, dt_, steps, remat=remat, tf32=tf32, fgm=fgm,
                fr_chunks=fr_chunks,
            )
        cases.append(case)
        emit(cases)
        # total-tunnel-death early exit: if the FIRST (cheap, known-good)
        # case hung AND a guarded probe also fails, the backend is gone —
        # record skip rows for the rest instead of burning a timeout each
        if (
            subproc
            and i == 0
            and "timed out" in case.get("error", "")
            and not _hbm_probe_guarded(0.01, timeout_s=240.0)
        ):
            for atoms2, mode2, impl2, dt2, *_rest in plan[1:]:
                cases.append(
                    {"atoms": atoms2, "mode": mode2, "tp_impl": impl2,
                     "dtype": dt2,
                     "error": "skipped: TPU backend unreachable (tunnel outage)"}
                )
            emit(cases)
            return

    # insurance for multi-tenant HBM congestion: if no >50k float32 inference
    # case landed, a reduced >50k size keeps the north-star-scale headline
    # measurable (error rows stay in extras for the record)
    big_ok = [
        c for c in cases
        if c.get("mode") == "infer" and c.get("atoms", 0) > 50000
        and "error" not in c and c.get("dtype") == "float32"
    ]
    if not big_ok and (probe_ok or hbm_probe(3.0)):
        cases.append(run_case(64000, "infer", "pallas_fused", dtype, n_steps))
    emit(cases)


if __name__ == "__main__":
    main()
