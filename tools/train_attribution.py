"""Attribute the training-step cost at flagship size (VERDICT r2 item 4).

Times an ablation ladder on the real chip and inspects the compiled HLO of
the full train step for pathological ops (sorts, big scatters, convert
chains).  Ladder:

  1. model fwd E+F (the infer step)
  2. energy-only-loss train step (do_derivatives off) — 1st-order training
  3. full E+F-loss train step — reverse-over-reverse (the bench number)

Usage: python tools/train_attribution.py [--atoms 23000] [--impl pallas]
"""

import argparse
import os
import re
import sys
import time
from collections import Counter

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def hlo_summary(compiled, label):
    txt = compiled.as_text()
    ops = Counter()
    big = Counter()
    for m in re.finditer(r"^\s*(?:ROOT )?[%\w.-]+ = ([a-z0-9-]+)\(", txt, re.M):
        ops[m.group(1)] += 1
    for m in re.finditer(
        r"= ((?:\([^)]*\)|[a-z0-9]+\[[^\]]*\])[^\n=]*?) (sort|scatter|custom-call)\(",
        txt,
    ):
        big[f"{m.group(2)}: {m.group(1).strip()[:90]}"] += 1
    print(f"\n=== HLO summary: {label} ({len(txt)/1e6:.1f} MB text) ===")
    for k, v in ops.most_common(25):
        print(f"  {k:28s} {v}")
    print("  -- sort/scatter/custom-call shapes --")
    for k, v in big.most_common(40):
        print(f"  {v:4d}x {k}")
    try:
        mem = compiled.memory_analysis()
        print(
            f"  temp={mem.temp_size_in_bytes/1e9:.2f}GB "
            f"arg={mem.argument_size_in_bytes/1e9:.2f}GB "
            f"out={mem.output_size_in_bytes/1e9:.2f}GB"
        )
    except Exception as e:
        print(f"  memory_analysis unavailable: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=23000)
    ap.add_argument("--impl", type=str, default="pallas")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hlo-only", action="store_true")
    ap.add_argument("--skip-hlo", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss
    from nequip_tpu.train.metrics_manager import MetricsManager, PerAtomModifier

    model, params, data = _example_model_and_batch(
        model_dtype="float32", n_atoms=args.atoms, l_max=2, tp_impl=args.impl
    )
    rng = np.random.RandomState(2)
    data = dict(data)
    data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(rng.standard_normal((2, 1)), jnp.float32)
    data[_keys.FORCE_KEY] = jnp.asarray(
        rng.standard_normal(data[_keys.POSITIONS_KEY].shape), jnp.float32
    )

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
        print(f"{label:44s} {ms:9.1f} ms  (first {t_first*1e3:.0f} ms)", flush=True)
        return ms

    def sync_logs(o):
        np.asarray(o[1]["train_loss_step/weighted_sum"])

    results = {}

    # --- 3. full E+F train step (compile + HLO first) ---
    module = EMATrainModule(
        model=model,
        loss=EnergyForceLoss(type_names=["Cu"]),
        optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
    )
    state = module.init_state()
    coeffs = module.loss.coeff_vector()
    step = jax.jit(module.make_train_step())
    compiled = step.lower(state, data, coeffs).compile()
    if not args.skip_hlo:
        hlo_summary(compiled, f"full E+F train step ({args.impl}, {args.atoms})")
    if args.hlo_only:
        return
    results["train_EF"] = timeit(
        "full E+F-loss train step", lambda: step(state, data, coeffs), sync_logs
    )

    # --- 1. fwd E+F (infer) ---
    fwd = jax.jit(lambda p, d: model(p, d))
    results["fwd_EF"] = timeit(
        "model fwd E+F (infer)",
        lambda: fwd(params, data),
        lambda o: np.asarray(o[_keys.FORCE_KEY][0]),
    )

    # --- 2. energy-only train step (no force branch at all) ---
    model.model.do_derivatives = False
    try:
        e_loss = MetricsManager(
            [
                {
                    "name": "per_atom_energy_mse",
                    "field": PerAtomModifier(_keys.TOTAL_ENERGY_KEY),
                    "coeff": 1.0,
                    "metric": "mse",
                }
            ],
            type_names=["Cu"],
        )
        module_e = EMATrainModule(
            model=model,
            loss=e_loss,
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
        )
        state_e = module_e.init_state()
        step_e = jax.jit(module_e.make_train_step())
        ce = module_e.loss.coeff_vector()
        results["train_E"] = timeit(
            "energy-only train step (1st order)",
            lambda: step_e(state_e, data, ce),
            sync_logs,
        )
        fwd_e = jax.jit(lambda p, d: model(p, d))
        results["fwd_E"] = timeit(
            "model fwd E-only",
            lambda: fwd_e(params, data),
            lambda o: np.asarray(o[_keys.TOTAL_ENERGY_KEY][0]),
        )
    finally:
        model.model.do_derivatives = True

    print("\nderived attribution (ms):")
    if "train_E" in results:
        print(f"  fwd E-only                      : {results['fwd_E']:8.1f}")
        print(f"  force comp (fwd E+F - fwd E)    : {results['fwd_EF'] - results['fwd_E']:8.1f}")
        print(f"  1st-order train (E train - E fwd): {results['train_E'] - results['fwd_E']:8.1f}")
        print(f"  2nd-order force-loss (EF train - E train): {results['train_EF'] - results['train_E']:8.1f}")


if __name__ == "__main__":
    main()
