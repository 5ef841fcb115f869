"""Benchmark: MD-inference throughput (energy + forces per step) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: atom-steps/s for a periodic Cu system at l_max=2 (the BASELINE.json
north-star scenario).  ``vs_baseline`` is measured against an assumed
A100-class reference throughput of 1.0e6 atom-steps/s/GPU for a NequIP
l_max=2 model (the reference repo publishes no numbers — see BASELINE.md —
so this is an order-of-magnitude anchor from the Tan et al. performance
paper's hardware class; the target is >= 2x).

Env knobs: NEQUIP_BENCH_ATOMS (default 20000), NEQUIP_BENCH_STEPS (default
10), NEQUIP_BENCH_DTYPE (float32), NEQUIP_BENCH_MODE (infer|train),
NEQUIP_BENCH_TP_IMPL (xla|pallas|pallas_fused), NEQUIP_BENCH_REMAT (0|1).
"""

import json
import os
import time

import numpy as np

_A100_BASELINE_ATOM_STEPS_PER_S = 1.0e6


def main():
    import jax

    n_atoms = int(os.environ.get("NEQUIP_BENCH_ATOMS", 20000))
    n_steps = int(os.environ.get("NEQUIP_BENCH_STEPS", 10))
    dtype = os.environ.get("NEQUIP_BENCH_DTYPE", "float32")

    from __graft_entry__ import _example_model_and_batch

    # auto: the XLA TP path (with the uvu mul2=1 fast path: outer product +
    # one CG matmul) is fastest at <=50k atoms on this chip; the fully-fused
    # Pallas variant (radial MLP in-kernel) unlocks 100k+ atoms
    default_impl = "xla" if n_atoms <= 50000 else "pallas_fused"
    tp_impl = os.environ.get("NEQUIP_BENCH_TP_IMPL", default_impl)
    remat = os.environ.get("NEQUIP_BENCH_REMAT", "0") == "1"
    model, params, data = _example_model_and_batch(
        model_dtype=dtype, n_atoms=n_atoms, l_max=2, tp_impl=tp_impl, remat=remat
    )
    from nequip_tpu.data import _keys as _k

    n_atoms = int(np.asarray(data[_k.NODE_MASK_KEY]).sum())

    from nequip_tpu.data import _keys

    mode = os.environ.get("NEQUIP_BENCH_MODE", "infer")
    if mode == "train":
        # training-step throughput (model must use a 2nd-order-safe TP impl)
        import jax.numpy as jnp

        from nequip_tpu.train import EMATrainModule, EnergyForceLoss

        rng = np.random.RandomState(2)
        data = dict(data)
        data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(rng.standard_normal((2, 1)), dtype=dtype)
        data[_keys.FORCE_KEY] = jnp.asarray(
            rng.standard_normal(data[_keys.POSITIONS_KEY].shape), dtype=dtype
        )
        module = EMATrainModule(
            model=model,
            loss=EnergyForceLoss(type_names=["Cu"]),
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
        )
        state = module.init_state()
        step = jax.jit(module.make_train_step(), donate_argnums=(0,))
        coeffs = module.loss.coeff_vector()
        state, logs = step(state, data, coeffs)
        np.asarray(logs["train_loss_step/weighted_sum"])
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, logs = step(state, data, coeffs)
        np.asarray(logs["train_loss_step/weighted_sum"])
        dt = (time.perf_counter() - t0) / n_steps
        metric = f"training throughput ({n_atoms} atoms, l_max=2, E+F loss)"
    else:
        fwd = jax.jit(lambda p, d: model(p, d))
        # warmup / compile (sync via host transfer — block_until_ready does
        # not reliably wait through the axon device tunnel)
        out = fwd(params, data)
        np.asarray(out[_keys.FORCE_KEY][0])

        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = fwd(params, data)
        np.asarray(out[_keys.FORCE_KEY][0])
        dt = (time.perf_counter() - t0) / n_steps
        metric = f"MD inference throughput ({n_atoms} atoms, l_max=2, energy+forces)"

    atom_steps_per_s = n_atoms / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(atom_steps_per_s, 1),
                "unit": "atom-steps/s/chip",
                "vs_baseline": round(
                    atom_steps_per_s / _A100_BASELINE_ATOM_STEPS_PER_S, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
