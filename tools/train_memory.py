"""Compile-only memory analysis of the 23k train step per remat policy.

Timing on the tunneled multi-tenant chip is too noisy to A/B remat policies
(co-tenant HBM thrash is 25-130x), but the compiled executable's
``memory_analysis()`` is deterministic: it reports the temp/argument/output
buffer sizes the program needs, which is exactly what decides whether a
train step can run next to a co-tenant.

Run: python tools/train_memory.py   (compiles 3 variants; no steps executed)
Env: NEQUIP_BENCH_ATOMS (default 23000), NEQUIP_TRAIN_MEM_IMPLS
     (comma list, default "pallas"), NEQUIP_TRAIN_MEM_REMATS
     (comma list of 0|save_tp|1|force|force_full, default
     "0,save_tp,1,force,force_full").
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss

    n_atoms = int(os.environ.get("NEQUIP_BENCH_ATOMS", 23000))
    impls = os.environ.get("NEQUIP_TRAIN_MEM_IMPLS", "pallas").split(",")
    remats = os.environ.get(
        "NEQUIP_TRAIN_MEM_REMATS", "0,save_tp,1,force,force_full"
    ).split(",")

    for impl in impls:
        for rm in remats:
            remat = {"0": False, "1": True}.get(rm, rm)
            try:
                dt = os.environ.get("NEQUIP_TRAIN_MEM_DTYPE", "float32")
                model, params, data = _example_model_and_batch(
                    model_dtype=dt, n_atoms=n_atoms, l_max=2,
                    tp_impl=impl, remat=remat,
                )
                rng = np.random.RandomState(2)
                data = dict(data)
                data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(
                    rng.standard_normal((2, 1)), dtype=dt
                )
                data[_keys.FORCE_KEY] = jnp.asarray(
                    rng.standard_normal(data[_keys.POSITIONS_KEY].shape),
                    dtype=dt,
                )
                module = EMATrainModule(
                    model=model,
                    loss=EnergyForceLoss(type_names=["Cu"]),
                    optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
                    force_grad_mode=os.environ.get(
                        "NEQUIP_TRAIN_MEM_FGM", "rr"
                    ),
                )
                state = module.init_state()
                from nequip_tpu.utils.global_state import donate_argnums
                step = jax.jit(module.make_train_step(), donate_argnums=donate_argnums(0))
                compiled = step.lower(
                    state, data, module.loss.coeff_vector()
                ).compile()
                ma = compiled.memory_analysis()
                gib = 1024.0**3
                print(
                    f"impl={impl:13s} remat={str(remat):8s} "
                    f"temp={ma.temp_size_in_bytes / gib:6.2f} GiB  "
                    f"args={ma.argument_size_in_bytes / gib:6.2f} GiB  "
                    f"out={ma.output_size_in_bytes / gib:6.2f} GiB  "
                    f"peak~{(ma.temp_size_in_bytes + ma.argument_size_in_bytes) / gib:6.2f} GiB"
                )
            except Exception as e:
                print(f"impl={impl:13s} remat={rm:8s} ERROR {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
