"""Buffer donation is default-OFF on the hot step functions.

ROUND5 attribution (real chip, 2026-08-19): the SAME fr train step jitted
with ``donate_argnums=(0,)`` ran at 10.3-16.6 s/step vs 0.47 s/step without
donation at 23k atoms — input-output-aliased executables are ~30x slower on
the measured TPU runtime (and compile ~10x slower), while the donation
saves only MBs.  ``utils.global_state.donate_argnums`` encodes the policy;
``NEQUIP_DONATE_BUFFERS=1`` re-enables donation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.utils.global_state import donate_argnums


def test_default_off(monkeypatch):
    monkeypatch.delenv("NEQUIP_DONATE_BUFFERS", raising=False)
    assert donate_argnums(0) == ()
    assert donate_argnums(0, 1, 2) == ()


def test_env_enables(monkeypatch):
    monkeypatch.setenv("NEQUIP_DONATE_BUFFERS", "1")
    assert donate_argnums(0) == (0,)
    assert donate_argnums(0, 1, 2) == (0, 1, 2)


def test_trainer_step_does_not_delete_state(monkeypatch):
    """With the default policy, the jitted train step must NOT delete its
    input state (the r4 code donated it; a caller keeping `state` alive
    would crash on reuse)."""
    monkeypatch.delenv("NEQUIP_DONATE_BUFFERS", raising=False)
    from nequip_tpu.data import _keys
    from nequip_tpu.model import NequIPGNNModel
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss
    from nequip_tpu.data import compute_neighborlist_, from_dict, pad_batch

    model = NequIPGNNModel(
        seed=0, model_dtype="float32", type_names=["Cu"], r_max=4.0,
        num_layers=1, l_max=1, parity=False, num_features=8,
        avg_num_neighbors=12.0,
    )
    rng = np.random.RandomState(0)
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: rng.uniform(0, 5.0, (8, 3)),
            _keys.CELL_KEY: np.diag([5.0] * 3),
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOM_TYPE_KEY: np.zeros(8, dtype=int),
        }
    )
    frame = compute_neighborlist_(frame, 4.0)
    data = {k: jnp.asarray(np.asarray(v)) for k, v in pad_batch(frame, 16, 256, 2).items()}
    data[_keys.TOTAL_ENERGY_KEY] = jnp.zeros((2, 1), jnp.float32)
    data[_keys.FORCE_KEY] = jnp.zeros((16, 3), jnp.float32)

    module = EMATrainModule(
        model=model,
        loss=EnergyForceLoss(type_names=["Cu"]),
        optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
    )
    state = module.init_state()
    coeffs = module.loss.coeff_vector()
    from nequip_tpu.utils.global_state import donate_argnums as dn

    step = jax.jit(module.make_train_step(), donate_argnums=dn(0))
    new_state, _ = step(state, data, coeffs)
    # the ORIGINAL state must still be readable (would raise if donated)
    leaf = jax.tree.leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    assert int(new_state.step) == 1
