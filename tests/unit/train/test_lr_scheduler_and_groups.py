"""Epoch LR schedulers, param_groups, and multi-model module contract.

Mirrors the reference's lr_scheduler monitor/interval plumbing and nested
scheduler instantiation (``/root/reference/nequip/train/lightning.py:175-219``)
and the ModuleDict multi-model contract (``:78-107``).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.train import (
    StepLR,
    MultiStepLR,
    ExponentialLR,
    LinearLR,
    CosineAnnealingLR,
    ReduceLROnPlateau,
    SequentialLR,
    ChainedScheduler,
    build_scheduler,
    NequIPTrainModule,
)


# ---------------------------------------------------------------- scheduler math
def test_step_and_exponential_lr():
    s = StepLR(step_size=2, gamma=0.5)
    scales = [s.step() for _ in range(6)]
    assert scales == [1.0, 1.0, 0.5, 0.5, 0.25, 0.25]
    e = ExponentialLR(gamma=0.9)
    assert np.allclose([e.step() for e2 in range(3)], [1.0, 0.9, 0.81])
    m = MultiStepLR(milestones=[1, 3], gamma=0.1)
    assert np.allclose([m.step() for _ in range(4)], [1.0, 0.1, 0.1, 0.01])


def test_linear_and_cosine_lr():
    lin = LinearLR(start_factor=0.5, end_factor=1.0, total_iters=2)
    assert np.allclose([lin.step() for _ in range(4)], [0.5, 0.75, 1.0, 1.0])
    cos = CosineAnnealingLR(T_max=4, eta_min_factor=0.1)
    scales = [cos.step() for _ in range(5)]
    assert math.isclose(scales[0], 1.0)
    assert math.isclose(scales[4], 0.1, rel_tol=1e-12)  # floor at eta_min factor
    assert scales == sorted(scales, reverse=True)


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=1, threshold=0.0, threshold_mode="abs")
    # improving -> hold
    assert s.step(1.0) == 1.0
    assert s.step(0.9) == 1.0
    # stagnate: 1 bad epoch tolerated, the 2nd triggers the cut
    assert s.step(0.9) == 1.0
    assert s.step(0.9) == 0.5
    # counter reset after the cut
    assert s.step(0.9) == 0.5
    # resumes from checkpoint state exactly
    s2 = ReduceLROnPlateau(factor=0.5, patience=1, threshold=0.0, threshold_mode="abs")
    s2.load_state_dict(s.state_dict())
    assert s2.step(0.9) == s.step(0.9)


def test_sequential_and_chained_from_nested_config():
    # nested config form, as the reference instantiates recursively
    cfg = {
        "_target_": "nequip_tpu.train.SequentialLR",
        "milestones": [2],
        "schedulers": [
            {"_target_": "nequip_tpu.train.LinearLR",
             "start_factor": 0.5, "end_factor": 1.0, "total_iters": 2},
            {"_target_": "nequip_tpu.train.ExponentialLR", "gamma": 0.5},
        ],
    }
    s = build_scheduler(cfg)
    scales = [s.step() for _ in range(4)]
    assert np.allclose(scales[:2], [0.5, 0.75])
    assert np.allclose(scales[2:], [1.0, 0.5])  # exponential restarts at its epoch 0

    ch = build_scheduler(
        {
            "_target_": "nequip_tpu.train.ChainedScheduler",
            "schedulers": [
                {"_target_": "nequip_tpu.train.StepLR", "step_size": 1, "gamma": 0.5},
                {"_target_": "nequip_tpu.train.ConstantLR",
                 "factor": 0.5, "total_iters": 1},
            ],
        }
    )
    assert np.allclose([ch.step() for _ in range(3)], [0.5, 0.5, 0.25])


# ---------------------------------------------------------------- module wiring
def _model_cfg(seed=5):
    return {
        "_target_": "nequip_tpu.model.NequIPGNNModel",
        "seed": seed,
        "model_dtype": "float64",
        "type_names": ["Cu"],
        "r_max": 4.0,
        "num_layers": 1,
        "l_max": 1,
        "parity": False,
        "num_features": 4,
        "radial_mlp_width": 8,
        "avg_num_neighbors": 18.0,
        "per_type_energy_shifts": {"Cu": -0.4},
    }


def _loss_cfg():
    from nequip_tpu.train import EnergyForceLoss

    return EnergyForceLoss(type_names=["Cu"])


@pytest.fixture(scope="module")
def batch():
    from nequip_tpu.data import (
        compute_neighborlist_,
        batched_from_list,
        pad_batch,
        to_device,
    )
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data.transforms import ChemicalSpeciesToAtomTypeMapper

    ds = LJTestDataset(
        num_frames=2, seed=3, transforms=[ChemicalSpeciesToAtomTypeMapper(["Cu"])]
    )
    frames = [compute_neighborlist_(ds[i], 4.0) for i in range(2)]
    return to_device(pad_batch(batched_from_list(frames), 128, 2048, 3))


def test_module_epoch_scheduler_and_lr_scale(batch):
    module = NequIPTrainModule(
        model=_model_cfg(),
        loss=_loss_cfg(),
        optimizer={"_target_": "optax.sgd", "learning_rate": 0.01},
        lr_scheduler={
            "scheduler": {"_target_": "nequip_tpu.train.StepLR",
                          "step_size": 1, "gamma": 0.5},
            "interval": "epoch",
            "frequency": 1,
        },
    )
    assert module.lr_scheduler_obj is not None
    assert module.lr_scheduler_epoch_end(0, {}) == 1.0
    assert module.lr_scheduler_epoch_end(1, {}) == 0.5

    # lr_scale scales the update exactly (sgd: update = -lr * g * scale)
    state = module.init_state()
    step = jax.jit(module.make_train_step())
    s_full, _ = step(state, batch, module.loss.coeff_vector(), jnp.asarray(1.0))
    s_half, _ = step(state, batch, module.loss.coeff_vector(), jnp.asarray(0.5))
    d_full = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                          s_full.params, state.params)
    d_half = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                          s_half.params, state.params)
    for a, b in zip(jax.tree.leaves(d_full), jax.tree.leaves(d_half)):
        np.testing.assert_allclose(b, 0.5 * a, rtol=1e-10, atol=1e-14)


def test_param_groups_lr_override(batch):
    # group0: radial MLPs train at lr=0 -> unchanged; everything else moves
    module = NequIPTrainModule(
        model=_model_cfg(),
        loss=_loss_cfg(),
        optimizer={
            "_target_": "optax.sgd",
            "learning_rate": 0.01,
            "param_groups": [
                {"paths": ["layer0_convnet.conv.edge_mlp"], "learning_rate": 0.0}
            ],
        },
    )
    state = module.init_state()
    step = jax.jit(module.make_train_step())
    new_state, _ = step(state, batch, module.loss.coeff_vector())

    def paths_and_leaves(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from paths_and_leaves(v, f"{prefix}{k}." if prefix else f"{k}.")
        else:
            yield prefix[:-1], tree

    old = dict(paths_and_leaves(state.params))
    moved_other = False
    saw_group = False
    for path, leaf in paths_and_leaves(new_state.params):
        same = np.allclose(np.asarray(leaf), np.asarray(old[path]))
        if path.startswith("layer0_convnet.conv.edge_mlp"):
            saw_group = True
            assert same, f"group0 (lr=0) param {path} moved"
        elif not same:
            moved_other = True
    assert saw_group and moved_other


def test_multi_model_module_contract(batch):
    module = NequIPTrainModule(
        model={"m1": _model_cfg(seed=1), "m2": _model_cfg(seed=2)},
        loss=_loss_cfg(),
        optimizer={"_target_": "optax.adam", "learning_rate": 0.01},
    )
    assert set(module.models) == {"m1", "m2"}
    state = module.init_state()
    assert set(state.params) == {"m1", "m2"}
    # standard train step serves only the sole model, as in the reference
    with pytest.raises(AssertionError):
        module.make_train_step()
    # sole model still produces a forward pass
    out = module.model(state.params["m1"], batch)
    assert np.isfinite(np.asarray(out["total_energy"]).sum())
