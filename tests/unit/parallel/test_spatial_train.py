"""2-D mesh (dp x graph) training gates: exact equality with single-device.

The SPMD generalization of DDP + LAMMPS spatial decomposition (SURVEY §2.9):
2 frames per step, each slab-partitioned over 4 devices, must produce the
same losses, epoch metrics, and post-optimizer parameters as one device
processing the same frames as ordinary padded batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.data.dataset import LJTestDataset
from nequip_tpu.data.loader import DataLoader
from nequip_tpu.data.transforms import (
    ChemicalSpeciesToAtomTypeMapper,
    NeighborListTransform,
)
from nequip_tpu.model import NequIPGNNModel
from nequip_tpu.parallel import (
    SpatialFrameDataModule,
    SpatialFrameLoader,
    SpatialTrainModule,
    make_2d_mesh,
)
from nequip_tpu.train import EnergyForceLoss, EnergyForceMetrics, NequIPTrainModule

R_MAX = 4.0
N_DP, N_GRAPH = 2, 4


def _dataset(n):
    return LJTestDataset(
        supercell=(4, 2, 2),  # 64 atoms: big enough for 4 slabs
        num_frames=n,
        seed=3,
        transforms=[
            ChemicalSpeciesToAtomTypeMapper(chemical_symbols=["Cu"]),
            NeighborListTransform(r_max=R_MAX),
        ],
    )


def _model():
    return NequIPGNNModel(
        seed=11,
        model_dtype="float64",
        type_names=["Cu"],
        r_max=R_MAX,
        num_layers=2,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=12.0,
        per_type_energy_shifts={"Cu": -0.5},
    )


OPT = {"_target_": "optax.adam", "learning_rate": 1e-2}


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < N_DP * N_GRAPH:
        pytest.skip(f"needs {N_DP * N_GRAPH} devices")
    return _dataset(4)


def test_2d_mesh_training_matches_single_device(setup):
    ds = setup
    # --- single-device reference: 2 steps of batch_size 2 ----------------
    ref = NequIPTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        optimizer=OPT,
    )
    state = ref.init_state()
    step = jax.jit(ref.make_train_step())
    coeffs = ref.loss.coeff_vector()
    ref_losses = []
    for batch in DataLoader(ds, batch_size=N_DP, shuffle=False):
        state, logs = step(state, batch, coeffs, jnp.asarray(1.0))
        ref_losses.append(float(logs["train_loss_step/weighted_sum"]))
    ref_epoch = ref.loss.compute(state.loss_state)

    # --- 2-D mesh: same frames, dp=2 x graph=4 ---------------------------
    mesh = make_2d_mesh(N_DP, N_GRAPH)
    sp = SpatialTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        optimizer=OPT,
        mesh=mesh,
    )
    sp_state = sp.init_state()
    sp_step = jax.jit(sp.make_train_step())
    sp_losses = []
    for batch in SpatialFrameLoader(ds, mesh, R_MAX, shuffle=False):
        sp_state, logs = sp_step(sp_state, batch, coeffs, jnp.asarray(1.0))
        sp_losses.append(float(logs["train_loss_step/weighted_sum"]))
    sp_epoch = sp.loss.compute(sp_state.loss_state)

    np.testing.assert_allclose(sp_losses, ref_losses, rtol=1e-9)
    for k in ref_epoch:
        np.testing.assert_allclose(sp_epoch[k], ref_epoch[k], rtol=1e-9, err_msg=k)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(sp_state.params)),
        jax.tree.leaves(jax.device_get(state.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)


def test_2d_mesh_eval_matches_single_device(setup):
    ds = setup
    mesh = make_2d_mesh(N_DP, N_GRAPH)
    mgr = EnergyForceMetrics(type_names=None)

    ref = NequIPTrainModule(model=_model(), val_metrics=EnergyForceMetrics())
    params = ref.init_state().params
    eval_step = jax.jit(ref.make_eval_step(ref.val_metrics))
    mstate = ref.val_metrics.init_state()
    for batch in DataLoader(ds, batch_size=N_DP, shuffle=False):
        mstate, _ = eval_step(params, mstate, batch)
    ref_vals = ref.val_metrics.compute(mstate)

    sp = SpatialTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        val_metrics=EnergyForceMetrics(),
        optimizer=OPT,
        mesh=mesh,
    )
    sp_eval = jax.jit(sp.make_eval_step(sp.val_metrics))
    sp_mstate = sp.val_metrics.init_state()
    for batch in SpatialFrameLoader(ds, mesh, R_MAX, shuffle=False):
        sp_mstate, _ = sp_eval(params, sp_mstate, batch)
    sp_vals = sp.val_metrics.compute(sp_mstate)

    assert set(sp_vals) == set(ref_vals)
    for k in ref_vals:
        np.testing.assert_allclose(sp_vals[k], ref_vals[k], rtol=1e-9, err_msg=k)


def test_2d_mesh_through_trainer(setup, tmp_path):
    """SpatialTrainModule trains through the UNMODIFIED Trainer loop, with
    epoch metrics matching a single-device trainer run on the same data."""
    from nequip_tpu.train.trainer import Trainer

    ds = setup
    mesh = make_2d_mesh(N_DP, N_GRAPH)
    sp = SpatialTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        val_metrics=EnergyForceMetrics(),
        optimizer=OPT,
        mesh=mesh,
    )
    dm = SpatialFrameDataModule(
        train_dataset=ds, val_dataset=_dataset(2), mesh=mesh, r_max=R_MAX,
        shuffle=False,
    )
    tr = Trainer(
        max_epochs=2, ckpt_dir=str(tmp_path / "ckpt"),
        monitor="val0_epoch/weighted_sum",
    )
    tr.fit(sp, dm)
    rows = tr._metrics_rows
    assert len(rows) == 2
    assert all(np.isfinite(r["train_loss_epoch/weighted_sum"]) for r in rows)
    assert all(np.isfinite(r["val0_epoch/weighted_sum"]) for r in rows)

    # single-device trainer on the same frames for comparison
    class _DM:
        def setup(self, stage=None):
            pass

        def train_dataloader(self):
            return DataLoader(ds, batch_size=N_DP, shuffle=False)

        def val_dataloaders(self):
            return [DataLoader(_dataset(2), batch_size=N_DP, shuffle=False)]

        def test_dataloaders(self):
            return []

    ref = NequIPTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        val_metrics=EnergyForceMetrics(),
        optimizer=OPT,
    )
    tr2 = Trainer(
        max_epochs=2, ckpt_dir=str(tmp_path / "ckpt_ref"),
        monitor="val0_epoch/weighted_sum",
    )
    tr2.fit(ref, _DM())
    for r_sp, r_ref in zip(rows, tr2._metrics_rows):
        for k in (
            "train_loss_epoch/weighted_sum",
            "val0_epoch/weighted_sum",
        ):
            np.testing.assert_allclose(r_sp[k], r_ref[k], rtol=1e-9, err_msg=k)


def test_2d_mesh_fr_training_matches_single_device(setup):
    """SpatialTrainModule with force_grad_mode='fr' (dual-sweep surrogate):
    losses/params must match the single-device rr reference exactly — the
    global tangent (local cotangent + every other device's cotangent via
    the ghosts) reproduces the cross-device force coupling."""
    ds = setup
    ref = NequIPTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        optimizer=OPT,
    )
    state = ref.init_state()
    step = jax.jit(ref.make_train_step())
    coeffs = ref.loss.coeff_vector()
    ref_losses = []
    for batch in DataLoader(ds, batch_size=N_DP, shuffle=False):
        state, logs = step(state, batch, coeffs, jnp.asarray(1.0))
        ref_losses.append(float(logs["train_loss_step/weighted_sum"]))

    mesh = make_2d_mesh(N_DP, N_GRAPH)
    sp = SpatialTrainModule(
        model=_model(),
        loss=EnergyForceLoss(per_atom_energy=True),
        optimizer=OPT,
        mesh=mesh,
        force_grad_mode="fr",
    )
    sp_state = sp.init_state()
    sp_step = jax.jit(sp.make_train_step())
    sp_losses = []
    for batch in SpatialFrameLoader(ds, mesh, R_MAX, shuffle=False):
        sp_state, logs = sp_step(sp_state, batch, coeffs, jnp.asarray(1.0))
        sp_losses.append(float(logs["train_loss_step/weighted_sum"]))

    np.testing.assert_allclose(sp_losses, ref_losses, rtol=1e-9)
    for p, q in zip(
        jax.tree.leaves(jax.device_get(sp_state.params)),
        jax.tree.leaves(jax.device_get(state.params)),
    ):
        np.testing.assert_allclose(p, q, rtol=1e-9, atol=1e-11)
