"""Integration gates for the training workflow.

Ports of the reference's integration suite
(``/root/reference/tests/integration/test_train.py`` + ``conftest.py``):
training reproducibility, restart-vs-straight-through equivalence
(rel_tol 1e-14 in float64), validation-metric invariance to batch size.
"""

import copy
import os

import numpy as np
import jax
import pytest
import yaml

from nequip_tpu.scripts.train import run_config

CONFIG_PATH = os.path.join(os.path.dirname(__file__), "lj_config.yaml")


def load_cfg(tmpdir, **overrides):
    with open(CONFIG_PATH) as f:
        cfg = yaml.safe_load(f)
    cfg["trainer"]["ckpt_dir"] = os.path.join(str(tmpdir), "ckpt")
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def final_params(trainer):
    return jax.tree.leaves(jax.device_get(trainer.state.params))


def test_train_and_reproducibility(tmp_path):
    t1 = run_config(load_cfg(tmp_path / "a"))
    assert os.path.exists(os.path.join(t1.ckpt_dir, "last.ckpt"))
    assert os.path.exists(os.path.join(t1.ckpt_dir, "best.ckpt"))
    assert os.path.exists(os.path.join(t1.ckpt_dir, "metrics.csv"))
    losses1 = [r["train_loss_epoch/weighted_sum"] for r in t1._metrics_rows]
    assert all(np.isfinite(losses1))

    # same seeds -> identical training trajectory (conftest.py:125 analog)
    t2 = run_config(load_cfg(tmp_path / "b"))
    losses2 = [r["train_loss_epoch/weighted_sum"] for r in t2._metrics_rows]
    np.testing.assert_allclose(losses1, losses2, rtol=1e-12)


def test_restart_equivalence(tmp_path):
    """Train 4 epochs straight vs 2 + resume 2: identical final state.

    Parity: ``tests/integration/conftest.py:204`` (rel_tol 1e-14 float64).
    """
    straight = run_config(load_cfg(tmp_path / "straight", **{"trainer.max_epochs": 4}))

    short = run_config(load_cfg(tmp_path / "resume", **{"trainer.max_epochs": 2}))
    ckpt = os.path.join(short.ckpt_dir, "last.ckpt")
    resumed = run_config(
        load_cfg(tmp_path / "resume", **{"trainer.max_epochs": 4}), ckpt_path=ckpt
    )

    assert resumed.epoch == straight.epoch == 4
    for a, b in zip(final_params(straight), final_params(resumed)):
        np.testing.assert_allclose(a, b, rtol=1e-14, atol=1e-14)
    # EMA state must also match
    for a, b in zip(
        jax.tree.leaves(jax.device_get(straight.state.ema_params)),
        jax.tree.leaves(jax.device_get(resumed.state.ema_params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-14, atol=1e-14)


def test_val_metrics_batch_size_invariance():
    """Evaluation metrics must not depend on the batch size.

    Parity: ``conftest.py:173-191`` — the running-sum metrics make this exact.
    Tested directly on the eval step (no trainer) with a shared padded
    signature so one compilation covers both batch sizes.
    """
    from nequip_tpu.data import DataLoader
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data.transforms import (
        ChemicalSpeciesToAtomTypeMapper,
        NeighborListTransform,
    )
    from nequip_tpu.model import NequIPGNNModel
    from nequip_tpu.train import EnergyForceMetrics, NequIPTrainModule

    ds = LJTestDataset(
        num_frames=6,
        seed=11,
        transforms=[
            ChemicalSpeciesToAtomTypeMapper(["Cu"]),
            NeighborListTransform(r_max=4.0),
        ],
    )
    model = NequIPGNNModel(
        seed=3,
        model_dtype="float64",
        type_names=["Cu"],
        r_max=4.0,
        num_layers=1,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=18.0,
        per_type_energy_shifts={"Cu": -0.4},
    )
    module = NequIPTrainModule(
        model=model, val_metrics=EnergyForceMetrics(type_names=["Cu"])
    )
    params = model.init_params()
    eval_step = jax.jit(module.make_eval_step())

    capacity = {"n_nodes": 256, "n_edges": 4096, "n_frames": 7}
    results = {}
    for bs in (1, 3):
        mgr = module.val_metrics
        mstate = mgr.init_state()
        loader = DataLoader(ds, batch_size=bs, shuffle=False, capacity=capacity)
        for batch in loader:
            mstate, _ = eval_step(params, mstate, batch)
        results[bs] = mgr.compute(mstate)
    assert len(results[1]) > 0
    for k in results[1]:
        np.testing.assert_allclose(results[1][k], results[3][k], rtol=1e-10, err_msg=k)


def test_dp_training_via_trainer_matches_single_device(tmp_path):
    """``trainer.devices: 8`` end-to-end (CLI config path): per-epoch losses
    and val metrics must equal a single device processing the same frames.

    The train split is 6 frames; devices=8 with per-device batch_size=2
    groups all 3 micro-batches into ONE exact super-step per epoch (plus
    fully-masked tail fillers), which is equivalent to a single device with
    batch_size=6.  Parity: the reference's DDP-as-a-config-flag
    (``/root/reference/docs/guide/accelerations/ddp_training.md``).
    """
    import jax as _jax

    if _jax.device_count() < 8:
        pytest.skip("needs 8 devices")

    t_ref = run_config(
        load_cfg(
            tmp_path / "single",
            **{"data.train_dataloader.batch_size": 6, "trainer.max_epochs": 2},
        )
    )
    t_dp = run_config(
        load_cfg(
            tmp_path / "dp",
            **{
                "data.train_dataloader.batch_size": 2,
                "trainer.devices": 8,
                "trainer.max_epochs": 2,
            },
        )
    )
    keys = [
        k
        for k in t_ref._metrics_rows[0]
        if k.startswith(("train_loss_epoch/", "val0_epoch/"))
    ]
    assert keys
    for row_ref, row_dp in zip(t_ref._metrics_rows, t_dp._metrics_rows):
        for k in keys:
            np.testing.assert_allclose(row_dp[k], row_ref[k], rtol=1e-10, err_msg=k)
    # final parameters identical
    for a, b in zip(final_params(t_ref), final_params(t_dp)):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_restart_equivalence_partial_sampler(tmp_path):
    """Mid-pass resume: with num_samples_per_epoch (PartialSampler windows),
    a restart continues at the exact data position — straight-through and
    resumed runs end bit-identical (the foundation-data path's answer to
    mid-epoch dataloader state, ref ``data/_sampler.py:8-105``)."""
    ov = {"data.train_dataloader.num_samples_per_epoch": 4}

    straight = run_config(
        load_cfg(tmp_path / "straight", **{"trainer.max_epochs": 4, **ov})
    )
    short = run_config(load_cfg(tmp_path / "resume", **{"trainer.max_epochs": 2, **ov}))
    ckpt = os.path.join(short.ckpt_dir, "last.ckpt")
    resumed = run_config(
        load_cfg(tmp_path / "resume", **{"trainer.max_epochs": 4, **ov}),
        ckpt_path=ckpt,
    )
    for a, b in zip(final_params(straight), final_params(resumed)):
        np.testing.assert_allclose(a, b, rtol=1e-14, atol=1e-14)


def test_fr_training_via_config_matches_rr(tmp_path):
    """force_grad_mode is a one-line config switch and the whole-workflow
    training trajectory is identical to the default (rr) run — the
    config-level proof of the dual-sweep surrogate's exactness."""
    t_rr = run_config(load_cfg(tmp_path / "rr"))
    t_fr = run_config(
        load_cfg(tmp_path / "fr", **{"training_module.force_grad_mode": "fr"})
    )
    rr = [r["train_loss_epoch/weighted_sum"] for r in t_rr._metrics_rows]
    fr = [r["train_loss_epoch/weighted_sum"] for r in t_fr._metrics_rows]
    np.testing.assert_allclose(fr, rr, rtol=1e-10)
    for a, b in zip(final_params(t_rr), final_params(t_fr)):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_training_accuracy_gate(tmp_path):
    """Small-budget accuracy gate (VERDICT r4 item 5): the model must FIT
    exact-LJ labels, not just reduce the loss.

    A 24-frame / 40-epoch / tiny-width run reaches <=10% relative force MAE
    on noise-free truncated-LJ labels (calibrated 2026-08-20: val forces_mae
    0.0142 eV/A vs label force RMS 0.151 -> 9.4%); the gate asserts <=15%
    (1.6x margin for cross-platform f32 accumulation differences).  The
    full-budget twin of this gate is ``configs/lj_accuracy.yaml`` and its
    committed record ``docs/accuracy/lj_training_record.json``.

    Parity: the reference's training-converges discipline
    (``/root/reference/tests/integration/test_train.py``) — strengthened
    from "loss decreases" to an absolute accuracy bound, possible here
    because the LJ labels are exact.
    """
    cfg = load_cfg(
        tmp_path,
        **{
            "data.split_dataset.dataset.num_frames": 32,
            "data.split_dataset.train": 24,
            "data.split_dataset.val": 4,
            "data.split_dataset.test": 4,
            "data.train_dataloader.batch_size": 4,
            "trainer.max_epochs": 40,
            "training_module.model.model_dtype": "float32",
        },
    )
    t = run_config(cfg)
    last = t._metrics_rows[-1]
    mae = float(last["val0_epoch/forces_mae"])
    # label force RMS computed from the same generator the run used
    from nequip_tpu.data.dataset import LJTestDataset

    ds = LJTestDataset(num_frames=32, seed=123456)
    forces = np.concatenate([np.asarray(f["forces"]) for f in ds.frames])
    rms = float(np.sqrt(np.mean(forces**2)))
    assert rms > 0.1  # sanity: the dataset really is the rattled-Cu one
    assert mae <= 0.15 * rms, (
        f"force MAE {mae:.4f} eV/A is {100 * mae / rms:.1f}% of the label "
        f"force RMS {rms:.4f} — the model is not fitting exact-LJ labels"
    )
