"""Spatial-decomposition gates: sharded-graph evaluation over an 8-device
mesh must match single-device results to machine precision (the analog of
the reference's ghost-exchange correctness contract, SURVEY §2.9)."""

import numpy as np
import jax
import pytest

from nequip_tpu.data import (
    _keys,
    batched_from_list,
    compute_neighborlist_,
    from_dict,
    pad_batch,
    to_device,
)
from nequip_tpu.data.dataset import LJTestDataset
from nequip_tpu.model import NequIPGNNModel
from nequip_tpu.parallel import make_mesh
from nequip_tpu.parallel.ghost import ShardedGraphEvaluator, spatial_partition


@pytest.fixture(scope="module")
def setup():
    model = NequIPGNNModel(
        seed=0,
        model_dtype="float64",
        type_names=["Cu"],
        r_max=4.0,
        num_layers=2,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=18.0,
        per_type_energy_shifts={"Cu": -0.4},
    )
    params = model.init_params()
    ds = LJTestDataset(supercell=(4, 2, 2), num_frames=1, seed=12)
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
            _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOM_TYPE_KEY: np.zeros(64, dtype=int),
        }
    )
    return model, params, frame


def test_partition_covers_all_atoms(setup):
    _, _, frame = setup
    parts = spatial_partition(frame, 8, 4.0)
    total_local = int(parts["local_mask"].sum())
    assert total_local == 64
    # every edge lands on exactly one device
    assert int(parts["edge_mask"].sum()) == frame[_keys.EDGE_INDEX_KEY].shape[1] if _keys.EDGE_INDEX_KEY in frame else True


def test_sharded_matches_single_device(setup):
    model, params, frame = setup
    ref_frame = compute_neighborlist_(dict(frame), 4.0)
    data = to_device(pad_batch(batched_from_list([ref_frame]), 128, 4096, 2))
    out = jax.jit(lambda p, d: model(p, d))(params, data)
    e_ref = float(out[_keys.TOTAL_ENERGY_KEY][0, 0])
    f_ref = np.asarray(out[_keys.FORCE_KEY])[:64]

    mesh = make_mesh((8,), ("graph",))
    ev = ShardedGraphEvaluator(model, params, mesh=mesh, axis_name="graph")
    e_sh, f_sh = ev.evaluate(frame)

    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-12)
    np.testing.assert_allclose(f_sh, f_ref, atol=1e-12)


def test_sharded_training_grads_match_single_device(setup):
    """Sharded-graph TRAINING: exact global loss + param grads vs one device."""
    import jax.numpy as jnp

    model, params, frame = setup
    n = 64
    ce, cf = 1.0, 0.7

    # synthetic targets
    r = np.random.RandomState(5)
    e_ref = -20.0
    f_ref = r.standard_normal((n, 3))

    # --- single-device reference loss/grads -----------------------------
    # (an earlier test's evaluator swapped in MeshGhostExchange; restore)
    from nequip_tpu.parallel.ghost import disable_MeshGhostExchange

    disable_MeshGhostExchange(model)
    ref_frame = compute_neighborlist_(dict(frame), 4.0)
    data = to_device(pad_batch(batched_from_list([ref_frame]), 128, 4096, 2))
    mask = np.asarray(data[_keys.NODE_MASK_KEY])
    f_ref_pad = np.zeros((mask.shape[0], 3))
    f_ref_pad[: n] = f_ref

    def loss_single(p):
        out = model(p, data)
        e = out[_keys.TOTAL_ENERGY_KEY][0, 0]
        de = (e - e_ref) / n
        fe = jnp.where(jnp.asarray(mask)[:, None], out[_keys.FORCE_KEY] - f_ref_pad, 0.0)
        return ce * de**2 + cf * jnp.sum(fe * fe) / (3.0 * n)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_single))(params)

    # --- sharded over 8 virtual devices ---------------------------------
    from nequip_tpu.parallel.ghost import ShardedGraphEvaluator

    mesh = make_mesh((8,), ("graph",))
    ev = ShardedGraphEvaluator(model, params, mesh=mesh, axis_name="graph")
    l_sh, g_sh = ev.loss_and_grad(
        frame, e_ref, f_ref, energy_coeff=ce, force_coeff=cf
    )

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11, rtol=1e-9)

    # --- a few optimizer steps reduce the sharded loss -------------------
    import optax

    opt = optax.adam(3e-3)
    p = params
    ost = opt.init(p)
    losses = [float(l_sh)]
    g = g_sh
    for _ in range(3):
        upd, ost = opt.update(g, ost, p)
        p = optax.apply_updates(p, upd)
        ev.params = p
        l, g = ev.loss_and_grad(frame, e_ref, f_ref, energy_coeff=ce, force_coeff=cf)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_sharded_training_grads_fr_matches_rr(setup):
    """ShardedGraphEvaluator.loss_and_grad with force_grad_mode='fr' (dual
    sweep) == the rr evaluator's loss/grads (which themselves match single
    device) on the 8-device virtual mesh."""
    model, params, frame = setup
    n = 64
    ce, cf = 1.0, 0.7
    r = np.random.RandomState(5)
    e_ref = -20.0
    f_ref = r.standard_normal((n, 3))

    from nequip_tpu.parallel.ghost import ShardedGraphEvaluator, disable_MeshGhostExchange

    results = {}
    for fgm in ("rr", "fr"):
        disable_MeshGhostExchange(model)
        mesh = make_mesh((8,), ("graph",))
        ev = ShardedGraphEvaluator(
            model, params, mesh=mesh, axis_name="graph", force_grad_mode=fgm
        )
        l, g = ev.loss_and_grad(frame, e_ref, f_ref, energy_coeff=ce, force_coeff=cf)
        results[fgm] = (float(l), g)

    np.testing.assert_allclose(results["fr"][0], results["rr"][0], rtol=1e-12)
    for a, b in zip(jax.tree.leaves(results["fr"][1]), jax.tree.leaves(results["rr"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11, rtol=1e-9)
