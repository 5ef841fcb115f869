"""Force-loss training on the fully-fused kernel path.

The reference trains through its fused CUDA kernels because their
torch.autograd.Function pairs are differentiable to second order
(``/root/reference/nequip/nn/_tp_scatter_oeq.py``).  The TPU analog: the
MLP-fused Pallas backward kernel carries a composition VJP
(``ops/pallas/tp_scatter.py::_make_fused_mlp``), so ``tp_impl='pallas_fused'``
trains with force losses.  This gate checks full-model reverse-over-reverse
parameter gradients against the XLA implementation at float64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.data.atomic_data_dict import batched_from_list, from_dict, pad_batch
from nequip_tpu.data.transforms.neighborlist import NeighborListTransform
from nequip_tpu.model import NequIPGNNModel


def _model(tp_impl):
    return NequIPGNNModel(
        seed=7,
        model_dtype="float64",
        type_names=["Cu", "H"],
        r_max=4.0,
        num_layers=2,
        l_max=1,
        parity=False,
        num_features=4,
        radial_mlp_width=8,
        avg_num_neighbors=12.0,
        per_type_energy_shifts={"Cu": -0.4, "H": -0.1},
        tp_impl=tp_impl,
    )


@pytest.fixture(scope="module")
def batch_and_refs():
    r = np.random.RandomState(3)
    n = 40
    pos = (r.standard_normal((n, 3)) * 2.5).astype(np.float64)
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: pos,
            _keys.ATOM_TYPE_KEY: r.randint(0, 2, n).astype(np.int64),
        }
    )
    frame = NeighborListTransform(r_max=4.0)(frame)
    # fused-kernel capacity contract: nodes % 128 == 0, edges % 256 == 0
    batch = pad_batch(batched_from_list([frame]), n_nodes=128, n_edges=1024)
    e_ref = jnp.asarray(r.standard_normal((1, 1)))
    f_ref = jnp.asarray(r.standard_normal((128, 3)))
    return batch, e_ref, f_ref


def _force_loss_grads(tp_impl, batch, e_ref, f_ref):
    model = _model(tp_impl)
    params = model.init_params()

    def loss(p):
        out = model(p, batch)
        nm = out[_keys.NODE_MASK_KEY][:, None]
        fl = jnp.sum(jnp.where(nm, out[_keys.FORCE_KEY] - f_ref, 0.0) ** 2)
        el = jnp.sum((out[_keys.TOTAL_ENERGY_KEY][:1] - e_ref) ** 2)
        return fl + el

    return loss(params), jax.grad(loss)(params), params


def test_pallas_fused_force_training_grads_match_xla(batch_and_refs):
    batch, e_ref, f_ref = batch_and_refs
    l_x, g_x, p_x = _force_loss_grads("xla", batch, e_ref, f_ref)
    l_f, g_f, p_f = _force_loss_grads("pallas_fused", batch, e_ref, f_ref)

    # identical seeds -> identical params; grads must agree to f64 tolerance
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        p_x,
        p_f,
    )
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-10)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_f)
    )
    assert len(flat_x) > 0
    for k, v in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_f[jax.tree_util.keystr(k)]),
            np.asarray(v),
            rtol=1e-7,
            atol=1e-9,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_train_step_accepts_pallas_fused(batch_and_refs):
    """make_train_step no longer rejects the fully-fused impl; one step runs
    and produces finite loss/param updates."""
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss

    batch, e_ref, f_ref = batch_and_refs
    data = dict(batch)
    data[_keys.TOTAL_ENERGY_KEY] = jnp.tile(e_ref, (2, 1))
    data[_keys.FORCE_KEY] = f_ref

    module = EMATrainModule(
        model=_model("pallas_fused"),
        loss=EnergyForceLoss(type_names=["Cu", "H"]),
        optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
    )
    state = module.init_state()
    step = module.make_train_step()
    state, logs = step(state, data, module.loss.coeff_vector())
    assert np.isfinite(float(logs["train_loss_step/weighted_sum"]))


def test_fr_force_grad_mode_exact():
    """force_grad_mode='fr' (reverse-over-forward surrogate,
    training_module._make_train_step_fr + ForceStressOutput.loss_surrogate)
    must produce the same updates as the default reverse-over-reverse step,
    for both an XLA and a pallas_fused first pass.  fr exists because rr
    train temp scales ~5.3 GiB/layer at 23k atoms regardless of remat
    policy (the loss backward saves the force-VJP residuals); the surrogate
    collapses the force term to a jvp of the energy graph."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss

    res = {}
    for mode, impl in [("rr", "xla"), ("fr", "xla"), ("fr", "pallas_fused")]:
        model, params, data = _example_model_and_batch(
            model_dtype="float64", n_atoms=64, l_max=1, tp_impl=impl
        )
        rng = np.random.RandomState(2)
        data = dict(data)
        data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(rng.standard_normal((2, 1)))
        data[_keys.FORCE_KEY] = jnp.asarray(
            rng.standard_normal(data[_keys.POSITIONS_KEY].shape)
        )
        module = EMATrainModule(
            model=model,
            loss=EnergyForceLoss(type_names=["Cu"]),
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
            force_grad_mode=mode,
        )
        state = module.init_state()
        step = jax.jit(module.make_train_step())
        state2, logs = step(state, data, module.loss.coeff_vector())
        res[(mode, impl)] = (
            float(logs["train_loss_step/weighted_sum"]),
            np.concatenate(
                [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(state2.params)]
            ),
        )
    ref = res[("rr", "xla")]
    for k, v in res.items():
        assert abs(v[0] - ref[0]) < 1e-12, (k, v[0], ref[0])
        np.testing.assert_allclose(v[1], ref[1], rtol=1e-10, atol=1e-13, err_msg=str(k))


def test_module_jvp_sweep_matches_jax_jvp(monkeypatch):
    """GraphModule.jvp dual sweep == jax.jvp on the pure-XLA impl (l_max=2,
    positions + cell tangents).  Pins the hand-written InteractionBlock
    trilinearity rule against autodiff.  ops.Linear's custom VJP blocks
    forward-mode, so the jax.jvp REFERENCE runs with it disabled (the
    dual-sweep side exercises the shipped custom-VJP path)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import nequip_tpu.ops.linear as linear_mod
    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys

    model, params, data = _example_model_and_batch(
        model_dtype="float64", n_atoms=64, l_max=2, tp_impl="xla"
    )
    func = model.model.func
    inputs = {k: data[k] for k in model.input_fields if k in data}
    rng = np.random.RandomState(3)
    t_pos = jnp.asarray(rng.standard_normal(inputs[_keys.POSITIONS_KEY].shape))
    t_cell = jnp.asarray(
        rng.standard_normal(np.asarray(inputs[_keys.CELL_KEY]).shape)
    )
    _, tout_s = func.jvp(
        params, inputs, {_keys.POSITIONS_KEY: t_pos, _keys.CELL_KEY: t_cell}
    )

    def f(p, c):
        d = dict(inputs)
        d[_keys.POSITIONS_KEY] = p
        d[_keys.CELL_KEY] = c
        return func(params, d)

    monkeypatch.setattr(linear_mod, "CUSTOM_VJP", False)
    _, tout_j = jax.jvp(
        f, (inputs[_keys.POSITIONS_KEY], inputs[_keys.CELL_KEY]), (t_pos, t_cell)
    )
    for k in (_keys.TOTAL_ENERGY_KEY, _keys.PER_ATOM_ENERGY_KEY):
        np.testing.assert_allclose(
            np.asarray(tout_s[k]), np.asarray(tout_j[k]), rtol=1e-11, atol=1e-12
        )


def test_fr_stress_loss_exact():
    """fr == rr under an energy+force+STRESS loss (exercises the strain
    tangent construction in loss_surrogate), pallas_fused kernels."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_model_and_batch
    from nequip_tpu.data import _keys
    from nequip_tpu.train import EMATrainModule
    from nequip_tpu.train.metrics_manager import EnergyForceStressLoss

    res = {}
    for mode in ("rr", "fr"):
        model, params, data = _example_model_and_batch(
            model_dtype="float64", n_atoms=64, l_max=2, tp_impl="pallas_fused"
        )
        rng = np.random.RandomState(2)
        data = dict(data)
        data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(rng.standard_normal((2, 1)))
        data[_keys.FORCE_KEY] = jnp.asarray(
            rng.standard_normal(data[_keys.POSITIONS_KEY].shape)
        )
        data[_keys.STRESS_KEY] = jnp.asarray(rng.standard_normal((2, 3, 3)))
        module = EMATrainModule(
            model=model,
            loss=EnergyForceStressLoss(type_names=["Cu"]),
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
            force_grad_mode=mode,
        )
        state = module.init_state()
        step = jax.jit(module.make_train_step())
        s2, logs = step(state, data, module.loss.coeff_vector())
        res[mode] = (
            float(logs["train_loss_step/weighted_sum"]),
            np.concatenate(
                [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(s2.params)]
            ),
        )
    assert abs(res["fr"][0] - res["rr"][0]) < 1e-12
    np.testing.assert_allclose(res["fr"][1], res["rr"][1], rtol=1e-9, atol=1e-12)
