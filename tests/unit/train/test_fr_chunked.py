"""Edge-chunked fr dual sweep == unchunked, to float64 tolerance.

``NEQUIP_FR_EDGE_CHUNKS=C`` scans the four jvp kernel terms over C slices of
the relaid edge stream (``ops/pallas/tp_scatter.py::chunked_jvp_conv``) so the
fr backward window's per-edge transients shrink to 1/C — the lever that fits
100k-atom f32 force training in single-chip HBM.  The gradients must be the
same mathematical object: this gate compares full surrogate parameter
gradients (reverse over the chunked sweep, incl. the boundary-tile
accumulator re-entry and the per-slice MLP reverse-over-jvp) against the
unchunked sweep at float64.  Reference analog: none (the reference scales
force-training memory by DDP over devices).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nequip_tpu.data import _keys
from nequip_tpu.data.atomic_data_dict import batched_from_list, from_dict, pad_batch
from nequip_tpu.data.transforms.neighborlist import NeighborListTransform
from nequip_tpu.model import NequIPGNNModel


@pytest.fixture(scope="module")
def model_and_batch():
    model = NequIPGNNModel(
        seed=11,
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
        tp_impl="pallas",
    )
    r = np.random.RandomState(5)
    # two 128-row node tiles so a slice boundary can split a tile's chunk run
    n = 150
    pos = (r.standard_normal((n, 3)) * 3.0).astype(np.float64)
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: pos,
            _keys.ATOM_TYPE_KEY: r.randint(0, 2, n).astype(np.int64),
        }
    )
    frame = NeighborListTransform(r_max=4.0)(frame)
    batch = pad_batch(batched_from_list([frame]), n_nodes=256, n_edges=4096)
    return model, batch


def _surrogate_grads(model, batch, n_chunks, monkeypatch):
    """Parameter grads of the fr surrogate with a fixed output cotangent."""
    from nequip_tpu.ops.pallas.tp_scatter import relayout_edge_stream

    if n_chunks:
        monkeypatch.setenv("NEQUIP_FR_EDGE_CHUNKS", str(n_chunks))
    else:
        monkeypatch.delenv("NEQUIP_FR_EDGE_CHUNKS", raising=False)

    params = model.init_params()
    fso = model.model
    inputs = {k: batch[k] for k in model.input_fields if k in batch}
    inputs = relayout_edge_stream(inputs)

    r = np.random.RandomState(7)
    v = {
        _keys.FORCE_KEY: jnp.asarray(r.standard_normal(batch[_keys.POSITIONS_KEY].shape)),
        _keys.TOTAL_ENERGY_KEY: jnp.asarray(r.standard_normal((1, 1))),
    }
    surr, grads = jax.value_and_grad(
        lambda p: fso.loss_surrogate(p, inputs, v)
    )(params)
    return surr, grads


# the padded stream here is 4608 slots = 18 chunks: C=2 and C=3 divide and
# must take the chunked path; C=5 does not and must silently fall back
@pytest.mark.parametrize("n_chunks,expect_chunked", [(2, True), (3, True), (5, False)])
def test_chunked_fr_grads_match_unchunked(
    model_and_batch, n_chunks, expect_chunked, monkeypatch
):
    from nequip_tpu.ops.pallas import tp_scatter as tps

    model, batch = model_and_batch
    s0, g0 = _surrogate_grads(model, batch, 0, monkeypatch)

    calls = []
    real = tps.chunked_jvp_conv
    monkeypatch.setattr(
        tps, "chunked_jvp_conv", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    s1, g1 = _surrogate_grads(model, batch, n_chunks, monkeypatch)
    assert bool(calls) == expect_chunked
    np.testing.assert_allclose(float(s0), float(s1), rtol=1e-12)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        ),
        g0,
        g1,
    )


def test_chunked_fr_in_train_step(model_and_batch, monkeypatch):
    """One fr train step with chunking == without, through EMATrainModule."""
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss

    model, batch = model_and_batch
    r = np.random.RandomState(2)
    data = dict(batch)
    data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(r.standard_normal((1, 1)))
    data[_keys.FORCE_KEY] = jnp.asarray(
        r.standard_normal(batch[_keys.POSITIONS_KEY].shape)
    )

    def run(n_chunks):
        if n_chunks:
            monkeypatch.setenv("NEQUIP_FR_EDGE_CHUNKS", str(n_chunks))
        else:
            monkeypatch.delenv("NEQUIP_FR_EDGE_CHUNKS", raising=False)
        module = EMATrainModule(
            model=model,
            loss=EnergyForceLoss(type_names=["Cu", "H"]),
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
            force_grad_mode="fr",
        )
        state = module.init_state()
        step = module.make_train_step()
        state, out = step(state, data, module.loss.coeff_vector())
        return state, out

    s0, o0 = run(0)
    s1, o1 = run(2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        ),
        s0.params,
        s1.params,
    )


def test_chunked_primal_forward_and_forces_match(model_and_batch, monkeypatch):
    """__call__'s chunked primal conv: E and F (first-order reverse through
    the hand-written VJP) must equal the unchunked path at f64."""
    model, batch = model_and_batch
    params = model.init_params()

    def run(n_chunks):
        if n_chunks:
            monkeypatch.setenv("NEQUIP_FR_EDGE_CHUNKS", str(n_chunks))
        else:
            monkeypatch.delenv("NEQUIP_FR_EDGE_CHUNKS", raising=False)
        out = model(params, batch)
        return out[_keys.TOTAL_ENERGY_KEY], out[_keys.FORCE_KEY]

    e0, f0 = run(0)
    e1, f1 = run(2)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-9, atol=1e-12)


def test_fr_edge_chunks_config_field(model_and_batch, monkeypatch):
    """fr_edge_chunks as a TrainModule config field == the env knob."""
    from nequip_tpu.ops.pallas import tp_scatter as tps
    from nequip_tpu.train import EMATrainModule, EnergyForceLoss

    monkeypatch.delenv("NEQUIP_FR_EDGE_CHUNKS", raising=False)
    model, batch = model_and_batch
    r = np.random.RandomState(2)
    data = dict(batch)
    data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(r.standard_normal((1, 1)))
    data[_keys.FORCE_KEY] = jnp.asarray(
        r.standard_normal(batch[_keys.POSITIONS_KEY].shape)
    )
    calls = []
    real = tps.chunked_jvp_conv
    monkeypatch.setattr(
        tps, "chunked_jvp_conv", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    module = EMATrainModule(
        model=model,
        loss=EnergyForceLoss(type_names=["Cu", "H"]),
        optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
        force_grad_mode="fr",
        fr_edge_chunks=2,
    )
    state = module.init_state()
    step = module.make_train_step()
    state, _ = step(state, data, module.loss.coeff_vector())
    assert calls, "config field did not activate the chunked sweep"
    assert module.hyperparameters()["fr_edge_chunks"] == 2

    with pytest.raises(AssertionError):
        EMATrainModule(
            model=model,
            loss=EnergyForceLoss(type_names=["Cu", "H"]),
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
            force_grad_mode="rr",
            fr_edge_chunks=2,
        )
