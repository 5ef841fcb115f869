"""Tests for Muon / ScheduleFree / ConFIG training components and samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nequip_tpu.train import muon, muon_adam, zeropower_via_newtonschulz5


def test_newtonschulz_orthogonalizes():
    r = np.random.RandomState(0)
    G = jnp.asarray(r.standard_normal((64, 32)), dtype=jnp.float32)
    O = np.asarray(zeropower_via_newtonschulz5(G, steps=10))
    # Muon's quintic iteration is intentionally loose: singular values land
    # in roughly (0.5, 1.5) rather than exactly 1 (cf. the public Muon notes)
    sv = np.linalg.svd(O, compute_uv=False)
    assert sv.max() < 1.6 and sv.min() > 0.4, (sv.min(), sv.max())
    # the raw gradient's singular values were nothing like that
    sv_g = np.linalg.svd(np.asarray(G), compute_uv=False)
    assert sv_g.max() / sv_g.min() > 3


def test_muon_adam_split_and_descent():
    r = np.random.RandomState(1)
    params = {
        "w2d": jnp.asarray(r.standard_normal((16, 8))),
        "bias": jnp.asarray(r.standard_normal((8,))),
    }
    target = jax.tree.map(jnp.zeros_like, params)
    opt = muon_adam(muon_lr=0.05, adam_lr=0.05)
    state = opt.init(params)

    def loss(p):
        return sum(jnp.sum((a - b) ** 2) for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(target)))

    l0 = float(loss(params))
    for _ in range(20):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < l0


def _tiny_module(module_cls, **kwargs):
    from nequip_tpu.model import NequIPGNNModel
    from nequip_tpu.train import EnergyForceLoss

    model = NequIPGNNModel(
        seed=5,
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
    return module_cls(
        model=model,
        loss=EnergyForceLoss(type_names=["Cu"]),
        optimizer={"_target_": "optax.adam", "learning_rate": 0.01},
        **kwargs,
    )


@pytest.fixture(scope="module")
def batch():
    from nequip_tpu.data import compute_neighborlist_, batched_from_list, pad_batch, to_device
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data.transforms import ChemicalSpeciesToAtomTypeMapper

    ds = LJTestDataset(
        num_frames=2, seed=3, transforms=[ChemicalSpeciesToAtomTypeMapper(["Cu"])]
    )
    frames = [compute_neighborlist_(ds[i], 4.0) for i in range(2)]
    return to_device(pad_batch(batched_from_list(frames), 128, 2048, 3))


def test_config_module_step(batch):
    from nequip_tpu.train import ConFIGTrainModule

    module = _tiny_module(ConFIGTrainModule, lsqr=False, gradient_clip_val=10.0)
    state = module.init_state()
    step = jax.jit(module.make_train_step())
    new_state, logs = step(state, batch, module.loss.coeff_vector())
    assert np.isfinite(float(logs["train_loss_step/weighted_sum"]))
    # some (trainable) params changed; frozen ones (bessel weights) must not
    changed = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params))
    ]
    assert any(changed)
    # several steps reduce the loss
    losses = []
    for _ in range(5):
        new_state, logs = step(new_state, batch, module.loss.coeff_vector())
        losses.append(float(logs["train_loss_step/weighted_sum"]))
    assert losses[-1] < losses[0]


def test_schedulefree_module_step(batch):
    from nequip_tpu.train import ScheduleFreeTrainModule

    module = _tiny_module(ScheduleFreeTrainModule, warmup_steps=2)
    state = module.init_state()
    step = jax.jit(module.make_train_step())
    for _ in range(3):
        state, logs = step(state, batch, module.loss.coeff_vector())
    assert np.isfinite(float(logs["train_loss_step/weighted_sum"]))
    eval_params = module.evaluation_params(state)
    # eval params differ from the z iterate params
    assert len(jax.tree.leaves(eval_params)) == len(jax.tree.leaves(state.params))


def test_partial_sampler():
    from nequip_tpu.data import PartialSampler

    s = PartialSampler(data_source_len=10, num_samples_per_epoch=4, seed=1)
    seen = []
    for _ in range(5):
        idx = list(s)
        assert len(idx) == 4
        seen.extend(idx)
        s.step_epoch()
    # after 5 partial epochs (20 draws over 10 items) every item appears
    assert set(seen) == set(range(10))
    # deterministic restart
    s2 = PartialSampler(10, 4, seed=1)
    s2.load_state_dict({"epoch": 2})
    s3 = PartialSampler(10, 4, seed=1)
    s3.step_epoch(), s3.step_epoch()
    assert list(s2) == list(s3)


def test_equivariance_harness(batch):
    from nequip_tpu.utils.test_utils import assert_O3_equivariant, assert_permutation_equivariant
    from nequip_tpu.data import _keys, compute_neighborlist_
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data.transforms import ChemicalSpeciesToAtomTypeMapper

    module = _tiny_module(__import__("nequip_tpu.train", fromlist=["NequIPTrainModule"]).NequIPTrainModule)
    params = module.model.init_params()
    ds = LJTestDataset(
        num_frames=1, seed=4, transforms=[ChemicalSpeciesToAtomTypeMapper(["Cu"])]
    )
    frame = compute_neighborlist_(ds[0], 4.0)
    assert_O3_equivariant(module.model, params, frame, tol=1e-8)
    assert_permutation_equivariant(module.model, params, frame, tol=1e-9)


def test_remat_force_grads_exact(batch):
    """remat_force (jax.checkpoint around the whole E+F branch,
    grad_output.py) must not change training gradients.  Needed because
    per-layer remat cannot bound train-step temp memory: the force-loss
    backward differentiates through the force VJP and saves its residuals
    regardless of the per-layer policy (measured 14-15 GiB at 23k f32 for
    every policy); checkpointing the branch itself is the policy that does
    bound it, so its exactness is a correctness gate."""
    from nequip_tpu.data import _keys
    from nequip_tpu.model import NequIPGNNModel
    from nequip_tpu.train import EnergyForceLoss

    def build(remat_force, remat_conv=False):
        return NequIPGNNModel(
            seed=5,
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
            remat_conv=remat_conv,
            remat_force=remat_force,
        )

    loss = EnergyForceLoss(type_names=["Cu"])
    rng = np.random.RandomState(7)
    data = dict(batch)
    n_frames = data[_keys.NUM_NODES_KEY].shape[0]
    data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(
        rng.standard_normal((n_frames, 1))
    )
    data[_keys.FORCE_KEY] = jnp.asarray(
        rng.standard_normal(data[_keys.POSITIONS_KEY].shape)
    )

    grads = {}
    for name, (rf, rc) in {
        "plain": (False, False),
        "force": (True, "save_tp"),
        "force_full": (True, True),
    }.items():
        model = build(rf, rc)
        params = model.init_params()
        g = jax.jit(
            jax.grad(lambda p: loss(model(p, data), data, loss.coeff_vector())[0])
        )(params)
        grads[name] = np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(g)]
        )
    np.testing.assert_allclose(grads["force"], grads["plain"], rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        grads["force_full"], grads["plain"], rtol=1e-12, atol=1e-14
    )
