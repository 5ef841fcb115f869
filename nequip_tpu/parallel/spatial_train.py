"""2-D-mesh training: data-parallel x spatially-sharded (dp x graph).

The scaling path for datasets of HUGE frames (each too large for one chip):
a 2-D ``Mesh((n_dp, n_graph), ("dp", "graph"))`` processes ``n_dp`` frames
per step, each slab-partitioned over ``n_graph`` devices with in-graph ghost
exchange (``parallel/ghost.py``).  Gradients are exact: each device
differentiates only local quantities (the collective VJPs route cross-device
force contributions), and one psum over BOTH mesh axes yields the global
loss gradient — the SPMD generalization of the reference's
LAMMPS-spatial-decomposition + DDP combination (SURVEY §2.9).

``SpatialTrainModule`` plugs into the normal ``Trainer`` loop: it exposes the
standard ``make_train_step``/``make_eval_step`` contract, accumulates the
same Welford loss/metric sums (so epoch metrics, checkpoints, callbacks, and
LR scheduling all work unchanged), and ``SpatialFrameDataModule`` +
``SpatialFrameLoader`` feed it sharded frame batches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..data import _keys, round_up
from ..train.training_module import EMATrainModule, NequIPTrainModule
from .ghost import (
    GHOST_OWNER_DEV_KEY,
    GHOST_OWNER_IDX_KEY,
    enable_MeshGhostExchange,
    spatial_partition,
)

_ARR_KEYS = (
    "local_pos", "local_types", "local_mask", "ghost_owner_dev",
    "ghost_owner_idx", "ghost_shift", "ghost_mask", "ghost_types",
    "edge_index", "edge_mask",
)


def make_2d_mesh(n_dp: int, n_graph: int) -> Mesh:
    return jax.make_mesh((n_dp, n_graph), ("dp", "graph"))


def prepare_spatial_batch(
    frames: Sequence[dict],
    mesh: Mesh,
    r_max: float,
    caps: Optional[Dict[str, int]] = None,
    dp_axis: str = "dp",
    graph_axis: str = "graph",
    dtype=None,
):
    """Partition ``n_dp`` labeled frames over the 2-D mesh.

    Returns a sharded batch pytree:
      arrays (n_dp, n_graph, ...) with spec P(dp, graph);
      e_ref (n_dp,) P(dp); n_atoms (n_dp,) P(dp);
      f_ref (n_dp, n_graph, L, 3) P(dp, graph).
    """
    from ..utils.global_state import global_dtype

    dt = dtype or global_dtype()
    n_dp = mesh.shape[dp_axis]
    n_graph = mesh.shape[graph_axis]
    assert len(frames) == n_dp, f"need {n_dp} frames per step, got {len(frames)}"

    parts = [spatial_partition(dict(f), n_graph, r_max) for f in frames]
    if caps is None:
        caps = {
            k: max(p["caps"][k] for p in parts) for k in ("L", "G", "E")
        }
    if any(p["caps"] != caps for p in parts):
        # re-partition under the shared capacities (ghost slot indices inside
        # edge_index depend on L, so arrays cannot simply be re-padded)
        parts = [
            spatial_partition(dict(f), n_graph, r_max, caps=caps) for f in frames
        ]

    L = caps["L"]
    stacked = {
        k: np.stack([p[k] for p in parts]) for k in _ARR_KEYS if k in parts[0]
    }
    # label extraction
    e_ref = np.array(
        [float(np.asarray(f[_keys.TOTAL_ENERGY_KEY]).reshape(-1)[0]) for f in frames]
    )
    n_atoms = np.array(
        [int(np.asarray(f[_keys.POSITIONS_KEY]).shape[0]) for f in frames],
        dtype=np.int32,
    )
    f_ref = np.zeros((n_dp, n_graph, L, 3))
    for i, (f, p) in enumerate(zip(frames, parts)):
        fr = np.asarray(f[_keys.FORCE_KEY], dtype=np.float64)
        for d in range(n_graph):
            m = p["local_mask"][d]
            f_ref[i, d][m] = fr[p["local_index_global"][d][m]]

    float_keys = {"local_pos", "ghost_shift"}
    batch = {
        "arrays": {
            k: jax.device_put(
                jnp.asarray(v, dt if k in float_keys else None),
                NamedSharding(mesh, P(dp_axis, graph_axis)),
            )
            for k, v in stacked.items()
        },
        "e_ref": jax.device_put(
            jnp.asarray(e_ref, dt), NamedSharding(mesh, P(dp_axis))
        ),
        "n_atoms": jax.device_put(
            jnp.asarray(n_atoms), NamedSharding(mesh, P(dp_axis))
        ),
        "f_ref": jax.device_put(
            jnp.asarray(f_ref, dt), NamedSharding(mesh, P(dp_axis, graph_axis))
        ),
    }
    return batch, caps


class SpatialTrainModule(NequIPTrainModule):
    """Train on a 2-D (dp x graph) mesh through the standard Trainer loop.

    Loss semantics are IDENTICAL to the single-device
    ``EnergyForceLoss(per_atom_energy=True)`` manager over the same frames
    (same normalized coefficients, same Welford epoch sums), so losses and
    metrics are directly comparable with ordinary training.
    """

    def __init__(self, *args, mesh: Optional[Mesh] = None, dp_axis: str = "dp",
                 graph_axis: str = "graph", **kwargs):
        super().__init__(*args, **kwargs)
        if mesh is None:
            n = jax.device_count()
            mesh = make_2d_mesh(max(1, n // 2), 2 if n >= 2 else 1)
        self.mesh = mesh
        self.dp_axis = dp_axis
        self.graph_axis = graph_axis
        self._ghost_caps = None
        self._check_entries(self.loss, is_loss=True)
        self._check_entries(self.val_metrics, is_loss=False)

    @staticmethod
    def _check_entries(mgr, is_loss: bool):
        if mgr is None:
            return
        for e in mgr.entries:
            assert not e["per_type"], "per_type entries unsupported on the 2-D mesh"
            field = e["mod"].field
            assert field in (_keys.TOTAL_ENERGY_KEY, _keys.FORCE_KEY), (
                f"2-D mesh training supports energy+forces entries, got {field}"
            )
            if is_loss and e["coeff"]:
                assert e["metric"] == "mse", (
                    "2-D mesh loss gradients are implemented for MSE entries"
                )

    # -- ghost exchange management ---------------------------------------
    def _ensure_ghosts(self, caps: Dict[str, int]):
        if caps != self._ghost_caps:
            enable_MeshGhostExchange(self.model, self.graph_axis, caps["L"])
            self._ghost_caps = dict(caps)

    # -- per-device computation -------------------------------------------
    def _device_sums(self, params, a, e_ref, n_atoms_f, f_ref_loc, caps,
                     mgr, with_grads, coeffs=None):
        """Per-device masked error sums (and surrogate grads when training)."""
        gax, dax = self.graph_axis, self.dp_axis
        energy_net = self.model.model.func
        L, G = caps["L"], caps["G"]
        n_dp = self.mesh.shape[dax]
        local_mask = a["local_mask"]
        gmask = a["ghost_mask"]

        def pos_full_of(pos_local):
            all_pos = jax.lax.all_gather(pos_local, gax)
            ghost_pos = all_pos[a["ghost_owner_dev"], a["ghost_owner_idx"]] + a[
                "ghost_shift"
            ].astype(pos_local.dtype)
            return jnp.concatenate([pos_local, ghost_pos], axis=0)

        def build_data(pos_full):
            types_full = jnp.concatenate([a["local_types"], a["ghost_types"]])
            return {
                _keys.POSITIONS_KEY: pos_full,
                _keys.ATOM_TYPE_KEY: types_full,
                _keys.EDGE_INDEX_KEY: a["edge_index"],
                _keys.EDGE_MASK_KEY: a["edge_mask"],
                _keys.NODE_MASK_KEY: jnp.concatenate([local_mask, gmask]),
                _keys.BATCH_KEY: jnp.zeros(L + G, dtype=jnp.int32),
                _keys.NUM_NODES_KEY: jnp.array([L + G], dtype=jnp.int32),
                _keys.FRAME_MASK_KEY: jnp.ones(1, dtype=bool),
                GHOST_OWNER_DEV_KEY: a["ghost_owner_dev"],
                GHOST_OWNER_IDX_KEY: a["ghost_owner_idx"],
                "ghost_mask": gmask,
            }

        def local_e_sum(out):
            e_atom = out[_keys.PER_ATOM_ENERGY_KEY][:L].reshape(-1)
            return jnp.sum(jnp.where(local_mask, e_atom, 0.0))

        def energy_of(pos_local, p):
            return local_e_sum(energy_net(p, build_data(pos_full_of(pos_local))))

        n_tot = jax.lax.psum(jnp.sum(local_mask), (dax, gax))

        def sums_of(e_local, forces):
            e_total = jax.lax.psum(e_local, gax)
            de_raw = e_total - e_ref
            de_pa = de_raw / n_atoms_f
            fe = jnp.where(local_mask[:, None], forces - f_ref_loc, 0.0)
            # per-frame energy sums are replicated across the row: divide by
            # n_graph so the psum over BOTH axes counts each frame once
            ngr = self.mesh.shape[gax]

            def energy_sums(de):
                return {
                    "abs": jnp.abs(de) / ngr,
                    "sq": de**2 / ngr,
                    "count": jnp.asarray(1.0 / ngr, de.dtype),
                    "max": jax.lax.stop_gradient(jnp.abs(de)),
                }

            force_sums = {
                "abs": jnp.sum(jnp.abs(fe)),
                "sq": jnp.sum(fe * fe),
                "count": 3.0 * jnp.sum(local_mask).astype(fe.dtype),
                "max": jax.lax.stop_gradient(jnp.max(jnp.abs(fe))),
            }
            # mae/mse/rmse of a field share the same accumulators: emit the
            # field's sums under every entry name of the manager
            bs = {}
            for e in mgr.entries:
                if e["mod"].field == _keys.TOTAL_ENERGY_KEY:
                    bs[e["name"]] = energy_sums(
                        de_pa if "per_atom" in e["name"] else de_raw
                    )
                else:
                    bs[e["name"]] = force_sums
            return bs, (de_raw, de_pa), jnp.sum(fe * fe)

        def psum_bs(bs):
            out = {}
            for name, s in bs.items():
                out[name] = {
                    "abs": jax.lax.psum(s["abs"], (dax, gax)),
                    "sq": jax.lax.psum(s["sq"], (dax, gax)),
                    "count": jax.lax.psum(s["count"], (dax, gax)),
                    "max": jax.lax.pmax(s["max"], (dax, gax)),
                }
            return out

        if not with_grads:
            e_local, neg_f = jax.value_and_grad(energy_of, argnums=0)(
                a["local_pos"], params
            )
            bs, _, _ = sums_of(e_local, -neg_f)
            return psum_bs(bs)

        # total loss coefficients on the (mse) terms, split by entry kind
        zero = jnp.zeros((), coeffs.dtype)
        c_pa, c_raw, c_f = zero, zero, zero
        for i, e in enumerate(mgr.entries):
            if e["mod"].field == _keys.TOTAL_ENERGY_KEY:
                if "per_atom" in e["name"]:
                    c_pa = c_pa + coeffs[i]
                else:
                    c_raw = c_raw + coeffs[i]
            else:
                c_f = c_f + coeffs[i]

        if self.force_grad_mode == "fr":
            # fr (reverse-over-forward, see training_module / design.md §8):
            # pass 1 computes forces + all sums first-order; the force term's
            # gradient becomes -grad_p of a directional derivative of the
            # energy graph, evaluated by the module dual sweep with the
            # GLOBAL tangent (the local cotangent v plus every other
            # device's v entering through the ghosts — exactly the
            # cross-device force coupling).  The reverse pass is then
            # first-order, so per-layer remat bounds memory on the mesh too.
            e0, neg_f0 = jax.value_and_grad(energy_of, argnums=0)(
                a["local_pos"], params
            )
            bs0, (de_raw0, de_pa0), _ = sums_of(e0, -neg_f0)
            fe0 = jnp.where(local_mask[:, None], -neg_f0 - f_ref_loc, 0.0)
            dt = fe0.dtype
            v = jax.lax.stop_gradient(
                (2.0 * c_f.astype(dt) / (3.0 * n_tot.astype(dt))) * fe0
            )
            de_raw0 = jax.lax.stop_gradient(de_raw0)
            de_pa0 = jax.lax.stop_gradient(de_pa0)
            nf = n_atoms_f.astype(dt)

            def surrogate_fr(p):
                t_full = jnp.concatenate(
                    [
                        v,
                        jax.lax.all_gather(v, gax)[
                            a["ghost_owner_dev"], a["ghost_owner_idx"]
                        ],
                    ],
                    axis=0,
                )
                data = build_data(pos_full_of(a["local_pos"]))
                out, tout = energy_net.jvp(
                    p, data, {_keys.POSITIONS_KEY: t_full}
                )
                e_local = local_e_sum(out)
                t_atom = tout[_keys.PER_ATOM_ENERGY_KEY][:L].reshape(-1)
                d_e = jnp.sum(jnp.where(local_mask, t_atom, 0.0))
                # <v, F> = -jvp_pos(sum E; v); energy terms as in rr below
                return (
                    (
                        c_pa.astype(dt) * 2.0 * de_pa0 / nf
                        + c_raw.astype(dt) * 2.0 * de_raw0
                    )
                    / n_dp
                    * e_local
                    - d_e
                )

            g = jax.grad(surrogate_fr)(params)
            g = jax.lax.psum(g, (dax, gax))
            return psum_bs(bs0), g

        def surrogate(p):
            e_local, neg_f = jax.value_and_grad(energy_of, argnums=0)(
                a["local_pos"], p
            )
            bs, (de_raw, de_pa), sse_local = sums_of(e_local, -neg_f)
            # exact local gradient contributions of the GLOBAL loss
            #   loss = c_pa * sum_f de_pa^2 / n_dp + c_raw * sum_f de_raw^2 / n_dp
            #        + c_f * sum sse / (3 N_tot)
            nf = n_atoms_f.astype(e_local.dtype)
            sur = (
                (
                    c_pa.astype(e_local.dtype)
                    * 2.0
                    * jax.lax.stop_gradient(de_pa)
                    / nf
                    + c_raw.astype(e_local.dtype)
                    * 2.0
                    * jax.lax.stop_gradient(de_raw)
                )
                / n_dp
                * e_local
                + c_f.astype(e_local.dtype)
                * sse_local
                / (3.0 * n_tot.astype(e_local.dtype))
            )
            return sur, bs

        (_, bs), g = jax.value_and_grad(surrogate, has_aux=True)(params)
        g = jax.lax.psum(g, (dax, gax))
        return psum_bs(bs), g

    # -- steps -------------------------------------------------------------
    def make_train_step(self, axis_name: Optional[str] = None):
        assert self.loss is not None
        mesh, dax, gax = self.mesh, self.dp_axis, self.graph_axis
        loss_mgr = self.loss

        def wrapped(state, batch, loss_coeffs, lr_scale=None):
            caps = {
                "L": batch["arrays"]["local_pos"].shape[2],
                "G": batch["arrays"]["ghost_mask"].shape[2],
                "E": batch["arrays"]["edge_mask"].shape[2],
            }
            self._ensure_ghosts(caps)
            arr_specs = {k: P(dax, gax) for k in batch["arrays"]}
            in_specs = (
                P(),
                {
                    "arrays": arr_specs,
                    "e_ref": P(dax),
                    "n_atoms": P(dax),
                    "f_ref": P(dax, gax),
                },
                P(),
            )

            def device_fn(params, b, coeffs):
                a = {k: v[0, 0] for k, v in b["arrays"].items()}
                bs, g = self._device_sums(
                    params,
                    a,
                    b["e_ref"][0],
                    b["n_atoms"][0],
                    b["f_ref"][0, 0],
                    caps,
                    loss_mgr,
                    with_grads=True,
                    coeffs=coeffs,
                )
                return bs, g

            smapped = _shard_map(
                device_fn,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(), P()),
                check_vma=False,
            )
            bs, grads = smapped(state.params, batch, loss_coeffs)
            loss, values = loss_mgr.values(bs, coeffs_vec=loss_coeffs)

            if isinstance(self.optimizer, optax.GradientTransformationExtraArgs):
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params, value=loss
                )
            else:
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params
                )
            if lr_scale is not None:
                updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                loss_state=(
                    loss_mgr.accumulate(state.loss_state, bs)
                    if state.loss_state is not None
                    else None
                ),
            )
            new_state = self._post_optimizer_step(new_state)
            logs = {f"train_loss_step/{k}": v for k, v in values.items()}
            logs["train_loss_step/weighted_sum"] = loss
            return new_state, logs

        return wrapped

    def make_eval_step(self, metrics=None):
        mgr = metrics or self.val_metrics
        self._check_entries(mgr, is_loss=False)
        mesh, dax, gax = self.mesh, self.dp_axis, self.graph_axis

        def wrapped(params, metrics_state, batch):
            caps = {
                "L": batch["arrays"]["local_pos"].shape[2],
                "G": batch["arrays"]["ghost_mask"].shape[2],
                "E": batch["arrays"]["edge_mask"].shape[2],
            }
            self._ensure_ghosts(caps)
            arr_specs = {k: P(dax, gax) for k in batch["arrays"]}
            in_specs = (
                P(),
                {
                    "arrays": arr_specs,
                    "e_ref": P(dax),
                    "n_atoms": P(dax),
                    "f_ref": P(dax, gax),
                },
            )

            def device_fn(params, b):
                a = {k: v[0, 0] for k, v in b["arrays"].items()}
                return self._device_sums(
                    params,
                    a,
                    b["e_ref"][0],
                    b["n_atoms"][0],
                    b["f_ref"][0, 0],
                    caps,
                    mgr,
                    with_grads=False,
                )

            smapped = _shard_map(
                device_fn,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=P(),
                check_vma=False,
            )
            bs = smapped(params, batch)
            return mgr.accumulate(metrics_state, bs), None

        return wrapped


class EMASpatialTrainModule(SpatialTrainModule, EMATrainModule):
    """2-D-mesh training with EMA evaluation weights."""


# ---------------------------------------------------------------------------
# data plumbing: frames -> sharded spatial batches through the Trainer loop
# ---------------------------------------------------------------------------
class SpatialFrameLoader:
    """Yields sharded 2-D-mesh batches of ``n_dp`` labeled frames.

    Frames must carry total_energy and forces labels; capacities are scanned
    once so every batch shares one jit signature.
    """

    def __init__(
        self,
        dataset,
        mesh: Mesh,
        r_max: float,
        shuffle: bool = False,
        seed: int = 0,
        dp_axis: str = "dp",
        graph_axis: str = "graph",
    ):
        self.dataset = dataset
        self.mesh = mesh
        self.r_max = float(r_max)
        self.shuffle = shuffle
        self.seed = int(seed)
        self.dp_axis = dp_axis
        self.graph_axis = graph_axis
        self.n_dp = mesh.shape[dp_axis]
        self.n_graph = mesh.shape[graph_axis]
        self._epoch = 0
        self._caps = None

    @property
    def caps(self) -> Dict[str, int]:
        if self._caps is None:
            caps = {"L": 1, "G": 1, "E": 1}
            for i in range(len(self.dataset)):
                p = spatial_partition(
                    dict(self.dataset[i]), self.n_graph, self.r_max
                )
                caps = {k: max(caps[k], p["caps"][k]) for k in caps}
            self._caps = caps
        return self._caps

    def __len__(self) -> int:
        return (len(self.dataset) + self.n_dp - 1) // self.n_dp

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            return np.random.RandomState(self.seed + self._epoch).permutation(n)
        return np.arange(n)

    def __iter__(self):
        order = self._order()
        n = len(order)
        for start in range(0, n, self.n_dp):
            idx = order[start : start + self.n_dp]
            # short tail: repeat the last frame; its loss contribution is NOT
            # masked (spatial batches have no frame mask), so keep dataset
            # sizes divisible by n_dp for exact semantics
            while len(idx) < self.n_dp:
                idx = np.concatenate([idx, idx[-1:]])
            frames = [self.dataset[i] for i in idx]
            batch, _ = prepare_spatial_batch(
                frames,
                self.mesh,
                self.r_max,
                caps=self.caps,
                dp_axis=self.dp_axis,
                graph_axis=self.graph_axis,
            )
            yield batch
        self._epoch += 1

    # restartable state (epoch-keyed shuffling, like DataLoader)
    def state_dict(self) -> dict:
        return {"epoch": self._epoch}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = int(state["epoch"])


class SpatialFrameDataModule:
    """Minimal datamodule serving SpatialFrameLoaders to the Trainer."""

    def __init__(
        self,
        train_dataset,
        mesh: Mesh,
        r_max: float,
        val_dataset=None,
        seed: int = 0,
        shuffle: bool = True,
    ):
        self.mesh = mesh
        self.r_max = r_max
        self.seed = seed
        self._train = SpatialFrameLoader(
            train_dataset, mesh, r_max, shuffle=shuffle, seed=seed
        )
        self._val = (
            [SpatialFrameLoader(val_dataset, mesh, r_max)]
            if val_dataset is not None
            else []
        )

    def setup(self, stage=None) -> None:
        pass

    def train_dataloader(self):
        return self._train

    def val_dataloaders(self):
        return self._val

    def test_dataloaders(self):
        return self._val
