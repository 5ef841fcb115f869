"""Spatially-decomposed (sharded-graph) inference over a device mesh.

The TPU-native analog of the reference's LAMMPS ghost-atom machinery
(``/root/reference/nequip/nn/_ghost_exchange_*.py``, §2.9 of the survey):
atoms are partitioned into spatial slabs, one per device; each device owns
its local atoms and references *ghost* copies of remote atoms within the
interaction range.

Key design point: ghost positions and ghost features are **derived inside
the traced graph** from the owners' arrays via ``all_gather`` over the mesh
axis.  JAX's VJP of ``all_gather`` is a collective scatter-reduce, so the
reverse force/feature exchange (LAMMPS's ``reverse_exchange``) falls out of
autodiff — forces on local atoms automatically include contributions that
other devices computed through their ghost copies.

For message passing deeper than one hop, the per-layer ghost refresh is the
``MeshGhostExchange`` module swapped into every InteractionBlock by the
``enable_MeshGhostExchange`` modifier.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..data import _keys, round_up
from ..data.neighborlist import neighbor_list
from ..nn.ghost_exchange import NoOpGhostExchange
from ..nn.module import GraphModule, Params

GHOST_OWNER_DEV_KEY = "ghost_owner_dev"
GHOST_OWNER_IDX_KEY = "ghost_owner_idx"
GHOST_SHIFT_KEY = "ghost_shift"

from ..data._key_registry import register_fields

register_fields(
    long_fields=[GHOST_OWNER_DEV_KEY, GHOST_OWNER_IDX_KEY],
)


# ---------------------------------------------------------------------------
# host-side spatial partitioner
# ---------------------------------------------------------------------------
def spatial_partition(
    frame: dict,
    n_devices: int,
    r_max: float,
    pad_multiple: int = 128,
    caps: Optional[Dict[str, int]] = None,
) -> Dict[str, np.ndarray]:
    """Slab-partition a (periodic) frame along its longest cell axis.

    Returns stacked per-device arrays (leading dim = device):
      local_pos (D, L, 3), local_types (D, L), local_mask (D, L),
      ghost_owner_dev/idx (D, G), ghost_shift (D, G, 3), ghost_mask (D, G),
      edge_index (D, 2, E) with dst in [0, L), src in [0, L+G),
      edge_mask (D, E), cell (3, 3), plus bookkeeping 'caps'.
    """
    pos = np.asarray(frame[_keys.POSITIONS_KEY], dtype=np.float64)
    types = np.asarray(frame[_keys.ATOM_TYPE_KEY]).reshape(-1)
    cell = np.asarray(frame[_keys.CELL_KEY]).reshape(3, 3)
    pbc = np.asarray(frame.get(_keys.PBC_KEY, np.ones(3, bool))).reshape(-1)
    n = pos.shape[0]

    # slab axis = longest cell vector
    axis = int(np.argmax(np.linalg.norm(cell, axis=1)))
    inv = np.linalg.inv(cell)
    fracs = (pos @ inv)[:, axis] % 1.0
    slab_of = np.minimum((fracs * n_devices).astype(int), n_devices - 1)

    # global NL once (native backend), then route edges to dst owner devices
    edge_index, shifts = neighbor_list(pos, r_max, cell=cell, pbc=pbc)
    dst_dev = slab_of[edge_index[0]]

    local_idx = [np.nonzero(slab_of == d)[0] for d in range(n_devices)]
    g2l = np.full(n, -1, dtype=np.int64)
    for d in range(n_devices):
        g2l[local_idx[d]] = np.arange(len(local_idx[d]))

    # per device: ghosts = (src atom, shift) pairs needed by local dst atoms
    per_dev = []
    max_local = max(len(li) for li in local_idx)
    max_ghost = 1
    max_edges = 1
    for d in range(n_devices):
        esel = np.nonzero(dst_dev == d)[0]
        e = edge_index[:, esel]
        s = shifts[esel]
        src_dev = slab_of[e[1]]
        is_remote = (src_dev != d) | (np.abs(s).sum(axis=1) > 0)
        # unique ghost keys: (src atom, shift triple)
        keys = [
            (int(e[1, k]), int(s[k, 0]), int(s[k, 1]), int(s[k, 2]))
            for k in np.nonzero(is_remote)[0]
        ]
        uniq = sorted(set(keys))
        ghost_index = {g: i for i, g in enumerate(uniq)}
        n_loc = len(local_idx[d])

        e_dst = g2l[e[0]]
        e_src = np.empty(e.shape[1], dtype=np.int64)
        for k in range(e.shape[1]):
            if is_remote[k]:
                gk = (int(e[1, k]), int(s[k, 0]), int(s[k, 1]), int(s[k, 2]))
                e_src[k] = n_loc + ghost_index[gk]
            else:
                e_src[k] = g2l[e[1, k]]
        per_dev.append(
            dict(
                local=local_idx[d],
                ghosts=uniq,
                e_dst=e_dst,
                e_src=e_src,
            )
        )
        max_ghost = max(max_ghost, len(uniq))
        max_edges = max(max_edges, e.shape[1])

    if caps is not None:
        # shared capacities (2-D dp x graph batching needs identical shapes)
        assert caps["L"] >= max_local and caps["G"] >= max_ghost and caps["E"] >= max_edges, (
            f"caps {caps} too small for (L={max_local}, G={max_ghost}, E={max_edges})"
        )
        L, G, E = caps["L"], caps["G"], caps["E"]
    else:
        L = round_up(max_local, pad_multiple)
        G = round_up(max_ghost, pad_multiple)
        E = round_up(max_edges, 2 * pad_multiple)

    out = {
        "local_pos": np.zeros((n_devices, L, 3)),
        "local_types": np.zeros((n_devices, L), dtype=np.int32),
        "local_mask": np.zeros((n_devices, L), dtype=bool),
        "ghost_owner_dev": np.zeros((n_devices, G), dtype=np.int32),
        "ghost_owner_idx": np.zeros((n_devices, G), dtype=np.int32),
        "ghost_types": np.zeros((n_devices, G), dtype=np.int32),
        "ghost_shift": np.zeros((n_devices, G, 3)),
        "ghost_mask": np.zeros((n_devices, G), dtype=bool),
        "edge_index": np.full((n_devices, 2, E), 0, dtype=np.int32),
        "edge_mask": np.zeros((n_devices, E), dtype=bool),
        "cell": cell,
        "caps": {"L": L, "G": G, "E": E},
        "local_index_global": np.zeros((n_devices, L), dtype=np.int64),
    }
    for d, pd in enumerate(per_dev):
        li = pd["local"]
        nl_ = len(li)
        out["local_pos"][d, :nl_] = pos[li]
        out["local_types"][d, :nl_] = types[li]
        out["local_mask"][d, :nl_] = True
        out["local_index_global"][d, :nl_] = li
        for gi, (atom, sx, sy, sz) in enumerate(pd["ghosts"]):
            out["ghost_owner_dev"][d, gi] = slab_of[atom]
            out["ghost_owner_idx"][d, gi] = g2l[atom]
            out["ghost_types"][d, gi] = types[atom]
            out["ghost_shift"][d, gi] = np.array([sx, sy, sz]) @ cell
            out["ghost_mask"][d, gi] = True
        ne = len(pd["e_dst"])
        # padded edges point at the last local slot (masked)
        out["edge_index"][d, :, ne:] = L - 1
        out["edge_index"][d, 0, :ne] = pd["e_dst"]
        # remap ghost slots: src >= n_loc -> L + ghost_slot
        src = pd["e_src"].copy()
        n_loc = len(li)
        remote = src >= n_loc
        src[remote] = L + (src[remote] - n_loc)
        out["edge_index"][d, 1, :ne] = src
        out["edge_mask"][d, :ne] = True
    return out


# ---------------------------------------------------------------------------
# in-graph ghost refresh (per conv layer)
# ---------------------------------------------------------------------------
class MeshGhostExchange(GraphModule):
    """Replace ghost-node features with their owners' current features."""

    def __init__(self, field: str, axis_name: str, n_local_cap: int, irreps_in=None):
        super().__init__()
        self.field = field
        self.axis_name = axis_name
        self.n_local_cap = n_local_cap
        self._init_irreps(irreps_in=irreps_in)

    def __call__(self, params: Params, data: dict) -> dict:
        x = data[self.field]
        local = x[: self.n_local_cap]
        all_local = jax.lax.all_gather(local, self.axis_name)  # (D, L, F)
        gdev = data[GHOST_OWNER_DEV_KEY]
        gidx = data[GHOST_OWNER_IDX_KEY]
        ghost = all_local[gdev, gidx]
        ghost = jnp.where(data["ghost_mask"][:, None], ghost, 0)
        data = dict(data)
        data[self.field] = jnp.concatenate([local, ghost], axis=0)
        return data


def enable_MeshGhostExchange(model, axis_name: str, n_local_cap: int):
    """Swap every InteractionBlock's no-op ghost exchange for the mesh one."""
    from ..nn.interaction_block import InteractionBlock

    def visit(m):
        if isinstance(m, InteractionBlock):
            m.ghost_exchange = MeshGhostExchange(
                field=_keys.NODE_FEATURES_KEY,
                axis_name=axis_name,
                n_local_cap=n_local_cap,
            )
        if hasattr(m, "module_dict"):
            for v in m.module_dict.values():
                visit(v)
        for attr in ("model", "func", "conv"):
            v = getattr(m, attr, None)
            if v is not None and hasattr(v, "irreps_in"):
                visit(v)

    visit(model)
    return model


def disable_MeshGhostExchange(model):
    """Restore the no-op ghost exchange (single-device use of the model)."""
    from ..nn.interaction_block import InteractionBlock

    def visit(m):
        if isinstance(m, InteractionBlock) and isinstance(
            m.ghost_exchange, MeshGhostExchange
        ):
            m.ghost_exchange = NoOpGhostExchange(field=_keys.NODE_FEATURES_KEY)
        if hasattr(m, "module_dict"):
            for v in m.module_dict.values():
                visit(v)
        for attr in ("model", "func", "conv"):
            v = getattr(m, attr, None)
            if v is not None and hasattr(v, "irreps_in"):
                visit(v)

    visit(model)
    return model


# ---------------------------------------------------------------------------
# sharded forward: energy + local forces
# ---------------------------------------------------------------------------
class ShardedGraphEvaluator:
    """Energy/forces for one huge frame spatially sharded over the mesh."""

    def __init__(self, model, params, mesh: Optional[Mesh] = None, axis_name: str = "graph",
                 force_grad_mode: str = "rr"):
        from .mesh import make_mesh

        self.mesh = mesh if mesh is not None else make_mesh(axis_names=(axis_name,))
        self.axis_name = axis_name
        self.model = model
        self.params = params
        # "rr" or "fr" (dual-sweep surrogate) for loss_and_grad — see
        # SpatialTrainModule._device_sums / docs/design.md §8
        assert force_grad_mode in ("rr", "fr"), force_grad_mode
        self.force_grad_mode = force_grad_mode
        self._fn = None
        self._caps = None

    def prepare(self, frame: dict, r_max: Optional[float] = None):
        r_max = r_max if r_max is not None else float(self.model.r_max)
        n_dev = self.mesh.shape[self.axis_name]
        parts = spatial_partition(frame, n_dev, r_max)
        self._parts = parts
        caps = parts["caps"]
        if caps != self._caps:
            self._caps = caps
            self._fn = None
            enable_MeshGhostExchange(self.model, self.axis_name, caps["L"])
        return parts

    def evaluate(self, frame: dict):
        parts = self.prepare(frame)
        caps = self._caps
        ax = self.axis_name
        model = self.model
        params = self.params
        energy_net = model.model.func
        L, G = caps["L"], caps["G"]
        mdtype = None

        def device_fn(local_pos, local_types, local_mask, gdev, gidx, gshift,
                      gmask, ghost_types, edge_index, edge_mask):
            def energy_of(pos_local):
                all_pos = jax.lax.all_gather(pos_local, ax)
                ghost_pos = all_pos[gdev, gidx] + gshift.astype(pos_local.dtype)
                pos_full = jnp.concatenate([pos_local, ghost_pos], axis=0)
                types_full = jnp.concatenate([local_types, ghost_types])
                data = {
                    _keys.POSITIONS_KEY: pos_full,
                    _keys.ATOM_TYPE_KEY: types_full,
                    _keys.EDGE_INDEX_KEY: edge_index,
                    _keys.EDGE_MASK_KEY: edge_mask,
                    _keys.NODE_MASK_KEY: jnp.concatenate([local_mask, gmask]),
                    _keys.BATCH_KEY: jnp.zeros(L + G, dtype=jnp.int32),
                    _keys.NUM_NODES_KEY: jnp.array([L + G], dtype=jnp.int32),
                    _keys.FRAME_MASK_KEY: jnp.ones(1, dtype=bool),
                    GHOST_OWNER_DEV_KEY: gdev,
                    GHOST_OWNER_IDX_KEY: gidx,
                    "ghost_mask": gmask,
                }
                out = energy_net(params, data)
                e_atom = out[_keys.PER_ATOM_ENERGY_KEY][:L].reshape(-1)
                # differentiate the LOCAL energy only: the all_gather VJPs
                # running in SPMD already aggregate cross-device force
                # contributions (putting a psum in the loss would transpose
                # to another psum and overcount by n_devices)
                return jnp.sum(jnp.where(local_mask, e_atom, 0.0))

            e_local, dE = jax.value_and_grad(energy_of)(local_pos)
            e_total = jax.lax.psum(e_local, ax)
            return e_total, -dE[None]  # restore the leading device axis

        from ..utils.global_state import global_dtype

        dt = global_dtype()
        arrs = dict(
            local_pos=jnp.asarray(parts["local_pos"], dt),
            local_types=jnp.asarray(parts["local_types"]),
            local_mask=jnp.asarray(parts["local_mask"]),
            gdev=jnp.asarray(parts["ghost_owner_dev"]),
            gidx=jnp.asarray(parts["ghost_owner_idx"]),
            gshift=jnp.asarray(parts["ghost_shift"], dt),
            gmask=jnp.asarray(parts["ghost_mask"]),
            ghost_types=jnp.asarray(parts["ghost_types"]),
            edge_index=jnp.asarray(parts["edge_index"]),
            edge_mask=jnp.asarray(parts["edge_mask"]),
        )
        in_specs = {k: P(ax) for k in arrs}
        smapped = _shard_map(
            # shard_map keeps the (size-1) leading device axis; squeeze it
            lambda a: device_fn(**{k: v[0] for k, v in a.items()}),
            mesh=self.mesh,
            in_specs=(in_specs,),
            out_specs=(P(), P(ax)),
            check_vma=False,
        )
        sharded = {
            k: jax.device_put(v, NamedSharding(self.mesh, P(ax)))
            for k, v in arrs.items()
        }
        energy, local_forces = jax.jit(smapped)(sharded)
        # de-shard: map local forces back to the global atom order
        lf = np.asarray(local_forces)
        n = frame[_keys.POSITIONS_KEY].shape[0]
        forces = np.zeros((n, 3))
        for d in range(lf.shape[0]):
            mask = parts["local_mask"][d]
            forces[parts["local_index_global"][d][mask]] = lf[d][mask]
        return float(np.asarray(energy).reshape(-1)[0]), forces

    # ------------------------------------------------------------------
    # sharded-graph TRAINING: exact global (loss, param-grads) for one
    # frame too large for a single device
    # ------------------------------------------------------------------
    def _sharded_arrays(self, parts, dt):
        ax = self.axis_name
        arrs = dict(
            local_pos=jnp.asarray(parts["local_pos"], dt),
            local_types=jnp.asarray(parts["local_types"]),
            local_mask=jnp.asarray(parts["local_mask"]),
            gdev=jnp.asarray(parts["ghost_owner_dev"]),
            gidx=jnp.asarray(parts["ghost_owner_idx"]),
            gshift=jnp.asarray(parts["ghost_shift"], dt),
            gmask=jnp.asarray(parts["ghost_mask"]),
            ghost_types=jnp.asarray(parts["ghost_types"]),
            edge_index=jnp.asarray(parts["edge_index"]),
            edge_mask=jnp.asarray(parts["edge_mask"]),
        )
        return {
            k: jax.device_put(v, NamedSharding(self.mesh, P(ax)))
            for k, v in arrs.items()
        }

    def loss_and_grad(
        self,
        frame: dict,
        energy_ref: float,
        forces_ref,
        energy_coeff: float = 1.0,
        force_coeff: float = 1.0,
    ):
        """Exact (loss, param-gradients) for one spatially-sharded frame.

        Loss (single-device semantics, computed exactly under sharding):

            L = energy_coeff * ((E - E_ref) / N)^2
              + force_coeff  * mean_{i,a} (F_ia - F_ref_ia)^2

        Gradient strategy (see the module docstring / evaluate()): each
        device differentiates only *local* quantities — the per-device energy
        sum and the force error over locally-owned atoms — so the collective
        VJPs (all_gather -> scatter-reduce) route cross-device contributions
        exactly once, and one final ``psum`` over the replicated params gives
        the exact global gradient.  The global energy term is handled by the
        linearization  d(de^2)/dtheta = (2 de / N) * dE_total/dtheta  with
        ``de`` stop-gradiented (it is itself a psum; differentiating through
        it would double-count).

        The inner force pass composes with the outer parameter gradient
        (reverse-over-reverse); with tp_impl='pallas' this runs on the fused
        kernels (the family is closed under AD — ops/pallas/tp_scatter.py).

        This extends the reference's ghost-exchange machinery (inference via
        LAMMPS, ``nn/_ghost_exchange_*.py``) to training — enabled on TPU by
        SPMD autodiff over the mesh.
        """
        parts = self.prepare(frame)
        caps = self._caps
        ax = self.axis_name
        n_dev = self.mesh.shape[ax]
        L = caps["L"]
        n_atoms = int(parts["local_mask"].sum())

        from ..utils.global_state import global_dtype

        dt = global_dtype()
        fr = np.asarray(forces_ref, dtype=np.float64)
        f_ref = np.zeros((n_dev, L, 3))
        for d in range(n_dev):
            m = parts["local_mask"][d]
            f_ref[d][m] = fr[parts["local_index_global"][d][m]]
        f_ref_sh = jax.device_put(
            jnp.asarray(f_ref, dt), NamedSharding(self.mesh, P(ax))
        )
        sharded = self._sharded_arrays(parts, dt)

        key = (tuple(sorted(caps.items())), float(energy_coeff), float(force_coeff))
        if not hasattr(self, "_lg_cache"):
            self._lg_cache = {}
        if key not in self._lg_cache:
            self._lg_cache[key] = self._build_loss_and_grad(
                caps, float(energy_coeff), float(force_coeff), n_atoms
            )
        loss, grads = self._lg_cache[key](
            self.params, jnp.asarray(float(energy_ref), dt), sharded, f_ref_sh
        )
        return loss, grads

    def _build_loss_and_grad(self, caps, ce, cf, n_atoms):
        ax = self.axis_name
        model = self.model
        energy_net = model.model.func
        L, G = caps["L"], caps["G"]

        fgm = self.force_grad_mode

        def device_fn(params, e_ref, a, f_ref_loc):
            local_pos = a["local_pos"]
            local_mask = a["local_mask"]
            gmask = a["gmask"]

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
                    GHOST_OWNER_DEV_KEY: a["gdev"],
                    GHOST_OWNER_IDX_KEY: a["gidx"],
                    "ghost_mask": gmask,
                }

            def pos_full_of(pos_local):
                all_pos = jax.lax.all_gather(pos_local, ax)
                ghost_pos = all_pos[a["gdev"], a["gidx"]] + a["gshift"].astype(
                    pos_local.dtype
                )
                return jnp.concatenate([pos_local, ghost_pos], axis=0)

            def local_e_sum(out):
                e_atom = out[_keys.PER_ATOM_ENERGY_KEY][:L].reshape(-1)
                return jnp.sum(jnp.where(local_mask, e_atom, 0.0))

            def energy_of(pos_local, p):
                return local_e_sum(
                    energy_net(p, build_data(pos_full_of(pos_local)))
                )

            if fgm == "fr":
                # dual-sweep surrogate (see SpatialTrainModule._device_sums):
                # pass 1 computes forces first-order; the force-MSE gradient
                # becomes -grad_p of a directional derivative of the energy
                # graph with the GLOBAL tangent (local cotangent + the other
                # devices' cotangents through the ghosts)
                e0, neg_f0 = jax.value_and_grad(energy_of, argnums=0)(
                    local_pos, params
                )
                e_total0 = jax.lax.psum(e0, ax)
                de = (e_total0 - e_ref) / n_atoms
                fe0 = jnp.where(local_mask[:, None], -neg_f0 - f_ref_loc, 0.0)
                sse_f = jnp.sum(fe0 * fe0)
                dt = fe0.dtype
                v = jax.lax.stop_gradient(
                    (2.0 * cf / (3.0 * n_atoms)) * fe0
                ).astype(dt)
                de_sg = jax.lax.stop_gradient(de)

                def surrogate_fr(p):
                    t_full = jnp.concatenate(
                        [v, jax.lax.all_gather(v, ax)[a["gdev"], a["gidx"]]],
                        axis=0,
                    )
                    data = build_data(pos_full_of(local_pos))
                    out, tout = energy_net.jvp(
                        p, data, {_keys.POSITIONS_KEY: t_full}
                    )
                    e_local = local_e_sum(out)
                    t_atom = tout[_keys.PER_ATOM_ENERGY_KEY][:L].reshape(-1)
                    d_e = jnp.sum(jnp.where(local_mask, t_atom, 0.0))
                    return ce * 2.0 * de_sg / n_atoms * e_local - d_e

                g = jax.grad(surrogate_fr)(params)
                g = jax.lax.psum(g, ax)
                loss = ce * de**2 + cf * jax.lax.psum(sse_f, ax) / (3.0 * n_atoms)
                return loss, g

            def surrogate(p):
                e_local, neg_f = jax.value_and_grad(energy_of, argnums=0)(
                    local_pos, p
                )
                forces = -neg_f
                e_total = jax.lax.psum(e_local, ax)
                de = (e_total - e_ref) / n_atoms
                fe = jnp.where(local_mask[:, None], forces - f_ref_loc, 0.0)
                sse_f = jnp.sum(fe * fe)
                sur = (
                    ce * 2.0 * jax.lax.stop_gradient(de) / n_atoms * e_local
                    + cf * sse_f / (3.0 * n_atoms)
                )
                return sur, (de, sse_f)

            (_, (de, sse_f)), g = jax.value_and_grad(surrogate, has_aux=True)(
                params
            )
            g = jax.lax.psum(g, ax)
            loss = ce * de**2 + cf * jax.lax.psum(sse_f, ax) / (3.0 * n_atoms)
            return loss, g

        arr_keys = [
            "local_pos", "local_types", "local_mask", "gdev", "gidx",
            "gshift", "gmask", "ghost_types", "edge_index", "edge_mask",
        ]
        in_specs = (P(), P(), {k: P(ax) for k in arr_keys}, P(ax))
        smapped = _shard_map(
            lambda p, e_ref, a, f_ref_loc: device_fn(
                p, e_ref, {k: v[0] for k, v in a.items()}, f_ref_loc[0]
            ),
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(smapped)
