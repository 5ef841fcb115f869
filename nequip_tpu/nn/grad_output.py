"""Forces, stress, and virial as gradients of the energy.

Parity: ``ForceStressOutput`` (``/root/reference/nequip/nn/grad_output.py``):
the symmetrized strain-displacement trick (Knuth et al., Comput. Phys.
Commun. 190, 33-50, 2015) applied to positions and cell, with

    forces = -dE/dpos,   stress = (dE/ddisplacement) / V,
    virial = -dE/ddisplacement = -stress * V.

TPU-native: ``jax.grad`` with ``has_aux`` replaces torch autograd; the
reference's ``create_graph=training`` double-backward bookkeeping disappears
because JAX grads-of-grads compose naturally (force-loss training just
differentiates through this function again).

The alternate branch differentiates w.r.t. ``edge_vectors`` directly for
spatially-decomposed inference (LAMMPS-MLIAP-style,
``grad_output.py:276-298``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data import _keys
from ..ops.irreps import Irreps
from .module import GraphModule, Params


class ForceStressOutput(GraphModule):
    def __init__(
        self, func: GraphModule, do_derivatives: bool = True, remat: bool = False
    ):
        super().__init__()
        self.func = func
        self.do_derivatives = do_derivatives
        # ``remat=True`` wraps the whole E+F computation in jax.checkpoint.
        # Per-layer remat inside ``func`` only bounds the *first* backward
        # (the force pass); when a force-containing LOSS is differentiated,
        # the outer backward linearizes through the force VJP and XLA saves
        # every residual of that graph — measured 23k f32: 14.2-15.0 GiB of
        # temp regardless of per-layer policy.  Checkpointing the force
        # branch itself makes the loss backward RECOMPUTE the E+F graph
        # (with the per-layer policies applying to the nested AD) instead
        # of storing its residuals.  No effect on inference (primal-only).
        self.remat = remat
        self._init_irreps(
            irreps_in=dict(func.irreps_in), irreps_out=dict(func.irreps_out)
        )
        self.irreps_out[_keys.FORCE_KEY] = Irreps("1o")
        self.irreps_out[_keys.STRESS_KEY] = Irreps("1o")
        self.irreps_out[_keys.VIRIAL_KEY] = Irreps("1o")
        self.irreps_out[_keys.EDGE_FORCE_KEY] = Irreps("1o")

    def init(self, rng) -> Params:
        return self.func.init(rng)

    def frozen_param_paths(self):
        return self.func.frozen_param_paths()

    def __call__(self, params: Params, data: dict) -> dict:
        if not self.do_derivatives:
            return self.func(params, data)

        branch = (
            self._edge_force_branch
            if _keys.EDGE_VECTORS_KEY in data
            else self._pos_stress_branch
        )
        if self.remat:
            return jax.checkpoint(branch)(params, data)
        return branch(params, data)

    # ------------------------------------------------------------------
    def _pos_stress_branch(self, params: Params, data: dict) -> dict:
        pos = data[_keys.POSITIONS_KEY]
        has_cell = _keys.CELL_KEY in data
        num_frames = data[_keys.NUM_NODES_KEY].shape[0]
        batch = data.get(_keys.BATCH_KEY)
        if batch is None:
            batch = jnp.zeros(pos.shape[0], dtype=jnp.int32)
        orig_cell = data.get(_keys.CELL_KEY)

        def energy_fn(pos_in, displacement):
            sym = 0.5 * (displacement + jnp.swapaxes(displacement, -1, -2))
            sym_per_node = jnp.take(sym, batch, axis=0)  # (N, 3, 3)
            # strain displacement at full precision (TPU default would lower
            # these f32 einsums to bf16 MXU passes — see graph_utils.py)
            HI = jax.lax.Precision.HIGHEST
            new_pos = pos_in + jnp.einsum(
                "ni,nij->nj", pos_in, sym_per_node, precision=HI
            )
            inner = dict(data)
            inner[_keys.POSITIONS_KEY] = new_pos
            if has_cell:
                cell = orig_cell.reshape(-1, 3, 3)
                inner[_keys.CELL_KEY] = cell + jnp.einsum(
                    "fij,fjk->fik", cell, sym, precision=HI
                )
            out = self.func(params, inner)
            energy = out[_keys.TOTAL_ENERGY_KEY].reshape(-1)
            if _keys.FRAME_MASK_KEY in data:
                energy = jnp.where(data[_keys.FRAME_MASK_KEY], energy, 0.0)
            return jnp.sum(energy), out

        displacement = jnp.zeros((num_frames, 3, 3), dtype=pos.dtype)
        (dE_dpos, dE_ddisp), out = jax.grad(
            energy_fn, argnums=(0, 1), has_aux=True
        )(pos, displacement)

        out = dict(out)
        out[_keys.POSITIONS_KEY] = pos  # restore undisplaced inputs
        if has_cell:
            out[_keys.CELL_KEY] = orig_cell
        out[_keys.FORCE_KEY] = -dE_dpos.astype(pos.dtype)

        virial_raw = dE_ddisp  # (F, 3, 3) = dE/dstrain
        if has_cell:
            vol = jnp.abs(jnp.linalg.det(orig_cell.reshape(-1, 3, 3)))
            if _keys.FRAME_MASK_KEY in data:
                vol = jnp.where(data[_keys.FRAME_MASK_KEY], vol, 1.0)
            out[_keys.STRESS_KEY] = virial_raw / vol[:, None, None]
        out[_keys.VIRIAL_KEY] = -virial_raw
        return out

    # ------------------------------------------------------------------
    def _edge_force_branch(self, params: Params, data: dict) -> dict:
        edge_vectors = data[_keys.EDGE_VECTORS_KEY]

        def energy_fn(vecs):
            inner = dict(data)
            inner[_keys.EDGE_VECTORS_KEY] = vecs
            out = self.func(params, inner)
            if _keys.NUM_LOCAL_GHOST_NODES_KEY in data:
                # engine (LAMMPS-style) spatial decomposition: differentiate
                # ONLY the locally-owned atoms' energies — ghost energies are
                # computed from incomplete per-rank graphs and are owned by
                # their home rank (parity: the reference's local-node
                # truncation, interaction_block.py:158-199)
                n_local = data[_keys.NUM_LOCAL_GHOST_NODES_KEY].reshape(-1)[0]
                e_atom = out[_keys.PER_ATOM_ENERGY_KEY].reshape(-1)
                local = jnp.arange(e_atom.shape[0]) < n_local
                return jnp.sum(jnp.where(local, e_atom, 0.0)), out
            energy = out[_keys.TOTAL_ENERGY_KEY].reshape(-1)
            if _keys.FRAME_MASK_KEY in data:
                energy = jnp.where(data[_keys.FRAME_MASK_KEY], energy, 0.0)
            return jnp.sum(energy), out

        dE_dvec, out = jax.grad(energy_fn, has_aux=True)(edge_vectors)
        out = dict(out)
        # no sign flip — matches the LAMMPS pair convention (grad_output.py:292-296)
        out[_keys.EDGE_FORCE_KEY] = dE_dvec
        return out

    # ------------------------------------------------------------------
    def loss_surrogate(self, params: Params, data: dict, cotangents: dict):
        """Scalar ``S(params)`` with ``grad(S) == sum_k <cotangents[k], out_k>``.

        The memory-lean route to force-loss training gradients
        (reverse-over-FORWARD instead of reverse-over-reverse):

            grad_p L(out(p)) = grad_p <stopgrad(dL/dout), out(p)>

        and for the derivative outputs the inner product collapses to a
        single jvp of the *energy* graph:

            <v_F, F>      = -jvp_pos (sum E; v_F)
            <v_V, virial> = -jvp_disp(sum E; v_V)
            <v_S, stress> =  jvp_disp(sum E; v_S / vol)

        so ``jax.grad(S)`` is an ordinary first-order reverse pass over a
        jvp-augmented energy graph — no residuals of a force VJP are ever
        saved (reverse-over-reverse needs 14-15 GiB of temp at 23k atoms
        regardless of per-layer remat policy; this path is bounded by
        ~2x the energy forward).  Exact: same gradients to float
        associativity.

        ``cotangents`` maps output field -> dL/d(field), stop-gradient'd by
        the caller.  Derivative fields (force/stress/virial) become jvp
        tangents; every other field must be an output of the energy graph.

        The tangent propagation is the module-level dual sweep
        (``GraphModule.jvp``): pure-XLA modules route through ``jax.jvp``,
        and ``InteractionBlock.jvp`` expands the trilinear TP-scatter into
        three calls of the SAME custom-vjp kernels — so this works with
        every ``tp_impl``, and ``jax.grad`` of the returned scalar is an
        ordinary first-order reverse pass (per-layer remat applies).
        """
        assert _keys.EDGE_VECTORS_KEY not in data, (
            "loss_surrogate supports the positions/strain branch only"
        )
        pos = data[_keys.POSITIONS_KEY]
        has_cell = _keys.CELL_KEY in data
        num_frames = data[_keys.NUM_NODES_KEY].shape[0]
        batch = data.get(_keys.BATCH_KEY)
        if batch is None:
            batch = jnp.zeros(pos.shape[0], dtype=jnp.int32)
        orig_cell = data.get(_keys.CELL_KEY)

        deriv_keys = (_keys.FORCE_KEY, _keys.STRESS_KEY, _keys.VIRIAL_KEY)
        t_pos = jnp.zeros_like(pos)
        t_disp = None
        if _keys.FORCE_KEY in cotangents:
            # F = -dE/dpos
            t_pos = t_pos - cotangents[_keys.FORCE_KEY].astype(pos.dtype)
        if _keys.VIRIAL_KEY in cotangents:
            # virial = -dE/ddisp
            t_disp = -cotangents[_keys.VIRIAL_KEY].astype(pos.dtype)
        if _keys.STRESS_KEY in cotangents:
            # stress = (dE/ddisp) / vol
            assert has_cell, "stress cotangent requires a cell"
            vol = jnp.abs(jnp.linalg.det(orig_cell.reshape(-1, 3, 3)))
            if _keys.FRAME_MASK_KEY in data:
                vol = jnp.where(data[_keys.FRAME_MASK_KEY], vol, 1.0)
            ts = (cotangents[_keys.STRESS_KEY] / vol[:, None, None]).astype(
                pos.dtype
            )
            t_disp = ts if t_disp is None else t_disp + ts

        # the strain parametrization of _pos_stress_branch, linearized at
        # displacement = 0: d new_pos = t_pos + pos . sym(t_disp),
        # d cell = cell . sym(t_disp) — the primal data is unchanged
        tangents = {}
        if t_disp is not None:
            HI = jax.lax.Precision.HIGHEST
            sym_t = 0.5 * (t_disp + jnp.swapaxes(t_disp, -1, -2))
            sym_pn = jnp.take(sym_t, batch, axis=0)
            t_pos = t_pos + jnp.einsum(
                "ni,nij->nj", pos, sym_pn, precision=HI
            )
            if has_cell:
                cell = orig_cell.reshape(-1, 3, 3)
                tangents[_keys.CELL_KEY] = jnp.einsum(
                    "fij,fjk->fik", cell, sym_t, precision=HI
                ).reshape(orig_cell.shape)
        tangents[_keys.POSITIONS_KEY] = t_pos

        out, tout = self.func.jvp(params, data, tangents)
        d_e = tout[_keys.TOTAL_ENERGY_KEY].reshape(-1)
        if _keys.FRAME_MASK_KEY in data:
            d_e = jnp.where(data[_keys.FRAME_MASK_KEY], d_e, 0.0)
        surrogate = jnp.sum(d_e)
        for k, v in cotangents.items():
            if k in deriv_keys:
                continue
            assert k in out, (
                f"loss field {k!r} is not an output of the energy graph; "
                "fr-mode force_grad supports losses on energy-graph outputs "
                "plus forces/stress/virial"
            )
            surrogate = surrogate + jnp.sum(v * out[k])
        return surrogate

    def __repr__(self):
        return f"ForceStressOutput(do_derivatives={self.do_derivatives},\n  func={self.func!r})"


class PartialForceOutput(GraphModule):
    """Full jacobian: partial_forces[i, j] = -d(E_j)/d(pos_i).

    Parity: ``PartialForceOutput`` (``grad_output.py:14-72``).
    """

    def __init__(self, func: GraphModule):
        super().__init__()
        self.func = func
        self._init_irreps(
            irreps_in=dict(func.irreps_in), irreps_out=dict(func.irreps_out)
        )
        self.irreps_out[_keys.PARTIAL_FORCE_KEY] = Irreps("1o")
        self.irreps_out[_keys.FORCE_KEY] = Irreps("1o")

    def init(self, rng) -> Params:
        return self.func.init(rng)

    def __call__(self, params: Params, data: dict) -> dict:
        pos = data[_keys.POSITIONS_KEY]
        # plain forward for the output fields (a side-channel capture inside
        # jacrev would leak tracers under jit)
        out = dict(self.func(params, dict(data)))

        def per_atom_energy(pos_in):
            inner = dict(data)
            inner[_keys.POSITIONS_KEY] = pos_in
            return self.func(params, inner)[_keys.PER_ATOM_ENERGY_KEY].reshape(-1)

        jac = jax.jacrev(per_atom_energy)(pos)  # (n_energies, n_atoms, 3)
        partial = -jac  # partial[j, i] = -dE_j/dpos_i (reference layout)
        out[_keys.PARTIAL_FORCE_KEY] = partial
        out[_keys.FORCE_KEY] = jnp.sum(partial, axis=0)
        return out
