"""On-device molecular dynamics: velocity Verlet + Nose-Hoover NVT.

TPU-native replacement for the reference's ASE-driven MD and the
``NoseHoover`` thermostat (``/root/reference/nequip/ase/nosehoover.py``):
the integrator steps run *entirely on device* inside one jit (positions,
velocities, thermostat state as a pytree; forces from the jitted model),
with a Verlet skin list — the neighborlist (host-side) is only rebuilt when
the maximum displacement since the last build exceeds half the skin.

Units: metal-style (eV, Angstrom, amu, fs);
``amu * A^2 / fs^2 = 103.642691e-4 eV`` etc. handled via ASE-compatible
constants.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

log = logging.getLogger("nequip_tpu")

from ..data import _keys, batched_from_list, compute_neighborlist_, from_dict, pad_batch, round_up, to_device

# ASE-compatible unit constants (eV, A, amu base units)
FS = 0.09822694750253231  # 1 fs in sqrt(amu A^2 / eV)
KB = 8.617330337217213e-05  # eV / K


def maxwell_boltzmann_velocities(
    masses,
    temperature_K: float,
    seed: int = 0,
    zero_momentum: bool = True,
) -> np.ndarray:
    """Velocities drawn from a Maxwell-Boltzmann distribution (ASE units).

    Parity: ``ase.md.velocitydistribution.MaxwellBoltzmannDistribution`` as
    used in the reference's MD workflows.  Returned velocities are in A per
    ASE time unit, so ``0.5 * m * v**2`` is in eV and ``MDDriver`` thermo
    reports the requested temperature (up to sampling noise; exactly removing
    net momentum lowers it by ~1/N).
    """
    masses = np.asarray(masses, dtype=np.float64).reshape(-1)
    r = np.random.RandomState(seed)
    sigma = np.sqrt(KB * float(temperature_K) / masses)
    v = r.standard_normal((masses.shape[0], 3)) * sigma[:, None]
    if zero_momentum:
        v -= (masses[:, None] * v).sum(axis=0) / masses.sum()
    return v


class VelocityVerlet:
    """NVE integrator state update (pure function factory)."""

    def __init__(self, dt_fs: float):
        self.dt = dt_fs * FS

    def make_step(self, force_fn, masses):
        dt = self.dt

        def step(state):
            pos, vel, forces, aux = state
            acc = forces / masses[:, None]
            vel_half = vel + 0.5 * dt * acc
            pos_new = pos + dt * vel_half
            forces_new = force_fn(pos_new)
            vel_new = vel_half + 0.5 * dt * forces_new / masses[:, None]
            return (pos_new, vel_new, forces_new, aux)

        return step

    def make_half_steps(self, masses):
        """The same update split around the force evaluation (for the
        host-driven per-step loop): ``half_a(state) -> (pos_new, carry)``
        advances everything computable before the new forces;
        ``half_b(pos_new, carry, forces_new) -> state`` finishes the step.
        Composing half_b∘force∘half_a IS make_step's update."""
        dt = self.dt

        def half_a(state):
            pos, vel, forces, aux = state
            vel_half = vel + 0.5 * dt * forces / masses[:, None]
            return pos + dt * vel_half, (vel_half, aux)

        def half_b(pos_new, carry, forces_new):
            vel_half, aux = carry
            vel_new = vel_half + 0.5 * dt * forces_new / masses[:, None]
            return (pos_new, vel_new, forces_new, aux)

        return half_a, half_b

    def init_aux(self):
        return jnp.zeros(())


class NoseHoover:
    """Single-chain Nose-Hoover NVT thermostat.

    Parity: ``/root/reference/nequip/ase/nosehoover.py:17-115`` (the simple
    half-step NH scheme with thermostat coupling ``nvt_q``).
    """

    def __init__(self, dt_fs: float, temperature_K: float, nvt_q: float = 334.0, n_dof: Optional[int] = None):
        self.dt = dt_fs * FS
        self.temperature = float(temperature_K)
        self.nvt_q = float(nvt_q)
        self.n_dof = n_dof

    def make_step(self, force_fn, masses):
        dt = self.dt
        q = self.nvt_q
        n_atoms = masses.shape[0]
        n_dof = self.n_dof if self.n_dof is not None else 3 * n_atoms
        kT = KB * self.temperature

        def step(state):
            pos, vel, forces, zeta = state
            # friction-modified acceleration with the OLD bath variable
            acc_mod = forces / masses[:, None] - zeta * vel
            vel_half = vel + 0.5 * dt * acc_mod
            pos_new = pos + dt * vel_half
            # two half-step bath updates: first from the old-velocity KE,
            # then from the half-step KE (matches the reference discretization)
            c = 0.5 * (n_dof + 1) * kT
            ke_old = 0.5 * jnp.sum(masses[:, None] * vel**2)
            zeta_half = zeta + 0.5 * dt / q * (ke_old - c)
            ke_half = 0.5 * jnp.sum(masses[:, None] * vel_half**2)
            zeta_new = zeta_half + 0.5 * dt / q * (ke_half - c)
            forces_new = force_fn(pos_new)
            acc_new = forces_new / masses[:, None]
            vel_new = (vel_half + 0.5 * dt * acc_new) / (1.0 + 0.5 * dt * zeta_new)
            return (pos_new, vel_new, forces_new, zeta_new)

        return step

    def make_half_steps(self, masses):
        """``make_step`` split around the force evaluation (see
        ``VelocityVerlet.make_half_steps``); both bath half-updates use only
        pre-force quantities, so they live entirely in half_a."""
        dt = self.dt
        q = self.nvt_q
        n_atoms = masses.shape[0]
        n_dof = self.n_dof if self.n_dof is not None else 3 * n_atoms
        kT = KB * self.temperature

        def half_a(state):
            pos, vel, forces, zeta = state
            acc_mod = forces / masses[:, None] - zeta * vel
            vel_half = vel + 0.5 * dt * acc_mod
            pos_new = pos + dt * vel_half
            c = 0.5 * (n_dof + 1) * kT
            ke_old = 0.5 * jnp.sum(masses[:, None] * vel**2)
            zeta_half = zeta + 0.5 * dt / q * (ke_old - c)
            ke_half = 0.5 * jnp.sum(masses[:, None] * vel_half**2)
            zeta_new = zeta_half + 0.5 * dt / q * (ke_half - c)
            return pos_new, (vel_half, zeta_new)

        def half_b(pos_new, carry, forces_new):
            vel_half, zeta_new = carry
            acc_new = forces_new / masses[:, None]
            vel_new = (vel_half + 0.5 * dt * acc_new) / (1.0 + 0.5 * dt * zeta_new)
            return (pos_new, vel_new, forces_new, zeta_new)

        return half_a, half_b

    def init_aux(self):
        return jnp.zeros(())


class MDDriver:
    """Skin-list MD loop over a (compiled or eager) model."""

    def __init__(
        self,
        model,
        params,
        frame: dict,
        integrator,
        masses: Optional[np.ndarray] = None,
        skin: float = 0.5,
        steps_per_block: int = 10,
        pad_multiple: int = 128,
        nl_backend: str = "host",
        integration: str = "block",
        edge_headroom: float = 1.1,
    ):
        """``nl_backend="device"`` rebuilds the neighborlist on the TPU with
        the jittable cell list (``ops.device_neighbor_list``) — skin rebuilds
        then never ship positions/edges across the host link.  Requires a
        periodic box at least ``3 * (r_max + skin)`` thick per axis.

        ``integration="block"`` (default) runs ``steps_per_block`` integrator
        steps inside one jitted program (fastest steady state; compiles a
        block program in addition to the force program).
        ``integration="host"`` integrates on the host with one jitted model
        call per step (the ASE-calculator pattern of the reference,
        ``/root/reference/nequip/ase/nequip_calculator.py``): ONE compiled
        program total, so time-to-first-step is roughly halved — use for
        short runs or cold processes.  Requires ``nl_backend="host"``.

        ``edge_headroom`` over-allocates the edge capacity at the first
        neighborlist build so thermal density fluctuations at skin rebuilds
        do not outgrow the capacity (a capacity change invalidates every
        compiled program — minutes of recompile mid-run); the padded slots
        are masked and cost ~(headroom-1) extra kernel time."""
        self.model = model
        self.params = params
        self.integrator = integrator
        self.skin = float(skin)
        self.steps_per_block = int(steps_per_block)
        self.r_max = float(model.r_max)
        assert nl_backend in ("host", "device")
        assert integration in ("block", "host")
        assert not (integration == "host" and nl_backend == "device"), (
            "integration='host' pairs with nl_backend='host'"
        )
        self.nl_backend = nl_backend
        self.integration = integration
        self.edge_headroom = float(edge_headroom)

        data = from_dict(dict(frame))
        assert _keys.ATOM_TYPE_KEY in data, "frame must carry atom_types"
        self._frame = data
        n = data[_keys.POSITIONS_KEY].shape[0]
        if masses is None:
            masses = np.ones(n)
        self._build_neighborlist()
        if nl_backend == "device":
            self._setup_device_nl()
        self._dtype = self._batch[_keys.POSITIONS_KEY].dtype
        self.masses = jnp.asarray(masses, dtype=self._dtype)

        self._compiled_block = None
        self.step_count = 0

    # ------------------------------------------------------------------
    def _build_neighborlist(self):
        data = dict(self._frame)
        data = compute_neighborlist_(data, self.r_max + self.skin)
        batch = batched_from_list([data])
        self._n = batch[_keys.POSITIONS_KEY].shape[0]
        e = batch[_keys.EDGE_INDEX_KEY].shape[1]
        cap_n = round_up(self._n, 128)
        if getattr(self, "_cap", None) is None:
            # headroom on the FIRST build: skin rebuilds at finite temperature
            # fluctuate the edge count by far more than a rounding slack, and
            # outgrowing the capacity forces a full recompile mid-run
            cap_e = round_up(int(e * self.edge_headroom), 256)
        else:
            cap_e = round_up(e, 256)
        if getattr(self, "_cap", None) is None or cap_n > self._cap[0] or cap_e > self._cap[1]:
            if getattr(self, "_cap", None) is not None:
                # grow with fresh headroom: one recompile, not one per rebuild
                cap_e = round_up(int(e * self.edge_headroom), 256)
                log.warning(
                    f"MD edge capacity outgrown ({e} > {self._cap[1]}): "
                    f"re-padding to {cap_e} and recompiling"
                )
            self._cap = (cap_n, cap_e)
            self._compiled_block = None  # capacity change forces recompile
        padded = pad_batch(batch, self._cap[0], self._cap[1], 2)
        self._batch = self._with_layouts(to_device(padded))
        self._nl_pos = np.asarray(self._frame[_keys.POSITIONS_KEY])

    def _with_layouts(self, batch: dict) -> dict:
        """Attach precomputed fused-kernel edge layouts (pallas models only):
        the dst-sort/tile-align prep then runs once per NL rebuild instead of
        on every force call (``ops/pallas/tp_scatter.py attach_edge_layouts``)."""
        tp_impl = str(
            getattr(self.model, "model_config", {}).get("tp_impl", "xla")
        )
        if not tp_impl.startswith("pallas"):
            return batch
        from ..ops.pallas.tp_scatter import attach_edge_layouts

        return attach_edge_layouts(batch)

    def _block_fn(self):
        if self._compiled_block is None:
            pad_n = self._cap[0]
            n = self._n

            # the neighborlist rides in as a TRACED argument (batch_rest), not
            # a closure: same-capacity skin rebuilds then reuse the compiled
            # block with fresh edges (a closure would silently pin the edges
            # from compile time)
            def force_fn(pos_real, batch_rest):
                pad = jnp.zeros((pad_n - n, 3), dtype=pos_real.dtype)
                d = dict(batch_rest)
                d[_keys.POSITIONS_KEY] = jnp.concatenate([pos_real, pad])
                out = self.model(self.params, d)
                return out[_keys.FORCE_KEY][:n].astype(pos_real.dtype)

            def block(state, batch_rest):
                step = self.integrator.make_step(
                    lambda pos: force_fn(pos, batch_rest), self.masses
                )
                return jax.lax.fori_loop(
                    0, self.steps_per_block, lambda i, s: step(s), state
                )

            def energy_fn(pos_real, batch_rest):
                pad = jnp.zeros((pad_n - n, 3), dtype=pos_real.dtype)
                d = dict(batch_rest)
                d[_keys.POSITIONS_KEY] = jnp.concatenate([pos_real, pad])
                out = self.model(self.params, d)
                return out[_keys.TOTAL_ENERGY_KEY].reshape(-1)[0]

            self._compiled_block = jax.jit(block)
            self._force_fn = jax.jit(force_fn)
            self._energy_fn = jax.jit(energy_fn)
        return self._compiled_block

    @property
    def _batch_rest(self):
        return {k: v for k, v in self._batch.items() if k != _keys.POSITIONS_KEY}

    # ------------------------------------------------------------------
    # on-device neighborlist rebuilds (nl_backend="device")
    # ------------------------------------------------------------------
    def _setup_device_nl(self):
        """Size the device cell list from the initial host build, then repad
        the batch to the device layout (edge capacity = n * k_max)."""
        from functools import partial

        from ..ops.device_nl import device_neighbor_list, suggest_grid_dims

        cell = np.asarray(self._frame[_keys.CELL_KEY]).reshape(3, 3)
        pbc = np.asarray(self._frame.get(_keys.PBC_KEY, np.ones(3, bool))).reshape(-1)
        assert pbc.all(), "device NL rebuilds require a fully periodic box"
        r_build = self.r_max + self.skin
        dims = suggest_grid_dims(cell, r_build)

        # caps from the observed initial neighborlist, with headroom
        ei = np.asarray(self._batch[_keys.EDGE_INDEX_KEY])
        em = np.asarray(self._batch[_keys.EDGE_MASK_KEY])
        per_atom = np.bincount(ei[0][em], minlength=self._n)
        k_max = int(round_up(int(per_atom.max() * 1.25) + 1, 8))
        inv = np.linalg.inv(cell)
        fw = (np.asarray(self._frame[_keys.POSITIONS_KEY]) @ inv) % 1.0
        cid = tuple((np.clip((fw[:, i] * dims[i]).astype(int), 0, dims[i] - 1)) for i in range(3))
        flat = (cid[0] * dims[1] + cid[1]) * dims[2] + cid[2]
        cell_cap = int(round_up(int(np.bincount(flat).max() * 1.5) + 1, 4))

        self._nl_fn_raw = partial(
            device_neighbor_list,
            cell=jnp.asarray(cell, self._batch[_keys.POSITIONS_KEY].dtype),
            r_max=r_build,
            grid_dims=dims,
            cell_cap=cell_cap,
            k_max=k_max,
        )
        self._nl_fn = jax.jit(self._nl_fn_raw)
        # repad the batch to the device edge layout (capacity = n * k_max,
        # always >= the host edge count) so rebuilds swap same-shape arrays
        cap_e = self._n * k_max
        if cap_e != self._cap[1]:
            self._cap = (self._cap[0], cap_e)
            self._compiled_block = None
            self._build_neighborlist()  # repads the host NL to the new cap
        self._device_rebuild(jnp.asarray(self._frame[_keys.POSITIONS_KEY]))

    def _device_rebuild(self, pos):
        """Swap fresh device-NL edges into the batch (no host round-trip)."""
        edge_index, shifts, mask, overflow = self._nl_fn(pos)
        assert not bool(overflow), (
            "device neighborlist capacity overflow — density rose beyond the "
            "initial headroom; rebuild the MDDriver (or use nl_backend='host')"
        )
        b = dict(self._batch)
        b[_keys.EDGE_INDEX_KEY] = edge_index
        b[_keys.EDGE_CELL_SHIFT_KEY] = shifts.astype(
            self._batch[_keys.EDGE_CELL_SHIFT_KEY].dtype
        )
        b[_keys.EDGE_MASK_KEY] = mask
        self._batch = self._with_layouts(b)
        self._nl_pos = np.asarray(pos)

    # ------------------------------------------------------------------
    def _fused_block_fn(self):
        """Device-NL block with the skin DECISION and rebuild in-graph.

        The whole MD block — integrator steps, max-displacement check,
        conditional cell-list rebuild, force refresh — runs as ONE jitted
        call carrying ``(state, batch_rest, nl_pos, overflow_any)``.  The
        host reads nothing per block (vs. an (N, 3) position readback per
        block previously); the accumulated overflow flag is checked at
        thermo points and at the end.
        """
        if getattr(self, "_fused_block", None) is None:
            self._block_fn()  # ensure _force_fn/_energy_fn exist at current caps
            half_skin2 = (0.5 * self.skin) ** 2
            nl_raw = self._nl_fn_raw
            shift_dtype = self._batch[_keys.EDGE_CELL_SHIFT_KEY].dtype

            def fused(state, batch_rest, nl_pos, overflow_any):
                pad_n = self._cap[0]
                n = self._n

                def force(pos_real, br):
                    pad = jnp.zeros((pad_n - n, 3), dtype=pos_real.dtype)
                    d = dict(br)
                    d[_keys.POSITIONS_KEY] = jnp.concatenate([pos_real, pad])
                    out = self.model(self.params, d)
                    return out[_keys.FORCE_KEY][:n].astype(pos_real.dtype)

                step = self.integrator.make_step(
                    lambda pos: force(pos, batch_rest), self.masses
                )
                state = jax.lax.fori_loop(
                    0, self.steps_per_block, lambda i, s: step(s), state
                )
                pos = state[0]
                disp2 = jnp.max(jnp.sum((pos - nl_pos) ** 2, axis=1))
                need = disp2 > half_skin2

                def rebuild(_):
                    ei, sh, mask, overflow = nl_raw(pos)
                    br = dict(batch_rest)
                    br[_keys.EDGE_INDEX_KEY] = ei
                    br[_keys.EDGE_CELL_SHIFT_KEY] = sh.astype(shift_dtype)
                    br[_keys.EDGE_MASK_KEY] = mask
                    # refresh the precomputed kernel layouts in-graph: the
                    # argsort amortizes over all skin steps until next rebuild
                    br = self._with_layouts(br)
                    return br, pos, overflow

                def keep(_):
                    return dict(batch_rest), nl_pos, jnp.zeros((), bool)

                new_rest, new_nl_pos, overflow = jax.lax.cond(need, rebuild, keep, None)
                # refresh forces when the edge set changed
                forces = jax.lax.cond(
                    need, lambda _: force(pos, new_rest), lambda _: state[2], None
                )
                state = (pos, state[1], forces) + tuple(state[3:])
                return state, new_rest, new_nl_pos, overflow_any | overflow

            from ..utils.global_state import donate_argnums

            self._fused_block = jax.jit(
                fused, donate_argnums=donate_argnums(0, 1, 2, 3)
            )
        return self._fused_block

    def _potential_energy(self, pos, batch_rest=None) -> float:
        br = batch_rest if batch_rest is not None else self._batch_rest
        return float(np.asarray(self._energy_fn(pos, br)))

    @staticmethod
    def _check_overflow(overflow_any) -> None:
        assert not bool(np.asarray(overflow_any)), (
            "device neighborlist capacity overflow — density rose beyond the "
            "initial headroom; rebuild the MDDriver (or use nl_backend='host')"
        )

    def _thermo_row(self, state, batch_rest=None) -> dict:
        pos, vel = state[0], state[1]
        # ASE units (amu, A, eV, time = sqrt(amu A^2/eV)): 0.5 m v^2 is eV
        ke = float(0.5 * np.sum(np.asarray(self.masses)[:, None] * np.asarray(vel) ** 2))
        pe = self._potential_energy(pos, batch_rest)
        n_dof = 3 * self._n
        temp = 2.0 * ke / (n_dof * KB)
        return {
            "step": self.step_count,
            "potential_energy": pe,
            "kinetic_energy": ke,
            "total_energy": pe + ke,
            "temperature_K": temp,
        }

    def _write_xyz_frame(self, fh, state, comment: str):
        pos = np.asarray(state[0])
        types = np.asarray(self._frame[_keys.ATOM_TYPE_KEY]).reshape(-1)
        names = getattr(self.model, "type_names", None) or [
            str(t) for t in range(int(types.max()) + 1)
        ]
        fh.write(f"{self._n}\n{comment}\n")
        for t, (x, y, z) in zip(types, pos):
            fh.write(f"{names[int(t)]} {x:.8f} {y:.8f} {z:.8f}\n")

    def _run_host(self, pos, vel, n_steps, log_every_blocks, traj_path):
        """Host-driven per-step loop (the reference's ASE-calculator MD
        pattern, ``/root/reference/nequip/ase/nequip_calculator.py``), with
        DEVICE-resident state: each step dispatches two tiny jitted
        integrator halves around the one shared jitted force program, and
        fetches a single scalar (the squared skin displacement) — so only
        the force program ever pays a big compile (roughly half the
        time-to-first-step of the jitted block loop), and per-step host
        traffic is one scalar instead of two (N, 3) transfers (490 -> ~210
        ms/step at 23k atoms through the tunnel)."""
        self._block_fn()  # defines _force_fn (jit is lazy: the block program
        # itself is never called on this path, hence never compiled)
        dtype = self._dtype
        half_a_fn, half_b_fn = self.integrator.make_half_steps(self.masses)
        half_a = jax.jit(half_a_fn)

        def half_b_disp(pos_new, carry, forces_new, nl_pos):
            state = half_b_fn(pos_new, carry, forces_new)
            disp2 = jnp.max(jnp.sum((pos_new - nl_pos) ** 2, axis=1))
            return state, disp2

        # disp2 rides in half_b's output so the per-step scalar sync awaits
        # a leaf of the THREADED state (syncing a side program's output does
        # not settle the state handles on this runtime — ROUND5_NOTES)
        half_b = jax.jit(half_b_disp)
        half_skin2 = (0.5 * self.skin) ** 2

        state = (
            pos,
            vel,
            self._force_fn(pos, self._batch_rest),
            jnp.asarray(self.integrator.init_aux(), dtype=dtype),
        )
        nl_pos_dev = jnp.asarray(self._nl_pos, dtype=dtype)
        thermo: List[dict] = []
        traj_fh = open(traj_path, "a") if traj_path is not None else None
        if log_every_blocks:
            thermo.append(self._thermo_row(state))
            if traj_fh:
                self._write_xyz_frame(traj_fh, state, f"step={self.step_count}")
        n_blocks = 0
        for i in range(int(n_steps)):
            pos_new, carry = half_a(state)
            forces_new = self._force_fn(pos_new, self._batch_rest)
            state, disp2 = half_b(pos_new, carry, forces_new, nl_pos_dev)
            self.step_count += 1
            if float(np.asarray(disp2)) > half_skin2:
                self._frame[_keys.POSITIONS_KEY] = np.asarray(state[0])
                # capacity is stable under edge_headroom, so the compiled
                # force program is reused with the re-padded batch
                self._build_neighborlist()
                nl_pos_dev = jnp.asarray(self._nl_pos, dtype=dtype)
                # refresh forces on the new edge set (same convention as the
                # block path's post-rebuild refresh)
                forces_new = self._force_fn(state[0], self._batch_rest)
                state = (state[0], state[1], forces_new) + tuple(state[3:])
            if (i + 1) % self.steps_per_block == 0:
                n_blocks += 1
                if log_every_blocks and n_blocks % log_every_blocks == 0:
                    row = self._thermo_row(state)
                    thermo.append(row)
                    log.info(
                        f"MD step {row['step']}: PE={row['potential_energy']:.6f} "
                        f"KE={row['kinetic_energy']:.6f} T={row['temperature_K']:.1f}K"
                    )
                    if traj_fh:
                        self._write_xyz_frame(
                            traj_fh, state, f"step={self.step_count}"
                        )
        if traj_fh:
            traj_fh.close()
        pos, vel, forces, aux = state
        return {
            "positions": np.asarray(pos),
            "velocities": np.asarray(vel),
            "forces": np.asarray(forces),
            "aux": np.asarray(aux),
            "kinetic_energy": float(
                0.5 * np.sum(np.asarray(self.masses)[:, None] * np.asarray(vel) ** 2)
            ),
            "thermo": thermo,
        }

    def run(
        self,
        n_steps: int,
        velocities: Optional[np.ndarray] = None,
        log_every_blocks: Optional[int] = None,
        traj_path: Optional[str] = None,
    ):
        """Run MD; returns dict with final positions/velocities/forces.

        ``log_every_blocks=k`` records a thermo row (PE/KE/total E/T) every k
        blocks into the returned ``thermo`` list (the LAMMPS-thermo analog for
        the native driver); ``traj_path`` appends an (extended) XYZ frame at
        the same cadence.
        """
        pos = jnp.asarray(self._frame[_keys.POSITIONS_KEY], dtype=self._dtype)
        vel = (
            jnp.asarray(velocities, dtype=self._dtype)
            if velocities is not None
            else jnp.zeros_like(pos)
        )
        if self.integration == "host":
            return self._run_host(
                pos, vel, n_steps, log_every_blocks, traj_path
            )
        block = self._block_fn()
        forces = self._force_fn(pos, self._batch_rest)
        aux = self.integrator.init_aux()
        state = (pos, vel, forces, aux)

        thermo: List[dict] = []
        traj_fh = open(traj_path, "a") if traj_path is not None else None
        n_blocks = 0
        if log_every_blocks:
            thermo.append(self._thermo_row(state))
            if traj_fh:
                self._write_xyz_frame(traj_fh, state, f"step={self.step_count}")

        steps_done = 0
        if self.nl_backend == "device":
            # fully device-resident loop: blocks, skin decision, rebuilds, and
            # force refreshes run in ONE jitted call; the host transfers
            # nothing per block (overflow is checked at sync points only)
            fused = self._fused_block_fn()
            # tree-map: precomputed __edge_layout_* entries are nested dicts
            batch_rest = jax.tree.map(jnp.asarray, self._batch_rest)
            nl_pos = jnp.asarray(self._nl_pos, dtype=self._dtype)
            overflow_any = jnp.zeros((), bool)
            step_sync = os.environ.get("NEQUIP_STEP_SYNC", "1") == "1"
            while steps_done < n_steps:
                state, batch_rest, nl_pos, overflow_any = fused(
                    state, batch_rest, nl_pos, overflow_any
                )
                if step_sync:
                    # one SCALAR sync per block: chaining a dispatch off
                    # in-flight outputs takes a ~20x slower client path on
                    # the measured TPU runtime (ROUND5_NOTES); this also
                    # surfaces NL-capacity overflow promptly.  Never
                    # block_until_ready the whole state here — that fetches
                    # it.  NEQUIP_STEP_SYNC=0 restores free-running blocks.
                    np.asarray(overflow_any)
                steps_done += self.steps_per_block
                self.step_count += self.steps_per_block
                n_blocks += 1
                if log_every_blocks and n_blocks % log_every_blocks == 0:
                    self._check_overflow(overflow_any)
                    row = self._thermo_row(state, batch_rest)
                    thermo.append(row)
                    log.info(
                        f"MD step {row['step']}: PE={row['potential_energy']:.6f} "
                        f"KE={row['kinetic_energy']:.6f} T={row['temperature_K']:.1f}K"
                    )
                    if traj_fh:
                        self._write_xyz_frame(traj_fh, state, f"step={self.step_count}")
            self._check_overflow(overflow_any)
            # persist the final edge state for subsequent run() calls
            self._batch = {**self._batch, **{k: v for k, v in batch_rest.items()}}
            self._nl_pos = np.asarray(nl_pos)
        else:
            while steps_done < n_steps:
                state = block(state, self._batch_rest)
                steps_done += self.steps_per_block
                self.step_count += self.steps_per_block
                n_blocks += 1
                if log_every_blocks and n_blocks % log_every_blocks == 0:
                    row = self._thermo_row(state)
                    thermo.append(row)
                    log.info(
                        f"MD step {row['step']}: PE={row['potential_energy']:.6f} "
                        f"KE={row['kinetic_energy']:.6f} T={row['temperature_K']:.1f}K"
                    )
                    if traj_fh:
                        self._write_xyz_frame(traj_fh, state, f"step={self.step_count}")
                # skin check (host): rebuild NL when needed
                cur = np.asarray(state[0])
                disp = np.linalg.norm(cur - self._nl_pos, axis=1).max()
                if disp > 0.5 * self.skin:
                    self._frame[_keys.POSITIONS_KEY] = cur
                    self._build_neighborlist()
                    block = self._block_fn()
                    forces = self._force_fn(state[0], self._batch_rest)
                    state = (state[0], state[1], forces, state[3])
        if traj_fh:
            traj_fh.close()
        pos, vel, forces, aux = state
        return {
            "positions": np.asarray(pos),
            "velocities": np.asarray(vel),
            "forces": np.asarray(forces),
            "aux": np.asarray(aux),
            "kinetic_energy": float(
                0.5 * np.sum(np.asarray(self.masses)[:, None] * np.asarray(vel) ** 2)
            ),
            "thermo": thermo,
        }
