"""Deployment-pipeline gates: checkpoint -> compile -> calculator -> MD,
and checkpoint -> package -> reload parity.

Ports of the reference's compile/package integration coverage
(``tests/integration/test_package_commands.py``, the AOTI self-check in
``utils/aot.py:89-103``, and the ASE-calculator path).
"""

import os

import numpy as np
import jax
import pytest
import yaml

from nequip_tpu.data import _keys
from nequip_tpu.scripts.train import run_config

CONFIG_PATH = os.path.join(os.path.dirname(__file__), "lj_config.yaml")


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("deploy")
    with open(CONFIG_PATH) as f:
        cfg = yaml.safe_load(f)
    cfg["trainer"]["ckpt_dir"] = str(tmpdir / "ckpt")
    cfg["trainer"]["max_epochs"] = 1
    run_config(cfg)
    return os.path.join(str(tmpdir / "ckpt"), "last.ckpt"), tmpdir


def test_model_from_checkpoint(ckpt):
    from nequip_tpu.model import ModelFromCheckpoint

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    assert model.metadata["type_names"] == "Cu"
    assert float(model.metadata["r_max"]) == 4.0
    n_leaves = len(jax.tree.leaves(params))
    assert n_leaves > 5


def test_compile_and_calculator(ckpt):
    from nequip_tpu.scripts.compile import main as compile_main
    from nequip_tpu.integrations import NequIPCalculator
    from nequip_tpu.data.dataset import LJTestDataset

    path, tmpdir = ckpt
    artifact = str(tmpdir / "model.nequip_tpu.zip")
    compile_main([path, artifact, "--target", "ase"])
    assert os.path.exists(artifact)

    calc = NequIPCalculator.from_compiled_model(artifact, chemical_symbols=["Cu"])
    ds = LJTestDataset(num_frames=1, seed=77)
    frame = {
        k: v
        for k, v in ds.frames[0].items()
        if k in (_keys.POSITIONS_KEY, _keys.ATOMIC_NUMBERS_KEY, _keys.CELL_KEY, _keys.PBC_KEY)
    }
    results = calc.calculate(frame)
    assert np.isfinite(results["energy"])
    assert results["forces"].shape == (32, 3)
    assert results["stress"].shape == (3, 3)
    # compiled artifact agrees with the eager model through the calculator
    calc_eager = NequIPCalculator.from_saved_model(
        path, chemical_symbols=["Cu"], capacities=calc.capacities
    )
    results_e = calc_eager.calculate(frame)
    np.testing.assert_allclose(results["energy"], results_e["energy"], rtol=1e-10)
    np.testing.assert_allclose(results["forces"], results_e["forces"], atol=1e-10)


def test_package_roundtrip(ckpt):
    from nequip_tpu.scripts.package import main as package_main
    from nequip_tpu.model import ModelFromCheckpoint, ModelFromPackage

    path, tmpdir = ckpt
    pkg = str(tmpdir / "model_pkg.zip")
    package_main(["build", path, pkg])
    assert os.path.exists(pkg)
    package_main(["info", pkg])

    m1, p1 = ModelFromCheckpoint(path)
    m2, p2 = ModelFromPackage(pkg)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert m1.metadata == m2.metadata

    # fine-tuning-config resolvers read the archive metadata
    from nequip_tpu.utils.config import resolve

    assert resolve("${type_names_from_package:" + pkg + "}") == ["Cu"]
    assert resolve("${cutoff_radius_from_package:" + pkg + "}") == 4.0

    # update re-emits under the current version and self-checks predictions
    pkg2 = str(tmpdir / "model_pkg_updated.zip")
    package_main(["update", pkg, pkg2])
    m3, p3 = ModelFromPackage(pkg2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_md_driver(ckpt):
    from nequip_tpu.model import ModelFromCheckpoint
    from nequip_tpu.integrations import MDDriver, NoseHoover, VelocityVerlet
    from nequip_tpu.data.dataset import LJTestDataset

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(num_frames=1, seed=88)
    frame = {
        _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
        _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.ATOM_TYPE_KEY: np.zeros(32, dtype=int),
    }
    driver = MDDriver(
        model,
        params,
        frame,
        integrator=NoseHoover(dt_fs=1.0, temperature_K=300.0),
        masses=np.full(32, 63.5),
        steps_per_block=5,
    )
    out = driver.run(10)
    assert np.all(np.isfinite(out["positions"]))
    assert np.all(np.isfinite(out["forces"]))
    # thermostat injects kinetic energy starting from zero velocities
    assert out["kinetic_energy"] > 0
    assert not np.allclose(out["positions"], frame[_keys.POSITIONS_KEY])


def test_modify_per_type_scale_shift(ckpt):
    from nequip_tpu.model import ModelFromCheckpoint, modify
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data import compute_neighborlist_, batched_from_list, pad_batch, to_device
    from nequip_tpu.data.transforms import ChemicalSpeciesToAtomTypeMapper

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(
        num_frames=1, seed=99, transforms=[ChemicalSpeciesToAtomTypeMapper(["Cu"])]
    )
    data = to_device(
        pad_batch(
            batched_from_list([compute_neighborlist_(ds[0], 4.0)]), 128, 1024, 2
        )
    )
    fwd = jax.jit(lambda p, d: model(p, d)[_keys.TOTAL_ENERGY_KEY])
    e0 = float(fwd(params, data)[0, 0])

    # locate the current Cu shift so we can predict the exact energy change
    def find_shift(tree):
        for k, v in tree.items():
            if k == "per_type_energy_scale_shift":
                return float(np.asarray(v["shifts"]).reshape(-1)[0])
            if isinstance(v, dict):
                r = find_shift(v)
                if r is not None:
                    return r
        return None

    old_shift = find_shift(params)
    assert old_shift is not None

    model, params = modify(
        model, params, [{"modifier": "modify_PerTypeScaleShift", "shifts": {"Cu": 10.0}}]
    )
    e1 = float(fwd(params, data)[0, 0])
    # the shift is REPLACED: 32 atoms x (10 - old_shift)
    np.testing.assert_allclose(e1 - e0, 32 * (10.0 - old_shift), rtol=1e-9)


def test_bf16_fast_mode_modifier(ckpt):
    """bf16 'fast MD' mode: hot weights flip to bf16, forces stay accurate."""
    import jax.numpy as jnp

    from nequip_tpu.model import ModelFromCheckpoint, modify
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data import compute_neighborlist_, batched_from_list, pad_batch, to_device
    from nequip_tpu.data.transforms import ChemicalSpeciesToAtomTypeMapper

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(
        num_frames=1, seed=7, transforms=[ChemicalSpeciesToAtomTypeMapper(["Cu"])]
    )
    data = to_device(
        pad_batch(
            batched_from_list([compute_neighborlist_(ds[0], 4.0)]), 128, 1024, 2
        )
    )
    f_ref = np.asarray(jax.jit(model)(params, data)[_keys.FORCE_KEY], dtype=np.float64)

    model16, params16 = modify(model, params, [{"modifier": "enable_bf16_fast_mode"}])
    # activations now flow in bf16 (master weights stay high-precision and
    # are cast at apply time — XLA fuses the cast into the matmuls)
    assert model16.metadata["model_dtype"] == "bfloat16"
    out = jax.jit(model16)(params16, data)
    f16 = np.asarray(out[_keys.FORCE_KEY], dtype=np.float64)
    scale = np.abs(f_ref).max()
    assert scale > 0
    # bf16 has ~3 decimal digits; forces should agree to ~1% of the force scale
    assert np.abs(f16 - f_ref).max() < 0.02 * scale, (
        np.abs(f16 - f_ref).max(), scale
    )

    # round-trip back to float32 recovers near-exact numerics
    model32, params32 = modify(
        model16, params16, [{"modifier": "modify_model_dtype", "model_dtype": "float32"}]
    )
    f32 = np.asarray(jax.jit(model32)(params32, data)[_keys.FORCE_KEY], dtype=np.float64)
    assert np.abs(f32 - f_ref).max() < 0.02 * scale


def test_md_skin_rebuild_uses_fresh_edges(ckpt):
    """Regression: after a same-capacity skin rebuild, the jitted MD block
    must see the NEW neighborlist (edges ride in as traced arguments, not
    compile-time closures)."""
    from nequip_tpu.model import ModelFromCheckpoint
    from nequip_tpu.integrations import MDDriver, VelocityVerlet
    from nequip_tpu.data.dataset import LJTestDataset
    from nequip_tpu.data import compute_neighborlist_, batched_from_list, pad_batch, to_device

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(num_frames=1, seed=17)
    frame = {
        _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
        _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.ATOM_TYPE_KEY: np.zeros(32, dtype=int),
    }
    # tiny skin -> a rebuild after every block
    driver = MDDriver(
        model, params, frame,
        integrator=VelocityVerlet(dt_fs=2.0),
        masses=np.full(32, 63.5),
        skin=1e-6,
        steps_per_block=5,
    )
    r = np.random.RandomState(0)
    out = driver.run(15, velocities=0.02 * r.standard_normal((32, 3)))

    # fresh from-scratch forces at the final positions must match the
    # driver's last in-loop forces exactly (same NL cutoff r_max + skin)
    from nequip_tpu.data import from_dict

    f2 = from_dict(dict(frame))
    f2[_keys.POSITIONS_KEY] = out["positions"]
    data = compute_neighborlist_(f2, float(model.r_max) + driver.skin)
    cap_n, cap_e = driver._cap
    batch = to_device(pad_batch(batched_from_list([data]), cap_n, cap_e, 2))
    fresh = np.asarray(jax.jit(model)(params, batch)[_keys.FORCE_KEY])[:32]
    np.testing.assert_allclose(out["forces"], fresh, rtol=1e-8, atol=1e-10)


def test_md_device_nl_backend_matches_host(ckpt):
    """nl_backend="device": device-resident skin rebuilds reproduce the host
    backend's trajectory (identical edge sets; only summation order differs)."""
    from nequip_tpu.model import ModelFromCheckpoint
    from nequip_tpu.integrations import MDDriver, VelocityVerlet
    from nequip_tpu.data.dataset import LJTestDataset

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    # box must be >= 3 grid cells (> 12 A) thick for the device cell list
    ds = LJTestDataset(supercell=(4, 4, 4), num_frames=1, seed=31)
    n = ds.frames[0][_keys.POSITIONS_KEY].shape[0]
    frame = {
        _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
        _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.ATOM_TYPE_KEY: np.zeros(n, dtype=int),
    }
    r = np.random.RandomState(3)
    v0 = 0.02 * r.standard_normal((n, 3))

    outs = {}
    for backend in ("host", "device"):
        driver = MDDriver(
            model, params, dict(frame),
            integrator=VelocityVerlet(dt_fs=2.0),
            masses=np.full(n, 63.5),
            skin=1e-6,  # rebuild after every block -> exercises both paths
            steps_per_block=5,
            nl_backend=backend,
        )
        outs[backend] = driver.run(15, velocities=v0.copy())

    np.testing.assert_allclose(
        outs["device"]["positions"], outs["host"]["positions"], atol=1e-9
    )
    np.testing.assert_allclose(
        outs["device"]["forces"], outs["host"]["forces"], atol=1e-8
    )


def test_md_thermo_and_trajectory(ckpt, tmp_path):
    """Thermo rows (PE/KE/E/T) and XYZ trajectory at a block cadence."""
    from nequip_tpu.model import ModelFromCheckpoint
    from nequip_tpu.integrations import MDDriver, NoseHoover
    from nequip_tpu.data.dataset import LJTestDataset

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(num_frames=1, seed=55)
    frame = {
        _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
        _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.ATOM_TYPE_KEY: np.zeros(32, dtype=int),
    }
    traj = str(tmp_path / "traj.xyz")
    driver = MDDriver(
        model, params, frame,
        integrator=NoseHoover(dt_fs=1.0, temperature_K=300.0),
        masses=np.full(32, 63.5),
        steps_per_block=5,
    )
    # Maxwell-Boltzmann init: the first thermo row must report the exact
    # sampled temperature (2 KE / (3 N kB) by construction)
    from nequip_tpu.integrations import maxwell_boltzmann_velocities

    v0 = maxwell_boltzmann_velocities(np.full(32, 63.5), 300.0, seed=4)
    ke0 = 0.5 * np.sum(63.5 * v0**2)
    t_sampled = 2 * ke0 / (3 * 32 * 8.617330337217213e-05)
    assert 150 < t_sampled < 450  # sampling noise at N=32
    out = driver.run(15, log_every_blocks=1, traj_path=traj, velocities=v0)
    np.testing.assert_allclose(
        out["thermo"][0]["temperature_K"], t_sampled, rtol=1e-10
    )

    # initial row + one per block
    assert len(out["thermo"]) == 4
    for row in out["thermo"]:
        assert np.isfinite(row["potential_energy"])
        assert row["total_energy"] == pytest.approx(
            row["potential_energy"] + row["kinetic_energy"]
        )
        assert row["temperature_K"] >= 0
    assert [r["step"] for r in out["thermo"]] == [0, 5, 10, 15]

    with open(traj) as f:
        lines = f.read().strip().splitlines()
    # 4 frames x (2 header lines + 32 atoms)
    assert len(lines) == 4 * 34
    assert lines[0] == "32" and lines[2].startswith("Cu ")


def test_package_durability(ckpt, tmp_path):
    """Archives intern the source tree; format versions are gated by a
    compat table; schema drift fails with an actionable snapshot hint.

    Parity: torch.package code interning + format-version log
    (``/root/reference/nequip/scripts/package.py:52-64``).
    """
    import json
    import zipfile

    import pytest

    from nequip_tpu.model import ModelFromPackage
    from nequip_tpu.scripts.package import main as package_main

    path, _ = ckpt
    pkg = str(tmp_path / "pkg.zip")
    package_main(["build", path, pkg])

    # 1. the archive interns the source tree and extract-code restores it
    with zipfile.ZipFile(pkg) as zf:
        assert "code_snapshot.zip" in zf.namelist()
    out_dir = str(tmp_path / "code")
    package_main(["extract-code", pkg, out_dir])
    model_src = os.path.join(out_dir, "nequip_tpu", "model", "nequip_models.py")
    assert os.path.exists(model_src)
    assert "NequIPGNNModel" in open(model_src).read()

    # 2. unknown format versions are rejected with the compat table
    bad = str(tmp_path / "bad_fmt.zip")
    with zipfile.ZipFile(pkg) as src, zipfile.ZipFile(bad, "w") as dst:
        for zi in src.infolist():
            data = src.read(zi.filename)
            if zi.filename == "package_metadata.json":
                meta = json.loads(data)
                meta["package_format_version"] = 99
                data = json.dumps(meta)
            dst.writestr(zi.filename, data)
    with pytest.raises(RuntimeError, match="format version 99"):
        ModelFromPackage(bad)

    # 3. builder-schema drift raises an actionable error naming the snapshot
    drift = str(tmp_path / "drift.zip")
    with zipfile.ZipFile(pkg) as src, zipfile.ZipFile(drift, "w") as dst:
        for zi in src.infolist():
            data = src.read(zi.filename)
            if zi.filename == "model_config.json":
                cfg = json.loads(data)
                cfg["an_argument_from_the_future"] = 1
                data = json.dumps(cfg)
            dst.writestr(zi.filename, data)
    with pytest.raises(RuntimeError, match="extract-code"):
        ModelFromPackage(drift)


def test_capacity_ladder_export(ckpt, tmp_path):
    """A growing system crosses a capacity rung without re-export.

    The ladder is the static-shape closure of the reference's
    bounded-dynamic export (``/root/reference/nequip/scripts/compile.py:266-270``):
    multiple AOT signatures in one artifact, the calculator picks the
    smallest rung that fits.
    """
    from nequip_tpu.scripts.compile import main as compile_main
    from nequip_tpu.integrations import NequIPCalculator
    from nequip_tpu.model.inference_models import load_compiled_model

    path, _ = ckpt
    artifact = str(tmp_path / "ladder.nequip_tpu.zip")
    compile_main([path, artifact, "--target", "ase", "--capacity-ladder", "3"])

    compiled = load_compiled_model(artifact)
    ladder = compiled.capacity_ladder
    assert len(ladder) == 3
    assert [c["n_nodes"] for c in ladder] == sorted(c["n_nodes"] for c in ladder)

    calc = NequIPCalculator.from_compiled_model(artifact, chemical_symbols=["Cu"])
    calc_eager = NequIPCalculator.from_saved_model(path, chemical_symbols=["Cu"])

    def fcc_frame(reps: int) -> dict:
        a = 3.61
        base = (
            np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
        )
        rng = np.random.RandomState(7)
        pos = np.concatenate(
            [
                base + np.array([i, j, k]) * a
                for i in range(reps)
                for j in range(reps)
                for k in range(reps)
            ]
        )
        pos = pos + rng.normal(0, 0.03, pos.shape)
        return {
            _keys.POSITIONS_KEY: pos,
            _keys.CELL_KEY: np.diag([reps * a] * 3),
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOMIC_NUMBERS_KEY: np.full(len(pos), 29),
        }

    # a small frame fits rung 0; a 108-atom frame outgrows rung 0's EDGE
    # capacity (~18 edges/atom at r_max=4) and must walk up the ladder
    small, big = fcc_frame(2), fcc_frame(3)
    n_small = len(small[_keys.POSITIONS_KEY])
    n_big = len(big[_keys.POSITIONS_KEY])
    rung_small = compiled.select_capacities(n_small, 18 * n_small)
    rung_big = compiled.select_capacities(n_big, 18 * n_big)
    assert rung_small == ladder[0]
    assert rung_big is not None and rung_big != ladder[0], (
        f"expected the {n_big}-atom frame to cross a rung: {ladder}"
    )

    for frame, n in ((small, n_small), (big, n_big)):
        res = calc.calculate(frame)
        res_e = calc_eager.calculate(frame)
        assert res["forces"].shape == (n, 3)
        np.testing.assert_allclose(res["energy"], res_e["energy"], rtol=1e-8)
        np.testing.assert_allclose(res["forces"], res_e["forces"], atol=1e-8)

    # beyond the top rung: a clear, actionable error (no silent truncation)
    with pytest.raises(ValueError, match="capacity rung"):
        calc.calculate(fcc_frame(6))


def test_md_host_integration_matches_block(ckpt):
    """integration="host" (per-step host loop, one compiled program — the
    bench md row's mode) reproduces the jitted block loop's trajectory,
    including through skin rebuilds."""
    from nequip_tpu.model import ModelFromCheckpoint
    from nequip_tpu.integrations import MDDriver, NoseHoover
    from nequip_tpu.data.dataset import LJTestDataset

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(supercell=(3, 3, 3), num_frames=1, seed=31)
    n = ds.frames[0][_keys.POSITIONS_KEY].shape[0]
    frame = {
        _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
        _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.ATOM_TYPE_KEY: np.zeros(n, dtype=int),
    }
    r = np.random.RandomState(3)
    v0 = 0.02 * r.standard_normal((n, 3))

    outs = {}
    for integration in ("block", "host"):
        driver = MDDriver(
            model, params, dict(frame),
            # NoseHoover: exercises the aux (bath) variable and the jnp
            # reductions in its step on the host path
            integrator=NoseHoover(dt_fs=2.0, temperature_K=300.0),
            masses=np.full(n, 63.5),
            skin=1e-6,  # rebuild every step/block: exercises repadding
            steps_per_block=5,
            integration=integration,
        )
        outs[integration] = driver.run(10, velocities=v0.copy())
        assert driver.step_count == 10

    np.testing.assert_allclose(
        outs["host"]["positions"], outs["block"]["positions"], atol=1e-9
    )
    np.testing.assert_allclose(
        outs["host"]["forces"], outs["block"]["forces"], atol=1e-8
    )
    np.testing.assert_allclose(
        outs["host"]["aux"], outs["block"]["aux"], atol=1e-10
    )


def test_md_edge_headroom_absorbs_rebuild_growth(ckpt):
    """The first NL build over-allocates edge capacity (edge_headroom) so a
    denser rebuild re-pads into the SAME capacity (no recompile); a rebuild
    that outgrows even the headroom grows the cap WITH fresh headroom."""
    from nequip_tpu.model import ModelFromCheckpoint
    from nequip_tpu.integrations import MDDriver, VelocityVerlet
    from nequip_tpu.data.dataset import LJTestDataset

    path, _ = ckpt
    model, params = ModelFromCheckpoint(path)
    ds = LJTestDataset(supercell=(3, 3, 3), num_frames=1, seed=31)
    n = ds.frames[0][_keys.POSITIONS_KEY].shape[0]
    frame = {
        _keys.POSITIONS_KEY: ds.frames[0][_keys.POSITIONS_KEY],
        _keys.CELL_KEY: ds.frames[0][_keys.CELL_KEY],
        _keys.PBC_KEY: np.array([True] * 3),
        _keys.ATOM_TYPE_KEY: np.zeros(n, dtype=int),
    }
    driver = MDDriver(
        model, params, dict(frame),
        integrator=VelocityVerlet(dt_fs=1.0),
        masses=np.full(n, 63.5),
        skin=0.5,
        edge_headroom=1.1,
    )
    cap0 = driver._cap
    e0 = int(np.asarray(driver._batch[_keys.EDGE_MASK_KEY]).sum())
    assert cap0[1] >= 1.1 * e0 - 256  # headroom applied at first build

    # same-density rebuild: capacity unchanged, compiled program kept
    driver._block_fn()
    block0 = driver._compiled_block
    driver._build_neighborlist()
    assert driver._cap == cap0
    assert driver._compiled_block is block0

    # compress the box ~10% (linear) -> ~35% more edges: outgrows the 1.1x
    # headroom, so the cap must GROW (with fresh headroom) and recompile
    driver._frame[_keys.CELL_KEY] = 0.9 * np.asarray(driver._frame[_keys.CELL_KEY])
    driver._frame[_keys.POSITIONS_KEY] = 0.9 * np.asarray(
        driver._frame[_keys.POSITIONS_KEY]
    )
    driver._build_neighborlist()
    e1 = int(np.asarray(driver._batch[_keys.EDGE_MASK_KEY]).sum())
    assert e1 > 1.1 * e0
    assert driver._cap[1] >= 1.1 * e1 - 256
    assert driver._compiled_block is None  # recompile signalled once
