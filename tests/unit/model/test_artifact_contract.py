"""Conformance gate for the deployment artifact contract.

``docs/artifact_format.md`` is the documented contract an external consumer
(C++ pair style, serving loader) is written against;
``validate_artifact`` is its machine-checkable half.  Analog of the
reference's AOTI metadata contract
(``/root/reference/nequip/utils/aoti_metadata.py``,
``scripts/_compile_utils.py:13-30``).
"""

import json
import zipfile

import numpy as np
import pytest

from nequip_tpu.data import _keys, compute_neighborlist_, from_dict, pad_batch
from nequip_tpu.model import NequIPGNNModel, save_compiled_model, validate_artifact


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    model = NequIPGNNModel(
        seed=0,
        model_dtype="float32",
        type_names=["Cu"],
        r_max=4.0,
        num_layers=2,
        l_max=1,
        parity=False,
        num_features=8,
        avg_num_neighbors=12.0,
    )
    params = model.init_params()
    rng = np.random.RandomState(0)
    frame = from_dict(
        {
            _keys.POSITIONS_KEY: rng.uniform(0, 5.0, (16, 3)),
            _keys.CELL_KEY: np.diag([5.0] * 3),
            _keys.PBC_KEY: np.array([True] * 3),
            _keys.ATOM_TYPE_KEY: np.zeros(16, dtype=int),
        }
    )
    frame = compute_neighborlist_(frame, 4.0)
    examples = [
        {k: np.asarray(v) for k, v in pad_batch(frame, nn, ne, 2).items()}
        for nn, ne in ((32, 768), (64, 1536))
    ]
    path = str(tmp_path_factory.mktemp("artifact") / "m.nequip_tpu.zip")
    save_compiled_model(path, model, params, examples, target="ase")
    return path


def _mutate(src, dst, fn):
    """Copy the zip, applying fn(name, bytes) -> bytes-or-None (drop)."""
    with zipfile.ZipFile(src) as z_in, zipfile.ZipFile(dst, "w") as z_out:
        for zi in z_in.infolist():
            data = fn(zi.filename, z_in.read(zi.filename))
            if data is not None:
                z_out.writestr(zi.filename, data)


def test_valid_artifact_passes(artifact):
    md = validate_artifact(artifact)
    assert md["target"] == "ase"
    assert len(md["capacity_ladder"]) == 2
    assert md["capacities"] == md["capacity_ladder"][0]


def test_missing_member_rejected(artifact, tmp_path):
    bad = str(tmp_path / "no_params.zip")
    _mutate(artifact, bad, lambda n, b: None if n == "params.pkl" else b)
    with pytest.raises(ValueError, match="params.pkl"):
        validate_artifact(bad)


def test_future_format_version_rejected(artifact, tmp_path):
    def fn(name, data):
        if name == "metadata.json":
            md = json.loads(data)
            md["format_version"] = 99
            return json.dumps(md)
        return data

    bad = str(tmp_path / "future.zip")
    _mutate(artifact, bad, fn)
    with pytest.raises(ValueError, match="format_version 99"):
        validate_artifact(bad)


def test_metadata_key_types_enforced(artifact, tmp_path):
    def fn(name, data):
        if name == "metadata.json":
            md = json.loads(data)
            md["capacities"] = "lots"
            return json.dumps(md)
        return data

    bad = str(tmp_path / "badtype.zip")
    _mutate(artifact, bad, fn)
    with pytest.raises(ValueError, match="capacities"):
        validate_artifact(bad)


def test_ladder_order_enforced(artifact, tmp_path):
    def fn(name, data):
        if name == "metadata.json":
            md = json.loads(data)
            md["capacity_ladder"] = md["capacity_ladder"][::-1]
            return json.dumps(md)
        return data

    bad = str(tmp_path / "unsorted.zip")
    _mutate(artifact, bad, fn)
    with pytest.raises(ValueError, match="ascending|capacity_ladder"):
        validate_artifact(bad)


def test_missing_rung_file_rejected(artifact, tmp_path):
    bad = str(tmp_path / "norung.zip")
    _mutate(artifact, bad, lambda n, b: None if n == "exported_1.bin" else b)
    with pytest.raises(ValueError, match="exported_1.bin"):
        validate_artifact(bad)


def test_capacity_shape_mismatch_rejected(artifact, tmp_path):
    """Metadata lying about capacities is caught against the StableHLO avals."""

    def fn(name, data):
        if name == "metadata.json":
            md = json.loads(data)
            for caps in md["capacity_ladder"]:
                caps["n_nodes"] += 128
            md["capacities"] = md["capacity_ladder"][0]
            return json.dumps(md)
        return data

    bad = str(tmp_path / "liar.zip")
    _mutate(artifact, bad, fn)
    with pytest.raises(ValueError, match="leading dim|shape"):
        validate_artifact(bad)
