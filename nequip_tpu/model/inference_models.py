"""Compiled inference artifacts: save/load.

TPU-native replacement for the reference's TorchScript / AOTInductor
deployment artifacts (``/root/reference/nequip/model/inference_models/``):
the model (with parameters baked in) is AOT-exported via ``jax.export`` to a
serialized StableHLO artifact with a JSON metadata sidecar, all inside one
zip.  The eager fallback (model config + params) is embedded too, so the
artifact remains loadable on platforms the StableHLO wasn't lowered for.

Artifact layout (``*.nequip_tpu.zip``):
    metadata.json   — format version, model metadata (r_max, type names,
                      dtype, per-edge-type cutoffs), static capacities,
                      ordered input/output field names, lowering platform
    exported.bin    — serialized jax.export artifact (may be absent in
                      eager-only mode)
    model_config.json, params.pkl — eager fallback
"""

from __future__ import annotations

import json
import pickle
import zipfile
from typing import Dict, List, Optional, Sequence

import numpy as np

FORMAT_VERSION = 1

# target presets: which fields the artifact consumes/produces
# (parity: /root/reference/nequip/scripts/_compile_utils.py:9-106)
from ..data import _keys

TARGET_INPUT_FIELDS = {
    "ase": [
        _keys.POSITIONS_KEY,
        _keys.EDGE_INDEX_KEY,
        _keys.EDGE_CELL_SHIFT_KEY,
        _keys.CELL_KEY,
        _keys.ATOM_TYPE_KEY,
        _keys.BATCH_KEY,
        _keys.NUM_NODES_KEY,
        _keys.NODE_MASK_KEY,
        _keys.EDGE_MASK_KEY,
        _keys.FRAME_MASK_KEY,
    ],
    "batch": [
        _keys.POSITIONS_KEY,
        _keys.EDGE_INDEX_KEY,
        _keys.EDGE_CELL_SHIFT_KEY,
        _keys.CELL_KEY,
        _keys.ATOM_TYPE_KEY,
        _keys.BATCH_KEY,
        _keys.NUM_NODES_KEY,
        _keys.NODE_MASK_KEY,
        _keys.EDGE_MASK_KEY,
        _keys.FRAME_MASK_KEY,
    ],
    "pair_nequip": [
        _keys.EDGE_VECTORS_KEY,
        _keys.EDGE_INDEX_KEY,
        _keys.ATOM_TYPE_KEY,
        _keys.BATCH_KEY,
        _keys.NUM_NODES_KEY,
        _keys.NODE_MASK_KEY,
        _keys.EDGE_MASK_KEY,
        _keys.FRAME_MASK_KEY,
    ],
}
TARGET_OUTPUT_FIELDS = {
    "ase": [
        _keys.TOTAL_ENERGY_KEY,
        _keys.PER_ATOM_ENERGY_KEY,
        _keys.FORCE_KEY,
        _keys.STRESS_KEY,
        _keys.VIRIAL_KEY,
    ],
    "batch": [
        _keys.TOTAL_ENERGY_KEY,
        _keys.PER_ATOM_ENERGY_KEY,
        _keys.FORCE_KEY,
        _keys.STRESS_KEY,
        _keys.VIRIAL_KEY,
    ],
    "pair_nequip": [
        _keys.TOTAL_ENERGY_KEY,
        _keys.PER_ATOM_ENERGY_KEY,
        _keys.EDGE_FORCE_KEY,
    ],
}


def _caps_of(example_batch: Dict[str, np.ndarray]) -> Dict[str, int]:
    return {
        "n_nodes": int(example_batch[_keys.POSITIONS_KEY].shape[0])
        if _keys.POSITIONS_KEY in example_batch
        else int(example_batch[_keys.EDGE_VECTORS_KEY].shape[0]),
        "n_edges": int(example_batch[_keys.EDGE_INDEX_KEY].shape[1]),
        "n_frames": int(example_batch[_keys.NUM_NODES_KEY].shape[0]),
    }


def save_compiled_model(
    out_path: str,
    model,
    params,
    example_batch,
    target: str = "ase",
    mode: str = "jaxexport",
) -> dict:
    """Export ``model(params, batch)`` restricted to the target's I/O fields.

    ``example_batch`` may be a single padded batch (one static signature) or
    a *list* of padded batches with ascending capacities — a **capacity
    ladder**.  The ladder is the TPU-idiomatic closure of the reference's
    bounded-dynamic export (``/root/reference/nequip/scripts/compile.py:266-270``,
    ``_compile_utils.py:41-91``): instead of one compilation with symbolic
    dim bounds, the artifact carries one AOT signature per rung and the
    calculator pads every system to the smallest rung that fits — so an NPT
    or variable-N simulation that outgrows one capacity moves to the next
    rung without re-export.
    """
    import jax
    from jax import export as jax_export

    batches = (
        list(example_batch) if isinstance(example_batch, (list, tuple))
        else [example_batch]
    )
    base = batches[0]
    input_fields = [k for k in TARGET_INPUT_FIELDS[target] if k in base]
    output_fields = TARGET_OUTPUT_FIELDS[target]

    ladder = [_caps_of(b) for b in batches]
    assert ladder == sorted(ladder, key=lambda c: (c["n_nodes"], c["n_edges"])), (
        "capacity ladder rungs must be ascending"
    )

    def flat_fn(*arrays):
        data = dict(zip(input_fields, arrays))
        out = model(params, data)
        return tuple(out[k] for k in output_fields if k in out)

    # probe eagerly for which outputs exist
    probe = model(params, {k: base[k] for k in input_fields})
    output_fields = [k for k in output_fields if k in probe]

    metadata = {
        "format_version": FORMAT_VERSION,
        "target": target,
        "mode": mode,
        "input_fields": input_fields,
        "output_fields": output_fields,
        "capacities": ladder[0],
        "capacity_ladder": ladder,
        "platform": jax.default_backend(),
        **{k: str(v) for k, v in model.metadata.items()},
    }

    exported_rungs: List[bytes] = []
    if mode == "jaxexport":
        for b in batches:
            arrays = tuple(b[k] for k in input_fields)
            exported = jax_export.export(jax.jit(flat_fn))(*arrays)
            exported_rungs.append(exported.serialize())

    host_params = jax.tree.map(lambda x: np.asarray(x), params)
    with zipfile.ZipFile(out_path, "w") as zf:
        zf.writestr("metadata.json", json.dumps(metadata, indent=2))
        for i, blob in enumerate(exported_rungs):
            # rung 0 keeps the historical name so format-v1 readers load it
            zf.writestr("exported.bin" if i == 0 else f"exported_{i}.bin", blob)
        zf.writestr(
            "model_config.json", json.dumps(getattr(model, "model_config", {}) or {})
        )
        zf.writestr("params.pkl", pickle.dumps(host_params))
    return metadata


class CompiledModel:
    """Loaded inference artifact: callable on a padded host/device dict.

    Multi-rung artifacts (capacity ladder): ``select_capacities`` returns the
    smallest rung that fits a system; ``__call__`` dispatches on the padded
    input's node capacity, so callers pad to a rung and never trigger a
    recompile.
    """

    def __init__(self, path: str):
        import jax

        self.path = path
        with zipfile.ZipFile(path) as zf:
            self.metadata = json.loads(zf.read("metadata.json"))
            ladder = self.metadata.get(
                "capacity_ladder", [self.metadata["capacities"]]
            )
            self._rungs = []  # [(caps, exported)]
            names = zf.namelist()
            for i, caps in enumerate(ladder):
                fname = "exported.bin" if i == 0 else f"exported_{i}.bin"
                if fname not in names:
                    continue
                from jax import export as jax_export

                try:
                    exported = jax_export.deserialize(bytearray(zf.read(fname)))
                except Exception:
                    continue
                self._rungs.append((caps, exported))
            self._model = None
            if not self._rungs:
                from ..utils.config import instantiate
                import jax.numpy as jnp

                cfg = json.loads(zf.read("model_config.json"))
                assert cfg, "artifact has no exported code and no eager fallback"
                self._model = instantiate(cfg, _recursive_=False)
                self._params = jax.tree.map(
                    jnp.asarray, pickle.loads(zf.read("params.pkl"))
                )
                self._fwd = jax.jit(lambda d: self._model(self._params, d))

    @property
    def input_fields(self) -> List[str]:
        return self.metadata["input_fields"]

    @property
    def output_fields(self) -> List[str]:
        return self.metadata["output_fields"]

    @property
    def capacities(self) -> Dict[str, int]:
        """Largest capacities the artifact accepts (top ladder rung)."""
        if self._rungs:
            return self._rungs[-1][0]
        ladder = self.metadata.get("capacity_ladder")
        return ladder[-1] if ladder else self.metadata["capacities"]

    @property
    def capacity_ladder(self) -> List[Dict[str, int]]:
        if self._rungs:
            return [c for c, _ in self._rungs]
        return self.metadata.get("capacity_ladder", [self.metadata["capacities"]])

    def select_capacities(self, n_nodes: int, n_edges: int) -> Optional[Dict[str, int]]:
        """Smallest ladder rung that fits (None if even the top rung can't)."""
        for caps in self.capacity_ladder:
            if n_nodes <= caps["n_nodes"] and n_edges <= caps["n_edges"]:
                return caps
        return None

    def __call__(self, data: Dict) -> Dict:
        import jax.numpy as jnp

        if self._rungs:
            # _caps_of derives n_nodes from the first input field's leading
            # dim (positions, or edge_vectors for the pair target) — match
            # the rung on the same quantity
            n = int(np.asarray(data[self.input_fields[0]]).shape[0])
            for caps, exported in self._rungs:
                if caps["n_nodes"] == n:
                    arrays = tuple(
                        jnp.asarray(data[k]) for k in self.input_fields
                    )
                    outs = exported.call(*arrays)
                    return dict(zip(self.output_fields, outs))
            raise ValueError(
                f"padded input ({n} rows of {self.input_fields[0]}) matches no "
                f"ladder rung {self.capacity_ladder}; pad to a rung from "
                "select_capacities()"
            )
        out = self._fwd({k: jnp.asarray(data[k]) for k in self.input_fields})
        return {k: out[k] for k in self.output_fields if k in out}


def load_compiled_model(path: str) -> CompiledModel:
    """Parity: ``load_compiled_model`` (``inference_models/compiled.py:14-60``)."""
    return CompiledModel(path)


_REQUIRED_METADATA = {
    "format_version": int,
    "target": str,
    "mode": str,
    "input_fields": list,
    "output_fields": list,
    "capacities": dict,
    "platform": str,
    "r_max": str,
    "type_names": str,
    "model_dtype": str,
}


def validate_artifact(path: str) -> dict:
    """Machine-checkable half of the artifact contract (docs/artifact_format.md).

    Raises ``ValueError`` on any violation; returns the parsed metadata.
    This is what an external consumer (C++ pair style, serving loader) can
    rely on — the analog of the reference's AOTI metadata contract
    (``/root/reference/nequip/utils/aoti_metadata.py``).
    """
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        for member in ("metadata.json", "model_config.json", "params.pkl"):
            if member not in names:
                raise ValueError(f"artifact missing required member {member!r}")
        md = json.loads(zf.read("metadata.json"))

        for key, typ in _REQUIRED_METADATA.items():
            if key not in md:
                raise ValueError(f"metadata missing required key {key!r}")
            if not isinstance(md[key], typ):
                raise ValueError(
                    f"metadata key {key!r} must be {typ.__name__}, "
                    f"got {type(md[key]).__name__}"
                )
        if md["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format_version {md['format_version']} is newer than "
                f"this reader ({FORMAT_VERSION})"
            )
        if md["target"] not in TARGET_INPUT_FIELDS:
            raise ValueError(f"unknown target {md['target']!r}")
        if not set(md["input_fields"]) <= set(TARGET_INPUT_FIELDS[md["target"]]):
            raise ValueError(
                f"input_fields {md['input_fields']} not a subset of the "
                f"{md['target']!r} preset"
            )
        if not set(md["output_fields"]) <= set(TARGET_OUTPUT_FIELDS[md["target"]]):
            raise ValueError(
                f"output_fields {md['output_fields']} not a subset of the "
                f"{md['target']!r} preset"
            )

        ladder = md.get("capacity_ladder", [md["capacities"]])
        for caps in ladder:
            for k in ("n_nodes", "n_edges", "n_frames"):
                if not isinstance(caps.get(k), int) or caps[k] <= 0:
                    raise ValueError(f"capacity rung {caps} has invalid {k!r}")
        keyed = [(c["n_nodes"], c["n_edges"]) for c in ladder]
        if keyed != sorted(keyed):
            raise ValueError(f"capacity_ladder must be ascending, got {ladder}")
        if ladder[0] != md["capacities"]:
            raise ValueError("capacities must equal capacity_ladder[0]")

        float(md["r_max"])  # parseable
        if not md["type_names"].split():
            raise ValueError("type_names must name at least one type")

        if md["mode"] == "jaxexport":
            from jax import export as jax_export

            for i, caps in enumerate(ladder):
                fname = "exported.bin" if i == 0 else f"exported_{i}.bin"
                if fname not in names:
                    raise ValueError(
                        f"jaxexport artifact missing rung file {fname!r}"
                    )
                exported = jax_export.deserialize(bytearray(zf.read(fname)))
                avals = list(exported.in_avals)
                if len(avals) != len(md["input_fields"]):
                    raise ValueError(
                        f"rung {i}: exported arity {len(avals)} != "
                        f"{len(md['input_fields'])} input_fields"
                    )
                # leading-dim check against the rung capacities per field kind
                dim_of = {
                    **{
                        f: caps["n_nodes"]
                        for f in (
                            _keys.POSITIONS_KEY,
                            _keys.ATOM_TYPE_KEY,
                            _keys.BATCH_KEY,
                            _keys.NODE_MASK_KEY,
                        )
                    },
                    **{
                        f: caps["n_edges"]
                        for f in (
                            _keys.EDGE_CELL_SHIFT_KEY,
                            _keys.EDGE_MASK_KEY,
                            _keys.EDGE_VECTORS_KEY,
                        )
                    },
                    **{
                        f: caps["n_frames"]
                        for f in (
                            _keys.CELL_KEY,
                            _keys.NUM_NODES_KEY,
                            _keys.FRAME_MASK_KEY,
                        )
                    },
                }
                for field, aval in zip(md["input_fields"], avals):
                    if field == _keys.EDGE_INDEX_KEY:
                        want = (2, caps["n_edges"])
                        if tuple(aval.shape) != want:
                            raise ValueError(
                                f"rung {i}: {field} shape {aval.shape} != {want}"
                            )
                    elif field in dim_of and (
                        not aval.shape or aval.shape[0] != dim_of[field]
                    ):
                        raise ValueError(
                            f"rung {i}: {field} leading dim {aval.shape} "
                            f"!= {dim_of[field]}"
                        )
    return md
