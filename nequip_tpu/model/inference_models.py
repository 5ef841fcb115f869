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


def save_compiled_model(
    out_path: str,
    model,
    params,
    example_batch: Dict[str, np.ndarray],
    target: str = "ase",
    mode: str = "jaxexport",
) -> dict:
    """Export ``model(params, batch)`` restricted to the target's I/O fields."""
    import jax
    from jax import export as jax_export

    input_fields = [k for k in TARGET_INPUT_FIELDS[target] if k in example_batch]
    output_fields = TARGET_OUTPUT_FIELDS[target]

    capacities = {
        "n_nodes": int(example_batch[_keys.POSITIONS_KEY].shape[0])
        if _keys.POSITIONS_KEY in example_batch
        else int(example_batch[_keys.EDGE_VECTORS_KEY].shape[0]),
        "n_edges": int(example_batch[_keys.EDGE_INDEX_KEY].shape[1]),
        "n_frames": int(example_batch[_keys.NUM_NODES_KEY].shape[0]),
    }

    def flat_fn(*arrays):
        data = dict(zip(input_fields, arrays))
        out = model(params, data)
        return tuple(out[k] for k in output_fields if k in out)

    example_arrays = tuple(example_batch[k] for k in input_fields)
    # probe eagerly for which outputs exist
    probe = model(params, dict(zip(input_fields, example_arrays)))
    output_fields = [k for k in output_fields if k in probe]

    metadata = {
        "format_version": FORMAT_VERSION,
        "target": target,
        "mode": mode,
        "input_fields": input_fields,
        "output_fields": output_fields,
        "capacities": capacities,
        "platform": jax.default_backend(),
        **{k: str(v) for k, v in model.metadata.items()},
    }

    exported_bytes = None
    if mode == "jaxexport":
        exported = jax_export.export(jax.jit(flat_fn))(*example_arrays)
        exported_bytes = exported.serialize()

    import jax as _jax

    host_params = _jax.tree.map(lambda x: np.asarray(x), params)
    with zipfile.ZipFile(out_path, "w") as zf:
        zf.writestr("metadata.json", json.dumps(metadata, indent=2))
        if exported_bytes is not None:
            zf.writestr("exported.bin", exported_bytes)
        zf.writestr(
            "model_config.json", json.dumps(getattr(model, "model_config", {}) or {})
        )
        zf.writestr("params.pkl", pickle.dumps(host_params))
    return metadata


class CompiledModel:
    """Loaded inference artifact: callable on a padded host/device dict."""

    def __init__(self, path: str):
        import jax

        self.path = path
        with zipfile.ZipFile(path) as zf:
            self.metadata = json.loads(zf.read("metadata.json"))
            self._exported = None
            if "exported.bin" in zf.namelist():
                from jax import export as jax_export

                try:
                    self._exported = jax_export.deserialize(
                        bytearray(zf.read("exported.bin"))
                    )
                except Exception:
                    self._exported = None
            self._model = None
            if self._exported is None:
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
        return self.metadata["capacities"]

    def __call__(self, data: Dict) -> Dict:
        import jax.numpy as jnp

        if self._exported is not None:
            arrays = tuple(jnp.asarray(data[k]) for k in self.input_fields)
            outs = self._exported.call(*arrays)
            return dict(zip(self.output_fields, outs))
        out = self._fwd({k: jnp.asarray(data[k]) for k in self.input_fields})
        return {k: out[k] for k in self.output_fields if k in out}


def load_compiled_model(path: str) -> CompiledModel:
    """Parity: ``load_compiled_model`` (``inference_models/compiled.py:14-60``)."""
    return CompiledModel(path)
