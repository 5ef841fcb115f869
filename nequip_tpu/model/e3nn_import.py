"""Import reference (PyTorch + e3nn) NequIP checkpoints.

The single biggest adoption lever: fine-tune or deploy a published
torch/e3nn NequIP model on TPU.  Workflow:

1. On a machine with the reference installed, export the eager model's
   state dict to an ``.npz``::

       import numpy as np
       np.savez(
           "weights.npz",
           **{k: v.detach().cpu().numpy() for k, v in model.state_dict().items()},
       )

   where ``model`` is the reference ``GraphModel`` (e.g. from
   ``ModelFromCheckpoint``'s ``evaluation_model``).

2. Build the SAME architecture here (same config) and run
   :func:`import_e3nn_npz` to produce a parameter tree.

Why this is a pure re-layout (no numerical conversion):

* e3nn ``o3.Linear`` stores raw ~N(0,1) weights as one flat vector of
  per-instruction ``(mul_in, mul_out)`` blocks in in-major instruction order
  and applies ``path_normalization="element"`` alphas at runtime —
  ``ops/linear.py`` uses the identical contract with per-instruction keys
  ``w{i}_{j}``, so the import splits the flat vector.
* The ``uvu`` conv TP takes its weights from the radial MLP in instruction
  order (``/root/reference/nequip/nn/interaction_block.py:89-127``); both
  frameworks enumerate instructions with the same loops, so radial-MLP
  weights transfer as transposed matrices (torch ``(out,in)`` vs ours
  ``(in,out)``), with alpha scaling applied at runtime on both sides.
* The self-connection ``FullyConnectedTensorProduct`` flattens per-path
  ``(mul1, mul2, mul_out)`` blocks in the same triple-loop order
  (``ops/tensor_product.py:220-239``) — direct copy.
* Per-irrep m-component basis conventions may differ between the SH tables;
  since no learned weight mixes m components, the network output is
  invariant to that internal basis change (both bases are self-consistent
  with their own CG tables).

:func:`export_to_e3nn_npz` is the exact inverse (reference state-dict
naming), used for the round-trip gate and for migrating TPU-trained models
back to the torch ecosystem.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

log = logging.getLogger("nequip_tpu")

_PREFIXES = ("model.func.", "func.", "model.", "")


def _normalize_keys(src: Dict[str, np.ndarray], known_roots) -> Dict[str, np.ndarray]:
    """Strip the wrapper prefix (GraphModel/ForceStressOutput nesting)."""
    for pref in _PREFIXES:
        if any(
            k.startswith(pref + root + ".") or k == pref + root
            for k in src
            for root in known_roots
        ):
            return {
                (k[len(pref):] if k.startswith(pref) else k): v for k, v in src.items()
            }
    return dict(src)


def _split_linear(flat: np.ndarray, linear) -> Dict[str, np.ndarray]:
    """e3nn flat Linear weight -> per-instruction (mul_in, mul_out) blocks."""
    out = {}
    off = 0
    for (i, j) in linear.instructions:
        mi, mo = linear.irreps_in[i].mul, linear.irreps_out[j].mul
        out[f"w{i}_{j}"] = flat[off : off + mi * mo].reshape(mi, mo)
        off += mi * mo
    assert off == flat.size, (
        f"linear weight numel mismatch: consumed {off}, got {flat.size} "
        f"(architecture mismatch between the npz and this model?)"
    )
    return out


def _join_linear(params: Dict[str, np.ndarray], linear) -> np.ndarray:
    return np.concatenate(
        [np.asarray(params[f"w{i}_{j}"]).reshape(-1) for (i, j) in linear.instructions]
    )


def _mlp_keys(prefix: str, mlp):
    """torch Sequential linear positions: index 2k (activations between)."""
    step = 2 if mlp.nonlinearity is not None else 1
    return [f"{prefix}.mlp.{step * k}.weight" for k in range(mlp.num_layers)]


def _take(src: dict, key: str) -> np.ndarray:
    if key not in src:
        near = [k for k in src if key.rsplit(".", 2)[0] in k][:8]
        raise KeyError(
            f"reference weights missing {key!r}; nearby keys: {near} "
            f"(was the npz exported from the same architecture/config?)"
        )
    return np.asarray(src.pop(key))


def import_e3nn_npz(src, model, dtype=np.float64) -> dict:
    """Build a parameter tree for ``model`` from reference e3nn weights.

    ``src``: path to an ``.npz`` (see module docstring) or a dict of arrays
    keyed by the reference state-dict names.  Returns a params pytree
    matching ``model.init_params()``'s structure.
    """
    from ..nn.atomwise import PerTypeScaleShift
    from ..nn.convnetlayer import ConvNetLayer
    from ..nn.embedding import BesselEdgeLengthEncoding, NodeTypeEmbed
    from ..nn.scalar_mlp import ScalarMLP

    if not isinstance(src, dict):
        with np.load(src) as z:
            src = {k: z[k] for k in z.files}
    else:
        src = dict(src)

    seq = model.model.func  # GraphModel -> ForceStressOutput -> Sequential
    names = list(seq.module_dict.keys())
    src = _normalize_keys(src, names)

    params: dict = {}
    for name, mod in seq.module_dict.items():
        if isinstance(mod, NodeTypeEmbed):
            p = {"type_embed": _take(src, f"{name}.embed_module.weight").astype(dtype)}
            for spec in mod.categorical_specs:
                p[f"embed_{spec['field']}"] = _take(
                    src, f"{name}.{spec['field']}_embed_module.weight"
                ).astype(dtype)
            params[name] = p
        elif isinstance(mod, BesselEdgeLengthEncoding):
            if mod.trainable:
                params[name] = {
                    "bessel_weights": _take(src, f"{name}.bessel_weights").astype(dtype)
                }
        elif isinstance(mod, ConvNetLayer):
            conv = mod.conv
            cp = {
                "linear_1": _split_linear(
                    _take(src, f"{name}.conv.linear_1.weight").astype(dtype),
                    conv.linear_1,
                ),
                "linear_2": _split_linear(
                    _take(src, f"{name}.conv.linear_2.weight").astype(dtype),
                    conv.linear_2,
                ),
                "edge_mlp": {
                    f"w{k}": _take(src, key).astype(dtype).T
                    for k, key in enumerate(
                        _mlp_keys(f"{name}.conv.edge_mlp", conv.edge_mlp)
                    )
                },
            }
            if conv.sc is not None:
                cp["sc"] = _take(src, f"{name}.conv.sc.weight").astype(dtype).reshape(-1)
            params[name] = {"conv": cp}
        elif isinstance(mod, ScalarMLP):
            params[name] = {
                f"w{k}": _take(src, key).astype(dtype).T
                for k, key in enumerate(_mlp_keys(f"{name}.mlp", mod.mlp))
            }
        elif isinstance(mod, PerTypeScaleShift):
            p = {}
            if mod.has_scales:
                p["scales"] = _take(src, f"{name}.scales").astype(dtype).reshape(-1, 1)
            if mod.has_shifts:
                p["shifts"] = _take(src, f"{name}.shifts").astype(dtype).reshape(-1, 1)
            params[name] = p
        # modules without parameters (spharm/edge_norm/factor/reduce/...) skip

    if src:
        log.warning(
            f"unconsumed reference weights (buffers / unsupported modules): "
            f"{sorted(src)[:10]}{'...' if len(src) > 10 else ''}"
        )
    import jax.numpy as jnp
    import jax

    return jax.tree.map(jnp.asarray, params)


def export_to_e3nn_npz(model, params, path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_e3nn_npz`: reference state-dict naming."""
    from ..nn.atomwise import PerTypeScaleShift
    from ..nn.convnetlayer import ConvNetLayer
    from ..nn.embedding import BesselEdgeLengthEncoding, NodeTypeEmbed
    from ..nn.scalar_mlp import ScalarMLP

    import jax

    params = jax.device_get(params)
    seq = model.model.func
    out: Dict[str, np.ndarray] = {}
    for name, mod in seq.module_dict.items():
        p = params.get(name, {})
        if isinstance(mod, NodeTypeEmbed):
            out[f"{name}.embed_module.weight"] = np.asarray(p["type_embed"])
            for spec in mod.categorical_specs:
                out[f"{name}.{spec['field']}_embed_module.weight"] = np.asarray(
                    p[f"embed_{spec['field']}"]
                )
        elif isinstance(mod, BesselEdgeLengthEncoding) and mod.trainable:
            out[f"{name}.bessel_weights"] = np.asarray(p["bessel_weights"])
        elif isinstance(mod, ConvNetLayer):
            conv = mod.conv
            cp = p["conv"]
            out[f"{name}.conv.linear_1.weight"] = _join_linear(
                cp["linear_1"], conv.linear_1
            )
            out[f"{name}.conv.linear_2.weight"] = _join_linear(
                cp["linear_2"], conv.linear_2
            )
            for k, key in enumerate(_mlp_keys(f"{name}.conv.edge_mlp", conv.edge_mlp)):
                out[key] = np.asarray(cp["edge_mlp"][f"w{k}"]).T
            if conv.sc is not None:
                out[f"{name}.conv.sc.weight"] = np.asarray(cp["sc"]).reshape(-1)
        elif isinstance(mod, ScalarMLP):
            for k, key in enumerate(_mlp_keys(f"{name}.mlp", mod.mlp)):
                out[key] = np.asarray(p[f"w{k}"]).T
        elif isinstance(mod, PerTypeScaleShift):
            if mod.has_scales:
                out[f"{name}.scales"] = np.asarray(p["scales"]).reshape(-1)
            if mod.has_shifts:
                out[f"{name}.shifts"] = np.asarray(p["shifts"]).reshape(-1)
    if path is not None:
        np.savez(path, **out)
    return out
