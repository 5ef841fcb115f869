"""Functional graph-module system.

TPU-native analog of the reference's ``GraphModuleMixin`` +
``SequentialGraphNetwork`` (``/root/reference/nequip/nn/_graph_mixin.py``):
modules are *static specs* built eagerly (irreps compatibility is checked at
construction time, before any tracing), with two pure functions:

* ``init(rng) -> params``  — a nested dict pytree of jnp arrays
* ``__call__(params, data) -> data`` — pure; ``data`` is an AtomicDataDict
  of jax arrays with static (padded) shapes

This replaces torch ``nn.Module`` state with explicit pytrees, which is what
``jax.jit`` / ``jax.grad`` / ``shard_map`` compose over.  Non-trainable
state ("buffers" in torch terms) lives in the same params tree but is listed
by ``frozen_param_paths`` so optimizers can mask it out.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence, Set, Union

import jax

from ..ops.irreps import Irreps
from ..utils.dtype import get_default_dtype

Params = Dict[str, Any]
IrrepsDict = Dict[str, Optional[Irreps]]


def _norm_irreps(v):
    if v is None:
        return None
    return Irreps(v)


class GraphModule:
    """Base class: irreps bookkeeping + functional init/apply."""

    def __init__(self):
        self.irreps_in: IrrepsDict = {}
        self.irreps_out: IrrepsDict = {}
        # captured at construction (the model_dtype context)
        self.model_dtype = get_default_dtype()

    def _init_irreps(
        self,
        irreps_in: Optional[Mapping] = None,
        my_irreps_in: Optional[Mapping] = None,
        required_irreps_in: Sequence[str] = (),
        irreps_out: Optional[Mapping] = None,
    ) -> None:
        """Check and record irreps metadata.

        Contract parity with ``_graph_mixin.py:21-95``:
        * ``irreps_in``: irreps produced upstream (``None`` values = fields
          without irreps, e.g. index fields);
        * ``my_irreps_in``: fields this module requires with *exactly* these
          irreps — mismatch is a construction-time error;
        * ``required_irreps_in``: fields that must be present (any irreps);
        * ``irreps_out``: fields this module adds/overwrites.
        """
        irreps_in = {k: _norm_irreps(v) for k, v in dict(irreps_in or {}).items()}
        my_irreps_in = {k: _norm_irreps(v) for k, v in dict(my_irreps_in or {}).items()}
        irreps_out_new = {k: _norm_irreps(v) for k, v in dict(irreps_out or {}).items()}

        for k, v in my_irreps_in.items():
            if k in irreps_in:
                if v is not None and irreps_in[k] != v:
                    raise ValueError(
                        f"{type(self).__name__}: input {k} has irreps "
                        f"{irreps_in[k]} but {v} is required"
                    )
            else:
                irreps_in[k] = v
        for k in required_irreps_in:
            if k not in irreps_in:
                raise ValueError(
                    f"{type(self).__name__}: required input field {k!r} missing "
                    f"from irreps_in {sorted(irreps_in)}"
                )

        self.irreps_in = irreps_in
        self.irreps_out = dict(irreps_in)
        self.irreps_out.update(irreps_out_new)

    # --- params -------------------------------------------------------
    def init(self, rng) -> Params:
        return {}

    def frozen_param_paths(self) -> Set[str]:
        """Dotted paths (relative to this module) of non-trainable leaves."""
        return set()

    def __call__(self, params: Params, data: dict) -> dict:
        raise NotImplementedError

    # --- forward-mode (tangent) sweep ---------------------------------
    def jvp(self, params: Params, data: dict, tangents: dict):
        """``(out, tangent_out)``: one dual-number (jvp) step of this module.

        ``tangents`` maps a subset of ``data`` keys to tangent arrays
        (missing keys = zero tangent).  The default implementation routes
        through :func:`jax.jvp` and is correct for any module built from
        jvp-capable ops (all pure-XLA modules).  Modules that call
        ``custom_vjp`` Pallas kernels override this with a hand-written
        linearity rule (see ``InteractionBlock.jvp``) — that is what makes
        the *whole model* forward-differentiable without forward-mode AD
        ever entering a kernel, which in turn enables reverse-over-forward
        force-loss training (``ForceStressOutput.loss_surrogate``) at any
        system size.
        """
        keys = [k for k in data if k in tangents]
        if not keys:
            return self(params, data), {}

        def f(*vals):
            d = dict(data)
            d.update(zip(keys, vals))
            return self(params, d)

        out, tout = jax.jvp(
            f,
            tuple(data[k] for k in keys),
            tuple(tangents[k] for k in keys),
        )
        t = {
            k: v
            for k, v in tout.items()
            if hasattr(v, "dtype") and v.dtype != jax.dtypes.float0
        }
        return out, t

    # --- metadata (parity: _get_metadata_contributions) ---------------
    def metadata(self) -> Dict[str, str]:
        return {}

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


class SequentialGraphNetwork(GraphModule):
    """Ordered container with construction-time irreps chaining.

    Parity: ``SequentialGraphNetwork`` (``_graph_mixin.py:130-238``)
    including ``append``/``insert`` editing.
    """

    def __init__(self, modules: Mapping[str, GraphModule]):
        super().__init__()
        self.module_dict: Dict[str, GraphModule] = dict(modules)
        names = list(self.module_dict)
        for prev_name, next_name in zip(names, names[1:]):
            self._check_pair(self.module_dict[prev_name], self.module_dict[next_name], next_name)
        first = self.module_dict[names[0]]
        last = self.module_dict[names[-1]]
        self.irreps_in = dict(first.irreps_in)
        self.irreps_out = dict(last.irreps_out)

    @staticmethod
    def _check_pair(prev: GraphModule, nxt: GraphModule, name: str) -> None:
        for k, v in nxt.irreps_in.items():
            if k in prev.irreps_out:
                pv = prev.irreps_out[k]
                if v is not None and pv is not None and v != pv:
                    raise ValueError(
                        f"irreps mismatch into module {name!r} for field {k!r}: "
                        f"upstream {pv} vs required {v}"
                    )

    def append(self, name: str, module: GraphModule) -> None:
        last = list(self.module_dict.values())[-1]
        self._check_pair(last, module, name)
        self.module_dict[name] = module
        self.irreps_out = dict(module.irreps_out)

    def insert_after(self, after: str, name: str, module: GraphModule) -> None:
        names = list(self.module_dict)
        idx = names.index(after)
        self._check_pair(self.module_dict[after], module, name)
        if idx + 1 < len(names):
            self._check_pair(module, self.module_dict[names[idx + 1]], names[idx + 1])
        items = list(self.module_dict.items())
        items.insert(idx + 1, (name, module))
        self.module_dict = dict(items)

    def init(self, rng) -> Params:
        params: Params = {}
        keys = jax.random.split(rng, max(len(self.module_dict), 1))
        for key, (name, module) in zip(keys, self.module_dict.items()):
            p = module.init(key)
            if p:
                params[name] = p
        return params

    def frozen_param_paths(self) -> Set[str]:
        out: Set[str] = set()
        for name, module in self.module_dict.items():
            out.update(f"{name}.{p}" for p in module.frozen_param_paths())
        return out

    def __call__(self, params: Params, data: dict) -> dict:
        for name, module in self.module_dict.items():
            data = module(params.get(name, {}), data)
        return data

    def jvp(self, params: Params, data: dict, tangents: dict):
        t = dict(tangents)
        for name, module in self.module_dict.items():
            data, t = module.jvp(params.get(name, {}), data, t)
        return data, t

    def metadata(self) -> Dict[str, str]:
        out: Dict[str, str] = {}
        for m in self.module_dict.values():
            out.update(m.metadata())
        return out

    def __repr__(self) -> str:
        inner = "\n".join(
            f"  ({n}): {m!r}" for n, m in self.module_dict.items()
        )
        return f"SequentialGraphNetwork(\n{inner}\n)"


def replace_submodules(module: GraphModule, cls, factory) -> GraphModule:
    """Recursively replace submodules of type ``cls`` via ``factory(old)``.

    Parity: ``replace_submodules`` (``nn/model_modifier_utils.py:92-107``).
    NOTE: returns the (mutated) module; parameter structure may change, so
    this is applied before ``init`` or with params re-mapped by the caller.
    """
    if isinstance(module, cls):
        return factory(module)
    if isinstance(module, SequentialGraphNetwork):
        for name in list(module.module_dict):
            module.module_dict[name] = replace_submodules(
                module.module_dict[name], cls, factory
            )
        return module
    for attr, value in list(vars(module).items()):
        if isinstance(value, GraphModule):
            setattr(module, attr, replace_submodules(value, cls, factory))
    return module
