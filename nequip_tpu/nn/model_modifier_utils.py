"""Model-modifier infrastructure.

Parity: ``/root/reference/nequip/nn/model_modifier_utils.py`` — named
modifiers declared on module classes with a decorator, discoverable and
applicable by name from config/CLI (e.g. ``modify_PerTypeScaleShift``,
``enable_TPUFusedTPScatter``).
"""

from __future__ import annotations

from typing import Callable, Dict

_MODIFIER_REGISTRY: Dict[str, Callable] = {}


def model_modifier(persistent: bool = False, private: bool = False):
    """Register a function as a named model modifier.

    ``persistent`` modifiers change the model's numerics/architecture and are
    baked into packaged artifacts; non-persistent ones are accelerations
    applied per run.
    """

    def deco(fn: Callable) -> Callable:
        fn._is_model_modifier = True
        fn._modifier_persistent = persistent
        fn._modifier_private = private
        _MODIFIER_REGISTRY[fn.__name__] = fn
        return fn

    return deco


def get_all_modifiers() -> Dict[str, Callable]:
    return dict(_MODIFIER_REGISTRY)


def is_persistent_modifier(name: str) -> bool:
    return bool(getattr(_MODIFIER_REGISTRY[name], "_modifier_persistent", False))
