"""Version capture for checkpoint/package metadata.

Parity: ``/root/reference/nequip/utils/versions/``.
"""

from __future__ import annotations

from typing import Dict


def get_current_code_versions() -> Dict[str, str]:
    import jax
    import numpy

    from .. import __version__

    versions = {
        "nequip_tpu": __version__,
        "jax": jax.__version__,
        "numpy": numpy.__version__,
    }
    try:
        import flax

        versions["flax"] = flax.__version__
    except ImportError:
        pass
    try:
        import optax

        versions["optax"] = optax.__version__
    except ImportError:
        pass
    return versions


def check_version_compatibility(saved: Dict[str, str]) -> None:
    """Warn (not fail) on version mismatches, like the reference's loaders."""
    import logging

    current = get_current_code_versions()
    log = logging.getLogger("nequip_tpu")
    for k, v in (saved or {}).items():
        if k in current and current[k] != v:
            log.warning(
                f"version mismatch for {k}: checkpoint has {v}, running {current[k]}"
            )
