"""Local model cache + repository download.

Parity: ``/root/reference/nequip/utils/model_cache.py`` /
``model_repository.py``: resolve ``nequip.net:group/model:version`` style IDs
against a local cache directory (``$NEQUIP_CACHE_DIR`` or
``~/.nequip_tpu/model_cache``), downloading through the repository REST
client (``model_repository.py``) on a cache miss; offline environments get
a clear error with the expected cache path so files can be placed manually.
"""

from __future__ import annotations

import os
from typing import Optional

CACHE_ENV = "NEQUIP_CACHE_DIR"


def get_cache_dir() -> str:
    d = os.environ.get(CACHE_ENV) or os.path.join(
        os.path.expanduser("~"), ".nequip_tpu", "model_cache"
    )
    os.makedirs(d, exist_ok=True)
    return d


def model_id_to_path(model_id: str) -> str:
    """'nequip.net:group/model:version' -> cache file path."""
    assert model_id.startswith("nequip.net:"), model_id
    rest = model_id[len("nequip.net:") :]
    name, _, version = rest.partition(":")
    version = version or "latest"
    fname = f"{name.replace('/', '__')}__{version}.zip"
    return os.path.join(get_cache_dir(), fname)


def resolve_model_id(model_id: str) -> str:
    """Return a local path for a model ID (cache hit or repository fetch)."""
    path = model_id_to_path(model_id)
    if os.path.exists(path):
        return path
    from .model_repository import ModelNotFoundError, NequIPNetAPIClient

    client = NequIPNetAPIClient()
    try:
        return client.download_model(model_id[len("nequip.net:") :], path)
    except ModelNotFoundError:
        raise
    except Exception as e:
        raise FileNotFoundError(
            f"model {model_id!r} is not in the local cache and the repository "
            f"({client.base_url}) is unreachable ({type(e).__name__}: {e}); "
            f"place the package archive at {path}"
        ) from e
