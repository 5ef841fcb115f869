"""Rank-aware logging.

Parity: ``RankedLogger`` (``/root/reference/nequip/utils/logger.py``) —
under multi-host jax.distributed, only process 0 logs by default.
"""

from __future__ import annotations

import logging
from typing import Optional


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class RankedLogger(logging.LoggerAdapter):
    def __init__(self, name: str = "nequip_tpu", rank_zero_only: bool = True):
        super().__init__(logging.getLogger(name), {})
        self.rank_zero_only = rank_zero_only

    def log(self, level, msg, *args, rank: Optional[int] = None, **kwargs):
        if self.isEnabledFor(level):
            current = _process_index()
            if self.rank_zero_only and current != 0 and rank is None:
                return
            if rank is not None and current != rank:
                return
            msg, kwargs = self.process(f"[rank {current}] {msg}", kwargs)
            self.logger.log(level, msg, *args, **kwargs)
