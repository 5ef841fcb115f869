"""Ghost/halo feature-exchange interface for spatially-decomposed graphs.

Parity: ``/root/reference/nequip/nn/_ghost_exchange_base.py`` (where LAMMPS
owns the MPI halo communication).  The TPU-native implementation exchanges
node features across an ICI device mesh with ``ppermute`` — see
``nequip_tpu.parallel.ghost`` — while this default is a no-op for
single-device / replicated execution.
"""

from __future__ import annotations

from .module import GraphModule, Params


class NoOpGhostExchange(GraphModule):
    def __init__(self, field: str, irreps_in=None):
        super().__init__()
        self.field = field
        self._init_irreps(irreps_in=irreps_in)

    def __call__(self, params: Params, data: dict) -> dict:
        return data
