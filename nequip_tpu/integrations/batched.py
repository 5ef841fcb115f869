"""Batched inference over many frames at once (torch-sim-calculator analog).

Parity: ``NequIPTorchSimCalc``
(``/root/reference/nequip/integrations/torchsim.py:18-240``): batched MD
engines hand over a whole population of frames; we batch, pad to stable
capacity buckets (one compile, reused across steps), evaluate, and unbatch
energies/forces/stress per frame.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..data import (
    _keys,
    batched_from_list,
    compute_neighborlist_,
    from_dict,
    pad_batch,
    round_up,
    to_device,
)


class NequIPBatchedInference:
    def __init__(self, model, params, pad_multiple: int = 128):
        import jax

        self.model = model
        self.params = params
        self.r_max = float(model.r_max)
        self.pad_multiple = pad_multiple
        self._fwd = jax.jit(lambda d: model(params, d))
        self._caps: Optional[Dict[str, int]] = None

    def __call__(self, frames: List[dict]) -> List[Dict[str, np.ndarray]]:
        prepared = []
        for f in frames:
            d = from_dict(dict(f))
            prepared.append(compute_neighborlist_(d, self.r_max))
        batch = batched_from_list(prepared)
        n = batch[_keys.POSITIONS_KEY].shape[0]
        e = batch[_keys.EDGE_INDEX_KEY].shape[1]
        nf = len(frames)
        caps = {
            "n_nodes": round_up(n, self.pad_multiple),
            "n_edges": round_up(max(e, 1), 2 * self.pad_multiple),
            "n_frames": nf + 1,
        }
        if self._caps is None or any(caps[k] > self._caps[k] for k in caps):
            self._caps = caps  # grow buckets (recompile)
        padded = to_device(
            pad_batch(
                batch,
                self._caps["n_nodes"],
                self._caps["n_edges"],
                self._caps["n_frames"],
            )
        )
        out = self._fwd(padded)

        results = []
        offset = 0
        energies = np.asarray(out[_keys.TOTAL_ENERGY_KEY]).reshape(-1)
        forces = np.asarray(out.get(_keys.FORCE_KEY)) if _keys.FORCE_KEY in out else None
        stress = np.asarray(out.get(_keys.STRESS_KEY)) if _keys.STRESS_KEY in out else None
        for i, f in enumerate(prepared):
            ni = f[_keys.POSITIONS_KEY].shape[0]
            res = {"energy": float(energies[i])}
            if forces is not None:
                res["forces"] = forces[offset : offset + ni]
            if stress is not None and _keys.CELL_KEY in f:
                res["stress"] = stress[i]
            results.append(res)
            offset += ni
        return results
