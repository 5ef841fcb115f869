"""Rank compiled-HLO instructions by output bytes for the E+F fused step.

No profiler is reachable through the axon tunnel, so this approximates a
per-op time floor from memory traffic: every instruction's OUTPUT byte
count (parsed from the optimized HLO text) is a lower bound on its HBM
write traffic; at the measured ~180 GB/s realizable bandwidth that maps to
milliseconds.  Fusions are labeled by their root op and the first
source_file/line metadata inside, so big line items are attributable to
repo code.

Usage: python tools/hlo_bytes.py [--atoms 23000] [--impl pallas_fused]
       [--mode infer|train] [--top 40]
Env:   NEQUIP_BENCH_* knobs apply (model build goes through __graft_entry__).
"""

import argparse
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of a (possibly tuple) shape string like 'f32[128,288]'."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*((?:\([^)]*\)|\w+\[[^\]]*\]\S*))\s+"
    r"([a-z0-9-]+)\(",
    re.M,
)
_META_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')


def census(txt: str, top: int):
    # per-instruction: (bytes, op, label)
    items = []
    by_kind = defaultdict(int)
    pos = 0
    for m in _INSTR_RE.finditer(txt):
        shape, op = m.group(1), m.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element", "bitcast"):
            continue
        b = shape_bytes(shape)
        # attribution metadata: first source line after the instruction start
        meta = _META_RE.search(txt, m.start(), min(len(txt), m.end() + 4000))
        label = ""
        if meta:
            label = f"{os.path.basename(meta.group(1))}:{meta.group(2)}"
        items.append((b, op, shape[:60], label))
        by_kind[op] += b
    items.sort(reverse=True)
    gb = 1024.0**3
    bw = float(os.environ.get("NEQUIP_HLO_BW_GBS", 180.0))
    print("== output-bytes by op kind ==")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:24s} {v / gb:8.3f} GiB   (~{v / gb / bw * 1024:7.1f} ms @ {bw:.0f} GB/s)")
    print(f"== top {top} instructions by output bytes ==")
    for b, op, shape, label in items[:top]:
        print(f"  {b / gb:7.3f} GiB  {op:16s} {shape:60s} {label}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=23000)
    ap.add_argument("--impl", type=str, default="pallas_fused")
    ap.add_argument("--mode", type=str, default="infer")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _example_model_and_batch

    model, params, data = _example_model_and_batch(
        model_dtype=os.environ.get("NEQUIP_BENCH_DTYPE", "float32"),
        n_atoms=args.atoms, l_max=2, tp_impl=args.impl,
    )
    if args.mode == "train":
        import jax.numpy as jnp

        from nequip_tpu.data import _keys
        from nequip_tpu.train import EMATrainModule, EnergyForceLoss

        rng = np.random.RandomState(2)
        data = dict(data)
        data[_keys.TOTAL_ENERGY_KEY] = jnp.asarray(
            rng.standard_normal((2, 1)), dtype="float32"
        )
        data[_keys.FORCE_KEY] = jnp.asarray(
            rng.standard_normal(data[_keys.POSITIONS_KEY].shape), dtype="float32"
        )
        module = EMATrainModule(
            model=model,
            loss=EnergyForceLoss(type_names=["Cu"]),
            optimizer={"_target_": "optax.adam", "learning_rate": 1e-3},
            force_grad_mode=os.environ.get("NEQUIP_BENCH_FORCE_GRAD", "rr"),
        )
        state = module.init_state()
        from nequip_tpu.utils.global_state import donate_argnums
        step = jax.jit(module.make_train_step(), donate_argnums=donate_argnums(0))
        compiled = step.lower(state, data, module.loss.coeff_vector()).compile()
    else:
        compiled = jax.jit(lambda p, d: model(p, d)).lower(params, data).compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt) / 1e6:.1f} MB text")
    census(txt, args.top)


if __name__ == "__main__":
    main()
