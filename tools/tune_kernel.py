"""Sweep Pallas kernel tile sizes on the real TPU.

Runs bench.py-style single cases across (ROWS, BLOCK_E, impl) combos and
prints a sorted table.  Each combo runs in a subprocess so the env-var tile
knobs (read at import time by ops/pallas/tp_scatter.py) take effect and so
an OOM in one combo doesn't kill the sweep.

Usage:
    python tools/tune_kernel.py [--atoms 23000] [--mode infer] [--steps 8]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_combo(atoms, mode, impl, rows, block_e, steps, dtype):
    env = dict(os.environ)
    env.update(
        NEQUIP_BENCH_ATOMS=str(atoms),
        NEQUIP_BENCH_MODE=mode,
        NEQUIP_BENCH_TP_IMPL=impl,
        NEQUIP_BENCH_STEPS=str(steps),
        NEQUIP_BENCH_DTYPE=dtype,
        NEQUIP_PALLAS_ROWS=str(rows),
        NEQUIP_PALLAS_BLOCK_E=str(block_e),
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            return {"error": out.stderr.strip().splitlines()[-1][:160] if out.stderr else "no output"}
        d = json.loads(line[-1])
        case = d["extras"]["cases"][0]
        return case
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=23000)
    ap.add_argument("--mode", default="infer")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--impls", default="pallas,pallas_fused")
    ap.add_argument("--rows", default="128,256")
    ap.add_argument("--block_e", default="256,512,1024")
    ap.add_argument("--xla-baseline", action="store_true", default=True)
    args = ap.parse_args()

    results = []
    if args.xla_baseline:
        c = run_combo(args.atoms, args.mode, "xla", 128, 256, args.steps, args.dtype)
        c.update(impl="xla", rows="-", block_e="-")
        results.append(c)
        print(json.dumps(c), flush=True)
    for impl in args.impls.split(","):
        for rows in [int(r) for r in args.rows.split(",")]:
            for be in [int(b) for b in args.block_e.split(",")]:
                c = run_combo(args.atoms, args.mode, impl, rows, be, args.steps, args.dtype)
                c.update(impl=impl, rows=rows, block_e=be)
                results.append(c)
                print(json.dumps(c), flush=True)

    ok = [r for r in results if "error" not in r]
    ok.sort(key=lambda r: -r.get("atom_steps_per_s", 0))
    print("\n=== sorted (best first) ===")
    for r in ok:
        print(
            f"{r['impl']:>13} rows={r['rows']!s:>4} block_e={r['block_e']!s:>5} "
            f"-> {r['atom_steps_per_s']:>10.1f} atom-steps/s  ({r['step_ms']} ms)"
        )


if __name__ == "__main__":
    main()
