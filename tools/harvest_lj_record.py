"""Build/refresh docs/accuracy/lj_accuracy_r5_<dtype>.json from a running or
finished lj_accuracy workdir's metrics.csv (fallback when the in-process
runner hasn't reached its own JSON write yet).

Usage: python tools/harvest_lj_record.py <workdir> [dtype]
"""

import csv
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1]
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    csv_path = sorted(glob.glob(os.path.join(workdir, "**", "metrics.csv"),
                                recursive=True))[-1]
    rows = list(csv.DictReader(open(csv_path)))
    val = [
        (int(float(r["epoch"])), float(r["val0_epoch/forces_mae"]))
        for r in rows
        if r.get("val0_epoch/forces_mae") and r.get("epoch")
    ]
    test_row = next(
        (r for r in reversed(rows) if any(k.startswith("test") and v for k, v in r.items())),
        None,
    )

    from nequip_tpu.data.dataset import LJTestDataset

    ds = LJTestDataset(num_frames=200, seed=123456)
    forces = np.concatenate([np.asarray(f["forces"]) for f in ds.frames])
    rms = float(np.sqrt(np.mean(forces**2)))

    best_epoch, best_mae = min(val, key=lambda t: t[1])
    result = {
        "dtype": dtype,
        "config": "configs/lj_accuracy.yaml",
        "source_csv": csv_path,
        "epochs_recorded": val[-1][0],
        "label_force_rms": round(rms, 6),
        "best_val_forces_mae": round(best_mae, 6),
        "best_val_epoch": best_epoch,
        "best_val_rel_pct": round(100 * best_mae / rms, 2),
        "final_val_forces_mae": round(val[-1][1], 6),
        "val_curve_every_25": [
            {"epoch": e, "forces_mae": round(m, 6)} for e, m in val if e % 25 == 0
        ],
        "test_metrics": (
            {k: float(v) for k, v in sorted(test_row.items())
             if k.startswith("test") and v}
            if test_row
            else None
        ),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "docs", "accuracy", f"lj_accuracy_r5_{dtype}.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
