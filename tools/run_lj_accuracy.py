"""Run the parity-grade LJ accuracy record (configs/lj_accuracy.yaml) and
write the result into docs/accuracy/lj_training_record.json (VERDICT r5
item 5).

Runs on whatever platform JAX selects (set JAX_PLATFORMS=cpu to keep the
chip free); records the platform in the JSON.  Pass a dtype argument to
run the bf16 twin: python tools/run_lj_accuracy.py [float32|bfloat16]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml  # noqa: E402


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(repo, "configs", "lj_accuracy.yaml")
    with open(cfg_path) as fh:
        cfg = yaml.safe_load(fh)
    cfg["training_module"]["model"]["model_dtype"] = dtype

    import tempfile

    workdir = tempfile.mkdtemp(prefix=f"lj_accuracy_{dtype}_")
    os.chdir(workdir)
    print(f"workdir: {workdir}", flush=True)

    import jax

    # the axon TPU plugin OVERRIDES the JAX_PLATFORMS env var; honor it via
    # config (same workaround as scripts/train.py:140-146)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    from nequip_tpu.scripts.train import run_config

    t0 = time.perf_counter()
    trainer = run_config(cfg)
    wall = time.perf_counter() - t0

    # metric rows: training rows carry val0_epoch/*; the final test stage
    # appends a row with test0_epoch/* keys
    rows = trainer._metrics_rows
    test_row = next(
        (r for r in reversed(rows) if any(k.startswith("test") for k in r)), {}
    )
    val_maes = [
        float(r["val0_epoch/forces_mae"])
        for r in rows
        if "val0_epoch/forces_mae" in r
    ]
    # label scale for the relative-MAE statement
    from nequip_tpu.data.dataset import LJTestDataset
    import numpy as np

    ds = LJTestDataset(num_frames=200, seed=123456)
    forces = np.concatenate([np.asarray(f["forces"]) for f in ds.frames])
    rms = float(np.sqrt(np.mean(forces**2)))

    result = {
        "dtype": dtype,
        "platform": platform,
        "wall_s": round(wall, 1),
        "epochs_ran": int(trainer.epoch),
        "final_lr_scale": float(np.asarray(trainer._lr_scale)),
        "label_force_rms": round(rms, 6),
        "best_val_forces_mae": round(min(val_maes), 6) if val_maes else None,
        "best_val_rel_pct": (
            round(100 * min(val_maes) / rms, 2) if val_maes else None
        ),
        "test_metrics": {k: float(v) for k, v in sorted(test_row.items())},
    }
    out_path = os.path.join(repo, "docs", "accuracy", f"lj_accuracy_r5_{dtype}.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
