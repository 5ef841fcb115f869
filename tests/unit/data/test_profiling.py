"""Profiling/FLOP-accounting utilities (SURVEY §5 tracing subsystem)."""

import os

import numpy as np
import jax
import jax.numpy as jnp


def test_flops_per_step_exact():
    from nequip_tpu.utils.profiling import cost_analysis_of, flops_per_step, mfu

    a = jnp.ones((64, 64))
    b = jnp.ones((64, 64))
    f = flops_per_step(lambda x, y: x @ y, a, b)
    # one 64^3 matmul = 2 * 64^3 FLOPs
    np.testing.assert_allclose(f, 2 * 64**3, rtol=0.01)
    ca = cost_analysis_of(lambda x, y: x @ y, a, b)
    assert "flops" in ca
    assert 0 < mfu(f, 1e-3) < 1


def test_trainer_profiler_callback(tmp_path):
    """The profiler callback captures a step window through the Trainer."""
    import yaml

    from nequip_tpu.scripts.train import run_config

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "..", "integration", "lj_config.yaml"
    )
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    prof_dir = str(tmp_path / "profile")
    cfg["trainer"]["ckpt_dir"] = str(tmp_path / "ckpt")
    cfg["trainer"]["max_epochs"] = 1
    cfg["trainer"]["callbacks"] = [
        {
            "_target_": "nequip_tpu.utils.profiling.JaxProfilerCallback",
            "log_dir": prof_dir,
            "start_step": 1,
            "end_step": 2,
        }
    ]
    run_config(cfg)
    # a trace directory with at least one .pb/.json artifact exists
    found = []
    for root, _dirs, files in os.walk(prof_dir):
        found += [f for f in files if f.endswith((".pb", ".json.gz", ".json", ".trace"))]
    assert found, f"no profiler artifacts under {prof_dir}"
