"""``nequip-train``: config-driven training CLI.

Parity: ``/root/reference/nequip/scripts/train.py`` — the same 4-section
config schema (``run``, ``data``, ``trainer``, ``training_module``), dataset
statistics wired into model hyperparameters through the
``${training_data_stats:<name>}`` resolver, sequential run loop
(train -> val -> test with best-checkpoint hand-off), and checkpoint resume.

Usage:
    nequip-train -cn config.yaml [-cp /path/to/config/dir]
    nequip-train -cn config.yaml ++ckpt_path=path/to/last.ckpt
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional

from ..utils.config import instantiate, load_config, register_resolver, resolve
from ._workflow_utils import set_workflow_state

log = logging.getLogger("nequip_tpu")

_REQUIRED_SECTIONS = ("run", "data", "trainer", "training_module")
_ALLOWED_RUNS = ("train", "val", "test", "predict")


def build_from_config(config: dict, ckpt_path: Optional[str] = None):
    """Instantiate (datamodule, training_module, trainer, runs) from a config."""
    from ..utils.global_state import set_global_state

    for section in _REQUIRED_SECTIONS:
        assert section in config, f"config is missing required section {section!r}"
    runs = config["run"]
    if isinstance(runs, str):
        runs = [runs]
    assert all(r in _ALLOWED_RUNS for r in runs), (
        f"run must be a list from {_ALLOWED_RUNS}, got {runs}"
    )

    set_global_state(**config.get("global_options", {}))

    # resolve non-data interpolations first, then compute training data stats
    config = resolve(config)
    datamodule = instantiate(config["data"], _recursive_=False)

    needs_stats = "training_data_stats" in str(config["training_module"])
    if needs_stats and ckpt_path is None:
        stats = datamodule.get_statistics("train")
        log.info(f"training data statistics: {stats}")
        register_resolver(
            "training_data_stats",
            lambda name: stats[str(name).strip()],
            replace=True,
        )
        config["training_module"] = resolve(config["training_module"], config)

    training_module = instantiate(config["training_module"], _recursive_=False)
    trainer = instantiate(config["trainer"], _recursive_=False)
    trainer.info_dict = {
        "config": {
            k: v
            for k, v in config.items()
            if k in ("run", "data", "trainer", "training_module", "global_options")
        },
    }
    return datamodule, training_module, trainer, runs


def run_config(config: dict, ckpt_path: Optional[str] = None) -> "Trainer":
    from ..train.trainer import Trainer  # noqa: F401

    set_workflow_state("train")
    try:
        if ckpt_path is not None:
            # restart: the checkpoint's training_module config wins (parity:
            # scripts/train.py:145-196)
            from ..train.checkpoint import load_checkpoint

            payload = load_checkpoint(ckpt_path)
            saved = payload["config"].get("config", {})
            for section in ("training_module",):
                if section in saved:
                    config = dict(config)
                    config[section] = saved[section]
        datamodule, training_module, trainer, runs = build_from_config(
            config, ckpt_path
        )

        run_index = 0
        if ckpt_path is not None:
            from ..train.checkpoint import load_checkpoint

            run_index = int(load_checkpoint(ckpt_path)["meta"].get("run_index", 0))

        for i, stage in enumerate(runs):
            if i < run_index:
                continue
            trainer.run_index = i
            if stage == "train":
                trainer.fit(training_module, datamodule, ckpt_path=ckpt_path)
                ckpt_path = None
            elif stage == "val":
                trainer.validate(
                    training_module,
                    datamodule,
                    ckpt_path="best" if not hasattr(trainer, "state") else None,
                )
            elif stage == "test":
                trainer.test(
                    training_module,
                    datamodule,
                    ckpt_path="best" if not hasattr(trainer, "state") else None,
                )
            elif stage == "predict":
                trainer.predict(
                    training_module,
                    datamodule,
                    ckpt_path="best" if not hasattr(trainer, "state") else None,
                )
        return trainer
    finally:
        set_workflow_state(None)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Train a NequIP-TPU model")
    parser.add_argument("-cn", "--config-name", required=True)
    parser.add_argument("-cp", "--config-path", default=".")
    parser.add_argument(
        "overrides",
        nargs="*",
        help="Hydra-style overrides, e.g. ++ckpt_path=... ++trainer.max_epochs=5",
    )
    args = parser.parse_args(argv)

    # some platform plugins (axon TPU) OVERRIDE the JAX_PLATFORMS env var;
    # the config API is authoritative, so honor the env var here explicitly
    # (a CPU-pinned training run must not silently land on a shared chip)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s [%(levelname)s] %(message)s"
    )

    name = args.config_name
    if not (name.endswith(".yaml") or name.endswith(".yml")):
        name = name + ".yaml"
    config = load_config(os.path.join(args.config_path, name))

    ckpt_path = None
    for ov in args.overrides:
        key, _, value = ov.lstrip("+").partition("=")
        if key == "ckpt_path":
            ckpt_path = value
            continue
        import yaml as _yaml

        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _yaml.safe_load(value)

    run_config(config, ckpt_path=ckpt_path)


if __name__ == "__main__":
    main()
