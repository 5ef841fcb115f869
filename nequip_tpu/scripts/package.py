"""``nequip-package``: self-contained model archives.

Parity: ``/root/reference/nequip/scripts/package.py`` (torch.package-based)
re-designed for the functional framework: instead of pickling code objects,
the archive stores the *model config* (the full builder recipe), the
parameters, an example batch, and framework version metadata — which is
sufficient to reconstruct the model exactly (builders are deterministic
functions of their config + seed).

Subcommands: build / info.
"""

from __future__ import annotations

import argparse
import json
import logging
import pickle
import sys
import zipfile

import numpy as np

log = logging.getLogger("nequip_tpu")

PACKAGE_FORMAT_VERSION = 1


def build(args) -> None:
    import jax

    from .. import __version__
    from ..model.saved_models import data_dict_from_checkpoint, load_saved_model

    model, params = load_saved_model(args.ckpt_path)
    cfg = getattr(model, "model_config", None)
    assert cfg, "model has no reconstructible config; cannot package"
    try:
        example = data_dict_from_checkpoint(args.ckpt_path)
        example = {k: np.asarray(v) for k, v in example.items()}
    except Exception as e:  # pragma: no cover
        log.warning(f"could not rebuild example batch: {e}")
        example = None

    host_params = jax.tree.map(lambda x: np.asarray(x), params)
    metadata = {
        "package_format_version": PACKAGE_FORMAT_VERSION,
        "nequip_tpu_version": __version__,
        **{k: str(v) for k, v in model.metadata.items()},
    }
    with zipfile.ZipFile(args.output_path, "w") as zf:
        zf.writestr("package_metadata.json", json.dumps(metadata, indent=2))
        zf.writestr("model_config.json", json.dumps(cfg))
        zf.writestr("params.pkl", pickle.dumps(host_params))
        if example is not None:
            zf.writestr("example_data.pkl", pickle.dumps(example))
    log.info(f"wrote package {args.output_path}")


def info(args) -> None:
    with zipfile.ZipFile(args.package_path) as zf:
        meta = json.loads(zf.read("package_metadata.json"))
        cfg = json.loads(zf.read("model_config.json"))
    print(json.dumps({"metadata": meta, "model_config": cfg}, indent=2))


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    parser = argparse.ArgumentParser(description="Package a NequIP-TPU model")
    sub = parser.add_subparsers(dest="command", required=True)

    p_build = sub.add_parser("build")
    p_build.add_argument("ckpt_path")
    p_build.add_argument("output_path")
    p_build.set_defaults(func=build)

    p_info = sub.add_parser("info")
    p_info.add_argument("package_path")
    p_info.set_defaults(func=info)

    args = parser.parse_args(argv)
    from ._workflow_utils import set_workflow_state

    set_workflow_state("package")
    try:
        args.func(args)
    finally:
        set_workflow_state(None)


if __name__ == "__main__":
    main()
