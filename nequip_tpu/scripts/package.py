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


def list_contents(args) -> None:
    with zipfile.ZipFile(args.package_path) as zf:
        for zi in zf.infolist():
            print(f"{zi.file_size:>12}  {zi.filename}")


def diff(args) -> None:
    """Compare metadata/config/params of two packages."""
    import numpy as np

    def load(path):
        with zipfile.ZipFile(path) as zf:
            return (
                json.loads(zf.read("package_metadata.json")),
                json.loads(zf.read("model_config.json")),
                pickle.loads(zf.read("params.pkl")),
            )

    m1, c1, p1 = load(args.package_a)
    m2, c2, p2 = load(args.package_b)
    for name, a, b in (("metadata", m1, m2), ("model_config", c1, c2)):
        keys = sorted(set(a) | set(b))
        for k in keys:
            if a.get(k) != b.get(k):
                print(f"{name}.{k}: {a.get(k)!r} != {b.get(k)!r}")
    import jax

    la, lb = jax.tree.leaves(p1), jax.tree.leaves(p2)
    if len(la) != len(lb):
        print(f"params: {len(la)} leaves != {len(lb)} leaves")
    else:
        worst = max(
            (float(np.abs(np.asarray(x) - np.asarray(y)).max()) if x.shape == y.shape else float("inf"))
            for x, y in zip(la, lb)
        ) if la else 0.0
        print(f"params: max abs diff {worst:.3e}")


def modify_cmd(args) -> None:
    """Apply persistent modifiers to a package and write a new archive."""
    import jax
    import numpy as np

    from ..model.modify_utils import modify as apply_modifiers
    from ..model.saved_models import ModelFromPackage

    model, params = ModelFromPackage(args.package_path)
    specs = []
    for m in args.modifiers:
        name, _, kv = m.partition(":")
        spec = {"modifier": name}
        if kv:
            import yaml as _yaml

            spec.update(_yaml.safe_load(kv))
        specs.append(spec)
    model, params = apply_modifiers(model, params, specs)
    host_params = jax.tree.map(lambda x: np.asarray(x), params)
    with zipfile.ZipFile(args.package_path) as zf:
        meta = json.loads(zf.read("package_metadata.json"))
        cfg = json.loads(zf.read("model_config.json"))
    meta["modifiers"] = args.modifiers
    with zipfile.ZipFile(args.output_path, "w") as zf:
        zf.writestr("package_metadata.json", json.dumps(meta, indent=2))
        zf.writestr("model_config.json", json.dumps(cfg))
        zf.writestr("params.pkl", pickle.dumps(host_params))
    log.info(f"wrote modified package {args.output_path}")


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

    p_list = sub.add_parser("list")
    p_list.add_argument("package_path")
    p_list.set_defaults(func=list_contents)

    p_diff = sub.add_parser("diff")
    p_diff.add_argument("package_a")
    p_diff.add_argument("package_b")
    p_diff.set_defaults(func=diff)

    p_mod = sub.add_parser("modify")
    p_mod.add_argument("package_path")
    p_mod.add_argument("output_path")
    p_mod.add_argument("--modifiers", nargs="+", required=True,
                       help="name or name:{yaml kwargs}")
    p_mod.set_defaults(func=modify_cmd)

    args = parser.parse_args(argv)
    from ._workflow_utils import set_workflow_state

    set_workflow_state("package")
    try:
        args.func(args)
    finally:
        set_workflow_state(None)


if __name__ == "__main__":
    main()
