"""``nequip-package``: self-contained model archives.

Parity: ``/root/reference/nequip/scripts/package.py`` (torch.package-based)
re-designed for the functional framework: the archive stores the *model
config* (the full builder recipe), the parameters, an example batch with
baseline predictions, framework version metadata, AND a snapshot of the
``nequip_tpu`` source tree that built the model.  Rebuilding is normally
config+installed-code (builders are deterministic functions of their
config + seed); if a breaking refactor ever strands an old config, the
interned code snapshot keeps the model loadable (``nequip-package
extract-code`` + PYTHONPATH) — the durability guarantee torch.package's
code interning provides in the reference.

Subcommands: build / info / list / diff / update / modify / extract-code.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import os
import pickle
import sys
import zipfile

import numpy as np

log = logging.getLogger("nequip_tpu")

# == package format version log (parity: reference package.py:52-64) ==
#  1: metadata + model_config.json + params.pkl (+example/outputs)
#  2: + code_snapshot.zip (full nequip_tpu source tree)
PACKAGE_FORMAT_VERSION = 2
# formats this framework version can still load (compat table enforced by
# ModelFromPackage; bump + extend deliberately on breaking changes)
SUPPORTED_PACKAGE_FORMATS = (1, 2)


def code_snapshot_bytes() -> bytes:
    """Zip the installed ``nequip_tpu`` source tree (py/yaml/cpp files)."""
    import nequip_tpu

    root = os.path.dirname(os.path.abspath(nequip_tpu.__file__))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith((".py", ".yaml", ".yml", ".cpp", ".h", ".md")):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "nequip_tpu", os.path.relpath(full, root)
                )
                zf.write(full, rel)
    return buf.getvalue()


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
    outputs = None
    if example is not None:
        # baseline predictions: `nequip-package update` verifies against these
        from ..data import _keys, to_device

        out = jax.jit(model)(params, to_device(example))
        outputs = {
            k: np.asarray(out[k])
            for k in (_keys.TOTAL_ENERGY_KEY, _keys.FORCE_KEY)
            if k in out
        }
    with zipfile.ZipFile(args.output_path, "w") as zf:
        zf.writestr("package_metadata.json", json.dumps(metadata, indent=2))
        zf.writestr("model_config.json", json.dumps(cfg))
        zf.writestr("params.pkl", pickle.dumps(host_params))
        if example is not None:
            zf.writestr("example_data.pkl", pickle.dumps(example))
        if outputs is not None:
            zf.writestr("example_outputs.pkl", pickle.dumps(outputs))
        if not getattr(args, "no_code_snapshot", False):
            zf.writestr("code_snapshot.zip", code_snapshot_bytes())
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


def update(args) -> None:
    """Re-emit an archive under the current framework version, verifying
    predictions are unchanged on the stored example batch.

    Parity: ``nequip-package update``
    (``/root/reference/nequip/scripts/package.py``, format-version log
    ``:52-64``): the reference swaps the interned code snapshot and re-checks
    outputs; here the "code" is the installed framework, so update =
    rebuild-from-config under the current version + numeric self-check.
    """
    import jax

    from .. import __version__
    from ..model.saved_models import ModelFromPackage

    with zipfile.ZipFile(args.package_path) as zf:
        meta = json.loads(zf.read("package_metadata.json"))
        cfg = json.loads(zf.read("model_config.json"))
        names = set(zf.namelist())
        example = (
            pickle.loads(zf.read("example_data.pkl"))
            if "example_data.pkl" in names
            else None
        )
        old_outputs = (
            pickle.loads(zf.read("example_outputs.pkl"))
            if "example_outputs.pkl" in names
            else None
        )

    model, params = ModelFromPackage(args.package_path)
    new_outputs = None
    if example is not None:
        from ..data import _keys, to_device

        out = jax.jit(model)(params, to_device(example))
        new_outputs = {
            k: np.asarray(out[k])
            for k in (_keys.TOTAL_ENERGY_KEY, _keys.FORCE_KEY)
            if k in out
        }
        if old_outputs is not None:
            for k, v in old_outputs.items():
                np.testing.assert_allclose(
                    new_outputs[k], v, rtol=1e-6, atol=1e-8,
                    err_msg=f"package update changed predictions for {k!r}",
                )
            log.info("predictions verified unchanged")
    old_version = meta.get("nequip_tpu_version")
    meta["nequip_tpu_version"] = __version__
    meta["package_format_version"] = PACKAGE_FORMAT_VERSION
    meta.setdefault("updated_from", []).append(old_version)
    host_params = jax.tree.map(lambda x: np.asarray(x), params)
    with zipfile.ZipFile(args.output_path, "w") as zf:
        zf.writestr("package_metadata.json", json.dumps(meta, indent=2))
        zf.writestr("model_config.json", json.dumps(cfg))
        zf.writestr("params.pkl", pickle.dumps(host_params))
        if example is not None:
            zf.writestr("example_data.pkl", pickle.dumps(example))
        if new_outputs is not None:
            zf.writestr("example_outputs.pkl", pickle.dumps(new_outputs))
        # refresh the interned code to the (verified-compatible) current tree
        zf.writestr("code_snapshot.zip", code_snapshot_bytes())
    log.info(f"updated package -> {args.output_path}")


def extract_code(args) -> None:
    """Extract the interned source snapshot (durability escape hatch).

    If a future framework version cannot rebuild an old package's config,
    run this and load the package with PYTHONPATH=<out_dir>.
    """
    with zipfile.ZipFile(args.package_path) as zf:
        names = set(zf.namelist())
        assert "code_snapshot.zip" in names, (
            "archive has no code snapshot (built with --no-code-snapshot or "
            "format version 1)"
        )
        snapshot = zf.read("code_snapshot.zip")
    os.makedirs(args.output_dir, exist_ok=True)
    with zipfile.ZipFile(io.BytesIO(snapshot)) as zf:
        zf.extractall(args.output_dir)
    log.info(
        f"extracted code snapshot to {args.output_dir}; load the package "
        f"with PYTHONPATH={args.output_dir}"
    )


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
    p_build.add_argument(
        "--no-code-snapshot",
        action="store_true",
        help="skip interning the nequip_tpu source tree into the archive",
    )
    p_build.set_defaults(func=build)

    p_xc = sub.add_parser("extract-code")
    p_xc.add_argument("package_path")
    p_xc.add_argument("output_dir")
    p_xc.set_defaults(func=extract_code)

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

    p_upd = sub.add_parser("update")
    p_upd.add_argument("package_path")
    p_upd.add_argument("output_path")
    p_upd.set_defaults(func=update)

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
