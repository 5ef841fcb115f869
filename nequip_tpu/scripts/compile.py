"""``nequip-compile``: AOT-export a trained model for deployment.

Parity: ``/root/reference/nequip/scripts/compile.py`` — load checkpoint or
package, apply modifiers, choose a target field set (``ase`` / ``batch`` /
``pair_nequip``), export, and numerically self-check the loaded artifact
against the eager model (the reference's "self-checking compile",
``utils/aot.py:89-103``).

The reference's dynamic-dimension bounds (``--num-frames/nodes/edges
min,max``) become static padded capacities here — one compilation, zero
runtime recompiles; the calculator pads every system to these capacities.
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger("nequip_tpu")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Compile a NequIP-TPU model")
    parser.add_argument("input_path", help="checkpoint (.ckpt) or package (.zip)")
    parser.add_argument("output_path", help="output artifact (.nequip_tpu.zip)")
    parser.add_argument(
        "--mode", choices=["jaxexport", "eager"], default="jaxexport"
    )
    parser.add_argument(
        "--target", choices=["ase", "batch", "pair_nequip"], default="ase"
    )
    parser.add_argument("--num-nodes", type=int, default=None, help="node capacity")
    parser.add_argument("--num-edges", type=int, default=None, help="edge capacity")
    parser.add_argument("--num-frames", type=int, default=2, help="frame capacity")
    parser.add_argument(
        "--capacity-ladder", type=int, default=1, metavar="N",
        help="export N ascending capacity rungs (base capacity x factor^k); "
        "the calculator pads each system to the smallest rung that fits, so "
        "variable-N simulations (e.g. NPT) never need a re-export — the "
        "static-shape closure of the reference's dynamic-dim bounds",
    )
    parser.add_argument(
        "--ladder-factor", type=float, default=1.5,
        help="capacity growth factor between ladder rungs",
    )
    parser.add_argument(
        "--modifiers", nargs="*", default=[], help="named model modifiers to apply"
    )
    parser.add_argument("--no-check", action="store_true", help="skip the numeric self-check")
    parser.add_argument("--tf32", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from ..data import _keys, pad_batch, to_device
    from ..model.inference_models import load_compiled_model, save_compiled_model
    from ..model.modify_utils import modify
    from ..model.saved_models import data_dict_from_checkpoint, load_saved_model
    from ..utils.global_state import set_global_state
    from ._workflow_utils import set_workflow_state

    set_workflow_state("compile")
    try:
        set_global_state(allow_tf32=args.tf32)
        model, params = load_saved_model(args.input_path)
        if args.modifiers:
            model, params = modify(
                model, params, [{"modifier": m} for m in args.modifiers]
            )

        # example batch defines the static capacities
        example = data_dict_from_checkpoint(args.input_path)
        example = {k: np.asarray(v) for k, v in example.items()}
        n_nodes = args.num_nodes or example[_keys.POSITIONS_KEY].shape[0]
        n_edges = args.num_edges or example[_keys.EDGE_INDEX_KEY].shape[1]

        from ..data import round_up
        from ..data.atomic_data_dict import frame_from_batched

        frame = frame_from_batched(example, 0)
        examples = []
        for k in range(max(1, args.capacity_ladder)):
            if k == 0:
                # rung 0 = the exact requested/base capacity (single-rung
                # exports behave exactly as before the ladder existed)
                nn, ne = n_nodes, n_edges
            else:
                f = args.ladder_factor**k
                nn = round_up(int(np.ceil(n_nodes * f)), 128)
                ne = round_up(int(np.ceil(n_edges * f)), 256)
            batch = (
                example
                if (nn == example[_keys.POSITIONS_KEY].shape[0]
                    and ne == example[_keys.EDGE_INDEX_KEY].shape[1])
                else pad_batch(frame, nn, ne, args.num_frames)
            )
            examples.append(
                {k2: np.asarray(v) for k2, v in to_device(batch).items()}
            )
        example = examples[0]

        meta = save_compiled_model(
            args.output_path, model, params,
            examples if len(examples) > 1 else example,
            target=args.target, mode=args.mode,
        )
        log.info(f"wrote {args.output_path}")
        log.info(f"capacities: {meta['capacities']}")

        if not args.no_check:
            import jax

            from ..model.inference_models import validate_artifact

            # conformance first: the artifact must satisfy the documented
            # contract (docs/artifact_format.md) before the numeric check
            validate_artifact(args.output_path)
            compiled = load_compiled_model(args.output_path)
            out_c = compiled(example)
            out_e = model(params, {k: example[k] for k in compiled.input_fields})
            from ..utils.dtype import model_tolerance

            tol = model_tolerance(model.model_dtype)
            worst = 0.0
            for k in compiled.output_fields:
                err = float(np.abs(np.asarray(out_c[k]) - np.asarray(out_e[k])).max())
                worst = max(worst, err)
            assert worst <= tol, (
                f"compiled-vs-eager check failed: MaxAbsErr {worst:.3e} > {tol:.0e}"
            )
            log.info(f"self-check passed (MaxAbsErr {worst:.3e} <= {tol:.0e})")
    finally:
        set_workflow_state(None)


if __name__ == "__main__":
    main()
