"""``nequip-prepare-pair-style``: package a model for MD-engine pair styles.

Parity: ``nequip-prepare-lmp-mliap``
(``/root/reference/nequip/integrations/lammps_mliap/create_lmp_mliap_file.py``):
produce a self-contained ``.nequip_tpu.pair.pkl`` that an MD-engine plugin
loads via ``NequIPPairStyleWrapper.load`` and calls with per-rank edge
vectors (the model's edge-force branch).
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Prepare a NequIP-TPU pair-style file for MD engines"
    )
    parser.add_argument("ckpt_path")
    parser.add_argument("output_path", help="*.nequip_tpu.pair.pkl")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from ..integrations.pair_style import NequIPPairStyleWrapper
    from ..model.saved_models import load_saved_model

    model, params = load_saved_model(args.ckpt_path)
    NequIPPairStyleWrapper(model, params).save(args.output_path)
    logging.getLogger("nequip_tpu").info(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
