"""Named benchmark datamodules (sGDML/aspirin, rMD17, MD22, 3BPA, ...).

Parity: ``/root/reference/nequip/data/datamodule/__init__.py:1-24`` — thin
wrappers that know each dataset's file format, key mapping, and download
URL.  Downloads require network access; with a pre-downloaded
``file_path``/``data_source_dir`` everything works offline.
"""

from __future__ import annotations

import os
import urllib.request
import zipfile
from typing import List, Optional, Sequence

from .base import NequIPDataModule

_SGDML_URL = "http://www.quantum-machine.org/gdml/data/npz/{name}.npz"
_RMD17_NAMES = [
    "aspirin", "azobenzene", "benzene", "ethanol", "malonaldehyde",
    "naphthalene", "paracetamol", "salicylic", "toluene", "uracil",
]
_MD22_NAMES = [
    "Ac-Ala3-NHMe", "DHA", "stachyose", "AT-AT", "AT-AT-CG-CG",
    "buckyball-catcher", "double-walled_nanotube",
]


def _maybe_download(url: str, dest: str) -> str:
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    try:
        urllib.request.urlretrieve(url, dest)  # nosec - user-requested dataset
    except Exception as e:
        raise RuntimeError(
            f"could not download {url} (offline environment?); place the file "
            f"at {dest} manually"
        ) from e
    return dest


class NPZSplitDataModule(NequIPDataModule):
    """Split one NPZ trajectory into train/val/test."""

    def __init__(
        self,
        file_path: str,
        transforms: Sequence = (),
        train: int = 950,
        val: int = 50,
        test: int = 0,
        seed: int = 123,
        key_mapping: Optional[dict] = None,
        **kwargs,
    ):
        split = {
            "dataset": {
                "_target_": "nequip_tpu.data.dataset.NPZDataset",
                "file_path": file_path,
                "key_mapping": key_mapping,
                "transforms": list(transforms),
            },
            "train": train,
            "val": val,
        }
        if test:
            split["test"] = test
        super().__init__(seed=seed, split_dataset=split, **kwargs)


def sGDML_CCSD_DataModule(
    dataset: str = "aspirin_ccsd",
    data_source_dir: str = "./data",
    transforms: Sequence = (),
    **kwargs,
) -> NPZSplitDataModule:
    """CCSD(T) sGDML molecules (the tutorial-aspirin data).

    Downloads ``{dataset}.npz`` from quantum-machine.org on first use.
    """
    # sGDML ships train/test zips; the plain npz covers the common case
    path = os.path.join(data_source_dir, f"{dataset}.npz")
    if not os.path.exists(path):
        # train-split archive convention used by the reference tutorial
        url = _SGDML_URL.format(name=dataset + "-train")
        try:
            zpath = _maybe_download(url.replace(".npz", ".zip"), path + ".zip")
            with zipfile.ZipFile(zpath) as zf:
                names = [n for n in zf.namelist() if n.endswith(".npz")]
                zf.extract(names[0], data_source_dir)
                os.rename(os.path.join(data_source_dir, names[0]), path)
        except Exception:
            _maybe_download(_SGDML_URL.format(name=dataset), path)
    return NPZSplitDataModule(file_path=path, transforms=transforms, **kwargs)


def rMD17DataModule(
    dataset: str = "aspirin",
    data_source_dir: str = "./data",
    transforms: Sequence = (),
    **kwargs,
) -> NPZSplitDataModule:
    assert dataset in _RMD17_NAMES, f"unknown rMD17 molecule {dataset!r}"
    path = os.path.join(data_source_dir, f"rmd17_{dataset}.npz")
    if not os.path.exists(path):
        raise RuntimeError(
            f"rMD17 requires a manual download (figshare); place rmd17_{dataset}.npz at {path}"
        )
    return NPZSplitDataModule(
        file_path=path,
        transforms=transforms,
        key_mapping={
            "coords": "pos",
            "energies": "total_energy",
            "forces": "forces",
            "nuclear_charges": "atomic_numbers",
        },
        **kwargs,
    )


def MD22DataModule(
    dataset: str = "Ac-Ala3-NHMe",
    data_source_dir: str = "./data",
    transforms: Sequence = (),
    **kwargs,
) -> NPZSplitDataModule:
    assert dataset in _MD22_NAMES, f"unknown MD22 system {dataset!r}"
    path = os.path.join(data_source_dir, f"md22_{dataset}.npz")
    _maybe_download(_SGDML_URL.format(name=f"md22_{dataset}"), path)
    return NPZSplitDataModule(file_path=path, transforms=transforms, **kwargs)
