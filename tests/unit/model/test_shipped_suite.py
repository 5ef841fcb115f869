"""Run the shipped extension-test harness against the standard models —
this is exactly how downstream packages consume it
(parity: ``/root/reference/nequip/utils/unittests/model_tests.py:30-62``)."""

import pytest

from nequip_tpu.utils.unittests import BaseEnergyModelTests


class TestNequIPGNN(BaseEnergyModelTests):
    @pytest.fixture(
        scope="class",
        params=[
            dict(
                _target_="nequip_tpu.model.NequIPGNNModel",
                seed=17,
                model_dtype="float64",
                type_names=["Cu", "H"],
                r_max=4.0,
                num_layers=2,
                l_max=1,
                parity=True,
                num_features=4,
                radial_mlp_width=8,
                avg_num_neighbors=12.0,
                per_type_energy_shifts={"Cu": -3.0, "H": -1.0},
            ),
            dict(
                _target_="nequip_tpu.model.NequIPGNNModel",
                seed=18,
                model_dtype="float64",
                type_names=["Cu", "H"],
                r_max=4.0,
                num_layers=1,
                l_max=2,
                parity=False,
                num_features=4,
                radial_mlp_width=8,
                avg_num_neighbors=12.0,
                per_type_energy_shifts={"Cu": -3.0, "H": -1.0},
            ),
        ],
        ids=["l1_parity", "l2_noparity"],
    )
    def model_config(self, request):
        return request.param


class TestZBLModel(BaseEnergyModelTests):
    @pytest.fixture(scope="class")
    def model_config(self):
        return dict(
            _target_="nequip_tpu.model.ZBLPairPotential",
            seed=3,
            model_dtype="float64",
            type_names=["Cu", "H"],
            chemical_species=["Cu", "H"],
            units="metal",
            r_max=4.0,
        )
