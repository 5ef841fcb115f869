"""Run the REFERENCE's pure-torch modules against this framework.

torch (CPU) is available in this image but e3nn is not, so the reference
package is imported under a *metadata-only* stub of e3nn (Irreps string
parsing, no numerics — any attempt to instantiate an e3nn numeric module
raises).  Everything these tests compare numerically is therefore executed
by the REFERENCE'S OWN torch code vs our JAX code: the strongest
cross-framework parity evidence available offline (BASELINE.md "output
parity vs PyTorch reference"); the e3nn kernel conventions themselves are
pinned separately by the hand-built layout golden
(tests/unit/model/test_e3nn_layout_golden.py).

The stubs are installed for the pytest session on first use and removed at
teardown so they cannot shadow real optional deps for other test files.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


class _Irrep:
    def __init__(self, l, p=None):
        if isinstance(l, str):
            s = l.strip()
            p = {"e": 1, "o": -1}[s[-1]]
            l = int(s[:-1])
        elif isinstance(l, _Irrep):
            l, p = l.l, l.p
        elif isinstance(l, tuple):
            l, p = l
        self.l, self.p = int(l), int(p)

    @property
    def dim(self):
        return 2 * self.l + 1

    def __eq__(self, o):
        o = o if isinstance(o, _Irrep) else _Irrep(o)
        return (self.l, self.p) == (o.l, o.p)

    def __hash__(self):
        return hash((self.l, self.p))

    def __repr__(self):
        return f"{self.l}{'e' if self.p == 1 else 'o'}"


class _MulIr:
    def __init__(self, mul, ir):
        self.mul, self.ir = mul, ir

    @property
    def dim(self):
        return self.mul * self.ir.dim

    def __iter__(self):
        return iter((self.mul, self.ir))

    def __eq__(self, o):
        return (
            isinstance(o, _MulIr)
            and self.mul == o.mul
            and self.ir == o.ir
        )

    def __hash__(self):
        return hash((self.mul, self.ir))

    def __repr__(self):
        return f"{self.mul}x{self.ir}"


class _Irreps(tuple):
    def __new__(cls, irreps=None):
        out = []
        if isinstance(irreps, _Irreps):
            return super().__new__(cls, tuple(irreps))
        if isinstance(irreps, str):
            if irreps.strip():
                for tok in irreps.split("+"):
                    tok = tok.strip()
                    if "x" in tok:
                        mul, ir = tok.split("x")
                        out.append(_MulIr(int(mul), _Irrep(ir)))
                    else:
                        out.append(_MulIr(1, _Irrep(tok)))
        elif irreps is not None:
            for it in irreps:
                if isinstance(it, _MulIr):
                    out.append(it)
                elif isinstance(it, _Irrep):
                    out.append(_MulIr(1, it))
                else:
                    mul, ir = it
                    out.append(_MulIr(int(mul), _Irrep(ir)))
        return super().__new__(cls, out)

    @property
    def dim(self):
        return sum(mi.dim for mi in self)

    @property
    def num_irreps(self):
        return sum(mi.mul for mi in self)

    def __repr__(self):
        return "+".join(map(repr, self)) or "Irreps()"


class _NoNumerics:
    """Import-time placeholder: e3nn numerics must never be exercised."""

    def __init__(self, *a, **k):
        raise NotImplementedError("e3nn numerics are not available under the stub")

    def __class_getitem__(cls, item):
        return cls


class _CartesianTensor(str):
    def __new__(cls, formula):
        return super().__new__(cls, formula)


def _install_stubs():
    installed = []

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        installed.append(name)
        return m

    stub(
        "e3nn",
        set_optimization_defaults=lambda **k: None,
        get_optimization_defaults=lambda: {},
    )
    stub("e3nn.o3", Irreps=_Irreps, Irrep=_Irrep)
    stub("e3nn.o3._irreps", Irreps=_Irreps, Irrep=_Irrep)
    stub("e3nn.util")
    stub(
        "e3nn.util.jit",
        compile_mode=lambda mode: (lambda cls: cls),
        script=lambda m: m,
    )
    stub("e3nn.io")
    stub("e3nn.io._cartesian_tensor", CartesianTensor=_CartesianTensor)
    for mod, names in {
        "e3nn.o3._linear": ["Linear"],
        "e3nn.o3._tensor_product": ["TensorProduct"],
        "e3nn.o3._tensor_product._tensor_product": ["TensorProduct"],
        "e3nn.o3._tensor_product._sub": [
            "FullyConnectedTensorProduct",
            "ElementwiseTensorProduct",
        ],
        "e3nn.o3._spherical_harmonics": ["SphericalHarmonics"],
        "e3nn.nn": ["Gate", "NormActivation"],
        "e3nn.nn._gate": ["Gate"],
        "e3nn.nn._normact": ["NormActivation"],
        "e3nn.math": ["normalize2mom", "soft_one_hot_linspace", "soft_unit_step"],
    }.items():
        stub(mod, **{n: _NoNumerics for n in names})

    class _OmegaConf:
        _resolvers = {}

        @classmethod
        def register_new_resolver(cls, name, fn, **kw):
            cls._resolvers[name] = fn

        @classmethod
        def clear_resolver(cls, name):
            cls._resolvers.pop(name, None)

    stub("omegaconf", OmegaConf=_OmegaConf, ListConfig=list, DictConfig=dict)

    # periodic-table data used by the reference's symbol->Z conversion: take
    # it from OUR table so the two frameworks agree on inputs by construction
    from nequip_tpu.data.transforms.type_mapper import CHEMICAL_SYMBOLS

    syms = list(CHEMICAL_SYMBOLS)
    stub("ase", Atoms=object)
    stub("ase.geometry")
    stub("ase.neighborlist", primitive_neighbor_list=None)
    stub("ase.calculators")
    stub(
        "ase.calculators.singlepoint",
        SinglePointCalculator=object,
        SinglePointDFTCalculator=object,
    )
    stub("ase.calculators.calculator", all_properties=["energy", "forces", "stress"])
    stub(
        "ase.stress",
        full_3x3_to_voigt_6_stress=lambda s: s,
        voigt_6_to_full_3x3_stress=lambda s: s,
    )
    stub(
        "ase.data",
        chemical_symbols=syms,
        atomic_numbers={s: i for i, s in enumerate(syms)},
        atomic_masses=np.ones(len(syms)),
    )
    stub("matscipy")
    stub("matscipy.neighbours", neighbour_list=None)

    class _Metric:
        def __init__(self, **kw):
            pass

        def add_state(self, *a, **k):
            pass

    stub("torchmetrics", Metric=_Metric)

    def rank_zero_only(fn, *a, **k):
        return fn

    rank_zero_only.rank = 0
    stub("lightning_utilities")
    stub("lightning_utilities.core")
    stub(
        "lightning_utilities.core.rank_zero",
        rank_prefixed_message=lambda m, r: m,
        rank_zero_only=rank_zero_only,
    )
    return installed


@pytest.fixture(scope="session")
def ref():
    """The reference `nequip` package, imported under the e3nn stub."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    pytest.importorskip("torch")
    installed = _install_stubs()
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import nequip  # noqa: F401
        import nequip.nn  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed under stub: {e}")
    yield sys.modules["nequip"]
    # teardown: drop the stubs and the reference package so later test files
    # in the same process see the real environment
    sys.path.remove(REFERENCE_ROOT)
    for name in list(sys.modules):
        if name == "nequip" or name.startswith("nequip."):
            del sys.modules[name]
    for name in installed:
        sys.modules.pop(name, None)
