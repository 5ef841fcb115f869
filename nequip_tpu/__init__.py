"""nequip-tpu: a TPU-native framework for E(3)-equivariant machine-learning
interatomic potentials, with the capabilities of mir-group/nequip re-designed
for JAX/XLA/Pallas/pjit.

Subpackages:
    ops       — irreps algebra, spherical harmonics, CG tensor products,
                Pallas kernels (the numerical core)
    data      — AtomicDataDict (padded, static-shape), neighborlists,
                datasets, datamodules, statistics
    nn        — graph modules (embeddings, interaction blocks, readouts,
                autograd force/stress outputs)
    model     — model builders and persistence
    train     — training loop, metrics, EMA, optimizers, callbacks
    parallel  — device-mesh sharding (data-parallel and spatial/ghost)
    scripts   — CLIs (nequip-train, nequip-compile, nequip-package)
    utils     — config system, dtype management, test harnesses
"""

__version__ = "0.1.0"
