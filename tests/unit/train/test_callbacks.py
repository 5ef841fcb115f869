"""Runtime loss-coefficient control: Trainer.set_loss_coeffs + SoftAdapt.

Regression for an r4 field failure: ``np.asarray`` of a jax array is a
READ-ONLY view, so the first SoftAdapt update of a real training run died
with "assignment destination is read-only" (the integration smoke tests
never reached SoftAdapt's first epoch-frequency trigger).

Parity: SoftAdapt semantics from
``/root/reference/nequip/train/callbacks/softadapt.py``.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from nequip_tpu.train import EnergyForceLoss
from nequip_tpu.train.callbacks import SoftAdapt
from nequip_tpu.train.trainer import Trainer


def _trainer_with_loss():
    loss = EnergyForceLoss(type_names=["Cu"])
    trainer = Trainer(max_epochs=1)
    trainer.module = SimpleNamespace(loss=loss)
    trainer._loss_coeffs = loss.coeff_vector()  # jnp array (read-only view)
    return trainer, loss


def test_set_loss_coeffs_runtime():
    trainer, loss = _trainer_with_loss()
    names = [e["name"] for e in loss.entries]
    trainer.set_loss_coeffs({names[0]: 3.0, names[1]: 1.0})
    got = trainer.current_loss_coeffs()
    np.testing.assert_allclose(got[names[0]], 0.75)
    np.testing.assert_allclose(got[names[1]], 0.25)
    # normalized like the reference (metrics_manager set_coeffs contract)
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_softadapt_epoch_updates_coeffs():
    trainer, loss = _trainer_with_loss()
    names = [e["name"] for e in loss.entries]
    cb = SoftAdapt(beta=1.1, interval="epoch", frequency=2)
    before = trainer.current_loss_coeffs()
    # energy loss rising, force loss falling -> weight shifts toward energy
    histories = [
        {names[0]: 1.0, names[1]: 1.0},
        {names[0]: 1.5, names[1]: 0.6},
        {names[0]: 2.0, names[1]: 0.4},
        {names[0]: 2.5, names[1]: 0.3},
    ]
    for epoch, losses in enumerate(histories):
        metrics = {f"train_loss_epoch/{k}": v for k, v in losses.items()}
        cb.on_train_epoch_end(trainer, trainer.module, epoch, metrics)
    after = trainer.current_loss_coeffs()
    assert after != before
    assert after[names[0]] > before[names[0]]
    # coeff vector is f32 on device: normalization holds to f32 roundoff
    assert abs(sum(after.values()) - 1.0) < 1e-6


def test_softadapt_state_roundtrip():
    cb = SoftAdapt(beta=1.1, interval="epoch", frequency=2)
    cb.prev_losses = {"forces": 1.0}
    cb.cached_coeffs = [{"forces": 0.5}]
    cb2 = SoftAdapt(beta=9.9, interval="batch", frequency=1)
    cb2.load_state_dict(cb.state_dict())
    assert cb2.beta == 1.1 and cb2.frequency == 2
    assert cb2.prev_losses == {"forces": 1.0}
