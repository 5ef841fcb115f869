"""WandbWatch observability gate (wandb mocked: not in the image).

Parity: the reference's WandbWatch streams weight/gradient histograms via
wandb.watch; the JAX equivalent logs per-leaf weight histograms/norms and
update (parameter-delta) histograms at epoch ends.
"""

import sys
import types

import numpy as np


def test_histograms_and_updates(monkeypatch):
    logged = []

    fake = types.ModuleType("wandb")

    class FakeHistogram:
        def __init__(self, arr):
            self.size = np.asarray(arr).size

    class FakeRun:
        def log(self, logs, step=None):
            logged.append((step, logs))

    fake.Histogram = FakeHistogram
    fake.init = lambda **kw: FakeRun()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from nequip_tpu.train.callbacks.wandb_watch import WandbWatch

    class FakeState:
        params = {"layer": {"w": np.arange(6.0).reshape(2, 3)}}

    class FakeTrainer:
        state = FakeState()

    trainer = FakeTrainer()
    cb = WandbWatch()
    cb.on_train_start(trainer, None)

    cb.on_train_epoch_end(trainer, None, 0, {"loss": 1.0})
    step, logs = logged[-1]
    assert step == 0 and logs["loss"] == 1.0
    assert isinstance(logs["weights/layer/w"], FakeHistogram)
    np.testing.assert_allclose(
        logs["weights_norm/layer/w"], np.linalg.norm(np.arange(6.0))
    )
    # first epoch delta vs the on_train_start snapshot is zero
    np.testing.assert_allclose(logs["updates_norm/layer/w"], 0.0)

    # params change -> update histogram reflects the delta
    trainer.state.params = {"layer": {"w": np.arange(6.0).reshape(2, 3) + 2.0}}
    cb.on_train_epoch_end(trainer, None, 1, {"loss": 0.5})
    _, logs = logged[-1]
    np.testing.assert_allclose(
        logs["updates_norm/layer/w"], np.linalg.norm(np.full(6, 2.0))
    )


def test_noop_without_wandb(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name == "wandb":
            raise ImportError("no wandb")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    monkeypatch.delitem(sys.modules, "wandb", raising=False)

    from nequip_tpu.train.callbacks.wandb_watch import WandbWatch

    cb = WandbWatch()
    cb.on_train_start(None, None)  # must not raise
    cb.on_train_epoch_end(None, None, 0, {})
