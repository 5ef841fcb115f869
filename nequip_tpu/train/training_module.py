"""Training modules: model + loss + metrics + optimizer as pure step functions.

Parity: ``NequIPLightningModule`` / ``EMALightningModule``
(``/root/reference/nequip/train/lightning.py``, ``ema.py``) re-designed
TPU-first:

* the training step is one pure function ``(TrainState, batch) ->
  (TrainState, logs)`` that jits once per batch bucket and runs entirely
  on device;
* under data parallelism the same step runs inside ``shard_map`` with
  gradient ``pmean`` over the mesh (see ``nequip_tpu.parallel``) — the
  reference's ``loss * world_size`` DDP-compensation trick
  (``lightning.py:259-267``) is unnecessary because the mean is explicit;
* EMA is a pair of extra pytree fields updated in the same step.

Config-schema compatibility: ``NequIPLightningModule`` and
``EMALightningModule`` are importable aliases.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data import _keys
from ..nn.graph_model import GraphModel
from ..utils.config import instantiate
from .ema import ema_update
from .metrics_manager import MetricsManager
from .state import TrainState


def _build_optimizer(cfg) -> optax.GradientTransformation:
    if isinstance(cfg, optax.GradientTransformation):
        return cfg
    if cfg is None:
        return optax.adam(1e-3)
    if isinstance(cfg, dict) and "_target_" in cfg:
        obj = instantiate(cfg)
        assert isinstance(obj, optax.GradientTransformation), (
            f"optimizer config must produce an optax.GradientTransformation, got {type(obj)}"
        )
        return obj
    raise TypeError(f"cannot interpret optimizer config {cfg!r}")


def _frozen_label_tree(params, frozen_paths) -> Any:
    """Label pytree: 'frozen' for leaves under a frozen path, else 'trainable'."""

    def rec(node, prefix):
        if isinstance(node, dict):
            return {k: rec(v, f"{prefix}{k}." if prefix else f"{k}.") for k, v in node.items()}
        path = prefix[:-1]
        frozen = any(path == fp or path.startswith(fp + ".") for fp in frozen_paths)
        return "frozen" if frozen else "trainable"

    return rec(params, "")


class NequIPTrainModule:
    """Holds (possibly multiple) GraphModels + loss/metrics + optimizer."""

    def __init__(
        self,
        model: Union[dict, GraphModel],
        loss: Union[dict, MetricsManager, None] = None,
        val_metrics: Union[dict, MetricsManager, None] = None,
        train_metrics: Union[dict, MetricsManager, None] = None,
        test_metrics: Union[dict, MetricsManager, None] = None,
        optimizer: Optional[dict] = None,
        lr_scheduler: Optional[dict] = None,
        gradient_clip_val: Optional[float] = None,
        seed: Optional[int] = None,
    ):
        self.model_config = model if isinstance(model, dict) else None
        # NOT recursive: nested configs (e.g. pair_potential) are builder
        # arguments that the model builder instantiates itself with the
        # required type_names/irreps context
        self.model: GraphModel = (
            instantiate(model, _recursive_=False) if isinstance(model, dict) else model
        )
        self.seed = seed if seed is not None else getattr(self.model, "seed", 0)

        def _mgr(cfg):
            if cfg is None or isinstance(cfg, MetricsManager):
                return cfg
            return instantiate(cfg)

        self.loss = _mgr(loss)
        self.val_metrics = _mgr(val_metrics)
        self.train_metrics = _mgr(train_metrics)
        self.test_metrics = _mgr(test_metrics) or self.val_metrics

        self.optimizer_config = optimizer
        self.lr_scheduler_config = lr_scheduler
        self.gradient_clip_val = gradient_clip_val
        base_opt = _build_optimizer(optimizer)
        if gradient_clip_val is not None:
            base_opt = optax.chain(
                optax.clip_by_global_norm(float(gradient_clip_val)), base_opt
            )
        if lr_scheduler is not None:
            sched = instantiate(lr_scheduler)
            base_opt = optax.chain(base_opt, optax.scale_by_schedule(sched))
        frozen = self.model.frozen_param_paths()
        if frozen:
            self._frozen_paths = sorted(frozen)
            self.optimizer = None  # built per-params in init_state
            self._base_opt = base_opt
        else:
            self._frozen_paths = []
            self.optimizer = base_opt
            self._base_opt = base_opt

    # --- state ---------------------------------------------------------
    def _opt_for(self, params) -> optax.GradientTransformation:
        if not self._frozen_paths:
            return self._base_opt
        labels = _frozen_label_tree(params, self._frozen_paths)
        return optax.multi_transform(
            {"trainable": self._base_opt, "frozen": optax.set_to_zero()}, labels
        )

    def init_state(self, rng=None) -> TrainState:
        params = self.model.init(
            rng if rng is not None else jax.random.PRNGKey(self.seed)
        )
        opt = self._opt_for(params)
        self.optimizer = opt
        return TrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=opt.init(params),
            rng=jax.random.PRNGKey(self.seed),
            ema_params=None,
            ema_step=None,
            loss_state=self.loss.init_state() if self.loss else None,
        )

    # --- evaluation params (EMA-aware in subclass) ---------------------
    def evaluation_params(self, state: TrainState):
        return state.params

    # --- steps ---------------------------------------------------------
    def make_train_step(self, axis_name: Optional[str] = None) -> Callable:
        model, loss_mgr = self.model, self.loss
        assert loss_mgr is not None, "training requires a loss"

        # force/stress losses differentiate through ForceStressOutput's
        # jax.grad — second-order AD does not flow through the fused Pallas
        # kernels' custom_vjp, so training must use the XLA TP path
        from ..data import _keys as _k
        from ..nn.tp_scatter import TensorProductScatter

        uses_derivative_loss = any(
            e["mod"].field in (_k.FORCE_KEY, _k.STRESS_KEY, _k.VIRIAL_KEY)
            for e in loss_mgr.entries
        )
        if uses_derivative_loss:
            def _check(m):
                if isinstance(m, TensorProductScatter):
                    assert m.impl == "xla", (
                        "training with force/stress losses requires "
                        "tp_impl='xla' (the fused Pallas kernels are "
                        "first-order only; they are for inference/MD)"
                    )
                if hasattr(m, "module_dict"):
                    for v in m.module_dict.values():
                        _check(v)
                for attr in ("model", "func", "conv", "tp_scatter"):
                    v = getattr(m, attr, None)
                    if v is not None and hasattr(v, "irreps_in"):
                        _check(v)

            _check(model)

        def train_step(state: TrainState, batch: dict, loss_coeffs=None):
            def loss_fn(params):
                out = model(params, batch)
                bs = loss_mgr.batch_state(out, batch)
                if axis_name is not None:
                    # psum the masked error sums BEFORE forming the loss: the
                    # loss is then the exact global-batch loss, and the psum'd
                    # gradients below are its exact gradient — strictly better
                    # than DDP's mean-of-per-rank-means (which depends on how
                    # real atoms are distributed across ranks).
                    bs = loss_mgr.psum_batch(bs, axis_name)
                loss, values = loss_mgr.values(bs, coeffs_vec=loss_coeffs)
                return loss, (bs, values)

            (loss, (bs, values)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if axis_name is not None:
                grads = jax.lax.psum(grads, axis_name)
            # self.optimizer is finalized by init_state (frozen-param masking
            # needs the params structure); tracing happens after that.
            # extra-args transforms (e.g. optax.contrib.reduce_on_plateau)
            # receive the loss value.
            if isinstance(self.optimizer, optax.GradientTransformationExtraArgs):
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params, value=loss
                )
            else:
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params
                )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                loss_state=(
                    loss_mgr.accumulate(state.loss_state, bs)
                    if state.loss_state is not None
                    else None
                ),
            )
            new_state = self._post_optimizer_step(new_state)
            logs = {f"train_loss_step/{k}": v for k, v in values.items()}
            logs["train_loss_step/weighted_sum"] = loss
            return new_state, logs

        return train_step

    def _post_optimizer_step(self, state: TrainState) -> TrainState:
        return state

    def make_eval_step(self, metrics: Optional[MetricsManager] = None) -> Callable:
        model = self.model
        metrics = metrics or self.val_metrics

        def eval_step(params, metrics_state, batch):
            out = model(params, batch)
            if metrics is not None:
                metrics_state = metrics.update_state(metrics_state, out, batch)
            return metrics_state, out

        return eval_step

    # --- persistence ---------------------------------------------------
    def hyperparameters(self) -> dict:
        return {
            "model": self.model_config or getattr(self.model, "model_config", None),
            "optimizer": self.optimizer_config,
            "lr_scheduler": self.lr_scheduler_config,
            "gradient_clip_val": self.gradient_clip_val,
            "seed": self.seed,
            "_target_": f"{type(self).__module__}.{type(self).__name__}",
        }


class EMATrainModule(NequIPTrainModule):
    """EMA of weights; evaluation/checkpoint-export uses the EMA weights.

    Parity: ``EMALightningModule`` (``train/ema.py:15-245``).
    """

    def __init__(self, *args, ema_decay: float = 0.999, **kwargs):
        super().__init__(*args, **kwargs)
        self.ema_decay = float(ema_decay)

    def init_state(self, rng=None) -> TrainState:
        state = super().init_state(rng)
        return state.replace(
            ema_params=jax.tree.map(jnp.array, state.params),
            ema_step=jnp.zeros((), dtype=jnp.int32),
        )

    def _post_optimizer_step(self, state: TrainState) -> TrainState:
        ema_params, ema_step = ema_update(
            state.ema_params, state.params, state.ema_step, self.ema_decay
        )
        return state.replace(ema_params=ema_params, ema_step=ema_step)

    def evaluation_params(self, state: TrainState):
        return state.ema_params

    def hyperparameters(self) -> dict:
        hp = super().hyperparameters()
        hp["ema_decay"] = self.ema_decay
        return hp


# config-schema-compatible aliases (the reference's class names)
NequIPLightningModule = NequIPTrainModule
EMALightningModule = EMATrainModule
