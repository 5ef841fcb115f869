"""The training loop.

Replaces the reference's Lightning ``Trainer`` + ``NequIPLightningModule``
orchestration (``/root/reference/nequip/scripts/train.py:241-298``,
``train/lightning.py``) with a compact explicit loop:

* jitted pure train/eval steps over ``TrainState`` (one compile per batch
  bucket; state buffers donated so updates are in-place on device);
* per-epoch validation over any number of val dataloaders with
  batch-size-invariant running metrics;
* best/last checkpointing on a monitored metric, full-state restart
  (bit-equivalent resume), callback hooks with checkpointable state;
* run-stage bookkeeping (train -> val -> test sequences).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .checkpoint import load_checkpoint, save_checkpoint, state_from_payload
from .metrics_manager import MetricsManager

log = logging.getLogger("nequip_tpu")


class Trainer:
    def __init__(
        self,
        max_epochs: int = 1,
        max_steps: Optional[int] = None,
        callbacks: Optional[List] = None,
        ckpt_dir: str = "checkpoints",
        check_val_every_n_epoch: int = 1,
        log_every_n_steps: int = 50,
        monitor: str = "val0_epoch/weighted_sum",
        monitor_mode: str = "min",
        save_last: bool = True,
        save_best: bool = True,
        logger: Optional[Any] = None,
        devices: Optional[int] = None,
    ):
        from ..utils.config import instantiate

        self.max_epochs = int(max_epochs)
        self.max_steps = max_steps
        self.callbacks = [
            instantiate(c) if isinstance(c, dict) else c for c in (callbacks or [])
        ]
        self.ckpt_dir = ckpt_dir
        self.check_val_every_n_epoch = int(check_val_every_n_epoch)
        self.log_every_n_steps = int(log_every_n_steps)
        # per-step scalar sync, default on (see the train loop comment)
        self._step_sync = os.environ.get("NEQUIP_STEP_SYNC", "1") == "1"
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        assert monitor_mode in ("min", "max")
        self.save_last = save_last
        self.save_best = save_best
        self.logger = logger
        self.devices = devices

        # runtime state
        self.epoch = 0
        self.global_step = 0
        self.best_monitor: Optional[float] = None
        self.info_dict: Dict[str, Any] = {}  # full run config, set by the CLI
        self.run_index = 0
        self._metrics_rows: List[Dict[str, float]] = []
        self._scalars: Dict[str, float] = {}
        self._lr_scale = jnp.asarray(1.0, dtype=jnp.float32)

    # ------------------------------------------------------------------
    # loss-coefficient runtime control (used by callbacks)
    # ------------------------------------------------------------------
    def set_loss_coeffs(self, coeffs: Dict[str, float]) -> None:
        mgr: MetricsManager = self.module.loss
        total = sum(coeffs.values())
        # np.array (copy): np.asarray of a jax array is a READ-ONLY view of
        # device memory — writing into it raised at the first SoftAdapt
        # update of a real run (r4 regression: test_set_loss_coeffs_runtime)
        vec = np.array(self._loss_coeffs)
        for i, e in enumerate(mgr.entries):
            if e["name"] in coeffs:
                vec[i] = coeffs[e["name"]] / total if total else 0.0
        self._loss_coeffs = jnp.asarray(vec)
        mgr.set_coeffs(
            {e["name"]: float(vec[i]) if vec[i] or mgr.coeffs[e["name"]] is not None else None
             for i, e in enumerate(mgr.entries)}
        )

    def current_loss_coeffs(self) -> Dict[str, float]:
        mgr: MetricsManager = self.module.loss
        vec = np.asarray(self._loss_coeffs)
        return {e["name"]: float(vec[i]) for i, e in enumerate(mgr.entries)}

    def log_scalar(self, name: str, value: float) -> None:
        self._scalars[name] = value

    # ------------------------------------------------------------------
    def _n_devices(self) -> int:
        if self.devices in (None, 1, "1"):
            return 1
        if self.devices == "auto":
            return jax.device_count()
        return int(self.devices)

    def _compile_steps(self, module):
        n_dev = self._n_devices()
        if n_dev > 1:
            # data-parallel training over an ICI mesh.  Exact semantics:
            # masked loss sums are psum'd BEFORE the loss is formed and
            # gradients psum'd after, so every step computes the global-batch
            # gradient (reference: trainer-level DDP, simple_ddp.py:6-59 +
            # docs/guide/accelerations/ddp_training.md — per-rank batch_size,
            # so the effective batch is batch_size * devices).
            from ..parallel import DataParallel
            from ..parallel.mesh import make_mesh

            assert n_dev <= jax.device_count(), (
                f"trainer.devices={n_dev} but only {jax.device_count()} "
                f"JAX devices are visible"
            )
            self._dp = DataParallel(module, make_mesh((n_dev,), ("dp",)))
            self._train_step = self._dp.make_train_step()
            self._eval_steps = {}
            for name, mgr in (("val", module.val_metrics), ("test", module.test_metrics)):
                if mgr is not None:
                    self._eval_steps[name] = self._dp.make_eval_step(mgr)
            log.info(f"data-parallel training over {n_dev} devices")
            return
        self._dp = None
        # donation is default-OFF: input-output-aliased executables run ~30x
        # slower on the measured TPU runtime (utils.global_state.donate_argnums)
        from ..utils.global_state import donate_argnums

        self._train_step = jax.jit(
            module.make_train_step(), donate_argnums=donate_argnums(0)
        )
        self._eval_steps = {}
        for name, mgr in (
            ("val", module.val_metrics),
            ("test", module.test_metrics),
        ):
            if mgr is not None:
                self._eval_steps[name] = jax.jit(
                    module.make_eval_step(mgr), donate_argnums=donate_argnums(1)
                )

    def _batches(self, loader):
        """Iterate a DataLoader, grouping micro-batches into sharded
        super-batches under data parallelism."""
        if getattr(self, "_dp", None) is None:
            yield from loader
        else:
            yield from self._dp.group_batches(iter(loader))

    # ------------------------------------------------------------------
    def fit(self, module, datamodule, ckpt_path: Optional[str] = None) -> None:
        self.module = module
        self.datamodule = datamodule
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        val_loaders = datamodule.val_dataloaders()

        self._compile_steps(module)
        self._loss_coeffs = module.loss.coeff_vector()

        if ckpt_path is not None:
            payload = load_checkpoint(ckpt_path)
            state = state_from_payload(payload, like=module.init_state())
            module.optimizer = module._opt_for(state.params)
            meta = payload["meta"]
            self.epoch = int(meta.get("epoch", 0))
            self.global_step = int(meta.get("global_step", 0))
            self.best_monitor = meta.get("best_monitor")
            self.run_index = int(meta.get("run_index", 0))
            if meta.get("loss_coeffs") is not None:
                self._loss_coeffs = jnp.asarray(meta["loss_coeffs"])
            if meta.get("lr_scale") is not None:
                self._lr_scale = jnp.asarray(meta["lr_scale"], dtype=jnp.float32)
            if (
                meta.get("lr_scheduler_state") is not None
                and getattr(module, "lr_scheduler_obj", None) is not None
            ):
                module.lr_scheduler_obj.load_state_dict(meta["lr_scheduler_state"])
            if meta.get("loss_manager_state") is not None and module.loss:
                module.loss.load_state_dict(meta["loss_manager_state"])
            for cb, sd in zip(self.callbacks, meta.get("callback_states", [])):
                cb.load_state_dict(sd)
            if meta.get("dataloader_state") is not None:
                train_loader.load_state_dict(meta["dataloader_state"])
            log.info(f"resumed from {ckpt_path} at epoch {self.epoch}")
        else:
            state = module.init_state()

        if getattr(self, "_dp", None) is not None:
            state = self._dp.replicate_state(state)
        self.state = state
        for cb in self.callbacks:
            cb.on_train_start(self, module)

        while self.epoch < self.max_epochs:
            if self.max_steps is not None and self.global_step >= self.max_steps:
                break
            epoch_t0 = time.time()
            for cb in self.callbacks:
                cb.on_train_epoch_start(self, module, self.epoch)

            # ---- train epoch ----
            # reset running loss stats
            if module.loss is not None:
                self.state = self.state.replace(loss_state=module.loss.init_state())
            n_batches = 0
            for batch in self._batches(train_loader):
                self.state, logs = self._train_step(
                    self.state, batch, self._loss_coeffs, self._lr_scale
                )
                if self._step_sync:
                    # ONE scalar host sync per step, ON A LEAF OF THE
                    # THREADED STATE: dispatching the next step while the
                    # previous state is in flight takes a ~25x slower client
                    # path on the measured TPU runtime, and syncing a SIDE
                    # output (the loss scalar) does NOT settle the state
                    # handles (ROUND5_NOTES stages 14 vs 16: loss-sync
                    # 12.4 s/step, state.step-sync 0.50 s at 23k atoms).  Do
                    # NOT block_until_ready the whole state — that fetches
                    # it (17.9 s/step).  Costs one dispatch round-trip
                    # (~25 ms); NEQUIP_STEP_SYNC=0 for runtimes where async
                    # chaining is healthy.
                    np.asarray(self.state.step)
                self.global_step += 1
                n_batches += 1
                if self.global_step % self.log_every_n_steps == 0:
                    loss_val = float(logs["train_loss_step/weighted_sum"])
                    log.info(
                        f"epoch {self.epoch} step {self.global_step} "
                        f"loss {loss_val:.6f}"
                    )
                host_logs = None
                for cb in self.callbacks:
                    if hasattr(cb, "on_train_batch_end"):
                        if host_logs is None:
                            host_logs = {k: float(v) for k, v in logs.items()}
                        cb.on_train_batch_end(self, module, host_logs, self.global_step)
                if self.max_steps is not None and self.global_step >= self.max_steps:
                    break

            metrics: Dict[str, float] = {}
            if module.loss is not None and n_batches:
                train_epoch = module.loss.compute(self.state.loss_state)
                metrics.update(
                    {f"train_loss_epoch/{k}": v for k, v in train_epoch.items()}
                )
            if hasattr(train_loader, "padding_waste"):
                metrics["padding_waste"] = train_loader.padding_waste()

            # ---- validation ----
            if (
                val_loaders
                and module.val_metrics is not None
                and (self.epoch + 1) % self.check_val_every_n_epoch == 0
            ):
                metrics.update(self._run_eval("val", val_loaders))

            metrics.update(self._scalars)
            self._scalars = {}
            metrics["epoch"] = self.epoch
            metrics["global_step"] = self.global_step
            metrics["epoch_time"] = time.time() - epoch_t0
            self._metrics_rows.append(metrics)
            self._write_metrics_csv()

            for cb in self.callbacks:
                cb.on_train_epoch_end(self, module, self.epoch, metrics)
                cb.on_validation_epoch_end(self, module, self.epoch, metrics)

            # epoch LR scheduler (reference: lr_scheduler monitor/interval
            # plumbing, lightning.py:175-219) — host decision, traced scalar
            new_scale = module.lr_scheduler_epoch_end(self.epoch, metrics)
            if new_scale is not None:
                if float(new_scale) != float(self._lr_scale):
                    log.info(f"lr scale -> {float(new_scale):.3e}")
                self._lr_scale = jnp.asarray(new_scale, dtype=jnp.float32)
                metrics["lr_scale"] = float(new_scale)

            self.epoch += 1
            self._checkpoint(metrics)

            mon = metrics.get(self.monitor)
            log.info(
                f"epoch {self.epoch - 1} done in {metrics['epoch_time']:.1f}s"
                + (f"; {self.monitor}={mon:.6f}" if mon is not None else "")
            )

    # ------------------------------------------------------------------
    def _run_eval(self, stage: str, loaders) -> Dict[str, float]:
        module = self.module
        mgr = module.val_metrics if stage == "val" else module.test_metrics
        step_fn = self._eval_steps[stage]
        eval_params = module.evaluation_params(self.state)
        out_metrics: Dict[str, float] = {}
        xyz_cbs = [cb for cb in self.callbacks if hasattr(cb, "on_eval_batch")]
        for i, loader in enumerate(loaders):
            mstate = mgr.init_state()
            for batch in self._batches(loader):
                mstate, out = step_fn(eval_params, mstate, batch)
                for cb in xyz_cbs:
                    # under DP the per-device model outputs are not gathered
                    if stage == "test" and out is not None:
                        cb.on_eval_batch(out, batch)
            vals = mgr.compute(mstate)
            prefix = f"{stage}{i}_epoch"
            out_metrics.update({f"{prefix}/{k}": v for k, v in vals.items()})
        return out_metrics

    def predict(self, module, datamodule, ckpt_path: Optional[str] = None):
        """Run the model over the predict dataloaders; returns outputs per
        batch (and feeds any XYZ-writer callbacks)."""
        self.module = module
        datamodule.setup("predict")
        loaders = datamodule.predict_dataloaders() or datamodule.test_dataloaders()
        if ckpt_path is not None:
            if ckpt_path == "best":
                ckpt_path = os.path.join(self.ckpt_dir, "best.ckpt")
            payload = load_checkpoint(ckpt_path)
            self.state = state_from_payload(payload)
        params = module.evaluation_params(self.state)
        import jax

        fwd = jax.jit(lambda p, d: module.model(p, d))
        xyz_cbs = [cb for cb in self.callbacks if hasattr(cb, "on_eval_batch")]
        outputs = []
        for loader in loaders:
            for batch in loader:
                out = fwd(params, batch)
                for cb in xyz_cbs:
                    cb.on_eval_batch(out, batch)
                outputs.append(out)
        for cb in self.callbacks:
            cb.on_test_epoch_end(self, module, {})
        return outputs

    def validate(self, module, datamodule, ckpt_path: Optional[str] = None) -> Dict[str, float]:
        return self._standalone_eval("val", module, datamodule, ckpt_path)

    def test(self, module, datamodule, ckpt_path: Optional[str] = None) -> Dict[str, float]:
        return self._standalone_eval("test", module, datamodule, ckpt_path)

    def _standalone_eval(self, stage, module, datamodule, ckpt_path) -> Dict[str, float]:
        self.module = module
        datamodule.setup(stage)
        loaders = (
            datamodule.val_dataloaders() if stage == "val" else datamodule.test_dataloaders()
        )
        if not hasattr(self, "_eval_steps"):
            self._compile_steps(module)
        if ckpt_path is not None:
            if ckpt_path == "best":
                ckpt_path = os.path.join(self.ckpt_dir, "best.ckpt")
            payload = load_checkpoint(ckpt_path)
            self.state = state_from_payload(payload)
        assert hasattr(self, "state"), "no state: pass ckpt_path or fit first"
        metrics = self._run_eval(stage, loaders)
        for cb in self.callbacks:
            if stage == "test":
                cb.on_test_epoch_end(self, module, metrics)
        for k, v in sorted(metrics.items()):
            log.info(f"{k}: {v:.6f}")
        self._metrics_rows.append(metrics)
        self._write_metrics_csv()
        return metrics

    # ------------------------------------------------------------------
    def _checkpoint(self, metrics: Dict[str, float]) -> None:
        if not (self.save_last or self.save_best):
            return
        os.makedirs(self.ckpt_dir, exist_ok=True)
        meta = {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "best_monitor": self.best_monitor,
            "run_index": self.run_index,
            "loss_coeffs": np.asarray(self._loss_coeffs).tolist(),
            "lr_scale": float(self._lr_scale),
            "lr_scheduler_state": (
                self.module.lr_scheduler_obj.state_dict()
                if getattr(self.module, "lr_scheduler_obj", None) is not None
                else None
            ),
            "loss_manager_state": self.module.loss.state_dict() if self.module.loss else None,
            "callback_states": [cb.state_dict() for cb in self.callbacks],
            "dataloader_state": self.datamodule.train_dataloader().state_dict()
            if hasattr(self, "datamodule")
            else None,
            "metrics": {k: v for k, v in metrics.items()},
        }
        config = dict(self.info_dict)
        config.setdefault("training_module", self.module.hyperparameters())
        if self.save_last:
            save_checkpoint(
                os.path.join(self.ckpt_dir, "last.ckpt"), self.state, config, meta
            )
        mon = metrics.get(self.monitor)
        if self.save_best and mon is not None:
            better = (
                self.best_monitor is None
                or (self.monitor_mode == "min" and mon < self.best_monitor)
                or (self.monitor_mode == "max" and mon > self.best_monitor)
            )
            if better:
                self.best_monitor = float(mon)
                meta["best_monitor"] = self.best_monitor
                save_checkpoint(
                    os.path.join(self.ckpt_dir, "best.ckpt"), self.state, config, meta
                )

    def _write_metrics_csv(self) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        path = os.path.join(self.ckpt_dir, "metrics.csv")
        keys = sorted({k for row in self._metrics_rows for k in row})
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for row in self._metrics_rows:
                f.write(",".join(str(row.get(k, "")) for k in keys) + "\n")
