"""ConFIG: conflict-free inverse gradients for multitask (E/F/S) training.

Parity: ``ConFIGLightningModule`` (``/root/reference/nequip/train/config.py``,
method from arXiv:2408.11104):

* compute the gradient of *each* loss component separately;
* row-normalize the gradient matrix A (k x P) and solve ``A x = b`` in the
  least-squares sense, where b is the normalized coefficient vector;
* the conflict-free update is ``(sum_i g_i . x_hat) * x_hat``.

In JAX the k backward passes come from one ``jax.jacrev`` over the vector of
loss-component values — no retain_graph bookkeeping.  Combines with EMA via
``EMAConFIGTrainModule``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .state import TrainState
from .training_module import EMATrainModule, NequIPTrainModule


class ConFIGTrainModule(NequIPTrainModule):
    def __init__(
        self,
        *args,
        gradient_clip_val: Optional[float] = None,
        gradient_clip_algorithm: str = "norm",
        lsqr: bool = True,
        norm_eps: float = 1e-8,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.gradient_clip_val = gradient_clip_val
        self.gradient_clip_algorithm = gradient_clip_algorithm
        self.lsqr = lsqr
        self.norm_eps = float(norm_eps)
        self._loss_component_names = [
            e["name"] for e in self.loss.entries if self.loss.coeffs[e["name"]] is not None
        ]
        assert len(self._loss_component_names) >= 1

    def make_train_step(self, axis_name: Optional[str] = None):
        loss_mgr = self.loss
        model = self.model
        names = self._loss_component_names
        eps = self.norm_eps

        def train_step(state: TrainState, batch: dict, loss_coeffs=None, lr_scale=None):
            def components(params):
                out = model(params, batch)
                bs = loss_mgr.batch_state(out, batch)
                if axis_name is not None:
                    bs = loss_mgr.psum_batch(bs, axis_name)
                _, values = loss_mgr.values(bs)
                comp = jnp.stack([values[n] for n in names])
                return comp, (bs, values)

            # k backward passes in one jacrev
            jac, (bsums, values) = jax.jacrev(components, has_aux=True)(state.params)
            flat_grads = []
            treedef = None
            for i in range(len(names)):
                leaves = jax.tree.leaves(jax.tree.map(lambda g: g[i], jac))
                flat_grads.append(
                    jnp.concatenate([l.reshape(-1) for l in leaves])
                )
                if treedef is None:
                    struct = jax.tree.structure(state.params)
                    shapes = [l.shape[1:] if False else l[i].shape for l in []]
            A_raw = jnp.stack(flat_grads)  # (k, P)
            A = A_raw / (
                jnp.linalg.norm(A_raw, axis=1, keepdims=True) + eps
            )
            if loss_coeffs is not None:
                b = jnp.asarray(
                    [
                        loss_coeffs[i]
                        for i, e in enumerate(loss_mgr.entries)
                        if loss_mgr.coeffs[e["name"]] is not None
                    ]
                ).astype(A.dtype)
            else:
                b = jnp.asarray(
                    [loss_mgr.coeffs[n] for n in names], dtype=A.dtype
                )
            b = b / (jnp.linalg.norm(b) + eps)
            if self.lsqr:
                x = jnp.linalg.lstsq(A, b)[0]
            else:
                x = jnp.linalg.pinv(A) @ b
            x = x / (jnp.linalg.norm(x) + eps)
            new_grad_flat = jnp.sum(A_raw @ x) * x  # (P,)

            # unflatten back onto the params pytree
            leaves, treedef = jax.tree.flatten(state.params)
            out_leaves = []
            off = 0
            for l in leaves:
                n = l.size
                out_leaves.append(
                    new_grad_flat[off : off + n].reshape(l.shape).astype(l.dtype)
                )
                off += n
            grads = jax.tree.unflatten(treedef, out_leaves)

            if self.gradient_clip_val is not None:
                if self.gradient_clip_algorithm == "norm":
                    gnorm = optax.global_norm(grads)
                    scale = jnp.minimum(1.0, self.gradient_clip_val / (gnorm + 1e-12))
                    grads = jax.tree.map(lambda g: g * scale, grads)
                else:
                    grads = jax.tree.map(
                        lambda g: jnp.clip(
                            g, -self.gradient_clip_val, self.gradient_clip_val
                        ),
                        grads,
                    )

            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            if lr_scale is not None:
                updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                loss_state=(
                    loss_mgr.accumulate(state.loss_state, bsums)
                    if state.loss_state is not None
                    else None
                ),
            )
            new_state = self._post_optimizer_step(new_state)
            logs = {f"train_loss_step/{k}": v for k, v in values.items()}
            return new_state, logs

        return train_step


class EMAConFIGTrainModule(EMATrainModule, ConFIGTrainModule):
    """ConFIG update + EMA of weights (parity: ``EMAConFIGLightningModule``)."""

    def make_train_step(self, axis_name: Optional[str] = None):
        return ConFIGTrainModule.make_train_step(self, axis_name)


ConFIGLightningModule = ConFIGTrainModule
EMAConFIGLightningModule = EMAConFIGTrainModule
