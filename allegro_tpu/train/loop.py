"""Data-parallel training loop.

Replaces the reference's Lightning ``Trainer`` + DDP/NCCL data parallelism
(``configs/tutorial.yaml:31-39``, SURVEY.md §2.3) the TPU way: per-device
padded sub-batches are stacked on a leading device axis, sharded over a
``jax.sharding.Mesh`` 'dp' axis, the per-row model is ``vmap``-ped, and XLA
inserts the gradient all-reduce over ICI automatically — one jitted step
function, compiled once (static shapes come from the DataLoader).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import keys
from ..model.builders import Model
from .loss import EnergyForceLoss, EnergyForceMetrics


def shard_stack(batches: List[Dict]) -> Dict:
    """Stack per-device batches along a new leading device axis."""
    out = {}
    for k in batches[0]:
        out[k] = np.stack([np.asarray(b[k]) for b in batches], axis=0)
    return out


def _empty_like_batch(batch: Dict) -> Dict:
    """An all-padding batch (used to fill the last device rows of an epoch)."""
    out = {}
    for k, v in batch.items():
        if k in (keys.NODE_MASK, keys.EDGE_MASK, keys.FRAME_MASK):
            out[k] = np.zeros_like(v)
        elif k == keys.NUM_NODES:
            out[k] = np.zeros_like(v)
        else:
            out[k] = np.asarray(v)
    return out


@dataclasses.dataclass
class TrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: int


class Trainer:
    """Minimal full-featured trainer: fit/validate/test with EMA + best ckpt."""

    def __init__(
        self,
        model: Model,
        optimizer: optax.GradientTransformation | None = None,
        learning_rate: float = 1e-3,
        loss: Optional[EnergyForceLoss] = None,
        metrics: Optional[EnergyForceMetrics] = None,
        ema_decay: float = 0.999,
        # torch_ema `use_num_updates` warmup (the reference EMALightningModule
        # default): effective decay at update t is
        # min(ema_decay, (1 + t) / (10 + t)) — early updates track the raw
        # params closely instead of being pinned to the (random) init
        ema_use_num_updates: bool = True,
        mesh: Optional[jax.sharding.Mesh] = None,
        log_every: int = 10,
        logger: Callable[[str], None] = print,
        profile_dir: Optional[str] = None,
        profile_steps: Tuple[int, int] = (5, 10),
    ):
        self.model = model
        self.optimizer = optimizer or optax.adam(learning_rate)
        self.loss = loss or EnergyForceLoss()
        self.metrics = metrics or EnergyForceMetrics()
        self.ema_decay = float(ema_decay)
        self.ema_use_num_updates = bool(ema_use_num_updates)
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = jax.sharding.Mesh(devs, ("dp",))
        self.mesh = mesh
        self.n_dev = int(np.prod(mesh.devices.shape))
        self.log_every = log_every
        self.logger = logger
        # jax.profiler trace of steps [profile_steps) written to profile_dir
        # (TensorBoard/xprof-viewable) — SURVEY.md §5 tracing subsystem
        self.profile_dir = profile_dir
        self.profile_steps = tuple(profile_steps)
        self._step_fn = None
        self._eval_fn = None
        self.history: List[Dict[str, float]] = []

    # --- sharding helpers ---
    def _shardings(self):
        P = jax.sharding.PartitionSpec
        data_sh = jax.sharding.NamedSharding(self.mesh, P("dp"))
        rep_sh = jax.sharding.NamedSharding(self.mesh, P())
        return data_sh, rep_sh

    def _device_batches(self, loader_iter) -> Iterable[Dict]:
        """Group `n_dev` loader batches into one stacked super-batch."""
        group: List[Dict] = []
        for b in loader_iter:
            group.append(b)
            if len(group) == self.n_dev:
                yield shard_stack(group)
                group = []
        if group:
            filler = _empty_like_batch(group[0])
            while len(group) < self.n_dev:
                group.append(filler)
            yield shard_stack(group)

    # --- compiled steps ---
    def _make_step(self):
        apply_fn = self.model.apply_with_derivatives
        loss_fn_obj = self.loss
        optimizer = self.optimizer
        ema_decay = self.ema_decay
        ema_warmup = self.ema_use_num_updates

        def loss_for_params(params, batch):
            def one_row(row):
                pred = apply_fn(params, row)
                loss, terms = loss_fn_obj(pred, row)
                return loss, terms

            losses, terms = jax.vmap(one_row)(batch)
            return jnp.mean(losses), jax.tree.map(jnp.mean, terms)

        def step(params, ema_params, opt_state, batch, t):
            (loss, terms), grads = jax.value_and_grad(loss_for_params, has_aux=True)(
                params, batch
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema_warmup:
                tf = t.astype(jnp.float32)
                decay = jnp.minimum(ema_decay, (1.0 + tf) / (10.0 + tf))
            else:
                decay = jnp.asarray(ema_decay, jnp.float32)
            ema_params = jax.tree.map(
                lambda e, p: (decay * e + (1.0 - decay) * p).astype(p.dtype),
                ema_params, params,
            )
            return params, ema_params, opt_state, loss, terms

        data_sh, rep_sh = self._shardings()
        return jax.jit(
            step,
            in_shardings=(rep_sh, rep_sh, rep_sh, data_sh, rep_sh),
            out_shardings=(rep_sh, rep_sh, rep_sh, rep_sh, rep_sh),
            donate_argnums=(0, 1, 2),
        )

    def _make_eval(self):
        apply_fn = self.model.apply_with_derivatives
        metrics_obj = self.metrics

        def evaluate(params, batch):
            def one_row(row):
                pred = apply_fn(params, row)
                m = metrics_obj(pred, row)
                # weight by real counts for correct cross-batch averaging
                fm = row[keys.FRAME_MASK].sum()
                nm = row[keys.NODE_MASK].sum()
                return m, fm, nm

            m, fm, nm = jax.vmap(one_row)(batch)
            w_frames = fm / jnp.maximum(fm.sum(), 1.0)
            w_nodes = nm / jnp.maximum(nm.sum(), 1.0)
            out = {}
            for k, v in m.items():
                w = w_nodes if k.startswith("forces") else w_frames
                out[k] = jnp.sum(v * w)
            out["_n_frames"] = fm.sum()
            out["_n_nodes"] = nm.sum()
            return out

        data_sh, rep_sh = self._shardings()
        return jax.jit(evaluate, in_shardings=(rep_sh, data_sh), out_shardings=rep_sh)

    # --- public API ---
    def init_state(self, seed: int, example_batch: Dict) -> TrainState:
        params = self.model.init(seed, example_batch)
        return TrainState(
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=self.optimizer.init(params),
            step=0,
        )

    def fit(
        self,
        state: TrainState,
        train_loader,
        val_loader=None,
        max_epochs: int = 1,
        ckpt_dir: Optional[str] = None,
    ) -> TrainState:
        if self._step_fn is None:
            self._step_fn = self._make_step()
        best = np.inf
        for epoch in range(max_epochs):
            t0 = time.time()
            losses = []
            for batch in self._device_batches(iter(train_loader)):
                if self.profile_dir and state.step == self.profile_steps[0]:
                    jax.profiler.start_trace(self.profile_dir)
                state.params, state.ema_params, state.opt_state, loss, terms = (
                    self._step_fn(
                        state.params, state.ema_params, state.opt_state, batch,
                        jnp.asarray(state.step, jnp.int32),
                    )
                )
                state.step += 1
                if self.profile_dir and state.step == self.profile_steps[1]:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                losses.append(float(loss))
                if state.step % self.log_every == 0:
                    self.logger(
                        f"epoch {epoch} step {state.step} loss {float(loss):.6f} "
                        + " ".join(f"{k}={float(v):.6f}" for k, v in terms.items())
                    )
            rec = {"epoch": epoch, "train_loss": float(np.mean(losses)), "time": time.time() - t0}
            if val_loader is not None:
                val = self.evaluate(state.ema_params, val_loader)
                rec.update({f"val_{k}": v for k, v in val.items()})
                score = val.get("forces_mae", val.get("per_atom_energy_mae", np.inf))
                if ckpt_dir is not None and score < best:
                    best = score
                    from .checkpoint import save_checkpoint

                    save_checkpoint(ckpt_dir, state, name="best")
            if ckpt_dir is not None:
                from .checkpoint import save_checkpoint

                save_checkpoint(ckpt_dir, state, name="last")
            self.history.append(rec)
            self.logger(
                "  ".join(
                    f"{k}={v:.6f}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in rec.items()
                )
            )
        return state

    def evaluate(self, params, loader) -> Dict[str, float]:
        if self._eval_fn is None:
            self._eval_fn = self._make_eval()
        acc: Dict[str, float] = {}
        tot_frames = tot_nodes = 0.0
        for batch in self._device_batches(iter(loader)):
            m = self._eval_fn(params, batch)
            nf, nn = float(m.pop("_n_frames")), float(m.pop("_n_nodes"))
            for k, v in m.items():
                w = nn if k.startswith("forces") else nf
                acc[k] = acc.get(k, 0.0) + float(v) * w
            tot_frames += nf
            tot_nodes += nn
        out = {}
        for k, v in acc.items():
            w = tot_nodes if k.startswith("forces") else tot_frames
            out[k] = v / max(w, 1.0)
        return out
