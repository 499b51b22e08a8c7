"""SR3 training loop: optimizer, EMA, checkpoint/resume, dp sharding.

Parity target: /root/reference models/sr3_model/model.py (DDPM
optimize_parameters:51-61, save_network/load_network:127-170) and the train
hyperparameters of configs/sr_sr3.json:78-92 (adam 1e-4, ema 0.9999 from
step 5000, train schedule linear 2000 steps [1e-6, 1e-2]).

TPU design: the train step is one jitted function (loss + grad + adam + EMA)
with the batch sharded over the ('data','tile') mesh; gradients are reduced
by XLA from the sharding annotations (the P2 nn.DataParallel mapping).
Checkpoints are orbax: <dir>/I{iter}_gen (params) and _state (opt/EMA/step),
mirroring the reference's *_gen.pth / *_opt.pth split.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedules import ddpm_buffers, make_beta_schedule
from ..models.sr3 import SR3Diffusion, SR3UNet, SR3UNetConfig, sr3_loss
from ..utils import checkpoint as ckpt
from .ema import EmaState, ema_init, ema_update


@dataclasses.dataclass
class SR3TrainConfig:
    lr: float = 1e-4
    n_iter: int = 1_000_000
    ema_decay: float = 0.9999
    step_start_ema: int = 5000
    schedule: str = "linear"
    n_timestep: int = 2000
    linear_start: float = 1e-6
    linear_end: float = 1e-2
    loss_type: str = "l1"
    save_every: int = 100_000


class SR3Trainer:
    def __init__(self, model_cfg: SR3UNetConfig, train_cfg: SR3TrainConfig,
                 mesh=None, rng: jax.Array | None = None):
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.mesh = mesh
        self.model = SR3UNet(model_cfg)
        self.diff = SR3Diffusion.from_schedule(
            train_cfg.schedule, train_cfg.n_timestep, train_cfg.linear_start,
            train_cfg.linear_end)
        self.tx = optax.adam(train_cfg.lr)

        rng = jax.random.PRNGKey(0) if rng is None else rng
        s = model_cfg.image_size
        self.params = self.model.init(rng, jnp.zeros((1, s, s, 6)),
                                      jnp.ones((1, 1)))
        self.opt_state = self.tx.init(self.params)
        self.ema = ema_init(self.params)
        if mesh is not None:
            # pod-scale: the train state must be a GLOBAL (replicated)
            # array over the mesh or the jitted step's device sets clash
            # (identity when single-process)
            from ..parallel import replicate_state
            self.params, self.opt_state, self.ema = replicate_state(
                mesh, (self.params, self.opt_state, self.ema))
        self.step = 0
        self._apply = lambda p, x, nl: self.model.apply(p, x, nl)
        self._train_step = jax.jit(self._step_fn)

    def _step_fn(self, params, opt_state, ema, hr, sr, rng):
        loss, grads = jax.value_and_grad(
            lambda p: sr3_loss(self.diff, self._apply, p, hr, sr, rng,
                               self.cfg.loss_type))(params)
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, self.cfg.ema_decay)
        return params, opt_state, ema, loss

    def train_step(self, hr, sr, rng) -> float:
        """hr/sr: [N,H,W,3] in [-1,1] (HR target, bicubic-upsampled LR).

        Single-process: N is the global batch. Multi-process (pod-scale,
        parallel/distributed.py): N is THIS HOST's shard of the global
        batch — each host loads local_batch_range(global_N) rows and the
        global array is assembled shard-by-shard (no host materializes
        the full batch); `rng` must be process-uniform (the same key on
        every host), as with any SPMD JAX program."""
        if self.mesh is not None:
            from ..parallel import put_batch
            hr = put_batch(self.mesh, hr)
            sr = put_batch(self.mesh, sr)
        self.params, self.opt_state, self.ema, loss = self._train_step(
            self.params, self.opt_state, self.ema, hr, sr, rng)
        self.step += 1
        return float(loss)

    def fit(self, data_iter: Iterator, steps: int, rng: jax.Array,
            log_every: int = 100, save_dir: str | None = None):
        for i in range(steps):
            hr, sr = next(data_iter)
            rng, sub = jax.random.split(rng)
            loss = self.train_step(jnp.asarray(hr), jnp.asarray(sr), sub)
            if i % log_every == 0:
                print(f"step {self.step}: loss {loss:.5f}")
            if save_dir and self.step % self.cfg.save_every == 0:
                self.save(save_dir)
        return self

    # ----- checkpoint/resume (save_network/load_network parity) -----
    def save(self, directory: str | Path):
        d = Path(directory)
        ckpt.save_orbax(self.params, d / f"I{self.step}_gen")
        ckpt.save_orbax(
            dict(opt_state=self.opt_state, ema_params=self.ema.params,
                 ema_step=self.ema.step, step=jnp.asarray(self.step)),
            d / f"I{self.step}_state")

    def load(self, directory: str | Path, it: int):
        d = Path(directory)
        self.params = ckpt.load_orbax(d / f"I{it}_gen")
        state = ckpt.load_orbax(d / f"I{it}_state")
        self.opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.opt_state),
            jax.tree_util.tree_leaves(state["opt_state"]))
        self.ema = EmaState(params=state["ema_params"], step=state["ema_step"])
        self.step = int(state["step"])
        return self
