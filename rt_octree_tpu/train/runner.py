"""Training/eval/export runner for the GuidanceNet denoiser.

Reference: denoiser/runner.py.  Protocol preserved:
  * Adam (b1=0.9, b2=0.999) with L2 weight decay 5e-4 added to gradients
    (torch-Adam semantics, not decoupled), lr decayed per *epoch* by
    0.1^(epoch/(epochs+1))  (runner.py:19-22)
  * epoch loop; periodic test every ``i_test``; every ``i_save`` a compact
    export ``ts_<epoch>.gnet`` plus a full training checkpoint; resume
    from the highest-numbered checkpoint (utils.py:13-28)
  * test runs the *compacted* model (runner.py:126-160) and reports
    loss + PSNR/SSIM(+LPIPS when weights available)

TPU redesign: the whole optimization step (forward filtering, SMAPE loss,
backward, Adam update) is one jit; mixed precision is bf16 compute inside
the network (no GradScaler needed -- bf16 keeps fp32 range, unlike the
fp16 CUDA AMP path).  Checkpoints are msgpack'd Flax pytrees ({epoch,
params, opt_state}); the inference artifact is the .gnet compact export
(models/guidance_net.py), standing in for TorchScript.
"""

from __future__ import annotations

import functools
import os
import re
from typing import Any, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.guidance_net import (
    GuidanceNet, GuidanceNetCompact, GuidanceNetConfig, compact_and_export,
    init_params)
from ..ops.filtering import guided_filter_batch
from .metrics import LPIPSMetric, PSNRMetric, SSIMMetric, get_loss_fn

CKPT_RE = re.compile(r"^checkpoint_(\d+)\.msgpack$")


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    """Highest-numbered checkpoint_<n>.msgpack (utils.py:13-28)."""
    best, best_n = None, -1
    if os.path.isdir(work_dir):
        for fname in os.listdir(work_dir):
            m = CKPT_RE.match(fname)
            if m and int(m.group(1)) > best_n:
                best_n = int(m.group(1))
                best = os.path.join(work_dir, fname)
    return best


class Runner:
    def __init__(self, args: Any, dataset=None, logger=None):
        self.args = args
        self.dataset = dataset
        self.logger = logger
        self.loss_fn = get_loss_fn(args.loss_fn)
        self.net_cfg = GuidanceNetConfig(
            in_channels=args.in_channels, mid_channels=args.mid_channels,
            num_layers=args.num_layers, num_branches=args.num_branches,
            kernel_levels=args.kernel_levels,
            identity_level=bool(getattr(args, "identity_level", False)))
        self.model = GuidanceNet(self.net_cfg)
        self.epoch = 0
        if args.task in ("train", "test"):
            self.metrics = [PSNRMetric(), SSIMMetric(), LPIPSMetric()]
        self._train_step = None

    # ---- optimizer -------------------------------------------------------

    def lr_at_epoch(self, epoch: int) -> float:
        e = self.args.epochs
        return self.args.lr * 0.1 ** min((epoch - 1) / (e + 1), 1.0)

    def make_optimizer(self):
        # torch Adam weight_decay: wd*p added to the gradient BEFORE the
        # moment updates -> add_decayed_weights comes first in the chain
        return optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(
                lambda step: self._lr_sched(step)),
        )

    def _lr_sched(self, step):
        # per-epoch decay realized as a step schedule
        spe = max(self._steps_per_epoch, 1)
        epoch0 = step // spe  # 0-based epoch index
        frac = jnp.minimum(epoch0 / (self.args.epochs + 1), 1.0)
        return self.args.lr * jnp.power(0.1, frac)

    # ---- jitted step -----------------------------------------------------

    def _build_train_step(self):
        model, loss_fn = self.model, self.loss_fn
        opt = self._optimizer

        @jax.jit
        def step(params, opt_state, aux, img_in, img_gt):
            def loss_of(p):
                aux_nhwc = jnp.moveaxis(aux, 1, -1)
                weight, guidance = model.apply({"params": p}, aux_nhwc)
                out = guided_filter_batch(weight, guidance, img_in,
                                          supports=model.config.supports())
                return loss_fn(out[..., :3], img_gt[..., :3])

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    # ---- checkpointing ---------------------------------------------------

    def save_checkpoint(self, params, opt_state, epoch: int) -> str:
        blob = flax.serialization.to_bytes(
            {"epoch": epoch + 1, "params": params, "opt_state": opt_state})
        path = os.path.join(self.args.work_dir,
                            f"checkpoint_{epoch:06d}.msgpack")
        with open(path, "wb") as f:
            f.write(blob)
        return path

    def load_checkpoint(self, params, opt_state):
        path = find_latest_checkpoint(self.args.work_dir)
        if path is None:
            return params, opt_state, 1, None
        with open(path, "rb") as f:
            blob = f.read()
        target = {"epoch": 0, "params": params, "opt_state": opt_state}
        restored = flax.serialization.from_bytes(target, blob)
        restored = jax.tree.map(jnp.asarray, restored)
        return (restored["params"], restored["opt_state"],
                int(restored["epoch"]), path)

    # ---- tasks -----------------------------------------------------------

    def train(self, params=None):
        args = self.args
        if params is None:
            params = init_params(self.net_cfg, jax.random.PRNGKey(0))
        self._steps_per_epoch = self.dataset.num_batches(
            "train", args.batch_size)
        self._optimizer = self.make_optimizer()
        opt_state = self._optimizer.init(params)
        self._train_step = self._build_train_step()

        params, opt_state, start, ckpt_path = self.load_checkpoint(
            params, opt_state)
        if ckpt_path:
            self.logger.print(f"Load checkpoint from {ckpt_path}")
        else:
            self.logger.print("No checkpoint found")

        for epoch in range(start, args.epochs + 1):
            self.epoch = epoch
            params, opt_state = self.train_one_epoch(params, opt_state)
            if (epoch > start and epoch < args.epochs and
                    epoch % args.i_test == 0):
                self.logger.print(f"Testing at epoch {epoch}...")
                self.test(params, load_ckpt=False,
                          save_dirname=f"test_{epoch:06d}")

        self.logger.print("Test after training")
        self.test(params, load_ckpt=False)
        return params, opt_state

    def train_one_epoch(self, params, opt_state):
        args = self.args
        # loss accumulates on device with a bounded dispatch pipeline
        # (sync every SYNC_EVERY steps): per-step float() serializes on
        # the ~30ms device-link roundtrip, while a fully unsynced epoch
        # floods the link with queued batch transfers
        SYNC_EVERY = 8
        loss_sum, n = None, 0
        if getattr(args, "preload", False):
            aux_all, in_all, gt_all = self.dataset.device_split("train")
            for idx in self.dataset.iter_batch_indices(
                    "train", args.batch_size, shuffle=True,
                    seed=self.epoch):
                idxd = jnp.asarray(idx)
                params, opt_state, loss = self._train_step(
                    params, opt_state, jnp.take(aux_all, idxd, axis=0),
                    jnp.take(in_all, idxd, axis=0),
                    jnp.take(gt_all, idxd, axis=0))
                loss_sum = loss if loss_sum is None else loss_sum + loss
                n += 1
                if n % SYNC_EVERY == 0:
                    float(loss_sum)
        else:
            for aux, img_in, img_gt in self.dataset.iter_batches(
                    "train", args.batch_size, shuffle=True,
                    seed=self.epoch):
                params, opt_state, loss = self._train_step(
                    params, opt_state, jnp.asarray(aux),
                    jnp.asarray(img_in), jnp.asarray(img_gt))
                loss_sum = loss if loss_sum is None else loss_sum + loss
                n += 1
                if n % SYNC_EVERY == 0:
                    float(loss_sum)
        avg_loss = float(loss_sum) if n else 0.0

        if self.epoch % args.i_print == 0:
            self.logger.log({
                "epoch": self.epoch,
                "train/loss": avg_loss / max(n, 1),
                "train/lr": self.lr_at_epoch(self.epoch),
            })

        if self.epoch % args.i_save == 0:
            self.compact(params, filename=f"ts_{self.epoch:06d}.gnet")
            path = self.save_checkpoint(params, opt_state, self.epoch)
            self.logger.print(f"Save checkpoint at {path}")
        return params, opt_state

    def test(self, params=None, load_ckpt: bool = True,
             save_dirname: str = "test"):
        args = self.args
        if load_ckpt:
            if params is None:
                params = init_params(self.net_cfg, jax.random.PRNGKey(0))
            path = find_latest_checkpoint(args.work_dir)
            if path is None:
                self.logger.print("No checkpoint found.")
                return
            self.logger.print(f"Load checkpoint from {path}")
            with open(path, "rb") as f:
                restored = flax.serialization.from_bytes(
                    {"epoch": 0, "params": params, "opt_state": None},
                    f.read())
            params = jax.tree.map(jnp.asarray, restored["params"])
        self.test_one_epoch(params, save_dirname)

    def test_one_epoch(self, params, save_dirname: str):
        args = self.args
        save_dir = os.path.join(args.work_dir, save_dirname)

        compact_model, folded = self.compact(params, filename="")
        apply = _make_compact_filter(compact_model)

        for m in self.metrics:
            m.reset()
        avg_loss, n = 0.0, 0
        for idx, (aux, img_in, img_gt) in enumerate(self.dataset.iter_batches(
                "test", 1)):
            out = apply(folded, jnp.asarray(aux), jnp.asarray(img_in))
            loss = self.loss_fn(out[..., :3], jnp.asarray(img_gt[..., :3]))
            avg_loss += float(loss)
            n += 1
            out_np = np.asarray(out)
            for m in self.metrics:
                if m.available():
                    m.measure(out_np[..., :3], img_gt[..., :3])
            if args.save_image:
                self.logger.log_image(out_np, save_dir, "r", idx,
                                      {"epoch": self.epoch})

        logs = {"epoch": self.epoch, "test/loss": avg_loss / max(n, 1)}
        for m in self.metrics:
            if m.available():
                logs[f"test/{m.name()}"] = m.result()
            else:
                logs[f"test/{m.name()}"] = "unavailable (no local weights)"
        self.logger.log(logs)

    def compact(self, params=None, load_ckpt: bool = False,
                filename: str = "ts_latest.gnet"):
        """Fold to the single-conv inference model and export .gnet
        (runner.py:162-175)."""
        args = self.args
        if params is None or load_ckpt:
            if params is None:
                params = init_params(self.net_cfg, jax.random.PRNGKey(0))
            path = find_latest_checkpoint(args.work_dir)
            if path is not None:
                self.logger.print(f"Load checkpoint from {path}")
                with open(path, "rb") as f:
                    restored = flax.serialization.from_bytes(
                        {"epoch": 0, "params": params, "opt_state": None},
                        f.read())
                params = jax.tree.map(jnp.asarray, restored["params"])
        out_path = (os.path.join(args.work_dir, filename) if filename else "")
        return compact_and_export(self.net_cfg, params, out_path)


@functools.cache
def _make_compact_filter(compact_model: GuidanceNetCompact):
    @jax.jit
    def apply(folded, aux, img_in):
        aux_nhwc = jnp.moveaxis(aux, 1, -1)
        weight, guidance = compact_model.apply({"params": folded}, aux_nhwc)
        return guided_filter_batch(weight, guidance, img_in,
                                   supports=compact_model.config.supports())
    return apply


def seed_everything(seed: int) -> None:
    """np/python seeding (utils.py:6-11); JAX randomness is explicit keys."""
    import random
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
