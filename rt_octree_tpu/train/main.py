"""Denoiser training entry point: `python -m rt_octree_tpu.train.main`.

Reference: denoiser/main.py:16-60.  Tasks: train / test / compact.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .config import parse_args
from .dataset import DatasetConfig, make_dataset
from .logger import BaseLogger, WandbLogger
from .runner import Runner, seed_everything


def _honor_env_platforms() -> None:
    """Make JAX_PLATFORMS authoritative (same contract as apps/cli.py):
    a site hook registers the remote-TPU backend as the default platform
    regardless of the env var; applying the env value through jax.config
    restores `JAX_PLATFORMS=cpu` training when the tunnel is down."""
    import os
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            import jax
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass


def main(argv: Optional[Sequence[str]] = None) -> None:
    _honor_env_platforms()
    args = parse_args(argv)
    seed_everything(0)

    logger = WandbLogger(args) if args.use_wandb else BaseLogger(args)

    if args.task == "compact":
        runner = Runner(args, logger=logger)
        runner.compact(load_ckpt=True)
        return

    dataset = make_dataset(DatasetConfig(
        data_dir=args.data_dir, dataset_type=args.dataset_type,
        spp=args.spp, nx=args.nx, ny=args.ny,
        in_channels=args.in_channels, task=args.task))
    logger.print("Dataset loaded.")

    runner = Runner(args, dataset=dataset, logger=logger)
    if args.task == "train":
        runner.train()
    elif args.task == "test":
        runner.test()
    else:
        raise NotImplementedError(f"Invalid task type: {args.task}.")


if __name__ == "__main__":
    main()
