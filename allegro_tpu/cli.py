"""Command-line entry points.

TPU-native counterpart of the nequip CLIs driven by the reference config
(SURVEY.md L7: ``nequip-train`` / ``nequip-compile`` / ``nequip-package``):

    python -m allegro_tpu train   -c configs/tutorial.yaml
    python -m allegro_tpu test    -c configs/tutorial.yaml --ckpt <dir>
    python -m allegro_tpu compile -c configs/tutorial.yaml --ckpt <dir> -o model.atpu
    python -m allegro_tpu md      -c configs/md.yaml

The ``run:`` list in the config (like ``configs/tutorial.yaml:2`` in the
reference) chains stages when invoked as ``python -m allegro_tpu run -c ...``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, Optional


def _build_data(cfg: Dict[str, Any], seed: int = 0):
    """Build (train, val, test) datasets + loaders from the ``data`` block."""
    from .data import DataLoader, InMemoryDataset
    from .data.datasets import sgdml_npz_dataset, synthetic_molecular_frames

    dcfg = dict(cfg)
    target = dcfg.pop("_target_", "synthetic")
    r_max = float(dcfg.pop("r_max"))
    split = dcfg.pop("split", {"train": 0.8, "val": 0.1, "test": 0.1})
    batch_size = int(dcfg.pop("batch_size", 1))
    type_names = dcfg.pop("type_names", None)
    shuffle_seed = int(dcfg.pop("seed", seed))
    if target.endswith("sgdml_npz_dataset"):
        ds = sgdml_npz_dataset(dcfg.pop("path"), r_max=r_max, type_names=type_names)
    elif target.endswith("extxyz_dataset"):
        from .data.xyz import extxyz_dataset

        ds = extxyz_dataset(dcfg.pop("path"), r_max=r_max, type_names=type_names)
    else:
        frames = synthetic_molecular_frames(
            n_frames=int(dcfg.pop("n_frames", 64)),
            n_atoms=int(dcfg.pop("n_atoms", 21)),
            n_types=len(type_names) if type_names else 3,
            spread=float(dcfg.pop("spread", 1.8)),
            seed=shuffle_seed,
        )
        ds = InMemoryDataset(frames, r_max=r_max, type_names=type_names)
    import numpy as np

    n = len(ds)
    idx = np.random.RandomState(shuffle_seed).permutation(n)

    def _take(sel):
        sub = InMemoryDataset.__new__(InMemoryDataset)
        sub.r_max = ds.r_max
        sub.type_names = ds.type_names
        sub.frames = [ds.frames[int(i)] for i in sel]
        return sub

    sizes = {}
    for k, v in split.items():
        sizes[k] = int(v * n) if isinstance(v, float) and v <= 1.0 else int(v)
    ofs = 0
    parts = {}
    for k in ("train", "val", "test"):
        if k in sizes:
            parts[k] = _take(idx[ofs : ofs + sizes[k]])
            ofs += sizes[k]
    loaders = {
        k: DataLoader(v, batch_size=batch_size, shuffle=(k == "train"), seed=shuffle_seed)
        for k, v in parts.items()
    }
    return parts, loaders


def run_train(config: Dict[str, Any], workdir: str) -> str:
    import optax

    from .data import compute_statistics
    from .train import EnergyForceLoss, Trainer
    from .train.config import build_model, resolve

    os.makedirs(workdir, exist_ok=True)
    parts, loaders = _build_data(config["data"])
    stats = compute_statistics(parts["train"])
    print(f"dataset statistics: {json.dumps({k: v for k, v in stats.items()})}")
    cfg = resolve(config, stats)
    model = build_model(cfg["model"])
    tcfg = dict(cfg.get("trainer", {}))
    opt_cfg = dict(tcfg.pop("optimizer", {"learning_rate": 1e-3}))
    opt_target = str(opt_cfg.pop("_target_", "optax.adam")).rsplit(".", 1)[-1]
    lr = float(opt_cfg.pop("learning_rate", opt_cfg.pop("lr", 1e-3)))
    sched_cfg = tcfg.pop("lr_scheduler", None)
    if sched_cfg:
        scfg = dict(sched_cfg)
        s_target = str(scfg.pop("_target_", "optax.exponential_decay")).rsplit(".", 1)[-1]
        sched_fn = getattr(optax, s_target)
        lr = sched_fn(init_value=lr, **{k: v for k, v in scfg.items()})
    opt_fn = getattr(optax, opt_target, optax.adam)
    optimizer = opt_fn(lr, **{k: v for k, v in opt_cfg.items()})
    trainer = Trainer(
        model,
        optimizer=optimizer,
        loss=EnergyForceLoss(tcfg.pop("loss_coeffs", None)),
        ema_decay=float(tcfg.pop("ema_decay", 0.999)),
        ema_use_num_updates=bool(tcfg.pop("ema_use_num_updates", True)),
        log_every=int(tcfg.pop("log_every", 10)),
        profile_dir=tcfg.pop("profile_dir", None),
    )
    seed = int(cfg.get("model", {}).get("seed", 0))
    state = trainer.init_state(seed, next(iter(loaders["train"])))
    state = trainer.fit(
        state,
        loaders["train"],
        val_loader=loaders.get("val"),
        max_epochs=int(tcfg.pop("max_epochs", 5)),
        ckpt_dir=workdir,
    )
    with open(os.path.join(workdir, "resolved_config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    print(f"checkpoints written to {workdir}")
    return workdir


def run_test(config: Dict[str, Any], workdir: str, ckpt: Optional[str] = None) -> Dict:
    from .data import compute_statistics
    from .train import Trainer, load_checkpoint
    from .train.config import build_model, resolve

    parts, loaders = _build_data(config["data"])
    stats = compute_statistics(parts["train"])
    cfg = resolve(config, stats)
    model = build_model(cfg["model"])
    trainer = Trainer(model)
    state = trainer.init_state(0, next(iter(loaders["test"])))
    ckpt_dir = ckpt or workdir
    try:
        state = load_checkpoint(ckpt_dir, "best", template=state)
    except Exception:
        state = load_checkpoint(ckpt_dir, "last", template=state)
    metrics = trainer.evaluate(state.ema_params, loaders["test"])
    print("test metrics: " + json.dumps(metrics))
    return metrics


def run_compile(config: Dict[str, Any], workdir: str, ckpt: Optional[str], output: str):
    from .compile import compile_model

    return compile_model(config, workdir, ckpt, output)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="allegro_tpu")
    p.add_argument(
        "command",
        choices=["train", "test", "run", "compile", "package", "md", "benchmark"],
    )
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-w", "--workdir", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("-o", "--output", default="model.atpu")
    args = p.parse_args(argv)

    from .train.config import load_config

    config = load_config(args.config)
    # global options (role of the reference's global_options.allow_tf32,
    # configs/tutorial.yaml:166-167): on TPU, f32 matmuls default to the
    # MXU's bf16-multiply path; "highest" forces full f32 precision.
    gopt = config.get("global_options", {}) or {}
    if "matmul_precision" in gopt:
        import jax

        jax.config.update("jax_default_matmul_precision", str(gopt["matmul_precision"]))
    if gopt.get("allow_tf32") is False:
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    workdir = args.workdir or os.path.join(
        "outputs", os.path.splitext(os.path.basename(args.config))[0]
    )
    if args.command == "run":
        stages = config.get("run", ["train", "test"])
    else:
        stages = [args.command]
    for stage in stages:
        if stage == "train":
            run_train(config, workdir)
        elif stage == "test":
            run_test(config, workdir, ckpt=args.ckpt)
        elif stage == "compile":
            run_compile(config, workdir, args.ckpt, args.output)
        elif stage == "package":
            from .train.package import run_package

            run_package(config, workdir, args.ckpt, args.output or "model.atpkg")
        elif stage == "md":
            from .md.cli import run_md

            run_md(config, workdir)
        elif stage == "benchmark":
            from .bench import run_benchmark_stage

            run_benchmark_stage(config, workdir)
        else:
            raise ValueError(f"unknown stage {stage}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
