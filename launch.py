"""CLI entry point.

Rebuild of the reference launcher
(/root/reference/threestudio_dreammat/launch.py:42-246): same flag surface
(--config, --train/--validate/--test/--export, dotted overrides) minus the
CUDA_VISIBLE_DEVICES juggling — device selection on TPU is the runtime's
job; multi-chip runs configure a mesh via ``parallel.topology`` instead.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config yaml")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--export", action="store_true")
    parser.add_argument("--resume", default=None, help="checkpoint to resume from")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument(
        "--typecheck", action="store_true",
        help="enable runtime NaN checking (jax_debug_nans), the TPU analogue "
             "of the reference's --typecheck/anomaly asserts",
    )
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace into this dir")
    parser.add_argument(
        "--gpu", default=None,
        help="accepted for reference-CLI parity; device selection is the TPU runtime's job",
    )
    args, extras = parser.parse_known_args(argv)

    import jax

    import dreammat_tpu
    import dreammat_tpu.data  # noqa: F401 (registry)
    import dreammat_tpu.models  # noqa: F401
    import dreammat_tpu.systems  # noqa: F401
    from dreammat_tpu.parallel import distributed as dist
    from dreammat_tpu.utils.config import load_config

    # multi-host process group (no-op on single host; reference analog is
    # Lightning's DDP env plumbing, launch.py:44-59 + utils/misc.py:104-120)
    proc_id, proc_n = dist.maybe_initialize()
    if proc_n > 1:
        dreammat_tpu.info("multi-host: process %d/%d", proc_id, proc_n)

    if args.verbose:
        import logging

        dreammat_tpu.logger.setLevel(logging.DEBUG)

    if args.typecheck:
        from dreammat_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging()

    cfg = load_config(args.config, cli_args=extras)
    dreammat_tpu.info("devices: %s", jax.devices())
    dreammat_tpu.info("trial dir: %s", cfg.trial_dir)
    os.makedirs(cfg.trial_dir, exist_ok=True)
    if dist.is_rank_zero():
        with open(os.path.join(cfg.trial_dir, "cmd.txt"), "w") as f:
            f.write(" ".join(["python"] + sys.argv) + "\n")
    # config snapshot (reference callbacks.py:97-111), rank 0 only
    import shutil

    if dist.is_rank_zero():
        shutil.copy(args.config, os.path.join(cfg.trial_dir, "parsed.yaml"))
    # code snapshot of git-tracked files (reference callbacks.py:60-95)
    try:
        import subprocess

        files = subprocess.run(
            ["git", "ls-files"], capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.split()
        snap = os.path.join(cfg.trial_dir, "code_snapshot")
        if not dist.is_rank_zero():
            files = []
        for rel in files:
            src = os.path.join(os.path.dirname(os.path.abspath(__file__)), rel)
            dst = os.path.join(snap, rel)
            if os.path.isfile(src):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy(src, dst)
    except Exception:
        pass

    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    datamodule = dreammat_tpu.find(cfg.data_type)(
        cfg.data, system.renderer, system.material
    )

    state = None
    if args.resume:
        from dreammat_tpu.utils.ckpt import load_checkpoint

        state, step = load_checkpoint(args.resume)
        dreammat_tpu.info("resumed from %s at step %d", args.resume, step)

    from dreammat_tpu.utils.profiling import xla_trace

    if args.train:
        with xla_trace(args.profile_dir):
            datamodule.setup()
        state = system.fit(
            datamodule,
            max_steps=cfg.trainer.max_steps,
            state=state,
            seed=cfg.seed,
            trial_dir=cfg.trial_dir,
            val_check_interval=cfg.trainer.val_check_interval,
            checkpoint_every=cfg.checkpoint.every_n_train_steps,
        )
        t_test = time.time()
        system.test(state, datamodule, cfg.trial_dir, cfg.trainer.max_steps)
        dreammat_tpu.info("test render: %.1fs", time.time() - t_test)
        t_exp = time.time()
        system.export(state, cfg.trial_dir)
        dreammat_tpu.info("export: %.1fs", time.time() - t_exp)
    elif args.validate:
        assert state is not None, "--validate requires --resume"
        datamodule.setup()
        system.validation(state, datamodule, cfg.trial_dir, int(state["step"]))
    elif args.test:
        assert state is not None, "--test requires --resume"
        system.test(state, datamodule, cfg.trial_dir, int(state["step"]))
    elif args.export:
        assert state is not None, "--export requires --resume"
        system.export(state, cfg.trial_dir)
    else:
        parser.error("specify one of --train / --validate / --test / --export")


if __name__ == "__main__":
    main()
