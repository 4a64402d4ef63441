"""ControlNet training CLI.

Rebuild of the reference ``accelerate launch diffusers_train_controlnet.py
--config config.json`` entry point (/root/reference/controlnet_train/
diffusers_train_controlnet.py:530-991). Device parallelism comes from the
JAX mesh (``--n-model`` sets the tensor-parallel factor; the rest of the
chips do data parallelism) instead of accelerate/NCCL.
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="json or yaml config")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--n-model", type=int, default=1, help="tensor-parallel factor")
    args, extras = ap.parse_known_args()

    import jax

    import dreammat_tpu
    import dreammat_tpu.systems  # registry
    from dreammat_tpu.data.controlnet_dataset import ControlNetDataset
    from dreammat_tpu.parallel import distributed as dist
    from dreammat_tpu.parallel.mesh import make_mesh
    from dreammat_tpu.utils.config import merge_dicts, parse_dotlist

    # multi-host DP (reference: HF accelerate DDP init,
    # diffusers_train_controlnet.py:535-540); no-op on single host
    proc_id, proc_n = dist.maybe_initialize()
    if proc_n > 1:
        dreammat_tpu.info("multi-host: process %d/%d", proc_id, proc_n)

    if args.config.endswith(".json"):
        with open(args.config) as f:
            raw = json.load(f)
    else:
        import yaml

        with open(args.config) as f:
            raw = yaml.safe_load(f)
    if extras:
        raw = merge_dicts(raw, parse_dotlist(extras))

    # accept the reference config.json key names
    key_map = {
        "train_data_dir": "train_data_dir",
        "prompt_file_path": "prompt_file",
        "sd_cache_dir": "sd_cache_dir",
        "controlnet_dir": "controlnet_dir",
        "resolution": "resolution",
        "train_batch_size": "train_batch_size",
        "num_train_epochs": "num_train_epochs",
        "learning_rate": "learning_rate",
        "checkpointing_steps": "checkpointing_steps",
        "validation_steps": "validation_steps",
        "use_cfg": "use_cfg",
        "seed": "seed",
        "lr_scheduler": "lr_scheduler",
        "lr_warmup_steps": "lr_warmup_steps",
        "model_size": "model_size",
    }
    data_dir = raw.get("train_data_dir")
    prompt_file = raw.get("prompt_file_path", raw.get("prompt_file"))
    out_dir = raw.get("controlnet_dir", "model/controlnet")
    trainer_cfg = {
        v: raw[k] for k, v in key_map.items()
        if k in raw and v not in ("train_data_dir", "prompt_file")
    }

    trainer = dreammat_tpu.find("controlnet-trainer")(trainer_cfg)
    dataset = ControlNetDataset(
        data_dir, prompt_file,
        resolution=trainer.cfg.resolution,
        use_cfg=trainer.cfg.use_cfg,
        seed=trainer.cfg.seed,
    )
    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev // args.n_model, n_model=args.n_model) if n_dev > 1 else None
    dreammat_tpu.info("training on %d devices (mesh=%s)", n_dev,
                      dict(mesh.shape) if mesh else None)
    trainer.fit(dataset, out_dir, mesh=mesh, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
