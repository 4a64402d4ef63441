"""Driver-independent end-to-end evidence artifact (VERDICT r4 next #5).

Runs the REAL user path — ``launch.py --train`` at flagship resolution
(random SD weights; no trained weights exist in this image) — on the
attached chip, times every phase (prerender / compile+first step / warm
train steps / test render / export) from wall-clock around the
subprocess plus the log lines launch.py already emits, and records a
fixed-seed render fingerprint (mean RGB + sha256 of the first test
view) so the wall-clock story is auditable round-over-round the way
BENCH_r* is. Reference run recipe: cmd/run_examples.sh:1-7.

Usage: python tools/e2e_evidence.py [--steps 30] [--views 8] [--out reports/e2e_r5.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--views", type=int, default=8,
                    help="fixed prerender views (flagship is 128; 8 keeps "
                    "the artifact run ~15 min while exercising the same "
                    "jitted shapes)")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--mesh", default="/root/reference/threestudio_dreammat/"
                    "load/shapes/objs/apple.obj")
    ap.add_argument("--out", default="reports/e2e_r5.json")
    ap.add_argument("--tag", default="e2e_evidence")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trial = os.path.join(repo, "outputs", "dream_mat", args.tag)
    H = args.res
    cmd = [
        sys.executable, "launch.py", "--config", "configs/dreammat.yaml",
        "--train",  # the train branch runs test + export afterwards
        "system.prompt_processor.prompt=a red apple",
        f"system.geometry.shape_init=mesh:{args.mesh}",
        "system.geometry.shape_init_params=0.7",
        "system.geometry.shape_init_mesh_up=+y",
        "system.geometry.shape_init_mesh_front=+z",
        f"trainer.max_steps={args.steps}",
        f"data.fix_view_num={args.views}", "data.fix_env_num=2",
        f"data.width={H}", f"data.height={H}",
        f"data.eval_width={H}", f"data.eval_height={H}",
        "data.n_test_views=2", "seed=0",
        f"name=dream_mat", f"tag={args.tag}", "use_timestamp=false",
        "trainer.val_check_interval=0",
        # keep the artifact run hermetic: no cross-run prerender reuse
        f"data.prerender_cache_dir={trial}/.pre_cache",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                          timeout=3600)
    wall = time.time() - t0
    log = proc.stdout + proc.stderr
    sys.stdout.write(log[-4000:])
    if proc.returncode != 0:
        print(f"\n[e2e] launch.py FAILED rc={proc.returncode}")
        sys.exit(1)

    def grab(pattern):
        m = re.search(pattern, log)
        return float(m.group(1)) if m else None

    phases = {
        "prerender_gbuffers_s": grab(r"G-buffers for \d+ views in ([\d.]+)s"),
        "prerender_bakes_s": grab(r"mesh-wide bakes in ([\d.]+)s"),
        "prerender_probes_tables_s": grab(r"probes\+tables for \d+ views in ([\d.]+)s"),
        "static_maps_s": grab(r"static field maps for [\d/]+ views \(\d+ MB\) in ([\d.]+)s"),
        "first_step_incl_compile_s": grab(r"first step \(incl\. compile\): ([\d.]+)s"),
        "warm_steps_per_sec": (
            float(re.findall(r"\(([\d.]+) it/s warm\)", log)[-1])
            if re.findall(r"\(([\d.]+) it/s warm\)", log) else None
        ),
        "test_render_s": grab(r"test render: ([\d.]+)s"),
        "export_s": grab(r"export: ([\d.]+)s"),
    }

    # fixed-seed render fingerprint: first test view of the final render
    import numpy as np
    from PIL import Image

    fp = {}
    save = os.path.join(trial, "save")
    tests = sorted(
        d for d in os.listdir(save)
        if d.startswith("it") and d.endswith("-test")
        and os.path.isdir(os.path.join(save, d))
    ) if os.path.isdir(save) else []
    if tests:
        png = os.path.join(save, tests[-1], "0.png")
        arr = np.asarray(Image.open(png))
        fp = {
            "file": os.path.relpath(png, repo),
            "mean_rgb": [round(float(c), 3) for c in arr[..., :3].reshape(-1, 3).mean(0)],
            "sha256": hashlib.sha256(arr.tobytes()).hexdigest()[:16],
        }
    export_dir = os.path.join(save, "export")
    exported = sorted(os.listdir(export_dir)) if os.path.isdir(export_dir) else []

    row = {
        "artifact": "e2e_evidence", "date": time.strftime("%Y-%m-%d"),
        "cmd": " ".join(cmd[1:]),
        "resolution": H, "views": args.views, "steps": args.steps,
        "total_wall_s": round(wall, 1),
        "phases": phases,
        "render_fingerprint": fp,
        "export_files": exported,
        "weights": "random-init (no trained SD weights in image)",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(row, fh, indent=1)
    print(f"\n[e2e] wrote {args.out}")
    print(json.dumps(row["phases"]))


if __name__ == "__main__":
    main()
