"""Measure the per-view static-maps build (ops/hashgrid.build_encode_maps)
at flagship scale on hardware.

Round-2 context: the UNJITTED build cost ~16.5 s/view over the axon tunnel
(313 s for 19 flagship views — ~5 eager dispatches x 16 levels x 2 maps,
each paying tunnel dispatch latency). Jitted it should cost roughly the
device time of the 16 argsorts. This number sets the static-maps rotation
overhead (datamodule.static_maps_rotate): rotation adds one build per
`rotate_every` steps, so build_time/rotate_every must stay well under the
~0.43 s step.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dreammat_tpu.ops import hashgrid as hg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=180224,
                    help="fg pixel budget at 512^2 (~180k measured)")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    cfg = hg.HashGridConfig()  # flagship: L=16, F=2, T=2^19
    keys = jax.random.split(jax.random.PRNGKey(0), args.reps + 1)
    xs = [jax.random.uniform(k, (args.points, 3)) for k in keys]

    t0 = time.time()
    m = hg.build_encode_maps(xs[0], cfg)
    jax.block_until_ready(m.perm)
    print(f"first build (incl. compile): {time.time() - t0:.2f}s")

    t0 = time.time()
    for x in xs[1:]:
        m = hg.build_encode_maps(x, cfg)
    jax.block_until_ready(m.perm)
    per = (time.time() - t0) / args.reps
    nbytes = sum(a.size * a.dtype.itemsize for a in jax.tree_util.tree_leaves(m))
    print(f"warm build: {per*1e3:.0f} ms/view-map ({nbytes/1e6:.0f} MB each; "
          f"a view needs 2 maps: main+jitter)")


if __name__ == "__main__":
    main()
