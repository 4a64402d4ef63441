"""Streamed (scan+remat) shading must match the unchunked estimator."""

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
import dreammat_tpu.models  # registry
from dreammat_tpu.models.mesh import make_icosphere
from dreammat_tpu.ops import bvh as bvh_lib
from dreammat_tpu.ops import visibility as vis_lib
from dreammat_tpu.utils import ops as uops


def _rig(chunk):
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent",
            "n_environments": 1,
            "env_height": 16,
            "env_width": 32,
            "diffuse_sample_num": 24,
            "specular_sample_num": 12,
            "shading_chunk": chunk,
        }
    )
    m = make_icosphere(1)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    baked = vis_lib.bake_vertex_visibility(bvh, m.v_pos, m.v_nrm, oct_res=8)
    mat.set_baked_visibility(baked)
    return mat, m


def _shade(mat, m, is_train):
    P = 12
    key = jax.random.PRNGKey(0)
    normals = uops.safe_normalize(jax.random.normal(key, (P, 3)))
    view = uops.safe_normalize(normals + 0.2 * jax.random.normal(jax.random.PRNGKey(9), (P, 3)))
    tri = jnp.zeros((P, 3), jnp.int32)
    bary = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (P, 1))
    metallic = jnp.full((P, 1), 0.4)
    rough = jnp.full((P, 1), 0.3)
    albedo = jnp.tile(jnp.asarray([[0.7, 0.5, 0.3]]), (P, 1))
    return mat.shade_raytracing(
        jnp.zeros((P, 3)), normals, view, jnp.int32(0), metallic, rough, albedo,
        jax.random.PRNGKey(5), is_train=is_train, mask=jnp.ones(P, bool),
        vis_data=(tri, bary),
    )


def test_streamed_matches_unchunked_eval():
    mat0, m = _rig(chunk=0)
    mat1, _ = _rig(chunk=8)   # 24 % 8 == 0, 12 % 8 != 0 -> padded chunk path
    a = _shade(mat0, m, is_train=False)
    b = _shade(mat1, m, is_train=False)
    for k in ("color", "diffuse_color", "specular_color", "diffuse_light", "specular_light"):
        assert np.allclose(np.asarray(a[k]), np.asarray(b[k]), atol=2e-4), (
            k, np.abs(np.asarray(a[k]) - np.asarray(b[k])).max()
        )


def test_streamed_grad_flows():
    mat1, m = _rig(chunk=8)
    P = 6
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (P, 1))
    tri = jnp.zeros((P, 3), jnp.int32)
    bary = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (P, 1))

    def loss(feats):
        out, _ = mat1(
            jnp.zeros((P, 3)), feats, feats, normals, normals,
            jnp.int32(0), jax.random.PRNGKey(1), is_train=True,
            mask=jnp.ones(P, bool), vis_data=(tri, bary),
        )
        return jnp.sum(out["color"])

    g = jax.grad(loss)(jnp.zeros((P, 5)))
    gmax = float(jnp.abs(g).max())
    assert 0 < gmax < 1e4  # nonzero and bounded (subsumes finite)
