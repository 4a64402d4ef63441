import os

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
import dreammat_tpu.models  # registry
from dreammat_tpu.models import exporter as exp_lib
from dreammat_tpu.models.mesh import make_icosphere


def test_smart_unwrap_properties():
    m = make_icosphere(2)
    v_tex, t_tex_idx = exp_lib.smart_unwrap(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    F = np.asarray(m.t_pos_idx).shape[0]
    assert v_tex.shape == (F * 3, 2)
    assert t_tex_idx.shape == (F, 3)
    assert np.isfinite(v_tex).all()
    assert v_tex.min() >= 0.0 and v_tex.max() <= 1.0


def test_uv_rasterization_coverage():
    m = make_icosphere(1)
    v_tex, t_tex_idx = exp_lib.smart_unwrap(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    out = exp_lib.rasterize_uv_texels(v_tex, t_tex_idx, 128)
    hit = np.asarray(out["hit"])
    faces = np.asarray(out["face"])[hit]
    F = np.asarray(m.t_pos_idx).shape[0]
    covered = len(np.unique(faces)) / F
    # nearly every face owns at least one texel at 128^2 for 80 faces
    assert covered > 0.9, covered
    # charts should fill a reasonable fraction of the atlas
    assert 0.05 < hit.mean() < 0.95


def test_inpaint_padding_fills():
    img = jnp.zeros((16, 16, 3))
    valid = jnp.zeros((16, 16), bool)
    img = img.at[8, 8].set(jnp.asarray([1.0, 0.5, 0.25]))
    valid = valid.at[8, 8].set(True)
    out = exp_lib.inpaint_padding(img, valid, iters=12)
    # neighborhood filled with the seed color
    assert np.allclose(np.asarray(out[8, 12]), [1.0, 0.5, 0.25], atol=1e-3)
    assert np.allclose(np.asarray(out[4, 8]), [1.0, 0.5, 0.25], atol=1e-3)


def test_constant_field_bakes_constant_texture(tmp_path):
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {"environment_texture": "/nonexistent", "n_environments": 1,
         "env_height": 8, "env_width": 16,
         "diffuse_sample_num": 8, "specular_sample_num": 4}
    )
    params = geo.init(jax.random.PRNGKey(0))
    # zero the field -> sigmoid(0)=0.5 everywhere -> constant maps
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    ex = exp_lib.MeshExporter({"texture_size": 64}, geo, mat)
    obj = ex.export_obj_with_mtl(params, str(tmp_path))
    assert os.path.exists(obj)
    from PIL import Image

    kd = np.asarray(Image.open(tmp_path / "texture_kd.jpg"), dtype=np.float32) / 255.0
    # constant sigmoid(0)=0.5 albedo on covered texels (far-background texels
    # beyond the inpainting ring stay 0, like the reference's uninpainted bg)
    v_tex, t_tex_idx = exp_lib.smart_unwrap(
        np.asarray(geo.isosurface().v_pos), np.asarray(geo.isosurface().t_pos_idx)
    )
    rast = exp_lib.rasterize_uv_texels(v_tex, t_tex_idx, 64)
    valid = np.asarray(rast["hit"]).reshape(64, 64)
    assert abs(kd[valid].mean() - 0.5) < 0.03
    assert kd[valid].std() < 0.03
