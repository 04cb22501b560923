"""PSPNet + body-mesh regressor graph tests (CPU, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from vfloodnet_tpu.models.metro import (NUM_JOINTS, NUM_VERTICES,
                                        BodyMeshRegressor,
                                        project_orthographic)
from vfloodnet_tpu.models.pspnet import PSPNet


def test_pspnet_shapes():
    model = PSPNet(num_classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    aux, logits = model.apply(v, x)
    # dilated trunk keeps 1/8 resolution
    assert logits.shape == (1, 8, 8, 7)
    assert aux.shape == (1, 8, 8, 7)
    assert bool(jnp.isfinite(logits).all())


def test_body_mesh_regressor():
    model = BodyMeshRegressor(stage_dims=(128, 64))
    crop = jnp.zeros((224, 224, 3))
    v = model.init(jax.random.PRNGKey(0), crop)
    verts, joints, cam = model.apply(v, crop)
    assert verts.shape == (NUM_VERTICES, 3)
    assert joints.shape == (NUM_JOINTS, 3)
    assert cam.shape == (3,)
    pts = project_orthographic(verts, cam)
    assert pts.shape == (NUM_VERTICES, 2)
    assert bool(jnp.isfinite(pts).all())


def test_project_orthographic():
    verts = jnp.asarray([[0.5, -0.5, 2.0], [0.0, 0.0, 1.0]])
    cam = jnp.asarray([2.0, 0.1, -0.1])
    pts = np.asarray(project_orthographic(verts, cam))
    np.testing.assert_allclose(pts, [[1.1, -1.1], [0.1, -0.1]], atol=1e-6)


def test_hrnet_backbone():
    from vfloodnet_tpu.models.hrnet import HRNet
    m = HRNet(width=16)   # slim width for the test; w64 same graph
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    agg, high = m.apply(v, x)
    assert agg.shape == (1, 2, 2, 2048)    # /32 aggregated grid
    assert high.shape == (1, 16, 16, 16)   # /4 highest-res branch
    assert bool(jnp.isfinite(agg).all())


def test_body_mesh_hrnet_variant():
    model = BodyMeshRegressor(stage_dims=(64,), backbone="hrnet64")
    crop = jnp.zeros((224, 224, 3))
    v = model.init(jax.random.PRNGKey(0), crop)
    verts, joints, cam = model.apply(v, crop)
    assert verts.shape == (NUM_VERTICES, 3)
