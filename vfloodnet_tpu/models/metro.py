"""In-process body-mesh regression (METRO-equivalent).

The reference shells out to a separate python process running
MeshTransformer/METRO over file IPC (estimation/object_detection.py:319-325;
scripts/inference_bodymesh.py): HRNet-w64 features + a 3-stage BERT encoder
regress SMPL mesh vertices, orthographically projected to 2-D and written to
``*_pred.txt``. Here the same capability runs in-process on TPU:

- CNN grid features (ResNet-50 trunk — the reference's HRNet-w64 is an
  off-the-shelf backbone choice, not a structural requirement; SURVEY.md
  §2.3 plans the JAX re-design, not a weight-for-weight port),
- joint+vertex query tokens with a 3-stage transformer encoder of shrinking
  widths (mirroring METRO's [1024, 256, 128] stage dims),
- 3-D coordinate regression + orthographic camera (scale, tx, ty),
- :func:`project_orthographic` produces the [-1, 1] 2-D vertices the depth
  pipeline consumes (object_detection.py:350-364).
"""

from __future__ import annotations

import warnings
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .resnet import ResNet50Backbone

NUM_JOINTS = 14
NUM_VERTICES = 431    # METRO's coarse SMPL mesh


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 4
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class EncoderStage(nn.Module):
    dim: int
    layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)
        for i in range(self.layers):
            x = TransformerBlock(self.dim, dtype=self.dtype,
                                 name=f"block{i}")(x)
        return x


class BodyMeshRegressor(nn.Module):
    """224x224 person crop -> (verts_3d [V, 3], joints_3d [J, 3],
    camera [3]).

    ``backbone``: 'resnet50' (default, lighter) or 'hrnet64' (the
    reference METRO's HRNet-w64 grid-feature extractor)."""
    stage_dims: Tuple[int, ...] = (1024, 256, 128)
    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crop01: jnp.ndarray):
        """crop01 [224, 224, 3] RGB in [0, 1]."""
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = ((crop01 - mean) / std)[None]
        if self.backbone == "hrnet64":
            from .hrnet import HRNet
            feat, _ = HRNet(width=64, dtype=self.dtype, name="backbone")(
                x.astype(self.dtype))                     # [1, 7, 7, 2048]
        else:
            feat, _, _, _ = ResNet50Backbone(dtype=self.dtype,
                                             name="backbone")(
                x.astype(self.dtype))                     # [1, 14, 14, 1024]
        grid = jnp.mean(feat[0], axis=(0, 1))             # global feat

        n_tok = NUM_JOINTS + NUM_VERTICES
        queries = self.param("token_embed", nn.initializers.normal(0.02),
                             (n_tok, 512))
        tokens = jnp.concatenate(
            [queries, jnp.broadcast_to(grid[None], (n_tok, grid.shape[0]))],
            axis=-1)

        h = tokens[None]
        for si, dim in enumerate(self.stage_dims):
            h = EncoderStage(dim, dtype=self.dtype, name=f"stage{si}")(h)
        coords = nn.Dense(3, dtype=self.dtype, name="coord_head")(h)[0]

        cam = nn.Dense(3, dtype=self.dtype, name="cam_head")(
            h[0].mean(axis=0))
        # stabilise scale around 1
        cam = jnp.concatenate([1.0 + cam[:1], cam[1:]])

        joints = coords[:NUM_JOINTS]
        verts = coords[NUM_JOINTS:]
        return verts.astype(jnp.float32), joints.astype(jnp.float32), \
            cam.astype(jnp.float32)


def project_orthographic(verts_3d: jnp.ndarray, cam: jnp.ndarray
                         ) -> jnp.ndarray:
    """METRO's weak-perspective projection: 2d = s * xy + t, output in
    [-1, 1] crop coordinates."""
    s, tx, ty = cam[0], cam[1], cam[2]
    return s * verts_3d[:, :2] + jnp.stack([tx, ty])


def load_default_mesh_regressor(model_path: Optional[str] = None):
    """Returns a MeshRegressor callable (numpy crop -> [V, 2] in [-1, 1])."""
    import os

    model = BodyMeshRegressor()
    path = model_path or "records/bodymesh_tpu"
    if path and os.path.isdir(path):
        from ..core.checkpoint import restore_checkpoint
        dummy = model.init(jax.random.PRNGKey(0), jnp.zeros((224, 224, 3)))
        variables = restore_checkpoint(path, target=dummy)
    else:
        warnings.warn(f"No body-mesh checkpoint at {path!r}; random init "
                      "(smoke mode).")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((224, 224, 3)))

    apply_fn = jax.jit(lambda c: model.apply(variables, c))

    def regressor(crop_bgr: np.ndarray) -> np.ndarray:
        crop = crop_bgr[..., ::-1].astype(np.float32) / 255.0
        verts, joints, cam = apply_fn(jax.device_put(np.ascontiguousarray(crop)))
        pts = project_orthographic(verts, cam)
        return np.asarray(jax.device_get(pts))

    return regressor
