"""In-process body-mesh regression (METRO).

The reference shells out to a separate python process running
MeshTransformer/METRO over file IPC (estimation/object_detection.py:319-325;
scripts/inference_bodymesh.py): HRNet-w64 features + a 3-stage BERT encoder
regress SMPL mesh vertices, orthographically projected to 2-D and written to
``*_pred.txt``. Here the same capability runs in-process on TPU, at two
fidelity levels:

- :class:`METRONetwork` — the faithful METRO graph
  (inference_bodymesh.py:228-293 builds it from the MeshTransformer
  submodule): SMPL template tokens (14 H36M joints + 431 coarse-mesh
  vertices, held as loadable buffers since SMPL assets are licensed data),
  3 BERT encoder stages with METRO's exact layout (img_embedding +
  position embeddings -> BertLayers -> cls_head + residual; stage dims
  2051->512->128 at hidden 1024/256/128), learned mesh upsampling
  431 -> 1723 -> 6890, the camera FC chain, and METRO's weak-perspective
  projection ``s * (xy + t)``. Weight-convertible from a METRO-layout
  state_dict via :func:`vfloodnet_tpu.core.convert_metro_state_dict`.
- :class:`BodyMeshRegressor` — a lighter TPU-native regressor with the
  same interface (431 projected vertices) for training-from-scratch demos.

:func:`project_orthographic` produces the [-1, 1] 2-D vertices the depth
pipeline consumes (object_detection.py:350-364).
"""

from __future__ import annotations

import warnings
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .resnet import ResNet50Backbone

NUM_JOINTS = 14
NUM_VERTICES = 431    # METRO's coarse SMPL mesh (sub2 downsample)
NUM_VERTICES_SUB = 1723
NUM_VERTICES_FULL = 6890
NUM_H36M_JOINTS = 17
# H36M joint-17 -> joint-14 selection (METRO metro/utils/... cfg.H36M_J17_TO_J14)
H36M_J17_TO_J14 = (0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14)
H36M_PELVIS = 0


# ---------------------------------------------------------------------------
# Faithful METRO graph (BERT layout — convertible from METRO state_dicts)
# ---------------------------------------------------------------------------

class BertSelfAttention(nn.Module):
    """HuggingFace-BERT attention block layout (query/key/value +
    output.dense + output.LayerNorm), as used by METRO's encoder."""
    hidden: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, t, _ = x.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="key")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="value")(x)
        q = q.reshape(n, t, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, t, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, t, self.heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("nhqk,nhkd->nhqd", p, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(n, t, self.hidden)
        out = nn.Dense(self.hidden, dtype=self.dtype, name="out_dense")(ctx)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                            name="out_ln")(out + x)


class BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = BertSelfAttention(self.hidden, self.heads, dtype=self.dtype,
                              name="attention")(x)
        h = nn.Dense(self.intermediate, dtype=self.dtype,
                     name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="output_dense")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                            name="output_ln")(h + x)


class METROStage(nn.Module):
    """One METRO encoder stage (MeshTransformer METRO class): linear image
    embedding + learned position embeddings -> BertEncoder -> cls_head with
    a linear residual from the stage input."""
    hidden: int
    out_dim: int
    layers: int = 4
    heads: int = 4
    intermediate: int = 3072       # METRO 'legacy setting' (fixed 3072)
    max_positions: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """feats [N, T, in_dim] -> [N, T, out_dim]."""
        n, t, _ = feats.shape
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (self.max_positions, self.hidden))
        h = nn.Dense(self.hidden, dtype=self.dtype,
                     name="img_embedding")(feats)
        h = h + pos[None, :t].astype(h.dtype)
        for i in range(self.layers):
            h = BertLayer(self.hidden, self.heads, self.intermediate,
                          dtype=self.dtype, name=f"layer{i}")(h)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="cls_head")(h)
        res = nn.Dense(self.out_dim, dtype=self.dtype, name="residual")(feats)
        return out + res


class METRONetwork(nn.Module):
    """Faithful METRO body-mesh network (MeshTransformer METRO_Network as
    built by inference_bodymesh.py:228-293).

    SMPL-derived constants (template joints/vertices, the H36M joint
    regressor) are module *buffers* in the ``smpl`` collection — SMPL model
    files are licensed data the converter fills in when available; random
    placeholders otherwise (geometry then has no anthropometric meaning but
    the graph and weight layout are exact).

    Returns (cam [N,3], joints_3d [N,14,3], verts_sub2 [N,431,3],
    verts_sub [N,1723,3], verts_full [N,6890,3]); the full mesh and joints
    are pelvis-centred like the reference driver (inference_bodymesh.py:
    74-78).
    """
    backbone: str = "hrnet64"      # METRO default trunk (--arch hrnet-w64)
    stage_hidden: Tuple[int, ...] = (1024, 256, 128)
    stage_out: Tuple[int, ...] = (512, 128, 3)
    stage_layers: int = 4          # --num_hidden_layers
    stage_heads: int = 4           # --num_attention_heads
    intermediate: int = 3072       # METRO legacy_setting fixed size
    feat_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops01: jnp.ndarray):
        """crops01 [N, 224, 224, 3] RGB in [0, 1]."""
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = ((crops01 - mean) / std).astype(self.dtype)
        n = x.shape[0]

        if self.backbone == "hrnet64":
            from .hrnet import HRNet
            feat, _ = HRNet(width=64, dtype=self.dtype, name="backbone")(x)
        elif self.backbone == "resnet50":
            # METRO's torchvision path: Sequential(children[:-2]) -> /32 grid
            feat = ResNet50Backbone(dtype=self.dtype, with_layer4=True,
                                    name="backbone")(x)[0]
        else:
            raise ValueError(self.backbone)
        img_feat = jnp.mean(feat, axis=(1, 2))            # [N, 2048]

        # SMPL template tokens (buffers; see class docstring)
        tj = self.variable("smpl", "template_joints",
                           lambda: jnp.zeros((NUM_JOINTS, 3))).value
        tv = self.variable("smpl", "template_vertices_sub2",
                           lambda: jnp.zeros((NUM_VERTICES, 3))).value
        ref = jnp.concatenate([tj, tv], axis=0)           # [445, 3]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(ref[None], (n,) + ref.shape).astype(self.dtype),
             jnp.broadcast_to(img_feat[:, None],
                              (n, ref.shape[0], self.feat_dim))], axis=-1)

        h = tokens
        for si, (hid, od) in enumerate(zip(self.stage_hidden,
                                           self.stage_out)):
            h = METROStage(hid, od, layers=self.stage_layers,
                           heads=self.stage_heads,
                           intermediate=self.intermediate,
                           dtype=self.dtype, name=f"stage{si}")(h)
        h = h.astype(jnp.float32)                         # [N, 445, 3]
        joints = h[:, :NUM_JOINTS]
        verts_sub2 = h[:, NUM_JOINTS:]

        # camera FC chain (METRO_Network: cam_param_fc -> fc2 -> fc3)
        c = nn.Dense(1, name="cam_param_fc")(verts_sub2)  # [N, 431, 1]
        c = jnp.swapaxes(c, 1, 2)                         # [N, 1, 431]
        c = nn.Dense(250, name="cam_param_fc2")(c)
        c = nn.Dense(3, name="cam_param_fc3")(c)
        cam = c[:, 0, :]                                  # [N, 3]

        # learned mesh upsampling over the vertex axis
        vt = jnp.swapaxes(verts_sub2, 1, 2)               # [N, 3, 431]
        vs = nn.Dense(NUM_VERTICES_SUB, name="upsampling")(vt)
        vf = nn.Dense(NUM_VERTICES_FULL, name="upsampling2")(vs)
        verts_sub = jnp.swapaxes(vs, 1, 2)
        verts_full = jnp.swapaxes(vf, 1, 2)

        # pelvis-centring via the H36M joint regressor (buffer)
        jreg = self.variable(
            "smpl", "j_regressor_h36m",
            lambda: jnp.zeros((NUM_H36M_JOINTS, NUM_VERTICES_FULL))).value
        j17 = jnp.einsum("jv,nvc->njc", jreg, verts_full)
        pelvis = j17[:, H36M_PELVIS:H36M_PELVIS + 1]
        joints_from_mesh = j17[:, list(H36M_J17_TO_J14)] - pelvis
        verts_full = verts_full - pelvis
        return (cam, joints_from_mesh, verts_sub2, verts_sub, verts_full)


def metro_orthographic_projection(x3d: jnp.ndarray, cam: jnp.ndarray
                                  ) -> jnp.ndarray:
    """METRO's weak-perspective projection: 2d = s * (xy + t)
    (MeshTransformer orthographic_projection; consumed at reference
    object_detection.py:350-364)."""
    s = cam[..., 0:1, None]
    t = cam[..., None, 1:3]
    return s * (x3d[..., :2] + t)


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


def _infer_metro_config(sd) -> dict:
    """Stage dims / depth / MLP width from a METRO state_dict's shapes
    (heads stay at METRO's default 4 — not recoverable from shapes)."""
    hidden, out = [], []
    s = 0
    while f"trans_encoder.{s}.bert.img_embedding.weight" in sd:
        hidden.append(sd[f"trans_encoder.{s}.bert.img_embedding.weight"]
                      .shape[0])
        out.append(sd[f"trans_encoder.{s}.cls_head.weight"].shape[0])
        s += 1
    layers = 1 + max(int(k.split(".")[5]) for k in sd
                     if ".bert.encoder.layer." in k)
    inter = sd["trans_encoder.0.bert.encoder.layer.0.intermediate."
               "dense.weight"].shape[0]
    return dict(stage_hidden=tuple(hidden), stage_out=tuple(out),
                stage_layers=layers, intermediate=inter)


def load_default_mesh_regressor(model_path: Optional[str] = None):
    """Returns a MeshRegressor callable (numpy crop -> [431, 2] in [-1, 1]
    crop coordinates — the ``*_pred.txt`` contract the depth path consumes,
    reference object_detection.py:348-364).

    Accepts, in order of preference:
    - a METRO .bin/.pth state_dict (converted on the fly via
      convert_metro_state_dict -> faithful :class:`METRONetwork`),
    - an orbax checkpoint dir containing {'kind': 'metro'} METRONetwork
      variables or BodyMeshRegressor variables,
    - nothing (BodyMeshRegressor random init — smoke mode).
    """
    import os

    path = model_path or "records/bodymesh_tpu"
    if not model_path and not os.path.exists(path):
        # bundled synthetic-trained regressor (scripts/train_people_chain.py)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        base = os.path.join(repo, "records", "checkpoints", "bodymesh")
        for demo in (os.path.join(base, "best.npz"),
                     os.path.join(base, "best")):
            if os.path.exists(demo):
                path = demo
                break

    if path and os.path.isfile(path) and path.endswith((".bin", ".pth")):
        import torch
        from ..core.convert_metro import convert_metro_state_dict
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
        from ..core.convert_metro import _is_hrnet_layout
        hrnet = _is_hrnet_layout(sd)      # cls_hrnet HRNet-w64: fully maps
        digit = any(k.startswith("backbone.") and k.split(".")[1].isdigit()
                    for k in sd)          # torchvision-Sequential ResNet
        skip = (not hrnet and not digit
                and any(k.startswith("backbone.") for k in sd))
        variables = jax.tree.map(
            jnp.asarray, convert_metro_state_dict(sd, skip_backbone=skip))
        cfg = _infer_metro_config(sd)
        model = METRONetwork(backbone="hrnet64" if hrnet or skip
                             else "resnet50", **cfg)
        if skip:
            warnings.warn("METRO backbone layout unrecognised; backbone "
                          "runs with fresh init (transformer/heads loaded).")
            full = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 224, 224, 3)))
            merged = dict(full)
            merged["params"] = {**full["params"], **variables["params"]}
            merged["smpl"] = variables["smpl"]
            variables = merged

        apply_fn = jax.jit(lambda c: model.apply(variables, c))

        def regressor(crop_bgr: np.ndarray) -> np.ndarray:
            crop = crop_bgr[..., ::-1].astype(np.float32) / 255.0
            cam, _, verts_sub2, _, _ = apply_fn(
                jax.device_put(np.ascontiguousarray(crop))[None])
            pts = metro_orthographic_projection(verts_sub2, cam)
            return np.asarray(jax.device_get(pts))[0]

        return regressor

    model = BodyMeshRegressor()
    if path and path.endswith(".npz") and os.path.isfile(path):
        # flat fast-load file (core/checkpoint.py): no dummy init needed
        from ..core.checkpoint import load_flat_npz
        variables = load_flat_npz(path)
    elif path and os.path.isdir(path):
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
