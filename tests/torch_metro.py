"""Plain-torch re-instantiation of the METRO body-mesh network as an ORACLE.

Follows the public MeshTransformer architecture (the reference builds it at
scripts/inference_bodymesh.py:228-293 from the submodule): per stage, a BERT
encoder consuming linearly-embedded image-feature tokens with learned
position embeddings, topped by a cls_head plus a linear residual from the
stage input; the network stacks 3 stages over SMPL template tokens, then a
camera FC chain (3->1 over coords, 431->250->3 over vertices) and learned
mesh upsampling (431->1723->6890). State_dict key names replicate METRO's
layout so :func:`vfloodnet_tpu.core.convert_metro_state_dict` can be tested
against a real torch graph. Written from the public architecture — the
reference submodule is empty in the snapshot (SURVEY.md §2.2).
"""

from __future__ import annotations

import math

import torch
from torch import nn


class BertSelfAttention(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.heads = heads
        self.query = nn.Linear(hidden, hidden)
        self.key = nn.Linear(hidden, hidden)
        self.value = nn.Linear(hidden, hidden)

    def forward(self, x):
        n, t, h = x.shape
        hd = h // self.heads

        def split(v):
            return v.view(n, t, self.heads, hd).transpose(1, 2)

        q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
        s = q @ k.transpose(-1, -2) / math.sqrt(hd)
        p = torch.softmax(s, dim=-1)
        ctx = (p @ v).transpose(1, 2).reshape(n, t, h)
        return ctx


class BertAttention(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.self = BertSelfAttention(hidden, heads)
        self.output = nn.ModuleDict({
            "dense": nn.Linear(hidden, hidden),
            "LayerNorm": nn.LayerNorm(hidden, eps=1e-12),
        })

    def forward(self, x):
        ctx = self.self(x)
        return self.output["LayerNorm"](self.output["dense"](ctx) + x)


class BertLayer(nn.Module):
    def __init__(self, hidden, heads, intermediate):
        super().__init__()
        self.attention = BertAttention(hidden, heads)
        self.intermediate = nn.ModuleDict(
            {"dense": nn.Linear(hidden, intermediate)})
        self.output = nn.ModuleDict({
            "dense": nn.Linear(intermediate, hidden),
            "LayerNorm": nn.LayerNorm(hidden, eps=1e-12),
        })

    def forward(self, x):
        x = self.attention(x)
        h = torch.nn.functional.gelu(self.intermediate["dense"](x))
        return self.output["LayerNorm"](self.output["dense"](h) + x)


class BertEncoder(nn.Module):
    def __init__(self, hidden, heads, intermediate, layers):
        super().__init__()
        self.layer = nn.ModuleList(
            [BertLayer(hidden, heads, intermediate) for _ in range(layers)])

    def forward(self, x):
        for lyr in self.layer:
            x = lyr(x)
        return x


class METROEncoder(nn.Module):
    """METRO_Encoder: img_embedding + position embeddings -> BertEncoder."""

    def __init__(self, img_dim, hidden, heads, intermediate, layers,
                 max_positions=512):
        super().__init__()
        self.img_embedding = nn.Linear(img_dim, hidden)
        self.position_embeddings = nn.Embedding(max_positions, hidden)
        self.encoder = BertEncoder(hidden, heads, intermediate, layers)

    def forward(self, feats):
        t = feats.shape[1]
        pos_ids = torch.arange(t, device=feats.device)
        emb = self.img_embedding(feats) + self.position_embeddings(pos_ids)
        return self.encoder(emb)


class METROStage(nn.Module):
    """METRO class: encoder + cls_head + residual."""

    def __init__(self, img_dim, hidden, out_dim, heads=4, intermediate=3072,
                 layers=4):
        super().__init__()
        self.bert = METROEncoder(img_dim, hidden, heads, intermediate, layers)
        self.cls_head = nn.Linear(hidden, out_dim)
        self.residual = nn.Linear(img_dim, out_dim)

    def forward(self, feats):
        return self.cls_head(self.bert(feats)) + self.residual(feats)


class METRONetworkTorch(nn.Module):
    """METRO_Network: backbone + 3-stage trans_encoder + camera FC chain +
    learned mesh upsampling. Template tokens are passed in (SMPL-derived)."""

    def __init__(self, backbone, stage_hidden=(1024, 256, 128),
                 stage_out=(512, 128, 3), feat_dim=2048, heads=4,
                 intermediate=3072, layers=4, n_joints=14, n_verts=431,
                 n_sub=1723, n_full=6890):
        super().__init__()
        self.backbone = backbone
        self.n_joints = n_joints
        stages = []
        in_dim = 3 + feat_dim
        for hid, od in zip(stage_hidden, stage_out):
            stages.append(METROStage(in_dim, hid, od, heads=heads,
                                     intermediate=intermediate,
                                     layers=layers))
            in_dim = od
        self.trans_encoder = nn.Sequential(*stages)
        self.upsampling = nn.Linear(n_verts, n_sub)
        self.upsampling2 = nn.Linear(n_sub, n_full)
        self.cam_param_fc = nn.Linear(3, 1)
        self.cam_param_fc2 = nn.Linear(n_verts, 250)
        self.cam_param_fc3 = nn.Linear(250, 3)

    def forward(self, images, template_joints, template_vertices,
                j_regressor):
        n = images.shape[0]
        feat = self.backbone(images)                      # [n, 2048, h, w]
        img_feat = feat.flatten(2).mean(-1)               # [n, 2048]

        ref = torch.cat([template_joints, template_vertices], dim=0)
        tokens = torch.cat(
            [ref[None].expand(n, -1, -1),
             img_feat[:, None].expand(-1, ref.shape[0], -1)], dim=-1)
        out = self.trans_encoder(tokens)                  # [n, 445, 3]
        joints = out[:, :self.n_joints]
        verts_sub2 = out[:, self.n_joints:]

        c = self.cam_param_fc(verts_sub2).transpose(1, 2)
        cam = self.cam_param_fc3(self.cam_param_fc2(c)).transpose(1, 2)[:, :, 0]

        vt = verts_sub2.transpose(1, 2)
        vs = self.upsampling(vt)
        vf = self.upsampling2(vs)
        verts_sub = vs.transpose(1, 2)
        verts_full = vf.transpose(1, 2)

        j17 = torch.einsum("jv,nvc->njc", j_regressor, verts_full)
        pelvis = j17[:, 0:1]
        j14 = j17[:, [0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14]] - pelvis
        verts_full = verts_full - pelvis
        return cam, j14, verts_sub2, verts_sub, verts_full
