"""LinkNet water segmentation model (EfficientNet-B4 encoder).

Capability parity with the reference image model — an smp
``Linknet(encoder_name='efficientnet-b4', classes=1, activation='sigmoid')``
(train_image_seg.py:82-89, loaded as a whole pickle at test_image_seg.py:133).

TPU-first decoder: LinkNet-style additive skip connections, but upsampling is
bilinear-resize + conv (instead of transposed conv) — equivalent capacity,
friendlier to XLA fusion, no checkerboard artefacts.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

from .efficientnet import EfficientNetFeatures
from .resnet import FrozenBN

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)  # host constant: no device init at import
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _up2(x):
    n, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, c),
                            method="linear").astype(x.dtype)


class DecoderBlock(nn.Module):
    """LinkNet decoder block: bottleneck conv -> 2x upsample -> expand conv."""
    out_f: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        mid = max(in_f // 4, 8)
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = FrozenBN(dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = _up2(h)
        h = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = FrozenBN(dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBN(dtype=self.dtype, name="bn3")(h)
        return nn.relu(h)


class LinkNet(nn.Module):
    """Binary water segmentation; returns sigmoid probability [N, H, W, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img01: jnp.ndarray) -> jnp.ndarray:
        x = (img01 - IMAGENET_MEAN) / IMAGENET_STD
        f2, f4, f8, f16, f32 = EfficientNetFeatures(
            dtype=self.dtype, name="encoder")(x.astype(self.dtype))

        def add_skip(d, skip):
            # stride-2 convs ceil; crop the upsample back to the skip's
            # spatial dims so non-/32-divisible inputs work
            return d[:, :skip.shape[1], :skip.shape[2], :] + skip

        d = DecoderBlock(f16.shape[-1], dtype=self.dtype, name="dec4")(f32)
        d = add_skip(d, f16)
        d = DecoderBlock(f8.shape[-1], dtype=self.dtype, name="dec3")(d)
        d = add_skip(d, f8)
        d = DecoderBlock(f4.shape[-1], dtype=self.dtype, name="dec2")(d)
        d = add_skip(d, f4)
        d = DecoderBlock(f2.shape[-1], dtype=self.dtype, name="dec1")(d)
        d = add_skip(d, f2)
        d = DecoderBlock(16, dtype=self.dtype, name="dec0")(d)
        d = d[:, :img01.shape[1], :img01.shape[2], :]

        h = nn.Conv(16, (3, 3), padding=1, dtype=self.dtype, name="head1")(d)
        h = nn.relu(h)
        logits = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                         name="head2")(h)
        return jax.nn.sigmoid(logits.astype(jnp.float32))


def load_linknet(model_path: Optional[str] = None,
                 dtype=jnp.float32) -> Tuple[LinkNet, dict]:
    """Build LinkNet and load weights (flat .npz or orbax checkpoint dir);
    random init with a warning if missing.

    A ``.pth`` path is treated as the reference's pickled smp
    ``Linknet(efficientnet-b4)`` (test_image_seg.py:133): its weights are
    converted and the smp-layout-faithful :class:`LinkNetSMP` variant is
    returned instead of the TPU-first decoder."""
    import os

    if model_path and model_path.endswith(".pth") \
            and os.path.exists(model_path):
        from ..core.convert import convert_smp_linknet_pickle
        from .linknet_smp import LinkNetSMP
        variables = convert_smp_linknet_pickle(model_path)
        variables = jax.tree.map(jnp.asarray, variables)
        return LinkNetSMP(dtype=dtype), variables

    model = LinkNet(dtype=dtype)

    def _random_init():
        return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    from ..pipelines.loaders import default_checkpoint
    if model_path is None:
        model_path = default_checkpoint("image")
    elif not os.path.exists(model_path):
        # CLI defaults name the converted-reference-weights location
        # (test_image_seg.py ./records/linknet_tpu); when absent, prefer
        # the bundled trained demo checkpoint over random init.
        bundled = default_checkpoint("image")
        if bundled:
            warnings.warn(f"No checkpoint at {model_path!r}; using bundled "
                          f"demo checkpoint {bundled!r}.")
            model_path = bundled
    if model_path and model_path.endswith(".npz") \
            and os.path.exists(model_path):
        # flat fast-load file: no target tree / model.init needed
        from ..core.checkpoint import load_flat_npz
        variables = load_flat_npz(model_path)
    elif model_path and os.path.isdir(model_path):
        from ..core.checkpoint import restore_checkpoint
        variables = restore_checkpoint(model_path, target=_random_init())
    else:
        if model_path:
            warnings.warn(f"No checkpoint at {model_path!r}; random init "
                          "(smoke mode).")
        variables = _random_init()
    return model, variables
