"""smp LinkNet variant: converter round-trip + forward parity vs the torch
oracle (VERDICT round-2 missing #2 / next #8).

The reference's image model is a pickled smp Linknet(efficientnet-b4)
(test_image_seg.py:133); the default TPU LinkNet decoder deliberately
deviates (resize+conv), so this smp-layout variant exists to make the
reference weights loadable. Oracle: tests/torch_smp.py re-instantiates the
smp layout from scratch (smp itself is not installed here)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vfloodnet_tpu.core.convert import (  # noqa: E402
    convert_smp_linknet_state_dict, torch_conv_to_flax)
from vfloodnet_tpu.models.linknet_smp import (  # noqa: E402
    LinkNetSMP, SMPDecoderHead, TorchConvTranspose2d)

from torch_smp import (  # noqa: E402
    LinknetDecoder, TorchLinknetSMP, randomize_)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _to_sd(model):
    return {k: v.detach().numpy()
            for k, v in model.state_dict().items()}


def test_tconv_matches_torch():
    """TorchConvTranspose2d == nn.ConvTranspose2d(k4 s2 p1) numerically."""
    g = torch.Generator().manual_seed(3)
    tc = torch.nn.ConvTranspose2d(8, 12, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tc.weight.normal_(0, 0.1, generator=g)
    x = torch.randn(1, 8, 6, 7, generator=g)
    ref = tc(x).detach().numpy()                       # [1, 12, 12, 14]

    kern = torch_conv_to_flax(tc.weight.detach().numpy())  # [4,4,12,8]
    mod = TorchConvTranspose2d(12)
    out = mod.apply({"params": {"kernel": jnp.asarray(kern)}},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_converted_tree_matches_init():
    """The converter emits exactly the variable tree LinkNetSMP.init
    builds — every key consumed, none missing, all shapes equal."""
    oracle = TorchLinknetSMP().eval()
    variables = convert_smp_linknet_state_dict(_to_sd(oracle))

    model = LinkNetSMP()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    ref_flat = {"/".join(str(kk.key) for kk in k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(ref)}
    got_flat = {"/".join(str(kk.key) for kk in k): np.shape(v)
                for k, v in jax.tree_util.tree_leaves_with_path(variables)}
    missing = sorted(set(ref_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(ref_flat))
    assert not missing, f"converter missing keys: {missing[:8]}"
    assert not extra, f"converter extra keys: {extra[:8]}"
    bad = [k for k in ref_flat if ref_flat[k] != got_flat[k]]
    assert not bad, {k: (ref_flat[k], got_flat[k]) for k in bad[:5]}


def test_smp_decoder_forward_parity():
    """Decoder+head forward parity on raw pyramid features (isolates the
    transposed-conv decoder from the encoder)."""
    oracle = TorchLinknetSMP().eval()
    randomize_(oracle, seed=11)
    variables = convert_smp_linknet_state_dict(_to_sd(oracle))
    dec_vars = {"params": variables["params"]["decoder"],
                "batch_stats": variables["batch_stats"]["decoder"]}

    g = torch.Generator().manual_seed(4)
    chans = [48, 32, 56, 160, 448]
    sizes = [32, 16, 8, 4, 2]
    feats_t = [torch.randn(1, c, s, s, generator=g) * 0.5
               for c, s in zip(chans, sizes)]
    with torch.no_grad():
        d = oracle.decoder(feats_t)
        ref = torch.sigmoid(oracle.segmentation_head(d)).numpy()

    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    out = SMPDecoderHead().apply(dec_vars, *feats_j)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_full_forward_parity():
    """Whole-graph parity: encoder static same-pads + BN eps 1e-3 +
    decoder + head, random weights AND random BN running stats."""
    oracle = TorchLinknetSMP().eval()
    randomize_(oracle, seed=7)
    variables = convert_smp_linknet_state_dict(_to_sd(oracle))

    rng = np.random.RandomState(5)
    img01 = rng.rand(1, 64, 64, 3).astype(np.float32)
    x_t = torch.from_numpy(
        ((img01 - IMAGENET_MEAN) / IMAGENET_STD).transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = oracle(x_t).numpy()                      # [1, 1, 64, 64]

    model = LinkNetSMP()
    out = model.apply(variables, jnp.asarray(img01))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    diff = np.abs(out - ref).max()
    assert diff < 5e-4, f"max prob diff {diff}"
