"""Weight-converter test: synthesize a reference-style AFB-URR state_dict
with correct torch layouts/names and check the converted tree matches the
flax init tree structurally and numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfloodnet_tpu.core import convert_afb_urr_state_dict
from vfloodnet_tpu.models import AFBURR

_INV_LAYER = {"layer1": "res2", "layer2": "res3", "layer3": "res4"}


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _flax_path_to_torch_key(path: str, collection: str) -> str:
    """Independent inverse mapping using the reference's naming convention
    (video_module/model/AFB_URR.py module attribute names)."""
    parts = path.split("/")
    leaf = parts[-1]
    body = parts[:-1]

    # resnet backbone inside encoders
    if body[0] in ("encoder_m", "encoder_q") and body[1] == "backbone":
        rest = body[2:]
        if rest[0] in ("conv1", "bn1"):
            torch_body = [body[0], rest[0]]
        else:
            layer, block, mod = rest
            tlayer = _INV_LAYER[layer]
            idx = block.replace("block", "")
            if mod == "downsample_conv":
                torch_body = [body[0], tlayer, idx, "downsample", "0"]
            elif mod == "downsample_bn":
                torch_body = [body[0], tlayer, idx, "downsample", "1"]
            else:
                torch_body = [body[0], tlayer, idx, mod]
    elif body[0] in ("encoder_m", "encoder_q"):
        torch_body = body  # conv1_m / conv1_o
    elif body[0] == "keyval_r4":
        torch_body = ["keyval_r4", body[1].capitalize()]
    elif body[0] == "decoder":
        torch_body = body
    else:
        raise AssertionError(path)

    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    return ".".join(torch_body) + "." + leaf_map[leaf]


def test_converter_round_trip():
    model = AFBURR()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((32, 32, 3)),
                           jnp.zeros((2, 32, 32)), method=model.init_all)
    flat_params = _flatten(variables["params"])
    flat_stats = _flatten(variables["batch_stats"])

    rng = np.random.RandomState(0)
    sd = {}
    for path, arr in flat_params.items():
        key = _flax_path_to_torch_key(path, "params")
        if path.endswith("/kernel"):
            w = rng.randn(arr.shape[3], arr.shape[2], arr.shape[0],
                          arr.shape[1]).astype(np.float32)
        else:
            w = rng.randn(*arr.shape).astype(np.float32)
        sd[key] = w
    for path, arr in flat_stats.items():
        key = _flax_path_to_torch_key(path, "batch_stats")
        sd[key] = rng.randn(*arr.shape).astype(np.float32)

    # plus buffers the converter must skip
    sd["encoder_m.mean"] = np.zeros((1, 3, 1, 1), np.float32)
    sd["encoder_q.std"] = np.ones((1, 3, 1, 1), np.float32)
    sd["encoder_m.bn1.num_batches_tracked"] = np.array(7)

    converted = convert_afb_urr_state_dict(sd)

    got_params = _flatten(converted["params"])
    got_stats = _flatten(converted["batch_stats"])
    assert set(got_params) == set(flat_params)
    assert set(got_stats) == set(flat_stats)
    for path in flat_params:
        assert got_params[path].shape == flat_params[path].shape, path
    # spot-check the conv transpose: torch [O,I,kh,kw] -> flax [kh,kw,I,O]
    k = "encoder_m/conv1_m/kernel"
    tkey = "encoder_m.conv1_m.weight"
    np.testing.assert_array_equal(got_params[k],
                                  np.transpose(sd[tkey], (2, 3, 1, 0)))
    # the model applies with converted weights
    out = model.apply(converted, jnp.zeros((32, 32, 3)),
                      jnp.zeros((2, 32, 32)), method=model.memorize)
    assert out[0].shape == (2, 4, 128)


def test_inverse_converter_round_trip():
    """tests.torch_oracle.variables_to_state_dict must be an exact inverse
    of convert_afb_urr_state_dict: torch sd -> flax variables -> recovered
    sd equals the original bitwise (enables trained-weight oracle runs)."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import load_reference, variables_to_state_dict

    afb_mod, _ = load_reference()
    torch.manual_seed(11)
    model = afb_mod.AFB_URR(torch.device("cpu"), update_bank=True,
                            load_imagenet_params=False)
    sd0 = model.state_dict()
    variables = convert_afb_urr_state_dict(
        {k: v.detach().numpy() for k, v in sd0.items()})
    sd1 = variables_to_state_dict(variables, model,
                                  convert_afb_urr_state_dict)
    assert set(sd1) == set(sd0)
    for k in sd0:
        np.testing.assert_array_equal(sd1[k].numpy(), sd0[k].numpy(),
                                      err_msg=k)
