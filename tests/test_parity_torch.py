"""Numerical parity vs the reference PyTorch AFB-URR, run as an ORACLE.

The reference network (video_module/model/AFB_URR.py:255-318) and feature
bank (video_module/model/FeatureBank.py:27-115) are imported from
/root/reference (CPU, random init — see tests/torch_oracle.py for the
dependency stubs), its state_dict is converted with
:func:`vfloodnet_tpu.core.convert_afb_urr_state_dict`, and the JAX graph
must reproduce, to f32 tolerance:

1. ``memorize``: the key/value features of a first frame + mask,
2. ``segment``: the full forward (encoder -> bank attention read ->
   decoder with uncertainty-gated refinement -> clamped logits) AND the
   usage-count side effect (AFB_URR.py:161-174),
3. one full bank ``update``: cosine match -> scatter_mean merge ->
   append (FeatureBank.py:53-115) against the fixed-capacity masked bank.

This converts every accuracy-bearing claim (BASELINE "<0.5% mIoU delta")
from hypothesis to verified graph equivalence.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.torch_oracle import load_reference
from vfloodnet_tpu.core import convert_afb_urr_state_dict
from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.models import AFBURR

H, W = 67, 93          # deliberately not multiples of 16 (exercises padding)
OBJ_N = 2


def _randomize_bn_stats(model, seed=7):
    """Default-init BN has mean=0/var=1 which would mask conversion bugs in
    the running-stat mapping; perturb them like a trained net's."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.2)
            m.running_var.copy_(0.5 + torch.rand(m.num_features, generator=g))


@pytest.fixture(scope="module")
def oracle():
    afb_mod, fb_mod = load_reference()
    torch.manual_seed(0)
    model = afb_mod.AFB_URR(torch.device("cpu"), update_bank=True,
                            load_imagenet_params=False)
    _randomize_bn_stats(model)
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = convert_afb_urr_state_dict(sd)
    jmodel = AFBURR()

    rng = np.random.RandomState(3)
    frame0 = rng.rand(1, 3, H, W).astype(np.float32)
    frame1 = rng.rand(1, 3, H, W).astype(np.float32)
    fg = (rng.rand(1, H, W) > 0.6).astype(np.float32)
    mask0 = np.stack([1.0 - fg, fg], axis=1)          # [1, K, H, W] one-hot

    return dict(afb_mod=afb_mod, fb_mod=fb_mod, model=model,
                variables=variables, jmodel=jmodel,
                frame0=frame0, frame1=frame1, mask0=mask0)


def _torch_memorize(o, frame, mask):
    with torch.no_grad():
        k4l, v4l = o["model"].memorize(torch.from_numpy(frame),
                                       torch.from_numpy(mask))
    return k4l, v4l


def _jax_memorize(o, frame, mask):
    # torch [1,3,H,W] -> jax [H,W,3]; torch mask [1,K,H,W] -> jax [K,H,W]
    k4, v4 = o["jmodel"].apply(
        o["variables"], jnp.asarray(frame[0].transpose(1, 2, 0)),
        jnp.asarray(mask[0]), method=o["jmodel"].memorize)
    return np.asarray(k4), np.asarray(v4)


def test_memorize_parity(oracle):
    k4l, v4l = _torch_memorize(oracle, oracle["frame0"], oracle["mask0"])
    k4j, v4j = _jax_memorize(oracle, oracle["frame0"], oracle["mask0"])
    for i in range(OBJ_N):
        np.testing.assert_allclose(k4j[i], k4l[i].numpy().T,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(v4j[i], v4l[i].numpy().T,
                                   rtol=1e-4, atol=1e-4)


def _make_banks(oracle, k4l, v4l):
    """Torch FeatureBank + equivalent fixed-capacity JAX bank state."""
    fb = oracle["fb_mod"].FeatureBank(OBJ_N, memory_budget=1280,
                                      device=torch.device("cpu"))
    fb.init_bank(list(k4l), list(v4l))

    jfb = FeatureBank(OBJ_N, memory_budget=1280)
    keys = jnp.stack([jnp.asarray(k.numpy().T) for k in k4l])
    values = jnp.stack([jnp.asarray(v.numpy().T) for v in v4l])
    state = jfb.init_bank(keys, values, frame_idx=0.0)
    assert jfb.class_budget == int(fb.class_budget)
    return fb, jfb, state


def test_segment_and_usage_parity(oracle):
    k4l, v4l = _torch_memorize(oracle, oracle["frame0"], oracle["mask0"])
    fb, jfb, state = _make_banks(oracle, k4l, v4l)

    with torch.no_grad():
        score_t, _ = oracle["model"].segment(
            torch.from_numpy(oracle["frame1"]), fb)
    score_t = score_t.numpy()                          # [1, K, H, W] logits

    score_j, _, usage_cnt = oracle["jmodel"].apply(
        oracle["variables"],
        jnp.asarray(oracle["frame1"].transpose(0, 2, 3, 1)),
        state.keys, state.values, state.valid,
        method=oracle["jmodel"].segment)
    score_j = np.asarray(score_j)

    assert score_j.shape == score_t.shape
    # The reference computes log(clip(p, 1e-7, 1-1e-7) / (1 - clip(...)))
    # (AFB_URR.py segment tail), i.e. the fg log-odds HARD-BOUNDED at
    # +-ln(1e7). Ours returns the exact unbounded log-odds (logit1 -
    # logit0) — identical inside the band, strictly more information
    # outside it (the clip's zero gradient also blocks from-scratch
    # training; see Decoder). Parity therefore compares at the
    # reference-visible quantity: clip(ours) == theirs everywhere.
    bound = float(np.log(1e7 * (1 - 1e-7)))
    np.testing.assert_allclose(np.clip(score_j, -bound, bound), score_t,
                               rtol=1e-3, atol=2e-3)
    # the water/background decision must be identical at the
    # reference-visible quantity (where the reference clips BOTH objects
    # to the same bound its argmax is a tie artifact, so compare there)
    assert np.array_equal(np.clip(score_j, -bound, bound).argmax(1),
                          score_t.argmax(1))

    # usage-count side effect: reference adds log(cnt+1) to info[:, 1]
    # (AFB_URR.py:174); ours returns raw counts applied via record_usage.
    state2 = jfb.record_usage(state, usage_cnt)
    p = k4l[0].shape[1]
    for i in range(OBJ_N):
        np.testing.assert_allclose(
            np.asarray(state2.usage[i, :p]),
            fb.info[i][:, 1].numpy(), rtol=1e-4, atol=1e-4)


def test_bank_update_parity(oracle):
    k4l, v4l = _torch_memorize(oracle, oracle["frame0"], oracle["mask0"])
    fb, jfb, state = _make_banks(oracle, k4l, v4l)

    # usage side effect of one read first (exercises the LFU inputs too)
    with torch.no_grad():
        _ = oracle["model"].segment(torch.from_numpy(oracle["frame1"]), fb)
    _, _, usage_cnt = oracle["jmodel"].apply(
        oracle["variables"],
        jnp.asarray(oracle["frame1"].transpose(0, 2, 3, 1)),
        state.keys, state.values, state.valid,
        method=oracle["jmodel"].segment)
    state = jfb.record_usage(state, usage_cnt)

    # new frame's features (below budget: merge + append, no eviction)
    rng = np.random.RandomState(11)
    fg = (rng.rand(1, H, W) > 0.5).astype(np.float32)
    mask1 = np.stack([1.0 - fg, fg], axis=1)
    k4n, v4n = _torch_memorize(oracle, oracle["frame1"], mask1)

    fb.update(list(k4n), list(v4n), frame_idx=1)

    new_keys = jnp.stack([jnp.asarray(k.numpy().T) for k in k4n])
    new_values = jnp.stack([jnp.asarray(v.numpy().T) for v in v4n])
    state = jfb.update(state, new_keys, new_values, frame_idx=1.0)

    for i in range(OBJ_N):
        keys_t = fb.keys[i].numpy().T                  # [bank_n, dk]
        vals_t = fb.values[i].numpy().T
        occ = int(state.occ[i])
        assert occ == keys_t.shape[0], (
            f"occupancy mismatch obj {i}: {occ} vs {keys_t.shape[0]}")
        # identical slot ordering: merges happen in place, appends extend
        # the dense prefix in pixel order (reference torch.cat growth)
        np.testing.assert_allclose(np.asarray(state.keys[i, :occ]), keys_t,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(state.values[i, :occ]), vals_t,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(state.usage[i, :occ]),
                                   fb.info[i][:, 1].numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(state.birth[i, :occ]),
                                   fb.info[i][:, 0].numpy(),
                                   rtol=0, atol=0)
        assert int(state.peak_n[i]) == int(fb.peak_n[i])
