"""Pretrained converter: torchvision-format names -> flax tree, end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_pretrained import STAGE_BLOCKS, convert_state_dict  # noqa: E402
from mxdetection_tpu.models.backbones.resnet import ResNet  # noqa: E402
from mxdetection_tpu.utils.pretrained import load_backbone  # noqa: E402


def synthetic_torch_sd(depth=50, seed=0):
    """A torchvision-resnet-shaped state dict with random values."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(name, cout, cin, k):
        # he-scaled so a 50-layer forward stays finite
        scale = np.sqrt(2.0 / (cin * k * k))
        sd[name + ".weight"] = (rng.randn(cout, cin, k, k) * scale).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for s, nblocks in enumerate(STAGE_BLOCKS[depth]):
        width = 64 * 2 ** s
        for b in range(nblocks):
            pre = f"layer{s + 1}.{b}"
            conv(pre + ".conv1", width, cin, 1)
            bn(pre + ".bn1", width)
            conv(pre + ".conv2", width, width, 3)
            bn(pre + ".bn2", width)
            conv(pre + ".conv3", width * 4, width, 1)
            bn(pre + ".bn3", width * 4)
            if b == 0:
                conv(pre + ".downsample.0", width * 4, cin, 1)
                bn(pre + ".downsample.1", width * 4)
            cin = width * 4
    return sd


def test_convert_and_load_r50(tmp_path):
    sd = synthetic_torch_sd(50)
    flat = convert_state_dict(sd, 50)
    npz = tmp_path / "r50.npz"
    np.savez(npz, **flat)

    model = ResNet(depth=50, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    merged = load_backbone(wrapped, str(npz))

    # conv1: OIHW -> HWIO transpose
    got = np.asarray(merged["params"]["backbone"]["stem_conv"]["kernel"])
    np.testing.assert_allclose(got, sd["conv1.weight"].transpose(2, 3, 1, 0))
    # BN stats land in FrozenBatchNorm leaves
    got = np.asarray(merged["batch_stats"]["backbone"]["stem_bn"]["var"])
    np.testing.assert_allclose(got, sd["bn1.running_var"])
    got = np.asarray(
        merged["batch_stats"]["backbone"]["layer3_block5"]["bn2"]["mean"])
    np.testing.assert_allclose(got, sd["layer3.5.bn2.running_mean"])

    # forward runs with the merged weights and produces finite activations
    out = model.apply({"params": merged["params"]["backbone"],
                       "batch_stats": merged["batch_stats"]["backbone"]},
                      jnp.ones((1, 64, 64, 3)))
    assert len(out) == 4
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_convert_rejects_wrong_shapes(tmp_path):
    sd = synthetic_torch_sd(50)
    flat = convert_state_dict(sd, 50)
    flat["params/stem_conv/kernel"] = np.zeros((3, 3, 3, 64), np.float32)
    npz = tmp_path / "bad.npz"
    np.savez(npz, **flat)
    model = ResNet(depth=50, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    with pytest.raises(ValueError):
        load_backbone(wrapped, str(npz))


def test_convert_and_load_r101(tmp_path):
    """R101 name mapping (23-block layer3) survives the full roundtrip."""
    sd = synthetic_torch_sd(101, seed=3)
    flat = convert_state_dict(sd, 101)
    npz = tmp_path / "r101.npz"
    np.savez(npz, **flat)
    model = ResNet(depth=101, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables["batch_stats"]}}
    merged = load_backbone(wrapped, str(npz))
    got = np.asarray(
        merged["params"]["backbone"]["layer3_block22"]["conv2"]["kernel"])
    np.testing.assert_allclose(got, sd["layer3.22.conv2.weight"].transpose(2, 3, 1, 0))
    out = model.apply({"params": merged["params"]["backbone"],
                       "batch_stats": merged["batch_stats"]["backbone"]},
                      jnp.ones((1, 64, 64, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_convert_ignores_classifier_and_bookkeeping_keys():
    sd = synthetic_torch_sd(50)
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    sd["bn1.num_batches_tracked"] = np.asarray(12345)
    flat = convert_state_dict(sd, 50)  # strict: skips must not raise
    assert not any("fc" in k for k in flat)


def test_convert_rejects_unexpected_keys():
    sd = synthetic_torch_sd(50)
    sd["layer1.0.conv9.weight"] = np.zeros((64, 64, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unexpected key"):
        convert_state_dict(sd, 50)
    # non-strict mode tolerates it
    flat = convert_state_dict(sd, 50, strict=False)
    assert "params/layer1_block0/conv1/kernel" in flat


def test_convert_missing_key_raises():
    sd = synthetic_torch_sd(50)
    del sd["layer2.1.bn2.running_var"]
    with pytest.raises(KeyError):
        convert_state_dict(sd, 50)


def test_convert_wrong_depth_rejected():
    """Converting an R50 dict as R101 must fail loudly, not fabricate."""
    sd = synthetic_torch_sd(50)
    with pytest.raises(KeyError):
        convert_state_dict(sd, 101)


def test_convert_rejects_non_conv_weight_shape():
    sd = synthetic_torch_sd(50)
    sd["conv1.weight"] = np.zeros((64, 3 * 49), np.float32)  # flattened
    with pytest.raises(ValueError, match="4-d conv kernel"):
        convert_state_dict(sd, 50)


def test_s2d_stem_exact_vs_plain():
    """The packed space-to-depth stem is numerically identical to the plain
    7x7/s2 conv (same params tree, same outputs on CPU f32)."""
    from mxdetection_tpu.models.backbones.resnet import ResNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    m1 = ResNet(depth=50, dtype=jnp.float32, train=False, s2d_stem=True)
    m2 = ResNet(depth=50, dtype=jnp.float32, train=False, s2d_stem=False)
    v = m1.init(jax.random.PRNGKey(2), x)
    o1, o2 = m1.apply(v, x), m2.apply(v, x)
    for a, b in zip(o1, o2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-9) < 1e-5
