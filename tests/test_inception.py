"""FID InceptionV3 structural parity vs torchvision (random weights) and FID
math sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from favae_tpu.models.inception import (InceptionV3FID, fid_from_features,
                                        frechet_distance)


def _torch_layout_state_dict(params, stats):
    """Flax inception tree -> torchvision-layout state dict (inverse of the
    converter's transforms), used to round-trip the converter without
    torchvision (not installed in this image)."""
    sd = {}

    def walk(p, s, prefix):
        if "conv" in p and "kernel" in p["conv"]:
            sd[prefix + ".conv.weight"] = np.asarray(
                p["conv"]["kernel"]).transpose(3, 2, 0, 1)
            sd[prefix + ".bn.weight"] = np.asarray(p["bn"]["scale"])
            sd[prefix + ".bn.bias"] = np.asarray(p["bn"]["bias"])
            sd[prefix + ".bn.running_mean"] = np.asarray(s["bn"]["mean"])
            sd[prefix + ".bn.running_var"] = np.asarray(s["bn"]["var"])
            return
        for k in p:
            walk(p[k], s[k], f"{prefix}.{k}" if prefix else k)

    walk(params, stats, "")
    return sd


def test_inception_converter_roundtrip():
    """Init the flax model, emit a torchvision-layout state dict, convert it
    back, and confirm identical features — validates every key name and
    transpose the converter performs (weights-file parity needs the real
    pytorch-fid checkpoint, unavailable offline)."""
    model = InceptionV3FID(dtype=jnp.float32, resize_input=False)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 75, 75, 3).astype(np.float32) * 2 - 1)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(variables, x))
    assert ref.shape == (1, 2048)

    sd = _torch_layout_state_dict(variables["params"],
                                  variables["batch_stats"])
    from favae_tpu.utils.torch_convert import convert_inception
    params, stats = convert_inception(sd)
    ours = np.asarray(model.apply({"params": params, "batch_stats": stats}, x))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_avg_pool_count_include_pad_semantics():
    """count_include_pad=False must divide edge windows by the true element
    count (pytorch-fid semantics)."""
    import torch
    import torch.nn.functional as TF
    from favae_tpu.models.inception import avg_pool_3x3_same

    x = np.random.RandomState(1).rand(1, 6, 6, 2).astype(np.float32)
    ours = np.asarray(avg_pool_3x3_same(jnp.asarray(x), False))
    ref = TF.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 1,
                        padding=1, count_include_pad=False)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(200, 16)
    assert abs(fid_from_features(f, f)) < 1e-6


def test_frechet_distance_known_value():
    # two isotropic gaussians with mean shift d: FID = d^2 (same covariance)
    mu1, mu2 = np.zeros(4), np.ones(4) * 2.0
    sigma = np.eye(4)
    d = frechet_distance(mu1, sigma, mu2, sigma)
    assert abs(d - 16.0) < 1e-6


def test_fid_sensitive_to_distribution_shift():
    rng = np.random.RandomState(1)
    a = rng.randn(500, 32)
    b = rng.randn(500, 32) + 1.0
    assert fid_from_features(a, b) > fid_from_features(a, a + 0.01)
