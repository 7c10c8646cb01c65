"""Golden tests for the frequency/blur primitives against torch-CPU oracles.

torch here is used purely as an operator-semantics oracle (conv2d grouped blur,
fft2) — the expected values are computed at test time from the published
formulas, not copied from anywhere.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from favae_tpu.ops.gaussian import gaussian_kernel_1d, gaussian_kernel_2d, gaussian_blur_nhwc
from favae_tpu.ops.ffl import focal_frequency_loss, feature_tap_ffl


def torch_gaussian_kernel_2d(k, sigma):
    half = (k - 1) * 0.5
    x = torch.linspace(-half, half, k)
    pdf = torch.exp(-0.5 * (x / sigma) ** 2)
    k1 = pdf / pdf.sum()
    return torch.outer(k1, k1)


def torch_blur_nchw(x, k, sigma):
    """Grouped-conv reflect-pad blur, same construction as the reference's
    _gaussian_blur (depthwise conv2d of the 2-D kernel)."""
    k2 = torch_gaussian_kernel_2d(k, sigma)
    c = x.shape[1]
    w = k2.repeat(c, 1, 1, 1)
    pad = [k // 2] * 4
    xp = TF.pad(x, pad, mode="reflect")
    return TF.conv2d(xp, w, groups=c)


def torch_ffl(pred, target, loss_weight=1.0, alpha=1.0):
    """Focal Frequency Loss oracle (Jiang et al. 2021, defaults of v0.3.0)."""
    fp = torch.fft.fft2(pred, norm="ortho")
    ft = torch.fft.fft2(target, norm="ortho")
    fp = torch.stack([fp.real, fp.imag], -1)
    ft = torch.stack([ft.real, ft.imag], -1)
    tmp = (fp - ft) ** 2
    dist = tmp[..., 0] + tmp[..., 1]
    w = torch.sqrt(dist) ** alpha
    w = w / w.amax(dim=(-2, -1), keepdim=True)
    w[torch.isnan(w)] = 0.0
    w = torch.clamp(w, 0.0, 1.0)
    return (w.detach() * dist).mean() * loss_weight


@pytest.mark.parametrize("k,sigma", [(3, 1.0), (9, 3.0), (5, 0.7)])
def test_gaussian_kernel_matches_torch(k, sigma):
    ours = np.asarray(gaussian_kernel_2d(k, jnp.float32(sigma)))
    ref = torch_gaussian_kernel_2d(k, torch.tensor(sigma)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("k,sigma", [(3, 1.0), (9, 3.0)])
def test_gaussian_blur_matches_torch(k, sigma):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 16, 5).astype(np.float32)  # NHWC
    ours = np.asarray(gaussian_blur_nhwc(jnp.asarray(x), k, jnp.float32(sigma)))
    ref = torch_blur_nchw(torch.from_numpy(x).permute(0, 3, 1, 2), k, torch.tensor(sigma))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gaussian_blur_grad_flows_to_sigma():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 3).astype(np.float32))

    def f(sigma):
        return jnp.sum(gaussian_blur_nhwc(x, 5, sigma) ** 2)

    g = jax.grad(f)(jnp.float32(2.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


@pytest.mark.parametrize("weight", [1.0, 0.01])
def test_ffl_matches_oracle(weight):
    rng = np.random.RandomState(2)
    a = rng.randn(2, 16, 16, 3).astype(np.float32)
    b = rng.randn(2, 16, 16, 3).astype(np.float32)
    ours = float(focal_frequency_loss(jnp.asarray(a), jnp.asarray(b), loss_weight=weight))
    # oracle runs NCHW; FFL ortho-fft2 over last two dims
    ref = float(torch_ffl(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2), loss_weight=weight))
    assert abs(ours - ref) < 1e-5 * max(1.0, abs(ref))


def test_ffl_identical_inputs_zero():
    a = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 2).astype(np.float32))
    assert float(focal_frequency_loss(a, a)) == 0.0


def test_ffl_gradient_only_through_distance():
    """Weight matrix must be detached: grad of w*d wrt pred = w * d(dist)/d(pred)."""
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    g = jax.grad(lambda p: focal_frequency_loss(p, b))(a)
    assert np.all(np.isfinite(np.asarray(g)))

    ta = torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2)).requires_grad_(True)
    tb = torch.from_numpy(np.asarray(b).transpose(0, 3, 1, 2))
    torch_ffl(ta, tb).backward()
    ref_g = ta.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(g), ref_g, atol=1e-5)


def test_ffl_bf16_spectra_close_to_f32():
    """The production spectral path (LossConfig.spectral_dtype=bfloat16 in
    every preset) must stay within bf16-mantissa tolerance of the f32 value —
    pins the bf16 DFT branch that TPU training actually runs, which no other
    (f32, CPU) test exercises."""
    rng = np.random.RandomState(11)
    a = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    f32 = float(focal_frequency_loss(a, b, compute_dtype="float32"))
    bf16 = float(focal_frequency_loss(a, b, compute_dtype="bfloat16"))
    # bf16 has ~3 decimal digits; spectra errors average out across the mean
    assert abs(bf16 - f32) < 2e-2 * abs(f32), (bf16, f32)
    # gradient path too (the DSL taps backprop through the DFT)
    g32 = jax.grad(lambda p: focal_frequency_loss(p, b))(a)
    g16 = jax.grad(lambda p: focal_frequency_loss(
        p, b, compute_dtype="bfloat16"))(a)
    denom = np.abs(np.asarray(g32)).max()
    assert np.abs(np.asarray(g16) - np.asarray(g32)).max() < 5e-2 * denom


def test_feature_tap_ffl_mirror_pairing():
    """enc[i] must pair with dec[n-1-i] (reference reverses the decoder list)."""
    rng = np.random.RandomState(5)
    enc = [jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32)) for _ in range(4)]
    dec = [jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32)) for _ in range(4)]
    mean_loss, losses = feature_tap_ffl(enc, dec, loss_weight=1.0)
    assert len(losses) == 4
    expected0 = float(focal_frequency_loss(dec[3], enc[0]))
    assert abs(float(losses[0]) - expected0) < 1e-6
    assert abs(float(mean_loss) - float(np.mean([float(l) for l in losses]))) < 1e-6


def test_dft2_matches_numpy_fft():
    from favae_tpu.ops.dft import dft2_real_nhwc
    rng = np.random.RandomState(7)
    for h, w in [(8, 8), (16, 12), (17, 5)]:
        x = rng.randn(2, h, w, 3).astype(np.float32)
        re, im = dft2_real_nhwc(jnp.asarray(x), norm="ortho")
        ref = np.fft.fft2(x, axes=(1, 2), norm="ortho")
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-4)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-4)


def test_max_pool_2x2_matches_reduce_window_fwd_and_bwd():
    """lpips.max_pool_2x2 (reshape+max; cheap eq-mask VJP) must equal
    nn.max_pool (reduce_window; select-and-scatter VJP) in forward exactly,
    and in backward on tie-free input. Also pins floor semantics on odd dims
    (torch MaxPool2d drops the trailing row/col)."""
    from flax import linen as nn
    from favae_tpu.models.lpips import max_pool_2x2

    rng = np.random.RandomState(11)
    # tie-free with overwhelming probability: continuous random floats
    x = jnp.asarray(rng.randn(2, 8, 10, 3).astype(np.float32))

    ref_fn = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)),
                                  np.asarray(ref_fn(x)))

    g = jnp.asarray(rng.randn(2, 4, 5, 3).astype(np.float32))
    _, vjp_new = jax.vjp(max_pool_2x2, x)
    _, vjp_ref = jax.vjp(ref_fn, x)
    np.testing.assert_allclose(np.asarray(vjp_new(g)[0]),
                               np.asarray(vjp_ref(g)[0]), atol=1e-6)

    # odd spatial dims: floor semantics (trailing row/col dropped), matching
    # torch's default MaxPool2d and the reference VGG16 tower
    xo = jnp.asarray(rng.randn(1, 7, 9, 2).astype(np.float32))
    to = torch.nn.functional.max_pool2d(
        torch.from_numpy(np.asarray(xo)).permute(0, 3, 1, 2), 2, 2)
    np.testing.assert_allclose(np.asarray(max_pool_2x2(xo)),
                               to.permute(0, 2, 3, 1).numpy(), atol=1e-7)
