"""Block-level parity tests: jax blocks vs hand-assembled torch modules with
identical weights (torch as operator-semantics oracle: GroupNorm eps/grouping,
conv padding, MultiheadAttention packed projections, TransformerEncoderLayer
post-norm ordering)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from favae_tpu.models.blocks import (
    AttnBlock,
    Downsample,
    NonResnetBlock,
    ResnetBlock,
    TransEncoderBlock,
    Upsample,
)

F32 = jnp.float32


def t2j_conv(w):  # torch OIHW -> flax HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_lin(w):  # torch (out, in) -> flax (in, out)
    return jnp.asarray(w.detach().numpy().T)


def j(x):
    return jnp.asarray(x)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_resnet_block_matches_torch():
    torch.manual_seed(0)
    in_c, out_c = 8, 16
    gn1 = tnn.GroupNorm(4, in_c)
    conv1 = tnn.Conv2d(in_c, out_c, 3, padding=1)
    gn2 = tnn.GroupNorm(4, out_c)
    conv2 = tnn.Conv2d(out_c, out_c, 3, padding=1)
    sc = tnn.Conv2d(in_c, out_c, 1)
    for m in (gn1, conv1, gn2, conv2, sc):
        for p in m.parameters():
            p.data.normal_(0, 0.5)

    x = np.random.RandomState(0).randn(2, 6, 6, in_c).astype(np.float32)

    def torch_fwd(xt):
        h = TF.silu(gn1(xt))
        h = conv1(h)
        h = TF.silu(gn2(h))
        h = conv2(h)
        return sc(xt) + h

    ref = to_nhwc(torch_fwd(nchw(x)))

    blk = ResnetBlock(out_c, num_groups=4, dtype=F32)
    params = {"params": {
        "norm1": {"scale": j(gn1.weight.detach().numpy()), "bias": j(gn1.bias.detach().numpy())},
        "conv1": {"kernel": t2j_conv(conv1.weight), "bias": j(conv1.bias.detach().numpy())},
        "norm2": {"scale": j(gn2.weight.detach().numpy()), "bias": j(gn2.bias.detach().numpy())},
        "conv2": {"kernel": t2j_conv(conv2.weight), "bias": j(conv2.bias.detach().numpy())},
        "shortcut": {"kernel": t2j_conv(sc.weight), "bias": j(sc.bias.detach().numpy())},
    }}
    ours = np.asarray(blk.apply(params, j(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_downsample_asymmetric_pad_matches_torch():
    torch.manual_seed(1)
    conv = tnn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = np.random.RandomState(1).randn(1, 7, 9, 4).astype(np.float32)
    xt = TF.pad(nchw(x), (0, 1, 0, 1))
    ref = to_nhwc(conv(xt))

    blk = Downsample(4, dtype=F32)
    params = {"params": {"conv": {
        "kernel": t2j_conv(conv.weight), "bias": j(conv.bias.detach().numpy())}}}
    ours = np.asarray(blk.apply(params, j(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_matches_torch():
    torch.manual_seed(2)
    conv = tnn.Conv2d(4, 4, 3, padding=1)
    x = np.random.RandomState(2).randn(1, 5, 6, 4).astype(np.float32)
    ref = to_nhwc(conv(TF.interpolate(nchw(x), scale_factor=2.0, mode="nearest")))

    blk = Upsample(4, dtype=F32)
    params = {"params": {"conv": {
        "kernel": t2j_conv(conv.weight), "bias": j(conv.bias.detach().numpy())}}}
    ours = np.asarray(blk.apply(params, j(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_attn_block_matches_torch_mha():
    torch.manual_seed(3)
    c = 16
    gn = tnn.GroupNorm(4, c)
    mha = tnn.MultiheadAttention(c, num_heads=1, batch_first=True)
    x = np.random.RandomState(3).randn(2, 4, 4, c).astype(np.float32)

    xt = nchw(x)
    h = gn(xt).reshape(2, c, 16).transpose(1, 2)
    out, _ = mha(h, h, h, need_weights=False)
    ref = to_nhwc(xt + out.reshape(2, 4, 4, c).permute(0, 3, 1, 2))

    wq, wk, wv = mha.in_proj_weight.chunk(3)
    bq, bk, bv = mha.in_proj_bias.chunk(3)
    blk = AttnBlock(c, num_groups=4, dtype=F32)
    params = {"params": {
        "norm": {"scale": j(gn.weight.detach().numpy()), "bias": j(gn.bias.detach().numpy())},
        "q": {"kernel": t2j_lin(wq), "bias": j(bq.detach().numpy())},
        "k": {"kernel": t2j_lin(wk), "bias": j(bk.detach().numpy())},
        "v": {"kernel": t2j_lin(wv), "bias": j(bv.detach().numpy())},
        "out": {"kernel": t2j_lin(mha.out_proj.weight),
                "bias": j(mha.out_proj.bias.detach().numpy())},
    }}
    ours = blk.apply(params, j(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_trans_encoder_block_matches_torch():
    torch.manual_seed(4)
    c, heads = 32, 8
    gn = tnn.GroupNorm(32, c)
    layer = tnn.TransformerEncoderLayer(c, nhead=heads, batch_first=True)
    layer.eval()
    x = np.random.RandomState(4).randn(2, 4, 4, c).astype(np.float32)

    with torch.no_grad():
        xt = nchw(x)
        h = gn(xt).reshape(2, c, 16).transpose(1, 2)
        out = layer(h)
        ref = out.reshape(2, 4, 4, c).numpy()

    wq, wk, wv = layer.self_attn.in_proj_weight.chunk(3)
    bq, bk, bv = layer.self_attn.in_proj_bias.chunk(3)
    blk = TransEncoderBlock(c, num_heads=heads, dtype=F32)
    params = {"params": {
        "norm": {"scale": j(gn.weight.detach().numpy()), "bias": j(gn.bias.detach().numpy())},
        "q": {"kernel": t2j_lin(wq), "bias": j(bq.detach().numpy())},
        "k": {"kernel": t2j_lin(wk), "bias": j(bk.detach().numpy())},
        "v": {"kernel": t2j_lin(wv), "bias": j(bv.detach().numpy())},
        "attn_out": {"kernel": t2j_lin(layer.self_attn.out_proj.weight),
                     "bias": j(layer.self_attn.out_proj.bias.detach().numpy())},
        "ln1": {"scale": j(layer.norm1.weight.detach().numpy()),
                "bias": j(layer.norm1.bias.detach().numpy())},
        "ff1": {"kernel": t2j_lin(layer.linear1.weight),
                "bias": j(layer.linear1.bias.detach().numpy())},
        "ff2": {"kernel": t2j_lin(layer.linear2.weight),
                "bias": j(layer.linear2.bias.detach().numpy())},
        "ln2": {"scale": j(layer.norm2.weight.detach().numpy()),
                "bias": j(layer.norm2.bias.detach().numpy())},
    }}
    ours = blk.apply(params, j(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_nonresnet_block_no_residual():
    """NonResnetBlock must return the conv branch WITHOUT adding the input."""
    c = 8
    x = np.random.RandomState(5).randn(1, 4, 4, c).astype(np.float32)
    blk_r = ResnetBlock(c, num_groups=4, dtype=F32)
    blk_n = NonResnetBlock(c, num_groups=4, dtype=F32)
    pr = blk_r.init(jax.random.PRNGKey(0), j(x))
    res = np.asarray(blk_r.apply(pr, j(x)))
    non = np.asarray(blk_n.apply(pr, j(x)))
    np.testing.assert_allclose(res, x + non, atol=1e-5)
