"""Training-dynamics parity: N full train steps vs the torch reference.

Builds the reference VQGANFCM at small dims, converts its init through
`convert_favae`, then runs the SAME batches through (a) a faithful torch
re-enactment of the reference train loop (favae_scripts/train_favae.py:56-116:
two-stage GAN step, Adam(0.5, 0.9), adaptive disc weight via autograd.grad on
the final conv, FFL + mirror-paired DSL, codebook EMA in both stages) and
(b) our jitted `make_train_step`, and asserts the updated parameters, learned
sigmas, codebook EMA state, BN running stats, and per-step losses/weight_d
match. This is the test that catches silent STE-routing / EMA-order /
blur-gradient bugs that forward-only parity cannot.

The perceptual branch is pinned with SYNTHETIC VGG weights shared bit-exactly
through convert_lpips (the released vgg16_lpips.pt is egress-blocked and
torchvision is absent, so the torch side re-enacts losses/lpips.py directly —
the compute graph is identical either way).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted")

LR = 1e-4
# Two steps: step 0 pins every loss/grad path on identical params; step 1 pins
# the cross-step dynamics (EMA threading, Adam state, BN stats). Three or more
# steps hit argmax tie-flips in the quantizer (params drift O(lr) after two
# updates and near-tie codebook scores flip), which diverges reconstructions
# locally without any routing bug — verified with an lr=0 run.
N_STEPS = 2
CW = 1.0    # codebook_weight
DW = 0.75   # disc_weight
FFL_W = 1.0
DSL_W = 1.0  # large so DSL/sigma gradients are a visible fraction of updates


def torch_ffl(pred, target, loss_weight=1.0, alpha=1.0):
    """Focal Frequency Loss (Jiang et al. 2021, v0.3.0 defaults), differentiable
    torch oracle; weight matrix detached exactly like the package."""
    import torch
    fp = torch.fft.fft2(pred, norm="ortho")
    ft = torch.fft.fft2(target, norm="ortho")
    dist = (fp.real - ft.real) ** 2 + (fp.imag - ft.imag) ** 2
    with torch.no_grad():
        w = torch.sqrt(dist) ** alpha
        w = w / w.amax(dim=(-2, -1), keepdim=True)
        w = torch.nan_to_num(w, nan=0.0).clamp(0.0, 1.0)
    return (w * dist).mean() * loss_weight


def torch_gaussian_blur(x, kernel_size, sigma):
    """T.GaussianBlur oracle (torchvision unavailable): same kernel formula
    (linspace half-width, normalized pdf) and reflect padding, per channel."""
    import torch
    half = (kernel_size - 1) * 0.5
    g = torch.linspace(-half, half, kernel_size)
    pdf = torch.exp(-0.5 * (g / sigma) ** 2)
    k1 = (pdf / pdf.sum()).to(x.dtype)
    c = x.shape[1]
    pad = kernel_size // 2
    xp = torch.nn.functional.pad(x, (pad, pad, pad, pad), mode="reflect")
    kh = k1.view(1, 1, 1, kernel_size).expand(c, 1, 1, kernel_size)
    kv = k1.view(1, 1, kernel_size, 1).expand(c, 1, kernel_size, 1)
    y = torch.nn.functional.conv2d(xp, kh, groups=c)
    return torch.nn.functional.conv2d(y, kv, groups=c)


def make_lpips_state_dict(seed=11):
    """Synthetic reference-layout LPIPS weights (losses/lpips.py key names:
    net.slice{s}.{idx}.{weight,bias}, lin{k}.model.1.weight). The released
    vgg16_lpips.pt is egress-blocked; random weights exercise the identical
    compute graph on both sides."""
    rs = np.random.RandomState(seed)
    slices = [(1, (0, 2), (64, 64)), (2, (5, 7), (128, 128)),
              (3, (10, 12, 14), (256, 256, 256)),
              (4, (17, 19, 21), (512, 512, 512)),
              (5, (24, 26, 28), (512, 512, 512))]
    sd = {}
    cin = 3
    for s, idxs, chans in slices:
        for idx, cout in zip(idxs, chans):
            sd[f"net.slice{s}.{idx}.weight"] = (
                rs.randn(cout, cin, 3, 3)
                * np.sqrt(2.0 / (cin * 9))).astype(np.float32)
            sd[f"net.slice{s}.{idx}.bias"] = (
                rs.randn(cout).astype(np.float32) * 0.05)
            cin = cout
    for k, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{k}.model.1.weight"] = np.abs(
            rs.randn(1, c, 1, 1).astype(np.float32)) * 0.1
    return sd


def torch_lpips(sd, x, y):
    """Differentiable torch oracle of the reference LPIPS forward
    (losses/lpips.py:39-52: scaling layer, 5 VGG16 feature slices,
    F.normalize'd features, squared diff, 1x1 linear heads, spatial mean,
    summed over slices). torchvision is unavailable here, so the VGG16
    feature stack (conv3x3+ReLU, maxpool between slices) is re-enacted
    directly from the state dict."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    slices = [(1, (0, 2)), (2, (5, 7)), (3, (10, 12, 14)),
              (4, (17, 19, 21)), (5, (24, 26, 28))]

    def features(t):
        h = (t - shift) / scale
        outs = []
        for s, (si, idxs) in enumerate(slices):
            if s > 0:
                h = F.max_pool2d(h, 2)
            for idx in idxs:
                h = F.relu(F.conv2d(
                    h, torch.from_numpy(sd[f"net.slice{si}.{idx}.weight"]),
                    torch.from_numpy(sd[f"net.slice{si}.{idx}.bias"]),
                    padding=1))
            outs.append(h)
        return outs

    f0, f1 = features(x), features(y)
    val = 0.0
    for k in range(5):
        d = (F.normalize(f0[k], dim=1) - F.normalize(f1[k], dim=1)) ** 2
        w = torch.from_numpy(sd[f"lin{k}.model.1.weight"])
        val = val + F.conv2d(d, w).mean([1, 2, 3])
    return val


def _run_reference_steps(tmodel, x_np, hinge_g, hinge_d, sl_w=0.0,
                         dsl_w=DSL_W, gaussian_kernel=3, gaussian_sigma=3.0,
                         lr=LR, pw=0.0, lpips_sd=None, n_steps=None,
                         keep_recon=True):
    """Re-enact favae_scripts/train_favae.py:74-116 with disc+ffl on
    (perceptual term included when pw > 0, train_favae.py:77-79)."""
    import torch
    if n_steps is None:
        n_steps = N_STEPS

    xt = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    g_params = (list(tmodel.encoder.parameters())
                + list(tmodel.decoder.parameters())
                + list(tmodel.quantizer.parameters()))
    groups = [{"params": g_params}]
    if hasattr(tmodel, "sigmas"):   # pairwise DSL: model-level sigma group
        groups.append({"params": tmodel.sigmas, "lr": 2.0e-7 if lr else 0.0})
    opt_g = torch.optim.Adam(groups, lr=lr, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(tmodel.discriminator.parameters(),
                             lr=lr, betas=(0.5, 0.9))
    tmodel.train()
    logs = []
    for _ in range(n_steps):
        opt_g.zero_grad()
        x_recon, loss_q, logits_fake, _, enc_feats, dec_feats = tmodel(xt, stage=0)
        loss_l1 = (xt - x_recon).abs().mean()
        loss_perceptual = (torch_lpips(lpips_sd, xt, x_recon).mean()
                           if pw > 0 else torch.tensor(0.0))
        loss_recon = loss_l1 + pw * loss_perceptual
        loss_g = loss_recon + CW * loss_q

        loss_disc = hinge_g(logits_fake)
        last = tmodel.decoder.final[2].weight
        g_disc = torch.autograd.grad(loss_disc, last, retain_graph=True)[0]
        g_recon = torch.autograd.grad(loss_recon, last, retain_graph=True)[0]
        weight_d = (g_recon.norm() / (g_disc.norm() + 1e-4)).clamp(0, 1e4).item()
        loss_g = loss_g + weight_d * DW * loss_disc

        loss_ffl = torch_ffl(x_recon, xt, FFL_W)
        loss_g = loss_g + loss_ffl
        # in-place reverse semantics preserved (losses/vqgan_losses.py:20,38).
        # NOTE: DSL and SL cannot both be active upstream — DSL's in-place
        # reverse makes SL's own reverse restore the original order, pairing
        # taps of mismatched resolutions (crashes in the FFL). The matrix
        # tests each branch the only way the reference can run it.
        de_feat = list(dec_feats)
        loss_dsl = torch.tensor(0.0)
        if dsl_w > 0:
            de_feat.reverse()
            taps = [torch_ffl(de_feat[i], enc_feats[i], dsl_w)
                    for i in range(4)]
            loss_dsl = sum(taps) / 4
            loss_g = loss_g + loss_dsl
        loss_sl = torch.tensor(0.0)
        if sl_w > 0:
            de_feat.reverse()  # SL's own reverse (mirror pairing when alone)
            en_b = [torch_gaussian_blur(f, gaussian_kernel, gaussian_sigma)
                    for f in enc_feats]
            de_b = [torch_gaussian_blur(f, gaussian_kernel, gaussian_sigma)
                    for f in de_feat]
            loss_sl = sum(torch_ffl(de_b[i], en_b[i], sl_w)
                          for i in range(4)) / 4
            loss_g = loss_g + loss_sl
        loss_g.backward()
        opt_g.step()

        opt_d.zero_grad()
        logits_real, logits_fake1 = tmodel(xt, stage=1)
        loss_d = hinge_d(logits_real, logits_fake1)
        loss_d.backward()
        opt_d.step()
        logs.append(dict(
            loss_l1=loss_l1.item(), loss_q=loss_q.item(),
            loss_disc=loss_disc.item(), weight_d=weight_d,
            loss_ffl=loss_ffl.item(), loss_dsl=loss_dsl.item(),
            loss_sl=loss_sl.item(), loss_perceptual=loss_perceptual.item(),
            loss_d=loss_d.item(), loss_g=loss_g.item(),
            x_recon=(x_recon.detach().numpy().transpose(0, 2, 3, 1)
                     if keep_recon else None)))
    return logs


def _assert_tree_close(ours, ref, atol, what, mean_tol=None,
                       global_mean_tol=None):
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_r = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(ref)}
    assert len(flat_o) == len(flat_r), (what, len(flat_o), len(flat_r))
    tot_sum, tot_n = 0.0, 0
    for path, leaf in flat_o:
        key = jax.tree_util.keystr(path)
        diff = np.abs(np.asarray(leaf, np.float64) -
                      np.asarray(flat_r[key], np.float64))
        assert diff.max() < atol, f"{what}{key}: max|diff|={diff.max():.3e}"
        tot_sum += diff.sum()
        tot_n += diff.size
        # The attention K-projection bias has an analytically ZERO gradient
        # (adding a constant to every key shifts each query's logits uniformly
        # and softmax is shift-invariant), so both frameworks feed Adam pure
        # fp noise there -> per-element updates are ~±lr random. The max bound
        # still applies; the per-leaf noise-floor bound would be meaningless.
        if mean_tol is not None and "['k']['bias']" not in key:
            assert diff.mean() < mean_tol, \
                f"{what}{key}: mean|diff|={diff.mean():.3e}"
    if global_mean_tol is not None and tot_n:
        gm = tot_sum / tot_n
        assert gm < global_mean_tol, f"{what}: global mean|diff|={gm:.3e}"


@pytest.mark.parametrize(
    "torch_flags,fcm_kind,dsl_mode,dsl_w,sl_w,disc_kind,pw", [
        # expe_5 topology
        (dict(use_gauss_resblock=True), "res", "nonpair", DSL_W, 0.0, "conv",
         0.0),
        # model-level sigmas
        (dict(use_same_conv_gauss=True), "conv", "pair", DSL_W, 0.0, "conv",
         0.0),
        # attn-FCM decoder + SL branch active (SL must run with DSL off: the
        # reference's in-place double reverse crashes otherwise — see
        # _run_reference_steps)
        (dict(use_gauss_attn=True), "attn", "nonpair", 0.0, 1.0, "conv", 0.0),
        # PatchGAN discriminator (BN flavour) through both GAN stages
        (dict(use_gauss_resblock=True), "res", "nonpair", DSL_W, 0.0, "patch",
         0.0),
        # perceptual branch active: LPIPS forward + its gradient through the
        # adaptive disc weight and the recon head, with synthetic VGG weights
        # shared bit-exactly via convert_lpips (the released vgg16_lpips.pt is
        # egress-blocked; the compute graph is identical regardless)
        (dict(use_gauss_resblock=True), "res", "nonpair", DSL_W, 0.0, "conv",
         1.0),
    ])
def test_train_step_parity(torch_flags, fcm_kind, dsl_mode, dsl_w, sl_w,
                           disc_kind, pw):
    import torch
    sys.path.insert(0, REF)
    try:
        from models.vqgan_fcm import VQGANFCM as TorchVQGAN
        from models.discriminator import PatchDiscriminator as TPatchD
        from losses.hinge import hinge_d_loss as t_hinge_d
        from losses.hinge import hinge_g_loss as t_hinge_g
        torch.manual_seed(0)
        tmodel = TorchVQGAN(
            64, 256, False, ch_mult=(1, 2, 4), attn_resolutions=[],
            use_cosine_sim=True, codebook_dim=None, use_l2_quantizer=True,
            sync_codebook=False, commitment_weight=CW, kernel_size=3,
            dsl_init_sigma=1.0, device="cpu", num_groups=32,
            inference=False, **torch_flags)
        if disc_kind == "patch":
            # upstream bug: vqgan_fcm.py:108 passes n_layers= to a ctor whose
            # arg is num_layers= — use_patch_discriminator CRASHES through
            # VQGANFCM. Instantiate the intended module directly instead.
            tmodel.discriminator = TPatchD(num_layers=3)
    finally:
        sys.path.remove(REF)
    if fcm_kind == "attn":
        # the attn-FCM wraps nn.TransformerEncoderLayer with its default
        # dropout=0.1 ACTIVE in train mode (reference codec.py:113) —
        # stochastic, so the dynamics can only be pinned with dropout off on
        # both sides (attn_fcm_dropout=0.0 below mirrors this).
        for m in tmodel.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if isinstance(m, torch.nn.MultiheadAttention):
                m.dropout = 0.0

    from favae_tpu.config import (CodecConfig, DiscriminatorConfig, LossConfig,
                                  QuantizerConfig, TrainConfig, VQGANConfig)
    from favae_tpu.models.lpips import LPIPS
    from favae_tpu.models.quantizer import CodebookState
    from favae_tpu.train.favae_state import FavaeTrainState, split_params
    from favae_tpu.train.favae_step import make_train_step
    from favae_tpu.utils.torch_convert import convert_favae

    cfg = VQGANConfig(
        codec=CodecConfig(ch_mult=(1, 2, 4), attn_resolutions=(),
                          resolution=256, z_channels=256,
                          attn_fcm_dropout=0.0),
        quantizer=QuantizerConfig(codebook_size=64, dim=256,
                                  use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind=disc_kind, num_layers=3),
        fcm_kind=fcm_kind, dsl_mode=dsl_mode, compute_dtype="float32")
    loss_cfg = LossConfig(perceptual_weight=pw, codebook_weight=CW,
                          disc_weight=DW, ffl_weight=FFL_W, dsl_weight=dsl_w,
                          sl_weight=sl_w, gaussian_kernel=3,
                          gaussian_sigma=3.0, dsl_init_sigma=1.0)
    train_cfg = TrainConfig(batch_size=2, faithful_stage1_recompute=True)

    sd0 = {k: v.detach().numpy().copy()
           for k, v in tmodel.state_dict().items()}
    params0, bs0, cb0 = convert_favae(sd0, cfg)
    params_g0, params_d0 = split_params(params0)

    state, model, tx_g, tx_d = FavaeTrainState.create(
        cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=LR, image_size=32)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    lpips_sd = None
    if pw > 0:
        from favae_tpu.utils.torch_convert import convert_lpips
        lpips_sd = make_lpips_state_dict()
        state = state.replace(lpips_params=to_j(convert_lpips(lpips_sd)))
    state = state.replace(
        params_g=to_j(params_g0), params_d=to_j(params_d0),
        batch_stats=to_j(bs0),
        cb_state=CodebookState(embed=jnp.asarray(cb0.embed),
                               cluster_size=jnp.asarray(cb0.cluster_size),
                               embed_avg=jnp.asarray(cb0.embed_avg)))
    state = state.replace(opt_g=tx_g.init(state.params_g),
                          opt_d=tx_d.init(state.params_d))

    x_np = (np.random.RandomState(0).rand(2, 32, 32, 3)
            .astype(np.float32) * 2 - 1)

    # ---- torch side (mutates tmodel) ----
    ref_logs = _run_reference_steps(tmodel, x_np, t_hinge_g, t_hinge_d,
                                    sl_w=sl_w, dsl_w=dsl_w, gaussian_kernel=3,
                                    gaussian_sigma=3.0, pw=pw,
                                    lpips_sd=lpips_sd)

    # ---- our side ----
    step = jax.jit(make_train_step(
        model, LPIPS(dtype=jnp.float32), tx_g, tx_d, cfg, loss_cfg, train_cfg,
        disc_on=True, ffl_on=True))
    x = jnp.asarray(x_np)
    our_logs = []
    for i in range(N_STEPS):
        state, m = step(state, x, jax.random.PRNGKey(7))
        our_logs.append({k: np.asarray(v) for k, v in m.items()})

    # per-step scalars: catches loss-composition and adaptive-weight bugs.
    # Step 0 runs on identical params -> tight. Later steps inherit Adam's
    # per-element sign normalization (near-zero-grad elements legitimately
    # differ by O(lr) after one update), which the weight_d norm-ratio and
    # the losses amplify slightly -> looser.
    for i, (ref, ours) in enumerate(zip(ref_logs, our_logs)):
        rtol = 2e-3 if i == 0 else 2e-2
        pairs = [("loss_l1", "loss_l1"), ("loss_q", "loss_q"),
                 ("loss_disc", "loss_disc"), ("weight_d", "weight_d"),
                 ("loss_ffl", "loss_ffl"),
                 ("loss_d", "loss_d"), ("loss_g", "loss_g")]
        if dsl_w > 0:
            pairs.append(("loss_dsl", "loss_dsl_features"))
        if sl_w > 0:
            pairs.append(("loss_sl", "loss_sl_gauss_features"))
        if pw > 0:
            pairs.append(("loss_perceptual", "loss_perceptual"))
        for rk, ok in pairs:
            # weight_d is a ratio of full-graph gradient norms — the most
            # chaotic scalar; verified with lr=0 that the divergence comes
            # from Adam sign-flips on near-zero grads, not routing.
            r = 8e-2 if (rk == "weight_d" and i > 0) else rtol
            np.testing.assert_allclose(
                float(ours[ok]), ref[rk], rtol=r, atol=2e-5,
                err_msg=f"step {i} {rk}")
        rerr = np.max(np.abs(ours["x_recon"] - ref["x_recon"]))
        assert rerr < (2e-3 if i == 0 else 5e-3), f"step {i} recon max err {rerr}"

    # updated state vs the trained torch model, through the same converter
    sdN = {k: v.detach().numpy().copy()
           for k, v in tmodel.state_dict().items()}
    paramsN, bsN, cbN = convert_favae(sdN, cfg)
    params_gN, params_dN = split_params(paramsN)

    # Adam's per-element sign normalization means a near-zero-grad element can
    # legitimately differ by up to 2*lr per step (opposite-sign first updates),
    # i.e. 4*lr over two steps; measured: ~0.04% of elements above lr, global
    # mean |diff| ~0.02*lr, worst single leaf (cancellation-heavy BN bias)
    # ~0.2*lr. Routing bugs move whole subsystems by O(lr) — caught by the
    # per-leaf mean bound (0.3*lr) and the global mean bound (0.05*lr, 2.5x
    # the measured noise floor).
    _assert_tree_close(state.params_g, params_gN, atol=4.5 * LR,
                       mean_tol=0.3 * LR, global_mean_tol=0.05 * LR,
                       what="params_g")
    # The discriminator's post-step bounds are looser: hinge-loss grads are
    # cancellation sums (head.bias grad is exactly 0 when all margins are
    # active; BN biases are near-zero channel sums), so a larger fraction of
    # its few params sits in the Adam sign-noise regime, and its smallest
    # leaves (64-element biases) make the per-leaf mean itself noisy
    # (measured 0.4*lr on conv_in.bias in the attn case). Its gradients are
    # pinned tightly (2e-6 relative) by test_discriminator_grad_parity below.
    # global mean measured 0.16-0.21*lr across the matrix (attn case peaks);
    # a routing bug shifts it by O(lr)
    _assert_tree_close(state.params_d, params_dN, atol=4.5 * LR,
                       mean_tol=0.5 * LR, global_mean_tol=0.25 * LR,
                       what="params_d")
    # embed_avg is excluded: the reference CosineSimCodebook has no such
    # buffer (l2_quantize.py:308-444) — the converter synthesizes it from
    # `embed`, and our cosine path correctly leaves it untouched.
    # a single argmax tie-flip moves one token between bins: cluster_size
    # changes by (1-decay)*1 = 0.2 per EMA update for the two codes involved.
    # Allow a few flips (4 EMA updates happen over 2 faithful steps) while
    # still catching systematic assignment or decay bugs (those shift most
    # bins and every embed row).
    # ...and shifts the EMA target of a small bin by up to 0.2*|mean change|
    # for its embed row, hence the wide max bound; the mean bound (verified
    # ~1e-7 with lr=0) is what catches decay/assignment/normalization bugs.
    _assert_tree_close(
        dict(embed=state.cb_state.embed), dict(embed=cbN.embed),
        atol=5e-2, mean_tol=5e-4, what="codebook ")
    # mean_tol: each argmax tie-flip moves (1-decay)=0.2 of a count between
    # two bins per EMA update; with K=64 test codes a handful of flipped
    # tokens lands around 0.02-0.03 mean. A systematic assignment/decay bug
    # shifts most bins by O(1). (0.02 -> 0.03 after the stage-0 vjp-split
    # restructure changed fp summation order; lr=0 forward parity is the
    # tight pin.)
    _assert_tree_close(
        dict(cluster_size=state.cb_state.cluster_size),
        dict(cluster_size=cbN.cluster_size),
        atol=1.0, mean_tol=0.03, what="codebook ")
    # The running stats are momentum blends of batch statistics of D's
    # activations on x_recon — and x_recon itself is allowed to differ by
    # 5e-3 above (O(lr)-amplified fp noise), so the running means inherit
    # drift of the same order. 1e-2 still catches momentum/unbiased-variance
    # bugs, which shift the stats by O(1) of their magnitude.
    if bsN:
        _assert_tree_close(state.batch_stats, bsN, atol=1e-2,
                           what="batch_stats")


def test_train_parity_lr0_batch_stats_tight():
    """lr=0 run: params stay frozen on both sides, so after two full GAN
    steps the discriminator BN running stats (D forward on x / x_recon in
    train mode, momentum blend + unbiased running var) must match at the
    tight 5e-3 tolerance — a pin on the D-forward/BN path independent of the
    Adam-amplified fp noise that forces the 1e-2 bound in the lr>0 cases."""
    import torch
    sys.path.insert(0, REF)
    try:
        from models.vqgan_fcm import VQGANFCM as TorchVQGAN
        from losses.hinge import hinge_d_loss as t_hinge_d
        from losses.hinge import hinge_g_loss as t_hinge_g
        torch.manual_seed(0)
        tmodel = TorchVQGAN(
            64, 256, False, ch_mult=(1, 2, 4), attn_resolutions=[],
            use_cosine_sim=True, codebook_dim=None, use_l2_quantizer=True,
            sync_codebook=False, commitment_weight=CW, kernel_size=3,
            dsl_init_sigma=1.0, device="cpu", num_groups=32,
            inference=False, use_gauss_resblock=True)
    finally:
        sys.path.remove(REF)

    from favae_tpu.config import (CodecConfig, DiscriminatorConfig, LossConfig,
                                  QuantizerConfig, TrainConfig, VQGANConfig)
    from favae_tpu.models.lpips import LPIPS
    from favae_tpu.models.quantizer import CodebookState
    from favae_tpu.train.favae_state import FavaeTrainState, split_params
    from favae_tpu.train.favae_step import make_train_step
    from favae_tpu.utils.torch_convert import convert_favae

    cfg = VQGANConfig(
        codec=CodecConfig(ch_mult=(1, 2, 4), attn_resolutions=(),
                          resolution=256, z_channels=256),
        quantizer=QuantizerConfig(codebook_size=64, dim=256,
                                  use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind="conv", num_layers=3),
        fcm_kind="res", dsl_mode="nonpair", compute_dtype="float32")
    loss_cfg = LossConfig(perceptual_weight=0.0, codebook_weight=CW,
                          disc_weight=DW, ffl_weight=FFL_W, dsl_weight=DSL_W,
                          sl_weight=0.0, gaussian_kernel=3, dsl_init_sigma=1.0)
    train_cfg = TrainConfig(batch_size=2, faithful_stage1_recompute=True)

    sd0 = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    params0, bs0, cb0 = convert_favae(sd0, cfg)
    params_g0, params_d0 = split_params(params0)

    state, model, tx_g, tx_d = FavaeTrainState.create(
        cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=0.0, image_size=32)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = state.replace(
        params_g=to_j(params_g0), params_d=to_j(params_d0),
        batch_stats=to_j(bs0),
        cb_state=CodebookState(embed=jnp.asarray(cb0.embed),
                               cluster_size=jnp.asarray(cb0.cluster_size),
                               embed_avg=jnp.asarray(cb0.embed_avg)))
    state = state.replace(opt_g=tx_g.init(state.params_g),
                          opt_d=tx_d.init(state.params_d))

    x_np = (np.random.RandomState(0).rand(2, 32, 32, 3)
            .astype(np.float32) * 2 - 1)
    _run_reference_steps(tmodel, x_np, t_hinge_g, t_hinge_d, lr=0.0)

    step = jax.jit(make_train_step(
        model, LPIPS(dtype=jnp.float32), tx_g, tx_d, cfg, loss_cfg, train_cfg,
        disc_on=True, ffl_on=True))
    for _ in range(N_STEPS):
        state, _ = step(state, jnp.asarray(x_np), jax.random.PRNGKey(7))

    sdN = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    _, bsN, _ = convert_favae(sdN, cfg)
    _assert_tree_close(state.batch_stats, bsN, atol=5e-3, what="lr0 batch_stats")
    # params really did stay frozen (lr=0 both sides)
    _assert_tree_close(state.params_g, params_g0, atol=1e-7, what="lr0 params_g")


def test_discriminator_grad_parity():
    """hinge_d gradients through the train-mode (batch-stat) discriminator
    match the torch reference to fp noise — the tight pin that justifies the
    looser post-Adam params_d bounds above (hinge cancellation puts many D
    elements in the sign-noise regime)."""
    import torch
    sys.path.insert(0, REF)
    try:
        from models.discriminator import Discriminator as TD
        from losses.hinge import hinge_d_loss as t_hinge_d
    finally:
        sys.path.remove(REF)
    from favae_tpu.config import DiscriminatorConfig, VQGANConfig
    from favae_tpu.models.discriminator import build_discriminator
    from favae_tpu.ops.losses import hinge_d_loss
    from favae_tpu.utils.torch_convert import _discriminator

    torch.manual_seed(0)
    tm = TD(num_layer=3).train()
    x_np = (np.random.RandomState(0).rand(2, 32, 32, 3)
            .astype(np.float32) * 2 - 1)
    xr_np = (np.random.RandomState(5).rand(2, 32, 32, 3)
             .astype(np.float32) * 2 - 1)

    loss_t = t_hinge_d(tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2))),
                       tm(torch.from_numpy(xr_np.transpose(0, 3, 1, 2))))
    loss_t.backward()
    tg = {f"discriminator.{n}": p.grad.detach().numpy()
          for n, p in tm.named_parameters()}
    # converter needs the BN buffers present; zeros are fine (unused for grads)
    for n, b in tm.named_buffers():
        tg[f"discriminator.{n}"] = b.detach().numpy()

    cfg = VQGANConfig(discriminator=DiscriminatorConfig(kind="conv",
                                                        num_layers=3))
    sd = {f"discriminator.{n}": t.detach().numpy()
          for n, t in tm.state_dict().items()}
    params, stats = _discriminator(sd, cfg)
    grads_ref, _ = _discriminator(tg, cfg)

    model = build_discriminator(cfg.discriminator, dtype=jnp.float32)

    def loss_fn(p):
        v = {"params": p, "batch_stats": stats}
        lr, _ = model.apply(v, jnp.asarray(x_np), train=True,
                            mutable=["batch_stats"])
        lf, _ = model.apply(v, jnp.asarray(xr_np), train=True,
                            mutable=["batch_stats"])
        return hinge_d_loss(lr, lf)

    val, g = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    np.testing.assert_allclose(float(val), float(loss_t), rtol=1e-5)
    refmap = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(grads_ref)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        key = jax.tree_util.keystr(path)
        r = np.asarray(refmap[key], np.float64)
        d = np.max(np.abs(np.asarray(leaf, np.float64) - r))
        scale = np.abs(r).max() + 1e-12
        assert d / scale < 1e-4 or d < 1e-7, f"{key}: {d} (scale {scale})"

# ---------------------------------------------------------------------------
# Statistical trajectory parity (VERDICT r3 next-round #4): the 2-step test
# above pins exact dynamics but stops before quantizer argmax tie-flips make
# trajectories chaotic. This test runs ~100 steps and checks the LOSS CURVES
# statistically: windowed means of ours-vs-torch must stay inside a chaos
# envelope measured from a torch run with a 1e-3-perturbed init.
#
# Calibration (measured, curves in docs/PARITY.md): the GAN train loop at
# this scale is CHAOTIC — windowed loss_g divergence is ~0.03-0.08 for ANY
# small perturbation (torch-vs-torch at 1e-6..1e-3 init noise), and our
# continuous framework fp differences produce ~1.4x the 1e-3-perturbation
# envelope. A decay+1e-3 injected bug lands INSIDE this chaos floor —
# loop-level loss curves cannot detect it; that sensitivity lives in
# test_quantizer_ema_trajectory_100_steps below, where trajectories are
# deterministic and the same bug gives a 10^6 signal-to-noise margin. The
# sensitivity half HERE injects a grosser systematic bug (lr scaled 1.5x)
# and asserts the envelope catches it — the class of drift (wrong lr / loss
# weight / schedule) this loop-level instrument is actually good for.
# Re-enacts favae_scripts/train_favae.py:56-116.
# ---------------------------------------------------------------------------

N_STAT = 100
STAT_WINDOW = 25
# metrics compared (torch log key, our metric key): recon fidelity, codebook
# health, and the full generator objective
_STAT_KEYS = [("loss_l1", "loss_l1"), ("loss_q", "loss_q"),
              ("loss_g", "loss_g")]


def _build_stat_torch_model(perturb_scale=0.0, seed=0):
    import torch
    sys.path.insert(0, REF)
    try:
        from models.vqgan_fcm import VQGANFCM as TorchVQGAN
        torch.manual_seed(seed)
        tmodel = TorchVQGAN(
            64, 256, False, ch_mult=(1, 2, 4), attn_resolutions=[],
            use_cosine_sim=True, codebook_dim=None, use_l2_quantizer=True,
            sync_codebook=False, commitment_weight=CW, kernel_size=3,
            dsl_init_sigma=1.0, device="cpu", num_groups=32,
            inference=False, use_gauss_resblock=True)
    finally:
        sys.path.remove(REF)
    if perturb_scale:
        rs = np.random.RandomState(123)
        with torch.no_grad():
            for p in tmodel.parameters():
                p.add_(torch.from_numpy(
                    rs.randn(*p.shape).astype(np.float32) * perturb_scale))
    return tmodel


def _window_means(curve):
    c = np.asarray(curve, np.float64)
    return c.reshape(-1, STAT_WINDOW).mean(axis=1)


def _run_ours_stat(sd0, x_np, decay, lr_scale=1.0):
    """100 jitted steps from the torch init; returns per-step loss curves."""
    import dataclasses

    from favae_tpu.config import (CodecConfig, DiscriminatorConfig,
                                  LossConfig, QuantizerConfig, TrainConfig,
                                  VQGANConfig)
    from favae_tpu.models.lpips import LPIPS
    from favae_tpu.models.quantizer import CodebookState
    from favae_tpu.train.favae_state import FavaeTrainState, split_params
    from favae_tpu.train.favae_step import make_train_step
    from favae_tpu.utils.torch_convert import convert_favae

    cfg = VQGANConfig(
        codec=CodecConfig(ch_mult=(1, 2, 4), attn_resolutions=(),
                          resolution=256, z_channels=256),
        quantizer=QuantizerConfig(codebook_size=64, dim=256,
                                  use_cosine_sim=True, decay=decay),
        discriminator=DiscriminatorConfig(kind="conv", num_layers=3),
        fcm_kind="res", dsl_mode="nonpair", compute_dtype="float32")
    loss_cfg = LossConfig(perceptual_weight=0.0, codebook_weight=CW,
                          disc_weight=DW, ffl_weight=FFL_W, dsl_weight=DSL_W,
                          sl_weight=0.0, gaussian_kernel=3, dsl_init_sigma=1.0)
    train_cfg = TrainConfig(batch_size=2, faithful_stage1_recompute=True)

    params0, bs0, cb0 = convert_favae(sd0, cfg)
    params_g0, params_d0 = split_params(params0)
    state, model, tx_g, tx_d = FavaeTrainState.create(
        cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=LR * lr_scale,
        image_size=32)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = state.replace(
        params_g=to_j(params_g0), params_d=to_j(params_d0),
        batch_stats=to_j(bs0),
        cb_state=CodebookState(embed=jnp.asarray(cb0.embed),
                               cluster_size=jnp.asarray(cb0.cluster_size),
                               embed_avg=jnp.asarray(cb0.embed_avg)))
    state = state.replace(opt_g=tx_g.init(state.params_g),
                          opt_d=tx_d.init(state.params_d))
    step = jax.jit(make_train_step(
        model, LPIPS(dtype=jnp.float32), tx_g, tx_d, cfg, loss_cfg, train_cfg,
        disc_on=True, ffl_on=True))
    x = jnp.asarray(x_np)
    curves = {ok: np.zeros(N_STAT) for _, ok in _STAT_KEYS}
    for i in range(N_STAT):
        state, m = step(state, x, jax.random.PRNGKey(7))
        for _, ok in _STAT_KEYS:
            curves[ok][i] = float(m[ok])
    return curves


@pytest.mark.skipif(os.environ.get("FAVAE_STAT_PARITY", "") != "1",
                    reason="~25 min on this 1-core box (200 torch + 200 jax "
                           "full GAN steps); run explicitly with "
                           "FAVAE_STAT_PARITY=1 — results recorded in "
                           "docs/PARITY.md")
def test_train_parity_statistical_100_steps():
    import torch  # noqa: F401
    sys.path.insert(0, REF)
    try:
        from losses.hinge import hinge_d_loss as t_hinge_d
        from losses.hinge import hinge_g_loss as t_hinge_g
    finally:
        sys.path.remove(REF)

    x_np = (np.random.RandomState(0).rand(2, 32, 32, 3)
            .astype(np.float32) * 2 - 1)

    # torch run A (the oracle) and run B (init + 1e-3 noise): their windowed
    # divergence measures the loop's chaos amplification of a small
    # perturbation at each horizon. 1e-3 (not smaller) because a one-time
    # tiny perturbation underestimates the CONTINUOUS fp perturbation a
    # different framework applies every op (measured: ours lands at ~1.4x
    # the 1e-3 envelope, ~4x the 1e-6 one).
    tmodel_a = _build_stat_torch_model()
    sd0 = {k: v.detach().numpy().copy()
           for k, v in tmodel_a.state_dict().items()}
    logs_a = _run_reference_steps(tmodel_a, x_np, t_hinge_g, t_hinge_d,
                                  n_steps=N_STAT, keep_recon=False)
    tmodel_b = _build_stat_torch_model(perturb_scale=1e-3)
    logs_b = _run_reference_steps(tmodel_b, x_np, t_hinge_g, t_hinge_d,
                                  n_steps=N_STAT, keep_recon=False)

    ours = _run_ours_stat(sd0, x_np, decay=0.8)

    def envelope(wa, wb):
        # x3 safety over the measured chaos response, floored at 5% of the
        # signal (measured clean gaps: l1 1.5x, q 2.0x, g 1.7x the B3 env)
        scale = np.abs(wa).mean() + 1e-9
        return max(3.0 * np.max(np.abs(wa - wb)), 0.05 * scale)

    report = {}
    for rk, ok in _STAT_KEYS:
        wa = _window_means([l[rk] for l in logs_a])
        wb = _window_means([l[rk] for l in logs_b])
        wo = _window_means(ours[ok])
        env = envelope(wa, wb)
        gap = np.max(np.abs(wo - wa))
        report[rk] = (gap, env)
        assert gap <= env, (
            f"{rk}: ours-vs-torch windowed gap {gap:.5f} exceeds chaos "
            f"envelope {env:.5f} (windows ours={wo}, torchA={wa}, "
            f"torchB={wb}) — systematic training-dynamics drift")

    # visible under pytest -s so each round's run records its numbers in
    # docs/PARITY.md without a re-run
    print("\nstat-parity report (metric: ours-vs-torch gap, envelope):",
          {k: (round(g, 5), round(e, 5)) for k, (g, e) in report.items()})

    # sensitivity: the envelope must catch a GROSS systematic bug — lr
    # misapplied by 1.5x (the wrong-lr/wrong-loss-weight class this
    # instrument exists for; subtler bugs like decay+1e-3 are below the
    # loop's chaos floor and are covered by the deterministic
    # test_quantizer_ema_trajectory_100_steps).
    bugged = _run_ours_stat(sd0, x_np, decay=0.8, lr_scale=1.5)
    hits = []
    for rk, ok in _STAT_KEYS:
        wa = _window_means([l[rk] for l in logs_a])
        wb = _window_means([l[rk] for l in logs_b])
        gap = np.max(np.abs(_window_means(bugged[ok]) - wa))
        hits.append(gap > envelope(wa, wb))
    assert any(hits), (
        f"sensitivity check failed: lr*1.5 stayed inside the envelope on "
        f"every metric (clean report: {report})")


@pytest.mark.parametrize("cosine", [True, False])
def test_quantizer_ema_trajectory_100_steps(cosine):
    """Direct 100-step EMA trajectory vs the reference quantizer
    (models/l2_quantize.py): the instrument that catches slow systematic
    codebook drift — e.g. a decay off by 1e-3 — which loop-level loss curves
    CANNOT catch (measured: the full train loop's windowed loss curves are
    chaotic with a ~0.05-0.15 noise floor under ANY small perturbation, and
    an injected decay+1e-3 run lands inside it; see
    test_train_parity_statistical_100_steps / docs/PARITY.md).

    Both sides are deterministic on the same input stream and stay LOCKED to
    fp noise (measured mean |dembed| ~9e-9, |dcluster| ~2e-7 over 100 steps,
    zero argmax tie-flips), while decay+1e-3 compounds through assignment
    feedback to mean |dcluster| ~0.56 by step 100 — a 10^6 signal-to-noise
    margin."""
    import torch
    sys.path.insert(0, REF)
    try:
        from models.l2_quantize import VectorQuantize as TVQ
        torch.manual_seed(0)
        tvq = TVQ(dim=8, codebook_size=32, use_cosine_sim=cosine, decay=0.8,
                  commitment_weight=1.0).train()
    finally:
        sys.path.remove(REF)

    from favae_tpu.config import QuantizerConfig
    from favae_tpu.models.quantizer import CodebookState, codebook_lookup

    K, D, N, STEPS = 32, 8, 128, 100
    embed0 = tvq._codebook.embed.detach().numpy().reshape(K, D).copy()

    def stream(t):
        return np.random.RandomState(1000 + t).randn(N, D).astype(np.float32)

    checkpoints = (24, 49, 99)
    traj_torch = {}
    for t in range(STEPS):
        with torch.no_grad():
            tvq(torch.from_numpy(stream(t)[None]))
        if t in checkpoints:
            traj_torch[t] = (
                tvq._codebook.embed.detach().numpy().reshape(K, D).copy(),
                tvq._codebook.cluster_size.detach().numpy().reshape(-1).copy())

    def run_ours(decay):
        # the vendored reference's EuclideanCodebook has the stale-embed_avg
        # bug (it EMA-updates embed directly from per-batch means instead of
        # the smoothed embed_avg/cluster ratio); trajectory parity with the
        # REFERENCE therefore needs compat_stale_embed_avg=True (our default
        # False is the corrected algorithm — a deliberate divergence, see
        # models/quantizer.py:238-257)
        cfg = QuantizerConfig(codebook_size=K, dim=D, use_cosine_sim=cosine,
                              decay=decay,
                              compat_stale_embed_avg=not cosine)
        st = CodebookState(embed=jnp.asarray(embed0),
                           cluster_size=jnp.zeros((K,), jnp.float32),
                           embed_avg=jnp.asarray(embed0.copy()))
        out = {}
        for t in range(STEPS):
            _, _, st = codebook_lookup(cfg, st, jnp.asarray(stream(t)),
                                       train=True)
            if t in checkpoints:
                out[t] = (np.asarray(st.embed), np.asarray(st.cluster_size))
        return out

    # measured locked-trajectory noise: cosine emb ~9e-9 / cluster ~2e-7;
    # euclidean emb ~2.3e-5 (unnormalized embed magnitudes) / cluster ~1e-7
    emb_tol = 1e-6 if cosine else 1e-4
    ours = run_ours(0.8)
    for t in checkpoints:
        te, tc = traj_torch[t]
        oe, oc = ours[t]
        assert np.abs(oe - te).mean() < emb_tol, \
            f"t={t}: embed drift {np.abs(oe - te).mean():.2e}"
        assert np.abs(oc - tc).mean() < 1e-5, \
            f"t={t}: cluster_size drift {np.abs(oc - tc).mean():.2e}"

    # sensitivity: decay off by 1e-3 must be unmistakable by step 100
    # (measured: cosine cluster 0.56 / emb 1.8e-1; euclidean 0.18 / 7.8e-4)
    bug = run_ours(0.8 + 1e-3)
    be, bc = bug[99]
    te, tc = traj_torch[99]
    assert np.abs(bc - tc).mean() > 1e-2, "decay bug not detected (cluster)"
    assert np.abs(be - te).mean() > 2 * emb_tol, \
        "decay bug not detected (embed)"
