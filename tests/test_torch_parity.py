"""Checkpoint-conversion parity: reference torch VQGANFCM vs favae_tpu.

Loads the reference implementation (mounted read-only at /root/reference) as a
numerical oracle, converts its randomly-initialized state_dict through
`convert_favae`, and asserts reconstruction equivalence. Skipped when the
reference isn't available.

Resolution 64 keeps CPU time sane; the weight-tree mapping logic is identical
at any resolution.
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


def _build_reference(fcm_flags, codebook_size=64, embed_dim=256,
                     ch_mult=(1, 1, 2, 2, 4), attn_resolutions=(16,)):
    sys.path.insert(0, REF)
    try:
        import torch
        from models.vqgan_fcm import VQGANFCM as TorchVQGAN
        torch.manual_seed(0)
        model = TorchVQGAN(
            codebook_size, embed_dim, False, ch_mult=tuple(ch_mult),
            attn_resolutions=list(attn_resolutions), use_cosine_sim=True,
            codebook_dim=None, use_l2_quantizer=True, sync_codebook=False,
            commitment_weight=1.0, kernel_size=9, dsl_init_sigma=3.0,
            device="cpu", num_groups=32, inference=True, **fcm_flags)
        return model.eval()
    finally:
        sys.path.remove(REF)


def _jax_cfg(fcm_kind, dsl_mode, codebook_size=64, embed_dim=256,
             ch_mult=(1, 1, 2, 2, 4), attn_resolutions=(16,)):
    from favae_tpu.config import (CodecConfig, DiscriminatorConfig,
                                  QuantizerConfig, VQGANConfig)
    # resolution stays 256: it only determines attn-block placement, and the
    # reference encoder hard-codes 256 regardless of actual input size
    return VQGANConfig(
        codec=CodecConfig(ch_mult=tuple(ch_mult),
                          attn_resolutions=tuple(attn_resolutions),
                          resolution=256, z_channels=embed_dim),
        quantizer=QuantizerConfig(codebook_size=codebook_size, dim=embed_dim,
                                  use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind="conv", num_layers=3),
        fcm_kind=fcm_kind, dsl_mode=dsl_mode, compute_dtype="float32")


@pytest.mark.parametrize("torch_flags,fcm_kind,dsl_mode,ch_mult,attn_res", [
    (dict(use_gauss_resblock=True), "res", "nonpair",
     (1, 1, 2, 2, 4), (16,)),                               # expe_5
    (dict(use_same_conv_gauss=True), "conv", "pair",
     (1, 1, 2, 2, 4), (16,)),                               # FFHQ/ImageNet f16
    (dict(use_gauss_attn=True), "attn", "nonpair",
     (1, 1, 2, 2, 4), (16,)),                               # Table 2 row 9
    (dict(use_ffl_with_fcm=True), "conv", "none",
     (1, 1, 2, 2, 4), (16,)),                               # FCM + FFL only
    (dict(use_same_conv_gauss=True), "conv", "pair",
     (1, 2, 4), ()),                                        # ImageNet f=4 trunk
])
def test_reconstruction_parity(torch_flags, fcm_kind, dsl_mode, ch_mult,
                               attn_res):
    import torch
    from favae_tpu.models.quantizer import CodebookState
    from favae_tpu.models.vqgan import VQGANFCM
    from favae_tpu.utils.torch_convert import convert_favae

    tmodel = _build_reference(torch_flags, ch_mult=ch_mult,
                              attn_resolutions=attn_res)
    cfg = _jax_cfg(fcm_kind, dsl_mode, ch_mult=ch_mult,
                   attn_resolutions=attn_res)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, cb = convert_favae(sd, cfg)
    cb = CodebookState(embed=jnp.asarray(cb.embed),
                       cluster_size=jnp.asarray(cb.cluster_size),
                       embed_avg=jnp.asarray(cb.embed_avg))

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        z_q_t, loss_q_t, idx_t, _ = tmodel.encode(xt)
        x_rec_t, _ = tmodel.decode(z_q_t)
    ref_recon = x_rec_t.numpy().transpose(0, 2, 3, 1)
    ref_idx = idx_t.numpy().reshape(-1)

    model = VQGANFCM(cfg, gaussian_kernel=9, dsl_init_sigma=3.0)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    z_q, loss_q, idx, _, _ = model.apply(
        variables, jnp.asarray(x), cb, train=False, inference=True,
        method=VQGANFCM.encode)
    x_recon, _, _ = model.apply(variables, z_q, train=False, inference=True,
                                method=VQGANFCM.decode)

    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), ref_idx)
    err = np.max(np.abs(np.asarray(x_recon) - ref_recon))
    assert err < 5e-4, f"max recon err {err}"


@pytest.mark.parametrize("torch_flags,fcm_kind,dsl_mode,disc_kind", [
    (dict(use_gauss_resblock=True), "res", "nonpair", "conv"),
    (dict(use_same_conv_gauss=True), "conv", "pair", "conv"),
])
def test_export_round_trip_and_reference_load(torch_flags, fcm_kind, dsl_mode,
                                              disc_kind):
    """The torch EXPORTER (utils/torch_export.py) is the converter's exact
    inverse: export -> convert reproduces our trees bit-for-bit, and the
    exported state_dict strict-loads into the actual reference model and
    reproduces our reconstructions there."""
    import dataclasses
    import torch
    from favae_tpu.models.quantizer import init_codebook_state
    from favae_tpu.models.vqgan import VQGANFCM
    from favae_tpu.utils.torch_convert import convert_favae
    from favae_tpu.utils.torch_export import export_favae

    ch_mult, attn_res = (1, 2, 4), ()
    cfg = _jax_cfg(fcm_kind, dsl_mode, ch_mult=ch_mult,
                   attn_resolutions=attn_res)
    cfg = dataclasses.replace(
        cfg, discriminator=dataclasses.replace(cfg.discriminator,
                                               kind=disc_kind))

    model = VQGANFCM(cfg, gaussian_kernel=9, dsl_init_sigma=3.0)
    key = jax.random.PRNGKey(3)
    cb = init_codebook_state(cfg.quantizer, key)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, dummy, cb,
                           train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))

    sd = export_favae(params, batch_stats, cb, cfg)

    # --- round trip: export -> convert == identity on our trees ----------
    params2, bs2, cb2 = convert_favae(dict(sd), cfg)
    ref = {jax.tree_util.keystr(p): v
           for p, v in jax.tree_util.tree_leaves_with_path(params2)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_array_equal(
            np.asarray(leaf), ref[jax.tree_util.keystr(path)],
            err_msg=jax.tree_util.keystr(path))
    np.testing.assert_array_equal(np.asarray(cb.embed), cb2.embed)
    np.testing.assert_array_equal(np.asarray(cb.cluster_size),
                                  cb2.cluster_size)

    # --- the reference model strict-loads the export ----------------------
    tmodel = _build_reference(torch_flags, ch_mult=ch_mult,
                              attn_resolutions=attn_res)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = tmodel.load_state_dict(tsd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing

    # --- and reproduces our reconstructions -------------------------------
    x = np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    z_q, _, idx, _, _ = model.apply(
        variables, jnp.asarray(x), cb, train=False, inference=True,
        method=VQGANFCM.encode)
    x_recon, _, _ = model.apply(variables, z_q, train=False, inference=True,
                                method=VQGANFCM.decode)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        z_q_t, _, idx_t, _ = tmodel.encode(xt)
        x_rec_t, _ = tmodel.decode(z_q_t)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1),
                                  idx_t.numpy().reshape(-1))
    err = np.max(np.abs(np.asarray(x_recon)
                        - x_rec_t.numpy().transpose(0, 2, 3, 1)))
    assert err < 5e-4, f"max recon err {err}"


def test_lpips_converter_shapes():
    """convert_lpips maps a synthetic torch-layout state dict onto the flax
    LPIPS tree and the module accepts it."""
    import numpy as np
    from favae_tpu.models.lpips import LPIPS, LPIPS_CHANNELS
    from favae_tpu.utils.torch_convert import convert_lpips, _VGG_SLICE_CONV_IDX

    rng = np.random.RandomState(0)
    sd = {}
    in_c = 3
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    ci = 0
    for s, idxs in _VGG_SLICE_CONV_IDX:
        for idx in idxs:
            c = chans[ci]
            sd[f"net.slice{s}.{idx}.weight"] = rng.randn(c, in_c, 3, 3).astype(np.float32)
            sd[f"net.slice{s}.{idx}.bias"] = rng.randn(c).astype(np.float32)
            in_c = c
            ci += 1
    for k, c in enumerate(LPIPS_CHANNELS):
        sd[f"lin{k}.model.1.weight"] = np.abs(rng.randn(1, c, 1, 1)).astype(np.float32)

    params = convert_lpips(sd)
    lpips = LPIPS(dtype=jnp.float32)
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    d = lpips.apply({"params": params}, a, a * 0.5)
    assert d.shape == (1,) and np.isfinite(float(d[0]))


@pytest.mark.parametrize("torch_flags,fcm_kind,dsl_mode", [
    (dict(use_gauss_resblock=True), "res", "nonpair"),
])
def test_train_mode_tap_parity(torch_flags, fcm_kind, dsl_mode):
    """Blurred DSL feature taps must match the reference in train mode
    (encoder + decoder non-pairwise blur, reference: models/codec.py:280-314,
    972-1004). Needs 256px input so the 9-tap blur fits every tap."""
    import torch
    from favae_tpu.models.quantizer import CodebookState
    from favae_tpu.models.vqgan import VQGANFCM
    from favae_tpu.utils.torch_convert import convert_favae

    sys.path.insert(0, REF)
    try:
        from models.vqgan_fcm import VQGANFCM as TorchVQGAN
        torch.manual_seed(0)
        tmodel = TorchVQGAN(
            64, 256, False, ch_mult=(1, 1, 2, 2, 4), attn_resolutions=[16],
            use_cosine_sim=True, codebook_dim=None, use_l2_quantizer=True,
            sync_codebook=False, commitment_weight=1.0, kernel_size=9,
            dsl_init_sigma=3.0, device="cpu", num_groups=32,
            inference=False, **torch_flags).eval()
    finally:
        sys.path.remove(REF)

    cfg = _jax_cfg(fcm_kind, dsl_mode)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, cb = convert_favae(sd, cfg)
    cb = CodebookState(embed=jnp.asarray(cb.embed),
                       cluster_size=jnp.asarray(cb.cluster_size),
                       embed_avg=jnp.asarray(cb.embed_avg))

    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # model.eval() but inference=False: blurs active, no dropout, no EMA
        z_t, enc_feats_t = tmodel.encoder(xt, inference=False)
        z_q_t, _, _ = tmodel.quantizer(z_t)
        _, dec_feats_t = tmodel.decoder(z_q_t, inference=False)

    model = VQGANFCM(cfg, gaussian_kernel=9, dsl_init_sigma=3.0)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    # train=True activates tap blurring; dropout rate is 0 in this config
    z_q, _, _, enc_feats, _ = model.apply(
        variables, jnp.asarray(x), cb, train=True, inference=False,
        rngs={"dropout": jax.random.PRNGKey(0)}, method=VQGANFCM.encode)
    _, dec_feats, _ = model.apply(
        variables, z_q, train=True, inference=False,
        rngs={"dropout": jax.random.PRNGKey(0)}, method=VQGANFCM.decode)

    assert len(enc_feats) == len(enc_feats_t) == 4
    for i, (ours, ref) in enumerate(zip(enc_feats, enc_feats_t)):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        err = np.max(np.abs(np.asarray(ours) - ref))
        assert err < 5e-3, f"enc tap {i}: {err}"
    for i, (ours, ref) in enumerate(zip(dec_feats, dec_feats_t)):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        err = np.max(np.abs(np.asarray(ours) - ref))
        assert err < 5e-3, f"dec tap {i}: {err}"


def test_actnorm_data_init_parity():
    """Our data_init pass reproduces the reference ActNorm first-forward
    initialization exactly: loc = -mean, scale = 1/(std+1e-6) per channel of
    each norm layer's input, applied sequentially so later layers see
    initialized activations (reference: models/discriminator.py:67-86,98-101).
    """
    import torch
    sys.path.insert(0, REF)
    try:
        from models.discriminator import PatchDiscriminator as TPD
    finally:
        sys.path.remove(REF)
    from favae_tpu.config import DiscriminatorConfig, VQGANConfig
    from favae_tpu.models.discriminator import build_discriminator
    from favae_tpu.utils.torch_convert import _discriminator

    torch.manual_seed(0)
    tm = TPD(num_layers=2, use_actnorm=True)
    sd0 = {f"discriminator.{k}": v.detach().numpy().copy()
           for k, v in tm.state_dict().items()}          # pre-init: loc 0 scale 1

    x_np = (np.random.RandomState(3).rand(4, 32, 32, 3)
            .astype(np.float32) * 2 - 1)
    tm.train()
    with torch.no_grad():
        tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))  # triggers init
    sd1 = {f"discriminator.{k}": v.detach().numpy()
           for k, v in tm.state_dict().items()}

    cfg = VQGANConfig(discriminator=DiscriminatorConfig(
        kind="patch", num_layers=2, use_actnorm=True))
    params0, _ = _discriminator(sd0, cfg)
    params1, _ = _discriminator(sd1, cfg)

    model = build_discriminator(cfg.discriminator, dtype=jnp.float32)
    _, mut = model.apply({"params": params0}, jnp.asarray(x_np), train=False,
                         data_init=True, mutable=["actnorm_init"])
    sown = mut["actnorm_init"]
    for name in ("norm_1", "norm_2"):
        np.testing.assert_allclose(np.asarray(sown[name]["loc"]),
                                   params1[name]["loc"],
                                   atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(sown[name]["scale"]),
                                   params1[name]["scale"],
                                   rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("kind,n_layers", [("conv", 3), ("patch", 2), ("patch", 3)])
def test_discriminator_parity(kind, n_layers):
    """Converted discriminator weights must reproduce the reference logits
    (eval mode, running BN stats)."""
    import torch
    sys.path.insert(0, REF)
    try:
        from models.discriminator import Discriminator as TD
        from models.discriminator import PatchDiscriminator as TPD
    finally:
        sys.path.remove(REF)
    from favae_tpu.config import DiscriminatorConfig
    from favae_tpu.models.discriminator import build_discriminator

    torch.manual_seed(0)
    if kind == "conv":
        tm = TD(num_layer=n_layers).eval()
    else:
        tm = TPD(num_layers=n_layers).eval()
    # make BN running stats non-trivial
    with torch.no_grad():
        for _ in range(3):
            tm.train()
            tm(torch.randn(4, 3, 64, 64))
            tm.eval()

    sd = {f"discriminator.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    cfg_d = DiscriminatorConfig(kind=kind, num_layers=n_layers)

    from favae_tpu.utils.torch_convert import _discriminator
    from favae_tpu.config import VQGANConfig
    params, stats = _discriminator(sd, VQGANConfig(discriminator=cfg_d))

    model = build_discriminator(cfg_d, dtype=jnp.float32)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-4)
