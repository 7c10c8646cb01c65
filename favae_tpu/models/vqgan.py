"""VQGAN with Frequency Complement Modules — the FA-VAE model.

reference: models/vqgan_fcm.py:18-149. Composition of Encoder + VectorQuantize
+ Decoder + Discriminator with the DSL sigma topology:

* dsl_mode == "nonpair": encoder and decoder own 4 learned sigmas each and blur
  their taps locally (reference: EncoderGauss / DecoderFcm*Gauss).
* dsl_mode == "pair": the model owns 4 shared sigmas; taps come out raw and are
  blurred here — enc tap i and dec tap j both with sigma index matching their
  position, so the mirror pairing enc[i] <-> dec[3-i] compares blurs with
  sigma i and sigma 3-i respectively (reference: models/vqgan_fcm.py:131-134).

The GAN stages of the reference forward() are *not* reproduced as a monolithic
forward here: the train step calls encode/decode/discriminate directly so it
can expose `h_pre` for the adaptive discriminator weight and order the two
optimizer updates explicitly (see favae_tpu.train.favae_step).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from favae_tpu.config import DSL_NONPAIR, DSL_PAIR, VQGANConfig
from favae_tpu.models.codec import Decoder, Encoder
from favae_tpu.models.discriminator import build_discriminator
from favae_tpu.models.quantizer import CodebookState, VectorQuantize
from favae_tpu.ops.gaussian import gaussian_blur_nhwc


class VQGANFCM(nn.Module):
    cfg: VQGANConfig
    gaussian_kernel: int = 9
    dsl_init_sigma: float = 3.0

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        nonpair = cfg.dsl_mode == DSL_NONPAIR
        self.encoder = Encoder(
            cfg.codec, dsl_nonpair=nonpair,
            gaussian_kernel=self.gaussian_kernel,
            dsl_init_sigma=self.dsl_init_sigma, dtype=dtype)
        self.decoder = Decoder(
            cfg.codec, fcm_kind=cfg.fcm_kind, dsl_nonpair=nonpair,
            gaussian_kernel=self.gaussian_kernel,
            dsl_init_sigma=self.dsl_init_sigma, dtype=dtype)
        self.quantizer = VectorQuantize(cfg.quantizer)
        self.discriminator = build_discriminator(cfg.discriminator, dtype=dtype)
        if cfg.dsl_mode == DSL_PAIR:
            self.sigmas = self.param(
                "sigmas",
                lambda _k: jnp.full((4,), self.dsl_init_sigma, jnp.float32))

    # ------------------------------------------------------------------
    def encode(self, x, cb_state: CodebookState, *, train: bool = False,
               inference: bool = False, rng: Optional[jax.Array] = None):
        """x (NHWC in [-1,1]) -> (z_q, loss_q, indices, enc_taps, new_cb_state)
        (reference: models/vqgan_fcm.py:112-118)."""
        z, enc_feats = self.encoder(x, train=train, inference=inference)
        z_q, indices, loss_q, new_state = self.quantizer(
            z, cb_state, train=train, rng=rng)
        return z_q, loss_q, indices, enc_feats, new_state

    def decode(self, z, *, train: bool = False, inference: bool = False):
        """z (NHWC latent) -> (x_recon, dec_taps, h_pre)
        (reference: models/vqgan_fcm.py:120-122)."""
        return self.decoder(z, train=train, inference=inference)

    def discriminate(self, x, *, train: bool = False, data_init: bool = False):
        if data_init:
            # first-batch ActNorm data-dependent init (PatchGAN only;
            # reference: models/discriminator.py:67-86)
            return self.discriminator(x, train=train, data_init=True)
        return self.discriminator(x, train=train)

    def codebook_inputs(self, x):
        """Flattened (projected) latent vectors exactly as the codebook sees
        them — for the eager first-batch k-means init (reference:
        models/l2_quantize.py:352-368 runs init_embed_ on the projected,
        and for cosine l2-normalized, flatten)."""
        z, _ = self.encoder(x, train=False, inference=True)
        b, h, w, c = z.shape
        flat = z.astype(jnp.float32).reshape(b * h * w, c)
        if self.quantizer.project_in is not None:
            flat = self.quantizer.project_in(flat)
        return flat

    def decode_code(self, indices, cb_state: CodebookState):
        """Sampled token grid -> image (reference:
        models/txt_cond_transformer.py:160-168 decode_to_img)."""
        z = self.quantizer.decode_indices(indices, cb_state)
        x, _, _ = self.decoder(z, train=False, inference=True)
        return x

    def blur_taps_pairwise(self, enc_feats, dec_feats):
        """Model-level blur for pairwise DSL (reference:
        models/vqgan_fcm.py:131-134): enc tap i with sigma i, dec tap j with
        sigma j (shared 4 sigmas)."""
        assert self.cfg.dsl_mode == DSL_PAIR
        enc = [gaussian_blur_nhwc(f, self.gaussian_kernel, self.sigmas[i])
               for i, f in enumerate(enc_feats)]
        dec = [gaussian_blur_nhwc(f, self.gaussian_kernel, self.sigmas[j])
               for j, f in enumerate(dec_feats)]
        return enc, dec

    def generate(self, x, cb_state: CodebookState, *, train: bool = False,
                 inference: bool = False, rng: Optional[jax.Array] = None):
        """Generator-only stage-0 body: encode -> quantize -> decode (+
        pairwise tap blur), WITHOUT the discriminator. The train step calls
        the discriminator separately so it can split the loss-head vjps at
        x_recon (see favae_tpu.train.favae_step)."""
        z_q, loss_q, indices, enc_feats, new_state = self.encode(
            x, cb_state, train=train, inference=inference, rng=rng)
        x_recon, dec_feats, h_pre = self.decode(
            z_q, train=train, inference=inference)
        if self.cfg.dsl_mode == DSL_PAIR and train and not inference:
            enc_feats, dec_feats = self.blur_taps_pairwise(enc_feats, dec_feats)
        return dict(x_recon=x_recon, loss_q=loss_q, indices=indices,
                    enc_feats=enc_feats, dec_feats=dec_feats, h_pre=h_pre,
                    cb_state=new_state)

    def __call__(self, x, cb_state: CodebookState, *, train: bool = False,
                 inference: bool = False, rng: Optional[jax.Array] = None):
        """Stage-0-style forward used for init/eval: full reconstruction pass
        (reference: models/vqgan_fcm.py:124-136, without the D(real) branch)."""
        outs = self.generate(x, cb_state, train=train, inference=inference,
                             rng=rng)
        outs["logits_fake"] = self.discriminate(outs["x_recon"], train=train)
        return outs
