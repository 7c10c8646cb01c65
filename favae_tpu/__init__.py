"""favae_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of FA-VAE.

Re-design of oppo-us-research/FA-VAE (CVPR 2023, "Catch Missing Details: Image
Reconstruction with Frequency Augmented Variational Autoencoder") for TPU:

* VQGAN with Frequency Complement Modules (FCM) and Spectrum / Dynamic Spectrum
  losses (`favae_tpu.models.vqgan`, reference: models/vqgan_fcm.py, models/codec.py).
* Cosine / Euclidean EMA vector quantizer (`favae_tpu.models.quantizer`,
  reference: models/l2_quantize.py).
* CAT: text-conditional cross-attention autoregressive transformer over VQ tokens
  (`favae_tpu.models.gpt`, reference: models/gpt_ca.py, models/txt_cond_transformer.py).

Everything is NHWC, functional (explicit state, explicit RNG), and designed to run
inside a single `jax.jit` per train step, data-parallel over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
