"""Scalar GAN losses (reference: losses/hinge.py, models/discriminator.py:23-41)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_g_loss(logits_fake):
    """Generator hinge loss: -mean(D(fake)) (reference: losses/hinge.py:5-16)."""
    return -jnp.mean(logits_fake.astype(jnp.float32))


def hinge_d_loss(logits_real, logits_fake):
    """Discriminator hinge loss (reference: losses/hinge.py:19-34)."""
    lr = jnp.mean(jax.nn.relu(1.0 - logits_real.astype(jnp.float32)))
    lf = jnp.mean(jax.nn.relu(1.0 + logits_fake.astype(jnp.float32)))
    return 0.5 * (lr + lf)


def vanilla_d_loss(logits_real, logits_fake):
    """Non-saturating BCE D loss (reference: models/discriminator.py:30-34)."""
    lf = jnp.mean(jax.nn.softplus(logits_fake.astype(jnp.float32)))
    lr = jnp.mean(jax.nn.softplus(-logits_real.astype(jnp.float32)))
    return 0.5 * (lr + lf)


def least_square_d_loss(logits_real, logits_fake):
    """LSGAN D loss (reference: models/discriminator.py:37-41)."""
    lf = jnp.mean((1.0 + logits_fake.astype(jnp.float32)) ** 2)
    lr = jnp.mean((1.0 - logits_real.astype(jnp.float32)) ** 2)
    return 0.5 * (lr + lf)
