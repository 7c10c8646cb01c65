"""Fused GroupNorm(+SiLU) Pallas kernel vs the flax-equivalent XLA path.

The kernels run in interpret mode on CPU; on TPU they are opt-in
(FAVAE_GN_PALLAS=1) because the end-to-end train step is faster with XLA's
own GN fusions (see ops/gn_pallas.py docstring for the profile evidence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from favae_tpu.ops.gn_pallas import (
    _gn_act_reference,
    can_fuse_group_norm,
    group_norm_act,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 128), 32),
                                          ((1, 4, 16, 256), 32)])
def test_forward_matches_reference(act, shape, groups):
    x = _rand(shape)
    c = shape[-1]
    scale, bias = _rand((c,), 1), _rand((c,), 2)
    y_ref = _gn_act_reference(x, scale, bias, groups, 1e-5, act, jnp.float32)
    y_pal = group_norm_act(x, scale, bias, groups, act=act,
                           out_dtype=jnp.float32, use_pallas=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_reference_matches_flax_groupnorm():
    x = _rand((2, 8, 8, 128))
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
    variables = gn.init(jax.random.PRNGKey(0), x)
    y_flax = gn.apply(variables, x)
    y_ref = _gn_act_reference(x, variables["params"]["scale"],
                              variables["params"]["bias"], 32, 1e-5, None,
                              jnp.float32)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_flax),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("act", [None, "silu"])
def test_gradients_match_reference(act):
    x = _rand((2, 8, 8, 128))
    scale, bias = _rand((128,), 1), _rand((128,), 2)

    def loss(fn):
        def f(x, s, b):
            return jnp.sum(jnp.sin(fn(x, s, b)))
        return jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)

    g_ref = loss(lambda x, s, b: _gn_act_reference(
        x, s, b, 32, 1e-5, act, jnp.float32))
    g_pal = loss(lambda x, s, b: group_norm_act(
        x, s, b, 32, act=act, out_dtype=jnp.float32, use_pallas=True,
        interpret=True))
    for a, b_, name in zip(g_ref, g_pal, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_fuse_gate():
    assert can_fuse_group_norm((2, 16, 16, 128), 32)
    assert not can_fuse_group_norm((2, 16, 16, 96), 32)   # lane-unaligned
    assert not can_fuse_group_norm((2, 3, 1, 128), 32)    # chunk too small
    assert not can_fuse_group_norm((2, 16, 16, 128), 48)  # C % G != 0
