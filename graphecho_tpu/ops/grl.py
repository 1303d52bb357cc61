"""Gradient reversal as a jax.custom_vjp.

Forward identity; backward multiplies the cotangent by -lambda.
TPU-native equivalent of the reference autograd Function
(`/root/reference/models/gradient_reversal.py:6-33`).
"""

from functools import partial

import jax


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, lambda_: float = 1.0):
    return x


def _grl_fwd(x, lambda_):
    return x, None


def _grl_bwd(lambda_, _res, g):
    return (jax.tree_util.tree_map(lambda t: -lambda_ * t, g),)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)
