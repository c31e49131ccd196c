"""Gaussian output-head utilities: sampling, NLL, KL.

Mirrors reference src/utils.py:33-54, src/loss.py:6-37 and
src/models/modules.py:88-111 with explicit PRNG keys (JAX purity
replaces torch's global RNG).
Convention: a "distribution tensor" stacks (mean, log_std) on a channel
axis of size 2.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sample_from_gaussian(key: jax.Array, y_hat: jax.Array) -> jax.Array:
    """y_hat: (..., 2) with [..., 0] = mean, [..., 1] = log_std."""
    mean = y_hat[..., 0]
    log_std = y_hat[..., 1]
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.exp(log_std) * eps


def gaussian_nll(y_hat: jax.Array, y: jax.Array,
                 log_std_min: float = -9.0) -> jax.Array:
    """Mean negative log-likelihood.

    y_hat: (..., 2) (mean, log_std); y: (...,) targets.  Equivalent to
    reference src/loss.py:6-21 (which flips sign twice and returns the
    positive NLL mean).
    """
    mean = y_hat[..., 0]
    log_std = jnp.clip(y_hat[..., 1], min=log_std_min)
    log_probs = -0.5 * (
        math.log(2.0 * math.pi)
        + 2.0 * log_std
        + jnp.square(y - mean) * jnp.exp(-2.0 * log_std)
    )
    return -jnp.mean(log_probs)


def kl_gaussians(mu_q, logs_q, mu_p, logs_p, log_std_min: float = -6.0,
                 regularization: bool = True):
    """KL(q || p) between diagonal Gaussians + log-std regulariser
    (reference src/loss.py:25-37)."""
    logs_q_c = jnp.clip(logs_q, min=log_std_min)
    logs_p_c = jnp.clip(logs_p, min=log_std_min)
    kl = (logs_p_c - logs_q_c) + 0.5 * (
        (jnp.exp(2.0 * logs_q_c) + jnp.square(mu_p - mu_q))
        * jnp.exp(-2.0 * logs_p_c) - 1.0)
    reg = jnp.square(logs_q - logs_p) if regularization else None
    return kl, reg


def kl_loss(mu_q, logs_q, mu_p, logs_p, regularization: bool = True):
    kl, reg = kl_gaussians(mu_q, logs_q, mu_p, logs_p,
                           regularization=regularization)
    total = kl + (reg * 4.0 if reg is not None else 0.0)
    return jnp.mean(total), jnp.mean(kl), jnp.mean(reg) if reg is not None else 0.0
