"""Masked batch normalization over padded node batches.

torch BatchNorm1d semantics (running stats, eps 1e-5, momentum 0.1) computed
over *real* nodes only, so padding never pollutes statistics. Used by the GPS
molecule model's positional-encoding norm (reference molecule_gnn.py:473) and
JointGNN's optional out_lin_norm_type='batch' (joint_gnn.py:304-306).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        """x: [..., features]; mask: broadcastable to x.shape[:-1] (True=real).

        In training (use_running_average=False) batch stats are computed over
        masked elements and running stats updated (mutable 'batch_stats').
        """
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            flat = x.reshape(-1, self.features)
            if mask is not None:
                m = jnp.broadcast_to(mask[..., None], x.shape).reshape(-1, self.features)
                cnt = jnp.maximum(m[:, 0].sum(), 1.0)
                mean = (flat * m).sum(0) / cnt
                var = ((flat - mean) ** 2 * m).sum(0) / cnt
                n = cnt
            else:
                mean = flat.mean(0)
                var = flat.var(0)
                n = flat.shape[0]
            if not self.is_initializing():
                # torch updates running_var with the unbiased estimate
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
