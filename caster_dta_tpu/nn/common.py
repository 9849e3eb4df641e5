"""Shared NN helpers: activation registry, torch-compatible initializers.

Mirrors reference models/model_utils.py:5-34 (_select_activation) with the
same string names and the same numerics (LeakyReLU slope 0.01, exact GELU).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTS: dict[str, Optional[Callable]] = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "none": None,
    None: None,
}


def select_activation(name) -> Optional[Callable]:
    """String -> activation fn (None means identity), reference model_utils.py:5."""
    if callable(name):
        return name
    key = name.lower() if isinstance(name, str) else name
    if key not in _ACTS:
        raise ValueError(f"Activation function {name!r} not recognized")
    return _ACTS[key]


def apply_act(act: Optional[Callable], x: jnp.ndarray) -> jnp.ndarray:
    return x if act is None else act(x)


# Process-wide mixed-precision policy (the TPU equivalent of the reference's
# AMP autocast, train_model.py:478): when set to e.g. jnp.bfloat16, every
# Dense without an explicit ``dtype`` computes its matmul in that dtype while
# parameters stay float32. Read at TRACE time — it is baked into each jitted
# executable when the function is first traced, so set it before the first
# call of a train/eval step (Trainer does this from TrainConfig.compute_dtype)
# and do not flip it expecting already-compiled steps to change.
_COMPUTE_DTYPE = None


def set_compute_dtype(dtype) -> None:
    """Set the global matmul compute dtype (None = follow input dtype)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if dtype is not None else None


def get_compute_dtype():
    return _COMPUTE_DTYPE


class Dense(nn.Module):
    """nn.Dense with torch.nn.Linear-style default initialization.

    torch kernel init: kaiming_uniform(a=sqrt(5)) over weight [out, in]
    => U(-sqrt(1/fan_in), sqrt(1/fan_in)) elementwise (gain cancels to 1/sqrt(fan_in)*sqrt(3)/sqrt(3)).
    Exactly: bound = sqrt(6 / ((1 + a^2) * fan_in)) with a=sqrt(5) => sqrt(1/fan_in).
    Bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """

    features: int
    use_bias: bool = True
    dtype: object = None
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = (1.0 / max(fan_in, 1)) ** 0.5

        def kinit(key, shape, dtype=self.param_dtype):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kinit, (fan_in, self.features))
        dt = self.dtype or _COMPUTE_DTYPE or x.dtype
        y = jnp.dot(x.astype(dt), kernel.astype(dt))
        if self.use_bias:
            bias = self.param("bias", kinit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class MLP(nn.Module):
    """PyG-style MLP([d0, d1, ..., dk]) with act between layers, plain last.

    Mirrors torch_geometric.nn.MLP with norm=None, plain_last=True as used by
    the reference's GINE/GIN convs (molecule_gnn.py:271-280).
    """

    channels: tuple
    act: str = "relu"
    act_first: bool = False  # kept for API parity; norm=None makes it moot
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        act = select_activation(self.act)
        n = len(self.channels) - 1
        for i in range(n):
            x = Dense(self.channels[i + 1], dtype=self.dtype, name=f"lin{i}")(x)
            if i < n - 1:
                x = apply_act(act, x)
        return x
