"""Weight initializers with the reference's *stacked* fan semantics.

The reference stacks all `n_var` networks' kernels into one rank-3 weight
`[n_var, fan_in, fan_out]` (reference `core/dense.py:78-85`) and hands that
shape to Keras `VarianceScaling`. Keras computes fans for rank>2 shapes as
`receptive_field = prod(shape[:-2])`, `fan_in = shape[-2] * receptive_field`
— i.e. the *stacked* kernel's effective fan_in is `n_var * fan_in`, giving
initial scales `sqrt(3*scale / (n_var*fan_in))` rather than the per-network
`sqrt(3*scale / fan_in)`. This materially changes training dynamics, so we
reproduce it by default (`fan_mode='tf_stacked'`) and offer the per-network
convention (`fan_mode='per_network'`) as an explicit alternative.

Same applies to the codebook init: `VarianceScaling(distribution='uniform')`
over `[n_var, D, K]` (reference `core/quantizer.py:35-37, 111-113`) has
fan_in = n_var * D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape, fan_mode: str):
    shape = tuple(int(s) for s in shape)
    if fan_mode == 'tf_stacked':
        # Keras VarianceScaling fan computation on the full stacked shape.
        if len(shape) < 1:
            return 1.0, 1.0
        if len(shape) == 1:
            return float(shape[0]), float(shape[0])
        if len(shape) == 2:
            return float(shape[0]), float(shape[1])
        receptive = float(np.prod(shape[:-2]))
        return shape[-2] * receptive, shape[-1] * receptive
    elif fan_mode == 'per_network':
        # Leading axes are stacking axes, not receptive field.
        return float(shape[-2]), float(shape[-1])
    raise ValueError(f'unknown fan_mode: {fan_mode}')


def variance_scaling_uniform(key, shape, scale=1.0, mode='fan_in',
                             fan_mode='tf_stacked', dtype=jnp.float32):
    fan_in, fan_out = _fans(shape, fan_mode)
    if mode == 'fan_in':
        denom = max(1.0, fan_in)
    elif mode == 'fan_out':
        denom = max(1.0, fan_out)
    elif mode == 'fan_avg':
        denom = max(1.0, (fan_in + fan_out) / 2.0)
    else:
        raise ValueError(f'unknown mode: {mode}')
    limit = float(np.sqrt(3.0 * scale / denom))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def he_uniform(key, shape, fan_mode='tf_stacked', dtype=jnp.float32):
    """Keras 'he_uniform': VarianceScaling(scale=2, fan_in, uniform)."""
    return variance_scaling_uniform(key, shape, scale=2.0, mode='fan_in',
                                    fan_mode=fan_mode, dtype=dtype)


def glorot_uniform(key, shape, fan_mode='tf_stacked', dtype=jnp.float32):
    """Keras 'glorot_uniform': VarianceScaling(scale=1, fan_avg, uniform)."""
    return variance_scaling_uniform(key, shape, scale=1.0, mode='fan_avg',
                                    fan_mode=fan_mode, dtype=dtype)
