"""Compat shims that let the unmodified TF2 reference (written for TF ~2.1,
using the bundled legacy `tensorflow.python.keras`) run under TF 2.21.

Import and call `install()` BEFORE importing `core.model` from the
reference mount. Two shims:

1. `input_lib.DistributedDatasetInterface` was removed; the legacy keras
   data_adapter still isinstance-checks it. A never-matching dummy class
   restores the (always-false) check.
2. `moving_averages.assign_moving_average`'s zero-debias path needs
   `Tensor.op` (graph-only) and crashes under eager. Replace it with a
   faithful reimplementation of the same semantics — biased accumulator +
   local step, unbiased = biased / (1 - decay^step) — the exact math our
   JAX EMA oracle pins in tests/test_quantizer.py.
"""

from __future__ import annotations


def install() -> None:
    import tensorflow as tf
    from tensorflow.python.distribute import input_lib
    if not hasattr(input_lib, 'DistributedDatasetInterface'):
        input_lib.DistributedDatasetInterface = type(
            '_NeverDistributedDataset', (), {})

    from tensorflow.python.training import moving_averages as ma
    _aux = {}

    def _amav(variable, value, decay, zero_debias=True, name=None):
        decay = tf.cast(decay, variable.dtype)
        if not zero_debias:
            return variable.assign_sub((1.0 - decay) * (variable - value))
        key = id(variable)
        if key not in _aux:
            _aux[key] = (tf.Variable(tf.zeros_like(variable),
                                     trainable=False),
                         tf.Variable(tf.zeros([], variable.dtype),
                                     trainable=False))
        biased, step = _aux[key]
        biased.assign_sub((1.0 - decay) * (biased - value))
        step.assign_add(1.0)
        return variable.assign(biased / (1.0 - tf.pow(decay, step)))

    ma.assign_moving_average = _amav
