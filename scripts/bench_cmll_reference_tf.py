#!/usr/bin/env python
"""Run the reference's OWN CMLL timing harness (reference
`core/model.py:151-170`) against TF 2.21 on this host, for the wall-clock
comparison VERDICT r1 #7 asks for.

The harness as shipped CRASHES twice: (1) it builds
`VqVAE(units=[70, 50, 30], ...)` but the constructor indexes `units[3]`
(`core/model.py:19-24`) -> IndexError; (2) it passes `nvar=num_vars - 1`
(`core/model.py:161`), so the decoder's final width is `nvar-1 = 148`
against 149-wide leave-one-out views -> shape error in the MSE (the same
`nvar` inconsistency as `run_pipeline.py:34`; the canonical `run.py:59`
passes `nvar=n_var`). We reproduce it faithfully except the two minimal
fixes `units=[70, 50, 30, 20]` and `nvar=num_vars`, same n=150 / K=15 / D=20 / 5000 samples / 2 training epochs /
random CPT / p1=n//12, num_smp=1000, burn_in=100, timeit number=1.

Prints one JSON line with the timed seconds.
"""

import json
import os
import sys
import time


def main() -> int:
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    os.environ['CUDA_VISIBLE_DEVICES'] = '-1'
    sys.path.insert(0, '/root/reference')
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import tensorflow as tf
    import _tf_ref_compat
    _tf_ref_compat.install()
    from tensorflow.python.keras.optimizer_v2 import adam
    from core.model import VqVAE                 # reference, unmodified

    tf.random.set_seed(0)
    num_vars, K, D, n_test = 150, 15, 20, 5000
    data = tf.cast(tf.random.uniform([n_test, num_vars], minval=0, maxval=2,
                                     dtype=tf.int32), tf.float32)
    train_x = tf.stack([tf.reshape(tf.tile(x, [num_vars - 1]),
                                   [num_vars, -1]) for x in data])
    model = VqVAE(units=[70, 50, 30, 20], nvar=num_vars, dim=D, k=K,
                  cost=0.25, decay=0.99, ema=True)
    model.compile(optimizer=adam.Adam(learning_rate=0.001), loss='mse',
                  metrics=['mae'])
    t0 = time.time()
    model.fit(train_x, train_x, batch_size=256, epochs=2, verbose=0)
    fit_wall = time.time() - t0
    rnd = tf.random.uniform([num_vars, K], minval=0, maxval=1,
                            dtype=tf.float64)
    model.dist = rnd / tf.reduce_sum(rnd, 1, keepdims=True)

    t0 = time.time()
    cmll = float(model.conditional_marginal_log_likelihood(
        data, p1=num_vars // 12, num_smp=1000, burn_in=100))
    cmll_wall = time.time() - t0
    print(json.dumps({
        'what': 'reference CMLL harness (core/model.py:151-170), TF 2.21 '
                'CPU, two shipped crashes fixed (units [70,50,30,20]; '
                'nvar=num_vars)',
        'n_vars': num_vars, 'K': K, 'D': D, 'n_test': n_test,
        'p1': num_vars // 12, 'num_smp': 1000, 'burn_in': 100,
        'cmll': round(cmll, 5), 'cmll_wall_s': round(cmll_wall, 1),
        'fit_wall_s': round(fit_wall, 1), 'tf': tf.__version__,
    }), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
