#!/usr/bin/env python
"""Measure the TF2 reference's stage-1 throughput + stage-2 wall, for real.

Round-1's bench.py divided by an ASSUMED 40k samples/sec "Keras dispatch
proxy"; this script replaces the guess with a measurement. It drives the
reference's OWN classes (`/root/reference/core/model.py` VqVAE, unmodified,
imported from the read-only mount) through the same steps as the reference
CLI (`/root/reference/run.py:46-72`): CSV load, leave-one-out gather,
compile(Adam, mse), fit, cpt, pseudo_log_likelihood. The only departures are
(a) the optimizer object comes from `tensorflow.python.keras.optimizer_v2`
because the reference's model subclasses the internal legacy Keras Model and
TF 2.21's public `tf.keras` optimizers are no longer accepted by it, and
(b) a one-epoch warmup is excluded from timing so the number is steady-state
(tracing excluded), which is the GENEROUS reading for the baseline.

This host has no GPU, so the measurement is TF2-CPU (oneDNN). BASELINE.md
documents how the TF2-GPU bound is derived from it; bench.py embeds the
resulting denominator.

Usage:  python scripts/bench_reference_tf.py -n nltcs --epochs 5
Prints one JSON line with samples/sec and stage-2 wall.
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--name', default='nltcs')
    ap.add_argument('-k', '--embedding', type=int, default=50)
    ap.add_argument('-d', '--dim', type=int, default=10)
    ap.add_argument('-b', '--batch', type=int, default=128)
    ap.add_argument('--epochs', type=int, default=5)
    ap.add_argument('-r', '--rate', type=float, default=0.01)
    ap.add_argument('-s', '--seed', type=int, default=1)
    ap.add_argument('--ref', default='/root/reference')
    args = ap.parse_args()

    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    os.environ['CUDA_VISIBLE_DEVICES'] = '-1'
    sys.path.insert(0, args.ref)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    import tensorflow as tf
    import _tf_ref_compat                        # TF 2.21 shims (see module)
    _tf_ref_compat.install()
    from tensorflow.python.keras.optimizer_v2 import adam
    from core.model import VqVAE                 # reference class, unmodified
    from baseline import baseline as bl

    tf.random.set_seed(args.seed)
    np.random.seed(args.seed)
    n_var = bl[args.name]['vars']

    # data pipeline exactly as reference run.py:46-56
    idx = tf.constant([i for i in range(n_var ** 2) if i % (n_var + 1) != 0])

    @tf.function
    def make_xs(ys):
        return tf.map_fn(
            lambda x: tf.reshape(tf.gather(tf.tile(x, [n_var]), idx),
                                 [n_var, -1]), ys, back_prop=0)

    def get_data(tvt):
        path = os.path.join(args.ref, 'data', 'trw',
                            f'{args.name}.{tvt}.data')
        ds = tf.data.experimental.CsvDataset(path, [0.] * n_var).map(
            lambda *x: tf.stack(x))
        ys = tf.stack([y for y in ds])
        return make_xs(ys), ys

    train_x, train_y = get_data('train')
    model = VqVAE(units=bl[args.name]['units'], nvar=n_var, dim=args.dim,
                  k=args.embedding, cost=0.25, decay=0.99, ema=True)
    model.compile(optimizer=adam.Adam(learning_rate=args.rate), loss='mse',
                  metrics=['mae'])

    model.fit(train_x, train_x, batch_size=args.batch, epochs=1, verbose=0)
    t0 = time.time()
    model.fit(train_x, train_x, batch_size=args.batch, epochs=args.epochs,
              verbose=0)
    train_wall = time.time() - t0
    n = int(train_y.shape[0])
    sps = args.epochs * n / train_wall

    t1 = time.time()
    model.dist = model.cpt(train_x, train_y)
    test_x, test_y = get_data('test')
    pll_test = float(model.pseudo_log_likelihood(test_x, test_y))
    stage2_wall = time.time() - t1

    print(json.dumps({
        'what': 'TF2 reference measured on this host (CPU, oneDNN)',
        'dataset': args.name, 'K': args.embedding, 'D': args.dim,
        'batch': args.batch, 'epochs_timed': args.epochs,
        'train_wall_s': round(train_wall, 3),
        'samples_per_sec': round(sps, 1),
        'ms_per_step': round(1000 * train_wall /
                             (args.epochs * -(-n // args.batch)), 3),
        'stage2_wall_s': round(stage2_wall, 3),
        'pll_test': round(pll_test, 5),
        'tf': tf.__version__,
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
