#!/usr/bin/env python
"""Run the ACTUAL TF2 reference end-to-end at given hyperparameters and
report train/valid/test PLL — the ground truth for the reproduction-gap
investigation (VERDICT round 1, weak #1).

The reference's recorded bests (data/trw/SUMMARY.txt) were produced years
ago on unrecorded GPU hardware with a TF ~2.1 stack. If TODAY's reference
code under TF 2.21-CPU cannot reproduce its own recorded numbers either,
the gap between our rebuild and the records is a record-staleness issue,
not a rebuild-dynamics issue. This script produces that evidence.

Drives the reference classes unmodified (read-only mount), exactly like
/root/reference/run.py:46-72 (same data pipeline, Adam, mse loss, fit,
cpt from train, PLL on all three splits). EMA is always on (the recorded
grids use --ema, batch-job.sh:4-41).

Usage:
  python scripts/reproduce_reference_tf.py -n netflix -k 50 -d 10 -b 128 \
      -e 100 -r 0.01 -s 1
Prints one JSON line per run.
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--name', required=True)
    ap.add_argument('-k', '--embedding', type=int, required=True)
    ap.add_argument('-d', '--dim', type=int, required=True)
    ap.add_argument('-b', '--batch', type=int, default=128)
    ap.add_argument('-e', '--epochs', type=int, default=200)
    ap.add_argument('-r', '--rate', type=float, default=0.001)
    ap.add_argument('-c', '--cost', type=float, default=0.25)
    ap.add_argument('-g', '--decay', type=float, default=0.99)
    ap.add_argument('-s', '--seed', type=int, default=0)
    ap.add_argument('--ref', default='/root/reference')
    args = ap.parse_args()

    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    os.environ['CUDA_VISIBLE_DEVICES'] = '-1'
    os.environ['PYTHONHASHSEED'] = '0'         # ref run.py:34
    sys.path.insert(0, args.ref)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import random as rdn
    import numpy as np
    import tensorflow as tf
    import _tf_ref_compat
    _tf_ref_compat.install()
    from tensorflow.python.keras.optimizer_v2 import adam
    from core.model import VqVAE                 # reference, unmodified
    from baseline import baseline as bl

    rdn.seed(args.seed)                          # ref run.py:35-37
    np.random.seed(args.seed)
    tf.random.set_seed(args.seed)

    n_var = bl[args.name]['vars']
    idx = tf.constant([i for i in range(n_var ** 2)
                       if i % (n_var + 1) != 0])  # ref run.py:46

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

    t_start = time.time()
    train_x, train_y = get_data('train')
    model = VqVAE(units=bl[args.name]['units'], nvar=n_var, dim=args.dim,
                  k=args.embedding, cost=args.cost, decay=args.decay,
                  ema=True)
    model.compile(optimizer=adam.Adam(learning_rate=args.rate), loss='mse',
                  metrics=['mae'])
    hist = model.fit(train_x, train_x, batch_size=args.batch,
                     epochs=args.epochs, verbose=0)
    train_wall = time.time() - t_start

    model.dist = model.cpt(train_x, train_y)
    pll_train = float(model.pseudo_log_likelihood(train_x, train_y))
    pll_valid = float(model.pseudo_log_likelihood(*get_data('valid')))
    pll_test = float(model.pseudo_log_likelihood(*get_data('test')))

    print(json.dumps({
        'what': 'TF2 reference rerun (TF 2.21 CPU)',
        'dataset': args.name, 'K': args.embedding, 'D': args.dim,
        'batch': args.batch, 'epochs': args.epochs, 'lr': args.rate,
        'cost': args.cost, 'decay': args.decay, 'seed': args.seed,
        'pll_train': round(pll_train, 5), 'pll_valid': round(pll_valid, 5),
        'pll_test': round(pll_test, 5),
        'final_fit_loss': round(float(hist.history['loss'][-1]), 6),
        'train_wall_s': round(train_wall, 1), 'tf': tf.__version__,
    }), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
