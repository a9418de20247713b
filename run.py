#!/usr/bin/env python
"""Canonical end-to-end CLI: stage-1 VQ-VAE training + stage-2 PLL on the
TRW benchmark suite.

Flag-for-flag compatible with the reference driver (reference `run.py:10-24`):
  --name/-n --embedding/-k --dim/-d --batch/-b --epoch/-e --rate/-r
  --cost/-c --ema/-m --decay/-g --seed/-s --device/-u --verbose/-v --note/-t
with the same defaults, the same run-identifier format and the same
`result.txt` append contract (reference `run.py:38,77-80`).

TPU-native differences:
  --device selects a *platform* (-1 = CPU as in the reference; otherwise the
  default accelerator), and new flags expose the mesh (--mesh-data /
  --mesh-model for data/variable-axis sharding over ICI), quantizer variants,
  precision, CMLL evaluation (implemented but disabled by default, mirroring
  reference `run.py:73-77`), checkpointing and profiling.

Deliberate fixes vs the reference: datasets without tuned encoder widths fall
back to the default-units rule instead of KeyError-crashing (reference
`run.py:59`), and PLL values are printed as plain floats.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    # -- reference-compatible flags (reference run.py:11-23) --
    p.add_argument('--name', '-n', required=True, help='target dataset name')
    p.add_argument('--embedding', '-k', type=int, required=True,
                   help='embedding dictionary size')
    p.add_argument('--dim', '-d', type=int, required=True,
                   help='embedding dimension')
    p.add_argument('--batch', '-b', type=int, default=128,
                   help='training batch size')
    p.add_argument('--epoch', '-e', type=int, default=200,
                   help='number of epochs for training')
    p.add_argument('--rate', '-r', type=float, default=0.001,
                   help='learning rate')
    p.add_argument('--cost', '-c', type=float, default=0.25,
                   help='commitment cost')
    p.add_argument('--ema', '-m', action='store_true',
                   help='using exponential moving average')
    p.add_argument('--decay', '-g', type=float, default=0.99,
                   help='EMA decay rate')
    p.add_argument('--seed', '-s', type=int, default=0,
                   help='integer for random seed')
    p.add_argument('--device', '-u', type=int, default=0,
                   help='-1 = CPU; otherwise use the default accelerator')
    p.add_argument('--verbose', '-v', action='store_true',
                   help='verbose mode when do model fitting and sampling')
    p.add_argument('--note', '-t', type=str, default='',
                   help='note for other conditions')
    # -- TPU-native extensions --
    p.add_argument('--quantizer', choices=['ema', 'vq', 'naive'], default=None,
                   help="override quantizer (default: 'ema' if --ema else 'vq')")
    p.add_argument('--units', type=str, default=None,
                   help='comma-separated encoder widths (default: registry '
                        'or heuristic)')
    p.add_argument('--mesh-data', type=int, default=1,
                   help='data-parallel mesh axis size')
    p.add_argument('--mesh-model', type=int, default=1,
                   help='variable-axis model-parallel mesh size')
    p.add_argument('--no-zero-debias', action='store_true',
                   help='plain moving average instead of the TF zero-debiased '
                        'default')
    p.add_argument('--cmll', action='store_true',
                   help='also evaluate CMLL via Gibbs sampling '
                        '(num_smp=3000, burn_in=150, p1=n_var//10, as in '
                        'reference run.py:74)')
    p.add_argument('--checkpoint', type=str, default=None,
                   help='path to write a checkpoint (params+EMA+CPT)')
    p.add_argument('--resume', type=str, default=None,
                   help='checkpoint to resume stage-1 training from')
    p.add_argument('--profile', action='store_true',
                   help='capture a jax.profiler trace of one epoch')
    p.add_argument('--data-dir', type=str, default=None,
                   help='override TRW data directory')
    p.add_argument('--result-file', type=str, default='result.txt')
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    os.environ['PYTHONHASHSEED'] = '0'            # ref run.py:34
    random.seed(args.seed)

    import jax
    if args.device == -1:                          # ref run.py:27-28
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    np.random.seed(args.seed)

    from pgmvae_tpu import REGISTRY
    from pgmvae_tpu import checkpoint as ckpt
    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.gibbs import conditional_marginal_log_likelihood
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.parallel import MeshContext, make_mesh
    from pgmvae_tpu.stage2 import Stage2
    from pgmvae_tpu.train import Trainer
    from pgmvae_tpu.utils import MetricLogger, append_result
    from pgmvae_tpu.utils.logging import run_identifier

    if args.name not in REGISTRY:
        print(f"error: unknown dataset '{args.name}'. Available: "
              f"{', '.join(sorted(REGISTRY))}", file=sys.stderr)
        return 2
    info = REGISTRY[args.name]
    quantizer = args.quantizer or ('ema' if args.ema else 'vq')
    units = (tuple(int(u) for u in args.units.split(','))
             if args.units else info.encoder_units(args.dim))

    identifier = run_identifier(args.name, args.embedding, args.dim,
                                args.batch, args.epoch, args.rate, args.cost,
                                args.ema, args.decay, args.seed, args.note)
    log_dir = os.path.join(os.curdir, 'logs', 'tuning', identifier)
    logger = MetricLogger(log_dir)

    cfg = VqVaeConfig(n_var=info.n_var, units=units, dim=args.dim,
                      num_codes=args.embedding, cost=args.cost,
                      decay=args.decay, quantizer=quantizer,
                      zero_debias=not args.no_zero_debias)

    mesh_ctx = MeshContext(None)
    if args.mesh_data * args.mesh_model > 1:
        mesh_ctx = MeshContext(make_mesh(args.mesh_data, args.mesh_model))

    y_train = load_split(args.name, 'train', args.data_dir)
    trainer = Trainer(cfg, args.rate, args.batch, len(y_train),
                      mesh_ctx=mesh_ctx)
    key = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(key)
    if args.resume:
        _, state, _, _ = ckpt.load(args.resume, state_template=state)
        state = trainer.shard_state(state)
        print(f'resumed from {args.resume}', file=sys.stderr)

    if args.profile:
        jax.profiler.start_trace(log_dir)

    t0 = time.time()
    state, _ = trainer.fit(state, y_train, args.epoch, key,
                           verbose=args.verbose, log_fn=logger.log_epoch)
    jax.block_until_ready(state.params)
    train_wall = time.time() - t0

    if args.profile:
        jax.profiler.stop_trace()

    # stage 2 (ref run.py:66-72): CPT from train, PLL on all three splits
    codebook = trainer.codebook(state)
    s2 = Stage2(cfg, mesh_ctx=mesh_ctx)
    t1 = time.time()
    dist = s2.cpt(state.params, codebook, y_train)
    pll = {}
    for split, y in (('train', y_train),
                     ('valid', load_split(args.name, 'valid', args.data_dir)),
                     ('test', load_split(args.name, 'test', args.data_dir))):
        pll[split] = s2.pseudo_log_likelihood(state.params, codebook, y, dist)
    eval_wall = time.time() - t1

    cmll_test = 1  # reference hardcodes this when CMLL is off (run.py:77)
    if args.cmll:
        y_test = load_split(args.name, 'test', args.data_dir)
        cmll_test = conditional_marginal_log_likelihood(
            state.params, codebook, cfg, dist, y_test,
            p1=max(info.n_var // 10, 1), num_smp=3000, burn_in=150,
            key=jax.random.PRNGKey(args.seed))

    if args.checkpoint:
        ckpt.save(args.checkpoint, cfg, state, dist,
                  extra={'identifier': identifier, 'pll': pll})

    logger.log_final(identifier=identifier, train_wall=round(train_wall, 3),
                     eval_wall=round(eval_wall, 3), **pll)
    logger.close()
    line = append_result(identifier, pll['train'], pll['valid'], pll['test'],
                         cmll_test, path=args.result_file)
    print(line)
    return 0


if __name__ == '__main__':
    sys.exit(main())
