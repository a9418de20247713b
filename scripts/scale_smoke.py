#!/usr/bin/env python
"""Scale smoke test: train a synthetic dataset at the size of the largest
TRW benchmark ('ad': n_var=1556, whose real data is stripped from this
mount) to prove the memory/throughput path at full scale on one chip —
the leave-one-out gather happens on device per batch, so no [N, n, n-1]
tensor ever exists (the reference materializes it; its run.py:53 TODO).

Optionally shards the variable axis (--mesh-model) to show the n_var
model-parallel path.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--vars', type=int, default=1556)
    ap.add_argument('--samples', type=int, default=2461)  # ad's train size
    ap.add_argument('--dim', type=int, default=30)
    ap.add_argument('--k', type=int, default=20)
    ap.add_argument('--batch', type=int, default=100)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--mesh-model', type=int, default=1)
    args = ap.parse_args()

    import jax

    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.parallel import MeshContext, make_mesh
    from pgmvae_tpu.registry import default_units
    from pgmvae_tpu.train import Trainer

    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, size=(args.samples, args.vars)).astype(np.float32)

    cfg = VqVaeConfig(n_var=args.vars, units=default_units(args.vars, args.dim),
                      dim=args.dim, num_codes=args.k, quantizer='ema')
    n_params = sum(np.prod(s) for s in [
        (args.vars, i, o) for i, o in zip(
            (args.vars - 1,) + cfg.units, cfg.units + (args.dim,))] +
        [(args.vars, i, o) for i, o in zip(
            (args.dim,) + tuple(reversed(cfg.units)),
            tuple(reversed(cfg.units)) + (args.vars - 1,))])
    print(f'n_var={args.vars} units={cfg.units} '
          f'~{n_params * 4 / 1e9:.2f} GB params (f32), '
          f'Adam state ~{n_params * 12 / 1e9:.2f} GB', flush=True)

    ctx = MeshContext(make_mesh(1, args.mesh_model)) \
        if args.mesh_model > 1 else None
    tr = Trainer(cfg, 0.001, args.batch, len(data), mesh_ctx=ctx)
    st = tr.init_state(jax.random.PRNGKey(0))

    t0 = time.time()
    st, m = tr.run_epoch(st, tr.mesh.put(jax.numpy.asarray(data),
                                         jax.sharding.PartitionSpec()),
                         jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    print(f'epoch 1 (compile): {time.time() - t0:.1f}s '
          f'loss={float(m.loss):.5f}', flush=True)
    t0 = time.time()
    for e in range(args.epochs - 1):
        st, m = tr.run_epoch(st, tr.mesh.put(jax.numpy.asarray(data),
                                             jax.sharding.PartitionSpec()),
                             jax.random.fold_in(jax.random.PRNGKey(1), e))
    jax.block_until_ready(m)
    dt = (time.time() - t0) / max(args.epochs - 1, 1)
    print(f'steady epoch: {dt:.2f}s = '
          f'{len(data) / dt:,.0f} samples/sec  loss={float(m.loss):.5f}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
