#!/usr/bin/env python
"""CMLL Gibbs-sampler benchmark, mirroring the reference's only executable
perf harness (reference `core/model.py:151-170`): a synthetic 150-variable /
5000-sample dataset, 2 quick training epochs, random CPT, then one timed
conditional_marginal_log_likelihood call with p1=n//12, num_smp=1000,
burn_in=100.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--vars', type=int, default=150)
    ap.add_argument('--samples', type=int, default=5000)
    ap.add_argument('--k', type=int, default=15)
    ap.add_argument('--dim', type=int, default=20)
    ap.add_argument('--num-smp', type=int, default=1000)
    ap.add_argument('--burn-in', type=int, default=100)
    args = ap.parse_args()

    import jax

    from pgmvae_tpu.gibbs import conditional_marginal_log_likelihood
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.train import Trainer

    n, k, d = args.vars, args.k, args.dim
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, size=(args.samples, n)).astype(np.float32)

    # reference uses units=[70,50,30] (which its own model can't even build —
    # it hardcodes 4 widths); we honor the 3-layer spec directly
    cfg = VqVaeConfig(n_var=n, units=(70, 50, 30), dim=d, num_codes=k,
                      cost=0.25, decay=0.99, quantizer='ema')
    tr = Trainer(cfg, 0.001, 256, len(data))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, data, 2, jax.random.PRNGKey(0))

    dist = rng.uniform(size=(n, k))
    dist = dist / dist.sum(axis=1, keepdims=True)

    p1 = n // 12
    # compile pass (excluded, as timeit's first call was the reference's
    # compile too — but we report both for honesty)
    t0 = time.time()
    cmll = conditional_marginal_log_likelihood(
        st.params, tr.codebook(st), cfg, dist, data, p1=p1,
        num_smp=args.num_smp, burn_in=args.burn_in, key=jax.random.PRNGKey(1))
    t_first = time.time() - t0
    t0 = time.time()
    cmll = conditional_marginal_log_likelihood(
        st.params, tr.codebook(st), cfg, dist, data, p1=p1,
        num_smp=args.num_smp, burn_in=args.burn_in, key=jax.random.PRNGKey(2))
    t_steady = time.time() - t0
    steps = args.num_smp * p1
    print(f'cmll={cmll:.5f}  first-call {t_first:.2f}s (incl compile), '
          f'steady {t_steady:.2f}s = {t_steady / steps * 1e6:.0f} us/step '
          f'({steps} sequential Gibbs steps, batch {args.samples}, '
          f'{-(-n // p1)} blocks)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
