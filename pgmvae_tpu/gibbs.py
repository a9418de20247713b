"""Conditional-marginal log-likelihood (CMLL) via blockwise Gibbs sampling.

Semantics mirror reference `core/model.py:110-148` (implemented there but
disabled in the canonical driver at `run.py:73-77`):

- the n_var variables are partitioned into `blocks = ceil(n_var/p1)` blocks
  (all of size p1 except possibly the last);
- each block runs an independent Gibbs chain over a replica of the test
  batch; at sweep-step i, block b resamples its variable
  `y_b = b*p1 + (i mod vol_b)` from the model conditional
  p(y=1 | code(x_{-y})) given the chain's current state;
- after `burn_in` sweeps, occurrences of y=1 are counted; CMLL is the
  Bernoulli log-likelihood of the data under the empirical marginals.

TPU-native re-design: the reference's Python-side `tf.map_fn` loops and
in-place `tf.Variable` writes become ONE jitted `lax.fori_loop` with a
functional (state, counts) carry; per-block network selection is one gather
per stacked leaf (the `fts` path), and the per-block leave-one-out view
costs nothing — the padded masked design feeds the whole chain state. The chain
itself is inherently sequential in i — that is the algorithm, not a
limitation. Randomness is JAX counter-based PRNG (fold_in per step), so runs
are reproducible and parallel-safe.

Quirk preserved on purpose: the reference normalizes the last (ragged)
block's counts by `floor(valid * p1 / vol_last)` (reference
`core/model.py:146-147`, including the floor from `//`); we reproduce that
so CMLL values are comparable.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pgmvae_tpu.models import vqvae

LOG_EPS = 1e-5  # reference core/model.py:148


def get_probability(params, codebook, cfg, dist, y, fts):
    """p(y_v = 1 | code_v(y_{-v})) for the selected variables (reference
    `core/model.py:98-108`).

    y: full-width samples — [B, n_var] shared across selections, or
    [n_sel, B, n_var] one state per selection (the Gibbs case). Each selected
    network masks out its own variable internally (padded leave-one-out), so
    callers never build [.., n_var-1] views. fts: [n_sel] variable ids.
    Returns [n_sel, B] probabilities gathered from the CPT `dist`.
    """
    sub_params, sub_codebook = vqvae.gather_variables(params, codebook, fts)
    codes = vqvae.encode_codes(sub_params, sub_codebook, y, cfg,
                               var_ids=fts)                       # [n_sel,B]
    prb = jnp.take(dist, fts, axis=0)                             # [n_sel,K]
    return jnp.take_along_axis(prb, codes, axis=1)


@partial(jax.jit,
         static_argnames=('cfg', 'p1', 'num_smp', 'burn_in', 'verbose'))
def _cmll_impl(params, codebook, cfg: vqvae.VqVaeConfig, dist, x,
               p1: int, num_smp: int, burn_in: int, key,
               verbose: bool = False):
    batch, n = x.shape
    blocks = math.ceil(n / p1)
    vol = np.concatenate([np.full(blocks - 1, p1), [n - p1 * (blocks - 1)]])
    marker = np.arange(blocks) * p1
    vol_j, marker_j = jnp.asarray(vol), jnp.asarray(marker)
    bid = jnp.arange(blocks)
    total = num_smp * p1
    report_every = max(total // 20, 1)

    def step(i, carry):
        state, cnt = carry                       # [blocks,B,n], [B,n]
        if verbose:
            # sampling progress, mirroring the reference's tf.print under
            # `verbose` (reference core/model.py:141-142)
            jax.lax.cond(
                jnp.mod(i, report_every) == 0,
                lambda: jax.debug.print(
                    'cmll sampling step {i}/{t}', i=i, t=total),
                lambda: None)
        y = marker_j + jnp.mod(i, vol_j)         # variable per block
        # padded design: the chain state goes in whole; each block's network
        # masks its own variable internally — no per-block gather
        prb = get_probability(params, codebook, cfg, dist, state, y)
        u = jax.random.uniform(jax.random.fold_in(key, i), (blocks, batch))
        gibbs = (u < prb).astype(state.dtype)
        state = state.at[bid[:, None], jnp.arange(batch)[None, :],
                         y[:, None]].set(gibbs)
        # count post-burn-in occurrences (strict >, ref core/model.py:139)
        flag = (i > burn_in * p1).astype(cnt.dtype)
        cnt = cnt.at[:, y].add(gibbs.T * flag)
        return state, cnt

    state0 = jnp.broadcast_to(x, (blocks, batch, n)).astype(jnp.float32)
    if cfg.n_var > n:                       # padded variable axis: append
        state0 = jnp.concatenate(           # inert zero columns for encode
            [state0, jnp.zeros((blocks, batch, cfg.n_var - n),
                               state0.dtype)], axis=-1)
    cnt0 = jnp.zeros((batch, n), jnp.float32)
    _, cnt = jax.lax.fori_loop(0, num_smp * p1, step, (state0, cnt0))

    valid = float(num_smp - burn_in)
    vol_last = int(vol[-1])
    valid_end = float(int(valid * p1) // vol_last)  # reference's floor-div
    denom = jnp.concatenate([jnp.full((1, n - vol_last), valid),
                             jnp.full((1, vol_last), valid_end)], axis=1)
    m = cnt / denom
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * jnp.log(m + LOG_EPS)
                   + (1.0 - xf) * jnp.log(1.0 - m + LOG_EPS)) / batch


def conditional_marginal_log_likelihood(params, codebook,
                                        cfg: vqvae.VqVaeConfig,
                                        dist, x, p1: int, num_smp: int,
                                        burn_in: int, key=None,
                                        verbose: bool = False) -> float:
    """CMLL of a test batch x [B, n_var]; `dist` is the train-split CPT.
    `verbose` prints sampling progress (reference core/model.py:141-142)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    dist32 = jnp.asarray(np.asarray(dist, np.float32))
    return float(_cmll_impl(params, codebook, cfg, dist32,
                            jnp.asarray(x), int(p1), int(num_smp),
                            int(burn_in), key, verbose=bool(verbose)))
