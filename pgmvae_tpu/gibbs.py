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
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pgmvae_tpu.models import vqvae

LOG_EPS = 1e-5  # reference core/model.py:148


def get_probability(params, codebook, cfg, dist, y, fts, parents=None):
    """p(y_v = 1 | code_v(y_{-v})[, y_parents(v)]) for the selected
    variables (reference `core/model.py:98-108`).

    y: full-width samples — [B, n_var] shared across selections, or
    [n_sel, B, n_var] one state per selection (the Gibbs case). Each selected
    network masks out its own variable internally (padded leave-one-out), so
    callers never build [.., n_var-1] views. fts: [n_sel] variable ids.

    With joint-code CPTs (stage2.select_parents), `dist` is [n, K, 2^m] and
    `parents` [n, m]: the lookup also keys on the binary word of the
    sample's values at the selected variable's parents.
    Returns [n_sel, B] probabilities gathered from the CPT `dist`.
    """
    sub_params, sub_codebook = vqvae.gather_variables(params, codebook, fts)
    codes = vqvae.encode_codes(sub_params, sub_codebook, y, cfg,
                               var_ids=fts)                       # [n_sel,B]
    if parents is None:
        prb = jnp.take(dist, fts, axis=0)                         # [n_sel,K]
        return jnp.take_along_axis(prb, codes, axis=1)
    m = parents.shape[1]
    n_states = 1 << m
    par = jnp.take(parents, fts, axis=0)                          # [n_sel,m]
    if y.ndim == 2:
        vals = jnp.transpose(y[:, par], (1, 0, 2))                # [n_sel,B,m]
    else:
        vals = jnp.take_along_axis(y, par[:, None, :], axis=2)    # [n_sel,B,m]
    pw = 1 << jnp.arange(m, dtype=jnp.int32)
    j = jnp.sum(vals.astype(jnp.int32) * pw, axis=-1)             # [n_sel,B]
    dflat = dist.reshape(dist.shape[0], -1)                       # [n,K*2^m]
    prb = jnp.take(dflat, fts, axis=0)
    return jnp.take_along_axis(prb, codes * n_states + j, axis=1)


_SEGMENT_STEPS = int(os.environ.get('PGMVAE_GIBBS_SEGMENT_STEPS', 8192))
# Bound on Gibbs steps per device execution. The chain used to run as ONE
# fori_loop over num_smp*p1 steps; at 50-17-8 scale (84k steps) that single
# execution exceeded the remote TPU worker's watchdog and crashed it
# ("TPU worker process crashed or restarted"). Segmenting costs one host
# round-trip per 8192 steps (~ms) and compiles at most two programs (full
# segment + remainder). Deployments without the watchdog can raise it via
# $PGMVAE_GIBBS_SEGMENT_STEPS.


@partial(jax.jit, static_argnames=('cfg', 'p1', 'seg', 'burn_in'))
def _cmll_segment(params, codebook, cfg: vqvae.VqVaeConfig, dist,
                  state, cnt, i0, p1: int, seg: int, burn_in: int, key,
                  parents=None):
    """Advance the blockwise Gibbs chain by `seg` steps starting at global
    step i0 (a device scalar, so all full segments share one program).
    Step math is identical to the reference sweep (core/model.py:129-143);
    fold_in(key, i) keys make trajectories independent of segmentation."""
    batch, n = cnt.shape
    blocks = state.shape[0]
    vol = np.concatenate([np.full(blocks - 1, p1), [n - p1 * (blocks - 1)]])
    marker = np.arange(blocks) * p1
    vol_j, marker_j = jnp.asarray(vol), jnp.asarray(marker)
    bid = jnp.arange(blocks)

    def step(j, carry):
        stt, cnt = carry                         # [blocks,B,n_pad], [B,n]
        i = i0 + j
        y = marker_j + jnp.mod(i, vol_j)         # variable per block
        # padded design: the chain state goes in whole; each block's network
        # masks its own variable internally -- no per-block gather
        prb = get_probability(params, codebook, cfg, dist, stt, y,
                              parents=parents)
        u = jax.random.uniform(jax.random.fold_in(key, i), (blocks, batch))
        gibbs = (u < prb).astype(stt.dtype)
        stt = stt.at[bid[:, None], jnp.arange(batch)[None, :],
                     y[:, None]].set(gibbs)
        # count post-burn-in occurrences (strict >, ref core/model.py:139)
        flag = (i > burn_in * p1).astype(cnt.dtype)
        cnt = cnt.at[:, y].add(gibbs.T * flag)
        return stt, cnt

    return jax.lax.fori_loop(0, seg, step, (state, cnt))


def conditional_marginal_log_likelihood(params, codebook,
                                        cfg: vqvae.VqVaeConfig,
                                        dist, x, p1: int, num_smp: int,
                                        burn_in: int, key=None,
                                        verbose: bool = False,
                                        parents=None) -> float:
    """CMLL of a test batch x [B, n_var]; `dist` is the train-split CPT
    ([n, K], or [n, K, 2^m] with `parents` [n, m] joint-code tables).
    `verbose` prints sampling progress (reference core/model.py:141-142)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    p1, num_smp, burn_in = int(p1), int(num_smp), int(burn_in)
    dist32 = jnp.asarray(np.asarray(dist, np.float32))
    if parents is not None:
        parents = jnp.asarray(np.asarray(parents, np.int32))
    x = jnp.asarray(x)
    batch, n = x.shape
    blocks = math.ceil(n / p1)

    state = jnp.broadcast_to(x, (blocks, batch, n)).astype(jnp.float32)
    if cfg.n_var > n:                       # padded variable axis: append
        state = jnp.concatenate(            # inert zero columns for encode
            [state, jnp.zeros((blocks, batch, cfg.n_var - n),
                              state.dtype)], axis=-1)
    cnt = jnp.zeros((batch, n), jnp.float32)

    total, done = num_smp * p1, 0
    while done < total:
        seg = min(_SEGMENT_STEPS, total - done)
        state, cnt = _cmll_segment(params, codebook, cfg, dist32, state,
                                   cnt, jnp.asarray(done, jnp.int32),
                                   p1, seg, burn_in, key, parents=parents)
        jax.block_until_ready(cnt)          # bound each remote execution
        done += seg
        if verbose:
            # sampling progress, mirroring the reference's print under
            # `verbose` (reference core/model.py:141-142)
            print(f'cmll sampling step {done}/{total}', flush=True)

    vol_last = n - p1 * (blocks - 1)
    valid = float(num_smp - burn_in)
    valid_end = float(int(valid * p1) // vol_last)  # reference's floor-div
    denom = jnp.concatenate([jnp.full((1, n - vol_last), valid),
                             jnp.full((1, vol_last), valid_end)], axis=1)
    m = cnt / denom
    xf = x.astype(jnp.float32)
    return float(jnp.sum(xf * jnp.log(m + LOG_EPS)
                         + (1.0 - xf) * jnp.log(1.0 - m + LOG_EPS)) / batch)
