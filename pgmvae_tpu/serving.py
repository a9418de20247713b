"""Serving / inference on a trained parameter-tying model.

The deployable artifact is tiny: encoder weights + per-variable codebooks +
the stage-2 CPT (`dist`). This module wraps a checkpoint in a jitted
inference API:

- `conditional_probability(x, fts)`: p(y_v=1 | rest) for selected variables
  (the reference's `get_probability`, `core/model.py:98-108`);
- `score(y)`: per-sample pseudo-log-likelihood — a capability the reference
  computes only as split-level aggregates (`core/model.py:91-96`); exposed
  per-sample here for anomaly scoring / ranking in production;
- `codes(y)`: each sample's discrete code per variable (the tied-parameter
  assignment), useful for interpretability and downstream indexing.

All paths are jit-compiled once per batch shape and run on whatever devices
the host JAX process sees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pgmvae_tpu import checkpoint as ckpt
from pgmvae_tpu.models import vqvae
from pgmvae_tpu.stage2 import LOG_EPS
from pgmvae_tpu.train import Trainer


class PgmModel:
    """Inference wrapper over (config, params, codebook, dist)."""

    def __init__(self, cfg: vqvae.VqVaeConfig, params, codebook,
                 dist: np.ndarray, parents: np.ndarray = None):
        self.cfg = cfg
        self.params = params
        self.codebook = codebook
        self.dist = np.asarray(dist, np.float64)
        # joint-code CPTs (driver --cpt-parents): dist is [n, K, 2^m] and
        # every lookup also keys on the sample's values at v's parents
        self.parents = (None if parents is None
                        else jnp.asarray(np.asarray(parents, np.int32)))
        self._dist32 = jnp.asarray(self.dist.astype(np.float32))
        self._codes = jax.jit(self._codes_impl)
        self._score = jax.jit(self._score_impl)
        self._cond = jax.jit(self._cond_impl)

    @classmethod
    def from_checkpoint(cls, path: str) -> 'PgmModel':
        cfg, state, dist, extra = ckpt.load(path)
        if dist is None:
            raise ValueError(f'{path} has no CPT (dist); run stage 2 and '
                             f'save with dist= before serving')
        # rebuild a typed state to extract params/codebook uniformly
        trainer = Trainer(cfg, 1e-3, 1, 1)
        template = trainer.init_state(jax.random.PRNGKey(0))
        from flax import serialization
        state = serialization.from_state_dict(template, state)
        parents = extra.get('cpt_parents')
        return cls(cfg, state.params, trainer.codebook(state), dist,
                   parents=np.asarray(parents, np.int32)
                   if parents is not None else None)

    # ------------------------------------------------------------------ --
    def _codes_impl(self, y):
        return vqvae.encode_codes(self.params, self.codebook, y, self.cfg)

    def codes(self, y) -> np.ndarray:
        """[B, n_var] int32: the tied-parameter code of each (sample,
        variable) — variable v's code is computed from the sample WITHOUT
        variable v (leave-one-out), as in stage 2."""
        return np.asarray(self._codes(jnp.asarray(y, jnp.float32))).T

    def _score_impl(self, y):
        codes = self._codes_impl(y)                       # [n, B]
        if self.parents is not None:
            vals = y[:, self.parents]                     # [B, n, m]
            pw = 1 << jnp.arange(self.parents.shape[1], dtype=jnp.int32)
            j = jnp.sum(vals.astype(jnp.int32) * pw, axis=-1).T   # [n, B]
            codes = codes * self._dist32.shape[-1] + j
            p1 = jnp.take_along_axis(
                self._dist32.reshape(self._dist32.shape[0], -1), codes,
                axis=1)
        else:
            p1 = jnp.take_along_axis(self._dist32, codes, axis=1)  # [n, B]
        yt = y.T
        ll = (yt * jnp.log(p1 + LOG_EPS)
              + (1.0 - yt) * jnp.log(1.0 - p1 + LOG_EPS))
        return jnp.sum(ll, axis=0)                        # [B]

    def score(self, y) -> np.ndarray:
        """Per-sample PLL [B] (sum over variables of log p(y_v | code)).
        The mean over a split equals stage2.pseudo_log_likelihood to float
        tolerance."""
        return np.asarray(self._score(jnp.asarray(y, jnp.float32)))

    def _cond_impl(self, x, fts):
        from pgmvae_tpu.gibbs import get_probability
        return get_probability(self.params, self.codebook, self.cfg,
                               self._dist32, x, fts, parents=self.parents)

    def conditional_probability(self, y, fts) -> np.ndarray:
        """p(y_v=1 | y_{-v}) for variables `fts` [F], given full-width
        samples y — [B, n_var] shared, or [F, B, n_var] one state per
        selection; each network masks its own variable internally
        (reference get_probability semantics, core/model.py:98-108)."""
        return np.asarray(self._cond(jnp.asarray(y, jnp.float32),
                                     jnp.asarray(fts, jnp.int32)))
