"""pgmvae_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
Markov-network parameter tying via vector-quantized autoencoders.

Capabilities mirror the reference `motionlife/pgm-vae` (TF2):

- Stage 1: train `n_var` independent dense VQ-VAE autoencoders as ONE batched
  model (leave-one-out inputs, per-variable codebooks, straight-through
  gradients, commitment loss, optional EMA codebook updates).
- Stage 2: estimate per-variable conditional probability tables from the
  learned discrete codes and evaluate pseudo-log-likelihood (PLL), plus an
  optional Gibbs-sampling conditional-marginal log-likelihood (CMLL).

The design is TPU-first: the variable axis is a vmapped leading dimension
(batched matmuls on the MXU), whole epochs run as a single `lax.scan` under
`jit` (no per-step host round-trips), the quantizer hot path has a fused
Pallas kernel, and scaling is data-parallel + variable-axis model-parallel
over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from pgmvae_tpu.registry import REGISTRY, DatasetInfo, default_units  # noqa: F401
