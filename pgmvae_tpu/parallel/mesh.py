"""Device-mesh construction and sharding rules.

The reference has no multi-device capability at all — its `--device` flag
pins ONE GPU (reference `run.py:21,27-33`) and GNU `parallel` fans sweeps
across processes (`batch-job.sh`). Here scaling is first-class and rides the
TPU ICI through XLA collectives:

- `data` axis: batch (data parallelism). Gradients, VQ-EMA statistics and
  stage-2 count tensors are reduced with `psum`s that GSPMD inserts from the
  sharding annotations — no hand-written communication.
- `model` axis: the `n_var` variable axis. The n_var independent
  autoencoders are embarrassingly parallel, so sharding every stacked leaf
  (kernels, biases, codebooks, EMA stats, Adam moments) on axis 0 gives
  model parallelism with zero cross-device traffic in matmuls — only the
  scalar loss psum crosses the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a 2D ('data','model') mesh. `data=-1` uses all remaining
    devices. Works identically on real TPU slices and on
    `--xla_force_host_platform_device_count` CPU meshes."""
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        assert len(devices) % model == 0, (len(devices), model)
        data = len(devices) // model
    use = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(use, ('data', 'model'))


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """Carries the (optional) mesh plus canonical PartitionSpecs. With
    `mesh=None` every annotation degrades to a no-op, so single-chip and
    multi-chip run the same code path."""
    mesh: Optional[Mesh] = None

    # canonical specs
    batch = P('data')                       # y [B, n_var]
    var_batch = P('model', 'data')          # x [n_var, B, ...]
    var_leading = P('model')                # stacked params / stats [n_var,...]

    def constrain(self, x, spec: P):
        if self.mesh is None or x is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def constrain_tree(self, tree, leaf_spec_fn):
        if self.mesh is None:
            return tree
        return jax.tree.map(
            lambda l: self.constrain(l, leaf_spec_fn(l)), tree)

    def put(self, x, spec: P):
        """Host -> device placement with sharding (outside jit)."""
        if self.mesh is None:
            return jax.device_put(x)
        return jax.device_put(x, NamedSharding(self.mesh, spec))


def shard_leading_axis(n_var: int):
    """Sharding rule for state pytrees: any leaf whose leading dim is n_var
    (stacked kernels/biases/codebooks/EMA stats/Adam moments) is sharded on
    the 'model' axis; everything else is replicated."""
    def rule(leaf) -> P:
        if hasattr(leaf, 'ndim') and leaf.ndim >= 1 and leaf.shape[0] == n_var:
            return P('model', *([None] * (leaf.ndim - 1)))
        return P()
    return rule
