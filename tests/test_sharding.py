"""Multi-device parity on a fake 8-CPU mesh: sharded training and stage-2
must match single-device results (the collectives GSPMD inserts — grad psum,
EMA-stat psum, count psum — must be semantically invisible)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pgmvae_tpu.models import VqVaeConfig
from pgmvae_tpu.parallel import MeshContext, make_mesh, shard_leading_axis
from pgmvae_tpu.stage2 import Stage2
from pgmvae_tpu.train import Trainer

CFG = VqVaeConfig(n_var=8, units=(7, 6), dim=4, num_codes=10, quantizer='ema')


def _data(n=512, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(n, CFG.n_var)).astype(np.float32)


@pytest.mark.parametrize('shape', [(8, 1), (1, 8), (2, 4)])
def test_epoch_parity_across_mesh_shapes(shape):
    y = _data()
    tr1 = Trainer(CFG, 0.01, 64, len(y))
    s1 = tr1.init_state(jax.random.PRNGKey(0))
    s1, m1 = tr1.run_epoch(s1, jnp.asarray(y), jax.random.PRNGKey(5))

    ctx = MeshContext(make_mesh(*shape))
    trn = Trainer(CFG, 0.01, 64, len(y), mesh_ctx=ctx)
    sn = trn.init_state(jax.random.PRNGKey(0))
    sn, mn = trn.run_epoch(sn, ctx.put(jnp.asarray(y), P()),
                           jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m1.loss), float(mn.loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr1.codebook(s1)),
                               np.asarray(trn.codebook(sn)),
                               rtol=1e-4, atol=1e-5)


def test_state_sharding_layout():
    ctx = MeshContext(make_mesh(2, 4))
    tr = Trainer(CFG, 0.01, 64, 512, mesh_ctx=ctx)
    st = tr.init_state(jax.random.PRNGKey(0))
    w0 = st.params['enc'][0][0]
    # stacked kernel must actually be laid out over the 'model' axis
    assert len(w0.sharding.device_set) == 8
    spec = w0.sharding.spec
    assert spec[0] == 'model', spec
    # EMA codebook follows the same rule
    assert st.ema.codebook.sharding.spec[0] == 'model'
    # scalar step is replicated
    assert st.step.sharding.is_fully_replicated


def test_stage2_counts_parity_on_mesh():
    y = _data(300, seed=2)
    tr = Trainer(CFG, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(1))
    n1a, n0a = Stage2(CFG, chunk=64).counts(st.params, tr.codebook(st), y)

    ctx = MeshContext(make_mesh(4, 2))
    trm = Trainer(CFG, 0.01, 64, len(y), mesh_ctx=ctx)
    stm = trm.init_state(jax.random.PRNGKey(1))
    n1b, n0b = Stage2(CFG, chunk=64, mesh_ctx=ctx).counts(
        stm.params, trm.codebook(stm), y)
    np.testing.assert_array_equal(n1a, n1b)
    np.testing.assert_array_equal(n0a, n0b)


def test_stage2_scatter_counts_parity_on_mesh():
    """The wide-table scatter-add path (stage2.py:SCATTER_COLS) under
    GSPMD: batch-sharded scatter updates must reduce to the same exact
    integer counts as single-device, with and without joint-CPT parents."""
    from pgmvae_tpu.stage2 import select_parents
    y = _data(300, seed=3)
    tr = Trainer(CFG, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(1))
    par = select_parents(y, 2)
    ctx = MeshContext(make_mesh(4, 2))
    trm = Trainer(CFG, 0.01, 64, len(y), mesh_ctx=ctx)
    stm = trm.init_state(jax.random.PRNGKey(1))
    for parents in (None, par):
        n1a, n0a = Stage2(CFG, chunk=64, parents=parents,
                          scatter=True).counts(st.params, tr.codebook(st), y)
        n1b, n0b = Stage2(CFG, chunk=64, parents=parents, scatter=True,
                          mesh_ctx=ctx).counts(stm.params,
                                               trm.codebook(stm), y)
        np.testing.assert_array_equal(n1a, n1b)
        np.testing.assert_array_equal(n0a, n0b)


def test_dead_code_restart_mesh_parity():
    """Dead-code restarts on the first step must be identical on 1 device
    and a 2x4 mesh: usage values there are exact batch-assignment counts
    (integers), so the dead/alive decision is unambiguous and the drawn
    batch indices are key-deterministic. (Over many steps, usage values
    sitting exactly at the threshold may flip with psum reduction order —
    restarts are discontinuous, so bitwise multi-step parity is not a
    guarantee of this design.)"""
    cfg = CFG._replace(dead_code_threshold=0.5, num_codes=32)  # forces deads
    y = _data(64, seed=5)

    def run(ctx):
        tr = Trainer(cfg, 0.01, 64, len(y), mesh_ctx=ctx)
        st = tr.init_state(jax.random.PRNGKey(0))
        yb = (jnp.asarray(y) if ctx is None
              else ctx.put(jnp.asarray(y), P('data', None)))
        w = (jnp.ones(64) if ctx is None
             else ctx.put(jnp.ones(64), P('data')))
        st, m = jax.jit(tr.train_step)(st, yb, w, jax.random.PRNGKey(7))
        return np.asarray(tr.codebook(st)), float(m.loss)

    cb1, l1 = run(None)
    cb8, l8 = run(MeshContext(make_mesh(2, 4)))
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    np.testing.assert_allclose(cb1, cb8, rtol=1e-4, atol=1e-5)


def test_shard_rule():
    rule = shard_leading_axis(8)
    assert rule(jnp.zeros((8, 3, 4))) == P('model', None, None)
    assert rule(jnp.zeros((4, 3))) == P()
    assert rule(jnp.zeros(())) == P()


def test_mesh_model_lifts_width_guard():
    """The single-chip memory guard shrinks bbc-class widths; sharding the
    variable axis must widen the budget proportionally (VERDICT r1 #8)."""
    from pgmvae_tpu.registry import REGISTRY, default_units
    bbc = REGISTRY['bbc']
    solo = bbc.encoder_units(30)                 # memory-guarded single chip
    lifted = bbc.encoder_units(30, mesh_model=8)
    assert solo[0] < 128, solo         # guard bites on one chip (n=1058)
    assert lifted[0] == 200, lifted    # only the n//2-vs-200 cap remains
    # 'ad' (n=1556): the guard also bites, and also lifts with the mesh
    assert default_units(1556, 30)[0] < default_units(1556, 30,
                                                      mesh_model=8)[0]


def test_bbc_full_width_param_bytes_divided_across_model_axis():
    """bbc (n_var=1058) at UNGUARDED webkb-class widths (u0=400,
    reference baseline.py:22) on a (1, 8) model mesh: every stacked leaf
    must be physically split 8 ways — per-device bytes == total/8 — so the
    per-chip footprint that OOMs a single 16 GB v5e fits 8 of them.

    1058 % 8 != 0, so (as the driver does) the variable axis pads up to
    1064 with n_active=1058 inert networks — GSPMD requires the 'model'
    axis to divide the stacked leading dim."""
    cfg = VqVaeConfig(n_var=1064, n_active=1058,
                      units=(400, 200, 100, 50), dim=30,
                      num_codes=20, quantizer='ema')
    ctx = MeshContext(make_mesh(1, 8))
    tr = Trainer(cfg, 0.001, 16, 256, mesh_ctx=ctx)
    st = tr.init_state(jax.random.PRNGKey(0))

    total = 0
    for leaf in jax.tree.leaves((st.params, st.ema)):
        if leaf.ndim >= 1 and leaf.shape[0] == cfg.n_var:
            shards = leaf.addressable_shards
            assert len(shards) == 8, leaf.shape
            per_dev = shards[0].data.nbytes
            assert per_dev * 8 == leaf.nbytes, (leaf.shape, per_dev)
            total += leaf.nbytes
    # the stacked stacks really are the multi-GB regime the guard protects
    assert total > 4e9, total


def test_rank1_first_layer_mesh_parity():
    """first_layer='rank1' under a (2,4) data x model mesh: the shared-y
    einsum + diagonal correction (models/vqvae.py:_rank1_linear) must
    shard over both axes and train to the same parameters as the
    single-device rank1 run (GSPMD inserts the y all-gather across the
    model axis; the custom VJP's zero-diagonal constraint must survive
    SPMD partitioning)."""
    cfg = CFG._replace(first_layer='rank1')
    y = _data()
    tr1 = Trainer(cfg, 0.01, 64, len(y))
    s1 = tr1.init_state(jax.random.PRNGKey(0))
    s1, m1 = tr1.run_epoch(s1, jnp.asarray(y), jax.random.PRNGKey(5))

    ctx = MeshContext(make_mesh(2, 4))
    trn = Trainer(cfg, 0.01, 64, len(y), mesh_ctx=ctx)
    sn = trn.init_state(jax.random.PRNGKey(0))
    sn, mn = trn.run_epoch(sn, ctx.put(jnp.asarray(y), P()),
                           jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(m1.loss), float(mn.loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sn.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # inert diagonal survives sharded training
    w0_init = np.asarray(
        tr1.init_state(jax.random.PRNGKey(0)).params['enc'][0][0])
    w0_mesh = np.asarray(jax.device_get(sn.params['enc'][0][0]))
    idx = np.arange(cfg.n_var)
    np.testing.assert_array_equal(w0_mesh[idx, idx, :],
                                  w0_init[idx, idx, :])
