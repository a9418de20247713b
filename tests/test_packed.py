"""Packed-seed sweep cells (`run_pipeline.py --pack-seeds`).

A seed sweep is the same compiled program with a different PRNG key; packing
vmaps S seeds' training states into ONE device program. On CPU per-seed
results match unpacked `run_experiment` runs to float tolerance; on TPU the
packed program's different XLA tiling changes f32 accumulation order enough
to shift PLL by ~0.1 nat (and flip basins on bistable datasets — measured:
students packed -88.3 vs unpacked -150.4, logs/cmll-r3-rerun.out). Packed
cells therefore carry their width in the identifier (pk-S,
ExperimentConfig.packed_seeds) and only regenerate through the packed path.
"""

import numpy as np
import pytest

from pgmvae_tpu.driver import (ExperimentConfig, run_experiment,
                               run_packed_experiments)
from run_pipeline import group_packed


BASE = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=2,
            rate=0.01, ema=True, units=(8, 6))


def test_packed_matches_unpacked_per_seed():
    exps = [ExperimentConfig(**BASE, seed=s) for s in (0, 1, 2)]
    packed = run_packed_experiments(exps)
    assert len(packed) == 3
    for exp, pres in zip(exps, packed):
        res = run_experiment(exp)
        # the packed cell records its packed identity
        assert pres['identifier'] == res['identifier'] + '_pk-3'
        for k in ('pll_train', 'pll_valid', 'pll_test'):
            np.testing.assert_allclose(pres[k], res[k], rtol=0, atol=2e-4)
        assert pres['packed_seeds'] == 3
    # seeds genuinely differ (the vmap is not broadcasting one state)
    assert len({round(p['pll_test'], 6) for p in packed}) > 1


def test_packed_select_on_valid_matches_unpacked():
    exps = [ExperimentConfig(**{**BASE, 'epoch': 4}, seed=s,
                             select_on_valid=2)
            for s in (0, 1)]
    packed = run_packed_experiments(exps)
    for exp, pres in zip(exps, packed):
        res = run_experiment(exp)
        assert pres['best_epoch'] == res['best_epoch']
        np.testing.assert_allclose(pres['pll_test'], res['pll_test'],
                                   rtol=0, atol=2e-4)


def test_packed_rejects_heterogeneous_cells():
    exps = [ExperimentConfig(**BASE, seed=0),
            ExperimentConfig(**{**BASE, 'dim': 8}, seed=1)]
    with pytest.raises(ValueError, match='differ only in seed'):
        run_packed_experiments(exps)


def test_packed_rejects_mesh_and_resume():
    with pytest.raises(ValueError, match='device mesh'):
        run_packed_experiments(
            [ExperimentConfig(**BASE, seed=s, mesh_data=2) for s in (0, 1)])
    with pytest.raises(ValueError, match='unpacked'):
        run_packed_experiments(
            [ExperimentConfig(**BASE, seed=s, resume='x.ckpt')
             for s in (0, 1)])


def test_unpacked_run_refuses_pk_identifier():
    """A pk-S config records a packed-program trajectory; regenerating it
    unpacked would silently produce a different model (the students basin
    flip), so run_experiment refuses."""
    with pytest.raises(ValueError, match='pack'):
        run_experiment(ExperimentConfig(**BASE, seed=1, packed_seeds=3))


def test_group_packed_partitions_grid():
    cells = [ExperimentConfig(**{**BASE, 'dim': d}, seed=s)
             for s in (0, 1, 2) for d in (4, 8)]
    groups = group_packed(cells, 2)
    # two dims x three seeds -> per dim: one pack of 2 + one pack of 1
    assert sorted(len(g) for g in groups) == [1, 1, 2, 2]
    for g in groups:
        dims = {c.dim for c in g}
        assert len(dims) == 1
        assert len({c.seed for c in g}) == len(g)
    # pack=1 degenerates to singletons in grid order
    singles = group_packed(cells, 1)
    assert [g[0].identifier for g in singles] == [c.identifier for c in cells]
