"""Data loader and registry tests against the real TRW benchmark files."""

import numpy as np
import pytest

from pgmvae_tpu import registry
from pgmvae_tpu.data import loader


def test_registry_counts():
    assert len(registry.REGISTRY) == 24
    nltcs = registry.REGISTRY['nltcs']
    assert (nltcs.n_var, nltcs.n_train, nltcs.n_valid, nltcs.n_test) == \
        (16, 16181, 2157, 3236)
    assert nltcs.units == (15, 14, 13, 12)


def test_default_units_rule():
    # dna has no tuned units -> heuristic; floored at dim, capped at 200
    u = registry.REGISTRY['dna'].encoder_units(dim=10)
    assert u == (90, 60, 36, 22)
    # huge-n datasets get the single-chip memory cap (80*n^2*u0 budget rule)
    u = registry.REGISTRY['ad'].encoder_units(dim=30)
    assert u == (51, 51, 51, 51)
    assert registry.default_units(16, 20) == (20, 20, 20, 20)
    # unconstrained with a bigger budget (e.g. variable-axis sharding)
    assert registry.default_units(1556, 30, hbm_budget_bytes=8 * 10e9)[0] == 200


def test_fast_loader_matches_genfromtxt():
    path = registry.split_path('nltcs', 'valid')
    fast = loader.load_binary_csv(path, 16)
    slow = np.genfromtxt(path, delimiter=',', dtype=np.uint8)
    np.testing.assert_array_equal(fast, slow)
    assert fast.shape == (2157, 16)


@pytest.mark.parametrize('name,split,attr', [
    ('nltcs', 'train', 'n_train'),
    ('dna', 'test', 'n_test'),
    ('bn2o-30-20-200-2a', 'valid', 'n_valid'),
])
def test_split_sizes_match_registry(name, split, attr):
    info = registry.REGISTRY[name]
    y = loader.load_split(name, split)
    assert y.shape == (getattr(info, attr), info.n_var)
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_leave_one_out_index_semantics():
    """Must equal the reference's off-diagonal construction
    (reference run.py:46-50): row v = sample without variable v."""
    n = 7
    idx = loader.leave_one_out_index(n)
    # reference: indices i in [0, n^2) with i % (n+1) != 0 over a tiled vector
    ref_flat = np.array([i for i in range(n * n) if i % (n + 1) != 0])
    ref = (ref_flat % n).reshape(n, n - 1)
    np.testing.assert_array_equal(idx, ref)

    y = np.arange(2 * n, dtype=np.float32).reshape(2, n)
    x = loader.leave_one_out(y)
    assert x.shape == (n, 2, n - 1)
    for v in range(n):
        np.testing.assert_array_equal(x[v, 0], np.delete(y[0], v))
