"""Native fastcsv parser tests (ctypes over native/libfastcsv.so; skipped
when the toolchain can't build it — the loader falls back to numpy)."""

import numpy as np
import pytest

from pgmvae_tpu import registry
from pgmvae_tpu.data import loader, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native lib unavailable')


def test_matches_numpy_on_real_data():
    path = registry.split_path('nltcs', 'valid')
    a = native.parse_binary_csv(path, 16)
    b = np.genfromtxt(path, delimiter=',', dtype=np.uint8)
    np.testing.assert_array_equal(a, b)


def test_rejects_bad_layout(tmp_path):
    p = tmp_path / 'bad.data'
    p.write_text('0,1,0\n1,x,1\n')
    assert native.parse_binary_csv(str(p), 3) is None
    # multi-digit values -> not the fast layout -> None (loader falls back)
    p2 = tmp_path / 'multi.data'
    p2.write_text('10,1,0\n')
    assert native.parse_binary_csv(str(p2), 3) is None


def test_missing_trailing_newline(tmp_path):
    p = tmp_path / 'nonl.data'
    p.write_text('0,1,0\n1,1,1')
    out = native.parse_binary_csv(str(p), 3)
    np.testing.assert_array_equal(out, [[0, 1, 0], [1, 1, 1]])


def test_loader_uses_native_path():
    path = registry.split_path('nltcs', 'valid')
    got = loader.load_binary_csv(path, 16)
    ref = np.genfromtxt(path, delimiter=',', dtype=np.uint8)
    np.testing.assert_array_equal(got, ref)
