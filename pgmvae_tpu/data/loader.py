"""Fast host-side loading of the TRW benchmark CSVs and the leave-one-out
input transform.

The reference loads these files through `tf.data.experimental.CsvDataset`
(reference `run.py:54`) and then *materializes* the full leave-one-out tensor
`[N, n_var, n_var-1]` on the host (reference `run.py:46-56`, with a TODO at
`run.py:53` acknowledging the memory blow-up). We do neither:

- Loading: the TRW files are strictly single-char `0`/`1` CSV, so each row is
  exactly `2*n_var` bytes (`n_var` digits + `n_var-1` commas + newline). We
  parse by reshaping the raw byte buffer — ~GB/s, no CSV parser.
- Leave-one-out: never materialized per-dataset. `leave_one_out_index(n)`
  gives a static `[n, n-1]` gather table; the jitted train/eval steps gather
  `x[v] = y[:, idx[v]]` on device per batch (a fused index op under XLA).

The index table reproduces the reference's off-diagonal construction
(reference `run.py:46-50`): row v is the sample with variable v removed, in
natural variable order.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

from pgmvae_tpu import registry


def load_binary_csv(path: str, n_var: int) -> np.ndarray:
    """Load a 0/1 CSV with `n_var` columns into a uint8 array [N, n_var].

    Path order: native mmap+multithread parser (native/fastcsv.cpp) ->
    numpy byte-stride parse -> general np.genfromtxt."""
    from pgmvae_tpu.data import native
    arr = native.parse_binary_csv(path, n_var)
    if arr is not None:
        return arr
    with open(path, 'rb') as f:
        buf = f.read()
    row_bytes = 2 * n_var  # digits + commas + '\n'
    rem = len(buf) % row_bytes
    if rem in (0, row_bytes - 1):
        # Tolerate a missing trailing newline by appending one.
        if rem == row_bytes - 1:
            buf += b'\n'
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, row_bytes)
        vals = arr[:, ::2] - ord('0')
        if vals.max(initial=0) <= 1 and (arr[:, 1::2][:, :-1] == ord(',')).all():
            return np.ascontiguousarray(vals)
    # Fallback: general CSV (handles \r\n or multi-digit values).
    return np.genfromtxt(path, delimiter=',', dtype=np.uint8)


def load_split(name: str, split: str, root: Optional[str] = None,
               dtype=np.float32) -> np.ndarray:
    """Load one split of a registry dataset as [N, n_var] of `dtype`."""
    info = registry.REGISTRY[name]
    y = load_binary_csv(registry.split_path(name, split, root), info.n_var)
    return y.astype(dtype)


@lru_cache(maxsize=None)
def leave_one_out_index(n_var: int) -> np.ndarray:
    """Static gather table [n_var, n_var-1]: row v = [0..n_var-1] without v.

    Semantics match the reference's tile+off-diagonal-gather construction
    (reference `run.py:46-50`).
    """
    full = np.broadcast_to(np.arange(n_var, dtype=np.int32), (n_var, n_var))
    mask = ~np.eye(n_var, dtype=bool)
    return np.ascontiguousarray(full[mask].reshape(n_var, n_var - 1))


def leave_one_out(y: np.ndarray) -> np.ndarray:
    """Materialized leave-one-out views [n_var, N, n_var-1] (tests/debug only;
    production paths gather on device per batch instead)."""
    idx = leave_one_out_index(y.shape[-1])
    return np.transpose(y[:, idx], (1, 0, 2))
