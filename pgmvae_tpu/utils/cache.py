"""Persistent XLA compilation cache.

Compiles in this environment go through a remote-compile tunnel with
latencies from seconds to minutes, so caching compiled executables across
processes is a large win for sweeps and repeated CLI runs. Enabled once per
process by the entry points (run.py / run_pipeline.py / bench.py / driver);
set PGMVAE_NO_COMPILE_CACHE=1 to disable, PGMVAE_COMPILE_CACHE_DIR to move.
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done or os.environ.get('PGMVAE_NO_COMPILE_CACHE') == '1':
        return
    _done = True
    import jax
    if jax.default_backend() == 'cpu':
        # CPU compiles are fast anyway, and XLA:CPU AOT cache entries carry
        # pedantic machine-feature checks that flood warnings on reload
        return
    # default to a repo-local cache dir (gitignored): the repo tree survives
    # driver/VM restarts in this environment while $HOME may not, and a warm
    # cache is the difference between ~1 s and minutes of remote-tunnel
    # compiles for a cold process
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache_dir = os.environ.get(
        'PGMVAE_COMPILE_CACHE_DIR', os.path.join(repo_root, '.xla_cache'))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything, however small/fast to compile
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
