"""Checkpoint / resume.

The reference's only persistence is a vestigial `save_weights` in the legacy
pipeline (reference `run_pipeline.py:38`; commented out of the canonical path
at `run.py:63`) with no resume logic. Here checkpointing is a first-class
subsystem: the full training state (params, EMA quantizer state, Adam
moments, step) plus the stage-2 CPT and the run config are saved as one
atomic msgpack blob (flax.serialization) with a JSON header — models are
KB..MB scale, so a single file beats a directory-tree checkpointer.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from pgmvae_tpu.models.vqvae import VqVaeConfig

_MAGIC = b'PGMVAE1\n'


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save(path: str, cfg: VqVaeConfig, state, dist: Optional[np.ndarray] = None,
         extra: Optional[dict] = None) -> None:
    """Atomically write {config, train state, optional CPT, metadata}."""
    payload = {'state': serialization.to_state_dict(_to_host(state))}
    if dist is not None:
        payload['dist'] = np.asarray(dist)
    header = json.dumps({
        'config': cfg._asdict(),
        'has_dist': dist is not None,
        'extra': extra or {},
    }).encode()
    blob = serialization.msgpack_serialize(payload)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=parent)
    try:
        with os.fdopen(fd, 'wb') as f:
            f.write(_MAGIC)
            f.write(len(header).to_bytes(8, 'little'))
            f.write(header)
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str, state_template=None
         ) -> Tuple[VqVaeConfig, Any, Optional[np.ndarray], dict]:
    """Read a checkpoint. If `state_template` (a TrainState with matching
    pytree structure, e.g. from `Trainer.init_state`) is given, the state is
    restored into that exact structure; otherwise the raw nested-dict state
    is returned (enough for inference-only uses)."""
    with open(path, 'rb') as f:
        if f.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(f'not a pgmvae checkpoint: {path}')
        hlen = int.from_bytes(f.read(8), 'little')
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    cfg_d = header['config']
    cfg_d['units'] = tuple(cfg_d['units'])
    cfg = VqVaeConfig(**cfg_d)

    payload = serialization.msgpack_restore(blob)
    state = payload['state']
    if state_template is not None:
        state = serialization.from_state_dict(state_template, state)
    dist = payload.get('dist') if header['has_dist'] else None
    return cfg, state, dist, header['extra']
