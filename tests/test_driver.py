"""Programmatic driver tests (the shared core of run.py / run_pipeline.py)."""

import json
import os

import pytest

from pgmvae_tpu.driver import ExperimentConfig, run_experiment


def test_run_experiment_end_to_end(tmp_path):
    exp = ExperimentConfig(name='nltcs', embedding=8, dim=4, batch=512,
                           epoch=1, rate=0.01, ema=True, seed=0,
                           units=(8, 6),
                           checkpoint=str(tmp_path / 'm.ckpt'),
                           log_dir=str(tmp_path / 'logs'))
    res = run_experiment(exp)
    assert res['identifier'].startswith('nltcs_K-8_D-4_bs-512_epk-1')
    assert -12 < res['pll_test'] < 0
    assert res['cmll_test'] == 1          # CMLL off -> hardcoded 1
    assert res['samples_per_sec'] > 0
    assert res['paper_pll'] == -4.98
    assert os.path.exists(tmp_path / 'm.ckpt')
    recs = [json.loads(l) for l in
            (tmp_path / 'logs' / 'metrics.jsonl').read_text().splitlines()]
    assert recs[0]['epoch'] == 0
    assert recs[-1]['final'] and 'pll_test' in recs[-1]


def test_unknown_dataset_raises():
    with pytest.raises(KeyError, match='unknown dataset'):
        run_experiment(ExperimentConfig(name='nope', embedding=4, dim=2))


def test_resume_rejects_mismatched_config(tmp_path):
    path = str(tmp_path / 'm.ckpt')
    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True, seed=0, units=(8, 6))
    run_experiment(ExperimentConfig(**base, checkpoint=path))
    # semantic field changed (decay) -> loud error, not silent divergence
    with pytest.raises(ValueError, match='decay'):
        run_experiment(ExperimentConfig(**{**base, 'decay': 0.5}, resume=path))
    # execution-only knob changed (precision) -> fine
    res = run_experiment(ExperimentConfig(**base, precision='highest',
                                          resume=path))
    assert res['pll_test'] < 0
