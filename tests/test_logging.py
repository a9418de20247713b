"""Observability tests: identifier format, JSONL metrics, result.txt."""

import collections
import json

from pgmvae_tpu.utils import MetricLogger, append_result
from pgmvae_tpu.utils.logging import run_identifier


def test_run_identifier_reference_format():
    ident = run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25, True,
                           0.99, 1, note='x')
    assert ident == ('nltcs_K-50_D-10_bs-128_epk-100_lr-0.01_bta-0.25'
                     '_ema-True_gma-0.99_sd-1-x')


def test_metric_logger_jsonl(tmp_path):
    M = collections.namedtuple('M', 'loss mae')
    lg = MetricLogger(str(tmp_path), tensorboard=False)
    lg.log_epoch(0, M(0.5, 0.2))
    lg.log_epoch(1, M(0.4, 0.1))
    lg.log_final(pll_test=-5.2, identifier='abc')
    lg.close()
    recs = [json.loads(l) for l in
            (tmp_path / 'metrics.jsonl').read_text().splitlines()]
    assert [r.get('epoch') for r in recs[:2]] == [0, 1]
    assert recs[0]['loss'] == 0.5 and recs[1]['mae'] == 0.1
    assert recs[2]['final'] and recs[2]['pll_test'] == -5.2


def test_append_result_contract(tmp_path):
    path = str(tmp_path / 'result.txt')
    line = append_result('id1', -5.1, -5.2, -5.3, path=path)
    append_result('id2', -1, -2, -3, cmll_test=-4.5, path=path)
    txt = open(path).read().splitlines()
    assert txt[0] == line == \
        'id1 pll-train:-5.1 pll-valid:-5.2 pll-test:-5.3 cmll-test:1'
    assert txt[1].endswith('cmll-test:-4.5')


def test_run_identifier_extension_fields():
    """Non-reference hyperparameters must de-alias the identifier, and only
    when they differ from defaults (reference-compatible ids unchanged)."""
    base = run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25, True, 0.99, 1)
    same = run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25, True, 0.99, 1,
                          quantizer='ema', fan_mode='tf_stacked',
                          dead_code_threshold=0.0, zero_debias=True,
                          precision='default')
    assert base == same  # defaults add nothing
    ext = run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25, True, 0.99, 1,
                         quantizer='naive', units=(15, 14),
                         fan_mode='per_network', dead_code_threshold=0.02,
                         zero_debias=False, precision='highest')
    assert ext.startswith(base)
    for tag in ('qz-naive', 'un-15x14', 'fm-per_network', 'dcr-0.02', 'nzd',
                'prc-highest'):
        assert tag in ext, tag


def test_metric_logger_warns_when_tensorboard_unavailable(tmp_path,
                                                          monkeypatch):
    """Without a usable TB writer, MetricLogger must degrade to JSONL-only
    LOUDLY (the reference's TB contract, ref run.py:39-40), not silently."""
    import builtins
    import warnings

    real_import = builtins.__import__

    def block_torch(name, *a, **kw):
        if name.startswith('torch'):
            raise ImportError('torch disabled for test')
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, '__import__', block_torch)
    with warnings.catch_warnings(record=True) as got:
        warnings.simplefilter('always')
        logger = MetricLogger(str(tmp_path / 'run'))
    assert logger._tb is None
    assert any('TensorBoard' in str(w.message) for w in got)
    logger.log_final(pll_test=-5.0)
    logger.close()


def test_identifier_encodes_cpt_parents():
    base = run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25, True,
                          0.99, 1)
    assert base == run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25,
                                  True, 0.99, 1, cpt_parents=0)
    rich = run_identifier('nltcs', 50, 10, 128, 100, 0.01, 0.25, True,
                          0.99, 1, cpt_parents=2)
    assert rich == base + '_cptp-2'
