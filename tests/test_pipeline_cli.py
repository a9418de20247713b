"""Sweep-runner CLI contract tests (subprocess, CPU, tiny grids)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    # --device -1 pins the CPU backend (the env var alone is overridden by
    # the TPU plugin in this image; see run_pipeline.py / run.py)
    return subprocess.run([sys.executable, 'run_pipeline.py', '--device',
                           '-1'] + args, cwd=REPO, capture_output=True,
                          text=True, timeout=timeout)


def test_sweep_joblog_resume_and_retry(tmp_path):
    joblog = str(tmp_path / 'joblog.jsonl')
    res = str(tmp_path / 'result.txt')
    base = ['-n', 'nltcs,kdd', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
            '-r', '0.01', '-m', '--joblog', joblog, '--result-file', res]
    # kdd's train split is stripped from this mount -> that cell fails
    out1 = _run(base)
    assert out1.returncode == 1, out1.stderr[-800:]
    recs = {json.loads(l)['identifier']: json.loads(l)
            for l in open(joblog)}
    assert len(recs) == 2
    oks = sorted(r['ok'] for r in recs.values())
    assert oks == [False, True]
    assert sum(1 for l in open(res)) == 1  # only the successful cell appended

    # rerun without --retry-failed: nothing re-runs, same joblog size
    out2 = _run(base)
    assert out2.returncode == 1
    assert sum(1 for _ in open(joblog)) == 2
    # with --retry-failed: the failed cell is retried (and fails again)
    out3 = _run(base + ['--retry-failed'])
    assert out3.returncode == 1
    assert sum(1 for _ in open(joblog)) == 3


def test_sweep_full_hyper_surface(tmp_path):
    """The grid flags added for the tuned recipes (--units / --fan-mode /
    --dead-code-threshold / --quantizer / --no-zero-debias) must expand the
    grid and produce non-colliding identifiers in the joblog."""
    joblog = str(tmp_path / 'joblog.jsonl')
    res = str(tmp_path / 'result.txt')
    out = _run(['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
                '-r', '0.01', '-m', '--units', '8x6,auto',
                '--fan-mode', 'tf_stacked,per_network',
                '--dead-code-threshold', '0.0,0.02', '--no-zero-debias',
                '--joblog', joblog, '--result-file', res])
    assert out.returncode == 0, out.stderr[-800:]
    recs = [json.loads(l) for l in open(joblog)]
    ids = {r['identifier'] for r in recs}
    assert len(recs) == 8 and len(ids) == 8      # 2 units x 2 fan x 2 dcr
    assert all(r['ok'] for r in recs)
    assert any('_un-8x6' in i for i in ids)
    assert any('fm-per_network' in i for i in ids)
    assert any('dcr-0.02' in i for i in ids)
    assert all('nzd' in i for i in ids)


def test_sweep_quantizer_grid(tmp_path):
    joblog = str(tmp_path / 'joblog.jsonl')
    out = _run(['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
                '-r', '0.01', '--quantizer', 'ema,vq,naive',
                '--joblog', joblog,
                '--result-file', str(tmp_path / 'result.txt')])
    assert out.returncode == 0, out.stderr[-800:]
    ids = [json.loads(l)['identifier'] for l in open(joblog)]
    assert len(ids) == 3 and len(set(ids)) == 3
    # --ema not passed -> default quantizer is 'vq'; the others are marked
    assert sum('qz-' in i for i in ids) == 2


def test_sweep_isolate_subprocess_cells(tmp_path):
    """--isolate runs each cell in a fresh subprocess (reference
    batch-job.sh GNU-parallel isolation) with --device forwarded; results
    land in the joblog exactly as in-process cells do."""
    joblog = str(tmp_path / 'joblog.jsonl')
    out = _run(['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
                '-r', '0.01', '-m', '-s', '0,1', '--isolate',
                '--note', 'iso', '--joblog', joblog,
                '--result-file', str(tmp_path / 'result.txt')])
    assert out.returncode == 0, out.stderr[-800:]
    recs = [json.loads(l) for l in open(joblog)]
    assert len(recs) == 2 and all(r['ok'] for r in recs)
    assert all(-8 < r['pll_test'] < -4 for r in recs)


def test_sweep_pack_seeds(tmp_path):
    """--pack-seeds S runs seed-only-differing cells as one vmapped device
    program; joblog/result.txt records one line per cell, resume still
    dedupes per identifier."""
    joblog = str(tmp_path / 'joblog.jsonl')
    res = str(tmp_path / 'result.txt')
    base = ['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
            '-r', '0.01', '-m', '-s', '0,1,2', '--pack-seeds', '2',
            '--joblog', joblog, '--result-file', res]
    out = _run(base)
    assert out.returncode == 0, out.stderr[-800:]
    recs = [json.loads(l) for l in open(joblog)]
    assert len(recs) == 3 and all(r['ok'] for r in recs)
    assert sorted(r.get('packed_seeds', 1) for r in recs) == [1, 2, 2]
    assert sum(1 for _ in open(res)) == 3
    # resume: nothing re-runs
    out2 = _run(base)
    assert out2.returncode == 0
    assert sum(1 for _ in open(joblog)) == 3


def test_sweep_pack_seeds_isolated(tmp_path):
    """--pack-seeds composes with --isolate (packed group per subprocess)."""
    joblog = str(tmp_path / 'joblog.jsonl')
    out = _run(['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
                '-r', '0.01', '-m', '-s', '0,1', '--pack-seeds', '2',
                '--isolate', '--joblog', joblog,
                '--result-file', str(tmp_path / 'result.txt')])
    assert out.returncode == 0, out.stderr[-800:]
    recs = [json.loads(l) for l in open(joblog)]
    assert len(recs) == 2 and all(r['ok'] for r in recs)
    assert all(r['packed_seeds'] == 2 for r in recs)


def test_adam_impl_flag_is_identifier_encoded(tmp_path):
    """--adam-impl fused runs the fused optimizer path and records ad-fused
    in the cell identity (regeneration honesty: the fused graph drifts
    ~1 ULP/step from optax, so it must never alias a default cell)."""
    joblog = str(tmp_path / 'joblog.jsonl')
    res = str(tmp_path / 'result.txt')
    out = _run(['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
                '-r', '0.01', '-m', '--adam-impl', 'fused',
                '--joblog', joblog, '--result-file', res])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(open(joblog).readline())
    assert rec['ok'], rec
    assert rec['identifier'].endswith('_ad-fused')
    # and the identifier round-trips back to the fused recipe
    from pgmvae_tpu.utils.logging import parse_identifier
    assert parse_identifier(rec['identifier'])['adam_impl'] == 'fused'


def test_sweep_cpt_parents_eval_posthoc_records(tmp_path):
    """--cpt-parents-eval: one training emits the primary record PLUS one
    regenerable cpe-M record per listed M; resume treats the cell as done
    only when every cpe record is present."""
    joblog = str(tmp_path / 'joblog.jsonl')
    res = str(tmp_path / 'result.txt')
    base = ['-n', 'nltcs', '-k', '8', '-d', '4', '-b', '512', '-e', '1',
            '-r', '0.01', '-m', '--cpt-parents-eval', '1,2',
            '--joblog', joblog, '--result-file', res]
    out = _run(base)
    assert out.returncode == 0, out.stderr[-800:]
    recs = [json.loads(l) for l in open(joblog)]
    assert len(recs) == 3 and all(r['ok'] for r in recs)
    cpe = [r for r in recs if '_cpe-' in r['identifier']]
    assert sorted(r['identifier'].rsplit('cpe-', 1)[1] for r in cpe) \
        == ['1', '2']
    assert all(r['posthoc_of'] == recs[0]['identifier'] for r in cpe)
    assert sum(1 for _ in open(res)) == 3
    # resume: primary + all cpe records present -> nothing re-runs
    out2 = _run(base)
    assert out2.returncode == 0
    assert sum(1 for _ in open(joblog)) == 3
    # a WIDER eval list re-runs the cell to produce the missing cpe record
    out3 = _run(base[:-4] + ['--cpt-parents-eval', '1,2,3',
                             '--joblog', joblog, '--result-file', res])
    assert out3.returncode == 0
    recs = [json.loads(l) for l in open(joblog)]
    assert sum('_cpe-3' in r['identifier'] for r in recs) == 1
