"""Campaign-script contracts: the round-3 regeneration pipeline
(scripts/regen_report.py winner selection, scripts/run_cmll_all.py
--from-regen recipe recovery) must reconstruct EXACTLY the recipe a
joblog identifier encodes — the integrity bar of VERDICT r2 #1 is that
every reported number regenerates from its identifier alone."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_joblog(tmp_path, records):
    p = tmp_path / 'joblog.jsonl'
    with open(p, 'w') as f:
        for r in records:
            f.write(json.dumps(r) + '\n')
    return str(p)


def test_from_regen_recovers_exact_recipe(tmp_path):
    """A winner identifier round-trips into ExperimentConfig kwargs whose
    own identifier matches — the recipe regenerates its number."""
    rca = _load('rca', os.path.join(REPO, 'scripts', 'run_cmll_all.py'))
    from pgmvae_tpu.driver import ExperimentConfig

    ident = ('netflix_K-500_D-10_bs-128_epk-300_lr-0.001_bta-0.25_ema-True'
             '_gma-0.99_sd-2-_dcr-0.25_sov-50')
    joblog = _write_joblog(tmp_path, [
        {'identifier': ident, 'ok': True, 'pll_valid': -56.0,
         'pll_test': -56.5},
        {'identifier': ident.replace('sd-2', 'sd-1'), 'ok': True,
         'pll_valid': -57.0, 'pll_test': -57.2},      # worse valid
        {'identifier': ident.replace('dcr-0.25', 'dcr-1.0'), 'ok': False},
    ])
    win = rca.regen_winners(joblog)
    assert set(win) == {'netflix'}
    exp = ExperimentConfig(name='netflix', **win['netflix'])
    assert exp.identifier == ident


def test_from_regen_dedupes_reruns_last_wins(tmp_path):
    rca = _load('rca', os.path.join(REPO, 'scripts', 'run_cmll_all.py'))
    ident = ('plants_K-500_D-30_bs-256_epk-150_lr-0.003_bta-0.25_ema-True'
             '_gma-0.99_sd-1-_dcr-0.1_sov-30')
    joblog = _write_joblog(tmp_path, [
        {'identifier': ident, 'ok': True, 'pll_valid': -99.0,
         'pll_test': -99.0},
        {'identifier': ident, 'ok': True, 'pll_valid': -11.0,
         'pll_test': -11.2},                           # rerun supersedes
    ])
    win = rca.regen_winners(joblog)
    assert win['plants']['dead_code_threshold'] == 0.1
    assert win['plants']['select_on_valid'] == 30
    assert win['plants']['seed'] == 1


def test_regen_report_winner_by_valid(tmp_path, capsys):
    rep = _load('rep', os.path.join(REPO, 'scripts', 'regen_report.py'))
    base = ('pumsb_star_K-200_D-30_bs-64_epk-200_lr-0.001_bta-0.25_ema-True'
            '_gma-0.99_sd-{s}-_dcr-{d}_sov-40')
    joblog = _write_joblog(tmp_path, [
        {'identifier': base.format(s=1, d=0.25), 'ok': True,
         'pll_valid': -30.2, 'pll_test': -29.8},
        {'identifier': base.format(s=3, d=0.5), 'ok': True,
         'pll_valid': -30.0, 'pll_test': -29.6},       # best valid
        {'identifier': base.format(s=2, d=1.0), 'ok': True,
         'pll_valid': -36.8, 'pll_test': -36.4},
    ])
    sys.argv = ['regen_report.py', joblog]
    rep.main()
    out = capsys.readouterr().out
    win = [json.loads(l) for l in out.splitlines() if l.startswith('{')]
    assert len(win) == 1
    assert win[0]['identifier'] == base.format(s=3, d=0.5)
    assert win[0]['pll_test'] == -29.6


def test_parse_identifier_round_trips_every_field():
    """The canonical parser (round-3 advisor fix) must invert run_identifier
    losslessly across the full extension surface — including scientific-
    notation rates, which the old regex parsed as 1.0."""
    from pgmvae_tpu.driver import ExperimentConfig
    from pgmvae_tpu.utils.logging import parse_identifier

    configs = [
        dict(name='nltcs', embedding=100, dim=10),
        dict(name='netflix', embedding=500, dim=10, batch=128, epoch=300,
             rate=2e-05, ema=True, seed=2, dead_code_threshold=0.25,
             select_on_valid=50),
        dict(name='bbc', embedding=50, dim=20, batch=25, epoch=600,
             rate=0.003, cost=0.05, decay=0.9, seed=3,
             fan_mode='per_network', dead_code_threshold=0.25,
             select_on_valid=50),
        dict(name='students_03_02-0000', embedding=500, dim=30, seed=1,
             note='dcr-b32'),                    # aliased round-1 note form
        dict(name='students_03_02-0000', embedding=500, dim=30, seed=1,
             ema=True, dead_code_threshold=0.1, select_on_valid=100,
             packed_seeds=3),                    # packed-program identity
        dict(name='dna', embedding=200, dim=10, quantizer='naive',
             units=(12, 10), zero_debias=False, precision='highest',
             activation='relu', l2_reg=1e-4, cpt_parents=2,
             first_layer='rank1'),
        dict(name='accidents', embedding=500, dim=30, ema=True,
             select_on_valid=40, packed_seeds=3,
             cpt_parents_eval=(1, 2, 3)),       # post-hoc joint-CPT sweep
    ]
    for kw in configs:
        exp = ExperimentConfig(**kw)
        parsed = parse_identifier(exp.identifier)
        assert ExperimentConfig(**parsed).identifier == exp.identifier
        for f, v in kw.items():
            got = parsed.get(f, None)
            if f == 'units':
                got = tuple(got)
            assert got == v or (f not in parsed and not v), (f, v, parsed)


def test_parse_identifier_rejects_garbage():
    import pytest

    from pgmvae_tpu.utils.logging import parse_identifier
    with pytest.raises(ValueError):
        parse_identifier('not-an-identifier')


def test_cptp_parse_refuses_unforwarded_fields():
    """The joint-CPT campaign must refuse winners carrying recipe fields
    its run_pipeline command does not forward (round-3 advisor fix)."""
    import pytest

    cpt = _load('cpt', os.path.join(REPO, 'scripts', 'cptp_campaign.py'))
    from pgmvae_tpu.driver import ExperimentConfig

    ok = ExperimentConfig(name='accidents', embedding=500, dim=30, ema=True,
                          rate=2e-05, dead_code_threshold=0.1,
                          select_on_valid=40).identifier
    rec = cpt.parse_identifier(ok)
    assert rec['r'] == '2e-05' and rec['dcr'] == '0.1'

    bad = ExperimentConfig(name='accidents', embedding=500, dim=30, ema=True,
                           fan_mode='per_network').identifier
    with pytest.raises(ValueError):
        cpt.parse_identifier(bad)
    no_ema = ExperimentConfig(name='accidents', embedding=500,
                              dim=30).identifier
    with pytest.raises(ValueError):
        cpt.parse_identifier(no_ema)


def test_cptp_report_groups_and_scopes_tuned_table(tmp_path, capsys):
    """cptp_report must (a) group _cptp-M/_cpe-M records under their base
    identifier with M=0 = the primary cell, (b) pick the winner M by valid
    PLL, and (c) read tuned bests ONLY from the RESULTS.md table headed
    `| dataset | vars | ... |` — a later joint-CPT table with the same
    column count must not shadow it (the bug the first run of this report
    had)."""
    cr = _load('cr', os.path.join(REPO, 'scripts', 'cptp_report.py'))
    base = ('dna_K-200_D-10_bs-100_epk-300_lr-0.001_bta-0.1_ema-False'
            '_gma-0.99_sd-4-')
    joblog = _write_joblog(tmp_path, [
        {'identifier': base, 'ok': True, 'pll_valid': -100.6,
         'pll_test': -100.4, 'paper_pll': -58.46},
        {'identifier': base + '_cptp-1', 'ok': True, 'pll_valid': -83.3,
         'pll_test': -83.5, 'paper_pll': -58.46},
        {'identifier': base + '_cpe-2', 'ok': True, 'pll_valid': -61.0,
         'pll_test': -61.6, 'paper_pll': -58.46},
        {'identifier': base + '_cpe-3', 'ok': True, 'pll_valid': -58.9,
         'pll_test': -59.4, 'paper_pll': -58.46},
        {'identifier': base + '_cpe-4', 'ok': True, 'pll_valid': -58.95,
         'pll_test': -59.42, 'paper_pll': -58.46},     # worse valid than M=3
    ])
    results = tmp_path / 'RESULTS.md'
    results.write_text(
        '| dataset | vars | repro | tuned (ours) | repo best | paper | a | b |\n'
        '|---|---|---|---|---|---|---|---|\n'
        '| dna | 180 | -100.38 | -98.6149 | -99.12 | -58.46 | x | y |\n'
        '\n'
        '| dataset | M=0 | M=1 | M=2 | M=3 | tuned-table best | paper |\n'
        '|---|---|---|---|---|---|---|\n'
        '| dna | -100.38 | -83.45 | -61.56 | -59.40 | -98.6149 | -58.46 |\n')
    out_md = tmp_path / 'report.md'
    sys.argv = ['cptp_report.py', '--joblogs', joblog,
                '--results-md', str(results), '--out', str(out_md)]
    cr.main()
    err = capsys.readouterr().err
    summary = json.loads([l for l in err.splitlines()
                          if l.startswith('{')][-1])
    (d,) = summary['datasets']
    assert d['dataset'] == 'dna'
    assert d['winner_m'] == 3                      # by valid, not test
    assert d['pll_test'] == -59.4
    assert d['tuned_best'] == -98.6149             # from the FIRST table
    assert d['m_tested'] == [0, 1, 2, 3, 4]
    assert abs(d['delta_vs_tuned'] - 39.2149) < 1e-6


def test_cptp_report_mix_records_group_and_win(tmp_path, capsys):
    """Per-variable mixture records (identifier tail `_cpe-<list>_cpm`)
    must land in the same sweep group as their base cell's global-M
    records, sort after every int M, and win the group when their valid
    PLL is best — the round-5 headline rows (students -4.29, 50-17-8
    -44.81) flow through exactly this path. A pk-suffixed cptp record
    must also stay in the group (round-4 advisor finding)."""
    cr = _load('cr2', os.path.join(REPO, 'scripts', 'cptp_report.py'))

    # unit surface: split_m on the three identifier shapes
    base = ('students_03_02-0000_K-500_D-30_bs-32_epk-600_lr-0.001_bta-0.25'
            '_ema-True_gma-0.99_sd-1-_dcr-0.1_sov-100')
    assert cr.split_m(base) == (base, 0)
    assert cr.split_m(base + '_cpe-8') == (base, 8)
    assert cr.split_m(base + '_cpe-1.2.3.4.5.6.7.8_cpm') == (base, 'mix')
    assert cr.split_m(base + '_cptp-4_pk-3') == (base + '_pk-3', 4)
    assert cr._mkey('mix') > cr._mkey(12)      # mix sorts after every int M

    joblog = _write_joblog(tmp_path, [
        {'identifier': base, 'ok': True, 'pll_valid': -149.38,
         'pll_test': -150.44, 'paper_pll': -1.4775},
        {'identifier': base + '_cpe-4', 'ok': True, 'pll_valid': -6.91,
         'pll_test': -6.98, 'paper_pll': -1.4775},
        {'identifier': base + '_cpe-8', 'ok': True, 'pll_valid': -4.51,
         'pll_test': -4.58, 'paper_pll': -1.4775},
        {'identifier': base + '_cpe-1.2.3.4.5.6.7.8_cpm', 'ok': True,
         'pll_valid': -4.22, 'pll_test': -4.29, 'paper_pll': -1.4775},
    ])
    out_md = tmp_path / 'report.md'
    sys.argv = ['cptp_report.py', '--joblogs', joblog,
                '--results-md', str(tmp_path / 'missing.md'),
                '--out', str(out_md)]
    cr.main()
    err = capsys.readouterr().err
    summary = json.loads([l for l in err.splitlines()
                          if l.startswith('{')][-1])
    (d,) = summary['datasets']
    assert d['winner_m'] == 'mix'                  # best valid wins
    assert d['pll_test'] == -4.29
    assert d['m_tested'] == [0, 4, 8, 'mix']       # mix sorts last
    assert 'M=mix: -4.2900' in out_md.read_text()
