"""Round-5 hardening: sweep-resume correctness for packed subsets and
--cmll, identifier-note ambiguity rejection, pre-training validation of
joint-CPT parent counts, and the naive-quantizer stage-2 blow-up guard.

These pin the round-4 advisor findings (run_pipeline.py packed-subset
resume, --cmll done-ness, parse_identifier note ambiguity, cptp_report
suffix anchoring, cpt_parents_eval validation) and the round-3 verdict's
naive stage-2 guard item."""

import dataclasses
import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cells(seeds, **kw):
    from pgmvae_tpu.driver import ExperimentConfig
    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True)
    base.update(kw)
    return [ExperimentConfig(seed=s, **base) for s in seeds]


def _ok(cell, width=1, **extra):
    ident = dataclasses.replace(cell, packed_seeds=width,
                                cpt_parents_eval=()).identifier
    return ident, {'identifier': ident, 'ok': True, 'cmll_test': 1, **extra}


# ---------------------------------------------------------------- resume

def test_classify_recognizes_any_packed_width():
    """A cell recorded at pk-S for ANY S <= group width is done: a partial
    rerun packs only the todo subset, so its records carry S = len(todo),
    not len(group) (round-4 advisor, medium)."""
    rp = _load('run_pipeline', os.path.join(REPO, 'run_pipeline.py'))
    cells = _cells([0, 1, 2])
    # seed 0 ran unpacked, seed 1 ran as a pk-2 lane (subset rerun), seed 2
    # ran at the full pk-3 width
    status = dict([_ok(cells[0], 1), _ok(cells[1], 2), _ok(cells[2], 3)])
    for c in cells:
        assert rp.classify_cell(c, 3, status) == 'done', c.identifier
    # an unseen seed is still todo
    (extra,) = _cells([7])
    assert rp.classify_cell(extra, 3, status) == 'todo'


def test_classify_prefers_ok_record_over_stale_failure():
    rp = _load('run_pipeline', os.path.join(REPO, 'run_pipeline.py'))
    (cell,) = _cells([0])
    fail_id = dataclasses.replace(cell, packed_seeds=1,
                                  cpt_parents_eval=()).identifier
    ok_id, ok_rec = _ok(cell, 2)
    status = {fail_id: {'identifier': fail_id, 'ok': False}, ok_id: ok_rec}
    assert rp.classify_cell(cell, 3, status) == 'done'
    # only the failure -> failed (retry semantics decided by the caller)
    assert rp.classify_cell(cell, 3, {fail_id: status[fail_id]}) == 'failed'


def test_classify_cmll_sentinel_not_done():
    """--cmll on a finished sweep: a record whose cmll_test is the literal
    1 (the CMLL-off sentinel, reference run.py:77) must rerun; a record
    with a real CMLL is done (round-4 advisor, low)."""
    rp = _load('run_pipeline', os.path.join(REPO, 'run_pipeline.py'))
    (cell,) = _cells([0])
    ident, rec = _ok(cell, 1)
    assert rp.classify_cell(cell, 1, {ident: rec}, want_cmll=True) == 'todo'
    assert rp.classify_cell(cell, 1, {ident: rec}, want_cmll=False) == 'done'
    rec_cmll = {**rec, 'cmll_test': -5.21}
    assert rp.classify_cell(cell, 1, {ident: rec_cmll},
                            want_cmll=True) == 'done'


def test_classify_cpe_records_required():
    """A cell with cpt_parents_eval is done only once every cpe-M record is
    ok — including when the primary record sits at a packed width."""
    rp = _load('run_pipeline', os.path.join(REPO, 'run_pipeline.py'))
    (cell,) = _cells([0], cpt_parents_eval=(1, 2))
    ident, rec = _ok(cell, 2)
    status = {ident: rec}
    assert rp.classify_cell(cell, 3, status) == 'todo'    # cpe missing
    for m in (1, 2):
        cpe_id = dataclasses.replace(cell, packed_seeds=2,
                                     cpt_parents_eval=(m,)).identifier
        status[cpe_id] = {'identifier': cpe_id, 'ok': True}
    assert rp.classify_cell(cell, 3, status) == 'done'


# ------------------------------------------------------- identifier notes

def test_ambiguous_note_rejected():
    """A note whose tail mimics an extension field would be peeled into the
    wrong config field by parse_identifier while still rebuilding
    byte-identically — reject at identifier-build time (round-4 advisor)."""
    from pgmvae_tpu.utils.logging import run_identifier
    for bad in ('x_pk-3', 'foo_un-128', 'a_cpe-2', 'foo_nzd'):
        with pytest.raises(ValueError, match='ambiguous'):
            run_identifier('nltcs', 8, 4, 512, 1, 0.01, 0.25, True, 0.99, 0,
                           bad)
    # benign notes keep working, including the reference's own underscore
    # style (batch-job.sh --note=50_40_30_20) and ext-like PREFIXES (no
    # leading underscore in the identifier tail -> unambiguous)
    for good in ('', '50_40_30_20', 'pk-3', 'nzd', 'iso'):
        ident = run_identifier('nltcs', 8, 4, 512, 1, 0.01, 0.25, True,
                               0.99, 0, good)
        assert ident.endswith(f'-{good}')


def test_ambiguous_note_roundtrip_guard_blocks_lossy_parse():
    """The exact failure mode: note 'x_pk-3' parses to (note='x', pk=3) and
    rebuilds byte-identically — the guard makes it unrepresentable."""
    from pgmvae_tpu.driver import ExperimentConfig
    with pytest.raises(ValueError, match='ambiguous'):
        ExperimentConfig(name='nltcs', embedding=8, dim=4,
                         note='x_pk-3').identifier


# --------------------------------------------------- cpt-parents validation

def test_cpt_parents_validated_before_training():
    from pgmvae_tpu.driver import ExperimentConfig
    with pytest.raises(ValueError, match=r'\[0, 12\]'):
        ExperimentConfig(name='nltcs', embedding=8, dim=4, cpt_parents=13)
    with pytest.raises(ValueError, match=r'\[0, 12\]'):
        ExperimentConfig(name='nltcs', embedding=8, dim=4,
                         cpt_parents_eval=(1, -1))
    # valid bounds construct fine
    ExperimentConfig(name='nltcs', embedding=8, dim=4, cpt_parents=12,
                     cpt_parents_eval=(0, 1, 12))


# ------------------------------------------------------ naive stage-2 guard

def test_naive_quantizer_stage2_dim_guard():
    """quantizer='naive' tabulates 2^dim stage-2 columns; dim > 20 must be
    a loud ValueError BEFORE any training or a multi-GB allocation
    (round-3 verdict item, reference bug context core/quantizer.py:179)."""
    from pgmvae_tpu.driver import ExperimentConfig, run_experiment
    from pgmvae_tpu.models.vqvae import VqVaeConfig
    from pgmvae_tpu.stage2 import Stage2

    cfg = VqVaeConfig(n_var=16, units=(8,), dim=30, num_codes=8,
                      quantizer='naive')
    with pytest.raises(ValueError, match='naive'):
        Stage2(cfg)
    exp = ExperimentConfig(name='nltcs', embedding=8, dim=30, epoch=1,
                           quantizer='naive')
    with pytest.raises(ValueError, match='naive'):
        run_experiment(exp)
    # dim <= 20 still constructs
    ok = VqVaeConfig(n_var=16, units=(8,), dim=4, num_codes=8,
                     quantizer='naive')
    Stage2(ok)


# -------------------------------------------------------- cptp_report suffix

def test_cptp_report_suffix_sees_trailing_extensions():
    """_cptp-M/_cpe-M followed by later-order extension fields (fl/pk/ad/cd)
    must still group with its sweep siblings (round-4 advisor)."""
    rep = _load('cptp_report', os.path.join(REPO, 'scripts',
                                            'cptp_report.py'))
    base = 'students_K-500_D-30_bs-32_epk-600_lr-0.001_bta-0.25_ema-True' \
           '_gma-0.99_sd-1-_dcr-0.1_sov-100'
    assert rep.split_m(base + '_cptp-2') == (base, 2)
    assert rep.split_m(base + '_cptp-2_pk-3') == (base + '_pk-3', 2)
    assert rep.split_m(base + '_cpe-3_pk-3') == (base + '_pk-3', 3)
    assert rep.split_m(base + '_cptp-2_ad-fused_cd-bf16') \
        == (base + '_ad-fused_cd-bf16', 2)
    assert rep.split_m(base + '_pk-3') == (base + '_pk-3', 0)
    # a dataset NAME containing 'cpe-2' style text must not be peeled
    assert rep.split_m(base + '_cptp-2_fl-rank1')[1] == 2
