"""Joint-code CPTs (--cpt-parents): stage-2 tables conditioned on each
variable's code AND the observed values of its highest-MI partner variables.

The conditioning set {code_v(x_-v), y_parents(v)} is a function of x_-v
only, so the pseudo-log-likelihood stays a legal PLL (no leakage of y_v
into its own conditioning).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pgmvae_tpu.driver import ExperimentConfig, run_experiment
from pgmvae_tpu.gibbs import (conditional_marginal_log_likelihood,
                              get_probability)
from pgmvae_tpu.models import VqVaeConfig, vqvae
from pgmvae_tpu.stage2 import Stage2, select_parents
from pgmvae_tpu.train import Trainer


def _chain_data(n=6, n_samples=2000, seed=0):
    """y_v strongly depends on y_{v-1} (flip prob 0.1): parent of v should
    be v-1 or v+1 (the two MI-maximal partners)."""
    rng = np.random.default_rng(seed)
    y = np.zeros((n_samples, n), np.float32)
    y[:, 0] = rng.integers(0, 2, n_samples)
    for v in range(1, n):
        flip = rng.random(n_samples) < 0.1
        y[:, v] = np.where(flip, 1 - y[:, v - 1], y[:, v - 1])
    return y


def test_select_parents_finds_chain_neighbors():
    y = _chain_data()
    par = select_parents(y, 1)
    assert par.shape == (6, 1)
    for v in range(6):
        assert par[v, 0] in (v - 1, v + 1), (v, par[v, 0])
        assert par[v, 0] != v


def test_counts_match_naive_oracle():
    y = _chain_data(n=5, n_samples=300)
    cfg = VqVaeConfig(n_var=5, units=(4, 3), dim=2, num_codes=4,
                      quantizer='ema')
    tr = Trainer(cfg, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, epochs=1, key=jax.random.PRNGKey(1))
    cb = tr.codebook(st)
    par = select_parents(y, 2)
    s2 = Stage2(cfg, chunk=64, parents=par)
    n1, n0 = s2.counts(st.params, cb, y)
    assert n1.shape == (5, 4, 4)

    codes = np.asarray(vqvae.encode_codes(st.params, cb, jnp.asarray(y), cfg))
    n1_ref = np.zeros((5, 4, 4))
    n0_ref = np.zeros((5, 4, 4))
    for b in range(len(y)):
        for v in range(5):
            j = int(y[b, par[v, 0]]) + 2 * int(y[b, par[v, 1]])
            if y[b, v] == 1:
                n1_ref[v, codes[v, b], j] += 1
            else:
                n0_ref[v, codes[v, b], j] += 1
    np.testing.assert_array_equal(n1, n1_ref)
    np.testing.assert_array_equal(n0, n0_ref)
    # marginalizing the parent axis must recover the plain counts
    p1, p0 = Stage2(cfg, chunk=64).counts(st.params, cb, y)
    np.testing.assert_array_equal(n1.sum(-1), p1)
    np.testing.assert_array_equal(n0.sum(-1), p0)


def test_parents_improve_pll_on_dependent_data():
    y = _chain_data(n_samples=3000, seed=3)
    cfg = VqVaeConfig(n_var=6, units=(5, 4), dim=2, num_codes=4,
                      quantizer='ema')
    tr = Trainer(cfg, 0.01, 128, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, epochs=2, key=jax.random.PRNGKey(1))
    cb = tr.codebook(st)

    s2_plain = Stage2(cfg)
    d0 = s2_plain.cpt(st.params, cb, y)
    pll0 = s2_plain.pseudo_log_likelihood(st.params, cb, y, d0)

    s2_par = Stage2(cfg, parents=select_parents(y, 1))
    d1 = s2_par.cpt(st.params, cb, y)
    pll1 = s2_par.pseudo_log_likelihood(st.params, cb, y, d1)
    # chain data: knowing one neighbor is worth ~log 2 per variable
    assert pll1 > pll0 + 0.5, (pll0, pll1)


def test_get_probability_and_cmll_with_parents():
    y = _chain_data(n=6, n_samples=500, seed=4)
    cfg = VqVaeConfig(n_var=6, units=(5, 4), dim=2, num_codes=4,
                      quantizer='ema')
    tr = Trainer(cfg, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, epochs=1, key=jax.random.PRNGKey(1))
    cb = tr.codebook(st)
    par = select_parents(y, 1)
    s2 = Stage2(cfg, parents=par)
    dist = s2.cpt(st.params, cb, y)

    # manual check: prb must equal the CPT cell for the observed parent value
    fts = jnp.asarray([0, 3], jnp.int32)
    prb = np.asarray(get_probability(
        st.params, cb, cfg, jnp.asarray(dist, jnp.float32),
        jnp.asarray(y[:8]), fts, parents=jnp.asarray(par)))
    codes = np.asarray(vqvae.encode_codes(st.params, cb,
                                          jnp.asarray(y[:8]), cfg))
    for i, v in enumerate([0, 3]):
        for b in range(8):
            j = int(y[b, par[v, 0]])
            np.testing.assert_allclose(prb[i, b],
                                       dist[v, codes[v, b], j], rtol=1e-6)

    cmll = conditional_marginal_log_likelihood(
        st.params, cb, cfg, dist, y[:64], p1=2, num_smp=60, burn_in=10,
        key=jax.random.PRNGKey(0), parents=par)
    assert np.isfinite(cmll) and cmll < 0


def test_cpt_parents_eval_posthoc_matches_retrain():
    """--cpt-parents-eval: one training, per-M stage-2 records. With no
    select-on-valid, a cpe-M number must be BIT-identical to a from-scratch
    cptp-M cell (stage-1 training is independent of M)."""
    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True, seed=0, units=(8, 6))
    combo = run_experiment(ExperimentConfig(**base, cpt_parents_eval=(1, 2)))
    # the primary record is the plain cell: no cpe suffix in its identifier
    assert 'cpe' not in combo['identifier']
    ph = {r['identifier'].rsplit('cpe-', 1)[1]: r for r in combo['posthoc']}
    assert set(ph) == {'1', '2'}
    assert all(r['posthoc_of'] == combo['identifier']
               for r in combo['posthoc'])

    retrained = run_experiment(ExperimentConfig(**base, cpt_parents=2))
    assert ph['2']['pll_test'] == retrained['pll_test']
    assert ph['2']['pll_train'] == retrained['pll_train']
    assert ph['2']['pll_valid'] == retrained['pll_valid']

    # cpe identifiers round-trip through the verified parser
    from pgmvae_tpu.utils.logging import parse_identifier
    kw = parse_identifier(ph['1']['identifier'])
    assert kw['cpt_parents_eval'] == (1,)
    assert ExperimentConfig(**kw).identifier == ph['1']['identifier']


def test_driver_cpt_parents_end_to_end(tmp_path):
    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True, seed=0, units=(8, 6))
    plain = run_experiment(ExperimentConfig(**base))
    path = str(tmp_path / 'm.ckpt')
    rich = run_experiment(ExperimentConfig(**base, cpt_parents=2,
                                           checkpoint=path))
    assert rich['identifier'].endswith('cptp-2')
    # richer tables fit the train split better on real data — up to the
    # per-cell 0.8 smoothing, which dilutes finer joint cells slightly, so
    # allow a small tolerance rather than asserting strict improvement
    assert rich['pll_train'] > plain['pll_train'] - 0.05
    assert np.isfinite(rich['pll_test'])

    # serving roundtrip: per-sample scores must average to the split PLL
    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.serving import PgmModel
    model = PgmModel.from_checkpoint(path)
    assert model.parents is not None
    y_test = load_split('nltcs', 'test')
    np.testing.assert_allclose(model.score(y_test).mean(),
                               rich['pll_test'], atol=5e-3)


def test_pll_detail_sums_to_scalar():
    """Stage2.pll_detail: the per-variable vector is an exact decomposition
    of the split PLL (it is what cpt_parents_mix selects on)."""
    y = _chain_data(n=5, n_samples=400, seed=7)
    cfg = VqVaeConfig(n_var=5, units=(4, 3), dim=2, num_codes=4,
                      quantizer='ema')
    tr = Trainer(cfg, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, epochs=1, key=jax.random.PRNGKey(1))
    cb = tr.codebook(st)
    for parents in (None, select_parents(y, 2)):
        s2 = Stage2(cfg, chunk=64, parents=parents)
        dist = s2.cpt(st.params, cb, y)
        scalar, per_var = s2.pll_detail(st.params, cb, y, dist)
        assert per_var.shape == (5,)
        np.testing.assert_allclose(per_var.sum(), scalar, rtol=1e-12)
        assert scalar == s2.pseudo_log_likelihood(st.params, cb, y, dist)


def test_cpt_parents_mix_record():
    """--cpt-parents-mix: the mixed record's valid PLL dominates every
    global candidate (per-variable argmax on valid), its selection
    histogram covers all variables, and the cpm identifier round-trips."""
    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True, seed=0, units=(8, 6))
    res = run_experiment(ExperimentConfig(**base, cpt_parents_eval=(1, 2),
                                          cpt_parents_mix=True))
    mixes = [r for r in res['posthoc'] if r['identifier'].endswith('_cpm')]
    assert len(mixes) == 1
    mix = mixes[0]
    assert mix['identifier'].endswith('_cpe-1.2_cpm')
    # candidate set = {primary M=0} + the eval list
    assert mix['mix_candidates'] == [0, 1, 2]
    assert sum(mix['mix_m_histogram'].values()) == 16   # nltcs n_var
    # per-variable argmax on valid dominates every global candidate
    cand_valid = [res['pll_valid']] + [
        r['pll_valid'] for r in res['posthoc']
        if not r['identifier'].endswith('_cpm')]
    assert mix['pll_valid'] >= max(cand_valid) - 1e-12
    assert np.isfinite(mix['pll_test']) and np.isfinite(mix['pll_train'])
    # the per-M cpe records are unchanged by the mix flag (no cpm suffix)
    assert {r['identifier'].rsplit('cpe-', 1)[1]
            for r in res['posthoc'] if not r['identifier'].endswith('_cpm')
            } == {'1', '2'}

    from pgmvae_tpu.utils.logging import parse_identifier
    kw = parse_identifier(mix['identifier'])
    assert kw['cpt_parents_mix'] is True
    assert kw['cpt_parents_eval'] == (1, 2)
    assert ExperimentConfig(**kw).identifier == mix['identifier']


def test_compose_mixed_cpt_matches_per_m_lookup():
    """compose_mixed_cpt: the composed uniform-width table must give every
    variable EXACTLY its own winner-M conditional through the Gibbs lookup
    (the padded parent bits are inert by construction), and an all-M=0
    selection must return the plain table untouched."""
    from pgmvae_tpu.stage2 import compose_mixed_cpt
    y = _chain_data(n=6, n_samples=400, seed=8)
    cfg = VqVaeConfig(n_var=6, units=(5, 4), dim=2, num_codes=4,
                      quantizer='ema')
    tr = Trainer(cfg, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, epochs=1, key=jax.random.PRNGKey(1))
    cb = tr.codebook(st)

    dists, parents = {}, {}
    for m in (0, 1, 2):
        par = select_parents(y, m) if m else None
        dists[m] = Stage2(cfg, chunk=64, parents=par).cpt(st.params, cb, y)
        parents[m] = par
    sel_ms = np.array([0, 1, 2, 2, 1, 0], np.int32)
    mdist, mpar = compose_mixed_cpt(dists, parents, sel_ms)
    assert mdist.shape == (6, 4, 4) and mpar.shape == (6, 2)

    yb = jnp.asarray(y[:32])
    fts_all = jnp.arange(6, dtype=jnp.int32)
    prb_mix = np.asarray(get_probability(
        st.params, cb, cfg, jnp.asarray(mdist, jnp.float32), yb, fts_all,
        parents=jnp.asarray(mpar)))
    for m in (0, 1, 2):
        idx = np.where(sel_ms == m)[0]
        prb_m = np.asarray(get_probability(
            st.params, cb, cfg, jnp.asarray(dists[m], jnp.float32), yb,
            jnp.asarray(idx, jnp.int32),
            parents=None if m == 0 else jnp.asarray(parents[m])))
        np.testing.assert_allclose(prb_mix[idx], prb_m, rtol=1e-6)

    # the composed table runs through the full CMLL chain
    cmll = conditional_marginal_log_likelihood(
        st.params, cb, cfg, mdist, y[:64], p1=2, num_smp=60, burn_in=10,
        key=jax.random.PRNGKey(0), parents=mpar)
    assert np.isfinite(cmll) and cmll < 0

    d0, p0 = compose_mixed_cpt(dists, parents, np.zeros(6, np.int32))
    assert p0 is None
    np.testing.assert_array_equal(d0, dists[0])


def test_mix_cmll_wiring(monkeypatch):
    """--cmll + --cpt-parents-mix: the mix record must carry a CMLL computed
    from the composed mixture tables (exactly two CMLL calls per cell: the
    base table and the composed one)."""
    import pgmvae_tpu.gibbs as gibbs
    calls = []

    def fake_cmll(params, codebook, cfg, dist, x, p1, num_smp, burn_in,
                  key=None, verbose=False, parents=None):
        calls.append((np.asarray(dist).shape,
                      None if parents is None else np.asarray(parents).shape,
                      p1, num_smp, burn_in))
        return -1.234
    monkeypatch.setattr(gibbs, 'conditional_marginal_log_likelihood',
                        fake_cmll)

    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True, seed=0, units=(8, 6))
    res = run_experiment(ExperimentConfig(**base, cmll=True,
                                          cpt_parents_eval=(1, 2),
                                          cpt_parents_mix=True))
    assert len(calls) == 2 and res['cmll_test'] == -1.234
    mix = [r for r in res['posthoc'] if r['identifier'].endswith('_cpm')][0]
    assert mix['cmll_test'] == -1.234 and 'cmll_wall' in mix
    # per-M cpe records keep the reference's CMLL-off sentinel
    assert all(r['cmll_test'] == 1 for r in res['posthoc']
               if not r['identifier'].endswith('_cpm'))
    # base call saw the plain [n, K] table; the mix call's table width and
    # parent slots agree with the recorded selection
    dist_shape, par_shape, p1, num_smp, burn_in = calls[-1]
    assert (p1, num_smp, burn_in) == (1, 3000, 150)
    m_max = mix['cmll_m_max']
    assert m_max == max(int(k) for k, c in mix['mix_m_histogram'].items()
                        if c)
    if m_max == 0:
        assert dist_shape == (16, 8) and par_shape is None
    else:
        assert dist_shape == (16, 8, 1 << m_max)
        assert par_shape == (16, m_max)
    assert calls[0][0] == (16, 8) and calls[0][1] is None


def test_mix_checkpoint_serves(tmp_path):
    """--checkpoint + --cpt-parents-mix: the composed mixture is saved to
    `<checkpoint>.mix` and serving.PgmModel deploys it — per-sample scores
    must average to the mix record's test PLL."""
    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.serving import PgmModel
    base = dict(name='nltcs', embedding=8, dim=4, batch=512, epoch=1,
                rate=0.01, ema=True, seed=0, units=(8, 6))
    path = str(tmp_path / 'm.ckpt')
    res = run_experiment(ExperimentConfig(**base, cpt_parents_eval=(1, 2),
                                          cpt_parents_mix=True,
                                          checkpoint=path))
    mix = [r for r in res['posthoc'] if r['identifier'].endswith('_cpm')][0]
    assert mix['checkpoint'] == path + '.mix'
    model = PgmModel.from_checkpoint(path + '.mix')
    y_test = load_split('nltcs', 'test')
    np.testing.assert_allclose(model.score(y_test).mean(),
                               mix['pll_test'], atol=5e-3)
    # the base checkpoint still serves the primary (M=0) model
    plain = PgmModel.from_checkpoint(path)
    np.testing.assert_allclose(plain.score(y_test).mean(),
                               res['pll_test'], atol=5e-3)


def test_cpt_parents_mix_requires_eval():
    import pytest
    with pytest.raises(ValueError, match='cpt_parents_mix'):
        ExperimentConfig(name='nltcs', embedding=8, dim=4,
                         cpt_parents_mix=True)


def test_cptp_report_groups_mix_records():
    """scripts/cptp_report.py: a cpm record lands in the same sweep group
    as its cpe siblings, labeled M='mix'."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'cptp_report', os.path.join(os.path.dirname(__file__), '..',
                                    'scripts', 'cptp_report.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    base = 'nltcs_K-8_D-4_bs-512_epk-1_lr-0.01_bta-0.25_ema-True_gma-0.99_sd-0-'
    assert mod.split_m(base + '_cpe-3') == (base, 3)
    assert mod.split_m(base + '_cpe-1.2.3_cpm') == (base, 'mix')
    assert mod.split_m(base + '_cptp-2') == (base, 2)
    assert sorted([2, 'mix', 0, 1], key=mod._mkey) == [0, 1, 2, 'mix']


# ------------------------------------------------- wide-table scatter path

def test_scatter_counts_bit_equal_einsum():
    """Counting paths: the scatter-add used past SCATTER_COLS of joint
    width must reproduce the one-hot einsum bit-for-bit (counts are
    integers < 2^24, exact in f32 under any accumulation order)."""
    y = _chain_data(n=5, n_samples=333, seed=4)   # ragged vs chunk=64
    cfg = VqVaeConfig(n_var=5, units=(4, 3), dim=2, num_codes=4,
                      quantizer='ema')
    tr = Trainer(cfg, 0.01, 64, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, epochs=1, key=jax.random.PRNGKey(1))
    cb = tr.codebook(st)
    par = select_parents(y, 3)
    e1, e0 = Stage2(cfg, chunk=64, parents=par,
                    scatter=False).counts(st.params, cb, y)
    s1, s0 = Stage2(cfg, chunk=64, parents=par,
                    scatter=True).counts(st.params, cb, y)
    np.testing.assert_array_equal(e1, s1)
    np.testing.assert_array_equal(e0, s0)
    # and with no parents at all (plain [n, K] tables)
    e1, e0 = Stage2(cfg, chunk=64, scatter=False).counts(st.params, cb, y)
    s1, s0 = Stage2(cfg, chunk=64, scatter=True).counts(st.params, cb, y)
    np.testing.assert_array_equal(e1, s1)
    np.testing.assert_array_equal(e0, s0)


def test_scatter_auto_selected_past_threshold():
    from pgmvae_tpu.stage2 import SCATTER_COLS
    y = _chain_data(n=5, n_samples=64, seed=5)
    cfg = VqVaeConfig(n_var=5, units=(4, 3), dim=2, num_codes=1024,
                      quantizer='ema')
    par = select_parents(y, 4)              # 1024 * 16 columns > 8192
    assert Stage2(cfg, parents=par).scatter is True
    assert Stage2(cfg).scatter is False     # 1024 <= SCATTER_COLS
    assert SCATTER_COLS == 8192


def test_joint_table_byte_guard():
    """A joint table whose two f32 count buffers cannot fit on-chip must
    refuse loudly at Stage2 construction, before any training."""
    import pytest
    y = _chain_data(n=6, n_samples=64, seed=6)
    cfg = VqVaeConfig(n_var=1024, units=(4, 3), dim=2, num_codes=65536,
                      quantizer='ema')
    par = np.zeros((1024, 12), np.int32)    # 65536 * 4096 cols -> 2 TiB
    with pytest.raises(ValueError, match='GiB'):
        Stage2(cfg, parents=par)
    with pytest.raises(ValueError, match=r'\[1, 12\]'):
        Stage2(cfg, parents=np.zeros((1024, 13), np.int32))
