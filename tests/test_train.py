"""Training-engine tests: ragged-batch masking, quantizer-mode state
handling, loss composition and convergence."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from pgmvae_tpu.models import VqVaeConfig
from pgmvae_tpu.train import Trainer

CFG = VqVaeConfig(n_var=6, units=(5, 4), dim=3, num_codes=7, cost=0.25,
                  decay=0.9, quantizer='ema')


def _data(n=37, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(n, CFG.n_var)).astype(np.float32)


def test_padded_rows_do_not_affect_training():
    """An epoch over N=37 with bs=8 (ragged) must equal manually feeding the
    same 5 batches with explicit weights."""
    y = _data(37)
    tr = Trainer(CFG, 0.01, 8, 37)
    state = tr.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    state_a, _ = tr.run_epoch(state, jnp.asarray(y), key)

    # replay: same permutation, explicit batches
    state_b = tr.init_state(jax.random.PRNGKey(0))
    perm = np.asarray(jax.random.permutation(key, 37))
    step = jax.jit(tr.train_step)
    for i in range(5):
        idx = perm[i * 8:(i + 1) * 8]
        if len(idx) < 8:
            w = np.concatenate([np.ones(len(idx)), np.zeros(8 - len(idx))])
            idx = np.concatenate([idx, np.zeros(8 - len(idx), np.int64)])
        else:
            w = np.ones(8)
        yb = jnp.asarray(y[idx])
        state_b, _ = step(state_b, yb, jnp.asarray(w, jnp.float32))

    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_a.ema.codebook),
                               np.asarray(state_b.ema.codebook),
                               rtol=1e-5, atol=1e-6)


def test_mask_weight_zero_rows_are_inert():
    """A batch with trailing zero-weight garbage rows must produce the same
    update as the clean half-batch."""
    y = _data(16, seed=1)
    tr = Trainer(CFG, 0.01, 8, 16)
    s0 = tr.init_state(jax.random.PRNGKey(1))
    step = jax.jit(tr.train_step)

    clean = jnp.asarray(y[:4])
    padded = jnp.asarray(np.concatenate([y[:4], 123.0 * np.ones((4, CFG.n_var),
                                                                np.float32)]))
    s_clean, m_clean = step(s0, jnp.concatenate([clean, clean]),
                            jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32))
    s_pad, m_pad = step(s0, padded,
                        jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32))
    np.testing.assert_allclose(float(m_clean.loss), float(m_pad.loss),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_clean.params),
                    jax.tree.leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_quantizer_mode_state_layout():
    y = _data()
    # ema: codebook lives in EmaState, not in params
    tr = Trainer(CFG, 0.01, 8, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    assert 'codebook' not in st.params and st.ema is not None
    assert tr.codebook(st).shape == (6, 3, 7)
    # vq: codebook is an Adam-trained param
    tr2 = Trainer(CFG._replace(quantizer='vq'), 0.01, 8, len(y))
    st2 = tr2.init_state(jax.random.PRNGKey(0))
    assert 'codebook' in st2.params and st2.ema is None
    cb_before = np.asarray(st2.params['codebook']).copy()  # state is donated
    st2b, _ = tr2.run_epoch(st2, jnp.asarray(y), jax.random.PRNGKey(1))
    assert not np.allclose(cb_before, np.asarray(st2b.params['codebook'])), \
        'vq codebook must receive gradient updates'
    # naive: no codebook at all
    tr3 = Trainer(CFG._replace(quantizer='naive'), 0.01, 8, len(y))
    st3 = tr3.init_state(jax.random.PRNGKey(0))
    assert tr3.codebook(st3) is None and st3.ema is None
    tr3.run_epoch(st3, jnp.asarray(y), jax.random.PRNGKey(1))


def test_loss_decreases():
    y = _data(128, seed=5)
    tr = Trainer(CFG, 0.005, 32, len(y))
    st = tr.init_state(jax.random.PRNGKey(2))
    st, hist = tr.fit(st, y, 30, jax.random.PRNGKey(2), log_fn=lambda e, m: None)
    assert hist[-1].loss < hist[0].loss * 0.9
    assert hist[-1].mse < 0.25  # better than predicting 0.5 everywhere
    assert int(st.step) == 30 * 4


def test_fixed_seed_is_deterministic():
    """Same seed -> bit-identical trained params and codebook (mirrors the
    reference's full seeding at run.py:34-37; here via counter-based PRNG)."""
    y = _data(40, seed=9)

    def train():
        tr = Trainer(CFG, 0.01, 16, len(y))
        st = tr.init_state(jax.random.PRNGKey(11))
        st, _ = tr.fit(st, y, 3, jax.random.PRNGKey(11))
        return st, tr.codebook(st)

    (s1, c1), (s2, c2) = train(), train()
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_dead_code_restarts_fire_during_epoch():
    """With an impossible usage threshold every code restarts each step, so
    the trained codebook must differ from the no-restart run and consist of
    actual encoder latents."""
    y = _data(32, seed=3)
    base = Trainer(CFG, 0.01, 16, len(y))
    st0 = base.init_state(jax.random.PRNGKey(1))
    st_a, _ = base.run_epoch(st0, jnp.asarray(y), jax.random.PRNGKey(2))

    cfg = CFG._replace(dead_code_threshold=1e9)
    tr = Trainer(cfg, 0.01, 16, len(y))
    st0 = tr.init_state(jax.random.PRNGKey(1))
    st_b, m = tr.run_epoch(st0, jnp.asarray(y), jax.random.PRNGKey(2))
    assert np.isfinite(float(m.loss))
    assert not np.allclose(np.asarray(base.codebook(st_a)),
                           np.asarray(tr.codebook(st_b)))


def test_ema_codebook_update_is_pure_ema():
    """In EMA mode the codebook after one train step must be EXACTLY the
    ema_update of the pre-step statistics — Adam must not touch it
    (reference assigns it in-forward with zero grads,
    core/quantizer.py:151-156)."""
    from pgmvae_tpu.models import encode
    from pgmvae_tpu.ops import quantizer as q

    y = _data(16, seed=7)
    tr = Trainer(CFG, 0.01, 16, len(y))
    st = tr.init_state(jax.random.PRNGKey(3))
    z = encode(st.params, jnp.asarray(y))
    idx = q.vq_codes(z, st.ema.codebook)
    counts, dw = q.code_stats(z, idx, CFG.num_codes)
    expected = q.ema_update(st.ema, counts, dw, CFG.decay, CFG.epsilon,
                            CFG.zero_debias)
    st2, _ = jax.jit(tr.train_step)(st, jnp.asarray(y),
                                    jnp.ones(16, jnp.float32))
    np.testing.assert_allclose(np.asarray(st2.ema.codebook),
                               np.asarray(expected.codebook),
                               rtol=1e-5, atol=1e-6)


def test_fit_always_returns_history():
    """fit must return per-epoch metrics even without verbose/log_fn
    (collected async, fetched once at the end)."""
    y = _data(32, seed=5)
    tr = Trainer(CFG, 0.01, 16, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, hist = tr.fit(st, y, epochs=3, key=jax.random.PRNGKey(1))
    assert len(hist) == 3
    assert all(isinstance(h.loss, float) and np.isfinite(h.loss)
               for h in hist)


def test_naive_large_dim_skips_perplexity():
    """quantizer='naive' with dim=20 means 2^20 codes; the train step must
    not allocate a [n_var, B, 2^dim] histogram (it reports perplexity=0)."""
    cfg = CFG._replace(quantizer='naive', dim=20)
    y = _data(16, seed=6)
    tr = Trainer(cfg, 0.01, 16, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, m = tr.run_epoch(st, jnp.asarray(y), jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert float(m.perplexity) == 0.0


def test_naive_small_dim_perplexity_histogram():
    """Small naive code spaces still report usage perplexity (scatter-add
    histogram path)."""
    cfg = CFG._replace(quantizer='naive', dim=3)
    y = _data(16, seed=6)
    tr = Trainer(cfg, 0.01, 16, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, m = tr.run_epoch(st, jnp.asarray(y), jax.random.PRNGKey(1))
    assert 1.0 <= float(m.perplexity) <= 2 ** 3


def test_streaming_fit_matches_incore():
    """The out-of-core streaming path (host-chunked epochs) must produce
    bit-identical training to the device-resident path: same permutation,
    same padding, same per-step math (reference run.py:53's '>4G' TODO,
    answered)."""
    y = _data(100, seed=9)
    a = Trainer(CFG, 0.01, 16, len(y))
    st_a = a.init_state(jax.random.PRNGKey(0))
    st_a, hist_a = a.fit(st_a, y, epochs=2, key=jax.random.PRNGKey(3))

    # stream_bytes=1 forces streaming; chunk=4 of 7 steps/epoch exercises the
    # ragged remainder chunk
    b = Trainer(CFG, 0.01, 16, len(y), stream_bytes=1,
                stream_chunk_bytes=4 * 16 * CFG.n_var * 4)
    st_b = b.init_state(jax.random.PRNGKey(0))
    st_b, hist_b = b.fit(st_b, y, epochs=2, key=jax.random.PRNGKey(3))

    for pa, pb in zip(jax.tree.leaves(st_a.params),
                      jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_a.ema.codebook),
                               np.asarray(st_b.ema.codebook),
                               rtol=1e-6, atol=1e-7)
    for ha, hb in zip(hist_a, hist_b):
        np.testing.assert_allclose(ha.loss, hb.loss, rtol=1e-5)


def test_epoch_blocks_match_per_epoch_runs():
    """fit's silent path (multi-epoch scan blocks, run_epochs) must be
    bit-identical to the per-epoch run_epoch loop: same fold_in(key, e)
    schedule, same state, same per-epoch metrics."""
    y = _data(37, seed=3)
    key = jax.random.PRNGKey(7)

    tr_a = Trainer(CFG, 0.01, 8, 37)
    state_a = tr_a.init_state(jax.random.PRNGKey(2))
    data = jnp.asarray(y)
    metrics_a = []
    for e in range(5):
        state_a, m = tr_a.run_epoch(state_a, data,
                                    jax.random.fold_in(key, e))
        metrics_a.append(jax.tree.map(float, jax.device_get(m)))

    tr_b = Trainer(CFG, 0.01, 8, 37)
    state_b = tr_b.init_state(jax.random.PRNGKey(2))
    state_b, history = tr_b.fit(state_b, y, epochs=5, key=key)

    assert len(history) == 5
    for ma, mb in zip(metrics_a, history):
        np.testing.assert_allclose(ma.loss, mb.loss, rtol=1e-6)
        np.testing.assert_allclose(ma.mse, mb.mse, rtol=1e-6)
        np.testing.assert_allclose(ma.mae, mb.mae, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(state_a.ema.codebook),
                               np.asarray(state_b.ema.codebook),
                               rtol=1e-6, atol=1e-7)


def test_run_epochs_block_decomposition():
    """run_epochs decomposes any epoch count into power-of-two blocks and
    returns per-epoch metrics for all of them."""
    y = _data(20, seed=4)
    tr = Trainer(CFG, 0.01, 8, 20)
    st = tr.init_state(jax.random.PRNGKey(0))
    st, ms = tr.run_epochs(st, jnp.asarray(y), jax.random.PRNGKey(1), 0, 11)
    ms = jax.device_get(ms)
    assert ms.loss.shape == (11,)
    assert np.all(np.isfinite(ms.loss))


def test_fit_start_epoch_chunks_bitwise_match_single_fit():
    """fit(epochs=a) then fit(epochs=b, start_epoch=a) must reproduce one
    fit(epochs=a+b) exactly (same fold_in(key, e) schedule) — the contract
    the driver's select-on-valid block training relies on."""
    y = _data(41, seed=5)
    key = jax.random.PRNGKey(11)

    tr = Trainer(CFG, 0.01, 8, 41)
    st_one = tr.init_state(jax.random.PRNGKey(3))
    st_one, _ = tr.fit(st_one, y, epochs=6, key=key)

    st_chunk = tr.init_state(jax.random.PRNGKey(3))
    st_chunk, _ = tr.fit(st_chunk, y, epochs=2, key=key)
    st_chunk, _ = tr.fit(st_chunk, y, epochs=3, key=key, start_epoch=2)
    st_chunk, _ = tr.fit(st_chunk, y, epochs=1, key=key, start_epoch=5)

    for a, b in zip(jax.tree.leaves((st_one.params, st_one.ema)),
                    jax.tree.leaves((st_chunk.params, st_chunk.ema))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_driver_select_on_valid_picks_best_epoch():
    """select_on_valid keeps the snapshot with the best valid PLL: the
    reported pll_valid must be the max over the periodic evals, and
    best_epoch must identify it."""
    from pgmvae_tpu.driver import ExperimentConfig, run_experiment

    base = dict(name='nltcs', embedding=20, dim=6, batch=256, epoch=6,
                rate=0.01, ema=True, seed=0, note='seltest')
    plain = run_experiment(ExperimentConfig(**base))
    sel = run_experiment(ExperimentConfig(**base, select_on_valid=2))

    assert 'best_epoch' not in plain
    assert sel['best_epoch'] in (2, 4, 6)
    # the selected snapshot can only improve on (or match) the final epoch
    assert sel['pll_valid'] >= plain['pll_valid'] - 1e-9
    # identifier records the knob (no joblog aliasing)
    assert 'sov-2' in sel['identifier'] and 'sov' not in plain['identifier']


def test_execution_cap_env_overrides():
    """The watchdog segmentation caps must be env-var tunable (deployments
    without the remote worker's per-execution watchdog raise them)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, '-c',
         'import jax; jax.config.update("jax_platforms", "cpu")\n'
         'from pgmvae_tpu.train import Trainer\n'
         'from pgmvae_tpu import gibbs\n'
         'print(Trainer.MAX_STEPS_PER_EXECUTION, gibbs._SEGMENT_STEPS)'],
        env={**os.environ, 'PGMVAE_MAX_STEPS_PER_EXECUTION': '99999',
             'PGMVAE_GIBBS_SEGMENT_STEPS': '12345'},
        capture_output=True, text=True, timeout=300)
    assert out.stdout.split() == ['99999', '12345'], out.stderr[-500:]
