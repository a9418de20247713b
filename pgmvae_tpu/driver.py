"""Experiment driver: one (dataset x hyperparameters) cell, end to end.

This is the programmatic core behind both the CLI (`run.py`, the reference
`run.py` semantics) and the sweep runner (`run_pipeline.py`, replacing the
reference's GNU-parallel `batch-job.sh` grids). Returns a plain dict so
sweep joblogs can serialize results directly.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple



@dataclasses.dataclass
class ExperimentConfig:
    name: str
    embedding: int                      # K
    dim: int                            # D
    batch: int = 128
    epoch: int = 200
    rate: float = 0.001
    cost: float = 0.25
    ema: bool = False
    decay: float = 0.99
    seed: int = 0
    note: str = ''
    quantizer: Optional[str] = None     # override; default from `ema`
    units: Optional[Tuple[int, ...]] = None
    mesh_data: int = 1
    mesh_model: int = 1
    zero_debias: bool = True
    dead_code_threshold: float = 0.0   # >0: EMA dead-code restarts
    fan_mode: str = 'tf_stacked'    # init fan semantics (see initializers)
    activation: str = 'selu'
    l2_reg: float = 0.0
    vq_impl: str = 'auto'
    precision: str = 'default'
    cmll: bool = False
    select_on_valid: int = 0   # >0: evaluate valid PLL every N epochs and
    #                            keep the best snapshot (anti-overfit; the
    #                            reference always uses the final epoch)
    cpt_parents: int = 0   # >0: joint-code CPTs — condition each variable's
    #                        stage-2 table on the values of its m highest-MI
    #                        partner variables as well as its code
    #                        (stage2.select_parents); 0 = reference semantics
    cpt_parents_eval: Tuple[int, ...] = ()  # extra parent counts evaluated
    #                        POST-HOC on the trained (and, with
    #                        select_on_valid, M=cpt_parents-selected) state:
    #                        stage-1 training is independent of M, so one
    #                        training yields one stage-2 record per listed M
    #                        (identifier suffix cpe-M) — an S-way cheaper
    #                        sweep than a --cpt-parents grid. With
    #                        select_on_valid == 0 a cpe-M number is
    #                        bit-identical to a from-scratch cptp-M cell
    #                        (tests/test_cpt_parents.py); with selection the
    #                        snapshot is picked on the PRIMARY M's valid PLL
    cpt_parents_mix: bool = False  # with cpt_parents_eval: also emit ONE
    #                        mixed stage-2 record where EACH VARIABLE picks
    #                        its own M — from the candidate set
    #                        {cpt_parents} + cpt_parents_eval — by its
    #                        per-variable VALIDATION PLL contribution (PLL
    #                        is a sum of per-variable terms, so the mixture
    #                        is a legal PLL; the global winner-M is the
    #                        special case where every variable agrees).
    #                        Identifier flag cpm; selection ties break to
    #                        the smaller M
    first_layer: str = 'masked'  # first-encoder-layer implementation
    #                        ('masked' | 'rank1' | 'auto'; models/vqvae.py)
    packed_seeds: int = 1  # >1: this cell was trained as one lane of an
    #                        S-seed vmapped device program (run_pipeline
    #                        --pack-seeds). Encoded in the identifier (pk-S)
    #                        because the packed program's different XLA
    #                        tiling changes f32 accumulation order: measured
    #                        sub-0.1-nat PLL shifts on most datasets, but a
    #                        basin flip on bistable ones (students: packed
    #                        -88.3 vs unpacked -150.4, logs/cmll-r3-rerun.out)
    adam_impl: str = 'optax'  # 'fused'/'pallas': single-pass Adam update
    #                        (ops/fused_adam.py) — same math, ~1 ULP/step
    #                        XLA-fusion drift vs optax, so identifier-encoded
    compute_dtype: str = 'f32'  # 'bf16': bfloat16 forward/backward with f32
    #                        master params/moments/EMA/stage-2 (see
    #                        VqVaeConfig.compute_dtype) — a different
    #                        trajectory, identifier-encoded as cd-bf16
    checkpoint: Optional[str] = None
    resume: Optional[str] = None
    data_dir: Optional[str] = None
    verbose: bool = False
    log_dir: Optional[str] = None       # JSONL metrics directory

    def __post_init__(self):
        # Fail BEFORE training, not after: Stage2 only sees M when stage 2
        # starts, so an out-of-range --cpt-parents-eval used to waste a full
        # training run (M too big) or silently evaluate M=0 under a
        # mislabeled, non-round-trippable cpe--1 identifier (M<0). Bounds
        # match Stage2.__init__ (2^M joint-state columns; M<=12 with the
        # byte guard there — past SCATTER_COLS the scatter path counts
        # without a one-hot, so wide tables are feasible).
        if not 0 <= self.cpt_parents <= 12:
            raise ValueError(f'cpt_parents must be in [0, 12], '
                             f'got {self.cpt_parents}')
        bad = [m for m in self.cpt_parents_eval if not 0 <= m <= 12]
        if bad:
            raise ValueError(f'cpt_parents_eval values must be in [0, 12], '
                             f'got {bad}')
        if self.cpt_parents_mix and not self.cpt_parents_eval:
            raise ValueError('cpt_parents_mix selects per-variable among '
                             'the cpt_parents_eval candidates; pass '
                             '--cpt-parents-eval too')

    @property
    def identifier(self) -> str:
        from pgmvae_tpu.utils.logging import run_identifier
        return run_identifier(self.name, self.embedding, self.dim, self.batch,
                              self.epoch, self.rate, self.cost, self.ema,
                              self.decay, self.seed, self.note,
                              quantizer=self.quantizer, units=self.units,
                              fan_mode=self.fan_mode,
                              dead_code_threshold=self.dead_code_threshold,
                              zero_debias=self.zero_debias,
                              precision=self.precision,
                              activation=self.activation, l2_reg=self.l2_reg,
                              select_on_valid=self.select_on_valid,
                              cpt_parents=self.cpt_parents,
                              first_layer=self.first_layer,
                              packed_seeds=self.packed_seeds,
                              adam_impl=self.adam_impl,
                              compute_dtype=self.compute_dtype,
                              cpt_parents_eval=self.cpt_parents_eval,
                              cpt_parents_mix=self.cpt_parents_mix)


def _check_naive_dim(quantizer: str, dim: int) -> None:
    """Refuse naive-quantizer dims whose stage-2 tables (2^dim columns)
    could never be tabulated — BEFORE training burns a full run (the same
    bound Stage2.__init__ enforces; reference bug context
    core/quantizer.py:179-201)."""
    from pgmvae_tpu.stage2 import NAIVE_STAGE2_MAX_DIM
    if quantizer == 'naive' and dim > NAIVE_STAGE2_MAX_DIM:
        raise ValueError(
            f"quantizer='naive' with dim={dim}: stage 2 counts over 2^dim "
            f"= 2**{dim} code columns per variable; use dim <= "
            f"{NAIVE_STAGE2_MAX_DIM} or a finite-codebook quantizer")


def _posthoc_cpt_records(exp, cfg, mesh_ctx, params, codebook, y_train,
                         y_valid, y_test, primary_id, platform,
                         stage2_by_m=None, state=None) -> list:
    """One stage-2 record per M in exp.cpt_parents_eval, computed from the
    already-trained `params` (see ExperimentConfig.cpt_parents_eval). Each
    record's cpe-M identifier regenerates its number by rerunning the cell
    with --cpt-parents-eval M; pass `stage2_by_m` to share the (per-dataset,
    per-M) Stage2 instances across packed seeds.

    With exp.cpt_parents_mix, ONE extra record (identifier = the cell's
    full cpe+cpm identifier) mixes the candidates per variable: each
    variable keeps the M whose VALIDATION PLL contribution is highest
    (Stage2.pll_detail; ties to the smaller M), and the mixed train/test
    PLLs are composed from the same selection — selection touches the
    validation split only. With exp.cmll as well, the mix record gets a
    real CMLL: the per-variable winner tables are composed into one
    uniform-width joint CPT (stage2.compose_mixed_cpt, exact) and run
    through the same Gibbs settings as the cell's own CMLL — the only way
    to CMLL a mixture, since no single --cpt-parents retrain realizes it.
    With exp.checkpoint (and `state` passed), the same composed tables are
    saved to `<checkpoint>.mix`, a standard checkpoint that
    serving.PgmModel can deploy directly — the mixture winner becomes a
    servable artifact, not just a joblog row."""
    import time as _time

    import numpy as np

    from pgmvae_tpu.stage2 import Stage2, select_parents

    splits = (('train', y_train), ('valid', y_valid), ('test', y_test))
    eval_ms = tuple(dict.fromkeys(exp.cpt_parents_eval))
    loop_ms = eval_ms
    if exp.cpt_parents_mix and exp.cpt_parents not in eval_ms:
        loop_ms = eval_ms + (exp.cpt_parents,)   # primary M is a candidate
    records, per_var = [], {}
    keep_tables = exp.cpt_parents_mix and (       # mix-CMLL / mix-checkpoint
        exp.cmll or (exp.checkpoint and state is not None))
    dists_by_m, parents_by_m = {}, {}
    for m in loop_ms:
        te = _time.time()
        if stage2_by_m is not None and m in stage2_by_m:
            s2m = stage2_by_m[m]
        else:
            par = select_parents(y_train, m) if m > 0 else None
            s2m = Stage2(cfg, mesh_ctx=mesh_ctx, parents=par)
            if stage2_by_m is not None:
                stage2_by_m[m] = s2m
        dist_m = s2m.cpt(params, codebook, y_train)
        if keep_tables:
            dists_by_m[m] = dist_m
            parents_by_m[m] = (None if s2m.parents is None else
                               np.asarray(s2m.parents)[:cfg.active_vars])
        pll_m = {}
        for split, y in splits:
            pll_m[split], pv = s2m.pll_detail(params, codebook, y, dist_m)
            per_var.setdefault(m, {})[split] = pv
        if m not in eval_ms:
            continue       # primary M: its record is the cell's own
        records.append({
            'identifier': dataclasses.replace(
                exp, cpt_parents_eval=(m,),
                cpt_parents_mix=False).identifier,
            'pll_train': pll_m['train'], 'pll_valid': pll_m['valid'],
            'pll_test': pll_m['test'], 'cmll_test': 1,
            'eval_wall': round(_time.time() - te, 3),
            'posthoc_of': primary_id,
            'platform': platform,
        })
    if exp.cpt_parents_mix:
        cands = sorted(per_var)                       # ascending: argmax's
        idx = np.arange(cfg.active_vars)              # first-hit tie rule
        stacked = {split: np.stack([per_var[m][split] for m in cands])
                   for split, _ in splits}            # [C, active_vars]
        sel = np.argmax(stacked['valid'], axis=0)
        mixed = {split: float(stacked[split][sel, idx].sum())
                 for split, _ in splits}
        records.append({
            'identifier': exp.identifier,     # full cpe list + cpm flag
            'pll_train': mixed['train'], 'pll_valid': mixed['valid'],
            'pll_test': mixed['test'], 'cmll_test': 1,
            'eval_wall': 0.0,                 # composed from the cpe passes
            'posthoc_of': primary_id,
            'platform': platform,
            'mix_candidates': cands,
            'mix_m_histogram': {str(cands[i]): int(c) for i, c in
                                enumerate(np.bincount(
                                    sel, minlength=len(cands)))
                                if c},
        })
        if keep_tables:
            import jax

            from pgmvae_tpu.stage2 import compose_mixed_cpt
            sel_ms = np.asarray(cands, np.int32)[sel]
            mdist, mpar = compose_mixed_cpt(dists_by_m, parents_by_m, sel_ms)
            if exp.cmll:
                from pgmvae_tpu.gibbs import (
                    conditional_marginal_log_likelihood)
                tcm = _time.time()
                # same Gibbs settings as the cell's own CMLL
                # (run_experiment's exp.cmll path; reference
                # core/model.py:110-148)
                records[-1]['cmll_test'] = (
                    conditional_marginal_log_likelihood(
                        params, codebook, cfg, mdist, y_test,
                        p1=max(y_test.shape[1] // 10, 1), num_smp=3000,
                        burn_in=150, key=jax.random.PRNGKey(exp.seed),
                        parents=mpar))
                records[-1]['cmll_wall'] = round(_time.time() - tcm, 3)
                records[-1]['cmll_m_max'] = int(sel_ms.max(initial=0))
            if exp.checkpoint and state is not None:
                from pgmvae_tpu import checkpoint as ckpt
                extra = {'identifier': exp.identifier, 'pll': mixed,
                         'mix_m_histogram': records[-1]['mix_m_histogram']}
                if mpar is not None:
                    extra['cpt_parents'] = np.asarray(mpar).tolist()
                ckpt.save(exp.checkpoint + '.mix', cfg, state, mdist,
                          extra=extra)
                records[-1]['checkpoint'] = exp.checkpoint + '.mix'
    return records


def run_packed_experiments(exps) -> list:
    """Run S cells that differ ONLY in seed as one vmapped device program
    (run_pipeline.py --pack-seeds). Per-seed trajectories are identical to
    unpacked `run_experiment` runs (tests/test_packed.py); stage 2 and the
    result dicts are computed per seed. Returns one result dict per cell, in
    input order."""
    import dataclasses as _dc
    import jax
    import jax.numpy as jnp

    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pgmvae_tpu import REGISTRY
    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.stage2 import Stage2
    from pgmvae_tpu.train import Trainer

    exps = list(exps)
    if not exps:
        return []
    # the packed width is part of the cell's identity (see
    # ExperimentConfig.packed_seeds) — normalize it to the actual width
    exps = [_dc.replace(e, packed_seeds=len(exps)) for e in exps]
    base = exps[0]
    for e in exps[1:]:
        diff = [f.name for f in _dc.fields(base)
                if f.name != 'seed'
                and getattr(e, f.name) != getattr(base, f.name)]
        if diff:
            raise ValueError(f'packed cells must differ only in seed; '
                             f'{e.identifier} differs in {diff}')
    if base.mesh_data * base.mesh_model > 1:
        raise ValueError('--pack-seeds does not compose with a device mesh')
    if base.resume or base.checkpoint:
        raise ValueError('--pack-seeds does not support resume/checkpoint '
                         'cells; run those unpacked')
    if len(exps) == 1:
        return [run_experiment(base)]

    info = REGISTRY[base.name]
    quantizer = base.quantizer or ('ema' if base.ema else 'vq')
    _check_naive_dim(quantizer, base.dim)
    units = tuple(base.units) if base.units else info.encoder_units(base.dim)
    cfg = VqVaeConfig(n_var=info.n_var, units=units, dim=base.dim,
                      num_codes=base.embedding, cost=base.cost,
                      decay=base.decay, quantizer=quantizer,
                      zero_debias=base.zero_debias,
                      dead_code_threshold=base.dead_code_threshold,
                      fan_mode=base.fan_mode, vq_impl=base.vq_impl,
                      matmul_precision=base.precision,
                      activation=base.activation, l2_reg=base.l2_reg,
                      first_layer=base.first_layer,
                      compute_dtype=base.compute_dtype)

    y_train = load_split(base.name, 'train', base.data_dir)
    trainer = Trainer(cfg, base.rate, base.batch, len(y_train),
                      adam_impl=base.adam_impl)
    parents = None
    if base.cpt_parents > 0:
        from pgmvae_tpu.stage2 import select_parents
        parents = select_parents(y_train, base.cpt_parents)
    s2 = Stage2(cfg, parents=parents)
    keys = jnp.stack([jax.random.PRNGKey(e.seed) for e in exps])
    states = trainer.init_states_packed(keys)

    n_seeds = len(exps)
    best = [(-float('inf'), None, base.epoch)] * n_seeds  # (pll, state, ep)
    t0 = time.time()
    if base.select_on_valid > 0:
        y_valid = load_split(base.name, 'valid', base.data_dir)
        done = 0
        while done < base.epoch:
            blk = min(base.select_on_valid, base.epoch - done)
            states, _ = trainer.fit_packed(states, y_train, blk, keys,
                                           start_epoch=done)
            done += blk
            for s in range(n_seeds):
                snap = trainer.unpack_seed(states, s)
                cb = trainer.codebook(snap)
                d_sel = s2.cpt(snap.params, cb, y_train)
                pv = s2.pseudo_log_likelihood(snap.params, cb, y_valid, d_sel)
                if base.verbose:
                    print(f'select-on-valid[{exps[s].seed}]: epoch {done} '
                          f'pll-valid {pv:.5f}')
                if pv > best[s][0]:
                    best[s] = (pv, snap, done)
        seed_states = [b[1] if b[1] is not None
                       else trainer.unpack_seed(states, s)
                       for s, b in enumerate(best)]
    else:
        states, _ = trainer.fit_packed(states, y_train, base.epoch, keys)
        seed_states = [trainer.unpack_seed(states, s)
                       for s in range(n_seeds)]
    train_wall = time.time() - t0

    y_valid = load_split(base.name, 'valid', base.data_dir)
    y_test = load_split(base.name, 'test', base.data_dir)
    results = []
    stage2_by_m = {}    # post-hoc Stage2 instances shared across seeds
    for s, exp in enumerate(exps):
        t1 = time.time()    # per-seed eval wall, not cumulative
        st = seed_states[s]
        cb = trainer.codebook(st)
        dist = s2.cpt(st.params, cb, y_train)
        pll = {split: s2.pseudo_log_likelihood(st.params, cb, y, dist)
               for split, y in (('train', y_train), ('valid', y_valid),
                                ('test', y_test))}
        cmll_test, cmll_wall = 1, None
        if base.cmll:
            # CMLL per seed, on the unpacked winner state — the model the
            # packed cell's PLL row reports (reference Gibbs settings,
            # run_experiment's exp.cmll path)
            from pgmvae_tpu.gibbs import conditional_marginal_log_likelihood
            y_test_j = jnp.asarray(y_test)
            tc = time.time()
            cmll_test = conditional_marginal_log_likelihood(
                st.params, cb, cfg, dist, y_test_j,
                p1=max(info.n_var // 10, 1), num_smp=3000, burn_in=150,
                key=jax.random.PRNGKey(exp.seed), parents=parents)
            cmll_wall = round(time.time() - tc, 3)
        # samples_per_sec keeps the unpacked meaning (this cell's samples
        # over the shared train wall); the S-seed aggregate gets its own key
        # so joblog consumers can't confuse the two
        per_cell = exp.epoch * len(y_train) / max(train_wall, 1e-9)
        primary_id = _dc.replace(exp, cpt_parents_eval=(),
                                 cpt_parents_mix=False).identifier
        res = {
            'identifier': primary_id,
            'pll_train': pll['train'], 'pll_valid': pll['valid'],
            'pll_test': pll['test'], 'cmll_test': cmll_test,
            'train_wall': round(train_wall, 3),
            'eval_wall': round(time.time() - t1, 3),
            'samples_per_sec': round(per_cell, 1),
            'samples_per_sec_packed': round(n_seeds * per_cell, 1),
            'paper_pll': -info.paper_pll,
            'packed_seeds': n_seeds,
            # platform is part of a cell's numeric identity in practice
            # (CPU and TPU tile/accumulate differently — measured ~0.07-nat
            # shifts on nltcs, more on bistable datasets), so joblogs
            # record where the trajectory ran
            'platform': jax.devices()[0].platform,
        }
        if base.select_on_valid > 0:
            res['best_epoch'] = best[s][2]
        if cmll_wall is not None:
            res['cmll_wall'] = cmll_wall
        if exp.cpt_parents_eval:
            res['posthoc'] = _posthoc_cpt_records(
                exp, cfg, None, st.params, cb, y_train, y_valid, y_test,
                primary_id, jax.devices()[0].platform,
                stage2_by_m=stage2_by_m)
        results.append(res)
    return results


def run_experiment(exp: ExperimentConfig) -> dict:
    """Stage-1 train + stage-2 CPT/PLL (+ optional CMLL / checkpoint)."""
    import jax
    import jax.numpy as jnp

    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pgmvae_tpu import REGISTRY
    from pgmvae_tpu import checkpoint as ckpt
    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.gibbs import conditional_marginal_log_likelihood
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.parallel import MeshContext, make_mesh
    from pgmvae_tpu.stage2 import Stage2
    from pgmvae_tpu.train import Trainer
    from pgmvae_tpu.utils import MetricLogger

    if exp.packed_seeds > 1:
        raise ValueError(
            f'{exp.identifier}: pk-{exp.packed_seeds} identifiers record a '
            f'packed-program trajectory; regenerate with '
            f'run_packed_experiments / run_pipeline --pack-seeds '
            f'{exp.packed_seeds} (unpacked training follows a numerically '
            f'different trajectory)')
    if exp.name not in REGISTRY:
        raise KeyError(f"unknown dataset '{exp.name}'; available: "
                       f"{', '.join(sorted(REGISTRY))}")
    info = REGISTRY[exp.name]
    quantizer = exp.quantizer or ('ema' if exp.ema else 'vq')
    _check_naive_dim(quantizer, exp.dim)
    units = tuple(exp.units) if exp.units else info.encoder_units(
        exp.dim, mesh_model=exp.mesh_model)

    # GSPMD needs the 'model' axis to divide the stacked leading dim; pad
    # the variable axis up with inert networks when it doesn't (e.g. bbc
    # n_var=1058 on 8 devices -> 1064). Padding is invisible in losses,
    # metrics, stage-2 and CMLL (n_active threads the true count through).
    n_var = info.n_var
    n_active = None
    if exp.mesh_model > 1 and n_var % exp.mesh_model:
        n_active = n_var
        n_var = -(-n_var // exp.mesh_model) * exp.mesh_model

    cfg = VqVaeConfig(n_var=n_var, n_active=n_active,
                      units=units, dim=exp.dim,
                      num_codes=exp.embedding, cost=exp.cost, decay=exp.decay,
                      quantizer=quantizer, zero_debias=exp.zero_debias,
                      dead_code_threshold=exp.dead_code_threshold,
                      fan_mode=exp.fan_mode, vq_impl=exp.vq_impl,
                      matmul_precision=exp.precision,
                      activation=exp.activation, l2_reg=exp.l2_reg,
                      first_layer=exp.first_layer,
                      compute_dtype=exp.compute_dtype)

    mesh_ctx = MeshContext(None)
    if exp.mesh_data * exp.mesh_model > 1:
        mesh_ctx = MeshContext(make_mesh(exp.mesh_data, exp.mesh_model))

    logger = MetricLogger(exp.log_dir) if exp.log_dir else None

    y_train = load_split(exp.name, 'train', exp.data_dir)
    trainer = Trainer(cfg, exp.rate, exp.batch, len(y_train),
                      mesh_ctx=mesh_ctx, adam_impl=exp.adam_impl)
    key = jax.random.PRNGKey(exp.seed)
    state = trainer.init_state(key)
    if exp.resume:
        saved_cfg, state, _, _ = ckpt.load(exp.resume, state_template=state)
        # flax from_state_dict does not validate shapes, and semantic fields
        # (decay, cost, zero_debias, quantizer ...) would silently change
        # training dynamics — refuse any mismatch up front.
        mismatches = [
            f'{f}: checkpoint={getattr(saved_cfg, f)!r} cli={getattr(cfg, f)!r}'
            for f in VqVaeConfig._fields
            if f not in ('vq_impl', 'matmul_precision')  # execution-only knobs
            and getattr(saved_cfg, f) != getattr(cfg, f)]
        if mismatches:
            raise ValueError(
                f'--resume {exp.resume}: checkpoint config does not match the '
                f'requested run: ' + '; '.join(mismatches))
        state = trainer.shard_state(state)

    parents = None
    if exp.cpt_parents > 0:
        from pgmvae_tpu.stage2 import select_parents
        parents = select_parents(y_train, exp.cpt_parents)
    s2 = Stage2(cfg, mesh_ctx=mesh_ctx, parents=parents)
    log_fn = logger.log_epoch if logger else None
    best_epoch = exp.epoch
    t0 = time.time()
    if exp.select_on_valid > 0:
        # Block training with periodic valid-PLL checkpointing: epoch keys
        # are offset by start_epoch, so the trained trajectory is
        # bit-identical to a plain `fit` of the same total epochs — only
        # WHICH point on it we keep differs (best valid PLL, not last).
        y_valid = load_split(exp.name, 'valid', exp.data_dir)
        best_pll, best_state, done = -float('inf'), None, 0
        while done < exp.epoch:
            blk = min(exp.select_on_valid, exp.epoch - done)
            state, _ = trainer.fit(state, y_train, blk, key,
                                   verbose=exp.verbose, log_fn=log_fn,
                                   start_epoch=done)
            done += blk
            cb = trainer.codebook(state)
            d_sel = s2.cpt(state.params, cb, y_train)
            pv = s2.pseudo_log_likelihood(state.params, cb, y_valid, d_sel)
            if exp.verbose:
                print(f'select-on-valid: epoch {done} pll-valid {pv:.5f}')
            if pv > best_pll:
                # deep-copy the snapshot: the epoch programs donate their
                # input state buffers (train.py donate_argnums), so the
                # NEXT fit call invalidates `state`'s arrays on TPU --
                # keeping a bare reference fails later with
                # INVALID_ARGUMENT on any read of the donated buffers
                snap = jax.tree.map(jnp.copy, state)
                jax.block_until_ready(snap)
                best_pll, best_state, best_epoch = pv, snap, done
        if best_state is None:
            # every periodic valid PLL was NaN (diverged cell) or epoch == 0;
            # fall back to the final state instead of crashing downstream
            print('select-on-valid: no finite valid PLL seen; '
                  'keeping the final state', flush=True)
            best_epoch = exp.epoch
        else:
            state = best_state
    else:
        state, _ = trainer.fit(state, y_train, exp.epoch, key,
                               verbose=exp.verbose, log_fn=log_fn)
    jax.block_until_ready(state.params)
    train_wall = time.time() - t0

    codebook = trainer.codebook(state)
    y_valid = load_split(exp.name, 'valid', exp.data_dir)
    y_test = load_split(exp.name, 'test', exp.data_dir)
    t1 = time.time()
    dist = s2.cpt(state.params, codebook, y_train)
    pll = {}
    for split, y in (('train', y_train), ('valid', y_valid),
                     ('test', y_test)):
        pll[split] = s2.pseudo_log_likelihood(state.params, codebook, y, dist)
    eval_wall = time.time() - t1

    cmll_test = 1  # reference hardcodes 1 when CMLL is off (run.py:77)
    cmll_wall = None
    if exp.cmll:
        t2 = time.time()
        cmll_test = conditional_marginal_log_likelihood(
            state.params, codebook, cfg, dist, y_test,
            p1=max(info.n_var // 10, 1), num_smp=3000, burn_in=150,
            key=jax.random.PRNGKey(exp.seed), verbose=exp.verbose,
            parents=parents)
        cmll_wall = round(time.time() - t2, 3)

    if exp.checkpoint:
        extra = {'identifier': exp.identifier, 'pll': pll}
        if parents is not None:
            extra['cpt_parents'] = parents.tolist()
        ckpt.save(exp.checkpoint, cfg, state, dist, extra=extra)

    # the primary record's identity is independent of the post-hoc eval
    # list (training and the primary stage-2 never see it) — strip cpe so
    # plain reruns of the same recipe dedupe against it
    primary_id = dataclasses.replace(exp, cpt_parents_eval=(),
                                     cpt_parents_mix=False).identifier
    result = {
        'identifier': primary_id,
        'pll_train': pll['train'], 'pll_valid': pll['valid'],
        'pll_test': pll['test'], 'cmll_test': cmll_test,
        'train_wall': round(train_wall, 3), 'eval_wall': round(eval_wall, 3),
        'samples_per_sec': round(exp.epoch * len(y_train)
                                 / max(train_wall, 1e-9), 1),
        'paper_pll': -info.paper_pll,
        'platform': jax.devices()[0].platform,  # see run_packed_experiments
    }
    if exp.select_on_valid > 0:
        result['best_epoch'] = best_epoch
    if cmll_wall is not None:
        result['cmll_wall'] = cmll_wall
    if exp.cpt_parents_eval:
        result['posthoc'] = _posthoc_cpt_records(
            exp, cfg, mesh_ctx, state.params, codebook, y_train, y_valid,
            y_test, primary_id, jax.devices()[0].platform, state=state)
    if logger:
        logger.log_final(**result)
        logger.close()
    return result
