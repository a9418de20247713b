"""Stage-1 training engine: whole epochs as a single `lax.scan` under `jit`.

TPU-native design notes (vs the reference's Keras `model.fit`,
reference `run.py:59-62`):

- The full dataset lives on device (the largest TRW split is ~70 MB); an
  epoch is ONE device computation — per-epoch permutation, `lax.scan` over
  batches, Adam + EMA updates — with zero host round-trips per step. Keras
  dispatches a graph per step from Python; this is where most of the per-chip
  throughput win comes from for these small models.
- Leave-one-out is the padded masked design (see models/vqvae.py): raw
  samples y [B, n_var] go straight into the jitted step; masks come from
  iota comparisons. Neither the reference's materialized
  `[N, n_var, n_var-1]` host tensor (reference `run.py:46-56`, TODO at
  `run.py:53`) nor any gather/index-table exists — at n_var~1000 the gather
  costs more than the matmuls and its index constant balloons compiles.
- Ragged final batches are handled with a sentinel-padded permutation and a
  0/1 weight vector threaded through every mean/statistic, reproducing
  Keras's smaller-final-batch semantics with static shapes.
- EMA codebook updates are functional (`EmaState` in the carry); under data
  parallelism the batch statistics are reduced across shards by GSPMD before
  the moving-average step, which keeps multi-chip EMA exactly equal to
  single-chip.

Loss composition matches Keras `compile(loss='mse')` plus the quantizer's
`add_loss` terms (reference `run.py:61`, `core/quantizer.py:52,58,153,161`):
total = mean((recon-x)^2) + [q_loss + beta*e_loss | beta*e_loss (EMA/naive)].
Adam uses eps=1e-7 (the Keras default) rather than optax's 1e-8.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pgmvae_tpu.models import vqvae
from pgmvae_tpu.ops import quantizer as q
from pgmvae_tpu.ops.fused_adam import fused_adam
from pgmvae_tpu.parallel.mesh import MeshContext, shard_leading_axis


# Largest code space for which the per-step usage histogram (a [n_var, K]
# scatter-add) is computed; beyond this (naive quantizer, dim > 16) the
# perplexity metric is reported as 0 instead of allocating huge buffers.
PERPLEXITY_MAX_CODES = 1 << 16


class TrainState(NamedTuple):
    params: dict                  # {'enc','dec'[, 'codebook' if 'vq']}
    ema: Optional[q.EmaState]     # EMA quantizer state ('ema' mode only)
    opt_state: optax.OptState
    step: jax.Array               # global step counter


class EpochMetrics(NamedTuple):
    loss: jax.Array        # total (mse + quantizer aux), sample-weighted
    mse: jax.Array         # reconstruction mse
    mae: jax.Array         # Keras 'mae' metric (ref run.py:61)
    perplexity: jax.Array  # codebook usage: exp(entropy of code histogram)


def _masked_recon_mean(x, w, mask, n_active=None):
    """Mean over a [n, B, n] tensor with per-batch weights w [B] and the
    leave-one-out mask [n, 1, n] (each network's own column excluded) —
    denominator n*(n-1)*sum(w), matching the reference's mean over the
    gathered [n, B, n-1] views. With a padded variable axis, `n_active` is
    the true count (the mask already zeroes the padding rows/columns)."""
    n = n_active if n_active is not None else x.shape[0]
    return jnp.sum(x * mask * w[None, :, None]) / (
        n * (n - 1) * jnp.maximum(jnp.sum(w), 1.0))


class Trainer:
    """Builds and caches the jitted epoch runner for one model config."""

    def __init__(self, cfg: vqvae.VqVaeConfig, learning_rate: float,
                 batch_size: int, n_train: int,
                 mesh_ctx: Optional[MeshContext] = None,
                 adam_eps: float = 1e-7,
                 stream_bytes: int = 4 << 30,
                 stream_chunk_bytes: int = 64 << 20,
                 adam_impl: Optional[str] = None):
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.n_train = int(n_train)
        self.steps_per_epoch = math.ceil(self.n_train / self.batch_size)
        self.mesh = mesh_ctx or MeshContext(None)
        # datasets larger than `stream_bytes` are not placed device-resident;
        # fit() switches to the host-chunked streaming epoch engine, feeding
        # ~stream_chunk_bytes of permuted samples per transfer (the answer to
        # the reference's "dataset > 4G" TODO, reference run.py:53)
        self.stream_bytes = int(stream_bytes)
        self.stream_chunk_bytes = int(stream_chunk_bytes)
        # inject_hyperparams keeps the learning rate a runtime value inside
        # opt_state instead of a compile-time constant — sweep cells that
        # differ only in lr (or schedules/resume) share one compiled program
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, eps=adam_eps)
        # Fused single-pass Adam (ops/fused_adam.py): same state pytree and
        # same math, but the moment updates, bias correction, and parameter
        # write are one fused pass over HBM instead of optax's update+apply
        # two-step (the dominant step cost at bbc scale —
        # scripts/bench_step_anatomy.py). NOT bit-identical to the optax
        # path inside jit (different fusion shapes contract FMAs
        # differently, ~1 ULP/step), so the default stays 'optax': every
        # recorded identifier regenerates its exact number. Opt in with
        # $PGMVAE_ADAM_IMPL or ExperimentConfig.adam_impl ('fused' |
        # 'pallas'), which the identifier records (ad-fused / ad-pallas).
        self.adam_impl = adam_impl or os.environ.get(
            'PGMVAE_ADAM_IMPL', 'optax')
        if self.adam_impl != 'optax':
            impl = {'pallas': 'pallas', 'fused_bf16': 'xla_bf16'}.get(
                self.adam_impl, 'xla')
            self._fused_adam = fused_adam(learning_rate, eps=adam_eps,
                                          impl=impl)
        self._run_epoch = jax.jit(self._epoch_impl, donate_argnums=(0,))
        self._run_epochs = jax.jit(self._epochs_impl, donate_argnums=(0,),
                                   static_argnums=(4,))
        self._run_chunk = jax.jit(self._chunk_impl, donate_argnums=(0,))
        # packed-seed variant: S independent runs of the SAME epoch program,
        # vmapped over (state, base_key) with the dataset broadcast — a seed
        # sweep becomes one device program instead of S serial cells
        self._run_epochs_packed = jax.jit(
            jax.vmap(self._epochs_impl, in_axes=(0, None, 0, None, None)),
            donate_argnums=(0,), static_argnums=(4,))
        self._shard_rule = shard_leading_axis(cfg.n_var)

    # ------------------------------------------------------------- state --
    def init_state(self, key: jax.Array) -> TrainState:
        state = TrainState(*self._init_state_leaves(key))
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Place the state with every stacked leaf sharded over 'model'."""
        if self.mesh.mesh is None:
            return state
        return jax.tree.map(
            lambda l: self.mesh.put(l, self._shard_rule(l)), state)

    # -------------------------------------------------------------- step --
    def _codebook_of(self, state_params, ema):
        if self.cfg.quantizer == 'vq':
            return state_params['codebook']
        if self.cfg.quantizer == 'ema':
            return ema.codebook
        return None

    def train_step(self, state: TrainState, y: jax.Array, w: jax.Array,
                   key=None):
        with jax.default_matmul_precision(self.cfg.matmul_precision):
            return self._train_step_impl(state, y, w, key)

    def _train_step_impl(self, state: TrainState, y: jax.Array, w: jax.Array,
                         key=None):
        cfg, mesh = self.cfg, self.mesh
        y = mesh.constrain(y, mesh.batch)
        mask = vqvae.loo_mask(cfg.n_var, None, y.dtype,
                              n_active=cfg.active_vars)
        # 'bf16' compute: master params stay f32; the cast happens INSIDE
        # loss_fn so the astype VJP returns f32 grads, and every elementwise
        # product against the f32 mask/weights promotes back to f32 — i.e.
        # loss/metric accumulation is f32 while the network-side streams
        # (weights read, activations, cotangents) move at half width.
        cdt = jnp.bfloat16 if cfg.compute_dtype == 'bf16' else None

        def loss_fn(params):
            p = params if cdt is None else jax.tree.map(
                lambda l: l.astype(cdt), params)
            if cfg.quantizer == 'vq':
                codebook = p['codebook']            # Adam-trained codebook
            elif cfg.quantizer == 'ema':
                codebook = state.ema.codebook       # EMA-assigned, no grads
                if cdt is not None:
                    codebook = codebook.astype(cdt)
            else:
                codebook = None                     # naive: implicit D-cube
            yc = y if cdt is None else y.astype(cdt)
            out = vqvae.apply_model(p, codebook, yc, cfg,
                                    weights=w.astype(yc.dtype))
            recon = mesh.constrain(
                out.recon, jax.sharding.PartitionSpec('model', 'data', None))
            mse = _masked_recon_mean((recon - yc[None]) ** 2, w, mask,
                                     cfg.active_vars)
            if cfg.quantizer == 'vq':
                aux = out.q_loss + cfg.cost * out.e_loss
            else:  # 'ema' and 'naive': commitment term only
                aux = cfg.cost * out.e_loss
            total = mse + aux
            if cfg.l2_reg > 0:  # FatDense kernel_regularizer hook
                total = total + cfg.l2_reg * vqvae.l2_penalty(params)
            return total, (out, mse)

        (loss, (out, mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if self.adam_impl == 'optax':
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        else:
            params, opt_state = self._fused_adam.apply(
                grads, state.opt_state, state.params)

        ema = state.ema
        counts, _dw = None, None
        if cfg.quantizer == 'ema':
            # EMA statistics accumulate in f32 regardless of compute dtype
            # (the codebook IS these statistics — bf16 rounding here would
            # compound across steps, unlike one-shot activation rounding)
            z32 = out.z if cdt is None else out.z.astype(jnp.float32)
            counts, dw = q.code_stats(z32, out.indices,
                                      cfg.num_codes, weights=w)
            ema = q.ema_update(ema, counts, dw, cfg.decay,
                               cfg.epsilon, cfg.zero_debias)
            if cfg.dead_code_threshold > 0 and key is not None:
                ema = q.restart_dead_codes(
                    ema, z32, key, cfg.dead_code_threshold, cfg.decay,
                    cfg.zero_debias, weights=w)
        elif cfg.effective_codes <= PERPLEXITY_MAX_CODES:
            # histogram via scatter-add — no [n, B, K] one-hot materialized
            counts = jnp.zeros((cfg.n_var, cfg.effective_codes), y.dtype)
            counts = counts.at[
                jnp.arange(cfg.n_var)[:, None], out.indices].add(w[None, :])
        else:
            # naive quantizer with 2**dim codes: a usage histogram would be
            # a [n_var, 2^dim] tensor — skip the metric rather than OOM
            counts = None

        mae = _masked_recon_mean(jnp.abs(out.recon - y[None]), w, mask,
                                 cfg.active_vars)
        if counts is None:
            perplexity = jnp.zeros((), y.dtype)
        else:
            counts = counts[:cfg.active_vars]   # padding networks excluded
            p = counts / jnp.maximum(
                jnp.sum(counts, axis=1, keepdims=True), 1.0)
            perplexity = jnp.mean(jnp.exp(-jnp.sum(
                p * jnp.log(jnp.maximum(p, 1e-12)), axis=1)))
        metrics = EpochMetrics(loss, mse, mae, perplexity)
        return TrainState(params, ema, opt_state, state.step + 1), metrics

    # ------------------------------------------------------------- epoch --
    def _epoch_body(self, state: TrainState, data: jax.Array, ekey: jax.Array):
        """One epoch with per-epoch key `ekey`: permutation, scan over
        batches, sample-weighted metric aggregation (Keras-style)."""
        n, bs, steps = self.n_train, self.batch_size, self.steps_per_epoch
        perm = jax.random.permutation(ekey, n)
        pad = steps * bs - n
        perm = jnp.concatenate(
            [perm, jnp.full((pad,), -1, perm.dtype)]).reshape(steps, bs)

        def body(state, idx):
            w = (idx >= 0).astype(data.dtype)
            yb = jnp.take(data, jnp.maximum(idx, 0), axis=0)
            step_key = jax.random.fold_in(ekey, state.step) \
                if self.cfg.dead_code_threshold > 0 else None
            state, m = self.train_step(state, yb, w, key=step_key)
            return state, (m, jnp.sum(w))

        state, (ms, wsum) = jax.lax.scan(body, state, perm)
        tot = jnp.sum(wsum)
        agg = EpochMetrics(*(jnp.sum(m * wsum) / tot for m in ms))
        return state, agg

    def _epoch_impl(self, state: TrainState, data: jax.Array, key: jax.Array):
        return self._epoch_body(state, data, key)

    def _epochs_impl(self, state: TrainState, data: jax.Array,
                     base_key: jax.Array, start_epoch, num_epochs: int):
        """A block of `num_epochs` epochs as ONE device program: an outer
        `lax.scan` over epoch indices around `_epoch_body`. Epoch e uses key
        `fold_in(base_key, e)` — exactly what `fit` passes to `run_epoch` —
        so block runs are bit-identical to per-epoch runs. One execution per
        block instead of per epoch amortizes the remote-dispatch overhead
        (the per-execution round-trip dominates small models' epochs)."""
        def body(state, e):
            return self._epoch_body(state, data, jax.random.fold_in(base_key, e))

        es = start_epoch + jnp.arange(num_epochs)
        state, aggs = jax.lax.scan(body, state, es)
        return state, aggs              # EpochMetrics of [num_epochs] arrays

    def run_epoch(self, state: TrainState, data: jax.Array, key: jax.Array):
        return self._run_epoch(state, data, key)

    # Epoch-block sizes are powers of two (largest 64) so a sweep compiles at
    # most 7 distinct block programs regardless of --epoch values.
    MAX_EPOCH_BLOCK = 64
    # Cap on train steps packed into ONE device execution: the remote TPU
    # worker kills (and crashes on) executions past its watchdog — observed
    # at bbc scale, where a 64-epoch block at 140 steps/epoch (~9k steps)
    # dies while ~4.3k-step blocks run clean. 4096 keeps every block safely
    # under it; small models are unaffected (their whole 64-epoch block is
    # far below the cap). Deployments without the watchdog can raise it via
    # $PGMVAE_MAX_STEPS_PER_EXECUTION.
    MAX_STEPS_PER_EXECUTION = int(os.environ.get(
        'PGMVAE_MAX_STEPS_PER_EXECUTION', 4096))

    def run_epochs(self, state: TrainState, data: jax.Array, key: jax.Array,
                   start_epoch: int, num_epochs: int):
        """Run `num_epochs` epochs (indices start_epoch..+num_epochs) in
        power-of-two scan blocks; returns (state, EpochMetrics of
        [num_epochs] device arrays)."""
        outs = []
        cap = max(1, self.MAX_STEPS_PER_EXECUTION // self.steps_per_epoch)
        cap = 1 << (cap.bit_length() - 1)           # round down to pow2
        e, rem = start_epoch, num_epochs
        while rem > 0:
            blk = min(self.MAX_EPOCH_BLOCK, cap,
                      1 << (rem.bit_length() - 1))
            state, ms = self._run_epochs(state, data, key,
                                         jnp.asarray(e, jnp.int32), blk)
            outs.append(ms)
            e, rem = e + blk, rem - blk
        agg = EpochMetrics(*(jnp.concatenate([getattr(m, f) for m in outs])
                             for f in EpochMetrics._fields))
        return state, agg

    # --------------------------------------------------- packed seeds -----
    def init_states_packed(self, keys: jax.Array) -> TrainState:
        """Initialize S independent training states (keys: [S] stacked PRNG
        keys); every leaf gains a leading seed axis. Packed runs are
        single-device (a seed sweep is throughput work, not memory work);
        mesh sharding is not supported here."""
        if self.mesh.mesh is not None:
            raise ValueError('packed-seed training does not compose with a '
                             'device mesh; run packed cells single-device')
        return jax.vmap(lambda k: TrainState(
            *self._init_state_leaves(k)))(keys)

    def _init_state_leaves(self, key):
        params, codebook = vqvae.init_model(key, self.cfg)
        ema = None
        if self.cfg.quantizer == 'ema':
            ema = q.ema_init(codebook, self.cfg.zero_debias)
        elif self.cfg.quantizer == 'vq':
            params['codebook'] = codebook
        opt_state = (self.optimizer.init(params)
                     if self.adam_impl == 'optax'
                     else self._fused_adam.init(params))
        return params, ema, opt_state, jnp.zeros((), jnp.int32)

    def run_epochs_packed(self, states: TrainState, data: jax.Array,
                          keys: jax.Array, start_epoch: int, num_epochs: int):
        """Packed analogue of `run_epochs`: S seeds advance together, one
        scan-block execution at a time. Seed s's trajectory is the SAME
        sequence of batches and updates it would take unpacked (epoch e uses
        fold_in(keys[s], e)). Per-execution step cap shrinks by S — a packed
        step does S times the work against the remote worker's watchdog."""
        n_seeds = jax.tree.leaves(states)[0].shape[0]
        outs = []
        cap = max(1, self.MAX_STEPS_PER_EXECUTION
                  // (self.steps_per_epoch * n_seeds))
        cap = 1 << (cap.bit_length() - 1)           # round down to pow2
        e, rem = start_epoch, num_epochs
        while rem > 0:
            blk = min(self.MAX_EPOCH_BLOCK, cap,
                      1 << (rem.bit_length() - 1))
            states, ms = self._run_epochs_packed(
                states, data, keys, jnp.asarray(e, jnp.int32), blk)
            outs.append(ms)
            e, rem = e + blk, rem - blk
        agg = EpochMetrics(*(jnp.concatenate([getattr(m, f) for m in outs],
                                             axis=1)
                             for f in EpochMetrics._fields))
        return states, agg                  # metrics: [S, num_epochs] arrays

    def fit_packed(self, states: TrainState, data_host: np.ndarray,
                   epochs: int, keys: jax.Array, start_epoch: int = 0):
        """Train S packed seeds for `epochs` epochs; returns
        (states, EpochMetrics of [S, epochs] host arrays). Same epoch-key
        contract as `fit` (epoch e uses fold_in(keys[s], e)), so resuming
        with start_epoch composes bit-identically."""
        if epochs <= 0:
            return states, None
        data_host = np.asarray(data_host)
        if data_host.shape[1] < self.cfg.n_var:
            data_host = np.pad(
                data_host,
                ((0, 0), (0, self.cfg.n_var - data_host.shape[1])))
        data = jnp.asarray(data_host, jnp.dtype(self.cfg.dtype))
        states, ms = self.run_epochs_packed(states, data, keys,
                                            start_epoch, epochs)
        return states, jax.device_get(ms)

    @staticmethod
    def unpack_seed(states: TrainState, s: int) -> TrainState:
        """Materialize seed s's state out of a packed state (new buffers —
        safe to hold across later donated packed calls)."""
        out = jax.tree.map(lambda l: jnp.copy(l[s]), states)
        jax.block_until_ready(out)
        return out

    # --------------------------------------------------- streaming epochs --
    def _chunk_impl(self, state: TrainState, yb: jax.Array, w: jax.Array,
                    key: jax.Array):
        """Scan over a host-fed chunk of batches: yb [G, bs, n_var],
        w [G, bs]. Same per-step math as `_epoch_impl`'s body, so streaming
        epochs are bit-identical to in-core epochs."""
        def body(state, inp):
            y_i, w_i = inp
            step_key = jax.random.fold_in(key, state.step) \
                if self.cfg.dead_code_threshold > 0 else None
            state, m = self.train_step(state, y_i, w_i, key=step_key)
            return state, (m, jnp.sum(w_i))

        return jax.lax.scan(body, state, (yb, w))

    def _fit_streaming(self, state: TrainState, data_host: np.ndarray,
                       epochs: int, key: jax.Array, verbose: bool, log_fn,
                       start_epoch: int = 0):
        """Host-chunked epochs for datasets too large to keep device-resident
        (the out-of-core path; see `stream_bytes`). The permutation, padding
        and per-step weights replicate `_epoch_impl` exactly; the only
        difference is WHERE batches are gathered (host RAM vs HBM)."""
        n, bs, steps = self.n_train, self.batch_size, self.steps_per_epoch
        dtype = jnp.dtype(self.cfg.dtype)
        row_bytes = bs * self.cfg.n_var * dtype.itemsize
        # bounded by the byte budget AND the per-execution step cap (small
        # rows would otherwise pack enough steps into one chunk execution
        # to trip the remote worker's watchdog)
        chunk = max(1, min(steps, self.stream_chunk_bytes // max(row_bytes, 1),
                           self.MAX_STEPS_PER_EXECUTION))
        data = np.asarray(data_host, dtype)
        history = []
        for epoch in range(start_epoch, start_epoch + epochs):
            ekey = jax.random.fold_in(key, epoch)
            perm = np.asarray(jax.random.permutation(ekey, n))
            pad = steps * bs - n
            perm = np.concatenate(
                [perm, np.full(pad, -1, perm.dtype)]).reshape(steps, bs)
            msums, wsums = None, 0.0
            for s0 in range(0, steps, chunk):
                idx = perm[s0:s0 + chunk]
                w = (idx >= 0).astype(data.dtype)
                yb = data[np.maximum(idx, 0)]
                state, (ms, wsum) = self._run_chunk(
                    state, jnp.asarray(yb), jnp.asarray(w), ekey)
                ms, wsum = jax.device_get((ms, wsum))
                part = EpochMetrics(*(float(np.sum(m * wsum)) for m in ms))
                msums = part if msums is None else EpochMetrics(
                    *(a + b for a, b in zip(msums, part)))
                wsums += float(np.sum(wsum))
            m_host = EpochMetrics(*(v / wsums for v in msums))
            history.append(m_host)
            if verbose:
                print(f'epoch {epoch + 1}/{start_epoch + epochs} (streamed) '
                      f'loss={m_host.loss:.6f} mse={m_host.mse:.6f} '
                      f'mae={m_host.mae:.6f} ppl={m_host.perplexity:.1f}')
            if log_fn is not None:
                log_fn(epoch, m_host)
        return state, history

    # --------------------------------------------------------------- fit --
    def fit(self, state: TrainState, data_host: np.ndarray, epochs: int,
            key: jax.Array, verbose: bool = False, log_fn=None,
            start_epoch: int = 0):
        """Train for `epochs` epochs; returns (state, list of EpochMetrics).

        `data_host` is the raw [N, n_var] sample matrix; it is placed on
        device once (replicated across the mesh). Datasets larger than
        `stream_bytes` take the out-of-core streaming path instead.

        `start_epoch` offsets the per-epoch PRNG keys (epoch e always uses
        `fold_in(key, e)`), so fit(..., epochs=a) followed by
        fit(..., epochs=b, start_epoch=a) is bit-identical to one
        fit(..., epochs=a+b) — the contract valid-selection block training
        relies on (tests/test_train.py)."""
        if epochs <= 0:
            return state, []
        data_host = np.asarray(data_host)
        if data_host.shape[1] < self.cfg.n_var:    # padded variable axis:
            data_host = np.pad(                    # append zero columns
                data_host,
                ((0, 0), (0, self.cfg.n_var - data_host.shape[1])))
        if data_host.nbytes > self.stream_bytes:
            return self._fit_streaming(state, data_host, epochs, key,
                                       verbose, log_fn, start_epoch)
        data = self.mesh.put(jnp.asarray(data_host, jnp.dtype(self.cfg.dtype)),
                             jax.sharding.PartitionSpec())
        if verbose or log_fn is not None:
            # per-epoch host callbacks force a device sync per epoch
            history = []
            for epoch in range(start_epoch, start_epoch + epochs):
                state, m = self.run_epoch(
                    state, data, jax.random.fold_in(key, epoch))
                m_host = jax.tree.map(float, jax.device_get(m))
                history.append(m_host)
                if verbose:
                    print(f'epoch {epoch + 1}/{start_epoch + epochs} '
                          f'loss={m_host.loss:.6f} mse={m_host.mse:.6f} '
                          f'mae={m_host.mae:.6f} ppl={m_host.perplexity:.1f}')
                if log_fn is not None:
                    log_fn(epoch, m_host)
            return state, history
        # silent path: epoch-block scans (one execution per MAX_EPOCH_BLOCK
        # epochs, further capped by MAX_STEPS_PER_EXECUTION), bit-identical
        # keys to the per-epoch path; single metrics fetch
        state, ms = self.run_epochs(state, data, key, start_epoch, epochs)
        ms = jax.device_get(ms)
        history = [EpochMetrics(*(float(f[i]) for f in ms))
                   for i in range(epochs)]
        return state, history

    def codebook(self, state: TrainState):
        return self._codebook_of(state.params, state.ema)
