"""Training loop: jitted per-bucket train/eval steps, epoch driver, best
checkpointing, early stopping, metrics.

Behavioral spec: reference train_model.py:476-802. TPU redesign: one compiled
XLA executable per bucket shape (JAX caches by input shape) instead of
torch.compile(dynamic=True); bf16 mixed precision replaces AMP+GradScaler
(no loss scaling needed on TPU); gradient accumulation via optax.MultiSteps;
loss masking handles the padded pairs that static buckets introduce.
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from caster_dta_tpu.data.batching import BucketedLoader, PairBatch
from caster_dta_tpu.train import checkpoints, metrics as metrics_mod
from caster_dta_tpu.train.optim import (BATCH_SCHEDULERS, make_optimizer,
                                        make_scheduler, set_learning_rate)


@dataclass
class TrainConfig:
    """Reference training constants (train_model.py:392-419)."""

    n_epochs: int = 2000
    optimizer: str = "adam"
    lr: float = 1e-4
    weight_decay: float = 0.0
    scheduler: Optional[str] = "plateau"
    do_batch_schedule: bool = True
    warmup_epochs: int = 0
    early_stop_epochs: int = 200
    clip_norm: Optional[float] = None
    grad_accum: int = 1
    seed: int = 9
    # matmul compute dtype ("bfloat16" = the reference's AMP-on equivalent,
    # train_model.py:478; params/grads/moments stay f32). None = pure f32.
    # Trace-time setting: applied process-wide when the Trainer is built.
    compute_dtype: Optional[str] = None
    # dropout-mask PRNG. "rbg" (XLA RngBitGenerator) is the TPU-native
    # generator: measured 4.68 -> 3.41 ms/step on the flagship bucket
    # (scripts/bench_prng_ab.py, +37% throughput) because threefry mask
    # bits for the joint head's ~10 [16K, 128..256] dropout masks dominate
    # several hot fusions (PROFILE_r4.md). "threefry2x32" gives jax's
    # cross-backend-identical streams — old train_state files (raw 2-word
    # keys) restore as threefry automatically, so existing runs resume
    # bit-identically.
    #
    # Stability caveat: JAX documents rbg bit output as NOT guaranteed
    # stable across XLA versions, backends, or shardings — so the
    # bit-identical-resume guarantee holds per-build and per-topology, not
    # universally. For multi-host configs where cross-process mask agreement
    # matters (or to pin a run's stream across toolchain upgrades), set
    # prng_impl="threefry2x32".
    prng_impl: str = "rbg"
    # full train-state checkpointing (params+optimizer+scheduler+rng): write
    # train_state.msgpack every k epochs (0 = off); resume=True restarts an
    # interrupted run from it bit-identically.
    save_state_every: int = 25
    resume: bool = False
    print_unscaled_loss: bool = True
    log_every: int = 0           # print per-batch progress if > 0
    # device-resident graph store (data/device_cache.py): upload dedup'd
    # padded graphs once, assemble batches with on-device gathers. None
    # disables; otherwise the HBM byte budget for the stores.
    device_data_budget: Optional[int] = 4_000_000_000
    # scan-over-steps: when the loader is device-resident, run all of a
    # bucket's batches in ONE jitted lax.scan dispatch per epoch (k optimizer
    # steps per launch) instead of one dispatch per batch. Removes per-step
    # launch overhead entirely; batch order becomes bucket-grouped (buckets
    # themselves shuffled per epoch).
    scan_steps: bool = True
    # data parallelism: shard every batch's leading dim over a 'dp' mesh of
    # this many devices, params replicated, XLA inserting the gradient
    # all-reduce over ICI (the capability the reference lacks,
    # train_model.py:353-355). None/1 = single device. Bucket batch sizes
    # round up to a multiple of n_dp so batches split evenly.
    n_dp: Optional[int] = None
    # carry the parameters through the train step as ONE flat f32 vector
    # (and run the optimizer directly on it) instead of a ~150-leaf pytree.
    # Hypothesis was that the pytree step's ~450 per-leaf output buffers
    # (params + two Adam moments -> ~600 sub-us copies,
    # docs/bench/op_groups_r5.json) would collapse into three donated 3 MB
    # vectors. MEASURED OFF (scripts/bench_flat_ab.py on v5e, flagship
    # bucket, docs/bench/flat_ab_r5.json): wall 3.384 ms/step pytree vs
    # 3.444 ms flat, device step 3.0 ms BOTH — XLA already emits the same
    # schedule either way (optax.flatten runs the update on the
    # concatenated vector in both configs; the unravel slices simply move
    # from the update side to the forward side). Identical math — the A/B
    # losses agree bitwise. Kept as an escape hatch; forced off under gp
    # (the partitioned executor works on the pytree).
    flat_params: bool = False
    # graph-partition parallelism: proteins LARGER than the bucket ladder
    # route to the edge-partitioned executor over a 'gp' mesh axis of this
    # many devices (parallel/partition.py) instead of raising — fit() trains
    # them with halo-exchange message passing, dropout (global-canonical
    # masks), and padded-pair weighting. Total devices = (n_dp or 1) * gp;
    # standard buckets shard their batch over BOTH axes so no device idles.
    gp: Optional[int] = None


def _max_batch_width(loader) -> int:
    """Largest per-batch prediction width across the loader's buckets."""
    bl = getattr(loader, "loader", loader)   # unwrap DeviceResidentLoader
    bks = bl.buckets()
    if not bks:
        return 1
    return max(bl.bucket_batch_size(b) for b in bks)


@functools.partial(jax.jit, donate_argnums=(0,))
def _acc_pred(buf, pred, k):
    """buf[k, :len(pred)] = pred, in place (donated). One cheap pipelined
    launch per batch; a distinct executable per pred width (few widths)."""
    pred = jnp.pad(pred, (0, buf.shape[1] - pred.shape[0]))
    return buf.at[k].set(pred)


@functools.partial(jax.jit, donate_argnums=(0,))
def _acc_block(buf, preds, k0):
    """buf[k0:k0+k, :w] = preds for a [k, w] block (one launch per bucket
    megabatch; k0 is a traced operand so offsets don't recompile)."""
    preds = jnp.pad(preds, ((0, 0), (0, buf.shape[1] - preds.shape[1])))
    return jax.lax.dynamic_update_slice(buf, preds, (k0, jnp.int32(0)))


class _PredAccumulator:
    """Epoch predictions accumulated in ONE device buffer, fetched with ONE
    device->host transfer.

    Measured on the remote-device (tunnel) backend: fetching N
    separately-produced device arrays costs ~2s *each* (per-buffer transfer
    round trips), while queued jit launches pipeline at sub-ms — an epoch of
    per-batch prediction fetches dominated wall time (~240s of a 245s Davis
    epoch). Accumulating on device makes the epoch one transfer total."""

    def __init__(self, n_batches: int, width: int):
        self.buf = jnp.zeros((max(n_batches, 1), width), jnp.float32)
        self.k = 0

    def append(self, pred) -> None:
        self.buf = _acc_pred(self.buf, pred, self.k)
        self.k += 1

    def to_host(self):
        host = np.asarray(self.buf)
        return [host[i] for i in range(self.k)]


class Trainer:
    def __init__(self, model, config: TrainConfig, example_batch: PairBatch,
                 mesh=None):
        self.model = model
        self.config = config
        self.mesh = mesh
        # mixed precision (AMP equivalent): trace-time process-wide policy,
        # active for every step this trainer traces (see nn/common.py)
        from caster_dta_tpu.nn import common as nn_common
        nn_common.set_compute_dtype(
            jnp.bfloat16 if config.compute_dtype in ("bfloat16", "bf16")
            else config.compute_dtype)
        # flat-params carry: the optimizer then runs directly on the flat
        # vector, so skip the optax.flatten wrapper (same state structure —
        # optax.flatten's state IS the inner state on the flat vector)
        self._flat = bool(config.flat_params) and not (config.gp or 0) > 1
        tx = make_optimizer(config.optimizer, config.lr, config.weight_decay,
                            flatten=not self._flat)
        if config.clip_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(config.clip_norm), tx)
        if config.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum)
        self.tx = tx

        # typed key: the PRNG impl travels in the dtype, so every split/
        # bernoulli downstream (incl. flax make_rng) follows it with no
        # global config
        rng = jax.random.key(config.seed, impl=config.prng_impl)
        self.rng, init_rng = jax.random.split(rng)
        # jit the inits: eager flax/optax init issues hundreds of small device
        # ops, each a round trip on a remote-device (tunnel) backend
        variables = jax.jit(self.model.init)(init_rng, example_batch.protein,
                                             example_batch.molecule)
        self.params = variables["params"]
        self.extra_vars = {k: v for k, v in variables.items() if k != "params"}
        if self._flat:
            from jax.flatten_util import ravel_pytree
            _, self._unravel = ravel_pytree(
                jax.tree_util.tree_map(np.asarray, self.params))
            self._unravel_jit = jax.jit(self._unravel)
            self.params = jax.jit(
                lambda t: ravel_pytree(t)[0])(self.params)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        if mesh is not None:
            from caster_dta_tpu.parallel import mesh as pmesh
            self.params = pmesh.replicate_params(self.params, mesh)
            self.opt_state = pmesh.replicate_params(self.opt_state, mesh)
            if self.extra_vars:
                self.extra_vars = pmesh.replicate_params(self.extra_vars, mesh)
            self.rng = pmesh.replicate_params(self.rng, mesh)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._train_scan = self._build_train_scan()
        self._eval_scan = self._build_eval_scan()

    # --------------------------------------------------------- param carry
    # With config.flat_params the step carry (self.params) is ONE flat f32
    # vector; these helpers convert at the API boundary (checkpoints,
    # inference, partitioned steps keep the pytree format).
    def params_pytree(self):
        return self._unravel_jit(self.params) if self._flat else self.params

    def set_params(self, tree):
        """Adopt a params PYTREE (raveling it if this trainer runs flat)."""
        if self._flat:
            from jax.flatten_util import ravel_pytree
            self.params = jax.jit(lambda t: ravel_pytree(t)[0])(tree)
        else:
            self.params = tree

    def _as_tree(self, params):
        """Trace-time view of the step's params operand as a pytree."""
        return self._unravel(params) if self._flat else params

    # ------------------------------------------------------------------ steps
    def _build_train_step(self):
        model, tx = self.model, self.tx

        def loss_fn(params, batch, rng):
            variables = {"params": self._as_tree(params), **self.extra_vars}
            pred, _ = model.apply(variables, batch.protein, batch.molecule,
                                  deterministic=False, rngs={"dropout": rng},
                                  return_attention=False)
            pred = pred[:, 0].astype(jnp.float32)
            w = batch.weight
            loss = jnp.sum(w * (pred - batch.target) ** 2) / jnp.maximum(w.sum(), 1.0)
            return loss, pred

        # donate params/opt_state/rng: consumed and re-produced every step,
        # so XLA updates them in place instead of allocating fresh buffers.
        # The PRNG split and the learning-rate injection both happen INSIDE
        # the step: per batch the host issues exactly ONE dispatch whose only
        # host-side operands are the small row/target/weight/lr arrays — on a
        # remote-device (tunnel) backend every extra per-batch device op is a
        # round trip, and these dominated Davis epoch time before.
        @functools.partial(jax.jit, donate_argnums=(0, 1, 3))
        def step(params, opt_state, batch, rng, lr):
            rng, step_rng = jax.random.split(rng)
            (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, step_rng)
            set_learning_rate(opt_state, lr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, pred, rng

        return step

    def _build_train_scan(self):
        """k optimizer steps in one dispatch: lax.scan over a MegaBatch's
        [k, B] row/target/weight arrays, gathering each step's graphs from
        the bucket's device-resident stores inside the scan body. Per-step
        semantics (rng split, lr injection, donation) are identical to
        _build_train_step — with a single-bucket loader the two paths
        produce the same parameter trajectory."""
        model, tx = self.model, self.tx

        @functools.partial(jax.jit, donate_argnums=(0, 1, 3))
        def scan_steps(params, opt_state, mega, rng, lrs):
            p_store, m_store = mega.p_store, mega.m_store

            def body(carry, xs):
                params, opt_state, rng = carry
                p_rows, m_rows, target, weight, lr = xs
                rng, step_rng = jax.random.split(rng)
                protein = jax.tree_util.tree_map(lambda a: a[p_rows], p_store)
                molecule = jax.tree_util.tree_map(lambda a: a[m_rows], m_store)

                def loss_fn(params):
                    variables = {"params": self._as_tree(params),
                                 **self.extra_vars}
                    pred, _ = model.apply(variables, protein, molecule,
                                          deterministic=False,
                                          rngs={"dropout": step_rng},
                                          return_attention=False)
                    pred = pred[:, 0].astype(jnp.float32)
                    loss = (jnp.sum(weight * (pred - target) ** 2)
                            / jnp.maximum(weight.sum(), 1.0))
                    return loss, pred

                (_, pred), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                set_learning_rate(opt_state, lr)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), pred

            xs = (mega.p_rows, mega.m_rows, mega.target, mega.weight, lrs)
            (params, opt_state, rng), preds = jax.lax.scan(
                body, (params, opt_state, rng), xs)
            return params, opt_state, preds, rng

        return scan_steps

    def _build_eval_scan(self):
        model = self.model

        @jax.jit
        def scan_steps(params, mega):
            p_store, m_store = mega.p_store, mega.m_store

            def body(_, xs):
                p_rows, m_rows = xs
                protein = jax.tree_util.tree_map(lambda a: a[p_rows], p_store)
                molecule = jax.tree_util.tree_map(lambda a: a[m_rows], m_store)
                variables = {"params": self._as_tree(params),
                             **self.extra_vars}
                pred, _ = model.apply(variables, protein, molecule,
                                      deterministic=True,
                                      return_attention=False)
                return None, pred[:, 0].astype(jnp.float32)

            _, preds = jax.lax.scan(body, None, (mega.p_rows, mega.m_rows))
            return preds

        return scan_steps

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def step(params, batch):
            variables = {"params": self._as_tree(params), **self.extra_vars}
            pred, _ = model.apply(variables, batch.protein, batch.molecule,
                                  deterministic=True,
                                  return_attention=False)
            return pred[:, 0].astype(jnp.float32)

        return step

    # ----------------------------------------------------------------- epochs
    def _place(self, batch):
        """Shard a batch over the dp mesh (no-op single-device)."""
        if self.mesh is None:
            return batch
        from caster_dta_tpu.parallel import mesh as pmesh
        return pmesh.shard_batch(batch, self.mesh)

    def _use_scan(self, loader) -> bool:
        return self.config.scan_steps and hasattr(loader, "iter_megabatches")

    def _train_epoch_scan(self, loader, lr, scheduler, epoch, total_train,
                          unscale, meter):
        """One dispatch per bucket per epoch (see _build_train_scan)."""
        buf = jnp.zeros((max(len(loader), 1), _max_batch_width(loader)),
                        jnp.float32)
        k0 = 0
        n_processed = 0
        deferred = []   # (mask, target, n_real) in dispatch order
        for mega, edges_per_step in loader.iter_megabatches():
            k = mega.n_steps
            # per-step learning rates precomputed host-side: the batch-level
            # scheduler is a pure function of processed-pair counts, which
            # the megabatch's weight rows expose before dispatch
            lrs = np.empty(k, np.float32)
            mega_real = 0
            for j in range(k):
                lrs[j] = lr
                n_real = int((mega.weight[j] > 0).sum())
                n_processed += n_real
                mega_real += n_real
                deferred.append((mega.weight[j] > 0, mega.target[j], n_real))
                if scheduler is not None and total_train:
                    lr = scheduler.step(epoch + n_processed / total_train)
            self.params, self.opt_state, preds, self.rng = self._train_scan(
                self.params, self.opt_state, self._place(mega), self.rng, lrs)
            buf = _acc_block(buf, preds, np.int32(k0))
            k0 += k
            if meter is not None:
                meter.step(sum(edges_per_step), mega_real)
        host = np.asarray(buf)
        losses, sizes = [], []
        for row, (mask, target, n_real) in zip(host, deferred):
            pred_np = row[: len(mask)][mask]
            target_np = target[mask]
            if unscale is not None:
                pred_np, target_np = unscale(pred_np), unscale(target_np)
            losses.append(metrics_mod.mse(pred_np, target_np))
            sizes.append(n_real)
        return float(np.average(losses, weights=sizes)), lr

    def _eval_epoch_scan(self, loader, unscale):
        buf = jnp.zeros((max(len(loader), 1), _max_batch_width(loader)),
                        jnp.float32)
        k0 = 0
        deferred = []
        for mega, _ in loader.iter_megabatches():
            preds = self._eval_scan(self.params, self._place(mega))
            buf = _acc_block(buf, preds, np.int32(k0))
            k0 += mega.n_steps
            for j in range(mega.n_steps):
                deferred.append((mega.weight[j] > 0, mega.target[j],
                                 mega.pair_idx[j]))
        host = np.asarray(buf)
        losses, sizes = [], []
        all_pred, all_target, all_idx = [], [], []
        for row, (mask, target, pair_idx) in zip(host, deferred):
            pred_np, target_np = row[: len(mask)][mask], target[mask]
            if unscale is not None:
                pred_np, target_np = unscale(pred_np), unscale(target_np)
            losses.append(metrics_mod.mse(pred_np, target_np))
            sizes.append(int(mask.sum()))
            all_pred.append(pred_np)
            all_target.append(target_np)
            all_idx.append(pair_idx[mask])
        return (float(np.average(losses, weights=sizes)),
                np.concatenate(all_pred), np.concatenate(all_target),
                np.concatenate(all_idx))

    def train_epoch(self, loader: BucketedLoader, lr: float,
                    scheduler=None, epoch: int = 0, total_train: int = 0,
                    unscale=None, meter=None):
        if self._use_scan(loader):
            return self._train_epoch_scan(loader, lr, scheduler, epoch,
                                          total_train, unscale, meter)
        # predictions accumulate in one device buffer until the epoch ends:
        # a single device->host transfer per epoch (see _PredAccumulator)
        n_processed = 0
        acc = _PredAccumulator(len(loader), _max_batch_width(loader))
        deferred = []   # (mask, target, n_real)
        for batch in loader:
            self.params, self.opt_state, _, pred, self.rng = self._train_step(
                self.params, self.opt_state, self._place(batch), self.rng,
                np.float32(lr))
            n_real = int(batch.weight.sum())
            n_processed += n_real
            if meter is not None:
                n_edges = getattr(loader, "last_batch_edges", None)
                if n_edges is None:  # fall back to a device sync
                    n_edges = (int(np.asarray(batch.protein.edge_mask).sum())
                               + int(np.asarray(batch.molecule.edge_mask).sum()))
                meter.step(n_edges, n_real)
            acc.append(pred)
            deferred.append((batch.weight > 0, batch.target, n_real))
            if scheduler is not None and total_train:
                lr = scheduler.step(epoch + n_processed / total_train)
        losses, sizes = [], []
        for pred_np, (mask, target, n_real) in zip(acc.to_host(), deferred):
            pred_np = pred_np[: len(mask)][mask]
            target_np = target[mask]
            if unscale is not None:
                pred_np, target_np = unscale(pred_np), unscale(target_np)
            losses.append(metrics_mod.mse(pred_np, target_np))
            sizes.append(n_real)
        return float(np.average(losses, weights=sizes)), lr

    # ----------------------------------------------- partitioned sub-epochs
    def _ensure_partitioned_steps(self):
        """Lazily build the gp-partitioned train/eval steps (requires the
        Trainer's mesh to carry a 'gp' axis)."""
        if getattr(self, "_part_train_step", None) is None:
            from caster_dta_tpu.parallel import partition as gpart
            if self.mesh is None or "gp" not in self.mesh.axis_names:
                raise ValueError("partitioned batches require a mesh with a "
                                 "'gp' axis (TrainConfig.gp)")
            gp_model = gpart.from_joint(self.model, "gp",
                                        n_shards=self.mesh.shape["gp"])
            self._part_train_step, self._part_eval_step = \
                gpart.make_partitioned_fit_steps(
                    gp_model, self.tx, self.mesh,
                    extra_vars=self.extra_vars, dp_axis="dp")

    def train_epoch_partitioned(self, loader, lr: float, scheduler=None,
                                epoch: int = 0, total_train: int = 0,
                                processed0: int = 0, unscale=None,
                                meter=None):
        """Train the ladder-overflow pairs (data/batching.py
        PartitionedLoader) with the edge-partitioned executor. Mirrors
        train_epoch's loss bookkeeping; processed0 continues the batch
        scheduler's fractional-epoch position after the standard sub-epoch."""
        self._ensure_partitioned_steps()
        n_processed = processed0
        # predictions stay on device; one transfer at epoch end
        # (ADVICE r03: per-batch np.asarray(pred) is ~2s/fetch on the
        # tunnel backend — the _PredAccumulator pattern applies here too)
        acc = _PredAccumulator(len(loader), _max_batch_width(loader))
        deferred = []
        for batch in loader:
            self.params, self.opt_state, _, pred, self.rng = \
                self._part_train_step(self.params, self.opt_state, batch,
                                      self.rng, np.float32(lr))
            acc.append(pred)
            n_real = int(batch.weight.sum())
            n_processed += n_real
            if meter is not None:
                meter.step(loader.last_batch_edges, n_real)
            deferred.append((batch.weight > 0, batch.target, n_real))
            if scheduler is not None and total_train:
                lr = scheduler.step(epoch + n_processed / total_train)
        losses, sizes = [], []
        for pred_host, (mask, target, n_real) in zip(acc.to_host(), deferred):
            pred_np = pred_host[: len(mask)][mask]
            target_np = target[mask]
            if unscale is not None:
                pred_np, target_np = unscale(pred_np), unscale(target_np)
            losses.append(metrics_mod.mse(pred_np, target_np))
            sizes.append(n_real)
        if not losses:
            return None, lr, n_processed
        return (float(np.average(losses, weights=sizes)), lr, n_processed)

    def eval_epoch_partitioned(self, loader, unscale=None):
        self._ensure_partitioned_steps()
        acc = _PredAccumulator(len(loader), _max_batch_width(loader))
        deferred = []
        for batch in loader:
            acc.append(self._part_eval_step(self.params, batch))
            deferred.append((batch.weight > 0, batch.target, batch.pair_idx))
        losses, sizes = [], []
        all_pred, all_target, all_idx = [], [], []
        for pred_host, (mask, target, pair_idx) in zip(acc.to_host(), deferred):
            pred_np, target_np = pred_host[: len(mask)][mask], target[mask]
            if unscale is not None:
                pred_np, target_np = unscale(pred_np), unscale(target_np)
            losses.append(metrics_mod.mse(pred_np, target_np))
            sizes.append(int(mask.sum()))
            all_pred.append(pred_np)
            all_target.append(target_np)
            all_idx.append(pair_idx[mask])
        if not losses:
            return None, np.zeros(0), np.zeros(0), np.zeros(0, np.int32)
        return (float(np.average(losses, weights=sizes)),
                np.concatenate(all_pred), np.concatenate(all_target),
                np.concatenate(all_idx))

    def eval_epoch(self, loader: BucketedLoader, unscale=None):
        if self._use_scan(loader):
            return self._eval_epoch_scan(loader, unscale)
        acc = _PredAccumulator(len(loader), _max_batch_width(loader))
        deferred = []
        for batch in loader:
            pred = self._eval_step(self.params, self._place(batch))   # stays on device
            acc.append(pred)
            deferred.append((batch.weight > 0, batch.target, batch.pair_idx))
        losses, sizes = [], []
        all_pred, all_target, all_idx = [], [], []
        for pred_host, (mask, target, pair_idx) in zip(acc.to_host(), deferred):
            pred_np, target_np = pred_host[: len(mask)][mask], target[mask]
            if unscale is not None:
                pred_np, target_np = unscale(pred_np), unscale(target_np)
            losses.append(metrics_mod.mse(pred_np, target_np))
            sizes.append(int(mask.sum()))
            all_pred.append(pred_np)
            all_target.append(target_np)
            all_idx.append(pair_idx[mask])
        return (float(np.average(losses, weights=sizes)),
                np.concatenate(all_pred), np.concatenate(all_target),
                np.concatenate(all_idx))


def split_dataset(dataset, seed: int, split_probs=(0.7, 0.15, 0.15)):
    """'split' column if present, else seeded random split
    (reference train_model.py:172-197)."""
    df = dataset.dataframe
    if "split" in df.columns:
        train_idx = df.index[df["split"] == "train"].tolist()
        val_idx = df.index[df["split"] == "val"].tolist()
        test_idx = df.index[df["split"] == "test"].tolist()
        return train_idx, val_idx, test_idx
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(dataset))
    n_train = int(round(split_probs[0] * len(dataset)))
    n_val = int(round(split_probs[1] * len(dataset)))
    return (perm[:n_train].tolist(), perm[n_train:n_train + n_val].tolist(),
            perm[n_train + n_val:].tolist())


def split_leakage_report(dataset, train_idx, val_idx, test_idx) -> dict:
    """Per-split protein/molecule usage counts and cross-split entity overlap
    (behavioral equivalent of the reference's leakage inspection,
    train_model.py:807-824, which builds per-split {entity: count} dicts)."""
    splits = {"train": train_idx, "val": val_idx, "test": test_idx}
    ents = {name: (set(dataset.pair_indices[i][0] for i in idxs),
                   set(dataset.pair_indices[i][1] for i in idxs))
            for name, idxs in splits.items()}
    report = {name: {"n_pairs": len(splits[name]),
                     "n_proteins": len(p), "n_molecules": len(m)}
              for name, (p, m) in ents.items()}
    overlap = {}
    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        overlap[f"{a}_{b}_proteins"] = len(ents[a][0] & ents[b][0])
        overlap[f"{a}_{b}_molecules"] = len(ents[a][1] & ents[b][1])
    report["overlap"] = overlap
    return report


def fit(model, dataset, dataset_name: str, output_folder: str,
        config: TrainConfig, max_num: int, max_batch_size: int,
        n_epochs: Optional[int] = None, verbose: bool = True,
        initial_params=None, ladder_kwargs: Optional[dict] = None):
    """Full training run with best-train/val/final checkpointing and early
    stopping; returns a result dict with test metrics
    (reference train_model.py:534-802).

    With config.gp set, proteins larger than the bucket ladder train through
    the edge-partitioned executor (parallel/partition.py) as an extra
    sub-epoch per epoch — the reference instead refuses such proteins
    (3,000-residue cap, load_data.py:218-222). ladder_kwargs overrides the
    bucket ladders (tests use tiny ladders to exercise the overflow path)."""
    gp = config.gp or 0
    if gp > 1:
        # fail fast at config validation (the same check otherwise surfaces
        # as a NotImplementedError deep inside the first partitioned trace,
        # parallel/partition.py PartitionedJointGNN.__call__)
        bc = (getattr(model, "protein_gnn_kwargs", None) or {}).get(
            "base_conv", "lbamodel")
        if bc != "lbamodel":
            raise ValueError(
                f"TrainConfig.gp: the partitioned protein tower supports "
                f"base_conv='lbamodel' only (model has base_conv={bc!r}); "
                f"train without gp or switch the protein tower")

    os.makedirs(output_folder, exist_ok=True)
    n_epochs = n_epochs if n_epochs is not None else config.n_epochs
    ladder_kwargs = ladder_kwargs or {}

    train_idx, val_idx, test_idx = split_dataset(dataset, config.seed)

    mesh = None
    store_sharding = None
    if gp > 1:
        from caster_dta_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_2d_mesh(config.n_dp or 1, gp)
        store_sharding = pmesh.replicated(mesh)
    elif config.n_dp is not None and config.n_dp > 1:
        from caster_dta_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(config.n_dp)
        store_sharding = pmesh.replicated(mesh)

    # ladder-overflow pairs route to the partitioned executor when gp is on
    ovf = {"train": [], "val": [], "test": []}
    if gp > 1:
        from caster_dta_tpu.data.batching import (PartitionedLoader,
                                                  split_overflow_indices)
        p_ladder = ladder_kwargs.get("protein_node_ladder")
        split_kw = {"protein_node_ladder": p_ladder} if p_ladder else {}
        train_idx, ovf["train"] = split_overflow_indices(dataset, train_idx,
                                                         **split_kw)
        val_idx, ovf["val"] = split_overflow_indices(dataset, val_idx,
                                                     **split_kw)
        test_idx, ovf["test"] = split_overflow_indices(dataset, test_idx,
                                                       **split_kw)

    # standard buckets shard their batch over EVERY mesh axis (dp x gp), so
    # all devices stay busy on them; partitioned batches shard pairs over dp
    # and the protein graph over gp
    n_shard_all = (config.n_dp or 1) * (gp if gp > 1 else 1)

    def mk_loader(idxs, shuffle, seed):
        # partitioned-only ladder keys (e.g. halo_ladder) are not
        # BucketedLoader parameters — filter like mk_part_loader does
        std_kw = {k: v for k, v in ladder_kwargs.items()
                  if k in ("protein_node_ladder", "edge_ladder",
                           "molecule_node_ladder", "molecule_edge_ladder",
                           "include_nodepair", "coalesce",
                           "coalesce_min_batches", "pad_cache_bytes")}
        dl = BucketedLoader(dataset, idxs, max_num=max_num,
                            max_batch_size=max_batch_size,
                            shuffle=shuffle, seed=seed,
                            batch_multiple=n_shard_all, **std_kw)
        if config.device_data_budget is not None:
            from caster_dta_tpu.data.device_cache import DeviceResidentLoader
            dl = DeviceResidentLoader.maybe(dl, config.device_data_budget,
                                            store_sharding=store_sharding)
        return dl

    def mk_part_loader(idxs, shuffle, seed):
        if gp <= 1 or not idxs:
            return None
        part_kw = {k: v for k, v in ladder_kwargs.items()
                   if k in ("protein_node_ladder", "edge_ladder",
                            "molecule_node_ladder", "molecule_edge_ladder",
                            "halo_ladder")}
        return PartitionedLoader(dataset, idxs, gp=gp, max_num=max_num,
                                 max_batch_size=max_batch_size,
                                 shuffle=shuffle, seed=seed,
                                 batch_multiple=config.n_dp or 1, **part_kw)

    train_dl = mk_loader(train_idx, True, config.seed)
    val_dl = mk_loader(val_idx, False, config.seed + 1)
    test_dl = mk_loader(test_idx, False, config.seed + 2)
    ovf_train_dl = mk_part_loader(ovf["train"], True, config.seed)
    ovf_val_dl = mk_part_loader(ovf["val"], False, config.seed + 1)
    ovf_test_dl = mk_part_loader(ovf["test"], False, config.seed + 2)

    if len(train_dl) > 0:
        example = next(iter(train_dl))
        # the example draw above consumed one epoch-indexed shuffle; reset so
        # training epoch k always uses shuffle order (seed, k) — resume
        # depends on this mapping being stable
        getattr(train_dl, "loader", train_dl).epoch = 0
    else:
        # every training pair overflows the ladder (gp path): params depend
        # only on feature dims, so init on a minimal synthetic example
        from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
        i0 = int((ovf["train"] or [0])[0])
        pg, mg, t0 = dataset[i0]
        pad = lambda g, n, e: pad_graph(
            node_s=g["node_s"], node_v=g["node_v"],
            edge_index=g["edge_index"], edge_s=g["edge_s"],
            edge_v=g["edge_v"], node_type=g["node_type"],
            edge_type=g["edge_type"], n_pad=n, e_pad=e)
        example = PairBatch(
            protein=stack_graphs([pad(pg, int(pg["n_nodes"]),
                                      int(pg["n_edges"]))]),
            molecule=stack_graphs([pad(mg, int(mg["n_nodes"]),
                                       int(mg["n_edges"]))]),
            target=np.asarray([t0], np.float32),
            weight=np.ones(1, np.float32), pair_idx=np.zeros(1, np.int32))
    trainer = Trainer(model, config, example, mesh=mesh)
    if initial_params is not None:
        trainer.set_params(initial_params)
        if mesh is not None:
            from caster_dta_tpu.parallel import mesh as pmesh
            trainer.params = pmesh.replicate_params(trainer.params, mesh)

    leakage = split_leakage_report(dataset, train_idx + ovf["train"],
                                   val_idx + ovf["val"],
                                   test_idx + ovf["test"])
    n_train_total = len(train_idx) + len(ovf["train"])
    with open(os.path.join(output_folder, "model_summary.txt"), "w") as f:
        f.write(checkpoints.param_summary(trainer.params_pytree()))
    # plain module print, the reference's model_standardprint.txt artifact
    # (train_model.py:344-349)
    with open(os.path.join(output_folder, "model_standardprint.txt"), "w") as f:
        f.write(repr(model))
    if verbose:
        print("Split leakage:", leakage, flush=True)

    unscale = dataset.unscale_target if config.print_unscaled_loss else None
    scheduler = make_scheduler(config.scheduler, config.lr)
    batch_sched = (scheduler if (config.scheduler in BATCH_SCHEDULERS
                                 and config.do_batch_schedule) else None)

    from caster_dta_tpu.utils.profiling import ThroughputMeter
    meter = ThroughputMeter()

    best_train, best_val = np.inf, np.inf
    # retention: keep only the latest best-train/best-val file (the reference
    # accumulates every improvement, train_model.py:666-682 — piles of stale
    # checkpoints; we delete the superseded one after each save)
    best_paths = {"train": None, "val": None}

    def save_best(kind, loss, epoch):
        path = os.path.join(output_folder, checkpoints.best_checkpoint_name(
            kind, dataset_name, loss, epoch))
        checkpoints.save_params(trainer.params_pytree(), path)
        old = best_paths[kind]
        if old is not None and old != path and os.path.exists(old):
            os.remove(old)
        best_paths[kind] = path

    n_since_best_val = -1
    lr = config.lr
    mean_val = np.inf
    history = []
    start_epoch = 0
    if config.resume:
        st = checkpoints.load_train_state(output_folder,
                                          trainer.params_pytree(),
                                          trainer.opt_state)
        if st is not None:
            trainer.set_params(st["params"])
            trainer.opt_state = st["opt_state"]
            trainer.rng = st["rng"]
            start_epoch = st["epoch"] + 1
            best_train, best_val = st["best_train"], st["best_val"]
            n_since_best_val = st["n_since_best_val"]
            lr = st["lr"]
            history = st["history"]
            if scheduler is not None and st["scheduler"]:
                vars(scheduler).update(st["scheduler"])
            # replay the same epoch-indexed shuffle order a straight run
            # would use at this epoch
            getattr(train_dl, "loader", train_dl).epoch = start_epoch
            if ovf_train_dl is not None:
                ovf_train_dl.epoch = start_epoch
            # adopt the interrupted run's best files so retention supersedes
            # them in place rather than accumulating a second pile
            for kind in ("train", "val"):
                try:
                    best_paths[kind] = checkpoints.get_best_model(
                        output_folder, kind)
                except FileNotFoundError:
                    pass
            if verbose:
                print(f"Resumed from epoch {st['epoch']} "
                      f"(best {best_train:.4f}/{best_val:.4f})", flush=True)
    def _combine(parts):
        """Weighted mean over (loss, n) contributions, skipping empties."""
        parts = [(l, n) for l, n in parts if l is not None and n > 0]
        if not parts:
            return np.inf
        return float(sum(l * n for l, n in parts) / sum(n for _, n in parts))

    # a resume with n_epochs <= reached epoch runs zero iterations and goes
    # straight to final-checkpoint + test eval (the "finish a timed-out
    # bounded run" workflow) — keep epoch/mean_val well-defined for it
    epoch = start_epoch - 1
    if history:
        mean_val = history[-1]["val"]
    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        mean_train, lr = ((np.inf, lr) if len(train_dl) == 0 else
                          trainer.train_epoch(
                              train_dl, lr, scheduler=batch_sched,
                              epoch=epoch, total_train=n_train_total,
                              unscale=unscale, meter=meter))
        if ovf_train_dl is not None:
            ovf_train, lr, _ = trainer.train_epoch_partitioned(
                ovf_train_dl, lr, scheduler=batch_sched, epoch=epoch,
                total_train=n_train_total, processed0=len(train_idx),
                unscale=unscale, meter=meter)
            mean_train = _combine([(mean_train, len(train_idx)),
                                   (ovf_train, len(ovf["train"]))])
        mean_val, *_ = (trainer.eval_epoch(val_dl, unscale=unscale)
                        if len(val_dl) > 0 else (np.inf,))
        if ovf_val_dl is not None:
            ovf_vloss, *_ = trainer.eval_epoch_partitioned(ovf_val_dl,
                                                           unscale=unscale)
            mean_val = _combine([(mean_val, len(val_idx)),
                                 (ovf_vloss, len(ovf["val"]))])
        n_since_best_val += 1
        marker = ""
        if mean_train < best_train:
            best_train = mean_train
            save_best("train", best_train, epoch)
            marker += "*"
        if mean_val < best_val:
            best_val = mean_val
            n_since_best_val = 0
            save_best("val", best_val, epoch)
            marker += "**"
        history.append({"epoch": epoch, "lr": lr, "train": mean_train,
                        "val": mean_val, "time_s": time.time() - t0,
                        "edges_per_s": meter.edges_per_s})
        if verbose:
            print(f"E {epoch:<5d} | LR {lr:.2E}  T {mean_train:.4f}  "
                  f"V {mean_val:.4f}  best {best_train:.4f}/{best_val:.4f} "
                  f"{marker}  ({history[-1]['time_s']:.1f}s)", flush=True)
        if n_since_best_val >= config.early_stop_epochs:
            break
        if epoch >= config.warmup_epochs and scheduler is not None:
            if config.scheduler == "plateau":
                lr = scheduler.step(metric=mean_val)
            elif batch_sched is None:
                lr = scheduler.step(epoch - config.warmup_epochs + 1)
        if (config.save_state_every
                and (epoch + 1) % config.save_state_every == 0):
            checkpoints.save_train_state(
                output_folder, params=trainer.params_pytree(),
                opt_state=trainer.opt_state, rng=trainer.rng, epoch=epoch,
                best_train=best_train, best_val=best_val,
                n_since_best_val=n_since_best_val, lr=lr, history=history,
                scheduler=scheduler)

    # final resume point: a bounded run (--n-epochs N) resumes losslessly
    # even when N is not a multiple of save_state_every
    if config.save_state_every:
        checkpoints.save_train_state(
            output_folder, params=trainer.params_pytree(),
            opt_state=trainer.opt_state,
            rng=trainer.rng, epoch=epoch, best_train=best_train,
            best_val=best_val, n_since_best_val=n_since_best_val, lr=lr,
            history=history, scheduler=scheduler)
    checkpoints.save_params(trainer.params_pytree(), os.path.join(
        output_folder, checkpoints.best_checkpoint_name(
            "final", dataset_name, mean_val, epoch)))

    # test evaluation with the best-val params. A resumed bounded run whose
    # continued epochs never beat the restored best val (and whose best
    # files were pruned/absent) has no best checkpoint — evaluate with the
    # current params instead of crashing.
    try:
        best = checkpoints.get_best_model(output_folder, "val")
        trainer.set_params(
            checkpoints.load_params(trainer.params_pytree(), best))
    except FileNotFoundError:
        if verbose:
            print("no best-val checkpoint on disk; test-evaluating with "
                  "the final params", flush=True)
    preds, targets = [], []
    if len(test_dl) > 0:
        _, pred, target, _ = trainer.eval_epoch(
            test_dl, unscale=dataset.unscale_target)
        preds.append(pred)
        targets.append(target)
    if ovf_test_dl is not None:
        _, pred, target, _ = trainer.eval_epoch_partitioned(
            ovf_test_dl, unscale=dataset.unscale_target)
        preds.append(pred)
        targets.append(target)
    if preds:
        report = metrics_mod.regression_report(np.concatenate(preds),
                                               np.concatenate(targets))
    else:   # empty test split: report nothing rather than crash on concat
        report = {"note": "test split empty — no test metrics computed"}
    return {"history": history, "test_metrics": report,
            "best_val": best_val, "best_train": best_train,
            "throughput": meter.summary(), "leakage": leakage,
            "overflow_pairs": {k: len(v) for k, v in ovf.items()},
            "params": trainer.params_pytree(), "trainer": trainer}
