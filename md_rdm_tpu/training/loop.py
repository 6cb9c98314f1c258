"""The training loop: mesh-sharded jit steps, epoch driver, checkpointing.

Replaces the Lightning Trainer assembly (train.py:41-82): seed handling,
ModelCheckpoint on max val_delta1, ReduceLROnPlateau, fast-dev-run /
overfit modes, profiler hook, progress logging.

TPU mapping: one ``jax.sharding.Mesh`` over the data axis; parameters and
optimizer state are replicated, batches sharded on axis 0.  The jit'd train
step computes a global-mean loss, so the SPMD partitioner inserts the
gradient psum over ICI automatically - no hand-written collectives
(SURVEY.md 2.8).
"""
from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from md_rdm_tpu.core.config import Config
from md_rdm_tpu.core.mesh import batch_sharding, create_mesh, replicate
from md_rdm_tpu.metrics import MetricAccumulator
from md_rdm_tpu.training.checkpoint import CheckpointManager
from md_rdm_tpu.training.module import DepthTrainer, TrainState
from md_rdm_tpu.training.optim import (
    PlateauScheduler,
    get_lr,
    make_optimizer,
    set_lr,
)
from md_rdm_tpu.utils.logging import ScalarLogger


class Trainer:
    def __init__(self, config: Config, workdir: Optional[str] = None):
        self.config = config
        base = workdir or config.train.checkpoint_dir
        if config.train.run_dirs:
            # result/<name>/run_N convention (utils.py:49-59): each run gets
            # a fresh directory; resuming reuses the resumed run's directory
            from md_rdm_tpu.utils.rundir import get_output_directory
            self.workdir = Path(get_output_directory(
                base, config.train.run_name, config.train.resume))
        else:
            self.workdir = Path(base)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.mesh = create_mesh(config.train.data_parallel)
        self.module = DepthTrainer(config)
        self.tx = make_optimizer(
            config.train.learning_rate, config.train.weight_decay,
            fast_modules=config.train.fast_modules,
            fast_multiplier=config.train.fast_lr_multiplier)
        self.scheduler = PlateauScheduler(
            mode="max", patience=config.train.plateau_patience,
            factor=config.train.plateau_factor)
        # run_dirs already nests under <run_name>/run_N; avoid rd/run_0/rd
        self.logger = ScalarLogger(
            str(self.workdir / ("logs" if config.train.run_dirs
                                else config.train.run_name)))
        self.ckpt = CheckpointManager(
            str(self.workdir / "checkpoints"),
            monitor=config.train.monitor, mode="max",
            save_top_k=config.train.save_top_k)
        if config.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        # run-config dump with device info (reference train.py:65-70 yaml)
        import dataclasses
        import json
        devinfo = [f"{d.platform}:{d.device_kind}" for d in jax.devices()]
        (self.workdir / "config.json").write_text(json.dumps(
            {"config": dataclasses.asdict(config), "devices": devinfo,
             "mesh": str(self.mesh)}, indent=2, default=str))

        # explicit shardings: replicated state in AND out, batch-sharded
        # data - keeps the donated-state signature stable across steps (a
        # sharding/layout change after step 0 would otherwise trigger a
        # recompile + executable reload)
        rep = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec())
        bsh = batch_sharding(self.mesh)
        self._train_step = jax.jit(
            lambda state, x, y: self.module.train_step(state, self.tx, x, y),
            donate_argnums=(0,),
            in_shardings=(rep, bsh, bsh), out_shardings=(rep, rep))
        self._train_step_aug = jax.jit(
            lambda state, x, y, key: self.module.train_step_device_aug(
                state, self.tx, x, y, key),
            donate_argnums=(0,),
            in_shardings=(rep, bsh, bsh, rep), out_shardings=(rep, rep))
        self._eval_step = jax.jit(
            lambda state, x, y, w: self.module.eval_step(state, x, y, w),
            in_shardings=(rep, bsh, bsh, bsh), out_shardings=rep)
        self._device_augment = config.data.augment_backend == "device"
        self._aug_key = jax.random.PRNGKey(
            (config.train.seed or 0) ^ 0x5EED)

    # ------------------------------------------------------------- state ---
    def _init_sample(self, sample_x: np.ndarray) -> np.ndarray:
        """A model-shaped init sample.  With device-side augmentation the
        train loader yields RAW pre-crop images (250x333) that only
        ``train_step_device_aug`` can consume - the model itself always
        sees image_size^2, and its decoders require the 8x8 encoder grid
        (round-5 pipeline-probe regression).  Parameter shapes/values
        don't depend on the sample's contents, so a zeros dummy at the
        model size is an exact substitute."""
        s = self.config.model.image_size
        x = np.asarray(sample_x)[:1]
        if x.shape[1:3] != (s, s):
            x = np.zeros((1, s, s, x.shape[-1]), x.dtype)
        return x

    def init_state(self, sample_x: np.ndarray,
                   rng: Optional[jax.Array] = None) -> TrainState:
        seed = self.config.train.seed
        rng = rng if rng is not None else jax.random.PRNGKey(
            seed if seed is not None else 0)
        state = self.module.init(rng, self.tx,
                                 jnp.asarray(self._init_sample(sample_x)))
        return replicate(self.mesh, state)

    def warmup(self, sample_x: np.ndarray, sample_y: np.ndarray) -> None:
        """Pre-compile BOTH train-step executables before epoch 0.

        The step donates its state argument; the donated output's buffer
        layout can differ from the init-produced layout, so the second call
        of a fresh run hits a different executable than the first (a ~2 min
        reload observed on the TPU relay).  Running two throwaway steps
        caches both, so real training holds steady-state speed from step 0.

        The throwaway state comes from a fresh init (NOT a clone of the
        live state), and warmup is intended to run *before* ``init_state``:
        peak HBM then never exceeds one state's footprint, so memory-tight
        configs that fit during training also survive warmup.  The final
        donated buffers are deleted explicitly on exit.
        """
        throwaway = self.module.init(
            jax.random.PRNGKey(0), self.tx,
            jnp.asarray(self._init_sample(sample_x)))
        throwaway = replicate(self.mesh, throwaway)
        xd, yd = self._put(np.asarray(sample_x), np.asarray(sample_y))
        for _ in range(2):
            if self._device_augment:
                throwaway, logs = self._train_step_aug(
                    throwaway, xd, yd, jax.random.PRNGKey(0))
            else:
                throwaway, logs = self._train_step(throwaway, xd, yd)
        jax.block_until_ready(logs)
        jax.tree_util.tree_map(
            lambda a: a.delete() if hasattr(a, "delete") else None, throwaway)

    def restore(self, state_template: TrainState) -> Tuple[int, TrainState]:
        step, state, extra = self.ckpt.restore(state_template)
        if extra.get("scheduler"):
            self.scheduler.load_state_dict(extra["scheduler"])
        return step, replicate(self.mesh, state)

    # -------------------------------------------------------------- epochs ---
    def _put(self, x, y):
        n = self.mesh.devices.size
        b = x.shape[0]
        if b % n != 0:            # pad to a shardable batch (eval tail)
            pad = n - b % n
            x = np.concatenate([x, np.repeat(x[-1:], pad, 0)])
            y = np.concatenate([y, np.repeat(y[-1:], pad, 0)])
        s = batch_sharding(self.mesh)
        return jax.device_put(jnp.asarray(x), s), jax.device_put(
            jnp.asarray(y), s)

    def _prefetch_put(self, loader, depth: int = 2):
        """Iterate ``loader`` with host->device transfer one batch ahead.

        ``jax.device_put`` of a numpy batch blocks the calling thread for
        the wire time (~5 ms/MB measured through the TPU relay); issuing it
        from a background thread while the main thread dispatches step N
        hides the transfer of batch N+1 behind device compute - the
        double-buffering role of the reference's pin_memory+workers
        (module.py:19-28).  Yields (xd, yd, real_batch) with xd/yd already
        batch-sharded on the mesh.
        """
        import queue
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = threading.Event()

        def produce():
            try:
                for x, y in loader:
                    if stop.is_set():
                        return
                    x = np.asarray(x)
                    b_real = x.shape[0]
                    xd, yd = self._put(x, np.asarray(y))
                    q.put((xd, yd, b_real))
                q.put(None)
            except BaseException as e:              # surface loader errors
                q.put(("__error__", e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, tuple) and item[0] == "__error__":
                    raise item[1]
                yield item
        finally:
            stop.set()
            while not q.empty():    # unblock the producer, drop buffers
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def train_epoch(self, state: TrainState, loader: Iterable,
                    epoch: int) -> Tuple[TrainState, Dict[str, float]]:
        """One training epoch.

        Step metrics stay as device arrays during the loop and are fetched
        once at epoch end - a per-step ``device_get`` would force a host
        sync every step and serialize the dispatch pipeline (especially
        costly over the remote-TPU relay).  Periodic logging pays one sync
        every ``log_every`` steps.
        """
        cfg = self.config.train
        acc = MetricAccumulator(list(cfg.metrics) + ["loss"])
        logs_hist = []
        fixed_batch = None
        t_first_done = None
        t_epoch0 = time.perf_counter()
        num_steps = 0
        for i, (xd, yd, _b) in enumerate(self._prefetch_put(loader)):
            if cfg.overfit:
                if fixed_batch is None:
                    fixed_batch = (xd, yd)    # device-resident, reused
                xd, yd = fixed_batch
            if self._device_augment:
                self._aug_key, sub = jax.random.split(self._aug_key)
                state, logs = self._train_step_aug(state, xd, yd, sub)
            else:
                state, logs = self._train_step(state, xd, yd)
            logs_hist.append(logs)
            num_steps += 1
            if i == 0:
                jax.block_until_ready(logs)   # absorb compile time
                t_first_done = time.perf_counter()
            if i % cfg.log_every == 0:
                self.logger.log(int(jax.device_get(state.step)),
                                {k: float(v) for k, v in
                                 jax.device_get(logs).items()},
                                prefix="train_")
            if cfg.dev and i >= 0:
                break
        jax.block_until_ready(state.params)
        elapsed = time.perf_counter() - (t_first_done or t_epoch0)
        for logs in jax.device_get(logs_hist):
            acc.update({k: logs[k] for k in acc.names})
        avgs = acc.averages()
        avgs["step_time_s"] = (elapsed / max(num_steps - 1, 1)
                               if num_steps > 1
                               else time.perf_counter() - t_epoch0)
        avgs["images_per_sec"] = (
            self.config.data.batch_size / max(avgs["step_time_s"], 1e-9))
        return state, avgs

    def eval_epoch(self, state: TrainState, loader: Iterable,
                   epoch: int) -> Dict[str, float]:
        cfg = self.config.train
        acc = MetricAccumulator(list(cfg.metrics))
        logs_hist = []
        for i, (xd, yd, b_real) in enumerate(self._prefetch_put(loader)):
            # weight vector: 1 for real rows, 0 for the shardability padding
            w = np.zeros(xd.shape[0], np.float32)
            w[:b_real] = 1.0
            wd = jax.device_put(jnp.asarray(w), batch_sharding(self.mesh))
            logs_hist.append((self._eval_step(state, xd, yd, wd), b_real))
            if cfg.dev and i >= 0:
                break
        for logs, b_real in logs_hist:
            # per-sample (B,) vectors; padding rows sliced off so every
            # real image counts exactly once (reference batch-1 semantics)
            acc.update_per_sample(jax.device_get(logs), b_real)
        return acc.averages()

    def fit(self, state: TrainState, train_loader: Iterable,
            val_loader: Iterable) -> TrainState:
        cfg = self.config.train
        # Lightning semantics (reference train.py:15,51): max_epochs bounds
        # training; min_epochs only defers early stopping (none here), so
        # min_epochs > max_epochs still trains max_epochs.
        if cfg.min_epochs > cfg.max_epochs:
            import warnings
            warnings.warn(
                f"min_epochs={cfg.min_epochs} > max_epochs={cfg.max_epochs}:"
                " max_epochs bounds training (Lightning semantics)")
        for epoch in range(cfg.max_epochs):
            state, train_metrics = self.train_epoch(state, train_loader, epoch)
            val_metrics = self.eval_epoch(state, val_loader, epoch)
            self.logger.log(epoch, train_metrics, prefix="epoch_train_")
            self.logger.log(epoch, val_metrics, prefix="val_")

            # fusion-weight slot tracking (optimal-set learning runs):
            # the weight vectors are tiny (<= 8 slots x 5), so logging them
            # per epoch is free and shows whether the relative decoders'
            # candidates engage (their slots move away from |N(0,1)| init)
            wl = state.params.get("weight_layer")
            if wl:
                flat = {f"w_{k}[{i}]": float(v)
                        for k, vec in sorted(jax.device_get(wl).items())
                        for i, v in enumerate(np.asarray(vec).ravel())}
                self.logger.log(epoch, flat, prefix="fusion_")

            monitored = val_metrics[cfg.monitor]
            lr = get_lr(state.opt_state)
            new_lr = self.scheduler.step(monitored, lr)
            if new_lr != lr:
                state = state.replace(
                    opt_state=set_lr(state.opt_state, new_lr))
            self.logger.log(epoch, {"lr": new_lr})

            # top-k pre-check BEFORE device_get: fetching the full train
            # state through the relay is the dominant epoch cost (1.6 GB
            # for the f32 optimal-set state), and orbax evicts only after
            # serializing - skip non-keepers entirely.
            if self.ckpt.would_keep(val_metrics):
                self.ckpt.save(
                    epoch, jax.device_get(state), val_metrics,
                    extra={"scheduler": self.scheduler.state_dict()})
            print(f"epoch {epoch}: "
                  + " ".join(f"val_{k}={v:.4f}"
                             for k, v in val_metrics.items())
                  + f" lr={new_lr:.2e}"
                  f" step_time={train_metrics['step_time_s']*1e3:.1f}ms")
            if cfg.dev:
                break
        return state
