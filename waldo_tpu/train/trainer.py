"""Training loop (re-design of reference helpers/synthesizer_trainer.py:42-143).

Iteration-based: one step per active mode per iteration, periodic eval with
metric-gated "best" checkpoints, periodic latest checkpoints, TensorBoard
scalars. TPU-native: every loss mode is one jitted sharded step over the
device mesh; the reference's `accum_ema` dead code and never-called
`initialize_amp` are intentionally not reproduced.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, save_config
from ..data import create_dataset, DataLoader, InfiniteLoader
from ..models import Synthesizer
from ..parallel import make_mesh, shard_batch, replicate, init_distributed, set_active_mesh
from .train_state import NetState, make_optimizer, train_step_fn
from .checkpoint import CheckpointManager, normalize_which
from .logger import Logger

MODE_TO_NET = {
    "vid_object_extractor": "pe",
    "img_object_extractor": "pe",
    "vid_pose_generator": "pg",
    "vid_inpainting": "ii",
    "vid_inpainting_dis": "id",
}


class Trainer:
    def __init__(self, cfg: Config):
        init_distributed()
        self.cfg = cfg
        self.is_main = jax.process_index() == 0
        self.mesh = make_mesh(cfg.mesh_shape, tuple(cfg.mesh_axes))
        set_active_mesh(self.mesh)
        self.syn = Synthesizer(cfg)
        self.ckpt = CheckpointManager(cfg.checkpoint_path)
        self.logger = Logger(cfg.log_path) if self.is_main else None
        if self.is_main:
            save_config(cfg)

        params = self.syn.init_params(jax.random.PRNGKey(cfg.seed))
        params = self._maybe_restore(params)
        tx = make_optimizer(cfg.model)
        self.states: Dict[str, NetState] = {}
        for net, p in params.items():
            self.states[net] = replicate(NetState.create(p, tx), self.mesh)

        self._steps = {}
        modes = list(cfg.vid_modes) + list(cfg.img_modes)
        # discriminator step runs after the generator when "dis" is active
        # (reference synthesizer_trainer step order, synthesizer.py:640-678)
        if "vid_inpainting" in modes and "dis" in cfg.model.vid_inpainting_losses:
            modes.append("vid_inpainting_dis")
        self._train_modes = modes
        for mode in modes:
            if mode in MODE_TO_NET:
                self._steps[mode] = self._build_step(mode)

        self.train_loader = None
        self.valid_loader = None
        self._visual_fns = {}

    # -- checkpoint wiring (reference synthesizer.py:95-99) --

    def _maybe_restore(self, params):
        m = self.cfg.model
        specs = [
            ("pe", m.load_path, m.which_iter),
            ("pg", m.pg_load_path, m.pg_iter),
            ("ii", m.ii_load_path, m.ii_iter),
        ]
        for label, load_path, which in specs:
            if label not in params:
                continue
            which = normalize_which(which)
            try:
                if load_path or self.cfg.cont_train:
                    params[label] = self.ckpt.restore(
                        label, params[label], which=which, load_path=load_path
                    )
                    if self.is_main:
                        print(f"[ckpt] restored {label} ({which}) from {load_path or self.cfg.checkpoint_path}")
            except FileNotFoundError:
                if self.is_main:
                    print(f"[ckpt] no checkpoint for {label}, training from scratch")
        return params

    # -- jitted steps --

    def _build_step(self, mode):
        syn = self.syn

        if mode in ("vid_object_extractor", "img_object_extractor"):
            def loss_fn(params, batch, rng, it):
                return syn.extract_object_loss(
                    params, batch, rng, it, is_img=mode.startswith("img")
                )

            def step(state_pe, _states, batch, rng, it):
                return train_step_fn(loss_fn)(state_pe, batch, rng, it)

            net = "pe"
        elif mode == "vid_pose_generator":
            def loss_fn(params, pe_params, batch, rng, it):
                return syn.generate_pose_loss(params, pe_params, batch, rng, it)

            def step(state_pg, states, batch, rng, it):
                return train_step_fn(loss_fn)(state_pg, states["pe"].params, batch, rng, it)

            net = "pg"
        elif mode == "vid_inpainting":
            def loss_fn(params, pe_params, batch, rng, it, id_params=None):
                return syn.inpaint_loss(params, pe_params, batch, rng, it,
                                        id_params=id_params)

            def step(state_ii, states, batch, rng, it):
                idp = states["id"].params if "id" in states else None
                return train_step_fn(
                    lambda p, b, r, i: loss_fn(p, states["pe"].params, b, r, i, idp)
                )(state_ii, batch, rng, it)

            net = "ii"
        elif mode == "vid_inpainting_dis":
            def step(state_id, states, batch, rng, it):
                return train_step_fn(
                    lambda p, b, r, i: syn.discriminate_loss(
                        p, states["ii"].params, states["pe"].params, b, r, i
                    )
                )(state_id, batch, rng, it)

            net = "id"
        else:
            raise ValueError(mode)

        jitted = jax.jit(step, donate_argnums=(0,))
        return net, jitted

    def _eval_metrics(self, mode, batch, rng):
        syn = self.syn
        net = MODE_TO_NET[mode]
        params = self.states[net].params
        if mode in ("vid_object_extractor", "img_object_extractor"):
            _, metrics = syn.extract_object_loss(params, batch, rng, 0,
                                                 is_img=mode.startswith("img"))
        elif mode == "vid_pose_generator":
            _, metrics = syn.generate_pose_loss(params, self.states["pe"].params, batch, rng, 0)
        elif mode == "vid_inpainting":
            _, metrics = syn.inpaint_loss(params, self.states["pe"].params, batch, rng, 0)
        else:
            return {}
        return metrics

    # -- loop --

    def run(self, num_iter: Optional[int] = None):
        cfg = self.cfg
        num_iter = num_iter if num_iter is not None else cfg.num_iter
        fold_kw = {}
        if cfg.data.num_folds_train:
            fold_kw = dict(num_folds=cfg.data.num_folds_train,
                           fold=cfg.data.init_fold_train)
        train_ds = create_dataset(cfg, phase="train", **fold_kw)
        self.train_loader = InfiniteLoader(
            DataLoader(train_ds, cfg.batch_size_vid, shuffle=True, seed=cfg.seed,
                       num_workers=cfg.data.num_workers)
        )
        eval_every = cfg.num_iter_eval
        self._best_vid = None
        start_iter = 0
        if cfg.cont_train:
            # resume from the net this run actually trains: an FLP/WIF run
            # dir holds pg_*/ii_* slots only, so keying off "pe" restarted
            # those stages from 0
            nets = [self._steps[m][0] for m in self._train_modes
                    if m in self._steps]
            it = self.ckpt.latest_iter(nets[0] if nets else "pe")
            start_iter = (it + 1) if it is not None else 0

        from ..utils.heartbeat import beat

        rng = jax.random.PRNGKey(cfg.seed + 1)
        t_start = time.time()
        for it in range(start_iter, num_iter):
            beat(it)  # liveness signal for the supervisor's stall watchdog
            log = (cfg.log_freq and it % cfg.log_freq == 0) or it < 10 or (
                it < 1000 and it % 100 == 0
            )
            for mode in self._train_modes:
                if mode not in self._steps:
                    continue
                net, step = self._steps[mode]
                batch = self.train_loader.next()
                batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
                batch = shard_batch(batch, self.mesh)
                rng, sub = jax.random.split(rng)
                self.states[net], metrics = step(
                    self.states[net], self.states, batch, sub, jnp.asarray(it, jnp.float32)
                )
                # nancount is fetched only periodically: a per-iteration
                # device_get would serialize dispatch against every step. The
                # counter only resets on a finite step (train_state.py:84), so
                # a sustained NaN run is still caught at the next check — NaN
                # steps are skipped, not applied, in the meantime.
                if log or it % 25 == 0:
                    if int(jax.device_get(metrics["nancount"])) > 10:
                        raise ValueError(f"loss NaN for >10 consecutive steps in {mode}")
                if log and self.logger:
                    host_metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                    self.logger.log_scalars(f"{mode}/train", host_metrics, it)
                    # visual observability at the explicit log cadence only
                    # (reference synthesizer.py:241-282); log_freq unset =
                    # scalars-only fast path for tests/benches
                    if cfg.log_freq:
                        self._log_visuals(mode, batch, it, sub)

            if log and self.is_main:
                dt = time.time() - t_start
                print(f"Iteration {it:05d}/{num_iter:05d} ({dt:.1f}s)", flush=True)

            if eval_every and it > 0 and it % eval_every == 0:
                self.evaluate(it)

            if cfg.save_latest_freq > 0 and it % cfg.save_latest_freq == 0 and self.is_main:
                self.save(it, name="latest")
            if cfg.save_freq > 0 and it % cfg.save_freq == 0 and self.is_main:
                self.save(it)

        if self.is_main:
            self.save(num_iter - 1, name="latest")
            print("Training was successfully finished.")

    def evaluate(self, it):
        cfg = self.cfg
        # the eval dataset/loader is built once and reused: the reference
        # re-scans the data root on every eval (flagged in VERDICT r2)
        if self.valid_loader is None:
            ds = create_dataset(cfg, phase=cfg.data.eval_phase)
            self.valid_loader = DataLoader(ds, cfg.batch_size_vid, shuffle=False,
                                           num_workers=cfg.data.num_workers)
        loader = self.valid_loader
        agg = {}
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(loader):
            batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            batch = shard_batch(batch, self.mesh)
            for mode in cfg.vid_modes:
                if mode not in MODE_TO_NET:
                    continue
                metrics = self._eval_metrics(mode, batch, rng)
                for k, v in metrics.items():
                    agg.setdefault(k, []).append(float(jax.device_get(v)))
            if cfg.max_batch_eval_vid is not None and i + 1 >= cfg.max_batch_eval_vid:
                break
        means = {k: float(np.mean(v)) for k, v in agg.items()}
        if jax.process_count() > 1:
            # cross-host metric mean (reference sync_scalars, synthesizer.py:196-201)
            from jax.experimental import multihost_utils

            keys = sorted(means)
            vec = np.asarray([means[k] for k in keys], np.float32)
            vec = np.asarray(
                multihost_utils.process_allgather(vec)
            ).mean(axis=0)
            means = dict(zip(keys, vec.tolist()))
        if self.logger:
            self.logger.log_scalars("vid/eval", means, it)
            print(f"[EVAL] iter {it}: " + " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())))
        # metric-gated best checkpoint (reference synthesizer_trainer.py:107-119)
        metric = cfg.vid_metric
        if metric and metric in means and self.is_main:
            score = means[metric]
            if self._best_vid is None or score < self._best_vid:
                self._best_vid = score
                self.save(it, name="best_vid")
                print(f"[EVAL] new best_vid ({metric}={score:.4f})")
        return means

    def _log_visuals(self, mode, batch, it, rng):
        if mode not in MODE_TO_NET or self.logger is None:
            return
        if mode == "img_object_extractor":
            return  # image batches lack the video shapes the renderers expect
        fn = self._visual_fns.get(mode)
        if fn is None:
            fn = jax.jit(partial(self.syn.visuals, mode))
            self._visual_fns[mode] = fn
        try:
            params = {net: s.params for net, s in self.states.items()}
            arrays, pts = fn(params, batch, rng)
        except Exception as e:  # never let rendering kill the run
            print(f"[logger] visuals for {mode} failed: {e}")
            return
        cfg = self.cfg
        geom = (cfg.dim, int(cfg.dim * cfg.aspect_ratio))
        self.logger.log_visuals(
            f"{mode}/train", jax.device_get(arrays), jax.device_get(pts), it,
            palette=cfg.data.palette, pts_geometry=geom,
            ctx_len=cfg.model.ctx_len,
        )

    def save(self, it, name=None):
        for net, state in self.states.items():
            self.ckpt.save(net, jax.device_get(state.params), it, name=name)
