"""Training runtime: epoch loop with the scheduled-sampling curriculum,
validation, best-model checkpointing, and DP sharding.

Behavioral parity target: /root/reference/humor/train/train_humor.py
(train(): curriculum :117-185, NaN skip :199-211, per-epoch val + best
checkpoints :248-299, MultiStepLR :114,301).

TPU-first: the loop body is the jitted steps in humor_tpu.train.step;
host work per step is one stats fetch. Data parallelism is automatic over
whatever devices the mesh holds (1 chip in this image; v5e-8 in prod).
"""

from __future__ import annotations

import itertools
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np

from humor_tpu.losses.elbo import LossConfig
from humor_tpu.models import humor as H
from humor_tpu.parallel.mesh import make_mesh, shard_batch
from humor_tpu.train import step as TS
from humor_tpu.utils.checkpoint import load_state, save_state
from humor_tpu.utils.logging import Logger
from humor_tpu.utils.stats import StatTracker


@dataclass
class TrainRunConfig:
    out_dir: str = "./out/humor_train"
    epochs: int = 200
    lr: float = 1e-4
    sched_milestones: tuple = (50, 80, 140)
    sched_decays: tuple = (0.5, 0.2, 0.4)
    sched_samp_start: int = 10
    sched_samp_end: int = 20
    val_every: int = 2
    save_every: int = 25
    print_every: int = 10
    use_mesh: bool = True
    resume_ckpt: Optional[str] = None
    load_optim: bool = True
    # HuMoR-Qual: feed SMPL-forward joints back during scheduled sampling
    # (reference model_use_smpl_joint_inputs, utils/config.py:201-202)
    use_smpl_joint_inputs: bool = False
    # k > 1: lax.scan k steps per device dispatch (amortizes the ~32-44 ms
    # fixed per-step host/dispatch cost, step.make_multi_steps). Logging
    # granularity coarsens to one tracker update per k steps. 0 = auto
    # (the measured amortization knee, RESULTS.md "Training throughput").
    steps_per_dispatch: int = 0
    # items pre-gathered ahead of the device by a daemon thread (the
    # reference uses torch DataLoader workers for the same overlap,
    # train_humor.py:130-141); at k > 1 one item is a whole stacked
    # k-step chunk, so the buffer holds depth*k batches; 0 disables the
    # thread
    prefetch_depth: int = 2


# measured dispatch-amortization knee on the chip (RESULTS.md "Training
# throughput"): 67.9 / 41.1 / 36.4 ms per step at k=1/4/8 (B=200) and
# no further gain at k=16, so auto resolves to 8
_AUTO_STEPS_PER_DISPATCH = 8


def _prefetch(it: Iterator, depth: int) -> Iterator:
    """Pull from `it` in a daemon thread, up to `depth` items ahead of
    the consumer, so host-side window gather overlaps device compute
    (the reference gets the same overlap from torch DataLoader workers,
    train_humor.py:130-141). Exceptions re-raise at the consumer. If the
    consumer abandons the generator early (train-step exception,
    generator GC), the `stop` event unblocks the worker so it exits
    instead of leaking a thread plus `depth` pre-gathered batches."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not _put((item, None)):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised below
            _put((_END, e))
        else:
            _put((_END, None))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item, exc = q.get()
            if item is _END:
                if exc is not None:
                    raise exc
                return
            yield item
    finally:
        stop.set()


class Trainer:
    def __init__(self,
                 model_cfg: H.HumorConfig,
                 loss_cfg: LossConfig,
                 run_cfg: TrainRunConfig,
                 train_batches: Callable[[int], Iterable[Dict]],
                 val_batches: Optional[Callable[[int], Iterable[Dict]]] = None,
                 steps_per_epoch: int = 1,
                 smpl_models: Optional[Dict] = None,
                 seed: int = 0,
                 train_chunks: Optional[Callable[[int, int],
                                                 Iterable]] = None):
        """train_batches(epoch) yields batches (typed dicts, see
        humor_tpu.train.step).

        train_chunks(epoch, k), when given, replaces the k-step source:
        it yields (payload, n) where n == k means payload is already a
        stacked (k, B, ...) chunk (e.g. the device store's fused chunk
        gather, data/device_store.py sample_window_chunk) and n == 1
        means a single batch (remainder). Values must match k
        train_batches items stacked (parity pinned by
        tests/test_device_store.py)."""
        self.model_cfg = model_cfg
        self.loss_cfg = loss_cfg
        self.run_cfg = run_cfg
        self.train_batches = train_batches
        self.train_chunks = train_chunks
        self.val_batches = val_batches
        self.smpl_models = smpl_models

        os.makedirs(run_cfg.out_dir, exist_ok=True)
        Logger.init(os.path.join(run_cfg.out_dir, "train.log"))

        self.mesh = make_mesh() if run_cfg.use_mesh else None
        self.opt = TS.make_optimizer(
            lr=run_cfg.lr, milestones=run_cfg.sched_milestones,
            decays=run_cfg.sched_decays, steps_per_epoch=steps_per_epoch)
        self.state = TS.init_train_state(model_cfg, self.opt,
                                         jax.random.PRNGKey(seed))
        self.start_epoch = 0
        self.min_train_loss = float("inf")
        self.min_val_loss = float("inf")
        if run_cfg.resume_ckpt:
            restored = load_state(run_cfg.resume_ckpt, self.state.params,
                                  self.state.opt_state)
            opt_state = (restored["opt_state"] if run_cfg.load_optim
                         and restored["opt_state"] is not None
                         else self.state.opt_state)
            self.state = TS.TrainState(restored["params"], opt_state,
                                       self.state.step)
            self.start_epoch = restored["epoch"] + 1
            self.min_train_loss = restored["min_train_loss"]
            self.min_val_loss = restored["min_val_loss"]
            Logger.log(f"resumed from {run_cfg.resume_ckpt} at epoch "
                       f"{self.start_epoch}")

        self.sup_step, self.ss_step, self.eval_step = TS.make_train_steps(
            model_cfg, loss_cfg, self.opt, smpl_models, mesh=self.mesh,
            use_smpl_joint_inputs=run_cfg.use_smpl_joint_inputs)
        self.steps_per_epoch = steps_per_epoch
        self.k = (run_cfg.steps_per_dispatch
                  or _AUTO_STEPS_PER_DISPATCH)
        self.multi_sup = self.multi_ss = None
        if self.k > 1:
            self.multi_sup, self.multi_ss = TS.make_multi_steps(
                self.sup_step, self.ss_step, self.k)
        self.key = jax.random.PRNGKey(seed + 1)
        n_params = H.param_count(self.state.params)
        Logger.log(f"model params: {n_params/1e6:.2f}M; devices: "
                   f"{jax.device_count()}")

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _run_epoch(self, epoch: int, tracker: StatTracker) -> float:
        rc = self.run_cfg
        use_gt_p = TS.sched_samp_prob(epoch, rc.sched_samp_start,
                                      rc.sched_samp_end)
        k = self.k

        def _stack_source():
            # group the per-batch generator into (stacked chunk, k) /
            # (single batch, 1) items; running inside the prefetch
            # thread overlaps the device-side stack with compute
            it = iter(self.train_batches(epoch))
            while True:
                chunk = list(itertools.islice(it, k))
                if not chunk:
                    return
                if len(chunk) == k and k > 1:
                    yield TS.stack_batches(chunk), k
                else:
                    for b in chunk:
                        yield b, 1

        src = (self.train_chunks(epoch, k)
               if k > 1 and self.train_chunks is not None
               else _stack_source())
        if rc.prefetch_depth > 0:
            src = _prefetch(src, rc.prefetch_depth)
        i = 0
        chunks = 0
        for payload, n in src:
            if n == k and k > 1:
                stacked = payload
                if self.mesh is not None:
                    stacked = shard_batch(self.mesh, stacked,
                                          batch_axis_index=1)
                multi = self.multi_sup if use_gt_p >= 1.0 else self.multi_ss
                extra = () if use_gt_p >= 1.0 else (use_gt_p,)
                self.state, stats_k = multi(self.state, stacked,
                                            self._next_key(), epoch, *extra)
                stats = jax.tree_util.tree_map(
                    lambda x: x.mean(0) if hasattr(x, "ndim") and x.ndim
                    else x, stats_k)
                # one update weighted by k so every scanned step carries
                # the same weight in epoch averages as a solo step
                tracker.update(stats, n=k, global_step=int(self.state.step))
            else:
                batch = payload
                if self.mesh is not None:
                    batch = shard_batch(self.mesh, batch)
                if use_gt_p >= 1.0:
                    self.state, stats = self.sup_step(
                        self.state, batch, self._next_key(), epoch)
                else:
                    self.state, stats = self.ss_step(
                        self.state, batch, self._next_key(), epoch,
                        use_gt_p)
                tracker.update(stats,
                               global_step=int(self.state.step))
            i += n
            chunks += 1
            if chunks % rc.print_every == 0:
                n = max(self.steps_per_epoch, i)
                Logger.log(f"epoch {epoch} {tracker.progress_str(i, n)} "
                           f"(gt_p={use_gt_p:.2f})")
        if chunks % rc.print_every != 0:  # final partial-window progress
            Logger.log(f"epoch {epoch} {tracker.progress_str(i, i)} "
                       f"(gt_p={use_gt_p:.2f})")
        return tracker.averages().get("total_loss", float("nan"))

    def _run_val(self, epoch: int) -> float:
        vals = []
        for batch in self.val_batches(epoch):
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            stats = self.eval_step(self.state.params, batch,
                                   self._next_key(), epoch)
            vals.append(float(np.asarray(stats["total_loss"])))
        return float(np.mean(vals)) if vals else float("nan")

    def _ckpt(self, name: str, epoch: int):
        save_state(os.path.join(self.run_cfg.out_dir, name),
                   self.state.params, self.state.opt_state, epoch=epoch,
                   min_train_loss=self.min_train_loss,
                   min_val_loss=self.min_val_loss)

    def fit(self) -> Dict[str, float]:
        rc = self.run_cfg
        for epoch in range(self.start_epoch, rc.epochs):
            # loss-track reset around curriculum phase changes
            # (reference train_humor.py:177-189)
            if epoch in (rc.sched_samp_start, rc.sched_samp_end):
                self.min_train_loss = float("inf")
                self.min_val_loss = float("inf")
            tracker = StatTracker(rc.out_dir)
            t0 = time.time()
            train_loss = self._run_epoch(epoch, tracker)
            Logger.log(f"epoch {epoch} done in {time.time()-t0:.1f}s "
                       f"train_loss={train_loss:.5f}")

            if np.isfinite(train_loss) and train_loss < self.min_train_loss:
                self.min_train_loss = train_loss
                self._ckpt("best_train_model.npz", epoch)
            if (epoch + 1) % rc.save_every == 0:
                self._ckpt(f"epoch_{epoch:04d}.npz", epoch)
            if self.val_batches is not None and (epoch + 1) % rc.val_every == 0:
                val_loss = self._run_val(epoch)
                Logger.log(f"epoch {epoch} val_loss={val_loss:.5f}")
                if np.isfinite(val_loss) and val_loss < self.min_val_loss:
                    self.min_val_loss = val_loss
                    self._ckpt("best_model.npz", epoch)
        self._ckpt("final_model.npz", rc.epochs - 1)
        return {"min_train_loss": self.min_train_loss,
                "min_val_loss": self.min_val_loss}
