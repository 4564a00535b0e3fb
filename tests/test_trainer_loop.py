"""Trainer epoch-loop tests: host prefetch, dispatch-amortized chunking
(full k-chunks + remainder fallback to single steps), curriculum phase
switch, and best/final checkpoints through Trainer.fit().

Behavioral parity target: /root/reference/humor/train/train_humor.py
train() (:117-299). The k-step dispatch path itself is parity-pinned by
tests/test_train_multi.py; this file pins the LOOP wiring around it.
"""

import os

import numpy as np
import pytest

from humor_tpu.body_model.smpl import synthetic_smpl_model
from humor_tpu.data.synthetic import synthetic_world_batch
from humor_tpu.data.windows import window_to_pairs
from humor_tpu.losses.elbo import LossConfig
from humor_tpu.models import humor as H
from humor_tpu.train.trainer import (Trainer, TrainRunConfig,
                                     _AUTO_STEPS_PER_DISPATCH, _prefetch)

MODEL = synthetic_smpl_model()
B, T = 4, 5


def make_batch(seed):
    world, meta = synthetic_world_batch(seed, B, T + 1, model=MODEL)
    data_in, data_out, _ = window_to_pairs(world)
    return {"data_in": data_in, "data_out": data_out,
            "betas": meta["betas"], "gender_ids": meta["gender_ids"]}


def batch_fn(n):
    def gen(epoch):
        for i in range(n):
            yield make_batch(epoch * 1000 + i)
    return gen


class TestPrefetch:
    def test_order_preserved(self):
        assert list(_prefetch(iter(range(37)), depth=3)) == list(range(37))

    def test_exception_propagates(self):
        def boom():
            yield 1
            raise ValueError("gather failed")

        it = _prefetch(boom(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="gather failed"):
            next(it)

    def test_empty(self):
        assert list(_prefetch(iter(()), depth=2)) == []

    def test_abandoned_consumer_unblocks_worker(self):
        # the consumer stops mid-stream (e.g. a train-step exception);
        # the worker must exit instead of blocking on q.put forever
        import threading
        import time

        started = threading.Event()
        exited = threading.Event()

        def slow_src():
            try:
                started.set()
                for i in range(1000):
                    yield i
            finally:
                exited.set()

        it = _prefetch(slow_src(), depth=1)
        assert next(it) == 0
        started.wait(timeout=5)
        it.close()  # abandon: generator finally sets the stop event
        assert exited.wait(timeout=5), "prefetch worker leaked"


class TestTrainerLoop:
    def _run_cfg(self, tmp_path, **kw):
        kw.setdefault("out_dir", str(tmp_path))
        kw.setdefault("epochs", 2)
        kw.setdefault("use_mesh", False)
        kw.setdefault("val_every", 1)
        kw.setdefault("save_every", 100)
        kw.setdefault("print_every", 1)
        # epoch 0 supervised, epoch 1 scheduled sampling: both step
        # families run through the loop
        kw.setdefault("sched_samp_start", 1)
        kw.setdefault("sched_samp_end", 3)
        return TrainRunConfig(**kw)

    def test_auto_steps_per_dispatch_resolves(self, tmp_path):
        tr = Trainer(H.HumorConfig(), LossConfig(smpl_joint_loss=0.0,
                                                 smpl_mesh_loss=0.0,
                                                 smpl_joint_consistency_loss=0.0),
                     self._run_cfg(tmp_path),  # default steps_per_dispatch=0
                     train_batches=batch_fn(1), steps_per_epoch=1)
        assert tr.k == _AUTO_STEPS_PER_DISPATCH
        assert tr.multi_sup is not None

    def test_fit_chunks_and_checkpoints(self, tmp_path):
        # 5 batches at k=2 -> two full multi-step chunks + a 1-batch
        # remainder through the single-step path, every epoch
        loss_cfg = LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                              smpl_joint_consistency_loss=0.0)
        run_cfg = self._run_cfg(tmp_path, steps_per_dispatch=2)
        tr = Trainer(H.HumorConfig(), loss_cfg, run_cfg,
                     train_batches=batch_fn(5), val_batches=batch_fn(2),
                     steps_per_epoch=5, seed=3)
        out = tr.fit()
        assert np.isfinite(out["min_train_loss"])
        assert np.isfinite(out["min_val_loss"])
        # 2 epochs x (2 multi-chunks x 2 steps + 1 single) = 10 steps
        assert int(tr.state.step) == 10
        for name in ("best_train_model.npz", "best_model.npz",
                     "final_model.npz"):
            assert os.path.exists(os.path.join(str(tmp_path), name)), name

    def test_remainder_steps_all_feed_tracker(self, tmp_path):
        # 5 batches at k=2 -> every one of the 5 steps must land in the
        # epoch averages: 2 stacked chunks at weight k=2 plus 1 remainder
        # step tracked individually (round-4 advisor: the remainder loop
        # used to record only its last batch)
        from humor_tpu.utils.stats import StatTracker

        loss_cfg = LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                              smpl_joint_consistency_loss=0.0)
        run_cfg = self._run_cfg(tmp_path, steps_per_dispatch=2)
        tr = Trainer(H.HumorConfig(), loss_cfg, run_cfg,
                     train_batches=batch_fn(5), steps_per_epoch=5, seed=3)
        tracker = StatTracker(str(tmp_path))
        tr._run_epoch(0, tracker)
        assert tracker.meters["total_loss"].count == 5

    def test_stack_batches_keeps_device_arrays_on_device(self):
        # device-resident batches (the CLI's make_batch_fn path) must
        # stack via jnp, not a host readback + re-upload per leaf
        import jax
        import jax.numpy as jnp

        from humor_tpu.train import step as TS

        dev = [{"a": jnp.arange(3.0) + i, "b": np.full((2,), i)}
               for i in range(4)]
        stacked = TS.stack_batches(dev)
        assert isinstance(stacked["a"], jax.Array)
        np.testing.assert_allclose(
            np.asarray(stacked["a"]),
            np.stack([np.arange(3.0) + i for i in range(4)]))
        np.testing.assert_allclose(np.asarray(stacked["b"]),
                                   np.stack([np.full((2,), i)
                                             for i in range(4)]))

    def test_prefetch_off_matches_on(self, tmp_path):
        loss_cfg = LossConfig(smpl_joint_loss=0.0, smpl_mesh_loss=0.0,
                              smpl_joint_consistency_loss=0.0)
        losses = []
        for depth in (0, 2):
            run_cfg = self._run_cfg(tmp_path / f"d{depth}",
                                    steps_per_dispatch=1, epochs=1,
                                    prefetch_depth=depth)
            tr = Trainer(H.HumorConfig(), loss_cfg, run_cfg,
                         train_batches=batch_fn(3), steps_per_epoch=3,
                         seed=7)
            losses.append(tr.fit()["min_train_loss"])
        assert losses[0] == pytest.approx(losses[1], rel=1e-6)
