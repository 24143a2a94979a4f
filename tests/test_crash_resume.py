"""Failure-recovery test: a training run that dies mid-way must leave a
checkpoint at the dying step (the reference loses everything — it has no
resume path at all, SURVEY §5.3)."""

import numpy as np
import pytest

from codenerf_tpu.training.trainer import Trainer
from codenerf_tpu.utils import checkpoint as ckpt


def test_crash_leaves_resumable_checkpoint(tiny_scene, tiny_hparams, tmp_path):
    tr = Trainer("crash", tiny_hparams, batch_size=128, dataset=tiny_scene,
                 exps_root=str(tmp_path), check_iter=0)

    real_step = tr._train_step
    calls = {"n": 0}

    def dying_step(state, batch, *extras):
        calls["n"] += 1
        if calls["n"] > 7:
            raise RuntimeError("simulated device failure")
        return real_step(state, batch, *extras)

    tr._train_step = dying_step
    with pytest.raises(RuntimeError, match="simulated device failure"):
        tr.training(iters_crop=0, iters_all=50, log_every=100)

    # checkpoint exists at the step reached before the crash
    step = ckpt.latest_step(tr.ckpt_dir)
    assert step == 7

    tr2 = Trainer("crash", tiny_hparams, batch_size=128, dataset=tiny_scene,
                  exps_root=str(tmp_path), check_iter=0)
    assert tr2.resume()
    assert int(tr2.state.step) == 7
    m = tr2.training(iters_crop=0, iters_all=12, log_every=5)
    assert np.isfinite(m["loss"])
    assert int(tr2.state.step) == 12
