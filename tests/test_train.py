"""Training-engine tests: loss decreases over a few epochs, checkpoints are
written, resume restores state, eval harness runs."""
import glob
import json
import os

import numpy as np
import pytest

from magnet_tpu.data import synthetic
from magnet_tpu.data.datasets import Dataset1D
from magnet_tpu.data.loader import DataLoader
from magnet_tpu.models.factory import create_model
from magnet_tpu.train.trainer import Trainer

DATA = "/tmp/magnet_test_data"


@pytest.fixture(scope="session")
def f1d_train():
    path = os.path.join(DATA, "ce_train_20x32.h5")
    if not os.path.exists(path):
        synthetic.generate_1d_file(
            path, n_train=8, n_valid=4, n_test=4, nt=20, nx=32, seed=7
        )
    return path


def _loaders(path):
    tr = DataLoader(Dataset1D(path, "train", nt=20, nx=32), 4, seed=0, prefetch=0)
    va = DataLoader(Dataset1D(path, "valid", nt=20, nx=32), 4, seed=1, prefetch=0)
    return tr, va


def test_fit_reduces_loss_and_checkpoints(tmp_path, f1d_train):
    tr, va = _loaders(f1d_train)
    model = create_model(
        "fno_1d",
        dict(modes=5, width=16, num_layers=2, time_history=10, time_future=10,
             teacher_forcing=True, loss="l1"),
    )
    trainer = Trainer(
        model, max_epochs=5, lr=2e-3, workdir=str(tmp_path / "run"), seed=0,
    )
    trainer.fit(tr, va)

    rows = [
        json.loads(l)
        for l in open(tmp_path / "run" / "metrics.jsonl").read().splitlines()
    ]
    assert len(rows) == 5
    assert rows[-1]["train_loss"] < rows[0]["train_loss"]
    assert os.path.exists(tmp_path / "run" / "checkpoints" / "best.msgpack")
    assert os.path.exists(tmp_path / "run" / "checkpoints" / "last.msgpack")

    # resume: continues from epoch 5 without error
    trainer2 = Trainer(
        model, max_epochs=6, lr=2e-3, workdir=str(tmp_path / "run2"), seed=0,
    )
    trainer2.fit(
        tr, va, resume=str(tmp_path / "run" / "checkpoints" / "last.msgpack")
    )
    rows2 = [
        json.loads(l)
        for l in open(tmp_path / "run2" / "metrics.jsonl").read().splitlines()
    ]
    assert rows2[0]["epoch"] == 5 and len(rows2) == 1


def test_early_stopping():
    from magnet_tpu.train.trainer import EarlyStopping

    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.9)
    assert not es.update(0.95)   # 1 bad
    assert es.update(0.99)       # 2 bad -> stop


def test_steplr_schedule():
    import jax.numpy as jnp

    from magnet_tpu.train.optim import make_optimizer

    tx = make_optimizer(1.0, 0.0, factor=0.1, step_size=2, steps_per_epoch=3)
    params = {"w": jnp.ones(())}
    state = tx.init(params)
    lrs = []
    for step in range(12):
        updates, state = tx.update({"w": jnp.ones(())}, state, params)
        # adam normalizes to ~1 magnitude; sign(-lr) * ~1 => |update| ~ lr
        lrs.append(float(abs(updates["w"])))
    # epochs 0-1 (steps 0-5): lr ~1; epochs 2-3 (steps 6-11): lr ~0.1
    assert lrs[0] > 0.5
    assert lrs[-1] < lrs[0] * 0.2
