"""Profiling utils, metrics logging, and train-state checkpoint/resume."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu import configs
from cacophony_tpu.checkpoints.io import latest_step, load_train_state, save_train_state
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.train import TrainConfig, make_caco_train_step
from cacophony_tpu.train.train import init_train_state
from cacophony_tpu.utils import MetricsLogger, StageTimer


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((8, 8))
    with t.stage("matmul", result_fetch=x):
        y = x @ x
    assert t.counts["matmul"] == 1
    assert "matmul" in t.report()


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path, mirror_stdout=False)
    log.log(step=1, loss=jnp.asarray(0.5), lr=1e-4)
    log.log(step=2, loss=0.4)
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 0.5
    assert rows[1]["step"] == 2


def _tiny_batch(b=4, s=16, t=8, vocab=128):
    rng = np.random.RandomState(0)
    return {
        "audio_patches": jnp.asarray(rng.randn(b, s, 256), jnp.float32),
        "audio_time_inds": jnp.tile(jnp.arange(s) // 8, (b, 1)),
        "audio_freq_inds": jnp.tile(jnp.arange(s) % 8, (b, 1)),
        "audio_mask": jnp.ones((b, s), jnp.int32),
        "text_input_ids": jnp.asarray(rng.randint(0, vocab, (b, t)), jnp.int32),
        "text_mask": jnp.ones((b, t), jnp.int32),
    }


def test_train_state_save_resume(tmp_path):
    """Train 2 steps, checkpoint, resume, continue — identical to an
    uninterrupted run."""
    cfg = configs.caco_tiny()
    tc = TrainConfig(warmup_steps=0, total_steps=50, remat_encoder=False)
    step = make_caco_train_step(cfg, tc)
    batch = _tiny_batch()
    ckdir = str(tmp_path / "ck")

    state = init_train_state(caco_init(jax.random.PRNGKey(0), cfg), tc)
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    save_train_state(state, ckdir)
    assert latest_step(ckdir) == 2

    # continue directly
    direct, _ = step(state, batch, jax.random.PRNGKey(99))

    # resume from disk and continue
    like = init_train_state(caco_init(jax.random.PRNGKey(0), cfg), tc)
    resumed = load_train_state(ckdir, like)
    assert int(resumed.step) == 2
    cont, _ = step(resumed, batch, jax.random.PRNGKey(99))

    a = jax.tree_util.tree_leaves(direct.params)
    b = jax.tree_util.tree_leaves(cont.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_pruning(tmp_path):
    cfg = configs.caco_tiny()
    tc = TrainConfig(warmup_steps=0, total_steps=50, remat_encoder=False)
    state = init_train_state(caco_init(jax.random.PRNGKey(0), cfg), tc)
    ckdir = str(tmp_path / "ck")
    for s in range(5):
        state = state._replace(step=jnp.asarray(s, jnp.int32))
        save_train_state(state, ckdir, keep=2)
    steps = sorted(d for d in os.listdir(ckdir) if d.startswith("step_"))
    assert steps == ["step_00000003", "step_00000004"]


def test_train_runner_cli_smoke(tmp_path):
    """The training runner end-to-end (tiny, 2 steps, dp=2) through main()."""
    import csv as csv_mod
    import json

    from scipy.io import wavfile

    from cacophony_tpu.data.tokenizer import _bytes_to_unicode

    data = tmp_path / "data"
    data.mkdir()
    rows = [["file_name", "caption"]]
    for i in range(4):
        wav = (np.random.RandomState(i).randn(8000) * 0.1).astype(np.float32)
        wavfile.write(str(data / f"c{i}.wav"), 16_000,
                      (wav * 32767).astype(np.int16))
        rows.append([f"c{i}.wav", f"sound {i}"])
    with open(data / "captions.csv", "w", newline="") as f:
        csv_mod.writer(f).writerows(rows)

    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for c in _bytes_to_unicode().values():
        vocab[c] = len(vocab)
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    (tok_dir / "merges.txt").write_text("#version: 0.2\n")

    from cacophony_tpu.train.runner import main

    work = str(tmp_path / "work")
    main(["--stage", "caco", "--data-dir", str(data), "--workdir", work,
          "--tokenizer", str(tok_dir), "--steps", "2", "--batch-size", "4",
          "--buffer-seconds", "0.5", "--patches-seq-len", "16",
          "--dp", "2", "--tp", "1", "--tiny-model",
          "--checkpoint-every", "0", "--log-every", "1"])
    metrics = [json.loads(l) for l in open(os.path.join(work, "metrics.jsonl"))]
    assert len(metrics) >= 2 and np.isfinite(metrics[-1]["loss"])
