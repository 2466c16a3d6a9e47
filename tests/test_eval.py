"""Eval harness: metrics vs hand-computed values, processors + tasks
end-to-end on synthetic datasets."""

import csv
import json
import os

import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.eval.metrics import jackknife_stats, retrieval_metrics
from cacophony_tpu.eval.processors import (
    AudioCaps16kProcessor,
    Clotho16kProcessor,
    ESC50Processor,
)
from cacophony_tpu.eval.tasks import audio_captioning, audio_retrieval, zs_classification
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.runtime import CacoEngine

from tests.test_data_engine import _byte_tokenizer


def test_jackknife_matches_closed_form():
    """Jackknife of the mean: estimate == mean, std_err == sample std of the
    mean (exact identity for the mean statistic)."""
    x = np.asarray([1.0, 2.0, 3.0, 4.0, 10.0])
    s = jackknife_stats(x)
    np.testing.assert_allclose(s["estimate"], x.mean(), atol=1e-12)
    np.testing.assert_allclose(s["std_err"], x.std(ddof=1) / np.sqrt(len(x)),
                               atol=1e-12)
    assert s["ci_low"] < x.mean() < s["ci_high"]


def test_retrieval_metrics_hand_example():
    # 2 audio, 3 captions; caption c0,c1 belong to a0; c2 to a1
    keys = ["c0", "c1", "c2"]
    gt = {"a0": ["c0", "c1"], "a1": ["c2"]}
    # a0 retrieves [c2, c0, c1]; a1 retrieves [c2, c1, c0]
    indices = np.asarray([[2, 0, 1], [2, 1, 0]])
    m = retrieval_metrics(indices, ["a0", "a1"], keys, gt, "at")
    assert m["R1"]["estimate"] == pytest.approx(0.5)   # a1 hit at rank 1
    assert m["R5"]["estimate"] == pytest.approx(1.0)
    # a0: hits at ranks 2,3 → AP = (1/2 + 2/3)/2; a1: hit at rank 1 → AP = 1
    assert m["mAP10"]["estimate"] == pytest.approx(((0.5 + 2 / 3) / 2 + 1.0) / 2)

    gt_ta = {"c0": "a0", "c1": "a0", "c2": "a1"}
    ta_idx = np.asarray([[0, 1], [1, 0], [1, 0]])
    m = retrieval_metrics(ta_idx, keys, ["a0", "a1"], gt_ta, "ta")
    assert m["R1"]["estimate"] == pytest.approx(2 / 3)


def _write_wav(path, seconds, sr, seed):
    from scipy.io import wavfile

    rng = np.random.RandomState(seed)
    wav = (rng.randn(int(seconds * sr)) * 0.1).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


@pytest.fixture()
def esc50_dir(tmp_path):
    d = tmp_path / "esc"
    (d / "audio").mkdir(parents=True)
    rows = [["filename", "fold", "target", "category"]]
    for i, cat in enumerate(["dog", "rain", "dog", "siren"]):
        fname = f"clip_{i}.wav"
        _write_wav(str(d / "audio" / fname), 1.0, 44_100, seed=i)
        rows.append([fname, "1", str(i), cat])
    with open(d / "esc50.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(d)


@pytest.fixture()
def clotho_dir(tmp_path):
    d = tmp_path / "clotho"
    (d / "evaluation").mkdir(parents=True)
    rows = [["file_name"] + [f"caption_{i}" for i in range(1, 6)]]
    for i in range(3):
        fname = f"sound_{i}.wav"
        _write_wav(str(d / "evaluation" / fname), 1.5, 16_000, seed=10 + i)
        rows.append([fname] + [f"caption {i} variant {j}" for j in range(5)])
    with open(d / "clotho_captions_evaluation.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(d)


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    return CacoEngine(cfg, params, tokenizer=_byte_tokenizer(),
                      buffer_seconds=2.0, max_text_len=24, batch_size=4)


def test_esc50_processor_and_zs(esc50_dir, tiny_engine):
    proc = ESC50Processor(data_dir=esc50_dir)
    files, text, _ = proc.get_filepaths_and_descriptions()
    assert len(files) == 4
    assert text["clip_0"]["description"] == ["dog"]
    acc = zs_classification(tiny_engine, proc, verbose=False)
    assert 0.0 <= acc <= 1.0


def test_clotho_processor_and_retrieval(clotho_dir, tiny_engine):
    proc = Clotho16kProcessor(data_dir=clotho_dir)
    files, text, _ = proc.get_filepaths_and_descriptions("evaluation")
    assert len(files) == 3
    assert len(text["sound_0"]["description"]) == 5
    results = audio_retrieval(tiny_engine, proc, split="evaluation", verbose=False)
    for direction in ["audio_to_text", "text_to_audio"]:
        for metric in ["R1", "R5", "R10", "mAP10"]:
            v = results[direction][metric]["estimate"]
            assert 0.0 <= v <= 1.0, (direction, metric, v)


def test_captioning_end_to_end(clotho_dir, tiny_engine, tmp_path):
    proc = Clotho16kProcessor(data_dir=clotho_dir)
    out = str(tmp_path / "caps")
    preds, gts = audio_captioning(tiny_engine, proc, split="evaluation",
                                  output_dir=out, max_length=8,
                                  temperature=1.0, verbose=False)
    assert len(preds) == 3 and len(gts) == 3
    assert os.path.exists(os.path.join(out, "predictions.csv"))
    with open(os.path.join(out, "predictions.csv")) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "file_name,caption_predicted"
    assert len(lines) == 4


def test_audiocaps_processor_format(tmp_path):
    d = tmp_path / "ac"
    (d / "test").mkdir(parents=True)
    _write_wav(str(d / "test" / "ytid0.wav"), 0.5, 16_000, seed=1)
    with open(d / "test.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["audiocap_id", "youtube_id", "start_time", "caption"])
        w.writerow(["1", "ytid0", "0", "a dog barks"])
        w.writerow(["2", "ytid0", "0", "a loud dog"])
    proc = AudioCaps16kProcessor(data_dir=str(d))
    files, text, _ = proc.get_filepaths_and_descriptions("test")
    assert len(files) == 1
    assert text["ytid0"]["description"] == ["a dog barks", "a loud dog"]


def test_us8k_processor_format(tmp_path):
    d = tmp_path / "us8k"
    (d / "audio" / "fold1").mkdir(parents=True)
    (d / "metadata").mkdir()
    _write_wav(str(d / "audio" / "fold1" / "100032-3-0-0.wav"), 0.5, 44_100, 1)
    with open(d / "metadata" / "UrbanSound8K.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["slice_file_name", "fsID", "start", "end", "salience",
                    "fold", "classID", "class"])
        w.writerow(["100032-3-0-0.wav", "100032", "0", "0.3", "1", "1", "3",
                    "dog_bark"])
    from cacophony_tpu.eval.processors import US8KProcessor

    files, text, _ = US8KProcessor(data_dir=str(d)).get_filepaths_and_descriptions()
    assert len(files) == 1
    # underscores become spaces (reference dataset_processors.py:38)
    assert text["100032-3-0-0"]["description"] == ["dog bark"]


def test_vggsound_processor_format(tmp_path):
    d = tmp_path / "vgg"
    (d / "test").mkdir(parents=True)
    _write_wav(str(d / "test" / "clipA.wav"), 0.5, 48_000, 2)
    _write_wav(str(d / "test" / "unlabeled.wav"), 0.5, 48_000, 3)
    with open(d / "vggsound_full.json", "w") as f:
        json.dump({"clipA": "playing drums"}, f)
    from cacophony_tpu.eval.processors import VGGSoundProcessor

    files, text, _ = VGGSoundProcessor(data_dir=str(d)).get_filepaths_and_descriptions()
    assert [os.path.basename(p) for p in files] == ["clipA.wav"]  # unlabeled skipped
    assert text["clipA"]["description"] == ["playing drums"]


def test_tutas2017_processor_format(tmp_path):
    d = tmp_path / "tut"
    (d / "train").mkdir(parents=True)
    (d / "eval").mkdir()
    _write_wav(str(d / "train" / "a1.wav"), 0.5, 44_100, 4)
    _write_wav(str(d / "eval" / "b1.wav"), 0.5, 44_100, 5)
    with open(d / "meta_train.json", "w") as f:
        json.dump({"a1.wav": "beach"}, f)
    with open(d / "meta_eval.json", "w") as f:
        json.dump({"b1.wav": "bus"}, f)
    from cacophony_tpu.eval.processors import TUTAS2017Processor

    files, text, _ = TUTAS2017Processor(data_dir=str(d)).get_filepaths_and_descriptions()
    assert len(files) == 2
    assert text["a1"]["description"] == ["beach"]
    assert text["b1"]["description"] == ["bus"]


def test_cli_zs_expect_gate_end_to_end(esc50_dir, tmp_path, monkeypatch):
    """Full synthetic-artifact drive of the real-checkpoint gate (VERDICT
    r2 #10): reference-layout msgpack checkpoint + tokenizer dir + ESC-50
    disk layout → eval CLI --task zs --expect, passing within tolerance
    and exiting nonzero on drift."""
    import json as _json

    from flax.training import checkpoints as flax_checkpoints

    from cacophony_tpu.checkpoints.convert import caco_params_to_reference
    from cacophony_tpu.eval import cli

    # reference-layout checkpoint (tiny config; --tiny_model skips the
    # published param-count guard exactly like a user with a custom ckpt)
    tok = _byte_tokenizer()
    cfg = configs.caco_tiny(vocab_size=tok.vocab_size)
    params = caco_init(jax.random.PRNGKey(3), cfg)
    ckpt_dir = str(tmp_path / "ckpt")
    flax_checkpoints.save_checkpoint(
        ckpt_dir, {"0": {"params": caco_params_to_reference(
            params, audio_num_heads=cfg.audio.num_heads)}},
        step=0, overwrite=True)

    # tokenizer directory (vocab.json + merges.txt)
    tokdir = tmp_path / "tok"
    tokdir.mkdir()
    (tokdir / "vocab.json").write_text(_json.dumps(tok.vocab))
    (tokdir / "merges.txt").write_text("#version: 0.2\n")

    monkeypatch.setenv("CACOPHONY_ESC50_DIR", esc50_dir)
    argv = ["--ckpt_path", ckpt_dir, "--task", "zs", "--dataset", "esc50",
            "--tokenizer", str(tokdir), "--tiny_model", "--batch_size", "4"]
    results = cli.main(argv)
    acc = results["esc50"]
    assert 0.0 <= acc <= 1.0

    golden_ok = tmp_path / "ok.json"
    golden_ok.write_text(_json.dumps({"atol": 0.01, "expect": {"esc50": acc}}))
    cli.main(argv + ["--expect", str(golden_ok)])  # within tolerance

    golden_bad = tmp_path / "bad.json"
    golden_bad.write_text(_json.dumps(
        {"atol": 0.001, "expect": {"esc50": acc + 0.5 if acc < 0.5 else acc - 0.5}}))
    with pytest.raises(SystemExit):
        cli.main(argv + ["--expect", str(golden_bad)])
