"""HEAR subsystem: scores, event extraction, and the full two-phase
pipeline on a synthetic task."""

import csv
import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.hear import score as score_lib
from cacophony_tpu.hear.predictions import (
    FASTER_PARAM_GRID,
    create_events_from_prediction,
    task_predictions,
)
from cacophony_tpu.models.caco import caco_init


def test_scene_scores():
    preds = np.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    targets = np.asarray([[1, 0], [0, 1], [0, 1]], np.float32)
    assert score_lib.top1_accuracy(preds, targets) == pytest.approx(2 / 3)
    assert 0 <= score_lib.mean_average_precision(preds, targets) <= 1
    assert 0 <= score_lib.aucroc(preds, targets) <= 1
    d = score_lib.d_prime(preds, targets)
    assert np.isfinite(d)


def test_chroma_accuracy_octave_invariance():
    # class 0 vs class 12 are the same chroma
    preds = np.zeros((1, 24))
    preds[0, 12] = 1.0
    targets = np.zeros((1, 24), np.float32)
    targets[0, 0] = 1.0
    assert score_lib.chroma_accuracy(preds, targets) == 1.0
    assert score_lib.top1_accuracy(preds, targets) == 0.0


def test_event_extraction_and_f1():
    ts = np.arange(0, 2000, 100.0)  # 100 ms frames
    pred = np.zeros((len(ts), 2))
    pred[3:9, 0] = 0.9    # event ~300-800ms class A
    pred[5, 0] = 0.2      # dropout frame → median filter should bridge it
    pred[15:17, 1] = 0.9  # short event class B
    events = create_events_from_prediction(
        pred, ts, {0: "A", 1: "B"}, median_filter_ms=250, min_duration_ms=150)
    labels = [e["label"] for e in events]
    assert "A" in labels
    a = [e for e in events if e["label"] == "A"][0]
    assert a["start"] <= 400 and a["end"] >= 700

    ref = {"f.wav": [a]}
    est = {"f.wav": [a]}
    assert score_lib.segment_based_f1(est, ref) == pytest.approx(1.0)
    assert score_lib.event_based_f1(est, ref) == pytest.approx(1.0)
    assert score_lib.onset_only_event_based_f1(est, ref) == pytest.approx(1.0)
    shifted = {"f.wav": [dict(a, start=a["start"] + 500, end=a["end"] + 500)]}
    assert score_lib.onset_only_event_based_f1(shifted, ref) == 0.0


def _write_wav(path, seconds, sr, seed):
    from scipy.io import wavfile

    rng = np.random.RandomState(seed)
    wav = (rng.randn(int(seconds * sr)) * 0.1).astype(np.float32)
    wavfile.write(str(path), sr, (wav * 32767).astype(np.int16))


@pytest.fixture()
def hear_task_dir(tmp_path):
    """Minimal HEAR scene task: 8 clips, 2 classes, train/valid/test."""
    task = tmp_path / "tasks" / "toy-v1.0.0-full"
    (task / "16000").mkdir(parents=True)
    metadata = {
        "task_name": "toy",
        "embedding_type": "scene",
        "prediction_type": "multiclass",
        "splits": ["train", "valid", "test"],
        "evaluation": ["top1_acc"],
        "sample_duration": 1.0,
    }
    (task / "task_metadata.json").write_text(json.dumps(metadata))
    with open(task / "labelvocabulary.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "label"])
        w.writerow(["0", "dog"])
        w.writerow(["1", "rain"])
    seed = 0
    for split, n in [("train", 6), ("valid", 4), ("test", 4)]:
        d = task / "16000" / split
        d.mkdir(parents=True)
        split_json = {}
        for i in range(n):
            name = f"{split}_{i}.wav"
            _write_wav(d / name, 1.0, 16_000, seed)
            split_json[name] = ["dog" if i % 2 == 0 else "rain"]
            seed += 1
        (task / f"{split}.json").write_text(json.dumps(split_json))
    return task


def test_hear_two_phase_pipeline(hear_task_dir, tmp_path, monkeypatch):
    """Phase A (embed via tiny CACO) then phase B (probe train + score)."""
    from cacophony_tpu.hear.embeddings import CacoHearEmbedder
    from cacophony_tpu.hear.runner import task_embeddings

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    embedder = CacoHearEmbedder(cfg, params, sample_rate=16_000,
                                audio_max_len_s=1.0, batch_size=4)

    embed_task_dir = tmp_path / "embeddings" / "caco" / hear_task_dir.name
    task_embeddings(embedder, hear_task_dir, embed_task_dir)

    # disk contract
    for split in ["train", "valid", "test"]:
        assert (embed_task_dir / f"{split}.embeddings.npy").exists()
        assert (embed_task_dir / f"{split}.target-labels.pkl").exists()
        n, dim = json.loads(
            (embed_task_dir / f"{split}.embedding-dimensions.json").read_text())
        assert dim == cfg.projection_size

    result = task_predictions(str(embed_task_dir), grid=FASTER_PARAM_GRID,
                              grid_points=2)
    assert "top1_acc" in result["test"]
    assert 0.0 <= result["test"]["top1_acc"] <= 1.0
    assert (embed_task_dir / "test.predicted-scores.json").exists()
    assert (embed_task_dir / "prediction-done.json").exists()


def test_hear_event_embeddings_shapes(tmp_path):
    from cacophony_tpu.hear.embeddings import CacoHearEmbedder, labels_for_timestamps

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    embedder = CacoHearEmbedder(cfg, params, sample_rate=16_000,
                                audio_max_len_s=2.0, batch_size=2)
    paths = []
    for i in range(2):
        p = tmp_path / f"e{i}.wav"
        _write_wav(p, 1.2, 16_000, seed=i)
        paths.append(str(p))
    emb, ts = embedder.event_embeddings(paths)
    assert emb.shape[0] == 2 and emb.shape[2] == cfg.audio.hidden_size
    assert ts.shape == emb.shape[:2]
    assert ts[0, -1] == pytest.approx(2000.0)

    labels = labels_for_timestamps(
        [[{"start": 0, "end": 900, "label": "x"}], []], ts)
    assert "x" in labels[0][0]
    assert labels[1][0] == []


@pytest.fixture()
def hear_fold_task_dir(tmp_path):
    """Minimal k-fold HEAR scene task (3 folds, like beijing_opera/gunshot)."""
    task = tmp_path / "tasks" / "foldtask-v1.0.0-full"
    (task / "16000").mkdir(parents=True)
    metadata = {
        "task_name": "foldtask",
        "embedding_type": "scene",
        "prediction_type": "multiclass",
        "splits": ["fold00", "fold01", "fold02"],
        "evaluation": ["top1_acc"],
        "sample_duration": 1.0,
    }
    (task / "task_metadata.json").write_text(json.dumps(metadata))
    with open(task / "labelvocabulary.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "label"])
        w.writerow(["0", "dog"])
        w.writerow(["1", "rain"])
    seed = 50
    for fold in metadata["splits"]:
        d = task / "16000" / fold
        d.mkdir(parents=True)
        split_json = {}
        for i in range(4):
            name = f"{fold}_{i}.wav"
            _write_wav(d / name, 1.0, 16_000, seed)
            split_json[name] = ["dog" if i % 2 == 0 else "rain"]
            seed += 1
        (task / f"{fold}.json").write_text(json.dumps(split_json))
    return task


def test_hear_kfold_pipeline(hear_fold_task_dir, tmp_path):
    from cacophony_tpu.hear.embeddings import CacoHearEmbedder
    from cacophony_tpu.hear.runner import task_embeddings

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    embedder = CacoHearEmbedder(cfg, params, sample_rate=16_000,
                                audio_max_len_s=1.0, batch_size=4)
    embed_task_dir = tmp_path / "embeddings" / "caco" / hear_fold_task_dir.name
    task_embeddings(embedder, hear_fold_task_dir, embed_task_dir)

    result = task_predictions(str(embed_task_dir), grid=FASTER_PARAM_GRID,
                              grid_points=1)
    assert result["num_folds"] == 3
    assert "test_top1_acc_mean" in result["aggregated_scores"]
    assert "test_top1_acc_std" in result["aggregated_scores"]
    assert 0.0 <= result["test"]["top1_acc"] <= 1.0


def test_hear_audiomae_embedder_route(hear_task_dir, tmp_path):
    """The audiomae embedding route through the runner (scene = mean over
    hidden states; reference audiomae_embeddings.py:163)."""
    from cacophony_tpu.hear.embeddings import AudioMAEHearEmbedder
    from cacophony_tpu.hear.runner import task_embeddings
    from cacophony_tpu.models.audio import audiomae_init

    enc = configs.AudioEncoderConfig(hidden_size=32, num_layers=2, num_heads=2,
                                     intermediate_size=64)
    dec = configs.AudioDecoderConfig(hidden_size=32, num_layers=2, num_heads=2,
                                     intermediate_size=64)
    cfg = configs.AudioMAEConfig(encoder=enc, decoder=dec)
    params = audiomae_init(jax.random.PRNGKey(0), enc, dec)
    embedder = AudioMAEHearEmbedder(cfg, params, sample_rate=16_000,
                                    audio_max_len_s=1.0, batch_size=4)
    embed_task_dir = tmp_path / "embeddings" / "audiomae" / hear_task_dir.name
    task_embeddings(embedder, hear_task_dir, embed_task_dir)
    n, dim = json.loads(
        (embed_task_dir / "test.embedding-dimensions.json").read_text())
    assert dim == enc.hidden_size and n == 4


def test_segment_error_rate_semantics():
    ref = {"f": [{"label": "A", "start": 0, "end": 2000}]}
    # perfect prediction → ER 0
    assert score_lib.segment_based_error_rate(ref, ref) == pytest.approx(0.0)
    # miss entirely → 2 deletions / 2 active segments = 1.0
    assert score_lib.segment_based_error_rate({"f": []}, ref) == pytest.approx(1.0)
    # spurious extra class in both segments → 2 insertions / 2 = +1.0
    est = {"f": ref["f"] + [{"label": "B", "start": 0, "end": 2000}]}
    assert score_lib.segment_based_error_rate(est, ref) == pytest.approx(1.0)
    # registry direction
    assert "segment_1s_er" in score_lib.LOWER_IS_BETTER
    assert score_lib.EVENT_SCORES["segment_1s_er"] is score_lib.segment_based_error_rate


def test_segment_metrics_sed_eval_exact():
    """Hand-computed sed_eval SegmentBasedMetrics fixtures: trailing
    silence, empty predictions, target-only files, boundary events."""
    # trailing silence: grid = ceil(max offset/1s) = 2 segments, NOT the
    # (longer) file duration — sed_eval defaults evaluated_length to the
    # max offset over both event lists
    ref = {"a": [{"label": "A", "start": 0.0, "end": 2000.0}]}
    est = {"a": [{"label": "A", "start": 0.0, "end": 1000.0}]}
    m = score_lib.segment_based_metrics(est, ref)
    assert m["precision"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(0.5)
    assert m["f_measure"] == pytest.approx(2 / 3)
    assert m["error_rate"] == pytest.approx(0.5)  # 1 deletion / 2 ref segs

    # empty predictions for a file STILL evaluate its reference events
    m = score_lib.segment_based_metrics({"a": []}, ref)
    assert m["f_measure"] == pytest.approx(0.0)
    assert m["error_rate"] == pytest.approx(1.0)

    # files present only in targets are NEVER evaluated (the reference
    # iterates prediction filenames, score.py:224-228)
    ref2 = dict(ref, b=[{"label": "A", "start": 0.0, "end": 60000.0}])
    m_skip = score_lib.segment_based_metrics(est, ref2)
    assert m_skip == score_lib.segment_based_metrics(est, ref)

    # zero-length event on a segment boundary marks nothing
    # (roll[floor(t/res):ceil(t/res)] is empty when floor == ceil)
    zref = {"z": [{"label": "A", "start": 1000.0, "end": 1000.0}]}
    m = score_lib.segment_based_metrics(zref, zref)
    assert m["f_measure"] == pytest.approx(0.0)
    assert m["error_rate"] == pytest.approx(0.0)

    # false alarms with an empty reference: ER divides by (Nref + eps),
    # like sed_eval — enormous, not inf
    m = score_lib.segment_based_metrics(est, {"a": []})
    assert np.isfinite(m["error_rate"]) and m["error_rate"] > 1e10


def test_event_matching_is_optimal_not_greedy():
    """sed_eval matches hits via maximum bipartite matching: r1 can yield
    its both-compatible estimate to r2 so both match."""
    ref = {"f": [{"label": "A", "start": 0.0, "end": 500.0},
                 {"label": "A", "start": 80.0, "end": 600.0}]}
    # e1 within 50ms collar of BOTH refs, e2 only of r1; greedy r1→e1
    # leaves r2 unmatched (F=0.5); optimal r1→e2, r2→e1 gives F=1.0
    est = {"f": [{"label": "A", "start": 40.0, "end": 500.0},
                 {"label": "A", "start": 10.0, "end": 500.0}]}
    f = score_lib.onset_only_event_based_f1(est, ref, t_collar_ms=50.0)
    assert f == pytest.approx(1.0)


def test_event_offset_condition():
    """Offset tolerance = max(collar, percentage_of_length · ref length)."""
    ref = {"f": [{"label": "A", "start": 0.0, "end": 1000.0}]}
    # offset off by 150ms: collar 50ms but 20% of 1000ms = 200ms → match
    est = {"f": [{"label": "A", "start": 0.0, "end": 1150.0}]}
    assert score_lib.event_based_f1(est, ref, t_collar_ms=50.0,
                                    percentage_of_length=0.2) == pytest.approx(1.0)
    # offset off by 250ms > 200ms tolerance → no match
    est = {"f": [{"label": "A", "start": 0.0, "end": 1250.0}]}
    assert score_lib.event_based_f1(est, ref, t_collar_ms=50.0,
                                    percentage_of_length=0.2) == 0.0


def test_postprocess_selection_hand_computed(monkeypatch):
    """Per-epoch postprocess selection pins the reference protocol
    (task_predictions.py:471-516): grid swept on validation predictions,
    primary score decides, ties break on the larger postprocessing tuple
    (sort(reverse=True))."""
    from cacophony_tpu.hear import predictions as P

    monkeypatch.setattr(P, "EVENT_POSTPROCESSING_GRID",
                        {"median_filter_ms": [50], "min_duration": [100, 300]})
    # 100ms frames → median ksize = max(1, round(50/100)) = 1 (no-op);
    # active frames at 200..400ms → event (200, 400), duration 200:
    # kept by min_duration=100, dropped by 300
    ts = [float(t) for t in range(0, 1000, 100)]
    fname_ts = [["clip.wav", t] for t in ts]
    probs = np.zeros((len(ts), 1), np.float32)
    probs[2:5, 0] = 0.9
    metadata = {"evaluation": ["event_onset_200ms_fms"],
                "embedding_type": "event"}
    targets = {"clip.wav": [{"label": "A", "start": 200.0, "end": 400.0}]}
    score, post = P._select_event_postprocess(
        probs, metadata, targets, fname_ts, {0: "A"})
    assert score == pytest.approx(1.0)
    assert post == {"median_filter_ms": 50, "min_duration": 100}

    # tie-break: both configs keep the event → larger tuple wins
    monkeypatch.setattr(P, "EVENT_POSTPROCESSING_GRID",
                        {"median_filter_ms": [50], "min_duration": [100, 150]})
    score, post = P._select_event_postprocess(
        probs, metadata, targets, fname_ts, {0: "A"})
    assert score == pytest.approx(1.0)
    assert post["min_duration"] == 150


def test_postprocess_selection_minimizing_primary(monkeypatch):
    """segment_1s_er MINIMIZES.  Default selection respects that (picks
    the lower ER); strict_reference_bugs=True reproduces the reference's
    unconditional descending sort (task_predictions.py:509-516), which
    picks the WORST postprocess for minimizing primaries."""
    from cacophony_tpu.hear import predictions as P

    monkeypatch.setattr(P, "EVENT_POSTPROCESSING_GRID",
                        {"median_filter_ms": [50], "min_duration": [100, 300]})
    # event (200, 400) ms, duration 200: min_duration=100 keeps it (ER 0),
    # min_duration=300 drops it (ER 1 — one deletion)
    ts = [float(t) for t in range(0, 1000, 100)]
    fname_ts = [["clip.wav", t] for t in ts]
    probs = np.zeros((len(ts), 1), np.float32)
    probs[2:5, 0] = 0.9
    metadata = {"evaluation": ["segment_1s_er"], "embedding_type": "event"}
    targets = {"clip.wav": [{"label": "A", "start": 200.0, "end": 400.0}]}

    score, post = P._select_event_postprocess(
        probs, metadata, targets, fname_ts, {0: "A"})
    assert score == pytest.approx(0.0)        # the fixed default: lowest ER
    assert post["min_duration"] == 100

    score, post = P._select_event_postprocess(
        probs, metadata, targets, fname_ts, {0: "A"},
        strict_reference_bugs=True)
    assert score == pytest.approx(1.0)        # bug-compatible: highest ER
    assert post["min_duration"] == 300


def test_tokenizer_underscore():
    from cacophony_tpu.data.tokenizer import _PRETOKEN_RE

    assert "".join(_PRETOKEN_RE.findall("air_conditioner")) == "air_conditioner"
    assert "".join(_PRETOKEN_RE.findall("dog_bark a b_c")) == "dog_bark a b_c"


def test_hear_event_task_end_to_end(tmp_path):
    """Full two-phase pipeline on a synthetic EVENT task (timestamps,
    per-frame labels, probe training, validation-selected postprocess,
    segment-ER/event-F1 scoring)."""
    from cacophony_tpu.hear.embeddings import CacoHearEmbedder
    from cacophony_tpu.hear.runner import task_embeddings

    task = tmp_path / "tasks" / "toyevent-v1.0.0-full"
    (task / "16000").mkdir(parents=True)
    metadata = {
        "task_name": "toyevent",
        "embedding_type": "event",
        "prediction_type": "multilabel",
        "splits": ["train", "valid", "test"],
        "evaluation": ["segment_1s_er", "event_onset_200ms_fms"],
        "sample_duration": 2.0,
    }
    (task / "task_metadata.json").write_text(json.dumps(metadata))
    with open(task / "labelvocabulary.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["idx", "label"])
        w.writerow(["0", "beep"])
        w.writerow(["1", "hiss"])
    seed = 100
    for split, n in [("train", 6), ("valid", 4), ("test", 4)]:
        d = task / "16000" / split
        d.mkdir(parents=True)
        split_json = {}
        for i in range(n):
            name = f"{split}_{i}.wav"
            _write_wav(d / name, 2.0, 16_000, seed)
            label = "beep" if i % 2 == 0 else "hiss"
            split_json[name] = [
                {"label": label, "start": 0.0, "end": 900.0},
                {"label": label, "start": 1200.0, "end": 1800.0},
            ]
            seed += 1
        (task / f"{split}.json").write_text(json.dumps(split_json))

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    embedder = CacoHearEmbedder(cfg, params, sample_rate=16_000,
                                audio_max_len_s=2.0, batch_size=4)
    embed_task_dir = tmp_path / "embeddings" / "caco" / task.name
    task_embeddings(embedder, task, embed_task_dir)

    # event store artifacts exist
    assert (embed_task_dir / "test.filename-timestamps.json").exists()

    result = task_predictions(str(embed_task_dir),
                              grid=FASTER_PARAM_GRID, grid_points=1)
    assert "segment_1s_er" in result["test"]
    assert result["test"]["segment_1s_er"] >= 0.0
    assert 0.0 <= result["test"]["event_onset_200ms_fms"] <= 1.0
    assert "test_segment_1s_er_std" in result["aggregated_scores"]


def test_d_prime_per_class_before_mean():
    """d' must average per-class ppf(AUC), not ppf(mean AUC) — the
    nonlinearity makes these differ (reference DPrime semantics)."""
    from scipy.stats import norm

    rng = np.random.RandomState(0)
    n = 200
    targets = np.zeros((n, 2), np.float32)
    targets[:100, 0] = 1
    targets[100:, 1] = 1
    # class 0 separable (high AUC), class 1 near-random
    preds = np.zeros((n, 2))
    preds[:, 0] = targets[:, 0] * 2 + rng.randn(n) * 0.3
    preds[:, 1] = rng.randn(n)

    from sklearn.metrics import roc_auc_score

    per_class = roc_auc_score(targets, preds, average=None)
    expected = np.mean(np.sqrt(2) * norm.ppf(np.clip(per_class, 1e-7, 1 - 1e-7)))
    got = score_lib.d_prime(preds, targets)
    assert got == pytest.approx(expected, rel=1e-6)
    wrong = np.sqrt(2) * norm.ppf(per_class.mean())
    assert abs(got - wrong) > 0.05  # the two formulations genuinely differ


def test_bipartite_matching_matches_scipy_on_random_graphs():
    """Iterative augmenting-path matching == scipy maximum matching
    (the recursive formulation could blow the recursion limit on dense
    same-label event files — review fix)."""
    import numpy as np
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching

    from cacophony_tpu.hear.score import _max_bipartite_matching

    rng = np.random.RandomState(0)
    for n, p in ((30, 0.1), (200, 0.02), (1500, 0.002)):
        m = rng.rand(n, n) < p
        adj = [list(np.nonzero(m[u])[0]) for u in range(n)]
        ours = _max_bipartite_matching(adj)
        ref = int((maximum_bipartite_matching(csr_matrix(m), perm_type="column")
                   >= 0).sum())
        assert ours == ref, (n, ours, ref)

    # fully-connected dense block (every est hits every ref): n matches,
    # and NO recursion depth involved
    n = 1500
    adj = [list(range(n))] * n
    assert _max_bipartite_matching(adj) == n


def test_probe_matches_torch_mirror():
    """The JAX probe's architecture, BN semantics, losses, and one Adam step
    are cross-checked against a torch mirror of the reference
    FullyConnectedPrediction (task_predictions.py:140-192).  Guards the
    torch→JAX probe rewrite; skipped where torch is absent."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from cacophony_tpu.hear import predictions as P

    conf = {"hidden_layers": 2, "hidden_dim": 16, "dropout": 0.0,
            "batch_size": 8, "lr": 1e-3}
    rng = np.random.RandomState(0)
    x = rng.randn(8, 12).astype(np.float32)
    y = np.zeros((8, 5), np.float32)
    y[np.arange(8), rng.randint(0, 5, 8)] = 1.0

    for ptype in ("multiclass", "multilabel"):
        model = P.MLPProbe(12, 5, ptype, conf, seed=0)

        # torch mirror with the JAX probe's weights copied in
        layers = []
        dim = 12
        tl = []
        for lyr in model.params["hidden"]:
            lin = torch.nn.Linear(dim, conf["hidden_dim"])
            bn = torch.nn.BatchNorm1d(conf["hidden_dim"])
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(np.asarray(lyr["w"]).T))
                lin.bias.copy_(torch.from_numpy(np.asarray(lyr["b"])))
                bn.weight.copy_(torch.from_numpy(np.asarray(lyr["scale"])))
                bn.bias.copy_(torch.from_numpy(np.asarray(lyr["bias"])))
            layers += [lin, bn, torch.nn.Dropout(0.0), torch.nn.ReLU()]
            tl.append((lin, bn))
            dim = conf["hidden_dim"]
        head = torch.nn.Linear(dim, 5)
        with torch.no_grad():
            head.weight.copy_(torch.from_numpy(np.asarray(model.params["head"]["w"]).T))
            head.bias.copy_(torch.from_numpy(np.asarray(model.params["head"]["b"])))
        net = torch.nn.Sequential(*layers, head)

        # eval-mode probabilities agree at init (fresh running stats)
        net.eval()
        with torch.no_grad():
            tlogits = net(torch.from_numpy(x))
            tprobs = (torch.sigmoid(tlogits) if ptype == "multilabel"
                      else torch.softmax(tlogits, -1)).numpy()
        np.testing.assert_allclose(model.probabilities(x), tprobs,
                                   rtol=1e-5, atol=1e-6)

        # one identical Adam step (dropout 0): params + BN stats track
        net.train()
        opt = torch.optim.Adam(net.parameters(), lr=conf["lr"])
        tloss_fn = (torch.nn.BCEWithLogitsLoss() if ptype == "multilabel"
                    else torch.nn.CrossEntropyLoss())
        ty = (torch.from_numpy(y) if ptype == "multilabel"
              else torch.from_numpy(y).argmax(dim=1))
        opt.zero_grad()
        tloss_fn(net(torch.from_numpy(x)), ty).backward()
        opt.step()

        model.train_batch(jnp.asarray(x), jnp.asarray(y),
                          jax.random.PRNGKey(0), conf["lr"])

        for i, (lin, bn) in enumerate(tl):
            lyr = model.params["hidden"][i]
            np.testing.assert_allclose(np.asarray(lyr["w"]),
                                       lin.weight.detach().numpy().T,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(model.bn_state[i]["mean"]),
                                       bn.running_mean.numpy(),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(model.bn_state[i]["var"]),
                                       bn.running_var.numpy(),
                                       rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(model.params["head"]["w"]),
                                   head.weight.detach().numpy().T,
                                   rtol=1e-4, atol=1e-5)

        # post-step eval probabilities agree to Adam-noise tolerance: the
        # pre-BN linear bias has a mathematically-zero gradient (BN subtracts
        # the batch mean), and Adam amplifies the fp32 rounding residue of
        # that zero to an O(lr) step — torch's analytic BN backward rounds
        # to exact zero, JAX's leaves ~1e-8, so the biases drift apart by
        # ~lr after one step (harmless: BN running stats track the shift).
        net.eval()
        with torch.no_grad():
            tlogits = net(torch.from_numpy(x))
            tprobs = (torch.sigmoid(tlogits) if ptype == "multilabel"
                      else torch.softmax(tlogits, -1)).numpy()
        np.testing.assert_allclose(model.probabilities(x), tprobs,
                                   rtol=5e-3, atol=5e-4)
