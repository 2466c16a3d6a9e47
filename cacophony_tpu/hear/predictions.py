"""HEAR downstream probe training over cached embeddings.

Re-implements the reference's prediction phase
(src/eval/heareval/predictions/task_predictions.py) without
pytorch-lightning: shallow MLP probes trained on the memmapped embeddings
with random grid search, early stopping on the task's primary score,
k-fold re-training of the best config, and median-filter event extraction
for event tasks.  Probes are a tiny JAX MLP + hand-rolled torch-default
Adam pinned to the HOST CPU backend (probe training is tiny host-side work
by design — parity matters, not speed, SURVEY §7.5 — and must never queue
behind the TPU's embedding-extraction programs).  torch is NOT a
dependency of this module anymore; the architecture is cross-checked
against a torch mirror in tests/test_hear.py when torch is available.

Protocol constants follow the reference: PARAM_GRID (:57-94,
hidden 1024, dropout 0.1, lr {3.2e-3,1e-3,3.2e-4,1e-4}, patience 20,
batch 1024, BatchNorm, Adam), EVENT_POSTPROCESSING_GRID (:117-122),
seed 42 (:1291), grid_points=8 random configs (:1284), event extraction via
median filter + threshold 0.5 + min-duration (:615-683).
"""

from __future__ import annotations

import csv
import functools
import itertools
import json
import logging
import os
import pickle
import random
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.ndimage import median_filter

import jax
import jax.numpy as jnp

from cacophony_tpu.hear import score as score_lib

logger = logging.getLogger("cacophony_tpu.hear")


def _host_device():
    """The host CPU device, or None when only an accelerator backend exists
    (then jax.default_device is skipped and the default backend is used)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None

PARAM_GRID = {
    "hidden_layers": [1, 2],
    "hidden_dim": [1024],
    "dropout": [0.1],
    "lr": [3.2e-3, 1e-3, 3.2e-4, 1e-4],
    "patience": [20],
    "max_epochs": [500],
    "check_val_every_n_epoch": [3],
    "batch_size": [1024],
}

FAST_PARAM_GRID = dict(PARAM_GRID, max_epochs=[50], patience=[5])
FASTER_PARAM_GRID = dict(PARAM_GRID, hidden_layers=[0, 1], hidden_dim=[64],
                         max_epochs=[10], patience=[2],
                         check_val_every_n_epoch=[1])

EVENT_POSTPROCESSING_GRID = {
    "median_filter_ms": [250],
    "min_duration": [125, 250],
}


# ------------------------------------------------------------- probe model
#
# Functional MLP probe matching the reference FullyConnectedPrediction
# (task_predictions.py:140-192): [Linear → BatchNorm1d → Dropout → ReLU]^L
# → Linear head, xavier-uniform weights, torch-default uniform biases,
# BCE-with-logits (multilabel) / softmax CE (multiclass), Adam.
# All jitted entry points are MODULE-LEVEL (per-instance closures retrace —
# CLAUDE.md); pytree structure keys the cache on hidden_layers.

_BN_EPS = 1e-5      # torch.nn.BatchNorm1d defaults
_BN_MOMENTUM = 0.1


def _xavier_uniform(rng, fan_in, fan_out):
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, (fan_in, fan_out), jnp.float32,
                              -bound, bound)


def _linear_init(rng, fan_in, fan_out):
    kw, kb = jax.random.split(rng)
    # weight: xavier (reference overrides torch's default); bias keeps the
    # torch.nn.Linear default U(-1/√fan_in, 1/√fan_in)
    bb = float(1.0 / np.sqrt(fan_in))
    return {"w": _xavier_uniform(kw, fan_in, fan_out),
            "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bb, bb)}


def _probe_init(rng, nfeatures, nlabels, conf):
    hidden, bn = [], []
    dim = nfeatures
    for _ in range(conf["hidden_layers"]):
        rng, sub = jax.random.split(rng)
        lyr = _linear_init(sub, dim, conf["hidden_dim"])
        lyr["scale"] = jnp.ones((conf["hidden_dim"],), jnp.float32)
        lyr["bias"] = jnp.zeros((conf["hidden_dim"],), jnp.float32)
        hidden.append(lyr)
        bn.append({"mean": jnp.zeros((conf["hidden_dim"],), jnp.float32),
                   "var": jnp.ones((conf["hidden_dim"],), jnp.float32)})
        dim = conf["hidden_dim"]
    rng, sub = jax.random.split(rng)
    return {"hidden": hidden, "head": _linear_init(sub, dim, nlabels)}, bn


def _probe_forward(params, bn_state, x, *, dropout, train, rng):
    """→ (logits, updated bn running stats).  Train mode normalizes by the
    biased batch variance and tracks the unbiased one, per torch BN1d."""
    new_bn = []
    for lyr, bn in zip(params["hidden"], bn_state):
        x = x @ lyr["w"] + lyr["b"]
        if train:
            mean = x.mean(axis=0)
            var = ((x - mean) ** 2).mean(axis=0)
            n = x.shape[0]
            new_bn.append({
                "mean": (1 - _BN_MOMENTUM) * bn["mean"] + _BN_MOMENTUM * mean,
                "var": (1 - _BN_MOMENTUM) * bn["var"]
                       + _BN_MOMENTUM * var * (n / max(n - 1, 1)),
            })
        else:
            mean, var = bn["mean"], bn["var"]
            new_bn.append(bn)
        x = (x - mean) / jnp.sqrt(var + _BN_EPS) * lyr["scale"] + lyr["bias"]
        if train and dropout > 0.0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
        x = jax.nn.relu(x)
    return x @ params["head"]["w"] + params["head"]["b"], new_bn


def _probe_loss(params, bn_state, x, y, rng, dropout, multilabel):
    logits, new_bn = _probe_forward(params, bn_state, x,
                                    dropout=dropout, train=True, rng=rng)
    if multilabel:
        p = jax.nn.log_sigmoid(logits)
        q = jax.nn.log_sigmoid(-logits)   # log(1 - sigmoid) stably
        loss = -(y * p + (1.0 - y) * q).mean()
    else:
        tgt = jnp.argmax(y, axis=1)
        loss = -jnp.take_along_axis(jax.nn.log_softmax(logits), tgt[:, None],
                                    axis=1).mean()
    return loss, new_bn


def _adam_step(g, opt, lr, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam defaults, hand-rolled so lr stays a traced scalar
    (an optax.adam(lr) instance per grid point would key a fresh jit cache
    entry on function identity every call)."""
    m = jax.tree_util.tree_map(lambda m_, g_: b1 * m_ + (1 - b1) * g_,
                               opt["m"], g)
    v = jax.tree_util.tree_map(lambda v_, g_: b2 * v_ + (1 - b2) * g_ * g_,
                               opt["v"], g)
    count = opt["count"] + 1
    c1 = 1 - b1 ** count.astype(jnp.float32)
    c2 = 1 - b2 ** count.astype(jnp.float32)
    upd = jax.tree_util.tree_map(
        lambda m_, v_: -lr * (m_ / c1) / (jnp.sqrt(v_ / c2) + eps), m, v)
    return upd, {"m": m, "v": v, "count": count}


# No donation: the early-stopping snapshot keeps live references to the
# best epoch's param buffers, which donation would invalidate.
@functools.partial(jax.jit, static_argnames=("dropout", "multilabel"))
def _probe_train_batch(params, bn_state, opt, x, y, rng, lr,
                       dropout, multilabel):
    grads, new_bn = jax.grad(_probe_loss, has_aux=True)(
        params, bn_state, x, y, rng, dropout, multilabel)
    upd, opt = _adam_step(grads, opt, lr)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    return params, new_bn, opt


@functools.partial(jax.jit, static_argnames=("multilabel",))
def _probe_probs(params, bn_state, x, multilabel):
    logits, _ = _probe_forward(params, bn_state, x,
                               dropout=0.0, train=False, rng=None)
    return jax.nn.sigmoid(logits) if multilabel else jax.nn.softmax(logits, -1)


class MLPProbe:
    """Trained-probe handle: params + BN running stats + prediction type.
    (The torch-module version this replaces is kept as a test-only mirror
    in tests/test_hear.py for architecture cross-checking.)"""

    def __init__(self, nfeatures: int, nlabels: int, prediction_type: str,
                 conf: Dict[str, Any], seed: int = 42):
        self.prediction_type = prediction_type
        self.conf = conf
        self.params, self.bn_state = _probe_init(
            jax.random.PRNGKey(seed), nfeatures, nlabels, conf)
        self.opt = {
            "m": jax.tree_util.tree_map(jnp.zeros_like, self.params),
            "v": jax.tree_util.tree_map(jnp.zeros_like, self.params),
            "count": jnp.zeros((), jnp.int32),
        }

    @property
    def multilabel(self) -> bool:
        return self.prediction_type == "multilabel"

    def train_batch(self, x, y, rng, lr):
        self.params, self.bn_state, self.opt = _probe_train_batch(
            self.params, self.bn_state, self.opt, x, y, rng,
            jnp.float32(lr), self.conf["dropout"], self.multilabel)

    def probabilities(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(_probe_probs(
            self.params, self.bn_state,
            jnp.asarray(np.array(x, np.float32, copy=True)), self.multilabel))

    def snapshot(self):
        return self.params, self.bn_state

    def restore(self, snap):
        self.params, self.bn_state = snap


def _load_split(embed_dir: str, split: str, label_to_idx: Dict[str, int],
                nlabels: int):
    with open(os.path.join(embed_dir, f"{split}.embedding-dimensions.json")) as f:
        n, dim = json.load(f)
    x = np.memmap(os.path.join(embed_dir, f"{split}.embeddings.npy"),
                  dtype=np.float32, mode="r", shape=(n, dim))
    with open(os.path.join(embed_dir, f"{split}.target-labels.pkl"), "rb") as f:
        labels = pickle.load(f)
    y = np.stack([
        score_lib.label_to_binary_vector([label_to_idx[l] for l in row], nlabels)
        for row in labels
    ]) if labels else np.zeros((0, nlabels), np.float32)
    assert np.isfinite(x).all(), f"non-finite embeddings in {split}"
    return np.asarray(x), y


def _primary_sign(metadata: Dict) -> float:
    """+1 when the task's primary metric maximizes, −1 when it minimizes
    (the reference sets EarlyStopping/ModelCheckpoint mode from
    scores[0].maximize, task_predictions.py:994-1005)."""
    return -1.0 if metadata["evaluation"][0] in score_lib.LOWER_IS_BETTER else 1.0


def _postprocess_confs() -> List[Dict]:
    """EVENT_POSTPROCESSING_GRID as sklearn-ParameterGrid-ordered dicts
    (sorted keys, cartesian product — task_predictions.py:117-122)."""
    keys = sorted(EVENT_POSTPROCESSING_GRID)
    return [dict(zip(keys, vals)) for vals in
            itertools.product(*(EVENT_POSTPROCESSING_GRID[k] for k in keys))]


def _select_event_postprocess(probs: np.ndarray, metadata: Dict,
                              target_events: Dict, fname_ts,
                              idx_to_label,
                              strict_reference_bugs: bool = False,
                              ) -> Tuple[float, Dict]:
    """One validation epoch of the reference's EventPredictionModel
    (_score_epoch_end, task_predictions.py:471-516): extract events for
    EVERY postprocessing config, score each with the primary metric
    (NaN → 0.0), pick the best.

    The reference sorts (score, postprocessing) descending UNCONDITIONALLY
    — even when the primary metric minimizes (segment_1s_er), where it
    picks the WORST postprocess. Default here respects the metric
    direction; pass strict_reference_bugs=True to reproduce the
    reference's selection bit-for-bit. Returns (primary score, postprocess)."""
    primary_fn = score_lib.EVENT_SCORES[metadata["evaluation"][0]]
    sign = 1.0 if strict_reference_bugs else _primary_sign(metadata)
    scored = []
    for post in _postprocess_confs():
        pred_events = get_events_for_all_files(probs, fname_ts, idx_to_label,
                                               post)
        s = primary_fn(pred_events, target_events)
        if np.isnan(s):
            s = 0.0
        scored.append((sign * s, s, tuple(sorted(post.items()))))
    scored.sort(reverse=True)
    return scored[0][1], dict(scored[0][2])


def train_probe(x_train, y_train, x_valid, y_valid, metadata, conf,
                seed: int = 42, event_ctx: Optional[Dict] = None,
                strict_reference_bugs: bool = False,
                ) -> Tuple[MLPProbe, float, Optional[Dict]]:
    """Train one probe with early stopping on the validation PRIMARY score.

    Scene tasks monitor the primary scene metric. Event tasks follow the
    reference protocol (task_predictions.py:388-530): at every validation
    check the postprocessing grid is swept on validation predictions, the
    best primary score is the monitored value, and the postprocessing of
    the best epoch is returned for test-time use. `event_ctx` supplies
    {'target_events', 'fname_ts', 'idx_to_label'} for that sweep.

    Returns (model at its best epoch, best raw score, best postprocessing
    or None for scene tasks)."""
    # copy=True: splits may be read-only memmaps
    xt = np.array(x_train, np.float32, copy=True)
    yt = np.array(y_train, np.float32, copy=True)
    xv = np.array(x_valid, np.float32, copy=True)

    sign = _primary_sign(metadata)
    is_event = metadata["embedding_type"] == "event"
    bs = conf["batch_size"]
    perm_rng = np.random.RandomState(seed)
    drop_key = jax.random.PRNGKey(seed + 1)

    with jax.default_device(_host_device()):
        model = MLPProbe(xt.shape[1], yt.shape[1],
                         metadata["prediction_type"], conf, seed=seed)
        best_signed, best_raw, best_state, best_post, since_best = (
            -np.inf, float("nan"), None, None, 0)
        for epoch in range(conf["max_epochs"]):
            perm = perm_rng.permutation(len(xt))
            for i in range(0, len(xt), bs):
                idx = perm[i:i + bs]
                if len(idx) < 2:  # BatchNorm needs >1 sample
                    continue
                drop_key, sub = jax.random.split(drop_key)
                model.train_batch(jnp.asarray(xt[idx]), jnp.asarray(yt[idx]),
                                  sub, conf["lr"])

            if (epoch + 1) % conf["check_val_every_n_epoch"]:
                continue
            probs = model.probabilities(xv)
            post = None
            if is_event:
                val, post = _select_event_postprocess(
                    probs, metadata, event_ctx["target_events"],
                    event_ctx["fname_ts"], event_ctx["idx_to_label"],
                    strict_reference_bugs=strict_reference_bugs)
            else:
                name = metadata["evaluation"][0]
                val = score_lib.SCENE_SCORES[name](probs, y_valid)
            if sign * val > best_signed:
                best_signed, best_raw, best_post, since_best = (
                    sign * val, val, post, 0)
                best_state = model.snapshot()
            else:
                since_best += 1
                if since_best >= conf["patience"]:
                    break
        if best_state is not None:
            model.restore(best_state)
    return model, float(best_raw), best_post


# -------------------------------------------------------------- event utils

def create_events_from_prediction(
    prediction: np.ndarray,        # (T, C) frame probabilities for ONE file
    timestamps: Sequence[float],   # (T,) ms
    idx_to_label: Dict[int, str],
    threshold: float = 0.5,
    median_filter_ms: float = 250,
    min_duration_ms: float = 60,
) -> List[Dict]:
    """Frame probabilities → event list via median filter + thresholding +
    min-duration pruning (reference task_predictions.py:615-683)."""
    if len(timestamps) > 1:
        frame_ms = timestamps[1] - timestamps[0]
        ksize = max(1, int(round(median_filter_ms / max(frame_ms, 1e-6))))
    else:
        ksize = 1
    smoothed = median_filter(prediction, size=(ksize, 1))
    active = smoothed > threshold

    events = []
    ts = np.asarray(timestamps, np.float64)
    for c in range(prediction.shape[1]):
        on = None
        col = active[:, c]
        for t in range(len(col)):
            if col[t] and on is None:
                on = ts[t]
            if on is not None and (not col[t] or t == len(col) - 1):
                # end = the LAST ACTIVE frame's timestamp (reference
                # task_predictions.py:672-676) — ending on the first
                # inactive frame would stretch every event by one step and
                # keep single-frame events the reference drops
                off = ts[t - 1] if not col[t] else ts[t]
                if off - on >= min_duration_ms:
                    events.append({"label": idx_to_label[c],
                                   "start": float(on), "end": float(off)})
                on = None
    return sorted(events, key=lambda e: (e["start"], e["label"]))


def get_events_for_all_files(predictions: np.ndarray, filename_timestamps,
                             idx_to_label, postprocess: Dict) -> Dict[str, List[Dict]]:
    """Group frame rows by source file, extract events per file. Returns
    {filename: [events]} with an entry for EVERY file — empty-prediction
    files stay present, which matters because scoring iterates prediction
    filenames (reference get_events_for_all_files, task_predictions.py:686-764)."""
    rows_by_file = defaultdict(list)
    for i, (slug, ts) in enumerate(filename_timestamps):
        rows_by_file[slug].append((ts, i))
    events: Dict[str, List[Dict]] = {}
    for slug, rows in rows_by_file.items():
        rows.sort()
        ts = [r[0] for r in rows]
        pred = predictions[[r[1] for r in rows]]
        events[os.path.basename(slug)] = create_events_from_prediction(
            pred, ts, idx_to_label,
            median_filter_ms=postprocess["median_filter_ms"],
            min_duration_ms=postprocess["min_duration"])
    return events


def _reference_events(embed_dir: str, split: str) -> Dict[str, List[Dict]]:
    """{split}.json → {filename: [events]} (the reference's
    validation/test_target_events, task_predictions.py:417-420)."""
    with open(os.path.join(embed_dir, f"{split}.json")) as f:
        split_data = json.load(f)
    return {fname: [{"label": e["label"], "start": e["start"], "end": e["end"]}
                    for e in evs]
            for fname, evs in split_data.items()}


# --------------------------------------------------------------- orchestrate

def _concat_splits(parts):
    assert parts, "no training splits"
    xs, ys = zip(*parts)
    return np.concatenate(xs), np.concatenate(ys)


def _probs(model, x):
    with jax.default_device(_host_device()):
        return model.probabilities(x)


def _load_fname_ts(embed_dir, split):
    with open(os.path.join(embed_dir, f"{split}.filename-timestamps.json")) as f:
        return json.load(f)


def _event_scores(probs, embed_dir, split, metadata, idx_to_label, post):
    ref_events = _reference_events(embed_dir, split)
    pred_events = get_events_for_all_files(probs, _load_fname_ts(embed_dir, split),
                                           idx_to_label, post)
    return {name: score_lib.EVENT_SCORES[name](pred_events, ref_events)
            for name in metadata["evaluation"]
            if name in score_lib.EVENT_SCORES}


def _score_model(model, embed_dir, metadata, test_s, data_test, idx_to_label,
                 postprocess: Optional[Dict] = None):
    probs = _probs(model, data_test[0])
    if metadata["embedding_type"] == "scene":
        return {name: score_lib.SCENE_SCORES[name](probs, data_test[1])
                for name in metadata["evaluation"]
                if name in score_lib.SCENE_SCORES}
    # test uses the postprocessing chosen at the best VALIDATION epoch
    # (reference epoch_best_postprocessing, task_predictions.py:425-434)
    return _event_scores(probs, embed_dir, test_s, metadata, idx_to_label,
                         postprocess or _postprocess_confs()[0])


def task_predictions(
    embed_dir: str,
    grid: Optional[Dict] = None,
    grid_points: int = 8,
    seed: int = 42,
    gpus: None = None,  # accepted for CLI parity; training is host-side
    strict_reference_bugs: bool = False,
) -> Dict:
    """Full prediction phase for one task directory
    (reference task_predictions.py:1273-1447):

    - train/valid/test tasks: random grid search on (train, valid), best
      config scored on test
    - k-fold tasks (splits = fold00..): grid search on the first fold
      assignment, then the best config re-trained on every fold rotation
      (test=fold i, valid=fold i+1, train=rest) and scores aggregated
      mean/std (reference data_splits_from_folds, :1122-1157)
    Writes test.predicted-scores.json + prediction-done.json.
    """
    rng = random.Random(seed)
    with open(os.path.join(embed_dir, "task_metadata.json")) as f:
        metadata = json.load(f)
    with open(os.path.join(embed_dir, "labelvocabulary.csv")) as f:
        rows = list(csv.DictReader(f))
    label_to_idx = {r["label"]: int(r["idx"]) for r in rows}
    idx_to_label = {v: k for k, v in label_to_idx.items()}
    nlabels = len(label_to_idx)

    grid = grid or PARAM_GRID
    keys = sorted(grid)
    all_confs = [dict(zip(keys, vals))
                 for vals in itertools.product(*(grid[k] for k in keys))]
    rng.shuffle(all_confs)
    confs = all_confs[:grid_points]

    splits = metadata["splits"]
    kfold = not (set(splits) >= {"train", "valid", "test"})
    data = {s: _load_split(embed_dir, s, label_to_idx, nlabels) for s in splits}

    if kfold:
        folds = sorted(splits)
        k = len(folds)
        assignments = []
        for i in range(k):
            test_s, valid_s = folds[i], folds[(i + 1) % k]
            train_ss = [folds[j] for j in range(k)
                        if j != i and j != (i + 1) % k]
            # 2-fold tasks have no third fold: train on the validation fold
            assignments.append((test_s, valid_s, train_ss or [valid_s]))
    else:
        assignments = [("test", "valid", ["train"])]

    is_event = metadata["embedding_type"] == "event"

    def _event_ctx(valid_s):
        if not is_event:
            return None
        return {"target_events": _reference_events(embed_dir, valid_s),
                "fname_ts": _load_fname_ts(embed_dir, valid_s),
                "idx_to_label": idx_to_label}

    # grid search on the first assignment
    test0, valid0, train0 = assignments[0]
    x_tr, y_tr = _concat_splits([data[s] for s in train0])
    sign = _primary_sign(metadata)
    ctx0 = _event_ctx(valid0)
    best = {"signed": -np.inf, "score": float("nan"), "conf": None,
            "model": None, "post": None}
    for conf in confs:
        model, val, post = train_probe(x_tr, y_tr, *data[valid0], metadata,
                                       conf, seed=seed, event_ctx=ctx0,
                                       strict_reference_bugs=strict_reference_bugs)
        logger.info("conf %s → valid %.4f", conf, val)
        if sign * val > best["signed"]:
            best = {"signed": sign * val, "score": val, "conf": conf,
                    "model": model, "post": post}

    # evaluate (re-training the best config per fold rotation); event-task
    # postprocessing comes from each fold's best VALIDATION epoch
    per_fold: List[Dict[str, float]] = []
    for i, (test_s, valid_s, train_ss) in enumerate(assignments):
        if i == 0:
            model, post = best["model"], best["post"]
        else:
            x_tr, y_tr = _concat_splits([data[s] for s in train_ss])
            model, _, post = train_probe(x_tr, y_tr, *data[valid_s], metadata,
                                         best["conf"], seed=seed,
                                         event_ctx=_event_ctx(valid_s),
                                         strict_reference_bugs=strict_reference_bugs)
        per_fold.append(_score_model(model, embed_dir, metadata, test_s,
                                     data[test_s], idx_to_label,
                                     postprocess=post))

    names = sorted({n for f in per_fold for n in f})
    scores = {n: float(np.mean([f[n] for f in per_fold if n in f])) for n in names}
    aggregated = {}
    for n in names:
        vals = [f[n] for f in per_fold if n in f]
        aggregated[f"test_{n}_mean"] = float(np.mean(vals))
        aggregated[f"test_{n}_std"] = float(np.std(vals))

    result = {
        "best_conf": best["conf"],
        "valid_score": best["score"],
        "num_folds": len(assignments),
        "test": scores,
        "aggregated_scores": aggregated,
    }
    with open(os.path.join(embed_dir, "test.predicted-scores.json"), "w") as f:
        json.dump(result, f, indent=2)
    with open(os.path.join(embed_dir, "prediction-done.json"), "w") as f:
        json.dump({"done": True}, f)
    return result
