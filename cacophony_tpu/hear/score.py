"""HEAR score functions, implemented natively.

Covers the reference registry (src/eval/heareval/score.py:365-404):
top1_acc, pitch_acc / chroma_acc, mAP (macro), d_prime, aucroc, and the
sed_eval-backed segment/event-based scores (sed_eval is not in this
environment; the segment/event F1 definitions below follow the standard
Mesaros et al. 2016 formulation sed_eval implements).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np
from scipy.stats import norm


def label_vocab_as_dict(df_rows: Sequence[dict], key: str = "label",
                        value: str = "idx") -> Dict:
    """labelvocabulary.csv rows → {label: idx} (reference score.py:19)."""
    return {row[key]: int(row[value]) for row in df_rows}


def label_to_binary_vector(labels: List, nlabels: int) -> np.ndarray:
    v = np.zeros(nlabels, np.float32)
    for l in labels:
        v[int(l)] = 1.0
    return v


# -------------------------------------------------------------- scene scores

def top1_accuracy(predictions: np.ndarray, targets: np.ndarray) -> float:
    """targets: binary (n, c); predictions: scores (n, c)."""
    pred = predictions.argmax(-1)
    true = targets.argmax(-1)
    return float((pred == true).mean())


def chroma_accuracy(predictions: np.ndarray, targets: np.ndarray) -> float:
    """Octave-invariant pitch accuracy: correct if class index matches
    modulo 12 (reference ChromaAccuracy, score.py:158)."""
    pred = predictions.argmax(-1)
    true = targets.argmax(-1)
    return float(((pred % 12) == (true % 12)).mean())


def mean_average_precision(predictions: np.ndarray, targets: np.ndarray) -> float:
    """Macro-averaged AP over ALL classes (reference score.py:289-315 —
    degenerate classes propagate NaN rather than being silently dropped)."""
    from sklearn.metrics import average_precision_score

    try:
        return float(average_precision_score(targets, predictions,
                                             average="macro"))
    except ValueError:
        return float("nan")


def aucroc(predictions: np.ndarray, targets: np.ndarray) -> float:
    """Macro AUC-ROC over ALL classes (NaN on degenerate splits, like the
    reference score.py:343-362)."""
    from sklearn.metrics import roc_auc_score

    try:
        return float(roc_auc_score(targets, predictions, average="macro"))
    except ValueError:
        return float("nan")


def d_prime(predictions: np.ndarray, targets: np.ndarray) -> float:
    """Mean over classes of sqrt(2)·Φ⁻¹(per-class AUC) — per-class BEFORE
    the nonlinear ppf, like the reference (score.py:317-341); ppf of the
    averaged AUC gives materially different values."""
    from sklearn.metrics import roc_auc_score

    try:
        per_class = roc_auc_score(targets, predictions, average=None)
    except ValueError:
        return float("nan")
    per_class = np.clip(np.atleast_1d(per_class), 1e-7, 1 - 1e-7)
    return float(np.mean((2 ** 0.5) * norm.ppf(per_class)))


# -------------------------------------------- event scores (sed_eval-style)

def _event_dict_by_file(events: List[dict]):
    by_file = defaultdict(list)
    for e in events:
        by_file[e["filename"]].append(e)
    return by_file


def segment_based_f1(reference_events: List[dict], estimated_events: List[dict],
                     segment_ms: float = 1000.0) -> float:
    """Segment-based overall F1: activity compared per fixed-length segment
    per class (Mesaros et al. 2016 §2.1; sed_eval SegmentBasedMetrics
    time_resolution=1.0, reference score.py:221-235).
    Events: {'filename','label','start','end'} (ms)."""
    ref_by_file = _event_dict_by_file(reference_events)
    est_by_file = _event_dict_by_file(estimated_events)
    ntp = nfp = nfn = 0
    for fname in sorted(set(ref_by_file) | set(est_by_file)):
        refs, ests = ref_by_file.get(fname, []), est_by_file.get(fname, [])
        max_end = max([e["end"] for e in refs + ests] + [0.0])
        nseg = int(np.ceil(max_end / segment_ms)) or 1
        labels = sorted({e["label"] for e in refs + ests})
        for label in labels:
            ref_act = np.zeros(nseg, bool)
            est_act = np.zeros(nseg, bool)
            for act, evs in [(ref_act, refs), (est_act, ests)]:
                for e in evs:
                    if e["label"] != label:
                        continue
                    lo = int(e["start"] // segment_ms)
                    hi = int(np.ceil(e["end"] / segment_ms))
                    act[lo:max(hi, lo + 1)] = True
            ntp += int((ref_act & est_act).sum())
            nfp += int((~ref_act & est_act).sum())
            nfn += int((ref_act & ~est_act).sum())
    denom = 2 * ntp + nfp + nfn
    return float(2 * ntp / denom) if denom else 0.0


def segment_based_error_rate(reference_events: List[dict],
                             estimated_events: List[dict],
                             segment_ms: float = 1000.0) -> float:
    """Segment-based ERROR RATE (lower is better): per segment,
    S = min(FN, FP), D = max(0, FN−FP), I = max(0, FP−FN);
    ER = (ΣS + ΣD + ΣI) / ΣN with N = active reference labels per segment
    (Mesaros et al. 2016 §2.1 — what sed_eval reports for the reference's
    'segment_1s_er', reference score.py:394-400)."""
    ref_by_file = _event_dict_by_file(reference_events)
    est_by_file = _event_dict_by_file(estimated_events)
    s_total = d_total = i_total = n_total = 0
    for fname in sorted(set(ref_by_file) | set(est_by_file)):
        refs, ests = ref_by_file.get(fname, []), est_by_file.get(fname, [])
        max_end = max([e["end"] for e in refs + ests] + [0.0])
        nseg = int(np.ceil(max_end / segment_ms)) or 1
        labels = sorted({e["label"] for e in refs + ests})
        ref_act = np.zeros((nseg, len(labels)), bool)
        est_act = np.zeros((nseg, len(labels)), bool)
        for act, evs in [(ref_act, refs), (est_act, ests)]:
            for e in evs:
                c = labels.index(e["label"])
                lo = int(e["start"] // segment_ms)
                hi = int(np.ceil(e["end"] / segment_ms))
                act[lo:max(hi, lo + 1), c] = True
        fn = (ref_act & ~est_act).sum(axis=1)
        fp = (~ref_act & est_act).sum(axis=1)
        s_total += int(np.minimum(fn, fp).sum())
        d_total += int(np.maximum(0, fn - fp).sum())
        i_total += int(np.maximum(0, fp - fn).sum())
        n_total += int(ref_act.sum())
    if n_total == 0:
        return 0.0 if (s_total + d_total + i_total) == 0 else float("inf")
    return float((s_total + d_total + i_total) / n_total)


def event_based_f1(reference_events: List[dict], estimated_events: List[dict],
                   t_collar_ms: float = 200.0,
                   percentage_of_length: float = 0.2) -> float:
    """Onset+offset event-based overall F1 with a ±collar on onsets and a
    max(collar, 20% of event length) tolerance on offsets (sed_eval
    EventBasedMetrics defaults used by the reference, score.py:236-259)."""
    ref_by_file = _event_dict_by_file(reference_events)
    est_by_file = _event_dict_by_file(estimated_events)
    ntp = nref = nest = 0
    for fname in sorted(set(ref_by_file) | set(est_by_file)):
        refs, ests = ref_by_file.get(fname, []), est_by_file.get(fname, [])
        nref += len(refs)
        nest += len(ests)
        used = [False] * len(ests)
        for r in refs:
            for j, e in enumerate(ests):
                if used[j] or e["label"] != r["label"]:
                    continue
                onset_ok = abs(e["start"] - r["start"]) <= t_collar_ms
                off_tol = max(t_collar_ms,
                              percentage_of_length * (r["end"] - r["start"]))
                offset_ok = abs(e["end"] - r["end"]) <= off_tol
                if onset_ok and offset_ok:
                    used[j] = True
                    ntp += 1
                    break
    denom = nref + nest
    return float(2 * ntp / denom) if denom else 0.0


def onset_only_event_based_f1(reference_events, estimated_events,
                              t_collar_ms: float = 200.0) -> float:
    """Onset-only matching (reference 'event_onset_200ms_fms',
    score.py:378-383)."""
    ref_by_file = _event_dict_by_file(reference_events)
    est_by_file = _event_dict_by_file(estimated_events)
    ntp = nref = nest = 0
    for fname in sorted(set(ref_by_file) | set(est_by_file)):
        refs, ests = ref_by_file.get(fname, []), est_by_file.get(fname, [])
        nref += len(refs)
        nest += len(ests)
        used = [False] * len(ests)
        for r in refs:
            for j, e in enumerate(ests):
                if used[j] or e["label"] != r["label"]:
                    continue
                if abs(e["start"] - r["start"]) <= t_collar_ms:
                    used[j] = True
                    ntp += 1
                    break
    denom = nref + nest
    return float(2 * ntp / denom) if denom else 0.0


# Registry mirroring the reference's available_scores (score.py:365-404).
SCENE_SCORES = {
    "top1_acc": top1_accuracy,
    "pitch_acc": top1_accuracy,
    "chroma_acc": chroma_accuracy,
    "mAP": mean_average_precision,
    "aucroc": aucroc,
    "d_prime": d_prime,
}

EVENT_SCORES = {
    # sed_eval semantics: segment_1s_er is an ERROR RATE (lower is better)
    "segment_1s_er": segment_based_error_rate,
    "segment_1s_fms": segment_based_f1,
    "event_onset_200ms_fms": onset_only_event_based_f1,
    "event_onset_50ms_fms": lambda r, e: onset_only_event_based_f1(
        r, e, t_collar_ms=50.0),
    "event_onset_offset_50ms_20perc_fms": lambda r, e: event_based_f1(
        r, e, t_collar_ms=50.0, percentage_of_length=0.2),
}

# metrics where smaller values win (selection/aggregation direction)
LOWER_IS_BETTER = {"segment_1s_er"}
