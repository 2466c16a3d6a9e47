"""Golden-number regression gate (--expect) unit + wiring tests."""

import json

import pytest

from cacophony_tpu.eval.expect import (
    check_expectations,
    enforce_expectations,
    resolve_path,
)


def _jack(v):
    return {"estimate": v, "bias": 0.0, "std_err": 0.0,
            "ci_low": v, "ci_high": v}


def test_resolve_path_plain_and_jackknife():
    results = {"esc50": 0.93, "text_to_audio": {"R1": _jack(0.41)}}
    assert resolve_path(results, "esc50") == pytest.approx(0.93)
    assert resolve_path(results, "text_to_audio.R1") == pytest.approx(0.41)
    with pytest.raises(KeyError):
        resolve_path(results, "text_to_audio.R99")
    with pytest.raises(KeyError):
        resolve_path({"x": {"a": 1}}, "x")  # dict without 'estimate'


def test_check_expectations_tolerances():
    results = {"esc50": 0.930, "us8k": 0.771}
    golden = {"atol": 0.005, "expect": {"esc50": 0.934, "us8k": 0.771}}
    assert check_expectations(results, golden) == []

    golden = {"atol": 0.001, "expect": {"esc50": 0.934}}
    fails = check_expectations(results, golden)
    assert len(fails) == 1 and fails[0][0] == "esc50"

    # per-metric [value, atol] overrides the default
    golden = {"atol": 0.001, "expect": {"esc50": [0.934, 0.01]}}
    assert check_expectations(results, golden) == []


def test_enforce_expectations_exits_on_drift(tmp_path, capsys):
    golden_path = tmp_path / "g.json"
    golden_path.write_text(json.dumps(
        {"atol": 0.005, "expect": {"esc50": 0.934}}))

    enforce_expectations({"esc50": 0.9335}, str(golden_path))  # within atol

    with pytest.raises(SystemExit):
        enforce_expectations({"esc50": 0.90}, str(golden_path))
    assert "EXPECT FAIL esc50" in capsys.readouterr().out


def test_shipped_goldens_parse_and_match_baseline_md():
    """The shipped goldens carry the BASELINE.md / reference README numbers."""
    import os

    import cacophony_tpu.eval as eval_pkg

    gdir = os.path.join(os.path.dirname(eval_pkg.__file__), "goldens")
    with open(os.path.join(gdir, "reference_zs.json")) as f:
        zs = json.load(f)
    assert zs["expect"]["esc50"] == 0.934
    assert zs["expect"]["us8k"] == 0.771

    with open(os.path.join(gdir, "reference_ar_audiocaps.json")) as f:
        ac = json.load(f)
    assert ac["expect"]["text_to_audio.R1"] == 0.410
    assert ac["expect"]["audio_to_text.R1"] == 0.553

    # shape-compatible with what audio_retrieval actually returns
    fake = {"text_to_audio": {k.split(".")[1]: _jack(v)
                              for k, v in ac["expect"].items()
                              if k.startswith("text_to_audio")},
            "audio_to_text": {k.split(".")[1]: _jack(v)
                              for k, v in ac["expect"].items()
                              if k.startswith("audio_to_text")}}
    assert check_expectations(fake, ac) == []
