"""Golden-vector record/replay tests (reference: compareGoldenVectors lane,
test/complete.suite.js:5287-5418)."""

import json

import numpy as np
import pytest

from webgpufft_tpu.core.cplx import interleave
from webgpufft_tpu.runtime import golden


def test_record_and_replay_c2c(rng, tmp_path):
    z = rng.standard_normal((2, 16)) + 1j * rng.standard_normal((2, 16))
    art = golden.record_artifact(
        {"type": "c2c", "shape": [16], "batch": 2, "direction": "forward"},
        interleave(z), name="c2c16")
    res = golden.compare_golden(art)
    assert res["ok"] and res["max_rel_err"] < 1e-6

    # roundtrip through JSON on disk
    p = tmp_path / "golden.json"
    golden.save_artifacts(str(p), [art])
    arts = golden.load_artifacts(str(p))
    assert golden.compare_golden(arts[0])["ok"]


def test_replay_with_kernel(rng):
    x = rng.standard_normal((1, 8)) + 1j * rng.standard_normal((1, 8))
    k = rng.standard_normal((3,)) + 1j * rng.standard_normal((3,))
    art = golden.record_artifact(
        {"type": "fftconv", "shape": [8],
         "fftConv": {"boundary": "linear-same", "kernelShape": [3]}},
        interleave(x), kernel=interleave(k), name="conv")
    assert golden.compare_golden(art)["ok"]


def test_replay_detects_mismatch(rng):
    z = rng.standard_normal((1, 8)) + 1j * rng.standard_normal((1, 8))
    art = golden.record_artifact(
        {"type": "c2c", "shape": [8], "batch": 1}, interleave(z))
    art["expected"]["data_b64"] = golden._enc(
        np.zeros((1, 8, 2), np.float32))["data_b64"]
    assert not golden.compare_golden(art)["ok"]


def test_schema_validation():
    with pytest.raises(ValueError, match="schema"):
        golden.compare_golden({"schema": "bogus"})


def test_committed_corpus_replays():
    """The in-repo golden corpus (tests/golden_corpus.json) must replay on
    every backend — the cross-round/cross-hardware regression guard
    (reference: golden JSON schema suite entry)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "golden_corpus.json")
    for art in golden.load_artifacts(path):
        res = golden.compare_golden(art)
        assert res["ok"], res
