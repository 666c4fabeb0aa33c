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


def test_dsp_golden_corpus_replays():
    """Frozen DSP vectors (tests/golden_dsp.json): the design tables and
    device outputs recorded in round 3 must keep replaying bit-stably —
    this anchors the toolboxes even if the installed scipy (the live
    oracle of the other lanes) drifts across versions."""
    import base64
    import json
    import os

    import webgpufft_tpu as W
    from webgpufft_tpu import filtering as FL, iirdesign as D, ltisys as L
    from webgpufft_tpu import windows as WIN, splines as SP
    from webgpufft_tpu import fft as wfft

    path = os.path.join(os.path.dirname(__file__), "golden_dsp.json")
    blob = json.load(open(path))
    assert blob["schema"] == "webgpufft-tpu-golden-dsp"
    rng = np.random.default_rng(blob["seed"])
    x64 = rng.standard_normal(64)
    # draws continue the recorded stream in this exact order
    c16 = rng.standard_normal(16)
    c16[0] += 8.0
    r16 = rng.standard_normal(16)
    b16 = rng.standard_normal(16)

    from webgpufft_tpu import linalg as LA
    from webgpufft_tpu.fftpack import convolve as CV

    om24 = CV.init_convolution_kernel(24, lambda k: 1.0 / (1.0 + k), d=1)

    A = W.ShortTimeFFT(WIN.gaussian(8, 2), hop=3, fs=10)
    num, den, _ = L.cont2discrete(D.butter(3, 5, analog=True), 0.01,
                                  method="bilinear")
    r, p, k = L.residue([1.0, 0.5], [1.0, -1.5, 0.75, -0.125])
    o2 = D.cheb2ord([0.1, 0.6], [0.2, 0.5], 1, 40)
    current = {
        "remez_51_lowpass": FL.remez(51, [0, 0.2, 0.3, 1.0], [1, 0],
                                     fs=2.0),
        "firwin_31": FL.firwin(31, 0.3),
        "butter6_sos": D.butter(6, 0.2, output="sos"),
        "ellip5_sos": D.ellip(5, 1, 40, 0.3, output="sos"),
        "cheb2ord_bandstop": np.concatenate([[o2[0]], o2[1]]),
        "gammatone_iir": np.concatenate(D.gammatone(440, "iir",
                                                    fs=16000)),
        "kaiser_16_86": WIN.kaiser(16, 8.6),
        "chebwin_17_80": WIN.chebwin(17, 80),
        "dpss_32_3_2": WIN.dpss(32, 3, 2),
        "taylor_24": WIN.taylor(24, 5, 40),
        "c2d_bilinear_num": np.atleast_1d(np.squeeze(num)),
        "c2d_bilinear_den": den,
        "residue_triple_r": np.stack([r.real, r.imag]),
        "sosfiltfilt_butter": np.asarray(
            FL.sosfiltfilt(D.butter(4, 0.25, output="sos"),
                           x64.astype(np.float32))),
        "cspline1d": np.asarray(SP.cspline1d(x64.astype(np.float32))),
        "symiirorder2": np.asarray(SP.symiirorder2(x64, 0.5, 0.3)),
        "envelope": np.asarray(wfft.envelope(x64.astype(np.float32))),
        "shorttime_stft": np.asarray(A.stft(x64.astype(np.float32))),
        "dual_win_gauss8_hop3": A.dual_win,
        "solve_toeplitz_16": np.asarray(LA.solve_toeplitz((c16, r16),
                                                          b16)),
        "fftpack_convolve_24": np.asarray(CV.convolve(
            x64[:24], om24, swap_real_imag=True)),
    }
    for art in blob["artifacts"]:
        want = np.frombuffer(
            base64.b64decode(art["expected"]["data_b64"]),
            dtype=art["expected"]["dtype"]).reshape(
                art["expected"]["shape"])
        got = np.asarray(current[art["name"]], np.float64)
        assert got.shape == tuple(want.shape), art["name"]
        scale = max(np.max(np.abs(want)), 1e-12)
        err = np.max(np.abs(got - want)) / scale
        assert err < art["tol"], (art["name"], err)
