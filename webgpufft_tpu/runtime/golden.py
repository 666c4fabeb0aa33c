"""Golden-vector artifacts: record + replay.

TPU analog of the reference's golden-vector lane
(reference: compareGoldenVectors, test/complete.suite.js:5287-5418 — JSON
artifacts of {plan opts, input, expected output} replayed against device and
CPU references).  Artifacts are plain JSON (base64 float buffers) so they
can be committed, diffed, and replayed across hardware generations.
"""

from __future__ import annotations

import base64
import json
from typing import Any, Dict, List, Optional

import numpy as np

GOLDEN_SCHEMA = "webgpufft-tpu-golden"
GOLDEN_VERSION = 1


def _enc(arr: np.ndarray) -> Dict[str, Any]:
    arr = np.ascontiguousarray(arr)
    return {
        "dtype": str(arr.dtype),
        "shape": list(arr.shape),
        "data_b64": base64.b64encode(arr.tobytes()).decode("ascii"),
    }


def _dec(d: Dict[str, Any]) -> np.ndarray:
    raw = base64.b64decode(d["data_b64"])
    return np.frombuffer(raw, dtype=np.dtype(d["dtype"])).reshape(d["shape"]).copy()


def record_artifact(plan_opts: Dict[str, Any], input_arr: np.ndarray,
                    kernel: Optional[np.ndarray] = None,
                    expected: Optional[np.ndarray] = None,
                    name: str = "") -> Dict[str, Any]:
    """Build a golden artifact.  When ``expected`` is omitted the plan is
    executed now and its output recorded as the expectation."""
    import webgpufft_tpu as W

    if expected is None:
        plan = W.create_plan(dict(plan_opts), cache=W.PlanCache())
        expected = np.asarray(plan.exec(np.asarray(input_arr), kernel=kernel)
                              if kernel is not None else plan(np.asarray(input_arr)))
    art = {
        "schema": GOLDEN_SCHEMA,
        "version": GOLDEN_VERSION,
        "name": name,
        "planOpts": plan_opts,
        "input": _enc(np.asarray(input_arr)),
        "expected": _enc(np.asarray(expected)),
    }
    if kernel is not None:
        art["kernel"] = _enc(np.asarray(kernel))
    return art


def compare_golden(artifact: Dict[str, Any], atol_scale: float = 1e-4) -> Dict[str, Any]:
    """Replay an artifact on the current backend.  Returns a result dict
    {name, ok, max_rel_err}; raises on schema mismatch."""
    import webgpufft_tpu as W

    if artifact.get("schema") != GOLDEN_SCHEMA:
        raise ValueError(f"unrecognized golden schema {artifact.get('schema')!r}")
    if artifact.get("version") not in (1,):
        raise ValueError(f"unsupported golden version {artifact.get('version')}")
    plan = W.create_plan(dict(artifact["planOpts"]), cache=W.PlanCache())
    x = _dec(artifact["input"])
    kernel = _dec(artifact["kernel"]) if "kernel" in artifact else None
    got = np.asarray(plan.exec(x, kernel=kernel) if kernel is not None else plan(x),
                     dtype=np.float64)
    want = _dec(artifact["expected"]).astype(np.float64)
    scale = max(np.max(np.abs(want)), 1e-12)
    err = float(np.max(np.abs(got - want)) / scale)
    return {"name": artifact.get("name", ""), "ok": err <= atol_scale,
            "max_rel_err": err}


def save_artifacts(path: str, artifacts: List[Dict[str, Any]]):
    with open(path, "w") as f:
        json.dump({"schema": GOLDEN_SCHEMA, "version": GOLDEN_VERSION,
                   "artifacts": artifacts}, f)


def load_artifacts(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        doc = json.load(f)
    if doc.get("schema") != GOLDEN_SCHEMA:
        raise ValueError("not a golden-vector file")
    return doc["artifacts"]
