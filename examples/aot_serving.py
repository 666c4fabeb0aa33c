#!/usr/bin/env python
"""AOT serving example: build+export a plan in one process, load+run the
artifact in a serving process that never touches the plan builder.

    python examples/aot_serving.py build  artifact.wftaot
    python examples/aot_serving.py serve  artifact.wftaot
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(path: str):
    import webgpufft_tpu as W

    plan = W.create_plan(type="c2c", shape=[1024], batch=64,
                        direction="forward", normalize="unitary")
    blob = W.export_plan(plan, path=path)
    print(f"exported {len(blob)} bytes -> {path} (route {plan.route.mode})")


def serve(path: str):
    import webgpufft_tpu as W

    ep = W.load_exported_plan(path)
    print(f"loaded {ep.spec_dict['plan_type']} shape={ep.spec_dict['shape']} "
          f"platforms={ep.platforms}")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 1024, 2)).astype(np.float32)
    y = np.asarray(ep(x))
    z = (x[..., 0] + 1j * x[..., 1])
    ref = np.fft.fft(z, axis=1) / np.sqrt(1024)
    got = y[..., 0] + 1j * y[..., 1]
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"served batch of 64, rel err vs numpy: {err:.2e}")


if __name__ == "__main__":
    if len(sys.argv) != 3 or sys.argv[1] not in ("build", "serve"):
        print(__doc__)
        sys.exit(2)
    (build if sys.argv[1] == "build" else serve)(sys.argv[2])
