"""Fused Pallas VMEM kernels for the hot transform paths.

Placeholder gate for round-1 bring-up: ``supports_length`` reports what the
fused path can serve; build_fused_1d constructs the kernel.  Until the Pallas
kernel lands, nothing is eligible and the XLA matmul path (already
memory-bound and MXU-driven) serves all plans.
"""

from __future__ import annotations


def supports_length(n: int, tuning) -> bool:
    return False


def build_fused_1d(spec, consts):
    raise NotImplementedError("fused Pallas path not yet available")
