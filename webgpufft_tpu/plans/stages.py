"""Pre/post staging stages: ioView embed/extract, zeroPad masks, strided
gather/scatter, precision conversion, channel-lane lowering.

These replace the reference's staging kernel zoo (src/kernels/ioview.js,
zero_pad.js, strided_complex.js, strided_real.js, f16_storage.js and the
whdcn lowering in src/runtime/layout_semantics.js).  On TPU they are plain
XLA ops — slices, pads, masks, gathers — deliberately kept *outside* the hot
transform kernels so XLA fuses them into the surrounding data movement
(SURVEY.md 7 "keep the strided/ioView/zeroPad semantics zoo as cheap pre/post
gather-scatter lowered to XLA, never inside the hot kernel").

Coordinate convention for ioView (reference: src/kernels/ioview.js:56-131):
logical coord c maps to view coord vc = c - offset; out-of-view reads are
zero; offsets may be negative.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..spec import ChannelLane, IoViewSide, PlanError, ZeroPadStage


# ---------------------------------------------------------------------------
# ioView
# ---------------------------------------------------------------------------

def embed_view(x, view: IoViewSide, logical: Sequence[int], interleaved: bool):
    """(batch, *view.shape[, 2]) -> (batch, *logical[, 2]) with zeros outside.

    Overlap region per axis: logical [lo, hi) with lo = max(0, off),
    hi = min(L, off + V); the rest is zero-filled.
    """
    rank = len(logical)
    tail = 1 if interleaved else 0
    slices = [slice(None)]  # batch
    pads = [(0, 0)]
    for d in range(rank):
        off, v, L = view.offset[d], view.shape[d], logical[d]
        lo, hi = max(0, off), min(L, off + v)
        if hi <= lo:
            # no overlap: all zeros
            shape = x.shape[:1] + tuple(logical) + ((2,) if interleaved else ())
            return jnp.zeros(shape, dtype=x.dtype)
        slices.append(slice(lo - off, hi - off))
        pads.append((lo, L - hi))
    slices += [slice(None)] * tail
    pads += [(0, 0)] * tail
    return jnp.pad(x[tuple(slices)], pads)


def view_overlap(view: IoViewSide, logical: Sequence[int]):
    """Per-axis overlap of the view window with the logical domain as
    (view_slices, logical_slices), or None when empty."""
    vsl, lsl = [], []
    for d in range(len(logical)):
        off, v, L = view.offset[d], view.shape[d], logical[d]
        lo, hi = max(0, off), min(L, off + v)
        if hi <= lo:
            return None
        lsl.append(slice(lo, hi))
        vsl.append(slice(lo - off, hi - off))
    return tuple(vsl), tuple(lsl)


def merge_view_into(y_view, view: IoViewSide, logical: Sequence[int],
                    interleaved: bool, out):
    """clearOutside=false with a caller buffer: write only the view/logical
    overlap region of the extracted view into ``out``, preserving everything
    else (reference: ioview.js clearOutside control, docs/API.md:219)."""
    ov = view_overlap(view, logical)
    if ov is None:
        return out
    vsl, _ = ov
    tail = (slice(None),) if interleaved else ()
    idx = (slice(None),) + vsl + tail
    return out.at[idx].set(y_view[idx].astype(out.dtype))


def extract_view(y, view: IoViewSide, logical: Sequence[int], interleaved: bool):
    """(batch, *logical[, 2]) -> (batch, *view.shape[, 2]).

    View coords outside the logical domain are zero.  For the keep-outside
    behavior (clearOutside=false), exec(out=) merges via merge_view_into /
    an overlap-restricted strided scatter.
    """
    rank = len(logical)
    tail = 1 if interleaved else 0
    slices = [slice(None)]
    pads = [(0, 0)]
    for d in range(rank):
        off, v, L = view.offset[d], view.shape[d], logical[d]
        lo, hi = max(0, -off), min(v, L - off)
        if hi <= lo:
            shape = y.shape[:1] + tuple(view.shape) + ((2,) if interleaved else ())
            return jnp.zeros(shape, dtype=y.dtype)
        slices.append(slice(lo + off, hi + off))
        pads.append((lo, v - hi))
    slices += [slice(None)] * tail
    pads += [(0, 0)] * tail
    return jnp.pad(y[tuple(slices)], pads)


# ---------------------------------------------------------------------------
# zeroPad (range-based zeroing; reference: src/kernels/zero_pad.js:21-79)
# ---------------------------------------------------------------------------

def zero_pad_apply(x, stage: Optional[ZeroPadStage], domain: Sequence[int],
                   interleaved: bool):
    """Zero everything outside the [start, end) hyper-rect.  One broadcast
    multiply per non-trivial axis; XLA fuses them into neighbors."""
    if stage is None:
        return x
    rank = len(domain)
    tail = 1 if interleaved else 0
    for d in range(rank):
        s, e, n = stage.start[d], stage.end[d], domain[d]
        if s == 0 and e == n:
            continue
        iota = jnp.arange(n)
        mask = ((iota >= s) & (iota < e)).astype(x.dtype)
        shape = [1] * x.ndim
        shape[1 + d] = n
        x = x * mask.reshape(shape)
    return x


# ---------------------------------------------------------------------------
# Strided flat-buffer gather/scatter
# (reference: src/kernels/strided_complex.js / strided_real.js)
# ---------------------------------------------------------------------------

def default_strides(shape: Sequence[int]) -> Tuple[int, ...]:
    """C-order contiguous: last logical axis fastest (matches how shaped
    arrays flatten in this framework)."""
    rank = len(shape)
    out = [1] * rank
    for d in range(rank - 2, -1, -1):
        out[d] = out[d + 1] * shape[d + 1]
    return tuple(out)


def layout_span(shape: Sequence[int], strides: Sequence[int]) -> int:
    """Elements spanned by one batch item (reference:
    src/runtime/tensor_descriptor.js span rule)."""
    return 1 + sum((shape[d] - 1) * strides[d] for d in range(len(shape)))


def resolve_side_layout(shape: Sequence[int], strides: Optional[Sequence[int]],
                        offset: int, batch_stride: Optional[int],
                        lane: Optional[ChannelLane]):
    """Lower (strides/offset/batchStride | whdcn lane) to a concrete
    (strides, offset, batch_stride) triple over the side shape
    (reference: src/runtime/layout_semantics.js:120-232)."""
    n = math.prod(shape)
    if lane is not None:
        if strides is not None:
            raise PlanError("whdcn and explicit strides cannot both be set for a side")
        cs = lane.channel_stride_elements if lane.channel_stride_elements is not None else n
        bs = (lane.batch_stride_elements if lane.batch_stride_elements is not None
              else lane.channels * cs)
        off = lane.offset_elements + lane.channel_index * cs
        return default_strides(shape), off, bs
    st = tuple(strides) if strides is not None else default_strides(shape)
    bs = batch_stride if batch_stride is not None else layout_span(shape, st)
    return st, offset, bs


def flat_indices(shape: Sequence[int], strides: Sequence[int], offset: int,
                 batch_stride: int, batch: int, extra_offset=None):
    """Element-index tensor (batch, *shape) built on device from iotas.
    ``extra_offset`` is an optional runtime scalar added to every index —
    the analog of the reference's exec-time inputOffsetBytes
    (src/kernels/strided_complex.js `extraOffsetElements` uniform)."""
    idx = jnp.asarray(offset + batch_stride * np.arange(batch), dtype=jnp.int32)
    idx = idx.reshape((batch,) + (1,) * len(shape))
    for d, n in enumerate(shape):
        sh = [1] * (len(shape) + 1)
        sh[1 + d] = n
        idx = idx + (strides[d] * jnp.arange(n, dtype=jnp.int32)).reshape(sh)
    if extra_offset is not None:
        idx = idx + jnp.asarray(extra_offset, dtype=jnp.int32)
    return idx


def gather_flat(flat, *, shape, strides, offset, batch_stride, batch,
                interleaved, extra_offset=None):
    """Flat (L[, 2]) buffer -> shaped (batch, *shape[, 2])."""
    want = 2 if interleaved else 1
    if flat.ndim != want:
        raise PlanError(
            f"strided-layout exec expects a flat buffer of rank {want} "
            f"({'(L, 2) interleaved' if interleaved else '(L,)'}), got shape {flat.shape}")
    need = offset + batch_stride * (batch - 1) + layout_span(shape, strides)
    if flat.shape[0] < need:
        raise PlanError(f"flat input too small: need {need} elements, got {flat.shape[0]}")
    idx = flat_indices(shape, strides, offset, batch_stride, batch, extra_offset)
    return jnp.take(flat, idx, axis=0)


def scatter_flat(values, *, shape, strides, offset, batch_stride, batch,
                 interleaved, out=None, min_len: Optional[int] = None,
                 extra_offset=None):
    """Shaped (batch, *shape[, 2]) -> flat (L[, 2]); scatters into ``out``
    when given (preserving untouched elements), else into zeros of the
    minimal span (or ``min_len``)."""
    need = offset + batch_stride * (batch - 1) + layout_span(shape, strides)
    if out is None:
        L = max(need, min_len or 0)
        base_shape = (L, 2) if interleaved else (L,)
        out = jnp.zeros(base_shape, dtype=values.dtype)
    else:
        if out.shape[0] < need:
            raise PlanError(f"output buffer too small: need {need} elements, got {out.shape[0]}")
    idx = flat_indices(shape, strides, offset, batch_stride, batch, extra_offset)
    return out.at[idx.reshape(-1)].set(
        values.reshape((-1, 2) if interleaved else (-1,)).astype(out.dtype))


# ---------------------------------------------------------------------------
# Precision (bf16-storage <-> f32 compute; reference f16_storage.js analog)
# ---------------------------------------------------------------------------

def load_storage(x, precision: str):
    if precision == "bf16-storage":
        return x.astype(jnp.float32)
    return x


def store_storage(y, precision: str):
    if precision == "bf16-storage":
        return y.astype(jnp.bfloat16)
    return y


def expect_dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16-storage" else jnp.float32
