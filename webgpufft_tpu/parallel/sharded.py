"""Multi-chip execution: batch sharding + distributed single-transform FFT.

The reference is a single-GPUDevice library (SURVEY.md §2.9: no multi-device
anywhere); this module is the genuinely new TPU layer.  Two modes:

- **Batch sharding** ("dp"): batched transforms partitioned over the mesh's
  batch axis.  Collective-free — each chip runs the plan on its shard; XLA
  propagates the sharding through the jitted pipeline.

- **Distributed single FFT** ("sp"): one transform larger than a chip (or
  needing sequence-parallel layout) runs as a distributed four-step:
  local DFT over the n1 digit -> twiddle -> all_to_all redistribution over
  ICI -> local DFT over the n2 digit.  One collective per transform; this is
  the scaling-book recipe (shard, compute locally, let the collective ride
  ICI) applied to the FFT's digit-exchange structure.

Layout convention matches the core engine: interleaved complex f32.
Digit split: line index n = n2 + n2_len*n1 (C-order reshape to (n1, n2));
output index k = k1 + n1_len*k2, delivered as (batch, k2, k1, 2) so a plain
reshape yields the standard (batch, n, 2) line order.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import dft
from ..core.cplx import const_pair, to_w4
from ..utils import factors

_PRECISION = jax.lax.Precision.HIGHEST


class UnsplittableAxisError(ValueError):
    """A transform axis has no smooth mesh-divisible digit split.

    Raised (instead of a plain ValueError) so callers with a documented
    fallback route — e.g. the pencil fftconv builder falling back to the
    single-axis padded-circular route (parallel/plans.py) — can catch
    exactly this condition without swallowing unrelated builder errors
    such as the per-device operand-bound rejection."""


def _einsum(pattern, a, b):
    return jnp.einsum(pattern, a, b, precision=_PRECISION)


def _cmul_pair(d, ca, cb):
    return d * ca + jnp.flip(d, axis=-1) * cb


def _batch_chunk_divisor(b: int, per_item: int, budget: int) -> int:
    """Largest divisor of b with slab*per_item <= budget (>= 1)."""
    cap = max(1, budget // max(per_item, 1))
    best = 1
    for d in range(1, min(b, cap) + 1):
        if b % d == 0:
            best = d
    return best


def _check_per_device_operands(n_local_elems: int, what: str):
    """Per-device einsum operands must stay within the validated size
    (core.axis.OPERAND_CHUNK_ELEMS; see CLAUDE.md) even for batch 1."""
    from ..core.axis import OPERAND_CHUNK_ELEMS
    if n_local_elems > OPERAND_CHUNK_ELEMS:
        raise ValueError(
            f"{what}: per-device stage operands ({n_local_elems} complex "
            f"elements) exceed the validated einsum operand size "
            f"({OPERAND_CHUNK_ELEMS}); use more devices along the transform "
            "axis")


def _maybe_batch_slab(body, x_loc, per_item: int):
    """Run ``body`` per batch-slab when the full local batch would push
    einsum operands past the validated size.

    Batch groups serialize through lax.map, NEVER a static slice unroll:
    XLA-TPU miscompiles the unrolled slice->transform-core->concat program
    at production rank-3 geometries (silently wrong r2c/c2r results; see
    plans/transforms.maybe_chunk_core and benches/r30_chunk_bisect.py /
    r31_chunk_fix.py).  This is the same full-core batch-group shape, so
    it takes the verified route."""
    from ..core.axis import OPERAND_CHUNK_ELEMS
    b = x_loc.shape[0]
    if b * per_item <= OPERAND_CHUNK_ELEMS:
        return body(x_loc)
    slab = _batch_chunk_divisor(b, per_item, OPERAND_CHUNK_ELEMS)
    groups = b // slab
    xs = x_loc.reshape(groups, slab, *x_loc.shape[1:])
    ys = jax.lax.map(body, xs)
    return ys.reshape(b, *ys.shape[2:])


# ---------------------------------------------------------------------------
# Batch sharding
# ---------------------------------------------------------------------------

def shard_batch(plan, mesh: Mesh, axis_name: str = "dp"):
    """Wrap a plan so exec runs with the batch dim sharded over ``axis_name``.

    Returns run(x) -> y; data is placed with a batch NamedSharding and the
    jitted pipeline partitions automatically (no collectives for batched
    transforms).
    """
    def run(x):
        x = jnp.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        x = jax.device_put(x, NamedSharding(mesh, spec))
        return plan(x)
    return run


# ---------------------------------------------------------------------------
# Distributed single-transform FFT (four-step over ICI)
# ---------------------------------------------------------------------------

def choose_distributed_split(n: int, ndev: int) -> Optional[Tuple[int, int]]:
    """(n1, n2) with n = n1*n2, ndev | n1 and ndev | n2, both smooth and as
    balanced as possible; None when impossible."""
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            for n1 in (d, n // d):
                n2 = n // n1
                if (n1 % ndev == 0 and n2 % ndev == 0
                        and factors.is_smooth(n1) and factors.is_smooth(n2)):
                    key = abs(n1 - n2)
                    if best is None or key < best[0]:
                        best = (key, (n1, n2))
        d += 1
    return best[1] if best else None


def build_distributed_fft_1d(n: int, mesh: Mesh, axis_name: str = "sp",
                             direction: str = "forward",
                             normalize: str = "none",
                             batch_axis_name: Optional[str] = None,
                             split: Optional[Tuple[int, int]] = None):
    """Build fn(x) computing a length-n FFT distributed over mesh axis
    ``axis_name``.

    x: (batch, n, 2) f32.  Returns (batch, k2, k1, 2) with k = k1 + n1*k2
    and the k1 dim carrying the device sharding; ``.reshape(batch, n, 2)``
    restores the flat line.

    Math (four-step, digit split n = n2 + n2_len*n1):
      X[k1 + n1_len*k2] =
        sum_{n2} W2^{n2 k2} * W_N^{n2 k1} * (sum_{n1} x[n1, n2] W1^{n1 k1})
    Stage 1 contracts the n1 digit locally on each n2-shard; the all_to_all
    exchanges the k1 digit for the n2 digit; stage 2 contracts n2 locally.

    ``split`` overrides the balanced (n1, n2) choice — used to chain plans:
    a forward plan's (k2, k1) output grid IS the digit grid of an inverse
    plan built with the swapped split, so spectra flow between them without
    any resharding.
    """
    ndev = mesh.shape[axis_name]
    if split is None:
        split = choose_distributed_split(n, ndev)
    if split is None:
        raise UnsplittableAxisError(
            f"cannot split n={n} into two smooth factors divisible by {ndev}")
    n1, n2 = split
    if n1 * n2 != n or n1 % ndev or n2 % ndev:
        raise ValueError(f"invalid split {split} for n={n}, ndev={ndev}")
    from ..utils.mathref import normalize_scale
    scale = normalize_scale(normalize, direction, n)

    w1 = jnp.asarray(to_w4(dft.dft_matrix(n1, direction)))           # (n1,2,n1,2)
    w2 = jnp.asarray(to_w4(dft.dft_matrix(n2, direction)
                           * np.complex64(scale)))                    # scale folded
    sign = -1.0 if direction == "forward" else 1.0
    tw = np.exp(sign * 2j * np.pi *
                (np.outer(np.arange(n1), np.arange(n2)) % n) / n)     # [k1, n2]
    twa, twb = const_pair(tw)                                         # (n1, n2, 2)
    twa, twb = jnp.asarray(twa), jnp.asarray(twb)
    n2_loc = n2 // ndev

    _check_per_device_operands(n // ndev, f"distributed fft n={n}")

    def local_body(x_loc):
        idx = jax.lax.axis_index(axis_name)
        # stage 1: contract the n1 digit: y[b, k1, j, comp]
        y = _einsum("baji,aick->bcjk", x_loc, w1)
        # twiddle W_N^{n2*k1}, sliced to this device's n2 range
        ta = jax.lax.dynamic_slice_in_dim(twa, idx * n2_loc, n2_loc, axis=1)
        tb = jax.lax.dynamic_slice_in_dim(twb, idx * n2_loc, n2_loc, axis=1)
        y = _cmul_pair(y, ta, tb)
        # digit exchange over ICI: shard k1, gather full n2
        y = jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=2,
                               tiled=True)                # (b, k1_loc, n2, 2)
        # stage 2: contract the n2 digit
        return _einsum("bcai,aimk->bcmk", y, w2)          # (b, k1_loc, k2, 2)

    def local_fn(x_loc):
        # x_loc: (batch, n1, n2_loc, 2) — this device's n2-shard.  Batch
        # slabs bound the per-device einsum operand sizes.
        return _maybe_batch_slab(local_body, x_loc, n // ndev)

    def fn(x):
        if x.ndim == 3:
            x = x.reshape(x.shape[0], n1, n2, 2)          # digit grid
        elif x.shape[1:] != (n1, n2, 2):
            raise ValueError(f"expected (b, n, 2) or (b, {n1}, {n2}, 2), got {x.shape}")
        y = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=P(batch_axis_name, None, axis_name, None),
            out_specs=P(batch_axis_name, axis_name, None, None),
        )(x)
        return jnp.swapaxes(y, 1, 2)                      # (b, k2, k1, 2)

    fn.split = (n1, n2)
    return fn


def build_distributed_fft_axis0(shape, mesh: Mesh, axis_name: str = "sp",
                                direction: str = "forward",
                                normalize: str = "none",
                                batch_axis_name: Optional[str] = None,
                                split: Optional[Tuple[int, int]] = None,
                                rest_specs: Optional[Tuple] = None):
    """Distributed FFT along logical AXIS 0 of an ND array, trailing axes
    riding locally — the sequence-parallel building block for ND transforms
    whose leading axis spans chips.

    x: (batch, n0, *shape[1:], 2).  Same four-step digit exchange as
    build_distributed_fft_1d, with the remaining axes carried through every
    contraction as a free dim.  Output: (batch, k2, k1, *shape[1:], 2) with
    axis-0 index k = k1 + n1*k2 (reshape merges (k2, k1) back to n0).
    Remaining axes are NOT transformed — compose with local plans for the
    other axes (they are embarrassingly parallel across the n0 shard).

    ``rest_specs``: optional per-riding-axis PartitionSpec entries (mesh
    axis names or None, one per shape[1:] dim) when riding axes are
    themselves sharded — the pencil-decomposition composition, where the
    already-exchanged axis-1 digit grid rides through the axis-0 stage
    still sharded over its own mesh axis.
    """
    n0 = shape[0]
    rest = tuple(shape[1:])
    ndev = mesh.shape[axis_name]
    if rest_specs is None:
        rest_specs = (None,) * len(rest)
    if len(rest_specs) != len(rest):
        raise ValueError("rest_specs must have one entry per riding axis")
    # per-device riding-axis footprint: sharded riding dims divide out
    rest_dev = 1
    for m, s in zip(rest, rest_specs):
        rest_dev *= m // (mesh.shape[s] if s is not None else 1)
    if split is None:
        split = choose_distributed_split(n0, ndev)
    if split is None:
        raise UnsplittableAxisError(
            f"cannot split n0={n0} into two smooth factors divisible by {ndev}")
    n1, n2 = split
    if n1 * n2 != n0 or n1 % ndev or n2 % ndev:
        raise ValueError(f"invalid split {split} for n0={n0}, ndev={ndev}")
    from ..utils.mathref import normalize_scale
    scale = normalize_scale(normalize, direction, n0)

    w1 = jnp.asarray(to_w4(dft.dft_matrix(n1, direction)))
    w2 = jnp.asarray(to_w4(dft.dft_matrix(n2, direction) * np.complex64(scale)))
    sign = -1.0 if direction == "forward" else 1.0
    tw = np.exp(sign * 2j * np.pi *
                (np.outer(np.arange(n1), np.arange(n2)) % n0) / n0)   # [k1, n2]
    twa, twb = const_pair(tw)                                          # (n1, n2, 2)
    # broadcast over the riding axes: (n1, n2, *1s, 2)
    bshape = (n1, n2) + (1,) * len(rest) + (2,)
    twa = jnp.asarray(twa.reshape(bshape))
    twb = jnp.asarray(twb.reshape(bshape))
    n2_loc = n2 // ndev

    per_item = (n0 // ndev) * rest_dev
    _check_per_device_operands(per_item, f"distributed axis0 fft n0={n0}")

    def local_body(x_loc):
        idx = jax.lax.axis_index(axis_name)
        y = _einsum("baj...i,aick->bcj...k", x_loc, w1)   # contract n1 digit
        ta = jax.lax.dynamic_slice_in_dim(twa, idx * n2_loc, n2_loc, axis=1)
        tb = jax.lax.dynamic_slice_in_dim(twb, idx * n2_loc, n2_loc, axis=1)
        y = _cmul_pair(y, ta, tb)
        y = jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=2,
                               tiled=True)                 # (b, k1_loc, n2, ...)
        return _einsum("bca...i,aimk->bcm...k", y, w2)     # contract n2 digit

    def local_fn(x_loc):
        # x_loc: (b, n1, n2_loc, *rest, 2); batch slabs bound the operands
        return _maybe_batch_slab(local_body, x_loc, per_item)

    def fn(x):
        x = x.reshape(x.shape[0], n1, n2, *rest, 2)
        y = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=P(batch_axis_name, None, axis_name, *rest_specs, None),
            out_specs=P(batch_axis_name, axis_name, None, *rest_specs, None),
        )(x)
        return jnp.swapaxes(y, 1, 2)                       # (b, k2, k1, *rest, 2)

    fn.split = (n1, n2)
    return fn


def build_distributed_pencil_axes01(shape, mesh: Mesh,
                                    axes: Tuple[str, str] = ("sp0", "sp1"),
                                    direction: str = "forward",
                                    batch_axis_name: Optional[str] = None,
                                    splits=None):
    """Pencil-decomposed distributed FFT: logical axes 0 AND 1 each span
    their own mesh axis (a 2-D device decomposition — the heFFTe/P3DFFT
    production layout for 3-D volumes; the reference is single-device,
    SURVEY.md §2.9, so this is new TPU scaling work).

    Versus the single-``seq_axis`` route — which shards only axis 0 and
    requires every device to hold the FULL remaining volume slab — the
    pencil keeps per-device memory at n0/P0 x n1/P1 x rest and scales to
    P0*P1 chips.  Communication: exactly one all_to_all per decomposed
    axis (the digit exchange of each four-step stage), each riding only
    its own mesh axis's ICI ring — no global collective ever sees the
    whole volume.

    x: (batch, n0, n1, *rest, 2) -> same shape, axes 0 and 1 transformed
    (normalize is the caller's job — fold into plan-level scale).  Riding
    axes (shape[2:]) are NOT transformed; compose with local plans (they
    stay embarrassingly parallel over both shardings).

    Structure: the axis-1 stage is the four-step digit exchange of
    build_distributed_fft_axis0 with the (sharded) n0 dim riding in
    front; its output digit grid then rides — still sharded over
    ``axes[1]`` — through the axis-0 stage (rest_specs), so no resharding
    happens between the stages.  Both output digit grids merge at the
    end, exactly like the single-axis route.
    """
    a0, a1 = axes
    if a0 == a1:
        raise ValueError("pencil axes must be two distinct mesh axes")
    n0, n1 = shape[0], shape[1]
    rest = tuple(shape[2:])
    p0, p1 = mesh.shape[a0], mesh.shape[a1]
    s0 = splits[0] if splits else choose_distributed_split(n0, p0)
    s1 = splits[1] if splits else choose_distributed_split(n1, p1)
    if s0 is None or s1 is None:
        bad = f"n0={n0} over {p0}" if s0 is None else f"n1={n1} over {p1}"
        raise UnsplittableAxisError(
            f"pencil decomposition needs both sharded axes to split into "
            f"two smooth mesh-divisible factors; cannot split {bad} "
            f"(single seq_axis handles any length via Bluestein)")
    q1, q2 = s1

    # --- axis-1 stage tables (digit exchange over a1, n0 riding in front)
    w1q = jnp.asarray(to_w4(dft.dft_matrix(q1, direction)))
    w2q = jnp.asarray(to_w4(dft.dft_matrix(q2, direction)))
    sign = -1.0 if direction == "forward" else 1.0
    twq = np.exp(sign * 2j * np.pi *
                 (np.outer(np.arange(q1), np.arange(q2)) % n1) / n1)
    twqa, twqb = const_pair(twq)                           # (q1, q2, 2)
    bshape = (1, q1, q2) + (1,) * len(rest) + (2,)
    twqa = jnp.asarray(twqa.reshape(bshape))
    twqb = jnp.asarray(twqb.reshape(bshape))
    q2_loc = q2 // p1

    per_item = (n0 // p0) * (n1 // p1) * math.prod(rest)
    _check_per_device_operands(per_item, f"pencil fft {n0}x{n1}")

    def ax1_body(x_loc):
        # x_loc: (b, n0_loc, q1, q2_loc, *rest, 2)
        idx = jax.lax.axis_index(a1)
        y = _einsum("bxaj...i,aick->bxcj...k", x_loc, w1q)
        ta = jax.lax.dynamic_slice_in_dim(twqa, idx * q2_loc, q2_loc, axis=2)
        tb = jax.lax.dynamic_slice_in_dim(twqb, idx * q2_loc, q2_loc, axis=2)
        y = _cmul_pair(y, ta, tb)
        y = jax.lax.all_to_all(y, a1, split_axis=2, concat_axis=3,
                               tiled=True)       # (b, n0_loc, k1_loc, q2, ...)
        return _einsum("bxca...i,aimk->bxcm...k", y, w2q)

    def ax1_fn(x_loc):
        return _maybe_batch_slab(ax1_body, x_loc, per_item)

    # --- axis-0 stage: the plain axis-0 builder with the axis-1 digit
    # grid (k1q sharded over a1) riding through via rest_specs
    rest_none = (None,) * len(rest)
    fft0 = build_distributed_fft_axis0(
        (n0, q1, q2, *rest), mesh, a0, direction, "none", batch_axis_name,
        split=s0, rest_specs=(a1, None, *rest_none))

    def fn(x):
        b = x.shape[0]
        x = x.reshape(b, n0, q1, q2, *rest, 2)
        y = jax.shard_map(
            ax1_fn, mesh=mesh,
            in_specs=P(batch_axis_name, a0, None, a1, *rest_none, None),
            out_specs=P(batch_axis_name, a0, a1, None, *rest_none, None),
        )(x)                                     # (b, n0, k1q, k2q, *rest, 2)
        y = fft0(y)                              # (b, k2m, k1m, k1q, k2q, ...)
        y = y.reshape(b, n0, *y.shape[3:])       # merge the axis-0 grid
        y = jnp.swapaxes(y, 2, 3)                # (b, n0, k2q, k1q, *rest, 2)
        return y.reshape(b, n0, n1, *rest, 2)

    fn.split = (s0, s1)
    return fn


# ---------------------------------------------------------------------------
# Distributed compositions: r2c and FFT convolution
# (new TPU layer; the reference is single-device — SURVEY.md §2.9)
# ---------------------------------------------------------------------------

def build_distributed_r2c_1d(n: int, mesh: Mesh, axis_name: str = "sp",
                             normalize: str = "none",
                             batch_axis_name: Optional[str] = None):
    """Distributed real->packed-complex 1D FFT via the even-N half-complex
    trick on the distributed digit plan (the multi-chip composition of
    plans/transforms.build_r2c's core).

    x: (batch, n) f32 real.  Returns (batch, n//2 + 1, 2) packed
    non-negative bins.  When n is even AND n/2 admits a mesh-divisible
    digit split, the half-complex trick runs the half-length complex FFT
    as the distributed four-step (one all_to_all over ICI) with the
    untangle on the sharded spectrum — XLA inserts the flip collective.
    Otherwise (odd n, or an unsplittable half like n=360 on a 4-wide
    axis) the input widens to a full-length complex FFT (2x the traffic;
    Bluestein when n itself has no split).
    """
    if n % 2 or choose_distributed_split(n // 2,
                                         mesh.shape[axis_name]) is None:
        fftc = build_distributed_fft_any_1d(n, mesh, axis_name, "forward",
                                            normalize, batch_axis_name)
        packed = n // 2 + 1

        def fn(x):
            b = x.shape[0]
            v = jnp.stack([x, jnp.zeros_like(x)], axis=-1)
            z = fftc(v).reshape(b, n, 2)
            return z[:, :packed, :]

        fn.split = fftc.split
        return fn
    h = n // 2
    from ..plans.transforms import _half_trick_consts
    from ..utils.mathref import normalize_scale

    fftc = build_distributed_fft_1d(h, mesh, axis_name, "forward", "none",
                                    batch_axis_name)
    cc = _half_trick_consts(n, inverse=False)
    ca = jnp.asarray(cc["rc/ca"]).reshape(1, h + 1, 2)
    cb = jnp.asarray(cc["rc/cb"]).reshape(1, h + 1, 2)
    scale = normalize_scale(normalize, "forward", n)

    def fn(x):
        b = x.shape[0]
        # adjacent real pairs ARE the interleaved complex line v[m]
        v = x.reshape(b, h, 2)
        z = fftc(v).reshape(b, h, 2)                 # flat half-spectrum
        # Z[-k] for k=0..h as rev+concat (gather spelling measured 5.8x
        # off elementwise at 256^3; benches/r15_untangle_rev.py)
        zf = jnp.concatenate(
            [z[:, :1], jnp.flip(z[:, 1:], axis=1), z[:, :1]], axis=1)
        zf = zf * jnp.asarray([1.0, -1.0], dtype=z.dtype)     # conj(Z[-k])
        zpad = jnp.concatenate([z, z[:, :1, :]], axis=1)      # Z[h] = Z[0]
        y = (zpad + zf) * 0.5 + _cmul_pair(zpad - zf, ca, cb)
        return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fftc.split
    return fn


def build_distributed_c2r_1d(n: int, mesh: Mesh, axis_name: str = "sp",
                             normalize: str = "none",
                             batch_axis_name: Optional[str] = None):
    """Distributed packed-complex->real inverse 1D FFT — the mirror of
    build_distributed_r2c_1d (multi-chip composition of
    plans/transforms.build_c2r's half-complex core).

    x: (batch, n//2 + 1, 2) packed non-negative bins.  Returns (batch, n)
    f32 real.  When n is even and n/2 admits a mesh-divisible split, the
    packed bins re-tangle to the half-length complex spectrum (elementwise
    + a flip gather on the flat spectrum) and the length-n/2 inverse runs
    as the distributed four-step (one all_to_all over ICI).  Otherwise
    (odd n, or an unsplittable half) the full Hermitian spectrum is
    unpacked and a length-n inverse runs (2x the traffic; Bluestein when
    n itself has no split).
    """
    if n % 2 or choose_distributed_split(n // 2,
                                         mesh.shape[axis_name]) is None:
        from ..utils.mathref import normalize_scale
        ifftc = build_distributed_fft_any_1d(n, mesh, axis_name, "inverse",
                                             "none", batch_axis_name)
        packed = n // 2 + 1
        # mirror gather: bin k>n//2 reads conj(packed[n-k]); bin 0's imag
        # is zeroed (self-conjugate for a real signal)
        mirror = np.concatenate(
            [np.arange(packed), np.arange(n - packed, 0, -1)]).astype(np.int32)
        conj_mask = np.concatenate(
            [np.ones(packed), -np.ones(n - packed)]).astype(np.float32)
        mirror_j = jnp.asarray(mirror)
        cm = jnp.asarray(np.stack([np.ones(n, np.float32), conj_mask], -1))
        scale = normalize_scale(normalize, "inverse", n)

        def fn(xp):
            b = xp.shape[0]
            bin_iota = jnp.arange(packed).reshape(1, packed, 1)
            comp = jnp.arange(2).reshape(1, 1, 2)
            xp = jnp.where((bin_iota == 0) & (comp == 1), 0.0, xp)
            full = jnp.take(xp, mirror_j, axis=1) * cm
            out = ifftc(full).reshape(b, n, 2)[..., 0]
            return out if scale == 1.0 else out * jnp.asarray(scale, out.dtype)

        fn.split = ifftc.split
        return fn
    h = n // 2
    from ..plans.transforms import _half_trick_consts
    from ..utils.mathref import normalize_scale

    ifftc = build_distributed_fft_1d(h, mesh, axis_name, "inverse", "none",
                                     batch_axis_name)
    cc = _half_trick_consts(n, inverse=True)
    ca = jnp.asarray(cc["cr/ca"]).reshape(1, h, 2)
    cb = jnp.asarray(cc["cr/cb"]).reshape(1, h, 2)
    scale = normalize_scale(normalize, "inverse", n)

    def fn(xp):
        b = xp.shape[0]
        # bins 0 and n/2 are self-conjugate for a real signal: drop any
        # residual imag there (reference zeroes self-conjugate bins,
        # real_complex.js:116-201)
        bin_iota = jnp.arange(h + 1).reshape(1, h + 1, 1)
        comp = jnp.arange(2).reshape(1, 1, 2)
        selfconj = ((bin_iota == 0) | (bin_iota == h)) & (comp == 1)
        y = jnp.where(selfconj, 0.0, xp)
        xk = y[:, :h, :]
        # X[h-k] for k=0..h-1 is a pure reversal of bins 1..h
        xf = jnp.flip(y[:, 1:, :], axis=1)
        xf = xf * jnp.asarray([1.0, -1.0], dtype=y.dtype)     # conj
        z = (xk + xf) + _cmul_pair(xk - xf, ca, cb)
        z = ifftc(z).reshape(b, h, 2)      # unnormalized inverse, flat order
        out = z.reshape(b, n)              # (re, im) pairs ARE (x[2m], x[2m+1])
        return out if scale == 1.0 else out * jnp.asarray(scale, out.dtype)

    fn.split = ifftc.split
    return fn


def _local_rest_axis_plans(rest, direction: str, tuning):
    """Axis plans + jnp consts for the locally-transformed riding axes of
    an ND distributed plan (logical axes 1..rank-1)."""
    from ..core.axis import build_axis_plan
    from ..spec import TuningSpec
    tuning = tuning if tuning is not None else TuningSpec()
    plans, consts = [], {}
    for d, m in enumerate(rest):
        ap = build_axis_plan(m, d + 1, direction, tuning, f"dr{d}")
        consts.update(ap.consts())
        plans.append(ap)
    return plans, {k: jnp.asarray(v) for k, v in consts.items()}


def build_distributed_r2c_nd(shape, mesh: Mesh, axis_name: str = "sp",
                             normalize: str = "none",
                             batch_axis_name: Optional[str] = None,
                             tuning=None, pencil_axes=None):
    """Distributed ND real->packed-complex FFT, axis 0 spanning chips.

    The multi-chip composition of plans/transforms.build_r2c (rank >= 2):
    axis 0 — the packed axis, reference packing conventions
    real_complex.js:73-201 — runs the even-n0 half-complex trick on the
    distributed axis-0 digit plan (the length-n0/2 complex four-step with
    one all_to_all, riding axes carried through); the remaining axes
    transform locally on the packed domain, embarrassingly parallel over
    the k1 sharding.  Odd / half-unsplittable n0 widens to the full
    complex axis-0 plan (2x traffic), mirroring the 1-D builder.

    ``pencil_axes``: a (a0, a1) mesh-axis pair routes the complex core
    through the pencil decomposition (axes 0 AND 1 sharded); axis 1 then
    transforms inside the core instead of in local_rest.  Pencil requires
    divisible smooth splits on both axes (no Bluestein fallback).

    x: (batch, *shape) f32 real -> (batch, n0//2+1, *shape[1:], 2).
    """
    n0, rest = shape[0], tuple(shape[1:])
    assert rest, "rank >= 2 (use build_distributed_r2c_1d for rank 1)"
    p0 = n0 // 2 + 1
    ndev = mesh.shape[pencil_axes[0] if pencil_axes else axis_name]
    from ..plans.transforms import _half_trick_consts
    from ..utils.mathref import normalize_scale
    scale = normalize_scale(normalize, "forward", math.prod(shape))
    skip = 1 if pencil_axes else 0           # pencil core covers axis 1 too
    rest_plans, consts = _local_rest_axis_plans(rest[skip:], "forward",
                                               tuning)
    from ..core.axis import slabbed_axis_apply

    def local_rest(y):
        # y: (b, p, *rest, 2) — locally-transformed rest axis d sits at
        # dim 2+skip+d
        # descending order: a leading-axis pass poisons later last-axis
        # passes' layout (r17c, see engine.apply_nd)
        for d in range(len(rest_plans) - 1, -1, -1):
            ap = rest_plans[d]
            if ap.n > 1:
                y = slabbed_axis_apply(y, ap, 2 + skip + d, consts)
        return y

    def core_builder(core_shape, direction):
        if pencil_axes is not None:
            return build_distributed_pencil_axes01(
                core_shape, mesh, tuple(pencil_axes), direction,
                batch_axis_name)
        return build_distributed_fft_any_axis0(
            core_shape, mesh, axis_name, direction, "none", batch_axis_name)

    # route priority (any n0 distributes): half-trick four-step when n0/2
    # splits (half traffic, one all_to_all) > widen four-step when n0
    # splits (one all_to_all, full width) > half-trick Bluestein (even n0;
    # half width, two all_to_alls) > widen Bluestein (odd n0).  Pencil has
    # no Bluestein fallback: unsplittable axes raise (caller surfaces as
    # PlanError suggesting single seq_axis).  Pencil always WIDENS: the
    # half-complex unpack conjugates (R-linear, not C-linear), so it does
    # not commute with the axis-1 FFT the pencil core already applied —
    # a half-trick pencil would need the unpack spliced between the two
    # core stages.
    even = n0 % 2 == 0 and n0 >= 4
    use_half = pencil_axes is None and even and (
        choose_distributed_split(n0 // 2, ndev) is not None
        or choose_distributed_split(n0, ndev) is None)
    if not use_half:
        # complex widening on the full-length axis-0 plan
        fft0 = core_builder(shape, "forward")

        def fn(x):
            b = x.shape[0]
            xi = jnp.stack([x.reshape(b, *shape),
                            jnp.zeros((b, *shape), x.dtype)], axis=-1)
            z = fft0(xi).reshape(b, n0, *rest, 2)
            y = local_rest(z[:, :p0, ...])   # pack non-negative axis-0 bins
            return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

        fn.split = fft0.split
        return fn

    h = n0 // 2
    fft0 = core_builder((h, *rest), "forward")
    cc = _half_trick_consts(n0, inverse=False)
    cshape = (1, p0) + (1,) * len(rest) + (2,)
    ca = jnp.asarray(cc["rc/ca"]).reshape(cshape)
    cb = jnp.asarray(cc["rc/cb"]).reshape(cshape)

    def fn(x):
        b = x.shape[0]
        # adjacent axis-0 real pairs ARE the interleaved complex line
        v = jnp.moveaxis(x.reshape(b, h, 2, *rest), 2, -1)
        z = fft0(v).reshape(b, h, *rest, 2)
        # Z[-k] for k=0..h as rev+concat (gather spelling measured 5.8x
        # off elementwise at 256^3; benches/r15_untangle_rev.py)
        zf = jnp.concatenate(
            [z[:, :1], jnp.flip(z[:, 1:], axis=1), z[:, :1]], axis=1)
        zf = zf * jnp.asarray([1.0, -1.0], dtype=z.dtype)     # conj(Z[-k])
        zpad = jnp.concatenate([z, z[:, :1, ...]], axis=1)    # Z[h] = Z[0]
        y = (zpad + zf) * 0.5 + _cmul_pair(zpad - zf, ca, cb)
        y = local_rest(y)
        return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fft0.split
    return fn


def build_distributed_c2r_nd(shape, mesh: Mesh, axis_name: str = "sp",
                             normalize: str = "none",
                             batch_axis_name: Optional[str] = None,
                             tuning=None, pencil_axes=None):
    """Distributed ND packed-complex->real inverse FFT — the mirror of
    build_distributed_r2c_nd (multi-chip composition of
    plans/transforms.build_c2r, rank >= 2; packing conventions
    real_complex.js:73-201, self-conjugate bin zeroing included).
    ``pencil_axes`` routes the complex core through the axes-0/1 pencil
    decomposition, as in build_distributed_r2c_nd.

    x: (batch, n0//2+1, *shape[1:], 2) -> (batch, *shape) f32 real.
    """
    n0, rest = shape[0], tuple(shape[1:])
    assert rest, "rank >= 2 (use build_distributed_c2r_1d for rank 1)"
    p0 = n0 // 2 + 1
    ndev = mesh.shape[pencil_axes[0] if pencil_axes else axis_name]
    from ..plans.transforms import _half_trick_consts
    from ..utils.mathref import normalize_scale
    scale = normalize_scale(normalize, "inverse", math.prod(shape))
    skip = 1 if pencil_axes else 0
    rest_plans, consts = _local_rest_axis_plans(rest[skip:], "inverse",
                                               tuning)
    from ..core.axis import slabbed_axis_apply

    def local_rest(y):
        # descending order: a leading-axis pass poisons later last-axis
        # passes' layout (r17c, see engine.apply_nd)
        for d in range(len(rest_plans) - 1, -1, -1):
            ap = rest_plans[d]
            if ap.n > 1:
                y = slabbed_axis_apply(y, ap, 2 + skip + d, consts)
        return y

    def core_builder(core_shape, direction):
        if pencil_axes is not None:
            return build_distributed_pencil_axes01(
                core_shape, mesh, tuple(pencil_axes), direction,
                batch_axis_name)
        return build_distributed_fft_any_axis0(
            core_shape, mesh, axis_name, direction, "none", batch_axis_name)

    # pencil widens for the same reason as build_distributed_r2c_nd: the
    # half-trick pack conjugates, which does not commute with the axis-1
    # inverse FFT inside the pencil core
    even = n0 % 2 == 0 and n0 >= 4
    use_half = pencil_axes is None and even and (
        choose_distributed_split(n0 // 2, ndev) is not None
        or choose_distributed_split(n0, ndev) is None)
    if not use_half:
        ifft0 = core_builder(shape, "inverse")
        k_max_mirror = n0 // 2 - 1 if n0 % 2 == 0 else n0 // 2

        def fn(xp):
            b = xp.shape[0]
            xp = xp.reshape(b, p0, *rest, 2)
            # ND Hermitian mirror X[(N-k) mod N] = conj(X[k]): flip axis 0
            # over the mirrored bin range, flip+wrap every riding axis
            if k_max_mirror >= 1:
                mirror = jnp.flip(xp[:, 1:k_max_mirror + 1, ...], axis=1)
                mirror = mirror * jnp.asarray([1.0, -1.0], dtype=xp.dtype)
                for d in range(2, mirror.ndim - 1):
                    mirror = jnp.roll(jnp.flip(mirror, axis=d), 1, axis=d)
                full = jnp.concatenate([xp, mirror], axis=1)
            else:
                full = xp
            z = ifft0(full).reshape(b, n0, *rest, 2)
            z = local_rest(z)
            out = z[..., 0]
            return out if scale == 1.0 else out * jnp.asarray(scale, out.dtype)

        fn.split = ifft0.split
        return fn

    h = n0 // 2
    ifft0 = core_builder((h, *rest), "inverse")
    cc = _half_trick_consts(n0, inverse=True)
    cshape = (1, h) + (1,) * len(rest) + (2,)
    ca = jnp.asarray(cc["cr/ca"]).reshape(cshape)
    cb = jnp.asarray(cc["cr/cb"]).reshape(cshape)

    def fn(xp):
        b = xp.shape[0]
        y = xp.reshape(b, p0, *rest, 2)
        # inverse-transform the riding axes first (on the packed domain);
        # afterwards each axis-0 line is a real line's spectrum
        y = local_rest(y)
        bin_iota = jnp.arange(p0).reshape((1, p0) + (1,) * len(rest) + (1,))
        comp = jnp.arange(2).reshape((1, 1) + (1,) * len(rest) + (2,))
        selfconj = ((bin_iota == 0) | (bin_iota == h)) & (comp == 1)
        y = jnp.where(selfconj, 0.0, y)
        xk = y[:, :h, ...]
        # X[h-k] for k=0..h-1 is a pure reversal of bins 1..h
        xf = jnp.flip(y[:, 1:, ...], axis=1)
        xf = xf * jnp.asarray([1.0, -1.0], dtype=y.dtype)  # conj(X[h-k])
        z = (xk + xf) + _cmul_pair(xk - xf, ca, cb)
        z = ifft0(z).reshape(b, h, *rest, 2)
        out = jnp.moveaxis(z, -1, 2).reshape(b, n0, *rest)
        return out if scale == 1.0 else out * jnp.asarray(scale, out.dtype)

    fn.split = ifft0.split
    return fn


def build_distributed_trig_nd(shape, kind: str, mesh: Mesh,
                              axis_name: str = "sp",
                              direction: str = "forward",
                              normalize: str = "none",
                              batch_axis_name: Optional[str] = None,
                              tuning=None):
    """Distributed ND DCT/DST for the FFT-routable kinds (dct2/dct3/dst2/
    dst3), axis 0 spanning chips: the even/odd reorder, half-sample phase
    twist, and sign/flip wrappers run as pointwise/gather stages around
    the distributed axis-0 digit plan (riding axes carried through); the
    remaining axes apply the LOCAL per-axis trig machinery — the same
    matmul-vs-FFT routing as plans/transforms.build_dct (mid-axis forms,
    no moveaxis passes).

    x: (batch, *shape) f32 real -> (batch, *shape) real; one all_to_all.
    """
    from ..plans.transforms import (_DCT_FFT_KINDS, _apply_dct_fft_axis,
                                    _dct_axis_fft_consts, _dct_reorder_perms)
    from ..spec import TuningSpec
    from ..utils.mathref import normalize_scale, trig_matrix
    n0, rest = shape[0], tuple(shape[1:])
    assert rest, "rank >= 2 (use build_distributed_trig_1d for rank 1)"
    if kind in ("dct1", "dst1", "dct4", "dst4"):
        return _build_distributed_trig14_axis0(
            shape, kind, mesh, axis_name, direction, normalize,
            batch_axis_name, tuning)
    tuning = tuning if tuning is not None else TuningSpec()
    alias = {"dct2": "dct3", "dct3": "dct2", "dst2": "dst3", "dst3": "dst2"}
    if kind not in alias:
        raise ValueError(
            f"distributed trig supports dct1..4/dst1..4, got {kind!r}")
    eff = kind if direction == "forward" else alias[kind]
    scale = normalize_scale(normalize, direction, math.prod(shape))
    dst = eff.startswith("dst")
    sgn = jnp.asarray(
        np.where(np.arange(n0) % 2 == 0, 1.0, -1.0).astype(np.float32)
        .reshape((1, n0) + (1,) * len(rest)))
    perm, inv = _dct_reorder_perms(n0)
    w = np.exp(-1j * np.pi * np.arange(n0) / (2 * n0))
    cshape = (1, n0) + (1,) * len(rest) + (2,)

    # riding axes: the local build_dct per-axis machinery
    from ..core.cplx import cmul_const
    axis_mode, axis_objs, consts = [], [], {}
    for d, m in enumerate(rest):
        if eff in _DCT_FFT_KINDS and m >= tuning.dct_fft_min_n:
            ap, cc = _dct_axis_fft_consts(m, eff, f"ddct{d}", tuning)
            consts.update(cc)
            axis_objs.append(ap)
            axis_mode.append("fft")
        else:
            mat = trig_matrix(kind, m, "forward" if direction == "forward"
                              else "inverse")
            consts[f"dtrig{d}"] = mat.T.astype(np.float32)
            axis_objs.append(None)
            axis_mode.append("matmul")
    consts = {k: jnp.asarray(v) for k, v in consts.items()}
    from ..core.axis import mxu_precision
    prec = mxu_precision(tuning)

    def local_rest(y):
        # y: (b, n0, *rest) REAL; logical rest axis d sits at dim 2+d
        for d, m in enumerate(rest):
            ax = 2 + d
            if axis_mode[d] == "fft":
                if ax < y.ndim - 1 and getattr(axis_objs[d], "supports_mid",
                                               False):
                    lead = y.shape[:ax]
                    v = y.reshape(*lead, m, -1)
                    v = _apply_dct_fft_axis(v, consts, axis_objs[d],
                                            f"ddct{d}", eff, m, mid=True)
                    y = v.reshape(y.shape)
                    continue
                y = jnp.moveaxis(y, ax, -1)
                y = _apply_dct_fft_axis(y, consts, axis_objs[d], f"ddct{d}",
                                        eff, m)
                y = jnp.moveaxis(y, -1, ax)
            elif ax == y.ndim - 1:
                y = jnp.matmul(y, consts[f"dtrig{d}"], precision=prec)
            else:
                lead = y.shape[:ax]
                v = y.reshape(*lead, m, -1)
                v = jnp.einsum("...aL,ak->...kL", v, consts[f"dtrig{d}"],
                               precision=prec)
                y = v.reshape(y.shape)
        return y

    if eff in ("dct2", "dst2"):
        fft0 = build_distributed_fft_any_axis0(shape, mesh, axis_name,
                                               "forward", "none",
                                               batch_axis_name)
        wa_, wb_ = const_pair(w)
        wa = jnp.asarray(wa_).reshape(cshape)
        wb = jnp.asarray(wb_).reshape(cshape)
        permj = jnp.asarray(perm)

        def fn(x):
            b = x.shape[0]
            y = x.reshape(b, *shape)
            if dst:                      # dst2 = flip(dct2(altsign(x)))
                y = y * sgn
            v = jnp.take(y, permj, axis=1)
            vi = jnp.stack([v, jnp.zeros_like(v)], axis=-1)
            V = fft0(vi).reshape(b, *shape, 2)
            y = _cmul_pair(V, wa, wb)[..., 0]
            if dst:
                y = jnp.flip(y, axis=1)
            y = local_rest(y)
            return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)
    else:
        fft0 = build_distributed_fft_any_axis0(shape, mesh, axis_name,
                                               "inverse", "none",
                                               batch_axis_name)
        ua_, ub_ = const_pair(0.5 * np.conj(w))
        ua = jnp.asarray(ua_).reshape(cshape)
        ub = jnp.asarray(ub_).reshape(cshape)
        xm_idx = jnp.asarray(
            np.concatenate([[0], np.arange(n0 - 1, 0, -1)]).astype(np.int32))
        xm0 = jnp.asarray(
            np.concatenate([[0.0], np.ones(n0 - 1)]).astype(np.float32)
            .reshape((1, n0) + (1,) * len(rest)))
        invj = jnp.asarray(inv)

        def fn(x):
            b = x.shape[0]
            y = x.reshape(b, *shape)
            if dst:                      # dst3 = altsign(dct3(flip(x)))
                y = jnp.flip(y, axis=1)
            xm = jnp.take(y, xm_idx, axis=1) * xm0
            u = jnp.stack([y, -xm], axis=-1)     # X[k] - i*X[n-k]
            u = _cmul_pair(u, ua, ub)
            v = fft0(u).reshape(b, *shape, 2)[..., 0]  # Re(IFFT_unnorm)
            y = jnp.take(v, invj, axis=1)
            if dst:
                y = y * sgn
            y = local_rest(y)
            return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fft0.split
    return fn


def smooth_distributed_len_at_least(m0: int, ndev: int) -> int:
    """Smallest smooth length >= m0 admitting a two-factor digit split with
    both digits divisible by ndev (the distributed four-step requirement)."""
    m = m0
    for _ in range(64):
        m = factors.next_smooth_at_least(m)
        if choose_distributed_split(m, ndev) is not None:
            return m
        m += 1
    raise ValueError(
        f"no smooth distributed length >= {m0} for {ndev} devices")


def build_distributed_bluestein_1d(n: int, mesh: Mesh, axis_name: str = "sp",
                                   direction: str = "forward",
                                   normalize: str = "none",
                                   batch_axis_name: Optional[str] = None):
    """Distributed 1D FFT of ARBITRARY length via the chirp-Z embedding.

    The four-step path needs n to split into two smooth digits each
    divisible by the mesh axis — impossible for odd/prime n on a
    power-of-two mesh.  Bluestein lifts the transform to a circular
    convolution at a smooth padded length M >= 2n-1 chosen to satisfy the
    split, so ANY length distributes: chirp mul -> distributed forward
    M-FFT -> pointwise kernel-spectrum multiply in the sharded (k2, k1)
    digit grid -> distributed inverse M-FFT (swapped split; spectra flow
    grid-to-grid with no resharding) -> chirp mul.  Two all_to_alls per
    transform (the M-FFT pair); 1/M is folded into the kernel spectrum
    (multi-chip composition of core/axis.BluesteinAxisPlan).

    x: (batch, n, 2) -> (batch, n, 2), standard bin order.
    """
    from ..utils.mathref import normalize_scale
    ndev = mesh.shape[axis_name]
    m = smooth_distributed_len_at_least(max(2 * n - 1, ndev * ndev), ndev)
    fwd = build_distributed_fft_1d(m, mesh, axis_name, "forward", "none",
                                   batch_axis_name)
    n1, n2 = fwd.split
    inv = build_distributed_fft_1d(m, mesh, axis_name, "inverse", "none",
                                   batch_axis_name, split=(n2, n1))
    ca_, cb_ = const_pair(dft.bluestein_chirp(n, direction))
    ca, cb = jnp.asarray(ca_)[None], jnp.asarray(cb_)[None]
    h = dft.bluestein_kernel_fft(n, m, direction)     # (m,), 1/m folded
    # the fwd output grid (b, k2, k1, 2) has flat k = k1 + n1*k2, so the
    # kernel spectrum reorders into the grid as a host-side reshape
    ha_, hb_ = const_pair(h.reshape(n2, n1))
    ha, hb = jnp.asarray(ha_)[None], jnp.asarray(hb_)[None]
    scale = normalize_scale(normalize, direction, n)

    def fn(x):
        b = x.shape[0]
        a = _cmul_pair(x, ca, cb)
        a = jnp.pad(a, ((0, 0), (0, m - n), (0, 0)))
        s = fwd(a)                                    # (b, k2, k1, 2)
        s = _cmul_pair(s, ha, hb)
        y = inv(s).reshape(b, m, 2)[:, :n, :]
        y = _cmul_pair(y, ca, cb)
        return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fwd.split
    fn.bluestein_m = m
    return fn


def build_distributed_bluestein_axis0(shape, mesh: Mesh,
                                      axis_name: str = "sp",
                                      direction: str = "forward",
                                      normalize: str = "none",
                                      batch_axis_name: Optional[str] = None):
    """Distributed axis-0 FFT of ARBITRARY length n0 with riding trailing
    axes — the chirp-Z embedding of build_distributed_bluestein_1d carried
    through an ND array (chirp/kernel constants broadcast over the riding
    dims; the M-FFT pair runs as axis-0 four-steps with swapped splits, so
    spectra flow grid-to-grid with no resharding).

    x: (batch, n0, *shape[1:], 2) -> (batch, n0, *shape[1:], 2), standard
    axis-0 bin order; riding axes are NOT transformed.
    """
    from ..utils.mathref import normalize_scale
    n0, rest = shape[0], tuple(shape[1:])
    ndev = mesh.shape[axis_name]
    m = smooth_distributed_len_at_least(max(2 * n0 - 1, ndev * ndev), ndev)
    fwd = build_distributed_fft_axis0((m, *rest), mesh, axis_name,
                                      "forward", "none", batch_axis_name)
    n1, n2 = fwd.split
    inv = build_distributed_fft_axis0((m, *rest), mesh, axis_name,
                                      "inverse", "none", batch_axis_name,
                                      split=(n2, n1))
    line = (1, n0) + (1,) * len(rest) + (2,)
    ca_, cb_ = const_pair(dft.bluestein_chirp(n0, direction))
    ca, cb = jnp.asarray(ca_).reshape(line), jnp.asarray(cb_).reshape(line)
    h = dft.bluestein_kernel_fft(n0, m, direction)     # (m,), 1/m folded
    grid = (1, n2, n1) + (1,) * len(rest) + (2,)
    ha_, hb_ = const_pair(h.reshape(n2, n1))
    ha, hb = jnp.asarray(ha_).reshape(grid), jnp.asarray(hb_).reshape(grid)
    scale = normalize_scale(normalize, direction, n0)

    def fn(x):
        b = x.shape[0]
        a = _cmul_pair(x.reshape(b, n0, *rest, 2), ca, cb)
        a = jnp.pad(a, ((0, 0), (0, m - n0)) + ((0, 0),) * (len(rest) + 1))
        s = fwd(a)                            # (b, k2, k1, *rest, 2)
        s = _cmul_pair(s, ha, hb)
        y = inv(s).reshape(b, m, *rest, 2)[:, :n0, ...]
        y = _cmul_pair(y, ca, cb)
        return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fwd.split
    fn.bluestein_m = m
    return fn


def build_distributed_fft_any_axis0(shape, mesh: Mesh,
                                    axis_name: str = "sp",
                                    direction: str = "forward",
                                    normalize: str = "none",
                                    batch_axis_name: Optional[str] = None):
    """Distributed axis-0 FFT for ANY n0 with riding axes: four-step digit
    plan when n0 admits a divisible smooth split, Bluestein embedding
    otherwise.  fn(x: (batch, n0, *rest, 2)) -> flat (batch, n0, *rest, 2)."""
    n0, rest = shape[0], tuple(shape[1:])
    if choose_distributed_split(n0, mesh.shape[axis_name]) is not None:
        inner = build_distributed_fft_axis0(shape, mesh, axis_name,
                                            direction, normalize,
                                            batch_axis_name)

        def fn(x):
            return inner(x).reshape(x.shape[0], n0, *rest, 2)

        fn.split = inner.split
        return fn
    return build_distributed_bluestein_axis0(shape, mesh, axis_name,
                                             direction, normalize,
                                             batch_axis_name)


def build_distributed_fft_any_1d(n: int, mesh: Mesh, axis_name: str = "sp",
                                 direction: str = "forward",
                                 normalize: str = "none",
                                 batch_axis_name: Optional[str] = None):
    """Distributed 1D FFT for any length: the four-step digit plan when n
    admits a divisible smooth split, the Bluestein embedding otherwise.
    Returns fn(x: (batch, n, 2)) -> flat (batch, n, 2)."""
    if choose_distributed_split(n, mesh.shape[axis_name]) is not None:
        inner = build_distributed_fft_1d(n, mesh, axis_name, direction,
                                         normalize, batch_axis_name)

        def fn(x):
            return inner(x).reshape(x.shape[0], n, 2)

        fn.split = inner.split
        return fn
    return build_distributed_bluestein_1d(n, mesh, axis_name, direction,
                                          normalize, batch_axis_name)


def build_distributed_trig_1d(n: int, kind: str, mesh: Mesh,
                              axis_name: str = "sp",
                              direction: str = "forward",
                              normalize: str = "none",
                              batch_axis_name: Optional[str] = None):
    """Distributed 1D DCT/DST, all eight types: the per-type embedding
    (even/odd reorder + phase twist for types 2/3; symmetric / odd
    extension for types 1; half-sample pre/post twiddles at work length
    2N for types 4 — reference work lengths dct_fft.js:10-14) runs as
    pointwise/gather/concat stages around the distributed c2c — the
    multi-chip composition of plans/transforms._apply_dct_fft_axis.
    x: (batch, n) f32 real -> (batch, n) real.
    """
    from ..plans.transforms import _dct_reorder_perms
    from ..utils.mathref import normalize_scale

    if kind in ("dct1", "dst1", "dct4", "dst4"):
        return _build_distributed_trig14_1d(
            n, kind, mesh, axis_name, direction, normalize, batch_axis_name)
    alias = {"dct2": "dct3", "dct3": "dct2", "dst2": "dst3", "dst3": "dst2"}
    if kind not in alias:
        raise ValueError(
            f"distributed trig supports dct1..4/dst1..4, got {kind!r}")
    eff = kind if direction == "forward" else alias[kind]
    perm, inv = _dct_reorder_perms(n)
    w = np.exp(-1j * np.pi * np.arange(n) / (2 * n))
    scale = normalize_scale(normalize, direction, n)
    dst = eff.startswith("dst")
    sgn = jnp.asarray(
        np.where(np.arange(n) % 2 == 0, 1.0, -1.0).astype(np.float32))

    if eff in ("dct2", "dst2"):
        fftc = build_distributed_fft_any_1d(n, mesh, axis_name, "forward",
                                            "none", batch_axis_name)
        wa_, wb_ = const_pair(w)
        wa, wb = jnp.asarray(wa_)[None], jnp.asarray(wb_)[None]
        permj = jnp.asarray(perm)

        def fn(x):
            b = x.shape[0]
            if dst:                      # dst2 = flip(dct2(altsign(x)))
                x = x * sgn
            v = jnp.take(x, permj, axis=1)
            vi = jnp.stack([v, jnp.zeros_like(v)], axis=-1)
            V = fftc(vi).reshape(b, n, 2)
            y = _cmul_pair(V, wa, wb)[..., 0]
            if dst:
                y = jnp.flip(y, axis=1)
            return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)
    else:
        fftc = build_distributed_fft_any_1d(n, mesh, axis_name, "inverse",
                                            "none", batch_axis_name)
        ua_, ub_ = const_pair(0.5 * np.conj(w))
        ua, ub = jnp.asarray(ua_)[None], jnp.asarray(ub_)[None]
        xm_idx = jnp.asarray(
            np.concatenate([[0], np.arange(n - 1, 0, -1)]).astype(np.int32))
        xm0 = jnp.asarray(
            np.concatenate([[0.0], np.ones(n - 1)]).astype(np.float32))
        invj = jnp.asarray(inv)

        def fn(x):
            b = x.shape[0]
            if dst:                      # dst3 = altsign(dct3(flip(x)))
                x = jnp.flip(x, axis=1)
            xm = jnp.take(x, xm_idx, axis=1) * xm0
            u = jnp.stack([x, -xm], axis=-1)     # X[k] - i*X[n-k]
            u = _cmul_pair(u, ua, ub)
            v = fftc(u).reshape(b, n, 2)[..., 0]  # Re(IFFT_unnorm(U))
            y = jnp.take(v, invj, axis=1)
            if dst:
                y = y * sgn
            return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fftc.split
    return fn


def _trig14_embed(n: int, kind: str):
    """(work_len, pre-twiddle consts or None, post consts or None) for the
    self-inverse trig embeddings (plans/transforms._apply_dct_fft_axis
    conventions; reference work lengths dct_fft.js:10-14)."""
    if kind == "dct1":
        return 2 * n - 2, None, None
    if kind == "dst1":
        return 2 * n + 2, None, None
    nn = np.arange(n, dtype=np.float64)
    pre = (np.cos(np.pi * nn / (2 * n)).astype(np.float32),
           (-np.sin(np.pi * nn / (2 * n))).astype(np.float32))
    post = np.exp(-1j * np.pi * (2 * nn + 1) / (4 * n))
    return 2 * n, pre, (post.real.astype(np.float32),
                        post.imag.astype(np.float32))


def _trig14_build(x, kind: str, n: int, pre, axis: int):
    """Real x -> interleaved work array of the embedding length along
    ``axis`` (the complex stack rides last)."""
    def rsl(a, b):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(a, b)
        return x[tuple(idx)]

    if kind == "dct1":
        v = jnp.concatenate([x, jnp.flip(rsl(1, n - 1), axis=axis)],
                            axis=axis)
        return jnp.stack([v, jnp.zeros_like(v)], axis=-1)
    if kind == "dst1":
        z1 = jnp.zeros_like(rsl(0, 1))
        v = jnp.concatenate([z1, x, z1, -jnp.flip(x, axis=axis)], axis=axis)
        return jnp.stack([v, jnp.zeros_like(v)], axis=-1)
    bshape = [1] * x.ndim
    bshape[axis] = n
    p_re = jnp.asarray(pre[0]).reshape(bshape)
    p_im = jnp.asarray(pre[1]).reshape(bshape)
    u = jnp.stack([x * p_re, x * p_im], axis=-1)
    return jnp.concatenate([u, jnp.zeros_like(u)], axis=axis)


def _trig14_post(V, kind: str, n: int, post, axis: int):
    """Interleaved work spectrum -> real output of length n along ``axis``."""
    def csl(a, b):
        idx = [slice(None)] * V.ndim
        idx[axis] = slice(a, b)
        return V[tuple(idx)]

    if kind == "dct1":
        return csl(0, n)[..., 0]
    if kind == "dst1":
        return csl(1, n + 1)[..., 1] * (-0.5)
    U = csl(0, n)
    bshape = [1] * (V.ndim - 1)
    bshape[axis] = n
    t_re = jnp.asarray(post[0]).reshape(bshape)
    t_im = jnp.asarray(post[1]).reshape(bshape)
    ur, ui = U[..., 0], U[..., 1]
    if kind == "dct4":
        return ur * t_re - ui * t_im
    return -(ui * t_re + ur * t_im)


def _build_distributed_trig14_1d(n: int, kind: str, mesh: Mesh,
                                 axis_name: str, direction: str,
                                 normalize: str,
                                 batch_axis_name: Optional[str]):
    """Distributed 1D DCT/DST types 1/4 (self-inverse; direction only sets
    the normalize factor): embedding stages around one distributed
    forward FFT at the work length (VERDICT r3 missing #3)."""
    from ..utils.mathref import normalize_scale

    m, pre, post = _trig14_embed(n, kind)
    fftc = build_distributed_fft_any_1d(m, mesh, axis_name, "forward",
                                        "none", batch_axis_name)
    scale = normalize_scale(normalize, direction, n)

    def fn(x):
        b = x.shape[0]
        vi = _trig14_build(x, kind, n, pre, axis=1)
        V = fftc(vi).reshape(b, m, 2)
        y = _trig14_post(V, kind, n, post, axis=1)
        return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fftc.split
    return fn


def _build_distributed_trig14_axis0(shape, kind: str, mesh: Mesh,
                                    axis_name: str, direction: str,
                                    normalize: str,
                                    batch_axis_name: Optional[str],
                                    tuning):
    """ND types 1/4 with logical axis 0 spanning chips: axis-0 embedding
    around a distributed forward FFT at shape (work_len, *rest); riding
    axes run the LOCAL per-axis trig machinery (same matmul-vs-FFT
    routing as plans/transforms.build_dct, incl. the type-1/4 FFT
    embeddings and giant-table guard)."""
    from ..plans.transforms import (_apply_dct_fft_axis,
                                    _dct_axis_fft_consts)
    from ..plans.transforms import DCT_MATMUL_MAX_ELEMS
    from ..spec import PlanError, TuningSpec
    from ..utils.mathref import normalize_scale, trig_matrix

    n0, rest = shape[0], tuple(shape[1:])
    assert rest, "rank >= 2 (use the 1d builder for rank 1)"
    tuning = tuning if tuning is not None else TuningSpec()
    m, pre, post = _trig14_embed(n0, kind)
    fft0 = build_distributed_fft_any_axis0((m,) + rest, mesh, axis_name,
                                           "forward", "none",
                                           batch_axis_name)
    scale = normalize_scale(normalize, direction, math.prod(shape))

    axis_mode, axis_objs, consts = [], [], {}
    for d, mm in enumerate(rest):
        if mm >= tuning.dct_fft_min_n:
            ap, cc = _dct_axis_fft_consts(mm, kind, f"ddct{d}", tuning)
            consts.update(cc)
            axis_objs.append(ap)
            axis_mode.append("fft")
        else:
            if mm * mm > DCT_MATMUL_MAX_ELEMS:
                raise PlanError(
                    f"{kind} riding axis {d} of length {mm} would build a "
                    f"dense {mm}x{mm} trig table; lower tuning.dctFftMinN")
            consts[f"dtrig{d}"] = trig_matrix(kind, mm, "forward").T \
                .astype(np.float32)
            axis_objs.append(None)
            axis_mode.append("matmul")
    consts = {k: jnp.asarray(v) for k, v in consts.items()}
    from ..core.axis import mxu_precision
    prec = mxu_precision(tuning)

    def local_rest(y):
        for d, mm in enumerate(rest):
            ax = 2 + d
            if axis_mode[d] == "fft":
                if ax < y.ndim - 1 and getattr(axis_objs[d], "supports_mid",
                                               False):
                    lead = y.shape[:ax]
                    v = y.reshape(*lead, mm, -1)
                    v = _apply_dct_fft_axis(v, consts, axis_objs[d],
                                            f"ddct{d}", kind, mm, mid=True)
                    y = v.reshape(y.shape)
                    continue
                y = jnp.moveaxis(y, ax, -1)
                y = _apply_dct_fft_axis(y, consts, axis_objs[d], f"ddct{d}",
                                        kind, mm)
                y = jnp.moveaxis(y, -1, ax)
            elif ax == y.ndim - 1:
                y = jnp.matmul(y, consts[f"dtrig{d}"], precision=prec)
            else:
                lead = y.shape[:ax]
                v = y.reshape(*lead, mm, -1)
                v = jnp.einsum("...aL,ak->...kL", v, consts[f"dtrig{d}"],
                               precision=prec)
                y = v.reshape(y.shape)
        return y

    def fn(x):
        b = x.shape[0]
        y = x.reshape(b, *shape)
        vi = _trig14_build(y, kind, n0, pre, axis=1)
        V = fft0(vi).reshape(b, m, *rest, 2)
        y = _trig14_post(V, kind, n0, post, axis=1)
        y = local_rest(y)
        return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)

    fn.split = fft0.split
    return fn


def build_distributed_fftconv_1d(n: int, mesh: Mesh, axis_name: str = "sp",
                                 mode: str = "convolution",
                                 batch_axis_name: Optional[str] = None):
    """Distributed circular FFT convolution/correlation over one giant line:
    distributed forward FFT -> pointwise multiply in the sharded (k2, k1)
    digit grid -> distributed inverse FFT, with exactly two all_to_all
    collectives per step (the sequence-parallel composition the single-chip
    fftconv plan cannot express; reference fftconv is one-device,
    src/runtime/plans/fftconv.js).

    Returns fn(x, kernel): x (batch, n, 2), kernel (n, 2), (1, n, 2), or
    (kcount, n, 2) time-domain interleaved -> (batch, n, 2), or kernel-major
    (kcount, batch, n, 2) when kcount > 1.  The data spectrum is computed
    ONCE and shared across kernels; all kernel forwards run as one batched
    plan.  The kernel rides the same distributed forward plan, so its
    spectrum lands in the same digit grid as the data with no reordering;
    the inverse plan is built with the swapped split so the grid feeds it
    directly.
    """
    if mode not in ("convolution", "correlation"):
        raise ValueError(f"mode must be convolution|correlation, got {mode}")
    ndev = mesh.shape[axis_name]
    # lengths with no mesh-divisible digit split run the SAME grid
    # pipeline at a smooth padded length >= 2n-1 and fold the linear
    # result back mod n afterwards — any length distributes with the
    # same 2-all_to_all cost as the native-length form (the chirp-Z
    # alternative costs 3x two M-FFTs; the fold is one add)
    work = (n if choose_distributed_split(n, ndev) is not None
            else smooth_distributed_len_at_least(max(2 * n - 1,
                                                     ndev * ndev), ndev))
    fwd = build_distributed_fft_1d(work, mesh, axis_name, "forward", "none",
                                   batch_axis_name)
    n1, n2 = fwd.split
    inv = build_distributed_fft_1d(work, mesh, axis_name, "inverse",
                                   "backward", batch_axis_name,
                                   split=(n2, n1))
    # the kernel's batch of kcount cannot shard over the batch axis: run
    # its forward replicated over dp (same split, so the grids align);
    # with no batch axis that plan IS fwd — share it
    kfwd = (fwd if batch_axis_name is None
            else build_distributed_fft_1d(work, mesh, axis_name, "forward",
                                          "none", split=(n1, n2)))

    def fn(x, kernel):
        kernel = jnp.asarray(kernel)
        if kernel.ndim == 2:
            kernel = kernel[None]
        kc = kernel.shape[0]
        b = x.shape[0]
        if work != n:
            x = jnp.pad(x, ((0, 0), (0, work - n), (0, 0)))
            kernel = jnp.pad(kernel, ((0, 0), (0, work - n), (0, 0)))
        kf = kfwd(kernel)                             # (kc, k2, k1, 2)
        if mode == "correlation":
            kf = kf * jnp.asarray([1.0, -1.0], dtype=kf.dtype)
        xf = fwd(x)[None]                             # (1, batch, k2, k1, 2)
        kf = kf[:, None]                              # (kc, 1, k2, k1, 2)
        yf = xf[..., :1] * kf[..., :1] - xf[..., 1:] * kf[..., 1:]
        yg = xf[..., :1] * kf[..., 1:] + xf[..., 1:] * kf[..., :1]
        y = jnp.concatenate([yf, yg], axis=-1)        # (kc, b, k2, k1, 2)
        z = inv(y.reshape(kc * b, *y.shape[2:]))      # flat (kc*b, work, 2)
        z = z.reshape(kc, b, work, 2)
        if work != n:
            z = _circular_fold(z, 2, n, work, mode)
        return z[0] if kc == 1 else z                 # kernel-major

    fn.split = (n1, n2)
    if work != n:
        fn.padded_work_len = work
    return fn


def _circular_fold(y, axis: int, n: int, m: int, mode: str):
    """Fold a length-m padded-circular convolution/correlation result
    back to circular length n (m >= 2n-1, so every aliased lag appears
    exactly once): convolution support [0, 2n-2] folds tail [n, 2n-1)
    onto [0, n-1); correlation's negative lags sit at the END of m and
    fold onto [1, n)."""
    import jax

    head = jax.lax.slice_in_dim(y, 0, n, axis=axis)
    pad = [(0, 0)] * y.ndim
    if mode == "convolution":
        tail = jax.lax.slice_in_dim(y, n, 2 * n - 1, axis=axis)
        pad[axis] = (0, 1)
    else:
        tail = jax.lax.slice_in_dim(y, m - n + 1, m, axis=axis)
        pad[axis] = (1, 0)
    return head + jnp.pad(tail, pad)


def halo_conv_geometry(n: int, k: int, ndev: int,
                       boundary: str) -> Optional[Tuple[int, int]]:
    """(C, n_ext) for the halo-exchange convolution, or None when the
    shape cannot take the route.  Shared by the route gate and the
    builder so the two can never drift.

    C is the per-device shard length; n_ext = ndev*C the padded signal.
    Linear modes round C up until the per-shard FFT length C + 2(k-1) is
    smooth (extra zero tail is free — outputs past n+k-2 are cropped);
    circular needs ndev | n exactly (no padding allowed).
    """
    pad_k = k - 1
    if k < 2:
        return None
    if boundary == "circular":
        if n % ndev:
            return None
        C = n // ndev
        return (C, n) if C >= pad_k else None
    C = -(-(n + pad_k) // ndev)
    if C < pad_k:
        return None
    for _ in range(4096):
        if factors.is_smooth(C + 2 * pad_k):
            return C, ndev * C
        C += 1
    return None


def build_distributed_fftconv_halo_1d(n: int, k: int, batch: int, mesh: Mesh,
                                      axis_name: str = "sp",
                                      boundary: str = "linear-full",
                                      batch_axis_name: Optional[str] = None,
                                      tuning=None, overlap_save: str = "auto",
                                      overlap_block: Optional[int] = None):
    """Halo-exchange distributed 1-D convolution — the rank-1 case of
    :func:`build_distributed_fftconv_halo_nd` (see there for the
    algorithm); kept as a named entry point.

    fn(x, kernel): x (batch, n, 2), kernel (k, 2) -> (batch, out_len, 2).
    """
    return build_distributed_fftconv_halo_nd(
        [n], [k], batch, mesh, axis_name, boundary, batch_axis_name,
        tuning=tuning, overlap_save=overlap_save,
        overlap_block=overlap_block)


def build_distributed_fftconv_halo_nd(shape, kshape, batch: int, mesh: Mesh,
                                      axis_name: str = "sp",
                                      boundary: str = "linear-full",
                                      batch_axis_name: Optional[str] = None,
                                      tuning=None, overlap_save: str = "auto",
                                      overlap_block: Optional[int] = None):
    """ND halo-exchange convolution: logical axis 0 shards contiguously
    with a (k0-1)-slab ppermute halo; the remaining axes convolve locally
    per shard.  Communication is one (k0-1)-thick slab per device instead
    of the spectrum route's whole-volume all_to_alls — the right
    algorithm for large volumes with small kernels (3-D stacks sharded
    along z, short Gaussian/PSF kernels).

    Every axis reduces to a LOCAL linear-valid convolution by pre-padding:
    axis 0 prepends the ppermute halo (zeroed on device 0 for linear
    modes, wrapped for circular); non-0 axes pad per the boundary (both
    sides for linear-full/same, left wrap for circular, none for valid),
    plus free right zero-pad to make each local FFT length smooth.  The
    boundary crop happens on the unsharded output.

    HLO note (asserted by tests/test_distributed_plans.py): the compiled
    program contains NO all-to-all; the partitioner emits the halo as a
    (k0-1)-slab collective-permute plus a few boundary-element permutes
    for the output-crop shard shift — total communication O(k0) per
    device either way.

    fn(x, kernel): x (batch, *shape, 2), kernel (*kshape, 2) ->
    (batch, *out_shape, 2).
    """
    from ..utils.mathref import fftconv_out_shape
    from ..spec import normalize_spec
    from ..plans.fftconv import build_fftconv

    shape = tuple(shape)
    kshape = tuple(kshape)
    rank = len(shape)
    ndev = mesh.shape[axis_name]
    n0, k0 = shape[0], kshape[0]
    pad0 = k0 - 1
    _, out_shape, out_off = fftconv_out_shape(list(shape), list(kshape),
                                              boundary)
    geom = halo_conv_geometry(n0, k0, ndev, boundary)
    if geom is None:
        raise ValueError(
            f"halo conv infeasible for n0={n0}, k0={k0}, ndev={ndev}, "
            f"{boundary}; use the spectrum route")
    C, n0_ext = geom
    b_loc = batch
    if batch_axis_name is not None:
        if batch % mesh.shape[batch_axis_name]:
            raise ValueError(f"batch {batch} must divide the "
                             f"{batch_axis_name} axis")
        b_loc = batch // mesh.shape[batch_axis_name]
    # non-0 axes: (left, right) pads turning the boundary into a local
    # linear-valid window, + extra right pad for a smooth local FFT len
    rest_pads = []
    rest_crop = []
    lshape = [C + pad0]
    for d in range(1, rank):
        m, kd = shape[d], kshape[d]
        pd = kd - 1
        if boundary in ("linear-full", "linear-same"):
            left, right_p = pd, pd
            crop0 = out_off[d] if boundary == "linear-same" else 0
        elif boundary == "linear-valid":
            left, right_p = 0, 0
            crop0 = 0
        else:                           # circular: left wrap, concatenated
            # from the axis's own tail at exec (zeros would be wrong) —
            # the pad list carries only the smoothing zeros
            left, right_p = 0, 0
            crop0 = 0
        ln = m + left + right_p + (pd if boundary == "circular" else 0)
        smooth = factors.next_smooth_at_least(ln + pd) - pd
        right_p += smooth - ln
        rest_pads.append((left, right_p))
        rest_crop.append((crop0, out_shape[d]))
        lshape.append(smooth)
    fopts = {}
    if rank == 1:
        # overlap-save knobs apply to the rank-1 local shard plan only
        # (the local route itself is 1-D)
        fopts = {"overlapSave": overlap_save}
        if overlap_block is not None:
            fopts["overlapBlock"] = overlap_block
    lspec = normalize_spec({
        "type": "fftconv", "shape": lshape, "batch": b_loc,
        "tuning": ({"maxSubLength": tuning.max_sub_length,
                    "matmulPrecision": tuning.matmul_precision}
                   if tuning is not None else {}),
        "fftConv": {"boundary": "linear-valid",
                    "kernelShape": list(kshape), "tuning": fopts}})
    lplan = build_fftconv(lspec)
    lconsts = lplan._consts
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def local_fn(x_loc, kernel):        # x_loc (b_loc, C, *rest, 2)
        halo = jax.lax.ppermute(
            jax.lax.slice_in_dim(x_loc, C - pad0, C, axis=1),
            axis_name, perm)
        if boundary != "circular":
            first = jax.lax.axis_index(axis_name) == 0
            halo = jnp.where(first, 0.0, halo)
        xin = jnp.concatenate([halo, x_loc], axis=1)
        if boundary == "circular":
            # non-0 axes wrap: prepend each axis's own (k_d - 1) tail
            for d in range(1, rank):
                pd = kshape[d] - 1
                if pd:
                    ax = 1 + d
                    m = xin.shape[ax]
                    tail = jax.lax.slice_in_dim(xin, m - pd, m, axis=ax)
                    xin = jnp.concatenate([tail, xin], axis=ax)
        pads = [(0, 0), (0, 0)] + list(rest_pads) + [(0, 0)]
        xin = jnp.pad(xin, pads)
        # local conv emits (b_loc, C, *(rest out), 2); keep only each
        # non-0 axis's boundary window (static slice)
        y = lplan._fn(lconsts, xin, lplan._coerce_kernel(kernel))
        for d in range(1, rank):
            c0, clen = rest_crop[d - 1]
            y = jax.lax.slice_in_dim(y, c0, c0 + clen, axis=1 + d)
        return y

    kn = math.prod(kshape)

    def fn(x, kernel):
        # accept every kernel convention the spectrum route takes:
        # (*kshape, 2), (1, *kshape, 2), packed flat (kn, 2) or (2*kn,)
        kernel = jnp.asarray(kernel, dtype=jnp.float32)
        if kernel.shape == (1,) + kshape + (2,):
            kernel = kernel[0]
        elif kernel.shape != kshape + (2,):
            if kernel.size != kn * 2:
                raise ValueError(
                    f"halo conv kernel shape {tuple(kernel.shape)} not "
                    f"understood; expected {kshape + (2,)} or a packed "
                    f"({kn}, 2) buffer")
            kernel = kernel.reshape(kshape + (2,))
        if n0_ext != n0:
            pads = [(0, 0), (0, n0_ext - n0)] + [(0, 0)] * rank
            x = jnp.pad(x, pads)
        nones = [None] * rank
        y = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(batch_axis_name, axis_name, *nones),
                      P(*([None] * (rank + 1)))),
            out_specs=P(batch_axis_name, axis_name, *nones),
        )(x, kernel)
        return jax.lax.slice_in_dim(y, out_off[0], out_off[0] + out_shape[0],
                                    axis=1)

    fn.split = (ndev, C)
    fn.halo = pad0
    return fn


def build_distributed_fftconv_nd(shape, mesh: Mesh, axis_name: str = "sp",
                                 mode: str = "convolution",
                                 batch_axis_name: Optional[str] = None):
    """Distributed circular ND FFT convolution: logical axis 0 spans chips
    (distributed four-step over ICI); the remaining axes transform locally
    on each shard (XLA propagates the k1 sharding — no extra collectives).

    Returns fn(x, kernel): x (batch, *shape, 2), kernel (*shape, 2),
    (1, *shape, 2), or (kcount, *shape, 2) time-domain interleaved ->
    (batch, *shape, 2), or kernel-major (kcount, batch, *shape, 2) when
    kcount > 1 (the data spectrum is computed once and shared).
    """
    if mode not in ("convolution", "correlation"):
        raise ValueError(f"mode must be convolution|correlation, got {mode}")
    shape = tuple(shape)
    rest = shape[1:]
    ndev = mesh.shape[axis_name]
    n0 = shape[0]
    # unsplittable axis-0 lengths run the same grid pipeline at a smooth
    # padded work length and fold back mod n0 (see the 1-D builder)
    work0 = (n0 if choose_distributed_split(n0, ndev) is not None
             else smooth_distributed_len_at_least(max(2 * n0 - 1,
                                                      ndev * ndev), ndev))
    wshape = (work0, *rest)
    fwd0 = build_distributed_fft_axis0(wshape, mesh, axis_name, "forward",
                                       batch_axis_name=batch_axis_name)
    n1, n2 = fwd0.split
    inv0 = build_distributed_fft_axis0(wshape, mesh, axis_name, "inverse",
                                       "backward",
                                       batch_axis_name=batch_axis_name,
                                       split=(n2, n1))
    kfwd0 = (fwd0 if batch_axis_name is None
             else build_distributed_fft_axis0(wshape, mesh, axis_name,
                                              "forward", split=(n1, n2)))
    lead = 3                                      # (kc|b, k2, k1, *rest, 2)
    # local plans for the non-distributed axes (forward + unnormalized
    # inverse; the 1/prod(rest) rides inv0's per-axis0 backward 1/n0... no:
    # normalize="backward" on inv0 scales by 1/n0 only, so fold 1/prod(rest)
    # into the last local inverse axis)
    from ..core.axis import build_axis_plan
    from ..spec import TuningSpec
    tun = TuningSpec()
    consts = {}
    fplans, iplans = [], []
    for d, m in enumerate(rest):
        fp = build_axis_plan(m, d + 1, "forward", tun, f"df{d}")
        ip = build_axis_plan(m, d + 1, "inverse", tun, f"di{d}")
        consts.update(fp.consts())
        consts.update(ip.consts())
        fplans.append(fp)
        iplans.append(ip)
    rest_scale = 1.0 / math.prod(rest) if rest else 1.0
    consts = {k: jnp.asarray(v) for k, v in consts.items()}

    from ..core.axis import slabbed_axis_apply

    def local_axes(y, plans, lead):
        # y: (lead..., *rest, 2); rest axis d sits at array axis lead + d.
        # slabbed form bounds einsum operands (conservative: global size,
        # though SPMD partitioning divides per-device operands by ndev)
        # descending order (r17c, see engine.apply_nd)
        for d in range(len(plans) - 1, -1, -1):
            ap = plans[d]
            if ap.n > 1:
                y = slabbed_axis_apply(y, ap, lead + d, consts)
        return y

    def fn(x, kernel):
        kernel = jnp.asarray(kernel)
        if kernel.ndim == len(shape) + 1:
            kernel = kernel[None]
        kc = kernel.shape[0]
        b = x.shape[0]
        if work0 != n0:
            grow = ((0, 0), (0, work0 - n0)) + ((0, 0),) * (len(rest) + 1)
            x = jnp.pad(x.reshape(b, *shape, 2), grow)
            kernel = jnp.pad(kernel, grow)
        # forward: distributed axis 0 in the (k2, k1) grid, then local
        # rest axes
        kf = local_axes(kfwd0(kernel), fplans, lead)
        if mode == "correlation":
            kf = kf * jnp.asarray([1.0, -1.0], dtype=kf.dtype)
        xf = local_axes(fwd0(x), fplans, lead)
        xf = xf[None]                                 # (1, b, ...)
        kf = kf[:, None]                              # (kc, 1, ...)
        yr = xf[..., :1] * kf[..., :1] - xf[..., 1:] * kf[..., 1:]
        yi = xf[..., :1] * kf[..., 1:] + xf[..., 1:] * kf[..., :1]
        y = jnp.concatenate([yr, yi], axis=-1)        # (kc, b, grid..., 2)
        y = y.reshape(kc * b, *y.shape[2:])
        # inverse: local rest axes (scale folded), then distributed axis 0.
        y = local_axes(y, iplans, lead)
        if rest_scale != 1.0:
            y = y * jnp.asarray(rest_scale, y.dtype)
        y = y.reshape(kc * b, n1 * n2, *rest, 2)      # grid -> flat k order
        z = inv0(y)                                   # (kc*b, work0, *rest, 2)
        z = z.reshape(kc, b, work0, *rest, 2)
        if work0 != n0:
            z = _circular_fold(z, 2, n0, work0, mode)
        return z[0] if kc == 1 else z                 # kernel-major

    fn.split = (n1, n2)
    if work0 != n0:
        fn.padded_work_len = work0
    return fn


def build_distributed_fftconv_pencil(shape, mesh: Mesh,
                                     axes: Tuple[str, str] = ("sp0", "sp1"),
                                     mode: str = "convolution",
                                     batch_axis_name: Optional[str] = None):
    """Distributed circular ND FFT convolution on a 2-D PENCIL
    decomposition: logical axes 0 and 1 each span their own mesh axis
    (build_distributed_pencil_axes01 forward/inverse around the pointwise
    spectrum multiply); remaining axes transform locally on each pencil.

    Versus the single-axis spectrum route, per-device memory stays at
    n0/P0 x n1/P1 x rest through the whole pipeline and every digit
    exchange rides its own mesh axis's ICI ring.  Both decomposed axes
    must admit a smooth mesh-divisible split (the plans layer pads linear
    boundaries to such lengths; unsplittable circular lengths fall back
    to the single-axis route).

    Returns fn(x, kernel) with the same contract as
    build_distributed_fftconv_nd: x (batch, *shape, 2), kernel
    (*shape, 2) | (1, *shape, 2) | (kcount, *shape, 2) -> (batch, *shape,
    2), kernel-major (kcount, batch, *shape, 2) when kcount > 1.
    """
    if mode not in ("convolution", "correlation"):
        raise ValueError(f"mode must be convolution|correlation, got {mode}")
    shape = tuple(shape)
    if len(shape) < 2:
        raise ValueError("pencil fftconv needs rank >= 2")
    rest = shape[2:]
    fwd = build_distributed_pencil_axes01(shape, mesh, axes, "forward",
                                          batch_axis_name)
    s0, s1 = fwd.split
    swapped = ((s0[1], s0[0]), (s1[1], s1[0]))
    inv = build_distributed_pencil_axes01(shape, mesh, axes, "inverse",
                                          batch_axis_name, splits=swapped)
    # kernel-side forward: never shard the kcount lead over the batch axis
    kfwd = (fwd if batch_axis_name is None
            else build_distributed_pencil_axes01(shape, mesh, axes,
                                                 "forward",
                                                 splits=(s0, s1)))
    lead = 3                                      # (kc|b, n0, n1, *rest, 2)
    from ..core.axis import build_axis_plan, slabbed_axis_apply
    from ..spec import TuningSpec
    tun = TuningSpec()
    consts = {}
    fplans, iplans = [], []
    for d, m in enumerate(rest):
        fp = build_axis_plan(m, d + 2, "forward", tun, f"pf{d}")
        ip = build_axis_plan(m, d + 2, "inverse", tun, f"pi{d}")
        consts.update(fp.consts())
        consts.update(ip.consts())
        fplans.append(fp)
        iplans.append(ip)
    consts = {k: jnp.asarray(v) for k, v in consts.items()}
    inv_scale = 1.0 / math.prod(shape)            # whole-volume backward 1/N

    def local_axes(y, plans):
        # y: (lead..., *rest, 2); descending order (r17c, engine.apply_nd)
        for d in range(len(plans) - 1, -1, -1):
            ap = plans[d]
            if ap.n > 1:
                y = slabbed_axis_apply(y, ap, lead + d, consts)
        return y

    def fn(x, kernel):
        kernel = jnp.asarray(kernel)
        if kernel.ndim == len(shape) + 1:
            kernel = kernel[None]
        kc = kernel.shape[0]
        b = x.shape[0]
        x = x.reshape(b, *shape, 2)
        kernel = kernel.reshape(kc, *shape, 2)
        # riding axes FIRST on the forward, pencil exchange after — the
        # same order as _build_pencil_c2c: a leading-axis einsum pass
        # poisons the layout every later last-axis-form pass sees
        # (CLAUDE.md r17c rule; ascending measured 2.5x at 256^3).  The
        # inverse below mirrors it (local first, then the exchange).
        kf = kfwd(local_axes(kernel, fplans))
        if mode == "correlation":
            kf = kf * jnp.asarray([1.0, -1.0], dtype=kf.dtype)
        kf = kf * jnp.asarray(inv_scale, kf.dtype)  # fold backward 1/N
        xf = fwd(local_axes(x, fplans))
        a = xf[None]                                # (1, b, ...)
        k_ = kf[:, None]                            # (kc, 1, ...)
        yr = a[..., :1] * k_[..., :1] - a[..., 1:] * k_[..., 1:]
        yi = a[..., :1] * k_[..., 1:] + a[..., 1:] * k_[..., :1]
        y = jnp.concatenate([yr, yi], axis=-1)      # (kc, b, *shape, 2)
        y = y.reshape(kc * b, *shape, 2)
        y = local_axes(y, iplans)
        z = inv(y).reshape(kc, b, *shape, 2)
        return z[0] if kc == 1 else z               # kernel-major

    fn.split = (s0, s1)
    return fn


# ---------------------------------------------------------------------------
# Mesh helpers
# ---------------------------------------------------------------------------

def make_mesh(axis_sizes: dict, devices=None, *, ici_optimized: bool = True,
              dcn: Optional[dict] = None) -> Mesh:
    """Build a Mesh from {axis_name: size} over the available devices.

    Production mesh construction for the distributed layer:

    - Single-host / single-slice: when the mesh uses every device and
      ``ici_optimized`` (default), device placement is delegated to
      ``jax.experimental.mesh_utils.create_device_mesh``, which orders
      devices so neighboring mesh coordinates are ICI neighbors (ring
      collectives — the all_to_all digit exchange, halo ppermutes — ride
      ICI links instead of hopping the fabric).  Otherwise devices fill
      the mesh in enumeration order (exact round-1 behavior; also the
      fallback when the topology has no better assignment).
    - Multi-host / multi-slice: pass ``dcn={axis_name: hosts}`` to split
      named axes across the slow DCN fabric via
      ``mesh_utils.create_hybrid_device_mesh``; each listed axis size
      must be divisible by its DCN factor, and only the listed axes
      cross hosts (keep the sequence-parallel axis OUT of ``dcn`` — its
      per-digit all_to_all is latency-bound and belongs on ICI; the
      batch axis tolerates DCN since dp never communicates inside a
      transform).  Requires a ``jax.distributed.initialize``d runtime.
    """
    devices = list(devices) if devices is not None else jax.devices()
    names = tuple(axis_sizes)
    sizes = tuple(int(axis_sizes[k]) for k in names)
    need = math.prod(sizes)
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    if dcn:
        unknown = set(dcn) - set(names)
        if unknown:
            raise ValueError(f"dcn axes not in the mesh: {sorted(unknown)}")
        dcn_shape = []
        ici_shape = []
        for k, s in zip(names, sizes):
            f = int(dcn.get(k, 1))
            if f < 1 or s % f:
                raise ValueError(
                    f"dcn factor {f} does not divide axis {k!r} size {s}")
            dcn_shape.append(f)
            ici_shape.append(s // f)
        if need != len(devices):
            raise ValueError(
                f"a dcn (multi-host) mesh must use every device: mesh needs "
                f"{need}, fabric has {len(devices)} — size the axes to the "
                f"full fabric or pass an explicit devices= subset")
        from jax.experimental import mesh_utils
        # TPU slices group by slice_index; hosts (incl. the CPU test
        # fabric) group by process instead
        by_process = not hasattr(devices[0], "slice_index")
        arr = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices,
            process_is_granule=by_process)
        return Mesh(arr, names)
    if ici_optimized and need == len(devices):
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh(sizes, devices=devices)
            return Mesh(arr, names)
        except Exception:
            pass                     # topology not understood: plain order
    arr = np.array(devices[:need]).reshape(sizes)
    return Mesh(arr, names)


# ---------------------------------------------------------------- STFT (sp)

def distributed_stft_geometry(n: int, nperseg: int, hop: int, ndev: int):
    """Frame geometry of the facade stft (boundary='zeros', padded=True)
    for a length-n signal: (nb, lpad, total).  Distribution needs
    ndev | nb; returns None when the frame count does not split."""
    W, H = int(nperseg), int(hop)
    lpad = W // 2
    L = n + 2 * lpad
    nb = max(-(-(L - W) // H) + 1, 1)
    if nb % ndev:
        return None
    total = (nb - 1) * H + W
    return nb, lpad, total


def _halo_check(S: int, halo: int, what: str, ndev: int):
    """The window-overlap halo must fit in ONE neighbor slab (the same
    precondition halo_conv_geometry enforces for the halo convolution) —
    otherwise the ppermute would need multi-hop fetches."""
    if halo > S:
        raise ValueError(
            f"{what}: the window overlap (nperseg - hop = {halo}) "
            f"exceeds the per-device slab ({S} samples over {ndev} "
            f"devices); use fewer devices, a longer signal, or a "
            f"smaller overlap")


def _halo_extend(x_loc, tail, halo: int, ndev: int, axis_name: str,
                 perm):
    """Append the right neighbor's first ``halo`` samples (the LAST
    device takes the replicated global tail)."""
    if halo <= 0:
        return x_loc
    h = jax.lax.ppermute(x_loc[:, :halo], axis_name, perm)
    last = jax.lax.axis_index(axis_name) == ndev - 1
    h = jnp.where(last, tail, h)
    return jnp.concatenate([x_loc, h], axis=-1)


def _welch_frame_setup(what: str, n: int, ndev: int, window, nperseg,
                       noverlap, nfft, scaling, fs):
    """Shared geometry/scaling of the sequence-parallel Welch-family
    estimators: (W, H, m, nb, nb_loc, S, halo, win, scale_vec)."""
    from ..fftapi import _stft_hop, _get_window
    W, H = _stft_hop(what, nperseg, noverlap)
    m = int(nfft) if nfft is not None else W
    if m < W:
        raise ValueError("nfft must be >= nperseg")
    if scaling not in ("density", "spectrum"):
        raise ValueError("scaling must be 'density' or 'spectrum'")
    if n < W:
        raise ValueError(f"signal shorter than nperseg ({n} < {W})")
    nb = (n - W) // H + 1
    if nb % ndev:
        raise ValueError(
            f"{what} needs the frame count ({nb}) to split over "
            f"{ndev} devices; adjust nperseg/noverlap or crop n")
    nb_loc = nb // ndev
    S = nb_loc * H
    halo = W - H
    _halo_check(S, halo, what, ndev)
    win = _get_window(window, W)
    dbl = np.full(m // 2 + 1, 2.0, np.float64)
    dbl[0] = 1.0
    if m % 2 == 0:
        dbl[-1] = 1.0
    if scaling == "density":
        sc = 1.0 / (fs * float(np.sum(win.astype(np.float64) ** 2)))
    else:
        sc = 1.0 / float(np.sum(win.astype(np.float64))) ** 2
    sv = jnp.asarray(dbl * sc / nb, jnp.float32)
    return W, H, m, nb, nb_loc, S, halo, win, sv


def build_distributed_stft(n: int, mesh: Mesh, axis_name: str = "sp",
                           fs: float = 1.0, window="hann",
                           nperseg: int = 256,
                           noverlap: Optional[int] = None,
                           nfft: Optional[int] = None,
                           batch_axis_name: Optional[str] = None):
    """Sequence-parallel STFT: the signal's TIME axis is sharded over
    ``axis_name`` and each device frames + transforms its own slab.

    Matches webgpufft_tpu.fft.stft(x, fs, window, nperseg, noverlap,
    nfft, boundary='zeros', padded=True) exactly.  Communication is ONE
    ppermute of the (nperseg - hop)-sample window-overlap halo per device
    — O(W) per device, independent of n (the same halo idiom as the
    distributed convolution; spectral routes would move O(n)).  The
    output spectrogram is sharded along the FRAME axis, so a downstream
    per-frame pipeline (masking, spectrogram statistics, ISTFT synthesis
    via :func:`build_distributed_istft`) stays on-device.

    Returns (f, t, fn) with fn(x): (batch, n) real -> (batch, nf, nb, 2)
    sharded P(None, None, axis_name, None).
    """
    from ..fftapi import _stft_hop, _get_window, _frame_segments, rfft

    ndev = mesh.shape[axis_name]
    W, H = _stft_hop("distributed stft", nperseg, noverlap)
    m = int(nfft) if nfft is not None else W
    if m < W:
        raise ValueError("nfft must be >= nperseg")
    geom = distributed_stft_geometry(n, W, H, ndev)
    if geom is None:
        raise ValueError(
            f"distributed stft needs the frame count to split over "
            f"{ndev} devices (n={n}, nperseg={W}, hop={H}); pad the "
            f"signal or change the hop")
    nb, lpad, total = geom
    nb_loc = nb // ndev
    S = nb_loc * H                       # per-device signal slab
    halo = W - H                         # window overlap into the right
    _halo_check(S, halo, "distributed stft", ndev)
    win = _get_window(window, W)
    scale = np.float32(1.0 / win.sum())
    winj = jnp.asarray(win)
    perm = [((i + 1) % ndev, i) for i in range(ndev)]

    def local_fn(x_loc, tail):
        # x_loc (batch, 1, S); tail (batch, halo) replicated — the
        # global padded signal's last (W - H) samples, which are the
        # "right neighbor" of the LAST device
        xin = _halo_extend(x_loc[:, 0], tail, halo, ndev, axis_name,
                           perm)
        fr = _frame_segments(xin, W, H, nb_loc) * winj
        if m > W:
            fr = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1) + [(0, m - W)])
        Z = rfft(fr, axis=-1) * scale           # (batch, nb_loc, f, 2)
        return jnp.swapaxes(Z, -3, -2)[:, None]  # (batch, 1, f, nb_loc, 2)

    smap = jax.shard_map(local_fn, mesh=mesh,
                         in_specs=(P(batch_axis_name, axis_name),
                                   P(batch_axis_name)),
                         out_specs=P(batch_axis_name, axis_name))

    def fn(x):
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if x.shape[-1] != n:
            raise ValueError(f"expected signal length {n}, got "
                             f"{x.shape[-1]}")
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                     + [(lpad, total - n - lpad)])
        body = xp[..., :ndev * S].reshape(*x.shape[:-1], ndev, S)
        tail = xp[..., ndev * S:]
        Z = smap(body, tail)                  # (batch, ndev, f, nb_loc, 2)
        b, _, nf, _, _ = Z.shape
        Z = jnp.transpose(Z, (0, 2, 1, 3, 4)).reshape(b, nf, nb, 2)
        return Z[0] if squeeze else Z

    f = np.fft.rfftfreq(m, 1.0 / fs)
    t = (np.arange(nb) * H + W // 2 - lpad) / fs
    return f, t, fn


def build_distributed_istft(n: int, mesh: Mesh, axis_name: str = "sp",
                            fs: float = 1.0, window="hann",
                            nperseg: int = 256,
                            noverlap: Optional[int] = None,
                            nfft: Optional[int] = None,
                            batch_axis_name: Optional[str] = None):
    """Inverse of :func:`build_distributed_stft`: per-frame synthesis
    (irfft + window) runs sharded along the frame axis; each device
    overlap-adds its own slab and the (W - H)-sample seam overhangs ride
    ONE ppermute to the right neighbor.  Matches the facade
    webgpufft_tpu.fft.istft's COLA win^2 normalization (host-precomputed
    profile).  fn(Z): (batch, nf, nb, 2) -> (batch, n).
    """
    from ..fftapi import _stft_hop, _get_window, irfft
    from ..shorttime import _overlap_add

    ndev = mesh.shape[axis_name]
    W, H = _stft_hop("distributed istft", nperseg, noverlap)
    m = int(nfft) if nfft is not None else None   # None: infer from Z
    if m is not None and m < W:
        raise ValueError("nfft must be >= nperseg")
    geom = distributed_stft_geometry(n, W, H, ndev)
    if geom is None:
        raise ValueError("frame count does not split over the mesh axis")
    nb, lpad, total = geom
    nb_loc = nb // ndev
    S = nb_loc * H
    halo = W - H
    _halo_check(S, halo, "distributed istft", ndev)
    win = _get_window(window, W).astype(np.float64)
    # global COLA win^2 profile (data-independent host precompute)
    norm = np.zeros(total)
    for p in range(nb):
        norm[p * H:p * H + W] += win * win
    if np.min(norm[lpad:lpad + n]) <= 1e-10:
        raise ValueError("window/hop fail NOLA; istft not invertible")
    inv_norm = np.zeros_like(norm)
    nz = norm > 1e-10
    inv_norm[nz] = 1.0 / norm[nz]
    winj = jnp.asarray(win, jnp.float32)
    scale = np.float32(win.sum())
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def local_fn(Z_loc):
        # Z_loc (batch, 1, f, nb_loc, 2) -> slab (batch, 1, S) plus the
        # seam overhang shipped right; the FFT length comes from the
        # spectrogram's bin count when nfft wasn't given (facade rule)
        m_eff = m if m is not None else 2 * (Z_loc.shape[-3] - 1)
        Zt = jnp.swapaxes(Z_loc[:, 0], -3, -2)      # (batch, nb_loc, f, 2)
        fr = irfft(Zt, n=m_eff, axis=-1) * scale
        fr = fr[..., :W] * winj
        y = _overlap_add(fr, W, H)                  # (batch, S + halo)
        if halo > 0:
            over = jax.lax.ppermute(y[..., S:], axis_name, perm)
            first = jax.lax.axis_index(axis_name) == 0
            over = jnp.where(first, 0.0, over)
            body = y[..., :S].at[..., :halo].add(over)
        else:
            body = y[..., :S]
        # the LAST device's overhang covers the global tail region
        return body[:, None], y[..., S:][:, None]

    smap = jax.shard_map(local_fn, mesh=mesh,
                         in_specs=(P(batch_axis_name, None, None,
                                     axis_name),),
                         out_specs=(P(batch_axis_name, axis_name),
                                    P(batch_axis_name, axis_name)))

    def fn(Z):
        Z = jnp.asarray(Z, jnp.float32)
        squeeze = Z.ndim == 3
        if squeeze:
            Z = Z[None]
        nf = Z.shape[-3]
        m_eff = m if m is not None else 2 * (nf - 1)
        if m_eff < W or nf != m_eff // 2 + 1:
            raise ValueError(
                f"spectrogram has {nf} frequency rows; expected "
                f"{(m if m is not None else 'nfft')}//2 + 1 (pass nfft= "
                f"matching the stft)")
        body, overs = smap(Z[:, None])
        # body (batch, ndev, S) -> flat; append the LAST device's
        # overhang as the global tail
        flat = body.reshape(Z.shape[0], ndev * S)
        tail = overs[:, -1]
        y = jnp.concatenate([flat, tail], axis=-1)   # (batch, total)
        y = y * jnp.asarray(inv_norm, jnp.float32)
        out = jax.lax.slice_in_dim(y, lpad, lpad + n, axis=1)
        return out[0] if squeeze else out

    return fn


def build_distributed_welch(n: int, mesh: Mesh, axis_name: str = "sp",
                            fs: float = 1.0, window="hann",
                            nperseg: int = 256,
                            noverlap: Optional[int] = None,
                            nfft: Optional[int] = None,
                            scaling: str = "density",
                            batch_axis_name: Optional[str] = None):
    """Sequence-parallel Welch PSD: the signal's time axis is sharded,
    each device computes the mean-detrended windowed periodograms of its
    own frames (the facade welch geometry — no boundary padding, partial
    tail dropped), and ONE psum of the (nf,)-sized per-device frame sums
    produces the global average.  Communication: the (nperseg - hop)
    halo ppermute + one psum of nf floats, independent of n.

    Matches webgpufft_tpu.fft.welch (scipy.signal.welch with
    detrend='constant') exactly.  Requires the frame count to divide the
    mesh axis.  Returns (f, fn); fn(x): (batch, n) -> (batch, nf).
    """
    from ..fftapi import _frame_segments, rfft

    ndev = mesh.shape[axis_name]
    W, H, m, nb, nb_loc, S, halo, win, sv = _welch_frame_setup(
        "distributed welch", n, ndev, window, nperseg, noverlap, nfft,
        scaling, fs)
    winj = jnp.asarray(win)
    perm = [((i + 1) % ndev, i) for i in range(ndev)]

    def spectra(x_loc, tail):
        xin = _halo_extend(x_loc, tail, halo, ndev, axis_name, perm)
        fr = _frame_segments(xin, W, H, nb_loc)
        fr = fr - jnp.mean(fr, axis=-1, keepdims=True)   # detrend
        fr = fr * winj
        if m > W:
            fr = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1) + [(0, m - W)])
        return rfft(fr, axis=-1)                         # (b, nb_loc, f, 2)

    def local_fn(x_loc, tail):
        Z = spectra(x_loc[:, 0], tail)
        p_loc = jnp.sum(Z[..., 0] ** 2 + Z[..., 1] ** 2, axis=-2) * sv
        return jax.lax.psum(p_loc, axis_name)[:, None]

    smap = jax.shard_map(local_fn, mesh=mesh,
                         in_specs=(P(batch_axis_name, axis_name),
                                   P(batch_axis_name)),
                         out_specs=P(batch_axis_name, axis_name))

    def fn(x):
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if x.shape[-1] != n:
            raise ValueError(f"expected signal length {n}, got "
                             f"{x.shape[-1]}")
        total = (nb - 1) * H + W
        body = x[..., :ndev * S].reshape(*x.shape[:-1], ndev, S)
        tail = x[..., ndev * S:total]
        Pxx = smap(body, tail)[:, 0]      # psum-replicated; take one
        return Pxx[0] if squeeze else Pxx

    return np.fft.rfftfreq(m, 1.0 / fs), fn


def build_distributed_csd(n: int, mesh: Mesh, axis_name: str = "sp",
                          fs: float = 1.0, window="hann",
                          nperseg: int = 256,
                          noverlap: Optional[int] = None,
                          nfft: Optional[int] = None,
                          scaling: str = "density",
                          batch_axis_name: Optional[str] = None):
    """Sequence-parallel cross spectral density (facade csd semantics:
    segment-averaged conj(X)*Y on the common framing) — the pair
    extension of :func:`build_distributed_welch` with the same O(W)
    halo + one psum of 2*nf floats.  Returns (f, fn);
    fn(x, y): (batch, n) x 2 -> (batch, nf, 2) interleaved."""
    from ..fftapi import _frame_segments, rfft

    ndev = mesh.shape[axis_name]
    W, H, m, nb, nb_loc, S, halo, win, sv = _welch_frame_setup(
        "distributed csd", n, ndev, window, nperseg, noverlap, nfft,
        scaling, fs)
    winj = jnp.asarray(win)
    perm = [((i + 1) % ndev, i) for i in range(ndev)]

    def spectra(x_loc, tail):
        xin = _halo_extend(x_loc, tail, halo, ndev, axis_name, perm)
        fr = _frame_segments(xin, W, H, nb_loc)
        fr = fr - jnp.mean(fr, axis=-1, keepdims=True)
        fr = fr * winj
        if m > W:
            fr = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1) + [(0, m - W)])
        return rfft(fr, axis=-1)                     # (b, nb_loc, f, 2)

    def local_fn(x_loc, y_loc, tx, ty):
        Zx = spectra(x_loc[:, 0], tx)
        Zy = spectra(y_loc[:, 0], ty)
        xr, xi = Zx[..., 0], Zx[..., 1]
        yr, yi = Zy[..., 0], Zy[..., 1]
        pr = jnp.sum(xr * yr + xi * yi, axis=-2) * sv   # Re(conj(X) Y)
        pi = jnp.sum(xr * yi - xi * yr, axis=-2) * sv
        out = jnp.stack([pr, pi], axis=-1)
        return jax.lax.psum(out, axis_name)[:, None]

    smap = jax.shard_map(local_fn, mesh=mesh,
                         in_specs=(P(batch_axis_name, axis_name),
                                   P(batch_axis_name, axis_name),
                                   P(batch_axis_name),
                                   P(batch_axis_name)),
                         out_specs=P(batch_axis_name, axis_name))

    total = (nb - 1) * H + W

    def fn(x, y):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x, y = x[None], y[None]
        if x.shape[-1] != n or y.shape[-1] != n:
            raise ValueError(f"expected signal length {n}")
        bx = x[..., :ndev * S].reshape(*x.shape[:-1], ndev, S)
        by = y[..., :ndev * S].reshape(*y.shape[:-1], ndev, S)
        Pxy = smap(bx, by, x[..., ndev * S:total], y[..., ndev * S:total])
        Pxy = Pxy[:, 0]
        return Pxy[0] if squeeze else Pxy

    return np.fft.rfftfreq(m, 1.0 / fs), fn
