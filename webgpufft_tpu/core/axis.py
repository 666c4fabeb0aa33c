"""Per-axis FFT algorithm plans: mixed-radix matmul, Rader, Bluestein.

TPU-native redesign of the reference's axis execution layer
(reference: src/plan.js Stockham stages; src/runtime/algorithms/
bluestein_axis.js, rader_axis.js).  Key inversion: instead of one radix
butterfly stage per kernel launch with global-memory ping-pong, each axis
transform is a short chain of *batched MXU matmul contractions* with
host-precomputed DFT/twiddle tables — XLA fuses the elementwise twiddles
into the matmul epilogues, and the arithmetic lands on the systolic array.

Data layout: interleaved complex float32 — shape (..., n, 2).  All complex
arithmetic is real math via core.cplx (the TPU backend has no complex dtype,
and the MXU wants real matmuls anyway).

Every plan exposes:
  - ``consts()``  -> {name: np.ndarray} constants (passed as runtime args so
                     they never bloat the HLO as literals)
  - ``apply(x, consts)`` -> transform along the last *complex* axis of x
                            (array axis -2; component dim stays last)
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from . import dft
from .cplx import to_w4, const_pair, cmul_const
from ..utils import factors

# f32 matmul accuracy on the MXU: DEFAULT lowers to bf16 passes (~3e-3 rel
# error on a 1024-pt FFT — fails the 1e-5 accuracy bar); HIGHEST uses the
# 6-pass f32 scheme.  The FFT stays memory-bound either way, so HIGHEST is
# the default for f32 plans; tuning.matmulPrecision lowers it ("auto"
# resolves to DEFAULT for bf16-storage plans — measured ladder in
# benches/r3_precision_transpose.py: highest 2e-7 / high 2e-5 / default
# 3e-3 rel err; default 35% faster on c2c-4096 b4096).
_PRECISION = jax.lax.Precision.HIGHEST

_PRECISION_BY_NAME = {
    "auto": jax.lax.Precision.HIGHEST,  # pre-resolution fallback
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def mxu_precision(tuning):
    """The MXU contraction precision a plan's tuning selects."""
    if tuning is None:
        return _PRECISION
    return _PRECISION_BY_NAME[tuning.matmul_precision]


def _einsum(pattern, a, b, prec=_PRECISION):
    return jnp.einsum(pattern, a, b, precision=prec)


class AxisPlan:
    kind: str = "?"

    def __init__(self, n: int, prefix: str):
        self.n = n
        self.prefix = prefix

    def consts(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def apply(self, x, consts):
        raise NotImplementedError

    def can_self_chunk(self, lead_elems: int, budget: int) -> bool:
        """True when apply() bounds its own einsum operand sizes within
        ``budget`` for ``lead_elems`` riding elements per line."""
        return False


class MixedAxisPlan(AxisPlan):
    """Smooth-length FFT as a chain of sub-DFT matmuls + twiddles.

    The axis length is grouped into sub-lengths (factors.split_sublengths);
    cost ~ 4*N*sum(subs) real MACs per line — intentionally traded against
    the MXU's abundant FLOPs to keep the pipeline memory-bound.
    """
    kind = "mixed"

    def __init__(self, n: int, direction: str, prefix: str, max_sub: int = 32,
                 out_scale: float = 1.0, prec=_PRECISION):
        super().__init__(n, prefix)
        self.direction = direction
        self.prec = prec
        subs = factors.split_sublengths(n, max_sub) if n > 1 else [1]
        if len(subs) > 2 and max_sub >= 32:
            # Prefer an exactly-two-level balanced split when its folded
            # stage-B tables stay small: two contractions, zero twiddle
            # passes.  Measured on-chip (benches/r2 maxsub A/B): n=4096 as
            # (64, 64) runs 1.38x faster than the 3-level [32, 32, 4].
            # dftB table floats = 4*n*n2; bound n*n2 <= 2^20 (~16 MB f32).
            # A maxSubLength ABOVE the default caps the split factors too;
            # below the default the preference is skipped entirely (the
            # user wants small tables); at the default (32) factors may
            # reach 128.
            cap = 128 if max_sub == 32 else max_sub
            two = factors.split_two_balanced(n, cap)
            if two is not None and n * min(two) <= (1 << 20):
                subs = [max(two), min(two)]
        self.subs = subs
        assert math.prod(self.subs) == n, (n, self.subs)
        # plan normalize scale folded into the last sub-DFT table: saves a
        # whole elementwise pass over the output
        self.out_scale = out_scale

    def consts(self) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        rem = self.n
        for lvl, n1 in enumerate(self.subs):
            last = lvl == len(self.subs) - 1
            if last and len(self.subs) >= 2:
                break  # final level lives inside the previous level's dftB
            w = dft.dft_matrix(n1, self.direction)
            if last and self.out_scale != 1.0:
                w = w * np.complex64(self.out_scale)
            out[f"{self.prefix}/dft{lvl}"] = to_w4(w)
            if not last:
                n2 = rem // n1
                if len(self.subs) - lvl == 2:
                    # final pair of levels: fold the inter-stage twiddle into
                    # per-k1 stage-B matrices (T[k1, n2] * W2)[n2, k2] so the
                    # whole 2-level FFT is exactly two contractions — the
                    # structural memory floor (no twiddle pass at all)
                    tw = dft.ct_twiddle(n1, n2, self.direction).astype(np.complex64)
                    w2 = dft.dft_matrix(n2, self.direction)
                    if self.out_scale != 1.0:
                        w2 = w2 * np.complex64(self.out_scale)
                    out[f"{self.prefix}/dftB{lvl}"] = np.stack(
                        [to_w4(tw[a][:, None] * w2) for a in range(n1)])
                else:
                    ta, tb = const_pair(dft.ct_twiddle(n1, n2, self.direction))
                    out[f"{self.prefix}/twa{lvl}"] = ta  # (n1, n2, 2)
                    out[f"{self.prefix}/twb{lvl}"] = tb
                rem = n2
        return out

    supports_mid = True
    prefer_mid = True            # measured 2.4x over the rows form (r3b)

    def apply_mid(self, x, consts):
        """Transform along axis -3 of (..., n, L, 2): the same W4-form
        contraction chain as ``apply`` with a riding lane dim L carried
        through every einsum untouched — no moveaxis transposes and no
        separate re/im dots.  Measured 2.4x faster than the retired
        rows-form P/Q einsums on the 2^20 four-step stage 1 and 1.2x on 2D
        axis-0 (benches/r3b_midaxis_forms.py)."""
        return self._rec_mid(x, consts, 0)

    def _rec_mid(self, x, consts, lvl: int):
        subs = self.subs[lvl:]
        n = math.prod(subs)
        lead = x.shape[:-3]
        L = x.shape[-2]
        if len(subs) == 1:
            return _einsum("...aLi,aicj->...cLj", x,
                           consts[f"{self.prefix}/dft{lvl}"], self.prec)
        n1 = subs[0]
        n2 = n // n1
        xm = x.reshape(*lead, n1, n2, L, 2)
        y = _einsum("...abLi,aicj->...cbLj", xm,
                    consts[f"{self.prefix}/dft{lvl}"], self.prec)
        if len(subs) == 2:
            z = _einsum("...abLi,abicj->...caLj", y,
                        consts[f"{self.prefix}/dftB{lvl}"], self.prec)
        else:
            twa = consts[f"{self.prefix}/twa{lvl}"][:, :, None, :]  # ride L
            twb = consts[f"{self.prefix}/twb{lvl}"][:, :, None, :]
            y = cmul_const(y, twa, twb)
            z = self._rec_mid(y, consts, lvl + 1)  # n2 digit sits at axis -3
            z = z.reshape(*lead, n1, n2, L, 2)
            z = jnp.swapaxes(z, -4, -3)            # out[k] at k = k1 + n1*k2
        return z.reshape(*lead, n, L, 2)

    def apply(self, x, consts):
        return self._rec(x, consts, 0)

    def _rec(self, x, consts, lvl: int):
        subs = self.subs[lvl:]
        n = math.prod(subs)
        if len(subs) == 1:
            # out[..., c, j] = sum_{a,i} x[..., a, i] W4[a, i, c, j]
            return _einsum("...ai,aicj->...cj", x,
                           consts[f"{self.prefix}/dft{lvl}"], self.prec)
        n1 = subs[0]
        n2 = n // n1
        lead = x.shape[:-2]
        xm = x.reshape(*lead, n1, n2, 2)
        # y[..., k1, m2, j] = sum_{a,i} xm[..., a, m2, i] W4[a, i, k1, j]
        y = _einsum("...abi,aicj->...cbj", xm,
                    consts[f"{self.prefix}/dft{lvl}"], self.prec)
        if len(subs) == 2:
            # final level: twiddle is folded into per-k1 stage-B matrices
            # (consts dftB) and the contraction emits the digit-reversed
            # order directly — two contractions total, zero twiddle pass
            z = _einsum("...abi,abicj->...caj", y,
                        consts[f"{self.prefix}/dftB{lvl}"], self.prec)
        else:
            # measured on-chip: the flip-form const-pair multiply beats the
            # flip-free t4 2x2 form (XLA materializes more copies for t4)
            y = cmul_const(y, consts[f"{self.prefix}/twa{lvl}"],
                           consts[f"{self.prefix}/twb{lvl}"])
            z = self._rec(y, consts, lvl + 1)      # length-n2 FFT along axis -2
            z = jnp.swapaxes(z, -3, -2)            # out[k] at k = k1 + n1*k2
        return z.reshape(*lead, n, 2)


class FourStepAxisPlan(AxisPlan):
    """Explicit HBM four-step FFT for one giant smooth axis.

    TPU counterpart of the reference's out-of-core four-step / axis-0
    two-step (reference: src/runtime/plans/c2c.js:3386-3549,
    src/plan.js:89-153 twiddle math): split n = n1*n2 balanced, keep the
    (n1, n2) digit grid resident in HBM, and run

      x[a1, a2] -> FFT_n1 over a1 (rows form: a2 rides in lanes)
                -> * W_N^(k1*a2)           (fused into the stage boundary)
                -> FFT_n2 over a2          (contiguous rows)
                -> transpose (k1, k2) -> (k2, k1)   (flat k = k1 + n1*k2)

    vs the generic MixedAxisPlan recursion this replaces deep (32-wide)
    sub-length chains with two nested balanced FFTs and exactly one
    materialized digit transpose.  When one line exceeds ``chunk_elems``
    (einsum operands past 2^22 complex elements miscompile on this stack —
    see plans/transforms.CHUNK_ELEMS), both stages stream contiguous digit
    slabs through jax.lax.map so no single einsum operand exceeds the
    validated size.
    """
    kind = "four-step"

    def __init__(self, n: int, direction: str, prefix: str, max_sub: int = 32,
                 out_scale: float = 1.0, chunk_elems: int = None,
                 prec=_PRECISION):
        super().__init__(n, prefix)
        self.direction = direction
        self.out_scale = out_scale
        self.chunk_elems = chunk_elems
        self.prec = prec
        split = factors.split_two_balanced(n, n)
        if split is None:
            raise ValueError(f"four-step axis needs a two-factor smooth split, n={n}")
        # n1 = the a1 (stride-n2) digit, n2 = the contiguous digit
        self.n1, self.n2 = split
        self.stage1 = MixedAxisPlan(self.n1, direction, f"{prefix}/s1", max_sub,
                                    prec=prec)
        self.stage2 = MixedAxisPlan(self.n2, direction, f"{prefix}/s2", max_sub,
                                    out_scale=out_scale, prec=prec)
        self.max_digit = max(self.n1, self.n2)

    def can_self_chunk(self, lead_elems: int, budget: int) -> bool:
        # minimum per-slab operand at full internal slabbing is
        # lead * digit (stage 1: lead*n1 at s1=n2; stage 2: lead*n2 at s2=n1)
        return lead_elems * self.max_digit <= (budget or OPERAND_CHUNK_ELEMS)

    def consts(self) -> Dict[str, np.ndarray]:
        sign = -1.0 if self.direction == "forward" else 1.0
        tw = np.exp(sign * 2j * np.pi *
                    (np.outer(np.arange(self.n1), np.arange(self.n2)) % self.n)
                    / self.n)                                  # W_N^(k1*a2)
        ta, tb = const_pair(tw)                                # (n1, n2, 2)
        out = {f"{self.prefix}/twa": ta, f"{self.prefix}/twb": tb}
        out.update(self.stage1.consts())
        out.update(self.stage2.consts())
        return out

    def _slabs(self, lead_elems: int) -> tuple:
        """(S1, S2): slab counts over the a2 / k1 digits keeping per-slab
        einsum operands within chunk_elems.  1 = no chunking."""
        budget = self.chunk_elems or OPERAND_CHUNK_ELEMS

        def pick(digit: int) -> int:
            per_slab_base = lead_elems * (self.n // digit)
            for s in range(1, digit + 1):
                if digit % s == 0 and per_slab_base * (digit // s) <= budget:
                    return s
            # even single-digit slabs exceed the budget: lead_elems alone is
            # too large.  Never fall through silently — operands past the
            # validated size risk the known silent miscompile.
            raise ValueError(
                f"four-step n={self.n}: cannot bound einsum operands within "
                f"{budget} complex elements (lead elements {lead_elems} x "
                f"full digit {self.n // digit} already exceed it); chunk the "
                "batch/leading dims before this axis")

        if lead_elems * self.n <= budget:
            return 1, 1
        return pick(self.n2), pick(self.n1)

    def apply(self, x, consts):
        p = self.prefix
        n1, n2 = self.n1, self.n2
        lead = x.shape[:-2]
        lead_elems = math.prod(lead) if lead else 1
        y = x.reshape(*lead, n1, n2, 2)                # digit grid, a = a1*n2 + a2
        s1, s2 = self._slabs(lead_elems)
        twa, twb = consts[f"{p}/twa"], consts[f"{p}/twb"]

        def stage1(slab, ta, tb):
            out = apply_along_axis(slab, self.stage1, slab.ndim - 3, consts)
            return cmul_const(out, ta, tb)

        if s1 == 1:
            y = stage1(y, twa, twb)
        else:
            step = n2 // s1
            ax = y.ndim - 2                            # the a2 digit axis

            def one1(i):
                sl = jax.lax.dynamic_slice_in_dim(y, i * step, step, axis=ax)
                ta = jax.lax.dynamic_slice_in_dim(twa, i * step, step, axis=1)
                tb = jax.lax.dynamic_slice_in_dim(twb, i * step, step, axis=1)
                return stage1(sl, ta, tb)

            y = mapped_slabs(one1, s1, ax)
            y = y.reshape(*lead, n1, n2, 2)

        if s2 == 1:
            y = self.stage2.apply(y, consts)
        else:
            step = n1 // s2
            ax = y.ndim - 3                            # the k1 digit axis

            def one2(i):
                sl = jax.lax.dynamic_slice_in_dim(y, i * step, step, axis=ax)
                return self.stage2.apply(sl, consts)

            y = mapped_slabs(one2, s2, ax)
            y = y.reshape(*lead, n1, n2, 2)

        y = jnp.swapaxes(y, -3, -2)                    # (k2, k1): flat k = k1 + n1*k2
        return y.reshape(*lead, self.n, 2)

    supports_mid = True
    # Alternating on-chip trials (benches/r4_fourstep_mid2.py) measured
    # this form 0.89-0.97x vs the moveaxis fallback — XLA fuses the
    # transposes into the stage einsums for free, while the lane-carrying
    # digit contractions tile slightly worse.  apply_mid stays available
    # (it composes with digit-slab streaming) but routing prefers moveaxis.
    prefer_mid = False

    def apply_mid(self, x, consts):
        """Transform along axis -3 of (..., n, L, 2): the four-step digit
        pipeline with the riding lane dim L carried through both stages
        (each stage FFT runs in its own W4 mid-axis form via
        apply_along_axis) — giant non-last axes stop paying moveaxis
        transpose passes.  Slabbing streams the same digit slabs as
        ``apply`` with L folded into the lead-element budget."""
        p = self.prefix
        n1, n2 = self.n1, self.n2
        lead = x.shape[:-3]
        L = x.shape[-2]
        lead_elems = (math.prod(lead) if lead else 1) * L
        y = x.reshape(*lead, n1, n2, L, 2)
        s1, s2 = self._slabs(lead_elems)
        twa = consts[f"{p}/twa"][:, :, None, :]        # (n1, n2, 1, 2) rides L
        twb = consts[f"{p}/twb"][:, :, None, :]

        def stage1(slab, ta, tb):
            out = apply_along_axis(slab, self.stage1, slab.ndim - 4, consts)
            return cmul_const(out, ta, tb)

        if s1 == 1:
            y = stage1(y, twa, twb)
        else:
            step = n2 // s1
            ax = y.ndim - 3                            # the a2 digit axis

            def one1(i):
                sl = jax.lax.dynamic_slice_in_dim(y, i * step, step, axis=ax)
                ta = jax.lax.dynamic_slice_in_dim(twa, i * step, step, axis=1)
                tb = jax.lax.dynamic_slice_in_dim(twb, i * step, step, axis=1)
                return stage1(sl, ta, tb)

            y = mapped_slabs(one1, s1, ax)
            y = y.reshape(*lead, n1, n2, L, 2)

        if s2 == 1:
            y = apply_along_axis(y, self.stage2, y.ndim - 3, consts)
        else:
            step = n1 // s2
            ax = y.ndim - 4                            # the k1 digit axis

            def one2(i):
                sl = jax.lax.dynamic_slice_in_dim(y, i * step, step, axis=ax)
                return apply_along_axis(sl, self.stage2, sl.ndim - 3, consts)

            y = mapped_slabs(one2, s2, ax)
            y = y.reshape(*lead, n1, n2, L, 2)

        y = jnp.swapaxes(y, -4, -3)                    # (k2, k1) digit order
        return y.reshape(*lead, self.n, L, 2)


class BluesteinAxisPlan(AxisPlan):
    """Arbitrary-length FFT via chirp-Z embedding into a smooth length M.

    M = next smooth >= 2N-1 (reference policy: bluestein_axis.js:72-74).
    The 1/M of the inverse M-FFT is folded into the precomputed kernel
    spectrum, so the pipeline is: chirp mul -> M-FFT -> pointwise -> inverse
    M-FFT -> chirp mul, with zero extra normalization passes.
    """
    kind = "bluestein"

    def __init__(self, n: int, direction: str, prefix: str, max_sub: int = 32,
                 tuning=None):
        super().__init__(n, prefix)
        self.direction = direction
        self.m = factors.next_smooth_at_least(max(2 * n - 1, 1))
        self.fwd = make_smooth_plan(self.m, "forward", f"{prefix}/mf", max_sub,
                                    tuning=tuning)
        self.inv = make_smooth_plan(self.m, "inverse", f"{prefix}/mi", max_sub,
                                    tuning=tuning)
        # giant-M Bluestein self-chunks when the inner four-step plans can
        # bound their own einsum operand sizes; chirp muls are elementwise
        self.max_digit = getattr(self.fwd, "max_digit", None)

    def can_self_chunk(self, lead_elems: int, budget: int) -> bool:
        if not isinstance(self.fwd, FourStepAxisPlan):
            return False
        return self.fwd.can_self_chunk(lead_elems, budget)

    def consts(self) -> Dict[str, np.ndarray]:
        ca, cb = const_pair(dft.bluestein_chirp(self.n, self.direction))
        ha, hb = const_pair(dft.bluestein_kernel_fft(self.n, self.m, self.direction))
        out = {
            f"{self.prefix}/chirpa": ca, f"{self.prefix}/chirpb": cb,
            f"{self.prefix}/hffta": ha, f"{self.prefix}/hfftb": hb,
        }
        out.update(self.fwd.consts())
        out.update(self.inv.consts())
        return out

    @property
    def supports_mid(self) -> bool:
        return (getattr(self.fwd, "supports_mid", False)
                and getattr(self.inv, "supports_mid", False))

    @property
    def prefer_mid(self) -> bool:
        # the mid form forces the inner M-FFTs' apply_mid, so only prefer
        # it when the inner plans themselves prefer mid (four-step inners
        # measured slower in the lane-carrying form, r4_fourstep_mid2)
        return (getattr(self.fwd, "prefer_mid", False)
                and getattr(self.inv, "prefer_mid", False))

    def apply(self, x, consts):
        n, m = self.n, self.m
        p = self.prefix
        a = cmul_const(x, consts[f"{p}/chirpa"], consts[f"{p}/chirpb"])
        pad = [(0, 0)] * (a.ndim - 2) + [(0, m - n), (0, 0)]
        a = jnp.pad(a, pad)
        s = self.fwd.apply(a, consts)
        s = cmul_const(s, consts[f"{p}/hffta"], consts[f"{p}/hfftb"])
        y = self.inv.apply(s, consts)
        return cmul_const(y[..., :n, :], consts[f"{p}/chirpa"], consts[f"{p}/chirpb"])

    def apply_mid(self, x, consts):
        """Transform along axis -3 of (..., n, L, 2) — the chirp/pointwise
        constants broadcast over the riding lane dim and the M-FFTs run in
        the W4 mid-axis form (requires smooth-plan stages; see
        apply_along_axis for the fallback)."""
        n, m = self.n, self.m
        p = self.prefix

        def bc(name):
            return consts[name][:, None, :]              # (len, 1, 2) rides L

        a = cmul_const(x, bc(f"{p}/chirpa"), bc(f"{p}/chirpb"))
        pad = [(0, 0)] * (a.ndim - 3) + [(0, m - n), (0, 0), (0, 0)]
        a = jnp.pad(a, pad)
        s = self.fwd.apply_mid(a, consts)
        s = cmul_const(s, bc(f"{p}/hffta"), bc(f"{p}/hfftb"))
        y = self.inv.apply_mid(s, consts)
        return cmul_const(y[..., :n, :, :], bc(f"{p}/chirpa"),
                          bc(f"{p}/chirpb"))


class RaderAxisPlan(AxisPlan):
    """Prime-length DFT as a length-(p-1) cyclic convolution
    (reference mechanism: src/runtime/algorithms/rader_axis.js).

    The convolution runs at smooth length m (= p-1 when smooth, else a
    wrapped-kernel embedding at the next smooth >= 2(p-1)-1), again with 1/m
    folded into the precomputed kernel spectrum.
    """
    kind = "rader"

    def __init__(self, n: int, direction: str, prefix: str, max_sub: int = 32,
                 tuning=None):
        if not factors.is_prime(n):
            raise ValueError(f"Rader axis requires prime length, got {n}")
        super().__init__(n, prefix)
        self.direction = direction
        perm_in, perm_out, bfft, m = dft.rader_tables(n, direction)
        self.m = m
        self._perm_in = perm_in.astype(np.int32)
        # inverse of perm_out: inv[k-1] = j with perm_out[j] == k
        inv = np.zeros(n - 1, dtype=np.int32)
        for j, k in enumerate(perm_out):
            inv[int(k) - 1] = j
        self._scatter_idx = inv
        self._bfft = bfft
        self.fwd = make_smooth_plan(m, "forward", f"{prefix}/mf", max_sub,
                                    tuning=tuning)
        self.inv = make_smooth_plan(m, "inverse", f"{prefix}/mi", max_sub,
                                    tuning=tuning)

    def consts(self) -> Dict[str, np.ndarray]:
        ba, bb = const_pair(self._bfft)
        out = {
            f"{self.prefix}/perm_in": self._perm_in,
            f"{self.prefix}/scatter": self._scatter_idx,
            f"{self.prefix}/bffta": ba, f"{self.prefix}/bfftb": bb,
        }
        out.update(self.fwd.consts())
        out.update(self.inv.consts())
        return out

    @property
    def supports_mid(self) -> bool:
        return (getattr(self.fwd, "supports_mid", False)
                and getattr(self.inv, "supports_mid", False))

    @property
    def prefer_mid(self) -> bool:
        # the mid form forces the inner M-FFTs' apply_mid, so only prefer
        # it when the inner plans themselves prefer mid (four-step inners
        # measured slower in the lane-carrying form, r4_fourstep_mid2)
        return (getattr(self.fwd, "prefer_mid", False)
                and getattr(self.inv, "prefer_mid", False))

    def apply(self, x, consts):
        p_ = self.prefix
        p, m = self.n, self.m
        L = p - 1
        x0 = x[..., :1, :]
        bin0 = jnp.sum(x, axis=-2, keepdims=True)            # X[0] = sum x[n]
        a = jnp.take(x, consts[f"{p_}/perm_in"], axis=-2)    # a[i] = x[g^i]
        if m > L:
            pad = [(0, 0)] * (a.ndim - 2) + [(0, m - L), (0, 0)]
            a = jnp.pad(a, pad)
        s = self.fwd.apply(a, consts)
        s = cmul_const(s, consts[f"{p_}/bffta"], consts[f"{p_}/bfftb"])
        conv = self.inv.apply(s, consts)[..., :L, :]
        xk = x0 + conv                                       # X[g^{-j}] = x[0] + conv[j]
        tail = jnp.take(xk, consts[f"{p_}/scatter"], axis=-2)
        return jnp.concatenate([bin0, tail], axis=-2)

    def apply_mid(self, x, consts):
        """Transform along axis -3 of (..., p, L, 2) — gathers address the
        prime axis, the b-spectrum broadcasts over the riding lane dim, and
        the smooth convolution FFTs run in the W4 mid-axis form."""
        p_ = self.prefix
        m = self.m
        L = self.n - 1
        x0 = x[..., :1, :, :]
        bin0 = jnp.sum(x, axis=-3, keepdims=True)
        a = jnp.take(x, consts[f"{p_}/perm_in"], axis=-3)
        if m > L:
            pad = [(0, 0)] * (a.ndim - 3) + [(0, m - L), (0, 0), (0, 0)]
            a = jnp.pad(a, pad)
        s = self.fwd.apply_mid(a, consts)
        s = cmul_const(s, consts[f"{p_}/bffta"][:, None, :],
                       consts[f"{p_}/bfftb"][:, None, :])
        conv = self.inv.apply_mid(s, consts)[..., :L, :, :]
        xk = x0 + conv
        tail = jnp.take(xk, consts[f"{p_}/scatter"], axis=-3)
        return jnp.concatenate([bin0, tail], axis=-3)


# Einsum operands past 2^24 complex elements miscompile silently on the
# target TPU stack; everything chunks at this validated margin (the
# canonical knob plans/transforms.CHUNK_ELEMS aliases this).
OPERAND_CHUNK_ELEMS = 1 << 22
# Slab counts up to this unroll statically (python loop + concat) instead
# of serializing through lax.map — 1.32x measured on the 256^3 axis pass
# (r10).  Past it, HLO size from unrolling outweighs the win; lax.map
# keeps the program small.
STATIC_SLAB_MAX = 64
# tuning.largeRoute == "out-of-core" forces four-step on axes >= this
FOUR_STEP_FORCE_MIN_N = 4096


def four_step_eligible(n: int, tuning, chunk_elems: int = None) -> bool:
    """Should a smooth axis of length n take the explicit HBM four-step
    route?  (The TPU reading of resolveLargeRoutingPolicy's out-of-core
    decision, reference: src/runtime/large_policy.js:301-450.)"""
    chunk_elems = chunk_elems or OPERAND_CHUNK_ELEMS
    if (tuning is None or tuning.large_route == "chunk"
            or tuning.disable_four_step):
        return False
    if not factors.is_smooth(n) or factors.split_two_balanced(n, n) is None:
        return False
    minn = (min(FOUR_STEP_FORCE_MIN_N, tuning.four_step_min_n)
            if tuning.large_route == "out-of-core"
            else tuning.four_step_min_n)
    # necessity overrides the perf threshold: a single line past the
    # validated einsum-operand size MUST decompose
    return n >= minn or n > chunk_elems


def make_smooth_plan(n: int, direction: str, prefix: str, max_sub: int = 32,
                     out_scale: float = 1.0, tuning=None) -> AxisPlan:
    """MixedAxisPlan, or FourStepAxisPlan when the axis is four-step
    eligible under ``tuning``."""
    prec = mxu_precision(tuning)
    ce = getattr(tuning, "chunk_elems", None) if tuning is not None else None
    if n > 1 and four_step_eligible(n, tuning, ce):
        return FourStepAxisPlan(n, direction, prefix, max_sub, out_scale,
                                chunk_elems=ce, prec=prec)
    return MixedAxisPlan(n, direction, prefix, max_sub, out_scale, prec=prec)


def select_axis_kind(n: int, axis: int, tuning) -> str:
    """Axis algorithm policy (reference: src/runtime/large_policy.js:193-237).

    forced overrides win; then smooth -> mixed; prime <= raderMaxPrime ->
    rader; else bluestein.
    """
    if axis in tuning.force_bluestein_axes:
        return "bluestein"
    if axis in tuning.force_rader_axes:
        if not factors.is_prime(n):
            raise ValueError(f"forceRaderAxes: axis {axis} length {n} is not prime")
        if n > tuning.rader_max_prime:
            # the reference enforces raderMaxPrime even on forced axes
            # (large_policy.js:220-222); a silently-built giant host table +
            # convolution plan is worse than the diagnostic
            from ..spec import PlanError
            raise PlanError(
                f"forceRaderAxes: axis {axis} length {n} exceeds "
                f"tuning.raderMaxPrime ({tuning.rader_max_prime})",
                axis=axis, length=n, rader_max_prime=tuning.rader_max_prime)
        return "rader"
    if n == 1 or factors.is_smooth(n):
        return "mixed"
    if factors.is_prime(n) and n <= tuning.rader_max_prime:
        return "rader"
    return "bluestein"


def build_axis_plan(n: int, axis: int, direction: str, tuning, prefix: str) -> AxisPlan:
    kind = select_axis_kind(n, axis, tuning)
    max_sub = tuning.max_sub_length
    if kind == "mixed":
        return make_smooth_plan(n, direction, prefix, max_sub, tuning=tuning)
    if kind == "rader":
        return RaderAxisPlan(n, direction, prefix, max_sub, tuning=tuning)
    return BluesteinAxisPlan(n, direction, prefix, max_sub, tuning=tuning)


def find_slab_axis(shape, array_axis: int, chunk_elems: int = None):
    """(slab_count, axis) slicing some axis != array_axis so per-slab
    element counts fit chunk_elems; None when the array already fits or no
    axis divides suitably.  ``shape`` excludes the component dim."""
    chunk_elems = chunk_elems or OPERAND_CHUNK_ELEMS
    elems = math.prod(shape)
    if elems <= chunk_elems:
        return None
    best = None
    for e in range(len(shape)):
        if e == array_axis:
            continue
        size = shape[e]
        per = elems // size
        for s in range(2, size + 1):
            if size % s == 0 and per * (size // s) <= chunk_elems:
                if best is None or s < best[0]:
                    best = (s, e)
                break
    return best


def _slab_target(axis_plan: AxisPlan, chunk_elems: int) -> int:
    """Per-slab element target for the outer slab search: plans with
    internal digit slabbing only need the RIDING elements shrunk until
    can_self_chunk holds; plain plans need the whole slab within budget."""
    digit = getattr(axis_plan, "max_digit", None)
    if digit:
        return max((chunk_elems // digit) * axis_plan.n, 1)
    return chunk_elems


def slab_apply_feasible(shape, array_axis: int, axis_plan: AxisPlan,
                        chunk_elems: int = None) -> bool:
    """Static feasibility of slabbed_axis_apply for an array of ``shape``
    (component dim excluded) — used for build-time validation so infeasible
    plans fail at create_plan, not first exec."""
    chunk_elems = chunk_elems or OPERAND_CHUNK_ELEMS
    elems = math.prod(shape)
    lead = elems // max(axis_plan.n, 1)
    if elems <= chunk_elems or axis_plan.can_self_chunk(lead, chunk_elems):
        return True
    return find_slab_axis(shape, array_axis,
                          _slab_target(axis_plan, chunk_elems)) is not None


def mapped_slabs(one, s: int, out_axis: int):
    """Map ``one(i)`` over ``s`` slab indices and reassemble along
    ``out_axis``.  Small slab counts unroll statically (slices visible to
    XLA at trace time — 1.32x over lax.map on the 256^3 axis pass, r10);
    large counts keep lax.map so HLO size stays bounded."""
    if s <= STATIC_SLAB_MAX:
        return jnp.concatenate([one(i) for i in range(s)], axis=out_axis)
    return jnp.moveaxis(jax.lax.map(one, jnp.arange(s)), 0, out_axis)


def slabbed_axis_apply(x, axis_plan: AxisPlan, array_axis: int, consts,
                       chunk_elems: int = None):
    """apply_along_axis with einsum operands bounded by chunk_elems.

    Arrays past the validated operand size stream contiguous slabs of a
    complementary axis through jax.lax.map — the single-chip analog of the
    reference's axis-window line chunking (src/plan.js:597-838).  Four-step
    and giant-Bluestein plans bound their own operand sizes when the riding
    elements allow; otherwise outer slabs shrink the riding elements and
    the plan's internal digit slabs handle the rest (composed chunking).
    """
    chunk_elems = chunk_elems or OPERAND_CHUNK_ELEMS
    elems = math.prod(x.shape[:-1])
    lead = elems // max(axis_plan.n, 1)
    if (elems <= chunk_elems
            or axis_plan.can_self_chunk(lead, chunk_elems)):
        return apply_along_axis(x, axis_plan, array_axis, consts)
    slab = find_slab_axis(x.shape[:-1], array_axis,
                          _slab_target(axis_plan, chunk_elems))
    if slab is None:
        raise ValueError(
            f"axis apply of n={axis_plan.n} on shape {x.shape} exceeds the "
            f"validated einsum operand size ({chunk_elems} complex elements) "
            "and no complementary axis divides into small enough slabs")
    s, e = slab
    step = x.shape[e] // s

    def one(i):
        sl = jax.lax.dynamic_slice_in_dim(x, i * step, step, axis=e)
        return apply_along_axis(sl, axis_plan, array_axis, consts)

    return mapped_slabs(one, s, e).reshape(x.shape)


def apply_along_axis(x, axis_plan: AxisPlan, array_axis: int, consts):
    """Apply an axis plan along complex array axis ``array_axis`` of
    interleaved x (..., 2).

    Non-last mixed/Rader/Bluestein axes use the W4 mid-axis form (trailing
    complex dims merged into a riding lane dim; free reshapes, no moveaxis
    transpose passes; measured 2.4x on mixed plans, r3b).  Four-step plans
    — and Rader/Bluestein whose inner convolution FFTs are themselves
    four-step — take the moveaxis fallback instead: XLA fuses those
    transposes for free and the lane-carrying digit form measured
    0.89-0.97x (alternating trials, benches/r4_fourstep_mid2.py).
    """
    last = x.ndim - 2
    if array_axis == last:
        return axis_plan.apply(x, consts)
    if (getattr(axis_plan, "supports_mid", False)
            and getattr(axis_plan, "prefer_mid", True)):
        lead = x.shape[:array_axis]
        n = x.shape[array_axis]
        v = x.reshape(*lead, n, -1, 2)       # L = trailing complex elems
        y = axis_plan.apply_mid(v, consts)
        return y.reshape(x.shape)
    x = jnp.moveaxis(x, array_axis, last)
    y = axis_plan.apply(x, consts)
    return jnp.moveaxis(y, last, array_axis)
