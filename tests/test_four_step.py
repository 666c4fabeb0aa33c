"""Four-step HBM route: correctness, routing, slab chunking, guards.

Reference counterpart: the out-of-core four-step / axis-0 two-step
(src/runtime/plans/c2c.js:3386-3549, src/plan.js:89-153) — on TPU a single
giant smooth axis decomposes into an (n1, n2) digit grid with a rows-form
stage 1, folded twiddle, contiguous stage 2, and one digit transpose
(core/axis.FourStepAxisPlan).
"""

import numpy as np
import pytest

import webgpufft_tpu as W
from webgpufft_tpu.core import axis as A
from webgpufft_tpu.core.cplx import interleave, uninterleave
from webgpufft_tpu.plans import transforms as T
from webgpufft_tpu.utils import mathref as R


def rand_c(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


@pytest.mark.parametrize("direction", ["forward", "inverse"])
def test_four_step_forced_matches_numpy(rng, assert_close, direction):
    """tuning.largeRoute='out-of-core' selects the four-step route and the
    result matches numpy at n=8192."""
    n = 8192
    z = rand_c(rng, (2, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=2, direction=direction,
                        normalize="unitary", tuning={"largeRoute": "out-of-core"})
    assert plan.route.mode == "four-step-hbm", plan.route
    assert any("four-step" in r for r in plan.route.reasons), plan.route.reasons
    y = uninterleave(np.asarray(plan(interleave(z))))
    ref = R.fft_nd(z, [n], direction) / np.sqrt(n)
    assert_close(y.real, ref.real, label="4step.re")
    assert_close(y.imag, ref.imag, label="4step.im")


def test_four_step_auto_threshold(rng, assert_close):
    """auto route takes four-step at n >= tuning.fourStepMinN and stays on
    the generic einsum path below it."""
    n = 4096
    z = rand_c(rng, (1, n))
    lo = W.create_plan(type="c2c", shape=[n], batch=1,
                      tuning={"fourStepMinN": n})
    assert lo.route.mode == "four-step-hbm"
    hi = W.create_plan(type="c2c", shape=[n], batch=1,
                      tuning={"fourStepMinN": n + 1})
    assert hi.route.mode == "xla"
    ya = uninterleave(np.asarray(lo(interleave(z))))
    yb = uninterleave(np.asarray(hi(interleave(z))))
    ref = R.fft_nd(z, [n], "forward")
    assert_close(ya, ref, label="4step-auto")
    assert_close(yb, ref, label="einsum-below-threshold")


def test_four_step_chunk_route_disables(rng):
    plan = W.create_plan(type="c2c", shape=[8192], batch=1,
                        tuning={"largeRoute": "chunk", "fourStepMinN": 4096})
    assert plan.route.mode == "xla"


def test_four_step_slab_chunking(rng, assert_close, monkeypatch):
    """A line past the operand budget streams digit slabs through lax.map
    inside the four-step stages."""
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 2048)
    monkeypatch.setattr(T, "CHUNK_ELEMS", 2048)
    n = 16384  # > 2048 budget -> internal slabs on both stages
    z = rand_c(rng, (1, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=1, direction="forward")
    assert plan.route.mode == "four-step-hbm"  # necessity override
    assert "single-item-exceeds-chunk" in plan.route.reasons
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, [n], "forward"), label="4step-slabs")


def test_giant_nd_slabbed_axes(rng, assert_close, monkeypatch):
    """ND plans whose single item exceeds the budget slab every axis
    application over a complementary axis."""
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 1024)
    monkeypatch.setattr(T, "CHUNK_ELEMS", 1024)
    shape = (64, 128)  # 8192 > 1024, both axes small -> outer slabs
    z = rand_c(rng, (1, *shape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=1)
    assert "single-item-exceeds-chunk" in plan.route.reasons
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, shape, "forward"), label="nd-slabs")


def test_giant_r2c_slabbed(rng, assert_close, monkeypatch):
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 1024)
    monkeypatch.setattr(T, "CHUNK_ELEMS", 1024)
    shape = (64, 64)
    x = rng.standard_normal((1, *shape)).astype(np.float32)
    plan = W.create_plan(type="r2c", shape=list(shape), direction="forward")
    y = uninterleave(np.asarray(plan(x)))
    ref = R.r2c_packed(x.astype(np.float64), shape)
    assert_close(y.real, ref.real, label="r2c-slabs.re")
    assert_close(y.imag, ref.imag, label="r2c-slabs.im")


def test_giant_unchunkable_raises(monkeypatch):
    """A single transform past the budget with no four-step split and no
    divisible complementary axis fails at build time with a diagnostic
    (previously: silent einsum-operand overflow)."""
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 1024)
    monkeypatch.setattr(T, "CHUNK_ELEMS", 1024)
    with pytest.raises(W.PlanError, match="operand size"):
        W.create_plan(type="c2c", shape=[2053, 2053], batch=1)


def test_four_step_in_bluestein_inner(rng, assert_close, monkeypatch):
    """Giant non-smooth axes ride Bluestein whose inner smooth-M FFTs take
    the four-step route (self-chunking)."""
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 4096)
    monkeypatch.setattr(T, "CHUNK_ELEMS", 4096)
    n = 4099  # prime > raderMaxPrime? no (4099 > 4096) -> bluestein
    z = rand_c(rng, (1, n))
    plan = W.create_plan(type="c2c", shape=[n], batch=1)
    assert plan.route.axis_kinds == ("bluestein",)
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, [n], "forward"), label="bluestein-4step")


def test_four_step_composes_with_staging(rng, assert_close):
    """Four-step route composes with ioView/zeroPad/bf16 staging."""
    n = 4096
    z = rand_c(rng, (1, n - 128)) * 0.5
    plan = W.create_plan(type="c2c", shape=[n], batch=1,
                        ioView={"input": {"shape": [n - 128]}},
                        tuning={"fourStepMinN": n})
    assert plan.route.mode == "four-step-hbm"
    y = uninterleave(np.asarray(plan(interleave(z))))
    padded = np.zeros((1, n), complex)
    padded[:, :n - 128] = z
    assert_close(y, R.fft_nd(padded, [n], "forward"), label="4step+ioview")


def test_four_step_nd_non_last_axis(rng, assert_close):
    """Four-step on a non-last axis (moveaxis fallback) of an ND plan."""
    shape = (4096, 4)
    z = rand_c(rng, (1, *shape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=1,
                        tuning={"fourStepMinN": 4096})
    assert plan.route.mode == "four-step-hbm"
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, shape, "forward"), label="4step-axis0")


# ---------------------------------------------------------------------------
# four-step inside every plan family (threshold forced small)
# ---------------------------------------------------------------------------

FS = {"fourStepMinN": 2048}


def test_four_step_in_r2c_c2r(rng, assert_close):
    """r2c/c2r ride the four-step for their (half-length) axis-0 FFTs."""
    n = 8192  # half-trick runs a 4096-point complex FFT >= threshold
    x = rng.standard_normal((1, n)).astype(np.float32)
    fwd = W.create_plan(type="r2c", shape=[n], direction="forward", tuning=FS)
    inv = W.create_plan(type="c2r", shape=[n], direction="inverse",
                       normalize="backward", tuning=FS)
    y = uninterleave(np.asarray(fwd(x)))
    ref = np.fft.rfft(x, axis=1)
    assert_close(y.real, ref.real, label="r2c-4step.re")
    assert_close(y.imag, ref.imag, label="r2c-4step.im")
    back = np.asarray(inv(np.asarray(fwd(x))))
    assert_close(back, x, label="c2r-4step roundtrip")


def test_four_step_in_dct_fft_route(rng, assert_close):
    """dct2's FFT route uses a four-step inner FFT for giant axes."""
    n = 4096
    x = rng.standard_normal((1, n)).astype(np.float32)
    plan = W.create_plan(type="dct2", shape=[n], direction="forward",
                        tuning={**FS, "dct_fft_min_n": 1024})
    y = np.asarray(plan(x))
    ref = R.dct_nd(x.astype(np.float64), [n], "dct2", "forward")
    assert_close(y, ref, label="dct2-4step")


def test_four_step_in_fftconv(rng, assert_close):
    n = 4096
    z = rand_c(rng, (1, n)) * 0.1
    k = rand_c(rng, (n,)) * 0.1
    plan = W.create_plan(type="fftconv", shape=[n], batch=1, tuning=FS)
    y = uninterleave(np.asarray(plan.exec(interleave(z), kernel=interleave(k))))
    ref = R.fftconv(z, k, [n], batch=1)
    assert_close(y.real, ref.real, label="fftconv-4step.re")
    assert_close(y.imag, ref.imag, label="fftconv-4step.im")


def test_four_step_bf16_storage(rng):
    import jax.numpy as jnp
    n = 4096
    z = rand_c(rng, (1, n)) * 0.5
    plan = W.create_plan(type="c2c", shape=[n], batch=1,
                        precision="bf16-storage", tuning=FS)
    assert plan.route.mode == "four-step-hbm"
    xb = jnp.asarray(interleave(z)).astype(jnp.bfloat16)
    y = uninterleave(np.asarray(plan(xb).astype(jnp.float32)))
    ref = R.fft_nd(z, [n], "forward")
    err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert err < 2e-2, err  # bf16 storage rounding dominates


def test_out_of_core_respects_lower_user_threshold(rng, assert_close):
    """largeRoute='out-of-core' must not WEAKEN a lower user fourStepMinN
    (regression: forcing used to replace it with the fixed 4096 floor)."""
    plan = W.create_plan(type="c2c", shape=[2048], batch=1,
                        tuning={"fourStepMinN": 2048,
                                "largeRoute": "out-of-core"})
    assert plan.route.mode == "four-step-hbm", plan.route
    z = rand_c(rng, (1, 2048))
    assert_close(uninterleave(np.asarray(plan(interleave(z)))),
                 R.fft_nd(z, [2048], "forward"), label="oc-low-threshold")


def test_two_level_split_respects_lowered_max_sub():
    """A user who LOWERED maxSubLength keeps small sub-DFT tables; the
    2-level preference only applies at/above the default."""
    from webgpufft_tpu.core.axis import MixedAxisPlan
    assert MixedAxisPlan(4096, "forward", "t", max_sub=8).subs[0] <= 8
    assert MixedAxisPlan(4096, "forward", "t", max_sub=32).subs == [64, 64]


def test_four_step_slabs_raise_when_unboundable():
    """_slabs raises instead of silently exceeding the operand budget when
    even single-digit slabs are too large."""
    from webgpufft_tpu.core.axis import FourStepAxisPlan
    ap = FourStepAxisPlan(64, "forward", "f", chunk_elems=16)
    with pytest.raises(ValueError, match="cannot bound"):
        ap._slabs(4)  # lead 4 x digit 8 > 16 even at full slabbing


def test_composed_outer_and_inner_chunking(rng, assert_close, monkeypatch):
    """Four-step axes whose RIDING elements exceed the budget compose:
    outer slabs shrink the lead, internal digit slabs bound the rest
    (regression: build passed feasibility, first exec raised ValueError)."""
    monkeypatch.setattr(A, "OPERAND_CHUNK_ELEMS", 1024)
    monkeypatch.setattr(T, "CHUNK_ELEMS", 1024)
    shape = (64, 4096)  # axis1 four-step by necessity; lead 64 x digit 64 > 1024
    z = rand_c(rng, (1, *shape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=1)
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, shape, "forward"), label="composed-chunking")


def test_disable_out_of_core_four_step(rng, assert_close):
    """disableOutOfCoreFourStep actually disables the route (regression:
    it was classified as a WebGPU-only no-op)."""
    plan = W.create_plan(type="c2c", shape=[8192], batch=1,
                        tuning={"fourStepMinN": 4096,
                                "disableOutOfCoreFourStep": True})
    assert plan.route.mode == "xla", plan.route
    z = rand_c(rng, (1, 8192))
    assert_close(uninterleave(np.asarray(plan(interleave(z)))),
                 R.fft_nd(z, [8192], "forward"), label="disable-4step")


def test_two_level_split_honors_raised_max_sub():
    """maxSubLength ABOVE the default also caps the 2-level split factors
    (regression: a user cap of 64 was silently exceeded by 128)."""
    from webgpufft_tpu.core.axis import MixedAxisPlan
    assert max(MixedAxisPlan(8192, "forward", "t", max_sub=64).subs) <= 64


def test_four_step_apply_mid_matches_apply(rng, assert_close):
    """FourStepAxisPlan.apply_mid (VERDICT r2 #7): the digit pipeline with
    a riding lane dim equals the moveaxis + apply form, including the
    internally-slabbed path (tiny chunk_elems forces s1/s2 > 1)."""
    import jax.numpy as jnp
    for chunk in (None, 256):
        ap = A.FourStepAxisPlan(64, "forward", "fsm", chunk_elems=chunk)
        consts = {k: jnp.asarray(v) for k, v in ap.consts().items()}
        x = rng.standard_normal((3, 64, 5, 2)).astype(np.float32)
        got = np.asarray(ap.apply_mid(jnp.asarray(x), consts))
        via_move = np.moveaxis(np.asarray(ap.apply(
            jnp.asarray(np.moveaxis(x, 1, -2).copy()), consts)), -2, 1)
        assert_close(got, via_move, label=f"mid-vs-move chunk={chunk}")
        z = x[..., 0] + 1j * x[..., 1]
        assert_close(got[..., 0] + 1j * got[..., 1],
                     np.fft.fft(z, axis=1), label=f"mid-oracle chunk={chunk}")


def test_four_step_mid_structural_and_nested():
    """Structurally: the four-step (and Bluestein/Rader plans whose inner
    M-FFTs are four-step) report supports_mid (the capability exists and
    composes with slab streaming) but prefer the moveaxis fallback —
    alternating on-chip trials measured the lane-carrying digit form
    0.89-0.97x (benches/r4_fourstep_mid2.py).  Mixed plans keep mid."""
    ap = A.FourStepAxisPlan(4096, "forward", "fss")
    assert ap.supports_mid and not ap.prefer_mid
    assert A.MixedAxisPlan(4096, "forward", "mxp").prefer_mid
    from webgpufft_tpu.spec import TuningSpec
    import dataclasses
    tun = dataclasses.replace(TuningSpec(), four_step_min_n=2048)
    bl = A.BluesteinAxisPlan(2801, "forward", "blm", tuning=tun)
    assert isinstance(bl.fwd, A.FourStepAxisPlan)
    assert bl.supports_mid and not bl.prefer_mid
    rd = A.RaderAxisPlan(2053, "forward", "rdm", tuning=tun)
    assert isinstance(rd.fwd, A.FourStepAxisPlan) or rd.supports_mid
    # smooth-inner Bluestein still prefers the (2.4x-measured) mid form
    bsm = A.BluesteinAxisPlan(2801, "forward", "bls")
    assert bsm.supports_mid and bsm.prefer_mid


def test_four_step_nd_non_last_axis_mid_route(rng, assert_close):
    """End-to-end ND c2c with a four-step axis 0 matches the oracle under
    the measured routing policy (moveaxis for four-step axes), including a
    Bluestein axis whose inner M-FFT is four-step."""
    shape = (4096, 4)
    z = rand_c(rng, (1, *shape))
    plan = W.create_plan(type="c2c", shape=list(shape), batch=1,
                        tuning={"fourStepMinN": 4096})
    y = uninterleave(np.asarray(plan(interleave(z))))
    assert_close(y, R.fft_nd(z, shape, "forward"), label="4step-mid-axis0")
    # prime axis 0 -> Bluestein with M = next smooth >= 2n-1 four-step
    shape2 = (2801, 3)
    z2 = rand_c(rng, (1, *shape2))
    plan2 = W.create_plan(type="c2c", shape=list(shape2), batch=1,
                         tuning={"fourStepMinN": 2048})
    y2 = uninterleave(np.asarray(plan2(interleave(z2))))
    assert_close(y2, R.fft_nd(z2, shape2, "forward"),
                 label="bluestein-4step-mid-axis0")
