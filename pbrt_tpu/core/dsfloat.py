"""Double-single (two-float) arithmetic — f64 emulation for TPU lanes.

pbrt-v3 retreats to native double precision in exactly two numeric refuges:
the quadric discriminant (efloat.h:48-100 `Quadratic`: `(double)b*b -
4*(double)a*c` and `std::sqrt(double)`), and the watertight triangle test's
exact-zero edge-function fallback (triangle.cpp:243-250).  TPU vector lanes
have no f64, so those two spots use classic Dekker/Knuth double-single
arithmetic instead: every value is an unevaluated sum hi+lo of two f32 with
|lo| <= ulp(hi)/2, giving ~48 mantissa bits — enough that rounding the result
back to f32 matches the f64 computation's f32 rounding in all but ~1-ulp
cases.

Algorithms: Dekker 1971 (two_sum, split, two_prod without FMA); the
refinement sqrt is one Newton step on the f32 seed.  All ops are straight-line
VPU arithmetic — no data-dependent control flow, so they vectorize and jit
cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp

# Veltkamp splitting constant for f32 (2^12 + 1): splits a 24-bit mantissa
# into two 12-bit halves whose products are exact in f32.
_SPLIT = jnp.float32(4097.0)


def two_sum(a, b):
    """Knuth TwoSum: a + b = s + err exactly (no ordering requirement)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker FastTwoSum: requires |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Dekker TwoProduct: a * b = p + err exactly (FMA-free form)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def dd_add(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl) renormalized."""
    sh, sl = two_sum(xh, yh)
    sl = sl + (xl + yl)
    return fast_two_sum(sh, sl)


def dd_sub(xh, xl, yh, yl):
    return dd_add(xh, xl, -yh, -yl)


def dd_mul_f32(xh, xl, y):
    """(xh,xl) * y renormalized."""
    ph, pl = two_prod(xh, y)
    pl = pl + xl * y
    return fast_two_sum(ph, pl)


def dd_discriminant(a, b, c):
    """b*b - 4*a*c in double-single — pbrt's `(double)b*b - 4*(double)a*c`
    (efloat.h Quadratic).  Returns (hi, lo)."""
    b2h, b2l = two_prod(b, b)
    ach, acl = two_prod(a, c)
    # 4*ac is exact (power-of-two scale).
    return dd_sub(b2h, b2l, 4.0 * ach, 4.0 * acl)


def dd_sqrt_to_f32(dh, dl):
    """f32 rounding of sqrt(hi+lo) for a non-negative double-single value —
    pbrt's `std::sqrt(double discrim)` then EFloat's f32 cast.  One Newton
    refinement on the f32 seed recovers the bits the f32 sqrt of the
    f32-rounded discriminant loses."""
    pos = dh > 0.0
    s = jnp.sqrt(jnp.where(pos, dh, 1.0))
    # r = d - s*s in double-single; correction = r / (2 s).  Refine only on
    # normal-range lanes: for denormal dh the division overflows and the
    # inf would poison backward passes through the masking where.
    refine = dh > 1e-30
    s2h, s2l = two_prod(s, s)
    rh, _ = dd_sub(dh, dl, s2h, s2l)
    s = s + jnp.where(refine, rh, 0.0) / (2.0 * jnp.where(refine, s, 1.0))
    return jnp.where(pos, s, 0.0)


def dd_cross2_f32(ax, ay, bx, by):
    """f32 rounding of the exact 2D cross product ax*by - ay*bx — pbrt's
    double re-evaluation of a triangle edge function (triangle.cpp:243-250).
    """
    p1h, p1l = two_prod(ax, by)
    p2h, p2l = two_prod(ay, bx)
    h, l = dd_sub(p1h, p1l, p2h, p2l)
    return h + l
