"""Fit reduced-degree odd minimax polynomials for GELU / GELU'.

The shipped kernels evaluate Phi(x) and gelu'(x) as ``0.5 + x * P(t)``,
``t = 2 x^2 / B^2 - 1`` with clamped x (see ops/gelu_dropout_pallas.py).
The original 13/17-coefficient fits target f32 accuracy (~1e-6) but every
consumer casts to bf16 (ulp(0.5) = 2^-9 ~ 2e-3), so much shorter
polynomials are numerically invisible while halving the dominant VPU cost
in the fused FFN/FE kernels. This tool least-squares-fits P on a dense
grid with Lawson (iteratively reweighted) refinement toward minimax on the
FINAL function error — gelu error for Phi (weight x^2), gelu' error
directly (weight x) — and prints coefficient tables + max errors.

Run: python tools/fit_gelu_poly.py
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial import chebyshev as C

try:
    from scipy.special import erf
except ImportError:  # torch fallback
    import torch

    def erf(x):
        return torch.erf(torch.from_numpy(np.asarray(x))).numpy()

SQRT2 = np.sqrt(2.0)
INV_SQRT_2PI = 1.0 / np.sqrt(2.0 * np.pi)


def phi_cdf(x):
    return 0.5 * (1.0 + erf(x / SQRT2))


def pdf(x):
    return INV_SQRT_2PI * np.exp(-0.5 * x * x)


def gelu(x):
    return x * phi_cdf(x)


def dgelu(x):
    return phi_cdf(x) + x * pdf(x)


def fit(target_fn, final_err_weight, B, ncoef, iters=60):
    """Fit P(t): target(x) ~ 0.5 + x P(t) on [0, B], minimizing the
    weighted final-function error with Lawson reweighting."""
    n = 4001
    # Chebyshev-distributed t grid (denser at the ends)
    t = -np.cos(np.linspace(0.0, np.pi, n))
    x = B * np.sqrt((t + 1.0) / 2.0)
    y = np.where(x > 1e-12, (target_fn(x) - 0.5) / np.maximum(x, 1e-12),
                 target_fn(1e-8 * np.ones_like(x)) * 0 + _limit0(target_fn))
    V = C.chebvander(t, ncoef - 1)
    w = final_err_weight(x)
    w = np.maximum(w, 1e-6 * w.max())
    lw = np.ones(n)
    best = None
    for _ in range(iters):
        ww = np.sqrt(w * lw)
        coef, *_ = np.linalg.lstsq(V * ww[:, None], y * ww, rcond=None)
        err = (V @ coef - y) * w  # final-function error
        m = np.abs(err).max()
        if best is None or m < best[0]:
            best = (m, coef.copy())
        lw = lw * (1.0 + np.abs(err) / max(m, 1e-300))
        lw /= lw.mean()
    coef = best[1]
    # Chebyshev -> monomial in t (Horner order: highest first)
    mono = C.cheb2poly(coef)[::-1]
    return mono


def _limit0(fn):
    eps = 1e-6
    return (fn(np.array([eps]))[0] - 0.5) / eps


def horner(tc, mono):
    acc = np.full_like(tc, mono[0])
    for c in mono[1:]:
        acc = acc * tc + c
    return acc


def eval_final(x, mono, B, target, outer):
    """outer: maps the clamped-poly Phi-like value to the final function
    the kernels emit (gelu multiplies by the UNCLAMPED x, like
    _gelu_parts; dgelu is the value itself)."""
    xc = np.clip(x, -B, B)
    t = 2.0 * (xc * xc) / (B * B) - 1.0
    approx = outer(x, 0.5 + xc * horner(t, mono))
    return np.abs(approx - target(x))


def report(name, target, final_weight, final_target, outer, Bs, degrees):
    print(f"== {name} ==")
    for B in Bs:
        for ncoef in degrees:
            mono = fit(target, final_weight, B, ncoef)
            xg = np.linspace(-9, 9, 200001)
            err = eval_final(xg, mono, B, final_target, outer)
            fv = np.abs(final_target(xg))
            # bf16-relative: error vs max(bf16 ulp floor at |v|<=0.5, rel ulp)
            rel = (err / np.maximum(2.0 ** -10, fv * 2.0 ** -9)).max()
            core = err[np.abs(xg) <= 3.0].max()
            print(f"  B={B} ncoef={ncoef}: max abs {err.max():.3e} "
                  f"core(|x|<=3) {core:.3e} bf16-rel {rel:.3f}")
            if rel < 0.3:
                print("    coef = (")
                for c in mono:
                    print(f"        {c:.9e},")
                    pass
                print("    )")
    print()


def main():
    # Phi: final function is gelu(x) = x * Phi(x) = 0.5x + x^2 P(t)
    # -> final err weight on P is x^2. (Phi itself feeds gelu only.)
    report(
        "Phi (for gelu = x*Phi)", phi_cdf,
        lambda x: np.maximum(x, 1e-12) ** 2,
        gelu, lambda x, phi: x * phi,
        Bs=(4.0, 4.5, 5.0), degrees=(5, 6, 7, 8),
    )
    # gelu': final function is gelu'(x) = 0.5 + x P(t) -> weight x.
    report(
        "dgelu", dgelu, lambda x: np.maximum(x, 1e-12),
        dgelu, lambda x, v: v,
        Bs=(4.5, 5.0, 5.5), degrees=(6, 7, 8, 9),
    )


if __name__ == "__main__":
    main()
