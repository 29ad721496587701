"""Exchange-correlation energy densities in JAX.

Replaces libxc.  Every functional is expressed as an energy density
``e(rho_a, rho_b, gamma_aa, gamma_ab, gamma_bb)`` (energy per volume);
first/second derivatives (vxc, fxc responses) are obtained by JAX autodiff
in `xc/interface.py` — no hand-coded derivative tables.

Implemented: Slater exchange, VWN5 and VWN3(RPA) correlation, PW92
correlation, B88 exchange, LYP correlation, PBE exchange/correlation.
Composites (B3LYP, BHandHLYP, PBE0, ...) are declared in `xc/registry.py`.
"""

from __future__ import annotations

import jax.numpy as jnp

TINY_RHO = 1e-15


def _safe_rho(rho):
    return jnp.maximum(rho, TINY_RHO)


# ---------------------------------------------------------------- exchange

_CX = (3.0 / 4.0) * (6.0 / jnp.pi) ** (1.0 / 3.0)


def slater_x(ra, rb, gaa, gab, gbb):
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    return -_CX * (ra ** (4.0 / 3.0) + rb ** (4.0 / 3.0))


_B88_BETA = 0.0042


def _b88_spin(r, g):
    r = _safe_rho(r)
    r43 = r ** (4.0 / 3.0)
    # the tiny-g guard must stay representable at f32 (the production
    # chip path): 1e-300 underflows to 0 there and d/dg sqrt(g) at g=0
    # is NaN even under a zero quadrature weight.  1e-35 is negligible
    # against any physical |grad rho|^2 yet finite in both precisions.
    x = jnp.sqrt(jnp.maximum(g, 0.0) + 1e-35) / r43
    denom = 1.0 + 6.0 * _B88_BETA * x * jnp.arcsinh(x)
    return -_CX * r43 - _B88_BETA * r43 * x * x / denom


def b88_x(ra, rb, gaa, gab, gbb):
    """B88 exchange including the LDA part."""
    return _b88_spin(ra, gaa) + _b88_spin(rb, gbb)


def b88_x_gradient_correction(ra, rb, gaa, gab, gbb):
    """Only the gradient-correction part of B88 (for B3LYP mixing)."""
    return b88_x(ra, rb, gaa, gab, gbb) - slater_x(ra, rb, gaa, gab, gbb)


def _sr_factor(a):
    """Short-range (erfc-complement) attenuation factor of the LDA-form
    exchange hole; a = omega / (2 k_eff).  Standard erf-screened exchange
    result (Gill/Adamson form, as used by HSE/LC functionals):
    F(a) = 1 - 8a/3 [sqrt(pi) erf(1/2a) - 3a + 4a^3 + (2a-4a^3) e^(-1/4a^2)]
    with F(0)=1 (no attenuation) and F ~ 1/(18 a^2) -> 0 as a -> inf."""
    import jax.scipy.special as jsp

    a = jnp.maximum(a, 1e-10)
    inv2a = 1.0 / (2.0 * a)
    expo = jnp.exp(-jnp.minimum(inv2a * inv2a, 500.0))
    bracket = (
        jnp.sqrt(jnp.pi) * jsp.erf(inv2a)
        - 3.0 * a
        + 4.0 * a**3
        + (2.0 * a - 4.0 * a**3) * expo
    )
    return jnp.clip(1.0 - (8.0 / 3.0) * a * bracket, 0.0, 1.0)


def _b88_sr_spin(r, g, omega):
    """ITYH short-range B88 (Iikura-Tsuneda-Yanai-Hirao, JCP 115, 3540):
    attenuate the GGA exchange energy density with the LDA-form factor at
    an *effective* Fermi momentum k_eff = -(4 pi / 3) eps_x^GGA, chosen so
    the scheme is exact in the LDA limit (eps_x^LDA = -3 k_F / 4 pi)."""
    r = _safe_rho(r)
    e = _b88_spin(r, g)  # energy per volume (negative)
    k_eff = -(4.0 * jnp.pi / 3.0) * (e / r)
    a = omega / (2.0 * jnp.maximum(k_eff, 1e-12))
    return e * _sr_factor(a)


def make_b88_sr(omega: float):
    """Short-range (erf-complement) B88 exchange at fixed omega."""

    def b88_sr(ra, rb, gaa, gab, gbb):
        return _b88_sr_spin(ra, gaa, omega) + _b88_sr_spin(rb, gbb, omega)

    return b88_sr


_PBE_KAPPA = 0.8040
_PBE_MU = 0.2195149727645171


def _pbe_x_spin(r, g):
    r = _safe_rho(r)
    # spin scaling: e_x(r, g) = 0.5 * e_x_unpolarized(2r, 4g)
    rho = 2.0 * r
    grho2 = 4.0 * jnp.maximum(g, 0.0)
    kf = (3.0 * jnp.pi**2 * rho) ** (1.0 / 3.0)
    ex_unif = -(3.0 / (4.0 * jnp.pi)) * kf * rho
    s2 = grho2 / (4.0 * kf**2 * rho**2)
    F = 1.0 + _PBE_KAPPA - _PBE_KAPPA / (1.0 + _PBE_MU * s2 / _PBE_KAPPA)
    return 0.5 * ex_unif * F


def pbe_x(ra, rb, gaa, gab, gbb):
    return _pbe_x_spin(ra, gaa) + _pbe_x_spin(rb, gbb)


# ------------------------------------------------------------- correlation

def _vwn_F(x, A, b, c, x0):
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = jnp.sqrt(4.0 * c - b * b)
    atn = jnp.arctan(Q / (2.0 * x + b))
    return A * (
        jnp.log(x * x / X)
        + 2.0 * b / Q * atn
        - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X) + 2.0 * (b + 2.0 * x0) / Q * atn)
    )


_VWN5 = {
    "P": (0.0310907, 3.72744, 12.9352, -0.10498),
    "F": (0.01554535, 7.06042, 18.0578, -0.32500),
    "A": (-1.0 / (6.0 * jnp.pi**2), 1.13107, 13.0045, -0.00475840),
}
_VWN3 = {
    "P": (0.0310907, 13.0720, 42.7198, -0.409286),
    "F": (0.01554535, 20.1231, 101.578, -0.743294),
    "A": (-1.0 / (6.0 * jnp.pi**2), 1.06835, 11.4813, -0.228344),
}

_FZ_DEN = 2.0 * (2.0 ** (1.0 / 3.0) - 1.0)
_FPP0 = 4.0 / (9.0 * (2.0 ** (1.0 / 3.0) - 1.0))


def _spin_f(zeta):
    return ((1.0 + zeta) ** (4.0 / 3.0) + (1.0 - zeta) ** (4.0 / 3.0) - 2.0) / _FZ_DEN


def _vwn_eps(rho, zeta, params):
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    x = jnp.sqrt(rs)
    eP = _vwn_F(x, *params["P"])
    eF = _vwn_F(x, *params["F"])
    eA = _vwn_F(x, *params["A"])
    f = _spin_f(zeta)
    z4 = zeta**4
    return eP + eA * f / _FPP0 * (1.0 - z4) + (eF - eP) * f * z4


def _clip_zeta(ra, rb):
    """Spin polarization clipped inside the open interval (-1, 1) by a
    DTYPE-AWARE margin: the fixed 1e-15 margin is below f32 machine
    epsilon, so on the f32 chip fast path zeta rounds back to exactly
    +/-1 and the (1 -/+ zeta)^(-4/3) ladders of the polarized
    correlation limits divide by zero (NaN'd the device-SCF MGGA
    quadrature).  8*eps keeps ~3 ulps of clearance in either dtype."""
    rho = ra + rb
    zeta = (ra - rb) / rho
    m = 8.0 * jnp.finfo(jnp.result_type(zeta)).eps
    return jnp.clip(zeta, -1.0 + m, 1.0 - m)


def vwn5_c(ra, rb, gaa, gab, gbb):
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    rho = ra + rb
    zeta = _clip_zeta(ra, rb)
    return rho * _vwn_eps(rho, zeta, _VWN5)


def vwn3_c(ra, rb, gaa, gab, gbb):
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    rho = ra + rb
    zeta = _clip_zeta(ra, rb)
    return rho * _vwn_eps(rho, zeta, _VWN3)


def _pw92_G(rs, A, a1, b1, b2, b3, b4):
    srs = jnp.sqrt(rs)
    den = 2.0 * A * (b1 * srs + b2 * rs + b3 * rs * srs + b4 * rs * rs)
    return -2.0 * A * (1.0 + a1 * rs) * jnp.log(1.0 + 1.0 / den)


def _pw92_eps(rho, zeta):
    rs = (3.0 / (4.0 * jnp.pi * rho)) ** (1.0 / 3.0)
    e0 = _pw92_G(rs, 0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
    e1 = _pw92_G(rs, 0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517)
    mac = _pw92_G(rs, 0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671)
    f = _spin_f(zeta)
    z4 = zeta**4
    return e0 - mac * f / _FPP0 * (1.0 - z4) + (e1 - e0) * f * z4


def pw92_c(ra, rb, gaa, gab, gbb):
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    rho = ra + rb
    zeta = _clip_zeta(ra, rb)
    return rho * _pw92_eps(rho, zeta)


_LYP_A = 0.04918
_LYP_B = 0.132
_LYP_C = 0.2533
_LYP_D = 0.349
_CF = 0.3 * (3.0 * jnp.pi**2) ** (2.0 / 3.0)


def lyp_c(ra, rb, gaa, gab, gbb):
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    rho = ra + rb
    gtot = gaa + gbb + 2.0 * gab
    rm13 = rho ** (-1.0 / 3.0)
    denom = 1.0 + _LYP_D * rm13
    omega = jnp.exp(-_LYP_C * rm13) / denom * rho ** (-11.0 / 3.0)
    delta = _LYP_C * rm13 + _LYP_D * rm13 / denom
    t1 = -4.0 * _LYP_A / denom * ra * rb / rho
    inner = (
        2.0 ** (11.0 / 3.0) * _CF * (ra ** (8.0 / 3.0) + rb ** (8.0 / 3.0))
        + (47.0 / 18.0 - 7.0 * delta / 18.0) * gtot
        - (5.0 / 2.0 - delta / 18.0) * (gaa + gbb)
        - (delta - 11.0) / 9.0 * (ra / rho * gaa + rb / rho * gbb)
    )
    t2 = (
        ra * rb * inner
        - (2.0 / 3.0) * rho**2 * gtot
        + ((2.0 / 3.0) * rho**2 - ra**2) * gbb
        + ((2.0 / 3.0) * rho**2 - rb**2) * gaa
    )
    return t1 - _LYP_A * _LYP_B * omega * t2


_PBE_GAMMA = (1.0 - jnp.log(2.0)) / jnp.pi**2
_PBE_BETA = 0.06672455060314922


def pbe_c(ra, rb, gaa, gab, gbb):
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    rho = ra + rb
    zeta = _clip_zeta(ra, rb)
    eps = _pw92_eps(rho, zeta)
    phi = 0.5 * ((1.0 + zeta) ** (2.0 / 3.0) + (1.0 - zeta) ** (2.0 / 3.0))
    kf = (3.0 * jnp.pi**2 * rho) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / jnp.pi)
    gtot = jnp.maximum(gaa + gbb + 2.0 * gab, 0.0)
    t2 = gtot / (2.0 * phi * ks * rho) ** 2
    expo = jnp.exp(-eps / (_PBE_GAMMA * phi**3))
    A = _PBE_BETA / _PBE_GAMMA / jnp.maximum(expo - 1.0, 1e-30)
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = (
        _PBE_GAMMA
        * phi**3
        * jnp.log(1.0 + _PBE_BETA / _PBE_GAMMA * t2 * num / den)
    )
    return rho * (eps + H)


# ---------------------------------------------------------------- meta-GGA
#
# MGGA energy densities take two extra arguments (ta, tb): the spin
# kinetic-energy densities tau_sigma = 1/2 sum_i |grad phi_i_sigma|^2.
# The reference's TDA/UTDA fxc loops carry MGGA branches through libxc
# (`xtddft/TDA.py:107-168`, `UTDA.py:169-265`; `XTDA.py:242`'s branch is
# broken upstream); here TPSS is one more autodiff energy density.
#
# TPSS: Tao, Perdew, Staroverov, Scuseria, PRL 91, 146401 (2003); the
# x(p, z) expression and constants follow eqs. (5)-(12) and the revPKZB
# correlation eqs. (11)-(14) of the companion JCP 120, 6898 (2004).

_TPSS_KAPPA = 0.804
_TPSS_C = 1.59096
_TPSS_E = 1.537
_TPSS_B = 0.40
_TPSS_MU = 0.21951
_TPSS_D = 2.8


def _tpss_fx(rho, gamma, tau):
    """TPSS exchange enhancement factor for one spin-unpolarized density."""
    rho = _safe_rho(rho)
    gamma = jnp.maximum(gamma, 0.0)
    kf2 = (3.0 * jnp.pi**2 * rho) ** (2.0 / 3.0)
    p = gamma / (4.0 * kf2 * rho**2)
    tau_w = gamma / (8.0 * rho)
    tau_u = 0.3 * kf2 * rho
    tau = jnp.maximum(tau, tau_w + 1e-30)  # z <= 1, alpha >= 0 by physics
    z = tau_w / tau
    alpha = (tau - tau_w) / jnp.maximum(tau_u, 1e-30)
    qb = 0.45 * (alpha - 1.0) / jnp.sqrt(
        1.0 + _TPSS_B * alpha * (alpha - 1.0)
    ) + 2.0 * p / 3.0
    z2 = z * z
    t1 = (10.0 / 81.0 + _TPSS_C * z2 / (1.0 + z2) ** 2) * p
    t2 = (146.0 / 2025.0) * qb * qb
    # dtype-aware floor keeps the sqrt's autodiff finite at p=z=0
    # (uniform gas / sanitized dummy points): d sqrt(q)/dp = p/sqrt(q)
    # -> 0/0 NaN without it, and 0-weighted NaNs still poison jax.grad
    # sums.  finfo.tiny (1.2e-38 f32 / 2.2e-308 f64) stays representable
    # on the f32 chip fast path, where a fixed 1e-60 underflows to 0 and
    # reintroduces the NaN (device-SCF MGGA quadrature).
    t3 = -(73.0 / 405.0) * qb * jnp.sqrt(
        0.5 * (0.6 * z) ** 2 + 0.5 * p * p
        + jnp.finfo(jnp.result_type(p)).tiny
    )
    t4 = (1.0 / _TPSS_KAPPA) * (10.0 / 81.0) ** 2 * p * p
    t5 = 2.0 * jnp.sqrt(_TPSS_E) * (10.0 / 81.0) * (0.6 * z) ** 2
    t6 = _TPSS_E * _TPSS_MU * p**3
    x = (t1 + t2 + t3 + t4 + t5 + t6) / (1.0 + jnp.sqrt(_TPSS_E) * p) ** 2
    return 1.0 + _TPSS_KAPPA - _TPSS_KAPPA / (1.0 + x / _TPSS_KAPPA)


def _lda_x_density(rho):
    """Spin-unpolarized LDA exchange energy density (per volume)."""
    return -(3.0 / 4.0) * (3.0 / jnp.pi) ** (1.0 / 3.0) * rho ** (4.0 / 3.0)


def tpss_x(ra, rb, gaa, gab, gbb, ta, tb):
    """TPSS exchange via the exact spin-scaling
    E_x[ra, rb] = (E_x[2 ra] + E_x[2 rb]) / 2."""
    out = 0.0
    for r, g, t in ((ra, gaa, ta), (rb, gbb, tb)):
        r2, g2, t2 = 2.0 * r, 4.0 * g, 2.0 * t
        out = out + 0.5 * _lda_x_density(_safe_rho(r2)) * _tpss_fx(r2, g2, t2)
    return out


def _pbe_eps(ra, rb, gaa, gab, gbb):
    """PBE correlation energy PER PARTICLE."""
    return pbe_c(ra, rb, gaa, gab, gbb) / _safe_rho(ra + rb)


def tpss_c(ra, rb, gaa, gab, gbb, ta, tb):
    """TPSS (revPKZB-based) correlation energy density."""
    ra = _safe_rho(ra)
    rb = _safe_rho(rb)
    rho = ra + rb
    tau = jnp.maximum(ta + tb, 1e-30)
    gtot = jnp.maximum(gaa + 2.0 * gab + gbb, 0.0)
    tau_w = gtot / (8.0 * rho)
    z = jnp.clip(tau_w / jnp.maximum(tau, tau_w + 1e-30), 0.0, 1.0)
    zeta = _clip_zeta(ra, rb)
    # xi = |grad zeta| / (2 (3 pi^2 rho)^(1/3)); |grad zeta|^2 expressed
    # through the spin gammas: grad zeta = (rb*ga - ra*gb) * 2 / rho^2.
    # Written in spin-fraction form (sa=rb/rho, sb=ra/rho): the naive
    # `.../rho**4` quotient NaNs the f32 chip fast path — its autodiff
    # forms rho**8, which underflows to 0 below rho ~ 1e-5 and divides
    # the cotangent by it.  Every power here stays f32-representable
    # down to the 3e-7 density floor.
    inv_rho = 1.0 / rho
    sa = rb * inv_rho
    sb = ra * inv_rho
    gznum = jnp.maximum(
        sa * sa * gaa - 2.0 * sa * sb * gab + sb * sb * gbb, 0.0)
    xi2 = (gznum * inv_rho * inv_rho * inv_rho ** (2.0 / 3.0)
           / (3.0 * jnp.pi**2) ** (2.0 / 3.0))
    up = jnp.maximum(1.0 + zeta, 1e-12)
    dn = jnp.maximum(1.0 - zeta, 1e-12)
    Cnum = 0.53 + 0.87 * zeta**2 + 0.50 * zeta**4 + 2.26 * zeta**6
    Cden = (1.0 + 0.5 * xi2 * (up ** (-4.0 / 3.0) + dn ** (-4.0 / 3.0))) ** 4
    C = Cnum / Cden
    eps = _pbe_eps(ra, rb, gaa, gab, gbb)
    # per-spin fully-polarized PBE epsilons, bounded below by eps
    eps_a = jnp.maximum(_pbe_eps(ra, 1e-15, gaa, 0.0, 0.0), eps)
    eps_b = jnp.maximum(_pbe_eps(rb, 1e-15, gbb, 0.0, 0.0), eps)
    z2 = z * z
    eps_rev = eps * (1.0 + C * z2) - (1.0 + C) * z2 * (
        (ra / rho) * eps_a + (rb / rho) * eps_b
    )
    return rho * eps_rev * (1.0 + _TPSS_D * eps_rev * z2 * z)


MGGA_NAMES = frozenset({"tpss_x", "tpss_c"})

FUNCTIONALS = {
    "slater": slater_x,
    "b88": b88_x,
    "b88_gc": b88_x_gradient_correction,
    "pbe_x": pbe_x,
    "vwn5": vwn5_c,
    "vwn3": vwn3_c,
    "vwn_rpa": vwn3_c,
    "pw92": pw92_c,
    "lyp": lyp_c,
    "pbe_c": pbe_c,
    # fixed-omega short-range exchange components for RSH composites
    "b88_sr@0.33": make_b88_sr(0.33),
    # meta-GGA (signature carries the extra (ta, tb) tau arguments)
    "tpss_x": tpss_x,
    "tpss_c": tpss_c,
}
