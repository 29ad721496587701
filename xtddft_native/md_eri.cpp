// McMurchie-Davidson Gaussian ERI engine (native hot path).
//
// Re-owns what the reference delegates to libcint (SURVEY.md §2.4): the
// O(N^4) two-electron integral generation that gates real-molecule
// production scale.  The Python engine in xtddft_tpu/ints/ remains the
// readable reference implementation and the derivative-integral provider;
// this library accelerates the 4-center and 3-center (density fitting)
// paths, OpenMP-parallel over shell-pair products.
//
// Conventions match xtddft_tpu/ints exactly: segmented contractions with
// pre-normalized coefficients, real spherical AOs via cart2sph matrices
// passed from Python, chemists' notation (ij|kl).
//
// Build: xtddft_native/build.sh  (g++ -O3 -march=native -fopenmp -shared).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr int LMAX = 4;
constexpr int LQMAX = 4 * LMAX + 2;

inline int ncart(int l) { return (l + 1) * (l + 2) / 2; }
inline int nsph(int l) { return 2 * l + 1; }

void boys(int mmax, double x, double* out) {
    if (x < 1e-13) {
        for (int m = 0; m <= mmax; ++m)
            out[m] = 1.0 / (2 * m + 1) - x / (2 * m + 3);
        return;
    }
    if (x > 35.0) {
        out[0] = 0.5 * std::sqrt(M_PI / x) * std::erf(std::sqrt(x));
        double ex = std::exp(-x);
        for (int m = 1; m <= mmax; ++m)
            out[m] = ((2 * m - 1) * out[m - 1] - ex) / (2.0 * x);
        return;
    }
    double s = 0.0, t = 1.0 / (2.0 * mmax + 1.0);
    int k = 0;
    while (t > 1e-17 * s + 1e-300 && k < 300) {
        s += t;
        ++k;
        t *= x / (mmax + 0.5 + k);
    }
    double ex = std::exp(-x);
    out[mmax] = s * ex;
    for (int m = mmax; m > 0; --m)
        out[m - 1] = (2.0 * x * out[m] + ex) / (2 * m - 1);
}

struct HermTab {
    std::vector<int> t, u, v;
    int idx[LQMAX + 1][LQMAX + 1][LQMAX + 1];
    int n = 0;
    void build(int L) {
        std::memset(idx, -1, sizeof(idx));
        for (int deg = 0; deg <= L; ++deg)
            for (int tt = deg; tt >= 0; --tt)
                for (int uu = deg - tt; uu >= 0; --uu) {
                    int vv = deg - tt - uu;
                    idx[tt][uu][vv] = (int)t.size();
                    t.push_back(tt);
                    u.push_back(uu);
                    v.push_back(vv);
                }
        n = (int)t.size();
    }
};

HermTab g_herm[LQMAX + 1];
bool g_init = false;

void init_tables() {
    if (g_init) return;
    for (int L = 0; L <= LQMAX; ++L) g_herm[L].build(L);
    g_init = true;
}

void e_coeffs(int la, int lb, double a, double b, double AB,
              double E[LMAX + 1][LMAX + 1][2 * LMAX + 1]) {
    double p = a + b, mu = a * b / p;
    double XPA = -b / p * AB, XPB = a / p * AB, inv2p = 0.5 / p;
    for (int i = 0; i <= la; ++i)
        for (int j = 0; j <= lb; ++j)
            for (int t = 0; t <= la + lb; ++t) E[i][j][t] = 0.0;
    E[0][0][0] = std::exp(-mu * AB * AB);
    for (int i = 1; i <= la; ++i)
        for (int t = 0; t <= i; ++t) {
            double val = XPA * E[i - 1][0][t];
            if (t > 0) val += inv2p * E[i - 1][0][t - 1];
            if (t + 1 <= i - 1) val += (t + 1) * E[i - 1][0][t + 1];
            E[i][0][t] = val;
        }
    for (int j = 1; j <= lb; ++j)
        for (int i = 0; i <= la; ++i)
            for (int t = 0; t <= i + j; ++t) {
                double val = XPB * E[i][j - 1][t];
                if (t > 0) val += inv2p * E[i][j - 1][t - 1];
                if (t + 1 <= i + j - 1) val += (t + 1) * E[i][j - 1][t + 1];
                E[i][j][t] = val;
            }
}

struct PairData {
    std::vector<double> H;  // [ncab][nh][npp]
    std::vector<double> p, Px, Py, Pz;
    int la, lb, L, ncab, nh, npp;
};

void cart_list(int l, int comp[15][3]) {
    int k = 0;
    for (int a = 0; a <= l; ++a)
        for (int b = 0; b <= a; ++b) {
            comp[k][0] = l - a;
            comp[k][1] = a - b;
            comp[k][2] = b;
            ++k;
        }
}

// prim_eps > 0 drops primitive pairs whose Gaussian overlap prefactor
// |ca*cb|*exp(-mu*|AB|^2) falls below prim_eps * (pair maximum) — the
// dominant saving for heavily contracted (ANO-style) shells on distant
// centers, where most cross-primitive products are numerically zero.
void build_pair(int la, int npa, const double* ea, const double* ca,
                const double* A, int lb, int npb, const double* eb,
                const double* cb, const double* B, PairData& out,
                double prim_eps = 0.0) {
    int L = la + lb;
    out.la = la;
    out.lb = lb;
    out.L = L;
    out.ncab = ncart(la) * ncart(lb);
    const HermTab& HT = g_herm[L];
    out.nh = HT.n;
    double ABd[3] = {A[0] - B[0], A[1] - B[1], A[2] - B[2]};
    double AB2 = ABd[0] * ABd[0] + ABd[1] * ABd[1] + ABd[2] * ABd[2];
    // select surviving primitive pairs
    std::vector<int> keep_i, keep_j;
    {
        double wmax = 0.0;
        std::vector<double> w((size_t)npa * npb);
        int pp = 0;
        for (int ip = 0; ip < npa; ++ip)
            for (int jp = 0; jp < npb; ++jp, ++pp) {
                double a = ea[ip], b = eb[jp];
                double mu = a * b / (a + b);
                w[pp] = std::fabs(ca[ip] * cb[jp]) * std::exp(-mu * AB2);
                if (w[pp] > wmax) wmax = w[pp];
            }
        double cut = prim_eps * wmax;
        pp = 0;
        for (int ip = 0; ip < npa; ++ip)
            for (int jp = 0; jp < npb; ++jp, ++pp)
                if (w[pp] > cut || prim_eps <= 0.0) {
                    keep_i.push_back(ip);
                    keep_j.push_back(jp);
                }
    }
    out.npp = (int)keep_i.size();
    out.H.assign((size_t)out.ncab * out.nh * out.npp, 0.0);
    out.p.resize(out.npp);
    out.Px.resize(out.npp);
    out.Py.resize(out.npp);
    out.Pz.resize(out.npp);
    int ia_[15][3], ib_[15][3];
    cart_list(la, ia_);
    cart_list(lb, ib_);
    int nca = ncart(la), ncb = ncart(lb);
    double Ex[LMAX + 1][LMAX + 1][2 * LMAX + 1];
    double Ey[LMAX + 1][LMAX + 1][2 * LMAX + 1];
    double Ez[LMAX + 1][LMAX + 1][2 * LMAX + 1];
    for (int pp = 0; pp < out.npp; ++pp) {
        int ip = keep_i[pp], jp = keep_j[pp];
        double a = ea[ip], b = eb[jp], cc = ca[ip] * cb[jp];
        double p = a + b;
        out.p[pp] = p;
        out.Px[pp] = (a * A[0] + b * B[0]) / p;
        out.Py[pp] = (a * A[1] + b * B[1]) / p;
        out.Pz[pp] = (a * A[2] + b * B[2]) / p;
        e_coeffs(la, lb, a, b, ABd[0], Ex);
        e_coeffs(la, lb, a, b, ABd[1], Ey);
        e_coeffs(la, lb, a, b, ABd[2], Ez);
        for (int x = 0; x < nca; ++x)
            for (int y = 0; y < ncb; ++y) {
                int row = x * ncb + y;
                int ix = ia_[x][0], iy = ia_[x][1], iz = ia_[x][2];
                int jx = ib_[y][0], jy = ib_[y][1], jz = ib_[y][2];
                for (int h = 0; h < HT.n; ++h) {
                    int t = HT.t[h], u = HT.u[h], v = HT.v[h];
                    if (t > ix + jx || u > iy + jy || v > iz + jz) continue;
                    out.H[((size_t)row * HT.n + h) * out.npp + pp] =
                        cc * Ex[ix][jx][t] * Ey[iy][jy][u] * Ez[iz][jz][v];
                }
            }
    }
}

void hermite_R(int L, double alpha, double X, double Y, double Z, double* R);

// Upper bound on the Cauchy-Schwarz factor sqrt(max_ab (ab|ab)) for one
// shell pair: triangle inequality over primitive pairs (the (.|.) Coulomb
// self-repulsion is an inner product), each primitive-pair diagonal
// needing only one zero-distance Hermite table — O(npp) instead of the
// O(npp^2) full quartet.  Overestimates, so screening stays safe.
double pair_schwarz(const PairData& P) {
    const HermTab& HB = g_herm[P.L];
    const HermTab& HT = g_herm[2 * P.L];
    std::vector<double> R(HT.n);
    double total = 0.0;
    for (int pp = 0; pp < P.npp; ++pp) {
        double p = P.p[pp];
        double pref = 2.0 * std::pow(M_PI, 2.5) / (p * p * std::sqrt(2.0 * p));
        hermite_R(2 * P.L, 0.5 * p, 0.0, 0.0, 0.0, R.data());
        double m = 0.0;
        for (int ab = 0; ab < P.ncab; ++ab) {
            double acc = 0.0;
            for (int hb = 0; hb < HB.n; ++hb) {
                double w1 = P.H[((size_t)ab * HB.n + hb) * P.npp + pp];
                if (w1 == 0.0) continue;
                for (int hk = 0; hk < HB.n; ++hk) {
                    double w2 = P.H[((size_t)ab * HB.n + hk) * P.npp + pp];
                    if (w2 == 0.0) continue;
                    double sgn =
                        ((HB.t[hk] + HB.u[hk] + HB.v[hk]) % 2) ? -1.0 : 1.0;
                    acc += w1 * w2 * sgn *
                           R[HT.idx[HB.t[hb] + HB.t[hk]][HB.u[hb] + HB.u[hk]]
                                   [HB.v[hb] + HB.v[hk]]];
                }
            }
            m = std::max(m, std::fabs(acc));
        }
        total += std::sqrt(std::max(0.0, m * pref));
    }
    return total;
}

void hermite_R(int L, double alpha, double X, double Y, double Z, double* R) {
    const HermTab& HT = g_herm[L];
    double F[LQMAX + 1];
    boys(L, alpha * (X * X + Y * Y + Z * Z), F);
    static thread_local std::vector<double> buf;
    buf.assign((size_t)(L + 1) * HT.n, 0.0);
    auto Rn = [&](int m, int h) -> double& { return buf[(size_t)m * HT.n + h]; };
    double pw = 1.0;
    for (int m = 0; m <= L; ++m) {
        Rn(m, 0) = pw * F[m];
        pw *= -2.0 * alpha;
    }
    for (int deg = 1; deg <= L; ++deg)
        for (int m = 0; m <= L - deg; ++m)
            for (int h = 0; h < HT.n; ++h) {
                int t = HT.t[h], u = HT.u[h], v = HT.v[h];
                if (t + u + v != deg) continue;
                double val;
                if (t > 0) {
                    val = X * Rn(m + 1, HT.idx[t - 1][u][v]);
                    if (t > 1) val += (t - 1) * Rn(m + 1, HT.idx[t - 2][u][v]);
                } else if (u > 0) {
                    val = Y * Rn(m + 1, HT.idx[t][u - 1][v]);
                    if (u > 1) val += (u - 1) * Rn(m + 1, HT.idx[t][u - 2][v]);
                } else {
                    val = Z * Rn(m + 1, HT.idx[t][u][v - 1]);
                    if (v > 1) val += (v - 1) * Rn(m + 1, HT.idx[t][u][v - 2]);
                }
                Rn(m, h) = val;
            }
    for (int h = 0; h < HT.n; ++h) R[h] = Rn(0, h);
}

// contracted Cartesian quartet (ab|cd): out[ncab * nccd].
// omega > 0 computes erf(omega*r12)/r12 attenuated integrals: the
// attenuation rescales the Hermite Coulomb argument alpha ->
// alpha*theta with theta = omega^2/(alpha+omega^2) and an overall
// sqrt(theta) factor (same convention as ints/two_electron._coulomb_R).
void quartet(const PairData& P, const PairData& Q, double* out,
             double omega = 0.0) {
    int L = P.L + Q.L;
    const HermTab& HB = g_herm[P.L];
    const HermTab& HK = g_herm[Q.L];
    const HermTab& HT = g_herm[L];
    int nhb = HB.n, nhk = HK.n;
    static thread_local std::vector<double> Rbuf, M, tmp;
    Rbuf.resize(HT.n);
    M.resize((size_t)nhb * nhk);
    tmp.assign((size_t)P.npp * nhb * Q.ncab, 0.0);
    // precompute combined-index map and ket parity sign
    static thread_local std::vector<int> cmap;
    static thread_local std::vector<double> ksign;
    cmap.resize((size_t)nhb * nhk);
    ksign.resize(nhk);
    for (int hk = 0; hk < nhk; ++hk)
        ksign[hk] = ((HK.t[hk] + HK.u[hk] + HK.v[hk]) % 2) ? -1.0 : 1.0;
    for (int hb = 0; hb < nhb; ++hb)
        for (int hk = 0; hk < nhk; ++hk)
            cmap[(size_t)hb * nhk + hk] =
                HT.idx[HB.t[hb] + HK.t[hk]][HB.u[hb] + HK.u[hk]]
                      [HB.v[hb] + HK.v[hk]];
    for (int pp = 0; pp < P.npp; ++pp) {
        double p = P.p[pp];
        double* tpp = &tmp[(size_t)pp * nhb * Q.ncab];
        for (int qq = 0; qq < Q.npp; ++qq) {
            double q = Q.p[qq];
            double alpha = p * q / (p + q);
            double pref = 2.0 * std::pow(M_PI, 2.5) / (p * q * std::sqrt(p + q));
            if (omega > 0.0) {
                double theta = omega * omega / (alpha + omega * omega);
                alpha *= theta;
                pref *= std::sqrt(theta);
            }
            hermite_R(L, alpha, P.Px[pp] - Q.Px[qq], P.Py[pp] - Q.Py[qq],
                      P.Pz[pp] - Q.Pz[qq], Rbuf.data());
            for (int hb = 0; hb < nhb; ++hb)
                for (int hk = 0; hk < nhk; ++hk)
                    M[(size_t)hb * nhk + hk] =
                        pref * ksign[hk] * Rbuf[cmap[(size_t)hb * nhk + hk]];
            // tpp[hb][cd] += sum_hk M[hb][hk] * Hk[cd][hk][qq]
            for (int hb = 0; hb < nhb; ++hb) {
                const double* Mrow = &M[(size_t)hb * nhk];
                double* trow = &tpp[(size_t)hb * Q.ncab];
                for (int cd = 0; cd < Q.ncab; ++cd) {
                    const double* Hk = &Q.H[((size_t)cd * nhk) * Q.npp + qq];
                    double acc = 0.0;
                    for (int hk = 0; hk < nhk; ++hk)
                        acc += Mrow[hk] * Hk[(size_t)hk * Q.npp];
                    trow[cd] += acc;
                }
            }
        }
    }
    // out[ab][cd] = sum_pp sum_hb Hb[ab][hb][pp] * tmp[pp][hb][cd]
    std::memset(out, 0, sizeof(double) * (size_t)P.ncab * Q.ncab);
    for (int pp = 0; pp < P.npp; ++pp) {
        const double* tpp = &tmp[(size_t)pp * nhb * Q.ncab];
        for (int ab = 0; ab < P.ncab; ++ab) {
            const double* Hb = &P.H[((size_t)ab * nhb) * P.npp + pp];
            double* orow = &out[(size_t)ab * Q.ncab];
            for (int hb = 0; hb < nhb; ++hb) {
                double w = Hb[(size_t)hb * P.npp];
                if (w == 0.0) continue;
                const double* trow = &tpp[(size_t)hb * Q.ncab];
                for (int cd = 0; cd < Q.ncab; ++cd) orow[cd] += w * trow[cd];
            }
        }
    }
}

// cart->sph transform of a quartet block
void sph4(const double* blk, int la, int lb, int lc, int ld,
          const double* const* c2s, double* out) {
    int nca = ncart(la), ncb = ncart(lb), ncc = ncart(lc), ncd = ncart(ld);
    int sa = nsph(la), sb = nsph(lb), sc = nsph(lc), sd = nsph(ld);
    static thread_local std::vector<double> t1, t2;
    t1.assign((size_t)sa * ncb * ncc * ncd, 0.0);
    // contract index a
    for (int a = 0; a < nca; ++a)
        for (int i = 0; i < sa; ++i) {
            double w = c2s[la][(size_t)a * sa + i];
            if (w == 0.0) continue;
            const double* src = &blk[(size_t)a * ncb * ncc * ncd];
            double* dst = &t1[(size_t)i * ncb * ncc * ncd];
            for (int r = 0; r < ncb * ncc * ncd; ++r) dst[r] += w * src[r];
        }
    t2.assign((size_t)sa * sb * ncc * ncd, 0.0);
    for (int i = 0; i < sa; ++i)
        for (int b = 0; b < ncb; ++b)
            for (int j = 0; j < sb; ++j) {
                double w = c2s[lb][(size_t)b * sb + j];
                if (w == 0.0) continue;
                const double* src = &t1[((size_t)i * ncb + b) * ncc * ncd];
                double* dst = &t2[((size_t)i * sb + j) * ncc * ncd];
                for (int r = 0; r < ncc * ncd; ++r) dst[r] += w * src[r];
            }
    t1.assign((size_t)sa * sb * sc * ncd, 0.0);
    for (int ij = 0; ij < sa * sb; ++ij)
        for (int c = 0; c < ncc; ++c)
            for (int k = 0; k < sc; ++k) {
                double w = c2s[lc][(size_t)c * sc + k];
                if (w == 0.0) continue;
                const double* src = &t2[((size_t)ij * ncc + c) * ncd];
                double* dst = &t1[((size_t)ij * sc + k) * ncd];
                for (int r = 0; r < ncd; ++r) dst[r] += w * src[r];
            }
    std::memset(out, 0, sizeof(double) * (size_t)sa * sb * sc * sd);
    for (int ijk = 0; ijk < sa * sb * sc; ++ijk)
        for (int d = 0; d < ncd; ++d) {
            double v = t1[(size_t)ijk * ncd + d];
            if (v == 0.0) continue;
            const double* w = &c2s[ld][(size_t)d * sd];
            double* dst = &out[(size_t)ijk * sd];
            for (int l2 = 0; l2 < sd; ++l2) dst[l2] += v * w[l2];
        }
}

struct ShellArr {
    int nsh;
    const int* ls;
    const int* nprim;
    const int* prim_off;
    const double* exps;
    const double* coefs;
    const double* centers;  // (nsh, 3)
    const int* ao_off;
};

}  // namespace

extern "C" {

// out: (nao, nao, nao, nao) chemists' (ij|kl); c2s_flat: concatenated
// cart2sph matrices for l = 0..LMAX with offsets c2s_off.
void md_eri_full(int nsh, const int* ls, const int* nprim, const int* prim_off,
                 const double* exps, const double* coefs,
                 const double* centers, const int* ao_off, int nao,
                 const double* c2s_flat, const long* c2s_off, double* out,
                 double omega, double prim_eps, double schwarz_eps) {
    init_tables();
    const double* c2s[LMAX + 1];
    for (int l = 0; l <= LMAX; ++l) c2s[l] = c2s_flat + c2s_off[l];
    // ordered unique pairs i >= j
    std::vector<std::pair<int, int>> pairs;
    for (int i = 0; i < nsh; ++i)
        for (int j = 0; j <= i; ++j) pairs.push_back({i, j});
    int np = (int)pairs.size();
    std::vector<PairData> pd(np);
    std::vector<double> Q(np, 1.0);
    for (int a = 0; a < np; ++a) {
        auto [i, j] = pairs[a];
        build_pair(ls[i], nprim[i], exps + prim_off[i], coefs + prim_off[i],
                   centers + 3 * i, ls[j], nprim[j], exps + prim_off[j],
                   coefs + prim_off[j], centers + 3 * j, pd[a], prim_eps);
        if (schwarz_eps > 0.0) Q[a] = pair_schwarz(pd[a]);
    }
    // flatten (a, c<=a) products for parallelism
    std::vector<std::pair<int, int>> prods;
    for (int a = 0; a < np; ++a)
        for (int c = 0; c <= a; ++c)
            if (schwarz_eps <= 0.0 || Q[a] * Q[c] > schwarz_eps)
                prods.push_back({a, c});
#pragma omp parallel
    {
        std::vector<double> blk(15 * 15 * 15 * 15), sblk(9 * 9 * 9 * 9);
#pragma omp for schedule(dynamic, 8)
        for (long w = 0; w < (long)prods.size(); ++w) {
            auto [a, c] = prods[w];
            auto [i, j] = pairs[a];
            auto [k, l] = pairs[c];
            quartet(pd[a], pd[c], blk.data(), omega);
            sph4(blk.data(), ls[i], ls[j], ls[k], ls[l], c2s, sblk.data());
            int si = nsph(ls[i]), sj = nsph(ls[j]), sk = nsph(ls[k]),
                sl2 = nsph(ls[l]);
            int oi = ao_off[i], oj = ao_off[j], ok = ao_off[k], ol = ao_off[l];
            for (int x = 0; x < si; ++x)
                for (int y = 0; y < sj; ++y)
                    for (int z = 0; z < sk; ++z)
                        for (int u = 0; u < sl2; ++u) {
                            double v =
                                sblk[(((size_t)x * sj + y) * sk + z) * sl2 + u];
                            size_t I = oi + x, J = oj + y, K = ok + z,
                                   Lu = ol + u;
                            size_t n = nao;
                            out[((I * n + J) * n + K) * n + Lu] = v;
                            out[((J * n + I) * n + K) * n + Lu] = v;
                            out[((I * n + J) * n + Lu) * n + K] = v;
                            out[((J * n + I) * n + Lu) * n + K] = v;
                            out[((K * n + Lu) * n + I) * n + J] = v;
                            out[((Lu * n + K) * n + I) * n + J] = v;
                            out[((K * n + Lu) * n + J) * n + I] = v;
                            out[((Lu * n + K) * n + J) * n + I] = v;
                        }
        }
    }
}

// 3-center (P|mu nu): out (naux, nao, nao); the aux shells are paired with
// a unit s function internally.
void md_eri_3c(int nsh, const int* ls, const int* nprim, const int* prim_off,
               const double* exps, const double* coefs, const double* centers,
               const int* ao_off, int nao, int nsh_aux, const int* ls_x,
               const int* nprim_x, const int* prim_off_x, const double* exps_x,
               const double* coefs_x, const double* centers_x,
               const int* ao_off_x, int naux, const double* c2s_flat,
               const long* c2s_off, double* out, double omega,
               double prim_eps, double schwarz_eps) {
    init_tables();
    const double* c2s[LMAX + 1];
    for (int l = 0; l <= LMAX; ++l) c2s[l] = c2s_flat + c2s_off[l];
    // aux pairs: (aux shell, unity)
    std::vector<PairData> aux(nsh_aux);
    std::vector<double> Qx(nsh_aux, 1.0);
    double qx_max = 1.0;
    double unit_e = 0.0, unit_c = 1.0, origin[3];
    for (int x = 0; x < nsh_aux; ++x) {
        origin[0] = centers_x[3 * x];
        origin[1] = centers_x[3 * x + 1];
        origin[2] = centers_x[3 * x + 2];
        build_pair(ls_x[x], nprim_x[x], exps_x + prim_off_x[x],
                   coefs_x + prim_off_x[x], centers_x + 3 * x, 0, 1, &unit_e,
                   &unit_c, origin, aux[x]);
        if (schwarz_eps > 0.0) Qx[x] = pair_schwarz(aux[x]);
    }
    if (schwarz_eps > 0.0) {
        qx_max = 0.0;
        for (int x = 0; x < nsh_aux; ++x) qx_max = std::max(qx_max, Qx[x]);
    }
    std::vector<std::pair<int, int>> pairs;
    for (int i = 0; i < nsh; ++i)
        for (int j = 0; j <= i; ++j) pairs.push_back({i, j});
#pragma omp parallel
    {
        std::vector<double> blk(15 * 15 * 15), sblk(9 * 9 * 9);
        std::vector<PairData> pd(1);
#pragma omp for schedule(dynamic, 4)
        for (long w = 0; w < (long)pairs.size(); ++w) {
            auto [i, j] = pairs[w];
            build_pair(ls[i], nprim[i], exps + prim_off[i],
                       coefs + prim_off[i], centers + 3 * i, ls[j], nprim[j],
                       exps + prim_off[j], coefs + prim_off[j],
                       centers + 3 * j, pd[0], prim_eps);
            double qij = 1.0;
            if (schwarz_eps > 0.0) {
                qij = pair_schwarz(pd[0]);
                if (qij * qx_max <= schwarz_eps) continue;
            }
            for (int x = 0; x < nsh_aux; ++x) {
                if (schwarz_eps > 0.0 && qij * Qx[x] <= schwarz_eps) continue;
                quartet(aux[x], pd[0], blk.data(), omega);
                // block shape (ncx*1, nca*ncb) -> sph (sx, sa, sb)
                sph4(blk.data(), ls_x[x], 0, ls[i], ls[j], c2s, sblk.data());
                int sx = nsph(ls_x[x]), si = nsph(ls[i]), sj = nsph(ls[j]);
                int ox = ao_off_x[x], oi = ao_off[i], oj = ao_off[j];
                for (int px = 0; px < sx; ++px)
                    for (int y = 0; y < si; ++y)
                        for (int z = 0; z < sj; ++z) {
                            double v = sblk[((size_t)px * si + y) * sj + z];
                            out[((size_t)(ox + px) * nao + oi + y) * nao + oj +
                                z] = v;
                            out[((size_t)(ox + px) * nao + oj + z) * nao + oi +
                                y] = v;
                        }
            }
        }
    }
}

// 2-center Coulomb metric (P|Q): out (naux, naux); each aux shell is
// paired with a unit s function (same trick as md_eri_3c).
void md_eri_2c(int nsh_aux, const int* ls_x, const int* nprim_x,
               const int* prim_off_x, const double* exps_x,
               const double* coefs_x, const double* centers_x,
               const int* ao_off_x, int naux, const double* c2s_flat,
               const long* c2s_off, double* out, double omega) {
    init_tables();
    const double* c2s[LMAX + 1];
    for (int l = 0; l <= LMAX; ++l) c2s[l] = c2s_flat + c2s_off[l];
    std::vector<PairData> aux(nsh_aux);
    double unit_e = 0.0, unit_c = 1.0, origin[3];
    for (int x = 0; x < nsh_aux; ++x) {
        origin[0] = centers_x[3 * x];
        origin[1] = centers_x[3 * x + 1];
        origin[2] = centers_x[3 * x + 2];
        build_pair(ls_x[x], nprim_x[x], exps_x + prim_off_x[x],
                   coefs_x + prim_off_x[x], centers_x + 3 * x, 0, 1, &unit_e,
                   &unit_c, origin, aux[x]);
    }
    std::vector<std::pair<int, int>> pairs;
    for (int i = 0; i < nsh_aux; ++i)
        for (int j = 0; j <= i; ++j) pairs.push_back({i, j});
#pragma omp parallel
    {
        std::vector<double> blk(15 * 15), sblk(9 * 9);
#pragma omp for schedule(dynamic, 8)
        for (long w = 0; w < (long)pairs.size(); ++w) {
            auto [i, j] = pairs[w];
            quartet(aux[i], aux[j], blk.data(), omega);
            sph4(blk.data(), ls_x[i], 0, ls_x[j], 0, c2s, sblk.data());
            int si = nsph(ls_x[i]), sj = nsph(ls_x[j]);
            int oi = ao_off_x[i], oj = ao_off_x[j];
            for (int y = 0; y < si; ++y)
                for (int z = 0; z < sj; ++z) {
                    double v = sblk[(size_t)y * sj + z];
                    out[(size_t)(oi + y) * naux + oj + z] = v;
                    out[(size_t)(oj + z) * naux + oi + y] = v;
                }
        }
    }
}

}  // extern "C"
