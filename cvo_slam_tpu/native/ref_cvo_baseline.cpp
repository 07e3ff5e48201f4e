// Reference-cost CVO baseline: a faithful C++ replica of the reference's
// per-frame registration cost, measured on this host.
//
// The reference (/root/reference/thirdparty/cvo/src/cvo.cpp) publishes no
// throughput number and its timing hooks live only in the unbuilt
// cvo_main.cpp:33,48-54 — so BENCH's vs_baseline had nothing real to anchor
// to. This program re-creates the reference's per-frame work with the same
// CPU idioms it uses (kd-tree radius search rebuilt per iteration over the
// transformed moving cloud, per-pair triplet accumulation, quartic step-size
// solve, per-pair 6x6 Hessian blocks), independently implemented from the
// published math (no code copied), and measures ms/frame for the exact bench
// workload: 2 alignments + 2 innerproduct/Hessian suites per frame on
// ~3000-point clouds (SURVEY.md section 6).
//
// Bias policy: every discretionary choice favors the REFERENCE (leaf-bucketed
// kd-tree, closed-form cubic instead of the reference's companion-matrix
// eigensolve, OpenMP parallel-for standing in for TBB, -O3 -march=native like
// CMakeLists.txt:13-20) so the measured fps is an upper bound on what the
// reference pipeline would do on this host and vs_baseline is conservative.
//
// Input: binary cloud file from tools/measure_reference_baseline.py
//   int32 n_clouds; per cloud: int32 count; count*3 float32 pos;
//   count*5 float32 feat
// Output: one JSON line with ms/frame and align-iteration counts.

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>
#include <array>
#include <algorithm>
#include <chrono>
#ifdef _OPENMP
#include <omp.h>
#endif

using std::size_t;
typedef std::array<float, 3> V3;
typedef std::array<float, 5> F5;

struct Cloud {
    std::vector<V3> p;
    std::vector<F5> f;
    int n() const { return (int)p.size(); }
};

// ---------------------------------------------------------------------------
// small fixed-size linear algebra (double)
// ---------------------------------------------------------------------------
struct M3 { double m[3][3]; };
static M3 eye3() { M3 r{}; r.m[0][0] = r.m[1][1] = r.m[2][2] = 1.0; return r; }
static M3 mul(const M3 &a, const M3 &b) {
    M3 r{};
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int k = 0; k < 3; ++k) s += a.m[i][k] * b.m[k][j];
            r.m[i][j] = s;
        }
    return r;
}
static std::array<double, 3> mulv(const M3 &a, const std::array<double, 3> &v) {
    std::array<double, 3> r{};
    for (int i = 0; i < 3; ++i)
        r[i] = a.m[i][0] * v[0] + a.m[i][1] * v[1] + a.m[i][2] * v[2];
    return r;
}
static M3 skew(const std::array<double, 3> &w) {
    M3 r{};
    r.m[0][1] = -w[2]; r.m[0][2] = w[1];
    r.m[1][0] = w[2];  r.m[1][2] = -w[0];
    r.m[2][0] = -w[1]; r.m[2][1] = w[0];
    return r;
}

// The reference stores R, T, omega, v as FLOATS (cvo.hpp:122-126) with
// double accumulation only inside the reductions (cvo.cpp:194-235). The
// replica mirrors that: double accumulators, float state — this reproduces
// the reference's float stopping behavior (the f64 variant grinds ~2x the
// iterations resolving sub-float updates near convergence).
static void round_m3(M3 &m) {
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) m.m[i][j] = (float)m.m[i][j];
}
static void round_v3(std::array<double, 3> &v) {
    for (int i = 0; i < 3; ++i) v[i] = (float)v[i];
}

// SE(3) exponential of dt * [omega, v] (LieGroup.cpp Exp_SEK3 semantics:
// closed-form Rodrigues for R and the V-matrix for the translation part).
static void exp_se3(const std::array<double, 3> &om,
                    const std::array<double, 3> &vv, double dt,
                    M3 &R, std::array<double, 3> &t) {
    std::array<double, 3> w = {om[0] * dt, om[1] * dt, om[2] * dt};
    std::array<double, 3> u = {vv[0] * dt, vv[1] * dt, vv[2] * dt};
    double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
    double th = std::sqrt(th2);
    M3 W = skew(w), W2 = mul(W, W);
    double A, B, C;
    if (th < 1e-8) { A = 1.0; B = 0.5; C = 1.0 / 6.0; }
    else {
        A = std::sin(th) / th;
        B = (1.0 - std::cos(th)) / th2;
        C = (1.0 - A) / th2;
    }
    R = eye3();
    M3 V = eye3();
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
            R.m[i][j] += A * W.m[i][j] + B * W2.m[i][j];
            V.m[i][j] += B * W.m[i][j] + C * W2.m[i][j];
        }
    t = mulv(V, u);
}

// || log(T) || for the small-increment stop test (cvo.cpp:804 dist_se3).
static double dist_se3(const M3 &R, const std::array<double, 3> &t) {
    double tr = R.m[0][0] + R.m[1][1] + R.m[2][2];
    double c = std::min(1.0, std::max(-1.0, (tr - 1.0) * 0.5));
    double th = std::acos(c);
    std::array<double, 3> w{};
    if (th > 1e-10) {
        double s = th / (2.0 * std::sin(th));
        w = {s * (R.m[2][1] - R.m[1][2]), s * (R.m[0][2] - R.m[2][0]),
             s * (R.m[1][0] - R.m[0][1])};
    }
    double th2 = th * th;
    M3 W = skew(w), W2 = mul(W, W);
    double Bc;  // V^{-1} = I - W/2 + (1/th^2)(1 - A/(2B)) W^2
    if (th < 1e-8) Bc = 1.0 / 12.0;
    else {
        double A = std::sin(th) / th, B = (1.0 - std::cos(th)) / th2;
        Bc = (1.0 / th2) * (1.0 - A / (2.0 * B));
    }
    M3 Vi = eye3();
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j)
            Vi.m[i][j] += -0.5 * W.m[i][j] + Bc * W2.m[i][j];
    std::array<double, 3> u = mulv(Vi, t);
    // Frobenius norm of the 4x4 matrix log (cvo.cpp:94-104): the skew block
    // contributes |w|^2 twice
    return std::sqrt(2.0 * (w[0] * w[0] + w[1] * w[1] + w[2] * w[2])
                     + u[0] * u[0] + u[1] * u[1] + u[2] * u[2]);
}

// ---------------------------------------------------------------------------
// kd-tree with leaf buckets (the reference uses nanoflann; this is the same
// classic structure, independently implemented)
// ---------------------------------------------------------------------------
struct KDTree {
    struct Node { int axis; float split; int lo, hi; int left, right; };
    std::vector<Node> nodes;
    std::vector<int> idx;
    const std::vector<V3> *pts;
    static const int LEAF = 16;

    void build(const std::vector<V3> &p) {
        pts = &p;
        idx.resize(p.size());
        for (size_t i = 0; i < p.size(); ++i) idx[i] = (int)i;
        nodes.clear();
        nodes.reserve(2 * p.size() / LEAF + 4);
        build_rec(0, (int)p.size());
    }
    int build_rec(int lo, int hi) {
        int id = (int)nodes.size();
        nodes.push_back({});
        Node &n0 = nodes[id];
        n0.lo = lo; n0.hi = hi; n0.left = n0.right = -1;
        if (hi - lo <= LEAF) return id;
        // split on widest axis at the median
        float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
        for (int i = lo; i < hi; ++i)
            for (int a = 0; a < 3; ++a) {
                float v = (*pts)[idx[i]][a];
                mn[a] = std::min(mn[a], v); mx[a] = std::max(mx[a], v);
            }
        int axis = 0;
        for (int a = 1; a < 3; ++a)
            if (mx[a] - mn[a] > mx[axis] - mn[axis]) axis = a;
        int mid = (lo + hi) / 2;
        std::nth_element(idx.begin() + lo, idx.begin() + mid,
                         idx.begin() + hi,
                         [&](int a, int b) {
                             return (*pts)[a][axis] < (*pts)[b][axis];
                         });
        float split = (*pts)[idx[mid]][axis];
        int l = build_rec(lo, mid);
        int r = build_rec(mid, hi);
        nodes[id].axis = axis; nodes[id].split = split;
        nodes[id].left = l; nodes[id].right = r;
        return id;
    }
    // radius query: out gets (index, squared distance)
    void radius(const V3 &q, float r2,
                std::vector<std::pair<int, float>> &out) const {
        radius_rec(0, q, r2, out);
    }
    void radius_rec(int id, const V3 &q, float r2,
                    std::vector<std::pair<int, float>> &out) const {
        const Node &n = nodes[id];
        if (n.left < 0) {
            for (int i = n.lo; i < n.hi; ++i) {
                const V3 &p = (*pts)[idx[i]];
                float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
                float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < r2) out.push_back({idx[i], d2});
            }
            return;
        }
        float d = q[n.axis] - n.split;
        int near = d < 0 ? n.left : n.right;
        int far = d < 0 ? n.right : n.left;
        radius_rec(near, q, r2, out);
        if (d * d < r2) radius_rec(far, q, r2, out);
    }
};

// ---------------------------------------------------------------------------
// CVO params (cvo.cpp:18-71)
// ---------------------------------------------------------------------------
static const double ELL_INIT = 0.15, SIGMA = 0.1, SP_THRES = 8e-3;
static const double C_SC = 7.0, D_SC = 7.0, C_ELL = 200.0, C_SIGMA = 1.0;
static const int MAX_ITER = 2000;
static const double MIN_STEP = 0.2, MAX_STEP = 0.8;
static const double EPS = 5e-5, EPS_2 = 1e-5;

static double d2_thres(double ell) {
    return -2.0 * ell * ell * std::log(SP_THRES / (SIGMA * SIGMA));
}
static double d2c_thres() {
    return -2.0 * C_ELL * C_ELL * std::log(SP_THRES / (C_SIGMA * C_SIGMA));
}

struct Triplet { int i, j; float a; };

// se_kernel (cvo.cpp:122-184): kd-tree radius search per fixed point,
// geometric * color kernel, sparsification test.
static void se_kernel(const Cloud &fx, const std::vector<V3> &yt,
                      const Cloud &fy, const KDTree &tree, double ell,
                      std::vector<std::vector<Triplet>> &per_thread) {
    double r2 = d2_thres(ell);
    double cthr = d2c_thres();
    double s2 = SIGMA * SIGMA, cs2 = C_SIGMA * C_SIGMA;
    double gk = 1.0 / (2.0 * ell * ell), ck = 1.0 / (2.0 * C_ELL * C_ELL);
    int N = fx.n();
#pragma omp parallel
    {
#ifdef _OPENMP
        int tid = omp_get_thread_num();
#else
        int tid = 0;
#endif
        std::vector<Triplet> &out = per_thread[tid];
        std::vector<std::pair<int, float>> nb;
#pragma omp for schedule(dynamic, 64)
        for (int i = 0; i < N; ++i) {
            nb.clear();
            tree.radius(fx.p[i], (float)r2, nb);
            for (auto &pr : nb) {
                int j = pr.first;
                double d2c = 0;
                for (int k = 0; k < 5; ++k) {
                    double d = fx.f[i][k] - fy.f[j][k];
                    d2c += d * d;
                }
                if (d2c >= cthr) continue;
                double a = s2 * std::exp(-pr.second * gk)
                         * cs2 * std::exp(-d2c * ck);
                if (a > SP_THRES) out.push_back({i, j, (float)a});
            }
        }
    }
}

// smallest positive real root of 4E s^3 + 3D s^2 + 2C s + B (the quartic
// step derivative, cvo.cpp:239-334) — closed form instead of the reference's
// companion-matrix eigensolve (faster: biases the baseline upward).
static double min_pos_root(double B, double C, double D, double E) {
    double a = 4.0 * E, b = 3.0 * D, c = 2.0 * C, d = B;
    double best = 1e30;
    auto consider = [&](double s) { if (s > 0 && s < best) best = s; };
    if (std::fabs(a) < 1e-30) {
        if (std::fabs(b) > 1e-30) {
            double disc = c * c - 4.0 * b * d;
            if (disc >= 0) {
                double r = std::sqrt(disc);
                consider((-c + r) / (2.0 * b));
                consider((-c - r) / (2.0 * b));
            }
        } else if (std::fabs(c) > 1e-30) {
            consider(-d / c);
        }
    } else {
        // depressed cubic t^3 + pt + q, s = t - b/(3a)
        double p = (3.0 * a * c - b * b) / (3.0 * a * a);
        double q = (2.0 * b * b * b - 9.0 * a * b * c + 27.0 * a * a * d)
                 / (27.0 * a * a * a);
        double sh = -b / (3.0 * a);
        double disc = q * q / 4.0 + p * p * p / 27.0;
        if (disc > 0) {
            double r = std::sqrt(disc);
            double u = std::cbrt(-q / 2.0 + r), v = std::cbrt(-q / 2.0 - r);
            consider(u + v + sh);
        } else {
            double rr = std::sqrt(-p * p * p / 27.0);
            double phi = std::acos(std::min(1.0, std::max(-1.0,
                                   -q / (2.0 * rr))));
            double m = 2.0 * std::cbrt(rr);
            for (int k = 0; k < 3; ++k)
                consider(m * std::cos((phi + 2.0 * M_PI * k) / 3.0) + sh);
        }
    }
    if (best > 1e29) return MIN_STEP;       // no positive root (cvo.cpp:330)
    return std::min(best, MAX_STEP);        // clamp from above (cvo.cpp:333)
}

struct AlignOut { M3 R; std::array<double, 3> T; int iters; size_t nnz; };

static AlignOut align(const Cloud &fixed, const Cloud &moving, int n_threads,
                      const M3 *R0 = nullptr,
                      const std::array<double, 3> *T0 = nullptr) {
    // optional warm start (the tracker's reset_initial chain,
    // local_tracker.cpp:406-415; bench.py's frame_step does the same)
    M3 R = R0 ? *R0 : eye3();
    std::array<double, 3> T = T0 ? *T0 : std::array<double, 3>{0, 0, 0};
    double ell = ELL_INIT;
    int M = moving.n();
    std::vector<V3> yt(M);
    std::vector<std::vector<Triplet>> per_thread(n_threads);
    KDTree tree;
    AlignOut out; out.iters = MAX_ITER; out.nnz = 0;
    std::vector<V3> xiz(M), xi2z(M), xi3z(M), xi4z(M);

    for (int k = 0; k < MAX_ITER; ++k) {
        // update_tf + transform_pcd: y = R^T y0 - R^T T  -> y = y0 @ R + Tt
        double Tt[3] = {-(R.m[0][0] * T[0] + R.m[1][0] * T[1] + R.m[2][0] * T[2]),
                        -(R.m[0][1] * T[0] + R.m[1][1] * T[1] + R.m[2][1] * T[2]),
                        -(R.m[0][2] * T[0] + R.m[1][2] * T[1] + R.m[2][2] * T[2])};
#pragma omp parallel for schedule(static)
        for (int j = 0; j < M; ++j) {
            const V3 &y0 = moving.p[j];
            for (int a = 0; a < 3; ++a)
                yt[j][a] = (float)(y0[0] * R.m[0][a] + y0[1] * R.m[1][a]
                                   + y0[2] * R.m[2][a] + Tt[a]);
        }
        // kd-tree rebuilt over the transformed cloud every iteration — the
        // reference's se_kernel cost structure
        tree.build(yt);
        for (auto &v : per_thread) v.clear();
        se_kernel(fixed, yt, moving, tree, ell, per_thread);

        // compute_flow (cvo.cpp:187-236)
        double om[3] = {0, 0, 0}, vv[3] = {0, 0, 0};
        size_t nnz = 0;
        for (auto &tv : per_thread) {
            nnz += tv.size();
            for (const Triplet &t : tv) {
                const V3 &x = fixed.p[t.i];
                const V3 &y = yt[t.j];
                om[0] += t.a * ((double)x[1] * y[2] - (double)x[2] * y[1]);
                om[1] += t.a * ((double)x[2] * y[0] - (double)x[0] * y[2]);
                om[2] += t.a * ((double)x[0] * y[1] - (double)x[1] * y[0]);
                vv[0] += t.a * (y[0] - x[0]);
                vv[1] += t.a * (y[1] - x[1]);
                vv[2] += t.a * (y[2] - x[2]);
            }
        }
        out.nnz = nnz;
        std::array<double, 3> omega = {om[0] / C_SC, om[1] / C_SC, om[2] / C_SC};
        std::array<double, 3> v = {vv[0] / D_SC, vv[1] / D_SC, vv[2] / D_SC};
        round_v3(omega);
        round_v3(v);
        double no = std::sqrt(omega[0] * omega[0] + omega[1] * omega[1]
                              + omega[2] * omega[2]);
        double nv = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
        if (no < EPS && nv < EPS) { out.iters = k; break; }

        // compute_step_size (cvo.cpp:239-334): per-point xi powers, per-pair
        // Taylor coefficients
        M3 W = skew(omega), W2 = mul(W, W), W3 = mul(W2, W), W4 = mul(W3, W);
        std::array<double, 3> Wv = mulv(W, v), W2v = mulv(W2, v),
                              W3v = mulv(W3, v);
#pragma omp parallel for schedule(static)
        for (int j = 0; j < M; ++j) {
            std::array<double, 3> y = {yt[j][0], yt[j][1], yt[j][2]};
            std::array<double, 3> a1 = mulv(W, y), a2 = mulv(W2, y),
                                  a3 = mulv(W3, y), a4 = mulv(W4, y);
            for (int a = 0; a < 3; ++a) {
                xiz[j][a] = (float)(a1[a] + v[a]);
                xi2z[j][a] = (float)(a2[a] + Wv[a]);
                xi3z[j][a] = (float)(a3[a] + W2v[a]);
                xi4z[j][a] = (float)(a4[a] + W3v[a]);
            }
        }
        double tc = 1.0 / (2.0 * ell * ell);
        double B = 0, Cc = 0, D = 0, E = 0;
#pragma omp parallel reduction(+:B, Cc, D, E)
        {
#ifdef _OPENMP
            int tid = omp_get_thread_num();
#else
            int tid = 0;
#endif
            for (const Triplet &t : per_thread[tid]) {
                const V3 &x = fixed.p[t.i];
                const V3 &y = yt[t.j];
                double dxy[3] = {x[0] - y[0], x[1] - y[1], x[2] - y[2]};
                const V3 &z1 = xiz[t.j];
                const V3 &z2 = xi2z[t.j];
                const V3 &z3 = xi3z[t.j];
                const V3 &z4 = xi4z[t.j];
                double d1 = z1[0] * dxy[0] + z1[1] * dxy[1] + z1[2] * dxy[2];
                double d2 = z2[0] * dxy[0] + z2[1] * dxy[1] + z2[2] * dxy[2];
                double d3 = z3[0] * dxy[0] + z3[1] * dxy[1] + z3[2] * dxy[2];
                double d4 = z4[0] * dxy[0] + z4[1] * dxy[1] + z4[2] * dxy[2];
                double n1 = z1[0] * z1[0] + z1[1] * z1[1] + z1[2] * z1[2];
                double z12 = z1[0] * z2[0] + z1[1] * z2[1] + z1[2] * z2[2];
                double n2 = z2[0] * z2[0] + z2[1] * z2[1] + z2[2] * z2[2];
                double z13 = z1[0] * z3[0] + z1[1] * z3[1] + z1[2] * z3[2];
                double beta = -2.0 * tc * d1;
                double gamma = -tc * (n1 + 2.0 * d2);
                double delta = 2.0 * tc * (-z12 - d3);
                double epsil = -tc * (n2 + 2.0 * z13 + 2.0 * d4);
                double b2 = beta * beta;
                B += t.a * beta;
                Cc += t.a * (gamma + 0.5 * b2);
                D += t.a * (delta + beta * gamma + b2 * beta / 6.0);
                E += t.a * (epsil + beta * delta + 0.5 * b2 * gamma
                            + 0.5 * gamma * gamma + b2 * b2 / 24.0);
            }
        }
        double step = min_pos_root(B, Cc, D, E);
        if (std::getenv("CVO_DBG"))
            std::fprintf(stderr, "%d |om|=%.3e |v|=%.3e step=%.4f ell=%.3f "
                         "nnz=%zu\n", k, no, nv, step, ell, nnz);

        M3 dR; std::array<double, 3> dT;
        exp_se3(omega, v, step, dR, dT);
        round_m3(dR);
        round_v3(dT);
        std::array<double, 3> RdT = mulv(R, dT);
        T = {RdT[0] + T[0], RdT[1] + T[1], RdT[2] + T[2]};
        R = mul(R, dR);
        round_m3(R);
        round_v3(T);
        if ((float)dist_se3(dR, dT) < EPS_2) { out.iters = k; break; }
        // ell anneal (cvo.cpp:810-812)
        if (k > 19) ell = 0.03;
        else if (k > 9) ell = 0.06;
        else if (k > 2) ell = 0.10;
    }
    out.R = R; out.T = T;
    return out;
}

// function_inner_product (cvo.cpp:388-459): kd-tree pass, scalar sum.
static double inner_product(const Cloud &a, const std::vector<V3> &ap,
                            const Cloud &b, const std::vector<V3> &bp,
                            double ell) {
    KDTree tree;
    tree.build(bp);
    double r2 = d2_thres(ell), cthr = d2c_thres();
    double s2 = SIGMA * SIGMA, cs2 = C_SIGMA * C_SIGMA;
    double gk = 1.0 / (2.0 * ell * ell), ck = 1.0 / (2.0 * C_ELL * C_ELL);
    double sum = 0;
    int N = a.n();
#pragma omp parallel reduction(+:sum)
    {
        std::vector<std::pair<int, float>> nb;
#pragma omp for schedule(dynamic, 64)
        for (int i = 0; i < N; ++i) {
            nb.clear();
            tree.radius(ap[i], (float)r2, nb);
            for (auto &pr : nb) {
                double d2c = 0;
                for (int k = 0; k < 5; ++k) {
                    double d = a.f[i][k] - b.f[pr.first][k];
                    d2c += d * d;
                }
                if (d2c >= cthr) continue;
                sum += s2 * std::exp(-pr.second * gk)
                     * cs2 * std::exp(-d2c * ck);
            }
        }
    }
    return sum;
}

// se3_Hessian (cvo.cpp:620-759): per-pair 6x6 block accumulation with
// weight k * (f_a . f_b) over the gated pairs, + eigenvalue floor.
static void se3_hessian(const Cloud &mv, const std::vector<V3> &mp,
                        const Cloud &fx, const std::vector<V3> &fp,
                        double ell, double H[6][6]) {
    KDTree tree;
    tree.build(fp);
    double r2 = d2_thres(ell), cthr = d2c_thres();
    double gk = 1.0 / (2.0 * ell * ell);
    double il2 = 1.0 / (ell * ell);
    double acc[36] = {0};
    int N = mv.n();
#pragma omp parallel
    {
        double loc[36] = {0};
        std::vector<std::pair<int, float>> nb;
#pragma omp for schedule(dynamic, 64)
        for (int i = 0; i < N; ++i) {
            nb.clear();
            tree.radius(mp[i], (float)r2, nb);
            for (auto &pr : nb) {
                int j = pr.first;
                double d2c = 0, cdot = 0;
                for (int k = 0; k < 5; ++k) {
                    double fa = mv.f[i][k], fb = fx.f[j][k];
                    d2c += (fa - fb) * (fa - fb);
                    cdot += fa * fb;
                }
                if (d2c >= cthr) continue;
                double w = SIGMA * SIGMA * std::exp(-pr.second * gk) * cdot;
                double a[3] = {mp[i][0], mp[i][1], mp[i][2]};
                double b[3] = {fp[j][0], fp[j][1], fp[j][2]};
                double cr[3] = {a[1] * b[2] - a[2] * b[1],
                                a[2] * b[0] - a[0] * b[2],
                                a[0] * b[1] - a[1] * b[0]};
                double df[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                // block A (rot-rot), C (trans-rot), D (trans-trans)
                for (int r = 0; r < 3; ++r)
                    for (int c = 0; c < 3; ++c) {
                        double hi = cr[r] * cr[c];
                        double lo;
                        if (r == c) {
                            lo = -(a[(r + 1) % 3] * b[(r + 1) % 3]
                                   + a[(r + 2) % 3] * b[(r + 2) % 3]);
                        } else {
                            lo = 0.5 * (a[r] * b[c] + a[c] * b[r]);
                        }
                        loc[r * 6 + c] += w * il2 * (il2 * hi + lo);
                    }
                static const int sg[3][3] = {{0, -1, 1}, {1, 0, -1},
                                             {-1, 1, 0}};
                for (int r = 0; r < 3; ++r)
                    for (int c = 0; c < 3; ++c) {
                        double hi = df[r] * cr[c];
                        double lo = 0;
                        if (r != c) {
                            int other = 3 - r - c;
                            lo = sg[r][c] * a[other];
                        }
                        double val = w * il2 * (il2 * hi + lo);
                        loc[(3 + r) * 6 + c] += val;    // C block
                        loc[c * 6 + (3 + r)] += val;    // C^T block
                    }
                for (int r = 0; r < 3; ++r)
                    for (int c = 0; c < 3; ++c) {
                        double hi = df[r] * df[c];
                        double lo = (r == c) ? -1.0 : 0.0;
                        loc[(3 + r) * 6 + (3 + c)] += w * il2
                            * (il2 * hi + lo);
                    }
            }
        }
#pragma omp critical
        for (int k = 0; k < 36; ++k) acc[k] += loc[k];
    }
    for (int r = 0; r < 6; ++r)
        for (int c = 0; c < 6; ++c)
            H[r][c] = acc[r * 6 + c] * (-1.0 / 100000.0);
    // eigenvalue floor via cyclic Jacobi (cvo.cpp:726-754 iterates
    // eigensolves; one Jacobi pass set is enough for a 6x6 here)
    double A[6][6], Vmat[6][6] = {{0}};
    std::memcpy(A, H, sizeof(A));
    for (int i = 0; i < 6; ++i) Vmat[i][i] = 1.0;
    for (int sweep = 0; sweep < 10; ++sweep)
        for (int p = 0; p < 6; ++p)
            for (int q = p + 1; q < 6; ++q) {
                if (std::fabs(A[p][q]) < 1e-14) continue;
                double th = 0.5 * std::atan2(2.0 * A[p][q],
                                             A[q][q] - A[p][p]);
                double c = std::cos(th), s = std::sin(th);
                for (int k = 0; k < 6; ++k) {
                    double akp = A[k][p], akq = A[k][q];
                    A[k][p] = c * akp - s * akq;
                    A[k][q] = s * akp + c * akq;
                }
                for (int k = 0; k < 6; ++k) {
                    double apk = A[p][k], aqk = A[q][k];
                    A[p][k] = c * apk - s * aqk;
                    A[q][k] = s * apk + c * aqk;
                }
            }
    double shift = 0;
    for (int it = 0; it < 64; ++it) {
        double mn = 1e30;
        for (int i = 0; i < 6; ++i)
            mn = std::min(mn, std::fabs(A[i][i] + shift));
        if (mn >= 1.0) break;
        double lam_min = 1e30;
        for (int i = 0; i < 6; ++i)
            if (std::fabs(A[i][i] + shift) < std::fabs(lam_min))
                lam_min = A[i][i] + shift;
        shift += 1.0 - lam_min;
    }
    for (int i = 0; i < 6; ++i) H[i][i] += shift;
}

// compute_innerproduct (cvo.cpp:475-503): pre/post/self-norm inner products
// + the 6x6 Hessian — the reference's per-frame suite.
static void innerproduct_suite(const Cloud &fixed, const Cloud &moving,
                               const M3 &R, const std::array<double, 3> &T,
                               double ell) {
    int M = moving.n();
    std::vector<V3> yt(M);
    double Tt[3] = {-(R.m[0][0] * T[0] + R.m[1][0] * T[1] + R.m[2][0] * T[2]),
                    -(R.m[0][1] * T[0] + R.m[1][1] * T[1] + R.m[2][1] * T[2]),
                    -(R.m[0][2] * T[0] + R.m[1][2] * T[1] + R.m[2][2] * T[2])};
    for (int j = 0; j < M; ++j)
        for (int a = 0; a < 3; ++a)
            yt[j][a] = (float)(moving.p[j][0] * R.m[0][a]
                               + moving.p[j][1] * R.m[1][a]
                               + moving.p[j][2] * R.m[2][a] + Tt[a]);
    volatile double sink = 0;
    sink += inner_product(moving, moving.p, fixed, fixed.p, ell);   // pre
    sink += inner_product(moving, yt, fixed, fixed.p, ell);         // post
    sink += inner_product(fixed, fixed.p, fixed, fixed.p, ell);     // |f|
    sink += inner_product(moving, moving.p, moving, moving.p, ell); // |g|
    double H[6][6];
    se3_hessian(moving, yt, fixed, fixed.p, ell, H);
    sink += H[0][0];
    (void)sink;
}

int main(int argc, char **argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: %s clouds.bin [frames]\n",
                                 argv[0]); return 1; }
    FILE *fp = std::fopen(argv[1], "rb");
    if (!fp) { std::fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
    int32_t nc = 0;
    if (std::fread(&nc, 4, 1, fp) != 1) return 1;
    std::vector<Cloud> clouds(nc);
    for (int c = 0; c < nc; ++c) {
        int32_t n = 0;
        if (std::fread(&n, 4, 1, fp) != 1) return 1;
        clouds[c].p.resize(n);
        clouds[c].f.resize(n);
        if (std::fread(clouds[c].p.data(), sizeof(V3), n, fp) != (size_t)n)
            return 1;
        if (std::fread(clouds[c].f.data(), sizeof(F5), n, fp) != (size_t)n)
            return 1;
    }
    std::fclose(fp);
    int frames = argc > 2 ? std::atoi(argv[2]) : 20;
#ifdef _OPENMP
    int n_threads = omp_get_max_threads();
#else
    int n_threads = 1;
#endif

    // warmup frame (not timed)
    {
        AlignOut a1 = align(clouds[1], clouds[2], n_threads);
        innerproduct_suite(clouds[1], clouds[2], a1.R, a1.T, 0.03);
    }
    long long iters_total = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int fidx = 0; fidx < frames; ++fidx) {
        // the bench workload (bench.py frame_step): odometry align + ip
        // suite, keyframe align + ip suite, fresh ell per alignment
        const Cloud &kf = clouds[fidx % 2];
        const Cloud &prev = clouds[1 + fidx % 2];
        const Cloud &cur = clouds[2 + fidx % 2];
        AlignOut a1 = align(prev, cur, n_threads);
        innerproduct_suite(prev, cur, a1.R, a1.T, 0.03);
        // keyframe align warm-started from the odometry result (with the
        // identity keyframe transform of the bench workload the warm-start
        // internal state equals a1's final state)
        AlignOut a2 = align(kf, cur, n_threads, &a1.R, &a1.T);
        innerproduct_suite(kf, cur, a2.R, a2.T, 0.03);
        iters_total += a1.iters + a2.iters;
        if (fidx == 0) {
            // transform translation = -R^T T (update_tf convention), for
            // direct comparison with the engine cross-check
            double tt[3];
            for (int a = 0; a < 3; ++a)
                tt[a] = -(a1.R.m[0][a] * a1.T[0] + a1.R.m[1][a] * a1.T[1]
                          + a1.R.m[2][a] * a1.T[2]);
            std::fprintf(stderr,
                         "frame0: odo iters=%d nnz=%zu t=(%.6f %.6f %.6f); "
                         "kf iters=%d\n", a1.iters, a1.nnz,
                         tt[0], tt[1], tt[2], a2.iters);
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    double ms = std::chrono::duration<double, std::milli>(t1 - t0).count()
              / frames;
    std::printf("{\"metric\": \"reference_replica_ms_per_frame\", "
                "\"value\": %.2f, \"fps\": %.3f, \"threads\": %d, "
                "\"frames\": %d, \"align_iters_per_frame\": %.1f}\n",
                ms, 1000.0 / ms, n_threads, frames,
                (double)iters_total / frames);
    return 0;
}
