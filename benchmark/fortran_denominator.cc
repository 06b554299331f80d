// Measured Fortran-denominator stand-in for BASELINE.md.
//
// No Fortran toolchain exists in this image, so this program transliterates
// the reference's scalar hot loop into C++ (same data structures, same
// per-sample arithmetic, same span bookkeeping) and replays the kiwibench
// 'syntheseis' workload (/root/reference/benchmark/kiwibench.py:94-150):
// a 3610-strike sweep of a bilateral point source against 10 'ned'
// receivers with the floating_l1norm misfit.  What it times per model:
//
//   * make_seismogram            seismogram.f90:131-254
//   * approx_differential_azidist orthodrome.f90:121-152 (exact branch)
//   * make_weights               seismogram.f90:316-336
//   * gfdb_get_indices_bilin     gfdb.f90:781-815
//   * gfdb_get_trace_bilin       gfdb.f90:865-951 (4-trace blend into a
//                                reusable buffer -- rebuilt every call,
//                                exactly like the reference)
//   * trace_multiply_add         sparse_trace.f90:597-707 (2-tap
//                                fractional shift + end-point repeat)
//   * receiver_calculate_floating_misfits  receiver.f90:439-510
//     with l1norm_func           comparator.f90:639-648 (f64 accumulation)
//
// This is a *generous* rendering of the Fortran: contiguous arrays, no
// sparse-strip indirection beyond one level, no text-protocol framing, no
// process-pool IPC, compiled -O3 -march=native.  The measured
// single-process number is therefore an upper bound on what the reference
// binary would do per core on this host.
//
// Build/run:  g++ -O3 -march=native -o fortran_denominator
//             fortran_denominator.cc && ./fortran_denominator
// (after python benchmark/prep_denominator.py)

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Store {
    int nx, nz, ng, ntmax, nrec, ncent, nshift;
    float dt, dx, dz, firstx, firstz;
    std::vector<double> azi, bazi, dist;
    std::vector<float> cent_time, cent_w;
    std::vector<int32_t> itmin, nsamples;
    std::vector<float> data;

    const float* trace(int ix, int iz, int ig) const {
        return &data[size_t(((ix * nz) + iz) * ng + ig) * ntmax];
    }
    int t_itmin(int ix, int iz, int ig) const {
        return itmin[size_t((ix * nz) + iz) * ng + ig];
    }
    int t_n(int ix, int iz, int ig) const {
        return nsamples[size_t((ix * nz) + iz) * ng + ig];
    }
};

bool load(const char* path, Store& s) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    int32_t ihdr[7];
    float fhdr[5];
    if (std::fread(ihdr, 4, 7, f) != 7 || std::fread(fhdr, 4, 5, f) != 5) {
        std::fclose(f);
        return false;
    }
    s.nx = ihdr[0]; s.nz = ihdr[1]; s.ng = ihdr[2]; s.ntmax = ihdr[3];
    s.nrec = ihdr[4]; s.ncent = ihdr[5]; s.nshift = ihdr[6];
    s.dt = fhdr[0]; s.dx = fhdr[1]; s.dz = fhdr[2];
    s.firstx = fhdr[3]; s.firstz = fhdr[4];
    s.azi.resize(s.nrec); s.bazi.resize(s.nrec); s.dist.resize(s.nrec);
    s.cent_time.resize(s.ncent); s.cent_w.resize(s.ncent);
    size_t nn = size_t(s.nx) * s.nz * s.ng;
    s.itmin.resize(nn); s.nsamples.resize(nn);
    s.data.resize(nn * s.ntmax);
    bool ok = std::fread(s.azi.data(), 8, s.nrec, f) == size_t(s.nrec)
        && std::fread(s.bazi.data(), 8, s.nrec, f) == size_t(s.nrec)
        && std::fread(s.dist.data(), 8, s.nrec, f) == size_t(s.nrec)
        && std::fread(s.cent_time.data(), 4, s.ncent, f) == size_t(s.ncent)
        && std::fread(s.cent_w.data(), 4, s.ncent, f) == size_t(s.ncent)
        && std::fread(s.itmin.data(), 4, nn, f) == nn
        && std::fread(s.nsamples.data(), 4, nn, f) == nn
        && std::fread(s.data.data(), 4, nn * s.ntmax, f) == nn * s.ntmax;
    std::fclose(f);
    return ok;
}

// A growing absolute-indexed strip (sparse_trace.f90 t_strip): data[i]
// holds sample at absolute index span_lo + i.
struct Strip {
    int lo = 0, hi = -1;  // absolute sample span; empty when hi < lo
    std::vector<float> d;

    void clear() { std::fill(d.begin(), d.end(), 0.0f); hi = lo - 1; }
    void extend(int nlo, int nhi) {  // strip_extend: grow, keep content
        if (hi < lo) {
            lo = nlo; hi = nhi;
            d.assign(size_t(nhi - nlo + 1), 0.0f);
            return;
        }
        if (nlo >= lo && nhi <= hi) return;
        int alo = std::min(lo, nlo), ahi = std::max(hi, nhi);
        std::vector<float> nd(size_t(ahi - alo + 1), 0.0f);
        std::memcpy(&nd[lo - alo], d.data(), d.size() * 4);
        d.swap(nd);
        lo = alo; hi = ahi;
    }
    float& at(int i) { return d[size_t(i - lo)]; }
    float at(int i) const { return d[size_t(i - lo)]; }
};

// gfdb_get_trace_bilin (gfdb.f90:865-951): blend the 4 neighbor traces
// into a reusable buffer over the union of their spans.  The reference
// rebuilds this every call (no caching across calls); keep that.
struct BilinBuf {
    int lo = 0, hi = -1;
    std::vector<float> d;
};

void bilin_get(const Store& s, const int ix[2], const int iz[2], int ig,
               float dix, float diz, BilinBuf& b) {
    int lo = 1 << 30, hi = -(1 << 30);
    const float* tr[4];
    int ti[4], tn[4];
    float w[4];
    int k = 0;
    for (int a = 0; a < 2; ++a)
        for (int c = 0; c < 2; ++c) {
            tr[k] = s.trace(ix[a], iz[c], ig);
            ti[k] = s.t_itmin(ix[a], iz[c], ig);
            tn[k] = s.t_n(ix[a], iz[c], ig);
            w[k] = (a ? dix : 1.0f - dix) * (c ? diz : 1.0f - diz);
            lo = std::min(lo, ti[k]);
            hi = std::max(hi, ti[k] + tn[k] - 1);
            ++k;
        }
    b.lo = lo; b.hi = hi;
    size_t n = size_t(hi - lo + 1);
    if (b.d.size() < n) b.d.resize(n);
    std::fill(b.d.begin(), b.d.begin() + n, 0.0f);
    // trace_multiply_add_nogrow x4 (sparse_trace.f90:710-792): weighted
    // add over the trace span + end-point repeat to the buffer end
    for (int t = 0; t < 4; ++t) {
        int r1 = ti[t], r2 = ti[t] + tn[t] - 1;
        for (int i = r1; i <= r2; ++i)
            b.d[size_t(i - lo)] += w[t] * tr[t][i - ti[t]];
        float lastval = tr[t][tn[t] - 1];
        if (lastval != 0.0f)
            for (int i = r2 + 1; i <= hi; ++i)
                b.d[size_t(i - lo)] += w[t] * lastval;
    }
}

// trace_multiply_add (sparse_trace.f90:597-707) on the blended buffer:
// strip(x) += factor * buf(x - rshift) with 2-tap linear interpolation
// and end-point repeat.
void tma(const BilinBuf& b, Strip& st, float factor, float rshift) {
    int ish = int(std::floor(rshift));
    float wr = (rshift - ish) * factor;
    float wl = factor - wr;
    int r1 = b.lo + ish, r2 = b.hi + ish;
    st.extend(std::min(st.hi < st.lo ? r1 : st.lo, r1),
              std::max(st.hi < st.lo ? r2 + 1 : st.hi, r2 + 1));
    const float* src = b.d.data();
    for (int i = r1; i <= r2; ++i)
        st.at(i) += wl * src[i - r1];
    for (int i = r1 + 1; i <= r2; ++i)
        st.at(i) += wr * src[i - 1 - r1];
    // repeat end point over the remainder of the strip
    float lastval = src[r2 - r1];
    if (lastval != 0.0f)
        for (int i = r2 + 1; i <= st.hi; ++i)
            st.at(i) += factor * lastval;
}

// make_weights (seismogram.f90:316-336)
void make_weights(double azi, const float m[6], float f[6]) {
    float sa = float(std::sin(azi)), ca = float(std::cos(azi));
    float s2a = 2.0f * sa * ca, c2a = ca * ca - sa * sa;
    f[0] = m[0] * ca * ca + m[1] * sa * sa + m[3] * s2a;
    f[1] = m[4] * ca + m[5] * sa;
    f[2] = m[2];
    f[3] = 0.5f * (m[1] - m[0]) * s2a + m[3] * c2a;
    f[4] = m[5] * ca - m[4] * sa;
    f[5] = m[0] * sa * sa + m[1] * ca * ca - m[3] * s2a;
}

// approx_differential_azidist, exact-sphere branch (orthodrome.f90:121-152):
// the per-centroid spherical triangle the reference solves every time, even
// for zero offsets.
constexpr double kEarthRadius = 6371000.777;

void diff_azidist(double dnorth, double deast, double azi0, double bazi0,
                  double dist0, double& azi, double& bazi, double& dist) {
    double r = std::sqrt(dnorth * dnorth + deast * deast);
    double a = r / kEarthRadius;
    double b = dist0 / kEarthRadius;
    double lam = std::atan2(deast, dnorth);
    double gamma = azi0 - lam;
    double c = std::acos(std::min(1.0, std::max(-1.0,
        std::cos(a) * std::cos(b)
        + std::sin(a) * std::sin(b) * std::cos(gamma))));
    double sc = std::sin(c);
    double alpha = 0.0, beta = 0.0;
    if (sc != 0.0) {
        alpha = std::asin(std::min(1.0, std::max(-1.0,
            std::sin(a) * std::sin(gamma) / sc)));
        beta = std::asin(std::min(1.0, std::max(-1.0,
            std::sin(b) * std::sin(gamma) / sc)));
        if (std::cos(a) - std::cos(b) * std::cos(c) < 0.0)
            alpha = (alpha > 0.0 ? M_PI : -M_PI) - alpha;
        if (std::cos(b) - std::cos(a) * std::cos(c) < 0.0)
            beta = (beta > 0.0 ? M_PI : -M_PI) - beta;
    }
    dist = r == 0.0 ? dist0 : c * kEarthRadius;
    bazi = r == 0.0 ? bazi0 : bazi0 + alpha;
    azi = r == 0.0 ? azi0 : lam - M_PI - beta;
}

// sdr -> m6 (moment_tensor from strike/dip/rake, as psm_set_bilat feeds
// make_weights; standard double-couple formula, Aki & Richards)
void sdr_to_m6(double strike, double dip, double rake, double m0,
               float m[6]) {
    double ss = std::sin(strike), cs = std::cos(strike);
    double s2s = std::sin(2 * strike), c2s = std::cos(2 * strike);
    double sd = std::sin(dip), cd = std::cos(dip);
    double s2d = std::sin(2 * dip), c2d = std::cos(2 * dip);
    double sr = std::sin(rake), cr = std::cos(rake);
    m[0] = float(-m0 * (sd * cr * s2s + s2d * sr * ss * ss));  // mnn
    m[1] = float(m0 * (sd * cr * s2s - s2d * sr * cs * cs));   // mee
    m[2] = float(m0 * s2d * sr);                               // mdd
    m[3] = float(m0 * (sd * cr * c2s + 0.5 * s2d * sr * s2s)); // mne
    m[4] = float(-m0 * (cd * cr * cs + c2d * sr * ss));        // mnd
    m[5] = float(-m0 * (cd * cr * ss - c2d * sr * cs));        // med
}

// l1norm_func (comparator.f90:639-648): f64 accumulation like the Fortran
double l1_pair(const float* a, const float* b, int n, float dt) {
    double acc = 0.0;
    for (int i = 0; i < n; ++i) acc += std::fabs(double(a[i]) - double(b[i]));
    return dt * acc;
}

double l1_one(const float* a, int n, float dt) {
    double acc = 0.0;
    for (int i = 0; i < n; ++i) acc += std::fabs(double(a[i]));
    return dt * acc;
}

}  // namespace

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "/tmp/kiwi_denominator.bin";
    int nmodels = argc > 2 ? std::atoi(argv[2]) : 3610;
    Store s;
    if (!load(path, s)) {
        std::fprintf(stderr,
                     "cannot read %s (run benchmark/prep_denominator.py)\n",
                     path);
        return 1;
    }
    const int R = s.nrec, C = s.ncent, NS = s.nshift;
    const int shift0 = -(NS - 1) / 2;  // -1..1 s at dt=0.1 -> -10..10
    const double depth = 5000.0, m0 = 1e12;
    const double dipr = 87.0 * M_PI / 180.0, raker = 164.0 * M_PI / 180.0;

    // probe arrays (comparator.f90 t_probe): power-of-two span holding
    // refs and synthetics on a common absolute grid
    int glo = 1 << 30, ghi = -(1 << 30);
    for (size_t i = 0; i < s.itmin.size(); ++i) {
        if (s.nsamples[i] <= 0) continue;
        glo = std::min(glo, int(s.itmin[i]) - NS);
        ghi = std::max(ghi, int(s.itmin[i]) + int(s.nsamples[i]) + NS + 2);
    }
    int pl = 1;
    while (pl < 2 * (ghi - glo + 1)) pl <<= 1;
    int ps0 = glo - (pl - (ghi - glo + 1)) / 2;

    std::vector<std::vector<float>> ref(R * 3), syn(R * 3);
    std::vector<int> ref_lo(R * 3), ref_hi(R * 3), syn_lo(R * 3),
        syn_hi(R * 3);
    for (auto& v : ref) v.assign(size_t(pl), 0.0f);
    for (auto& v : syn) v.assign(size_t(pl), 0.0f);

    Strip away, right, down;
    BilinBuf buf;
    std::vector<double> misfits(size_t(R) * 3), norms(size_t(R) * 3);
    std::vector<int> fshift(R);

    auto run_model = [&](double strike_deg, bool as_ref) {
        float m6[6];
        sdr_to_m6(strike_deg * M_PI / 180.0, dipr, raker, m0, m6);
        for (int ir = 0; ir < R; ++ir) {
            away.clear(); right.clear(); down.clear();
            double azi0 = s.azi[ir], bazi0 = s.bazi[ir], dist0 = s.dist[ir];
            for (int ic = 0; ic < C; ++ic) {
                // per-centroid geodesy + weights + indices, every time,
                // exactly like the reference loop (seismogram.f90:131-254)
                double azi, bazi, dist;
                diff_azidist(0.0, 0.0, azi0, bazi0, dist0, azi, bazi, dist);
                float f[6];
                float mw[6];
                for (int q = 0; q < 6; ++q) mw[q] = m6[q] * s.cent_w[ic];
                make_weights(azi, mw, f);
                // gfdb_get_indices_bilin (gfdb.f90:781-815)
                int ix[2], iz[2];
                ix[0] = int(std::floor((float(dist) - s.firstx) / s.dx));
                iz[0] = int(std::floor((float(depth) - s.firstz) / s.dz));
                ix[1] = ix[0] + 1; iz[1] = iz[0] + 1;
                float dix = (float(dist) - s.firstx - ix[0] * s.dx) / s.dx;
                float diz = (float(depth) - s.firstz - iz[0] * s.dz) / s.dz;
                float rshift = s.cent_time[ic] / s.dt;
                // horizontal: components 1,2,3(,9) -> away; 4,5 -> right;
                // vertical: 6,7,8(,10) -> down.  lambda == 0 for the point
                // source, so accumulation goes straight to away/right
                // (seismogram.f90:208-233's fast branch).
                static const int g_aw[4] = {0, 1, 2, 8};
                static const float* fw;
                (void)fw;
                const float f_aw[4] = {f[0], f[1], f[2], f[5]};
                int n_aw = s.ng == 10 ? 4 : 3;
                for (int q = 0; q < n_aw; ++q) {
                    bilin_get(s, ix, iz, g_aw[q], dix, diz, buf);
                    tma(buf, away, f_aw[q], rshift);
                }
                for (int q = 0; q < 2; ++q) {
                    bilin_get(s, ix, iz, 3 + q, dix, diz, buf);
                    tma(buf, right, f[3 + q], rshift);
                }
                static const int g_dn[4] = {5, 6, 7, 9};
                const float f_dn[4] = {f[0], f[1], f[2], f[5]};
                int n_dn = s.ng == 10 ? 4 : 3;
                for (int q = 0; q < n_dn; ++q) {
                    bilin_get(s, ix, iz, g_dn[q], dix, diz, buf);
                    tma(buf, down, f_dn[q], rshift);
                }
            }
            // rotate (away, right) -> (north, east) (seismogram.f90:268-283)
            int lo = std::min(away.lo, right.lo);
            int hi = std::max(away.hi, right.hi);
            away.extend(lo, hi); right.extend(lo, hi);
            float cl = float(std::cos(bazi0 + M_PI));
            float sl = float(std::sin(bazi0 + M_PI));
            auto& tn = as_ref ? ref : syn;
            auto& tlo = as_ref ? ref_lo : syn_lo;
            auto& thi = as_ref ? ref_hi : syn_hi;
            // place on probes (comparator.f90 probe_set_array: zero + copy)
            for (int comp = 0; comp < 3; ++comp) {
                auto& row = tn[size_t(ir) * 3 + comp];
                std::fill(row.begin(), row.end(), 0.0f);
            }
            for (int i = lo; i <= hi; ++i) {
                float a = away.at(i), rgt = right.at(i);
                tn[size_t(ir) * 3 + 0][size_t(i - ps0)] =
                    cl * a - sl * rgt;                       // north
                tn[size_t(ir) * 3 + 1][size_t(i - ps0)] =
                    cl * rgt + sl * a;                       // east
            }
            for (int i = down.lo; i <= down.hi; ++i)
                tn[size_t(ir) * 3 + 2][size_t(i - ps0)] = down.at(i);
            tlo[size_t(ir) * 3] = lo; thi[size_t(ir) * 3] = hi;
            tlo[size_t(ir) * 3 + 1] = lo; thi[size_t(ir) * 3 + 1] = hi;
            tlo[size_t(ir) * 3 + 2] = down.lo;
            thi[size_t(ir) * 3 + 2] = down.hi;

            if (as_ref) continue;
            // receiver_calculate_floating_misfits (receiver.f90:439-510):
            // per shift, per component, l1 misfit + ref norm; keep the
            // shift minimizing the component sum
            double best = 1e300;
            int ibest = 0;
            double bm[3] = {0, 0, 0}, bn[3] = {0, 0, 0};
            for (int isf = 0; isf < NS; ++isf) {
                int sft = shift0 + isf;
                double tot = 0.0, cm[3], cn[3];
                for (int comp = 0; comp < 3; ++comp) {
                    size_t rc = size_t(ir) * 3 + comp;
                    int u1 = std::min(ref_lo[rc] + sft, syn_lo[rc]);
                    int u2 = std::max(ref_hi[rc] + sft, syn_hi[rc]);
                    // union span, like probes_norm_timedomain's
                    // union(a%dataspan, b%dataspan)
                    const float* a = &ref[rc][size_t(u1 - sft - ps0)];
                    const float* b = &syn[rc][size_t(u1 - ps0)];
                    cm[comp] = l1_pair(a, b, u2 - u1 + 1, s.dt);
                    cn[comp] = l1_one(&ref[rc][size_t(ref_lo[rc] - ps0)],
                                      ref_hi[rc] - ref_lo[rc] + 1, s.dt);
                    tot += cm[comp];
                }
                if (tot < best) {
                    best = tot; ibest = sft;
                    for (int q = 0; q < 3; ++q) { bm[q] = cm[q]; bn[q] = cn[q]; }
                }
            }
            fshift[ir] = ibest;
            for (int q = 0; q < 3; ++q) {
                misfits[size_t(ir) * 3 + q] = bm[q];
                norms[size_t(ir) * 3 + q] = bn[q];
            }
        }
    };

    run_model(91.0, true);  // set_synthetic_reference

    auto t0 = std::chrono::steady_clock::now();
    double sink = 0.0;
    for (int i = 0; i < nmodels; ++i) {
        double strike = 360.0 * double(i) / double(nmodels - 1);
        run_model(strike, false);
        for (int q = 0; q < R * 3; ++q) sink += misfits[q];
        for (int r = 0; r < R; ++r) sink += fshift[r];
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::printf("{\"models\": %d, \"seconds\": %.3f, \"mps_per_core\": %.1f, "
                "\"sink\": %.6g}\n",
                nmodels, secs, nmodels / secs, sink);
    return 0;
}
