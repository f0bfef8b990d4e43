// bcd_cpu: good-faith CPU implementation of the BCD monoscale denoiser,
// used to self-generate the CPU performance baseline (the upstream
// reference cannot be built here: its vendored Eigen/OpenEXR submodules are
// stripped) and as the native runtime engine of the bcd_tpu framework.
//
// Semantics mirror the reference algorithm (Denoiser.cpp/DenoisingUnit.cpp):
// deterministic full denoise (-m 0 path), chi^2 histogram patch distance
// with the b1+b2<=1 bin gate, two-step Bayesian MAP filter with
// eigenvalue clamp/floor, scatter-add aggregation with per-thread buffers.
// Written from scratch in C++17 + OpenMP; the symmetric eigensolver is a
// cyclic Jacobi (no Eigen dependency).
//
// C ABI (ctypes):
//   int bcd_denoise_monoscale(color, nb, histo, cov, H, W, C_histo,
//                             threshold, patch_radius, search_radius,
//                             min_eigen, out, n_threads)
// Arrays are row-major H x W x C float32; cov channel order
// xx, yy, zz, yz, xz, xy.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// symmetric eigensolver: Householder tridiagonalization + implicit-shift QL
// (the classic O(d^3) dense-symmetric algorithm, cf. Golub & Van Loan ch. 8)
// ---------------------------------------------------------------------------
struct JacobiWorkspace {  // name kept for the call sites; algorithm is QL
  int d = 0;
  std::vector<float> v;  // on output: eigenvectors as columns, d*d
  std::vector<float> lam;
  std::vector<float> e;  // off-diagonal scratch

  void init(int dim) {
    d = dim;
    v.resize(d * d);
    lam.resize(d);
    e.resize(d);
  }

  // reduce the working copy (in v) to tridiagonal form, accumulating the
  // orthogonal transform in v; diagonal -> lam, subdiagonal -> e
  void tridiagonalize() {
    const int n = d;
    float* a = v.data();
    for (int i = n - 1; i >= 1; --i) {
      int l = i - 1;
      float h = 0.f, scale = 0.f;
      if (l > 0) {
        for (int k = 0; k <= l; ++k) scale += std::fabs(a[i * n + k]);
        if (scale == 0.f) {
          e[i] = a[i * n + l];
        } else {
          for (int k = 0; k <= l; ++k) {
            a[i * n + k] /= scale;
            h += a[i * n + k] * a[i * n + k];
          }
          float f = a[i * n + l];
          float g = (f >= 0.f) ? -std::sqrt(h) : std::sqrt(h);
          e[i] = scale * g;
          h -= f * g;
          a[i * n + l] = f - g;
          f = 0.f;
          for (int j = 0; j <= l; ++j) {
            a[j * n + i] = a[i * n + j] / h;
            g = 0.f;
            for (int k = 0; k <= j; ++k) g += a[j * n + k] * a[i * n + k];
            for (int k = j + 1; k <= l; ++k) g += a[k * n + j] * a[i * n + k];
            e[j] = g / h;
            f += e[j] * a[i * n + j];
          }
          float hh = f / (h + h);
          for (int j = 0; j <= l; ++j) {
            f = a[i * n + j];
            float g2 = e[j] - hh * f;
            e[j] = g2;
            for (int k = 0; k <= j; ++k)
              a[j * n + k] -= f * e[k] + g2 * a[i * n + k];
          }
        }
      } else {
        e[i] = a[i * n + l];
      }
      lam[i] = h;
    }
    lam[0] = 0.f;
    e[0] = 0.f;
    for (int i = 0; i < n; ++i) {
      int l = i - 1;
      if (lam[i] != 0.f) {
        for (int j = 0; j <= l; ++j) {
          float g = 0.f;
          for (int k = 0; k <= l; ++k) g += a[i * n + k] * a[k * n + j];
          for (int k = 0; k <= l; ++k) a[k * n + j] -= g * a[k * n + i];
        }
      }
      lam[i] = a[i * n + i];
      a[i * n + i] = 1.f;
      for (int j = 0; j <= l; ++j) a[j * n + i] = a[i * n + j] = 0.f;
    }
  }

  // implicit-shift QL on the tridiagonal (lam, e), rotating v along
  void ql_implicit() {
    const int n = d;
    float* z = v.data();
    for (int i = 1; i < n; ++i) e[i - 1] = e[i];
    e[n - 1] = 0.f;
    for (int l = 0; l < n; ++l) {
      int iter = 0;
      int m;
      do {
        for (m = l; m < n - 1; ++m) {
          float dd = std::fabs(lam[m]) + std::fabs(lam[m + 1]);
          if (std::fabs(e[m]) <= 1.19e-7f * dd) break;
        }
        if (m != l) {
          if (iter++ == 64) break;  // accept current accuracy
          float g = (lam[l + 1] - lam[l]) / (2.f * e[l]);
          float r = std::hypot(g, 1.f);
          g = lam[m] - lam[l] +
              e[l] / (g + (g >= 0.f ? std::fabs(r) : -std::fabs(r)));
          float s = 1.f, c = 1.f, p = 0.f;
          int i;
          for (i = m - 1; i >= l; --i) {
            float f = s * e[i];
            float b = c * e[i];
            r = std::hypot(f, g);
            e[i + 1] = r;
            if (r == 0.f) {
              lam[i + 1] -= p;
              e[m] = 0.f;
              break;
            }
            s = f / r;
            c = g / r;
            g = lam[i + 1] - p;
            r = (lam[i] - g) * s + 2.f * c * b;
            p = s * r;
            lam[i + 1] = g + p;
            g = c * r - b;
            for (int k = 0; k < n; ++k) {
              f = z[k * n + i + 1];
              z[k * n + i + 1] = s * z[k * n + i] + c * f;
              z[k * n + i] = c * z[k * n + i] - s * f;
            }
          }
          if (r == 0.f && i >= l) continue;
          lam[l] -= p;
          e[l] = g;
          e[m] = 0.f;
        }
      } while (m != l);
    }
  }

  // decompose m (d*d symmetric); afterwards lam holds eigenvalues and v the
  // eigenvectors as columns: m = V diag(lam) V^T
  void compute(const float* m) {
    std::memcpy(v.data(), m, sizeof(float) * d * d);
    tridiagonalize();
    ql_implicit();
  }
};

// out = V diag(f(lam)) V^T, f given per eigenvalue in fl
void reconstruct(const JacobiWorkspace& ws, const float* fl, float* out) {
  int d = ws.d;
  for (int i = 0; i < d; ++i)
    for (int j = i; j < d; ++j) {
      float sum = 0.f;
      for (int k = 0; k < d; ++k) sum += ws.v[i * d + k] * fl[k] * ws.v[j * d + k];
      out[i * d + j] = sum;
      out[j * d + i] = sum;
    }
}

struct ThreadState {
  std::vector<float> out_sum;  // H*W*3
  std::vector<int32_t> count;  // H*W
};

}  // namespace

extern "C" {

int bcd_denoise_monoscale(const float* color, const float* nb,
                          const float* histo, const float* cov, int H, int W,
                          int histo_channels, float threshold,
                          int patch_radius, int search_radius,
                          float min_eigen, float* out, int n_threads) {
  const int r = patch_radius, b = search_radius;
  const int k = 2 * r + 1;
  const int npx = k * k;
  const int d = 3 * npx;
  const int nbins = histo_channels / 3;
  (void)nbins;

#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
  const int max_threads = omp_get_max_threads();
#else
  const int max_threads = 1;
#endif

  // pixel covariance = sample covariance / N (Denoiser.cpp:357-373)
  std::vector<float> pixcov(size_t(H) * W * 6);
  for (size_t i = 0; i < size_t(H) * W; ++i) {
    float inv = 1.f / nb[i];
    for (int c = 0; c < 6; ++c) pixcov[i * 6 + c] = cov[i * 6 + c] * inv;
  }

  std::vector<ThreadState> states(max_threads);
  for (auto& st : states) {
    st.out_sum.assign(size_t(H) * W * 3, 0.f);
    st.count.assign(size_t(H) * W, 0);
  }

  const int max_cand = (2 * b + 1) * (2 * b + 1);

#pragma omp parallel
  {
#ifdef _OPENMP
    ThreadState& st = states[omp_get_thread_num()];
#else
    ThreadState& st = states[0];
#endif
    JacobiWorkspace ws;
    ws.init(d);
    std::vector<int> cand_l(max_cand), cand_c(max_cand);
    std::vector<float> X(size_t(max_cand) * d);  // candidate patch vectors
    std::vector<float> noise(npx * 6);           // mean noise cov blocks
    std::vector<float> mean(d), cemp(size_t(d) * d), work(size_t(d) * d);
    std::vector<float> inv1(size_t(d) * d), a1(size_t(d) * d);
    std::vector<float> cov2(size_t(d) * d), inv2(size_t(d) * d);
    std::vector<float> fl(d), tmpv(d), b2(d);

#pragma omp for schedule(static, 4)  // static: bitwise-reproducible row->thread map
    for (int pl = r; pl < H - r; ++pl) {
      for (int pc = r; pc < W - r; ++pc) {
        // ---- similar patch search (truncated window, chi^2 distance)
        int n = 0;
        int l0 = std::max(r, pl - b), l1 = std::min(H - 1 - r, pl + b);
        int c0 = std::max(r, pc - b), c1 = std::min(W - 1 - r, pc + b);
        for (int cl = l0; cl <= l1; ++cl) {
          for (int cc = c0; cc <= c1; ++cc) {
            float sum = 0.f;
            int nkept = 0;
            for (int dl = -r; dl <= r; ++dl) {
              for (int dc = -r; dc <= r; ++dc) {
                size_t i1 = size_t(pl + dl) * W + (pc + dc);
                size_t i2 = size_t(cl + dl) * W + (cc + dc);
                const float* h1 = histo + i1 * histo_channels;
                const float* h2 = histo + i2 * histo_channels;
                float n1 = nb[i1], n2 = nb[i2];
                for (int bin = 0; bin < histo_channels; ++bin) {
                  float s12 = h1[bin] + h2[bin];
                  if (s12 <= 1.f) continue;  // bin gate
                  float diff = n2 * h1[bin] - n1 * h2[bin];
                  sum += diff * diff / (n1 * n2 * s12);
                  ++nkept;
                }
              }
            }
            float dist = (cl == pl && cc == pc)
                             ? 0.f
                             : (nkept > 0 ? sum / nkept
                                          : std::numeric_limits<float>::infinity());
            if (dist <= threshold) {
              cand_l[n] = cl;
              cand_c[n] = cc;
              ++n;
            }
          }
        }
        if (n == 0) continue;
        float n_inv = 1.f / n;

        // gather candidate patch vectors
        for (int i = 0; i < n; ++i) {
          float* xp = X.data() + size_t(i) * d;
          int idx = 0;
          for (int dl = -r; dl <= r; ++dl)
            for (int dc = -r; dc <= r; ++dc) {
              const float* px =
                  color + (size_t(cand_l[i] + dl) * W + (cand_c[i] + dc)) * 3;
              xp[idx++] = px[0];
              xp[idx++] = px[1];
              xp[idx++] = px[2];
            }
        }

        if (n < d + 1) {
          // fallback: average of the selected patches at the main location
          // (DenoisingUnit.cpp:455-481)
          std::fill(mean.begin(), mean.end(), 0.f);
          for (int i = 0; i < n; ++i)
            for (int j = 0; j < d; ++j) mean[j] += X[size_t(i) * d + j];
          int idx = 0;
          for (int dl = -r; dl <= r; ++dl)
            for (int dc = -r; dc <= r; ++dc) {
              size_t o = size_t(pl + dl) * W + (pc + dc);
              for (int ch = 0; ch < 3; ++ch)
                st.out_sum[o * 3 + ch] += n_inv * mean[idx++];
              ++st.count[o];
            }
          continue;
        }

        // ---- noise covariance patch mean
        std::fill(noise.begin(), noise.end(), 0.f);
        for (int i = 0; i < n; ++i) {
          int q = 0;
          for (int dl = -r; dl <= r; ++dl)
            for (int dc = -r; dc <= r; ++dc, ++q) {
              const float* pcv =
                  pixcov.data() +
                  (size_t(cand_l[i] + dl) * W + (cand_c[i] + dc)) * 6;
              for (int c = 0; c < 6; ++c) noise[q * 6 + c] += pcv[c];
            }
        }
        for (auto& x : noise) x *= n_inv;

        auto add_noise = [&](float* mat, float sign) {
          // cov order xx, yy, zz, yz, xz, xy
          for (int q = 0; q < npx; ++q) {
            int o = 3 * q;
            const float* nc = noise.data() + q * 6;
            mat[(o + 0) * d + (o + 0)] += sign * nc[0];
            mat[(o + 1) * d + (o + 1)] += sign * nc[1];
            mat[(o + 2) * d + (o + 2)] += sign * nc[2];
            mat[(o + 1) * d + (o + 2)] += sign * nc[3];
            mat[(o + 2) * d + (o + 1)] += sign * nc[3];
            mat[(o + 0) * d + (o + 2)] += sign * nc[4];
            mat[(o + 2) * d + (o + 0)] += sign * nc[4];
            mat[(o + 0) * d + (o + 1)] += sign * nc[5];
            mat[(o + 1) * d + (o + 0)] += sign * nc[5];
          }
        };
        auto noise_times = [&](const float* vin, float* vout) {
          for (int q = 0; q < npx; ++q) {
            const float* nc = noise.data() + q * 6;
            const float* x = vin + 3 * q;
            float* y = vout + 3 * q;
            y[0] = nc[0] * x[0] + nc[5] * x[1] + nc[4] * x[2];
            y[1] = nc[5] * x[0] + nc[1] * x[1] + nc[3] * x[2];
            y[2] = nc[4] * x[0] + nc[3] * x[1] + nc[2] * x[2];
          }
        };

        // ---- step 1: empirical mean/cov of the noisy patches
        std::fill(mean.begin(), mean.end(), 0.f);
        for (int i = 0; i < n; ++i)
          for (int j = 0; j < d; ++j) mean[j] += X[size_t(i) * d + j];
        for (int j = 0; j < d; ++j) mean[j] *= n_inv;

        std::fill(cemp.begin(), cemp.end(), 0.f);
        for (int i = 0; i < n; ++i) {
          const float* x = X.data() + size_t(i) * d;
          for (int rr = 0; rr < d; ++rr) {
            float xr = x[rr] - mean[rr];
            float* row = cemp.data() + size_t(rr) * d;
            for (int cc2 = 0; cc2 < d; ++cc2) row[cc2] += xr * (x[cc2] - mean[cc2]);
          }
        }
        float nm1_inv = 1.f / (n - 1);
        for (auto& x : cemp) x *= nm1_inv;

        // clamp eigenvalues of (cemp - noise) at 0, add noise back, invert
        std::memcpy(work.data(), cemp.data(), sizeof(float) * d * d);
        add_noise(work.data(), -1.f);
        ws.compute(work.data());
        for (int i = 0; i < d; ++i) fl[i] = std::max(0.f, ws.lam[i]);
        reconstruct(ws, fl.data(), work.data());
        add_noise(work.data(), 1.f);
        ws.compute(work.data());
        for (int i = 0; i < d; ++i)
          fl[i] = 1.f / std::max(min_eigen, ws.lam[i]);
        reconstruct(ws, fl.data(), inv1.data());

        // A1 = I - Noise * inv1
        for (int cc2 = 0; cc2 < d; ++cc2) {
          for (int rr = 0; rr < d; ++rr) tmpv[rr] = inv1[size_t(rr) * d + cc2];
          noise_times(tmpv.data(), b2.data());
          for (int rr = 0; rr < d; ++rr)
            a1[size_t(rr) * d + cc2] = (rr == cc2 ? 1.f : 0.f) - b2[rr];
        }

        // ---- step 2: cov of denoised = A1 cemp A1^T (closed form; no clamp)
        // work = cemp * A1^T
        for (int rr = 0; rr < d; ++rr)
          for (int cc2 = 0; cc2 < d; ++cc2) {
            float s = 0.f;
            for (int kk = 0; kk < d; ++kk)
              s += cemp[size_t(rr) * d + kk] * a1[size_t(cc2) * d + kk];
            work[size_t(rr) * d + cc2] = s;
          }
        for (int rr = 0; rr < d; ++rr)
          for (int cc2 = 0; cc2 < d; ++cc2) {
            float s = 0.f;
            for (int kk = 0; kk < d; ++kk)
              s += a1[size_t(rr) * d + kk] * work[size_t(kk) * d + cc2];
            cov2[size_t(rr) * d + cc2] = s;
          }
        add_noise(cov2.data(), 1.f);
        ws.compute(cov2.data());
        for (int i = 0; i < d; ++i)
          fl[i] = 1.f / std::max(min_eigen, ws.lam[i]);
        reconstruct(ws, fl.data(), inv2.data());

        // b2 = Noise * inv2 * mean ; final x2_i = x_i - Noise inv2 (x_i - m)
        for (int rr = 0; rr < d; ++rr) {
          float s = 0.f;
          for (int kk = 0; kk < d; ++kk) s += inv2[size_t(rr) * d + kk] * mean[kk];
          tmpv[rr] = s;
        }
        noise_times(tmpv.data(), b2.data());  // b2 = N inv2 m

        // aggregate every filtered candidate patch at its own location
        for (int i = 0; i < n; ++i) {
          const float* x = X.data() + size_t(i) * d;
          // tmpv = inv2 * x
          for (int rr = 0; rr < d; ++rr) {
            float s = 0.f;
            const float* row = inv2.data() + size_t(rr) * d;
            for (int kk = 0; kk < d; ++kk) s += row[kk] * x[kk];
            tmpv[rr] = s;
          }
          // reuse mean buffer? no: filtered = x - N*tmpv + b2
          std::vector<float>& scratch = fl;  // reuse fl as d-vector scratch
          noise_times(tmpv.data(), scratch.data());
          int idx = 0;
          for (int dl = -r; dl <= r; ++dl)
            for (int dc = -r; dc <= r; ++dc) {
              size_t o = size_t(cand_l[i] + dl) * W + (cand_c[i] + dc);
              for (int ch = 0; ch < 3; ++ch, ++idx)
                st.out_sum[o * 3 + ch] += x[idx] - scratch[idx] + b2[idx];
              ++st.count[o];
            }
        }
      }
    }
  }

  // reduce thread buffers and normalize (Denoiser.cpp:434-470)
  for (size_t i = 0; i < size_t(H) * W; ++i) {
    float s0 = 0.f, s1 = 0.f, s2 = 0.f;
    int32_t cnt = 0;
    for (const auto& st : states) {
      s0 += st.out_sum[i * 3 + 0];
      s1 += st.out_sum[i * 3 + 1];
      s2 += st.out_sum[i * 3 + 2];
      cnt += st.count[i];
    }
    float inv = cnt > 0 ? 1.f / cnt : 0.f;
    out[i * 3 + 0] = s0 * inv;
    out[i * 3 + 1] = s1 * inv;
    out[i * 3 + 2] = s2 * inv;
  }
  return 0;
}

}  // extern "C"
