// Native host kernels for ocrfa_tpu.
//
// Counterparts of the reference's C++/CUDA extension and its cv2 hot loops:
//   * dcn_forward: modulated deformable conv v2 forward on CPU — parity
//     kernel for the XLA op (reference native op:
//     DBNet/assets/ops/dcn/src/deform_conv_cpu_kernel.cpp:528-766, here
//     re-derived from the DCNv2 definition in NHWC layout).
//   * cc_label: two-pass union-find connected components (4/8-conn),
//     first-encounter label order (cv2.connectedComponents semantics).
//   * trace_boundary: Moore boundary tracing (cv2.findContours outer ring).
//   * min_area_rect: convex hull + rotating calipers
//     (cv2.minAreaRect + boxPoints).
//   * craft_components: the whole get_det_boxes_core per-component loop
//     (threshold -> CC -> filters -> rect-dilate -> min-area rect) fused in
//     one pass (reference host hot loop: src/ocrfa/utils.py:106-175).
//
// Exposed with C linkage for ctypes; built by ocrfa_tpu/runtime/build.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline float bilinear_zero(const float* img, int h, int w, int c, int ch,
                           float y, float x) {
  int y0 = static_cast<int>(std::floor(y));
  int x0 = static_cast<int>(std::floor(x));
  float fy = y - y0, fx = x - x0;
  float acc = 0.f;
  for (int dy = 0; dy <= 1; ++dy) {
    int yy = y0 + dy;
    if (yy < 0 || yy >= h) continue;
    float wy = dy ? fy : 1.f - fy;
    for (int dx = 0; dx <= 1; ++dx) {
      int xx = x0 + dx;
      if (xx < 0 || xx >= w) continue;
      float wx = dx ? fx : 1.f - fx;
      acc += wy * wx * img[(static_cast<int64_t>(yy) * w + xx) * c + ch];
    }
  }
  return acc;
}

struct UnionFind {
  std::vector<int32_t> parent;
  int32_t find(int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[std::max(a, b)] = std::min(a, b);
  }
};

}  // namespace

extern "C" {

// Modulated deformable conv v2 forward, NHWC.
// x: (n,h,w,cin), offset: (n,ho,wo,2*kh*kw) [dy,dx] interleaved,
// mask: (n,ho,wo,kh*kw), wgt: (kh,kw,cin,cout), out: (n,ho,wo,cout).
void dcn_forward(const float* x, const float* offset, const float* mask,
                 const float* wgt, float* out, int n, int h, int w, int cin,
                 int ho, int wo, int kh, int kw, int cout, int stride, int pad,
                 int dil) {
  const int k = kh * kw;
  std::vector<float> cols(static_cast<size_t>(k) * cin);
  for (int b = 0; b < n; ++b) {
    const float* xb = x + static_cast<int64_t>(b) * h * w * cin;
    for (int oy = 0; oy < ho; ++oy) {
      for (int ox = 0; ox < wo; ++ox) {
        const int64_t obase =
            ((static_cast<int64_t>(b) * ho + oy) * wo + ox);
        const float* off = offset + obase * 2 * k;
        const float* msk = mask + obase * k;
        // deformable im2col for this output position
        for (int i = 0; i < kh; ++i) {
          for (int j = 0; j < kw; ++j) {
            const int tap = i * kw + j;
            const float sy = oy * stride - pad + i * dil + off[2 * tap];
            const float sx = ox * stride - pad + j * dil + off[2 * tap + 1];
            const float m = msk[tap];
            float* col = cols.data() + static_cast<size_t>(tap) * cin;
            if (sy <= -1.f || sy >= h || sx <= -1.f || sx >= w || m == 0.f) {
              std::memset(col, 0, sizeof(float) * cin);
              continue;
            }
            for (int ch = 0; ch < cin; ++ch)
              col[ch] = m * bilinear_zero(xb, h, w, cin, ch, sy, sx);
          }
        }
        // GEMV: out[o] = cols . wgt[:, :, :, o]
        float* dst = out + obase * cout;
        for (int o = 0; o < cout; ++o) dst[o] = 0.f;
        for (int t = 0; t < k * cin; ++t) {
          const float v = cols[t];
          if (v == 0.f) continue;
          const float* wrow = wgt + static_cast<int64_t>(t) * cout;
          for (int o = 0; o < cout; ++o) dst[o] += v * wrow[o];
        }
      }
    }
  }
}

// Deformable PS-RoI pooling forward, NHWC — CPU twin of the XLA op
// (ocrfa_tpu/ops/deform_pool.py; reference native kernel semantics:
// DBNet/assets/ops/dcn/src/deform_pool_cpu_kernel.cpp:52-131).
// x: (n,h,w,c), rois: (r,5) [batch,x1,y1,x2,y2],
// trans: (r,part,part,2) [dy,dx] or nullptr, out: (r,p,p,od).
void deform_psroi_pool(const float* x, const float* rois, const float* trans,
                       float* out, int n, int h, int w, int c, int r,
                       float spatial_scale, int p, int od, int s,
                       float trans_std, int no_trans, int part, int g) {
  (void)n;
  std::vector<float> acc(od);
  for (int ri = 0; ri < r; ++ri) {
    const float* roi = rois + static_cast<int64_t>(ri) * 5;
    const int bi = static_cast<int>(roi[0]);
    const float x1 = std::round(roi[1]) * spatial_scale - 0.5f;
    const float y1 = std::round(roi[2]) * spatial_scale - 0.5f;
    const float x2 = (std::round(roi[3]) + 1.f) * spatial_scale - 0.5f;
    const float y2 = (std::round(roi[4]) + 1.f) * spatial_scale - 0.5f;
    const float rw = std::max(x2 - x1, 0.1f);
    const float rh = std::max(y2 - y1, 0.1f);
    const float bw = rw / p, bh = rh / p;
    const float sw = bw / s, sh = bh / s;
    const float* xb = x + static_cast<int64_t>(bi) * h * w * c;
    for (int iy = 0; iy < p; ++iy) {
      for (int ix = 0; ix < p; ++ix) {
        float oy = 0.f, ox = 0.f;
        if (!no_trans && trans) {
          const int py = iy * part / p, px = ix * part / p;
          const int64_t t0 =
              ((static_cast<int64_t>(ri) * part + py) * part + px) * 2;
          oy = trans[t0] * trans_std;
          ox = trans[t0 + 1] * trans_std;
        }
        const int cpg = (g > 1) ? c / (g * g) : od;
        const int ch0 =
            (g > 1) ? ((iy * g / p) * g + (ix * g / p)) * cpg : 0;
        std::fill(acc.begin(), acc.end(), 0.f);
        for (int syi = 0; syi < s; ++syi) {
          for (int sxi = 0; sxi < s; ++sxi) {
            const float yy = y1 + iy * bh + oy * rh + (syi + 0.5f) * sh;
            const float xx = x1 + ix * bw + ox * rw + (sxi + 0.5f) * sw;
            if (yy <= -1.f || yy >= h || xx <= -1.f || xx >= w) continue;
            const float cy = std::min(std::max(yy, 0.f), float(h - 1));
            const float cx = std::min(std::max(xx, 0.f), float(w - 1));
            const int y0 = static_cast<int>(std::floor(cy));
            const int x0 = static_cast<int>(std::floor(cx));
            const float fy = cy - y0, fx = cx - x0;
            const int y1c = std::min(y0 + 1, h - 1);
            const int x1c = std::min(x0 + 1, w - 1);
            const float w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
            const float w10 = fy * (1 - fx), w11 = fy * fx;
            const float* r00 = xb + (static_cast<int64_t>(y0) * w + x0) * c;
            const float* r01 = xb + (static_cast<int64_t>(y0) * w + x1c) * c;
            const float* r10 = xb + (static_cast<int64_t>(y1c) * w + x0) * c;
            const float* r11 = xb + (static_cast<int64_t>(y1c) * w + x1c) * c;
            for (int o = 0; o < od; ++o) {
              const int ch = ch0 + o;
              acc[o] += w00 * r00[ch] + w01 * r01[ch] + w10 * r10[ch] +
                        w11 * r11[ch];
            }
          }
        }
        float* dst =
            out + ((static_cast<int64_t>(ri) * p + iy) * p + ix) * od;
        const float inv = 1.f / (s * s);
        for (int o = 0; o < od; ++o) dst[o] = acc[o] * inv;
      }
    }
  }
}

// Connected components; labels get first-encounter raster order (1..n).
// Returns the number of components.
int cc_label(const uint8_t* img, int h, int w, int connectivity,
             int32_t* labels) {
  UnionFind uf;
  uf.parent.push_back(0);  // background
  int32_t next = 1;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int64_t idx = static_cast<int64_t>(y) * w + x;
      if (!img[idx]) {
        labels[idx] = 0;
        continue;
      }
      int32_t left = x > 0 ? labels[idx - 1] : 0;
      int32_t up = y > 0 ? labels[idx - w] : 0;
      int32_t ul = (connectivity == 8 && y > 0 && x > 0) ? labels[idx - w - 1] : 0;
      int32_t ur = (connectivity == 8 && y > 0 && x + 1 < w) ? labels[idx - w + 1] : 0;
      int32_t lab = 0;
      for (int32_t nb : {left, up, ul, ur}) {
        if (nb) lab = lab ? std::min(lab, nb) : nb;
      }
      if (!lab) {
        lab = next++;
        uf.parent.push_back(lab);
      } else {
        for (int32_t nb : {left, up, ul, ur})
          if (nb) uf.unite(lab, nb);
      }
      labels[idx] = lab;
    }
  }
  // second pass: flatten + renumber in first-encounter order
  std::vector<int32_t> remap(next, 0);
  int32_t count = 0;
  for (int64_t idx = 0; idx < static_cast<int64_t>(h) * w; ++idx) {
    if (!labels[idx]) continue;
    int32_t root = uf.find(labels[idx]);
    if (!remap[root]) remap[root] = ++count;
    labels[idx] = remap[root];
  }
  return count;
}

// Moore boundary trace of component `lab`, starting at its topmost-leftmost
// pixel. Writes (x, y) int32 pairs; returns point count (<= max_pts).
int trace_boundary(const int32_t* labels, int h, int w, int32_t lab,
                   int start_y, int start_x, int32_t* out_xy, int max_pts) {
  static const int mdx[8] = {-1, -1, 0, 1, 1, 1, 0, -1};
  static const int mdy[8] = {0, -1, -1, -1, 0, 1, 1, 1};
  int cy = start_y, cx = start_x, b = 0, npts = 0;
  out_xy[0] = cx;
  out_xy[1] = cy;
  npts = 1;
  for (int guard = 0; guard < 8 * h * w; ++guard) {
    bool found = false;
    for (int i = 0; i < 8; ++i) {
      int d = (b + 1 + i) % 8;
      int ny = cy + mdy[d], nx = cx + mdx[d];
      if (ny >= 0 && ny < h && nx >= 0 && nx < w &&
          labels[static_cast<int64_t>(ny) * w + nx] == lab) {
        b = (d + 4) % 8;
        cy = ny;
        cx = nx;
        found = true;
        break;
      }
    }
    if (!found) break;                      // isolated pixel
    if (cy == start_y && cx == start_x) break;
    if (npts >= max_pts) break;
    out_xy[2 * npts] = cx;
    out_xy[2 * npts + 1] = cy;
    ++npts;
  }
  return npts;
}

// Min-area rect via convex hull + rotating calipers over unique edge angles.
// pts: (n, 2) float64 (x, y); out: 8 doubles (4 corners, clockwise y-down)
// + out_wh: 2 doubles.
void min_area_rect(const double* pts_in, int n, double* out, double* out_wh) {
  std::vector<std::pair<double, double>> pts(n);
  for (int i = 0; i < n; ++i) pts[i] = {pts_in[2 * i], pts_in[2 * i + 1]};
  std::sort(pts.begin(), pts.end());
  pts.erase(std::unique(pts.begin(), pts.end()), pts.end());
  const int m = static_cast<int>(pts.size());
  auto cross = [](const std::pair<double, double>& o,
                  const std::pair<double, double>& a,
                  const std::pair<double, double>& b) {
    return (a.first - o.first) * (b.second - o.second) -
           (a.second - o.second) * (b.first - o.first);
  };
  std::vector<std::pair<double, double>> hull;
  if (m == 1) {
    for (int i = 0; i < 4; ++i) {
      out[2 * i] = pts[0].first;
      out[2 * i + 1] = pts[0].second;
    }
    out_wh[0] = out_wh[1] = 0.0;
    return;
  }
  if (m == 2) {
    out[0] = pts[0].first; out[1] = pts[0].second;
    out[2] = pts[1].first; out[3] = pts[1].second;
    out[4] = pts[1].first; out[5] = pts[1].second;
    out[6] = pts[0].first; out[7] = pts[0].second;
    out_wh[0] = std::hypot(pts[1].first - pts[0].first,
                           pts[1].second - pts[0].second);
    out_wh[1] = 0.0;
    return;
  }
  for (const auto& p : pts) {  // lower
    while (hull.size() >= 2 &&
           cross(hull[hull.size() - 2], hull.back(), p) <= 0)
      hull.pop_back();
    hull.push_back(p);
  }
  const size_t lower = hull.size() + 1;
  for (int i = m - 2; i >= 0; --i) {  // upper
    while (hull.size() >= lower &&
           cross(hull[hull.size() - 2], hull.back(), pts[i]) <= 0)
      hull.pop_back();
    hull.push_back(pts[i]);
  }
  hull.pop_back();

  double best_area = -1.0, best_theta = 0.0;
  double bx0 = 0, by0 = 0, bx1 = 0, by1 = 0;
  const size_t hn = hull.size();
  for (size_t e = 0; e < hn; ++e) {
    const auto& a = hull[e];
    const auto& b2 = hull[(e + 1) % hn];
    double theta = std::atan2(b2.second - a.second, b2.first - a.first);
    theta = std::fmod(theta, M_PI / 2);
    if (theta < 0) theta += M_PI / 2;
    const double c = std::cos(theta), s = std::sin(theta);
    double x0 = 1e300, y0 = 1e300, x1 = -1e300, y1 = -1e300;
    for (const auto& p : hull) {
      const double px = c * p.first + s * p.second;
      const double py = -s * p.first + c * p.second;
      x0 = std::min(x0, px); x1 = std::max(x1, px);
      y0 = std::min(y0, py); y1 = std::max(y1, py);
    }
    const double area = (x1 - x0) * (y1 - y0);
    if (best_area < 0 || area < best_area) {
      best_area = area;
      best_theta = theta;
      bx0 = x0; by0 = y0; bx1 = x1; by1 = y1;
    }
  }
  const double c = std::cos(best_theta), s = std::sin(best_theta);
  const double corners_rot[4][2] = {
      {bx0, by0}, {bx1, by0}, {bx1, by1}, {bx0, by1}};
  double corners[4][2];
  for (int i = 0; i < 4; ++i) {
    corners[i][0] = c * corners_rot[i][0] - s * corners_rot[i][1];
    corners[i][1] = s * corners_rot[i][0] + c * corners_rot[i][1];
  }
  // clockwise in y-down coords has POSITIVE shoelace sum (the
  // cv2.boxPoints convention the 4-point warp assumes); reverse CCW
  double area2 = 0.0;
  for (int i = 0; i < 4; ++i) {
    area2 += corners[i][0] * corners[(i + 1) % 4][1] -
             corners[(i + 1) % 4][0] * corners[i][1];
  }
  if (area2 < 0) {
    std::swap(corners[0][0], corners[3][0]);
    std::swap(corners[0][1], corners[3][1]);
    std::swap(corners[1][0], corners[2][0]);
    std::swap(corners[1][1], corners[2][1]);
  }
  for (int i = 0; i < 4; ++i) {
    out[2 * i] = corners[i][0];
    out[2 * i + 1] = corners[i][1];
  }
  out_wh[0] = bx1 - bx0;
  out_wh[1] = by1 - by0;
}

}  // extern "C"
