// Native volume kernels: 3D squared Euclidean distance transform and
// 26-connectivity component labeling.
//
// These are two of the reference's C-backed hot host ops (scipy
// distance_transform_edt, generateVesselVolume.py:183 and
// manualCorrectionGUI.py:243-249; skimage/scipy label,
// generateVesselVolume.py:107-136) reimplemented natively so the host
// side of the pipeline never round-trips a full volume through the
// accelerator link just to compute distances or drop small blobs.
//
// EDT: Felzenszwalb & Huttenlocher separable lower-envelope transform,
// exact, three 1D passes; rows are independent -> OpenMP across rows.
// CC: scan + explicit-worklist flood fill over foreground only.
//
// Build: g++ -O3 -fopenmp -shared -fPIC volume_ops.cpp (see ops/native.py)

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

// "no background seen" sentinel.  Finite so the lower-envelope arithmetic
// needs no special cases.  The transform runs in float32: every finite
// squared distance is an integer sum of three squares < 2^24 (volumes up
// to ~2000 per axis), hence exact; sentinel-site envelope crossings lose
// precision but sentinel sites only ever produce sentinel-level outputs
// (a mixed crossing has a huge exact-signed numerator), so results are
// unaffected.
constexpr float kLarge = 1e15f;
constexpr float kInf = std::numeric_limits<float>::infinity();

// 1D squared-distance lower envelope (Felzenszwalb-Huttenlocher).
// f: input costs, d: output, n: length; v/z: scratch of size n / n+1.
template <typename T>
inline void dt1d(const T* f, T* d, int n, int* v, T* z) {
    int k = 0;
    v[0] = 0;
    z[0] = -kInf;
    z[1] = kInf;
    for (int q = 1; q < n; ++q) {
        T s;
        while (true) {
            s = ((f[q] + T(q) * q) - (f[v[k]] + T(v[k]) * v[k]))
                / (T(2) * q - T(2) * v[k]);
            if (s <= z[k]) { --k; }
            else break;
        }
        ++k;
        v[k] = q;
        z[k] = s;
        z[k + 1] = kInf;
    }
    k = 0;
    for (int q = 0; q < n; ++q) {
        while (z[k + 1] < q) ++k;
        d[q] = (T(q) - v[k]) * (T(q) - v[k]) + f[v[k]];
    }
}

}  // namespace

extern "C" {

// Exact squared EDT (distance to nearest background voxel) of a binary
// mask: out[i] = 0 where mask==0, else min over background of squared
// Euclidean distance.  out must hold nz*ny*nx floats.
void edt3d_sq(const uint8_t* mask, int nz, int ny, int nx, float* out) {
    const long plane = static_cast<long>(ny) * nx;
    const long total = static_cast<long>(nz) * plane;

    // foreground projections: a later-pass column whose input is all
    // zero produces all zero (the envelope of zero parabolas), so empty
    // columns are skipped outright — vessels occupy <1% of an MRA and
    // the nonzero support of every pass equals the foreground support
    std::vector<uint8_t> proj_zx(static_cast<size_t>(nz) * nx, 0);
    std::vector<uint8_t> proj_yx(static_cast<size_t>(ny) * nx, 0);

    // pass 1 (x, contiguous): exact 1D distance to nearest 0 per row
#pragma omp parallel
    {
        std::vector<float> buf(nx);
#pragma omp for schedule(static)
        for (long r = 0; r < static_cast<long>(nz) * ny; ++r) {
            const int zi = static_cast<int>(r / ny);
            const int yi = static_cast<int>(r % ny);
            const uint8_t* m = mask + r * nx;
            float* o = out + r * nx;
            uint8_t* pzx = proj_zx.data() + static_cast<long>(zi) * nx;
            uint8_t* pyx = proj_yx.data() + static_cast<long>(yi) * nx;
            float run = kLarge;
            for (int x = 0; x < nx; ++x) {
                run = m[x] ? ((run >= kLarge) ? kLarge : run + 1.0f) : 0.0f;
                buf[x] = run;
                if (m[x]) { pzx[x] = 1; pyx[x] = 1; }
            }
            run = kLarge;
            for (int x = nx - 1; x >= 0; --x) {
                run = m[x] ? ((run >= kLarge) ? kLarge : run + 1.0f) : 0.0f;
                float v = buf[x] < run ? buf[x] : run;
                o[x] = (v >= kLarge) ? kLarge : v * v;
            }
        }
    }

    // passes 2 (y) and 3 (z): lower envelope along a strided axis.
    // Columns are gathered into a contiguous tile TILE-at-a-time so the
    // strided reads touch whole cache lines (63x fewer cache misses than
    // one-column-at-a-time at MRA strides).
    constexpr int TILE = 64;
    auto strided_pass = [&](int len, long stride, long n_cols,
                            auto col_base, auto col_nonempty) {
#pragma omp parallel
        {
            std::vector<float> tile(static_cast<size_t>(TILE) * len);
            std::vector<float> d(len), z(len + 1);
            std::vector<int> v(len);
            std::vector<long> cols(TILE);
#pragma omp for schedule(static)
            for (long c0 = 0; c0 < n_cols; c0 += TILE) {
                long c1 = c0 + TILE <= n_cols ? c0 + TILE : n_cols;
                int w = 0;
                for (long c = c0; c < c1; ++c)
                    if (col_nonempty(c)) cols[w++] = c;
                if (w == 0) continue;
                for (int i = 0; i < len; ++i) {
                    for (int j = 0; j < w; ++j)
                        tile[static_cast<size_t>(j) * len + i] =
                            col_base(cols[j])[static_cast<long>(i) * stride];
                }
                for (int j = 0; j < w; ++j) {
                    float* f = tile.data() + static_cast<size_t>(j) * len;
                    dt1d(f, d.data(), len, v.data(), z.data());
                    std::memcpy(f, d.data(), sizeof(float) * len);
                }
                for (int i = 0; i < len; ++i) {
                    for (int j = 0; j < w; ++j)
                        col_base(cols[j])[static_cast<long>(i) * stride] =
                            tile[static_cast<size_t>(j) * len + i];
                }
            }
        }
    };

    // pass 2 (y): columns indexed by (z, x), consecutive x are contiguous
    strided_pass(ny, nx, static_cast<long>(nz) * nx,
                 [&](long c) {
                     long zi = c / nx, x = c % nx;
                     return out + zi * plane + x;
                 },
                 [&](long c) { return proj_zx[c] != 0; });
    // pass 3 (z): columns indexed by (y, x) = flat plane offset
    strided_pass(nz, plane, plane, [&](long c) { return out + c; },
                 [&](long c) { return proj_yx[c] != 0; });

    // foreground-only contract: background stays exactly 0; a foreground
    // volume with no background at all keeps the LARGE sentinel
    for (long i = 0; i < total; ++i)
        if (!mask[i]) out[i] = 0.0f;
}

// Banded exact squared EDT evaluated AT FOREGROUND VOXELS ONLY.
//
// The pipeline consumers of the distance transform (thinning order,
// centerline radius recovery) only ever read it at vessel voxels, where
// the distance to the wall is bounded by the largest vessel radius — a
// handful of voxels.  Scanning candidate offsets in increasing
// squared-norm order makes the first background hit the exact minimum,
// so the cost per voxel is ~(4/3)pi d^3 probes instead of three
// full-volume envelope passes.  Background stays exactly 0 (same
// contract as edt3d_sq).
//
// Returns the number of UNRESOLVED foreground voxels (no background
// within r_max; their out value is kLarge) — callers fall back to the
// full transform when nonzero.
long edt3d_sq_masked(const uint8_t* mask, int nz, int ny, int nx,
                     int r_max, float* out) {
    const long plane = static_cast<long>(ny) * nx;
    const long total = static_cast<long>(nz) * plane;
    const long r2max = static_cast<long>(r_max) * r_max;

    struct Off { int32_t d2; int16_t dz, dy, dx; };
    std::vector<Off> offs;
    offs.reserve(static_cast<size_t>(4.2 * r_max * r_max * r_max) + 64);
    for (int dz = -r_max; dz <= r_max; ++dz)
        for (int dy = -r_max; dy <= r_max; ++dy)
            for (int dx = -r_max; dx <= r_max; ++dx) {
                long d2 = static_cast<long>(dz) * dz
                        + static_cast<long>(dy) * dy
                        + static_cast<long>(dx) * dx;
                if (d2 == 0 || d2 > r2max) continue;
                offs.push_back({static_cast<int32_t>(d2),
                                static_cast<int16_t>(dz),
                                static_cast<int16_t>(dy),
                                static_cast<int16_t>(dx)});
            }
    std::sort(offs.begin(), offs.end(),
              [](const Off& a, const Off& b) { return a.d2 < b.d2; });
    const size_t n_off = offs.size();
    std::vector<long> flat(n_off);
    for (size_t i = 0; i < n_off; ++i)
        flat[i] = (static_cast<long>(offs[i].dz) * ny + offs[i].dy) * nx
                + offs[i].dx;
    // first offset index with d2 >= k: lets a voxel's scan start at a
    // proven lower bound instead of offset 0
    std::vector<int32_t> start_at(static_cast<size_t>(r2max) + 2, 0);
    {
        size_t i = 0;
        for (long k = 0; k <= r2max + 1; ++k) {
            while (i < n_off && offs[i].d2 < k) ++i;
            start_at[k] = static_cast<int32_t>(i);
        }
    }

    std::memset(out, 0, sizeof(float) * total);
    long unresolved = 0;
#pragma omp parallel reduction(+ : unresolved)
    {
#pragma omp for schedule(dynamic, 4)
        for (int z = 0; z < nz; ++z) {
            const bool z_in = (z >= r_max && z < nz - r_max);
            for (int y = 0; y < ny; ++y) {
                const bool zy_in = z_in && y >= r_max && y < ny - r_max;
                const long row = (static_cast<long>(z) * ny + y) * nx;
                float prev_d2 = 0.0f;  // d2 of the previous fg voxel in x
                for (int x = 0; x < nx; ++x) {
                    // skip all-zero 8-byte words (~0.6% foreground)
                    if (!(x & 7) && x + 8 <= nx) {
                        uint64_t w;
                        std::memcpy(&w, mask + row + x, 8);
                        if (!w) { x += 7; prev_d2 = 0.0f; continue; }
                    }
                    if (!mask[row + x]) { prev_d2 = 0.0f; continue; }
                    const long p = row + x;
                    // exact seeded scan: d(v) >= d(neighbor) - 1
                    // (triangle inequality), so the sorted scan can
                    // start at (d_nb - 1)^2.  Neighbors: x-1 (this
                    // walk), y-1 and z-1 (already written into `out`;
                    // an unwritten 0.0 only weakens the bound).  The
                    // kLarge sentinel means d_nb > r_max, so clamping
                    // to r2max keeps the bound valid.  This turns the
                    // thick-vessel interior cost from O(d^3) probes
                    // per voxel into O(shell).
                    float nb = prev_d2;
                    if (y > 0 && mask[p - nx] && out[p - nx] > nb)
                        nb = out[p - nx];
                    if (z > 0 && mask[p - plane] && out[p - plane] > nb)
                        nb = out[p - plane];
                    size_t i0 = 0;
                    if (nb > 4.0f) {
                        if (nb > static_cast<float>(r2max))
                            nb = static_cast<float>(r2max);
                        const float lb2 = nb - 2.0f * std::sqrt(nb);
                        if (lb2 > 0.0f)
                            i0 = static_cast<size_t>(
                                start_at[static_cast<long>(lb2)]);
                    }
                    float d2 = kLarge;
                    if (zy_in && x >= r_max && x < nx - r_max) {
                        // interior: no bounds checks on the probes
                        for (size_t i = i0; i < n_off; ++i) {
                            if (!mask[p + flat[i]]) {
                                d2 = static_cast<float>(offs[i].d2);
                                break;
                            }
                        }
                    } else {
                        for (size_t i = i0; i < n_off; ++i) {
                            const int z2 = z + offs[i].dz;
                            const int y2 = y + offs[i].dy;
                            const int x2 = x + offs[i].dx;
                            if (z2 < 0 || z2 >= nz || y2 < 0 || y2 >= ny
                                || x2 < 0 || x2 >= nx) continue;
                            if (!mask[p + flat[i]]) {
                                d2 = static_cast<float>(offs[i].d2);
                                break;
                            }
                        }
                    }
                    out[p] = d2;
                    prev_d2 = d2;
                    if (d2 >= kLarge) ++unresolved;
                }
            }
        }
    }
    return unresolved;
}

// 26-connectivity component labeling.  labels must be zero-initialized,
// same shape as mask.  Returns the number of components; labels are
// 1..K in scan order of each component's first voxel (matching scipy
// ndimage.label with a full 3x3x3 structure).
long label_components_26(const uint8_t* mask, int nz, int ny, int nx,
                         int32_t* labels) {
    const long plane = static_cast<long>(ny) * nx;
    const long total = static_cast<long>(nz) * plane;
    std::vector<long> stack;
    stack.reserve(1 << 16);
    long next = 0;
    for (long start = 0; start < total; ++start) {
        if (!mask[start] || labels[start]) continue;
        ++next;
        labels[start] = static_cast<int32_t>(next);
        stack.push_back(start);
        while (!stack.empty()) {
            long cur = stack.back();
            stack.pop_back();
            int zc = static_cast<int>(cur / plane);
            int yc = static_cast<int>((cur % plane) / nx);
            int xc = static_cast<int>(cur % nx);
            for (int dz = -1; dz <= 1; ++dz) {
                int z2 = zc + dz;
                if (z2 < 0 || z2 >= nz) continue;
                for (int dy = -1; dy <= 1; ++dy) {
                    int y2 = yc + dy;
                    if (y2 < 0 || y2 >= ny) continue;
                    for (int dx = -1; dx <= 1; ++dx) {
                        int x2 = xc + dx;
                        if (x2 < 0 || x2 >= nx) continue;
                        long q = (static_cast<long>(z2) * ny + y2) * nx + x2;
                        if (mask[q] && !labels[q]) {
                            labels[q] = static_cast<int32_t>(next);
                            stack.push_back(q);
                        }
                    }
                }
            }
        }
    }
    return next;
}

// Zero components with <= threshold voxels, in place.  Returns the
// number of surviving components (generateVesselVolume.py:195-199).
long drop_small_components_26(uint8_t* mask, int nz, int ny, int nx,
                              long threshold) {
    const long total = static_cast<long>(nz) * ny * nx;
    // static scratch: a fresh 4*total allocation would be mmap'd and
    // first-touched on every call (~seconds at MRA scale on this VM);
    // reusing keeps the pages heap-resident across pipeline runs.
    // NOT thread-safe (unlike the OpenMP kernels above, this function
    // must not be called concurrently), and the scratch pins
    // 4 B/voxel of the largest volume seen for process lifetime —
    // both deliberate for the single-threaded pipeline.
    static std::vector<int32_t> labels;
    labels.assign(total, 0);
    long k = label_components_26(mask, nz, ny, nx, labels.data());
    if (k == 0) return 0;
    std::vector<long> sizes(k + 1, 0);
    for (long i = 0; i < total; ++i) ++sizes[labels[i]];
    std::vector<uint8_t> keep(k + 1, 0);
    long kept = 0;
    for (long c = 1; c <= k; ++c)
        if (sizes[c] > threshold) { keep[c] = 1; ++kept; }
    for (long i = 0; i < total; ++i)
        if (!keep[labels[i]]) mask[i] = 0;
    return kept;
}

// Hysteresis component selection: keep 26-connected components of `weak`
// that contain at least one `strong` voxel and have > min_size voxels;
// `weak` becomes the result mask in place.  Returns the number of kept
// components.  (The reference reaches the same goal with a strong
// threshold + variational growing, generateVesselVolume.py:186-199 +
// variationalRegionGrowing.py:10; seeded flood fill visits only the kept
// components instead of labeling the whole volume.)
// Single-threaded (the BFS is inherently sequential per component and
// the scan is memory-bound); not thread-safe on overlapping buffers.
long hysteresis_components_26(uint8_t* weak, const uint8_t* strong,
                              int nz, int ny, int nx, long min_size) {
    const long plane = static_cast<long>(ny) * nx;
    const long total = static_cast<long>(nz) * plane;
    std::vector<long> stack;
    std::vector<long> member;
    stack.reserve(1 << 16);
    member.reserve(1 << 16);
    long kept = 0;
    // weak voxel states: 1 = unvisited foreground, 2 = kept
    for (long start = 0; start < total; ++start) {
        if (!strong[start] || weak[start] != 1) continue;
        member.clear();
        weak[start] = 2;
        stack.push_back(start);
        member.push_back(start);
        while (!stack.empty()) {
            long cur = stack.back();
            stack.pop_back();
            int zc = static_cast<int>(cur / plane);
            int yc = static_cast<int>((cur % plane) / nx);
            int xc = static_cast<int>(cur % nx);
            for (int dz = -1; dz <= 1; ++dz) {
                int z2 = zc + dz;
                if (z2 < 0 || z2 >= nz) continue;
                for (int dy = -1; dy <= 1; ++dy) {
                    int y2 = yc + dy;
                    if (y2 < 0 || y2 >= ny) continue;
                    for (int dx = -1; dx <= 1; ++dx) {
                        int x2 = xc + dx;
                        if (x2 < 0 || x2 >= nx) continue;
                        long q = (static_cast<long>(z2) * ny + y2) * nx + x2;
                        if (weak[q] == 1) {
                            weak[q] = 2;
                            stack.push_back(q);
                            member.push_back(q);
                        }
                    }
                }
            }
        }
        if (static_cast<long>(member.size()) <= min_size) {
            for (long q : member) weak[q] = 0;  // too small: drop
        } else {
            ++kept;
        }
    }
    // finalize: kept voxels -> 1, unreached weak voxels -> 0
    for (long i = 0; i < total; ++i) weak[i] = (weak[i] == 2) ? 1 : 0;
    return kept;
}

// Same selection from a 2x-downsampled (any-pooled) strong mask: every
// voxel pair inside a 2x2x2 block is 26-adjacent, so any weak voxel in
// a block that contained a strong voxel lies in the strong voxel's
// component — seeding from it selects exactly the same components while
// the strong mask crosses the wire at 1/8 the bits.
long hysteresis_components_ds2_26(uint8_t* weak, const uint8_t* strong_ds,
                                  int nz, int ny, int nx, long min_size) {
    const long plane = static_cast<long>(ny) * nx;
    const long total = static_cast<long>(nz) * plane;
    const int dz = (nz + 1) / 2, dy = (ny + 1) / 2, dx = (nx + 1) / 2;
    std::vector<long> stack;
    std::vector<long> member;
    stack.reserve(1 << 16);
    member.reserve(1 << 16);
    long kept = 0;
    for (int cz = 0; cz < dz; ++cz)
        for (int cy = 0; cy < dy; ++cy)
            for (int cx = 0; cx < dx; ++cx) {
                if (!strong_ds[(static_cast<long>(cz) * dy + cy) * dx + cx])
                    continue;
                // seed every unvisited weak voxel in the 2x2x2 block
                // (they are all in the seed's component)
                for (int oz = 0; oz < 2; ++oz) {
                    int z0 = 2 * cz + oz;
                    if (z0 >= nz) continue;
                    for (int oy = 0; oy < 2; ++oy) {
                        int y0 = 2 * cy + oy;
                        if (y0 >= ny) continue;
                        for (int ox = 0; ox < 2; ++ox) {
                            int x0 = 2 * cx + ox;
                            if (x0 >= nx) continue;
                            long start =
                                (static_cast<long>(z0) * ny + y0) * nx + x0;
                            if (weak[start] != 1) continue;
                            member.clear();
                            weak[start] = 2;
                            stack.push_back(start);
                            member.push_back(start);
                            while (!stack.empty()) {
                                long cur = stack.back();
                                stack.pop_back();
                                int zc = static_cast<int>(cur / plane);
                                int yc = static_cast<int>((cur % plane) / nx);
                                int xc = static_cast<int>(cur % nx);
                                for (int ddz = -1; ddz <= 1; ++ddz) {
                                    int z2 = zc + ddz;
                                    if (z2 < 0 || z2 >= nz) continue;
                                    for (int ddy = -1; ddy <= 1; ++ddy) {
                                        int y2 = yc + ddy;
                                        if (y2 < 0 || y2 >= ny) continue;
                                        for (int ddx = -1; ddx <= 1; ++ddx) {
                                            int x2 = xc + ddx;
                                            if (x2 < 0 || x2 >= nx) continue;
                                            long q = (static_cast<long>(z2)
                                                      * ny + y2) * nx + x2;
                                            if (weak[q] == 1) {
                                                weak[q] = 2;
                                                stack.push_back(q);
                                                member.push_back(q);
                                            }
                                        }
                                    }
                                }
                            }
                            if (static_cast<long>(member.size())
                                <= min_size) {
                                for (long q : member) weak[q] = 0;
                            } else {
                                ++kept;
                            }
                        }
                    }
                }
            }
    for (long i = 0; i < total; ++i) weak[i] = (weak[i] == 2) ? 1 : 0;
    return kept;
}

// Packed-bit entry for the ds2 hysteresis selection: `weak_packed` and
// `strong_ds_packed` arrive as MSB-first packed bits (np.packbits order,
// the device wire format of utils/transfer.pack_mask).  The weak mask is
// unpacked natively into the caller-owned `out` buffer (nz*ny*nx uint8)
// with a 256-entry 8-byte LUT in one pass — replacing the host-side
// unpackbits -> bool -> uint8 copy chain (three full-volume passes that
// dominated the segmentation stage at Speck scale on a 1-core host).
// `out` then becomes the result mask in place, exactly as
// hysteresis_components_ds2_26.  Returns the number of kept components.
// NOT thread-safe: reuses a static scratch for the unpacked strong mask
// (same deliberate single-threaded-pipeline tradeoff as
// drop_small_components_26 above).
long hysteresis_components_ds2_packed_26(
        const uint8_t* weak_packed, const uint8_t* strong_ds_packed,
        int nz, int ny, int nx, long min_size, uint8_t* out) {
    static uint64_t lut[256];
    static bool lut_ready = false;
    if (!lut_ready) {
        for (int b = 0; b < 256; ++b) {
            uint8_t e[8];
            for (int j = 0; j < 8; ++j) e[j] = (b >> (7 - j)) & 1;
            std::memcpy(&lut[b], e, 8);
        }
        lut_ready = true;
    }
    const long total = static_cast<long>(nz) * ny * nx;
    const long nfull = total / 8;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long k = 0; k < nfull; ++k)
        std::memcpy(out + 8 * k, &lut[weak_packed[k]], 8);
    for (long i = nfull * 8; i < total; ++i)
        out[i] = (weak_packed[i >> 3] >> (7 - (i & 7))) & 1;

    const int dz = (nz + 1) / 2, dy = (ny + 1) / 2, dx = (nx + 1) / 2;
    const long stotal = static_cast<long>(dz) * dy * dx;
    static std::vector<uint8_t> strong;
    strong.resize(stotal);
    const long sfull = stotal / 8;
    for (long k = 0; k < sfull; ++k)
        std::memcpy(strong.data() + 8 * k, &lut[strong_ds_packed[k]], 8);
    for (long i = sfull * 8; i < stotal; ++i)
        strong[i] = (strong_ds_packed[i >> 3] >> (7 - (i & 7))) & 1;
    return hysteresis_components_ds2_26(out, strong.data(), nz, ny, nx,
                                        min_size);
}

// Flat indices of nonzero bytes (truthiness scan) — the host-side
// replacement for np.argwhere on very sparse volumes (vessel masks
// ~0.6%, skeletons ~0.01%): all-zero 8-byte words are skipped, so the
// scan runs at memory-read speed instead of packbits+unpackbits passes.
// Writes at most `cap` indices; ALWAYS returns the true nonzero count
// (callers grow the buffer and rescan when count > cap).
long nonzero_indices_u8(const uint8_t* vol, long n,
                        int64_t* out, long cap) {
    long count = 0;
    const long n8 = n & ~7L;
    long i = 0;
    for (; i < n8; i += 8) {
        uint64_t w;
        std::memcpy(&w, vol + i, 8);
        if (!w) continue;
        for (int b = 0; b < 8; ++b)
            if (vol[i + b]) {
                if (count < cap) out[count] = i + b;
                ++count;
            }
    }
    for (; i < n; ++i)
        if (vol[i]) {
            if (count < cap) out[count] = i;
            ++count;
        }
    return count;
}

// Row-adaptive low-bit quantize + pack for the vesselness upload
// stream (ops/vesselness.frangi_vesselness_streamed, formats
// "bq4"/"bq3"/"bq2").  One pass over the slab: each x-row (nx floats,
// L1-resident) is scanned for min/max, then re-read from cache and
// packed MSB-first — 2 voxels/byte (bits=4, nx even), 8 voxels/3 bytes
// (bits=3, nx%8==0), or 4 voxels/byte (bits=2, nx%4==0).  Matches the
// numpy fallbacks bit-exactly (rintf == np.round, half-to-even).
static void bq_pack_one_row(const float* row, long nx, int bits, int qmax,
                            uint8_t* out, float* scale_out, float* min_out) {
    float mn = row[0], mx = row[0];
    for (long i = 1; i < nx; ++i) {
        const float v = row[i];
        mn = v < mn ? v : mn;
        mx = v > mx ? v : mx;
    }
    const float rng = mx - mn;
    // clamp the denominator exactly like the numpy fallback
    // (15.0/max(rng, 1e-30)): a subnormal range would overflow inv
    // to inf and feed NaN into rintf at the min voxel
    const float inv = rng > 0.0f
        ? static_cast<float>(qmax) / (rng > 1e-30f ? rng : 1e-30f)
        : 0.0f;
    *min_out = mn;
    *scale_out = rng / static_cast<float>(qmax);
    auto q = [&](long i) {
        int v = (int)rintf((row[i] - mn) * inv);
        return v > qmax ? qmax : v;
    };
    if (bits == 4) {
        for (long j = 0; j < nx / 2; ++j)
            out[j] = (uint8_t)((q(2 * j) << 4) | q(2 * j + 1));
    } else if (bits == 2) {
        for (long j = 0; j < nx / 4; ++j)
            out[j] = (uint8_t)((q(4 * j) << 6) | (q(4 * j + 1) << 4)
                               | (q(4 * j + 2) << 2) | q(4 * j + 3));
    } else {  // bits == 3: 8 voxels -> one 24-bit MSB-first word
        for (long j = 0; j < nx / 8; ++j) {
            uint32_t w = 0;
            for (int k = 0; k < 8; ++k)
                w |= (uint32_t)q(8 * j + k) << (21 - 3 * k);
            out[3 * j] = (uint8_t)(w >> 16);
            out[3 * j + 1] = (uint8_t)(w >> 8);
            out[3 * j + 2] = (uint8_t)w;
        }
    }
}

void bqn_pack_f32(const float* sl, long nrows, long nx, int bits,
                  uint8_t* packed, float* row_scale, float* row_min) {
    const int qmax = (1 << bits) - 1;
    const long row_bytes = nx * bits / 8;
    #pragma omp parallel for schedule(static)
    for (long r = 0; r < nrows; ++r)
        bq_pack_one_row(sl + r * nx, nx, bits, qmax, packed + r * row_bytes,
                        row_scale + r, row_min + r);
}

// Row min/max stats only: the occupancy-skipped upload
// (ops/vesselness._pack_compact_native) needs every row's range to
// decide keep/skip BEFORE any payload bytes are produced — background
// rows (80-90% at MRA-like occupancy) then skip the quantize+pack
// entirely.  Same scan order as bq_pack_one_row, so the derived
// scale/min sideband is bit-identical to the full pack's.
void bqn_row_stats_f32(const float* sl, long nrows, long nx,
                       float* row_min, float* row_max) {
    #pragma omp parallel for schedule(static)
    for (long r = 0; r < nrows; ++r) {
        const float* row = sl + r * nx;
        float mn = row[0], mx = row[0];
        for (long i = 1; i < nx; ++i) {
            const float v = row[i];
            mn = v < mn ? v : mn;
            mx = v > mx ? v : mx;
        }
        row_min[r] = mn;
        row_max[r] = mx;
    }
}

// Quantize+pack ONLY the selected rows (the kept chunks of the
// occupancy-skipped upload): output row j is input row rows[j], packed
// exactly as bqn_pack_f32 packs it (identical scan and rounding, so
// kept rows stay bit-identical to the dense wire).
void bqn_pack_rows_f32(const float* sl, long nx, int bits,
                       const int64_t* rows, long k, uint8_t* packed) {
    const int qmax = (1 << bits) - 1;
    const long row_bytes = nx * bits / 8;
    #pragma omp parallel for schedule(static)
    for (long j = 0; j < k; ++j) {
        float scale_dump, min_dump;
        bq_pack_one_row(sl + rows[j] * nx, nx, bits, qmax,
                        packed + j * row_bytes, &scale_dump, &min_dump);
    }
}

// Back-compat alias for the original 4-bit entry point.
void bq4_pack_f32(const float* sl, long nrows, long nx,
                  uint8_t* packed, float* row_scale, float* row_min) {
    bqn_pack_f32(sl, nrows, nx, 4, packed, row_scale, row_min);
}

}  // extern "C"
