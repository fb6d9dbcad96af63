// Sequential distance-ordered curve thinning.
//
// Native counterpart of arterynetwork_tpu/ops/thinning.py — the framework's
// replacement for the reference's only native component (Amy Tabb's
// curve-skeletonization binary, skeletonization.py:150-162).  Same
// simple-point predicate (Bertrand T26/T6 component counts, derived in
// ops/simple_point.py), but strictly sequential deletion with immediate
// rechecking, which is the textbook guarantee of topology preservation and
// serves as the gold reference for the parallel TPU kernel.
//
// Build: g++ -O3 -shared -fPIC thinning.cpp -o libthinning.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <queue>
#include <cmath>
#include <algorithm>

namespace {

struct Vol {
    uint8_t* d;
    int nz, ny, nx;
    inline bool at(int z, int y, int x) const {
        if (z < 0 || y < 0 || x < 0 || z >= nz || y >= ny || x >= nx)
            return false;
        return d[(static_cast<long>(z) * ny + y) * nx + x] != 0;
    }
    inline long idx(int z, int y, int x) const {
        return (static_cast<long>(z) * ny + y) * nx + x;
    }
};

// offsets of the 26 neighbors, cube-scan order
static int OFF[26][3];
static bool off_init = false;
// adjacency inside the 3x3x3 cube under 26-connectivity
static int ADJ26[26][26];
static int ADJ26_N[26];
// 18-neighborhood indices (into OFF) and 6-adjacency among them
static int N18[18];
static int ADJ6[18][18];
static int ADJ6_N[18];
static int FACE18[6];  // positions (into N18) of the 6 face neighbors
// bitmask forms of the same tables (fixed-point reachability in a
// register instead of array flood fills — is_simple dominates thinning)
static uint32_t ADJ26_MASK[26];
static uint32_t ADJ6_MASK[18];
static int POS18[26];        // 26-index -> 18-index or -1
static uint32_t FACE_MASK18;  // face-neighbor bits in 18-space
static uint32_t FACE_MASK26;  // face-neighbor bits in 26-space

static void init_tables() {
    if (off_init) return;
    int k = 0;
    for (int dz = -1; dz <= 1; ++dz)
        for (int dy = -1; dy <= 1; ++dy)
            for (int dx = -1; dx <= 1; ++dx) {
                if (!dz && !dy && !dx) continue;
                OFF[k][0] = dz; OFF[k][1] = dy; OFF[k][2] = dx; ++k;
            }
    for (int i = 0; i < 26; ++i) {
        ADJ26_N[i] = 0;
        for (int j = 0; j < 26; ++j) {
            if (i == j) continue;
            int dz = std::abs(OFF[i][0] - OFF[j][0]);
            int dy = std::abs(OFF[i][1] - OFF[j][1]);
            int dx = std::abs(OFF[i][2] - OFF[j][2]);
            if (std::max(dz, std::max(dy, dx)) == 1)
                ADJ26[i][ADJ26_N[i]++] = j;
        }
    }
    int m = 0, f = 0;
    for (int i = 0; i < 26; ++i) {
        int man = std::abs(OFF[i][0]) + std::abs(OFF[i][1]) + std::abs(OFF[i][2]);
        if (man <= 2) {
            if (man == 1) FACE18[f++] = m;
            N18[m++] = i;
        }
    }
    for (int a = 0; a < 18; ++a) {
        ADJ6_N[a] = 0;
        for (int b = 0; b < 18; ++b) {
            if (a == b) continue;
            int i = N18[a], j = N18[b];
            int man = std::abs(OFF[i][0] - OFF[j][0])
                    + std::abs(OFF[i][1] - OFF[j][1])
                    + std::abs(OFF[i][2] - OFF[j][2]);
            if (man == 1) ADJ6[a][ADJ6_N[a]++] = b;
        }
    }
    for (int i = 0; i < 26; ++i) {
        ADJ26_MASK[i] = 0;
        for (int a = 0; a < ADJ26_N[i]; ++a)
            ADJ26_MASK[i] |= 1u << ADJ26[i][a];
    }
    for (int a = 0; a < 18; ++a) {
        ADJ6_MASK[a] = 0;
        for (int b = 0; b < ADJ6_N[a]; ++b)
            ADJ6_MASK[a] |= 1u << ADJ6[a][b];
    }
    for (int i = 0; i < 26; ++i) POS18[i] = -1;
    for (int a = 0; a < 18; ++a) POS18[N18[a]] = a;
    FACE_MASK18 = 0;
    for (int f = 0; f < 6; ++f) FACE_MASK18 |= 1u << FACE18[f];
    FACE_MASK26 = 0;
    for (int i = 0; i < 26; ++i)
        if (std::abs(OFF[i][0]) + std::abs(OFF[i][1])
            + std::abs(OFF[i][2]) == 1)
            FACE_MASK26 |= 1u << i;
    off_init = true;
}

// fixed point of reach |= (neighbors of reach) & domain
static inline uint32_t grow_mask(uint32_t seed, uint32_t domain,
                                 const uint32_t* adj) {
    uint32_t reach = seed, frontier = seed;
    while (frontier) {
        uint32_t nbrs = 0;
        do {
            int j = __builtin_ctz(frontier);
            nbrs |= adj[j];
            frontier &= frontier - 1;
        } while (frontier);
        frontier = nbrs & domain & ~reach;
        reach |= frontier;
    }
    return reach;
}

// T26 == 1 and T6 == 1 given the neighborhood as bitmasks: m26 =
// foreground bits (cube-scan order), m18 = the same restricted to the
// 18-neighborhood (18-space order).
static inline bool is_simple_mask(uint32_t m26, uint32_t m18,
                                  int* fg_count) {
    *fg_count = __builtin_popcount(m26);
    if (!m26) return false;
    // T26: all foreground neighbors in one 26-component
    uint32_t seed = m26 & (~m26 + 1);  // lowest set bit
    if (grow_mask(seed, m26, ADJ26_MASK) != m26) return false;
    // T6: exactly one 6-component of background in N18 touches a face
    uint32_t bg = ~m18 & 0x3FFFFu;
    uint32_t faces = bg & FACE_MASK18;
    if (!faces) return false;
    uint32_t seed6 = faces & (~faces + 1);
    uint32_t reach = grow_mask(seed6, bg, ADJ6_MASK);
    return (faces & ~reach) == 0;
}

// flat neighbor offsets for the bounds-free interior gather (sequential
// worklist: a per-shape static cache is safe)
static long FOFF[26];
static int foff_ny = -1, foff_nx = -1;

static inline void ensure_foff(const Vol& v) {
    if (foff_ny != v.ny || foff_nx != v.nx) {
        for (int k = 0; k < 26; ++k)
            FOFF[k] = (static_cast<long>(OFF[k][0]) * v.ny
                       + OFF[k][1]) * v.nx + OFF[k][2];
        foff_ny = v.ny;
        foff_nx = v.nx;
    }
}

// 26-bit foreground mask of the neighborhood of (z,y,x), cube-scan order
static inline uint32_t gather26(const Vol& v, int z, int y, int x) {
    uint32_t m26 = 0;
    if (z > 0 && y > 0 && x > 0
        && z < v.nz - 1 && y < v.ny - 1 && x < v.nx - 1) {
        ensure_foff(v);
        const uint8_t* c = v.d + v.idx(z, y, x);
        for (int k = 0; k < 26; ++k)
            if (c[FOFF[k]]) m26 |= 1u << k;
    } else {
        for (int k = 0; k < 26; ++k)
            if (v.at(z + OFF[k][0], y + OFF[k][1], x + OFF[k][2]))
                m26 |= 1u << k;
    }
    return m26;
}

// T26 == 1 and T6 == 1 for the 26-bit neighborhood of (z,y,x)
static bool is_simple(const Vol& v, int z, int y, int x, int* fg_count) {
    uint32_t m26 = gather26(v, z, y, x);
    uint32_t m18 = 0;
    for (int a = 0; a < 18; ++a)
        if ((m26 >> N18[a]) & 1u) m18 |= 1u << a;
    return is_simple_mask(m26, m18, fg_count);
}

// --- simple-point lookup table -----------------------------------------
//
// The per-deletion-candidate cost of the worklist thinning is the
// simple-point test (two in-register flood fills).  A 2^26-bit table
// (8 MiB) answers it in one load; it is generated once (~seconds) and
// cached on disk next to the shared library.  The same 26-bit gather
// also answers the has-background-6-neighbor gate via FACE_MASK26.
static const uint8_t* SIMPLE_LUT = nullptr;
static std::vector<uint8_t> lut_store;

// 8-byte magic + format version: a stale or foreign cache file (e.g.
// from a future change to the neighbor enumeration or bit order) must
// be rejected, not silently trusted — wrong simple-point answers break
// skeleton topology with no error anywhere downstream.
static const char kLutMagic[8] = {'S', 'P', 'L', 'U', 'T', '2', '6',
                                  '\x01'};

int ensure_simple_lut_impl(const char* cache_path) {
    init_tables();
    if (SIMPLE_LUT) return 1;
    const size_t bytes = (1u << 26) / 8;
    lut_store.assign(bytes, 0);
    if (cache_path && *cache_path) {
        FILE* f = std::fopen(cache_path, "rb");
        if (f) {
            char magic[8] = {0};
            size_t got_m = std::fread(magic, 1, 8, f);
            bool ok = got_m == 8
                && std::memcmp(magic, kLutMagic, 8) == 0
                && std::fread(lut_store.data(), 1, bytes, f) == bytes
                && std::fgetc(f) == EOF;  // no trailing junk
            std::fclose(f);
            if (ok) {
                SIMPLE_LUT = lut_store.data();
                return 1;
            }
            std::fill(lut_store.begin(), lut_store.end(), 0);
        }
    }
    for (uint32_t code = 0; code < (1u << 26); ++code) {
        uint32_t m18 = 0;
        for (int a = 0; a < 18; ++a)
            if ((code >> N18[a]) & 1u) m18 |= 1u << a;
        int fg;
        if (is_simple_mask(code, m18, &fg))
            lut_store[code >> 3] |=
                static_cast<uint8_t>(1u << (code & 7));
    }
    if (cache_path && *cache_path) {
        std::string tmp = std::string(cache_path) + ".tmp";
        FILE* w = std::fopen(tmp.c_str(), "wb");
        if (w) {
            size_t put = std::fwrite(kLutMagic, 1, 8, w);
            put += std::fwrite(lut_store.data(), 1, bytes, w);
            std::fclose(w);
            if (put == bytes + 8)
                std::rename(tmp.c_str(), cache_path);
            else
                std::remove(tmp.c_str());
        }
    }
    SIMPLE_LUT = lut_store.data();
    return 2;
}

static bool has_bg6(const Vol& v, int z, int y, int x) {
    return !v.at(z - 1, y, x) || !v.at(z + 1, y, x)
        || !v.at(z, y - 1, x) || !v.at(z, y + 1, x)
        || !v.at(z, y, x - 1) || !v.at(z, y, x + 1);
}

// UB-free unaligned 8-byte load (x86 folds this to a plain mov).  Vessel
// volumes are ~0.6% foreground, so the full-volume scans below skip
// all-zero 8-byte words and touch only ~1/8 of the bytes.
static inline uint64_t load8(const uint8_t* p) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    return w;
}

}  // namespace

extern "C" {

// In-place thinning.  vol: uint8[nz*ny*nx] (C order), nonzero = fg.
// dist2: optional f32 squared-distance volume for distance ordering
// (null -> plain boundary peeling).  preserve_endpoints keeps curve tips.
// Returns the number of deleted voxels.
long thin_volume(uint8_t* vol, int nz, int ny, int nx,
                 const float* dist2, int preserve_endpoints) {
    init_tables();
    Vol v{vol, nz, ny, nx};
    long n = static_cast<long>(nz) * ny * nx;

    const long n8 = n & ~7L;
    float max_d2 = 1.0f;
    if (dist2) {
        long i = 0;
        for (; i < n8; i += 8) {
            if (!load8(vol + i)) continue;
            for (int b = 0; b < 8; ++b)
                if (vol[i + b] && dist2[i + b] > max_d2)
                    max_d2 = dist2[i + b];
        }
        for (; i < n; ++i)
            if (vol[i] && dist2[i] > max_d2) max_d2 = dist2[i];
    }

    long deleted_total = 0;
    int max_level = dist2 ? static_cast<int>(std::sqrt(max_d2)) + 1 : 1;

    // Worklist processing: ONE scan buckets boundary-exposed foreground
    // voxels by the first distance level that admits them; each level
    // then drains its bucket plus the leftovers of earlier levels, with
    // queue-driven rechecks (neighbors of deletions).  Interior voxels
    // are never seeded — they can only become deletable when a 6-neighbor
    // is deleted, which re-pushes them.
    //
    // Bit 1 of the voxel byte is a PENDING flag: a voxel already sitting
    // in a queue/bucket/leftover is never pushed again.  Without it every
    // deletion re-queued all 26 neighbors and each was re-checked with a
    // fresh flood-fill simple-point test — the dominant cost at MRA scale
    // (several pending entries per voxel per level).
    constexpr uint8_t kPend = 2;
    std::vector<long> queue, leftover;
    queue.reserve(1 << 16);
    leftover.reserve(1 << 16);
    std::vector<std::vector<long>> buckets(
        static_cast<size_t>(max_level) + 2);
    // flat-index scan == the z,y,x scan order (sequential thinning is
    // order-dependent, so this must not change); zero words skipped
    auto seed_voxel = [&](long i) {
        int x = static_cast<int>(i % nx);
        int y = static_cast<int>((i / nx) % ny);
        int z = static_cast<int>(i / (static_cast<long>(nx) * ny));
        if (!has_bg6(v, z, y, x)) return;
        int lvl = 1;
        if (dist2) {
            float d2 = dist2[i];
            while (lvl <= max_level
                   && static_cast<float>(lvl) * lvl + 0.5f < d2)
                ++lvl;
        }
        vol[i] |= kPend;
        buckets[lvl].push_back(i);
    };
    {
        long i = 0;
        for (; i < n8; i += 8) {
            if (!load8(vol + i)) continue;
            for (int b = 0; b < 8; ++b)
                if (vol[i + b]) seed_voxel(i + b);
        }
        for (; i < n; ++i)
            if (vol[i]) seed_voxel(i);
    }

    auto consider = [&](int z, int y, int x, float lvl2) -> bool {
        long i = v.idx(z, y, x);
        if (!vol[i]) return false;
        if (dist2 && dist2[i] > lvl2) return false;
        if (SIMPLE_LUT) {
            // one 26-bit gather answers the bg-6-neighbor gate, the
            // endpoint gate and (via the table) the simple-point test
            uint32_t m26 = gather26(v, z, y, x);
            if ((m26 & FACE_MASK26) == FACE_MASK26) return false;
            if (preserve_endpoints && __builtin_popcount(m26) <= 1)
                return false;
            if (!((SIMPLE_LUT[m26 >> 3] >> (m26 & 7)) & 1u))
                return false;
        } else {
            if (!has_bg6(v, z, y, x)) return false;
            int nfg;
            if (!is_simple(v, z, y, x, &nfg)) return false;
            if (preserve_endpoints && nfg <= 1) return false;
        }
        vol[i] = 0;  // sequential deletion: always safe
        ++deleted_total;
        return true;
    };

    for (int level = 1; level <= max_level + 1; ++level) {
        float lvl2 = (level <= max_level)
            ? static_cast<float>(level) * level + 0.5f : 3.0e38f;
        queue.clear();
        queue.swap(leftover);
        if (level < static_cast<int>(buckets.size())) {
            queue.insert(queue.end(), buckets[level].begin(),
                         buckets[level].end());
            buckets[level].clear();
        }
        for (size_t qi = 0; qi < queue.size(); ++qi) {
            long i = queue[qi];
            vol[i] &= static_cast<uint8_t>(~kPend);
            int x = static_cast<int>(i % nx);
            int y = static_cast<int>((i / nx) % ny);
            int z = static_cast<int>(i / (static_cast<long>(nx) * ny));
            if (!consider(z, y, x, lvl2)) {
                // still foreground: stays a candidate for later levels.
                // At the final drain there is no later level; leave the
                // pending bit clear so a neighbor deletion re-queues it.
                if (vol[i] && level <= max_level) {
                    vol[i] |= kPend;
                    leftover.push_back(i);
                }
                continue;
            }
            // re-examine neighbors of the deleted voxel; a deeper
            // neighbor exposed before its admission level is deferred
            // into its own bucket (the old full rescan caught these)
            for (int k = 0; k < 26; ++k) {
                int zz = z + OFF[k][0], yy = y + OFF[k][1],
                    xx = x + OFF[k][2];
                if (zz < 0 || yy < 0 || xx < 0 || zz >= nz || yy >= ny
                    || xx >= nx) continue;
                long j = v.idx(zz, yy, xx);
                if (!vol[j] || (vol[j] & kPend)) continue;
                if (!has_bg6(v, zz, yy, xx)) continue;  // re-queued when
                                                        // it surfaces
                if (!dist2 || dist2[j] <= lvl2) {
                    vol[j] |= kPend;
                    queue.push_back(j);
                } else {
                    int lvlj = level + 1;
                    float d2j = dist2[j];
                    while (lvlj <= max_level
                           && static_cast<float>(lvlj) * lvlj + 0.5f < d2j)
                        ++lvlj;
                    vol[j] |= kPend;
                    buckets[lvlj].push_back(j);
                }
            }
        }
    }
    // all queues drain by construction, but guarantee clean 0/1 output
    // (bytes are 0..3: bit 0 = foreground, bit 1 = stale pending flag)
    {
        constexpr uint64_t kLow = 0x0101010101010101ULL;
        long i = 0;
        for (; i < n8; i += 8) {
            uint64_t w = load8(vol + i);
            if (!w) continue;
            uint64_t m = w & kLow;
            if (m != w) std::memcpy(vol + i, &m, 8);
        }
        for (; i < n; ++i) vol[i] &= 1;
    }
    return deleted_total;
}

// Build (or load from cache_path) the 2^26-bit simple-point table used
// by thin_volume.  Returns 1 if loaded from cache, 2 if generated.
int ensure_simple_lut(const char* cache_path) {
    return ensure_simple_lut_impl(cache_path);
}

// Standalone simple-point oracle for tests: neighborhood as 26 bits.
int simple_point_code(uint32_t code) {
    init_tables();
    // materialize a 3x3x3 volume
    uint8_t buf[27] = {0};
    Vol v{buf, 3, 3, 3};
    buf[v.idx(1, 1, 1)] = 1;
    for (int k = 0; k < 26; ++k)
        if ((code >> k) & 1u)
            buf[v.idx(1 + OFF[k][0], 1 + OFF[k][1], 1 + OFF[k][2])] = 1;
    int nfg;
    return is_simple(v, 1, 1, 1, &nfg) ? 1 : 0;
}

}  // extern "C"
