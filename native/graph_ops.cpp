// Native skeleton-graph chain extractor + simplification passes.
//
// Bit-exact mirror of arterynetwork_tpu/graphs/segments.py's
// simplify_chains pipeline (chain walk -> junction-cluster collapse ->
// parallel-arc dedupe -> tight-cycle cut -> junction-bridge audit ->
// radius-aware spur prune, iterated) so the host graph stage drops from
// ~0.37 s to native speed at 512 scale with byte-identical output.
// Replaces what the reference leaves to networkx dict graphs
// (skeletonization.py:233-537 and the manual GUI's merge semantics,
// manualCorrectionGUIDetail.py:266-374).
//
// Ordering contracts mirrored from the Python (every tie-break is
// pinned there for exactly this port):
//   * chain walk: CSR adjacency in stable (a-half then b-half) edge
//     order, start vertices ascending, leftover cycles in edge order;
//   * collapse: union-find over junction-junction edges in input
//     order, representative = stable-ascending-radius last assignment;
//   * mean radius: f64 prefix sum over the concatenated chain
//     vertices, per-chain sum = prefix difference;
//   * cycle basis: BFS forest from each component's minimum vertex,
//     sorted neighbors, fundamental cycle per non-tree arc;
//   * rebuild: sorted-unique canonical edge keys, then the walk.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

using std::int64_t;
using Chain = std::vector<int64_t>;
using Chains = std::vector<Chain>;

// ---------------------------------------------------------------- walk

Chains chains_from_edge_indices(const std::vector<int64_t>& a,
                                const std::vector<int64_t>& b,
                                int64_t n) {
    const int64_t E = (int64_t)a.size();
    Chains chains;
    if (E == 0) return chains;
    std::vector<int64_t> deg(n, 0);
    for (int64_t e = 0; e < E; ++e) { deg[a[e]]++; deg[b[e]]++; }

    // CSR over src = concat(a, b): counting sort preserving the
    // concatenated order (a-half entries first, each half in edge
    // order) == np.argsort(src, kind="stable")
    std::vector<int64_t> indptr(n + 1, 0);
    for (int64_t e = 0; e < E; ++e) { indptr[a[e] + 1]++; indptr[b[e] + 1]++; }
    for (int64_t v = 0; v < n; ++v) indptr[v + 1] += indptr[v];
    std::vector<int64_t> dst(2 * E), eid(2 * E), fill(indptr.begin(),
                                                      indptr.end() - 1);
    for (int64_t e = 0; e < E; ++e) {
        int64_t p = fill[a[e]]++;
        dst[p] = b[e]; eid[p] = e;
    }
    for (int64_t e = 0; e < E; ++e) {
        int64_t p = fill[b[e]]++;
        dst[p] = a[e]; eid[p] = e;
    }

    std::vector<uint8_t> visited(E, 0);
    auto walk = [&](int64_t prev, int64_t cur, Chain& chain) {
        while (deg[cur] == 2) {
            int64_t q = indptr[cur];
            if (dst[q] == prev) q += 1;
            if (visited[eid[q]]) break;
            visited[eid[q]] = 1;
            int64_t nxt = dst[q];
            chain.push_back(nxt);
            prev = cur; cur = nxt;
        }
    };

    for (int64_t s = 0; s < n; ++s) {
        if (deg[s] == 2) continue;
        for (int64_t p = indptr[s]; p < indptr[s + 1]; ++p) {
            if (visited[eid[p]]) continue;
            visited[eid[p]] = 1;
            Chain c{s, dst[p]};
            walk(s, dst[p], c);
            chains.push_back(std::move(c));
        }
    }
    for (int64_t e0 = 0; e0 < E; ++e0) {   // pure degree-2 cycles
        if (visited[e0]) continue;
        visited[e0] = 1;
        Chain c{a[e0], b[e0]};
        walk(a[e0], b[e0], c);
        chains.push_back(std::move(c));
    }
    return chains;
}

// ------------------------------------------------------------- rebuild

Chains rebuild_chains(const Chains& chains, int64_t n) {
    if (chains.empty()) return {};
    std::vector<int64_t> keys;
    for (const auto& c : chains)
        for (size_t i = 0; i + 1 < c.size(); ++i) {
            int64_t lo = std::min(c[i], c[i + 1]);
            int64_t hi = std::max(c[i], c[i + 1]);
            keys.push_back(lo * n + hi);
        }
    std::sort(keys.begin(), keys.end());
    keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
    std::vector<int64_t> a(keys.size()), b(keys.size());
    for (size_t i = 0; i < keys.size(); ++i) {
        a[i] = keys[i] / n;
        b[i] = keys[i] % n;
    }
    return chains_from_edge_indices(a, b, n);
}

// --------------------------------------------------------- mean radius

void chain_mean_radius(const Chains& chains, const float* radius,
                       std::vector<int64_t>& lens,
                       std::vector<double>& means) {
    lens.resize(chains.size());
    means.resize(chains.size());
    // single f64 running prefix over the concatenated chains; per-chain
    // sum = prefix difference (mirrors the Python cumsum exactly)
    double acc = 0.0;
    for (size_t i = 0; i < chains.size(); ++i) {
        double start = acc;
        for (int64_t v : chains[i]) acc += (double)radius[v];
        lens[i] = (int64_t)chains[i].size();
        means[i] = (acc - start) / (double)lens[i];
    }
}

// ------------------------------------------------------------ collapse

void collapse_junction_clusters(std::vector<int64_t>& a,
                                std::vector<int64_t>& b, int64_t n,
                                const float* radius) {
    const int64_t E = (int64_t)a.size();
    std::vector<int64_t> deg(n, 0);
    for (int64_t e = 0; e < E; ++e) { deg[a[e]]++; deg[b[e]]++; }
    std::vector<int64_t> parent(n);
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
    std::function<int64_t(int64_t)> find = [&](int64_t x) {
        int64_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) { int64_t nx = parent[x];
            parent[x] = root; x = nx; }
        return root;
    };
    for (int64_t e = 0; e < E; ++e) {
        if (deg[a[e]] >= 3 && deg[b[e]] >= 3) {
            int64_t rx = find(a[e]), ry = find(b[e]);
            if (rx != ry) parent[ry] = rx;
        }
    }
    std::vector<int64_t> roots(n);
    for (int64_t i = 0; i < n; ++i) roots[i] = find(i);
    // representative = member with max radius; stable ascending sort,
    // last assignment per root wins (== np.argsort(kind="stable"))
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t x, int64_t y) {
                         return radius[x] < radius[y];
                     });
    std::vector<int64_t> rep_of_root(n, -1);
    for (int64_t i : order) rep_of_root[roots[i]] = i;
    std::vector<int64_t> keys;
    keys.reserve(E);
    for (int64_t e = 0; e < E; ++e) {
        int64_t x = rep_of_root[roots[a[e]]];
        int64_t y = rep_of_root[roots[b[e]]];
        if (x == y) continue;
        keys.push_back(std::min(x, y) * n + std::max(x, y));
    }
    std::sort(keys.begin(), keys.end());
    keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
    a.resize(keys.size()); b.resize(keys.size());
    for (size_t i = 0; i < keys.size(); ++i) {
        a[i] = keys[i] / n;
        b[i] = keys[i] % n;
    }
}

// ------------------------------------------------------- parallel arcs

Chains prune_parallel_arcs(const Chains& chains, int64_t n,
                           const float* radius,
                           double factor, int64_t min_keep) {
    std::vector<int64_t> lens;
    std::vector<double> means;
    chain_mean_radius(chains, radius, lens, means);
    // groups keyed by unordered endpoints, first-seen order
    std::unordered_map<int64_t, size_t> group_of;  // packed key -> slot
    std::vector<std::pair<std::pair<int64_t, int64_t>,
                          std::vector<size_t>>> groups;
    Chains out;
    // self-loops handled (and surviving ones emitted) in chain order
    for (size_t i = 0; i < chains.size(); ++i) {
        const auto& c = chains[i];
        if (c.front() == c.back()) {
            double thr = std::max((double)min_keep,
                                  factor * (double)radius[c.front()]);
            if ((double)c.size() <= thr * 2.0) continue;
            out.push_back(c);
            continue;
        }
        int64_t u = std::min(c.front(), c.back());
        int64_t v = std::max(c.front(), c.back());
        int64_t key = u * n + v;
        auto it = group_of.find(key);
        if (it == group_of.end()) {
            group_of.emplace(key, groups.size());
            groups.push_back({{u, v}, {i}});
        } else {
            groups[it->second].second.push_back(i);
        }
    }
    for (const auto& g : groups) {
        const auto& cs = g.second;
        if (cs.size() == 1) { out.push_back(chains[cs[0]]); continue; }
        size_t best = 0;
        for (size_t j = 1; j < cs.size(); ++j)  // first max (np.argmax)
            if (means[cs[j]] > means[cs[best]]) best = j;
        double rj = std::max((double)radius[g.first.first],
                             (double)radius[g.first.second]);
        double thr = std::max((double)min_keep, factor * rj);
        for (size_t j = 0; j < cs.size(); ++j) {
            if (j == best || (double)chains[cs[j]].size() > thr)
                out.push_back(chains[cs[j]]);
        }
    }
    return out;
}

// --------------------------------------------------------- cycle basis

std::vector<std::vector<size_t>> fundamental_cycles(
        const std::vector<std::pair<int64_t, int64_t>>& arc_ends) {
    std::vector<int64_t> verts;
    for (const auto& e : arc_ends) { verts.push_back(e.first);
        verts.push_back(e.second); }
    std::sort(verts.begin(), verts.end());
    verts.erase(std::unique(verts.begin(), verts.end()), verts.end());
    std::unordered_map<int64_t, size_t> vid;
    for (size_t i = 0; i < verts.size(); ++i) vid[verts[i]] = i;
    const size_t nv = verts.size();
    std::vector<std::vector<std::pair<size_t, size_t>>> adj(nv);
    for (size_t k = 0; k < arc_ends.size(); ++k) {
        size_t ui = vid[arc_ends[k].first], vi = vid[arc_ends[k].second];
        adj[ui].push_back({vi, k});
        adj[vi].push_back({ui, k});
    }
    for (auto& lst : adj) std::sort(lst.begin(), lst.end());
    std::vector<int64_t> parent(nv, -1), parent_arc(nv, -1), depth(nv, -1);
    std::vector<uint8_t> tree(arc_ends.size(), 0);
    for (size_t root = 0; root < nv; ++root) {
        if (depth[root] >= 0) continue;
        depth[root] = 0;
        std::vector<size_t> queue{root};
        while (!queue.empty()) {
            std::vector<size_t> nxt;
            for (size_t x : queue)
                for (const auto& [y, k] : adj[x])
                    if (depth[y] < 0) {
                        depth[y] = depth[x] + 1;
                        parent[y] = (int64_t)x;
                        parent_arc[y] = (int64_t)k;
                        tree[k] = 1;
                        nxt.push_back(y);
                    }
            queue = std::move(nxt);
        }
    }
    std::vector<std::vector<size_t>> cycles;
    for (size_t k = 0; k < arc_ends.size(); ++k) {
        if (tree[k]) continue;
        int64_t ui = (int64_t)vid[arc_ends[k].first];
        int64_t vi = (int64_t)vid[arc_ends[k].second];
        if (ui == vi) continue;
        std::vector<size_t> arcs_u, arcs_v;
        while (depth[ui] > depth[vi]) { arcs_u.push_back(parent_arc[ui]);
            ui = parent[ui]; }
        while (depth[vi] > depth[ui]) { arcs_v.push_back(parent_arc[vi]);
            vi = parent[vi]; }
        while (ui != vi) {
            arcs_u.push_back(parent_arc[ui]); ui = parent[ui];
            arcs_v.push_back(parent_arc[vi]); vi = parent[vi];
        }
        std::vector<size_t> cyc{k};
        cyc.insert(cyc.end(), arcs_u.begin(), arcs_u.end());
        cyc.insert(cyc.end(), arcs_v.rbegin(), arcs_v.rend());
        cycles.push_back(std::move(cyc));
    }
    return cycles;
}

Chains prune_artifact_cycles(Chains chains, int64_t n,
                             const float* radius, double tight_ratio,
                             int iterations) {
    for (int it = 0; it < iterations; ++it) {
        if (chains.empty()) break;
        std::vector<int64_t> lens;
        std::vector<double> means;
        chain_mean_radius(chains, radius, lens, means);
        std::unordered_set<int64_t> seen_pairs;
        std::vector<std::pair<int64_t, int64_t>> arc_ends;
        std::vector<size_t> arc_idx;
        for (size_t i = 0; i < chains.size(); ++i) {
            const auto& c = chains[i];
            if (c.front() == c.back()) continue;
            int64_t u = std::min(c.front(), c.back());
            int64_t v = std::max(c.front(), c.back());
            int64_t key = u * n + v;
            if (seen_pairs.insert(key).second) {
                arc_ends.push_back({u, v});
                arc_idx.push_back(i);
            }
        }
        std::unordered_set<size_t> drop;
        for (const auto& cyc : fundamental_cycles(arc_ends)) {
            bool dropped = false;
            for (size_t k : cyc)
                if (drop.count(arc_idx[k])) { dropped = true; break; }
            if (dropped) continue;
            int64_t tot = 0;
            double rmax = 0.0;
            for (size_t k : cyc) {
                tot += lens[arc_idx[k]];
                rmax = std::max(rmax, means[arc_idx[k]]);
            }
            if ((double)tot <= tight_ratio * std::max(rmax, 0.5)) {
                size_t bi = arc_idx[cyc[0]];
                for (size_t k : cyc) {
                    size_t i = arc_idx[k];
                    // min by (mean, -len, index)
                    if (means[i] < means[bi]
                        || (means[i] == means[bi]
                            && (lens[i] > lens[bi]
                                || (lens[i] == lens[bi] && i < bi))))
                        bi = i;
                }
                drop.insert(bi);
            }
        }
        if (drop.empty()) break;
        Chains kept;
        for (size_t i = 0; i < chains.size(); ++i)
            if (!drop.count(i)) kept.push_back(std::move(chains[i]));
        chains = rebuild_chains(kept, n);
    }
    return chains;
}

// ----------------------------------------------------- junction bridge

struct CoverGrid {
    // voxel-coordinate hash grid over the union of chain vertices
    std::unordered_map<int64_t, std::vector<int64_t>> cells;
    const int32_t* coords;
    double cell;
    int64_t key_of(double x, double y, double z) const {
        int64_t cx = (int64_t)std::floor(x / cell);
        int64_t cy = (int64_t)std::floor(y / cell);
        int64_t cz = (int64_t)std::floor(z / cell);
        return ((cx * 0x10001LL) + cy) * 0x10001LL + cz;
    }
    void insert(int64_t v) {
        cells[key_of(coords[3 * v], coords[3 * v + 1],
                     coords[3 * v + 2])].push_back(v);
    }
};

Chains prune_junction_bridges(Chains chains, int64_t n,
                              const float* radius,
                              const int32_t* coords,
                              int64_t max_len, double cover_tol,
                              double cover_radius_factor,
                              int iterations) {
    for (int it = 0; it < iterations; ++it) {
        if (chains.empty()) break;
        std::vector<int64_t> ends_count(n, 0);
        for (const auto& c : chains) { ends_count[c.front()]++;
            ends_count[c.back()]++; }
        std::vector<int64_t> lens;
        std::vector<double> means;
        chain_mean_radius(chains, radius, lens, means);
        // endpoint adjacency (chain graph) for connectivity checks
        std::unordered_map<int64_t, std::vector<std::pair<int64_t,
                                                          size_t>>> gadj;
        for (size_t i = 0; i < chains.size(); ++i) {
            gadj[chains[i].front()].push_back({chains[i].back(), i});
            gadj[chains[i].back()].push_back({chains[i].front(), i});
        }
        std::vector<size_t> cand;
        for (size_t i = 0; i < chains.size(); ++i) {
            const auto& c = chains[i];
            if (c.front() != c.back() && (int64_t)c.size() <= max_len
                && ends_count[c.front()] >= 3
                && ends_count[c.back()] >= 3)
                cand.push_back(i);
        }
        std::stable_sort(cand.begin(), cand.end(),
                         [&](size_t x, size_t y) {
                             if (means[x] != means[y])
                                 return means[x] < means[y];
                             return lens[x] > lens[y];
                         });
        std::vector<uint8_t> removed(chains.size(), 0);
        std::vector<size_t> dropped;
        CoverGrid grid;
        double max_tol = cover_tol;
        if (coords != nullptr && !cand.empty()) {
            for (size_t i : cand)
                max_tol = std::max(max_tol,
                                   cover_radius_factor * means[i]);
            grid.coords = coords;
            grid.cell = std::max(max_tol, 1.0);
            std::vector<int64_t> all_v;
            for (const auto& c : chains)
                for (int64_t v : c) all_v.push_back(v);
            std::sort(all_v.begin(), all_v.end());
            all_v.erase(std::unique(all_v.begin(), all_v.end()),
                        all_v.end());
            for (int64_t v : all_v) grid.insert(v);
        }
        // epoch-stamped visit marks + a persistent dropped-vertex mark:
        // vertex ids are compact (< n), so flat arrays replace the
        // per-candidate unordered_sets that dominated this pass
        std::vector<int64_t> seen_epoch(n, -1);
        std::vector<int64_t> queue;
        int64_t epoch = 0;
        // own_mark[v] = epoch while v is on the current candidate, or
        // DROPPED (permanent) once v's chain has been removed
        constexpr int64_t kDropped = INT64_MAX;
        std::vector<int64_t> own_mark(n, -1);
        auto connected_without = [&](size_t skip, int64_t u, int64_t v) {
            removed[skip] = 1;
            ++epoch;
            seen_epoch[u] = epoch;
            queue.clear();
            queue.push_back(u);
            bool found = false;
            while (!queue.empty() && !found) {
                int64_t x = queue.back(); queue.pop_back();
                auto itx = gadj.find(x);
                if (itx == gadj.end()) continue;
                for (const auto& [y, ci] : itx->second) {
                    if (removed[ci]) continue;
                    if (y == v) { found = true; break; }
                    if (seen_epoch[y] != epoch) {
                        seen_epoch[y] = epoch;
                        queue.push_back(y);
                    }
                }
            }
            removed[skip] = 0;
            return found;
        };
        int64_t own_epoch = 0;
        for (size_t i : cand) {
            int64_t u = chains[i].front(), v = chains[i].back();
            if (!connected_without(i, u, v)) continue;
            if (coords != nullptr && chains[i].size() > 2) {
                double tol = std::max(cover_tol,
                                      cover_radius_factor * means[i]);
                ++own_epoch;
                for (int64_t w : chains[i])
                    if (own_mark[w] != kDropped) own_mark[w] = own_epoch;
                auto is_own = [&](int64_t q) {
                    return own_mark[q] == own_epoch
                        || own_mark[q] == kDropped;
                };
                bool covered = true;
                int64_t cells_r = (int64_t)std::floor(tol / grid.cell) + 1;
                for (size_t t = 1; t + 1 < chains[i].size(); ++t) {
                    int64_t w = chains[i][t];
                    double wx = coords[3 * w], wy = coords[3 * w + 1],
                           wz = coords[3 * w + 2];
                    bool ok = false;
                    int64_t cx0 = (int64_t)std::floor(wx / grid.cell);
                    int64_t cy0 = (int64_t)std::floor(wy / grid.cell);
                    int64_t cz0 = (int64_t)std::floor(wz / grid.cell);
                    for (int64_t dx = -cells_r; dx <= cells_r && !ok; ++dx)
                        for (int64_t dy = -cells_r; dy <= cells_r && !ok;
                             ++dy)
                            for (int64_t dz = -cells_r;
                                 dz <= cells_r && !ok; ++dz) {
                                int64_t key = (((cx0 + dx) * 0x10001LL)
                                               + cy0 + dy) * 0x10001LL
                                              + cz0 + dz;
                                auto itc = grid.cells.find(key);
                                if (itc == grid.cells.end()) continue;
                                for (int64_t q : itc->second) {
                                    if (is_own(q)) continue;
                                    double ddx = coords[3 * q] - wx;
                                    double ddy = coords[3 * q + 1] - wy;
                                    double ddz = coords[3 * q + 2] - wz;
                                    if (ddx * ddx + ddy * ddy + ddz * ddz
                                        <= tol * tol) { ok = true;
                                        break; }
                                }
                            }
                    if (!ok) { covered = false; break; }
                }
                if (!covered) continue;
            }
            removed[i] = 1;
            dropped.push_back(i);
            for (int64_t w : chains[i]) own_mark[w] = kDropped;
        }
        if (dropped.empty()) break;
        Chains kept;
        for (size_t i = 0; i < chains.size(); ++i)
            if (!removed[i]) kept.push_back(std::move(chains[i]));
        chains = rebuild_chains(kept, n);
    }
    return chains;
}

// ----------------------------------------------------------- spur prune

Chains prune_chains_radius(Chains chains, int64_t n, const float* radius,
                           int64_t min_length, double factor,
                           int iterations) {
    for (int it = 0; it < iterations; ++it) {
        if (chains.empty()) break;
        std::vector<int64_t> end_count(n, 0);
        for (const auto& c : chains) { end_count[c.front()]++;
            end_count[c.back()]++; }
        Chains keep;
        for (auto& c : chains) {
            bool t0 = end_count[c.front()] == 1;
            bool t1 = end_count[c.back()] == 1;
            if (t0 && t1) {
                if ((int64_t)c.size() <= min_length) continue;
            } else if (t0 || t1) {
                double rj = t0 ? (double)radius[c.back()]
                               : (double)radius[c.front()];
                double thr = std::max((double)min_length, factor * rj);
                if ((double)c.size() <= thr) continue;
            }
            keep.push_back(std::move(c));
        }
        if (keep.size() == chains.size()) { chains = std::move(keep);
            break; }
        chains = rebuild_chains(keep, n);
    }
    return chains;
}

}  // namespace

extern "C" {

// Full walk + simplify.  Returns the chain count (or -1 if the output
// buffers are too small); chains come back as a flat vertex-index
// array plus (count+1) offsets.
long simplify_chains_native(
        const int64_t* a_in, const int64_t* b_in, long E, long n,
        const float* radius, const int32_t* coords /* n*3 or null */,
        long min_length, int collapse, double radius_factor,
        double cycle_tight_ratio, int rounds,
        long bridge_max_len, double cover_tol,
        double cover_radius_factor,
        int64_t* out_flat, long flat_cap,
        int64_t* out_offsets, long off_cap) {
    std::vector<int64_t> a(a_in, a_in + E), b(b_in, b_in + E);
    Chains chains = chains_from_edge_indices(a, b, n);
    for (int r = 0; r < rounds; ++r) {
        if (chains.empty()) break;
        size_t before = chains.size();
        if (collapse) {
            std::vector<int64_t> ca, cb;
            for (const auto& c : chains)
                for (size_t i = 0; i + 1 < c.size(); ++i) {
                    ca.push_back(c[i]);
                    cb.push_back(c[i + 1]);
                }
            collapse_junction_clusters(ca, cb, n, radius);
            chains = chains_from_edge_indices(ca, cb, n);
        }
        size_t n_before = chains.size();
        chains = prune_parallel_arcs(chains, n, radius, 3.0, 6);
        if (chains.size() != n_before) chains = rebuild_chains(chains, n);
        if (cycle_tight_ratio > 0)
            chains = prune_artifact_cycles(std::move(chains), n, radius,
                                           cycle_tight_ratio, 3);
        if (bridge_max_len > 0)
            chains = prune_junction_bridges(std::move(chains), n, radius,
                                            coords, bridge_max_len,
                                            cover_tol,
                                            cover_radius_factor, 3);
        chains = prune_chains_radius(std::move(chains), n, radius,
                                     min_length, radius_factor, 4);
        if (chains.size() == before) break;
    }
    long total = 0;
    for (const auto& c : chains) total += (long)c.size();
    if ((long)chains.size() + 1 > off_cap || total > flat_cap) return -1;
    long pos = 0;
    out_offsets[0] = 0;
    for (size_t i = 0; i < chains.size(); ++i) {
        for (int64_t v : chains[i]) out_flat[pos++] = v;
        out_offsets[i + 1] = pos;
    }
    return (long)chains.size();
}

// Plain chain walk (no simplification) — the fast path for
// simplify=False callers.
long chains_from_edges_native(
        const int64_t* a_in, const int64_t* b_in, long E, long n,
        int64_t* out_flat, long flat_cap,
        int64_t* out_offsets, long off_cap) {
    std::vector<int64_t> a(a_in, a_in + E), b(b_in, b_in + E);
    Chains chains = chains_from_edge_indices(a, b, n);
    long total = 0;
    for (const auto& c : chains) total += (long)c.size();
    if ((long)chains.size() + 1 > off_cap || total > flat_cap) return -1;
    long pos = 0;
    out_offsets[0] = 0;
    for (size_t i = 0; i < chains.size(); ++i) {
        for (int64_t v : chains[i]) out_flat[pos++] = v;
        out_offsets[i + 1] = pos;
    }
    return (long)chains.size();
}

}  // extern "C"
