// Native neighbor-search runtime: grid-bucketed radius graph + k-NN.
//
// The TPU-side framework consumes fixed-shape padded edge buffers built on
// the host (magnet_tpu/ops/graph.py); for large meshes (256^2 = 65k nodes,
// SURVEY.md §2.3) the O(N^2) numpy fallback dominates step time, so this
// C++ library provides the production path (the role torch_cluster's CUDA
// kernels play for the reference — here the graph build belongs on the
// host, overlapped with TPU compute by the prefetch thread).
//
// Semantics match torch_cluster (and ops/graph.py):
//   * radius_graph: edges j->i for ||x_i - x_j|| <= r, optional self loops,
//     per-target cap max_num_neighbors keeping the LOWEST-index neighbors,
//     ascending index order per target.
//   * knn: for each query, k nearest (ascending distance, ties by index).
//
// Build: make -C magnet_tpu/runtime   (g++ -O3 -shared -fPIC)
// Python binding: ctypes (magnet_tpu/runtime/neighbors.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t k;
    bool operator==(const CellKey& o) const { return k == o.k; }
};

struct CellHash {
    size_t operator()(const CellKey& c) const {
        return std::hash<int64_t>()(c.k);
    }
};

// pack up to 3 signed 20-bit cell coords into one int64
inline int64_t pack(const int* c, int d) {
    int64_t k = 0;
    for (int i = 0; i < d; ++i) {
        k = (k << 21) | ((int64_t)(c[i] + (1 << 19)) & 0x1FFFFF);
    }
    return k;
}

struct Grid {
    double cell;
    int d;
    std::unordered_map<CellKey, std::vector<int>, CellHash> cells;

    Grid(const double* pts, int n, int d_, double cell_) : cell(cell_), d(d_) {
        cells.reserve(n * 2);
        int c[3];
        for (int i = 0; i < n; ++i) {
            for (int j = 0; j < d; ++j)
                c[j] = (int)std::floor(pts[i * d + j] / cell);
            cells[{pack(c, d)}].push_back(i);
        }
    }

    template <typename F>
    void for_neighbors(const double* q, F&& fn) const {
        int base[3], c[3];
        for (int j = 0; j < d; ++j) base[j] = (int)std::floor(q[j] / cell);
        int span = 1;
        int total = 1;
        for (int j = 0; j < d; ++j) total *= (2 * span + 1);
        for (int it = 0; it < total; ++it) {
            int rem = it;
            for (int j = 0; j < d; ++j) {
                c[j] = base[j] + (rem % (2 * span + 1)) - span;
                rem /= (2 * span + 1);
            }
            auto found = cells.find({pack(c, d)});
            if (found != cells.end())
                for (int idx : found->second) fn(idx);
        }
    }
};

inline double dist2(const double* a, const double* b, int d) {
    double s = 0;
    for (int j = 0; j < d; ++j) {
        double t = a[j] - b[j];
        s += t * t;
    }
    return s;
}

void parallel_for(int n, const std::function<void(int, int)>& body) {
    unsigned hw = std::thread::hardware_concurrency();
    int nt = std::max(1u, std::min(hw, 16u));
    if (n < 1024) nt = 1;
    std::vector<std::thread> ts;
    int chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=, &body] { body(lo, hi); });
    }
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Counts edges and fills (senders, receivers) up to capacity; returns the
// true edge count (call twice or size generously: n * max_num_neighbors).
int64_t mt_radius_graph(const double* pos, int n, int d, double r, int loop,
                        int max_num_neighbors, int32_t* senders,
                        int32_t* receivers, int64_t capacity) {
    Grid grid(pos, n, d, r);
    double r2 = r * r;
    std::vector<std::vector<int>> nbrs(n);
    parallel_for(n, [&](int lo, int hi) {
        std::vector<int> cand;
        for (int i = lo; i < hi; ++i) {
            cand.clear();
            grid.for_neighbors(pos + (int64_t)i * d, [&](int j) {
                if (!loop && j == i) return;
                if (dist2(pos + (int64_t)i * d, pos + (int64_t)j * d, d) <= r2)
                    cand.push_back(j);
            });
            std::sort(cand.begin(), cand.end());
            if ((int)cand.size() > max_num_neighbors)
                cand.resize(max_num_neighbors);
            nbrs[i] = cand;
        }
    });
    int64_t e = 0;
    for (int i = 0; i < n; ++i) {
        for (int j : nbrs[i]) {
            if (e < capacity) {
                senders[e] = j;
                receivers[e] = i;
            }
            ++e;
        }
    }
    return e;
}

// k nearest rows of x for each row of y; out shape (ny, k), ascending
// distance (ties by index).  k must be <= nx.
void mt_knn(const double* x, int nx, const double* y, int ny, int d, int k,
            int32_t* out) {
    // brute force with partial sort; grid pruning unnecessary at these sizes
    parallel_for(ny, [&](int lo, int hi) {
        std::vector<std::pair<double, int>> dists(nx);
        for (int q = lo; q < hi; ++q) {
            for (int i = 0; i < nx; ++i)
                dists[i] = {dist2(y + (int64_t)q * d, x + (int64_t)i * d, d), i};
            std::partial_sort(dists.begin(), dists.begin() + k, dists.end());
            for (int j = 0; j < k; ++j) out[(int64_t)q * k + j] = dists[j].second;
        }
    });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Tile-blocked edge packing (the host side of ops/pallas_kernels.py's MXU
// aggregation; mirrors the numpy reference in ops/graph.py:block_graph).
//
// Receiver-side layout: edges stable-sorted by (receiver tile, sender id),
// packed into per-node-tile buckets of e_tile slots.  Sender-ascending
// order within a tile makes the device-side sender-row gather DMAs
// near-sequential; the one-hot aggregation is order-agnostic, matching
// numpy's np.lexsort((senders, receivers // tile_n)).  Sender-side
// transpose layout: real flat slots stable-sorted by sender tile (for
// scatter-free gather VJPs).  All O(E) counting sorts — tile-size policy
// (e_tile rounding, skew guard) stays in Python, which passes sizes in.
//
// Caller pre-fills outputs: S/RL/RG/M/degree/SL zeroed, SID filled with the
// dummy one-past-the-end id (n_tiles * e_tile).
extern "C" void mt_block_graph(
    const int32_t* senders, const int32_t* receivers, int64_t e,
    int32_t n_node, int32_t tile_n, int32_t n_tiles,
    int32_t e_tile, int32_t e_tile_s, int build_snd,
    int32_t* S, int32_t* RL, float* M, int32_t* RG, float* degree,
    int32_t* SID, int32_t* SL) {
    // degree = per-receiver-node counts
    for (int64_t i = 0; i < e; ++i) degree[receivers[i]] += 1.0f;
    // stage 1: stable counting sort of edge ids by sender node id
    std::vector<int64_t> scur(n_node + 1, 0);
    for (int64_t i = 0; i < e; ++i) scur[senders[i] + 1]++;
    for (int32_t s = 0; s < n_node; ++s) scur[s + 1] += scur[s];
    std::vector<int64_t> order_s(e);
    for (int64_t i = 0; i < e; ++i) order_s[scur[senders[i]]++] = i;
    // stage 2: stable counting sort by receiver tile over the
    // sender-sorted order -> within-tile slots ascend by sender id
    std::vector<int64_t> tcur(n_tiles + 1, 0);
    for (int64_t i = 0; i < e; ++i) tcur[receivers[i] / tile_n + 1]++;
    for (int32_t t = 0; t < n_tiles; ++t) tcur[t + 1] += tcur[t];
    std::vector<int64_t> tile_count(n_tiles, 0);
    for (int32_t t = 0; t < n_tiles; ++t)
        tile_count[t] = tcur[t + 1] - tcur[t];
    std::vector<int64_t> slot(n_tiles, 0);
    for (int64_t k = 0; k < e; ++k) {
        int64_t i = order_s[k];
        int32_t r = receivers[i];
        int32_t t = r / tile_n;
        int64_t idx = (int64_t)t * e_tile + slot[t]++;
        S[idx] = senders[i];
        RL[idx] = r - t * tile_n;
        RG[idx] = r;
        M[idx] = 1.0f;
    }
    if (!build_snd) return;
    // sender-tile stable counting sort over real flat slots, iterated in
    // flat order (matching numpy's stable argsort over the flat arrays)
    std::vector<int64_t> ss(n_tiles + 1, 0);
    for (int64_t i = 0; i < e; ++i) ss[senders[i] / tile_n + 1]++;
    for (int32_t t = 0; t < n_tiles; ++t) ss[t + 1] += ss[t];
    std::vector<int64_t> s_start(ss.begin(), ss.end() - 1);
    for (int32_t t = 0; t < n_tiles; ++t) {
        int64_t cnt = tile_count[t];
        for (int64_t sl = 0; sl < cnt; ++sl) {
            int64_t flat = (int64_t)t * e_tile + sl;
            int32_t s = S[flat];
            int32_t st = s / tile_n;
            int64_t sidx = (int64_t)st * e_tile_s + (ss[st]++ - s_start[st]);
            SID[sidx] = (int32_t)flat;
            SL[sidx] = s - st * tile_n;
        }
    }
}
