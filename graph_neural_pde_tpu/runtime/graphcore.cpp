// graphcore: native graph preprocessing runtime.
//
// The reference leans on compiled extensions (torch_sparse coalesce,
// torch_cluster random walks, python-loop LCC at
// /root/reference/src/data.py:106-127) for its host-side graph work; this
// library is the TPU framework's native equivalent, exposed over a plain C
// ABI consumed via ctypes (no pybind11 in the image).
//
// Contents:
//   gc_coalesce       — sort + dedupe edges, summing duplicate weights
//   gc_lcc            — largest connected component via union-find
//   gc_random_walks   — uniform random-walk corpus (DeepWalk sampling)
//   gc_plan_*         — (row_block, col_block) bucketed edge plan for the
//                       Pallas blocked kernels (two-phase: count, fill)
//
// Build: runtime/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// coalesce: returns the number of unique edges written
// ---------------------------------------------------------------------------
int64_t gc_coalesce(const int32_t* row, const int32_t* col,
                    const float* weight, int64_t e, int64_t n,
                    int32_t* out_row, int32_t* out_col, float* out_w) {
    std::vector<int64_t> order(e);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        if (row[a] != row[b]) return row[a] < row[b];
        return col[a] < col[b];
    });
    int64_t m = 0;
    for (int64_t k = 0; k < e; ++k) {
        int64_t i = order[k];
        if (m > 0 && out_row[m - 1] == row[i] && out_col[m - 1] == col[i]) {
            out_w[m - 1] += weight ? weight[i] : 1.0f;
        } else {
            out_row[m] = row[i];
            out_col[m] = col[i];
            out_w[m] = weight ? weight[i] : 1.0f;
            ++m;
        }
    }
    return m;
}

// ---------------------------------------------------------------------------
// largest connected component (undirected interpretation), union-find
// writes component label per node into out_label, returns LCC size
// ---------------------------------------------------------------------------
static int32_t uf_find(std::vector<int32_t>& p, int32_t x) {
    while (p[x] != x) {
        p[x] = p[p[x]];
        x = p[x];
    }
    return x;
}

int64_t gc_lcc(const int32_t* row, const int32_t* col, int64_t e, int64_t n,
               uint8_t* out_in_lcc) {
    std::vector<int32_t> parent(n);
    std::iota(parent.begin(), parent.end(), 0);
    for (int64_t i = 0; i < e; ++i) {
        int32_t a = uf_find(parent, row[i]);
        int32_t b = uf_find(parent, col[i]);
        if (a != b) parent[a] = b;
    }
    std::vector<int64_t> size(n, 0);
    for (int64_t v = 0; v < n; ++v) size[uf_find(parent, (int32_t)v)]++;
    int32_t best = 0;
    for (int64_t v = 1; v < n; ++v)
        if (size[v] > size[best]) best = (int32_t)v;
    int64_t cnt = 0;
    for (int64_t v = 0; v < n; ++v) {
        bool in = uf_find(parent, (int32_t)v) == best;
        out_in_lcc[v] = in ? 1 : 0;
        cnt += in;
    }
    return cnt;
}

// ---------------------------------------------------------------------------
// random walks over CSR (built internally); isolated nodes self-loop
// out: [num_nodes * walks_per_node, walk_length + 1] int32, row-major
// ---------------------------------------------------------------------------
static inline uint64_t xorshift64(uint64_t& s) {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
}

void gc_random_walks(const int32_t* row, const int32_t* col, int64_t e,
                     int64_t n, int32_t walk_length, int32_t walks_per_node,
                     uint64_t seed, int32_t* out) {
    std::vector<int64_t> deg(n + 1, 0);
    for (int64_t i = 0; i < e; ++i) deg[row[i] + 1]++;
    std::vector<int64_t> ptr(deg);
    for (int64_t v = 0; v < n; ++v) ptr[v + 1] += ptr[v];
    std::vector<int32_t> nbr(e);
    std::vector<int64_t> fill(ptr.begin(), ptr.end() - 1);
    for (int64_t i = 0; i < e; ++i) nbr[fill[row[i]]++] = col[i];

    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
    int64_t W = walk_length + 1;
    int64_t w_idx = 0;
    for (int32_t rep = 0; rep < walks_per_node; ++rep) {
        for (int64_t v = 0; v < n; ++v, ++w_idx) {
            int32_t cur = (int32_t)v;
            out[w_idx * W] = cur;
            for (int32_t t = 1; t < W; ++t) {
                int64_t d = ptr[cur + 1] - ptr[cur];
                if (d > 0) {
                    uint64_t r = xorshift64(s);
                    cur = nbr[ptr[cur] + (int64_t)(r % (uint64_t)d)];
                }
                out[w_idx * W + t] = cur;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// blocked edge plan (semantics of ops/pallas/plan.py::_build)
// phase 1: count chunks; phase 2: fill arrays
// ---------------------------------------------------------------------------
int64_t gc_plan_count(const int32_t* row, const int32_t* col, int64_t e,
                      int64_t n, int32_t block_n, int32_t chunk) {
    int64_t nblocks = (n + block_n - 1) / block_n;
    // count edges per (rb, cb) bucket
    std::vector<int64_t> counts(nblocks * nblocks, 0);
    for (int64_t i = 0; i < e; ++i)
        counts[(int64_t)(row[i] / block_n) * nblocks + col[i] / block_n]++;
    int64_t n_chunks = 0;
    for (int64_t rb = 0; rb < nblocks; ++rb) {
        bool any = false;
        for (int64_t cb = 0; cb < nblocks; ++cb) {
            int64_t c = counts[rb * nblocks + cb];
            if (c > 0) {
                n_chunks += (c + chunk - 1) / chunk;
                any = true;
            }
        }
        if (!any) n_chunks += 1;   // empty row block still owns one chunk
    }
    return n_chunks;
}

void gc_plan_fill(const int32_t* row, const int32_t* col, const float* weight,
                  int64_t e, int64_t n, int32_t block_n, int32_t chunk,
                  int32_t* row_local, int32_t* col_local, float* w_out,
                  uint8_t* valid, int32_t* row_g, int32_t* col_g,
                  int64_t* tags_out, int32_t* chunk_rows,
                  int32_t* chunk_cols) {
    int64_t nblocks = (n + block_n - 1) / block_n;
    std::vector<int64_t> order(e);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        int64_t ka = (int64_t)(row[a] / block_n) * nblocks + col[a] / block_n;
        int64_t kb = (int64_t)(row[b] / block_n) * nblocks + col[b] / block_n;
        return ka < kb;
    });

    // walk sorted edges bucket by bucket, tracking row blocks seen
    int64_t ci = 0;       // chunk index
    int64_t k = 0;
    for (int64_t rb = 0; rb < nblocks; ++rb) {
        bool any = false;
        while (k < e) {
            int64_t i = order[k];
            int64_t erb = row[i] / block_n;
            if (erb != rb) break;
            int64_t cb = col[i] / block_n;
            // collect this bucket (same rb, cb)
            int64_t start = k;
            while (k < e) {
                int64_t j = order[k];
                if (row[j] / block_n != rb || col[j] / block_n != cb) break;
                ++k;
            }
            int64_t cnt = k - start;
            int64_t pc = ((cnt + chunk - 1) / chunk);
            for (int64_t cc = 0; cc < pc; ++cc) {
                chunk_rows[ci] = (int32_t)rb;
                chunk_cols[ci] = (int32_t)cb;
                int64_t base = ci * (int64_t)chunk;
                for (int64_t s = 0; s < chunk; ++s) {
                    int64_t src = start + cc * chunk + s;
                    int64_t dst = base + s;
                    if (src < start + cnt) {
                        int64_t j = order[src];
                        row_local[dst] = (int32_t)(row[j] - rb * block_n);
                        col_local[dst] = (int32_t)(col[j] - cb * block_n);
                        w_out[dst] = weight ? weight[j] : 1.0f;
                        valid[dst] = 1;
                        row_g[dst] = row[j];
                        col_g[dst] = col[j];
                        tags_out[dst] = j;
                    } else {
                        row_local[dst] = 0;
                        col_local[dst] = 0;
                        w_out[dst] = 0.0f;
                        valid[dst] = 0;
                        row_g[dst] = 0;
                        col_g[dst] = 0;
                        tags_out[dst] = -1;
                    }
                }
                ++ci;
            }
            any = true;
        }
        if (!any) {
            chunk_rows[ci] = (int32_t)rb;
            chunk_cols[ci] = 0;
            int64_t base = ci * (int64_t)chunk;
            for (int64_t s = 0; s < chunk; ++s) {
                row_local[base + s] = 0;
                col_local[base + s] = 0;
                w_out[base + s] = 0.0f;
                valid[base + s] = 0;
                row_g[base + s] = 0;
                col_g[base + s] = 0;
                tags_out[base + s] = -1;
            }
            ++ci;
        }
    }
}

// ---------------------------------------------------------------------------
// stripe plan (ops/pallas/stripe.py): chunks of row-sorted edges that never
// cross node-block boundaries — the host-side planner for the MXU
// gather/scatter kernels. row must be sorted ascending over the e entries.
// ---------------------------------------------------------------------------

int64_t gc_stripe_count(const int32_t* row, int64_t e, int64_t n,
                        int32_t block_n, int32_t chunk) {
    int64_t n_pad = ((n + block_n - 1) / block_n) * (int64_t)block_n;
    int64_t nblocks = n_pad / block_n;
    int64_t nc = 0, i = 0;
    for (int64_t b = 0; b < nblocks; ++b) {
        int64_t lo = i;
        int64_t hi_row = (b + 1) * (int64_t)block_n;
        while (i < e && row[i] < hi_row) ++i;
        int64_t cnt = i - lo;
        nc += cnt == 0 ? 1 : (cnt + chunk - 1) / chunk;
    }
    return nc;
}

void gc_stripe_fill(const int32_t* row, int64_t e, int64_t n,
                    int32_t block_n, int32_t chunk,
                    int32_t* row_local, uint8_t* valid, int32_t* chunk_rows,
                    int32_t* slot_of_edge, int32_t* node_degree) {
    int64_t n_pad = ((n + block_n - 1) / block_n) * (int64_t)block_n;
    int64_t nblocks = n_pad / block_n;
    for (int64_t v = 0; v < n_pad; ++v) node_degree[v] = 0;
    int64_t i = 0, ci = 0;
    for (int64_t b = 0; b < nblocks; ++b) {
        int64_t lo = i;
        int64_t hi_row = (b + 1) * (int64_t)block_n;
        while (i < e && row[i] < hi_row) ++i;
        int64_t cnt = i - lo;
        int64_t pc = cnt == 0 ? 1 : (cnt + chunk - 1) / chunk;
        for (int64_t j = 0; j < pc; ++j) {
            chunk_rows[ci] = (int32_t)b;
            int64_t base = ci * (int64_t)chunk;
            int64_t s0 = lo + j * chunk;
            int64_t nv = cnt - j * (int64_t)chunk;
            if (nv > chunk) nv = chunk;
            if (nv < 0) nv = 0;
            for (int64_t s = 0; s < chunk; ++s) {
                if (s < nv) {
                    int64_t src = s0 + s;
                    row_local[base + s] = row[src] - (int32_t)(b * block_n);
                    valid[base + s] = 1;
                    slot_of_edge[src] = (int32_t)(base + s);
                    node_degree[row[src]]++;
                } else {
                    row_local[base + s] = 0;
                    valid[base + s] = 0;
                }
            }
            ++ci;
        }
    }
}

}  // extern "C"
