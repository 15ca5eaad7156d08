// femshell_native — host-side native kernels for the TPU shell framework.
//
// Replaces the C++ layers the reference delegated to libMesh for mesh/graph
// bookkeeping (node adjacency, DOF/sparsity pattern construction,
// partition-local slot tables; cf. libMesh DofMap / sparsity pattern build)
// with flat-array equivalents exposed through a C ABI (loaded via ctypes).
// The Python fallback in fem_shell_tpu/ops/assemble.py implements the same
// contract; this version is the production path for multi-million-element
// meshes where Python-loop pattern construction dominates setup time.
//
// Build: g++ -O3 -march=native -shared -fPIC femshell_native.cpp -o libfemshell_native.so
#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct EllHandle {
    int32_t n_nodes = 0;
    int32_t k_max = 0;
    // CSR-ish adjacency: per node sorted unique neighbor list (self included)
    std::vector<std::vector<int32_t>> nbrs;
    const int32_t* tri = nullptr;
    int64_t n_tri = 0;
    const int32_t* quad = nullptr;
    int64_t n_quad = 0;
};

static void add_clique(std::vector<std::vector<int32_t>>& nbrs, const int32_t* conn,
                       int64_t n_elems, int m) {
    for (int64_t e = 0; e < n_elems; ++e) {
        const int32_t* row = conn + e * m;
        for (int a = 0; a < m; ++a) {
            auto& lst = nbrs[row[a]];
            for (int b = 0; b < m; ++b) {
                int32_t v = row[b];
                auto it = std::lower_bound(lst.begin(), lst.end(), v);
                if (it == lst.end() || *it != v) lst.insert(it, v);
            }
        }
    }
}

// Build the node-pair adjacency graph. Returns an opaque handle; k_out
// receives the max neighbor count (>= k_min when k_min > 0).
void* ell_build(int32_t n_nodes, const int32_t* tri, int64_t n_tri,
                const int32_t* quad, int64_t n_quad, int32_t k_min,
                int32_t* k_out) {
    auto* h = new EllHandle();
    h->n_nodes = n_nodes;
    h->tri = tri;
    h->n_tri = n_tri;
    h->quad = quad;
    h->n_quad = n_quad;
    h->nbrs.resize(n_nodes);
    for (int32_t i = 0; i < n_nodes; ++i) h->nbrs[i].push_back(i);  // self
    add_clique(h->nbrs, tri, n_tri, 3);
    add_clique(h->nbrs, quad, n_quad, 4);
    int32_t k = 1;
    for (auto& lst : h->nbrs) k = std::max<int32_t>(k, (int32_t)lst.size());
    if (k_min > k) k = k_min;
    h->k_max = k;
    *k_out = k;
    return h;
}

// Fill the fixed-shape ELL tables:
//   adj      [n_nodes, k_max] int32 (padded with self id)
//   valid    [n_nodes, k_max] uint8
//   tri_slot [n_tri, 3, 3]    int32 — flat index node*k_max + slot
//   quad_slot[n_quad, 4, 4]   int32
void ell_fill(void* handle, int32_t* adj, uint8_t* valid, int32_t* tri_slot,
              int32_t* quad_slot) {
    auto* h = (EllHandle*)handle;
    const int32_t k = h->k_max;
    for (int32_t i = 0; i < h->n_nodes; ++i) {
        const auto& lst = h->nbrs[i];
        int32_t* arow = adj + (int64_t)i * k;
        uint8_t* vrow = valid + (int64_t)i * k;
        size_t s = 0;
        for (; s < lst.size(); ++s) {
            arow[s] = lst[s];
            vrow[s] = 1;
        }
        for (; s < (size_t)k; ++s) {
            arow[s] = i;
            vrow[s] = 0;
        }
    }
    auto slot_of = [&](int32_t i, int32_t j) -> int32_t {
        const auto& lst = h->nbrs[i];
        auto it = std::lower_bound(lst.begin(), lst.end(), j);
        return (int32_t)(i * (int64_t)k + (it - lst.begin()));
    };
    for (int64_t e = 0; e < h->n_tri; ++e) {
        const int32_t* row = h->tri + e * 3;
        int32_t* out = tri_slot + e * 9;
        for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 3; ++b) out[a * 3 + b] = slot_of(row[a], row[b]);
    }
    for (int64_t e = 0; e < h->n_quad; ++e) {
        const int32_t* row = h->quad + e * 4;
        int32_t* out = quad_slot + e * 16;
        for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b) out[a * 4 + b] = slot_of(row[a], row[b]);
    }
}

void ell_free(void* handle) { delete (EllHandle*)handle; }

// ----------------------------------------------------------------------
// Fast XDA text parse (element + node sections) for big meshes.
// Returns number of tokens consumed, or -1 on error.
int64_t parse_doubles(const char* buf, int64_t len, double* out, int64_t n) {
    const char* p = buf;
    const char* end = buf + len;
    for (int64_t i = 0; i < n; ++i) {
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p || next > end) return i;
        out[i] = v;
        p = next;
    }
    return n;
}

int64_t parse_ints(const char* buf, int64_t len, int64_t* out, int64_t n) {
    const char* p = buf;
    const char* end = buf + len;
    for (int64_t i = 0; i < n; ++i) {
        char* next = nullptr;
        long long v = strtoll(p, &next, 10);
        if (next == p || next > end) return i;
        out[i] = (int64_t)v;
        p = next;
    }
    return n;
}

}  // extern "C"
