// Native runtime helpers for rt-octree-tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this module provides the
// host-side runtime pieces that the reference implements in C++
// (cnpy-style loading, tree analysis, acceleration-structure builds --
// renderer/src/n3tree.cpp and the occupancy-LUT design sketched at
// n3tree.cpp:174-226) where vectorized NumPy is 10-100x too slow.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in this
// environment).  Build: python -m rt_octree_tpu.native.build
//
// Functions:
//   rtn_tree_max_depth   BFS depth of an N^3 tree's child links
//   rtn_build_jump_lut   dense descent LUT at a given level
//   rtn_decode_quant     quantized-color codebook expansion
//   rtn_count_leaves     leaf statistics (for diagnostics)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns max descent iterations (root-only tree -> 1), or -1 on cycle.
int32_t rtn_tree_max_depth(const int32_t* child, int64_t n_nodes,
                           int32_t N3) {
    std::vector<int64_t> frontier{0}, next;
    int32_t depth = 1;
    while (!frontier.empty()) {
        next.clear();
        for (int64_t node : frontier) {
            const int32_t* row = child + node * N3;
            for (int32_t i = 0; i < N3; ++i) {
                if (row[i] != 0) next.push_back(node + row[i]);
            }
        }
        if (next.empty()) return depth;
        ++depth;
        if (depth > 64) return -1;
        frontier.swap(next);
    }
    return depth;
}

// Dense jump LUT: for each cell of the res^3 grid (res = N^levels),
// descend up to `levels` levels.  out_ptr[cell] = sub-pointer (leaf) or
// node id (still internal); out_depth[cell] = levels reached, or 255 if
// internal at `levels`.
// Cells are flattened x-major: ((x*res)+y)*res + z.
void rtn_build_jump_lut(const int32_t* child, int64_t n_nodes, int32_t N,
                        int32_t levels, int32_t* out_ptr,
                        uint8_t* out_depth) {
    const int32_t N3 = N * N * N;
    int64_t res = 1;
    for (int32_t l = 0; l < levels; ++l) res *= N;
    const int64_t n_cells = res * res * res;

    for (int64_t cell = 0; cell < n_cells; ++cell) {
        int64_t z = cell % res, y = (cell / res) % res, x = cell / (res * res);
        int64_t node = 0;
        uint8_t depth = 255;
        int32_t ptr_out = 0;
        for (int32_t lev = 0; lev < levels; ++lev) {
            const int32_t shift_div = levels - 1 - lev;
            int64_t div = 1;
            for (int32_t s = 0; s < shift_div; ++s) div *= N;
            const int64_t cx = (x / div) % N;
            const int64_t cy = (y / div) % N;
            const int64_t cz = (z / div) % N;
            const int64_t sub = node * N3 + (cx * N + cy) * N + cz;
            const int32_t skip = child[sub];
            if (skip == 0) {
                ptr_out = (int32_t)sub;
                depth = (uint8_t)(lev + 1);
                break;
            }
            node += skip;
        }
        if (depth == 255) ptr_out = (int32_t)node;
        out_ptr[cell] = ptr_out;
        out_depth[cell] = depth;
    }
}

// Quantized-color decode (reference semantics at n3tree.cpp:279-340).
// quant_colors: [n_q, 65536, 3] half (uint16 bits)
// quant_map:    [n_q, n_child] uint16
// sigma:        [n_child] half
// retained:     [n_retain, n_child, 3] half (may be null)
// out:          [n_child, data_dim] half
void rtn_decode_quant(const uint16_t* quant_colors, const uint16_t* quant_map,
                      const uint16_t* sigma, const uint16_t* retained,
                      int32_t n_q, int32_t n_retain, int64_t n_child,
                      int32_t data_dim, uint16_t* out) {
    const int32_t n_basis = n_q + n_retain;
    for (int64_t i = 0; i < n_child; ++i) {
        uint16_t* row = out + i * data_dim;
        for (int32_t j = 0; j < n_q; ++j) {
            const uint16_t id = quant_map[(int64_t)j * n_child + i];
            const uint16_t* col = quant_colors + ((int64_t)j * 65536 + id) * 3;
            int32_t boff = n_retain + j;
            for (int32_t k = 0; k < 3; ++k) {
                row[boff] = col[k];
                boff += n_basis;
            }
        }
        if (retained) {
            for (int32_t j = 0; j < n_retain; ++j) {
                const uint16_t* col =
                    retained + ((int64_t)j * n_child + i) * 3;
                int32_t boff = j;
                for (int32_t k = 0; k < 3; ++k) {
                    row[boff] = col[k];
                    boff += n_basis;
                }
            }
        }
        row[data_dim - 1] = sigma[i];
    }
}

// Leaf statistics: count leaves and max sub-pointer (diagnostics, also
// validates LUT packability).
void rtn_count_leaves(const int32_t* child, int64_t n_entries,
                      int64_t* out_leaves, int64_t* out_internal) {
    int64_t leaves = 0, internal = 0;
    for (int64_t i = 0; i < n_entries; ++i) {
        if (child[i] == 0) ++leaves; else ++internal;
    }
    *out_leaves = leaves;
    *out_internal = internal;
}

}  // extern "C"
