// Native compatibility helpers for ahsoka_tpu.
//
// Exposes the iteration order of a real libstdc++ std::unordered_map so the
// Python pipeline can reproduce the reference's chain/bubble numbering
// exactly (the reference iterates unordered_map<int, Node> at
// src/graph.cpp:333-335 to discover chains).  Loaded via ctypes; see
// ahsoka_tpu/compat/_native.py.

#include <unordered_map>
#include <cstdint>

extern "C" {

// Insert `keys[0..n)` (first-touch) into an unordered_map<int, int> and write
// its iteration order into `out` (capacity n).  Returns the number of
// distinct keys written.
int64_t ahsoka_stdmap_order(const int64_t* keys, int64_t n, int64_t* out) {
    std::unordered_map<int, int> m;  // default growth policy, like the
                                     // reference's Graph::nodes
    for (int64_t i = 0; i < n; ++i) {
        m[(int)keys[i]];  // operator[] first-touch, like the reference parser
    }
    int64_t k = 0;
    for (auto& kv : m) out[k++] = kv.first;
    return k;
}

}  // extern "C"
