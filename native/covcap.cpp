// Coverage-cap greedy (project/subsample.py) as a native O(nnz) pass.
//
// The greedy is inherently sequential — each read's keep decision feeds
// the running per-position coverage — so it cannot vectorise as a tensor
// program; in Python it cost ~4.5 s on a 50k-read chain (config2's
// matrix.covcap substage).  Semantics are EXACTLY subsample_matrix's
// loop (keep when some covered position is still uncovered, or at least
// half of the covered positions are under the cap), parity-tested
// against the Python oracle.  Takes the covered entries as sorted COO
// (row-major, as np.nonzero emits) so the walk is O(nnz), not O(R*P).
//
// Reference context: coverage economics of the covmap cutoff,
// /root/reference/src/alignmentstoreadset.cpp:751-779 (the stage this
// cap bounds ahead of scoring).

#include <cstdint>

extern "C" int64_t ahsoka_covcap(const int64_t* r_nz, const int64_t* p_nz,
                                 int64_t nnz, int64_t R, int64_t P,
                                 int64_t cap, int32_t* cov,
                                 uint8_t* keep) {
    int64_t kept = 0;
    for (int64_t p = 0; p < P; ++p) cov[p] = 0;
    for (int64_t i = 0; i < R; ++i) keep[i] = 0;
    int64_t idx = 0;
    while (idx < nnz) {
        const int64_t row = r_nz[idx];
        int64_t end = idx;
        while (end < nnz && r_nz[end] == row) ++end;
        const int64_t n = end - idx;
        int64_t under = 0;
        bool orphan = false;
        for (int64_t j = idx; j < end; ++j) {
            const int32_t c = cov[p_nz[j]];
            if (c < cap) ++under;
            if (c == 0) orphan = true;
        }
        if (orphan || 2 * under >= n) {
            keep[row] = 1;
            ++kept;
            for (int64_t j = idx; j < end; ++j) ++cov[p_nz[j]];
        }
        idx = end;
    }
    return kept;
}
