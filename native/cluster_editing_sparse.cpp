// Sparse induced-cost cluster editing.
//
// Same greedy and tie-breaking as the dense oracle
// (ahsoka_tpu/cluster/editing.py, native/cluster_editing.cpp) but over an
// adjacency-map graph, so chains with tens of thousands of reads are
// tractable: read-pair similarity graphs are position-local (a read only
// overlaps ~coverage x span neighbours), and all icf/icp terms live on
// common neighbourhoods.
//
// Role parity: the reference's WhatsHap StaticSparseGraph + EdgeHeap +
// InducedCostHeuristic trio (src/CMakeLists.txt:14-17).  Selection uses a
// lazy max-heap: stale entries are revalidated on pop, and any edge whose
// neighbourhood an operation touches gets a fresh entry pushed, so the
// accepted pop is always the true (priority, u, v)-lexicographic maximum —
// identical decision order to the dense implementation (parity-tested).
//
// Determinism: icf/icp sums iterate common neighbours in ascending id
// order (std::map adjacency), the same order the dense code sums columns,
// so floating-point results match the dense path bit-for-bit.

#include <cstdint>
#include <cmath>
#include <limits>
#include <map>
#include <queue>
#include <tuple>
#include <vector>
#include <algorithm>
#include <cstdio>
#include <cstdlib>

namespace {

inline double relu(double x) { return x > 0 ? x : 0; }
inline double fterm(double a, double b) {
    double m = a < b ? a : b;
    return m > 0 ? m : 0;
}
inline double pterm(double a, double b) {
    if ((a > 0) == (b > 0) || a == 0 || b == 0) return 0;
    double fa = std::fabs(a), fb = std::fabs(b);
    return fa < fb ? fa : fb;
}

struct Entry {
    double p;
    int32_t u, v;
    bool operator<(const Entry& o) const {
        // max-heap on p; ties -> smallest (u, v) first
        if (p != o.p) return p < o.p;
        if (u != o.u) return u > o.u;
        return v > o.v;
    }
};

}  // namespace

extern "C" {

// exact_priorities != 0: refresh every pair inside the merged
// neighbourhood so the selection order equals the dense oracle's
// (O(deg^2) per merge — parity/testing mode).  0: refresh only edges
// incident to the merged node, like the reference's WhatsHap
// InducedCostHeuristic/EdgeHeap updates — decisions still use exact
// icf/icp values (pop revalidation), only the selection order may
// deviate; this keeps mega-cluster merges near-linear.
int64_t ahsoka_cluster_editing_sparse(
    int64_t n, int64_t m, const int32_t* eu, const int32_t* ev,
    const double* ew, int32_t exact_priorities, int32_t* out_assign) {
    if (n <= 0) return 0;
    const double FORB = -1.0e18;
    std::vector<std::map<int32_t, double>> adj(n);
    for (int64_t i = 0; i < m; ++i) {
        int32_t u = eu[i], v = ev[i];
        double w = ew[i];
        if (u == v || w == 0.0) continue;
        adj[u][v] = w;
        adj[v][u] = w;
    }
    std::vector<uint8_t> alive(n, 1);
    std::vector<std::vector<int32_t>> members(n);
    for (int64_t i = 0; i < n; ++i) members[i] = {(int32_t)i};

    auto weight = [&](int32_t u, int32_t v) -> double {
        auto it = adj[u].find(v);
        return it == adj[u].end() ? 0.0 : it->second;
    };

    // on-demand icf/icp over the (sorted) common neighbourhood
    auto priority = [&](int32_t u, int32_t v) -> double {
        double w = weight(u, v);
        if (!(alive[u] && alive[v]) || w <= 0) return
            -std::numeric_limits<double>::infinity();
        const auto& a = adj[u];
        const auto& b = adj[v];
        double sf = 0, sp = 0;
        auto ia = a.begin(), ib = b.begin();
        while (ia != a.end() && ib != b.end()) {
            if (ia->first < ib->first) ++ia;
            else if (ib->first < ia->first) ++ib;
            else {
                int32_t z = ia->first;
                if (z != u && z != v && alive[z]) {
                    sf += fterm(ia->second, ib->second);
                    sp += pterm(ia->second, ib->second);
                }
                ++ia; ++ib;
            }
        }
        double icf = relu(w) + sf;
        double icp = relu(-w) + sp;
        return icf > icp ? icf : icp;
    };

    std::priority_queue<Entry> heap;
    auto push_edge = [&](int32_t u, int32_t v) {
        if (u > v) std::swap(u, v);
        double p = priority(u, v);
        if (p > -std::numeric_limits<double>::infinity())
            heap.push({p, u, v});
    };
    // O(m) lazy initialisation: push an upper bound on each edge's
    // priority (node strengths bound the common-neighbourhood sums); the
    // exact O(deg) icf/icp is computed only when an edge is popped, and a
    // stale pop reinserts the exact value.  Upper bounds keep the lazy
    // max-heap correct: the accepted pop is always the true maximum.
    {
        std::vector<double> pos_str(n, 0.0), abs_str(n, 0.0);
        for (int32_t u = 0; u < n; ++u)
            for (auto& kv : adj[u]) {
                if (kv.second > 0) pos_str[u] += kv.second;
                abs_str[u] += std::fabs(kv.second);
            }
        for (int32_t u = 0; u < n; ++u)
            for (auto& kv : adj[u]) {
                int32_t v = kv.first;
                double w = kv.second;
                if (v <= u || w <= 0) continue;
                double icf_ub = w + std::min(pos_str[u] - w,
                                             pos_str[v] - w);
                double icp_ub = std::min(abs_str[u] - w, abs_str[v] - w);
                heap.push({std::max(icf_ub, icp_ub), u, v});
            }
    }

    while (!heap.empty()) {
        Entry e = heap.top();
        heap.pop();
        double cur = priority(e.u, e.v);
        if (cur == -std::numeric_limits<double>::infinity()) continue;
        if (cur != e.p) {
            if (cur < e.p) { heap.push({cur, e.u, e.v}); continue; }
            // cur > e.p can only follow an un-refreshed increase in
            // approximate mode; treat the exact value as authoritative
            heap.push({cur, e.u, e.v});
            continue;
        }

        int32_t u = e.u, v = e.v;
        double w = weight(u, v);
        // recompute icf/icp for the decision
        double sf = 0, sp = 0;
        {
            auto ia = adj[u].begin(), ib = adj[v].begin();
            while (ia != adj[u].end() && ib != adj[v].end()) {
                if (ia->first < ib->first) ++ia;
                else if (ib->first < ia->first) ++ib;
                else {
                    int32_t z = ia->first;
                    if (z != u && z != v && alive[z]) {
                        sf += fterm(ia->second, ib->second);
                        sp += pterm(ia->second, ib->second);
                    }
                    ++ia; ++ib;
                }
            }
        }
        double icf = relu(w) + sf;
        double icp = relu(-w) + sp;
        if (getenv("AHSOKA_CE_TRACE"))
            fprintf(stderr, "S %d %d icf=%.9g icp=%.9g %s\n",
                    u, v, icf, icp, icf >= icp ? "merge" : "forbid");

        if (icf >= icp) {
            // merge v into u: weights add; fill-in creates new edges
            std::vector<int32_t> affected;
            affected.push_back(u);
            for (auto& kv : adj[u]) affected.push_back(kv.first);
            for (auto& kv : adj[v]) affected.push_back(kv.first);
            for (auto& kv : adj[v]) {
                int32_t x = kv.first;
                if (x == u) continue;
                double nw = weight(u, x) + kv.second;
                adj[x].erase(v);
                if (nw == 0.0) {
                    adj[u].erase(x);
                    adj[x].erase(u);
                } else {
                    adj[u][x] = nw;
                    adj[x][u] = nw;
                }
            }
            adj[u].erase(v);
            adj[v].clear();
            alive[v] = 0;
            members[u].insert(members[u].end(), members[v].begin(),
                              members[v].end());
            members[v].clear();
            if (exact_priorities) {
                // refresh every positive edge whose icf/icp involves z=u
                // or z=v (both endpoints in the old joint neighbourhood)
                std::sort(affected.begin(), affected.end());
                affected.erase(
                    std::unique(affected.begin(), affected.end()),
                    affected.end());
                for (int32_t x : affected) {
                    if (!alive[x]) continue;
                    for (auto& kv : adj[x]) {
                        int32_t y = kv.first;
                        if (y > x && kv.second > 0 && alive[y] &&
                            std::binary_search(affected.begin(),
                                               affected.end(), y))
                            push_edge(x, y);
                    }
                }
            } else {
                // approximate: refresh only the merged node's edges
                for (auto& kv : adj[u])
                    if (kv.second > 0 && alive[kv.first])
                        push_edge(u, kv.first);
            }
        } else {
            adj[u][v] = FORB;
            adj[v][u] = FORB;
            // affected: edges (u, y) for y in N(v), (v, y) for y in N(u)
            for (auto& kv : adj[v])
                if (kv.first != u && weight(u, kv.first) > 0)
                    push_edge(u, kv.first);
            for (auto& kv : adj[u])
                if (kv.first != v && weight(v, kv.first) > 0)
                    push_edge(v, kv.first);
        }
    }

    std::vector<std::pair<int32_t, int64_t>> reps;
    for (int64_t i = 0; i < n; ++i)
        if (alive[i]) {
            std::sort(members[i].begin(), members[i].end());
            reps.push_back({members[i][0], i});
        }
    std::sort(reps.begin(), reps.end());
    int32_t cid = 0;
    for (auto& rp : reps) {
        for (int32_t mm : members[rp.second]) out_assign[mm] = cid;
        ++cid;
    }
    return (int64_t)reps.size();
}

}  // extern "C"
