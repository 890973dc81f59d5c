// Sparse induced-cost cluster editing.
//
// Same greedy and tie-breaking as the dense oracle
// (ahsoka_tpu/cluster/editing.py, native/cluster_editing.cpp) but over an
// adjacency-list graph, so chains with tens of thousands of reads are
// tractable: read-pair similarity graphs are position-local (a read only
// overlaps ~coverage x span neighbours), and all icf/icp terms live on
// common neighbourhoods.
//
// Role parity: the reference's WhatsHap StaticSparseGraph + EdgeHeap +
// InducedCostHeuristic trio (src/CMakeLists.txt:14-17).  Selection uses a
// lazy max-heap seeded with O(1) node-strength upper bounds; the exact
// O(deg) icf/icp is computed on pop, stale entries are reinserted, and
// operations push refreshed entries for the edges they touch.  In
// exact_priorities mode the refresh covers the full affected
// neighbourhood, making the decision order identical to the dense
// implementations (parity-tested including full decision traces); the
// default approximate mode refreshes only merged-node edges, like the
// reference's EdgeHeap updates.
//
// Adjacency is flat sorted vectors (not node-based maps): the hot loops
// are two-pointer intersections over contiguous memory.  Sums iterate
// common neighbours in ascending id order -- the same order the dense
// code sums columns.

#include <cstdint>
#include <cmath>
#include <limits>
#include <queue>
#include <vector>
#include <algorithm>
#include <cstdio>
#include <cstdlib>

namespace {

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

using Nbr = std::pair<int32_t, double>;
using Adj = std::vector<Nbr>;

inline Adj::iterator lb(Adj& a, int32_t key) {
    return std::lower_bound(
        a.begin(), a.end(), key,
        [](const Nbr& n, int32_t k) { return n.first < k; });
}

inline double get_w(Adj& a, int32_t key) {
    auto it = lb(a, key);
    return (it != a.end() && it->first == key) ? it->second : 0.0;
}

inline void set_w(Adj& a, int32_t key, double w) {
    auto it = lb(a, key);
    if (it != a.end() && it->first == key) it->second = w;
    else a.insert(it, {key, w});
}

inline void erase_nbr(Adj& a, int32_t key) {
    auto it = lb(a, key);
    if (it != a.end() && it->first == key) a.erase(it);
}

}  // namespace

extern "C" {

int64_t ahsoka_cluster_editing_sparse(
    int64_t n, int64_t m, const int32_t* eu, const int32_t* ev,
    const double* ew, int32_t exact_priorities, int32_t* out_assign) {
    if (n <= 0) return 0;
    const double FORB = -1.0e18;
    const double NEG = -std::numeric_limits<double>::infinity();
    std::vector<Adj> adj(n);
    {
        std::vector<int32_t> deg(n, 0);
        for (int64_t i = 0; i < m; ++i)
            if (eu[i] != ev[i] && ew[i] != 0.0) {
                deg[eu[i]]++;
                deg[ev[i]]++;
            }
        for (int64_t i = 0; i < n; ++i) adj[i].reserve(deg[i]);
        for (int64_t i = 0; i < m; ++i) {
            if (eu[i] == ev[i] || ew[i] == 0.0) continue;
            adj[eu[i]].push_back({ev[i], ew[i]});
            adj[ev[i]].push_back({eu[i], ew[i]});
        }
        for (int64_t i = 0; i < n; ++i) {
            std::sort(adj[i].begin(), adj[i].end());
            // collapse duplicate input edges (last weight wins, like
            // repeated map assignment)
            Adj out;
            out.reserve(adj[i].size());
            for (auto& nb : adj[i]) {
                if (!out.empty() && out.back().first == nb.first)
                    out.back().second = nb.second;
                else out.push_back(nb);
            }
            adj[i].swap(out);
        }
    }
    std::vector<uint8_t> alive(n, 1);
    std::vector<std::vector<int32_t>> members(n);
    for (int64_t i = 0; i < n; ++i) members[i] = {(int32_t)i};

    // exact icf/icp sums over the sorted common neighbourhood
    auto sums = [&](int32_t u, int32_t v, double* sf, double* sp) {
        *sf = 0; *sp = 0;
        const Adj& a = adj[u];
        const Adj& b = adj[v];
        size_t ia = 0, ib = 0;
        while (ia < a.size() && ib < b.size()) {
            int32_t ka = a[ia].first, kb = b[ib].first;
            if (ka < kb) ++ia;
            else if (kb < ka) ++ib;
            else {
                if (ka != u && ka != v && alive[ka]) {
                    *sf += fterm(a[ia].second, b[ib].second);
                    *sp += pterm(a[ia].second, b[ib].second);
                }
                ++ia; ++ib;
            }
        }
    };
    auto priority = [&](int32_t u, int32_t v) -> double {
        if (!(alive[u] && alive[v])) return NEG;
        double w = get_w(adj[u], v);
        if (w <= 0) return NEG;
        double sf, sp;
        sums(u, v, &sf, &sp);
        double icf = w + sf;          // relu(w) == w for w > 0
        double icp = sp;              // relu(-w) == 0 for w > 0
        return icf > icp ? icf : icp;
    };

    std::priority_queue<Entry> heap;
    auto push_edge = [&](int32_t u, int32_t v) {
        if (u > v) std::swap(u, v);
        double p = priority(u, v);
        if (p > NEG) heap.push({p, u, v});
    };
    // O(m) lazy initialisation with node-strength upper bounds; exact
    // values are computed on pop and stale entries reinserted
    {
        std::vector<double> pos_str(n, 0.0), abs_str(n, 0.0);
        for (int32_t u = 0; u < n; ++u)
            for (auto& nb : adj[u]) {
                if (nb.second > 0) pos_str[u] += nb.second;
                abs_str[u] += std::fabs(nb.second);
            }
        for (int32_t u = 0; u < n; ++u)
            for (auto& nb : adj[u]) {
                int32_t v = nb.first;
                double w = nb.second;
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
        if (cur == NEG) continue;
        if (cur != e.p) { heap.push({cur, e.u, e.v}); continue; }

        int32_t u = e.u, v = e.v;
        double w = get_w(adj[u], v);
        double sf, sp;
        sums(u, v, &sf, &sp);
        double icf = w + sf;
        double icp = sp;
        if (getenv("AHSOKA_CE_TRACE"))
            fprintf(stderr, "S %d %d icf=%.9g icp=%.9g %s\n",
                    u, v, icf, icp, icf >= icp ? "merge" : "forbid");

        if (icf >= icp) {
            // merge v into u: weights add; fill-in creates new edges
            Adj old_v;
            old_v.swap(adj[v]);
            std::vector<int32_t> affected;
            if (exact_priorities) {
                affected.reserve(adj[u].size() + old_v.size() + 1);
                affected.push_back(u);
                for (auto& nb : adj[u]) affected.push_back(nb.first);
                for (auto& nb : old_v) affected.push_back(nb.first);
            }
            for (auto& nb : old_v) {
                int32_t x = nb.first;
                if (x == u) continue;
                double nw = get_w(adj[u], x) + nb.second;
                erase_nbr(adj[x], v);
                if (nw == 0.0) {
                    erase_nbr(adj[u], x);
                    erase_nbr(adj[x], u);
                } else {
                    set_w(adj[u], x, nw);
                    set_w(adj[x], u, nw);
                }
            }
            erase_nbr(adj[u], v);
            alive[v] = 0;
            members[u].insert(members[u].end(), members[v].begin(),
                              members[v].end());
            members[v].clear();
            if (exact_priorities) {
                std::sort(affected.begin(), affected.end());
                affected.erase(
                    std::unique(affected.begin(), affected.end()),
                    affected.end());
                for (int32_t x : affected) {
                    if (!alive[x]) continue;
                    for (auto& nb : adj[x]) {
                        int32_t y = nb.first;
                        if (y > x && nb.second > 0 && alive[y] &&
                            std::binary_search(affected.begin(),
                                               affected.end(), y))
                            push_edge(x, y);
                    }
                }
            } else {
                // approximate: refresh only the merged node's edges
                for (auto& nb : adj[u])
                    if (nb.second > 0 && alive[nb.first])
                        push_edge(u, nb.first);
            }
        } else {
            set_w(adj[u], v, FORB);
            set_w(adj[v], u, FORB);
            // affected: edges (u, y) for y in N(v), (v, y) for y in N(u)
            for (auto& nb : adj[v])
                if (nb.first != u && get_w(adj[u], nb.first) > 0)
                    push_edge(u, nb.first);
            for (auto& nb : adj[u])
                if (nb.first != v && get_w(adj[v], nb.first) > 0)
                    push_edge(v, nb.first);
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

// Sparse solver for the WhatsHap-published decision rule
// (cluster/editing.py mode="whatshap"): two lazy max-heaps — one ordered
// by icf, one by icp, over ALL undecided nonzero edges (negative
// included).  Each step compares the exact maxima: the max-icf edge
// becomes permanent (merge) when its icf >= the max-icp edge's icp,
// otherwise the max-icp edge becomes forbidden.  Stops when max icf
// reaches 0 (only repulsive edges remain; forbidding them cannot change
// the clusters).  Stale heap entries are safe to drop on mismatch.
//
// exact_priorities=1: every merge pushes fresh entries for all pairs in
// the affected neighbourhood, so increases are never missed and the
// decision order is identical to the dense oracle (parity-tested).
// exact_priorities=0 (the product default): merges refresh only the
// contracted node's incident edges — the update policy of WhatsHap's own
// EdgeHeap (the published implementation this mode reproduces); an edge
// whose priority rose elsewhere is found later via its old entry, so the
// decision ORDER can differ from the dense oracle while the rule itself
// is unchanged.  Divergence is quantified in
// scripts/quantify_fastpaths.py (no cluster/haplotype divergence
// observed at 2k-8k reads).
int64_t ahsoka_cluster_editing_sparse_wh(
    int64_t n, int64_t m, const int32_t* eu, const int32_t* ev,
    const double* ew, int32_t exact_priorities, int32_t* out_assign) {
    if (n <= 0) return 0;
    const double FORB = -1.0e18;
    std::vector<Adj> adj(n);
    {
        std::vector<int32_t> deg(n, 0);
        for (int64_t i = 0; i < m; ++i)
            if (eu[i] != ev[i] && ew[i] != 0.0) {
                deg[eu[i]]++;
                deg[ev[i]]++;
            }
        for (int64_t i = 0; i < n; ++i) adj[i].reserve(deg[i]);
        for (int64_t i = 0; i < m; ++i) {
            if (eu[i] == ev[i] || ew[i] == 0.0) continue;
            adj[eu[i]].push_back({ev[i], ew[i]});
            adj[ev[i]].push_back({eu[i], ew[i]});
        }
        for (int64_t i = 0; i < n; ++i) {
            std::sort(adj[i].begin(), adj[i].end());
            Adj out;
            out.reserve(adj[i].size());
            for (auto& nb : adj[i]) {
                if (!out.empty() && out.back().first == nb.first)
                    out.back().second = nb.second;
                else out.push_back(nb);
            }
            adj[i].swap(out);
        }
    }
    std::vector<uint8_t> alive(n, 1);
    std::vector<std::vector<int32_t>> members(n);
    for (int64_t i = 0; i < n; ++i) members[i] = {(int32_t)i};

    auto sums = [&](int32_t u, int32_t v, double* sf, double* sp) {
        *sf = 0; *sp = 0;
        const Adj& a = adj[u];
        const Adj& b = adj[v];
        size_t ia = 0, ib = 0;
        while (ia < a.size() && ib < b.size()) {
            int32_t ka = a[ia].first, kb = b[ib].first;
            if (ka < kb) ++ia;
            else if (kb < ka) ++ib;
            else {
                if (ka != u && ka != v && alive[ka]) {
                    *sf += fterm(a[ia].second, b[ib].second);
                    *sp += pterm(a[ia].second, b[ib].second);
                }
                ++ia; ++ib;
            }
        }
    };
    auto undecided = [&](int32_t u, int32_t v) -> bool {
        if (!(alive[u] && alive[v])) return false;
        double w = get_w(adj[u], v);
        return w != 0.0 && w != FORB;
    };
    auto icf_of = [&](int32_t u, int32_t v) -> double {
        double w = get_w(adj[u], v);
        double sf, sp;
        sums(u, v, &sf, &sp);
        return (w > 0 ? w : 0) + sf;
    };
    auto icp_of = [&](int32_t u, int32_t v) -> double {
        double w = get_w(adj[u], v);
        double sf, sp;
        sums(u, v, &sf, &sp);
        return (w < 0 ? -w : 0) + sp;
    };

    std::priority_queue<Entry> heapF, heapP;
    auto push_both = [&](int32_t u, int32_t v) {
        if (u > v) std::swap(u, v);
        if (!undecided(u, v)) return;
        double w = get_w(adj[u], v);
        double sf, sp;
        sums(u, v, &sf, &sp);
        heapF.push({(w > 0 ? w : 0) + sf, u, v});
        heapP.push({(w < 0 ? -w : 0) + sp, u, v});
    };
    // O(m) init with node-strength upper bounds; exact values are
    // computed on pop and stale entries refreshed
    {
        std::vector<double> pos_str(n, 0.0), abs_str(n, 0.0);
        for (int32_t u = 0; u < n; ++u)
            for (auto& nb : adj[u]) {
                if (nb.second > 0) pos_str[u] += nb.second;
                abs_str[u] += std::fabs(nb.second);
            }
        for (int32_t u = 0; u < n; ++u)
            for (auto& nb : adj[u]) {
                int32_t v = nb.first;
                double w = nb.second;
                if (v <= u) continue;
                double wpos = w > 0 ? w : 0;
                double wabs = std::fabs(w);
                double icf_ub = wpos + std::min(pos_str[u] - wpos,
                                                pos_str[v] - wpos);
                double icp_ub = (w < 0 ? -w : 0) +
                                std::min(abs_str[u] - wabs,
                                         abs_str[v] - wabs);
                heapF.push({icf_ub, u, v});
                heapP.push({icp_ub, u, v});
            }
    }

    // pop until the top entry's stored value equals its exact value;
    // stale entries are refreshed (every mutation also pushes fresh
    // entries for the edges it touches, so the max is never lost)
    auto exact_top = [&](std::priority_queue<Entry>& heap,
                         bool use_icf, Entry* out) -> bool {
        while (!heap.empty()) {
            Entry e = heap.top();
            heap.pop();
            if (!undecided(e.u, e.v)) continue;
            double cur = use_icf ? icf_of(e.u, e.v) : icp_of(e.u, e.v);
            if (cur == e.p) { *out = e; return true; }
            heap.push({cur, e.u, e.v});
        }
        return false;
    };

    while (true) {
        Entry eF, eP;
        if (!exact_top(heapF, true, &eF))
            break;
        if (eF.p <= 0) break;             // only repulsive edges remain
        bool haveP = exact_top(heapP, false, &eP);
        bool do_merge = !haveP || eF.p >= eP.p;
        if (getenv("AHSOKA_CE_TRACE"))
            fprintf(stderr, "W %d %d icf=%.9g icp=%.9g %s\n",
                    do_merge ? eF.u : eP.u, do_merge ? eF.v : eP.v,
                    eF.p, haveP ? eP.p : 0.0,
                    do_merge ? "merge" : "forbid");
        if (do_merge) {
            if (haveP) heapP.push(eP);    // unconsumed
            int32_t u = eF.u, v = eF.v;
            Adj old_v;
            old_v.swap(adj[v]);
            std::vector<int32_t> affected;
            if (exact_priorities) {
                affected.reserve(adj[u].size() + old_v.size() + 1);
                affected.push_back(u);
                for (auto& nb : adj[u]) affected.push_back(nb.first);
                for (auto& nb : old_v) affected.push_back(nb.first);
            }
            for (auto& nb : old_v) {
                int32_t x = nb.first;
                if (x == u) continue;
                double wu = get_w(adj[u], x);
                // forbidden is sticky under merging (-inf + w = -inf)
                double nw = (wu == FORB || nb.second == FORB)
                                ? FORB : wu + nb.second;
                erase_nbr(adj[x], v);
                if (nw == 0.0) {
                    erase_nbr(adj[u], x);
                    erase_nbr(adj[x], u);
                } else {
                    set_w(adj[u], x, nw);
                    set_w(adj[x], u, nw);
                }
            }
            erase_nbr(adj[u], v);
            alive[v] = 0;
            members[u].insert(members[u].end(), members[v].begin(),
                              members[v].end());
            members[v].clear();
            if (exact_priorities) {
                std::sort(affected.begin(), affected.end());
                affected.erase(
                    std::unique(affected.begin(), affected.end()),
                    affected.end());
                for (int32_t x : affected) {
                    if (!alive[x]) continue;
                    for (auto& nb : adj[x]) {
                        int32_t y = nb.first;
                        if (y > x && alive[y] &&
                            std::binary_search(affected.begin(),
                                               affected.end(), y))
                            push_both(x, y);
                    }
                }
            } else {
                // approximate: refresh only the contracted node's edges
                // (WhatsHap EdgeHeap update policy)
                for (auto& nb : adj[u])
                    if (alive[nb.first]) push_both(u, nb.first);
            }
        } else {
            heapF.push(eF);               // unconsumed
            int32_t u = eP.u, v = eP.v;
            set_w(adj[u], v, FORB);
            set_w(adj[v], u, FORB);
            // affected: edges (u, y) for y in N(v), (v, y) for y in N(u)
            for (auto& nb : adj[v])
                if (nb.first != u) push_both(u, nb.first);
            for (auto& nb : adj[u])
                if (nb.first != v) push_both(v, nb.first);
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
