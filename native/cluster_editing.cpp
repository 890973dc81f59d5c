// Native induced-cost cluster editing — same greedy as
// ahsoka_tpu/cluster/editing.py (the Python oracle), at native speed.
//
// Role parity: the reference links WhatsHap's ClusterEditingSolver /
// InducedCostHeuristic / StaticSparseGraph / EdgeHeap C++ components
// (src/CMakeLists.txt:14-17, called at src/alignmentstoreadset.cpp:312-314).
// This is this framework's native equivalent: a fresh implementation of the
// induced-cost greedy on a dense weight matrix, kept semantically identical
// to the Python oracle (parity-tested) so host and native paths cluster
// identically.
//
// Priorities (max of icf/icp) are selected via a per-row maximum cache:
// - forbidding an edge (u,v) only changes the pair entries (u,*) and (v,*),
//   so its sum updates and row-max fixups are O(n);
// - merging rewrites two weight columns, so its updates are O(n^2)
//   (bounded by <= n merges overall).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <limits>
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
}

extern "C" {

// W: n*n symmetric weights (copied by caller; modified in place).
// out_assign: per-node cluster id (clusters ordered by smallest member).
// Returns the number of clusters.
int64_t ahsoka_cluster_editing(double* W, int64_t n, int32_t* out_assign) {
    if (n <= 0) return 0;
    const double FORB = -1.0e18;
    const double NEG = -std::numeric_limits<double>::infinity();
    std::vector<uint8_t> alive(n, 1);
    std::vector<std::vector<int32_t>> members(n);
    for (int64_t i = 0; i < n; ++i) members[i] = {(int32_t)i};
    for (int64_t i = 0; i < n; ++i) W[i * n + i] = 0.0;

    std::vector<double> sumF((size_t)n * n, 0.0), sumP((size_t)n * n, 0.0);
    for (int64_t z = 0; z < n; ++z) {
        const double* col = W + z * n;
        for (int64_t x = 0; x < n; ++x) {
            double wx = col[x];
            if (wx == 0.0) continue;
            double* rowF = sumF.data() + x * n;
            double* rowP = sumP.data() + x * n;
            for (int64_t y = 0; y < n; ++y) {
                double wy = col[y];
                if (wy == 0.0) continue;
                rowF[y] += fterm(wx, wy);
                rowP[y] += pterm(wx, wy);
            }
        }
    }

    auto priority = [&](int64_t u, int64_t v) -> double {
        double w = W[u * n + v];
        if (!(alive[u] && alive[v]) || w <= 0 || u == v) return NEG;
        double icf = relu(w) + sumF[u * n + v];
        double icp = relu(-w) + sumP[u * n + v];
        return icf > icp ? icf : icp;
    };

    // per-row maxima over the upper triangle (u < v)
    std::vector<double> rowmax(n, NEG);
    std::vector<int64_t> rowarg(n, -1);
    auto recompute_row = [&](int64_t u) {
        double best = NEG; int64_t arg = -1;
        if (alive[u]) {
            for (int64_t v = u + 1; v < n; ++v) {
                double p = priority(u, v);
                if (p > best) { best = p; arg = v; }
            }
        }
        rowmax[u] = best; rowarg[u] = arg;
    };
    for (int64_t u = 0; u < n; ++u) recompute_row(u);

    // targeted sum update when one weight entry W[a][b] changes:
    // neighbour z=a contributes to pairs (b, y); z=b to pairs (a, y)
    auto edge_changed = [&](int64_t a, int64_t b, double old_ab) {
        double new_ab = W[a * n + b];
        for (int64_t rep = 0; rep < 2; ++rep) {
            int64_t z = rep == 0 ? a : b;
            int64_t x = rep == 0 ? b : a;   // the pair slot that changed
            double oldw = old_ab, neww = new_ab;
            const double* col = W + z * n;
            double* Fx = sumF.data() + x * n;
            double* Px = sumP.data() + x * n;
            for (int64_t y = 0; y < n; ++y) {
                if (y == x) continue;
                double wy = alive[z] ? col[y] : 0.0;
                if (wy == 0.0 && oldw == 0.0 && neww == 0.0) continue;
                double df = fterm(neww, wy) - fterm(oldw, wy);
                double dp = pterm(neww, wy) - pterm(oldw, wy);
                if (df != 0.0) { Fx[y] += df; sumF[y * n + x] += df; }
                if (dp != 0.0) { Px[y] += dp; sumP[y * n + x] += dp; }
            }
        }
    };

    auto fix_rows_after_entry_changes = [&](int64_t u, int64_t v) {
        // entries (y,u) and (y,v) changed for every y: rows y whose argmax
        // pointed there may be stale; rows u, v fully recomputed
        recompute_row(u);
        recompute_row(v);
        for (int64_t y = 0; y < n; ++y) {
            if (y == u || y == v || !alive[y]) continue;
            for (int64_t c : {u, v}) {
                if (c <= y) continue;        // only upper-triangle entries
                double p = priority(y, c);
                // equality at a smaller index steals the arg, so ties
                // stay lexicographic even for values that grow later
                if (p > rowmax[y] || (p == rowmax[y] && p > NEG &&
                                      c < rowarg[y])) {
                    rowmax[y] = p; rowarg[y] = c;
                }
                else if (rowarg[y] == c && p < rowmax[y]) recompute_row(y);
            }
        }
    };

    while (true) {
        int64_t bu = -1; double best = NEG;
        for (int64_t u = 0; u < n; ++u)
            if (rowmax[u] > best) { best = rowmax[u]; bu = u; }
        if (bu < 0 || best == NEG) break;
        int64_t bv = rowarg[bu];
        double icf = relu(W[bu * n + bv]) + sumF[bu * n + bv];
        double icp = relu(-W[bu * n + bv]) + sumP[bu * n + bv];
        if (getenv("AHSOKA_CE_TRACE"))
            fprintf(stderr, "D %lld %lld icf=%.9g icp=%.9g %s\n",
                    (long long)bu, (long long)bv, icf, icp,
                    icf >= icp ? "merge" : "forbid");
        if (icf >= icp) {
            // merge bv into bu: every entry of both columns changes
            std::vector<double> old_u(W + bu * n, W + bu * n + n);
            std::vector<double> old_v(W + bv * n, W + bv * n + n);
            for (int64_t x = 0; x < n; ++x) {
                if (x == bu || x == bv) continue;
                double m = old_u[x] + old_v[x];
                W[bu * n + x] = m; W[x * n + bu] = m;
                W[bv * n + x] = 0.0; W[x * n + bv] = 0.0;
            }
            W[bu * n + bv] = 0.0; W[bv * n + bu] = 0.0;
            alive[bv] = 0;
            members[bu].insert(members[bu].end(), members[bv].begin(),
                               members[bv].end());
            members[bv].clear();
            // all pair sums involving z in {bu, bv} changed: recompute the
            // contributions of those two columns from scratch
            for (int64_t rep = 0; rep < 2; ++rep) {
                int64_t z = rep == 0 ? bu : bv;
                const std::vector<double>& old = rep == 0 ? old_u : old_v;
                const double* col = W + z * n;
                for (int64_t x = 0; x < n; ++x) {
                    double oldx = old[x];
                    double newx = alive[z] ? col[x] : 0.0;
                    if (oldx == 0.0 && newx == 0.0) continue;
                    double* Fx = sumF.data() + x * n;
                    double* Px = sumP.data() + x * n;
                    for (int64_t y = 0; y < n; ++y) {
                        if (y == x) continue;
                        double oldy = old[y];
                        double newy = alive[z] ? col[y] : 0.0;
                        double df = fterm(newx, newy) - fterm(oldx, oldy);
                        double dp = pterm(newx, newy) - pterm(oldx, oldy);
                        Fx[y] += df; Px[y] += dp;
                    }
                }
            }
            // every pair (bu, y) also changed through every OTHER column
            // z, because row bu of W was rewritten: recompute fresh
            for (int64_t y = 0; y < n; ++y) {
                if (y == bu) continue;
                double sf = 0, sp = 0;
                for (int64_t z = 0; z < n; ++z) {
                    if (!alive[z]) continue;
                    double a = W[bu * n + z], b = W[y * n + z];
                    sf += fterm(a, b);
                    sp += pterm(a, b);
                }
                sumF[bu * n + y] = sf; sumF[y * n + bu] = sf;
                sumP[bu * n + y] = sp; sumP[y * n + bu] = sp;
            }
            for (int64_t u2 = 0; u2 < n; ++u2) recompute_row(u2);
        } else {
            double old_w = W[bu * n + bv];
            W[bu * n + bv] = FORB; W[bv * n + bu] = FORB;
            edge_changed(bu, bv, old_w);
            fix_rows_after_entry_changes(bu, bv);
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
        for (int32_t m : members[rp.second]) out_assign[m] = cid;
        ++cid;
    }
    return (int64_t)reps.size();
}

// WhatsHap-published decision rule (cluster/editing.py mode="whatshap"):
// each step takes the undecided edge with the globally maximum icf and the
// one with the globally maximum icp (over ALL nonzero undecided edges,
// negative included); the larger maximum decides — permanent (merge) for
// the icf edge, forbidden for the icp edge.  Stops when max icf reaches 0
// (only repulsive edges remain; forbidding them cannot change clusters).
// Forbidden status is sticky under merges (WhatsHap's -inf + x = -inf).
// Kept semantically identical to the Python oracle (parity-tested).
int64_t ahsoka_cluster_editing_wh(double* W, int64_t n,
                                  int32_t* out_assign) {
    if (n <= 0) return 0;
    const double FORB = -1.0e18;
    const double NEG = -std::numeric_limits<double>::infinity();
    std::vector<uint8_t> alive(n, 1);
    std::vector<uint8_t> forb((size_t)n * n, 0);
    std::vector<std::vector<int32_t>> members(n);
    for (int64_t i = 0; i < n; ++i) members[i] = {(int32_t)i};
    for (int64_t i = 0; i < n; ++i) W[i * n + i] = 0.0;

    // sorted nonzero support per row (FORB entries included; dead rows
    // are zeroed on merge so supports never hold dead nodes).  Lets the
    // merge-time (bu, y) sum recomputation run z-major over real edges
    // instead of scanning n rows x the supernode's whole support.
    std::vector<std::vector<int32_t>> supp(n);
    // positive-weight support, separately: forbidding a repulsive edge
    // (the bulk of all decisions) changes icp sums only through the
    // other endpoint's POSITIVE neighbours, so the hot forbid update
    // iterates this much smaller list (supernodes accumulate FORB
    // edges, so their full support approaches n)
    std::vector<std::vector<int32_t>> supp_pos(n);
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = 0; j < n; ++j) {
            if (W[i * n + j] != 0.0) supp[i].push_back((int32_t)j);
            if (W[i * n + j] > 0.0) supp_pos[i].push_back((int32_t)j);
        }
    }
    auto list_insert = [](std::vector<int32_t>& s, int32_t key) {
        auto it = std::lower_bound(s.begin(), s.end(), key);
        if (it == s.end() || *it != key) s.insert(it, key);
    };
    auto list_erase = [](std::vector<int32_t>& s, int32_t key) {
        auto it = std::lower_bound(s.begin(), s.end(), key);
        if (it != s.end() && *it == key) s.erase(it);
    };
    auto supp_insert = [&](int64_t row, int32_t key) {
        list_insert(supp[row], key);
    };
    auto supp_erase = [&](int64_t row, int32_t key) {
        list_erase(supp[row], key);
    };

    std::vector<double> sumF((size_t)n * n, 0.0), sumP((size_t)n * n, 0.0);
    for (int64_t z = 0; z < n; ++z) {
        const double* col = W + z * n;
        for (int64_t x = 0; x < n; ++x) {
            double wx = col[x];
            if (wx == 0.0) continue;
            double* rowF = sumF.data() + x * n;
            double* rowP = sumP.data() + x * n;
            for (int64_t y = 0; y < n; ++y) {
                double wy = col[y];
                if (wy == 0.0) continue;
                rowF[y] += fterm(wx, wy);
                rowP[y] += pterm(wx, wy);
            }
        }
    }

    auto undecided = [&](int64_t u, int64_t v) -> bool {
        return u != v && alive[u] && alive[v] && W[u * n + v] != 0.0 &&
               !forb[u * n + v];
    };
    auto icf_of = [&](int64_t u, int64_t v) -> double {
        return relu(W[u * n + v]) + sumF[u * n + v];
    };
    auto icp_of = [&](int64_t u, int64_t v) -> double {
        return relu(-W[u * n + v]) + sumP[u * n + v];
    };

    // per-row maxima over the undecided upper triangle, one cache per
    // metric; '>' keeps the first (smallest v), the global scan keeps the
    // first (smallest u) — lexicographic ties like the oracle's argmax
    std::vector<double> rowmaxF(n, NEG), rowmaxP(n, NEG);
    std::vector<int64_t> rowargF(n, -1), rowargP(n, -1);
    auto recompute_row = [&](int64_t u) {
        double bF = NEG, bP = NEG;
        int64_t aF = -1, aP = -1;
        if (alive[u]) {
            // undecided requires W != 0, so supp[u] (ascending, exact)
            // is the complete candidate set — same scan order and
            // tie-breaking as the full v = u+1..n sweep
            const auto& s = supp[u];
            for (auto it = std::upper_bound(s.begin(), s.end(),
                                            (int32_t)u);
                 it != s.end(); ++it) {
                int64_t v = *it;
                if (!undecided(u, v)) continue;
                double f = icf_of(u, v), p = icp_of(u, v);
                if (f > bF) { bF = f; aF = v; }
                if (p > bP) { bP = p; aP = v; }
            }
        }
        rowmaxF[u] = bF; rowargF[u] = aF;
        rowmaxP[u] = bP; rowargP[u] = aP;
    };
    for (int64_t u = 0; u < n; ++u) recompute_row(u);

    // forbid-time sum update for edge (a, b), both alive, old_ab != 0,
    // new value W[a][b] = FORB.  For old_ab < 0 the fterm deltas are
    // identically zero (fterm of a negative weight is 0 before and
    // after) and pterm deltas vanish unless the common neighbour's
    // weight is positive — so the hot negative-forbid case iterates the
    // other endpoint's positive support only.  Iteration is ascending
    // over nonzero y like the original full scan (skipped y have
    // exactly-zero deltas), so the floats are bit-identical.
    auto edge_changed = [&](int64_t a, int64_t b, double old_ab) {
        double new_ab = W[a * n + b];
        bool neg = old_ab < 0.0;
        for (int64_t rep = 0; rep < 2; ++rep) {
            int64_t z = rep == 0 ? a : b;
            int64_t x = rep == 0 ? b : a;
            const double* col = W + z * n;
            double* Fx = sumF.data() + x * n;
            double* Px = sumP.data() + x * n;
            const std::vector<int32_t>& ys = neg ? supp_pos[z] : supp[z];
            for (int32_t y : ys) {
                if (y == x) continue;
                double wy = col[y];
                double df = fterm(new_ab, wy) - fterm(old_ab, wy);
                double dp = pterm(new_ab, wy) - pterm(old_ab, wy);
                if (df != 0.0) { Fx[y] += df; sumF[y * n + x] += df; }
                if (dp != 0.0) { Px[y] += dp; sumP[y * n + x] += dp; }
            }
        }
    };

    auto fix_rows_after_entry_changes = [&](int64_t u, int64_t v) {
        recompute_row(u);
        recompute_row(v);
        for (int64_t y = 0; y < n; ++y) {
            if (y == u || y == v || !alive[y]) continue;
            bool stale = false;
            for (int64_t c : {u, v}) {
                if (c <= y) continue;
                if (undecided(y, c)) {
                    double f = icf_of(y, c), p = icp_of(y, c);
                    // '>' keeps smallest v on ties from full scans, but a
                    // later update reaching equality at a SMALLER index
                    // must steal the arg (lexicographic tie-breaking)
                    if (f > rowmaxF[y] ||
                        (f == rowmaxF[y] && c < rowargF[y])) {
                        rowmaxF[y] = f; rowargF[y] = c;
                    } else if (rowargF[y] == c && f < rowmaxF[y]) {
                        stale = true;
                    }
                    if (p > rowmaxP[y] ||
                        (p == rowmaxP[y] && c < rowargP[y])) {
                        rowmaxP[y] = p; rowargP[y] = c;
                    } else if (rowargP[y] == c && p < rowmaxP[y]) {
                        stale = true;
                    }
                } else if (rowargF[y] == c || rowargP[y] == c) {
                    stale = true;
                }
            }
            if (stale) recompute_row(y);
        }
    };

    while (true) {
        int64_t fu = -1, pu = -1;
        double mF = NEG, mP = NEG;
        for (int64_t u = 0; u < n; ++u) {
            if (rowmaxF[u] > mF) { mF = rowmaxF[u]; fu = u; }
            if (rowmaxP[u] > mP) { mP = rowmaxP[u]; pu = u; }
        }
        if (fu < 0 || mF == NEG) break;   // no undecided edges
        if (mF <= 0) break;               // only repulsive edges remain
        bool do_merge = mF >= mP;
        int64_t bu = do_merge ? fu : pu;
        int64_t bv = do_merge ? rowargF[fu] : rowargP[pu];
        if (getenv("AHSOKA_CE_TRACE"))
            fprintf(stderr, "W %lld %lld icf=%.9g icp=%.9g %s\n",
                    (long long)bu, (long long)bv, mF, mP,
                    do_merge ? "merge" : "forbid");
        if (do_merge) {
            std::vector<double> old_u(W + bu * n, W + bu * n + n);
            std::vector<double> old_v(W + bv * n, W + bv * n + n);
            // C = entries where column bu actually changes (old_v
            // support, forbidden flips, and bv itself); every
            // sum/priority delta from this merge is confined to pairs
            // with at least one endpoint in C, because column bv's
            // support is a subset of C and fterm/pterm vanish on zero
            // arguments — the pruning is exact and the decision order
            // bit-identical to the full O(n^2) update (parity-tested)
            std::vector<int32_t> C;
            C.reserve(n);
            for (int64_t x = 0; x < n; ++x) {
                if (x == bu || x == bv) continue;
                uint8_t f = forb[bu * n + x] | forb[bv * n + x];
                double m = f ? FORB : old_u[x] + old_v[x];
                // old_v support is explicit: the z=bv sum deltas need it
                // even when the bu entry itself is unchanged (forbidden
                // stickiness can absorb the addition)
                if (m != old_u[x] || old_v[x] != 0.0)
                    C.push_back((int32_t)x);
                if (m != old_u[x]) {       // column-bu support changed
                    if (m == 0.0) supp_erase(x, (int32_t)bu);
                    else if (old_u[x] == 0.0) supp_insert(x, (int32_t)bu);
                }
                if ((m > 0.0) != (old_u[x] > 0.0)) {
                    if (m > 0.0) list_insert(supp_pos[x], (int32_t)bu);
                    else list_erase(supp_pos[x], (int32_t)bu);
                }
                if (old_v[x] != 0.0) supp_erase(x, (int32_t)bv);
                if (old_v[x] > 0.0) list_erase(supp_pos[x], (int32_t)bv);
                W[bu * n + x] = m; W[x * n + bu] = m;
                W[bv * n + x] = 0.0; W[x * n + bv] = 0.0;
                forb[bu * n + x] = f; forb[x * n + bu] = f;
            }
            W[bu * n + bv] = 0.0; W[bv * n + bu] = 0.0;
            forb[bu * n + bv] = 0; forb[bv * n + bu] = 0;
            alive[bv] = 0;
            {   // rebuild row-bu support: merge of the two old supports
                // filtered by the new row (candidates can only come from
                // old_u / old_v support)
                std::vector<int32_t> merged;
                merged.reserve(supp[bu].size() + supp[bv].size());
                std::merge(supp[bu].begin(), supp[bu].end(),
                           supp[bv].begin(), supp[bv].end(),
                           std::back_inserter(merged));
                merged.erase(std::unique(merged.begin(), merged.end()),
                             merged.end());
                supp[bu].clear();
                supp_pos[bu].clear();
                for (int32_t x : merged)
                    if (x != (int32_t)bu && x != (int32_t)bv &&
                        W[bu * n + x] != 0.0) {
                        supp[bu].push_back(x);
                        if (W[bu * n + x] > 0.0)
                            supp_pos[bu].push_back(x);
                    }
                supp[bv].clear();
                supp_pos[bv].clear();
            }
            members[bu].insert(members[bu].end(), members[bv].begin(),
                               members[bv].end());
            members[bv].clear();
            // nz = union support of old_u, old_v, new bu column (the
            // only columns whose pair sums can see a delta)
            std::vector<int32_t> nz;
            nz.reserve(n);
            {
                const double* newu = W + bu * n;
                for (int64_t x = 0; x < n; ++x) {
                    if (x == bu || x == bv) continue;
                    if (old_u[x] != 0.0 || old_v[x] != 0.0 ||
                        newu[x] != 0.0)
                        nz.push_back((int32_t)x);
                }
            }
            std::vector<uint8_t> inC(n, 0);
            for (int32_t c : C) inC[c] = 1;
            // pair-sum deltas for pairs (x, y) with x or y in C; z=bu
            // contributes fterm(new, new) - fterm(old_u, old_u), z=bv
            // contributes -fterm(old_v, old_v) (its column is now zero).
            // Pairs (bu, y) are recomputed from scratch below, and dead
            // bv entries are never read again, so both are skipped.
            const double* newu = W + bu * n;
            auto apply_pair = [&](int32_t x, int32_t y) {
                // two separate += per table, same delta rounding and
                // order as the original two-pass (z=bu, then z=bv)
                // update — bit-identical floating point
                double d1f = fterm(newu[x], newu[y])
                             - fterm(old_u[x], old_u[y]);
                double d2f = -fterm(old_v[x], old_v[y]);
                double d1p = pterm(newu[x], newu[y])
                             - pterm(old_u[x], old_u[y]);
                double d2p = -pterm(old_v[x], old_v[y]);
                double* f = &sumF[(int64_t)x * n + y];
                double* p = &sumP[(int64_t)x * n + y];
                if (d1f != 0.0) *f += d1f;
                if (d2f != 0.0) *f += d2f;
                if (d1p != 0.0) *p += d1p;
                if (d2p != 0.0) *p += d2p;
            };
            for (int32_t x : C)
                for (int32_t y : nz)
                    if (y != x) apply_pair(x, y);
            for (int32_t x : nz)
                if (!inC[x])
                    for (int32_t y : C)
                        if (y != x) apply_pair(x, y);
            // pairs (bu, y): sums from scratch, z-major over real edges
            // (z ascending, so each y's accumulation order matches the
            // old per-y scan over ascending z — bit-identical floats).
            // supp[bu] holds exactly the alive nonzero support of the
            // merged row (dead rows are zeroed), and supp[z] the rows y
            // with W[y, z] != 0.
            std::vector<double> accF(n, 0.0), accP(n, 0.0);
            for (int32_t z : supp[bu]) {
                double a = W[bu * n + z];
                const double* colz = W + (int64_t)z * n;
                for (int32_t y : supp[z]) {
                    if (y == (int32_t)bu) continue;
                    accF[y] += fterm(a, colz[y]);
                    accP[y] += pterm(a, colz[y]);
                }
            }
            std::vector<int32_t> touched;
            for (int64_t y = 0; y < n; ++y) {
                if (y == bu) continue;
                double sf = accF[y], sp = accP[y];
                if (sumF[bu * n + y] == sf && sumP[bu * n + y] == sp)
                    continue;                     // unchanged, skip write
                touched.push_back((int32_t)y);
                sumF[bu * n + y] = sf; sumF[y * n + bu] = sf;
                sumP[bu * n + y] = sp; sumP[y * n + bu] = sp;
            }
            // targeted cache maintenance.  Rows in C changed many
            // entries -> full recompute.  Rows in nz\C changed only
            // their entries into C (and (y, bu)); rows in touched only
            // (y, bu): incremental entry fixes, falling back to a full
            // recompute when a cached argmax went stale.  Rows whose
            // argmax pointed at the dead bv are rescanned; argmax==bu
            // rows are covered by C/touched (weight changes put y in C,
            // sum changes in touched).
            std::vector<uint8_t> redo(n, 0);
            for (int32_t y : C) redo[y] = 1;
            for (int64_t y = 0; y < n; ++y)
                if (rowargF[y] == bv || rowargP[y] == bv)
                    redo[y] = 1;
            redo[bu] = 1; redo[bv] = 1;
            auto fix_entry = [&](int32_t y, int32_t c) {
                // same tie-breaking as fix_rows_after_entry_changes
                if (redo[y]) return;
                if (undecided(y, c)) {
                    double f = icf_of(y, c), p = icp_of(y, c);
                    if (f > rowmaxF[y] ||
                        (f == rowmaxF[y] && c < rowargF[y])) {
                        rowmaxF[y] = f; rowargF[y] = c;
                    } else if (rowargF[y] == c && f < rowmaxF[y]) {
                        redo[y] = 1;
                    }
                    if (redo[y]) return;
                    if (p > rowmaxP[y] ||
                        (p == rowmaxP[y] && c < rowargP[y])) {
                        rowmaxP[y] = p; rowargP[y] = c;
                    } else if (rowargP[y] == c && p < rowmaxP[y]) {
                        redo[y] = 1;
                    }
                } else if (rowargF[y] == c || rowargP[y] == c) {
                    redo[y] = 1;
                }
            };
            for (int32_t y : nz) {
                if (inC[y] || !alive[y]) continue;
                for (int32_t c : C)
                    if (c > y) fix_entry(y, c);
                if ((int64_t)y < bu) fix_entry(y, (int32_t)bu);
            }
            for (int32_t y : touched)
                if (alive[y] && (int64_t)y < bu && !inC[y])
                    fix_entry(y, (int32_t)bu);
            for (int64_t u2 = 0; u2 < n; ++u2)
                if (redo[u2]) recompute_row(u2);
        } else {
            double old_w = W[bu * n + bv];
            W[bu * n + bv] = FORB; W[bv * n + bu] = FORB;
            forb[bu * n + bv] = 1; forb[bv * n + bu] = 1;
            if (old_w > 0.0) {            // FORB is negative
                list_erase(supp_pos[bu], (int32_t)bv);
                list_erase(supp_pos[bv], (int32_t)bu);
            }
            edge_changed(bu, bv, old_w);
            fix_rows_after_entry_changes(bu, bv);
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
        for (int32_t m : members[rp.second]) out_assign[m] = cid;
        ++cid;
    }
    return (int64_t)reps.size();
}

}  // extern "C"
