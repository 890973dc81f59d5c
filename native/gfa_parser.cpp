// Native GFA parser: text -> flat arrays (counterpart of gaf_parser.cpp
// for the graph side; the reference's parser is src/graph.cpp:188-249).
//
// Emits S records (digit-stripped id, sequence length) and L records
// (from id/orient, to id/orient, overlap) plus the node first-touch order
// (S id at its line; L start id then end id) that the bubble sweep's
// unordered_map iteration-order replication needs.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct GfaData {
    std::vector<int64_t> seg_ids;
    std::vector<int64_t> seg_lens;
    std::vector<int64_t> edge_from, edge_to;
    std::vector<uint8_t> edge_from_plus, edge_to_plus;
    std::vector<int64_t> edge_overlap;
    std::vector<int64_t> touch_order;   // first-touch id sequence (dups ok)
    int32_t bad_line = 0;               // 1 on malformed input
};

bool raw_id(const char* s, size_t n, int64_t* out) {
    int64_t v = 0;
    bool any = false;
    for (size_t i = 0; i < n; ++i)
        if (s[i] >= '0' && s[i] <= '9') { v = v * 10 + (s[i] - '0');
                                          any = true; }
    *out = v;
    return any;
}

}  // namespace

extern "C" {

void* ahsoka_gfa_parse(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    auto* d = new GfaData();
    char* line = nullptr;
    size_t cap = 0;
    ssize_t len;
    std::vector<std::pair<const char*, size_t>> fields;
    while ((len = getline(&line, &cap, f)) >= 0) {
        if (len == 0 || (line[0] != 'S' && line[0] != 'L')) continue;
        fields.clear();
        char* p = line;
        char* end = line + len;
        while (p < end) {
            while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                               *p == '\r')) ++p;
            if (p >= end) break;
            char* q = p;
            while (q < end && *q != ' ' && *q != '\t' && *q != '\n' &&
                   *q != '\r') ++q;
            fields.emplace_back(p, (size_t)(q - p));
            p = q;
        }
        if (fields.empty()) continue;
        if (fields[0].second == 1 && fields[0].first[0] == 'S') {
            if (fields.size() < 3 || fields[2].second == 0) {
                d->bad_line = 1; break;
            }
            int64_t id;
            if (!raw_id(fields[1].first, fields[1].second, &id)) {
                d->bad_line = 1; break;
            }
            d->seg_ids.push_back(id);
            d->seg_lens.push_back((int64_t)fields[2].second);
            d->touch_order.push_back(id);
        } else if (fields[0].second == 1 && fields[0].first[0] == 'L') {
            if (fields.size() < 6) { d->bad_line = 1; break; }
            int64_t from, to;
            if (!raw_id(fields[1].first, fields[1].second, &from) ||
                !raw_id(fields[3].first, fields[3].second, &to)) {
                d->bad_line = 1; break;
            }
            char fo = fields[2].first[0], eo = fields[4].first[0];
            if ((fo != '+' && fo != '-') || (eo != '+' && eo != '-')) {
                d->bad_line = 1; break;
            }
            // CIGAR: int then 'M', or '0S' (reference assert,
            // src/graph.cpp:230-234)
            const char* cg = fields[5].first;
            size_t cn = fields[5].second;
            size_t i = 0;
            while (i < cn && (cg[i] >= '0' && cg[i] <= '9')) ++i;
            if (i == 0 || i >= cn) { d->bad_line = 1; break; }
            int64_t overlap = strtoll(std::string(cg, i).c_str(),
                                      nullptr, 10);
            char op = cg[i];
            if (!(op == 'M' || (op == 'S' && overlap == 0)) ||
                overlap < 0) { d->bad_line = 1; break; }
            d->edge_from.push_back(from);
            d->edge_to.push_back(to);
            d->edge_from_plus.push_back(fo == '+');
            d->edge_to_plus.push_back(eo == '+');
            d->edge_overlap.push_back(overlap);
            d->touch_order.push_back(from);
            d->touch_order.push_back(to);
        }
    }
    free(line);
    fclose(f);
    if (d->bad_line) { delete d; return nullptr; }
    return d;
}

int64_t ahsoka_gfa_num_segs(void* h) {
    return (int64_t)((GfaData*)h)->seg_ids.size();
}
int64_t ahsoka_gfa_num_edges(void* h) {
    return (int64_t)((GfaData*)h)->edge_from.size();
}
int64_t ahsoka_gfa_num_touches(void* h) {
    return (int64_t)((GfaData*)h)->touch_order.size();
}

void ahsoka_gfa_fill(void* h, int64_t* seg_ids, int64_t* seg_lens,
                     int64_t* edge_from, int64_t* edge_to,
                     uint8_t* edge_from_plus, uint8_t* edge_to_plus,
                     int64_t* edge_overlap, int64_t* touch_order) {
    auto* d = (GfaData*)h;
    memcpy(seg_ids, d->seg_ids.data(),
           d->seg_ids.size() * sizeof(int64_t));
    memcpy(seg_lens, d->seg_lens.data(),
           d->seg_lens.size() * sizeof(int64_t));
    memcpy(edge_from, d->edge_from.data(),
           d->edge_from.size() * sizeof(int64_t));
    memcpy(edge_to, d->edge_to.data(),
           d->edge_to.size() * sizeof(int64_t));
    memcpy(edge_from_plus, d->edge_from_plus.data(),
           d->edge_from_plus.size());
    memcpy(edge_to_plus, d->edge_to_plus.data(), d->edge_to_plus.size());
    memcpy(edge_overlap, d->edge_overlap.data(),
           d->edge_overlap.size() * sizeof(int64_t));
    memcpy(touch_order, d->touch_order.data(),
           d->touch_order.size() * sizeof(int64_t));
}

void ahsoka_gfa_free(void* h) { delete (GfaData*)h; }

}  // extern "C"
