// Native GAF parser: text -> flat arrays, for the data-loading hot path
// (SURVEY.md §3.3 hot loop #1: per-line string splitting in the reference's
// AlignmentReader, src/alignmentreader.cpp:69-186).
//
// Parses the same column layout the reference expects (name col 1, path
// col 6, start/end cols 8-9, id:f:<x> tag at col 16) into:
//   - a name-bytes blob with per-record offsets
//   - a flat node-id array (digits-stripped ids) with per-record offsets
//   - per-node orientation bytes ('>' == 1)
//   - per-record start/end/identity
// Exposed via a parse-handle + getter/free API for ctypes.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct GafData {
    std::vector<char> name_bytes;
    std::vector<int64_t> name_offsets;   // size records+1
    std::vector<int64_t> node_ids;       // flat
    std::vector<uint8_t> node_dirs;      // flat, 1 == '>'
    std::vector<int64_t> path_offsets;   // size records+1
    std::vector<int64_t> starts, ends;
    std::vector<float> identities;
    // for the identities side file: original segment names (flat blob per
    // node) and the raw block-length column text per record
    std::vector<char> seg_bytes;
    std::vector<int64_t> seg_offsets;    // size total_nodes+1
    std::vector<char> blocklen_bytes;
    std::vector<int64_t> blocklen_offsets;  // size records+1
    std::string error;
};

// strip non-digits and parse; returns false if no digits
bool raw_id(const char* s, size_t n, int64_t* out) {
    int64_t v = 0;
    bool any = false;
    for (size_t i = 0; i < n; ++i) {
        char c = s[i];
        if (c >= '0' && c <= '9') {
            v = v * 10 + (c - '0');
            any = true;
        }
    }
    *out = v;
    return any;
}

}  // namespace

extern "C" {

void* ahsoka_gaf_parse(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    auto* d = new GafData();
    d->name_offsets.push_back(0);
    d->path_offsets.push_back(0);
    d->seg_offsets.push_back(0);
    d->blocklen_offsets.push_back(0);

    char* line = nullptr;
    size_t cap = 0;
    ssize_t len;
    std::vector<std::pair<const char*, size_t>> fields;
    while ((len = getline(&line, &cap, f)) >= 0) {
        // whitespace-split like the reference's stringstream extraction
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
        if (fields.size() < 16) {
            d->error = "GAF record with <16 columns";
            delete d; free(line); fclose(f);
            return nullptr;
        }
        // identity tag at column 16: id:f:<x>
        const char* tag = fields[15].first;
        size_t tag_len = fields[15].second;
        if (tag_len < 3 || tag[0] != 'i' || tag[1] != 'd' || tag[2] != ':') {
            d->error = "column 16 is not an id:f: tag";
            delete d; free(line); fclose(f);
            return nullptr;
        }
        const char* val = tag + tag_len;
        while (val > tag && *(val - 1) != ':') --val;
        float ident = strtof(val, nullptr);

        // path column 6: (<|>)segment...
        const char* path_s = fields[5].first;
        size_t path_n = fields[5].second;
        size_t n_nodes = 0;
        size_t i = 0;
        while (i < path_n) {
            if (path_s[i] == '<' || path_s[i] == '>') {
                uint8_t dir = path_s[i] == '>' ? 1 : 0;
                size_t j = i + 1;
                while (j < path_n && path_s[j] != '<' && path_s[j] != '>')
                    ++j;
                if (j > i + 1) {
                    int64_t id;
                    if (raw_id(path_s + i + 1, j - i - 1, &id)) {
                        d->node_ids.push_back(id);
                        d->node_dirs.push_back(dir);
                        d->seg_bytes.insert(d->seg_bytes.end(),
                                            path_s + i + 1, path_s + j);
                        d->seg_offsets.push_back(
                            (int64_t)d->seg_bytes.size());
                        ++n_nodes;
                    }
                }
                i = j;
            } else {
                ++i;  // malformed leading segment: skip (python path errors)
            }
        }
        if (n_nodes == 0) { continue; }  // empty path: skip record
        d->blocklen_bytes.insert(d->blocklen_bytes.end(), fields[10].first,
                                 fields[10].first + fields[10].second);
        d->blocklen_offsets.push_back((int64_t)d->blocklen_bytes.size());

        d->name_bytes.insert(d->name_bytes.end(), fields[0].first,
                             fields[0].first + fields[0].second);
        d->name_offsets.push_back((int64_t)d->name_bytes.size());
        d->path_offsets.push_back((int64_t)d->node_ids.size());
        d->starts.push_back(strtoll(fields[7].first, nullptr, 10));
        d->ends.push_back(strtoll(fields[8].first, nullptr, 10));
        d->identities.push_back(ident);
    }
    free(line);
    fclose(f);
    return d;
}

int64_t ahsoka_gaf_num_records(void* h) {
    return (int64_t)((GafData*)h)->starts.size();
}
int64_t ahsoka_gaf_num_nodes(void* h) {
    return (int64_t)((GafData*)h)->node_ids.size();
}
int64_t ahsoka_gaf_name_bytes(void* h) {
    return (int64_t)((GafData*)h)->name_bytes.size();
}
int64_t ahsoka_gaf_seg_bytes(void* h) {
    return (int64_t)((GafData*)h)->seg_bytes.size();
}
int64_t ahsoka_gaf_blocklen_bytes(void* h) {
    return (int64_t)((GafData*)h)->blocklen_bytes.size();
}

void ahsoka_gaf_fill(void* h, char* names, int64_t* name_offsets,
                     int64_t* node_ids, uint8_t* node_dirs,
                     int64_t* path_offsets, int64_t* starts, int64_t* ends,
                     float* identities) {
    auto* d = (GafData*)h;
    memcpy(names, d->name_bytes.data(), d->name_bytes.size());
    memcpy(name_offsets, d->name_offsets.data(),
           d->name_offsets.size() * sizeof(int64_t));
    memcpy(node_ids, d->node_ids.data(),
           d->node_ids.size() * sizeof(int64_t));
    memcpy(node_dirs, d->node_dirs.data(), d->node_dirs.size());
    memcpy(path_offsets, d->path_offsets.data(),
           d->path_offsets.size() * sizeof(int64_t));
    memcpy(starts, d->starts.data(), d->starts.size() * sizeof(int64_t));
    memcpy(ends, d->ends.data(), d->ends.size() * sizeof(int64_t));
    memcpy(identities, d->identities.data(),
           d->identities.size() * sizeof(float));
}

void ahsoka_gaf_fill_sidefile(void* h, char* seg_bytes,
                              int64_t* seg_offsets, char* blocklen_bytes,
                              int64_t* blocklen_offsets) {
    auto* d = (GafData*)h;
    memcpy(seg_bytes, d->seg_bytes.data(), d->seg_bytes.size());
    memcpy(seg_offsets, d->seg_offsets.data(),
           d->seg_offsets.size() * sizeof(int64_t));
    memcpy(blocklen_bytes, d->blocklen_bytes.data(),
           d->blocklen_bytes.size());
    memcpy(blocklen_offsets, d->blocklen_offsets.data(),
           d->blocklen_offsets.size() * sizeof(int64_t));
}

void ahsoka_gaf_free(void* h) { delete (GafData*)h; }

}  // extern "C"
