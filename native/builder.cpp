// Native index-build accumulator: the hot path of the host build pipeline.
//
// Replaces the Python occurrence loop in typesense_tpu/index/builder.py
// (which replaces Index::batch_memory_index / index_field_in_memory,
// /root/reference/src/index.cpp:575-1054). The reference builds pointer
// structures (ART + block posting lists) under per-field threads; here the
// build is a flat pipeline: tokenize -> accumulate (field, term, doc, pos)
// occurrences with an interned term dictionary -> sort -> CSR arrays that
// upload directly to the device.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 builder.cpp -o libtsbuild.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int MAX_TERM_LEN = 32;
constexpr int POS_BITS = 12;
constexpr uint32_t MAX_POS = (1u << POS_BITS) - 1;
constexpr uint32_t MAX_ELEM = (1u << 18) - 1;

struct Occ {
    uint32_t tid;
    uint32_t doc;
    int32_t pos;     // packed (elem << POS_BITS | pos)
    uint8_t last;    // token is final token of the value
};

struct Builder {
    // term interning: string -> id (insertion order; remapped at finalize)
    std::unordered_map<std::string, uint32_t> term_ids;
    std::vector<std::string> terms;
    std::vector<std::vector<Occ>> field_occs;  // per search field
    std::vector<int64_t> field_token_counts;   // doc * F + f
    // per-field: append stream stayed doc-ascending (and packed-pos
    // ascending within a doc), so finalize can use a stable counting
    // sort by tid instead of a comparator sort over all occurrences
    std::vector<uint8_t> field_sorted;
    std::vector<uint64_t> field_last_key;  // (doc << 32) | packed_pos
    int num_fields = 0;
    int64_t num_docs = 0;

    // finalized outputs
    std::vector<uint8_t> out_term_chars;
    std::vector<int32_t> out_term_lens;
    std::vector<int64_t> out_post_offsets;
    std::vector<int32_t> out_post_doc_ids;
    std::vector<uint8_t> out_post_flags;
    std::vector<int64_t> out_pos_offsets;
    std::vector<int32_t> out_positions;
    std::vector<int32_t> out_term_freqs;
    int64_t n_terms = 0, n_postings = 0, n_positions = 0;
};

inline uint32_t intern(Builder* b, const char* s, size_t n) {
    if (n > MAX_TERM_LEN) n = MAX_TERM_LEN;
    std::string key(s, n);
    auto it = b->term_ids.find(key);
    if (it != b->term_ids.end()) return it->second;
    uint32_t id = (uint32_t)b->terms.size();
    b->term_ids.emplace(std::move(key), id);
    b->terms.emplace_back(s, n);
    return id;
}

}  // namespace

extern "C" {

void* ts_builder_new(int num_fields, int64_t num_docs) {
    auto* b = new Builder();
    b->num_fields = num_fields;
    b->num_docs = num_docs;
    b->field_occs.resize(num_fields > 0 ? num_fields : 1);
    b->field_token_counts.assign((size_t)num_docs * (num_fields > 0 ? num_fields : 1), 0);
    b->field_sorted.assign((size_t)(num_fields > 0 ? num_fields : 1), 1);
    b->field_last_key.assign((size_t)(num_fields > 0 ? num_fields : 1), 0);
    return b;
}

void ts_builder_free(void* h) { delete (Builder*)h; }

static inline void track_order(Builder* b, int field, uint32_t doc,
                               int32_t packed) {
    uint64_t key = ((uint64_t)doc << 32) | (uint32_t)packed;
    if (key < b->field_last_key[field]) b->field_sorted[field] = 0;
    b->field_last_key[field] = key;
}

// ASCII fast-path tokenizer + accumulate, matching tokenizer.cpp:232-289
// stream modes with default symbols (INDEX = alnum, SEPARATE = space/\n,
// SKIP = other ASCII). Caller guarantees `text` is pure ASCII.
// Returns number of tokens.
int ts_builder_add_value(void* h, int field, uint32_t doc, uint32_t elem,
                         const char* text, int len) {
    auto* b = (Builder*)h;
    auto& occs = b->field_occs[field];
    int pos = 0;
    int i = 0;
    char buf[MAX_TERM_LEN];
    int blen = 0;
    int last_token_start = -1;
    size_t first_occ_of_value = occs.size();
    while (i <= len) {
        char c = (i < len) ? text[i] : ' ';  // virtual trailing separator
        bool is_alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
        if (c >= 'A' && c <= 'Z') { c = c - 'A' + 'a'; is_alnum = true; }
        if (is_alnum) {
            if (blen < MAX_TERM_LEN) buf[blen++] = c;
            i++;
            continue;
        }
        bool is_sep = (c == ' ' || c == '\n');
        if (blen > 0 && is_sep) {
            uint32_t tid = intern(b, buf, (size_t)blen);
            uint32_t p = (uint32_t)pos;
            if (p > MAX_POS) p = MAX_POS;
            uint32_t e = elem > MAX_ELEM ? MAX_ELEM : elem;
            int32_t packed = (int32_t)((e << POS_BITS) | p);
            occs.push_back({tid, doc, packed, 0});
            track_order(b, field, doc, packed);
            last_token_start = (int)occs.size() - 1;
            pos++;
            blen = 0;
        }
        // SKIP chars are dropped silently (stay inside current token run)
        i++;
    }
    if (last_token_start >= 0) occs[last_token_start].last = 1;
    int n = pos;
    b->field_token_counts[(size_t)doc * b->num_fields + field] += n;
    (void)first_occ_of_value;
    return n;
}

// Batched add_value: n values for one field, concatenated into `blob` with
// offsets[n+1] boundaries. One ctypes crossing per import chunk instead of
// one per value (the per-call overhead dominated build_segment at 2.2M).
void ts_builder_add_values_batch(void* h, int field, const int32_t* docs,
                                 const int32_t* elems, const char* blob,
                                 const int64_t* offsets, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        ts_builder_add_value(h, field, (uint32_t)docs[i], (uint32_t)elems[i],
                             blob + offsets[i],
                             (int)(offsets[i + 1] - offsets[i]));
    }
}

// fallback for non-ASCII / custom-symbol values: Python tokenizes, we intern.
void ts_builder_add_token(void* h, int field, uint32_t doc, const char* tok,
                          int len, int32_t packed_pos, int last) {
    auto* b = (Builder*)h;
    uint32_t tid = intern(b, tok, (size_t)len);
    b->field_occs[field].push_back({tid, doc, packed_pos, (uint8_t)last});
    track_order(b, field, doc, packed_pos);
}

void ts_builder_bump_count(void* h, int field, uint32_t doc, int n) {
    auto* b = (Builder*)h;
    b->field_token_counts[(size_t)doc * b->num_fields + field] += n;
}

// Sort terms lexicographically, remap ids, sort occurrences, build CSR.
void ts_builder_finalize(void* h) {
    auto* b = (Builder*)h;
    const int64_t T = (int64_t)b->terms.size();
    b->n_terms = T;

    // sorted order + remap
    std::vector<uint32_t> order((size_t)T);
    for (int64_t i = 0; i < T; i++) order[i] = (uint32_t)i;
    std::sort(order.begin(), order.end(), [&](uint32_t a, uint32_t c) {
        return b->terms[a] < b->terms[c];
    });
    std::vector<uint32_t> remap((size_t)std::max<int64_t>(T, 1));
    for (int64_t i = 0; i < T; i++) remap[order[i]] = (uint32_t)i;

    const int64_t Tp = std::max<int64_t>(T, 1);
    b->out_term_chars.assign((size_t)Tp * MAX_TERM_LEN, 0);
    b->out_term_lens.assign((size_t)Tp, 0);
    for (int64_t i = 0; i < T; i++) {
        const std::string& t = b->terms[order[i]];
        memcpy(&b->out_term_chars[(size_t)i * MAX_TERM_LEN], t.data(), t.size());
        b->out_term_lens[(size_t)i] = (int32_t)t.size();
    }

    const int F = b->num_fields > 0 ? b->num_fields : 1;
    const int64_t n_rows = (int64_t)F * Tp;
    b->out_post_offsets.assign((size_t)n_rows + 1, 0);

    // pass 1: remap tids + sort each field's occurrences by (tid, doc, pos).
    // When the append stream was doc-ascending (bulk import), a stable
    // counting sort by tid is O(n + T) — ~10x faster than the comparator
    // sort at the 34M-occurrence bench scale on one core.
    int64_t total_groups = 0, total_pos = 0;
    for (int f = 0; f < b->num_fields; f++) {
        auto& occs = b->field_occs[f];
        for (auto& o : occs) o.tid = remap[o.tid];
        if (b->field_sorted[f] && T > 0) {
            std::vector<int64_t> counts((size_t)T + 1, 0);
            for (const auto& o : occs) counts[(size_t)o.tid + 1]++;
            for (int64_t t = 0; t < T; t++) counts[(size_t)t + 1] += counts[(size_t)t];
            std::vector<Occ> sorted(occs.size());
            for (const auto& o : occs) sorted[(size_t)counts[o.tid]++] = o;
            occs.swap(sorted);
        } else {
            std::sort(occs.begin(), occs.end(), [](const Occ& a, const Occ& c) {
                if (a.tid != c.tid) return a.tid < c.tid;
                if (a.doc != c.doc) return a.doc < c.doc;
                return a.pos < c.pos;
            });
        }
        total_pos += (int64_t)occs.size();
        for (size_t i = 0; i < occs.size(); i++) {
            if (i == 0 || occs[i].tid != occs[i - 1].tid || occs[i].doc != occs[i - 1].doc)
                total_groups++;
        }
    }
    b->n_postings = total_groups;
    b->n_positions = total_pos;
    b->out_post_doc_ids.assign((size_t)std::max<int64_t>(total_groups, 1), 0);
    b->out_post_flags.assign((size_t)std::max<int64_t>(total_groups, 1), 0);
    b->out_pos_offsets.assign((size_t)std::max<int64_t>(total_groups, 1) + 1, 0);
    b->out_positions.assign((size_t)std::max<int64_t>(total_pos, 1), 0);
    b->out_term_freqs.assign((size_t)Tp, 0);

    int64_t g = 0, p = 0;
    for (int f = 0; f < b->num_fields; f++) {
        auto& occs = b->field_occs[f];
        for (size_t i = 0; i < occs.size(); i++) {
            const Occ& o = occs[i];
            bool boundary = (i == 0 || o.tid != occs[i - 1].tid || o.doc != occs[i - 1].doc);
            if (boundary) {
                b->out_post_offsets[(size_t)f * Tp + o.tid + 1]++;
                b->out_post_doc_ids[(size_t)g] = (int32_t)o.doc;
                b->out_pos_offsets[(size_t)g] = p;
                b->out_term_freqs[o.tid]++;
                g++;
            }
            if (o.last) b->out_post_flags[(size_t)g - 1] = 1;
            b->out_positions[(size_t)p] = o.pos;
            p++;
        }
        occs.clear();
        occs.shrink_to_fit();
    }
    b->out_pos_offsets[(size_t)std::max<int64_t>(total_groups, 1)] = p;
    if (total_groups == 0) b->out_pos_offsets[0] = 0;
    // prefix-sum row counts -> offsets
    for (int64_t r = 0; r < n_rows; r++)
        b->out_post_offsets[(size_t)r + 1] += b->out_post_offsets[(size_t)r];
}

int64_t ts_builder_num_terms(void* h) { return ((Builder*)h)->n_terms; }
int64_t ts_builder_num_postings(void* h) { return ((Builder*)h)->n_postings; }
int64_t ts_builder_num_positions(void* h) { return ((Builder*)h)->n_positions; }

const uint8_t* ts_builder_term_chars(void* h) { return ((Builder*)h)->out_term_chars.data(); }
const int32_t* ts_builder_term_lens(void* h) { return ((Builder*)h)->out_term_lens.data(); }
const int64_t* ts_builder_post_offsets(void* h) { return ((Builder*)h)->out_post_offsets.data(); }
const int32_t* ts_builder_post_doc_ids(void* h) { return ((Builder*)h)->out_post_doc_ids.data(); }
const uint8_t* ts_builder_post_flags(void* h) { return ((Builder*)h)->out_post_flags.data(); }
const int64_t* ts_builder_pos_offsets(void* h) { return ((Builder*)h)->out_pos_offsets.data(); }
const int32_t* ts_builder_positions(void* h) { return ((Builder*)h)->out_positions.data(); }
const int32_t* ts_builder_term_freqs(void* h) { return ((Builder*)h)->out_term_freqs.data(); }
const int64_t* ts_builder_field_token_counts(void* h) { return ((Builder*)h)->field_token_counts.data(); }

// term text export for the host term -> id map: writes lengths and a
// concatenated blob of sorted terms. blob must have capacity n_terms*32.
int64_t ts_builder_export_terms(void* h, char* blob) {
    auto* b = (Builder*)h;
    int64_t off = 0;
    for (int64_t i = 0; i < b->n_terms; i++) {
        int32_t l = b->out_term_lens[(size_t)i];
        memcpy(blob + off, &b->out_term_chars[(size_t)i * MAX_TERM_LEN], (size_t)l);
        off += l;
    }
    return off;
}

}  // extern "C"
