// Native BM25 postings scorer.
//
// The hybrid serving path scores a query's posting lists against the whole
// corpus on the host before fusing with on-TPU ANN scores. numpy's
// np.add.at-based path pays per-term python + fancy-indexing overhead; this
// scorer walks the concatenated postings of all query terms in one call with
// tight loops. Built with plain g++ (no pybind11 in the image), loaded via
// ctypes (see loader.py).

#include <cstdint>

extern "C" {

// Score one query over concatenated per-term postings.
//   term_offsets : [n_terms + 1] offsets into rows/wtf
//   rows         : [nnz] document row ids
//   wtf          : [nnz] weighted term frequency (field-boost-weighted)
//   idfs         : [n_terms]
//   is_base      : [n_terms] 1 if the term counts toward matched-all (unigram)
//   doc_len      : weighted doc length array, strided (doc_len[r * stride])
//   out          : [cap] score accumulator (pre-zeroed by the caller)
//   matched      : [cap] matched-base-term counter, or nullptr
void bm25_score_query(const int64_t* term_offsets, const int32_t* rows,
                      const float* wtf, const float* idfs,
                      const uint8_t* is_base, int32_t n_terms, float k1,
                      float b, const float* doc_len, int64_t stride,
                      float avgdl, float* out, int32_t* matched) {
  const float k1p1 = k1 + 1.0f;
  const float inv_avgdl = avgdl > 0.0f ? 1.0f / avgdl : 0.0f;
  for (int32_t t = 0; t < n_terms; ++t) {
    const int64_t begin = term_offsets[t];
    const int64_t end = term_offsets[t + 1];
    const float idf = idfs[t];
    const bool base = is_base[t] != 0;
    for (int64_t i = begin; i < end; ++i) {
      const int32_t r = rows[i];
      const float tf = wtf[i];
      const float dl = doc_len[static_cast<int64_t>(r) * stride];
      const float denom = tf + k1 * (1.0f - b + b * dl * inv_avgdl);
      out[r] += idf * tf * k1p1 / denom;
      if (matched && base) {
        matched[r] += 1;
      }
    }
  }
}

// Zero out scores where matched < need (phrase / require_all semantics).
void bm25_apply_matched_gate(float* out, const int32_t* matched, int64_t cap,
                             int32_t need) {
  for (int64_t i = 0; i < cap; ++i) {
    if (matched[i] < need) out[i] = 0.0f;
  }
}

// Top-m selection over the dense score array: simple partial selection via
// threshold sweep is overkill; the python side uses argpartition. Kept here
// for future use when the full path moves native.

}  // extern "C"

// ---------------------------------------------------------------------------
// Batch analyzer for the ingest index stage (round 5, VERDICT r4 #4).
//
// LexicalIndex.index_docs vectorized the postings build with numpy, but the
// token stream itself (regex findall + stopword filter + bigrams + per-batch
// interning) stayed a per-token python loop — ~80% of the remaining index
// stage. This walks every field text of the batch in one call and returns
// interned occurrence arrays ready for the numpy groupby.
//
// Contract (mirrors python analyze() in lexical/bm25.py exactly):
//  - input texts are PRE-LOWERCASED utf-8 (python str.lower() — byte-level
//    ascii scanning is then identical: multibyte chars are >= 0x80 and never
//    match [a-z0-9])
//  - tokens are maximal [a-z0-9]+ runs, minus the 26 lucene-style stopwords
//  - bigrams of consecutive surviving tokens are emitted as "a_b"
//  - n_uni counts unigrams only (doc-length accounting)

#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

inline bool is_tok(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}

inline bool is_stopword(const char* s, int64_t n) {
  switch (n) {
    case 1:
      return s[0] == 'a';
    case 2: {
      // trailing space keeps the stride walk inside the literal
      static const char* w2 = "an as at be by if in is it no of on or to ";
      for (const char* p = w2; *p; p += 3)
        if (s[0] == p[0] && s[1] == p[1]) return true;
      return false;
    }
    case 3: {
      static const char* w3 = "and are but for not the was ";
      for (const char* p = w3; *p; p += 4)
        if (memcmp(s, p, 3) == 0) return true;
      return false;
    }
    case 4: {
      static const char* w4 = "into such that then they this will with ";
      for (const char* p = w4; *p; p += 5)
        if (memcmp(s, p, 4) == 0) return true;
      return false;
    }
    case 5:
      return memcmp(s, "their", 5) == 0 || memcmp(s, "there", 5) == 0 ||
             memcmp(s, "these", 5) == 0;
  }
  return false;
}

}  // namespace

extern "C" {

// Returns 0 on success. All out-buffers are malloc'd here; release each with
// bm25_batch_free. occ_text[i] indexes into the input texts array — the
// python caller maps it back to (doc, field).
int32_t bm25_batch_analyze(const char* texts, const int64_t* offsets,
                           int64_t n_texts, int32_t** occ_tid,
                           int32_t** occ_text, int64_t* n_occ,
                           int32_t** n_uni_out, char** term_bytes,
                           int64_t* term_bytes_len, int64_t** term_offsets,
                           int64_t* n_terms_out) {
  std::unordered_map<std::string, int32_t> intern;
  std::string arena;          // concatenated interned term bytes
  std::vector<int64_t> term_off{0};
  std::vector<int32_t> tids;
  std::vector<int32_t> tidx;
  std::vector<int32_t> nuni(static_cast<size_t>(n_texts), 0);
  std::vector<std::pair<int64_t, int64_t>> toks;  // (start, len) per text
  std::string bigram;
  intern.reserve(1 << 14);

  auto intern_get = [&](const char* s, size_t n) -> int32_t {
    auto it = intern.find(std::string(s, n));  // small-string: cheap key
    if (it != intern.end()) return it->second;
    int32_t id = static_cast<int32_t>(term_off.size()) - 1;
    arena.append(s, n);
    term_off.push_back(static_cast<int64_t>(arena.size()));
    intern.emplace(std::string(s, n), id);
    return id;
  };

  for (int64_t ti = 0; ti < n_texts; ++ti) {
    const char* base = texts + offsets[ti];
    const int64_t len = offsets[ti + 1] - offsets[ti];
    toks.clear();
    int64_t i = 0;
    while (i < len) {
      if (!is_tok(static_cast<unsigned char>(base[i]))) {
        ++i;
        continue;
      }
      int64_t j = i + 1;
      while (j < len && is_tok(static_cast<unsigned char>(base[j]))) ++j;
      if (!is_stopword(base + i, j - i)) toks.emplace_back(i, j - i);
      i = j;
    }
    nuni[static_cast<size_t>(ti)] = static_cast<int32_t>(toks.size());
    for (auto& [s, n] : toks) {
      tids.push_back(intern_get(base + s, static_cast<size_t>(n)));
      tidx.push_back(static_cast<int32_t>(ti));
    }
    for (size_t b2 = 1; b2 < toks.size(); ++b2) {
      auto [s0, n0] = toks[b2 - 1];
      auto [s1, n1] = toks[b2];
      bigram.assign(base + s0, static_cast<size_t>(n0));
      bigram.push_back('_');
      bigram.append(base + s1, static_cast<size_t>(n1));
      tids.push_back(intern_get(bigram.data(), bigram.size()));
      tidx.push_back(static_cast<int32_t>(ti));
    }
  }

  auto copy_out = [](const void* src, size_t bytes) -> void* {
    void* p = malloc(bytes ? bytes : 1);
    if (p && bytes) memcpy(p, src, bytes);
    return p;
  };
  *n_occ = static_cast<int64_t>(tids.size());
  *n_terms_out = static_cast<int64_t>(term_off.size()) - 1;
  *term_bytes_len = static_cast<int64_t>(arena.size());
  *occ_tid = static_cast<int32_t*>(copy_out(tids.data(),
                                            tids.size() * sizeof(int32_t)));
  *occ_text = static_cast<int32_t*>(copy_out(tidx.data(),
                                             tidx.size() * sizeof(int32_t)));
  *n_uni_out = static_cast<int32_t*>(copy_out(nuni.data(),
                                              nuni.size() * sizeof(int32_t)));
  *term_bytes = static_cast<char*>(copy_out(arena.data(), arena.size()));
  *term_offsets = static_cast<int64_t*>(copy_out(
      term_off.data(), term_off.size() * sizeof(int64_t)));
  if (!*occ_tid || !*occ_text || !*n_uni_out || !*term_bytes ||
      !*term_offsets) {
    return 1;
  }
  return 0;
}

void bm25_batch_free(void* p) { free(p); }

}  // extern "C"
