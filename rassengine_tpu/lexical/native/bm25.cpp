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
