// Fast Levenshtein distance over int32 token sequences.
//
// Native replacement for the reference's `editdistance` C++ extension
// (reference: src/utils/wer.py:5) — used for per-step train/valid WER and for
// corpus scoring (replaces sclite; reference: egs/librispeech/run_art.sh:144).
// Exposed via ctypes; see cassnat_asr_public_tpu/utils/metrics.py.
//
// Build: make -C native  (produces libcassnat_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein distance between a[0:na] and b[0:nb].
int64_t edit_distance_i32(const int32_t* a, int64_t na, const int32_t* b,
                          int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      int64_t sub = prev[j - 1] + (ai != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Batched distance: flat ref/hyp token arrays with per-sequence lengths.
// Writes per-pair distances into out[n].
void edit_distance_batch_i32(const int32_t* refs, const int64_t* ref_lens,
                             const int32_t* hyps, const int64_t* hyp_lens,
                             int64_t n, int64_t* out) {
  int64_t roff = 0, hoff = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = edit_distance_i32(refs + roff, ref_lens[i], hyps + hoff,
                               hyp_lens[i]);
    roff += ref_lens[i];
    hoff += hyp_lens[i];
  }
}

// Alignment counts for detailed WER reports (sub/ins/del), sclite-style.
void edit_alignment_i32(const int32_t* ref, int64_t nr, const int32_t* hyp,
                        int64_t nh, int64_t* n_sub, int64_t* n_ins,
                        int64_t* n_del) {
  std::vector<std::vector<int32_t>> d(nr + 1, std::vector<int32_t>(nh + 1));
  for (int64_t i = 0; i <= nr; ++i) d[i][0] = static_cast<int32_t>(i);
  for (int64_t j = 0; j <= nh; ++j) d[0][j] = static_cast<int32_t>(j);
  for (int64_t i = 1; i <= nr; ++i)
    for (int64_t j = 1; j <= nh; ++j)
      d[i][j] = std::min({d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1])});
  // backtrace
  int64_t i = nr, j = nh, s = 0, ins = 0, del = 0;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 &&
        d[i][j] == d[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1])) {
      s += (ref[i - 1] != hyp[j - 1]);
      --i;
      --j;
    } else if (j > 0 && d[i][j] == d[i][j - 1] + 1) {
      ++ins;
      --j;
    } else {
      ++del;
      --i;
    }
  }
  *n_sub = s;
  *n_ins = ins;
  *n_del = del;
}

}  // extern "C"
