// Native host-side helpers for efficient_attention_tpu.
//
// TPU-native rebuilds of the reference's host-side native code:
//   * batch_by_size token-budget packing      (fairseq data_utils_fast.pyx)
//   * token-block slice index construction    (fairseq token_block_utils_fast.pyx)
//   * corpus-BLEU n-gram counting             (fairseq clib/libbleu/libbleu.cpp)
//   * Levenshtein edit distance               (fairseq clib/libnat/edit_dist.cpp)
//   * auction-algorithm balanced assignment   (fairseq clib/libbase/balanced_assignment.cpp)
//   * banned-token n-gram repeat blocking     (fairseq clib/cuda/ngram_repeat_block*)
//
// All entry points use a plain C ABI and are bound from Python via ctypes
// (see native.py).  Device-side work stays in XLA/Pallas; these are the hot
// host loops of the data/scoring pipeline.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// batch_by_size: greedy token-budget packing over (length-sorted) indices.
// Writes batch boundaries into out_offsets (caller-allocated, n+1 capacity);
// returns the number of batches.  Mirrors text_data.batch_by_size semantics.
// ---------------------------------------------------------------------------
int64_t eatpu_batch_by_size(
    const int64_t* indices, const int64_t* sizes, int64_t n,
    int64_t max_tokens, int64_t max_sentences, int64_t required_multiple,
    int64_t* out_offsets) {
  int64_t num_batches = 0;
  int64_t start = 0;
  int64_t cur_max = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t size = sizes[indices[i]];
    int64_t count = i - start;
    int64_t new_max = std::max(cur_max, size);
    bool over_tokens = count > 0 && new_max * (count + 1) > max_tokens;
    bool over_sents = max_sentences > 0 && count >= max_sentences;
    if (over_tokens || over_sents) {
      int64_t keep = count;
      if (required_multiple > 1 && keep > required_multiple)
        keep -= keep % required_multiple;
      out_offsets[++num_batches] = start + keep;
      start = start + keep;
      cur_max = 0;
      for (int64_t j = start; j <= i; ++j)
        cur_max = std::max(cur_max, sizes[indices[j]]);
    } else {
      cur_max = new_max;
    }
  }
  if (start < n) out_offsets[++num_batches] = n;
  return num_batches;
}

// ---------------------------------------------------------------------------
// token_block_slices: [start, end) index pairs for fixed-size LM blocks over
// a corpus of per-sequence lengths ('none' break mode).
// ---------------------------------------------------------------------------
int64_t eatpu_token_block_slices(
    const int64_t* lengths, int64_t n_seqs, int64_t block_size,
    int64_t* out_starts, int64_t* out_ends) {
  int64_t total = 0;
  for (int64_t i = 0; i < n_seqs; ++i) total += lengths[i];
  int64_t n_blocks = (total + block_size - 1) / block_size;
  for (int64_t b = 0; b < n_blocks; ++b) {
    out_starts[b] = b * block_size;
    out_ends[b] = std::min((b + 1) * block_size, total);
  }
  return n_blocks;
}

// ---------------------------------------------------------------------------
// BLEU n-gram counting: accumulate clipped matches/totals for orders 1..4.
// match/total are int64[4]; ref/hyp are cleaned token arrays.
// ---------------------------------------------------------------------------
static inline uint64_t fnv1a(const int64_t* toks, int64_t n) {
  uint64_t h = 1469598103934665603ull;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(toks);
  for (int64_t i = 0; i < n * (int64_t)sizeof(int64_t); ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

void eatpu_bleu_add(
    const int64_t* ref, int64_t ref_len,
    const int64_t* hyp, int64_t hyp_len,
    int64_t* match, int64_t* total) {
  for (int order = 1; order <= 4; ++order) {
    std::unordered_map<uint64_t, int64_t> ref_counts;
    for (int64_t i = 0; i + order <= ref_len; ++i)
      ref_counts[fnv1a(ref + i, order)]++;
    std::unordered_map<uint64_t, int64_t> hyp_counts;
    for (int64_t i = 0; i + order <= hyp_len; ++i)
      hyp_counts[fnv1a(hyp + i, order)]++;
    for (auto& kv : hyp_counts) {
      total[order - 1] += kv.second;
      auto it = ref_counts.find(kv.first);
      if (it != ref_counts.end())
        match[order - 1] += std::min(kv.second, it->second);
    }
  }
}

// ---------------------------------------------------------------------------
// Levenshtein edit distance (unit costs) — libnat equivalent.
// ---------------------------------------------------------------------------
int64_t eatpu_edit_distance(
    const int64_t* a, int64_t na, const int64_t* b, int64_t nb) {
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= nb; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// ---------------------------------------------------------------------------
// Balanced assignment via auction algorithm — libbase equivalent
// (BASE-layer MoE routing).  scores: [n_workers * n_jobs] row-major; writes
// job index per worker.  n_jobs must equal n_workers * jobs_per_worker.
// ---------------------------------------------------------------------------
void eatpu_balanced_assignment(
    const float* scores, int64_t n_workers, int64_t n_jobs,
    float eps, int64_t* out_job_for_worker) {
  std::vector<float> price(n_jobs, 0.0f);
  std::vector<int64_t> owner(n_jobs, -1);
  std::vector<int64_t> unassigned;
  for (int64_t w = 0; w < n_workers; ++w) unassigned.push_back(w);
  int64_t iter_guard = 64 * n_workers * n_jobs + 1024;
  while (!unassigned.empty() && iter_guard-- > 0) {
    int64_t w = unassigned.back();
    unassigned.pop_back();
    // find best and second-best job for this worker
    int64_t best = -1;
    float best_v = -std::numeric_limits<float>::infinity();
    float second_v = best_v;
    for (int64_t j = 0; j < n_jobs; ++j) {
      float v = scores[w * n_jobs + j] - price[j];
      if (v > best_v) {
        second_v = best_v;
        best_v = v;
        best = j;
      } else if (v > second_v) {
        second_v = v;
      }
    }
    price[best] += (best_v - second_v) + eps;
    if (owner[best] >= 0) unassigned.push_back(owner[best]);
    owner[best] = w;
  }
  for (int64_t j = 0; j < n_jobs; ++j)
    if (owner[j] >= 0) out_job_for_worker[owner[j]] = j;
}

// ---------------------------------------------------------------------------
// N-gram repeat blocking for beam search — ngram_repeat_block equivalent.
// For each hypothesis row, ban next-tokens that would complete an already
// seen n-gram.  tokens: [bsz * beam, step_len]; writes -inf-mask positions
// as token ids into out_banned (capacity max_banned per row), count in
// out_counts.
// ---------------------------------------------------------------------------
void eatpu_ngram_repeat_block(
    const int64_t* tokens, int64_t n_rows, int64_t step_len,
    int64_t ngram_size, int64_t* out_banned, int64_t* out_counts,
    int64_t max_banned) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t* row = tokens + r * step_len;
    int64_t count = 0;
    if (step_len + 1 >= ngram_size) {
      // suffix of length ngram_size-1 that the next token would extend
      const int64_t* suffix = row + step_len - (ngram_size - 1);
      for (int64_t i = 0; i + ngram_size <= step_len; ++i) {
        if (std::memcmp(row + i, suffix,
                        sizeof(int64_t) * (ngram_size - 1)) == 0) {
          if (count < max_banned)
            out_banned[r * max_banned + count++] = row[i + ngram_size - 1];
        }
      }
    }
    out_counts[r] = count;
  }
}

// ---------------------------------------------------------------------------
// Monotonic-attention expected alignment — alignment-train equivalent
// (reference examples/operators/alignment_train_cpu.cpp:80-133).
// p_choose: [bsz * tgt_len * src_len] row-major fp32; writes alpha of the
// same shape.  alpha_t = p_t * excl_cumprod(1-p_t)
//                            * cumsum(alpha_{t-1} / clamp(excl_cumprod)).
// ---------------------------------------------------------------------------
void eatpu_alignment_train(
    const float* p_choose, float* alpha,
    int64_t bsz, int64_t tgt_len, int64_t src_len, float eps) {
  std::vector<float> cumprod_ex(src_len), denom(src_len), prev(src_len);
  for (int64_t b = 0; b < bsz; ++b) {
    // previous row starts as [1, 0, 0, ...]
    std::fill(prev.begin(), prev.end(), 0.0f);
    prev[0] = 1.0f;
    for (int64_t t = 0; t < tgt_len; ++t) {
      const float* p = p_choose + (b * tgt_len + t) * src_len;
      float* out = alpha + (b * tgt_len + t) * src_len;
      float run = 1.0f;
      for (int64_t s = 0; s < src_len; ++s) {
        cumprod_ex[s] = run;
        run *= 1.0f - p[s];
        denom[s] = std::min(std::max(cumprod_ex[s], eps), 1.0f);
      }
      float scan = 0.0f;
      for (int64_t s = 0; s < src_len; ++s) {
        scan += prev[s] / denom[s];
        out[s] = std::min(std::max(scan * p[s] * cumprod_ex[s], 0.0f), 1.0f);
      }
      std::copy(out, out + src_len, prev.begin());
    }
  }
}

}  // extern "C"
