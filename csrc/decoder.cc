// Token-passing Viterbi decoder — native core.
//
// Behavioral reference: the best-path slice of Kaldi's
// latgen-faster-mapped / faster-decoder (kaldi/src/decoder/), operating on
// the packed arc arrays produced by
// torchain_tpu.eval.decoder.make_decoding_graph (same dst-sorted layout as
// the numpy implementation, which remains the reference in tests).
// Exposed through a flat C ABI consumed via ctypes — the same boundary
// style torchain's bridge used for Kaldi (extern "C" over opaque data),
// but with no framework dependency on either side.
//
// Build: make -C csrc    (produces libtorchain_tpu_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {
constexpr float kNegInf = -std::numeric_limits<float>::infinity();
}

extern "C" {

// Returns 0 on success, nonzero on error.  out_phones must have room for T
// entries; *out_len receives the number of phones written.
int tt_viterbi_decode(int num_states, int num_arcs, int num_pdfs, int num_frames,
                      const int32_t* src, const int32_t* dst, const int32_t* pdf,
                      const float* weight, const int32_t* olabel,
                      const float* final_logw,
                      const float* loglikes,  // [T, P] row-major
                      float beam, int use_final,
                      int32_t* out_phones, int32_t* out_len, float* out_score) {
  if (num_states <= 0 || num_arcs <= 0 || num_frames <= 0) return 1;
  const int S = num_states, A = num_arcs, T = num_frames, P = num_pdfs;

  std::vector<double> tokens(S, kNegInf), next(S, kNegInf);
  tokens[0] = 0.0;
  std::vector<int32_t> backptr(static_cast<size_t>(T) * S, -1);

  for (int t = 0; t < T; ++t) {
    const float* ll = loglikes + static_cast<size_t>(t) * P;
    std::fill(next.begin(), next.end(), kNegInf);
    int32_t* bp = backptr.data() + static_cast<size_t>(t) * S;
    double best = kNegInf;
    for (int a = 0; a < A; ++a) {
      const double ts = tokens[src[a]];
      if (ts == kNegInf) continue;
      const double score = ts + weight[a] + ll[pdf[a]];
      const int d = dst[a];
      if (score > next[d]) {
        next[d] = score;
        bp[d] = a;
        if (score > best) best = score;
      }
    }
    if (best == kNegInf) return 2;  // all tokens died
    const double cutoff = best - beam;
    for (int s = 0; s < S; ++s)
      if (next[s] < cutoff) next[s] = kNegInf;
    tokens.swap(next);
  }

  // pick the best (optionally final-weighted) end state
  int best_state = -1;
  double best_score = kNegInf;
  for (int s = 0; s < S; ++s) {
    if (tokens[s] == kNegInf) continue;
    double sc = tokens[s];
    if (use_final) {
      if (final_logw[s] == kNegInf) continue;
      sc += final_logw[s];
    }
    if (sc > best_score) {
      best_score = sc;
      best_state = s;
    }
  }
  if (best_state < 0) {  // no reachable final state: fall back to best token
    for (int s = 0; s < S; ++s) {
      if (tokens[s] > best_score) {
        best_score = tokens[s];
        best_state = s;
      }
    }
  }
  if (best_state < 0) return 3;

  // backtrace, collecting output labels (phones)
  std::vector<int32_t> rev;
  rev.reserve(T);
  int state = best_state;
  for (int t = T - 1; t >= 0; --t) {
    const int32_t a = backptr[static_cast<size_t>(t) * S + state];
    if (a < 0) return 4;
    if (olabel[a] > 0) rev.push_back(olabel[a]);
    state = src[a];
  }
  const int n = static_cast<int>(rev.size());
  for (int i = 0; i < n; ++i) out_phones[i] = rev[n - 1 - i];
  *out_len = n;
  *out_score = static_cast<float>(best_score);
  return 0;
}

}  // extern "C"


extern "C" {

// Active-token Viterbi: only states alive within the beam are expanded,
// with a Kaldi-style max_active cap (adaptive beam via nth-best cutoff)
// and a token-record lattice for traceback (memory O(total live tokens),
// not O(T * S)) -- the faster-decoder behavior HCLG-scale graphs need
// (kaldi/src/decoder/faster-decoder.cc).  Arcs must be SRC-sorted with
// CSR offsets [S+1]; olabel/weight/pdf/dst aligned with that order.
int tt_viterbi_decode_active(
    int num_states, int num_arcs, int num_pdfs, int num_frames,
    const int32_t* offsets,  // [S+1] src-sorted CSR
    const int32_t* dst, const int32_t* pdf, const float* weight,
    const int32_t* olabel, const float* final_logw,
    const float* loglikes,  // [T, P] row-major
    float beam, int max_active, int use_final,
    int32_t* out_phones, int32_t* out_len, float* out_score) {
  if (num_states <= 0 || num_arcs <= 0 || num_frames <= 0) return 1;
  const int S = num_states, T = num_frames, P = num_pdfs;
  (void)num_arcs;

  struct Rec { int32_t state; int32_t arc; int32_t prev; };
  std::vector<Rec> recs;
  recs.reserve(1 << 16);

  std::vector<double> score(S, kNegInf), nscore(S, kNegInf);
  std::vector<int32_t> rec_of(S, -1), nrec(S, -1);
  std::vector<int32_t> active, nactive, stamp(S, -1);
  active.push_back(0);
  score[0] = 0.0;
  rec_of[0] = -1;

  std::vector<double> cand;  // scratch for max_active cutoff
  for (int t = 0; t < T; ++t) {
    const float* ll = loglikes + static_cast<size_t>(t) * P;
    nactive.clear();
    double best = kNegInf;
    for (int32_t s : active) {
      const double ts = score[s];
      const int32_t prev_rec = rec_of[s];
      for (int32_t a = offsets[s]; a < offsets[s + 1]; ++a) {
        const double sc = ts + weight[a] + ll[pdf[a]];
        const int32_t d = dst[a];
        if (stamp[d] != t) {
          stamp[d] = t;
          nscore[d] = kNegInf;
          nrec[d] = -1;
          nactive.push_back(d);
        }
        if (sc > nscore[d]) {
          nscore[d] = sc;
          nrec[d] = static_cast<int32_t>(recs.size());
          recs.push_back(Rec{d, a, prev_rec});
          if (sc > best) best = sc;
        }
      }
    }
    if (nactive.empty() || best == kNegInf) return 2;  // all tokens died
    double cutoff = best - beam;
    if (max_active > 0 && static_cast<int>(nactive.size()) > max_active) {
      cand.clear();
      for (int32_t s : nactive) cand.push_back(nscore[s]);
      std::nth_element(cand.begin(), cand.begin() + (max_active - 1),
                       cand.end(), std::greater<double>());
      cutoff = std::max(cutoff, cand[max_active - 1]);
    }
    active.clear();
    for (int32_t s : nactive) {
      if (nscore[s] >= cutoff) {
        score[s] = nscore[s];
        rec_of[s] = nrec[s];
        active.push_back(s);
      }
    }
  }

  int32_t best_rec = -1;
  double best_score = kNegInf;
  for (int pass = 0; pass < 2 && best_rec < 0; ++pass) {
    for (int32_t s : active) {
      double sc = score[s];
      if (use_final && pass == 0) {
        if (final_logw[s] == kNegInf) continue;
        sc += final_logw[s];
      }
      if (sc > best_score) {
        best_score = sc;
        best_rec = rec_of[s];
      }
    }
  }
  if (best_rec < 0) return 3;

  std::vector<int32_t> rev;
  rev.reserve(T);
  for (int32_t r = best_rec; r >= 0; r = recs[r].prev) {
    const int32_t ol = olabel[recs[r].arc];
    if (ol > 0) rev.push_back(ol);
  }
  const int n = static_cast<int>(rev.size());
  for (int i = 0; i < n; ++i) out_phones[i] = rev[n - 1 - i];
  *out_len = n;
  *out_score = static_cast<float>(best_score);
  return 0;
}

}  // extern "C"
