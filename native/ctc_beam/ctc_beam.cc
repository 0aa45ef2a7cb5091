// CTC prefix beam search — native host-side decoder.
//
// TPU-native equivalent of the reference's `ctcdecode` C++ dependency
// (SURVEY.md §2 "NATIVE: ctcdecode", rebuild obligation #3): beam decoding is
// eval-only and sits off the device hot path, so it runs on host in C++.
// Algorithm: prefix beam search over (blank, non-blank) probability pairs
// (Hannun et al. 2014), log-domain, with per-step top-k symbol pruning.
//
// KenLM fusion is intentionally out of scope (KenLM is absent from this image);
// the alpha/beta parameters are reserved so an external scorer can slot in.
//
// C ABI (used from Python via ctypes, see aas_enhancement_tpu/decode/beam.py):
//   int ctc_beam_search(const float* log_probs, int t, int v,
//                       int beam_width, int blank, int prune_k,
//                       int* out_ids, int max_out, float* out_score);
// Returns the decoded length (<= max_out), or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline float LogSumExp(float a, float b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  const float m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct Hyp {
  float p_b = kNegInf;   // log prob of prefix ending in blank
  float p_nb = kNegInf;  // log prob of prefix ending in its last symbol
  float Total() const { return LogSumExp(p_b, p_nb); }
};

// Prefix key: symbol ids packed into a string of int32.
inline std::string Extend(const std::string& prefix, int32_t sym) {
  std::string out = prefix;
  out.append(reinterpret_cast<const char*>(&sym), sizeof(sym));
  return out;
}

inline int32_t LastSym(const std::string& prefix) {
  if (prefix.empty()) return -1;
  int32_t sym;
  std::memcpy(&sym, prefix.data() + prefix.size() - sizeof(sym), sizeof(sym));
  return sym;
}

}  // namespace

extern "C" int ctc_beam_search(const float* log_probs, int t, int v,
                               int beam_width, int blank, int prune_k,
                               int* out_ids, int max_out, float* out_score) {
  if (t < 0 || v <= 0 || beam_width <= 0 || blank < 0 || blank >= v) return -1;

  std::unordered_map<std::string, Hyp> beams;
  beams[std::string()] = Hyp{0.0f, kNegInf};

  std::vector<int> symbols(v);
  for (int step = 0; step < t; ++step) {
    const float* lp = log_probs + static_cast<int64_t>(step) * v;

    // Per-step symbol pruning: keep the top prune_k symbols (plus blank).
    int n_sym = v;
    for (int i = 0; i < v; ++i) symbols[i] = i;
    if (prune_k > 0 && prune_k < v) {
      std::partial_sort(symbols.begin(), symbols.begin() + prune_k, symbols.end(),
                        [&](int a, int b) { return lp[a] > lp[b]; });
      n_sym = prune_k;
    }

    std::unordered_map<std::string, Hyp> next;
    next.reserve(beams.size() * (n_sym + 1));

    for (const auto& [prefix, hyp] : beams) {
      const float total = hyp.Total();
      const int32_t last = LastSym(prefix);

      // Blank extends the same prefix.
      {
        Hyp& nh = next[prefix];
        nh.p_b = LogSumExp(nh.p_b, total + lp[blank]);
      }

      bool last_seen = false;
      for (int i = 0; i < n_sym; ++i) {
        const int c = symbols[i];
        if (c == blank) continue;
        if (c == last) last_seen = true;
        const float p = lp[c];
        if (c == last) {
          // Repeat symbol: staying in the same prefix needs a non-blank tail;
          // extending needs a blank separator.
          Hyp& same = next[prefix];
          same.p_nb = LogSumExp(same.p_nb, hyp.p_nb + p);
          Hyp& ext = next[Extend(prefix, c)];
          ext.p_nb = LogSumExp(ext.p_nb, hyp.p_b + p);
        } else {
          Hyp& ext = next[Extend(prefix, c)];
          ext.p_nb = LogSumExp(ext.p_nb, total + p);
        }
      }
      // If pruning dropped the repeat symbol, the same-prefix non-blank mass
      // still needs the repeat path; approximate by dropping (consistent with
      // standard pruned decoders).
      (void)last_seen;
    }

    // Prune to beam width: nth_element partitions so the first beam_width
    // entries are exactly the top-k (ties broken arbitrarily but never at the
    // expense of a strictly better hypothesis).
    if (static_cast<int>(next.size()) > beam_width) {
      std::vector<std::pair<float, const std::string*>> scored;
      scored.reserve(next.size());
      for (const auto& [prefix, hyp] : next)
        scored.emplace_back(hyp.Total(), &prefix);
      std::nth_element(scored.begin(), scored.begin() + beam_width - 1,
                       scored.end(),
                       [](const auto& a, const auto& b) { return a.first > b.first; });
      std::unordered_map<std::string, Hyp> pruned;
      pruned.reserve(beam_width * 2);
      for (int i = 0; i < beam_width; ++i)
        pruned.emplace(*scored[i].second, next.at(*scored[i].second));
      beams.swap(pruned);
    } else {
      beams.swap(next);
    }
  }

  // Best hypothesis.
  const std::string* best = nullptr;
  float best_score = kNegInf;
  for (const auto& [prefix, hyp] : beams) {
    const float s = hyp.Total();
    if (s > best_score) {
      best_score = s;
      best = &prefix;
    }
  }
  if (best == nullptr) return -1;

  const int n = static_cast<int>(best->size() / sizeof(int32_t));
  const int n_out = std::min(n, max_out);
  const int32_t* ids = reinterpret_cast<const int32_t*>(best->data());
  for (int i = 0; i < n_out; ++i) out_ids[i] = ids[i];
  if (out_score) *out_score = best_score;
  return n_out;
}
