// CTC prefix beam search with n-gram shallow fusion.
//
// Native replacement for the reference's pyctcdecode dependency (reference:
// src/coral/ngram.py:341-353 `build_ctcdecoder`, and
// src/coral/compute_metrics.py:53-54 `Wav2Vec2ProcessorWithLM.batch_decode`).
// The device produces per-frame log-probabilities; this host-side decoder runs
// the classic prefix beam search (Hannun et al.) over them, scoring completed
// words with the n-gram model from ngram.cc:
//
//   score(prefix) = log P_ctc(prefix) + alpha * log10 P_lm(words) + beta * |words|
//
// matching pyctcdecode's alpha/beta fusion semantics. Exposed through the same
// C ABI shared library as the LM (ctypes; no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace coral {

// log(a + b) for log-domain a, b (natural log).
static inline double LogAdd(double a, double b) {
  if (a == -INFINITY) return b;
  if (b == -INFINITY) return a;
  double hi = std::max(a, b), lo = std::min(a, b);
  return hi + std::log1p(std::exp(lo - hi));
}

static const double kNegInf = -INFINITY;

struct Beam {
  std::string text;          // decoded text so far (token strings concatenated)
  double p_blank = kNegInf;  // log prob of prefix ending in blank
  double p_non_blank = kNegInf;
  double lm_score = 0.0;     // natural-log LM contribution (alpha/beta applied)
  int num_words = 0;
  int last_token = -1;       // last emitted token id

  double Total() const { return LogAdd(p_blank, p_non_blank) + lm_score; }
};

}  // namespace coral

// LM query hook implemented in ngram.cc.
extern "C" float coral_ngram_logprob(void* handle, const char* context,
                                     const char* word);

namespace coral {

// Last (order-1) words of `text` as the LM context.
static std::string LmContext(const std::string& text, int max_words) {
  std::vector<std::string> words;
  std::istringstream iss(text);
  std::string w;
  while (iss >> w) words.push_back(w);
  int start = std::max(0, static_cast<int>(words.size()) - max_words);
  std::string out;
  for (size_t i = start; i < words.size(); ++i) {
    if (!out.empty()) out += ' ';
    out += words[i];
  }
  return out;
}

static std::string LastWord(const std::string& text) {
  auto pos = text.find_last_of(' ');
  return pos == std::string::npos ? text : text.substr(pos + 1);
}

char* DecodeImpl(const float* log_probs, int T, int V, const char** vocab,
                 int blank_id, int word_sep_id, int beam_width, void* lm,
                 float alpha, float beta, int lm_order) {
  const double kLn10 = std::log(10.0);
  std::vector<Beam> beams(1);
  beams[0].p_blank = 0.0;  // empty prefix, log 1

  std::vector<Beam> next;
  next.reserve(beam_width * 8);

  for (int t = 0; t < T; ++t) {
    const float* frame = log_probs + static_cast<int64_t>(t) * V;
    std::unordered_map<std::string, size_t> index;  // text+last -> slot in next
    next.clear();

    auto slot = [&](const std::string& text, int last_token) -> Beam& {
      std::string key = text + '\x01' + std::to_string(last_token);
      auto it = index.find(key);
      if (it != index.end()) return next[it->second];
      index.emplace(std::move(key), next.size());
      next.emplace_back();
      next.back().text = text;
      next.back().last_token = last_token;
      return next.back();
    };

    for (const Beam& b : beams) {
      double p_total = LogAdd(b.p_blank, b.p_non_blank);

      // Extend with blank: prefix unchanged.
      {
        Beam& nb = slot(b.text, b.last_token);
        nb.p_blank = LogAdd(nb.p_blank, p_total + frame[blank_id]);
        nb.lm_score = b.lm_score;
        nb.num_words = b.num_words;
      }

      for (int v = 0; v < V; ++v) {
        if (v == blank_id) continue;
        double p_v = frame[v];
        if (p_v < -12.0) continue;  // negligible mass; big speedup

        if (v == b.last_token) {
          // Repeat without blank: same prefix (collapse).
          Beam& nb = slot(b.text, b.last_token);
          nb.p_non_blank = LogAdd(nb.p_non_blank, b.p_non_blank + p_v);
          nb.lm_score = b.lm_score;
          nb.num_words = b.num_words;
          // Repeat after blank: extend prefix with a doubled char.
          double p_ext = b.p_blank + p_v;
          if (p_ext > kNegInf) {
            std::string text = b.text + vocab[v];
            Beam& eb = slot(text, v);
            eb.p_non_blank = LogAdd(eb.p_non_blank, p_ext);
            eb.lm_score = b.lm_score;
            eb.num_words = b.num_words;
          }
          continue;
        }

        // New token extends the prefix.
        std::string text;
        double lm_score = b.lm_score;
        int num_words = b.num_words;
        if (v == word_sep_id) {
          // Word boundary: score the completed word with the LM.
          std::string word = LastWord(b.text);
          if (!word.empty() && lm != nullptr) {
            std::string head =
                b.text.substr(0, b.text.size() - word.size());
            if (!head.empty() && head.back() == ' ') head.pop_back();
            std::string ctx = LmContext(head, lm_order - 1);
            float lp10 = coral_ngram_logprob(lm, ctx.c_str(), word.c_str());
            lm_score += alpha * lp10 * kLn10 + beta;
            num_words += 1;
          }
          if (!b.text.empty() && b.text.back() != ' ') text = b.text + ' ';
          else text = b.text;  // collapse repeated separators
        } else {
          text = b.text + vocab[v];
        }
        Beam& nb = slot(text, v);
        nb.p_non_blank = LogAdd(nb.p_non_blank, p_total + p_v);
        nb.lm_score = lm_score;
        nb.num_words = num_words;
      }
    }

    // Prune to beam width.
    std::sort(next.begin(), next.end(),
              [](const Beam& a, const Beam& b) { return a.Total() > b.Total(); });
    if (static_cast<int>(next.size()) > beam_width) next.resize(beam_width);
    beams.swap(next);
  }

  // Finalise: score the trailing partial word.
  for (Beam& b : beams) {
    std::string word = LastWord(b.text);
    if (!word.empty() && lm != nullptr) {
      std::string head = b.text.substr(0, b.text.size() - word.size());
      if (!head.empty() && head.back() == ' ') head.pop_back();
      std::string ctx = LmContext(head, lm_order - 1);
      float lp10 = coral_ngram_logprob(lm, ctx.c_str(), word.c_str());
      b.lm_score += alpha * lp10 * kLn10 + beta;
    }
  }
  std::sort(beams.begin(), beams.end(),
            [](const Beam& a, const Beam& b) { return a.Total() > b.Total(); });

  std::string best = beams.empty() ? "" : beams[0].text;
  // Trim leading/trailing separators.
  while (!best.empty() && best.front() == ' ') best.erase(best.begin());
  while (!best.empty() && best.back() == ' ') best.pop_back();

  char* out = static_cast<char*>(std::malloc(best.size() + 1));
  std::memcpy(out, best.c_str(), best.size() + 1);
  return out;
}

}  // namespace coral

extern "C" {

// log_probs: (T, V) row-major natural-log probabilities. vocab: V utf-8 token
// strings; `word_sep_id` is the CTC word delimiter ('|'). `lm` may be null
// (pure acoustic beam search). Caller frees the result with coral_free.
char* coral_ctc_beam_search(const float* log_probs, int T, int V,
                            const char** vocab, int blank_id, int word_sep_id,
                            int beam_width, void* lm, float alpha, float beta,
                            int lm_order) {
  return coral::DecodeImpl(log_probs, T, V, vocab, blank_id, word_sep_id,
                           beam_width, lm, alpha, beta, lm_order);
}

void coral_free(char* p) { std::free(p); }

}  // extern "C"
