// Native BPE merge core — the tokenizer's hot loop.
//
// TPU-native analog of the reference's C++ byte_pair_encoder merge
// (include/metalchat/text/bpe.h:114-176, priority-queue merge over ranks).
// The Python layer owns the vocabulary; it serializes (token bytes → rank)
// pairs once into a native handle holding a hash map, then calls
// mc_bpe_encode per pre-split piece. Greedy lowest-rank-first merging,
// matching text/bpe.py exactly (tiktoken semantics: merge legality = the
// concatenation exists in the vocab; rank = its id).
//
// C ABI only — consumed via ctypes.

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Ranks {
  std::unordered_map<std::string, int64_t> vocab;
};

}  // namespace

extern "C" {

// Build a rank table from flattened token bytes.
//  blob: concatenated token byte strings
//  offsets: n+1 offsets into blob
//  ids: n token ids (= merge ranks in tiktoken mode)
Ranks* mc_bpe_create(const uint8_t* blob, const uint64_t* offsets,
                     const int64_t* ids, uint64_t n) {
  auto* r = new Ranks();
  r->vocab.reserve(n * 2);
  for (uint64_t i = 0; i < n; ++i) {
    r->vocab.emplace(
        std::string(reinterpret_cast<const char*>(blob + offsets[i]),
                    offsets[i + 1] - offsets[i]),
        ids[i]);
  }
  return r;
}

void mc_bpe_destroy(Ranks* r) { delete r; }

// Encode one piece (bytes) → token ids. Returns the number of ids written
// to `out` (caller provides len(piece) capacity — merging never grows), or
// -1 if a symbol is unencodable (caller falls back to Python handling).
int64_t mc_bpe_encode(const Ranks* r, const uint8_t* piece, uint64_t len,
                      int64_t* out) {
  if (len == 0) return 0;
  const auto& vocab = r->vocab;

  // Whole-piece dictionary hit.
  {
    auto it = vocab.find(std::string(reinterpret_cast<const char*>(piece), len));
    if (it != vocab.end()) {
      out[0] = it->second;
      return 1;
    }
  }

  // parts[i] = [start, end) spans over `piece`.
  std::vector<std::pair<uint32_t, uint32_t>> parts;
  parts.reserve(len);
  for (uint32_t i = 0; i < len; ++i) parts.emplace_back(i, i + 1);

  auto rank_of = [&](uint32_t a, uint32_t b) -> int64_t {
    auto it = vocab.find(std::string(
        reinterpret_cast<const char*>(piece) + a, b - a));
    return it == vocab.end() ? -1 : it->second;
  };

  while (parts.size() > 1) {
    int64_t best_rank = -1;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      int64_t rk = rank_of(parts[i].first, parts[i + 1].second);
      if (rk >= 0 && (best_rank < 0 || rk < best_rank)) {
        best_rank = rk;
        best_i = i;
      }
    }
    if (best_rank < 0) break;
    parts[best_i].second = parts[best_i + 1].second;
    parts.erase(parts.begin() + best_i + 1);
  }

  for (size_t i = 0; i < parts.size(); ++i) {
    int64_t rk = rank_of(parts[i].first, parts[i].second);
    if (rk < 0) return -1;  // unencodable symbol → Python fallback
    out[i] = rk;
  }
  return static_cast<int64_t>(parts.size());
}

}  // extern "C"
