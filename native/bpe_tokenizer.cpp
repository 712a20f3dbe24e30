// bpe_tokenizer — greedy BPE merge loop (C++17, C ABI).
//
// Native fast path behind llama_cu_awq_tpu/tokenizer.py (_NativeMerger).
// Reproduces the reference tokenizer's merge semantics EXACTLY
// (reference: tokenizer.h:188-217): repeatedly find the mergeable
// adjacent pair whose merged piece has the highest vocab score —
// leftmost wins ties (the reference scans left-to-right with a strict
// `>` comparison) — and replace the pair with the merged token, until
// no pair merges.
//
// The reference rescans the whole sequence per merge: O(n^2) total.
// This implementation keeps a doubly-linked token list plus a max-heap
// of candidate merges with lazy invalidation (per-node change stamps):
// O(n log n) total, which is what makes >10K-char prompts encode in
// milliseconds instead of seconds.
//
// Tie-break correctness: a merged node reuses its LEFT constituent's
// array slot, so slot indices remain monotonically ordered along the
// list at all times; ordering the heap by (score desc, slot asc) is
// therefore identical to the reference's left-to-right argmax scan.

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BPE {
  std::vector<std::string> vocab;
  std::vector<float> scores;
  std::unordered_map<std::string, int> lookup;  // first occurrence wins
};

struct Cand {
  float score;
  int left;        // slot of the pair's left node (position key)
  int right;       // slot of the pair's right node
  uint32_t lstamp; // left/right change stamps at push time
  uint32_t rstamp;
  int merged_id;
};

struct CandLess {  // max-heap: higher score first, then leftmost
  bool operator()(const Cand& a, const Cand& b) const {
    if (a.score != b.score) return a.score < b.score;
    return a.left > b.left;
  }
};

}  // namespace

extern "C" {

// flat: vocab pieces joined by '\0' (lens[] is authoritative).
// resolved[i]: the token id a lookup of vocab[i]'s string must return.
// llama vocabs contain DUPLICATE piece strings (byte-fallback tokens
// stored as raw bytes shadow real single-char/2-byte pieces); which
// duplicate wins is reference-defined by its qsort+bsearch
// (tokenizer.h:95-100), so the caller (tokenizer.py _resolve_lookup)
// computes the winner once and both lookup paths share it.
void* bpe_create(const char* flat, const int* lens, const float* scores,
                 const int* resolved, int n) {
  auto* t = new BPE();
  t->vocab.reserve(n);
  t->scores.assign(scores, scores + n);
  size_t off = 0;
  for (int i = 0; i < n; i++) {
    t->vocab.emplace_back(flat + off, (size_t)lens[i]);
    off += (size_t)lens[i] + 1;  // skip the separator
    t->lookup.emplace(t->vocab.back(), resolved ? resolved[i] : i);
  }
  return t;
}

void bpe_destroy(void* h) { delete static_cast<BPE*>(h); }

// In-place merge of tokens[0..n); returns the merged length.
int bpe_merge(void* h, int* tokens, int n) {
  if (n <= 1) return n;
  auto* t = static_cast<BPE*>(h);
  std::vector<int> id(tokens, tokens + n), nxt(n), prv(n);
  std::vector<uint32_t> stamp(n, 0);
  for (int i = 0; i < n; i++) {
    nxt[i] = (i + 1 < n) ? i + 1 : -1;
    prv[i] = i - 1;
  }
  std::priority_queue<Cand, std::vector<Cand>, CandLess> heap;

  auto push_pair = [&](int a) {
    int b = nxt[a];
    if (a < 0 || b < 0) return;
    auto it = t->lookup.find(t->vocab[id[a]] + t->vocab[id[b]]);
    if (it == t->lookup.end()) return;
    heap.push({t->scores[it->second], a, b, stamp[a], stamp[b],
               it->second});
  };
  for (int i = 0; i + 1 < n; i++) push_pair(i);

  while (!heap.empty()) {
    Cand c = heap.top();
    heap.pop();
    // stale? (either node changed/died, or they are no longer adjacent)
    if (stamp[c.left] != c.lstamp || stamp[c.right] != c.rstamp ||
        nxt[c.left] != c.right)
      continue;
    id[c.left] = c.merged_id;
    stamp[c.left]++;
    stamp[c.right]++;  // right node dies
    int after = nxt[c.right];
    nxt[c.left] = after;
    if (after >= 0) prv[after] = c.left;
    if (prv[c.left] >= 0) push_pair(prv[c.left]);
    push_pair(c.left);
  }

  int out = 0;
  for (int i = 0; i >= 0; i = nxt[i]) tokens[out++] = id[i];
  return out;
}

}  // extern "C"
