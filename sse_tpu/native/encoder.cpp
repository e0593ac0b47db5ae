// Native subword encoder — the data-pipeline hot loop in C++.
//
// The reference's data prep is pure Python (SURVEY.md §2.1: tokenizer.py /
// text_encoder.py; §3.5 marks vocab/corpus encoding as the CPU hot loop).
// This library re-implements the ENCODE path (tokenize → escape → greedy
// longest-match segmentation) bit-identically to sse_tpu/text/subword.py,
// so host-side corpus encoding and query tokenization stop being the
// bottleneck when building multi-million-row indexes. Vocabulary
// CONSTRUCTION stays in Python (one-time, offline).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC encoder.cpp -o _libsse_native.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr uint32_t kEnd = '_';

// ---------------------------------------------------------------- utf-8
// Decode one UTF-8 char at p (len bytes available); returns codepoint and
// advances *consumed. Invalid bytes decode as U+FFFD over 1 byte (Python
// strings can't contain invalid sequences, so this path is defensive only).
uint32_t DecodeUtf8(const char* p, size_t len, size_t* consumed) {
  const unsigned char b0 = static_cast<unsigned char>(p[0]);
  if (b0 < 0x80) {
    *consumed = 1;
    return b0;
  }
  int n;
  uint32_t cp;
  if ((b0 & 0xE0) == 0xC0) {
    n = 2;
    cp = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    n = 3;
    cp = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    n = 4;
    cp = b0 & 0x07;
  } else {
    *consumed = 1;
    return 0xFFFD;
  }
  if (static_cast<size_t>(n) > len) {
    *consumed = 1;
    return 0xFFFD;
  }
  for (int i = 1; i < n; ++i) {
    const unsigned char bi = static_cast<unsigned char>(p[i]);
    if ((bi & 0xC0) != 0x80) {
      *consumed = 1;
      return 0xFFFD;
    }
    cp = (cp << 6) | (bi & 0x3F);
  }
  *consumed = n;
  return cp;
}

void AppendUtf8(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// ------------------------------------------------------------ byte trie
// Greedy longest-match over escaped-token bytes. Nodes in a flat vector;
// children in a per-node hash map (vocab is small, build once).
struct TrieNode {
  int32_t id = -1;  // subtoken id if a vocab entry ends here
  std::unordered_map<unsigned char, int32_t> next;
};

struct Encoder {
  std::vector<TrieNode> trie;
  std::unordered_set<uint32_t> alphabet;      // codepoints
  std::vector<std::pair<uint32_t, uint32_t>> alnum_ranges;  // sorted

  bool IsAlnum(uint32_t cp) const {
    // binary search over [lo, hi] ranges
    size_t lo = 0, hi = alnum_ranges.size();
    while (lo < hi) {
      const size_t mid = (lo + hi) / 2;
      if (cp < alnum_ranges[mid].first) {
        hi = mid;
      } else if (cp > alnum_ranges[mid].second) {
        lo = mid + 1;
      } else {
        return true;
      }
    }
    return false;
  }

  void AddSubtoken(const char* bytes, int32_t len, int32_t id) {
    int32_t node = 0;
    for (int32_t i = 0; i < len; ++i) {
      const unsigned char b = static_cast<unsigned char>(bytes[i]);
      auto it = trie[node].next.find(b);
      if (it == trie[node].next.end()) {
        trie.emplace_back();
        trie[node].next.emplace(b, static_cast<int32_t>(trie.size() - 1));
        node = static_cast<int32_t>(trie.size() - 1);
      } else {
        node = it->second;
      }
    }
    if (trie[node].id < 0) trie[node].id = id;  // first writer wins (dup-safe)
  }

  // Longest match starting at escaped[pos]; returns (id, match_bytes) or
  // id -1 when no vocab entry matches (caller skips one char).
  std::pair<int32_t, size_t> Longest(const std::string& escaped,
                                     size_t pos) const {
    int32_t node = 0;
    int32_t best_id = -1;
    size_t best_len = 0;
    for (size_t i = pos; i < escaped.size(); ++i) {
      const unsigned char b = static_cast<unsigned char>(escaped[i]);
      auto it = trie[node].next.find(b);
      if (it == trie[node].next.end()) break;
      node = it->second;
      if (trie[node].id >= 0) {
        best_id = trie[node].id;
        best_len = i - pos + 1;
      }
    }
    return {best_id, best_len};
  }

  // tokenize → escape → segment, appending ids to out.
  void EncodeText(const char* text, size_t len, std::vector<int32_t>* out) const {
    // Pass 1: invertible run tokenizer (sse_tpu/text/tokenizer.py rules).
    // We stream runs; a lone " " between two alnum runs is dropped.
    size_t pos = 0;
    size_t run_start = 0;
    bool prev_alnum = false;
    bool first = true;
    std::vector<std::pair<size_t, size_t>> runs;  // byte ranges
    while (pos < len) {
      size_t used;
      const uint32_t cp = DecodeUtf8(text + pos, len - pos, &used);
      const bool cur = IsAlnum(cp);
      if (first) {
        prev_alnum = cur;
        first = false;
      } else if (cur != prev_alnum) {
        const size_t rl = pos - run_start;
        if (!(rl == 1 && text[run_start] == ' ' && run_start != 0)) {
          runs.emplace_back(run_start, pos);
        }
        run_start = pos;
        prev_alnum = cur;
      }
      pos += used;
    }
    if (len > 0) runs.emplace_back(run_start, len);

    std::string escaped;
    for (const auto& r : runs) {
      // Pass 2: escape this token.
      escaped.clear();
      size_t p = r.first;
      while (p < r.second) {
        size_t used;
        const uint32_t cp = DecodeUtf8(text + p, r.second - p, &used);
        if (cp == '\\') {
          escaped += "\\\\";
        } else if (cp == kEnd) {
          escaped += "\\u";
        } else if (cp != '\n' && alphabet.count(cp)) {
          escaped.append(text + p, used);
        } else {
          escaped += '\\';
          escaped += std::to_string(cp);
          escaped += ';';
        }
        p += used;
      }
      escaped += '_';

      // Pass 3: greedy longest-match segmentation.
      size_t q = 0;
      while (q < escaped.size()) {
        auto [id, mlen] = Longest(escaped, q);
        if (id >= 0) {
          out->push_back(id);
          q += mlen;
        } else {  // foreign char w.r.t. vocab: skip one UTF-8 char
          size_t used;
          DecodeUtf8(escaped.c_str() + q, escaped.size() - q, &used);
          q += used;
        }
      }
    }
  }
};

// ------------------------------------------------------------ token counts
// Vocab prep's other hot loop (SURVEY.md §3.5): tokenize every corpus line
// and count tokens. Same run-splitting rules as Encoder::EncodeText.
struct TokenCounter {
  std::vector<std::pair<uint32_t, uint32_t>> alnum_ranges;
  std::unordered_map<std::string, int64_t> counts;

  bool IsAlnum(uint32_t cp) const {
    size_t lo = 0, hi = alnum_ranges.size();
    while (lo < hi) {
      const size_t mid = (lo + hi) / 2;
      if (cp < alnum_ranges[mid].first) {
        hi = mid;
      } else if (cp > alnum_ranges[mid].second) {
        lo = mid + 1;
      } else {
        return true;
      }
    }
    return false;
  }

  void AddLine(const char* text, size_t len) {
    size_t pos = 0, run_start = 0;
    bool prev_alnum = false, first = true;
    auto flush = [&](size_t end) {
      const size_t rl = end - run_start;
      if (!(rl == 1 && text[run_start] == ' ' && run_start != 0)) {
        counts[std::string(text + run_start, rl)] += 1;
      }
    };
    while (pos < len) {
      size_t used;
      const uint32_t cp = DecodeUtf8(text + pos, len - pos, &used);
      const bool cur = IsAlnum(cp);
      if (first) {
        prev_alnum = cur;
        first = false;
      } else if (cur != prev_alnum) {
        flush(pos);
        run_start = pos;
        prev_alnum = cur;
      }
      pos += used;
    }
    if (len > 0) counts[std::string(text + run_start, len - run_start)] += 1;
  }
};

}  // namespace

extern "C" {

void* sse_counter_create(const uint32_t* ranges, int32_t n_ranges) {
  auto* c = new TokenCounter();
  c->alnum_ranges.reserve(n_ranges);
  for (int32_t i = 0; i < n_ranges; ++i) {
    c->alnum_ranges.emplace_back(ranges[2 * i], ranges[2 * i + 1]);
  }
  return c;
}

void sse_counter_destroy(void* c) { delete static_cast<TokenCounter*>(c); }

void sse_counter_add(void* c, const char* blob, const int64_t* offsets,
                     int32_t n) {
  auto* counter = static_cast<TokenCounter*>(c);
  for (int32_t i = 0; i < n; ++i) {
    counter->AddLine(blob + offsets[i],
                     static_cast<size_t>(offsets[i + 1] - offsets[i]));
  }
}

// Two-phase dump: sizes() reports (n_tokens, total_bytes); dump() fills
// caller-allocated buffers (concatenated token bytes, per-token byte
// lengths, per-token counts).
void sse_counter_sizes(void* c, int64_t* n_tokens, int64_t* total_bytes) {
  auto* counter = static_cast<TokenCounter*>(c);
  *n_tokens = static_cast<int64_t>(counter->counts.size());
  int64_t bytes = 0;
  for (const auto& kv : counter->counts) bytes += kv.first.size();
  *total_bytes = bytes;
}

void sse_counter_dump(void* c, char* blob_out, int32_t* lens_out,
                      int64_t* counts_out) {
  auto* counter = static_cast<TokenCounter*>(c);
  char* p = blob_out;
  int64_t i = 0;
  for (const auto& kv : counter->counts) {
    std::memcpy(p, kv.first.data(), kv.first.size());
    p += kv.first.size();
    lens_out[i] = static_cast<int32_t>(kv.first.size());
    counts_out[i] = kv.second;
    ++i;
  }
}

// blob: concatenated UTF-8 subtoken bytes; lens[i] = byte length of
// subtoken i (id = i + id_offset). ranges: 2*n_ranges uint32 lo/hi pairs
// of alphanumeric codepoint ranges (from Python's unicodedata, so both
// sides agree on the tokenizer's character classes).
void* sse_encoder_create(const char* blob, const int32_t* lens, int32_t n,
                         int32_t id_offset, const uint32_t* ranges,
                         int32_t n_ranges) {
  auto* enc = new Encoder();
  enc->trie.emplace_back();  // root
  const char* p = blob;
  for (int32_t i = 0; i < n; ++i) {
    enc->AddSubtoken(p, lens[i], i + id_offset);
    // single-char subtokens define the escape alphabet (subword.py ctor)
    size_t used;
    const uint32_t cp = DecodeUtf8(p, lens[i], &used);
    if (static_cast<int32_t>(used) == lens[i]) enc->alphabet.insert(cp);
    p += lens[i];
  }
  enc->alnum_ranges.reserve(n_ranges);
  for (int32_t i = 0; i < n_ranges; ++i) {
    enc->alnum_ranges.emplace_back(ranges[2 * i], ranges[2 * i + 1]);
  }
  return enc;
}

void sse_encoder_destroy(void* enc) { delete static_cast<Encoder*>(enc); }

// Encode one string; returns the number of ids (truncated to max_out).
int32_t sse_encode(void* enc, const char* text, int32_t text_len,
                   int32_t* out, int32_t max_out) {
  std::vector<int32_t> ids;
  static_cast<Encoder*>(enc)->EncodeText(text, text_len, &ids);
  const int32_t n = static_cast<int32_t>(
      ids.size() > static_cast<size_t>(max_out) ? max_out : ids.size());
  std::memcpy(out, ids.data(), n * sizeof(int32_t));
  return n;
}

// Batch encode with the data layer's padding convention: each row is
// truncated to max_len-1 ids, EOS-terminated, zero-padded (mirrors
// sse_tpu/data/corpus.py::_encode_line). offsets has n+1 entries into blob.
void sse_encode_batch(void* enc, const char* blob, const int64_t* offsets,
                      int32_t n, int32_t max_len, int32_t eos_id,
                      int32_t* out_tokens, int32_t* out_lengths) {
  auto* e = static_cast<Encoder*>(enc);
  std::vector<int32_t> ids;
  for (int32_t i = 0; i < n; ++i) {
    ids.clear();
    e->EncodeText(blob + offsets[i],
                  static_cast<size_t>(offsets[i + 1] - offsets[i]), &ids);
    int32_t m = static_cast<int32_t>(ids.size());
    if (m > max_len - 1) m = max_len - 1;
    int32_t* row = out_tokens + static_cast<int64_t>(i) * max_len;
    std::memcpy(row, ids.data(), m * sizeof(int32_t));
    row[m] = eos_id;
    for (int32_t j = m + 1; j < max_len; ++j) row[j] = 0;
    out_lengths[i] = m + 1;
  }
}

}  // extern "C"
