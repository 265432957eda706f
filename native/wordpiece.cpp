// WordPiece tokenizer — native C++ core for the data/serving pipeline.
//
// The reference's tokenization is delegated to HuggingFace's native (Rust)
// tokenizers via transformers (reference: utils/hf_models.py:52-75,
// main.py:136-190). This is the framework's own native equivalent: BERT
// basic tokenization (lowercase, accent stripping for the uncased vocabs,
// punctuation/CJK splitting) + greedy longest-match WordPiece, exposed as
// a small C ABI consumed through ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -o libwordpiece.so wordpiece.cpp
// (driven by transformer_quantization_tpu/utils/native.py, cached).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> token_to_id;
  int32_t unk_id = 100;   // [UNK]
  int32_t cls_id = 101;   // [CLS]
  int32_t sep_id = 102;   // [SEP]
  int32_t pad_id = 0;     // [PAD]
  bool lowercase = true;
  size_t max_chars_per_word = 100;
};

int32_t lookup(const Vocab& v, const std::string& s, int32_t fallback) {
  auto it = v.token_to_id.find(s);
  return it == v.token_to_id.end() ? fallback : it->second;
}

// --- UTF-8 iteration -------------------------------------------------------

// Decode one UTF-8 codepoint starting at i; advances i.
uint32_t next_cp(const std::string& s, size_t& i) {
  unsigned char c = s[i];
  uint32_t cp = 0;
  int extra = 0;
  if (c < 0x80) {
    cp = c;
  } else if ((c >> 5) == 0x6) {
    cp = c & 0x1F;
    extra = 1;
  } else if ((c >> 4) == 0xE) {
    cp = c & 0x0F;
    extra = 2;
  } else if ((c >> 3) == 0x1E) {
    cp = c & 0x07;
    extra = 3;
  } else {
    ++i;
    return 0xFFFD;
  }
  ++i;
  for (int k = 0; k < extra && i < s.size(); ++k, ++i) {
    cp = (cp << 6) | (s[i] & 0x3F);
  }
  return cp;
}

void append_cp(std::string& out, uint32_t cp) {
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

bool is_whitespace(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == 0xA0 ||
         cp == 0x2009 || cp == 0x200A || cp == 0x2028 || cp == 0x3000;
}

bool is_control(uint32_t cp) {
  if (cp == '\t' || cp == '\n' || cp == '\r') return false;
  return cp < 0x20 || cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
         (cp >= 0x200B && cp <= 0x200F) || cp == 0xFEFF;
}

bool is_ascii_punct(uint32_t cp) {
  return (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
         (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126);
}

bool is_unicode_punct(uint32_t cp) {
  // General punctuation / dashes / quotes blocks (covers the uncased-vocab
  // text that actually occurs in GLUE)
  return is_ascii_punct(cp) || (cp >= 0x2000 && cp <= 0x206F) ||
         (cp >= 0x3000 && cp <= 0x303F) || cp == 0x2018 || cp == 0x2019 ||
         cp == 0x201C || cp == 0x201D;
}

bool is_cjk(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0xF900 && cp <= 0xFAFF);
}

// Minimal NFD accent stripping for Latin-1/Latin-Extended (the cases the
// uncased English vocab hits): map accented letters to their base letter.
uint32_t strip_accent(uint32_t cp) {
  static const struct { uint32_t lo, hi; char base; } kMap[] = {
      {0xC0, 0xC5, 'a'}, {0xC8, 0xCB, 'e'}, {0xCC, 0xCF, 'i'},
      {0xD2, 0xD6, 'o'}, {0xD9, 0xDC, 'u'}, {0xE0, 0xE5, 'a'},
      {0xE8, 0xEB, 'e'}, {0xEC, 0xEF, 'i'}, {0xF2, 0xF6, 'o'},
      {0xF9, 0xFC, 'u'}, {0xC7, 0xC7, 'c'}, {0xE7, 0xE7, 'c'},
      {0xD1, 0xD1, 'n'}, {0xF1, 0xF1, 'n'}, {0xDD, 0xDD, 'y'},
      {0xFD, 0xFD, 'y'}, {0xFF, 0xFF, 'y'},
  };
  for (const auto& m : kMap) {
    if (cp >= m.lo && cp <= m.hi) return static_cast<uint32_t>(m.base);
  }
  return cp;
}

uint32_t to_lower(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 32;
  if (cp >= 0xC0 && cp <= 0xDE && cp != 0xD7) return cp + 32;
  return cp;
}

// Basic tokenization: clean, lowercase, split on whitespace/punct/CJK.
std::vector<std::string> basic_tokenize(const Vocab& v,
                                        const std::string& text) {
  std::vector<std::string> words;
  std::string cur;
  size_t i = 0;
  auto flush = [&]() {
    if (!cur.empty()) {
      words.push_back(cur);
      cur.clear();
    }
  };
  while (i < text.size()) {
    uint32_t cp = next_cp(text, i);
    if (cp == 0 || cp == 0xFFFD || is_control(cp)) continue;
    if (v.lowercase) cp = strip_accent(to_lower(cp));
    if (is_whitespace(cp)) {
      flush();
    } else if (is_unicode_punct(cp) || is_cjk(cp)) {
      flush();
      std::string one;
      append_cp(one, cp);
      words.push_back(one);
    } else {
      append_cp(cur, cp);
    }
  }
  flush();
  return words;
}

// Greedy longest-match WordPiece on one basic token.
void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>* out) {
  // count codepoints
  size_t ncp = 0;
  for (size_t i = 0; i < word.size();) {
    next_cp(word, i);
    ++ncp;
  }
  if (ncp > v.max_chars_per_word) {
    out->push_back(v.unk_id);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur_id = -1;
    while (end > start) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      int32_t id = lookup(v, sub, -1);
      if (id >= 0) {
        cur_id = id;
        break;
      }
      // step back one full codepoint
      do {
        --end;
      } while (end > start && (word[end] & 0xC0) == 0x80);
    }
    if (cur_id < 0) {
      out->push_back(v.unk_id);
      return;
    }
    pieces.push_back(cur_id);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

void encode_one(const Vocab& v, const std::string& text,
                std::vector<int32_t>* out) {
  for (const auto& w : basic_tokenize(v, text)) wordpiece(v, w, out);
}

}  // namespace

extern "C" {

void* wp_load(const char* vocab_path, int lowercase) {
  std::ifstream f(vocab_path);
  if (!f.good()) return nullptr;
  auto* v = new Vocab();
  v->lowercase = lowercase != 0;
  std::string line;
  int32_t id = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    v->token_to_id.emplace(line, id++);
  }
  v->unk_id = lookup(*v, "[UNK]", 100);
  v->cls_id = lookup(*v, "[CLS]", 101);
  v->sep_id = lookup(*v, "[SEP]", 102);
  v->pad_id = lookup(*v, "[PAD]", 0);
  return v;
}

void wp_free(void* handle) { delete static_cast<Vocab*>(handle); }

int wp_vocab_size(void* handle) {
  return static_cast<int>(static_cast<Vocab*>(handle)->token_to_id.size());
}

// Encode a (possibly paired) example into fixed-length buffers:
// [CLS] a [SEP] (b [SEP]) with truncation to max_len, zero-padded.
// Returns the unpadded length.
int wp_encode_pair(void* handle, const char* a, const char* b, int max_len,
                   int32_t* out_ids, int32_t* out_types, int32_t* out_mask) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> ia, ib;
  encode_one(v, a, &ia);
  if (b != nullptr && b[0] != '\0') encode_one(v, b, &ib);

  // HF 'longest_first' truncation: drop from the longer segment
  size_t special = ib.empty() ? 2 : 3;
  while (ia.size() + ib.size() + special > static_cast<size_t>(max_len)) {
    if (ia.size() >= ib.size() && !ia.empty()) {
      ia.pop_back();
    } else if (!ib.empty()) {
      ib.pop_back();
    } else {
      break;
    }
  }
  int n = 0;
  auto put = [&](int32_t id, int32_t type) {
    out_ids[n] = id;
    out_types[n] = type;
    out_mask[n] = 1;
    ++n;
  };
  put(v.cls_id, 0);
  for (int32_t t : ia) put(t, 0);
  put(v.sep_id, 0);
  if (!ib.empty() || (b != nullptr && b[0] != '\0')) {
    for (int32_t t : ib) put(t, 1);
    put(v.sep_id, 1);
  }
  for (int i = n; i < max_len; ++i) {
    out_ids[i] = v.pad_id;
    out_types[i] = 0;
    out_mask[i] = 0;
  }
  return n;
}

// Batched variant: texts are \x1e-separated; pairs via \x1f between a and b.
int wp_encode_batch(void* handle, const char* packed, int n_examples,
                    int max_len, int32_t* out_ids, int32_t* out_types,
                    int32_t* out_mask) {
  const char* p = packed;
  for (int e = 0; e < n_examples; ++e) {
    const char* rec_end = strchr(p, '\x1e');
    std::string rec = rec_end ? std::string(p, rec_end - p) : std::string(p);
    size_t sep = rec.find('\x1f');
    std::string a = sep == std::string::npos ? rec : rec.substr(0, sep);
    std::string b = sep == std::string::npos ? "" : rec.substr(sep + 1);
    wp_encode_pair(handle, a.c_str(), b.empty() ? nullptr : b.c_str(),
                   max_len, out_ids + e * max_len, out_types + e * max_len,
                   out_mask + e * max_len);
    if (!rec_end) break;
    p = rec_end + 1;
  }
  return 0;
}

}  // extern "C"
