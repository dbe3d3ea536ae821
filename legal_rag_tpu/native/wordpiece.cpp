// C++ WordPiece tokenizer — native hot loop for host-side tokenization.
//
// The reference gets tokenization from HF `tokenizers` (Rust) via
// sentence-transformers; Rust is unavailable in this toolchain, so the
// framework ships this C++ implementation (loaded via ctypes, see
// legal_rag_tpu/native_ext.py) with the pure-Python tokenizer in
// models/wordpiece.py as the portable fallback. Behavior parity with
// the Python implementation is pinned by tests/test_native.py over the
// real legal corpus.
//
// Pipeline (BERT "basic" + WordPiece, matching models/wordpiece.py):
//   1. UTF-8 decode; drop control chars; space out CJK; normalize
//      whitespace.
//   2. Lowercase + strip Latin diacritics (NFD for the Latin-1 /
//      Latin-Extended-A range via table; this corpus is Latin-script).
//   3. Split punctuation into standalone tokens.
//   4. Greedy longest-match WordPiece with "##" continuations,
//      matching at codepoint boundaries; unmatchable words -> [UNK].
//
// Build: make -C legal_rag_tpu/native  (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> table;
    int32_t unk_id = 0;
    int32_t cls_id = 0;
    int32_t sep_id = 0;
    int32_t pad_id = 0;
};

// ---------------- UTF-8 ----------------

// Decode one codepoint; advances i. Invalid bytes yield U+FFFD.
uint32_t decode_utf8(const unsigned char* s, size_t len, size_t& i) {
    unsigned char c = s[i];
    if (c < 0x80) { i += 1; return c; }
    if ((c >> 5) == 0x6 && i + 1 < len) {
        uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
        i += 2; return cp;
    }
    if ((c >> 4) == 0xE && i + 2 < len) {
        uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6)
                      | (s[i + 2] & 0x3F);
        i += 3; return cp;
    }
    if ((c >> 3) == 0x1E && i + 3 < len) {
        uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12)
                      | ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
        i += 4; return cp;
    }
    i += 1;
    return 0xFFFD;
}

void append_utf8(std::string& out, uint32_t cp) {
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

// ---------------- character classes ----------------

bool is_whitespace(uint32_t cp) {
    switch (cp) {
        case ' ': case '\t': case '\n': case '\r':
        case 0xA0: case 0x1680: case 0x202F: case 0x205F: case 0x3000:
            return true;
        default:
            return (cp >= 0x2000 && cp <= 0x200A);
    }
}

bool is_control(uint32_t cp) {
    if (cp == '\t' || cp == '\n' || cp == '\r') return false;
    if (cp < 0x20 || cp == 0x7F) return true;
    if (cp >= 0x80 && cp <= 0x9F) return true;
    // common format (Cf) characters
    if (cp == 0xAD || cp == 0x200B || cp == 0x200C || cp == 0x200D ||
        cp == 0x200E || cp == 0x200F || cp == 0xFEFF) return true;
    if (cp >= 0x202A && cp <= 0x202E) return true;
    if (cp >= 0x2060 && cp <= 0x2064) return true;
    return false;
}

bool is_punctuation(uint32_t cp) {
    // ASCII ranges BERT always treats as punctuation
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) return true;
    // Latin-1 punctuation (category P*)
    switch (cp) {
        case 0xA1: case 0xA7: case 0xAB: case 0xB6: case 0xB7:
        case 0xBB: case 0xBF:
            return true;
        default: break;
    }
    // General punctuation block (P* members; excludes spaces/format)
    if (cp >= 0x2010 && cp <= 0x2027) return true;
    if (cp >= 0x2030 && cp <= 0x205E && !(cp >= 0x2044 && cp <= 0x2046))
        return (cp != 0x2052);
    // CJK punctuation + fullwidth forms commonly punctuation
    if (cp >= 0x3001 && cp <= 0x3003) return true;
    if (cp == 0x3008 || cp == 0x3009 || cp == 0x300A || cp == 0x300B ||
        cp == 0x300C || cp == 0x300D) return true;
    if (cp >= 0xFF01 && cp <= 0xFF0F) return true;
    if (cp >= 0xFF1A && cp <= 0xFF20) return true;
    if (cp >= 0xFF3B && cp <= 0xFF40) return true;
    if (cp >= 0xFF5B && cp <= 0xFF65) return true;
    return false;
}

bool is_cjk(uint32_t cp) {
    return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
           (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
           (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
           (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

// Lowercase + diacritic strip for Latin-1 supplement / Latin Ext-A.
// Returns 0 to drop the codepoint (combining marks).
uint32_t lower_strip(uint32_t cp) {
    if (cp >= 'A' && cp <= 'Z') return cp + 32;
    // combining marks (Mn) get dropped post-NFD; inputs may carry them
    if (cp >= 0x0300 && cp <= 0x036F) return 0;
    if (cp >= 0xC0 && cp <= 0xFF && cp != 0xD7 && cp != 0xF7) {
        uint32_t c = (cp >= 0xC0 && cp <= 0xDE) ? cp + 0x20 : cp;  // lowercase
        // strip accent to base letter
        if (c >= 0xE0 && c <= 0xE5) return 'a';
        if (c == 0xE7) return 'c';
        if (c >= 0xE8 && c <= 0xEB) return 'e';
        if (c >= 0xEC && c <= 0xEF) return 'i';
        if (c == 0xF1) return 'n';
        if ((c >= 0xF2 && c <= 0xF6) || c == 0xF8) return 'o';
        if (c >= 0xF9 && c <= 0xFC) return 'u';
        if (c == 0xFD || c == 0xFF) return 'y';
        return c;  // æ ð þ ß stay (NFD doesn't decompose them)
    }
    if (cp >= 0x100 && cp <= 0x17F) {
        // Latin Extended-A: lowercase via pairing, then strip to base
        uint32_t c = cp;
        if (cp <= 0x137 || (cp >= 0x14A && cp <= 0x177)) {
            if ((cp & 1) == 0) c = cp + 1;
        } else if (cp >= 0x139 && cp <= 0x148) {
            if ((cp & 1) == 1) c = cp + 1;
        } else if (cp >= 0x179 && cp <= 0x17E) {
            if ((cp & 1) == 1) c = cp + 1;
        } else if (cp == 0x178) {
            c = 0xFF;
        }
        // base letters for the canonical decomposables ONLY — stroked /
        // non-decomposing letters (đ ħ ı ĸ ŀ ł ŉ ŋ œ ŧ) keep their
        // lowercased form, matching NFD + Mn-strip semantics
        if (c >= 0x101 && c <= 0x105) return 'a';
        if (c >= 0x107 && c <= 0x10D) return 'c';
        if (c == 0x10F) return 'd';
        if (c >= 0x113 && c <= 0x11B) return 'e';
        if (c >= 0x11D && c <= 0x123) return 'g';
        if (c == 0x125) return 'h';
        if (c >= 0x129 && c <= 0x12F) return 'i';
        if (c == 0x135) return 'j';
        if (c == 0x137) return 'k';
        if (c == 0x13A || c == 0x13C || c == 0x13E) return 'l';
        if (c == 0x144 || c == 0x146 || c == 0x148) return 'n';
        if (c >= 0x14D && c <= 0x151) return 'o';
        if (c >= 0x155 && c <= 0x159) return 'r';
        if (c >= 0x15B && c <= 0x161) return 's';
        if (c == 0x163 || c == 0x165) return 't';
        if (c >= 0x169 && c <= 0x173) return 'u';
        if (c == 0x175) return 'w';
        if (c == 0x177 || c == 0xFF) return 'y';
        if (c >= 0x17A && c <= 0x17E) return 'z';
        return c;
    }
    return cp;
}

constexpr size_t kMaxWordChars = 200;

void wordpiece_word(const Vocab& v, const std::string& word,
                    std::vector<int32_t>& out) {
    // count codepoints; oversized words -> UNK (BERT rule)
    size_t cps = 0;
    for (size_t i = 0; i < word.size();) {
        size_t j = i;
        decode_utf8(reinterpret_cast<const unsigned char*>(word.data()),
                    word.size(), j);
        i = j;
        ++cps;
    }
    if (cps > kMaxWordChars) { out.push_back(v.unk_id); return; }

    // codepoint boundary offsets
    std::vector<size_t> bounds;
    for (size_t i = 0; i < word.size();) {
        bounds.push_back(i);
        size_t j = i;
        decode_utf8(reinterpret_cast<const unsigned char*>(word.data()),
                    word.size(), j);
        i = j;
    }
    bounds.push_back(word.size());

    std::vector<int32_t> pieces;
    size_t start = 0;  // index into bounds
    const size_t n = bounds.size() - 1;
    while (start < n) {
        size_t end = n;
        int32_t found = -1;
        while (start < end) {
            std::string sub;
            if (start > 0) sub = "##";
            sub.append(word, bounds[start], bounds[end] - bounds[start]);
            auto it = v.table.find(sub);
            if (it != v.table.end()) { found = it->second; break; }
            --end;
        }
        if (found < 0) { out.push_back(v.unk_id); return; }
        pieces.push_back(found);
        start = end;
    }
    out.insert(out.end(), pieces.begin(), pieces.end());
}

void tokenize_text(const Vocab& v, const char* text, size_t len,
                   std::vector<int32_t>& out) {
    const unsigned char* s = reinterpret_cast<const unsigned char*>(text);
    std::string word;
    auto flush_word = [&]() {
        if (!word.empty()) {
            wordpiece_word(v, word, out);
            word.clear();
        }
    };
    for (size_t i = 0; i < len;) {
        uint32_t cp = decode_utf8(s, len, i);
        if (cp == 0 || cp == 0xFFFD || is_control(cp)) continue;
        if (is_whitespace(cp)) { flush_word(); continue; }
        if (is_cjk(cp) || is_punctuation(cp)) {
            // standalone token (CJK chars and punctuation split off)
            flush_word();
            std::string one;
            append_utf8(one, cp);
            wordpiece_word(v, one, out);
            continue;
        }
        uint32_t lowered = lower_strip(cp);
        if (lowered == 0) continue;  // dropped combining mark
        append_utf8(word, lowered);
    }
    flush_word();
}

}  // namespace

extern "C" {

void* wp_create(const char** tokens, int32_t n, int32_t unk_id,
                int32_t cls_id, int32_t sep_id, int32_t pad_id) {
    auto* v = new Vocab();
    v->table.reserve(static_cast<size_t>(n) * 2);
    for (int32_t i = 0; i < n; ++i) {
        v->table.emplace(tokens[i], i);
    }
    v->unk_id = unk_id;
    v->cls_id = cls_id;
    v->sep_id = sep_id;
    v->pad_id = pad_id;
    return v;
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

// Encode one text. Returns number of ids written (<= max_out).
// add_special wraps with [CLS]/[SEP] and truncates to max_len total.
int32_t wp_encode(void* handle, const char* text, int32_t text_len,
                  int32_t* out_ids, int32_t max_out, int32_t add_special,
                  int32_t max_len) {
    const Vocab& v = *static_cast<Vocab*>(handle);
    std::vector<int32_t> ids;
    ids.reserve(256);
    tokenize_text(v, text, static_cast<size_t>(text_len), ids);

    std::vector<int32_t> final_ids;
    if (add_special) {
        size_t body = ids.size();
        size_t cap = max_len >= 2 ? static_cast<size_t>(max_len - 2) : 0;
        if (body > cap) body = cap;
        final_ids.reserve(body + 2);
        final_ids.push_back(v.cls_id);
        final_ids.insert(final_ids.end(), ids.begin(), ids.begin() + body);
        final_ids.push_back(v.sep_id);
    } else {
        size_t body = ids.size();
        if (static_cast<int32_t>(body) > max_len) body = max_len;
        final_ids.assign(ids.begin(), ids.begin() + body);
    }
    int32_t count = static_cast<int32_t>(final_ids.size());
    if (count > max_out) count = max_out;
    std::memcpy(out_ids, final_ids.data(), sizeof(int32_t) * count);
    return count;
}

}  // extern "C"
