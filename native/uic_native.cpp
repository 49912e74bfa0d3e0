// Native helpers for the TPU-native unpaired-captioning framework.
//
// The reference delegates these to external runtimes the repo doesn't even
// contain (SURVEY.md §2.9): Stanford CoreNLP PTBTokenizer + METEOR-1.5 Java
// jars invoked as subprocesses (coco-caption/pycocoevalcap/tokenizer/
// ptbtokenizer.py:28-30, meteor/meteor.py:18-24), multi-bleu.perl
// (OpenNMT evaluation.py:29-48), and a Cython kernel for the word-cloud
// layout (scripts/word_cloud/wordcloud/query_integral_image.pyx:1-34).
// Here they are a single C++ shared library with a plain C ABI consumed via
// ctypes (unpaired_image_captioning_tpu/native.py), with pure-Python
// fallbacks for environments without a toolchain.
//
// Build: make -C native   ->  native/libuic_native.so

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PTB tokenizer (coco-caption flavor)
// ---------------------------------------------------------------------------
// Matches the PTBTokenizer invocation used by coco-caption: tokenize on
// punctuation/whitespace, lowercase, and DROP the punctuation tokens the
// COCO wrapper removes before scoring.
// Behavior points mirrored from the Stanford tokenizer as exercised by
// captions (no SGML, no fancy quotes): contractions split ("don't" ->
// "do n't", "man's" -> "man 's"), hyphens kept inside words, standalone
// punctuation dropped per the coco PUNCTUATIONS list.

static bool is_coco_punct(const std::string& tok) {
    static const char* P[] = {"''", "'", "``", "`", "-LRB-", "-RRB-",
                              "-LCB-", "-RCB-", ".", "?", "!", ",", ":",
                              "-", "--", "...", ";"};
    for (const char* p : P) {
        if (tok == p) return true;
    }
    return false;
}

static void flush_token(std::vector<std::string>* out, std::string* cur) {
    if (cur->empty()) return;
    std::string t;
    t.reserve(cur->size());
    for (char c : *cur) t.push_back(std::tolower((unsigned char)c));
    if (!is_coco_punct(t)) out->push_back(t);
    cur->clear();
}

// tokenizes `text`; writes space-joined tokens into out (cap bytes incl NUL).
// returns the number of bytes written (excluding NUL), or -1 if out too small.
int ptb_tokenize(const char* text, char* out, int cap) {
    std::vector<std::string> toks;
    std::string cur;
    size_t n = std::strlen(text);
    for (size_t i = 0; i < n; i++) {
        unsigned char c = text[i];
        if (std::isspace(c)) {
            flush_token(&toks, &cur);
            continue;
        }
        if (c == '\'') {
            // contraction handling: "n't" stays with the 't ("do n't"),
            // otherwise split "'s" / "'re" / ... as their own token
            if (!cur.empty() && i + 1 < n && std::isalpha((unsigned char)text[i + 1])) {
                if (cur.size() >= 1 &&
                    (cur.back() == 'n' || cur.back() == 'N') &&
                    (text[i + 1] == 't' || text[i + 1] == 'T') &&
                    (i + 2 >= n || !std::isalnum((unsigned char)text[i + 2]))) {
                    cur.pop_back();
                    flush_token(&toks, &cur);
                    cur = "n't";
                    i += 1;
                    flush_token(&toks, &cur);
                    continue;
                }
                flush_token(&toks, &cur);
                cur.push_back('\'');
                continue;
            }
            flush_token(&toks, &cur);
            cur.push_back(c);
            flush_token(&toks, &cur);
            continue;
        }
        if (std::isalnum(c) || ((c == '-' || c == '.') && !cur.empty() && i + 1 < n &&
                                std::isalnum((unsigned char)text[i + 1]) &&
                                std::isalnum((unsigned char)cur.back())) ||
            c >= 0x80 /* keep UTF-8 multibyte sequences intact */) {
            cur.push_back((char)c);
            continue;
        }
        // punctuation: flush current, emit punct as its own token
        flush_token(&toks, &cur);
        cur.push_back((char)c);
        // join runs of the same punct (e.g. "...")
        while (i + 1 < n && text[i + 1] == (char)c) {
            cur.push_back(text[++i]);
        }
        flush_token(&toks, &cur);
    }
    flush_token(&toks, &cur);

    std::string joined;
    for (size_t i = 0; i < toks.size(); i++) {
        if (i) joined.push_back(' ');
        joined += toks[i];
    }
    if ((int)joined.size() + 1 > cap) return -1;
    std::memcpy(out, joined.c_str(), joined.size() + 1);
    return (int)joined.size();
}

// ---------------------------------------------------------------------------
// Corpus BLEU counting kernel (multi-bleu.perl semantics)
// ---------------------------------------------------------------------------
// hyp: token ids [hyp_len]; refs: flattened ids with per-ref offsets.
// Writes clipped[n] and total[n] for n = 1..4 and the closest ref length.
void bleu_counts(const int32_t* hyp, int hyp_len, const int32_t* refs,
                 const int32_t* ref_offsets, int n_refs,
                 int64_t* clipped, int64_t* total, int32_t* closest_len) {
    // closest reference length (ties -> shorter)
    int best = -1;
    for (int r = 0; r < n_refs; r++) {
        int rl = ref_offsets[r + 1] - ref_offsets[r];
        if (best < 0 || std::abs(rl - hyp_len) < std::abs(best - hyp_len) ||
            (std::abs(rl - hyp_len) == std::abs(best - hyp_len) && rl < best)) {
            best = rl;
        }
    }
    *closest_len = best < 0 ? 0 : best;

    for (int n = 1; n <= 4; n++) {
        std::map<std::vector<int32_t>, int> hyp_counts, ref_max;
        for (int i = 0; i + n <= hyp_len; i++) {
            hyp_counts[std::vector<int32_t>(hyp + i, hyp + i + n)]++;
        }
        for (int r = 0; r < n_refs; r++) {
            std::map<std::vector<int32_t>, int> rc;
            const int32_t* rs = refs + ref_offsets[r];
            int rl = ref_offsets[r + 1] - ref_offsets[r];
            for (int i = 0; i + n <= rl; i++) {
                rc[std::vector<int32_t>(rs + i, rs + i + n)]++;
            }
            for (auto& kv : rc) {
                int& m = ref_max[kv.first];
                m = std::max(m, kv.second);
            }
        }
        int64_t c = 0, t = 0;
        for (auto& kv : hyp_counts) {
            t += kv.second;
            auto it = ref_max.find(kv.first);
            if (it != ref_max.end()) c += std::min(kv.second, it->second);
        }
        clipped[n - 1] = c;
        total[n - 1] = t;
    }
}

// ---------------------------------------------------------------------------
// METEOR alignment kernel (exact-match stage on ids)
// ---------------------------------------------------------------------------
// Greedy left-to-right maximal matching; returns matches and chunk count.
void meteor_align(const int32_t* hyp, int hyp_len, const int32_t* ref,
                  int ref_len, int32_t* matches, int32_t* chunks) {
    std::vector<int> match_of(hyp_len, -1);
    std::vector<bool> used(ref_len, false);
    for (int i = 0; i < hyp_len; i++) {
        for (int j = 0; j < ref_len; j++) {
            if (!used[j] && hyp[i] == ref[j]) {
                used[j] = true;
                match_of[i] = j;
                break;
            }
        }
    }
    int m = 0, ch = 0, prev = -2;
    for (int i = 0; i < hyp_len; i++) {
        if (match_of[i] >= 0) {
            m++;
            if (match_of[i] != prev + 1) ch++;
            prev = match_of[i];
        } else {
            prev = -2;
        }
    }
    *matches = m;
    *chunks = ch;
}

// ---------------------------------------------------------------------------
// Word-cloud integral-image query
// ---------------------------------------------------------------------------
// Parity: scripts/word_cloud/wordcloud/query_integral_image.pyx:1-34 —
// count free positions where a size_x x size_y box fits (integral sum == 0),
// then return the random_state-th free position. integral: [h, w] uint32
// row-major. Returns 1 and writes (*out_x, *out_y) when found, else 0.
int query_integral_image(const uint32_t* integral, int h, int w,
                         int size_x, int size_y, int random_hit,
                         int* out_x, int* out_y) {
    int hits = 0;
    // pass 1: count
    for (int x = 0; x + size_x < h; x++) {
        for (int y = 0; y + size_y < w; y++) {
            uint64_t area = (uint64_t)integral[(x + size_x) * w + (y + size_y)]
                            + integral[x * w + y]
                            - integral[(x + size_x) * w + y]
                            - integral[x * w + (y + size_y)];
            if (area == 0) hits++;
        }
    }
    if (hits == 0) return 0;
    int goal = random_hit % hits;
    int seen = 0;
    for (int x = 0; x + size_x < h; x++) {
        for (int y = 0; y + size_y < w; y++) {
            uint64_t area = (uint64_t)integral[(x + size_x) * w + (y + size_y)]
                            + integral[x * w + y]
                            - integral[(x + size_x) * w + y]
                            - integral[x * w + (y + size_y)];
            if (area == 0) {
                if (seen == goal) {
                    *out_x = x;
                    *out_y = y;
                    return 1;
                }
                seen++;
            }
        }
    }
    return 0;
}

}  // extern "C"
