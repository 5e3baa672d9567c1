// swtpu native host runtime.
//
// The TPU compute path is JAX/Pallas; this library covers the host-side
// runtime the way the reference's C does: input generation
// (serial_smithW.c:334-361 — including bit-exact glibc rand() emulation so
// inputs match a reference binary byte for byte), the predecessor-matrix
// traceback walk (serial_smithW.c:262-277 — pointer chasing, poorly suited
// to NumPy), and a buffered FASTA/FASTQ reader + encoder (the data loader
// the reference lacks; production inputs are files, not rand()).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int8_t kGap = -1;

// ACGT -> 0..3, case-insensitive; anything else -> -1 (caller decides).
inline int8_t encode_base(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return -1;
  }
}

// glibc TYPE_3 additive-feedback rand(), bit-exact (see encode.py twin).
struct GlibcRand {
  std::vector<uint32_t> r;
  size_t idx;
  explicit GlibcRand(uint32_t seed) : r(344), idx(344) {
    if (seed == 0) seed = 1;
    r[0] = seed;
    for (int i = 1; i < 31; ++i) {
      int64_t hi = r[i - 1] / 127773;
      int64_t lo = r[i - 1] % 127773;
      int64_t word = 16807 * lo - 2836 * hi;
      if (word < 0) word += 2147483647;
      r[i] = static_cast<uint32_t>(word);
    }
    for (int i = 31; i < 34; ++i) r[i] = r[i - 31];
    for (int i = 34; i < 344; ++i) r[i] = r[i - 31] + r[i - 3];
  }
  uint32_t next() {
    uint32_t val = r[idx - 31] + r[idx - 3];
    r.push_back(val);
    ++idx;
    return val >> 1;
  }
};

}  // namespace

extern "C" {

// Encode an ASCII sequence into int8 codes. Returns len, or ~position of the
// first invalid character (bitwise-not, always negative).
long sw_encode(const char* seq, long len, int8_t* out) {
  for (long i = 0; i < len; ++i) {
    int8_t c = encode_base(seq[i]);
    if (c < 0) return ~i;
    out[i] = c;
  }
  return len;
}

// Reference-identical random sequence: glibc rand()%4 with the letter map
// 0:'A' 2:'C' 3:'G' else:'T' re-encoded to our ACGT codes {0,1,2,3}.
void sw_reference_random(uint32_t seed, long len, int8_t* out) {
  static const int8_t remap[4] = {0, 3, 1, 2};  // rand%4 -> ACGT code
  GlibcRand rng(seed);
  for (long i = 0; i < len; ++i) out[i] = remap[rng.next() % 4];
}

// Walk the predecessor matrix from max_pos; path indices written end-first.
// Mirrors the do-while semantics: the start cell (whose own predecessor is
// NONE) terminates the walk and is included. Returns path length, or ~steps
// on a malformed matrix (cycle guard).
long sw_traceback(const int8_t* P, long n1, long m1, long max_pos,
                  long* path, long cap) {
  const long total = n1 * m1;
  long pos = max_pos;
  long len = 0;
  while (len < cap) {
    if (pos < 0 || pos >= total) return ~len;
    path[len++] = pos;
    int8_t code = P[pos];
    long pred;
    if (code == 3) pred = pos - m1 - 1;        // DIAGONAL
    else if (code == 1) pred = pos - m1;       // UP
    else if (code == 2) pred = pos - 1;        // LEFT
    else break;                                 // NONE at the start cell
    if (pred < 0 || pred >= total) return ~len;
    if (P[pred] == 0) break;
    pos = pred;
  }
  return len;
}

// Serial DP fill — the reference's v0 tier (serial_smithW.c:141-244) as a
// native dispatch backend for tiny problems, where a device dispatch costs
// more than the whole fill. Exact oracle semantics: tie order
// DIAGONAL(3) > UP(1) > LEFT(2) > NONE(0) via strict '>' chains, zero
// floor, maxpos = FIRST row-major occurrence of the max (strict '>').
// affine != 0 adds Gotoh E/F lanes (gap_open/gap_extend; linear mode reads
// the gap penalty from gap_open) and ORs the E_EXT(4)/F_EXT(8)
// tie-prefers-extension state bits into P, matching the Python oracle's
// affine traceback contract. sub: optional nsym x nsym row-major table
// s(a_code, b_code) replacing the match/mismatch compare; caller
// guarantees codes in [0, nsym). H: (n+1)*(m+1) int32, P same in int8,
// both fully written here. Returns the max score; *out_maxpos gets the
// padded row-major index.
int32_t sw_fill(const int8_t* a, const int8_t* b, long m, long n,
                int affine, int match, int mismatch,
                int gap_open, int gap_extend,
                const int32_t* sub, int nsym,
                int32_t* H, int8_t* P, long* out_maxpos) {
  const long m1 = m + 1;
  const int32_t NEG = -(1 << 30);
  std::memset(H, 0, sizeof(int32_t) * m1 * (n + 1));
  std::memset(P, 0, sizeof(int8_t) * m1 * (n + 1));
  long maxpos = 0;
  int32_t maxscore = 0;
  if (!affine) {
    const int32_t gap = gap_open;
    for (long i = 1; i <= n; ++i) {
      const int32_t* Hup = H + (i - 1) * m1;
      int32_t* Hrow = H + i * m1;
      int8_t* Prow = P + i * m1;
      const int8_t bi = b[i - 1];
      for (long j = 1; j <= m; ++j) {
        const int32_t s =
            sub ? sub[static_cast<long>(a[j - 1]) * nsym + bi]
                : (a[j - 1] == bi ? match : mismatch);
        const int32_t diag = Hup[j - 1] + s;
        const int32_t up = Hup[j] + gap;
        const int32_t left = Hrow[j - 1] + gap;
        int32_t best = 0;
        int8_t pred = 0;
        if (diag > best) { best = diag; pred = 3; }
        if (up > best) { best = up; pred = 1; }
        if (left > best) { best = left; pred = 2; }
        Hrow[j] = best;
        Prow[j] = pred;
        if (best > maxscore) { maxscore = best; maxpos = i * m1 + j; }
      }
    }
  } else {
    // Rolling F row: Frow[j] holds F[i-1][j] entering row i. Boundary
    // per the oracle: F[0][j>=1] = NEG, F[*][0] = 0 (never read),
    // E[0][*] = 0 (never read), E[i>=1][0] = NEG.
    std::vector<int32_t> Frow(m1, NEG);
    for (long i = 1; i <= n; ++i) {
      const int32_t* Hup = H + (i - 1) * m1;
      int32_t* Hrow = H + i * m1;
      int8_t* Prow = P + i * m1;
      const int8_t bi = b[i - 1];
      int32_t e_prev = NEG;                    // E[i][j-1], starts at E[i][0]
      for (long j = 1; j <= m; ++j) {
        const int32_t s =
            sub ? sub[static_cast<long>(a[j - 1]) * nsym + bi]
                : (a[j - 1] == bi ? match : mismatch);
        const int32_t e_open = Hrow[j - 1] + gap_open;
        const int32_t e_ext = e_prev + gap_extend;
        const int32_t e = e_open > e_ext ? e_open : e_ext;
        const int32_t f_open = Hup[j] + gap_open;
        const int32_t f_ext = Frow[j] + gap_extend;
        const int32_t f = f_open > f_ext ? f_open : f_ext;
        const int32_t diag = Hup[j - 1] + s;
        int32_t best = 0;
        int8_t pred = 0;
        if (diag > best) { best = diag; pred = 3; }
        if (f > best) { best = f; pred = 1; }
        if (e > best) { best = e; pred = 2; }
        Hrow[j] = best;
        Prow[j] = static_cast<int8_t>(
            pred | (e == e_ext ? 4 : 0) | (f == f_ext ? 8 : 0));
        e_prev = e;
        Frow[j] = f;
        if (best > maxscore) { maxscore = best; maxpos = i * m1 + j; }
      }
    }
  }
  *out_maxpos = maxpos;
  return maxscore;
}

// Reconstruct the aligned code strings (kGap = -1 for gaps) from P.
// Returns alignment length; out arrays are written END-FIRST (caller
// reverses), sized at most n1 + m1.
long sw_alignment(const int8_t* P, const int8_t* a, const int8_t* b,
                  long n1, long m1, long max_pos,
                  int8_t* out_a, int8_t* out_b, long cap) {
  const long total = n1 * m1;
  long pos = max_pos;
  long len = 0;
  while (len < cap) {
    if (pos < 0 || pos >= total) return ~len;
    long i = pos / m1, j = pos % m1;
    int8_t code = P[pos];
    long pred;
    if (code == 3) { out_a[len] = a[j - 1]; out_b[len] = b[i - 1];
                     pred = pos - m1 - 1; }
    else if (code == 1) { out_a[len] = kGap; out_b[len] = b[i - 1];
                          pred = pos - m1; }
    else if (code == 2) { out_a[len] = a[j - 1]; out_b[len] = kGap;
                          pred = pos - 1; }
    else break;
    ++len;
    if (pred < 0 || pred >= total) return ~len;
    if (P[pred] == 0) break;
    pos = pred;
  }
  return len;
}

// --- FASTA / FASTQ reader ---------------------------------------------
//
// Two-call protocol: sw_seqfile_scan returns the sequence count and total
// encoded length; sw_seqfile_read fills caller-allocated code and offset
// buffers. Handles FASTA ('>' headers, multi-line sequences) and FASTQ
// ('@' records, quality lines skipped). Unknown bases encode as -1 -
// alignment treats them as always-mismatch sentinels.

// 256-entry code LUT from an alphabet string (case-insensitive); unknown
// characters -> -1 (always-mismatch sentinel). Null alphabet = ACGT.
static void build_lut(const char* alphabet, int8_t* lut) {
  for (int i = 0; i < 256; ++i) lut[i] = -1;
  if (!alphabet) alphabet = "ACGT";
  for (int i = 0; alphabet[i]; ++i) {
    unsigned char u = static_cast<unsigned char>(alphabet[i]);
    lut[u] = static_cast<int8_t>(i);
    if (u >= 'A' && u <= 'Z') lut[u + 32] = static_cast<int8_t>(i);
    else if (u >= 'a' && u <= 'z') lut[u - 32] = static_cast<int8_t>(i);
  }
}

static long scan_or_read(const char* path, int8_t* codes, long codes_cap,
                         long* offsets, long offsets_cap,
                         long* total_out, const int8_t* lut = nullptr) {
  int8_t dna_lut[256];
  if (!lut) { build_lut(nullptr, dna_lut); lut = dna_lut; }
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string line;
  line.reserve(1 << 16);
  char buf[1 << 16];
  long nseq = 0, total = 0;
  bool fastq = false, in_seq = false;
  int fastq_line = 0;
  while (std::fgets(buf, sizeof(buf), f)) {
    size_t blen = std::strlen(buf);
    bool eol = blen && buf[blen - 1] == '\n';
    if (eol) buf[--blen] = 0;
    if (blen && buf[blen - 1] == '\r') buf[--blen] = 0;
    line.assign(buf, blen);
    // continuation of an overlong line: treat as same logical line — the
    // parser below only dispatches on the first character of logical
    // lines, so feed content directly when mid-sequence.
    if (line.empty()) {
      // blank lines BETWEEN records are ignorable, but inside a FASTQ
      // record they are content (a quality-trimmed empty read, or its
      // empty quality line) — skipping them would desynchronize the
      // 4-line state machine and swallow the next record's header
      if (fastq && fastq_line == 1) fastq_line = 2;       // empty seq
      else if (fastq && fastq_line == 2) fastq_line = 3;  // malformed '+'
      else if (fastq && fastq_line == 3) fastq_line = 0;  // empty qual
      continue;
    }
    char c0 = line[0];
    if (!fastq && c0 == '@' && nseq == 0 && !in_seq) fastq = true;
    if (fastq) {
      if (fastq_line == 0 && c0 == '@') { fastq_line = 1; ++nseq;
        if (offsets && nseq <= offsets_cap) offsets[nseq - 1] = total;
        continue; }
      if (fastq_line == 1) {           // sequence line
        for (char ch : line) {
          if (codes && total < codes_cap) codes[total] = lut[static_cast<unsigned char>(ch)];
          ++total;
        }
        fastq_line = 2; continue;
      }
      if (fastq_line == 2) { fastq_line = 3; continue; }   // '+' line
      if (fastq_line == 3) { fastq_line = 0; continue; }   // quality line
      continue;
    }
    if (c0 == '>') {
      ++nseq; in_seq = true;
      if (offsets && nseq <= offsets_cap) offsets[nseq - 1] = total;
      continue;
    }
    if (in_seq) {
      for (char ch : line) {
        if (codes && total < codes_cap) codes[total] = lut[static_cast<unsigned char>(ch)];
        ++total;
      }
    }
  }
  std::fclose(f);
  if (total_out) *total_out = total;
  return nseq;
}

long sw_seqfile_scan(const char* path, long* total_out) {
  return scan_or_read(path, nullptr, 0, nullptr, 0, total_out);
}

long sw_seqfile_read(const char* path, int8_t* codes, long codes_cap,
                     long* offsets, long offsets_cap) {
  long total = 0;
  return scan_or_read(path, codes, codes_cap, offsets, offsets_cap, &total);
}

// Alphabet-parameterized variant (e.g. the 21-letter protein alphabet):
// codes are indices into `alphabet`, case-insensitive, unknown -> -1.
long sw_seqfile_read_alpha(const char* path, int8_t* codes, long codes_cap,
                           long* offsets, long offsets_cap,
                           const char* alphabet) {
  int8_t lut[256];
  build_lut(alphabet, lut);
  long total = 0;
  return scan_or_read(path, codes, codes_cap, offsets, offsets_cap, &total,
                      lut);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Striped SIMD score-only fill (the host tier's answer to the mid-size
// dead zone, VERDICT r3 #6). Farrar's striped layout (Bioinformatics 2007)
// re-derived for AVX2 16-bit lanes: the query (b, the row sequence) is
// striped across the register — element (seg, lane) is query position
// lane*V + seg with V = ceil(n/16) segments — so the F (vertical-gap)
// dependency is resolved lazily per column instead of serializing every
// cell, exactly the dependency the TPU stripe kernel resolves with its
// systolic roll. The reference's closest rung is the 44-thread OpenMP
// wavefront (omp_smithW-v1-refinedOrig.cpp:206-221, 0.41 GCUPS); this
// single core measures multi-GCUPS (see DESIGN.md host-tier table).
//
// Score only (no H/P capture, no positions) — the -DSKIP_BACKTRACK mode
// (makefile:9) of the host tier; engine.score() routes here below the
// device dispatch floor. Exact Gotoh semantics, validated by fuzz vs the
// oracle (tests/test_native.py). Caller guarantees: codes in [0, A),
// positive gap costs, and max |score| * min(m, n) within int16 headroom.

#if defined(__AVX2__)
#include <immintrin.h>

namespace {

// shift the 16 int16 elements one lane up (el k <- el k-1), insert at 0
static inline __m256i shl1_epi16_ins(__m256i v, int16_t ins) {
  const __m256i lo_to_hi = _mm256_permute2x128_si256(v, v, 0x08);
  __m256i s = _mm256_alignr_epi8(v, lo_to_hi, 14);
  return _mm256_insert_epi16(s, ins, 0);
}

static inline int16_t hmax_epi16(__m256i v) {
  __m128i x = _mm_max_epi16(_mm256_castsi256_si128(v),
                            _mm256_extracti128_si256(v, 1));
  x = _mm_max_epi16(x, _mm_srli_si128(x, 8));
  x = _mm_max_epi16(x, _mm_srli_si128(x, 4));
  x = _mm_max_epi16(x, _mm_srli_si128(x, 2));
  return static_cast<int16_t>(_mm_cvtsi128_si32(x));
}

}  // namespace
#endif  // __AVX2__

extern "C" int32_t sw_score_simd(const int8_t* a, const int8_t* b,
                                 long m, long n, int affine,
                                 int match, int mismatch,
                                 int gap_open, int gap_extend,
                                 const int32_t* sub, int nsym) {
#if !defined(__AVX2__)
  (void)a; (void)b; (void)m; (void)n; (void)affine; (void)match;
  (void)mismatch; (void)gap_open; (void)gap_extend; (void)sub; (void)nsym;
  return INT32_MIN;  // unsupported build; caller falls back
#else
  constexpr int LANES16 = 16;
  constexpr int16_t PADMIN = -30000;   // query-padding profile score
  const long V = (n + LANES16 - 1) / LANES16;
  const int A = sub ? nsym : 4;        // DNA codes 0..3 in m/m mode
  const int16_t go = static_cast<int16_t>(-gap_open);
  const int16_t ge = static_cast<int16_t>(affine ? -gap_extend : -gap_open);
  if (go < 0 || ge < 0) return INT32_MIN;

  // striped query profile: prof[s][seg][lane] = score(s, b[lane*V + seg])
  std::vector<__m256i> prof(static_cast<size_t>(A) * V);
  {
    alignas(32) int16_t row[LANES16];
    for (int s = 0; s < A; ++s) {
      for (long seg = 0; seg < V; ++seg) {
        for (int lane = 0; lane < LANES16; ++lane) {
          const long pos = static_cast<long>(lane) * V + seg;
          row[lane] = pos < n
              ? static_cast<int16_t>(
                    sub ? sub[static_cast<long>(s) * nsym + b[pos]]
                        : (s == b[pos] ? match : mismatch))
              : PADMIN;
        }
        prof[static_cast<size_t>(s) * V + seg] =
            _mm256_load_si256(reinterpret_cast<const __m256i*>(row));
      }
    }
  }

  const __m256i vZero = _mm256_setzero_si256();
  const __m256i vMin = _mm256_set1_epi16(INT16_MIN);
  const __m256i vGo = _mm256_set1_epi16(go);
  const __m256i vGe = _mm256_set1_epi16(ge);
  std::vector<__m256i> hbuf(2 * V, vZero);       // H ping-pong
  std::vector<__m256i> ebuf(V, vMin);            // E per segment
  __m256i* vHStore = hbuf.data();
  __m256i* vHLoad = hbuf.data() + V;
  __m256i* vE = ebuf.data();
  __m256i vMax = vZero;

  for (long j = 0; j < m; ++j) {
    const __m256i* vP = prof.data() + static_cast<size_t>(a[j]) * V;
    // diag operand for segment 0 = previous column's last segment,
    // shifted one lane up; lane 0 sees the zero boundary H(., 0)
    __m256i vH = shl1_epi16_ins(vHStore[V - 1], 0);
    std::swap(vHStore, vHLoad);
    __m256i vF = vMin;
    for (long seg = 0; seg < V; ++seg) {
      vH = _mm256_adds_epi16(vH, vP[seg]);       // diag + s(a_j, b_i)
      vH = _mm256_max_epi16(vH, vE[seg]);
      vH = _mm256_max_epi16(vH, vF);
      vH = _mm256_max_epi16(vH, vZero);          // local zero floor
      vMax = _mm256_max_epi16(vMax, vH);
      vHStore[seg] = vH;
      const __m256i vHgo = _mm256_subs_epi16(vH, vGo);
      vE[seg] = _mm256_max_epi16(_mm256_subs_epi16(vE[seg], vGe), vHgo);
      vF = _mm256_max_epi16(_mm256_subs_epi16(vF, vGe), vHgo);
      vH = vHLoad[seg];                          // next segment's diag
    }
    // lazy F: propagate the vertical gap across stripe wrap-arounds until
    // it can no longer beat gap-open from the (corrected) H anywhere.
    // Corrections also refresh E (next column's horizontal opens) and the
    // running max — a corrected cell can be the global max.
    vF = shl1_epi16_ins(vF, INT16_MIN);
    long seg = 0;
    while (_mm256_movemask_epi8(_mm256_cmpgt_epi16(
        vF, _mm256_subs_epi16(vHStore[seg], vGo)))) {
      const __m256i vHn = _mm256_max_epi16(vHStore[seg], vF);
      vHStore[seg] = vHn;
      vMax = _mm256_max_epi16(vMax, vHn);
      vE[seg] = _mm256_max_epi16(vE[seg], _mm256_subs_epi16(vHn, vGo));
      vF = _mm256_subs_epi16(vF, vGe);
      if (++seg == V) {
        seg = 0;
        vF = shl1_epi16_ins(vF, INT16_MIN);
      }
    }
  }
  return static_cast<int32_t>(hmax_epi16(vMax));
#endif  // __AVX2__
}
