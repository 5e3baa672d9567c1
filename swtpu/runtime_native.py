"""ctypes bindings for the C++ host runtime (csrc/swtpu_native.cpp), with
pure-NumPy fallbacks when the shared library isn't built.

Build: ``make -C csrc`` (attempted automatically once per process).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_LIB_PATH = _CSRC / "libswtpu_native.so"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    if not hasattr(lib, "sw_score_simd_batch1"):   # newest symbol
        # stale prebuilt library from before sw_fill existed: rebuild for
        # the NEXT process (the already-mapped handle can't be safely
        # swapped in-place) and fall back to NumPy in this one
        try:
            subprocess.run(["make", "-B", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
        return None
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    lp = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.sw_encode.restype = ctypes.c_long
    lib.sw_encode.argtypes = [ctypes.c_char_p, ctypes.c_long, i8p]
    lib.sw_reference_random.restype = None
    lib.sw_reference_random.argtypes = [ctypes.c_uint32, ctypes.c_long, i8p]
    lib.sw_traceback.restype = ctypes.c_long
    lib.sw_traceback.argtypes = [i8p, ctypes.c_long, ctypes.c_long,
                                 ctypes.c_long, lp, ctypes.c_long]
    lib.sw_alignment.restype = ctypes.c_long
    lib.sw_alignment.argtypes = [i8p, i8p, i8p, ctypes.c_long, ctypes.c_long,
                                 ctypes.c_long, i8p, i8p, ctypes.c_long]
    lib.sw_seqfile_scan.restype = ctypes.c_long
    lib.sw_seqfile_scan.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_long)]
    lib.sw_seqfile_read.restype = ctypes.c_long
    lib.sw_seqfile_read.argtypes = [ctypes.c_char_p, i8p, ctypes.c_long,
                                    lp, ctypes.c_long]
    lib.sw_seqfile_read_alpha.restype = ctypes.c_long
    lib.sw_seqfile_read_alpha.argtypes = [ctypes.c_char_p, i8p,
                                          ctypes.c_long, lp, ctypes.c_long,
                                          ctypes.c_char_p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.sw_fill.restype = ctypes.c_int32
    lib.sw_fill.argtypes = [i8p, i8p, ctypes.c_long, ctypes.c_long,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int,
                            ctypes.c_void_p, ctypes.c_int,
                            i32p, i8p, ctypes.POINTER(ctypes.c_long)]
    lib.sw_score_simd.restype = ctypes.c_int32
    lib.sw_score_simd.argtypes = [i8p, i8p, ctypes.c_long, ctypes.c_long,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_void_p, ctypes.c_int]
    lib.sw_score_simd_pos.restype = ctypes.c_int32
    lib.sw_score_simd_pos.argtypes = lib.sw_score_simd.argtypes + [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.sw_score_simd_batch.restype = None
    lib.sw_score_simd_batch.argtypes = [
        i8p, i8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, i32p, i32p, i32p]
    lib.sw_score_simd_batch1.restype = None
    lib.sw_score_simd_batch1.argtypes = lib.sw_score_simd_batch.argtypes
    _lib = lib
    return _lib


# int16 saturation guard for the striped SIMD tier: the largest reachable
# score (max positive sub-score * shorter side) must stay clear of 32767,
# where saturating adds would silently UNDERREPORT instead of overflowing.
SIMD_SCORE_CAP = 32000


_simd_probe = {"ok": None}


def _simd_supported() -> bool:
    """One-time functional probe: a library built without AVX2 (ARM,
    AVX-masked VMs) compiles sw_score_simd to a 'return INT32_MIN' stub —
    the plan selectors must learn that BEFORE routing a whole search
    there (review r4 finding: an ungated 'host-simd' plan would raise on
    every window)."""
    if _simd_probe["ok"] is None:
        lib = _load()
        if lib is None:
            return False
        a = np.zeros(4, np.int8)
        _simd_probe["ok"] = lib.sw_score_simd(
            a, a, 4, 4, 0, 3, -3, -2, 0, None, 4) != -(1 << 31)
    return _simd_probe["ok"]


def simd_shape_ok(m: int, n: int, scoring=None, sub=None) -> bool:
    """The pure-arithmetic half of `simd_eligible` — NO library load (a
    missing library would otherwise trigger a one-time make build), so
    dispatch can rule out problems that could never ride the SIMD tier
    before paying the probe: int16 score/penalty caps, negative gaps
    with the lazy-F `ge >= go` rule (the striped kernel's lazy-F loop
    only EXTENDS a propagated gap; with extension pricier than opening
    it would under-correct — review r4 finding, reproduced at
    gap_open=-1/gap_extend=-6)."""
    from .core.config import Scoring

    if scoring is None:
        scoring = Scoring()
    if m <= 0 or n <= 0:
        return False
    if sub is not None:
        sub32 = np.asarray(sub, np.int32)
        hi = max(int(sub32.max()), 1)
        lo = min(int(sub32.min()), 0)
    else:
        hi = max(int(scoring.match), 1)
        lo = min(int(scoring.mismatch), 0)
    if scoring.is_affine:
        go, ge = int(scoring.gap_open), int(scoring.gap_extend)
    else:
        go = ge = int(scoring.gap)
    return (hi * min(m, n) <= SIMD_SCORE_CAP and go < 0 and ge < 0
            and ge >= go and min(lo, go, ge) >= -SIMD_SCORE_CAP)


def simd_eligible(m: int, n: int, scoring=None, sub=None) -> bool:
    """Full gate for `score_simd` (no data needed): the shape/scoring
    arithmetic (`simd_shape_ok`) AND the library being present and
    functional (ISA probe)."""
    return simd_shape_ok(m, n, scoring, sub) and _simd_supported()


_simd_rate = {"gcups": None}


def measured_simd_gcups(m: int = 1056, n: int = 1056,
                        repeats: int = 3) -> Optional[float]:
    """One-time measured per-core rate of the striped SIMD fill on THIS
    host (min of ``repeats`` fills of an m x n random pair; ~0.2 ms each)
    — the crossover threshold against the device dispatch floor derives
    from this instead of a baked single-machine constant (VERDICT r4 #8).
    None when the SIMD tier is unavailable."""
    if _simd_rate["gcups"] is None:
        import time
        if not _simd_supported():
            return None
        rng = np.random.default_rng(0)
        a = rng.integers(0, 4, m).astype(np.int8)
        b = rng.integers(0, 4, n).astype(np.int8)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            got = score_simd(a, b)
            best = min(best, time.perf_counter() - t0)
        if got is None:
            return None
        _simd_rate["gcups"] = m * n / best / 1e9
    return _simd_rate["gcups"]


def simd_reject_reason(m: int, n: int, scoring=None, sub=None) -> str:
    """Human-readable reason `simd_eligible` (plus the coordinate caps
    the batch/position entry points add) rejects this problem — for the
    error raised when a caller FORCES plan='host-simd' on an ineligible
    config (ADVICE r4: a forced backend must fail loudly, not fall
    through)."""
    from .core.config import Scoring

    if scoring is None:
        scoring = Scoring()
    if _load() is None:
        return "native library not built (csrc/Makefile)"
    if not _simd_supported():
        return "native library built without AVX2 SIMD support"
    if m <= 0 or n <= 0:
        return f"empty operand (m={m}, n={n})"
    if m > 32767 or n > 32767:
        return (f"positions ride int16 lanes: m={m}, n={n} "
                "exceed 32767")
    if sub is not None:
        sub32 = np.asarray(sub, np.int32)
        hi = max(int(sub32.max()), 1)
        lo = min(int(sub32.min()), 0)
    else:
        hi = max(int(scoring.match), 1)
        lo = min(int(scoring.mismatch), 0)
    if scoring.is_affine:
        go, ge = int(scoring.gap_open), int(scoring.gap_extend)
    else:
        go = ge = int(scoring.gap)
    if hi * min(m, n) > SIMD_SCORE_CAP:
        return (f"max reachable score {hi}*{min(m, n)} exceeds the int16 "
                f"saturation cap {SIMD_SCORE_CAP}")
    if not (go < 0 and ge < 0):
        return f"gap costs must be negative (gap_open={go}, gap_extend={ge})"
    if ge < go:
        return (f"gap_extend ({ge}) more negative than gap_open ({go}): "
                "the lazy-F loop only extends propagated gaps")
    if min(lo, go, ge) < -SIMD_SCORE_CAP:
        return f"a penalty exceeds the int16 cap {-SIMD_SCORE_CAP}"
    return "input codes outside the kernel's [-3, nsym) range"


def score_simd(a: np.ndarray, b: np.ndarray, scoring=None,
               sub=None) -> Optional[int]:
    """Striped AVX2 score-only fill (csrc sw_score_simd; Farrar-style
    striped layout, 16-bit lanes) — measured 6.5-8.5 GCUPS on ONE host
    core, 50-60x the serial sw_fill tier, which makes it the fastest
    backend for score-only mid-size problems below the device dispatch
    floor (VERDICT r3 #6, the 8k-cells..6k^2 dead zone). Returns None
    when ineligible (library missing, score range over the int16 cap,
    non-negative gap costs, sentinel/out-of-range codes) — the caller
    falls back to the normal plan ladder. Score ONLY: no positions, no
    traceback (the -DSKIP_BACKTRACK mode, makefile:9)."""
    from .core.config import Scoring

    if scoring is None:
        scoring = Scoring()
    lib = _load()
    if lib is None:
        return None
    if len(a) == 0 or len(b) == 0:
        return 0
    if not simd_eligible(len(a), len(b), scoring, sub):
        return None
    a = np.ascontiguousarray(a, np.int8)
    b = np.ascontiguousarray(b, np.int8)
    sub_ptr, nsym = None, 4            # DNA match/mismatch codes default
    if sub is not None:
        sub32 = np.ascontiguousarray(sub, np.int32)
        nsym = sub32.shape[0]
        if sub32.shape != (nsym, nsym):
            return None
        sub_ptr = sub32.ctypes.data_as(ctypes.c_void_p)
    if not _codes_ok(a, nsym):        # a-codes select profile rows
        return None
    if scoring.is_affine:
        args = (1, int(scoring.match), int(scoring.mismatch),
                int(scoring.gap_open), int(scoring.gap_extend))
    else:
        args = (0, int(scoring.match), int(scoring.mismatch),
                int(scoring.gap), 0)
    got = lib.sw_score_simd(a, b, len(a), len(b), *args, sub_ptr, nsym)
    return None if got == -(1 << 31) else int(got)


def _simd_args(scoring, sub):
    """(affine, match, mismatch, go, ge, sub_ptr, nsym, keepalive)."""
    sub_ptr, nsym, keep = None, 4, None
    if sub is not None:
        keep = np.ascontiguousarray(sub, np.int32)
        nsym = keep.shape[0]
        sub_ptr = keep.ctypes.data_as(ctypes.c_void_p)
    if scoring.is_affine:
        return (1, int(scoring.match), int(scoring.mismatch),
                int(scoring.gap_open), int(scoring.gap_extend),
                sub_ptr, nsym, keep)
    return (0, int(scoring.match), int(scoring.mismatch),
            int(scoring.gap), 0, sub_ptr, nsym, keep)


def _codes_ok(arr, nsym: int) -> bool:
    """a-codes must select a profile row: [-3, nsym). (-3..-1 are the
    framework's padding/unknown sentinels — the kernel scores them with
    oracle parity: raw-compare in match/mismatch mode, strong-negative in
    substitution mode. b-codes are unconstrained: the profile build
    handles any int8.)"""
    return int(arr.min()) >= -3 and int(arr.max()) < nsym


def score_simd_pos(a: np.ndarray, b: np.ndarray, scoring=None, sub=None):
    """Striped-SIMD fill WITH exact first-occurrence argmax and the
    bottom-right cell: (score, max_i, max_j, last_cell) — everything a
    score-only `align()` result needs — or None when ineligible.
    Coordinates are 1-based padded, bit-compatible with the oracle's
    row-major maxPos rule (i=j=0 when score <= 0)."""
    from .core.config import Scoring

    if scoring is None:
        scoring = Scoring()
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.int8)
    b = np.ascontiguousarray(b, np.int8)
    m, n = len(a), len(b)
    if m == 0 or n == 0 or m > 32767 or n > 32767:
        return None
    if not simd_eligible(m, n, scoring, sub):
        return None
    affine, ma, mi, go, ge, sub_ptr, nsym, _keep = _simd_args(scoring, sub)
    if not _codes_ok(a, nsym):
        return None
    oi = ctypes.c_int32(0)
    oj = ctypes.c_int32(0)
    ol = ctypes.c_int32(0)
    got = lib.sw_score_simd_pos(a, b, m, n, affine, ma, mi, go, ge,
                                sub_ptr, nsym, ctypes.byref(oi),
                                ctypes.byref(oj), ctypes.byref(ol))
    if got == -(1 << 31):
        return None
    return int(got), int(oi.value), int(oj.value), int(ol.value)


def score_simd_batch(a_batch: np.ndarray, b_batch: np.ndarray,
                     scoring=None, sub=None):
    """Batched striped-SIMD scoring WITH exact first-occurrence argmax:
    (scores, max_i, max_j) int32 (B,) arrays, 1-based padded coordinates
    matching the oracle's row-major maxPos rule — or None when
    ineligible. OpenMP-parallel across pairs in csrc (one core here;
    scales with cores elsewhere). This is `dist.batch.batch_score`'s
    host backend on non-TPU platforms: exact positions at multi-GCUPS
    per core instead of the vmapped-scan rate."""
    from .core.config import Scoring

    if scoring is None:
        scoring = Scoring()
    lib = _load()
    if lib is None:
        return None
    a_batch = np.ascontiguousarray(a_batch, np.int8)
    b_batch = np.ascontiguousarray(b_batch, np.int8)
    B, m = a_batch.shape
    n = b_batch.shape[1]
    if B == 0 or m == 0 or n == 0:
        return None
    if m > 32767 or n > 32767:          # coordinates ride int16 lanes
        return None
    if not simd_eligible(m, n, scoring, sub):
        return None
    affine, ma, mi, go, ge, sub_ptr, nsym, _keep = _simd_args(scoring, sub)
    if not _codes_ok(a_batch, nsym):
        return None
    scores = np.empty(B, np.int32)
    out_i = np.empty(B, np.int32)
    out_j = np.empty(B, np.int32)
    lib.sw_score_simd_batch(a_batch.reshape(-1), b_batch.reshape(-1),
                            B, m, n, affine, ma, mi, go, ge,
                            sub_ptr, nsym, scores, out_i, out_j)
    if (scores == -(1 << 31)).any():
        return None
    return scores, out_i, out_j


def score_simd_window(window: np.ndarray, reads: np.ndarray,
                      scoring=None, sub=None):
    """B striped reads vs ONE shared reference window (the database
    searcher's per-window shape): (scores, read_i, win_j) int32 (B,)
    arrays with exact first-occurrence positions, or None when
    ineligible. Reads may carry the -3 padding / -1 unknown sentinels
    (the kernel scores sentinels with oracle parity); the window's codes
    must lie in [-3, nsym)."""
    from .core.config import Scoring

    if scoring is None:
        scoring = Scoring()
    lib = _load()
    if lib is None:
        return None
    window = np.ascontiguousarray(window, np.int8)
    reads = np.ascontiguousarray(reads, np.int8)
    B, n = reads.shape
    m = len(window)
    if B == 0 or m == 0 or n == 0 or m > 32767 or n > 32767:
        return None
    if not simd_eligible(m, n, scoring, sub):
        return None
    affine, ma, mi, go, ge, sub_ptr, nsym, _keep = _simd_args(scoring, sub)
    if not _codes_ok(window, nsym):
        return None
    scores = np.empty(B, np.int32)
    out_i = np.empty(B, np.int32)
    out_j = np.empty(B, np.int32)
    lib.sw_score_simd_batch1(window, reads.reshape(-1), B, m, n,
                             affine, ma, mi, go, ge, sub_ptr, nsym,
                             scores, out_i, out_j)
    if (scores == -(1 << 31)).any():
        return None
    return scores, out_i, out_j


def available() -> bool:
    return _load() is not None


def encode(seq: str) -> np.ndarray:
    """Fast ASCII -> int8 codes; raises on invalid characters."""
    lib = _load()
    if lib is None:
        from .core.encode import encode as py_encode
        return py_encode(seq)
    raw = seq.encode()
    out = np.empty(len(raw), np.int8)
    r = lib.sw_encode(raw, len(raw), out)
    if r < 0:
        raise ValueError(f"invalid character {seq[~r]!r} at position {~r}")
    return out


def reference_random(length: int, seed: int = 1) -> np.ndarray:
    """Sequence identical to what a reference binary's generate() would
    produce with glibc (serial never seeds -> seed 1)."""
    lib = _load()
    out = np.empty(length, np.int8)
    if lib is None:
        from .core.encode import GlibcRand
        return GlibcRand(seed).reference_sequence(length)
    lib.sw_reference_random(seed, length, out)
    return out


def traceback(P: np.ndarray, max_pos: int) -> list[int]:
    """Native predecessor walk; equals oracle.backtrack."""
    lib = _load()
    if lib is None:
        from .core.oracle import backtrack
        return backtrack(P, max_pos)
    n1, m1 = P.shape
    path = np.empty(n1 + m1 + 2, np.int64)
    ln = lib.sw_traceback(np.ascontiguousarray(P), n1, m1, max_pos,
                          path, len(path))
    if ln < 0:
        raise ValueError("malformed predecessor matrix")
    return path[:ln].tolist()


def alignment_strings(a: np.ndarray, b: np.ndarray, P: np.ndarray,
                      max_pos: int, alphabet: str = "ACGT"):
    lib = _load()
    if lib is None:
        from .core.oracle import alignment_strings as py_align
        return py_align(a, b, P, max_pos, alphabet)
    n1, m1 = P.shape
    cap = n1 + m1 + 2
    oa = np.empty(cap, np.int8)
    ob = np.empty(cap, np.int8)
    ln = lib.sw_alignment(np.ascontiguousarray(P),
                          np.ascontiguousarray(a, dtype=np.int8),
                          np.ascontiguousarray(b, dtype=np.int8),
                          n1, m1, max_pos, oa, ob, cap)
    if ln < 0:
        raise ValueError("malformed predecessor matrix")

    def render(codes):
        return "".join("-" if c == -1 else alphabet[c]
                       for c in codes[:ln][::-1])
    return render(oa), render(ob)


def fill(a: np.ndarray, b: np.ndarray, scoring=None, sub=None):
    """Native serial DP fill — the reference's v0 tier as a host dispatch
    backend (serial_smithW.c:141-244 semantics; exact oracle parity incl.
    the Gotoh E_EXT/F_EXT state bits in affine mode). Returns an
    ``oracle.OracleResult``. Falls back to the NumPy oracle when the
    shared library isn't built. With ``sub``, codes must lie in
    [0, nsym) — the caller checks."""
    from .core.config import Scoring
    from .core.oracle import OracleResult, fill as py_fill

    if scoring is None:
        scoring = Scoring()
    lib = _load()
    if lib is None:
        return py_fill(a, b, scoring, sub)
    a = np.ascontiguousarray(a, np.int8)
    b = np.ascontiguousarray(b, np.int8)
    m, n = len(a), len(b)
    H = np.empty((n + 1, m + 1), np.int32)
    P = np.empty((n + 1, m + 1), np.int8)
    sub_ptr, nsym = None, 0
    sub32 = None
    if sub is not None:
        sub32 = np.ascontiguousarray(sub, np.int32)
        nsym = sub32.shape[0]
        sub_ptr = sub32.ctypes.data_as(ctypes.c_void_p)
    maxpos = ctypes.c_long(0)
    if scoring.is_affine:
        args = (1, int(scoring.match), int(scoring.mismatch),
                int(scoring.gap_open), int(scoring.gap_extend))
    else:
        args = (0, int(scoring.match), int(scoring.mismatch),
                int(scoring.gap), 0)
    score = lib.sw_fill(a, b, m, n, *args, sub_ptr, nsym, H, P,
                        ctypes.byref(maxpos))
    return OracleResult(H, P, int(maxpos.value), int(score))


def read_seqfile(path: str, alphabet: Optional[str] = None
                 ) -> list[np.ndarray]:
    """Parse FASTA/FASTQ into a list of int8 code arrays (native parser;
    no Python fallback — production IO is native by design). ``alphabet``
    maps characters to code indices (default ACGT); unknown characters
    encode as the -1 always-mismatch sentinel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable; run `make -C csrc`")
    total = ctypes.c_long(0)
    nseq = lib.sw_seqfile_scan(path.encode(), ctypes.byref(total))
    if nseq < 0:
        raise FileNotFoundError(path)
    codes = np.empty(max(1, total.value), np.int8)
    offsets = np.empty(max(1, nseq), np.int64)
    if alphabet is None:
        lib.sw_seqfile_read(path.encode(), codes, len(codes), offsets, nseq)
    else:
        lib.sw_seqfile_read_alpha(path.encode(), codes, len(codes),
                                  offsets, nseq, alphabet.encode())
    bounds = list(offsets[:nseq]) + [total.value]
    return [codes[bounds[i]:bounds[i + 1]].copy() for i in range(nseq)]


def _scan_records(path: str):
    """Yield (name, qual) per FASTA/FASTQ record, in file order — qual
    is None for FASTA records. ONE state machine behind `seq_names` and
    `seq_quals`. FASTQ records are consumed by line COUNT, never by
    first-character dispatch (quality strings legally contain '>' and
    '@'), and blank lines count as content INSIDE a record (a
    quality-trimmed empty read, or its empty quality line) while still
    being ignorable between records — mirroring the native reader, so
    an empty record cannot desynchronize the 4-line cycle."""
    with open(path, "rb") as f:
        fastq_state = 0
        name = ""
        for line in f:
            line = line.strip()
            if fastq_state:              # seq / '+' / qual of one record
                fastq_state -= 1
                if fastq_state == 0:
                    yield name, line.decode(errors="replace")
                continue
            if not line:
                continue
            if line[:1] == b">":
                yield (line[1:].split()[0].decode(errors="replace")
                       if len(line) > 1 else ""), None
            elif line[:1] == b"@":
                name = (line[1:].split()[0].decode(errors="replace")
                        if len(line) > 1 else "")
                fastq_state = 3
        if fastq_state:
            # truncated final record: the native reader counts it at its
            # header, so yield it (with an empty quality) to keep the
            # per-record lists aligned with read_seqfile's output
            yield name, ""


def seq_names(path: str) -> list[str]:
    """Record names (first whitespace-delimited token of each FASTA '>' /
    FASTQ '@' header), in file order — the companion of `read_seqfile`
    for name-carrying output like SAM. Header scanning is plain text
    handling, kept in Python; the sequence decode stays native."""
    return [n for n, _ in _scan_records(path)]


def seq_quals(path: str) -> list:
    """Per-record Phred quality strings for FASTQ records, None for
    FASTA records, in file order — the QUAL-column companion of
    `read_seqfile` for SAM output (the native reader decodes bases
    only; qualities are plain text handled here, like `seq_names`)."""
    return [q for _, q in _scan_records(path)]
