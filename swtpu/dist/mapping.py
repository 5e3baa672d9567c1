"""Read mapping as a library: arrays in, SAM-ready records out.

The full pipeline behind ``python -m swtpu map`` (the reference stops at
one pair per process with printf output, omp_smithW.c:99-101; this is
the production workload its database-search design points at): batched
both-strand top-2 device search -> optional proper-pair selection ->
host-tier hit re-alignment -> flag/mate/unmapped record assembly ->
optional coordinate sort. The CLI in ``swtpu/__main__.py`` is a thin
file-IO wrapper around `map_reads`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..core.config import Scoring
from .database import (HitAlignment, align_hits, concat_references,
                       locate_record, pad_queries, pair_hits, search)


class MapResult(NamedTuple):
    """`map_reads` output, shaped for `to_sam`."""

    records: list            # HitAlignment list (mates adjacent unless sorted)
    reads_all: list          # query list records index into (mate2 at +B)
    sq: Optional[list]       # [(name, len)] @SQ rows for multi-record refs
    so: str                  # SAM @HD sort order ('unknown'|'coordinate')


def _unmapped_rec(i: int, B: int, first: Optional[bool] = None,
                  mate: Optional[HitAlignment] = None) -> HitAlignment:
    """flag-4 record: ``first`` None = single-end (no pairing bits),
    True/False = mate 1/2; placed AT the mapped mate's coordinate when
    one exists (keeps the pair together under sorting)."""
    fe = 0
    if first is not None:
        fe = 0x1 | (0x40 if first else 0x80)
    kw = dict(ref_start=-1, ref_end=-1)
    if mate is not None:
        if mate.strand == "-":
            fe |= 0x20
        kw = dict(ref_start=mate.ref_start, ref_end=-1,
                  rname=mate.rname, rnext="=", pnext=mate.ref_start)
    elif first is not None:
        fe |= 0x8                        # both ends unmapped
    return HitAlignment(
        read=i if first in (None, True) else i + B, score=0,
        read_start=0, read_end=0, aligned_read="", aligned_ref="",
        cigar="*", is_unmapped=True, flag_extra=fe, **kw)


def map_reads(ref_seqs, reads, *, reads2=None, ref_names=None,
              scoring: Scoring = Scoring(), substitution=None,
              strand: str = "both", window: int = 32768,
              min_score: int = 1, top: Optional[int] = None,
              secondary: bool = False, min_insert: int = 0,
              max_insert: int = 1000, unmapped: bool = True,
              sort: bool = False, mesh=None,
              sec_resolution: int = 2048) -> MapResult:
    """Map ``reads`` (list of int8 code arrays) against ``ref_seqs``
    (one array, or a list of per-record arrays — multi-chromosome).

    ``reads2`` switches to paired-end mode: both ends are searched
    both-strand top-2, `pair_hits` picks the best proper FR combination
    within [min_insert, max_insert], and records carry the full SAM
    mate fields. The second-best locus is always tracked — it feeds
    MAPQ (and pairing); ``secondary=True`` additionally EMITS flag-256
    records (single-end only). ``unmapped`` keeps output read counts
    complete (flag-4 records for every read without a mapped record,
    including ``top``-truncated ones). A ``substitution`` table
    switches ``strand`` to 'forward' automatically (reverse complement
    is undefined for protein codes). Raises ValueError on unusable
    mode combinations; returns a `MapResult` for `to_sam`.
    """
    paired = reads2 is not None
    if paired and (substitution is not None or strand != "both"
                   or secondary):
        raise ValueError(
            "paired mode needs both DNA strands and owns the second "
            "locus (no substitution / strand='forward' / secondary)")
    if paired and len(reads2) != len(reads):
        raise ValueError("mate lists differ in read count")
    if substitution is not None and strand == "both":
        strand = "forward"   # reverse complement is undefined for
        #                      protein codes (the CLI's --blosum62 does
        #                      the same switch)
    if not isinstance(ref_seqs, np.ndarray) and not len(ref_seqs):
        raise ValueError("empty reference")
    single_ref = isinstance(ref_seqs, np.ndarray) or len(ref_seqs) == 1
    qlen = max((len(r) for r in list(reads) + list(reads2 or [])),
               default=0)
    if not len(reads) or qlen == 0:
        raise ValueError("no reads")
    if single_ref:
        ref = (ref_seqs if isinstance(ref_seqs, np.ndarray)
               else ref_seqs[0])
        ref_starts = None
        sq = None
    else:
        # one searchable array; spacers make cross-record alignments
        # strictly unprofitable, coordinates map back per record
        ref, ref_starts = concat_references(list(ref_seqs), qlen, scoring,
                                            substitution=substitution)
        if ref_names is None:
            ref_names = [f"ref{i}" for i in range(len(ref_seqs))]
        elif len(ref_names) != len(ref_seqs):
            raise ValueError(
                f"{len(ref_names)} ref_names for {len(ref_seqs)} "
                "reference records")
        sq = [(n, len(s)) for n, s in zip(ref_names, ref_seqs)]
    B = len(reads)

    # always track the second-best locus: the AS-XS gap is what MAPQ is
    # computed from (the top-2 carry rides the same device sweep); in
    # paired mode it additionally supplies pairing candidates
    if paired:
        h1 = search(pad_queries(list(reads), qlen), ref, mesh=mesh,
                    window=window, scoring=scoring, strand="both",
                    n_best=2, sec_resolution=sec_resolution)
        h2 = search(pad_queries(list(reads2), qlen), ref, mesh=mesh,
                    window=window, scoring=scoring, strand="both",
                    n_best=2, sec_resolution=sec_resolution)
        psel = pair_hits(h1, h2, min_insert=min_insert,
                         max_insert=max_insert, record_starts=ref_starts)
        scores = np.maximum(np.asarray(psel.mate1.scores),
                            np.asarray(psel.mate2.scores))
    else:
        hits = search(pad_queries(list(reads), qlen), ref, mesh=mesh,
                      window=window, scoring=scoring, strand=strand,
                      substitution=substitution, n_best=2,
                      sec_resolution=sec_resolution)
        scores = np.asarray(hits.scores)
    thr = max(1, min_score)
    sel = [i for i in np.argsort(-scores, kind="stable")
           if scores[i] >= thr]
    if top is not None:
        sel = sel[:top]

    if paired:
        m1 = np.asarray(psel.mate1.scores)
        m2 = np.asarray(psel.mate2.scores)
        recs = align_hits(psel.mate1, reads, ref, scoring=scoring,
                          reads=[int(i) for i in sel if m1[i] > 0])
        recs2 = align_hits(psel.mate2, reads2, ref, scoring=scoring,
                           reads=[int(i) for i in sel if m2[i] > 0])
        # XS = the other candidate's raw search score (0 = no competitor
        # -> MAPQ 60, no XS tag — as in single-end)
        recs = [r._replace(xs=max(0, int(psel.alt_scores1[r.read])))
                for r in recs]
        # mate-2 records index the second half of the combined read list
        recs += [r._replace(read=r.read + B,
                            xs=max(0, int(psel.alt_scores2[r.read])))
                 for r in recs2]
    else:
        s2 = np.asarray(hits.scores2)
        recs = align_hits(hits.primary, reads, ref, scoring=scoring,
                          reads=[int(i) for i in sel],
                          substitution=substitution)
        sec = []
        if secondary:
            sec_sel = [int(i) for i in sel if s2[i] >= thr]
            sec = [r._replace(is_secondary=True)
                   for r in align_hits(hits.secondary, reads, ref,
                                       scoring=scoring, reads=sec_sel,
                                       substitution=substitution)]
        # XS = the re-aligned secondary score where we have it (window
        # truncation can under-report the raw search score; the AS of
        # the flag-256 record and the primary's XS must agree), else the
        # raw search second-best — 0 when the searched second locus came
        # up empty, so unique mappings get MAPQ 60, not "255 unavailable"
        sec_as = {r.read: r.score for r in sec}
        recs = [r._replace(xs=sec_as.get(r.read, int(s2[r.read])))
                for r in recs]
        recs += sec
        if unmapped:
            # every read without a mapped record gets a flag-4 one —
            # below min-score AND top-truncated alike, so the output's
            # read count always matches the input's (flagstat-clean)
            mapped = {r.read for r in recs if not r.is_secondary}
            recs += [_unmapped_rec(i, B) for i in range(B)
                     if i not in mapped]

    if ref_starts is not None:
        # global concat coords -> per-record (RNAME, local POS)
        seqs = list(ref_seqs)
        fixed = []
        for r in recs:
            if r.is_unmapped:            # no coordinates to remap
                fixed.append(r)
                continue
            ci, lo = locate_record(ref_starts, seqs, r.ref_start)
            cj, _ = locate_record(ref_starts, seqs, r.ref_end)
            if ci != cj:                 # pragma: no cover - spacer math
                raise AssertionError(
                    f"alignment spans records {ci}/{cj}")
            fixed.append(r._replace(
                rname=ref_names[ci], ref_start=lo,
                ref_end=r.ref_end - int(ref_starts[ci])))
        recs = fixed

    if paired:
        # stitch mate fields AFTER the coordinate fixup (RNEXT/PNEXT/
        # TLEN are in final per-record coordinates); emit mates adjacent
        by1 = {r.read: r for r in recs if r.read < B}
        by2 = {r.read - B: r for r in recs if r.read >= B}

        def stitch(r, mate, first):
            fe = 0x1 | (0x40 if first else 0x80)
            if mate is None:
                # the placed-unmapped mate record sits AT this record's
                # coordinate (_unmapped_rec), so point RNEXT/PNEXT here
                # — the two records of the template must agree
                return r._replace(flag_extra=fe | 0x8, rnext="=",
                                  pnext=r.ref_start)
            same = mate.rname == r.rname
            if psel.proper[r.read % B] and same:
                fe |= 0x2                # proper implies one chromosome
            if mate.strand == "-":
                fe |= 0x20
            if same:
                tl = (max(r.ref_end, mate.ref_end)
                      - min(r.ref_start, mate.ref_start) + 1)
                if r.ref_start > mate.ref_start or \
                        (r.ref_start == mate.ref_start and not first):
                    tl = -tl             # rightmost mate gets the minus
            else:
                tl = 0                   # cross-record pair: TLEN undefined
            return r._replace(flag_extra=fe,
                              rnext="=" if same else mate.rname,
                              pnext=mate.ref_start, tlen=tl)

        recs = []
        for i in (int(i) for i in sel):
            if i in by1:
                recs.append(stitch(by1[i], by2.get(i), True))
            elif unmapped:
                recs.append(_unmapped_rec(i, B, True, by2.get(i)))
            if i in by2:
                recs.append(stitch(by2[i], by1.get(i), False))
            elif unmapped:
                recs.append(_unmapped_rec(i, B, False, by1.get(i)))
        if unmapped:
            # pairs never selected (below min-score OR top-cut): both
            # ends flag-4, keeping output read counts flagstat-clean
            covered = {int(i) for i in sel}
            for i in range(B):
                if i not in covered:
                    recs.append(_unmapped_rec(i, B, True, None))
                    recs.append(_unmapped_rec(i, B, False, None))

    so = "unknown"
    if sort:
        # samtools-style coordinate order: reference order as in the
        # @SQ header, then POS; unplaced unmapped records go last
        rank = ({n: k for k, n in enumerate(ref_names)}
                if ref_names is not None else {})
        recs = sorted(recs, key=lambda r: (
            # inf, not len(rank): with no ref_names the rank map is
            # empty and a (0, 0) sentinel would sort unplaced records
            # FIRST instead of last
            (float("inf"), 0) if r.is_unmapped and r.ref_start < 0
            else (rank.get(r.rname, 0), r.ref_start)))
        so = "coordinate"

    reads_all = list(reads) + (list(reads2) if paired else [])
    return MapResult(recs, reads_all, sq, so)
