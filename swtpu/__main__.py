"""CLI — mirrors the reference binaries' interface.

``python -m swtpu``             -> builtin golden example with asserts
                                   (the reference's no-arg mode,
                                   serial_smithW.c:72-78)
``python -m swtpu <cols> <rows>`` -> random pair of that size, timed fill
                                   (omp_smithW.c:91-96 argv order: m then n)

Environment/flags replace the reference's compile-time knobs: ``--debug``
prints H and the arrow predecessor matrix (-DDEBUG), ``--skip-backtrack``
is the -DSKIP_BACKTRACK=1 benchmark mode, ``--plan`` forces an execution
strategy (the v0..v8 ladder behind one binary).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def map_main(argv) -> int:
    """``python -m swtpu map ref.fa reads.fa`` — FASTA/FASTQ in, SAM out:
    the whole database pipeline (native reader -> batched device search,
    optionally both strands -> ranked hit alignments) from the shell."""
    ap = argparse.ArgumentParser(
        prog="swtpu map",
        description="Map reads against a reference; print SAM")
    ap.add_argument("ref_fasta",
                    help="reference FASTA (multi-record/chromosome OK)")
    ap.add_argument("reads_fasta", nargs="+",
                    help="reads FASTA/FASTQ; TWO files = paired-end "
                         "(mate1 mate2, FR orientation)")
    ap.add_argument("-o", "--output", default="-", help="SAM path or '-'")
    ap.add_argument("--min-insert", type=int, default=0)
    ap.add_argument("--max-insert", type=int, default=1000,
                    help="proper-pair template-length bounds (paired mode)")
    ap.add_argument("--no-unmapped", action="store_true",
                    help="suppress flag-4 records for unmapped reads")
    ap.add_argument("--sort", action="store_true",
                    help="coordinate-sort the output (SO:coordinate; "
                         "default order is best-score-first)")
    ap.add_argument("--strand", default="both",
                    choices=["both", "forward"])
    ap.add_argument("--window", type=int, default=32768)
    ap.add_argument("--top", type=int, default=None,
                    help="only report the best K hits (default: all >0)")
    ap.add_argument("--min-score", type=int, default=1)
    ap.add_argument("--secondary", action="store_true",
                    help="also EMIT each read's second-best locus as a "
                         "flag-256 record (the second locus is always "
                         "searched — it feeds MAPQ and the XS:i tag)")
    ap.add_argument("--match", type=int, default=3)
    ap.add_argument("--mismatch", type=int, default=-3)
    ap.add_argument("--gap", type=int, default=-2)
    ap.add_argument("--affine", action="store_true")
    ap.add_argument("--gap-open", type=int, default=None)
    ap.add_argument("--gap-extend", type=int, default=None)
    ap.add_argument("--blosum62", action="store_true",
                    help="protein mode: BLOSUM62 scoring, protein-alphabet "
                         "FASTA, affine -11/-1 defaults, forward-only")
    args = ap.parse_args(argv)

    from . import Scoring
    from .dist.database import align_hits, pad_queries, search, to_sam
    from .runtime_native import read_seqfile, seq_names, seq_quals

    sub = None
    alphabet = None
    if args.blosum62:
        from .core.encode import PROTEIN_ALPHABET
        from .core.substitution import BLOSUM62
        sub, alphabet = BLOSUM62, PROTEIN_ALPHABET
        args.affine = True
        args.strand = "forward"
    gap_open = args.gap_open if args.gap_open is not None \
        else (-11 if args.blosum62 else -4)
    gap_extend = args.gap_extend if args.gap_extend is not None else -1
    ref_seqs = read_seqfile(args.ref_fasta, alphabet=alphabet)
    ref_names = seq_names(args.ref_fasta)
    if len(ref_names) != len(ref_seqs):
        ref_names = [f"ref{i}" for i in range(len(ref_seqs))]
    paired = len(args.reads_fasta) == 2
    if len(args.reads_fasta) > 2:
        print("at most two read files (mate1 mate2)", file=sys.stderr)
        return 2
    if paired and (args.blosum62 or args.strand != "both"
                   or args.secondary):
        print("paired mode needs both DNA strands and owns the second "
              "locus (no --blosum62/--strand forward/--secondary)",
              file=sys.stderr)
        return 2
    reads = read_seqfile(args.reads_fasta[0], alphabet=alphabet)
    names = seq_names(args.reads_fasta[0])
    if len(names) != len(reads):
        names = [f"read{i}" for i in range(len(reads))]
    reads2 = None
    if paired:
        reads2 = read_seqfile(args.reads_fasta[1], alphabet=alphabet)
        if len(reads2) != len(reads):
            print("mate files differ in read count", file=sys.stderr)
            return 1
        # mates share one QNAME; drop conventional /1 /2 suffixes
        names = [n[:-2] if n.endswith(("/1", "/2")) else n for n in names]
    scoring = Scoring(match=args.match, mismatch=args.mismatch,
                      gap=args.gap, gap_open=gap_open,
                      gap_extend=gap_extend,
                      mode="affine" if args.affine else "linear")
    qlen = max((len(r) for r in reads + (reads2 or [])), default=0)
    if not reads or qlen == 0 or not ref_seqs:
        print("no reads or empty reference", file=sys.stderr)
        return 1
    if len(ref_seqs) > 1:
        # one searchable array; spacers make cross-record alignments
        # strictly unprofitable, coordinates map back per record
        from .dist.database import concat_references
        ref, ref_starts = concat_references(ref_seqs, qlen, scoring,
                                            substitution=sub)
    else:
        ref, ref_starts = ref_seqs[0], None
    t0 = time.perf_counter()
    # always track the second-best locus: the AS-XS gap is what MAPQ is
    # computed from (the top-2 carry rides the same device sweep); in
    # paired mode it additionally supplies pairing candidates
    if paired:
        from .dist.database import pair_hits
        h1 = search(pad_queries(reads, qlen), ref, window=args.window,
                    scoring=scoring, strand="both", n_best=2)
        h2 = search(pad_queries(reads2, qlen), ref, window=args.window,
                    scoring=scoring, strand="both", n_best=2)
        psel = pair_hits(h1, h2, min_insert=args.min_insert,
                         max_insert=args.max_insert,
                         record_starts=ref_starts)
        scores = np.maximum(np.asarray(psel.mate1.scores),
                            np.asarray(psel.mate2.scores))
        nreads = 2 * len(reads)
    else:
        hits = search(pad_queries(reads, qlen), ref, window=args.window,
                      scoring=scoring, strand=args.strand,
                      substitution=sub, n_best=2)
        scores = np.asarray(hits.scores)
        nreads = len(reads)
    dt = time.perf_counter() - t0
    print(f"searched {nreads} reads x {len(ref)} bases in {dt:.2f}s "
          f"({nreads * qlen * len(ref) / dt / 1e9:.1f} GCUPS "
          "effective, incl. jit compile)", file=sys.stderr)
    sel = [i for i in np.argsort(-scores, kind="stable")
           if scores[i] >= max(1, args.min_score)]
    if args.top is not None:
        sel = sel[: args.top]
    B = len(reads)
    from .dist.database import HitAlignment

    def unmapped_rec(i, first=None, mate=None):
        """flag-4 record: ``first`` None = single-end (no pairing bits),
        True/False = mate 1/2; placed AT the mapped mate's coordinate
        when one exists (keeps the pair together under sorting)."""
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
            fe |= 0x8                    # both ends unmapped
        return HitAlignment(
            read=i if first in (None, True) else i + B, score=0,
            read_start=0, read_end=0, aligned_read="", aligned_ref="",
            cigar="*", is_unmapped=True, flag_extra=fe, **kw)

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
                          reads=[int(i) for i in sel], substitution=sub)
        sec = []
        if args.secondary:
            sec_sel = [int(i) for i in sel
                       if s2[i] >= max(1, args.min_score)]
            sec = [r._replace(is_secondary=True)
                   for r in align_hits(hits.secondary, reads, ref,
                                       scoring=scoring, reads=sec_sel,
                                       substitution=sub)]
        # XS = the re-aligned secondary score where we have it (window
        # truncation can under-report the raw search score; the AS of the
        # flag-256 record and the primary's XS must agree), else the raw
        # search second-best — 0 when the searched second locus came up
        # empty, so unique mappings get MAPQ 60, not "255 unavailable"
        sec_as = {r.read: r.score for r in sec}
        recs = [r._replace(xs=sec_as.get(r.read, int(s2[r.read])))
                for r in recs]
        recs += sec
        if not args.no_unmapped:
            # every read without a mapped record gets a flag-4 one —
            # below min-score AND --top-truncated alike, so the output's
            # read count always matches the input's (flagstat-clean)
            mapped = {r.read for r in recs if not r.is_secondary}
            recs += [unmapped_rec(i) for i in range(B)
                     if i not in mapped]
    if ref_starts is not None:
        # global concat coords -> per-record (RNAME, local POS)
        from .dist.database import locate_record
        fixed = []
        for r in recs:
            if r.is_unmapped:          # no coordinates to remap
                fixed.append(r)
                continue
            ci, lo = locate_record(ref_starts, ref_seqs, r.ref_start)
            cj, _ = locate_record(ref_starts, ref_seqs, r.ref_end)
            if ci != cj:               # pragma: no cover - spacer math
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
                # coordinate (unmapped_rec), so point RNEXT/PNEXT here —
                # the two records of the template must agree
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
            elif not args.no_unmapped:
                recs.append(unmapped_rec(i, True, by2.get(i)))
            if i in by2:
                recs.append(stitch(by2[i], by1.get(i), False))
            elif not args.no_unmapped:
                recs.append(unmapped_rec(i, False, by1.get(i)))
        if not args.no_unmapped:
            # pairs never selected (below min-score OR --top-cut): both
            # ends flag-4, keeping output read counts flagstat-clean
            covered = {int(i) for i in sel}
            for i in range(B):
                if i not in covered:
                    recs.append(unmapped_rec(i, True, None))
                    recs.append(unmapped_rec(i, False, None))
        reads_all = list(reads) + list(reads2)
        names_all = names + names        # mates share one QNAME
        quals = (seq_quals(args.reads_fasta[0])
                 + seq_quals(args.reads_fasta[1]))
    else:
        reads_all, names_all = reads, names
        quals = seq_quals(args.reads_fasta[0])
    if len(quals) != len(reads_all) or all(q is None for q in quals):
        quals = None                   # FASTA input: no QUAL column
    so = "unknown"
    if args.sort:
        # samtools-style coordinate order: reference order as in the
        # @SQ header, then POS; unplaced unmapped records go last
        rank = {n: k for k, n in enumerate(ref_names)}
        recs = sorted(recs, key=lambda r: (
            (len(rank), 0) if r.is_unmapped and r.ref_start < 0
            else (rank.get(r.rname, 0), r.ref_start)))
        so = "coordinate"
    cl = "swtpu map " + " ".join(argv)
    if ref_starts is not None:
        sam = to_sam(recs, reads_all, read_names=names_all,
                     alphabet=alphabet, quals=quals, pg=cl, so=so,
                     sq=[(n, len(s)) for n, s in zip(ref_names, ref_seqs)])
    else:
        sam = to_sam(recs, reads_all, ref_name=ref_names[0],
                     ref_len=len(ref), read_names=names_all,
                     alphabet=alphabet, quals=quals, pg=cl, so=so)
    if args.output == "-":
        sys.stdout.write(sam)
    else:
        with open(args.output, "w") as f:
            f.write(sam)
        print(f"wrote {len(recs)} records to {args.output}",
              file=sys.stderr)
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "map":
        return map_main(argv[1:])
    ap = argparse.ArgumentParser(
        prog="swtpu", description="TPU-native Smith-Waterman alignment")
    ap.add_argument("m", nargs="?", type=int, default=None,
                    help="columns (length of a)")
    ap.add_argument("n", nargs="?", type=int, default=None,
                    help="rows (length of b)")
    ap.add_argument("--plan", default=None,
                    choices=["host", "scan", "stripe", "pipeline", "auto"],
                    help="execution plan (default: adaptive dispatch)")
    ap.add_argument("--sanitize", action="store_true",
                    help="run the stripe-kernel structural sanitizer on "
                         "this input (interpret mode; the DEBUG memory-"
                         "check analog)")
    ap.add_argument("--band", type=int, default=None, help="band half-width")
    ap.add_argument("--affine", action="store_true",
                    help="affine gaps (Gotoh) instead of linear")
    ap.add_argument("--blosum62", action="store_true",
                    help="protein mode: random 20-letter sequences scored "
                         "with BLOSUM62 (use with --affine --gap-open -11 "
                         "--gap-extend -1 for standard protein params)")
    ap.add_argument("--match", type=int, default=3)
    ap.add_argument("--mismatch", type=int, default=-3)
    ap.add_argument("--gap", type=int, default=-2)
    ap.add_argument("--gap-open", type=int, default=-4)
    ap.add_argument("--gap-extend", type=int, default=-1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--debug", action="store_true",
                    help="print H and predecessor matrices (-DDEBUG analog)")
    ap.add_argument("--skip-backtrack", action="store_true",
                    help="score-only benchmark mode (-DSKIP_BACKTRACK analog)")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args(argv)

    from . import (BUILTIN_A, BUILTIN_B, BUILTIN_LAST_CELL, BUILTIN_MAX_POS,
                   BUILTIN_MAX_SCORE, EngineConfig, Scoring, align,
                   random_pair)
    from .core import oracle
    from .instrument.metrics import gcups, memory_footprint_bytes
    from .instrument.printers import format_matrix, format_predecessor_matrix

    if (args.m is not None and args.m <= 0) or (args.n is not None and args.n <= 0):
        ap.error("matrix sizes must be positive")
    use_builtin = args.m is None or args.n is None
    sub = None
    alphabet_kw = {}
    if args.blosum62:
        from .core.encode import PROTEIN_ALPHABET
        from .core.substitution import BLOSUM62
        sub = BLOSUM62
        alphabet_kw = {"alphabet": PROTEIN_ALPHABET}
        if use_builtin:
            ap.error("--blosum62 needs explicit sizes (protein inputs)")
    if use_builtin:
        a, b = BUILTIN_A, BUILTIN_B
        m, n = len(a), len(b)
        print("Using built-in data for testing ...")
    elif args.blosum62:
        m, n = args.m, args.n
        rng = np.random.default_rng(args.seed)
        a = rng.integers(0, 20, m).astype(np.int8)
        b = rng.integers(0, 20, n).astype(np.int8)
    else:
        m, n = args.m, args.n
        a, b = random_pair(m, n, seed=args.seed)
    print(f"Matrix[{n}][{m}]  ({m*n/1e6:.2f} Mcells, "
          f"~{memory_footprint_bytes(m, n, not args.skip_backtrack)/1e6:.1f} MB working set)")

    scoring = Scoring(
        match=args.match, mismatch=args.mismatch, gap=args.gap,
        gap_open=args.gap_open, gap_extend=args.gap_extend,
        mode="affine" if args.affine else "linear",
    )
    config = EngineConfig(band=args.band, traceback=not args.skip_backtrack)

    # warm the jit caches so the timed phase matches the reference's
    # compile-free binaries (first compile of a new shape is ~10-30 s);
    # the builtin example warms too — its "Elapsed time" would otherwise
    # read as a 40 s result for a 9x8 problem
    t0 = time.perf_counter()
    align(a, b, scoring=scoring, config=config, plan=args.plan,
          substitution=sub, **alphabet_kw)
    print(f"(jit warmup: {time.perf_counter() - t0:.2f}s)")

    best = None
    res = None
    for rep in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        res = align(a, b, scoring=scoring, config=config, plan=args.plan,
                    substitution=sub, **alphabet_kw)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"Elapsed time for scoring matrix computation: {dt:.6f}  "
              f"({gcups(m*n, dt):.3f} GCUPS)")

    if args.sanitize:
        from .instrument.sanitize import sanitize_stripe
        a_codes = a if isinstance(a, np.ndarray) else None
        if a_codes is None:
            from .core.encode import encode
            a_codes, b_codes = encode(a), encode(b)
        else:
            b_codes = b
        rep = sanitize_stripe(a_codes, b_codes, scoring=scoring,
                              substitution=sub)
        print(f"Sanitizer: OK — {rep.valid_cells} cells bit-checked, "
              f"{rep.prestart_cells} pre-start, {rep.garbage_cells} "
              f"garbage slots verified (config {rep.config})")

    print(f"Max score {res.max_score} at (i={res.max_i}, j={res.max_j}) "
          f"[padded row-major index {res.max_pos}]")
    if res.aligned_a is not None:
        print(f"Alignment:\n  a: {res.aligned_a}\n  b: {res.aligned_b}")

    if args.debug:
        r = align(a, b, scoring=scoring, config=config, plan=args.plan,
                  substitution=sub, return_matrices=True, **alphabet_kw)
        print("\nSimilarity Matrix:")
        sys.stdout.write(format_matrix(r.H))
        print("\nPredecessor Matrix:")
        marked = oracle.mark_path(r.P, r.max_pos) if r.max_score > 0 else r.P
        sys.stdout.write(format_predecessor_matrix(marked))

    if use_builtin and not args.affine and args.band is None:
        ok = (res.max_score == BUILTIN_MAX_SCORE
              and res.max_pos == BUILTIN_MAX_POS
              and res.last_cell == BUILTIN_LAST_CELL)
        print(f"Verifying correctness using builtin data = {int(ok)}")
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
