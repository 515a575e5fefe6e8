"""Vectorized Arrow/numpy kernels for the portable-hash text operators.

r9 optimization (guide §4.2): the per-character polynomial hashing behind
doc_fingerprint and dedup_minhash_lsh was previously evaluated by Catalyst
higher-order functions (transform/aggregate lambdas).  Those are
CodegenFallback — every character of every word walks an interpreted
expression tree — and profiled as the dominant cost of both operators
(doc_fingerprint 4.7 s, the minhash signature stage most of 15 s, at sf1
on local[32]).  These kernels compute the SAME integer arithmetic with
numpy over Arrow buffers inside ``mapInArrow``: one batch in, a few dozen
vectorized passes, one batch out.

Bit-exactness contract: everything here is exact int64 arithmetic mod
2^31-1 — products stay < 2^62 (see functions/portable_hash.py), so numpy
int64 computes the identical values the interpreted expressions (and the
DuckDB oracles) produce.  No floats are involved.

Word-splitting fidelity: the replaced expressions tokenize with
``split(trim(text), '\\s+')`` (Spark semantics: trim strips ASCII spaces
only; split keeps leading AND trailing empty strings — Spark calls
Pattern.split with limit -1 — and \\s is the ASCII class).  The fast path
below assumes the common clean shape (printable ASCII, single spaces, no
edge spaces, non-empty) and VERIFIES it per batch; any batch that violates
it falls back to a per-row Python twin that replicates the Spark semantics
exactly (tested against the HOF expressions in
tests/test_operators.py::test_arrow_kernels_match_hof_on_dirty_text).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa

from mimic_spark.functions.portable_hash import HASH_MOD, SIG_COMBINE, WORD_COMBINE

# Spark/Java \s (ASCII): [ \t\n\x0b\f\r]; Python re's \s would additionally
# match unicode spaces under str patterns, so spell the class out.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def java_split_words(text: str) -> list[str]:
    """Pure-Python twin of Spark's split(trim(text), '\\s+').

    Spark trim strips only ASCII space; Spark split uses limit -1, which
    KEEPS leading and trailing empty strings (unlike Java's 1-arg split).
    re.split has exactly that behavior."""
    return _JAVA_WS.split(text.strip(" "))


def py_word_hash(w: str) -> int:
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


class _WordLayout:
    """Flat word layout for one clean batch: per-word rolling hashes plus
    the word->doc segmentation, all numpy."""

    __slots__ = ("word_h", "n_words", "word_off")

    def __init__(self, word_h: np.ndarray, n_words: np.ndarray):
        self.word_h = word_h  # int64 [total_words]
        self.n_words = n_words  # int64 [n_docs]
        self.word_off = np.concatenate(
            ([0], np.cumsum(n_words))
        )  # int64 [n_docs+1]


def _string_buffers(s: pa.Array) -> tuple[np.ndarray, np.ndarray] | None:
    """(byte_offsets_rel, data_segment) for a string array, or None when the
    fast path can't be used (nulls / large_string chunking surprises)."""
    if s.null_count:
        return None
    if pa.types.is_large_string(s.type):
        off_dtype = np.int64
    elif pa.types.is_string(s.type):
        off_dtype = np.int32
    else:
        return None
    bufs = s.buffers()
    o = np.frombuffer(bufs[1], off_dtype)[s.offset : s.offset + len(s) + 1]
    o = o.astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    seg = data[o[0] : o[-1]]
    return o - o[0], seg


def _is_clean(o: np.ndarray, seg: np.ndarray) -> bool:
    """Clean = every doc non-empty, printable ASCII (0x20-0x7e), no leading/
    trailing space, no double space.  Doc boundaries can't produce false
    double-space hits because edge spaces are already excluded."""
    lens = o[1:] - o[:-1]
    if len(lens) == 0:
        return True
    if (lens == 0).any():
        return False
    if len(seg) == 0:
        return True
    if seg.min() < 0x20 or seg.max() > 0x7E:
        return False
    if (seg[o[:-1]] == 0x20).any() or (seg[o[1:] - 1] == 0x20).any():
        return False
    sp = seg == 0x20
    if len(sp) > 1 and (sp[:-1] & sp[1:]).any():
        return False
    return True


def _word_layout_fast(o: np.ndarray, seg: np.ndarray) -> _WordLayout:
    sp_pos = np.flatnonzero(seg == 0x20)
    starts = np.sort(np.concatenate((o[:-1], sp_pos + 1)))
    ends = np.sort(np.concatenate((sp_pos, o[1:])))
    lens = ends - starts
    n_words = (
        1
        + np.searchsorted(sp_pos, o[1:])
        - np.searchsorted(sp_pos, o[:-1])
    ).astype(np.int64)
    h = np.zeros(len(starts), np.int64)
    max_len = int(lens.max()) if len(lens) else 0
    for k in range(max_len):
        m = lens > k
        h[m] = (h[m] * 31 + seg[starts[m] + k]) % HASH_MOD
    return _WordLayout(h, n_words)


def _word_layout_slow(texts: list[str | None]) -> _WordLayout:
    """Per-row Python twin — exact Spark semantics for arbitrary input.
    NULL text mirrors the HOF expressions: split(NULL) is NULL, so the doc
    contributes zero words (its fingerprint/minhash rows are NULL-derived;
    callers handle that explicitly)."""
    hashes: list[int] = []
    n_words = np.zeros(len(texts), np.int64)
    for j, t in enumerate(texts):
        if t is None:
            n_words[j] = -1  # sentinel: NULL text (≠ empty doc)
            continue
        ws = java_split_words(t)
        n_words[j] = len(ws)
        hashes.extend(py_word_hash(w) for w in ws)
    return _WordLayout(np.asarray(hashes, np.int64), np.maximum(n_words, 0))


def _layout_for(col: pa.Array) -> tuple[_WordLayout, np.ndarray | None]:
    """Word layout + optional NULL-doc mask (None when no NULL texts)."""
    fast = _string_buffers(col)
    if fast is not None and _is_clean(*fast):
        return _word_layout_fast(*fast), None
    texts = col.to_pylist()
    lay = _word_layout_slow(texts)
    nulls = np.array([t is None for t in texts], bool)
    return lay, (nulls if nulls.any() else None)


def _group_ranges(counts: np.ndarray) -> np.ndarray:
    """Within-group index 0..count-1 for each element, groups concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(off, counts)


# --------------------------------------------------------------------------
# doc_fingerprint: fingerprint = fold(word_hashes, 0, (acc,x) -> (acc*1000003+x) % M)
# --------------------------------------------------------------------------


def doc_fingerprint_batches(
    it: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    out_schema = pa.schema([("doc_id", pa.int64()), ("fingerprint", pa.int64())])
    for batch in it:
        ids = batch.column("doc_id")
        lay, null_mask = _layout_for(batch.column("text"))
        n = len(ids)
        fp = np.zeros(n, np.int64)
        nw = lay.n_words
        off = lay.word_off[:-1]
        max_w = int(nw.max()) if n else 0
        h = lay.word_h
        for k in range(max_w):
            m = nw > k
            fp[m] = (fp[m] * SIG_COMBINE + h[off[m] + k]) % HASH_MOD
        fp_arr = pa.array(fp, pa.int64())
        if null_mask is not None:
            # NULL text -> NULL fingerprint (aggregate over NULL array)
            fp_arr = pa.array(
                [None if m else int(v) for v, m in zip(fp, null_mask)],
                pa.int64(),
            )
        yield pa.RecordBatch.from_arrays(
            [ids.cast(pa.int64()), fp_arr], schema=out_schema
        )


# --------------------------------------------------------------------------
# minhash: per doc (>=3 words), mh_i = min over shingle bases b of (a_i*b+c_i)%M
# where b = ((wh0*131 + wh1)*131 + wh2) % M over consecutive word triples.
# Duplicates don't affect a min, so the HOF pipeline's array_distinct is
# skipped here — identical results.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# text_quality_scores: n_words / n_punct / stopword hits / BPE-ish token
# count, all from one byte pass.  Exact twins of the JVM expressions:
#   n_words   = size(split(trim(text), '\s+'))
#   n_punct   = regexp_count(text, '[^A-Za-z0-9\s]')   (count of such chars)
#   stop_hits = size(filter(words, w -> w IN (stopwords)))
#   bpe       = regexp_count(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')
# The BPE alternation tokenizes greedily left-to-right, so on a letter run
# of length L it matches ceil(L/4) times, and every digit / non-alnum-non-
# space char matches once — countable from byte classes + letter-run
# lengths without running a regex.  Fast path requires the clean-ASCII
# batch shape (_is_clean); dirty batches fall back to a per-row Python twin
# with the Java-regex-faithful patterns.
# --------------------------------------------------------------------------

_BPE_RE = re.compile(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 \t\n\x0b\f\r]")
_PUNCT_RE = re.compile(r"[^A-Za-z0-9 \t\n\x0b\f\r]")


def make_text_quality_kernel(
    stopwords: list[str],
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    stop_set = set(stopwords)
    stop_bytes = [np.frombuffer(w.encode(), np.uint8) for w in stopwords]
    lut_letter = np.zeros(256, bool)
    lut_letter[ord("A") : ord("Z") + 1] = True
    lut_letter[ord("a") : ord("z") + 1] = True
    lut_digit = np.zeros(256, bool)
    lut_digit[ord("0") : ord("9") + 1] = True

    def _slow(texts: list[str | None]):
        rows = []
        for t in texts:
            if t is None:
                rows.append((None, None, None, None))
                continue
            ws = java_split_words(t)
            rows.append(
                (
                    len(ws),
                    len(_PUNCT_RE.findall(t)),
                    sum(1 for w in ws if w in stop_set),
                    len(_BPE_RE.findall(t)),
                )
            )
        return rows

    def tq_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("n_words", pa.int32()),
                ("n_punct", pa.int32()),
                ("stop_hits", pa.int32()),
                ("bpe", pa.int32()),
            ]
        )
        for batch in it:
            ids = batch.column("doc_id").cast(pa.int64())
            nch = batch.column("n_chars").cast(pa.int64())
            col = batch.column("text")
            fast = _string_buffers(col)
            if fast is None or not _is_clean(*fast):
                rows = _slow(col.to_pylist())
                cols = [ids, nch] + [
                    pa.array([r[i] for r in rows], pa.int32())
                    for i in range(4)
                ]
                yield pa.RecordBatch.from_arrays(cols, schema=out_schema)
                continue
            o, seg = fast
            ndocs = len(ids)
            # words (clean shape: single spaces, no edge spaces, non-empty)
            sp_pos = np.flatnonzero(seg == 0x20)
            starts = np.sort(np.concatenate((o[:-1], sp_pos + 1)))
            ends = np.sort(np.concatenate((sp_pos, o[1:])))
            lens = ends - starts
            n_words = (
                1
                + np.searchsorted(sp_pos, o[1:])
                - np.searchsorted(sp_pos, o[:-1])
            ).astype(np.int64)
            word_off = np.concatenate(([0], np.cumsum(n_words)))
            # stopword hits: exact byte equality per stopword
            hit = np.zeros(len(starts), bool)
            for b in stop_bytes:
                m = lens == len(b)
                if not m.any():
                    continue
                idx = starts[m]
                eq = np.ones(len(idx), bool)
                for k, ch in enumerate(b):
                    eq &= seg[idx + k] == ch
                w_idx = np.flatnonzero(m)[eq]
                hit[w_idx] = True
            stop_hits = np.add.reduceat(
                hit.astype(np.int64), word_off[:-1]
            ) if len(starts) else np.zeros(ndocs, np.int64)
            # byte classes
            al = lut_letter[seg]
            dg = lut_digit[seg]
            punct = ~al & ~dg & (seg != 0x20)
            doc_starts = o[:-1]
            same_prev = np.ones(len(seg), bool)
            same_prev[doc_starts[doc_starts < len(seg)]] = False
            al_prev = np.zeros(len(seg), bool)
            al_prev[1:] = al[:-1]
            run_start = al & ~(al_prev & same_prev)
            rs = np.flatnonzero(run_start)
            # run end: next byte not a letter, or doc boundary
            same_next = np.ones(len(seg), bool)
            next_doc_starts = doc_starts[(doc_starts > 0) & (doc_starts <= len(seg))]
            same_next[next_doc_starts - 1] = False
            al_next = np.zeros(len(seg), bool)
            al_next[:-1] = al[1:]
            run_end = al & ~(al_next & same_next)
            re_ = np.flatnonzero(run_end)
            run_len = re_ - rs + 1
            doc_of_run = np.searchsorted(o, rs, "right") - 1
            bpe_let = np.bincount(
                doc_of_run, weights=(run_len + 3) // 4, minlength=ndocs
            ).astype(np.int64)
            p_pos = np.flatnonzero(punct)
            d_pos = np.flatnonzero(dg)
            n_punct = np.bincount(
                np.searchsorted(o, p_pos, "right") - 1, minlength=ndocs
            ).astype(np.int64)
            n_dig = np.bincount(
                np.searchsorted(o, d_pos, "right") - 1, minlength=ndocs
            ).astype(np.int64)
            bpe = bpe_let + n_dig + n_punct
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    nch,
                    pa.array(n_words.astype(np.int32)),
                    pa.array(n_punct.astype(np.int32)),
                    pa.array(stop_hits.astype(np.int32)),
                    pa.array(bpe.astype(np.int32)),
                ],
                schema=out_schema,
            )

    return tq_batches


# --------------------------------------------------------------------------
# local top-k prefilter: keep, per Arrow batch and group, the k best rows by
# (value DESC, tiebreak ASC).  PURELY a row-count reducer ahead of an exact
# window top-k — a dropped row is provably below k same-group rows under the
# final window's own ordering, so the result is row-identical; on any doubt
# (nulls) the batch passes through untouched.  Replaces the full local sort
# Spark's partial WindowGroupLimit needs (the measured cost of the one-window
# plan) with an O(n + g·k log n) numpy selection.
# --------------------------------------------------------------------------


def make_local_topk_kernel(
    group_col: str, desc_col: str, asc_col: str, k: int
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    def topk_batches(
        it: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in it:
            if batch.num_rows <= k:
                yield batch
                continue
            gcol, vcol, tcol = (
                batch.column(group_col),
                batch.column(desc_col),
                batch.column(asc_col),
            )
            if gcol.null_count or vcol.null_count or tcol.null_count:
                yield batch  # pass-through: pruning is best-effort only
                continue
            codes = pc.dictionary_encode(gcol).indices.to_numpy(
                zero_copy_only=False
            )
            v = vcol.to_numpy(zero_copy_only=False)
            tb = tcol.to_numpy(zero_copy_only=False)
            keeps = []
            for g in np.unique(codes):
                idx = np.flatnonzero(codes == g)
                if len(idx) > k:
                    idx = idx[np.lexsort((tb[idx], -v[idx]))[:k]]
                keeps.append(idx)
            keep = np.sort(np.concatenate(keeps))
            yield batch.take(pa.array(keep))

    return topk_batches


# --------------------------------------------------------------------------
# cosine scoring: replicates _dot/_norm (zip_with product then LEFT-TO-RIGHT
# fold-add) IEEE-operation-for-operation, so the unrounded double is
# bit-identical to the Catalyst aggregate it replaces.  numpy multiply/add
# are separate correctly-rounded IEEE ufuncs (no FMA), and the k-loop below
# adds dimensions in the same left-to-right order as the fold.
# --------------------------------------------------------------------------


def _fold_dot(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    acc = np.zeros(mat.shape[0], np.float64)
    for k in range(mat.shape[1]):
        acc = acc + mat[:, k] * q[k]
    return acc


def _fold_sqnorm(mat: np.ndarray) -> np.ndarray:
    acc = np.zeros(mat.shape[0], np.float64)
    for k in range(mat.shape[1]):
        acc = acc + mat[:, k] * mat[:, k]
    return acc


def _list_to_matrix(col: pa.Array, dim: int) -> np.ndarray | None:
    """(n, dim) float64 matrix from a list<float|double> column, or None when
    rows are ragged/null (caller falls back to per-row conversion)."""
    if col.null_count:
        return None
    if isinstance(col, pa.ChunkedArray):  # pragma: no cover - RecordBatch cols
        col = col.combine_chunks()
    offsets = np.frombuffer(col.buffers()[1], np.int32)[
        col.offset : col.offset + len(col) + 1
    ]
    lens = offsets[1:] - offsets[:-1]
    if len(lens) and not (lens == dim).all():
        return None
    values = col.values
    vals = values.to_numpy(zero_copy_only=False).astype(np.float64)
    start = offsets[0]
    return vals[start : start + len(col) * dim].reshape(len(col), dim)


def make_cosine_topk_kernel(
    queries: list[tuple[int, list[float]]], dim: int
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """Per corpus batch, emit (query_id, neighbor_id, cos_sim_raw) for every
    (query, vector) pair with vec_id != query_id.  cos_sim_raw is the
    UNROUNDED double — the operator applies the same JVM F.round(.., 4)
    (HALF_UP) the old plan used, so rounding semantics are untouched."""
    q_ids = [int(i) for i, _ in queries]
    q_vecs = [np.asarray(v, np.float64) for _, v in queries]
    # scalar query norms with the same left-to-right fold (python floats are
    # IEEE doubles; operation order matches _norm exactly)
    q_norms = []
    for qv in q_vecs:
        acc = 0.0
        for x in qv:
            acc = acc + float(x) * float(x)
        q_norms.append(float(np.sqrt(acc)))

    def cosine_batches(
        it: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        out_schema = pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("cos_raw", pa.float64()),
            ]
        )
        for batch in it:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            mat = _list_to_matrix(batch.column("v"), dim)
            if mat is None:
                # NULL/ragged vectors never occur in the embeddings corpus;
                # fail loudly rather than silently diverge from the padded
                # zip_with semantics of the expression this replaces
                raise ValueError(
                    "cosine kernel: NULL or ragged embedding row"
                )
            vnorm = np.sqrt(_fold_sqnorm(mat))
            for qi, qv, qn in zip(q_ids, q_vecs, q_norms):
                dots = _fold_dot(mat, qv)
                cos = dots / (qn * vnorm)
                keep = ids != qi
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(int(keep.sum()), qi, np.int64)),
                        pa.array(ids[keep].astype(np.int64)),
                        pa.array(cos[keep], pa.float64()),
                    ],
                    schema=out_schema,
                )

    return cosine_batches


def make_minhash_kernel(
    family: list[tuple[int, int]],
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    fam = [(int(a), int(c)) for a, c in family]

    def minhash_batches(
        it: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        fields = [("doc_id", pa.int64())] + [
            (f"mh{i}", pa.int64()) for i in range(len(fam))
        ]
        out_schema = pa.schema(fields)
        for batch in it:
            ids = batch.column("doc_id")
            lay, _nulls = _layout_for(batch.column("text"))
            nw = lay.n_words  # NULL texts already have 0 words -> filtered
            nb = np.maximum(nw - 2, 0)
            valid = nw >= 3
            h = lay.word_h
            base_idx = (
                np.repeat(lay.word_off[:-1], nb) + _group_ranges(nb)
            )
            b = (
                (h[base_idx] * WORD_COMBINE + h[base_idx + 1]) * WORD_COMBINE
                + h[base_idx + 2]
            ) % HASH_MOD
            base_off = np.concatenate(([0], np.cumsum(nb)))[:-1][valid]
            cols = [ids.cast(pa.int64()).filter(pa.array(valid))]
            for a, c in fam:
                v = (b * a + c) % HASH_MOD
                mins = (
                    np.minimum.reduceat(v, base_off)
                    if len(base_off)
                    else np.zeros(0, np.int64)
                )
                cols.append(pa.array(mins, pa.int64()))
            yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    return minhash_batches
