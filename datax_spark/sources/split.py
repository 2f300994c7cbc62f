"""Split planning — the reader-side partitioning algebra of the reference.

Rebuilds DataX's split utilities as pure functions producing either Spark
JDBC ``predicates`` lists or LSN/PK ranges:

- ``split_long_range`` / ``split_big_range``: even bisection of an integer
  PK range into N adjacent sub-ranges
  (common/src/main/java/com/alibaba/datax/common/util/RangeSplitUtil.java:14-100);
- ``split_string_range``: ASCII-string ranges treated as base-128 numbers
  (RangeSplitUtil.java:111-135 — doAsciiStringSplit);
- ``pk_predicates``: the per-split WHERE clauses DataX builds around those
  ranges, including the ``pk IS NULL`` tail task
  (plugin-rdbms-util/.../reader/util/SingleTableSplitUtil.java:34-130);
- ``split_factor_advice``: tasks-per-channel oversplit (default 5×) so
  stragglers rebalance (ReaderSplitUtil.java:59-73 — splitFactor).

On Spark these feed ``spark.read.jdbc(..., predicates=[...])`` — each
predicate becomes one scan partition — or LSN micro-batch boundaries.  The
even-bisection guarantee (adjacent, complete, non-overlapping) is
property-tested with hypothesis.
"""

from __future__ import annotations


def split_long_range(lo: int, hi: int, n: int) -> list[tuple[int, int]]:
    """N adjacent [start, end] (inclusive) ranges covering [lo, hi].

    Matches RangeSplitUtil.doLongSplit: even width with the remainder
    spread over the leading ranges; degenerate inputs collapse to fewer
    ranges (never an empty range)."""
    if lo > hi:
        raise ValueError(f"lo {lo} > hi {hi}")
    n = max(1, min(n, hi - lo + 1))
    width, rem = divmod(hi - lo + 1, n)
    out: list[tuple[int, int]] = []
    start = lo
    for i in range(n):
        end = start + width - 1 + (1 if i < rem else 0)
        out.append((start, end))
        start = end + 1
    return out


# alias: Python ints are arbitrary precision — BigInteger split is the same
split_big_range = split_long_range


def _str_to_num(s: str, radix: int = 128) -> int:
    v = 0
    for ch in s:
        c = ord(ch)
        if c >= radix:
            raise ValueError(f"non-ASCII char {ch!r} in split key")
        v = v * radix + c
    return v


def _num_to_str(v: int, radix: int = 128) -> str:
    if v == 0:
        return ""
    digits: list[int] = []
    while v:
        v, d = divmod(v, radix)
        digits.append(d)
    return "".join(chr(d) for d in reversed(digits))


def split_string_range(lo: str, hi: str, n: int) -> list[str]:
    """Split points between two ASCII strings, base-128 interpolation
    (RangeSplitUtil.doAsciiStringSplit).  Returns the ordered boundary
    list [lo, p1, ..., pN-1, hi]."""
    a, b = _str_to_num(lo), _str_to_num(hi)
    if a > b:
        a, b = b, a
        lo, hi = hi, lo
    if n <= 1 or a == b:
        return [lo, hi]
    pts = split_long_range(a, b, n)
    bounds = [lo] + [_num_to_str(end) for _, end in pts[:-1]] + [hi]
    return bounds


def pk_predicates(
    pk: str, lo: int, hi: int, n: int, null_tail: bool = True
) -> list[str]:
    """Per-split WHERE fragments for ``spark.read.jdbc(predicates=...)``.

    Shape mirrors SingleTableSplitUtil.buildQuerySql ranges: half-open
    interior splits, closed final split, plus the ``pk IS NULL`` tail task
    DataX always appends (SingleTableSplitUtil.java:116-124)."""
    ranges = split_long_range(lo, hi, n)
    preds = []
    for i, (a, b) in enumerate(ranges):
        if i == len(ranges) - 1:
            preds.append(f"{pk} >= {a} AND {pk} <= {b}")
        else:
            preds.append(f"{pk} >= {a} AND {pk} < {b + 1}")
    if null_tail:
        preds.append(f"{pk} IS NULL")
    return preds


def quantile_split_bounds(
    df, pk: str, n: int, relative_error: float = 0.001
) -> list[int]:
    """Quantile-based split boundaries for a skewed/sparse PK — the rebuild
    of DataX's sampling split (SingleTableSplitUtil.java:305-398: Oracle
    ``SAMPLE(0.1)`` → sorted sample → evenly spaced elements).  Spark-native:
    ``approxQuantile`` (Greenwald-Khanna, one pass, no global sort) replaces
    the sample query.  Returns n-1 interior boundaries (ascending, deduped);
    feed to ``bounded_predicates``.

    Even bisection (``split_long_range``) degrades badly when the PK is
    sparse or skewed (most ranges empty, one range holds everything);
    quantile splits put ~equal ROWS in each range regardless of key
    distribution — the property that matters for balanced scan partitions.
    """
    if n <= 1:
        return []
    probs = [i / n for i in range(1, n)]
    bounds = df.stat.approxQuantile(pk, probs, relative_error)
    out: list[int] = []
    for b in bounds:
        v = int(b)
        if not out or v > out[-1]:
            out.append(v)
    return out


def bounded_predicates(
    pk: str, lo: int, hi: int, interior: list[int], null_tail: bool = True
) -> list[str]:
    """WHERE fragments from explicit interior boundaries (quantile split):
    [lo, b1), [b1, b2), ..., [bk, hi] + optional ``pk IS NULL`` tail —
    same shape as ``pk_predicates`` but with data-driven boundaries."""
    edges = [lo] + [b for b in interior if lo < b <= hi] + [hi + 1]
    preds = []
    for i in range(len(edges) - 1):
        a, b = edges[i], edges[i + 1]
        if i == len(edges) - 2:
            preds.append(f"{pk} >= {a} AND {pk} <= {hi}")
        else:
            preds.append(f"{pk} >= {a} AND {pk} < {b}")
    if null_tail:
        preds.append(f"{pk} IS NULL")
    return preds


def split_factor_advice(channels: int, split_factor: int = 5) -> int:
    """Tasks to request from a reader for a given parallelism — DataX
    oversplits single tables by splitFactor (default 5) so slow splits
    don't straggle a channel (ReaderSplitUtil.java:59-73).  The Spark
    analogue: input partitions ≈ 3-5× cores."""
    return max(1, channels) * split_factor
