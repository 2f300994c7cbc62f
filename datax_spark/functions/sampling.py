"""Deterministic sampling + sequence packing for training-data pipelines.

Training-set construction at 100 TB needs samples that are REPRODUCIBLE
(re-running the job, repartitioning the input, or adding files must not
change which documents are kept) and AUDITABLE (an SQL engine must be able
to re-derive the exact selection).  Spark's ``df.sample``/``sampleBy`` are
neither — their outcome depends on partitioning and RNG stream position.
Everything here keys the decision on a content hash instead:

- ``hash_sample``: keep a row iff ``md5(key) mod 1e6 < fraction*1e6`` —
  partitioning-independent, stable across runs, and joins/dedups agree on
  the kept set because the key decides.
- ``stratified_hash_sample``: per-stratum fractions (e.g. downsample 'en',
  keep all 'zh') via one CASE over the same hash — the stratified-sampling
  shape of every data-mixing recipe, as a single narrow scan with NO
  shuffle (vs sampleBy's RNG).
- ``pack_sequences``: greedy contiguous sequence packing — assign documents
  to fixed token-budget packs (context windows) in a deterministic order.
  One window cumsum per stratum (shuffle on the stratum key only); the
  classic ``bin = floor((cumsum - tokens) / budget)`` rule, so a pack may
  overflow by at most one document (the standard scale-friendly
  approximation of bin packing — exact first-fit is inherently
  sequential).

All pure Column expressions (no Python row path); the md5-prefix hash
(``text.hash60``) is reproducible bit-for-bit in any SQL engine, which is
what the DuckDB suite oracles verify.

Reference contrast: DataX has no sampling/packing operators at all — its
record path is a FIFO pipe (core/.../transport/channel/Channel.java); these
belong to the training-data layer this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datax_spark.functions.text import hash60, tokens

_MOD = 1_000_000


def sample_hash(key_cols: list[str], salt: str = "") -> Column:
    """The sampling hash: 0..999999, uniform, keyed on (salt, *key_cols).
    Exposed so callers (and oracles) can inspect the raw draw."""
    h = hash60(F.concat_ws("\x1f", F.lit(salt),
                           *[F.col(c).cast("string") for c in key_cols]))
    return F.pmod(h, F.lit(_MOD))


def hash_sample(
    df: DataFrame, key_cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``key_cols``.

    ``salt`` derives independent samples from the same keys (e.g. train
    vs holdout: two salts, disjointness NOT guaranteed; for a split use
    one draw and range-partition it)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(sample_hash(key_cols, salt) < int(fraction * _MOD))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions[stratum]`` of each
    stratum's rows survive (``default`` for unlisted strata).  One CASE
    over one hash — a narrow scan, no shuffle, no RNG."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0,1], got {f}")
    thresh = F.lit(int(default * _MOD))
    for s, f in fractions.items():
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(f * _MOD))
        ).otherwise(thresh)
    return df.filter(sample_hash(key_cols, salt) < thresh)


def pack_sequences(
    df: DataFrame,
    token_col: Column | str,
    budget: int,
    order_col: str,
    strata_cols: list[str],
) -> DataFrame:
    """Assign each row a ``pack_id`` so consecutive rows (by ``order_col``,
    within each stratum) share a pack of ~``budget`` tokens — sequence
    packing for context-window construction.

    Emits ``__tokens`` (the row's token count), ``__cum`` (running total
    within the stratum) and ``pack_id`` (``floor((cum - tokens)/budget)``,
    0-based per stratum).  A pack may exceed ``budget`` by less than one
    document; rows longer than ``budget`` get a pack to themselves (plus
    whatever trailing room the rule grants — split long docs upstream).

    Scale: one window per stratum — the shuffle is on ``strata_cols`` and
    each stratum sorts locally.  ``strata_cols`` is REQUIRED: a global
    (unpartitioned) window would serialize the whole table through one
    task.  Use a natural shard key (language, source, date bucket)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not strata_cols:
        raise ValueError(
            "strata_cols is required: an unpartitioned window cumsum would "
            "run the entire table through a single task"
        )
    from pyspark.sql import Window

    tok = (F.col(token_col) if isinstance(token_col, str) else token_col) \
        .cast("long")
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("__tokens", tok)
    out = out.withColumn("__cum", F.sum("__tokens").over(w))
    return out.withColumn(
        "pack_id",
        F.floor((F.col("__cum") - F.col("__tokens")) / F.lit(budget)),
    )


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Disjoint deterministic train/val/test split: ONE hash draw,
    range-partitioned by cumulative weights (insertion order), emitted as
    ``split_col``.  Unlike two independent samples, the splits are disjoint
    and exhaustive by construction; like everything here, membership is a
    pure function of the key, so files can be added or the job re-run
    without any row switching splits."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = sample_hash(key_cols, salt)
    expr = None
    cum = 0.0
    for name, wgt in weights.items():
        cum += wgt
        cond = h < int(round(cum * _MOD))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    return df.withColumn(split_col, expr)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split long documents into ~``chunk_tokens``-token chunks with
    ``overlap`` tokens of context carried between consecutive chunks — the
    upstream half of :func:`pack_sequences` (packing assumes no document
    exceeds the budget).

    Emits one row per chunk: ``keep_cols`` (default: all input columns) +
    ``chunk_ix`` (0-based), ``chunk`` (the chunk text, whitespace-joined)
    and ``chunk_tokens``.  Empty documents produce no rows.  Pure Column
    expressions — `sequence` + `posexplode` + `slice`, no Python row path,
    and chunking parallelizes per document with NO shuffle at all."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap
    keep = keep_cols if keep_cols is not None else list(df.columns)
    toks = tokens(text_col)
    n = F.size(toks)
    # chunk start offsets: 0, step, 2*step, ... while start < n - overlap —
    # a start whose window would hold ONLY carried-over overlap tokens is
    # not a chunk (so n <= chunk_tokens yields exactly one chunk)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.greatest(n - overlap, F.lit(1)) - 1,
                   F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    out = df.select(*keep, toks.alias("__toks"),
                    F.posexplode(starts).alias("chunk_ix", "__start"))
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return out.select(
        *keep,
        F.col("chunk_ix").cast("long").alias("chunk_ix"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("long").alias("chunk_tokens"),
    )


def token_count(col) -> Column:
    """Whitespace token count (the packing weight used by the suite)."""
    return F.size(tokens(col)).cast("long")


def weighted_sample_topk(
    df: DataFrame,
    key_cols: list[str],
    weight_col: Column | str,
    k: int,
    strata_cols: list[str],
    salt: str = "",
    key_out: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — keep the ``k``
    rows of each stratum with the smallest Efraimidis–Spirakis exponential
    key ``e = -ln(u) / w`` (equivalently, the k largest ``u^(1/w)``), where
    the uniform draw ``u`` comes from the content hash, not an RNG.  A row
    with twice the weight is (asymptotically) twice as likely to be kept,
    selection is a pure function of (salt, key, weight), and re-running,
    repartitioning, or adding files never changes which rows survive —
    the same reproducibility contract as :func:`hash_sample`.

    Cross-engine determinism: ``u = (hash_draw + 0.5) / 1e6`` takes only
    1e6 distinct values; JVM ``Math.log`` and C libm ``log`` disagree on
    811 of them by 1 ulp (measured), and ROUNDING THE KEY TO 9 DECIMALS
    collapses every divergence (0 mismatches across all tested weights) —
    so the emitted ``key_out`` column (and therefore the top-k selection,
    tie-broken by the raw hash draw then the key columns) is reproducible
    bit-for-bit in any IEEE SQL engine.  Rows with ``w <= 0`` or NULL
    weight are never sampled.

    Scale: one hash + one ln per row (narrow scan), then a per-stratum
    top-k window — the shuffle is on ``strata_cols`` only, and each
    stratum sorts locally.  ``strata_cols`` is REQUIRED for the same
    reason as :func:`pack_sequences`: a global top-k window would
    serialize the table through one task (for a global sample, pre-shard
    into synthetic strata and re-rank the k·shards survivors)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not strata_cols:
        raise ValueError(
            "strata_cols is required: an unpartitioned top-k window would "
            "run the entire table through a single task"
        )
    from pyspark.sql import Window

    w = (F.col(weight_col) if isinstance(weight_col, str)
         else weight_col).cast("double")
    draw = sample_hash(key_cols, salt)
    u = (draw.cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    es = F.round(-F.log(u) / w, 9)
    out = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn(key_out, es)
        .withColumn("__draw", draw)
    )
    win = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(F.col(key_out).asc(), F.col("__draw").asc(),
                 *[F.col(c).asc() for c in key_cols])
    )
    return (
        out.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__draw")
    )
