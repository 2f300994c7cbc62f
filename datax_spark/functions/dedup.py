"""Deduplication operators for document corpora at 100 TB scale.

Exact dedup, n-gram Jaccard, MinHash+LSH, and SimHash — the standard
training-data dedup ladder.  All sketch computation is per-row native
Column expressions (datax_spark.functions.text); only the candidate-pair
generation shuffles, and it shuffles on the *sketch* (shingle / band /
simhash prefix), never on raw content:

- exact:    one hash-aggregate on md5(text) — map-side partial agg, then
            one shuffle of (hash, id) pairs.  O(corpus) scan, tiny shuffle.
- jaccard:  explode distinct shingles → self-join on shingle.  The join key
            is a shingle hash; frequency-capped (``max_df``) to drop
            degenerate hub shingles that would quadratically blow up a
            skewed key (the classic LSH-join skew guard).
- minhash:  k md5-seeded min-hashes → b bands → self-join on (band, sig).
            Collision probability follows the usual (1-(1-j^r)^b) curve; the
            shuffle carries only (band_sig, id).
- simhash:  64→48-bit fingerprint; near-dup = hamming ≤ t.  Pair generation
            joins on ``bit-prefix blocks`` (t+1 blocks: two fingerprints
            within hamming t must agree exactly on ≥1 block — pigeonhole),
            so no O(n²) cross join at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.functions import text as TX


def _finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize the (small) result frame, then release the cached sketch
    intermediates.  Without this, repeated invocations in a long-lived
    session (bench loops, driver correctness rounds) accumulate cached
    blocks until executor storage evicts under pressure.  The result itself
    stays cached — it is a pair list, orders of magnitude smaller than the
    exploded sketch frames it replaces."""
    result = result.persist()
    result.count()
    for c in cached:
        c.unpersist()
    return result


def _parallelize(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism when
    the input has fewer partitions — per-row-heavy sketch computation must
    not be serialized by a small file count (one 5k-row parquet file is one
    partition is one core)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical row per identical text: (doc_id=min id, text_hash, n_copies)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "text_hash", "n_copies")
    )


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int, hashed: bool = False
) -> DataFrame:
    """(id, shingle) exploded distinct n-word shingles + per-doc set size.

    ``hashed=True`` replaces the shingle string with its xxhash64 — the
    join/shuffle key becomes a fixed-width long instead of a variable
    string (cheaper exchange; collision odds ~n²/2^64, immaterial for
    candidate generation)."""
    # shingling is per-row heavy (array exprs over every token); a small
    # single-file input would otherwise run it on ONE core — spread it
    df = _parallelize(df)
    sh = df.select(
        F.col(id_col), TX.word_shingles(text_col, n).alias("__sh")
    ).withColumn("n_shingles", F.size("__sh"))
    shingle = F.explode("__sh").alias("shingle")
    out = sh.select(id_col, "n_shingles", shingle)
    if hashed:
        out = out.select(
            id_col, "n_shingles", F.xxhash64("shingle").alias("shingle")
        )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
    prefilter_k: int | None = None,
    prefilter_bands: int | None = None,
) -> DataFrame:
    """Pairs (a, b, jaccard) with Jaccard(shingles_a, shingles_b) ≥ threshold.

    ``max_df`` drops shingles appearing in more than that many docs before
    the self-join — the skew guard for hub shingles (at corpus scale a
    boilerplate shingle can appear in millions of docs; its join group is
    quadratic).  Dropped shingles only lower the estimate, mirroring
    standard LSH-join practice.

    ``prefilter_k``/``prefilter_bands`` enable MinHash-band candidate
    pruning ("LSH then verify"): candidate pairs come from the banded
    signature self-join, and the exact shingle-intersection join runs only
    over docs appearing in some candidate pair — the scale path that
    replaces the quadratic shingle join mass with O(candidates).  Recall
    follows the usual 1-(1-j^r)^b curve (deterministic md5 hashing: the
    DuckDB oracle reproduces the identical candidate set)."""
    if prefilter_k is not None:
        return _ngram_jaccard_prefiltered(
            df, id_col, text_col, n, threshold, max_df,
            prefilter_k, prefilter_bands or 4,
        )
    # shingle extraction is the expensive pass (array exprs over every doc);
    # cache it — it feeds the df-frequency pass and BOTH join sides
    sh = shingle_sets(df, id_col, text_col, n, hashed=True).persist()
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(freq.filter(F.col("__df") <= max_df), "shingle", "inner").drop(
            "__df"
        )
    a = sh.select(
        F.col(id_col).alias("a"), F.col("n_shingles").alias("na"), "shingle"
    )
    b = sh.select(
        F.col(id_col).alias("b"), F.col("n_shingles").alias("nb"), "shingle"
    )
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = common.withColumn(
        "jaccard",
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")),
    )
    out = jac.filter(F.col("jaccard") >= threshold).select(
        "a", "b", "n_common", F.round("jaccard", 6).alias("jaccard")
    )
    return _finalize(out, sh)


def _minhash_aggs(k: int) -> list:
    """mh_i = min over shingles of hash60(md5(shingle || '#i')) — identical
    formulation in the DuckDB oracles (15-hex md5 prefix → 60-bit long).

    k independent md5 evaluations per shingle, deliberately: cheaper
    families were measured and rejected because banding needs row-wise
    independence — with XOR-seeded or Kirsch-Mitzenmacher (h1 + i*h2)
    permutations the per-row argmins correlate, a band's r rows act like
    one row, and candidate pairs explode (633 → 13k+ at sf0.1, turning
    the LSH prefilter into a near-cross-join).  md5 keeps the permutations
    independent AND bit-identical in DuckDB for the value oracles."""
    return [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"mh{i}")
        for i in range(k)
    ]


def _banded_pairs(sig: DataFrame, id_col: str, k: int, bands: int) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 MinHash band signature."""
    r = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                ",", *[F.col(f"mh{b * r + j}").cast("string") for j in range(r)]
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    melted = sig.select(F.col(id_col), *band_cols).select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("sig")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band_idx", "bs.sig")
    pa = melted.select(F.col(id_col).alias("a"), "band_idx", "sig")
    pb = melted.select(F.col(id_col).alias("b"), "band_idx", "sig")
    return (
        pa.join(pb, ["band_idx", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _ngram_jaccard_prefiltered(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_df: int | None,
    k: int,
    bands: int,
) -> DataFrame:
    """LSH-then-verify: banded MinHash candidates → exact Jaccard verify
    restricted to candidate docs.  Shingles are computed once (cached) and
    feed both the signatures and the verify join."""
    assert k % bands == 0, "prefilter_k must divide into equal bands"
    # NO persist of the exploded string shingles: materializing 10^5+ string
    # rows costs more than recomputing them from the (column-pruned) scan —
    # the signature pass and the verify pass each pipeline the explode
    # inside their own codegen stage instead (measured r1 gotcha).
    sh_str = shingle_sets(df, id_col, text_col, n)
    # persist the per-doc signatures (k longs per doc — tiny): the banded
    # SELF-join would otherwise recompute the whole shingle+agg subtree for
    # both sides (ReusedExchange is not guaranteed across the join)
    sig = sh_str.groupBy(id_col).agg(*_minhash_aggs(k)).persist()
    cand = _banded_pairs(sig, id_col, k, bands)
    sh = sh_str.select(
        id_col, "n_shingles", F.xxhash64("shingle").alias("shingle")
    )
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(
            freq.filter(F.col("__df") <= max_df), "shingle", "inner"
        ).drop("__df")
    # pair-driven verify: intersections are computed only FOR candidate
    # pairs (cand ⋈ shingles(a) ⋈ shingles(b)) — O(Σ_pairs |shingles|)
    # instead of the quadratic shingle self-join; the small cand side
    # broadcasts, so the corpus-side shingle frame never reshuffles twice
    sa = sh.select(
        F.col(id_col).alias("a"), F.col("n_shingles").alias("na"), "shingle"
    )
    sb = sh.select(
        F.col(id_col).alias("b"), F.col("n_shingles").alias("nb"), "shingle"
    )
    common = (
        cand.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = common.withColumn(
        "jaccard",
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")),
    )
    out = jac.filter(F.col("jaccard") >= threshold).select(
        "a", "b", "n_common", F.round("jaccard", 6).alias("jaccard")
    )
    return _finalize(out, sig)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 8
) -> DataFrame:
    """k MinHash values per doc: mh_i = min over shingles of
    (hash60(shingle) XOR seed_i).  One explode + one hash-aggregate."""
    sh = shingle_sets(df, id_col, text_col, n)
    return sh.groupBy(id_col).agg(*_minhash_aggs(k))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of r=k/bands rows; docs sharing any
    band signature become a candidate pair.  Returns (a, b, n_shared_bands,
    est_jaccard = fraction of matching minhashes)."""
    assert k % bands == 0, "k must divide into equal bands"
    r = k // bands
    sig = minhash_signatures(df, id_col, text_col, n, k).persist()
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"mh{b * r + j}").cast("string") for j in range(r)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    melted = banded.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("sig"))
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band_idx", "bs.sig")
    pa = melted.select(F.col(id_col).alias("a"), "band_idx", "sig")
    pb = melted.select(F.col(id_col).alias("b"), "band_idx", "sig")
    cand = (
        pa.join(pb, ["band_idx", "sig"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    sa = sig.select(F.col(id_col).alias("a"), *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(k)])
    sb = sig.select(F.col(id_col).alias("b"), *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(k)])
    est = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0) for i in range(k)
    ) / F.lit(float(k))
    out = (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", "n_shared_bands", F.round(est, 6).alias("est_jaccard"))
    )
    return _finalize(out, sig)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bits: int = TX.SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Pair generation uses prefix-block LSH: split the fingerprint into
    ``max_hamming+1`` blocks; by pigeonhole two fingerprints within the
    distance budget share at least one exact block — join per block, then
    verify true hamming.  Shuffle key = (block_idx, block_value): no cross
    join, survives corpus scale."""
    nblocks = max_hamming + 1
    width = bits // nblocks
    # fingerprints feed both join sides — compute once, in parallel
    fp = _parallelize(df).select(
        F.col(id_col), TX.simhash(text_col, bits).alias("simhash")
    ).persist()
    blocks = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                        .alias("block"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("bl"),
    ).select(id_col, "simhash", "bl.block_idx", "bl.block")
    pa = blocks.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("sh_a"), "block_idx", "block"
    )
    pb = blocks.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("sh_b"), "block_idx", "block"
    )
    cand = (
        pa.join(pb, ["block_idx", "block"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
    )
    out = (
        cand.withColumn("hamming", TX.hamming64("sh_a", "sh_b"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return _finalize(out, fp)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph → ``(id, component)``
    where ``component`` is the smallest id reachable from ``id``.

    The missing end of the dedup ladder: pair emitters (jaccard / LSH /
    simhash / embedding) give EDGES, but "keep one doc per duplicate
    cluster" needs the transitive closure.  Implemented as min-label
    propagation (the MapReduce-CC family, cf. Kiveris et al., "Connected
    Components in MapReduce and Beyond"): every node repeatedly adopts
    the smallest label in its neighborhood; iterate until a fixpoint.
    Each iteration is ONE hash-agg + ONE join on the label graph — O(E)
    shuffle, no driver-side graph, no GraphFrames dependency
    (a near-dup cluster's diameter is small by construction —
    similarity is near-transitive).  Plain propagation converges in
    O(diameter) iterations — the right trade for dedup graphs, whose
    clusters are shallow; a social-graph-scale CC would want the
    large-star/small-star alternation's O(log n).  The fixpoint test
    costs one count per iteration on the joined label frame.

    Deterministic output: min-id labels do not depend on partitioning or
    iteration order.  ``max_iters`` bounds pathological chains; hitting
    it raises rather than returning a half-merged clustering.
    """
    edges = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
        .filter(F.col("s") != F.col("d"))
    )
    # undirected: both directions + self-loop so isolated-in-one-direction
    # nodes keep their own label
    sym = edges.unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()
    # localCheckpoint (not persist): each iteration must TRUNCATE the
    # logical plan, or the nested join lineage grows linearly and the
    # driver's analyzer OOMs after a few dozen iterations — the standard
    # iterative-algorithm discipline (GraphFrames does the same)
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.groupBy("s")
        .agg(F.least(F.min("d"), F.min("s")).alias("label"))
        .select(F.col("s").alias("id"), "label")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # propagate: my new label = min(my label, min over neighbors'
        # labels); one join edge→label + one hash-agg
        prop = (
            sym.join(labels, sym["d"] == labels["id"], "inner")
            .select(sym["s"].alias("id"), F.col("label"))
            .groupBy("id")
            .agg(F.min("label").alias("nbr_label"))
        )
        nxt = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = nxt
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations "
        "— pathological chain graph; raise max_iters"
    )


def dedup_keep_one(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Corpus minus near-duplicates: for every connected component of the
    pair graph, keep ONLY the smallest-id doc; docs in no pair survive
    untouched.  Returns df's full rows plus ``component`` (= kept doc's
    component id; equals the doc's own id for singletons) and ``n_dups``
    (cluster size; 1 for singletons) — the provenance columns a training-
    data pipeline audits dedup rates with."""
    comp = connected_components(pairs, a_col, b_col)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_dups"))
    keep = (
        comp.join(sizes, "component")
        .filter(F.col("id") == F.col("component"))
        .select(F.col("id").alias(id_col), "component", "n_dups")
    )
    # comp spans only docs that appear in some pair — usually a small
    # fraction of the corpus, but not guaranteed broadcastable at 100 TB:
    # leave join strategy to AQE (it broadcasts when sizes allow)
    return (
        df.join(comp.select(F.col("id").alias(id_col)), id_col, "left_anti")
        .withColumn("component", F.col(id_col))
        .withColumn("n_dups", F.lit(1).cast("long"))
        .unionByName(df.join(keep, id_col, "inner"))
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    para_words: int = 10,
) -> DataFrame:
    """Corpus-level exact PARAGRAPH dedup — the C4/RefinedWeb pass that
    removes boilerplate at sub-document granularity: every distinct
    paragraph survives only at its globally FIRST occurrence (order =
    (id, position)); later occurrences are cut and the surviving text is
    reassembled in original order.

    This corpus is single-line, so "paragraph" = consecutive
    ``para_words``-word slice (the :func:`~datax_spark.functions.sampling.
    chunk_documents` derivation); a real web corpus would split on blank
    lines instead — the dedup shape below is identical either way.

    Returns one row per input document: (id, clean_text, n_paras, n_kept) —
    documents whose every paragraph lost keep an empty clean_text.

    Scale shape: explode paragraphs (no shuffle) → ONE hash-aggregate keyed
    by md5(paragraph) picks each paragraph's winner as min(struct(id,pos))
    (map-side partial agg; no corpus-wide window) → join winners back on the
    hash (AQE picks broadcast when the winner set is small) → per-document
    reassembly groupBy.  State is O(distinct paragraphs); nothing all-pairs,
    nothing driver-side.
    """
    from datax_spark.functions.sampling import chunk_documents

    paras = chunk_documents(
        df.select(id_col, text_col), text_col, para_words,
        keep_cols=[id_col],
    ).select(
        F.col(id_col),
        F.col("chunk_ix").alias("pos"),
        F.md5(F.col("chunk")).alias("para_hash"),
        F.col("chunk").alias("para"),
    )
    winners = paras.groupBy("para_hash").agg(
        F.min(F.struct(F.col(id_col).alias("id"), F.col("pos").alias("pos")))
        .alias("w")
    ).select(
        "para_hash", F.col("w.id").alias("__wid"), F.col("w.pos").alias("__wpos")
    )
    kept = paras.join(winners, "para_hash").filter(
        (F.col(id_col) == F.col("__wid")) & (F.col("pos") == F.col("__wpos"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_paras"), F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
