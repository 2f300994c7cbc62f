"""Incrementally-maintained inverted index (lake/indexview.py).

Contract under test: after every refresh the index row-for-row equals a
fresh tokenization of the CURRENT upstream snapshot — under doc inserts,
content updates (tokens appear/disappear/change frequency), deletes, and
multi-commit ranges folded in one refresh.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.indexview import (
    WATERMARK_PROP,
    create_index_view,
    lookup_postings,
    refresh_index_view,
)
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("body", T.StringType()),
    ]
)


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "docs"), schema=SCHEMA, key_cols=["doc_id"],
        bucket_col="doc_id", num_buckets=4,
    )


def _merge(t, rows, lsn0):
    df = t.spark.createDataFrame(
        [Row(doc_id=d, body=b, op=op, lsn=lsn0 + i)
         for i, (d, b, op) in enumerate(rows)],
        "doc_id long, body string, op string, lsn long",
    )
    merge_into(t, df, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)


def _expected(docs):
    """Direct tokenization of the current snapshot."""
    toks = F.regexp_extract_all(F.lower(F.col("body")),
                                F.lit("[a-z0-9]+"), F.lit(0))
    out = (
        docs.read().select("doc_id", F.explode(toks).alias("token"))
        .groupBy("token", "doc_id").count()
    )
    return sorted((r.token, r.doc_id, r["count"]) for r in out.collect())


def _state(view):
    return sorted((r.token, r.doc_id, r.tf) for r in view.read().collect())


def test_bootstrap_matches_direct_tokenization(spark, tmp_path):
    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "the quick fox", "insert"),
                  (2, "the the THE lazy-dog", "insert"),
                  (3, "", "insert"), (4, None, "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    assert _state(view) == _expected(docs)
    # case folding + tf counting + empty/null docs contribute nothing
    got = dict(((t, d), n) for t, d, n in _state(view))
    assert got[("the", 2)] == 3 and got[("dog", 2)] == 1
    assert not [1 for (t, d), _ in got.items() if d in (3, 4)]
    assert int(view.manifest().properties[WATERMARK_PROP]) == \
        docs.current_version()


def test_incremental_tracks_updates_and_deletes(spark, tmp_path):
    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "alpha beta gamma", "insert"),
                  (2, "beta beta delta", "insert"),
                  (3, "gamma epsilon", "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    # update: tokens appear (zeta), disappear (alpha), change tf (beta);
    # delete: doc 3's postings must vanish
    _merge(docs, [(1, "beta beta zeta", "insert"), (3, "", "delete")],
           lsn0=100)
    out = refresh_index_view(docs, view)
    assert out["applied"]
    assert _state(view) == _expected(docs)
    got = dict(((t, d), n) for t, d, n in _state(view))
    assert ("alpha", 1) not in got and got[("beta", 1)] == 2
    assert got[("zeta", 1)] == 1
    assert not [1 for (t, d), _ in got.items() if d == 3]


def test_multi_commit_range_folds_to_net_state(spark, tmp_path):
    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "one two", "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    # three commits before a single refresh: update, update, delete+insert
    _merge(docs, [(1, "two three", "insert")], lsn0=10)
    _merge(docs, [(1, "three four four", "insert")], lsn0=20)
    _merge(docs, [(1, "", "delete"), (2, "five", "insert")], lsn0=30)
    out = refresh_index_view(docs, view)
    assert out["applied"]
    assert _state(view) == _expected(docs) == [("five", 2, 1)]


def test_refresh_replay_is_noop(spark, tmp_path):
    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "a b c", "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    _merge(docs, [(2, "c d", "insert")], lsn0=10)
    assert refresh_index_view(docs, view)["applied"]
    v = view.current_version()
    out = refresh_index_view(docs, view)
    assert not out["applied"] and view.current_version() == v
    assert _state(view) == _expected(docs)


def test_lookup_is_pruned_point_read(spark, tmp_path):
    docs = _mk(spark, tmp_path)
    # distinct vocabularies per doc so the token-clustered index spreads
    # across many files with narrow token ranges
    rows = [(d, " ".join(f"w{d:03d}x{j}" for j in range(5)), "insert")
            for d in range(60)]
    _merge(docs, rows, lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=8)
    view.compact(sort_cols=["token"])
    plan = view.scan_plan(where=[("token", "in", ["w003x1", "w003x2"])])
    assert plan["files_kept"] < plan["files_total"]  # non-vacuous pruning
    got = sorted((r.token, r.doc_id, r.tf)
                 for r in lookup_postings(view, ["w003x1", "w003x2"])
                 .collect())
    assert got == [("w003x1", 3, 1), ("w003x2", 3, 1)]


def test_contract_validation(spark, tmp_path):
    docs = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not in upstream"):
        create_index_view(docs, str(tmp_path / "ix1"), "nope")
    with pytest.raises(ValueError, match="must be string"):
        create_index_view(docs, str(tmp_path / "ix2"), "doc_id")
    with pytest.raises(ValueError, match="no indexview spec"):
        refresh_index_view(docs, docs)


def test_refresh_with_no_tokenizable_changes(spark, tmp_path):
    """A change range whose docs produce zero postings (empty content)
    still advances the watermark without corrupting the index."""
    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "alpha", "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    _merge(docs, [(2, "", "insert")], lsn0=10)
    out = refresh_index_view(docs, view)
    assert int(view.manifest().properties[WATERMARK_PROP]) == \
        docs.current_version()
    assert _state(view) == _expected(docs) == [("alpha", 1, 1)]
    assert not refresh_index_view(docs, view)["applied"]


def test_index_views_declared_in_spec(spark, tmp_path):
    """A job.json can declare inverted-index views over a target string
    column: created on first run, refreshed from the before-image
    changelog on later runs."""
    from datax_spark import fixtures
    from datax_spark.jobspec import JobSpec, run_job

    fixtures.change_events(spark, 800, n_keys=150, seed=42) \
        .write.parquet(str(tmp_path / "feed"))
    spec = JobSpec.from_dict({
        "source": {"path": str(tmp_path / "feed")},
        "target": {
            "location": str(tmp_path / "lake"),
            "key_cols": ["repo", "path", "commit"],
            "bucket_col": "repo",
            "num_buckets": 8,
        },
        "merge": {"mode": "mor", "auto_compact": None},
        "run": {"kind": "incremental", "batch_lsns": 500},
        "index_views": [{
            "location": str(tmp_path / "ix"),
            "content_col": "content",
        }],
    })
    assert spec.pre_check(spark) == []
    summary = run_job(spark, spec)
    iv = summary["index_views"][0]
    assert iv["created"] and "error" not in iv

    docs = LakeTable(spark, str(tmp_path / "lake"))
    view = LakeTable(spark, str(tmp_path / "ix"))
    toks = F.regexp_extract_all(F.lower(F.col("content")),
                                F.lit("[a-z0-9]+"), F.lit(0))
    expected = sorted(
        ((r.token, r.repo, r.path, r.commit), r["count"])
        for r in docs.read()
        .select("repo", "path", "commit", F.explode(toks).alias("token"))
        .groupBy("token", "repo", "path", "commit").count().collect()
    )
    got = sorted(
        ((r.token, r.repo, r.path, r.commit), r.tf)
        for r in view.read().collect()
    )
    assert got == expected
    # idempotent rerun: no new data, no refresh
    summary2 = run_job(spark, spec)
    assert summary2["batches"] == 0
    assert summary2["index_views"][0]["applied"] is False

    # pre_check rejects a non-string / missing content col
    bad = JobSpec.from_dict({**spec.to_dict(),
                             "index_views": [{"location": str(tmp_path / "ix2"),
                                              "content_col": "nope"}]})
    assert any("content column not in feed" in p
               for p in bad.pre_check(spark))


def test_cli_search_ranks_by_match_then_tf(spark, tmp_path, capsys):
    import json as _json

    from datax_spark import cli

    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "spark spark shuffle", "insert"),
                  (2, "spark shuffle merge", "insert"),
                  (3, "merge only", "insert")], lsn0=0)
    create_index_view(docs, str(tmp_path / "ix"), "body", num_buckets=4)
    rc = cli.main(["search", str(tmp_path / "ix"), "spark", "shuffle",
                   "--topk", "2", "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"]
    # doc 2 matches both terms (tf 2), doc 1 matches both (tf 3) -> doc 1
    # first by score; doc 3 (one term) excluded by topk
    assert [h["doc_id"] for h in out["hits"]] == [1, 2]
    # non-index table -> clean error
    rc = cli.main(["search", str(tmp_path / "docs"), "spark",
                   "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and "no indexview spec" in out["error"]


def test_tail_live_index_views(spark, tmp_path):
    """tail_live_index_views refreshes the index inside each micro-batch;
    the post-run refresh then has nothing to do."""
    from datax_spark import fixtures
    from datax_spark.jobspec import JobSpec, run_job
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1000, n_keys=200, seed=42)
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=4)
    spec = JobSpec.from_dict({
        "source": {"path": str(tmp_path / "feed")},
        "target": {
            "location": str(tmp_path / "lake"),
            "key_cols": ["repo", "path", "commit"],
            "bucket_col": "repo",
            "num_buckets": 8,
        },
        "merge": {"mode": "mor", "auto_compact": None},
        "run": {"kind": "tail", "tail_idle_stop_sec": 3,
                "tail_trigger": "250 milliseconds",
                "max_files_per_trigger": 2,
                "tail_live_index_views": True},
        "index_views": [{
            "location": str(tmp_path / "ix"),
            "content_col": "content",
        }],
    })
    assert spec.pre_check(spark) == []
    summary = run_job(spark, spec)
    assert summary["rows"] == 1000 and summary["batches"] >= 2
    iv = summary["index_views"][0]
    assert iv.get("error") is None and iv["applied"] is False
    docs = LakeTable(spark, str(tmp_path / "lake"))
    view = LakeTable(spark, str(tmp_path / "ix"))
    toks = F.regexp_extract_all(F.lower(F.col("content")),
                                F.lit("[a-z0-9]+"), F.lit(0))
    expected = sorted(
        ((r.token, r.repo, r.path, r.commit), r["count"])
        for r in docs.read()
        .select("repo", "path", "commit", F.explode(toks).alias("token"))
        .groupBy("token", "repo", "path", "commit").count().collect()
    )
    got = sorted(
        ((r.token, r.repo, r.path, r.commit), r.tf)
        for r in view.read().collect()
    )
    assert got == expected


def test_search_bm25_doclen_view_matches_fallback(spark, tmp_path):
    """BM25 with the incremental doc-length rollup equals BM25 with the
    one-shot length aggregate, through a refresh cycle."""
    from datax_spark.lake.aggview import create_agg_view, refresh_agg_view
    from datax_spark.lake.indexview import search_bm25

    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "spark merge scan scan", "insert"),
                  (2, "scan window window", "insert"),
                  (3, "merge window", "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    doclen = create_agg_view(view, str(tmp_path / "dl"), dims=["doc_id"],
                             sums=["tf"], num_buckets=2)
    _merge(docs, [(2, "scan scan scan", "insert"), (3, "", "delete")],
           lsn0=100)
    refresh_index_view(docs, view)
    refresh_agg_view(view, doclen)
    a = [(r.doc_id, r.score) for r in
         search_bm25(view, ["scan", "merge"], k=10, doclen=doclen)
         .collect()]
    b = [(r.doc_id, r.score) for r in
         search_bm25(view, ["scan", "merge"], k=10).collect()]
    assert a == b and len(a) == 2  # doc 3 deleted
    with pytest.raises(ValueError, match="empty query"):
        search_bm25(view, [])


def test_cli_search_bm25_mode(spark, tmp_path, capsys):
    import json as _json

    from datax_spark import cli
    from datax_spark.lake.aggview import create_agg_view

    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "spark spark shuffle", "insert"),
                  (2, "spark shuffle merge", "insert")], lsn0=0)
    view = create_index_view(docs, str(tmp_path / "ix"), "body",
                             num_buckets=4)
    create_agg_view(view, str(tmp_path / "dl"), dims=["doc_id"],
                    sums=["tf"], num_buckets=2)
    rc = cli.main(["search", str(tmp_path / "ix"), "spark", "--bm25",
                   "--doclen", str(tmp_path / "dl"), "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["ranking"] == "bm25"
    assert [h["doc_id"] for h in out["hits"]] == [1, 2]  # tf 2 beats 1
    assert all("score" in h for h in out["hits"])


# ------------------------------------------------------ property-based churn
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

doc_churn = st.lists(
    st.tuples(
        st.sampled_from(["insert", "delete"]),
        st.integers(0, 4),                                   # doc key
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),  # tokens
                 min_size=0, max_size=5),
    ),
    min_size=1, max_size=20,
)


@given(events=doc_churn, cut=st.integers(1, 8))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
def test_index_matches_direct_tokenization_for_random_churn(
    spark, tmp_path_factory, events, cut
):
    """Any doc insert/delete interleaving with repeated tokens and tf
    changes, split at an arbitrary refresh boundary, leaves the index
    equal to direct tokenization of the final snapshot."""
    tmp = tmp_path_factory.mktemp("ixprop")
    docs = _mk(spark, tmp)
    view = create_index_view(docs, str(tmp / "ix"), "body", num_buckets=2)

    def apply_chunk(chunk, lsn0):
        _merge(docs, [(k, " ".join(toks), op) for op, k, toks in chunk],
               lsn0=lsn0)

    n = max(1, min(cut, len(events)))
    apply_chunk(events[:n], lsn0=100)
    refresh_index_view(docs, view)
    if events[n:]:
        apply_chunk(events[n:], lsn0=1000)
        refresh_index_view(docs, view)
    assert _state(view) == _expected(docs)


def test_fact_schema_evolution_under_views(spark, tmp_path):
    """A column added to the fact table mid-life must not break view
    refreshes: the join view keeps its declared output columns (the new
    column is simply not part of the view), and the index view keeps
    indexing its content column."""
    from datax_spark.lake.joinview import (
        create_join_view,
        refresh_join_view,
    )

    docs = _mk(spark, tmp_path)
    _merge(docs, [(1, "alpha beta", "insert")], lsn0=0)
    ix = create_index_view(docs, str(tmp_path / "ix"), "body",
                           num_buckets=2)
    dim = LakeTable.create(
        spark, str(tmp_path / "dim"),
        schema=T.StructType([
            T.StructField("dk", T.LongType()),
            T.StructField("seg", T.StringType()),
        ]),
        key_cols=["dk"], bucket_col="dk", num_buckets=2,
    )
    merge_into(dim, spark.createDataFrame(
        [Row(dk=1, seg="A", op="insert", lsn=0)],
        "dk long, seg string, op string, lsn long",
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None)
    # evolve the fact schema mid-life (a new column arrives with the
    # change batch; merge_into's evolve_schema widens the table)
    df = spark.createDataFrame(
        [Row(doc_id=2, body="beta gamma", extra="NEW", op="insert",
             lsn=10)],
        "doc_id long, body string, extra string, op string, lsn long",
    )
    merge_into(docs, df, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)  # evolve_schema=True adds `extra`
    assert "extra" in [f.name for f in docs.schema().fields]
    out = refresh_index_view(docs, ix)
    assert out["applied"]
    got = {(r.token, r.doc_id) for r in ix.read().collect()}
    assert ("gamma", 2) in got and ("alpha", 1) in got
