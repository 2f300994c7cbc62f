"""The demo 60-second tour (demo/README.md) runs green end to end:
fixtures → dry-run → run (DLQ fills, three view kinds bootstrap) →
idempotent rerun → DLQ replay with a fix chain → drained DLQ → index
search → SCD2 history job → maintenance.  Exactly the CLI commands the
README shows, with demo-relative paths retargeted into tmp_path."""

import json
import os
import shutil

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _retarget(name: str, tmp_path) -> str:
    """Copy a demo job spec with demo/out/ rewritten into tmp_path."""
    with open(os.path.join(REPO, "demo", name), encoding="utf-8") as f:
        text = f.read()
    text = text.replace("demo/out", str(tmp_path / "out"))
    dst = str(tmp_path / name)
    with open(dst, "w", encoding="utf-8") as f:
        f.write(text)
    return dst


def _last_json(capsys) -> dict:
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_demo_tour(spark, tmp_path, capsys, monkeypatch):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datax_spark import cli, fixtures
    from datax_spark.lake.table import LakeTable

    out = str(tmp_path / "out")
    # step 0 — make_fixtures, inlined against the session fixture (the
    # script builds its own session; same code path otherwise)
    feed = fixtures.change_events(spark, 5000, n_keys=800, seed=7)
    dirty = (feed.filter(F.col("op") == "update").limit(20)
             .withColumn("op", F.lit("upsert")))
    feed.unionByName(dirty).write.mode("overwrite") \
        .parquet(os.path.join(out, "feed"))
    dim = (spark.read.parquet(os.path.join(out, "feed"))
           .select("repo").distinct()
           .withColumn("org", F.concat(
               F.lit("org-"),
               F.pmod(F.xxhash64("repo"), F.lit(7)).cast("string"))))
    dim.write.mode("overwrite").parquet(os.path.join(out, "dim_repo"))
    t = LakeTable.create(
        spark, os.path.join(out, "dim_lake"),
        schema=T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("org", T.StringType()),
        ]),
        key_cols=["repo"], bucket_col="repo", num_buckets=4,
    )
    t.overwrite(dim)

    job = _retarget("job.json", tmp_path)
    job_scd2 = _retarget("job-scd2.json", tmp_path)

    # step 1 — dry-run, then the real run
    assert cli.main(["run", job, "--dry-run", "--cores", "4"]) == 0
    assert _last_json(capsys)["dry_run"]
    assert cli.main(["run", job, "--cores", "4"]) == 0
    s = _last_json(capsys)
    assert s["ok"] and s["rows"] == 5000  # clean rows folded
    assert s["agg_views"][0]["created"]
    assert s["join_views"][0]["created"]
    assert s["index_views"][0]["created"]
    lake = LakeTable(spark, os.path.join(out, "lake"))
    assert "org" in [f.name for f in lake.schema().fields]  # enriched
    assert "sha" in [f.name for f in lake.schema().fields]  # transformed
    assert os.path.isdir(os.path.join(out, "dlq"))  # dirty rows captured

    # step 2 — exactly-once rerun
    assert cli.main(["run", job, "--cores", "4"]) == 0
    assert _last_json(capsys)["batches"] == 0

    # step 3 — DLQ replay with the README's fix chain, then drained
    fix = '[{"name": "dx_replace", "column": "op", "parameters": [0, 6, "update"]}]'
    assert cli.main(["dlq", job, "--cores", "4", "--fix-chain", fix]) == 0
    r = _last_json(capsys)
    # the DLQ captures dirty rows per OBSERVATION: both runs above saw the
    # same 20 (watermarks can't pre-filter rows that fail validation), so
    # 40 replay — the merge's LWW dedup keeps the table exactly-once
    assert r["ok"] and r["replayed"] == 40 and r["still_dirty"] == 0
    assert cli.main(["dlq", job, "--cores", "4"]) == 0
    assert _last_json(capsys)["files"] == 0  # drained

    # step 4 — search the maintained index
    assert cli.main(["search", os.path.join(out, "view_index"),
                     "src", "py", "--cores", "4"]) == 0
    hits = _last_json(capsys)
    assert hits["ok"] and hits["hits"]

    # step 5 — SCD2 history target on the same feed
    assert cli.main(["run", job_scd2, "--cores", "4"]) == 0
    s2 = _last_json(capsys)
    assert s2["ok"] and s2["rows"] == 5000
    hist = LakeTable(spark, os.path.join(out, "lake_history"))
    cols = [f.name for f in hist.schema().fields]
    assert "valid_from" in cols or any("valid" in c for c in cols)

    # step 6 — maintenance
    assert cli.main(["maintain", os.path.join(out, "lake"),
                     "--compact", "--report", "--cores", "4"]) == 0
    m = _last_json(capsys)
    assert m["ok"] and "report" in m


def test_demo_specs_parse_and_fixture_script_compiles():
    """The shipped demo JSON parses into valid specs and the fixture
    script at least compiles (full execution is the test above)."""
    import py_compile

    from datax_spark.jobspec import JobSpec

    for name in ("job.json", "job-scd2.json"):
        with open(os.path.join(REPO, "demo", name), encoding="utf-8") as f:
            spec = JobSpec.from_dict(json.load(f))
        assert spec.target.location.startswith("demo/out")
    py_compile.compile(os.path.join(REPO, "demo", "make_fixtures.py"),
                       doraise=True)
