"""Composed curation pipeline: flags, verdicts, report, curated output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators import curate


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "THE quick  brown fox jumps over the lazy dog tonight"),  # exact dup of 0
        (2, "a completely original training document about spark engines"),
        (3, "spam spam spam spam spam spam spam spam"),               # low quality
        (4, "watch the quick brown fox jumps over the lazy dog"),     # contaminated
        (5, "quantum physics lectures for curious graduate students"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "see the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


class TestCurateFlags:
    def test_each_reason_fires(self, spark, corpus, bench_set):
        out = {
            r["doc_id"]: r
            for r in curate.curate_flags(
                corpus, bench_set, quality_min=0.75
            ).collect()
        }
        assert not out[0]["is_exact_dup"] and out[1]["is_exact_dup"]
        assert out[4]["contaminated"]
        # doc 0 shares the benchmark 8-gram window too
        assert out[0]["contaminated"]
        assert out[3]["low_quality"]
        assert out[2]["keep"] and out[5]["keep"]
        assert not out[1]["keep"] and not out[3]["keep"] and not out[4]["keep"]

    def test_drop_ids_listed(self, spark, corpus):
        blocklist = spark.createDataFrame([(5,)], "doc_id long")
        out = {
            r["doc_id"]: r
            for r in curate.curate_flags(
                corpus, None, quality_min=None, drop_ids=blocklist
            ).collect()
        }
        assert out[5]["is_listed"] and not out[5]["keep"]
        assert not out[2]["is_listed"] and out[2]["keep"]


class TestCurate:
    def test_output_is_kept_redacted_split(self, spark, corpus, bench_set):
        docs = corpus.withColumn(
            "text",
            F.when(
                F.col("doc_id") == 2,
                F.concat(F.col("text"), F.lit(" mail bob@example.com")),
            ).otherwise(F.col("text")),
        )
        out = {r["doc_id"]: r for r in
               curate.curate(docs, bench_set, quality_min=0.75).collect()}
        assert set(out) == {2, 5}
        assert "<EMAIL>" in out[2]["text"]
        assert all(r["split"] in ("train", "val", "test")
                   for r in out.values())

    def test_report_counts(self, spark, corpus, bench_set):
        flagged = curate.curate_flags(corpus, bench_set, quality_min=0.75)
        rep = curate.curation_report(flagged).first()
        assert rep["n_docs"] == 6
        assert rep["n_exact_dup"] == 1
        # docs 0, 4 and the exact-dup 1 all share the benchmark window
        assert rep["n_contaminated"] == 3
        assert rep["n_low_quality"] >= 1
        assert rep["n_kept"] == 2
        assert rep["kept_frac"] == pytest.approx(2 / 6)


class TestCurateCLI:
    def test_cmd_curate_end_to_end(self, spark, tmp_path):
        import duckdb
        import json as _json
        from jsonschema_spark.cli import main

        out = tmp_path / "out"
        cfg = {
            "source": "/root/testdata/sf0.001/documents.parquet",
            "where": "doc_id % 40 <> 0",
            "benchmark": "/root/testdata/sf0.001/documents.parquet",
            "benchmark_where": "doc_id % 40 = 0",
            "quality_min": 0.3,
            "split": {"train": 0.8, "val": 0.1, "test": 0.1},
            "output": {"curated": str(out / "curated"),
                        "report": str(out / "report")},
        }
        cfg_path = tmp_path / "curate.json"
        cfg_path.write_text(_json.dumps(cfg))
        assert main(["curate", str(cfg_path)]) == 0

        rep = duckdb.sql(
            f"SELECT * FROM parquet_scan('{out}/report/*.parquet')"
        ).df().iloc[0]
        assert rep["n_docs"] == 487
        assert 0 < rep["n_contaminated"] < 487
        assert rep["n_kept"] > 0
        assert rep["n_kept"] == int(duckdb.sql(
            f"SELECT count(*) FROM parquet_scan('{out}/curated/*/*.parquet', hive_partitioning=1)"
        ).fetchone()[0])
        splits = {
            s for (s,) in duckdb.sql(
                f"SELECT DISTINCT split FROM parquet_scan('{out}/curated/*/*.parquet', hive_partitioning=1)"
            ).fetchall()
        }
        assert splits <= {"train", "val", "test"} and "train" in splits


def test_boilerplate_flag(spark):
    from jsonschema_spark.operators import curate as C

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, shared),                            # all windows shared with 2
        (2, shared),
        (3, "completely unique words that nobody else ever typed here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = C.curate_flags(
        df, quality_min=None, span_dup_max=0.5,
        span_width=4, span_winnow=2,
    )
    got = {r["doc_id"]: (r["boilerplate"], r["keep"]) for r in flagged.collect()}
    assert got[3] == (False, True)
    # doc 1 keeps (min-id exact-dup keeper) but is boilerplate-flagged;
    # doc 2 is both an exact dup and boilerplate
    assert got[1][0] is True and got[1][1] is False
    assert got[2] == (True, False)
    rep = C.curation_report(flagged).collect()[0]
    assert rep["n_boilerplate"] == 2 and rep["n_kept"] == 1


def test_boilerplate_off_by_default(spark):
    from jsonschema_spark.operators import curate as C

    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")],
                               "doc_id long, text string")
    flagged = C.curate_flags(df, quality_min=None)
    assert flagged.filter("boilerplate").count() == 0


def test_semantic_decontaminate(spark):
    from jsonschema_spark.operators.decontam import semantic_decontaminate

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["max_cosine"]
           for r in semantic_decontaminate(corpus, bench, 0.6, dims=2).collect()}
    # vec 1 identical (cos 1.0); vec 3 at 45 deg (cos ~0.707); vec 2 orthogonal
    assert set(got) == {1, 3}
    assert got[1] == 1.0 and abs(got[3] - 0.707107) < 1e-6
