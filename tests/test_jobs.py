"""End-to-end job tests — the reference's three scripts, run on fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_portofolio_spark.jobs import ingest_jdbc, ingest_xml, process_daily
from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.sources.jdbc import JdbcWindowSource
from etl_portofolio_spark.streaming.incremental import IncrementalRunner

from .conftest import SF_DIR

_FMT = "%a %b %d %H:%M:%S UTC %Y"


def fake_api(url: str, xml_body: str, window_id: str) -> str:
    """CSV in the API's Java-locale date format (E MMM d HH:mm:ss z yyyy)."""
    start = datetime.strptime(window_id, "%Y-%m-%d %H:%M:%S")
    header = "waktu,appId_String,clientAddr,serverAddr,transactions,delay,throughput"
    rows = [
        f"{(start + timedelta(minutes=i)).strftime(_FMT)},app{i % 3},10.0.0.{i},10.1.0.{i},{i}.0,0.5,{i * 10}.0"
        for i in range(5)
    ]
    return "\n".join([header] + rows)


def test_ingest_xml_job_end_to_end(spark, tmp_path):
    target = str(tmp_path / "xml_tbl")
    n = ingest_xml.run(
        spark,
        datetime(2024, 1, 1, 0, 0),
        datetime(2024, 1, 1, 0, 10),  # two 5-min windows
        target,
        allowlist=["app0", "app1"],  # drops app2 rows
        fetcher="tests.test_jobs:fake_api",
    )
    out = spark.read.parquet(target)
    # 2 windows x 5 rows, minus app2 rows (i in {2}) per window
    assert n == out.count() == 2 * 4
    row = out.orderBy("waktu").first()
    # +7h shift applied and string date parts derived
    assert row["jam"] == "07" and row["tahun"] == "2024"
    assert set(out.select("ds").distinct().toPandas()["ds"]) == {"20240101"}
    # idempotent rerun
    ingest_xml.run(
        spark,
        datetime(2024, 1, 1, 0, 0),
        datetime(2024, 1, 1, 0, 10),
        target,
        allowlist=["app0", "app1"],
        fetcher="tests.test_jobs:fake_api",
    )
    assert spark.read.parquet(target).count() == 8


def test_ingest_xml_allowlist_csv_stays_distributed(spark, tmp_path, monkeypatch):
    """--allowlist-csv filters via broadcast semi-join, never a driver list.

    collect() is poisoned for the duration: the scale-unsafe shape
    (read CSV -> collect -> isin) would trip it; the semi-join must not.
    """
    csv = tmp_path / "allow.csv"
    csv.write_text("appid\napp0\napp1\n")
    from pyspark.sql import DataFrame

    def _no_collect(self):
        raise AssertionError("allowlist must not be collected to the driver")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    target = str(tmp_path / "xml_tbl_csv")
    n = ingest_xml.run(
        spark,
        datetime(2024, 1, 1, 0, 0),
        datetime(2024, 1, 1, 0, 10),
        target,
        allowlist_csv=str(csv),
        fetcher="tests.test_jobs:fake_api",
    )
    monkeypatch.undo()
    assert n == spark.read.parquet(target).count() == 2 * 4
    got = {r[0] for r in spark.read.parquet(target).select("aplikasi").distinct().collect()}
    assert got == {"app0", "app1"}


def test_ingest_jdbc_transform_contract(spark):
    """The JDBC job's transform: decimal(20,0) counter + ds from clock+7h."""
    df = spark.createDataFrame(
        [(1, 1704067200, 5.0)], "itemid long, clock long, value double"
    )
    out = ingest_jdbc.transform(df)
    row = out.first()
    assert dict(out.dtypes)["value"] == "decimal(20,0)"
    # 2024-01-01 00:00 UTC + 7h => ds 20240101
    assert row["ds"] == "20240101"


def test_ingest_jdbc_runner_wiring(spark, tmp_path, monkeypatch):
    """Runner pulls windows from a stubbed JDBC source and writes parquet."""
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").alias("itemid"),
        F.unix_timestamp("ts").alias("clock"),
        "value",
    ).persist()
    lo = datetime.fromtimestamp(ev.agg(F.min("clock")).first()[0])
    start = datetime(lo.year, lo.month, lo.day)

    src = JdbcWindowSource(url="jdbc:stub", table="history", user="", password="")

    def fake_read(self, spark_, s, e):
        return ev.where(
            (F.col("clock") >= int(s.timestamp())) & (F.col("clock") < int(e.timestamp()))
        )

    monkeypatch.setattr(JdbcWindowSource, "read_window", fake_read)
    target = str(tmp_path / "jdbc_tbl")
    runner = ingest_jdbc.build_runner(spark, src, target)
    results = runner.run(start, start + timedelta(hours=6), timedelta(hours=1))
    written = spark.read.parquet(target).count()
    assert written == sum(r.rows for r in results)
    assert written == ev.where(
        (F.col("clock") >= int(start.timestamp()))
        & (F.col("clock") < int((start + timedelta(hours=6)).timestamp()))
    ).count()
    ev.unpersist()


def test_process_daily_job_end_to_end(spark, tmp_path):
    from etl_portofolio_spark.plans.reference_queries import (
        q_flagship_throughput_pivot,
    )

    full = q_flagship_throughput_pivot(spark, SF_DIR).persist()
    lo, hi = full.agg(F.min("menit_ts"), F.max("menit_ts")).first()
    start = datetime(lo.year, lo.month, lo.day)
    end = datetime(hi.year, hi.month, hi.day) + timedelta(days=1)

    target = str(tmp_path / "daily_tbl")
    runner = process_daily.build_runner(spark, SF_DIR, target)
    runner.run(start, end, timedelta(days=1))
    got = spark.read.parquet(target).drop("ds")
    expected = full.drop("ds")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    full.unpersist()


def test_curate_corpus_job_end_to_end(spark, tmp_path):
    """Dedup-elect -> quality gate -> split -> chunk, written
    idempotently; reruns replace partitions, never duplicate."""
    from etl_portofolio_spark.jobs import curate_corpus

    target = str(tmp_path / "corpus")
    counts = curate_corpus.run(spark, SF_DIR, target)
    assert counts["docs"] > 0 and counts["chunks"] >= counts["docs"]

    docs = spark.read.parquet(f"{target}/docs")
    # dedup: content hashes unique among survivors
    assert docs.count() == docs.select("content_hash").distinct().count()
    # split covers all three buckets deterministically
    assert {r["split"] for r in docs.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
    chunks = spark.read.parquet(f"{target}/chunks")
    # every curated doc chunked, chunk splits consistent with doc splits
    assert chunks.select("doc_id").distinct().count() == counts["docs"]
    joined = chunks.select("doc_id", F.col("split").alias("c_split")).join(
        docs.select("doc_id", "split"), "doc_id"
    )
    assert joined.where(F.col("c_split") != F.col("split")).count() == 0

    # idempotent rerun
    counts2 = curate_corpus.run(spark, SF_DIR, target)
    assert counts2 == counts
    assert spark.read.parquet(f"{target}/docs").count() == counts["docs"]
    assert spark.read.parquet(f"{target}/chunks").count() == counts["chunks"]


def test_curate_corpus_near_dup_absorbs_subset_duplicate(spark, tmp_path):
    """A doc quoted whole inside a longer twin is invisible to exact
    dedup but must be absorbed by the --near-dup stage, with rerun
    idempotency intact."""
    from etl_portofolio_spark.jobs import curate_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # seed = the longest gate-surviving doc, so its tail-extended twin
    # is the longest doc in the corpus and wins any cluster election
    seed = (
        curate_corpus.curated_docs(docs)
        .orderBy(F.length("text").desc(), F.col("doc_id").asc())
        .limit(1)
        .collect()[0]
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    twin = (
        docs.where(F.col("doc_id") == seed["doc_id"])
        .withColumn("doc_id", F.lit(max_id + 1).cast("long"))
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" and then the quick brown fox ran on.")),
        )
        .withColumn("n_chars", F.length("text").cast(dict(docs.dtypes)["n_chars"]))
    )
    src = str(tmp_path / "src")
    docs.unionByName(twin).write.mode("overwrite").parquet(
        f"{src}/documents.parquet"
    )

    plain = curate_corpus.run(spark, src, str(tmp_path / "plain"))
    nd_target = str(tmp_path / "nd")
    nd = curate_corpus.run(spark, src, nd_target, near_dup=True)
    assert nd["docs"] < plain["docs"]  # at least the seed was absorbed

    ids = {r["doc_id"] for r in spark.read.parquet(f"{nd_target}/docs").collect()}
    assert max_id + 1 in ids, "twin (longest) should be its cluster's canonical"
    assert seed["doc_id"] not in ids, "subset-duplicated seed should be absorbed"

    nd2 = curate_corpus.run(spark, src, nd_target, near_dup=True)
    assert nd2 == nd
    assert spark.read.parquet(f"{nd_target}/docs").count() == nd["docs"]


def test_ingest_xml_empty_allowlist_csv_applies_no_filter(spark, tmp_path):
    """A header-only allowlist CSV means 'not configured', not 'deny
    all' — the reference's falsy-list behavior (r4 ADVICE)."""
    csv = tmp_path / "allow_empty.csv"
    csv.write_text("appid\n")
    target = str(tmp_path / "xml_tbl_empty_allow")
    n = ingest_xml.run(
        spark,
        datetime(2024, 1, 1, 0, 0),
        datetime(2024, 1, 1, 0, 10),
        target,
        allowlist_csv=str(csv),
        fetcher="tests.test_jobs:fake_api",
    )
    # all 5 apps per window survive — nothing filtered, nothing dropped
    assert n == spark.read.parquet(target).count() == 2 * 5


def test_build_ann_index_end_to_end(spark, tmp_path):
    """ANN index build: every vector in exactly one cluster-partitioned
    inverted list, partition pruning IS the probe lookup, stored int8
    codes dequantize within the span/510 bound, rerun idempotent."""
    from etl_portofolio_spark.jobs import build_ann_index

    target = str(tmp_path / "idx")
    counts = build_ann_index.run(spark, SF_DIR, target, k=4, iterations=2)
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    assert counts["vectors"] == n

    lists = spark.read.parquet(f"{target}/lists")
    assert lists.select("vec_id").distinct().count() == n == lists.count()
    assert lists.select("cluster_id").distinct().count() <= 4

    # partition pruning = the index lookup: probing one cluster must
    # plan as a PartitionFilter, never a data filter over all lists
    probe_cluster = lists.select("cluster_id").first()[0]
    probe = spark.read.parquet(f"{target}/lists").where(
        F.col("cluster_id") == probe_cluster
    )
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "cluster_id" in pf

    # stored codes reconstruct the original within the quantizer bound
    joined = lists.join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        "vec_id",
    )
    recon = F.transform(
        "codes",
        lambda c: F.col("lo") + c.cast("double") * F.col("span") / F.lit(255.0),
    )
    max_err = F.aggregate(
        F.zip_with(recon, F.col("v"), lambda r, x: F.abs(r - x)),
        F.lit(0.0),
        lambda a, e: F.greatest(a, e),
    )
    bad = joined.where(
        max_err > F.col("span") / F.lit(510.0) + F.lit(1e-9)
    ).count()
    assert bad == 0

    cent = spark.read.parquet(f"{target}/centroids")
    dim = len(emb.select("embedding").first()[0])
    assert cent.count() == cent.select("cluster_id").distinct().count() * dim

    counts2 = build_ann_index.run(spark, SF_DIR, target, k=4, iterations=2)
    assert counts2 == counts
    assert spark.read.parquet(f"{target}/lists").count() == n


def test_ann_index_probe_serves_near_neighbors(spark, tmp_path):
    """Serving from the written index: probe selection from the
    centroid table, corpus read partition-pruned to nprobe clusters,
    dequantized cosine ranking recovers true near neighbors."""
    from etl_portofolio_spark.jobs import build_ann_index
    from etl_portofolio_spark.operators.similarity import brute_force_topk

    target = str(tmp_path / "idx")
    build_ann_index.run(spark, SF_DIR, target, k=4, iterations=2)
    emb = load_table(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]

    got = build_ann_index.probe_index(spark, target, qvec, nprobe=2, k=4)
    rows = got.collect()
    assert len(rows) == 4
    ids = [r["vec_id"] for r in rows]
    assert ids[0] == 0 and rows[0]["cosine"] > 0.999  # finds itself first

    truth = {
        r["neighbor_id"]
        for r in brute_force_topk(emb, query_ids=(0,), k=3).collect()
    }
    # at nprobe=2 of 4 clusters the probe must recover at least one
    # true top-3 neighbor (deterministic on the fixture)
    assert truth & set(ids[1:]), f"no true neighbor in {ids}, truth {truth}"


def test_maintain_tables_sweeps_and_compacts(spark, tmp_path):
    """Maintenance loop: retention drops old partitions, compaction
    rewrites ONLY over-threshold partitions down to the target file
    count, values survive the rewrite, and a rerun is a no-op."""
    from etl_portofolio_spark.jobs.maintain_tables import run_maintenance
    from etl_portofolio_spark.sinks.writer import partition_file_stats

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"2024010{1 + i % 3}") for i in range(300)], "k long, ds string"
    )
    # 20 small files in each of 3 partitions
    (
        df.repartition(20)
        .write.partitionBy("ds")
        .mode("overwrite")
        .parquet(path)
    )
    before = dict(
        (v, n) for v, n, _ in partition_file_stats(spark, path, "ds")
    )
    assert before["20240102"] >= 15

    summary = run_maintenance(
        spark,
        path,
        keep_from="20240102",
        max_files_per_partition=8,
    )
    assert summary["dropped"] == ["20240101"]
    assert set(summary["compacted"]) == {"20240102", "20240103"}
    after = partition_file_stats(spark, path, "ds")
    assert [v for v, _, _ in after] == ["20240102", "20240103"]
    assert all(n <= 8 for _, n, _ in after)
    # data intact for surviving partitions
    got = spark.read.parquet(path)
    assert got.count() == 200
    assert got.where(F.col("ds") == "20240101").count() == 0

    # rerun: nothing left to drop or compact
    summary2 = run_maintenance(
        spark, path, keep_from="20240102", max_files_per_partition=8
    )
    assert summary2["dropped"] == [] and summary2["compacted"] == {}


def test_ivfpq_index_build_and_probe(spark, tmp_path):
    """IVF+PQ artifact: cluster-partitioned PQ codes + codebook table;
    probe reads only nprobe partitions and the ADC ranking finds the
    query vector itself first, plus at least one true neighbor."""
    from etl_portofolio_spark.jobs import build_ann_index
    from etl_portofolio_spark.operators.similarity import brute_force_topk

    target = str(tmp_path / "idx")
    emb = load_table(spark, SF_DIR, "embeddings")
    counts = build_ann_index.build_index_pq(
        spark, emb, target, k=4, iterations=2
    )
    assert counts["vectors"] == emb.count()
    lists = spark.read.parquet(f"{target}/lists")
    assert {f"code_{j}" for j in range(8)} <= set(lists.columns)
    assert spark.read.parquet(f"{target}/pq_codebook").count() == 8 * 8

    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    got = build_ann_index.probe_index_pq(spark, target, qvec, nprobe=2, k=4)
    # partition pruning: the scan must carry a cluster_id filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "cluster_id" in plan
    rows = got.collect()
    assert len(rows) == 4
    ids = [r["vec_id"] for r in rows]
    assert ids[0] == 0  # ADC finds the query itself first

    truth = {
        r["neighbor_id"]
        for r in brute_force_topk(emb, query_ids=(0,), k=5).collect()
    }
    assert truth & set(ids[1:]), f"no true neighbor in {ids}, truth {truth}"

    # rerun idempotency: same artifact counts
    counts2 = build_ann_index.build_index_pq(
        spark, emb, target, k=4, iterations=2
    )
    assert counts2 == counts
