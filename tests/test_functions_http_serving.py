"""Scalar helpers, HTTP source retry semantics, and the serving layer."""

from __future__ import annotations

from pathlib import Path
from unittest.mock import patch

from pyspark.sql import functions as F

from covid19_etl_pipeline_spark.functions.scalars import (
    humanize_number,
    pct,
    per_capita,
    safe_div,
)
from covid19_etl_pipeline_spark.serving import publish_star_schema
from covid19_etl_pipeline_spark.sources import http


def test_scalar_helpers(spark):
    df = spark.createDataFrame(
        [(10.0, 1000.0, 1_000_000.0), (5.0, 0.0, 1234.0), (None, None, None)],
        ["deaths", "cases", "pop"],
    )
    out = df.select(
        safe_div("deaths", "cases").alias("sd"),
        pct("deaths", "cases").alias("p"),
        per_capita("deaths", "pop").alias("pc"),
        humanize_number("pop").alias("h"),
    ).collect()
    assert out[0]["sd"] == 0.01 and out[0]["p"] == 1.0 and out[0]["pc"] == 1.0
    assert out[0]["h"] == "1.00M"
    assert out[1]["sd"] is None and out[1]["p"] is None
    assert out[1]["h"] == "1.23K"
    assert out[2]["h"] is None


def test_download_retries_with_backoff(tmp_path):
    """Reference contract (data_extractor.py:52-91): 3 attempts,
    2**attempt backoff, None after exhaustion."""
    sleeps: list[float] = []
    attempts = {"n": 0}

    def failing_get(*a, **k):
        attempts["n"] += 1
        raise ConnectionError("boom")

    target = tmp_path / "out.csv"
    if http._HAVE_REQUESTS:
        ctx = patch.object(http.requests, "get", side_effect=failing_get)
    else:
        ctx = patch.object(http.urllib.request, "urlopen", side_effect=failing_get)
    with ctx:
        result = http.download_file(
            "http://example.invalid/x.csv", target, retries=3, sleep=sleeps.append
        )
    assert result is None
    assert attempts["n"] == 3
    assert sleeps == [1, 2]  # 2**0, 2**1 between attempts


def test_download_success_streams_chunks(tmp_path):
    payload = b"a,b\n1,2\n" * 3000  # > one 8 KiB chunk

    class FakeResp:
        def raise_for_status(self):
            pass

        def iter_content(self, chunk_size):
            assert chunk_size == http.CHUNK_SIZE
            for i in range(0, len(payload), chunk_size):
                yield payload[i : i + chunk_size]

        def read(self, n):  # urllib path
            raise AssertionError("not used")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    target = tmp_path / "d" / "out.csv"
    if http._HAVE_REQUESTS:
        with patch.object(http.requests, "get", return_value=FakeResp()):
            result = http.download_file("http://example.invalid/x.csv", target)
        assert result == target
        assert target.read_bytes() == payload


def test_named_source_registry(tmp_path):
    reg = http.SourceRegistry()
    reg.register(
        http.NamedSource("covid", "http://example.invalid/c.csv", "covid_{date}.csv")
    )
    assert reg.names() == ["covid"]
    with patch.object(http, "download_file", return_value=Path("/x")) as dl:
        reg.extract("covid", tmp_path, "20260813")
        url, path = dl.call_args[0]
        assert path == tmp_path / "covid_20260813.csv"


def test_publish_star_schema_and_query(spark, tmp_path):
    raw = spark.createDataFrame(
        [
            ("A", "AAA", "2021-01-01", "100", "1", "10", "1", "1000"),
            ("A", "AAA", "2021-01-02", "110", "2", "10", "1", "1000"),
            ("B", "BBB", "2021-01-01", "50", "0", "5", "0", "500"),
        ],
        ["location", "iso_code", "date", "total_cases", "total_deaths",
         "new_cases", "new_deaths", "population"],
    )
    paths = publish_star_schema(spark, raw, str(tmp_path))
    assert set(paths) == {"covid_cases", "aggregated_stats", "global_daily_stats"}
    # ad-hoc SQL surface over the registered views (S9)
    top = spark.sql(
        "SELECT location, total_cases FROM aggregated_stats ORDER BY total_cases DESC"
    ).collect()
    assert top[0]["location"] == "A" and top[0]["total_cases"] == 110.0
    daily = spark.sql("SELECT * FROM global_daily_stats ORDER BY date").collect()
    assert daily[0]["countries_reporting"] == 2
    # audit column stamped on every serving table
    assert "created_at" in spark.table("covid_cases").columns
    # fact is year-partitioned on disk
    assert any(p.name == "year=2021" for p in (tmp_path / "covid_cases").iterdir())


def test_jdbc_sink_round_trip(spark, tmp_path):
    """S8 external-store hand-off (data_loader.py:200-267 analog):
    overwrite = truncate-and-load, append accumulates, partitioned read
    fans out over bounded ranges."""
    from covid19_etl_pipeline_spark.serving import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/servingdb;create=true"
    df = spark.range(50).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("score"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    write_jdbc(df, url, "scores", mode="overwrite", num_partitions=2)
    back = read_jdbc(spark, url, "scores")
    assert back.count() == 50
    assert {f.name for f in back.schema.fields} == {"id", "score", "name"}
    assert back.agg(F.sum("score")).head()[0] == sum(i * 1.5 for i in range(50))

    # truncate-and-append semantics: append stacks, overwrite resets
    write_jdbc(df, url, "scores", mode="append")
    assert read_jdbc(spark, url, "scores").count() == 100
    write_jdbc(df, url, "scores", mode="overwrite")
    assert read_jdbc(spark, url, "scores").count() == 50

    # range-partitioned parallel read: same rows, bounded per-connection
    parted = read_jdbc(
        spark, url, "scores",
        partition_column="id", lower_bound=0, upper_bound=50, num_partitions=4,
    )
    assert parted.count() == 50
    assert parted.rdd.getNumPartitions() == 4


def test_yaml_config_loader(tmp_path):
    """L1/S2 config parity (config/config.yaml:4-66): sources bind into
    the registry, spark block maps onto session kwargs, countries load."""
    from covid19_etl_pipeline_spark.config import (
        build_registry,
        load_config,
        session_kwargs,
    )

    cfg_file = tmp_path / "pipeline.yaml"
    cfg_file.write_text(
        """
data_sources:
  owid_covid:
    url: "https://example.invalid/covid.csv"
    format: "csv"
    description: "cases"
  owid_vaccinations:
    url: "https://example.invalid/vax.csv"
    format: "csv"
spark:
  app_name: "config-driven"
  master: "local[2]"
  config:
    spark.sql.shuffle.partitions: 7
    spark.driver.memory: "2g"
processing:
  countries_of_interest: ["Brazil", "Germany"]
database:
  path: "serve/root"
"""
    )
    cfg = load_config(cfg_file)
    assert [s.name for s in cfg.sources] == ["owid_covid", "owid_vaccinations"]
    assert cfg.countries == ("Brazil", "Germany")
    assert cfg.serving_root == "serve/root"

    reg = build_registry(cfg)
    assert reg.names() == ["owid_covid", "owid_vaccinations"]

    kw = session_kwargs(cfg)
    assert kw["app_name"] == "config-driven"
    assert kw["master"] == "local[2]"
    assert kw["shuffle_partitions"] == 7
    assert kw["extra_conf"] == {"spark.driver.memory": "2g"}

    # malformed config fails loudly, not at first use
    bad = tmp_path / "bad.yaml"
    bad.write_text("data_sources:\n  broken:\n    format: csv\n")
    import pytest

    with pytest.raises(ValueError, match="needs a url"):
        load_config(bad)


def test_config_driven_e2e(spark, tmp_path):
    """--config drives the full E2E exactly like python -m with flags."""
    import covid19_etl_pipeline_spark.__main__ as entry

    cfg_file = tmp_path / "pipeline.yaml"
    cfg_file.write_text(
        """
processing:
  countries_of_interest: ["Demoland"]
"""
    )
    from covid19_etl_pipeline_spark.config import load_config

    cfg = load_config(cfg_file)
    report = entry.run_etl(spark, str(tmp_path / "out"), None, cfg.countries)
    assert set(report["timings"]) == {"extract", "transform", "load"}
    assert (tmp_path / "out" / "serving" / "covid_cases").exists()
    # the countries mart honored the config's IN-list
    marts = report["marts"]
    assert any("countr" in k or "filter" in k for k in marts) or len(marts) >= 3


def test_config_driven_cli_main(spark, tmp_path, capsys):
    """python -m covid19_etl_pipeline_spark --config <yaml> --out <dir>
    (in-process: get_spark getOrCreate reuses the test JVM)."""
    import json as _json

    import covid19_etl_pipeline_spark.__main__ as entry

    cfg_file = tmp_path / "pipeline.yaml"
    cfg_file.write_text(
        """
spark:
  app_name: "cli-config"
processing:
  countries_of_interest: ["Demoland", "Otherland"]
"""
    )
    rc = entry.main(["--config", str(cfg_file), "--out", str(tmp_path / "o")])
    assert rc == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(report["timings"]) == {"extract", "transform", "load"}
    assert (tmp_path / "o" / "serving" / "covid_cases").exists()


def test_write_parquet_bloom_annotates_files(spark, tmp_path):
    """Bloom-filtered files carry the filter bytes: same data written
    with blooms is measurably larger than without (pyarrow here does
    not expose the bloom offset, so size delta is the observable)."""
    import glob
    import os

    from covid19_etl_pipeline_spark.sources.io import write_parquet_bloom

    df = spark.range(20000).selectExpr("id AS k", "CAST(id AS STRING) AS s")
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.coalesce(1).write.parquet(plain)
    write_parquet_bloom(df.coalesce(1), bloomed, ["k"], expected_ndv=20000)
    size = lambda d: sum(
        os.path.getsize(f) for f in glob.glob(d + "/*.parquet")
    )
    assert size(bloomed) > size(plain) + 10_000  # filter bytes present
    assert spark.read.parquet(bloomed).count() == 20000


def test_publish_masked_view_hashes_and_nulls(spark, sf_dir):
    """Masked view: hashed identifier stays joinable (same input, same
    surrogate), nulled measure is gone, other columns untouched."""
    from covid19_etl_pipeline_spark.serving import publish_masked_view

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "cust_raw"
    )
    publish_masked_view(
        spark, "cust_raw", "cust_masked",
        hash_cols=("c_name",), null_cols=("c_acctbal",),
    )
    masked = spark.table("cust_masked")
    assert set(masked.columns) == set(spark.table("cust_raw").columns)
    rows = masked.orderBy("c_custkey").limit(2).collect()
    raw = spark.table("cust_raw").orderBy("c_custkey").limit(2).collect()
    import hashlib

    assert rows[0]["c_name"] == hashlib.md5(raw[0]["c_name"].encode()).hexdigest()
    assert rows[0]["c_acctbal"] is None
    assert rows[0]["c_mktsegment"] == raw[0]["c_mktsegment"]
    # surrogate is deterministic: same name in two reads -> same hash
    assert rows[0]["c_name"] == masked.filter(
        masked.c_custkey == raw[0]["c_custkey"]
    ).first()["c_name"]


def test_versioned_publish_pointer_swap_and_rollback(spark, sf_dir, tmp_path):
    """Two publishes: readers follow _CURRENT to v2; rollback repoints
    to v1 with zero data movement; unknown rollback target raises."""
    import pytest

    from covid19_etl_pipeline_spark.serving import (
        publish_versioned,
        read_current,
        rollback_version,
    )

    root = str(tmp_path)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    publish_versioned(spark, nation, "dim_nation", root, "20260813")
    publish_versioned(spark, nation.limit(5), "dim_nation", root, "20260814")
    assert read_current(spark, "dim_nation", root).count() == 5
    rollback_version("dim_nation", root, "20260813")
    assert read_current(spark, "dim_nation", root).count() == 25
    with pytest.raises(FileNotFoundError):
        rollback_version("dim_nation", root, "19990101")


def test_cached_query_ttl_hit_and_expiry(spark, sf_dir, tmp_path):
    """Within TTL the snapshot is served (source changes invisible);
    after expiry the query re-executes and sees the new data — the
    reference dashboard's ttl=3600 contract, cross-process."""
    import os
    import time

    from covid19_etl_pipeline_spark.serving import cached_query

    spark.read.parquet(f"{sf_dir}/nation.parquet").limit(10).createOrReplaceTempView(
        "cq_nation"
    )
    sql = "SELECT count(*) AS n FROM cq_nation"
    root = str(tmp_path)
    assert cached_query(spark, sql, root, ttl_seconds=3600).first()["n"] == 10

    # source changes under the cache: still served stale within TTL
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("cq_nation")
    assert cached_query(spark, sql, root, ttl_seconds=3600).first()["n"] == 10

    # expire the snapshot: next call re-executes and sees 25
    key_dir = next(p for p in os.listdir(root) if p.startswith("q_"))
    marker = os.path.join(root, key_dir, "_SUCCESS")
    os.utime(marker, (time.time() - 7200, time.time() - 7200))
    assert cached_query(spark, sql, root, ttl_seconds=3600).first()["n"] == 25


def test_governed_publication_capstone(spark, sf_dir, tmp_path):
    """Round-2 serving capstone — the governed publication chain end to
    end: versioned publish with atomic pointer -> masked consumer view
    over the CURRENT version -> TTL-cached query on the masked view ->
    rollback flips what every downstream layer sees, with zero data
    movement."""
    from covid19_etl_pipeline_spark.serving import (
        cached_query,
        publish_masked_view,
        publish_versioned,
        read_current,
        rollback_version,
    )

    root = str(tmp_path / "store")
    cache = str(tmp_path / "cache")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    publish_versioned(spark, cust, "dim_customer", root, "v1")
    publish_versioned(spark, cust.limit(100), "dim_customer", root, "v2")

    read_current(spark, "dim_customer", root).createOrReplaceTempView("cust_cur")
    publish_masked_view(
        spark, "cust_cur", "cust_gov",
        hash_cols=("c_name",), null_cols=("c_acctbal",),
    )
    gov = spark.table("cust_gov")
    assert gov.count() == 100                      # consumers see v2
    assert gov.filter(gov.c_acctbal.isNotNull()).count() == 0
    assert gov.first()["c_name"] not in {r["c_name"] for r in cust.limit(1).collect()}

    # TTL cache serves the governed result; rollback + re-registration
    # changes the physical data, the stale snapshot still serves until
    # expiry (the dashboard-freshness contract)
    n1 = cached_query(
        spark, "SELECT count(*) AS n FROM cust_gov", cache
    ).first()["n"]
    assert n1 == 100
    rollback_version("dim_customer", root, "v1")
    read_current(spark, "dim_customer", root).createOrReplaceTempView("cust_cur")
    publish_masked_view(
        spark, "cust_cur", "cust_gov",
        hash_cols=("c_name",), null_cols=("c_acctbal",),
    )
    assert spark.table("cust_gov").count() == cust.count()  # live view: v1
    n_cached = cached_query(
        spark, "SELECT count(*) AS n FROM cust_gov", cache
    ).first()["n"]
    assert n_cached == 100  # snapshot within TTL stays authoritative


def test_list_versions_metadata(spark, sf_dir, tmp_path):
    from covid19_etl_pipeline_spark.serving import list_versions, publish_versioned

    root = str(tmp_path)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    publish_versioned(spark, nation, "t", root, "v1")
    publish_versioned(spark, nation.limit(4), "t", root, "v2")
    got = {
        r["version"]: (r["n_rows"], r["is_current"])
        for r in list_versions(spark, "t", root).collect()
    }
    assert got == {"v1": (25, False), "v2": (4, True)}


def test_delete_keys_partition_scoped(spark, tmp_path):
    """Targeted delete rewrites only affected partitions, purges
    fully-deleted ones, and never touches unaffected files."""
    import os

    from covid19_etl_pipeline_spark.serving import delete_keys

    path = str(tmp_path / "tbl")
    rows = [
        # (user_id, region, v)
        (1, "eu", 10), (2, "eu", 20), (3, "us", 30),
        (4, "us", 40), (5, "apac", 50),
    ]
    df = spark.createDataFrame(rows, ["user_id", "region", "v"])
    df.write.partitionBy("region").parquet(path)

    def files(part):
        d = os.path.join(path, f"region={part}")
        if not os.path.isdir(d):
            return None
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    us_before = files("us")
    # delete user 1 (partial partition eu) and user 5 (ALL of apac)
    keys = spark.createDataFrame([(1,), (5,)], ["user_id"])
    n = delete_keys(spark, path, keys, ("user_id",), ("region",))
    assert n == 2
    left = spark.read.parquet(path)
    assert {r["user_id"] for r in left.collect()} == {2, 3, 4}
    # untouched partition: identical files, identical mtimes
    assert files("us") == us_before
    # fully-deleted partition directory purged
    assert files("apac") is None
    # idempotent: nothing left to delete
    assert delete_keys(spark, path, keys, ("user_id",), ("region",)) == 0


def test_vacuum_versions_keeps_current_and_newest(spark, tmp_path):
    import os

    from covid19_etl_pipeline_spark.serving import (
        publish_versioned,
        read_current,
        rollback_version,
        vacuum_versions,
    )

    root = str(tmp_path)
    df = spark.createDataFrame([(1,)], ["x"])
    for v in ("2026-01-01", "2026-01-02", "2026-01-03"):
        publish_versioned(spark, df, "t", root, v)
    # roll back so _CURRENT points at the OLDEST version
    rollback_version("t", root, "2026-01-01")
    deleted = vacuum_versions("t", root, keep_last=1)
    # newest kept, current kept despite age, middle deleted
    assert deleted == ["2026-01-02"]
    left = sorted(e for e in os.listdir(os.path.join(root, "t")) if e.startswith("v="))
    assert left == ["v=2026-01-01", "v=2026-01-03"]
    assert read_current(spark, "t", root).count() == 1


def test_cached_frame_ttl(spark, tmp_path):
    """cached_frame: builder runs on miss, snapshot served inside TTL,
    rebuilt when expired (mtime aged artificially)."""
    import os

    from covid19_etl_pipeline_spark.serving import cached_frame

    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    root = str(tmp_path / "cache")
    os.makedirs(root)
    assert cached_frame(spark, "k1", build, root).count() == 5
    assert cached_frame(spark, "k1", build, root).count() == 5
    assert len(calls) == 1  # second call hit the snapshot
    # age the marker past the TTL → rebuild
    marker = os.path.join(root, "k1", "_SUCCESS")
    os.utime(marker, (0, 0))
    assert cached_frame(spark, "k1", build, root, ttl_seconds=10).count() == 5
    assert len(calls) == 2


def test_dashboard_render(spark, tmp_path):
    """dashboard: four engine-side panels render to one self-contained
    HTML page — hero + KPI tiles, a 2-series trend with legend and
    crosshair, two single-hue bar charts, and a table view per chart
    (tooltips enhance, never gate). Labels are HTML-escaped."""
    from pyspark.sql import Row

    from covid19_etl_pipeline_spark.dashboard import render_dashboard, write_dashboard

    import datetime as dt

    stats = [Row(table_name="orders", n_rows=1500), Row(table_name="events", n_rows=99)]
    trend = [
        Row(event_date=dt.date(2024, 1, 1 + i), total_value=100.0 + i * 10,
            users_reporting=5, value_7day_avg=100.0 + i * 5)
        for i in range(10)
    ]
    top = [Row(o_orderkey=1, o_custkey=9, o_totalprice=500.0),
           Row(o_orderkey=2, o_custkey=8, o_totalprice=250.0)]
    recent = [Row(event_type="<script>alert(1)</script>", n_events=7),
              Row(event_type="view", n_events=3)]
    page = render_dashboard(stats, trend, top, recent)

    assert page.count("<svg") == 3
    assert page.count("<details>") == 4          # table view per panel
    assert "crosshair" in page and "legend" in page
    assert "<script>alert(1)</script>" not in page          # escaped
    assert "&lt;script&gt;alert(1)&lt;/script&gt;" in page
    assert 'class="hero"' in page and page.count('class="tile"') == 2
    # deterministic for fixed input
    assert page == render_dashboard(stats, trend, top, recent)

    # end-to-end write against real test data, with the TTL cache
    out = write_dashboard(
        spark, "/root/testdata/sf0.001", str(tmp_path / "dash.html"),
        cache_root=str(tmp_path / "cache"),
    )
    body = open(out).read()
    assert body.count("<svg") == 3 and "Engine serving dashboard" in body


def test_compact_parquet_autosize_and_sort(spark, tmp_path):
    """compact_parquet auto-sizing: with no explicit target, the output
    file count derives from on-disk bytes (tiny data -> one file), rows
    and values survive exactly, and sort_by restores clustering."""
    import pyspark.sql.functions as F

    from covid19_etl_pipeline_spark.sources.io import compact_parquet

    path = str(tmp_path / "frag")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    ).repartition(64).write.parquet(path)

    n_after = compact_parquet(spark, path, sort_by="k")
    assert n_after == 1          # ~80KB of data -> one 128MB-target file
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id)").first()[0] == sum(range(10_000))
    # clustering restored: within the single sorted file, k is ordered
    ks = [r["k"] for r in back.collect()]
    assert ks == sorted(ks)
