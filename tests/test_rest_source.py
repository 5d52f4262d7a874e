"""The calabrio_rest Python DataSource: windowed partitioning, filter
pushdown into the request range, and the evaluations id fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.sources.landing import read_entity
from qaapi_spark.sources.rest_source import CalabrioRestDataSource, _iso_to_ms

FIXTURES = "fixtures"


def _register(spark):
    # pushFilters on a Python source requires the opt-in conf
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CalabrioRestDataSource)


def _contacts(spark, **opts):
    r = (
        spark.read.format("calabrio_rest")
        .option("entity", "contacts")
        .option("base_dir", FIXTURES)
        .option("begin_date", "2024-03-01")
        .option("end_date", "2024-03-23")
        .option("break_size", "2")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_windowed_contacts_match_direct_read(spark):
    _register(spark)
    got = _contacts(spark)
    want = read_entity(spark, f"{FIXTURES}/contacts_*.json", "contacts")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in want.collect())
    # 22 days / 2-day break => 11 request windows == 11 partitions (S2)
    assert got.rdd.getNumPartitions() == 11


def test_starttime_filter_prunes_request_windows(spark):
    _register(spark)
    cut = _iso_to_ms("2024-03-09")
    flt = _contacts(spark).filter(F.col("startTime") >= cut)
    # pushdown narrowed [begin, end) to [cut, end): 14 days / 2 => 7
    assert flt.rdd.getNumPartitions() == 7
    want = read_entity(spark, f"{FIXTURES}/contacts_*.json", "contacts").filter(
        F.col("startTime") >= cut
    )
    assert sorted(r.id for r in flt.collect()) == sorted(r.id for r in want.collect())


def test_evaluations_id_fanout(spark):
    _register(spark)
    contacts = read_entity(spark, f"{FIXTURES}/contacts_*.json", "contacts")
    ids = sorted(r.id for r in contacts.collect())
    evals = (
        spark.read.format("calabrio_rest")
        .option("entity", "evaluations")
        .option("base_dir", FIXTURES)
        .option("contact_ids", ",".join(map(str, ids)))
        .option("id_chunk", "4")
        .load()
    )
    # one partition per id-chunk of 4 (S3 fan-out parallelized)
    assert evals.rdd.getNumPartitions() == (len(ids) + 3) // 4
    direct = read_entity(spark, f"{FIXTURES}/fix_eval_raw.json", "evaluations")
    want_ids = {
        r.id
        for r in direct.collect()
        if r.qualityRef and int("".join(c for c in r.qualityRef.rsplit("/", 1)[-1] if c.isdigit())) in set(ids)
    }
    assert {r.id for r in evals.collect()} == want_ids


def test_forms_single_request(spark):
    _register(spark)
    forms = (
        spark.read.format("calabrio_rest")
        .option("entity", "forms")
        .option("base_dir", FIXTURES)
        .load()
    )
    direct = read_entity(spark, f"{FIXTURES}/forms.json", "forms")
    assert forms.count() == direct.count()
    assert forms.schema == direct.schema


def test_transport_option_injects_class_by_dotted_path(spark):
    """The `transport` option (pkg.module:Class) selects the transport;
    explicitly injecting the fixture fake exercises the same resolution
    path a production HTTP transport would use."""
    _register(spark)
    got = _contacts(
        spark, transport="qaapi_spark.sources.rest_source:FixtureTransport"
    )
    want = read_entity(spark, f"{FIXTURES}/contacts_*.json", "contacts")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in want.collect())


def test_transport_resolution_contract():
    import pytest

    from qaapi_spark.sources.rest_source import FixtureTransport, _resolve_transport

    assert (
        _resolve_transport("qaapi_spark.sources.rest_source:FixtureTransport")
        is FixtureTransport
    )
    # plain-dotted form resolves too
    assert (
        _resolve_transport("qaapi_spark.sources.rest_source.FixtureTransport")
        is FixtureTransport
    )
    with pytest.raises(ValueError):
        _resolve_transport("NoModule")
    # transports are constructed from the reader options dict
    t = FixtureTransport({"base_dir": "fixtures"})
    assert t.base_dir == "fixtures"


def test_transcripts_id_lookup_skips_empty(spark):
    """S5 as a partitioned source read: one id-chunk per partition,
    empty transcript responses dropped by the transport."""
    _register(spark)
    got = (
        spark.read.format("calabrio_rest")
        .option("entity", "transcripts")
        .option("base_dir", FIXTURES)
        .option("contact_ids", "5,6,7,99999")  # 99999: no transcript
        .option("id_chunk", "2")
        .load()
    )
    direct = read_entity(spark, f"{FIXTURES}/fix_transcript_raw.json", "transcripts")
    want = {r.ccrid for r in direct.collect() if r.ccrid in (5, 6, 7)}
    assert {r.ccrid for r in got.collect()} == want
    assert got.filter(F.size("segments") == 0).count() == 0


def test_comments_link_following(spark):
    """S4 as a partitioned source read: each evaluation's `comments`
    link fans out to the comment rows under that link path."""
    _register(spark)
    evals = read_entity(spark, f"{FIXTURES}/fix_eval_raw.json", "evaluations")
    links = [r.comments for r in evals.collect() if r.comments]
    assert links, "fixture must carry comment links"
    got = (
        spark.read.format("calabrio_rest")
        .option("entity", "comments")
        .option("base_dir", FIXTURES)
        .option("links", ",".join(links))
        .load()
    )
    direct = read_entity(spark, f"{FIXTURES}/fix_comments_raw.json", "comments")
    got_refs = sorted(r["$ref"] for r in got.collect())
    want_refs = sorted(
        r["$ref"]
        for r in direct.collect()
        if any(r["$ref"].startswith(lk) for lk in links)
    )
    assert got_refs == want_refs and got_refs


def test_stream_reader_offsets_and_windows():
    """Offset arithmetic: initial = begin_date; latest advances by
    windows_per_batch windows capped at end_date; partitions split an
    offset range into break_size-day request windows."""
    from qaapi_spark.schemas import ENTITY_SCHEMAS
    from qaapi_spark.sources.rest_source import _RestStreamReader

    r = _RestStreamReader(
        ENTITY_SCHEMAS["all_contacts"],
        {
            "begin_date": "2024-03-01",
            "end_date": "2024-03-07",
            "break_size": "2",
            "windows_per_batch": "2",
        },
    )
    o0 = r.initialOffset()
    assert o0 == {"ms": _iso_to_ms("2024-03-01")}
    o1 = r.latestOffset()
    assert o1 == {"ms": _iso_to_ms("2024-03-05")}  # 2 x 2-day windows
    o2 = r.latestOffset()
    assert o2 == {"ms": _iso_to_ms("2024-03-07")}  # capped at end_date
    parts = r.partitions(o0, o1)
    assert [(p.lo_ms, p.hi_ms) for p in parts] == [
        (_iso_to_ms("2024-03-01"), _iso_to_ms("2024-03-03")),
        (_iso_to_ms("2024-03-03"), _iso_to_ms("2024-03-05")),
    ]


def test_streamed_contacts_equal_batch_extraction(spark, tmp_path):
    """End-to-end: the streaming reader over the fixture transport
    yields exactly the batch reader's rows (availableNow replay)."""
    _register(spark)
    batch = _contacts(spark, pattern="all_contacts_*.json")
    stream = (
        spark.readStream.format("calabrio_rest")
        .option("entity", "contacts")
        .option("base_dir", FIXTURES)
        .option("pattern", "all_contacts_*.json")
        .option("begin_date", "2024-03-01")
        .option("end_date", "2024-03-23")
        .option("break_size", "2")
        .option("windows_per_batch", "16")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = sorted(r.id for r in spark.sql("SELECT id FROM rest_stream_test").collect())
    want = sorted(r.id for r in batch.select("id").collect())
    assert got == want and got
