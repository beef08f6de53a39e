"""Input coercion breadth (reference llm/llm.py:288-309
_convert_to_dataset): str / message-list / iterable / DataFrame all
coerce into the one transcripts shape, deterministically."""

from __future__ import annotations

import pytest

from curator_spark.ingest import coerce_to_transcripts, docs_to_transcripts


def test_str_becomes_single_turn_conversation(spark):
    t = coerce_to_transcripts(spark, "hello world").collect()
    assert len(t) == 1
    r = t[0]
    assert (r.conv_id, r.turn_idx, r.role, r.text) == \
        ("row-0000000000", 0, "user", "hello world")
    assert r.ts is not None and 0 <= r.part < 8


def test_message_list_is_one_conversation(spark):
    msgs = [{"role": "system", "content": "be nice"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"}]
    t = sorted(coerce_to_transcripts(spark, msgs).collect(),
               key=lambda r: r.turn_idx)
    assert [r.conv_id for r in t] == ["row-0000000000"] * 3
    assert [(r.turn_idx, r.role, r.text) for r in t] == [
        (0, "system", "be nice"), (1, "user", "hi"), (2, "assistant", "hello")]


def test_iterable_and_generator(spark):
    def gen():
        yield "first doc"
        yield [{"role": "user", "content": "q"},
               {"role": "assistant", "content": "a"}]

    t = coerce_to_transcripts(spark, gen()).collect()
    convs = {r.conv_id for r in t}
    assert convs == {"row-0000000000", "row-0000000001"}
    assert len(t) == 3


def test_dataframe_docs_route_matches_docs_to_transcripts(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = coerce_to_transcripts(spark, docs).toPandas()
    b = docs_to_transcripts(docs).toPandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_transcripts_dataframe_passthrough(spark):
    t = coerce_to_transcripts(spark, "x")
    again = coerce_to_transcripts(spark, t)
    assert again is t  # full-schema frame is returned untouched


def test_bad_inputs_raise(spark):
    with pytest.raises(TypeError):
        coerce_to_transcripts(spark, 42)
    with pytest.raises(TypeError):
        coerce_to_transcripts(spark, [42])
    with pytest.raises(TypeError):
        coerce_to_transcripts(
            spark, spark.createDataFrame([(1,)], "only_col int"))
    # a plain dict is Iterable over its KEYS — must raise, not fabricate
    # conversations named after the key strings
    with pytest.raises(TypeError):
        coerce_to_transcripts(spark, {"some": "config", "like": "dict"})


def test_bare_message_dict_is_one_turn(spark):
    t = coerce_to_transcripts(
        spark, {"role": "assistant", "content": "hi there"}).collect()
    assert len(t) == 1
    assert (t[0].role, t[0].text) == ("assistant", "hi there")
    # ...and inside an iterable too
    t2 = coerce_to_transcripts(
        spark, [{"role": "user", "content": "q"}, "plain doc"]).collect()
    assert {r.conv_id for r in t2} == {"row-0000000000", "row-0000000001"}


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    """A2/A4 parity: schema-enforced JSONL scan round-trips the
    transcripts table exactly; malformed lines quarantine, not crash."""
    import os

    from curator_spark.ingest import (read_transcripts_jsonl,
                                      write_transcripts_jsonl)
    t = coerce_to_transcripts(
        spark, ["alpha beta", "gamma delta epsilon",
                [{"role": "user", "content": "hi"},
                 {"role": "assistant", "content": "yo"}]])
    p = str(tmp_path / "t.jsonl")
    write_transcripts_jsonl(t, p)

    back = read_transcripts_jsonl(spark, p)
    key = ["conv_id", "turn_idx"]
    a = t.toPandas().sort_values(key).reset_index(drop=True)
    b = back.toPandas().sort_values(key).reset_index(drop=True)
    assert a.equals(b)

    # inject a shard containing a malformed line (a NEW file — appending
    # to a Spark-written shard trips its Hadoop .crc sidecar, which is
    # checksum detection, not the parser path under test)
    with open(os.path.join(p, "part-junk.json"), "w") as f:
        f.write('{"conv_id": busted\n')
    again = read_transcripts_jsonl(spark, p)
    assert again.count() == t.count()  # bad line dropped, good rows intact
    # (materialize fully: Spark disallows projecting ONLY the corrupt
    # column straight off a raw JSON scan)
    kept = read_transcripts_jsonl(spark, p, keep_corrupt=True).toPandas()
    assert kept["_corrupt"].notna().sum() == 1


def test_dataframe_passthrough_normalizes_schema(spark):
    """The DataFrame passthrough is schema-normalizing, not bare: missing
    nullable columns (ts, tool) are added, present columns are cast to
    declared types (long turn_idx → int), extras dropped — every ingest
    route emits exactly TRANSCRIPTS_SCHEMA."""
    from curator_spark.ingest import coerce_to_transcripts
    from curator_spark.schema import TRANSCRIPTS_SCHEMA

    df = spark.createDataFrame(
        [("c1", 0, "user", "hello", "junk")],
        "conv_id string, turn_idx long, role string, text string, extra string")
    out = coerce_to_transcripts(spark, df)
    assert [f.name for f in out.schema.fields] == \
        [f.name for f in TRANSCRIPTS_SCHEMA.fields]
    got = {f.name: f.dataType for f in out.schema.fields}
    want = {f.name: f.dataType for f in TRANSCRIPTS_SCHEMA.fields}
    assert got == want
    r = out.collect()[0]
    assert (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) == \
        ("c1", 0, "user", "hello", None, None)
