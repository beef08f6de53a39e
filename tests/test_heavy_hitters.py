"""Streaming Misra-Gries heavy hitters (streaming/heavy_hitters.py):
bounded-state frequency sketching with the textbook guarantees held
across micro-batches — no false negatives above n/(k+1), reported
counts undershooting by at most the emitted debt, exact degradation
when k covers the vocabulary."""

from __future__ import annotations

import collections
import random

import pandas as pd
import pytest

from curator_spark.streaming.heavy_hitters import (
    heavy_hitters_stream, mg_merge_batch)


# ------------------------------------------------------- pure sketch


def test_mg_exact_when_k_covers_vocabulary():
    cand, debt = {}, 0
    cand, debt = mg_merge_batch(cand, {"a": 5, "b": 2}, k=10, debt=debt)
    cand, debt = mg_merge_batch(cand, {"a": 1, "c": 7}, k=10, debt=debt)
    assert cand == {"a": 6, "b": 2, "c": 7} and debt == 0


def test_mg_bounds_hold_under_random_batches():
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(200)]
    weights = [1 / (i + 1) for i in range(200)]   # Zipf-ish
    exact: collections.Counter = collections.Counter()
    cand, debt, k = {}, 0, 16
    for _ in range(30):
        batch = collections.Counter(
            rng.choices(vocab, weights=weights, k=500))
        exact.update(batch)
        cand, debt = mg_merge_batch(cand, dict(batch), k, debt)
        assert len(cand) <= k
    n = sum(exact.values())
    assert debt <= n // (k + 1)
    for t, true in exact.items():
        rep = cand.get(t, 0)
        assert rep <= true <= rep + debt
        if true > debt:                 # guaranteed presence
            assert t in cand


# --------------------------------------------------------- streaming


def _write_token_files(spark, sdir, files):
    for name, tokens in files.items():
        pd.DataFrame({"token": tokens}).to_parquet(
            str(sdir / name), index=False)


def _drain(spark, sdir, ckpt, k, shards):
    """Run the stream availableNow, capturing each shard's LATEST
    emission (update mode re-emits a shard's full candidate set every
    trigger it sees data)."""
    stream = (spark.readStream.schema("token string")
              .option("maxFilesPerTrigger", 1).parquet(str(sdir)))
    out = heavy_hitters_stream(stream, k=k, shards=shards)
    latest: dict[int, pd.DataFrame] = {}

    def sink(batch, epoch_id):
        for shard, grp in batch.toPandas().groupby("shard"):
            latest[int(shard)] = grp

    q = (out.writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return latest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(120)]
    weights = [1 / (i + 1) ** 1.3 for i in range(120)]
    files = {f"f{j}.parquet": rng.choices(vocab, weights=weights, k=2000)
             for j in range(3)}
    exact = collections.Counter(t for ts in files.values() for t in ts)
    return {"files": files, "exact": exact,
            "dir": tmp_path_factory.mktemp("hh")}


def _shard_of(spark, tokens, shards):
    from pyspark.sql import functions as F
    rows = (spark.createDataFrame([(t,) for t in tokens], "token string")
            .select("token", F.pmod(F.xxhash64("token"),
                                    F.lit(shards)).cast("int")
                    .alias("shard")).collect())
    return {r["token"]: r["shard"] for r in rows}


def test_stream_mg_guarantees_across_triggers(spark, corpus, tmp_path):
    k, shards = 12, 4
    _write_token_files(spark, corpus["dir"], corpus["files"])
    latest = _drain(spark, corpus["dir"], tmp_path / "ck1", k, shards)
    shard_of = _shard_of(spark, list(corpus["exact"]), shards)
    exact_by_shard: dict[int, collections.Counter] = (
        collections.defaultdict(collections.Counter))
    for t, c in corpus["exact"].items():
        exact_by_shard[shard_of[t]][t] = c

    assert set(latest) == set(exact_by_shard)
    for shard, grp in latest.items():
        ex = exact_by_shard[shard]
        n = sum(ex.values())
        debt = int(grp["debt"].iloc[0])
        assert int(grp["n_seen"].iloc[0]) == n   # nothing lost
        assert len(grp) <= k                     # bounded state
        assert debt <= n // (k + 1)              # MG debt bound
        rep = dict(zip(grp["token"], grp["est_count"]))
        for t, true in ex.items():
            r = int(rep.get(t, 0))
            assert r <= true <= r + debt
            if true > debt:
                assert t in rep                  # no false negatives


def test_stream_mg_exact_with_large_k(spark, corpus, tmp_path):
    """k >= vocabulary: the sketch IS an exact streaming counter —
    stream result equals the batch groupBy count."""
    latest = _drain(spark, corpus["dir"], tmp_path / "ck2",
                    k=1000, shards=4)
    got: dict[str, int] = {}
    for grp in latest.values():
        assert int(grp["debt"].iloc[0]) == 0
        got.update(dict(zip(grp["token"], grp["est_count"])))
    assert got == dict(corpus["exact"])