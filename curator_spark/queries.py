"""Relational + text-analysis query battery over the driver testdata.

Each query exists twice: a Spark DataFrame implementation here (QUERIES)
and an ANSI-SQL oracle (ORACLES) that DuckDB runs on the same parquet —
the driver's correctness gate (CORRECTNESS_r{N}.json). Column aliases
match exactly on both sides; every float is rounded identically; every
top-N has a deterministic tiebreak.

The queries cover the dataset-combinator surface the reference composes
with (SURVEY.md §2.b: map/filter/union/sort/limit/explode/groupBy over
HF Dataset — reference: examples/.../combine_data.py:25-129,
llm/llm.py:288-309) re-expressed as Catalyst-optimizable DataFrame
plans, plus the text-analysis operators a training-data pipeline needs.

Scale notes are attached per query (broadcast choices, pushdown,
two-phase aggs); see bench.py for the measured plans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col: Column | str, scale: int = 100) -> Column:
    """Money double → exact integer (cents / micros).

    Summing doubles is order-dependent (Spark's partial aggregates vs
    DuckDB's sequential scan differ in the last ulp), which can flip a
    round() at a .xx5 boundary and fail an exact value-hash compare.
    Integer sums are exact and associative — bit-identical everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


# ---------------------------------------------------------------------------
# Relational core (§2.b surface)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan+aggregate: the canonical map-side-combinable
    groupBy. At 100 TB this is one shuffle of 4 groups — partial
    aggregation does all the work; the filter is pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.sum(_cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            (F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                          1_000_000)) / 1e6).alias("sum_disc_price"),
            F.round(F.sum(F.col("l_quantity").cast("long"))
                    / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(F.sum(_cents("l_discount")) / (100.0 * F.count(F.lit(1))), 6)
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective filter + single aggregate — exercises
    predicate pushdown + column pruning (scan should read 4 columns)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"),
                           1_000_000)) / 1e6).alias("revenue"))
    )


def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact (lineitem→orders) ⋈ broadcast dims
    (customer, nation, region). Dims are broadcast explicitly — at 100 TB
    the fact side never shuffles for the dim joins; only orders⋈lineitem
    shuffles on orderkey (or co-partitions if both bucketed by orderkey)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                           1_000_000)) / 1e6).alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


def q04_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N with deterministic tiebreak — Spark plans TakeOrderedAndProject
    (no global sort materialization)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q05_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders via row_number window — the reference's
    order-restore op generalized (SURVEY.md §2 A11). Partitioned window:
    shuffles once on o_custkey; no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total_price"),
                "rk")
    )


def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the reference's resume op (skip completed ids,
    SURVEY.md §2 A13) as a standalone relational operator. Broadcast the
    smaller distinct-key side at scale; here Catalyst/AQE picks."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q07_parts_in_use(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join + aggregate: parts referenced by any lineitem, counted
    per brand. Semi-join avoids materializing the (huge) join product."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.round(F.sum(_cents("p_retailprice"))
                     / (100.0 * F.count(F.lit(1))), 4).alias("avg_price"))
    )


def q08_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct (reference: concatenate_datasets,
    combine_data.py:213-221). Distinct = hash aggregate on the key."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.unionByName(b).distinct()


def q09_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/flatMap (reference: parse_func list-explode,
    base_request_processor.py:357-393): tokenize documents, global token
    counts, top-20. Two-phase agg handles the heavy-hitter skew ('the')
    automatically via partial aggregation."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


def q10_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over the event stream (batch view of the
    streaming op): hour × event_type grid."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                   "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q11_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum —
    gaps-and-islands. One shuffle on user_id; window frames stay within
    a user's partition slice."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ → cast via LTZ (session TZ = UTC), then
    # epoch MICROseconds: whole-second truncation would disagree with the
    # oracle's fractional epoch whenever a gap falls within 1s of the
    # threshold (tested in tests/test_sessionize_boundary.py)
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    sess = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), F.lit(1)).otherwise(F.lit(0)))
    sess = sess.withColumn(
        "session_seq",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


def q82_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (the mT5/XLM-R multilingual
    sampling rule, α = 0.5): sample each source with probability
    ∝ n_s^α, flattening the head so low-resource sources survive. The
    mixture targets half the corpus; a source's keep fraction is
    f_s = T·w_s / (Σw·n_s), capped at 1.

    Exactness note: w_s = √n_s is the ONE non-integer step — kept
    because IEEE-754 requires sqrt to be CORRECTLY ROUNDED (bit-exact
    on every conforming engine, unlike ln/exp whose libm variance is
    why this repo ranks in integer fixed point elsewhere); it is
    floored to milli-units immediately and everything downstream —
    the weight sum, the per-source fraction, the md5-bucket keep
    decision (q40's salted-hash determinism) — is pure integer.

    Plan: one map-side-combined groupBy(source) (k rows), the weight
    sum as a 1-row scalar rollup broadcast back onto those k rows (the
    scalar-join idiom — no SinglePartition window anywhere, audited by
    tools/plan_audit.py), fractions broadcast back onto the docs as a
    k-row join, keep is a narrow md5 map. Text never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    w = per_src.withColumn(
        "w_milli", F.floor(F.sqrt(F.col("n_source").cast("double")) * 1000)
        .cast("long"))
    totals = w.agg(F.sum("w_milli").alias("w_sum"),
                   F.sum("n_source").alias("n_total"))
    w = w.crossJoin(F.broadcast(totals))
    # target T = n_total div 2; f_micro = min(1e6, T·w·1e6 div (Σw·n_s))
    f = F.least(
        F.lit(1_000_000).cast("long"),
        F.expr("((n_total div 2) * w_milli * 1000000) div (w_sum * n_source)"))
    w = w.withColumn("f_micro", f)
    bucket = (F.conv(F.substring(F.md5(F.concat(F.col("doc_id"),
                                                F.lit(":temp-mix"))),
                                 1, 8), 16, 10).cast("long") % 1_000_000)
    return (docs.select("doc_id", "source")
            .join(F.broadcast(w.select("source", "n_source", "w_milli",
                                       "f_micro")), "source")
            .withColumn("keep", bucket < F.col("f_micro"))
            .select("doc_id", "source", "n_source", "w_milli", "f_micro",
                    "keep"))


def q80_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN (the one join flavor the battery lacked):
    per-day order intake vs per-day shipment volume. Ship dates trail
    order dates by up to ~4 months, so both one-sided edges genuinely
    occur — early days ship nothing yet, late days only ship.

    Plan: two map-side-combined date aggregations (each output ~2.5k
    rows — years × days), then a small-small full-outer merge; the
    presence flags are computed BEFORE the coalesce so 'no orders'
    and '0 orders' stay distinguishable. Day emitted as a string:
    date objects cross the Spark/DuckDB/pandas boundary with
    dtype-kind drift, strings never do."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    od = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd")
                         .alias("day"))
          .agg(F.count(F.lit(1)).alias("o_cnt")))
    sd = (li.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd")
                     .alias("day"))
          .agg(F.count(F.lit(1)).alias("s_cnt")))
    return (od.join(sd, "day", "full_outer")
            .select("day",
                    F.coalesce("o_cnt", F.lit(0)).alias("n_orders"),
                    F.coalesce("s_cnt", F.lit(0)).alias("n_shipped"),
                    F.col("o_cnt").isNotNull().alias("had_orders"),
                    F.col("s_cnt").isNotNull().alias("had_shipments")))


def q81_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: per user, the
    first view, the first click AFTER that view, the first purchase
    AFTER that click — sequence-constrained stages, not mere presence
    (a purchase before any view does not convert). The product-
    analytics shape behind retention/abandonment dashboards.

    Plan: one narrow pass projects (user_id, event_type, ts_us), then
    three stage aggregations each shuffling only on user_id with the
    candidate-event filter applied BEFORE its join (the click stage
    joins clicks — a fifth of the stream — against the per-user view
    table, never events×events); the spine left-joins per-user 1-row
    tables. Timestamps compared in epoch MICROseconds on both engines
    (the q11 rule)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts_us").alias("t_view_us")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts_us") > F.col("t_view_us"))
         .groupBy("user_id").agg(F.min("ts_us").alias("t_click_us")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts_us") > F.col("t_click_us"))
         .groupBy("user_id").agg(F.min("ts_us").alias("t_purchase_us")))
    users = ev.select("user_id").distinct()
    return (users.join(v, "user_id", "left")
            .join(c, "user_id", "left")
            .join(p, "user_id", "left")
            .select("user_id", "t_view_us", "t_click_us", "t_purchase_us",
                    F.col("t_view_us").isNotNull().alias("reached_view"),
                    F.col("t_click_us").isNotNull().alias("reached_click"),
                    F.col("t_purchase_us").isNotNull()
                    .alias("reached_purchase")))


def q83_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one declarative DataFrame plan
    (merge.merge_dataframes — the expression the table-level
    merge_into commits): customers whose source row passes the matched
    condition are updated in place, brand-new keys are inserted,
    everything else survives untouched.

    Source legs are deterministic projections of the table itself:
    every 7th customer arrives re-segmented with a negated balance
    (the matched condition ``s.bal_cents > t.bal_cents`` keeps only
    the overdrawn ones — a CONDITIONAL update), every 97th arrives
    key-shifted by 1M (pure inserts). Balances are compared in exact
    integer cents (the _cents rule).

    Plan: one left equi-join (update leg) + one left-anti equi-join
    (insert leg), both on the key — AQE broadcasts the small source;
    no window, no collect, no product. Reference parity: the batch
    resubmission loop's id-keyed replace-or-append
    (base_batch_request_processor.py:300-309) as a declarative verb."""
    from .merge import merge_dataframes
    base = (_t(spark, sf_dir, "customer")
            .select("c_custkey", "c_name", "c_mktsegment",
                    _cents("c_acctbal").alias("bal_cents")))
    upd = (base.filter(F.col("c_custkey") % 7 == 0)
           .select("c_custkey", "c_name",
                   F.lit("MERGED").alias("c_mktsegment"),
                   (-F.col("bal_cents")).alias("bal_cents")))
    ins = (base.filter(F.col("c_custkey") % 97 == 0)
           .select((F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                   F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
                   F.lit("NEWSEG").alias("c_mktsegment"),
                   F.lit(0).cast("long").alias("bal_cents")))
    return merge_dataframes(base, upd.unionByName(ins), "c_custkey",
                            matched_condition="s.bal_cents > t.bal_cents")


DEDUP_WIN = 2  # window size exercised by the synthetic corpus; real
# deployments use 8-32-token windows — same plan, one constant


def q87_remove_repeated_windows(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Within-document repetition REMOVAL (the destructive side of
    q68's repetition stats, and the within-doc complement of q70's
    cross-doc boilerplate removal): chunk each document's token stream
    into fixed DEDUP_WIN-token windows, drop every window whose exact text
    already appeared earlier in the SAME document, and reassemble the
    survivors in order — the Gopher/C4-style "remove duplicated
    passages" cleanup.

    Plan: one posexplode to (doc, window_idx, chunk) — window text
    built by a grouped aggregation on (doc_id, win) — then a
    keep-first window over (doc_id, chunk) ordered by window index,
    then one ordered reassembly aggregation per doc. Every shuffle
    key includes doc_id, so parallelism is document-count and a
    million-doc corpus never serializes; window state is bounded by
    the longest document, not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    toks = (docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .filter(F.col("tok") != ""))
    wins = (toks.groupBy("doc_id",
                         (F.col("pos") / DEDUP_WIN).cast("int")
                         .alias("win"))
            .agg(F.concat_ws(
                " ", F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ).getField("tok")).alias("chunk")))
    first = Window.partitionBy("doc_id", "chunk").orderBy("win")
    marked = wins.withColumn("rn", F.row_number().over(first))
    return (marked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_windows"),
                 F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
                 .cast("long").alias("n_dup_windows"),
                 F.md5(F.concat_ws(" ", F.array_sort(
                     F.collect_list(F.when(F.col("rn") == 1,
                                           F.struct("win", "chunk")))
                 ).getField("chunk"))).alias("cleaned_fp")))


BPE_N_MERGES = 24


def q85_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (models/bpe.py): learn the
    first 24 merge rules from the documents corpus. ONE corpus-scale
    pass (pre-tokenize + word count, map-side combined); every merge
    step then moves only the DISTINCT-word table (Zipf: thousands of
    times smaller) — explode pairs → one agg → 1-row argmax → JVM-side
    fold merge, localCheckpoint keeping the plan flat. Ties break by
    (count desc, left, right) so the rule sequence is deterministic.

    Oracle: committed golden parquet from an independent pure-Python
    BPE (tools/make_golden.py) — the train loop has no SQL
    re-expression (iterative argmax), so it gets the q00/q30
    golden-hash treatment."""
    from .models.bpe import train_bpe, word_counts
    merges = train_bpe(
        word_counts(_t(spark, sf_dir, "documents")), BPE_N_MERGES)
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["pair_count"])
         for m in merges],
        "step int, left string, right string, pair_count long")


UNI_VOCAB = 96
UNI_MAX_PIECE = 4
UNI_SEED = 256
UNI_ROUNDS = 3


def q95_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed unigram-LM tokenizer training (models/unigram.py —
    SentencePiece's second family, Viterbi-EM variant): seed substring
    vocabulary from the distinct-word table, then EM rounds where the
    E-step is an Arrow-batched Viterbi over distinct words (vocab
    scores broadcast in the closure) and the M-step + pruning run on
    the driver over exact integer expected counts. Complements q85/q86
    (BPE): together the engine trains both production tokenizer
    families. Emits the final vocabulary (piece, expected count,
    logp_micro, rank) in the canonical (count desc, piece) order.

    Oracle: committed golden parquet from an independently coded
    pure-Python seed+Viterbi+EM replay (tools/make_golden.py) — the
    train loop is iterative, so it gets the q85 golden-hash treatment;
    determinism rests on exact int counts + driver-side IEEE log in
    sorted piece order (see the module docstring)."""
    from .models.bpe import word_counts
    from .models.unigram import train_unigram
    vocab = train_unigram(word_counts(_t(spark, sf_dir, "documents")),
                          vocab_size=UNI_VOCAB,
                          max_piece_len=UNI_MAX_PIECE,
                          seed_size=UNI_SEED, em_rounds=UNI_ROUNDS)
    return spark.createDataFrame(
        [(p, c, lp, i + 1) for i, (p, c, lp) in enumerate(vocab)],
        "piece string, count long, logp_micro long, rank int")


def q86_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale BPE tokenization with the q85-trained merges: per
    document, the subword count and a fingerprint of the full subword
    SEQUENCE (order-sensitive — it pins the tokenization itself, not
    just its size).

    The scale trick is Zipf: the encode UDF (Arrow-batched, rank table
    in closure) runs over DISTINCT words only — thousands of times
    fewer rows than the corpus — and a key equi-join fans the
    encodings back out to (doc, position); the per-doc sequence is
    then reassembled with collect_list over a (doc_id, pos) window —
    one shuffle on doc_id, bounded by document length. Oracle: golden
    parquet (independent Python tokenizer over the same merges)."""
    from .models.bpe import WORD_PATTERN, bpe_encode_words, train_bpe, \
        word_counts
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(WORD_PATTERN), 0)
    words = docs.select(
        "doc_id", F.posexplode(F.transform(toks, F.lower))
        .alias("pos", "word"))
    # persisted: the distinct-word table feeds BOTH the trainer and
    # the encoder — one corpus-scale counting pass, not two
    wc = word_counts(docs).persist()
    merges = train_bpe(wc, BPE_N_MERGES)
    enc = bpe_encode_words(wc.select("word"), merges).select(
        "word", F.size("subwords").alias("n_sub"),
        F.concat_ws("\x1f", "subwords").alias("sub_str"))
    per_doc = (words.join(enc, "word")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum("n_sub").alias("n_subwords"),
                    F.md5(F.concat_ws("\x1e", F.array_sort(
                        F.collect_list(F.struct("pos", "sub_str"))
                    ).getField("sub_str"))).alias("subword_fp")))
    return per_doc.select("doc_id", "n_words",
                          F.col("n_subwords").cast("long")
                          .alias("n_subwords"), "subword_fp")


def q84_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global total-order rank (operators/ranking.global_rank):
    every order ranked by price, ties broken by key — the order-
    restore / leaderboard shape, but WITHOUT the empty-PARTITION-BY
    window that would serialize the corpus into one task.

    Plan: driver-literal quantile boundaries → codegen'd bucket
    expression → k parallel per-bucket row_numbers → prefix-sum
    offsets (k driver integers) broadcast back. Plan-asserted: no
    SinglePartition exchange. The oracle is the naive global
    ROW_NUMBER, so the distributed decomposition is verified
    rank-exact."""
    from .operators.ranking import global_rank
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", _cents("o_totalprice").alias("total_cents"))
    return global_rank(
        o, "total_cents", descending=True,
        order_by=[F.col("total_cents").desc(), F.col("o_orderkey")],
        rank_col="price_rank")


RANGE_BIN_US = 3_600_000_000  # 1 h bins for the session range join


def q64_session_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (operators/temporal.range_join_binned):
    attribute every event to the user session whose [start, end] span
    contains it. Sessions come from q11's gap rule; the join runs as an
    equi-join on (user_id, time-bin) with BETWEEN as a residual — the
    plan never contains the BroadcastNestedLoopJoin a naive range
    predicate compiles to (plan-asserted). The oracle is the naive
    BETWEEN join, so the binned rewrite is verified row-exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    sess = (ev.withColumn("__ep", epoch)
            .withColumn("new_session",
                        F.when(gap.isNull() | (gap > 1_800_000_000),
                               F.lit(1)).otherwise(F.lit(0))))
    sess = sess.withColumn(
        "session_seq",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    bounds = (sess.groupBy("user_id", "session_seq")
              .agg(F.min("__ep").alias("start_us"),
                   F.max("__ep").alias("end_us")))
    pts = ev.select("event_id", "user_id", epoch.alias("ts_us"))
    from .operators.temporal import range_join_binned
    joined = range_join_binned(pts, bounds, on=["user_id"],
                               bin_width=RANGE_BIN_US)
    return joined.select("event_id", "user_id",
                         F.col("session_seq").cast("long")
                         .alias("session_seq"),
                         "start_us")


def q12_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: pull props.k out of the JSON payload
    column and aggregate — schema-validating cast analogue (SURVEY.md §2
    A10, reference: prompt_formatter.py:103-148 response_to_response_format)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"),
             F.sum("k").alias("sum_k"),
             F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Text analysis over `documents` (training-data ops)
# ---------------------------------------------------------------------------

def q13_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting — narrow map, no shuffle; all
    JVM-side (whole-stage codegen), zero Python."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(F.length("text") / F.greatest(F.size(toks), F.lit(1)), 4)
        .alias("chars_per_token"),
    )


def q14_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style heuristic quality flags per document, pure
    pyspark.sql.functions (no UDF): length bounds, mean word length,
    digit ratio → keep flag. The SQL-checkable analogue of the
    transcript pipeline's heuristic stage (rules.heuristic_flags)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_digits = n_chars - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
    n_spaces = n_chars - F.length(F.regexp_replace(F.col("text"), " ", ""))
    mean_wlen = (n_chars - n_spaces).cast("double") / F.greatest(n_tokens, F.lit(1))
    d = docs.select(
        "doc_id",
        (n_tokens < 10).alias("too_short"),
        (n_chars > 5000).alias("too_long"),
        ((n_digits.cast("double") / F.greatest(n_chars, F.lit(1))) > 0.3)
        .alias("digit_heavy"),
        ((mean_wlen < 2.0) | (mean_wlen > 12.0)).alias("bad_word_len"),
    )
    return d.withColumn(
        "keep",
        ~(F.col("too_short") | F.col("too_long") | F.col("digit_heavy")
          | F.col("bad_word_len")))


# q108 rule thresholds — integer permille/percent cuts tuned so every
# rule fires on the fixture and the exclusive/overlap mix is
# non-degenerate (500 docs at sf0.01: fails per rule 75/43/75/172/34,
# docs failing 0/1/2/3 rules ≈ 210/193/85/12). All comparisons are on
# integer `div` ratios so both engines agree bit-exactly.
ATTR_MIN_TOKENS = 25
ATTR_MAX_TOKENS = 90
ATTR_MIN_STOP_PERMILLE = 25
ATTR_MIN_TTR_PERMILLE = 400
ATTR_MAX_MWL_CENTI = 480


def q108_rule_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-rule ablation report (operators/textstats.
    rule_attribution): for each of five C4/Gopher-style fail rules
    (too short, too long, low stopword density, low type-token ratio,
    over-long mean word length), the corpus-wide n_failed,
    n_exclusive (docs ONLY that rule fails — what loosening it would
    rescue), and integer permille rates. The diagnostic the filter
    owner reads before shipping a threshold change; q14 gives the
    per-doc verdicts, this gives the per-rule accounting. One narrow
    pass + one global agg → 5 rows whatever the corpus size."""
    from .operators.textstats import rule_attribution
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    n_chars = F.length("text")
    n_spaces = n_chars - F.length(F.regexp_replace(F.col("text"), " ", ""))
    m = docs.select(
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
        n_chars.alias("n_chars"), n_spaces.alias("n_spaces"),
    ).selectExpr(
        "n_tokens", "n_distinct", "n_stop",
        "(1000 * n_stop) div greatest(n_tokens, 1) as stop_permille",
        "(1000 * n_distinct) div greatest(n_tokens, 1) as ttr_permille",
        "(100 * (n_chars - n_spaces)) div greatest(n_tokens, 1) as mwl_centi",
    )
    rules = [
        ("too_short", F.col("n_tokens") < ATTR_MIN_TOKENS),
        ("too_long", F.col("n_tokens") > ATTR_MAX_TOKENS),
        ("low_stopword", F.col("stop_permille") < ATTR_MIN_STOP_PERMILLE),
        ("low_ttr", F.col("ttr_permille") < ATTR_MIN_TTR_PERMILLE),
        ("long_words", F.col("mwl_centi") > ATTR_MAX_MWL_CENTI),
    ]
    return rule_attribution(m, rules)


SHUFFLE_SALT = "shuffle-e1"


def q110_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle for training export: every
    doc gets shuffle_key = md5(doc_id:epoch-salt) and an EXACT global
    position by that key — the same corpus, salt, and cluster size
    always produce the identical order (epoch N+1 = new salt), and
    the order is partitioning-invariant, unlike orderBy(rand()).
    Position comes from operators/ranking.global_rank, so there is no
    single-task global sort: driver-literal quantile boundaries over
    the 48-bit key → k parallel per-bucket ranks → prefix-sum offsets
    (the q84 machinery pointed at a uniform hash — buckets are
    balanced by construction, no sampling pathologies). The companion
    sorted_export_ready layout writes the shuffled corpus as disjoint
    ordered ranges. Oracle = the naive global ROW_NUMBER."""
    from .operators.ranking import global_rank
    docs = _t(spark, sf_dir, "documents")
    key = F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(":" + SHUFFLE_SALT))), 1, 12), 16, 10) \
        .cast("long")
    d = docs.select("doc_id", key.alias("shuffle_key"))
    return global_rank(
        d, "shuffle_key",
        order_by=[F.col("shuffle_key"), F.col("doc_id")],
        rank_col="shuffle_pos")


PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


def q111_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE / data-steward first look):
    per column — row count, nulls, exact distinct count, min/max
    rendered as strings — the report that decides partition keys,
    dictionary-encoding wins, and whether a column is a candidate
    dedup fingerprint. One aggregate; the exact countDistinct per
    column is the oracle-checkable form (each adds an expand +
    partial agg — still map-side combined); at 100 TB swap in
    approx_count_distinct (HLL, one pass, no expand) and keep min/max
    exact — the plan is otherwise identical. Profiled columns are
    integer/string only, so the min/max string rendering is
    engine-exact (no float formatting drift)."""
    docs = _t(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"),
            F.countDistinct(c).alias(f"__d_{c}"),
            F.min(c).cast("string").alias(f"__lo_{c}"),
            F.max(c).cast("string").alias(f"__hi_{c}"),
        ]
    row = docs.agg(*aggs)
    entries = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(f"__n_{c}").alias("n_null"),
                 F.col(f"__d_{c}").alias("n_distinct"),
                 F.col(f"__lo_{c}").alias("min_str"),
                 F.col(f"__hi_{c}").alias("max_str"))
        for c in PROFILE_COLS])
    return (row.select("n_rows", F.explode(entries).alias("e"))
            .select(F.col("e.column").alias("column"), "n_rows",
                    F.col("e.n_null").alias("n_null"),
                    F.col("e.n_distinct").alias("n_distinct"),
                    F.col("e.min_str").alias("min_str"),
                    F.col("e.max_str").alias("max_str")))


def q112_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (the privacy-aggregate
    counterpart of the PII scrubbers q67/q104/q109): how identifying is
    the released METADATA, independent of the text? Group by the
    quasi-identifier tuple (lang, source, length bucket — the columns a
    join adversary could link on) and report each group's population k;
    groups with k < 5 are re-identification risks (the standard
    k-anonymity floor). Output is one row per occupied quasi-identifier
    cell — metadata-sized however large the corpus.

    Plan: ONE map-side-combined groupBy on a bounded-cardinality key
    (langs × sources × ~20 buckets) — no skew possible beyond cell
    imbalance, which partial aggregation absorbs; the length bucket is
    integer `div` so Spark and DuckDB agree bit-exactly."""
    docs = _t(spark, sf_dir, "documents")
    return (docs
            .select("lang", "source",
                    F.expr("n_chars div 500").alias("len_bucket"))
            .groupBy("lang", "source", "len_bucket")
            .agg(F.count(F.lit(1)).alias("k"))
            .withColumn("at_risk", F.col("k") < 5))


_Q112_SQL = """
    SELECT lang, source, n_chars // 500 AS len_bucket,
           count(*) AS k, count(*) < 5 AS at_risk
    FROM documents
    GROUP BY lang, source, len_bucket
"""


def q15_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language heuristic (the SQL-expressible cousin of
    the char-trigram langid model): English function-word fraction →
    guess_en, compared against the labeled lang column."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    frac = n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1))
    return docs.select(
        "doc_id", "lang",
        F.round(frac, 4).alias("stopword_frac"),
        (frac >= 0.05).alias("guess_en"),
        (F.col("lang") == "en").alias("is_en"),
    )


# the language/quality stop list shared by q15, q54, and their oracles
# (STOPWORDS_SQL is the DuckDB-literal rendering of the same tuple)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")
STOPWORDS_SQL = ",".join(f"'{w}'" for w in STOPWORDS)

SRC_DENSITY_MIN = 0.06


def q54_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source-level reputation filtering: the pretraining-corpus
    op of scoring whole domains and dropping every page from a bad one
    (the domain-blocklist cousin of q14's per-doc rules). The source
    quality signal is the micro-averaged stopword density — integer
    token counts summed per source, ONE division at the end, so the
    score is order-independent and cross-engine exact (a mean of
    per-doc doubles would depend on fold order). Plan shape: narrow
    per-doc counts → map-side-combined groupBy(source) over a tiny key
    domain → the per-source verdict BROADCAST back onto the docs —
    no second shuffle of the corpus at any scale."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    per_doc = docs.select(
        "doc_id", "source",
        n_stop.cast("long").alias("n_stop"),
        F.size(toks).cast("long").alias("n_toks"),
    )
    src = (
        per_doc.groupBy("source")
        .agg(F.sum("n_stop").alias("src_stop"),
             F.sum("n_toks").alias("src_tokens"))
        .select(
            "source",
            F.round(F.col("src_stop")
                    / F.greatest("src_tokens", F.lit(1)), 6)
            .alias("src_density"))
        .withColumn("src_ok", F.col("src_density") >= SRC_DENSITY_MIN)
    )
    return (per_doc.select("doc_id", "source")
            .join(F.broadcast(src), "source")
            .select("doc_id", "source", "src_density", "src_ok"))


STRAT_DENOM = 5  # stratified-split sampling fraction = 1/STRAT_DENOM
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def q58_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution quality signals per document — the
    repetition/diversity half of a Gopher/RedPajama signal set:
    type-token ratio, top-token concentration, hapax count, and a
    Simpson diversity index. Every signal is derived from INTEGER
    counts with at most one division (frac_*) or pure integer
    arithmetic (simpson_e6 in fixed point), so no cross-engine
    float-sum-order issue can perturb the hash — a Shannon entropy
    (Σ p·ln p) would depend on summation order and libm, which is why
    the diversity index here is Simpson (1 − Σc²/N², same monotone
    quality signal, exactly computable).

    Plan: explode → two-phase aggregation on uniform keys
    ((doc_id, tok), then doc_id) with map-side combine — the q34/q09
    shape, linear shuffles only. Fixed-point bound: simpson_e6
    overflows int64 only past ~3·10^6 tokens in ONE document."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    cnt = (docs.select("doc_id", F.explode(toks).alias("tok"))
           .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c")))
    agg = (cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.count(F.lit(1)).alias("n_unique"),
        F.max("c").alias("top_c"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.sum((F.col("c") == 1).cast("long")).alias("n_hapax")))
    return agg.select(
        "doc_id", "n_toks", "n_unique",
        F.round(F.col("n_unique") / F.col("n_toks"), 6).alias("frac_unique"),
        F.round(F.col("top_c") / F.col("n_toks"), 6).alias("top_frac"),
        F.expr("1000000 - (sum_c2 * 1000000) DIV (n_toks * n_toks)")
        .cast("long").alias("simpson_e6"),
        "n_hapax",
    )


def q59_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with EXACT per-stratum quotas (vs q40's
    per-row probabilistic split, whose stratum sizes are only
    binomially close): within each lang stratum, rank rows by a salted
    md5 of the id and take exactly ceil(n_stratum/5). Quota arithmetic
    is integer ((n+4) div 5) — no float fraction, no boundary drift.

    Plan: ONE shuffle (the per-stratum window sort); rank and stratum
    size come from the same window pass. At 100 TB a mega-stratum
    serializes its sort into one task chain the same way any global
    rank does — the scale variant ranks on (stratum, salt) first and
    merges quota remainders, trading exactness of WHICH rows for
    exactness of counts; this operator keeps row-exactness, matching
    the reference's deterministic select(range) sampling
    (base_request_processor.py:222-244)."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws("|", F.lit("strat"),
                            F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    wall = Window.partitionBy("lang")
    ranked = docs.select(
        "doc_id", "lang",
        F.row_number().over(w).alias("sample_rank"),
        F.count(F.lit(1)).over(wall).alias("n_stratum"))
    return ranked.select(
        "doc_id", "lang", "sample_rank", "n_stratum",
        (F.col("sample_rank")
         <= F.expr(f"(n_stratum + {STRAT_DENOM - 1}) DIV {STRAT_DENOM}"))
        .alias("in_sample"))


HASH_DIM = 16


def q74_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009): embed every document
    as a {HASH_DIM}-dim integer bag-of-words vector, bucket =
    md5(token) mod dim — the no-model, no-vocabulary embedding that
    feeds clustering/ANN when no learned encoder exists (and the
    deterministic stand-in for one in this sandbox). Integer counts →
    bit-exact across engines.

    Plan: token explode (text dropped at the explode) → ONE map-side-
    combined groupBy(doc_id) with {HASH_DIM} conditional sums (the
    simhash pattern) → left join back onto the doc spine for empty
    docs. Dims emitted as columns so every value is oracle-verified."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select("doc_id", F.explode(toks).alias("tok"))
    bucket = (F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10)
              .cast("long") % HASH_DIM)
    b = staged.withColumn("b", bucket)
    agg = b.groupBy("doc_id").agg(
        *[F.sum(F.when(F.col("b") == i, 1).otherwise(0)).alias(f"d{i}")
          for i in range(HASH_DIM)])
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .na.fill(0, [f"d{i}" for i in range(HASH_DIM)]))


LM_TOP_K = 3


def q73_ngram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed count-based LM training — the corpus-scale job that
    PRODUCES a KenLM-style model like the one the flagship scores with
    (models/ngram_lm.py builds its char-LM per worker from a fixed
    seed corpus; this is how the table behind such a model is built
    from 100 TB). Word-bigram conditionals with add-one (Laplace)
    smoothing, all integer fixed point: p_milli = (c(w1,w2)+1)·1000
    div (c(w1)+V). Emits the top-{LM_TOP_K} continuations per context
    by (count desc, word asc).

    Plan: bigrams from the q60 adjacent-token zip (narrow, no
    self-join); ONE map-side-combined groupBy(w1,w2); context counts
    c(w1) = Σ_w2 c(w1,w2) come from a WINDOW over the aggregated
    bigram table, sharing the top-k window's w1 exchange (a join back
    to a groupBy(w1) rollup would make Catalyst recompute the whole
    bigram aggregation — DataFrame plans get no CTE reuse); V is a
    1-row broadcast aggregate."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select(toks.alias("toks"))
    n = F.size("toks")
    pairs = F.when(n >= 2, F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = staged.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    vocab = (staged.select(F.explode("toks").alias("tok"))
             .agg(F.countDistinct("tok").alias("v")))
    w = Window.partitionBy("w1").orderBy(
        F.col("c_pair").desc(), F.col("w2").asc())
    return (cb.withColumn("c_ctx",
                          F.sum("c_pair").over(Window.partitionBy("w1")))
            .crossJoin(F.broadcast(vocab))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= LM_TOP_K)
            .select("w1", "w2", "c_pair", "c_ctx",
                    F.expr("((c_pair + 1) * 1000) div (c_ctx + v)")
                    .alias("p_milli"),
                    "rank"))


def q78_ccnet_lm_filter(spark: SparkSession, sf_dir: str,
                        approx: bool = False) -> DataFrame:
    """The CCNet loop CLOSED (Wenzek et al. 2020): train the LM on the
    corpus (q73's job), score every document with it, and cut each
    language into head/middle/tail thirds by LM score — train-then-
    apply as ONE dataflow, where q73 stops at the model table and q69
    buckets by a model-free heuristic.

    Score: per-bigram cost_milli = ((c_ctx + V)·1000) div (c_pair + 1)
    — the add-one-smoothed RECIPROCAL probability in integer milli-
    units; doc score = mean cost over its bigrams. CCNet uses log-space
    perplexity; the linear-space mean is this repo's documented integer
    deviation (the q75 precedent): Σ of logs is float-sum-order- and
    libm-dependent across engines, Σ of integer reciprocals is exact,
    and both order "fluent under the model" below "boilerplate/noise".

    Plan: ONE bigram explode serves both training and scoring (text
    dropped at the explode; only (doc_id, w1, w2) ever shuffles);
    context counts via window over the aggregated bigram table (q73's
    exchange-sharing trick); scoring = equi-join of doc bigrams onto
    the model on (w1, w2) — hot function-word bigrams skew that key,
    which AQE skew-join splits (the model side is one row per bigram,
    so a split never duplicates matches); V is a 1-row broadcast.
    Docs with <2 tokens have no bigrams: bucket 'unscored', never
    silently ranked.

    Two cut strategies (CCNet computes thresholds once on a sample and
    streams the corpus through them — it never globally sorts):
    * approx=False (default; the oracle-checked baseline): exact
      per-language thirds via ntile(3) — Window.partitionBy("lang")
      is a full single-task sort PER LANGUAGE, the classic skew-killer
      at 100 TB (one task would hold every English document). Exact,
      oracle-comparable, and deliberately NOT the scale path.
    * approx=True (the 100 TB path): head/middle/tail thresholds from
      percentile_approx per language — a map-side-combinable sketch
      aggregate (no per-lang sort, no single giant task), broadcast-
      joined back; every doc then buckets with a narrow comparison.
      Matches the exact path everywhere except quantile-boundary ties
      (test_corpus_queries asserts >=90% agreement on the fixture)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select("doc_id", "lang", toks.alias("toks"))
    n = F.size("toks")
    pairs = F.when(n >= 2, F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bigr = (staged.select("doc_id", F.explode(pairs).alias("p"))
            .select("doc_id", "p.w1", "p.w2"))
    cb = bigr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    model = cb.withColumn(
        "c_ctx", F.sum("c_pair").over(Window.partitionBy("w1")))
    vocab = (staged.select(F.explode("toks").alias("tok"))
             .agg(F.countDistinct("tok").alias("v")))
    per_doc = (bigr.join(model, ["w1", "w2"])
               .crossJoin(F.broadcast(vocab))
               .groupBy("doc_id")
               .agg(F.sum(F.expr("((c_ctx + v) * 1000) div (c_pair + 1)"))
                    .alias("cost_sum"),
                    F.count(F.lit(1)).alias("n_bigrams")))
    spine = staged.select("doc_id", "lang").join(per_doc, "doc_id", "left")
    scored = (spine.filter(F.col("n_bigrams").isNotNull())
              .withColumn("ppl_milli", F.expr("cost_sum div n_bigrams")))
    if approx:
        # CCNet's actual method: per-language cut thresholds from a
        # mergeable quantile sketch (partial-aggregated, no per-lang
        # sort), broadcast back onto the scored docs
        cuts = scored.groupBy("lang").agg(
            F.percentile_approx(
                "ppl_milli", F.array(F.lit(1 / 3), F.lit(2 / 3)),
                F.lit(10000)).alias("qs"))
        scored = (scored.join(F.broadcast(cuts), "lang")
                  .select("doc_id", "lang", "ppl_milli", "n_bigrams",
                          F.when(F.col("ppl_milli") <= F.col("qs")[0],
                                 "head")
                          .when(F.col("ppl_milli") <= F.col("qs")[1],
                                "middle")
                          .otherwise("tail").alias("bucket")))
    else:
        w = Window.partitionBy("lang").orderBy("ppl_milli", "doc_id")
        scored = (scored.withColumn("nt", F.ntile(3).over(w))
                  .select("doc_id", "lang", "ppl_milli", "n_bigrams",
                          F.when(F.col("nt") == 1, "head")
                          .when(F.col("nt") == 2, "middle")
                          .otherwise("tail").alias("bucket")))
    unscored = (spine.filter(F.col("n_bigrams").isNull())
                .select("doc_id", "lang",
                        F.lit(None).cast("long").alias("ppl_milli"),
                        F.lit(0).cast("long").alias("n_bigrams"),
                        F.lit("unscored").alias("bucket")))
    return (scored.unionByName(unscored)
            .withColumn("keep", F.col("bucket") == "head"))


def q79_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier curation (the GPT-3 WebText / LLaMA data-prep
    pillar: train a classifier on a labeled "good source vs rest"
    signal, score the whole corpus with it): train a multinomial-NB-
    shaped model on the documents table's own `source` labels, then
    classify every document — train-then-apply in one dataflow, like
    q78.

    Model: per (token, source), Laplace weight_milli =
    (c(tok,src)+1)·1000 div (N_src + V); doc score vs source =
    Σ over the doc's token occurrences of weight_milli, with UNSEEN
    (token, source) pairs contributing the smoothed floor
    1000 div (N_src + V) — the linear-space integer deviation from
    log-space NB (the q75/q78 precedent: exact integers beat
    engine-dependent Σ of logs), with the same argmax shape. Predicted
    source = highest score, ties to the lexicographically first
    source.

    Plan: ONE token explode feeds training (map-side-combined
    groupBy(source, tok); V a 1-row broadcast) AND scoring (doc
    tokens equi-join the weight table on tok — fan-out × n_sources,
    which is O(5), then ONE groupBy(doc_id, source)); the dense
    doc×source spine is a broadcast cross join against the k-row
    source table, so absent pairs get their floor without any outer
    shuffle; the final argmax is a row_number window on doc_id over k
    rows per doc. Text never shuffles.

    Per-source totals are k≈n_sources numbers: a groupBy("source")
    rollup broadcast-joined back onto the weight table — NEVER
    Window.partitionBy("source") over the (source, token) aggregate,
    which would single-task a full per-source vocabulary (~10^8 rows
    per task at web scale). The identical groupBy(source, tok)
    exchange under weights/src_totals is reused at runtime
    (ReusedExchange), so the rollup costs one k-row pass, not a
    recompute of the token counts."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select("doc_id", "source", toks.alias("toks"))
    tok = staged.select("doc_id", "source", F.explode("toks").alias("tok"))
    cnt = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = tok.agg(F.countDistinct("tok").alias("v"))
    src_totals = cnt.groupBy("source").agg(F.sum("c").alias("n_src"))
    weights = (cnt.join(F.broadcast(src_totals), "source")
               .crossJoin(F.broadcast(vocab))
               .select("source", "tok",
                       F.expr("((c + 1) * 1000) div (n_src + v)")
                       .alias("w_milli")))
    floors = (src_totals
              .crossJoin(F.broadcast(vocab))
              .select(F.col("source").alias("src"),
                      F.expr("1000 div (n_src + v)").alias("floor_milli")))
    # scoring: join doc token OCCURRENCES onto the weight table (the
    # join key is tok; each token matches <= n_sources weight rows)
    present = (tok.select("doc_id", "tok")
               .join(weights.withColumnRenamed("source", "src"), "tok")
               .groupBy("doc_id", "src")
               .agg(F.sum("w_milli").alias("sum_present"),
                    F.count(F.lit(1)).alias("n_present")))
    spine = (staged.select("doc_id", "source",
                           F.size("toks").cast("long").alias("n_toks"))
             .crossJoin(F.broadcast(floors.select("src", "floor_milli"))))
    scored = (spine.join(present, ["doc_id", "src"], "left")
              .na.fill(0, ["sum_present", "n_present"])
              .select("doc_id", "source", "src",
                      (F.col("sum_present")
                       + (F.col("n_toks") - F.col("n_present"))
                       * F.col("floor_milli")).alias("score_milli")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").desc(), F.col("src").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("doc_id", "source",
                    F.col("src").alias("predicted"), "score_milli",
                    (F.col("src") == F.col("source")).alias("correct")))


def q60_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: top bigrams by pointwise mutual
    information. PMI = ln(p_ab / (p_a·p_b)) is ranked via its ARGUMENT
    in integer fixed point — pmi_ratio_x1000 = (c_ab·Nu²·1000) div
    (Nb·c_a·c_b) — because ln is monotone, so the ranking is identical
    while every compared value stays an exact integer (no cross-engine
    libm/round drift). Int64 bound: safe below ~10^9 corpus tokens;
    past that, rank in log-space doubles (exactness of the ranking no
    longer needs the ratio's low bits).

    Plan: bigrams from a narrow zip of adjacent tokens (no
    self-join!); counts via map-side-combined groupBy; the HAVING
    c_ab ≥ {PMI_MIN_COUNT} filter prunes the join input before the two
    unigram equi-joins; corpus totals are 1-row broadcast aggregates
    (the q34 pattern); TakeOrdered finishes."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select(toks.alias("toks"))
    n = F.size("toks")
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b))).otherwise(F.array())
    big = staged.select(F.explode(bigrams).alias("bg"))
    uni = staged.select(F.explode("toks").alias("tok"))
    c1 = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    cb = (big.groupBy("bg").agg(F.count(F.lit(1)).alias("c_ab"))
          .filter(F.col("c_ab") >= PMI_MIN_COUNT))
    nu = c1.agg(F.sum("c").alias("nu"))
    nb = big.agg(F.count(F.lit(1)).alias("nb"))
    joined = (cb
              .withColumn("w1", F.split("bg", " ")[0])
              .withColumn("w2", F.split("bg", " ")[1])
              .join(c1.select(F.col("tok").alias("w1"),
                              F.col("c").alias("c_a")), "w1")
              .join(c1.select(F.col("tok").alias("w2"),
                              F.col("c").alias("c_b")), "w2")
              .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(nb)))
    scored = joined.select(
        "bg", "c_ab", "c_a", "c_b",
        F.expr("(c_ab * nu * nu * 1000) DIV (nb * c_a * c_b)")
        .cast("long").alias("pmi_ratio_x1000"))
    return (scored.orderBy(F.col("pmi_ratio_x1000").desc(), F.col("bg"))
            .limit(PMI_TOP_K))


def q62_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the retrieval-side primitive of a
    training-data platform (BM25 search, contamination lookups,
    hard-negative mining all start from postings): per token, document
    frequency, collection frequency, and the ORDERED posting list of
    doc ids, fingerprinted (md5 over the comma-joined sorted list) so
    the oracle verifies every posting of every token, not just counts.

    Plan: explode → distinct (doc_id, tok) → groupBy(tok) with
    sort_array(collect_list) — one shuffle per aggregation on the
    token key. At 100 TB, stop-token postings are the skew: real
    builds shard a hot token's posting list into fixed-size blocks
    (doc-id-range sub-keys) and concatenate at serve time; the
    fingerprint here is over the logical (unsharded) list, which is
    what that sharding preserves."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    pairs = docs.select("doc_id", F.explode(toks).alias("tok"))
    cf = pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("cf"))
    post = (pairs.distinct()
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.md5(F.concat_ws(",", F.transform(
                     F.sort_array(F.collect_list("doc_id")),
                     lambda x: x.cast("string")))).alias("postings_fp")))
    return post.join(cf, "tok").select("tok", "df", "cf", "postings_fp")


def q16_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the space-collapsed lowercased
    text — the exact-dedup key. Narrow map, hash computed JVM-side."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), " ", "")).alias("fp"),
    )


def q17_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: group by content hash, keep the minimum
    doc_id as canonical. One shuffle on the 128-bit hash — uniformly
    distributed, no skew; at 100 TB this is the standard first dedup
    pass before any near-dup method."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("n_dups"))
    )


def q25_order_history_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered grouped reassembly: each customer's order-key sequence in
    (date, key) order, fingerprinted — the relational shape of
    conversation reassembly + content fingerprinting (turns → ordered
    transcript → dedup key). collect_list is made deterministic by
    sorting structs, mirroring SQL's string_agg(... ORDER BY)."""
    orders = _t(spark, sf_dir, "orders")
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("o_orderdate").alias("d"),
                                             F.col("o_orderkey").alias("k")))),
        lambda x: x["k"].cast("string"))
    return (
        orders.groupBy("o_custkey")
        .agg(F.concat_ws(",", seq).alias("history"))
        .select("o_custkey", F.md5(F.col("history")).alias("history_fp"),
                F.length("history").alias("history_len"))
    )


def q26_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames (absent in the reference, §2.d): running revenue
    per customer over their orders in date order. One shuffle on
    o_custkey; the frame is computed within each partition slice."""
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey",
                (F.sum(_cents("o_totalprice")).over(w) / 100.0)
                .alias("running_total"))
    )


def q27_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation): subtotal + grand-total rows —
    grouping-sets coverage the reference lacks (§2.d). Same exact-cents
    arithmetic; NULL group keys mark the subtotal levels."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup(F.col("r_name").alias("region_name"),
                      F.col("n_name").alias("nation_name"))
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                           1_000_000)) / 1e6).alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks; built as cogrouped
    applyInPandas + merge_asof — see operators/temporal.py): each
    purchase event picks up the value of the user's most recent click
    at-or-before it. Oracle = DuckDB's native ASOF JOIN."""
    from .operators.temporal import asof_join
    ev = _t(spark, sf_dir, "events")
    # epoch-µs long for the asof key: exact, and sidesteps a Spark
    # cogroup limitation where TIMESTAMP_NTZ columns are silently
    # dropped from the right-side Arrow frame
    ts_us = F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", ts_us))
    # dedupe clicks to one per (user, ts) — deterministic asof target
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", ts_us, "value", "event_id")
              .groupBy("user_id", "ts_us")
              .agg(F.max_by("value", "event_id").alias("click_value")))
    out = asof_join(purchases, clicks, on="ts_us", by="user_id",
                    value_col="click_value")
    return out.select("event_id", "user_id",
                      F.round("click_value", 6).alias("click_value"))


def q29_conv_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pipeline's SQL-expressible backbone under the exact
    oracle: documents → transcripts derivation (ingest.docs_to_transcripts
    chunking) → per-conversation structure validation + role-balance
    aggregates. Everything except the Python scorers — so the driver's
    value-hash gate covers the conv_id naming, turn chunking, role
    alternation, turn ordering, and the salt-free integer aggregates."""
    from .ingest import docs_to_transcripts
    t = docs_to_transcripts(_t(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return (
        t.select("conv_id", "turn_idx", "role", F.size(toks).alias("n_toks"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("conv_n_turns"),
            F.round(F.sum((F.col("role") == "assistant").cast("long"))
                    / F.greatest(F.sum(F.col("role").isin("user", "assistant")
                                       .cast("long")), F.lit(1)), 6)
            .alias("role_balance"),
            F.min_by("role", "turn_idx").alias("first_role"),
            F.sum("n_toks").alias("conv_tokens"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .withColumn("structure_ok", F.col("first_role").isin("system", "user")
                    & (F.col("last_turn_idx") == F.col("conv_n_turns") - 1))
    )


def q33_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q12/Q14 shape): CASE-WHEN inside
    aggregates — high/low-priority lineitem counts per return flag and
    the promo-style revenue share, all in exact integer arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 1_000_000)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
             F.round(F.sum(F.when(high, rev).otherwise(0))
                     / F.greatest(F.sum(rev), F.lit(1)), 6)
             .alias("high_rev_share"))
    )


def q34_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the document corpus: idf = ln(N / df), per-doc top-3
    terms by tf·idf with (score desc, term asc) tiebreak. Exact
    cross-engine: integer tf/df counts, ln on identical doubles, round 6.
    Two shuffles (token agg, per-doc window) — both on uniform keys."""
    docs = _t(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate, not a driver-side
    # .count() (which would cost an extra scan job per invocation)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tokens = (docs.select("doc_id",
                          F.explode(F.split(F.lower(F.col("text")), " "))
                          .alias("term"))
              .filter(F.col("term") != ""))
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score",
                    F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
        .drop("n_docs")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "score", "rk")
    )


def q35_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (holistic aggregate — needs the full sorted
    group, unlike the streaming-combinable sums): median/p90 per return
    flag. Spark `percentile` and DuckDB `quantile_cont` share the same
    linear-interpolation definition, so values are bit-identical. At
    100 TB prefer approx_percentile (t-digest, mergeable) — exact
    percentile is the correctness baseline for it."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
             F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
             F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
             .alias("med_price"),
             F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4)
             .alias("p99_price"))
    )


def q36_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the §2 UDF surface beyond scalar UDFs
    and cogroup): per-event-type demeaning. Arithmetic is exact-integer
    micros so the pandas group computation and the SQL window mean agree
    bit-for-bit (see _cents): one shuffle on event_type, whole-group
    pandas function per key."""
    import pandas as pd
    ev = _t(spark, sf_dir, "events")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        micros = (pdf["value"] * 1e6).round()
        mean = micros.sum() / len(micros)
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "demeaned": ((micros - mean) / 1e6).round(6),
        })

    return (ev.select("event_id", "event_type", "value")
            .groupby("event_type")
            .applyInPandas(demean,
                           schema="event_id long, event_type string, demeaned double"))


def q45_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch scale path (HyperLogLog count-distinct,
    Greenwald-Khanna quantiles) under a VALUE-HASH gate on its error
    contract: sketches are engine-specific so their raw outputs cannot
    cross-check, but their bounded-error CLAIMS can — the query emits
    exact values plus booleans asserting the sketch landed within its
    bound (HLL within 5% relative; approx-median inside the exact
    p45–p55 rank window, the principled check for GK's rank-error
    guarantee). The oracle computes the same exact values and literal
    TRUEs: a sketch drifting out of contract hash-fails the driver
    gate. At 100 TB the sketches are the ONLY viable plan (single-pass,
    mergeable, fixed memory); q35's exact percentiles are their
    correctness baseline."""
    ev = _t(spark, sf_dir, "events")
    # rsd 0.01: the asserted 5% bound must sit well outside the sketch's
    # 1-sigma error, or the gate flips on ordinary estimator variance
    # (the default rsd=0.05 failed exactly at the bound at sf0.1)
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct_users"),
        F.expr("approx_count_distinct(user_id, 0.01)").alias("hll"),
        F.expr("percentile(value, 0.5)").alias("exact_med"),
        F.expr("percentile(value, 0.45)").alias("p45"),
        F.expr("percentile(value, 0.55)").alias("p55"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("apx_med"),
    )
    # coalesce/guard: an all-null group yields NULL ratios/percentiles —
    # degenerate groups count as within-contract (nothing to estimate),
    # matching the oracle's literal TRUE
    return agg.select(
        "event_type", "exact_distinct_users",
        F.coalesce(
            F.when(F.col("exact_distinct_users") > 0,
                   (F.abs(F.col("hll") - F.col("exact_distinct_users"))
                    / F.col("exact_distinct_users")) <= 0.05),
            F.lit(True)).alias("hll_within_5pct"),
        F.round("exact_med", 6).alias("med_value"),
        F.coalesce(F.col("apx_med").between(F.col("p45"), F.col("p55")),
                   F.lit(True)).alias("approx_med_in_rank_window"),
    )


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q44_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization (the GPT-2 pretokenizer shape: letter
    runs | digit runs | single punctuation, whitespace dropped) via
    regexp_extract_all — JVM-side, zero Python, narrow map. The pattern
    sticks to ASCII classes so Java regex and DuckDB's RE2 tokenize
    bit-identically (\\p{L} unicode tables differ between engines).
    Complements q13's whitespace counting; the fingerprint pins the
    full token SEQUENCE, not just the count."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.md5(F.concat_ws("\x1f", toks)).alias("tok_fp"),
    )


def q72_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / compression statistics per language —
    the standard pre-training diagnostic (how many subword tokens a
    word costs, how many bytes a token carries) that decides tokenizer
    fit and per-language sampling budgets. Words = whitespace tokens,
    subwords = the q44 BPE-ish pre-tokenizer; ratios in integer fixed
    point (milli-units) so both engines agree bit-for-bit. One
    map-side-combined groupBy(lang) — three rows out."""
    docs = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower(F.col("text")), " "),
                     lambda t: t != "")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    per_doc = docs.select(
        "lang",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.size(words).cast("long").alias("n_words"),
        F.size(bpe).cast("long").alias("n_bpe"))
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bpe").alias("total_bpe"))
    return agg.select(
        "lang", "n_docs", "total_bytes", "total_words", "total_bpe",
        F.expr("(total_bpe * 1000) div greatest(total_words, 1)")
        .alias("fertility_milli"),
        F.expr("(total_bytes * 1000) div greatest(total_bpe, 1)")
        .alias("bytes_per_token_milli"))


def q71_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defused fact⋈dim join (operators/skew.salted_join):
    lineitem joins orders on a salted key — a hot orderkey's rows
    spread over 16 reduce partitions while every match pair still
    occurs exactly once. The oracle is the PLAIN join, so the salting
    identity (salted result == plain result) is verified row-exact.
    Plan-asserted: the join exchange partitions on (key, salt)."""
    from .operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey",
        "o_orderstatus")
    joined = salted_join(li, orders, on=["l_orderkey"],
                         salt_by=["l_orderkey", "l_linenumber"])
    return joined.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        "o_custkey", "o_orderstatus")


def q68_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc duplicate-n-gram statistics
    (operators/textstats.repetition_stats): occurrence counts and
    character sums of word bigrams repeating inside the same document,
    plus the integer keep rule (<20% duplicated-gram characters). All
    integers — the oracle replays gram counting bit-for-bit. Two
    map-side-combined shuffles on (doc, gram)/(doc) keys; text never
    shuffles."""
    from .operators.textstats import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"), n=2)


def q69_quality_buckets(spark: SparkSession, sf_dir: str,
                        approx: bool = False) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    rank every document inside its language by a quality score and cut
    the ranking into head/middle/tail thirds (CCNet does this with LM
    perplexity; here the SQL-expressible stopword-density proxy in
    integer fixed point, q15/q54's score family).

    Two physical strategies, same q78 pairing:
    * approx=False (the oracle baseline): ntile over a per-lang window
      + total-order tiebreak — exact, hash-matches DuckDB, but each
      language's documents sort inside ONE task, so a 100 TB language
      is a straggler.
    * approx=True (the 100 TB path, CCNet's actual method): the two
      cut thresholds per language come from a MERGEABLE quantile
      sketch (percentile_approx partial-aggregates map-side; no
      per-lang sort anywhere), broadcast back onto the scored docs —
      the whole job is two narrow shuffles of lang-keyed partials
      regardless of language skew."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    staged = docs.select(
        "doc_id", "lang",
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        .cast("long").alias("n_stop"),
        F.greatest(F.size(toks), F.lit(1)).cast("long").alias("n_toks"))
    scored = staged.withColumn(
        "stop_score", F.expr("(n_stop * 1000000) div n_toks"))
    if approx:
        # score DESCENDS through the buckets (high stopword density =
        # head), so the cuts are the upper/lower tertiles
        cuts = scored.groupBy("lang").agg(
            F.percentile_approx(
                "stop_score", F.array(F.lit(2 / 3), F.lit(1 / 3)),
                F.lit(10000)).alias("qs"))
        return (scored.join(F.broadcast(cuts), "lang")
                .select("doc_id", "lang", "stop_score",
                        F.when(F.col("stop_score") >= F.col("qs")[0],
                               "head")
                        .when(F.col("stop_score") >= F.col("qs")[1],
                              "middle")
                        .otherwise("tail").alias("bucket")))
    w = Window.partitionBy("lang").orderBy(
        F.col("stop_score").desc(), F.col("doc_id").asc())
    bucket = F.ntile(3).over(w)
    return scored.select(
        "doc_id", "lang", "stop_score",
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == 2, F.lit("middle"))
        .otherwise(F.lit("tail")).alias("bucket"))


def q67_luhn_cc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated PII masking (operators/pii.cc_scrub): a
    deterministic pseudo-card is injected into every document — even
    doc_ids get the correct Luhn check digit (valid card, must mask),
    odd doc_ids get checksum+5 (shape matches, checksum fails, must
    stay) — so detection, validation, and masking are all exercised
    and verified per row. One narrow JVM-side projection end to end:
    regexp candidate extraction, integer-fold checksum, replace fold
    (no Python, no UDF — contrast the flagship's byte-exact-parity
    Python scrub)."""
    from .operators.pii import cc_scrub, luhn_check_digit_expr

    docs = _t(spark, sf_dir, "documents")
    payload = F.lpad((F.col("doc_id") * 7919 % F.lit(10 ** 15))
                     .cast("string"), 15, "0")
    chk = luhn_check_digit_expr(payload)
    digit = F.when(F.col("doc_id") % 2 == 0, chk).otherwise((chk + 5) % 10)
    card16 = F.concat(payload, digit.cast("string"))
    fmt = F.concat_ws(
        "-", F.substring(card16, 1, 4), F.substring(card16, 5, 4),
        F.substring(card16, 9, 4), F.substring(card16, 13, 4))
    staged = docs.select(
        "doc_id",
        F.concat(F.substring("text", 1, 80), F.lit(" pay "), fmt,
                 F.lit(" now")).alias("text"))
    return (cc_scrub(staged)
            .select("doc_id", "n_cc", "text_scrubbed"))


def q37_structured_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-output schema enforcement (reference:
    prompt_formatter.py:104-148 response_to_response_format — JSON-parse
    + schema-validate, null-skip on mismatch). A deterministic subset of
    payloads is corrupted in-query (event_id%11 → invalid JSON,
    event_id%13 → type mismatch) so BOTH failure channels are exercised
    and counted; the valid remainder aggregates the parsed field.
    One narrow from_json map + one groupBy — no Python, no extra scan."""
    from pyspark.sql import types as T
    from .operators.structured import validate_json
    ev = _t(spark, sf_dir, "events")
    corrupted = ev.withColumn(
        "payload",
        # truncated document — malformed for BOTH engines (Jackson
        # accepts trailing garbage after a complete first document, so
        # appending junk would not be malformed to Spark)
        F.when(F.col("event_id") % 11 == 0, F.lit('{"k": '))
        .when(F.col("event_id") % 13 == 0, F.lit('{"k": "oops"}'))  # bad type
        .otherwise(F.col("props")))
    v = validate_json(corrupted, "payload",
                      T.StructType([T.StructField("k", T.IntegerType())]),
                      required=("k",))
    return (
        v.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum((~F.col("json_ok")).cast("long")).alias("n_bad_json"),
             F.sum((F.col("json_ok") & ~F.col("schema_ok")).cast("long"))
             .alias("n_mismatch"),
             F.sum(F.col("schema_ok").cast("long")).alias("n_valid"),
             F.sum(F.when(F.col("schema_ok"), F.col("parsed.k"))
                   .otherwise(0).cast("long")).alias("sum_valid_k"))
    )


def q38_nested_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested conversation columns (SURVEY §1.1: message list ↔
    ArrayType(StructType)): long-format turns collected into an ordered
    array<struct<role,text>> per conversation, then flat features
    computed FROM the nested column (size, boundary roles, role
    alternation, content fingerprint). The collect is the only shuffle;
    everything after is narrow array expressions."""
    from .ingest import docs_to_transcripts
    from .operators.nested import collect_conversations, conversation_features
    turns = docs_to_transcripts(_t(spark, sf_dir, "documents"))
    return conversation_features(collect_conversations(turns))


def q43_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining window-function surface (row_number/lag/running-sum are
    covered by q05/q11/q26): ntile quartiles, dense_rank, and lead —
    per-segment customer balance analytics. The (bal_cents, c_custkey)
    total-order tiebreak makes ntile/lead deterministic; dense_rank
    deliberately omits the tiebreak (equal balances share a rank). All
    three windows partition on mktsegment, so Catalyst plans ONE
    shuffle and sorts within it.

    SCALE NOTE: mktsegment has ~5 values, so each segment sorts inside
    one task — fine for a demo of the window surface, a straggler at
    100 TB. The scale idiom for low-cardinality-partition ranking is
    the mergeable-sketch threshold path (percentile_approx broadcast
    back, q69/q78 approx=True) or, when exact global order is
    required, the sketch-boundary parallel sort (operators/ranking.py
    global_rank, q84)."""
    cents = _cents("c_acctbal")
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", cents.alias("bal_cents"))
        .withColumn("quartile", F.ntile(4).over(
            Window.partitionBy("c_mktsegment").orderBy(
                F.col("bal_cents").desc(), F.col("c_custkey").asc())))
        .withColumn("bal_rank", F.dense_rank().over(
            Window.partitionBy("c_mktsegment").orderBy(
                F.col("bal_cents").desc())))
        .withColumn("next_lower_bal",
                    F.lead("bal_cents").over(
                        Window.partitionBy("c_mktsegment").orderBy(
                            F.col("bal_cents").desc(), F.col("c_custkey").asc())))
        .select("c_custkey", "c_mktsegment", "bal_cents", "quartile",
                "bal_rank", "next_lower_bal")
    )


def q42_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (the set-op breadth the reference lacks,
    SURVEY §2.d — only union exists there): customers who placed an
    urgent order AND have negative balance, minus the BUILDING segment.
    Set ops plan as hash aggregates + joins on the key — one uniform-key
    shuffle each at scale."""
    cust = _t(spark, sf_dir, "customer")
    urgent = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")).distinct())
    negative = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    building = (cust.filter(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey"))
    return urgent.intersect(negative).subtract(building)  # EXCEPT DISTINCT


def q41_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated (TPC-H Q17 shape):
    per-brand revenue from lineitems below 0.2× their part's average
    quantity. Spark expresses the correlation as an explicit aggregate
    + join — the per-part average table is ~|part| rows (corpus/60),
    broadcast-able; Catalyst decorrelates the SQL form into exactly
    this plan. Threshold arithmetic is exact: avg = int-sum/count on
    both engines, same doubles, same comparison."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    avg_q = (li.groupBy(F.col("l_partkey").alias("pk"))
             .agg((F.sum(F.col("l_quantity").cast("long"))
                   / F.count(F.lit(1))).alias("avg_qty")))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg((F.sum(_cents("l_extendedprice")) / 100.0).alias("revenue"),
             F.count(F.lit(1)).alias("n_small"))
    )


def q40_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (operators/sampling.py):
    salted md5-bucket of the row key → split assignment that is a pure
    function of (id, salt) — reproducible across partitioning, retries,
    engines, and scale; changing the salt redraws without touching
    data. Narrow JVM-side map, zero shuffle, zero Python."""
    from .operators.sampling import hash_split
    docs = _t(spark, sf_dir, "documents")
    return hash_split(docs.select("doc_id"), "doc_id", salt="v1")


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — aliases and rounding match the Spark side exactly
# ---------------------------------------------------------------------------

def _luhn_sum_sql(digits: str, shift: int = 0) -> str:
    """DuckDB replay of pii.luhn_ok_expr's integer fold: Luhn sum over
    the digit string expression `digits` (positions counted from the
    right, offset by `shift` for check-digit generation)."""
    pos = f"(i + {shift})" if shift else "i"
    dig = f"CAST(substr(reverse({digits}), i, 1) AS INTEGER)"
    return (f"list_sum(list_transform(range(1, len({digits}) + 1), i -> "
            f"CASE WHEN {pos} % 2 = 0 THEN "
            f"CASE WHEN 2*{dig} > 9 THEN 2*{dig} - 9 ELSE 2*{dig} END "
            f"ELSE {dig} END))")


_CC_DIGITS = "regexp_replace(c, '[^0-9]', '', 'g')"
_LUHN_CC_SQL = f"""
    WITH staged AS (
        SELECT doc_id,
               lpad(CAST(doc_id * 7919 % 1000000000000000 AS VARCHAR),
                    15, '0') AS payload,
               text
        FROM documents
    ), carded AS (
        SELECT doc_id,
               payload || CAST(CASE WHEN doc_id % 2 = 0
                    THEN (10 - {_luhn_sum_sql('payload', shift=1)} % 10) % 10
                    ELSE ((10 - {_luhn_sum_sql('payload', shift=1)} % 10) % 10
                          + 5) % 10 END AS VARCHAR) AS card16,
               text
        FROM staged
    ), withtext AS (
        SELECT doc_id,
               substr(text, 1, 80) || ' pay ' ||
               substr(card16, 1, 4) || '-' || substr(card16, 5, 4) || '-' ||
               substr(card16, 9, 4) || '-' || substr(card16, 13, 4) ||
               ' now' AS text
        FROM carded
    ), valid AS (
        SELECT doc_id, text,
               list_filter(
                 list_sort(list_distinct(regexp_extract_all(
                     text, '[0-9](?:[ -]?[0-9]){{12,18}}'))),
                 c -> len({_CC_DIGITS}) BETWEEN 13 AND 19
                      AND {_luhn_sum_sql(_CC_DIGITS)} % 10 = 0) AS vs
        FROM withtext
    )
    SELECT doc_id, CAST(len(vs) AS INTEGER) AS n_cc,
           list_reduce(list_prepend(text, vs),
                       (a, b) -> replace(a, b, '<CC>')) AS text_scrubbed
    FROM valid
"""


_REPETITION_SQL = """
    WITH base AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
               list_filter(string_split(lower(text), ' '),
                           t -> t <> '') AS toks
        FROM documents
    ), grams AS (
        SELECT doc_id, unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> array_to_string(toks[i:i+1], ' '))) AS gram
        FROM base
    ), counts AS (
        SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
    ), agg AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
                    AS BIGINT) AS dup_occurrences,
               CAST(sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END)
                    AS BIGINT) AS dup_chars,
               CAST(max(c) AS BIGINT) AS max_gram_count
        FROM counts GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_chars,
           coalesce(a.n_grams, 0) AS n_grams,
           coalesce(a.dup_occurrences, 0) AS dup_occurrences,
           coalesce(a.dup_chars, 0) AS dup_chars,
           coalesce(a.max_gram_count, 0) AS max_gram_count,
           (coalesce(a.dup_chars, 0) = 0
            OR coalesce(a.dup_chars, 0) * 100 < 20 * b.n_chars) AS rep_ok
    FROM base b LEFT JOIN agg a USING (doc_id)
"""


DSIR_DIM = 32          # hashed-feature buckets for importance weights
DSIR_TARGET = "src0"   # the "target domain" sample (DSIR's D_target)
DSIR_KEEP_FRAC = 5     # resample keeps ceil(n/5) top-weighted docs


def q75_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023): score every raw document by how much its hashed n-gram
    profile looks like a TARGET domain (here: the `source = src0`
    docs), keep the top fraction. The published method weights by
    Σ_f c_f·log(p_target(f)/p_raw(f)); this integer-exact variant uses
    the LINEAR likelihood ratio in milli-units per feature —
    w_milli(f) = (1000·(c_t(f)+1)·(N_r+B)) div ((c_r(f)+1)·(N_t+B)),
    add-one smoothed — summed per doc and length-normalized, so every
    value is engine/partition-order exact (ln is monotone per feature
    but float; the ratio form keeps ranking deterministic, the
    documented deviation from the paper).

    Plan shape at 100 TB: token explode → md5 bucket (narrow) → ONE
    map-side-combined groupBy(doc_id, b); the two distributions are
    B-row rollups of that table (second tiny shuffle), joined back by
    BROADCAST (B=32 rows); final score is one more map-side-combined
    groupBy(doc_id). The corpus is never joined to itself and the only
    data-proportional shuffle keys are (doc_id, bucket) — uniform by
    construction of the hash. The one global window ranks the DOC-LEVEL
    score table (4 narrow columns, |docs| rows — text never reaches
    it); the exact rank itself runs through operators/ranking.
    global_rank — quantile-bucketed k parallel sorts, NO empty-
    PARTITION-BY window / SinglePartition exchange — so even the
    doc-level rank survives 10^9+ docs."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    bucket = (F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10)
              .cast("long") % DSIR_DIM)
    per_db = (docs.select("doc_id", "source", F.explode(toks).alias("tok"))
              .select("doc_id", "source", bucket.alias("b"))
              .groupBy("doc_id", "source", "b")
              .agg(F.count(F.lit(1)).alias("c")))
    # both distributions AND their totals roll up from per_db through
    # ONE conditional aggregation chain — per_db's exchange is the only
    # corpus-size subtree, shared (ReusedExchange) between this rollup
    # and the scoring join below; raw/target as separate branches would
    # re-explode the corpus once per branch (no CTE reuse in DataFrame
    # plans)
    by_b = per_db.groupBy("b").agg(
        F.sum("c").alias("c_r"),
        F.sum(F.when(F.col("source") == DSIR_TARGET, F.col("c"))
              .otherwise(0)).alias("c_t"))
    totals = by_b.agg(F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t"))
    weights = (by_b.crossJoin(F.broadcast(totals))
               .select("b", F.expr(
                   f"(1000 * (c_t + 1) * (n_r + {DSIR_DIM})) div "
                   f"((c_r + 1) * (n_t + {DSIR_DIM}))").alias("w_milli")))
    scored = (per_db.join(F.broadcast(weights), "b")
              .groupBy("doc_id")
              .agg(F.sum(F.expr("c * w_milli")).alias("score_milli"),
                   F.sum("c").alias("n_toks"))
              .withColumn("score_per_tok",
                          F.expr("score_milli div n_toks")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    from .operators.ranking import global_rank
    ranked = global_rank(
        scored, "score_per_tok", descending=True,
        order_by=[F.col("score_per_tok").desc(), F.col("doc_id").asc()],
        rank_col="rank")
    return (ranked
            .crossJoin(F.broadcast(n_docs))
            # ceil(n/frac) via (n + frac - 1) div frac: exact under BOTH
            # truncating (Spark div) and floor (//) integer division
            # because every operand is positive
            .withColumn("kept", F.expr(
                f"rank <= (n + {DSIR_KEEP_FRAC - 1}) div {DSIR_KEEP_FRAC}"))
            .select("doc_id", "score_milli", "n_toks", "score_per_tok",
                    F.col("rank").cast("int").alias("rank"), "kept"))


BM25_TERMS = ("spark", "join", "stream")
BM25_TOP_K = 10


def q76_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shaped retrieval over the corpus for a fixed query, every
    arithmetic step in integer milli-units so ranking is engine-exact:
    idf_milli = 1000·(N−df+0.5)/(df+0.5) computed as
    (1000·(2N−2df+1)) div (2df+1) (the classic Robertson idf with ln
    dropped — ln is monotone per term, and float ln sums are not
    reproducible across engines); tf part = tf·(k1+1)/(tf + k1·(1−b +
    b·dl/avgdl)) with k1=1.2, b=0.75 as exact rationals. Top-{k} docs
    by (score desc, doc_id).

    Plan: doc lengths = one map-side-combined groupBy(doc_id); query-
    term tfs come from an explode FILTERED to the 3 query terms before
    the groupBy (the scan feeds a tiny aggregation); df and avgdl are
    broadcast 1-row/3-row aggregates; final TakeOrdered — the corpus
    text never shuffles and nothing is quadratic."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    tokd = docs.select("doc_id", F.explode(toks).alias("tok"))
    dl = tokd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qt = tokd.filter(F.col("tok").isin(*BM25_TERMS))
    tf = qt.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qt.select("doc_id", "tok").distinct() \
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    glob = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("dl").alias("sum_dl"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(glob))
        .withColumn("avgdl_milli", F.expr("(sum_dl * 1000) div n_docs"))
        .withColumn("idf_milli", F.expr(
            "(1000 * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)"))
        # k1·((1−b) + b·dl/avgdl) in milli: 6/5 · (250 + 750·dl/avgdl)
        .withColumn("r_milli", F.expr(
            "(dl * 1000000) div avgdl_milli"))
        .withColumn("den_milli", F.expr(
            "tf * 1000 + (6 * (250 + (3 * r_milli) div 4)) div 5"))
        .withColumn("contrib", F.expr(
            "idf_milli * ((tf * 2200 * 1000) div den_milli)"))
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"),
             F.max("dl").alias("dl"),
             F.count(F.lit(1)).alias("n_terms")))
    return (scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(BM25_TOP_K))


LANGID_TOP_K = 5


def q77_langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed training of the flagship's char-trigram NB language
    classifier (models/langid.py builds one per worker from a seed
    corpus; this is the corpus-scale job that produces its count table
    from labeled data). Per-(lang, trigram) counts over lowercased
    text, Laplace-smoothed conditionals in integer milli-units —
    p_milli = ((c+1)·1000) div (c_lang + V) with V = distinct trigrams
    corpus-wide — and the top-{k} trigrams per language by (count desc,
    trigram asc).

    Plan: trigrams from a narrow sequence/transform explode (text
    dropped at the explode); ONE map-side-combined groupBy(lang, tri);
    per-language totals via a window over the aggregated table (shares
    the top-k window's lang exchange, q73's no-CTE-reuse trick); V is
    a broadcast 1-row aggregate."""
    docs = _t(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being
    # empty — a sub-3-char doc must yield zero trigrams, not garbage
    tris = F.when(F.length(t) >= 3, F.transform(
        F.sequence(F.lit(1), F.length(t) - 2),
        lambda i: t.substr(i, F.lit(3)))
    ).otherwise(F.array().cast("array<string>"))
    staged = (docs.select("lang", F.explode(tris).alias("tri")))
    cb = staged.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("c"))
    # V from the AGGREGATED table, not the raw explode: distinct tri
    # over (lang, tri) pairs equals distinct tri over rows, and cb's
    # exchange is reused (a countDistinct over `staged` would re-scan
    # and re-explode the whole corpus — no CTE reuse in DataFrame plans)
    vocab = cb.agg(F.countDistinct("tri").alias("v"))
    w = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("tri").asc())
    return (cb.withColumn("c_lang",
                          F.sum("c").over(Window.partitionBy("lang")))
            .crossJoin(F.broadcast(vocab))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= LANGID_TOP_K)
            .select("lang", "tri", "c", "c_lang",
                    F.expr("((c + 1) * 1000) div (c_lang + v)")
                    .alias("p_milli"),
                    F.col("rank").cast("int").alias("rank")))


PSEUDO_SALT = "ps-v1"
PSEUDO_CONVS = 100


def _pseudo_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-turn PII fixture: docs become turns of
    conv `doc_id % 100`; each turn's text gets 1-2 emails drawn from
    the conversation's 7-address pool (md5-chosen), so the SAME
    address recurs across turns of a conversation — the consistency
    the operator must preserve — while pools differ across
    conversations. Replicated literally in the oracle SQL."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(":" + PSEUDO_SALT)))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 4), 16, 10).cast("long")
    conv = (F.col("doc_id") % PSEUDO_CONVS).alias("conv_id")
    cs = F.col("conv_id").cast("string")
    em1 = F.concat(F.lit("user"), (a % 7).cast("string"),
                   F.lit("@ex"), cs, F.lit(".com"))
    em2 = F.concat(F.lit("user"), (b % 7).cast("string"),
                   F.lit("@ex"), cs, F.lit(".com"))
    base = F.array_join(F.slice(F.filter(F.split(F.col("text"), " "),
                                         lambda t: t != ""), 1, 8), " ")
    text2 = F.concat(base, F.lit(" reach me at "), em1,
                     F.when(b % 2 == 0, F.concat(F.lit(" or "), em2))
                     .otherwise(F.lit("")))
    return (docs.select("doc_id", conv, "text")
            .select("conv_id", F.col("doc_id").alias("turn_id"),
                    text2.alias("text")))


def q104_pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent PII pseudonymization (operators/pii.pseudonymize):
    every email in a conversation is rewritten as a STABLE per-conv
    alias (<EMAIL_k>, numbered by first occurrence), so identity
    structure survives scrubbing — the upgrade over rules.py's
    uniform <EMAIL> masking. Whole plan is codegen'd expressions:
    one (conv, entity) groupBy, a per-conv rank over DISTINCT
    entities (bounded by vocabulary, skew-immune), broadcast pairs
    join, longest-first replacement fold. Oracle replays the fixture
    and the numbering/fold rules in DuckDB and the rewritten text is
    hash-verified byte-exact."""
    from .operators.pii import pseudonymize
    turns = _pseudo_turns(spark, sf_dir)
    return (pseudonymize(turns, "conv_id", "turn_id")
            .select("conv_id", "turn_id", "pseudo_text"))


_PSEUDO_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_PSEUDO_SQL = f"""
    WITH seed AS (
        SELECT doc_id, doc_id % {PSEUDO_CONVS} AS conv_id,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{PSEUDO_SALT}'),
                               1, 8))::BIGINT AS a,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{PSEUDO_SALT}'),
                               9, 4))::BIGINT AS b,
               array_to_string(
                   list_filter(string_split(text, ' '),
                               w -> w <> '')[1:8], ' ') AS base
        FROM documents
    ), turns AS (
        SELECT conv_id, doc_id AS turn_id,
               base || ' reach me at '
               || 'user' || (a % 7)::VARCHAR || '@ex'
               || conv_id::VARCHAR || '.com'
               || CASE WHEN b % 2 = 0 THEN
                    ' or user' || (b % 7)::VARCHAR || '@ex'
                    || conv_id::VARCHAR || '.com'
                  ELSE '' END AS text
        FROM seed
    ), ents AS (
        SELECT conv_id, turn_id,
               u.s['i'] AS pos, u.s['e'] AS entity
        FROM turns,
             unnest(list_transform(
                 regexp_extract_all(text, '{_PSEUDO_RE}'),
                 (el, ix) -> {{'e': el, 'i': ix}})) AS u(s)
    ), fo AS (
        SELECT conv_id, entity, min(turn_id * 1000 + pos) AS fo
        FROM ents GROUP BY conv_id, entity
    ), aliased AS (
        SELECT conv_id, entity,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY fo, entity) AS k
        FROM fo
    ), pairs AS (
        SELECT conv_id,
               list(entity || '|<EMAIL_' || k::VARCHAR || '>'
                    ORDER BY len(entity) DESC, k) AS ps
        FROM aliased GROUP BY conv_id
    )
    SELECT t.conv_id, t.turn_id,
           list_reduce(
               list_prepend(t.text, coalesce(p.ps, [])),
               (acc, pr) -> replace(acc, split_part(pr, '|', 1),
                                    split_part(pr, '|', 2))) AS pseudo_text
    FROM turns t LEFT JOIN pairs p USING (conv_id)
"""


_Q108_SQL = f"""
    WITH toks AS (
        SELECT list_filter(string_split(lower(text), ' '),
                           t -> t <> '') AS toks,
               length(text) AS n_chars,
               length(text) - length(replace(text, ' ', '')) AS n_spaces
        FROM documents
    ), m AS (
        SELECT len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               len(list_filter(toks,
                               t -> t IN ({{STOPWORDS_SQL}}))) AS n_stop,
               n_chars, n_spaces
        FROM toks
    ), r AS (
        SELECT (n_tokens < {{ATTR_MIN_TOKENS}})::INT AS too_short,
               (n_tokens > {{ATTR_MAX_TOKENS}})::INT AS too_long,
               ((1000 * n_stop) // greatest(n_tokens, 1)
                < {{ATTR_MIN_STOP_PERMILLE}})::INT AS low_stopword,
               ((1000 * n_distinct) // greatest(n_tokens, 1)
                < {{ATTR_MIN_TTR_PERMILLE}})::INT AS low_ttr,
               ((100 * (n_chars - n_spaces)) // greatest(n_tokens, 1)
                > {{ATTR_MAX_MWL_CENTI}})::INT AS long_words
        FROM m
    ), rn AS (
        SELECT *, too_short + too_long + low_stopword + low_ttr
                  + long_words AS nf
        FROM r
    ), agg AS (
        SELECT count(*)::BIGINT AS n_docs,
               sum((nf > 0)::INT)::BIGINT AS n_dropped,
               {{PER_RULE_SUMS}}
        FROM rn
    )
    SELECT rule, n_docs, n_dropped, n_failed, n_exclusive,
           (1000 * n_failed) // n_docs AS fail_permille,
           (1000 * n_exclusive) // greatest(n_dropped, 1)
               AS rescue_permille
    FROM (
        {{PER_RULE_ROWS}}
    )
"""

_ATTR_RULES = ("too_short", "too_long", "low_stopword", "low_ttr",
               "long_words")
_Q108_SQL = _Q108_SQL.format(
    STOPWORDS_SQL=STOPWORDS_SQL,
    ATTR_MIN_TOKENS=ATTR_MIN_TOKENS, ATTR_MAX_TOKENS=ATTR_MAX_TOKENS,
    ATTR_MIN_STOP_PERMILLE=ATTR_MIN_STOP_PERMILLE,
    ATTR_MIN_TTR_PERMILLE=ATTR_MIN_TTR_PERMILLE,
    ATTR_MAX_MWL_CENTI=ATTR_MAX_MWL_CENTI,
    PER_RULE_SUMS=",\n               ".join(
        f"sum({r})::BIGINT AS f_{r}, "
        f"sum((({r} = 1) AND (nf = 1))::INT)::BIGINT AS x_{r}"
        for r in _ATTR_RULES),
    PER_RULE_ROWS="\n        UNION ALL\n        ".join(
        f"SELECT '{r}' AS rule, n_docs, n_dropped, f_{r} AS n_failed, "
        f"x_{r} AS n_exclusive FROM agg"
        for r in _ATTR_RULES),
)

_Q110_SQL = f"""
    WITH keyed AS (
        SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{SHUFFLE_SALT}'),
                               1, 12))::BIGINT AS shuffle_key
        FROM documents
    )
    SELECT doc_id, shuffle_key,
           row_number() OVER (ORDER BY shuffle_key, doc_id)
               AS shuffle_pos
    FROM keyed
"""

_Q111_SQL = f"""
    WITH agg AS (
        SELECT count(*)::BIGINT AS n_rows,
               {",".join(
                   f"sum((({c}) IS NULL)::INT)::BIGINT AS n_{c},"
                   f" count(DISTINCT {c})::BIGINT AS d_{c},"
                   f" min({c})::VARCHAR AS lo_{c},"
                   f" max({c})::VARCHAR AS hi_{c}"
                   for c in PROFILE_COLS)}
        FROM documents
    )
    SELECT col_name AS "column", n_rows, n_null, n_distinct,
           min_str, max_str
    FROM (
        {" UNION ALL ".join(
            f"SELECT '{c}' AS col_name, n_rows, n_{c} AS n_null, "
            f"d_{c} AS n_distinct, lo_{c} AS min_str, hi_{c} AS max_str "
            f"FROM agg" for c in PROFILE_COLS)}
    )
"""

ORACLES: dict[str, str] = {
    "q108_rule_attribution": _Q108_SQL,
    "q111_corpus_profile": _Q111_SQL,
    "q112_k_anonymity": _Q112_SQL,
    "q110_corpus_shuffle": _Q110_SQL,
    "q104_pii_pseudonymize": _PSEUDO_SQL,
    "q67_luhn_cc_scrub": _LUHN_CC_SQL,
    "q68_repetition_stats": _REPETITION_SQL,
    # the oracle for the SALTED join is the PLAIN join — identical
    # results is the entire point of the operator
    "q71_salted_join": """
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(l.l_quantity AS BIGINT) AS qty,
               o.o_custkey, o.o_orderstatus
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "q74_feature_hash_embed": """
        WITH t AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                          x -> x <> '')) AS tok
            FROM documents
        ), b AS (
            SELECT doc_id,
                   ('0x' || substr(md5(tok), 1, 12))::BIGINT % 16 AS bk
            FROM t
        ), agg AS (
            SELECT doc_id, """ + ", ".join(
        f"CAST(sum(CASE WHEN bk = {i} THEN 1 ELSE 0 END) AS BIGINT) AS d{i}"
        for i in range(16)) + """
            FROM b GROUP BY doc_id
        )
        SELECT d.doc_id, """ + ", ".join(
        f"coalesce(a.d{i}, 0) AS d{i}" for i in range(16)) + """
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "q75_dsir_resample": """
        WITH t AS (
            SELECT doc_id, source,
                   unnest(list_filter(string_split(lower(text), ' '),
                          x -> x <> '')) AS tok
            FROM documents
        ), bt AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5(tok), 1, 12))::BIGINT % 32 AS b
            FROM t
        ), pdb AS (
            SELECT doc_id, source, b, CAST(count(*) AS BIGINT) AS c
            FROM bt GROUP BY doc_id, source, b
        ), raw AS (
            SELECT b, CAST(sum(c) AS BIGINT) AS c_r FROM pdb GROUP BY b
        ), tgt AS (
            SELECT b, CAST(sum(c) AS BIGINT) AS c_t FROM pdb
            WHERE source = 'src0' GROUP BY b
        ), tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS n_r,
                   CAST(sum(CASE WHEN source = 'src0' THEN c ELSE 0 END)
                        AS BIGINT) AS n_t
            FROM pdb
        ), wts AS (
            SELECT raw.b,
                   CAST((1000 * (coalesce(tgt.c_t, 0) + 1) * (tot.n_r + 32))
                        // ((raw.c_r + 1) * (tot.n_t + 32)) AS BIGINT)
                       AS w_milli
            FROM raw LEFT JOIN tgt USING (b), tot
        ), sc AS (
            SELECT doc_id,
                   CAST(sum(c * w_milli) AS BIGINT) AS score_milli,
                   CAST(sum(c) AS BIGINT) AS n_toks
            FROM pdb JOIN wts USING (b) GROUP BY doc_id
        ), rk AS (
            SELECT doc_id, score_milli, n_toks,
                   CAST(score_milli // n_toks AS BIGINT) AS score_per_tok,
                   row_number() OVER (
                       ORDER BY score_milli // n_toks DESC, doc_id) AS rank
            FROM sc
        ), nd AS (SELECT count(*) AS n FROM documents)
        SELECT doc_id, score_milli, n_toks, score_per_tok,
               CAST(rank AS INTEGER) AS rank,
               rank <= (n + 4) // 5 AS kept
        FROM rk, nd
    """,
    "q76_bm25_topk": """
        WITH t AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                          x -> x <> '')) AS tok
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
            FROM t GROUP BY doc_id
        ), qt AS (
            SELECT doc_id, tok FROM t
            WHERE tok IN ('spark', 'join', 'stream')
        ), tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
            FROM qt GROUP BY doc_id, tok
        ), dfr AS (
            SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM qt GROUP BY tok
        ), g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS sum_dl
            FROM dl
        ), s AS (
            SELECT tf.doc_id, dl.dl, tf.tf,
                   (1000 * (2 * g.n_docs - 2 * dfr.df + 1))
                       // (2 * dfr.df + 1) AS idf_milli,
                   (dl.dl * 1000000)
                       // ((g.sum_dl * 1000) // g.n_docs) AS r_milli
            FROM tf JOIN dl USING (doc_id) JOIN dfr USING (tok), g
        ), s2 AS (
            SELECT doc_id, dl,
                   CAST(idf_milli * ((tf * 2200 * 1000)
                        // (tf * 1000 + (6 * (250 + (3 * r_milli) // 4))
                            // 5)) AS BIGINT) AS contrib
            FROM s
        )
        SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score,
               CAST(max(dl) AS BIGINT) AS dl,
               CAST(count(*) AS BIGINT) AS n_terms
        FROM s2 GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT 10
    """,
    "q77_langid_train": """
        WITH d AS (SELECT lang, lower(text) AS t FROM documents),
        tri AS (
            SELECT lang, substr(t, CAST(i AS INTEGER), 3) AS tri
            FROM d, unnest(range(1, greatest(length(t) - 2, 0) + 1))
                     AS u(i)
        ), cb AS (
            SELECT lang, tri, CAST(count(*) AS BIGINT) AS c
            FROM tri GROUP BY lang, tri
        ), v AS (SELECT count(DISTINCT tri) AS v FROM tri),
        cl AS (
            SELECT lang, CAST(sum(c) AS BIGINT) AS c_lang
            FROM cb GROUP BY lang
        ), rk AS (
            SELECT cb.lang, cb.tri, cb.c, cl.c_lang,
                   CAST(((cb.c + 1) * 1000) // (cl.c_lang + v.v)
                        AS BIGINT) AS p_milli,
                   row_number() OVER (PARTITION BY cb.lang
                                      ORDER BY cb.c DESC, cb.tri) AS rank
            FROM cb JOIN cl USING (lang), v
        )
        SELECT lang, tri, c, c_lang, p_milli,
               CAST(rank AS INTEGER) AS rank
        FROM rk WHERE rank <= 5
    """,
    "q73_ngram_lm_train": """
        WITH toksrc AS (
            SELECT list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents
        ), big AS (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM toksrc, unnest(CASE WHEN len(toks) >= 2
                                     THEN range(1, len(toks))
                                     ELSE [] END) AS u(i)
        ), cb AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
            FROM big GROUP BY w1, w2
        ), ctx AS (
            SELECT w1, CAST(sum(c_pair) AS BIGINT) AS c_ctx
            FROM cb GROUP BY w1
        ), vocab AS (
            SELECT count(DISTINCT tok) AS v FROM (
                SELECT unnest(toks) AS tok FROM toksrc)
        ), ranked AS (
            SELECT cb.w1, cb.w2, cb.c_pair, ctx.c_ctx,
                   CAST((cb.c_pair + 1) * 1000 // (ctx.c_ctx + vocab.v)
                        AS BIGINT) AS p_milli,
                   row_number() OVER (PARTITION BY cb.w1
                                      ORDER BY cb.c_pair DESC, cb.w2)
                       AS rank
            FROM cb JOIN ctx USING (w1), vocab
        )
        SELECT w1, w2, c_pair, c_ctx, p_milli, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """,
    "q82_temperature_mixture": """
        WITH per_src AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_source
            FROM documents GROUP BY source
        ), w AS (
            SELECT source, n_source,
                   CAST(floor(sqrt(CAST(n_source AS DOUBLE)) * 1000)
                        AS BIGINT) AS w_milli
            FROM per_src
        ), tot AS (
            SELECT CAST(sum(w_milli) AS BIGINT) AS w_sum,
                   CAST(sum(n_source) AS BIGINT) AS n_total FROM w
        ), f AS (
            SELECT w.source, w.n_source, w.w_milli,
                   CAST(least(1000000,
                              ((tot.n_total // 2) * w.w_milli * 1000000)
                              // (tot.w_sum * w.n_source))
                        AS BIGINT) AS f_micro
            FROM w, tot
        )
        SELECT d.doc_id, d.source, f.n_source, f.w_milli, f.f_micro,
               (('0x' || substr(md5(d.doc_id || ':temp-mix'), 1, 8))::BIGINT
                % 1000000 < f.f_micro) AS keep
        FROM documents d JOIN f USING (source)
    """,
    "q80_daily_activity": """
        WITH od AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS o_cnt
            FROM orders GROUP BY 1
        ), sd AS (
            SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS s_cnt
            FROM lineitem GROUP BY 1
        )
        SELECT day,
               CAST(coalesce(o_cnt, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(s_cnt, 0) AS BIGINT) AS n_shipped,
               (o_cnt IS NOT NULL) AS had_orders,
               (s_cnt IS NOT NULL) AS had_shipments
        FROM od FULL OUTER JOIN sd USING (day)
    """,
    "q81_conversion_funnel": """
        WITH ev AS (
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM events
        ), v AS (
            SELECT user_id, min(ts_us) AS t_view_us
            FROM ev WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.ts_us) AS t_click_us
            FROM ev e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts_us > v.t_view_us
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.ts_us) AS t_purchase_us
            FROM ev e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click_us
            GROUP BY e.user_id
        ), u AS (
            SELECT DISTINCT user_id FROM ev
        )
        SELECT u.user_id,
               CAST(v.t_view_us AS BIGINT) AS t_view_us,
               CAST(c.t_click_us AS BIGINT) AS t_click_us,
               CAST(p.t_purchase_us AS BIGINT) AS t_purchase_us,
               (v.user_id IS NOT NULL) AS reached_view,
               (c.user_id IS NOT NULL) AS reached_click,
               (p.user_id IS NOT NULL) AS reached_purchase
        FROM u LEFT JOIN v USING (user_id)
               LEFT JOIN c USING (user_id)
               LEFT JOIN p USING (user_id)
    """,
    "q79_source_classifier": """
        WITH staged AS (
            SELECT doc_id, source,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents
        ), tok AS (
            SELECT doc_id, source, unnest(toks) AS tok FROM staged
        ), cnt AS (
            SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY source, tok
        ), totals AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n_src
            FROM cnt GROUP BY source
        ), vocab AS (
            SELECT count(DISTINCT tok) AS v FROM tok
        ), weights AS (
            SELECT cnt.source AS src, cnt.tok,
                   CAST((cnt.c + 1) * 1000 // (t.n_src + vocab.v)
                        AS BIGINT) AS w_milli
            FROM cnt JOIN totals t USING (source), vocab
        ), floors AS (
            SELECT source AS src,
                   CAST(1000 // (n_src + vocab.v) AS BIGINT) AS floor_milli
            FROM totals, vocab
        ), present AS (
            SELECT k.doc_id, w.src,
                   CAST(sum(w.w_milli) AS BIGINT) AS sum_present,
                   CAST(count(*) AS BIGINT) AS n_present
            FROM tok k JOIN weights w ON k.tok = w.tok
            GROUP BY k.doc_id, w.src
        ), spine AS (
            SELECT s.doc_id, s.source,
                   CAST(len(s.toks) AS BIGINT) AS n_toks,
                   f.src, f.floor_milli
            FROM staged s CROSS JOIN floors f
        ), scored AS (
            SELECT sp.doc_id, sp.source, sp.src,
                   CAST(coalesce(p.sum_present, 0)
                        + (sp.n_toks - coalesce(p.n_present, 0))
                          * sp.floor_milli AS BIGINT) AS score_milli
            FROM spine sp LEFT JOIN present p
              ON sp.doc_id = p.doc_id AND sp.src = p.src
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score_milli DESC, src)
                          AS rk
            FROM scored
        )
        SELECT doc_id, source, src AS predicted, score_milli,
               (src = source) AS correct
        FROM ranked WHERE rk = 1
    """,
    "q78_ccnet_lm_filter": """
        WITH staged AS (
            SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents
        ), big AS (
            SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
            FROM staged, unnest(CASE WHEN len(toks) >= 2
                                     THEN range(1, len(toks))
                                     ELSE [] END) AS u(i)
        ), cb AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
            FROM big GROUP BY w1, w2
        ), ctx AS (
            SELECT w1, CAST(sum(c_pair) AS BIGINT) AS c_ctx
            FROM cb GROUP BY w1
        ), vocab AS (
            SELECT count(DISTINCT tok) AS v FROM (
                SELECT unnest(toks) AS tok FROM staged)
        ), perdoc AS (
            SELECT b.doc_id,
                   CAST(sum(((ctx.c_ctx + vocab.v) * 1000)
                            // (cb.c_pair + 1)) AS BIGINT) AS cost_sum,
                   CAST(count(*) AS BIGINT) AS n_bigrams
            FROM big b JOIN cb USING (w1, w2) JOIN ctx USING (w1), vocab
            GROUP BY b.doc_id
        ), sc AS (
            SELECT s.doc_id, s.lang,
                   CAST(p.cost_sum // p.n_bigrams AS BIGINT) AS ppl_milli,
                   p.n_bigrams,
                   ntile(3) OVER (
                       PARTITION BY s.lang
                       ORDER BY p.cost_sum // p.n_bigrams, s.doc_id) AS nt
            FROM staged s JOIN perdoc p USING (doc_id)
        )
        SELECT doc_id, lang, ppl_milli, n_bigrams,
               CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               (nt = 1) AS keep
        FROM sc
        UNION ALL
        SELECT doc_id, lang, CAST(NULL AS BIGINT) AS ppl_milli,
               CAST(0 AS BIGINT) AS n_bigrams,
               'unscored' AS bucket, FALSE AS keep
        FROM staged WHERE len(toks) < 2
    """,
    "q72_tokenizer_fertility": """
        WITH per_doc AS (
            SELECT lang,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        t -> t <> '')) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(
                        text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                        AS BIGINT) AS n_bpe
            FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(n_words) AS BIGINT) AS total_words,
               CAST(sum(n_bpe) AS BIGINT) AS total_bpe,
               CAST(sum(n_bpe) * 1000 // greatest(sum(n_words), 1)
                    AS BIGINT) AS fertility_milli,
               CAST(sum(n_bytes) * 1000 // greatest(sum(n_bpe), 1)
                    AS BIGINT) AS bytes_per_token_milli
        FROM per_doc GROUP BY lang
    """,
    "q69_quality_buckets": f"""
        WITH s AS (
            SELECT doc_id, lang,
                   CAST(coalesce(len(list_filter(
                        string_split(lower(text), ' '),
                        t -> t <> '' AND t IN ({STOPWORDS_SQL}))), 0)
                        AS BIGINT) AS n_stop,
                   CAST(greatest(len(list_filter(
                        string_split(lower(text), ' '), t -> t <> '')), 1)
                        AS BIGINT) AS n_toks
            FROM documents
        )
        SELECT doc_id, lang,
               CAST((n_stop * 1000000) // n_toks AS BIGINT) AS stop_score,
               CASE ntile(3) OVER (
                        PARTITION BY lang
                        ORDER BY (n_stop * 1000000) // n_toks DESC, doc_id)
                    WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM s
    """,
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               -- outer CAST: DuckDB sums of integers are HUGEINT, which
               -- duckdb-python hands to pandas as float64 — the driver's
               -- exact value-hash then sees 5.0 vs Spark's 5
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS sum_base_price,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                        AS BIGINT)) / 1e6 AS sum_disc_price,
               round(sum(CAST(l_quantity AS BIGINT)) / count(*), 4) AS avg_qty,
               round(sum(CAST(round(l_discount * 100) AS BIGINT))
                     / (100.0 * count(*)), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_revenue_filter": """
        SELECT sum(CAST(round(l_extendedprice * l_discount * 1000000)
                        AS BIGINT)) / 1e6 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q03_revenue_by_nation": """
        SELECT r_name AS region_name, n_name AS nation_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                        AS BIGINT)) / 1e6 AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
        GROUP BY r_name, n_name
    """,
    "q04_top_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
        FROM orders
        ORDER BY total_price DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q05_window_rank": """
        SELECT o_custkey, o_orderkey, total_price, rk FROM (
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders
        ) WHERE rk <= 3
    """,
    "q06_customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "q07_parts_in_use": """
        SELECT p_brand, count(*) AS n_parts,
               round(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                     / (100.0 * count(*)), 4) AS avg_price
        FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        GROUP BY p_brand
    """,
    "q08_union_distinct": """
        SELECT DISTINCT c_custkey FROM (
            SELECT c_custkey FROM customer WHERE c_acctbal < 0
            UNION ALL
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    "q09_top_tokens": """
        SELECT token, count(*) AS cnt FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ) WHERE token <> ''
        GROUP BY token
        ORDER BY cnt DESC, token ASC
        LIMIT 20
    """,
    "q10_events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "q11_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(max(session_seq) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM sessions GROUP BY user_id
    """,
    "q64_session_range_join": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), seqs AS (
            SELECT user_id, ts, event_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        ), bounds AS (
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
            FROM seqs GROUP BY user_id, session_seq
        )
        SELECT e.event_id, e.user_id, b.session_seq, b.start_us
        FROM events e JOIN bounds b
          ON e.user_id = b.user_id
         AND epoch_us(e.ts) BETWEEN b.start_us AND b.end_us
    """,
    "q12_json_extract": """
        SELECT event_type,
               round(avg(k), 4) AS avg_k,
               CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events)
        GROUP BY event_type
    """,
    "q13_token_stats": """
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
               length(text) AS n_chars_actual,
               round(length(text) * 1.0 /
                     greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1),
                     4) AS chars_per_token
        FROM documents
    """,
    "q14_doc_quality": """
        WITH base AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                   length(text) - length(replace(text, ' ', '')) AS n_spaces
            FROM documents
        )
        SELECT doc_id,
               n_tokens < 10 AS too_short,
               n_chars > 5000 AS too_long,
               (n_digits * 1.0 / greatest(n_chars, 1)) > 0.3 AS digit_heavy,
               ((n_chars - n_spaces) * 1.0 / greatest(n_tokens, 1) < 2.0
                OR (n_chars - n_spaces) * 1.0 / greatest(n_tokens, 1) > 12.0)
                 AS bad_word_len,
               NOT (n_tokens < 10 OR n_chars > 5000
                    OR (n_digits * 1.0 / greatest(n_chars, 1)) > 0.3
                    OR ((n_chars - n_spaces) * 1.0 / greatest(n_tokens, 1) < 2.0
                        OR (n_chars - n_spaces) * 1.0 / greatest(n_tokens, 1) > 12.0))
                 AS keep
        FROM base
    """,
    "q15_lang_guess": f"""
        WITH base AS (
            SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
            FROM documents
        )
        SELECT doc_id, lang,
               round(len(list_filter(toks,
                         t -> t IN ({STOPWORDS_SQL})))
                     * 1.0 / greatest(len(toks), 1), 4) AS stopword_frac,
               (len(list_filter(toks,
                    t -> t IN ({STOPWORDS_SQL})))
                * 1.0 / greatest(len(toks), 1)) >= 0.05 AS guess_en,
               lang = 'en' AS is_en
        FROM base
    """,
    "q16_fingerprint": """
        SELECT doc_id, md5(replace(lower(text), ' ', '')) AS fp
        FROM documents
    """,
    "q54_source_filter": f"""
        WITH per_doc AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        t -> t <> '' AND t IN ({STOPWORDS_SQL})))
                        AS BIGINT) AS n_stop,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')) AS BIGINT) AS n_toks
            FROM documents
        ),
        src AS (
            SELECT source,
                   round(CAST(sum(n_stop) AS BIGINT) * 1.0
                         / greatest(CAST(sum(n_toks) AS BIGINT), 1), 6)
                       AS src_density
            FROM per_doc GROUP BY source
        )
        SELECT d.doc_id, d.source, s.src_density,
               s.src_density >= {SRC_DENSITY_MIN} AS src_ok
        FROM per_doc d JOIN src s USING (source)
    """,
    "q17_exact_dedup": """
        SELECT md5(text) AS h, min(doc_id) AS canonical_id,
               count(*) AS n_dups
        FROM documents
        GROUP BY md5(text)
    """,
    "q58_quality_signals": """
        WITH tok AS (
            SELECT doc_id, unnest(list_filter(
                string_split(lower(text), ' '), t -> t <> '')) AS tok
            FROM documents
        ),
        cnt AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY doc_id, tok
        ),
        agg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_toks,
                   CAST(count(*) AS BIGINT) AS n_unique,
                   CAST(max(c) AS BIGINT) AS top_c,
                   CAST(sum(c * c) AS BIGINT) AS sum_c2,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax
            FROM cnt GROUP BY doc_id
        )
        SELECT doc_id, n_toks, n_unique,
               round(n_unique * 1.0 / n_toks, 6) AS frac_unique,
               round(top_c * 1.0 / n_toks, 6) AS top_frac,
               CAST(1000000 - (sum_c2 * 1000000) // (n_toks * n_toks)
                    AS BIGINT) AS simpson_e6,
               n_hapax
        FROM agg
    """,
    "q62_inverted_index": """
        WITH tok AS (
            SELECT doc_id, unnest(list_filter(
                string_split(lower(text), ' '), t -> t <> '')) AS tok
            FROM documents
        ),
        dp AS (SELECT DISTINCT doc_id, tok FROM tok),
        cf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf
               FROM tok GROUP BY tok),
        post AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS df,
                   md5(array_to_string(list(doc_id ORDER BY doc_id), ','))
                       AS postings_fp
            FROM dp GROUP BY tok
        )
        SELECT post.tok, df, cf, postings_fp FROM post JOIN cf USING (tok)
    """,
    "q59_stratified_split": f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS BIGINT) AS sample_rank,
                   CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                       AS n_stratum
            FROM documents
        )
        SELECT doc_id, lang, sample_rank, n_stratum,
               sample_rank <= (n_stratum + {STRAT_DENOM - 1}) // {STRAT_DENOM}
                   AS in_sample
        FROM ranked
    """,
    "q60_bigram_pmi": f"""
        WITH base AS (
            SELECT list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents
        ),
        big AS (
            SELECT unnest(list_transform(
                range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bg
            FROM base
        ),
        uni AS (SELECT unnest(toks) AS tok FROM base),
        c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
               FROM uni GROUP BY tok),
        cb AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_ab
               FROM big GROUP BY bg HAVING count(*) >= {PMI_MIN_COUNT}),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM c1),
        totb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM big)
        SELECT bg, c_ab, a.c AS c_a, b.c AS c_b,
               CAST((c_ab * nu * nu * 1000) // (nb * a.c * b.c) AS BIGINT)
                   AS pmi_ratio_x1000
        FROM cb
        JOIN c1 a ON a.tok = string_split(cb.bg, ' ')[1]
        JOIN c1 b ON b.tok = string_split(cb.bg, ' ')[2]
        CROSS JOIN tot CROSS JOIN totb
        ORDER BY pmi_ratio_x1000 DESC, bg
        LIMIT {PMI_TOP_K}
    """,
    "q33_conditional_agg": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
               round(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                                   AS BIGINT) ELSE 0 END)
                     / greatest(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                                         AS BIGINT)), 1), 6) AS high_rev_share
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
    """,
    "q34_tfidf_top_terms": """
        WITH tokens AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM tokens WHERE term <> '' GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS score
            FROM tf JOIN df USING (term), n
        )
        SELECT doc_id, term, score, rk FROM (
            SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term ASC) AS rk
            FROM scored
        ) WHERE rk <= 3
    """,
    "q35_percentiles": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS med_qty,
               quantile_cont(l_quantity, 0.9) AS p90_qty,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q36_grouped_demean": """
        SELECT event_id, event_type,
               round((micros - avg(micros) OVER (PARTITION BY event_type))
                     / 1e6, 6) AS demeaned
        FROM (SELECT event_id, event_type,
                     round(value * 1e6) AS micros
              FROM events)
    """,
    "q25_order_history_fp": """
        SELECT o_custkey,
               md5(string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderdate, o_orderkey))
                   AS history_fp,
               length(string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderdate, o_orderkey))
                   AS history_len
        FROM orders
        GROUP BY o_custkey
    """,
    "q28_asof_join": """
        WITH purchases AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   max_by(value, event_id) AS click_value
            FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
        )
        SELECT p.event_id, p.user_id, round(c.click_value, 6) AS click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
    "q29_conv_structure": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ),
        turns AS (
            SELECT 'doc-' || lpad(doc_id::VARCHAR, 10, '0') AS conv_id,
                   CAST(i - 1 AS INTEGER) AS turn_idx,
                   CASE WHEN (i - 1) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
                   len(list_filter(toks[(i-1)*12+1 : i*12],
                                   t -> t <> '')) AS n_toks
            FROM toks,
                 unnest(range(1, greatest(CAST(ceil(len(toks) * 1.0 / 12) AS INT), 1) + 1)) AS u(i)
        )
        SELECT conv_id, count(*) AS conv_n_turns,
               round(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                     / greatest(sum(CASE WHEN role IN ('user','assistant') THEN 1 ELSE 0 END), 1),
                     6) AS role_balance,
               min_by(role, turn_idx) AS first_role,
               CAST(sum(n_toks) AS BIGINT) AS conv_tokens,
               max(turn_idx) AS last_turn_idx,
               (min_by(role, turn_idx) IN ('system','user')
                AND max(turn_idx) = count(*) - 1) AS structure_ok
        FROM turns
        GROUP BY conv_id
    """,
    "q37_structured_validate": """
        WITH corrupted AS (
            SELECT event_type,
                   CASE WHEN event_id % 11 = 0 THEN '{"k": '
                        WHEN event_id % 13 = 0 THEN '{"k": "oops"}'
                        ELSE props END AS payload
            FROM events
        ), v AS (
            -- coalesce: json_valid(NULL) is NULL; the Spark side's
            -- try_parse_json probe reports NULL input as json_ok=false
            SELECT event_type, coalesce(json_valid(payload), false) AS json_ok,
                   CASE WHEN coalesce(json_valid(payload), false)
                        THEN TRY_CAST(json_extract_string(payload, '$.k')
                                      AS INTEGER) END AS k
            FROM corrupted
        )
        SELECT event_type, count(*) AS n_total,
               CAST(sum(CASE WHEN NOT json_ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bad_json,
               CAST(sum(CASE WHEN json_ok AND k IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mismatch,
               CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_valid,
               CAST(sum(CASE WHEN k IS NOT NULL THEN k ELSE 0 END) AS BIGINT)
                   AS sum_valid_k
        FROM v
        GROUP BY event_type
    """,
    "q38_nested_conversations": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ),
        turns AS (
            SELECT 'doc-' || lpad(doc_id::VARCHAR, 10, '0') AS conv_id,
                   CAST(i - 1 AS INTEGER) AS turn_idx,
                   CASE WHEN (i - 1) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
                   array_to_string(toks[(i-1)*12+1 : i*12], ' ') AS t
            FROM toks,
                 unnest(range(1, greatest(CAST(ceil(len(toks) * 1.0 / 12) AS INT), 1) + 1)) AS u(i)
        ),
        nxt AS (
            SELECT conv_id, turn_idx, role, t,
                   lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS next_role
            FROM turns
        )
        SELECT conv_id, count(*) AS n_turns,
               min_by(role, turn_idx) AS first_role,
               max_by(role, turn_idx) AS last_role,
               coalesce(bool_and(role <> next_role), TRUE) AS alternates,
               md5(string_agg(role || ':' || t, chr(31) ORDER BY turn_idx))
                   AS msg_fp
        FROM nxt
        GROUP BY conv_id
    """,
    "q45_sketch_accuracy": """
        SELECT event_type,
               count(DISTINCT user_id) AS exact_distinct_users,
               TRUE AS hll_within_5pct,
               round(quantile_cont(value, 0.5), 6) AS med_value,
               TRUE AS approx_med_in_rank_window
        FROM events
        GROUP BY event_type
    """,
    "q44_bpe_tokens": """
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                   AS n_bpe_tokens,
               md5(array_to_string(
                   regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
                   chr(31))) AS tok_fp
        FROM documents
    """,
    "q87_remove_repeated_windows": """
        WITH toks AS (
            SELECT doc_id, unnest(l) AS tok,
                   generate_subscripts(l, 1) - 1 AS pos
            FROM (SELECT doc_id, string_split(text, ' ') AS l
                  FROM documents)
        ),
        wins AS (
            SELECT doc_id, CAST(pos // 2 AS INT) AS win,
                   string_agg(tok, ' ' ORDER BY pos) AS chunk
            FROM toks WHERE tok <> ''
            GROUP BY doc_id, CAST(pos // 2 AS INT)
        ),
        marked AS (
            SELECT doc_id, win, chunk,
                   row_number() OVER (PARTITION BY doc_id, chunk
                                      ORDER BY win) AS rn
            FROM wins
        )
        SELECT doc_id,
               count(*) AS n_windows,
               CAST(coalesce(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_dup_windows,
               md5(string_agg(chunk, ' ' ORDER BY win)
                   FILTER (WHERE rn = 1)) AS cleaned_fp
        FROM marked GROUP BY doc_id
    """,
    "q84_global_rank": """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                       DESC, o_orderkey) AS BIGINT) AS price_rank
        FROM orders
    """,
    "q83_merge_upsert": """
        WITH base AS (
            SELECT c_custkey, c_name, c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer),
        upd AS (
            SELECT c_custkey, c_name, 'MERGED' AS c_mktsegment,
                   -bal_cents AS bal_cents
            FROM base WHERE c_custkey % 7 = 0),
        ins AS (
            SELECT c_custkey + 1000000 AS c_custkey,
                   'NEW-' || c_name AS c_name,
                   'NEWSEG' AS c_mktsegment,
                   CAST(0 AS BIGINT) AS bal_cents
            FROM base WHERE c_custkey % 97 = 0),
        src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        SELECT t.c_custkey,
               CASE WHEN s.c_custkey IS NOT NULL
                         AND s.bal_cents > t.bal_cents
                    THEN s.c_name ELSE t.c_name END AS c_name,
               CASE WHEN s.c_custkey IS NOT NULL
                         AND s.bal_cents > t.bal_cents
                    THEN s.c_mktsegment ELSE t.c_mktsegment
                    END AS c_mktsegment,
               CASE WHEN s.c_custkey IS NOT NULL
                         AND s.bal_cents > t.bal_cents
                    THEN s.bal_cents ELSE t.bal_cents END AS bal_cents
        FROM base t LEFT JOIN src s ON t.c_custkey = s.c_custkey
        UNION ALL
        SELECT s.* FROM src s
        WHERE NOT EXISTS
            (SELECT 1 FROM base t WHERE t.c_custkey = s.c_custkey)
    """,
    "q43_window_breadth": """
        SELECT c_custkey, c_mktsegment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
               ntile(4) OVER (PARTITION BY c_mktsegment
                              ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                                       c_custkey ASC) AS quartile,
               dense_rank() OVER (PARTITION BY c_mktsegment
                                  ORDER BY CAST(round(c_acctbal * 100) AS BIGINT)
                                      DESC) AS bal_rank,
               lead(CAST(round(c_acctbal * 100) AS BIGINT))
                   OVER (PARTITION BY c_mktsegment
                         ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
                                  c_custkey ASC) AS next_lower_bal
        FROM customer
    """,
    "q42_set_ops": """
        SELECT DISTINCT o_custkey AS c_custkey
        FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal < 0
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "q41_small_quantity_revenue": """
        SELECT p_brand,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                   AS revenue,
               count(*) AS n_small
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_quantity < 0.2 * (
            SELECT sum(CAST(l_quantity AS BIGINT)) / count(*)
            FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
        GROUP BY p_brand
    """,
    "q40_hash_split": """
        SELECT doc_id, bucket,
               CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5(doc_id::VARCHAR || ':v1'), 1, 8))::BIGINT
                         % 10000 AS bucket
              FROM documents)
    """,
    "q26_running_total": """
        SELECT o_custkey, o_orderkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total
        FROM orders
    """,
    "q27_rollup_revenue": """
        SELECT r_name AS region_name, n_name AS nation_name,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                        AS BIGINT)) / 1e6 AS revenue,
               count(*) AS n_rows
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_revenue_filter": q02_revenue_filter,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_top_orders": q04_top_orders,
    "q05_window_rank": q05_window_rank,
    "q06_customers_without_orders": q06_customers_without_orders,
    "q07_parts_in_use": q07_parts_in_use,
    "q08_union_distinct": q08_union_distinct,
    "q09_top_tokens": q09_top_tokens,
    "q10_events_hourly": q10_events_hourly,
    "q11_sessionize": q11_sessionize,
    "q12_json_extract": q12_json_extract,
    "q13_token_stats": q13_token_stats,
    "q14_doc_quality": q14_doc_quality,
    "q108_rule_attribution": q108_rule_attribution,
    "q110_corpus_shuffle": q110_corpus_shuffle,
    "q111_corpus_profile": q111_corpus_profile,
    "q112_k_anonymity": q112_k_anonymity,
    "q15_lang_guess": q15_lang_guess,
    "q16_fingerprint": q16_fingerprint,
    "q54_source_filter": q54_source_filter,
    "q58_quality_signals": q58_quality_signals,
    "q59_stratified_split": q59_stratified_split,
    "q60_bigram_pmi": q60_bigram_pmi,
    "q62_inverted_index": q62_inverted_index,
    "q64_session_range_join": q64_session_range_join,
    "q17_exact_dedup": q17_exact_dedup,
    "q25_order_history_fp": q25_order_history_fp,
    "q28_asof_join": q28_asof_join,
    "q29_conv_structure": q29_conv_structure,
    "q26_running_total": q26_running_total,
    "q33_conditional_agg": q33_conditional_agg,
    "q34_tfidf_top_terms": q34_tfidf_top_terms,
    "q35_percentiles": q35_percentiles,
    "q36_grouped_demean": q36_grouped_demean,
    "q27_rollup_revenue": q27_rollup_revenue,
    "q37_structured_validate": q37_structured_validate,
    "q38_nested_conversations": q38_nested_conversations,
    "q40_hash_split": q40_hash_split,
    "q41_small_quantity_revenue": q41_small_quantity_revenue,
    "q42_set_ops": q42_set_ops,
    "q43_window_breadth": q43_window_breadth,
    "q44_bpe_tokens": q44_bpe_tokens,
    "q67_luhn_cc_scrub": q67_luhn_cc_scrub,
    "q104_pii_pseudonymize": q104_pii_pseudonymize,
    "q68_repetition_stats": q68_repetition_stats,
    "q71_salted_join": q71_salted_join,
    "q72_tokenizer_fertility": q72_tokenizer_fertility,
    "q73_ngram_lm_train": q73_ngram_lm_train,
    "q78_ccnet_lm_filter": q78_ccnet_lm_filter,
    "q79_source_classifier": q79_source_classifier,
    "q80_daily_activity": q80_daily_activity,
    "q82_temperature_mixture": q82_temperature_mixture,
    "q81_conversion_funnel": q81_conversion_funnel,
    "q74_feature_hash_embed": q74_feature_hash_embed,
    "q75_dsir_resample": q75_dsir_resample,
    "q76_bm25_topk": q76_bm25_topk,
    "q77_langid_train": q77_langid_train,
    "q69_quality_buckets": q69_quality_buckets,
    "q45_sketch_accuracy": q45_sketch_accuracy,
    "q83_merge_upsert": q83_merge_upsert,
    "q84_global_rank": q84_global_rank,
    "q85_bpe_train": q85_bpe_train,
    "q86_bpe_encode": q86_bpe_encode,
    "q95_unigram_train": q95_unigram_train,
    "q87_remove_repeated_windows": q87_remove_repeated_windows,
}


CURRICULUM_RARE_DF = 2        # a word in <= this many docs is "rare"
CURRICULUM_STAGES = 4


def q114_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training-data scheduling: score every
    document's difficulty (length + rare-vocabulary ratio — rare =
    corpus document-frequency <= CURRICULUM_RARE_DF), then assign an
    EXACT global curriculum rank and a stage bucket, easy-to-hard.

    Scale shape: doc-frequency is one map-side-combined groupBy on
    words; the rare-word count is an equi-join back on the word key
    (high cardinality, no broadcast needed); the total order reuses
    operators/ranking.global_rank — literal range boundaries + k
    parallel per-bucket windows, never an empty-PARTITION-BY window.
    The stage cut uses one driver-scalar count (a single long).
    Oracle = naive global ROW_NUMBER over the same integer difficulty."""
    from .operators.ranking import global_rank

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    per_doc = docs.select(
        "doc_id", F.size(toks).alias("n_tokens"),
        F.array_distinct(toks).alias("words"))
    words = per_doc.select("doc_id", F.explode("words").alias("word"))
    dfreq = words.groupBy("word").agg(F.count(F.lit(1)).alias("dfc"))
    rarec = (words.join(dfreq.filter(F.col("dfc") <= CURRICULUM_RARE_DF),
                        "word")
             .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_rare")))
    stats = (per_doc.select("doc_id", "n_tokens",
                            F.size("words").alias("n_distinct"))
             .join(rarec, "doc_id", "left")
             .withColumn("n_rare", F.coalesce("n_rare", F.lit(0)))
             .withColumn("rare_pm", F.floor(
                 (F.lit(1000) * F.col("n_rare"))
                 / F.greatest(F.col("n_distinct"), F.lit(1))))
             .withColumn("difficulty",
                         (F.col("n_tokens").cast("long") * 1000
                          + F.col("rare_pm")).cast("long")))
    ranked = global_rank(
        stats, "difficulty",
        order_by=[F.col("difficulty"), F.col("doc_id")],
        rank_col="curriculum_rank")
    total = stats.count()  # ONE driver long — the documented scalar
    return (ranked
            .withColumn("stage", F.floor(
                (F.col("curriculum_rank") - 1) * CURRICULUM_STAGES
                / F.lit(total)).cast("integer"))
            .select("doc_id", "n_tokens", "rare_pm", "difficulty",
                    "curriculum_rank", "stage"))


_CURRICULUM_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, len(toks) AS n_tokens,
               list_distinct(toks) AS words
        FROM toks
    ),
    words AS (SELECT doc_id, unnest(words) AS word FROM per_doc),
    dfreq AS (SELECT word, count(*) AS dfc FROM words GROUP BY word),
    rarec AS (
        SELECT doc_id, count(*) AS n_rare
        FROM words JOIN dfreq USING (word)
        WHERE dfc <= {CURRICULUM_RARE_DF}
        GROUP BY doc_id
    ),
    stats AS (
        SELECT p.doc_id, p.n_tokens, len(p.words) AS n_distinct,
               coalesce(r.n_rare, 0) AS n_rare
        FROM per_doc p LEFT JOIN rarec r ON p.doc_id = r.doc_id
    ),
    scored AS (
        SELECT doc_id, n_tokens,
               (1000 * n_rare) // greatest(n_distinct, 1) AS rare_pm,
               CAST(n_tokens AS BIGINT) * 1000
                   + (1000 * n_rare) // greatest(n_distinct, 1) AS difficulty
        FROM stats
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY difficulty, doc_id)
                      AS curriculum_rank
        FROM scored
    )
    SELECT doc_id, n_tokens, rare_pm, difficulty, curriculum_rank,
           CAST(((curriculum_rank - 1) * {CURRICULUM_STAGES})
                // (SELECT count(*) FROM ranked) AS INTEGER) AS stage
    FROM ranked
    ORDER BY curriculum_rank
"""

QUERIES["q114_curriculum_order"] = q114_curriculum_order
ORACLES["q114_curriculum_order"] = _CURRICULUM_SQL


BUDGET_FRAC = 0.5


def q116_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token-budget corpus assembly (operators/
    sampling.token_budget_sample): keep each source's salted-hash-order
    prefix whose inclusive token cumsum fits 50% of the source's
    tokens. The grouped cumsum runs bucket-decomposed — per-(source,
    hash-bucket) sums collect as k·16 driver longs, broadcast back as
    literal offsets, window bounded by the bucket slice — never a
    whole-source single-task window. Oracle = the naive per-source
    cumsum over the same (bucket, hash, id) total order."""
    from .operators.sampling import token_budget_sample
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    base = docs.select("doc_id", "source", F.size(toks).alias("n_tokens"))
    out = token_budget_sample(base, "source", "n_tokens", "doc_id",
                              budget_frac=BUDGET_FRAC)
    return out.select("doc_id", "source", "n_tokens", "cum_tokens",
                      "budget", "keep_budget")


_TOKEN_BUDGET_SQL = f"""
    WITH base AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS n_tokens,
               md5(doc_id::VARCHAR || ':budget-v1') AS h
        FROM documents
    ),
    hb AS (
        SELECT *, (('0x' || substr(h, 1, 2))::INTEGER % 16) AS hbkt
        FROM base
    ),
    tot AS (SELECT source, sum(n_tokens) AS total FROM hb GROUP BY source),
    cum AS (
        SELECT b.doc_id, b.source, b.n_tokens,
               CAST(sum(b.n_tokens) OVER (PARTITION BY b.source
                                          ORDER BY b.hbkt, b.h, b.doc_id
                                          ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_tokens,
               CAST(floor({BUDGET_FRAC} * t.total) AS BIGINT) AS budget
        FROM hb b JOIN tot t USING (source)
    )
    SELECT doc_id, source, n_tokens, cum_tokens, budget,
           cum_tokens <= budget AS keep_budget
    FROM cum
    ORDER BY source, cum_tokens
"""

QUERIES["q116_token_budget"] = q116_token_budget
ORACLES["q116_token_budget"] = _TOKEN_BUDGET_SQL


def q119_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus drift: KL(P_source || P_corpus) over word
    unigrams with add-one smoothing across the shared vocabulary — the
    information-theoretic "how unlike the rest of the corpus is this
    source" diagnostic behind mixture rebalancing and contamination
    triage (cf. CCNet's LM-based domain distance; DSIR's importance
    weights are the per-document siblings of this per-source rollup).

    Scale shape: two map-side-combined groupBys (word; source×word),
    a broadcast of the k source totals over the vocabulary grid so
    every (source, word) smoothing term exists, one final
    groupBy(source) summing V terms — no products over data, vocab
    rides the shuffle key. FP note: the KL sum is rounded to 6
    decimals; term-order drift between engines is ~1e-12."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    words = (docs.select("source", F.explode(toks).alias("word")))
    c_w = words.groupBy("word").agg(F.count(F.lit(1)).alias("c_w"))
    c_sw = (words.groupBy("source", "word")
            .agg(F.count(F.lit(1)).alias("c_sw")))
    n_s = words.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    totals = c_w.agg(F.sum("c_w").alias("n_total"),
                     F.count(F.lit(1)).alias("v_size")).collect()[0]
    n_total, v = int(totals["n_total"]), int(totals["v_size"])
    grid = c_w.crossJoin(F.broadcast(n_s))
    joined = (grid.join(c_sw, ["source", "word"], "left")
              .withColumn("c_sw", F.coalesce("c_sw", F.lit(0))))
    p_s = (F.col("c_sw") + 1) / (F.col("n_s") + F.lit(v))
    q = (F.col("c_w") + 1) / F.lit(float(n_total + v))
    return (joined.withColumn("term", p_s * F.log(p_s / q))
            .groupBy("source")
            .agg(F.max("n_s").cast("long").alias("n_tokens"),
                 F.round(F.sum("term"), 6).alias("kl_to_corpus")))


_SOURCE_DIVERGENCE_SQL = """
    WITH words AS (
        SELECT source, unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS word
        FROM documents
    ),
    c_w AS (SELECT word, count(*) AS c_w FROM words GROUP BY word),
    c_sw AS (SELECT source, word, count(*) AS c_sw
             FROM words GROUP BY source, word),
    n_s AS (SELECT source, count(*) AS n_s FROM words GROUP BY source),
    tot AS (SELECT sum(c_w) AS n_total, count(*) AS v FROM c_w),
    grid AS (SELECT * FROM c_w CROSS JOIN n_s),
    joined AS (
        SELECT g.source, g.word, g.c_w, g.n_s,
               coalesce(s.c_sw, 0) AS c_sw
        FROM grid g LEFT JOIN c_sw s
          ON g.source = s.source AND g.word = s.word
    )
    SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
           round(sum(((c_sw + 1) * 1.0 / (n_s + (SELECT v FROM tot)))
                     * ln(((c_sw + 1) * 1.0 / (n_s + (SELECT v FROM tot)))
                          / ((c_w + 1) * 1.0
                             / ((SELECT n_total FROM tot)
                                + (SELECT v FROM tot))))), 6)
               AS kl_to_corpus
    FROM joined GROUP BY source ORDER BY source
"""

QUERIES["q119_source_divergence"] = q119_source_divergence
ORACLES["q119_source_divergence"] = _SOURCE_DIVERGENCE_SQL


def q120_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve per source: distinct words in
    the 1/4, 1/2, and full slices of each source's documents, slices
    defined by salted-hash space (a uniform, engine-invariant sample
    prefix — the q116 idiom). A saturating curve ⇒ templated/
    duplicated content; unbounded growth ⇒ diverse text — the corpus-
    diversity diagnostic next to q119's KL drift. ONE groupBy(source)
    with three conditional COUNT DISTINCTs (Spark plans the expand +
    partial aggregates; no window, no product)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    hb = (F.conv(F.substring(F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit(":vocab-v1"))), 1, 2),
        16, 10).cast("int") % 16)
    words = (docs.select("source", hb.alias("hb"),
                         F.explode(toks).alias("word")))
    return (words.groupBy("source").agg(
        F.countDistinct(F.when(F.col("hb") < 4, F.col("word")))
        .cast("long").alias("vocab_q1"),
        F.countDistinct(F.when(F.col("hb") < 8, F.col("word")))
        .cast("long").alias("vocab_half"),
        F.countDistinct("word").cast("long").alias("vocab_full"),
        F.count(F.lit(1)).cast("long").alias("n_tokens")))


_VOCAB_GROWTH_SQL = """
    WITH words AS (
        SELECT source,
               (('0x' || substr(md5(doc_id::VARCHAR || ':vocab-v1'),
                                1, 2))::INTEGER % 16) AS hb,
               unnest(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS word
        FROM documents
    )
    SELECT source,
           CAST(count(DISTINCT CASE WHEN hb < 4 THEN word END)
                AS BIGINT) AS vocab_q1,
           CAST(count(DISTINCT CASE WHEN hb < 8 THEN word END)
                AS BIGINT) AS vocab_half,
           CAST(count(DISTINCT word) AS BIGINT) AS vocab_full,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM words GROUP BY source ORDER BY source
"""

QUERIES["q120_vocab_growth"] = q120_vocab_growth
ORACLES["q120_vocab_growth"] = _VOCAB_GROWTH_SQL


ZIPF_TOP_K = 100


def q121_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source: the least-squares slope of
    ln(frequency) against ln(rank) over the source's top-100 words —
    natural text sits near −1; templated/generated content bends the
    curve (the statistical-law sibling of q120's Heaps curve). Both
    engines compute the fit with their built-in regr_slope, so the
    closed form is never re-implemented.

    Plan: word counts are one map-side-combined groupBy; ranking runs
    over the AGGREGATED (source, word, freq) table — orders of
    magnitude smaller than the corpus — with a per-source window that
    the rn<=100 filter caps; the fit is one tiny groupBy(source)."""
    from pyspark.sql import Window
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    freq = (docs.select("source", F.explode(toks).alias("word"))
            .groupBy("source", "word")
            .agg(F.count(F.lit(1)).alias("freq")))
    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("word").asc())
    top = (freq.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= ZIPF_TOP_K))
    return (top.groupBy("source")
            .agg(F.round(F.regr_slope(
                F.log(F.col("freq").cast("double")),
                F.log(F.col("rnk").cast("double"))), 6)
                .alias("zipf_slope"),
                F.count(F.lit(1)).cast("long").alias("n_points")))


_ZIPF_SQL = f"""
    WITH freq AS (
        SELECT source, word, count(*) AS freq FROM (
            SELECT source,
                   unnest(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS word
            FROM documents)
        GROUP BY source, word
    ),
    top AS (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY freq DESC, word) AS rnk
        FROM freq
    )
    SELECT source,
           round(regr_slope(ln(freq * 1.0), ln(rnk * 1.0)), 6)
               AS zipf_slope,
           CAST(count(*) AS BIGINT) AS n_points
    FROM top WHERE rnk <= {ZIPF_TOP_K}
    GROUP BY source ORDER BY source
"""


L_DIVERSITY_FLOOR = 2


def q122_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's (q112) stronger sibling: a
    quasi-identifier cell with k >= 5 population can STILL leak if
    every member shares the same sensitive value (here: the document's
    source, standing in for the sensitive attribute). Report each
    cell's population k and distinct-sensitive-count l; cells with
    l < 2 are homogeneous — the attribute disclosure k-anonymity
    misses. One groupBy over a bounded key, COUNT + COUNT DISTINCT."""
    docs = _t(spark, sf_dir, "documents")
    return (docs
            .select("lang", F.expr("n_chars div 500").alias("len_bucket"),
                    "source")
            .groupBy("lang", "len_bucket")
            .agg(F.count(F.lit(1)).alias("k"),
                 F.countDistinct("source").cast("long").alias("l"))
            .withColumn("homogeneous", F.col("l") < L_DIVERSITY_FLOOR))


_L_DIVERSITY_SQL = f"""
    SELECT lang, n_chars // 500 AS len_bucket,
           count(*) AS k,
           CAST(count(DISTINCT source) AS BIGINT) AS l,
           count(DISTINCT source) < {L_DIVERSITY_FLOOR} AS homogeneous
    FROM documents
    GROUP BY lang, len_bucket
    ORDER BY lang, len_bucket
"""

QUERIES["q121_zipf_slope"] = q121_zipf_slope
ORACLES["q121_zipf_slope"] = _ZIPF_SQL
QUERIES["q122_l_diversity"] = q122_l_diversity
ORACLES["q122_l_diversity"] = _L_DIVERSITY_SQL
