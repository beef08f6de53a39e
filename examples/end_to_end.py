"""Runnable end-to-end tour: documents → quality-filtered transcript
table → WAP branch with an audited publish → lineage → change feed →
verified training shards → in-place Delta-log publish read back
through the open format. Finishes in ~1 minute on local[8].

    python examples/end_to_end.py [workdir]

Every verb here is the same one a 1000-executor deployment calls —
only the SparkSession master and the data volume change (DEPLOY.md
carries the 10^12-turn arithmetic for each step).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from curator_spark import fixtures  # noqa: E402
from curator_spark.checkpoint import (  # noqa: E402
    delete_rows_dv, make_ledger, read_committed, read_with_lineage,
    run_checkpointed, table_row_count)
from curator_spark.export import export_jsonl_shards, \
    verify_export  # noqa: E402
from curator_spark.feed import consume_changes  # noqa: E402
from curator_spark.incremental import \
    append_new_conversations  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402
from curator_spark.wap import create_branch, drop_branch, \
    publish_branch  # noqa: E402


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curator_e2e"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("e2e", parallelism=8)
    summary: dict = {}

    # 1. curate a first batch into a committed table (checkpointed:
    #    kill it halfway and a re-run resumes, not restarts)
    b1 = f"{work}/batch1.parquet"
    fixtures.write_transcripts_parquet(b1, 2000, seed=11, n_parts=4)
    s = run_checkpointed(spark, b1, f"{work}/table",
                         ledger_backend="commitlog")
    summary["initial_run"] = {k: s[k] for k in
                              ("parts_committed", "memoized")}

    # 2. risky follow-up work happens on a BRANCH, never on the table
    #    consumers read
    br = f"{work}/branch"
    create_branch(f"{work}/table", br)
    b2 = f"{work}/batch2.parquet"
    fixtures.write_transcripts_parquet(b2, 800, seed=12, n_parts=4)
    append_new_conversations(spark, b2, br)
    victim = read_committed(spark, br).select("conv_id").first()[0]
    delete_rows_dv(spark, br, [victim])  # right-to-be-forgotten, no rewrite

    # 3. audit gate, then ONE atomic fast-forward publish
    def audit(df):
        assert df.filter(~F.col("keep")).count() < df.count()
        assert df.filter(F.col("conv_id") == victim).count() == 0

    pub = publish_branch(f"{work}/table", br, audit=audit, spark=spark)
    drop_branch(br)
    summary["publish"] = pub

    # 4. row-level lineage: which run wrote each surviving row?
    lin = (read_with_lineage(spark, f"{work}/table")
           .groupBy("_lineage_run_id").count().collect())
    summary["rows_by_run"] = {r[0]: r[1] for r in lin}

    # 5. a downstream consumer drains the change feed exactly once
    batches: list = []
    consume_changes(spark, f"{work}/table", "demo-consumer",
                    lambda df, s_, u: batches.append(df.count()))
    summary["feed_rows"] = sum(batches)

    # 6. deterministic training shards + independent verification
    exp = export_jsonl_shards(
        read_committed(spark, f"{work}/table").filter("keep"),
        f"{work}/shards", n_shards=8, key_col="conv_id",
        order_cols=["conv_id", "turn_idx"])
    chk = verify_export(spark, f"{work}/shards")
    summary["export"] = {"rows": exp["total_rows"],
                         "shards": exp["n_shards"],
                         "verified": bool(chk["all_ok"])}
    summary["table_rows"] = table_row_count(f"{work}/table")

    # 7. open-format exit: materialize the DV mask (the export refuses
    #    to ship files whose deleted rows would come back), publish
    #    the snapshot as a Delta table in place (zero copy), and read
    #    it back through the Delta log — the path any external Delta
    #    engine would take
    from curator_spark.checkpoint import compact_partition  # noqa: E402
    from curator_spark.export_delta import (  # noqa: E402
        export_delta_log, read_delta)
    for p, m in make_ledger(f"{work}/table", "commitlog") \
            .snapshot()[0].items():
        if m and any((m.get("dv") or {}).values()):
            compact_partition(spark, f"{work}/table", int(p))
    dl = export_delta_log(f"{work}/table")
    assert read_delta(spark, dl["table_root"]).count() \
        == summary["table_rows"]
    summary["delta_export"] = {"version": dl["delta_version"],
                               "files": dl["files_live"]}

    print(json.dumps(summary, indent=2, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
