"""Phase breakdown for the streaming headline queries (r17 VERDICT item 3).

Measures where x_stream_tumbling_agg / x_stream_session_window spend their
~0.4-1.4 s of streaming-machinery overhead above the batch twin:

- wall time of the full registered builder (build + run_stream + read-back),
- the micro-batch's own durationMs breakdown from StreamingQueryProgress
  (triggerExecution, addBatch, getBatch, latestOffset, queryPlanning,
  walCommit, commitOffsets),
- state-store commit metrics from stateOperators,
- the batch twin of the same aggregation (same operator, no streaming).

Usage: python tools/stream_probe.py [--runs=N] [--sf=DIR]
Optional env STREAM_PROBE_CONF="k=v,k=v" applies extra runtime confs (e.g.
RocksDB state store) before the run, to A/B machinery variants.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tutorial_iceberg_spark.io import load_table  # noqa: E402
from tutorial_iceberg_spark.registry import all_queries  # noqa: E402
from tutorial_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark(app_name="stream-probe")
    extra = os.environ.get("STREAM_PROBE_CONF", "")
    for kv in filter(None, extra.split(",")):
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
        print(f"# conf {k}={v}")
    specs = all_queries()

    import tutorial_iceberg_spark.streaming.events_stream as es

    # progress capture: patch run_stream to stash the query's recentProgress
    captured: list = []
    orig = es.run_stream

    def capturing_run_stream(stream_df, mode="complete", single_batch=False):
        # reuse the original, then read LAST_STREAM_STATE + the module-level
        # hook below (orig already records LAST_STREAM_STATE)
        return orig(stream_df, mode=mode, single_batch=single_batch)

    # monkeypatch awaitTermination capture instead: simplest is to wrap
    # DataStreamWriter.start? Overkill — recentProgress lives on the query
    # object inside run_stream. Patch run_stream wholesale with a copy that
    # also appends progress dicts.
    def probing_run_stream(stream_df, mode="complete", single_batch=False):
        import os as _os

        from tutorial_iceberg_spark import scratch as _scratch

        spark_ = stream_df.sparkSession
        root = _scratch.defer_cleanup(
            _scratch.scratch_dir("tis_stream_probe", unique=True)
        )
        out_dir = _os.path.join(root, "out")
        chk_dir = _os.path.join(root, "_chk")
        prev = spark_.conf.get("spark.sql.shuffle.partitions")
        spark_.conf.set(
            "spark.sql.shuffle.partitions", str(es.STREAM_SHUFFLE_PARTITIONS)
        )
        try:
            t0 = time.perf_counter()
            if mode == "append":
                q = (
                    stream_df.writeStream.format("parquet")
                    .option("path", out_dir)
                    .option("checkpointLocation", chk_dir)
                    .outputMode(mode)
                    .trigger(availableNow=True)
                    .start()
                )
            else:

                def _spill(batch_df, batch_id):
                    batch_df.write.mode("overwrite").parquet(out_dir)

                q = (
                    stream_df.writeStream.foreachBatch(_spill)
                    .option("checkpointLocation", chk_dir)
                    .outputMode(mode)
                    .trigger(availableNow=True)
                    .start()
                )
            t_started = time.perf_counter()
            q.awaitTermination()
            t_done = time.perf_counter()
            captured.append(
                {
                    "start_call_s": round(t_started - t0, 4),
                    "await_s": round(t_done - t_started, 4),
                    "progress": [json.loads(p.json) for p in (q.recentProgress or [])],
                }
            )
        finally:
            spark_.conf.set("spark.sql.shuffle.partitions", prev)
        _os.makedirs(out_dir, exist_ok=True)
        return spark_.read.schema(stream_df.schema).parquet(out_dir)

    es.run_stream = probing_run_stream
    try:
        for name in ("x_stream_tumbling_agg", "x_stream_session_window"):
            b = specs[name].builder
            b(spark, "/root/testdata/sf0.001").collect()  # warm
            for i in range(runs):
                captured.clear()
                spark.sparkContext.setJobDescription(f"stream-probe:{name}:{i}")
                t0 = time.perf_counter()
                rows = len(b(spark, sf_dir).collect())
                wall = time.perf_counter() - t0
                spark.sparkContext.setJobDescription(None)
                for c in captured:
                    durs = [
                        {
                            "batchId": p.get("batchId"),
                            "durationMs": p.get("durationMs"),
                            "stateRows": [
                                op.get("numRowsTotal")
                                for op in p.get("stateOperators", [])
                            ],
                            "commitMs": [
                                op.get("commitTimeMs")
                                for op in p.get("stateOperators", [])
                            ],
                        }
                        for p in c["progress"]
                    ]
                    print(
                        f"{name} run{i}: wall={wall:.3f}s rows={rows} "
                        f"start_call={c['start_call_s']}s await={c['await_s']}s "
                        f"batches={durs}"
                    )
    finally:
        es.run_stream = orig

    # batch twins (same operator, no streaming, same collect methodology)
    ev = load_table(spark, sf_dir, "events")
    twins = {
        "twin_tumbling": lambda: (
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("cnt"),
            )
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "event_type",
                "cnt",
            )
            .orderBy("window_start", "event_type")
        ),
        "twin_session": lambda: (
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(
                F.session_window("ts", f"{es.SESSION_GAP_MIN} minutes").alias("w"),
                "user_id",
            )
            .agg(F.count("*").alias("n_events"))
            .orderBy("user_id"),
        ),
    }
    for tname, fn in twins.items():
        df = fn()
        if isinstance(df, tuple):
            df = df[0]
        df.collect()  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df2 = fn()
            if isinstance(df2, tuple):
                df2 = df2[0]
            df2.collect()
            best = min(best, time.perf_counter() - t0)
        print(f"{tname}: best={best:.3f}s")


if __name__ == "__main__":
    main()
