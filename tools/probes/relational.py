"""Relational / window / temporal / streaming probe factories.

Each factory takes its source DataFrame(s) (base or replicated) and
returns a zero-arg runner, exactly as the former tools/scale_probe.py
closures did (round-8 split, no behavior change — see SCALING.md probe
citations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401


def q1(src):
    return lambda: src.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
    ).collect()


def asof(src):
    from vector_search_spark.operators.asof import asof_join

    p = src.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
    v = src.filter("event_type = 'view'").select("user_id", "ts", "value")
    return lambda: asof_join(p, v, ["user_id"], right_cols=["value"]).count()


def sessionize(src):
    # w_sessionize_events shape: ONE shuffle on user_id feeds both
    # window passes and the session aggregate. Replication multiplies
    # users (ids shifted), so per-user work is constant — linear class.
    from pyspark.sql import Window

    def run():
        ev2 = src.select(
            "user_id", F.unix_micros("ts").alias("tus"), "event_id", "value"
        )
        w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        brk = F.when(
            F.lag("tus").over(w).isNull()
            | (F.col("tus") - F.lag("tus").over(w) > 1_800_000_000),
            1,
        ).otherwise(0)
        s = ev2.withColumn("brk", brk).withColumn(
            "sid",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return (
            s.groupBy("user_id", "sid")
            .agg(F.count("*").alias("n_events"), F.sum("value"))
            .count()
        )

    return run


def cohort(src):
    # w_cohort_retention shape: ONE user_id shuffle feeds the cohort
    # window AND the aggregate; replication multiplies users, so
    # per-user work is constant — linear class.
    from pyspark.sql import Window

    def run():
        ev2 = src.select("user_id", F.date_trunc("day", "ts").alias("day"))
        w = Window.partitionBy("user_id")
        a = ev2.withColumn("cohort", F.min("day").over(w)).withColumn(
            "day_offset", F.datediff(F.col("day"), F.col("cohort")).cast("long")
        )
        return (
            a.groupBy(
                F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
                "day_offset",
            )
            .agg(F.countDistinct("user_id").alias("n_users"))
            .count()
        )

    return run


def percentiles(src):
    # a_percentiles_by_group shape: per-group exact disc percentiles
    # (sort within 5 lang groups) + the one-pass approx sketch.
    def run():
        return (
            src.groupBy("lang")
            .agg(
                F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))"),
                F.expr("approx_percentile(n_chars, 0.5, 10000)"),
                F.count("*"),
            )
            .count()
        )

    return run


def temporal_join(src):
    # j_temporal_bucket_join shape: 3-bin explode on the probe side,
    # equi-join on (user, bin), residual band filter. Replication
    # multiplies users (ids shifted) so bin population per user is
    # constant — linear class.
    def run():
        gap = 1_800_000_000
        p = src.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"),
            "user_id",
            F.unix_micros("ts").alias("tp"),
        )
        v = src.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("vu"),
            F.unix_micros("ts").alias("tv"),
            (F.unix_micros("ts") - (F.unix_micros("ts") % gap)).alias("bin"),
        )
        pb = p.select(
            "pid", "user_id", "tp",
            F.explode(F.array(*[
                (F.col("tp") - (F.col("tp") % gap) + F.lit(i * gap))
                for i in (-1, 0, 1)
            ])).alias("bin"),
        )
        return (
            pb.join(v, (pb.user_id == v.vu) & (pb.bin == v.bin))
            .filter(F.abs(F.col("tp") - F.col("tv")) <= gap)
            .groupBy("pid")
            .agg(F.count("*"))
            .count()
        )

    return run


def session_native(src):
    # w_session_window_native shape: one shuffle on user_id, native
    # session merge.
    def run():
        return (
            src.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*"), F.sum("value"))
            .count()
        )

    return run


def incr_refresh(src):
    # r_incr_agg_refresh shape: two partition-pruned scans + algebraic
    # merge of 2x|groups| partial rows.
    def run():
        cut = F.lit("1996-01-01").cast("timestamp")

        def part(df):
            return df.groupBy("o_orderpriority", "o_orderstatus").agg(
                F.count("*").alias("n"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                ).alias("c"),
            )

        base = part(src.filter(F.col("o_orderdate") < cut))
        delta = part(src.filter(F.col("o_orderdate") >= cut))
        return (
            base.unionByName(delta)
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.sum("n"), F.sum("c"))
            .count()
        )

    return run


def twa(src):
    # w_time_weighted_avg shape: ONE user_id shuffle feeds the lead
    # window and the scaled-int aggregate; replication multiplies
    # users, per-user segment count constant — linear class.
    from pyspark.sql import Window

    def run():
        e2 = src.select(
            "user_id",
            F.unix_micros("ts").alias("tus"),
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        seg = e2.withColumn(
            "dur", F.lead("tus").over(w) - F.col("tus")
        ).filter(F.col("dur").isNotNull())
        return (
            seg.groupBy("user_id")
            .agg(
                F.sum("dur").alias("td"),
                F.sum(F.col("v100") * F.col("dur")).alias("ws"),
            )
            .count()
        )

    return run


def gap_fill(src):
    # w_gap_fill_interpolate shape: per-user grid generation + union +
    # two IGNORE-NULLS windows over one user_id shuffle; grid side is
    # |users|·days rows. Replication multiplies users — linear class.
    from pyspark.sql import Window

    def run():
        e = src.select(
            "user_id",
            F.unix_micros("ts").alias("tus"),
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        bounds = e.groupBy("user_id").agg(
            F.min("tus").alias("mn"), F.max("tus").alias("mx")
        )
        grid = (
            bounds.select(
                "user_id",
                "mn",
                "mx",
                F.explode(
                    F.sequence(
                        F.to_date(F.timestamp_micros("mn")),
                        F.to_date(F.timestamp_micros("mx")),
                    )
                ).alias("day"),
            )
            .select(
                "user_id",
                "day",
                F.unix_micros(F.to_timestamp("day")).alias("tg"),
                "mn",
                "mx",
            )
            .filter(
                (F.col("tg") >= F.col("mn")) & (F.col("tg") <= F.col("mx"))
            )
        )
        evs = e.select(
            "user_id",
            F.col("tus").alias("t"),
            F.lit(0).alias("isg"),
            "event_id",
            "v100",
        )
        grd = grid.select(
            "user_id",
            F.col("tg").alias("t"),
            F.lit(1).alias("isg"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("bigint").alias("v100"),
        )
        u = evs.unionByName(grd)
        wp = (
            Window.partitionBy("user_id")
            .orderBy("t", "isg", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wn = (
            Window.partitionBy("user_id")
            .orderBy("t", "isg", "event_id")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        ev_t = F.when(F.col("isg") == 0, F.col("t"))
        ev_v = F.when(F.col("isg") == 0, F.col("v100"))
        x = (
            u.withColumn("tp", F.last(ev_t, ignorenulls=True).over(wp))
            .withColumn("vp", F.last(ev_v, ignorenulls=True).over(wp))
            .withColumn("tn", F.first(ev_t, ignorenulls=True).over(wn))
            .withColumn("vn", F.first(ev_v, ignorenulls=True).over(wn))
        )
        return x.filter(
            (F.col("isg") == 1)
            & F.col("tp").isNotNull()
            & (F.col("tn").isNotNull() | (F.col("tp") == F.col("t")))
        ).count()

    return run


def ohlc(src):
    # w_ohlc_bars shape: two row_number windows + groupBy over ONE
    # (user, day) exchange; replication multiplies users — linear.
    from pyspark.sql import Window

    def run():
        e = src.select(
            "user_id",
            F.unix_micros("ts").alias("tus"),
            "event_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        wa = Window.partitionBy("user_id", "day").orderBy(
            "tus", "event_id"
        )
        wd = Window.partitionBy("user_id", "day").orderBy(
            F.desc("tus"), F.desc("event_id")
        )
        r = e.withColumn("rna", F.row_number().over(wa)).withColumn(
            "rnd", F.row_number().over(wd)
        )
        return (
            r.groupBy("user_id", "day")
            .agg(
                F.max(F.when(F.col("rna") == 1, F.col("v100"))).alias(
                    "open_c"
                ),
                F.max("v100").alias("high_c"),
                F.min("v100").alias("low_c"),
                F.max(F.when(F.col("rnd") == 1, F.col("v100"))).alias(
                    "close_c"
                ),
                F.sum("v100").alias("volume_c"),
            )
            .count()
        )

    return run


def cdc_apply(src):
    # s_cdc_apply shape: three foreachBatch merges, each O(state +
    # batch) with a user_id row_number window; replication multiplies
    # keys AND rows, so total merge work scales with the feed —
    # linear class (per-batch state rewrite is the fixture-scale
    # stand-in for partition-wise MERGE).
    import os
    import shutil
    import tempfile
    import uuid

    from vector_search_spark.streaming.cdc import (
        run_cdc_apply_availablenow,
    )

    spark = src.sparkSession

    def run():
        root = tempfile.mkdtemp(prefix=f"sg_cdcprobe_{uuid.uuid4().hex[:6]}_")
        try:
            in_dir = os.path.join(root, "feed")
            os.makedirs(in_dir)
            # land the (replicated) feed as three day-ranged files,
            # mirroring make_cdc_batches without re-reading fixtures
            import glob as _g

            dom = F.dayofmonth("ts")
            for name, pred, mt in (
                ("a", dom <= 10, 1_000_000_000),
                ("b", (dom > 10) & (dom <= 20), 1_000_000_100),
                ("c", dom > 20, 1_000_000_200),
            ):
                part = os.path.join(root, f"stage_{name}")
                src.filter(pred).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(part)
                (f,) = _g.glob(os.path.join(part, "part-*.parquet"))
                dst = os.path.join(in_dir, f"{name}.parquet")
                shutil.move(f, dst)
                os.utime(dst, (mt, mt))
            res = run_cdc_apply_availablenow(
                spark, in_dir, os.path.join(root, "work")
            )
            return res.count()
        finally:
            shutil.rmtree(root, ignore_errors=True)

    return run


def stream_drain(src_path_n):
    # Structured Streaming drain probe: write the (replicated) events
    # to parquet, then drain them through the tumbling-window stream
    # with availableNow — wall time measures streaming THROUGHPUT, the
    # number SCALING.md lacked for the streaming family. State size is
    # bounded by window x type cardinality, so 10x rows should cost
    # ~linear drain time, not superlinear state growth.
    import os
    import uuid

    src, n_copies = src_path_n
    spark = src.sparkSession

    def run():
        base = f"/root/repo/.scratch/stream_drain_{os.getpid()}"
        path = f"{base}/in_{uuid.uuid4().hex[:8]}"
        src.write.mode("overwrite").parquet(path)
        schema = spark.read.parquet(path).schema
        stream = spark.readStream.schema(schema).parquet(path)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        )
        qn = f"sd_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(qn)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.sql(f"SELECT COUNT(*) FROM {qn}").collect()[0][0]
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        return out

    return run


def hll_union(src):
    # a_hll_sketch_union shape: per-day sketch agg, per-week union —
    # two shuffles whose row counts are day/week cardinalities.
    def run():
        daily = src.select(
            F.date_trunc("week", "ts").alias("wk"),
            F.date_trunc("day", "ts").alias("dy"),
            "user_id",
        ).groupBy("wk", "dy").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        return (
            daily.groupBy("wk")
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))"))
            .count()
        )

    return run

