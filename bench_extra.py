"""Stage-isolation benchmarks for the optimization rounds (guide §1.4).

NOT the driver's bench: bench.py is frozen; this file exists so each
timed section of bench.py can be decomposed operator-by-operator with
the noop sink, and so .explain("formatted") plans can be captured to
plans/r06/.  Usage:

  python bench_extra.py [section ...]        # default: all
  SPARK_GRAFT_EXTRA_ROUNDS=2 python bench_extra.py headline

Sections: headline (extraction/rules/convert/triples decomposition),
j8j9, w4, skew, entry (the 6 prebuilt entry queries).

Prints one JSON line per timed stage: {"stage": name, "runs": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gtfs2lc_spark import extraction, fixtures, pipeline, postprocess, sinks, skew  # noqa: E402
from gtfs2lc_spark.session import build_session  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sections = set(sys.argv[1:]) or {"headline", "j8j9", "w4", "skew", "entry"}
    plan_tag = os.environ.get("SPARK_GRAFT_EXTRA_PLANTAG", "")  # "before"/"after"/""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_feeds = int(os.environ.get("SPARK_GRAFT_FEEDS", "720"))
    rounds = int(os.environ.get("SPARK_GRAFT_EXTRA_ROUNDS", "3"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = build_session(
        app_name="gtfs2lc-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    os.makedirs(PLANS_DIR, exist_ok=True)
    staged: list[tuple[str, object]] = []  # (name, df-or-thunk)

    def stage(name: str, df, explain: bool = True):
        if explain and plan_tag and hasattr(df, "_jdf"):
            with open(os.path.join(PLANS_DIR, f"{name}_{plan_tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        staged.append((name, df))

    if {"headline", "w4"} & sections:
        pages = fixtures.pages_df_scaled(
            spark, n_feeds, noise_pages=40, n_partitions=cpus * 2
        ).cache()
        pages.count()
        ent = extraction.extract_entities(pages)
        rules = pipeline.stop_times_to_rules(
            ent["stop_times"], ent["trips"], ent["routes"], ent["stops"]
        )
        conns = pipeline.convert(
            ent["stop_times"], ent["trips"], ent["routes"], ent["stops"],
            ent["calendar"], ent["calendar_dates"], salt_n=64,
        )
        triples = sinks.connections_to_triples(conns)
        if "headline" in sections:
            stage("hl_stop_times_parse", ent["stop_times"])
            stage("hl_rules", rules)
            stage("hl_convert", conns)
            stage("gtfs_pipeline_triples", triples)
        if "w4" in sections:
            triples_fc = triples.localCheckpoint(eager=True)
            print(json.dumps({
                "stage": "w4_input",
                "rows": triples_fc.count(),
                "parts": triples_fc.rdd.getNumPartitions(),
            }))
            stage(
                "w4_message_counter",
                lambda: _force(
                    sinks.dense_index(triples_fc, ["subj"], n_parts=max(cpus, 8))
                    .withColumnRenamed("_dense_idx", "message_counter")
                ),
                explain=False,
            )
            # rank job alone (sample collect happens at build time, here)
            di = sinks.dense_index(triples_fc, ["subj"], n_parts=max(cpus, 8))
            stage("w4_rank_job_only", di)

    if "j8j9" in sections:
        from gtfs2lc_spark.uris import FEED_SCOPED_BASE_URIS, URIStrategy
        pp_feeds = min(n_feeds, 60)
        ep = extraction.extract_entities(
            fixtures.pages_df_scaled(spark, pp_feeds, noise_pages=0, n_partitions=cpus)
        )
        jl = sinks.connections_to_jsonld(
            pipeline.convert(
                ep["stop_times"], ep["trips"], ep["routes"], ep["stops"],
                ep["calendar"], ep["calendar_dates"], salt_n=64,
            ),
            URIStrategy(FEED_SCOPED_BASE_URIS),
        ).drop("feed_id", "type", "departure_ts", "arrival_ts").localCheckpoint(eager=True)
        t0 = time.perf_counter()
        jas = postprocess.join_and_sort(jl)  # materializes merge at build time
        print(json.dumps({"stage": "j8_merge_buildtime", "sec": round(time.perf_counter() - t0, 3)}))
        merged = postprocess.materialize(postprocess.merge_movements(jl), "x-merged")
        linked = postprocess.link_next_connections(merged)
        stage("j9_linked_only", linked)
        stage("j8_j9_join_and_sort", jas)

    if "entry" in sections:
        qs = entry_mod.queries()
        for name in (
            "w1_lag_pairs", "j6_date_explode", "broadcast_enrich",
            "o2_multikey_sort", "dedup_exact", "text_token_count",
        ):
            stage(name, qs[name](spark, sf_dir))

    if "skew" in sections:
        skew_rows = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "60000"))
        sents = fixtures.skewed_entities(spark, mega_rows=skew_rows)
        skew_st = sents["stop_times"].localCheckpoint(eager=True)
        for mode, salt in (("salted", 64), ("unsalted", None)):
            stage(
                f"skew_{mode}",
                pipeline.convert(
                    skew_st, sents["trips"], sents["routes"], sents["stops"],
                    sents["calendar"], sents["calendar_dates"], salt_n=salt,
                ),
            )
        skew_rules = (
            pipeline.stop_times_to_rules(
                skew_st, sents["trips"], sents["routes"], sents["stops"]
            )
            .withColumn("k", F.concat_ws("|", "feed_id", "trip_service_id"))
            .localCheckpoint(eager=True)
        )
        skew_dates = (
            pipeline.expand_services(sents["calendar"], sents["calendar_dates"])
            .select(
                F.concat_ws("|", "feed_id", "service_id").alias("k"),
                F.explode("dates").alias("service_date"),
            )
            .localCheckpoint(eager=True)
        )
        stage("skewjoin_salted", skew.salted_join(skew_rules, skew_dates, "k", n_salts=64))
        stage("skewjoin_plain", skew_rules.join(skew_dates.hint("merge"), "k"))

    # warmup pass, then interleaved rounds
    runs: dict[str, list[float]] = {}
    def execute(obj):
        if callable(obj):
            obj()
        else:
            _force(obj)
    for name, obj in staged:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        execute(obj)
        runs[name] = []
    for _ in range(rounds):
        for name, obj in staged:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            execute(obj)
            runs[name].append(round(time.perf_counter() - t0, 3))
    for name, r in runs.items():
        print(json.dumps({"stage": name, "runs": r}))
    spark.stop()


if __name__ == "__main__":
    main()
