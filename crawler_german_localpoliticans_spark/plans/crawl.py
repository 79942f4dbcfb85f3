"""The iterative crawl driver: one Spark job per BFS wave.

Spark-native reimplementation of the reference's worker loop
(src/main.rs:554-980) — NOT a port: the Redis queue/set become DataFrame
state (SURVEY.md §3.1 "Spark rebuild lifecycle"):

    frontier(round r) ─ mark seen ─ robots filter (broadcast policies)
      ─ politeness schedule (host partitioning, priority order, rate caps)
      ─ join pages on url (the offline "fetch", BASELINE input_hint)
      ─ found_links pandas UDF ─ keyword gate (Column expr)
      ─ clean/extract pandas UDFs ─ posexplode candidates
      ─ first-discovery-wins dedup (min (parent_seq, pos) struct)
      ─ bloom prefilter ─ exact anti-join vs url_seen
      ─ global seq assignment ─ commit round (checkpoint line)

Determinism / parity invariants (tests/test_crawl_spark.py asserts all of
them against plans/oracle.py on shared fixtures):
- round == BFS depth; expansion commits only after the *whole* wave is
  fetched, so politeness slicing can never change membership or order;
- `seq` = the reference's single-worker FIFO order: seeds in CSV order, then
  children ordered by (first-discovering parent's seq, position in that
  parent's sorted found_links) — exactly the order the Lua
  check-and-add (src/main.rs:30-45) produces under one worker;
- url_seen == distinct frontier urls (every popped URL is seen before any
  filtering, src/main.rs:644-654; children are seen at enqueue);
- `scraped_at` is the page's warc_ts (deterministic stand-in for the
  reference's wall-clock RFC3339 stamp, src/main.rs:919).

Scale posture (local[32] here, 1000 executors at 10^10 URLs):
- robots policies: parsed once per distinct host ON EXECUTORS and kept as a
  DataFrame; the frontier picks them up via a size-guarded JOIN on host_key
  (broadcast when small, AQE shuffle join at 10^7+ hosts) — the driver never
  holds the policy set, only its row count;
- the frontier→pages join is the big shuffle: both sides hash on `url`; at
  production scale `pages` is bucketed by url so the join is shuffle-free
  on the pages side; AQE handles candidate skew;
- the anti-join is keyed on the canonical URL (uniform by construction);
  the bloom sidecar keeps definite-new rows out of it entirely;
- no collect() on data paths — only tiny aggregates (counts, bucket
  offsets, robots policies) reach the driver.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig, DEFAULT_CONFIG
from ..functions import udfs
from ..functions.robots import parse_robots
from ..sources import tables as tbl
from .bloom import BloomSidecar, with_hashes
from .checkpoint import CheckpointLog, partition_lineage
from .ordering import assign_global_seq_counted
from .politeness import schedule_wave


@dataclass
class CrawlTables:
    fetched: DataFrame
    url_seen: DataFrame
    extracted: DataFrame
    frontier: DataFrame
    metrics: list[dict] = field(default_factory=list)


POLICY_SCHEMA = T.StructType(
    [
        T.StructField("allow", T.ArrayType(T.StringType())),
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_ms", T.LongType()),
    ]
)


def parse_policies_df(robots_df: DataFrame, config: CrawlConfig) -> DataFrame:
    """robots table -> policies(host_key, allow, disallow, crawl_delay_ms).

    X3 (src/main.rs:187-271) runs on executors as a pandas UDF over the
    robots table; the result STAYS a DataFrame — nothing is collected to the
    driver, so the policy set scales to 10^8 distinct hosts (the round-1
    verdict's flagship-path scale flag). Hosts without a row get the empty
    allow-all policy via the left join in `evaluate_robots`
    (src/main.rs:138-141)."""
    ua = config.user_agent

    @F.pandas_udf(POLICY_SCHEMA)
    def parse(txts: pd.Series) -> pd.DataFrame:
        allow, disallow, delay = [], [], []
        for txt in txts:
            p = parse_robots(txt or "", ua)
            allow.append(p.allow)
            disallow.append(p.disallow)
            delay.append(p.crawl_delay_ms)
        return pd.DataFrame(
            {"allow": allow, "disallow": disallow, "crawl_delay_ms": delay}
        )

    return robots_df.select(
        "host_key", parse(F.col("robots_txt")).alias("_p")
    ).select(
        "host_key",
        F.col("_p.allow").alias("allow"),
        F.col("_p.disallow").alias("disallow"),
        F.col("_p.crawl_delay_ms").alias("crawl_delay_ms"),
    )


@F.pandas_udf(T.BooleanType())
def _robots_blocked_udf(urls: pd.Series, allows: pd.Series, disallows: pd.Series) -> pd.Series:
    """Longest-prefix robots match (src/main.rs:97-108), vectorized over the
    Arrow batch. Null rule arrays (host without a robots row) => allowed."""
    from ..functions.urls import url_path as _url_path

    out = []
    for url, allow, disallow in zip(urls, allows, disallows):
        if allow is None and disallow is None:
            out.append(False)
            continue
        path = _url_path(url)
        a = max((len(p) for p in (allow if allow is not None else []) if path.startswith(p)), default=0)
        d = max((len(p) for p in (disallow if disallow is not None else []) if path.startswith(p)), default=0)
        out.append(bool(d > a and d > 0))
    return pd.Series(out)


def evaluate_robots(
    df: DataFrame, policies_df: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Join `df` (needs a host_key column) against the policies table and
    evaluate the longest-prefix match: adds robots_blocked + crawl_delay_ms.

    The policy state ships as a JOIN, not a driver dict: below
    `broadcast_policies_max_hosts` the policies side is broadcast (one copy
    per executor, exactly the old semantics); above it Catalyst/AQE picks a
    shuffle join keyed on host_key — per-task memory stays O(hosts/P) at any
    host count. Only (allow, disallow) rule arrays cross into Python, one
    Arrow batch per partition."""
    pol = F.broadcast(policies_df) if broadcast else policies_df
    return (
        df.join(pol, on="host_key", how="left")
        .withColumn(
            "robots_blocked",
            _robots_blocked_udf(F.col("url"), F.col("allow"), F.col("disallow")),
        )
        .drop("allow", "disallow")
    )


def build_robots_state(
    spark: SparkSession, robots_df: DataFrame, config: CrawlConfig
) -> dict[str, tuple[tuple[str, ...], tuple[str, ...], int | None]]:
    """Collected dict form of parse_policies_df — kept for parity tests and
    driver-side tooling ONLY; the crawl path uses `evaluate_robots` (a join)
    so no O(hosts) state ever reaches the driver."""
    rows = parse_policies_df(robots_df, config).collect()
    return {
        r["host_key"]: (tuple(r["allow"]), tuple(r["disallow"]), r["crawl_delay_ms"])
        for r in rows
    }


class CrawlDriver:
    """Iterative BFS crawl over (pages, seeds, robots) with checkpoint/resume."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        pages_path: str,
        robots_df: DataFrame,
        config: CrawlConfig = DEFAULT_CONFIG,
    ) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.config = config
        # without this, persisting the wave freezes a non-AQE plan (no
        # broadcast conversion, no partition coalescing) — 5-20x slower
        # rounds; measured in BENCH notes
        try:
            spark.conf.set(
                "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
            )
        except Exception:
            pass
        os.makedirs(work_dir, exist_ok=True)
        self.catalog = tbl.Catalog(spark, work_dir)
        self.checkpoints = CheckpointLog(work_dir)
        self.bloom = BloomSidecar(
            work_dir, config.seen_partitions, config.bloom_capacity_per_partition, config.bloom_fpp
        )
        self.pages_path = pages_path
        # the pages corpus is read once and cached across rounds (at 100 TB
        # scale: a bucketed-by-url Iceberg table instead of a cache).
        # NOTE (r6): caching it pre-hash-partitioned by url (to let the
        # per-round join skip the pages-side exchange, guide §2.4) was
        # tried and measured SLOWER at sandbox scale — the wave join
        # broadcasts the small frontier side, so the pages cache is never
        # exchanged at all and the extra repartition shuffle of the html
        # payload is pure cost (receipt in BENCH/NOTES.md r6). At cluster
        # scale, where BOTH sides are big, url-bucketed storage is still
        # the right layout, as documented in the module header.
        self.pages = tbl.read_pages(spark, pages_path).persist()
        # robots policies stay a DataFrame (parsed once on executors, reused
        # every round via persist); the only driver-side value is the row
        # COUNT, which sizes the join strategy — never the policies themselves
        self.policies_df = parse_policies_df(robots_df, config).persist()
        n_policy_hosts = self.policies_df.count()
        self.broadcast_policies = n_policy_hosts <= config.broadcast_policies_max_hosts

    # ------------------------------------------------------------------ seeds
    def _seed_frontier(self, seeds_df: DataFrame) -> tuple[DataFrame, int]:
        """raw seeds -> (depth-0 frontier, seed count); invalid URLs skipped
        (seeder.rs:55-60); duplicates preserved (seeder does not dedup).
        The count rides out of the seq assignment's bucket-count pass
        (assign_global_seq_counted) so run() never pays a separate count()
        job over the frontier."""
        seeded = (
            seeds_df.withColumn("url", udfs.seed_normalize(F.col("raw_url")))
            .where(F.col("url").isNotNull())
        )
        seeded, n_seeds = assign_global_seq_counted(
            seeded, ["seed_order"], base=0, buckets=self.config.shuffle_partitions
        )
        return (
            seeded.select(
                "seq",
                "url",
                F.lit(0).cast("int").alias("depth"),
                udfs.url_host(F.col("url")).alias("host"),
                udfs.host_key(F.col("url")).alias("host_key"),
            ),
            n_seeds,
        )

    # ------------------------------------------------------------------ wave
    def _run_round(self, r: int, next_seq: int, bloom_version: int) -> dict:
        cfg = self.config
        cat = self.catalog
        t0 = time.monotonic()
        metrics: dict = {"round": r}

        # 1. mark seen: the url_seen delta for this round was written when
        #    the round's frontier was enqueued (seeds at round 0, children at
        #    expansion) — invariant: url_seen == distinct(frontier.url).

        # 2. robots filter (broadcast state; blocked rows stay in seen and in
        #    fetched with robots_blocked=true, src/main.rs:684-686), keyword
        #    gate (pure Column expr), politeness schedule (host partitions,
        #    priority order, per-host slots + slices)
        frontier = evaluate_robots(
            cat.read_round("frontier", r, tbl.FRONTIER_SCHEMA),
            self.policies_df,
            broadcast=self.broadcast_policies,
        ).withColumn(
            "keyword_hit",
            udfs.keyword_hit_col(F.col("url"), cfg.keywords, cfg.save_all_html),
        )
        # blocked rows ride the same scan/window (they sort last per host and
        # get null schedule columns) — a split+union here would scan the
        # frontier and run the robots UDF twice (verified via explain)
        wave = schedule_wave(frontier, cfg)

        # 3. offline fetch = join against the pages corpus on canonical url
        #    (BASELINE input_hint), then the link pipeline as ONE Arrow pass;
        #    blocked rows pass a null html into the UDF so their (discarded)
        #    parse costs nothing
        ok_col = ~F.col("robots_blocked") & F.col("html").isNotNull()
        wave = (
            wave.join(self.pages.select("url", "warc_ts", "html"), on="url", how="left")
            .withColumn("fetch_failed", ~F.col("robots_blocked") & F.col("html").isNull())
            .withColumn(
                "found_links",
                F.when(
                    ok_col,
                    udfs.found_links(F.col("url"), F.when(ok_col, F.col("html"))),
                ).otherwise(F.array().cast("array<string>")),
            )
            .withColumn("ok", ok_col)
        )
        wave.persist()

        # 4. fetched table rows for the whole wave; wave counters ride along
        #    as observed metrics on the write job (no second pass)
        from pyspark.sql import Observation

        def fetched_select(df):
            return df.select(
                "seq",
                "url",
                "depth",
                F.when(F.col("ok"), F.col("warc_ts")).alias("scraped_at"),
                "found_links",
                "keyword_hit",
                "robots_blocked",
                "fetch_failed",
            )

        wave_aggs = [
            F.count(F.lit(1)).alias("scheduled"),
            F.sum(F.col("robots_blocked").cast("long")).alias("blocked"),
            F.sum(F.col("keyword_hit").cast("long")).alias("keyword"),
            F.sum(F.col("ok").cast("long")).alias("ok"),
            F.sum(F.when(F.col("ok"), F.size("found_links")).otherwise(0)).alias("cand"),
            F.approx_count_distinct("host").alias("hosts"),
            F.max("host_slot").alias("max_host_slot"),
            F.max(F.col("sched_offset_ms") + F.col("effective_delay_ms")).alias("sim_ms"),
            F.max("slice").alias("max_slice"),
        ]
        if cfg.execute_by_slice:
            # sequential slice materialization: slice s's fetch work runs
            # (and lands in the round dir) before slice s+1 starts —
            # robots-blocked rows (never fetched) ride with slice 0
            n_slices = wave.agg(F.max("slice")).collect()[0][0]
            n_slices = int(n_slices) if n_slices is not None else 0
            slice_col = F.coalesce(F.col("slice"), F.lit(0))
            cat.write_round_parts(
                "fetched",
                r,
                [fetched_select(wave.where(slice_col == s)) for s in range(n_slices + 1)],
            )
            stats = wave.agg(*wave_aggs).collect()[0]
        else:
            obs = Observation(f"wave-{r}")
            cat.write_round("fetched", r, fetched_select(wave.observe(obs, *wave_aggs)))
            stats = None  # resolved below after the write ran

        # 5. extraction stage: keyword-gated fetched pages only
        #    (src/main.rs:824); clean_html + text in one pandas UDF.
        #    NOTE (r6): overlapping this write with the expansion jobs on a
        #    driver thread (guide §2.6) was tried and measured SLOWER here
        #    (+0.7-1.3s/round): the round's jobs are latency-bound driver
        #    round trips, and the extraction job occupying every executor
        #    slot delays each of them — receipt in BENCH/NOTES.md r6.
        extracted = (
            wave.where(F.col("ok") & F.col("keyword_hit"))
            .withColumn("ce", udfs.clean_extract(F.col("html")))
            .select(
                "url",
                F.col("ce.clean_html").alias("clean_html"),
                F.col("ce.text").alias("text"),
                udfs.custom_id_from_url(F.col("url")).alias("custom_id"),
            )
        )
        cat.write_round("extracted", r, extracted)

        # 6. wave counters + politeness metrics (observed on the write job,
        #    or aggregated once in slice-execution mode)
        if stats is None:
            stats = obs.get
        ok_count = int(stats["ok"] or 0)
        metrics.update(
            scheduled=stats["scheduled"],
            robots_blocked=int(stats["blocked"] or 0),
            keyword_hits=int(stats["keyword"] or 0),
            fetched_ok=ok_count,
            fetch_failed=stats["scheduled"] - int(stats["blocked"] or 0) - ok_count,
            candidates=int(stats["cand"] or 0),
            politeness={
                "hosts": stats["hosts"] or 0,
                "max_pages_per_host": (stats["max_host_slot"] if stats["max_host_slot"] is not None else -1) + 1,
                "simulated_wave_ms": int(stats["sim_ms"] or 0),
                "slices": (stats["max_slice"] or 0) + 1,
            },
        )

        # 7. expansion (depth cutoff: children of pages AT max_depth are not
        #    enqueued, src/main.rs:939-941). NOTE (r6): suspending AQE for
        #    the expansion's three tiny actions (to cut its per-stage
        #    materialization round trips) was tried and measured SLOWER —
        #    AQE is also what converts the seen/seed anti-joins to
        #    broadcast at runtime; without it they fall back to shuffle
        #    joins that cost more than the saved scheduling latency.
        enqueued = 0
        new_bloom_version = bloom_version
        if r < cfg.max_depth:
            candidates = wave.where(F.col("ok")).select(
                F.col("seq").alias("parent_seq"),
                F.posexplode("found_links").alias("pos", "child_url"),
            )
            # first-discovery-wins: min (parent_seq, pos) per url — the exact
            # outcome of the reference's sequential Lua check-and-add under
            # the canonical single-worker order (src/main.rs:30-45)
            first = (
                candidates.groupBy("child_url")
                .agg(F.min(F.struct("parent_seq", "pos")).alias("first"))
                .select(
                    F.col("child_url").alias("url"),
                    F.col("first.parent_seq").alias("parent_seq"),
                    F.col("first.pos").alias("pos"),
                )
            )
            first = with_hashes(first, "url", cfg.seen_partitions)
            if cfg.use_bloom_prefilter:
                pref = self.bloom.prefilter(first, bloom_version)
                definite_new = pref.where(~F.col("maybe_seen")).drop("maybe_seen")
                maybe = pref.where(F.col("maybe_seen")).drop("maybe_seen")
            else:
                definite_new = first.where(F.lit(False))
                maybe = first

            if r == 0:
                # Reference quirk (seeder.rs:146; src/main.rs:644-654): seeds
                # are enqueued WITHOUT a visited-set add — they become seen
                # only when popped. Under the canonical single-worker order,
                # a candidate equal to a seed is therefore new iff its
                # first-discovering parent popped BEFORE that seed:
                # keep iff parent_seq < min(seed_seq of the url).
                seed_min = (
                    cat.read_round("frontier", 0, tbl.FRONTIER_SCHEMA)
                    .groupBy("url")
                    .agg(F.min("seq").alias("seed_seq"))
                )
                survivors = (
                    maybe.join(seed_min, on="url", how="left")
                    .where(F.col("seed_seq").isNull() | (F.col("parent_seq") < F.col("seed_seq")))
                    .drop("seed_seq")
                )
            else:
                # rounds ≥ 1: every queued URL was visited-set-added at its
                # enqueue (the Lua script, src/main.rs:30-45), so the exact
                # anti-join against url_seen is the precise semantics.
                # url_seen IS distinct(frontier.url) over rounds 0..r — no
                # separate table to maintain; column pruning reads only the
                # url column from the frontier round dirs
                seen = cat.read_rounds("frontier", list(range(r + 1)), tbl.FRONTIER_SCHEMA)
                survivors = maybe.join(seen.select("url"), on="url", how="left_anti")
            # the dedup chain (prefilter + anti-join) feeds three consumers
            # (seq bounds, bucket counts, frontier write) — persist it once
            pre_seq = definite_new.unionByName(survivors).persist()
            # parent_seq ∈ [0, next_seq) by construction (parents are
            # already-sequenced rows), so the bucket-range scan is free
            new_urls, enqueued = assign_global_seq_counted(
                pre_seq,
                ["parent_seq", "pos"],
                base=next_seq,
                buckets=cfg.shuffle_partitions,
                known_bounds=(0, max(next_seq - 1, 0)),
            )
            next_frontier = new_urls.select(
                "seq",
                "url",
                F.lit(r + 1).cast("int").alias("depth"),
                udfs.url_host(F.col("url")).alias("host"),
                udfs.host_key(F.col("url")).alias("host_key"),
                "h1",
                "h2",
                "part",
            )
            next_frontier.persist()
            cat.write_round(
                "frontier", r + 1, next_frontier.select(*[f.name for f in tbl.FRONTIER_SCHEMA])
            )
            new_bloom_version = bloom_version + 1
            self.bloom.insert(
                next_frontier.select("part", "h1", "h2"), bloom_version, new_bloom_version
            )
            next_frontier.unpersist()
            pre_seq.unpersist()

        metrics["enqueued"] = enqueued
        metrics["next_seq"] = next_seq + enqueued
        metrics["bloom_version"] = new_bloom_version
        metrics["wall_s"] = round(time.monotonic() - t0, 3)
        metrics["lineage"] = {
            t: partition_lineage(cat.round_dir(t, r))
            for t in ("fetched", "extracted")
        }
        metrics["lineage"]["frontier_next"] = partition_lineage(cat.round_dir("frontier", r + 1))

        wave.unpersist()
        return metrics

    # ------------------------------------------------------------------ run
    def run(self, seeds_df: DataFrame | None = None, resume: bool = False) -> CrawlTables:
        """Run (or resume) the crawl to max_depth. `seeds_df` needs columns
        (raw_url, seed_order) — see sources/seeds.py."""
        cfg = self.config
        cat = self.catalog

        last = self.checkpoints.last_committed_round()
        if resume and last is not None:
            # drop uncommitted partials, recompute deterministically
            entry = self.checkpoints.last_entry()
            next_seq = entry["next_seq"]
            bloom_version = entry["bloom_version"]
            for t in ("fetched", "extracted"):
                cat.drop_rounds_after(t, last)
            cat.drop_rounds_after("frontier", last + 1)
            self.bloom.drop_versions_after(bloom_version)
            start_round = last + 1
        else:
            if seeds_df is None:
                raise ValueError("seeds_df required for a fresh run")
            self.checkpoints.reset()
            for t in ("frontier", "fetched", "extracted"):
                cat.drop_rounds_after(t, -1)
            self.bloom.drop_versions_after(-1)
            frontier0, n_seeds = self._seed_frontier(seeds_df)
            frontier0.persist()
            cat.write_round("frontier", 0, frontier0)
            seen0 = with_hashes(
                frontier0.select("url").distinct(), "url", cfg.seen_partitions
            )
            self.bloom.insert(seen0.select("part", "h1", "h2"), None, 0)
            frontier0.unpersist()
            next_seq = n_seeds
            bloom_version = 0
            start_round = 0

        all_metrics: list[dict] = []
        for r in range(start_round, cfg.max_depth + 1):
            m = self._run_round(r, next_seq, bloom_version)
            next_seq = m["next_seq"]
            bloom_version = m["bloom_version"]
            self.checkpoints.commit(m)
            all_metrics.append(m)
            if m["enqueued"] == 0 and r < cfg.max_depth:
                break  # frontier drained early

        return self.result_tables(all_metrics)

    def result_tables(self, metrics: list[dict] | None = None) -> CrawlTables:
        committed = [e["round"] for e in self.checkpoints.entries()]
        rounds = sorted(set(committed))
        frontier = self.catalog.read_rounds(
            "frontier", sorted({*rounds, *[r + 1 for r in rounds]}), tbl.FRONTIER_SCHEMA
        )
        # url_seen == distinct frontier urls (D2 invariant); materialized as a
        # view over the frontier rounds rather than a second table
        url_seen = with_hashes(
            frontier.select("url").distinct(), "url", self.config.seen_partitions
        ).select("url", "h1", "h2", "part")
        return CrawlTables(
            fetched=self.catalog.read_rounds("fetched", rounds, tbl.FETCHED_SCHEMA),
            url_seen=url_seen,
            extracted=self.catalog.read_rounds("extracted", rounds, tbl.EXTRACTED_SCHEMA),
            frontier=frontier,
            metrics=metrics or self.checkpoints.entries(),
        )
