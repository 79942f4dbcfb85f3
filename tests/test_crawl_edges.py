"""Engine edge cases: drained frontiers, max_depth=0, all-blocked seeds."""

from __future__ import annotations

from crawler_german_localpoliticans_spark.config import CrawlConfig
from crawler_german_localpoliticans_spark.fixtures import write_fixture_parquet
from crawler_german_localpoliticans_spark.plans.crawl import CrawlDriver
from crawler_german_localpoliticans_spark.plans.oracle import crawl_oracle
from crawler_german_localpoliticans_spark.sources.seeds import seeds_from_table
from crawler_german_localpoliticans_spark.sources.tables import read_robots


def run_both(spark, tmp_path, seeds, pages, robots, config):
    from crawler_german_localpoliticans_spark.fixtures import WebFixture, SMOKE

    fx = WebFixture(
        SMOKE, seeds, pages, robots,
        {u: i for i, u in enumerate(pages)}, {u: "de" for u in pages},
    )
    d = tmp_path / "fx"
    d.mkdir()
    write_fixture_parquet(fx, str(d))
    oracle_res = crawl_oracle(seeds, pages, robots, config)
    robots_df = read_robots(spark, f"{d}/robots.parquet")
    seeds_df = seeds_from_table(spark.read.parquet(f"{d}/seeds.parquet"))
    driver = CrawlDriver(spark, str(tmp_path / "work"), f"{d}/pages.parquet", robots_df, config)
    tables = driver.run(seeds_df)
    engine_order = [
        (r["depth"], r["seq"], r["url"])
        for r in tables.fetched.select("depth", "seq", "url").orderBy("seq").collect()
    ]
    assert engine_order == oracle_res.crawl_order
    assert {r["url"] for r in tables.url_seen.select("url").collect()} == oracle_res.url_seen
    return tables


def test_all_seeds_robots_blocked(spark, tmp_path):
    pages = {"https://a.de/x": '<a href="/y">y</a>', "https://a.de/y": ""}
    robots = {"https://a.de": "User-agent: *\nDisallow: /\n"}
    config = CrawlConfig(seen_partitions=4, shuffle_partitions=4)
    tables = run_both(spark, tmp_path, ["https://a.de/x"], pages, robots, config)
    rows = tables.fetched.collect()
    assert len(rows) == 1 and rows[0]["robots_blocked"]
    # frontier drained at round 1 -> loop stopped early, tables consistent
    assert tables.extracted.count() == 0


def test_max_depth_zero_fetches_seeds_only(spark, tmp_path):
    pages = {
        "https://a.de/": '<a href="/child">c</a>',
        "https://a.de/child": "",
    }
    config = CrawlConfig(max_depth=0, seen_partitions=4, shuffle_partitions=4)
    tables = run_both(spark, tmp_path, ["https://a.de/"], pages, {}, config)
    rows = tables.fetched.collect()
    assert [r["url"] for r in rows] == ["https://a.de/"]
    # the seed's links are still recorded, just never enqueued
    assert list(rows[0]["found_links"]) == ["https://a.de/child"]


def test_seeds_with_dead_urls_only(spark, tmp_path):
    pages = {"https://real.de/": ""}
    config = CrawlConfig(seen_partitions=4, shuffle_partitions=4)
    tables = run_both(
        spark, tmp_path, ["https://tot.de/", "https://auch-tot.de/"], pages, {}, config
    )
    rows = tables.fetched.collect()
    assert all(r["fetch_failed"] for r in rows)
