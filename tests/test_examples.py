"""The examples/ scripts are documentation that runs — pin them so they
cannot rot as operator signatures evolve."""

from __future__ import annotations


def test_curation_pipeline_funnel(spark, sf_dir):
    """The end-to-end curation recipe runs and its funnel is sane:
    monotone non-increasing through the drop stages, a non-trivial keep
    rate, split sides disjoint-and-complete, and every pack/shard id
    populated."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "curation_pipeline", "examples/curation_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    f = mod.curate(spark, sf_dir)
    assert (
        f["raw"]
        >= f["after_exact_dedup"]
        >= f["after_near_dedup"]
        >= f["after_quality_gate"]
        >= f["after_decontam"]
        > 0
    )
    assert f["train_rows"] + f["val_rows"] <= f["after_decontam"]
    assert f["train_rows"] > 0 and f["val_rows"] > 0
    assert 0 < f["n_packs"]
    assert 0 < f["n_shards"] <= 16


def test_crawl_ingest_pipeline_funnel(spark, sf_dir):
    """The ingest-side recipe runs and its funnel is sane: monotone
    through the drop stages, the zone block removes at least one host's
    events (sites.io covers ~2 of 7 hosts by construction), and the
    admitted set respects the per-host cap exactly."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "crawl_ingest_pipeline", "examples/crawl_ingest_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    f = mod.ingest(spark, sf_dir)
    # only the genuinely monotone stages: distinct_canonical_urls is NOT
    # comparable to events_after_zone_block at arbitrary SF (distinct
    # URLs saturate — raw_url is id mod a fixed period per host — while
    # event counts grow linearly, so that inequality can flip on a
    # larger fixture even though the pipeline is correct)
    assert (
        f["raw_feed_events"]
        >= f["events_after_zone_block"]
        > f["admitted_after_host_cap"]
        > 0
    )
    assert f["events_after_zone_block"] < f["raw_feed_events"]
    # dedup sanity, checked against the raw feed it collapsed
    assert 0 < f["distinct_canonical_urls"] <= f["raw_feed_events"]
    # cap respected exactly: at most 10 per surviving host
    assert f["admitted_after_host_cap"] <= 10 * f["n_hosts"]
