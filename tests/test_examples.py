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
