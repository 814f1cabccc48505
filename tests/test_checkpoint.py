"""Resumability: kill-and-resume yields identical output (SURVEY.md §5 item 3)."""

import pandas as pd
import pytest

from libpostal_spark.config import PipelineConfig
from libpostal_spark.corpus import corpus_to_spark, generate_corpus
from libpostal_spark.pipeline import DedupPipeline


@pytest.fixture()
def small_pdf():
    return generate_corpus(n_base=40, n_boilerplate_copies=5, n_clone_embed=2, seed=42)


def test_config_hash_stability_and_sensitivity():
    a = PipelineConfig()
    b = PipelineConfig()
    assert a.config_hash == b.config_hash
    c = PipelineConfig(k_shingle=7)
    assert a.config_hash != c.config_hash
    # non-semantic knobs don't invalidate checkpoints
    d = PipelineConfig(checkpoint_dir="/elsewhere", shuffle_partitions=64)
    assert a.config_hash == d.config_hash


def test_resume_identical_output(spark, small_pdf, tmp_path):
    files = corpus_to_spark(spark, small_pdf, 4)
    cfg = PipelineConfig()
    root = str(tmp_path / "ckpt")

    res1 = DedupPipeline(spark, cfg, checkpoint_root=root).run(files)
    first = sorted(
        (r["fid"], r["component"]) for r in res1.clusters.collect()
    )
    assert all(not m["resumed"] for m in res1.metrics)

    # simulate restart: new pipeline, same store root — stages must resume
    res2 = DedupPipeline(spark, cfg, checkpoint_root=root).run(files)
    second = sorted((r["fid"], r["component"]) for r in res2.clusters.collect())
    assert first == second
    resumed = {m["stage"]: m["resumed"] for m in res2.metrics}
    assert resumed["signatures"] and resumed["confirmed_pairs"] and resumed["components"]


def test_partial_resume_after_kill(spark, small_pdf, tmp_path):
    """Kill after stage 1 (only signatures checkpointed) → rerun completes
    from the checkpoint and matches a fresh end-to-end run."""
    import shutil, os

    files = corpus_to_spark(spark, small_pdf, 4)
    cfg = PipelineConfig()
    root = str(tmp_path / "ckpt2")

    full = DedupPipeline(spark, cfg, checkpoint_root=root).run(files)
    want = sorted((r["fid"], r["component"]) for r in full.clusters.collect())

    # "kill" after signatures: drop all later checkpoints
    for stage in ["band_buckets", "confirmed_pairs", "components"]:
        shutil.rmtree(os.path.join(root, stage), ignore_errors=True)

    res = DedupPipeline(spark, cfg, checkpoint_root=root).run(files)
    got = sorted((r["fid"], r["component"]) for r in res.clusters.collect())
    assert got == want
    resumed = {m["stage"]: m["resumed"] for m in res.metrics}
    assert resumed["signatures"] is True
    assert resumed["components"] is False


def test_changed_config_does_not_reuse(spark, small_pdf, tmp_path):
    files = corpus_to_spark(spark, small_pdf, 4)
    root = str(tmp_path / "ckpt3")
    DedupPipeline(spark, PipelineConfig(), checkpoint_root=root).run(files)
    res = DedupPipeline(
        spark, PipelineConfig(k_shingle=7), checkpoint_root=root
    ).run(files)
    assert all(not m["resumed"] for m in res.metrics)
