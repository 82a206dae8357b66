"""The end-to-end example pipeline (CDC replay -> dedup -> filter ->
split -> partitioned write) runs and its invariants hold."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_example_pipeline_end_to_end(tiny_fixture, tmp_path):
    from training_data_pipeline import run_pipeline

    out = str(tmp_path / "out")
    counts = run_pipeline(os.path.join(tiny_fixture, "wal"),
                          os.path.join(tiny_fixture, "base"), out,
                          num_buckets=8,
                          benchmark_texts=[
                              "a long chain of reasoning was compressed "
                              "into three bullet points of evidence"])
    # the benchmark sentence appears in the fixture corpus → some docs
    # must have been decontaminated away
    assert counts["decontaminated"] > 0
    assert counts["replay_rows_out"] > 0
    assert 0 < counts["after_exact_dedup"] <= counts["replay_rows_out"]
    assert counts["after_filters"] <= counts["after_exact_dedup"]
    total_split = sum(counts[f"split_{n}"] for n in ("train", "val", "test"))
    assert total_split == counts["after_filters"]
    # partitioned, resumable layout: one directory per split
    for n in ("train", "val", "test"):
        files = glob.glob(os.path.join(out, "corpus", f"split={n}", "*.parquet"))
        assert (len(files) > 0) == (counts[f"split_{n}"] > 0)


def test_incremental_sync_example(tiny_fixture, tmp_path):
    """Change-feed consumer: a downstream mirror maintained purely from
    lake_diff feeds must equal the lake's final state."""
    from incremental_sync import run_sync

    out = str(tmp_path / "sync")
    res = run_sync(os.path.join(tiny_fixture, "wal"),
                   os.path.join(tiny_fixture, "base"), out, num_buckets=8)
    assert res["in_sync"] and res["commits"] == 2
    assert res["mirror_rows"] == res["lake_rows"] > 0
    assert res["update"] + res["delete"] > 0  # the feed did real work
