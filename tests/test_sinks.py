"""Partitioned organize sinks (S12): category directories exist and
downstream reads prune partitions at the scan."""

import os

from codedup.sinks import read_partition, write_actions, write_members


def test_partitioned_actions_sink_prunes(spark, run_tiny, tmp_path):
    out = str(tmp_path / "actions_by_action")
    write_actions(run_tiny.actions, out)
    cats = {d.split("=")[1] for d in os.listdir(out) if d.startswith("action=")}
    assert "keep" in cats and ("dedup" in cats or "review" in cats)

    df = read_partition(spark, out, "action", "keep")
    assert df.count() == run_tiny.actions.filter("action = 'keep'").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition pruning, not a post-scan filter on a data column
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters:")[1][:200]
    assert "action" in seg


def test_partitioned_members_sink_by_lang(spark, run_tiny, tmp_path):
    out = str(tmp_path / "members_by_lang")
    write_members(run_tiny.members, out)
    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(langs) >= 2
    total = sum(read_partition(spark, out, "lang", d.split("=")[1]).count()
                for d in langs)
    assert total == run_tiny.members.count()
