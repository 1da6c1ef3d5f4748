"""spark-submit job entries: run main() in-process (they reuse the active
test session and must not stop it)."""

import json

from pyspark.sql import SparkSession


def test_build_filter_cli(spark, tmp_path, capsys):
    from sparksketch.jobs.build_filter import main
    rc = main(["--synthetic", "3000", "--n-shards", "8", "--partitions", "4",
               "--expected-keys", "3000",
               "--checkpoint-dir", str(tmp_path / "chk"),
               "--output", str(tmp_path / "f.bin")])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    m = json.loads(out)
    assert m["rows"] == 3000 and m["key_count"] == 3000
    assert m["docs_per_sec"] > 0 and m["blob_bytes"] > 0
    assert (tmp_path / "f.bin").exists()
    # the job must not have torn down the shared test session
    assert SparkSession.getActiveSession() is not None
    assert spark.range(1).count() == 1


def test_pipeline_cli(spark, tmp_path, capsys):
    from sparksketch.jobs.pipeline import main
    rc = main(["--synthetic", "3000", "--n-shards", "8",
               "--output-filter", str(tmp_path / "p.bin")])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    m = json.loads(out)
    assert m["stages"]["input_rows"] == 3000
    assert m["stages"]["extraction_mismatches"] == 0
    # synthetic urls are already canonical/unique → canon dedup is a no-op
    assert m["stages"]["after_url_canon_dedup"] == m["stages"]["after_key_guard"]
    assert m["bloom"]["key_count"] == m["stages"]["after_host_quota"]
    assert m["stages"]["after_host_quota"] <= m["stages"]["after_near_dedup"]
    assert "train_docs_flagged" in m.get("decontamination", {})
    assert SparkSession.getActiveSession() is not None
