"""Integration test for the spark-submit entry point: fresh run, resumed
run (all buckets skipped), and output readability."""

import json
import os
import subprocess
import sys


def test_run_extract_cli_resume(tmp_path):
    out_dir = str(tmp_path / "features")
    cmd = [
        sys.executable, "tools/run_extract.py",
        "--input", "/root/testdata/sf0.001",
        "--output", out_dir,
        "--cutoffs", "2024-01-08 00:00:00", "2024-01-22 00:00:00",
        "--families", "stats", "shape",
        "--resume", "--buckets", "3", "--cores", "4",
    ]
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=1800, env=env, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads([l for l in r1.stdout.splitlines() if l.startswith("{")][-1])
    assert m1["run"]["computed"] == 3 and m1["run"]["skipped"] == 0
    assert m1["run"]["rows_written"] > 0
    assert m1["skew"]["n_convs"] > 0

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=1800, env=env, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert m2["run"]["computed"] == 0 and m2["run"]["skipped"] == 3

    import pandas as pd
    parts = [p for p in os.listdir(out_dir) if p.startswith("bucket=")]
    assert len(parts) == 3
    df = pd.concat(
        pd.read_parquet(os.path.join(out_dir, p)) for p in parts
    )
    assert len(df) == m1["run"]["rows_written"]
    assert "stat_mean" in df.columns and "shape_n_sessions" in df.columns


def test_run_curation_cli_and_resume(tmp_path):
    import json
    import subprocess
    import sys

    out = str(tmp_path / "curated")
    cmd = [
        sys.executable, "tools/run_curation.py",
        "--input", "/root/testdata/sf0.001",
        "--output", out,
        "--budget", "500",
        "--cores", "4",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    c = m["counts"]
    # monotone pipeline: each stage only drops rows; output is complete
    assert c["input"] >= c["after_quality"] >= c["after_dedup"] >= c["after_decontamination"]
    assert c["written"] == c["after_decontamination"] > 0
    assert set(c["per_split"]) <= {"train", "val", "test"}
    assert sum(c["per_split"].values()) == c["written"]

    # resume: unchanged input + params -> skipped without recompute
    r2 = subprocess.run(cmd + ["--resume"], capture_output=True, text=True,
                        cwd="/root/repo", timeout=1800)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2.get("skipped") is True


def test_run_curation_cli_full_stages(tmp_path):
    """All optional stages on at once: dup-span gate, DSIR floor,
    domain-mixture sampling. Counts stay monotone through the added
    stages and the manifest records the stage parameters."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "curated_full")
    cmd = [
        sys.executable, "tools/run_curation.py",
        "--input", "/root/testdata/sf0.001",
        "--output", out,
        "--budget", "500",
        "--cores", "4",
        "--max-dup-span-frac", "0.8",
        "--min-classifier-prob", "0.01",
        "--max-ppl", "1000000",
        "--lm", "bigram",
        "--dsir-target-sources", "src0,src1",
        "--dsir-min-logw", "-1000000",
        "--mix", "src0:3,src1:1,src2:1,src3:1,src4:1,src5:1,src6:1,"
                 "src7:1,src8:1,src9:1,src10:1,src11:1,src12:1,src13:1,"
                 "src14:1,src15:1,src16:1,src17:1,src18:1,src19:1",
        "--mix-budget", "0.8",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    c = m["counts"]
    assert (
        c["input"] >= c["after_quality"] >= c["after_dedup"]
        >= c["after_decontamination"] >= c["after_dsir"] >= c["after_mix"]
    )
    assert c["written"] == c["after_mix"] > 0
    assert m["params"]["max_dup_span_frac"] == 0.8
    assert m["params"]["mix_budget"] == 0.8
    assert m["params"]["min_classifier_prob"] == 0.01
    assert m["params"]["max_ppl"] == 1000000 and m["params"]["lm"] == "bigram"


def test_run_curation_cli_survivor_policy_longest(tmp_path):
    """--near-dup with --survivor-policy longest keeps the longest
    cluster member instead of the smallest id; the manifest records the
    policy and the count stays monotone."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "curated_surv")
    cmd = [
        sys.executable, "tools/run_curation.py",
        "--input", "/root/testdata/sf0.001",
        "--output", out,
        "--budget", "500",
        "--cores", "4",
        "--near-dup",
        "--survivor-policy", "longest",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["params"]["survivor_policy"] == "longest"
    c = m["counts"]
    assert c["input"] >= c["after_quality"] >= c["after_dedup"] > 0
