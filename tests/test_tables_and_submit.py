"""PagesTable interface (Parquet path) and the spark-submit --py-files flow."""

import json
import os
import subprocess

import pytest

from sketchlib.data.pages import generate_pages
from sketchlib.data.tables import PagesTable


@pytest.fixture(scope="module")
def table_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pagestable"))
    pdf = generate_pages(3000, seed=7, n_days=3)
    df = spark.createDataFrame(pdf)
    PagesTable(d).write(df, mode="overwrite")
    return d


def test_write_read_roundtrip(spark, table_dir):
    t = PagesTable(table_dir)
    df = t.read(spark)
    assert df.count() == 3000
    assert set(t.days(spark)) == {"2026-01-01", "2026-01-02", "2026-01-03"}


def test_partition_pruning_reaches_scan(spark, table_dir):
    t = PagesTable(table_dir)
    plan = t.read_partition(spark, lang="en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan


def test_iceberg_prefix_parsing():
    t = PagesTable("iceberg:prod.web.pages")
    assert t.is_iceberg and t.location == "prod.web.pages"
    assert not PagesTable("/data/pages").is_iceberg


def test_spark_submit_pyfiles(table_dir, tmp_path):
    """The actual spark-submit --py-files path the north rule names: package
    sketchlib.zip, submit pages_job from an empty cwd so only the zip
    provides the library."""
    zip_path = str(tmp_path / "sketchlib.zip")
    subprocess.run(["bash", "/root/repo/scripts/make_pyfiles.sh", zip_path],
                   check=True, capture_output=True, cwd="/root/repo")
    workdir = tmp_path / "empty"
    workdir.mkdir()
    out = tmp_path / "out"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zip_path,
         "/root/repo/sketchlib/jobs/pages_job.py",
         "--input", table_dir, "--checkpoint", str(tmp_path / "ckpt"),
         "--output", str(out), "--query", "distinct-urls"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(workdir))
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["days"] == 3 and summary["ran"] == 3
    assert os.path.exists(out / "_SUCCESS")
