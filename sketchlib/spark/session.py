"""Tuned SparkSession builder for sketch workloads.

Encodes the settings this repo measured to matter (BENCH/BASELINE.md):

* ``maxPartitionBytes`` 32 MB — mapInArrow tasks pay a fixed ~0.2 s
  JVM<->Python cost; tasks must carry >= ~300k rows to amortize it, but
  stay small enough to keep all cores busy at bench scale;
* Arrow ``maxRecordsPerBatch`` 200k — fewer, larger IPC batches;
* AQE on — coalesces the sketch-blob shuffle and splits stragglers;
* ``spark.rdd.compress`` on — DISK_ONLY stage boundaries (corpus job)
  store serialized blocks; uncompressed, a text corpus persisted at a
  boundary is ~4-5x its parquet size and can exhaust local disk (measured:
  the 24M-row e2e bench ran out of /tmp without it).  LZ4 block compression
  costs ~nothing against the IO it saves.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(app: str, local_cpus: str | int | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    b = SparkSession.builder.appName(app)
    if local_cpus:
        b = b.master(f"local[{local_cpus}]")
        shuffle_partitions = shuffle_partitions or int(local_cpus)
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = (b.config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.rdd.compress", "true"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
