"""Scheme-aware filesystem helpers (JVM Hadoop FileSystem).

Driver-side artifact maintenance (index compaction sweeps, segment
discovery) must see hdfs:// and s3a:// roots the same way the Spark
reader does — os/glob only sees the driver's local disk and would
silently find nothing on a remote root.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_ls(spark: SparkSession, path, dirs_only: bool = False):
    """listStatus through the JVM Hadoop FileSystem. ``path`` is a
    string or a jvm Path; returns [] for a missing path."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path) if isinstance(path, str) else path
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    statuses = list(fs.listStatus(jpath))
    if dirs_only:
        statuses = [s for s in statuses if s.isDirectory()]
    return statuses
