"""A from-scratch snapshot/manifest table format on Parquet ("frost").

No Iceberg/Delta jars exist in this environment, so the engine carries its
own minimal table format with the same guarantees the maintenance operators
need: immutable data files, per-file min/max column stats in Parquet
manifests, snapshot isolation via atomic metadata swaps, time travel,
optimistic-concurrency rewrites, snapshot expiry and orphan GC.
"""

from open_finance_lakehouse_spark.format.table import (  # noqa: F401
    CommitConflict,
    LakeTable,
)
