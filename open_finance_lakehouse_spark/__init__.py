"""open_finance_lakehouse_spark — a from-scratch PySpark-native lakehouse
table-maintenance engine for audio clip + transcript tables.

Capabilities (see SURVEY.md for the blueprint and reference citations):

- a snapshot/manifest table format on Parquet ("frost" tables) with per-file
  min/max column stats, atomic commits, and time travel
  (``format/``);
- bin-packing small-file compaction, Z-order / Hilbert clustering,
  snapshot expiry + orphan GC, and salted copy-on-write MERGE INTO
  (``operators/``);
- vectorized Arrow/pandas kernels for audio codecs (PCM16 / mu-law / A-law),
  SNR verification, and space-filling-curve keys (``functions/``);
- a checkpoint + lineage ledger giving file-granularity resume (``plans/``);
- deterministic synthetic clip-table generation (``sources/``);
- a streaming maintenance-metrics lane (``streaming/``);
- a complete SQL front door (``sql.py``): SELECT over registered views,
  the DML triad (DELETE / UPDATE / MERGE INTO), INSERT INTO/OVERWRITE,
  table lifecycle (CREATE TABLE incl. CTAS, DROP TABLE PURGE), schema
  and property evolution (ALTER TABLE), and the maintenance statements
  (OPTIMIZE, VACUUM, DESCRIBE HISTORY/DETAIL, SHOW TBLPROPERTIES,
  RESTORE) — each lowered onto the engine primitives above.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the Apache Iceberg/Delta specs as published, and the reference
repo's *behavioral* contract (rmonteiro-pereira/Open-Finance-LakeHouse,
studied — not copied — at /root/reference).
"""

__version__ = "0.1.0"
