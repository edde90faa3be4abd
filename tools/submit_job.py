"""spark-submit entry script: the north_rule packaging path.

Run with the engine shipped ONLY via --py-files (the script itself imports
the package from the shipped zip, proving workers and driver both resolve
it with no repo checkout on the cluster):

  ZIP=$(python -c "import sys; sys.path.insert(0, '.'); \\
      from open_finance_lakehouse_spark.session import package_zip; \\
      print(package_zip())")   # content-addressed name
  spark-submit --master local[2] --py-files "$ZIP" \\
      tools/submit_job.py --workdir /tmp/submit_demo --rows 300

Builds a clip table, runs the full maintenance pipeline with both gates,
prints ONE JSON line of metrics.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--rows", type=int, default=300)
    args = ap.parse_args()

    # imports resolve from the --py-files zip (driver + executors)
    from pyspark.sql import SparkSession

    from open_finance_lakehouse_spark.format.table import LakeTable
    from open_finance_lakehouse_spark.operators.pipeline import (
        run_maintenance,
    )
    from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger
    from open_finance_lakehouse_spark.sources.synth import (
        CLIP_SCHEMA_DDL,
        synth_clips,
    )

    spark = SparkSession.builder.getOrCreate()
    t = LakeTable.create(
        spark, f"{args.workdir}/clips", "clips", CLIP_SCHEMA_DDL,
        partition_spec={"kind": "bucket", "column": "clip_id",
                        "num_buckets": 2},
    )
    t.append(synth_clips(spark, args.rows, dur_max_ms=800),
             max_records_per_file=16)
    m = run_maintenance(
        t, CheckpointLedger(f"{args.workdir}/ledger"), job_id="submit-demo",
        target_bytes=2 * 1024 * 1024, snr_gate="overlap", parity_gate=True,
        gc_grace_ms=0, with_audit=True)
    print(json.dumps({
        "clips": m["clips"], "engine_ms": m["engine_ms"],
        "snr_violations": m["gates"].get("snr_violations"),
        "parity_violations": m["gates"].get("parity_violations"),
        "rows_after": m["table_audit"]["rows"],
    }))


if __name__ == "__main__":
    main()
