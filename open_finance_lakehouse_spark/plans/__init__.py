from open_finance_lakehouse_spark.plans.ledger import (  # noqa: F401
    CheckpointLedger,
    CheckpointRecord,
    file_set_hash,
)
