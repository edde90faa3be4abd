from open_finance_lakehouse_spark.quality.contracts import (  # noqa: F401
    Contract,
    ContractViolation,
    SchemaMismatch,
    tag_violations,
)
