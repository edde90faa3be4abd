"""Write-time data contracts: declarative per-table checks enforced at
``LakeTable.append``.

The reference validates EVERY bronze frame before it is written — a Pandera
schema per table pinning dtypes, non-null keys, in-batch uniqueness, and
value bounds, enforced in the landing path so bad data never reaches a
committed file (/root/reference/ofl/quality/contracts.py:11-33, applied at
/root/reference/ofl/ingestion/landing.py:60-70). The frost equivalent:

- a ``Contract`` is declared at table-create time and travels in the table
  PROPERTIES (JSON), so every writer — CLI, pipeline, streaming sink —
  enforces the same rules without passing objects around;
- dtype conformance is checked at PLAN time (no job): the batch's schema
  must match the table DDL by name and type;
- row rules (non-null key, unique-in-batch, bounds, allowed values) tag
  each row with its first violated rule — one Spark job, shuffle only if a
  uniqueness rule exists — then the writer either REJECTS the batch
  (default: raise, nothing committed) or splits violators to a DEAD-LETTER
  table (both commits carrying the same summary, good rows proceed).

The violation tag is a *column* so the split is one filter — the same
validity-travels-with-the-row shape the streaming lane uses (P3/P4).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PROPERTY_KEY = "contract"
VIOLATION_COL = "_violation"


class SchemaMismatch(Exception):
    """Batch schema does not match the table DDL (plan-time check)."""


class ContractViolation(Exception):
    """Row rules failed in reject mode; carries a sample of violators."""

    def __init__(self, message: str, sample: list[dict]):
        super().__init__(message)
        self.sample = sample


@dataclass
class Contract:
    not_null: list[str] = field(default_factory=list)
    unique: list[str] = field(default_factory=list)   # in-batch key combo
    bounds: dict[str, list] = field(default_factory=dict)  # col -> [lo, hi]
    allowed: dict[str, list] = field(default_factory=dict)  # col -> values
    checks: dict[str, str] = field(default_factory=dict)  # name -> bool SQL

    def empty(self) -> bool:
        return not (self.not_null or self.unique or self.bounds
                    or self.allowed or self.checks)

    def to_property(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    def _validate_shape(self) -> None:
        """Value-shape check beyond the constructor's key check: a
        contract with ``"bounds": 5`` constructs fine and only explodes
        inside ``tag_violations`` — at the first WRITE, with an
        AttributeError that names neither the property nor the rule."""
        def all_str(xs):
            return isinstance(xs, list) and all(
                isinstance(x, str) for x in xs)

        if not (all_str(self.not_null) and all_str(self.unique)):
            raise ValueError("not_null/unique must be lists of column "
                             "names")
        if not (isinstance(self.bounds, dict) and all(
                isinstance(v, list) and len(v) == 2
                for v in self.bounds.values())):
            raise ValueError('bounds must map column -> [lo, hi]')
        if not (isinstance(self.allowed, dict) and all(
                isinstance(v, list) for v in self.allowed.values())):
            raise ValueError("allowed must map column -> list of values")
        if not (isinstance(self.checks, dict) and all(
                isinstance(k, str) and isinstance(v, str) and v.strip()
                for k, v in self.checks.items())):
            raise ValueError("checks must map constraint name -> boolean "
                             "SQL expression")

    @staticmethod
    def from_properties(properties: dict) -> "Contract | None":
        raw = (properties or {}).get(PROPERTY_KEY)
        if not raw:
            return None
        # a malformed property must explain ITSELF: the raw JSONDecodeError
        # surfaces at the first WRITE after the bad SET — far from the
        # statement that caused it — and names neither the property nor
        # the expected shape
        try:
            c = Contract(**json.loads(raw))
            c._validate_shape()
            return c
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"table property {PROPERTY_KEY!r} is not a valid contract: "
                f"{e}. Expected JSON like "
                '\'{"not_null": ["clip_id"], "unique": ["clip_id"], '
                '"bounds": {"sr_hz": [1, 192000]}, '
                '"allowed": {"codec": ["pcm", "opus"]}, '
                '"checks": {"dur_positive": "dur_ms > 0"}}\' '
                f"(got {raw[:120]!r})") from e


def check_schema(df: DataFrame, table_schema) -> None:
    """Name+type conformance, order-insensitive; nothing runs on the
    cluster. Nullability is a row rule (``not_null``), not a dtype one."""
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in table_schema.fields}
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        drift = sorted(n for n in set(got) & set(want) if got[n] != want[n])
        raise SchemaMismatch(
            f"batch schema != table DDL: missing={missing} extra={extra} "
            f"type_drift={[(n, got[n], want[n]) for n in drift]}")


def tag_violations(df: DataFrame, contract: Contract) -> DataFrame:
    """Adds ``_violation`` (first failed rule name, else NULL)."""
    reasons = []
    for c in contract.not_null:
        reasons.append(F.when(F.col(c).isNull(), F.lit(f"not_null:{c}")))
    for c, (lo, hi) in contract.bounds.items():
        reasons.append(F.when(
            F.col(c).isNotNull()
            & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
            F.lit(f"bounds:{c}")))
    for c, values in contract.allowed.items():
        reasons.append(F.when(
            F.col(c).isNotNull() & ~F.col(c).isin(list(values)),
            F.lit(f"allowed:{c}")))
    # CHECK constraints (ALTER TABLE ... ADD CONSTRAINT name CHECK (expr)):
    # violated only when the expression evaluates to exactly FALSE — a
    # NULL result passes, consistent with bounds/allowed above (require
    # values via not_null). Sorted iteration keeps the "first violated
    # rule" tag deterministic across runs.
    for cname in sorted(contract.checks):
        reasons.append(F.when(
            F.expr(f"({contract.checks[cname]})") == F.lit(False),
            F.lit(f"check:{cname}")))
    out = df
    if contract.unique:
        w = Window.partitionBy(*contract.unique)
        out = out.withColumn("__key_n", F.count(F.lit(1)).over(w))
        reasons.append(F.when(
            F.col("__key_n") > 1,
            F.lit("unique:" + ",".join(contract.unique))))
    reason = F.coalesce(*reasons) if reasons else F.lit(None).cast("string")
    out = out.withColumn(VIOLATION_COL, reason)
    return out.drop("__key_n") if contract.unique else out
