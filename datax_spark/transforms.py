"""Row-transform library — DataX's transformer registry as native Column exprs.

The reference executes a per-record chain of scalar transformers between
reader and channel (core/src/main/java/com/alibaba/datax/core/transport/
exchanger/BufferedRecordTransformerExchanger.java:84-104; chain logic
TransformerExchanger.java:53-127).  The complete built-in registry is six
functions (core/.../transport/transformer/TransformerRegistry.java:34-39):
dx_substr, dx_pad, dx_replace, dx_filter, dx_digest, dx_groovy.

Here each becomes a **Column-expression builder** — the whole chain stays
inside Catalyst/WholeStageCodegen, so a "transformer chain" is a zero-cost
`select`, not a per-row Python loop (SURVEY.md §7.4 risk 4 mandates: no
BatchEvalPython nodes; enforced by datax_spark.plans.checks).

The dx_groovy escape hatch (GroovyTransformer.java:25-88 — arbitrary user
code compiled once) maps to an Arrow-vectorized pandas UDF registry: the only
sanctioned way to run user Python, batch-at-a-time, never row-at-a-time.

Semantics notes mirrored from the reference:
- dx_substr (SubstrTransformer.java:21-64): 0-based start; null passes
  through; start beyond string length is a dirty record (here: null +
  optional strict mode raises at plan time where statically known).
- dx_pad (PadTransformer.java:21-89): pad to length or truncate; null → "".
- dx_replace (ReplaceTransformer.java:21-65): splice-replace [start,
  start+len) with repl.
- dx_filter (FilterTransformer.java:20-311): like/not_like are **Java regex
  full-match**, not SQL LIKE; numeric compare for numeric columns, string
  compare otherwise; null never matches </>.
- dx_digest (DigestTransformer.java:32-85): md5/sha1 hex, case-folded;
  null hashes as "".
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ------------------------------------------------------------------ builders
def dx_substr(col: str | Column, start: int, length: int) -> Column:
    """Substring [start, start+length), 0-based (SubstrTransformer.java:21-64).

    Null passes through; start past end yields null (the reference routes the
    row to the dirty collector — pair with a quarantine predicate if needed).
    """
    c = _c(col)
    out = F.substring(c, start + 1, length)
    return F.when(c.isNull(), F.lit(None)).when(
        F.length(c) < F.lit(start), F.lit(None)
    ).otherwise(out)


def dx_pad(col: str | Column, side: str, length: int, pad: str) -> Column:
    """Pad to ``length`` (truncating if longer); null → "" first
    (PadTransformer.java:21-89)."""
    if side not in ("l", "r"):
        raise ValueError("side must be 'l' or 'r'")
    c = F.coalesce(_c(col), F.lit(""))
    return (F.lpad if side == "l" else F.rpad)(c, length, pad)


def dx_replace(col: str | Column, start: int, length: int, replace: str) -> Column:
    """Splice-replace the 0-based range [start, start+length)
    (ReplaceTransformer.java:21-65)."""
    c = _c(col)
    head = F.substring(c, 1, start)
    tail = F.substring(c, start + length + 1, 1 << 30)  # "" when past end
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.concat(head, F.lit(replace), tail)
    )


_FILTER_OPS = {">", "<", ">=", "<=", "=", "!=", "like", "not like"}


def dx_filter_predicate(col: str | Column, op: str, value: Any) -> Column:
    """TRUE where the reference would DROP the row (FilterTransformer.java:20-311).

    Apply as ``df.filter(~dx_filter_predicate(...))`` to keep the survivors —
    matching the reference's drop-on-match contract
    (TransformerExchanger.java:102-109 treats null return as filtered).
    """
    if op not in _FILTER_OPS:
        raise ValueError(f"unknown filter op {op!r}")
    c = _c(col)
    if op == "like":  # Java String.matches == full-anchored regex
        return c.isNotNull() & c.rlike(f"^(?:{value})$")
    if op == "not like":
        return c.isNotNull() & ~c.rlike(f"^(?:{value})$")
    v = F.lit(value)
    if op == "=":
        # reference quirk: = "null" matches SQL NULL (FilterTransformer.java:205-212)
        return c.isNull() if value == "null" else (c == v)
    if op == "!=":
        return c.isNotNull() if value == "null" else (c != v)
    cmp = {">": c > v, "<": c < v, ">=": c >= v, "<=": c <= v}[op]
    return cmp  # null never matches </> — Spark 3VL gives exactly this


def dx_filter(df: DataFrame, col: str | Column, op: str, value: Any) -> DataFrame:
    return df.filter(~dx_filter_predicate(col, op, value))


_DIGESTS: dict[str, Callable[[Column], Column]] = {
    "md5": F.md5,
    "sha1": F.sha1,
    "sha256": lambda c: F.sha2(c, 256),  # our content-parity invariant
}


def dx_digest(col: str | Column, algo: str = "md5", case: str = "toLower") -> Column:
    """Hex digest, case-folded; null hashes as "" (DigestTransformer.java:32-85)."""
    if algo not in _DIGESTS:
        raise ValueError(f"unknown digest {algo!r}")
    h = _DIGESTS[algo](F.coalesce(_c(col), F.lit("")))
    return F.upper(h) if case == "toUpper" else F.lower(h)


def content_sha256(col: str | Column = "content") -> Column:
    """The BASELINE.json per-row invariant: sha256 of content (utf-8)."""
    return F.sha2(F.coalesce(_c(col), F.lit("")).cast("string"), 256)


# ---------------------------------------------------------------- registry
class TransformerRegistry:
    """Config-driven transform chain ≈ DataX job transformer list
    (TransformerRegistry.java:34-105; external/registered UDFs :42-105).

    A spec is ``{"name": "dx_substr", "column": "path", "parameters":
    [0, 8]}`` (optionally ``"as": "out_col"``); dx_filter specs drop rows.
    Registered pandas UDFs (the dx_groovy analogue) must be created with
    ``pyspark.sql.functions.pandas_udf`` — Arrow-vectorized by construction.
    """

    def __init__(self) -> None:
        self._fns: dict[str, Callable[..., Column]] = {
            "dx_substr": dx_substr,
            "dx_pad": dx_pad,
            "dx_replace": dx_replace,
            "dx_digest": dx_digest,
        }
        self._udfs: dict[str, Callable[..., Column]] = {}

    def register_pandas_udf(self, name: str, udf: Callable[..., Column]) -> None:
        """Register a vectorized UDF (must be a pandas_udf — checked)."""
        returned = getattr(udf, "evalType", None)
        # pandas_udf wrappers expose evalType; 200=SQL_SCALAR_PANDAS_UDF,
        # 201=ITER variant. Plain Python UDFs (100) are rejected: per-row
        # Python is banned (SURVEY.md §7.4 / BASELINE.json input_hint).
        if returned is not None and int(returned) == 100:
            raise ValueError(f"{name}: plain python UDF rejected; use pandas_udf")
        self._udfs[name] = udf

    def column(self, spec: dict) -> Column:
        name = spec["name"]
        params = spec.get("parameters", [])
        if name in self._fns:
            return self._fns[name](spec["column"], *params)
        if name in self._udfs:
            return self._udfs[name](F.col(spec["column"]), *params)
        raise KeyError(f"unknown transformer {name!r}")

    def apply_chain(self, df: DataFrame, specs: list[dict]) -> DataFrame:
        """Apply a transformer chain; filter specs drop rows, others rewrite
        (or add, with "as") a column — all in one Catalyst plan."""
        for spec in specs:
            if spec["name"] == "dx_filter":
                df = dx_filter(df, spec["column"], *spec.get("parameters", []))
            else:
                out = spec.get("as", spec["column"])
                df = df.withColumn(out, self.column(spec))
        return df
