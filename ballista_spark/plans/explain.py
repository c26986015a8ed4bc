"""Plan introspection — the EXPLAIN surface plus plan-quality assertions.

Reference parity: ``ExplainNode`` (ballista.proto:250-253) and the stage
diagnostics the reference printed (``rust/core/src/utils.rs:96-165``,
``produce_diagram`` utils.rs:190-212).  On Spark the physical plan already
carries everything we need; this module parses the formatted explain output
into a structured summary so tests (and humans) can assert the plan *shape*:
filters pushed to the scan, pruned read schemas, broadcast vs shuffle joins,
exchange counts.

This is the 100 TB feedback loop: a query whose summary shows an un-pushed
filter or a needless exchange is wrong at scale even when its rows are right.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The EXPLAIN string (simple/extended/codegen/cost/formatted)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanSummary:
    """Structured view of a physical plan's scale-relevant traits."""

    scans: list[dict] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    has_aqe: bool = False
    codegen_ids: int = 0

    @property
    def n_shuffles(self) -> int:
        return self.n_exchanges - self.n_broadcast_exchanges

    def scan_for(self, table_substr: str) -> dict | None:
        for s in self.scans:
            if table_substr in s.get("location", ""):
                return s
        return None


_SCAN_RE = re.compile(r"Scan parquet[^\n]*")
_JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_summary(df: DataFrame) -> PlanSummary:
    """Parse ``explain formatted`` into a :class:`PlanSummary`."""
    text = explain_text(df, "formatted")
    out = PlanSummary()
    out.has_aqe = "AdaptiveSparkPlan" in text
    out.codegen_ids = len(set(re.findall(r"codegen id : (\d+)", text)))
    for kind in _JOIN_KINDS:
        out.joins += [kind] * len(re.findall(rf"\b{kind}\b", text))
    # count operators from the formatted list lines "(n) OperatorName"
    ops = re.findall(r"^\s*\(\d+\)\s+([A-Za-z]+)", text, re.MULTILINE)
    out.n_broadcast_exchanges = sum(1 for o in ops if o == "BroadcastExchange")
    out.n_exchanges = sum(1 for o in ops if o == "Exchange") + out.n_broadcast_exchanges

    # per-scan detail blocks: "(1) Scan parquet \n Output [..] ... Location ...
    for block in re.split(r"\n\s*\(\d+\)\s+", text):
        if not block.startswith("Scan parquet"):
            continue
        scan: dict = {}
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        scan["location"] = loc.group(1) if loc else ""
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        scan["pushed_filters"] = (
            [p.strip() for p in pushed.group(1).split(",") if p.strip()] if pushed else []
        )
        rs = re.search(r"ReadSchema: struct<([^>]*)>", block)
        scan["read_schema"] = (
            [c.split(":")[0].strip() for c in rs.group(1).split(",") if c.strip()]
            if rs
            else []
        )
        out.scans.append(scan)
    return out


def executed_plan_text(df: DataFrame) -> str:
    """The AQE-final executed plan (run the query first — ``isFinalPlan``
    only becomes true after execution).  This is where WholeStageCodegen
    spans and the chosen join strategies are visible, unlike the
    pre-execution formatted plan."""
    df.foreach(lambda _: None)  # execute without collecting to the driver
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


def codegen_span_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the executed plan
    (the ``*(n)`` operator prefixes) — the 'widen these' metric from the
    100 TB guidance.  0 means the plan fell out of codegen entirely."""
    text = executed_plan_text(df)
    final = text.split("== Initial Plan ==")[0]
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def plan_dot(df: DataFrame) -> str:
    """GraphViz DOT rendering of the physical plan tree — the analog of the
    reference's ``produce_diagram`` (rust/core/src/utils.rs:190-212), which
    emitted dot for its query-stage DAG."""
    text = explain_text(df, "formatted")
    tree = text.split("\n\n")[0].splitlines()
    nodes: list[tuple[int, int, str]] = []  # (depth, id, label)
    for line in tree:
        m = re.match(r"^([ :+*-]*)\s*(?:\* )?([A-Za-z][A-Za-z0-9 ]*?) \((\d+)\)", line)
        if not m:
            continue
        indent, label, nid = m.groups()
        nodes.append((len(indent), int(nid), label.strip()))
    out = ["digraph physical_plan {", "  node [shape=box];"]
    for _, nid, label in nodes:
        out.append(f'  n{nid} [label="{label} ({nid})"];')
    stack: list[tuple[int, int]] = []  # (depth, id)
    for depth, nid, _ in nodes:
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            out.append(f"  n{nid} -> n{stack[-1][1]};")
        stack.append((depth, nid))
    out.append("}")
    return "\n".join(out)
