"""Physical-plan audit: make the scale posture assertable.

The reference hand-manages its physical concerns (file sizes, open
writers, renames — HiveOrcSink.java:39,97,215). On Spark the physical
plan is Catalyst's, so "designed for 100 TB" is a property of the
PLAN, not the code: filters pushed into the scan, columns pruned,
small dims broadcast, no accidental cartesian products, hot paths in
whole-stage codegen. This module turns each of those into a checkable
predicate over `df.explain()` output, so tests can pin the plan shape
— not just the answer — for every headline query.

These parse the formatted explain text rather than walking the JVM
plan tree via py4j: the text format is the stable, documented surface
(`df.explain("formatted")`) and keeps this module version-tolerant.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text (physical plan + node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All data-source pushed filters (ORC/parquet `PushedFilters:`)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column names actually read by each file scan (`ReadSchema:`) —
    the column-pruning ground truth."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def _plan_tree(df: DataFrame) -> str:
    """Just the operator tree of the formatted plan (the details
    section repeats every node as `(N) OpName`, which would double-
    count node occurrences)."""
    text = formatted_plan(df)
    tree, _, _ = text.partition("\n\n")
    return tree


def count_nodes(df: DataFrame, pattern: str) -> int:
    """Occurrences of a physical-operator name in the plan tree."""
    return len(re.findall(pattern, _plan_tree(df)))


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) nodes — the scale-out cost driver.

    AQE may later coalesce partitions within an exchange, but each
    Exchange is still a full network redistribution of its input.
    """
    return count_nodes(df, r"\bExchange\b")


def has_broadcast_join(df: DataFrame) -> bool:
    return count_nodes(df, r"BroadcastHashJoin|BroadcastNestedLoopJoin") > 0


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an unconstrained cross product — at
    100 TB this is always a bug unless one side is tiny and bounded."""
    return count_nodes(df, r"CartesianProduct") > 0


def codegen_span_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans (formatted explain
    annotates fused nodes with `[codegen id : N]`). Fewer, wider spans
    = more of the plan fused into generated JVM code.

    Caveat: with AQE enabled the PRE-execution plan carries no codegen
    annotations (AdaptiveSparkPlan isFinalPlan=false) — this reads 0
    until the query has run; use on executed plans or with AQE off."""
    ids = re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))
    return len(set(ids))


def has_python_eval(df: DataFrame) -> bool:
    """True if any row-at-a-time Python UDF evaluation is in the plan
    (BatchEvalPython). ArrowEvalPython (pandas UDFs) is the sanctioned
    slow path and is NOT flagged."""
    return count_nodes(df, r"BatchEvalPython") > 0


# Functions expensive enough that re-evaluating one per array element
# inside a higher-order lambda turns O(n) work into O(n²) (VERDICT
# r3/r4: the `split()`-in-`transform` bug class recurred in two
# consecutive rounds despite documentation — commits ef3c584 and the
# r3 doc sites — so it is now a mechanical plan invariant).
EXPENSIVE_LAMBDA_FNS = (
    "split",
    "sentences",
    "sha2",
    "md5",
    "regexp_extract",
    "regexp_replace",
    "from_json",
)


def _balanced_regions(text: str, token: str) -> list[str]:
    """Every substring starting at an occurrence of `token` (which must
    end with '(') through its matching close paren."""
    out = []
    start = text.find(token)
    while start != -1:
        depth = 0
        for i in range(start + len(token) - 1, len(text)):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
                if depth == 0:
                    out.append(text[start : i + 1])
                    break
        start = text.find(token, start + 1)
    return out


def lambda_invariant_recomputes(
    df: DataFrame, fns: tuple[str, ...] = EXPENSIVE_LAMBDA_FNS
) -> list[str]:
    """Loop-invariant expensive calls inside higher-order-function
    lambdas — each one re-runs per ARRAY ELEMENT at execution time.

    Detection, over the ANALYZED plan text (stable across physical
    planning): inside every `lambdafunction(...)` region, an expensive
    call whose argument region references a column (`name#id`) but
    never a lambda variable (printed `lambda name#id`) cannot depend
    on the element being processed — its result is identical for every
    element and should have been materialized in a projection BEFORE
    the lambda (`withColumn("words", split(...))`). Calls over the
    lambda variable itself (`md5(lambda x#7)`) are per-element by
    nature and allowed."""
    text = df._jdf.queryExecution().analyzed().toString()
    hits: list[str] = []
    for body in set(_balanced_regions(text, "lambdafunction(")):
        for fn in fns:
            for call in _balanced_regions(body, fn + "("):
                arg = call[len(fn) + 1 : -1]
                if re.search(r"\w+#\d+", arg) and "lambda " not in arg:
                    snippet = call if len(call) <= 90 else call[:87] + "..."
                    hits.append(snippet)
    return sorted(set(hits))


def audit(df: DataFrame) -> dict:
    """One-call plan summary for logging / BENCH notes."""
    return {
        "shuffles": shuffle_count(df),
        "broadcast_join": has_broadcast_join(df),
        "cartesian": has_cartesian(df),
        "codegen_spans": codegen_span_count(df),
        "python_row_udf": has_python_eval(df),
        "pushed_filters": pushed_filters(df),
        "scan_schemas": scan_read_schemas(df),
        "lambda_recomputes": lambda_invariant_recomputes(df),
    }
