"""Broadcast-hint scale lint.

A forced ``F.broadcast(x)`` where ``x`` derives from an sf-scaled table
WITHOUT an intervening aggregation is a driver OOM at the 100 TB design
point: the hint overrides AQE's size check, so a table that fits at
sf0.1 is still force-collected to the driver at 1000x the data
(the a357 ``brands`` finding, round-4 verdict).  Broadcasting
nation/region (constant 25/5 rows) or any post-``Aggregate`` /
``Limit`` result (group-key-bounded) is fine.

Mechanical check, run per registered query that mentions ``F.broadcast``
in its source: parse the ANALYZED logical plan, locate every
``ResolvedHint (strategy=broadcast)`` subtree, and flag any sf-scaled
parquet relation inside it that has no Aggregate / GlobalLimit ancestor
between the hint and the scan.  Table identity is recovered from the
relation's column names (each fixture has a distinct column set).

CLI: ``python tools/lint_broadcast.py`` (builds the 105-ish broadcast
queries at sf0.001; ~1 min).  Pytest gate: tests/test_plans.py.
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, ".")

# Column-name markers that identify an sf-scaled fixture inside a
# Relation[...] line.  nation/region (n_/r_ columns) are constant-size
# and deliberately absent.
SF_SCALED_MARKERS = {
    "lineitem": ("l_orderkey", "l_quantity"),
    "orders": ("o_orderkey", "o_orderdate"),
    "customer": ("c_custkey", "c_acctbal"),
    "supplier": ("s_suppkey", "s_acctbal"),
    "part": ("p_partkey", "p_brand"),
    "events": ("event_id", "event_type"),
    "documents": ("doc_id", "n_chars"),
    "embeddings": ("vec_id", "embedding"),
}

# Nodes that bound a subtree's output to aggregate/group-key/limit size.
# Deliberately NOT Deduplicate: a PK-distinct is table-sized (the q154
# class).  A genuinely bounded side must show the bound in the plan —
# aggregate to a bounded group key, or add an explicit no-op .limit(n)
# (the q95 codebook pattern).
BOUNDING_NODES = ("Aggregate", "GlobalLimit", "LocalLimit")

# Documented exact all-pairs reference queries: they broadcast the whole
# (test-scale) corpus BY DESIGN as the oracle path, and each docstring
# names the banded/LSH variant that replaces it at 100 TB.  The scale
# path is a different registered query, not a different plan for these.
ALLOWLIST = {
    "q53_embedding_neardup": "exact all-pairs oracle; 100 TB path = q83/q266 banded",
    "q340_first_relevant_rank": "exact MRR reference; 100 TB path = q266 candidates",
}

_NODE_RE = re.compile(r"^[\s:+|-]*")


def _indent(line: str) -> int:
    """Depth of a plan line = offset where the node name starts."""
    return _NODE_RE.match(line).end()


def broadcast_violations(analyzed_plan: str) -> list[str]:
    """Return one message per sf-scaled relation forced into a broadcast
    hint without a bounding Aggregate/Limit ancestor inside the hint."""
    lines = analyzed_plan.splitlines()
    out: list[str] = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        hint_depth = _indent(line)
        # subtree = following lines while deeper than the hint
        j = i + 1
        sub: list[tuple[int, str]] = []
        while j < len(lines) and _indent(lines[j]) > hint_depth:
            sub.append((_indent(lines[j]), lines[j]))
            j += 1
        for k, (d_rel, rel_line) in enumerate(sub):
            if "Relation" not in rel_line:
                continue
            table = next(
                (
                    t
                    for t, marks in SF_SCALED_MARKERS.items()
                    if all(m in rel_line for m in marks)
                ),
                None,
            )
            if table is None:
                continue
            # bounded if some Aggregate/Limit strictly between the hint
            # and this relation sits at a shallower depth (an ancestor
            # on this branch, to tree-text approximation)
            bounded = any(
                d < d_rel and any(b in l.lstrip(" :+|-") for b in BOUNDING_NODES)
                for d, l in sub[:k]
            )
            if not bounded:
                out.append(
                    f"forced broadcast of sf-scaled table {table!r} "
                    "with no bounding Aggregate/Limit above the scan"
                )
    return out


def query_uses_broadcast(qdef) -> bool:
    try:
        return "F.broadcast" in inspect.getsource(qdef.fn)
    except (OSError, TypeError):
        return True  # can't prove it doesn't — check the plan


def main() -> int:
    from grouper_spark.queries import load_all
    from grouper_spark.session import get_spark

    spark = get_spark("lint-broadcast")
    sf_dir = "/root/testdata/sf0.001"
    bad: list[str] = []
    checked = 0
    for name, qdef in sorted(load_all().items()):
        if name in ALLOWLIST or not query_uses_broadcast(qdef):
            continue
        checked += 1
        plan = qdef.fn(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
        bad.extend(f"{name}: {v}" for v in broadcast_violations(plan))
    print(f"checked {checked} broadcast-using queries; {len(bad)} violations")
    for b in bad:
        print("  " + b)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
