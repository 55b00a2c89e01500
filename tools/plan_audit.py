"""Generate PLANS.md: a physical-plan audit of every catalog query.

For each query the audit records the scale-relevant plan facts —
number of exchanges (shuffles), join strategies chosen, whether scans
carry pushed filters, and how many whole-stage-codegen spans cover the
plan.  Re-run after any operator change:

    python tools/plan_audit.py            # writes PLANS.md at repo root

The table is the reviewable record that each certified plan is the one
we'd want on a 1000-executor cluster — broadcast where a side is small,
no accidental cartesians, filters reaching the parquet scan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_podcast_etl_spark.plans.catalog import CATALOG  # noqa: E402
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: The ONLY queries allowed a BroadcastNestedLoopJoin, with the reason
#: each is sanctioned (r8 VERDICT "what's wrong" #1: the review rule
#: must be mechanically checkable).  Two sanctioned shapes exist:
#: broadcast ANN scorers (a small query/probe side broadcast against
#: the corpus — the exact arm several recall audits compose), and
#: one-row scalar attaches (a 1-row aggregate broadcast to every row —
#: safe at any scale).  main() FAILS if bnlj appears anywhere else, or
#: if any plan contains a CartesianProduct.
BNLJ_WHITELIST: dict[str, str] = {
    "q22_ann_topk": "broadcast ANN scorer (queries broadcast vs corpus)",
    "q23_embedding_neardup": "guarded exact pair scorer (size-capped)",
    "q55_quantized_ann_topk": "broadcast ANN scorer (IVF probe)",
    "q60_ann_recall": "composes q22's exact arm",
    "q62_ann_recall_panel": "composes q22's exact arm (ground truth)",
    "q80_unigram_lm_scores": (
        "one-row totals scalar attach (functions/textstats.py)"
    ),
    "q119_codebook_drift": (
        "one-row totals scalar attach onto the ≤k-row drift report "
        "(operators/similarity.py trained_ivf_drift_report — the q80 "
        "pattern; both sides bounded by the codebook size)"
    ),
    "q121_hybrid_rrf": (
        "composes q22's exact arm (the dense retriever of the RRF "
        "fusion — probes broadcast vs corpus)"
    ),
}


def _count_nodes(plan: str, node: str) -> int:
    # formatted plans print each node twice (tree + detail); count the
    # numbered detail headers only, e.g. "(3) Exchange"
    return len(re.findall(rf"^\(\d+\) {node}\b", plan, flags=re.M))


def audit_one(plan: str, codegen_plan: str) -> dict[str, object]:
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen_plan)
    return {
        # AQE's formatted plan is pre-execution and carries no codegen
        # ids — the `codegen` explain mode reports subtree count
        "codegen_spans": int(m.group(1)) if m else 0,
        "exchanges": _count_nodes(plan, "Exchange"),
        "bhj": _count_nodes(plan, "BroadcastHashJoin"),
        "smj": _count_nodes(plan, "SortMergeJoin"),
        "bnlj": _count_nodes(plan, "BroadcastNestedLoopJoin"),
        "cartesian": _count_nodes(plan, "CartesianProduct"),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]", plan)
        ),
        "python_stages": (
            _count_nodes(plan, "ArrowEvalPython")
            + _count_nodes(plan, "MapInPandas")
            + _count_nodes(plan, "FlatMapGroupsInPandas")
            + _count_nodes(plan, "BatchEvalPython")
        ),
    }


def main() -> None:
    spark = get_spark(
        app_name="plan-audit", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Audit the STATIC plan: AQE wraps unexecuted plans in
    # AdaptiveSparkPlan, hiding codegen ids and join choices until
    # runtime.  AQE only improves on what's recorded here (runtime
    # coalesce, skew-split, smj→bhj demotion).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rows = []
    for name in sorted(CATALOG):
        df = CATALOG[name].fn(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        plan = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")
        codegen_plan = spark._jvm.PythonSQLUtils.explainString(qe, "codegen")
        rows.append((name, audit_one(plan, codegen_plan)))

    # Iterative-loop interior: q48/q49's table rows show ~0 exchanges
    # because every iteration ends in an eager checkpoint that
    # truncates the static plan to an RDD scan — the numbers above
    # audit the POST-loop stitching, not the loop.  Reconstruct one
    # min-label + pointer-jump iteration pre-checkpoint (the factored
    # dedup._cc_min_label_step) over the same LSH pair source q48 uses
    # and audit that — the plan that actually runs once per round.
    from pyspark.sql import functions as F  # noqa: E402

    from serverless_podcast_etl_spark.operators import dedup  # noqa: E402

    pairs = CATALOG["q30_minhash_lsh_neardup"].fn(spark, SF_DIR)
    sym = pairs.select(F.col("id_a").alias("_a"), F.col("id_b").alias("_b"))
    edges = (
        sym.union(sym.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("_a").alias("_id"))
        .distinct()
        .withColumn("_comp", F.col("_id"))
        .localCheckpoint(eager=True)
    )
    step = dedup._cc_min_label_step(edges, labels)
    qe = step._jdf.queryExecution()
    rows.append(
        (
            "q48_neardup_clusters[per-iteration]",
            audit_one(
                spark._jvm.PythonSQLUtils.explainString(qe, "formatted"),
                spark._jvm.PythonSQLUtils.explainString(qe, "codegen"),
            ),
        )
    )

    out = [
        "# Physical-plan audit (generated by tools/plan_audit.py)",
        "",
        f"Scale facts per catalog query at `{SF_DIR}` — shuffle count,",
        "join strategy, filter pushdown, codegen coverage, Python stages.",
        "Static (pre-AQE) plans: at runtime AQE additionally coalesces",
        "post-shuffle partitions and splits skewed joins.",
        "Regenerate after operator changes; reviewed facts:",
        "",
        "- `cartesian` must be 0 everywhere.",
        "- `bnlj` > 0 only at whitelisted queries (BNLJ_WHITELIST in",
        "  tools/plan_audit.py): the broadcast ANN scorers (q22/q23/",
        "  q55, and q60/q62 which compose q22's exact arm) and",
        "  documented one-row scalar broadcasts (q80's corpus-totals",
        "  attach and q119's drift-report totals — a 1-row frame",
        "  broadcast to every row, safe at any",
        "  scale).  ENFORCED MECHANICALLY: the generator fails on any",
        "  non-whitelisted bnlj or any cartesian, so a table that",
        "  exists at all satisfies both rules.",
        "- `python` > 0 only where the operator is genuinely",
        "  non-expressible in JVM expressions (tokenizer/decode seams,",
        "  numpy matmul kernels: ANN scoring, LSH table hashing, IVF",
        "  assignment; EWMA recursion, sampling).",
        "- iterative queries (q48/q49) additionally get a",
        "  `[per-iteration]` row auditing ONE loop iteration's",
        "  pre-checkpoint plan — their main rows show the post-loop",
        "  stitching only, because the per-iteration eager checkpoint",
        "  truncates the static plan.  At audit scale the r4 hybrid",
        "  resolves these graphs on the driver (union-find fast path,",
        "  dedup.connected_components), so the main rows are a local",
        "  relation scan; the `[per-iteration]` row audits the",
        "  distributed loop that runs past `small_graph_max` pairs.",
        "",
        "| query | exchanges | bhj | smj | bnlj | cartesian | codegen | pushed filters | python |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    violations = []
    for name, a in rows:
        base = name.split("[", 1)[0]
        if a["cartesian"]:
            violations.append(f"{name}: cartesian={a['cartesian']}")
        if a["bnlj"] and base not in BNLJ_WHITELIST:
            violations.append(
                f"{name}: bnlj={a['bnlj']} not in BNLJ_WHITELIST"
            )
        out.append(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} "
            f"| {a['bnlj']} | {a['cartesian']} | {a['codegen_spans']} "
            f"| {'yes' if a['pushed_filters'] else '—'} | {a['python_stages']} |"
        )
    if violations:
        raise SystemExit(
            "plan audit FAILED — unsanctioned plan facts (PLANS.md not "
            "written):\n  " + "\n  ".join(violations)
        )
    whitelisted = sorted(
        n for n, a in rows if a["bnlj"] and n.split("[", 1)[0] in BNLJ_WHITELIST
    )
    out.append("")
    out.append(
        "Mechanical check: PASS — 0 cartesians; bnlj only at "
        + ", ".join(whitelisted)
        + " (all whitelisted)."
    )
    out.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(rows)} queries)")


if __name__ == "__main__":
    main()
