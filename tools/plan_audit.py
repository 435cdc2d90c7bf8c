"""Physical-plan lint across every registered suite query.

Builds each ``queries()`` entry (plan only — nothing executes) and flags
scale anti-patterns:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` nodes outside the
  documented allowlist (query×corpus scoring with a broadcast query side
  is a *deliberate* broadcast cross — the corpus never shuffles);
- parquet scans carrying a pushable (bare source-attribute) predicate in
  ``DataFilters`` while ``PushedFilters`` is empty — i.e. a filter the
  reader COULD have skipped row groups with but didn't; predicates on
  derived expressions (hash/concat/split results) are exempt since
  parquet cannot evaluate them.

Run: ``python tools/plan_audit.py [sf_dir] [query ...]``; exits non-zero
on any violation. This is the automated form of the per-operator
``.explain`` review SURVEY §4.2 commits to.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# broadcast-cross by design: a tiny side (queries / centroids / block map)
# against the corpus — candidate space is pruned downstream, never n²
# materialized rows per executor beyond the broadcast.
CROSS_ALLOWED = {
    "similarity_cosine_topk",       # broadcast query side (queries ≪ corpus)
    "similarity_ivf_topk",          # broadcast centroid routing
    "similarity_ivf_kmeans_topk",   # broadcast centroid routing (k-means)
    "dedup_semantic_semdedup",      # broadcast k-centroid assignment (k-means)
    "dedup_embedding_cosine",       # broadcast 36-row block-pair map
    "dedup_embedding_lsh",          # broadcast probe map in rerank
    "dedup_embedding_lsh_highthr",
    "retrieval_bm25_topk",          # broadcast ONE-ROW corpus stats (N, Σdl)
    "retrieval_lm_perplexity",      # broadcast ONE-ROW vocab size
    "curate_mixing_weights",        # broadcast ONE-ROW N_out against ≤|sources| rows
    "retrieval_tfidf_keywords",     # broadcast ONE-ROW corpus doc count
    "curate_quality_classifier",    # broadcast ONE-ROW token totals + prior
    "retrieval_rrf_fusion",         # BM25 stats row + broadcast dense query side
    "similarity_ivfpq_topk",        # broadcast centroid routing + query subvectors
    "similarity_ivfpq_rerank",      # same + broadcast query side in the rerank
    "similarity_ivfpq_serve",       # same routing over the prebuilt index
}


def audit(name: str, df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    problems = []
    n_cross = plan.count("CartesianProduct") + plan.count(
        "BroadcastNestedLoopJoin"
    )
    if n_cross and name not in CROSS_ALLOWED:
        problems.append(f"{n_cross} cartesian/BNLJ node(s)")
    # filtered parquet scans must push something down: a scan whose
    # DataFilters (source-column predicates evaluated at the scan) are
    # non-empty but whose PushedFilters are empty never reached the
    # parquet reader — row groups can't be skipped (VERDICT r3 wrong #1:
    # the old form of this check was dead code)
    for scan in re.finditer(r"FileScan parquet[^\n]*", plan):
        line = scan.group(0)
        data = re.search(r"DataFilters: \[(.*?)\], Format:", line)
        pushed = re.search(r"PushedFilters: \[(.*?)\], ReadSchema:", line)
        if data is None or pushed is None or pushed.group(1).strip():
            continue
        # only predicates directly on a source attribute are pushable;
        # isnotnull(concat(...)) / pmod(hash(...)) etc. legitimately
        # can't reach the parquet reader and are not flagged
        filt = data.group(1)
        pushable = re.search(
            r"isnotnull\(\w+#\d+L?\)"                       # null filter
            r"|\(\w+#\d+L?\s*(?:=|>|<|>=|<=|<=>)\s*[^()]+\)"  # cmp vs literal
            r"|\w+#\d+L? IN \(",                            # IN list
            filt,
        )
        if pushable:
            problems.append(
                f"pushable predicate not pushed to parquet: "
                f"{pushable.group(0)[:80]}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from opengemini_spark import suite
    from opengemini_spark.session import get_spark

    spark = get_spark("plan-audit")
    bad = 0
    for name, fn in suite.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            problems = audit(name, df)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:160]}")
            bad += 1
            continue
        if problems:
            print(f"FLAG  {name}: {'; '.join(problems)}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
