"""Connected components over a near-duplicate pair graph.

Fuzzy dedup at corpus scale ends with clustering: MinHash-LSH emits
*pairs* (a~b, b~c), but the keep/drop decision needs *clusters*
({a,b,c} -> keep one). Pairs form an undirected graph; each duplicate
cluster is a connected component, labeled here by its minimum member
id.

Algorithm: distributed **hash-min label propagation** — every node
starts labeled with its own id; each round, a node adopts the minimum
label among itself and its neighbors (one shuffle-join + one groupBy
per round); converged when no label changes. Rounds needed = graph
diameter, which for near-dup clusters is small (dup clusters are
dense — most texts in a cluster collide pairwise in some LSH band), so
3-5 rounds is typical. For adversarially chain-shaped graphs the
large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) cuts rounds to
O(log d); hash-min is the right default for dedup workloads and keeps
every step a plain keyed shuffle that AQE can re-plan.

Scale notes:
- each round shuffles |E| + |V| rows keyed by node id — no
  broadcast of the full graph, no driver-side state beyond the
  converged? counter (one scalar per round).
- ``localCheckpoint`` truncates lineage each round; without it the
  plan doubles per iteration and the final job replays every round.
- reference has no dedup at all (SURVEY.md: reference is a fixed
  9-column taxi transform, parquet-slicer-v1.0/app/parquet_slicer.py);
  this operator is part of the §2.9 growth surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_pyspark_spark.checkpoint import DISK_CKPT, FAMILY_CACHE


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``;
    component_id = min node id reachable through the pair graph.
    Singleton documents (no edges) are not emitted — callers that need
    them left-join this result back to the corpus and coalesce."""
    # materialize the (small) pair list once — unioning two projections
    # of the raw plan would execute the upstream pair pipeline twice
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(storageLevel=DISK_CKPT)
    sym = (
        e.union(e.select(F.col("v"), F.col("u")))
        .distinct()
        .persist(FAMILY_CACHE)
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(storageLevel=DISK_CKPT)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u").agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint(storageLevel=DISK_CKPT)  # eager: materializes + truncates lineage
        )
        changed = stepped.where(F.col("lbl") < F.col("old_lbl")).count()
        labels = stepped.select("node", "lbl")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("component_id")
    )


def sql_components_over_pairs(
    pairs_cte: str = "pairs", final_name: str | None = None
) -> str:
    """Recursive-CTE oracle fragment: same (doc_id, component_id)
    labeling from a ``{pairs_cte}(doc_id_a, doc_id_b, ...)`` CTE.
    Embed under ``WITH RECURSIVE``. With ``final_name``, the final
    SELECT is emitted as one more named CTE so downstream oracles
    (e.g. canonical selection) keep composing at the same WITH level."""
    final = (
        "SELECT node AS doc_id, min(lbl) AS component_id "
        "FROM reach GROUP BY node"
    )
    ctes = f"""
    edges AS (SELECT doc_id_a AS u, doc_id_b AS v FROM {pairs_cte}
              UNION ALL
              SELECT doc_id_b, doc_id_a FROM {pairs_cte}),
    reach(node, lbl) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
    )
    """
    if final_name is not None:
        return f"{ctes}, {final_name} AS ({final})"
    return f"{ctes} {final}"
