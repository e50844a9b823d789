"""B4-meta — meta-blocking: blocking-graph edge weighting + pruning.

At web scale a recall-oriented blocker (LSH banding — blocking.py, token
blocking — ops/setjoin.py, SNM — snm.py, or their multi-pass union)
over-generates: redundancy-positive block collections place every record in
many blocks, so the SAME pair co-occurs repeatedly and the candidate set is
dominated by low-evidence pairs that a scorer must then reject one by one.
Meta-blocking (Papadakis et al., "Meta-Blocking: Taking Entity Resolution
to the Next Level", TKDE 2014) restructures the block collection instead of
scoring it: build the *blocking graph* — one node per record, one edge per
co-occurring pair — weight each edge by how much blocking evidence backs
it, and prune low-weight edges BEFORE pairwise scoring ever runs. The
pruned graph is the new, far smaller candidate set, at near-zero recall
cost, because redundancy itself is the signal: true matches co-occur in
many (and in small, discriminative) blocks.

Edge-weighting schemes (all from the paper, all computed here in one pass):

* ``cbs``  — Common Blocks Scheme: number of blocks the pair shares.
* ``arcs`` — Aggregate Reciprocal Comparisons Scheme: Σ 1/C(|b|, 2) over
  shared blocks b; small blocks count for more (a pair meeting in a
  2-record block is strong evidence; meeting in a 10^4-record block is
  noise).
* ``js``   — Jaccard of the two records' block sets:
  cbs / (|B_a| + |B_b| - cbs).

Pruning schemes:

* WEP (weight edge pruning, :func:`wep_prune`) — keep edges whose weight is
  >= the GLOBAL mean edge weight. One scalar aggregate, broadcast back.
* WNP (weight node pruning, :func:`wnp_prune`) — keep edges whose weight is
  >= the LOCAL mean over either endpoint's incident edges (the
  redundancy-positive union variant). Personalizes the threshold: a hub
  record with thousands of weak edges keeps only its strong ones, while a
  sparse record keeps its best evidence even if globally weak.
* CNP (cardinality node pruning, :func:`cnp_prune`) — keep each node's
  top-k incident edges by weight (union variant: an edge survives if it is
  in EITHER endpoint's top k). Unlike the weight-threshold schemes this
  gives a HARD per-record candidate budget — total surviving pairs <= k*n
  regardless of the weight distribution, which is the property a
  fixed-throughput scoring fleet actually provisions against.
* CEP (cardinality edge pruning, :func:`cep_prune`) — keep the globally
  best ~K edges: the GLOBAL budget (progressive/pay-as-you-go resolution:
  score the K most promising pairs first, stop when the budget runs out).
  Computed WITHOUT a global sort: for an integer weight the K-th-largest
  weight comes from a per-weight histogram (one tiny aggregate — at most
  |distinct weights| rows, e.g. <= n_bands for CBS), and the filter keeps
  every edge at or above that threshold. Ties at the threshold are all
  kept (deterministic; output may exceed K by the tie mass, never by more).

Plan shape, all Catalyst, no UDF: dedupe (block, id) → per-block sorted id
arrays (groupBy block) → in-array pair generation carrying the block size
(the same no-self-join trick as ops/setjoin.py:token_blocking_pairs — a
block of n records emits its C(n, 2) pairs from ONE row, so the block
table is never joined with itself) → one groupBy on the pair for all three
weights → two id-keyed joins for the block-set sizes. Shuffles key on
block keys, record ids, and pair ids — never on record content. WEP adds
one one-row aggregate; WNP adds one explode (2 rows per edge) + one
node-keyed window. Every aggregate partial-combines, so the shuffle
volume is bounded by distinct blocks + surviving pairs, and the
``max_block`` cap bounds any one block's fan-out at C(max_block, 2) —
oversized blocks carry near-zero evidence per pair by construction (the
paper's block-purging step) and are dropped before pair generation.

Relation to the reference: the reference scores any pair handed to it
(python_hexhamming.cc:62-64 within-distance check); meta-blocking is the
stage that decides WHICH pairs deserve that kernel at 10^12-turn scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocking_graph(
    blocks: DataFrame,
    id_col: str = "rec_id",
    key_col: str = "block_key",
    max_block: int = 1000,
) -> DataFrame:
    """Weighted blocking graph from a generic (block_key, rec_id) table —
    composable with any blocker's key stream (LSH band keys, rare tokens,
    SNM buckets, or their union).

    Output: one row per co-occurring unordered pair, lower id on the a
    side: (<id>_a, <id>_b, cbs bigint, arcs double, js double).

    Blocks with fewer than 2 records emit nothing; blocks larger than
    ``max_block`` are purged (see module docstring). ``|B_x|`` in the js
    denominator counts the record's SURVIVING blocks (post-purge, size>=2),
    so js is a true Jaccard of the block sets the graph was built from.
    """
    if max_block < 2:
        raise ValueError(f"max_block must be >= 2, got {max_block}")
    memb = blocks.select(
        F.col(key_col).alias("_bk"), F.col(id_col).alias("_id")
    ).distinct()

    grouped = (
        memb.groupBy("_bk")
        .agg(F.array_sort(F.collect_set("_id")).alias("_ids"))
        .withColumn("_bsize", F.size("_ids"))
        .where((F.col("_bsize") >= 2) & (F.col("_bsize") <= max_block))
    )

    # per-record surviving-block counts for the js denominator: explode the
    # kept blocks back to memberships (cheaper than re-filtering memb — the
    # purge already happened) and count per id
    node_blocks = (
        grouped.select(F.explode("_ids").alias("_id"))
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_nb"))
    )

    # in-array pair generation: block of n emits C(n, 2) (a, b) structs
    # with a < b from one row — no block self-join, one exchange total
    # (the pair groupBy below)
    pairs = grouped.select(
        F.col("_bsize"),
        F.explode(
            F.expr(
                "flatten(transform(_ids, (x, i) -> "
                "transform(slice(_ids, i + 2, size(_ids) - i - 1), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("_p"),
    )

    edges = pairs.groupBy(
        F.col("_p.a").alias("_a"), F.col("_p.b").alias("_b")
    ).agg(
        F.count(F.lit(1)).alias("cbs"),
        F.sum(
            F.lit(2.0)
            / (F.col("_bsize").cast("double") * (F.col("_bsize") - F.lit(1)))
        ).alias("arcs"),
    )

    return (
        edges.join(node_blocks.withColumnRenamed("_id", "_a"), "_a")
        .withColumnRenamed("_nb", "_nba")
        .join(node_blocks.withColumnRenamed("_id", "_b"), "_b")
        .select(
            F.col("_a").alias(f"{id_col}_a"),
            F.col("_b").alias(f"{id_col}_b"),
            "cbs",
            "arcs",
            (
                F.col("cbs").cast("double")
                / (F.col("_nba") + F.col("_nb") - F.col("cbs"))
            ).alias("js"),
        )
    )


def wep_prune(graph: DataFrame, weight_col: str = "cbs") -> DataFrame:
    """Weight Edge Pruning: keep edges with weight >= the global mean edge
    weight. The mean is ONE row (a full but partial-combining aggregate),
    attached with a broadcast nested-loop join on a single row — not a
    shuffle, not a collect of the edge set. With an integer weight (cbs)
    the threshold is a long-sum/long-count IEEE division, identical across
    engines — the oracle-stable choice."""
    mean = graph.agg(F.avg(F.col(weight_col)).alias("_mw"))
    return (
        graph.join(F.broadcast(mean))
        .where(F.col(weight_col) >= F.col("_mw"))
        .drop("_mw")
    )


def cnp_prune(
    graph: DataFrame,
    k: int,
    id_col: str = "rec_id",
    weight_col: str = "cbs",
) -> DataFrame:
    """Cardinality Node Pruning, union variant: an edge survives if its
    weight ranks in the top ``k`` of EITHER endpoint's incident edges.
    Deterministic under ties: rank order is (weight desc, other-endpoint
    id asc), so reruns and engine mirrors agree. Same plan family as WNP
    — one explode (2 rows per edge), one node-keyed window (row_number
    instead of avg), one pair-keyed group-back — but the output is budget
    -bounded: <= k edges per node survive from that node's own vote, so
    the scoring phase's input is <= k * n_records by construction."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    a, b = f"{id_col}_a", f"{id_col}_b"
    from pyspark.sql import Window

    doubled = graph.select(
        F.col(a), F.col(b), F.col(weight_col).alias("_w"),
        F.explode(F.array(F.col(a), F.col(b))).alias("_node"),
    ).withColumn(
        "_other", F.when(F.col("_node") == F.col(a), F.col(b)).otherwise(F.col(a))
    )
    w = Window.partitionBy("_node").orderBy(
        F.col("_w").desc(), F.col("_other").asc()
    )
    keep = (
        doubled.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(a, b)
        .distinct()
    )
    return graph.join(keep, [a, b], "left_semi")


def cep_prune(graph: DataFrame, budget: int, weight_col: str = "cbs") -> DataFrame:
    """Cardinality Edge Pruning: keep the edges whose weight is >= the
    ``budget``-th largest edge weight (all threshold ties kept, so the
    output size is in [budget, budget + ties - 1] when the graph has at
    least ``budget`` edges; smaller graphs pass through whole).

    No global sort: the threshold is derived from a per-weight histogram —
    a map-side-combinable count aggregate whose result has one row per
    DISTINCT weight (for an integer evidence weight like CBS that is at
    most n_bands rows), collected to the driver, cumulated, and pushed
    back as a literal filter. The data-scale plan is scan -> filter, same
    shape as a Bloom-prune (ops/sketch.py): the only full pass is the
    histogram aggregate."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    hist = (
        graph.groupBy(F.col(weight_col).alias("_w"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_w").desc())
        .collect()
    )
    total = 0
    threshold = None
    for row in hist:
        threshold = row["_w"]
        total += row["_n"]
        if total >= budget:
            break
    if threshold is None:  # empty graph
        return graph
    return graph.where(F.col(weight_col) >= F.lit(threshold))


def prune_pairs(
    pairs: DataFrame,
    weight,
    scheme: str = "wnp",
    id_col: str = "conv_id",
    k: int = 10,
    budget: int = 1_000_000,
) -> DataFrame:
    """Meta-prune an arbitrary (possibly WIDE) candidate-pair stream.

    ``weight`` is a Column evaluated against ``pairs`` (e.g.
    blocking.shared_band_count — the CBS weight as free codegen on wide
    pairs). The weighting and pruning run on a slim (id_a, id_b, weight)
    projection and survivors re-attach with ONE pair-keyed semi-join
    (CEP filters in place — no re-attach join at all), so the wide
    payload (signature chunks, canon keys) never rides the node-keyed
    pruning shuffles. scheme: "wep" | "wnp" | "cnp" (``k`` = the
    per-record candidate budget) | "cep" (``budget`` = the global one)."""
    a, b = f"{id_col}_a", f"{id_col}_b"
    if scheme == "cep":
        return cep_prune(pairs.withColumn("_w", weight), budget, "_w").drop("_w")
    slim = pairs.select(a, b, weight.alias("_w"))
    if scheme == "wep":
        kept = wep_prune(slim, "_w")
    elif scheme == "wnp":
        kept = wnp_prune(slim, id_col=id_col, weight_col="_w")
    elif scheme == "cnp":
        kept = cnp_prune(slim, k, id_col=id_col, weight_col="_w")
    else:
        raise ValueError(f"unknown meta-prune scheme {scheme!r}")
    return pairs.join(kept.select(a, b), [a, b], "left_semi")


def wnp_prune(graph: DataFrame, id_col: str = "rec_id", weight_col: str = "cbs") -> DataFrame:
    """Weight Node Pruning, redundancy-positive union variant: an edge
    survives if its weight is >= the mean incident-edge weight of EITHER
    endpoint. Each edge duplicates to both endpoints (one explode), the
    per-node mean is a window keyed on the node id (never a global
    collapse), and survival is max(ok) per edge — grouped back on the pair
    key, so the only shuffles are node-keyed and pair-keyed."""
    a, b = f"{id_col}_a", f"{id_col}_b"
    doubled = graph.select(
        "*", F.explode(F.array(F.col(a), F.col(b))).alias("_node")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_node")
    ok = doubled.withColumn(
        "_ok", F.col(weight_col) >= F.avg(F.col(weight_col)).over(w)
    )
    keep = (
        ok.groupBy(a, b)
        .agg(F.max("_ok").alias("_keep"))
        .where("_keep")
        .select(a, b)
    )
    return graph.join(keep, [a, b])
