"""Weighted PageRank / TextRank (SURVEY.md §2.10 I1-I2, §2.3 J1, §2.4 A4-A5).

Reference semantics preserved exactly (BigdataProjectCode.py:386-391,
405-411):
- damping d = 0.85, init rank = 0.15 for every vertex, exactly 5 iterations,
  no convergence test, no rank normalization;
- per iteration: contribution(src→dst) = rank(src) * w(src,dst) / Σ_out w(src);
  new rank(dst) = 0.15 + 0.85 * Σ incoming contributions;
- vertices whose adjacency list is empty are dropped before iteration (P8),
  and vertices with no in-links vanish after the first aggregation — both
  reference behaviors kept for parity.

Scale design: the contribution scatter is a shuffle join keyed on
(source, src); contribution weights (w/Σw) are static, so they are computed
once, cached, and reused across iterations.  Each iteration ends in a
``localCheckpoint`` to cut the lineage the reference lets grow 5 joins deep
(SURVEY.md §4.1).  On a cluster the rank table is tiny relative to edges, so
AQE turns the per-iteration join into a broadcast automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import _retire_ckpt, leaf, pin_checkpoint, r6, session_memo
from .graph import EDGES_PREAMBLE, edges_raw
from .text import sentences

N_ITERATIONS = 5
DAMPING = 0.85
INIT_RANK = 0.15


def ranks_from(
    edges: DataFrame,
    iterations: int = N_ITERATIONS,
    tol: float | None = None,
) -> DataFrame:
    """Weighted PageRank over any (source, src, dst, weight) edge table.

    ``tol``: optional convergence-based early stop (SURVEY §4.1 extension —
    the reference always runs exactly 5 iterations with no test, which the
    default preserves).  When set, iteration stops once the max absolute
    rank delta falls below ``tol``; the delta check is one tiny agg per
    iteration over the rank table (cheap relative to the join)."""
    edges = edges.select("source", "src", "dst", "weight")
    out_w = edges.groupBy("source", "src").agg(F.sum("weight").alias("out_w"))
    # Static normalized contribution weights, reused every iteration.
    ew = (
        edges.join(out_w, ["source", "src"])
        .select(
            "source",
            "src",
            "dst",
            (F.col("weight") / F.col("out_w")).alias("contrib_w"),
        )
    )
    # pin + LAZY localCheckpoint (r7, VERDICT task 5): the loop below
    # references ew in every iteration, and Spark analyzes EAGERLY per
    # DataFrame op, so each of the loop's ~3*iterations ops re-walked the
    # fat tokenize+self-join subtree — plan CONSTRUCTION was 2.0s of
    # textrank_top5's 3.4s wall (r6 bench).  A lazy localCheckpoint plans
    # ew once (toRdd) and hands the loop a LogicalRDD LEAF: analysis per
    # iteration touches a 3-node tree, execution stays ONE action (the
    # checkpoint RDD materializes inside it, through the pin's cache), and
    # ranks are BIT-identical (verified at sf0.01).  Measured at sf0.1,
    # warm medians: construct 2.14s -> ~1.3s, exec 0.81s -> ~1.3s
    # (checkpoint copy), total 2.94s -> ~2.6s; the residual construct is
    # building the edges tree itself (0.74s), which belongs to the edge
    # queries, not the loop.  Alternative REJECTED after measurement: a
    # one-shot 5-CTE spark.sql unroll constructs in 0.78s but executes in
    # 3.3-4.4s (cache reuse lost) and is not bit-identical (1e-16 fold
    # drift) — wrong trade on both axes.
    # leaf() (r8): same pin + lazy-checkpoint shape, now (a) OWNED — the
    # checkpoint RDD's storage is released by release_pins(), not GC +
    # ContextCleaner (VERDICT r7 task 3) — and (b) MEMOIZED per plan
    # semantics, so repeated builds in one session (textrank_ranks +
    # textrank_top5, bench reps) share ONE materialized ew instead of
    # re-copying blocks per build (VERDICT r7 task 5; with AQE even a
    # lazy checkpoint materializes its shuffle stages at build time, so
    # an unshared leaf re-pays that work on every construction).
    ew = leaf(ew)
    # Rank state carries renamed columns (r_source, r_id) so the
    # per-iteration join against ew — which the state descends from — is
    # never ambiguous to the analyzer.
    ranks = (
        ew.select(
            F.col("source").alias("r_source"), F.col("src").alias("r_id")
        )
        .distinct()
        .withColumn("rank", F.lit(INIT_RANK).cast("double"))
    )
    for i in range(iterations):
        contrib = ew.join(
            ranks,
            (F.col("source") == F.col("r_source"))
            & (F.col("src") == F.col("r_id")),
        ).select(
            "source",
            "dst",
            (F.col("rank") * F.col("contrib_w")).alias("c"),
        )
        new_ranks = contrib.groupBy(
            F.col("source").alias("r_source"), F.col("dst").alias("r_id")
        ).agg((F.lit(INIT_RANK) + F.lit(DAMPING) * F.sum("c")).alias("rank"))
        # Lineage policy (driver loop, SURVEY §2.10 I1): with fixed
        # iterations the rank chain is LINEAR — iteration i feeds exactly
        # iteration i+1 — so ONE action executes every stage exactly
        # once and there is no recompute to cut; per-iteration EAGER
        # checkpoints only serialized the loop into driver-blocking jobs
        # (measured: 5 eager checkpoints 4.6s, none 2.4s at sf0.1,
        # identical results).  With ew a LogicalRDD leaf (above), each
        # iteration's analysis is shallow; a periodic LAZY checkpoint of
        # the rank state still bounds analyzer depth on LONG runs (never
        # fires at the reference's 5 iterations).  The tol path keeps an
        # eager checkpoint because its per-iteration delta collect is a
        # second action over new_ranks.
        if tol is None and (i + 1) % 10 == 0 and i + 1 < iterations:
            new_ranks = pin_checkpoint(new_ranks)
        if tol is not None:
            new_ranks = pin_checkpoint(new_ranks, eager=True)
            delta = (
                new_ranks.join(
                    ranks.select(
                        "r_source", "r_id", F.col("rank").alias("prev")
                    ),
                    ["r_source", "r_id"],
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
                .collect()[0]["d"]
            )
            # iteration i-1's eager checkpoint is dead once the delta
            # collect above has read it (new_ranks is materialized and
            # nothing downstream references prev) — retire it mid-loop
            # like the k-hop/LPA/descent loops, keeping the tol path's
            # block-manager footprint O(1) in iteration count (VERDICT
            # r9 task 7).  Safe no-op on iteration 0, where ranks is the
            # leaf-derived init, not a registered checkpoint.
            prev = ranks
            ranks = new_ranks
            _retire_ckpt(prev)
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    # fixed-iteration path: change the loop above to checkpoint every ~10
    # rounds (lazy) before raising N_ITERATIONS past the analyzer's
    # comfort; at the reference's 5 the un-cut linear plan is the win
    return ranks.select(
        F.col("r_source").alias("source"),
        F.col("r_id").alias("sentence_id"),
        "rank",
    )


@session_memo
def _ranks_raw(
    spark: SparkSession, sf_dir: str, iterations: int = N_ITERATIONS
) -> DataFrame:
    return ranks_from(edges_raw(spark, sf_dir), iterations)


def top_sentences_from(ranks: DataFrame, sent: DataFrame, k: int = 5) -> DataFrame:
    """Top-k ranked sentences per source joined back to text — the single
    equi-join replacement for the reference's per-sentence lookup() jobs.

    The cut orders by the ROUNDED rank (r6), not the raw double (r10):
    the raw rank is a float sum whose partial-merge order varies with
    shuffle fetch timing, so a raw-rank near-tie at the k-boundary could
    flip run-to-run (surfaced as a once-in-a-few-runs sf0.1 driver_sim
    mismatch; textrank_ranks, which emits rounded ranks, never flapped).
    The rounded rank is the certified engine-equal contract, and the
    sentence_id tie-break makes the cut total — deterministic across
    runs, partitionings, and engines."""
    w = Window.partitionBy("source").orderBy(
        F.desc(r6(F.col("rank"))), F.asc("sentence_id")
    )
    top = (
        ranks.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("source", "rk", "sentence_id", r6(F.col("rank")).alias("rank"))
    )
    return top.join(
        sent.select("sentence_id", "sentence"), "sentence_id"
    ).select("source", "rk", "sentence_id", "rank", "sentence")


def textrank_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final rank table after 5 iterations (FIXTURES.md F6)."""
    return _ranks_raw(spark, sf_dir).select(
        "source", "sentence_id", r6(F.col("rank")).alias("rank")
    )


def textrank_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 sentences per source by rank, joined back to text (O2 + J3).

    Replaces the reference's driver-side sort + per-sentence ``lookup()``
    jobs (BigdataProjectCode.py:396-401) with one window + one equi-join.
    """
    return top_sentences_from(
        _ranks_raw(spark, sf_dir), sentences(spark, sf_dir), k=5
    )


def _ranks_cte(iterations: int) -> str:
    """Unrolled PageRank iterations as DuckDB CTEs r0..rN."""
    parts = [
        "outw AS (SELECT source, src, sum(weight) AS out_w FROM edges "
        "GROUP BY source, src)",
        "ew AS (SELECT e.source, e.src, e.dst, e.weight / o.out_w AS contrib_w "
        "FROM edges e JOIN outw o ON e.source = o.source AND e.src = o.src)",
        f"r0 AS (SELECT DISTINCT source, src AS sentence_id, "
        f"CAST({INIT_RANK} AS double) AS rnk FROM ew)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"r{i} AS (SELECT e.source, e.dst AS sentence_id, "
            f"{INIT_RANK} + {DAMPING} * sum(r.rnk * e.contrib_w) AS rnk "
            f"FROM ew e JOIN r{i - 1} r "
            f"ON e.source = r.source AND e.src = r.sentence_id "
            f"GROUP BY e.source, e.dst)"
        )
    return ",\n".join(parts)


ORACLES: dict[str, str] = {
    "textrank_ranks": f"""
{EDGES_PREAMBLE},
{_ranks_cte(N_ITERATIONS)}
SELECT source, sentence_id, (round(rnk, 6) + 0.0) AS rank FROM r{N_ITERATIONS}
""",
    "textrank_top5": f"""
{EDGES_PREAMBLE},
{_ranks_cte(N_ITERATIONS)},
ranked AS (
  -- cut on the ROUNDED rank like the Spark side: the raw double is not
  -- an engine-stable ordering key at the k-boundary (see
  -- top_sentences_from)
  SELECT source, sentence_id, rnk,
         row_number() OVER (PARTITION BY source
                            ORDER BY (round(rnk, 6) + 0.0) DESC,
                                     sentence_id ASC) AS rk
  FROM r{N_ITERATIONS}
)
SELECT r.source, r.rk, r.sentence_id, (round(r.rnk, 6) + 0.0) AS rank, s.sentence
FROM ranked r JOIN sent s ON r.sentence_id = s.sentence_id
WHERE r.rk <= 5
""",
}

QUERIES = {
    "textrank_ranks": textrank_ranks,
    "textrank_top5": textrank_top5,
}
