"""Round-7 LLM-data-pipeline queries.

Same contract as pipeline.py: every entry returns a DataFrame whose
rendered rows strict-match the DuckDB oracle (registry.py determinism
rules — exact integer/decimal arithmetic, transcendentals rounded to
6dp before use, round_half_up for cross-engine .5 ties).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_cut_spark.operators import similarity
from impala_cut_spark.plans._util import t
from impala_cut_spark.plans.pipeline import _SQL_VECS
from impala_cut_spark.plans.registry import query


# ---------------------------------------------------------------------------
# SemDeDup with the production cells≈√N sizing (round-6 verdict #5)
# ---------------------------------------------------------------------------


def _semdedup_auto_oracle(threshold: float = 0.9) -> str:
    """DuckDB replay of the √N-sized quantizer: the cell count and the
    stride rule are SQL-computable from count(*) (floor(sqrt(N)) on
    doubles ≡ Python isqrt below 2^52 rows — similarity.semdedup_cells),
    so the oracle derives the same centroid set with no literals."""
    return f"""
WITH {_SQL_VECS},
params AS (SELECT count(*) AS n,
                  greatest(1, least(CAST(floor(sqrt(count(*))) AS BIGINT),
                                    {similarity.SEMDEDUP_MAX_CELLS})) AS cells
           FROM v),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid,
                 e AS ce, list_dot_product(e, e) AS cc
          FROM v, params
          WHERE vec_id % greatest(1, CAST(floor(CAST(n AS DOUBLE) / cells) AS BIGINT)) = 0
          QUALIFY cid <= cells),
dist AS (SELECT n.vec_id, c.cid,
                round(c.cc - 2.0 * list_dot_product(n.e, c.ce), 6) AS d
         FROM v n CROSS JOIN cents c),
assign AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
             FROM dist) WHERE rn = 1),
vv AS (SELECT n.vec_id, a.cid, n.e, n.nm
       FROM nv n JOIN assign a ON a.vec_id = n.vec_id),
dups AS (SELECT DISTINCT y.vec_id
         FROM vv x JOIN vv y ON x.cid = y.cid AND x.vec_id < y.vec_id
         WHERE round(list_dot_product(x.e, y.e) / (x.nm * y.nm), 6) >= {threshold})
SELECT v.vec_id, v.cid,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM vv v LEFT JOIN dups d ON d.vec_id = v.vec_id
"""


@query("pipe_semdedup_auto", oracle=_semdedup_auto_oracle())
def pipe_semdedup_auto(spark, sf_dir):
    """SemDeDup with the production cells≈√N sizing wired in
    (operators/similarity.py semdedup_auto; round-6 verdict #5):
    centroid count scales with the corpus (√N balances assignment
    work against within-cell pair work at ~N^1.5 total), centroids
    picked by a deterministic SQL-expressible stride rule, and the
    assignment runs as a broadcast join against the centroid frame —
    no driver collect, no literal expression trees, so the same plan
    carries the paper's 100k-cell regime.  pipe_embed_semdedup keeps
    the frozen 16-cell variant (its pinned test value and oracle are
    unchanged)."""
    return similarity.semdedup_auto(t(spark, sf_dir, "embeddings"), threshold=0.9)
