"""B11 — skew handling for hot keys (mega-repo fixture, SURVEY §8.3 #4).

The reference is single-threaded so skew cannot exist there; this operator is
pure scale engineering required by the north_rule ("partitioning / shuffle /
skew handled explicitly").

Two layers:
1. AQE skew-join splitting + partition coalescing are enabled in
   config.build_session — Catalyst handles skewed *joins* at runtime.
2. ``salted_repartition`` handles skewed *writes/aggregations*: a hot repo
   ('mega/monorepo' holds ~30% of rows) must not serialize into one task.
   Salting by ``xxhash64(path) % salt_buckets`` within the repo spreads a hot
   repo over ``salt_buckets`` tasks while keeping each (repo, path) — and
   therefore each merge key — in exactly one task, so merge correctness is
   unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    repo_col: str = "repo",
    path_col: str = "path",
    salt_buckets: int = 8,
) -> DataFrame:
    """Repartition by (repo, salt(path)) — hot repos fan out over
    ``salt_buckets`` partitions; each merge key stays co-located.
    """
    salt = F.pmod(F.xxhash64(F.col(path_col)), F.lit(salt_buckets))
    return df.repartition(n_partitions, F.col(repo_col), salt)
