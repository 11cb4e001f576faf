"""Fellegi-Sunter probabilistic record linkage — EM-estimated m/u
weights (the probabilistic tier above er.py's rule-based scoring:
given candidate pairs with k boolean field-agreement flags, EM
estimates per-field P(agree | match) = m_i, P(agree | non-match)
= u_i and the match prior π WITHOUT labeled data (Winkler's classic
unsupervised estimator), from which every agreement pattern gets a
posterior match probability and a log-odds match weight — the
decision quantities er.py's fixed thresholds approximate).

Architecture: ONE partial-agg groupBy reduces the pair stream to its
≤ 2^k agreement-pattern counts; the EM iterations then run over that
TINY frame as a fixed number of unrolled CTE stages in ONE generated
SQL text executed VERBATIM by Spark and by the DuckDB oracle (the
hilbert.py same-text trick, so estimator parity holds by
construction).  Cross-engine float discipline: per-pattern posteriors
are nano-quantized to BIGINT before every aggregation, so all SUMs
are exact integer arithmetic and parameter updates are single
divisions of exact integers — reduction order cannot move a bit.

Scale shape: the corpus-sized work is the single pattern-count
groupBy (map-side combinable); everything after is O(2^k * iters)
rows.
"""

from __future__ import annotations

NANO = 1_000_000_000


def _prod(mu: str, k: int) -> str:
    return " * ".join(
        f"(CASE WHEN g{i} THEN {mu}{i} ELSE 1.0 - {mu}{i} END)"
        for i in range(1, k + 1))


def fs_em_sql(pairs_sql: str, k: int, iters: int = 3,
              pi0: float = 0.1, m0: float = 0.9,
              u0: float = 0.1) -> str:
    """The full generated query: -> per agreement pattern
    (g1..gk, n, w_nano, logodds_micro) after ``iters`` EM rounds,
    plus the final parameters echoed on every row (pi_micro,
    m1_micro.., u1_micro..).  ``pairs_sql`` must select boolean
    columns g1..gk, one row per candidate pair."""
    gl = ", ".join(f"g{i}" for i in range(1, k + 1))
    pm, pu = _prod("m", k), _prod("u", k)
    w_nano = (f"CAST(round({NANO} * (pi * {pm})"
              f" / nullif(pi * {pm} + (1.0 - pi) * {pu}, 0))"
              " AS BIGINT)")
    ctes = [f"pat AS (SELECT {gl}, CAST(COUNT(*) AS BIGINT) AS n"
            f" FROM ({pairs_sql}) GROUP BY {gl})"]
    p0 = ([f"CAST({pi0!r} AS DOUBLE) AS pi"]
          + [f"CAST({m0!r} AS DOUBLE) AS m{i}" for i in range(1, k + 1)]
          + [f"CAST({u0!r} AS DOUBLE) AS u{i}" for i in range(1, k + 1)])
    ctes.append(f"p0 AS (SELECT {', '.join(p0)})")
    for t in range(iters):
        ctes.append(f"e{t} AS (SELECT pat.*, {w_nano} AS w_nano"
                    f" FROM pat CROSS JOIN p{t})")
        upd = [f"CAST(SUM(w_nano * n) AS DOUBLE)"
               f" / nullif({NANO}.0 * SUM(n), 0) AS pi"]
        for i in range(1, k + 1):
            gi = f"(CASE WHEN g{i} THEN 1 ELSE 0 END)"
            upd.append(
                f"CAST(SUM(w_nano * n * {gi}) AS DOUBLE)"
                f" / nullif(CAST(SUM(w_nano * n) AS DOUBLE), 0)"
                f" AS m{i}")
            upd.append(
                f"CAST(SUM(({NANO} - w_nano) * n * {gi}) AS DOUBLE)"
                f" / nullif(CAST(SUM(({NANO} - w_nano) * n) AS DOUBLE),"
                f" 0) AS u{i}")
        ctes.append(f"p{t + 1} AS (SELECT {', '.join(upd)} FROM e{t})")
    final_params = ([f"CAST(round(1000000 * pi) AS BIGINT) AS pi_micro"]
                    + [f"CAST(round(1000000 * m{i}) AS BIGINT)"
                       f" AS m{i}_micro" for i in range(1, k + 1)]
                    + [f"CAST(round(1000000 * u{i}) AS BIGINT)"
                       f" AS u{i}_micro" for i in range(1, k + 1)])
    logodds = (f"CAST(round(1000000 * ln(nullif(pi * {pm}, 0)"
               f" / nullif((1.0 - pi) * {pu}, 0))) AS BIGINT)")
    return (f"WITH {', '.join(ctes)}"
            f" SELECT {gl}, n, {w_nano} AS w_nano,"
            f" {logodds} AS logodds_micro,"
            f" {', '.join(final_params)}"
            f" FROM pat CROSS JOIN p{iters}"
            f" ORDER BY {gl}")


def fs_em(pairs, k: int, iters: int = 3):
    """DataFrame convenience wrapper: registers the pair frame and
    runs the generated text on its SparkSession."""
    pairs.createOrReplaceTempView("fs_pairs")
    return pairs.sparkSession.sql(
        fs_em_sql("SELECT * FROM fs_pairs", k, iters))
