"""Crawl-frontier politeness scheduling (beyond-reference webtext
surface; the dispatch step between the robots rules (q155/q86) and the
fetch fleet — a polite crawler serializes requests per host with a
per-host delay, so the frontier must be turned into (slot, fetch time)
assignments before workers pull it).

Spark-first shape: ONE ``row_number`` window per host over the frontier
(priority-ordered, deterministic url tie-break) assigns each url its
per-host slot; the fetch time is ``slot * crawl_delay_ms`` with the
delay broadcast-joined from the per-host policy frame (robots
Crawl-delay, or the crawler default).  A ``max_per_host`` cap truncates
mega-hosts INSIDE the window filter — the standard capped-bucket guard
(dedup.py) — so a 10^8-url host costs its cap, not its size.  Per-host
windows are the honest plan at any scale: politeness is per-host
sequential by definition, and the spillable window sorter streams each
host; no global sort, no collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def politeness_schedule(frontier: DataFrame,
                        delays: DataFrame | None = None,
                        default_delay_ms: int = 1000,
                        max_per_host: int | None = None) -> DataFrame:
    """frontier (host, url, priority) [+ delays (host, delay_ms)] ->
    (host, url, slot, fetch_at_ms): slot is the 0-based per-host fetch
    position (higher priority first, url as the deterministic tie), and
    ``fetch_at_ms = slot * delay_ms`` the earliest polite fetch offset
    from the host's crawl start.  Urls beyond ``max_per_host`` drop
    (re-enqueued by the next frontier build, as crawlers do)."""
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(),
                                           F.col("url"))
    ranked = frontier.select(
        "host", "url",
        (F.row_number().over(w) - 1).cast("long").alias("slot"))
    if max_per_host is not None:
        ranked = ranked.filter(F.col("slot") < max_per_host)
    if delays is not None:
        d = delays.select("host", F.col("delay_ms").cast("long"))
        ranked = ranked.join(F.broadcast(d), "host", "left")
    else:
        ranked = ranked.withColumn("delay_ms", F.lit(None).cast("long"))
    return ranked.select(
        "host", "url", "slot",
        (F.col("slot") * F.coalesce("delay_ms",
                                    F.lit(int(default_delay_ms))))
        .cast("long").alias("fetch_at_ms"))
