"""Gap-based sessionization of event streams.

The classic clickstream operator: a user's events belong to one session
until a silence longer than ``gap`` separates them. Pure window functions
— one shuffle on the user key (the natural partitioner), lag + running
sum inside the partition, no Python anywhere.

Cross-engine determinism: timestamps compare in integer MICROSECONDS
(``unix_micros`` / ``epoch_us``) — no float epoch math, so the oracle's
session boundaries are bit-identical; window order ties break on
event_id. Parquet naive timestamps (TIMESTAMP_NTZ) cast through
TIMESTAMP under the engine's fixed UTC session timezone (session.py), so
the wall-clock value IS the epoch value, matching DuckDB's epoch_us on
the same naive column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Append (session_no, session starts) to events: session_no counts a
    user's sessions from 1 in time order."""
    gap_us = int(gap_minutes * 60 * 1_000_000)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(order_tiebreak).asc())
    prev = F.lag(us).over(w)
    new_session = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return events.withColumn("session_no", F.sum(new_session).over(w))


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_no, n_events, duration_s, value_sum) per session."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return s.groupBy(user_col, "session_no").agg(
        F.count("*").alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_s"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )


def session_stats_sql(gap_minutes: float = 30.0) -> str:
    """The identical computation as DuckDB SQL over ``events``."""
    gap_us = int(gap_minutes * 60 * 1_000_000)
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
), sessions AS (
  SELECT user_id, event_id, value, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       (max(us) - min(us)) / 1000000.0 AS duration_s,
       round(sum(value), 6) AS value_sum
FROM sessions GROUP BY 1, 2
"""
