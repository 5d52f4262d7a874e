-- S7 analog: an analytical SQL file executed verbatim by the engine
-- (reference: modules/snowflake.py:51-63 run_query_file +
-- queries/pagenation.sql shape).  Dialect kept to the ANSI subset both
-- Spark SQL and DuckDB parse: CTE, group-by, window frame, ordinal
-- ORDER BY (reference O2, cslb contacts.sql:16).
WITH daily AS (
    SELECT CAST(ts AS DATE) AS dt, event_type, COUNT(event_id) AS tally
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
)
SELECT dt, event_type, tally,
       CAST(SUM(tally) OVER (
           PARTITION BY event_type ORDER BY dt
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS running_7d
FROM daily
ORDER BY 1, 2
