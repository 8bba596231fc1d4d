"""DuckDB mirrors for the receiver-side operators (operators/recv.py),
driven off the ``events`` view."""

SALT = "graft-salt"
NOT_BEFORE = "2024-01-10T00:00:00"
NOT_AFTER = "2024-01-25T00:00:00"
RETAG_MAP = {
    "click.sit": "es-click.sit",
    "view.sit": "es-view.sit",
    "error.sit": "es-error.sit",
}


def q_http_validate() -> str:
    return f"""
WITH h AS (
  SELECT event_id,
    strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_str,
    CASE WHEN event_id % 2 = 0
         THEN md5(strftime(ts, '%Y-%m-%dT%H:%M:%S') || '{SALT}')
         ELSE 'deadbeef' END AS sig,
    props AS body
  FROM events)
SELECT event_id, ts_str
FROM h
WHERE md5(ts_str || '{SALT}') = sig
  AND regexp_matches(ts_str, '^\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}}')
  AND ts_str >= '{NOT_BEFORE}' AND ts_str <= '{NOT_AFTER}'"""


def q_http_ingest() -> str:
    """Mirror of __spark_entry__._q_http_ingest (recv.http_ingest): the
    flattened keys are re-derived from the SAME source columns the body was
    built from; the 1-in-97 corrupt bodies and invalid signatures drop."""
    return f"""
WITH h AS (
  SELECT event_id, user_id, event_type, props,
    strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_str,
    CASE WHEN event_id % 2 = 0
         THEN md5(strftime(ts, '%Y-%m-%dT%H:%M:%S') || '{SALT}')
         ELSE 'deadbeef' END AS sig
  FROM events)
SELECT event_id, 'httprecv.sit' AS tag,
  CAST(user_id AS VARCHAR) AS cnt,
  event_type AS meta__type,
  json_extract_string(props, '$.k') AS meta__kk
FROM h
WHERE md5(ts_str || '{SALT}') = sig
  AND regexp_matches(ts_str, '^\\d{{4}}-\\d{{2}}-\\d{{2}}T\\d{{2}}:\\d{{2}}:\\d{{2}}')
  AND ts_str >= '{NOT_BEFORE}' AND ts_str <= '{NOT_AFTER}'
  AND event_id % 97 != 0"""


def q_rsyslog_normalize() -> str:
    return """
SELECT event_id,
  strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%dT%H:%M:%SZ') AS at_ts,
  props AS message,
  'emqtt.sit' AS tag
FROM events"""


def q_es_retag_counts() -> str:
    whens = " ".join(
        f"WHEN '{old}' THEN '{new}'" for old, new in RETAG_MAP.items()
    )
    return f"""
WITH tagged AS (
  SELECT event_id, CASE event_type || '.sit' {whens} ELSE NULL END AS tag
  FROM events)
SELECT tag, count(*) AS n FROM tagged WHERE tag IS NOT NULL GROUP BY tag"""


def q_kafka_json_decode() -> str:
    return """
SELECT event_id, json_extract_string(props, '$.k') AS k_val,
  'kafkabuf.sit' AS tag
FROM events"""


def q_template_engines() -> str:
    return """
SELECT event_id,
  event_type || '-' || CAST(user_id AS VARCHAR) || '|' || upper(event_type)
    || '|%{missing}' AS pct_tpl,
  'u=' || CAST(user_id AS VARCHAR) || ' t=' || event_type || ' none=!' AS dollar_tpl
FROM events"""


ORACLES = {
    "template_engines": q_template_engines,
    "http_validate": q_http_validate,
    "http_ingest": q_http_ingest,
    "rsyslog_normalize": q_rsyslog_normalize,
    "es_retag_counts": q_es_retag_counts,
    "kafka_json_decode": q_kafka_json_decode,
}
