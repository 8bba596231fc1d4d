"""go_fluentd_spark — a PySpark-native rebuild of the computational semantics
of Laisky/go-fluentd (parse -> enrich -> route -> aggregate over tokenized
training sequences).

NOT a port: the reference is a goroutine/channel streaming daemon; this is a
batch-incremental DataFrame program planned by Catalyst. Reference semantics
are cited per-operator as ``/root/reference/<file>:<line>`` in docstrings.

Layout
------
- ``config``     — pipeline configuration (rule lists compiled once to Columns)
- ``session``    — SparkSession builders tuned for local[N] and cluster runs
- ``sources``    — the tokenized-sequence source table (deterministic synth
                   derivation from the testdata ``documents`` table) + readers
- ``functions``  — scalar-function library (templates, flatten, time, hashing)
- ``operators``  — pipeline stages: acceptor filters, concat sessionization,
                   regex parser, post filters, dispatcher/sink fan-out, and
                   training-data ops (dedup, similarity, text analysis)
- ``plans``      — end-to-end plan builder + manifest/resume
- ``streaming``  — Structured Streaming variant of the pipeline
- ``oracle``     — DuckDB-dialect SQL mirrors used by the correctness gate
"""

__version__ = "0.1.0"
