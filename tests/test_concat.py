"""Concat sessionization fixtures (FIXTURES.md F5; reference
internal/tagfilters/concator_f.go)."""

from conftest import make_msgs

from go_fluentd_spark.operators.concat import concat_sessions

HEAD1 = "2018-03-06 16:56:22.514 | a | I | t | c.K | 1: line one"
HEAD2 = "2018-03-06 16:56:23.000 | a | I | t | c.K | 2: line two"
TAIL1 = "\tat com.example.A.b(A.java:1)"
TAIL2 = "\tat com.example.C.d(C.java:2)"


SPRING = {"tag": "spring.sit", "tag_base": "spring"}


def rows_by_id(df):
    return {r.id: r for r in df.collect()}


def test_merge_no_separator_and_ext_ids(spark):
    # concator_f.go:188-193: append with no separator; tail ids -> ExtIds
    df = make_msgs(
        spark,
        [
            {"id": 1, "source": HEAD1, "doc_id": "h1", **SPRING},
            {"id": 2, "source": TAIL1, "doc_id": "t1", **SPRING},
            {"id": 3, "source": TAIL2, "doc_id": "t2", **SPRING},
            {"id": 4, "source": HEAD2, "doc_id": "h2", **SPRING},
        ],
    )
    out = rows_by_id(concat_sessions(df))
    assert set(out) == {1, 4}
    assert out[1].source == HEAD1 + TAIL1 + TAIL2
    assert out[1].ext_ids == [2, 3]
    assert out[1].doc_id == "h1"  # head row wins identity + tokens
    assert out[4].source == HEAD2 and out[4].ext_ids == []


def test_lone_tail_passthrough(spark):
    # concator_f.go:151-157: non-head with no open session passes unchanged
    df = make_msgs(spark, [{"id": 5, "source": TAIL1, **SPRING}])
    out = concat_sessions(df).collect()
    assert len(out) == 1 and out[0].source == TAIL1 and out[0].n_merged == 1


def test_identifier_isolation(spark):
    # sessions are keyed by (tag, identifier): different containers never merge
    df = make_msgs(
        spark,
        [
            {"id": 1, "source": HEAD1, "container_id": "c1", **SPRING},
            {"id": 2, "source": TAIL1, "container_id": "c2", **SPRING},
        ],
    )
    assert concat_sessions(df).count() == 2


def test_unconfigured_tag_passthrough(spark):
    # a tag base with no concat config flows through row-per-row
    df = make_msgs(
        spark,
        [
            {"id": 1, "source": "x", "tag": "junk.sit", "tag_base": "junk"},
            {"id": 2, "source": "y", "tag": "junk.sit", "tag_base": "junk"},
        ],
    )
    assert concat_sessions(df).count() == 2


def test_max_len_split(spark):
    # concator_f.go:197-202: buffer >= max_len flushes; later tails go alone
    df = make_msgs(
        spark,
        [
            {"id": 1, "source": HEAD1, **SPRING},
            {"id": 2, "source": TAIL1, **SPRING},
            {"id": 3, "source": TAIL2, **SPRING},
        ],
    )
    out = rows_by_id(concat_sessions(df, max_len=len(HEAD1) + len(TAIL1)))
    # head absorbs tail1 (buffer crosses max_len AT tail2's check), tail2 alone
    assert set(out) == {1, 3}
    assert out[1].source == HEAD1 + TAIL1
    assert out[3].source == TAIL2
