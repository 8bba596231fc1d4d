"""Property-based check: concat_sessions == a direct pure-Python fold of the
reference concator semantics (concator_f.go:151-206) over arbitrary
head/tail interleavings and container assignments."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import make_msgs
from go_fluentd_spark.operators.concat import concat_sessions

HEAD = "2018-03-06 16:56:22.000 | a | I | t | c.K | 1: H{}"
TAIL = "\tat tail {}"


def python_fold(rows, max_len=None, max_merged=None):
    """Reference semantics: per (tag, container) in id order; head opens a
    session, tail appends (no separator) unless the buffer is full (>= max_len
    chars or >= max_merged rows); lone tails pass through."""
    out = {}
    open_sess = {}
    for rid, container, is_head in sorted(rows):
        src = (HEAD if is_head else TAIL).format(rid)
        key = ("spring.sit", container)
        if is_head:
            open_sess[key] = rid
            out[rid] = [src, []]
        elif key in open_sess:
            head_id = open_sess[key]
            full = (max_len is not None and len(out[head_id][0]) >= max_len) or (
                max_merged is not None and 1 + len(out[head_id][1]) >= max_merged
            )
            if full:
                del open_sess[key]
                out[rid] = [src, []]
            else:
                out[head_id][0] += src
                out[head_id][1].append(rid)
        else:
            out[rid] = [src, []]
    return {k: (v[0], v[1]) for k, v in out.items()}


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # id (dupes filtered below)
        st.sampled_from(["c0", "c1"]),
        st.booleans(),
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=rows_strategy,
    use_max_len=st.booleans(),
    max_merged=st.sampled_from([None, 2, 4]),
)
def test_concat_matches_reference_fold(spark, rows, use_max_len, max_merged):
    max_len = 80 if use_max_len else None
    msgs = [
        {
            "id": rid,
            "container_id": container,
            "source": (HEAD if is_head else TAIL).format(rid),
            "tag": "spring.sit",
            "tag_base": "spring",
            "doc_id": f"d{rid}",
        }
        for rid, container, is_head in rows
    ]
    got = {
        r.id: (r.source, list(r.ext_ids))
        for r in concat_sessions(
            make_msgs(spark, msgs), max_len=max_len, max_merged=max_merged
        ).collect()
    }
    assert got == python_fold(rows, max_len=max_len, max_merged=max_merged)


def test_concat_adversarial_single_container_bounded(spark):
    """One container floods one head with tiny tails: the max_merged guard
    must bound every group's element count (the at-scale collect_list
    concentration guard) while conserving rows."""
    n = 1200
    cap = 100
    msgs = [
        {
            "id": 0,
            "container_id": "hot",
            "source": HEAD.format(0),
            "tag": "spring.sit",
            "tag_base": "spring",
            "doc_id": "d0",
        }
    ] + [
        {
            "id": i,
            "container_id": "hot",
            "source": "x",  # near-empty tail: max_len alone would never fire
            "tag": "spring.sit",
            "tag_base": "spring",
            "doc_id": f"d{i}",
        }
        for i in range(1, n)
    ]
    out = concat_sessions(
        make_msgs(spark, msgs), max_len=300_000, max_merged=cap
    ).collect()
    assert max(r.n_merged for r in out) <= cap
    assert sum(r.n_merged for r in out) == n  # conservation: nothing dropped
    # the first session absorbed exactly cap rows; the rest passed alone
    assert sorted(r.n_merged for r in out)[-1] == cap
