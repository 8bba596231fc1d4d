"""Property test: the vectorized streaming concat fold (`_concat_fold`)
must match a row-at-a-time sequential reference fold — the direct
restatement of the reference concator loop
(``internal/tagfilters/concator_f.go:140-207``) — on every input shape:
head/tail interleavings, lone tails, max_len / max_merged overflow
eviction, sessions split across micro-batches (state carry), and the gap
timeout flush.  Runs without a SparkSession (drives the fold with a fake
GroupState), so the whole property sweep is fast."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings, strategies as st

from go_fluentd_spark.streaming.stream_pipeline import _concat_fold

_RX = {"test": re.compile(r"^H")}
_KEY = ("test.prod", "c0")


class FakeState:
    """Mimics pyspark GroupState for driving the fold directly."""

    def __init__(self):
        self._v = None
        self.timed_out = False
        self.timeout_armed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    @property
    def hasTimedOut(self):
        return self.timed_out

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None
        self.timeout_armed = False

    def setTimeoutDuration(self, ms):
        self.timeout_armed = True


def _mk_rows(sources: list[str]) -> list[dict]:
    return [
        {
            "id": i,
            "doc_id": f"d{i}",
            "tokens": [i, i + 1],
            "n_tok": 2,
            "env": "prod",
            "tag_base": "test",
            "source": s,
        }
        for i, s in enumerate(sources)
    ]


def _sequential(rows, batches_bounds, max_len, max_merged):
    """Reference fold: the original per-row loop incl. cross-batch state
    carry and a final gap-timeout flush.  Returns flushed rows as tuples."""
    out = []
    open_sess = None

    def flush(sess):
        out.append(
            (sess["id"], sess["source"], 1 + len(sess["ext_ids"]),
             tuple(sess["ext_ids"]))
        )

    for lo, hi in batches_bounds:
        for r in rows[lo:hi]:
            row = dict(r, ext_ids=[])
            is_head = bool(_RX["test"].match(r["source"]))
            if is_head:
                if open_sess is not None:
                    flush(open_sess)
                open_sess = row
            elif open_sess is None:
                flush(row)
            elif (
                len(open_sess["source"]) >= max_len
                or 1 + len(open_sess["ext_ids"]) >= max_merged
            ):
                flush(open_sess)
                open_sess = None
                flush(row)
            else:
                open_sess["source"] += r["source"]
                open_sess["ext_ids"].append(r["id"])
    if open_sess is not None:  # gap timeout
        flush(open_sess)
    return sorted(out)


def _vectorized(rows, batches_bounds, max_len, max_merged):
    state = FakeState()
    got = []

    def run(chunk_rows):
        pdf = pd.DataFrame(chunk_rows) if chunk_rows else pd.DataFrame()
        frames = list(
            _concat_fold(
                _KEY, iter([pdf] if len(pdf) else []), state,
                compiled=_RX, max_len=max_len, max_merged=max_merged,
                gap_ms=5000,
            )
        )
        for f in frames:
            for r in f.itertuples(index=False):
                got.append(
                    (int(r.id), r.source, int(r.n_merged),
                     tuple(int(x) for x in r.ext_ids))
                )

    for lo, hi in batches_bounds:
        run(rows[lo:hi])
    if state.exists:  # fire the gap timeout
        state.timed_out = True
        run([])
    return sorted(got)


@given(
    sources=st.lists(
        st.text(alphabet="Htx", min_size=0, max_size=6).map(
            lambda s: s or "t"
        ),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=4),
    max_len=st.integers(min_value=1, max_value=12),
    max_merged=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=300, deadline=None)
def test_vectorized_fold_matches_sequential(sources, cuts, max_len, max_merged):
    rows = _mk_rows(sources)
    bounds_pts = sorted({0, len(rows), *[min(c, len(rows)) for c in cuts]})
    bounds = list(zip(bounds_pts, bounds_pts[1:]))
    assert _vectorized(rows, bounds, max_len, max_merged) == _sequential(
        rows, bounds, max_len, max_merged
    )


def test_unconfigured_tag_passthrough():
    rows = _mk_rows(["Ha", "tb", "tc"])
    state = FakeState()
    pdf = pd.DataFrame(rows)
    frames = list(
        _concat_fold(
            ("junk.prod", "c0"), iter([pdf]), state,
            compiled=_RX if False else {}, max_len=100, max_merged=10,
            gap_ms=5000,
        )
    )
    out = pd.concat(frames)
    assert len(out) == 3
    assert (out["n_merged"] == 1).all()
    assert not state.exists


def test_timeout_with_no_carry_emits_empty():
    state = FakeState()
    state.timed_out = True
    frames = list(
        _concat_fold(
            _KEY, iter([]), state, compiled=_RX, max_len=100,
            max_merged=10, gap_ms=5000,
        )
    )
    assert sum(len(f) for f in frames) == 0
