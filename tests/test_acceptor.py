"""Acceptor chain semantics (reference internal/acceptorfilters/)."""

from conftest import make_msgs

from go_fluentd_spark.config import DEFAULT_CONFIG
from go_fluentd_spark.operators.acceptor import (
    accept_whitelist,
    acceptor_chain,
    spark_filter,
    spring_retag,
)


def test_spark_ignore_regex_drop(spark):
    # spark_f.go:44-68 + settings.yml:641
    df = make_msgs(
        spark,
        [
            {"id": 1, "source": "2018-03-06 16:56:22,514 [x", "tag": "spark.sit", "tag_base": "spark"},
            {"id": 2, "source": "2018/03/06 16:56:22.514 ok", "tag": "spark.sit", "tag_base": "spark"},
            # non-spark rows never touched even if the pattern matches
            {"id": 3, "source": "2018-03-06 16:56:22,514 [x", "tag": "app.spring.sit"},
        ],
    )
    ids = {r.id for r in spark_filter(df, DEFAULT_CONFIG).collect()}
    assert ids == {2, 3}


def test_spring_retag_first_match_order(spark):
    # spring_f.go:79-107 + settings.yml:650-656: cp rule wins over bot rule
    df = make_msgs(
        spark,
        [
            {"id": 1, "source": "x - ms:cp and ms_also", "tag": "spring.sit", "tag_base": "spring"},
            {"id": 2, "source": "hello ms_bot here", "tag": "spring.uat", "tag_base": "spring", "env": "uat"},
            {"id": 3, "source": "plain spring line", "tag": "spring.prod", "tag_base": "spring", "env": "prod"},
            {"id": 4, "source": "x - ms:cp", "tag": "connector.sit", "tag_base": "connector"},
        ],
    )
    out = {r.id: r.tag for r in spring_retag(df, DEFAULT_CONFIG).collect()}
    assert out == {
        1: "cp.sit",        # rule 1 fires first
        2: "bot.uat",       # rule 2, env substituted per-row
        3: "app.spring.prod",  # catch-all
        4: "connector.sit",  # non-spring rows untouched
    }


def test_whitelist(spark):
    # default_f.go:64-79
    df = make_msgs(
        spark,
        [
            {"id": 1, "tag": "app.spring.sit", "tag_base": "app.spring"},
            {"id": 2, "tag": "junkapp.sit", "tag_base": "junkapp"},
            {"id": 3, "tag": "", "tag_base": ""},
        ],
    )
    ids = {r.id for r in accept_whitelist(df, DEFAULT_CONFIG).collect()}
    assert ids == {1}


def test_chain_end_to_end(spark):
    df = make_msgs(
        spark,
        [{"id": 1, "source": "has - ms:cp marker", "tag": "spring.sit", "tag_base": "spring"}],
    )
    out = acceptor_chain(df, DEFAULT_CONFIG).collect()
    assert len(out) == 1 and out[0].tag == "cp.sit" and out[0].tag_base == "cp"
