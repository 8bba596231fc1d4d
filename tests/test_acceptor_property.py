"""Property-based check: spring_retag == first-match rule evaluation
(spring_f.go:96-104) for arbitrary marker placements, and confluence (a
retagged row would never match spring again), which justifies compiling the
re-entry loop into a single when-chain (SURVEY.md §7 risk register)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import make_msgs
from go_fluentd_spark.config import DEFAULT_CONFIG
from go_fluentd_spark.operators.acceptor import spring_retag

PIECES = ["plain text", "- ms:cp", "ms_worker", "other stuff", "cp no marker", "m s_x"]


def expected_tag(source: str, env: str) -> str:
    import re

    for rule in DEFAULT_CONFIG.spring_retag_rules:
        if re.search(rule["regexp"], source):
            return f"{rule['new_tag_base']}.{env}"
    return f"spring.{env}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    parts=st.lists(st.sampled_from(PIECES), min_size=1, max_size=4),
    env=st.sampled_from(["sit", "uat", "prod"]),
)
def test_retag_first_match(spark, parts, env):
    source = " ".join(parts)
    df = make_msgs(
        spark,
        [{"id": 1, "source": source, "tag": f"spring.{env}", "tag_base": "spring", "env": env}],
    )
    got = spring_retag(df, DEFAULT_CONFIG).collect()[0]
    want = expected_tag(source, env)
    assert got.tag == want
    # confluence: the new tag base is never "spring", so a re-entry loop
    # (spring_f.go:101) would be a no-op — the single when-chain is exact
    assert got.tag_base != "spring"
