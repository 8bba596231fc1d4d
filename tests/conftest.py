import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_fluentd_spark.session import build_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_spark("tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def make_msgs(spark, rows):
    """rows: list of dicts with any of doc_id, source, tag, container_id, id;
    fills pipeline-required columns with defaults."""
    defaults = {
        "doc_id": "x",
        "tokens": [1, 2, 3],
        "n_tok": 3,
        "source": "",
        "tag": "app.spring.sit",
        "container_id": "c0",
        "id": 0,
        "env": "sit",
        "tag_base": "app.spring",
    }
    full = [{**defaults, **r} for r in rows]
    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "tag string, container_id string, id bigint, env string, tag_base string"
    )
    return spark.createDataFrame(
        [tuple(r[k] for k in defaults) for r in full], schema
    )
