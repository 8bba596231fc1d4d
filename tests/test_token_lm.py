"""token_lm_scores (bigram-LM corpus-fit / perplexity-filter signal):
oracle-grade DuckDB parity (the op is NOT in the 50-entry driver registry,
so its cross-engine evidence lives here) plus semantic properties."""

import duckdb
import pandas as pd
from pyspark.sql import Row, functions as F

from go_fluentd_spark import oracle_dataprep as OD
from go_fluentd_spark.operators import dataprep as DP


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    # same normalization as tools/verify_local.py
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notna(df), None)
    df = df.map(lambda v: f"{v:.6f}" if isinstance(v, float) else str(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_token_lm_scores_duckdb_parity(spark, sf_dir):
    """Value-identical to the DuckDB twin over the same parquet (the same
    rows+columns+values contract verify_local enforces for registry
    queries)."""
    sdf = DP.token_lm_scores(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ddf = con.execute(OD.q_token_lm_scores()).fetchdf()
    a, b = _norm(sdf), _norm(ddf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) == len(sdf)
    assert a.equals(b)
    # the signal is non-degenerate on real text (unlike the synth sequence
    # table, whose arithmetic token streams make every transition certain)
    assert (sdf["avg_logprob"] != 0).any()


def test_token_lm_scores_semantics(spark, tmp_path):
    """Hand-checkable corpus: fully-predictable transitions score 0; a doc
    containing the corpus's one surprising transition scores below the
    rest; every doc appears exactly once, including the sub-bigram doc."""
    rows = [
        # docs 1-2 use tokens u/v only, and u is only ever followed by v,
        # v only by u (corpus-wide) -> every transition certain, score 0
        Row(doc_id=1, text="u v u v u v", lang="en", source="t", n_chars=11),
        Row(doc_id=2, text="u v u v", lang="en", source="t", n_chars=7),
        # doc 3: p is followed by q once and r once -> two ln(1/2) terms,
        # (q,p) certain -> one 0 term
        Row(doc_id=3, text="p q p r", lang="en", source="t", n_chars=7),
        Row(doc_id=4, text="x", lang="en", source="t", n_chars=1),  # no bigram
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(p)
    out = {
        r["doc_id"]: r
        for r in DP.token_lm_scores(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_logprob"] == 0.0
    assert out[1]["avg_logprob"] == 0.0 and out[2]["avg_logprob"] == 0.0
    import math

    half_q = round(round(math.log(0.5), 4) * DP.LM_LOGPROB_SCALE)
    assert out[3]["n_bigrams"] == 3
    assert out[3]["sum_logprob_q"] == 2 * half_q
    assert out[3]["avg_logprob"] < out[1]["avg_logprob"]


def test_token_lm_scores_adversarial_skew(spark, tmp_path):
    """Hot-key correctness: one document is a single token repeated 5,000
    times — its (z,z) bigram is a massive hot key in both the count groupBy
    and the count join (map-side combine + AQE absorb it; this pins the
    VALUES stay right under that skew).  z only ever follows z, so the doc
    still scores a perfect 0; a small doc sharing z as context gets the
    minority penalty ln(1/c(z)) for its one (z,y) transition."""
    from pyspark.sql import Row

    hot = " ".join(["z"] * 5000)
    rows = [
        Row(doc_id=1, text=hot, lang="en", source="t", n_chars=len(hot)),
        Row(doc_id=2, text="z y", lang="en", source="t", n_chars=3),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(p)
    out = {
        r["doc_id"]: r
        for r in DP.token_lm_scores(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_bigrams"] == 4999
    # c(z,z)=4999, c(z,y)=1, c(z)=5000: doc 1's terms are all
    # ln(4999/5000) ~ -0.0002 -> quantized -2 each
    import math

    zz_q = round(round(math.log(4999 / 5000), 4) * DP.LM_LOGPROB_SCALE)
    assert out[1]["sum_logprob_q"] == 4999 * zz_q
    zy_q = round(round(math.log(1 / 5000), 4) * DP.LM_LOGPROB_SCALE)
    assert out[2]["sum_logprob_q"] == zy_q
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"] < 0


def test_token_lm_scores_mass_conservation(spark, sf_dir):
    """Σ n_bigrams over docs == Σ (n_toks - 1) over docs with >= 2 tokens —
    the explode lost nothing and the count join dropped no bigram."""
    d = DP.docs(spark, sf_dir).select(
        F.size(
            F.regexp_extract_all(
                DP.norm_text(F.col("text")), F.lit(DP.BPE_TOKEN_RE), 0
            )
        ).alias("n")
    )
    expected = (
        d.filter(F.col("n") >= 2).agg(F.sum(F.col("n") - 1)).collect()[0][0]
    )
    got = (
        DP.token_lm_scores(spark, sf_dir)
        .agg(F.sum("n_bigrams"))
        .collect()[0][0]
    )
    assert got == expected
