"""Hot-tag skew handling: one tag dominates traffic (the prod norm,
reference docs/quickstart.md:122-127 — a single tag ≈ 100% of msgs).
Partitioning sink writes by tag alone would put the hot tag's entire
volume in one task; salting with pmod(xxhash64(doc_id), S) spreads it."""

from pyspark.sql import functions as F

from go_fluentd_spark.plans import pipeline as P


def partition_sizes(df, *cols):
    return [
        r.n
        for r in df.repartition(16, *cols)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_salting_defuses_hot_tag(spark, sf_dir):
    df = P.enriched(spark, sf_dir).select("doc_id", "tag").persist()
    try:
        total = df.count()
        by_tag = partition_sizes(df, F.col("tag"))
        salted = partition_sizes(
            df, F.col("tag"), F.pmod(F.xxhash64("doc_id"), F.lit(8))
        )
        imb_tag = max(by_tag) / (total / 16)
        imb_salt = max(salted) / (total / 16)
        # app.spring is ~66% of routed rows -> tag-only partitioning is
        # badly imbalanced; salting must cut the max-partition ratio sharply
        assert imb_tag > 3.0, (imb_tag, by_tag)
        assert imb_salt < imb_tag / 2, (imb_salt, salted)
    finally:
        df.unpersist()


def test_substr_dup_spans_hot_gram(spark, tmp_path):
    """Adversarial HOT-GRAM corpus for substr_dup_spans (VERDICT r5 #1):
    hundreds of docs share an IDENTICAL token stream, so every one of their
    8-grams occurs in every one of them — the single-gram occurrence count
    is ~|corpus|, the shape that made the previous min/max-window-over-gram
    formulation put the whole corpus into one task's sort.  The de-skewed
    groupBy + semi-join form must produce exactly the brute-force expected
    spans/cut for every doc (hot docs AND unique-stream controls).

    Construction: did = k * 50257 gives did ≡ 0 (mod 50257) — ONE shared
    token stream for every hot doc (lengths vary; every gram of a shorter
    doc occurs in all longer ones); a few small unique dids are the
    non-duplicated controls.  dids stay < 10^8 (the doc_id seq field is
    lpad'd to 8 chars)."""
    from go_fluentd_spark.operators.dataprep import (
        SUBSTR_CUT_MIN,
        TOKEN_B,
        TOKEN_NGRAM,
        TOKEN_P,
        substr_dup_spans,
    )

    hot = [k * 50257 for k in range(1, 500)]
    uniq = [3, 7, 11, 123, 4567]
    dids = hot + uniq
    sf = tmp_path / "hotgram"
    sf.mkdir()
    spark.createDataFrame(
        [(d,) for d in dids], "o_orderkey bigint"
    ).write.parquet(str(sf / "orders.parquet"))

    # pure-Python brute force with the exact synth + gram arithmetic
    L = TOKEN_NGRAM
    toks = {}
    for did in dids:
        n = 1 + (did * 131071) % (512 if did % 10 == 0 else 64)
        toks[did] = [(did * 2654435761 + i * 40503) % 50257 for i in range(n)]
    gram_docs: dict[int, set] = {}
    gram_pos: dict[int, list] = {}
    for did, ts in toks.items():
        lst = []
        for i in range(len(ts) - (L - 1)):
            acc = 0
            for j in range(L):
                acc = (acc * TOKEN_B + ts[i + j]) % TOKEN_P
            lst.append((i + 1, acc))
            gram_docs.setdefault(acc, set()).add(did)
        gram_pos[did] = lst
    expected = {}
    for did, ts in toks.items():
        dup_pos = [p for p, g in gram_pos[did] if len(gram_docs[g]) > 1]
        runs: list[list[int]] = []
        for p in dup_pos:
            if not runs or p - runs[-1][-1] > L:
                runs.append([p])
            else:
                runs[-1].append(p)
        spans = [(r[0], r[-1] + L - 1) for r in runs]
        dup_tok = sum(e - s + 1 for s, e in spans)
        cut = [(s, e) for s, e in spans if e - s + 1 >= SUBSTR_CUT_MIN]
        kept = [
            t
            for i, t in enumerate(ts)
            if not any(s <= i + 1 <= e for s, e in cut)
        ]
        expected[did] = (
            len(ts),
            len(spans),
            max((e - s + 1 for s, e in spans), default=0),
            dup_tok,
            len(kept),
            ",".join(str(t) for t in kept),
        )

    # hot docs whose stream is a prefix of a longer hot doc's are fully
    # covered by ONE span and (when long enough) fully cut — assert the
    # adversarial construction really produced that case
    fully_cut = [
        d
        for d, (n, ns, mx, dup, nk, _) in expected.items()
        if d in set(hot)
        and n >= SUBSTR_CUT_MIN
        and (ns, mx, dup, nk) == (1, n, n, 0)
    ]
    assert len(fully_cut) > 100, len(fully_cut)

    out = substr_dup_spans(spark, str(sf)).collect()
    assert len(out) == len(dids)
    for r in out:
        did = int(r.doc_id.rsplit("-", 1)[-1])
        n_tok, n_spans, mx, dup_tok, n_kept, kept_csv = expected[did]
        assert (r.n_tok, r.n_spans, r.max_span_tok, r.dup_tok) == (
            n_tok, n_spans, mx, dup_tok,
        ), did
        assert (r.n_tok_kept, r.kept_csv) == (n_kept, kept_csv), did
        assert abs(r.dup_frac - dup_tok / n_tok) < 5.1e-5, did
