"""Cap-engagement gate over the staged skewed corpus (r5 verdict #2).

The full evidence (capped-vs-uncapped volumes + parity at sf0.01/sf0.1)
lives in tools/skew_cap_audit.py and the committed SKEW_CAP_AUDIT_r5
logs; these tests keep the core engagement facts red-able on every
pytest run at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grouper_spark.functions.text import tokens
from grouper_spark.queries.skew import (
    _LSH_MAX_BUCKET,
    _SHINGLE_MAX_DF,
    _TFIDF_MAX_DF,
    skewed_docs,
)


def test_skew_corpus_has_hot_classes(spark, sf_dir):
    d = skewed_docs(spark, sf_dir)
    n = d.count()
    df = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    hot = {r["tok"]: r["df"] for r in df.filter(F.col("df") > _TFIDF_MAX_DF).collect()}
    # injected stop token and spam tokens exceed the cap at every sf
    assert hot.get("zhot", 0) > _TFIDF_MAX_DF
    assert hot.get("zspama", 0) == n // 5 > _LSH_MAX_BUCKET
    # content tokens all stay under the cap
    assert not any(t.startswith("tok") for t in hot)


def test_tfidf_cap_changes_results_and_bounds_candidates(spark, sf_dir):
    from grouper_spark.operators.similarity import tfidf_knn

    d = skewed_docs(spark, sf_dir).localCheckpoint()
    capped = tfidf_knn(
        d, "doc_id", "text", k=3, query_max_id=20, max_df=_TFIDF_MAX_DF
    )
    uncapped = tfidf_knn(d, "doc_id", "text", k=3, query_max_id=20)
    c = {(r["doc_a"], r["rk"]): r["doc_b"] for r in capped.collect()}
    u = {(r["doc_a"], r["rk"]): r["doc_b"] for r in uncapped.collect()}
    # the cap must actually change neighbor sets (it dropped a token
    # that carried nonzero idf weight) — engagement, not a no-op
    assert c != u


def test_shingle_cap_keeps_dup_cluster_drops_hot_phrase(spark, sf_dir):
    from grouper_spark.operators.dedup import shingle_jaccard_pairs

    d = skewed_docs(spark, sf_dir).localCheckpoint()
    pairs = shingle_jaccard_pairs(
        d, "doc_id", "text", n=3, max_df=_SHINGLE_MAX_DF
    )
    dup_ids = {
        r["doc_id"]
        for r in d.filter(
            (F.col("doc_id") < 40)
            & (F.col("doc_id") % 2 == 1)
            & (F.col("doc_id") % 5 != 3)
        ).collect()
    }
    perfect = pairs.filter(F.col("jaccard") == 1.0)
    got = {(r["doc_a"], r["doc_b"]) for r in perfect.collect()}
    want = {
        (a, b) for a in dup_ids for b in dup_ids if a < b
    }
    # all 120 dup-cluster pairs survive the cap at jaccard 1.0
    assert want <= got
    # hot-phrase docs don't pair up through the (dropped) hot shingles:
    # capped pair count is far below the uncapped hot-class blowup
    n = d.count()
    assert pairs.count() < (0.4 * n) ** 2 / 4


@pytest.fixture(scope="module")
def registry():
    from grouper_spark.queries import load_all

    return load_all()


def test_minhash_bucket_cap_drops_spam_bucket(spark, sf_dir, registry):
    out = registry["a550_skew_minhash_capped"].fn(spark, sf_dir)
    rows = out.collect()
    spam_ids = {i for i in range(5000) if i % 5 == 3}
    # no candidate pair is spam×spam: the mega-bucket was dropped
    assert not any(
        r["doc_a"] in spam_ids and r["doc_b"] in spam_ids for r in rows
    )
    # the dup cluster's 120 pairs all surface with all 8 sigs equal
    n_dup_perfect = sum(1 for r in rows if r["n_eq_sigs"] == 8)
    assert n_dup_perfect >= 120
