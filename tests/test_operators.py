"""Operator-level tests: text stats, dedup families, similarity."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nominatim_spark.operators import dedup, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox leaps over the lazy dog", "en"),  # near dup
        (4, "der hund und die katze sind nicht da", "de"),
        (5, "12345 67890 !!!", "und"),
        (6, "completely different content about spark query engines", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_stats(spark, docs):
    out = {r.doc_id: r for r in textstats.with_token_stats(docs).collect()}
    assert out[1].n_tokens == 9
    assert out[5].digit_ratio > 0.5
    assert out[1].punct_ratio == 0.0


def test_lang_id(spark, docs):
    out = {r.doc_id: r.lang_pred for r in textstats.with_lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[4] == "de"
    assert out[5] == "und"


def test_quality_monotonic(spark, docs):
    out = {r.doc_id: r.quality for r in textstats.with_quality_score(docs).collect()}
    assert out[1] > out[5]  # real sentence beats digit soup
    assert 0.0 <= min(out.values()) and max(out.values()) <= 1.0


def test_fingerprint_matches_reference_impl(spark, docs):
    # independent pure-python reimplementation of the rolling hash
    def fp(text):
        toks = [w for w in "".join(
            c if c.isalnum() and c.isascii() or c == " " else " "
            for c in text.lower()).split(" ") if w]
        acc = 0
        for w in toks:
            h = int(hashlib.md5(w.encode()).hexdigest()[:textstats.HASH_HEX], 16)
            acc = (acc * textstats.FP_BASE + h) % textstats.FP_MOD
        return acc

    out = {r.doc_id: r.fingerprint
           for r in textstats.with_fingerprint(docs).collect()}
    rows = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, text in rows.items():
        assert out[doc_id] == fp(text), doc_id
    assert out[1] == out[2]       # identical docs -> identical fingerprint
    assert out[1] != out[3]       # order/content sensitive


def test_simhash_near_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_pairs(docs, max_hamming=4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0   # exact dup
    assert (1, 3) in pairs                          # near dup within 4 bits
    assert (1, 6) not in pairs                      # unrelated


def test_ngram_jaccard(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.jacc
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 6) not in pairs


def test_ngram_jaccard_df_cap_equals_brute_on_planted_dups(spark, docs):
    """With a cap above every shingle's document frequency the capped
    form is bit-equal to brute force; with cap 0 every shingle drops and
    no pair survives (the recall trade is total by construction)."""
    brute = {(r.doc_a, r.doc_b): r.jacc
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    capped = {(r.doc_a, r.doc_b): r.jacc
              for r in dedup.ngram_jaccard_pairs(
                  docs, threshold=0.3, max_df=1000).collect()}
    assert brute == capped and (1, 2) in capped
    assert not dedup.ngram_jaccard_pairs(docs, threshold=0.3,
                                         max_df=0).collect()


def test_embedding_neardup_and_lsh(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),     # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.doc_a, r.doc_b): r.cos_r
             for r in dedup.embedding_neardup_pairs(emb, threshold=0.9).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert len(pairs) == 1
    # LSH buckets: identical-direction vectors share a bucket; opposite don't
    buckets = {r.vec_id: r.bucket
               for r in dedup.embedding_lsh_buckets(emb).collect()}
    assert buckets[1] == buckets[2]
    assert buckets[1] != buckets[4]


def test_minhash_bands_deterministic(spark, docs):
    from nominatim_spark.plans.gate import q_minhash_lsh  # noqa: F401 (registry form)
    # two runs over different partitionings agree
    from nominatim_spark.operators.textstats import tokens_col  # smoke import
    a = dedup.simhash(docs).collect()
    b = dedup.simhash(docs.repartition(5)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
