"""Training-data pipeline ops: dedup / ANN / multimodal properties.

Oracle-checked fixtures run in the driver gate; here we test the
probabilistic paths' guarantees (LSH recall, SimHash band completeness,
MinHash == exact at threshold) and the multimodal plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.pipeline import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _pairs(df):
    return sorted((r.id_a, r.id_b) for r in df.collect())


class TestDedup:
    def test_exact_dedup_drops_planted_dups(self, spark, docs):
        with_dups = docs.unionByName(
            docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
        )
        kept = dedup.exact_dedup(with_dups)
        assert kept.count() == docs.count()
        # lowest id survives
        assert kept.where("doc_id >= 100000").count() == 0

    def test_minhash_equals_exact_jaccard(self, spark, docs):
        exact = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.7, max_df_frac=1.0))
        lsh = _pairs(dedup.minhash_lsh_pairs(docs, threshold=0.7))
        assert lsh == exact
        assert len(exact) > 0  # corpus has planted near-dups

    def test_ngram_df_cap_keeps_high_pairs(self, spark):
        """On a realistic vocab (rare tokens + stop-like hot tokens in every
        doc), df-capping the join keeps the near-dup pairs while pruning the
        all-docs-share-a-token join skew."""
        hot = "the of and"
        rows = [
            (0, f"{hot} alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, f"{hot} alpha beta gamma delta epsilon zeta eta theta kappa"),
            (2, f"{hot} red green blue cyan magenta yellow black white gray"),
            (3, f"{hot} red green blue cyan magenta yellow black white brown"),
            (4, f"{hot} one two three four five six seven eight nine"),
            (5, f"{hot} monday tuesday wednesday thursday friday sat sun jan feb"),
        ]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        full = _pairs(dedup.ngram_jaccard_pairs(d, threshold=0.7, max_df_frac=1.0))
        capped = _pairs(
            dedup.ngram_jaccard_pairs(d, threshold=0.7, max_df_frac=0.5, min_df_docs=0)
        )
        # default cap on a tiny corpus: the min_df_docs floor keeps every
        # token (5% of 6 docs would strip all), so results stay exact
        dflt = _pairs(dedup.ngram_jaccard_pairs(d, threshold=0.7))
        assert full == [(0, 1), (2, 3)]
        assert capped == [(0, 1), (2, 3)]
        assert dflt == [(0, 1), (2, 3)]

    def test_simhash_bands_complete_at_h3(self, spark, docs):
        """4x16 banding guarantees every pair with hamming <= 3 is found."""
        import numpy as np

        sims = {r.id: np.uint64(r.sim) for r in dedup.simhash(docs).collect()}
        ids = sorted(sims)
        brute = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                h = bin(int(sims[a] ^ sims[b])).count("1")
                if h <= 3:
                    brute.add((a, b))
        got = {
            (r.id_a, r.id_b)
            for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
        }
        assert got == brute

    def test_embedding_pairs_threshold(self, spark, emb):
        pairs = dedup.embedding_dup_pairs(emb, threshold=0.45).collect()
        assert all(r.cosine >= 0.45 for r in pairs)


class TestAnn:
    def test_lsh_recall(self, spark, emb, queries):
        brute = similarity.brute_force_topk(emb, queries, k=5)
        lsh = similarity.lsh_topk(emb, queries, k=5, bits=6, n_tables=8)
        bset = {(r.query_id, r.vec_id) for r in brute.collect()}
        lset = {(r.query_id, r.vec_id) for r in lsh.collect()}
        recall = len(bset & lset) / len(bset)
        assert recall >= 0.6, f"LSH recall {recall}"

    def test_ivf_recall_and_determinism(self, spark, emb, queries):
        c1, cents1 = similarity.ivf_index(emb, n_centroids=8, iters=2)
        c2, cents2 = similarity.ivf_index(emb, n_centroids=8, iters=2)
        assert cents1 == cents2  # deterministic quantizer
        brute = similarity.brute_force_topk(emb, queries, k=5)
        ivf = similarity.ivf_topk(c1, cents1, queries, k=5, n_probe=4)
        bset = {(r.query_id, r.vec_id) for r in brute.collect()}
        iset = {(r.query_id, r.vec_id) for r in ivf.collect()}
        assert len(bset & iset) / len(bset) >= 0.6

    def test_ivf_probe_all_equals_brute(self, spark, emb, queries):
        clustered, cents = similarity.ivf_index(emb, n_centroids=4, iters=1)
        ivf = similarity.ivf_topk(clustered, cents, queries, k=5, n_probe=4)
        brute = similarity.brute_force_topk(emb, queries, k=5)
        assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, brute.collect()))


class TestMultimodal:
    def test_feature_extraction_schema_and_determinism(self, spark):
        media = multimodal.synth_media(spark, n=32, partitions=4)
        f1 = multimodal.extract_features(media).orderBy("media_id").collect()
        f2 = multimodal.extract_features(media).orderBy("media_id").collect()
        assert [r.media_id for r in f1] == list(range(32))
        assert all(len(r.feat) == 8 for r in f1)
        assert all(r.n_bytes == 32 for r in f1)  # sha2-256 payload
        assert [r.feat for r in f1] == [r.feat for r in f2]

    def test_decode_stub_gate(self, spark):
        media = multimodal.synth_media(spark, n=4, partitions=1)
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            multimodal.extract_features(media, decode_stub=False).collect()

    def test_frame_sample_plan(self, spark):
        media = multimodal.synth_media(spark, n=30, partitions=2)
        frames = multimodal.frame_sample(media, every_ms=500)
        rows = frames.groupBy("media_id").count().collect()
        meta = {r.media_id: r.meta.duration_ms for r in media.where("kind='video'").collect()}
        for r in rows:
            expect = (meta[r.media_id] - 1) // 500 + 1
            assert r["count"] == expect
