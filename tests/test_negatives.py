"""Contrastive-training samplers (llm/similarity.py): hard-negative
mining and deterministic random negative sampling."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark.llm.similarity import (
    anchor_positives_lsh,
    cosine_topk,
    hard_negatives,
    hard_negatives_lsh,
    negative_pairs,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestHardNegatives:
    def test_matches_numpy_model(self, spark):
        emb = _emb(spark).limit(60).cache()
        rows_in = emb.collect()
        ids = np.array([r["vec_id"] for r in rows_in])
        labels = np.array([r["label"] for r in rows_in])
        m = np.array([r["embedding"] for r in rows_in], dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ m.T, 6)
        got = {
            (r["anchor_id"], r["rank"]): r["neg_id"]
            for r in hard_negatives(emb, k=1).collect()
        }
        for i in range(len(ids)):
            mask = (labels != labels[i]) & (ids != ids[i])
            cand = np.where(mask)[0]
            # rank by (sim desc, id asc) -- replicate the tie-break
            order = sorted(cand, key=lambda j: (-sims[i, j], ids[j]))
            assert got[(ids[i], 1)] == ids[order[0]]

    def test_excludes_same_label(self, spark):
        emb = _emb(spark).limit(80)
        out = hard_negatives(emb, k=2).collect()
        assert out, "expected at least one hard negative"
        for r in out:
            assert r["anchor_label"] != r["neg_label"]
            assert r["anchor_id"] != r["neg_id"]


class TestNegativePairs:
    def test_candidate_ids_match_python_model(self, spark):
        emb = _emb(spark).cache()
        n = emb.agg(F.max("vec_id")).head()[0] + 1
        labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
        got = {
            (r["anchor_id"], r["slot"]): (r["neg_id"], r["neg_label"])
            for r in negative_pairs(emb, k=4).collect()
        }
        n_expected = 0
        for aid, alabel in labels.items():
            for j in range(4):
                h = int(hashlib.md5(f"{aid}|{j}".encode()).hexdigest()[:15], 16)
                cid = h % n
                if cid in labels and cid != aid and labels[cid] != alabel:
                    n_expected += 1
                    assert got[(aid, j)] == (cid, labels[cid])
                else:
                    assert (aid, j) not in got
        assert n_expected == len(got) > 0

    def test_deterministic_across_runs(self, spark):
        emb = _emb(spark)
        a = sorted(tuple(r) for r in negative_pairs(emb, k=2).collect())
        b = sorted(tuple(r) for r in negative_pairs(emb, k=2).collect())
        assert a == b

    def test_candidate_join_is_hash_equi(self, spark):
        plan = (
            negative_pairs(_emb(spark), k=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the id-resolution join must be an equi join, never a product
        assert "cand_id" in plan
        assert "CartesianProduct" not in plan
        # single BNLJ allowed: the single-row id-space bound broadcast
        assert plan.count("BroadcastNestedLoopJoin") <= 1


class TestLshMiningTiers:
    """LSH-bucketed scale tiers vs their exact crossJoin baselines:
    precision is exact by construction (every emitted pair is truly
    scored), recall is bounded below."""

    def _exact_positive(self, spark, emb):
        from pyspark.sql import Window

        q = emb.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("embedding").alias("__qv"),
            F.col("label").alias("anchor_label"),
        )
        c = emb.select(
            F.col("vec_id").alias("pos_id"),
            F.col("embedding").alias("__cv"),
            F.col("label").alias("pos_label"),
        )
        from uofi_payroll_etl_main_spark.llm.similarity import dot, l2_norm

        pairs = q.crossJoin(c).filter(
            (F.col("anchor_id") != F.col("pos_id"))
            & (F.col("anchor_label") == F.col("pos_label"))
        )
        sim = F.round(
            dot(F.col("__qv"), F.col("__cv"))
            / (l2_norm(F.col("__qv")) * l2_norm(F.col("__cv"))),
            6,
        )
        w = Window.partitionBy("anchor_id").orderBy(F.desc("similarity"), F.asc("pos_id"))
        return (
            pairs.withColumn("similarity", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 1)
        )

    def test_positive_recall_vs_exact(self, spark):
        emb = _emb(spark).cache()
        exact = {r["anchor_id"]: r["pos_id"] for r in self._exact_positive(spark, emb).collect()}
        approx = {
            r["anchor_id"]: r["cand_id"]
            for r in anchor_positives_lsh(emb, k=1).collect()
        }
        hits = sum(1 for a, p in exact.items() if approx.get(a) == p)
        recall = hits / len(exact)
        assert recall >= 0.9, f"positive recall {recall:.3f} < 0.9"
        # precision-exactness: every emitted pair shares the label
        for r in anchor_positives_lsh(emb, k=1).collect():
            assert r["anchor_label"] == r["cand_label"]

    def test_negative_recall_vs_exact(self, spark):
        emb = _emb(spark).cache()
        exact = {
            (r["anchor_id"], r["rank"]): r["neg_id"]
            for r in hard_negatives(emb, k=1).collect()
        }
        approx = {
            (r["anchor_id"], r["rank"]): r["cand_id"]
            for r in hard_negatives_lsh(emb, k=1).collect()
        }
        hits = sum(1 for key, n in exact.items() if approx.get(key) == n)
        recall = hits / len(exact)
        assert recall >= 0.9, f"negative recall {recall:.3f} < 0.9"
        for r in hard_negatives_lsh(emb, k=1).collect():
            assert r["anchor_label"] != r["cand_label"]
            assert r["anchor_id"] != r["cand_id"]

    def test_no_cross_join_in_plan(self, spark):
        emb = _emb(spark)
        for tier in (anchor_positives_lsh, hard_negatives_lsh):
            plan = tier(emb, k=1)._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
