"""Contrastive-training samplers (llm/similarity.py): hard-negative
mining and deterministic random negative sampling."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark.llm.similarity import (
    cosine_topk,
    hard_negatives,
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
