#!/usr/bin/env python
"""One-off decomposition of dedup_clusters_incremental's warm fold:
materialize each intermediate with count() and time it, so the 9.5s
warm cost is attributed to sections rather than guessed from stage
metrics.  Mirrors queries/round12.py exactly (same constants/builders).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffiec_pq_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = get_spark("dci_decompose")
    spark.sparkContext.setLogLevel("WARN")

    from ffiec_pq_spark.operators.dedup import (
        _project_jaccard,
        connected_components,
        doc_shingles,
        lsh_bands,
        minhash_signatures,
    )
    from ffiec_pq_spark.queries.dedup import (
        _K,
        _N_BANDS,
        _N_PERM,
        _ROWS_PER_BAND,
        _THRESHOLD,
    )
    from ffiec_pq_spark.queries.round9c import _INC_BATCH_MIN, _INC_MOD
    from ffiec_pq_spark.queries.round12 import (
        _groups_with_hash,
        _inc_corpus_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter((F.col("doc_id") % _INC_MOD) >= _INC_BATCH_MIN)

    t0 = time.perf_counter()
    st = _inc_corpus_state(spark, sf_dir)
    print(f"[state build (cold-only)]        {time.perf_counter()-t0:7.3f}s")
    cg, cq, sh_c, bands_c = st["cg"], st["cq"], st["sh_c"], st["bands_c"]

    def mark(label, df=None, fn=None):
        t0 = time.perf_counter()
        n = fn() if fn else df.count()
        print(f"[{label:32s}] {time.perf_counter()-t0:7.3f}s  n={n}")

    for rep in range(2):
        print(f"--- warm rep {rep} ---")
        trep = time.perf_counter()
        bg = _groups_with_hash(batch).persist()
        mark("bg", bg)
        breps = bg.filter(F.col("id") == F.col("rep")).select(
            F.col("id").alias("b_rep"), "_chash"
        )
        rem_reps = breps.join(cq, "_chash", "left_anti")
        rem_docs = batch.join(
            rem_reps.select(F.col("b_rep").alias("doc_id")),
            "doc_id", "left_semi",
        )
        hq = cq.select("_chash", "qnode").unionByName(
            rem_reps.select("_chash", F.col("b_rep").alias("qnode"))
        )
        node_val = (
            cq.select("qnode", F.col("rep_c").alias("v"))
            .unionByName(cq.select("qnode", F.col("qnode").alias("v")))
            .unionByName(
                breps.join(hq, "_chash").select(
                    "qnode", F.col("b_rep").alias("v")
                )
            )
            .groupBy("qnode")
            .agg(F.min("v").alias("val"))
        )
        sh_b = doc_shingles(rem_docs, k=_K).persist()
        mark("sh_b (shingle batch reps)", sh_b)
        sig_b = minhash_signatures(
            rem_docs, k=_K, n_perm=_N_PERM, _shingles=sh_b
        )
        bands_b = lsh_bands(sig_b, _N_BANDS, _ROWS_PER_BAND).persist()
        mark("bands_b (minhash+bands)", bands_b)
        cand_bc = (
            bands_b.select(F.col("id").alias("id_a"), "band", "bkey")
            .join(
                bands_c.select(F.col("id").alias("id_b"), "band", "bkey"),
                ["band", "bkey"],
            )
            .select("id_a", "id_b")
            .distinct()
        )
        bb_l = bands_b.select(F.col("id").alias("id_a"), "band", "bkey")
        bb_r = bands_b.select(F.col("id").alias("id_b"), "band", "bkey")
        cand_bb = (
            bb_l.join(bb_r, ["band", "bkey"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        mark("cand_bc", cand_bc)
        mark("cand_bb", cand_bb)

        def verify(cand, sh_right):
            a_sh = sh_b.select(F.col("id").alias("id_a"), "shingle")
            r_sh = sh_right.select(F.col("id").alias("id_b"), "shingle")
            inter = (
                cand.join(a_sh, "id_a")
                .join(r_sh, ["id_b", "shingle"])
                .groupBy("id_a", "id_b")
                .agg(F.count(F.lit(1)).alias("n_common"))
            )
            sz_a = sh_b.groupBy("id").agg(F.count(F.lit(1)).alias("size_a"))
            sz_r = sh_right.groupBy("id").agg(
                F.count(F.lit(1)).alias("size_b")
            )
            return _project_jaccard(
                inter.join(sz_a.withColumnRenamed("id", "id_a"), "id_a")
                .join(sz_r.withColumnRenamed("id", "id_b"), "id_b"),
                _THRESHOLD,
            ).select("id_a", "id_b")

        v_bc = verify(cand_bc, sh_c)
        mark("verify(cand_bc, sh_c)", v_bc)
        v_bb = verify(cand_bb, sh_b)
        mark("verify(cand_bb, sh_b)", v_bb)
        pairs = v_bc.unionByName(v_bb)
        repmap = (
            cq.select(F.col("rep_c").alias("node_id"), "qnode")
            .unionByName(
                rem_reps.select(
                    F.col("b_rep").alias("node_id"),
                    F.col("b_rep").alias("qnode"),
                )
            )
            .join(node_val, "qnode")
            .select("node_id", "val")
        )
        edge_vals = (
            pairs.join(
                repmap.withColumnRenamed("node_id", "id_a")
                .withColumnRenamed("val", "val_a"), "id_a"
            )
            .join(
                repmap.withColumnRenamed("node_id", "id_b")
                .withColumnRenamed("val", "val_b"), "id_b"
            )
            .filter(F.col("val_a") != F.col("val_b"))
            .select("val_a", "val_b")
            .distinct()
        ).persist()
        mark("edge_vals", edge_vals)
        t0 = time.perf_counter()
        cc = connected_components(edge_vals, "val_a", "val_b")
        print(f"[connected_components (builder)  ] {time.perf_counter()-t0:7.3f}s")
        mark("cc materialize", cc)
        qfinal = node_val.join(
            cc.withColumnRenamed("id", "val"), "val", "left"
        ).select(
            "qnode",
            F.coalesce("cluster", "val").alias("label"),
            F.col("cluster").isNotNull().alias("in_cc"),
        )
        all_docs_hash = cg.select("id", "_chash").unionByName(
            bg.select("id", "_chash")
        )
        members = (
            all_docs_hash.join(hq, "_chash").join(qfinal, "qnode").persist()
        )
        mark("members", members)
        old_q = cq.filter(F.col("in_old_cluster")).select("qnode").distinct()
        nonempty_q = (
            sh_c.select("id")
            .unionByName(sh_b.select("id"))
            .distinct()
            .select(F.col("id").alias("qnode"))
        )
        qcnt = members.groupBy("qnode").agg(
            F.count(F.lit(1)).alias("n_copies")
        )
        keep_q = (
            qfinal.filter(F.col("in_cc")).select("qnode")
            .unionByName(old_q)
            .unionByName(
                qcnt.filter(F.col("n_copies") >= 2)
                .join(nonempty_q, "qnode", "left_semi")
                .select("qnode")
            )
            .distinct()
        )
        kept = members.join(keep_q, "qnode", "left_semi")
        final = (
            kept.groupBy("label")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.array_join(
                    F.sort_array(F.collect_list(F.col("id"))).cast(
                        "array<string>"
                    ),
                    ",",
                ).alias("member_ids"),
                F.max(
                    ((F.col("id") % _INC_MOD) >= _INC_BATCH_MIN).cast("int")
                ).alias("_has_batch"),
            )
            .filter(F.col("_has_batch") == 1)
            .select(
                F.col("label").alias("cluster_rep"), "n_members", "member_ids"
            )
        )
        t0 = time.perf_counter()
        final.write.format("noop").mode("overwrite").save()
        print(f"[final agg + noop sink           ] {time.perf_counter()-t0:7.3f}s")
        print(f"=== rep total (incl. counts): {time.perf_counter()-trep:.3f}s")
        for df in (bg, sh_b, bands_b, edge_vals, members):
            df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
