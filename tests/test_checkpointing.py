"""Reliable-checkpoint durability for the iterative operators (r2 verdict
item 1): with checkpoint_dir set, connected_components / kmeans_fixed_point
cut lineage with reliable checkpoint() (survives executor loss) and return
results identical to the localCheckpoint default; rounds must not nest —
the post-cut plan reads checkpointed state, not the whole prior chain."""

from __future__ import annotations

import glob

import pytest


def _cc(spark, edges_rows, **kw):
    from filebeat_to_clickhouse_spark.extensions.dedup import connected_components

    edges = spark.createDataFrame(edges_rows, "doc_a bigint, doc_b bigint")
    return {r["node"]: r["component"] for r in connected_components(edges, **kw).collect()}


EDGES = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)]
WANT = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


class TestConnectedComponentsReliable:
    def test_identical_components_with_checkpoint_dir(self, spark, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        assert _cc(spark, EDGES, checkpoint_dir=ckpt) == WANT
        assert _cc(spark, EDGES) == WANT  # local default unchanged
        # reliable checkpoint actually wrote state to the requested dir
        assert glob.glob(f"{ckpt}/*/rdd-*"), "no reliable checkpoint files written"

    def test_rounds_do_not_nest(self, spark, tmp_path):
        from filebeat_to_clickhouse_spark.extensions.dedup import connected_components

        edges = spark.createDataFrame(EDGES, "doc_a bigint, doc_b bigint")
        out = connected_components(edges, checkpoint_dir=str(tmp_path / "ck2"))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # the final labels read the last round's checkpointed RDD — the
        # chain-of-all-rounds (joins/aggregates per round) must be gone
        assert "LogicalRDD" in plan
        assert "Join" not in plan

    def test_nonconvergence_raises(self, spark):
        # chain of diameter 5 cannot converge in 2 rounds
        chain = [(i, i + 1) for i in range(1, 6)]
        with pytest.raises(RuntimeError, match="did not converge"):
            _cc(spark, chain, max_iter=2)


class TestKmeansReliable:
    def test_identical_assignments_with_checkpoint_dir(self, spark, tmp_path):
        from filebeat_to_clickhouse_spark.extensions.similarity import kmeans_fixed_point
        from filebeat_to_clickhouse_spark.io import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        base = {
            (r["vec_id"], r["cluster"], r["dist_sq"])
            for r in kmeans_fixed_point(emb, k=4, n_iter=2).collect()
        }
        reli = {
            (r["vec_id"], r["cluster"], r["dist_sq"])
            for r in kmeans_fixed_point(
                emb, k=4, n_iter=2, checkpoint_dir=str(tmp_path / "kck")
            ).collect()
        }
        assert base == reli and len(base) > 0

    def test_sparse_ids_still_seed_k_centroids(self, spark):
        """Seeding is the k LOWEST ids, not `id < k`: an id space offset by
        +100 must still yield k distinct seed clusters (r2 advice)."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.extensions.similarity import kmeans_fixed_point
        from filebeat_to_clickhouse_spark.io import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            (F.col("vec_id") + 100).alias("vec_id"), "embedding"
        )
        rows = kmeans_fixed_point(emb, k=4, n_iter=1).collect()
        clusters = {r["cluster"] for r in rows}
        assert clusters == {100, 101, 102, 103}


class TestEnvDefault:
    def test_default_checkpoint_dir_reads_env(self, monkeypatch):
        from filebeat_to_clickhouse_spark.checkpointing import default_checkpoint_dir

        monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
        assert default_checkpoint_dir() is None
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/ck")
        assert default_checkpoint_dir() == "/tmp/ck"
