"""Streaming vector ingestion into the durable IVF index: the streamed
index's list CONTENT must be identical to bulk-indexing the whole
corpus (appends replay the persisted assignment rule), and the
restart-resume drain must fold each arrival exactly once — no vector
duplicated or lost across the checkpoint restart.
"""

from grebi_spark.functions.similarity import (
    _ANN_INDEX_CACHE,
    _resolve_index_dir,
    ann_index_persist_topk,
    ann_stream_ingest_topk,
)

SF = "/root/testdata/sf0.001"


def _lists(spark, kind: str):
    from grebi_spark.functions.training import _cache_key

    # exact cache key: a prefix match could pick an index another test
    # module built for a DIFFERENT sf_dir in the same session
    root = _ANN_INDEX_CACHE[f"{kind}:{_cache_key(spark, SF)}"]
    vdir = _resolve_index_dir(spark, root)
    return spark.read.parquet(f"{vdir}/lists")


def test_streamed_index_equals_bulk_index(spark):
    streamed_topk = [tuple(r) for r in ann_stream_ingest_topk(spark, SF).collect()]
    bulk_topk = [tuple(r) for r in ann_index_persist_topk(spark, SF).collect()]
    assert streamed_topk == bulk_topk
    streamed = _lists(spark, "annstream")
    bulk = _lists(spark, "annidx")
    cells = lambda df: sorted(  # noqa: E731
        (r["vec_id"], int(r["cell"])) for r in df.select("vec_id", "cell").collect()
    )
    assert cells(streamed) == cells(bulk)


def test_stream_folds_each_vector_exactly_once(spark):
    ann_stream_ingest_topk(spark, SF)  # session-cached build
    streamed = _lists(spark, "annstream")
    n_corpus = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert streamed.count() == n_corpus
    assert streamed.select("vec_id").distinct().count() == n_corpus
