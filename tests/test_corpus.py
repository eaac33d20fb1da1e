"""Semantic invariants for the corpus-preparation operators (corpus.py) —
properties the DuckDB hash-parity gate cannot express (it would only prove
both engines agree, not that the semantics are right)."""

from __future__ import annotations

import pytest

from json_parquet_convertor_spark import registry

registry.load_all()

_PACK = 512


@pytest.fixture(scope="module")
def pack_rows(spark, sf_dir):
    return registry.QUERIES["q_pack_sequences"](spark, sf_dir).collect()


def test_pack_sequences_is_a_contiguous_token_stream(pack_rows, spark, sf_dir):
    """Per shard: offsets are exactly the running sum in doc_id order (no
    gaps, no overlaps), pack ids follow from offsets, and the straddle flag
    is truthful."""
    by_shard: dict[int, list] = {}
    for r in pack_rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 8
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        expect_offset = 0
        for r in rows:
            assert r.tok_offset == expect_offset, (shard, r.doc_id)
            assert r.first_pack == r.tok_offset // _PACK
            assert r.last_pack == (r.tok_offset + r.n_tokens - 1) // _PACK
            assert r.straddles == int(r.last_pack > r.first_pack)
            expect_offset += r.n_tokens


def test_pack_sequences_conserves_tokens(pack_rows, spark, sf_dir):
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    assert sum(r.n_tokens for r in pack_rows) == total


def test_dedup_prefix_partitions_the_corpus(spark, sf_dir):
    """Group sizes sum to the doc count and every representative id is
    minimal for its group (keep_doc_id is a real member, not a synthetic)."""
    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_text_dedup_prefix"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_dups for r in rows) == n_docs
    doc_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    assert all(r.keep_doc_id in doc_ids for r in rows)


def test_reservoir_sample_is_k_per_stratum_and_stable(spark, sf_dir):
    q = registry.QUERIES["q_sample_reservoir"]
    rows = q(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.sample_rank)
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
        assert len(ranks) <= 20
    # determinism: a second run returns the identical sample
    again = {(r.doc_id, r.lang, r.sample_rank) for r in q(spark, sf_dir).collect()}
    assert {(r.doc_id, r.lang, r.sample_rank) for r in rows} == again


def test_mode_median_semantics(spark, sf_dir):
    """Mode is the true argmax of the value histogram (smallest on ties);
    median sits within the group's value range."""
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_agg_mode_median"](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", F.col("l_quantity").cast("int").alias("qty"))
        .collect()
    )
    from collections import Counter

    hist: dict[str, Counter] = {}
    for r in li:
        hist.setdefault(r.l_returnflag, Counter())[r.qty] += 1
    for r in rows:
        c = hist[r.l_returnflag]
        best = max(c.values())
        assert r.mode_count == best
        assert r.mode_qty == min(q for q, n in c.items() if n == best)
        assert min(c) <= r.median_qty <= max(c)
        assert r.n == sum(c.values())


def test_embed_quantize_roundtrip_error_bound(spark, sf_dir):
    """|q| <= 127 and dequantized values are within half a quantization
    step of the original (the defining property of round-to-nearest)."""
    rows = registry.QUERIES["q_embed_quantize"](spark, sf_dir).collect()
    from json_parquet_convertor_spark.sources.io import load_table

    orig = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    checked = 0
    for r in rows[:50]:
        qs = [int(x) for x in r.q_csv.split(",")]
        assert len(qs) == r.dim == 64
        assert all(abs(q) <= 127 for q in qs)
        if r.scale == 0:
            continue
        for q, x in zip(qs, orig[r.vec_id]):
            assert abs(q * r.scale - float(x)) <= r.scale / 2 + 1e-9
            checked += 1
    assert checked > 0


def test_bpe_apply_matches_python_reference(spark, sf_dir):
    """q_bpe_apply's distributed segmentation must equal a plain-Python
    re-run of the same greedy merge algorithm, and must be lossless
    (concat of pieces reproduces the word)."""
    from json_parquet_convertor_spark import registry
    from json_parquet_convertor_spark.operators.corpus import _bpe_segmented

    contract = registry.QUERIES["q_bpe_apply"](spark, sf_dir).collect()
    assert len(contract) == 20
    for r in contract:
        assert r["lossless"] == 1, r
        assert r["pieces_valid"] == 1, r
    rows = _bpe_segmented(spark, sf_dir).collect()  # already top-20
    assert len(rows) == 20
    merges = [
        r["pair"]
        for r in registry.QUERIES["q_bpe_merge"](spark, sf_dir)
        .limit(10)
        .collect()
    ]
    rank = {p: i for i, p in enumerate(merges)}

    def ref_segment(w):
        if len(w) > 512:  # mirror the engine's per-word cap (r12,
            return [w]  # --longtext): over-cap blobs stay atomic
        pieces = list(w)
        while True:
            best, best_i = None, -1
            for i in range(len(pieces) - 1):
                r = rank.get(pieces[i] + pieces[i + 1])
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                return pieces
            pieces[best_i : best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]

    for r in rows:
        assert "".join(r["pieces"].split(" ")) == r["w"]
        assert r["pieces"].split(" ") == ref_segment(r["w"]), r["w"]
