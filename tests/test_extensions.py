"""Extension-operator behavior tests: LSH recall vs exact, dedup on planted
duplicates, simhash locality, streaming-vs-batch equality."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
        (3, "completely different content about spark shuffle partitions and joins"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (5, "spark structured streaming state store checkpoints and watermarks"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_clusters(spark, docs_with_dups):
    from kafka_topic_analyzer_spark.operators.dedup import exact_dup_clusters

    clusters = exact_dup_clusters(docs_with_dups).collect()
    assert len(clusters) == 1
    assert clusters[0]["cluster_size"] == 2
    assert clusters[0]["canonical_doc_id"] == 1


def test_jaccard_finds_planted_near_dups(spark, docs_with_dups):
    from kafka_topic_analyzer_spark.operators.dedup import near_dup_pairs_jaccard

    pairs = {
        (r["doc_i"], r["doc_j"])
        for r in near_dup_pairs_jaccard(docs_with_dups, threshold=0.7).collect()
    }
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert all(i in (1, 2, 4) and j in (1, 2, 4) for i, j in pairs)


def test_approx_quantiles_rank_error_bound(spark):
    """The sketch's p50/p90/p99 must fall within a small rank-error band of
    the exact distribution (Greenwald-Khanna guarantees rank error <=
    1/accuracy; assert with slack)."""
    from kafka_topic_analyzer_spark.registry import all_queries

    approx = {
        r["event_type"]: r
        for r in all_queries()["event_value_quantiles_approx"].spark(spark, SF_SMOKE).collect()
    }
    values = {}
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        values.setdefault(r["event_type"], []).append(r["value"])
    for et, a in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            # rank error: where the sketch's answer actually sits in the
            # sorted data vs the requested quantile (GK bounds rank, not value)
            rank = sum(1 for v in vs if v <= a[q]) / n
            assert abs(rank - target) <= 0.01 + 2.0 / n, (et, q, rank, target)


def test_connected_components_chain_and_islands(spark):
    from kafka_topic_analyzer_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, forces >1 propagation round) + island 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star_matches_min_label(spark):
    """Large-star/small-star must produce the identical fixpoint as
    min-label propagation (uniqueness of component minima)."""
    import random

    from kafka_topic_analyzer_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    # a clique, two chains, an island pair, plus random cross edges
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 13), (20, 21)]
    edges += [(100 + i, 100 + i + 1) for i in range(12)]
    edges += [(rng.randrange(200, 240), rng.randrange(200, 240)) for _ in range(30)]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    base = {r["doc_id"]: r["cluster_id"] for r in connected_components(df, 40).collect()}
    star = {r["doc_id"]: r["cluster_id"] for r in connected_components_star(df).collect()}
    assert star == base


def test_connected_components_star_log_rounds_on_long_chain(spark):
    """The adversarial case the variant exists for: a 200-diameter chain
    resolves within 12 star rounds (min-label would need ~200 hops)."""
    from kafka_topic_analyzer_spark.operators.dedup import connected_components_star

    n = 200
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components_star(df, max_rounds=12).collect()}
    assert len(got) == n + 1
    assert set(got.values()) == {0}, "every chain node must reach component min 0"


def test_minhash_lsh_recall_on_testdata(spark):
    """LSH candidates must recover every exact near-dup pair at sf0.001."""
    from kafka_topic_analyzer_spark.operators.dedup import (
        minhash_near_dups,
        near_dup_pairs_jaccard,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r["doc_i"], r["doc_j"])
        for r in near_dup_pairs_jaccard(docs, threshold=0.7).collect()
    }
    lsh = {(r["doc_i"], r["doc_j"]) for r in minhash_near_dups(docs, threshold=0.7).collect()}
    assert exact, "fixture should contain planted near-dups"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} on {len(exact)} planted pairs"
    assert lsh <= exact, "verified LSH pairs must be a subset of exact pairs"


def test_simhash_locality(spark, docs_with_dups):
    """Exact dups share a simhash; near-dups differ in few bits."""
    from kafka_topic_analyzer_spark.operators.dedup import simhash_fingerprints

    fp = {r["doc_id"]: r["simhash32"] for r in simhash_fingerprints(docs_with_dups).collect()}
    assert fp[1] == fp[4]
    assert bin(fp[1] ^ fp[2]).count("1") <= 8
    assert bin(fp[1] ^ fp[3]).count("1") >= 6


def test_simhash_banded_pairs_equal_bruteforce(spark):
    """The banded candidate join is EXACT for max_hamming < bands: same
    pairs as the O(n^2) cross-join scan on real fixture data."""
    from kafka_topic_analyzer_spark.operators.dedup import (
        simhash_fingerprints_wide,
        simhash_near_dup_pairs,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    banded = {
        (r["doc_i"], r["doc_j"], r["hamming"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    fp = simhash_fingerprints_wide(docs)
    a = fp.select(F.col("doc_id").alias("doc_i"), F.col("simhash").alias("fi"))
    b = fp.select(F.col("doc_id").alias("doc_j"), F.col("simhash").alias("fj"))
    brute = {
        (r["doc_i"], r["doc_j"], r["h"])
        for r in a.join(b, F.col("doc_i") < F.col("doc_j"))
        .select("doc_i", "doc_j", F.bit_count(F.col("fi").bitwiseXOR(F.col("fj"))).cast("long").alias("h"))
        .where(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute and brute

    # the scale path (precomputed/materialized fingerprints) is identical
    pre = {
        (r["doc_i"], r["doc_j"], r["hamming"])
        for r in simhash_near_dup_pairs(
            docs, max_hamming=3, fingerprints=fp.localCheckpoint()
        ).collect()
    }
    assert pre == brute

    with pytest.raises(ValueError):
        simhash_near_dup_pairs(docs, max_hamming=4, bands=4)


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    """dropDuplicates state actually drops rows: a duplicate-laden input
    streams down to exactly the distinct fingerprint set."""
    from kafka_topic_analyzer_spark.sources.tables import load_table
    from kafka_topic_analyzer_spark.streaming.dedup_stream import (
        streaming_distinct_fingerprints,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    doubled = docs.unionAll(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    # single documents.parquet FILE, the same layout as the sf dirs
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "dup_docs")
    (tmp_path / "dup_docs").mkdir()
    pq.write_table(
        pa.Table.from_pandas(doubled.toPandas()), src + "/documents.parquet"
    )
    got = [r["fp"] for r in streaming_distinct_fingerprints(spark, src).collect()]
    assert len(got) == docs.count()  # every fp occurred twice, kept once
    assert got == sorted(set(got))


def test_clean_text_semantics(spark):
    from kafka_topic_analyzer_spark.functions.text import clean_text

    rows = [
        (1, "<p>Hello <b>world</b></p>"),
        (2, "no tags  here\t\n just   space"),
        (3, "unpaired < bracket stays"),
        (4, "ctrl\x01chars\x1fgone"),
        (5, "  <div class='x'>padded</div>  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["c"] for r in df.select("doc_id", clean_text(F.col("text")).alias("c")).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "no tags here just space"
    assert got[3] == "unpaired < bracket stays"
    assert got[4] == "ctrl chars gone"
    assert got[5] == "padded"


def test_redact_pii_positive_matches(spark):
    from kafka_topic_analyzer_spark.functions.text import redact_pii

    rows = [
        (1, "contact bob.smith+x@mail-host.co.uk for details"),
        (2, "server at 10.0.255.3 timed out"),
        (3, "call +1 (555) 867-5309 now"),
        (4, "version 1.2.3 is not an ip, nor is 1.2.3.4.5 fully one"),
        (5, "plain text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["red"] for r in df.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "contact <EMAIL> for details"
    assert got[2] == "server at <IP> timed out"
    assert got[3] == "call <PHONE> now"
    assert "1.2.3 is not an ip" in got[4]
    assert got[5] == rows[4][1]


def test_quantize_int8_roundtrip(spark):
    from kafka_topic_analyzer_spark.functions.vectors import quantize_int8
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    scale, q = quantize_int8(F.col("embedding"))
    rows = emb.select("vec_id", "embedding", scale.alias("s"), q.alias("q")).collect()
    assert rows
    for r in rows:
        assert len(r["q"]) == len(r["embedding"])
        assert all(-127 <= v <= 127 for v in r["q"])
        if r["s"] == 0:
            assert all(v == 0 for v in r["q"])
            continue
        step = r["s"] / 127
        for orig, qi in zip(r["embedding"], r["q"]):
            assert abs(qi * step - orig) <= step / 2 + 1e-9


def test_sentence_udtf_equals_builtin(spark):
    """The UDTF extension demo must agree with the built-in hot path on
    real fixture text (lateral join vs explode of the filtered split)."""
    from kafka_topic_analyzer_spark.functions.udtf import register_udtfs
    from kafka_topic_analyzer_spark.sources.tables import load_table

    register_udtfs(spark)
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("docs_udtf")
    via_udtf = {
        (r["doc_id"], r["idx"], r["sentence"])
        for r in spark.sql(
            "SELECT doc_id, s.idx, s.sentence FROM docs_udtf, "
            "LATERAL sentence_split(text) s"
        ).collect()
    }
    via_builtin = {
        (r["doc_id"], r["idx"], r["sentence"])
        for r in spark.sql(
            "SELECT doc_id, posexplode(filter(transform(split(text, '[.!?]+'), "
            "s -> trim(s)), s -> length(s) > 0)) AS (idx, sentence) FROM docs_udtf"
        ).collect()
    }
    assert via_udtf == via_builtin and via_udtf


def test_session_window_boundary_merges_at_exact_gap(spark):
    """Pin the merge rule the session_windows_streaming oracle depends
    on: a gap of EXACTLY gap_sec merges (new session iff diff > gap),
    identical to the batch islands rule."""
    df = spark.createDataFrame(
        [(1, 0), (1, 1800), (1, 3601), (2, 0), (2, 1799)], "uid long, t long"
    ).select("uid", F.timestamp_seconds(F.col("t")).alias("ts"))
    out = (
        df.groupBy(F.session_window("ts", "1800 seconds"), "uid")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "uid",
            F.col("session_window.start").cast("long").alias("s"),
            F.col("session_window.end").cast("long").alias("e"),
            "n",
        )
        .orderBy("uid", "s")
    )
    assert [tuple(r) for r in out.collect()] == [
        (1, 0, 3600, 2),   # 0 and 1800 merge (gap == 1800)
        (1, 3601, 5401, 1),  # 3601 starts new (gap 1801 > 1800)
        (2, 0, 3599, 2),
    ]


def test_chunking_reconstructs_text(spark):
    """Property: stride-aligned prefixes of each chunk concatenate back
    to the original text (coverage, order, and overlap all correct) —
    checked on every fixture doc plus adversarial lengths around the
    stride/window boundaries."""
    from kafka_topic_analyzer_spark.queries.curation import (
        CHUNK_CHARS,
        CHUNK_STRIDE,
        _doc_chunking,
    )

    rows = _doc_chunking(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    from kafka_topic_analyzer_spark.sources.tables import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        rebuilt = "".join(c["chunk_text"][:CHUNK_STRIDE] for c in chunks)
        assert rebuilt == texts[doc_id]
        for c in chunks[:-1]:
            # every non-tail chunk overlaps the next by CHUNK - STRIDE
            assert c["chunk_len"] == min(
                CHUNK_CHARS, len(texts[doc_id]) - c["chunk_start"]
            )
    # empty docs must yield no chunks
    assert all(len(texts[d]) > 0 for d in by_doc)


def test_knn_lsh_recall(spark):
    """ANN top-5 must overlap exact top-5 meaningfully at 8 bits."""
    from kafka_topic_analyzer_spark.operators.similarity import (
        knn_bruteforce,
        knn_lsh,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(emb, queries, k=5, bits=4, tables=8).collect()
    }
    recall = len(exact & ann) / len(exact)
    # random embeddings are LSH-adversarial (neighbors barely nearer than
    # noise); multi-table union still has to find half of the true top-5
    assert recall >= 0.5, f"ANN recall {recall}"


def test_embedding_near_dup_exact(spark):
    """Planted parallel vectors must surface; orthogonal must not."""
    from kafka_topic_analyzer_spark.operators.dedup import embedding_near_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite
        (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector -> NULL cosine, dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_i"], r["vec_j"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] > 0.99


def test_embedding_blocked_chunked_matches_broadcast(spark, monkeypatch):
    """Blocked path with a TINY pair budget (forcing many scoring chunks
    per group) must emit the identical pair set and bit-identical scores
    as the broadcast path — chunking is a memory shape, not a semantics
    change. Also pins the auto-derived block count path (blocks=None)."""
    from kafka_topic_analyzer_spark.operators import dedup as D
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = {
        (r["vec_i"], r["vec_j"]): r["cosine"]
        for r in D.embedding_near_dup_pairs(
            emb, threshold=0.4, strategy="broadcast"
        ).collect()
    }
    monkeypatch.setattr(D, "_BLOCKWISE_PAIR_BUDGET", 64)  # many chunks/group
    blocked = {
        (r["vec_i"], r["vec_j"]): r["cosine"]
        for r in D.embedding_near_dup_pairs(
            emb, threshold=0.4, strategy="blocked"
        ).collect()
    }
    assert base and blocked == base


def test_embedding_lsh_recall_vs_exact(spark):
    """LSH-pruned near-dups must recover most exact pairs at sf0.001."""
    from kafka_topic_analyzer_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dups_lsh,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["vec_i"], r["vec_j"])
        for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["vec_i"], r["vec_j"])
        for r in embedding_near_dups_lsh(emb, threshold=0.4, tables=16).collect()
    }
    assert exact, "fixture should contain pairs at the fixture threshold"
    assert lsh <= exact, "verified LSH pairs must be a subset of exact pairs"
    recall = len(exact & lsh) / len(exact)
    # 0.4 cosine is a ~66 degree angle — LSH-hostile; 16 tables x 4 bits
    # still has to find most pairs
    assert recall >= 0.6, f"embedding LSH recall {recall} on {len(exact)} pairs"


def test_streaming_report_equals_batch(spark):
    from kafka_topic_analyzer_spark.operators.report import partition_report
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events
    from kafka_topic_analyzer_spark.streaming.report_stream import (
        streaming_partition_report,
    )

    batch = partition_report(kafka_frame_from_events(spark, SF_SMOKE)).collect()
    stream = streaming_partition_report(spark, SF_SMOKE).collect()
    assert [r.asDict() for r in batch] == [r.asDict() for r in stream]


def test_streaming_compacted_equals_batch(spark):
    from kafka_topic_analyzer_spark.operators.alive_keys import compacted_state
    from kafka_topic_analyzer_spark.sources.events_log import (
        kafka_frame_from_events,
        kafka_frame_from_events_df,
    )
    from kafka_topic_analyzer_spark.streaming.alive_keys_stream import (
        streaming_compacted_state,
    )
    from kafka_topic_analyzer_spark.streaming.report_stream import events_stream

    batch = {
        r["key"]: (r["alive"], r["last_partition"], r["last_offset"], r["versions"])
        for r in compacted_state(kafka_frame_from_events(spark, SF_SMOKE)).collect()
    }
    stream = {
        r["key"]: (r["alive"], r["last_partition"], r["last_offset"], r["versions"])
        for r in streaming_compacted_state(
            kafka_frame_from_events_df(events_stream(spark, SF_SMOKE)), spark
        ).collect()
    }
    assert batch == stream


def test_streaming_windowed_watermark_cut(spark):
    """Append-mode watermarked windows == batch counts minus open windows."""
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.sources.tables import load_table
    from kafka_topic_analyzer_spark.streaming.windowed_stream import (
        streaming_windowed_counts,
    )

    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in streaming_windowed_counts(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("tsec"),
        "event_type",
    )
    max_ts = ev.agg(F.max("tsec")).first()[0]
    expected = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            (F.col("tsec") - F.col("tsec") % 3600).alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("ws") + 3600 <= max_ts - 3600)
        .collect()
    }
    assert got == expected
    assert expected, "watermark cut should keep most windows"


def test_knn_ivf_recall(spark):
    """IVF top-5 must overlap exact top-5; determinism across runs."""
    from kafka_topic_analyzer_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, queries, k=5, nlist=16, nprobe=4).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # random embeddings cluster weakly; 4/16 cells probed must still find
    # a meaningful share of the true top-5
    assert recall >= 0.5, f"IVF recall {recall}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, queries, k=5, nlist=16, nprobe=4).collect()
    }
    assert ivf == again, "IVF must be deterministic (fixed seeds, stable ties)"


def test_knn_ivf_fixed_recall_and_artifact(spark):
    """Serving-time IVF (checked-in quantizer): recall vs exact, and the
    artifact's norms must be strictly positive (degenerate centroids would
    silently zero a cell's similarities)."""
    from kafka_topic_analyzer_spark.operators.ivf_centroids_v1 import (
        CENTROIDS,
        DIM,
        NLIST,
    )
    from kafka_topic_analyzer_spark.operators.similarity import (
        centroid_norms,
        knn_bruteforce,
        knn_ivf_fixed,
    )
    from kafka_topic_analyzer_spark.sources.tables import load_table

    assert len(CENTROIDS) == NLIST and all(len(c) == DIM for c in CENTROIDS)
    assert all(n > 0 for n in centroid_norms(CENTROIDS))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    fixed = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf_fixed(emb, queries, CENTROIDS, k=5, nprobe=4).collect()
    }
    recall = len(exact & fixed) / len(exact)
    # the quantizer is trained on the sf0.01 corpus, so serving the smoke
    # corpus is genuinely out-of-distribution — the bar is lower than the
    # in-distribution trained path above
    assert recall >= 0.4, f"fixed-quantizer IVF recall {recall}"
    # nprobe is THE recall knob: probing every cell must reach exact recall
    all_cells = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf_fixed(
            emb, queries, CENTROIDS, k=5, nprobe=NLIST
        ).collect()
    }
    full_recall = len(exact & all_cells) / len(exact)
    assert full_recall >= recall
    assert full_recall == 1.0, f"nprobe=nlist must be exact, got {full_recall}"


def test_asof_join_semantics(spark):
    """Inclusive <=, latest-wins, NULL when no prior right row."""
    from kafka_topic_analyzer_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 50), (3, "u", 10), (4, "v", 100)],
        "lid long, key string, ts long",
    )
    right = spark.createDataFrame(
        [("u", 50, 900), ("u", 99, 901), ("w", 1, 902)],
        "key string, ts long, rid long",
    )
    got = {
        r["lid"]: r["_asof"]["rid"] if r["_asof"] else None
        for r in asof_join_backward(
            left, right, key="key", ts="ts", right_payload=["rid"], tiebreak="lid"
        ).collect()
    }
    assert got == {
        1: 901,   # latest right at ts<=100
        2: 900,   # ts==50 inclusive
        3: None,  # no right row at ts<=10
        4: None,  # key v has no right rows at all
    }


def test_range_join_binned_semantics(spark):
    """Inclusive start, exclusive end, multi-bin intervals, exactly-once."""
    from kafka_topic_analyzer_spark.operators.asof import range_join_binned

    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 199), (4, 200), (5, 99), (6, 1000)],
        "pid long, ts long",
    )
    intervals = spark.createDataFrame(
        [(100, 200, "a"), (0, 1500, "b")], "s long, e long, name string"
    )
    got = sorted(
        (r["pid"], r["name"])
        for r in range_join_binned(
            points, intervals, point_col="ts", start_col="s", end_col="e",
            bin_size=50,  # interval 'a' spans 2 bins, 'b' spans 30
        ).collect()
    )
    assert got == [
        (1, "a"), (1, "b"),           # 100 in both ('a' start inclusive)
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "b"),                     # 200 excluded from 'a' (end exclusive)
        (5, "b"),
        (6, "b"),
    ]


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite — identical rows out."""
    from kafka_topic_analyzer_spark.operators.skew import salted_equi_join

    # 90% of fact rows hit one hot key
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", i * 1.5) for i in range(1000)],
        "row_id long, key string, v double",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("missing", 4)],
        "key string, dim long",
    )
    plain = {(r["row_id"], r["dim"]) for r in big.join(small, "key").collect()}
    salted = {
        (r["row_id"], r["dim"])
        for r in salted_equi_join(big, small, "key", salt=8).collect()
    }
    assert salted == plain and len(plain) > 0


def test_approx_alive_keys_within_error_bound(spark):
    """The HLL scale path must land within its advertised rsd of the
    exact count (3 sigma) on real fixture data."""
    from kafka_topic_analyzer_spark.operators.alive_keys import (
        alive_key_count,
        alive_key_count_approx,
    )
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events

    kdf = kafka_frame_from_events(spark, SF_SMOKE)
    exact = alive_key_count(kdf).collect()[0][0]
    approx = alive_key_count_approx(kdf, rsd=0.05).collect()[0][0]
    assert exact > 0
    assert abs(approx - exact) <= 3 * 0.05 * exact


def test_compression_ratio_orders_planted_extremes(spark):
    from kafka_topic_analyzer_spark.functions.text import compression_ratio_udf

    natural = (
        "the quick brown fox jumps over a lazy dog while seventeen zebras "
        "wander past an abandoned railway station carrying umbrellas, "
        "discussing philosophy, quantum mechanics, breakfast cereals and "
        "various improbable migration patterns observed during autumn "
    ) * 3
    rows = [
        (1, "spam " * 200),                      # highly repetitive
        (2, natural),                            # long natural-ish prose
        (3, "9f8a7d6c5b4e3f2a1d0c9b8a7f6e5d4c" * 4),  # high-entropy-ish hex
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", compression_ratio_udf(F.col("text")).alias("r")).collect()
    }
    assert got[1] < got[2] < 1.0
    assert got[1] < 0.1          # repetition collapses
    assert got[4] == 1.0         # empty -> defined as incompressible
    # deterministic across invocations
    again = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", compression_ratio_udf(F.col("text")).alias("r")).collect()
    }
    assert again == got


def test_hll_sketch_union_is_mergeable(spark):
    """Mergeable-aggregation property for incremental rollups: per-
    partition HLL sketches unioned == one sketch over everything (same
    estimate, exactly — sketch union is associative/commutative)."""
    from kafka_topic_analyzer_spark.sources.events_log import kafka_frame_from_events

    kdf = kafka_frame_from_events(spark, SF_SMOKE).where(F.col("key").isNotNull())
    direct = kdf.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("key")).alias("n")
    ).collect()[0]["n"]
    merged = (
        kdf.groupBy("partition")
        .agg(F.hll_sketch_agg("key").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    exact = kdf.select("key").distinct().count()
    assert merged == direct
    assert abs(direct - exact) <= 0.05 * exact


def test_salted_join_bounds_the_hot_reduce_partition(spark):
    """The structural claim behind the bench skew ladder, test-enforced at
    small scale: with broadcast and AQE disabled, the plain join funnels
    every hot-key row through ONE reduce partition, while the salted join
    bounds the max partition at ~hot/salt. Wall-clock speedup is ambient-
    dependent; this partition-size inequality is not."""
    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.skew import salted_equi_join
    from kafka_topic_analyzer_spark.session import scoped_shuffle_partitions

    n, hot_key = 200_000, 7
    big = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(hot_key))
        .otherwise(F.col("id") % 1000 + 100)
        .cast("long")
        .alias("key"),
        F.col("id").alias("v"),
    )
    small = spark.range(1200).select(F.col("id").alias("key"), (F.col("id") * 10).alias("w"))

    def max_partition_rows(joined):
        return (
            joined.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().agg(F.max("count")).collect()[0][0]
        )

    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        with scoped_shuffle_partitions(spark, 64):
            plain_max = max_partition_rows(big.join(small, "key"))
            salted_max = max_partition_rows(salted_equi_join(big, small, "key", salt=16))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    assert plain_max >= n // 2  # every hot row in one partition
    # salt=16 bounds the hot shard; allow 3 shards colliding in one of
    # the 64 partitions plus the background keys
    assert salted_max <= 3 * (n // 2) // 16 + n // 10, (plain_max, salted_max)
    assert salted_max * 4 <= plain_max


def test_scalable_packing_equals_single_window(spark):
    """The two-level distributed prefix sum must reproduce the plain
    per-source window's offsets exactly, row for row — including at
    shard boundaries (the off-by-one surface: the base must cover all
    PRIOR shards, the local sum all prior rows within the shard)."""
    import __spark_entry__ as E

    simple = E.queries()["sequence_packing"](spark, SF_SMOKE).collect()
    scalable = E.queries()["sequence_packing_scalable"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in simple] == [tuple(r) for r in scalable]


def test_scalable_packing_shards_the_heavy_window(spark):
    """The parallelism claim, verified in the plan: the corpus-sized
    running sum must window on (source, _shard) — never on source alone
    (one task per source) — and the shard bases must come back via a
    broadcast join."""
    import __spark_entry__ as E

    plan = (
        E.queries()["sequence_packing_scalable"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_shard" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_histogram_gate_is_a_true_by_value_gate(spark):
    """The defining property of a by-value threshold gate, per lang:
    every kept doc scores >= every dropped doc, the kept fraction is at
    least a quarter (ties included) and under half, and ties at the
    threshold are never split."""
    import __spark_entry__ as E

    from kafka_topic_analyzer_spark.functions import text as TX
    from kafka_topic_analyzer_spark.sources.tables import load_table

    kept = E.queries()["quality_percentile_gate_scalable"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.round(TX.quality_score(F.col("text")) * 1000000)
        .cast("long")
        .alias("q_micro"),
    ).where(F.col("q_micro").isNotNull()).collect()

    kept_ids = {r["doc_id"] for r in kept}
    by_lang: dict = {}
    for r in scored:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        k = [r["q_micro"] for r in rows if r["doc_id"] in kept_ids]
        drop = [r["q_micro"] for r in rows if r["doc_id"] not in kept_ids]
        assert k, lang
        if drop:
            assert min(k) > max(drop), (lang, min(k), max(drop))
        import math

        assert len(k) >= math.ceil(len(rows) / 4), (lang, len(k), len(rows))
        assert len(k) < max(len(rows) / 2, 2), (lang, len(k), len(rows))


def test_token_window_chunking_rules(spark):
    """Pin the chunk rule on constructed docs: empty -> no chunks;
    n <= chunk_size -> one chunk; boundary n = chunk_size + 1 -> two
    chunks with exactly `overlap` shared tokens; no all-overlap tail."""
    from kafka_topic_analyzer_spark.operators.pipeline import chunk_documents

    toks = lambda n: " ".join(f"t{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (0, ""),                 # empty: no chunks
            (1, toks(5)),            # tiny: one chunk of 5
            (2, toks(64)),           # exact fit: one chunk
            (3, toks(65)),           # boundary: two chunks (48-start)
            (4, toks(48 + 16)),      # n = stride + overlap: ONE chunk
            (5, toks(150)),          # multi-chunk
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, 64, 16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc
    assert [c["n_tokens"] for c in by_doc[1]] == [5]
    assert [c["n_tokens"] for c in by_doc[2]] == [64]
    assert [(c["start_tok"], c["n_tokens"]) for c in by_doc[3]] == [
        (0, 64),
        (48, 17),
    ]
    # n = 64 exactly equals chunk span but ALSO stride+overlap: one chunk
    assert [(c["start_tok"], c["n_tokens"]) for c in by_doc[4]] == [(0, 64)]
    # 150 tokens: starts 0, 48, 96 cover all; start 144 would leave
    # 150-144=6 fresh tokens -> emitted; rule: start <= n-overlap-1=133
    assert [c["start_tok"] for c in by_doc[5]] == [0, 48, 96]
    # coverage: last chunk must reach the final token
    last = by_doc[5][-1]
    assert last["start_tok"] + last["n_tokens"] == 150
    # chunk ids are dense and fingerprints unique per doc
    for d, cs in by_doc.items():
        assert [c["chunk_id"] for c in cs] == list(range(len(cs)))
        assert len({c["chunk_fp"] for c in cs}) == len(cs)


def test_padding_waste_bucket_rule(spark):
    """Bucket = smallest power of two >= n_tok (0 stays 0); waste is the
    padded fraction. Constructed lengths hit bucket edges exactly."""
    import __spark_entry__ as E  # noqa: F401  (registration side effect)
    from kafka_topic_analyzer_spark.queries.terms import (
        _bucket_case_spark,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (4,), (5,), (63,), (64,), (65,)], "n long"
    )
    got = [
        r["b"]
        for r in df.select(_bucket_case_spark(F.col("n")).alias("b"))
        .orderBy("n")
        .collect()
    ]
    assert got == [0, 1, 2, 4, 4, 8, 64, 64, 128]
