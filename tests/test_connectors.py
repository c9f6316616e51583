"""REST-connector plumbing tests (network-free: injected fake fetch)
and multimodal decode-stage tests (stubbed codecs)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from databeats_spark.operators.multimodal import (
    attach_payload,
    decode_image_features,
    dhash_payloads,
    frame_sample_plan,
    perceptual_near_dups,
)
from databeats_spark.sources.rest import dedup_union, keyed_batch_fetch, missing_keys, search_scan
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE

AUDIO_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType()),
        T.StructField("danceability", T.DoubleType()),
        T.StructField("chunk_size", T.IntegerType()),
    ]
)


def make_fake_fetch():
    # returned as a CLOSURE so Spark pickles it by value — a module-
    # level function would pickle by reference and executors can't
    # import the test module
    def fake_fetch(endpoint: str, ids: list[str]) -> list[dict]:
        # fetch runs in executor Python workers — observations must
        # travel IN the returned data, not via driver-side closures
        if endpoint == "audio-features":
            return [
                {"track_id": i, "danceability": (hash(i) % 100) / 100.0, "chunk_size": len(ids)}
                for i in ids
            ]
        if endpoint == "search":
            offset = int(ids[0].split("=")[1])
            if offset >= 100:
                return []
            return [
                {"track_id": f"t{offset + j}", "danceability": 0.5, "chunk_size": 50}
                for j in range(50)
            ]
        return []

    return fake_fetch


def test_keyed_batch_fetch_chunks_and_schema(spark):
    ids = spark.createDataFrame([(f"tr{i:04d}",) for i in range(120)], ["track_id"])
    # include duplicates: they must collapse before fetching
    ids = ids.union(ids.limit(10))
    out = keyed_batch_fetch(ids, "track_id", "audio-features", make_fake_fetch(), AUDIO_RESULT_SCHEMA,
                            batch_size=50, num_partitions=2)
    pdf = out.toPandas()
    assert len(pdf) == 120  # dedup before fetch (duplicates collapsed)
    assert pdf["track_id"].is_unique
    assert set(pdf.columns) == {"track_id", "danceability", "chunk_size"}
    # chunking: every API call carried <= 50 ids
    assert (pdf["chunk_size"] <= 50).all()
    assert (pdf["chunk_size"] > 0).all()


def test_missing_keys_anti_join(spark):
    existing = spark.createDataFrame([("a",), ("b",)], ["artist_id"])
    cands = spark.createDataFrame([("a",), ("c",), ("c",), ("d",)], ["artist_id"])
    got = {r["artist_id"] for r in missing_keys(existing, cands, "artist_id").collect()}
    assert got == {"c", "d"}


def test_search_scan_pagination(spark):
    df = search_scan(spark, "search", make_fake_fetch(), AUDIO_RESULT_SCHEMA, pages=5, page_size=50)
    # 2 pages of 50, then the empty page stops the cursor (search_scan
    # runs driver-side, so the row count fully pins the pagination)
    assert df.count() == 100


def test_dedup_union_newest_wins(spark):
    hist = spark.createDataFrame([("t1", 10, 100), ("t2", 20, 100)], ["track_id", "popularity", "timestamp"])
    fresh = spark.createDataFrame([("t1", 99, 200)], ["track_id", "popularity", "timestamp"])
    out = dedup_union(hist, fresh, ["track_id"], "timestamp").toPandas().set_index("track_id")
    assert out.loc["t1", "popularity"] == 99
    assert out.loc["t2", "popularity"] == 20


def test_perceptual_near_dup_planted_recall(spark):
    """The perceptual tier's semantics pin (r7 VERDICT item 7, the
    SimHash recall pattern applied to media payloads): a payload with a
    few lightly-perturbed bytes — the re-encode/re-crop stand-in —
    must land within the Hamming threshold of its source, while
    unrelated payloads stay far away and out of the result."""
    import hashlib

    def blob(seed: str, n: int = 720) -> bytes:
        out = b""
        i = 0
        while len(out) < n:
            out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
            i += 1
        return out[:n]

    base = blob("img-A")
    near = bytearray(base)
    for pos in (5, 100, 300, 650):  # light corruption, ~0.5% of bytes
        near[pos] = (near[pos] + 3) % 256
    rows = [
        (1, bytes(base)),
        (2, bytes(near)),
        (3, blob("img-B")),
        (4, blob("img-C")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    sigs = {r["doc_id"]: r["dhash"] for r in dhash_payloads(df).collect()}
    assert len(sigs) == 4
    planted_hamming = bin(sigs[1] ^ sigs[2]).count("1")
    assert planted_hamming <= 3, f"perturbed twin drifted to hamming {planted_hamming}"
    # unrelated pseudorandom payloads sit near 32 bits apart
    assert bin(sigs[1] ^ sigs[3]).count("1") > 10

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in perceptual_near_dups(df, hamming_max=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == planted_hamming
    assert all({a, b} == {1, 2} for a, b in pairs), f"false positives: {pairs}"


def test_perceptual_banding_recall_is_complete(spark):
    """The pigeonhole guarantee on real corpus payloads: the banded
    search must return EXACTLY the pairs whose signature Hamming
    distance is within the threshold — no recall loss vs the
    brute-force all-pairs comparison of the same signatures."""
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(80)
    with_payload = attach_payload(docs)
    sigs = {r["doc_id"]: r["dhash"] for r in dhash_payloads(with_payload).collect()}
    ids = sorted(sigs)
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in perceptual_near_dups(with_payload, hamming_max=3).collect()
    }
    assert got == want


def test_multimodal_decode_pipeline(spark):
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(50)
    feats = decode_image_features(attach_payload(docs))
    pdf = feats.toPandas()
    assert len(pdf) == 50
    assert set(pdf["format"]) <= {"jpeg", "png", "webp"}
    assert (pdf["width"].between(64, 255)).all()
    assert pdf["embedding"].map(len).eq(8).all()
    # deterministic: same content → same features
    pdf2 = decode_image_features(attach_payload(docs)).toPandas()
    assert pdf.sort_values("doc_id")["width"].tolist() == pdf2.sort_values("doc_id")["width"].tolist()
    # unit-norm embeddings from the stub extractor
    import numpy as np

    norms = pdf["embedding"].map(lambda v: float(np.linalg.norm(v)))
    assert ((norms - 1).abs() < 1e-3).all()


def test_frame_sample_plan(spark):
    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(3)
    plan = frame_sample_plan(docs, n_frames=4).toPandas()
    assert len(plan) == 12
    assert set(plan["frame_idx"]) == {0, 1, 2, 3}
    assert ((plan["frame_ts_frac"] > 0) & (plan["frame_ts_frac"] < 1)).all()


def test_python_datasource_paged_search(spark):
    from databeats_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("paged_search")
        .option("pages", "4").option("page_size", "25").option("seed", "7")
        .load()
    )
    assert df.count() == 100
    # one input partition per page — the crawl parallelizes
    assert df.rdd.getNumPartitions() == 4
    assert df.select("page").distinct().count() == 4
    # deterministic: same options, same rows
    again = (
        spark.read.format("paged_search")
        .option("pages", "4").option("page_size", "25").option("seed", "7")
        .load()
    )
    assert sorted(df.collect()) == sorted(again.collect())
    # different seed, different corpus
    other = (
        spark.read.format("paged_search")
        .option("pages", "1").option("page_size", "25").option("seed", "8")
        .load()
    )
    ids = {r["track_id"] for r in df.collect()}
    assert all(r["track_id"] not in ids for r in other.collect())
    # schema contract is stable
    assert [f.name for f in df.schema.fields] == ["page", "track_id", "track_name", "popularity"]


def test_python_datasource_page_cap(spark):
    from databeats_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("paged_search")
        .option("pages", "1").option("page_size", "500")
        .load()
    )
    # page_size clamps to the API limit (50)
    assert df.count() == 50


def test_store_format_seam_swaps_without_code_changes(spark, tmp_path):
    """S6/S7 seam contract: the history/snapshot stores retarget to a
    different DataSource format via configuration ONLY — proving the
    'Mongo/BQ is a format swap' claim in sources/files.py. The engine
    call sites (write_history/read_history_table, write_snapshot/
    read_snapshot_table) are byte-identical between the parquet and orc
    runs; only the session conf differs."""
    import os

    from databeats_spark.plans.etl import write_history, write_snapshot
    from databeats_spark.sources.files import (
        STORE_FORMAT_CONF,
        read_history_table,
        read_snapshot_table,
    )

    df = spark.range(20).select(
        F.col("id").alias("track_id"),
        (F.col("id") % 5).alias("popularity"),
        (F.lit(1700000000) + F.col("id") * 86400).alias("timestamp"),
    )
    spark.conf.set(STORE_FORMAT_CONF, "orc")
    try:
        hist, snap = str(tmp_path / "hist"), str(tmp_path / "snap")
        write_history(df, hist)
        write_snapshot(df, snap)

        # the physical files really are ORC, laid out by week partition
        weeks = [p for p in os.listdir(hist) if p.startswith("__week=")]
        assert weeks
        files = os.listdir(os.path.join(hist, weeks[0]))
        assert any(f.endswith(".orc") for f in files), files
        assert not any(f.endswith(".parquet") for f in files), files

        # and the paired readers round-trip through the same conf
        assert read_history_table(spark, hist).count() == 20
        back = read_snapshot_table(spark, snap)
        assert back.count() == 20
        assert {"track_id", "popularity", "timestamp"} <= set(back.columns)
    finally:
        spark.conf.unset(STORE_FORMAT_CONF)


def test_python_datasource_streaming_crawl(spark, tmp_path):
    """The streaming reader must drain every page exactly once through
    checkpointed offsets and converge to the batch scan of the same
    options; once caught up, further drains add nothing."""
    from databeats_spark.sources.pyds import register

    register(spark)
    opts = {"pages": "6", "page_size": "20", "seed": "11", "pages_per_batch": "2"}
    ckpt, out_dir = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            spark.readStream.format("paged_search")
            .options(**opts)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # each availableNow drain is a fresh query resuming from the
    # checkpointed offset and advancing pages_per_batch pages — the
    # restart-resume path is exercised on every iteration
    counts = []
    for _ in range(5):
        drain()
        counts.append(spark.read.parquet(out_dir).count())
        if len(counts) >= 2 and counts[-1] == counts[-2]:
            break
    assert counts[-1] == 6 * 20, counts
    assert counts[0] == 2 * 20, counts  # rate limit held on drain 1

    got = spark.read.parquet(out_dir)
    batch = spark.read.format("paged_search").options(**opts).load()
    # exact content parity with the batch scan, no dupes, no gaps
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_rotating_credentials_assign_one_lane_per_partition(spark):
    """X4: each partition must use exactly one credential, and a pool
    of N credentials must spread across N partitions."""
    from databeats_spark.sources.rest import keyed_batch_fetch, rotating_credential_fetch
    from pyspark.sql import types as T

    creds = ["tokenA", "tokenB", "tokenC"]

    def base_fetch(cred, endpoint, ids):
        return [{"id": i, "cred": cred} for i in ids]

    keys = spark.createDataFrame([(f"k{i}",) for i in range(60)], "id string")
    out = keyed_batch_fetch(
        keys,
        "id",
        "audio-features",
        rotating_credential_fetch(creds, base_fetch),
        T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("cred", T.StringType()),
        ]),
        batch_size=10,
        num_partitions=len(creds),
    )
    rows = out.collect()
    assert len(rows) == 60
    used = {r["cred"] for r in rows}
    assert used == set(creds)  # all lanes active
    # one credential per partition: group ids by cred and check each id
    # appears exactly once (no double-fetch across lanes)
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_media_features_plug_into_ann_and_dedup(spark):
    """The multimodal story end-to-end: binary payload -> mapInPandas
    feature extraction -> the SAME ANN / semantic-dedup operators the
    text embeddings use. Exact-duplicate payloads land at cosine 1.0
    and are caught by SemDeDup over the media embedding column."""
    from pyspark.sql import functions as F

    from databeats_spark.functions.similarity import cosine_top_k
    from databeats_spark.operators.dedup import semantic_near_duplicates
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(120)
    # plant two exact payload duplicates of doc 0
    dups = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    feats = decode_image_features(attach_payload(docs.unionByName(dups))).localCheckpoint()

    # ANN: doc 0's top neighbor (excluding itself) is its payload twin
    q = feats.filter(F.col("doc_id") == 0).select("doc_id", "embedding")
    top = cosine_top_k(
        feats.select("doc_id", "embedding"), q, id_col="doc_id", vec_col="embedding", k=2
    ).toPandas()
    twin = top[top.neighbor_id != 0].iloc[0]
    assert twin["neighbor_id"] == 100000 and abs(twin["cos_sim"] - 1.0) < 1e-9

    # semantic dedup over the media embeddings finds the planted pair
    pairs = semantic_near_duplicates(
        feats, "doc_id", "embedding", n_lists=4, threshold=0.999
    ).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 100000)).any(), pairs


def _make_test_encoder():
    """Build the injected batch encoder INSIDE a closure so cloudpickle
    ships it by value (a module-level function in tests/ would pickle
    by reference and be unimportable on workers — the same constraint a
    real deployment's encoder wrapper has). Deterministic 6-dim
    'model' keyed on payload bytes — NOT the built-in stub, proving
    the seam carries a foreign model end-to-end."""

    def enc(payloads):
        import numpy as np

        out = []
        for p in payloads:
            b = bytes(p)
            v = np.array(
                [len(b) % 97 + 1, (b[0] if b else 0) + 1, (b[-1] if b else 0) + 1,
                 (len(b) % 7) + 1, (b[len(b) // 2] if b else 0) + 1, 3.0],
                dtype=np.float64,
            )
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

    return enc


def test_injected_encoder_feeds_ivf_end_to_end(spark):
    """The embedding-generation seam: docs -> payload ->
    encode_payloads(INJECTED model) -> IVFIndex.fit -> search, one
    pipeline. A planted exact-payload twin must surface as its
    source's nearest neighbor at cosine ~1.0 through the IVF path."""
    from pyspark.sql import functions as F

    from databeats_spark.ml.ann import IVFIndex
    from databeats_spark.operators.multimodal import attach_payload, encode_payloads
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(150)
    twin = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    enc = _make_test_encoder()
    emb = encode_payloads(
        attach_payload(docs.unionByName(twin)),
        encoder=enc,
        embed_dim=6,
        batch_size=32,
    ).localCheckpoint()

    assert emb.columns == ["doc_id", "embedding"]  # payload pruned
    assert emb.count() == 151

    idx = IVFIndex.fit(emb, id_col="doc_id", vec_col="embedding", n_lists=4)
    q = emb.filter(F.col("doc_id") == 3)
    hits = idx.search(q, k=3, n_probe=4).toPandas()
    best = hits.sort_values("rank").iloc[0]
    assert best["neighbor_id"] == 100003 and abs(best["cos_sim"] - 1.0) < 1e-6

    # determinism: the injected model is pure, so re-encoding matches
    again = encode_payloads(
        attach_payload(docs.unionByName(twin)), encoder=enc,
        embed_dim=6, batch_size=32,
    )
    a = sorted(map(tuple, emb.select("doc_id", "embedding").toPandas().itertuples(index=False)))
    b = sorted(map(tuple, again.select("doc_id", "embedding").toPandas().itertuples(index=False)))
    assert [(i, list(v)) for i, v in a] == [(i, list(v)) for i, v in b]


def test_encoder_shape_mismatch_fails_loudly(spark):
    from pyspark.sql import functions as F

    from databeats_spark.operators.multimodal import attach_payload, encode_payloads
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    import numpy as np
    import pytest

    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents.limit(5)
    bad = encode_payloads(
        attach_payload(docs), encoder=lambda ps: np.zeros((len(ps), 3)), embed_dim=8
    )
    with pytest.raises(Exception, match="expected"):
        bad.collect()


def test_blockmean_crop_scale_catches_border_edited_dups(spark):
    """The second perceptual signature (r8 VERDICT item 6): block-mean
    hashes at (1.0, 0.75) crop scales. A border-edited twin (letterbox:
    first/last 12.5% of the stream overwritten) blows past the Hamming
    threshold at FULL scale — only the center-crop scale can recall it.
    Measured with the default byte-stream stand-in: full-scale hamming
    18, crop-scale 0 (nicks in the middle keep it 0; unrelated payloads
    sit ~30 apart)."""
    import hashlib

    from databeats_spark.operators.multimodal import (
        blockmean_near_dups, blockmean_payloads,
    )

    def blob(seed: str, n: int = 2048) -> bytes:
        out = b""
        i = 0
        while len(out) < n:
            out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
            i += 1
        return out[:n]

    base = blob("img-A")
    lb = bytearray(base)
    k = len(base) // 8
    lb[:k] = b"\xff" * k  # letterbox top
    lb[-k:] = b"\xff" * k  # letterbox bottom
    for pos in (700, 900, 1100):  # light interior corruption on top
        lb[pos] = (lb[pos] + 3) % 256
    rows = [(1, bytes(base)), (2, bytes(lb)), (3, blob("img-B")), (4, blob("img-C"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    full = {r["doc_id"]: r["bmh"] for r in blockmean_payloads(df, crop=1.0).collect()}
    crop = {r["doc_id"]: r["bmh"] for r in blockmean_payloads(df, crop=0.75).collect()}
    assert bin(full[1] ^ full[2]).count("1") > 3  # full frame misses it
    assert bin(crop[1] ^ crop[2]).count("1") <= 3  # center crop recalls it
    assert bin(crop[1] ^ crop[3]).count("1") > 10  # unrelated stays far

    pairs = {
        (r["id_a"], r["id_b"]): (r["hamming"], r["n_scales"])
        for r in blockmean_near_dups(df, hamming_max=3).collect()
    }
    assert (1, 2) in pairs, f"letterbox dup not recalled: {pairs}"
    hamming, n_scales = pairs[(1, 2)]
    assert hamming <= 3 and n_scales == 1  # matched at the crop scale only
    assert all({a, b} == {1, 2} for a, b in pairs), f"false positives: {pairs}"


def test_blockmean_identical_payloads_match_at_every_scale(spark):
    from databeats_spark.operators.multimodal import blockmean_near_dups

    rows = [(1, b"same-bytes" * 50), (2, b"same-bytes" * 50)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = blockmean_near_dups(df, hamming_max=3).collect()
    assert len(out) == 1
    assert out[0]["hamming"] == 0 and out[0]["n_scales"] == 2
