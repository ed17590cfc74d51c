"""LLM-pipeline operators that the DuckDB oracle can't express
(xxhash64-seeded MinHash/SimHash/hyperplanes, pandas-batched decode):
determinism, planted-duplicate recall, and score correctness are
pinned here instead."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_db_core_spark.functions.multimodal import (
    extract_features,
    media_table_from_documents,
    stub_features,
)
from vector_db_core_spark.operators import QUERIES

#: the 25 near-dup pairs planted in the sf0.01 documents fixture
#: (ground truth = exact 3-gram Jaccard >= 0.5, itself oracle-checked
#: via dedup_ngram_jaccard_pairs)


def _planted_pairs(spark):
    rows = QUERIES["dedup_ngram_jaccard_pairs"](spark, SF_ORACLE).collect()
    return {(r.doc_a, r.doc_b) for r in rows}


def test_minhash_lsh_equals_exact(spark):
    """The banded-LSH verified output must equal the exact all-pairs
    answer (this is why it can share the exact oracle)."""
    exact = _planted_pairs(spark)
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh_pairs"](spark, SF_ORACLE).collect()
    }
    assert lsh == exact
    assert len(exact) >= 1  # fixture really contains planted near-dups


def test_simhash_pairs_deterministic_and_recall(spark):
    q = QUERIES["dedup_simhash_pairs"]
    run1 = sorted((r.doc_a, r.doc_b, r.hamming) for r in q(spark, SF_ORACLE).collect())
    run2 = sorted((r.doc_a, r.doc_b, r.hamming) for r in q(spark, SF_ORACLE).collect())
    assert run1 == run2  # seeded hashing → rerun-stable
    found = {(a, b) for a, b, _ in run1}
    planted = _planted_pairs(spark)
    # chunk banding is a recall heuristic (hamming<=12 spread 3+3+3+3
    # evades it); it must still catch most planted near-dups and
    # return nothing outside hamming 12
    assert len(found & planted) >= int(0.7 * len(planted))
    assert all(h <= 12 for _, _, h in run1)


def test_ann_lsh_scores_exact_within_bucket(spark):
    """ANN approximates *candidate selection* only — every returned
    cosine must equal the brute-force value for that pair — and the
    multi-table index (4 planes x 16 tables) must recall >= 0.8 of the
    exact top-5 (measured 0.92 on the fixture; everything is seeded)."""
    ann = QUERIES["sim_ann_lsh_topk"](spark, SF_ORACLE).collect()
    assert ann, "ANN returned nothing"
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_cosine_topk"](spark, SF_ORACLE).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in ann}
    assert len(got & exact) / len(exact) >= 0.8
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return d / (na * nb)

    for r in ann:
        expect = cos(emb[r.query_id], emb[r.neighbor_id])
        assert abs(r.cosine_sim - expect) < 1e-9, (r.query_id, r.neighbor_id)
    # per-query ranks are 1..k contiguous
    by_q = {}
    for r in ann:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_mllib_minhash_agrees_with_exact(spark):
    """The MLlib estimator path must find the same near-dup pairs as
    the exact/banded pipelines (its similarity is estimated from 8
    hash tables, so values are approximate — pair SET parity only)."""
    got = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_mllib_minhash_pairs"](spark, SF_ORACLE).collect()
    }
    assert got == _planted_pairs(spark)


def test_ann_ivf_scores_exact_and_better_recall(spark):
    """IVF returns true cosine values (selection-only approximation)
    and with nprobe=4 over 16 cells should recall a decent share of
    the exact top-5."""
    ivf = QUERIES["sim_ann_ivf_topk"](spark, SF_ORACLE).collect()
    assert ivf
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return d / (na * nb)

    for r in ivf:
        assert abs(r.cosine_sim - cos(emb[r.query_id], emb[r.neighbor_id])) < 1e-9
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_cosine_topk"](spark, SF_ORACLE).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in ivf}
    # measured ~64% top-5 recall at nprobe=4/k=16 on the fixture —
    # 64-dim weakly-clustered vectors cap coarse quantization; assert
    # a conservative floor (everything is seeded/deterministic)
    assert len(got & exact) / len(exact) >= 0.5


def test_ann_brp_lsh_scores_exact_and_high_recall(spark):
    """MLlib BucketedRandomProjectionLSH over L2-normalized vectors:
    returned cosines are true values (selection-only approximation) and
    recall vs the exact top-5 is high (measured 94% on the fixture)."""
    brp = QUERIES["sim_ann_brp_lsh_topk"](spark, SF_ORACLE).collect()
    assert brp
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    }

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return d / (na * nb)

    for r in brp:
        assert abs(r.cosine_sim - cos(emb[r.query_id], emb[r.neighbor_id])) < 1e-9
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_cosine_topk"](spark, SF_ORACLE).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in brp}
    assert len(got & exact) / len(exact) >= 0.8  # seeded/deterministic


def test_ann_brp_approx_nearest_neighbors_serving_call(spark):
    """The single-key serving API (approxNearestNeighbors) on the same
    fitted model — top-1 neighbor of a corpus vector is itself."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from vector_db_core_spark.functions.vectors import l2_norm

    e = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("fv", array_to_vector(F.transform("v", lambda x: x / l2_norm("v"))))
    )
    model = BucketedRandomProjectionLSH(
        inputCol="fv", outputCol="hashes", bucketLength=0.8, numHashTables=3, seed=42
    ).fit(e)
    key = e.where(F.col("vec_id") == 0).head().fv
    nn = model.approxNearestNeighbors(e, key, 1).head()
    assert nn.vec_id == 0 and nn.distCol < 1e-9


def test_multimodal_extract_features_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(50)
    media = media_table_from_documents(docs)
    out = extract_features(media).collect()
    assert len(out) == 50
    for r in out:
        # plumbing: schema carried through, features deterministic vs
        # a driver-side recomputation on the same bytes
        assert r.media_type == "text/plain"
        expect = stub_features(bytes(r.payload))
        assert r.features == expect
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram


def test_pandas_udf_cosine_matches_codegen_kernel(spark):
    """The Arrow pandas_udf cosine and the JVM higher-order-function
    cosine agree to 1e-12 on real embedding pairs (different
    accumulation orders → not bit-identical by contract)."""
    from vector_db_core_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_pandas,
    )

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("v")
    )
    a = e.where(F.col("vec_id") < 20).select(F.col("v").alias("va"))
    b = e.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("v").alias("vb")
    )
    pairs = a.crossJoin(b)
    rows = pairs.select(
        cosine_similarity("va", "vb").alias("jvm"),
        cosine_similarity_pandas("va", "vb").alias("arrow"),
    ).collect()
    assert len(rows) == 400
    for r in rows:
        assert abs(r.jvm - r.arrow) < 1e-12


def test_ann_lsh_index_prunes_candidates(spark):
    """The index's reason to exist: the (table, bucket) equi-join must
    surface a strict subset of the N*Q brute-force pairs. On this
    fixture's near-orthogonal 64-d vectors the 4x16 index scans ~60%
    of the corpus per query (random pairs collide in SOME of 16 tables
    at p=(1/2)^4 each) while recalling 0.92 of the true top-5 — the
    honest LSH tradeoff at low neighbor cosine; sharper corpora (near-
    dups at cosine >= 0.8) prune far harder at the same recall. Pin
    selectivity < 0.8 so a parameter change that silently degenerates
    the index into brute force fails by name."""
    from vector_db_core_spark.functions.vectors import hyperplane_buckets_pandas
    from vector_db_core_spark.operators.llm import _LSH_PLANES, _LSH_TABLES

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    postings = e.select(
        "vec_id",
        F.posexplode(
            hyperplane_buckets_pandas(F.col("v"), planes=_LSH_PLANES, tables=_LSH_TABLES)
        ).alias("table", "bucket"),
    )
    q = postings.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    n_candidates = (
        postings.join(q, ["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    n_corpus = e.count()
    brute_force_pairs = 10 * (n_corpus - 1)
    selectivity = n_candidates / brute_force_pairs
    assert 0.0 < selectivity < 0.8, selectivity


def test_hyperplane_bucket_sql_variant_deterministic_and_independent(spark):
    """The SQL-fold single-bucket variant (kept for pure-JVM contexts
    where Python workers are unavailable — e.g. a SQL-only cluster
    profile): (a) rerun-stable, (b) buckets in [0, 2^planes), (c) its
    hash tables are genuinely different bucketings (table=0 vs table=1
    must disagree on a non-trivial share of vectors — independent
    planes are what multi-table recall math assumes)."""
    from vector_db_core_spark.functions.vectors import hyperplane_bucket

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = e.select(
        "vec_id",
        hyperplane_bucket("v", planes=4, table=0).alias("b0"),
        hyperplane_bucket("v", planes=4, table=1).alias("b1"),
    )
    run1 = {r.vec_id: (r.b0, r.b1) for r in out.collect()}
    run2 = {r.vec_id: (r.b0, r.b1) for r in out.collect()}
    assert run1 == run2
    assert all(0 <= b < 16 for pair in run1.values() for b in pair)
    assert len({b0 for b0, _ in run1.values()}) > 4  # real spread
    disagree = sum(1 for b0, b1 in run1.values() if b0 != b1)
    assert disagree / len(run1) > 0.5  # independent tables decorrelate


def test_hyperplane_buckets_pandas_deterministic_and_matches_numpy(spark):
    """The Arrow multi-table bucketizer: (a) rerun-stable (seeded
    planes rebuilt identically per batch/executor), (b) buckets in
    range, (c) equal to a driver-side numpy replica of the same seeded
    construction — the determinism the ANN index's reproducibility
    rests on."""
    import numpy as np

    from vector_db_core_spark.functions.vectors import hyperplane_buckets_pandas

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = e.select("vec_id", hyperplane_buckets_pandas("v", planes=4, tables=16).alias("b"))
    run1 = {r.vec_id: list(r.b) for r in out.collect()}
    run2 = {r.vec_id: list(r.b) for r in out.collect()}
    assert run1 == run2
    raw = {r.vec_id: np.asarray(r.v, dtype=np.float64) for r in e.collect()}
    rng = np.random.RandomState(3407)
    proj = rng.standard_normal((64, 16 * 4))
    for vid, buckets in run1.items():
        assert len(buckets) == 16
        assert all(0 <= b < 16 for b in buckets)
        bits = (raw[vid] @ proj) > 0
        expect = (bits.reshape(16, 4).astype(np.int64) * (1 << np.arange(4))).sum(axis=1)
        assert list(expect) == buckets, vid


def test_multimodal_resize_rewrites_payload_and_metadata(spark):
    from vector_db_core_spark.functions.multimodal import resize_media, stub_resize

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(20)
    media = media_table_from_documents(docs)
    out = resize_media(media, width=8, height=4).collect()
    assert len(out) == 20
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in out:
        assert r.width == 8 and r.height == 4
        assert bytes(r.payload) == stub_resize(src[r.media_id], 8, 4)
        assert len(r.payload) <= 32


def test_multimodal_sample_frames_fans_out(spark):
    from vector_db_core_spark.functions.multimodal import (
        sample_frames,
        stub_frame_slices,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(10)
    media = media_table_from_documents(docs)
    out = sample_frames(media, n_frames=3).collect()
    assert len(out) == 30  # 1 → N row fan-out
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, {})[r.frame_idx] = bytes(r.frame_payload)
    for mid, frames in by_media.items():
        expect = stub_frame_slices(src[mid], 3)
        assert [frames[i] for i in sorted(frames)] == expect


def test_multimodal_decode_stub_is_gated(spark):
    from vector_db_core_spark.functions.multimodal import decode_image

    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_multimodal_custom_decoder_plugs_in(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(5)
    media = media_table_from_documents(docs)
    out = extract_features(media, decoder=lambda b: [float(len(b)), float(b[0])]).collect()
    for r in out:
        assert r.features == [float(len(bytes(r.payload))), float(bytes(r.payload)[0])]


def test_group_pca_matches_numpy_and_is_partition_independent(spark):
    """The applyInPandas PCA must reproduce a driver-side numpy SVD on
    the sorted raw data exactly (vec_id sort fixes reduction order),
    for every label, and the unit-norm/variance invariants must hold."""
    import numpy as np

    rows = {r.label: r for r in QUERIES["sim_group_pca_top_component"](spark, SF_ORACLE).collect()}
    raw = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    assert len(rows) == raw["label"].nunique()
    for label, r in rows.items():
        sub = raw[raw.label == label]
        X = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
        Xc = X - X.mean(axis=0)
        _, s, vt = np.linalg.svd(Xc, full_matrices=False)
        v = vt[0]
        if v[np.abs(v).argmax()] < 0:
            v = -v
        assert r.n_vectors == len(sub)
        assert abs(r.explained_ratio - round(float(s[0] ** 2 / (s**2).sum()), 6)) < 1e-9
        assert np.allclose(np.array(r.component), np.round(v, 6), atol=1e-9)
        # top component is unit-norm and beats every coordinate axis
        assert abs(np.linalg.norm(r.component) - 1.0) < 1e-4
        proj_var = float(np.var(Xc @ np.array(r.component)))
        assert proj_var >= Xc.var(axis=0).max() * 0.999


def test_all_pairs_baselines_are_capped(spark):
    """The O(n^2) correctness baselines must refuse large inputs and
    point at their banded/bucketed scale twins."""
    import pytest

    from vector_db_core_spark.operators import llm

    big = spark.range(llm.ALL_PAIRS_ROW_CAP + 1)
    with pytest.raises(ValueError, match="dedup_minhash_lsh_pairs"):
        llm._assert_all_pairs_scale(big, "dedup_ngram_jaccard_pairs", "dedup_minhash_lsh_pairs")
    # at-or-under the cap passes through unchanged
    small = spark.range(10)
    assert llm._assert_all_pairs_scale(small, "x", "y") is small


# ------------------------------------------------------- real image decode
def _ppm(w, h, rgb):
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + bytes(rgb)


def _bmp24(w, h, rows_rgb):
    """Minimal bottom-up 24-bit BI_RGB BMP from row-major RGB tuples."""
    import struct

    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in reversed(rows_rgb):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        raster += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


def test_decode_image_netpbm_and_bmp():
    from vector_db_core_spark.functions.multimodal import decode_image

    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]  # 2x2 RGB
    img = decode_image(_ppm(2, 2, px))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert list(img["pixels"]) == px

    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    img = decode_image(_bmp24(2, 2, rows))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert list(img["pixels"]) == px  # same pixels as the PPM

    gray = b"P5\n2 1\n255\n" + bytes([0, 255])
    img = decode_image(gray)
    assert (img["width"], img["height"], img["channels"]) == (2, 1, 1)


def _png(w, h, color_type, raster_rows, filters=None):
    """Minimal PNG encoder for round-trip tests: 8-bit, non-interlaced.

    ``raster_rows`` is a list of per-row byte sequences (unfiltered);
    ``filters`` optionally assigns a filter type per row — the encoder
    applies the real forward filter so the decoder's unfilter path for
    that type is exercised.
    """
    import struct
    import zlib

    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = nch  # 8-bit depth
    filters = filters or [0] * h
    prev = bytes(w * bpp)
    stream = b""
    for row, ftype in zip(raster_rows, filters):
        row = bytes(row)
        filtered = bytearray(len(row))
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                filtered[i] = row[i]
            elif ftype == 1:
                filtered[i] = (row[i] - a) & 0xFF
            elif ftype == 2:
                filtered[i] = (row[i] - b) & 0xFF
            elif ftype == 3:
                filtered[i] = (row[i] - (a + b) // 2) & 0xFF
            elif ftype == 4:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filtered[i] = (row[i] - pred) & 0xFF
        stream += bytes([ftype]) + bytes(filtered)
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )


def test_decode_image_png_gray_and_rgb_all_filters():
    from vector_db_core_spark.functions.multimodal import decode_image

    # 2x2 RGB, one row filter None and one Sub
    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]
    rows = [px[:6], px[6:]]
    img = decode_image(_png(2, 2, 2, rows, filters=[0, 1]))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert list(img["pixels"]) == px

    # 3x5 gray exercising every filter type 0..4
    grows = [[10, 20, 30], [40, 50, 60], [7, 8, 9], [100, 110, 120], [1, 2, 3]]
    img = decode_image(_png(3, 5, 0, grows, filters=[0, 1, 2, 3, 4]))
    assert (img["width"], img["height"], img["channels"]) == (3, 5, 1)
    assert list(img["pixels"]) == [b for row in grows for b in row]

    # RGBA → alpha dropped, pixels match the RGB image
    rgba_rows = [
        [255, 0, 0, 9, 0, 255, 0, 9],
        [0, 0, 255, 9, 10, 20, 30, 9],
    ]
    img = decode_image(_png(2, 2, 6, rgba_rows, filters=[2, 4]))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert list(img["pixels"]) == px

    # gray+alpha → alpha dropped
    ga_rows = [[10, 9, 20, 9]]
    img = decode_image(_png(2, 1, 4, ga_rows))
    assert (img["width"], img["height"], img["channels"]) == (2, 1, 1)
    assert list(img["pixels"]) == [10, 20]


def test_png_roundtrip_property():
    """Property test (hypothesis): ANY 8-bit image (gray/RGB/RGBA,
    arbitrary pixel bytes, arbitrary per-row filter choice) encoded to
    PNG decodes back to exactly the original raster — the unfilter
    paths are inverses of the filters for all inputs, not just the
    hand-picked cases above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vector_db_core_spark.functions.multimodal import decode_image

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 6),
        h=st.integers(1, 6),
        color=st.sampled_from([0, 2, 4, 6]),
        data=st.data(),
    )
    def run(w, h, color, data):
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        rows = [
            data.draw(st.lists(st.integers(0, 255), min_size=w * nch, max_size=w * nch))
            for _ in range(h)
        ]
        filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
        img = decode_image(_png(w, h, color, rows, filters=filters))
        out_ch = {0: 1, 2: 3, 4: 1, 6: 3}[color]  # alpha dropped
        assert (img["width"], img["height"], img["channels"]) == (w, h, out_ch)
        expect = [
            row[i * nch + c] for row in rows for i in range(w) for c in range(out_ch)
        ]
        assert list(img["pixels"]) == expect

    run()


def test_decode_image_malformed_payloads_are_declared_not_crashes():
    """A valid magic followed by garbage must raise UnsupportedMediaError
    (never a raw ValueError/IndexError) so features_or_stub stays total
    over corrupt rows in a mixed corpus."""
    import pytest

    from vector_db_core_spark.functions.multimodal import (
        UnsupportedMediaError,
        decode_image,
        features_or_stub,
        stub_features,
    )

    good_bmp = _bmp24(2, 2, [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]])
    corrupt = [
        good_bmp[:-5],  # truncated BMP raster → short unpack
        b"P6\nnot numbers\n255\n\x00",  # corrupt netpbm header → int() fails
        b"P6\n# comment never ends",  # netpbm comment without newline → .index fails
        _png(2, 1, 0, [[1, 2]])[:-20],  # PNG truncated mid-IDAT
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 20,  # PNG sig, garbage chunks
        good_bmp[:30],  # BMP shorter than its own header
    ]
    # bad zlib stream inside an otherwise well-formed PNG
    whole = bytearray(_png(2, 1, 0, [[1, 2]]))
    idat_at = bytes(whole).index(b"IDAT") + 4
    whole[idat_at : idat_at + 4] = b"\xde\xad\xbe\xef"
    corrupt.append(bytes(whole))

    for payload in corrupt:
        with pytest.raises(UnsupportedMediaError):
            decode_image(payload)
        assert features_or_stub(payload) == stub_features(payload)


def test_decode_image_unsupported_is_declared():
    import pytest

    from vector_db_core_spark.functions.multimodal import (
        UnsupportedMediaError,
        decode_image,
        features_or_stub,
        stub_features,
    )

    jpegish = b"\xff\xd8\xff\xe0 not actually decodable here"
    with pytest.raises(UnsupportedMediaError, match="magic"):
        decode_image(jpegish)
    # the total featurizer falls back to byte features instead of dying
    assert features_or_stub(jpegish) == stub_features(jpegish)


def test_image_features_in_spark_pipeline(spark):
    """Real pixel features flow through the same mapInPandas plumbing."""
    from vector_db_core_spark.functions.multimodal import image_features

    red = _ppm(2, 2, [255, 0, 0] * 4)
    blue = _ppm(2, 2, [0, 0, 255] * 4)
    df = spark.createDataFrame(
        [(1, bytearray(red)), (2, bytearray(blue))], "media_id BIGINT, payload BINARY"
    )
    out = {r.media_id: r.features for r in extract_features(df, decoder=image_features).collect()}
    assert out[1][0] == 1.0 and out[1][1] == 0.0  # all-red: R mean 1
    assert out[2][2] == 1.0 and out[2][0] == 0.0  # all-blue: B mean 1
    # luminance hist sums to 1
    assert abs(sum(out[1][3:]) - 1.0) < 1e-12


def test_incremental_minhash_no_cartesian_and_cross_side_only(spark):
    """Incremental dedup must (a) never plan a cartesian and (b) emit
    only batch-vs-corpus pairs (doc_id%10==0 on exactly one side)."""
    df = QUERIES["dedup_incremental_minhash"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    for r in rows:
        assert r.batch_doc_id % 10 == 0
        assert r.corpus_doc_id % 10 != 0


def test_pq_codes_determinism_and_quality(spark):
    """sim_pq_codes is rows-only; pin its contract: 8 codes per vector
    each in [0,16), bit-identical codes across two runs (seeded
    codebooks + deterministic assignment), and a reconstruction
    cosine floor — 8x16-centroid PQ must beat 0.55 mean on this
    fixture (measured ~0.65+; random guessing sits near 0)."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    a = QUERIES["sim_pq_codes"](spark, SF_ORACLE).orderBy("vec_id").collect()
    assert all(len(r.codes) == 8 for r in a)
    assert all(0 <= c < 16 for r in a for c in r.codes)
    mean_cos = sum(r.recon_cosine for r in a) / len(a)
    assert mean_cos > 0.55, mean_cos
    b = QUERIES["sim_pq_codes"](spark, SF_ORACLE).orderBy("vec_id").collect()
    assert [r.codes for r in a] == [r.codes for r in b]


def test_pq_exact_twin_agrees_with_production_encoder(spark):
    """The hash-gated twin (sim_pq_codes_exact: seeded codebooks +
    integer micro-quantized distances) must assign the SAME codes the
    production Arrow-batched encoder does when that encoder is fed the
    twin's codebooks — tying the DuckDB-derivable twin to the real
    assignment path. Since r13 both sides literally run the SAME
    numpy kernel (_pq_block_dists — float64 here, int64 in the twin),
    so this test pins the kernel's dtype-independence end to end.
    Micro-quantization at 1e6 can only flip an argmin
    on a near-exact float tie, which this fixture has none of."""
    import numpy as np

    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES
    from vector_db_core_spark.operators.llm import (
        _PQ_K,
        _PQ_NB,
        _PQ_SD,
        _pq_encode,
        _t,
    )
    from pyspark.sql import functions as F

    twin = {
        r.vec_id: r.codes
        for r in QUERIES["sim_pq_codes_exact"](spark, SF_ORACLE).collect()
    }
    e = _t(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_PQ_K)
        .collect()
    )
    # codebook (nb, k, sd): centroid cid of block b = seed cid's sub-block b
    books = np.stack(
        [
            np.array([s.v for s in seeds])[:, b * _PQ_SD : (b + 1) * _PQ_SD]
            for b in range(_PQ_NB)
        ]
    )
    prod = {
        r.vec_id: ",".join(str(c) for c in r.codes)
        for r in _pq_encode(spark, e, books).collect()
    }
    assert prod == twin
    spark.catalog.clearCache()


def test_pq_adc_recall_against_true_ranking(spark):
    """ADC is an ESTIMATE — pin its serving quality, not equality:
    dense 1..20 ranks ordered by non-decreasing ADC distance, the
    query vector excluded, each hit's carried true_dist equal to the
    numpy-recomputed integer distance, and ADC's top-20 recovering
    far more of the TRUE top-20 than chance (measured 0.25 with the
    SEEDED codebooks — untrained centroids are the hash-gate tradeoff;
    the trained sim_pq_codes books quantize much tighter — vs ~0.04
    random at 500 vectors)."""
    import numpy as np
    import pyarrow.parquet as pq

    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    rows = sorted(
        QUERIES["sim_pq_adc_topk"](spark, SF_ORACLE).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, 21))
    assert all(r.vec_id != 0 for r in rows)
    adcs = [r.adc_dist for r in rows]
    assert adcs == sorted(adcs)
    t = pq.read_table(f"{SF_ORACLE}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    xm = np.rint(np.stack(t.embedding.to_numpy()).astype(np.float64) * 1e6).astype(
        np.int64
    )
    vids = t.vec_id.to_numpy()
    q = xm[vids == 0][0]
    d2 = ((xm - q) ** 2).sum(axis=1)
    true_by_vid = dict(zip(vids.tolist(), d2.tolist()))
    for r in rows:
        assert r.true_dist == true_by_vid[r.vec_id], r
    order = sorted((d, v) for v, d in true_by_vid.items() if v != 0)
    true_top = {v for _, v in order[:20]}
    recall = len(true_top & {r.vec_id for r in rows}) / 20
    assert recall >= 0.2, recall
    spark.catalog.clearCache()


def test_ivfpq_prunes_and_agrees_with_adc(spark):
    """IVF-PQ structural pins: dense ranks ordered by ADC distance;
    hits span at most nprobe=2 cells; n_scanned strictly below the
    corpus (the pruning IS the op); and on the probed subset the
    composed index must agree with the unpartitioned ADC scan — every
    IVF hit that sim_pq_adc_topk also ranked carries the IDENTICAL
    adc_dist (same codebooks, same codes, same LUT)."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    rows = sorted(
        QUERIES["sim_ivfpq_topk"](spark, SF_ORACLE).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, 11))
    adcs = [r.adc_dist for r in rows]
    assert adcs == sorted(adcs)
    assert len({r.cell for r in rows}) <= 2
    n = rows[0].n_scanned
    assert all(r.n_scanned == n for r in rows)
    assert 10 <= n < 499  # pruned: strictly below the 499-vector corpus
    flat = {
        r.vec_id: r.adc_dist
        for r in QUERIES["sim_pq_adc_topk"](spark, SF_ORACLE).collect()
    }
    overlap = [r for r in rows if r.vec_id in flat]
    assert overlap, "probe cells missed every flat-ADC hit"
    for r in overlap:
        assert r.adc_dist == flat[r.vec_id], r
    spark.catalog.clearCache()


def test_streaming_ivf_cells_matches_batch_row_for_row(spark):
    """The streaming-maintained cell index must serve the probe query
    IDENTICALLY to the inline batch op — same seeded codebook, same
    Arrow assignment kernel, same serving path (the whole point:
    incrementally maintained index, batch-identical answers; the
    streaming BM25 recipe applied to the dense leg)."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    batch = sorted(
        map(tuple, QUERIES["sim_ivfpq_topk"](spark, SF_ORACLE).collect())
    )
    streamed = sorted(
        map(
            tuple,
            QUERIES["streaming_ivf_cells_replay"](spark, SF_ORACLE).collect(),
        )
    )
    assert batch == streamed and len(batch) == 10
    spark.catalog.clearCache()


def test_distinct_ngrams_approx_within_error_bound(spark):
    """The linear-counting twin must sit within 2% relative error of
    the exact distinct-n ratios at gate scale (load factor ~0.16 at
    sf0.01 trigrams -> sub-1% expected; 2% is a comfortable
    deterministic bound for the fixed md5 grid), with identical
    total_unigrams — the exact/approx twin policy's measurable-error
    discipline."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    exact = {
        r.source: r
        for r in QUERIES["text_distinct_ngrams"](spark, SF_ORACLE).collect()
    }
    approx = {
        r.source: r
        for r in QUERIES["text_distinct_ngrams_approx"](spark, SF_ORACLE).collect()
    }
    assert set(approx) == set(exact)
    for src, a in approx.items():
        e = exact[src]
        assert a.total_unigrams == e.total_unigrams, src
        for col in ("distinct_1", "distinct_2", "distinct_3"):
            av, ev = getattr(a, col), getattr(e, col)
            assert (av is None) == (ev is None), (src, col)
            if ev is not None:
                assert abs(av - ev) / ev <= 0.02, (src, col, av, ev)
    spark.catalog.clearCache()


def test_ivfpq_partitioned_prunes_partitions_and_matches_inline(spark):
    """The serving-layout variant (r12-verdict task 5): the
    cell-partitioned codes table's probe must be answered by PARQUET
    PARTITION PRUNING — the executed plan's codes-table scan carries
    ``PartitionFilters: [cell IN (a,b)]`` with exactly nprobe=2 cells
    and a ReadSchema WITHOUT the pruned-away cell column — and the
    result must be row-identical to the inline ``sim_ivfpq_topk``
    (same kernel, same LUT, same oracle)."""
    import os
    import re

    from tests.conftest import SF_ORACLE
    from vector_db_core_spark import scratch
    from vector_db_core_spark.operators import QUERIES

    df = QUERIES["sim_ivfpq_partitioned_topk"](spark, SF_ORACLE)
    got = sorted(map(tuple, df.collect()))
    inline = sorted(map(tuple, QUERIES["sim_ivfpq_topk"](spark, SF_ORACLE).collect()))
    assert got == inline
    # the scratch table is genuinely partitioned: one dir per cell
    path = scratch.path_for("ivfpq_codes", SF_ORACLE)
    assert path is not None
    cell_dirs = [d for d in os.listdir(path) if d.startswith("cell=")]
    assert len(cell_dirs) > 2  # pruning has something to prune
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    seg = next(
        seg for seg in plan.split("\n\n") if "vdbc_ivfpq_codes" in seg
    )
    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)\]", seg)
    assert m, seg
    assert len(m.group(1).split(",")) == 2  # exactly nprobe partitions
    spark.catalog.clearCache()


def test_rrf_fusion_invariants(spark):
    """RRF structural pins: dense 1..20 fused ranks; every row carries
    at least one leg rank and each present leg rank is in 1..20; the
    score equals the two-term closed form recomputed from the leg
    ranks; and the fused order is the score order (doc_id ties)."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES
    from vector_db_core_spark.operators.llm import _RRF_DEPTH, _RRF_K

    rows = sorted(
        QUERIES["text_rrf_hybrid_topk"](spark, SF_ORACLE).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, _RRF_DEPTH + 1))
    assert all(r.doc_id != 0 for r in rows)  # query doc excluded
    keys = []
    for r in rows:
        assert r.bm25_rank is not None or r.cosine_rank is not None
        expect = 0.0
        for leg in (r.bm25_rank, r.cosine_rank):
            if leg is not None:
                assert 1 <= leg <= _RRF_DEPTH
                expect += 1.0 / (_RRF_K + leg)
        assert abs(r.rrf_score - round(expect, 6)) < 1e-9, r
        keys.append((-r.rrf_score, r.doc_id))
    assert keys == sorted(keys)
    # fusion's point: a doc on BOTH lists outranks same-rank singles —
    # the top fused row must be a both-lists member if any exists
    both = [r for r in rows if r.bm25_rank is not None and r.cosine_rank is not None]
    if both:
        singles_best = min(
            (r.rrf_score for r in rows if r not in both), default=0.0
        )
        assert max(r.rrf_score for r in both) >= singles_best
    spark.catalog.clearCache()


def test_hashed_span_dedup_equals_exact_twin(spark):
    """The xxhash64-keyed scale twin must emit EXACTLY the pairs and
    counts of the string-keyed exact op at gate scale (a difference
    would mean a 64-bit span-hash collision inside a shared bucket,
    probability ~1e-17 here)."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    exact = sorted(
        map(tuple, QUERIES["dedup_span_pairs"](spark, SF_ORACLE).collect())
    )
    hashed = sorted(
        map(tuple, QUERIES["dedup_span_pairs_hashed"](spark, SF_ORACLE).collect())
    )
    assert exact == hashed and len(exact) > 0


def test_udtf_matches_builtin_segments(spark):
    """The Python-UDTF segmentation (the UDTF face of the UDF surface)
    must be row-identical to the codegen'd split+posexplode twin —
    including segment indices when empty parts are dropped."""
    from tests.conftest import SF_ORACLE
    from vector_db_core_spark.operators import QUERIES

    builtin = sorted(
        map(tuple, QUERIES["text_split_segments"](spark, SF_ORACLE).collect())
    )
    via_udtf = sorted(
        map(tuple, QUERIES["text_split_segments_udtf"](spark, SF_ORACLE).collect())
    )
    assert builtin == via_udtf
    assert len(builtin) > 300, "fan-out vacuous — expected multiple segments/doc"


def test_gopher_flags_discriminate_on_fixture(spark):
    """The Gopher rule suite must be non-vacuous here: the word-count
    and stop-word rules each pass AND fail real documents, the keep
    decision is exactly the conjunction of the five flags, and the
    fixture-vacuous rules (alpha/symbol — single-line word-soup text)
    pass everywhere as documented in the docstring."""
    rows = QUERIES["text_gopher_quality_flags"](spark, SF_ORACLE).collect()
    assert len(rows) == 500
    wc = [r.pass_word_count for r in rows]
    st = [r.pass_stopwords for r in rows]
    assert any(wc) and not all(wc)
    assert any(st) and not all(st)
    assert all(r.pass_alpha_ratio and r.pass_symbol_ratio for r in rows)
    for r in rows:
        assert r.gopher_keep == (
            r.pass_word_count
            and r.pass_mean_word_len
            and r.pass_stopwords
            and r.pass_alpha_ratio
            and r.pass_symbol_ratio
        )
    kept = sum(1 for r in rows if r.gopher_keep)
    assert 0 < kept < 500


def test_semdedup_invariants(spark):
    """SemDeDup's dominance rule gives the paper's two guarantees —
    verify them against a numpy re-derivation of every within-cell
    cosine: (1) no two KEPT vectors in one cell are within tau; (2)
    every PRUNED vector names a dominator in its cell that is within
    tau and better-ranked (lower centroid_sim, vec_id tiebreak); (3)
    output is one row per corpus vector regardless of clustering."""
    import numpy as np

    tau = 0.35
    rows = QUERIES["sim_semdedup_prune"](spark, SF_ORACLE).collect()
    assert len(rows) == 500
    assert {r.vec_id for r in rows} == set(range(500))

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    }
    def cos(a, b):
        va, vb = emb[a], emb[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)

    # Re-derive the UNROUNDED centroid cosine in numpy: the operator's
    # k-means has converged on this fixture, so each model centroid
    # equals the mean of its final members' embeddings — cross-checked
    # below against the rounded output value for every row. This makes
    # the dominator-rank assertion STRICT (the old <=1e-6 tolerance
    # for 6-dp output rounding could also absorb a genuine inversion
    # between members whose centroid_sim differ by <=1e-6).
    cent = {
        cell: np.mean([emb[r.vec_id] for r in members], axis=0)
        for cell, members in by_cell.items()
    }
    unrounded = {}
    for r in rows:
        c, v = cent[r.cell], emb[r.vec_id]
        unrounded[r.vec_id] = float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        assert abs(unrounded[r.vec_id] - r.centroid_sim) <= 5.1e-7, (
            r.vec_id,
            "member-mean centroid disagrees with model centroid — k-means "
            "did not converge; the strict rank re-derivation is invalid",
        )

    pruned = [r for r in rows if r.action == "prune"]
    assert pruned, "fixture has within-cell near-dups; prune set must be non-empty"
    for cell, members in by_cell.items():
        keep = [r.vec_id for r in members if r.action == "keep"]
        for i, a in enumerate(keep):
            for b in keep[i + 1 :]:
                assert cos(a, b) < tau, f"kept near-dup pair {a},{b} in cell {cell}"
    for r in pruned:
        assert r.pruned_by is not None and r.n_dominators >= 1
        assert cos(r.vec_id, r.pruned_by) >= tau - 1e-12
        # strict (csim, vec_id) ordering on the unrounded values
        a = (unrounded[r.pruned_by], r.pruned_by)
        b = (unrounded[r.vec_id], r.vec_id)
        assert a < b, (r.pruned_by, r.vec_id)


def test_resize_image_nearest_neighbor_roundtrip():
    """resize_image must decode, resample with the floor convention,
    and re-encode netpbm that our own decoder round-trips — for gray
    netpbm, RGB PPM, and BMP inputs; numpy re-derives the expectation.
    Bad payloads and bad targets stay declared errors."""
    import numpy as np
    import pytest as _pytest

    from vector_db_core_spark.functions.multimodal import (
        UnsupportedMediaError,
        decode_image,
        resize_image,
    )

    # 4x4 gray ramp → 2x2 picks rows/cols 0,2
    raster = bytes(range(16))
    out = resize_image(b"P5\n4 4\n255\n" + raster, 2, 2)
    assert out.startswith(b"P5\n2 2\n255\n")
    assert list(out[len(b"P5\n2 2\n255\n"):]) == [0, 2, 8, 10]

    # upscale is index replication under the same convention
    up = resize_image(b"P5\n2 1\n255\n" + bytes([7, 9]), 4, 1)
    assert list(up[len(b"P5\n4 1\n255\n"):]) == [7, 7, 9, 9]

    # RGB PPM → P6, channels move together
    px = [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]  # 2x2 RGB
    out = resize_image(_ppm(2, 2, px), 1, 1)
    img = decode_image(out)
    assert (img["width"], img["height"], img["channels"]) == (1, 1, 3)
    assert list(img["pixels"]) == [255, 0, 0]

    # BMP input resizes through the same kernel; verify vs numpy
    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    out = decode_image(resize_image(_bmp24(2, 2, rows), 2, 1))
    ref = np.array(px, dtype=np.uint8).reshape(2, 2, 3)[[0]][:, [0, 1]]
    assert list(out["pixels"]) == list(ref.tobytes())

    with _pytest.raises(UnsupportedMediaError):
        resize_image(b"\x00garbage", 2, 2)
    with _pytest.raises(UnsupportedMediaError):
        resize_image(b"P5\n4 4\n255\n" + raster, 0, 2)
    with _pytest.raises(UnsupportedMediaError):
        resize_image(b"P5\n4 4\n255\n" + raster[:3], 2, 2)  # truncated


def test_top_ngram_fractions_discriminate_and_agree_with_numpy(spark):
    """The top-3/4-gram caps must be non-vacuous (both pass and fail
    real docs at each n) and the argmax must agree with a pure-python
    re-derivation on a sample of documents (count desc, lexicographic
    tie-break)."""
    rows = QUERIES["text_top_ngram_char_fractions"](spark, SF_ORACLE).collect()
    by_n = {}
    for r in rows:
        by_n.setdefault(r.n, []).append(r)
    assert set(by_n) == {3, 4}
    for n, rs in by_n.items():
        flags = [r.pass_cap for r in rs]
        assert any(flags) and not all(flags), f"n={n} vacuous"

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet").collect()
        if r.doc_id < 40
    }
    got = {(r.doc_id, r.n): r for r in rows if r.doc_id < 40}
    for doc_id, text in docs.items():
        w = [t for t in text.split() if t]
        for n in (3, 4):
            if len(w) < n:
                assert (doc_id, n) not in got
                continue
            counts = {}
            for i in range(len(w) - n + 1):
                s = " ".join(w[i : i + n])
                counts[s] = counts.get(s, 0) + 1
            top = min(counts, key=lambda s: (-counts[s], s))
            r = got[(doc_id, n)]
            assert r.top_ngram == top and r.top_count == counts[top], (doc_id, n)


def test_span_novelty_consistent_with_span_pairs(spark):
    """Cross-operator invariant: a document participates in at least
    one ``dedup_span_pairs`` pair IFF duplicated spans exist for it —
    every paired doc must show dup_spans >= 1 here (the pair op's cap
    can only hide HOT spans, i.e. spans this op still counts as
    duplicated), and fractions stay in [0, 1]."""
    nov = {r.doc_id: r for r in QUERIES["text_span_novelty"](spark, SF_ORACLE).collect()}
    assert nov, "no documents scored"
    for r in nov.values():
        assert 0 <= r.dup_spans <= r.n_spans
        assert 0.0 <= r.dup_fraction <= 1.0
    paired = set()
    for p in QUERIES["dedup_span_pairs"](spark, SF_ORACLE).collect():
        paired.add(p.doc_a)
        paired.add(p.doc_b)
    no_dup = [d for d in paired if nov[d].dup_spans == 0]
    assert not no_dup, f"paired docs with zero duplicated spans: {no_dup[:5]}"


def test_hard_negatives_numpy_rederivation(spark):
    """For every query: exactly 3 negatives, all with a different
    label, ranked by exact cosine — re-derived in numpy for query 0."""
    import numpy as np

    rows = QUERIES["sim_hard_negatives"](spark, SF_ORACLE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for qid, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3]
        assert all(r.negative_label != r.query_label for r in rs)
        sims = [r.cosine_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)

    emb = {
        r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
        for r in spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    }
    qv, qlab = emb[0]
    scored = []
    for vid, (v, lab) in emb.items():
        if lab == qlab:
            continue
        cs = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        scored.append((-cs, vid))
    expect = [vid for _, vid in sorted(scored)[:3]]
    got = [r.negative_id for r in sorted(by_q[0], key=lambda r: r.rank)]
    assert got == expect


def test_frame_sample_reassembles_payload_prefix(spark):
    """Frames must be the stub sampler's exact byte slices: 4 frames
    per media row, their concatenation a prefix of the payload, md5s
    re-derived in hashlib for a sample of documents."""
    import hashlib

    rows = QUERIES["multimodal_frame_sample"](spark, SF_ORACLE).collect()
    by_m = {}
    for r in rows:
        by_m.setdefault(r.media_id, []).append(r)
    texts = {
        r.doc_id: r.text.encode()
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet").collect()
    }
    assert set(by_m) == set(texts)
    for mid, payload in list(texts.items())[:50]:
        rs = sorted(by_m[mid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rs] == [0, 1, 2, 3]
        step = max(1, len(payload) // 4)
        for r in rs:
            fr = payload[r.frame_idx * step : (r.frame_idx + 1) * step]
            assert r.frame_len == len(fr)
            assert r.frame_md5 == hashlib.md5(fr).hexdigest()


def test_quality_threshold_sweep_monotone(spark):
    """Per lang: pass_rate must be 1.0 at threshold 0 (the score is a
    sum of non-negative terms), monotonically non-increasing in the
    threshold, and strictly below 1 by the top step (the sweep must
    actually discriminate)."""
    rows = QUERIES["text_quality_threshold_sweep"](spark, SF_ORACLE).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.step] = r
    for lang, steps in by_lang.items():
        assert sorted(steps) == list(range(10)), lang
        assert steps[0].n_pass == steps[0].n_docs
        rates = [steps[i].pass_rate for i in range(10)]
        assert all(a >= b for a, b in zip(rates, rates[1:])), (lang, rates)
        assert rates[9] < 1.0, lang


def test_perplexity_buckets_are_ordered_terciles(spark):
    rows = QUERIES["text_perplexity_buckets"](spark, SF_ORACLE).collect()
    by = {}
    for r in rows:
        by.setdefault(r.bucket, []).append(r.avg_logprob)
    # terciles: sizes within 2 of each other
    sizes = sorted(len(v) for v in by.values())
    assert set(by) == {"head", "middle", "tail"}
    assert sizes[-1] - sizes[0] <= 2, sizes
    # ordering: every head doc scores >= every middle doc >= every tail
    assert min(by["head"]) >= max(by["middle"])
    assert min(by["middle"]) >= max(by["tail"])


def test_paragraph_keep_first_ledger_balances(spark, duck):
    rows = QUERIES["dedup_paragraph_keep_first"](spark, SF_ORACLE).collect()
    total = sum(r.n_paragraphs for r in rows)
    dups = sum(r.n_dup_paragraphs for r in rows)
    # keep-first: every distinct paragraph has exactly one owner, so
    # removals == total segments - distinct segments (duck re-derivation)
    distinct = duck.sql(r"""
        WITH t AS (SELECT doc_id,
                          list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                   FROM documents)
        SELECT COUNT(DISTINCT array_to_string(toks[i*8+1 : i*8+8], ' '))
        FROM t, UNNEST(generate_series(0, CAST(ceil(len(toks) / 8.0) AS INT) - 1)) AS u(i)
        WHERE len(toks) >= 1
    """).fetchone()[0]
    assert dups == total - distinct
    assert dups > 0  # non-vacuity: the fixture's near-dups share paragraphs


def test_zipf_fit_is_decreasing_fit(spark):
    row = QUERIES["text_zipf_fit"](spark, SF_ORACLE).collect()[0]
    # frequency is non-increasing in rank by construction, so any
    # least-squares fit of ln(freq) on ln(rank) must slope down
    assert row.zipf_slope < 0
    assert row.vocab_size > 0 and row.total_tokens > row.vocab_size


def test_mattr_short_docs_fall_back_to_exact_ttr(spark):
    rows = QUERIES["text_mattr_diversity"](spark, SF_ORACLE).collect()
    short = [r for r in rows if r.n_tokens < 25]
    assert short, "fixture should have sub-window docs (min 10 tokens)"
    for r in short:
        assert r.window_size == r.n_tokens and r.n_windows == 1
    # and a long doc uses the full 25-token window
    assert any(r.window_size == 25 and r.n_windows > 1 for r in rows)


def test_pca_power_iteration_tracks_numpy_direction(spark):
    """The integer power iteration must point where float power
    iteration points: for every label, run 8 float iterations in
    numpy from the same all-ones start on the same centered
    micro-quantized data and require |cosine| > 0.999 with the
    engine's integer loading vector (sign is fixed engine-side, so
    compare modulo sign)."""
    import numpy as np
    import pandas as pd

    rows = QUERIES["sim_pca_power_iteration_exact"](spark, SF_ORACLE).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, {})[r.dim] = r.loading_micro
    emb = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    for label, dims in by_label.items():
        X = np.stack(
            emb[emb.label == label].sort_values("vec_id").embedding.to_numpy()
        ).astype(np.float64)
        Xm = np.round(X * 1e6)
        C = (Xm - np.floor_divide(Xm.sum(0), len(Xm))).T @ (
            Xm - np.floor_divide(Xm.sum(0), len(Xm))
        )
        v = np.ones(X.shape[1])
        for _ in range(8):
            v = C @ v
            v = v / np.abs(v).max()
        got = np.array([dims[i] for i in range(X.shape[1])], dtype=np.float64)
        cos = abs(v @ got) / (np.linalg.norm(v) * np.linalg.norm(got))
        assert cos > 0.999, (label, cos)


def test_minhash_md5_estimate_tracks_exact_jaccard(spark):
    """The gated estimator must behave like MinHash: banding floor
    (>= 4/16 agreement for every candidate), and confident estimates
    (>= 0.75) must be real near-dups per the exact >= 0.5 Jaccard
    pair set (the production oracle)."""
    est = QUERIES["dedup_minhash_md5_estimate"](spark, SF_ORACLE).collect()
    assert est
    assert all(4 <= r.n_agree <= 16 for r in est)
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard_pairs"](spark, SF_ORACLE).collect()
    }
    confident = [(r.doc_a, r.doc_b) for r in est if r.est_jaccard >= 0.75]
    assert confident and all(p in exact for p in confident)


def test_kmeans_exact_clusters_are_sane(spark):
    """All k=4 clusters survive two Lloyd iterations on the fixture,
    every vector lands in exactly one, distances are nonnegative, and
    the clustering beats random: mean intra-cluster distance < mean
    distance to OTHER clusters' centroids (re-derived in numpy from
    the same integer recurrence)."""
    import numpy as np

    from vector_db_core_spark.sources import load_table

    rows = QUERIES["sim_kmeans_lloyd_exact"](spark, SF_ORACLE).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }
    assert len(rows) == len(emb)
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r.dist_sq >= 0
        by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    assert len(by_cluster) == 4
    cents = {
        c: np.mean([np.round(emb[v] * 1e6) for v in vs], axis=0)
        for c, vs in by_cluster.items()
    }
    intra, inter = [], []
    for c, vs in by_cluster.items():
        for v in vs[:50]:
            x = np.round(emb[v] * 1e6)
            intra.append(float(((x - cents[c]) ** 2).sum()))
            inter.extend(
                float(((x - cents[o]) ** 2).sum()) for o in cents if o != c
            )
    assert np.mean(intra) < np.mean(inter)


def test_gopher_line_rules_discriminate(spark):
    """Every line-shaped rule must reject a non-empty, non-total slice
    of the fixture (the registration bar the single-line raw text
    could not meet — measured 450/454/475 of 500 passing at sf0.01),
    and the fractions must re-derive from the integer counts."""
    rows = QUERIES["text_gopher_line_rules"](spark, SF_ORACLE).collect()
    n = len(rows)
    assert n > 0
    for c in ("pass_dup_lines", "pass_ellipsis_lines", "pass_bullet_lines"):
        k = sum(getattr(r, c) for r in rows)
        assert 0 < k < n, (c, k, n)
    for r in rows:
        assert r.n_lines >= 1
        assert abs(r.dup_line_frac - r.n_dup_lines / r.n_lines) < 1e-6
        assert r.line_rules_keep == (
            r.pass_dup_lines and r.pass_ellipsis_lines and r.pass_bullet_lines
        )
        # the all-bullets pathology: bullet_line_frac 1.0 docs fail
        if r.bullet_line_frac == 1.0:
            assert not r.pass_bullet_lines


def test_embedding_drift_halves_matches_numpy(spark):
    """Per-label centroid drift must equal a numpy re-derivation from
    the raw vectors under the same md5 split and micro-quantization,
    and same-distribution halves must sit near zero relative to the
    embedding scale (the split is random-by-hash, so the halves share
    a distribution by construction)."""
    import hashlib

    import numpy as np

    from vector_db_core_spark.sources import load_table

    rows = load_table(spark, SF_ORACLE, "embeddings").collect()
    got = {
        r.label: r
        for r in QUERIES["sim_embedding_drift_halves"](spark, SF_ORACLE).collect()
    }
    by_label: dict = {}
    for r in rows:
        in_a = hashlib.md5(str(r.vec_id).encode()).hexdigest()[0] <= "7"
        by_label.setdefault(r.label, {True: [], False: []})[in_a].append(r.embedding)
    for label, halves in by_label.items():
        g = got[label]
        assert (g.n_a, g.n_b) == (len(halves[True]), len(halves[False]))
        mus = {}
        for side, vecs in halves.items():
            # half-AWAY rounding to match the engines (Spark F.round /
            # DuckDB round); np.round is half-to-even and would differ
            # on a v*1e6 landing exactly on .5 (r9 advice)
            scaled = np.array(vecs, dtype=np.float64) * 1_000_000.0
            micro = np.floor(np.abs(scaled) + 0.5) * np.sign(scaled)
            s = micro.sum(axis=0)
            cnt = len(vecs)
            mus[side] = np.fix(s / cnt)  # truncating integer division
        want_sq = int(((mus[True] - mus[False]) ** 2).sum())
        assert g.shift_sq_micro == want_sq, (label, g.shift_sq_micro, want_sq)
        # hash halves share the distribution: drift well under the
        # unit-norm embedding scale
        assert g.drift_l2 < 0.5, (label, g.drift_l2)


def test_dhash_signature_known_raster():
    """dHash bits re-derived by hand on a crafted 8x4 gray netpbm:
    bit((r,c)) = 1 iff p(r,c) < p(r,c+1), packed row-major into
    (w-1)*h = 28 bits."""
    from vector_db_core_spark.functions.multimodal import dhash_signature

    raster = bytes(range(32))  # strictly increasing within every row
    sig = dhash_signature(b"P5\n8 4\n255\n" + raster)
    assert sig == (1 << 28) - 1  # all 28 bits set

    flat = bytes([7] * 32)  # constant raster: no strict increase
    assert dhash_signature(b"P5\n8 4\n255\n" + flat) == 0

    # one descent in row 0 only: bit index c for the (c, c+1) pair
    bump = bytes([0, 5, 3, 9, 9, 9, 9, 9] + [1] * 24)
    sig = dhash_signature(b"P5\n8 4\n255\n" + bump)
    # pairs: (0,5)asc (5,3)desc (3,9)asc (9,9)= (9,9)= (9,9)= (9,9)=
    assert sig & ((1 << 7) - 1) == 0b0000101  # bits 0 and 2 set


def test_phash_neardup_finds_injected_duplicates(spark):
    """The canonical-variant construction makes doc and doc+200000
    pixel-identical images: every injected pair must surface with
    Hamming 0, and every reported pair must be band-consistent
    (hamming <= 3 implies at least one intact 7-bit band)."""
    rows = QUERIES["multimodal_phash_neardup"](spark, SF_ORACLE).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for d in range(100):
        assert got.get((d, d + 200000)) == 0, d
    for (a, b), hm in got.items():
        assert 0 <= hm <= 3
        assert a < b


def test_phash_wide_twin_finds_injected_duplicates(spark):
    """The 63-bit scale twin must agree with the 28-bit baseline on
    the injected ground truth: every canonical-variant pair surfaces
    at Hamming 0, pairs are ordered and within the gate, and the
    signature space is genuinely wider (band values exceed the 7-bit
    op's 128-bucket ceiling somewhere in the corpus)."""
    rows = QUERIES["multimodal_phash_neardup_wide"](spark, SF_ORACLE).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for d in range(100):
        assert got.get((d, d + 200000)) == 0, d
    for (a, b), hm in got.items():
        assert 0 <= hm <= 3
        assert a < b


def test_phash_wide_band_space_exceeds_narrow(spark):
    """The whole point of the twin: 16-bit band values must occupy
    far more than the 128 buckets the 7-bit bands collapse into."""
    from vector_db_core_spark.functions.multimodal import append_dhash
    from vector_db_core_spark.functions.text import canonical_text
    from vector_db_core_spark.operators.llm import _t

    docs = _t(spark, SF_ORACLE, "documents").select("doc_id", "text")
    canon = canonical_text("text")
    hexs = F.concat(
        *[F.md5(F.concat(canon, F.lit(f"#w{i}"))) for i in range(4)],
        F.substring(F.md5(F.concat(canon, F.lit("#w4"))), 1, 16),
    )
    payload = F.concat(F.lit(b"P5\n8 9\n255\n"), F.unhex(hexs))
    sigs = append_dhash(
        docs.select("doc_id", payload.alias("payload")), "payload"
    ).select("dhash")
    vals = [r.dhash for r in sigs.collect()]
    assert all(0 <= v < (1 << 63) for v in vals)  # sign-free by design
    band0 = {v & 65535 for v in vals}
    assert len(band0) > 128  # 7-bit bands could never exceed 128


def test_mmr_diversifies_the_pool(spark):
    """MMR invariants: pick 1 is the pure-relevance top-1, picks are
    distinct pool members in rank order, and the selection genuinely
    DIVERSIFIES — the picked set's max pairwise cosine must be lower
    than the plain top-K's (the fixture's near-dup embedding pairs
    crowd the relevance head, which is the op's reason to exist)."""
    import itertools

    from vector_db_core_spark.functions.vectors import cosine_similarity
    from vector_db_core_spark.operators.llm import MMR_K, _t

    rows = sorted(
        QUERIES["sim_mmr_diversified_topk"](spark, SF_ORACLE).collect(),
        key=lambda r: r.pick_rank,
    )
    assert [r.pick_rank for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.vec_id for r in rows}) == MMR_K
    assert rows[0].relevance == max(r.relevance for r in rows)

    e = _t(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    top = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", cosine_similarity("embedding", "qv").alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_K)
        .collect()
    )
    vecs = {r.vec_id: r.embedding for r in e.collect()}

    def max_pair_sim(ids):
        def cos(x, y):
            dot = sum(a * b for a, b in zip(x, y))
            nx = sum(a * a for a in x) ** 0.5
            ny = sum(b * b for b in y) ** 0.5
            return dot / (nx * ny)

        return max(cos(vecs[a], vecs[b]) for a, b in itertools.combinations(ids, 2))

    plain = max_pair_sim([r.vec_id for r in top])
    mmr = max_pair_sim([r.vec_id for r in rows])
    assert mmr < plain, (mmr, plain)


def test_aspect_bucketing_partitions_corpus(spark):
    """Every image lands in exactly one bucket (counts sum to |docs|),
    every declared bucket is populated by the doc_id size arithmetic,
    and the signature comes from the REAL Arrow decode path."""
    from vector_db_core_spark.operators.llm import ASPECT_BUCKETS, _t

    n_docs = _t(spark, SF_ORACLE, "documents").count()
    df = QUERIES["multimodal_aspect_bucketing"](spark, SF_ORACLE)
    rows = df.collect()
    assert {r.bucket for r in rows} == set(ASPECT_BUCKETS)
    assert sum(r.n_images for r in rows) == n_docs
    for r in rows:
        assert r.total_pixels >= 16 * r.n_images  # min raster is 4x4
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_source_vocab_overlap_structure(spark):
    """Exactly C(|sources|,2) pairs, shared counts bounded by k, and
    the Jaccard over the TRUE union |A| + |B| - shared re-derived
    from the actual per-source vocabulary sizes (r10 advice: the old
    2k - shared closure silently understated sources with fewer than
    k distinct tokens); the fixture sources draw from one generator
    vocabulary, so overlap must be substantial (a structural read,
    not a tuned threshold)."""
    from vector_db_core_spark.functions.text import tokens
    from vector_db_core_spark.operators.llm import VOCAB_OVERLAP_TOP_K, _t

    sizes = {
        r.source: r.kv
        for r in (
            _t(spark, SF_ORACLE, "documents")
            .select("source", F.explode(tokens("text")).alias("token"))
            .groupBy("source")
            .agg(
                F.least(
                    F.countDistinct("token"), F.lit(VOCAB_OVERLAP_TOP_K)
                ).alias("kv")
            )
            .collect()
        )
    }
    rows = QUERIES["text_source_vocab_overlap"](spark, SF_ORACLE).collect()
    srcs = {r.src_a for r in rows} | {r.src_b for r in rows}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_shared <= VOCAB_OVERLAP_TOP_K
        union = sizes[r.src_a] + sizes[r.src_b] - r.n_shared
        assert abs(r.jaccard - r.n_shared / union) < 1e-6
    assert sum(r.n_shared for r in rows) / len(rows) > 0.3 * VOCAB_OVERLAP_TOP_K
