"""Declarative post-processing compiler (reference post_processing
semantics, src/main.py:166-222) and multimodal actor-stage plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from web_scraping_script_ray.pipelines.postprocess import apply_ops, export
from web_scraping_script_ray.stages.multimodal import (
    ImageDecoder,
    MediaMaterializer,
    synthesize_payload,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _ds():
    import ray.data

    t = pa.Table.from_arrays(
        [
            pa.array([3, 1, 2, 4, 5], pa.int64()),
            pa.array(["x", "y", "x", "z", "x"], pa.string()),
            pa.array([10.0, 20.0, 30.0, 40.0, 50.0], pa.float64()),
        ],
        names=["rid", "cat", "val"],
    )
    return ray.data.from_arrow(t)


def test_filter_ops():
    out = apply_ops(_ds(), [{"type": "filter", "column": "cat", "operation": "equals", "value": "x"}]).to_pandas()
    assert sorted(out.rid) == [2, 3, 5]
    out = apply_ops(_ds(), [{"type": "filter", "column": "val", "operation": "greater_than", "value": 25}]).to_pandas()
    assert sorted(out.rid) == [2, 4, 5]
    out = apply_ops(_ds(), [{"type": "filter", "column": "cat", "operation": "contains", "value": "y"}]).to_pandas()
    assert sorted(out.rid) == [1]


def test_filter_missing_column_is_noop():
    # reference behavior: warn + no-op (src/main.py:173-175)
    out = apply_ops(_ds(), [{"type": "filter", "column": "nope", "operation": "equals", "value": 1}]).to_pandas()
    assert len(out) == 5


def test_sort_and_limit():
    out = apply_ops(
        _ds(), [{"type": "sort", "column": "val", "ascending": False}, {"type": "limit", "n": 2}]
    ).to_pandas()
    assert out.val.tolist() == [50.0, 40.0]


def test_dedup_first_wins_by_order_col():
    out = apply_ops(
        _ds(),
        [{"type": "deduplicate", "columns": ["cat"]}],
        order_col="rid",
    ).to_pandas()
    # first occurrence per cat in rid order: x→2, y→1, z→4
    assert sorted(out.rid) == [1, 2, 4]


def test_export_roundtrip(tmp_path):
    out = str(tmp_path / "exp")
    export(_ds(), out, "parquet")
    import ray.data

    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 5


def test_synthesize_payload_deterministic():
    a = synthesize_payload("http://cdn.example/x.jpg")
    assert a == synthesize_payload("http://cdn.example/x.jpg")
    assert a != synthesize_payload("http://cdn.example/y.jpg")
    assert 64 <= len(a) <= 4096


def test_media_pipeline_stages():
    import ray.data

    t = pa.Table.from_arrays(
        [
            pa.array(["d1", "d2"], pa.string()),
            pa.array(
                ["http://cdn.example/a.jpg", "http://cdn.example/b.mp3"], pa.string()
            ),
        ],
        names=["doc_id", "media_ref"],
    )
    media = (
        ray.data.from_arrow(t)
        .map_batches(MediaMaterializer, batch_format="pyarrow", concurrency=(1, 2))
        .materialize()
    )
    df = media.to_pandas()
    assert df.media_type.tolist() == ["images", "audio"]
    assert all(len(p) >= 64 for p in df.payload)
    feats = media.map_batches(
        ImageDecoder,
        fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert (feats.nbytes > 0).all()
    assert (feats.width >= 16).all()
    # deterministic: same payload → same hash/dims
    again = media.map_batches(
        ImageDecoder,
        fn_constructor_kwargs=dict(fake=True),
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    assert feats.sort_values("doc_id").content_hash.tolist() == again.sort_values("doc_id").content_hash.tolist()


def test_real_decoder_non_png_needs_full_codec():
    """Without PIL, the vendored PNG codec covers PNG payloads only —
    a non-PNG payload on the real path must raise the actionable
    NotImplementedError per payload (the seam contract)."""
    from web_scraping_script_ray.stages.multimodal import _HAVE_PIL

    if _HAVE_PIL:
        pytest.skip("PIL present — it decodes non-PNG payloads too")
    dec = ImageDecoder(fake=False)  # always constructible now
    batch = pa.table(
        {
            "doc_id": ["d0"],
            "media_ref": ["m0"],
            "media_type": ["images"],
            "payload": [b"\xff\xd8\xff JPEG-ish bytes, not a PNG"],
        }
    )
    with pytest.raises(NotImplementedError):
        dec(batch)


def test_filter_accepts_reference_condition_key():
    """The reference spells the filter op key 'condition'
    (src/main.py:174); a reference-format spec must not silently fall
    back to equals."""
    out = apply_ops(_ds(), [{"type": "filter", "column": "cat", "condition": "contains", "value": "x"}]).to_pandas()
    assert sorted(out.rid.tolist()) == [2, 3, 5]


def test_sort_missing_column_is_noop():
    """Reference warns and skips a missing sort column (src/main.py:188-195)."""
    out = apply_ops(_ds(), [{"type": "sort", "column": "nope"}]).to_pandas()
    assert len(out) == 5


def test_flatten_one_level():
    """M24 (reference src/storage.py:72-81): struct columns flatten one
    level to parent.child; deeper nesting stays nested."""
    from web_scraping_script_ray.pipelines.postprocess import flatten_one_level

    t = pa.Table.from_pylist(
        [
            {"id": 1, "meta": {"a": 1, "deep": {"x": 9}}},
            {"id": 2, "meta": {"a": 2, "deep": {"x": 8}}},
        ]
    )
    out = flatten_one_level(t)
    assert "meta.a" in out.column_names and "id" in out.column_names
    assert pa.types.is_struct(out.schema.field("meta.deep").type)  # one level only


def test_media_materializer_max_file_size():
    """M18 (reference src/media_downloader.py:156-179): oversized media
    rows are rejected (dropped), like the reference's pre/mid-download
    size guard."""
    t = pa.Table.from_arrays(
        [
            pa.array(["1", "2", "3"], pa.string()),
            pa.array(
                ["http://c/x1.jpg", "http://c/x2.jpg", "http://c/x3.jpg"], pa.string()
            ),
        ],
        names=["doc_id", "media_ref"],
    )
    free = MediaMaterializer()(t)
    sizes = [len(p) for p in free.column("payload").to_pylist()]
    cap = sorted(sizes)[1]  # cap chosen to reject exactly the largest
    capped = MediaMaterializer(max_file_size=cap)(t)
    assert capped.num_rows == 2
    assert all(len(p) <= cap for p in capped.column("payload").to_pylist())


def test_fetch_max_nbytes_guard(t1_web):
    """M18 on the crawl fetch path: documents over max_nbytes come back
    ok=False with empty spans but a recorded size."""
    import json
    import os

    import pyarrow.parquet as pq

    from web_scraping_script_ray.stages.fetch import fetch_rows_in_bucket
    from web_scraping_script_ray.schemas import FRONTIER_SCHEMA
    from web_scraping_script_ray.urlnorm import host_of, url_hash64

    n_buckets = json.load(open(os.path.join(t1_web, "params.json")))["n_buckets"]
    bucket0 = pq.read_table(os.path.join(t1_web, "web", "bucket=0"))
    urls = bucket0.column("doc_id").to_pylist()[:50]
    g = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array([host_of(u) for u in urls], pa.string()),
            pa.array([url_hash64(u) for u in urls], pa.uint64()),
            pa.array(np.zeros(len(urls), np.int32), pa.int32()),
            pa.array(np.arange(len(urls)), pa.int64()),
            pa.array(np.zeros(len(urls), np.int64), pa.int64()),
            pa.array([""] * len(urls), pa.string()),
            pa.array(np.ones(len(urls), np.int64), pa.int64()),
        ],
        schema=FRONTIER_SCHEMA,
    )
    free = fetch_rows_in_bucket(t1_web, 0, g)
    nbytes = free.column("nbytes").to_numpy(zero_copy_only=False)
    cap = int(np.sort(nbytes)[len(nbytes) // 2])  # half the docs oversized
    capped = fetch_rows_in_bucket(t1_web, 0, g, max_nbytes=cap)
    ok = capped.column("ok").to_numpy(zero_copy_only=False)
    nb = capped.column("nbytes").to_numpy(zero_copy_only=False)
    spans_len = pa.compute.list_value_length(capped.column("spans")).to_numpy(
        zero_copy_only=False
    )
    over = nb > cap
    assert over.any() and (~ok[over]).all()          # oversized → not ok
    assert (spans_len[over] == 0).all()              # content rejected
    assert (nb[over] > 0).all()                      # size still recorded
    # under-cap rows identical to the unguarded fetch
    under = ~over
    assert (ok[under] == free.column("ok").to_numpy(zero_copy_only=False)[under]).all()


def test_audio_decoder_and_frame_sampler_plumbing():
    """Audio decode + video frame-sample actor stages: deterministic fake
    codecs behind the real Ray plumbing (schema, batch expansion)."""
    import ray.data

    from web_scraping_script_ray.stages.multimodal import (
        AUDIO_FEATURES_SCHEMA,
        VIDEO_FRAMES_SCHEMA,
        AudioDecoder,
        MediaMaterializer,
        VideoFrameSampler,
    )

    t = pa.Table.from_arrays(
        [
            pa.array(["1", "2"], pa.string()),
            pa.array(["http://c/a.mp3", "http://c/b.mp4"], pa.string()),
        ],
        names=["doc_id", "media_ref"],
    )
    media = MediaMaterializer()(t)
    audio = AudioDecoder()(media)
    assert audio.schema.equals(AUDIO_FEATURES_SCHEMA)
    assert (np.array(audio.column("duration_ms").to_pylist()) > 0).all()
    # deterministic across calls
    audio2 = AudioDecoder()(media)
    assert audio.equals(audio2)

    frames = VideoFrameSampler(n_frames=3)(media)
    assert frames.schema.equals(VIDEO_FRAMES_SCHEMA)
    assert frames.num_rows == 2 * 3
    assert frames.column("frame_idx").to_pylist() == [0, 1, 2, 0, 1, 2]
    ts = frames.column("ts_ms").to_pylist()
    assert ts[0] == 0 and ts[1] < ts[2]
    # as a Dataset actor-pool stage
    ds = ray.data.from_arrow(t).map_batches(
        MediaMaterializer, batch_format="pyarrow", batch_size=64, concurrency=(1, 2)
    ).map_batches(
        VideoFrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 2)
    )
    assert ds.count() == 2 * 4  # default n_frames=4

    with pytest.raises(NotImplementedError):
        AudioDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(fake=False)


def test_export_csv_handles_deep_nesting(tmp_path):
    """CSV export must not crash on 2+-level nesting: one-level flatten
    then str() coercion of the remainder (reference CSV semantics)."""
    import ray.data

    t = pa.Table.from_pylist(
        [
            {"id": 1, "meta": {"a": 1, "deep": {"x": 9}}},
            {"id": 2, "meta": {"a": 2, "deep": {"x": 8}}},
        ]
    )
    out = tmp_path / "csvdir"
    export(ray.data.from_arrow(t), str(out), fmt="csv")
    import glob

    files = glob.glob(str(out / "*"))
    assert files
    body = "".join(open(f).read() for f in files)
    assert "meta.a" in body and "'x': 9" in body  # deep struct stringified


def test_export_shards_deterministic_resume(tmp_path, ray_session):
    """Shard membership is content-stable across runs/partitionings; the
    manifest-last rename makes aborted attempts rebuildable and resume a
    no-op; round-trip read returns exactly the input rows."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import export_shards

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(200), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(200)]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    out = str(tmp_path / "exp")
    man = export_shards(ds, out, n_shards=8)
    assert man["rows"] == 200 and len(man["shard_rows"]) <= 8
    back = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == list(range(200))
    # shard column materialized by hive partitioning and content-stable
    expect = (back["doc_id"].to_numpy() * 2654435761) % 8
    assert (back["shard"].to_numpy().astype(np.int64) == expect).all()

    # resume: manifest returned without rewriting (mtime unchanged)
    mt = os.path.getmtime(os.path.join(out, "_manifest.json"))
    man2 = export_shards(ds, out, n_shards=8)
    assert man2 == man and os.path.getmtime(os.path.join(out, "_manifest.json")) == mt

    # different input partitioning -> identical shard membership
    out2 = str(tmp_path / "exp2")
    export_shards(ray.data.from_arrow(t).repartition(13), out2, n_shards=8)
    a = ray.data.read_parquet(out).to_pandas().sort_values("doc_id")
    b = ray.data.read_parquet(out2).to_pandas().sort_values("doc_id")
    assert a["shard"].tolist() == b["shard"].tolist()

    # aborted attempt (manifest missing) is rebuilt
    os.remove(os.path.join(out, "_manifest.json"))
    man3 = export_shards(ds, out, n_shards=8)
    assert man3["rows"] == 200


def test_export_shards_param_mismatch_raises(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import export_shards

    t = pa.table({"doc_id": pa.array(np.arange(20), pa.int64())})
    out = str(tmp_path / "exp")
    export_shards(ray.data.from_arrow(t), out, n_shards=4)
    with pytest.raises(ValueError, match="n_shards"):
        export_shards(ray.data.from_arrow(t), out, n_shards=8)
    # resume=False rebuilds under the new parameters
    man = export_shards(ray.data.from_arrow(t), out, n_shards=8, resume=False)
    assert man["n_shards"] == 8 and man["rows"] == 20


def test_image_resizer_stage(ray_session):
    """decode → resize chain: aspect-preserving geometry, deterministic
    fake payload sized by output pixels, no_upscale variant, codec guard."""
    import numpy as np
    import pytest
    import ray.data

    from web_scraping_script_ray.stages.multimodal import ImageResizer

    t = pa.Table.from_arrays(
        [
            pa.array(["d1", "d2", "d3"], pa.string()),
            pa.array(["a.jpg", "b.jpg", "c.jpg"], pa.string()),
            pa.array(["h1", "h2", "h3"], pa.string()),
            pa.array([448, 100, 10], pa.int32()),
            pa.array([224, 400, 5], pa.int32()),
        ],
        names=["doc_id", "media_ref", "content_hash", "width", "height"],
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            ImageResizer,
            fn_constructor_kwargs=dict(target_w=224, target_h=224),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["out_width"].tolist() == [224, 56, 224]
    assert out["out_height"].tolist() == [112, 224, 112]
    # fits in the box, aspect preserved within rounding
    assert (out["out_width"] <= 224).all() and (out["out_height"] <= 224).all()
    # payload length proportional to output pixel count
    assert [len(p) for p in out["resized"]] == [
        max(16, (w * h) // 64)
        for w, h in zip(out["out_width"], out["out_height"])
    ]
    # determinism keyed by (content_hash, dims)
    r = ImageResizer()
    assert r._resize_fake("h1", 224, 112) == out.iloc[0]["resized"]
    # no_upscale caps the small image at source dims
    nu = ImageResizer(no_upscale=True)
    ow, oh = nu.fit_dims(np.array([10]), np.array([5]))
    assert (ow.tolist(), oh.tolist()) == ([10], [5])
    # fake=False is always constructible now (png_mini backstop); the
    # real path is exercised by test_real_codec_paths_always_run
    ImageResizer(fake=False)


def test_export_shards_seeded_shuffle_byte_deterministic(tmp_path, ray_session):
    """shuffle_seed decorrelates within-shard order AND makes the whole
    export byte-order-deterministic: two builds of the same data at
    different parallelism produce identical per-shard row sequences; a
    different seed produces a different (but still deterministic)
    order; membership matches the unshuffled export."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import export_shards

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(300), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(300)]),
        }
    )

    def shard_orders(out: str) -> dict[str, list[int]]:
        orders = {}
        for d in sorted(os.listdir(out)):
            if not d.startswith("shard="):
                continue
            files = sorted(
                f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
            )
            rows = []
            for f in files:
                rows.extend(
                    pq.read_table(os.path.join(out, d, f)).column("doc_id").to_pylist()
                )
            orders[d] = rows
        return orders

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    man_a = export_shards(
        ray.data.from_arrow(t).repartition(5), out_a, n_shards=4, shuffle_seed=11
    )
    man_b = export_shards(
        ray.data.from_arrow(t).repartition(13), out_b, n_shards=4, shuffle_seed=11
    )
    a, b = shard_orders(out_a), shard_orders(out_b)
    assert a == b  # parallelism-independent byte order
    assert man_a["shuffle_seed"] == 11 and man_a["shard_rows"] == man_b["shard_rows"]
    # one file per shard after the finalize pass
    for d in a:
        assert len(os.listdir(os.path.join(out_a, d))) == 1
    # a shard is genuinely shuffled (not id-sorted) but complete
    flat = sorted(x for rows in a.values() for x in rows)
    assert flat == list(range(300))
    assert any(rows != sorted(rows) for rows in a.values())

    # different seed -> different within-shard order, same membership
    out_c = str(tmp_path / "c")
    export_shards(ray.data.from_arrow(t), out_c, n_shards=4, shuffle_seed=12)
    c = shard_orders(out_c)
    assert {d: sorted(r) for d, r in a.items()} == {d: sorted(r) for d, r in c.items()}
    assert a != c

    # resume honors the seed; mismatch raises
    import pytest as _pytest

    man_r = export_shards(ray.data.from_arrow(t), out_a, n_shards=4, shuffle_seed=11)
    assert man_r == man_a
    with _pytest.raises(ValueError, match="shuffle_seed"):
        export_shards(ray.data.from_arrow(t), out_a, n_shards=4, shuffle_seed=99)


def test_apply_ops_engine_extensions(ray_session):
    """sample / content_dedup / quantile_band — the engine-native ops the
    reference YAML surface gains beyond filter/sort/deduplicate/limit."""
    import pyarrow as pa
    import ray.data

    from web_scraping_script_ray.pipelines.postprocess import apply_ops

    n = 200
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": [f"t{i % 50}" for i in range(n)],  # 50 distinct texts
                "n_chars": [i % 100 for i in range(n)],
                "seq": list(range(n)),
            }
        )
    )
    # sample: deterministic, repeatable, different under another seed
    s1 = apply_ops(ds, [{"type": "sample", "column": "doc_id", "fraction": 0.3, "seed": 1}]).to_pandas()
    s2 = apply_ops(ds, [{"type": "sample", "column": "doc_id", "fraction": 0.3, "seed": 1}]).to_pandas()
    s3 = apply_ops(ds, [{"type": "sample", "column": "doc_id", "fraction": 0.3, "seed": 2}]).to_pandas()
    assert s1.doc_id.tolist() == s2.doc_id.tolist()
    assert s1.doc_id.tolist() != s3.doc_id.tolist()
    assert 0.15 < len(s1) / n < 0.45

    # content_dedup: first-wins on md5(text) → 50 rows, smallest seq wins
    d = apply_ops(ds, [{"type": "content_dedup", "column": "text"}], order_col="seq").to_pandas()
    assert len(d) == 50
    assert sorted(d.seq.tolist()) == list(range(50))

    # quantile_band: n_chars uniform over 0..99 → [P10,P90] keeps 10..90
    b = apply_ops(ds, [{"type": "quantile_band", "column": "n_chars", "lo": 0.10, "hi": 0.90}]).to_pandas()
    assert b.n_chars.min() >= 9 and b.n_chars.max() <= 91
    assert len(b) > 0.7 * n


def test_apply_ops_text_pipeline_extensions(ray_session):
    """The session-4 YAML ops: quality_filter, lang_filter, pii_redact,
    near_dedup, token_truncate — wired through apply_ops end to end."""
    import pyarrow as pa
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog and runs on",  # en
        "el perro grande come pan y agua en la casa de madera",      # es
        "the quick brown fox jumps over the lazy dog and runs on",  # dup of 0
        "contact me at alice@example.com or 192.168.0.1 now the and",
        "xq zz vv kk",                                               # low quality
    ]
    ds = ray.data.from_arrow(
        pa.table({"seq": list(range(5)), "text": texts})
    )

    # pii_redact scrubs in place, keeps schema
    out = apply_ops(ds, [{"type": "pii_redact", "column": "text"}]).to_pandas()
    assert sorted(out.columns) == ["seq", "text"]
    assert "alice@example.com" not in out.loc[out.seq == 3, "text"].iloc[0]
    assert "192.168.0.1" not in out.loc[out.seq == 3, "text"].iloc[0]

    # near_dedup drops the later duplicate, keeps first-wins order
    out = apply_ops(
        ds, [{"type": "near_dedup", "column": "text"}], order_col="seq"
    ).to_pandas()
    assert 0 in set(out.seq) and 2 not in set(out.seq)

    # token_truncate caps tokens (lowercased flat_tokens rule)
    out = apply_ops(
        ds, [{"type": "token_truncate", "column": "text", "max_tokens": 3}]
    ).to_pandas()
    assert out.loc[out.seq == 0, "text"].iloc[0] == "the quick brown"

    # quality_filter drops the consonant soup, keeps real sentences
    out = apply_ops(
        ds, [{"type": "quality_filter", "column": "text", "min": 0.3}]
    ).to_pandas()
    assert 4 not in set(out.seq) and 0 in set(out.seq)
    assert sorted(out.columns) == ["seq", "text"]

    # lang_filter keeps only the English rows
    out = apply_ops(
        ds, [{"type": "lang_filter", "column": "text", "langs": ["en"]}]
    ).to_pandas()
    assert set(out.seq) <= {0, 2, 3}
    assert 1 not in set(out.seq)
    assert sorted(out.columns) == ["seq", "text"]


def test_real_codec_paths_always_run():
    """fake=False runs the REAL decode/resize kernels in EVERY
    environment: PIL when importable, else the vendored pure-stdlib PNG
    codec — this test never skips.  Geometry (source dims, fit box,
    re-decoded output size) is asserted either way."""
    import numpy as np

    from web_scraping_script_ray.stages.multimodal import (
        _HAVE_PIL,
        ImageDecoder,
        ImageResizer,
    )
    from web_scraping_script_ray.stages.png_mini import decode_png

    if _HAVE_PIL:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (64, 32), (255, 0, 0)).save(buf, format="PNG")
        payload = buf.getvalue()
    else:
        from web_scraping_script_ray.stages.png_mini import encode_png

        red = np.zeros((32, 64, 3), np.uint8)
        red[..., 0] = 255
        payload = encode_png(red)
    batch = pa.table(
        {
            "doc_id": ["d0"],
            "media_ref": ["m0"],
            "media_type": ["images"],
            "payload": [payload],
        }
    )
    dec = ImageDecoder(fake=False)
    out = dec(batch)
    assert out.column("width")[0].as_py() == 64
    assert out.column("height")[0].as_py() == 32
    feats = out.column("feat")[0].as_py()
    assert len(feats) == 8 and all(0.0 <= f <= 1.0 for f in feats)

    rs = ImageResizer(target_w=16, target_h=16, fake=False)
    rbatch = pa.table(
        {
            "doc_id": ["d0"],
            "media_ref": ["m0"],
            "content_hash": ["h"],
            "width": pa.array([64], pa.int32()),
            "height": pa.array([32], pa.int32()),
            "payload": [payload],
        }
    )
    rout = rs(rbatch)
    assert rout.column("out_width")[0].as_py() == 16
    assert rout.column("out_height")[0].as_py() == 8
    # re-decode with the always-available codec: geometry + pure red
    arr = decode_png(rout.column("resized")[0].as_py())
    assert arr.shape == (8, 16, 3)
    assert (arr[..., 0] == 255).all() and (arr[..., 1:] == 0).all()


def test_png_mini_roundtrip_all_color_types():
    """encode→decode is pixel-exact for gray / RGB / RGBA uint8."""
    import numpy as np

    from web_scraping_script_ray.stages.png_mini import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in ((13, 7), (9, 16, 3), (5, 11, 4)):
        arr = rng.integers(0, 256, size=shape).astype(np.uint8)
        out = decode_png(encode_png(arr))
        assert out.shape == arr.shape and (out == arr).all()
    with pytest.raises(NotImplementedError):
        decode_png(b"GIF89a not a png")


def test_png_mini_decodes_every_scanline_filter():
    """Cross-check against an INDEPENDENT forward-filter implementation
    of the PNG spec written in this test: filter a known RGB image with
    each of the five scanline filters (one per row), assemble the IDAT
    by hand, and require decode_png to reconstruct the original pixels
    — this is what lets png_mini read PNGs from other encoders (PIL
    defaults to Paeth-heavy adaptive filtering)."""
    import struct
    import zlib

    import numpy as np

    from web_scraping_script_ray.stages.png_mini import decode_png

    rng = np.random.default_rng(9)
    h, w, bpp = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w, bpp)).astype(np.int64)
    flat = img.reshape(h, w * bpp)
    stride = w * bpp

    def fwd(y, f):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int64)
        out = np.empty(stride, np.int64)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            out[x] = (cur[x] - pred) & 0xFF
        return out

    raw = b"".join(
        bytes([f]) + fwd(y, f).astype(np.uint8).tobytes()
        for y, f in enumerate([0, 1, 2, 3, 4])
    )

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert (out == img.astype(np.uint8)).all()


def test_png_mini_resize_nearest_geometry():
    import numpy as np

    from web_scraping_script_ray.stages.png_mini import resize_nearest

    arr = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    same = resize_nearest(arr, 4, 6)
    assert (same == arr).all()  # identity at same size
    small = resize_nearest(arr, 2, 3)
    assert small.shape == (3, 2, 3)
    big = resize_nearest(arr, 8, 12)
    assert big.shape == (12, 8, 3)
