"""End-to-end runner (param file -> trec output), sharded two-phase
evaluation, inspector, readers, multimodal plumbing."""

import os

import numpy as np
import pytest

from searchengine_ray.config import ModelParams


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_runner_param_file_end_to_end(built_index, tmp_path):
    from searchengine_ray.runner import main as runner_main  # noqa: F401  (import check)
    from searchengine_ray.runner import run

    qfile = tmp_path / "q.txt"
    qfile.write_text("1:mutex lock\n2:#near/1( unit test )\n3:nosuchterm\n")
    out = tmp_path / "run.trec"
    params = {
        "indexPath": built_index,
        "queryFilePath": str(qfile),
        "trecEvalOutputPath": str(out),
        "retrievalAlgorithm": "BM25",
        "BM25:k_1": "1.2",
        "BM25:b": "0.75",
        "BM25:k_3": "0",
        "trecEvalOutputLength": "10",
    }
    run(params)
    lines = out.read_text().strip().splitlines()
    assert any(l.startswith("1 Q0 ") for l in lines)
    assert any(l.startswith("3 Q0 dummy 1 ") for l in lines)  # empty-result dummy
    # format: qid Q0 extid rank score runid with %.18f score
    parts = lines[0].split()
    assert parts[1] == "Q0" and parts[5] == "reference"
    assert len(parts[4].split(".")[1]) == 18


def test_runner_diversity_mode(built_index, tmp_path):
    from searchengine_ray.runner import run

    qfile = tmp_path / "q.txt"
    qfile.write_text("1:mutex lock\n")
    intents = tmp_path / "intents.txt"
    intents.write_text("1.1:mutex\n1.2:lock\n")
    out = tmp_path / "div.trec"
    params = {
        "indexPath": built_index,
        "queryFilePath": str(qfile),
        "trecEvalOutputPath": str(out),
        "retrievalAlgorithm": "BM25",
        "diversity": "true",
        "diversity:algorithm": "xquad",
        "diversity:lambda": "0.5",
        "diversity:intentsFile": str(intents),
        "diversity:maxInputRankingsLength": "50",
        "diversity:maxResultRankingLength": "10",
    }
    run(params)
    assert len(out.read_text().strip().splitlines()) > 0


def test_sharded_two_phase_matches_full_index(built_index):
    """The at-scale path: derived-list stats all-reduced across doc shards
    must reproduce the single-index evaluation exactly (BM25 scores a
    derived #near list with GLOBAL df)."""
    from searchengine_ray.engine import SearchEngine, evaluate_sharded

    full = SearchEngine(built_index, ModelParams(model="bm25", top_k=20))
    for q in ("#near/1( unit test )", "mutex lock", "#sum( #syn( error fault ) check )"):
        want = full.search("q", q).to_pandas()
        got = evaluate_sharded(
            built_index, "q", q, parts=[0, 1],
            params=ModelParams(model="bm25", top_k=20),
        ).to_pandas()
        assert list(got["external_id"]) == list(want["external_id"]), q
        np.testing.assert_allclose(
            got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-12
        )


def test_inspect_tool(built_index, capsys):
    from searchengine_ray import inspect_tool

    inspect_tool.main([built_index, "-list-stats"])
    out = capsys.readouterr().out
    assert "numDocs:" in out and "field 'body'" in out
    inspect_tool.main([built_index, "-list-postings", "mutex", "body", "3"])
    out = capsys.readouterr().out
    assert "mutex.body: df=" in out
    inspect_tool.main([built_index, "-list-metadata"])
    assert "fingerprint" in capsys.readouterr().out


def test_inspect_tool_docid_fields_termvector_flags(built_index, capsys):
    """Reference-parity flags (`InspectIndex.java:28-55`): -list-docids,
    -list-edocid, -list-idocid, -list-fields, -list-termvector(-field)."""
    import numpy as np

    from searchengine_ray import inspect_tool
    from searchengine_ray.indexio import InvertedIndex

    idx = InvertedIndex(built_index)
    first = int(idx.all_doc_ids()[0])
    ext = str(idx.external_ids(np.array([first]))[0])

    inspect_tool.main([built_index, "-list-docids"])
    out = capsys.readouterr().out
    assert f"Internal --> external docid: {first} --> {ext}" in out

    inspect_tool.main([built_index, "-list-edocid", str(first)])
    out = capsys.readouterr().out
    assert f"{first} --> {ext}" in out

    inspect_tool.main([built_index, "-list-idocid", ext])
    out = capsys.readouterr().out
    assert f"{ext} --> {first}" in out
    inspect_tool.main([built_index, "-list-idocid", "no_such_ext"])
    assert "bad external document id" in capsys.readouterr().out

    inspect_tool.main([built_index, "-list-fields"])
    out = capsys.readouterr().out
    assert "Number of fields:" in out and "body" in out and "externalId" in out

    inspect_tool.main([built_index, "-list-termvector", str(first)])
    out = capsys.readouterr().out
    assert f"TermVector:  docid {first}" in out
    assert "Field: body" in out and "Vocabulary size:" in out

    inspect_tool.main([built_index, "-list-termvector-field", str(first), "body"])
    out = capsys.readouterr().out
    assert f"docid {first}, field body" in out and "Stored length:" in out

    inspect_tool.main([built_index, "-list-postings-sample", "mutex", "body"])
    out = capsys.readouterr().out
    assert "mutex.body: df=" in out and out.count("doc ") <= 5

    inspect_tool.main([built_index, "-list-terms", "body"])
    out = capsys.readouterr().out
    assert "body:" in out and "df=" in out
    # tf/positions agree with the postings probe for one known term
    inspect_tool.main([built_index, "-list-termvector", "-1"])
    assert "bad document id" in capsys.readouterr().out


def test_hw1_trec_output_style():
    """HW1 writer variant (`Homeworks/HW1/QryEval/QryEval.java:231`):
    tab-separated, %f, rank-from-0, dummy keeps rank 1."""
    import pyarrow as pa

    from searchengine_ray.engine import format_trec

    t = pa.table(
        {
            "qid": ["1", "1"],
            "doc_id": [5, 7],
            "external_id": ["e5", "e7"],
            "score": [2.5, 1.25],
            "rank": [1, 2],
        }
    )
    hw6 = format_trec(t)
    assert hw6.splitlines()[0] == "1 Q0 e5 1 2.500000000000000000 reference"
    hw1 = format_trec(t, style="hw1")
    assert hw1.splitlines() == [
        "1\tQ0\te5\t0\t2.500000\treference",
        "1\tQ0\te7\t1\t1.250000\treference",
    ]
    empty = pa.table({c: t.column(c).slice(0, 0) for c in t.column_names})
    assert format_trec(empty, style="hw1") == "\n"


def test_trec_and_qrels_readers(tmp_path):
    from searchengine_ray.runner import read_qrels, read_trec_rankings

    f = tmp_path / "r.trec"
    f.write_text("1 Q0 docA 1 2.5 run\n1 Q0 docB 2 1.5 run\n2 Q0 docC 1 9.0 run\n")
    r = read_trec_rankings(str(f))
    assert r["1"] == [("docA", 2.5), ("docB", 1.5)] and len(r["2"]) == 1
    g = tmp_path / "qrels.txt"
    g.write_text("1 0 docA 2\n1 0 docB 0\n")
    q = read_qrels(str(g))
    assert q["1"] == {"docA": 2, "docB": 0}


def test_multimodal_plumbing():
    import ray.data

    from searchengine_ray.multimodal import (
        AudioFeatures,
        VideoFrameSample,
        image_embedding_pipeline,
        image_pipeline,
        synth_media_table,
    )

    media = ray.data.from_arrow(synth_media_table(30))
    img = image_pipeline(media, concurrency=2).to_pandas()
    assert len(img) == 10  # 30 rows, kind cycles image/audio/video
    assert set(img.columns) == {"media_id", "sum_r", "sum_g", "sum_b", "n_pix"}
    assert (img["sum_r"] <= 255 * img["n_pix"]).all()

    emb = image_embedding_pipeline(media, concurrency=2).to_pandas()
    assert set(emb.columns) >= {"media_id", "mean_r", "embedding"}
    assert len(emb["embedding"].iloc[0]) == 64

    audio = (
        media.filter(lambda r: r["kind"] == "audio")
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
    )
    assert (audio["energy"] > 0).all()
    assert (audio["n_samples"] > 0).all()

    frames = (
        media.filter(lambda r: r["kind"] == "video")
        .map_batches(VideoFrameSample, batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
    )
    assert len(frames) == 10 * 3  # n_frames per video

    # determinism: the fake backend is payload-seeded
    emb2 = image_embedding_pipeline(
        ray.data.from_arrow(synth_media_table(30)), 2
    ).to_pandas()
    assert np.allclose(
        np.vstack(emb["embedding"].map(np.asarray)),
        np.vstack(emb2["embedding"].map(np.asarray)),
    )


def test_byte_backend_matches_bruteforce():
    """ByteDecodeBackend decode + integer feature stages equal a direct
    Python brute-force over the payload bytes (the same arithmetic the SQL
    oracles re-derive with ascii(substr(...)))."""
    import pyarrow as pa

    from searchengine_ray.multimodal import (
        AUDIO_SAMPLES_PER_MS,
        VIDEO_FRAME_STRIDE,
        AudioFeatures,
        ByteDecodeBackend,
        ImageFeatures,
        VideoFrameSample,
    )

    payloads = [b"hello world, bytes!", b"0123456789abcdef" * 3, b"Zq"]
    w, h, dur = 5, 4, 7
    batch = pa.table(
        {
            "media_id": pa.array([0, 1, 2], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_width": pa.array([w] * 3, type=pa.int32()),
            "meta_height": pa.array([h] * 3, type=pa.int32()),
            "meta_duration_ms": pa.array([dur] * 3, type=pa.int32()),
        }
    )
    be = ByteDecodeBackend()
    img = ImageFeatures(be)(batch).to_pandas()
    aud = AudioFeatures(be)(batch).to_pandas()
    vid = VideoFrameSample(be, n_frames=2)(batch).to_pandas()

    for r, payload in enumerate(payloads):
        L = len(payload)
        # image: pixel p = payload[p % L], channel = p % 3
        px = [payload[p % L] for p in range(3 * w * h)]
        for c, col in enumerate(["sum_r", "sum_g", "sum_b"]):
            assert img[col].iloc[r] == sum(px[c::3])
        assert img["n_pix"].iloc[r] == w * h
        # audio: pcm i = payload[i % L] - 128
        n = dur * AUDIO_SAMPLES_PER_MS
        pcm = [payload[i % L] - 128 for i in range(n)]
        assert aud["energy"].iloc[r] == sum(v * v for v in pcm)
        total = sum(pcm)
        above = [v * n >= total for v in pcm]
        assert aud["mean_crossings"].iloc[r] == sum(
            above[i] != above[i - 1] for i in range(1, n)
        )
        assert aud["n_samples"].iloc[r] == n
        # video: frame f pixel p = payload[(p + f*stride) % L]
        for f in range(2):
            want = sum(
                payload[(p + f * VIDEO_FRAME_STRIDE) % L]
                for p in range(3 * 16 * 16)
            )
            got = vid[(vid.media_id == r) & (vid.frame == f)][
                "intensity_sum"
            ].iloc[0]
            assert got == want


def test_real_backend_raises():
    from searchengine_ray.multimodal import DecodeBackend

    with pytest.raises(NotImplementedError):
        DecodeBackend().decode_image(b"x", 4, 4)


def test_pillow_backend_gating_and_default_fallback():
    """PillowDecodeBackend import-gates cleanly; default_backend() falls
    back to the deterministic fake when PIL is absent (this container) and
    returns a working Pillow decoder when it exists."""
    from searchengine_ray.multimodal import (
        FakeDecodeBackend,
        PillowDecodeBackend,
        default_backend,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    b = default_backend()
    if has_pil:
        assert isinstance(b, PillowDecodeBackend)
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 4), (1, 2, 3)).save(buf, format="PNG")
        arr = b.decode_image(buf.getvalue(), 4, 4)
        assert arr.shape == (4, 4, 3) and (arr[0, 0] == [1, 2, 3]).all()
    else:
        assert isinstance(b, FakeDecodeBackend)
        with pytest.raises(ImportError, match="Pillow"):
            PillowDecodeBackend()


def test_query_service_warm_and_search(built_index):
    """QueryService.warm broadcasts to every actor (dynamic dispatch means
    any actor can serve any chunk) and search_batch results equal the
    in-process engine afterwards."""
    from searchengine_ray.engine import QueryService, SearchEngine

    svc = QueryService(built_index, ModelParams(model="bm25", top_k=10),
                       num_actors=2)
    items = [("1", "mutex lock"), ("2", "check")]
    svc.warm(items)
    got = svc.search_batch(items).to_pandas()
    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=10))
    want = eng.search_many(items).to_pandas()
    want = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    svc.shutdown()


def test_run_queries_actor_pool(built_index):
    """run_queries (the Ray Data map_batches actor-pool path used by
    entry() and batch jobs) must agree with the in-process engine — this is
    the path a constructor regression silently broke once."""
    from searchengine_ray.engine import SearchEngine, run_queries

    items = [("1", "mutex lock"), ("2", "#near/1( unit test )"), ("3", "check")]
    got = (
        run_queries(built_index, items, ModelParams(model="bm25", top_k=10),
                    concurrency=2)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=10))
    want = (
        eng.search_many(items)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_query_service_pool(built_index):
    from searchengine_ray.engine import QueryService, SearchEngine

    svc = QueryService(
        built_index, ModelParams(model="bm25", top_k=10), num_actors=2
    )
    items = [("1", "mutex lock"), ("2", "#near/1( unit test )"), ("3", "check")]
    got = svc.search_batch(items).to_pandas()
    svc.shutdown()
    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=10))
    want = eng.search_many(items).to_pandas()
    want = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert got.equals(want)


def test_query_service_dynamic_dispatch_many_chunks(built_index):
    """More chunks than actors (chunk_size=1 -> one RPC per query): the
    ray.wait pull loop must still return every query's results exactly
    once, identical to the single-engine evaluation."""
    from searchengine_ray.engine import QueryService, SearchEngine

    svc = QueryService(
        built_index, ModelParams(model="bm25", top_k=5), num_actors=2
    )
    items = [(str(i), q) for i, q in enumerate(
        ["mutex", "lock thread", "#near/1( unit test )", "check", "parse",
         "mutex lock", "thread", "#syn( lock mutex )", "unit", "test"]
    )]
    got = svc.search_batch(items, chunk_size=1).to_pandas()
    empty = svc.search_batch([])
    svc.shutdown()
    assert empty.num_rows == 0
    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=5))
    want = eng.search_many(items).to_pandas()
    want = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert got.equals(want)


def test_large_join_revenue(ray_session):
    from searchengine_ray.relational import revenue_by_order_priority

    df = revenue_by_order_priority("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 5  # TPC-H order priorities
    assert (df["revenue_cents"] > 0).all()


def test_balanced_shards_length_aware_and_exact(ray_session, tmp_path):
    """balanced_shards packs partitions by Σ len_body (greedy LPT), so a
    skewed corpus — all the long docs in the low doc-id range — yields
    shards far more even than the naive contiguous split; serving over the
    grouped shards stays exactly equal to the full index."""
    import pyarrow as pa
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.engine import (
        SearchEngine, ShardedQueryService, balanced_shards,
    )

    long_doc = "mutex lock " * 400 + "guard check fault"
    short_doc = "mutex check"
    # both heavy partitions sit in the LOW doc-id half: a contiguous split
    # stacks them in one shard; LPT pairs each with a light partition
    texts = [long_doc] * 16 + [short_doc] * 16
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "repo": [f"r{i}" for i in range(len(texts))],
            "path": [f"src/f{i}.txt" for i in range(len(texts))],
            "commit": ["c" * 8] * len(texts),
            "lang": ["en"] * len(texts),
            "content": texts,
        }
    )
    out = str(tmp_path / "skewidx")
    # bucket 8 so the 4 partitions align to real doc ranges: the 8 long
    # docs all land in partition 0
    build_index(
        lambda: ray.data.from_arrow(tbl), out,
        BuildConfig(doc_bucket_size=8, num_partitions=4),
    )
    shards = balanced_shards(out, 2)
    assert len(shards) == 2 and sorted(p for s in shards for p in s) == [0, 1, 2, 3]

    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    def load(parts):
        return sum(
            int(pc.sum(
                pads.dataset(os.path.join(out, "docmap", f"part_{p:05d}"))
                .to_table(columns=["len_body"]).column("len_body")
            ).as_py())
            for p in parts
        )

    bal = sorted(load(s) for s in shards)
    naive = sorted(load(s) for s in ([0, 1], [2, 3]))
    # LPT pairs the heavy partitions apart; contiguous split stacks them
    assert bal[1] / bal[0] < naive[1] / naive[0]
    assert bal[1] / bal[0] < 2.0

    svc = ShardedQueryService(
        out, parts=shards, params=ModelParams(model="bm25", top_k=10)
    )
    full = SearchEngine(out, ModelParams(model="bm25", top_k=10))
    try:
        for q in ("mutex check", "#near/1( mutex lock )"):
            got = svc.search("q", q).to_pandas()
            want = full.search("q", q).to_pandas()
            assert list(got["external_id"]) == list(want["external_id"]), q
    finally:
        svc.shutdown()


def test_sharded_query_service_pool(built_index):
    """Long-lived shard pool must match one-shot sharded and full-index."""
    from searchengine_ray.engine import SearchEngine, ShardedQueryService

    svc = ShardedQueryService(
        built_index, parts=[0, 1], params=ModelParams(model="bm25", top_k=15)
    )
    full = SearchEngine(built_index, ModelParams(model="bm25", top_k=15))
    try:
        for q in ("#near/1( unit test )", "mutex lock", "#syn( error fault )"):
            got = svc.search("q", q).to_pandas()
            want = full.search("q", q).to_pandas()
            assert list(got["external_id"]) == list(want["external_id"]), q
            np.testing.assert_allclose(
                got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-12
            )
    finally:
        svc.shutdown()


def test_media_from_documents_preconditions(ray_session, tmp_path):
    """Review finding r5: the mm oracles' premises fail LOUDLY — empty
    text and non-ASCII text raise clear errors instead of an opaque hash
    mismatch or a remainder-by-zero inside an actor; ByteDecodeBackend
    refuses empty payloads directly too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.multimodal import ByteDecodeBackend, media_from_documents

    with pytest.raises(ValueError, match="empty payload"):
        ByteDecodeBackend().decode_image(b"", 4, 4)

    def write(docs, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
            }),
            d / "documents.parquet",
        )
        return str(d)

    with pytest.raises(Exception, match="empty documents.text"):
        media_from_documents(write(["ok text", ""], "empty")).to_pandas()
    with pytest.raises(Exception, match="non-ASCII"):
        media_from_documents(write(["ok", "café"], "nonascii")).to_pandas()
    # the happy path still works
    assert len(media_from_documents(write(["a b", "c d"], "ok")).to_pandas()) == 2
