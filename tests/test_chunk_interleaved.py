"""Interleaved-aware chunking: media atomicity, budget invariants, and
equality with a pure-python sequential twin on crawl-produced spans."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import spans as spans_mod

SPAN = pa.struct(
    [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
)


def _doc(doc_id: str, parts):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": "", "offset": i}
            for i, (k, t) in enumerate(parts)
        ],
    }


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
                "spans": pa.array([r["spans"] for r in rows], type=pa.list_(SPAN)),
            }
        )
    )


def _twin(rows, max_tokens, media_tokens):
    """Sequential reference implementation."""
    out = []
    for r in rows:
        seq, cur = 0, [0, 0, 0, 0]

        def flush():
            nonlocal seq, cur
            if cur[0]:
                out.append((r["doc_id"], seq, *cur))
                seq += 1
                cur = [0, 0, 0, 0]

        for s in r["spans"]:
            if s["kind"] == "media":
                if cur[3] + media_tokens > max_tokens:
                    flush()
                cur[0] += 1
                cur[2] += 1
                cur[3] += media_tokens
                continue
            cost = len((s["text"] or "").split())
            if not cost:
                continue
            if cur[3] + cost <= max_tokens:
                cur[0] += 1
                cur[1] += cost
                cur[3] += cost
                continue
            rest = cost
            while rest:
                room = max_tokens - cur[3]
                if room == 0:
                    flush()
                    room = max_tokens
                take = min(room, rest)
                cur[0] += 1
                cur[1] += take
                cur[3] += take
                rest -= take
                if cur[3] == max_tokens and rest:
                    flush()
        flush()
    return out


def test_media_atomic_and_budget():
    rows = [
        _doc(
            "d0",
            [
                ("text", "a b c d e f"),  # 6 tokens
                ("media", ""),            # 8 tokens at media_tokens=8
                ("text", "g h"),          # 2
                ("media", ""),            # flushes: 6+8+2+8=24 > 16
            ],
        )
    ]
    out = (
        spans_mod.chunk_interleaved(_ds(rows), max_tokens=16, media_tokens=8)
        .to_pandas()
        .sort_values("chunk_seq")
    )
    assert out["total_cost"].max() <= 16
    assert out["media_spans"].sum() == 2
    assert out["text_tokens"].sum() == 8
    # chunk 0: text(6)+media(8)=14; the text(2) fits (16); second media flushes
    assert out.iloc[0]["total_cost"] == 16
    assert out.iloc[1]["media_spans"] == 1


def test_long_text_span_word_split():
    rows = [_doc("d1", [("text", " ".join(["w"] * 50))])]
    out = spans_mod.chunk_interleaved(_ds(rows), max_tokens=16, media_tokens=8).to_pandas()
    assert out["text_tokens"].sum() == 50
    assert out["total_cost"].max() <= 16
    assert len(out) == 4  # 16+16+16+2


def test_matches_sequential_twin_on_crawl_spans(tmp_path):
    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.pipelines.crawl import read_documents, run_crawl

    out_dir = str(tmp_path / "c")
    cfg = CrawlConfig(
        universe=800, n_hosts=10, max_waves=1, wave_budget=200,
        seeds_per_host=2, out_dir=out_dir, emit_index=False,
    )
    res = run_crawl(cfg)
    t = read_documents(out_dir, res.waves_run).select(["doc_id", "spans"])
    rows = t.to_pylist()
    engine = (
        spans_mod.chunk_interleaved(
            ray.data.from_arrow(t), max_tokens=64, media_tokens=16
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_seq"])
        .reset_index(drop=True)
    )
    twin = _twin(rows, 64, 16)
    twin.sort(key=lambda r: (r[0], r[1]))
    assert len(engine) == len(twin)
    for got, exp in zip(engine.itertuples(index=False), twin):
        assert (got.doc_id, got.chunk_seq, got.n_spans, got.text_tokens,
                got.media_spans, got.total_cost) == exp
    shutil.rmtree(out_dir, ignore_errors=True)
