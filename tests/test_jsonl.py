"""JSONL source/sink (sources/jsonl.py): byte-exact roundtrip
including base64-coded binary columns and nulls, post-parse pruning,
and the oracled parity query."""

from __future__ import annotations

import pyarrow as pa


def test_jsonl_roundtrip_binary_and_nulls(ray_session, tmp_path):
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.jsonl import (
        read_pages_jsonl,
        write_pages_jsonl,
    )

    pages = pa.table(
        {
            "url": pa.array(["a", "b", "c", "d"], type=pa.string()),
            "html": pa.array(
                [b"<p>\x00\xff raw bytes</p>", b"", None, b"x" * 1000],
                type=pa.binary(),
            ),
            "text": pa.array(["t1", None, "t3", "t4"], type=pa.string()),
            "n": pa.array([1, 2, None, 4], type=pa.int64()),
        }
    )
    path = str(tmp_path / "pages_jsonl")
    write_pages_jsonl(ray.data.from_arrow(pages).repartition(3), path)
    back = {r["url"]: r for r in read_pages_jsonl(path).take_all()}
    for i, u in enumerate(["a", "b", "c", "d"]):
        assert back[u]["html"] == pages["html"][i].as_py()
        assert back[u]["text"] == pages["text"][i].as_py()
        assert back[u]["n"] == pages["n"][i].as_py()


def test_jsonl_read_prunes_columns(ray_session, tmp_path):
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.jsonl import (
        read_pages_jsonl,
        write_pages_jsonl,
    )

    pages = pa.table(
        {
            "url": pa.array(["a", "b"], type=pa.string()),
            "html": pa.array([b"1", b"2"], type=pa.binary()),
            "text": pa.array(["x", "y"], type=pa.string()),
        }
    )
    path = str(tmp_path / "pages_jsonl")
    write_pages_jsonl(ray.data.from_arrow(pages), path)
    ds = read_pages_jsonl(path, columns=["url", "text"])
    rows = ds.take_all()
    assert set(rows[0].keys()) == {"url", "text"}
    assert sorted(r["url"] for r in rows) == ["a", "b"]


def test_jsonl_corpus_stats_matches_parquet(ray_session):
    import duckdb

    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_docs"], r["sum_chars"], r["min_doc_id"], r["max_doc_id"])
        for r in q.jsonl_corpus_stats(sf).take_all()
    }
    con = duckdb.connect()
    expect = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""SELECT lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT),
                       MIN(doc_id), MAX(doc_id)
                FROM read_parquet('{sf}/documents.parquet') GROUP BY lang"""
        ).fetchall()
    }
    assert got == expect


def test_csv_roundtrip_binary_and_prune(ray_session, tmp_path):
    import ray.data

    from ordinarydumpdeduplicator_ray.sources.csv_pages import (
        read_pages_csv,
        write_pages_csv,
    )

    pages = pa.table(
        {
            "url": pa.array(["a", "b", "c"], type=pa.string()),
            "html": pa.array([b"\x00\xff bytes", b"", None], type=pa.binary()),
            "n": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    path = str(tmp_path / "pages_csv")
    write_pages_csv(ray.data.from_arrow(pages).repartition(2), path)
    back = {r["url"]: r for r in read_pages_csv(path).take_all()}
    for i, u in enumerate(["a", "b", "c"]):
        assert back[u]["html"] == pages["html"][i].as_py()
        assert back[u]["n"] == pages["n"][i].as_py()
    pruned = read_pages_csv(path, columns=["url", "n"]).take_all()
    assert set(pruned[0].keys()) == {"url", "n"}


def test_csv_corpus_stats_matches_parquet(ray_session):
    import duckdb

    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_docs"], r["sum_chars"], r["min_doc_id"], r["max_doc_id"])
        for r in q.csv_corpus_stats(sf).take_all()
    }
    con = duckdb.connect()
    expect = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"""SELECT lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT),
                       MIN(doc_id), MAX(doc_id)
                FROM read_parquet('{sf}/documents.parquet') GROUP BY lang"""
        ).fetchall()
    }
    assert got == expect
