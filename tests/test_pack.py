"""Ordered group-concat (stages/pack.py): byte-exact packing vs a
pandas oracle with seq runs shredded across many tiny blocks, and the
oracled query surface."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_ordered_group_concat_border_stress(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.pack import ordered_group_concat

    rng = np.random.default_rng(37)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    # contiguous seq runs of random lengths 1..9
    seqs = np.repeat(
        np.arange(200), rng.integers(1, 10, size=200)
    )[:n].astype(np.int64)
    texts = [f"doc{i}_{rng.integers(0, 100)}" for i in ids]
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "seq_id": pa.array(seqs),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    # sorted order preserved per block; shred across 41 tiny blocks so
    # nearly every seq run straddles a border
    blocks = [
        ray.data.from_arrow(t.slice(int(b[0]), len(b)))
        for b in np.array_split(np.arange(n), 41)
    ]
    ds = blocks[0].union(*blocks[1:])
    got = {
        r["seq_id"]: (r["n_docs"], r["packed"])
        for r in ordered_group_concat(ds).take_all()
    }
    expect = {}
    for s in np.unique(seqs):
        m = seqs == s
        expect[int(s)] = (int(m.sum()), " ".join(np.array(texts)[m]))
    assert got == expect


def test_single_seq_spanning_all_blocks(ray_session):
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.pack import ordered_group_concat

    n = 100
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "seq_id": pa.array(np.zeros(n, dtype=np.int64)),
            "text": pa.array([f"w{i}" for i in range(n)], type=pa.string()),
        }
    )
    blocks = [
        ray.data.from_arrow(t.slice(i * 10, 10)) for i in range(10)
    ]
    ds = blocks[0].union(*blocks[1:])
    rows = ordered_group_concat(ds).take_all()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == n
    assert rows[0]["packed"] == " ".join(f"w{i}" for i in range(n))


def test_packed_sequences_query(ray_session):
    """sf0.001 vs the DuckDB string_agg oracle, byte-for-byte."""
    import duckdb

    from ordinarydumpdeduplicator_ray.pipelines import queries as q

    got = {
        r["seq_id"]: (r["n_docs"], r["packed"])
        for r in q.packed_sequences("/root/testdata/sf0.001", chunk=512).take_all()
    }
    con = duckdb.connect()
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute("""
WITH offs AS (
  SELECT doc_id, text,
         CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
  FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
SELECT start_off // 512 AS seq_id, COUNT(*) AS n_docs,
       string_agg(text, ' ' ORDER BY doc_id) AS packed
FROM offs GROUP BY 1""").fetchall()
    }
    assert got == exp
