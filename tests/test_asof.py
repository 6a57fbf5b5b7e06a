"""Border-carry correctness for stages/asof.py — as-of join and
per-key caps vs brute-force oracles, with inputs repartitioned so key
runs straddle (and span) sorted-block borders."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ordinarydumpdeduplicator_ray.stages.asof import asof_join, cap_rows_per_key


def _brute_asof(levents, rorders):
    """levents: list of (eid, key, ts); rorders: list of (okey, key, ots).
    -> {eid: okey or None} picking max (ots, okey) with ots <= ts."""
    out = {}
    for eid, k, ts in levents:
        best = None
        for okey, rk, ots in rorders:
            if rk == k and ots <= ts:
                cand = (ots, okey)
                if best is None or cand > best:
                    best = cand
        out[eid] = best[1] if best else None
    return out


def _run_asof(levents, rorders, nparts):
    left = pa.table(
        {
            "event_id": pa.array([e[0] for e in levents], type=pa.int64()),
            "user_id": pa.array([e[1] for e in levents], type=pa.int64()),
            "ts": pa.array([e[2] for e in levents], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rorders], type=pa.int64()),
            "o_custkey": pa.array([r[1] for r in rorders], type=pa.int64()),
            "o_orderdate": pa.array([r[2] for r in rorders], type=pa.int64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left).repartition(nparts),
        ray.data.from_arrow(right).repartition(max(2, nparts // 2)),
        by=("user_id", "o_custkey"),
        on=("ts", "o_orderdate"),
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["o_orderkey", "o_orderdate"],
        tie=("event_id", "o_orderkey"),
    ).to_pandas()
    got = {
        int(r.event_id): (None if pa.compute.is_null(pa.scalar(r.o_orderkey)).as_py() or r.o_orderkey != r.o_orderkey else int(r.o_orderkey))
        for r in out.itertuples()
    }
    return got, out


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_matches_brute_force_skewed(self):
        rng = np.random.default_rng(7)
        # hot key 1 plus sparse keys; some keys have no orders at all
        levents = [
            (i, int(rng.choice([1, 1, 1, 2, 3, 4, 99])), int(rng.integers(0, 1000)))
            for i in range(240)
        ]
        rorders = [
            (100 + j, int(rng.choice([1, 1, 2, 3, 5])), int(rng.integers(0, 1000)))
            for j in range(60)
        ]
        expect = _brute_asof(levents, rorders)
        got, out = _run_asof(levents, rorders, nparts=9)
        assert len(out) == len(levents)
        assert got == expect

    def test_tie_break_max_orderkey(self):
        levents = [(0, 5, 100)]
        rorders = [(11, 5, 100), (12, 5, 100), (9, 5, 40)]
        got, _ = _run_asof(levents, rorders, nparts=2)
        assert got == {0: 12}

    def test_single_key_spans_many_blocks(self):
        # one key, orders only at the very start: the carry must chain
        # through blocks that contain no order rows at all
        levents = [(i, 1, 500 + i) for i in range(300)]
        rorders = [(7, 1, 10), (8, 1, 20)]
        expect = _brute_asof(levents, rorders)
        got, _ = _run_asof(levents, rorders, nparts=12)
        assert got == expect
        assert all(v == 8 for v in got.values())

    def test_unmatched_rows_are_null(self):
        levents = [(0, 1, 50), (1, 2, 50)]
        rorders = [(5, 1, 99)]  # after the event — no match
        got, out = _run_asof(levents, rorders, nparts=2)
        assert got == {0: None, 1: None}
        assert out["o_orderdate"].isna().all()


@pytest.mark.usefixtures("ray_session")
class TestCapRowsPerKey:
    def _run(self, keys, cap, nparts):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(keys)), type=pa.int64()),
                "source": pa.array(keys, type=pa.string()),
            }
        )
        out = cap_rows_per_key(
            ray.data.from_arrow(tbl).repartition(nparts),
            key="source",
            order_col="doc_id",
            cap=cap,
        ).to_pandas()
        return out

    def test_matches_brute_force(self):
        rng = np.random.default_rng(3)
        keys = [f"h{int(rng.integers(0, 6))}" for _ in range(200)]
        cap = 7
        out = self._run(keys, cap, nparts=8)
        # brute force: first `cap` doc_ids per key
        import collections

        seen = collections.Counter()
        expect = set()
        for did, k in sorted(enumerate(keys)):
            if seen[k] < cap:
                expect.add(did)
                seen[k] += 1
        assert set(out["doc_id"]) == expect
        assert out.groupby("source").size().max() <= cap

    def test_hot_key_spanning_blocks(self):
        keys = ["hot"] * 500 + ["cold"] * 3
        out = self._run(keys, cap=4, nparts=16)
        hot = out[out["source"] == "hot"]["doc_id"].tolist()
        assert sorted(hot) == [0, 1, 2, 3]
        assert len(out[out["source"] == "cold"]) == 3


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def test_matches_brute_force_across_bucket_borders(self, tmp_path):
        """Synthetic events with ts values placed right at / around the
        24h bucket edges so window matches cross the banding buckets."""
        import datetime

        import pyarrow.parquet as pq

        from ordinarydumpdeduplicator_ray.pipelines.queries import (
            events_within_order_window,
        )

        rng = np.random.default_rng(11)
        base = datetime.datetime(2024, 1, 1)
        h = 3_600
        rows = []
        eid = 0
        for u in range(5):
            for _ in range(40):
                # cluster ts near multiples of 24h to stress bucket edges
                day = int(rng.integers(0, 4))
                off = int(rng.choice([0, 1, h, 23 * h, 24 * h - 1, 24 * h, 25 * h]))
                ts = base + datetime.timedelta(seconds=day * 24 * h + off)
                et = "purchase" if rng.random() < 0.3 else "view"
                rows.append((eid, u, ts, et))
                eid += 1
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")

        out = events_within_order_window(str(tmp_path), hours=24).to_pandas()
        w = datetime.timedelta(hours=24)
        expect = {
            r[0]: sum(
                1
                for e in rows
                if e[1] == r[1] and r[2] < e[2] <= r[2] + w
            )
            for r in rows
            if r[3] == "purchase"
        }
        got = dict(zip(out["event_id"], out["n_following"]))
        assert got == expect
        assert any(v > 0 for v in expect.values())


def test_budget_rows_per_key_border_stress(ray_session):
    """Weighted prefix gate stays exact when a key's run straddles many
    tiny blocks (the carry path), vs a pandas window-sum oracle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.asof import budget_rows_per_key

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1]),
        "o": [f"{x:06d}" for x in rng.permutation(n)],
        "w": rng.integers(1, 50, size=n),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(23)
    got = budget_rows_per_key(ds, key="k", order_col="o", weight_col="w",
                              budget=500).take_all()

    srt = df.sort_values(["k", "o"]).copy()
    srt["cum"] = srt.groupby("k")["w"].cumsum()
    expect = srt[srt["cum"] <= 500]
    assert sorted((r["k"], r["o"]) for r in got) == sorted(
        zip(expect["k"], expect["o"])
    )
    # every key has SOME kept rows and the gate actually bit
    assert 0 < len(got) < n


def test_cap_rows_per_key_dict_caps(ray_session):
    """Per-key quota dict (temperature-mixture shape): each key keeps
    exactly min(quota, n_key) rows — the smallest order values — and a
    key absent from the dict keeps none, exact across block borders."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(47)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], size=n, p=[0.6, 0.25, 0.1, 0.05]),
        "o": [f"{x:06d}" for x in rng.permutation(n)],
    })
    caps = {"a": 17, "b": 40, "c": 1_000}  # d absent -> cap 0
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(29)
    got = cap_rows_per_key(ds, key="k", order_col="o", cap=caps).take_all()

    expect = []
    for k, grp in df.groupby("k"):
        expect.extend(
            (k, o) for o in sorted(grp["o"])[: caps.get(k, 0)]
        )
    assert sorted((r["k"], r["o"]) for r in got) == sorted(expect)
    assert not any(r["k"] == "d" for r in got)


def test_global_running_sum_border_stress(ray_session):
    """Exclusive global prefix sum stays exact when the sorted order is
    shredded across many tiny blocks, vs a pandas cumsum oracle."""
    import pandas as pd
    import ray.data

    from ordinarydumpdeduplicator_ray.stages.asof import global_running_sum

    rng = np.random.default_rng(53)
    n = 400
    df = pd.DataFrame({
        "id": rng.permutation(n),
        "w": rng.integers(0, 100, size=n),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(31)
    got = global_running_sum(ds, order_col="id", weight_col="w").take_all()

    srt = df.sort_values("id").reset_index(drop=True)
    srt["start_off"] = srt["w"].cumsum() - srt["w"]
    expect = dict(zip(srt["id"], srt["start_off"]))
    assert len(got) == n
    for r in got:
        assert r["start_off"] == expect[r["id"]]
