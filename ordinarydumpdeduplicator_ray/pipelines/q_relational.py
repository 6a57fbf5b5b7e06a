"""Relational shapes: event aggregates, windows, as-of, TPC-H Q1/Q3/Q5/Q6, pushdown reads, rollup sets.

Split from the single-file catalog (pipelines/queries.py facade re-exports everything; see its docstring for catalog semantics).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ordinarydumpdeduplicator_ray.sources.pages import read_parquet_clean
from ray.data.aggregate import Count, Max, Min, Sum

from ordinarydumpdeduplicator_ray.config import DedupConfig
from ordinarydumpdeduplicator_ray.functions.vectors import list_to_matrix
from ordinarydumpdeduplicator_ray.stages.groups import exact_groups
from ordinarydumpdeduplicator_ray.stages.join import (
    broadcast_anti_join,
    broadcast_inner_join,
    inner_join,
)
from ordinarydumpdeduplicator_ray.stages.signatures import extract_batch

from ordinarydumpdeduplicator_ray.pipelines.qbase import (
    _extracted,
    _read_documents,
    _round4_half_away,
    dup_corpus,
)


def last_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """Grouped top-1 — the reference's GetLastFileState / latest-
    inspection selection (DataControllerSimple.cs:228-236,190-208).
    Sorted-run implementation (stages/windows.py): one sort, vectorized
    per-block top-1, O(blocks) driver merge — no per-group Python."""
    from ordinarydumpdeduplicator_ray.stages.windows import last_event_per_user as impl

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type", "event_id"],
    )
    return impl(ev)


def events_type_stats(sf_dir: str) -> ray.data.Dataset:
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value", "event_id"]
    )

    def project(t: pa.Table) -> pa.Table:
        milli = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(1000.0))), pa.int64())
        return pa.table(
            {"event_type": t["event_type"], "value_milli": milli, "event_id": t["event_id"]}
        )

    return (
        ev.map_batches(project, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_milli", alias_name="sum_value_milli"),
            Max("event_id", alias_name="max_event_id"),
        )
    )


def events_pushdown_stats(sf_dir: str, since: str = "2024-01-15") -> ray.data.Dataset:
    """Predicate-pushdown read: the time filter is handed to
    ``read_parquet`` itself (pyarrow dataset expression), so row groups
    whose ts-range statistics fall entirely before the cutoff never
    leave storage — the "prune at the read" discipline on the ROW axis,
    complementing the ``columns=`` projection every reader here already
    does. The aggregate after the read is the standard per-type combine."""
    import datetime as _dt

    import pyarrow.dataset as pads

    cut = _dt.datetime.fromisoformat(since)
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
        filter=(pads.field("ts") >= pa.scalar(cut, type=pa.timestamp("us"))),
    )

    def project(t: pa.Table) -> pa.Table:
        milli = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(1000.0))),
                        pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "value_milli": milli,
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    return (
        ev.map_batches(project, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_milli", alias_name="sum_value_milli"),
            Min("ts_us", alias_name="min_ts_us"),
        )
    )


def user_session_stats(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Windowed sessionization per user (30-min inactivity gap): a
    streaming-window custom operator the Dataset API lacks, expressed as
    one global (user_id, ts) sort + vectorized gap detection over whole
    sorted blocks (stages/windows.py) — block-border fragments of a
    user's run carry session partials and merge exactly on the driver
    (O(blocks), no per-group Python)."""
    from ordinarydumpdeduplicator_ray.stages.windows import sessionize_events

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_id"]
    )
    return sessionize_events(ev, gap_minutes)


def asof_latest_order(sf_dir: str) -> ray.data.Dataset:
    """As-of join: each event picks the customer's latest order at or
    before the event timestamp (ties on date broken by max o_orderkey).
    Generalizes the reference's latest-state-per-location selection
    (DataControllerSimple.cs:228-236) to per-probe-timestamp; Ray Data
    has no as-of join, so stages/asof.py runs ONE sort over the tagged
    union plus an O(blocks) border-carry scan — no per-group Python, no
    driver-side row data."""
    from ordinarydumpdeduplicator_ray.stages.asof import asof_join

    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = asof_join(
        events,
        orders,
        by=("user_id", "o_custkey"),
        on=("ts", "o_orderdate"),
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tie=("event_id", "o_orderkey"),
    )
    return out


def host_capped_docs(sf_dir: str, cap: int = 10) -> ray.data.Dataset:
    """Per-domain document cap — keep the first `cap` docs (smallest
    doc_id) of every source, the standard webtext domain-mix control.
    Windowed rank without per-group Python: ONE sort by (source,
    doc_id), vectorized in-block ranks, O(blocks) border-count carry
    (stages/asof.py:cap_rows_per_key)."""
    from ordinarydumpdeduplicator_ray.stages.asof import cap_rows_per_key

    docs = _read_documents(
        sf_dir, columns=["doc_id", "source", "lang", "n_chars"]
    )
    return cap_rows_per_key(docs, key="source", order_col="doc_id", cap=cap)


def events_within_order_window(sf_dir: str, hours: int = 24) -> ray.data.Dataset:
    """Range join: per 'purchase' event, count the same user's events
    with ts in (purchase_ts, purchase_ts + `hours`h]. Ray Data has no
    inequality join, so the range condition becomes an equi-join on
    (user, time-bucket): each purchase explodes into the <=2
    window-sized buckets its window overlaps, every event carries its
    own bucket, and the exact window predicate filters the
    equi-matches — the standard banding trick that keeps the shuffle an
    ordinary hash join at 100 TB (no all-pairs per user)."""
    from ordinarydumpdeduplicator_ray.stages.join import inner_join

    w_us = hours * 3_600 * 1_000_000

    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def ev_bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        return pa.table(
            {
                "r_user": t["user_id"],
                "ts_us": ts,
                "bucket": pc.divide(ts.combine_chunks(), w_us),
            }
        )

    def purchase_explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        ts = t["ts"].cast(pa.int64()).combine_chunks()
        b0 = pc.divide(ts, w_us)
        parts = [
            pa.table(
                {
                    "event_id": t["event_id"],
                    "user_id": t["user_id"],
                    "p_ts_us": ts,
                    "bucket": b,
                }
            )
            for b in (b0, pc.add(b0, 1))
        ]
        return pa.concat_tables(parts)

    ev_b = events.map_batches(ev_bucket, batch_format="pyarrow")
    purch = events.map_batches(purchase_explode, batch_format="pyarrow")
    joined = inner_join(
        purch, ev_b, on=("user_id", "bucket"), right_on=("r_user", "bucket")
    )

    def in_window(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].combine_chunks()
        p = t["p_ts_us"].combine_chunks()
        keep = pc.and_(pc.greater(ts, p), pc.less_equal(ts, pc.add(p, w_us)))
        return t.filter(keep).select(["event_id"])

    counts = (
        joined.map_batches(in_window, batch_format="pyarrow")
        .groupby("event_id")
        .aggregate(Count(alias_name="n_following"))
        .materialize()
    )

    # left-outer fill: purchases with no in-window events report 0
    cnt_tbl = pa.concat_tables(
        counts.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks() if counts.count() else None
    ref = ray.put(cnt_tbl)

    def fill(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        t = t.filter(pc.equal(t["event_type"], "purchase"))
        lut = _get_broadcast(ref)
        if lut is None:
            n = pa.array(np.zeros(len(t), dtype=np.int64))
        else:
            idx = pc.index_in(t["event_id"], value_set=lut["event_id"])
            n = pc.fill_null(pc.take(lut["n_following"], idx), 0)
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"], "n_following": n}
        )

    return events.map_batches(fill, batch_format="pyarrow")


def host_profile(sf_dir: str) -> ray.data.Dataset:
    """Per-host curation profile over the injected-dup corpus: page
    count, exact-duplicate page count (content sha shared with ANY
    other page corpus-wide), dup rate and mean page length — the
    domain-level dashboard a crawl operator prioritizes blocklists and
    caps from. Dup shas come from a per-block value_counts combiner +
    one narrow groupby (shuffle moves distinct-sha rows, not pages);
    the (small) dup-sha set broadcasts back through one membership
    pass. Reference analogue: the per-directory duplicate rollup
    (DuplicateReport.cs:114-203) keyed by host instead."""
    from ordinarydumpdeduplicator_ray.schemas import STATUS_OK
    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    extracted = _extracted(
        dup_corpus(sf_dir, with_source_host=True)
    ).materialize()

    def partial_sha_counts(t: pa.Table) -> pa.Table:
        ok = t.filter(pc.equal(t["status"], STATUS_OK))
        vc = pc.value_counts(ok["text_sha256"].combine_chunks())
        return pa.table(
            {"sha": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    dup_shas = (
        extracted.map_batches(partial_sha_counts, batch_format="pyarrow")
        .groupby("sha").aggregate(Sum("n", alias_name="n"))
        .filter(expr="n > 1")
        .materialize()
    )
    packed = pa.concat_tables(
        dup_shas.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks() if dup_shas.count() else None
    ref = ray.put(packed["sha"] if packed is not None else None)

    def per_host_partial(t: pa.Table) -> pa.Table:
        ok = t.filter(pc.equal(t["status"], STATUS_OK))
        if len(ok) == 0:
            return pa.table({
                "host": pa.array([], type=pa.string()),
                "dup": pa.array([], type=pa.int64()),
                "len": pa.array([], type=pa.int64()),
            })
        dupset = _get_broadcast(ref)
        host = pc.extract_regex(ok["url"], r"^https://(?P<host>[^/]+)/")
        host = pc.struct_field(host, "host")
        if dupset is not None:
            is_dup = pc.is_valid(pc.index_in(ok["text_sha256"], value_set=dupset))
        else:
            is_dup = pa.array([False] * len(ok), type=pa.bool_())
        lens = pc.utf8_length(ok["text"])
        return pa.table({
            "host": host,
            "dup": pc.cast(is_dup, pa.int64()),
            "len": pc.cast(lens, pa.int64()),
        })

    agg = (
        extracted.map_batches(per_host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Count(alias_name="n_pages"),
            Sum("dup", alias_name="n_dup_pages"),
            Sum("len", alias_name="sum_len"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_pages"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = t["n_dup_pages"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["sum_len"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "host": t["host"],
            "n_pages": t["n_pages"],
            "n_dup_pages": t["n_dup_pages"],
            "dup_rate": pa.array(_round4_half_away(d / n), type=pa.float64()),
            "mean_len": pa.array(_round4_half_away(s / n), type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1997-07-01") -> pa.Table:
    """TPC-H Q3 shape over the relational side tables: revenue of
    not-yet-shipped lineitems for one market segment's pre-cutoff
    orders, top 10 by revenue. Shows the engine's multi-way join
    composition: customer (filtered, tiny) broadcast-joins into
    orders; the surviving orders (small) broadcast-join into the
    lineitem STREAM — zero shuffles below the caps, hash-join fallback
    above; the revenue groupby keys on int64 orderkeys. Top-10 via
    sort+limit of the (small) per-order aggregate."""
    import datetime as _dt

    cut = _dt.datetime.fromisoformat(cutoff)

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).filter(expr=f"c_mktsegment == '{segment}'").map_batches(
        lambda t: t.select(["c_custkey"]), batch_format="pyarrow"
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def orders_pre_cutoff(t: pa.Table) -> pa.Table:
        keep = pc.less(t["o_orderdate"], pa.scalar(cut, type=t["o_orderdate"].type))
        return t.filter(keep)

    orders = orders.map_batches(orders_pre_cutoff, batch_format="pyarrow")
    # customer side: rename key for the broadcast join
    cust_k = cust.map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"]}),
        batch_format="pyarrow",
    )
    from ordinarydumpdeduplicator_ray.stages.join import (
        broadcast_inner_join,
    )

    seg_orders = broadcast_inner_join(
        orders, cust_k, on="o_custkey",
        empty_schema=pa.schema([
            ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]),
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"],
        }),
        batch_format="pyarrow",
    )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def line_post_cutoff(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_shipdate"], pa.scalar(cut, type=t["l_shipdate"].type))
        t = t.filter(keep)
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]),
        )
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pc.cast(rev, pa.float64())})

    line = line.map_batches(line_post_cutoff, batch_format="pyarrow")
    joined = broadcast_inner_join(
        line, seg_orders, on="l_orderkey",
        empty_schema=pa.schema([
            ("l_orderkey", pa.int64()), ("rev", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]),
    )
    agg = joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"]) \
        .aggregate(Sum("rev", alias_name="revenue"))
    top = agg.sort(["revenue", "l_orderkey"], descending=[True, False]) \
        .limit(10)
    batches = list(top.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.schema([
            ("l_orderkey", pa.int64()), ("revenue", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]).empty_table()
    tbl = pa.concat_tables(batches)

    return pa.table({
        "l_orderkey": tbl["l_orderkey"],
        "revenue": pa.array(
            _round4_half_away(
                tbl["revenue"].to_numpy(zero_copy_only=False)
            ), type=pa.float64(),
        ),
        # normalize the parquet's timestamp[s] to us for oracle parity
        "o_orderdate": pc.cast(tbl["o_orderdate"], pa.timestamp("us")),
        "o_orderpriority": tbl["o_orderpriority"],
    })


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> pa.Table:
    """TPC-H Q1 shape (pricing summary report): per (returnflag,
    linestatus) sums/averages over shipped lineitems. Float sums are
    order-dependent, so every per-row money value quantizes to integer
    units FIRST (round(x*100)/round(x*10000) — the same per-row IEEE
    products on both sides) and the sums are exact int64 — the engine's
    standard determinism trick (kmeanslloyd/pagerank) applied to a
    classic relational aggregate. Per-block combiner partials (the key
    space is ~6 pairs) fold driver-side; averages derive from the int
    sums with identical scalar arithmetic in the SQL oracle."""
    import datetime as _dt

    cut = _dt.datetime.fromisoformat(cutoff)
    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(
            t["l_shipdate"], pa.scalar(cut, type=t["l_shipdate"].type))
        t = t.filter(keep)
        if len(t) == 0:
            return pa.table({
                "k": pa.array([], type=pa.string()),
                "qty": pa.array([], type=pa.int64()),
                "base": pa.array([], type=pa.int64()),
                "disc": pa.array([], type=pa.int64()),
                "charge": pa.array([], type=pa.int64()),
                "dsum": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            })
        qty = t["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ep = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        dc = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        tx = t["l_tax"].combine_chunks().to_numpy(zero_copy_only=False)
        # floor(x + 0.5), not np.rint: DuckDB's round() is
        # half-AWAY-from-zero while rint is half-to-even — rows landing
        # exactly on .5 of a unit must quantize identically (all money
        # values here are positive)
        q_c = np.floor(qty * 100.0 + 0.5).astype(np.int64)
        b_c = np.floor(ep * 100.0 + 0.5).astype(np.int64)
        d_m = np.floor(ep * (1.0 - dc) * 10000.0 + 0.5).astype(np.int64)
        c_m = np.floor(ep * (1.0 - dc) * (1.0 + tx) * 10000.0 + 0.5).astype(np.int64)
        dc_m = np.floor(dc * 10000.0 + 0.5).astype(np.int64)
        # vectorized segment sums: dictionary-encode the (flag|status)
        # key, then one np.add.at per metric — no per-row Python
        key = pc.binary_join_element_wise(
            t["l_returnflag"], t["l_linestatus"], "|")
        enc = pc.dictionary_encode(key.combine_chunks())
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kk = len(enc.dictionary)
        cols = {}
        for name, vals in (("qty", q_c), ("base", b_c), ("disc", d_m),
                           ("charge", c_m), ("dsum", dc_m)):
            acc = np.zeros(kk, dtype=np.int64)
            np.add.at(acc, idx, vals)
            cols[name] = acc
        cols["n"] = np.bincount(idx, minlength=kk).astype(np.int64)
        return pa.table({
            "k": enc.dictionary,
            **{name: pa.array(v, type=pa.int64()) for name, v in cols.items()},
        })

    folded: dict[str, list[int]] = {}
    for r in line.map_batches(partial, batch_format="pyarrow").take_all():
        row = folded.setdefault(r["k"], [0, 0, 0, 0, 0, 0])
        for j, col in enumerate(("qty", "base", "disc", "charge", "dsum", "n")):
            row[j] += r[col]
    ks = sorted(folded)
    n = np.array([folded[k][5] for k in ks], dtype=np.float64)
    qty_c = np.array([folded[k][0] for k in ks], dtype=np.int64)
    base_c = np.array([folded[k][1] for k in ks], dtype=np.int64)
    dsum_m = np.array([folded[k][4] for k in ks], dtype=np.int64)
    return pa.table({
        "l_returnflag": pa.array([k.split("|")[0] for k in ks], type=pa.string()),
        "l_linestatus": pa.array([k.split("|")[1] for k in ks], type=pa.string()),
        "sum_qty_c": pa.array(qty_c, type=pa.int64()),
        "sum_base_c": pa.array(base_c, type=pa.int64()),
        "sum_disc_price_m4": pa.array(
            [folded[k][2] for k in ks], type=pa.int64()),
        "sum_charge_m4": pa.array(
            [folded[k][3] for k in ks], type=pa.int64()),
        "avg_qty": pa.array(
            _round4_half_away(qty_c.astype(np.float64) / 100.0 / n),
            type=pa.float64()),
        "avg_price": pa.array(
            _round4_half_away(base_c.astype(np.float64) / 100.0 / n),
            type=pa.float64()),
        "avg_disc": pa.array(
            _round4_half_away(dsum_m.astype(np.float64) / 10000.0 / n),
            type=pa.float64()),
        "count_order": pa.array(n.astype(np.int64), type=pa.int64()),
    })


def q5_local_supplier_volume(
    sf_dir: str, region: str = "ASIA", year: int = 1997
) -> pa.Table:
    """TPC-H Q5 shape: revenue per nation from orders whose customer
    and supplier share the nation, within one region and year — a
    5-way join expressed as a BROADCAST CHAIN (region -> nations ->
    customers -> orders are each tiny/small and fold into lookup maps
    shipped once via ray.put) over ONE streaming pass of lineitem; the
    only per-row work is two int64 array lookups + an equality mask.
    Revenue int-quantizes per row (half-away) so the group sums are
    exact under any blocking."""
    import datetime as _dt

    import ray as _ray

    lo, hi = _dt.datetime(year, 1, 1), _dt.datetime(year + 1, 1, 1)

    def _tbl(name: str, cols: list[str]) -> pa.Table:
        return pa.concat_tables(list(
            read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                               columns=cols)
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ))

    reg = _tbl("region", ["r_regionkey", "r_name"])
    rkeys = {r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region}
    nat = _tbl("nation", ["n_nationkey", "n_name", "n_regionkey"])
    nation_name = {
        r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
        if r["n_regionkey"] in rkeys
    }
    cust = _tbl("customer", ["c_custkey", "c_nationkey"])
    cust_nat = {
        r["c_custkey"]: r["c_nationkey"] for r in cust.to_pylist()
        if r["c_nationkey"] in nation_name
    }
    orders = _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    order_nat: dict[int, int] = {}
    for r in orders.to_pylist():
        if lo <= r["o_orderdate"] < hi and r["o_custkey"] in cust_nat:
            order_nat[r["o_orderkey"]] = cust_nat[r["o_custkey"]]
    supp = _tbl("supplier", ["s_suppkey", "s_nationkey"])
    supp_nat = {r["s_suppkey"]: r["s_nationkey"] for r in supp.to_pylist()}

    # pack the lookups as sorted arrays (searchsorted resolution — the
    # packed-broadcast discipline, no Python dict probing per row)
    ok_ids = np.array(sorted(order_nat), dtype=np.int64)
    ok_nat = np.array([order_nat[k] for k in ok_ids], dtype=np.int64)
    sp_ids = np.array(sorted(supp_nat), dtype=np.int64)
    sp_nat = np.array([supp_nat[k] for k in sp_ids], dtype=np.int64)
    ref = _ray.put({"ok_ids": ok_ids, "ok_nat": ok_nat,
                    "sp_ids": sp_ids, "sp_nat": sp_nat})

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

        lk = _get_broadcast(ref)
        okk = t["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        spk = t["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        oi = np.searchsorted(lk["ok_ids"], okk)
        oi_ok = (oi < len(lk["ok_ids"])) & \
            (lk["ok_ids"][np.minimum(oi, len(lk["ok_ids"]) - 1)] == okk)
        si = np.searchsorted(lk["sp_ids"], spk)
        si_ok = (si < len(lk["sp_ids"])) & \
            (lk["sp_ids"][np.minimum(si, len(lk["sp_ids"]) - 1)] == spk)
        keep = oi_ok & si_ok
        if not keep.any():
            return pa.table({"nat": pa.array([], type=pa.int64()),
                             "rev": pa.array([], type=pa.int64())})
        cn = lk["ok_nat"][np.minimum(oi, len(lk["ok_ids"]) - 1)]
        sn = lk["sp_nat"][np.minimum(si, len(lk["sp_ids"]) - 1)]
        keep &= cn == sn
        ep = t["l_extendedprice"].combine_chunks() \
            .to_numpy(zero_copy_only=False)[keep]
        dc = t["l_discount"].combine_chunks() \
            .to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(ep * (1.0 - dc) * 10000.0 + 0.5).astype(np.int64)
        nats = cn[keep]
        uniq, inv = np.unique(nats, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({"nat": pa.array(uniq, type=pa.int64()),
                         "rev": pa.array(acc, type=pa.int64())})

    folded: dict[int, int] = {}
    for r in line.map_batches(partial, batch_format="pyarrow").take_all():
        folded[r["nat"]] = folded.get(r["nat"], 0) + r["rev"]
    rows = sorted(
        ((nation_name[n], v) for n, v in folded.items()),
        key=lambda x: (-x[1], x[0]),
    )
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], type=pa.string()),
        "revenue_m4": pa.array([r[1] for r in rows], type=pa.int64()),
    })


def q6_forecast_revenue(sf_dir: str, year: int = 1997) -> pa.Table:
    """TPC-H Q6 shape: revenue delta from discounted small-quantity
    lineitems of one year — a single filtered scalar aggregate, integer
    -quantized per row (round(ep*disc*10000)) so the sum is exact and
    order-independent."""
    import datetime as _dt

    lo = _dt.datetime(year, 1, 1)
    hi = _dt.datetime(year + 1, 1, 1)
    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(sd, pa.scalar(lo, type=sd.type)),
                    pc.less(sd, pa.scalar(hi, type=sd.type))),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(keep)
        if len(t) == 0:
            return pa.table({"r": pa.array([0], type=pa.int64()),
                             "n": pa.array([0], type=pa.int64())})
        ep = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        dc = t["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        r = np.floor(ep * dc * 10000.0 + 0.5).astype(np.int64)  # half-away
        return pa.table({"r": pa.array([int(r.sum())], type=pa.int64()),
                         "n": pa.array([len(t)], type=pa.int64())})

    parts = line.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "revenue_m4": pa.array([sum(p["r"] for p in parts)], type=pa.int64()),
        "n_items": pa.array([sum(p["n"] for p in parts)], type=pa.int64()),
    })


def url_pattern_filter(sf_dir: str) -> ray.data.Dataset:
    """Crawl-frontier URL hygiene: drop structurally-junk urls
    (search/result pages, session-id query params — the standard
    pre-download filters of a web pipeline) with a per-url verdict and
    matched reason. Pure stateless map; the regexes run on the SAME
    RE2 engine as the DuckDB oracle, so verdicts agree exactly."""
    docs = _read_documents(sf_dir, columns=["doc_id", "source"])

    def verdict(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        srcs = t["source"].to_pylist()
        urls = [
            f"https://{s}.example/"
            f"{'search' if d % 9 == 0 else 'page'}/{d:08d}"
            + (f"?sessionid={d}" if d % 13 == 0 else "")
            for d, s in zip(ids, srcs)
        ]
        u = pa.array(urls, type=pa.string())
        is_search = pc.match_substring_regex(u, r"://[^/]+/search/")
        has_session = pc.match_substring_regex(u, r"[?&]sessionid=")
        blocked = pc.or_(is_search, has_session)
        reason = pc.if_else(
            is_search, pa.array(["search_page"] * len(t)),
            pc.if_else(has_session, pa.array(["session_param"] * len(t)),
                       pa.nulls(len(t), type=pa.string())))
        return pa.table({
            "url": u,
            "blocked": blocked,
            "reason": reason,
        })

    return docs.map_batches(verdict, batch_format="pyarrow")


def event_window_stats(sf_dir: str, window_min: int = 60) -> ray.data.Dataset:
    """Event-time tumbling windows: per (event_type, hour window) count,
    value sum and distinct users — the batch form of a streaming
    windowed aggregate (event-time keyed, so late/out-of-order rows
    land in the right window by construction). Distinct users
    pre-aggregate per block ((type, window, user) value_counts
    combiner) so the shuffle moves per-block-distinct rows, then one
    groupby finishes counts exactly."""
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "user_id", "value"],
    )
    w_us = window_min * 60 * 1_000_000

    def to_windows(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(ts, w_us), w_us)
        tt = pa.table({
            "event_type": t["event_type"],
            "window_start": pc.cast(win, pa.timestamp("us")),
            "user_id": t["user_id"],
            "value": t["value"],
        })
        # combiner: per (type, window, user) partials within the block —
        # Arrow-native (pa.Table.group_by), no pandas round-trip.
        # count mode="all" matches SQL COUNT(*) (rows, not non-null
        # values); sum min_count=0 yields 0.0 for all-null groups.
        g = tt.group_by(
            ["event_type", "window_start", "user_id"], use_threads=False
        ).aggregate(
            [
                ("value", "count", pc.CountOptions(mode="all")),
                ("value", "sum",
                 pc.ScalarAggregateOptions(skip_nulls=True, min_count=0)),
            ]
        )
        # select by the GENERATED names, not position: pyarrow has
        # moved key columns between first and last across majors
        return pa.table({
            "event_type": g["event_type"],
            "window_start": g["window_start"],
            "user_id": g["user_id"],
            "n": g["value_count"],
            "v": g["value_sum"],
        })

    partials = events.map_batches(to_windows, batch_format="pyarrow")
    # exact distinct users: first collapse (type, window, user) globally
    # (a user's window can span blocks), then count rows per window
    per_user = partials.groupby(
        ["event_type", "window_start", "user_id"]
    ).aggregate(Sum("n", alias_name="n"), Sum("v", alias_name="v"))
    agg = per_user.groupby(["event_type", "window_start"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("v", alias_name="value_sum"),
        Count(alias_name="n_users"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64()),
            "value_sum": pa.array(_round4_half_away(
                t["value_sum"].to_numpy(zero_copy_only=False)
            ), type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def corpus_rollup_sets(sf_dir: str) -> ray.data.Dataset:
    """GROUPING-SETS-style multi-level rollup in one pass: doc count,
    char sum and mean length at (lang, source), (lang, ALL) and
    (ALL, ALL) granularities — the OLAP subtotal shape
    (reference analogue: the per-directory rollup's every-ancestor
    aggregation, DuplicateReport.cs:114-203, generalized to two
    dimensions). ONE (lang, source) groupby produces the finest level;
    the coarser levels fold from that SMALL aggregate driver-free via
    two more tiny groupbys — the corpus is read once."""
    docs = _read_documents(sf_dir, columns=["lang", "source", "n_chars"])

    fine = docs.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"),
    ).materialize()

    def finish(level: str):
        def f(t: pa.Table) -> pa.Table:
            n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
            s = t["sum_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
            lang = t["lang"] if "lang" in t.column_names \
                else pa.nulls(len(t), type=pa.string())
            src = t["source"] if "source" in t.column_names \
                else pa.nulls(len(t), type=pa.string())
            return pa.table({
                "lang": lang,
                "source": src,
                "grouping_level": pa.array([level] * len(t), type=pa.string()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
                "mean_chars": pa.array(_round4_half_away(s / np.maximum(n, 1)),
                                       type=pa.float64()),
            })
        return f

    by_lang = fine.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
    )
    tot = fine.aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
    )
    total = ray.data.from_arrow(pa.table({
        "n_docs": pa.array([int(tot["n_docs"] or 0)], type=pa.int64()),
        "sum_chars": pa.array([int(tot["sum_chars"] or 0)], type=pa.int64()),
    }))
    return (
        fine.map_batches(finish("lang_source"), batch_format="pyarrow")
        .union(by_lang.map_batches(finish("lang"), batch_format="pyarrow"))
        .union(total.map_batches(finish("all"), batch_format="pyarrow"))
    )

