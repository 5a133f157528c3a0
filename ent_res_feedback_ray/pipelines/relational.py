"""General relational operator surface over the star schema.

These exercise the engine primitives the ER pipeline is built from —
grouped aggregates (partial-aggregate-then-shuffle), broadcast hash joins,
global sort/top-k, tumbling windows — each with a bit-exact DuckDB twin.

Scale notes per operator are inline; the common rules:
- prune columns at the read (``read_parquet(columns=[...])``);
- pre-aggregate inside ``map_batches`` before every ``groupby`` so the
  shuffle moves one row per (batch × key), not one per input row;
- small dimension tables broadcast via ``ray.put`` — never a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..sources.tables import read_table


# ---------------------------------------------------------------------------
# q1: grouped aggregate with map-side partial aggregation
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 flavor: per (returnflag, linestatus) sums/averages/count.

    Map-side partial aggregation: each batch collapses to ≤ |keys| rows
    before the shuffle — the 100 TB version moves KBs, not the table."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        disc_price = df["l_extendedprice"] * (1 - df["l_discount"])
        charge = disc_price * (1 + df["l_tax"])
        df = df.assign(disc_price=disc_price, charge=charge)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["avg_qty"] = df["sum_qty"] / df["count_order"]
        df["avg_price"] = df["sum_base_price"] / df["count_order"]
        df["avg_disc"] = df["sum_disc"] / df["count_order"]
        df["sum_qty"] = np.round(df["sum_qty"], 2)
        df["sum_base_price"] = np.round(df["sum_base_price"], 2)
        df["sum_disc_price"] = np.round(df["sum_disc_price"], 2)
        df["sum_charge"] = np.round(df["sum_charge"], 2)
        df["avg_qty"] = np.round(df["avg_qty"], 4)
        df["avg_price"] = np.round(df["avg_price"], 4)
        df["avg_disc"] = np.round(df["avg_disc"], 4)
        return df.drop(columns=["sum_disc"])

    return out.map_batches(finalize, batch_format="pandas")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(sum(l_quantity) / count(*), 4) AS avg_qty,
  round(sum(l_extendedprice) / count(*), 4) AS avg_price,
  round(sum(l_discount) / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""".strip()


# ---------------------------------------------------------------------------
# Broadcast hash join: orders ⋈ customer ⋈ nation
# ---------------------------------------------------------------------------

def orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Revenue per customer nation.  customer+nation are small dimensions →
    broadcast via ``ray.put`` once; the fact table streams through a
    stateless map; the final groupby shuffles ≤ |nations| rows per batch."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    lookup_ref = ray.put(dict(zip(dim["c_custkey"], dim["n_name"])))

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class JoinAndPartial:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.assign(n_name=df["o_custkey"].map(self.lookup))
            return df.groupby("n_name", as_index=False).agg(
                total_revenue=("o_totalprice", "sum"),
                order_count=("o_totalprice", "size"),
            )

    partials = orders.map_batches(JoinAndPartial, batch_format="pandas",
                                  concurrency=(1, 4), batch_size=65536)
    out = partials.groupby("n_name").aggregate(
        Sum("total_revenue", alias_name="total_revenue"),
        Sum("order_count", alias_name="order_count"),
    )
    return out.map_batches(
        lambda df: df.assign(total_revenue=np.round(df["total_revenue"], 2)),
        batch_format="pandas",
    )


ORDERS_BY_NATION_SQL = """
SELECT n.n_name, round(sum(o.o_totalprice), 2) AS total_revenue,
       count(*) AS order_count
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""".strip()


# ---------------------------------------------------------------------------
# Large ⋈ large shuffle join: lineitem ⋈ orders (both fact-sized)
# ---------------------------------------------------------------------------

def lineitem_order_priority(sf_dir: str, num_partitions: int = 16) -> ray.data.Dataset:
    """Revenue per order priority via a TRUE shuffle hash join — neither side
    broadcasts (lineitem and orders are both fact tables; at 100 TB each side
    hash-partitions on the order key and only co-partitioned blocks meet).
    Post-join aggregation is map-side partial per batch → tiny groupby."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])
    j = li.join(orders, "inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(revenue=df["l_extendedprice"] * (1 - df["l_discount"]))
        return df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size"))

    partials = j.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = partials.groupby("o_orderpriority").aggregate(
        Sum("revenue", alias_name="revenue"),
        Sum("n_items", alias_name="n_items"))
    return out.map_batches(
        lambda df: df.assign(revenue=np.round(df["revenue"], 2)),
        batch_format="pandas")


LINEITEM_ORDER_PRIORITY_SQL = """
SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""".strip()


# ---------------------------------------------------------------------------
# Global top-k (sort + limit)
# ---------------------------------------------------------------------------

def top_orders(sf_dir: str, k: int = 25) -> ray.data.Dataset:
    """Top-k orders by revenue = sum of line revenues.

    l_orderkey is HIGH cardinality (~n/4 groups) → the grouped sum runs
    through ``bucketed_aggregate`` (see stages/shuffleops.py: Ray's native
    aggregate pays ~2ms per group).  Global top-k = local top-k per block
    then one small sort."""
    from ..stages.shuffleops import bucketed_aggregate

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby("l_orderkey", as_index=False).agg(revenue=("revenue", "sum"))

    partials = li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = bucketed_aggregate(partials, "l_orderkey", revenue=("revenue", "sum"))
    agg = agg.map_batches(
        lambda df: df.assign(revenue=np.round(df["revenue"], 2)), batch_format="pandas"
    )
    # local top-k per block, then the global sort runs over ≤ k×blocks rows
    local = agg.map_batches(
        lambda df: df.sort_values(["revenue", "l_orderkey"],
                                  ascending=[False, False]).head(k),
        batch_format="pandas",
    )
    return local.sort(["revenue", "l_orderkey"], descending=[True, True]).limit(k)


TOP_ORDERS_SQL = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey DESC LIMIT 25
""".strip()


# ---------------------------------------------------------------------------
# Tumbling event-time window (streaming-shaped aggregate)
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: count + sum(value).

    Ray Data has no watermarks (the reference is pure batch too, SURVEY.md
    §2.11): the window key is a derived column, the window itself is the
    groupby.  Partial-aggregate per batch before the shuffle."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        return df.groupby(["window_start", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))

    from ..stages.shuffleops import bucketed_aggregate

    partials = ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = bucketed_aggregate(
        partials, ["window_start", "event_type"],
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum"),
    )
    return out.map_batches(
        lambda df: df.assign(sum_value=np.round(df["sum_value"], 2)),
        batch_format="pandas",
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# Sessionization (gap-based windows) — map_groups over per-user sorted events
# ---------------------------------------------------------------------------

def user_sessions(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Gap-based sessionization per user: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``.  Partitioned by
    user_id (groupby shuffle), windowed inside the group — the canonical
    'stream as partitioned ordered log' pattern."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        gap = g["ts"].diff().dt.total_seconds().fillna(float("inf"))
        session_no = (gap > gap_minutes * 60).cumsum()
        out = g.groupby(session_no).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        ).reset_index(drop=True)
        out["sum_value"] = np.round(out["sum_value"], 2)
        return out

    return ev.groupby("user_id").map_groups(sessionize, batch_format="pandas")


USER_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL 30 MINUTE OR
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
),
sessions AS (
  SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sessions GROUP BY user_id, session_no
""".strip()


# ---------------------------------------------------------------------------
# Filter + projection pushdown demo
# ---------------------------------------------------------------------------

def high_value_purchases(sf_dir: str) -> ray.data.Dataset:
    """Predicate at the read (row-group pushdown) + vectorized filter."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(pc.field("event_type") == "purchase"),
    )
    return ev.map_batches(
        lambda t: t.filter(pc.greater(t.column("value"), 100.0)),
        batch_format="pyarrow",
    )


HIGH_VALUE_SQL = """
SELECT event_id, user_id, event_type, value FROM events
WHERE event_type = 'purchase' AND value > 100.0
""".strip()


# ---------------------------------------------------------------------------
# CSV side-input source (reference maybe_load_dataframe, data.py:684-701)
# ---------------------------------------------------------------------------

def nation_csv_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Exercise the CSV source end-to-end: derive a CSV side-input from the
    nation table (cached under /tmp, content-fingerprinted), read it back
    through ``maybe_load_dataframe`` (ray.data.read_csv), project."""
    import hashlib
    import os

    from ..sources.tables import maybe_load_dataframe, table_path

    src = table_path(sf_dir, "nation")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    csv_path = f"/tmp/graft_side_nation_{tag}.csv"
    if not os.path.exists(csv_path):
        import pyarrow.csv as pacsv
        import pyarrow.parquet as pq

        t = pq.read_table(src, columns=["n_nationkey", "n_name", "n_regionkey"])
        pacsv.write_csv(t, csv_path + ".tmp")
        os.rename(csv_path + ".tmp", csv_path)
    return maybe_load_dataframe(
        csv_path, columns=["n_nationkey", "n_name", "n_regionkey"])


NATION_CSV_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
       CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation
""".strip()


# ---------------------------------------------------------------------------
# As-of join (most recent prior event) — merge_asof per partition
# ---------------------------------------------------------------------------

def purchases_asof_signup(sf_dir: str) -> ray.data.Dataset:
    """Each purchase joined to the user's most recent signup at-or-before it.

    The reference has no range/as-of joins (SURVEY.md §2.8); this is the
    engine's as-of operator: partition by key (groupby shuffle), sort by ts
    inside the group, ``pd.merge_asof`` per partition.  Partitioning
    assumption: one user's events fit one group."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        s = g[g["event_type"] == "signup"].sort_values("ts", kind="mergesort")
        if len(p) == 0:
            return pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                 "user_id": pd.array([], dtype="int64"),
                                 "signup_event_id": pd.array([], dtype="float64")})
        joined = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            s[["event_id", "ts"]].rename(columns={"event_id": "signup_event_id"}),
            on="ts", direction="backward", allow_exact_matches=True)
        out = joined[["event_id", "user_id", "signup_event_id"]].copy()
        # float64 + NaN for misses: matches the SQL twin's CAST(... AS DOUBLE)
        # so the driver's canonical hash sees identical dtypes on both sides.
        out["signup_event_id"] = out["signup_event_id"].astype("float64")
        return out

    return ev.groupby("user_id").map_groups(asof, batch_format="pandas")


PURCHASES_ASOF_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
signups AS (
  SELECT event_id AS signup_event_id, user_id, ts FROM events
  WHERE event_type = 'signup'
)
SELECT p.event_id, p.user_id, CAST(s.signup_event_id AS DOUBLE) AS signup_event_id
FROM purchases p ASOF LEFT JOIN signups s
  ON p.user_id = s.user_id AND s.ts <= p.ts
""".strip()


# ---------------------------------------------------------------------------
# Sliding (hopping) windows: 1h windows every 30min — flat_map to 2 windows
# ---------------------------------------------------------------------------

def events_sliding(sf_dir: str) -> ray.data.Dataset:
    """Hopping-window aggregate (size 1h, hop 30min): each event lands in
    exactly two windows (emitted by a vectorized explode), then the window
    aggregate is a grouped sum — window assignment is a derived column, the
    window itself is the shuffle (no watermarks; batch semantics,
    SURVEY.md §2.11).  Window key = epoch seconds (timezone-free)."""
    from ..stages.shuffleops import bucketed_aggregate

    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        epoch = df["ts"].astype("int64") // 1_000_000  # us → s
        w1 = (epoch // 1800) * 1800
        w2 = w1 - 1800
        rep = pd.concat([
            pd.DataFrame({"window_start_epoch": w1, "event_type": df["event_type"],
                          "value": df["value"]}),
            pd.DataFrame({"window_start_epoch": w2, "event_type": df["event_type"],
                          "value": df["value"]}),
        ], ignore_index=True)
        return rep.groupby(["window_start_epoch", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))

    partials = ev.map_batches(explode, batch_format="pyarrow", batch_size=65536)
    out = bucketed_aggregate(
        partials, ["window_start_epoch", "event_type"],
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
    return out.map_batches(
        lambda df: df.assign(sum_value=np.round(df["sum_value"], 2)),
        batch_format="pandas")


EVENTS_SLIDING_SQL = """
WITH e AS (
  SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS w1, event_type, value
  FROM events
),
exploded AS (
  SELECT w1 AS window_start_epoch, event_type, value FROM e
  UNION ALL
  SELECT w1 - 1800 AS window_start_epoch, event_type, value FROM e
)
SELECT window_start_epoch, event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM exploded GROUP BY 1, 2
""".strip()
