"""Relational operator tests (the TPC-H-ish surface is otherwise covered
by the driver-gate oracles; these pin the anti-join edge semantics)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gorilla_tsc_ray.pipelines import relational


def test_anti_join_oracle(ray_session, sf_small):
    got = (relational.customers_without_big_orders(sf_small).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT c_custkey, c_name, c_acctbal
        FROM '{sf_small}/customer.parquet' c
        WHERE NOT EXISTS (SELECT 1 FROM '{sf_small}/orders.parquet' o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000.0)
    """).df().sort_values("c_custkey").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_anti_join_edges(ray_session, tmp_path):
    """Customers with zero qualifying orders all survive; a customer whose
    only qualifying order sits in another block is still dropped; order
    keys with no matching customer emit nothing."""
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_acctbal": pa.array([10.0, 20.0, 30.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        # customer 2 qualifies (600k); customer 99 has no customer row;
        # customer 3's orders are all under threshold
        "o_custkey": pa.array([2, 99, 3, 3], pa.int64()),
        "o_totalprice": pa.array([600_000.0, 700_000.0, 100.0, 5.0]),
    }), str(tmp_path / "orders.parquet"))
    got = (relational.customers_without_big_orders(str(tmp_path))
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    assert list(got["c_custkey"]) == [1, 3]
    assert list(got["c_name"]) == ["a", "c"]
    np.testing.assert_allclose(got["c_acctbal"], [10.0, 30.0])


def test_nation_order_quantiles(ray_session, sf_small):
    got = (relational.nation_order_quantiles(sf_small).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT n.n_name,
               round(quantile_cont(o.o_totalprice, 0.5), 6) AS p50,
               round(quantile_cont(o.o_totalprice, 0.95), 6) AS p95
        FROM '{sf_small}/orders.parquet' o
        JOIN '{sf_small}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_small}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    """).df().sort_values("n_name").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_customer_big_order_counts(ray_session, sf_small):
    got = (relational.customer_big_order_counts(sf_small).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT c.c_custkey, c.c_name,
               CAST(count(o.o_custkey) AS BIGINT) AS n_big
        FROM '{sf_small}/customer.parquet' c
        LEFT JOIN '{sf_small}/orders.parquet' o
          ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
        GROUP BY 1, 2
    """).df().sort_values("c_custkey").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n_big"] == 0).any()          # zero-match rows preserved
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_brand_revenue(ray_session, sf_small):
    got = (relational.brand_revenue(sf_small).to_pandas()
           .sort_values("p_brand").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT p.p_brand,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue,
               count(*) AS n_items,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """).df().sort_values("p_brand").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-6)


def test_orders_by_region(ray_session, sf_small):
    got = (relational.orders_by_region(sf_small).to_pandas()
           .sort_values("r_name").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT r.r_name, round(sum(o.o_totalprice), 4) AS total,
               count(*) AS n_orders
        FROM '{sf_small}/orders.parquet' o
        JOIN '{sf_small}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_small}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        JOIN '{sf_small}/region.parquet' r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
    """).df().sort_values("r_name").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-6)


def test_orders_monthly(ray_session, sf_small):
    got = (relational.orders_monthly(sf_small).to_pandas()
           .sort_values(["month", "o_orderpriority"]).reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
        FROM '{sf_small}/orders.parquet' GROUP BY 1, 2
    """).df().sort_values(["month", "o_orderpriority"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-6)


def test_late_shipment_orders(ray_session, sf_small):
    got = (relational.late_shipment_orders(sf_small).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM '{sf_small}/orders.parquet' o
        WHERE EXISTS (SELECT 1 FROM '{sf_small}/lineitem.parquet' l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY 1
    """).df().sort_values("o_orderpriority").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_forecast_revenue(ray_session, sf_small):
    got = relational.forecast_revenue(sf_small).to_pandas()
    exp = duckdb.connect().execute(f"""
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM '{sf_small}/lineitem.parquet'
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """).df()
    assert len(got) == 1
    np.testing.assert_allclose(got["revenue"], exp["revenue"], atol=1e-3)


def test_segment_revenue(ray_session, sf_small):
    got = (relational.segment_revenue(sf_small).to_pandas()
           .sort_values("c_mktsegment").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT c.c_mktsegment, round(sum(o.o_totalprice), 4) AS total,
               count(*) AS n_orders
        FROM '{sf_small}/orders.parquet' o
        JOIN '{sf_small}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """).df().sort_values("c_mktsegment").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-6)


def test_q3_shipping_priority(ray_session, sf_small):
    got = relational.q3_shipping_priority(sf_small).to_pandas()
    exp = duckdb.connect().execute(f"""
        SELECT l.l_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue,
               epoch_ms(o.o_orderdate) AS orderdate_ms, o.o_orderpriority
        FROM '{sf_small}/customer.parquet' c
        JOIN '{sf_small}/orders.parquet' o ON c.c_custkey = o.o_custkey
        JOIN '{sf_small}/lineitem.parquet' l
          ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 3, 4
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp,
        check_exact=False, atol=1e-6)


def test_attach_dim_exchange_matches_broadcast(ray_session, sf_small,
                                               monkeypatch):
    """The size-guarded dimension attach (VERDICT r3 #1) must produce
    identical results on both routes: broadcast probe (small dim) and
    co-partitioned exchange (corpus-scale dim, forced via threshold=0).
    Covers a join-aggregate, the snowflake chain, and the Q3 semi-join."""
    def run_all():
        return {
            "nation": (relational.orders_by_nation(sf_small).to_pandas()
                       .sort_values("n_name").reset_index(drop=True)),
            "region": (relational.orders_by_region(sf_small).to_pandas()
                       .sort_values("r_name").reset_index(drop=True)),
            "brand": (relational.brand_revenue(sf_small).to_pandas()
                      .sort_values("p_brand").reset_index(drop=True)),
            "q3": (relational.q3_shipping_priority(sf_small).to_pandas()
                   .reset_index(drop=True)),
        }

    bcast = run_all()
    monkeypatch.setattr(relational, "DIM_BROADCAST_BYTES", 0)
    exch = run_all()
    for k in bcast:
        pd.testing.assert_frame_equal(bcast[k], exch[k][bcast[k].columns],
                                      check_exact=False, atol=1e-9)


def test_q5_local_supplier_volume(ray_session, sf_small):
    got = (relational.q5_local_supplier_volume(sf_small).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue
        FROM '{sf_small}/customer.parquet' c
        JOIN '{sf_small}/orders.parquet' o ON o.o_custkey = c.c_custkey
        JOIN '{sf_small}/lineitem.parquet' l
          ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_small}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        JOIN '{sf_small}/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        JOIN '{sf_small}/region.parquet' r
          ON n.n_regionkey = r.r_regionkey
        WHERE s.s_nationkey = c.c_nationkey AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """).df().sort_values("n_name").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-6)


def test_q10_returned_items(ray_session, sf_small):
    got = relational.q10_returned_items(sf_small).to_pandas()
    exp = duckdb.connect().execute(f"""
        SELECT c.c_custkey, c.c_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue,
               c.c_acctbal, n.n_name
        FROM '{sf_small}/customer.parquet' c
        JOIN '{sf_small}/orders.parquet' o ON o.o_custkey = c.c_custkey
        JOIN '{sf_small}/lineitem.parquet' l
          ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_small}/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 4, 5
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp,
        check_exact=False, atol=1e-6)


def test_q14_promo_revenue(ray_session, sf_small):
    got = relational.q14_promo_revenue(sf_small).to_pandas()
    exp = duckdb.connect().execute(f"""
        SELECT round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END), 4) AS promo_revenue,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS total_revenue
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/part.parquet' p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
          AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """).df()
    assert len(got) == 1
    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp,
        check_exact=False, atol=1e-6)
    assert (got["promo_revenue"] <= got["total_revenue"]).all()


def test_q5_q10_q14_exchange_matches_broadcast(ray_session, sf_small,
                                               monkeypatch):
    """The new Q5/Q10/Q14 shapes run all their dimension attaches through
    the size-guarded selector; forcing the co-partitioned exchange route
    must reproduce the broadcast-route results exactly."""
    def run_all():
        return {
            "q5": (relational.q5_local_supplier_volume(sf_small)
                   .to_pandas().sort_values("n_name")
                   .reset_index(drop=True)),
            "q10": (relational.q10_returned_items(sf_small).to_pandas()
                    .reset_index(drop=True)),
            "q14": (relational.q14_promo_revenue(sf_small).to_pandas()
                    .reset_index(drop=True)),
        }

    bcast = run_all()
    monkeypatch.setattr(relational, "DIM_BROADCAST_BYTES", 0)
    exch = run_all()
    for k in bcast:
        pd.testing.assert_frame_equal(bcast[k], exch[k][bcast[k].columns],
                                      check_exact=False, atol=1e-9)


def test_q18_large_volume_customers(ray_session, sf_small):
    got = relational.q18_large_volume_customers(sf_small).to_pandas()
    exp = duckdb.connect().execute(f"""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, sum(l.l_quantity) AS total_qty
        FROM '{sf_small}/customer.parquet' c
        JOIN '{sf_small}/orders.parquet' o ON o.o_custkey = c.c_custkey
        JOIN '{sf_small}/lineitem.parquet' l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3, 4, 5
        HAVING sum(l.l_quantity) > 250
        ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp,
        check_exact=False, atol=1e-9)


def test_q7_nation_volume(ray_session, sf_small):
    got = (relational.q7_nation_volume(sf_small).to_pandas()
           .sort_values(["supp_nation", "cust_nation", "l_year"])
           .reset_index(drop=True))
    exp = duckdb.connect().execute(f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/orders.parquet' o
          ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_small}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        JOIN '{sf_small}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf_small}/nation.parquet' n1
          ON n1.n_nationkey = s.s_nationkey
        JOIN '{sf_small}/nation.parquet' n2
          ON n2.n_nationkey = c.c_nationkey
        WHERE (s.s_nationkey = 3 AND c.c_nationkey = 8)
           OR (s.s_nationkey = 8 AND c.c_nationkey = 3)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    assert len(got) == len(exp) > 0
    # both directions of the pair must be present
    assert set(zip(got["supp_nation"], got["cust_nation"])) == {
        ("NATION_3", "NATION_8"), ("NATION_8", "NATION_3")}
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_q19_disjunct_revenue(ray_session, sf_small):
    got = relational.q19_disjunct_revenue(sf_small).to_pandas()
    exp = duckdb.connect().execute(f"""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS revenue
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """).df()
    assert len(got) == 1 and got["revenue"].iloc[0] > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_q18_q7_q19_exchange_matches_broadcast(ray_session, sf_small,
                                               monkeypatch):
    """Forcing the co-partitioned exchange route through every
    size-guarded dimension attach must reproduce the broadcast-route
    results exactly (same pin as the Q5/Q10/Q14 wave)."""
    def run_all():
        return {
            "q18": (relational.q18_large_volume_customers(sf_small)
                    .to_pandas().reset_index(drop=True)),
            "q7": (relational.q7_nation_volume(sf_small).to_pandas()
                   .sort_values(["supp_nation", "cust_nation", "l_year"])
                   .reset_index(drop=True)),
            "q19": (relational.q19_disjunct_revenue(sf_small).to_pandas()
                    .reset_index(drop=True)),
        }

    bcast = run_all()
    monkeypatch.setattr(relational, "DIM_BROADCAST_BYTES", 0)
    exch = run_all()
    for k in bcast:
        pd.testing.assert_frame_equal(bcast[k], exch[k][bcast[k].columns],
                                      check_exact=False, atol=1e-9)


def test_q12_q13_q15(ray_session, sf_small):
    con = duckdb.connect()
    got12 = (relational.q12_priority_lines(sf_small).to_pandas()
             .sort_values("l_linestatus").reset_index(drop=True))
    exp12 = con.execute(f"""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                             ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                             ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                    AS BIGINT) AS low_line_count
        FROM '{sf_small}/orders.parquet' o
        JOIN '{sf_small}/lineitem.parquet' l
          ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1 ORDER BY 1""").df()
    assert len(got12) == len(exp12) > 0
    pd.testing.assert_frame_equal(got12[exp12.columns], exp12)

    got13 = (relational.q13_customer_distribution(sf_small).to_pandas()
             .sort_values("c_count").reset_index(drop=True))
    exp13 = con.execute(f"""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
          SELECT c.c_custkey,
                 CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM '{sf_small}/customer.parquet' c
          LEFT JOIN '{sf_small}/orders.parquet' o
            ON o.o_custkey = c.c_custkey
            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY 1) t GROUP BY 1 ORDER BY 1""").df()
    assert len(got13) == len(exp13) > 0
    # left-join shape: the zero-order bucket must be representable
    assert (got13["custdist"].sum() == con.execute(
        f"SELECT count(*) FROM '{sf_small}/customer.parquet'").fetchone()[0])
    pd.testing.assert_frame_equal(got13[exp13.columns], exp13)

    got15 = relational.q15_top_supplier(sf_small).to_pandas()
    exp15 = con.execute(f"""
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 4)
                   AS total_revenue
          FROM '{sf_small}/lineitem.parquet'
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY 1)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM '{sf_small}/supplier.parquet' s
        JOIN rev r ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey""").df()
    assert len(got15) == len(exp15) > 0
    pd.testing.assert_frame_equal(
        got15[exp15.columns].reset_index(drop=True), exp15,
        check_exact=False, atol=1e-9)


def test_q17_q21_q22(ray_session, sf_small):
    con = duckdb.connect()
    got17 = relational.q17_small_quantity_revenue(sf_small).to_pandas()
    exp17 = con.execute(f"""
        SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/part.parquet' p ON p.p_partkey = l.l_partkey
        JOIN (SELECT l_partkey, sum(l_quantity) AS sq, count(*) AS cnt
              FROM '{sf_small}/lineitem.parquet' GROUP BY 1) pa
          ON pa.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND 5 * l.l_quantity * pa.cnt < pa.sq""").df()
    assert len(got17) == 1 and got17["avg_yearly"].iloc[0] > 0
    pd.testing.assert_frame_equal(got17[exp17.columns], exp17,
                                  check_exact=False, atol=1e-4)

    got21 = relational.q21_waiting_suppliers(sf_small).to_pandas()
    exp21 = con.execute(f"""
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM '{sf_small}/supplier.parquet' s
        JOIN '{sf_small}/lineitem.parquet' l1
          ON l1.l_suppkey = s.s_suppkey
        JOIN '{sf_small}/orders.parquet' o
          ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM '{sf_small}/lineitem.parquet' l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM '{sf_small}/lineitem.parquet' l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25""").df()
    assert len(got21) == len(exp21) > 0
    pd.testing.assert_frame_equal(
        got21[exp21.columns].reset_index(drop=True), exp21)

    got22 = (relational.q22_idle_customers(sf_small).to_pandas()
             .sort_values("c_nationkey").reset_index(drop=True))
    exp22 = con.execute(f"""
        SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c.c_acctbal), 4) AS totacctbal
        FROM '{sf_small}/customer.parquet' c
        WHERE c.c_acctbal > (
            SELECT avg(c_acctbal) FROM '{sf_small}/customer.parquet'
            WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM '{sf_small}/orders.parquet' o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-07-01')
        GROUP BY 1 ORDER BY 1""").df()
    assert len(got22) == len(exp22) > 0
    pd.testing.assert_frame_equal(got22[exp22.columns], exp22,
                                  check_exact=False, atol=1e-9)


def test_q15_q21_q22_exchange_matches_broadcast(ray_session, sf_small,
                                                monkeypatch):
    """Forcing the co-partitioned exchange route through the size-guarded
    attaches must reproduce the broadcast-route results exactly (same pin
    as the earlier TPC-H waves; q15/q21/q22 exercise _attach_dim,
    _semi_filter and the anti probe)."""
    def run_all():
        return {
            "q15": (relational.q15_top_supplier(sf_small).to_pandas()
                    .reset_index(drop=True)),
            "q21": (relational.q21_waiting_suppliers(sf_small).to_pandas()
                    .reset_index(drop=True)),
            "q22": (relational.q22_idle_customers(sf_small).to_pandas()
                    .sort_values("c_nationkey").reset_index(drop=True)),
            "q17": (relational.q17_small_quantity_revenue(sf_small)
                    .to_pandas().reset_index(drop=True)),
        }

    bcast = run_all()
    monkeypatch.setattr(relational, "DIM_BROADCAST_BYTES", 0)
    exch = run_all()
    for k in bcast:
        pd.testing.assert_frame_equal(bcast[k], exch[k][bcast[k].columns],
                                      check_exact=False, atol=1e-9)


def test_q8_q9(ray_session, sf_small):
    con = duckdb.connect()
    got8 = (relational.q8_market_share(sf_small).to_pandas()
            .sort_values("o_year").reset_index(drop=True))
    exp8 = con.execute(f"""
        SELECT year(o.o_orderdate) AS o_year,
               round(sum(CASE WHEN s.s_nationkey = 3
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END), 4) AS nation_revenue,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS total_revenue
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/part.parquet' p ON p.p_partkey = l.l_partkey
        JOIN '{sf_small}/supplier.parquet' s
          ON s.s_suppkey = l.l_suppkey
        JOIN '{sf_small}/orders.parquet' o
          ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_small}/customer.parquet' c
          ON c.c_custkey = o.o_custkey
        JOIN '{sf_small}/nation.parquet' n
          ON n.n_nationkey = c.c_nationkey
        JOIN '{sf_small}/region.parquet' r
          ON r.r_regionkey = n.n_regionkey
        WHERE p.p_type LIKE 'PROMO%' AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1""").df()
    assert len(got8) == len(exp8) > 0
    assert (got8["nation_revenue"] <= got8["total_revenue"]).all()
    pd.testing.assert_frame_equal(got8[exp8.columns], exp8,
                                  check_exact=False, atol=1e-9)

    got9 = (relational.q9_profit(sf_small).to_pandas()
            .sort_values(["nation", "o_year"]).reset_index(drop=True))
    exp9 = con.execute(f"""
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity), 4)
                 AS sum_profit
        FROM '{sf_small}/lineitem.parquet' l
        JOIN '{sf_small}/part.parquet' p ON p.p_partkey = l.l_partkey
        JOIN '{sf_small}/supplier.parquet' s
          ON s.s_suppkey = l.l_suppkey
        JOIN '{sf_small}/orders.parquet' o
          ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_small}/nation.parquet' n
          ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%a%'
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert len(got9) == len(exp9) > 0
    pd.testing.assert_frame_equal(got9[exp9.columns], exp9,
                                  check_exact=False, atol=1e-6)


def test_bloom_probe_is_superset_and_selective():
    # membership never misses; FPR on a disjoint probe set stays near the
    # theoretical (1 - e^{-kn/m})^k for n=10k, m=2^20, k=4 (~1e-4)
    rng = np.random.default_rng(7)
    members = rng.choice(10**9, size=10_000, replace=False).astype(np.int64)
    words = relational._bloom_build(members, 1 << 20, 4)
    assert relational._bloom_probe(members, words, 4).all()
    probe = (members[:5000] + 10**9).astype(np.int64)  # disjoint
    fp = relational._bloom_probe(probe, words, 4).mean()
    assert fp < 0.01, fp


def test_bloom_semijoin_vs_duckdb(ray_session, sf_small):
    got = (relational.bloom_semijoin_urgent_revenue(sf_small).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    exp = con.execute("""
SELECT l.l_returnflag, l.l_linestatus,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                       WHERE o_orderpriority = '1-URGENT')
GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_q2_q11_q16_q20(ray_session, sf_small):
    """The final four TPC-H shapes (lineitem stands in for the missing
    partsupp as the part↔supplier relation — adaptations documented in
    the pipeline docstrings)."""
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "part", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")

    got2 = relational.q2_min_cost_supplier(sf_small).to_pandas()
    exp2 = con.execute("""
        WITH cost AS (
          SELECT l.l_partkey, l.l_suppkey,
                 min(l.l_extendedprice / l.l_quantity) AS uc
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          WHERE r.r_name = 'EUROPE' GROUP BY 1, 2),
        best AS (SELECT l_partkey, min(uc) AS mc FROM cost GROUP BY 1)
        SELECT s.s_acctbal, s.s_name, n.n_name, c.l_partkey AS p_partkey,
               round(c.uc, 4) AS unit_cost
        FROM cost c
        JOIN best b ON b.l_partkey = c.l_partkey AND c.uc = b.mc
        JOIN part p ON p.p_partkey = c.l_partkey
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY'
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p_partkey""").df()
    assert len(got2) == len(exp2) > 0
    pd.testing.assert_frame_equal(
        got2[exp2.columns].reset_index(drop=True), exp2,
        check_exact=False, atol=1e-9)

    got11 = relational.q11_part_concentration(sf_small).to_pandas()
    exp11 = con.execute("""
        WITH v AS (
          SELECT l.l_partkey AS partkey,
                 CAST(sum(l.l_quantity) AS BIGINT) AS val
          FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
          WHERE s.s_nationkey = 3 GROUP BY 1)
        SELECT partkey, val FROM v
        WHERE val > 0.001 * (SELECT sum(val) FROM v)
        ORDER BY val DESC, partkey""").df()
    assert len(got11) == len(exp11) > 0
    pd.testing.assert_frame_equal(
        got11[exp11.columns].reset_index(drop=True), exp11)

    got16 = relational.q16_part_supplier_counts(sf_small).to_pandas()
    exp16 = con.execute("""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'ECONOMY'
          AND p.p_size IN (1, 4, 7, 10, 13, 16) AND s.s_acctbal >= 0
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""").df()
    assert len(got16) == len(exp16) > 0
    pd.testing.assert_frame_equal(
        got16[exp16.columns].reset_index(drop=True), exp16)

    got20 = relational.q20_dominant_suppliers(sf_small).to_pandas()
    exp20 = con.execute("""
        WITH q AS (
          SELECT l.l_suppkey,
            CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l.l_shipdate < TIMESTAMP '1998-01-01'
                     THEN l.l_quantity ELSE 0 END) AS BIGINT) AS qty_year,
            CAST(sum(l.l_quantity) AS BIGINT) AS qty_total
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE '%ring%' GROUP BY 1)
        SELECT s.s_name, s.s_acctbal, qty_year, qty_total FROM q
        JOIN supplier s ON s.s_suppkey = q.l_suppkey
        WHERE 6 * qty_year > qty_total AND s.s_nationkey < 12
        ORDER BY s_name""").df()
    # sf0.001 yields exactly one dominant supplier; any mismatch in the
    # integer ratio rule would flip it
    assert len(got20) == len(exp20) > 0
    pd.testing.assert_frame_equal(
        got20[exp20.columns].reset_index(drop=True), exp20)


def test_attach_dim_empty_pushed_filter_dim(ray_session, sf_small):
    """A pushed-filter dim that matches NOTHING (size_bytes == 0) must
    take the broadcast probe_empty path — the exchange route would feed
    schemaless empty frames to the merge kernel (found building q16's
    complaint anti-join at sf0.001, where no supplier has a negative
    balance)."""
    import pyarrow.dataset as pads
    import ray.data

    facts = ray.data.read_parquet(
        f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    empty_dim = ray.data.read_parquet(
        f"{sf_small}/supplier.parquet", columns=["s_suppkey"],
        filter=pads.field("s_acctbal") < -1e18)
    out = relational._attach_dim(
        facts, relational._mark_hit(empty_dim),
        fact_key="o_custkey", dim_key="s_suppkey",
        out_cols=["__hit"]).to_pandas()
    n_orders = pq.read_table(f"{sf_small}/orders.parquet").num_rows
    assert len(out) == n_orders
    assert out["__hit"].isna().all()
