"""DuckDB oracle SQL for every CORE_QUERIES entry (registry_core.py).

Dialect notes: DuckDB regexp_replace needs the 'g' flag for global
replacement; `||` is the null-propagating concat (DuckDB CONCAT() skips
nulls -- never use it where pandas `+` semantics are asserted);
count/len/row_number are BIGINT (Spark sides cast to long to match).
"""

from .aggregates import cms_cell_sql, hll_est_sql, hll_reg_sql, hll_rho_sql
from .joins import point_in_polygon_sql
from .layout import hilbert_profile_sql, zorder_key_sql

_Z = zorder_key_sql("l_partkey", "l_suppkey", 16)

CORE_ORACLES: dict[str, str] = {
    "s12_zorder_profile": f"""
        WITH z AS (
          SELECT {_Z} AS zkey, l_partkey, l_suppkey FROM lineitem
        ), m AS (SELECT min(zkey) AS lo, max(zkey) AS hi FROM z)
        SELECT CAST(floor((zkey - lo) * 64.0 / (hi - lo + 1)) AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(l_partkey) AS x_min, max(l_partkey) AS x_max,
               min(l_suppkey) AS y_min, max(l_suppkey) AS y_max
        FROM z, m
        GROUP BY 1
    """,
    "flagship": None,  # filled from registry_core.FLAGSHIP_SQL below
    "sql1_priority_revenue": """
        SELECT o.o_orderpriority,
               CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    "sql2_window_rank": None,  # filled from registry_core.SQL2_TEXT below
    "a16_group_sample": """
        SELECT o_orderkey, o_orderpriority, CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT o_orderkey, o_orderpriority,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY ((o_orderkey % 2147483648) * 2654435761 + 12345)
                            % 1000000007 ASC,
                            o_orderkey ASC) AS rk
          FROM orders
        ) WHERE rk <= 3
    """,
    "w_event_paths": """
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY user_id, strftime(ts, '%Y-%m-%d')
    """,
    "a15_ntile": """
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey) AS BIGINT)
                 AS quartile
        FROM customer
    """,
    "w_top_types": """
        WITH counts AS (
          SELECT time_bucket(INTERVAL 6 HOUR, ts) AS w_start, event_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT w_start, event_type, n,
               CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT *, row_number() OVER (PARTITION BY w_start
                                       ORDER BY n DESC, event_type ASC) AS rk
          FROM counts
        ) WHERE rk <= 2
    """,
    "j15_skew_salted": """
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 10 < 8 THEN 'HOT'
                      ELSE 'K' || CAST(l_orderkey % 1000 AS STRING) END AS skew_key,
                 CAST(l_quantity AS DECIMAL(18,2)) AS qty
          FROM lineitem
        ),
        dim AS (
          SELECT 'K' || CAST(range AS STRING) AS skew_key,
                 'P' || CAST(range AS STRING) AS payload
          FROM range(1000)
        )
        SELECT f.skew_key,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(d.payload) AS BIGINT) AS n_matched,
               CAST(sum(f.qty) AS DOUBLE) AS sum_qty
        FROM fact f LEFT JOIN dim d ON f.skew_key = d.skew_key
        GROUP BY f.skew_key
    """,
    "j15_skew_plain": """
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 10 < 8 THEN 'HOT'
                      ELSE 'K' || CAST(l_orderkey % 1000 AS STRING) END AS skew_key,
                 CAST(l_quantity AS DECIMAL(18,2)) AS qty
          FROM lineitem
        ),
        dim AS (
          SELECT 'K' || CAST(range AS STRING) AS skew_key,
                 'P' || CAST(range AS STRING) AS payload
          FROM range(1000)
        )
        SELECT f.skew_key,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(d.payload) AS BIGINT) AS n_matched,
               CAST(sum(f.qty) AS DOUBLE) AS sum_qty
        FROM fact f LEFT JOIN dim d ON f.skew_key = d.skew_key
        GROUP BY f.skew_key
    """,
    "j17_band_join": """
        SELECT a.event_id, b.event_id AS r_event_id, a.user_id,
               a.value, b.value AS r_value
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND abs(a.value - b.value) <= 0.01
    """,
    "j16_bloom_semi": """
        SELECT l_orderkey, l_partkey, l_extendedprice
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
    """,
    "j14_interval_join": """
        WITH p AS (
          SELECT event_id AS win_id, user_id, ts AS w_start,
                 ts + INTERVAL 10 MINUTE AS w_end
          FROM events WHERE event_type = 'purchase'
        ), c AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        )
        SELECT p.win_id, CAST(count(*) AS BIGINT) AS n_clicks,
               CAST(sum(CAST(c.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM c JOIN p ON c.user_id = p.user_id
                     AND c.ts >= p.w_start AND c.ts < p.w_end
        GROUP BY p.win_id
    """,
    "a14_histogram": """
        WITH s AS (
          SELECT CAST(min(value) AS DOUBLE) AS lo,
                 CAST(max(value) AS DOUBLE) AS hi
          FROM events
        ), h AS (
          SELECT CAST(CASE WHEN hi = lo THEN 0
                      ELSE least(floor(((value - lo) * 16) / (hi - lo)), 15)
                 END AS BIGINT) AS bin,
                 count(*) AS n
          FROM events CROSS JOIN s GROUP BY 1
        ), b AS (
          SELECT unnest(range(0, 16)) AS bin
        )
        SELECT CAST(b.bin AS BIGINT) AS bin,
               lo + (b.bin * (hi - lo)) / 16 AS lo_edge,
               lo + ((b.bin + 1) * (hi - lo)) / 16 AS hi_edge,
               CAST(coalesce(h.n, 0) AS BIGINT) AS n
        FROM b CROSS JOIN s LEFT JOIN h ON b.bin = h.bin
    """,
    # Independent reachability closure: component id = min node id
    # reachable over the undirected edge set.  The recursive UNION
    # dedups (node, label) pairs so it terminates; feasible because the
    # gate runs at sf0.01.
    "g2_connected_components": """
        WITH RECURSIVE edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_quantity > 48
        ), bidir AS (
          SELECT src AS a, dst AS b FROM edges
          UNION ALL
          SELECT dst, src FROM edges
        ), nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), cc AS (
          SELECT node, node AS label FROM nodes
          UNION
          SELECT bidir.b AS node, cc.label
          FROM cc JOIN bidir ON cc.node = bidir.a
        )
        SELECT node, min(label) AS component FROM cc GROUP BY node
    """,
    "g7_shortest_paths": """
        WITH RECURSIVE edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst,
                          CAST((l_suppkey % 5) + (o_custkey % 3) + 1 AS BIGINT) AS w
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_quantity > 48
        ), bidir AS (
          SELECT src AS a, dst AS b, w FROM edges
          UNION
          SELECT dst, src, w FROM edges
        ), srcs AS (
          SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % 50 = 0
        ), walk AS (
          SELECT node, CAST(0 AS BIGINT) AS cost, 0 AS hop FROM srcs
          UNION
          SELECT bidir.b AS node, walk.cost + bidir.w AS cost, walk.hop + 1 AS hop
          FROM walk JOIN bidir ON walk.node = bidir.a
          WHERE walk.hop < 4
        )
        SELECT node, min(cost) AS cost FROM walk GROUP BY node
    """,
    "g6_bfs_hops": """
        WITH RECURSIVE edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_quantity > 48
        ), bidir AS (
          SELECT src AS a, dst AS b FROM edges
          UNION ALL
          SELECT dst, src FROM edges
        ), srcs AS (
          SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % 50 = 0
        ), walk AS (
          SELECT node, 0 AS hop FROM srcs
          UNION
          SELECT bidir.b AS node, walk.hop + 1 AS hop
          FROM walk JOIN bidir ON walk.node = bidir.a
          WHERE walk.hop < 4
        )
        SELECT node, CAST(min(hop) AS BIGINT) AS hops FROM walk GROUP BY node
    """,
    "g5_label_propagation": """
        WITH edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_quantity > 48
        ), bidir AS (
          SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges
          )
        ), nodes AS (
          SELECT DISTINCT a AS node FROM bidir
        ), l0 AS (
          SELECT node, node AS label FROM nodes
        ), c1 AS (
          SELECT bd.a, l.label, count(*) AS c
          FROM bidir bd JOIN l0 l ON bd.b = l.node
          GROUP BY bd.a, l.label
        ), l1 AS (
          SELECT n.node,
                 coalesce(b.label, n.node) AS label
          FROM nodes n LEFT JOIN (
            SELECT a, label FROM (
              SELECT a, label,
                     row_number() OVER (PARTITION BY a ORDER BY c DESC, label) AS rk
              FROM c1
            ) WHERE rk = 1
          ) b ON n.node = b.a
        ), c2 AS (
          SELECT bd.a, l.label, count(*) AS c
          FROM bidir bd JOIN l1 l ON bd.b = l.node
          GROUP BY bd.a, l.label
        )
        SELECT n.node, coalesce(b.label, n.node) AS label
        FROM nodes n LEFT JOIN (
          SELECT a, label FROM (
            SELECT a, label,
                   row_number() OVER (PARTITION BY a ORDER BY c DESC, label) AS rk
            FROM c2
          ) WHERE rk = 1
        ) b ON n.node = b.a
    """,
    "g3_triangle_count": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey AS pk, l_suppkey AS s
          FROM lineitem WHERE l_quantity > 45
        ), e AS (
          SELECT DISTINCT a.s AS x, b.s AS y
          FROM pairs a JOIN pairs b ON a.pk = b.pk AND a.s < b.s
        )
        SELECT CAST(count(*) AS BIGINT) AS triangles
        FROM e ab JOIN e bc ON ab.y = bc.x JOIN e ac
          ON ac.x = ab.x AND ac.y = bc.y
    """,
    "g4_degree_stats": """
        WITH edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), od AS (
          SELECT src AS node, count(*) AS out_degree FROM edges GROUP BY src
        ), idg AS (
          SELECT dst AS node, count(*) AS in_degree FROM edges GROUP BY dst
        )
        SELECT coalesce(od.node, idg.node) AS node,
               CAST(coalesce(out_degree, 0) AS BIGINT) AS out_degree,
               CAST(coalesce(in_degree, 0) AS BIGINT) AS in_degree,
               CAST(coalesce(out_degree, 0) + coalesce(in_degree, 0) AS BIGINT) AS degree
        FROM od FULL OUTER JOIN idg ON od.node = idg.node
    """,
    "g1_pagerank": """
        WITH edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), nn AS (
          SELECT count(*) AS cnt FROM nodes
        ), deg AS (
          SELECT src, count(*) AS od FROM edges GROUP BY src
        ), r0 AS (
          SELECT node, CAST(1.0 AS DOUBLE) / cnt AS pr FROM nodes CROSS JOIN nn
        ), c1 AS (
          SELECT e.dst AS node, sum(CAST(r.pr / d.od AS DECIMAL(38,18))) AS s
          FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ), r1 AS (
          SELECT n2.node,
                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt
                 + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0) AS pr
          FROM nodes n2 CROSS JOIN nn LEFT JOIN c1 ON n2.node = c1.node
        ), c2 AS (
          SELECT e.dst AS node, sum(CAST(r.pr / d.od AS DECIMAL(38,18))) AS s
          FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ), r2 AS (
          SELECT n2.node,
                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt
                 + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0) AS pr
          FROM nodes n2 CROSS JOIN nn LEFT JOIN c2 ON n2.node = c2.node
        ), c3 AS (
          SELECT e.dst AS node, sum(CAST(r.pr / d.od AS DECIMAL(38,18))) AS s
          FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        )
        SELECT n2.node,
               (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / cnt
                 + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0) AS pr
        FROM nodes n2 CROSS JOIN nn LEFT JOIN c3 ON n2.node = c3.node
    """,
    "g9_personalized_pr": """
        WITH edges AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'c' || CAST(o_custkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), seeds AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS node
          FROM lineitem WHERE l_suppkey % 10 = 0
        ), ns AS (
          SELECT count(*) AS cnt FROM seeds
        ), nodes AS (
          SELECT n.node,
                 CASE WHEN sd.node IS NOT NULL
                      THEN CAST(1.0 AS DOUBLE) / (SELECT cnt FROM ns)
                      ELSE CAST(0.0 AS DOUBLE) END AS tele
          FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges) n
          LEFT JOIN seeds sd ON n.node = sd.node
        ), deg AS (
          SELECT src, count(*) AS od FROM edges GROUP BY src
        ), r0 AS (
          SELECT node, tele, tele AS pr FROM nodes
        ), c1 AS (
          SELECT e.dst AS node, sum(CAST(r.pr / d.od AS DECIMAL(38,18))) AS s
          FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ), r1 AS (
          SELECT n2.node, n2.tele,
                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n2.tele
                 + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0) AS pr
          FROM nodes n2 LEFT JOIN c1 ON n2.node = c1.node
        ), c2 AS (
          SELECT e.dst AS node, sum(CAST(r.pr / d.od AS DECIMAL(38,18))) AS s
          FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        ), r2 AS (
          SELECT n2.node, n2.tele,
                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n2.tele
                 + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0) AS pr
          FROM nodes n2 LEFT JOIN c2 ON n2.node = c2.node
        ), c3 AS (
          SELECT e.dst AS node, sum(CAST(r.pr / d.od AS DECIMAL(38,18))) AS s
          FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
          GROUP BY e.dst
        )
        SELECT n2.node,
               round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n2.tele
                 + CAST(0.85 AS DOUBLE) * coalesce(CAST(s AS DOUBLE), 0.0), 12) AS rank
        FROM nodes n2 LEFT JOIN c3 ON n2.node = c3.node
    """,
    "p1_contains_ci": """
        SELECT p_partkey, p_type FROM part
        WHERE lower(p_type) LIKE '%econo%'
    """,
    "p2_rlike_bounded": r"""
        SELECT p_partkey, p_name FROM part
        WHERE regexp_matches(p_name, '(?i)(^|\s|_)red(\s|_|$)')
    """,
    "p3_in_list": """
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
    """,
    "p4_eq_ci": """
        SELECT n_nationkey, n_name FROM nation WHERE lower(n_name) = 'nation_7'
    """,
    "p5_first_match": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_mktsegment = 'BUILDING'
        ORDER BY c_name, c_custkey LIMIT 1
    """,
    "p6_date_range": """
        SELECT o_orderkey, o_orderdate FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-07-01 00:00:00'
                              AND TIMESTAMP '1996-06-30 23:59:59.999999'
    """,
    "p7_eq_filter": """
        SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        WHERE l_returnflag = 'R'
    """,
    "p8_projection": """
        SELECT c_mktsegment, c_custkey, c_name FROM customer
    """,
    "p9_drop_tolerant": """
        SELECT p_partkey, p_name, p_type, p_size, p_retailprice FROM part
    """,
    "p10_dup_columns": """
        SELECT n_nationkey, n_name AS dup FROM nation
    """,
    "j1_broadcast_left": """
        SELECT o.o_orderkey, o.o_custkey, c.c_name
        FROM orders o
        LEFT JOIN (SELECT DISTINCT c_custkey AS o_custkey, c_name FROM customer) c
          ON o.o_custkey = c.o_custkey
    """,
    "j2_diff_keys": """
        SELECT cu.c_custkey, cu.c_name, n.n_name
        FROM customer cu
        LEFT JOIN (SELECT DISTINCT n_nationkey, n_name FROM nation) n
          ON cu.c_nationkey = n.n_nationkey
    """,
    "j3_rename_drop": """
        SELECT s.s_suppkey, s.s_name, n.n_name AS supp_nation
        FROM supplier s
        LEFT JOIN (SELECT DISTINCT n_nationkey, n_name FROM nation) n
          ON s.s_nationkey = n.n_nationkey
    """,
    "j4_safe_merge": """
        SELECT na.n_nationkey, na.n_name, r.r_name
        FROM nation na
        LEFT JOIN (SELECT DISTINCT r_regionkey, r_name FROM region) r
          ON na.n_regionkey = r.r_regionkey
    """,
    "j5_fact_dim": """
        SELECT l.l_orderkey, l.l_linenumber, p.p_brand
        FROM lineitem l
        LEFT JOIN (SELECT DISTINCT p_partkey, p_brand FROM part) p
          ON l.l_partkey = p.p_partkey
    """,
    "j6_fact_dim2": """
        SELECT l.l_orderkey, l.l_linenumber, s.s_name
        FROM lineitem l
        LEFT JOIN (SELECT DISTINCT s_suppkey, s_name FROM supplier) s
          ON l.l_suppkey = s.s_suppkey
    """,
    "j7_row_join": """
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, o.o_orderstatus
        FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    "j8_composite_key": """
        WITH dim AS (
          SELECT user_id, event_type, count(*) AS grp_n
          FROM events GROUP BY user_id, event_type
        )
        SELECT e.event_id, e.user_id, e.event_type, d.grp_n
        FROM events e
        LEFT JOIN dim d ON e.user_id = d.user_id AND e.event_type = d.event_type
    """,
    "j9_dict_map": """
        WITH counts AS (
          SELECT user_id, event_type, count(*) AS cnt
          FROM events WHERE event_type IS NOT NULL
          GROUP BY user_id, event_type
        ), ranked AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
          FROM counts
        )
        SELECT e.event_id, e.user_id, r.event_type AS modal_type
        FROM events e
        LEFT JOIN (SELECT user_id, event_type FROM ranked WHERE rn = 1) r
          ON e.user_id = r.user_id
    """,
    "a1_mode": """
        WITH counts AS (
          SELECT user_id, event_type, count(*) AS cnt
          FROM events WHERE event_type IS NOT NULL
          GROUP BY user_id, event_type
        )
        SELECT user_id, event_type AS mode_event_type
        FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
          FROM counts
        ) WHERE rn = 1
    """,
    "a2_min_max": """
        SELECT min(o_orderdate) AS min_o_orderdate, max(o_orderdate) AS max_o_orderdate
        FROM orders
    """,
    "a3_count": """
        SELECT l_returnflag, count(*) AS n_rows FROM lineitem GROUP BY l_returnflag
    """,
    "d1_dedup_projection": """
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    "d2_business_key_dedup": """
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
    "d3_full_row_dedup": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "d4_keep_first": """
        SELECT l_orderkey, l_linenumber, l_partkey FROM (
          SELECT l_orderkey, l_linenumber, l_partkey,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
          FROM lineitem
        ) WHERE rn = 1
    """,
    "e1_clean_headers": """
        SELECT l_orderkey, l_linenumber FROM lineitem
    """,
    "e2_ensure_string": """
        SELECT p_partkey, TRIM(CAST(p_size AS VARCHAR)) AS p_size_str FROM part
    """,
    "e3_strip_decimal": """
        SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS code FROM part
    """,
    "e4_concat_key_nullprop": """
        SELECT o_orderkey,
               TRIM(CAST(o_orderkey AS VARCHAR)) || '-' || NULLIF(o_orderstatus, 'O') AS key
        FROM orders
    """,
    "e5_concat_plain": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS VARCHAR) || o_orderpriority AS pay_event
        FROM orders
    """,
    "e6_prefix": """
        SELECT p_partkey, substr(p_type, 1, 5) AS type_prefix FROM part
    """,
    "e7_split_first": """
        SELECT o_orderkey,
               CASE WHEN strpos(o_orderpriority, '-') > 0
                    THEN TRIM(substr(o_orderpriority, 1, strpos(o_orderpriority, '-') - 1))
                    ELSE TRIM(o_orderpriority) END AS priority_code,
               CASE WHEN strpos(o_orderpriority, '-') > 0
                    THEN TRIM(substr(o_orderpriority, strpos(o_orderpriority, '-') + 1))
                    ELSE '' END AS priority_name,
               CASE WHEN strpos(o_orderstatus, '-') > 0
                    THEN TRIM(substr(o_orderstatus, 1, strpos(o_orderstatus, '-') - 1))
                    ELSE TRIM(o_orderstatus) END AS status_code,
               CASE WHEN strpos(o_orderstatus, '-') > 0
                    THEN TRIM(substr(o_orderstatus, strpos(o_orderstatus, '-') + 1))
                    ELSE '' END AS status_name
        FROM orders
    """,
    "e8_to_ts_coerce": """
        SELECT l_orderkey, l_linenumber,
               TRY_CAST(CASE WHEN l_linenumber = 1 THEN 'not-a-date'
                             ELSE CAST(l_shipdate AS VARCHAR) END AS TIMESTAMP) AS parsed_ts
        FROM lineitem
    """,
    "e9_coalesce": """
        SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'BUILDING'), c_name) AS seg_or_name
        FROM customer
    """,
    "e10_keep_or_replace": """
        SELECT event_id,
               CASE WHEN NULLIF(event_type,'view') IS NOT NULL
                     AND TRIM(NULLIF(event_type,'view')) <> ''
                    THEN NULLIF(event_type,'view') ELSE 'REPLACED' END AS kept
        FROM events
    """,
    "e11_null_blank_default": """
        SELECT o_orderkey,
               CASE WHEN NULLIF(o_orderstatus,'O') IS NULL
                      OR TRIM(CAST(NULLIF(o_orderstatus,'O') AS VARCHAR)) IN ('','nan','NaN')
                    THEN 'INT' ELSE NULLIF(o_orderstatus,'O') END AS adj_code,
               CASE WHEN NULLIF(o_orderstatus,'O') IS NULL
                      OR TRIM(CAST(NULLIF(o_orderstatus,'O') AS VARCHAR)) IN ('','nan','NaN')
                    THEN 'Internal' ELSE o_orderpriority END AS adj_desc
        FROM orders
    """,
    "e12_ensure_column": """
        SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS time_entry FROM region
    """,
    "e13_rename": """
        SELECT o_orderkey AS order_id, o_orderstatus AS status FROM orders
    """,
    "e14_strip_all": """
        -- trim over the full whitespace set: the engine matches pandas
        -- .str.strip() (tabs/newlines too), not SQL TRIM's spaces-only
        SELECT c_custkey,
               TRIM('  ' || c_name || E'\t ', ' ' || E'\t\n\r' || chr(11) || chr(12))
                 AS c_name
        FROM customer
    """,
    "e15_output_contract": """
        SELECT TRIM(CAST(o_orderkey AS VARCHAR)) AS order_key,
               o_orderpriority AS priority,
               CAST(NULL AS VARCHAR) AS missing_thing
        FROM orders
    """,
    "e16_finalize": """
        SELECT TRIM(CAST(o_orderkey AS VARCHAR)) AS o_orderkey,
               TRIM(CAST(CAST(o_totalprice AS DECIMAL(38,2)) AS VARCHAR)) AS o_totalprice,
               o_orderdate AS calc_date
        FROM orders
    """,
    "u1_union_by_name": """
        SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        FROM supplier
    """,
    "v1_fanout_guard": """
        SELECT na.n_nationkey, r.r_name
        FROM nation na
        LEFT JOIN (SELECT DISTINCT r_regionkey, r_name FROM region) r
          ON na.n_regionkey = r.r_regionkey
    """,
    "v2_schema_check": """
        SELECT * FROM customer
    """,
    "v3_tolerant_warnings": """
        SELECT o_custkey, o_orderkey FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
    "v4_table_counts": """
        SELECT * FROM (
          SELECT 'customer' AS table_name, count(*) AS row_count FROM customer
          UNION ALL SELECT 'nation', count(*) FROM nation
          UNION ALL SELECT 'region', count(*) FROM region
          UNION ALL SELECT 'supplier', count(*) FROM supplier
        ) ORDER BY table_name
    """,
    "s2_catalog": r"""
        SELECT regexp_extract(file, '([^/]+)$', 1) AS file_name,
               lower(regexp_extract(file, '(\.[^./]+)$', 1)) AS extension
        FROM glob('/root/testdata/sf0.01/*.parquet')
        ORDER BY file_name
    """,
    "s3_excel_roundtrip": """
        SELECT CAST(n_nationkey AS STRING) AS nationkey,
               n_name AS name,
               CAST(n_regionkey AS STRING) AS regionkey
        FROM nation
    """,
    "s4_csv_scan": """
        SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    "s5_csv_sink": """
        SELECT c_custkey, c_name FROM customer
    """,
    "s7_stamped_name": """
        SELECT 'PUA_Data_Transformed_01152026_1234.csv' AS file_name
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q3_shipping_priority": """
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey ASC
        LIMIT 10
    """,
    "a6_window_analytics": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS order_seq,
               CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prev_price,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "a7_rollup": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "a18_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
    """,
    "a9_cube": """
        SELECT event_type, CAST(year(ts) AS INTEGER) AS yr,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY CUBE (event_type, year(ts))
    """,
    "s11_orc_roundtrip": """
        SELECT doc_id, lang, n_chars FROM documents
    """,
    "s13_partition_prune": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               min(event_id) AS min_event_id,
               max(event_id) AS max_event_id
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type
    """,
    "s16_time_travel": """
        WITH v1 AS (
          SELECT 1 AS version, lang,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars
          FROM documents WHERE lang = 'en' GROUP BY lang
        ), v2 AS (
          SELECT 2 AS version, lang,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars
          FROM documents GROUP BY lang
        )
        SELECT CAST(version AS INTEGER) AS version, lang, n_docs, n_chars FROM v1
        UNION ALL
        SELECT CAST(version AS INTEGER) AS version, lang, n_docs, n_chars FROM v2
    """,
    "s17_evolving_read": """
        WITH ev AS (
          SELECT o_orderkey, o_totalprice,
                 CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS priority
          FROM orders
        )
        SELECT priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               min(o_orderkey) AS min_key,
               max(o_orderkey) AS max_key,
               round(sum(o_totalprice), 2) AS total_price
        FROM ev GROUP BY priority
    """,
    "s18_range_sorted": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               min(o_orderkey) AS min_key,
               max(o_orderkey) AS max_key,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1
    """,
    "s19_vacuum": """
        WITH v3 AS (
          SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS c
          FROM documents WHERE doc_id % 4 = 0
        ), v4 AS (
          SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS c
          FROM documents WHERE doc_id % 5 = 0
        )
        SELECT 0 AS kind, 1 AS version,
               CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS total_chars
        UNION ALL
        SELECT 0, 2, NULL, NULL
        UNION ALL
        SELECT 1, 3, n, c FROM v3
        UNION ALL
        SELECT 1, 4, n, c FROM v4
    """,
    "s20_version_changes": """
        WITH v1 AS (
          SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
        ), v2 AS (
          SELECT doc_id, lang,
                 n_chars + CASE WHEN doc_id % 2 = 0 THEN doc_id % 5 ELSE 0 END AS n_chars
          FROM documents WHERE doc_id % 3 = 0
        ), j AS (
          SELECT coalesce(v2.doc_id, v1.doc_id) AS doc_id,
                 CASE WHEN v1.doc_id IS NULL THEN 'added'
                      WHEN v2.doc_id IS NULL THEN 'removed'
                      WHEN v1.lang IS DISTINCT FROM v2.lang
                        OR v1.n_chars IS DISTINCT FROM v2.n_chars THEN 'changed'
                 END AS change_type
          FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT doc_id, change_type FROM j WHERE change_type IS NOT NULL
    """,
    "s25_cdc_images": """
        WITH v1 AS (
          SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
        ), v2 AS (
          SELECT doc_id, lang,
                 n_chars + CASE WHEN doc_id % 2 = 0 THEN doc_id % 5 ELSE 0 END AS n_chars
          FROM documents WHERE doc_id % 3 = 0
        ), j AS (
          SELECT coalesce(v2.doc_id, v1.doc_id) AS doc_id,
                 v1.lang AS old_lang, v1.n_chars AS old_n_chars,
                 v2.lang AS new_lang, v2.n_chars AS new_n_chars,
                 CASE WHEN v1.doc_id IS NULL THEN 'added'
                      WHEN v2.doc_id IS NULL THEN 'removed'
                      WHEN v1.lang IS DISTINCT FROM v2.lang
                        OR v1.n_chars IS DISTINCT FROM v2.n_chars THEN 'changed'
                 END AS change_type
          FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT doc_id, old_lang, old_n_chars, new_lang, new_n_chars, change_type
        FROM j WHERE change_type IS NOT NULL
    """,
    "v9_profile_drift": """
        WITH a AS (SELECT o_orderstatus, o_custkey, o_orderpriority
                   FROM orders WHERE o_orderkey % 2 = 0),
             b AS (SELECT o_orderstatus, o_custkey, o_orderpriority
                   FROM orders WHERE o_orderkey % 3 = 0),
        pa AS (
          SELECT 'o_orderstatus' AS "column", CAST(count(*) AS BIGINT) AS rows_a,
                 CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_a,
                 CAST(min(o_orderstatus) AS VARCHAR) AS min_a, CAST(max(o_orderstatus) AS VARCHAR) AS max_a
          FROM a
          UNION ALL
          SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
          FROM a
          UNION ALL
          SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
          FROM a
        ), pb AS (
          SELECT 'o_orderstatus' AS "column", CAST(count(*) AS BIGINT) AS rows_b,
                 CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_b,
                 CAST(min(o_orderstatus) AS VARCHAR) AS min_b, CAST(max(o_orderstatus) AS VARCHAR) AS max_b
          FROM b
          UNION ALL
          SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
          FROM b
          UNION ALL
          SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
          FROM b
        )
        SELECT pa."column", rows_a, rows_b, nulls_a, nulls_b,
               min_a <> min_b AS min_drifted,
               max_a <> max_b AS max_drifted
        FROM pa JOIN pb ON pa."column" = pb."column"
    """,
    "s14_compact": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS min_doc_id,
               max(doc_id) AS max_doc_id
        FROM documents GROUP BY lang
    """,
    "d6_merge_upsert": """
        WITH base AS (
          SELECT o_orderkey, o_orderstatus,
                 CAST(1 AS BIGINT) AS version, 0 AS src
          FROM orders WHERE o_orderkey % 3 <> 0
        ), upd AS (
          SELECT o_orderkey, 'U' AS o_orderstatus,
                 CAST(2 AS BIGINT) AS version, 1 AS src
          FROM orders WHERE o_orderkey % 2 = 0
        ), u AS (
          SELECT * FROM base UNION ALL SELECT * FROM upd
        ), r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY o_orderkey
                   ORDER BY version DESC, src DESC) AS rn
          FROM u
        )
        SELECT o_orderkey, o_orderstatus, version FROM r WHERE rn = 1
    """,
    "d7_merge_additive": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(user_id) AS BIGINT) AS user_id_sum
        FROM events GROUP BY event_type
    """,
    "a10_exact_median": """
        SELECT event_type, quantile_cont(value, 0.5) AS median_value
        FROM events GROUP BY event_type
    """,
    "j19_pit_lookup": """
        WITH log AS (
          SELECT o_custkey AS custkey, o_orderdate AS obs_date,
                 o_orderkey AS obs_id, o_orderpriority AS priority
          FROM orders
        ), flagged AS (
          SELECT custkey, obs_date, obs_id, priority,
                 (row_number() OVER w = 1
                  OR priority IS DISTINCT FROM lag(priority) OVER w) AS new_run
          FROM log
          WINDOW w AS (PARTITION BY custkey ORDER BY obs_date ASC, obs_id ASC)
        ), hist AS (
          SELECT custkey, priority,
                 obs_date AS valid_from,
                 lead(obs_date) OVER (PARTITION BY custkey
                                      ORDER BY obs_date ASC, obs_id ASC) AS valid_to
          FROM flagged WHERE new_run
        ), facts AS (
          SELECT l_orderkey, l_linenumber, o_custkey AS custkey, l_shipdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.l_shipdate,
               h.priority AS pit_priority
        FROM facts f
        LEFT JOIN hist h
          ON f.custkey = h.custkey
         AND h.valid_from <= f.l_shipdate
         AND f.l_shipdate < coalesce(h.valid_to, DATE '9999-12-31')
    """,
    "j18_linkage": """
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               a.c_nationkey AS block,
               (a.c_mktsegment = b.c_mktsegment) AS agree_c_mktsegment,
               (abs(a.c_acctbal - b.c_acctbal) <= 50.0) AS agree_c_acctbal,
               (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1.0 ELSE -0.5 END
                + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 50.0 THEN 1.0 ELSE -0.5 END)
               AS score
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1.0 ELSE -0.5 END
               + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 50.0 THEN 1.0 ELSE -0.5 END)
              >= 1.5
    """,
    "d8_scd2": """
        WITH log AS (
          SELECT o_custkey AS custkey, o_orderdate AS obs_date,
                 o_orderkey AS obs_id, o_orderpriority AS priority
          FROM orders
        ), flagged AS (
          SELECT custkey, obs_date, obs_id, priority,
                 (row_number() OVER w = 1
                  OR priority IS DISTINCT FROM lag(priority) OVER w) AS new_run
          FROM log
          WINDOW w AS (PARTITION BY custkey ORDER BY obs_date ASC, obs_id ASC)
        ), runs AS (
          SELECT custkey, obs_date, obs_id, priority
          FROM flagged WHERE new_run
        )
        SELECT custkey, priority,
               obs_date AS valid_from,
               lead(obs_date) OVER (PARTITION BY custkey
                                    ORDER BY obs_date ASC, obs_id ASC) AS valid_to,
               lead(obs_date) OVER (PARTITION BY custkey
                                    ORDER BY obs_date ASC, obs_id ASC) IS NULL AS is_current
        FROM runs
    """,
    "d5_snapshot_diff": """
        WITH old AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 5 != 0
        ), new AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        )
        SELECT coalesce(new.o_orderkey, old.o_orderkey) AS o_orderkey,
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                      OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                    THEN 'changed' END AS change_type
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
        WHERE CASE WHEN old.o_orderkey IS NULL THEN 'added'
                   WHEN new.o_orderkey IS NULL THEN 'removed'
                   WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                     OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                   THEN 'changed' END IS NOT NULL
    """,
    "v7_expectations": """
        WITH m AS (
          SELECT count(*) AS n,
                 count(DISTINCT o_orderkey) AS uniq,
                 sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls,
                 sum(CASE WHEN o_totalprice IS NOT NULL
                           AND (o_totalprice < 0 OR o_totalprice > 1000000)
                          THEN 1 ELSE 0 END) AS oor,
                 sum(CASE WHEN o_orderpriority IS NOT NULL
                           AND o_orderpriority NOT IN
                               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                          THEN 1 ELSE 0 END) AS oos
          FROM orders
        )
        SELECT 'unique' AS rule, 'o_orderkey' AS "column",
               CAST(uniq AS DOUBLE) / n AS metric, 1.0 AS threshold,
               uniq = n AS passed FROM m
        UNION ALL
        SELECT 'not_null', 'o_custkey', CAST(nulls AS DOUBLE) / n, 0.0,
               nulls = 0 FROM m
        UNION ALL
        SELECT 'in_range', 'o_totalprice', CAST(oor AS DOUBLE), 0.0,
               oor = 0 FROM m
        UNION ALL
        SELECT 'in_set', 'o_orderpriority', CAST(oos AS DOUBLE), 0.0,
               oos = 0 FROM m
        UNION ALL
        SELECT 'min_rows', '*', CAST(n AS DOUBLE), 100.0, n >= 100 FROM m
    """,
    "a20_winsorize": """
        WITH q AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS qlo,
                 quantile_cont(value, 0.95) AS qhi
          FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               least(greatest(e.value, q.qlo), q.qhi) AS value_wins
        FROM events e JOIN q USING (event_type)
    """,
    "a21_robust_zscore": """
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS m
          FROM events GROUP BY event_type
        ), mad AS (
          SELECT e.event_type, quantile_cont(abs(e.value - med.m), 0.5) AS md
          FROM events e JOIN med USING (event_type) GROUP BY e.event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               CASE WHEN mad.md > 0
                    THEN (e.value - med.m) / (1.4826 * mad.md)
                    ELSE 0.0 END AS robust_z
        FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
    """,
    "v6_profile_table": """
        SELECT 'o_orderstatus' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(min(o_orderstatus) AS VARCHAR) AS min_str,
               CAST(max(o_orderstatus) AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders
    """,
    "v5_skew_report": """
        WITH counts AS (
          SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY l_suppkey
        ), ranked AS (
          SELECT l_suppkey, n_rows,
                 row_number() OVER (ORDER BY n_rows DESC, l_suppkey) AS rank
          FROM counts
        )
        SELECT l_suppkey, n_rows, rank,
               n_rows / (SELECT sum(n_rows) FROM counts) AS share
        FROM ranked WHERE rank <= 20
    """,
    "a8_pivot": """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "a23_pivot_dynamic": """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "j11_semi_join": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > TIMESTAMP '1998-06-30 00:00:00')
        GROUP BY o_orderpriority
    """,
    "j12_anti_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
    """,
    "j13_full_outer": """
        WITH cnt AS (
          SELECT o_custkey, count(*) AS n_urgent
          FROM orders WHERE o_orderpriority = '1-URGENT'
          GROUP BY o_custkey
        )
        SELECT COALESCE(c.c_custkey, cnt.o_custkey) AS cust_id,
               c.c_mktsegment, cnt.n_urgent
        FROM customer c FULL OUTER JOIN cnt ON c.c_custkey = cnt.o_custkey
    """,
    "a12_unpivot": """
        WITH src AS (
          SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem WHERE l_orderkey % 50 = 0
        )
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
    """,
    "u2_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    "u3_except": """
        SELECT p_partkey AS partkey FROM part
        EXCEPT
        SELECT l_partkey FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1996-03-02 00:00:00'
    """,
    "q14_promo_share": """
        SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
               / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-03-01 00:00:00'
                               AND TIMESTAMP '1996-03-31 23:59:59.999999'
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-10-01 00:00:00'
                                AND TIMESTAMP '1996-12-31 23:59:59.999999'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey ASC
        LIMIT 20
    """,
    "q5_nation_volume": """
        SELECT n.n_name,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1996-12-31 23:59:59.999999'
        GROUP BY n.n_name
    """,
    "q7_nation_trade": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
        GROUP BY supp_nation, cust_nation, ship_year
    """,
    "q8_market_share": """
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS mkt_share
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        GROUP BY o_year
    """,
    "q13_order_distribution": """
        SELECT CAST(c_count AS BIGINT) AS c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    "q15_top_supplier": """
        WITH srev AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total_rev_dec AS DOUBLE) AS total_rev
        FROM srev r
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev_dec = (SELECT max(total_rev_dec) FROM srev)
    """,
    "q17_small_qty_revenue": """
        SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 2.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#13'
          AND l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                                    WHERE l2.l_partkey = p.p_partkey)
    """,
    "q18_large_orders": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               CAST(b.total_qty_dec AS DOUBLE) AS total_qty
        FROM (
            SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty_dec
            FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
        ) b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 100
    """,
    "q19_disjunctive": """
        SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q12_priority_class": """
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1996-12-31 23:59:59.999999'
        GROUP BY l.l_returnflag
    """,
    "q16_supplier_variety": """
        SELECT p.p_brand, p.p_size, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_type <> 'PROMO'
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
    """,
    "q20_excess_shippers": """
        SELECT s_suppkey, s_name, s_nationkey
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 60
        )
    """,
    "q22_dormant_wealthy": """
        WITH t AS (
            SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, CAST(count(*) AS BIGINT) AS n
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer c, t
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * t.n > t.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%ol%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate)
    """,
    "q11_important_stock": """
        WITH per_part AS (
          SELECT n_name AS nation, l_partkey AS partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS val_dec
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name, l_partkey
        )
        SELECT nation, partkey, CAST(val_dec AS DOUBLE) AS value
        FROM per_part
        WHERE val_dec * 10000 > (SELECT sum(val_dec) FROM per_part)
    """,
    "q21_waiting_supplier": """
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                          THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY l_orderkey, l_suppkey
        ), st AS (
          SELECT l_suppkey, late,
                 count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                 sum(late) OVER (PARTITION BY l_orderkey) AS n_late
          FROM lo
        )
        SELECT s_name, count(*) AS numwait
        FROM st
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE late = 1 AND n_supp >= 2 AND n_late = 1 AND n_name = 'NATION_3'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 100
    """,
    "q2_min_cost_supplier": """
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             j AS (
                 SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal
                 FROM pairs pr
                 JOIN part p ON pr.l_partkey = p.p_partkey
                 JOIN supplier s ON pr.l_suppkey = s.s_suppkey
                 WHERE p.p_size BETWEEN 10 AND 20
             )
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
        FROM j
        WHERE s_acctbal = (SELECT min(s_acctbal) FROM j j2
                           WHERE j2.p_partkey = j.p_partkey)
    """,
}

# j18b returns the identical pair set (banded blocking is lossless at
# this threshold) -- certified against the SAME oracle as j18.
CORE_ORACLES["er_pipeline"] = """
    WITH RECURSIVE pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      WHERE (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1.0 ELSE -0.5 END
             + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 50.0 THEN 1.0 ELSE -0.5 END)
            >= 1.5
    ), bidir AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ), nodes AS (
      SELECT id_a AS node FROM pairs UNION SELECT id_b FROM pairs
    ), cc AS (
      SELECT node, node AS label FROM nodes
      UNION
      SELECT bidir.b AS node, cc.label
      FROM cc JOIN bidir ON cc.node = bidir.a
    ), labels AS (
      SELECT node, min(label) AS component FROM cc GROUP BY node
    ), members AS (
      SELECT coalesce(l.component, c.c_custkey) AS entity_id,
             c.c_custkey, c.c_mktsegment, c.c_acctbal
      FROM customer c LEFT JOIN labels l ON c.c_custkey = l.node
    ), seg_counts AS (
      SELECT entity_id, c_mktsegment, count(*) AS cnt
      FROM members GROUP BY 1, 2
    ), mode_seg AS (
      SELECT entity_id, c_mktsegment AS mode_segment
      FROM (
        SELECT entity_id, c_mktsegment,
               row_number() OVER (PARTITION BY entity_id
                                  ORDER BY cnt DESC, c_mktsegment ASC) AS rn
        FROM seg_counts
      ) WHERE rn = 1
    ), stats AS (
      SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
             min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
      FROM members GROUP BY entity_id
    )
    SELECT s.entity_id, s.n_members, s.min_bal, s.max_bal, m.mode_segment
    FROM stats s JOIN mode_seg m USING (entity_id)
    WHERE s.n_members >= 2
"""

CORE_ORACLES["w_dau_wau"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), dau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM ud GROUP BY day
    ), support AS (
      SELECT user_id, day + (i * INTERVAL 1 DAY) AS day
      FROM ud CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS i)
    ), wau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM support GROUP BY day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
           CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w USING (day)
"""

CORE_ORACLES["w_hourly_profile"] = """
    WITH per AS (
      SELECT event_type, CAST(date_part('hour', ts) AS INTEGER) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, n,
           CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
    FROM per
"""

CORE_ORACLES["w_inter_event_stats"] = """
    WITH gaps AS (
      SELECT event_type,
             CAST(floor(date_part('epoch', ts - lag(ts) OVER w)) AS BIGINT) AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts ASC, event_id ASC)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_s) AS median_gap_s,
           max(gap_s) AS max_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
"""

CORE_ORACLES["w_unconverted"] = """
    SELECT c.user_id, c.event_id, c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 1 HOUR
      )
"""

CORE_ORACLES["w_session_stats"] = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM flagged
    ), durs AS (
      SELECT user_id,
             CAST(floor(date_part('epoch', max(ts) - min(ts))) AS BIGINT) AS dur_s
      FROM sessions GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY dur_s) AS median_dur_s,
           max(dur_s) AS max_dur_s
    FROM durs GROUP BY user_id
"""

CORE_ORACLES["e20_pad_ids"] = """
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS custkey_padded
    FROM customer
"""

CORE_ORACLES["a37_entropy"] = """
    WITH counts AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), terms AS (
      SELECT user_id,
             CAST(round(
               -(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY user_id) AS DOUBLE))
               * log2(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY user_id) AS DOUBLE)),
               6) AS DECIMAL(18,6)) AS t
      FROM counts
    )
    SELECT user_id, CAST(sum(t) AS DOUBLE) AS entropy_bits
    FROM terms GROUP BY user_id
"""

CORE_ORACLES["a36_dominance"] = """
    WITH counts AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rn,
             sum(n) OVER (PARTITION BY user_id) AS tot
      FROM counts
    )
    SELECT user_id, event_type AS top_type, n AS n_top,
           CAST(tot AS BIGINT) AS n_total,
           CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share
    FROM ranked WHERE rn = 1
"""

CORE_ORACLES["p11_distinct_from"] = """
    SELECT event_id, user_id, props
    FROM events
    WHERE props IS DISTINCT FROM '{"k": 1}'
"""

CORE_ORACLES["d11_keep_latest_n"] = """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn <= 3
"""

CORE_ORACLES["d10_burst_dedup"] = """
    WITH flagged AS (
      SELECT event_id, user_id, event_type, ts,
             (lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE) AS keep
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts ASC, event_id ASC)
    )
    SELECT event_id, user_id, event_type, ts FROM flagged WHERE keep
"""

CORE_ORACLES["u4_union_distinct"] = """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
"""

CORE_ORACLES["j21_report_spine"] = """
    WITH spine AS (
      SELECT r.r_regionkey, r.r_name, p.o_orderpriority
      FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    ), facts AS (
      SELECT n.n_regionkey, o.o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT s.r_name AS region, s.o_orderpriority AS priority,
           coalesce(f.n_orders, 0) AS n_orders
    FROM spine s
    LEFT JOIN facts f
      ON s.r_regionkey = f.n_regionkey AND s.o_orderpriority = f.o_orderpriority
"""

CORE_ORACLES["e18_slugify"] = r"""
    SELECT p_partkey, p_name,
           regexp_replace(
             regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
             '^-+|-+$', '', 'g') AS slug
    FROM part
"""

CORE_ORACLES["a33_gini"] = """
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
    ), ranked AS (
      SELECT n, row_number() OVER (ORDER BY n ASC, source ASC) AS i FROM per
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS total,
             CAST(sum(i * n) AS BIGINT) AS iw
      FROM ranked
    )
    SELECT k, total,
           2.0 * CAST(iw AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(total AS DOUBLE))
           - CAST(k + 1 AS DOUBLE) / CAST(k AS DOUBLE) AS gini
    FROM agg
"""

CORE_ORACLES["a32_basket_pairs"] = """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 20
"""

CORE_ORACLES["v8_freshness"] = """
    WITH observed AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_obs
      FROM events GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series((SELECT min(d) FROM observed),
                                    (SELECT max(d) FROM observed),
                                    INTERVAL 1 DAY))::DATE AS d
    ), days AS (
      SELECT strftime(s.d, '%Y-%m-%d') AS day,
             CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_events
      FROM spine s LEFT JOIN observed o ON s.d = o.d
    )
    SELECT day, n_events,
           avg(n_events) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
             AS trailing_mean,
           coalesce(n_events < 0.5 * avg(n_events)
                      OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
                    false) AS is_gap
    FROM days
"""

CORE_ORACLES["w_transitions"] = """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS to_type
      FROM events
    ), mat AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM mat
"""

CORE_ORACLES["a28_string_agg"] = """
    SELECT n_regionkey AS regionkey,
           string_agg(DISTINCT n_name, '|' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM nation GROUP BY n_regionkey
"""

CORE_ORACLES["j18b_linkage_banded"] = CORE_ORACLES["j18_linkage"]

CORE_ORACLES["g10_adamic_adar"] = """
    WITH und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM (
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                        'c' || CAST(o_custkey AS VARCHAR) AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity > 48
      )
      WHERE src <> dst
    ), adj AS (
      SELECT a AS p, b AS n FROM und
      UNION ALL
      SELECT b AS p, a AS n FROM und
    ), deg AS (
      SELECT p, count(*) AS d FROM adj GROUP BY p
    ), wedges AS (
      SELECT a1.n AS x, a2.n AS y, deg.d AS d_p
      FROM adj a1
      JOIN deg ON a1.p = deg.p AND deg.d <= 200
      JOIN adj a2 ON a1.p = a2.p
      WHERE a1.n < a2.n
    ), scored AS (
      SELECT x, y,
             CAST(count(*) AS BIGINT) AS n_common,
             round(CAST(sum(CAST(round(1.0 / ln(d_p), 9)
                                 AS DECIMAL(20,9))) AS DOUBLE), 6) AS aa_score
      FROM wedges GROUP BY x, y
    )
    SELECT x, y, n_common, aa_score
    FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = s.x AND und.b = s.y)
    ORDER BY aa_score DESC, x, y LIMIT 50
"""

CORE_ORACLES["a38_weighted_median"] = """
    WITH src AS (
      SELECT l_returnflag, l_linestatus, l_extendedprice AS v,
             CAST(l_quantity AS DECIMAL(38,6)) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ), c AS (
      SELECT l_returnflag, l_linestatus, v,
             sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
                          ORDER BY v ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot
      FROM src
    )
    SELECT l_returnflag, l_linestatus, min(v) AS weighted_median
    FROM c WHERE cum * 2 >= tot
    GROUP BY l_returnflag, l_linestatus
"""

CORE_ORACLES["g11_modularity"] = """
    WITH edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity > 48
    ), bidir AS (
      SELECT DISTINCT a, b FROM (
        SELECT src AS a, dst AS b FROM edges
        UNION ALL SELECT dst, src FROM edges
      )
    ), nodes AS (
      SELECT DISTINCT a AS node FROM bidir
    ), l0 AS (
      SELECT node, node AS label FROM nodes
    ), c1 AS (
      SELECT bd.a, l.label, count(*) AS c
      FROM bidir bd JOIN l0 l ON bd.b = l.node
      GROUP BY bd.a, l.label
    ), l1 AS (
      SELECT n.node, coalesce(b.label, n.node) AS label
      FROM nodes n LEFT JOIN (
        SELECT a, label FROM (
          SELECT a, label,
                 row_number() OVER (PARTITION BY a ORDER BY c DESC, label) AS rk
          FROM c1
        ) WHERE rk = 1
      ) b ON n.node = b.a
    ), c2 AS (
      SELECT bd.a, l.label, count(*) AS c
      FROM bidir bd JOIN l1 l ON bd.b = l.node
      GROUP BY bd.a, l.label
    ), lab AS (
      SELECT n.node, coalesce(b.label, n.node) AS label
      FROM nodes n LEFT JOIN (
        SELECT a, label FROM (
          SELECT a, label,
                 row_number() OVER (PARTITION BY a ORDER BY c DESC, label) AS rk
          FROM c2
        ) WHERE rk = 1
      ) b ON n.node = b.a
    ), und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    ), m_t AS (
      SELECT count(*) AS m FROM und
    ), tagged AS (
      SELECT la.label AS ca, lb.label AS cb
      FROM und u JOIN lab la ON u.a = la.node JOIN lab lb ON u.b = lb.node
    ), intra AS (
      SELECT ca AS c, count(*) AS e_c FROM tagged WHERE ca = cb GROUP BY 1
    ), deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
      GROUP BY 1
    ), dc AS (
      SELECT lab.label AS c, sum(d) AS d_c
      FROM deg JOIN lab ON deg.n = lab.node GROUP BY 1
    ), per_c AS (
      SELECT dc.c, coalesce(e_c, 0) AS e_c, d_c, m
      FROM dc LEFT JOIN intra ON dc.c = intra.c CROSS JOIN m_t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(m) AS BIGINT) AS m_edges,
           round(CAST(sum(CAST(round(
             e_c / m - (d_c / (2 * m)) * (d_c / (2 * m)),
           9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS modularity
    FROM per_c
"""

CORE_ORACLES["v10_reconcile"] = """
    WITH ev AS (
      SELECT event_id, event_type, value, props FROM events
    ), l AS (
      SELECT * FROM ev WHERE event_id % 103 <> 0
    ), r AS (
      SELECT event_id,
             CASE WHEN event_id % 89 = 0 THEN NULL ELSE event_type END AS event_type,
             CASE WHEN event_id % 97 = 0 THEN value + 1 ELSE value END AS value,
             props
      FROM ev WHERE event_id % 101 <> 0
    ), j AS (
      SELECT l.event_id IS NOT NULL AS in_l, r.event_id IS NOT NULL AS in_r,
             l.event_type AS lt, r.event_type AS rt,
             l.value AS lv, r.value AS rv,
             l.props AS lp, r.props AS rp
      FROM l FULL OUTER JOIN r ON l.event_id = r.event_id
    ), agg AS (
      SELECT
        sum(CASE WHEN in_l AND NOT in_r THEN 1 ELSE 0 END) AS only_left,
        sum(CASE WHEN in_r AND NOT in_l THEN 1 ELSE 0 END) AS only_right,
        sum(CASE WHEN in_l AND in_r THEN 1 ELSE 0 END) AS matched,
        sum(CASE WHEN in_l AND in_r AND lt IS DISTINCT FROM rt THEN 1 ELSE 0 END) AS mm_et,
        sum(CASE WHEN in_l AND in_r AND lv IS DISTINCT FROM rv THEN 1 ELSE 0 END) AS mm_v,
        sum(CASE WHEN in_l AND in_r AND lp IS DISTINCT FROM rp THEN 1 ELSE 0 END) AS mm_p
      FROM j
    )
    SELECT metric, "column", CAST(coalesce(n, 0) AS BIGINT) AS n FROM (
      SELECT 'only_left' AS metric, '' AS "column", only_left AS n FROM agg
      UNION ALL SELECT 'only_right', '', only_right FROM agg
      UNION ALL SELECT 'matched', '', matched FROM agg
      UNION ALL SELECT 'mismatch', 'event_type', mm_et FROM agg
      UNION ALL SELECT 'mismatch', 'value', mm_v FROM agg
      UNION ALL SELECT 'mismatch', 'props', mm_p FROM agg
    ) ORDER BY metric, "column"
"""

CORE_ORACLES["e21_quarantine"] = """
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_id % 17 = 0 THEN substring(props, 1, 4)
                  ELSE props END AS p
      FROM events
    )
    SELECT event_id,
           CASE WHEN try_cast(p AS JSON) IS NULL
                THEN 'quarantined:malformed_json' ELSE 'ok' END AS status,
           CAST(CASE WHEN try_cast(p AS JSON) IS NULL THEN NULL
                     ELSE json_extract(p, '$.k') END AS BIGINT) AS prop_k
    FROM src
"""

CORE_ORACLES["v11_k_anonymity"] = """
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) < 5 AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
"""

CORE_ORACLES["e22_pseudonymize"] = """
    SELECT c_custkey,
           CASE WHEN c_name IS NOT NULL
                THEN sha256('pepper-2024' || CAST(c_name AS VARCHAR)) END AS name_token
    FROM customer
"""

CORE_ORACLES["v12_psi"] = """
    WITH tagged AS (
      SELECT CAST(value AS DOUBLE) AS v,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS s
      FROM events WHERE value IS NOT NULL
    ), bounds AS (
      SELECT min(v) AS lo, max(v) AS hi FROM tagged
    ), counts AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(CAST(floor((v - lo) * 10 / (hi - lo)) AS BIGINT), 9)
             END AS bin,
             CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM tagged CROSS JOIN bounds
      GROUP BY 1
    ), totals AS (
      SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM counts
    )
    SELECT bin, n_a, n_b,
           round(greatest(CAST(n_a AS DOUBLE) / ta, 1e-6), 6) AS share_a,
           round(greatest(CAST(n_b AS DOUBLE) / tb, 1e-6), 6) AS share_b,
           round((greatest(CAST(n_a AS DOUBLE) / ta, 1e-6)
                  - greatest(CAST(n_b AS DOUBLE) / tb, 1e-6))
                 * ln(greatest(CAST(n_a AS DOUBLE) / ta, 1e-6)
                      / greatest(CAST(n_b AS DOUBLE) / tb, 1e-6)), 6) AS psi_term
    FROM counts CROSS JOIN totals
"""

CORE_ORACLES["v13_benford"] = """
    WITH src AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE CAST(o_totalprice AS DOUBLE) > 0
    ), counts AS (
      SELECT CAST(floor(v / pow(10.0, floor(log10(v)))) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM src GROUP BY 1
    ), totals AS (
      SELECT sum(n) AS t FROM counts
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / t, 6) AS observed_share,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected_share,
           round(t * (CAST(n AS DOUBLE) / t - ln(1.0 + 1.0 / digit) / ln(10.0))
                   * (CAST(n AS DOUBLE) / t - ln(1.0 + 1.0 / digit) / ln(10.0))
                 / (ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS chi2_term
    FROM counts CROSS JOIN totals
"""

CORE_ORACLES["v14_l_diversity"] = """
    WITH src AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 3000.0) AS BIGINT) AS bal_bucket
      FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT bal_bucket) AS BIGINT) AS n_sensitive,
           count(DISTINCT bal_bucket) < 3 AS at_risk
    FROM src GROUP BY c_nationkey, c_mktsegment
"""

CORE_ORACLES["llm_sentence_split"] = """
    WITH marked AS (
      SELECT doc_id, replace(text, ' value ', '? ') AS text FROM documents
    ), parts AS (
      SELECT doc_id,
             string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'),
                          chr(1)) AS arr
      FROM marked
    ), exploded AS (
      SELECT doc_id, CAST(s.ord - 1 AS BIGINT) AS sent_idx,
             trim(s.part) AS sentence
      FROM (
        SELECT doc_id,
               unnest(list_transform(arr, (x, i) -> struct_pack(part := x, ord := i))) AS s
        FROM parts
      )
    )
    SELECT doc_id, sent_idx, sentence,
           CAST(length(sentence) AS BIGINT) AS n_chars
    FROM exploded WHERE sentence <> ''
"""

CORE_ORACLES["llm_nfc_normalize"] = """
    WITH injected AS (
      SELECT doc_id,
             replace(text, ' spark ', ' spa' || chr(769) || 'rk ') AS text
      FROM documents
    )
    SELECT doc_id,
           nfc_normalize(text) AS text_norm,
           nfc_normalize(text) <> text AS changed
    FROM injected
"""

CORE_ORACLES["g12_hits"] = """
    WITH edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), a0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) AS a FROM nodes
    ), h1raw AS (
      SELECT e.src AS node, sum(CAST(a.a AS DECIMAL(38,18))) AS hr
      FROM edges e JOIN a0 a ON e.dst = a.node GROUP BY e.src
    ), h1s AS (SELECT sum(hr) AS hs FROM h1raw
    ), h1 AS (
      SELECT node, CAST(hr AS DOUBLE) / CAST(hs AS DOUBLE) AS h
      FROM h1raw CROSS JOIN h1s
    ), a1raw AS (
      SELECT e.dst AS node, sum(CAST(h.h AS DECIMAL(38,18))) AS ar
      FROM edges e JOIN h1 h ON e.src = h.node GROUP BY e.dst
    ), a1s AS (SELECT sum(ar) AS asum FROM a1raw
    ), a1 AS (
      SELECT node, CAST(ar AS DOUBLE) / CAST(asum AS DOUBLE) AS a
      FROM a1raw CROSS JOIN a1s
    ), h2raw AS (
      SELECT e.src AS node, sum(CAST(a.a AS DECIMAL(38,18))) AS hr
      FROM edges e JOIN a1 a ON e.dst = a.node GROUP BY e.src
    ), h2s AS (SELECT sum(hr) AS hs FROM h2raw
    ), h2 AS (
      SELECT node, CAST(hr AS DOUBLE) / CAST(hs AS DOUBLE) AS h
      FROM h2raw CROSS JOIN h2s
    ), a2raw AS (
      SELECT e.dst AS node, sum(CAST(h.h AS DECIMAL(38,18))) AS ar
      FROM edges e JOIN h2 h ON e.src = h.node GROUP BY e.dst
    ), a2s AS (SELECT sum(ar) AS asum FROM a2raw
    ), a2 AS (
      SELECT node, CAST(ar AS DOUBLE) / CAST(asum AS DOUBLE) AS a
      FROM a2raw CROSS JOIN a2s
    )
    SELECT n.node,
           round(coalesce(h2.h, 0.0), 6) AS hub,
           round(coalesce(a2.a, 0.0), 6) AS authority
    FROM nodes n
    LEFT JOIN h2 ON n.node = h2.node
    LEFT JOIN a2 ON n.node = a2.node
"""

CORE_ORACLES["s21_incremental_ingest"] = """
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 2
"""

CORE_ORACLES["s22_forget"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id % 37 <> 0
    GROUP BY event_type
"""

CORE_ORACLES["v16_chi_square_drift"] = """
    WITH tagged AS (
      SELECT coalesce(CAST(event_type AS VARCHAR), 'NULL') AS category,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS s
      FROM events
    ), counts AS (
      SELECT category,
             CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM tagged GROUP BY category
    ), totals AS (
      SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM counts
    )
    SELECT category, n_a, n_b,
           round(CAST(n_a AS DOUBLE) / ta, 6) AS share_a,
           round(CAST(n_b AS DOUBLE) / tb, 6) AS share_b,
           round(
             (n_a - CAST(ta AS DOUBLE) * (n_a + n_b) / CAST(ta + tb AS DOUBLE))
             * (n_a - CAST(ta AS DOUBLE) * (n_a + n_b) / CAST(ta + tb AS DOUBLE))
             / (CAST(ta AS DOUBLE) * (n_a + n_b) / CAST(ta + tb AS DOUBLE))
             + (n_b - CAST(tb AS DOUBLE) * (n_a + n_b) / CAST(ta + tb AS DOUBLE))
               * (n_b - CAST(tb AS DOUBLE) * (n_a + n_b) / CAST(ta + tb AS DOUBLE))
               / (CAST(tb AS DOUBLE) * (n_a + n_b) / CAST(ta + tb AS DOUBLE)), 6) AS chi2_term
    FROM counts CROSS JOIN totals
"""

CORE_ORACLES["j22_spatial_join"] = """
    WITH cust AS (
      SELECT c_custkey AS id_a,
             CAST(c_custkey * 37 % 1000 AS DOUBLE) / 10.0 AS x,
             CAST(c_custkey * 61 % 1000 AS DOUBLE) / 10.0 AS y
      FROM customer
    ), supp AS (
      SELECT s_suppkey AS id_b,
             CAST(s_suppkey * 41 % 1000 AS DOUBLE) / 10.0 AS x,
             CAST(s_suppkey * 53 % 1000 AS DOUBLE) / 10.0 AS y
      FROM supplier
    )
    SELECT c.id_a, s.id_b,
           round(sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)), 6) AS dist
    FROM cust c JOIN supp s
      ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 2.25
"""

CORE_ORACLES["s24_hilbert_profile"] = hilbert_profile_sql(
    "lineitem", "l_partkey", "l_suppkey", bits=16, n_buckets=64
)

CORE_ORACLES["j23_point_in_polygon"] = f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST(c_custkey * 37 % 1000 AS DOUBLE) / 10.0 AS x,
             CAST(c_custkey * 61 % 1000 AS DOUBLE) / 10.0 AS y
      FROM customer
    )
    SELECT id, x, y FROM pts
    WHERE {point_in_polygon_sql([(10, 10), (90, 15), (50, 45), (80, 85), (20, 80), (40, 50)], "x", "y")}
"""

CORE_ORACLES["s23_xlsx_source"] = """
    SELECT CAST(n_nationkey AS VARCHAR) AS nationkey,
           n_name AS name,
           CAST(n_regionkey AS VARCHAR) AS regionkey
    FROM nation
"""

CORE_ORACLES["e24_variant_json"] = """
    SELECT event_type,
           count(*) AS n,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

CORE_ORACLES["j22b_spatial_haversine"] = """
    WITH cust AS (
      SELECT c_custkey AS id_a,
             CAST(c_custkey * 37 % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
             CAST(c_custkey * 61 % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
      FROM customer
    ), supp AS (
      SELECT s_suppkey AS id_b,
             CAST(s_suppkey * 41 % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon,
             CAST(s_suppkey * 53 % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat
      FROM supplier
    ), pairs AS (
      SELECT c.id_a, s.id_b,
             2.0 * 6371.0088 * asin(sqrt(least(1.0,
               sin(radians(s.lat - c.lat) / 2.0) * sin(radians(s.lat - c.lat) / 2.0)
               + cos(radians(c.lat)) * cos(radians(s.lat))
                 * sin(radians(s.lon - c.lon) / 2.0) * sin(radians(s.lon - c.lon) / 2.0)
             ))) AS d
      FROM cust c JOIN supp s ON TRUE
    )
    SELECT id_a, id_b, round(d, 6) AS dist FROM pairs WHERE d <= 200.0
"""

CORE_ORACLES["g13_weighted_pr"] = """
    WITH edges AS (
      SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'c' || CAST(o_custkey AS VARCHAR) AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
      SELECT count(*) AS cnt FROM nodes
    ), deg AS (
      SELECT src, sum(w) AS od FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) / cnt AS pr FROM nodes CROSS JOIN nn
    ), c1 AS (
      SELECT e.dst AS node, sum(CAST(r.pr * e.w / d.od AS DECIMAL(38,18))) AS s
      FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ), r1 AS (
      SELECT n2.node,
             (1.0 - 0.85) / nn.cnt
             + 0.85 * coalesce(CAST(c1.s AS DOUBLE), 0.0) AS pr
      FROM nodes n2 CROSS JOIN nn LEFT JOIN c1 ON n2.node = c1.node
    ), c2 AS (
      SELECT e.dst AS node, sum(CAST(r.pr * e.w / d.od AS DECIMAL(38,18))) AS s
      FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ), r2 AS (
      SELECT n2.node,
             (1.0 - 0.85) / nn.cnt
             + 0.85 * coalesce(CAST(c2.s AS DOUBLE), 0.0) AS pr
      FROM nodes n2 CROSS JOIN nn LEFT JOIN c2 ON n2.node = c2.node
    ), c3 AS (
      SELECT e.dst AS node, sum(CAST(r.pr * e.w / d.od AS DECIMAL(38,18))) AS s
      FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ), r3 AS (
      SELECT n2.node,
             (1.0 - 0.85) / nn.cnt
             + 0.85 * coalesce(CAST(c3.s AS DOUBLE), 0.0) AS pr
      FROM nodes n2 CROSS JOIN nn LEFT JOIN c3 ON n2.node = c3.node
    )
    SELECT node, round(pr, 12) AS rank FROM r3
"""

CORE_ORACLES["e23_mask_shape"] = """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             CAST(c_name AS VARCHAR), '[0-9]', '9', 'g'),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g') AS name_masked,
           regexp_replace(regexp_replace(regexp_replace(
             CAST(c_mktsegment AS VARCHAR), '[0-9]', '9', 'g'),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g') AS segment_masked
    FROM customer
"""

CORE_ORACLES["w_lag_features"] = """
    SELECT event_id, event_type,
           CAST(value AS DOUBLE) AS value,
           lag(CAST(value AS DOUBLE), 1) OVER w AS lag_1,
           lag(CAST(value AS DOUBLE), 7) OVER w AS lag_7
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
"""

# --------------------------------------------------------------------------
# md5-register sketch oracles: the register/cell derivations come verbatim
# from aggregates.hll_*_sql / cms_cell_sql, so DuckDB rebuilds the exact
# sketch Spark builds and the estimates VALUE-check (the a48/s24 pattern).
# --------------------------------------------------------------------------

_HK = "CAST(user_id AS STRING)"

CORE_ORACLES["a17_sketch_union"] = f"""
    WITH regs AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {hll_reg_sql(_HK)} AS reg, MAX({hll_rho_sql(_HK)}) AS m_j
      FROM events GROUP BY 1, 2, 3
    ), merged AS (
      SELECT event_type, reg, MAX(m_j) AS m_j FROM regs GROUP BY 1, 2
    ), n AS (
      SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n_slices
      FROM regs GROUP BY 1
    ), est AS (
      SELECT event_type, {hll_est_sql('m_j')} AS distinct_est
      FROM merged GROUP BY event_type
    )
    SELECT n.event_type, n.n_slices, est.distinct_est
    FROM n JOIN est USING (event_type)
"""

CORE_ORACLES["w_wau_hll"] = f"""
    WITH regs AS (
      SELECT date_trunc('day', ts) AS sl,
             {hll_reg_sql(_HK)} AS reg, MAX({hll_rho_sql(_HK)}) AS m_j
      FROM events GROUP BY 1, 2
    ), contrib AS (
      SELECT sl + (o * INTERVAL 1 DAY) AS day, reg, m_j
      FROM regs CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS o)
    ), win AS (
      SELECT day, reg, MAX(m_j) AS m_j FROM contrib GROUP BY 1, 2
    )
    SELECT day, {hll_est_sql('m_j')} AS wau_est
    FROM win GROUP BY day ORDER BY day
"""

_C19 = "\n        UNION ALL ".join(
    f"SELECT {d} AS d, {cms_cell_sql(_HK, d, 3)} AS cell FROM events"
    for d in range(4)
)
_P19 = "\n        UNION ALL ".join(
    f"SELECT user_id, {d} AS d, {cms_cell_sql(_HK, d, 3)} AS cell FROM probes"
    for d in range(4)
)

CORE_ORACLES["a19_cms_counts"] = f"""
    WITH cells AS (
      SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt FROM (
        {_C19}
      ) GROUP BY 1, 2
    ), probes AS (
      SELECT DISTINCT user_id FROM events
    ), pcells AS (
      {_P19}
    )
    SELECT p.user_id, MIN(c.cnt) AS est
    FROM pcells p JOIN cells c USING (d, cell)
    GROUP BY p.user_id
"""

CORE_ORACLES["a24_quantile_sketch"] = """
    WITH bounds AS (
      SELECT min(CAST(value AS DOUBLE)) AS lo,
             max(CAST(value AS DOUBLE)) AS hi
      FROM events
    ), binned AS (
      SELECT event_type,
             CAST(least(floor(CASE WHEN hi > lo
                  THEN (CAST(value AS DOUBLE) - lo) / (hi - lo)
                  ELSE 0.0 END * 256), 255) AS INTEGER) AS bin
      FROM events CROSS JOIN bounds
    ), merged AS (
      SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
      FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, n,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin)
                  AS BIGINT) AS c,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM merged
    ), hit AS (
      SELECT event_type, q, bin, n, c, tot,
             row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rk
      FROM cum CROSS JOIN (
        SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q
      )
      WHERE CAST(c AS DOUBLE) >= q * CAST(tot AS DOUBLE)
    )
    SELECT event_type, q,
           round(lo + ((CAST(bin AS DOUBLE)
                  + (q * CAST(tot AS DOUBLE) - CAST(c - n AS DOUBLE))
                    / CAST(n AS DOUBLE))
                 / 256.0) * (hi - lo), 6) AS est
    FROM hit CROSS JOIN bounds
    WHERE rk = 1
"""

CORE_ORACLES["s26_sketch_rollup"] = f"""
    -- persisted-sketch rollup: merge-of-max over the day split equals
    -- the global register max, so raw events re-derive the estimate;
    -- n_hist_regs pins the PERSISTED artifact's content
    WITH regs AS (
      SELECT event_type, {hll_reg_sql(_HK)} AS reg, MAX({hll_rho_sql(_HK)}) AS m_j
      FROM events GROUP BY 1, 2
    ), hist AS (
      SELECT event_type,
             CAST(count(DISTINCT {hll_reg_sql(_HK)}) AS BIGINT) AS n_hist_regs
      FROM events WHERE date_part('day', ts) <= 20 GROUP BY 1
    ), est AS (
      SELECT event_type, {hll_est_sql('m_j')} AS distinct_est
      FROM regs GROUP BY event_type
    )
    SELECT h.event_type, h.n_hist_regs, e.distinct_est
    FROM hist h JOIN est e USING (event_type)
"""

CORE_ORACLES["g8_kcore"] = """
    -- k-core peel as a recursive CTE: the working table IS the current
    -- surviving edge set, so each round only needs window degrees over
    -- the previous iteration (the cumulative removed set is never
    -- consulted).  Peel is monotone and idempotent, so iteration 50
    -- (the Spark gate's max_iter) equals the fixpoint; rows simply
    -- re-copy themselves after convergence.
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), und AS (
      SELECT src AS a, dst AS b FROM edges WHERE src <> dst
      UNION
      SELECT dst AS a, src AS b FROM edges WHERE src <> dst
    ), peel(a, b, it) AS (
      SELECT a, b, 0 FROM und
      UNION ALL
      SELECT a, b, it + 1 FROM (
        SELECT a, b, it,
               count(*) OVER (PARTITION BY a) AS da,
               count(*) OVER (PARTITION BY b) AS db
        FROM peel
      )
      WHERE da >= 3 AND db >= 3 AND it < 50
    )
    SELECT a AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM peel WHERE it = 50
    GROUP BY a
    HAVING count(*) >= 3
"""

CORE_ORACLES["s27_bucketed_join"] = """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
"""

CORE_ORACLES["s28_dpp_join"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE length(event_type) <= 5
    GROUP BY event_type
"""

CORE_ORACLES["s31_zonemap_prune"] = """
    SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate <= DATE '1996-06-30'
    GROUP BY 1
"""

CORE_ORACLES["s32_compaction"] = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem
    GROUP BY l_returnflag
"""

CORE_ORACLES["g15_scc"] = """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity > 48
      UNION
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity < 3
    ), nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), reach AS (
      SELECT src AS a, dst AS b FROM edges
      UNION
      SELECT reach.a, edges.dst AS b FROM reach JOIN edges ON reach.b = edges.src
    ), mutual AS (
      SELECT r1.a AS node, r1.b AS m
      FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    )
    SELECT node, min(m) AS scc_id FROM (
      SELECT node, node AS m FROM nodes
      UNION ALL
      SELECT node, m FROM mutual
    ) GROUP BY node
"""

# Sampled Brandes betweenness replayed exactly: the depth cap (4) makes
# the two-phase recurrence UNROLLABLE -- four forward BFS/sigma levels
# (two-level seen check, valid for the undirected edge set) and four
# backward dependency folds, all materialized CTEs; mirrors
# graph.betweenness_approx for the g14 gate inputs.
CORE_ORACLES["g14_betweenness"] = """
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity > 48
    ), bedges AS MATERIALIZED (
      SELECT src AS a, dst AS b FROM edges
      UNION
      SELECT dst AS a, src AS b FROM edges
    ), lvl0 AS MATERIALIZED (
      SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS s,
             's' || CAST(s_suppkey AS VARCHAR) AS node,
             CAST(1 AS DOUBLE) AS sigma
      FROM supplier WHERE s_suppkey % 50 = 0
    ), lvl1 AS MATERIALIZED (
      SELECT f.s, e.b AS node, sum(f.sigma) AS sigma
      FROM lvl0 f JOIN bedges e ON f.node = e.a
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT s, node FROM lvl0) seen
        WHERE seen.s = f.s AND seen.node = e.b
      )
      GROUP BY f.s, e.b
    ), lvl2 AS MATERIALIZED (
      SELECT f.s, e.b AS node, sum(f.sigma) AS sigma
      FROM lvl1 f JOIN bedges e ON f.node = e.a
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT s, node FROM lvl1 UNION ALL SELECT s, node FROM lvl0) seen
        WHERE seen.s = f.s AND seen.node = e.b
      )
      GROUP BY f.s, e.b
    ), lvl3 AS MATERIALIZED (
      SELECT f.s, e.b AS node, sum(f.sigma) AS sigma
      FROM lvl2 f JOIN bedges e ON f.node = e.a
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT s, node FROM lvl2 UNION ALL SELECT s, node FROM lvl1) seen
        WHERE seen.s = f.s AND seen.node = e.b
      )
      GROUP BY f.s, e.b
    ), lvl4 AS MATERIALIZED (
      SELECT f.s, e.b AS node, sum(f.sigma) AS sigma
      FROM lvl3 f JOIN bedges e ON f.node = e.a
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT s, node FROM lvl3 UNION ALL SELECT s, node FROM lvl2) seen
        WHERE seen.s = f.s AND seen.node = e.b
      )
      GROUP BY f.s, e.b
    ), acc4 AS MATERIALIZED (SELECT s, node, sigma, CAST(0 AS DOUBLE) AS delta FROM lvl4), contrib3 AS MATERIALIZED (
      SELECT c.s, c.node, sum((c.sigma / a.sigma) * (1.0 + a.delta)) AS delta
      FROM lvl3 c JOIN bedges e ON c.node = e.a
      JOIN acc4 a ON a.s = c.s AND a.node = e.b
      GROUP BY c.s, c.node
    ), acc3 AS MATERIALIZED (
      SELECT c.s, c.node, c.sigma, coalesce(x.delta, 0.0) AS delta
      FROM lvl3 c LEFT JOIN contrib3 x ON x.s = c.s AND x.node = c.node
    ), contrib2 AS MATERIALIZED (
      SELECT c.s, c.node, sum((c.sigma / a.sigma) * (1.0 + a.delta)) AS delta
      FROM lvl2 c JOIN bedges e ON c.node = e.a
      JOIN acc3 a ON a.s = c.s AND a.node = e.b
      GROUP BY c.s, c.node
    ), acc2 AS MATERIALIZED (
      SELECT c.s, c.node, c.sigma, coalesce(x.delta, 0.0) AS delta
      FROM lvl2 c LEFT JOIN contrib2 x ON x.s = c.s AND x.node = c.node
    ), contrib1 AS MATERIALIZED (
      SELECT c.s, c.node, sum((c.sigma / a.sigma) * (1.0 + a.delta)) AS delta
      FROM lvl1 c JOIN bedges e ON c.node = e.a
      JOIN acc2 a ON a.s = c.s AND a.node = e.b
      GROUP BY c.s, c.node
    ), acc1 AS MATERIALIZED (
      SELECT c.s, c.node, c.sigma, coalesce(x.delta, 0.0) AS delta
      FROM lvl1 c LEFT JOIN contrib1 x ON x.s = c.s AND x.node = c.node
    ), contrib0 AS MATERIALIZED (
      SELECT c.s, c.node, sum((c.sigma / a.sigma) * (1.0 + a.delta)) AS delta
      FROM lvl0 c JOIN bedges e ON c.node = e.a
      JOIN acc1 a ON a.s = c.s AND a.node = e.b
      GROUP BY c.s, c.node
    ), acc0 AS MATERIALIZED (
      SELECT c.s, c.node, c.sigma, coalesce(x.delta, 0.0) AS delta
      FROM lvl0 c LEFT JOIN contrib0 x ON x.s = c.s AND x.node = c.node
    )
    SELECT node, round(sum(delta), 6) AS betweenness
    FROM (SELECT s, node, delta FROM acc0 UNION ALL SELECT s, node, delta FROM acc1 UNION ALL SELECT s, node, delta FROM acc2 UNION ALL SELECT s, node, delta FROM acc3 UNION ALL SELECT s, node, delta FROM acc4) d
    WHERE s <> node
    GROUP BY node
"""

from .report import dp_noise_sql as _dp_noise_sql

CORE_ORACLES["v17_dp_counts"] = f"""
    SELECT event_type,
           round(count(*) + {_dp_noise_sql("event_type", epsilon=1.0, seed=7)}, 6)
             AS noisy_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM events
    GROUP BY event_type
"""

CORE_ORACLES["w_seasonal_decompose"] = """
    WITH ev AS (
      SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour, value FROM events
    ), o AS (
      SELECT event_type,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*), 6) AS m
      FROM ev GROUP BY event_type
    ), h AS (
      SELECT ev.event_type, ev.hour,
             CAST(count(*) AS BIGINT) AS n_events,
             sum(CAST(value AS DECIMAL(18,6))) AS hs
      FROM ev GROUP BY ev.event_type, ev.hour
    ), h2 AS (
      SELECT h.event_type, h.hour, h.n_events,
             round(CAST(hs AS DOUBLE) / n_events - o.m, 6) AS hour_effect
      FROM h JOIN o ON h.event_type = o.event_type
    ), rows_r AS (
      SELECT ev.event_type, ev.hour,
             round(ev.value - o.m - h2.hour_effect, 6) AS r
      FROM ev
      JOIN o ON ev.event_type = o.event_type
      JOIN h2 ON ev.event_type = h2.event_type AND ev.hour = h2.hour
    ), sig AS (
      SELECT event_type,
             round(sqrt(CAST(sum(CAST(r * r AS DECIMAL(38,12))) AS DOUBLE)
                        / count(*)), 6) AS sg
      FROM rows_r GROUP BY event_type
    ), anom AS (
      SELECT r.event_type, r.hour,
             CAST(sum(CASE WHEN abs(r.r) > 2 * sig.sg THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_anomalies
      FROM rows_r r JOIN sig ON r.event_type = sig.event_type
      GROUP BY r.event_type, r.hour
    )
    SELECT h2.event_type, h2.hour, h2.n_events, h2.hour_effect, anom.n_anomalies
    FROM h2 JOIN anom ON h2.event_type = anom.event_type AND h2.hour = anom.hour
"""

CORE_ORACLES["s29_join_ivm"] = """
    SELECT c.c_mktsegment, o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderpriority
"""

CORE_ORACLES["s30_join_ivm_zset"] = """
    SELECT c.c_mktsegment, o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE NOT (o.o_orderkey % 7 = 0 AND day(o.o_orderdate) <= 10)
      AND c.c_custkey % 2 = 0
    GROUP BY c.c_mktsegment, o.o_orderpriority
"""

CORE_ORACLES["w_mk_trend"] = """
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.k, CAST(sum(sign(b.v - a.v)) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
      GROUP BY a.k
    ), n AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY k
    ), ties AS (
      SELECT k, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT k, v, count(*) AS t FROM daily GROUP BY k, v)
      GROUP BY k
    ), base AS (
      SELECT n.k, n.n_days, ties.tie_term, s.s_stat,
             (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term)
               / 18.0 AS var_s
      FROM n JOIN ties ON n.k = ties.k JOIN s ON n.k = s.k
    )
    SELECT k AS event_type, n_days, s_stat,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z,
           CAST(sign(s_stat) AS BIGINT) AS trend
    FROM base
"""

CORE_ORACLES["w_theil_sen"] = """
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.k,
             round((b.v - a.v) / CAST(b.d - a.d AS DOUBLE), 9) AS slope
      FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
    ), ranked AS (
      SELECT k, slope,
             row_number() OVER (PARTITION BY k ORDER BY slope) AS rn,
             count(*) OVER (PARTITION BY k) AS m
      FROM slopes
    )
    SELECT k AS event_type, CAST(m AS BIGINT) AS n_pairs,
           slope AS slope_per_day
    FROM ranked WHERE rn = CAST(ceil(m / 2.0) AS BIGINT)
"""

CORE_ORACLES["w_acf"] = """
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS svv
      FROM daily GROUP BY k
    ), lagged AS (
      SELECT a.k, b.d - a.d AS lag,
             CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(a.v * b.v) AS BIGINT) AS s11,
             CAST(sum(a.v) AS BIGINT) AS s1a,
             CAST(sum(b.v) AS BIGINT) AS s1b
      FROM daily a JOIN daily b ON a.k = b.k AND b.d - a.d BETWEEN 1 AND 7
      GROUP BY a.k, b.d - a.d
    )
    SELECT l.k AS event_type, CAST(l.lag AS BIGINT) AS lag, l.n_k,
           round((l.s11 - (t.sv / CAST(t.n AS DOUBLE)) * (l.s1a + l.s1b)
                  + l.n_k * (t.sv / CAST(t.n AS DOUBLE))
                         * (t.sv / CAST(t.n AS DOUBLE)))
                 / (t.svv - CAST(t.sv AS DOUBLE) * t.sv / t.n), 6) AS acf
    FROM lagged l JOIN tot t ON l.k = t.k
"""

CORE_ORACLES["g16_bipartite_projection"] = """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, o_custkey AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity > 48
    ), kept AS (
      SELECT s, d FROM e
      WHERE d IN (SELECT d FROM e GROUP BY d HAVING count(*) <= 50)
    )
    SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS weight
    FROM kept a JOIN kept b ON a.d = b.d AND a.s < b.s
    GROUP BY a.s, b.s
    HAVING count(*) >= 2
"""

CORE_ORACLES["w_runs_test"] = """
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT k, v AS m FROM (
        SELECT k, v,
               row_number() OVER (PARTITION BY k ORDER BY v, d) AS rn,
               count(*) OVER (PARTITION BY k) AS n
        FROM daily
      ) WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    ), lab AS (
      SELECT daily.k, daily.d,
             CASE WHEN daily.v > med.m THEN 1 ELSE 0 END AS a
      FROM daily JOIN med ON daily.k = med.k
    ), runs AS (
      SELECT k,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(a) AS BIGINT) AS n_above,
             CAST(sum(CASE WHEN prev IS NULL OR a <> prev THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_runs
      FROM (SELECT k, a, lag(a) OVER (PARTITION BY k ORDER BY d) AS prev
            FROM lab)
      GROUP BY k
    )
    SELECT k AS event_type, n_days, n_above, n_runs,
           round(2.0 * n_above * (n_days - n_above) / n_days + 1, 6)
             AS expected_runs,
           round(CASE WHEN 2.0 * n_above * (n_days - n_above)
                           * (2.0 * n_above * (n_days - n_above) - n_days)
                           / (CAST(n_days AS DOUBLE) * n_days * (n_days - 1)) > 0
                      THEN (n_runs - (2.0 * n_above * (n_days - n_above)
                                      / n_days + 1))
                           / sqrt(2.0 * n_above * (n_days - n_above)
                                  * (2.0 * n_above * (n_days - n_above) - n_days)
                                  / (CAST(n_days AS DOUBLE) * n_days
                                     * (n_days - 1)))
                      ELSE 0.0 END, 6) AS z
    FROM runs
"""
