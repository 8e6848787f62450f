"""Oracle SQL, part 1: corpus/index/graph/pagerank/window twins.

DuckDB twins of the declared queries; split verbatim from the original
build_oracles() in round 6 — zero behavior change. ``contribute``
mutates the shared oracles dict.
"""

from __future__ import annotations


from page_rank_hadoop_spark.plans.registry._shared import (
    DF_CUTOFF_DECLARED,
    LOOKUP_TERMS,
    SQL_GRAPH_CTES,
    SQL_TOKENS,
    SQL_TOKEN_STREAM,
    TFIDF_TERMS,
    _sql_minhash_ctes,
    _sql_pagerank_converged,
    _sql_pagerank_iters,
    _sql_ppr_iters,
)

from page_rank_hadoop_spark.plans.registry.queries_analytics import (
    _LANG_MARKERS_SQL,
    _STOPWORDS_SQL,
)


def contribute(oracles: dict[str, str]) -> None:
    terms_in = ", ".join(f"'{t}'" for t in TFIDF_TERMS)
    lookup_in = ", ".join(f"'{t}'" for t in LOOKUP_TERMS)
    pr_iters = _sql_pagerank_iters(10)
    oracles["q_scan_project"] = "SELECT doc_id, lang, source, n_chars FROM documents"

    oracles["q_filter_predicate"] = (
        "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' AND n_chars >= 300"
    )

    oracles["q_tokenize_explode"] = SQL_TOKEN_STREAM

    oracles["q_term_tf"] = f"""
      SELECT term, doc_id, count(*)::INT AS tf FROM ({SQL_TOKEN_STREAM}) GROUP BY term, doc_id
    """

    oracles["q_inverted_index_df"] = f"""
      SELECT term, count(DISTINCT doc_id)::INT AS df
      FROM ({SQL_TOKEN_STREAM}) GROUP BY term HAVING count(DISTINCT doc_id) < {DF_CUTOFF_DECLARED}
    """

    oracles["q_postings_collect"] = f"""
      WITH tf AS (
        SELECT term, doc_id, count(*)::INT AS tf, list(pos ORDER BY pos) AS positions
        FROM ({SQL_TOKEN_STREAM}) GROUP BY term, doc_id
      )
      SELECT term, count(*)::INT AS df,
             to_json(list_sort(list({{'doc_id': doc_id, 'tf': tf, 'positions': positions}}))) AS postings_json
      FROM tf GROUP BY term HAVING count(*) < {DF_CUTOFF_DECLARED}
    """

    oracles["q_point_lookup_term"] = f"""
      SELECT term, count(DISTINCT doc_id)::INT AS df
      FROM ({SQL_TOKEN_STREAM}) WHERE term IN ({lookup_in}) GROUP BY term
    """

    oracles["q_snippet_window"] = """
      SELECT doc_id,
             substr(text, greatest(strpos(text, 'spark') - 20, 1), 50) AS snippet
      FROM documents WHERE strpos(text, 'spark') > 0
    """

    oracles["q_edges_extract"] = f"WITH {SQL_GRAPH_CTES} SELECT src, dst FROM edges"

    oracles["q_semi_join_vertices"] = f"WITH {SQL_GRAPH_CTES} SELECT src, dst FROM kept"

    oracles["q_anti_join_vertices"] = f"""
      WITH {SQL_GRAPH_CTES}
      SELECT src, dst FROM edges WHERE dst NOT IN (SELECT id FROM verts)
    """

    oracles["q_union_null_edges"] = f"WITH {SQL_GRAPH_CTES} SELECT src, dst FROM aug"

    oracles["q_adjacency_list"] = f"""
      WITH {SQL_GRAPH_CTES},
      raw AS (SELECT src AS id, list_sort(list(dst)) AS l FROM aug GROUP BY src)
      SELECT id,
             to_json(CASE WHEN len(l) > 1 THEN list_filter(l, x -> x <> -1) ELSE l END) AS links_json
      FROM raw
    """

    oracles["q_outdegree"] = f"""
      WITH {SQL_GRAPH_CTES} SELECT src AS id, outdeg::INT AS outdeg FROM deg
    """

    oracles["q_pagerank_contribs"] = f"""
      WITH {SQL_GRAPH_CTES}
      SELECT e.dst AS id, round(sum(1.0::DOUBLE / dg.outdeg), 6) AS contrib
      FROM fedges e JOIN deg dg ON e.src = dg.src GROUP BY e.dst
    """

    oracles["q_pagerank_iterate"] = f"""
      WITH {SQL_GRAPH_CTES},
      {pr_iters}
      SELECT id, round(pr, 6) AS pr FROM it10
    """

    # round 5: the adaptive-policy query graduates from rows-only to a
    # full oracle — the capped chain is unrolled and the stop rule
    # (min 10, avgChange <= 0.2, cap 50) is evaluated in SQL
    oracles["q_pagerank_converged"] = f"""
      WITH {SQL_GRAPH_CTES},
      {_sql_pagerank_converged()}
    """

    oracles["q_topk_pagerank"] = f"""
      WITH {SQL_GRAPH_CTES},
      {pr_iters}
      SELECT id, round(pr, 6) AS pr FROM it10 ORDER BY round(pr, 6) DESC, id LIMIT 20
    """

    oracles["q_tfidf_score"] = f"""
      WITH {SQL_GRAPH_CTES},
      {pr_iters},
      tf AS (
        SELECT term, doc_id, count(*)::INT AS tf FROM ({SQL_TOKEN_STREAM})
        WHERE term IN ({terms_in}) GROUP BY term, doc_id
      ),
      dfreq AS (
        SELECT term, count(DISTINCT doc_id)::INT AS df FROM ({SQL_TOKEN_STREAM})
        WHERE term IN ({terms_in}) GROUP BY term
      )
      SELECT tf.term, tf.doc_id,
             round(0.5 * tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / dfreq.df)
                   + 0.5 * r.pr, 6) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term JOIN it10 r ON tf.doc_id = r.id
    """

    # round 8: Kafka wire round-trip — the decode must reproduce the
    # documents row plus the doc_id-derived broker timestamp in exact
    # integer microseconds (the verify-skill µs rule)
    oracles["q_kafka_feed_parse"] = """
      SELECT doc_id, text, lang, source, n_chars,
             (1700000000 + doc_id) * 1000000 AS kafka_ts_us
      FROM documents
    """

    # round 8: the cursor-served search path shares the tfidf oracle
    # VERBATIM — one oracle, two physical paths (Spark job vs
    # PointLookupCursor client scoring), the pregel-twin precedent
    oracles["q_serving_search"] = oracles["q_tfidf_score"]

    oracles["q_text_stats"] = f"""
      SELECT lang, source, count(*) AS n_docs,
             round(avg(n_chars), 6) AS avg_chars,
             round(avg(len({SQL_TOKENS})), 6) AS avg_tokens
      FROM documents GROUP BY lang, source
    """

    oracles["q_grouping_sets"] = """
      SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
             count(*) AS n_docs
      FROM documents GROUP BY ROLLUP(lang, source)
    """

    oracles["q_doc_profile"] = f"""
      WITH base AS (
        SELECT doc_id, lang, text, n_chars, {SQL_TOKENS} AS toks FROM documents
      ),
      scores AS (
        SELECT b.doc_id, l.lang AS cand,
               len(list_intersect(b.toks, l.markers)) AS score
        FROM base b CROSS JOIN {_LANG_MARKERS_SQL}
      ),
      pred AS (
        SELECT doc_id, cand AS lang_pred,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        FROM scores
      )
      SELECT b.doc_id, b.lang, p.lang_pred,
             round(0.4::DOUBLE * least(b.n_chars / 2000.0::DOUBLE, 1.0::DOUBLE)
                   + 0.3::DOUBLE * greatest(0.0::DOUBLE,
                       1.0::DOUBLE - (length(regexp_replace(b.text, '[a-zA-Z0-9\\s]', '', 'g'))
                                      / greatest(length(b.text), 1)) * 5)
                   + 0.3::DOUBLE * (len(list_intersect(b.toks, {_STOPWORDS_SQL})) / 8.0::DOUBLE),
                   6) AS quality,
             (len(b.toks))::INT AS n_tokens,
             substr(md5(array_to_string(b.toks, ' ')), 1, 16) AS fingerprint
      FROM base b JOIN pred p ON b.doc_id = p.doc_id AND p.rn = 1
    """

    oracles["q_window_rank"] = """
      SELECT lang, doc_id, n_chars, rn::INT AS rn FROM (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
      ) WHERE rn <= 2
    """

    oracles["q_window_lag_sessionize"] = """
      WITH s AS (
        SELECT event_id, user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sess AS (
        SELECT user_id, value,
               (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        FROM s
      )
      SELECT user_id, session_id, count(*) AS n_events,
             round(sum(value), 6) AS sum_value
      FROM sess GROUP BY user_id, session_id
    """

    oracles["q_tumbling_window"] = """
      SELECT strftime(to_timestamp(((floor(epoch(ts) / 900))::BIGINT * 900)),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, count(*) AS n, round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2
    """

    oracles["q_exact_dedup"] = """
      SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_dups
      FROM documents GROUP BY md5(text) HAVING count(*) > 1
    """

    oracles["q_exact_dedup_prefix"] = """
      SELECT md5(substr(text, 1, 30)) AS text_hash, min(doc_id) AS keep_doc_id,
             count(*) AS n_dups
      FROM documents GROUP BY md5(substr(text, 1, 30)) HAVING count(*) > 1
    """

    oracles["q_near_dedup_minhash"] = f"""
      WITH {_sql_minhash_ctes()}
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(DISTINCT a.band)::INT AS n_bands_shared
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    """

    oracles["q_media_resize"] = """
      WITH resized AS (
        SELECT doc_id,
               array_to_string(
                 [substr(text, i, 1) for i in range(1, length(text) + 1) if (i - 1) % 4 = 0],
                 '') AS out
        FROM documents
      )
      SELECT doc_id AS media_id,
             list_extract(['image', 'audio', 'video'], (doc_id % 3)::INT + 1) AS media_type,
             length(out)::INT AS out_bytes,
             md5(out) AS out_md5
      FROM resized
    """

    oracles["q_promo_revenue"] = """
      SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
             round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                    THEN l.l_extendedprice * (1 - l.l_discount)
                                    ELSE 0.0 END)
                   / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY strftime(l.l_shipdate, '%Y-%m')
    """

    oracles["q_supplier_revenue"] = """
      SELECT n.n_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
             count(DISTINCT s.s_suppkey) AS n_suppliers
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    """

    oracles["q_stats_correlation"] = f"""
      WITH t AS (SELECT lang, n_chars, len({SQL_TOKENS}) AS n_tokens FROM documents)
      SELECT lang, count(*) AS n_docs,
             round(corr(n_chars, n_tokens), 6) AS corr_chars_tokens,
             round(covar_pop(n_chars, n_tokens), 4) AS covar_pop
      FROM t GROUP BY lang
    """

    oracles["q_histogram"] = """
      SELECT (n_chars // 500) * 500 AS bucket_lo, count(*) AS n_docs
      FROM documents GROUP BY (n_chars // 500) * 500
    """

    oracles["q_shortest_paths"] = f"""
      WITH RECURSIVE {SQL_GRAPH_CTES},
      walk AS (
        SELECT 0::BIGINT AS id, 0 AS dist
        UNION
        SELECT k.dst AS id, w.dist + 1 AS dist
        FROM kept k JOIN walk w ON k.src = w.id
        WHERE w.dist < 10
      )
      SELECT id, min(dist)::INT AS dist FROM walk GROUP BY id
    """

    # round 8: weighted SSSP (Bellman-Ford via the pregel frontier
    # mode). Hop-bounded exploration: after k rounds the Spark side
    # holds the min over ≤ k-hop paths, so the twin walks paths by hop
    # count (dist states are bounded — weights ≤ 5, hops ≤ 10 — so the
    # UNION-dedup keeps the state space small)
    oracles["q_sssp_pregel"] = f"""
      WITH RECURSIVE {SQL_GRAPH_CTES},
      walk AS (
        SELECT 0::BIGINT AS id, 0::BIGINT AS dist, 0 AS hops
        UNION
        SELECT k.dst AS id,
               w.dist + ((k.src + k.dst) % 5 + 1) AS dist,
               w.hops + 1 AS hops
        FROM kept k JOIN walk w ON k.src = w.id
        WHERE w.hops < 10
      )
      SELECT id, min(dist)::BIGINT AS dist FROM walk GROUP BY id
    """

    ppr_iters = _sql_ppr_iters(10)
    oracles["q_pagerank_personalized"] = f"""
      WITH {SQL_GRAPH_CTES},
      {ppr_iters}
      SELECT id, round(pr, 6) AS pr FROM pit10
    """

    oracles["q_hits"] = f"""
      WITH {SQL_GRAPH_CTES},
      he AS MATERIALIZED (SELECT DISTINCT src, dst FROM kept WHERE src <> dst),
      hnodes AS MATERIALIZED (SELECT src AS id FROM he UNION SELECT dst FROM he),
      hn AS (SELECT count(*)::DOUBLE AS n FROM hnodes),
      h0 AS MATERIALIZED (SELECT id, 1.0/hn.n AS hub, 1.0/hn.n AS auth FROM hnodes CROSS JOIN hn),
      ar1 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h0 s ON e.src = s.id GROUP BY 1),
      hr1 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h0 s ON e.dst = s.id GROUP BY 1),
      j1 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr1 hr ON n.id = hr.id LEFT JOIN ar1 ar ON n.id = ar.id),
      m1 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j1),
      h1 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j1 CROSS JOIN m1 m),
      ar2 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h1 s ON e.src = s.id GROUP BY 1),
      hr2 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h1 s ON e.dst = s.id GROUP BY 1),
      j2 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr2 hr ON n.id = hr.id LEFT JOIN ar2 ar ON n.id = ar.id),
      m2 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j2),
      h2 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j2 CROSS JOIN m2 m),
      ar3 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h2 s ON e.src = s.id GROUP BY 1),
      hr3 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h2 s ON e.dst = s.id GROUP BY 1),
      j3 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr3 hr ON n.id = hr.id LEFT JOIN ar3 ar ON n.id = ar.id),
      m3 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j3),
      h3 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j3 CROSS JOIN m3 m),
      ar4 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h3 s ON e.src = s.id GROUP BY 1),
      hr4 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h3 s ON e.dst = s.id GROUP BY 1),
      j4 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr4 hr ON n.id = hr.id LEFT JOIN ar4 ar ON n.id = ar.id),
      m4 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j4),
      h4 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j4 CROSS JOIN m4 m),
      ar5 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h4 s ON e.src = s.id GROUP BY 1),
      hr5 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h4 s ON e.dst = s.id GROUP BY 1),
      j5 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr5 hr ON n.id = hr.id LEFT JOIN ar5 ar ON n.id = ar.id),
      m5 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j5),
      h5 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j5 CROSS JOIN m5 m),
      ar6 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h5 s ON e.src = s.id GROUP BY 1),
      hr6 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h5 s ON e.dst = s.id GROUP BY 1),
      j6 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr6 hr ON n.id = hr.id LEFT JOIN ar6 ar ON n.id = ar.id),
      m6 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j6),
      h6 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j6 CROSS JOIN m6 m),
      ar7 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h6 s ON e.src = s.id GROUP BY 1),
      hr7 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h6 s ON e.dst = s.id GROUP BY 1),
      j7 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr7 hr ON n.id = hr.id LEFT JOIN ar7 ar ON n.id = ar.id),
      m7 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j7),
      h7 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j7 CROSS JOIN m7 m),
      ar8 AS (SELECT e.dst AS id, sum(s.hub) AS a_raw FROM he e JOIN h7 s ON e.src = s.id GROUP BY 1),
      hr8 AS (SELECT e.src AS id, sum(s.auth) AS h_raw FROM he e JOIN h7 s ON e.dst = s.id GROUP BY 1),
      j8 AS MATERIALIZED (
        SELECT n.id, coalesce(hr.h_raw, 0.0) AS h_raw, coalesce(ar.a_raw, 0.0) AS a_raw
        FROM hnodes n LEFT JOIN hr8 hr ON n.id = hr.id LEFT JOIN ar8 ar ON n.id = ar.id),
      m8 AS (SELECT sum(h_raw) AS hm, sum(a_raw) AS am FROM j8),
      h8 AS MATERIALIZED (
        SELECT id, h_raw/m.hm AS hub, a_raw/m.am AS auth FROM j8 CROSS JOIN m8 m)
      SELECT id, round(hub, 6) AS hub, round(auth, 6) AS authority FROM h8
    """

    oracles["q_graph_walks"] = f"""
      WITH {SQL_GRAPH_CTES},
      wadj AS MATERIALIZED (
        SELECT src, list(DISTINCT dst ORDER BY dst) AS links
        FROM (SELECT DISTINCT src, dst FROM kept WHERE src <> dst) t GROUP BY src),
      w0 AS (SELECT id AS start, id AS cur, [id] AS path FROM verts),
      w1 AS MATERIALIZED (
        SELECT w.start,
               CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-1-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT]
               END AS cur,
               w.path || [CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-1-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT] END] AS path
        FROM w0 w LEFT JOIN wadj a ON w.cur = a.src),
      w2 AS MATERIALIZED (
        SELECT w.start,
               CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-2-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT]
               END AS cur,
               w.path || [CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-2-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT] END] AS path
        FROM w1 w LEFT JOIN wadj a ON w.cur = a.src),
      w3 AS MATERIALIZED (
        SELECT w.start,
               CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-3-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT]
               END AS cur,
               w.path || [CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-3-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT] END] AS path
        FROM w2 w LEFT JOIN wadj a ON w.cur = a.src),
      w4 AS MATERIALIZED (
        SELECT w.start,
               CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-4-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT]
               END AS cur,
               w.path || [CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-4-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT] END] AS path
        FROM w3 w LEFT JOIN wadj a ON w.cur = a.src),
      w5 AS MATERIALIZED (
        SELECT w.start,
               CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-5-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT]
               END AS cur,
               w.path || [CASE WHEN a.links IS NULL THEN w.cur
                    ELSE a.links[((('0x' || substr(md5(w.start::VARCHAR || '-5-' || w.cur::VARCHAR), 1, 8))::BIGINT % len(a.links)) + 1)::INT] END] AS path
        FROM w4 w LEFT JOIN wadj a ON w.cur = a.src)
      SELECT start, to_json(path) AS walk_json FROM w5
    """

    oracles["q_label_propagation"] = f"""
      WITH {SQL_GRAPH_CTES},
      e0 AS (SELECT DISTINCT src, dst FROM kept WHERE src <> dst),
      sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
      l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym),
      c1 AS (SELECT s.dst, l.label, count(*) AS c
             FROM sym s JOIN l0 l ON s.src = l.id GROUP BY 1, 2),
      l1 AS (SELECT dst AS id, label FROM (
               SELECT dst, label, row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT s.dst, l.label, count(*) AS c
             FROM sym s JOIN l1 l ON s.src = l.id GROUP BY 1, 2),
      l2 AS (SELECT dst AS id, label FROM (
               SELECT dst, label, row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1),
      c3 AS (SELECT s.dst, l.label, count(*) AS c
             FROM sym s JOIN l2 l ON s.src = l.id GROUP BY 1, 2),
      l3 AS (SELECT dst AS id, label FROM (
               SELECT dst, label, row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
               FROM c3) WHERE rn = 1)
      SELECT id, label FROM l3
    """

    oracles["q_monthly_churn"] = """
      WITH cm AS (
        SELECT DISTINCT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) - 1 AS om
        FROM orders
      ),
      mx AS (SELECT max(om) AS mx FROM cm),
      j AS (
        SELECT a.om,
               CASE WHEN b.o_custkey IS NULL THEN 0 ELSE 1 END AS nxt
        FROM cm a LEFT JOIN cm b
          ON a.o_custkey = b.o_custkey AND b.om = a.om + 1
      )
      SELECT (om // 12)::VARCHAR || '-' ||
               lpad(((om % 12) + 1)::VARCHAR, 2, '0') AS month,
             count(*)::BIGINT AS n_active,
             sum(nxt)::BIGINT AS n_retained,
             round(1.0::DOUBLE - sum(nxt)::BIGINT / count(*), 6) AS churn_rate
      FROM j CROSS JOIN mx WHERE om < mx.mx
      GROUP BY om
    """

    # modularity: reuse the LPA oracle's CTE chain (labels = l3), append
    # the undirected-edge/degree/community aggregates and the Newman
    # formula — the same label derivation, so a hash match proves both
    # the partition and the metric
    _lpa_ctes = oracles["q_label_propagation"].rsplit(
        "SELECT id, label FROM l3", 1
    )[0].rstrip()
    oracles["q_modularity"] = (
        _lpa_ctes
        + """,
      und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM kept WHERE src <> dst
      ),
      mm AS (SELECT count(*)::DOUBLE AS m FROM und),
      degs AS (
        SELECT id, count(*)::BIGINT AS deg FROM (
          SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und
        ) GROUP BY id
      ),
      nc AS (SELECT label, count(*)::BIGINT AS n_nodes FROM l3 GROUP BY label),
      dc AS (
        SELECT l.label, sum(d.deg)::BIGINT AS d_sum
        FROM degs d JOIN l3 l ON d.id = l.id GROUP BY l.label
      ),
      ein AS (
        SELECT la.label, count(*)::BIGINT AS e_in
        FROM und u JOIN l3 la ON u.a = la.id JOIN l3 lb ON u.b = lb.id
        WHERE la.label = lb.label GROUP BY la.label
      )
      SELECT nc.label, nc.n_nodes, coalesce(e.e_in, 0)::BIGINT AS e_in,
             dc.d_sum,
             round(coalesce(e.e_in, 0) / mm.m
                   - (dc.d_sum / (2.0::DOUBLE * mm.m))
                     * (dc.d_sum / (2.0::DOUBLE * mm.m)), 6) + 0.0::DOUBLE
               AS q_contrib
      FROM nc JOIN dc USING (label)
      LEFT JOIN ein e USING (label)
      CROSS JOIN mm
    """
    )

    # k-core: 8 unrolled peel rounds (fixpoint reached in <=4 at the
    # declared SFs; extra rounds are no-ops once stable)
    oracles["q_kcore"] = f"""
      WITH {SQL_GRAPH_CTES},
      ke0 AS (SELECT DISTINCT src, dst FROM kept WHERE src <> dst),
      c0 AS MATERIALIZED (SELECT src, dst FROM ke0 UNION SELECT dst AS src, src AS dst FROM ke0),
      k1 AS MATERIALIZED (SELECT src FROM c0 GROUP BY src HAVING count(*) >= 30),
      c1 AS MATERIALIZED (SELECT src, dst FROM c0
               WHERE src IN (SELECT src FROM k1) AND dst IN (SELECT src FROM k1)),
      k2 AS MATERIALIZED (SELECT src FROM c1 GROUP BY src HAVING count(*) >= 30),
      c2 AS MATERIALIZED (SELECT src, dst FROM c1
               WHERE src IN (SELECT src FROM k2) AND dst IN (SELECT src FROM k2)),
      k3 AS MATERIALIZED (SELECT src FROM c2 GROUP BY src HAVING count(*) >= 30),
      c3 AS MATERIALIZED (SELECT src, dst FROM c2
               WHERE src IN (SELECT src FROM k3) AND dst IN (SELECT src FROM k3)),
      k4 AS MATERIALIZED (SELECT src FROM c3 GROUP BY src HAVING count(*) >= 30),
      c4 AS MATERIALIZED (SELECT src, dst FROM c3
               WHERE src IN (SELECT src FROM k4) AND dst IN (SELECT src FROM k4)),
      k5 AS MATERIALIZED (SELECT src FROM c4 GROUP BY src HAVING count(*) >= 30),
      c5 AS MATERIALIZED (SELECT src, dst FROM c4
               WHERE src IN (SELECT src FROM k5) AND dst IN (SELECT src FROM k5)),
      k6 AS MATERIALIZED (SELECT src FROM c5 GROUP BY src HAVING count(*) >= 30),
      c6 AS MATERIALIZED (SELECT src, dst FROM c5
               WHERE src IN (SELECT src FROM k6) AND dst IN (SELECT src FROM k6)),
      k7 AS MATERIALIZED (SELECT src FROM c6 GROUP BY src HAVING count(*) >= 30),
      c7 AS MATERIALIZED (SELECT src, dst FROM c6
               WHERE src IN (SELECT src FROM k7) AND dst IN (SELECT src FROM k7)),
      k8 AS MATERIALIZED (SELECT src FROM c7 GROUP BY src HAVING count(*) >= 30),
      c8 AS MATERIALIZED (SELECT src, dst FROM c7
               WHERE src IN (SELECT src FROM k8) AND dst IN (SELECT src FROM k8))
      SELECT src AS id, count(*)::BIGINT AS degree
      FROM c8 GROUP BY src HAVING count(*) >= 30
    """

    oracles["q_apply_changes"] = """
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
      FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, lang, n_chars FROM documents WHERE doc_id < 25
    """

    oracles["q_weighted_sample"] = """
      SELECT doc_id, n_chars,
             round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1.0)
                      / 4294967297.0) / n_chars, 6) AS priority
      FROM documents
      ORDER BY priority DESC, doc_id LIMIT 20
    """

    oracles["q_salted_join"] = """
      SELECT e.event_type, length(e.event_type)::INT AS weight,
             count(*)::BIGINT AS n,
             round(sum(e.value * length(e.event_type)), 6) AS weighted_value
      FROM events e
      GROUP BY e.event_type
    """

    oracles["q_prefix_lookup"] = f"""
      SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS df
      FROM (SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS tok FROM documents) t
      WHERE tok LIKE 'spa%'
      GROUP BY tok
    """

    oracles["q_snapshot_diff"] = """
      WITH oldt AS (SELECT doc_id, lang, n_chars FROM documents),
      newt AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, lang, n_chars FROM documents WHERE doc_id < 25
      )
      SELECT doc_id, op, lang_old, n_chars_old, lang_new, n_chars_new FROM (
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'insert'
                    WHEN n.doc_id IS NULL THEN 'delete'
                    WHEN NOT (o.lang IS NOT DISTINCT FROM n.lang
                              AND o.n_chars IS NOT DISTINCT FROM n.n_chars)
                    THEN 'update' END AS op,
               o.lang AS lang_old, o.n_chars AS n_chars_old,
               n.lang AS lang_new, n.n_chars AS n_chars_new
        FROM oldt o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
      ) WHERE op IS NOT NULL
    """

    oracles["q_large_volume_orders"] = """
      WITH big AS (
        SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 4) > 250
      )
      SELECT c.c_name, c.c_custkey, o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o.o_totalprice, b.total_qty
      FROM big b
      JOIN orders o ON b.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY o.o_totalprice DESC, o_orderdate, o.o_orderkey
      LIMIT 100
    """

    oracles["q_interval_overlap"] = """
      WITH s AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sess AS (
        SELECT user_id, ts,
               (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        FROM s
      ),
      iv AS (
        SELECT user_id, session_id, min(ts) AS t0, max(ts) AS t1
        FROM sess GROUP BY user_id, session_id HAVING count(*) >= 2
      )
      SELECT a.user_id AS user_a, a.session_id AS session_a,
             b.user_id AS user_b, b.session_id AS session_b,
             round((epoch_us(least(a.t1, b.t1)) - epoch_us(greatest(a.t0, b.t0)))
                   / 1000000.0, 6) AS overlap_s
      FROM iv a JOIN iv b
        ON a.t0 <= b.t1 AND b.t0 <= a.t1 AND a.user_id < b.user_id
    """

    oracles["q_funnel_stats"] = """
      WITH s AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sess AS (
        SELECT user_id, ts, event_type,
               (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        FROM s
      ),
      stages AS (
        SELECT user_id, session_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts,
               min(CASE WHEN event_type = 'click' THEN ts END) AS click_ts,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
        FROM sess GROUP BY user_id, session_id
      )
      SELECT count(*) AS n_sessions,
             sum((view_ts IS NOT NULL)::INT)::BIGINT AS n_view,
             sum((view_ts < click_ts)::INT)::BIGINT AS n_view_click,
             sum((view_ts < click_ts AND click_ts < purchase_ts)::INT)::BIGINT
               AS n_view_click_purchase
      FROM stages
    """

    oracles["q_cohort_retention"] = """
      WITH days AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
      cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
      SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
             (d.day - c.cohort_day) AS day_offset,
             count(DISTINCT d.user_id) AS n_users
      FROM days d JOIN cohort c ON d.user_id = c.user_id
      WHERE (d.day - c.cohort_day) <= 3
      GROUP BY c.cohort_day, (d.day - c.cohort_day)
    """

    oracles["q_winnow_fingerprints"] = f"""
      WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      grams AS (
        SELECT doc_id,
               CASE WHEN len(l) < 4 THEN [array_to_string(l, ' ')]
                    ELSE [array_to_string(l[i:i+3], ' ') for i in range(1, len(l) - 2)]
               END AS gs
        FROM toks
      ),
      hs AS (
        SELECT doc_id, [('0x' || substr(md5(g), 1, 15))::BIGINT for g in gs] AS hl
        FROM grams
      ),
      mins AS (
        SELECT doc_id,
               list_sort(list_distinct(
                 [list_min(hl[i:i+3]) for i in range(1, greatest(len(hl) - 3, 1) + 1)]
               )) AS fps
        FROM hs
      )
      SELECT doc_id, unnest(fps) AS fp FROM mins
    """

    oracles["q_bm25_score"] = f"""
      WITH toks AS (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents),
      lens AS (SELECT doc_id, len({SQL_TOKENS}) AS dl FROM documents),
      stats AS (SELECT avg(dl) AS avgdl FROM lens),
      nn AS (SELECT count(*) AS n FROM documents),
      tf AS (
        SELECT term, doc_id, count(*) AS tf FROM toks
        WHERE term IN ({{in_terms}}) GROUP BY term, doc_id
      ),
      dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
      SELECT t.term, t.doc_id,
             round(
               ln(1.0 + (nn.n - dfx.df + 0.5) / (dfx.df + 0.5))
               * (t.tf * (1.2 + 1)) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / stats.avgdl)),
               6) AS bm25
      FROM tf t
      JOIN dfx ON t.term = dfx.term
      JOIN lens l ON t.doc_id = l.doc_id
      CROSS JOIN stats CROSS JOIN nn
    """.replace("{in_terms}", ", ".join(f"'{t}'" for t in LOOKUP_TERMS))

    oracles["q_shipping_priority"] = """
      SELECT l.l_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-06-01'
        AND l.l_shipdate > TIMESTAMP '1998-06-01'
      GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10
    """
