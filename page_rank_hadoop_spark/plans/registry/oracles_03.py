"""Oracle SQL, part 3: text/BPE/packing/pipeline twins.

DuckDB twins of the declared queries; split verbatim from the original
build_oracles() in round 6 — zero behavior change. ``contribute``
mutates the shared oracles dict.
"""

from __future__ import annotations

from page_rank_hadoop_spark.functions.text import BPE_RE, TOKEN_RE

from page_rank_hadoop_spark.plans.registry._shared import (
    LOOKUP_TERMS,
    SQL_GRAPH_CTES,
    SQL_TOKENS,
    TFIDF_TERMS,
    _sql_pagerank_iters,
)

from page_rank_hadoop_spark.plans.registry.queries_analytics import (
    _STOPWORDS_SQL,
)


def contribute(oracles: dict[str, str]) -> None:
    terms_in = ", ".join(f"'{t}'" for t in TFIDF_TERMS)
    lookup_in = ", ".join(f"'{t}'" for t in LOOKUP_TERMS)
    pr_iters = _sql_pagerank_iters(10)
    bpe_stages = [
        f"v AS (SELECT w, count(*) AS freq FROM (SELECT unnest({SQL_TOKENS}) AS w FROM documents) t GROUP BY w)",
        "s0 AS (SELECT freq, [substr(w, i, 1) for i in range(1, length(w) + 1)] AS seq FROM v)",
    ]
    for k in range(1, 6):
        bpe_stages.append(
            f"""p{k} AS (
        SELECT seq[i] AS a, seq[i + 1] AS b, sum(freq)::BIGINT AS n
        FROM (SELECT freq, seq, unnest(range(1, len(seq))) AS i FROM s{k - 1}) t
        GROUP BY 1, 2)"""
        )
        bpe_stages.append(
            f"b{k} AS (SELECT a, b, n FROM p{k} ORDER BY n DESC, a, b LIMIT 1)"
        )
        if k < 5:
            bpe_stages.append(
                f"""s{k} AS (
        SELECT freq,
               CASE WHEN len(seq) = 1 THEN seq
               ELSE string_split(
                 list_reduce(seq, (acc, x) ->
                   CASE WHEN x = bb.b AND (acc = bb.a OR ends_with(acc, ' ' || bb.a))
                        THEN substr(acc, 1, length(acc) - length(bb.a)) || bb.a || bb.b
                        ELSE acc || ' ' || x END), ' ')
               END AS seq
        FROM s{k - 1}, b{k} bb)"""
            )
    bpe_union = "\n      UNION ALL ".join(
        f'SELECT {k}::INT AS step, a AS "left", b AS "right", a || b AS merged, n FROM b{k}'
        for k in range(1, 6)
    )
    oracles["q_bpe_train_merges"] = (
        "WITH " + ",\n      ".join(bpe_stages) + "\n      " + bpe_union
    )

    oracles["q_bpe_encode"] = f"""
      WITH w0 AS (SELECT doc_id, [substr(w, i, 1) for i in range(1, length(w)+1)] AS seq FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS w FROM documents) t),
      w1 AS (
        SELECT doc_id,
               CASE WHEN len(seq) = 1 THEN seq
               ELSE string_split(
                 list_reduce(seq, (acc, x) ->
                   CASE WHEN x = 'h' AND (acc = 't' OR ends_with(acc, ' t'))
                        THEN substr(acc, 1, length(acc) - 1) || 'th'
                        ELSE acc || ' ' || x END), ' ')
               END AS seq
        FROM w0),
      w2 AS (
        SELECT doc_id,
               CASE WHEN len(seq) = 1 THEN seq
               ELSE string_split(
                 list_reduce(seq, (acc, x) ->
                   CASE WHEN x = 'e' AND (acc = 'th' OR ends_with(acc, ' th'))
                        THEN substr(acc, 1, length(acc) - 2) || 'the'
                        ELSE acc || ' ' || x END), ' ')
               END AS seq
        FROM w1),
      w3 AS (
        SELECT doc_id,
               CASE WHEN len(seq) = 1 THEN seq
               ELSE string_split(
                 list_reduce(seq, (acc, x) ->
                   CASE WHEN x = 'n' AND (acc = 'i' OR ends_with(acc, ' i'))
                        THEN substr(acc, 1, length(acc) - 1) || 'in'
                        ELSE acc || ' ' || x END), ' ')
               END AS seq
        FROM w2),
      w4 AS (
        SELECT doc_id,
               CASE WHEN len(seq) = 1 THEN seq
               ELSE string_split(
                 list_reduce(seq, (acc, x) ->
                   CASE WHEN x = 'r' AND (acc = 'e' OR ends_with(acc, ' e'))
                        THEN substr(acc, 1, length(acc) - 1) || 'er'
                        ELSE acc || ' ' || x END), ' ')
               END AS seq
        FROM w3),
      w5 AS (
        SELECT doc_id,
               CASE WHEN len(seq) = 1 THEN seq
               ELSE string_split(
                 list_reduce(seq, (acc, x) ->
                   CASE WHEN x = 'n' AND (acc = 'a' OR ends_with(acc, ' a'))
                        THEN substr(acc, 1, length(acc) - 1) || 'an'
                        ELSE acc || ' ' || x END), ' ')
               END AS seq
        FROM w4)
      SELECT doc_id, sum(len(seq))::BIGINT AS n_pieces, count(*)::BIGINT AS n_words
      FROM w5 GROUP BY doc_id
    """

    oracles["q_zorder_key"] = """
      SELECT event_id,
             ((((user_id >> 0) & 1) << 1) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 0 & 1) << 0) +
               (((user_id >> 1) & 1) << 3) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 1 & 1) << 2) +
               (((user_id >> 2) & 1) << 5) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 2 & 1) << 4) +
               (((user_id >> 3) & 1) << 7) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 3 & 1) << 6) +
               (((user_id >> 4) & 1) << 9) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 4 & 1) << 8) +
               (((user_id >> 5) & 1) << 11) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 5 & 1) << 10) +
               (((user_id >> 6) & 1) << 13) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 6 & 1) << 12) +
               (((user_id >> 7) & 1) << 15) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 7 & 1) << 14) +
               (((user_id >> 8) & 1) << 17) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 8 & 1) << 16) +
               (((user_id >> 9) & 1) << 19) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 9 & 1) << 18) +
               (((user_id >> 10) & 1) << 21) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 10 & 1) << 20) +
               (((user_id >> 11) & 1) << 23) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 11 & 1) << 22) +
               (((user_id >> 12) & 1) << 25) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 12 & 1) << 24) +
               (((user_id >> 13) & 1) << 27) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 13 & 1) << 26) +
               (((user_id >> 14) & 1) << 29) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 14 & 1) << 28) +
               (((user_id >> 15) & 1) << 31) +
               ((((floor(epoch(ts))::BIGINT // 60) % 65536) >> 15 & 1) << 30))::BIGINT AS zkey
      FROM events
    """

    oracles["q_ingest_batch"] = f"""
      WITH nrm AS (
        SELECT doc_id, lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'), '[ \\t\\r\\n]+', ' ', 'g'))) AS ntext FROM documents
      ),
      scored AS (
        SELECT doc_id, md5(ntext) AS content_md5,
               round(0.4::DOUBLE * least(length(ntext) / 2000.0::DOUBLE, 1.0::DOUBLE)
                 + 0.3::DOUBLE * greatest(0.0::DOUBLE,
                     1.0::DOUBLE - (length(regexp_replace(ntext, '[a-zA-Z0-9\\s]', '', 'g'))
                                    / greatest(length(ntext), 1)) * 5)
                 + 0.3::DOUBLE * (len(list_intersect(regexp_extract_all(ntext, '{TOKEN_RE}'),
                                                     {_STOPWORDS_SQL})) / 8.0::DOUBLE),
                 6) AS quality
        FROM nrm
      ),
      gated AS (SELECT * FROM scored WHERE quality >= 0.3),
      keep AS (SELECT content_md5, min(doc_id) AS doc_id FROM gated GROUP BY 1)
      SELECT g.doc_id, g.content_md5, g.quality
      FROM gated g JOIN keep k ON g.content_md5 = k.content_md5 AND g.doc_id = k.doc_id
    """

    oracles["q_pack_sequences"] = f"""
      WITH t AS (
        SELECT doc_id, len({SQL_TOKENS})::INT AS n_tokens FROM documents
      ),
      c AS (
        SELECT doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        FROM t
      )
      SELECT doc_id, n_tokens,
             (before // 2048)::INT AS bin_id,
             (before % 2048)::INT AS bin_offset
      FROM c
    """

    oracles["q_temperature_mixture"] = """
      WITH counts AS (SELECT lang, count(*)::DOUBLE AS n_s FROM documents GROUP BY lang),
      m AS (SELECT min(n_s) AS min_n FROM counts),
      rates AS (SELECT lang, round(pow(n_s / m.min_n, -0.3), 6) AS rate
                FROM counts CROSS JOIN m)
      SELECT d.doc_id, d.lang, r.rate
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0 < r.rate
    """

    oracles["q_redact_pii"] = """
      SELECT doc_id,
             md5(regexp_replace(
                   regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}', '<EMAIL>', 'g'),
                   '[0-9][0-9 .-]{6,}[0-9]', '<NUM>', 'g')) AS redacted_md5,
             len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}'))::INT AS n_emails,
             len(regexp_extract_all(text, '[0-9][0-9 .-]{6,}[0-9]'))::INT AS n_nums
      FROM documents
    """

    oracles["q_pack_sequences_sharded"] = f"""
      WITH t AS (
        SELECT doc_id, lang, len({SQL_TOKENS})::INT AS n_tokens FROM documents
      ),
      c AS (
        SELECT doc_id, lang, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        FROM t
      )
      SELECT doc_id, lang, n_tokens,
             (before // 2048)::INT AS bin_id,
             (before % 2048)::INT AS bin_offset
      FROM c
    """

    oracles["q_normalize_text"] = """
      SELECT doc_id,
             md5(lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'), '[ \\t\\r\\n]+', ' ', 'g')))) AS norm_md5,
             length(lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'), '[ \\t\\r\\n]+', ' ', 'g'))))::INT AS norm_len
      FROM documents
    """

    oracles["q_bpe_pair_stats"] = f"""
      WITH w AS (SELECT unnest({SQL_TOKENS}) AS w FROM documents),
      p AS (
        SELECT unnest([substr(w, i, 2) for i in range(1, length(w))]) AS pair
        FROM w WHERE length(w) >= 2
      )
      SELECT pair, count(*)::BIGINT AS n
      FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50
    """

    oracles["q_moving_average"] = """
      SELECT event_id, event_type,
             round(avg(value) OVER f, 6) AS moving_avg,
             lead(event_id) OVER b AS next_event_id,
             round(first_value(value) OVER f, 6) AS frame_first,
             round(last_value(value) OVER f, 6) AS frame_last
      FROM events
      WINDOW b AS (PARTITION BY event_type ORDER BY ts, event_id),
             f AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """

    oracles["q_ranking_suite"] = """
      SELECT doc_id, lang, n_chars,
             ntile(4) OVER w AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume,
             dense_rank() OVER w AS drank
      FROM documents
      WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
      ORDER BY doc_id
    """

    oracles["q_running_totals"] = """
      SELECT event_id, event_type, ts,
             round(sum(value) OVER w, 6) AS running_value,
             count(*) OVER w AS running_n
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id
    """

    oracles["q_min_cost_supplier"] = """
      WITH qparts AS (
        SELECT p_partkey FROM part WHERE p_type = 'PROMO' AND p_size <= 5
      ),
      esupp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
      ),
      cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem JOIN qparts ON l_partkey = p_partkey
        GROUP BY 1, 2
      ),
      ec AS (SELECT c.*, e.s_name, e.s_acctbal, e.n_name
             FROM cost c JOIN esupp e ON c.l_suppkey = e.s_suppkey),
      best AS (SELECT l_partkey AS bpk, min(unit_cost) AS mc FROM ec GROUP BY 1)
      SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
             floor(unit_cost * 10000 + 0.5) / 10000 AS unit_cost
      FROM ec JOIN best ON l_partkey = bpk AND unit_cost = mc
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """

    oracles["q_market_share"] = """
      WITH vol AS (
        SELECT year(o_orderdate)::INT AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE p.p_type = 'STANDARD' AND r.r_name = 'ASIA'
      )
      SELECT o_year,
             round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                   / sum(volume), 6) AS mkt_share,
             round(sum(volume), 4) AS total_volume
      FROM vol GROUP BY o_year ORDER BY o_year
    """

    oracles["q_product_profit"] = """
      SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
             round(sum(l_extendedprice * (1 - l_discount)
                       - 0.6 * p_retailprice * l_quantity), 4) AS sum_profit
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """

    oracles["q_important_parts"] = """
      WITH pp AS (
        SELECT l_partkey AS p_partkey,
               sum(l_extendedprice * (1 - l_discount)) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1
      )
      SELECT p_partkey, round(val, 4) AS part_value
      FROM pp
      WHERE val > 2.0 * (SELECT avg(val) FROM pp)
      ORDER BY part_value DESC, p_partkey
    """

    oracles["q_late_priority_lines"] = """
      SELECT l_returnflag,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag ORDER BY l_returnflag
    """

    oracles["q_supplier_part_counts"] = """
      WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      )
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
      FROM pairs JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' AND p_size <= 25
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """

    oracles["q_promotion_suppliers"] = """
      WITH sq AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
      ),
      tot AS (SELECT l_partkey, sum(q) AS tq, count(*) AS ns FROM sq GROUP BY 1),
      qual AS (
        SELECT s.l_suppkey, count(*)::BIGINT AS n_dominated
        FROM sq s JOIN tot t USING (l_partkey)
        WHERE t.ns >= 2 AND s.q > 0.5 * t.tq
        GROUP BY 1 HAVING count(*) >= 3
      )
      SELECT s_name, n_name, n_dominated
      FROM qual
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_dominated DESC, s_name
    """

    # --- round 3 ---

    oracles["q_skyline_parts"] = """
      SELECT p_partkey, p_name, p_retailprice, p_size
      FROM part a
      WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
      )
    """

    oracles["q_dispersion_stats"] = """
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
             round(stddev_samp(l_extendedprice), 4) AS stddev_price,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(min(l_extendedprice), 6) AS min_price,
             round(max(l_extendedprice), 6) AS max_price,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    """

    oracles["q_interval_merge"] = """
      WITH s AS (
        SELECT user_id, event_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + 600000000 AS e_us
        FROM events
      ),
      m AS (
        SELECT user_id, s_us, e_us,
               CASE WHEN max(e_us) OVER wp IS NULL OR s_us > max(e_us) OVER wp
                    THEN 1 ELSE 0 END AS new_island
        FROM s
        WINDOW wp AS (PARTITION BY user_id ORDER BY s_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ),
      i AS (
        SELECT user_id, s_us, e_us,
               (sum(new_island) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                                      ROWS UNBOUNDED PRECEDING))::BIGINT AS island
        FROM m
      )
      SELECT user_id, island, min(s_us) AS span_start_us, max(e_us) AS span_end_us,
             count(*) AS n_events
      FROM i GROUP BY user_id, island
    """

    oracles["q_event_bigrams"] = """
      WITH l AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type
        FROM events
      )
      SELECT prev_type, event_type, count(*) AS n
      FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
    """

    oracles["q_fuzzy_supplier_match"] = """
      SELECT a.s_nationkey AS block, a.s_suppkey AS key_a, b.s_suppkey AS key_b,
             levenshtein(a.s_name, b.s_name)::INT AS distance
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
      WHERE levenshtein(a.s_name, b.s_name) <= 2
    """

    oracles["q_char_entropy"] = """
      WITH ch AS (
        SELECT lang, substr(text, i, 1) AS ch
        FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
      ),
      c AS (
        SELECT lang, ch, count(*) AS n FROM ch WHERE ch != '' GROUP BY lang, ch
      ),
      p AS (
        SELECT lang, n / sum(n) OVER (PARTITION BY lang) AS p FROM c
      )
      SELECT lang, round(-sum(p * log2(p)), 6) AS char_entropy,
             count(*) AS n_distinct_chars
      FROM p GROUP BY lang
    """

    # q_approx_distinct: HLL sketch — approximate by design, rows-only check.
    # prefix filtering is lossless: identical result set to the plain join
    oracles["q_ngram_jaccard_prefix"] = oracles["q_ngram_jaccard"]

    # ---- round-3 additions ----

    oracles["q_gap_fill"] = """
      WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS hour_ts,
               count(*)::BIGINT AS n_obs, round(sum(value)::DOUBLE, 6) AS hour_value
        FROM events GROUP BY 1, 2
      ),
      spans AS (SELECT user_id, min(hour_ts) AS h0, max(hour_ts) AS h1 FROM hourly GROUP BY 1),
      grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
        FROM spans
      )
      SELECT g.user_id, strftime(g.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour,
             coalesce(h.n_obs, 0)::BIGINT AS n_events,
             last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS filled_value,
             (CASE WHEN h.n_obs IS NULL THEN 1 ELSE 0 END)::INT AS is_gap
      FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour_ts = h.hour_ts
    """

    oracles["q_mad_outliers"] = """
      WITH med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY event_type
      ),
      mstats AS (
        SELECT e.event_type, m.med,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type, m.med
      )
      SELECT e.event_id, e.event_type,
             round(e.value, 6) AS value, round(m.med, 6) AS med,
             round(m.mad, 6) AS mad,
             round(0.6745::DOUBLE * (e.value - m.med) / m.mad, 6) AS mz_score
      FROM events e JOIN mstats m USING (event_type)
      WHERE m.mad > 0
        AND abs(0.6745::DOUBLE * (e.value - m.med) / m.mad) > 3.5::DOUBLE
    """

    oracles["q_market_basket"] = """
      WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*)::BIGINT AS n_both
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 3
      ),
      sup AS (SELECT l_partkey, count(*)::BIGINT AS n FROM op GROUP BY 1)
      SELECT p.part_a, p.part_b, p.n_both, sa.n AS n_a, sb.n AS n_b,
             round(p.n_both / (sa.n + sb.n - p.n_both), 6) AS jaccard
      FROM pairs p
      JOIN sup sa ON p.part_a = sa.l_partkey
      JOIN sup sb ON p.part_b = sb.l_partkey
      ORDER BY p.n_both DESC, p.part_a, p.part_b LIMIT 100
    """

    oracles["q_link_prediction"] = f"""
      WITH {SQL_GRAPH_CTES},
      e AS (SELECT DISTINCT src, dst FROM kept WHERE src <> dst),
      indeg AS (SELECT dst, count(*) AS d_in FROM e GROUP BY dst),
      cold AS (
        SELECT e.src, e.dst FROM e JOIN indeg i ON e.dst = i.dst AND i.d_in <= 64
      ),
      pairs AS (
        SELECT a.src AS u, b.src AS v, count(*)::BIGINT AS n_common
        FROM cold a JOIN cold b ON a.dst = b.dst AND a.src < b.src
        GROUP BY 1, 2 HAVING count(*) >= 2
      ),
      outdeg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src)
      SELECT p.u, p.v, p.n_common,
             round(p.n_common / (du.d + dv.d - p.n_common), 6) AS jaccard
      FROM pairs p
      JOIN outdeg du ON p.u = du.src
      JOIN outdeg dv ON p.v = dv.src
    """

    oracles["q_training_shards"] = f"""
      WITH base AS (
        SELECT doc_id, (len({SQL_TOKENS}))::INT AS n_tokens,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 32 AS bucket
        FROM documents
      ),
      dealt AS (
        SELECT doc_id, n_tokens, bucket,
               ((row_number() OVER (PARTITION BY bucket
                                    ORDER BY n_tokens DESC, doc_id) - 1) * 32
                + bucket) % 8 AS shard
        FROM base
      ),
      tot AS (SELECT sum(n_tokens)::BIGINT AS all_tokens FROM base)
      SELECT shard::INT AS shard, count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS shard_tokens,
             max(n_tokens)::INT AS max_doc_tokens,
             round(sum(n_tokens)::BIGINT / (t.all_tokens / 8.0::DOUBLE), 6)
               AS balance_ratio
      FROM dealt CROSS JOIN tot t GROUP BY shard, t.all_tokens
    """

    oracles["q_vocab_coverage"] = f"""
      WITH counts AS (
        SELECT term, count(*)::BIGINT AS n
        FROM (SELECT unnest({SQL_TOKENS}) AS term FROM documents)
        GROUP BY term
      ),
      ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rank FROM counts
      ),
      sizes AS (SELECT unnest([100, 300, 1000, 3000, 10000]) AS vocab_size)
      SELECT s.vocab_size,
             sum(CASE WHEN r.rank <= s.vocab_size THEN r.n ELSE 0 END)::BIGINT
               AS covered_tokens,
             sum(r.n)::BIGINT AS total_tokens,
             round(sum(CASE WHEN r.rank <= s.vocab_size THEN r.n ELSE 0 END)::BIGINT
                   / sum(r.n)::BIGINT, 6) AS coverage
      FROM ranked r CROSS JOIN sizes s GROUP BY s.vocab_size
    """

    oracles["q_approx_topk_terms"] = f"""
      -- exact top-k: the sketch is exact below capacity (vocab << 4096
      -- at every test SF), so the frequent-items result must equal this
      SELECT term, cnt FROM (
        SELECT term, count(*)::BIGINT AS cnt
        FROM (SELECT unnest({SQL_TOKENS}) AS term FROM documents)
        GROUP BY term
        ORDER BY cnt DESC, term
        LIMIT 20
      )
    """

    oracles["q_gram_matrix"] = """
      WITH ex AS (
        SELECT vec_id, (u.s.i)::INT AS i, (u.s.x)::DOUBLE AS x
        FROM (
          SELECT vec_id,
                 [{'i': i - 1, 'x': embedding[i]} for i in range(1, len(embedding) + 1)] AS ps
          FROM embeddings
        ), unnest(ps) u(s)
      )
      SELECT a.i, b.i AS j, round(sum(a.x * b.x), 4) AS gram
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
      GROUP BY a.i, b.i
    """

    oracles["q_repeated_chunks"] = f"""
      WITH t AS (SELECT doc_id, {SQL_TOKENS} AS l FROM documents),
      s AS (
        SELECT doc_id, l, unnest(range(0, greatest(len(l), 1), 8)) AS st FROM t
      ),
      c AS (
        SELECT doc_id, st, array_to_string(l[st + 1 : st + 8], ' ') AS chunk_text
        FROM s WHERE len(l[st + 1 : st + 8]) > 0
      ),
      dfreq AS (
        SELECT chunk_text, count(DISTINCT doc_id)::BIGINT AS df FROM c GROUP BY 1
      )
      SELECT c.doc_id, count(*)::BIGINT AS n_chunks,
             sum(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
             md5(string_agg(chunk_text, ' ' ORDER BY c.st)
                 FILTER (WHERE d.df <= 2)) AS fingerprint
      FROM c JOIN dfreq d USING (chunk_text)
      GROUP BY c.doc_id
    """
