package graft.oracle

/** DuckDB 1.0.0 oracle SQL, keyed identically to `SparkEntry.queries`.
  *
  * Contract (SURVEY.md §2): every query's SQL is runnable by DuckDB against
  * the same parquet files; column aliases match the Spark output exactly
  * (the driver sorts columns by name before hashing); every statement ends
  * in a total ORDER BY (D1); money math is integer cents (D2); float
  * outputs are ROUND-ed (D3). Tables are referenced by bare name — the
  * driver registers views over `<sfDir>/<name>.parquet`.
  */
object OracleSql {

  val sql: Map[String, String] = Map(
    "q_scan_lineitem_count" ->
      "SELECT count(*) AS n FROM lineitem",

    "q_scan_pruned" -> """
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_quantity > 45
      ORDER BY l_orderkey, l_linenumber, qty""",

    "q_filter_complex" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS disc_price_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_returnflag IN ('A','R')
      ORDER BY l_orderkey, l_linenumber, disc_price_e4""",

    "q_project_expr" -> """
      SELECT p_partkey, UPPER(p_brand) AS brand_uc,
             SUBSTRING(p_name, 1, 8) AS name8,
             CAST(ROUND(p_retailprice*100) AS BIGINT) AS retail_cents,
             p_size * 2 AS size2
      FROM part ORDER BY p_partkey""",

    "q_agg_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
             COUNT(*) AS n_rows,
             ROUND(SUM(CAST(l_quantity AS BIGINT)) / COUNT(*), 4) AS avg_qty
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" -> """
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_rollup" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, rf, ls""",

    "q_agg_cube" -> """
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(strftime(day, '%Y-%m-%d'), '1900-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(value_cents) AS BIGINT) AS value_cents,
             CAST(GROUPING(event_type, day) AS BIGINT) AS gid
      FROM (SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(ROUND(value*100) AS BIGINT) AS value_cents FROM events)
      GROUP BY CUBE(event_type, day)
      ORDER BY gid, event_type, day""",

    "q_agg_stats" -> """
      SELECT ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
             ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
             ROUND(CORR(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price
      FROM lineitem""",

    "q_agg_median" -> """
      SELECT o_orderpriority,
             ROUND(quantile_cont(tp_cents, 0.5), 4) AS median_cents,
             ROUND(quantile_cont(tp_cents, 0.9), 4) AS p90_cents
      FROM (SELECT o_orderpriority,
                   CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_topk_customers" -> """
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey
      ORDER BY total_cents DESC, o_custkey LIMIT 10""",

    "q_sort_multi" -> """
      SELECT s_suppkey, s_nationkey,
             CAST(ROUND(s_acctbal*100) AS BIGINT) AS acct_cents
      FROM supplier
      ORDER BY s_nationkey ASC, acct_cents DESC, s_suppkey ASC""",

    "q_set_intersect" -> """
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      INTERSECT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      ORDER BY custkey""",

    "q_set_except" -> """
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      EXCEPT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      ORDER BY custkey""",

    "q_set_union" -> """
      SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        UNION ALL
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      ) GROUP BY custkey ORDER BY custkey""",

    "q_join_broadcast" -> """
      SELECT p_brand,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",

    "q_join_shuffle_multi" -> """
      SELECT r_name, n_name,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q_join_left_outer" -> """
      SELECT o_orderkey, CAST(COUNT(l_orderkey) AS BIGINT) AS n_lines
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey ORDER BY o_orderkey""",

    "q_join_semi" -> """
      SELECT o_orderkey, o_orderpriority FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
      ORDER BY o_orderkey""",

    "q_join_anti" -> """
      SELECT o_orderkey FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      ORDER BY o_orderkey""",

    "q_join_theta" -> """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 100 DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_join_asof" -> """
      SELECT event_id, user_id, prev_type,
             (ts_usl - prev_usl) / 1e6 AS gap_sec
      FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_usl,
                   LAG(epoch_us(ts)) OVER w AS prev_usl,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      WHERE event_type = 'purchase'
      ORDER BY event_id""",

    "q_window_rank" -> """
      SELECT o_orderpriority, o_orderkey, total_cents, rnk FROM (
        SELECT o_orderpriority, o_orderkey,
               CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents,
               CAST(RANK() OVER (PARTITION BY o_orderpriority
                    ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey)
                    AS BIGINT) AS rnk
        FROM orders)
      WHERE rnk <= 3
      ORDER BY o_orderpriority, rnk, o_orderkey""",

    "q_window_running" -> """
      SELECT user_id, event_id, running_cents, rn FROM (
        SELECT user_id, event_id,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC)
                 AS BIGINT) AS rn
        FROM events)
      WHERE rn <= 5
      ORDER BY user_id, event_id""",

    "q_window_lag_delta" -> """
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(delta_us) / (COUNT(delta_us) * 1e6), 4) AS avg_gap_sec
      FROM (SELECT user_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS delta_us
            FROM events)
      GROUP BY user_id ORDER BY user_id""",

    "q_window_ntile" -> """
      SELECT c_mktsegment, quartile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(acct_cents) AS BIGINT) AS min_cents,
             CAST(MAX(acct_cents) AS BIGINT) AS max_cents
      FROM (SELECT c_mktsegment,
                   CAST(ROUND(c_acctbal*100) AS BIGINT) AS acct_cents,
                   CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT) ASC, c_custkey ASC)
                        AS BIGINT) AS quartile
            FROM customer)
      GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile""",

    "q_scalar_string" -> """
      SELECT p_partkey,
             p_brand || ':' || p_type AS brand_type,
             CAST(LENGTH(p_name) AS BIGINT) AS name_len,
             REPLACE(p_name, ' ', '_') AS name_us,
             LPAD(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
             string_split(p_name, ' ')[1] AS first_tok,
             CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num
      FROM part ORDER BY p_partkey""",

    "q_scalar_date" -> """
      SELECT o_orderkey,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_2000,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      FROM orders ORDER BY o_orderkey""",

    "q_scalar_math" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             ROUND(SQRT(l_quantity), 4) AS sqrt_qty,
             ROUND(LN(l_quantity), 4) AS ln_qty,
             CAST(POWER(l_quantity, 2) AS BIGINT) AS qty_sq,
             CAST(ABS(l_quantity - 25) AS BIGINT) AS abs_dev,
             CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
             CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
             ROUND(l_extendedprice / 7, 2) AS price_7th
      FROM lineitem WHERE l_orderkey % 997 = 0
      ORDER BY l_orderkey, l_linenumber, qty, price_k_ceil, price_7th""",

    "q_scalar_json" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type""",

    "q_scalar_array" -> """
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim,
             ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_e,
             ROUND(CAST(embedding[64] AS DOUBLE), 4) + 0 AS last_e,
             ROUND(SQRT(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
      FROM embeddings ORDER BY vec_id""",

    // ---- §2.9 text ---------------------------------------------------------

    "q_wordcount" -> """
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 50""",

    "q_word_per_lang" -> """
      SELECT lang, word, n, rnk FROM (
        SELECT lang, word, n,
               CAST(RANK() OVER (PARTITION BY lang ORDER BY n DESC, word) AS BIGINT) AS rnk
        FROM (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents)
              GROUP BY lang, word))
      WHERE rnk <= 10 ORDER BY lang, rnk, word""",

    "q_ngram_bigrams" -> """
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT word || ' ' || LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        FROM (SELECT doc_id,
                     unnest(string_split(lower(text), ' ')) AS word,
                     generate_subscripts(string_split(lower(text), ' '), 1) AS pos
              FROM documents))
      WHERE bigram IS NOT NULL
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""",

    "q_tfidf" -> """
      WITH tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents)
                  GROUP BY doc_id, word),
           df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
      SELECT doc_id, word, tf, ROUND(tf * LN(n_docs / (df + 1)), 4) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN nn
      ORDER BY tfidf DESC, doc_id, word LIMIT 20""",

    "q_dedup_exact" -> """
      SELECT fingerprint, n, min_doc_id FROM (
        SELECT md5(text) AS fingerprint, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
        FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
        UNION ALL
        SELECT '__total_distinct__', CAST(COUNT(DISTINCT md5(text)) AS BIGINT),
               CAST(-1 AS BIGINT)
        FROM documents)
      ORDER BY fingerprint""",

    "q_neardup_jaccard" -> """
      WITH toks AS (SELECT DISTINCT doc_id, lang, source, word
                    FROM (SELECT doc_id, lang, source,
                                 unnest(string_split(lower(text), ' ')) AS word FROM documents)),
           sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
           inter AS (SELECT a.lang, a.source, a.doc_id AS d1, b.doc_id AS d2,
                            CAST(COUNT(*) AS BIGINT) AS i
                     FROM toks a JOIN toks b
                       ON a.lang = b.lang AND a.source = b.source
                      AND a.word = b.word AND a.doc_id < b.doc_id
                     GROUP BY a.lang, a.source, a.doc_id, b.doc_id)
      SELECT lang, source, d1, d2,
             ROUND(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS j
      FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8
      ORDER BY lang, source, d1, d2""",

    "q_sentiment_lexicon" -> """
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN pos > neg THEN 1 ELSE 0 END) AS BIGINT) AS pos_docs,
             CAST(SUM(CASE WHEN neg > pos THEN 1 ELSE 0 END) AS BIGINT) AS neg_docs,
             CAST(SUM(pos - neg) AS BIGINT) / CAST(SUM(n_tok) AS BIGINT) AS score_ratio
      FROM (SELECT lang, CAST(len(toks) AS BIGINT) AS n_tok,
                   CAST(len(list_filter(toks, t -> t = 'fast' OR t = 'big')) AS BIGINT) AS pos,
                   CAST(len(list_filter(toks, t -> t = 'slow' OR t = 'small')) AS BIGINT) AS neg
            FROM (SELECT lang, string_split(lower(text), ' ') AS toks FROM documents))
      GROUP BY lang ORDER BY lang""",

    "q_text_stats" -> """
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             ROUND(CAST(SUM(n_tok) AS BIGINT) / COUNT(*), 4) AS avg_tokens
      FROM (SELECT lang, source, n_chars,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok FROM documents)
      GROUP BY lang, source ORDER BY lang, source""",

    // ---- §2.10 event-time batch twins --------------------------------------

    "q_stream_tumbling" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY win_start, event_type ORDER BY win_start, event_type""",

    "q_stream_sliding" -> """
      SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT strftime(make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
                        '%Y-%m-%d %H:%M:%S') AS win_start, event_type FROM events
        UNION ALL
        SELECT strftime(make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000),
                        '%Y-%m-%d %H:%M:%S') AS win_start, event_type FROM events)
      GROUP BY win_start, event_type ORDER BY win_start, event_type""",

    "q_stream_session" -> """
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(MAX(n_events) AS BIGINT) AS max_session_events
      FROM (SELECT user_id, session_idx, COUNT(*) AS n_events
            FROM (SELECT user_id,
                         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_usl, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
                  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_usl,
                               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                                    THEN 1 ELSE 0 END AS new_session
                        FROM events
                        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)))
            GROUP BY user_id, session_idx)
      GROUP BY user_id ORDER BY user_id""",

    // ---- §2.11 vectors (integer-lattice quantization — see Vectors.scala) --

    "q_cosine_topk" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           m AS (SELECT vec_id, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM n),
           qq AS (SELECT qe AS query_qe, nrm AS query_nrm FROM m WHERE vec_id = 0)
      SELECT vec_id,
             ROUND(CAST(CAST(list_sum(list_transform(list_zip(qe, query_qe),
                       p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                   / SQRT(CAST(nrm AS DOUBLE) * CAST(query_nrm AS DOUBLE)), 4) + 0 AS cos
      FROM m, qq WHERE vec_id != 0
      ORDER BY cos DESC, vec_id LIMIT 10""",

    "q_similarity_join_topk" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label IN (0, 1)),
           m AS (SELECT vec_id, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM n)
      SELECT a.vec_id AS v1, b.vec_id AS v2,
             ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                       p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                   / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)), 4) + 0 AS cos
      FROM m a JOIN m b ON a.vec_id < b.vec_id
      ORDER BY cos DESC, v1, v2 LIMIT 20""",

    "q_knn_classify" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           queries AS (SELECT vec_id AS qid, label AS true_label, qe AS q_qe FROM n WHERE vec_id < 10),
           train AS (SELECT vec_id AS tid, label AS t_label, qe AS t_qe FROM n WHERE vec_id >= 10),
           d AS (SELECT qid, true_label, tid, t_label,
                        CAST(list_sum(list_transform(list_zip(q_qe, t_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM queries, train),
           nn5 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, tid) AS rn FROM d)
                   WHERE rn <= 5),
           votes AS (SELECT qid, true_label, t_label, COUNT(*) AS votes
                     FROM nn5 GROUP BY qid, true_label, t_label)
      SELECT qid, CAST(t_label AS BIGINT) AS predicted, CAST(true_label AS BIGINT) AS actual
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, t_label) AS vr FROM votes)
      WHERE vr = 1 ORDER BY qid""",

    // ---- §2.12 deterministic ML --------------------------------------------

    "q_linreg_normal" -> """
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM (SELECT CAST(l_quantity AS BIGINT) AS x,
                              CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y FROM lineitem))
      SELECT n,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 4) + 0 AS slope,
             ROUND((CAST(sy AS DOUBLE) -
                    ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) + 0 AS intercept,
             ROUND(((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)))
                   / ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0 AS r2
      FROM s""",

    "q_naivebayes_train" -> """
      WITH toks AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word FROM documents),
           wc AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c_wc FROM toks GROUP BY lang, word),
           cc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c_c FROM toks GROUP BY lang),
           v AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM toks),
           llh AS (SELECT lang, word,
                          CAST(ROUND(LN(CAST(c_wc + 1 AS DOUBLE) / (c_c + v)) * 1e4) AS BIGINT) AS llh_e4
                   FROM wc JOIN cc USING (lang) CROSS JOIN v),
           top AS (SELECT lang, word AS item, llh_e4 AS logp_e4, rnk FROM
                     (SELECT lang, word, llh_e4,
                             CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY llh_e4 DESC, word) AS BIGINT) AS rnk
                      FROM llh)
                   WHERE rnk <= 5),
           pr AS (SELECT lang, '__prior__' AS item,
                         CAST(ROUND(LN(CAST(n_c AS DOUBLE) / n) * 1e4) AS BIGINT) AS logp_e4,
                         CAST(0 AS BIGINT) AS rnk
                  FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_c FROM documents GROUP BY lang)
                  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents))
      SELECT lang, item, logp_e4, rnk FROM (SELECT * FROM top UNION ALL SELECT * FROM pr)
      ORDER BY lang, rnk, item""",

    "q_naivebayes_predict" -> """
      WITH toks AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word FROM documents),
           wc AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c_wc FROM toks GROUP BY lang, word),
           cc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c_c FROM toks GROUP BY lang),
           v AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM toks),
           llh AS (SELECT lang, word,
                          CAST(ROUND(LN(CAST(c_wc + 1 AS DOUBLE) / (c_c + v)) * 1e4) AS BIGINT) AS llh_e4
                   FROM wc JOIN cc USING (lang) CROSS JOIN v),
           def AS (SELECT lang, CAST(ROUND(LN(1.0 / (c_c + v)) * 1e4) AS BIGINT) AS def_e4
                   FROM cc CROSS JOIN v),
           prior AS (SELECT lang, CAST(ROUND(LN(CAST(n_c AS DOUBLE) / n) * 1e4) AS BIGINT) AS prior_e4
                     FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_c FROM documents GROUP BY lang)
                     CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)),
           dw AS (SELECT DISTINCT doc_id, word FROM toks),
           scored AS (SELECT dw.doc_id, langs.lang,
                             CAST(SUM(COALESCE(llh.llh_e4, def.def_e4)) AS BIGINT) AS tok_score
                      FROM dw CROSS JOIN (SELECT lang FROM cc) langs
                      LEFT JOIN llh ON llh.lang = langs.lang AND llh.word = dw.word
                      JOIN def ON def.lang = langs.lang
                      GROUP BY dw.doc_id, langs.lang),
           fs AS (SELECT doc_id, s.lang, tok_score + prior_e4 AS score_e4
                  FROM scored s JOIN prior ON prior.lang = s.lang),
           pred AS (SELECT doc_id, lang AS predicted FROM
                      (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_e4 DESC, lang) AS rn
                       FROM fs)
                    WHERE rn = 1),
           outp AS (SELECT p.doc_id, p.predicted, d.lang AS actual,
                           CASE WHEN p.predicted = d.lang THEN CAST(1 AS BIGINT)
                                ELSE CAST(0 AS BIGINT) END AS hit
                    FROM pred p JOIN documents d ON p.doc_id = d.doc_id)
      SELECT doc_id, predicted, actual, hit FROM outp
      UNION ALL
      SELECT CAST(-1 AS BIGINT), '__summary__', '__correct__', CAST(SUM(hit) AS BIGINT) FROM outp
      ORDER BY doc_id""",

    "q_kmeans_step" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           seeds AS (SELECT vec_id AS cluster, qe AS seed_qe FROM q WHERE vec_id <= 9),
           d AS (SELECT vec_id, cluster,
                        CAST(list_sum(list_transform(list_zip(qe, seed_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM q, seeds),
           a AS (SELECT vec_id, cluster, d2 FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d)
                 WHERE rn = 1)
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(d2) AS BIGINT) / (COUNT(*) * 1e14), 4) AS mean_dist2
      FROM a GROUP BY cluster ORDER BY cluster""",

    "q_kmeans_iter2" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT vec_id, generate_subscripts(qe, 1) - 1 AS dim, unnest(qe) AS x_e7 FROM q),
           seeds AS (SELECT vec_id AS cluster, qe AS seed_qe FROM q WHERE vec_id <= 9),
           d AS (SELECT vec_id, cluster,
                        CAST(list_sum(list_transform(list_zip(qe, seed_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM q, seeds),
           a1 AS (SELECT vec_id, cluster FROM
                    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d)
                  WHERE rn = 1),
           cent AS (SELECT cluster, dim,
                           CAST(ROUND(ROUND(CAST(SUM(x_e7) AS BIGINT) / (COUNT(*) * 1e7), 6) * 1e6) AS BIGINT) AS c_e6
                    FROM dims JOIN a1 USING (vec_id) GROUP BY cluster, dim),
           d2t AS (SELECT vec_id, cluster,
                          CAST(SUM((x_e7 - c_e6*10) * (x_e7 - c_e6*10)) AS BIGINT) AS d2
                   FROM dims JOIN cent USING (dim) GROUP BY vec_id, cluster),
           a2 AS (SELECT vec_id, cluster FROM
                    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM d2t)
                  WHERE rn = 1)
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n FROM a2 GROUP BY cluster ORDER BY cluster""",

    "q_apriori_pairs" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(COUNT(*) AS BIGINT) AS support
                     FROM items a JOIN items b
                       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                     GROUP BY a.l_partkey, b.l_partkey),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders)
      SELECT p1, p2, support FROM pairs
      WHERE support >= 3
      ORDER BY support DESC, p1, p2 LIMIT 30""",

    "q_pivot_events" -> """
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view"
      FROM events GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY day""",

    "q_unpivot_part" -> """
      SELECT p_partkey, measure, value FROM (
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS BIGINT) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retail_cents' AS measure,
               CAST(ROUND(p_retailprice*100) AS BIGINT) AS value FROM part)
      ORDER BY p_partkey, measure""",

    "q_subquery_scalar" -> """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) >
            (SELECT AVG(CAST(ROUND(o_totalprice*100) AS BIGINT)) FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_window_firstlast" -> """
      SELECT user_id, MIN(first_type) AS first_type, MIN(last_type) AS last_type,
             MIN(second_type) AS second_type
      FROM (SELECT user_id,
                   FIRST_VALUE(event_type) OVER w AS first_type,
                   LAST_VALUE(event_type) OVER w AS last_type,
                   NTH_VALUE(event_type, 2) OVER w AS second_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      GROUP BY user_id ORDER BY user_id""",

    // ---- LLM-data-pipeline extensions (TextPipeline.scala / Ann.scala) -----

    "q_token_count" -> """
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS letter_runs,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]+|[b-df-hj-np-tv-z]+')) AS BIGINT) AS subword_units,
             (n_chars * 10000) // CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS chars_per_tok_e4
      FROM documents ORDER BY doc_id""",

    "q_quality_score" -> """
      SELECT doc_id, n_tok, distinct_tok, stop_hits,
             0.4 * (1.0 - stop_hits / n_tok) + 0.3 * (distinct_tok / n_tok)
             + 0.3 * LEAST(1.0, n_tok / 50.0) AS quality
      FROM (SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tok,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS distinct_tok,
                   CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of'
                                                OR t = 'to' OR t = 'in')) AS BIGINT) AS stop_hits
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
      ORDER BY doc_id""",

    "q_doc_fingerprint" -> """
      SELECT doc_id, fingerprint,
             CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_same
      FROM (SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(lower(text), ' '),
                         t -> CAST('0x' || substring(md5(t), 1, 8) AS BIGINT))),
                     (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
            FROM documents)
      ORDER BY doc_id""",

    "q_dedup_simhash" -> """
      WITH dt AS (SELECT DISTINCT doc_id, lang, source, word FROM
                    (SELECT doc_id, lang, source,
                            unnest(string_split(lower(text), ' ')) AS word FROM documents)),
           hs AS (SELECT doc_id, lang, source,
                         CAST('0x' || substring(md5(word), 1, 8) AS BIGINT) AS h FROM dt),
           bits AS (SELECT doc_id, lang, source, j, SUM(((h >> j) & 1) * 2 - 1) AS s
                    FROM hs, (SELECT unnest(generate_series(0, 15)) AS j)
                    GROUP BY doc_id, lang, source, j),
           sim AS (SELECT doc_id, lang, source,
                          CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
                   FROM bits GROUP BY doc_id, lang, source),
           bands AS (SELECT doc_id, lang, source, simhash, band, (simhash >> (band * 4)) & 15 AS bv
                     FROM sim, (SELECT unnest(generate_series(0, 3)) AS band)),
           cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                           a.simhash AS s1, b.simhash AS s2
                    FROM bands a JOIN bands b
                      ON a.lang = b.lang AND a.source = b.source
                     AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
      SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(s1, s2)) <= 3
      ORDER BY d1, d2""",

    "q_dedup_minhash_lsh" -> """
      WITH dt AS (SELECT DISTINCT doc_id, lang, source, word FROM
                    (SELECT doc_id, lang, source,
                            unnest(string_split(lower(text), ' ')) AS word FROM documents)),
           hs AS (SELECT doc_id, lang, source, word,
                         CAST('0x' || substring(md5(word), 1, 8) AS BIGINT) AS h FROM dt),
           sig AS (SELECT doc_id, lang, source, i,
                          MIN(((2*i + 1) * h + 7919*i + 12345) % 1000000007) AS sig
                   FROM hs, (SELECT unnest(generate_series(0, 7)) AS i)
                   GROUP BY doc_id, lang, source, i),
           bands AS (SELECT doc_id, lang, source, i // 2 AS band,
                            CAST(SUM(sig * (CASE WHEN i % 2 = 0 THEN 4294967311 ELSE 1 END)) AS BIGINT) AS bv
                     FROM sig GROUP BY doc_id, lang, source, i // 2),
           cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                    FROM bands a JOIN bands b
                      ON a.lang = b.lang AND a.source = b.source
                     AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
           sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM dt GROUP BY doc_id),
           inter AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS i
                     FROM cand
                     JOIN dt ta ON ta.doc_id = d1
                     JOIN dt tb ON tb.doc_id = d2 AND tb.word = ta.word
                     GROUP BY d1, d2)
      SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS j
      FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5
      ORDER BY d1, d2""",

    "q_langid_ngram" -> """
      WITH grams AS (SELECT doc_id, lang,
                            unnest(list_transform(generate_series(1, length(text) - 1),
                                   i -> substring(text, i, 2))) AS gram
                     FROM documents),
           lc AS (SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY lang, gram),
           lt AS (SELECT lang AS cand_lang, gram, lrank FROM
                    (SELECT lang, gram,
                            CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS BIGINT) AS lrank
                     FROM lc)
                  WHERE lrank <= 20),
           dc AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY doc_id, gram),
           dtp AS (SELECT doc_id, gram, drank FROM
                     (SELECT doc_id, gram,
                             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS BIGINT) AS drank
                      FROM dc)
                   WHERE drank <= 20),
           langs AS (SELECT DISTINCT lang AS cand_lang FROM documents),
           dist AS (SELECT dtp.doc_id, langs.cand_lang AS cand_lang,
                           CAST(SUM(COALESCE(ABS(drank - lrank), 20)) AS BIGINT) AS dist
                    FROM dtp CROSS JOIN langs
                    LEFT JOIN lt ON lt.cand_lang = langs.cand_lang AND lt.gram = dtp.gram
                    GROUP BY dtp.doc_id, langs.cand_lang),
           best AS (SELECT doc_id, cand_lang AS predicted, dist FROM
                      (SELECT doc_id, cand_lang, dist,
                              ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, cand_lang) AS rn
                       FROM dist)
                    WHERE rn = 1)
      SELECT b.doc_id, b.predicted, d.lang AS actual, b.dist
      FROM best b JOIN documents d ON b.doc_id = d.doc_id
      ORDER BY b.doc_id""",

    "q_neardup_embedding" -> """
      WITH m AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           n AS (SELECT vec_id, label, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM m)
      SELECT a.label AS label, a.vec_id AS v1, b.vec_id AS v2,
             ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                   / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)), 4) + 0 AS cos
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
            / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) >= 0.25
      ORDER BY label, v1, v2""",

    "q_ann_ivf" -> """
      WITH m AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           n AS (SELECT vec_id, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM m),
           seeds AS (SELECT vec_id AS cell, qe AS seed_qe FROM n WHERE vec_id <= 9),
           ad AS (SELECT vec_id, cell,
                         CAST(list_sum(list_transform(list_zip(qe, seed_qe),
                              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                  FROM n, seeds),
           assigned AS (SELECT vec_id, cell FROM
                          (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                           FROM ad)
                        WHERE rn = 1),
           aa AS (SELECT n.vec_id, assigned.cell, n.qe, n.nrm
                  FROM n JOIN assigned ON n.vec_id = assigned.vec_id),
           queries AS (SELECT vec_id AS qid, cell, qe AS q_qe, nrm AS q_nrm
                       FROM aa WHERE vec_id BETWEEN 10 AND 14),
           cands AS (SELECT q.qid, a.vec_id,
                            ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, q.q_qe), p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                                  / SQRT(CAST(a.nrm AS DOUBLE) * CAST(q.q_nrm AS DOUBLE)), 4) + 0 AS cos
                     FROM aa a JOIN queries q ON a.cell = q.cell AND a.vec_id != q.qid)
      SELECT qid, vec_id, cos, rnk FROM
        (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
         FROM cands)
      WHERE rnk <= 5 ORDER BY qid, rnk, vec_id""",

    "q_ann_rplsh" -> """
      WITH hp AS (SELECT p, d,
                         CASE WHEN CAST('0x' || substring(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                              THEN 1 ELSE -1 END AS s
                  FROM range(0, 8) t1(p), range(0, 64) t2(d)),
           m AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           n AS (SELECT vec_id, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM m),
           dims AS (SELECT vec_id, generate_subscripts(qe, 1) - 1 AS d, unnest(qe) AS x FROM n),
           proj AS (SELECT vec_id, p, CAST(SUM(s * x) AS BIGINT) AS proj
                    FROM dims JOIN hp USING (d) GROUP BY vec_id, p),
           buckets AS (SELECT vec_id,
                              CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
                       FROM proj GROUP BY vec_id),
           wb AS (SELECT n.vec_id, n.qe, n.nrm, buckets.bucket
                  FROM n JOIN buckets ON n.vec_id = buckets.vec_id),
           query AS (SELECT bucket, qe AS q_qe, nrm AS q_nrm FROM wb WHERE vec_id = 0),
           cands AS (SELECT a.vec_id,
                            ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, q.q_qe), p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                                  / SQRT(CAST(a.nrm AS DOUBLE) * CAST(q.q_nrm AS DOUBLE)), 4) + 0 AS cos
                     FROM wb a JOIN query q ON a.bucket = q.bucket AND a.vec_id != 0)
      SELECT vec_id, cos, rnk FROM
        (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk FROM cands)
      WHERE rnk <= 5 ORDER BY rnk, vec_id""",

    // ---- round 2: sampling / splits / profiling / LM / frames (§2.15) ------

    "q_sample_hash_split" -> """
      SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM (SELECT lang, n_chars,
                   CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT lang, n_chars,
                         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 AS b
                  FROM documents))
      GROUP BY lang, split ORDER BY lang, split""",

    "q_sample_stratified" -> """
      SELECT lang, source, doc_id, rk FROM (
        SELECT lang, source, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS BIGINT) AS rk
        FROM (SELECT lang, source, doc_id,
                     CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
              FROM documents))
      WHERE rk <= 5 ORDER BY lang, source, rk""",

    "q_sample_weighted" -> """
      SELECT lang, rk, doc_id, n_chars, prio FROM (
        SELECT lang, doc_id, n_chars, prio,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY prio DESC, doc_id ASC) AS BIGINT) AS rk
        FROM (SELECT lang, doc_id, n_chars,
                     CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) * n_chars AS prio
              FROM documents))
      WHERE rk <= 20 ORDER BY lang, rk""",

    "q_mixture_plan" -> """
      WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
           t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
           w(lang, w_e4) AS (VALUES ('en', 4000), ('zh', 2000), ('de', 1500),
                                    ('es', 1500), ('fr', 1000))
      SELECT lang, n_docs, CAST(w_e4 AS BIGINT) AS w_e4,
             n_total * w_e4 // 10000 AS target_docs,
             LEAST(1000000, (n_total * w_e4 // 10000) * 1000000 // n_docs) AS rate_e6
      FROM c JOIN w USING (lang), t
      ORDER BY lang""",

    "q_hist_value" -> """
      WITH v AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS v FROM events),
           b AS (SELECT CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi FROM v)
      SELECT ((v - lo) * 10) // (hi - lo + 1) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sum_cents
      FROM v, b GROUP BY bucket ORDER BY bucket""",

    "q_feature_stats" -> """
      WITH q AS (SELECT list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT CAST(generate_subscripts(qe, 1) - 1 AS BIGINT) AS dim, unnest(qe) AS x_e7 FROM q),
           s AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(MIN(x_e7) AS BIGINT) AS min_e7, CAST(MAX(x_e7) AS BIGINT) AS max_e7,
                        CAST(SUM(x_e7) AS BIGINT) AS sx,
                        SUM(CAST(x_e7 AS HUGEINT) * x_e7) AS sxx
                 FROM dims GROUP BY dim)
      SELECT dim, n, min_e7, max_e7,
             ROUND(CAST(sx AS DOUBLE) / (n * 1e7), 6) + 0 AS mean,
             ROUND((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                   / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)*1e14), 6) + 0 AS variance
      FROM s ORDER BY dim""",

    "q_grouping_sets" -> """
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(day, 'ALL') AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(value_cents) AS BIGINT) AS value_cents,
             CAST(GROUPING(event_type, day) AS BIGINT) AS gid
      FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(ROUND(value*100) AS BIGINT) AS value_cents FROM events)
      GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
      ORDER BY gid, event_type, day""",

    "q_window_range_frame" -> """
      SELECT o_custkey, o_orderkey, day_num, tp_cents,
             CAST(SUM(tp_cents) OVER (PARTITION BY o_custkey ORDER BY day_num
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum30_cents
      FROM (SELECT o_custkey, o_orderkey,
                   CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
                   CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents
            FROM orders)
      ORDER BY o_custkey, day_num, o_orderkey""",

    "q_join_range_bin" -> """
      SELECT CAST(tier AS BIGINT) AS tier, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(tp_cents) AS BIGINT) AS sum_cents
      FROM (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents FROM orders)
      JOIN (VALUES (1, 0, 10000000), (2, 10000000, 20000000), (3, 20000000, 30000000),
                   (4, 30000000, 40000000), (5, 40000000, 1000000000000)) tiers(tier, lo, hi)
        ON tp_cents >= lo AND tp_cents < hi
      GROUP BY tier ORDER BY tier""",

    "q_ngram_lm" -> """
      WITH bg AS (SELECT w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                  FROM (SELECT doc_id,
                               unnest(string_split(lower(text), ' ')) AS w1,
                               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                        FROM documents)),
           c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                 FROM bg WHERE w2 IS NOT NULL GROUP BY w1, w2),
           t AS (SELECT w1, w2, c12, CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1 FROM c)
      SELECT w1, w2, c12, (c12 * 1000000) // c1 AS p_e6
      FROM t WHERE c12 >= 5
      ORDER BY p_e6 DESC, w1, w2 LIMIT 30""",

    "q_dedup_apply" -> """
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(keep) AS BIGINT) AS n_kept,
             CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_removed
      FROM (SELECT lang, source,
                   CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
                        THEN 1 ELSE 0 END AS keep
            FROM documents)
      GROUP BY lang, source ORDER BY lang, source""",

    "q_stream_dedup" -> """
      WITH e AS (SELECT event_type, user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
           r AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_raw FROM e GROUP BY event_type),
           u AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
                 FROM (SELECT DISTINCT event_type, user_id, day FROM e) GROUP BY event_type)
      SELECT event_type, n_raw, n_unique FROM r JOIN u USING (event_type)
      ORDER BY event_type""",

    "q_corr_matrix" -> """
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(q) AS BIGINT) AS s_q, CAST(SUM(p) AS BIGINT) AS s_p,
                        CAST(SUM(d) AS BIGINT) AS s_d, CAST(SUM(t) AS BIGINT) AS s_t,
                        SUM(CAST(q AS HUGEINT) * q) AS s_qq, SUM(CAST(p AS HUGEINT) * p) AS s_pp,
                        SUM(CAST(d AS HUGEINT) * d) AS s_dd, SUM(CAST(t AS HUGEINT) * t) AS s_tt,
                        SUM(CAST(q AS HUGEINT) * p) AS s_qp, SUM(CAST(q AS HUGEINT) * d) AS s_qd,
                        SUM(CAST(q AS HUGEINT) * t) AS s_qt, SUM(CAST(p AS HUGEINT) * d) AS s_pd,
                        SUM(CAST(p AS HUGEINT) * t) AS s_pt, SUM(CAST(d AS HUGEINT) * t) AS s_dt
                 FROM (SELECT CAST(l_quantity AS BIGINT) AS q,
                              CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p,
                              CAST(ROUND(l_discount*100) AS BIGINT) AS d,
                              CAST(ROUND(l_tax*100) AS BIGINT) AS t
                       FROM lineitem))
      SELECT pair, r FROM (
        SELECT 'qty_price' AS pair,
               ROUND((CAST(n AS DOUBLE)*CAST(s_qp AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_p AS DOUBLE))
                     / SQRT((CAST(n AS DOUBLE)*CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE)*CAST(s_p AS DOUBLE))), 4) + 0 AS r
        FROM s
        UNION ALL
        SELECT 'qty_disc',
               ROUND((CAST(n AS DOUBLE)*CAST(s_qd AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_d AS DOUBLE))
                     / SQRT((CAST(n AS DOUBLE)*CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))), 4) + 0
        FROM s
        UNION ALL
        SELECT 'qty_tax',
               ROUND((CAST(n AS DOUBLE)*CAST(s_qt AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_t AS DOUBLE))
                     / SQRT((CAST(n AS DOUBLE)*CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(s_tt AS DOUBLE) - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE))), 4) + 0
        FROM s
        UNION ALL
        SELECT 'price_disc',
               ROUND((CAST(n AS DOUBLE)*CAST(s_pd AS DOUBLE) - CAST(s_p AS DOUBLE)*CAST(s_d AS DOUBLE))
                     / SQRT((CAST(n AS DOUBLE)*CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE)*CAST(s_p AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))), 4) + 0
        FROM s
        UNION ALL
        SELECT 'price_tax',
               ROUND((CAST(n AS DOUBLE)*CAST(s_pt AS DOUBLE) - CAST(s_p AS DOUBLE)*CAST(s_t AS DOUBLE))
                     / SQRT((CAST(n AS DOUBLE)*CAST(s_pp AS DOUBLE) - CAST(s_p AS DOUBLE)*CAST(s_p AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(s_tt AS DOUBLE) - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE))), 4) + 0
        FROM s
        UNION ALL
        SELECT 'disc_tax',
               ROUND((CAST(n AS DOUBLE)*CAST(s_dt AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_t AS DOUBLE))
                     / SQRT((CAST(n AS DOUBLE)*CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))
                          * (CAST(n AS DOUBLE)*CAST(s_tt AS DOUBLE) - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE))), 4) + 0
        FROM s)
      ORDER BY pair""",

    // ---- round 2 batch 2: outer join / agg idioms / profiling / LM ---------

    "q_join_full_outer" -> """
      WITH o AS (SELECT o_custkey, EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS yr,
                        CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp FROM orders),
           a AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n96, CAST(SUM(tp) AS BIGINT) AS cents96
                 FROM o WHERE yr = 1996 GROUP BY o_custkey),
           b AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n97, CAST(SUM(tp) AS BIGINT) AS cents97
                 FROM o WHERE yr = 1997 GROUP BY o_custkey)
      SELECT o_custkey, COALESCE(n96, 0) AS n96, COALESCE(cents96, 0) AS cents96,
             COALESCE(n97, 0) AS n97, COALESCE(cents97, 0) AS cents97
      FROM a FULL OUTER JOIN b USING (o_custkey)
      ORDER BY o_custkey""",

    "q_agg_argmax" -> """
      WITH t AS (SELECT o_orderpriority AS pr, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp,
                        o_orderkey AS k FROM orders),
           mx AS (SELECT pr, tp AS max_cents, k AS max_key FROM
                    (SELECT *, ROW_NUMBER() OVER (PARTITION BY pr ORDER BY tp DESC, k DESC) AS rn FROM t)
                  WHERE rn = 1),
           mn AS (SELECT pr, tp AS min_cents, k AS min_key FROM
                    (SELECT *, ROW_NUMBER() OVER (PARTITION BY pr ORDER BY tp ASC, k ASC) AS rn FROM t)
                  WHERE rn = 1),
           c AS (SELECT pr, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY pr)
      SELECT c.pr AS o_orderpriority, n, max_cents, max_key, min_cents, min_key
      FROM c JOIN mx USING (pr) JOIN mn USING (pr)
      ORDER BY o_orderpriority""",

    "q_agg_collect" -> """
      WITH s AS (SELECT s_nationkey, s_name, CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal FROM supplier),
           r AS (SELECT s_nationkey, s_name, bal,
                        ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY bal DESC, s_name ASC) AS rn
                 FROM s),
           top AS (SELECT s_nationkey, string_agg(s_name, ',' ORDER BY rn) AS top5
                   FROM r WHERE rn <= 5 GROUP BY s_nationkey),
           tot AS (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
                          CAST(SUM(bal) AS BIGINT) AS bal_cents
                   FROM s GROUP BY s_nationkey)
      SELECT n_name, n_sup, bal_cents, top5
      FROM tot JOIN top USING (s_nationkey) JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_name""",

    "q_window_percentiles" -> """
      SELECT c_mktsegment, c_custkey, bal,
             ROUND(PERCENT_RANK() OVER w, 4) + 0 AS pr,
             ROUND(CUME_DIST() OVER w, 4) + 0 AS cd
      FROM (SELECT c_mktsegment, c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal FROM customer)
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal)
      ORDER BY c_mktsegment, bal, c_custkey""",

    "q_seq_pack" -> """
      SELECT lang, cum_before // 4096 AS pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM (SELECT lang, n_chars,
                   CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
            FROM documents)
      GROUP BY lang, pack_id ORDER BY lang, pack_id""",

    "q_doc_length_buckets" -> """
      SELECT lang, bucket, n, n * 10000 // CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS share_e4
      FROM (SELECT lang, n_chars // 128 AS bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang, bucket)
      ORDER BY lang, bucket""",

    "q_anomaly_zscore" -> """
      WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS v FROM events),
           s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
                        SUM(CAST(v AS HUGEINT) * v) AS sxx
                 FROM v GROUP BY event_type),
           f AS (SELECT v.event_type, v.v,
                        CASE WHEN (CAST(v.v AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(v.v AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                               > 9.0 * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                             THEN 1 ELSE 0 END AS is_out
                 FROM v JOIN s ON v.event_type = s.event_type)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(is_out) AS BIGINT) AS n_out,
             CAST(COALESCE(MIN(CASE WHEN is_out = 1 THEN v END), 0) AS BIGINT) AS min_out,
             CAST(COALESCE(MAX(CASE WHEN is_out = 1 THEN v END), 0) AS BIGINT) AS max_out
      FROM f GROUP BY event_type ORDER BY event_type""",

    "q_minmax_scale" -> """
      WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT vec_id, CAST(generate_subscripts(qe, 1) - 1 AS BIGINT) AS dim, unnest(qe) AS x FROM q),
           b AS (SELECT dim, CAST(MIN(x) AS BIGINT) AS mn, CAST(MAX(x) AS BIGINT) AS mx
                 FROM dims GROUP BY dim),
           sc AS (SELECT vec_id,
                         CASE WHEN mx = mn THEN 0 ELSE (x - mn) * 1000000 // (mx - mn) END AS scaled_e6
                  FROM dims JOIN b USING (dim))
      SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims, CAST(SUM(scaled_e6) AS BIGINT) AS sum_e6,
             CAST(MIN(scaled_e6) AS BIGINT) AS min_e6, CAST(MAX(scaled_e6) AS BIGINT) AS max_e6
      FROM sc GROUP BY vec_id ORDER BY vec_id""",

    "q_contamination" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
                          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                   FROM documents),
           tri AS (SELECT DISTINCT doc_id, w1 || ' ' || w2 || ' ' || w3 AS sh FROM
                     (SELECT doc_id, w AS w1,
                             LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
                             LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
                      FROM tok)
                   WHERE w3 IS NOT NULL),
           bench AS (SELECT DISTINCT sh FROM tri WHERE doc_id % 100 < 5),
           cand AS (SELECT * FROM tri WHERE doc_id % 100 >= 5)
      SELECT doc_id, n_shingles, n_shared, n_shared * 10000 // n_shingles AS overlap_e4
      FROM (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
            FROM cand c LEFT JOIN bench b ON c.sh = b.sh
            GROUP BY c.doc_id)
      WHERE n_shared > 0 ORDER BY doc_id""",

    "q_lm_score" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
                          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                   FROM documents),
           b AS (SELECT doc_id, w1, w2 FROM
                   (SELECT doc_id, w AS w1, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok)
                 WHERE w2 IS NOT NULL),
           c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM b GROUP BY w1, w2),
           m AS (SELECT w1, w2, (c12 * 1000000) // c1 AS p_e6 FROM
                   (SELECT w1, w2, c12, CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1 FROM c)
                 WHERE c12 >= 5)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bg,
             CAST(COUNT(m.p_e6) AS BIGINT) AS covered,
             CAST(COALESCE(SUM(m.p_e6), 0) AS BIGINT) AS score_e6,
             CAST(CASE WHEN COUNT(m.p_e6) = 0 THEN 0
                       ELSE COALESCE(SUM(m.p_e6), 0) // COUNT(m.p_e6) END AS BIGINT) AS avg_p_e6
      FROM b LEFT JOIN m ON b.w1 = m.w1 AND b.w2 = m.w2
      GROUP BY doc_id ORDER BY doc_id""",

    // ---- round 2 batch 4: funnel / retention / fuzzy / spearman ------------

    "q_funnel" -> """
      WITH e AS (SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS t FROM events),
           s1 AS (SELECT user_id, MIN(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
           s2 AS (SELECT e.user_id, MIN(t) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
                  WHERE event_type = 'click' AND t > t1 GROUP BY e.user_id),
           s3 AS (SELECT e.user_id, MIN(t) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
                  WHERE event_type = 'purchase' AND t > t2 GROUP BY e.user_id)
      SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e) AS n_users,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_view_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_view_click_purchase""",

    "q_retention" -> """
      WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
           cohort AS (SELECT user_id, MIN(d) AS c FROM act GROUP BY user_id)
      SELECT strftime(c, '%Y-%m-%d') AS cohort_day,
             CAST(date_diff('day', c, d) AS BIGINT) AS "offset",
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM act JOIN cohort USING (user_id)
      WHERE date_diff('day', c, d) <= 7
      GROUP BY cohort_day, "offset" ORDER BY cohort_day, "offset"""",

    "q_fuzzy_match" -> """
      WITH p AS (SELECT a.s_nationkey AS nationkey,
                        CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS d,
                        a.s_name AS n1, b.s_name AS n2
                 FROM supplier a JOIN supplier b
                   ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
                 WHERE levenshtein(a.s_name, b.s_name) <= 2),
           agg AS (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                          CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1
                   FROM p GROUP BY nationkey),
           best AS (SELECT nationkey, d AS best_d, n1 AS best_1, n2 AS best_2 FROM
                      (SELECT *, ROW_NUMBER() OVER (PARTITION BY nationkey ORDER BY d, n1, n2) AS rn FROM p)
                    WHERE rn = 1)
      SELECT CAST(nationkey AS BIGINT) AS nationkey, n_pairs, n_d1, best_d, best_1, best_2
      FROM agg JOIN best USING (nationkey) ORDER BY nationkey""",

    "q_corr_spearman" -> """
      WITH t AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
                        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p FROM lineitem),
           r AS (SELECT flag,
                        CAST(RANK() OVER (PARTITION BY flag ORDER BY q) AS BIGINT) AS rq,
                        CAST(RANK() OVER (PARTITION BY flag ORDER BY p) AS BIGINT) AS rp
                 FROM t),
           s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(rq) AS BIGINT) AS sq, CAST(SUM(rp) AS BIGINT) AS sp,
                        SUM(CAST(rq AS HUGEINT) * rq) AS sqq, SUM(CAST(rp AS HUGEINT) * rp) AS spp,
                        SUM(CAST(rq AS HUGEINT) * rp) AS sqp
                 FROM r GROUP BY flag)
      SELECT flag, n,
             ROUND((CAST(n AS DOUBLE)*CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE)*CAST(sp AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE)*CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE))
                        * (CAST(n AS DOUBLE)*CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)*CAST(sp AS DOUBLE))), 4) + 0 AS rho
      FROM s ORDER BY flag""",

    "q_join_interval" -> """
      WITH ev AS (SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
           p AS (SELECT user_id, event_id AS p_id, t AS p_ts FROM ev WHERE event_type = 'purchase')
      SELECT p_id, CAST(COUNT(*) AS BIGINT) AS n_nearby,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks
      FROM p JOIN ev ON p.user_id = ev.user_id
       AND ev.event_id <> p.p_id
       AND ev.t >= p.p_ts - 300000000 AND ev.t <= p.p_ts + 300000000
      GROUP BY p_id ORDER BY p_id""",

    "q_agg_weighted" -> """
      SELECT l_returnflag, CAST(SUM(q) AS BIGINT) AS sum_qty,
             ROUND(CAST(SUM(CAST(p AS HUGEINT) * q) AS DOUBLE)
                   / (CAST(SUM(q) AS DOUBLE) * 100.0), 4) + 0 AS wavg_price
      FROM (SELECT l_returnflag, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p,
                   CAST(l_quantity AS BIGINT) AS q FROM lineitem)
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_recursive_calendar" -> """
      WITH RECURSIVE
        ed AS (SELECT CAST(ts AS DATE) AS d FROM events),
        bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ed),
        days(d) AS (
          SELECT lo FROM bounds
          UNION ALL
          SELECT days.d + INTERVAL 1 DAY FROM days, bounds WHERE days.d < bounds.hi),
        daily AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM ed GROUP BY d)
      SELECT strftime(CAST(days.d AS DATE), '%Y-%m-%d') AS day,
             CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
      FROM days LEFT JOIN daily ON days.d = daily.d
      ORDER BY day""",

    "q_window_ewma" -> """
      SELECT user_id, event_id, v,
             COALESCE(LAG(v, 0) OVER w, 0) * 1000000
           + COALESCE(LAG(v, 1) OVER w, 0) * 500000
           + COALESCE(LAG(v, 2) OVER w, 0) * 250000
           + COALESCE(LAG(v, 3) OVER w, 0) * 125000
           + COALESCE(LAG(v, 4) OVER w, 0) * 62500
           + COALESCE(LAG(v, 5) OVER w, 0) * 31250
           + COALESCE(LAG(v, 6) OVER w, 0) * 15625
           + COALESCE(LAG(v, 7) OVER w, 0) * 7812 AS ewma_e6
      FROM (SELECT user_id, event_id, epoch_us(ts) AS tu,
                   CAST(ROUND(value*100) AS BIGINT) AS v FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY tu ASC, event_id ASC)
      ORDER BY user_id, event_id""",

    "q_chi_square" -> """
      WITH obs AS (SELECT l_returnflag AS f, l_linestatus AS s, CAST(COUNT(*) AS BIGINT) AS o
                   FROM lineitem GROUP BY f, s),
           m AS (SELECT f, s, o,
                        CAST(SUM(o) OVER (PARTITION BY f) AS BIGINT) AS rowtot,
                        CAST(SUM(o) OVER (PARTITION BY s) AS BIGINT) AS coltot,
                        CAST(SUM(o) OVER () AS BIGINT) AS n
                 FROM obs),
           cells AS (SELECT f, s, n,
                            CAST(ROUND((CAST(o AS DOUBLE) - CAST(rowtot AS DOUBLE)*CAST(coltot AS DOUBLE)/CAST(n AS DOUBLE))
                                     * (CAST(o AS DOUBLE) - CAST(rowtot AS DOUBLE)*CAST(coltot AS DOUBLE)/CAST(n AS DOUBLE))
                                     / (CAST(rowtot AS DOUBLE)*CAST(coltot AS DOUBLE)/CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS term_e6
                     FROM m)
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT f) AS BIGINT) AS n_flags,
             CAST(COUNT(DISTINCT s) AS BIGINT) AS n_statuses,
             CAST((COUNT(DISTINCT f) - 1) * (COUNT(DISTINCT s) - 1) AS BIGINT) AS dof,
             ROUND(CAST(SUM(term_e6) AS DOUBLE) / 1e6, 4) + 0 AS chi2
      FROM cells""",

    "q_binary_meta" -> """
      SELECT doc_id, n_bytes, fp, substring(h, 1, 16) AS header,
             array_to_string(list_transform([0, 1, 2, 3, 4],
               i -> substring(h, i*128 + 1, 2)), '') AS sample
      FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS fp, lower(hex(encode(text))) AS h
            FROM documents)
      ORDER BY doc_id""",

    // ---- round 2 batch 3: components / salting / entropy / PMI / mode ------

    "q_dedup_components" -> """
      WITH RECURSIVE
        fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
        ex AS (SELECT m AS a, doc_id AS b FROM
                 (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS m FROM fp)
               WHERE m <> doc_id),
        toks AS (SELECT DISTINCT doc_id, lang, source, word
                 FROM (SELECT doc_id, lang, source,
                              unnest(string_split(lower(text), ' ')) AS word FROM documents)),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS i
                  FROM toks a JOIN toks b
                    ON a.lang = b.lang AND a.source = b.source
                   AND a.word = b.word AND a.doc_id < b.doc_id
                  GROUP BY a.doc_id, b.doc_id),
        near AS (SELECT d1 AS a, d2 AS b
                 FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
                 WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8),
        e AS (SELECT a, b FROM ex UNION SELECT a, b FROM near),
        und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        verts AS (SELECT DISTINCT a AS v FROM und),
        reach AS (SELECT v AS src, v AS dst FROM verts
                  UNION
                  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
        comp AS (SELECT src AS v, MIN(dst) AS comp FROM reach GROUP BY src)
      SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(MAX(v) AS BIGINT) AS max_doc
      FROM comp GROUP BY comp ORDER BY comp""",

    "q_join_salted" -> """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_token_entropy" -> """
      WITH c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents)
                 GROUP BY lang, word),
           t AS (SELECT lang, c,
                        CAST(ROUND(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)) * 1e4) AS BIGINT) AS clnc_e4
                 FROM c),
           s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab, CAST(SUM(c) AS BIGINT) AS n_tokens,
                        CAST(SUM(clnc_e4) AS BIGINT) AS s_e4
                 FROM t GROUP BY lang)
      SELECT lang, vocab, n_tokens,
             ROUND(LN(CAST(n_tokens AS DOUBLE))
                   - CAST(s_e4 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1e4), 4) + 0 AS entropy
      FROM s ORDER BY lang""",

    "q_colloc_pmi" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
                          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                   FROM documents),
           b AS (SELECT w1, w2 FROM
                   (SELECT doc_id, w AS w1, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok)
                 WHERE w2 IS NOT NULL),
           c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM b GROUP BY w1, w2),
           m AS (SELECT w1, w2, c12,
                        CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
                        CAST(SUM(c12) OVER (PARTITION BY w2) AS BIGINT) AS c2,
                        CAST(SUM(c12) OVER () AS BIGINT) AS n
                 FROM c)
      SELECT w1, w2, c12,
             CAST(ROUND(LN((CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE))
                           / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) * 1e4) AS BIGINT) AS pmi_e4
      FROM m WHERE c12 >= 5
      ORDER BY pmi_e4 DESC, w1, w2 LIMIT 30""",

    "q_agg_mode" -> """
      SELECT l_returnflag, qty AS mode_qty, cnt AS mode_cnt FROM (
        SELECT l_returnflag, qty, cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, qty DESC) AS rn
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY l_returnflag, qty))
      WHERE rn = 1 ORDER BY l_returnflag""",

    "q_pii_redact" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN digits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_digits,
             CAST(SUM(runs) AS BIGINT) AS total_runs,
             CAST(SUM(digits) AS BIGINT) AS total_digits,
             CAST(SUM(red_len) AS BIGINT) AS total_red_len
      FROM (SELECT event_type,
                   CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS runs,
                   CAST(length(regexp_replace(props, '[^0-9]', '', 'g')) AS BIGINT) AS digits,
                   CAST(length(regexp_replace(props, '[0-9]+', '#', 'g')) AS BIGINT) AS red_len
            FROM events)
      GROUP BY event_type ORDER BY event_type""",

    "q_matmul" -> """
      WITH a AS (SELECT l_orderkey % 50 AS i, l_partkey % 40 AS j,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS a
                 FROM lineitem GROUP BY 1, 2),
           b AS (SELECT p_partkey % 40 AS j, p_size % 20 AS k,
                        CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS b
                 FROM part GROUP BY 1, 2)
      SELECT a.i, b.k, CAST(SUM(a.a * b.b) AS BIGINT) AS c
      FROM a JOIN b USING (j)
      GROUP BY a.i, b.k ORDER BY i, k""",

    "q_pagerank" -> """
      WITH lagd AS (SELECT event_type AS dst,
                           LAG(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY epoch_us(ts), event_id) AS src
                    FROM events),
           edges AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
                     FROM lagd WHERE src IS NOT NULL GROUP BY 1, 2),
           outs AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY 1),
           en AS (SELECT e.src, e.dst, e.w, o.out_w FROM edges e JOIN outs o USING (src)),
           nodes AS (SELECT DISTINCT event_type AS v FROM events),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
           p0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS p FROM nodes),
           p1 AS (SELECT nodes.v,
                         CAST(150000000000 // (SELECT n FROM nn)
                              + COALESCE(SUM(((p0.p * 85) // (100 * en.out_w)) * en.w), 0)
                           AS BIGINT) AS p
                  FROM nodes LEFT JOIN en ON en.dst = nodes.v
                             LEFT JOIN p0 ON p0.v = en.src
                  GROUP BY nodes.v),
           p2 AS (SELECT nodes.v,
                         CAST(150000000000 // (SELECT n FROM nn)
                              + COALESCE(SUM(((p1.p * 85) // (100 * en.out_w)) * en.w), 0)
                           AS BIGINT) AS p
                  FROM nodes LEFT JOIN en ON en.dst = nodes.v
                             LEFT JOIN p1 ON p1.v = en.src
                  GROUP BY nodes.v),
           p3 AS (SELECT nodes.v,
                         CAST(150000000000 // (SELECT n FROM nn)
                              + COALESCE(SUM(((p2.p * 85) // (100 * en.out_w)) * en.w), 0)
                           AS BIGINT) AS p
                  FROM nodes LEFT JOIN en ON en.dst = nodes.v
                             LEFT JOIN p2 ON p2.v = en.src
                  GROUP BY nodes.v)
      SELECT p1.v, p1.p AS p1, p2.p AS p2, p3.p AS p3
      FROM p1 JOIN p2 USING (v) JOIN p3 USING (v)
      ORDER BY v""",

    "q_tree_split" -> """
      WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
                        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
                 FROM lineitem GROUP BY 1),
           cum AS (SELECT t.q AS t,
                          CAST(SUM(s.ca) AS BIGINT) AS la,
                          CAST(SUM(s.cn) AS BIGINT) AS ln_,
                          CAST(SUM(s.cr) AS BIGINT) AS lr
                   FROM h t JOIN h s ON s.q <= t.q GROUP BY t.q),
           tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cn) AS BIGINT) AS tn,
                          CAST(SUM(cr) AS BIGINT) AS tr
                   FROM h)
      SELECT t, nl, nr,
             ROUND(
               (1.0 - (ta*1.0/nt)*(ta*1.0/nt) - (tn*1.0/nt)*(tn*1.0/nt) - (tr*1.0/nt)*(tr*1.0/nt))
               - (nl*1.0/nt) * (1.0 - (la*1.0/nl)*(la*1.0/nl) - (ln_*1.0/nl)*(ln_*1.0/nl)
                                    - (lr*1.0/nl)*(lr*1.0/nl))
               - (nr*1.0/nt) * (1.0 - ((ta-la)*1.0/nr)*((ta-la)*1.0/nr)
                                    - ((tn-ln_)*1.0/nr)*((tn-ln_)*1.0/nr)
                                    - ((tr-lr)*1.0/nr)*((tr-lr)*1.0/nr)),
               6) + 0 AS gain_r6
      FROM (SELECT cum.t, cum.la, cum.ln_, cum.lr, tot.ta, tot.tn, tot.tr,
                   CAST(cum.la + cum.ln_ + cum.lr AS BIGINT) AS nl,
                   CAST(tot.ta + tot.tn + tot.tr AS BIGINT) AS nt,
                   CAST(tot.ta + tot.tn + tot.tr - cum.la - cum.ln_ - cum.lr AS BIGINT) AS nr
            FROM cum CROSS JOIN tot)
      WHERE nr > 0
      ORDER BY t""",

    "q_logreg_step" -> """
      SELECT n, g0, g1, g2,
             ROUND(-g0 / (2.0 * n), 8) + 0 AS w0_r8,
             ROUND(-g1 / (2.0 * n), 8) + 0 AS w1_r8,
             ROUND(-g2 / (2.0 * n), 8) + 0 AS w2_r8
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(1 - 2*y) AS BIGINT) AS g0,
                   CAST(SUM((1 - 2*y) * x1) AS BIGINT) AS g1,
                   CAST(SUM((1 - 2*y) * x2) AS BIGINT) AS g2
            FROM (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                         CAST(l_quantity AS BIGINT) AS x1,
                         CAST(ROUND(l_discount*100) AS BIGINT) AS x2
                  FROM lineitem))""",

    "q_inverted_index" -> """
      WITH t AS (SELECT DISTINCT doc_id, term
                 FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                       FROM documents)),
           ranked AS (SELECT doc_id, term,
                             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
                      FROM t),
           posting AS (SELECT term,
                              string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
                       FROM ranked WHERE rn <= 15 GROUP BY term),
           dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY term)
      SELECT dfs.term, dfs.df, posting.postings
      FROM dfs JOIN posting USING (term)
      ORDER BY term""",

    "q_hll_estimate" -> """
      WITH hp AS (SELECT CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM lineitem),
           bp AS (SELECT h // 16777216 AS idx,
                         CASE WHEN h % 16777216 = 0 THEN 25
                              ELSE 25 - length(bin(h % 16777216)) END AS rank
                  FROM hp),
           mp AS (SELECT idx, MAX(rank) AS m FROM bp GROUP BY idx),
           ap AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb,
                         CAST(SUM(CAST(pow(2, 25 - m) AS BIGINT)) AS BIGINT) AS ss
                  FROM mp),
           tp AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_true FROM lineitem),
           rp AS (SELECT 'partkey' AS col_name, n_true,
                         CAST(256 - nb AS BIGINT) AS v_zero,
                         CAST(ss + (256 - nb) * 33554432 AS BIGINT) AS s_scaled
                  FROM ap CROSS JOIN tp),
           hs AS (SELECT CAST('0x' || substring(md5(CAST(l_suppkey AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM lineitem),
           bs AS (SELECT h // 16777216 AS idx,
                         CASE WHEN h % 16777216 = 0 THEN 25
                              ELSE 25 - length(bin(h % 16777216)) END AS rank
                  FROM hs),
           ms AS (SELECT idx, MAX(rank) AS m FROM bs GROUP BY idx),
           sa AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb,
                         CAST(SUM(CAST(pow(2, 25 - m) AS BIGINT)) AS BIGINT) AS ss
                  FROM ms),
           ts AS (SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_true FROM lineitem),
           rs AS (SELECT 'suppkey' AS col_name, n_true,
                         CAST(256 - nb AS BIGINT) AS v_zero,
                         CAST(ss + (256 - nb) * 33554432 AS BIGINT) AS s_scaled
                  FROM sa CROSS JOIN ts)
      SELECT col_name, n_true, v_zero, s_scaled,
             ROUND(CASE
               WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0
                    / CAST(s_scaled AS DOUBLE) <= 640.0 AND v_zero > 0
               THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
               ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0
                    / CAST(s_scaled AS DOUBLE)
             END, 2) + 0 AS est_r2
      FROM (SELECT * FROM rp UNION ALL SELECT * FROM rs)
      ORDER BY col_name""",

    "q_cms_topk" -> """
      WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
           tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS true_c FROM tok GROUP BY term),
           hashed AS (SELECT term, true_c, i,
                             CAST('0x' || substring(md5(CAST(i AS VARCHAR) || '|' || term), 1, 8)
                               AS BIGINT) % 64 AS b
                      FROM tc, (SELECT unnest(generate_series(0, 3)) AS i)),
           sketch AS (SELECT i, b, CAST(SUM(true_c) AS BIGINT) AS cell
                      FROM hashed GROUP BY i, b)
      SELECT h.term, CAST(MAX(h.true_c) AS BIGINT) AS true_c,
             CAST(MIN(s.cell) AS BIGINT) AS cms_c
      FROM hashed h JOIN sketch s USING (i, b)
      GROUP BY h.term ORDER BY h.term""",

    "q_bloom_filter" -> """
      WITH ks AS (SELECT DISTINCT o_custkey AS k FROM orders),
           fb AS (SELECT DISTINCT
                         CAST('0x' || substring(md5(CAST(i AS VARCHAR) || '|' || CAST(k AS VARCHAR)), 1, 8)
                           AS BIGINT) % 4096 AS bit
                  FROM ks, (SELECT unnest(generate_series(0, 2)) AS i)),
           pr AS (SELECT c_custkey AS k, i,
                         CAST('0x' || substring(md5(CAST(i AS VARCHAR) || '|' || CAST(c_custkey AS VARCHAR)), 1, 8)
                           AS BIGINT) % 4096 AS bit
                  FROM customer, (SELECT unnest(generate_series(0, 2)) AS i)),
           hits AS (SELECT pr.k, SUM(CASE WHEN fb.bit IS NOT NULL THEN 1 ELSE 0 END) AS hits
                    FROM pr LEFT JOIN fb USING (bit) GROUP BY pr.k)
      SELECT actually_present, bloom_positive, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT CAST(CASE WHEN ks.k IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS actually_present,
                   CAST(CASE WHEN h.hits = 3 THEN 1 ELSE 0 END AS BIGINT) AS bloom_positive
            FROM hits h LEFT JOIN ks ON ks.k = h.k)
      GROUP BY actually_present, bloom_positive
      ORDER BY actually_present, bloom_positive""",

    "q_repetition_filter" -> """
      WITH w AS (SELECT doc_id,
                        unnest(string_split(lower(text), ' ')) AS word,
                        generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                 FROM documents),
           bg AS (SELECT doc_id, word AS w1,
                         LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                  FROM w),
           bgc AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
                   FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
           st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bg, CAST(MAX(c) AS BIGINT) AS top_c,
                         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_c
                  FROM bgc GROUP BY 1)
      SELECT doc_id, n_bg,
             CAST(top_c * 1000000 // n_bg AS BIGINT) AS top_bigram_frac_e6,
             CAST(dup_c * 1000000 // n_bg AS BIGINT) AS dup_bigram_frac_e6,
             CAST(CASE WHEN top_c * 1000000 // n_bg < 100000
                        AND dup_c * 1000000 // n_bg < 150000 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM st ORDER BY doc_id""",

    "q_ohlc_bars" -> """
      WITH e AS (SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                        ts, event_id, CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           r AS (SELECT *,
                        ROW_NUMBER() OVER (PARTITION BY event_type, hour ORDER BY ts, event_id) AS ro,
                        ROW_NUMBER() OVER (PARTITION BY event_type, hour ORDER BY ts DESC, event_id DESC) AS rc
                 FROM e)
      SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN ro = 1 THEN vc END) AS BIGINT) AS open_cents,
             CAST(MAX(vc) AS BIGINT) AS high_cents,
             CAST(MIN(vc) AS BIGINT) AS low_cents,
             CAST(MAX(CASE WHEN rc = 1 THEN vc END) AS BIGINT) AS close_cents,
             CAST(SUM(vc) AS BIGINT) AS vol_cents
      FROM r GROUP BY event_type, hour ORDER BY event_type, hour""",

    "q_markov_transitions" -> """
      WITH s AS (SELECT user_id, event_type,
                        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
                 FROM events),
           c AS (SELECT event_type AS src, dst, CAST(COUNT(*) AS BIGINT) AS c
                 FROM s WHERE dst IS NOT NULL GROUP BY 1, 2)
      SELECT src, dst, c,
             CAST(c * 1000000 // CAST(SUM(c) OVER (PARTITION BY src) AS BIGINT) AS BIGINT) AS p_e6
      FROM c ORDER BY src, dst""",

    "q_ab_ztest" -> """
      WITH pu AS (SELECT user_id,
                         CAST(SUM(CASE WHEN event_type = 'purchase'
                                       THEN CAST(ROUND(value*100) AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS purchase_cents
                  FROM events GROUP BY user_id),
           m AS (SELECT quantile_cont(purchase_cents, 0.5) AS med FROM pu),
           co AS (SELECT user_id % 2 AS cohort, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CASE WHEN purchase_cents > med THEN 1 ELSE 0 END) AS BIGINT) AS c
                  FROM pu CROSS JOIN m GROUP BY 1),
           w AS (SELECT CAST(MAX(CASE WHEN cohort = 0 THEN n END) AS BIGINT) AS n0,
                        CAST(MAX(CASE WHEN cohort = 0 THEN c END) AS BIGINT) AS c0,
                        CAST(MAX(CASE WHEN cohort = 1 THEN n END) AS BIGINT) AS n1,
                        CAST(MAX(CASE WHEN cohort = 1 THEN c END) AS BIGINT) AS c1
                 FROM co)
      SELECT n0, c0, n1, c1,
             ROUND(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE), 4) + 0 AS p0,
             ROUND(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE), 4) + 0 AS p1,
             ROUND((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / SQRT(CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                          * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                          * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 4) + 0 AS z
      FROM w""",

    "q_hist_equidepth" -> """
      WITH tp AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents FROM orders),
           b AS (SELECT quantile_cont(tp_cents, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
                 FROM tp),
           x AS (SELECT tp_cents,
                        1 + len(list_filter(bounds, bb -> tp_cents > bb)) AS bucket
                 FROM tp CROSS JOIN b)
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(tp_cents) AS BIGINT) AS min_cents,
             CAST(MAX(tp_cents) AS BIGINT) AS max_cents,
             CAST(SUM(tp_cents) AS BIGINT) AS sum_cents
      FROM x GROUP BY 1 ORDER BY 1""",

    "q_triangle_count" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           edges AS (SELECT a.pk AS u, b.pk AS v
                     FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                   FROM edges e1
                   JOIN edges e2 ON e1.v = e2.u
                   JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges),
           no AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes
                  FROM (SELECT u AS p FROM edges UNION SELECT v FROM edges))
      SELECT n_nodes, n_edges, n_triangles FROM no, st, tri""",

    "q_cte_q3" -> """
      WITH rev AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '1996-06-30'
        GROUP BY l_orderkey)
      SELECT o.o_orderkey, o.o_orderpriority, r.rev_e4
      FROM rev r JOIN orders o ON r.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus <> 'F'
      ORDER BY r.rev_e4 DESC, o.o_orderkey LIMIT 10""",

    "q_bm25_topk" -> """
      WITH dt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
           dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
           tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                  FROM dt WHERE word IN ('merge', 'vector', 'fast') GROUP BY 1, 2),
           df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
           corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_toks
                      FROM dl),
           t AS (SELECT tf.doc_id,
                        CAST(ROUND(
                          LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                                   / (CAST(df.df AS DOUBLE) + 0.5))
                          * CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)
                          / (CAST(tf.tf AS DOUBLE)
                             + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE)
                                                 / (CAST(total_toks AS DOUBLE) / CAST(n_docs AS DOUBLE))))
                          * 1e4) AS BIGINT) AS term_e4
                 FROM tf JOIN dl ON tf.doc_id = dl.doc_id
                         JOIN df ON tf.word = df.word
                 CROSS JOIN corpus)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms, CAST(SUM(term_e4) AS BIGINT) AS score_e4
      FROM t GROUP BY doc_id ORDER BY score_e4 DESC, doc_id LIMIT 20""",

    "q_bpe_merge_step" -> """
      WITH wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
                  GROUP BY word HAVING LENGTH(word) >= 2),
           p AS (SELECT c,
                        unnest(list_transform(generate_series(1, CAST(LENGTH(word) AS INT) - 1),
                               i -> substring(word, i, 2))) AS pair
                 FROM wf),
           pc AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM p GROUP BY pair)
      SELECT substring(pair, 1, 1) AS s1, substring(pair, 2, 1) AS s2, cnt
      FROM pc ORDER BY cnt DESC, s1, s2 LIMIT 20""",

    "q_word_cooccur" -> """
      WITH t AS (SELECT doc_id,
                        unnest(string_split(lower(text), ' ')) AS w,
                        generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                 FROM documents),
           s AS (SELECT w AS w1,
                        LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
                        LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
                 FROM t),
           pairs AS (SELECT w1, n1 AS w2 FROM s WHERE n1 IS NOT NULL
                     UNION ALL
                     SELECT w1, n2 AS w2 FROM s WHERE n2 IS NOT NULL)
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 30""",

    "q_neardup_containment" -> """
      WITH toks AS (SELECT DISTINCT doc_id, lang, source, word
                    FROM (SELECT doc_id, lang, source,
                                 unnest(string_split(lower(text), ' ')) AS word FROM documents)),
           sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
           inter AS (SELECT a.lang, a.source, a.doc_id AS d1, b.doc_id AS d2,
                            CAST(COUNT(*) AS BIGINT) AS i
                     FROM toks a JOIN toks b
                       ON a.lang = b.lang AND a.source = b.source
                      AND a.word = b.word AND a.doc_id < b.doc_id
                     GROUP BY a.lang, a.source, a.doc_id, b.doc_id)
      SELECT lang, source, d1, d2,
             CAST(i * 10000 // LEAST(s1.sz, s2.sz) AS BIGINT) AS cont_e4
      FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE i * 10000 // LEAST(s1.sz, s2.sz) >= 9000
      ORDER BY lang, source, d1, d2""",

    "q_gram_matrix" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding[1:8],
                                       x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           d AS (SELECT vec_id, CAST(generate_subscripts(qe, 1) - 1 AS BIGINT) AS dim,
                        unnest(qe) AS x
                 FROM q),
           cells AS (SELECT a.dim AS i, b.dim AS j, CAST(COUNT(*) AS BIGINT) AS n,
                            SUM(CAST(a.x AS HUGEINT) * b.x) AS sxy
                     FROM d a JOIN d b ON a.vec_id = b.vec_id AND a.dim <= b.dim
                     GROUP BY 1, 2)
      SELECT i, j, ROUND(CAST(sxy AS DOUBLE) / (CAST(n AS DOUBLE) * 1e14), 6) + 0 AS g
      FROM cells ORDER BY i, j""",

    "q_ridge_normal" -> """
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(CAST(x1 AS HUGEINT) * x1) AS sxx,
                        SUM(CAST(x1 AS HUGEINT) * x2) AS sxy,
                        SUM(CAST(x2 AS HUGEINT) * x2) AS syy,
                        SUM(CAST(x1 AS HUGEINT) * z) AS sxz,
                        SUM(CAST(x2 AS HUGEINT) * z) AS syz
                 FROM (SELECT CAST(l_quantity AS BIGINT) AS x1,
                              CAST(ROUND(l_discount*100) AS BIGINT) AS x2,
                              CAST(ROUND(l_extendedprice*100) AS BIGINT) AS z
                       FROM lineitem))
      SELECT n,
             ROUND(((CAST(syy AS DOUBLE) + 1000.0) * CAST(sxz AS DOUBLE)
                    - CAST(sxy AS DOUBLE) * CAST(syz AS DOUBLE))
                   / ((CAST(sxx AS DOUBLE) + 1000.0) * (CAST(syy AS DOUBLE) + 1000.0)
                      - CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)), 6) + 0 AS w1,
             ROUND(((CAST(sxx AS DOUBLE) + 1000.0) * CAST(syz AS DOUBLE)
                    - CAST(sxy AS DOUBLE) * CAST(sxz AS DOUBLE))
                   / ((CAST(sxx AS DOUBLE) + 1000.0) * (CAST(syy AS DOUBLE) + 1000.0)
                      - CAST(sxy AS DOUBLE) * CAST(sxy AS DOUBLE)), 6) + 0 AS w2
      FROM s""",

    "q_label_centroids" -> """
      WITH q AS (SELECT CAST(label AS BIGINT) AS label,
                        list_transform(embedding[1:8],
                                       x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           d AS (SELECT label, CAST(generate_subscripts(qe, 1) - 1 AS BIGINT) AS dim,
                        unnest(qe) AS x
                 FROM q)
      SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(x) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e7), 6) + 0 AS mean
      FROM d GROUP BY label, dim ORDER BY label, dim""",

    "q_profile_columns" -> """
      WITH m AS (SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v FROM orders
                 UNION ALL
                 SELECT 'o_orderpriority', o_orderpriority FROM orders
                 UNION ALL
                 SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders),
           c AS (SELECT column_name, v, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM m GROUP BY 1, 2),
           r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY column_name
                                              ORDER BY cnt DESC, v DESC) AS rn
                 FROM c)
      SELECT column_name,
             CAST(SUM(cnt) AS BIGINT) AS n_values,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(CASE WHEN rn = 1 THEN v END) AS VARCHAR) AS top_value,
             CAST(MAX(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS top_count,
             CAST(MAX(CASE WHEN rn = 1 THEN cnt END) * 10000 // CAST(SUM(cnt) AS BIGINT)
                  AS BIGINT) AS top_share_e4
      FROM r GROUP BY column_name ORDER BY column_name""",

    "q_filter_pipeline" -> """
      WITH ds AS (SELECT doc_id, lang, source, n_chars,
                         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
                         CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS distinct_tok
                  FROM documents),
           w AS (SELECT doc_id,
                        unnest(string_split(lower(text), ' ')) AS word,
                        generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                 FROM documents),
           bg AS (SELECT doc_id, word AS w1,
                         LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                  FROM w),
           bgc AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
                   FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
           rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bg, CAST(MAX(c) AS BIGINT) AS top_c
                   FROM bgc GROUP BY 1),
           k AS (SELECT ds.lang, ds.source, ds.n_chars,
                        CASE WHEN ds.n_tok BETWEEN 20 AND 200
                              AND ds.distinct_tok * 1000000 // ds.n_tok >= 500000
                              AND COALESCE(rep.top_c * 1000000 // rep.n_bg, 0) < 100000
                             THEN 1 ELSE 0 END AS keep
                 FROM ds LEFT JOIN rep ON ds.doc_id = rep.doc_id)
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(keep) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      FROM k GROUP BY lang, source ORDER BY lang, source""",

    "q_ts_interpolate" -> """
      WITH obs AS (SELECT event_type,
                          (epoch_ns(ts) // 1000) // 3600000000 AS h,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                            // CAST(COUNT(*) AS BIGINT) AS v
                   FROM events GROUP BY 1, 2),
           b AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY 1),
           scaffold AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
           miss AS (SELECT s.event_type, s.h
                    FROM scaffold s LEFT JOIN obs o
                      ON o.event_type = s.event_type AND o.h = s.h
                    WHERE o.h IS NULL),
           prev AS (SELECT s.event_type, s.h, MAX(o.h) AS ph
                    FROM miss s JOIN obs o
                      ON o.event_type = s.event_type AND o.h < s.h
                    GROUP BY 1, 2),
           nxt AS (SELECT s.event_type, s.h, MIN(o.h) AS nh
                   FROM miss s JOIN obs o
                     ON o.event_type = s.event_type AND o.h > s.h
                   GROUP BY 1, 2),
           interp AS (SELECT p.event_type, p.h,
                             (pv.v * (n.nh - p.h) + nv.v * (p.h - p.ph)) // (n.nh - p.ph) AS v,
                             'interp' AS src
                      FROM prev p
                      JOIN nxt n ON n.event_type = p.event_type AND n.h = p.h
                      JOIN obs pv ON pv.event_type = p.event_type AND pv.h = p.ph
                      JOIN obs nv ON nv.event_type = p.event_type AND nv.h = n.nh),
           allrows AS (SELECT event_type, h, v, 'obs' AS src FROM obs
                       UNION ALL
                       SELECT event_type, h, v, src FROM interp)
      SELECT event_type,
             strftime(make_timestamp(h * 3600000000), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(v AS BIGINT) AS v_cents, src
      FROM allrows ORDER BY event_type, hour""",

    "q_boilerplate_prefix" -> """
      SELECT md5(substring(text, 1, 80)) AS prefix_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc,
             CAST(MAX(doc_id) AS BIGINT) AS max_doc,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents
      GROUP BY prefix_fp HAVING COUNT(*) >= 2
      ORDER BY prefix_fp""",

    "q_anomaly_mad" -> """
      WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
           med AS (SELECT event_type, quantile_cont(vc, 0.5) AS med FROM v GROUP BY 1),
           dev AS (SELECT v.event_type, med.med,
                          ABS(CAST(vc AS DOUBLE) - med.med) AS dev
                   FROM v JOIN med ON v.event_type = med.event_type),
           mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
      SELECT dev.event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             MAX(dev.med) + 0 AS med,
             MAX(mad.mad) + 0 AS mad,
             CAST(SUM(CASE WHEN dev.dev > mad.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             ROUND(MAX(dev.dev), 4) + 0 AS max_dev
      FROM dev JOIN mad ON dev.event_type = mad.event_type
      GROUP BY dev.event_type ORDER BY dev.event_type""",

    "q_quantile_sketch" -> """
      WITH v AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS c FROM orders),
           b0 AS (SELECT c, CAST(LENGTH(bin(c)) AS BIGINT) AS blen FROM v),
           binned AS (SELECT c,
                             blen * 8 + CASE WHEN blen >= 4
                               THEN (c // CAST(pow(2, blen - 4) AS BIGINT)) % 8 ELSE 0 END AS bin_id
                      FROM b0),
           sk AS (SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS cnt,
                         CAST(MIN(c) AS BIGINT) AS bmin, CAST(MAX(c) AS BIGINT) AS bmax
                  FROM binned GROUP BY 1),
           cum AS (SELECT a.bin_id, a.cnt, a.bmin, a.bmax,
                          CAST(COALESCE(SUM(b.cnt), 0) AS BIGINT) AS cb
                   FROM sk a LEFT JOIN sk b ON b.bin_id < a.bin_id
                   GROUP BY a.bin_id, a.cnt, a.bmin, a.bmax),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
           ex AS (SELECT quantile_cont(c, [0.5, 0.9, 0.99]) AS exq FROM v),
           t AS (SELECT unnest([50, 90, 99]) AS q, unnest([1, 2, 3]) AS qi),
           rk AS (SELECT CAST(t.q AS BIGINT) AS q, t.qi, nn.n,
                         GREATEST(1, (nn.n * t.q) // 100) AS rk
                  FROM t CROSS JOIN nn),
           pick AS (SELECT rk.q, rk.n,
                           CAST(cum.bmin + (cum.bmax - cum.bmin) * (rk.rk - cum.cb - 1) // cum.cnt
                                AS BIGINT) AS est_cents,
                           ex.exq[rk.qi] AS exv
                    FROM rk JOIN cum ON cum.cb < rk.rk AND rk.rk <= cum.cb + cum.cnt
                    CROSS JOIN ex)
      SELECT q, n, est_cents,
             ROUND(exv, 4) + 0 AS exact_cents,
             CAST(ROUND(ABS(CAST(est_cents AS DOUBLE) - exv) / exv * 1e4) AS BIGINT) AS rel_err_e4
      FROM pick ORDER BY q""",

    "q_attribution_lasttouch" -> """
      WITH t AS (SELECT user_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS vc,
                        LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                                   IGNORE NULLS)
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
                 FROM events)
      SELECT COALESCE(channel, 'none') AS channel,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(SUM(vc) AS BIGINT) AS revenue_cents
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY channel""",

    "q_dau_cumulative" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
           dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
           fs AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id),
           nu AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM fs GROUP BY day),
           days AS (SELECT dau.day, dau.dau,
                           CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users
                    FROM dau LEFT JOIN nu ON dau.day = nu.day)
      SELECT strftime(a.day, '%Y-%m-%d') AS day, a.dau, a.new_users,
             CAST(SUM(b.new_users) AS BIGINT) AS cum_users
      FROM days a JOIN days b ON b.day <= a.day
      GROUP BY a.day, a.dau, a.new_users
      ORDER BY day""",

    "q_pq_assign" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding,
                                       x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           sv AS (SELECT vec_id, t.s, qe[t.s*8+1 : t.s*8+8] AS sv
                  FROM q CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s) t),
           cb AS (SELECT s, CAST(vec_id AS BIGINT) AS code, sv AS cw
                  FROM sv WHERE vec_id <= 3),
           d AS (SELECT sv.vec_id, sv.s, cb.code,
                        CAST(list_sum(list_transform(generate_series(1, 8),
                             i -> (sv.sv[i] - cb.cw[i]) * (sv.sv[i] - cb.cw[i]))) AS BIGINT) AS d2
                 FROM sv JOIN cb ON sv.s = cb.s
                 WHERE sv.vec_id > 3),
           best AS (SELECT vec_id, s, code, d2 FROM
                      (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                                    ORDER BY d2, code) AS rn FROM d)
                    WHERE rn = 1)
      SELECT CAST(s AS BIGINT) AS subspace, code, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(d2) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e14), 6) + 0 AS mean_d2
      FROM best GROUP BY s, code ORDER BY subspace, code""",

    "q_seasonality_profile" -> """
      WITH e AS (SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                        CAST(hour(ts) AS BIGINT) AS hr,
                        CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events)
      SELECT dow, hr, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vc) AS BIGINT) AS sum_cents,
             CAST(SUM(vc) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_cents
      FROM e GROUP BY dow, hr ORDER BY dow, hr""",

    "q_cohort_ltv" -> """
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                        CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
           p AS (SELECT e.user_id, c.cohort_day,
                        CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS "offset",
                        e.vc
                 FROM e JOIN c ON e.user_id = c.user_id
                 WHERE e.event_type = 'purchase'
                   AND date_diff('day', c.cohort_day, e.day) <= 7)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, "offset",
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS buyers,
             CAST(SUM(vc) AS BIGINT) AS revenue_cents
      FROM p GROUP BY cohort_day, "offset" ORDER BY cohort_day, "offset"""",

    "q_recsys_lift" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           nn AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
           sup AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY pk),
           pairs AS (SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS s12
                     FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT p1, p2, s12, s1.s AS s1, s2.s AS s2,
             CAST(s12 * n_orders * 10000 // (s1.s * s2.s) AS BIGINT) AS lift_e4
      FROM pairs JOIN sup s1 ON pairs.p1 = s1.pk
                 JOIN sup s2 ON pairs.p2 = s2.pk
      CROSS JOIN nn
      ORDER BY lift_e4 DESC, p1, p2 LIMIT 30""",

    "q_oov_rate" -> """
      WITH t AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS word FROM documents),
           v AS (SELECT word, 1 AS in_vocab FROM
                   (SELECT word, COUNT(*) AS c FROM t GROUP BY word
                    ORDER BY c DESC, word LIMIT 100)),
           j AS (SELECT t.lang, CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END AS oov
                 FROM t LEFT JOIN v ON t.word = v.word)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(oov) AS BIGINT) AS n_oov,
             CAST(SUM(oov) * 10000 // COUNT(*) AS BIGINT) AS oov_e4
      FROM j GROUP BY lang ORDER BY lang""",

    "q_join_asof_nearest" -> """
      WITH w AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
                        LAG(epoch_us(ts)) OVER win AS p_ts,
                        LAG(event_id) OVER win AS p_id,
                        LEAD(epoch_us(ts)) OVER win AS n_ts,
                        LEAD(event_id) OVER win AS n_id
                 FROM events
                 WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id,
             CAST(CASE WHEN n_id IS NULL OR (p_id IS NOT NULL AND (tus - p_ts) <= (n_ts - tus))
                       THEN p_id ELSE n_id END AS BIGINT) AS matched_id,
             CAST(CASE WHEN n_id IS NULL OR (p_id IS NOT NULL AND (tus - p_ts) <= (n_ts - tus))
                       THEN p_ts - tus ELSE n_ts - tus END AS BIGINT) AS gap_us
      FROM w
      WHERE event_type = 'purchase' AND (p_id IS NOT NULL OR n_id IS NOT NULL)
      ORDER BY user_id, event_id""",

    "q_kcenter_seeds" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding,
                                       x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           s0 AS (SELECT qe AS sqe FROM q WHERE vec_id = 0),
           d1 AS (SELECT vec_id, qe,
                         CAST(list_sum(list_transform(generate_series(1, 64),
                              i -> (qe[i] - sqe[i]) * (qe[i] - sqe[i]))) AS BIGINT) AS dmin
                  FROM q CROSS JOIN s0),
           p1 AS (SELECT vec_id AS vid, dmin AS dd, qe AS sqe FROM d1
                  ORDER BY dmin DESC, vec_id LIMIT 1),
           d2 AS (SELECT d1.vec_id, d1.qe,
                         LEAST(d1.dmin,
                               CAST(list_sum(list_transform(generate_series(1, 64),
                                    i -> (d1.qe[i] - p1.sqe[i]) * (d1.qe[i] - p1.sqe[i]))) AS BIGINT)) AS dmin
                  FROM d1 CROSS JOIN p1),
           p2 AS (SELECT vec_id AS vid, dmin AS dd, qe AS sqe FROM d2
                  ORDER BY dmin DESC, vec_id LIMIT 1),
           d3 AS (SELECT d2.vec_id, d2.qe,
                         LEAST(d2.dmin,
                               CAST(list_sum(list_transform(generate_series(1, 64),
                                    i -> (d2.qe[i] - p2.sqe[i]) * (d2.qe[i] - p2.sqe[i]))) AS BIGINT)) AS dmin
                  FROM d2 CROSS JOIN p2),
           p3 AS (SELECT vec_id AS vid, dmin AS dd FROM d3
                  ORDER BY dmin DESC, vec_id LIMIT 1)
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS vec_id, 0.0 AS d2
        UNION ALL
        SELECT 1, CAST(vid AS BIGINT), ROUND(CAST(dd AS DOUBLE) / 1e14, 6) + 0 FROM p1
        UNION ALL
        SELECT 2, CAST(vid AS BIGINT), ROUND(CAST(dd AS DOUBLE) / 1e14, 6) + 0 FROM p2
        UNION ALL
        SELECT 3, CAST(vid AS BIGINT), ROUND(CAST(dd AS DOUBLE) / 1e14, 6) + 0 FROM p3)
      ORDER BY k""",

    "q_cluster_quality" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding,
                                       x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           seeds AS (SELECT vec_id AS cluster, qe FROM q WHERE vec_id <= 9),
           d AS (SELECT q.vec_id, s.cluster,
                        CAST(list_sum(list_transform(generate_series(1, 64),
                             i -> (q.qe[i] - s.qe[i]) * (q.qe[i] - s.qe[i]))) AS BIGINT) AS d2
                 FROM q CROSS JOIN seeds s),
           assign AS (SELECT vec_id, cluster, d2 FROM
                        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                                      ORDER BY d2, cluster) AS rn FROM d)
                      WHERE rn = 1),
           intra AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n, SUM(d2) AS sd2
                     FROM assign GROUP BY cluster),
           sep AS (SELECT a.cluster,
                          CAST(MIN(list_sum(list_transform(generate_series(1, 64),
                               i -> (a.qe[i] - b.qe[i]) * (a.qe[i] - b.qe[i])))) AS BIGINT) AS sep
                   FROM seeds a JOIN seeds b ON a.cluster <> b.cluster
                   GROUP BY a.cluster)
      SELECT CAST(intra.cluster AS BIGINT) AS cluster, intra.n,
             ROUND(CAST(sd2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e14), 4) + 0 AS cohesion,
             ROUND(CAST(sep AS DOUBLE) / 1e14, 4) + 0 AS separation,
             ROUND((CAST(sd2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e14))
                   / (CAST(sep AS DOUBLE) / 1e14), 4) + 0 AS ratio
      FROM intra JOIN sep ON intra.cluster = sep.cluster
      ORDER BY cluster""",

    "q_auc_rank" -> """
      WITH s AS (SELECT CASE WHEN label <= 4 THEN 1 ELSE 0 END AS y,
                        (CAST(ROUND(CAST(embedding[1] AS DOUBLE)*1e7) AS BIGINT)
                         + 1000000000) // 100000 AS b
                 FROM embeddings),
           hist AS (SELECT b, CAST(SUM(y) AS BIGINT) AS np,
                           CAST(SUM(1 - y) AS BIGINT) AS nn
                    FROM s GROUP BY b),
           below AS (SELECT a.b, a.np, a.nn,
                            CAST(COALESCE(SUM(x.nn), 0) AS BIGINT) AS below
                     FROM hist a LEFT JOIN hist x ON x.b < a.b
                     GROUP BY a.b, a.np, a.nn)
      SELECT CAST(SUM(np) AS BIGINT) AS p, CAST(SUM(nn) AS BIGINT) AS n,
             ROUND(CAST(SUM(np * (2 * below + nn)) AS DOUBLE)
                   / (2.0 * CAST(SUM(np) AS DOUBLE) * CAST(SUM(nn) AS DOUBLE)), 6) + 0 AS auc
      FROM below""",

    "q_changepoint_cusum" -> """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(COUNT(*) AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
           tot AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS t,
                          CAST(COUNT(*) AS BIGINT) AS d
                   FROM daily GROUP BY 1),
           s AS (SELECT daily.event_type, daily.day, tot.d,
                        CAST(SUM(daily.x * tot.d - tot.t)
                             OVER (PARTITION BY daily.event_type ORDER BY daily.day
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                             AS BIGINT) AS s
                 FROM daily JOIN tot ON daily.event_type = tot.event_type),
           pick AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                                 ORDER BY ABS(s) DESC, day ASC) AS rn
                    FROM s)
      SELECT event_type, d AS n_days, strftime(day, '%Y-%m-%d') AS changepoint_day,
             s AS cusum_scaled
      FROM pick WHERE rn = 1 ORDER BY event_type""",

    "q_lang_divergence" -> """
      WITH c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1, 2),
           vocab AS (SELECT DISTINCT word FROM c),
           vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
           tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY lang),
           dense AS (SELECT tot.lang, vocab.word, tot.t, COALESCE(c.c, 0) AS c, vs.v
                     FROM tot CROSS JOIN vocab CROSS JOIN vs
                     LEFT JOIN c ON c.lang = tot.lang AND c.word = vocab.word),
           pairs AS (SELECT a.lang AS lang_p, b.lang AS lang_q,
                            CAST(ROUND(
                              (CAST(a.c + 1 AS DOUBLE) / CAST(a.t + a.v AS DOUBLE))
                              * LN((CAST(a.c + 1 AS DOUBLE) / CAST(a.t + a.v AS DOUBLE))
                                   / (CAST(b.c + 1 AS DOUBLE) / CAST(b.t + b.v AS DOUBLE)))
                              * 1e8) AS BIGINT) AS term_e8
                     FROM dense a JOIN dense b
                       ON a.word = b.word AND a.lang <> b.lang)
      SELECT lang_p, lang_q, CAST(SUM(term_e8) AS BIGINT) AS kl_e8,
             ROUND(CAST(SUM(term_e8) AS DOUBLE) / 1e8, 4) + 0 AS kl
      FROM pairs GROUP BY 1, 2 ORDER BY lang_p, lang_q""",

    "q_set_bag_ops" -> """
      WITH b96 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996),
           b97 AS (SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997)
      SELECT * FROM (
        SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT custkey FROM b96 EXCEPT ALL SELECT custkey FROM b97)
        UNION ALL
        SELECT 'intersect_all', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT custkey FROM b96 INTERSECT ALL SELECT custkey FROM b97)
        UNION ALL
        SELECT 'except_distinct', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT custkey FROM b96 EXCEPT SELECT custkey FROM b97)
        UNION ALL
        SELECT 'intersect_distinct', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT custkey FROM b96 INTERSECT SELECT custkey FROM b97))
      ORDER BY op""",

    "q_impute_missing" -> """
      WITH li AS (SELECT l_returnflag AS flag,
                         CAST(ROUND(l_discount*100) AS BIGINT) AS d
                  FROM lineitem),
           med AS (SELECT flag, quantile_cont(d, 0.5) AS imputed
                   FROM li WHERE d > 0 GROUP BY flag),
           agg AS (SELECT li.flag, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(CASE WHEN li.d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
                          CAST(SUM(li.d) AS BIGINT) AS s_obs,
                          MAX(med.imputed) + 0 AS imputed_pct
                   FROM li JOIN med ON li.flag = med.flag
                   GROUP BY li.flag)
      SELECT flag, n, n_missing, imputed_pct,
             ROUND((CAST(s_obs AS DOUBLE) + CAST(n_missing AS DOUBLE) * imputed_pct)
                   / CAST(n AS DOUBLE), 4) + 0 AS mean_pct_imputed
      FROM agg ORDER BY flag""",

    "q_seq_pattern" -> """
      WITH f AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM
                   (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                                 ORDER BY ts, event_id) AS rn
                    FROM events)
                 WHERE rn = 1)
      SELECT a.event_type AS first_type, b.event_type AS then_type,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM f a JOIN f b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
       AND (a.tus < b.tus OR (a.tus = b.tus AND a.event_id < b.event_id))
      GROUP BY 1, 2 ORDER BY first_type, then_type""",

    "q_wow_change" -> """
      WITH weekly AS (SELECT event_type, date_trunc('week', ts) AS week,
                             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev_cents
                      FROM events GROUP BY 1, 2),
           l AS (SELECT event_type, week, rev_cents,
                        LAG(rev_cents) OVER (PARTITION BY event_type ORDER BY week) AS prev_cents
                 FROM weekly)
      SELECT event_type, strftime(week, '%Y-%m-%d') AS week, rev_cents, prev_cents,
             ROUND(CAST(rev_cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE), 4) + 0
               AS wow_change
      FROM l WHERE prev_cents IS NOT NULL
      ORDER BY event_type, week""",

    "q_reorder_latency" -> """
      WITH s AS (SELECT o_custkey,
                        CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) AS gap_days
                 FROM (SELECT o_custkey, o_orderdate,
                              LAG(o_orderdate) OVER w AS prev_date,
                              ROW_NUMBER() OVER w AS rn
                       FROM orders
                       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
                 WHERE rn = 2)
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_reorders,
             ROUND(quantile_cont(gap_days, 0.5), 4) + 0 AS median_gap_days,
             ROUND(quantile_cont(gap_days, 0.9), 4) + 0 AS p90_gap_days
      FROM s JOIN customer ON s.o_custkey = customer.c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_autocorr_daily" -> """
      WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1, 2),
           p AS (SELECT event_type, rev,
                        LAG(rev) OVER (PARTITION BY event_type ORDER BY day) AS prev
                 FROM daily),
           s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                        CAST(SUM(prev) AS BIGINT) AS sx, CAST(SUM(rev) AS BIGINT) AS sy,
                        SUM(CAST(prev AS HUGEINT) * rev) AS sxy,
                        SUM(CAST(prev AS HUGEINT) * prev) AS sxx,
                        SUM(CAST(rev AS HUGEINT) * rev) AS syy
                 FROM p WHERE prev IS NOT NULL GROUP BY 1)
      SELECT event_type, n_pairs,
             ROUND((CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / SQRT((CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 4) + 0 AS acf1
      FROM s ORDER BY event_type""",

    "q_ma_crossover" -> """
      WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev,
                            year(date_trunc('day', o_orderdate)) AS yr
                     FROM orders GROUP BY 1, 3),
           x AS (SELECT day, yr,
                        ROW_NUMBER() OVER (PARTITION BY yr ORDER BY day) AS rn,
                        SUM(rev) OVER (PARTITION BY yr ORDER BY day
                                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sum3,
                        SUM(rev) OVER (PARTITION BY yr ORDER BY day
                                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum7
                 FROM daily),
           y AS (SELECT day, rn, sum3, sum7,
                        CAST(sum3*7 > sum7*3 AS INT) AS above,
                        LAG(CAST(sum3*7 > sum7*3 AS INT))
                          OVER (PARTITION BY yr ORDER BY day) AS prev_above
                 FROM x)
      SELECT strftime(day, '%Y-%m-%d') AS day,
             CAST(sum3 AS BIGINT) AS sum3, CAST(sum7 AS BIGINT) AS sum7,
             CAST(above AS BIGINT) AS golden_cross
      FROM y WHERE rn >= 8 AND prev_above IS NOT NULL AND above <> prev_above
      ORDER BY day""",

    "q_gini_revenue" -> """
      WITH pc AS (SELECT o_custkey,
                         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS x
                  FROM orders GROUP BY 1),
           r AS (SELECT c_mktsegment, x,
                        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                           ORDER BY x, c_custkey) AS i,
                        COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
                 FROM pc JOIN customer ON o_custkey = c_custkey)
      SELECT c_mktsegment, CAST(MAX(n) AS BIGINT) AS n_customers,
             CAST(SUM(x) AS BIGINT) AS total_cents,
             CAST(SUM(CAST(2*i - n - 1 AS HUGEINT) * x) * 1000000
                  // (CAST(MAX(n) AS HUGEINT) * SUM(x)) AS BIGINT) AS gini_e6,
             CAST(CAST(SUM(CASE WHEN i > n - n//10 THEN x ELSE 0 END) AS HUGEINT) * 1000000
                  // SUM(x) AS BIGINT) AS top10_share_e6
      FROM r GROUP BY 1 ORDER BY 1""",

    "q_rfm_segments" -> """
      WITH base AS (SELECT o_custkey,
                           CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                                          DATE '1999-01-01') AS BIGINT) AS rec,
                           CAST(COUNT(*) AS BIGINT) AS freq,
                           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mon
                    FROM orders GROUP BY 1),
           b AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS rb,
                        quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
                        quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS mb
                 FROM base),
           x AS (SELECT mon,
                        1 + len(list_filter(rb, bb -> rec > bb)) AS r_bucket,
                        1 + len(list_filter(fb, bb -> freq > bb)) AS f_bucket,
                        1 + len(list_filter(mb, bb -> mon > bb)) AS m_bucket
                 FROM base CROSS JOIN b)
      SELECT CAST(r_bucket AS BIGINT) AS r_bucket, CAST(f_bucket AS BIGINT) AS f_bucket,
             CAST(m_bucket AS BIGINT) AS m_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(mon) AS BIGINT) AS monetary_cents
      FROM x GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_bipartite_degree" -> """
      WITH pc AS (SELECT o_custkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS degree,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY 1)
      SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(qty) AS BIGINT) AS total_qty
      FROM pc GROUP BY 1 ORDER BY 1""",

    "q_zipf_fit" -> """
      WITH tc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
                  GROUP BY 1 ORDER BY c DESC, word LIMIT 100),
           r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rank FROM tc),
           p AS (SELECT CAST(ROUND(LN(CAST(rank AS DOUBLE)) * 1e8) AS BIGINT) AS x_e8,
                        CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1e8) AS BIGINT) AS y_e8 FROM r),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x_e8) AS BIGINT) AS sx, CAST(SUM(y_e8) AS BIGINT) AS sy,
                        SUM(CAST(x_e8 AS HUGEINT) * y_e8) AS sxy,
                        SUM(CAST(x_e8 AS HUGEINT) * x_e8) AS sxx
                 FROM p)
      SELECT n AS n_points,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 4)
               + 0 AS zipf_slope,
             ROUND((CAST(sy AS DOUBLE)
                    - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                      * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) / 1e8, 4) + 0 AS intercept_ln
      FROM s""",

    "q_vocab_growth" -> """
      WITH m AS (SELECT MAX(doc_id) AS maxid FROM documents),
           tok AS (SELECT (doc_id * 10) // (maxid + 1) AS bucket,
                          unnest(string_split(lower(text), ' ')) AS word
                   FROM documents, m),
           pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1),
           fs AS (SELECT MIN(bucket) AS bucket FROM tok GROUP BY word),
           nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM fs GROUP BY 1),
           j AS (SELECT pb.bucket, n_tokens, COALESCE(new_types, 0) AS new_types
                 FROM pb LEFT JOIN nt ON pb.bucket = nt.bucket)
      SELECT CAST(a.bucket AS BIGINT) AS bucket,
             CAST(SUM(b.n_tokens) AS BIGINT) AS cum_tokens,
             CAST(SUM(b.new_types) AS BIGINT) AS cum_types,
             CAST(SUM(b.new_types) * 10000 // SUM(b.n_tokens) AS BIGINT) AS ttr_e4
      FROM j a JOIN j b ON b.bucket <= a.bucket
      GROUP BY a.bucket ORDER BY bucket""",

    "q_feature_hashing" -> """
      WITH tc AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  GROUP BY 1, 2)
      SELECT lang,
             CAST('0x' || substring(md5(word), 1, 8) AS BIGINT) % 32 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_terms, CAST(SUM(c) AS BIGINT) AS total_count
      FROM tc GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_ams_f2" -> """
      WITH tc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
                  GROUP BY 1),
           sg AS (SELECT i AS est_id, c,
                         1 - 2 * (CAST('0x' || substring(md5(word || '|' || CAST(i AS VARCHAR)), 1, 8)
                                    AS BIGINT) % 2) AS sign
                  FROM tc, (SELECT unnest(generate_series(0, 7)) AS i)),
           es AS (SELECT CAST(est_id AS BIGINT) AS est_id, CAST(SUM(c * sign) AS BIGINT) AS s
                  FROM sg GROUP BY 1),
           ex AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2_exact FROM tc)
      SELECT est_id, s, CAST(CAST(s AS HUGEINT) * s AS BIGINT) AS f2_est, f2_exact
      FROM es, ex ORDER BY est_id""",

    "q_kmv_distinct" -> """
      WITH pk AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
           pm AS (SELECT CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM pk ORDER BY h LIMIT 64),
           ps AS (SELECT MAX(h) AS h_k, CAST(COUNT(*) AS BIGINT) AS k_size FROM pm),
           pe AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM pk),
           sk AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
           sm AS (SELECT CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM sk ORDER BY h LIMIT 64),
           ss AS (SELECT MAX(h) AS h_k, CAST(COUNT(*) AS BIGINT) AS k_size FROM sm),
           se AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM sk)
      SELECT * FROM (
        SELECT 'l_partkey' AS column_name, k_size, h_k,
               CAST((k_size - 1) * 4294967296 // h_k AS BIGINT) AS kmv_estimate,
               exact_distinct
        FROM ps, pe
        UNION ALL
        SELECT 'l_suppkey', k_size, h_k,
               CAST((k_size - 1) * 4294967296 // h_k AS BIGINT), exact_distinct
        FROM ss, se)
      ORDER BY column_name""",

    "q_eval_f1" -> """
      WITH toks AS (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word FROM documents),
           wc AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c_wc FROM toks GROUP BY lang, word),
           cc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c_c FROM toks GROUP BY lang),
           v AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM toks),
           llh AS (SELECT lang, word,
                          CAST(ROUND(LN(CAST(c_wc + 1 AS DOUBLE) / (c_c + v)) * 1e4) AS BIGINT) AS llh_e4
                   FROM wc JOIN cc USING (lang) CROSS JOIN v),
           def AS (SELECT lang, CAST(ROUND(LN(1.0 / (c_c + v)) * 1e4) AS BIGINT) AS def_e4
                   FROM cc CROSS JOIN v),
           prior AS (SELECT lang, CAST(ROUND(LN(CAST(n_c AS DOUBLE) / n) * 1e4) AS BIGINT) AS prior_e4
                     FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_c FROM documents GROUP BY lang)
                     CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)),
           dw AS (SELECT DISTINCT doc_id, word FROM toks),
           scored AS (SELECT dw.doc_id, langs.lang,
                             CAST(SUM(COALESCE(llh.llh_e4, def.def_e4)) AS BIGINT) AS tok_score
                      FROM dw CROSS JOIN (SELECT lang FROM cc) langs
                      LEFT JOIN llh ON llh.lang = langs.lang AND llh.word = dw.word
                      JOIN def ON def.lang = langs.lang
                      GROUP BY dw.doc_id, langs.lang),
           fs AS (SELECT doc_id, s.lang, tok_score + prior_e4 AS score_e4
                  FROM scored s JOIN prior ON prior.lang = s.lang),
           pred AS (SELECT doc_id, lang AS predicted FROM
                      (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_e4 DESC, lang) AS rn
                       FROM fs)
                    WHERE rn = 1),
           outp AS (SELECT p.predicted, d.lang AS actual
                    FROM pred p JOIN documents d ON p.doc_id = d.doc_id),
           conf AS (SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
                    FROM outp GROUP BY 1, 2),
           bp AS (SELECT predicted AS class,
                         CAST(SUM(CASE WHEN actual = predicted THEN n ELSE 0 END) AS BIGINT) AS tp,
                         CAST(SUM(CASE WHEN actual <> predicted THEN n ELSE 0 END) AS BIGINT) AS fp
                  FROM conf GROUP BY 1),
           ba AS (SELECT actual AS class,
                         CAST(SUM(CASE WHEN actual <> predicted THEN n ELSE 0 END) AS BIGINT) AS fn
                  FROM conf GROUP BY 1),
           j AS (SELECT COALESCE(ba.class, bp.class) AS class,
                        COALESCE(tp, 0) AS tp, COALESCE(fp, 0) AS fp, COALESCE(fn, 0) AS fn
                 FROM ba FULL OUTER JOIN bp ON ba.class = bp.class)
      SELECT class, tp, fp, fn,
             CAST(CASE WHEN tp + fp = 0 THEN -1 ELSE tp * 10000 // (tp + fp) END AS BIGINT) AS precision_e4,
             CAST(CASE WHEN tp + fn = 0 THEN -1 ELSE tp * 10000 // (tp + fn) END AS BIGINT) AS recall_e4,
             CAST(CASE WHEN 2*tp + fp + fn = 0 THEN -1
                       ELSE 2 * tp * 10000 // (2*tp + fp + fn) END AS BIGINT) AS f1_e4
      FROM j ORDER BY class""",

    "q_target_encoding" -> """
      WITH p AS (SELECT p_brand, CAST(ROUND(p_retailprice*100) AS BIGINT) AS pc FROM part),
           g AS (SELECT CAST(SUM(pc) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS gmean FROM p),
           b AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pc) AS BIGINT) AS s
                 FROM p GROUP BY 1)
      SELECT p_brand, n, s,
             CAST((s + 10 * gmean) // (n + 10) AS BIGINT) AS enc_cents,
             CAST(gmean AS BIGINT) AS global_mean_cents
      FROM b, g ORDER BY p_brand""",

    "q_pca_power" -> """
      WITH e AS (SELECT vec_id,
                        list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS q
                 FROM embeddings),
           x AS (SELECT vec_id, i, q[i] AS xi
                 FROM e, (SELECT unnest(generate_series(1, 8)) AS i)),
           cells AS (SELECT a.i AS i, b.i AS j, SUM(CAST(a.xi AS HUGEINT) * b.xi) AS g,
                            CAST(COUNT(*) AS BIGINT) AS n
                     FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2),
           v1 AS (SELECT i, SUM(g) AS w FROM cells GROUP BY 1),
           m1 AS (SELECT MAX(ABS(w)) AS m FROM v1),
           n1 AS (SELECT i, CAST(ROUND(CAST(w AS DOUBLE) / CAST(m AS DOUBLE) * 1000000.0) AS BIGINT) AS v
                  FROM v1, m1),
           w2 AS (SELECT c.i, SUM(c.g * n1.v) AS w2 FROM cells c JOIN n1 ON c.j = n1.i GROUP BY 1),
           m2 AS (SELECT MAX(ABS(w2)) AS m2 FROM w2),
           n2 AS (SELECT i, CAST(ROUND(CAST(w2 AS DOUBLE) / CAST(m2 AS DOUBLE) * 1000000.0) AS BIGINT)
                           AS loading_e6
                  FROM w2, m2),
           r AS (SELECT SUM(CAST(n1.v AS HUGEINT) * w2.w2) AS num,
                        SUM(CAST(n1.v AS HUGEINT) * n1.v) AS den
                 FROM n1 JOIN w2 ON n1.i = w2.i),
           nv AS (SELECT MAX(n) AS nv FROM cells)
      SELECT CAST(n2.i AS BIGINT) AS dim, loading_e6,
             ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / CAST(nv AS DOUBLE) / 1e14, 6) + 0
               AS rayleigh
      FROM n2, r, nv ORDER BY dim""",

    "q_join_null_safe" -> """
      WITH l AS (SELECT NULLIF(CAST(ROUND(l_discount*100) AS BIGINT), 0) AS d,
                        CAST(COUNT(*) AS BIGINT) AS n_all
                 FROM lineitem GROUP BY 1),
           r AS (SELECT NULLIF(CAST(ROUND(l_discount*100) AS BIGINT), 0) AS d,
                        CAST(COUNT(*) AS BIGINT) AS n_heavy
                 FROM lineitem WHERE l_quantity > 25 GROUP BY 1)
      SELECT l.d AS disc_pct, n_all, n_heavy
      FROM l JOIN r ON l.d IS NOT DISTINCT FROM r.d
      ORDER BY disc_pct NULLS FIRST""",

    "q_union_by_name" -> """
      WITH y96 AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                          CAST(1996 AS BIGINT) AS yr
                   FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
           y97 AS (SELECT CAST(1997 AS BIGINT) AS yr,
                          CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
                          o_custkey
                   FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey),
           u AS (SELECT * FROM y96 UNION ALL BY NAME SELECT * FROM y97)
      SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(n_orders) AS BIGINT) AS rows_with_orders,
             CAST(COUNT(rev_cents) AS BIGINT) AS rows_with_rev,
             CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders,
             CAST(SUM(COALESCE(rev_cents, 0)) AS BIGINT) AS total_rev_cents
      FROM u GROUP BY yr ORDER BY yr""",

    "q_session_duration" -> """
      WITH s AS (SELECT user_id, session_idx, CAST(COUNT(*) AS BIGINT) AS n_events,
                        MAX(ts_usl) - MIN(ts_usl) AS dur_us
                 FROM (SELECT user_id, epoch_us(ts) AS ts_usl,
                              SUM(new_session) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
                       FROM (SELECT user_id, event_id, ts,
                                    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                                         THEN 1 ELSE 0 END AS new_session
                             FROM events
                             WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)))
                 GROUP BY user_id, session_idx),
           b AS (SELECT dur_us // 600000000 AS bucket, n_events FROM s)
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(n_events) AS BIGINT) AS total_events,
             CAST(SUM(n_events) * 100 // COUNT(*) AS BIGINT) AS avg_events_e2
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_winsorize" -> """
      WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
           b AS (SELECT event_type, CAST(ROUND(quantile_cont(vc, 0.01)) AS BIGINT) AS lo,
                        CAST(ROUND(quantile_cont(vc, 0.99)) AS BIGINT) AS hi
                 FROM v GROUP BY 1),
           j AS (SELECT v.event_type, vc, lo, hi, GREATEST(lo, LEAST(hi, vc)) AS wc
                 FROM v JOIN b ON v.event_type = b.event_type)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(lo) AS BIGINT) AS lo_cents, CAST(MAX(hi) AS BIGINT) AS hi_cents,
             CAST(SUM(CASE WHEN vc < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
             CAST(SUM(CASE WHEN vc > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
             CAST(SUM(vc) AS BIGINT) AS raw_sum_cents,
             CAST(SUM(wc) AS BIGINT) AS win_sum_cents
      FROM j GROUP BY 1 ORDER BY 1""",

    "q_freq_triples" -> """
      WITH di AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3, CAST(COUNT(*) AS BIGINT) AS support
      FROM di a JOIN di b ON a.ok = b.ok AND a.pk < b.pk
                JOIN di c ON b.ok = c.ok AND b.pk < c.pk
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
      ORDER BY support DESC, p1, p2, p3 LIMIT 20""",

    "q_streak_islands" -> """
      WITH d AS (SELECT DISTINCT user_id,
                        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dayn
                 FROM events),
           g AS (SELECT user_id,
                        dayn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dayn) AS grp
                 FROM d),
           i AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len FROM g GROUP BY 1, 2),
           u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
                        CAST(MAX(len) AS BIGINT) AS longest
                 FROM i GROUP BY 1)
      SELECT longest, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(n_islands) AS BIGINT) AS total_islands
      FROM u GROUP BY 1 ORDER BY 1""",

    "q_skew_kurtosis" -> """
      WITH s AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(q) AS BIGINT) AS s1, CAST(SUM(q*q) AS BIGINT) AS s2,
                        SUM(CAST(q*q AS HUGEINT) * q) AS s3,
                        SUM(CAST(q*q AS HUGEINT) * (q*q)) AS s4
                 FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
                 GROUP BY 1),
           t AS (SELECT flag, n,
                        CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
                        CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS r2,
                        CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE) AS r3,
                        CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE) AS r4m
                 FROM s),
           u AS (SELECT flag, n, r2 - mu*mu AS m2,
                        r3 - 3.0*mu*r2 + 2.0*mu*mu*mu AS m3,
                        r4m - 4.0*mu*r3 + 6.0*mu*mu*r2 - 3.0*mu*mu*mu*mu AS m4
                 FROM t)
      SELECT flag, n, ROUND(m3 / (m2 * SQRT(m2)), 4) + 0 AS skewness,
             ROUND(m4 / (m2 * m2) - 3.0, 4) + 0 AS kurtosis_excess
      FROM u ORDER BY flag""",

    "q_grouped_quantiles" -> """
      WITH tp AS (SELECT o_orderpriority, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp
                  FROM orders),
           q AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                        quantile_cont(tp, [0.25, 0.5, 0.75, 0.9]) AS qs
                 FROM tp GROUP BY 1)
      SELECT o_orderpriority, n,
             ROUND(qs[1], 4) + 0 AS p25, ROUND(qs[2], 4) + 0 AS p50,
             ROUND(qs[3], 4) + 0 AS p75, ROUND(qs[4], 4) + 0 AS p90
      FROM q ORDER BY o_orderpriority""",

    "q_anova_f" -> """
      WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS ng,
                        CAST(SUM(x) AS BIGINT) AS sg, CAST(SUM(x*x) AS BIGINT) AS sg2,
                        CAST(SUM(x) AS HUGEINT) * CAST(SUM(x) AS BIGINT) * 1000000
                          // CAST(COUNT(*) AS BIGINT) AS t_e6
                 FROM (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents)
                 GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
                        CAST(SUM(sg) AS BIGINT) AS sx, CAST(SUM(sg2) AS BIGINT) AS sxx,
                        SUM(t_e6) AS st_e6
                 FROM g),
           e AS (SELECT k, n,
                        CAST(st_e6 AS DOUBLE) / 1e6
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
                        CAST(sxx AS DOUBLE) - CAST(st_e6 AS DOUBLE) / 1e6 AS ssw
                 FROM s)
      SELECT k, n, ROUND(ssb, 4) + 0 AS ssb, ROUND(ssw, 4) + 0 AS ssw,
             ROUND((ssb / (CAST(k AS DOUBLE) - 1.0)) / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 4)
               + 0 AS f_stat
      FROM e""",

    "q_mutual_info" -> """
      WITH joint AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                     FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                           FROM documents)
                     GROUP BY 1, 2),
           nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nl FROM joint GROUP BY 1),
           nw AS (SELECT word, CAST(SUM(c) AS BIGINT) AS nw FROM joint GROUP BY 1),
           nn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM joint),
           t AS (SELECT lang,
                        CAST(ROUND((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)) *
                             LN(CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)
                                / (CAST(nl AS DOUBLE) * CAST(nw AS DOUBLE))) * 1e8) AS BIGINT)
                          AS term_e8
                 FROM joint JOIN nl USING (lang) JOIN nw USING (word) CROSS JOIN nn)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(term_e8) AS BIGINT) AS mi_e8,
             ROUND(CAST(SUM(term_e8) AS DOUBLE) / 1e8, 4) + 0 AS mi_nats
      FROM t GROUP BY 1 ORDER BY 1""",

    "q_benford" -> """
      WITH d AS (SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR), 1, 1)
                          AS BIGINT) AS digit,
                        CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM orders GROUP BY 1),
           n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM d)
      SELECT digit, cnt, CAST(cnt * 10000 // n AS BIGINT) AS share_e4,
             CAST(ROUND(LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) * 1e4) AS BIGINT)
               AS benford_e4
      FROM d, n ORDER BY digit""",

    "q_runs_test" -> """
      WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev,
                            year(date_trunc('day', o_orderdate)) AS yr
                     FROM orders GROUP BY 1, 3),
           p AS (SELECT yr, day, rev, LAG(rev) OVER (PARTITION BY yr ORDER BY day) AS prev
                 FROM daily),
           x AS (SELECT yr, day, CAST(rev >= prev AS BIGINT) AS up
                 FROM p WHERE prev IS NOT NULL),
           c AS (SELECT yr, up,
                        CASE WHEN LAG(up) OVER (PARTITION BY yr ORDER BY day) IS NULL
                               OR LAG(up) OVER (PARTITION BY yr ORDER BY day) <> up
                             THEN 1 ELSE 0 END AS chg
                 FROM x),
           s AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(up) AS BIGINT) AS n_up,
                        CAST(SUM(1 - up) AS BIGINT) AS n_down, CAST(SUM(chg) AS BIGINT) AS runs
                 FROM c GROUP BY 1),
           e AS (SELECT yr, n_days, n_up, n_down, runs,
                        1.0 + 2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                          / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) AS mu,
                        2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                          * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                             - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
                          / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                             * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                             * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0)) AS sig2
                 FROM s)
      SELECT CAST(yr AS BIGINT) AS yr, n_days, n_up, n_down, runs,
             ROUND((CAST(runs AS DOUBLE) - mu) / SQRT(sig2), 4) + 0 AS z
      FROM e ORDER BY yr""",

    "q_join_asof_tolerance" -> """
      WITH p AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_usl,
                        LAG(epoch_us(ts)) OVER w AS prev_usl,
                        LAG(event_id) OVER w AS prev_id
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      SELECT user_id, event_id,
             CAST(CASE WHEN prev_usl IS NOT NULL AND ts_usl - prev_usl <= 600000000
                       THEN prev_id ELSE -1 END AS BIGINT) AS matched_id,
             CAST(CASE WHEN prev_usl IS NOT NULL AND ts_usl - prev_usl <= 600000000
                       THEN ts_usl - prev_usl ELSE -1 END AS BIGINT) AS gap_us
      FROM p WHERE event_type = 'purchase' ORDER BY user_id, event_id""",

    "q_lifecycle_states" -> """
      WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
           st AS (SELECT user_id, week,
                         LAG(week) OVER w AS prev, LEAD(week) OVER w AS nxt
                  FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY week)),
           cl AS (SELECT week,
                         CASE WHEN prev IS NULL THEN 'new'
                              WHEN date_diff('day', CAST(prev AS DATE), CAST(week AS DATE)) = 7
                                THEN 'retained'
                              ELSE 'resurrected' END AS state,
                         CASE WHEN nxt IS NULL
                                OR date_diff('day', CAST(week AS DATE), CAST(nxt AS DATE)) > 7
                              THEN 1 ELSE 0 END AS churns_after
                  FROM st)
      SELECT strftime(week, '%Y-%m-%d') AS week, CAST(COUNT(*) AS BIGINT) AS active_users,
             CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
             CAST(SUM(churns_after) AS BIGINT) AS n_churning_after
      FROM cl GROUP BY 1 ORDER BY 1""",

    "q_survival_hazard" -> """
      WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
           r AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                        ROW_NUMBER() OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey) AS rn
                 FROM orders),
           fs AS (SELECT o_custkey, MIN(od) AS f,
                         MAX(CASE WHEN rn = 2 THEN od END) AS s
                  FROM r WHERE rn <= 2 GROUP BY 1),
           times AS (SELECT c_mktsegment AS seg,
                            CAST(CASE WHEN s IS NOT NULL THEN date_diff('day', f, s)
                                 ELSE date_diff('day', f, anchor) END AS BIGINT) AS t,
                            CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END AS event
                     FROM fs CROSS JOIN anchor
                     JOIN customer ON o_custkey = c_custkey),
           pd AS (SELECT seg, t, CAST(SUM(event) AS BIGINT) AS d,
                         CAST(COUNT(*) AS BIGINT) AS ending
                  FROM times GROUP BY 1, 2),
           tot AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_seg FROM times GROUP BY 1),
           rk AS (SELECT pd.seg AS seg, t, d,
                         n_seg - COALESCE(SUM(ending) OVER (PARTITION BY pd.seg ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
                  FROM pd JOIN tot ON pd.seg = tot.seg),
           f AS (SELECT seg, t,
                        CAST(ROUND(-LN(1.0 - CAST(d AS DOUBLE) / CAST(at_risk AS DOUBLE)) * 1e8)
                          AS BIGINT) AS term_e8
                 FROM rk WHERE d > 0 AND d < at_risk),
           h AS (SELECT seg, t, CAST(SUM(term_e8) OVER (PARTITION BY seg ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS h_e8
                 FROM f),
           hz AS (SELECT CAST(unnest([7, 30, 60, 90]) AS BIGINT) AS horizon),
           sel AS (SELECT seg, horizon, h_e8,
                          ROW_NUMBER() OVER (PARTITION BY seg, horizon ORDER BY t DESC) AS rn
                   FROM h JOIN hz ON t <= horizon)
      SELECT seg, horizon, h_e8 AS cum_hazard_e8
      FROM sel WHERE rn = 1 ORDER BY seg, horizon""",

    "q_hapax_ratio" -> """
      WITH wc AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  GROUP BY 1, 2)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_legomena,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
               AS hapax_share_e4
      FROM wc GROUP BY 1 ORDER BY 1""",

    "q_mix_drift" -> """
      WITH wk AS (SELECT date_trunc('week', ts) AS week, event_type,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM events GROUP BY 1, 2),
           dense AS (SELECT w.week, t.event_type, COALESCE(wk.n, 0) AS n
                     FROM (SELECT DISTINCT week FROM wk) w
                     CROSS JOIN (SELECT DISTINCT event_type FROM wk) t
                     LEFT JOIN wk ON wk.week = w.week AND wk.event_type = t.event_type),
           share AS (SELECT week, event_type, n,
                            SUM(n) OVER (PARTITION BY week) AS tot
                     FROM dense),
           s2 AS (SELECT week, event_type, tot, n * 10000 // tot AS share_e4 FROM share),
           d AS (SELECT week, tot, share_e4,
                        LAG(share_e4) OVER (PARTITION BY event_type ORDER BY week) AS prev_share
                 FROM s2)
      SELECT strftime(week, '%Y-%m-%d') AS week, CAST(MAX(tot) AS BIGINT) AS total_events,
             CAST(SUM(ABS(share_e4 - prev_share)) AS BIGINT) AS l1_drift_e4
      FROM d WHERE prev_share IS NOT NULL GROUP BY 1 ORDER BY 1""",

    "q_sample_quantile_error" -> """
      WITH o AS (SELECT o_orderpriority, o_orderkey,
                        CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp
                 FROM orders),
           e AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_exact,
                        quantile_cont(tp, 0.5) AS p50_exact
                 FROM o GROUP BY 1),
           s AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_sample,
                        quantile_cont(tp, 0.5) AS p50_sample
                 FROM o
                 WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0
                 GROUP BY 1)
      SELECT e.o_orderpriority, n_exact, n_sample,
             ROUND(p50_exact, 4) + 0 AS p50_exact, ROUND(p50_sample, 4) + 0 AS p50_sample,
             CAST(ROUND(ABS(p50_sample - p50_exact) / p50_exact * 1e4) AS BIGINT) AS rel_err_e4
      FROM e JOIN s ON e.o_orderpriority = s.o_orderpriority
      ORDER BY e.o_orderpriority""",

    "q_rare_collapse" -> """
      WITH p AS (SELECT p_type, CAST(ROUND(p_retailprice*100) AS BIGINT) AS pc FROM part),
           c AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(pc) AS BIGINT) AS s
                 FROM p GROUP BY 1),
           t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
           m AS (SELECT CASE WHEN cnt * 100 < total THEN '__other__' ELSE p_type END AS category,
                        cnt, s
                 FROM c, t)
      SELECT category, CAST(SUM(cnt) AS BIGINT) AS n_parts, CAST(SUM(s) AS BIGINT) AS sum_cents,
             CAST(SUM(s) // SUM(cnt) AS BIGINT) AS mean_cents
      FROM m GROUP BY 1 ORDER BY 1""",

    "q_iqr_outliers" -> """
      WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
           b AS (SELECT event_type, quantile_cont(vc, 0.25) AS q1, quantile_cont(vc, 0.75) AS q3
                 FROM v GROUP BY 1),
           j AS (SELECT v.event_type, vc,
                        q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
                 FROM v JOIN b ON v.event_type = b.event_type)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN vc < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
             CAST(SUM(CASE WHEN vc > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
             CAST((SUM(CASE WHEN vc < lo THEN 1 ELSE 0 END)
                   + SUM(CASE WHEN vc > hi THEN 1 ELSE 0 END)) * 10000 // COUNT(*) AS BIGINT)
               AS outlier_share_e4
      FROM j GROUP BY 1 ORDER BY 1""",

    "q_ndcg_eval" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe,
                        label
                 FROM embeddings),
           n AS (SELECT vec_id, label, qe,
                        CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nrm
                 FROM q),
           qs AS (SELECT vec_id AS qid, label AS qlabel, qe AS q_qe, nrm AS q_nrm
                  FROM n WHERE vec_id < 10),
           cp AS (SELECT vec_id, label, qe, nrm FROM n WHERE vec_id >= 10),
           sc AS (SELECT qid, qlabel, cp.vec_id, cp.label,
                         ROUND(CAST(list_sum(list_transform(list_zip(cp.qe, q_qe),
                                 p -> p[1] * p[2])) AS DOUBLE)
                               / SQRT(CAST(cp.nrm AS DOUBLE) * CAST(q_nrm AS DOUBLE)), 6) + 0 AS cos
                  FROM cp CROSS JOIN qs),
           rk AS (SELECT qid, qlabel, label,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
                  FROM sc),
           top AS (SELECT qid, qlabel,
                          CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
                          CAST(ROUND(1e8 / (LN(rank + 1) / LN(2.0))) AS BIGINT) AS w_e8
                   FROM rk WHERE rank <= 10),
           dcg AS (SELECT qid, qlabel, CAST(SUM(rel * w_e8) AS BIGINT) AS dcg_e8,
                          CAST(SUM(rel) AS BIGINT) AS n_rel_top10
                   FROM top GROUP BY 1, 2),
           rt AS (SELECT label AS qlabel, CAST(COUNT(*) AS BIGINT) AS r_total FROM cp GROUP BY 1),
           idcg AS (SELECT dcg.qid, dcg.qlabel, n_rel_top10, r_total, dcg_e8,
                           CAST(list_sum(list_transform(generate_series(1, LEAST(10, r_total)),
                                i -> CAST(ROUND(1e8 / (LN(i + 1) / LN(2.0))) AS BIGINT)))
                             AS BIGINT) AS idcg_e8
                    FROM dcg JOIN rt ON dcg.qlabel = rt.qlabel)
      SELECT qid, qlabel, n_rel_top10, r_total, dcg_e8, idcg_e8,
             CAST(CASE WHEN idcg_e8 = 0 THEN -1 ELSE dcg_e8 * 10000 // idcg_e8 END AS BIGINT)
               AS ndcg_e4
      FROM idcg ORDER BY qid""",

    "q_merge_upsert" -> """
      WITH base AS (SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c_base
                    FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
           upd AS (SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c_upd
                   FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
           m AS (SELECT CASE WHEN c_base IS NOT NULL AND c_upd IS NOT NULL THEN 'updated'
                             WHEN c_base IS NOT NULL THEN 'unchanged'
                             ELSE 'inserted' END AS status,
                        COALESCE(c_upd, c_base) AS cfinal
                 FROM base FULL OUTER JOIN upd USING (o_custkey))
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cfinal) AS BIGINT) AS total_cents_final
      FROM m GROUP BY 1 ORDER BY 1""",

    "q_grouped_regression" -> """
      WITH s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
                              CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y FROM lineitem)
                 GROUP BY 1)
      SELECT flag, n,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 4) + 0 AS slope,
             ROUND((CAST(sy AS DOUBLE) -
                    ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) + 0 AS intercept,
             ROUND(((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)))
                   / ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0 AS r2
      FROM s ORDER BY flag""",

    "q_pr_curve" -> """
      WITH sc AS (SELECT CASE WHEN label <= 4 THEN 1 ELSE 0 END AS y,
                         list_transform(embedding,
                           v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT))[1] AS x
                  FROM embeddings),
           th AS (SELECT quantile_cont(x, [0.1, 0.3, 0.5, 0.7, 0.9]) AS ts FROM sc),
           ex AS (SELECT y, x, i, ts[i] AS t
                  FROM sc, th, (SELECT unnest(generate_series(1, 5)) AS i)),
           ag AS (SELECT CAST(i AS BIGINT) AS threshold_idx,
                         ROUND(MAX(t), 4) + 0 AS threshold,
                         CAST(SUM(CASE WHEN x >= t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                         CAST(SUM(CASE WHEN x >= t AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                         CAST(SUM(CASE WHEN x < t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
                  FROM ex GROUP BY 1)
      SELECT threshold_idx, threshold, tp, fp, fn,
             CAST(CASE WHEN tp + fp = 0 THEN -1 ELSE tp * 10000 // (tp + fp) END AS BIGINT)
               AS precision_e4,
             CAST(CASE WHEN tp + fn = 0 THEN -1 ELSE tp * 10000 // (tp + fn) END AS BIGINT)
               AS recall_e4
      FROM ag ORDER BY threshold_idx""",

    "q_embedding_norm_hist" -> """
      WITH n AS (SELECT CAST(list_sum(list_transform(
                          list_transform(embedding,
                            v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)),
                          x -> x * x)) AS BIGINT) AS nrm
                 FROM embeddings)
      SELECT CAST(FLOOR(SQRT(CAST(nrm AS DOUBLE)) / 2500000.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(nrm) AS BIGINT) AS min_nrm_e14,
             CAST(MAX(nrm) AS BIGINT) AS max_nrm_e14
      FROM n GROUP BY 1 ORDER BY 1""",

    "q_peak_detection" -> """
      WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1, 2),
           x AS (SELECT event_type, day, rev,
                        LAG(rev) OVER w AS prev, LEAD(rev) OVER w AS nxt
                 FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           p AS (SELECT event_type, day, rev,
                        CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                               AND rev > prev AND rev > nxt
                             THEN 1 ELSE 0 END AS is_peak
                 FROM x),
           a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                        CAST(SUM(is_peak) AS BIGINT) AS n_peaks
                 FROM p GROUP BY 1),
           t AS (SELECT event_type, rev, strftime(day, '%Y-%m-%d') AS d,
                        ROW_NUMBER() OVER (PARTITION BY event_type
                                           ORDER BY rev DESC, strftime(day, '%Y-%m-%d') DESC) AS rn
                 FROM p WHERE is_peak = 1)
      SELECT a.event_type, n_days, n_peaks, t.d AS top_peak_day, t.rev AS top_peak_cents
      FROM a LEFT JOIN t ON a.event_type = t.event_type AND t.rn = 1
      ORDER BY a.event_type""",

    "q_pareto_coverage" -> """
      WITH pp AS (SELECT l_returnflag AS flag, l_partkey,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                  FROM lineitem GROUP BY 1, 2),
           r AS (SELECT flag, l_partkey, qty,
                        ROW_NUMBER() OVER (PARTITION BY flag ORDER BY qty DESC, l_partkey) AS rank,
                        SUM(qty) OVER (PARTITION BY flag ORDER BY qty DESC, l_partkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                        SUM(qty) OVER (PARTITION BY flag) AS tot
                 FROM pp)
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_parts, CAST(MAX(tot) AS BIGINT) AS total_qty,
             CAST(MIN(CASE WHEN cum * 5 >= tot * 4 THEN rank END) AS BIGINT) AS k80,
             CAST(CAST(SUM(CASE WHEN rank <= 10 THEN qty ELSE 0 END) AS HUGEINT) * 10000
                  // MAX(tot) AS BIGINT) AS top10_share_e4
      FROM r GROUP BY flag ORDER BY flag""",

    "q_tfidf_cosine_docs" -> """
      WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
           tf AS (SELECT doc_id, lang, source, word, CAST(COUNT(*) AS BIGINT) AS tf
                  FROM (SELECT doc_id, lang, source,
                               unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  GROUP BY 1, 2, 3, 4),
           df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           w AS (SELECT doc_id, lang, source, tf.word,
                        tf * CAST(ROUND(LN(CAST(nn AS DOUBLE) / CAST(df + 1 AS DOUBLE)) * 1e4)
                              AS BIGINT) AS w
                 FROM tf JOIN df ON tf.word = df.word CROSS JOIN nd),
           nr AS (SELECT doc_id, SUM(CAST(w AS HUGEINT) * w) AS nrm FROM w GROUP BY 1),
           dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2, SUM(CAST(a.w AS HUGEINT) * b.w) AS dot
                    FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source
                         AND a.word = b.word AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
      SELECT d1, d2,
             ROUND(CAST(dot AS DOUBLE) / SQRT(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)), 6)
               + 0 AS cos
      FROM dots JOIN nr n1 ON d1 = n1.doc_id JOIN nr n2 ON d2 = n2.doc_id
      ORDER BY cos DESC, d1, d2 LIMIT 20""",

    "q_rolling_wau" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
           b AS (SELECT MAX(day) AS max_day FROM ud),
           cov AS (SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS cov_day
                   FROM ud, (SELECT unnest(generate_series(0, 6)) AS i)),
           f AS (SELECT cov_day FROM cov, b WHERE cov_day <= max_day)
      SELECT strftime(cov_day, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS wau
      FROM f GROUP BY 1 ORDER BY 1""",

    "q_seasonal_decompose" -> """
      WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1, 2),
           m AS (SELECT event_type, day, rev,
                        SUM(rev) OVER (PARTITION BY event_type ORDER BY day
                                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma_sum,
                        COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma_n
                 FROM daily),
           r AS (SELECT event_type, dayofweek(CAST(day AS DATE)) + 1 AS dow,
                        rev * 7 - ma_sum AS resid
                 FROM m WHERE ma_n = 7)
      SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
             ROUND(CAST(SUM(resid) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 7.0), 4) + 0
               AS seasonal_cents
      FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_label_noise" -> """
      WITH q AS (SELECT vec_id, label,
                        list_transform(embedding,
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label <= 1),
           p AS (SELECT a.vec_id AS a_id, a.label AS a_label, b.vec_id AS b_id,
                        b.label AS b_label,
                        CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                             z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS d2
                 FROM q a JOIN q b ON a.vec_id <> b.vec_id),
           r AS (SELECT a_id, a_label, b_label,
                        ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY d2, b_id) AS rn
                 FROM p),
           v AS (SELECT a_id, a_label,
                        CAST(SUM(CASE WHEN b_label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS votes1
                 FROM r WHERE rn <= 5 GROUP BY 1, 2),
           fl AS (SELECT a_label,
                         CASE WHEN (votes1 >= 3) <> (a_label = 1) THEN 1 ELSE 0 END AS flagged
                  FROM v)
      SELECT CAST(a_label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(flagged) AS BIGINT) AS n_flagged,
             CAST(SUM(flagged) * 10000 // COUNT(*) AS BIGINT) AS flagged_share_e4
      FROM fl GROUP BY 1 ORDER BY 1""",

    "q_woe_binning" -> """
      WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
                 FROM lineitem),
           b AS (SELECT quantile_cont(q, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
                 FROM v),
           x AS (SELECT 1 + len(list_filter(bs, bb -> q > bb)) AS bin, bad FROM v, b),
           g AS (SELECT CAST(bin AS BIGINT) AS bin, CAST(SUM(1 - bad) AS BIGINT) AS good,
                        CAST(SUM(bad) AS BIGINT) AS bad
                 FROM x GROUP BY 1),
           t AS (SELECT CAST(SUM(good) AS BIGINT) AS tg, CAST(SUM(bad) AS BIGINT) AS tb FROM g)
      SELECT bin, good, bad,
             CASE WHEN good > 0 AND bad > 0
                  THEN CAST(ROUND(LN((CAST(good AS DOUBLE) * CAST(tb AS DOUBLE))
                       / (CAST(bad AS DOUBLE) * CAST(tg AS DOUBLE))) * 1e4) AS BIGINT)
                  ELSE NULL END AS woe_e4
      FROM g, t ORDER BY bin""",

    "q_rolling_median" -> """
      WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev,
                            year(date_trunc('day', o_orderdate)) AS yr
                     FROM orders GROUP BY 1, 3),
           x AS (SELECT day, rev,
                        ROW_NUMBER() OVER (PARTITION BY yr ORDER BY day) AS rn,
                        list(rev) OVER (PARTITION BY yr ORDER BY day
                                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
                 FROM daily)
      SELECT strftime(day, '%Y-%m-%d') AS day, rev,
             CAST(list_sort(win)[4] AS BIGINT) AS med7
      FROM x WHERE rn >= 7 ORDER BY day""",

    "q_interarrival_hist" -> """
      WITH g AS (SELECT epoch_us(ts) - LAG(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
                 FROM events),
           b AS (SELECT CAST(length(bin(gap)) AS BIGINT) AS bucket, gap
                 FROM g WHERE gap IS NOT NULL)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(gap) AS BIGINT) AS min_us,
             CAST(MAX(gap) AS BIGINT) AS max_us
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_distinct_rollup" -> """
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(week, 'ALL') AS week,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(GROUPING(event_type, week) AS BIGINT) AS gid
      FROM (SELECT event_type, strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, user_id
            FROM events)
      GROUP BY GROUPING SETS ((event_type, week), (event_type), (week), ())
      ORDER BY gid, event_type, week""",

    "q_key_dup_audit" -> """
      WITH k AS (SELECT l_orderkey, l_linenumber, CAST(COUNT(*) AS BIGINT) AS mult
                 FROM lineitem GROUP BY 1, 2)
      SELECT mult, CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(mult) AS BIGINT) AS n_rows
      FROM k GROUP BY 1 ORDER BY 1""",

    "q_feature_label_corr" -> """
      WITH e AS (SELECT CAST(label AS BIGINT) AS y,
                        list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS q
                 FROM embeddings),
           x AS (SELECT y, i AS dim, q[i] AS x
                 FROM e, (SELECT unnest(generate_series(1, 8)) AS i)),
           s AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy,
                        SUM(CAST(x AS HUGEINT) * y) AS sxy, SUM(CAST(x AS HUGEINT) * x) AS sxx,
                        CAST(SUM(y * y) AS BIGINT) AS syy
                 FROM x GROUP BY 1)
      SELECT CAST(dim AS BIGINT) AS dim, n,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 4)
               + 0 AS corr_label
      FROM s ORDER BY dim""",

    "q_corpus_report" -> """
      WITH ds AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_chars
                  FROM documents GROUP BY 1),
           ts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                         CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab
                  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  GROUP BY 1),
           dup AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS dup_docs,
                          CAST(COUNT(*) AS BIGINT) AS dup_groups
                   FROM (SELECT lang, md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS cnt
                         FROM documents GROUP BY 1, 2)
                   WHERE cnt > 1 GROUP BY 1)
      SELECT ds.lang, n_docs, n_chars, n_tokens, vocab,
             CAST(vocab * 10000 // n_tokens AS BIGINT) AS ttr_e4,
             CAST(n_chars // n_docs AS BIGINT) AS mean_chars,
             COALESCE(dup_docs, 0) AS dup_docs, COALESCE(dup_groups, 0) AS dup_groups
      FROM ds JOIN ts ON ds.lang = ts.lang LEFT JOIN dup ON ds.lang = dup.lang
      ORDER BY ds.lang""",

    "q_seq_gap_audit" -> """
      WITH g AS (SELECT l_orderkey,
                        CAST(MAX(l_linenumber) AS BIGINT)
                          - CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS gaps
                 FROM lineitem GROUP BY 1)
      SELECT gaps, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM g GROUP BY 1 ORDER BY 1""",

    "q_tier_transition" -> """
      WITH t96 AS (SELECT o_custkey,
                          CASE WHEN c < 15000000 THEN 1 WHEN c < 40000000 THEN 2
                               ELSE 3 END AS from_tier
                   FROM (SELECT o_custkey,
                                CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
                         FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)),
           t97 AS (SELECT o_custkey,
                          CASE WHEN c < 15000000 THEN 1 WHEN c < 40000000 THEN 2
                               ELSE 3 END AS to_tier
                   FROM (SELECT o_custkey,
                                CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS c
                         FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1))
      SELECT CAST(COALESCE(from_tier, 0) AS BIGINT) AS from_tier,
             CAST(COALESCE(to_tier, 0) AS BIGINT) AS to_tier,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM t96 FULL OUTER JOIN t97 USING (o_custkey)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_stickiness" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
                         strftime(date_trunc('month', ts), '%Y-%m') AS month
                  FROM events),
           d AS (SELECT month, CAST(SUM(dau) AS BIGINT) AS dau_sum,
                        CAST(COUNT(*) AS BIGINT) AS n_days
                 FROM (SELECT month, day, CAST(COUNT(*) AS BIGINT) AS dau
                       FROM ud GROUP BY 1, 2)
                 GROUP BY 1),
           m AS (SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
                 FROM ud GROUP BY 1)
      SELECT d.month, mau, n_days, dau_sum,
             CAST(dau_sum * 10000 // (n_days * mau) AS BIGINT) AS stickiness_e4
      FROM d JOIN m ON d.month = m.month ORDER BY d.month""",

    "q_session_conversion" -> """
      WITH s AS (SELECT user_id, session_idx, CAST(COUNT(*) AS BIGINT) AS n_events,
                        CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                          AS converted
                 FROM (SELECT user_id, event_type,
                              SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
                       FROM (SELECT user_id, event_id, event_type, ts,
                                    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                                         THEN 1 ELSE 0 END AS new_session
                             FROM events
                             WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)))
                 GROUP BY 1, 2),
           b AS (SELECT LEAST(n_events, 10) AS depth_bucket, converted FROM s)
      SELECT depth_bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(converted) AS BIGINT) AS n_converted,
             CAST(SUM(converted) * 10000 // COUNT(*) AS BIGINT) AS conv_e4
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_coverage_cold_items" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           bs AS (SELECT ok, CAST(COUNT(*) AS BIGINT) AS bsz FROM items GROUP BY 1),
           ps AS (SELECT pk, CAST(MAX(CASE WHEN bsz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS cooccurs
                  FROM items JOIN bs ON items.ok = bs.ok GROUP BY 1),
           j AS (SELECT p_brand, pk, cooccurs
                 FROM part LEFT JOIN ps ON p_partkey = ps.pk)
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_catalog,
             CAST(SUM(CASE WHEN pk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_sold,
             CAST(SUM(COALESCE(cooccurs, 0)) AS BIGINT) AS n_cooccur,
             CAST(CASE WHEN SUM(CASE WHEN pk IS NOT NULL THEN 1 ELSE 0 END) = 0 THEN -1
                       ELSE (SUM(CASE WHEN pk IS NOT NULL THEN 1 ELSE 0 END)
                             - SUM(COALESCE(cooccurs, 0))) * 10000
                            // SUM(CASE WHEN pk IS NOT NULL THEN 1 ELSE 0 END) END AS BIGINT)
               AS cold_share_e4
      FROM j GROUP BY 1 ORDER BY 1""",

    "q_dedup_threshold_sweep" -> """
      WITH dt AS (SELECT DISTINCT doc_id, lang, source, word FROM
                    (SELECT doc_id, lang, source,
                            unnest(string_split(lower(text), ' ')) AS word FROM documents)),
           sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM dt GROUP BY doc_id),
           inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS inter
                     FROM dt a JOIN dt b
                       ON a.lang = b.lang AND a.source = b.source
                      AND a.word = b.word AND a.doc_id < b.doc_id
                     GROUP BY 1, 2),
           pj AS (SELECT d1, d2,
                         CAST(inter * 10000 // (s1.sz + s2.sz - inter) AS BIGINT) AS j_e4
                  FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id),
           sw AS (SELECT d1, d2, j_e4, t AS thr
                  FROM pj, (SELECT unnest([5000, 6000, 7000, 8000, 9000]) AS t)
                  WHERE j_e4 >= t)
      SELECT CAST(thr AS BIGINT) AS threshold_e4, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COUNT(DISTINCT d2) AS BIGINT) AS n_docs_removed
      FROM sw GROUP BY 1 ORDER BY 1""",

    "q_minhash_accuracy" -> """
      WITH dt AS (SELECT DISTINCT doc_id, lang, source, word FROM
                    (SELECT doc_id, lang, source,
                            unnest(string_split(lower(text), ' ')) AS word FROM documents)),
           hs AS (SELECT doc_id, lang, source, word,
                         CAST('0x' || substring(md5(word), 1, 8) AS BIGINT) AS h FROM dt),
           sig AS (SELECT doc_id, lang, source, i,
                          MIN(((2*i + 1) * h + 7919*i + 12345) % 1000000007) AS sig
                   FROM hs, (SELECT unnest(generate_series(0, 7)) AS i)
                   GROUP BY doc_id, lang, source, i),
           bands AS (SELECT doc_id, lang, source, i // 2 AS band,
                            CAST(SUM(sig * (CASE WHEN i % 2 = 0 THEN 4294967311 ELSE 1 END)) AS BIGINT) AS bv
                     FROM sig GROUP BY doc_id, lang, source, i // 2),
           cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                    FROM bands a JOIN bands b
                      ON a.lang = b.lang AND a.source = b.source
                     AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
           mt AS (SELECT d1, d2,
                         CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT) AS matches
                  FROM cand
                  JOIN sig sa ON sa.doc_id = d1
                  JOIN sig sb ON sb.doc_id = d2 AND sb.i = sa.i
                  GROUP BY 1, 2),
           sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM dt GROUP BY doc_id),
           ex AS (SELECT d1, d2,
                         CAST(i * 10000 // (s1.sz + s2.sz - i) AS BIGINT) AS exact_e4
                  FROM (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS i
                        FROM cand
                        JOIN dt ta ON ta.doc_id = d1
                        JOIN dt tb ON tb.doc_id = d2 AND tb.word = ta.word
                        GROUP BY d1, d2)
                  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id)
      SELECT mt.d1, mt.d2, matches, CAST(matches * 1250 AS BIGINT) AS est_e4, exact_e4,
             CAST(ABS(matches * 1250 - exact_e4) AS BIGINT) AS abs_err_e4
      FROM mt JOIN ex ON mt.d1 = ex.d1 AND mt.d2 = ex.d2
      ORDER BY mt.d1, mt.d2""",

    "q_hhi_concentration" -> """
      WITH rev AS (SELECT year(l_shipdate) AS yr, p_brand,
                          CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS s
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   GROUP BY 1, 2),
           sh AS (SELECT yr, s * 10000 // SUM(s) OVER (PARTITION BY yr) AS share_e4,
                         SUM(s) OVER (PARTITION BY yr) AS tot
                  FROM rev)
      SELECT CAST(yr AS BIGINT) AS yr, CAST(COUNT(*) AS BIGINT) AS n_brands,
             CAST(MAX(tot) AS BIGINT) AS total_cents,
             CAST(SUM(share_e4 * share_e4) AS BIGINT) AS hhi_e8
      FROM sh GROUP BY 1 ORDER BY 1""",

    "q_user_similarity" -> """
      WITH top50 AS (SELECT o_custkey FROM orders GROUP BY o_custkey
                     ORDER BY COUNT(*) DESC, o_custkey LIMIT 50),
           sets AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS pk
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN top50 USING (o_custkey)),
           sizes AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS sz FROM sets GROUP BY 1),
           inter AS (SELECT a.cust AS c1, b.cust AS c2, CAST(COUNT(*) AS BIGINT) AS inter
                     FROM sets a JOIN sets b ON a.pk = b.pk AND a.cust < b.cust
                     GROUP BY 1, 2)
      SELECT c1, c2, CAST(inter * 10000 // (s1.sz + s2.sz - inter) AS BIGINT) AS jaccard_e4
      FROM inter JOIN sizes s1 ON c1 = s1.cust JOIN sizes s2 ON c2 = s2.cust
      ORDER BY jaccard_e4 DESC, c1, c2 LIMIT 20""",

    "q_feature_store_export" -> """
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchases,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS purchase_cents,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
             CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS BIGINT)
               AS tenure_days,
             CAST(COUNT(*) * 100 // (date_diff('day', MIN(CAST(ts AS DATE)),
                                               MAX(CAST(ts AS DATE))) + 1) AS BIGINT)
               AS events_per_day_e2
      FROM events WHERE user_id < 100
      GROUP BY user_id ORDER BY user_id""",

    "q_nn_distance_hist" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding,
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label <= 1),
           nn AS (SELECT a.vec_id AS a_id,
                         MIN(CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                              z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT)) AS nn_d2
                  FROM q a JOIN q b ON a.vec_id <> b.vec_id
                  GROUP BY 1)
      SELECT CAST(length(bin(nn_d2)) AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(nn_d2) AS BIGINT) AS min_d2, CAST(MAX(nn_d2) AS BIGINT) AS max_d2
      FROM nn GROUP BY 1 ORDER BY 1""",

    "q_lag_features_export" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_usl,
                        CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events WHERE user_id < 20)
      SELECT user_id, event_id, vc AS value_cents,
             LAG(vc) OVER w AS prev_cents,
             vc - LAG(vc) OVER w AS delta_cents,
             CAST(SUM(vc) OVER (PARTITION BY user_id ORDER BY ts_usl, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum3_cents,
             CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_usl, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n3
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_usl, event_id)
      ORDER BY user_id, event_id""",

    "q_revenue_growth_accounting" -> """
      WITH rev AS (SELECT user_id, date_trunc('month', ts) AS month,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                   FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
           fm AS (SELECT user_id, MIN(month) AS fm FROM rev GROUP BY 1),
           mm AS (SELECT MAX(month) AS mm FROM rev),
           sc AS (SELECT user_id, unnest(generate_series(fm, mm, INTERVAL 1 MONTH)) AS month
                  FROM fm, mm),
           dense AS (SELECT sc.user_id, sc.month, COALESCE(rev.rev, 0) AS rev
                     FROM sc LEFT JOIN rev ON sc.user_id = rev.user_id
                                          AND sc.month = rev.month),
           lagd AS (SELECT user_id, month, rev,
                           LAG(rev) OVER (PARTITION BY user_id ORDER BY month) AS prev
                    FROM dense)
      SELECT strftime(month, '%Y-%m') AS month,
             CAST(SUM(CASE WHEN prev IS NULL THEN rev ELSE 0 END) AS BIGINT) AS new_cents,
             CAST(SUM(CASE WHEN prev > 0 AND rev > prev THEN rev - prev ELSE 0 END) AS BIGINT)
               AS expansion_cents,
             CAST(SUM(CASE WHEN prev > 0 AND rev > 0 AND rev < prev THEN rev - prev ELSE 0 END)
               AS BIGINT) AS contraction_cents,
             CAST(SUM(CASE WHEN prev > 0 AND rev = 0 THEN -prev ELSE 0 END) AS BIGINT)
               AS churned_cents,
             CAST(SUM(CASE WHEN prev = 0 AND rev > 0 THEN rev ELSE 0 END) AS BIGINT)
               AS resurrected_cents,
             CAST(SUM(CASE WHEN prev IS NULL THEN rev ELSE 0 END)
                  + SUM(CASE WHEN prev > 0 AND rev > prev THEN rev - prev ELSE 0 END)
                  + SUM(CASE WHEN prev > 0 AND rev > 0 AND rev < prev THEN rev - prev ELSE 0 END)
                  + SUM(CASE WHEN prev > 0 AND rev = 0 THEN -prev ELSE 0 END)
                  + SUM(CASE WHEN prev = 0 AND rev > 0 THEN rev ELSE 0 END) AS BIGINT)
               AS net_change_cents
      FROM lagd GROUP BY 1 ORDER BY 1""",

    "q_attribution_linear" -> """
      WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts,
                        CAST(ROUND(value*100) AS BIGINT) AS rev
                 FROM events WHERE event_type = 'purchase'),
           e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_usl FROM events),
           touches AS (SELECT p_id, rev, event_type
                       FROM p JOIN e ON p.user_id = e.user_id
                       WHERE e.event_type <> 'purchase'
                         AND e.ts_usl >= p.p_ts - 3600000000 AND e.ts_usl < p.p_ts),
           pp AS (SELECT p_id, rev, CAST(COUNT(*) AS BIGINT) AS k
                  FROM touches GROUP BY 1, 2),
           credited AS (SELECT event_type AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
                               CAST(SUM(t.rev // pp.k) AS BIGINT) AS credited_cents
                        FROM touches t JOIN pp ON t.p_id = pp.p_id
                        GROUP BY 1),
           unattr AS (SELECT 'unattributed' AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
                             CAST(SUM(CASE WHEN pp.k IS NULL THEN p.rev
                                      ELSE p.rev - (p.rev // pp.k) * pp.k END) AS BIGINT)
                               AS credited_cents
                      FROM p LEFT JOIN pp ON p.p_id = pp.p_id)
      SELECT channel, n_touches, credited_cents FROM credited
      UNION ALL SELECT channel, n_touches, credited_cents FROM unattr
      ORDER BY channel""",

    "q_bigram_entropy_rate" -> """
      WITH bg0 AS (SELECT lang, w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                   FROM (SELECT doc_id, lang,
                                unnest(string_split(lower(text), ' ')) AS w1,
                                generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                         FROM documents)),
           bg AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                  FROM bg0 WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
           h2 AS (SELECT lang, CAST(SUM(c12) AS BIGINT) AS n2,
                         CAST(SUM(CAST(ROUND(CAST(c12 AS DOUBLE) * LN(CAST(c12 AS DOUBLE)) * 1e4)
                               AS BIGINT)) AS BIGINT) AS s2_e4
                  FROM bg GROUP BY 1),
           u AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY 1, 2),
           h1 AS (SELECT lang, CAST(SUM(c1) AS BIGINT) AS n1,
                         CAST(SUM(CAST(ROUND(CAST(c1 AS DOUBLE) * LN(CAST(c1 AS DOUBLE)) * 1e4)
                               AS BIGINT)) AS BIGINT) AS s1_e4
                  FROM u GROUP BY 1)
      SELECT h2.lang, n2 AS n_bigrams,
             ROUND(LN(CAST(n1 AS DOUBLE)) - CAST(s1_e4 AS DOUBLE) / (CAST(n1 AS DOUBLE) * 1e4), 4)
               + 0 AS h_unigram,
             ROUND(LN(CAST(n2 AS DOUBLE)) - CAST(s2_e4 AS DOUBLE) / (CAST(n2 AS DOUBLE) * 1e4), 4)
               + 0 AS h_joint,
             ROUND((LN(CAST(n2 AS DOUBLE)) - CAST(s2_e4 AS DOUBLE) / (CAST(n2 AS DOUBLE) * 1e4))
                   - (LN(CAST(n1 AS DOUBLE)) - CAST(s1_e4 AS DOUBLE) / (CAST(n1 AS DOUBLE) * 1e4)), 4)
               + 0 AS entropy_rate
      FROM h2 JOIN h1 ON h2.lang = h1.lang ORDER BY h2.lang""",

    "q_psi_drift" -> """
      WITH o AS (SELECT year(o_orderdate) AS yr, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp
                 FROM orders),
           b AS (SELECT quantile_cont(tp, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
                 FROM o WHERE yr = 1996),
           x AS (SELECT yr, 1 + len(list_filter(bs, bb -> tp > bb)) AS bin
                 FROM o, b WHERE yr IN (1996, 1997)),
           g AS (SELECT CAST(bin AS BIGINT) AS bin,
                        CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS c96,
                        CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS c97
                 FROM x GROUP BY 1),
           t AS (SELECT CAST(SUM(c96) AS BIGINT) AS t96, CAST(SUM(c97) AS BIGINT) AS t97 FROM g)
      SELECT bin, c96, c97,
             CAST(ROUND((CAST(c96 + 1 AS DOUBLE) / CAST(t96 + 10 AS DOUBLE)
                         - CAST(c97 + 1 AS DOUBLE) / CAST(t97 + 10 AS DOUBLE))
                        * LN((CAST(c96 + 1 AS DOUBLE) / CAST(t96 + 10 AS DOUBLE))
                             / (CAST(c97 + 1 AS DOUBLE) / CAST(t97 + 10 AS DOUBLE))) * 1e8)
               AS BIGINT) AS psi_term_e8
      FROM g, t ORDER BY bin""",

    "q_partition_health" -> """
      WITH d AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
                        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                        CAST(SUM(length(props)) AS BIGINT) AS props_chars,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
                 FROM events GROUP BY 1),
           t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total,
                        CAST(COUNT(*) AS BIGINT) AS days FROM d)
      SELECT strftime(day, '%Y-%m-%d') AS day, n_events, n_users, props_chars, value_cents,
             CAST(CASE WHEN n_events * 2 * days > total * 3 THEN 1 ELSE 0 END AS BIGINT)
               AS hot_flag
      FROM d, t ORDER BY day""",

    "q_top_movers" -> """
      WITH bm AS (SELECT p_brand, date_trunc('month', l_shipdate) AS month,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  GROUP BY 1, 2),
           l AS (SELECT p_brand, month, rev,
                        LAG(month) OVER w AS prev_month, LAG(rev) OVER w AS prev_rev
                 FROM bm WINDOW w AS (PARTITION BY p_brand ORDER BY month))
      SELECT strftime(month, '%Y-%m') AS month, p_brand, prev_rev AS prev_cents,
             rev AS cur_cents, rev - prev_rev AS delta_cents
      FROM l
      WHERE prev_month IS NOT NULL AND prev_month + INTERVAL 1 MONTH = month
      ORDER BY ABS(rev - prev_rev) DESC, p_brand, month LIMIT 10""",

    "q_int8_quant_error" -> """
      WITH e AS (SELECT list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS q
                 FROM embeddings),
           v AS (SELECT i AS dim, q[i] AS x
                 FROM e, (SELECT unnest(generate_series(1, 8)) AS i)),
           b AS (SELECT dim, CAST(MAX(ABS(x)) AS BIGINT) AS maxabs FROM v GROUP BY 1),
           er AS (SELECT v.dim, maxabs,
                         CAST(ROUND(ABS(CAST(x AS DOUBLE)
                              - ROUND(CAST(x AS DOUBLE) * 127.0 / CAST(maxabs AS DOUBLE))
                                * CAST(maxabs AS DOUBLE) / 127.0) * 100.0 / 1e7) AS BIGINT)
                           AS err_e2
                  FROM v JOIN b ON v.dim = b.dim)
      SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(maxabs) AS BIGINT) AS maxabs_e7,
             ROUND(CAST(SUM(err_e2) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100.0), 4) + 0
               AS mean_abs_err
      FROM er GROUP BY 1 ORDER BY 1""",

    "q_nzv_screen" -> """
      WITH e AS (SELECT list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*100) AS BIGINT)) AS q
                 FROM embeddings),
           v AS (SELECT i AS dim, q[i] AS v
                 FROM e, (SELECT unnest(generate_series(1, 8)) AS i)),
           c AS (SELECT dim, v, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
           r AS (SELECT dim, c, ROW_NUMBER() OVER (PARTITION BY dim ORDER BY c DESC, v) AS rn
                 FROM c),
           a AS (SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n_distinct,
                        CAST(SUM(c) AS BIGINT) AS n,
                        CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS top1,
                        CAST(MAX(CASE WHEN rn = 2 THEN c END) AS BIGINT) AS top2
                 FROM r GROUP BY 1)
      SELECT dim, n_distinct, CAST(top1 * 10000 // n AS BIGINT) AS top_share_e4,
             CAST(CASE WHEN top2 IS NULL THEN -1 ELSE top1 * 100 // top2 END AS BIGINT)
               AS freq_ratio_e2
      FROM a ORDER BY dim""",

    "q_ks_test" -> """
      WITH vals AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS v,
                           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                           CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
                    FROM events GROUP BY 1),
           cum AS (SELECT v, SUM(c0) OVER (ORDER BY v) AS cum0,
                          SUM(c1) OVER (ORDER BY v) AS cum1 FROM vals),
           n AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1 FROM vals)
      SELECT n0, n1, v AS at_value_cents,
             CAST(ABS(cum0*n1 - cum1*n0) * 1000000 // (n0*n1) AS BIGINT) AS ks_e6
      FROM cum, n
      ORDER BY ABS(cum0*n1 - cum1*n0) DESC, v ASC LIMIT 1""",

    "q_mann_whitney" -> """
      WITH vals AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS v,
                           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cf,
                           CAST(COUNT(*) AS BIGINT) AS ct
                    FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
           r AS (SELECT cf, ct,
                        CAST(COALESCE(SUM(ct) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
                 FROM vals),
           s AS (SELECT CAST(SUM(cf) AS BIGINT) AS n1, CAST(SUM(ct - cf) AS BIGINT) AS n2,
                        CAST(SUM(cf * (2*cb + ct + 1)) AS BIGINT) AS r1_x2,
                        CAST(SUM(ct * (ct*ct - 1)) AS BIGINT) AS ties3
                 FROM r)
      SELECT n1, n2, CAST(r1_x2 - n1*(n1+1) AS BIGINT) AS u1_x2,
             ROUND((CAST(r1_x2 - n1*(n1+1) AS DOUBLE) / 2.0
                    - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                   / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
                          ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                           - CAST(ties3 AS DOUBLE)
                             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))), 4)
               + 0 AS z
      FROM s""",

    "q_cramers_v" -> """
      WITH cells AS (SELECT c_mktsegment AS seg, n_regionkey AS reg,
                            CAST(COUNT(*) AS BIGINT) AS obs
                     FROM customer JOIN nation ON c_nationkey = n_nationkey
                     GROUP BY 1, 2),
           x AS (SELECT seg, reg, obs,
                        CAST(SUM(obs) OVER (PARTITION BY seg) AS BIGINT) AS rowt,
                        CAST(SUM(obs) OVER (PARTITION BY reg) AS BIGINT) AS colt,
                        CAST(SUM(obs) OVER () AS BIGINT) AS n
                 FROM cells),
           t AS (SELECT n,
                        CAST(ROUND(CAST(obs*n - rowt*colt AS DOUBLE)
                                   * CAST(obs*n - rowt*colt AS DOUBLE)
                                   / CAST(rowt*colt AS DOUBLE) / CAST(n AS DOUBLE) * 1e8)
                          AS BIGINT) AS t_e8,
                        seg, reg
                 FROM x),
           s AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
                        CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
                        CAST(COUNT(DISTINCT reg) AS BIGINT) AS c,
                        CAST(SUM(t_e8) AS BIGINT) AS chi2_e8
                 FROM t)
      SELECT n, r, c, ROUND(CAST(chi2_e8 AS DOUBLE) / 1e8, 4) + 0 AS chi2,
             ROUND(SQRT(CAST(chi2_e8 AS DOUBLE) / 1e8
                        / (CAST(n AS DOUBLE) * (CAST(LEAST(r, c) AS DOUBLE) - 1.0))), 6)
               + 0 AS v
      FROM s""",

    "q_cohens_d" -> """
      WITH g AS (SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS s,
                        SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)
                            * CAST(ROUND(o_totalprice*100) AS BIGINT)) AS ss
                 FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW') GROUP BY 1),
           s AS (SELECT CAST(SUM(CASE WHEN grp = '1-URGENT' THEN n END) AS BIGINT) AS n1,
                        SUM(CASE WHEN grp = '1-URGENT' THEN s END) AS s1,
                        SUM(CASE WHEN grp = '1-URGENT' THEN ss END) AS ss1,
                        CAST(SUM(CASE WHEN grp = '5-LOW' THEN n END) AS BIGINT) AS n2,
                        SUM(CASE WHEN grp = '5-LOW' THEN s END) AS s2,
                        SUM(CASE WHEN grp = '5-LOW' THEN ss END) AS ss2
                 FROM g)
      SELECT n1, n2,
             ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 4) + 0 AS mean1,
             ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0, 4) + 0 AS mean2,
             ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   / SQRT(((CAST(ss1 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                           + (CAST(ss2 AS DOUBLE)
                              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6) + 0 AS d
      FROM s""",

    "q_decile_lift" -> """
      WITH spend AS (SELECT o_custkey,
                            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend
                     FROM orders GROUP BY 1),
           med AS (SELECT quantile_cont(spend, 0.5) AS m FROM spend),
           bounds AS (SELECT quantile_cont(CAST(ROUND(c_acctbal*100) AS BIGINT),
                               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
                      FROM customer),
           lab AS (SELECT CAST(10 - len(list_filter(bs,
                            b -> CAST(ROUND(c_acctbal*100) AS BIGINT) > b)) AS BIGINT)
                            AS decile,
                          CASE WHEN CAST(COALESCE(spend, 0) AS DOUBLE) > m
                               THEN 1 ELSE 0 END AS pos
                   FROM customer LEFT JOIN spend ON c_custkey = o_custkey
                        CROSS JOIN med CROSS JOIN bounds),
           a AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(pos) AS BIGINT) AS n_pos
                 FROM lab GROUP BY 1),
           c AS (SELECT decile, n, n_pos,
                        CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                        CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
                        CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
                        CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
                 FROM a)
      SELECT decile, n, n_pos, CAST(n_pos * 1000000 // n AS BIGINT) AS rate_e6,
             CAST(cum_pos * tot_n * 1000000 // (cum_n * tot_pos) AS BIGINT) AS cum_lift_e6
      FROM c ORDER BY decile""",

    "q_map_eval" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe,
                        label
                 FROM embeddings),
           n AS (SELECT vec_id, label, qe,
                        CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nrm
                 FROM q),
           qs AS (SELECT vec_id AS qid, label AS qlabel, qe AS q_qe, nrm AS q_nrm
                  FROM n WHERE vec_id < 10),
           cp AS (SELECT vec_id, label, qe, nrm FROM n WHERE vec_id >= 10),
           sc AS (SELECT qid, qlabel, cp.vec_id, cp.label,
                         ROUND(CAST(list_sum(list_transform(list_zip(cp.qe, q_qe),
                                 p -> p[1] * p[2])) AS DOUBLE)
                               / SQRT(CAST(cp.nrm AS DOUBLE) * CAST(q_nrm AS DOUBLE)), 6) + 0 AS cos
                  FROM cp CROSS JOIN qs),
           rk AS (SELECT qid, qlabel, label,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
                  FROM sc),
           top AS (SELECT qid, qlabel, rank,
                          CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel
                   FROM rk WHERE rank <= 10),
           cum AS (SELECT qid, qlabel, rel, rank,
                          SUM(rel) OVER (PARTITION BY qid ORDER BY rank) AS cum_rel
                   FROM top),
           ap AS (SELECT qid, qlabel, CAST(SUM(rel) AS BIGINT) AS n_rel_top10,
                         CAST(SUM(CASE WHEN rel = 1
                                       THEN cum_rel * 100000000 // rank ELSE 0 END)
                           AS BIGINT) AS sum_prec_e8
                  FROM cum GROUP BY 1, 2),
           rt AS (SELECT label AS qlabel, CAST(COUNT(*) AS BIGINT) AS r_total FROM cp GROUP BY 1)
      SELECT qid, CAST(ap.qlabel AS BIGINT) AS qlabel, n_rel_top10, r_total,
             CAST(sum_prec_e8 // LEAST(10, r_total) AS BIGINT) AS ap_e8
      FROM ap JOIN rt ON ap.qlabel = rt.qlabel ORDER BY qid""",

    "q_mrr_eval" -> """
      WITH q AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe,
                        label
                 FROM embeddings),
           n AS (SELECT vec_id, label, qe,
                        CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nrm
                 FROM q),
           qs AS (SELECT vec_id AS qid, label AS qlabel, qe AS q_qe, nrm AS q_nrm
                  FROM n WHERE vec_id < 10),
           cp AS (SELECT vec_id, label, qe, nrm FROM n WHERE vec_id >= 10),
           sc AS (SELECT qid, qlabel, cp.vec_id, cp.label,
                         ROUND(CAST(list_sum(list_transform(list_zip(cp.qe, q_qe),
                                 p -> p[1] * p[2])) AS DOUBLE)
                               / SQRT(CAST(cp.nrm AS DOUBLE) * CAST(q_nrm AS DOUBLE)), 6) + 0 AS cos
                  FROM cp CROSS JOIN qs),
           rk AS (SELECT qid, qlabel, label,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
                  FROM sc),
           fr AS (SELECT qid, qlabel,
                         MIN(CASE WHEN label = qlabel THEN rank END) AS fr
                  FROM rk WHERE rank <= 10 GROUP BY 1, 2)
      SELECT qid, CAST(qlabel AS BIGINT) AS qlabel,
             CAST(COALESCE(fr, -1) AS BIGINT) AS first_rel_rank,
             CAST(COALESCE(1000000 // fr, 0) AS BIGINT) AS rr_e6
      FROM fr ORDER BY qid""",

    "q_knn_regression" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           y AS (SELECT vec_id, qe,
                        CAST(list_sum(qe[9:16]) AS BIGINT) AS y
                 FROM n),
           queries AS (SELECT vec_id AS qid, y AS y_true, qe AS q_qe FROM y WHERE vec_id < 10),
           train AS (SELECT vec_id AS tid, y AS t_y, qe AS t_qe FROM y WHERE vec_id >= 10),
           d AS (SELECT qid, y_true, tid, t_y,
                        CAST(list_sum(list_transform(list_zip(q_qe, t_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM queries, train),
           nn5 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, tid) AS rn FROM d)
                   WHERE rn <= 5),
           p AS (SELECT qid, y_true, CAST(SUM(t_y) AS BIGINT) AS sum_y
                 FROM nn5 GROUP BY 1, 2)
      SELECT qid, y_true,
             CAST(CASE WHEN sum_y >= 0 THEN sum_y // 5 ELSE -((-sum_y) // 5) END AS BIGINT) AS pred_y,
             CAST(ABS(y_true - (CASE WHEN sum_y >= 0 THEN sum_y // 5
                                     ELSE -((-sum_y) // 5) END)) AS BIGINT) AS abs_err
      FROM p ORDER BY qid""",

    "q_calibration_bins" -> """
      WITH m AS (SELECT label,
                        CAST(list_sum(list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT))) AS BIGINT) AS s_e7
                 FROM embeddings),
           p AS (SELECT label,
                        CAST(ROUND((0.5 + (CAST(s_e7 AS DOUBLE) / 1e7)
                                    / (2.0 * (1.0 + ABS(CAST(s_e7 AS DOUBLE) / 1e7)))) * 1e6)
                          AS BIGINT) AS p_e6
                 FROM m),
           b AS (SELECT label, p_e6,
                        LEAST(9, p_e6 // 100000) AS bin
                 FROM p)
      SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p_e6) // COUNT(*) AS BIGINT) AS mean_pred_e6,
             CAST(SUM(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
               AS BIGINT) AS pos_rate_e6
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_quantile_normalize" -> """
      WITH s AS (SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS score FROM customer),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
           r AS (SELECT c_custkey, score,
                        CAST(RANK() OVER (ORDER BY score) - 1 AS BIGINT) AS r0
                 FROM s)
      SELECT c_custkey, score, CAST(r0 * 1000000 // (n - 1) AS BIGINT) AS pr_e6
      FROM r, n WHERE c_custkey < 20 ORDER BY c_custkey""",

    "q_drawdown" -> """
      WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
                            CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM lineitem GROUP BY 1),
           d AS (SELECT day, CAST(year(day) AS BIGINT) AS yr,
                        CAST(MAX(rev) OVER (PARTITION BY year(day) ORDER BY day) - rev
                          AS BIGINT) AS dd
                 FROM daily),
           w AS (SELECT yr, dd, day,
                        ROW_NUMBER() OVER (PARTITION BY yr ORDER BY dd DESC, day ASC) AS rn,
                        CAST(COUNT(*) OVER (PARTITION BY yr) AS BIGINT) AS n_days
                 FROM d)
      SELECT yr, n_days, dd AS max_dd_cents, strftime(day, '%Y-%m-%d') AS worst_day
      FROM w WHERE rn = 1 ORDER BY yr""",

    "q_bollinger_breaks" -> """
      WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
                            CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM lineitem GROUP BY 1),
           r AS (SELECT CAST(year(day) AS BIGINT) AS yr, rev,
                        SUM(rev) OVER w AS s7,
                        SUM(CAST(rev AS HUGEINT) * rev) OVER w AS ss7,
                        COUNT(*) OVER w AS cnt
                 FROM daily
                 WINDOW w AS (PARTITION BY year(day) ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
           b AS (SELECT yr, CAST(7 AS HUGEINT) * rev - s7 AS dev7,
                        CAST(3 AS HUGEINT) * (CAST(7 AS HUGEINT) * rev - s7)
                          * (CAST(7 AS HUGEINT) * rev - s7) AS lhs,
                        CAST(14 AS HUGEINT)
                          * (CAST(7 AS HUGEINT) * ss7 - CAST(s7 AS HUGEINT) * s7) AS rhs
                 FROM r WHERE cnt = 7)
      SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN lhs > rhs AND dev7 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_break_up,
             CAST(SUM(CASE WHEN lhs > rhs AND dev7 < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_break_down
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_vwap_monthly" -> """
      SELECT l_returnflag AS flag,
             strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) * 100
                  // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vwap_e4
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_basket_size_dist" -> """
      WITH o AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
                        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                 FROM lineitem GROUP BY 1)
      SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(n_parts) AS BIGINT) AS parts_total,
             CAST(SUM(qty) AS BIGINT) AS qty_total
      FROM o GROUP BY 1 ORDER BY 1""",

    "q_price_elasticity" -> """
      WITH l AS (SELECT p_brand AS brand,
                        CAST(ROUND(LN(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS DOUBLE)
                                      / CAST(l_quantity AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                        CAST(ROUND(LN(CAST(l_quantity AS DOUBLE)) * 1e6) AS BIGINT) AS y
                 FROM lineitem JOIN part ON l_partkey = p_partkey),
           s AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        SUM(CAST(x AS HUGEINT) * y) AS sxy,
                        SUM(CAST(x AS HUGEINT) * x) AS sxx
                 FROM l GROUP BY 1)
      SELECT brand, n,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0 AS elasticity,
             ROUND((CAST(sy AS DOUBLE)
                    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                      * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) / 1e6, 6) + 0 AS intercept_ln
      FROM s ORDER BY brand""",

    "q_token_length_profile" -> """
      WITH t AS (SELECT lang, length(word) AS len
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)),
           c AS (SELECT lang, CAST(len AS BIGINT) AS len, CAST(COUNT(*) AS BIGINT) AS n
                 FROM t GROUP BY 1, 2)
      SELECT lang, len, n,
             CAST(n * 10000 // SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS share_e4
      FROM c ORDER BY lang, len""",

    "q_dedup_bow" -> """
      WITH b AS (SELECT lang,
                        array_to_string(list_sort(string_split(lower(text), ' ')), ' ') AS bow
                 FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT bow) AS BIGINT) AS n_bow_distinct,
             CAST(COUNT(*) - COUNT(DISTINCT bow) AS BIGINT) AS n_dup_extra
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_ngram_novelty" -> """
      WITH bg0 AS (SELECT lang,
                          word || ' ' || LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos)
                            AS bigram
                   FROM (SELECT doc_id, lang,
                                unnest(string_split(lower(text), ' ')) AS word,
                                generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                         FROM documents)),
           bg AS (SELECT lang, bigram FROM bg0 WHERE bigram IS NOT NULL),
           top AS (SELECT bigram, 1 AS in_top FROM (
                     SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1
                     ORDER BY n DESC, bigram LIMIT 1000)),
           j AS (SELECT lang, CASE WHEN t.in_top IS NULL THEN 1 ELSE 0 END AS novel
                 FROM bg LEFT JOIN top t ON bg.bigram = t.bigram)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(novel) AS BIGINT) AS n_novel,
             CAST(SUM(novel) * 10000 // COUNT(*) AS BIGINT) AS novelty_e4
      FROM j GROUP BY 1 ORDER BY 1""",

    "q_top_token_coverage" -> """
      WITH c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1, 2),
           r AS (SELECT lang, n,
                        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
                 FROM c)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN rk <= 20 THEN n ELSE 0 END) AS BIGINT) AS top20_tokens,
             CAST(SUM(CASE WHEN rk <= 20 THEN n ELSE 0 END) * 10000 // SUM(n) AS BIGINT)
               AS coverage_e4
      FROM r GROUP BY 1 ORDER BY 1""",

    "q_chars_per_token" -> """
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS toks,
             CAST(SUM(n_chars) * 10000 // SUM(len(string_split(lower(text), ' ')))
               AS BIGINT) AS cpt_e4
      FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_session_path_topk" -> """
      WITH s AS (SELECT user_id, event_id, event_type, ts_usl,
                        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_usl, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
                 FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_usl,
                              CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                     OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                                   THEN 1 ELSE 0 END AS new_session
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))),
           f AS (SELECT user_id, session_idx, event_type, ts_usl, event_id,
                        ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
                                           ORDER BY ts_usl, event_id) AS rn
                 FROM s),
           p AS (SELECT user_id, session_idx,
                        string_agg(event_type, '>' ORDER BY ts_usl, event_id) AS path
                 FROM f WHERE rn <= 3 GROUP BY 1, 2)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 10""",

    "q_locf_fill" -> """
      WITH obs AS (SELECT l_returnflag AS flag,
                          CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                            AS BIGINT) AS dayn,
                          CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                   FROM lineitem GROUP BY 1, 2),
           sc AS (SELECT flag, unnest(generate_series(d0, d1)) AS dayn
                  FROM (SELECT flag, MIN(dayn) AS d0, MAX(dayn) AS d1 FROM obs GROUP BY 1)),
           f AS (SELECT sc.flag, sc.dayn, obs.rev,
                        last_value(obs.rev IGNORE NULLS) OVER (PARTITION BY sc.flag
                          ORDER BY sc.dayn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
                 FROM sc LEFT JOIN obs ON sc.flag = obs.flag AND sc.dayn = obs.dayn)
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN rev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
             CAST(SUM(filled) AS BIGINT) AS filled_total_cents
      FROM f GROUP BY 1 ORDER BY 1""",

    "q_acf_multi_lag" -> """
      WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1, 2),
           l AS (SELECT event_type, rev,
                        LAG(rev, 1) OVER w AS p1, LAG(rev, 2) OVER w AS p2,
                        LAG(rev, 3) OVER w AS p3, LAG(rev, 7) OVER w AS p7
                 FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           st AS (SELECT event_type, CAST(1 AS BIGINT) AS k, rev, p1 AS prev FROM l
                  UNION ALL SELECT event_type, 2, rev, p2 FROM l
                  UNION ALL SELECT event_type, 3, rev, p3 FROM l
                  UNION ALL SELECT event_type, 7, rev, p7 FROM l),
           s AS (SELECT event_type, k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                        CAST(SUM(prev) AS BIGINT) AS sx, CAST(SUM(rev) AS BIGINT) AS sy,
                        SUM(CAST(prev AS HUGEINT) * rev) AS sxy,
                        SUM(CAST(prev AS HUGEINT) * prev) AS sxx,
                        SUM(CAST(rev AS HUGEINT) * rev) AS syy
                 FROM st WHERE prev IS NOT NULL GROUP BY 1, 2)
      SELECT event_type, k, n_pairs,
             ROUND((CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / SQRT((CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 4) + 0 AS acf
      FROM s ORDER BY event_type, k""",

    "q_crossval_folds" -> """
      WITH a AS (SELECT lang, n_chars,
                        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                          % 5 AS fold
                 FROM documents),
           c AS (SELECT CAST(fold AS BIGINT) AS fold, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                 FROM a GROUP BY 1, 2),
           x AS (SELECT fold, lang, n_docs, sum_chars,
                        CAST(SUM(n_docs) OVER (PARTITION BY fold) AS BIGINT) AS fold_tot,
                        CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_tot,
                        CAST(SUM(n_docs) OVER () AS BIGINT) AS n
                 FROM c)
      SELECT fold, lang, n_docs, sum_chars,
             CAST(n_docs * 10000 // fold_tot AS BIGINT) AS fold_share_e4,
             CAST(lang_tot * 10000 // n AS BIGINT) AS corpus_share_e4
      FROM x ORDER BY fold, lang""",

    "q_hist2d" -> """
      SELECT CAST(q // 10 AS BIGINT) AS q_bin,
             CAST((pc // (CASE WHEN q = 0 THEN 1 ELSE q END)) // 2500 AS BIGINT) AS p_bin,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pc) AS BIGINT) AS rev_cents
      FROM (SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc
            FROM lineitem)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_silhouette_sample" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           s AS (SELECT vec_id AS sid, label AS slabel, qe AS s_qe FROM n WHERE vec_id < 20),
           d AS (SELECT sid, slabel, n.label AS olabel,
                        CAST(ROUND(SQRT(CAST(list_sum(list_transform(list_zip(n.qe, s_qe),
                               p -> (p[1]-p[2])*(p[1]-p[2]))) AS DOUBLE)) / 10.0) AS BIGINT) AS d_e6
                 FROM n CROSS JOIN s WHERE n.vec_id <> sid),
           g AS (SELECT sid, slabel, olabel, CAST(COUNT(*) AS BIGINT) AS cnt,
                        CAST(SUM(d_e6) AS BIGINT) AS sd
                 FROM d GROUP BY 1, 2, 3),
           m AS (SELECT sid, slabel, olabel, CAST(sd // cnt AS BIGINT) AS md FROM g),
           ab AS (SELECT sid, CAST(slabel AS BIGINT) AS slabel,
                         CAST(MAX(CASE WHEN olabel = slabel THEN md END) AS BIGINT) AS a_e6,
                         CAST(MIN(CASE WHEN olabel <> slabel THEN md END) AS BIGINT) AS b_e6
                  FROM m GROUP BY 1, 2)
      SELECT sid, slabel, a_e6, b_e6,
             ROUND(CAST(b_e6 - a_e6 AS DOUBLE) / CAST(GREATEST(a_e6, b_e6) AS DOUBLE), 6)
               + 0 AS s
      FROM ab ORDER BY sid""",

    "q_centroid_confusion" -> """
      WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           e AS (SELECT label AS clabel, i AS dim, qe[i] AS x
                 FROM n, (SELECT unnest(generate_series(1, 8)) AS i)),
           c AS (SELECT clabel, dim,
                        CAST(ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cv
                 FROM e GROUP BY 1, 2),
           ca AS (SELECT clabel, list(cv ORDER BY dim) AS c_qe FROM c GROUP BY 1),
           d AS (SELECT vec_id, label, clabel,
                        CAST(list_sum(list_transform(list_zip(qe, c_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM n CROSS JOIN ca),
           b AS (SELECT vec_id, label, clabel,
                        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
                 FROM d)
      SELECT label, clabel AS predicted, CAST(COUNT(*) AS BIGINT) AS n
      FROM b WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_mahalanobis_diag" -> """
      WITH dims AS (SELECT vec_id, CAST(label AS BIGINT) AS label, i AS dim,
                           CAST(ROUND(CAST(embedding[i] AS DOUBLE)*1e7) AS BIGINT) AS x
                    FROM embeddings, (SELECT unnest(generate_series(1, 8)) AS i)),
           st AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx
                  FROM dims GROUP BY 1),
           t AS (SELECT vec_id, label,
                        CAST(ROUND((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
                                   * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
                                   / ((CAST(sxx AS DOUBLE)
                                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
                                      / (CAST(n AS DOUBLE) - 1.0)) * 1e6) AS BIGINT) AS term_e6
                 FROM dims JOIN st USING (dim))
      SELECT vec_id, label, CAST(SUM(term_e6) AS BIGINT) AS d2_e6
      FROM t GROUP BY 1, 2 ORDER BY d2_e6 DESC, vec_id LIMIT 10""",

    "q_window_cume_dist" -> """
      SELECT c_mktsegment, c_custkey, bal_cents, pr, cd FROM (
        SELECT c_mktsegment, c_custkey,
               CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents,
               ROUND(PERCENT_RANK() OVER w, 6) + 0 AS pr,
               ROUND(CUME_DIST() OVER w, 6) + 0 AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT), c_custkey))
      WHERE c_custkey < 50 ORDER BY c_custkey""",

    "q_percentile_disc" -> """
      WITH b AS (SELECT l_returnflag AS flag,
                        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc
                 FROM lineitem),
           cont AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                           ROUND(quantile_cont(pc, 0.5), 4) + 0 AS p50_cont,
                           ROUND(quantile_cont(pc, 0.9), 4) + 0 AS p90_cont
                    FROM b GROUP BY 1),
           hist AS (SELECT flag, pc, CAST(COUNT(*) AS BIGINT) AS c
                    FROM b GROUP BY 1, 2),
           r AS (SELECT flag, pc,
                        SUM(c) OVER (PARTITION BY flag ORDER BY pc
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                        SUM(c) OVER (PARTITION BY flag) AS nn
                 FROM hist),
           disc AS (SELECT flag,
                           CAST(MIN(CASE WHEN cum*10 >= nn*5 THEN pc END) AS BIGINT)
                             AS p50_disc,
                           CAST(MIN(CASE WHEN cum*10 >= nn*9 THEN pc END) AS BIGINT)
                             AS p90_disc
                    FROM r GROUP BY 1)
      SELECT flag, n, p50_disc, p90_disc, p50_cont, p90_cont
      FROM cont JOIN disc USING (flag) ORDER BY flag""",

    "q_sla_days" -> """
      SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(days) * 10000 // COUNT(*) AS BIGINT) AS mean_days_e4,
             CAST(MAX(days) AS BIGINT) AS max_days,
             CAST(SUM(CASE WHEN days <= 30 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
               AS BIGINT) AS within30_e4
      FROM (SELECT o_orderpriority,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
                     AS BIGINT) AS days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      GROUP BY 1 ORDER BY 1""",

    "q_revenue_bridge" -> """
      WITH m AS (SELECT date_trunc('month', l_shipdate) AS month,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                 FROM lineitem GROUP BY 1),
           j AS (SELECT strftime(cur.month, '%Y-%m') AS month, prev.rev AS prev_rev,
                        cur.rev AS rev, prev.qty AS pqty, cur.qty AS qty,
                        CAST(cur.qty - prev.qty AS HUGEINT) * prev.rev * 10000 AS vnum
                 FROM m cur JOIN m prev ON cur.month = prev.month + INTERVAL 1 MONTH),
           v AS (SELECT month, prev_rev, rev, pqty, qty,
                        CAST(CASE WHEN vnum >= 0 THEN vnum // pqty
                                  ELSE -((-vnum) // pqty) END AS BIGINT) AS volume_effect_e4
                 FROM j)
      SELECT month, prev_rev, rev, pqty, qty, volume_effect_e4,
             CAST((rev - prev_rev) * 10000 - volume_effect_e4 AS BIGINT) AS price_effect_e4
      FROM v ORDER BY month""",

    "q_abc_class" -> """
      WITH pp AS (SELECT p_brand AS brand, l_partkey,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
           c AS (SELECT brand, rev,
                        SUM(rev) OVER (PARTITION BY brand ORDER BY rev DESC, l_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                        SUM(rev) OVER (PARTITION BY brand) AS tot
                 FROM pp),
           k AS (SELECT brand, rev,
                        CASE WHEN cum*5 <= tot*4 THEN 'A'
                             WHEN cum*20 <= tot*19 THEN 'B' ELSE 'C' END AS cls
                 FROM c)
      SELECT brand, cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(rev) AS BIGINT) AS rev_cents
      FROM k GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_weekday_lift" -> """
      WITH s AS (SELECT event_type,
                        CAST(SUM(CASE WHEN isodow(ts) < 6 THEN 1 ELSE 0 END) AS BIGINT) AS wd_n,
                        CAST(SUM(CASE WHEN isodow(ts) < 6
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END)
                          AS BIGINT) AS wd_cents,
                        CAST(SUM(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS we_n,
                        CAST(SUM(CASE WHEN isodow(ts) >= 6
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END)
                          AS BIGINT) AS we_cents
                 FROM events GROUP BY 1)
      SELECT event_type, wd_n, wd_cents, we_n, we_cents,
             CAST(CAST(we_cents AS HUGEINT) * wd_n * 10000
                  // (CAST(wd_cents AS HUGEINT) * we_n) AS BIGINT) AS lift_e4
      FROM s ORDER BY event_type""",

    "q_purchase_interval_median" -> """
      WITH g AS (SELECT user_id, (ts_usl - prev) // 3600000000 AS gap_h
                 FROM (SELECT user_id, epoch_us(ts) AS ts_usl,
                              LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events WHERE event_type = 'purchase')
                 WHERE prev IS NOT NULL),
           m AS (SELECT user_id, quantile_cont(gap_h, 0.5) AS med_h FROM g GROUP BY 1)
      SELECT CAST(FLOOR(med_h / 24.0) AS BIGINT) AS med_days_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM m GROUP BY 1 ORDER BY 1""",

    "q_watermark_lateness" -> """
      WITH l AS (SELECT (MAX(epoch_us(ts)) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - epoch_us(ts)) // 1000000 AS late_s
                 FROM events),
           b AS (SELECT CASE WHEN late_s = 0 THEN 0 WHEN late_s <= 60 THEN 1
                             WHEN late_s <= 300 THEN 2 WHEN late_s <= 1800 THEN 3
                             ELSE 4 END AS bucket
                 FROM l),
           c AS (SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n
                 FROM b GROUP BY 1)
      SELECT bucket, n, CAST(n * 10000 // SUM(n) OVER () AS BIGINT) AS share_e4
      FROM c ORDER BY bucket""",

    "q_ts_regularity" -> """
      WITH g AS (SELECT event_type, ts_usl - prev AS gap
                 FROM (SELECT event_type, epoch_us(ts) AS ts_usl,
                              LAG(epoch_us(ts)) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY epoch_us(ts), event_id) AS prev
                       FROM events)
                 WHERE prev IS NOT NULL),
           m AS (SELECT event_type, quantile_cont(gap, 0.5) AS med FROM g GROUP BY 1),
           r AS (SELECT g.event_type, med,
                        CASE WHEN CAST(gap AS DOUBLE) * 2.0 >= med
                              AND CAST(gap AS DOUBLE) <= med * 2.0
                             THEN 1 ELSE 0 END AS reg
                 FROM g JOIN m ON g.event_type = m.event_type)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             ROUND(MAX(med), 4) + 0 AS median_gap_us,
             CAST(SUM(reg) * 10000 // COUNT(*) AS BIGINT) AS regular_share_e4
      FROM r GROUP BY 1 ORDER BY 1""",

    "q_scd_snapshot" -> """
      WITH o AS (SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
                        CAST(year(o_orderdate) AS BIGINT) AS oy
                 FROM orders),
           y AS (SELECT unnest(generate_series(y0, y1)) AS y
                 FROM (SELECT MIN(oy) AS y0, MAX(oy) AS y1 FROM o)),
           j AS (SELECT o_custkey, o_orderstatus, y.y,
                        ROW_NUMBER() OVER (PARTITION BY o_custkey, y.y
                                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                 FROM o JOIN y ON o.oy <= y.y)
      SELECT y, o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM j WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_attribution_firsttouch" -> """
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_usl,
                        CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           w AS (SELECT event_type, vc,
                        FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS)
                          OVER (PARTITION BY user_id ORDER BY ts_usl, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
                 FROM e)
      SELECT COALESCE(channel, 'none') AS channel, CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(SUM(vc) AS BIGINT) AS revenue_cents
      FROM w WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""",

    "q_new_returning_revenue" -> """
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                        CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           f AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY 1),
           p AS (SELECT e.user_id, e.day, f.first_day, vc
                 FROM e JOIN f ON e.user_id = f.user_id
                 WHERE event_type = 'purchase')
      SELECT strftime(day, '%Y-%m-%d') AS day,
             CAST(SUM(CASE WHEN day = first_day THEN vc ELSE 0 END) AS BIGINT) AS new_cents,
             CAST(SUM(CASE WHEN day <> first_day THEN vc ELSE 0 END) AS BIGINT) AS ret_cents,
             CAST(COUNT(DISTINCT CASE WHEN day = first_day THEN user_id END) AS BIGINT)
               AS new_buyers,
             CAST(COUNT(DISTINCT CASE WHEN day <> first_day THEN user_id END) AS BIGINT)
               AS ret_buyers
      FROM p GROUP BY day ORDER BY day""",

    "q_label_propagation" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           votes AS (SELECT u AS node, v % 10 AS nlabel, CAST(COUNT(*) AS BIGINT) AS c
                     FROM ed GROUP BY 1, 2),
           r AS (SELECT node, nlabel,
                        ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, nlabel) AS rn
                 FROM votes)
      SELECT CAST(node % 10 AS BIGINT) AS old_label, CAST(nlabel AS BIGINT) AS new_label,
             CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM r WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_bfs_levels" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           s AS (SELECT MIN(u) AS node FROM ed),
           l1 AS (SELECT DISTINCT v AS node FROM ed JOIN s ON ed.u = s.node
                  WHERE v NOT IN (SELECT node FROM s)),
           l2 AS (SELECT DISTINCT v AS node FROM ed WHERE u IN (SELECT node FROM l1)
                  AND v NOT IN (SELECT node FROM s UNION ALL SELECT node FROM l1)),
           l3 AS (SELECT DISTINCT v AS node FROM ed WHERE u IN (SELECT node FROM l2)
                  AND v NOT IN (SELECT node FROM s UNION ALL SELECT node FROM l1
                                UNION ALL SELECT node FROM l2))
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(node) AS BIGINT) AS min_node, CAST(MAX(node) AS BIGINT) AS max_node
        FROM s
        UNION ALL SELECT 1, CAST(COUNT(*) AS BIGINT), MIN(node), MAX(node) FROM l1
        UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT), MIN(node), MAX(node) FROM l2
        UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT), MIN(node), MAX(node) FROM l3)
      ORDER BY level""",

    "q_blocking_stats" -> """
      WITH b AS (SELECT c_mktsegment, c_nationkey,
                        (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS band,
                        CAST(COUNT(*) AS BIGINT) AS s
                 FROM customer GROUP BY 1, 2, 3),
           a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks, CAST(SUM(s) AS BIGINT) AS n_rows,
                        CAST(MAX(s) AS BIGINT) AS max_block,
                        CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS cand_pairs
                 FROM b)
      SELECT n_rows, n_blocks, max_block, cand_pairs,
             CAST(n_rows * (n_rows - 1) // 2 AS BIGINT) AS total_pairs,
             CAST(cand_pairs * 1000000 // (n_rows * (n_rows - 1) // 2) AS BIGINT)
               AS cand_share_e6
      FROM a""",

    "q_grouping_id" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, flag, status""",

    "q_fk_integrity" -> """
      SELECT * FROM (
        SELECT 'customer->nation' AS relation, CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
          ON c_nationkey = n_nationkey
        UNION ALL
        SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
          ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
          ON l_partkey = p_partkey
        UNION ALL
        SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
          ON l_suppkey = s_suppkey
        UNION ALL
        SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o_custkey = c_custkey)
      ORDER BY relation""",

    "q_doc_top_tfidf" -> """
      WITH dt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                  FROM documents),
           df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
                  FROM (SELECT DISTINCT doc_id, word FROM dt) GROUP BY 1),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
           tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                  FROM dt WHERE doc_id < 20 GROUP BY 1, 2),
           s AS (SELECT doc_id, word, tf, df,
                        tf * CAST(ROUND(LN(CAST(n_docs AS DOUBLE)
                               / (CAST(df AS DOUBLE) + 1.0)) * 1e6) AS BIGINT) AS score_e6
                 FROM tf JOIN df USING (word), n),
           r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score_e6 DESC, word) AS rn
                 FROM s)
      SELECT doc_id, word, tf, df, score_e6 FROM r WHERE rn = 1 ORDER BY doc_id""",

    "q_query_likelihood" -> """
      WITH dt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                  FROM documents),
           dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM dt GROUP BY 1),
           c AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
           cf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cf FROM dt
                  WHERE word IN ('merge', 'vector', 'fast') GROUP BY 1),
           tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM dt
                  WHERE word IN ('merge', 'vector', 'fast') GROUP BY 1, 2),
           t AS (SELECT dl.doc_id,
                        CAST(ROUND(LN((CAST(COALESCE(tf.tf, 0) AS DOUBLE)
                                       + 2000.0 * CAST(cf.cf AS DOUBLE)
                                         / CAST(total_toks AS DOUBLE))
                                      / (CAST(dl.dl AS DOUBLE) + 2000.0)) * 1e6)
                          AS BIGINT) AS term_e6
                 FROM dl CROSS JOIN cf CROSS JOIN c
                 LEFT JOIN tf ON dl.doc_id = tf.doc_id AND cf.word = tf.word)
      SELECT doc_id, CAST(SUM(term_e6) AS BIGINT) AS score_e6
      FROM t GROUP BY 1 ORDER BY score_e6 DESC, doc_id LIMIT 10""",

    "q_char_trigram_profile" -> """
      WITH t AS (SELECT lang, substring(text, CAST(i AS INT), 3) AS g
                 FROM (SELECT lang, text, unnest(generate_series(1, length(text) - 2)) AS i
                       FROM documents WHERE n_chars >= 3)),
           c AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
           r AS (SELECT lang, g, n,
                        CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS tot,
                        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rk
                 FROM c)
      SELECT lang, CAST(rk AS BIGINT) AS rk, g AS trigram, n,
             CAST(n * 10000 // tot AS BIGINT) AS share_e4
      FROM r WHERE rk <= 20 ORDER BY lang, rk""",

    "q_theil_sen" -> """
      WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                          AS BIGINT) AS dayn,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                 FROM lineitem GROUP BY 1),
           p AS (SELECT CASE WHEN (b.rev - a.rev) >= 0
                             THEN (b.rev - a.rev) * 10000 // (b.dayn - a.dayn)
                             ELSE -((-(b.rev - a.rev)) * 10000 // (b.dayn - a.dayn))
                        END AS slope_e4
                 FROM d a JOIN d b ON b.dayn > a.dayn),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                        ROUND(quantile_cont(slope_e4, 0.5), 4) + 0 AS median_slope_e4
                 FROM p)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days, n_pairs, median_slope_e4
      FROM s""",

    "q_embedding_center_export" -> """
      WITH dims AS (SELECT vec_id, i - 1 AS dim,
                           CAST(ROUND(CAST(embedding[i] AS DOUBLE)*1e7) AS BIGINT) AS x
                    FROM embeddings, (SELECT unnest(generate_series(1, 8)) AS i)),
           mu AS (SELECT dim,
                         CAST(ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                           AS BIGINT) AS mu_e7
                  FROM dims GROUP BY 1)
      SELECT vec_id, CAST(dims.dim AS BIGINT) AS dim, x AS x_e7,
             CAST(x - mu_e7 AS BIGINT) AS centered_e7
      FROM dims JOIN mu ON dims.dim = mu.dim WHERE vec_id < 10 ORDER BY vec_id, dim""",

    "q_subsample_stability" -> """
      WITH x AS (SELECT doc_id, n_chars, unnest(generate_series(0, 9)) AS r FROM documents),
           f AS (SELECT r, n_chars FROM x
                 WHERE CAST('0x' || substring(md5(CAST(doc_id * 10 + r AS VARCHAR)), 1, 8)
                         AS BIGINT) % 2 = 0)
      SELECT CAST(r AS BIGINT) AS replica, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(n_chars) * 10000 // COUNT(*) AS BIGINT) AS mean_chars_e4
      FROM f GROUP BY 1 ORDER BY 1""",

    "q_subquery_exists" -> """
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_with_urgent
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_subquery_in" -> """
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem)) AS n_parts_sold,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM part
         WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)) AS n_parts_never_sold""",

    "q_window_nth_value" -> """
      WITH b AS (SELECT c_mktsegment, CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal, c_custkey
                 FROM customer),
           w AS (SELECT c_mktsegment,
                        FIRST_VALUE(bal) OVER win AS top_bal,
                        NTH_VALUE(bal, 2) OVER win AS second_bal,
                        LAST_VALUE(bal) OVER win AS bottom_bal
                 FROM b
                 WINDOW win AS (PARTITION BY c_mktsegment ORDER BY bal DESC, c_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(top_bal) AS BIGINT) AS top_bal,
             CAST(MAX(second_bal) AS BIGINT) AS second_bal,
             CAST(MAX(bottom_bal) AS BIGINT) AS bottom_bal
      FROM w GROUP BY 1 ORDER BY 1""",

    "q_agg_filter_clause" -> """
      SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
             CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                    FILTER (WHERE CAST(ROUND(l_discount*100) AS BIGINT) = 0), 0)
               AS BIGINT) AS rev_nodisc_cents
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_geometric_mean" -> """
      WITH l AS (SELECT l_returnflag AS flag,
                        CAST(ROUND(LN(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS DOUBLE))
                               * 1e6) AS BIGINT) AS lx
                 FROM lineitem),
           s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(lx) AS BIGINT) AS s
                 FROM l GROUP BY 1)
      SELECT flag, n, CAST(s // n AS BIGINT) AS mean_ln_e6,
             ROUND(EXP(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6) / 100.0, 4) + 0 AS geo_mean
      FROM s ORDER BY flag""",

    "q_harmonic_mean" -> """
      WITH l AS (SELECT l_returnflag AS flag,
                        CAST(ROUND(1e12 / CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                               AS DOUBLE)) AS BIGINT) AS r
                 FROM lineitem),
           s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS sr
                 FROM l GROUP BY 1)
      SELECT flag, n, sr AS sum_recip_e12,
             ROUND(CAST(n AS DOUBLE) * 1e12 / CAST(sr AS DOUBLE) / 100.0, 4) + 0 AS harm_mean
      FROM s ORDER BY flag""",

    "q_trimmed_mean" -> """
      WITH v AS (SELECT l_returnflag AS flag, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc
                 FROM lineitem),
           b AS (SELECT flag, quantile_cont(pc, 0.1) AS lo, quantile_cont(pc, 0.9) AS hi
                 FROM v GROUP BY 1),
           k AS (SELECT v.flag, pc FROM v JOIN b ON v.flag = b.flag
                 WHERE CAST(pc AS DOUBLE) >= lo AND CAST(pc AS DOUBLE) <= hi)
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_kept,
             ROUND(CAST(SUM(pc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 4) + 0
               AS trimmed_mean
      FROM k GROUP BY 1 ORDER BY 1""",

    "q_weighted_median" -> """
      WITH lat AS (SELECT l_returnflag AS flag, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc,
                          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
                   FROM lineitem GROUP BY 1, 2),
           c AS (SELECT flag, pc,
                        CAST(SUM(w) OVER (PARTITION BY flag ORDER BY pc) AS BIGINT) AS cum,
                        CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
                 FROM lat)
      SELECT flag, CAST(MAX(tot) AS BIGINT) AS total_weight,
             CAST(MIN(CASE WHEN cum * 2 >= tot THEN pc END) AS BIGINT) AS wmedian_cents
      FROM c GROUP BY 1 ORDER BY 1""",

    "q_stats_merge_audit" -> """
      WITH raw AS (SELECT date_trunc('day', o_orderdate) AS day,
                          CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp
                   FROM orders),
           p AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(tp) AS BIGINT) AS s,
                        SUM(CAST(tp AS HUGEINT) * tp) AS ss
                 FROM raw GROUP BY 1),
           m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions, CAST(SUM(n) AS BIGINT) AS n,
                        CAST(SUM(s) AS BIGINT) AS s, SUM(ss) AS ss
                 FROM p),
           d AS (SELECT CAST(COUNT(*) AS BIGINT) AS dn, CAST(SUM(tp) AS BIGINT) AS dsum,
                        SUM(CAST(tp AS HUGEINT) * tp) AS dss
                 FROM raw)
      SELECT n_partitions, n,
             ROUND(CAST(s AS DOUBLE)/CAST(n AS DOUBLE), 4) + 0 AS merged_mean,
             ROUND((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0), 4) + 0 AS merged_var,
             ROUND(CAST(dsum AS DOUBLE)/CAST(dn AS DOUBLE), 4) + 0 AS direct_mean,
             ROUND((CAST(dss AS DOUBLE)
                    - CAST(dsum AS DOUBLE)*CAST(dsum AS DOUBLE)/CAST(dn AS DOUBLE))
                   / (CAST(dn AS DOUBLE) - 1.0), 4) + 0 AS direct_var
      FROM m, d""",

    "q_elbow_inertia" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           s AS (SELECT vec_id AS sid, qe AS s_qe FROM n WHERE vec_id < 4),
           d AS (SELECT n.vec_id, sid,
                        CAST(list_sum(list_transform(list_zip(n.qe, s_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM n CROSS JOIN s),
           k AS (SELECT unnest([1, 2, 3, 4]) AS k),
           b AS (SELECT k.k, d.vec_id, MIN(d2) AS best FROM d JOIN k ON d.sid < k.k
                 GROUP BY 1, 2)
      SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(best // 1000000) AS BIGINT) AS inertia_e8
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_learning_curve" -> """
      WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y,
                        CAST('0x' || substring(md5(
                          CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
                          || '_' || CAST(l_partkey AS VARCHAR) || '_'
                          || CAST(l_suppkey AS VARCHAR) || '_' || CAST(l_quantity AS VARCHAR)),
                          1, 8) AS BIGINT) % 100 AS bucket
                 FROM lineitem),
           f AS (SELECT x, y, p FROM r
                 CROSS JOIN (SELECT unnest([10, 20, 40, 80, 100]) AS p)
                 WHERE bucket < p),
           s AS (SELECT CAST(p AS BIGINT) AS pct, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM f GROUP BY 1)
      SELECT pct, n,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 4) + 0 AS slope,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 4) + 0 AS r2
      FROM s ORDER BY pct""",

    "q_permutation_test" -> """
      WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s
                  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           reps AS (SELECT user_id, n, s, r,
                           CASE WHEN r = -1 THEN user_id % 2
                                ELSE CAST('0x' || substring(md5(
                                       CAST(user_id * 16 + r AS VARCHAR)), 1, 8) AS BIGINT) % 2
                           END AS cohort
                    FROM pu CROSS JOIN (SELECT unnest(generate_series(-1, 9)) AS r)),
           a AS (SELECT CAST(r AS BIGINT) AS replica,
                        CAST(SUM(CASE WHEN cohort = 0 THEN s ELSE 0 END) AS BIGINT) AS s0,
                        CAST(SUM(CASE WHEN cohort = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
                        CAST(SUM(CASE WHEN cohort = 1 THEN s ELSE 0 END) AS BIGINT) AS s1,
                        CAST(SUM(CASE WHEN cohort = 1 THEN n ELSE 0 END) AS BIGINT) AS n1
                 FROM reps GROUP BY 1)
      SELECT replica, n0, n1,
             ROUND(CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE)
                   - CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE), 4) + 0 AS mean_diff_cents
      FROM a ORDER BY replica""",

    "q_anova_posthoc" -> """
      WITH g AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS s,
                        SUM(CAST(CAST(ROUND(l_extendedprice*100) AS BIGINT) AS HUGEINT)
                            * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS ss
                 FROM lineitem GROUP BY 1)
      SELECT a.flag AS flag1, b.flag AS flag2, a.n AS n1, b.n AS n2,
             ROUND((CAST(a.s AS DOUBLE)/CAST(a.n AS DOUBLE)
                    - CAST(b.s AS DOUBLE)/CAST(b.n AS DOUBLE))
                   / SQRT(((CAST(a.ss AS DOUBLE)
                            - CAST(a.s AS DOUBLE)*CAST(a.s AS DOUBLE)/CAST(a.n AS DOUBLE))
                           / (CAST(a.n AS DOUBLE)-1.0)) / CAST(a.n AS DOUBLE)
                          + ((CAST(b.ss AS DOUBLE)
                              - CAST(b.s AS DOUBLE)*CAST(b.s AS DOUBLE)/CAST(b.n AS DOUBLE))
                             / (CAST(b.n AS DOUBLE)-1.0)) / CAST(b.n AS DOUBLE)), 4) + 0 AS z
      FROM g a JOIN g b ON a.flag < b.flag ORDER BY flag1, flag2""",

    "q_session_entropy" -> """
      WITH cells AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
           t AS (SELECT user_id, c,
                        CAST(ROUND(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)) * 1e4) AS BIGINT)
                          AS clc
                 FROM cells),
           u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(clc) AS BIGINT) AS sclc
                 FROM t GROUP BY 1),
           h AS (SELECT CAST(ROUND((LN(CAST(n AS DOUBLE))
                          - CAST(sclc AS DOUBLE) / 1e4 / CAST(n AS DOUBLE)) * 1e4) AS BIGINT)
                          AS h_e4
                 FROM u)
      SELECT CAST(GREATEST(h_e4, 0) // 2500 AS BIGINT) AS bucket_qnat,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM h GROUP BY 1 ORDER BY 1""",

    "q_budget_variance" -> """
      WITH actual AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
                             CAST(month(l_shipdate) AS BIGINT) AS mo,
                             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                      FROM lineitem GROUP BY 1, 2),
           yearly AS (SELECT yr, CAST(SUM(rev) AS BIGINT) AS ytot FROM actual GROUP BY 1),
           sc AS (SELECT yr, ytot, unnest(generate_series(1, 12)) AS mo FROM yearly)
      SELECT sc.yr AS yr, CAST(sc.mo AS BIGINT) AS mo,
             CAST(COALESCE(rev, 0) AS BIGINT) AS actual_cents,
             CAST(ytot // 12 AS BIGINT) AS budget_floor_cents,
             CAST(COALESCE(rev, 0) * 12 - ytot AS BIGINT) AS variance_x12
      FROM sc LEFT JOIN actual ON sc.yr = actual.yr AND sc.mo = actual.mo
      ORDER BY 1, 2""",

    "q_orders_in_flight" -> """
      WITH spans AS (SELECT l.endd, o.startd
                     FROM (SELECT l_orderkey,
                                  CAST(MAX(date_diff('day', DATE '1970-01-01',
                                        CAST(l_shipdate AS DATE))) AS BIGINT) AS endd
                           FROM lineitem GROUP BY 1) l
                     JOIN (SELECT o_orderkey,
                                  CAST(date_diff('day', DATE '1970-01-01',
                                        CAST(o_orderdate AS DATE)) AS BIGINT) AS startd
                           FROM orders) o
                       ON l.l_orderkey = o.o_orderkey),
           deltas AS (SELECT dayn, CAST(SUM(d) AS BIGINT) AS delta FROM (
                        SELECT startd AS dayn, 1 AS d FROM spans
                        UNION ALL SELECT endd + 1, -1 FROM spans)
                      GROUP BY 1),
           c AS (SELECT dayn, CAST(SUM(delta) OVER (ORDER BY dayn) AS BIGINT) AS inflight
                 FROM deltas),
           m AS (SELECT strftime(DATE '1970-01-01' + CAST(dayn AS INT), '%Y-%m') AS month,
                        dayn, inflight
                 FROM c)
      SELECT month, CAST(MAX(inflight) AS BIGINT) AS peak_in_flight,
             CAST(MAX(CASE WHEN rn = 1 THEN inflight END) AS BIGINT) AS eom_in_flight
      FROM (SELECT month, inflight,
                   ROW_NUMBER() OVER (PARTITION BY month ORDER BY dayn DESC) AS rn
            FROM m)
      GROUP BY 1 ORDER BY 1""",

    "q_event_cooccur_lift" -> """
      WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
           t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu FROM ut GROUP BY 1),
           nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nn FROM ut),
           p AS (SELECT a.event_type AS t1, b.event_type AS t2,
                        CAST(COUNT(*) AS BIGINT) AS n_both
                 FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
                 GROUP BY 1, 2)
      SELECT t1, t2, n_both, x.nu AS n1, y.nu AS n2,
             CAST(CAST(n_both AS HUGEINT) * nn * 10000
                  // (CAST(x.nu AS HUGEINT) * y.nu) AS BIGINT) AS lift_e4
      FROM p JOIN t x ON p.t1 = x.event_type JOIN t y ON p.t2 = y.event_type CROSS JOIN nu
      ORDER BY t1, t2""",

    "q_basket_value_corr" -> """
      WITH o AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS y
                 FROM lineitem GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
                        CAST(SUM(x*x) AS BIGINT) AS sxx,
                        SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM o)
      SELECT n AS n_orders,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) + 0 AS corr
      FROM s""",

    "q_pipeline_funnel" -> """
      WITH rep AS (SELECT doc_id,
                          CASE WHEN MAX(c) * 1000000 // SUM(c) < 200000 THEN TRUE
                               ELSE FALSE END AS rep_ok
                   FROM (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
                         FROM (SELECT doc_id, word AS w1,
                                      LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                               FROM (SELECT doc_id,
                                            unnest(string_split(lower(text), ' ')) AS word,
                                            generate_subscripts(string_split(lower(text), ' '), 1)
                                              AS pos
                                     FROM documents))
                         WHERE w2 IS NOT NULL GROUP BY 1, 2, 3)
                   GROUP BY doc_id),
           flags AS (SELECT d.doc_id, n_chars,
                            (n_chars >= 100 AND n_chars <= 5000) AS len_ok,
                            (len(string_split(lower(text), ' ')) >= 20) AS tok_ok,
                            COALESCE(rep_ok, FALSE) AS rep_ok,
                            (ROW_NUMBER() OVER (PARTITION BY text ORDER BY d.doc_id) = 1)
                              AS first_of_text
                     FROM documents d LEFT JOIN rep ON d.doc_id = rep.doc_id)
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS gate, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM flags
        UNION ALL SELECT 1, 'length', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
                  FROM flags WHERE len_ok
        UNION ALL SELECT 2, 'tokens', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
                  FROM flags WHERE len_ok AND tok_ok
        UNION ALL SELECT 3, 'repetition', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
                  FROM flags WHERE len_ok AND tok_ok AND rep_ok
        UNION ALL SELECT 4, 'exact_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT)
                  FROM flags WHERE len_ok AND tok_ok AND rep_ok AND first_of_text)
      ORDER BY stage""",

    "q_vocab_jaccard_langs" -> """
      WITH v AS (SELECT DISTINCT lang, word
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)),
           s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS v FROM v GROUP BY 1),
           p AS (SELECT a.lang AS lang1, b.lang AS lang2, CAST(COUNT(*) AS BIGINT) AS n_inter
                 FROM v a JOIN v b ON a.word = b.word AND a.lang < b.lang
                 GROUP BY 1, 2)
      SELECT lang1, lang2, x.v AS v1, y.v AS v2, n_inter,
             CAST(n_inter * 1000000 // (x.v + y.v - n_inter) AS BIGINT) AS jaccard_e6
      FROM p JOIN s x ON lang1 = x.lang JOIN s y ON lang2 = y.lang
      ORDER BY lang1, lang2""",

    "q_rising_terms" -> """
      WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
           th AS (SELECT word, CASE WHEN doc_id * 2 >= nn THEN 1 ELSE 0 END AS half
                  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                        FROM documents), n),
           tot AS (SELECT CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
                          CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
                   FROM th),
           w AS (SELECT word,
                        CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                        CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
                 FROM th GROUP BY 1)
      SELECT word, c0, c1,
             CAST(c1 * 1000000000 // t1 - c0 * 1000000000 // t0 AS BIGINT) AS share_delta_e9
      FROM w, tot ORDER BY share_delta_e9 DESC, word LIMIT 10""",

    "q_burstiness" -> """
      WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
           s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                        CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c*c) AS BIGINT) AS scc
                 FROM d GROUP BY 1)
      SELECT event_type, n_days,
             ROUND(CAST(sc AS DOUBLE)/CAST(n_days AS DOUBLE), 4) + 0 AS mean_daily,
             ROUND(((CAST(scc AS DOUBLE)
                     - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE)/CAST(n_days AS DOUBLE))
                    / (CAST(n_days AS DOUBLE) - 1.0))
                   / (CAST(sc AS DOUBLE)/CAST(n_days AS DOUBLE)), 4) + 0 AS fano
      FROM s ORDER BY event_type""",

    "q_price_consistency" -> """
      WITH u AS (SELECT l_partkey,
                        (CAST(ROUND(l_extendedprice*100) AS BIGINT) * 100)
                          // CAST(l_quantity AS BIGINT) AS unit_e4,
                        CAST(COUNT(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY 1, 2),
           p AS (SELECT l_partkey, CAST(SUM(c) AS BIGINT) AS n_lines,
                        CAST(COUNT(*) AS BIGINT) AS n_price_points,
                        CAST(MIN(unit_e4) AS BIGINT) AS min_unit_e4,
                        CAST(MAX(unit_e4) AS BIGINT) AS max_unit_e4
                 FROM u GROUP BY 1)
      SELECT l_partkey, n_lines, n_price_points, min_unit_e4, max_unit_e4,
             CAST(max_unit_e4 - min_unit_e4 AS BIGINT) AS span_e4
      FROM p ORDER BY span_e4 DESC, l_partkey LIMIT 10""",

    "q_zscore_export" -> """
      WITH r AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                        l_returnflag AS flag, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc
                 FROM lineitem),
           s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pc) AS BIGINT) AS s,
                        SUM(CAST(pc AS HUGEINT) * pc) AS ss
                 FROM r GROUP BY 1)
      SELECT l_orderkey, l_linenumber, r.flag, pc,
             ROUND((CAST(pc AS DOUBLE) - CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))
                   / SQRT((CAST(ss AS DOUBLE)
                           - CAST(s.s AS DOUBLE)*CAST(s.s AS DOUBLE)/CAST(s.n AS DOUBLE))
                          / (CAST(s.n AS DOUBLE) - 1.0)), 6) + 0 AS z
      FROM r JOIN s ON r.flag = s.flag WHERE l_orderkey < 20
      ORDER BY l_orderkey, l_linenumber, pc""",

    "q_funnel_latency" -> """
      WITH fv AS (SELECT user_id, MIN(epoch_us(ts)) AS v_usl FROM events
                  WHERE event_type = 'view' GROUP BY 1),
           conv AS (SELECT e.user_id, fv.v_usl, MIN(epoch_us(ts)) AS p_usl
                    FROM events e JOIN fv ON e.user_id = fv.user_id
                    WHERE event_type = 'purchase' AND epoch_us(ts) >= v_usl
                    GROUP BY 1, 2)
      SELECT CAST((p_usl - v_usl) // 86400000000 AS BIGINT) AS days_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM conv GROUP BY 1 ORDER BY 1""",

    "q_rule_confidence" -> """
      WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
           nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM lineitem),
           isup AS (SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS sup
                    FROM items GROUP BY 1),
           pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                            CAST(COUNT(*) AS BIGINT) AS sup_ab
                     FROM items a JOIN items b
                       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT p1, p2, sup_ab, x.sup AS sup_a, y.sup AS sup_b,
             CAST(sup_ab * 10000 // x.sup AS BIGINT) AS conf_ab_e4,
             CAST(sup_ab * 10000 // y.sup AS BIGINT) AS conf_ba_e4,
             CAST(CAST(sup_ab AS HUGEINT) * nb * 10000
                  // (CAST(x.sup AS HUGEINT) * y.sup) AS BIGINT) AS lift_e4
      FROM pairs JOIN isup x ON p1 = x.item JOIN isup y ON p2 = y.item CROSS JOIN nb
      ORDER BY sup_ab DESC, p1, p2 LIMIT 10""",

    "q_dup_transaction_audit" -> """
      WITH g AS (SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp, o_orderdate,
                        CAST(COUNT(*) AS BIGINT) AS sz
                 FROM orders GROUP BY 1, 2, 3)
      SELECT sz AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(sz) AS BIGINT) AS n_orders
      FROM g GROUP BY 1 ORDER BY 1""",

    "q_forecast_backtest" -> """
      WITH w AS (SELECT l_returnflag AS flag, date_trunc('week', l_shipdate) AS wk,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                 FROM lineitem GROUP BY 1, 2),
           l AS (SELECT flag, rev, LAG(rev) OVER (PARTITION BY flag ORDER BY wk) AS pred
                 FROM w),
           a AS (SELECT flag, CAST(ABS(rev - pred) * 10000 // rev AS BIGINT) AS ape
                 FROM l WHERE pred IS NOT NULL)
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_weeks,
             CAST(SUM(ape) // COUNT(*) AS BIGINT) AS mape_e4
      FROM a GROUP BY 1 ORDER BY 1""",

    "q_refund_rate_trend" -> """
      WITH m AS (SELECT date_trunc('month', l_shipdate) AS month, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
                 FROM lineitem GROUP BY 1),
           r AS (SELECT month, n, n_r, CAST(n_r * 10000 // n AS BIGINT) AS rate_e4 FROM m)
      SELECT strftime(cur.month, '%Y-%m') AS month, cur.n, cur.n_r, cur.rate_e4,
             CAST(cur.rate_e4 - prev.rate_e4 AS BIGINT) AS delta_e4
      FROM r cur LEFT JOIN r prev ON cur.month = prev.month + INTERVAL 1 MONTH
      ORDER BY 1""",

    "q_emb_dim_corr" -> """
      WITH dims AS (SELECT vec_id, i - 1 AS dim,
                           CAST(ROUND(CAST(embedding[i] AS DOUBLE)*1e7) AS BIGINT) AS x
                    FROM embeddings, (SELECT unnest(generate_series(1, 4)) AS i)),
           st AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx
                  FROM dims GROUP BY 1),
           cr AS (SELECT a.dim AS i, b.dim AS j, SUM(CAST(a.x AS HUGEINT) * b.x) AS sxy
                  FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.dim < b.dim
                  GROUP BY 1, 2)
      SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
             ROUND((CAST(x.n AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(x.sx AS DOUBLE)*CAST(y.sx AS DOUBLE))
                   / SQRT((CAST(x.n AS DOUBLE)*CAST(x.sxx AS DOUBLE)
                           - CAST(x.sx AS DOUBLE)*CAST(x.sx AS DOUBLE))
                        * (CAST(x.n AS DOUBLE)*CAST(y.sxx AS DOUBLE)
                           - CAST(y.sx AS DOUBLE)*CAST(y.sx AS DOUBLE))), 6) + 0 AS corr
      FROM cr JOIN st x ON cr.i = x.dim JOIN st y ON cr.j = y.dim
      ORDER BY i, j""",

    "q_lang_length_ratio" -> """
      WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1),
           en AS (SELECT n_docs AS en_n, chars AS en_chars FROM s WHERE lang = 'en')
      SELECT lang, n_docs, chars, CAST(chars * 10000 // n_docs AS BIGINT) AS mean_chars_e4,
             CAST(CAST(chars AS HUGEINT) * en_n * 10000
                  // (CAST(n_docs AS HUGEINT) * en_chars) AS BIGINT) AS ratio_vs_en_e4
      FROM s, en ORDER BY lang""",

    "q_first_ship_latency_hist" -> """
      WITH l AS (SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
           d AS (SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                CAST(first_ship AS DATE)) AS BIGINT) AS days
                 FROM l JOIN orders ON l_orderkey = o_orderkey),
           h AS (SELECT days // 7 AS week_bucket, CAST(COUNT(*) AS BIGINT) AS n_orders
                 FROM d GROUP BY 1)
      SELECT CAST(week_bucket AS BIGINT) AS week_bucket, n_orders,
             CAST(n_orders * 10000 // SUM(n_orders) OVER () AS BIGINT) AS share_e4
      FROM h ORDER BY 1""",

    "q_medoid_sample" -> """
      WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE vec_id < 50),
           d AS (SELECT a.vec_id, a.label,
                        CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) // 1000000 AS d2e8
                 FROM n a JOIN n b ON a.vec_id <> b.vec_id)
      SELECT vec_id, label, CAST(SUM(d2e8) AS BIGINT) AS total_d2_e8
      FROM d GROUP BY 1, 2 ORDER BY total_d2_e8 ASC, vec_id LIMIT 3""",

    "q_segment_index" -> """
      WITH seg AS (SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
                          CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
           t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS tn, CAST(SUM(rev) AS BIGINT) AS tr
                 FROM seg)
      SELECT segment, n_orders, rev AS rev_cents,
             CAST(rev * 10000 // tr AS BIGINT) AS rev_share_e4,
             CAST(CAST(rev AS HUGEINT) * tn * 10000
                  // (CAST(n_orders AS HUGEINT) * tr) AS BIGINT) AS aov_index_e4
      FROM seg, t ORDER BY segment""",

    "q_triplet_mining" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           a AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlabel, qe AS q_qe
                 FROM n WHERE vec_id < 10),
           c AS (SELECT vec_id, label, qe FROM n WHERE vec_id >= 10),
           d AS (SELECT qid, qlabel, c.vec_id, c.label,
                        CAST(list_sum(list_transform(list_zip(c.qe, q_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM c CROSS JOIN a),
           hp AS (SELECT qid, qlabel, vec_id, d2,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2 DESC, vec_id) AS rn
                  FROM d WHERE label = qlabel),
           hn AS (SELECT qid, vec_id, d2,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2 ASC, vec_id) AS rn
                  FROM d WHERE label <> qlabel)
      SELECT hp.qid, hp.qlabel, hp.vec_id AS hard_pos_vec, hp.d2 AS hard_pos_d2,
             hn.vec_id AS hard_neg_vec, hn.d2 AS hard_neg_d2,
             CAST(hp.d2 - hn.d2 AS BIGINT) AS violation_margin
      FROM hp JOIN hn ON hp.qid = hn.qid
      WHERE hp.rn = 1 AND hn.rn = 1 ORDER BY hp.qid""",

    "q_margin_sampling" -> """
      WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           e AS (SELECT label AS clabel, i AS dim, qe[i] AS x
                 FROM n, (SELECT unnest(generate_series(1, 8)) AS i)),
           c AS (SELECT clabel, dim,
                        CAST(ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cv
                 FROM e GROUP BY 1, 2),
           ca AS (SELECT clabel, list(cv ORDER BY dim) AS c_qe FROM c GROUP BY 1),
           d AS (SELECT vec_id, label, clabel,
                        CAST(list_sum(list_transform(list_zip(qe, c_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM n CROSS JOIN ca),
           r AS (SELECT vec_id, label, clabel, d2,
                        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
                 FROM d)
      SELECT vec_id, label,
             CAST(MIN(CASE WHEN rn = 1 THEN clabel END) AS BIGINT) AS pred,
             CAST(MIN(CASE WHEN rn = 2 THEN d2 END)
                  - MIN(CASE WHEN rn = 1 THEN d2 END) AS BIGINT) AS margin
      FROM r WHERE rn <= 2 GROUP BY 1, 2 ORDER BY margin ASC, vec_id LIMIT 10""",

    "q_knn_weighted" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           queries AS (SELECT vec_id AS qid, label AS true_label, qe AS q_qe
                       FROM n WHERE vec_id < 10),
           train AS (SELECT vec_id AS tid, label AS t_label, qe AS t_qe
                     FROM n WHERE vec_id >= 10),
           d AS (SELECT qid, true_label, tid, t_label,
                        CAST(list_sum(list_transform(list_zip(q_qe, t_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                 FROM queries, train),
           nn5 AS (SELECT * FROM (SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, tid) AS rn FROM d)
                   WHERE rn <= 5),
           votes AS (SELECT qid, true_label, t_label,
                            CAST(SUM(1000000000000000000 // (d2 + 1)) AS BIGINT) AS wsum
                     FROM nn5 GROUP BY 1, 2, 3)
      SELECT qid, CAST(t_label AS BIGINT) AS predicted,
             CAST(true_label AS BIGINT) AS actual, wsum
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY wsum DESC, t_label) AS vr
            FROM votes)
      WHERE vr = 1 ORDER BY qid""",

    "q_ann_recall_eval" -> """
      WITH m AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           n AS (SELECT vec_id, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM m),
           seeds AS (SELECT vec_id AS cell, qe AS seed_qe FROM n WHERE vec_id <= 9),
           ad AS (SELECT vec_id, cell,
                         CAST(list_sum(list_transform(list_zip(qe, seed_qe),
                              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                  FROM n, seeds),
           assigned AS (SELECT vec_id, cell FROM
                          (SELECT vec_id, cell,
                                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
                           FROM ad)
                        WHERE rn = 1),
           aa AS (SELECT n.vec_id, assigned.cell, n.qe, n.nrm
                  FROM n JOIN assigned ON n.vec_id = assigned.vec_id),
           queries AS (SELECT vec_id AS qid, cell, qe AS q_qe, nrm AS q_nrm
                       FROM aa WHERE vec_id BETWEEN 10 AND 14),
           ivf AS (SELECT qid, vec_id FROM (
                     SELECT q.qid, a.vec_id,
                            ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                              ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, q.q_qe),
                                    p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                                / SQRT(CAST(a.nrm AS DOUBLE) * CAST(q.q_nrm AS DOUBLE)), 4) DESC,
                              a.vec_id) AS rnk
                     FROM aa a JOIN queries q ON a.cell = q.cell AND a.vec_id != q.qid)
                   WHERE rnk <= 5),
           exact AS (SELECT qid, vec_id FROM (
                       SELECT q.qid, a.vec_id,
                              ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                                ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, q.q_qe),
                                      p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                                  / SQRT(CAST(a.nrm AS DOUBLE) * CAST(q.q_nrm AS DOUBLE)), 4) DESC,
                                a.vec_id) AS rnk
                       FROM n a CROSS JOIN queries q
                       WHERE a.vec_id != q.qid)
                     WHERE rnk <= 5)
      SELECT exact.qid, CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(SUM(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             CAST(SUM(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 10000
                  // COUNT(*) AS BIGINT) AS recall_e4
      FROM exact LEFT JOIN ivf ON exact.qid = ivf.qid AND exact.vec_id = ivf.vec_id
      GROUP BY 1 ORDER BY 1""",

    "q_share_matrix" -> """
      WITH b AS (SELECT l_returnflag AS flag, l_linestatus AS status,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                 FROM lineitem GROUP BY 1, 2),
           x AS (SELECT flag, status, rev,
                        CAST(SUM(rev) OVER (PARTITION BY flag) AS BIGINT) AS rowt,
                        CAST(SUM(rev) OVER (PARTITION BY status) AS BIGINT) AS colt,
                        CAST(SUM(rev) OVER () AS BIGINT) AS tot
                 FROM b)
      SELECT flag, status, rev AS rev_cents,
             CAST(rev * 10000 // rowt AS BIGINT) AS row_share_e4,
             CAST(rev * 10000 // colt AS BIGINT) AS col_share_e4,
             CAST(rev * 10000 // tot AS BIGINT) AS total_share_e4
      FROM x ORDER BY 1, 2""",

    "q_rowvalue_in" -> """
      SELECT l_returnflag AS flag, l_linestatus AS status, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
      WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('R', 'F'), ('N', 'O'))
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_lateral_topn" -> """
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(top_cents) AS BIGINT) AS sum_top_cents
      FROM (SELECT c_mktsegment,
                   (SELECT MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) FROM orders o
                    WHERE o.o_custkey = c.c_custkey) AS top_cents
            FROM customer c)
      WHERE top_cents IS NOT NULL GROUP BY 1 ORDER BY 1""",

    "q_window_rollup_audit" -> """
      WITH ev AS (SELECT event_type, epoch_us(ts) // 900000000 AS q15 FROM events),
           q AS (SELECT event_type, q15, CAST(COUNT(*) AS BIGINT) AS n15
                 FROM ev GROUP BY 1, 2),
           r AS (SELECT event_type, q15 // 4 AS hr, CAST(SUM(n15) AS BIGINT) AS n_rolled
                 FROM q GROUP BY 1, 2),
           d AS (SELECT event_type, q15 // 4 AS hr, CAST(COUNT(*) AS BIGINT) AS n_direct
                 FROM ev GROUP BY 1, 2)
      SELECT r.event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n_rolled) AS BIGINT) AS total_rolled,
             CAST(SUM(n_direct) AS BIGINT) AS total_direct,
             CAST(SUM(CASE WHEN n_rolled <> n_direct THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatch
      FROM r JOIN d ON r.event_type = d.event_type AND r.hr = d.hr
      GROUP BY 1 ORDER BY 1""",

    "q_onehot_export" -> """
      SELECT c_custkey,
             CAST(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS BIGINT) AS seg_automobile,
             CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS BIGINT) AS seg_building,
             CAST(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END AS BIGINT) AS seg_furniture,
             CAST(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END AS BIGINT) AS seg_household,
             CAST(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS BIGINT) AS seg_machinery
      FROM customer WHERE c_custkey < 10 ORDER BY c_custkey""",

    "q_fiscal_calendar" -> """
      SELECT CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 7 THEN 1 ELSE 0 END
               AS BIGINT) AS fy,
             CAST((month(o_orderdate) + 5) % 12 // 3 + 1 AS BIGINT) AS fq,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_ngram_autocomplete" -> """
      WITH bg AS (SELECT word AS w1, LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word,
                               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                        FROM documents)),
           c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg
                 WHERE w2 IS NOT NULL AND w1 IN ('fast', 'table', 'data', 'key', 'row')
                 GROUP BY 1, 2),
           r AS (SELECT w1, w2, c, ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rk
                 FROM c)
      SELECT w1 AS prefix, CAST(rk AS BIGINT) AS rk, w2 AS suggestion, c
      FROM r WHERE rk <= 3 ORDER BY prefix, rk""",

    "q_spell_candidates" -> """
      WITH v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
                 GROUP BY 1),
           p AS (SELECT probe, word AS candidate, c,
                        CAST(levenshtein(word, probe) AS BIGINT) AS dist
                 FROM v CROSS JOIN (SELECT unnest(['tble', 'qery', 'windw']) AS probe)
                 WHERE levenshtein(word, probe) <= 1),
           r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe ORDER BY c DESC, candidate)
                          AS rk
                 FROM p)
      SELECT probe, CAST(rk AS BIGINT) AS rk, candidate, dist, c
      FROM r WHERE rk <= 3 ORDER BY probe, rk""",

    "q_stopword_discovery" -> """
      WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
           df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
                  FROM (SELECT DISTINCT doc_id, word
                        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                              FROM documents))
                  GROUP BY 1)
      SELECT word, df, CAST(df * 10000 // nn AS BIGINT) AS df_ratio_e4
      FROM df, n WHERE df * 10000 // nn >= 7500
      ORDER BY df_ratio_e4 DESC, word""",

    "q_error_alert_hours" -> """
      WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_err
                 FROM events GROUP BY 1),
           r AS (SELECT hr, CAST(n_err * 10000 // n AS BIGINT) AS rate_e4 FROM h),
           g AS (SELECT CAST(SUM(n_err) * 10000 // SUM(n) AS BIGINT) AS global_e4 FROM h)
      SELECT strftime(DATE '1970-01-01' + CAST(hr // 24 AS INT), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(CASE WHEN rate_e4 * 10 > global_e4 * 12 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alert_hours
      FROM r, g GROUP BY 1 ORDER BY 1""",

    "q_capacity_p95" -> """
      WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                        CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(MAX(c) AS BIGINT) AS max_hourly,
             ROUND(quantile_cont(c, 0.95), 4) + 0 AS p95_hourly,
             CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_hourly_floor
      FROM h GROUP BY 1 ORDER BY 1""",

    "q_data_freshness" -> """
      WITH a AS (
        SELECT 'orders' AS table_name,
               CAST(MAX(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
                 AS BIGINT) AS max_dayn
        FROM orders
        UNION ALL
        SELECT 'lineitem',
               CAST(MAX(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)))
                 AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'events', CAST(MAX(epoch_us(ts) // 86400000000) AS BIGINT) FROM events)
      SELECT table_name, max_dayn,
             CAST((SELECT MAX(max_dayn) FROM a) - max_dayn AS BIGINT) AS staleness_days
      FROM a ORDER BY table_name""",

    "q_join_skew_profile" -> """
      WITH m AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS m FROM lineitem GROUP BY 1),
           h AS (SELECT m AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_keys FROM m GROUP BY 1),
           t AS (SELECT CAST(SUM(multiplicity * n_keys) AS BIGINT) AS tr FROM h)
      SELECT multiplicity, n_keys, CAST(multiplicity * n_keys AS BIGINT) AS n_rows,
             CAST(multiplicity * n_keys * 10000 // tr AS BIGINT) AS row_share_e4
      FROM h, t ORDER BY multiplicity""",

    "q_partition_planning" -> """
      SELECT * FROM (
        SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(100) AS BIGINT) AS est_bytes,
               CAST((SUM(100) + 134217727) // 134217728 AS BIGINT) AS parts_at_128mb
        FROM lineitem
        UNION ALL
        SELECT 'orders', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(60 + length(o_orderpriority)) AS BIGINT),
               CAST((SUM(60 + length(o_orderpriority)) + 134217727) // 134217728 AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'documents', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(40 + n_chars) AS BIGINT),
               CAST((SUM(40 + n_chars) + 134217727) // 134217728 AS BIGINT)
        FROM documents)
      ORDER BY table_name""",

    "q_holdout_drift" -> """
      WITH s AS (SELECT CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                    AS BIGINT) % 10 < 8
                             THEN 'train' ELSE 'test' END AS split,
                        n_chars AS x
                 FROM documents),
           g AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(x*x) AS BIGINT) AS sxx
                 FROM s GROUP BY 1),
           p AS (SELECT MAX(CASE WHEN split = 'train' THEN n END) AS n1,
                        MAX(CASE WHEN split = 'train' THEN sx END) AS s1,
                        MAX(CASE WHEN split = 'train' THEN sxx END) AS ss1,
                        MAX(CASE WHEN split = 'test' THEN n END) AS n2,
                        MAX(CASE WHEN split = 'test' THEN sx END) AS s2,
                        MAX(CASE WHEN split = 'test' THEN sxx END) AS ss2
                 FROM g)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             ROUND(CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE), 4) + 0 AS train_mean,
             ROUND(CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE), 4) + 0 AS test_mean,
             ROUND((CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)
                    - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE))
                   / SQRT((((CAST(ss1 AS DOUBLE)
                             - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE))
                            / (CAST(n1 AS DOUBLE)-1.0))
                           + ((CAST(ss2 AS DOUBLE)
                               - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE))
                              / (CAST(n2 AS DOUBLE)-1.0))) / 2.0), 6) + 0 AS smd
      FROM p""",

    "q_len_token_corr" -> """
      WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        CAST(SUM(y*y) AS BIGINT) AS syy
                 FROM (SELECT lang, n_chars AS x,
                              CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS y
                       FROM documents)
                 GROUP BY 1)
      SELECT lang, n,
             ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                   / SQRT((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) + 0 AS corr
      FROM s ORDER BY lang""",

    "q_embedding_shape_audit" -> """
      WITH x AS (SELECT len(embedding) AS dims,
                        len(list_filter(embedding, v -> isnan(CAST(v AS DOUBLE)))) > 0 AS has_nan,
                        list_sum(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) = 0
                          AS all_zero
                 FROM embeddings)
      SELECT CAST(dims AS BIGINT) AS dims, CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(SUM(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_with_nan,
             CAST(SUM(CASE WHEN all_zero THEN 1 ELSE 0 END) AS BIGINT) AS n_all_zero
      FROM x GROUP BY 1 ORDER BY 1""",

    "q_label_balance" -> """
      WITH c AS (SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n
                 FROM embeddings GROUP BY 1),
           t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS k FROM c)
      SELECT label, n, CAST(n * 10000 // tot AS BIGINT) AS share_e4,
             CAST(ROUND((CAST(n AS DOUBLE) - CAST(tot AS DOUBLE)/CAST(k AS DOUBLE))
                        * (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE)/CAST(k AS DOUBLE))
                        / (CAST(tot AS DOUBLE)/CAST(k AS DOUBLE)) * 1e8) AS BIGINT)
               AS chi2_term_e8
      FROM c, t ORDER BY label""",

    "q_sampling_temperature" -> """
      WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
           w AS (SELECT lang, n_docs,
                        CAST(ROUND(SQRT(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT) AS w_e6
                 FROM s),
           t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot, CAST(SUM(w_e6) AS BIGINT) AS wtot
                 FROM w)
      SELECT lang, n_docs, CAST(n_docs * 10000 // tot AS BIGINT) AS share_e4, w_e6,
             CAST(w_e6 * 1000000 // wtot AS BIGINT) AS alloc_ppm
      FROM w, t ORDER BY lang""",

    "q_qoq_growth" -> """
      WITH q AS (SELECT date_trunc('quarter', l_shipdate) AS qtr,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                 FROM lineitem GROUP BY 1)
      SELECT strftime(cur.qtr, '%Y-%m') AS quarter, prev.rev AS prev_rev, cur.rev AS rev,
             CAST((cur.rev - prev.rev) * 10000 // prev.rev AS BIGINT) AS growth_e4
      FROM q cur JOIN q prev ON cur.qtr = prev.qtr + INTERVAL 3 MONTH
      ORDER BY quarter""",

    "q_degenerate_docs" -> """
      WITH d AS (SELECT lang, n_chars,
                        len(string_split(lower(text), ' ')) AS n_tok,
                        len(list_distinct(string_split(lower(text), ' '))) AS n_distinct
                 FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_tok = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_tok,
             CAST(SUM(CASE WHEN n_distinct = 1 AND n_tok > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_uniform,
             CAST(SUM(CASE WHEN n_chars < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
      FROM d GROUP BY 1 ORDER BY 1""",

    "q_decimal_integrity" -> """
      SELECT * FROM (
        SELECT 'o_totalprice' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN ABS(o_totalprice*100.0 - ROUND(o_totalprice*100.0)) > 1e-6
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above_1e6,
               CAST(ROUND(MAX(ABS(o_totalprice*100.0 - ROUND(o_totalprice*100.0))) * 1e9)
                 AS BIGINT) AS max_dev_e9
        FROM orders
        UNION ALL
        SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN ABS(l_extendedprice*100.0 - ROUND(l_extendedprice*100.0))
                                  > 1e-6 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(ROUND(MAX(ABS(l_extendedprice*100.0 - ROUND(l_extendedprice*100.0))) * 1e9)
                 AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN ABS(l_discount*100.0 - ROUND(l_discount*100.0)) > 1e-6
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(ROUND(MAX(ABS(l_discount*100.0 - ROUND(l_discount*100.0))) * 1e9) AS BIGINT)
        FROM lineitem)
      ORDER BY column_name""",

    "q_aging_buckets" -> """
      WITH o AS (SELECT o_orderstatus,
                        CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                          AS BIGINT) AS dayn,
                        CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp
                 FROM orders),
           r AS (SELECT CAST(MAX(dayn) AS BIGINT) AS ref FROM o),
           b AS (SELECT CASE WHEN ref - dayn <= 30 THEN 'a_0_30'
                             WHEN ref - dayn <= 60 THEN 'b_31_60'
                             WHEN ref - dayn <= 90 THEN 'c_61_90'
                             ELSE 'd_over_90' END AS bucket, tp
                 FROM o, r WHERE o_orderstatus = 'O')
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders, CAST(SUM(tp) AS BIGINT) AS value_cents
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_lorenz_curve" -> """
      WITH sp AS (SELECT o_custkey,
                         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sp
                  FROM orders GROUP BY 1),
           bb AS (SELECT quantile_cont(sp, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
                  FROM sp),
           d AS (SELECT CAST(1 + len(list_filter(bs, b -> sp > b)) AS BIGINT) AS decile, sp
                 FROM sp, bb),
           a AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
                        CAST(SUM(sp) AS BIGINT) AS spend_cents
                 FROM d GROUP BY 1),
           c AS (SELECT decile, n_customers, spend_cents,
                        CAST(SUM(spend_cents) OVER (ORDER BY decile) AS BIGINT) AS cum,
                        CAST(SUM(spend_cents) OVER () AS BIGINT) AS tot
                 FROM a)
      SELECT decile, n_customers, spend_cents, CAST(cum * 10000 // tot AS BIGINT) AS cum_share_e4
      FROM c ORDER BY decile""",

    "q_five_number" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(vc) AS BIGINT) AS min_cents,
             ROUND(quantile_cont(vc, 0.25), 4) + 0 AS q1,
             ROUND(quantile_cont(vc, 0.5), 4) + 0 AS median,
             ROUND(quantile_cont(vc, 0.75), 4) + 0 AS q3,
             CAST(MAX(vc) AS BIGINT) AS max_cents
      FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events)
      GROUP BY 1 ORDER BY 1""",

    "q_weekly_retention_curve" -> """
      WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
           f AS (SELECT user_id, MIN(wk) AS w0 FROM uw GROUP BY 1),
           o AS (SELECT DISTINCT uw.user_id,
                        CAST(date_diff('day', CAST(w0 AS DATE), CAST(wk AS DATE)) // 7
                          AS BIGINT) AS wk_offset
                 FROM uw JOIN f ON uw.user_id = f.user_id),
           c AS (SELECT wk_offset, CAST(COUNT(*) AS BIGINT) AS n_users FROM o GROUP BY 1),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS cohort FROM f)
      SELECT wk_offset, n_users, CAST(n_users * 10000 // cohort AS BIGINT) AS retention_e4
      FROM c, t ORDER BY wk_offset""",

    "q_langid_confusion" -> """
      WITH grams AS (SELECT doc_id, lang,
                            unnest(list_transform(generate_series(1, length(text) - 1),
                                   i -> substring(text, i, 2))) AS gram
                     FROM documents),
           lc AS (SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY lang, gram),
           lt AS (SELECT lang AS cand_lang, gram, lrank FROM
                    (SELECT lang, gram,
                            CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS BIGINT) AS lrank
                     FROM lc)
                  WHERE lrank <= 20),
           dc AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c FROM grams GROUP BY doc_id, gram),
           dtp AS (SELECT doc_id, gram, drank FROM
                     (SELECT doc_id, gram,
                             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS BIGINT) AS drank
                      FROM dc)
                   WHERE drank <= 20),
           langs AS (SELECT DISTINCT lang AS cand_lang FROM documents),
           dist AS (SELECT dtp.doc_id, langs.cand_lang AS cand_lang,
                           CAST(SUM(COALESCE(ABS(drank - lrank), 20)) AS BIGINT) AS dist
                    FROM dtp CROSS JOIN langs
                    LEFT JOIN lt ON lt.cand_lang = langs.cand_lang AND lt.gram = dtp.gram
                    GROUP BY dtp.doc_id, langs.cand_lang),
           best AS (SELECT doc_id, cand_lang AS predicted FROM
                      (SELECT doc_id, cand_lang,
                              ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, cand_lang) AS rn
                       FROM dist)
                    WHERE rn = 1),
           cells AS (SELECT d.lang AS actual, b.predicted, CAST(COUNT(*) AS BIGINT) AS n
                     FROM best b JOIN documents d ON b.doc_id = d.doc_id
                     GROUP BY 1, 2)
      SELECT actual, predicted, n,
             CAST(n * 10000 // SUM(n) OVER (PARTITION BY actual) AS BIGINT) AS row_share_e4
      FROM cells ORDER BY actual, predicted""",

    "q_compaction_candidates" -> """
      WITH p AS (SELECT l_returnflag AS flag,
                        strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
                        CAST(COUNT(*) AS BIGINT) AS n_rows
                 FROM lineitem GROUP BY 1, 2)
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_small_partitions,
             CAST(SUM(n_rows) AS BIGINT) AS rows_to_compact,
             MIN(month) AS first_month, MAX(month) AS last_month
      FROM p WHERE n_rows < 500 GROUP BY 1 ORDER BY 1""",

    "q_region_priority_matrix" -> """
      SELECT r_name AS region, o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_xyz_variability" -> """
      WITH w AS (SELECT p_brand AS brand, l_partkey, date_trunc('week', l_shipdate) AS wk,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 GROUP BY 1, 2, 3),
           p AS (SELECT brand, l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q*q) AS BIGINT) AS ss
                 FROM w GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           c AS (SELECT brand,
                        CAST(ROUND(SQRT((CAST(ss AS DOUBLE)
                                         - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                                        / (CAST(n AS DOUBLE) - 1.0))
                                   / (CAST(s AS DOUBLE)/CAST(n AS DOUBLE)) * 1e4) AS BIGINT)
                          AS cv_e4
                 FROM p)
      SELECT brand, CASE WHEN cv_e4 < 5000 THEN 'X' WHEN cv_e4 < 10000 THEN 'Y'
                         ELSE 'Z' END AS xyz,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM c GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_did_estimate" -> """
      WITH ev AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS vc,
                         isodow(ts) >= 6 AS is_we,
                         epoch_us(ts) // 86400000000 AS dayn
                  FROM events WHERE event_type = 'purchase'),
           sp AS (SELECT quantile_cont(dayn, 0.5) AS mid FROM ev),
           cells AS (SELECT is_we, CAST(dayn AS DOUBLE) > mid AS late,
                            CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS s
                     FROM ev, sp GROUP BY 1, 2),
           p AS (SELECT MAX(CASE WHEN NOT is_we AND NOT late THEN s END) AS s_wd1,
                        MAX(CASE WHEN NOT is_we AND NOT late THEN n END) AS n_wd1,
                        MAX(CASE WHEN is_we AND NOT late THEN s END) AS s_we1,
                        MAX(CASE WHEN is_we AND NOT late THEN n END) AS n_we1,
                        MAX(CASE WHEN NOT is_we AND late THEN s END) AS s_wd2,
                        MAX(CASE WHEN NOT is_we AND late THEN n END) AS n_wd2,
                        MAX(CASE WHEN is_we AND late THEN s END) AS s_we2,
                        MAX(CASE WHEN is_we AND late THEN n END) AS n_we2
                 FROM cells)
      SELECT CAST(n_wd1 AS BIGINT) AS n_wd1, CAST(n_we1 AS BIGINT) AS n_we1,
             CAST(n_wd2 AS BIGINT) AS n_wd2, CAST(n_we2 AS BIGINT) AS n_we2,
             ROUND((CAST(s_we2 AS DOUBLE)/CAST(n_we2 AS DOUBLE)
                    - CAST(s_wd2 AS DOUBLE)/CAST(n_wd2 AS DOUBLE))
                   - (CAST(s_we1 AS DOUBLE)/CAST(n_we1 AS DOUBLE)
                      - CAST(s_wd1 AS DOUBLE)/CAST(n_wd1 AS DOUBLE)), 4) + 0 AS did_cents
      FROM p""",

    "q_like_patterns" -> """
      SELECT * FROM (
        SELECT 'contains_fast_table' AS pattern, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN text LIKE '%fast table%' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_match,
               CAST(CASE WHEN SUM(CASE WHEN text LIKE '%fast table%' THEN 1 ELSE 0 END) = 0
                         THEN -1
                         ELSE SUM(CASE WHEN text LIKE '%fast table%'
                                       THEN CAST(strpos(text, 'fast table') AS BIGINT)
                                       ELSE 0 END) * 10000
                              // SUM(CASE WHEN text LIKE '%fast table%' THEN 1 ELSE 0 END)
                    END AS BIGINT) AS mean_pos_e4
        FROM documents
        UNION ALL
        SELECT 'starts_with_key', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN text LIKE 'key%' THEN 1 ELSE 0 END) AS BIGINT),
               CAST(CASE WHEN SUM(CASE WHEN text LIKE 'key%' THEN 1 ELSE 0 END) = 0 THEN -1
                         ELSE 10000 END AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'ends_with_scan', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN text LIKE '%scan' THEN 1 ELSE 0 END) AS BIGINT),
               CAST(CASE WHEN SUM(CASE WHEN text LIKE '%scan' THEN 1 ELSE 0 END) = 0 THEN -1
                         ELSE SUM(CASE WHEN text LIKE '%scan'
                                       THEN CAST(length(text) - 3 AS BIGINT) ELSE 0 END) * 10000
                              // SUM(CASE WHEN text LIKE '%scan' THEN 1 ELSE 0 END)
                    END AS BIGINT)
        FROM documents)
      ORDER BY pattern""",

    "q_supplier_concentration" -> """
      WITH ps AS (SELECT l_partkey, l_suppkey, CAST(COUNT(*) AS BIGINT) AS c
                  FROM lineitem GROUP BY 1, 2),
           r AS (SELECT l_partkey, c,
                        ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY c DESC, l_suppkey)
                          AS rn
                 FROM ps),
           a AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_sup,
                        CAST(SUM(c) AS BIGINT) AS tot,
                        CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS top_c
                 FROM r GROUP BY 1)
      SELECT n_sup, CAST(top_c * 10000 // tot // 2500 AS BIGINT) AS share_band,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM a GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_srm_check" -> """
      WITH c AS (SELECT user_id % 2 AS cohort, CAST(COUNT(*) AS BIGINT) AS n
                 FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
           p AS (SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS n0,
                        MAX(CASE WHEN cohort = 1 THEN n END) AS n1
                 FROM c)
      SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             ROUND((CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                   * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                   / (CAST(n0 + n1 AS DOUBLE)/2.0)
                   + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                     * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                     / (CAST(n0 + n1 AS DOUBLE)/2.0), 6) + 0 AS chi2,
             CAST(CASE WHEN (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                            * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                            / (CAST(n0 + n1 AS DOUBLE)/2.0)
                            + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                              * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                              / (CAST(n0 + n1 AS DOUBLE)/2.0) > 3.841
                       THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
      FROM p""",

    "q_keyset_pagination" -> """
      WITH o AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp, o_orderkey AS okey
                 FROM orders),
           b AS (SELECT tp AS b_tp, okey AS b_okey FROM
                   (SELECT tp, okey, ROW_NUMBER() OVER (ORDER BY tp DESC, okey) AS rn FROM o)
                 WHERE rn = 20)
      SELECT okey, tp AS total_cents FROM o, b
      WHERE tp < b_tp OR (tp = b_tp AND okey > b_okey)
      ORDER BY tp DESC, okey LIMIT 10""",

    "q_twap" -> """
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS ts_usl,
                        event_id, CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           g AS (SELECT event_type, vc,
                        LEAD(ts_usl) OVER (PARTITION BY event_type, day
                          ORDER BY ts_usl, event_id) - ts_usl AS gap
                 FROM e),
           s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_weighted,
                        SUM(CAST(vc AS HUGEINT) * gap) AS vg, CAST(SUM(gap) AS BIGINT) AS g
                 FROM g WHERE gap IS NOT NULL GROUP BY 1)
      SELECT event_type, n_weighted,
             ROUND(CAST(vg AS DOUBLE) / CAST(g AS DOUBLE), 4) + 0 AS twap_cents
      FROM s ORDER BY event_type""",

    "q_demand_intermittency" -> """
      WITH w AS (SELECT DISTINCT l_partkey,
                        date_diff('day', DATE '1970-01-01',
                          CAST(date_trunc('week', l_shipdate) AS DATE)) // 7 AS wkn
                 FROM lineitem),
           p AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS active,
                        CAST(MIN(wkn) AS BIGINT) AS w0, CAST(MAX(wkn) AS BIGINT) AS w1
                 FROM w GROUP BY 1),
           s AS (SELECT active * 10000 // (w1 - w0 + 1) AS share_e4 FROM p)
      SELECT CAST(share_e4 // 2500 AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM s GROUP BY 1 ORDER BY 1""",

    "q_norm_quantiles_by_label" -> """
      WITH x AS (SELECT CAST(label AS BIGINT) AS label,
                        CAST(FLOOR(SQRT(CAST(list_sum(list_transform(list_transform(embedding,
                               v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)),
                               q -> q*q)) AS DOUBLE)) / 10000.0) AS BIGINT) AS nrm
                 FROM embeddings)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(nrm) AS BIGINT) AS min_e3,
             ROUND(quantile_cont(nrm, 0.5), 4) + 0 AS p50_e3,
             ROUND(quantile_cont(nrm, 0.9), 4) + 0 AS p90_e3,
             CAST(MAX(nrm) AS BIGINT) AS max_e3
      FROM x GROUP BY 1 ORDER BY 1""",

    "q_accumulating_snapshot" -> """
      WITH l AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
                        MIN(l_shipdate) AS fs, MAX(l_shipdate) AS ls
                 FROM lineitem GROUP BY 1)
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS ordered,
             strftime(fs, '%Y-%m-%d') AS first_ship, strftime(ls, '%Y-%m-%d') AS last_ship,
             n_lines,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(fs AS DATE)) AS BIGINT)
               AS days_to_first,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(ls AS DATE)) AS BIGINT)
               AS days_to_last
      FROM l JOIN orders ON l_orderkey = o_orderkey WHERE o_orderkey < 50
      ORDER BY o_orderkey""",

    "q_order_fulfillment" -> """
      WITH l AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                          AS nf
                 FROM lineitem GROUP BY 1)
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CASE WHEN nf = n THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
             CAST(SUM(CASE WHEN nf > 0 AND nf < n THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
             CAST(SUM(CASE WHEN nf = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_open
      FROM l JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1""",

    "q_group_by_all" -> """
      SELECT l_returnflag AS flag, l_linestatus AS status,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY ALL ORDER BY flag, status""",

    "q_values_lookup" -> """
      WITH sla(priority, target_days) AS (VALUES
             ('1-URGENT', 35), ('2-HIGH', 45), ('3-MEDIUM', 60),
             ('4-NOT SPECIFIED', 75), ('5-LOW', 90)),
           fs AS (SELECT l_orderkey, MIN(l_shipdate) AS first_ship
                  FROM lineitem GROUP BY l_orderkey),
           lat AS (SELECT o_orderpriority AS priority,
                          date_diff('day', CAST(o_orderdate AS DATE), CAST(first_ship AS DATE))
                            AS days
                   FROM fs JOIN orders ON l_orderkey = o_orderkey)
      SELECT lat.priority, CAST(sla.target_days AS BIGINT) AS target_days,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CASE WHEN lat.days <= sla.target_days THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within,
             CAST(SUM(CASE WHEN lat.days <= sla.target_days THEN 1 ELSE 0 END) * 10000
                  // COUNT(*) AS BIGINT) AS within_e4
      FROM lat JOIN sla ON lat.priority = sla.priority
      GROUP BY lat.priority, sla.target_days ORDER BY lat.priority""",

    "q_seasonal_amplitude" -> """
      WITH d AS (SELECT event_type, isodow(ts) - 1 AS dow, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s
                 FROM events GROUP BY 1, 2),
           m AS (SELECT event_type, CAST(s // n AS BIGINT) AS m FROM d)
      SELECT event_type, CAST(MIN(m) AS BIGINT) AS min_dow_mean,
             CAST(MAX(m) AS BIGINT) AS max_dow_mean,
             CAST(MAX(m) * 10000 // MIN(m) AS BIGINT) AS amplitude_e4
      FROM m GROUP BY 1 ORDER BY 1""",

    "q_catalog_price_drift" -> """
      WITH r AS (SELECT p_brand AS brand,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           c AS (SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
                        CAST(SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS BIGINT) AS rsum
                 FROM part GROUP BY 1)
      SELECT r.brand, n_parts, CAST(rev * 100 // qty AS BIGINT) AS realized_unit_e4,
             CAST(rsum * 100 // n_parts AS BIGINT) AS catalog_unit_e4,
             CAST(CAST(rev * 100 // qty AS HUGEINT) * 10000
                  // (rsum * 100 // n_parts) AS BIGINT) AS drift_index_e4
      FROM r JOIN c ON r.brand = c.brand ORDER BY r.brand""",

    "q_adamic_adar" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           hubs AS (SELECT u AS z,
                           CAST(ROUND(1000000.0 / ln(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w_e6
                    FROM edges GROUP BY 1 HAVING COUNT(*) >= 2),
           pairs AS (SELECT a.u AS z, a.v AS x, b.v AS y FROM edges a JOIN edges b
                     ON a.u = b.u AND a.v < b.v),
           scored AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_common,
                             CAST(SUM(w_e6) AS BIGINT) AS score_e6
                      FROM pairs JOIN hubs ON pairs.z = hubs.z GROUP BY 1, 2)
      SELECT x AS u, y AS v, n_common, score_e6 FROM scored s
      WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.u = s.x AND e0.v = s.y)
      ORDER BY score_e6 DESC, u, v LIMIT 10""",

    "q_graph_assortativity" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
           j AS (SELECT d1.deg AS du, d2.deg AS dv FROM edges e
                 JOIN deg d1 ON e.u = d1.node JOIN deg d2 ON e.v = d2.node),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(du) AS BIGINT) AS sx,
                        CAST(SUM(dv) AS BIGINT) AS sy, CAST(SUM(du*dv) AS BIGINT) AS sxy,
                        CAST(SUM(du*du) AS BIGINT) AS sxx, CAST(SUM(dv*dv) AS BIGINT) AS syy
                 FROM j)
      SELECT n AS n_directed_edges,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0
               AS assortativity
      FROM s""",

    "q_rater_agreement" -> """
      WITH r AS (SELECT CASE WHEN len(string_split(text, ' ')) >= 30 THEN 1 ELSE 0 END AS a,
                        CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
                                  >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS b
                 FROM documents),
           c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(a*b) AS BIGINT) AS n11,
                        CAST(SUM(a*(1-b)) AS BIGINT) AS n10, CAST(SUM((1-a)*b) AS BIGINT) AS n01,
                        CAST(SUM((1-a)*(1-b)) AS BIGINT) AS n00
                 FROM r)
      SELECT n, n11, n10, n01, n00,
             ROUND(((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)
                     - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                        + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                        + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) + 0 AS kappa,
             ROUND((CAST(n11 AS DOUBLE) * CAST(n00 AS DOUBLE) - CAST(n10 AS DOUBLE) * CAST(n01 AS DOUBLE))
                   / SQRT(CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                          * CAST(n00 + n10 AS DOUBLE) * CAST(n00 + n01 AS DOUBLE)), 6) + 0 AS mcc
      FROM c""",

    "q_kendall_tau" -> """
      WITH g AS (SELECT p_brand AS brand,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS x,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           p AS (SELECT a.x, a.y, b.x AS x2, b.y AS y2 FROM g a JOIN g b ON a.brand < b.brand),
           c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                        CAST(SUM(CASE WHEN (x < x2 AND y < y2) OR (x > x2 AND y > y2)
                                      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
                        CAST(SUM(CASE WHEN (x < x2 AND y > y2) OR (x > x2 AND y < y2)
                                      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
                        CAST(SUM(CASE WHEN x = x2 AND y <> y2 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
                        CAST(SUM(CASE WHEN y = y2 AND x <> x2 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
                 FROM p)
      SELECT n_pairs, concordant, discordant, ties_x, ties_y,
             ROUND((CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
                   / SQRT(CAST(concordant + discordant + ties_x AS DOUBLE)
                          * CAST(concordant + discordant + ties_y AS DOUBLE)), 6) + 0 AS tau_b
      FROM c""",

    "q_levene_test" -> """
      WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
           med AS (SELECT event_type, quantile_cont(vc, 0.5) AS med FROM v GROUP BY 1),
           z AS (SELECT v.event_type, CAST(ROUND(2*ABS(CAST(vc AS DOUBLE) - med)) AS BIGINT) AS z2
                 FROM v JOIN med ON v.event_type = med.event_type),
           g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ni, CAST(SUM(z2) AS BIGINT) AS si,
                        CAST(SUM(z2*z2) AS BIGINT) AS qi
                 FROM z GROUP BY 1),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ni) AS BIGINT) AS n,
                        CAST(SUM(si) AS BIGINT) AS s,
                        SUM(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)) AS bsum,
                        SUM(CAST(qi AS DOUBLE) - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
                            / CAST(ni AS DOUBLE)) AS wsum
                 FROM g),
           w AS (SELECT k AS k_groups, n AS n_total,
                        ROUND((CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                              * (bsum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                              / wsum, 6) + 0 AS w_stat
                 FROM t)
      SELECT k_groups, n_total, w_stat,
             CAST(CASE WHEN w_stat > 2.372 THEN 1 ELSE 0 END AS BIGINT) AS heteroscedastic
      FROM w""",

    "q_attribution_time_decay" -> """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu,
                        CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           p AS (SELECT user_id, tsu AS p_ts, vc FROM e WHERE event_type = 'purchase'),
           t AS (SELECT user_id, tsu AS t_ts, event_type AS channel FROM e
                 WHERE event_type <> 'purchase'),
           c AS (SELECT channel,
                        vc * (CASE (p_ts - t_ts) // 86400000000 WHEN 0 THEN 4 WHEN 1 THEN 2
                              ELSE 1 END) AS credit_q
                 FROM p JOIN t ON p.user_id = t.user_id
                 WHERE t_ts < p_ts AND p_ts - t_ts <= 3*86400000000),
           g AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
                        CAST(SUM(credit_q) AS BIGINT) AS credit_qc
                 FROM c GROUP BY 1),
           tot AS (SELECT CAST(SUM(credit_qc) AS BIGINT) AS t FROM g)
      SELECT channel, n_touches, credit_qc, CAST(credit_qc * 10000 // t AS BIGINT) AS share_e4
      FROM g, tot ORDER BY channel""",

    "q_cross_correlation" -> """
      WITH d AS (SELECT event_type,
                        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS dayn,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s
                 FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2),
           v AS (SELECT dayn, s AS x FROM d WHERE event_type = 'view'),
           p AS (SELECT dayn AS pdayn, s AS y FROM d WHERE event_type = 'purchase'),
           l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-3, 4)),
           g AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
                        CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
                 FROM v CROSS JOIN l JOIN p ON pdayn = dayn + lag GROUP BY 1)
      SELECT lag, n_days,
             ROUND((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (SQRT(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * SQRT(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0
               AS r
      FROM g ORDER BY lag""",

    "q_kmv_setops" -> """
      WITH av AS (SELECT DISTINCT user_id AS k FROM events WHERE event_type = 'view'),
           bv AS (SELECT DISTINCT user_id AS k FROM events WHERE event_type = 'click'),
           ah AS (SELECT CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM av ORDER BY h LIMIT 64),
           ae AS (SELECT CAST((COUNT(*) - 1) * 4294967296 // MAX(h) AS BIGINT) AS est_view FROM ah),
           bh AS (SELECT CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM bv ORDER BY h LIMIT 64),
           be AS (SELECT CAST((COUNT(*) - 1) * 4294967296 // MAX(h) AS BIGINT) AS est_click FROM bh),
           uv AS (SELECT k FROM av UNION SELECT k FROM bv),
           uh AS (SELECT CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) AS h
                  FROM uv ORDER BY h LIMIT 64),
           ue AS (SELECT CAST((COUNT(*) - 1) * 4294967296 // MAX(h) AS BIGINT) AS est_union FROM uh),
           ex AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM av) AS exact_view,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM bv) AS exact_click,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM av JOIN bv ON av.k = bv.k)
                           AS exact_overlap)
      SELECT CAST(64 AS BIGINT) AS k, est_view, exact_view, est_click, exact_click, est_union,
             exact_view + exact_click - exact_overlap AS exact_union,
             est_view + est_click - est_union AS est_overlap, exact_overlap
      FROM ae, be, ue, ex""",

    "q_surrogate_hash_audit" -> """
      WITH ck AS (SELECT CAST(c_name AS VARCHAR) AS nk, md5(CAST(c_name AS VARCHAR)) AS sk
                  FROM customer),
           sk2 AS (SELECT CAST(s_name AS VARCHAR) AS nk, md5(CAST(s_name AS VARCHAR)) AS sk
                   FROM supplier),
           pk AS (SELECT concat_ws('|', p_name, p_brand, CAST(p_size AS VARCHAR)) AS nk,
                         md5(concat_ws('|', p_name, p_brand, CAST(p_size AS VARCHAR))) AS sk
                  FROM part),
           u AS (SELECT 'customer' AS table_name, nk, sk FROM ck
                 UNION ALL SELECT 'supplier', nk, sk FROM sk2
                 UNION ALL SELECT 'part', nk, sk FROM pk),
           base AS (SELECT table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                           CAST(COUNT(DISTINCT nk) AS BIGINT) AS n_natural,
                           CAST(COUNT(DISTINCT sk) AS BIGINT) AS n_hash
                    FROM u GROUP BY 1),
           b AS (SELECT table_name, substring(sk, 1, 1) AS nib, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT DISTINCT table_name, sk FROM u) GROUP BY 1, 2),
           skew AS (SELECT table_name, CAST(MAX(c) * 10000 // SUM(c) AS BIGINT) AS max_bucket_e4,
                           ROUND(SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) * 16.0
                                 / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) - 1.0, 6) + 0
                             AS skew_index
                    FROM b GROUP BY 1)
      SELECT base.table_name, n_rows, n_natural, n_hash, n_natural - n_hash AS n_collisions,
             max_bucket_e4, skew_index
      FROM base JOIN skew ON base.table_name = skew.table_name
      ORDER BY base.table_name""",

    "q_business_days" -> """
      WITH fs AS (SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
           j AS (SELECT o_orderpriority AS priority,
                        CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(first_ship AS DATE))
                             AS BIGINT) AS days,
                        CAST(isodow(o_orderdate) - 1 AS BIGINT) AS w1
                 FROM fs JOIN orders ON l_orderkey = o_orderkey),
           b AS (SELECT priority, (days // 7) * 5 + days % 7
                          - (CASE WHEN (5 - w1 + 7) % 7 BETWEEN 1 AND days % 7 THEN 1 ELSE 0 END)
                          - (CASE WHEN (6 - w1 + 7) % 7 BETWEEN 1 AND days % 7 THEN 1 ELSE 0 END)
                        AS bd
                 FROM j)
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders, CAST(SUM(bd) AS BIGINT) AS total_bd,
             CAST(MAX(bd) AS BIGINT) AS max_bd,
             CAST(SUM(bd) * 10000 // COUNT(*) AS BIGINT) AS mean_bd_e4
      FROM b GROUP BY 1 ORDER BY 1""",

    "q_mmr_rerank" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           qq AS (SELECT qe AS query_qe FROM n WHERE vec_id = 0),
           cands AS (SELECT vec_id, qe,
                            CAST(list_sum(list_transform(list_zip(qe, query_qe), p -> p[1]*p[2]))
                                 AS BIGINT) AS rel
                     FROM n, qq WHERE vec_id <> 0 ORDER BY rel DESC, vec_id LIMIT 20),
           s1 AS (SELECT vec_id, qe, rel, CAST(0 AS BIGINT) AS ms, rel * 7 AS score,
                         CAST(1 AS BIGINT) AS rnk
                  FROM cands ORDER BY rel DESC, vec_id LIMIT 1),
           r2 AS (SELECT c.vec_id, c.qe, c.rel,
                         MAX(CAST(list_sum(list_transform(list_zip(c.qe, s.qe), p -> p[1]*p[2]))
                             AS BIGINT)) AS ms
                  FROM cands c, s1 s WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
                  GROUP BY 1, 2, 3),
           n2 AS (SELECT vec_id, qe, rel, ms, 7*rel - 3*ms AS score, CAST(2 AS BIGINT) AS rnk
                  FROM r2 ORDER BY score DESC, vec_id LIMIT 1),
           sel2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM n2),
           r3 AS (SELECT c.vec_id, c.qe, c.rel,
                         MAX(CAST(list_sum(list_transform(list_zip(c.qe, s.qe), p -> p[1]*p[2]))
                             AS BIGINT)) AS ms
                  FROM cands c, sel2 s WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
                  GROUP BY 1, 2, 3),
           n3 AS (SELECT vec_id, qe, rel, ms, 7*rel - 3*ms AS score, CAST(3 AS BIGINT) AS rnk
                  FROM r3 ORDER BY score DESC, vec_id LIMIT 1),
           sel3 AS (SELECT * FROM sel2 UNION ALL SELECT * FROM n3),
           r4 AS (SELECT c.vec_id, c.qe, c.rel,
                         MAX(CAST(list_sum(list_transform(list_zip(c.qe, s.qe), p -> p[1]*p[2]))
                             AS BIGINT)) AS ms
                  FROM cands c, sel3 s WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
                  GROUP BY 1, 2, 3),
           n4 AS (SELECT vec_id, qe, rel, ms, 7*rel - 3*ms AS score, CAST(4 AS BIGINT) AS rnk
                  FROM r4 ORDER BY score DESC, vec_id LIMIT 1),
           sel4 AS (SELECT * FROM sel3 UNION ALL SELECT * FROM n4),
           r5 AS (SELECT c.vec_id, c.qe, c.rel,
                         MAX(CAST(list_sum(list_transform(list_zip(c.qe, s.qe), p -> p[1]*p[2]))
                             AS BIGINT)) AS ms
                  FROM cands c, sel4 s WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
                  GROUP BY 1, 2, 3),
           n5 AS (SELECT vec_id, qe, rel, ms, 7*rel - 3*ms AS score, CAST(5 AS BIGINT) AS rnk
                  FROM r5 ORDER BY score DESC, vec_id LIMIT 1),
           sel5 AS (SELECT * FROM sel4 UNION ALL SELECT * FROM n5)
      SELECT rnk AS mmr_rank, vec_id, rel AS rel_e14, ms AS max_sim_e14, score AS score_x10
      FROM sel5 ORDER BY mmr_rank""",

    "q_skyline" -> """
      WITH pts AS (SELECT CAST(ROUND(p_retailprice*100) AS BIGINT) AS rc,
                          CAST(p_size AS BIGINT) AS sz, p_partkey
                   FROM part),
           best AS (SELECT rc, MAX(sz) AS sz FROM pts GROUP BY 1),
           f AS (SELECT rc, sz, MAX(sz) OVER (ORDER BY rc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                 FROM best),
           fr AS (SELECT rc, sz FROM f WHERE pm IS NULL OR sz > pm)
      SELECT fr.rc, fr.sz, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(MIN(p_partkey) AS BIGINT) AS min_partkey
      FROM fr JOIN pts ON fr.rc = pts.rc AND fr.sz = pts.sz
      GROUP BY 1, 2 ORDER BY 1""",

    "q_knapsack_greedy" -> """
      WITH items AS (SELECT p_partkey, CAST(ROUND(p_retailprice*100) AS BIGINT) AS vc,
                            CAST(p_size AS BIGINT) AS sz
                     FROM part),
           d AS (SELECT p_partkey, vc, sz, vc * 10000 // sz AS density_e4 FROM items),
           c AS (SELECT vc, sz, density_e4,
                        SUM(sz) OVER (ORDER BY density_e4 DESC, p_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_sz
                 FROM d),
           s AS (SELECT * FROM c WHERE cum_sz <= 1000)
      SELECT CAST(1000 AS BIGINT) AS budget, CAST(COUNT(*) AS BIGINT) AS n_selected,
             CAST(SUM(sz) AS BIGINT) AS total_size, CAST(SUM(vc) AS BIGINT) AS total_value_cents,
             CAST(MIN(density_e4) AS BIGINT) AS marginal_density_e4
      FROM s""",

    "q_price_endings" -> """
      WITH e AS (SELECT CAST(ROUND(p_retailprice*100) AS BIGINT) % 100 AS ending,
                        CAST(COUNT(*) AS BIGINT) AS n_parts
                 FROM part GROUP BY 1),
           t AS (SELECT CAST(SUM(n_parts) AS BIGINT) AS t FROM e)
      SELECT ending, n_parts, CAST(n_parts * 10000 // t AS BIGINT) AS share_e4
      FROM e, t ORDER BY n_parts DESC, ending LIMIT 10""",

    "q_kaplan_meier" -> """
      WITH obs AS (SELECT CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
                          AS BIGINT) AS t,
                          CASE WHEN MAX(CAST(ts AS DATE)) <= DATE '2024-01-23' THEN 1 ELSE 0 END
                            AS churned
                   FROM events GROUP BY user_id),
           byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at, CAST(SUM(churned) AS BIGINT) AS d
                   FROM obs GROUP BY 1),
           r AS (SELECT t, n_at, d,
                        CAST(SUM(n_at) OVER (ORDER BY t DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
                 FROM byt),
           l AS (SELECT t, n_risk, d, n_at,
                        CASE WHEN d > 0
                             THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                             ELSE 0.0 END AS lnterm
                 FROM r),
           c AS (SELECT t, n_risk, d, n_at,
                        SUM(lnterm) OVER (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM l)
      SELECT t, n_risk, d AS n_churned, n_at - d AS n_censored,
             ROUND(exp(cum), 4) + 0 AS survival
      FROM c ORDER BY t""",

    "q_abandonment_rate" -> """
      WITH ud AS (SELECT user_id, CAST(ts AS DATE) AS day,
                         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
                         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
                  FROM events GROUP BY 1, 2)
      SELECT CAST(isodow(day) - 1 AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_user_days,
             CAST(SUM(hv) AS BIGINT) AS n_view_days,
             CAST(SUM(hv * (1 - hp)) AS BIGINT) AS n_abandoned,
             CAST(SUM(hv * (1 - hp)) * 10000 // SUM(hv) AS BIGINT) AS abandon_rate_e4
      FROM ud GROUP BY 1 ORDER BY 1""",

    "q_kcore_peel" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           g0 AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           d0 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM g0 GROUP BY 1),
           s1 AS (SELECT u AS node FROM d0 WHERE deg >= 3),
           g1 AS (SELECT g0.u, g0.v FROM g0
                  JOIN s1 a ON g0.u = a.node JOIN s1 b ON g0.v = b.node),
           d1 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM g1 GROUP BY 1),
           s2 AS (SELECT u AS node FROM d1 WHERE deg >= 3),
           g2 AS (SELECT g1.u, g1.v FROM g1
                  JOIN s2 a ON g1.u = a.node JOIN s2 b ON g1.v = b.node),
           d2 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM g2 GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS round, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(deg) AS BIGINT) AS n_directed_edges,
               CAST(MIN(deg) AS BIGINT) AS min_deg, CAST(MAX(deg) AS BIGINT) AS max_deg
        FROM d0
        UNION ALL
        SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT), CAST(SUM(deg) AS BIGINT),
               CAST(MIN(deg) AS BIGINT), CAST(MAX(deg) AS BIGINT)
        FROM d1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT), CAST(SUM(deg) AS BIGINT),
               CAST(MIN(deg) AS BIGINT), CAST(MAX(deg) AS BIGINT)
        FROM d2)
      ORDER BY round""",

    "q_partial_correlation" -> """
      WITH u AS (SELECT user_id,
                        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                        CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
                        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS z
                 FROM events GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(z) AS BIGINT) AS sz,
                        CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*z) AS BIGINT) AS sxz,
                        CAST(SUM(y*z) AS BIGINT) AS syz, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        CAST(SUM(y*y) AS BIGINT) AS syy, CAST(SUM(z*z) AS BIGINT) AS szz
                 FROM u),
           r AS (SELECT n AS n_users,
                        ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0 AS r_xy,
                        ROUND((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
                              / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * SQRT(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6) + 0 AS r_xz,
                        ROUND((CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
                              / (SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                                 * SQRT(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6) + 0 AS r_yz
                 FROM s)
      SELECT n_users, r_xy, r_xz, r_yz,
             ROUND((r_xy - r_xz * r_yz) / SQRT((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6) + 0
               AS partial_r_xy_z
      FROM r""",

    "q_boosting_stump" -> """
      WITH base AS (SELECT CAST(p_size AS BIGINT) AS f,
                           CAST(ROUND(p_retailprice*100) AS BIGINT) AS yv
                    FROM part),
           h1 AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cn, CAST(SUM(yv) AS BIGINT) AS cy,
                         CAST(SUM(yv*yv) AS BIGINT) AS cyy
                  FROM base GROUP BY 1),
           t1 AS (SELECT CAST(SUM(cn) AS BIGINT) AS tn, CAST(SUM(cy) AS BIGINT) AS ty,
                         CAST(SUM(cyy) AS BIGINT) AS tyy FROM h1),
           c1 AS (SELECT f,
                         CAST(SUM(cn) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lcn,
                         CAST(SUM(cy) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ly,
                         CAST(SUM(cyy) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lyy
                  FROM h1),
           s1 AS (SELECT CAST(1 AS BIGINT) AS round, f AS threshold, lcn AS n_left,
                         tn - lcn AS n_right, ly, ty - ly AS ry,
                         ROUND((CAST(lyy AS DOUBLE) - CAST(ly AS DOUBLE) * CAST(ly AS DOUBLE) / CAST(lcn AS DOUBLE))
                               + (CAST(tyy - lyy AS DOUBLE) - CAST(ty - ly AS DOUBLE) * CAST(ty - ly AS DOUBLE)
                                  / CAST(tn - lcn AS DOUBLE)), 4) + 0 AS sse
                  FROM c1, t1 WHERE lcn < tn
                  ORDER BY sse, threshold LIMIT 1),
           resid AS (SELECT f, yv - (CASE WHEN f <= s1.threshold THEN s1.ly // s1.n_left
                                          ELSE s1.ry // s1.n_right END) AS yv
                     FROM base, s1),
           h2 AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cn, CAST(SUM(yv) AS BIGINT) AS cy,
                         CAST(SUM(yv*yv) AS BIGINT) AS cyy
                  FROM resid GROUP BY 1),
           t2 AS (SELECT CAST(SUM(cn) AS BIGINT) AS tn, CAST(SUM(cy) AS BIGINT) AS ty,
                         CAST(SUM(cyy) AS BIGINT) AS tyy FROM h2),
           c2 AS (SELECT f,
                         CAST(SUM(cn) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lcn,
                         CAST(SUM(cy) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ly,
                         CAST(SUM(cyy) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lyy
                  FROM h2),
           s2 AS (SELECT CAST(2 AS BIGINT) AS round, f AS threshold, lcn AS n_left,
                         tn - lcn AS n_right, ly, ty - ly AS ry,
                         ROUND((CAST(lyy AS DOUBLE) - CAST(ly AS DOUBLE) * CAST(ly AS DOUBLE) / CAST(lcn AS DOUBLE))
                               + (CAST(tyy - lyy AS DOUBLE) - CAST(ty - ly AS DOUBLE) * CAST(ty - ly AS DOUBLE)
                                  / CAST(tn - lcn AS DOUBLE)), 4) + 0 AS sse
                  FROM c2, t2 WHERE lcn < tn
                  ORDER BY sse, threshold LIMIT 1),
           u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
      SELECT round, threshold, n_left, n_right,
             ROUND(CAST(ly AS DOUBLE) / CAST(n_left AS DOUBLE), 4) + 0 AS mean_left,
             ROUND(CAST(ry AS DOUBLE) / CAST(n_right AS DOUBLE), 4) + 0 AS mean_right,
             sse
      FROM u ORDER BY round""",

    "q_chi2_residuals" -> """
      WITH cells AS (SELECT c_mktsegment AS segment, o_orderpriority AS priority,
                            CAST(COUNT(*) AS BIGINT) AS o
                     FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
           rm AS (SELECT segment, CAST(SUM(o) AS BIGINT) AS ri FROM cells GROUP BY 1),
           cm AS (SELECT priority, CAST(SUM(o) AS BIGINT) AS cj FROM cells GROUP BY 1),
           n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
      SELECT cells.segment, cells.priority, o,
             ROUND(CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0 AS expected,
             ROUND((CAST(o AS DOUBLE) - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / CAST(n AS DOUBLE))
                   / SQRT(CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) / CAST(n AS DOUBLE)
                          * (1.0 - CAST(ri AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - CAST(cj AS DOUBLE) / CAST(n AS DOUBLE))), 4) + 0 AS adj_residual
      FROM cells JOIN rm ON cells.segment = rm.segment
      JOIN cm ON cells.priority = cm.priority, n
      ORDER BY cells.segment, cells.priority""",

    "q_cuped" -> """
      WITH u AS (SELECT user_id,
                        CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
                        CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
                 FROM events GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        SUM(CAST(y AS HUGEINT) * y) AS syy, CAST(SUM(x*y) AS BIGINT) AS sxy
                 FROM u),
           d AS (SELECT n AS n_users,
                        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv,
                        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
                 FROM s)
      SELECT n_users, ROUND(cv / vx, 6) + 0 AS theta,
             ROUND(cv * cv / (vx * vy), 6) + 0 AS variance_reduction
      FROM d""",

    "q_iv_estimate" -> """
      WITH u AS (SELECT user_id,
                        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                        CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
                        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS z
                 FROM events GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(z) AS BIGINT) AS sz,
                        CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(z*y) AS BIGINT) AS szy,
                        CAST(SUM(z*x) AS BIGINT) AS szx, CAST(SUM(x*x) AS BIGINT) AS sxx,
                        CAST(SUM(z*z) AS BIGINT) AS szz
                 FROM u)
      SELECT n AS n_users,
             ROUND((CAST(n AS DOUBLE) * CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(szx AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0
               AS beta_iv,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0
               AS beta_ols,
             ROUND((CAST(n AS DOUBLE) * CAST(szx AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE))
                   / (SQRT(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))
                      * SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6) + 0
               AS first_stage_r
      FROM s""",

    "q_sprt_boundary" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS s
                     FROM events GROUP BY 1),
           c AS (SELECT day,
                        CAST(SUM(s) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s,
                        CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
                 FROM daily),
           l AS (SELECT strftime(day, '%Y-%m-%d') AS day, cum_s, cum_n,
                        ROUND(CAST(cum_s AS DOUBLE) * 0.2006707
                              + CAST(cum_n - cum_s AS DOUBLE) * (-0.0500104), 4) + 0 AS llr
                 FROM c)
      SELECT day, cum_s, cum_n, llr,
             CASE WHEN llr > 2.9444 THEN 'accept_h1'
                  WHEN llr < -2.9444 THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM l ORDER BY day""",

    "q_wilson_ci" -> """
      WITH g AS (SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS s
                 FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
      SELECT segment, n, s,
             ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0 AS p_hat,
             ROUND((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 3.8416 / (2.0 * CAST(n AS DOUBLE))
                    - 1.96 * SQRT((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                  * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                                  + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                   / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6) + 0 AS wilson_lo,
             ROUND((CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 3.8416 / (2.0 * CAST(n AS DOUBLE))
                    + 1.96 * SQRT((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                  * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                                  + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                   / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6) + 0 AS wilson_hi
      FROM g ORDER BY segment""",

    "q_beta_posterior" -> """
      WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN CAST(ROUND(value*100) AS BIGINT) > 10000
                                      THEN 1 ELSE 0 END) AS BIGINT) AS s
                 FROM events GROUP BY 1)
      SELECT event_type, s + 1 AS alpha, n - s + 1 AS beta,
             CAST((s + 1) * 1000000 // (n + 2) AS BIGINT) AS post_mean_e6,
             ROUND(CAST(s + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE)
                   - 1.96 * SQRT(CAST(s + 1 AS DOUBLE) * CAST(n - s + 1 AS DOUBLE)
                                 / (CAST(n + 2 AS DOUBLE) * CAST(n + 2 AS DOUBLE) * CAST(n + 3 AS DOUBLE))), 6) + 0
               AS ci_lo,
             ROUND(CAST(s + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE)
                   + 1.96 * SQRT(CAST(s + 1 AS DOUBLE) * CAST(n - s + 1 AS DOUBLE)
                                 / (CAST(n + 2 AS DOUBLE) * CAST(n + 2 AS DOUBLE) * CAST(n + 3 AS DOUBLE))), 6) + 0
               AS ci_hi
      FROM g ORDER BY event_type""",

    "q_post_stratification" -> """
      WITH ev AS (SELECT event_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
           pop AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS pn FROM ev GROUP BY 1),
           samp AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sn, CAST(SUM(vc) AS BIGINT) AS sv
                    FROM ev
                    WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 = 0
                    GROUP BY 1),
           strat AS (SELECT CAST(SUM(pn) AS BIGINT) AS pn_tot, CAST(SUM(sn) AS BIGINT) AS sn_tot,
                            CAST(SUM(sv) AS BIGINT) AS sv_tot,
                            SUM(CAST(pn AS DOUBLE) * (CAST(sv AS DOUBLE) / CAST(sn AS DOUBLE))) AS wsum
                     FROM pop JOIN samp ON pop.event_type = samp.event_type),
           truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn, CAST(SUM(vc) AS BIGINT) AS tv FROM ev)
      SELECT sn_tot AS n_sample, tn AS n_population,
             ROUND(CAST(tv AS DOUBLE) / CAST(tn AS DOUBLE), 4) + 0 AS true_mean_cents,
             ROUND(CAST(sv_tot AS DOUBLE) / CAST(sn_tot AS DOUBLE), 4) + 0 AS raw_sample_mean_cents,
             ROUND(wsum / CAST(pn_tot AS DOUBLE), 4) + 0 AS poststrat_mean_cents
      FROM strat, truth""",

    "q_sssp_weighted" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v, CAST(COUNT(*) AS BIGINT) AS s
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v, 1000 // s AS w FROM e0
                     UNION ALL SELECT v, u, 1000 // s FROM e0),
           d0 AS (SELECT MIN(u) AS node, CAST(0 AS BIGINT) AS dist FROM edges),
           d1 AS (SELECT node, MIN(dist) AS dist FROM (
                    SELECT e.v AS node, d.dist + e.w AS dist FROM d0 d JOIN edges e ON d.node = e.u
                    UNION ALL SELECT node, dist FROM d0) GROUP BY 1),
           d2 AS (SELECT node, MIN(dist) AS dist FROM (
                    SELECT e.v AS node, d.dist + e.w AS dist FROM d1 d JOIN edges e ON d.node = e.u
                    UNION ALL SELECT node, dist FROM d1) GROUP BY 1),
           d3 AS (SELECT node, MIN(dist) AS dist FROM (
                    SELECT e.v AS node, d.dist + e.w AS dist FROM d2 d JOIN edges e ON d.node = e.u
                    UNION ALL SELECT node, dist FROM d2) GROUP BY 1)
      SELECT node, CAST(dist AS BIGINT) AS dist FROM d3 ORDER BY dist, node LIMIT 10""",

    "q_position_bias" -> """
      WITH p AS (SELECT event_type,
                        ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                          ORDER BY epoch_us(ts), event_id) AS pos
                 FROM events)
      SELECT CAST(pos AS BIGINT) AS pos, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT)
               AS ctr_e4
      FROM p WHERE pos <= 10 GROUP BY 1 ORDER BY 1""",

    "q_user_sequence_similarity" -> """
      WITH counts AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM events GROUP BY 1, 2, 3),
           m AS (SELECT user_id, day, substring(event_type, 1, 1) AS ch,
                        ROW_NUMBER() OVER (PARTITION BY user_id, day
                          ORDER BY c DESC, event_type) AS rn
                 FROM counts),
           seqs AS (SELECT user_id, string_agg(ch, '' ORDER BY day) AS seq
                    FROM m WHERE rn = 1 GROUP BY 1),
           q AS (SELECT seq AS q_seq FROM seqs WHERE user_id = 0)
      SELECT user_id, CAST(levenshtein(seq, q_seq) AS BIGINT) AS edit_dist,
             CAST(length(seq) AS BIGINT) AS seq_len
      FROM seqs, q WHERE user_id <> 0
      ORDER BY edit_dist, user_id LIMIT 10""",

    "q_eoq_policy" -> """
      WITH g AS (SELECT p_brand AS brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand_units,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           u AS (SELECT brand, demand_units, CAST(rev // qty AS BIGINT) AS unit_price_cents FROM g)
      SELECT brand, demand_units, unit_price_cents,
             ROUND(SQRT(2.0 * CAST(demand_units AS DOUBLE) * 5000.0
                        / (0.2 * CAST(unit_price_cents AS DOUBLE))), 4) + 0 AS eoq_units
      FROM u ORDER BY brand""",

    "q_shapley_attribution" -> """
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS tsu, event_type,
                        event_id, CAST(ROUND(value*100) AS BIGINT) AS vc
                 FROM events),
           p AS (SELECT user_id, day, tsu AS p_ts, event_id AS pid, vc FROM e
                 WHERE event_type = 'purchase'),
           t AS (SELECT user_id, day, tsu AS t_ts, event_type AS channel FROM e
                 WHERE event_type <> 'purchase'),
           sets AS (SELECT DISTINCT pid, vc, channel FROM p JOIN t USING (user_id, day)
                    WHERE t_ts < p_ts),
           sizes AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS ss FROM sets GROUP BY 1),
           credits AS (SELECT channel, vc * (12 // ss) AS c12 FROM sets JOIN sizes USING (pid)),
           per AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
                          CAST(SUM(c12) AS BIGINT) AS credit_12ths
                   FROM credits GROUP BY 1),
           tot AS (SELECT CAST(SUM(credit_12ths) AS BIGINT) AS t FROM per)
      SELECT channel, n_credits, credit_12ths,
             CAST(credit_12ths * 10000 // t AS BIGINT) AS share_e4
      FROM per, tot ORDER BY channel""",

    "q_pvm_decomposition" -> """
      WITH y0 AS (SELECT p_brand AS brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1996,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS r1996
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE year(l_shipdate) = 1996 GROUP BY 1),
           y1 AS (SELECT p_brand AS brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1997,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS r1997
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE year(l_shipdate) = 1997 GROUP BY 1),
           j AS (SELECT y0.brand, q1996, q1997, CAST(r1996 // q1996 AS BIGINT) AS p0,
                        CAST(r1997 // q1997 AS BIGINT) AS p1, r1997 - r1996 AS delta_rev
                 FROM y0 JOIN y1 ON y0.brand = y1.brand)
      SELECT brand, q1996, q1997, p0, p1, delta_rev,
             (p1 - p0) * q1996 AS price_effect,
             p0 * (q1997 - q1996) AS volume_effect,
             (p1 - p0) * (q1997 - q1996) AS mix_effect,
             delta_rev - (p1 - p0) * q1996 - p0 * (q1997 - q1996)
               - (p1 - p0) * (q1997 - q1996) AS floor_residual
      FROM j ORDER BY brand""",

    "q_graph_modularity" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           comm AS (SELECT u % 10 AS cu, v % 10 AS cv FROM edges),
           per AS (SELECT cu, CAST(COUNT(*) AS BIGINT) AS a_i,
                          CAST(SUM(CASE WHEN cu = cv THEN 1 ELSE 0 END) AS BIGINT) AS e_ii
                   FROM comm GROUP BY 1),
           m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM comm),
           terms AS (SELECT CAST(e_ii AS DOUBLE) / CAST(m2 AS DOUBLE)
                            - (CAST(a_i AS DOUBLE) / CAST(m2 AS DOUBLE))
                              * (CAST(a_i AS DOUBLE) / CAST(m2 AS DOUBLE)) AS term, m2
                     FROM per, m)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
             CAST(MAX(m2) // 2 AS BIGINT) AS n_edges,
             ROUND(SUM(term), 6) + 0 AS modularity
      FROM terms""",

    "q_knn_hubness" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                            CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                     FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id),
           r AS (SELECT nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
                 FROM pairs),
           indeg AS (SELECT nid, CAST(COUNT(*) AS BIGINT) AS in_deg FROM r
                     WHERE rn <= 5 GROUP BY 1),
           alln AS (SELECT COALESCE(in_deg, 0) AS in_deg
                    FROM n LEFT JOIN indeg ON n.vec_id = indeg.nid)
      SELECT in_deg, CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM alln GROUP BY 1 ORDER BY 1""",

    "q_esd_outliers" -> """
      WITH d0 AS (SELECT event_id, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events
                  WHERE event_type = 'error'),
           st1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS s,
                          CAST(SUM(vc*vc) AS BIGINT) AS q FROM d0),
           z1 AS (SELECT event_id, vc, n,
                         ABS(CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / CAST(n - 1 AS DOUBLE)) AS z
                  FROM d0, st1),
           t1 AS (SELECT * FROM z1 ORDER BY z DESC, event_id LIMIT 1),
           d1 AS (SELECT event_id, vc FROM d0 WHERE event_id NOT IN (SELECT event_id FROM t1)),
           st2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS s,
                          CAST(SUM(vc*vc) AS BIGINT) AS q FROM d1),
           z2 AS (SELECT event_id, vc, n,
                         ABS(CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / CAST(n - 1 AS DOUBLE)) AS z
                  FROM d1, st2),
           t2 AS (SELECT * FROM z2 ORDER BY z DESC, event_id LIMIT 1),
           d2 AS (SELECT event_id, vc FROM d1 WHERE event_id NOT IN (SELECT event_id FROM t2)),
           st3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS s,
                          CAST(SUM(vc*vc) AS BIGINT) AS q FROM d2),
           z3 AS (SELECT event_id, vc, n,
                         ABS(CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                / CAST(n - 1 AS DOUBLE)) AS z
                  FROM d2, st3),
           t3 AS (SELECT * FROM z3 ORDER BY z DESC, event_id LIMIT 1),
           u AS (SELECT CAST(1 AS BIGINT) AS round, event_id, vc AS value_cents, n AS n_remaining,
                        ROUND(z, 4) + 0 AS r_stat, 3.02 AS lambda_crit,
                        CAST(CASE WHEN z > 3.02 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
                 FROM t1
                 UNION ALL
                 SELECT CAST(2 AS BIGINT), event_id, vc, n, ROUND(z, 4) + 0, 3.01,
                        CAST(CASE WHEN z > 3.01 THEN 1 ELSE 0 END AS BIGINT)
                 FROM t2
                 UNION ALL
                 SELECT CAST(3 AS BIGINT), event_id, vc, n, ROUND(z, 4) + 0, 3.01,
                        CAST(CASE WHEN z > 3.01 THEN 1 ELSE 0 END AS BIGINT)
                 FROM t3)
      SELECT * FROM u ORDER BY round""",

    "q_hill_tail_index" -> """
      WITH o AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp, o_orderkey FROM orders),
           top100 AS (SELECT tp FROM o ORDER BY tp DESC, o_orderkey LIMIT 100),
           xk AS (SELECT CAST(MIN(tp) AS BIGINT) AS xk FROM
                    (SELECT tp FROM o ORDER BY tp DESC, o_orderkey LIMIT 101)),
           l AS (SELECT tp, xk.xk,
                        CAST(FLOOR(ln(CAST(tp AS DOUBLE) / CAST(xk.xk AS DOUBLE)) * 1e9) AS BIGINT)
                          AS ln_e9
                 FROM top100, xk)
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(xk) AS BIGINT) AS xk_cents,
             CAST(SUM(ln_e9) AS BIGINT) AS sum_ln_e9,
             ROUND(CAST(COUNT(*) AS DOUBLE) * 1e9 / CAST(SUM(ln_e9) AS DOUBLE), 4) + 0
               AS hill_alpha
      FROM l""",

    "q_ecod_outlier" -> """
      WITH v AS (SELECT event_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
           c AS (SELECT event_id, event_type, vc,
                        CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY vc
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_le,
                        CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY vc DESC
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_ge,
                        CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
                 FROM v)
      SELECT event_id, event_type, vc,
             ROUND(-ln(CAST(LEAST(c_le, c_ge) AS DOUBLE) / CAST(n AS DOUBLE)), 4) + 0
               AS tail_score
      FROM c ORDER BY tail_score DESC, event_id LIMIT 10""",

    "q_sax_symbolize" -> """
      WITH daily AS (SELECT event_type,
                            CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS dayn,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s
                     FROM events GROUP BY 1, 2),
           base AS (SELECT event_type, CAST(MIN(dayn) AS BIGINT) AS d0,
                           CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(s) AS BIGINT) AS ts,
                           CAST(SUM(s*s) AS BIGINT) AS tq
                    FROM daily GROUP BY 1),
           segs AS (SELECT daily.event_type, (dayn - d0) // 6 AS seg,
                           CAST(SUM(s) AS BIGINT) AS ss, CAST(COUNT(*) AS BIGINT) AS sc,
                           MAX(ts) AS ts, MAX(tq) AS tq, MAX(nd) AS nd
                    FROM daily JOIN base ON daily.event_type = base.event_type
                    GROUP BY 1, 2),
           z AS (SELECT event_type, seg,
                        (CAST(ss AS DOUBLE) / CAST(sc AS DOUBLE) - CAST(ts AS DOUBLE) / CAST(nd AS DOUBLE))
                        / SQRT((CAST(tq AS DOUBLE) - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(nd AS DOUBLE))
                               / CAST(nd - 1 AS DOUBLE)) AS z
                 FROM segs),
           sym AS (SELECT event_type, seg, z,
                          CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
                               WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
                   FROM z)
      SELECT event_type, string_agg(sym, '' ORDER BY seg) AS sax,
             ROUND(MIN(z), 4) + 0 AS min_z, ROUND(MAX(z), 4) + 0 AS max_z
      FROM sym GROUP BY 1 ORDER BY 1""",

    "q_haar_energy" -> """
      WITH raw AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                            AS dayn,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                   FROM events GROUP BY 1),
           d0 AS (SELECT CAST(MIN(dayn) AS BIGINT) AS d0 FROM raw),
           daily AS (SELECT dayn - d0 AS i, x FROM raw, d0),
           l1 AS (SELECT i // 2 AS p, CAST(SUM(x) AS BIGINT) AS a1,
                         CAST(SUM(x * (1 - 2 * (i % 2))) AS BIGINT) AS d1
                  FROM daily GROUP BY 1),
           l2 AS (SELECT p // 2 AS p2, CAST(SUM(a1) AS BIGINT) AS a2,
                         CAST(SUM(a1 * (1 - 2 * (p % 2))) AS BIGINT) AS d2
                  FROM l1 GROUP BY 1),
           e0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(x*x) AS BIGINT) AS e_signal
                  FROM daily),
           e1 AS (SELECT CAST(SUM(d1*d1) AS BIGINT) AS e_detail1 FROM l1),
           e2 AS (SELECT CAST(SUM(d2*d2) AS BIGINT) AS e_detail2,
                         CAST(SUM(a2*a2) AS BIGINT) AS e_approx2 FROM l2)
      SELECT n_days, e_signal, e_detail1, e_detail2, e_approx2 FROM e0, e1, e2""",

    "q_textrank_keywords" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                           generate_subscripts(string_split(text, ' '), 1) AS pos
                    FROM documents),
           e0 AS (SELECT a.w AS u, b.w AS v, CAST(COUNT(*) AS BIGINT) AS c
                  FROM toks a JOIN toks b ON a.doc_id = b.doc_id
                    AND b.pos > a.pos AND b.pos <= a.pos + 2 AND a.w <> b.w
                  GROUP BY 1, 2),
           edges AS (SELECT u, v, CAST(SUM(c) AS BIGINT) AS c FROM
                       (SELECT u, v, c FROM e0 UNION ALL SELECT v, u, c FROM e0)
                     GROUP BY 1, 2),
           wtot AS (SELECT u, CAST(SUM(c) AS BIGINT) AS wu FROM edges GROUP BY 1),
           r0 AS (SELECT u AS w, CAST(1000000000000 AS BIGINT) AS rank0 FROM wtot),
           c1 AS (SELECT e.v, CAST(SUM((r0.rank0 * e.c) // wt.wu) AS BIGINT) AS tin
                  FROM r0 JOIN wtot wt ON r0.w = wt.u JOIN edges e ON r0.w = e.u
                  GROUP BY 1),
           r1 AS (SELECT wt.u AS w,
                         150000000000 + (850 * COALESCE(c1.tin, 0)) // 1000 AS rank1
                  FROM wtot wt LEFT JOIN c1 ON wt.u = c1.v),
           c2 AS (SELECT e.v, CAST(SUM((r1.rank1 * e.c) // wt.wu) AS BIGINT) AS tin
                  FROM r1 JOIN wtot wt ON r1.w = wt.u JOIN edges e ON r1.w = e.u
                  GROUP BY 1),
           r2 AS (SELECT wt.u AS w,
                         CAST(150000000000 + (850 * COALESCE(c2.tin, 0)) // 1000 AS BIGINT)
                           AS score
                  FROM wtot wt LEFT JOIN c2 ON wt.u = c2.v)
      SELECT w, score FROM r2 ORDER BY score DESC, w LIMIT 10""",

    "q_consistent_hash_rebalance" -> """
      WITH v8 AS (SELECT s.range AS shard,
                         CAST('0x' || substring(md5('shard' || CAST(s.range AS VARCHAR)
                           || '#v' || CAST(v.range AS VARCHAR)), 1, 8) AS BIGINT) AS pos
                  FROM range(8) s, range(4) v),
           v9 AS (SELECT s.range AS shard,
                         CAST('0x' || substring(md5('shard' || CAST(s.range AS VARCHAR)
                           || '#v' || CAST(v.range AS VARCHAR)), 1, 8) AS BIGINT) AS pos
                  FROM range(9) s, range(4) v),
           keys AS (SELECT CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT)
                      AS h
                    FROM customer),
           a8 AS (SELECT h, CASE WHEN EXISTS (SELECT 1 FROM v8 WHERE pos >= h)
                            THEN (SELECT shard FROM v8 WHERE pos >= h ORDER BY pos, shard LIMIT 1)
                            ELSE (SELECT shard FROM v8 ORDER BY pos, shard LIMIT 1) END AS shard8
                  FROM keys),
           a9 AS (SELECT h, CASE WHEN EXISTS (SELECT 1 FROM v9 WHERE pos >= h)
                            THEN (SELECT shard FROM v9 WHERE pos >= h ORDER BY pos, shard LIMIT 1)
                            ELSE (SELECT shard FROM v9 ORDER BY pos, shard LIMIT 1) END AS shard9
                  FROM keys),
           j AS (SELECT a8.h, shard8, shard9 FROM a8 JOIN a9 ON a8.h = a9.h),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
                          CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
                            AS moved
                   FROM j)
      SELECT CAST(shard9 AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_keys_after,
             CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT) AS n_arrived,
             CAST(moved * 10000 // t AS BIGINT) AS total_moved_share_e4
      FROM j, tot GROUP BY 1, moved, t ORDER BY 1""",

    "q_zorder_locality" -> """
      WITH pts AS (SELECT CAST(ROUND(p_retailprice*100) AS BIGINT) AS rc,
                          CAST(p_size AS BIGINT) AS sz
                   FROM part),
           mx AS (SELECT CAST(MAX(rc) AS BIGINT) AS mrc, CAST(MAX(sz) AS BIGINT) AS msz FROM pts),
           b AS (SELECT LEAST(15, rc * 16 // (mrc + 1)) AS px,
                        LEAST(15, sz * 16 // (msz + 1)) AS sy
                 FROM pts, mx),
           z AS (SELECT px, sy,
                        ((px // 1) % 2) * 2 + ((sy // 1) % 2) * 1
                        + ((px // 2) % 2) * 8 + ((sy // 2) % 2) * 4
                        + ((px // 4) % 2) * 32 + ((sy // 4) % 2) * 16
                        + ((px // 8) % 2) * 128 + ((sy // 8) % 2) * 64 AS zv
                 FROM b),
           filed AS (SELECT px, sy, zv // 16 AS zfile, px AS linfile FROM z),
           hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_match,
                          CAST(COUNT(DISTINCT zfile) AS BIGINT) AS z_files_touched,
                          CAST(COUNT(DISTINCT linfile) AS BIGINT) AS linear_files_touched
                   FROM filed WHERE px BETWEEN 4 AND 7),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                          CAST(COUNT(DISTINCT zfile) AS BIGINT) AS z_files_total
                   FROM filed)
      SELECT n_rows, n_match, CAST(n_match * 10000 // n_rows AS BIGINT) AS selectivity_e4,
             z_files_touched, z_files_total, linear_files_touched
      FROM hit, tot""",

    "q_cardinality_estimation" -> """
      WITH lo AS (SELECT 'lineitem_orders' AS join_name,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS nl,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS nr,
                         (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS dl,
                         (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS dr,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem JOIN orders
                            ON l_orderkey = o_orderkey) AS actual),
           lp AS (SELECT 'lineitem_part' AS join_name,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS nl,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS nr,
                         (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS dl,
                         (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT) FROM part) AS dr,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem JOIN part
                            ON l_partkey = p_partkey) AS actual),
           u AS (SELECT * FROM lo UNION ALL SELECT * FROM lp),
           e AS (SELECT join_name, nl, nr, dl, dr,
                        CAST(CAST(nl AS HUGEINT) * nr // GREATEST(dl, dr) AS BIGINT) AS estimated,
                        actual
                 FROM u)
      SELECT join_name, nl, nr, dl, dr, estimated, actual,
             CAST(GREATEST(estimated * 10000 // actual, actual * 10000 // estimated) AS BIGINT)
               AS q_error_e4
      FROM e ORDER BY join_name""",

    "q_bloom_join_prefilter" -> """
      WITH hot AS (SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 400000.0),
           bloom AS (SELECT DISTINCT
                       CAST('0x' || substring(md5(CAST(i.range AS VARCHAR) || '|'
                         || CAST(k AS VARCHAR)), 1, 8) AS BIGINT) % 16384 AS b
                     FROM hot, range(3) i),
           dk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
           probes AS (SELECT k,
                        CAST('0x' || substring(md5(CAST(i.range AS VARCHAR) || '|'
                          || CAST(k AS VARCHAR)), 1, 8) AS BIGINT) % 16384 AS b
                      FROM dk, range(3) i),
           passk AS (SELECT k FROM probes JOIN bloom USING (b)
                     GROUP BY k HAVING COUNT(*) = 3),
           np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pass FROM lineitem
                  WHERE l_orderkey IN (SELECT k FROM passk)),
           nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM lineitem
                  WHERE l_orderkey IN (SELECT k FROM hot)),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitem FROM lineitem),
           nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_orders FROM hot)
      SELECT n_lineitem, n_hot_orders, n_pass, n_true, n_pass - n_true AS false_positives,
             CAST((n_pass - n_true) * 1000000 // n_lineitem AS BIGINT) AS fp_rate_e6,
             CAST(n_true * 1000000 // n_lineitem AS BIGINT) AS selectivity_e6
      FROM tot, nb, np, nt""",

    "q_hits_scores" -> """
      WITH edges AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           h1 AS (SELECT c, CAST(COUNT(*) * 1000000 AS BIGINT) AS h FROM edges GROUP BY 1),
           a1 AS (SELECT p, CAST(SUM(h) AS BIGINT) AS a FROM edges JOIN h1 USING (c) GROUP BY 1),
           h2 AS (SELECT c, CAST(SUM(a) AS BIGINT) AS h FROM edges JOIN a1 USING (p) GROUP BY 1),
           a2 AS (SELECT p, CAST(SUM(h) AS BIGINT) AS authority
                  FROM edges JOIN h2 USING (c) GROUP BY 1)
      SELECT p AS partkey, authority FROM a2 ORDER BY authority DESC, partkey LIMIT 10""",

    "q_cdc_chunks" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                           generate_subscripts(string_split(text, ' '), 1) AS pos
                    FROM documents),
           b AS (SELECT doc_id, pos,
                        CASE WHEN CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) % 32 = 0
                             THEN 1 ELSE 0 END AS boundary
                 FROM toks),
           ch AS (SELECT doc_id, pos,
                         COALESCE(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
                  FROM b),
           chunks AS (SELECT doc_id, chunk, CAST(COUNT(*) AS BIGINT) AS len
                      FROM ch GROUP BY 1, 2),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
                          CAST(SUM(len) AS BIGINT) AS n_tokens
                   FROM chunks)
      SELECT CAST(len // 8 AS BIGINT) AS len_band, CAST(COUNT(*) AS BIGINT) AS n, n_chunks,
             CAST(n_tokens * 10000 // n_chunks AS BIGINT) AS mean_len_e4
      FROM chunks, tot GROUP BY 1, n_chunks, n_tokens ORDER BY 1""",

    "q_state_retention_sweep" -> """
      WITH ev AS (SELECT epoch_us(ts) AS tsu, user_id FROM events),
           hw AS (SELECT CAST(MAX(tsu) AS BIGINT) AS hw FROM ev),
           delays AS (SELECT CAST(CASE range WHEN 0 THEN 3600000000 WHEN 1 THEN 21600000000
                             ELSE 86400000000 END AS BIGINT) AS delay_us
                      FROM range(3))
      SELECT CAST(delay_us // 3600000000 AS BIGINT) AS delay_hours,
             CAST(COUNT(*) AS BIGINT) AS n_state_rows,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_open_keys
      FROM ev, hw, delays WHERE tsu > hw - delay_us
      GROUP BY 1 ORDER BY 1""",

    "q_qq_quantiles" -> """
      WITH v AS (SELECT quantile_cont(CAST(ROUND(value*100) AS BIGINT),
                          [0.05,0.10,0.15,0.20,0.25,0.30,0.35,0.40,0.45,0.50,
                           0.55,0.60,0.65,0.70,0.75,0.80,0.85,0.90,0.95]) AS qs
                 FROM events WHERE event_type = 'view'),
           p AS (SELECT quantile_cont(CAST(ROUND(value*100) AS BIGINT),
                          [0.05,0.10,0.15,0.20,0.25,0.30,0.35,0.40,0.45,0.50,
                           0.55,0.60,0.65,0.70,0.75,0.80,0.85,0.90,0.95]) AS qs
                 FROM events WHERE event_type = 'purchase'),
           ve AS (SELECT generate_subscripts(qs, 1) - 1 AS pos, unnest(qs) AS view_q FROM v),
           pe AS (SELECT generate_subscripts(qs, 1) - 1 AS pos, unnest(qs) AS purchase_q FROM p)
      SELECT CAST(ve.pos * 5 + 5 AS BIGINT) AS pct,
             ROUND(view_q, 4) + 0 AS view_q, ROUND(purchase_q, 4) + 0 AS purchase_q
      FROM ve JOIN pe ON ve.pos = pe.pos ORDER BY pct""",

    "q_mutual_nn" -> """
      WITH n AS (SELECT vec_id, label,
                        list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           pairs AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                            CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                     FROM n a JOIN n b ON a.label = 0 AND b.label = 1),
           ba AS (SELECT aid, bid, d2 FROM
                    (SELECT aid, bid, d2,
                            ROW_NUMBER() OVER (PARTITION BY aid ORDER BY d2, bid) AS rn
                     FROM pairs) WHERE rn = 1),
           bb AS (SELECT aid AS aid2, bid AS bid2 FROM
                    (SELECT aid, bid,
                            ROW_NUMBER() OVER (PARTITION BY bid ORDER BY d2, aid) AS rn
                     FROM pairs) WHERE rn = 1)
      SELECT aid, bid, d2 FROM ba JOIN bb ON aid = aid2 AND bid = bid2 ORDER BY aid""",

    "q_leverage_points" -> """
      WITH xs AS (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(x*x) AS BIGINT) AS sxx FROM xs),
           g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_rows FROM xs GROUP BY 1),
           l AS (SELECT x, n_rows, n,
                        ROUND(1.0 / CAST(n AS DOUBLE)
                              + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                                * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                                / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                   / CAST(n AS DOUBLE)), 8) + 0 AS leverage
                 FROM g, st)
      SELECT x, n_rows, leverage,
             CAST(CASE WHEN leverage > 4.0 / CAST(n AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)
               AS high_influence
      FROM l ORDER BY x""",

    "q_lof_outliers" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label = 0),
           pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                            CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                     FROM n a JOIN n b ON a.vec_id <> b.vec_id),
           ranked AS (SELECT qid, nid, d2,
                             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
                      FROM pairs),
           knn AS (SELECT qid, nid, d2, rn FROM ranked WHERE rn <= 5),
           kd AS (SELECT qid AS kd_id, d2 AS kdist FROM knn WHERE rn = 5),
           lrd AS (SELECT knn.qid, 5.0 / CAST(SUM(GREATEST(kd.kdist, knn.d2)) AS DOUBLE) AS lrd
                   FROM knn JOIN kd ON knn.nid = kd.kd_id GROUP BY 1),
           lof AS (SELECT knn.qid AS vec_id,
                          ROUND(SUM(ln2.lrd) / (5.0 * MAX(l1.lrd)), 4) + 0 AS lof
                   FROM knn JOIN lrd ln2 ON knn.nid = ln2.qid
                   JOIN lrd l1 ON knn.qid = l1.qid
                   GROUP BY 1)
      SELECT vec_id, lof FROM lof ORDER BY lof DESC, vec_id LIMIT 10""",

    "q_dbscan_labels" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label = 0),
           neigh AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                            CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                     FROM n a JOIN n b ON a.vec_id <> b.vec_id),
           inr AS (SELECT qid, nid FROM neigh WHERE d2 <= 165000000000000),
           core AS (SELECT qid AS core_id FROM inr GROUP BY 1 HAVING COUNT(*) >= 4),
           border AS (SELECT DISTINCT qid FROM inr
                      WHERE nid IN (SELECT core_id FROM core)
                        AND qid NOT IN (SELECT core_id FROM core)),
           c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_core FROM core),
           b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_border FROM border),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM n)
      SELECT n_points, n_core, n_border, n_points - n_core - n_border AS n_noise
      FROM t, c, b""",

    "q_interval_merge" -> """
      WITH iv AS (SELECT DISTINCT l_suppkey AS supp,
                         CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                              AS BIGINT) AS s
                  FROM lineitem WHERE l_suppkey < 20),
           iv2 AS (SELECT supp, s, s + 6 AS e FROM iv),
           f AS (SELECT supp, s, e,
                        MAX(e) OVER (PARTITION BY supp ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
                 FROM iv2),
           g AS (SELECT supp, s, e,
                        CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS new_island
                 FROM f),
           h AS (SELECT supp, s, e,
                        SUM(new_island) OVER (PARTITION BY supp ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                 FROM g),
           isl AS (SELECT supp, island, CAST(MIN(s) AS BIGINT) AS is0,
                          CAST(MAX(e) AS BIGINT) AS ie, CAST(COUNT(*) AS BIGINT) AS nw
                   FROM h GROUP BY 1, 2)
      SELECT supp, CAST(SUM(nw) AS BIGINT) AS n_windows, CAST(COUNT(*) AS BIGINT) AS n_islands,
             CAST(SUM(ie - is0 + 1) AS BIGINT) AS covered_days,
             CAST(MAX(ie - is0 + 1) AS BIGINT) AS longest_island_days
      FROM isl GROUP BY 1 ORDER BY 1""",

    "q_newsvendor" -> """
      WITH weekly AS (SELECT p_brand AS brand,
                             date_diff('day', DATE '1970-01-01',
                               CAST(date_trunc('week', l_shipdate) AS DATE)) // 7 AS wk,
                             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units
                      FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
           q AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_weeks,
                        quantile_cont(units, 0.75) AS q75
                 FROM weekly GROUP BY 1)
      SELECT weekly.brand, MAX(n_weeks) AS n_weeks, ROUND(MAX(q75), 4) + 0 AS stock_level,
             CAST(SUM(CASE WHEN CAST(units AS DOUBLE) > q75 THEN 1 ELSE 0 END) AS BIGINT)
               AS weeks_short,
             CAST(SUM(CASE WHEN CAST(units AS DOUBLE) <= q75 THEN 1 ELSE 0 END) AS BIGINT)
               AS weeks_covered
      FROM weekly JOIN q ON weekly.brand = q.brand GROUP BY 1 ORDER BY 1""",

    "q_control_chart" -> """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
           mr AS (SELECT event_type, x,
                         ABS(x - LAG(x) OVER (PARTITION BY event_type ORDER BY day)) AS mrange
                  FROM daily),
           st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(mrange) AS BIGINT) AS smr,
                         CAST(COUNT(mrange) AS BIGINT) AS nmr
                  FROM mr GROUP BY 1),
           j AS (SELECT mr.event_type, n_days, x,
                        CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS center,
                        2.66 * CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE) AS band
                 FROM mr JOIN st ON mr.event_type = st.event_type)
      SELECT event_type, MAX(n_days) AS n_days, ROUND(MAX(center), 4) + 0 AS center,
             ROUND(MAX(center) + MAX(band), 4) + 0 AS ucl,
             ROUND(MAX(center) - MAX(band), 4) + 0 AS lcl,
             CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > center + band THEN 1
                           WHEN CAST(x AS DOUBLE) < center - band THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_control
      FROM j GROUP BY 1 ORDER BY 1""",

    "q_ols_two_features" -> """
      WITH u AS (SELECT user_id,
                        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
                        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x2,
                        CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
                 FROM events GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x1) AS BIGINT) AS s1,
                        CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x1*x1) AS BIGINT) AS s11, CAST(SUM(x2*x2) AS BIGINT) AS s22,
                        CAST(SUM(x1*x2) AS BIGINT) AS s12, CAST(SUM(x1*y) AS BIGINT) AS s1y,
                        CAST(SUM(x2*y) AS BIGINT) AS s2y, SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM u),
           c AS (SELECT n AS n_users,
                        CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
                        CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
                        CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
                        CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
                        CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
                        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
                        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
                        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
                 FROM s),
           bb AS (SELECT n_users,
                         (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
                         (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2,
                         m1, m2, my, c1y, c2y, cyy
                  FROM c)
      SELECT n_users, ROUND(my - b1 * m1 - b2 * m2, 4) + 0 AS b0,
             ROUND(b1, 6) + 0 AS beta_views, ROUND(b2, 6) + 0 AS beta_clicks,
             ROUND((b1 * c1y + b2 * c2y) / cyy, 6) + 0 AS r2
      FROM bb""",

    "q_gaussian_nb" -> """
      WITH feat AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           CAST(FLOOR(SQRT(CAST(list_sum(list_transform(list_transform(embedding,
                                  v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)),
                                  q -> q*q)) AS DOUBLE)) / 10000.0) AS BIGINT) AS x
                    FROM embeddings),
           st AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nl, CAST(SUM(x) AS BIGINT) AS sl,
                         CAST(SUM(x*x) AS BIGINT) AS ql
                  FROM feat GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat),
           test AS (SELECT vec_id, label AS true_label, x FROM feat WHERE vec_id < 10),
           scored AS (SELECT vec_id, true_label, st.label,
                             -0.5 * ln((CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
                                       / CAST(nl - 1 AS DOUBLE))
                             - (CAST(x AS DOUBLE) - CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
                               * (CAST(x AS DOUBLE) - CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
                               / (2.0 * (CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
                                  / CAST(nl - 1 AS DOUBLE))
                             + ln(CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)) AS ll
                      FROM test, st, tot),
           best AS (SELECT vec_id, true_label, label AS predicted, ll,
                           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ll DESC, label) AS rn
                    FROM scored)
      SELECT vec_id, true_label, predicted, ROUND(ll, 4) + 0 AS loglik
      FROM best WHERE rn = 1 ORDER BY vec_id""",

    "q_simpson_paradox" -> """
      WITH d AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
                        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y
                 FROM lineitem),
           grouped AS (SELECT g AS scope, CAST(COUNT(*) AS BIGINT) AS n,
                              ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*y) AS DOUBLE)
                                     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                                    / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
                                       - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6) + 0
                                AS slope
                       FROM d GROUP BY 1),
           overall AS (SELECT 'ALL' AS scope, CAST(COUNT(*) AS BIGINT) AS n,
                              ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*y) AS DOUBLE)
                                     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                                    / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
                                       - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6) + 0
                                AS slope
                       FROM d),
           a AS (SELECT * FROM grouped UNION ALL SELECT * FROM overall),
           o AS (SELECT slope AS pooled_slope FROM overall)
      SELECT scope, n, slope,
             CAST(CASE WHEN (slope >= 0.0) = (pooled_slope >= 0.0) THEN 1 ELSE 0 END AS BIGINT)
               AS sign_agrees_pooled
      FROM a, o ORDER BY scope""",

    "q_kneser_ney" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w1,
                           generate_subscripts(string_split(text, ' '), 1) AS pos
                    FROM documents),
           bg AS (SELECT w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM toks),
           bigrams AS (SELECT w1, w2 FROM bg WHERE w2 IS NOT NULL),
           c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams GROUP BY 1, 2),
           c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1, CAST(COUNT(*) AS BIGINT) AS n1plus_fwd
                  FROM c12 GROUP BY 1),
           cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1plus_bwd FROM c12 GROUP BY 1),
           tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types FROM c12)
      SELECT c12.w2, c AS c_bigram, n1plus_bwd,
             ROUND(GREATEST(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(cw1 AS DOUBLE)
                   + 0.75 * CAST(n1plus_fwd AS DOUBLE) / CAST(cw1 AS DOUBLE)
                     * CAST(n1plus_bwd AS DOUBLE) / CAST(n_bigram_types AS DOUBLE), 6) + 0 AS p_kn
      FROM c12 JOIN c1 ON c12.w1 = c1.w1 JOIN cont ON c12.w2 = cont.w2, tt
      WHERE c12.w1 = 'fast'
      ORDER BY p_kn DESC, c12.w2 LIMIT 20""",

    "q_rake_keyphrases" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                           generate_subscripts(string_split(text, ' '), 1) AS pos
                    FROM documents),
           s AS (SELECT doc_id, pos, w,
                        CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END AS stop
                 FROM toks),
           g AS (SELECT doc_id, pos, w, stop,
                        SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                 FROM s),
           phrases AS (SELECT doc_id, grp, string_agg(w, ' ' ORDER BY pos) AS phrase,
                              CAST(COUNT(*) AS BIGINT) AS plen
                       FROM g WHERE stop = 0 GROUP BY 1, 2
                       HAVING COUNT(*) BETWEEN 2 AND 4),
           words AS (SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phrases),
           ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(plen) AS BIGINT) AS deg
                  FROM words GROUP BY 1),
           dp AS (SELECT DISTINCT phrase FROM phrases),
           dpw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM dp),
           scored AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_words,
                             CAST(SUM(deg * 1000000 // freq) AS BIGINT) AS score_e6
                      FROM dpw JOIN ws ON dpw.w = ws.w GROUP BY 1),
           counts AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
                      FROM phrases GROUP BY 1)
      SELECT scored.phrase, n_words, n_occurrences, score_e6
      FROM scored JOIN counts ON scored.phrase = counts.phrase
      ORDER BY score_e6 DESC, scored.phrase LIMIT 10""",

    "q_qte_deciles" -> """
      WITH u AS (SELECT user_id % 2 AS arm,
                        CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
                 FROM events GROUP BY user_id),
           t AS (SELECT quantile_cont(y, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
                 FROM u WHERE arm = 1),
           c AS (SELECT quantile_cont(y, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
                 FROM u WHERE arm = 0),
           te AS (SELECT generate_subscripts(qs, 1) - 1 AS pos, unnest(qs) AS treated_q FROM t),
           ce AS (SELECT generate_subscripts(qs, 1) - 1 AS pos, unnest(qs) AS control_q FROM c)
      SELECT CAST((te.pos + 1) * 10 AS BIGINT) AS decile,
             ROUND(treated_q, 4) + 0 AS treated_q, ROUND(control_q, 4) + 0 AS control_q,
             ROUND(treated_q - control_q, 4) + 0 AS qte
      FROM te JOIN ce ON te.pos = ce.pos ORDER BY decile""",

    "q_james_stein" -> """
      WITH g AS (SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS ni,
                        CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS si,
                        SUM(CAST(CAST(ROUND(c_acctbal*100) AS BIGINT) AS HUGEINT)
                            * CAST(ROUND(c_acctbal*100) AS BIGINT)) AS qi
                 FROM customer GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(si) AS BIGINT) AS s,
                          CAST(SUM(ni) AS BIGINT) AS n,
                          SUM(CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)) AS msum,
                          SUM((CAST(si AS DOUBLE) / CAST(ni AS DOUBLE))
                              * (CAST(si AS DOUBLE) / CAST(ni AS DOUBLE))) AS m2sum,
                          SUM((CAST(qi AS DOUBLE) - CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE))
                              / (CAST(ni - 1 AS DOUBLE) * CAST(ni AS DOUBLE))) AS varsum
                   FROM g),
           j AS (SELECT segment, ni, CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) AS raw_mean,
                        msum / CAST(k AS DOUBLE) AS grand,
                        GREATEST(0.0, 1.0 - (CAST(k - 3 AS DOUBLE) * (varsum / CAST(k AS DOUBLE)))
                                 / (m2sum - msum * msum / CAST(k AS DOUBLE))) AS b
                 FROM g, tot)
      SELECT segment, ni, ROUND(raw_mean, 4) + 0 AS raw_mean_cents,
             ROUND(b, 6) + 0 AS shrink_factor,
             ROUND(grand + b * (raw_mean - grand), 4) + 0 AS shrunk_mean_cents
      FROM j ORDER BY segment""",

    "q_mediation" -> """
      WITH u AS (SELECT user_id,
                        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS m,
                        CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
                 FROM events GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(m) AS BIGINT) AS sm, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(m*m) AS BIGINT) AS smm,
                        CAST(SUM(x*m) AS BIGINT) AS sxm, CAST(SUM(x*y) AS BIGINT) AS sxy,
                        CAST(SUM(m*y) AS BIGINT) AS smy
                 FROM u),
           c AS (SELECT n AS n_users,
                        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
                        CAST(n AS DOUBLE) * CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) AS cmm,
                        CAST(n AS DOUBLE) * CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE) AS cxm,
                        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
                        CAST(n AS DOUBLE) * CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) AS cmy
                 FROM s),
           e AS (SELECT n_users, cxm / cxx AS a,
                        (cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm) AS b,
                        (cmm * cxy - cxm * cmy) / (cxx * cmm - cxm * cxm) AS direct,
                        cxy / cxx AS total
                 FROM c)
      SELECT n_users, ROUND(a, 6) + 0 AS path_a, ROUND(b, 6) + 0 AS path_b,
             ROUND(direct, 6) + 0 AS direct_effect, ROUND(a * b, 6) + 0 AS indirect_effect,
             ROUND(total, 6) + 0 AS total_effect,
             ROUND(a * b / total, 6) + 0 AS prop_mediated
      FROM e""",

    "q_power_analysis" -> """
      WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)
                                 * CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS q
                 FROM events GROUP BY 1),
           d AS (SELECT event_type, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
                        (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n - 1 AS DOUBLE) AS var_c
                 FROM g)
      SELECT event_type, n, ROUND(mean_c, 4) + 0 AS mean_cents,
             ROUND(SQRT(var_c), 4) + 0 AS sd_cents,
             CAST(CEIL(2.0 * 7.849 * var_c / (0.05 * mean_c * 0.05 * mean_c)) AS BIGINT)
               AS n_per_arm
      FROM d ORDER BY event_type""",

    "q_conformal_interval" -> """
      WITH ev AS (SELECT event_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS vc,
                         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 2
                           AS half
                  FROM events),
           model AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nc,
                            CAST(SUM(vc) AS BIGINT) AS sc
                     FROM ev WHERE half = 0 GROUP BY 1),
           calib AS (SELECT ev.event_type, MAX(nc) AS n_calib,
                            quantile_cont(ABS(CAST(vc AS DOUBLE)
                              - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)), 0.9) AS q90
                     FROM ev JOIN model ON ev.event_type = model.event_type
                     WHERE half = 0 GROUP BY 1)
      SELECT ev.event_type, MAX(n_calib) AS n_calib, CAST(COUNT(*) AS BIGINT) AS n_test,
             ROUND(MAX(q90), 4) + 0 AS half_width,
             CAST(SUM(CASE WHEN ABS(CAST(vc AS DOUBLE)
                                    - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) <= q90
                           THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS coverage_e4
      FROM ev JOIN model ON ev.event_type = model.event_type
      JOIN calib ON ev.event_type = calib.event_type
      WHERE half = 1 GROUP BY 1 ORDER BY 1""",

    "q_ipf_raking" -> """
      WITH cells AS (SELECT c_mktsegment AS segment, o_orderpriority AS priority,
                            CAST(COUNT(*) AS BIGINT) AS o
                     FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
           n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
           w0 AS (SELECT segment, priority, o, n, CAST(o AS DOUBLE) AS w FROM cells, n),
           ra AS (SELECT segment, SUM(w) AS rw FROM w0 GROUP BY 1),
           w1 AS (SELECT w0.segment, priority, o, n,
                         w * (CAST(n AS DOUBLE) / 5.0) / rw AS w
                  FROM w0 JOIN ra ON w0.segment = ra.segment),
           ca AS (SELECT priority, SUM(w) AS cw FROM w1 GROUP BY 1),
           w2 AS (SELECT segment, w1.priority, o, n,
                         w * (CAST(n AS DOUBLE) / 5.0) / cw AS w
                  FROM w1 JOIN ca ON w1.priority = ca.priority)
      SELECT segment, priority, o, ROUND(w / CAST(o AS DOUBLE), 6) + 0 AS rake_weight,
             ROUND(w, 4) + 0 AS raked_count
      FROM w2 ORDER BY segment, priority""",

    "q_offpolicy_replay" -> """
      WITH ev AS (SELECT event_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS vc,
                         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 2
                           AS half
                  FROM events),
           arms AS (SELECT event_type, CAST(SUM(vc) * 10000 // COUNT(*) AS BIGINT) AS mean_e4
                    FROM ev WHERE half = 0 GROUP BY 1),
           best AS (SELECT event_type AS best_arm FROM arms
                    ORDER BY mean_e4 DESC, event_type LIMIT 1),
           idx AS (SELECT a.event_type, CAST(COUNT(b.event_type) AS BIGINT) AS idx
                   FROM arms a LEFT JOIN arms b ON b.event_type < a.event_type
                   GROUP BY 1),
           test AS (SELECT ev.event_type, vc, best_arm,
                           CAST('0x' || substring(md5('x' || CAST(event_id AS VARCHAR)), 1, 8)
                                AS BIGINT) % 5 = 0 AS explore,
                           CAST('0x' || substring(md5('a' || CAST(event_id AS VARCHAR)), 1, 8)
                                AS BIGINT) % 5 AS rand_idx
                    FROM ev, best WHERE half = 1),
           wa AS (SELECT test.event_type, vc, best_arm,
                         CASE WHEN explore THEN idx.event_type ELSE best_arm END AS eg_action
                  FROM test JOIN idx ON test.rand_idx = idx.idx),
           g AS (SELECT 'greedy' AS policy, CAST(COUNT(*) AS BIGINT) AS n_test,
                        CAST(SUM(CASE WHEN event_type = best_arm THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_matched,
                        CAST(SUM(CASE WHEN event_type = best_arm THEN vc ELSE 0 END) AS BIGINT)
                          AS sv
                 FROM wa),
           e AS (SELECT 'egreedy_02' AS policy, CAST(COUNT(*) AS BIGINT) AS n_test,
                        CAST(SUM(CASE WHEN event_type = eg_action THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_matched,
                        CAST(SUM(CASE WHEN event_type = eg_action THEN vc ELSE 0 END) AS BIGINT)
                          AS sv
                 FROM wa),
           l AS (SELECT 'logging' AS policy, CAST(COUNT(*) AS BIGINT) AS n_test,
                        CAST(COUNT(*) AS BIGINT) AS n_matched, CAST(SUM(vc) AS BIGINT) AS sv
                 FROM wa),
           u AS (SELECT * FROM g UNION ALL SELECT * FROM e UNION ALL SELECT * FROM l)
      SELECT policy, n_test, n_matched,
             CAST(n_matched * 10000 // n_test AS BIGINT) AS match_rate_e4,
             CAST(sv * 10000 // n_matched AS BIGINT) AS est_reward_e4
      FROM u ORDER BY policy""",

    "q_periodogram" -> """
      WITH raw AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                            AS dayn,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                   FROM events GROUP BY 1),
           d0 AS (SELECT CAST(MIN(dayn) AS BIGINT) AS d0 FROM raw),
           daily AS (SELECT dayn - d0 AS t, x FROM raw, d0),
           periods AS (SELECT CAST(range AS BIGINT) AS p FROM range(2, 8)),
           pw AS (SELECT p,
                         SUM(CAST(x AS DOUBLE)
                             * cos(2.0 * 3.141592653589793 * CAST(t AS DOUBLE) / CAST(p AS DOUBLE))) AS sc,
                         SUM(CAST(x AS DOUBLE)
                             * sin(2.0 * 3.141592653589793 * CAST(t AS DOUBLE) / CAST(p AS DOUBLE))) AS ss
                  FROM daily, periods GROUP BY 1),
           pwr AS (SELECT p, sc * sc + ss * ss AS power FROM pw),
           tot AS (SELECT SUM(power) AS tp FROM pwr)
      SELECT p AS period_days, ROUND(power / tp, 6) + 0 AS power_share
      FROM pwr, tot ORDER BY period_days""",

    "q_matrix_profile" -> """
      WITH raw AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                            AS dayn,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                   FROM events GROUP BY 1),
           d0 AS (SELECT CAST(MIN(dayn) AS BIGINT) AS d0, CAST(MAX(dayn) AS BIGINT) AS d1
                  FROM raw),
           daily AS (SELECT dayn - d0 AS t, x, d1 - d0 + 1 AS nd FROM raw, d0),
           wins AS (SELECT w.t, CAST(COUNT(*) AS BIGINT) AS wn, CAST(SUM(e.x) AS BIGINT) AS ws,
                           CAST(SUM(e.x * e.x) AS BIGINT) AS wq, MAX(w.nd) AS nd
                    FROM daily w JOIN daily e ON e.t BETWEEN w.t AND w.t + 4
                    GROUP BY 1),
           ok AS (SELECT t, ws, wq FROM wins WHERE wn = 5 AND t <= nd - 5),
           pr AS (SELECT a.t AS i, b.t AS j, a.ws AS wsi, a.wq AS wqi, b.ws AS wsj, b.wq AS wqj,
                         CAST(SUM(ei.x * ej.x) AS BIGINT) AS sxy
                  FROM ok a JOIN ok b ON ABS(a.t - b.t) >= 3
                  JOIN daily ei ON ei.t BETWEEN a.t AND a.t + 4
                  JOIN daily ej ON ej.t - b.t = ei.t - a.t
                  GROUP BY 1, 2, 3, 4, 5, 6),
           dist AS (SELECT i, j,
                           ROUND(SQRT(GREATEST(0.0, 2.0 * 5.0 * (1.0 -
                             (CAST(sxy AS DOUBLE) - 5.0 * (CAST(wsi AS DOUBLE) / 5.0) * (CAST(wsj AS DOUBLE) / 5.0))
                             / (5.0 * SQRT((CAST(wqi AS DOUBLE) / 5.0 - (CAST(wsi AS DOUBLE) / 5.0) * (CAST(wsi AS DOUBLE) / 5.0))
                                           * (CAST(wqj AS DOUBLE) / 5.0 - (CAST(wsj AS DOUBLE) / 5.0) * (CAST(wsj AS DOUBLE) / 5.0))))))), 4) + 0
                             AS zdist
                    FROM pr),
           best AS (SELECT i, j, zdist,
                           ROW_NUMBER() OVER (PARTITION BY i ORDER BY zdist, j) AS rn
                    FROM dist)
      SELECT i AS window_start, j AS nn_window, zdist FROM best WHERE rn = 1
      ORDER BY window_start""",

    "q_single_linkage_step" -> """
      WITH n AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label < 5),
           cross_d AS (SELECT a.label AS la, b.label AS lb,
                              CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                       FROM n a JOIN n b ON a.label < b.label),
           m AS (SELECT la, lb, CAST(MIN(d2) AS BIGINT) AS min_d2,
                        CAST(COUNT(*) AS BIGINT) AS n_pairs
                 FROM cross_d GROUP BY 1, 2),
           best AS (SELECT la AS ma, lb AS mb FROM m
                    ORDER BY min_d2, la, lb LIMIT 1)
      SELECT la, lb, min_d2, n_pairs,
             CAST(CASE WHEN la = ma AND lb = mb THEN 1 ELSE 0 END AS BIGINT) AS merges_first
      FROM m, best ORDER BY la, lb""",

    "q_fairness_audit" -> """
      WITH d AS (SELECT lang,
                        CASE WHEN len(string_split(text, ' ')) >= 30 THEN 1 ELSE 0 END AS pred,
                        CASE WHEN len(list_distinct(string_split(text, ' '))) * 2
                                  >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS label
                 FROM documents),
           per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(pred) * 10000 // COUNT(*) AS BIGINT) AS sel_rate_e4,
                          CAST(SUM(pred * label) * 10000 // SUM(label) AS BIGINT) AS tpr_e4,
                          CAST(SUM(pred * (1 - label)) * 10000 // (COUNT(*) - SUM(label))
                               AS BIGINT) AS fpr_e4
                   FROM d GROUP BY 1),
           gap AS (SELECT CAST(MAX(sel_rate_e4) - MIN(sel_rate_e4) AS BIGINT) AS dp_gap_e4
                   FROM per)
      SELECT lang, n, sel_rate_e4, tpr_e4, fpr_e4, dp_gap_e4 FROM per, gap ORDER BY lang""",

    "q_emd_drift" -> """
      WITH b AS (SELECT CAST(ROUND(value*100) AS BIGINT) // 100 AS bin,
                        CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                                      THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                        CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                                      THEN 0 ELSE 1 END) AS BIGINT) AS cb
                 FROM events GROUP BY 1),
           cum AS (SELECT t.bin, CAST(SUM(p.ca) AS BIGINT) AS cuma,
                          CAST(SUM(p.cb) AS BIGINT) AS cumb
                   FROM b t JOIN b p ON p.bin <= t.bin GROUP BY 1),
           tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM b)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_bins, MAX(na) AS n_first, MAX(nb) AS n_second,
             ROUND(CAST(SUM(ABS(cuma * nb - cumb * na)) AS DOUBLE)
                   / (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)), 6) + 0 AS emd_bins
      FROM cum, tot""",

    "q_rank_biased_overlap" -> """
      WITH g AS (SELECT p_brand AS brand,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           ra AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS ra
                  FROM g a LEFT JOIN g b
                    ON b.rev > a.rev OR (b.rev = a.rev AND b.brand < a.brand)
                  GROUP BY 1),
           rb AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS rb
                  FROM g a LEFT JOIN g b
                    ON b.qty > a.qty OR (b.qty = a.qty AND b.brand < a.brand)
                  GROUP BY 1),
           ranks AS (SELECT ra.brand, ra, rb FROM ra JOIN rb ON ra.brand = rb.brand),
           depths AS (SELECT CAST(range AS BIGINT) AS d FROM range(1, 26)),
           ov AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS ov FROM ranks, depths
                  WHERE ra <= d AND rb <= d GROUP BY 1),
           terms AS (SELECT d, ov,
                            0.1 * pow(0.9, CAST(d - 1 AS DOUBLE)) * CAST(ov AS DOUBLE)
                            / CAST(d AS DOUBLE) AS term
                     FROM ov)
      SELECT ROUND(SUM(term), 6) + 0 AS rbo_p09, CAST(SUM(ov) AS BIGINT) AS ov_total
      FROM terms""",

    "q_successive_halving" -> """
      WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                        CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS y,
                        CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '#'
                          || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS half
                 FROM lineitem),
           configs AS (SELECT CAST(range * 5 AS BIGINT) AS t FROM range(1, 9)),
           r1 AS (SELECT t, CAST(SUM(CASE WHEN (CASE WHEN q <= t THEN 1 ELSE 0 END) = y
                                          THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
                         AS acc1_e6
                  FROM d, configs WHERE half = 0 GROUP BY 1),
           pr AS (SELECT a.t, a.acc1_e6, CAST(COUNT(b.t) AS BIGINT) AS n_better
                  FROM r1 a LEFT JOIN r1 b
                    ON b.acc1_e6 > a.acc1_e6 OR (b.acc1_e6 = a.acc1_e6 AND b.t < a.t)
                  GROUP BY 1, 2),
           r2 AS (SELECT t, CAST(SUM(CASE WHEN (CASE WHEN q <= t THEN 1 ELSE 0 END) = y
                                          THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
                         AS acc2_e6
                  FROM d, configs GROUP BY 1)
      SELECT pr.t AS threshold, acc1_e6,
             CAST(CASE WHEN n_better < 4 THEN 1 ELSE 0 END AS BIGINT) AS survived,
             CASE WHEN n_better < 4 THEN r2.acc2_e6 ELSE -1 END AS acc2_e6
      FROM pr JOIN r2 ON pr.t = r2.t ORDER BY threshold""",

    "q_pacf" -> """
      WITH raw AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                            AS t,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                   FROM events GROUP BY 1),
           base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
                           CAST(SUM(x*x) AS BIGINT) AS q FROM raw),
           l1 AS (SELECT CAST(SUM(a.x * b.x) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n1,
                         CAST(SUM(a.x) AS BIGINT) AS sa1, CAST(SUM(b.x) AS BIGINT) AS sb1
                  FROM raw a JOIN raw b ON b.t = a.t + 1),
           l2 AS (SELECT CAST(SUM(a.x * b.x) AS BIGINT) AS c2, CAST(COUNT(*) AS BIGINT) AS n2,
                         CAST(SUM(a.x) AS BIGINT) AS sa2, CAST(SUM(b.x) AS BIGINT) AS sb2
                  FROM raw a JOIN raw b ON b.t = a.t + 2),
           r AS (SELECT n AS n_days,
                        (CAST(c1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS r1,
                        (CAST(c2 AS DOUBLE) - CAST(sa2 AS DOUBLE) * CAST(sb2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                        / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS r2
                 FROM base, l1, l2)
      SELECT n_days, ROUND(r1, 6) + 0 AS pacf_lag1,
             ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) + 0 AS pacf_lag2
      FROM r""",

    "q_burrows_delta" -> """
      WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
           topw AS (SELECT w FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1)
                    ORDER BY c DESC, w LIMIT 20),
           st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nt FROM toks GROUP BY 1),
           sh AS (SELECT toks.source, toks.w, CAST(COUNT(*) * 1000000 // MAX(nt) AS BIGINT)
                           AS sh_e6
                  FROM toks JOIN topw ON toks.w = topw.w
                  JOIN st ON toks.source = st.source
                  GROUP BY 1, 2),
           ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(sh_e6) AS BIGINT) AS ss,
                         CAST(SUM(sh_e6 * sh_e6) AS BIGINT) AS qq
                  FROM sh GROUP BY 1),
           z AS (SELECT source, sh.w,
                        (CAST(sh_e6 AS DOUBLE) - CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE))
                        / SQRT((CAST(qq AS DOUBLE) - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE))
                               / CAST(ns - 1 AS DOUBLE)) AS z
                 FROM sh JOIN ws ON sh.w = ws.w),
           z0 AS (SELECT w, z AS z0 FROM z WHERE source = 'src0')
      SELECT z.source, CAST(COUNT(*) AS BIGINT) AS n_words,
             ROUND(AVG(ABS(z - z0)), 4) + 0 AS delta
      FROM z JOIN z0 ON z.w = z0.w WHERE z.source <> 'src0'
      GROUP BY 1 ORDER BY 1""",

    "q_df_pruning" -> """
      WITH df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM
                    (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents)
                  GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS v0, CAST(SUM(df) AS BIGINT) AS p0 FROM df),
           ts AS (SELECT CAST(range AS BIGINT) AS min_df FROM range(1, 6))
      SELECT min_df, CAST(COUNT(*) AS BIGINT) AS vocab, CAST(SUM(df) AS BIGINT) AS postings,
             CAST(COUNT(*) * 10000 // MAX(v0) AS BIGINT) AS vocab_kept_e4,
             CAST(SUM(df) * 10000 // MAX(p0) AS BIGINT) AS postings_kept_e4
      FROM df, tot, ts WHERE df >= min_df GROUP BY 1 ORDER BY 1""",

    "q_largest_remainder" -> """
      WITH g AS (SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS ni
                 FROM customer GROUP BY 1),
           tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS n FROM g),
           q AS (SELECT segment, ni, CAST(ni * 1000 // n AS BIGINT) AS floor_seats,
                        CAST((ni * 1000) % n AS BIGINT) AS rem
                 FROM g, tot),
           used AS (SELECT CAST(SUM(floor_seats) AS BIGINT) AS used FROM q),
           rk AS (SELECT a.segment, a.ni, a.floor_seats, a.rem,
                         CAST(COUNT(b.segment) AS BIGINT) AS rk
                  FROM q a LEFT JOIN q b
                    ON b.rem > a.rem OR (b.rem = a.rem AND b.segment < a.segment)
                  GROUP BY 1, 2, 3, 4)
      SELECT segment, ni, floor_seats,
             CAST(CASE WHEN rk < 1000 - used THEN 1 ELSE 0 END AS BIGINT) AS extra_seat,
             floor_seats + (CASE WHEN rk < 1000 - used THEN 1 ELSE 0 END) AS seats
      FROM rk, used ORDER BY segment""",

    "q_negative_sampling" -> """
      WITH freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM
                      (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
                    GROUP BY 1),
           tot AS (SELECT SUM(pow(CAST(c AS DOUBLE), 0.75)) AS z FROM freq)
      SELECT w, c, ROUND(pow(CAST(c AS DOUBLE), 0.75) / z, 6) + 0 AS p_neg,
             ROUND(10000.0 * pow(CAST(c AS DOUBLE), 0.75) / z, 2) + 0 AS draws_per_10k
      FROM freq, tot ORDER BY c DESC, w LIMIT 20""",

    "q_minibatch_balance" -> """
      WITH d AS (SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 16
                          AS batch, lang
                 FROM documents),
           global AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS gc FROM d GROUP BY 1),
           gtot AS (SELECT CAST(SUM(gc) AS BIGINT) AS gn FROM global),
           per AS (SELECT batch, lang, CAST(COUNT(*) AS BIGINT) AS bc FROM d GROUP BY 1, 2),
           btot AS (SELECT batch, CAST(SUM(bc) AS BIGINT) AS bn FROM per GROUP BY 1),
           terms AS (SELECT per.batch, bn,
                            (CAST(bc AS DOUBLE) / CAST(bn AS DOUBLE))
                            * ln((CAST(bc AS DOUBLE) / CAST(bn AS DOUBLE))
                                 / (CAST(gc AS DOUBLE) / CAST(gn AS DOUBLE))) AS term
                     FROM per JOIN btot ON per.batch = btot.batch
                     JOIN global ON per.lang = global.lang, gtot)
      SELECT batch, MAX(bn) AS n_docs, ROUND(SUM(term), 6) + 0 AS kl_vs_corpus
      FROM terms GROUP BY 1 ORDER BY 1""",

    "q_ucb_allocation" -> """
      WITH arms AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ni,
                           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS si
                    FROM events GROUP BY 1),
           tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS n FROM arms),
           idx AS (SELECT event_type, ni,
                          ROUND(CAST(si AS DOUBLE) / CAST(ni AS DOUBLE), 4) + 0 AS mean_cents,
                          ROUND(CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)
                                + 24500.0 * SQRT(2.0 * ln(CAST(n AS DOUBLE)) / CAST(ni AS DOUBLE)), 4) + 0
                            AS ucb_index
                   FROM arms, tot)
      SELECT a.event_type, a.ni AS n_pulls, a.mean_cents, a.ucb_index,
             CAST(COUNT(b.event_type) + 1 AS BIGINT) AS pull_priority
      FROM idx a LEFT JOIN idx b
        ON b.ucb_index > a.ucb_index
        OR (b.ucb_index = a.ucb_index AND b.event_type < a.event_type)
      GROUP BY 1, 2, 3, 4 ORDER BY 1""",

    "q_holm_correction" -> """
      WITH g AS (SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                             AS BIGINT) AS s
                 FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
           tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts FROM g),
           stat AS (SELECT segment,
                           (CAST(s AS DOUBLE) - CAST(n AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
                           * (CAST(s AS DOUBLE) - CAST(n AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
                           * (1.0 / (CAST(n AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
                              + 1.0 / (CAST(n AS DOUBLE) * (1.0 - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))))
                             AS chi2
                    FROM g, tot),
           rk AS (SELECT a.segment, a.chi2, CAST(COUNT(b.segment) + 1 AS BIGINT) AS rk
                  FROM stat a LEFT JOIN stat b
                    ON b.chi2 > a.chi2 OR (b.chi2 = a.chi2 AND b.segment < a.segment)
                  GROUP BY 1, 2),
           crit AS (SELECT segment, chi2, rk,
                           CASE rk WHEN 1 THEN 6.6349 WHEN 2 THEN 6.2385 WHEN 3 THEN 5.7305
                                   WHEN 4 THEN 5.0239 ELSE 3.8415 END AS crit,
                           CASE WHEN chi2 > (CASE rk WHEN 1 THEN 6.6349 WHEN 2 THEN 6.2385
                                             WHEN 3 THEN 5.7305 WHEN 4 THEN 5.0239
                                             ELSE 3.8415 END) THEN 1 ELSE 0 END AS passes
                    FROM rk)
      SELECT a.segment, ROUND(a.chi2, 4) + 0 AS chi2, a.rk AS holm_rank,
             a.crit AS crit_value, CAST(MIN(b.passes) AS BIGINT) AS rejected
      FROM crit a JOIN crit b ON b.rk <= a.rk
      GROUP BY 1, 2, 3, 4 ORDER BY holm_rank""",

    "q_decision_curve" -> """
      WITH d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ny,
                        CAST(SUM(CASE WHEN l_quantity <= 25.0 AND l_returnflag = 'A'
                                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                        CAST(SUM(CASE WHEN l_quantity <= 25.0 AND l_returnflag <> 'A'
                                      THEN 1 ELSE 0 END) AS BIGINT) AS fp
                 FROM lineitem),
           ts AS (SELECT CAST(range AS DOUBLE) / 10.0 AS t FROM range(1, 6))
      SELECT t, n, tp, fp,
             ROUND(CAST(tp AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST(fp AS DOUBLE) / CAST(n AS DOUBLE) * t / (1.0 - t), 6) + 0
               AS net_benefit_model,
             ROUND(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)
                   - (1.0 - CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)) * t / (1.0 - t), 6) + 0
               AS net_benefit_treat_all
      FROM d, ts ORDER BY t""",

    "q_tail_dependence" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS v
                     FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2),
           wide AS (SELECT day, MAX(CASE WHEN event_type = 'view' THEN v END) AS x,
                           MAX(CASE WHEN event_type = 'purchase' THEN v END) AS y
                    FROM daily GROUP BY 1),
           w2 AS (SELECT * FROM wide WHERE x IS NOT NULL AND y IS NOT NULL),
           qs AS (SELECT quantile_cont(x, 0.8) AS qx, quantile_cont(y, 0.8) AS qy FROM w2)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > qx THEN 1 ELSE 0 END) AS BIGINT) AS n_x_hi,
             CAST(SUM(CASE WHEN CAST(y AS DOUBLE) > qy THEN 1 ELSE 0 END) AS BIGINT) AS n_y_hi,
             CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > qx AND CAST(y AS DOUBLE) > qy
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both_hi,
             ROUND(CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > qx AND CAST(y AS DOUBLE) > qy
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(CASE WHEN CAST(x AS DOUBLE) > qx THEN 1 ELSE 0 END) AS DOUBLE), 6) + 0
               AS lambda_upper
      FROM w2, qs""",

    "q_granger_test" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS t,
                            CAST(SUM(CASE WHEN event_type = 'purchase'
                                          THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END)
                                 AS BIGINT) AS y,
                            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
                              AS x
                     FROM events GROUP BY 1),
           tri AS (SELECT a.y, b.y AS yl, b.x AS xl FROM daily a
                   JOIN daily b ON b.t = a.t - 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(yl) AS BIGINT) AS s1, CAST(SUM(xl) AS BIGINT) AS s2,
                        CAST(SUM(yl*yl) AS BIGINT) AS s11, CAST(SUM(xl*xl) AS BIGINT) AS s22,
                        CAST(SUM(yl*xl) AS BIGINT) AS s12, CAST(SUM(yl*y) AS BIGINT) AS s1y,
                        CAST(SUM(xl*y) AS BIGINT) AS s2y, SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM tri),
           c AS (SELECT n AS n_days,
                        CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
                        CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
                        CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
                        CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
                        CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
                        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
                 FROM s),
           e AS (SELECT n_days, cyy - c1y * c1y / c11 AS sse_r,
                        cyy - (c22 * c1y * c1y - 2.0 * c12 * c1y * c2y + c11 * c2y * c2y)
                        / (c11 * c22 - c12 * c12) AS sse_u
                 FROM c),
           f AS (SELECT n_days,
                        ROUND((sse_r - sse_u) / (sse_u / CAST(n_days - 3 AS DOUBLE)), 4) + 0
                          AS f_stat
                 FROM e)
      SELECT n_days, f_stat,
             CAST(CASE WHEN f_stat > 4.2 THEN 1 ELSE 0 END AS BIGINT) AS granger_significant
      FROM f""",

    "q_kendall_w" -> """
      WITH g AS (SELECT p_brand AS brand,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS m1,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS m2,
                        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS m3
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           r1 AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS r1 FROM g a
                  LEFT JOIN g b ON b.m1 > a.m1 OR (b.m1 = a.m1 AND b.brand < a.brand)
                  GROUP BY 1),
           r2 AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS r2 FROM g a
                  LEFT JOIN g b ON b.m2 > a.m2 OR (b.m2 = a.m2 AND b.brand < a.brand)
                  GROUP BY 1),
           r3 AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS r3 FROM g a
                  LEFT JOIN g b ON b.m3 > a.m3 OR (b.m3 = a.m3 AND b.brand < a.brand)
                  GROUP BY 1),
           rs AS (SELECT r1.brand, r1 + r2 + r3 AS rsum
                  FROM r1 JOIN r2 ON r1.brand = r2.brand JOIN r3 ON r1.brand = r3.brand),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rsum) AS BIGINT) AS st,
                        CAST(SUM(rsum * rsum) AS BIGINT) AS sq
                 FROM rs)
      SELECT n AS n_brands,
             ROUND(12.0 * (CAST(sq AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
                   / (9.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6) + 0
               AS kendall_w
      FROM t""",

    "q_jackknife_se" -> """
      WITH blocks AS (SELECT CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                               AS BIGINT) % 10 AS blk,
                             CAST(COUNT(*) AS BIGINT) AS nb,
                             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sb
                      FROM orders GROUP BY 1),
           tot AS (SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(sb) AS BIGINT) AS s,
                          CAST(COUNT(*) AS BIGINT) AS g
                   FROM blocks),
           loo AS (SELECT blk,
                          (CAST(s AS DOUBLE) - CAST(sb AS DOUBLE))
                          / (CAST(n AS DOUBLE) - CAST(nb AS DOUBLE)) AS m_loo,
                          CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m_all, g
                   FROM blocks, tot)
      SELECT MAX(g) AS n_blocks, ROUND(MAX(m_all), 4) + 0 AS mean_cents,
             ROUND(SQRT((CAST(MAX(g) AS DOUBLE) - 1.0) / CAST(MAX(g) AS DOUBLE)
                        * (SUM(m_loo * m_loo) - SUM(m_loo) * SUM(m_loo) / CAST(MAX(g) AS DOUBLE))), 4) + 0
               AS jackknife_se_cents
      FROM loo""",

    "q_zone_map_pruning" -> """
      WITH pts AS (SELECT p_partkey, CAST(ROUND(p_retailprice*100) AS BIGINT) AS rc FROM part),
           mx AS (SELECT CAST(MAX(p_partkey) AS BIGINT) AS mk FROM pts),
           filed AS (SELECT LEAST(15, p_partkey * 16 // (mk + 1)) AS f, rc FROM pts, mx),
           zones AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n_rows,
                            CAST(MIN(rc) AS BIGINT) AS zmin, CAST(MAX(rc) AS BIGINT) AS zmax,
                            CAST(SUM(CASE WHEN rc BETWEEN 100000 AND 120000
                                          THEN 1 ELSE 0 END) AS BIGINT) AS n_match
                     FROM filed GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_files, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
             CAST(SUM(n_match) AS BIGINT) AS n_match_rows,
             CAST(SUM(CASE WHEN zmax >= 100000 AND zmin <= 120000 THEN 1 ELSE 0 END) AS BIGINT)
               AS files_kept_by_zonemap,
             CAST(SUM(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS files_with_matches,
             CAST(SUM(CASE WHEN zmax >= 100000 AND zmin <= 120000 THEN 1 ELSE 0 END)
                  - SUM(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT) AS false_keeps
      FROM zones""",

    "q_etl_reconciliation" -> """
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS lineitem_rows,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM orders)) AS after_orders_join,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
                AND l_partkey IN (SELECT p_partkey FROM part)) AS after_part_join,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS dropped_no_order,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
              WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS dropped_no_part,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
              WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
               AS orders_without_lines,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
               - (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                  WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
                    AND l_partkey IN (SELECT p_partkey FROM part)) AS total_dropped""",

    "q_golden_record" -> """
      WITH fp AS (SELECT doc_id, lang, source, n_chars,
                         md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bow_fp
                  FROM documents),
           marked AS (SELECT doc_id, lang, bow_fp,
                             ROW_NUMBER() OVER (PARTITION BY bow_fp
                               ORDER BY n_chars DESC, doc_id) AS rn
                      FROM fp),
           groups AS (SELECT bow_fp, CAST(COUNT(*) AS BIGINT) AS n_members,
                             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
                      FROM fp GROUP BY 1)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_golden,
             CAST(SUM(n_members - 1) AS BIGINT) AS n_absorbed,
             CAST(SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mixed_lang_groups,
             CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mixed_source_groups
      FROM marked JOIN groups ON marked.bow_fp = groups.bow_fp
      WHERE rn = 1 GROUP BY 1 ORDER BY 1""",

    "q_page_hinkley" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS t,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                     FROM events GROUP BY 1),
           prefix AS (SELECT a.t, a.x,
                             CAST(a.x AS DOUBLE) - CAST(SUM(b.x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                               - 10000.0 AS term
                      FROM daily a JOIN daily b ON b.t <= a.t GROUP BY 1, 2),
           ph AS (SELECT a.t, a.x, SUM(b.term) AS ph
                  FROM prefix a JOIN prefix b ON b.t <= a.t GROUP BY 1, 2),
           al AS (SELECT a.t, a.x, a.ph, MIN(b.ph) AS phmin
                  FROM ph a JOIN ph b ON b.t <= a.t GROUP BY 1, 2, 3)
      SELECT t AS day_index, x AS revenue_cents, ROUND(ph, 4) + 0 AS ph_stat,
             CAST(CASE WHEN ph - phmin > 500000.0 THEN 1 ELSE 0 END AS BIGINT) AS alarm
      FROM al ORDER BY day_index""",

    "q_icc" -> """
      WITH g AS (SELECT o_custkey AS c, CAST(COUNT(*) AS BIGINT) AS ni,
                        CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS si,
                        SUM(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS HUGEINT)
                            * CAST(ROUND(o_totalprice*100) AS BIGINT)) AS qi
                 FROM orders GROUP BY 1 HAVING COUNT(*) >= 2),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ni) AS BIGINT) AS n,
                        CAST(SUM(si) AS BIGINT) AS s, SUM(CAST(qi AS DOUBLE)) AS q,
                        SUM(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)) AS bsum,
                        SUM(CAST(ni AS DOUBLE) * CAST(ni AS DOUBLE)) AS nsq
                 FROM g),
           d AS (SELECT k AS n_customers, n AS n_orders,
                        (bsum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(k - 1 AS DOUBLE) AS msb,
                        (q - bsum) / CAST(n - k AS DOUBLE) AS msw,
                        (CAST(n AS DOUBLE) - nsq / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE) AS k0
                 FROM s)
      SELECT n_customers, n_orders,
             ROUND((msb - msw) / (msb + (k0 - 1.0) * msw), 6) + 0 AS icc
      FROM d""",

    "q_forecast_combo" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS t,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                     FROM events GROUP BY 1),
           tri AS (SELECT a.x, a.x - b.x AS e1, a.x - c.x AS e7
                   FROM daily a JOIN daily b ON b.t = a.t - 1
                   JOIN daily c ON c.t = a.t - 7),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(e1*e1) AS BIGINT) AS sse1,
                        CAST(SUM(e7*e7) AS BIGINT) AS sse7, CAST(SUM(e1*e7) AS BIGINT) AS se17
                 FROM tri),
           w AS (SELECT n AS n_days, sse1, sse7, se17,
                        CAST(sse7 AS DOUBLE) / (CAST(sse1 AS DOUBLE) + CAST(sse7 AS DOUBLE)) AS w1
                 FROM s)
      SELECT n_days, sse1, sse7, ROUND(w1, 6) + 0 AS weight_lag1,
             ROUND((w1 * w1 * CAST(sse1 AS DOUBLE)
                    + (1.0 - w1) * (1.0 - w1) * CAST(sse7 AS DOUBLE)
                    + 2.0 * w1 * (1.0 - w1) * CAST(se17 AS DOUBLE)) / CAST(n_days AS DOUBLE), 4) + 0
               AS mse_combo
      FROM w""",

    "q_capture_recapture" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
           w1 AS (SELECT DISTINCT user_id FROM ev
                  WHERE day BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'),
           w2 AS (SELECT DISTINCT user_id FROM ev
                  WHERE day BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'),
           c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w1) AS n1,
                        (SELECT CAST(COUNT(*) AS BIGINT) FROM w2) AS n2,
                        (SELECT CAST(COUNT(*) AS BIGINT) FROM w1 JOIN w2 USING (user_id)) AS m,
                        (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev) AS true_users)
      SELECT n1, n2, m, true_users, CAST(n1 * n2 // m AS BIGINT) AS lincoln_petersen,
             CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman
      FROM c""",

    "q_stationary_tiers" -> """
      WITH weekly AS (SELECT user_id,
                             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
                             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS v
                      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
           tiers AS (SELECT user_id, wk,
                            CASE WHEN v < 100000 THEN 0 WHEN v < 300000 THEN 1
                                 WHEN v < 600000 THEN 2 ELSE 3 END AS tier
                     FROM weekly),
           trans AS (SELECT a.tier AS src, b.tier AS dst, CAST(COUNT(*) AS BIGINT) AS c
                     FROM tiers a JOIN tiers b
                       ON a.user_id = b.user_id AND b.wk = a.wk + 1
                     GROUP BY 1, 2),
           rt AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rt FROM trans GROUP BY 1),
           states AS (SELECT DISTINCT s FROM
                        (SELECT src AS s FROM trans UNION ALL SELECT dst FROM trans)),
           k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
           pi0 AS (SELECT s, CAST(1000000000000 // k AS BIGINT) AS p FROM states, k),
           pi1 AS (SELECT st.s, COALESCE(x.pn, 0) AS p FROM states st LEFT JOIN
                     (SELECT t.dst AS s, CAST(SUM((pi0.p * t.c) // rt.rt) AS BIGINT) AS pn
                      FROM pi0 JOIN rt ON pi0.s = rt.src JOIN trans t ON pi0.s = t.src
                      GROUP BY 1) x ON st.s = x.s),
           pi2 AS (SELECT st.s, COALESCE(x.pn, 0) AS p FROM states st LEFT JOIN
                     (SELECT t.dst AS s, CAST(SUM((pi1.p * t.c) // rt.rt) AS BIGINT) AS pn
                      FROM pi1 JOIN rt ON pi1.s = rt.src JOIN trans t ON pi1.s = t.src
                      GROUP BY 1) x ON st.s = x.s),
           pi3 AS (SELECT st.s, COALESCE(x.pn, 0) AS p FROM states st LEFT JOIN
                     (SELECT t.dst AS s, CAST(SUM((pi2.p * t.c) // rt.rt) AS BIGINT) AS pn
                      FROM pi2 JOIN rt ON pi2.s = rt.src JOIN trans t ON pi2.s = t.src
                      GROUP BY 1) x ON st.s = x.s)
      SELECT s AS tier, CAST(p // 1000000 AS BIGINT) AS share_e6 FROM pi3 ORDER BY tier""",

    "q_good_turing" -> """
      WITH freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM
                      (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
                    GROUP BY 1),
           nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM freq GROUP BY 1),
           tot AS (SELECT CAST(SUM(r) AS BIGINT) AS n,
                          CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
                   FROM freq)
      SELECT a.r, a.n_r, COALESCE(b.n_r, 0) AS n_r_plus1,
             CAST((a.r + 1) * COALESCE(b.n_r, 0) * 10000 // a.n_r AS BIGINT) AS r_star_e4,
             CAST(n1 * 1000000 // n AS BIGINT) AS p0_e6
      FROM (SELECT * FROM nr ORDER BY r LIMIT 5) a
      LEFT JOIN nr b ON b.r = a.r + 1, tot
      ORDER BY a.r""",

    "q_chao1_estimate" -> """
      WITH freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM
                      (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
                    GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS v_observed,
             CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(SUM(r) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) + SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END)
                  * SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END)
                  // (2 * GREATEST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END), 1)) AS BIGINT)
               AS chao1_estimate
      FROM freq""",

    "q_gumbel_maxima" -> """
      WITH raw AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                            AS dayn,
                          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                   FROM events GROUP BY 1),
           d0 AS (SELECT CAST(MIN(dayn) AS BIGINT) AS d0 FROM raw),
           blocks AS (SELECT (dayn - d0) // 5 AS blk, CAST(MAX(x) AS BIGINT) AS mx
                      FROM raw, d0 GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(mx) AS BIGINT) AS s,
                        CAST(SUM(mx*mx) AS BIGINT) AS q
                 FROM blocks),
           d AS (SELECT nb AS n_blocks, CAST(s AS DOUBLE) / CAST(nb AS DOUBLE) AS m,
                        SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nb AS DOUBLE))
                             / CAST(nb - 1 AS DOUBLE)) AS sd
                 FROM s),
           e AS (SELECT n_blocks, m, sd, sd * 2.449489742783178 / 3.141592653589793 AS beta
                 FROM d)
      SELECT n_blocks, ROUND(m, 4) + 0 AS mean_block_max,
             ROUND(m - 0.5772156649 * beta, 4) + 0 AS gumbel_mu,
             ROUND(beta, 4) + 0 AS gumbel_beta,
             ROUND(1.0 - exp(-exp(-(1.5 * m - (m - 0.5772156649 * beta)) / beta)), 6) + 0
               AS p_exceed_150pct
      FROM e""",

    "q_mm1_queue" -> """
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(epoch_us(ts)) AS BIGINT) AS t0,
                        CAST(MAX(epoch_us(ts)) AS BIGINT) AS t1
                 FROM events WHERE event_type = 'error'),
           l AS (SELECT n AS n_errors,
                        CAST(n AS DOUBLE) * 3600000000.0 / CAST(t1 - t0 AS DOUBLE) AS lambda_hr
                 FROM s)
      SELECT n_errors, ROUND(lambda_hr, 4) + 0 AS arrivals_per_hour,
             ROUND(lambda_hr / 50.0, 6) + 0 AS rho,
             ROUND((lambda_hr / 50.0) * (lambda_hr / 50.0) / (1.0 - lambda_hr / 50.0), 6) + 0
               AS lq,
             ROUND((lambda_hr / 50.0) * (lambda_hr / 50.0) / (1.0 - lambda_hr / 50.0)
                   / lambda_hr * 60.0, 6) + 0 AS wq_minutes
      FROM l""",

    "q_session_gap_sweep" -> """
      WITH g AS (SELECT user_id,
                        epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS gap_us
                 FROM events),
           ts AS (SELECT CAST(CASE range WHEN 0 THEN 5 WHEN 1 THEN 15 WHEN 2 THEN 30
                         ELSE 60 END AS BIGINT) AS gap_min
                  FROM range(4))
      SELECT gap_min, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > gap_min * 60000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) * 10000 // SUM(CASE WHEN gap_us IS NULL OR gap_us > gap_min * 60000000
                                              THEN 1 ELSE 0 END) AS BIGINT)
               AS mean_events_per_session_e4
      FROM g, ts GROUP BY 1 ORDER BY 1""",

    "q_quantile_regression_grid" -> """
      WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y
                 FROM lineitem),
           grid AS (SELECT CAST(2000 + range * 200 AS BIGINT) AS b FROM range(10)),
           losses AS (SELECT b,
                             CAST(SUM(GREATEST((y - b * x) * 5, (y - b * x) * -5)) AS BIGINT)
                               AS loss50_x10,
                             CAST(SUM(GREATEST((y - b * x) * 9, (y - b * x) * -1)) AS BIGINT)
                               AS loss90_x10
                      FROM d, grid GROUP BY 1),
           b50 AS (SELECT '0.5' AS tau, b AS best_slope_cents, loss50_x10 AS pinball_loss_x10
                   FROM losses ORDER BY loss50_x10, b LIMIT 1),
           b90 AS (SELECT '0.9' AS tau, b AS best_slope_cents, loss90_x10 AS pinball_loss_x10
                   FROM losses ORDER BY loss90_x10, b LIMIT 1)
      SELECT * FROM b50 UNION ALL SELECT * FROM b90 ORDER BY tau""",

    "q_empirical_copula" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                            MAX(CASE WHEN event_type = 'view'
                                THEN CAST(sv AS BIGINT) END) AS x,
                            MAX(CASE WHEN event_type = 'purchase'
                                THEN CAST(sv AS BIGINT) END) AS y
                     FROM (SELECT CAST(ts AS DATE) AS ts, event_type,
                                  SUM(CAST(ROUND(value*100) AS BIGINT)) AS sv
                           FROM events WHERE event_type IN ('view', 'purchase')
                           GROUP BY 1, 2)
                     GROUP BY 1),
           d2 AS (SELECT day, x, y FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
           ranked AS (SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n0,
                             CAST(SUM(CASE WHEN b.x < a.x OR (b.x = a.x AND b.day < a.day)
                                           THEN 1 ELSE 0 END) AS BIGINT) AS rx,
                             CAST(SUM(CASE WHEN b.y < a.y OR (b.y = a.y AND b.day < a.day)
                                           THEN 1 ELSE 0 END) AS BIGINT) AS ry
                      FROM d2 a LEFT JOIN d2 b ON a.day <> b.day GROUP BY 1),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d2),
           grid AS (SELECT CAST(u.range * 25 AS BIGINT) AS u, CAST(v.range * 25 AS BIGINT) AS v
                    FROM range(1, 4) u, range(1, 4) v)
      SELECT u AS u_pct, v AS v_pct,
             CAST(SUM(CASE WHEN (rx + 1) * 100 <= u * n AND (ry + 1) * 100 <= v * n
                           THEN 1 ELSE 0 END) * 10000 // MAX(n) AS BIGINT) AS copula_e4,
             CAST(u * v AS BIGINT) AS independence_e4,
             CAST(SUM(CASE WHEN (rx + 1) * 100 <= u * n AND (ry + 1) * 100 <= v * n
                           THEN 1 ELSE 0 END) * 10000 // MAX(n) - u * v AS BIGINT) AS excess_e4
      FROM ranked, n, grid GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_binary_segmentation" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS t,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                     FROM events GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
                          CAST(SUM(x*x) AS BIGINT) AS q FROM daily),
           prefix AS (SELECT a.t, CAST(COUNT(*) AS BIGINT) AS nl, CAST(SUM(b.x) AS BIGINT) AS sl,
                             CAST(SUM(b.x * b.x) AS BIGINT) AS ql
                      FROM daily a JOIN daily b ON b.t <= a.t GROUP BY 1),
           scored AS (SELECT t, nl,
                             (CAST(ql AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
                             + (CAST(q - ql AS DOUBLE) - CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                                / CAST(n - nl AS DOUBLE)) AS sse_split,
                             CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                               AS sse_total,
                             CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_left,
                             CAST(s - sl AS DOUBLE) / CAST(n - nl AS DOUBLE) AS mean_right
                      FROM prefix, tot WHERE nl < n)
      SELECT t AS split_after_day, nl AS n_left, ROUND(mean_left, 4) + 0 AS mean_left,
             ROUND(mean_right, 4) + 0 AS mean_right,
             ROUND(1.0 - sse_split / sse_total, 6) + 0 AS variance_explained
      FROM scored ORDER BY sse_split, t LIMIT 1""",

    "q_platt_step" -> """
      WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS s,
                        CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS y
                 FROM lineitem),
           a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS ss,
                        CAST(SUM(s*s) AS BIGINT) AS sq, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(s*y) AS BIGINT) AS ssy
                 FROM d),
           g AS (SELECT n AS n_rows,
                        0.5 * CAST(ss AS DOUBLE) - CAST(ssy AS DOUBLE) AS g1,
                        0.5 * CAST(n AS DOUBLE) - CAST(sy AS DOUBLE) AS g2,
                        0.25 * CAST(sq AS DOUBLE) AS h11, 0.25 * CAST(ss AS DOUBLE) AS h12,
                        0.25 * CAST(n AS DOUBLE) AS h22
                 FROM a)
      SELECT n_rows,
             ROUND(-(h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12), 6) + 0 AS delta_a,
             ROUND(-(h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12), 6) + 0 AS delta_b
      FROM g""",

    "q_alpha_spending" -> """
      WITH ev AS (SELECT user_id % 2 AS arm,
                         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
                  FROM events),
           looks AS (SELECT CAST(range AS BIGINT) AS look FROM range(4)),
           cum AS (SELECT look,
                          CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                          CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
                          CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                          CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS s0
                   FROM ev, looks WHERE wk <= look GROUP BY 1),
           z AS (SELECT look, n1, n0,
                        ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                               - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                              / SQRT((CAST(s1 + s0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                                     * (1.0 - CAST(s1 + s0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                                     * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE))), 4) + 0
                          AS z,
                        CASE look WHEN 0 THEN 4.333 WHEN 1 THEN 2.963 WHEN 2 THEN 2.359
                             ELSE 2.014 END AS obf_bound
                 FROM cum)
      SELECT look, n1, n0, z, obf_bound,
             CAST(CASE WHEN ABS(z) > obf_bound THEN 1 ELSE 0 END AS BIGINT) AS crossed
      FROM z ORDER BY look""",

    "q_weiszfeld_step" -> """
      WITH pts AS (SELECT CAST(x AS DOUBLE) AS px,
                          CAST(sy AS DOUBLE) / CAST(w AS DOUBLE) / 100.0 AS py, w
                   FROM (SELECT CAST(l_quantity AS BIGINT) AS x, CAST(COUNT(*) AS BIGINT) AS w,
                                CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                                  AS sy
                         FROM lineitem GROUP BY 1)),
           c0 AS (SELECT SUM(px * CAST(w AS DOUBLE)) / SUM(CAST(w AS DOUBLE)) AS cx0,
                         SUM(py * CAST(w AS DOUBLE)) / SUM(CAST(w AS DOUBLE)) AS cy0
                  FROM pts),
           st AS (SELECT MAX(cx0) AS cx0, MAX(cy0) AS cy0,
                         SUM(px * (CAST(w AS DOUBLE)
                           / SQRT((px - cx0) * (px - cx0) + (py - cy0) * (py - cy0))))
                         / SUM(CAST(w AS DOUBLE)
                           / SQRT((px - cx0) * (px - cx0) + (py - cy0) * (py - cy0))) AS cx1,
                         SUM(py * (CAST(w AS DOUBLE)
                           / SQRT((px - cx0) * (px - cx0) + (py - cy0) * (py - cy0))))
                         / SUM(CAST(w AS DOUBLE)
                           / SQRT((px - cx0) * (px - cx0) + (py - cy0) * (py - cy0))) AS cy1
                  FROM pts, c0)
      SELECT ROUND(cx0, 4) + 0 AS centroid_x, ROUND(cy0, 4) + 0 AS centroid_y,
             ROUND(cx1, 4) + 0 AS weiszfeld_x, ROUND(cy1, 4) + 0 AS weiszfeld_y,
             ROUND(SQRT((cx1 - cx0) * (cx1 - cx0) + (cy1 - cy0) * (cy1 - cy0)), 4) + 0 AS shift
      FROM st""",

    "q_rolling_beta" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS t,
                            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
                              AS x,
                            CAST(SUM(CASE WHEN event_type = 'purchase'
                                          THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END)
                                 AS BIGINT) AS y
                     FROM events GROUP BY 1),
           w AS (SELECT a.t, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(b.x) AS BIGINT) AS sx,
                        CAST(SUM(b.y) AS BIGINT) AS sy, CAST(SUM(b.x * b.y) AS BIGINT) AS sxy,
                        CAST(SUM(b.x * b.x) AS BIGINT) AS sxx
                 FROM daily a JOIN daily b ON b.t BETWEEN a.t - 9 AND a.t GROUP BY 1)
      SELECT t AS day_index,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) + 0
               AS rolling_beta
      FROM w WHERE n = 10 ORDER BY day_index""",

    "q_risk_pooling" -> """
      WITH weekly AS (SELECT p_brand AS brand,
                             date_diff('day', DATE '1970-01-01',
                               CAST(date_trunc('week', l_shipdate) AS DATE)) // 7 AS wk,
                             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS u
                      FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
           pb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_brands, SUM(sd) AS sum_sd FROM
                    (SELECT brand,
                            SQRT((CAST(SUM(u*u) AS DOUBLE)
                                  - CAST(SUM(u) AS DOUBLE) * CAST(SUM(u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                                 / CAST(COUNT(*) - 1 AS DOUBLE)) AS sd
                     FROM weekly GROUP BY 1)),
           pl AS (SELECT SQRT((CAST(SUM(u*u) AS DOUBLE)
                               - CAST(SUM(u) AS DOUBLE) * CAST(SUM(u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                              / CAST(COUNT(*) - 1 AS DOUBLE)) AS pooled_sd FROM
                    (SELECT wk, CAST(SUM(u) AS BIGINT) AS u FROM weekly GROUP BY 1))
      SELECT n_brands, ROUND(sum_sd, 4) + 0 AS sum_brand_sd,
             ROUND(pooled_sd, 4) + 0 AS pooled_sd,
             ROUND((sum_sd - pooled_sd) / sum_sd, 6) + 0 AS pooling_benefit
      FROM pb, pl""",

    "q_price_indices" -> """
      WITH y0 AS (SELECT l_partkey,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                              // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p1996,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1996
                  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
           y1 AS (SELECT l_partkey,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                              // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p1997,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1997
                  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1),
           j AS (SELECT y0.l_partkey, p1996, q1996, p1997, q1997
                 FROM y0 JOIN y1 ON y0.l_partkey = y1.l_partkey),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                        CAST(SUM(p1996 * q1996) AS BIGINT) AS p0q0,
                        CAST(SUM(p1997 * q1996) AS BIGINT) AS p1q0,
                        CAST(SUM(p1996 * q1997) AS BIGINT) AS p0q1,
                        CAST(SUM(p1997 * q1997) AS BIGINT) AS p1q1
                 FROM j),
           e AS (SELECT n_parts, CAST(p1q0 * 10000 // p0q0 AS BIGINT) AS laspeyres_e4,
                        CAST(p1q1 * 10000 // p0q1 AS BIGINT) AS paasche_e4
                 FROM s)
      SELECT n_parts, laspeyres_e4, paasche_e4,
             ROUND(SQRT(CAST(laspeyres_e4 AS DOUBLE) * CAST(paasche_e4 AS DOUBLE)), 4) + 0
               AS fisher_e4
      FROM e""",

    "q_join_order_choice" -> """
      WITH st AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS nl,
                         (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS dlo,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS no,
                         (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS doo,
                         (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders) AS doc,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS nc,
                         (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer) AS dcc,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem JOIN orders
                            ON l_orderkey = o_orderkey) AS act_lo,
                         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders JOIN customer
                            ON o_custkey = c_custkey) AS act_oc),
           e AS (SELECT CAST(CAST(nl AS HUGEINT) * no // GREATEST(dlo, doo) AS BIGINT)
                          AS est_lo_first,
                        CAST(CAST(no AS HUGEINT) * nc // GREATEST(doc, dcc) AS BIGINT)
                          AS est_oc_first,
                        act_lo AS actual_lo, act_oc AS actual_oc
                 FROM st)
      SELECT est_lo_first, est_oc_first, actual_lo, actual_oc,
             CASE WHEN est_oc_first < est_lo_first THEN 'orders_customer_first'
                  ELSE 'lineitem_orders_first' END AS chosen_order
      FROM e""",

    "q_lasso_step" -> """
      WITH d AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                        CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y
                 FROM lineitem),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                        CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*y) AS DOUBLE)
                          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) AS rho,
                        CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
                          - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) AS cxx
                 FROM d),
           lam AS (SELECT CASE range WHEN 0 THEN 0.25 ELSE 0.75 END AS lam_share
                   FROM range(2))
      SELECT n_rows, lam_share, ROUND(rho / cxx, 6) + 0 AS beta_ols,
             ROUND(CASE WHEN rho > lam_share * ABS(rho)
                        THEN (rho - lam_share * ABS(rho)) / cxx
                        WHEN rho < -lam_share * ABS(rho)
                        THEN (rho + lam_share * ABS(rho)) / cxx
                        ELSE 0.0 END, 6) + 0 AS beta_lasso
      FROM s, lam ORDER BY lam_share""",

    "q_uplift_quartiles" -> """
      WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act,
                        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                          AS np,
                        user_id % 2 AS arm
                 FROM events GROUP BY 1),
           rk AS (SELECT a.user_id, a.act, a.np, a.arm, CAST(COUNT(b.user_id) AS BIGINT) AS rk
                  FROM u a LEFT JOIN u b
                    ON b.act < a.act OR (b.act = a.act AND b.user_id < a.user_id)
                  GROUP BY 1, 2, 3, 4),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
           q AS (SELECT LEAST(3, rk * 4 // n) AS quartile, arm, np FROM rk, n)
      SELECT quartile,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
             CAST(SUM(CASE WHEN arm = 1 THEN np ELSE 0 END) * 10000
                  // GREATEST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 1) AS BIGINT)
               AS rate_treat_e4,
             CAST(SUM(CASE WHEN arm = 0 THEN np ELSE 0 END) * 10000
                  // GREATEST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 1) AS BIGINT)
               AS rate_ctrl_e4,
             CAST(SUM(CASE WHEN arm = 1 THEN np ELSE 0 END) * 10000
                  // GREATEST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 1)
                  - SUM(CASE WHEN arm = 0 THEN np ELSE 0 END) * 10000
                  // GREATEST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 1) AS BIGINT)
               AS uplift_e4
      FROM q GROUP BY 1 ORDER BY 1""",

    "q_exposure_fairness" -> """
      WITH g AS (SELECT p_brand AS brand,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           ranked AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS rnk
                      FROM g a LEFT JOIN g b
                        ON b.rev > a.rev OR (b.rev = a.rev AND b.brand < a.brand)
                      GROUP BY 1),
           e AS (SELECT brand, rnk,
                        CAST(string_split(brand, '#')[2] AS BIGINT) % 2 AS grp,
                        1.0 / (ln(CAST(rnk + 1 AS DOUBLE)) / ln(2.0)) AS exposure
                 FROM ranked),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, SUM(exposure) AS te FROM e)
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_brands,
             ROUND(SUM(exposure / te), 6) + 0 AS exposure_share,
             ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(nb) AS DOUBLE), 6) + 0 AS item_share
      FROM e, tot GROUP BY 1 ORDER BY 1""",

    "q_enrichment_test" -> """
      WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                         CAST(SUM(CASE WHEN w = 'fast' THEN 1 ELSE 0 END) AS BIGINT) AS kk,
                         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                         CAST(SUM(CASE WHEN lang = 'en' AND w = 'fast' THEN 1 ELSE 0 END)
                              AS BIGINT) AS k_en
                  FROM toks)
      SELECT nn AS corpus_tokens, kk AS corpus_fast, n_en AS en_tokens, k_en AS en_fast,
             ROUND((CAST(k_en AS DOUBLE) - CAST(n_en AS DOUBLE) * CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
                   / SQRT(CAST(n_en AS DOUBLE) * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
                          * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))
                          * (CAST(nn - n_en AS DOUBLE) / CAST(nn - 1 AS DOUBLE))), 4) + 0
               AS enrichment_z,
             CAST(CAST(k_en AS HUGEINT) * nn * 10000 // (CAST(n_en AS HUGEINT) * kk) AS BIGINT)
               AS fold_enrichment_e4
      FROM st""",

    "q_borda_count" -> """
      WITH g AS (SELECT p_brand AS brand,
                        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS m1,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS m2,
                        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS m3
                 FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
           r1 AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS r1 FROM g a
                  LEFT JOIN g b ON b.m1 > a.m1 OR (b.m1 = a.m1 AND b.brand < a.brand)
                  GROUP BY 1),
           r2 AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS r2 FROM g a
                  LEFT JOIN g b ON b.m2 > a.m2 OR (b.m2 = a.m2 AND b.brand < a.brand)
                  GROUP BY 1),
           r3 AS (SELECT a.brand, CAST(COUNT(b.brand) + 1 AS BIGINT) AS r3 FROM g a
                  LEFT JOIN g b ON b.m3 > a.m3 OR (b.m3 = a.m3 AND b.brand < a.brand)
                  GROUP BY 1),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g)
      SELECT r1.brand, r1, r2, r3, n * 3 - r1 - r2 - r3 AS borda_score
      FROM r1 JOIN r2 ON r1.brand = r2.brand JOIN r3 ON r1.brand = r3.brand, n
      ORDER BY borda_score DESC, r1.brand LIMIT 10""",

    "q_k_anonymity" -> """
      WITH classes AS (SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS k,
                              CAST(COUNT(DISTINCT CASE WHEN c_acctbal >= 0.0 THEN 1 ELSE 0 END)
                                   AS BIGINT) AS l
                       FROM customer GROUP BY 1, 2)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_classes, CAST(SUM(k) AS BIGINT) AS n_rows,
             CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k,
             CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS rows_below_k5,
             CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 10000 // SUM(k) AS BIGINT)
               AS suppression_share_e4,
             CAST(MIN(l) AS BIGINT) AS min_l_diversity
      FROM classes""",

    "q_bloom_sizing" -> """
      WITH n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem),
           t AS (SELECT CASE range WHEN 0 THEN 4.605170185988091
                        ELSE 6.907755278982137 END AS neg_ln_p,
                        CASE range WHEN 0 THEN '0.01' ELSE '0.001' END AS target_fp
                 FROM range(2))
      SELECT target_fp, n AS n_keys,
             CAST(CEIL(CAST(n AS DOUBLE) * neg_ln_p / 0.4804530139182014) AS BIGINT) AS m_bits,
             CAST(ROUND(neg_ln_p / 0.6931471805599453) AS BIGINT) AS k_hashes,
             ROUND(neg_ln_p / 0.4804530139182014, 4) + 0 AS bits_per_key
      FROM n, t ORDER BY target_fp""",

    "q_design_effect" -> """
      WITH g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ni,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS si,
                        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)
                                 * CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS qi
                 FROM events GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ni) AS BIGINT) AS n,
                        CAST(SUM(si) AS BIGINT) AS s, SUM(CAST(qi AS DOUBLE)) AS q,
                        SUM(CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)) AS bsum,
                        SUM(CAST(ni AS DOUBLE) * CAST(ni AS DOUBLE)) AS nsq
                 FROM g),
           d AS (SELECT k AS n_clusters, n AS n_events,
                        (bsum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(k - 1 AS DOUBLE) AS msb,
                        (q - bsum) / CAST(n - k AS DOUBLE) AS msw,
                        (CAST(n AS DOUBLE) - nsq / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE) AS k0,
                        CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS mbar
                 FROM s),
           r AS (SELECT n_clusters, n_events,
                        (msb - msw) / (msb + (k0 - 1.0) * msw) AS rho, mbar
                 FROM d)
      SELECT n_clusters, n_events, ROUND(rho, 6) + 0 AS icc_rho,
             ROUND(1.0 + (mbar - 1.0) * rho, 4) + 0 AS deff,
             ROUND(CAST(n_events AS DOUBLE) / (1.0 + (mbar - 1.0) * rho), 2) + 0
               AS effective_n
      FROM r""",

    "q_graph_robustness" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
           base AS (SELECT CAST(COUNT(*) AS BIGINT) AS e0n FROM edges),
           h10 AS (SELECT u AS hub FROM deg ORDER BY deg DESC, u LIMIT 10),
           h50 AS (SELECT u AS hub FROM deg ORDER BY deg DESC, u LIMIT 50),
           s0 AS (SELECT CAST(0 AS BIGINT) AS hubs_removed,
                         CAST(COUNT(*) AS BIGINT) AS e_kept,
                         CAST(COUNT(DISTINCT u) AS BIGINT) AS nodes_kept
                  FROM edges),
           s10 AS (SELECT CAST(10 AS BIGINT), CAST(COUNT(*) AS BIGINT),
                          CAST(COUNT(DISTINCT u) AS BIGINT)
                   FROM edges WHERE u NOT IN (SELECT hub FROM h10)
                     AND v NOT IN (SELECT hub FROM h10)),
           s50 AS (SELECT CAST(50 AS BIGINT), CAST(COUNT(*) AS BIGINT),
                          CAST(COUNT(DISTINCT u) AS BIGINT)
                   FROM edges WHERE u NOT IN (SELECT hub FROM h50)
                     AND v NOT IN (SELECT hub FROM h50)),
           u AS (SELECT * FROM s0 UNION ALL SELECT * FROM s10 UNION ALL SELECT * FROM s50)
      SELECT hubs_removed, nodes_kept, e_kept,
             CAST(e_kept * 10000 // e0n AS BIGINT) AS edges_kept_e4
      FROM u, base ORDER BY hubs_removed""",

    "q_min_variance_portfolio" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                              AS t,
                            CAST(SUM(CASE WHEN event_type = 'view'
                                          THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END)
                                 AS BIGINT) AS x,
                            CAST(SUM(CASE WHEN event_type = 'purchase'
                                          THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END)
                                 AS BIGINT) AS y
                     FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
           diffs AS (SELECT a.x - b.x AS dx, a.y - b.y AS dy
                     FROM daily a JOIN daily b ON b.t = a.t - 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dx) AS BIGINT) AS sx,
                        CAST(SUM(dy) AS BIGINT) AS sy, CAST(SUM(dx*dx) AS BIGINT) AS sxx,
                        CAST(SUM(dy*dy) AS BIGINT) AS syy, CAST(SUM(dx*dy) AS BIGINT) AS sxy
                 FROM diffs),
           v AS (SELECT n AS n_days,
                        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS v1,
                        (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS v2,
                        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS cv
                 FROM s),
           w AS (SELECT n_days, (v2 - cv) / (v1 + v2 - 2.0 * cv) AS w1, v1, v2, cv FROM v)
      SELECT n_days, ROUND(w1, 6) + 0 AS weight_view, ROUND(SQRT(v1), 4) + 0 AS sd_view,
             ROUND(SQRT(v2), 4) + 0 AS sd_purchase,
             ROUND(SQRT(w1 * w1 * v1 + (1.0 - w1) * (1.0 - w1) * v2
                        + 2.0 * w1 * (1.0 - w1) * cv), 4) + 0 AS sd_portfolio
      FROM w""",

    "q_chimerge_step" -> """
      WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS f,
                        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
                        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
                 FROM lineitem GROUP BY 1),
           p AS (SELECT a.f, a.ca + a.cn + a.cr AS n1, b.ca + b.cn + b.cr AS n2,
                        a.ca, a.cn, a.cr, b.ca AS ca2, b.cn AS cn2, b.cr AS cr2
                 FROM h a JOIN h b ON b.f = a.f + 1)
      SELECT f AS boundary_low, f + 1 AS boundary_high,
             ROUND(
               (CAST(ca AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(ca + ca2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(ca AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(ca + ca2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(ca + ca2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               + (CAST(cn AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(cn + cn2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(cn AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(cn + cn2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(cn + cn2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               + (CAST(cr AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(cr + cr2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(cr AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(cr + cr2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(cr + cr2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               + (CAST(ca2 AS DOUBLE) - CAST(n2 AS DOUBLE) * CAST(ca + ca2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(ca2 AS DOUBLE) - CAST(n2 AS DOUBLE) * CAST(ca + ca2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               / (CAST(n2 AS DOUBLE) * CAST(ca + ca2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               + (CAST(cn2 AS DOUBLE) - CAST(n2 AS DOUBLE) * CAST(cn + cn2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(cn2 AS DOUBLE) - CAST(n2 AS DOUBLE) * CAST(cn + cn2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               / (CAST(n2 AS DOUBLE) * CAST(cn + cn2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               + (CAST(cr2 AS DOUBLE) - CAST(n2 AS DOUBLE) * CAST(cr + cr2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(cr2 AS DOUBLE) - CAST(n2 AS DOUBLE) * CAST(cr + cr2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
               / (CAST(n2 AS DOUBLE) * CAST(cr + cr2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)), 4) + 0
               AS chi2
      FROM p ORDER BY chi2, boundary_low LIMIT 5""",

    "q_sign_test" -> """
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice*100) AS BIGINT) > 150000
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
                        CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice*100) AS BIGINT) < 150000
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                        CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice*100) AS BIGINT) = 150000
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_ties
                 FROM orders),
           z AS (SELECT n, n_above, n_below, n_ties,
                        ROUND((CAST(n_above AS DOUBLE) - CAST(n_below AS DOUBLE))
                              / SQRT(CAST(n_above + n_below AS DOUBLE)), 4) + 0 AS z
                 FROM s)
      SELECT n, n_above, n_below, n_ties, z,
             CAST(CASE WHEN ABS(z) > 1.96 THEN 1 ELSE 0 END AS BIGINT) AS reject_median_150k
      FROM z""",

    "q_rmst" -> """
      WITH obs AS (SELECT CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
                          AS BIGINT) AS t,
                          CASE WHEN MAX(CAST(ts AS DATE)) <= DATE '2024-01-23' THEN 1 ELSE 0 END
                            AS churned
                   FROM events GROUP BY user_id),
           byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at, CAST(SUM(churned) AS BIGINT) AS d
                   FROM obs GROUP BY 1),
           risk AS (SELECT a.t, a.d, CAST(SUM(b.n_at) AS BIGINT) AS n_risk
                    FROM byt a JOIN byt b ON b.t >= a.t GROUP BY 1, 2),
           l AS (SELECT t, CASE WHEN d > 0
                                THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                                ELSE 0.0 END AS lnterm
                 FROM risk),
           surv AS (SELECT a.t, exp(SUM(b.lnterm)) AS s
                    FROM l a JOIN l b ON b.t <= a.t GROUP BY 1),
           widths AS (SELECT a.t, a.s,
                             LEAST(COALESCE(MIN(b.t), 25), 25) - LEAST(a.t, 25) AS w
                      FROM surv a LEFT JOIN surv b ON b.t > a.t GROUP BY 1, 2),
           head AS (SELECT CAST(LEAST(MIN(t), 25) AS DOUBLE) AS area0 FROM surv),
           body AS (SELECT SUM(s * CAST(w AS DOUBLE)) AS area1, CAST(COUNT(*) AS BIGINT)
                             AS n_steps
                    FROM widths WHERE w > 0)
      SELECT n_steps, ROUND(area0 + area1, 4) + 0 AS rmst_days FROM body, head""",

    "q_mix_shift_decomposition" -> """
      WITH y0 AS (SELECT p_brand AS brand,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS r0,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q0
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE year(l_shipdate) = 1996 GROUP BY 1),
           y1 AS (SELECT p_brand AS brand,
                         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS r1,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q1
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE year(l_shipdate) = 1997 GROUP BY 1),
           j AS (SELECT y0.brand, r0, q0, r1, q1 FROM y0 JOIN y1 ON y0.brand = y1.brand),
           tot AS (SELECT CAST(SUM(q0) AS BIGINT) AS tq0, CAST(SUM(q1) AS BIGINT) AS tq1 FROM j),
           w AS (SELECT CAST(r0 // q0 AS DOUBLE) AS p0, CAST(r1 // q1 AS DOUBLE) AS p1,
                        CAST(q0 AS DOUBLE) / CAST(tq0 AS DOUBLE) AS w0,
                        CAST(q1 AS DOUBLE) / CAST(tq1 AS DOUBLE) AS w1
                 FROM j, tot),
           s AS (SELECT SUM(p0 * w0) AS mean96, SUM(p1 * w1) AS mean97,
                        SUM(w0 * (p1 - p0)) AS rate_effect, SUM(p1 * (w1 - w0)) AS mix_effect
                 FROM w)
      SELECT ROUND(mean96, 4) + 0 AS mean_unit_price96, ROUND(mean97, 4) + 0 AS mean_unit_price97,
             ROUND(rate_effect, 4) + 0 AS rate_effect, ROUND(mix_effect, 4) + 0 AS mix_effect,
             ROUND(mean97 - mean96 - rate_effect - mix_effect, 4) + 0 AS identity_check
      FROM s""",

    "q_bcubed_eval" -> """
      WITH d AS (SELECT doc_id, md5(text) AS tfp,
                        md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS pfp
                 FROM documents),
           ps AS (SELECT pfp, CAST(COUNT(*) AS BIGINT) AS np FROM d GROUP BY 1),
           ts AS (SELECT tfp, CAST(COUNT(*) AS BIGINT) AS nt FROM d GROUP BY 1),
           bs AS (SELECT pfp, tfp, CAST(COUNT(*) AS BIGINT) AS ni FROM d GROUP BY 1, 2),
           per AS (SELECT ni * 1000000 // np AS p_e6, ni * 1000000 // nt AS r_e6
                   FROM d JOIN ps USING (pfp) JOIN ts USING (tfp) JOIN bs USING (pfp, tfp))
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(p_e6) // COUNT(*) AS BIGINT) AS bcubed_precision_e6,
             CAST(SUM(r_e6) // COUNT(*) AS BIGINT) AS bcubed_recall_e6
      FROM per""",

    "q_source_valuation" -> """
      WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd,
                          CAST(SUM(n_chars) AS BIGINT) AS cs,
                          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ts
                   FROM documents GROUP BY 1),
           tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS nd_t, CAST(SUM(cs) AS BIGINT) AS cs_t,
                          CAST(SUM(ts) AS BIGINT) AS ts_t FROM per)
      SELECT source, nd AS n_docs, CAST(cs_t * 10000 // ts_t AS BIGINT) AS full_cpt_e4,
             CAST((cs_t - cs) * 10000 // (ts_t - ts) AS BIGINT) AS loo_cpt_e4,
             CAST((cs_t - cs) * 10000 // (ts_t - ts) - cs_t * 10000 // ts_t AS BIGINT)
               AS removal_delta_e4
      FROM per, tot ORDER BY source""",

    "q_negbin_fit" -> """
      WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS k FROM documents),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS s,
                        CAST(SUM(k*k) AS BIGINT) AS q FROM d),
           m AS (SELECT n AS n_docs, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                        (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n - 1 AS DOUBLE) AS v
                 FROM s)
      SELECT n_docs, ROUND(m, 4) + 0 AS mean_tokens, ROUND(v / m, 4) + 0 AS dispersion_ratio,
             ROUND(m * m / (v - m), 4) + 0 AS nb_r, ROUND(m / v, 6) + 0 AS nb_p
      FROM m""",

    "q_intrinsic_dimension" -> """
      WITH n AS (SELECT vec_id,
                        list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings WHERE label = 0),
           pairs AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                            CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2
                     FROM n a JOIN n b ON a.vec_id <> b.vec_id),
           r AS (SELECT qid, d2, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
                 FROM pairs),
           nn2 AS (SELECT qid,
                          CAST(FLOOR(ln(CAST(MIN(CASE WHEN rn = 2 THEN d2 END) AS DOUBLE)
                                        / CAST(MIN(CASE WHEN rn = 1 THEN d2 END) AS DOUBLE))
                                     * 0.5e9) AS BIGINT) AS ln_mu_e9
                   FROM r WHERE rn <= 2 GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_points, CAST(SUM(ln_mu_e9) AS BIGINT) AS sum_ln_e9,
             ROUND(CAST(COUNT(*) AS DOUBLE) * 1e9 / CAST(SUM(ln_mu_e9) AS DOUBLE), 4) + 0
               AS intrinsic_dim
      FROM nn2""",

    "q_neyman_allocation" -> """
      WITH g AS (SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS nh,
                        CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
                        SUM(CAST(CAST(ROUND(c_acctbal*100) AS BIGINT) AS HUGEINT)
                            * CAST(ROUND(c_acctbal*100) AS BIGINT)) AS q
                 FROM customer GROUP BY 1),
           w AS (SELECT segment, nh,
                        CAST(nh AS DOUBLE) * SQRT((CAST(q AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(nh AS DOUBLE))
                          / CAST(nh - 1 AS DOUBLE)) AS w
                 FROM g),
           tot AS (SELECT SUM(w) AS tw, CAST(SUM(nh) AS BIGINT) AS tn FROM w),
           alloc AS (SELECT segment, nh, CAST(nh * 1000 // tn AS BIGINT) AS proportional,
                            CAST(FLOOR(ROUND(1000.0 * w / tw, 7)) AS BIGINT) AS fl,
                            ROUND(1000.0 * w / tw, 7)
                              - FLOOR(ROUND(1000.0 * w / tw, 7)) AS rem
                     FROM w, tot),
           used AS (SELECT CAST(SUM(fl) AS BIGINT) AS used FROM alloc),
           rk AS (SELECT a.segment, a.nh, a.proportional, a.fl,
                         CAST(COUNT(b.segment) AS BIGINT) AS rk
                  FROM alloc a LEFT JOIN alloc b
                    ON b.rem > a.rem OR (b.rem = a.rem AND b.segment < a.segment)
                  GROUP BY 1, 2, 3, 4)
      SELECT segment, nh, proportional,
             fl + (CASE WHEN rk < 1000 - used THEN 1 ELSE 0 END) AS neyman_alloc
      FROM rk, used ORDER BY segment""",

    "q_discount_depth" -> """
      SELECT CAST(ROUND(l_discount*100) AS BIGINT) AS discount_pct,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l_quantity AS BIGINT)) * 10000 // COUNT(*) AS BIGINT)
               AS mean_qty_e4,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_norm_anova" -> """
      WITH x AS (SELECT CAST(label AS BIGINT) AS label,
                        CAST(FLOOR(SQRT(CAST(list_sum(list_transform(
                               list_transform(embedding,
                                 v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)),
                               q -> q*q)) AS DOUBLE)) / 10000.0) AS BIGINT) AS x
                 FROM embeddings),
           g AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(x) AS BIGINT) AS sg,
                        SUM(CAST(x AS HUGEINT) * x) AS sg2,
                        CAST(CAST(SUM(x) AS HUGEINT) * SUM(x) * 1000000 // COUNT(*) AS BIGINT)
                          AS t_e6
                 FROM x GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
                        CAST(SUM(sg) AS BIGINT) AS sx, SUM(sg2) AS sxx,
                        CAST(SUM(t_e6) AS BIGINT) AS st_e6
                 FROM g)
      SELECT k, n,
             ROUND(((CAST(st_e6 AS DOUBLE) / 1e6
                     - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
                    / (CAST(k AS DOUBLE) - 1.0))
                   / ((CAST(sxx AS DOUBLE) - CAST(st_e6 AS DOUBLE) / 1e6)
                      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 4) + 0 AS f_stat
      FROM s""",

    "q_hurst_exponent" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                            AS BIGINT) AS d,
                            CAST(COUNT(*) AS BIGINT) AS x
                     FROM events GROUP BY 1),
           scales AS (SELECT CAST(m AS BIGINT) AS m FROM (VALUES (5), (10), (15)) t(m)),
           cells AS (SELECT m, d // m AS blk, d, x FROM daily, scales),
           bs AS (SELECT m, blk, CAST(COUNT(*) AS BIGINT) AS nb,
                         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x*x) AS BIGINT) AS sxx
                  FROM cells GROUP BY 1, 2),
           bstat AS (SELECT m, blk, CAST(sx AS DOUBLE) / CAST(nb AS DOUBLE) AS mu,
                            SQRT(CAST(sxx AS DOUBLE) / CAST(nb AS DOUBLE)
                              - (CAST(sx AS DOUBLE) / CAST(nb AS DOUBLE))
                                * (CAST(sx AS DOUBLE) / CAST(nb AS DOUBLE))) AS sd
                     FROM bs WHERE nb = m),
           cum AS (SELECT a.m, a.blk, a.d, CAST(SUM(b.x) AS BIGINT) AS ps,
                          CAST(COUNT(*) AS BIGINT) AS k
                   FROM cells a JOIN cells b
                     ON b.m = a.m AND b.blk = a.blk AND b.d <= a.d
                   GROUP BY 1, 2, 3),
           cd AS (SELECT c.m, c.blk, s.sd,
                         CAST(c.ps AS DOUBLE) - CAST(c.k AS DOUBLE) * s.mu AS cd
                  FROM cum c JOIN bstat s ON s.m = c.m AND s.blk = c.blk
                  WHERE s.sd > 0),
           rs AS (SELECT m, blk, sd, MAX(cd) - MIN(cd) AS r FROM cd GROUP BY 1, 2, 3),
           rsm AS (SELECT m, AVG(r / sd) AS rs_mean, CAST(COUNT(*) AS BIGINT) AS n_blocks
                   FROM rs GROUP BY 1),
           fit AS (SELECT ROUND((CAST(COUNT(*) AS DOUBLE)
                              * SUM(ln(CAST(m AS DOUBLE)) * ln(rs_mean))
                            - SUM(ln(CAST(m AS DOUBLE))) * SUM(ln(rs_mean)))
                           / (CAST(COUNT(*) AS DOUBLE)
                              * SUM(ln(CAST(m AS DOUBLE)) * ln(CAST(m AS DOUBLE)))
                            - SUM(ln(CAST(m AS DOUBLE))) * SUM(ln(CAST(m AS DOUBLE)))), 4)
                          + 0 AS hurst
                   FROM rsm)
      SELECT m AS block_days, n_blocks, ROUND(rs_mean, 4) + 0 AS rs_mean, hurst
      FROM rsm, fit ORDER BY 1""",

    "q_adstock_decay" -> """
      WITH daily AS (SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                            AS BIGINT) AS d,
                            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                              AS BIGINT) AS x,
                            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                              AS BIGINT) AS y
                     FROM events GROUP BY 1),
           ad AS (SELECT a.d, a.x, a.y,
                         SUM(CAST(b.x AS DOUBLE) * POWER(0.5, CAST(a.d - b.d AS DOUBLE)))
                           AS adstock
                  FROM daily a JOIN daily b ON b.d BETWEEN a.d - 7 AND a.d
                  GROUP BY 1, 2, 3),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(COUNT(*) AS DOUBLE) AS n,
                        SUM(CAST(x AS DOUBLE)) AS sx, SUM(CAST(y AS DOUBLE)) AS sy,
                        SUM(adstock) AS sa,
                        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS sxy,
                        SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx,
                        SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy,
                        SUM(adstock * CAST(y AS DOUBLE)) AS say,
                        SUM(adstock * adstock) AS saa
                 FROM ad)
      SELECT n_days,
             ROUND((n * sxy - sx * sy)
               / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 4) + 0 AS corr_raw,
             ROUND((n * say - sa * sy)
               / (SQRT(n * saa - sa * sa) * SQRT(n * syy - sy * sy)), 4) + 0 AS corr_adstock
      FROM s""",

    "q_variance_ratio" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
           d1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(b.rev - a.rev) AS BIGINT) AS sd,
                         SUM(CAST(b.rev - a.rev AS DOUBLE) * CAST(b.rev - a.rev AS DOUBLE)) AS sdd
                  FROM rev a JOIN rev b ON b.m = a.m + 1),
           d4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(b.rev - a.rev) AS BIGINT) AS sd,
                         SUM(CAST(b.rev - a.rev AS DOUBLE) * CAST(b.rev - a.rev AS DOUBLE)) AS sdd
                  FROM rev a JOIN rev b ON b.m = a.m + 4),
           v AS (SELECT d1.n AS n1, d4.n AS n4,
                        d1.sdd / CAST(d1.n AS DOUBLE)
                          - (CAST(d1.sd AS DOUBLE) / CAST(d1.n AS DOUBLE))
                            * (CAST(d1.sd AS DOUBLE) / CAST(d1.n AS DOUBLE)) AS var1,
                        d4.sdd / CAST(d4.n AS DOUBLE)
                          - (CAST(d4.sd AS DOUBLE) / CAST(d4.n AS DOUBLE))
                            * (CAST(d4.sd AS DOUBLE) / CAST(d4.n AS DOUBLE)) AS var4
                 FROM d1, d4)
      SELECT n1, n4, ROUND(var4 / (4.0 * var1), 4) + 0 AS vr,
             ROUND((var4 / (4.0 * var1) - 1.0) / SQRT(3.5 / CAST(n4 AS DOUBLE)), 4) + 0 AS vr_z
      FROM v""",

    "q_ljung_box" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
           d1 AS (SELECT a.m, b.rev - a.rev AS d FROM rev a JOIN rev b ON b.m = a.m + 1),
           base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                           SUM(CAST(d AS DOUBLE) * CAST(d AS DOUBLE))
                             - (CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                               * CAST(SUM(d) AS DOUBLE) AS ss
                    FROM d1),
           lags AS (SELECT CAST(l AS BIGINT) AS lag
                    FROM (VALUES (1), (2), (3), (4), (5), (6)) t(l)),
           rho0 AS (SELECT lag, n, ss,
                           SUM((CAST(a.d AS DOUBLE) - mu) * (CAST(b.d AS DOUBLE) - mu)) AS num
                    FROM d1 a CROSS JOIN lags CROSS JOIN base
                    JOIN d1 b ON b.m = a.m + lag
                    GROUP BY 1, 2, 3),
           rho AS (SELECT lag, n, num / ss AS rho FROM rho0),
           q AS (SELECT a.lag, a.n, a.rho,
                        SUM(b.rho * b.rho / (CAST(a.n AS DOUBLE) - CAST(b.lag AS DOUBLE)))
                          AS qsum
                 FROM rho a JOIN rho b ON b.lag <= a.lag
                 GROUP BY 1, 2, 3)
      SELECT lag, n, ROUND(rho, 4) + 0 AS rho,
             ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2) * qsum, 4) + 0 AS q_stat
      FROM q ORDER BY lag""",

    "q_durbin_watson" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar
                   FROM rev),
           resid AS (SELECT m, n,
                            CAST(rev AS DOUBLE) - ybar - b * (CAST(m AS DOUBLE) - tbar) AS e
                     FROM rev, fit),
           num AS (SELECT SUM((b.e - a.e) * (b.e - a.e)) AS num
                   FROM resid a JOIN resid b ON b.m = a.m + 1),
           den AS (SELECT n, SUM(e * e) AS den FROM resid GROUP BY 1)
      SELECT n AS n_months, ROUND(num / den, 4) + 0 AS dw,
             ROUND(1.0 - (num / den) / 2.0, 4) + 0 AS rho1_approx
      FROM den, num""",

    "q_theil_index" -> """
      WITH cust0 AS (SELECT o_custkey,
                            CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
                     FROM orders GROUP BY 1),
           cust AS (SELECT x FROM cust0 WHERE x > 0),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
                   FROM cust),
           r AS (SELECT n, CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sx AS DOUBLE) AS ratio
                 FROM cust, tot),
           s AS (SELECT n, SUM(ratio * ln(ratio)) AS st, SUM(-ln(ratio)) AS sl
                 FROM r GROUP BY 1)
      SELECT n AS n_customers, ROUND(st / CAST(n AS DOUBLE), 4) + 0 AS theil_t,
             ROUND(sl / CAST(n AS DOUBLE), 4) + 0 AS theil_l
      FROM s""",

    "q_process_capability" -> """
      WITH s AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
                        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                          AS BIGINT) AS sqq,
                        CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) < 5
                                        OR CAST(l_quantity AS BIGINT) > 45
                                      THEN 1 ELSE 0 END) AS BIGINT) AS oos
                 FROM lineitem GROUP BY 1)
      SELECT flag, n,
             ROUND(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0 AS mean_qty,
             ROUND(SQRT(CAST(sqq AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))), 4) + 0 AS sd_qty,
             ROUND(40.0 / (6.0 * SQRT(CAST(sqq AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)))), 4) + 0 AS cp,
             ROUND(LEAST(45.0 - CAST(sq AS DOUBLE) / CAST(n AS DOUBLE),
                         CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) - 5.0)
               / (3.0 * SQRT(CAST(sqq AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)))), 4) + 0 AS cpk,
             CAST(oos * 1000000 // n AS BIGINT) AS oos_ppm
      FROM s ORDER BY flag""",

    "q_cronbach_alpha" -> """
      WITH it AS (SELECT o_custkey,
                         CAST(SUM(CASE WHEN quarter(o_orderdate) = 1
                                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS q1,
                         CAST(SUM(CASE WHEN quarter(o_orderdate) = 2
                                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS q2,
                         CAST(SUM(CASE WHEN quarter(o_orderdate) = 3
                                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS q3,
                         CAST(SUM(CASE WHEN quarter(o_orderdate) = 4
                                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS q4
                  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
           t AS (SELECT q1, q2, q3, q4, q1 + q2 + q3 + q4 AS t FROM it),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(q1) AS BIGINT) AS s1,
                        CAST(SUM(CAST(q1 AS HUGEINT) * q1) AS DOUBLE) AS ss1,
                        CAST(SUM(q2) AS BIGINT) AS s2,
                        CAST(SUM(CAST(q2 AS HUGEINT) * q2) AS DOUBLE) AS ss2,
                        CAST(SUM(q3) AS BIGINT) AS s3,
                        CAST(SUM(CAST(q3 AS HUGEINT) * q3) AS DOUBLE) AS ss3,
                        CAST(SUM(q4) AS BIGINT) AS s4,
                        CAST(SUM(CAST(q4 AS HUGEINT) * q4) AS DOUBLE) AS ss4,
                        CAST(SUM(t) AS BIGINT) AS st,
                        CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS sst
                 FROM t),
           v AS (SELECT n,
                        ((ss1 / CAST(n AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                         + (ss2 / CAST(n AS DOUBLE)
                           - (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
                         + (ss3 / CAST(n AS DOUBLE)
                           - (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)))
                         + (ss4 / CAST(n AS DOUBLE)
                           - (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE))))
                        / (sst / CAST(n AS DOUBLE)
                           - (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))) AS var_ratio
                 FROM s)
      SELECT n AS n_customers, ROUND(var_ratio, 4) + 0 AS item_total_var_ratio,
             ROUND((4.0 / 3.0) * (1.0 - var_ratio), 4) + 0 AS cronbach_alpha
      FROM v""",

    "q_brier_decomposition" -> """
      WITH br AS (SELECT p.p_brand AS brand, l.l_shipdate,
                         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS o
                  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
           train AS (SELECT brand, CAST(SUM(o) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS p
                     FROM br WHERE l_shipdate < DATE '1998-07-01' GROUP BY 1),
           ev AS (SELECT b.brand, CAST(COUNT(*) AS BIGINT) AS nk,
                         CAST(SUM(o) AS BIGINT) AS sk, t.p
                  FROM br b JOIN train t ON t.brand = b.brand
                  WHERE l_shipdate >= DATE '1998-07-01' GROUP BY 1, 4),
           tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS nn,
                          CAST(SUM(sk) AS DOUBLE) / CAST(SUM(nk) AS DOUBLE) AS obar
                   FROM ev),
           terms AS (SELECT nn, obar,
                            CAST(nk AS DOUBLE)
                              * (p - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))
                              * (p - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE)) AS rel_k,
                            CAST(nk AS DOUBLE)
                              * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE) - obar)
                              * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE) - obar) AS res_k,
                            CAST(nk AS DOUBLE) * p * p - 2.0 * p * CAST(sk AS DOUBLE)
                              + CAST(sk AS DOUBLE) AS brier_k
                     FROM ev, tot),
           agg AS (SELECT nn, obar, SUM(rel_k) AS rel, SUM(res_k) AS res,
                          SUM(brier_k) AS brier
                   FROM terms GROUP BY 1, 2)
      SELECT nn AS n_eval,
             ROUND(brier / CAST(nn AS DOUBLE), 4) + 0 AS brier,
             ROUND(rel / CAST(nn AS DOUBLE), 4) + 0 AS reliability,
             ROUND(res / CAST(nn AS DOUBLE), 4) + 0 AS resolution,
             ROUND(obar * (1.0 - obar), 4) + 0 AS uncertainty,
             ROUND(brier / CAST(nn AS DOUBLE)
               - (rel / CAST(nn AS DOUBLE) - res / CAST(nn AS DOUBLE)
                  + obar * (1.0 - obar)), 4) + 0 AS identity_check
      FROM agg""",

    "q_benjamini_hochberg" -> """
      WITH j AS (SELECT c.c_nationkey AS nk,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           g AS (SELECT CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                        SQRT(CAST(SUM(CAST(tp AS HUGEINT) * tp) AS DOUBLE)
                               / CAST(COUNT(*) AS DOUBLE)
                             - (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                               * (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                          AS sigma
                 FROM j),
           pv AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS ni, CAST(SUM(tp) AS BIGINT) AS si
                  FROM j GROUP BY 1),
           z AS (SELECT nk, ni,
                        (CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) - mu)
                          / (sigma / SQRT(CAST(ni AS DOUBLE))) AS z
                 FROM pv, g),
           p AS (SELECT nk, ni, z,
                        ROUND(2.0 / (1.0 + exp(1.702 * abs(z))), 7) AS p
                 FROM z),
           m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p),
           rk AS (SELECT a.nk, a.ni, a.z, a.p, CAST(COUNT(*) AS BIGINT) AS bh_rank
                  FROM p a JOIN p b ON b.p < a.p OR (b.p = a.p AND b.nk <= a.nk)
                  GROUP BY 1, 2, 3, 4),
           pass AS (SELECT nk, ni, z, p, bh_rank,
                           CASE WHEN p <= CAST(bh_rank AS DOUBLE) * 0.10
                                           / CAST(m AS DOUBLE)
                                THEN 1 ELSE 0 END AS passes
                    FROM rk, m),
           ks AS (SELECT COALESCE(MAX(CASE WHEN passes = 1 THEN bh_rank END),
                    CAST(0 AS BIGINT)) AS kstar FROM pass)
      SELECT nk AS nationkey, ni AS n_orders, ROUND(z, 4) + 0 AS z, p + 0 AS p_approx,
             bh_rank, CAST(CASE WHEN bh_rank <= kstar THEN 1 ELSE 0 END AS BIGINT)
               AS rejected
      FROM pass, ks ORDER BY 1""",

    "q_jarque_bera" -> """
      WITH s AS (SELECT l_returnflag AS mode, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
                        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                          AS BIGINT) AS s2,
                        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
                        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                          * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                          AS BIGINT) AS s4
                 FROM lineitem GROUP BY 1),
           a AS (SELECT mode, n,
                        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS a2,
                        CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS a3,
                        CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS a4
                 FROM s),
           m AS (SELECT mode, n, a2 - mu * mu AS m2,
                        a3 - 3.0 * mu * a2 + 2.0 * mu * mu * mu AS m3,
                        a4 - 4.0 * mu * a3 + 6.0 * mu * mu * a2
                          - 3.0 * mu * mu * mu * mu AS m4
                 FROM a),
           sk AS (SELECT mode, n, m3 / (m2 * SQRT(m2)) AS skew,
                         m4 / (m2 * m2) AS kurt
                  FROM m)
      SELECT mode, n, ROUND(skew, 4) + 0 AS skew, ROUND(kurt, 4) + 0 AS kurt,
             ROUND(CAST(n AS DOUBLE) / 6.0
               * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 4) + 0 AS jb,
             CAST(CASE WHEN CAST(n AS DOUBLE) / 6.0
               * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) > 5.991465
               THEN 1 ELSE 0 END AS BIGINT) AS reject_normal
      FROM sk ORDER BY mode""",

    "q_breusch_pagan" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(m) AS BIGINT) AS st, CAST(SUM(m * m) AS BIGINT) AS stt,
                          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar
                   FROM rev),
           u AS (SELECT m, n, st, stt,
                        (CAST(rev AS DOUBLE) - ybar - b * (CAST(m AS DOUBLE) - tbar))
                          * (CAST(rev AS DOUBLE) - ybar - b * (CAST(m AS DOUBLE) - tbar))
                          AS u
                 FROM rev, fit),
           agg AS (SELECT n, st, stt, SUM(u) AS su, SUM(u * u) AS suu,
                          SUM(CAST(m AS DOUBLE) * u) AS smu
                   FROM u GROUP BY 1, 2, 3),
           r2 AS (SELECT n AS n_months,
                         (CAST(n AS DOUBLE) * smu - CAST(st AS DOUBLE) * su)
                           * (CAST(n AS DOUBLE) * smu - CAST(st AS DOUBLE) * su)
                           / ((CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                             - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                             * (CAST(n AS DOUBLE) * suu - su * su)) AS r2_aux
                  FROM agg)
      SELECT n_months, ROUND(r2_aux, 6) + 0 AS r2_aux,
             ROUND(CAST(n_months AS DOUBLE) * r2_aux, 4) + 0 AS lm,
             CAST(CASE WHEN CAST(n_months AS DOUBLE) * r2_aux > 3.841459
               THEN 1 ELSE 0 END AS BIGINT) AS reject_homosked
      FROM r2""",

    "q_chow_test" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
           s AS (SELECT
                   SUM(CASE WHEN m < 23977 THEN 1.0 ELSE 0.0 END) AS an,
                   SUM(CASE WHEN m < 23977 THEN CAST(m AS DOUBLE) ELSE 0.0 END) AS ast,
                   SUM(CASE WHEN m < 23977 THEN CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                       ELSE 0.0 END) AS astt,
                   SUM(CASE WHEN m < 23977 THEN CAST(rev AS DOUBLE) ELSE 0.0 END) AS asy,
                   SUM(CASE WHEN m < 23977 THEN CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)
                       ELSE 0.0 END) AS asyy,
                   SUM(CASE WHEN m < 23977 THEN CAST(m AS DOUBLE) * CAST(rev AS DOUBLE)
                       ELSE 0.0 END) AS asty,
                   SUM(CASE WHEN m >= 23977 THEN 1.0 ELSE 0.0 END) AS bn,
                   SUM(CASE WHEN m >= 23977 THEN CAST(m AS DOUBLE) ELSE 0.0 END) AS bst,
                   SUM(CASE WHEN m >= 23977 THEN CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                       ELSE 0.0 END) AS bstt,
                   SUM(CASE WHEN m >= 23977 THEN CAST(rev AS DOUBLE) ELSE 0.0 END) AS bsy,
                   SUM(CASE WHEN m >= 23977 THEN CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)
                       ELSE 0.0 END) AS bsyy,
                   SUM(CASE WHEN m >= 23977 THEN CAST(m AS DOUBLE) * CAST(rev AS DOUBLE)
                       ELSE 0.0 END) AS bsty,
                   SUM(1.0) AS tn, SUM(CAST(m AS DOUBLE)) AS tst,
                   SUM(CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS tstt,
                   SUM(CAST(rev AS DOUBLE)) AS tsy,
                   SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS tsyy,
                   SUM(CAST(m AS DOUBLE) * CAST(rev AS DOUBLE)) AS tsty
                 FROM rev),
           r AS (SELECT CAST(an AS BIGINT) AS n1, CAST(bn AS BIGINT) AS n2,
                        (asyy - (asy * asy) / an)
                          - ((asty - ast * asy / an) * (asty - ast * asy / an))
                            / (astt - ast * ast / an) AS rss1,
                        (bsyy - (bsy * bsy) / bn)
                          - ((bsty - bst * bsy / bn) * (bsty - bst * bsy / bn))
                            / (bstt - bst * bst / bn) AS rss2,
                        (tsyy - (tsy * tsy) / tn)
                          - ((tsty - tst * tsy / tn) * (tsty - tst * tsy / tn))
                            / (tstt - tst * tst / tn) AS rssp
                 FROM s)
      SELECT n1, n2,
             ROUND(((rssp - rss1 - rss2) / 2.0)
               / ((rss1 + rss2) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 4.0)), 4)
               + 0 AS f_stat,
             CAST(CASE WHEN ((rssp - rss1 - rss2) / 2.0)
               / ((rss1 + rss2) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 4.0))
               > 3.117 THEN 1 ELSE 0 END AS BIGINT) AS break_detected
      FROM r""",

    "q_kruskal_wallis" -> """
      WITH gv AS (SELECT o_orderpriority AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
           vals AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM gv GROUP BY 1),
           ranks AS (SELECT a.v, a.t,
                            CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS below
                     FROM vals a LEFT JOIN vals b ON b.v < a.v
                     GROUP BY 1, 2),
           mid AS (SELECT v, t,
                          CAST(below AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0) / 2.0
                            AS midrank
                   FROM ranks),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
                          CAST(SUM(t * t * t - t) AS BIGINT) AS ties
                   FROM vals),
           grp AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g,
                          SUM(CAST(cnt AS DOUBLE) * midrank) AS r_g
                   FROM gv JOIN mid ON gv.v = mid.v GROUP BY 1),
           h AS (SELECT nn, ties,
                        SUM(r_g * r_g / CAST(n_g AS DOUBLE)) AS srr
                 FROM grp, tot GROUP BY 1, 2),
           hh AS (SELECT 12.0 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
                           * srr - 3.0 * (CAST(nn AS DOUBLE) + 1.0) AS h_raw,
                         1.0 - CAST(ties AS DOUBLE)
                           / ((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 1.0)
                             * CAST(nn AS DOUBLE)) AS corr
                  FROM h)
      SELECT g AS priority, n_g,
             ROUND(r_g / CAST(n_g AS DOUBLE), 4) + 0 AS mean_rank,
             ROUND(h_raw, 4) + 0 AS h, ROUND(h_raw / corr, 4) + 0 AS h_adj
      FROM grp, hh ORDER BY priority""",

    "q_friedman_test" -> """
      WITH cell AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                           o_orderpriority AS g,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM orders GROUP BY 1, 2),
           full_b AS (SELECT m FROM cell GROUP BY 1 HAVING COUNT(*) = 5),
           blk AS (SELECT cell.* FROM cell JOIN full_b ON cell.m = full_b.m),
           ranked AS (SELECT a.m, a.g,
                             1 + CAST(SUM(CASE WHEN b.s * a.c > a.s * b.c
                               THEN 1 ELSE 0 END) AS BIGINT) AS rank_b
                      FROM blk a JOIN blk b ON b.m = a.m AND b.g <> a.g
                      GROUP BY 1, 2),
           rj AS (SELECT g, CAST(SUM(rank_b) AS BIGINT) AS r_sum,
                         CAST(COUNT(*) AS BIGINT) AS n_blocks
                  FROM ranked GROUP BY 1),
           q AS (SELECT MAX(n_blocks) AS n,
                        CAST(SUM(r_sum * r_sum) AS BIGINT) AS srr
                 FROM rj),
           qs AS (SELECT 12.0 / (CAST(n AS DOUBLE) * 30.0) * CAST(srr AS DOUBLE)
                           - 18.0 * CAST(n AS DOUBLE) AS q_stat
                  FROM q)
      SELECT g AS priority, n_blocks, r_sum,
             ROUND(CAST(r_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE), 4) + 0 AS mean_rank,
             ROUND(q_stat, 4) + 0 AS q_stat,
             CAST(CASE WHEN q_stat > 9.487729 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_equal
      FROM rj, qs ORDER BY priority""",

    "q_wilcoxon_signed_rank" -> """
      WITH d0 AS (SELECT c.c_nationkey AS nation,
                         CAST(SUM(CASE WHEN year(o_orderdate) = 1997
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT)
                           - CAST(SUM(CASE WHEN year(o_orderdate) = 1996
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS d
                  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  WHERE year(o_orderdate) IN (1996, 1997)
                  GROUP BY 1),
           d1 AS (SELECT nation, d, ABS(d) AS ad FROM d0 WHERE d <> 0),
           ranked AS (SELECT a.nation, a.d,
                             1 + CAST(COALESCE(SUM(CASE WHEN b.ad < ABS(a.d)
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS rank_b
                      FROM d1 a LEFT JOIN d1 b ON b.nation <> a.nation
                      GROUP BY 1, 2),
           w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                        CAST(SUM(CASE WHEN d > 0 THEN rank_b ELSE 0 END) AS BIGINT)
                          AS w_plus,
                        CAST(SUM(CASE WHEN d < 0 THEN rank_b ELSE 0 END) AS BIGINT)
                          AS w_minus
                 FROM ranked)
      SELECT n_pairs, w_plus, w_minus,
             ROUND((CAST(w_plus AS DOUBLE)
               - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0)
               / SQRT(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
                 * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0), 4) + 0 AS z
      FROM w""",

    "q_odds_ratio" -> """
      WITH s AS (SELECT
                   CAST(SUM(CASE WHEN l_discount >= 0.06
                     AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN l_discount >= 0.06
                     AND NOT l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                     AS b,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06
                     AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06
                     AND NOT l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                     AS d
                 FROM lineitem),
           o AS (SELECT a, b, c, d,
                        (CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                          / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) AS or_raw,
                        SQRT(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
                          + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)) AS se
                 FROM s)
      SELECT a, b, c, d, ROUND(or_raw, 4) + 0 AS odds_ratio,
             ROUND(EXP(LN(or_raw) - 1.959964 * se), 4) + 0 AS ci_lo,
             ROUND(EXP(LN(or_raw) + 1.959964 * se), 4) + 0 AS ci_hi
      FROM o""",

    "q_rsi_indicator" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           chg AS (SELECT b.d AS d, GREATEST(b.rev - a.rev, 0) AS g,
                          GREATEST(a.rev - b.rev, 0) AS l
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           win AS (SELECT a.d, CAST(SUM(b.g) AS BIGINT) AS sg,
                          CAST(SUM(b.l) AS BIGINT) AS sl
                   FROM chg a JOIN chg b ON b.d BETWEEN a.d - 13 AND a.d
                   GROUP BY 1
                   HAVING CAST(SUM(b.g) AS BIGINT) > 0 AND CAST(SUM(b.l) AS BIGINT) > 0),
           rsi AS (SELECT 100.0 - 100.0
                            / (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE)) AS rsi
                   FROM win)
      SELECT CAST(FLOOR(rsi / 10.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_days, ROUND(AVG(rsi), 4) + 0 AS mean_rsi
      FROM rsi GROUP BY 1 ORDER BY bucket""",

    "q_var_cvar" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(year(o_orderdate) AS BIGINT) AS y,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1, 2),
           chg AS (SELECT b.y AS y, b.rev - a.rev AS diff
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           vals AS (SELECT y, diff, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM chg GROUP BY 1, 2),
           stats AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST((CAST(COUNT(*) AS BIGINT) + 19) // 20 AS BIGINT) AS k
                     FROM chg GROUP BY 1),
           cum AS (SELECT a.y, a.diff, CAST(SUM(b.cnt) AS BIGINT) AS cum
                   FROM vals a JOIN vals b ON b.y = a.y AND b.diff <= a.diff
                   GROUP BY 1, 2),
           varq AS (SELECT cum.y, stats.n, MIN(cum.diff) AS var95
                    FROM cum JOIN stats ON cum.y = stats.y
                    WHERE cum.cum >= stats.k
                    GROUP BY 1, 2),
           tail AS (SELECT chg.y, CAST(COUNT(*) AS BIGINT) AS n_tail,
                           CAST(SUM(chg.diff) AS BIGINT) AS s_tail
                    FROM chg JOIN varq ON chg.y = varq.y
                    WHERE chg.diff <= varq.var95
                    GROUP BY 1)
      SELECT varq.y AS yr, varq.n, varq.var95, tail.n_tail,
             ROUND(CAST(tail.s_tail AS DOUBLE) / CAST(tail.n_tail AS DOUBLE), 4) + 0
               AS cvar95
      FROM tail JOIN varq ON tail.y = varq.y ORDER BY yr""",

    "q_mcnemar" -> """
      WITH r AS (SELECT (l_discount >= 0.05) = (l_returnflag = 'R') AS ra,
                        (l_quantity > 25) = (l_returnflag = 'R') AS rb
                 FROM lineitem),
           s AS (SELECT CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
                          AS b,
                        CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
                          AS c
                 FROM r)
      SELECT b AS a_only_right, c AS b_only_right,
             ROUND(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
               / CAST(b + c AS DOUBLE), 4) + 0 AS chi2,
             ROUND((CAST(ABS(b - c) AS DOUBLE) - 1.0)
               * (CAST(ABS(b - c) AS DOUBLE) - 1.0)
               / CAST(b + c AS DOUBLE), 4) + 0 AS chi2_cc,
             CAST(CASE WHEN (CAST(ABS(b - c) AS DOUBLE) - 1.0)
               * (CAST(ABS(b - c) AS DOUBLE) - 1.0)
               / CAST(b + c AS DOUBLE) > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
               AS classifiers_differ
      FROM s""",

    "q_bartlett_test" -> """
      WITH g AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS sx,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS sxx
                 FROM orders GROUP BY 1),
           v AS (SELECT g, n,
                        (sxx - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS s2
                 FROM g),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
                          SUM((CAST(n AS DOUBLE) - 1.0) * s2) AS pooled_num,
                          SUM((CAST(n AS DOUBLE) - 1.0) * LN(s2)) AS sum_nl,
                          SUM(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS sum_inv
                   FROM v),
           t AS (SELECT k, nn,
                        (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
                          * LN(pooled_num / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
                          - sum_nl AS t_num,
                        1.0 + (sum_inv
                          - 1.0 / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
                          / (3.0 * (CAST(k AS DOUBLE) - 1.0)) AS c_corr
                 FROM tot)
      SELECT g AS priority, n AS n_g,
             ROUND(s2 / 10000.0, 4) + 0 AS var_dollars,
             ROUND(t_num / c_corr, 4) + 0 AS bartlett_t,
             CAST(CASE WHEN t_num / c_corr > 9.487729 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_homogeneous
      FROM v, t ORDER BY priority""",

    "q_engle_granger" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS ya
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS yb
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           ab AS (SELECT sega.m, ya, yb FROM sega JOIN segb ON sega.m = segb.m),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          (CAST(COUNT(*) AS DOUBLE)
                            * SUM(CAST(ya AS DOUBLE) * CAST(yb AS DOUBLE))
                            - CAST(SUM(ya) AS DOUBLE) * CAST(SUM(yb) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE)
                            * SUM(CAST(yb AS DOUBLE) * CAST(yb AS DOUBLE))
                            - CAST(SUM(yb) AS DOUBLE) * CAST(SUM(yb) AS DOUBLE)) AS beta,
                          CAST(SUM(ya) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS abar,
                          CAST(SUM(yb) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS bbar
                   FROM ab),
           resid AS (SELECT m, n, beta,
                            CAST(ya AS DOUBLE) - abar
                              - beta * (CAST(yb AS DOUBLE) - bbar) AS e
                     FROM ab, fit),
           num AS (SELECT SUM((b.e - a.e) * (b.e - a.e)) AS num
                   FROM resid a JOIN resid b ON b.m = a.m + 1),
           den AS (SELECT n, beta, SUM(e * e) AS den FROM resid GROUP BY 1, 2)
      SELECT n AS n_months, ROUND(beta, 4) + 0 AS beta,
             ROUND(num / den, 4) + 0 AS dw_resid,
             CAST(CASE WHEN num / den > 1.0 THEN 1 ELSE 0 END AS BIGINT)
               AS cointegrated
      FROM den, num""",

    "q_goodman_kruskal_gamma" -> """
      WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                            CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
                            CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM lineitem GROUP BY 1, 2),
           s AS (SELECT CAST(SUM(CASE WHEN b.y > a.y THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS c_pairs,
                        CAST(SUM(CASE WHEN b.y < a.y THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS d_pairs
                 FROM cells a JOIN cells b ON b.x > a.x AND b.y <> a.y)
      SELECT c_pairs, d_pairs,
             ROUND(CAST(c_pairs - d_pairs AS DOUBLE)
               / CAST(c_pairs + d_pairs AS DOUBLE), 4) + 0 AS gamma
      FROM s""",

    "q_atkinson_index" -> """
      WITH cust0 AS (SELECT o_custkey,
                            CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                              AS x
                     FROM orders GROUP BY 1),
           cust AS (SELECT x FROM cust0 WHERE x > 0),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
                   FROM cust),
           r AS (SELECT n, CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sx AS DOUBLE)
                          AS ratio
                 FROM cust, tot),
           s AS (SELECT n, SUM(SQRT(ratio)) AS sr, SUM(1.0 / ratio) AS sinv
                 FROM r GROUP BY 1)
      SELECT n AS n_customers,
             ROUND(1.0 - (sr / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE)), 4) + 0
               AS atkinson_half,
             ROUND(1.0 - CAST(n AS DOUBLE) / sinv, 4) + 0 AS atkinson_two
      FROM s""",

    "q_sharpe_sortino" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(year(o_orderdate) AS BIGINT) AS y,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1, 2),
           chg AS (SELECT b.y AS y, b.rev - a.rev AS diff
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           s AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(diff) AS BIGINT) AS sd,
                        SUM(CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE)) AS sdd,
                        SUM(CASE WHEN diff < 0
                          THEN CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE)
                          ELSE 0.0 END) AS sneg
                 FROM chg GROUP BY 1)
      SELECT y AS yr, n,
             ROUND((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / SQRT(sdd / CAST(n AS DOUBLE)
                 - (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))), 4) + 0 AS sharpe,
             ROUND((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / SQRT(sneg / CAST(n AS DOUBLE)), 4) + 0 AS sortino
      FROM s ORDER BY yr""",

    "q_kelly_criterion" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           chg AS (SELECT b.rev - a.rev AS diff
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_win,
                        CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END) AS BIGINT)
                          AS s_win,
                        CAST(SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END) AS BIGINT)
                          AS s_loss
                 FROM chg WHERE diff <> 0),
           pb AS (SELECT n, n_win, n - n_win AS n_loss,
                         CAST(n_win AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                         (CAST(s_win AS DOUBLE) / CAST(n_win AS DOUBLE))
                           / (CAST(s_loss AS DOUBLE) / CAST(n - n_win AS DOUBLE)) AS b
                  FROM s)
      SELECT n, n_win, n_loss, ROUND(p, 4) + 0 AS p_win, ROUND(b, 4) + 0 AS payoff_b,
             ROUND(p - (1.0 - p) / b, 4) + 0 AS kelly_f
      FROM pb""",

    "q_mann_kendall" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           s AS (SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                                      WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT)
                          AS s
                 FROM rev a JOIN rev b ON b.m > a.m),
           ties AS (SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
                    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM rev GROUP BY rev)),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rev),
           v AS (SELECT n, s AS s_stat,
                        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                          * (2.0 * CAST(n AS DOUBLE) + 5.0)
                          - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s
                 FROM n, s, ties)
      SELECT n AS n_months, s_stat,
             ROUND((CAST(s_stat AS DOUBLE) - SIGN(CAST(s_stat AS DOUBLE)))
               / SQRT(var_s), 4) + 0 AS z,
             CAST(CASE WHEN (CAST(s_stat AS DOUBLE) - SIGN(CAST(s_stat AS DOUBLE)))
                            / SQRT(var_s) > 1.959964 THEN 1
                       WHEN (CAST(s_stat AS DOUBLE) - SIGN(CAST(s_stat AS DOUBLE)))
                            / SQRT(var_s) < -1.959964 THEN -1
                       ELSE 0 END AS BIGINT) AS trend
      FROM v""",

    "q_ses_forecast" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pred AS (SELECT a.m, a.rev AS actual, CAST(COUNT(*) AS BIGINT) AS k,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2
                    HAVING CAST(COUNT(*) AS BIGINT) = 12),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_forecasts,
                        CAST(SUM(actual) AS BIGINT) AS sa,
                        SUM(ABS(CAST(actual AS DOUBLE) - yhat)) AS sae,
                        SUM((CAST(actual AS DOUBLE) - yhat)
                          * (CAST(actual AS DOUBLE) - yhat)) AS sse
                 FROM pred)
      SELECT n_forecasts,
             ROUND((sae / CAST(n_forecasts AS DOUBLE))
               / (CAST(sa AS DOUBLE) / CAST(n_forecasts AS DOUBLE)), 4) + 0
               AS mae_over_mean,
             ROUND(SQRT(sse / CAST(n_forecasts AS DOUBLE))
               / (CAST(sa AS DOUBLE) / CAST(n_forecasts AS DOUBLE)), 4) + 0
               AS rmse_over_mean
      FROM s""",

    "q_gamma_mom" -> """
      WITH g AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS sx,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS sxx
                 FROM orders GROUP BY 1),
           mv AS (SELECT g, n, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                         sxx / CAST(n AS DOUBLE)
                           - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS v
                  FROM g)
      SELECT g AS priority, n, ROUND(mu * mu / v, 4) + 0 AS shape_k,
             ROUND(v / mu / 100.0, 4) + 0 AS scale_dollars
      FROM mv ORDER BY priority""",

    "q_cochran_q" -> """
      WITH rows0 AS (SELECT o_custkey,
                            CAST(MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
                              AS BIGINT) AS y1,
                            CAST(MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END)
                              AS BIGINT) AS y2,
                            CAST(MAX(CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END)
                              AS BIGINT) AS y3
                     FROM orders WHERE year(o_orderdate) IN (1996, 1997, 1998)
                     GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
                        CAST(SUM(y1) AS BIGINT) AS c1, CAST(SUM(y2) AS BIGINT) AS c2,
                        CAST(SUM(y3) AS BIGINT) AS c3,
                        CAST(SUM((y1 + y2 + y3) * (y1 + y2 + y3)) AS BIGINT) AS srr,
                        CAST(SUM(y1 + y2 + y3) AS BIGINT) AS sr
                 FROM rows0),
           q AS (SELECT n_blocks, c1, c2, c3,
                        2.0 * (3.0 * CAST(c1 * c1 + c2 * c2 + c3 * c3 AS DOUBLE)
                          - CAST(sr * sr AS DOUBLE))
                          / (3.0 * CAST(sr AS DOUBLE) - CAST(srr AS DOUBLE)) AS q_raw
                 FROM s)
      SELECT n_blocks, c1, c2, c3, ROUND(q_raw, 4) + 0 AS q_stat,
             CAST(CASE WHEN q_raw > 5.991465 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_equal
      FROM q""",

    "q_moods_median_test" -> """
      WITH gv AS (SELECT o_orderpriority AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
           vals AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM gv GROUP BY 1),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
                          CAST((CAST(SUM(t) AS BIGINT) + 1) // 2 AS BIGINT) AS k
                   FROM vals),
           med AS (SELECT MIN(v) AS med
                   FROM (SELECT a.v, CAST(SUM(b.t) AS BIGINT) AS cum
                         FROM vals a JOIN vals b ON b.v <= a.v GROUP BY 1), tot
                   WHERE cum >= k),
           grp AS (SELECT g,
                          CAST(SUM(CASE WHEN v > med THEN cnt ELSE 0 END) AS BIGINT)
                            AS above,
                          CAST(SUM(CASE WHEN v <= med THEN cnt ELSE 0 END) AS BIGINT)
                            AS notabove
                   FROM gv, med GROUP BY 1),
           marg AS (SELECT CAST(SUM(above) AS BIGINT) AS ta,
                           CAST(SUM(notabove) AS BIGINT) AS tb,
                           CAST(SUM(above) AS BIGINT) + CAST(SUM(notabove) AS BIGINT)
                             AS nn
                    FROM grp),
           chi AS (SELECT g, above, notabove,
                          (CAST(above AS DOUBLE)
                            - CAST(ta AS DOUBLE) * CAST(above + notabove AS DOUBLE)
                              / CAST(nn AS DOUBLE))
                          * (CAST(above AS DOUBLE)
                            - CAST(ta AS DOUBLE) * CAST(above + notabove AS DOUBLE)
                              / CAST(nn AS DOUBLE))
                          / (CAST(ta AS DOUBLE) * CAST(above + notabove AS DOUBLE)
                            / CAST(nn AS DOUBLE))
                          + (CAST(notabove AS DOUBLE)
                            - CAST(tb AS DOUBLE) * CAST(above + notabove AS DOUBLE)
                              / CAST(nn AS DOUBLE))
                            * (CAST(notabove AS DOUBLE)
                              - CAST(tb AS DOUBLE) * CAST(above + notabove AS DOUBLE)
                                / CAST(nn AS DOUBLE))
                            / (CAST(tb AS DOUBLE) * CAST(above + notabove AS DOUBLE)
                              / CAST(nn AS DOUBLE)) AS contrib
                   FROM grp, marg),
           stat AS (SELECT SUM(contrib) AS chi2 FROM chi)
      SELECT g AS priority, above, notabove, ROUND(contrib, 4) + 0 AS contrib,
             ROUND(chi2, 4) + 0 AS chi2,
             CAST(CASE WHEN chi2 > 9.487729 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_equal_medians
      FROM chi, stat ORDER BY priority""",

    "q_mood_dispersion" -> """
      WITH gv AS (SELECT CAST(o_custkey % 2 AS BIGINT) AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
           vals AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM gv GROUP BY 1),
           mid AS (SELECT a.v,
                          CAST(COALESCE(SUM(b.t), 0) AS DOUBLE)
                            + (CAST(a.t AS DOUBLE) + 1.0) / 2.0 AS midrank
                   FROM vals a LEFT JOIN vals b ON b.v < a.v
                   GROUP BY a.v, a.t),
           tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nn,
                          CAST(SUM(CASE WHEN g = 0 THEN cnt ELSE 0 END) AS BIGINT) AS m
                   FROM gv),
           t AS (SELECT nn, m,
                        SUM(CAST(cnt AS DOUBLE)
                          * (midrank - (CAST(nn AS DOUBLE) + 1.0) / 2.0)
                          * (midrank - (CAST(nn AS DOUBLE) + 1.0) / 2.0)) AS t_stat
                 FROM gv JOIN mid ON gv.v = mid.v, tot
                 WHERE g = 0 GROUP BY 1, 2)
      SELECT nn AS n_total, m AS n_even, ROUND(t_stat, 4) + 0 AS t_stat,
             ROUND((t_stat
               - CAST(m AS DOUBLE)
                 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 1.0) / 12.0)
               / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                 * (CAST(nn AS DOUBLE) + 1.0)
                 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0) / 180.0), 4) + 0
               AS z
      FROM t""",

    "q_hodges_lehmann" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           a AS (SELECT rev AS ra FROM rev WHERE m BETWEEN 23953 AND 23964),
           b AS (SELECT rev AS rb FROM rev WHERE m BETWEEN 23965 AND 23976),
           w AS (SELECT rb - ra AS w, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM a, b GROUP BY 1),
           tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS np,
                          CAST((CAST(SUM(cnt) AS BIGINT) + 1) // 2 AS BIGINT) AS k
                   FROM w),
           cum AS (SELECT a.w, CAST(SUM(b.cnt) AS BIGINT) AS cum
                   FROM w a JOIN w b ON b.w <= a.w GROUP BY 1),
           hl AS (SELECT MAX(np) AS n_pairs, MIN(w) AS hl_cents
                  FROM cum, tot WHERE cum >= k)
      SELECT n_pairs, hl_cents,
             ROUND(CAST(hl_cents AS DOUBLE) / 100.0, 2) + 0 AS hl_dollars
      FROM hl""",

    "q_pettitt_test" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pairs AS (SELECT a.m AS mi, b.m AS mj,
                            CASE WHEN b.rev > a.rev THEN 1
                                 WHEN b.rev < a.rev THEN -1 ELSE 0 END AS s
                     FROM rev a JOIN rev b ON b.m > a.m),
           u AS (SELECT t.m AS t, CAST(SUM(s) AS BIGINT) AS u_t
                 FROM pairs JOIN rev t ON pairs.mi <= t.m AND pairs.mj > t.m
                 GROUP BY 1),
           k AS (SELECT MAX(ABS(u_t)) AS k_stat FROM u),
           ts AS (SELECT k_stat, MIN(t) AS t_star
                  FROM u, k WHERE ABS(u_t) = k_stat GROUP BY 1),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM rev)
      SELECT n_months, k_stat, t_star,
             ROUND(2.0 * EXP(-6.0 * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE)
               / (CAST(n_months AS DOUBLE) * CAST(n_months AS DOUBLE)
                 * CAST(n_months AS DOUBLE)
                 + CAST(n_months AS DOUBLE) * CAST(n_months AS DOUBLE))), 6) + 0
               AS p_approx
      FROM n, ts""",

    "q_bowley_skewness" -> """
      WITH gv AS (SELECT o_orderpriority AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
           stats AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
                            CAST((CAST(SUM(cnt) AS BIGINT) + 3) // 4 AS BIGINT) AS k1,
                            CAST((CAST(SUM(cnt) AS BIGINT) + 1) // 2 AS BIGINT) AS k2,
                            CAST((3 * CAST(SUM(cnt) AS BIGINT) + 3) // 4 AS BIGINT)
                              AS k3
                     FROM gv GROUP BY 1),
           cum AS (SELECT a.g, a.v, CAST(SUM(b.cnt) AS BIGINT) AS cum
                   FROM gv a JOIN gv b ON b.g = a.g AND b.v <= a.v
                   GROUP BY 1, 2),
           q AS (SELECT cum.g, stats.n,
                        MIN(CASE WHEN cum >= k1 THEN v END) AS q1,
                        MIN(CASE WHEN cum >= k2 THEN v END) AS q2,
                        MIN(CASE WHEN cum >= k3 THEN v END) AS q3
                 FROM cum JOIN stats ON cum.g = stats.g
                 GROUP BY 1, 2)
      SELECT g AS priority, n, q1, q2, q3,
             ROUND((CAST(q3 + q1 AS DOUBLE) - 2.0 * CAST(q2 AS DOUBLE))
               / CAST(q3 - q1 AS DOUBLE), 4) + 0 AS bowley_skew,
             ROUND(CAST(q3 - q1 AS DOUBLE) / CAST(q3 + q1 AS DOUBLE), 4) + 0 AS qcd
      FROM q ORDER BY priority""",

    "q_dunn_posthoc" -> """
      WITH gv AS (SELECT o_orderpriority AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
           vals AS (SELECT v, CAST(SUM(cnt) AS BIGINT) AS t FROM gv GROUP BY 1),
           mid AS (SELECT a.v,
                          CAST(COALESCE(SUM(b.t), 0) AS DOUBLE)
                            + (CAST(a.t AS DOUBLE) + 1.0) / 2.0 AS midrank
                   FROM vals a LEFT JOIN vals b ON b.v < a.v
                   GROUP BY a.v, a.t),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
                          CAST(SUM(t * t * t - t) AS BIGINT) AS ties
                   FROM vals),
           grp AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g,
                          SUM(CAST(cnt AS DOUBLE) * midrank) AS r_g
                   FROM gv JOIN mid ON gv.v = mid.v GROUP BY 1),
           z AS (SELECT a.g || ' vs ' || b.g AS pair,
                        (a.r_g / CAST(a.n_g AS DOUBLE)
                          - b.r_g / CAST(b.n_g AS DOUBLE))
                        / SQRT((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0) / 12.0
                          - CAST(ties AS DOUBLE)
                            / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))
                          * (1.0 / CAST(a.n_g AS DOUBLE)
                            + 1.0 / CAST(b.n_g AS DOUBLE))) AS z_raw
                 FROM grp a JOIN grp b ON a.g < b.g, tot)
      SELECT pair, ROUND(z_raw, 4) + 0 AS z,
             CAST(CASE WHEN ABS(z_raw) > 2.807034 THEN 1 ELSE 0 END AS BIGINT)
               AS significant
      FROM z ORDER BY pair""",

    "q_readability_score" -> """
      WITH c AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                        CAST(len(regexp_extract_all(text, '[.!?]+')) + 1 AS BIGINT) AS s,
                        CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
                          AS syl
                 FROM documents),
           sc AS (SELECT 206.835
                    - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                    - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) AS score
                  FROM c)
      SELECT CAST(FLOOR(score / 10.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(AVG(score), 4) + 0 AS mean_score
      FROM sc GROUP BY 1 ORDER BY bucket""",

    "q_permutation_entropy" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           tri AS (SELECT (CASE WHEN b.rev > a.rev THEN 4 ELSE 0 END)
                            + (CASE WHEN c.rev > a.rev THEN 2 ELSE 0 END)
                            + (CASE WHEN c.rev > b.rev THEN 1 ELSE 0 END) AS code
                   FROM rev a JOIN rev b ON b.m = a.m + 1
                   JOIN rev c ON c.m = a.m + 2),
           dist AS (SELECT CAST(code AS BIGINT) AS code, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM tri GROUP BY 1),
           tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM dist),
           h AS (SELECT SUM(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                   * LN(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))) AS h
                 FROM dist, tot)
      SELECT code, cnt,
             ROUND(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0 AS p,
             ROUND(h, 4) + 0 AS entropy,
             ROUND(h / 1.7917595, 4) + 0 AS entropy_norm
      FROM dist, tot, h ORDER BY code""",

    "q_sample_entropy" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           tpl AS (SELECT a.m,
                          CAST(a.rev // 100000000 AS BIGINT) AS b0,
                          CAST(b.rev // 100000000 AS BIGINT) AS b1,
                          CAST(c.rev // 100000000 AS BIGINT) AS b2
                   FROM rev a JOIN rev b ON b.m = a.m + 1
                   JOIN rev c ON c.m = a.m + 2),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_pairs,
                        CAST(SUM(CASE WHEN ABS(a.b2 - b.b2)
                          <= GREATEST(1, CAST((a.b2 + b.b2) // 20 AS BIGINT))
                          THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs
                 FROM tpl a JOIN tpl b ON b.m > a.m
                   AND ABS(a.b0 - b.b0)
                     <= GREATEST(1, CAST((a.b0 + b.b0) // 20 AS BIGINT))
                   AND ABS(a.b1 - b.b1)
                     <= GREATEST(1, CAST((a.b1 + b.b1) // 20 AS BIGINT)))
      SELECT b_pairs, a_pairs,
             ROUND(-LN(CAST(a_pairs AS DOUBLE) / CAST(b_pairs AS DOUBLE)), 4) + 0
               AS sampen
      FROM s""",

    "q_bounce_rate" -> """
      WITH ud AS (SELECT user_id,
                         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                           AS BIGINT) AS d,
                         CAST(COUNT(*) AS BIGINT) AS n_ev
                  FROM events GROUP BY 1, 2),
           s AS (SELECT d % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_user_days,
                        CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_bounce
                 FROM ud GROUP BY 1)
      SELECT dow, n_user_days, n_bounce,
             ROUND(CAST(n_bounce AS DOUBLE) / CAST(n_user_days AS DOUBLE), 4) + 0
               AS bounce_rate
      FROM s ORDER BY dow""",

    "q_turning_points" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           tp AS (SELECT CAST(SUM(CASE WHEN (b.rev > a.rev AND b.rev > c.rev)
                                         OR (b.rev < a.rev AND b.rev < c.rev)
                                       THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
                  FROM rev a JOIN rev b ON b.m = a.m + 1
                  JOIN rev c ON c.m = a.m + 2),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM rev)
      SELECT n_months, n_turning,
             ROUND((CAST(n_turning AS DOUBLE)
               - 2.0 * (CAST(n_months AS DOUBLE) - 2.0) / 3.0)
               / SQRT((16.0 * CAST(n_months AS DOUBLE) - 29.0) / 90.0), 4) + 0 AS z
      FROM n, tp""",

    "q_arch_lm" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar
                   FROM rev),
           u AS (SELECT m,
                        (CAST(rev AS DOUBLE) - ybar - b * (CAST(m AS DOUBLE) - tbar))
                          * (CAST(rev AS DOUBLE) - ybar - b * (CAST(m AS DOUBLE) - tbar))
                          AS u
                 FROM rev, fit),
           p AS (SELECT CAST(COUNT(*) AS BIGINT) AS np, SUM(a.u) AS su,
                        SUM(b.u) AS sl, SUM(a.u * b.u) AS sul,
                        SUM(a.u * a.u) AS suu, SUM(b.u * b.u) AS sll
                 FROM u a JOIN u b ON b.m = a.m - 1),
           r AS (SELECT np AS n_pairs,
                        (CAST(np AS DOUBLE) * sul - su * sl)
                          * (CAST(np AS DOUBLE) * sul - su * sl)
                          / ((CAST(np AS DOUBLE) * sll - sl * sl)
                            * (CAST(np AS DOUBLE) * suu - su * su)) AS r2
                 FROM p)
      SELECT n_pairs, ROUND(r2, 6) + 0 AS r2,
             ROUND(CAST(n_pairs AS DOUBLE) * r2, 4) + 0 AS lm,
             CAST(CASE WHEN CAST(n_pairs AS DOUBLE) * r2 > 3.841459
               THEN 1 ELSE 0 END AS BIGINT) AS arch_effect
      FROM r""",

    "q_higuchi_fd" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           lags AS (SELECT CAST(l AS BIGINT) AS k
                    FROM (VALUES (1), (2), (4)) t(l)),
           cl AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(SUM(ABS(b.rev - a.rev)) AS BIGINT) AS clen
                  FROM rev a CROSS JOIN lags JOIN rev b ON b.m = a.m + k
                  GROUP BY 1),
           nl AS (SELECT k, np, clen,
                         CAST(clen AS DOUBLE)
                           / (CAST(np AS DOUBLE) * CAST(k AS DOUBLE)) AS nl
                  FROM cl),
           xy AS (SELECT k, np, clen, nl,
                         CASE WHEN k = 1 THEN 0.0 WHEN k = 2 THEN -0.6931472
                              ELSE -1.3862944 END AS x,
                         LN(nl) AS y
                  FROM nl),
           slope AS (SELECT (CAST(COUNT(*) AS DOUBLE) * SUM(x * y) - SUM(x) * SUM(y))
                            / (CAST(COUNT(*) AS DOUBLE) * SUM(x * x)
                              - SUM(x) * SUM(x)) AS fd
                     FROM xy)
      SELECT k, np AS n_pairs, clen AS curve_len_cents,
             ROUND(nl, 4) + 0 AS norm_len, ROUND(fd, 4) + 0 AS fd
      FROM xy, slope ORDER BY k""",

    "q_local_clustering" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           edges AS (SELECT a.pk AS u, b.pk AS v
                     FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
                   FROM (SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges)
                   GROUP BY 1),
           trin AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                    FROM edges e1 JOIN edges e2 ON e1.v = e2.u
                    JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v),
           tric AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS t
                    FROM (SELECT a AS p FROM trin UNION ALL SELECT b AS p FROM trin
                          UNION ALL SELECT c AS p FROM trin)
                    GROUP BY 1),
           nodes AS (SELECT deg.d, COALESCE(tric.t, 0) AS t
                     FROM deg LEFT JOIN tric ON deg.p = tric.p
                     WHERE deg.d >= 2)
      SELECT CAST((t * 20) // (d * (d - 1)) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_nodes, CAST(SUM(t) AS BIGINT) AS sum_tri,
             ROUND(AVG(CAST(d AS DOUBLE)), 4) + 0 AS mean_degree
      FROM nodes GROUP BY 1 ORDER BY bucket""",

    "q_repeat_purchase_curve" -> """
      WITH pc AS (SELECT k_c, CAST(COUNT(*) AS BIGINT) AS nc
                  FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k_c
                        FROM orders GROUP BY 1)
                  GROUP BY 1),
           tot AS (SELECT CAST(SUM(nc) AS BIGINT) AS n_cust FROM pc),
           ks AS (SELECT CAST(kk AS BIGINT) AS k
                  FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) t(kk)),
           s AS (SELECT k, CAST(SUM(nc) AS BIGINT) AS n_ge_k
                 FROM ks JOIN pc ON pc.k_c >= ks.k GROUP BY 1)
      SELECT k, n_ge_k,
             ROUND(CAST(n_ge_k AS DOUBLE) / CAST(n_cust AS DOUBLE), 4) + 0 AS share
      FROM s, tot ORDER BY k""",

    "q_yule_k" -> """
      WITH c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
                        CAST(SUM(c) AS BIGINT) AS n_tokens,
                        CAST(SUM(c * c) AS BIGINT) AS scc
                 FROM c)
      SELECT n_tokens, vocab,
             ROUND(10000.0 * CAST(scc - n_tokens AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 4) + 0
               AS yule_k
      FROM s""",

    "q_simpson_diversity" -> """
      WITH c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1),
           s AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
                        CAST(SUM(c * (c - 1)) AS BIGINT) AS srr
                 FROM c)
      SELECT n_tokens,
             ROUND(1.0 - CAST(srr AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)), 4) + 0
               AS gini_simpson,
             ROUND((CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
               / CAST(srr AS DOUBLE), 4) + 0 AS inverse_simpson
      FROM s""",

    "q_mcc_youden" -> """
      WITH s AS (SELECT
                   CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN l_discount >= 0.05 AND NOT l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.05 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.05 AND NOT l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS tn
                 FROM lineitem)
      SELECT tp, fp, fn, tn,
             ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
               - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
               / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                 * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 4) + 0 AS mcc,
             ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
               + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE) - 1.0, 4) + 0
               AS youden_j,
             ROUND((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
               + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)) / 2.0, 4) + 0
               AS balanced_acc
      FROM s""",

    "q_fleiss_kappa" -> """
      WITH y AS (SELECT (CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                          + (CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                          + (CASE WHEN l_extendedprice > 30000.0 THEN 1 ELSE 0 END)
                          AS y
                 FROM lineitem),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                        CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(y * (y - 1) + (3 - y) * (2 - y)) AS BIGINT) AS agree6
                 FROM y),
           p AS (SELECT n_items,
                        CAST(agree6 AS DOUBLE) / (6.0 * CAST(n_items AS DOUBLE))
                          AS pbar,
                        CAST(sy AS DOUBLE) / (3.0 * CAST(n_items AS DOUBLE)) AS pyes
                 FROM s)
      SELECT n_items, ROUND(pbar, 4) + 0 AS p_agree, ROUND(pyes, 4) + 0 AS p_yes,
             ROUND((pbar - (pyes * pyes + (1.0 - pyes) * (1.0 - pyes)))
               / (1.0 - (pyes * pyes + (1.0 - pyes) * (1.0 - pyes))), 4) + 0
               AS fleiss_kappa
      FROM p""",

    "q_hash_bootstrap" -> """
      WITH bs AS (SELECT CAST(bb AS BIGINT) AS b
                  FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),
                               (12),(13),(14),(15),(16),(17),(18),(19)) t(bb)),
           h0 AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
                         CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                           1, 8) AS BIGINT) AS h0
                  FROM orders),
           h AS (SELECT b, x,
                        ((h0 * (b * 2 + 1) + b * 40503)
                          % 4294967296) % 1000 AS hh
                 FROM h0 CROSS JOIN bs),
           w AS (SELECT b, x,
                        CASE WHEN hh < 368 THEN 0 WHEN hh < 736 THEN 1
                             WHEN hh < 920 THEN 2 WHEN hh < 981 THEN 3
                             ELSE 4 END AS w
                 FROM h),
           means AS (SELECT CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mb
                     FROM w GROUP BY b),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples, SUM(mb) AS sm,
                        SUM(mb * mb) AS smm
                 FROM means)
      SELECT n_resamples,
             ROUND(sm / CAST(n_resamples AS DOUBLE) / 100.0, 4) + 0
               AS boot_mean_dollars,
             ROUND(SQRT(smm / CAST(n_resamples AS DOUBLE)
               - (sm / CAST(n_resamples AS DOUBLE))
                 * (sm / CAST(n_resamples AS DOUBLE))) / 100.0, 4) + 0
               AS boot_se_dollars
      FROM s""",

    "q_taguchi_loss" -> """
      WITH s AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
                        CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                          AS BIGINT) AS sqq
                 FROM lineitem GROUP BY 1),
           d AS (SELECT flag, n,
                        (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) - 25.0)
                          * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) - 25.0) AS bias2,
                        CAST(sqq AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) AS v
                 FROM s)
      SELECT flag, n, ROUND(bias2, 4) + 0 AS bias_sq, ROUND(v, 4) + 0 AS variance,
             ROUND(bias2 + v, 4) + 0 AS taguchi_loss
      FROM d ORDER BY flag""",

    "q_littles_law" -> """
      WITH ship AS (SELECT l_orderkey, MIN(l_shipdate) AS sd
                    FROM lineitem GROUP BY 1),
           ord AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS od,
                          CAST(date_diff('day', DATE '1992-01-01', sd) AS BIGINT) AS sdd
                   FROM orders JOIN ship ON o_orderkey = l_orderkey
                   WHERE CAST(date_diff('day', DATE '1992-01-01', sd) AS BIGINT)
                     >= CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)),
           days AS (SELECT DISTINCT od AS d FROM ord),
           base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                           CAST(SUM(sdd - od) AS BIGINT) AS sdur
                    FROM ord),
           span AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM days),
           lgrid AS (SELECT CAST(COUNT(*) AS BIGINT) AS inflight_daysum
                     FROM ord JOIN days ON d >= od AND d < sdd)
      SELECT n_orders, n_days,
             ROUND(CAST(sdur AS DOUBLE) / CAST(n_orders AS DOUBLE), 4) + 0 AS w_days,
             ROUND(CAST(n_orders AS DOUBLE) / CAST(n_days AS DOUBLE), 4) + 0
               AS lambda_per_day,
             ROUND(CAST(inflight_daysum AS DOUBLE) / CAST(n_days AS DOUBLE), 4) + 0
               AS l_inflight,
             ROUND((CAST(inflight_daysum AS DOUBLE) / CAST(n_days AS DOUBLE))
               / ((CAST(n_orders AS DOUBLE) / CAST(n_days AS DOUBLE))
                 * (CAST(sdur AS DOUBLE) / CAST(n_orders AS DOUBLE))), 4) + 0
               AS littles_ratio
      FROM base, span, lgrid""",

    "q_erlang_c" -> """
      WITH r0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nev,
                         (CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS BIGINT) + 1) * 24 AS hours
                  FROM events WHERE event_type = 'purchase'),
           rate AS (SELECT CAST(nev AS DOUBLE)
                      / (CAST(hours AS DOUBLE)
                        * CAST(CAST((nev + 4 * hours - 1) // (4 * hours) AS BIGINT)
                            AS DOUBLE)) AS a
                    FROM r0),
           servers AS (SELECT CAST(ss AS BIGINT) AS s
                       FROM (VALUES (2),(3),(4),(5),(6),(7),(8)) t(ss)),
           facts AS (SELECT CAST(kk AS BIGINT) AS k, CAST(kf AS DOUBLE) AS kfact
                     FROM (VALUES (0,1),(1,1),(2,2),(3,6),(4,24),(5,120),(6,720),
                                  (7,5040),(8,40320)) t(kk, kf)),
           series AS (SELECT s, a, SUM(POWER(a, CAST(k AS DOUBLE)) / kfact) AS ser
                      FROM servers CROSS JOIN facts CROSS JOIN rate
                      WHERE k < s GROUP BY 1, 2),
           j AS (SELECT series.s, a, ser, facts.kfact AS sfact
                 FROM series JOIN facts ON facts.k = series.s
                 WHERE a < CAST(series.s AS DOUBLE)),
           t2 AS (SELECT s, ROUND(a, 4) + 0 AS offered_load,
                         POWER(a, CAST(s AS DOUBLE)) / sfact
                           / (1.0 - a / CAST(s AS DOUBLE)) AS tail_term, ser
                  FROM j)
      SELECT s, offered_load,
             ROUND(tail_term / (ser + tail_term), 4) + 0 AS p_wait,
             ROUND((tail_term / (ser + tail_term))
               / (CAST(s AS DOUBLE) - offered_load), 4) + 0 AS wq_hours
      FROM t2 ORDER BY s""",

    "q_lorenz_asymmetry" -> """
      WITH cust AS (SELECT o_custkey,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS x
                    FROM orders GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
                   FROM cust),
           s AS (SELECT n, sx,
                        CAST(SUM(CASE WHEN x * n < sx THEN 1 ELSE 0 END) AS BIGINT)
                          AS below,
                        CAST(SUM(CASE WHEN x * n < sx THEN x ELSE 0 END) AS BIGINT)
                          AS below_mass
                 FROM cust, tot GROUP BY 1, 2)
      SELECT n AS n_customers,
             ROUND(CAST(below AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0 AS f_mu,
             ROUND(CAST(below_mass AS DOUBLE) / CAST(sx AS DOUBLE), 4) + 0 AS l_mu,
             ROUND(CAST(below AS DOUBLE) / CAST(n AS DOUBLE)
               + CAST(below_mass AS DOUBLE) / CAST(sx AS DOUBLE), 4) + 0
               AS lorenz_asymmetry
      FROM s""",

    "q_palma_ratio" -> """
      WITH vals AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t
                    FROM (SELECT CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                                   AS BIGINT) // 10000 AS BIGINT) AS v
                          FROM orders GROUP BY o_custkey)
                    GROUP BY 1),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                          CAST(SUM(v * t) AS BIGINT) AS mass,
                          CAST((4 * CAST(SUM(t) AS BIGINT) + 9) // 10 AS BIGINT) AS k40,
                          CAST((9 * CAST(SUM(t) AS BIGINT) + 9) // 10 AS BIGINT) AS k90
                   FROM vals),
           cum AS (SELECT a.v, a.t,
                          CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS cb,
                          CAST(COALESCE(SUM(b.v * b.t), 0) AS BIGINT) AS mb
                   FROM vals a LEFT JOIN vals b ON b.v < a.v
                   GROUP BY 1, 2),
           b40 AS (SELECT v AS v40, mb + (k40 - cb) * v AS bottom40_mass
                   FROM cum, tot WHERE cb < k40 AND cb + t >= k40),
           b90 AS (SELECT v AS v90, mb + (k90 - cb) * v AS below90_mass
                   FROM cum, tot WHERE cb < k90 AND cb + t >= k90)
      SELECT n AS n_customers, v40, v90, bottom40_mass,
             mass - below90_mass AS top10_mass,
             ROUND(CAST(mass - below90_mass AS DOUBLE)
               / CAST(bottom40_mass AS DOUBLE), 4) + 0 AS palma_ratio
      FROM tot, b40, b90""",

    "q_rich_club" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           edges AS (SELECT a.pk AS u, b.pk AS v
                     FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
                   FROM (SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges)
                   GROUP BY 1),
           ks AS (SELECT CAST(kk AS BIGINT) AS k FROM (VALUES (2),(4),(8)) t(kk)),
           nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
                  FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
           ek AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_edges
                  FROM ks CROSS JOIN edges
                  JOIN deg du ON edges.u = du.p
                  JOIN deg dv ON edges.v = dv.p
                  WHERE du.d > ks.k AND dv.d > ks.k
                  GROUP BY 1)
      SELECT nk.k, n_nodes, COALESCE(n_edges, 0) AS n_edges,
             ROUND(2.0 * CAST(COALESCE(n_edges, 0) AS DOUBLE)
               / (CAST(n_nodes AS DOUBLE) * (CAST(n_nodes AS DOUBLE) - 1.0)), 4) + 0
               AS phi
      FROM nk LEFT JOIN ek ON nk.k = ek.k
      WHERE n_nodes >= 2 ORDER BY nk.k""",

    "q_degree_powerlaw" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           edges AS (SELECT a.pk AS u, b.pk AS v
                     FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                     GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
                   FROM (SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges)
                   GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                        SUM(LN(CAST(d AS DOUBLE))) AS sld,
                        CAST(SUM(d) AS BIGINT) AS sd
                 FROM deg WHERE d >= 2)
      SELECT n_nodes,
             ROUND(CAST(sd AS DOUBLE) / CAST(n_nodes AS DOUBLE), 4) + 0
               AS mean_degree,
             ROUND(1.0 + CAST(n_nodes AS DOUBLE)
               / (sld - CAST(n_nodes AS DOUBLE) * 0.6931472), 4) + 0 AS alpha
      FROM s""",

    "q_welch_ttest" -> """
      WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS an,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS asum,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ass
                 FROM orders WHERE o_orderpriority = '1-URGENT'),
           b AS (SELECT CAST(COUNT(*) AS BIGINT) AS bn,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS bsum,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS bss
                 FROM orders WHERE o_orderpriority = '5-LOW'),
           m AS (SELECT an, bn,
                        (CAST(asum AS DOUBLE) / CAST(an AS DOUBLE)
                          - CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE)) AS dmean,
                        ((ass - (CAST(asum AS DOUBLE) * CAST(asum AS DOUBLE))
                          / CAST(an AS DOUBLE)) / (CAST(an AS DOUBLE) - 1.0))
                          / CAST(an AS DOUBLE) AS va,
                        ((bss - (CAST(bsum AS DOUBLE) * CAST(bsum AS DOUBLE))
                          / CAST(bn AS DOUBLE)) / (CAST(bn AS DOUBLE) - 1.0))
                          / CAST(bn AS DOUBLE) AS vb
                 FROM a, b)
      SELECT an AS n_urgent, bn AS n_low,
             ROUND(dmean / SQRT(va + vb), 4) + 0 AS t,
             ROUND((va + vb) * (va + vb)
               / (va * va / (CAST(an AS DOUBLE) - 1.0)
                 + vb * vb / (CAST(bn AS DOUBLE) - 1.0)), 2) + 0 AS df,
             CAST(CASE WHEN ABS(dmean / SQRT(va + vb)) > 1.959964
               THEN 1 ELSE 0 END AS BIGINT) AS reject_equal_means
      FROM m""",

    "q_poisson_dispersion" -> """
      WITH dc AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                         CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                           AS BIGINT) AS d,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM orders GROUP BY 1, 2),
           s AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(c) AS BIGINT) AS sc,
                        CAST(SUM(c * c) AS BIGINT) AS scc
                 FROM dc GROUP BY 1),
           v AS (SELECT y AS yr, n,
                        ((CAST(scc AS DOUBLE)
                          - (CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
                          / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS vmr
                 FROM s)
      SELECT yr, n AS n_days, ROUND(vmr, 4) + 0 AS vmr,
             ROUND((CAST(n AS DOUBLE) - 1.0) * vmr, 4) + 0 AS d_stat,
             CAST(CASE WHEN vmr > 1.0 + 2.0 * SQRT(2.0 / (CAST(n AS DOUBLE) - 1.0))
               THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
      FROM v ORDER BY yr""",

    "q_kupiec_pof" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(year(o_orderdate) AS BIGINT) AS y,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1, 2),
           chg AS (SELECT b.y AS y, b.rev - a.rev AS diff
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           vals AS (SELECT y, diff, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM chg GROUP BY 1, 2),
           stats AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST((CAST(COUNT(*) AS BIGINT) + 19) // 20 AS BIGINT) AS k
                     FROM chg GROUP BY 1),
           varq AS (SELECT c.y, MIN(c.diff) AS var95
                    FROM (SELECT a.y, a.diff, CAST(SUM(b.cnt) AS BIGINT) AS cum
                          FROM vals a JOIN vals b ON b.y = a.y AND b.diff <= a.diff
                          GROUP BY 1, 2) c
                    JOIN stats ON c.y = stats.y
                    WHERE c.cum >= stats.k GROUP BY 1),
           bt AS (SELECT chg.y, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CASE WHEN chg.diff <= varq.var95 THEN 1 ELSE 0 END)
                           AS BIGINT) AS x
                  FROM chg JOIN varq ON chg.y = varq.y + 1
                  GROUP BY 1
                  HAVING CAST(SUM(CASE WHEN chg.diff <= varq.var95 THEN 1 ELSE 0 END)
                           AS BIGINT) > 0
                     AND CAST(SUM(CASE WHEN chg.diff <= varq.var95 THEN 1 ELSE 0 END)
                           AS BIGINT) < CAST(COUNT(*) AS BIGINT)),
           lr AS (SELECT y AS yr, n, x,
                         -2.0 * (CAST(n - x AS DOUBLE) * -0.0512933
                           + CAST(x AS DOUBLE) * -2.9957323
                           - CAST(n - x AS DOUBLE)
                             * LN(1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                           - CAST(x AS DOUBLE)
                             * LN(CAST(x AS DOUBLE) / CAST(n AS DOUBLE))) AS lr
                  FROM bt)
      SELECT yr, n, x, ROUND(lr, 4) + 0 AS lr_pof,
             CAST(CASE WHEN lr > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_var_model
      FROM lr ORDER BY yr""",

    "q_g_test" -> """
      WITH cells AS (SELECT l_returnflag AS r,
                            CAST(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS BIGINT)
                              AS b,
                            CAST(COUNT(*) AS BIGINT) AS o
                     FROM lineitem GROUP BY 1, 2),
           rm AS (SELECT r, CAST(SUM(o) AS BIGINT) AS ro FROM cells GROUP BY 1),
           cm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS co FROM cells GROUP BY 1),
           nn AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells),
           g AS (SELECT 2.0 * SUM(CAST(o AS DOUBLE)
                   * LN(CAST(o AS DOUBLE)
                     / (CAST(ro AS DOUBLE) * CAST(co AS DOUBLE)
                       / CAST(nn AS DOUBLE)))) AS g_stat
                 FROM cells JOIN rm ON cells.r = rm.r JOIN cm ON cells.b = cm.b, nn)
      SELECT nn AS n_items, ROUND(g_stat, 4) + 0 AS g_stat,
             CAST(CASE WHEN g_stat > 5.991465 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_independent
      FROM nn, g""",

    "q_cohen_h" -> """
      WITH s AS (SELECT
                   CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END) AS BIGINT)
                     AS ne,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06 THEN 1 ELSE 0 END)
                     AS BIGINT) AS nr
                 FROM lineitem),
           p AS (SELECT ne, nr, CAST(a AS DOUBLE) / CAST(ne AS DOUBLE) AS p1,
                        CAST(c AS DOUBLE) / CAST(nr AS DOUBLE) AS p2
                 FROM s)
      SELECT ne AS n_deep, nr AS n_rest, ROUND(p1, 4) + 0 AS p1,
             ROUND(p2, 4) + 0 AS p2,
             ROUND(2.0 * ASIN(SQRT(p1)) - 2.0 * ASIN(SQRT(p2)), 4) + 0 AS cohen_h
      FROM p""",

    "q_cliff_delta" -> """
      WITH gv AS (SELECT o_orderpriority AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
                  GROUP BY 1, 2),
           s AS (SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS nm,
                        CAST(SUM(CASE WHEN a.v > b.v THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS gt,
                        CAST(SUM(CASE WHEN a.v < b.v THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS lt,
                        CAST(SUM(CASE WHEN a.v = b.v THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS eq
                 FROM (SELECT v, cnt FROM gv WHERE g = '1-URGENT') a
                 CROSS JOIN (SELECT v, cnt FROM gv WHERE g = '5-LOW') b)
      SELECT nm AS n_pairs,
             ROUND(CAST(gt - lt AS DOUBLE) / CAST(nm AS DOUBLE), 4) + 0
               AS cliff_delta,
             ROUND(CAST(2 * gt + eq AS DOUBLE) / CAST(2 * nm AS DOUBLE), 4) + 0
               AS vd_a
      FROM s""",

    "q_eta_squared" -> """
      WITH g AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS s,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ss
                 FROM orders GROUP BY 1),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
                        CAST(SUM(s) AS BIGINT) AS st, SUM(ss) AS sst,
                        SUM((CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                          / CAST(n AS DOUBLE)) AS sb
                 FROM g),
           d AS (SELECT k, nn,
                        sb - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                          / CAST(nn AS DOUBLE) AS ssb,
                        sst - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                          / CAST(nn AS DOUBLE) AS sstot,
                        sst - sb AS ssw
                 FROM t)
      SELECT k, nn AS n_orders, ROUND(ssb / sstot, 6) + 0 AS eta_sq,
             ROUND((ssb - (CAST(k AS DOUBLE) - 1.0)
               * (ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))))
               / (sstot + ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 6) + 0
               AS omega_sq
      FROM d""",

    "q_page_trend" -> """
      WITH cell AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           o_orderpriority AS g,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS s,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM orders GROUP BY 1, 2),
           full_b AS (SELECT m FROM cell GROUP BY 1 HAVING COUNT(*) = 5),
           blk AS (SELECT cell.* FROM cell JOIN full_b ON cell.m = full_b.m),
           ranked AS (SELECT a.m, a.g,
                             1 + CAST(SUM(CASE WHEN b.s * a.c > a.s * b.c
                               THEN 1 ELSE 0 END) AS BIGINT) AS rank_b
                      FROM blk a JOIN blk b ON b.m = a.m AND b.g <> a.g
                      GROUP BY 1, 2),
           rj AS (SELECT CAST(substring(g, 1, 1) AS BIGINT) AS j,
                         CAST(SUM(rank_b) AS BIGINT) AS r_sum,
                         CAST(COUNT(*) AS BIGINT) AS n_blocks
                  FROM ranked GROUP BY 1),
           l AS (SELECT MAX(n_blocks) AS n,
                        CAST(SUM(j * r_sum) AS BIGINT) AS l_stat
                 FROM rj)
      SELECT n AS n_blocks, l_stat,
             ROUND((CAST(l_stat AS DOUBLE) - CAST(n AS DOUBLE) * 45.0)
               / SQRT(CAST(n AS DOUBLE) * 25.0), 4) + 0 AS z
      FROM l""",

    "q_jonckheere" -> """
      WITH gv AS (SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders GROUP BY 1, 2),
           pairs AS (SELECT CAST(SUM(CASE WHEN b.v > a.v THEN a.cnt * b.cnt ELSE 0 END)
                              AS BIGINT) AS jgt,
                            CAST(SUM(CASE WHEN b.v = a.v THEN a.cnt * b.cnt ELSE 0 END)
                              AS BIGINT) AS jeq
                     FROM gv a JOIN gv b ON b.j > a.j),
           sizes AS (SELECT CAST(SUM(ng) AS BIGINT) AS nn,
                            CAST(SUM(ng * ng) AS BIGINT) AS sn2,
                            CAST(SUM(ng * ng * (2 * ng + 3)) AS BIGINT) AS sn23
                     FROM (SELECT j, CAST(SUM(cnt) AS BIGINT) AS ng
                           FROM gv GROUP BY 1)),
           d AS (SELECT nn AS n_orders,
                        CAST(2 * jgt + jeq AS DOUBLE) / 2.0 AS jstar,
                        CAST(nn * nn - sn2 AS DOUBLE) / 4.0 AS ej,
                        (CAST(nn * nn AS DOUBLE)
                          * (2.0 * CAST(nn AS DOUBLE) + 3.0)
                          - CAST(sn23 AS DOUBLE)) / 72.0 AS vj
                 FROM pairs, sizes)
      SELECT n_orders, ROUND(jstar, 1) + 0 AS j_stat,
             ROUND((jstar - ej) / SQRT(vj), 4) + 0 AS z
      FROM d""",

    "q_deming_regression" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS ya
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS yb
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           ab AS (SELECT sega.m, ya, yb FROM sega JOIN segb ON sega.m = segb.m),
           agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(ya) AS BIGINT) AS sa, CAST(SUM(yb) AS BIGINT) AS sb,
                          SUM(CAST(ya AS DOUBLE) * CAST(ya AS DOUBLE)) AS saa,
                          SUM(CAST(yb AS DOUBLE) * CAST(yb AS DOUBLE)) AS sbb,
                          SUM(CAST(ya AS DOUBLE) * CAST(yb AS DOUBLE)) AS sab
                   FROM ab),
           mo AS (SELECT n,
                         saa / CAST(n AS DOUBLE)
                           - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)) AS syy,
                         sbb / CAST(n AS DOUBLE)
                           - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS sxx,
                         sab / CAST(n AS DOUBLE)
                           - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS sxy,
                         CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
                         CAST(sb AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
                  FROM agg)
      SELECT n AS n_months,
             ROUND((syy - sxx + SQRT((syy - sxx) * (syy - sxx)
               + 4.0 * sxy * sxy)) / (2.0 * sxy), 4) + 0 AS deming_beta,
             ROUND((ybar - ((syy - sxx + SQRT((syy - sxx) * (syy - sxx)
               + 4.0 * sxy * sxy)) / (2.0 * sxy)) * xbar) / 100.0, 2) + 0
               AS alpha_dollars
      FROM mo""",

    "q_lin_ccc" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS ya
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS yb
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           ab AS (SELECT sega.m, ya, yb FROM sega JOIN segb ON sega.m = segb.m),
           agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(ya) AS BIGINT) AS sa, CAST(SUM(yb) AS BIGINT) AS sb,
                          SUM(CAST(ya AS DOUBLE) * CAST(ya AS DOUBLE)) AS saa,
                          SUM(CAST(yb AS DOUBLE) * CAST(yb AS DOUBLE)) AS sbb,
                          SUM(CAST(ya AS DOUBLE) * CAST(yb AS DOUBLE)) AS sab
                   FROM ab),
           mo AS (SELECT n,
                         saa / CAST(n AS DOUBLE)
                           - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)) AS syy,
                         sbb / CAST(n AS DOUBLE)
                           - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS sxx,
                         sab / CAST(n AS DOUBLE)
                           - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS sxy,
                         (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                           - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS dbar
                  FROM agg)
      SELECT n AS n_months,
             ROUND(sxy / SQRT(sxx * syy), 4) + 0 AS pearson_r,
             ROUND(2.0 * sxy / (sxx + syy + dbar * dbar), 4) + 0 AS lin_ccc,
             ROUND((2.0 * sxy / (sxx + syy + dbar * dbar))
               / (sxy / SQRT(sxx * syy)), 4) + 0 AS bias_correction
      FROM mo""",

    "q_bland_altman" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS ya
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS yb
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           d AS (SELECT sega.m, ya - yb AS d FROM sega JOIN segb ON sega.m = segb.m),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                         SQRT(SUM(CAST(d AS DOUBLE) * CAST(d AS DOUBLE))
                             / CAST(COUNT(*) AS DOUBLE)
                           - (CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                             * (CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                           AS sig
                  FROM d),
           o AS (SELECT n, mu, sig,
                        CAST(SUM(CASE WHEN CAST(d AS DOUBLE) < mu - 1.959964 * sig
                                        OR CAST(d AS DOUBLE) > mu + 1.959964 * sig
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
                 FROM d, st GROUP BY 1, 2, 3)
      SELECT n AS n_months, ROUND(mu / 100.0, 2) + 0 AS mean_diff_dollars,
             ROUND((mu - 1.959964 * sig) / 100.0, 2) + 0 AS loa_lo_dollars,
             ROUND((mu + 1.959964 * sig) / 100.0, 2) + 0 AS loa_hi_dollars,
             n_outside
      FROM o""",

    "q_storey_pi0" -> """
      WITH j AS (SELECT c.c_nationkey AS nk,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           g AS (SELECT CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                        SQRT(CAST(SUM(CAST(tp AS HUGEINT) * tp) AS DOUBLE)
                               / CAST(COUNT(*) AS DOUBLE)
                             - (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                               * (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                          AS sigma
                 FROM j),
           pv AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS ni, CAST(SUM(tp) AS BIGINT) AS si
                  FROM j GROUP BY 1),
           p AS (SELECT ROUND(2.0 / (1.0 + exp(1.702 * abs(
                          (CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) - mu)
                            / (sigma / SQRT(CAST(ni AS DOUBLE)))))), 7) AS p
                 FROM pv, g),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                        CAST(SUM(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_above,
                        CAST(SUM(CASE WHEN p <= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_sig_raw
                 FROM p)
      SELECT m, n_above, n_sig_raw,
             ROUND(CAST(n_above AS DOUBLE) / (0.5 * CAST(m AS DOUBLE)), 4) + 0 AS pi0
      FROM s""",

    "q_ransac_trend" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           tol AS (SELECT CAST(CAST(SUM(rev) AS BIGINT) // (10 * COUNT(*)) AS BIGINT)
                            AS tol
                   FROM rev),
           cand AS (SELECT a.m AS m1, a.rev AS y1, b.m AS m2, b.rev AS y2
                    FROM rev a JOIN rev b ON b.m > a.m),
           votes AS (SELECT m1, m2, y1, y2, CAST(COUNT(*) AS BIGINT) AS inliers
                     FROM cand CROSS JOIN tol JOIN rev p
                       ON ABS((p.rev - y1) * (m2 - m1) - (y2 - y1) * (p.m - m1))
                          <= tol * (m2 - m1)
                     GROUP BY 1, 2, 3, 4),
           best AS (SELECT MAX(inliers) AS best FROM votes),
           win AS (SELECT m1, m2, y1, y2, inliers AS n_inliers
                   FROM votes, best WHERE inliers = best
                   ORDER BY m1, m2 LIMIT 1),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months FROM rev)
      SELECT m1, m2, n_inliers, n_months,
             ROUND(CAST(y2 - y1 AS DOUBLE)
               / (CAST(m2 - m1 AS DOUBLE) * 100.0), 2) + 0
               AS slope_dollars_per_month,
             ROUND(CAST(n_inliers AS DOUBLE) / CAST(n_months AS DOUBLE), 4) + 0
               AS inlier_share
      FROM win, n""",

    "q_katz_centrality" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           und AS (SELECT a.pk AS u, b.pk AS v
                   FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                   GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           dir AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
           deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM dir GROUP BY 1),
           s2 AS (SELECT dir.u, CAST(SUM(dv.d) AS BIGINT) AS s2
                  FROM dir JOIN deg dv ON dir.v = dv.u GROUP BY 1),
           s3 AS (SELECT dir.u, CAST(SUM(sv.s2) AS BIGINT) AS s3
                  FROM dir JOIN s2 sv ON dir.v = sv.u GROUP BY 1)
      SELECT deg.u AS part, deg.d AS degree,
             CAST(4 * deg.d + 2 * s2.s2 + s3.s3 AS BIGINT) AS score8,
             ROUND(CAST(4 * deg.d + 2 * s2.s2 + s3.s3 AS DOUBLE) / 8.0, 4) + 0
               AS katz
      FROM deg JOIN s2 ON deg.u = s2.u JOIN s3 ON deg.u = s3.u
      ORDER BY score8 DESC, part LIMIT 10""",

    "q_regression_discontinuity" -> """
      WITH w AS (SELECT l_extendedprice - 30000.0 AS x,
                        CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
                        l_extendedprice >= 30000.0 AS r
                 FROM lineitem
                 WHERE l_extendedprice >= 20000.0 AND l_extendedprice <= 40000.0),
           s AS (SELECT
                   SUM(CASE WHEN NOT r THEN 1.0 ELSE 0.0 END) AS ln_,
                   SUM(CASE WHEN NOT r THEN x ELSE 0.0 END) AS lsx,
                   SUM(CASE WHEN NOT r THEN x * x ELSE 0.0 END) AS lsxx,
                   SUM(CASE WHEN NOT r THEN y ELSE 0.0 END) AS lsy,
                   SUM(CASE WHEN NOT r THEN x * y ELSE 0.0 END) AS lsxy,
                   SUM(CASE WHEN r THEN 1.0 ELSE 0.0 END) AS rn,
                   SUM(CASE WHEN r THEN x ELSE 0.0 END) AS rsx,
                   SUM(CASE WHEN r THEN x * x ELSE 0.0 END) AS rsxx,
                   SUM(CASE WHEN r THEN y ELSE 0.0 END) AS rsy,
                   SUM(CASE WHEN r THEN x * y ELSE 0.0 END) AS rsxy
                 FROM w),
           f AS (SELECT CAST(ln_ AS BIGINT) AS n_left, CAST(rn AS BIGINT) AS n_right,
                        (ln_ * lsxy - lsx * lsy) / (ln_ * lsxx - lsx * lsx) AS bl,
                        (rn * rsxy - rsx * rsy) / (rn * rsxx - rsx * rsx) AS br,
                        lsy / ln_ - (ln_ * lsxy - lsx * lsy)
                          / (ln_ * lsxx - lsx * lsx) * (lsx / ln_) AS al,
                        rsy / rn - (rn * rsxy - rsx * rsy)
                          / (rn * rsxx - rsx * rsx) * (rsx / rn) AS ar
                 FROM s)
      SELECT n_left, n_right, ROUND(ar - al, 4) + 0 AS rd_jump,
             ROUND(bl * 10000.0, 6) + 0 AS slope_left_per_10k,
             ROUND(br * 10000.0, 6) + 0 AS slope_right_per_10k
      FROM f""",

    "q_logrank_test" -> """
      WITH obs AS (SELECT CAST(user_id % 2 AS BIGINT) AS g,
                          CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS BIGINT) AS t,
                          CASE WHEN MAX(CAST(ts AS DATE)) <= DATE '2024-01-23'
                               THEN 1 ELSE 0 END AS churned
                   FROM events GROUP BY user_id, user_id % 2),
           byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at,
                          CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_at1,
                          CAST(SUM(churned) AS BIGINT) AS d,
                          CAST(SUM(CASE WHEN g = 0 THEN churned ELSE 0 END) AS BIGINT)
                            AS d1
                   FROM obs GROUP BY 1),
           risk AS (SELECT a.t, a.d, a.d1 AS dd1,
                           CAST(SUM(b.n_at) AS BIGINT) AS nr,
                           CAST(SUM(b.n_at1) AS BIGINT) AS nr1
                    FROM byt a JOIN byt b ON b.t >= a.t
                    GROUP BY 1, 2, 3
                    HAVING a.d > 0 AND CAST(SUM(b.n_at) AS BIGINT) > 1),
           s AS (SELECT CAST(SUM(dd1) AS BIGINT) AS o1,
                        SUM(CAST(d AS DOUBLE) * CAST(nr1 AS DOUBLE)
                          / CAST(nr AS DOUBLE)) AS e1,
                        SUM(CAST(d AS DOUBLE)
                          * (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                          * (1.0 - CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                          * CAST(nr - d AS DOUBLE)
                          / (CAST(nr AS DOUBLE) - 1.0)) AS v
                 FROM risk)
      SELECT o1 AS observed_g0, ROUND(e1, 4) + 0 AS expected_g0,
             ROUND((CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v, 4) + 0
               AS chi2,
             CAST(CASE WHEN (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v
               > 3.841459 THEN 1 ELSE 0 END AS BIGINT) AS curves_differ
      FROM s""",

    "q_nelson_aalen" -> """
      WITH obs AS (SELECT CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS BIGINT) AS t,
                          CASE WHEN MAX(CAST(ts AS DATE)) <= DATE '2024-01-23'
                               THEN 1 ELSE 0 END AS churned
                   FROM events GROUP BY user_id),
           byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at,
                          CAST(SUM(churned) AS BIGINT) AS d
                   FROM obs GROUP BY 1),
           risk AS (SELECT a.t, a.n_at, a.d, CAST(SUM(b.n_at) AS BIGINT) AS nr
                    FROM byt a JOIN byt b ON b.t >= a.t
                    GROUP BY 1, 2, 3),
           na AS (SELECT a.t, a.nr AS n_risk, a.d,
                         SUM(CAST(b.d AS DOUBLE) / CAST(b.nr AS DOUBLE)) AS h,
                         SUM(CAST(b.d AS DOUBLE)
                           / (CAST(b.nr AS DOUBLE) * CAST(b.nr AS DOUBLE))) AS vh
                  FROM risk a JOIN risk b ON b.t <= a.t
                  GROUP BY 1, 2, 3)
      SELECT t, n_risk, d AS n_churned, ROUND(h, 4) + 0 AS na_cumhaz,
             ROUND(SQRT(vh), 4) + 0 AS na_se
      FROM na ORDER BY t""",

    "q_yuen_ttest" -> """
      WITH gv AS (SELECT o_orderpriority AS g,
                         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                           AS BIGINT) AS v,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
                  GROUP BY 1, 2),
           stats AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n,
                            CAST(CAST(SUM(cnt) AS BIGINT) // 5 AS BIGINT) AS tr
                     FROM gv GROUP BY 1),
           cum AS (SELECT a.g, a.v, a.cnt,
                          CAST(COALESCE(SUM(b.cnt), 0) AS BIGINT) AS cb, n, tr
                   FROM gv a LEFT JOIN gv b ON b.g = a.g AND b.v < a.v
                   JOIN stats ON stats.g = a.g
                   GROUP BY a.g, a.v, a.cnt, n, tr),
           kept AS (SELECT g, v, n, tr,
                           GREATEST(LEAST(cb + cnt, n - tr) - GREATEST(cb, tr), 0)
                             AS keep
                    FROM cum),
           bounds AS (SELECT g, n, tr,
                             MIN(CASE WHEN cb + cnt >= tr + 1 THEN v END) AS vlo,
                             MIN(CASE WHEN cb + cnt >= n - tr THEN v END) AS vhi
                      FROM cum GROUP BY 1, 2, 3),
           core AS (SELECT g, CAST(SUM(keep * v) AS BIGINT) AS tsum,
                           CAST(SUM(keep * v * v) AS BIGINT) AS tss,
                           CAST(SUM(keep) AS BIGINT) AS h
                    FROM kept GROUP BY 1),
           agg AS (SELECT core.g, n, tr, h,
                          CAST(tsum AS DOUBLE) / CAST(h AS DOUBLE) AS tmean,
                          CAST(tss + tr * vlo * vlo + tr * vhi * vhi AS DOUBLE)
                            / CAST(n AS DOUBLE)
                          - (CAST(tsum + tr * vlo + tr * vhi AS DOUBLE)
                            / CAST(n AS DOUBLE))
                            * (CAST(tsum + tr * vlo + tr * vhi AS DOUBLE)
                              / CAST(n AS DOUBLE)) AS wvar
                   FROM core JOIN bounds ON core.g = bounds.g),
           dt AS (SELECT g, n, h, tmean,
                         wvar * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)
                           * (CAST(n AS DOUBLE) - 1.0)
                           / (CAST(h AS DOUBLE) * (CAST(h AS DOUBLE) - 1.0)) AS dterm
                  FROM agg),
           ab AS (SELECT a.h AS h1, b.h AS h2, a.tmean AS tm1, b.tmean AS tm2,
                         a.dterm AS d1, b.dterm AS d2
                  FROM (SELECT * FROM dt WHERE g = '1-URGENT') a,
                       (SELECT * FROM dt WHERE g = '5-LOW') b)
      SELECT h1, h2,
             ROUND((tm1 - tm2) / 100.0, 2) + 0 AS trimmed_diff_dollars,
             ROUND((tm1 - tm2) / SQRT(d1 + d2), 4) + 0 AS yuen_t,
             CAST(CASE WHEN ABS((tm1 - tm2) / SQRT(d1 + d2)) > 1.959964
               THEN 1 ELSE 0 END AS BIGINT) AS reject_equal_trimmed
      FROM ab""",

    "q_abc_xyz_matrix" -> """
      WITH li AS (SELECT l_partkey AS p,
                         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
                           AS m,
                         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS rev,
                         CAST(l_quantity AS BIGINT) AS q
                  FROM lineitem),
           part AS (SELECT p, CAST(CAST(SUM(rev) AS BIGINT) // 10000 AS BIGINT) AS rv
                    FROM li GROUP BY 1),
           pm AS (SELECT p,
                         SQRT(CAST(sqq AS DOUBLE) / CAST(nm AS DOUBLE)
                           - (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE))
                             * (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE)))
                           / (CAST(sq AS DOUBLE) / CAST(nm AS DOUBLE)) AS cv
                  FROM (SELECT p, CAST(COUNT(*) AS BIGINT) AS nm,
                               CAST(SUM(qm) AS BIGINT) AS sq,
                               CAST(SUM(qm * qm) AS BIGINT) AS sqq
                        FROM (SELECT p, m, CAST(SUM(q) AS BIGINT) AS qm
                              FROM li GROUP BY 1, 2)
                        GROUP BY 1)),
           vals AS (SELECT rv, CAST(COUNT(*) AS BIGINT) AS t FROM part GROUP BY 1),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                          CAST((4 * CAST(SUM(t) AS BIGINT) + 4) // 5 AS BIGINT) AS k80,
                          CAST((19 * CAST(SUM(t) AS BIGINT) + 19) // 20 AS BIGINT)
                            AS k95
                   FROM vals),
           cuts AS (SELECT MIN(CASE WHEN cum >= k80 THEN rv END) AS c80,
                           MIN(CASE WHEN cum >= k95 THEN rv END) AS c95
                    FROM (SELECT a.rv, CAST(SUM(b.t) AS BIGINT) AS cum
                          FROM vals a JOIN vals b ON b.rv <= a.rv GROUP BY 1), tot),
           cls AS (SELECT CASE WHEN rv > c95 THEN 'A' WHEN rv > c80 THEN 'B'
                               ELSE 'C' END AS abc,
                          CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y'
                               ELSE 'Z' END AS xyz,
                          rv
                   FROM part JOIN pm ON part.p = pm.p, cuts)
      SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(rv) AS BIGINT) AS rev_bins
      FROM cls GROUP BY 1, 2 ORDER BY abc, xyz""",

    "q_gmm_em_step" -> """
      WITH x AS (SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          / 100.0 AS x
                 FROM orders),
           r AS (SELECT x,
                        1.0 / (1.0 + EXP(((x - 300000.0) * (x - 300000.0)
                          - (x - 100000.0) * (x - 100000.0)) / 2.0e10)) AS r2
                 FROM x),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(r2) AS sr2,
                        SUM(r2 * x) AS sx2, SUM((1.0 - r2) * x) AS sx1
                 FROM r)
      SELECT n AS n_orders,
             ROUND(sr2 / CAST(n AS DOUBLE), 4) + 0 AS pi2_new,
             ROUND(sx1 / (CAST(n AS DOUBLE) - sr2), 2) + 0 AS mu1_new,
             ROUND(sx2 / sr2, 2) + 0 AS mu2_new
      FROM s""",

    "q_propensity_balance" -> """
      WITH s AS (SELECT -2.0 + 30.0 * l_discount
                          + 0.02 * CAST(l_quantity AS DOUBLE) AS s,
                        l_extendedprice > 30000.0 AS tr,
                        CAST(l_quantity AS BIGINT) AS q
                 FROM lineitem),
           st AS (SELECT CASE WHEN s < -1.0 THEN 0 WHEN s < -0.5 THEN 1
                              WHEN s < 0.0 THEN 2 WHEN s < 0.5 THEN 3
                              ELSE 4 END AS stratum, tr, q
                  FROM s),
           g AS (SELECT CAST(stratum AS BIGINT) AS stratum,
                        CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                        CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                        CAST(SUM(CASE WHEN tr THEN q ELSE 0 END) AS BIGINT) AS sqt,
                        CAST(SUM(CASE WHEN NOT tr THEN q ELSE 0 END) AS BIGINT) AS sqc,
                        CAST(SUM(CASE WHEN tr THEN q * q ELSE 0 END) AS BIGINT)
                          AS sqqt,
                        CAST(SUM(CASE WHEN NOT tr THEN q * q ELSE 0 END) AS BIGINT)
                          AS sqqc
                 FROM st GROUP BY 1
                 HAVING CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) > 0
                    AND CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) > 0)
      SELECT stratum, nt, nc,
             ROUND((CAST(sqt AS DOUBLE) / CAST(nt AS DOUBLE)
               - CAST(sqc AS DOUBLE) / CAST(nc AS DOUBLE))
               / SQRT(((CAST(sqqt AS DOUBLE) / CAST(nt AS DOUBLE)
                 - (CAST(sqt AS DOUBLE) / CAST(nt AS DOUBLE))
                   * (CAST(sqt AS DOUBLE) / CAST(nt AS DOUBLE)))
                 + (CAST(sqqc AS DOUBLE) / CAST(nc AS DOUBLE)
                   - (CAST(sqc AS DOUBLE) / CAST(nc AS DOUBLE))
                     * (CAST(sqc AS DOUBLE) / CAST(nc AS DOUBLE))))
                 / 2.0), 4) + 0 AS std_diff_qty
      FROM g ORDER BY stratum""",

    "q_benjamini_yekutieli" -> """
      WITH j AS (SELECT c.c_nationkey AS nk,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           g AS (SELECT CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                        SQRT(CAST(SUM(CAST(tp AS HUGEINT) * tp) AS DOUBLE)
                               / CAST(COUNT(*) AS DOUBLE)
                             - (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                               * (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                          AS sigma
                 FROM j),
           pv AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS ni,
                         CAST(SUM(tp) AS BIGINT) AS si
                  FROM j GROUP BY 1),
           p AS (SELECT nk, ROUND(2.0 / (1.0 + exp(1.702 * abs(
                          (CAST(si AS DOUBLE) / CAST(ni AS DOUBLE) - mu)
                            / (sigma / SQRT(CAST(ni AS DOUBLE)))))), 7) AS p
                 FROM pv, g),
           rk AS (SELECT a.nk, a.p, CAST(COUNT(*) AS BIGINT) AS rk
                  FROM p a JOIN p b ON b.p < a.p OR (b.p = a.p AND b.nk <= a.nk)
                  GROUP BY 1, 2),
           mc AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                         SUM(1.0 / CAST(rk AS DOUBLE)) AS cm
                  FROM rk),
           fl AS (SELECT nk, p, rk, cm,
                         CASE WHEN p <= CAST(rk AS DOUBLE) * 0.10
                                        / (CAST(m AS DOUBLE) * cm)
                              THEN 1 ELSE 0 END AS passes
                  FROM rk, mc),
           ks AS (SELECT COALESCE(MAX(CASE WHEN passes = 1 THEN rk END),
                    CAST(0 AS BIGINT)) AS kstar FROM fl)
      SELECT nk AS nationkey, p + 0 AS p_approx, rk AS by_rank,
             ROUND(cm, 6) + 0 AS c_m,
             CAST(CASE WHEN rk <= kstar THEN 1 ELSE 0 END AS BIGINT) AS rejected
      FROM fl, ks ORDER BY nationkey""",

    "q_harmonic_centrality" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           und AS (SELECT a.pk AS u, b.pk AS v
                   FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                   GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           dir AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
           deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM dir GROUP BY 1),
           seeds AS (SELECT u AS s0 FROM deg ORDER BY d DESC, u LIMIT 100),
           d1 AS (SELECT s0, v AS w FROM seeds JOIN dir ON s0 = dir.u),
           r2 AS (SELECT DISTINCT d1.s0, dir.v AS w
                  FROM d1 JOIN dir ON d1.w = dir.u
                  WHERE dir.v <> d1.s0),
           d2 AS (SELECT r2.s0, r2.w FROM r2
                  WHERE NOT EXISTS (SELECT 1 FROM d1
                                    WHERE d1.s0 = r2.s0 AND d1.w = r2.w)),
           r3 AS (SELECT DISTINCT d2.s0, dir.v AS w
                  FROM d2 JOIN dir ON d2.w = dir.u
                  WHERE dir.v <> d2.s0),
           d3 AS (SELECT r3.s0, r3.w FROM r3
                  WHERE NOT EXISTS (SELECT 1 FROM d1
                                    WHERE d1.s0 = r3.s0 AND d1.w = r3.w)
                    AND NOT EXISTS (SELECT 1 FROM d2
                                    WHERE d2.s0 = r3.s0 AND d2.w = r3.w)),
           c1 AS (SELECT s0, CAST(COUNT(*) AS BIGINT) AS n1 FROM d1 GROUP BY 1),
           c2 AS (SELECT s0, CAST(COUNT(*) AS BIGINT) AS n2 FROM d2 GROUP BY 1),
           c3 AS (SELECT s0, CAST(COUNT(*) AS BIGINT) AS n3 FROM d3 GROUP BY 1),
           h AS (SELECT c1.s0 AS part, n1, COALESCE(n2, 0) AS n2,
                        COALESCE(n3, 0) AS n3
                 FROM c1 LEFT JOIN c2 ON c1.s0 = c2.s0
                 LEFT JOIN c3 ON c1.s0 = c3.s0)
      SELECT part, n1, n2, n3,
             CAST(6 * n1 + 3 * n2 + 2 * n3 AS BIGINT) AS h6,
             ROUND(CAST(6 * n1 + 3 * n2 + 2 * n3 AS DOUBLE) / 6.0, 4) + 0
               AS harmonic
      FROM h ORDER BY h6 DESC, part LIMIT 10""",

    "q_burt_constraint" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           und AS (SELECT a.pk AS u, b.pk AS v
                   FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                   GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           dir AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
           deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM dir GROUP BY 1),
           seeds AS (SELECT u AS i, d AS di FROM deg ORDER BY d DESC, u LIMIT 100),
           sedges AS (SELECT i, di, v AS j FROM seeds JOIN dir ON i = dir.u),
           ind AS (SELECT e.i, e.j, SUM(1.0 / CAST(e.di AS DOUBLE)
                     / CAST(dq.d AS DOUBLE)) AS indirect
                   FROM sedges e
                   JOIN dir p1 ON p1.u = e.i
                   JOIN dir p2 ON p2.u = p1.v AND p2.v = e.j
                   JOIN deg dq ON dq.u = p1.v
                   GROUP BY 1, 2),
           cij AS (SELECT sedges.i, di,
                          (1.0 / CAST(di AS DOUBLE) + COALESCE(indirect, 0.0))
                            * (1.0 / CAST(di AS DOUBLE) + COALESCE(indirect, 0.0))
                            AS cij
                   FROM sedges LEFT JOIN ind
                     ON sedges.i = ind.i AND sedges.j = ind.j),
           c AS (SELECT i AS part, di AS degree, ROUND(SUM(cij), 6) + 0
                          AS constraint_score
                 FROM cij GROUP BY 1, 2)
      SELECT part, degree, constraint_score AS "constraint"
      FROM c ORDER BY constraint_score DESC, part LIMIT 10""",

    "q_cross_elasticity" -> """
      WITH a AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                          AS m,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qa
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 JOIN orders ON l_orderkey = o_orderkey
                 WHERE p_brand = 'Brand#4' GROUP BY 1),
           b AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                          AS m,
                        CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS priceb
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 JOIN orders ON l_orderkey = o_orderkey
                 WHERE p_brand = 'Brand#2' GROUP BY 1),
           l AS (SELECT LN(CAST(qa AS DOUBLE)) AS ly, LN(priceb) AS lx
                 FROM a JOIN b ON a.m = b.m),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
                        SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx, SUM(ly * ly) AS syy
                 FROM l)
      SELECT n AS n_months,
             ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) + 0 AS cross_elasticity,
             ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
                 * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 4) + 0 AS ln_corr
      FROM s""",

    "q_safety_stock" -> """
      WITH wk AS (SELECT l_returnflag AS flag,
                         CAST(date_diff('day', DATE '1992-01-01', l_shipdate)
                           AS BIGINT) // 7 AS wk,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
                  FROM lineitem GROUP BY 1, 2),
           s AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_weeks,
                        CAST(SUM(q) AS BIGINT) AS sq,
                        SUM(CAST(q AS DOUBLE) * CAST(q AS DOUBLE)) AS sqq
                 FROM wk GROUP BY 1),
           m AS (SELECT flag, n_weeks,
                        CAST(sq AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS mu,
                        SQRT(sqq / CAST(n_weeks AS DOUBLE)
                          - (CAST(sq AS DOUBLE) / CAST(n_weeks AS DOUBLE))
                            * (CAST(sq AS DOUBLE) / CAST(n_weeks AS DOUBLE))) AS sig
                 FROM s)
      SELECT flag, n_weeks, ROUND(mu, 2) + 0 AS mean_weekly_qty,
             ROUND(sig, 4) + 0 AS sd_weekly_qty,
             ROUND(1.6448536 * sig * SQRT(2.0), 2) + 0 AS safety_stock,
             ROUND(mu * 2.0 + 1.6448536 * sig * SQRT(2.0), 2) + 0 AS reorder_point
      FROM m ORDER BY flag""",

    "q_theil_u2" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pred AS (SELECT a.m, a.rev AS actual,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2 HAVING COUNT(*) = 12),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM((yhat - CAST(actual AS DOUBLE))
                          * (yhat - CAST(actual AS DOUBLE))) AS ssm,
                        SUM(CAST(nv.rev - pred.actual AS DOUBLE)
                          * CAST(nv.rev - pred.actual AS DOUBLE)) AS ssn
                 FROM pred JOIN rev nv ON nv.m + 1 = pred.m)
      SELECT n AS n_forecasts, ROUND(SQRT(ssm / ssn), 4) + 0 AS theil_u2,
             CAST(CASE WHEN ssm < ssn THEN 1 ELSE 0 END AS BIGINT) AS beats_naive
      FROM s""",

    "q_diebold_mariano" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pred AS (SELECT a.m, a.rev AS actual,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2 HAVING COUNT(*) = 12),
           d AS (SELECT (yhat - CAST(actual AS DOUBLE))
                          * (yhat - CAST(actual AS DOUBLE))
                        - CAST(nv.rev - pred.actual AS DOUBLE)
                          * CAST(nv.rev - pred.actual AS DOUBLE) AS d
                 FROM pred JOIN rev nv ON nv.m + 1 = pred.m),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(d) AS sd,
                        SUM(d * d) AS sdd
                 FROM d)
      SELECT n AS n_forecasts,
             ROUND((sd / CAST(n AS DOUBLE))
               / SQRT((sdd / CAST(n AS DOUBLE)
                 - (sd / CAST(n AS DOUBLE)) * (sd / CAST(n AS DOUBLE)))
                 / CAST(n AS DOUBLE)), 4) + 0 AS dm_stat,
             CAST(CASE WHEN sd < 0.0 THEN 1 ELSE 0 END AS BIGINT) AS ses_better
      FROM s""",

    "q_mincer_zarnowitz" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pred AS (SELECT a.m, a.rev AS actual,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2 HAVING COUNT(*) = 12),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(yhat) AS sx, SUM(CAST(actual AS DOUBLE)) AS sy,
                        SUM(yhat * CAST(actual AS DOUBLE)) AS sxy,
                        SUM(yhat * yhat) AS sxx,
                        SUM(CAST(actual AS DOUBLE) * CAST(actual AS DOUBLE)) AS syy
                 FROM pred),
           f AS (SELECT n,
                        (CAST(n AS DOUBLE) * sxy - sx * sy)
                          / (CAST(n AS DOUBLE) * sxx - sx * sx) AS b,
                        sxx - sx * sx / CAST(n AS DOUBLE) AS cxx,
                        syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
                        sxy - sx * sy / CAST(n AS DOUBLE) AS cxy,
                        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
                        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
                 FROM s)
      SELECT n AS n_forecasts,
             ROUND((ybar - b * xbar) / 100.0, 2) + 0 AS alpha_dollars,
             ROUND(b, 4) + 0 AS beta,
             ROUND((b - 1.0)
               / SQRT(((cyy - b * cxy) / (CAST(n AS DOUBLE) - 2.0)) / cxx), 4) + 0
               AS t_beta_vs_1
      FROM f""",

    "q_directional_accuracy" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pred AS (SELECT a.m, a.rev AS actual,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2 HAVING COUNT(*) = 12),
           h AS (SELECT CASE WHEN SIGN(a.yhat - CAST(b.actual AS DOUBLE))
                               = SIGN(CAST(a.actual - b.actual AS DOUBLE))
                             THEN 1 ELSE 0 END AS hit
                 FROM pred a JOIN pred b ON b.m = a.m - 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(hit) AS BIGINT) AS hits
                 FROM h)
      SELECT n, hits,
             ROUND(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0 AS hit_rate,
             ROUND((CAST(hits AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
               / SQRT(CAST(n AS DOUBLE) / 4.0), 4) + 0 AS z
      FROM s""",

    "q_lexical_density" -> """
      WITH t AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                 FROM documents),
           s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                        CAST(SUM(CASE WHEN word IN ('the','a','an','and','or','of',
                          'to','in','is','it','that','as','for','on','with','was',
                          'be','by','at','this','are','from','not','but','have')
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
                 FROM t GROUP BY 1)
      SELECT lang, n_tokens, n_stop,
             ROUND(CAST(n_tokens - n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
               + 0 AS lexical_density
      FROM s ORDER BY lang""",

    "q_mean_token_logfreq" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                 FROM documents),
           wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
           d AS (SELECT doc_id, AVG(LN(CAST(c AS DOUBLE))) AS mlf
                 FROM t JOIN wc ON t.word = wc.word GROUP BY 1)
      SELECT CAST(FLOOR(mlf) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(AVG(mlf), 4) + 0 AS mean_logfreq
      FROM d GROUP BY 1 ORDER BY bucket""",

    "q_xmr_chart" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           mr AS (SELECT CAST(COUNT(*) AS BIGINT) AS nmr,
                         CAST(SUM(ABS(b.rev - a.rev)) AS BIGINT) AS smr
                  FROM rev a JOIN rev b ON b.d = a.d + 1),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS s
                  FROM rev),
           lim AS (SELECT n, nmr,
                          CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
                          CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE) AS mrbar,
                          CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            + 2.66 * (CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE))
                            AS ucl,
                          CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                            - 2.66 * (CAST(smr AS DOUBLE) / CAST(nmr AS DOUBLE))
                            AS lcl
                   FROM st, mr),
           v AS (SELECT n, xbar, mrbar, ucl, lcl,
                        CAST(SUM(CASE WHEN CAST(rev AS DOUBLE) > ucl
                                        OR CAST(rev AS DOUBLE) < lcl
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
                 FROM rev, lim GROUP BY 1, 2, 3, 4, 5)
      SELECT n AS n_days, ROUND(xbar / 100.0, 2) + 0 AS mean_dollars,
             ROUND(mrbar / 100.0, 2) + 0 AS mrbar_dollars,
             ROUND(ucl / 100.0, 2) + 0 AS ucl_dollars,
             ROUND(lcl / 100.0, 2) + 0 AS lcl_dollars, n_violations
      FROM v""",

    "q_p_chart" -> """
      WITH wk AS (SELECT CAST(date_diff('day', DATE '1992-01-01', l_shipdate)
                           AS BIGINT) // 7 AS wk,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                           AS BIGINT) AS r
                  FROM lineitem GROUP BY 1),
           pool AS (SELECT CAST(SUM(r) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS pbar
                    FROM wk),
           lims AS (SELECT pbar, CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                           pbar + 3.0 * SQRT(pbar * (1.0 - pbar)
                             / CAST(n AS DOUBLE)) AS ucl,
                           pbar - 3.0 * SQRT(pbar * (1.0 - pbar)
                             / CAST(n AS DOUBLE)) AS lcl
                    FROM wk, pool),
           s AS (SELECT pbar, CAST(COUNT(*) AS BIGINT) AS n_weeks,
                        CAST(SUM(CASE WHEN p > ucl THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_above,
                        CAST(SUM(CASE WHEN p < lcl THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_below
                 FROM lims GROUP BY 1)
      SELECT n_weeks, ROUND(pbar, 4) + 0 AS pbar, n_above, n_below
      FROM s""",

    "q_brand_overlap" -> """
      WITH a AS (SELECT DISTINCT p_brand AS b
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN part ON l_partkey = p_partkey
                 WHERE c_mktsegment = 'BUILDING'),
           bb AS (SELECT DISTINCT p_brand AS b
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN part ON l_partkey = p_partkey
                  WHERE c_mktsegment = 'AUTOMOBILE'),
           s AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_building,
                        (SELECT CAST(COUNT(*) AS BIGINT) FROM bb) AS n_automobile,
                        (SELECT CAST(COUNT(*) AS BIGINT)
                         FROM a JOIN bb ON a.b = bb.b) AS n_inter)
      SELECT n_building, n_automobile, n_inter,
             n_building + n_automobile - n_inter AS n_union,
             ROUND(CAST(n_inter AS DOUBLE)
               / CAST(n_building + n_automobile - n_inter AS DOUBLE), 4) + 0
               AS jaccard
      FROM s""",

    "q_share_of_wallet" -> """
      WITH cb AS (SELECT o_custkey AS c, p_brand AS b,
                         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                           AS BIGINT) AS s
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN part ON l_partkey = p_partkey
                  GROUP BY 1, 2),
           cu AS (SELECT c, MAX(s) AS top, CAST(SUM(s) AS BIGINT) AS tot
                  FROM cb GROUP BY 1)
      SELECT CAST((top * 10) // tot AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             ROUND(AVG(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE)), 4) + 0
               AS mean_share
      FROM cu GROUP BY 1 ORDER BY bucket""",

    "q_weibull_fit" -> """
      WITH od AS (SELECT DISTINCT o_custkey AS c, o_orderdate AS dt FROM orders),
           nxt AS (SELECT a.c, a.dt, MIN(b.dt) AS nxt
                   FROM od a JOIN od b ON b.c = a.c AND b.dt > a.dt
                   GROUP BY 1, 2),
           gaps AS (SELECT CAST(date_diff('day', dt, nxt) AS BIGINT) AS t
                    FROM nxt
                    WHERE CAST(date_diff('day', dt, nxt) AS BIGINT) >= 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(LN(CAST(t AS DOUBLE))) AS sl,
                        SUM(LN(CAST(t AS DOUBLE)) * LN(CAST(t AS DOUBLE))) AS sll
                 FROM gaps),
           m AS (SELECT n, sl / CAST(n AS DOUBLE) AS ml,
                        SQRT(sll / CAST(n AS DOUBLE)
                          - (sl / CAST(n AS DOUBLE)) * (sl / CAST(n AS DOUBLE)))
                          AS sdl
                 FROM s)
      SELECT n AS n_gaps, ROUND(1.2825498 / sdl, 4) + 0 AS shape_k,
             ROUND(EXP(ml + 0.5772157 / (1.2825498 / sdl)), 2) + 0 AS scale_days,
             ROUND(EXP(ml), 2) + 0 AS geo_mean_days
      FROM m""",

    "q_lognormal_fit" -> """
      WITH l AS (SELECT LN(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                        / 100.0) AS lx
                 FROM orders),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(lx) AS sl,
                        SUM(lx * lx) AS sll
                 FROM l),
           m AS (SELECT n, sl / CAST(n AS DOUBLE) AS mu,
                        SQRT(sll / CAST(n AS DOUBLE)
                          - (sl / CAST(n AS DOUBLE)) * (sl / CAST(n AS DOUBLE)))
                          AS sig
                 FROM s)
      SELECT n AS n_orders, ROUND(mu, 4) + 0 AS mu_ln, ROUND(sig, 4) + 0 AS sigma_ln,
             ROUND(EXP(mu), 2) + 0 AS median_dollars,
             ROUND(EXP(mu + sig * sig / 2.0), 2) + 0 AS mean_dollars
      FROM m""",

    "q_markov_entropy_rate" -> """
      WITH pair AS (SELECT event_type AS src,
                           LEAD(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS dst
                    FROM events),
           cells AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
                     FROM pair WHERE dst IS NOT NULL GROUP BY 1, 2),
           rw AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rt FROM cells GROUP BY 1),
           tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cells),
           h AS (SELECT MAX(nn) AS n_transitions,
                        SUM(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
                          * LN(CAST(c AS DOUBLE) / CAST(rt AS DOUBLE))) AS h
                 FROM cells JOIN rw ON cells.src = rw.src, tot)
      SELECT n_transitions, ROUND(h, 4) + 0 AS entropy_rate_nats,
             ROUND(h / 0.6931472, 4) + 0 AS entropy_rate_bits
      FROM h""",

    "q_mg1_queue" -> """
      WITH k AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
                 FROM lineitem GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
                        CAST(SUM(k * k) AS BIGINT) AS skk
                 FROM k),
           c AS (SELECT n,
                        (CAST(skk AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)))
                          / ((CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))) AS cv2
                 FROM s),
           rhos AS (SELECT CAST(r AS DOUBLE) AS rho
                    FROM (VALUES (0.5), (0.8), (0.9)) t(r))
      SELECT rho, n AS n_orders, ROUND(cv2, 4) + 0 AS service_cv2,
             ROUND(rho * (1.0 + cv2) / (2.0 * (1.0 - rho)), 4) + 0
               AS wq_over_service
      FROM c CROSS JOIN rhos ORDER BY rho""",

    "q_h_index" -> """
      WITH pc AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT DISTINCT l_partkey AS p, l_orderkey AS ok
                        FROM lineitem)
                  GROUP BY 1),
           vals AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM pc GROUP BY 1),
           nge AS (SELECT a.c AS v, CAST(SUM(b.t) AS BIGINT) AS nge
                   FROM vals a JOIN vals b ON b.c >= a.c GROUP BY 1),
           h AS (SELECT MAX(LEAST(v, nge)) AS h_index FROM nge),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                         MAX(c) AS max_count
                  FROM pc)
      SELECT n_parts, max_count, h_index FROM st, h""",

    "q_clumpiness" -> """
      WITH od AS (SELECT DISTINCT o_custkey AS c, o_orderdate AS dt FROM orders),
           nxt AS (SELECT a.c, a.dt, MIN(b.dt) AS nxt
                   FROM od a JOIN od b ON b.c = a.c AND b.dt > a.dt
                   GROUP BY 1, 2),
           gaps AS (SELECT c, CAST(date_diff('day', dt, nxt) AS BIGINT) AS t
                    FROM nxt
                    WHERE CAST(date_diff('day', dt, nxt) AS BIGINT) >= 1),
           cust AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS ng,
                           CAST(SUM(t) AS BIGINT) AS st
                    FROM gaps GROUP BY 1 HAVING COUNT(*) >= 2),
           x AS (SELECT gaps.c, ng,
                        CAST(t AS DOUBLE) / CAST(st AS DOUBLE) AS x
                 FROM gaps JOIN cust ON gaps.c = cust.c),
           cl AS (SELECT c, ng, 1.0 + SUM(x * LN(x)) / LN(CAST(ng AS DOUBLE)) AS cl
                  FROM x GROUP BY 1, 2)
      SELECT ng AS n_gaps, CAST(COUNT(*) AS BIGINT) AS n_customers,
             ROUND(AVG(cl), 4) + 0 AS mean_clumpiness
      FROM cl GROUP BY 1 ORDER BY n_gaps""",

    "q_gpd_pot" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           chg AS (SELECT b.d AS d, b.rev - a.rev AS diff
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           vals AS (SELECT diff, CAST(COUNT(*) AS BIGINT) AS cnt FROM chg GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST((CAST(COUNT(*) AS BIGINT) + 19) // 20 AS BIGINT) AS k
                   FROM chg),
           u AS (SELECT MIN(diff) AS u
                 FROM (SELECT a.diff, CAST(SUM(b.cnt) AS BIGINT) AS cum
                       FROM vals a JOIN vals b ON b.diff <= a.diff GROUP BY 1), tot
                 WHERE cum >= k),
           y AS (SELECT u, u - diff AS y FROM chg, u WHERE u - diff > 0),
           s AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
                        SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy
                 FROM y GROUP BY 1),
           m AS (SELECT u AS threshold_cents, n AS n_exceed,
                        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                        syy / CAST(n AS DOUBLE)
                          - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS s2
                 FROM s)
      SELECT threshold_cents, n_exceed,
             ROUND(0.5 * (1.0 - m * m / s2), 4) + 0 AS xi,
             ROUND(0.5 * m * (m * m / s2 + 1.0) / 100.0, 2) + 0 AS beta_dollars
      FROM m""",

    "q_extremal_index" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           chg AS (SELECT b.d AS d, b.rev - a.rev AS diff
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           vals AS (SELECT diff, CAST(COUNT(*) AS BIGINT) AS cnt FROM chg GROUP BY 1),
           tot AS (SELECT CAST((CAST(COUNT(*) AS BIGINT) + 19) // 20 AS BIGINT) AS k
                   FROM chg),
           u AS (SELECT MIN(diff) AS u
                 FROM (SELECT a.diff, CAST(SUM(b.cnt) AS BIGINT) AS cum
                       FROM vals a JOIN vals b ON b.diff <= a.diff GROUP BY 1), tot
                 WHERE cum >= k),
           ex AS (SELECT d FROM chg, u WHERE u - diff > 0),
           starts AS (SELECT a.d FROM ex a
                      LEFT JOIN ex b ON b.d = a.d - 1 OR b.d = a.d - 2
                      GROUP BY 1 HAVING COUNT(b.d) = 0)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_exceed,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM starts) AS n_clusters,
             ROUND((SELECT CAST(COUNT(*) AS DOUBLE) FROM starts)
               / (SELECT CAST(COUNT(*) AS DOUBLE) FROM ex), 4) + 0
               AS extremal_index""",

    "q_records_test" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pm AS (SELECT a.m, a.rev AS rv, COALESCE(MAX(b.rev), -1) AS prior_max
                  FROM rev a LEFT JOIN rev b ON b.m < a.m
                  GROUP BY 1, 2),
           recs AS (SELECT CAST(SUM(CASE WHEN rv > prior_max THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_records
                    FROM pm),
           minm AS (SELECT MIN(m) AS m0 FROM rev),
           harm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           SUM(1.0 / CAST(m - m0 + 1 AS DOUBLE)) AS h1,
                           SUM(1.0 / (CAST(m - m0 + 1 AS DOUBLE)
                             * CAST(m - m0 + 1 AS DOUBLE))) AS h2
                    FROM rev, minm)
      SELECT n AS n_months, n_records, ROUND(h1, 4) + 0 AS expected_records,
             ROUND((CAST(n_records AS DOUBLE) - h1) / SQRT(h1 - h2), 4) + 0 AS z
      FROM harm, recs""",

    "q_circular_stats" -> """
      WITH dow AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) % 7 AS dow,
                          CAST(COUNT(*) AS BIGINT) AS nk
                   FROM orders GROUP BY 1),
           w AS (SELECT nk,
                        CASE dow WHEN 0 THEN 1.0 WHEN 1 THEN 0.6234898
                                 WHEN 2 THEN -0.2225209 WHEN 3 THEN -0.9009689
                                 WHEN 4 THEN -0.9009689 WHEN 5 THEN -0.2225209
                                 WHEN 6 THEN 0.6234898 ELSE 0.0 END AS cw,
                        CASE dow WHEN 0 THEN 0.0 WHEN 1 THEN 0.7818315
                                 WHEN 2 THEN 0.9749279 WHEN 3 THEN 0.4338837
                                 WHEN 4 THEN -0.4338837 WHEN 5 THEN -0.9749279
                                 WHEN 6 THEN -0.7818315 ELSE 0.0 END AS sw
                 FROM dow),
           s AS (SELECT CAST(SUM(nk) AS BIGINT) AS n,
                        SUM(CAST(nk AS DOUBLE) * cw) AS cc,
                        SUM(CAST(nk AS DOUBLE) * sw) AS ss
                 FROM w),
           r AS (SELECT n AS n_orders,
                        SQRT(cc * cc + ss * ss) / CAST(n AS DOUBLE) AS rbar
                 FROM s)
      SELECT n_orders, ROUND(rbar, 6) + 0 AS resultant_rbar,
             ROUND(1.0 - rbar, 6) + 0 AS circular_variance,
             ROUND(CAST(n_orders AS DOUBLE) * rbar * rbar, 4) + 0 AS rayleigh_z
      FROM r""",

    "q_somers_d" -> """
      WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                            CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
                            CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM lineitem GROUP BY 1, 2),
           s AS (SELECT CAST(SUM(CASE WHEN b.y > a.y THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS c_pairs,
                        CAST(SUM(CASE WHEN b.y < a.y THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS d_pairs,
                        CAST(SUM(CASE WHEN b.y = a.y THEN a.cnt * b.cnt ELSE 0 END)
                          AS BIGINT) AS ty_pairs
                 FROM cells a JOIN cells b ON b.x > a.x)
      SELECT c_pairs, d_pairs, ty_pairs,
             ROUND(CAST(c_pairs - d_pairs AS DOUBLE)
               / CAST(c_pairs + d_pairs + ty_pairs AS DOUBLE), 4) + 0 AS somers_d
      FROM s""",

    "q_dixon_q" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(rev) AS x1,
                         MAX(rev) AS xn
                  FROM rev),
           x2 AS (SELECT MIN(rev) AS x2 FROM rev, ex WHERE rev > x1),
           xn1 AS (SELECT MAX(rev) AS xn1 FROM rev, ex WHERE rev < xn)
      SELECT n AS n_months,
             ROUND(CAST(x2 - x1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE), 4) + 0
               AS q_low,
             ROUND(CAST(xn - xn1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE), 4) + 0
               AS q_high
      FROM ex, x2, xn1""",

    "q_cooks_distance" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar,
                          CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
                              / CAST(COUNT(*) AS DOUBLE) AS cstt
                   FROM rev),
           resid AS (SELECT m, n,
                            1.0 / CAST(n AS DOUBLE)
                              + (CAST(m AS DOUBLE) - tbar)
                                * (CAST(m AS DOUBLE) - tbar) / cstt AS h,
                            CAST(rev AS DOUBLE) - ybar
                              - b * (CAST(m AS DOUBLE) - tbar) AS e
                     FROM rev, fit),
           s2 AS (SELECT MAX(n) AS nn, SUM(e * e) AS rss FROM resid),
           sv AS (SELECT rss / (CAST(nn AS DOUBLE) - 2.0) AS s2 FROM s2)
      SELECT m, ROUND(e / 100.0, 2) + 0 AS resid_dollars,
             ROUND(h, 6) + 0 AS leverage,
             ROUND(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6) + 0
               AS cooks_d
      FROM resid, sv
      ORDER BY ROUND(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6) DESC, m
      LIMIT 5""",

    "q_uncertainty_coefficient" -> """
      WITH cells AS (SELECT CAST((CAST(l_quantity AS BIGINT) - 1) // 17 AS BIGINT)
                              AS x,
                            l_returnflag AS y, CAST(COUNT(*) AS BIGINT) AS c
                     FROM lineitem GROUP BY 1, 2),
           nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
           hxy AS (SELECT SUM(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) AS hxy
                   FROM cells, nn),
           hx AS (SELECT SUM(-(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
                    * LN(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))) AS hx
                  FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS cx
                        FROM cells GROUP BY 1), nn),
           hy AS (SELECT SUM(-(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
                    * LN(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))) AS hy
                  FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS cy
                        FROM cells GROUP BY 1), nn)
      SELECT n AS n_items, ROUND(hx + hy - hxy, 6) + 0 AS mi_nats,
             ROUND((hx + hy - hxy) / hy, 4) + 0 AS u_y_given_x,
             ROUND(2.0 * (hx + hy - hxy) / (hx + hy), 4) + 0 AS u_symmetric
      FROM nn, hxy, hx, hy""",

    "q_median_ci" -> """
      WITH vals AS (SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                             AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS t
                    FROM orders GROUP BY 1),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                          CAST((CAST(SUM(t) AS BIGINT) + 1) // 2 AS BIGINT) AS k2,
                          CAST(FLOOR((CAST(SUM(t) AS DOUBLE)
                            - 1.959964 * SQRT(CAST(SUM(t) AS DOUBLE))) / 2.0)
                            AS BIGINT) AS klo,
                          CAST(FLOOR((CAST(SUM(t) AS DOUBLE)
                            + 1.959964 * SQRT(CAST(SUM(t) AS DOUBLE))) / 2.0)
                            AS BIGINT) + 1 AS khi
                   FROM vals),
           cum AS (SELECT a.v, CAST(SUM(b.t) AS BIGINT) AS cum
                   FROM vals a JOIN vals b ON b.v <= a.v GROUP BY 1)
      SELECT MAX(n) AS n_orders,
             MIN(CASE WHEN cum >= k2 THEN v END) AS median_bin,
             MIN(CASE WHEN cum >= klo THEN v END) AS ci_lo_bin,
             MIN(CASE WHEN cum >= khi THEN v END) AS ci_hi_bin
      FROM cum, tot""",

    "q_tetrachoric" -> """
      WITH s AS (SELECT
                   CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN l_discount >= 0.06 AND NOT l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06
                     AND NOT l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
                 FROM lineitem)
      SELECT a, b, c, d,
             ROUND((CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
               - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
               / (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 + CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 4) + 0 AS yule_q,
             ROUND(COS(3.1415927 / (1.0
               + SQRT(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))))), 4) + 0
               AS tetrachoric_r
      FROM s""",

    "q_cmh_test" -> """
      WITH st AS (SELECT o_orderpriority AS s,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY 1),
           m AS (SELECT a, a + b AS n1, c + d AS n0, a + c AS m1, b + d AS m0,
                        a + b + c + d AS nn
                 FROM st),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(a) AS BIGINT) AS sa,
                        SUM(CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
                          / CAST(nn AS DOUBLE)) AS se,
                        SUM(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                          * CAST(m1 AS DOUBLE) * CAST(m0 AS DOUBLE)
                          / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                            * (CAST(nn AS DOUBLE) - 1.0))) AS sv
                 FROM m)
      SELECT k AS n_strata, sa AS sum_a, ROUND(se, 4) + 0 AS sum_e,
             ROUND((ABS(CAST(sa AS DOUBLE) - se) - 0.5)
               * (ABS(CAST(sa AS DOUBLE) - se) - 0.5) / sv, 4) + 0 AS cmh_chi2,
             CAST(CASE WHEN (ABS(CAST(sa AS DOUBLE) - se) - 0.5)
               * (ABS(CAST(sa AS DOUBLE) - se) - 0.5) / sv > 3.841459
               THEN 1 ELSE 0 END AS BIGINT) AS reject_no_association
      FROM s""",

    "q_mantel_haenszel" -> """
      WITH st AS (SELECT o_orderpriority AS s,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY 1),
           pq AS (SELECT CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS p,
                         CAST(b + c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS q,
                         CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                           / CAST(a + b + c + d AS DOUBLE) AS r,
                         CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                           / CAST(a + b + c + d AS DOUBLE) AS s
                  FROM st),
           agg AS (SELECT SUM(r) AS sr, SUM(s) AS ss, SUM(p * r) AS spr,
                          SUM(p * s + q * r) AS spsqr, SUM(q * s) AS sqs
                   FROM pq),
           f AS (SELECT sr / ss AS or_mh,
                        SQRT(spr / (2.0 * sr * sr) + spsqr / (2.0 * sr * ss)
                          + sqs / (2.0 * ss * ss)) AS se
                 FROM agg)
      SELECT ROUND(or_mh, 4) + 0 AS or_mh,
             ROUND(EXP(LN(or_mh) - 1.959964 * se), 4) + 0 AS ci_lo,
             ROUND(EXP(LN(or_mh) + 1.959964 * se), 4) + 0 AS ci_hi
      FROM f""",

    "q_direct_standardization" -> """
      WITH cell AS (SELECT o_orderpriority AS g,
                           CAST((CAST(l_quantity AS BIGINT) - 1) // 17 AS BIGINT)
                             AS st,
                           CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                             AS BIGINT) AS r
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    GROUP BY 1, 2),
           w AS (SELECT st, CAST(SUM(n) AS BIGINT) AS ns FROM cell GROUP BY 1),
           tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cell),
           s AS (SELECT g, CAST(SUM(r) AS BIGINT) AS rg, CAST(SUM(n) AS BIGINT) AS ng,
                        SUM((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE))) AS std
                 FROM cell JOIN w ON cell.st = w.st, tot
                 GROUP BY 1)
      SELECT g AS priority,
             ROUND(CAST(rg AS DOUBLE) / CAST(ng AS DOUBLE), 4) + 0 AS crude_rate,
             ROUND(std, 4) + 0 AS standardized_rate
      FROM s ORDER BY priority""",

    "q_bowker_symmetry" -> """
      WITH fl AS (SELECT o_custkey AS cust,
                         arg_min(CAST(substring(o_orderpriority, 1, 1) AS BIGINT),
                           CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                             AS BIGINT) * 1000000000 + o_orderkey) AS i,
                         arg_max(CAST(substring(o_orderpriority, 1, 1) AS BIGINT),
                           CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                             AS BIGINT) * 1000000000 + o_orderkey) AS j,
                         CAST(COUNT(*) AS BIGINT) AS n_ord
                  FROM orders GROUP BY 1 HAVING COUNT(*) >= 2),
           t AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM fl GROUP BY 1, 2),
           up AS (SELECT i, j, n AS nij FROM t WHERE i < j),
           lo AS (SELECT j AS i, i AS j, n AS nji FROM t WHERE i > j),
           cells AS (SELECT COALESCE(nij, 0) AS nij, COALESCE(nji, 0) AS nji
                     FROM up FULL OUTER JOIN lo USING (i, j)
                     WHERE COALESCE(nij, 0) + COALESCE(nji, 0) > 0),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                        SUM(CAST(nij - nji AS DOUBLE) * CAST(nij - nji AS DOUBLE)
                          / CAST(nij + nji AS DOUBLE)) AS chi2
                 FROM cells)
      SELECT n_cells, ROUND(chi2, 4) + 0 AS bowker_chi2,
             CAST(CASE WHEN chi2 > 18.307038 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_symmetry
      FROM s""",

    "q_shorrocks_mobility" -> """
      WITH fl AS (SELECT o_custkey AS cust,
                         arg_min(CAST(substring(o_orderpriority, 1, 1) AS BIGINT),
                           CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                             AS BIGINT) * 1000000000 + o_orderkey) AS i,
                         arg_max(CAST(substring(o_orderpriority, 1, 1) AS BIGINT),
                           CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                             AS BIGINT) * 1000000000 + o_orderkey) AS j
                  FROM orders GROUP BY 1 HAVING COUNT(*) >= 2),
           t AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM fl GROUP BY 1, 2),
           rw AS (SELECT i, CAST(SUM(n) AS BIGINT) AS ri FROM t GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                        SUM(CAST(n AS DOUBLE) / CAST(ri AS DOUBLE)) AS tr
                 FROM t JOIN rw ON t.i = rw.i WHERE t.i = t.j)
      SELECT k AS k_classes, ROUND(tr, 4) + 0 AS trace_p,
             ROUND((CAST(k AS DOUBLE) - tr) / (CAST(k AS DOUBLE) - 1.0), 4) + 0
               AS shorrocks_m
      FROM s""",

    "q_concentration_index" -> """
      WITH cust AS (SELECT o_custkey,
                           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                             AS BIGINT) // 10000 AS v,
                           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                             AS BIGINT) AS h
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    GROUP BY 1),
           vals AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
                           CAST(SUM(h) AS BIGINT) AS hv
                    FROM cust GROUP BY 1),
           mid AS (SELECT a.v, a.hv,
                          CAST(COALESCE(SUM(b.t), 0) AS DOUBLE)
                            + (CAST(a.t AS DOUBLE) + 1.0) / 2.0 AS midrank
                   FROM vals a LEFT JOIN vals b ON b.v < a.v
                   GROUP BY a.v, a.t, a.hv),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(h) AS BIGINT) AS ht
                   FROM cust),
           s AS (SELECT SUM(CAST(hv AS DOUBLE) * midrank) AS shr FROM mid)
      SELECT n AS n_customers, ht AS total_returns,
             ROUND(2.0 * shr / (CAST(n AS DOUBLE) * CAST(ht AS DOUBLE))
               - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 4) + 0
               AS concentration_index
      FROM s, tot""",

    "q_dissimilarity_index" -> """
      WITH c AS (SELECT c_nationkey AS nk,
                        CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                          AS BIGINT) AS a,
                        CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                          THEN 1 ELSE 0 END) AS BIGINT) AS b
                 FROM customer
                 WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                 GROUP BY 1),
           tot AS (SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb
                   FROM c),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nations,
                        SUM(ABS(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)
                          - CAST(b AS DOUBLE) / CAST(tb AS DOUBLE))) AS sd,
                        SUM((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
                          * (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))) AS iso
                 FROM c, tot)
      SELECT n_nations, ROUND(sd / 2.0, 4) + 0 AS dissimilarity,
             ROUND(iso, 4) + 0 AS isolation_building
      FROM s""",

    "q_location_quotient" -> """
      WITH c AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM customer GROUP BY 1, 2),
           byn AS (SELECT nk, CAST(SUM(n) AS BIGINT) AS nn FROM c GROUP BY 1),
           bys AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS ns FROM c GROUP BY 1),
           tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c),
           l AS (SELECT c.nk AS nation, c.seg, c.n AS n_customers,
                        ROUND((CAST(c.n AS DOUBLE) / CAST(nn AS DOUBLE))
                          / (CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE)), 4) + 0 AS lq
                 FROM c JOIN byn ON c.nk = byn.nk JOIN bys ON c.seg = bys.seg, tot)
      SELECT nation, seg, n_customers, lq
      FROM l ORDER BY lq DESC, nation, seg LIMIT 10""",

    "q_morans_i" -> """
      WITH nb AS (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS nc,
                         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                           AS sb
                  FROM customer GROUP BY 1),
           nx AS (SELECT nb.nk, n_regionkey AS rk,
                         CAST(sb AS DOUBLE) / CAST(nc AS DOUBLE) AS x
                  FROM nb JOIN nation ON nb.nk = n_nationkey),
           mean AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           SUM(x) / CAST(COUNT(*) AS DOUBLE) AS xbar
                    FROM nx),
           z AS (SELECT nk, rk, x - xbar AS z, n FROM nx, mean),
           pairs AS (SELECT CAST(COUNT(*) AS BIGINT) AS w,
                            SUM(a.z * b.z) AS szz,
                            SUM((a.z - b.z) * (a.z - b.z)) AS sdz
                     FROM z a JOIN z b ON b.rk = a.rk AND b.nk <> a.nk),
           den AS (SELECT MAX(n) AS n, SUM(z * z) AS szsq FROM z)
      SELECT n AS n_nations, w AS w_pairs,
             ROUND((CAST(n AS DOUBLE) / CAST(w AS DOUBLE)) * szz / szsq, 4) + 0
               AS morans_i,
             ROUND(((CAST(n AS DOUBLE) - 1.0) / (2.0 * CAST(w AS DOUBLE)))
               * sdz / szsq, 4) + 0 AS geary_c
      FROM den, pairs""",

    "q_rate_ratio_ci" -> """
      WITH s AS (SELECT
                   CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END) AS BIGINT)
                     AS t1,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06 AND l_returnflag = 'R'
                     THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN NOT l_discount >= 0.06 THEN 1 ELSE 0 END)
                     AS BIGINT) AS t0
                 FROM lineitem),
           f AS (SELECT a, t1, c, t0,
                        (CAST(a AS DOUBLE) / CAST(t1 AS DOUBLE))
                          / (CAST(c AS DOUBLE) / CAST(t0 AS DOUBLE)) AS rr,
                        SQRT(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(c AS DOUBLE)) AS se
                 FROM s)
      SELECT a, t1, c, t0, ROUND(rr, 4) + 0 AS rate_ratio,
             ROUND(EXP(LN(rr) - 1.959964 * se), 4) + 0 AS ci_lo,
             ROUND(EXP(LN(rr) + 1.959964 * se), 4) + 0 AS ci_hi
      FROM f""",

    "q_breslow_day" -> """
      WITH st AS (SELECT o_orderpriority AS s,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY 1),
           ormh AS (SELECT SUM(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                      / CAST(a + b + c + d AS DOUBLE))
                      / SUM(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                        / CAST(a + b + c + d AS DOUBLE)) AS ormh
                    FROM st),
           t1 AS (SELECT CAST(a AS DOUBLE) AS ad, CAST(a + b AS DOUBLE) AS n1,
                         CAST(a + c AS DOUBLE) AS m1,
                         CAST(a + b + c + d AS DOUBLE) AS nn, ormh
                  FROM st, ormh),
           t2 AS (SELECT ad, n1, m1, nn, ormh, 1.0 - ormh AS a2,
                         nn - n1 - m1 + ormh * (n1 + m1) AS b2,
                         -ormh * n1 * m1 AS c2
                  FROM t1),
           t3 AS (SELECT ad, n1, m1, nn,
                         2.0 * c2 / (-b2 - SQRT(b2 * b2 - 4.0 * a2 * c2)) AS ae
                  FROM t2),
           t4 AS (SELECT ad, ae,
                         1.0 / (1.0 / ae + 1.0 / (n1 - ae) + 1.0 / (m1 - ae)
                           + 1.0 / (nn - n1 - m1 + ae)) AS va
                  FROM t3),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                        SUM((ad - ae) * (ad - ae) / va) AS chi2
                 FROM t4)
      SELECT k AS n_strata, ROUND(chi2, 4) + 0 AS breslow_day_chi2,
             CAST(CASE WHEN chi2 > 9.487729 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_homogeneous_or
      FROM s""",

    "q_peto_odds_ratio" -> """
      WITH st AS (SELECT o_orderpriority AS s,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS a,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag = 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag <> 'R'
                           THEN 1 ELSE 0 END) AS BIGINT) AS d
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY 1),
           m AS (SELECT CAST(a AS DOUBLE) AS ad, CAST(a + b AS DOUBLE) AS n1,
                        CAST(c + d AS DOUBLE) AS n0, CAST(a + c AS DOUBLE) AS m1,
                        CAST(b + d AS DOUBLE) AS m0,
                        CAST(a + b + c + d AS DOUBLE) AS nn
                 FROM st),
           s AS (SELECT SUM(ad - n1 * m1 / nn) AS soe,
                        SUM(n1 * n0 * m1 * m0 / (nn * nn * (nn - 1.0))) AS sv
                 FROM m)
      SELECT ROUND(EXP(soe / sv), 4) + 0 AS peto_or,
             ROUND(EXP((soe - 1.959964 * SQRT(sv)) / sv), 4) + 0 AS ci_lo,
             ROUND(EXP((soe + 1.959964 * SQRT(sv)) / sv), 4) + 0 AS ci_hi
      FROM s""",

    "q_smr_indirect" -> """
      WITH cell AS (SELECT o_orderpriority AS g,
                           CAST((CAST(l_quantity AS BIGINT) - 1) // 17 AS BIGINT)
                             AS st,
                           CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                             AS BIGINT) AS r
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    GROUP BY 1, 2),
           ref AS (SELECT st, CAST(SUM(r) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
                            AS rate
                   FROM cell GROUP BY 1),
           s AS (SELECT g, CAST(SUM(r) AS BIGINT) AS o,
                        SUM(CAST(n AS DOUBLE) * rate) AS e
                 FROM cell JOIN ref ON cell.st = ref.st GROUP BY 1)
      SELECT g AS priority, o AS observed,
             CAST(FLOOR(e * 100.0) AS BIGINT) AS expected_e2,
             ROUND(CAST(o AS DOUBLE) / e, 4) + 0 AS smr,
             ROUND(EXP(LN(CAST(o AS DOUBLE) / e)
               - 1.959964 / SQRT(CAST(o AS DOUBLE))), 4) + 0 AS ci_lo,
             ROUND(EXP(LN(CAST(o AS DOUBLE) / e)
               + 1.959964 / SQRT(CAST(o AS DOUBLE))), 4) + 0 AS ci_hi
      FROM s ORDER BY priority""",

    "q_funnel_plot" -> """
      WITH nat AS (SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                            AS BIGINT) AS o
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   JOIN customer c ON o_custkey = c.c_custkey
                   GROUP BY 1),
           pool AS (SELECT CAST(SUM(o) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS pbar
                    FROM nat),
           f AS (SELECT nk AS nation, o, CAST(n AS DOUBLE) * pbar AS e
                 FROM nat, pool)
      SELECT nation, o, CAST(FLOOR(e * 100.0) AS BIGINT) AS expected_e2,
             ROUND(CAST(o AS DOUBLE) / e, 4) + 0 AS smr,
             CAST(CASE WHEN CAST(o AS DOUBLE) / e
                            > 1.0 + 1.959964 * SQRT(1.0 / e) THEN 1
                       WHEN CAST(o AS DOUBLE) / e
                            < 1.0 - 1.959964 * SQRT(1.0 / e) THEN -1
                       ELSE 0 END AS BIGINT) AS flag
      FROM f ORDER BY nation""",

    "q_eb_shrinkage" -> """
      WITH nat AS (SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                            AS BIGINT) AS o
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   JOIN customer c ON o_custkey = c.c_custkey
                   GROUP BY 1),
           nx AS (SELECT nk, n, o, CAST(o AS DOUBLE) / CAST(n AS DOUBLE) AS x
                  FROM nat),
           pr AS (SELECT SUM(x) / CAST(COUNT(*) AS DOUBLE) AS m,
                         SUM(x * x) / CAST(COUNT(*) AS DOUBLE)
                           - (SUM(x) / CAST(COUNT(*) AS DOUBLE))
                             * (SUM(x) / CAST(COUNT(*) AS DOUBLE)) AS v
                  FROM nx),
           pk AS (SELECT m, m * (1.0 - m) / v - 1.0 AS bigk FROM pr)
      SELECT nk AS nation, n, o, ROUND(x, 4) + 0 AS raw_rate,
             ROUND((CAST(o AS DOUBLE) + m * bigk)
               / (CAST(n AS DOUBLE) + bigk), 4) + 0 AS shrunk_rate,
             ROUND(bigk, 2) + 0 AS prior_k
      FROM nx, pk ORDER BY nation""",

    "q_buhlmann_credibility" -> """
      WITH nm AS (SELECT c.c_nationkey AS nk,
                         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                           AS m,
                         SUM(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END)
                           / CAST(COUNT(*) AS DOUBLE) AS x
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer c ON o_custkey = c.c_custkey
                  GROUP BY 1, 2),
           w AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS t,
                        SUM(x) / CAST(COUNT(*) AS DOUBLE) AS xbar,
                        (SUM(x * x) - SUM(x) * SUM(x) / CAST(COUNT(*) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) - 1.0) AS s2
                 FROM nm GROUP BY 1),
           agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS r, AVG(s2) AS epv,
                          AVG(CAST(t AS DOUBLE)) AS tbar,
                          (SUM(xbar * xbar)
                            - SUM(xbar) * SUM(xbar) / CAST(COUNT(*) AS DOUBLE))
                            AS ssb
                   FROM w),
           f AS (SELECT r, epv, tbar,
                        ssb / (CAST(r AS DOUBLE) - 1.0) - epv / tbar AS vhm
                 FROM agg)
      SELECT r AS n_nations, ROUND(epv, 6) + 0 AS epv, ROUND(vhm, 6) + 0 AS vhm,
             ROUND(CASE WHEN vhm > 0.0 THEN epv / vhm ELSE -1.0 END, 2) + 0
               AS buhlmann_k,
             ROUND(CASE WHEN vhm > 0.0 THEN tbar / (tbar + epv / vhm)
                   ELSE 0.0 END, 4) + 0 AS credibility_z
      FROM f""",

    "q_cochran_armitage" -> """
      WITH g AS (SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS s,
                        CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                          AS BIGINT) AS a
                 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 GROUP BY 1),
           m AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(a) AS BIGINT) AS aa,
                        CAST(SUM(s * a) AS BIGINT) AS ssa,
                        CAST(SUM(s * n) AS BIGINT) AS ssn,
                        CAST(SUM(s * s * n) AS BIGINT) AS ss2n
                 FROM g),
           f AS (SELECT nn, aa,
                        CAST(ssa AS DOUBLE)
                          - CAST(aa AS DOUBLE) * CAST(ssn AS DOUBLE)
                            / CAST(nn AS DOUBLE) AS t,
                        (CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
                          * (1.0 - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
                          * (CAST(ss2n AS DOUBLE)
                            - CAST(ssn AS DOUBLE) * CAST(ssn AS DOUBLE)
                              / CAST(nn AS DOUBLE)) AS v
                 FROM m)
      SELECT nn AS n_items, aa AS n_returns,
             ROUND(t / SQRT(v), 4) + 0 AS ca_z,
             CAST(CASE WHEN ABS(t / SQRT(v)) > 1.959964 THEN 1 ELSE 0 END AS BIGINT)
               AS trend_detected
      FROM f""",

    "q_piecewise_trend" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           m0 AS (SELECT MIN(m) AS m0 FROM rev),
           t AS (SELECT m - m0 + 1 AS t, GREATEST(m - m0 + 1 - 40, 0) AS h,
                        CAST(rev AS DOUBLE) AS y
                 FROM rev, m0),
           s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS s1,
                        CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE) AS st,
                        CAST(CAST(SUM(h) AS BIGINT) AS DOUBLE) AS sh,
                        CAST(CAST(SUM(t * t) AS BIGINT) AS DOUBLE) AS stt,
                        CAST(CAST(SUM(t * h) AS BIGINT) AS DOUBLE) AS sth,
                        CAST(CAST(SUM(h * h) AS BIGINT) AS DOUBLE) AS shh,
                        SUM(y) AS sy, SUM(CAST(t AS DOUBLE) * y) AS sty,
                        SUM(CAST(h AS DOUBLE) * y) AS shy
                 FROM t),
           d AS (SELECT s1,
                        s1 * (stt * shh - sth * sth) - st * (st * shh - sth * sh)
                          + sh * (st * sth - stt * sh) AS dd,
                        s1 * (sty * shh - sth * shy) - sy * (st * shh - sth * sh)
                          + sh * (st * shy - sty * sh) AS d2,
                        s1 * (stt * shy - sty * sth) - st * (st * shy - sty * sh)
                          + sy * (st * sth - stt * sh) AS d3
                 FROM s)
      SELECT CAST(s1 AS BIGINT) AS n_months, CAST(40 AS BIGINT) AS knot_t,
             ROUND(d2 / dd / 100.0, 4) + 0 AS base_slope_dollars,
             ROUND(d3 / dd / 100.0, 4) + 0 AS slope_change_dollars
      FROM d""",

    "q_newey_west" -> """
      WITH rev AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                            AS BIGINT) AS d,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           chg AS (SELECT b.d AS d, b.rev - a.rev AS x
                   FROM rev a JOIN rev b ON b.d = a.d + 1),
           mu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
                  FROM chg),
           z AS (SELECT d, n, mu, CAST(x AS DOUBLE) - mu AS z FROM chg, mu),
           g0 AS (SELECT MAX(n) AS n, MAX(mu) AS mu, SUM(z * z) AS g0 FROM z),
           g1 AS (SELECT SUM(a.z * b.z) AS g1
                  FROM z a JOIN z b ON b.d = a.d + 1),
           g2 AS (SELECT SUM(a.z * b.z) AS g2
                  FROM z a JOIN z b ON b.d = a.d + 2)
      SELECT n AS n_days, ROUND(mu / 100.0, 2) + 0 AS mean_change_dollars,
             ROUND(mu / SQRT(((g0 + 2.0 * (2.0 / 3.0 * g1 + 1.0 / 3.0 * g2))
               / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 4) + 0 AS t_newey_west,
             ROUND(mu / SQRT((g0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 4) + 0
               AS t_iid
      FROM g0, g1, g2""",

    "q_tost_equivalence" -> """
      WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS an,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS asum,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ass
                 FROM orders WHERE o_orderpriority = '1-URGENT'),
           b AS (SELECT CAST(COUNT(*) AS BIGINT) AS bn,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS bsum,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS bss
                 FROM orders WHERE o_orderpriority = '5-LOW'),
           m AS (SELECT an, bn,
                        CAST(asum AS DOUBLE) / CAST(an AS DOUBLE)
                          - CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE) AS dmean,
                        (CAST(asum + bsum AS DOUBLE) / CAST(an + bn AS DOUBLE))
                          / 100.0 AS delta,
                        SQRT((((ass - (CAST(asum AS DOUBLE) * CAST(asum AS DOUBLE))
                          / CAST(an AS DOUBLE)) / (CAST(an AS DOUBLE) - 1.0))
                          / CAST(an AS DOUBLE))
                          + (((bss - (CAST(bsum AS DOUBLE) * CAST(bsum AS DOUBLE))
                            / CAST(bn AS DOUBLE)) / (CAST(bn AS DOUBLE) - 1.0))
                            / CAST(bn AS DOUBLE))) AS se
                 FROM a, b)
      SELECT an AS n_urgent, bn AS n_low,
             ROUND(dmean / 100.0, 2) + 0 AS diff_dollars,
             ROUND(delta / 100.0, 2) + 0 AS margin_dollars,
             ROUND((dmean + delta) / se, 4) + 0 AS t_lower,
             ROUND((delta - dmean) / se, 4) + 0 AS t_upper,
             CAST(CASE WHEN (dmean + delta) / se > 1.6448536
                        AND (delta - dmean) / se > 1.6448536
                       THEN 1 ELSE 0 END AS BIGINT) AS equivalent
      FROM m""",

    "q_welch_anova" -> """
      WITH g AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS s,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ss
                 FROM orders GROUP BY 1),
           w AS (SELECT g, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
                        CAST(n AS DOUBLE)
                          / ((ss - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS w
                 FROM g),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(w) AS sw,
                        SUM(w * xbar) AS swx
                 FROM w),
           l AS (SELECT MAX(k) AS k, MAX(sw) AS sw, MAX(swx) AS swx,
                        SUM((1.0 - w / sw) * (1.0 - w / sw)
                          / (CAST(n AS DOUBLE) - 1.0)) AS lam,
                        SUM(w * (xbar - swx / sw) * (xbar - swx / sw)) AS num
                 FROM w, t),
           f AS (SELECT k,
                        (num / (CAST(k AS DOUBLE) - 1.0))
                          / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                            / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * lam)
                          AS fstar,
                        ((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) / 3.0) / lam
                          AS df2
                 FROM l)
      SELECT k AS n_groups, ROUND(fstar, 4) + 0 AS welch_f,
             ROUND(df2, 2) + 0 AS df2,
             CAST(CASE WHEN fstar > 2.372 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_equal_means
      FROM f""",

    "q_energy_distance" -> """
      WITH cells AS (SELECT o_orderpriority AS g,
                            CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                              AS BIGINT) AS v,
                            CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
                     GROUP BY 1, 2),
           sizes AS (SELECT CAST(SUM(CASE WHEN g = '1-URGENT' THEN cnt ELSE 0 END)
                       AS BIGINT) AS n1,
                            CAST(SUM(CASE WHEN g = '5-LOW' THEN cnt ELSE 0 END)
                              AS BIGINT) AS n2
                     FROM (SELECT g, CAST(SUM(cnt) AS BIGINT) AS cnt
                           FROM cells GROUP BY 1)),
           sxy AS (SELECT SUM(CAST(ABS(a.v - b.v) AS DOUBLE)
                     * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)) AS sxy
                   FROM (SELECT v, cnt FROM cells WHERE g = '1-URGENT') a
                   CROSS JOIN (SELECT v, cnt FROM cells WHERE g = '5-LOW') b),
           sxx AS (SELECT SUM(CAST(ABS(a.v - b.v) AS DOUBLE)
                     * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)) AS sxx
                   FROM (SELECT v, cnt FROM cells WHERE g = '1-URGENT') a
                   CROSS JOIN (SELECT v, cnt FROM cells WHERE g = '1-URGENT') b),
           syy AS (SELECT SUM(CAST(ABS(a.v - b.v) AS DOUBLE)
                     * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)) AS syy
                   FROM (SELECT v, cnt FROM cells WHERE g = '5-LOW') a
                   CROSS JOIN (SELECT v, cnt FROM cells WHERE g = '5-LOW') b),
           e AS (SELECT n1, n2,
                        2.0 * sxy / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                          - sxx / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
                          - syy / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS e
                 FROM sizes, sxy, sxx, syy)
      SELECT n1, n2, ROUND(e, 4) + 0 AS energy_distance_bins,
             ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / CAST(n1 + n2 AS DOUBLE) * e, 4) + 0 AS e_statistic
      FROM e""",

    "q_mmd_rbf" -> """
      WITH cells AS (SELECT o_orderpriority AS g,
                            CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                              AS BIGINT) AS v,
                            CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
                     GROUP BY 1, 2),
           sizes AS (SELECT CAST(SUM(CASE WHEN g = '1-URGENT' THEN cnt ELSE 0 END)
                       AS BIGINT) AS n1,
                            CAST(SUM(CASE WHEN g = '5-LOW' THEN cnt ELSE 0 END)
                              AS BIGINT) AS n2
                     FROM (SELECT g, CAST(SUM(cnt) AS BIGINT) AS cnt
                           FROM cells GROUP BY 1)),
           kxx AS (SELECT SUM(EXP(-CAST((a.v - b.v) * (a.v - b.v) AS DOUBLE)
                     / 5000.0) * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE))
                     AS kxx
                   FROM (SELECT v, cnt FROM cells WHERE g = '1-URGENT') a
                   CROSS JOIN (SELECT v, cnt FROM cells WHERE g = '1-URGENT') b),
           kyy AS (SELECT SUM(EXP(-CAST((a.v - b.v) * (a.v - b.v) AS DOUBLE)
                     / 5000.0) * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE))
                     AS kyy
                   FROM (SELECT v, cnt FROM cells WHERE g = '5-LOW') a
                   CROSS JOIN (SELECT v, cnt FROM cells WHERE g = '5-LOW') b),
           kxy AS (SELECT SUM(EXP(-CAST((a.v - b.v) * (a.v - b.v) AS DOUBLE)
                     / 5000.0) * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE))
                     AS kxy
                   FROM (SELECT v, cnt FROM cells WHERE g = '1-URGENT') a
                   CROSS JOIN (SELECT v, cnt FROM cells WHERE g = '5-LOW') b)
      SELECT n1, n2,
             ROUND(kxx / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
               + kyy / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE))
               - 2.0 * kxy / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) + 0
               AS mmd_squared
      FROM sizes, kxx, kyy, kxy""",

    "q_distance_correlation" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS x
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS y
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           xy AS (SELECT sega.m, x, y FROM sega JOIN segb ON sega.m = segb.m),
           pairs AS (SELECT a.m AS m, b.m AS m2,
                            CAST(ABS(a.x - b.x) AS DOUBLE) AS ax,
                            CAST(ABS(a.y - b.y) AS DOUBLE) AS byy
                     FROM xy a CROSS JOIN xy b),
           rm AS (SELECT m, AVG(ax) AS rax, AVG(byy) AS rby
                  FROM pairs GROUP BY 1),
           gm AS (SELECT AVG(ax) AS gax, AVG(byy) AS gby,
                         CAST(COUNT(*) AS BIGINT) AS nsq
                  FROM pairs),
           cen AS (SELECT (pairs.ax - ri.rax - rj.rax + gax) AS aa,
                          (pairs.byy - ri.rby - rj.rby + gby) AS bb, nsq
                   FROM pairs
                   JOIN rm ri ON ri.m = pairs.m
                   JOIN rm rj ON rj.m = pairs.m2, gm),
           s AS (SELECT nsq, SUM(aa * bb) AS scov, SUM(aa * aa) AS svx,
                        SUM(bb * bb) AS svy
                 FROM cen GROUP BY 1)
      SELECT ROUND(SQRT(SQRT((scov / CAST(nsq AS DOUBLE))
               * (scov / CAST(nsq AS DOUBLE))
               / ((svx / CAST(nsq AS DOUBLE)) * (svy / CAST(nsq AS DOUBLE))))), 4)
               + 0 AS dcor,
             ROUND(scov / CAST(nsq AS DOUBLE) / 1.0e16, 6) + 0 AS dcov2_e16
      FROM s""",

    "q_beta_convergence" -> """
      WITH nat AS (SELECT c.c_nationkey AS nk,
                          CAST(SUM(CASE WHEN year(o_orderdate) = 1996
                            THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS r96,
                          CAST(SUM(CASE WHEN year(o_orderdate) = 1997
                            THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS r97
                   FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                   WHERE year(o_orderdate) IN (1996, 1997)
                   GROUP BY 1),
           l AS (SELECT LN(CAST(r96 AS DOUBLE)) AS x,
                        LN(CAST(r97 AS DOUBLE) / CAST(r96 AS DOUBLE)) AS y
                 FROM nat WHERE r96 > 0 AND r97 > 0),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
                 FROM l)
      SELECT n AS n_nations,
             ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) + 0 AS beta,
             ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               * (CAST(n AS DOUBLE) * sxy - sx * sy)
               / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                 * (CAST(n AS DOUBLE) * syy - sy * sy)), 4) + 0 AS r2
      FROM s""",

    "q_theil_between_within" -> """
      WITH cust AS (SELECT o_custkey, n_regionkey AS rk,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS x
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    JOIN nation ON c.c_nationkey = n_nationkey
                    GROUP BY 1, 2),
           cp AS (SELECT rk, x FROM cust WHERE x > 0),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
                   FROM cp),
           reg AS (SELECT rk, CAST(COUNT(*) AS BIGINT) AS nr,
                          CAST(SUM(x) AS BIGINT) AS yr
                   FROM cp GROUP BY 1),
           tw AS (SELECT cp.rk, yr, nr,
                         SUM((CAST(x AS DOUBLE) * CAST(nr AS DOUBLE)
                           / CAST(yr AS DOUBLE)) / CAST(nr AS DOUBLE)
                           * LN(CAST(x AS DOUBLE) * CAST(nr AS DOUBLE)
                             / CAST(yr AS DOUBLE))) AS tr
                  FROM cp JOIN reg ON cp.rk = reg.rk
                  GROUP BY 1, 2, 3),
           parts AS (SELECT SUM((CAST(yr AS DOUBLE) / CAST(sx AS DOUBLE)) * tr)
                              AS t_within,
                            SUM((CAST(yr AS DOUBLE) / CAST(sx AS DOUBLE))
                              * LN((CAST(yr AS DOUBLE) / CAST(sx AS DOUBLE))
                                / (CAST(nr AS DOUBLE) / CAST(n AS DOUBLE))))
                              AS t_between
                     FROM tw, tot),
           tt AS (SELECT SUM((CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
                    / CAST(sx AS DOUBLE))
                    * LN(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
                      / CAST(sx AS DOUBLE))) / CAST(MAX(n) AS DOUBLE) AS t_total
                  FROM cp, tot)
      SELECT ROUND(t_total, 4) + 0 AS theil_total,
             ROUND(t_between, 4) + 0 AS theil_between,
             ROUND(t_within, 4) + 0 AS theil_within,
             ROUND(t_between + t_within - t_total, 6) + 0 AS identity_gap
      FROM parts, tt""",

    "q_ancova_adjust" -> """
      WITH d AS (SELECT o_orderpriority AS g,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y,
                        CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                 WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
           g AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x) AS BIGINT) AS sx,
                        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS sxy,
                        SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx
                 FROM d GROUP BY 1),
           m AS (SELECT g, n, CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
                        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
                        sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n AS DOUBLE) AS cxy,
                        sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                          / CAST(n AS DOUBLE) AS cxx
                 FROM g),
           bw AS (SELECT SUM(cxy) / SUM(cxx) AS bw FROM m),
           a AS (SELECT n AS n1, ybar AS y1, xbar AS x1 FROM m WHERE g = '1-URGENT'),
           b AS (SELECT n AS n2, ybar AS y2, xbar AS x2 FROM m WHERE g = '5-LOW')
      SELECT n1, n2, ROUND((y1 - y2) / 100.0, 2) + 0 AS raw_diff_dollars,
             ROUND(((y1 - y2) - bw * (x1 - x2)) / 100.0, 2) + 0
               AS adjusted_diff_dollars,
             ROUND(bw, 6) + 0 AS pooled_slope
      FROM a, b, bw""",

    "q_moment_zscores" -> """
      WITH s AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS s1,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS s2,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS s3,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS s4
                 FROM orders GROUP BY 1),
           a AS (SELECT g, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                        s2 / CAST(n AS DOUBLE) AS a2, s3 / CAST(n AS DOUBLE) AS a3,
                        s4 / CAST(n AS DOUBLE) AS a4
                 FROM s),
           m AS (SELECT g, n, a2 - mu * mu AS m2,
                        a3 - 3.0 * mu * a2 + 2.0 * mu * mu * mu AS m3,
                        a4 - 4.0 * mu * a3 + 6.0 * mu * mu * a2
                          - 3.0 * mu * mu * mu * mu AS m4
                 FROM a)
      SELECT g AS priority, n,
             ROUND(m3 / (m2 * SQRT(m2)), 4) + 0 AS skew,
             ROUND(m4 / (m2 * m2) - 3.0, 4) + 0 AS excess_kurt,
             ROUND((m3 / (m2 * SQRT(m2))) / SQRT(6.0 / CAST(n AS DOUBLE)), 4) + 0
               AS z_skew,
             ROUND((m4 / (m2 * m2) - 3.0) / SQRT(24.0 / CAST(n AS DOUBLE)), 4) + 0
               AS z_kurt
      FROM m ORDER BY priority""",

    "q_biweight_midvariance" -> """
      WITH vals AS (SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                             AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS t
                    FROM orders GROUP BY 1),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                          CAST((CAST(SUM(t) AS BIGINT) + 1) // 2 AS BIGINT) AS k
                   FROM vals),
           med AS (SELECT MIN(v) AS med
                   FROM (SELECT a.v, CAST(SUM(b.t) AS BIGINT) AS cum
                         FROM vals a JOIN vals b ON b.v <= a.v GROUP BY 1), tot
                   WHERE cum >= k),
           dev AS (SELECT ABS(v - med) AS av, CAST(SUM(t) AS BIGINT) AS t
                   FROM vals, med GROUP BY 1),
           mad AS (SELECT MIN(av) AS mad
                   FROM (SELECT a.av, CAST(SUM(b.t) AS BIGINT) AS cum
                         FROM dev a JOIN dev b ON b.av <= a.av GROUP BY 1), tot
                   WHERE cum >= k),
           u AS (SELECT n, med, mad, t,
                        CAST(v - med AS DOUBLE) AS d,
                        CAST(v - med AS DOUBLE) / (9.0 * CAST(mad AS DOUBLE)) AS u
                 FROM vals, med, mad, tot),
           s AS (SELECT n, med, mad,
                        SUM(CAST(t AS DOUBLE) * d * d
                          * (1.0 - u * u) * (1.0 - u * u)
                          * (1.0 - u * u) * (1.0 - u * u)) AS num,
                        SUM(CAST(t AS DOUBLE) * (1.0 - u * u)
                          * (1.0 - 5.0 * u * u)) AS den
                 FROM u WHERE u > -1.0 AND u < 1.0
                 GROUP BY 1, 2, 3)
      SELECT n AS n_orders, med AS median_bin, mad AS mad_bin,
             ROUND(CAST(n AS DOUBLE) * num / (den * den), 2) + 0 AS bwmv_bins2,
             ROUND(SQRT(CAST(n AS DOUBLE) * num / (den * den)), 4) + 0
               AS robust_sd_bins
      FROM s""",

    "q_cvm_uniform" -> """
      WITH vals AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS t
                    FROM lineitem GROUP BY 1),
           cum AS (SELECT a.v, a.t, CAST(COALESCE(SUM(b.t), 0) AS BIGINT) AS cb
                   FROM vals a LEFT JOIN vals b ON b.v < a.v
                   GROUP BY 1, 2),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM vals),
           c AS (SELECT n, CAST(t AS DOUBLE) AS td,
                        CAST(v + 1 AS DOUBLE) / 11.0 AS f0,
                        CAST(2 * t * cb + t * t AS DOUBLE) AS s1,
                        CAST((4 * ((cb + t) * (cb + t + 1) * (2 * (cb + t) + 1)
                          - cb * (cb + 1) * (2 * cb + 1))) // 6
                          - 2 * (2 * t * cb + t * t) - t AS DOUBLE) AS s2raw
                 FROM cum, tot),
           k AS (SELECT n, td * f0 * f0 - f0 * s1 / CAST(n AS DOUBLE)
                          + s2raw / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                          AS contrib
                 FROM c),
           s AS (SELECT n, SUM(contrib) AS sc FROM k GROUP BY 1)
      SELECT n AS n_items,
             ROUND(1.0 / (12.0 * CAST(n AS DOUBLE)) + sc, 6) + 0 AS cvm_w2,
             CAST(CASE WHEN 1.0 / (12.0 * CAST(n AS DOUBLE)) + sc > 0.461
               THEN 1 ELSE 0 END AS BIGINT) AS reject_uniform
      FROM s""",

    "q_fisher_combined" -> """
      WITH j AS (SELECT c.c_nationkey AS nk,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
                 FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           g AS (SELECT CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                        SQRT(CAST(SUM(CAST(tp AS HUGEINT) * tp) AS DOUBLE)
                               / CAST(COUNT(*) AS DOUBLE)
                             - (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                               * (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                          AS sigma
                 FROM j),
           z AS (SELECT (CAST(SUM(tp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) - mu)
                          / (sigma / SQRT(CAST(COUNT(*) AS DOUBLE))) AS z
                 FROM j, g GROUP BY nk, mu, sigma),
           p AS (SELECT z, ROUND(2.0 / (1.0 + exp(1.702 * abs(z))), 7) AS p FROM z),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                        SUM(-2.0 * LN(p)) AS fisher, SUM(z) AS sz
                 FROM p)
      SELECT m AS n_tests, CAST(2 * m AS BIGINT) AS df,
             ROUND(fisher, 4) + 0 AS fisher_chi2,
             ROUND(sz / SQRT(CAST(m AS DOUBLE)), 4) + 0 AS stouffer_z
      FROM s""",

    "q_log_loss" -> """
      WITH sc AS (SELECT 1.0 / (1.0 + EXP(-(-2.0 + 30.0 * l_discount
                    + 0.02 * CAST(l_quantity AS DOUBLE)))) AS p,
                        CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
                  FROM lineitem),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                        SUM(y * LN(p) + (1.0 - y) * LN(1.0 - p)) AS sll
                 FROM sc),
           m AS (SELECT n AS n_items, sy / CAST(n AS DOUBLE) AS base,
                        -sll / CAST(n AS DOUBLE) AS ll
                 FROM s)
      SELECT n_items, ROUND(ll, 6) + 0 AS log_loss,
             ROUND(-(base * LN(base) + (1.0 - base) * LN(1.0 - base)), 6) + 0
               AS base_entropy,
             ROUND(1.0 - ll / (-(base * LN(base)
               + (1.0 - base) * LN(1.0 - base))), 4) + 0 AS skill_score
      FROM m""",

    "q_score_ks" -> """
      WITH cells AS (SELECT CAST(FLOOR((-2.0 + 30.0 * l_discount
                       + 0.02 * CAST(l_quantity AS DOUBLE)) * 100.0) AS BIGINT) AS s,
                            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                              AS BIGINT) AS c1,
                            CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
                              AS BIGINT) AS c0
                     FROM lineitem GROUP BY 1),
           tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                          CAST(SUM(c0) AS BIGINT) AS n0
                   FROM cells),
           cum AS (SELECT a.s, CAST(SUM(b.c1) AS BIGINT) AS cum1,
                          CAST(SUM(b.c0) AS BIGINT) AS cum0
                   FROM cells a JOIN cells b ON b.s <= a.s GROUP BY 1),
           sup AS (SELECT MAX(n1) AS n1, MAX(n0) AS n0,
                          MAX(ABS(cum1 * n0 - cum0 * n1)) AS supint
                   FROM cum, tot)
      SELECT n1, n0,
             ROUND(CAST(supint AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 4) + 0
               AS ks_discrimination
      FROM sup""",

    "q_hartley_fmax" -> """
      WITH g AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS s,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ss
                 FROM orders GROUP BY 1),
           v AS (SELECT (ss - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
                 FROM g),
           f AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(v) AS vmax,
                        MIN(v) AS vmin, SUM(v) AS sv
                 FROM v)
      SELECT k AS n_groups, ROUND(vmax / vmin, 4) + 0 AS hartley_fmax,
             ROUND(vmax / sv, 4) + 0 AS cochran_c
      FROM f""",

    "q_scheffe_contrast" -> """
      WITH g AS (SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS s,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ss
                 FROM orders GROUP BY 1),
           msw AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                          SUM(ss - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                            / CAST(n AS DOUBLE))
                            / (CAST(SUM(n) AS DOUBLE) - CAST(COUNT(*) AS DOUBLE))
                            AS msw
                   FROM g),
           a AS (SELECT n AS n1, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m1
                 FROM g WHERE g = '1-URGENT'),
           b AS (SELECT n AS n5, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m5
                 FROM g WHERE g = '5-LOW'),
           f AS (SELECT n1, n5, (m1 - m5) / 100.0 AS d,
                        SQRT((CAST(k AS DOUBLE) - 1.0) * 2.372)
                          * SQRT(msw * (1.0 / CAST(n1 AS DOUBLE)
                            + 1.0 / CAST(n5 AS DOUBLE))) / 100.0 AS hw
                 FROM a, b, msw)
      SELECT n1, n5, ROUND(d, 2) + 0 AS contrast_dollars,
             ROUND(hw, 2) + 0 AS scheffe_halfwidth,
             CAST(CASE WHEN ABS(d) > hw THEN 1 ELSE 0 END AS BIGINT) AS significant
      FROM f""",

    "q_polynomial_contrasts" -> """
      WITH g AS (SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
                        CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          AS s,
                        SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                          * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE))
                          AS ss
                 FROM orders GROUP BY 1),
           msw AS (SELECT SUM(ss - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / CAST(n AS DOUBLE))
                     / (CAST(SUM(n) AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)) AS msw
                   FROM g),
           coefs AS (SELECT * FROM (VALUES
                       ('linear', 1, -2.0), ('linear', 2, -1.0), ('linear', 3, 0.0),
                       ('linear', 4, 1.0), ('linear', 5, 2.0),
                       ('quadratic', 1, 2.0), ('quadratic', 2, -1.0),
                       ('quadratic', 3, -2.0), ('quadratic', 4, -1.0),
                       ('quadratic', 5, 2.0)) t(contrast, j, cf)),
           l AS (SELECT contrast,
                        SUM(cf * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS l,
                        SUM(cf * cf / CAST(n AS DOUBLE)) AS c2n
                 FROM g JOIN coefs ON g.j = coefs.j GROUP BY 1)
      SELECT contrast, ROUND(l / 100.0, 2) + 0 AS estimate_dollars,
             ROUND(l / SQRT(msw * c2n), 4) + 0 AS t
      FROM l, msw ORDER BY contrast""",

    "q_survival_cindex" -> """
      WITH obs AS (SELECT CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS BIGINT) AS t,
                          CASE WHEN MAX(CAST(ts AS DATE)) <= DATE '2024-01-23'
                               THEN 1 ELSE 0 END AS e,
                          CAST(COUNT(*) AS BIGINT) AS score
                   FROM events GROUP BY user_id),
           cells AS (SELECT t, e, score, CAST(COUNT(*) AS BIGINT) AS c
                     FROM obs GROUP BY 1, 2, 3),
           s AS (SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS comparable,
                        CAST(SUM(CASE WHEN a.score > b.score THEN a.c * b.c
                                      ELSE 0 END) AS BIGINT) AS concordant,
                        CAST(SUM(CASE WHEN a.score = b.score THEN a.c * b.c
                                      ELSE 0 END) AS BIGINT) AS tied
                 FROM cells a JOIN cells b ON b.t > a.t
                 WHERE a.e = 1)
      SELECT comparable, concordant, tied,
             ROUND(CAST(2 * concordant + tied AS DOUBLE)
               / CAST(2 * comparable AS DOUBLE), 4) + 0 AS c_index
      FROM s""",

    "q_embedding_eigen2" -> """
      WITH xy AS (SELECT CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1e7) AS BIGINT)
                           AS x,
                         CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1e7) AS BIGINT)
                           AS y
                  FROM embeddings),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx,
                        SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy,
                        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS sxy
                 FROM xy),
           cov AS (SELECT n,
                          sxx / CAST(n AS DOUBLE)
                            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS a,
                          syy / CAST(n AS DOUBLE)
                            - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS c,
                          sxy / CAST(n AS DOUBLE)
                            - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS b
                  FROM s),
           lam AS (SELECT n AS n_vectors,
                          (a + c) / 2.0 + SQRT(((a - c) / 2.0) * ((a - c) / 2.0)
                            + b * b) AS lam1,
                          (a + c) / 2.0 - SQRT(((a - c) / 2.0) * ((a - c) / 2.0)
                            + b * b) AS lam2
                   FROM cov)
      SELECT n_vectors, ROUND(lam1 / 1.0e14, 6) + 0 AS lam1_unit,
             ROUND(lam2 / 1.0e14, 6) + 0 AS lam2_unit,
             ROUND(lam1 / (lam1 + lam2), 4) + 0 AS explained_share
      FROM lam""",

    "q_embedding_isotropy" -> """
      WITH dims AS (SELECT i - 1 AS dim,
                           CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e7) AS BIGINT)
                             AS x
                    FROM embeddings, (SELECT unnest(generate_series(1, 8)) AS i)),
           v AS (SELECT dim,
                        SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                          / CAST(COUNT(*) AS DOUBLE)
                          - (CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                            * (CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                          AS v
                 FROM dims GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims, MAX(v) AS vmax,
                        SUM(v) AS sv, SUM(v * v) AS svv
                 FROM v)
      SELECT n_dims,
             ROUND(vmax / (sv / CAST(n_dims AS DOUBLE)), 4) + 0
               AS max_over_mean_var,
             ROUND(sv * sv / svv, 4) + 0 AS participation_ratio
      FROM s""",

    "q_hourly_profile" -> """
      WITH hrs AS (SELECT CAST(((epoch_ns(ts) // 1000) // 3600000000) % 24
                            AS BIGINT) AS h,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM events GROUP BY 1),
           tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hrs),
           chi AS (SELECT MAX(n) AS n,
                          SUM((CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 24.0)
                            * (CAST(c AS DOUBLE) - CAST(n AS DOUBLE) / 24.0)
                            / (CAST(n AS DOUBLE) / 24.0)) AS chi2,
                          MAX(c) AS cmax
                   FROM hrs, tot),
           peak AS (SELECT MIN(h) AS peak_hour
                    FROM hrs, chi WHERE c = cmax)
      SELECT n AS n_events, ROUND(chi2, 4) + 0 AS chi2_uniform,
             CAST(CASE WHEN chi2 > 35.172462 THEN 1 ELSE 0 END AS BIGINT)
               AS reject_uniform,
             peak_hour
      FROM chi, peak""",

    "q_topsis_ranking" -> """
      WITH nat AS (SELECT c.c_nationkey AS nk,
                          CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                            AS BIGINT) AS rev,
                          CAST(COUNT(*) AS BIGINT) AS cnt,
                          SUM(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END)
                            / CAST(COUNT(*) AS DOUBLE) AS rr
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   JOIN customer c ON o_custkey = c.c_custkey
                   GROUP BY 1),
           norms AS (SELECT SQRT(SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)))
                              AS nr,
                            SQRT(SUM(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)))
                              AS nc,
                            SQRT(SUM(rr * rr)) AS nrr
                     FROM nat),
           sc AS (SELECT nk, CAST(rev AS DOUBLE) / nr AS v1,
                         CAST(cnt AS DOUBLE) / nc AS v2, rr / nrr AS v3
                  FROM nat, norms),
           ide AS (SELECT MAX(v1) AS b1, MAX(v2) AS b2, MIN(v3) AS b3,
                          MIN(v1) AS w1, MIN(v2) AS w2, MAX(v3) AS w3
                   FROM sc),
           dd AS (SELECT nk AS nation,
                         SQRT((v1 - b1) * (v1 - b1) + (v2 - b2) * (v2 - b2)
                           + (v3 - b3) * (v3 - b3)) AS dplus,
                         SQRT((v1 - w1) * (v1 - w1) + (v2 - w2) * (v2 - w2)
                           + (v3 - w3) * (v3 - w3)) AS dminus
                  FROM sc, ide)
      SELECT nation, ROUND(dminus / (dplus + dminus), 6) + 0 AS closeness
      FROM dd ORDER BY closeness DESC, nation LIMIT 5""",

    "q_theta_forecast" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar
                   FROM rev),
           pred AS (SELECT a.m, a.rev AS actual,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2 HAVING COUNT(*) = 12),
           t AS (SELECT CAST(actual AS DOUBLE) AS y, yhat AS ses,
                        ybar + b * (CAST(pred.m AS DOUBLE) - tbar) AS trend
                 FROM pred, fit),
           t2 AS (SELECT y, ses, trend, (ses + trend) / 2.0 AS theta FROM t),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(ABS(y - ses)) AS mses, SUM(ABS(y - trend)) AS mtrend,
                        SUM(ABS(y - theta)) AS mtheta
                 FROM t2)
      SELECT n AS n_forecasts,
             ROUND(mtheta / CAST(n AS DOUBLE) / 100.0, 2) + 0 AS theta_mae_dollars,
             ROUND(mses / CAST(n AS DOUBLE) / 100.0, 2) + 0 AS ses_mae_dollars,
             ROUND(mtrend / CAST(n AS DOUBLE) / 100.0, 2) + 0 AS trend_mae_dollars,
             CAST(CASE WHEN mtheta < mses AND mtheta < mtrend THEN 1 ELSE 0 END
               AS BIGINT) AS theta_wins
      FROM s""",

    "q_tracking_signal" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           pred AS (SELECT a.m, a.rev AS actual,
                           SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS yhat
                    FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                    GROUP BY 1, 2 HAVING COUNT(*) = 12),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(CAST(actual AS DOUBLE) - yhat) AS se,
                        SUM(ABS(CAST(actual AS DOUBLE) - yhat)) AS sae
                 FROM pred)
      SELECT n AS n_forecasts, ROUND(se / 100.0, 2) + 0 AS cum_error_dollars,
             ROUND(sae / CAST(n AS DOUBLE) / 100.0, 2) + 0 AS mad_dollars,
             ROUND(se / (sae / CAST(n AS DOUBLE)), 4) + 0 AS tracking_signal,
             CAST(CASE WHEN ABS(se / (sae / CAST(n AS DOUBLE))) > 4.0
               THEN 1 ELSE 0 END AS BIGINT) AS biased
      FROM s""",

    "q_max_subarray" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           base AS (SELECT MIN(m) AS m0 FROM rev),
           pre AS (SELECT a.m, CAST(SUM(b.rev) AS BIGINT) AS cum
                   FROM rev a JOIN rev b ON b.m <= a.m GROUP BY 1),
           pts AS (SELECT m, cum FROM pre
                   UNION ALL SELECT m0 - 1 AS m, CAST(0 AS BIGINT) AS cum FROM base),
           best AS (SELECT a.m AS mi, b.m AS mj, b.cum - a.cum AS gain
                    FROM pts a JOIN pts b ON b.m > a.m),
           mx AS (SELECT MAX(gain) AS g FROM best),
           win AS (SELECT mi, mj, gain FROM best, mx WHERE gain = g
                   ORDER BY mi, mj LIMIT 1)
      SELECT mi + 1 AS start_month, mj AS end_month, mj - mi AS window_months,
             ROUND(CAST(gain AS DOUBLE) / 100.0, 2) + 0 AS total_gain_dollars
      FROM win""",

    "q_simrank_step" -> """
      WITH cb AS (SELECT DISTINCT o_custkey AS c, p_brand AS b
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN part ON l_partkey = p_partkey),
           deg AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS d FROM cb GROUP BY 1),
           com AS (SELECT x.b AS ba, y.b AS bb, CAST(COUNT(*) AS BIGINT) AS common
                   FROM cb x JOIN cb y ON y.c = x.c AND y.b > x.b
                   GROUP BY 1, 2)
      SELECT ba, bb,
             ROUND(0.8 * CAST(common AS DOUBLE)
               / (CAST(da.d AS DOUBLE) * CAST(db.d AS DOUBLE)), 6) + 0 AS simrank1
      FROM com JOIN deg da ON com.ba = da.b JOIN deg db ON com.bb = db.b
      ORDER BY simrank1 DESC, ba, bb LIMIT 10""",

    "q_gray_relational" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS ya
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS yb
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           d AS (SELECT sega.m, ABS(ya - yb) AS dl
                 FROM sega JOIN segb ON sega.m = segb.m),
           ext AS (SELECT MIN(dl) AS dmin, MAX(dl) AS dmax,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM d),
           xi AS (SELECT n, (CAST(dmin AS DOUBLE) + 0.5 * CAST(dmax AS DOUBLE))
                           / (CAST(dl AS DOUBLE) + 0.5 * CAST(dmax AS DOUBLE)) AS xi
                  FROM d, ext),
           s AS (SELECT n, SUM(xi) AS sxi FROM xi GROUP BY 1)
      SELECT n AS n_months,
             ROUND(sxi / CAST(n AS DOUBLE), 4) + 0 AS grey_relational_grade
      FROM s""",

    "q_median_polish" -> """
      WITH cell AS (SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS r,
                           CAST(month(o_orderdate) AS BIGINT) AS cmo,
                           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) // COUNT(*) AS BIGINT) AS v
                    FROM orders GROUP BY 1, 2),
           rmed AS (SELECT rk, MIN(v) AS rmed
                    FROM (SELECT a.r AS rk, a.v,
                                 CAST(SUM(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
                                   AS BIGINT) AS below,
                                 CAST(COUNT(*) AS BIGINT) AS tot
                          FROM cell a JOIN cell b ON b.r = a.r
                          GROUP BY 1, 2)
                    WHERE 2 * below < tot AND 2 * (below + 1) >= tot
                    GROUP BY 1),
           res1 AS (SELECT r, cmo, v - rmed AS e1
                    FROM cell JOIN rmed ON cell.r = rmed.rk),
           cmed AS (SELECT ck, MIN(e1) AS cmed
                    FROM (SELECT a.cmo AS ck, a.e1,
                                 CAST(SUM(CASE WHEN b.e1 < a.e1 THEN 1 ELSE 0 END)
                                   AS BIGINT) AS below,
                                 CAST(COUNT(*) AS BIGINT) AS tot
                          FROM res1 a JOIN res1 b ON b.cmo = a.cmo
                          GROUP BY 1, 2)
                    WHERE 2 * below < tot AND 2 * (below + 1) >= tot
                    GROUP BY 1),
           res2 AS (SELECT e1 - cmed AS e2
                    FROM res1 JOIN cmed ON res1.cmo = cmed.ck),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                        CAST(MAX(ABS(e2)) AS BIGINT) AS mx,
                        CAST(SUM(ABS(e2)) AS BIGINT) AS sm
                 FROM res2)
      SELECT n_cells, ROUND(CAST(mx AS DOUBLE) / 100.0, 2) + 0
               AS max_abs_resid_dollars,
             ROUND(CAST(sm AS DOUBLE) / (CAST(n_cells AS DOUBLE) * 100.0), 2) + 0
               AS mean_abs_resid_dollars
      FROM s""",

    "q_seasonal_strength" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            % 12 AS cmo,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1, 2),
           fit AS (SELECT (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar
                   FROM rev),
           det AS (SELECT cmo,
                          CAST(rev AS DOUBLE) - ybar
                            - b * (CAST(m AS DOUBLE) - tbar) AS e
                   FROM rev, fit),
           seas AS (SELECT cmo, AVG(e) AS smean FROM det GROUP BY 1),
           r AS (SELECT e, e - smean AS r
                 FROM det JOIN seas ON det.cmo = seas.cmo),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(e * e) AS se2,
                        SUM(e) AS se, SUM(r * r) AS sr2, SUM(r) AS sr
                 FROM r)
      SELECT n AS n_months,
             ROUND(GREATEST(0.0, 1.0
               - (sr2 / CAST(n AS DOUBLE)
                 - (sr / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE)))
               / (se2 / CAST(n AS DOUBLE)
                 - (se / CAST(n AS DOUBLE)) * (se / CAST(n AS DOUBLE)))), 4) + 0
               AS seasonal_strength
      FROM s""",

    "q_blomqvist_beta" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS x
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS y
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           xy AS (SELECT sega.m, x, y FROM sega JOIN segb ON sega.m = segb.m),
           totx AS (SELECT CAST((COUNT(*) + 1) // 2 AS BIGINT) AS k FROM xy),
           medx AS (SELECT MIN(v) AS med_x
                    FROM (SELECT a.x AS v, CAST(COUNT(*) AS BIGINT) AS cum
                          FROM xy a JOIN xy b ON b.x <= a.x GROUP BY 1), totx
                    WHERE cum >= k),
           medy AS (SELECT MIN(v) AS med_y
                    FROM (SELECT a.y AS v, CAST(COUNT(*) AS BIGINT) AS cum
                          FROM xy a JOIN xy b ON b.y <= a.y GROUP BY 1), totx
                    WHERE cum >= k),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
                        CAST(SUM(CASE WHEN (x > med_x) = (y > med_y)
                          THEN 1 ELSE 0 END) AS BIGINT) AS same
                 FROM xy, medx, medy
                 WHERE x <> med_x AND y <> med_y)
      SELECT n_used, same,
             ROUND(CAST(2 * same - n_used AS DOUBLE) / CAST(n_used AS DOUBLE), 4)
               + 0 AS blomqvist_beta
      FROM s""",

    "q_hoeffding_d" -> """
      WITH sega AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS x
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1),
           segb AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                             AS m,
                           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                             AS y
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_mktsegment = 'AUTOMOBILE' GROUP BY 1),
           xy AS (SELECT sega.m, x, y FROM sega JOIN segb ON sega.m = segb.m),
           rk AS (SELECT a.m,
                         CAST(SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) + 1
                           AS BIGINT) AS r,
                         CAST(SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) + 1
                           AS BIGINT) AS s,
                         CAST(SUM(CASE WHEN b.x < a.x AND b.y < a.y THEN 1 ELSE 0 END)
                           AS BIGINT) AS q
                  FROM xy a JOIN xy b ON b.m <> a.m
                  GROUP BY 1),
           agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(q * (q - 1)) AS BIGINT) AS d1,
                          CAST(SUM((r - 1) * (r - 2) * (s - 1) * (s - 2)) AS BIGINT)
                            AS d2,
                          CAST(SUM((r - 2) * (s - 2) * q) AS BIGINT) AS d3
                   FROM rk)
      SELECT n AS n_months,
             ROUND(30.0 * ((CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)
               * CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE)
               - 2.0 * (CAST(n AS DOUBLE) - 2.0) * CAST(d3 AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                 * (CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0)
                 * (CAST(n AS DOUBLE) - 4.0)), 6) + 0 AS hoeffding_d
      FROM agg""",

    "q_bootstrap_ci" -> """
      WITH bs AS (SELECT CAST(bb AS BIGINT) AS b
                  FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),
                               (12),(13),(14),(15),(16),(17),(18),(19)) t(bb)),
           h0 AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
                         CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
                           1, 8) AS BIGINT) AS h0
                  FROM orders),
           h AS (SELECT b, x,
                        ((h0 * (b * 2 + 1) + b * 40503)
                          % 4294967296) % 1000 AS hh
                 FROM h0 CROSS JOIN bs),
           w AS (SELECT b, x,
                        CASE WHEN hh < 368 THEN 0 WHEN hh < 736 THEN 1
                             WHEN hh < 920 THEN 2 WHEN hh < 981 THEN 3
                             ELSE 4 END AS w
                 FROM h),
           means AS (SELECT CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mb
                     FROM w GROUP BY b),
           rk AS (SELECT a.mb, CAST(COUNT(b.mb) AS BIGINT) AS below
                  FROM means a LEFT JOIN means b ON b.mb < a.mb
                  GROUP BY 1),
           lo AS (SELECT MIN(mb) AS lo FROM rk WHERE below = 1),
           hi AS (SELECT MIN(mb) AS hi FROM rk WHERE below = 18),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_resamples, SUM(mb) AS sm
                 FROM means)
      SELECT n_resamples,
             ROUND(sm / CAST(n_resamples AS DOUBLE) / 100.0, 4) + 0
               AS boot_mean_dollars,
             ROUND(lo / 100.0, 4) + 0 AS ci_lo_dollars,
             ROUND(hi / 100.0, 4) + 0 AS ci_hi_dollars
      FROM s, lo, hi""",

    "q_tail_bounds" -> """
      WITH dc AS (SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                           AS BIGINT) AS d,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM orders GROUP BY 1),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
                         CAST(SUM(c * c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                           - (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                             * (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                           AS v
                  FROM dc),
           t AS (SELECT n, mu, v,
                        CAST(SUM(CASE WHEN CAST(c AS DOUBLE) >= 1.5 * mu
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
                 FROM dc, st GROUP BY 1, 2, 3)
      SELECT n AS n_days, ROUND(1.5 * mu, 2) + 0 AS threshold,
             ROUND(CAST(n_tail AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0
               AS empirical_tail,
             ROUND(mu / (1.5 * mu), 4) + 0 AS markov_bound,
             ROUND(v / (0.25 * mu * mu), 4) + 0 AS chebyshev_bound,
             ROUND(v / (v + 0.25 * mu * mu), 4) + 0 AS cantelli_bound
      FROM t""",

    "q_entropy_corrected" -> """
      WITH wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
                        CAST(SUM(c) AS BIGINT) AS n,
                        SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS scl
                 FROM wc),
           m AS (SELECT n AS n_tokens, vocab,
                        LN(CAST(n AS DOUBLE)) - scl / CAST(n AS DOUBLE) AS h_mle
                 FROM s)
      SELECT n_tokens, vocab, ROUND(h_mle, 4) + 0 AS h_mle,
             ROUND(h_mle + (CAST(vocab AS DOUBLE) - 1.0)
               / (2.0 * CAST(n_tokens AS DOUBLE)), 4) + 0 AS h_miller_madow
      FROM m""",

    "q_ace_richness" -> """
      WITH bg AS (SELECT word || ' ' || LEAD(word) OVER (PARTITION BY doc_id
                    ORDER BY pos) AS g
                  FROM (SELECT doc_id,
                               unnest(string_split(lower(text), ' ')) AS word,
                               generate_subscripts(string_split(lower(text), ' '), 1)
                                 AS pos
                        FROM documents)),
           wc AS (SELECT g AS word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM bg WHERE g IS NOT NULL GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
                        CAST(SUM(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT)
                          AS s_abund,
                        CAST(SUM(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                          AS s_rare,
                        CAST(SUM(CASE WHEN c <= 10 THEN c ELSE 0 END) AS BIGINT)
                          AS n_rare,
                        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                        CAST(SUM(CASE WHEN c <= 10 THEN c * (c - 1) ELSE 0 END)
                          AS BIGINT) AS scc
                 FROM wc),
           m AS (SELECT s_obs, s_abund, s_rare, f1, n_rare, scc,
                        1.0 - CAST(f1 AS DOUBLE) / CAST(n_rare AS DOUBLE) AS c_ace
                 FROM s)
      SELECT s_obs, f1, ROUND(c_ace, 4) + 0 AS coverage_ace,
             ROUND(CAST(s_abund AS DOUBLE) + CAST(s_rare AS DOUBLE) / c_ace
               + CAST(f1 AS DOUBLE) / c_ace
                 * GREATEST(0.0, CAST(s_rare AS DOUBLE) / c_ace
                   * CAST(scc AS DOUBLE)
                   / (CAST(n_rare AS DOUBLE) * (CAST(n_rare AS DOUBLE) - 1.0))
                   - 1.0), 2) + 0 AS s_ace
      FROM m""",

    "q_clt_diagnostic" -> """
      WITH lv AS (
        SELECT '1_daily' AS level,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS g,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
        FROM orders
        UNION ALL
        SELECT '2_weekly' AS level,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) // 7
                 AS g,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
        FROM orders
        UNION ALL
        SELECT '3_monthly' AS level,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS g,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
        FROM orders),
           agg AS (SELECT level, g, CAST(SUM(tp) AS BIGINT) AS rev
                   FROM lv GROUP BY 1, 2),
           s AS (SELECT level, CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(CAST(rev AS DOUBLE)) AS s1,
                        SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS s2,
                        SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)
                          * CAST(rev AS DOUBLE)) AS s3
                 FROM agg GROUP BY 1),
           a AS (SELECT level, n, s1 / CAST(n AS DOUBLE) AS mu,
                        s2 / CAST(n AS DOUBLE) AS a2, s3 / CAST(n AS DOUBLE) AS a3
                 FROM s),
           m AS (SELECT level, n, a2 - mu * mu AS m2,
                        a3 - 3.0 * mu * a2 + 2.0 * mu * mu * mu AS m3
                 FROM a)
      SELECT level, n, ROUND(m3 / (m2 * SQRT(m2)), 4) + 0 AS skew
      FROM m ORDER BY level""",

    "q_zip_fit" -> """
      WITH months AS (SELECT DISTINCT CAST(year(o_orderdate) * 12
                        + month(o_orderdate) AS BIGINT) AS m
                      FROM orders),
           custs AS (SELECT DISTINCT o_custkey AS c FROM orders),
           counts AS (SELECT o_custkey AS c,
                             CAST(year(o_orderdate) * 12 + month(o_orderdate)
                               AS BIGINT) AS m,
                             CAST(COUNT(*) AS BIGINT) AS k
                      FROM orders GROUP BY 1, 2),
           uni AS (SELECT COALESCE(k, 0) AS k
                   FROM custs CROSS JOIN months
                   LEFT JOIN counts ON custs.c = counts.c AND months.m = counts.m),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
                        CAST(SUM(k * k) AS BIGINT) AS skk,
                        CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
                 FROM uni),
           m AS (SELECT n, CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) AS mbar,
                        CAST(skk AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sk AS DOUBLE) / CAST(n AS DOUBLE)) AS v,
                        CAST(z AS DOUBLE) / CAST(n AS DOUBLE) AS z0
                 FROM s)
      SELECT n AS n_cells, ROUND(mbar, 4) + 0 AS mean_count,
             ROUND(v, 4) + 0 AS var_count,
             ROUND((v + mbar * mbar - mbar) / mbar, 4) + 0 AS zip_lambda,
             ROUND(1.0 - mbar / ((v + mbar * mbar - mbar) / mbar), 4) + 0
               AS zip_pi_zero,
             ROUND(z0, 4) + 0 AS observed_zero_share
      FROM m""",

    "q_dfbetas" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar,
                          CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
                              / CAST(COUNT(*) AS DOUBLE) AS cstt
                   FROM rev),
           resid AS (SELECT m, n, cstt, tbar,
                            1.0 / CAST(n AS DOUBLE)
                              + (CAST(m AS DOUBLE) - tbar)
                                * (CAST(m AS DOUBLE) - tbar) / cstt AS h,
                            CAST(rev AS DOUBLE) - ybar
                              - b * (CAST(m AS DOUBLE) - tbar) AS e
                     FROM rev, fit),
           sv AS (SELECT MAX(n) AS nn, MAX(cstt) AS cs, SUM(e * e) AS rss
                  FROM resid),
           s2 AS (SELECT rss / (CAST(nn AS DOUBLE) - 2.0) AS s2, cs FROM sv),
           d AS (SELECT m,
                        ROUND((e * (CAST(m AS DOUBLE) - tbar)
                          / ((1.0 - h) * cstt)) / SQRT(s2 / cs), 6) + 0 AS dfbetas
                 FROM resid, s2)
      SELECT m, dfbetas FROM d
      ORDER BY ABS(dfbetas) DESC, m LIMIT 5""",

    "q_press_statistic" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * rev) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
                          / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)) AS b,
                          CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar,
                          CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tbar,
                          CAST(SUM(m * m) AS DOUBLE)
                            - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
                              / CAST(COUNT(*) AS DOUBLE) AS cstt,
                          SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE))
                            - CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)
                              / CAST(COUNT(*) AS DOUBLE) AS cyy
                   FROM rev),
           t AS (SELECT n, cyy,
                        (CAST(rev AS DOUBLE) - ybar
                          - b * (CAST(m AS DOUBLE) - tbar))
                          / (1.0 - (1.0 / CAST(n AS DOUBLE)
                            + (CAST(m AS DOUBLE) - tbar)
                              * (CAST(m AS DOUBLE) - tbar) / cstt)) AS pe,
                        CAST(rev AS DOUBLE) - ybar
                          - b * (CAST(m AS DOUBLE) - tbar) AS e
                 FROM rev, fit),
           s AS (SELECT n, cyy, SUM(pe * pe) AS press, SUM(e * e) AS rss
                 FROM t GROUP BY 1, 2)
      SELECT n AS n_months, ROUND(1.0 - rss / cyy, 4) + 0 AS r2_fit,
             ROUND(1.0 - press / cyy, 4) + 0 AS r2_pred,
             ROUND(press / rss, 4) + 0 AS press_over_rss
      FROM s""",

    "q_rank_size_rule" -> """
      WITH nat AS (SELECT c.c_nationkey AS nk,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                   GROUP BY 1),
           rk AS (SELECT a.nk, a.rev,
                         CAST(COUNT(b.nk) + 1 AS BIGINT) AS rnk
                  FROM nat a LEFT JOIN nat b
                    ON b.rev > a.rev OR (b.rev = a.rev AND b.nk < a.nk)
                  GROUP BY 1, 2),
           l AS (SELECT LN(CAST(rnk AS DOUBLE)) AS x,
                        LN(CAST(rev AS DOUBLE)) AS y
                 FROM rk),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
                 FROM l)
      SELECT n AS n_nations,
             ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) + 0 AS zipf_slope,
             ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
               * (CAST(n AS DOUBLE) * sxy - sx * sy)
               / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                 * (CAST(n AS DOUBLE) * syy - sy * sy)), 4) + 0 AS r2
      FROM s""",

    "q_decile_ratio" -> """
      WITH vals AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t
                    FROM (SELECT CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                   AS BIGINT)) AS BIGINT) // 10000 AS BIGINT) AS v
                          FROM orders GROUP BY o_custkey)
                    GROUP BY 1),
           tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
                          CAST((CAST(SUM(t) AS BIGINT) + 9) // 10 AS BIGINT) AS k10,
                          CAST((CAST(SUM(t) AS BIGINT) + 1) // 2 AS BIGINT) AS k50,
                          CAST((9 * CAST(SUM(t) AS BIGINT) + 9) // 10 AS BIGINT)
                            AS k90
                   FROM vals),
           cum AS (SELECT a.v, CAST(SUM(b.t) AS BIGINT) AS cum
                   FROM vals a JOIN vals b ON b.v <= a.v GROUP BY 1),
           q AS (SELECT MAX(n) AS n_customers,
                        MIN(CASE WHEN cum >= k10 THEN v END) AS p10_bin,
                        MIN(CASE WHEN cum >= k50 THEN v END) AS p50_bin,
                        MIN(CASE WHEN cum >= k90 THEN v END) AS p90_bin
                 FROM cum, tot)
      SELECT n_customers, p10_bin, p50_bin, p90_bin,
             ROUND(CAST(p90_bin AS DOUBLE) / CAST(p10_bin AS DOUBLE), 4) + 0
               AS p90_p10,
             ROUND(CAST(p90_bin AS DOUBLE) / CAST(p50_bin AS DOUBLE), 4) + 0
               AS p90_p50
      FROM q""",

    "q_iqv" -> """
      WITH c AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c
                 FROM customer GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(c) AS BIGINT) AS n,
                        CAST(SUM(c * c) AS BIGINT) AS scc
                 FROM c)
      SELECT k AS n_categories, n AS n_customers,
             ROUND((CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
               * (1.0 - CAST(scc AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 4) + 0 AS iqv
      FROM s""",

    "q_pearson_skew2" -> """
      WITH vals AS (SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000
                             AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS t
                    FROM orders GROUP BY 1),
           st AS (SELECT CAST(SUM(t) AS BIGINT) AS n, MIN(v) AS vmin, MAX(v) AS vmax,
                         CAST((CAST(SUM(t) AS BIGINT) + 1) // 2 AS BIGINT) AS k,
                         CAST(CAST(SUM(v * t) AS BIGINT) AS DOUBLE)
                           / CAST(SUM(t) AS DOUBLE) AS mu,
                         SQRT(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                             * CAST(t AS DOUBLE)) / CAST(SUM(t) AS DOUBLE)
                           - (CAST(CAST(SUM(v * t) AS BIGINT) AS DOUBLE)
                             / CAST(SUM(t) AS DOUBLE))
                             * (CAST(CAST(SUM(v * t) AS BIGINT) AS DOUBLE)
                               / CAST(SUM(t) AS DOUBLE))) AS sig
                  FROM vals),
           med AS (SELECT MIN(v) AS med
                   FROM (SELECT a.v, CAST(SUM(b.t) AS BIGINT) AS cum
                         FROM vals a JOIN vals b ON b.v <= a.v GROUP BY 1), st
                   WHERE cum >= k)
      SELECT n AS n_orders,
             ROUND(3.0 * (mu - CAST(med AS DOUBLE)) / sig, 4) + 0 AS pearson_skew2,
             ROUND(sig / (CAST(vmax - vmin AS DOUBLE) / 4.0), 4) + 0
               AS sd_over_range4
      FROM st, med""",

    "q_pielou_evenness" -> """
      WITH wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                        FROM documents)
                  GROUP BY 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
                        CAST(SUM(c) AS BIGINT) AS n,
                        SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS scl,
                        MAX(c) AS cmax
                 FROM wc),
           m AS (SELECT n AS n_tokens, vocab,
                        LN(CAST(n AS DOUBLE)) - scl / CAST(n AS DOUBLE) AS h, cmax
                 FROM s)
      SELECT n_tokens, vocab,
             ROUND(h / LN(CAST(vocab AS DOUBLE)), 4) + 0 AS pielou_j,
             ROUND(CAST(cmax AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) + 0
               AS berger_parker
      FROM m""",

    // ---- round 4: corpus structure / decode / engagement (§2.124) ----

    "q_dedup_crossshard" -> """
      WITH fe AS (SELECT DISTINCT md5(text) AS fp, source FROM documents),
           fp80 AS (SELECT DISTINCT md5(substring(text, 1, 80)) AS fp, source
                    FROM documents),
           ex AS (SELECT a.source AS source_a, b.source AS source_b,
                         CAST(COUNT(*) AS BIGINT) AS n_shared_exact
                  FROM fe a JOIN fe b ON a.fp = b.fp AND a.source < b.source
                  GROUP BY 1, 2),
           pre AS (SELECT a.source AS source_a, b.source AS source_b,
                          CAST(COUNT(*) AS BIGINT) AS n_shared_prefix80
                   FROM fp80 a JOIN fp80 b ON a.fp = b.fp AND a.source < b.source
                   GROUP BY 1, 2)
      SELECT source_a, source_b,
             CAST(COALESCE(n_shared_exact, 0) AS BIGINT) AS n_shared_exact,
             n_shared_prefix80
      FROM pre LEFT JOIN ex USING (source_a, source_b)
      ORDER BY 1, 2""",

    "q_log_odds_terms" -> """
      WITH c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS y
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1, 2),
           cw AS (SELECT lang, word, y,
                         CAST(SUM(y) OVER (PARTITION BY word) AS BIGINT) AS aw
                  FROM c),
           lt AS (SELECT lang, CAST(SUM(y) AS BIGINT) AS nl FROM c GROUP BY 1),
           g AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM lt),
           sc AS (SELECT cw.lang, word, y,
                         CAST(ROUND((LN((CAST(y AS DOUBLE) + CAST(aw AS DOUBLE))
                             / (CAST(nl AS DOUBLE) + CAST(n AS DOUBLE)
                                - CAST(y AS DOUBLE) - CAST(aw AS DOUBLE)))
                           - LN((CAST(aw - y AS DOUBLE) + CAST(aw AS DOUBLE))
                             / (CAST(n - nl AS DOUBLE) + CAST(n AS DOUBLE)
                                - CAST(aw - y AS DOUBLE) - CAST(aw AS DOUBLE))))
                           / SQRT(1.0 / (CAST(y AS DOUBLE) + CAST(aw AS DOUBLE))
                             + 1.0 / (CAST(aw - y AS DOUBLE) + CAST(aw AS DOUBLE)))
                           * 1e4) AS BIGINT) AS z_e4
                  FROM cw JOIN lt ON cw.lang = lt.lang CROSS JOIN g),
           r AS (SELECT lang, word, y, z_e4,
                        CAST(ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY z_e4 DESC, word) AS BIGINT) AS rn
                 FROM sc)
      SELECT lang, rn, word, y, z_e4 FROM r WHERE rn <= 5 ORDER BY lang, rn""",

    "q_char_entropy" -> """
      WITH ch AS (SELECT doc_id, lang,
                         unnest(list_transform(
                           generate_series(1, CAST(length(lt) AS INT)),
                           i -> substring(lt, i, 1))) AS ch
                  FROM (SELECT doc_id, lang, lower(text) AS lt FROM documents)),
           c AS (SELECT doc_id, lang, ch, CAST(COUNT(*) AS BIGINT) AS c
                 FROM ch GROUP BY 1, 2, 3),
           t AS (SELECT doc_id, lang, c,
                        CAST(ROUND(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)) * 1e4)
                          AS BIGINT) AS clnc_e4
                 FROM c),
           s AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS distinct_chars,
                        CAST(SUM(c) AS BIGINT) AS n_chars_used,
                        CAST(SUM(clnc_e4) AS BIGINT) AS s_e4
                 FROM t GROUP BY 1, 2)
      SELECT doc_id, lang, distinct_chars, n_chars_used,
             ROUND(LN(CAST(n_chars_used AS DOUBLE))
               - CAST(s_e4 AS DOUBLE) / (CAST(n_chars_used AS DOUBLE) * 1e4), 4) + 0
               AS entropy,
             CAST(CASE WHEN ROUND(LN(CAST(n_chars_used AS DOUBLE))
               - CAST(s_e4 AS DOUBLE) / (CAST(n_chars_used AS DOUBLE) * 1e4), 4)
                 >= 1.5 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM s ORDER BY doc_id""",

    "q_corpus_novelty" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
                          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                   FROM documents),
           nb AS (SELECT DISTINCT doc_id, w1, w2 FROM
                    (SELECT doc_id, w AS w1,
                            LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                     FROM tok)
                  WHERE w2 IS NOT NULL),
           fst AS (SELECT w1, w2, MIN(doc_id) AS first_doc FROM nb GROUP BY 1, 2),
           pd AS (SELECT nb.doc_id, CAST(COUNT(*) AS BIGINT) AS nb_n,
                         CAST(SUM(CASE WHEN first_doc = nb.doc_id THEN 1 ELSE 0 END)
                           AS BIGINT) AS nv
                  FROM nb JOIN fst USING (w1, w2) GROUP BY 1)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nb_n) AS BIGINT) AS doc_bigrams,
             CAST(SUM(nv) AS BIGINT) AS novel_bigrams,
             CAST(SUM(nv) * 10000 // SUM(nb_n) AS BIGINT) AS novelty_e4
      FROM documents JOIN pd USING (doc_id)
      GROUP BY 1 ORDER BY 1""",

    "q_winnowing_fingerprint" -> """
      WITH d AS (SELECT doc_id, lang, source, string_split(lower(text), ' ') AS t
                 FROM documents
                 WHERE len(string_split(lower(text), ' ')) >= 6),
           hs AS (SELECT doc_id, lang, source,
                         list_transform(generate_series(1, len(t) - 2),
                           i -> CAST('0x' || substring(md5(t[i] || ' ' || t[i+1]
                                || ' ' || t[i+2]), 1, 8) AS BIGINT)) AS hs
                  FROM d),
           fp AS (SELECT DISTINCT doc_id, lang, source, fp FROM
                    (SELECT doc_id, lang, source,
                            unnest(list_transform(generate_series(1, len(hs) - 3),
                              j -> list_aggregate(hs[j:j+3], 'min'))) AS fp
                     FROM hs)),
           pd AS (SELECT lang, source, doc_id, CAST(COUNT(*) AS BIGINT) AS nfp
                  FROM fp GROUP BY 1, 2, 3),
           pairs AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS candidate_pairs
                     FROM (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2,
                                  CAST(COUNT(*) AS BIGINT) AS shared
                           FROM fp a JOIN fp b
                             ON a.lang = b.lang AND a.source = b.source
                                AND a.fp = b.fp AND a.doc_id < b.doc_id
                           GROUP BY 1, 2, 3, 4)
                     WHERE shared >= 2 GROUP BY 1, 2)
      SELECT pd.lang, pd.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nfp) AS BIGINT) AS n_fingerprints,
             CAST(COALESCE(MAX(candidate_pairs), 0) AS BIGINT) AS candidate_pairs
      FROM pd LEFT JOIN pairs ON pd.lang = pairs.lang AND pd.source = pairs.source
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_viterbi_path" -> """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
                 FROM events),
           st AS (SELECT event_type AS s0, CAST(COUNT(*) AS BIGINT) AS c FROM
                    (SELECT user_id, event_type,
                            ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS rn
                     FROM e)
                  WHERE rn = 1 GROUP BY 1),
           tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM st),
           s0 AS (SELECT s0, CAST(ROUND(LN(CAST(c AS DOUBLE)
                    / CAST(tot AS DOUBLE)) * 1e8) AS BIGINT) AS sc0
                  FROM st, tot),
           ed AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM
                    (SELECT user_id, event_type AS dst,
                            LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS src
                     FROM e)
                  WHERE src IS NOT NULL GROUP BY 1, 2),
           tr AS (SELECT src, dst,
                         CAST(ROUND(LN(CAST(w AS DOUBLE) / CAST(ow AS DOUBLE)) * 1e8)
                           AS BIGINT) AS lt
                  FROM (SELECT src, dst, w,
                               CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS ow
                        FROM ed)),
           v1 AS (SELECT s1, sc1, p0 FROM
                    (SELECT tr.dst AS s1, sc0 + lt AS sc1, s0.s0 AS p0,
                            ROW_NUMBER() OVER (PARTITION BY tr.dst
                              ORDER BY sc0 + lt DESC, s0.s0 DESC) AS rn
                     FROM s0 JOIN tr ON s0.s0 = tr.src)
                  WHERE rn = 1),
           v2 AS (SELECT s2, sc2, p1, p0 FROM
                    (SELECT tr.dst AS s2, sc1 + lt AS sc2, v1.s1 AS p1, v1.p0,
                            ROW_NUMBER() OVER (PARTITION BY tr.dst
                              ORDER BY sc1 + lt DESC, v1.s1 DESC, v1.p0 DESC) AS rn
                     FROM v1 JOIN tr ON v1.s1 = tr.src)
                  WHERE rn = 1)
      SELECT p0 AS step0, p1 AS step1, s2 AS step2, CAST(sc2 AS BIGINT) AS score_e8
      FROM v2 ORDER BY sc2 DESC, s2 DESC, p1 DESC, p0 DESC LIMIT 1""",

    "q_partition_digest" -> """
      WITH r AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                        CAST('0x' || substring(md5(
                          CAST(event_id AS VARCHAR) || '|' ||
                          CAST(CAST(epoch_us(ts) AS BIGINT) AS VARCHAR) || '|' ||
                          CAST(user_id AS VARCHAR) || '|' ||
                          event_type || '|' ||
                          CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
                          || '|' || props), 1, 8) AS BIGINT) AS h
                 FROM events),
           d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_rows,
                        CAST(SUM(h) % 2305843009213693951 AS BIGINT) AS digest
                 FROM r GROUP BY 1),
           m AS (SELECT substring(day, 1, 7) AS month,
                        md5(string_agg(day || ':' || CAST(digest AS VARCHAR),
                          ',' ORDER BY day)) AS month_digest
                 FROM d GROUP BY 1)
      SELECT day, n_rows, digest, month_digest
      FROM d JOIN m ON substring(d.day, 1, 7) = m.month
      ORDER BY day""",

    // ---- round 5: distribution distances / divergences (§2.125) ----

    "q_jensen_shannon" -> """
      WITH c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1, 2),
           vocab AS (SELECT DISTINCT word FROM c),
           vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
           tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY lang),
           dense AS (SELECT tot.lang, vocab.word, tot.t, COALESCE(c.c, 0) AS c, vs.v
                     FROM tot CROSS JOIN vocab CROSS JOIN vs
                     LEFT JOIN c ON c.lang = tot.lang AND c.word = vocab.word),
           pq AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                         CAST(a.c + 1 AS DOUBLE) / CAST(a.t + a.v AS DOUBLE) AS p,
                         CAST(b.c + 1 AS DOUBLE) / CAST(b.t + b.v AS DOUBLE) AS q
                  FROM dense a JOIN dense b
                    ON a.word = b.word AND a.lang < b.lang),
           terms AS (SELECT lang_a, lang_b,
                            CAST(ROUND((0.5 * p * LN(p / ((p + q) / 2.0))
                                        + 0.5 * q * LN(q / ((p + q) / 2.0)))
                                       * 1e8) AS BIGINT) AS term_e8
                     FROM pq)
      SELECT lang_a, lang_b, CAST(SUM(term_e8) AS BIGINT) AS jsd_e8,
             ROUND(CAST(SUM(term_e8) AS DOUBLE) / 1e8, 4) + 0 AS jsd
      FROM terms GROUP BY 1, 2 ORDER BY lang_a, lang_b""",

    "q_renyi_spectrum" -> """
      WITH c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
                 FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
                       FROM documents)
                 GROUP BY 1, 2),
           s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS v_types,
                        CAST(SUM(c) AS BIGINT) AS t_tokens,
                        CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)) * 1e4)
                                      AS BIGINT)) AS BIGINT) AS s_e4,
                        CAST(SUM(c * c) AS BIGINT) AS s_c2,
                        CAST(MAX(c) AS BIGINT) AS c_max
                 FROM c GROUP BY lang)
      SELECT lang, v_types, t_tokens,
             ROUND(LN(CAST(v_types AS DOUBLE)), 4) + 0 AS h0,
             ROUND(LN(CAST(t_tokens AS DOUBLE))
                   - CAST(s_e4 AS DOUBLE) / (CAST(t_tokens AS DOUBLE) * 1e4), 4) + 0 AS h1,
             ROUND(2.0 * LN(CAST(t_tokens AS DOUBLE)) - LN(CAST(s_c2 AS DOUBLE)), 4) + 0 AS h2,
             ROUND(LN(CAST(t_tokens AS DOUBLE)) - LN(CAST(c_max AS DOUBLE)), 4) + 0 AS hinf
      FROM s ORDER BY lang""",

    "q_hellinger_distance" -> """
      WITH cn AS (SELECT n.n_name, c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS c
                  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                  GROUP BY 1, 2),
           tot AS (SELECT n_name, CAST(SUM(c) AS BIGINT) AS t FROM cn GROUP BY 1),
           segs AS (SELECT DISTINCT c_mktsegment FROM cn),
           dense AS (SELECT tot.n_name, segs.c_mktsegment, tot.t,
                            COALESCE(cn.c, 0) AS c
                     FROM tot CROSS JOIN segs
                     LEFT JOIN cn ON cn.n_name = tot.n_name
                                 AND cn.c_mktsegment = segs.c_mktsegment),
           terms AS (SELECT a.n_name AS nation_a, b.n_name AS nation_b,
                            CAST(ROUND(SQRT((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE))
                                            * (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)))
                                       * 1e8) AS BIGINT) AS term_e8
                     FROM dense a JOIN dense b
                       ON a.c_mktsegment = b.c_mktsegment AND a.n_name < b.n_name)
      SELECT nation_a, nation_b, CAST(SUM(term_e8) AS BIGINT) AS bc_e8,
             ROUND(SQRT(GREATEST(0.0,
               1.0 - CAST(SUM(term_e8) AS DOUBLE) / 1e8)), 4) + 0 AS hellinger
      FROM terms GROUP BY 1, 2 ORDER BY nation_a, nation_b""",

    "q_total_variation" -> """
      WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                        o_orderpriority AS prio
                 FROM orders),
           mc AS (SELECT month, prio, CAST(COUNT(*) AS BIGINT) AS c
                  FROM o GROUP BY 1, 2),
           mt AS (SELECT month, CAST(SUM(c) AS BIGINT) AS n FROM mc GROUP BY 1),
           gc AS (SELECT prio, CAST(SUM(c) AS BIGINT) AS g FROM mc GROUP BY 1),
           gt AS (SELECT CAST(SUM(g) AS BIGINT) AS nn FROM gc),
           dense AS (SELECT mt.month, mt.n, gt.nn,
                            ABS(COALESCE(mc.c, 0) * gt.nn - gc.g * mt.n) AS num
                     FROM mt CROSS JOIN gc CROSS JOIN gt
                     LEFT JOIN mc ON mc.month = mt.month AND mc.prio = gc.prio)
      SELECT month, n AS n_orders, CAST(SUM(num) AS BIGINT) AS s_abs,
             ROUND(CAST(SUM(num) AS DOUBLE)
                   / (2.0 * CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)), 4) + 0 AS tv
      FROM dense GROUP BY month, n, nn ORDER BY month""",

    "q_cvm_twosample" -> """
      WITH li AS (SELECT l_returnflag AS rf,
                         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc
                  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
           cell AS (SELECT qc,
                           CAST(SUM(CASE WHEN rf = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                           CAST(SUM(CASE WHEN rf = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr
                    FROM li GROUP BY 1),
           cum AS (SELECT qc, ca, cr,
                          CAST(SUM(ca) OVER (ORDER BY qc) AS BIGINT) AS cuma,
                          CAST(SUM(cr) OVER (ORDER BY qc) AS BIGINT) AS cumr
                   FROM cell),
           s AS (SELECT CAST(SUM(ca * (cumr - cr) * (cumr - cr)) AS BIGINT) AS sa,
                        CAST(SUM(cr * cuma * cuma) AS BIGINT) AS sr,
                        CAST(SUM(ca) AS BIGINT) AS m, CAST(SUM(cr) AS BIGINT) AS n
                 FROM cum)
      SELECT m, n, sa, sr,
             ROUND((CAST(m AS DOUBLE) * CAST(sa AS DOUBLE)
                    + CAST(n AS DOUBLE) * CAST(sr AS DOUBLE))
                   / (CAST(m AS DOUBLE) * CAST(n AS DOUBLE) * CAST(m + n AS DOUBLE))
                   - (4.0 * CAST(m AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)
                     / (6.0 * CAST(m + n AS DOUBLE)), 4) + 0 AS t_stat
      FROM s""",

    "q_bhattacharyya" -> """
      WITH q AS (SELECT CAST(label AS BIGINT) AS label,
                        CAST(list_sum(list_transform(
                          list_transform(embedding,
                            v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)),
                          x -> x * x)) AS BIGINT) AS nrm
                 FROM embeddings),
           h AS (SELECT label,
                        CAST(FLOOR(SQRT(CAST(nrm AS DOUBLE)) / 2500000.0) AS BIGINT) AS bucket,
                        CAST(COUNT(*) AS BIGINT) AS c
                 FROM q GROUP BY 1, 2),
           tot AS (SELECT label, CAST(SUM(c) AS BIGINT) AS t FROM h GROUP BY 1),
           buckets AS (SELECT DISTINCT bucket FROM h),
           dense AS (SELECT tot.label, buckets.bucket, tot.t, COALESCE(h.c, 0) AS c
                     FROM tot CROSS JOIN buckets
                     LEFT JOIN h ON h.label = tot.label AND h.bucket = buckets.bucket),
           terms AS (SELECT a.label AS label_a, b.label AS label_b,
                            CAST(ROUND(SQRT((CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE))
                                            * (CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE)))
                                       * 1e8) AS BIGINT) AS term_e8
                     FROM dense a JOIN dense b
                       ON a.bucket = b.bucket AND a.label < b.label)
      SELECT label_a, label_b, CAST(SUM(term_e8) AS BIGINT) AS bc_e8,
             ROUND(-LN(CAST(SUM(term_e8) AS DOUBLE) / 1e8), 4) + 0 AS bhattacharyya
      FROM terms GROUP BY 1, 2 ORDER BY label_a, label_b""",

    // ---- round 5: hypothesis-test round-out (§2.126) ----

    "q_grubbs_test" -> """
      WITH c AS (SELECT c_mktsegment AS segment, c_custkey,
                        CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bc
                 FROM customer),
           st AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(bc) AS BIGINT) AS s,
                         CAST(SUM(bc * bc) AS BIGINT) AS q
                  FROM c GROUP BY 1),
           dev AS (SELECT c.segment, c.c_custkey,
                          ABS(c.bc * st.n - st.s) AS dev
                   FROM c JOIN st ON c.segment = st.segment),
           mx AS (SELECT segment, CAST(MAX(dev) AS BIGINT) AS maxdev
                  FROM dev GROUP BY 1),
           arg AS (SELECT dev.segment, mx.maxdev,
                          CAST(MIN(dev.c_custkey) AS BIGINT) AS outlier_custkey
                   FROM dev JOIN mx ON dev.segment = mx.segment
                                   AND dev.dev = mx.maxdev
                   GROUP BY 1, 2)
      SELECT st.segment, st.n, arg.outlier_custkey,
             ROUND((CAST(arg.maxdev AS DOUBLE) / CAST(st.n AS DOUBLE))
                   / SQRT((CAST(st.n AS DOUBLE) * CAST(st.q AS DOUBLE)
                           - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
                          / (CAST(st.n AS DOUBLE) * (CAST(st.n AS DOUBLE) - 1.0))), 4)
               + 0 AS g_stat
      FROM arg JOIN st ON arg.segment = st.segment
      ORDER BY st.segment""",

    "q_brown_forsythe" -> """
      WITH cell AS (SELECT l_returnflag AS rf,
                           CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc,
                           CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM lineitem GROUP BY 1, 2),
           cum AS (SELECT rf, qc, cnt,
                          CAST(SUM(cnt) OVER (PARTITION BY rf ORDER BY qc)
                            AS BIGINT) AS cum
                   FROM cell),
           gn AS (SELECT rf, CAST(SUM(cnt) AS BIGINT) AS ng FROM cell GROUP BY 1),
           med AS (SELECT cum.rf, CAST(MIN(cum.qc) AS BIGINT) AS med
                   FROM cum JOIN gn ON cum.rf = gn.rf
                   WHERE cum.cum * 2 >= gn.ng + 1
                   GROUP BY 1),
           z AS (SELECT cell.rf, cell.cnt, ABS(cell.qc - med.med) AS z
                 FROM cell JOIN med ON cell.rf = med.rf),
           g AS (SELECT rf, CAST(SUM(cnt) AS BIGINT) AS ng,
                        CAST(SUM(cnt * z) AS BIGINT) AS sz,
                        CAST(SUM(cnt * z * z) AS BIGINT) AS qz
                 FROM z GROUP BY 1),
           lat AS (SELECT ng, sz, qz,
                          CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                                     / CAST(ng AS DOUBLE) * 1e4) AS BIGINT) AS t1_e4
                   FROM g),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS nn,
                        CAST(SUM(sz) AS BIGINT) AS szt, CAST(SUM(qz) AS BIGINT) AS qzt,
                        CAST(SUM(t1_e4) AS BIGINT) AS st1_e4
                 FROM lat)
      SELECT k AS k_groups, nn AS n_total,
             ROUND(((CAST(st1_e4 AS DOUBLE) / 1e4
                     - CAST(szt AS DOUBLE) * CAST(szt AS DOUBLE) / CAST(nn AS DOUBLE))
                    / (CAST(k AS DOUBLE) - 1.0))
                   / ((CAST(qzt AS DOUBLE) - CAST(st1_e4 AS DOUBLE) / 1e4)
                      / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 4) + 0 AS f_stat
      FROM t""",

    "q_cochran_c" -> """
      WITH g AS (SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
                        CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
                        CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                                 * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS q
                 FROM events GROUP BY 1),
           lat AS (SELECT dow,
                          CAST(ROUND((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                                     * 1e4) AS BIGINT) AS s2_e4
                   FROM g),
           top AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                          CAST(SUM(s2_e4) AS BIGINT) AS tot,
                          CAST(MAX(s2_e4) AS BIGINT) AS mx
                   FROM lat),
           arg AS (SELECT CAST(MIN(lat.dow) AS BIGINT) AS argmax_dow, top.k,
                          top.mx, top.tot
                   FROM lat CROSS JOIN top WHERE lat.s2_e4 = top.mx
                   GROUP BY 2, 3, 4)
      SELECT k AS k_groups, mx AS max_s2_e4, tot AS sum_s2_e4, argmax_dow,
             ROUND(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 4) + 0 AS c_stat
      FROM arg""",

    "q_ansari_bradley" -> """
      WITH cell AS (SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS dp,
                           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                             AS BIGINT) AS co,
                           CAST(COUNT(*) AS BIGINT) AS ct
                    FROM lineitem GROUP BY 1),
           cum AS (SELECT dp, co, ct,
                          CAST(SUM(ct) OVER (ORDER BY dp) AS BIGINT) AS cumt
                   FROM cell),
           tot AS (SELECT CAST(SUM(co) AS BIGINT) AS m, CAST(SUM(ct) AS BIGINT) AS nt
                   FROM cell),
           wt AS (SELECT co, ct, cumt, m, nt, nt + 1 AS t, (nt + 1) // 2 AS kk,
                         cumt - ct + co AS x1, cumt - ct AS x0
                  FROM cum CROSS JOIN tot),
           runs AS (SELECT m, nt, t, kk,
                           ((LEAST(x1, kk) * (LEAST(x1, kk) + 1)) // 2
                            + (CASE WHEN x1 > kk THEN (x1 - kk) * t
                                 - ((x1 * (x1 + 1)) // 2 - (kk * (kk + 1)) // 2)
                               ELSE 0 END))
                           - ((LEAST(x0, kk) * (LEAST(x0, kk) + 1)) // 2
                              + (CASE WHEN x0 > kk THEN (x0 - kk) * t
                                   - ((x0 * (x0 + 1)) // 2 - (kk * (kk + 1)) // 2)
                                 ELSE 0 END)) AS wrun
                    FROM wt),
           w AS (SELECT m, nt, t, kk, CAST(SUM(wrun) AS BIGINT) AS w
                 FROM runs GROUP BY 1, 2, 3, 4),
           fin AS (SELECT m, nt - m AS n, w AS w_stat,
                          ((LEAST(nt, kk) * (LEAST(nt, kk) + 1)) // 2
                           + (CASE WHEN nt > kk THEN (nt - kk) * t
                                - ((nt * (nt + 1)) // 2 - (kk * (kk + 1)) // 2)
                              ELSE 0 END)) AS ssum,
                          ((kk * (kk + 1) * (2 * kk + 1)) // 6
                           + ((nt - kk) * (nt - kk + 1) * (2 * (nt - kk) + 1)) // 6)
                            AS ssq,
                          nt
                   FROM w)
      SELECT m, n, w_stat,
             ROUND((CAST(w_stat AS DOUBLE)
                    - CAST(m AS DOUBLE) * CAST(ssum AS DOUBLE) / CAST(nt AS DOUBLE))
                   / SQRT(CAST(m AS DOUBLE) * CAST(n AS DOUBLE)
                          * (CAST(nt AS DOUBLE) * CAST(ssq AS DOUBLE)
                             - CAST(ssum AS DOUBLE) * CAST(ssum AS DOUBLE))
                          / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                             * (CAST(nt AS DOUBLE) - 1.0))), 4) + 0 AS z
      FROM fin""",

    "q_bartels_rank" -> """
      WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                            CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                              AS rev
                     FROM events GROUP BY 1, 2),
           r AS (SELECT event_type, day, rev,
                        CAST(ROW_NUMBER() OVER
                          (PARTITION BY event_type ORDER BY rev, day) AS BIGINT) AS r
                 FROM daily),
           d AS (SELECT event_type, r,
                        LEAD(r) OVER (PARTITION BY event_type ORDER BY day) AS rn
                 FROM r),
           s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN rn IS NOT NULL
                                      THEN (r - rn) * (r - rn) ELSE 0 END)
                          AS BIGINT) AS num
                 FROM d GROUP BY 1)
      SELECT event_type, n AS n_days, num,
             ROUND(CAST(num AS DOUBLE) * 12.0
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)),
                   4) + 0 AS rvn,
             ROUND((CAST(num AS DOUBLE) * 12.0
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))
                    - 2.0)
                   / SQRT(4.0 * (CAST(n AS DOUBLE) - 2.0)
                          * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             - 2.0 * CAST(n AS DOUBLE) - 9.0)
                          / (5.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                             * (CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 1.0))),
                   4) + 0 AS z
      FROM s ORDER BY event_type""",

    "q_cuzick_trend" -> """
      WITH o AS (SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
                 FROM orders),
           cell AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ct,
                           CAST(SUM(j) AS BIGINT) AS sjc
                    FROM o GROUP BY 1),
           cum AS (SELECT v, ct, sjc,
                          CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) AS cumt
                   FROM cell),
           t2 AS (SELECT CAST(SUM(sjc * ((cumt - ct) * 2 + ct + 1)) AS BIGINT) AS t2
                  FROM cum),
           sizes AS (SELECT CAST(SUM(nj) AS BIGINT) AS nn,
                            CAST(SUM(j * nj) AS BIGINT) AS l1,
                            CAST(SUM(j * j * nj) AS BIGINT) AS l2
                     FROM (SELECT j, CAST(COUNT(*) AS BIGINT) AS nj
                           FROM o GROUP BY 1))
      SELECT nn AS n, l1, t2,
             ROUND((CAST(t2 AS DOUBLE) - (CAST(nn AS DOUBLE) + 1.0) * CAST(l1 AS DOUBLE))
                   / SQRT((CAST(nn AS DOUBLE) + 1.0)
                          * (CAST(nn AS DOUBLE) * CAST(l2 AS DOUBLE)
                             - CAST(l1 AS DOUBLE) * CAST(l1 AS DOUBLE)) / 3.0), 4)
               + 0 AS z
      FROM sizes CROSS JOIN t2""",

    // ---- round 5: forecast metrics / ops analytics (§2.127) ----

    "q_mase_smape" -> """
      WITH daily AS (SELECT event_type,
                            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                              AS dayn,
                            CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                              AS rev
                     FROM events GROUP BY 1, 2),
           s7 AS (SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n7,
                         CAST(SUM(ABS(a.rev - b.rev)) AS BIGINT) AS sae7,
                         CAST(SUM(CAST(ROUND(2.0 * CAST(ABS(a.rev - b.rev) AS DOUBLE)
                                             / CAST(a.rev + b.rev AS DOUBLE) * 1e8)
                                       AS BIGINT)) AS BIGINT) AS ssm_e8
                  FROM daily a JOIN daily b
                    ON a.event_type = b.event_type AND a.dayn = b.dayn + 7
                  GROUP BY 1),
           s1 AS (SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n1,
                         CAST(SUM(ABS(a.rev - b.rev)) AS BIGINT) AS sae1
                  FROM daily a JOIN daily b
                    ON a.event_type = b.event_type AND a.dayn = b.dayn + 1
                  GROUP BY 1)
      SELECT s7.event_type, s7.n7 AS n_scored,
             ROUND((CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE))
                   / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 4) + 0 AS mase,
             ROUND(CAST(ssm_e8 AS DOUBLE) / 1e8 / CAST(n7 AS DOUBLE), 4) + 0 AS smape
      FROM s7 JOIN s1 ON s7.event_type = s1.event_type
      ORDER BY s7.event_type""",

    "q_croston_forecast" -> """
      WITH wk AS (SELECT p.p_brand AS brand,
                         date_diff('day', DATE '1970-01-01',
                           CAST(date_trunc('week', l.l_shipdate) AS DATE)) // 7 AS wkn,
                         CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
                           AS z
                  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                  GROUP BY 1, 2),
           r AS (SELECT brand, wkn, z,
                        CAST(ROW_NUMBER() OVER
                          (PARTITION BY brand ORDER BY wkn DESC) AS BIGINT) AS idx,
                        wkn - LAG(wkn) OVER (PARTITION BY brand ORDER BY wkn) AS gap
                 FROM wk),
           sz AS (SELECT brand,
                         SUM(POWER(0.5, CAST(idx AS DOUBLE)) * CAST(z AS DOUBLE)) AS wz,
                         SUM(POWER(0.5, CAST(idx AS DOUBLE))) AS ww
                  FROM r WHERE idx <= 8 GROUP BY 1),
           gp AS (SELECT brand,
                         SUM(POWER(0.5, CAST(idx AS DOUBLE)) * CAST(gap AS DOUBLE)) AS wg,
                         SUM(POWER(0.5, CAST(idx AS DOUBLE))) AS wwg
                  FROM r WHERE idx <= 8 AND gap IS NOT NULL GROUP BY 1),
           nw AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_demand_weeks
                  FROM wk GROUP BY 1)
      SELECT nw.brand, nw.n_demand_weeks,
             ROUND(wz / ww, 4) + 0 AS zhat_cents,
             ROUND(wg / wwg, 4) + 0 AS phat_weeks,
             ROUND((wz / ww) / (wg / wwg), 4) + 0 AS croston_cents_per_week
      FROM nw JOIN sz ON nw.brand = sz.brand JOIN gp ON nw.brand = gp.brand
      ORDER BY nw.brand""",

    "q_brown_double_smoothing" -> """
      WITH rev AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                            AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                            AS rev
                   FROM orders GROUP BY 1),
           s1 AS (SELECT a.m, CAST(COUNT(*) AS BIGINT) AS k1,
                         SUM(CAST(b.rev AS DOUBLE)
                             * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS s1
                  FROM rev a JOIN rev b ON b.m BETWEEN a.m - 12 AND a.m - 1
                  GROUP BY 1 HAVING COUNT(*) = 12),
           s2 AS (SELECT a.m, a.s1, CAST(COUNT(*) AS BIGINT) AS k2,
                         SUM(b.s1 * POWER(0.5, CAST(a.m - b.m AS DOUBLE))) AS s2
                  FROM s1 a JOIN s1 b ON b.m BETWEEN a.m - 12 AND a.m - 1
                  GROUP BY 1, 2 HAVING COUNT(*) = 12),
           pred AS (SELECT s2.m + 1 AS m, 3.0 * s2.s1 - 2.0 * s2.s2 AS f
                    FROM s2),
           sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_forecasts,
                         CAST(SUM(rev.rev) AS BIGINT) AS sa,
                         SUM(ABS(CAST(rev.rev AS DOUBLE) - pred.f)) AS sae,
                         SUM((CAST(rev.rev AS DOUBLE) - pred.f)
                             * (CAST(rev.rev AS DOUBLE) - pred.f)) AS sse
                  FROM pred JOIN rev ON pred.m = rev.m)
      SELECT n_forecasts,
             ROUND((sae / CAST(n_forecasts AS DOUBLE))
                   / (CAST(sa AS DOUBLE) / CAST(n_forecasts AS DOUBLE)), 4) + 0
               AS mae_over_mean,
             ROUND(SQRT(sse / CAST(n_forecasts AS DOUBLE))
                   / (CAST(sa AS DOUBLE) / CAST(n_forecasts AS DOUBLE)), 4) + 0
               AS rmse_over_mean
      FROM sc""",

    "q_spectral_entropy" -> """
      WITH raw AS (SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                            AS dayn,
                          CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
                   FROM events GROUP BY 1),
           d0 AS (SELECT CAST(MIN(dayn) AS BIGINT) AS d0 FROM raw),
           daily AS (SELECT raw.dayn - d0.d0 AS t, raw.x FROM raw CROSS JOIN d0),
           periods AS (SELECT unnest(range(2, 8)) AS p),
           pw AS (SELECT p,
                         SUM(CAST(x AS DOUBLE)
                             * cos(2.0 * 3.141592653589793 * CAST(t AS DOUBLE)
                                   / CAST(p AS DOUBLE))) AS sc,
                         SUM(CAST(x AS DOUBLE)
                             * sin(2.0 * 3.141592653589793 * CAST(t AS DOUBLE)
                                   / CAST(p AS DOUBLE))) AS ss
                  FROM daily CROSS JOIN periods GROUP BY 1),
           pow2 AS (SELECT p, sc * sc + ss * ss AS power FROM pw),
           tot AS (SELECT SUM(power) AS tp FROM pow2),
           terms AS (SELECT CAST(ROUND((CAST(p_e6 AS DOUBLE) / 1e6)
                                       * LN(CAST(p_e6 AS DOUBLE) / 1e6) * 1e8)
                            AS BIGINT) AS term_e8
                     FROM (SELECT CAST(ROUND(power / tp * 1e6) AS BIGINT) AS p_e6
                           FROM pow2 CROSS JOIN tot)
                     WHERE p_e6 > 0)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_periods,
             ROUND(-CAST(SUM(term_e8) AS DOUBLE) / 1e8, 4) + 0 AS h,
             ROUND(-CAST(SUM(term_e8) AS DOUBLE) / 1e8 / LN(6.0), 4) + 0 AS h_norm
      FROM terms""",

    "q_kpss_stat" -> """
      WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                            CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                              AS y
                     FROM events GROUP BY 1, 2),
           st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(y) AS BIGINT) AS sy
                  FROM daily GROUP BY 1),
           d AS (SELECT daily.event_type, daily.day, st.n,
                        daily.y * st.n - st.sy AS d
                 FROM daily JOIN st ON daily.event_type = st.event_type),
           c AS (SELECT event_type, n, d,
                        CAST(SUM(d) OVER (PARTITION BY event_type ORDER BY day)
                          AS BIGINT) AS dd
                 FROM d)
      SELECT event_type, n AS n_days,
             ROUND(CAST(SUM(CAST(dd AS HUGEINT) * dd) AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE)),
                   6) + 0 AS kpss
      FROM c GROUP BY 1, 2 ORDER BY event_type""",

    "q_bullwhip_effect" -> """
      WITH om AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                           AS m,
                         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                           AS rev
                  FROM orders GROUP BY 1),
           sm AS (SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
                           AS m,
                         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                           AS BIGINT) AS rev
                  FROM lineitem GROUP BY 1),
           o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_o, CAST(SUM(rev) AS BIGINT) AS s_o,
                        SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS q_o
                 FROM om),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_s, CAST(SUM(rev) AS BIGINT) AS s_s,
                        SUM(CAST(rev AS DOUBLE) * CAST(rev AS DOUBLE)) AS q_s
                 FROM sm)
      SELECT n_o AS n_months_orders, n_s AS n_months_ship,
             ROUND(((q_o - CAST(s_o AS DOUBLE) * CAST(s_o AS DOUBLE)
                           / CAST(n_o AS DOUBLE)) / CAST(n_o AS DOUBLE))
                   / ((q_s - CAST(s_s AS DOUBLE) * CAST(s_s AS DOUBLE)
                             / CAST(n_s AS DOUBLE)) / CAST(n_s AS DOUBLE)), 4) + 0
               AS bullwhip_ratio
      FROM o CROSS JOIN s""",

    "q_gini_mean_difference" -> """
      WITH cell AS (SELECT l_returnflag AS rf,
                           CAST(ROUND(l_quantity * 100) AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           cum AS (SELECT rf, v, c, c * v AS sv,
                          CAST(SUM(c) OVER (PARTITION BY rf ORDER BY v) AS BIGINT)
                            AS cumc,
                          CAST(SUM(c * v) OVER (PARTITION BY rf ORDER BY v) AS BIGINT)
                            AS cumsv
                   FROM cell),
           t AS (SELECT rf, CAST(SUM(c) AS BIGINT) AS n,
                        CAST(SUM(c * (v * (cumc - c) - (cumsv - sv))) AS BIGINT) AS s
                 FROM cum GROUP BY 1)
      SELECT rf, n,
             ROUND(2.0 * CAST(s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 4) + 0
               AS gmd_cents
      FROM t ORDER BY rf""",

    "q_c_chart" -> """
      WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                            CAST(COUNT(*) AS BIGINT) AS c
                     FROM events WHERE event_type = 'error' GROUP BY 1),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                         CAST(SUM(c) AS BIGINT) AS sc
                  FROM daily),
           lim AS (SELECT n_days, sc,
                          CAST(ROUND((CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)
                                      + 3.0 * SQRT(CAST(sc AS DOUBLE)
                                                   / CAST(n_days AS DOUBLE))) * 1e4)
                            AS BIGINT) AS ucl_e4,
                          CAST(ROUND(GREATEST(0.0,
                            CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)
                            - 3.0 * SQRT(CAST(sc AS DOUBLE)
                                         / CAST(n_days AS DOUBLE))) * 1e4)
                            AS BIGINT) AS lcl_e4
                   FROM st)
      SELECT MAX(lim.n_days) AS n_days,
             ROUND(CAST(MAX(lim.sc) AS DOUBLE) / CAST(MAX(lim.n_days) AS DOUBLE), 4)
               + 0 AS cbar,
             ROUND(CAST(MAX(lim.ucl_e4) AS DOUBLE) / 1e4, 4) + 0 AS ucl,
             ROUND(CAST(MAX(lim.lcl_e4) AS DOUBLE) / 1e4, 4) + 0 AS lcl,
             CAST(SUM(CASE WHEN daily.c * 10000 > lim.ucl_e4 THEN 1
                           WHEN daily.c * 10000 < lim.lcl_e4 THEN 1
                           ELSE 0 END) AS BIGINT) AS n_out_of_control
      FROM daily CROSS JOIN lim""",

    // ---- round 5: text-metric / ML round-out (§2.128) ----

    "q_rouge_recall" -> """
      WITH docs AS (SELECT doc_id, lang, source,
                           CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT)
                             AS len
                    FROM documents),
           pairs AS (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2, a.len
                     FROM docs a JOIN docs b
                       ON a.lang = b.lang AND a.source = b.source
                      AND a.doc_id < b.doc_id),
           g1 AS (SELECT doc_id, lang, source, g, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT doc_id, lang, source,
                               unnest(string_split(lower(text), ' ')) AS g
                        FROM documents)
                  GROUP BY 1, 2, 3, 4),
           g2 AS (SELECT doc_id, lang, source, g, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT doc_id, lang, source,
                               unnest(list_transform(
                                 range(1, LENGTH(string_split(lower(text), ' '))),
                                 i -> string_split(lower(text), ' ')[i] || ' '
                                      || string_split(lower(text), ' ')[i + 1])) AS g
                        FROM documents)
                  GROUP BY 1, 2, 3, 4),
           ov1 AS (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2,
                          CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov1
                   FROM g1 a JOIN g1 b
                     ON a.lang = b.lang AND a.source = b.source AND a.g = b.g
                    AND a.doc_id < b.doc_id
                   GROUP BY 1, 2, 3, 4),
           ov2 AS (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2,
                          CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov2
                   FROM g2 a JOIN g2 b
                     ON a.lang = b.lang AND a.source = b.source AND a.g = b.g
                    AND a.doc_id < b.doc_id
                   GROUP BY 1, 2, 3, 4),
           lat AS (SELECT p.lang, p.source,
                          CAST(ROUND(CAST(COALESCE(ov1.ov1, 0) AS DOUBLE)
                                     / CAST(p.len AS DOUBLE) * 1e6) AS BIGINT)
                            AS r1_e6,
                          CAST(ROUND(CAST(COALESCE(ov2.ov2, 0) AS DOUBLE)
                                     / CAST(p.len - 1 AS DOUBLE) * 1e6) AS BIGINT)
                            AS r2_e6
                   FROM pairs p
                   LEFT JOIN ov1 ON ov1.lang = p.lang AND ov1.source = p.source
                                AND ov1.doc_id = p.doc_id AND ov1.d2 = p.d2
                   LEFT JOIN ov2 ON ov2.lang = p.lang AND ov2.source = p.source
                                AND ov2.doc_id = p.doc_id AND ov2.d2 = p.d2)
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             ROUND(CAST(SUM(r1_e6) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) + 0 AS mean_rouge1,
             ROUND(CAST(SUM(r2_e6) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) + 0 AS mean_rouge2
      FROM lat GROUP BY 1, 2 ORDER BY lang, source""",

    "q_bleu_pairs" -> """
      WITH docs AS (SELECT doc_id, lang, source,
                           CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT)
                             AS len
                    FROM documents),
           pairs AS (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2,
                            a.len, b.len AS len2
                     FROM docs a JOIN docs b
                       ON a.lang = b.lang AND a.source = b.source
                      AND a.doc_id < b.doc_id),
           g1 AS (SELECT doc_id, lang, source, g, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT doc_id, lang, source,
                               unnest(string_split(lower(text), ' ')) AS g
                        FROM documents)
                  GROUP BY 1, 2, 3, 4),
           g2 AS (SELECT doc_id, lang, source, g, CAST(COUNT(*) AS BIGINT) AS c
                  FROM (SELECT doc_id, lang, source,
                               unnest(list_transform(
                                 range(1, LENGTH(string_split(lower(text), ' '))),
                                 i -> string_split(lower(text), ' ')[i] || ' '
                                      || string_split(lower(text), ' ')[i + 1])) AS g
                        FROM documents)
                  GROUP BY 1, 2, 3, 4),
           ov1 AS (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2,
                          CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov1
                   FROM g1 a JOIN g1 b
                     ON a.lang = b.lang AND a.source = b.source AND a.g = b.g
                    AND a.doc_id < b.doc_id
                   GROUP BY 1, 2, 3, 4),
           ov2 AS (SELECT a.lang, a.source, a.doc_id, b.doc_id AS d2,
                          CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov2
                   FROM g2 a JOIN g2 b
                     ON a.lang = b.lang AND a.source = b.source AND a.g = b.g
                    AND a.doc_id < b.doc_id
                   GROUP BY 1, 2, 3, 4),
           lat AS (SELECT p.lang, p.source,
                          CASE WHEN COALESCE(ov1.ov1, 0) = 0
                                 OR COALESCE(ov2.ov2, 0) = 0 THEN 0
                               ELSE CAST(ROUND(
                                 (CASE WHEN p.len2 >= p.len THEN 1.0
                                       ELSE EXP(1.0 - CAST(p.len AS DOUBLE)
                                                / CAST(p.len2 AS DOUBLE)) END)
                                 * SQRT((CAST(ov1.ov1 AS DOUBLE)
                                         / CAST(p.len2 AS DOUBLE))
                                        * (CAST(ov2.ov2 AS DOUBLE)
                                           / CAST(p.len2 - 1 AS DOUBLE)))
                                 * 1e6) AS BIGINT) END AS bleu_e6
                   FROM pairs p
                   LEFT JOIN ov1 ON ov1.lang = p.lang AND ov1.source = p.source
                                AND ov1.doc_id = p.doc_id AND ov1.d2 = p.d2
                   LEFT JOIN ov2 ON ov2.lang = p.lang AND ov2.source = p.source
                                AND ov2.doc_id = p.doc_id AND ov2.d2 = p.d2)
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             ROUND(CAST(SUM(bleu_e6) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) + 0 AS mean_bleu2
      FROM lat GROUP BY 1, 2 ORDER BY lang, source""",

    "q_heaps_law_fit" -> """
      WITH mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS maxid FROM documents),
           tok AS (SELECT (doc_id * 10) // (maxid + 1) AS bucket,
                          unnest(string_split(lower(text), ' ')) AS word
                   FROM documents CROSS JOIN mx),
           pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
                  FROM tok GROUP BY 1),
           nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
                  FROM (SELECT word, CAST(MIN(bucket) AS BIGINT) AS bucket
                        FROM tok GROUP BY 1)
                  GROUP BY 1),
           growth AS (SELECT pb.bucket, pb.n_tokens,
                             COALESCE(nt.new_types, 0) AS new_types
                      FROM pb LEFT JOIN nt ON pb.bucket = nt.bucket),
           cum AS (SELECT a.bucket, CAST(SUM(b.n_tokens) AS BIGINT) AS cum_n,
                          CAST(SUM(b.new_types) AS BIGINT) AS cum_v
                   FROM growth a JOIN growth b ON b.bucket <= a.bucket
                   GROUP BY 1),
           pts AS (SELECT CAST(ROUND(LN(CAST(cum_n AS DOUBLE)) * 1e6) AS BIGINT)
                            AS x,
                          CAST(ROUND(LN(CAST(cum_v AS DOUBLE)) * 1e6) AS BIGINT)
                            AS y
                   FROM cum),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x * y) AS BIGINT) AS sxy,
                        CAST(SUM(x * x) AS BIGINT) AS sxx
                 FROM pts)
      SELECT n AS n_points,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) + 0 AS beta,
             ROUND(EXP((CAST(sy AS DOUBLE)
                        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                          * CAST(sx AS DOUBLE))
                       / (CAST(n AS DOUBLE) * 1e6)), 4) + 0 AS k
      FROM s""",

    "q_structure_dedup" -> """
      WITH fp AS (SELECT doc_id, lang,
                         md5(array_to_string(list_transform(
                           string_split(lower(text), ' '),
                           t -> CAST(LENGTH(t) AS VARCHAR)), ',')) AS fp
                  FROM documents),
           groups AS (SELECT lang, fp, CAST(COUNT(*) AS BIGINT) AS gsz
                      FROM fp GROUP BY 1, 2)
      SELECT lang, CAST(SUM(gsz) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_templates,
             CAST(SUM(CASE WHEN gsz > 1 THEN gsz ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
             CAST(MAX(gsz) AS BIGINT) AS max_group
      FROM groups GROUP BY 1 ORDER BY lang""",

    "q_chunk_dedup" -> """
      WITH chunks AS (SELECT doc_id, lang,
                             unnest(list_transform(
                               range(0, LENGTH(string_split(lower(text), ' ')) // 8),
                               i -> array_to_string(list_slice(
                                 string_split(lower(text), ' '),
                                 i * 8 + 1, i * 8 + 8), ' '))) AS chunk
                      FROM documents),
           dup AS (SELECT chunk, COUNT(DISTINCT doc_id) > 1 AS is_dup
                   FROM chunks GROUP BY 1)
      SELECT lang, CAST(COUNT(DISTINCT chunks.doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
             ROUND(CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 4) + 0 AS dup_frac
      FROM chunks JOIN dup ON chunks.chunk = dup.chunk
      GROUP BY 1 ORDER BY lang""",

    "q_hmm_forward" -> """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
                 FROM events),
           st AS (SELECT event_type AS s0, CAST(COUNT(*) AS BIGINT) AS c FROM
                    (SELECT user_id, event_type,
                            ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS rn
                     FROM e)
                  WHERE rn = 1 GROUP BY 1),
           tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM st),
           ed AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM
                    (SELECT user_id, event_type AS dst,
                            LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS src
                     FROM e)
                  WHERE src IS NOT NULL GROUP BY 1, 2),
           tr AS (SELECT ed.src, ed.dst, ed.w, ow.out_w
                  FROM ed JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w
                                FROM ed GROUP BY 1) ow ON ed.src = ow.src),
           a2 AS (SELECT dst AS state, CAST(SUM(t_e12) AS BIGINT) AS a2_e12 FROM
                    (SELECT tr.dst,
                            CAST(ROUND((CAST(st.c AS DOUBLE) / CAST(tot.tot AS DOUBLE))
                                       * (CAST(tr.w AS DOUBLE)
                                          / CAST(tr.out_w AS DOUBLE)) * 1e12)
                              AS BIGINT) AS t_e12
                     FROM st CROSS JOIN tot JOIN tr ON st.s0 = tr.src)
                  GROUP BY 1),
           a3 AS (SELECT dst AS state, CAST(SUM(t_e12) AS BIGINT) AS a3_e12 FROM
                    (SELECT tr.dst,
                            CAST(ROUND((CAST(a2.a2_e12 AS DOUBLE) / 1e12)
                                       * (CAST(tr.w AS DOUBLE)
                                          / CAST(tr.out_w AS DOUBLE)) * 1e12)
                              AS BIGINT) AS t_e12
                     FROM a2 JOIN tr ON a2.state = tr.src)
                  GROUP BY 1)
      SELECT COALESCE(a2.state, a3.state) AS state,
             ROUND(CAST(COALESCE(a2.a2_e12, 0) AS DOUBLE) / 1e12, 6) + 0 AS alpha2,
             ROUND(CAST(COALESCE(a3.a3_e12, 0) AS DOUBLE) / 1e12, 6) + 0 AS alpha3
      FROM a2 FULL OUTER JOIN a3 ON a2.state = a3.state
      ORDER BY state""",

    "q_perceptron_step" -> """
      WITH q AS (SELECT vec_id,
                        CASE WHEN label <= 4 THEN 1 ELSE -1 END AS y,
                        list_transform(embedding,
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           e AS (SELECT vec_id, CAST(y AS BIGINT) AS y,
                        CAST(generate_subscripts(qe, 1) - 1 AS BIGINT) AS dim,
                        unnest(qe) AS x
                 FROM q),
           w0 AS (SELECT dim,
                         (CASE WHEN sp >= 0 THEN sp // np ELSE -((-sp) // np) END)
                         - (CASE WHEN sn >= 0 THEN sn // nn ELSE -((-sn) // nn) END)
                           AS w0
                  FROM (SELECT dim,
                               CAST(SUM(CASE WHEN y = 1 THEN x ELSE 0 END) AS BIGINT)
                                 AS sp,
                               CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                 AS np,
                               CAST(SUM(CASE WHEN y = -1 THEN x ELSE 0 END) AS BIGINT)
                                 AS sn,
                               CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT)
                                 AS nn
                        FROM e GROUP BY 1)),
           m1 AS (SELECT e.vec_id, e.y,
                         CAST(SUM(e.x * w0.w0) AS BIGINT) AS dot
                  FROM e JOIN w0 ON e.dim = w0.dim GROUP BY 1, 2),
           mis1 AS (SELECT vec_id, y, (y * dot <= 0) AS mis FROM m1),
           upd AS (SELECT e.dim, CAST(SUM(e.y * e.x) AS BIGINT) AS su,
                          CAST(COUNT(DISTINCT e.vec_id) AS BIGINT) AS nmis
                   FROM e JOIN mis1 ON e.vec_id = mis1.vec_id AND mis1.mis
                   GROUP BY 1),
           w1 AS (SELECT w0.dim,
                         w0.w0 + COALESCE(
                           CASE WHEN upd.su >= 0 THEN upd.su // upd.nmis
                                ELSE -((-upd.su) // upd.nmis) END, 0) AS w1
                  FROM w0 LEFT JOIN upd ON w0.dim = upd.dim),
           m2 AS (SELECT e.vec_id, e.y, CAST(SUM(e.x * w1.w1) AS BIGINT) AS dot
                  FROM e JOIN w1 ON e.dim = w1.dim GROUP BY 1, 2),
           bf AS (SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_pos,
                         CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_neg,
                         CAST(SUM(CASE WHEN mis THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_mis_before
                  FROM mis1),
           af AS (SELECT CAST(SUM(CASE WHEN y * dot <= 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_mis_after
                  FROM m2)
      SELECT n_pos, n_neg, n_mis_before, n_mis_after FROM bf CROSS JOIN af""",

    "q_kernel_regression" -> """
      WITH hs AS (SELECT CAST(hour(ts) AS BIGINT) AS hi,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                           AS sy
                  FROM events GROUP BY 1),
           grid AS (SELECT CAST(unnest(range(0, 24)) AS BIGINT) AS h),
           k AS (SELECT grid.h, hs.n, hs.sy,
                        CAST(ROUND(EXP(-CAST((grid.h - hs.hi) * (grid.h - hs.hi)
                                             AS DOUBLE) / 18.0) * 1e12) AS BIGINT)
                          AS k_e12
                 FROM grid CROSS JOIN hs)
      SELECT h AS hour,
             ROUND(CAST(SUM(CAST(k_e12 AS HUGEINT) * sy) AS DOUBLE)
                   / CAST(SUM(CAST(k_e12 AS HUGEINT) * n) AS DOUBLE), 4) + 0
               AS yhat_cents
      FROM k GROUP BY 1 ORDER BY hour""",

    "q_huber_irls_step" -> """
      WITH xy AS (SELECT li.x, o.y FROM
                    (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
                     FROM lineitem GROUP BY 1) li
                  JOIN (SELECT o_orderkey,
                               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
                        FROM orders) o ON li.l_orderkey = o.o_orderkey),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                        CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x * y) AS BIGINT) AS sxy,
                        CAST(SUM(x * x) AS BIGINT) AS sxx
                 FROM xy),
           ab AS (SELECT n,
                         CAST(ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                                    * 1e8) AS BIGINT) AS b_e8,
                         CAST(ROUND(((CAST(sy AS DOUBLE)
                                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                                        * CAST(sx AS DOUBLE))
                                     / CAST(n AS DOUBLE)) * 1e4) AS BIGINT) AS a_e4
                  FROM s),
           r AS (SELECT xy.x, xy.y, ab.n, ab.b_e8, ab.a_e4,
                        CAST(ABS(ROUND(CAST(xy.y AS DOUBLE)
                          - (CAST(ab.a_e4 AS DOUBLE) / 1e4
                             + CAST(ab.b_e8 AS DOUBLE) / 1e8
                               * CAST(xy.x AS DOUBLE)))) AS BIGINT) AS ar
                 FROM xy CROSS JOIN ab),
           lat AS (SELECT ar, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY 1),
           med AS (SELECT CAST(MIN(ar) AS BIGINT) AS med FROM
                     (SELECT ar, SUM(cnt) OVER (ORDER BY ar) AS cum FROM lat)
                   CROSS JOIN (SELECT CAST(SUM(cnt) AS BIGINT) AS nn FROM lat)
                   WHERE cum * 2 >= nn + 1),
           wr AS (SELECT r.x, r.y,
                         CASE WHEN r.ar = 0 THEN 1000000
                              ELSE LEAST(1000000,
                                CAST(ROUND(1.345 * 1.4826 * CAST(med.med AS DOUBLE)
                                           / CAST(r.ar AS DOUBLE) * 1e6) AS BIGINT))
                         END AS w
                  FROM r CROSS JOIN med),
           ws AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS sw,
                         CAST(SUM(w * x) AS BIGINT) AS swx,
                         SUM(CAST(w AS HUGEINT) * y) AS swy,
                         SUM(CAST(w * x AS HUGEINT) * y) AS swxy,
                         CAST(SUM(w * x * x) AS BIGINT) AS swx2,
                         CAST(SUM(CASE WHEN w < 1000000 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_down
                  FROM wr)
      SELECT ws.n, ws.n_down AS n_downweighted,
             ROUND(CAST(ab.b_e8 AS DOUBLE) / 1e8, 4) + 0 AS b_ols_cents,
             ROUND(CAST(ab.a_e4 AS DOUBLE) / 1e4, 4) + 0 AS a_ols_cents,
             ROUND((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
                    - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
                   / (CAST(sw AS DOUBLE) * CAST(swx2 AS DOUBLE)
                      - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 4) + 0
               AS b_huber_cents,
             ROUND((CAST(swy AS DOUBLE)
                    - ((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
                        - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
                       / (CAST(sw AS DOUBLE) * CAST(swx2 AS DOUBLE)
                          - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)))
                      * CAST(swx AS DOUBLE))
                   / CAST(sw AS DOUBLE), 4) + 0 AS a_huber_cents
      FROM ws CROSS JOIN ab""",

    "q_reciprocity" -> """
      WITH e0 AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
                  FROM events),
           ed AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM
                    (SELECT user_id, event_type AS dst,
                            LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS src
                     FROM e0)
                  WHERE src IS NOT NULL GROUP BY 1, 2),
           e AS (SELECT src, dst, w FROM ed WHERE src <> dst),
           j AS (SELECT a.src, a.dst, a.w, b.w AS wrev
                 FROM e a LEFT JOIN e b ON a.src = b.dst AND a.dst = b.src)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(SUM(CASE WHEN wrev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reciprocated,
             ROUND(CAST(SUM(CASE WHEN wrev IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 4) + 0 AS reciprocity,
             ROUND(CAST(SUM(LEAST(w, COALESCE(wrev, 0))) AS DOUBLE)
                   / CAST(SUM(w) AS DOUBLE), 4) + 0 AS weighted_reciprocity
      FROM j""",

    // ---- round 4: quality-filter battery / semantic dedup (§2.129) --------

    "q_gopher_quality" -> """
      WITH base AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS tk
                    FROM documents),
           d AS (SELECT doc_id, lang,
                        CAST(LENGTH(tk) AS BIGINT) AS nw,
                        CAST(list_sum(list_transform(tk, t -> LENGTH(t))) AS BIGINT) AS nc,
                        CAST(list_sum(list_transform(tk,
                          t -> CASE WHEN t IN ('the', 'a') THEN 1 ELSE 0 END)) AS BIGINT) AS stop_hits,
                        unnest(tk) AS w
                 FROM base),
           wc AS (SELECT doc_id, lang, nw, nc, stop_hits, w,
                         CAST(COUNT(*) AS BIGINT) AS wcnt
                  FROM d GROUP BY 1, 2, 3, 4, 5, 6),
           docs AS (SELECT doc_id, lang, nw, nc, stop_hits,
                           MAX(wcnt) AS maxw
                    FROM wc GROUP BY 1, 2, 3, 4, 5),
           flags AS (SELECT lang,
                            nw >= 30 AS len_ok,
                            nc >= nw * 3 AND nc <= nw * 10 AS mwl_ok,
                            maxw * 100 <= nw * 15 AS rep_ok,
                            stop_hits >= 1 AS stop_ok
                     FROM docs)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
             CAST(SUM(CASE WHEN mwl_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl_ok,
             CAST(SUM(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
             CAST(SUM(CASE WHEN stop_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
             CAST(SUM(CASE WHEN len_ok AND mwl_ok AND rep_ok AND stop_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             ROUND(CAST(SUM(CASE WHEN len_ok AND mwl_ok AND rep_ok AND stop_ok
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 4) + 0 AS pass_rate
      FROM flags GROUP BY 1 ORDER BY lang""",

    "q_ttr_filter" -> """
      WITH d AS (SELECT source,
                        CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT) AS nw,
                        CAST(LENGTH(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS nd
                 FROM documents),
           t AS (SELECT source, nw, nd,
                        nd * 10 < nw * 4 AS low_div,
                        CAST(ROUND(CAST(nd AS DOUBLE) / CAST(nw AS DOUBLE) * 1e6)
                          AS BIGINT) AS ttr_e6
                 FROM d)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN low_div THEN 1 ELSE 0 END) AS BIGINT) AS n_low_div,
             ROUND(CAST(SUM(ttr_e6) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) + 0 AS mean_ttr
      FROM t GROUP BY 1 ORDER BY source""",

    "q_dup_chunk_removal" -> """
      WITH chunks AS (SELECT doc_id, lang, n_chars,
                             unnest(list_transform(
                               range(0, LENGTH(string_split(lower(text), ' ')) // 8),
                               i -> array_to_string(list_slice(
                                 string_split(lower(text), ' '),
                                 i * 8 + 1, i * 8 + 8), ' '))) AS chunk
                      FROM documents),
           dup AS (SELECT chunk, COUNT(DISTINCT doc_id) > 1 AS is_dup
                   FROM chunks GROUP BY 1),
           docs AS (SELECT chunks.doc_id, lang, n_chars,
                           CAST(COUNT(*) AS BIGINT) AS n_chunks,
                           CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
                    FROM chunks JOIN dup ON chunks.chunk = dup.chunk
                    GROUP BY 1, 2, 3),
           verdict AS (SELECT lang, n_chars, n_dup * 2 >= n_chunks AS drop_doc
                       FROM docs)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN drop_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             CAST(SUM(CASE WHEN NOT drop_doc THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars,
             CAST(SUM(CASE WHEN drop_doc THEN n_chars ELSE 0 END) AS BIGINT)
               AS dropped_chars,
             ROUND(1.0 - CAST(SUM(CASE WHEN drop_doc THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 4) + 0 AS retention
      FROM verdict GROUP BY 1 ORDER BY lang""",

    "q_semantic_dedup" -> """
      WITH hp AS (SELECT p, d,
                         CASE WHEN CAST('0x' || substring(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                              THEN 1 ELSE -1 END AS s
                  FROM range(0, 8) t1(p), range(0, 64) t2(d)),
           m AS (SELECT vec_id, label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           n AS (SELECT vec_id, label, qe,
                        CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS nrm FROM m),
           dims AS (SELECT vec_id, generate_subscripts(qe, 1) - 1 AS d, unnest(qe) AS x FROM n),
           proj AS (SELECT vec_id, p, CAST(SUM(s * x) AS BIGINT) AS proj
                    FROM dims JOIN hp USING (d) GROUP BY vec_id, p),
           buckets AS (SELECT vec_id,
                              CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
                       FROM proj GROUP BY vec_id),
           wb AS (SELECT n.vec_id, n.label, n.qe, n.nrm, buckets.bucket
                  FROM n JOIN buckets ON n.vec_id = buckets.vec_id),
           pairs AS (SELECT a.label,
                            b.vec_id AS vid2,
                            ROUND(CAST(CAST(list_sum(list_transform(list_zip(a.qe, b.qe), z -> z[1]*z[2])) AS BIGINT) AS DOUBLE)
                                  / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)), 4) + 0 AS cos
                     FROM wb a JOIN wb b
                       ON a.bucket = b.bucket AND a.label = b.label
                          AND a.vec_id < b.vec_id),
           ps AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
                         CAST(SUM(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_dup_pairs,
                         CAST(COUNT(DISTINCT CASE WHEN cos >= 0.4 THEN vid2 END) AS BIGINT)
                           AS n_removed
                  FROM pairs GROUP BY 1),
           base AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets
                    FROM wb GROUP BY 1)
      SELECT CAST(base.label AS BIGINT) AS label, n_vecs, n_buckets,
             COALESCE(n_cand_pairs, 0) AS n_cand_pairs,
             COALESCE(n_dup_pairs, 0) AS n_dup_pairs,
             COALESCE(n_removed, 0) AS n_removed
      FROM base LEFT JOIN ps ON base.label = ps.label
      ORDER BY label""",

    // ---- round 4: spatial association round-out (§2.130) ------------------

    "q_getis_ord_g" -> """
      WITH x AS (SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
                        CAST(ROUND(
                          CAST(SUM(CAST(ROUND(c.c_acctbal*100) AS BIGINT)) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS xq
                 FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                 GROUP BY 1, 2),
           pairs AS (SELECT CAST(COUNT(*) AS BIGINT) AS w,
                            CAST(SUM(a.xq * b.xq) AS BIGINT) AS num
                     FROM x a JOIN x b ON a.rk = b.rk AND a.nk <> b.nk),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(xq) AS BIGINT) AS sx,
                          CAST(SUM(xq * xq) AS BIGINT) AS sxx
                   FROM x)
      SELECT n AS n_nations, w AS w_pairs,
             ROUND(CAST(num AS DOUBLE)
                   / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                      - CAST(sxx AS DOUBLE)), 6) + 0 AS g,
             ROUND(CAST(w AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) + 0 AS e_g
      FROM tot CROSS JOIN pairs""",

    "q_join_count_stat" -> """
      WITH x AS (SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
                        CAST(ROUND(
                          CAST(SUM(CAST(ROUND(c.c_acctbal*100) AS BIGINT)) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS xq
                 FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                 GROUP BY 1, 2),
           med AS (SELECT MIN(xq) AS m FROM
                     (SELECT a.xq, CAST(COUNT(*) AS BIGINT) AS cle
                      FROM x a JOIN x b ON b.xq <= a.xq GROUP BY 1)
                   CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x)
                   WHERE cle * 2 >= n),
           colored AS (SELECT nk, rk, xq > med.m AS black FROM x CROSS JOIN med),
           pairs AS (SELECT CAST(COUNT(*) AS BIGINT) AS w,
                            CAST(SUM(CASE WHEN a.black AND b.black THEN 1 ELSE 0 END) AS BIGINT) AS bb,
                            CAST(SUM(CASE WHEN a.black <> b.black THEN 1 ELSE 0 END) AS BIGINT) AS bw,
                            CAST(SUM(CASE WHEN NOT a.black AND NOT b.black THEN 1 ELSE 0 END) AS BIGINT) AS ww
                     FROM colored a JOIN colored b ON a.rk = b.rk AND a.nk <> b.nk),
           counts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(CASE WHEN black THEN 1 ELSE 0 END) AS BIGINT) AS nb
                      FROM colored)
      SELECT n AS n_nations, nb AS n_black, w AS w_pairs, bb, bw, ww,
             ROUND(CAST(w AS DOUBLE) * CAST(nb AS DOUBLE)
                   * (CAST(nb AS DOUBLE) - 1.0)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 4) + 0 AS e_bb,
             ROUND(2.0 * CAST(w AS DOUBLE) * CAST(nb AS DOUBLE)
                   * CAST(n - nb AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 4) + 0 AS e_bw
      FROM counts CROSS JOIN pairs""",

    "q_local_moran" -> """
      WITH x AS (SELECT c.c_nationkey AS nk, n.n_regionkey AS rk,
                        CAST(ROUND(
                          CAST(SUM(CAST(ROUND(c.c_acctbal*100) AS BIGINT)) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS xq
                 FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                 GROUP BY 1, 2),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(xq) AS BIGINT) AS sx FROM x),
           z AS (SELECT nk, rk, n, xq * n - sx AS z FROM x CROSS JOIN tot),
           rs AS (SELECT rk, CAST(SUM(z) AS BIGINT) AS rz,
                         CAST(COUNT(*) AS BIGINT) AS rn
                  FROM z GROUP BY 1),
           sz AS (SELECT SUM(CAST(z AS HUGEINT) * z) AS szsq FROM z)
      SELECT z.nk, z.rk, rn - 1 AS n_neighbors,
             ROUND(CAST(z.n AS DOUBLE) * CAST(z.z AS DOUBLE)
                   * CAST(rz - z.z AS DOUBLE)
                   / CAST(szsq AS DOUBLE), 4) + 0 AS local_i,
             CASE WHEN z.z > 0 AND (rz - z.z) > 0 THEN 'HH'
                  WHEN z.z < 0 AND (rz - z.z) < 0 THEN 'LL'
                  WHEN z.z > 0 THEN 'HL' ELSE 'LH' END AS quadrant
      FROM z JOIN rs ON z.rk = rs.rk CROSS JOIN sz
      ORDER BY nk""",

    // ---- round 4: goodness-of-fit / sequence tests (§2.131) ---------------

    "q_anderson_darling" -> """
      WITH cell AS (SELECT l_returnflag AS flag,
                           CAST(ROUND(l_discount*100) AS BIGINT) AS d,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           cum AS (SELECT flag, d, c,
                          CAST(SUM(c) OVER (PARTITION BY flag ORDER BY d) AS BIGINT) AS hi
                   FROM cell),
           n AS (SELECT flag, CAST(SUM(c) AS BIGINT) AS n FROM cell GROUP BY 1),
           terms AS (SELECT cum.flag, n.n,
                            hi * hi - (hi - c) * (hi - c) AS w1,
                            c * (2 * n.n + 1)
                              - (hi * (hi + 1) - (hi - c + 1) * (hi - c)) AS w2,
                            CAST(ROUND(ln((CAST(d AS DOUBLE) + 1.0) / 12.0) * 1e8)
                              AS BIGINT) AS t,
                            CAST(ROUND(ln(1.0 - (CAST(d AS DOUBLE) + 1.0) / 12.0)
                                       * 1e8) AS BIGINT) AS s
                     FROM cum JOIN n ON cum.flag = n.flag)
      SELECT flag, n,
             ROUND(-CAST(n AS DOUBLE)
                   - CAST(SUM(CAST(w1 AS HUGEINT) * t + CAST(w2 AS HUGEINT) * s)
                       AS DOUBLE)
                     / (CAST(n AS DOUBLE) * 1e8), 4) + 0 AS a2
      FROM terms GROUP BY 1, 2 ORDER BY flag""",

    "q_cox_stuart" -> """
      WITH daily AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1, 2),
           idx AS (SELECT event_type, rev,
                          CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY day) AS BIGINT) AS i
                   FROM daily),
           n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                 FROM daily GROUP BY 1),
           lagged AS (SELECT idx.event_type, n.n, n.n // 2 AS m,
                             idx.i + n.n - n.n // 2 AS i2, idx.rev AS rev1
                      FROM idx JOIN n ON idx.event_type = n.event_type
                      WHERE idx.i <= n.n // 2),
           s AS (SELECT lagged.event_type, lagged.n,
                        CAST(SUM(CASE WHEN b.rev > rev1 THEN 1 ELSE 0 END) AS BIGINT) AS s_pos,
                        CAST(SUM(CASE WHEN b.rev < rev1 THEN 1 ELSE 0 END) AS BIGINT) AS s_neg
                 FROM lagged JOIN idx b
                   ON lagged.event_type = b.event_type AND lagged.i2 = b.i
                 GROUP BY 1, 2)
      SELECT event_type, n AS n_days, s_pos, s_neg,
             ROUND((2.0 * CAST(s_pos AS DOUBLE)
                    - CAST(s_pos + s_neg AS DOUBLE))
                   / SQRT(CAST(s_pos + s_neg AS DOUBLE)), 4) + 0 AS z
      FROM s ORDER BY event_type""",

    "q_wald_wolfowitz" -> """
      WITH cell AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
                           CAST(SUM(CASE WHEN l_linestatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b
                    FROM lineitem GROUP BY 1),
           idx AS (SELECT v, a, b,
                          CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS idx
                   FROM cell),
           internal AS (SELECT CAST(SUM(CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_in,
                               CAST(SUM(a) AS BIGINT) AS ta,
                               CAST(SUM(b) AS BIGINT) AS tb
                        FROM idx),
           bound AS (SELECT CAST(SUM(CASE WHEN
                              (CASE WHEN x.b > 0 THEN 'O' ELSE 'F' END) <>
                              (CASE WHEN y.a > 0 THEN 'F' ELSE 'O' END)
                              THEN 1 ELSE 0 END) AS BIGINT) AS t_bd
                     FROM idx x JOIN idx y ON x.idx = y.idx - 1)
      SELECT ta AS n_f, tb AS n_o, t_in + t_bd + 1 AS runs,
             ROUND(2.0 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
                   / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)) + 1.0, 4) + 0 AS mu,
             ROUND((CAST(t_in + t_bd + 1 AS DOUBLE)
                    - (2.0 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
                       / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)) + 1.0))
                   / SQRT(2.0 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
                          * (2.0 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
                             - CAST(ta AS DOUBLE) - CAST(tb AS DOUBLE))
                          / ((CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
                             * (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))
                             * (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE) - 1.0))), 4)
               + 0 AS z
      FROM internal CROSS JOIN bound""",

    // ---- round 4: blocked/seasonal rank tests, reliability (§2.132) -------

    "q_seasonal_mann_kendall" -> """
      WITH cell AS (SELECT event_type,
                           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                    FROM events GROUP BY 1, 2, 3),
           s AS (SELECT a.event_type,
                        CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                                      WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s
                 FROM cell a JOIN cell b
                   ON a.event_type = b.event_type AND a.h = b.h AND b.day > a.day
                 GROUP BY 1),
           sn AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n
                  FROM cell GROUP BY 1, 2),
           tie AS (SELECT event_type, h,
                          CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tt FROM
                            (SELECT event_type, h, rev, CAST(COUNT(*) AS BIGINT) AS t
                             FROM cell GROUP BY 1, 2, 3)
                   GROUP BY 1, 2),
           v AS (SELECT sn.event_type, CAST(COUNT(*) AS BIGINT) AS n_seasons,
                        CAST(SUM(n*(n-1)*(2*n+5) - tt) AS BIGINT) AS var18
                 FROM sn JOIN tie ON sn.event_type = tie.event_type AND sn.h = tie.h
                 GROUP BY 1)
      SELECT s.event_type AS event_type, n_seasons, s AS s_stat,
             ROUND((CAST(s AS DOUBLE) - SIGN(CAST(s AS DOUBLE)))
                   / SQRT(CAST(var18 AS DOUBLE) / 18.0), 4) + 0 AS z
      FROM s JOIN v ON s.event_type = v.event_type
      ORDER BY 1""",

    "q_quade_test" -> """
      WITH cell AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
                           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                    FROM events GROUP BY 1, 2),
           kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM cell),
           complete AS (SELECT cell.* FROM cell
                        JOIN (SELECT day, CAST(COUNT(*) AS BIGINT) AS nt
                              FROM cell GROUP BY 1) d ON cell.day = d.day
                        CROSS JOIN kk WHERE d.nt = kk.k),
           ranked AS (SELECT day, event_type,
                             CAST(ROW_NUMBER() OVER (PARTITION BY day
                               ORDER BY rev, event_type) AS BIGINT) AS r
                      FROM complete),
           rng AS (SELECT day, MAX(rev) - MIN(rev) AS rg
                   FROM complete GROUP BY 1),
           q AS (SELECT a.day, CAST(COUNT(b.day) + 1 AS BIGINT) AS qrank
                 FROM rng a LEFT JOIN rng b
                   ON b.rg < a.rg OR (b.rg = a.rg AND b.day < a.day)
                 GROUP BY 1),
           scores AS (SELECT ranked.day, event_type,
                             qrank * (2 * r - (kk.k + 1)) AS s2
                      FROM ranked JOIN q ON ranked.day = q.day CROSS JOIN kk),
           a AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk,
                        CAST(SUM(s2*s2) AS BIGINT) AS a2 FROM scores),
           b AS (SELECT CAST(COUNT(*) AS BIGINT) AS kcnt,
                        CAST(SUM(sj*sj) AS BIGINT) AS sb2 FROM
                          (SELECT event_type, CAST(SUM(s2) AS BIGINT) AS sj
                           FROM scores GROUP BY 1))
      SELECT nk // kcnt AS n_blocks, kcnt AS k, a2, sb2,
             ROUND((CAST(nk // kcnt AS DOUBLE) - 1.0)
                   * (CAST(sb2 AS DOUBLE) / CAST(nk // kcnt AS DOUBLE))
                   / (CAST(a2 AS DOUBLE)
                      - CAST(sb2 AS DOUBLE) / CAST(nk // kcnt AS DOUBLE)), 4)
               + 0 AS f
      FROM a CROSS JOIN b""",

    "q_conover_squared_ranks" -> """
      WITH cell AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           cum AS (SELECT g, v, c,
                          CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
                   FROM cell),
           ng AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM cell GROUP BY 1),
           med AS (SELECT cum.g, MIN(v) AS med
                   FROM cum JOIN ng ON cum.g = ng.g
                   WHERE cum * 2 >= n_g GROUP BY 1),
           zcell AS (SELECT cell.g, ABS(v - med) AS z,
                            CAST(SUM(c) AS BIGINT) AS c
                     FROM cell JOIN med ON cell.g = med.g GROUP BY 1, 2),
           comb AS (SELECT z, CAST(SUM(c) AS BIGINT) AS ct FROM zcell GROUP BY 1),
           ranks AS (SELECT z, ct,
                            2 * (CAST(SUM(ct) OVER (ORDER BY z) AS BIGINT) - ct)
                              + ct + 1 AS r2
                     FROM comb),
           tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nn,
                          SUM(CAST(ct AS HUGEINT) * r2 * r2) AS sr2,
                          SUM(CAST(ct AS HUGEINT) * r2 * r2 * r2 * r2) AS sr4
                   FROM ranks),
           tg AS (SELECT zcell.g, CAST(SUM(c) AS BIGINT) AS n_g,
                         SUM(CAST(c AS HUGEINT) * r2 * r2) AS t4
                  FROM zcell JOIN ranks ON zcell.z = ranks.z GROUP BY 1)
      SELECT g AS flag, n_g,
             ROUND((CAST(t4 AS DOUBLE)
                    - CAST(n_g AS DOUBLE) * (CAST(sr2 AS DOUBLE) / CAST(nn AS DOUBLE)))
                   / SQRT(CAST(n_g AS DOUBLE)
                          * (CAST(nn AS DOUBLE) - CAST(n_g AS DOUBLE))
                          / CAST(nn AS DOUBLE)
                          * ((CAST(sr4 AS DOUBLE)
                              - CAST(nn AS DOUBLE)
                                * (CAST(sr2 AS DOUBLE) / CAST(nn AS DOUBLE))
                                * (CAST(sr2 AS DOUBLE) / CAST(nn AS DOUBLE)))
                             / (CAST(nn AS DOUBLE) - 1.0))), 4) + 0 AS z
      FROM tg CROSS JOIN tot ORDER BY flag""",

    "q_erlang_b_loss" -> """
      WITH span AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(MIN(epoch_us(ts)) AS BIGINT) AS t0,
                           CAST(MAX(epoch_us(ts)) AS BIGINT) AS t1
                    FROM events),
           aa AS (SELECT CAST(n AS DOUBLE)
                         / (CAST(t1 - t0 AS DOUBLE) / 3.6e9) / 10.0 AS a
                  FROM span),
           terms AS (SELECT k, a,
                            POW(a, CAST(k AS DOUBLE))
                              / (CASE k WHEN 0 THEN 1.0 WHEN 1 THEN 1.0
                                 WHEN 2 THEN 2.0 WHEN 3 THEN 6.0 WHEN 4 THEN 24.0
                                 WHEN 5 THEN 120.0 WHEN 6 THEN 720.0
                                 WHEN 7 THEN 5040.0 ELSE 40320.0 END) AS t
                     FROM aa CROSS JOIN range(0, 9) r(k))
      SELECT m.k AS m, ROUND(m.a, 4) + 0 AS offered_erlangs,
             ROUND(m.t / SUM(d.t), 6) + 0 AS blocking_b
      FROM terms m JOIN terms d ON d.k <= m.k
      WHERE m.k >= 1
      GROUP BY m.k, m.a, m.t ORDER BY m""",

    "q_crow_amsaa" -> """
      WITH t0 AS (SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS t0 FROM events),
           t AS (SELECT th, CAST(ROUND(ln(th) * 1e8) AS BIGINT) AS lt FROM
                   (SELECT CAST(epoch_us(ts) - t0.t0 AS DOUBLE) / 3.6e9 AS th
                    FROM events CROSS JOIN t0 WHERE event_type = 'error')
                 WHERE th > 0.0),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(lt) AS BIGINT) AS slt,
                        MAX(th) AS bigT
                 FROM t)
      SELECT n AS n_failures, ROUND(bigT, 4) + 0 AS t_hours,
             ROUND(CAST(n AS DOUBLE)
                   / (CAST(n AS DOUBLE) * ln(bigT)
                      - CAST(slt AS DOUBLE) / 1e8), 4) + 0 AS beta,
             ROUND(CAST(n AS DOUBLE)
                   / POW(bigT, CAST(n AS DOUBLE)
                               / (CAST(n AS DOUBLE) * ln(bigT)
                                  - CAST(slt AS DOUBLE) / 1e8)), 6) + 0 AS lambda,
             ROUND(1.0 / ((CAST(n AS DOUBLE)
                           / POW(bigT, CAST(n AS DOUBLE)
                                       / (CAST(n AS DOUBLE) * ln(bigT)
                                          - CAST(slt AS DOUBLE) / 1e8)))
                          * (CAST(n AS DOUBLE)
                             / (CAST(n AS DOUBLE) * ln(bigT)
                                - CAST(slt AS DOUBLE) / 1e8))
                          * POW(bigT, CAST(n AS DOUBLE)
                                      / (CAST(n AS DOUBLE) * ln(bigT)
                                         - CAST(slt AS DOUBLE) / 1e8) - 1.0)), 4)
               + 0 AS mtbf_inst_h
      FROM s""",

    "q_suits_index" -> """
      WITH cell AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c,
                           CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100)
                             AS BIGINT)) AS BIGINT) AS pt
                    FROM lineitem GROUP BY 1),
           cums AS (SELECT v, v * c AS py, pt,
                           CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS idx,
                           CAST(SUM(v * c) OVER (ORDER BY v) AS BIGINT) AS cy,
                           CAST(SUM(pt) OVER (ORDER BY v) AS BIGINT) AS ct
                    FROM cell),
           tot AS (SELECT MAX(cy) AS ty, MAX(ct) AS tt,
                          CAST(COUNT(*) AS BIGINT) AS n_cells
                   FROM cums),
           terms AS (SELECT SUM(CAST(x.py AS HUGEINT)
                       * (x.ct + COALESCE(p.ct, 0))) AS num
                     FROM cums x LEFT JOIN cums p ON x.idx = p.idx + 1)
      SELECT n_cells,
             ROUND(1.0 - CAST(num AS DOUBLE)
                   / (CAST(ty AS DOUBLE) * CAST(tt AS DOUBLE)), 4) + 0 AS suits
      FROM tot CROSS JOIN terms""",

    // ---- round 4: dispersion/keyness, survival family, SPC memory (§2.133) -

    "q_gries_dp" -> """
      WITH tok AS (SELECT w, source, CAST(COUNT(*) AS BIGINT) AS v FROM
                     (SELECT source, unnest(string_split(lower(text), ' ')) AS w
                      FROM documents)
                   GROUP BY 1, 2),
           parts AS (SELECT source, CAST(SUM(v) AS BIGINT) AS s
                     FROM tok GROUP BY 1),
           tot AS (SELECT CAST(SUM(s) AS BIGINT) AS t FROM parts),
           f AS (SELECT w, CAST(SUM(v) AS BIGINT) AS f FROM tok GROUP BY 1)
      SELECT tok.w AS token, f.f AS freq, CAST(COUNT(*) AS BIGINT) AS n_parts,
             ROUND(CAST(SUM(ABS(v * t - s * f.f)) AS DOUBLE)
                   / (2.0 * CAST(f.f AS DOUBLE) * CAST(MAX(t) AS DOUBLE)), 4) + 0
               AS dp
      FROM tok JOIN parts ON tok.source = parts.source
      JOIN f ON tok.w = f.w CROSS JOIN tot
      GROUP BY tok.w, f.f
      ORDER BY freq DESC, token ASC LIMIT 10""",

    "q_keyness_ll" -> """
      WITH tok AS (SELECT w,
                          CAST(SUM(CASE WHEN inA THEN 1 ELSE 0 END) AS BIGINT) AS a,
                          CAST(SUM(CASE WHEN NOT inA THEN 1 ELSE 0 END) AS BIGINT) AS b
                   FROM (SELECT lang = 'en' AS inA,
                                unnest(string_split(lower(text), ' ')) AS w
                         FROM documents)
                   GROUP BY 1),
           tots AS (SELECT CAST(SUM(a) AS BIGINT) AS ta,
                           CAST(SUM(b) AS BIGINT) AS tb FROM tok),
           scored AS (SELECT w AS token, a AS n_en, b AS n_rest,
                             ROUND(2.0 * (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                                    * ln(CAST(a AS DOUBLE)
                                         / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                                            * CAST(ta AS DOUBLE)
                                            / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))))
                                    ELSE 0.0 END
                                  + CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
                                    * ln(CAST(b AS DOUBLE)
                                         / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                                            * CAST(tb AS DOUBLE)
                                            / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))))
                                    ELSE 0.0 END), 4) + 0 AS ll,
                             CASE WHEN CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
                                    > CAST(b AS DOUBLE) * CAST(ta AS DOUBLE)
                                  THEN 'over' ELSE 'under' END AS direction
                      FROM tok CROSS JOIN tots)
      SELECT * FROM scored ORDER BY ABS(ll) DESC, token ASC LIMIT 15""",

    "q_weighted_logrank" -> """
      WITH obs AS (SELECT CAST(user_id % 2 AS BIGINT) AS g,
                          CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS BIGINT) AS t,
                          CASE WHEN MAX(CAST(ts AS DATE)) <= DATE '2024-01-23'
                               THEN 1 ELSE 0 END AS churned
                   FROM events GROUP BY user_id, user_id % 2),
           byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at,
                          CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_at1,
                          CAST(SUM(churned) AS BIGINT) AS d,
                          CAST(SUM(CASE WHEN g = 0 THEN churned ELSE 0 END) AS BIGINT)
                            AS d1
                   FROM obs GROUP BY 1),
           risk AS (SELECT a.t, a.d, a.d1 AS dd1,
                           CAST(SUM(b.n_at) AS BIGINT) AS nr,
                           CAST(SUM(b.n_at1) AS BIGINT) AS nr1
                    FROM byt a JOIN byt b ON b.t >= a.t
                    GROUP BY 1, 2, 3
                    HAVING a.d > 0 AND CAST(SUM(b.n_at) AS BIGINT) > 1),
           s AS (SELECT
                   SUM(CAST(dd1 AS DOUBLE) - CAST(d AS DOUBLE)
                       * CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE)) AS u1,
                   SUM(CAST(d AS DOUBLE) * (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                       * (1.0 - CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                       * CAST(nr - d AS DOUBLE)
                       / (CAST(nr AS DOUBLE) - 1.0)) AS v1,
                   SUM(CAST(nr AS DOUBLE)
                       * (CAST(dd1 AS DOUBLE) - CAST(d AS DOUBLE)
                          * CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))) AS ug,
                   SUM(CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE)
                       * (CAST(d AS DOUBLE) * (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                          * (1.0 - CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                          * CAST(nr - d AS DOUBLE)
                          / (CAST(nr AS DOUBLE) - 1.0))) AS vg,
                   SUM(SQRT(CAST(nr AS DOUBLE))
                       * (CAST(dd1 AS DOUBLE) - CAST(d AS DOUBLE)
                          * CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))) AS ut,
                   SUM(CAST(nr AS DOUBLE)
                       * (CAST(d AS DOUBLE) * (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                          * (1.0 - CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))
                          * CAST(nr - d AS DOUBLE)
                          / (CAST(nr AS DOUBLE) - 1.0))) AS vt
                 FROM risk)
      SELECT ROUND(u1 * u1 / v1, 4) + 0 AS chi2_logrank,
             ROUND(ug * ug / vg, 4) + 0 AS chi2_gehan,
             ROUND(ut * ut / vt, 4) + 0 AS chi2_tarone_ware
      FROM s""",

    "q_kakwani_index" -> """
      WITH cell AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c,
                           CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100)
                             AS BIGINT)) AS BIGINT) AS pt
                    FROM lineitem GROUP BY 1),
           cums AS (SELECT v, c, v * c AS py, pt,
                           CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS idx,
                           CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cc,
                           CAST(SUM(v * c) OVER (ORDER BY v) AS BIGINT) AS cy,
                           CAST(SUM(pt) OVER (ORDER BY v) AS BIGINT) AS ct
                    FROM cell),
           tot AS (SELECT MAX(cc) AS tn, MAX(cy) AS ty, MAX(ct) AS tt,
                          CAST(COUNT(*) AS BIGINT) AS n_cells
                   FROM cums),
           terms AS (SELECT SUM(CAST(x.c AS HUGEINT)
                              * (x.cy + COALESCE(p.cy, 0))) AS num_g,
                            SUM(CAST(x.c AS HUGEINT)
                              * (x.ct + COALESCE(p.ct, 0))) AS num_c
                     FROM cums x LEFT JOIN cums p ON x.idx = p.idx + 1)
      SELECT n_cells,
             ROUND(1.0 - CAST(num_g AS DOUBLE)
                   / (CAST(tn AS DOUBLE) * CAST(ty AS DOUBLE)), 4) + 0 AS gini_price,
             ROUND(1.0 - CAST(num_c AS DOUBLE)
                   / (CAST(tn AS DOUBLE) * CAST(tt AS DOUBLE)), 4) + 0
               AS conc_discount,
             ROUND((1.0 - CAST(num_c AS DOUBLE)
                    / (CAST(tn AS DOUBLE) * CAST(tt AS DOUBLE)))
                   - (1.0 - CAST(num_g AS DOUBLE)
                      / (CAST(tn AS DOUBLE) * CAST(ty AS DOUBLE))), 4) + 0
               AS kakwani
      FROM tot CROSS JOIN terms""",

    "q_ewma_chart" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                            CAST(COUNT(*) AS BIGINT) AS x
                     FROM events WHERE event_type = 'error' GROUP BY 1),
           st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                         CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cbar
                  FROM daily),
           kern AS (SELECT t.day,
                           SUM(POW(0.5, CAST(date_diff('day', k.day, t.day)
                                 AS DOUBLE) + 1.0)
                               * CAST(k.x AS DOUBLE)) AS z
                    FROM daily t JOIN daily k
                      ON date_diff('day', k.day, t.day) BETWEEN 0 AND 11
                    GROUP BY 1 HAVING COUNT(*) = 12)
      SELECT CAST(day AS VARCHAR) AS day, ROUND(z, 4) + 0 AS ewma,
             ROUND(cbar + SQRT(1.0 / 3.0) * 3.0 * SQRT(cbar), 4) + 0 AS ucl,
             ROUND(cbar - SQRT(1.0 / 3.0) * 3.0 * SQRT(cbar), 4) + 0 AS lcl,
             CAST(CASE WHEN z > cbar + SQRT(1.0 / 3.0) * 3.0 * SQRT(cbar)
                         OR z < cbar - SQRT(1.0 / 3.0) * 3.0 * SQRT(cbar)
                       THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
      FROM kern CROSS JOIN st
      ORDER BY day""",

    "q_graph_efficiency" -> """
      WITH e0 AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
                  FROM events),
           ed AS (SELECT src, dst FROM
                    (SELECT user_id, event_type AS dst,
                            LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS src
                     FROM e0)
                  WHERE src IS NOT NULL AND src <> dst
                  GROUP BY 1, 2),
           d1 AS (SELECT src, dst, CAST(1 AS BIGINT) AS d FROM ed),
           d2 AS (SELECT DISTINCT a.src, b.dst, CAST(2 AS BIGINT) AS d
                  FROM ed a JOIN ed b ON a.dst = b.src AND a.src <> b.dst),
           d3 AS (SELECT DISTINCT d2.src, ed.dst, CAST(3 AS BIGINT) AS d
                  FROM d2 JOIN ed ON d2.dst = ed.src AND d2.src <> ed.dst),
           best AS (SELECT src, dst, MIN(d) AS d FROM
                      (SELECT * FROM d1 UNION ALL SELECT * FROM d2
                       UNION ALL SELECT * FROM d3)
                    GROUP BY 1, 2),
           n AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n FROM events)
      SELECT n.n AS n_nodes, CAST(COUNT(*) AS BIGINT) AS n_pairs_reachable,
             CAST(MAX(d) AS BIGINT) AS diameter_le3,
             ROUND(CAST(SUM(1000000 // d) AS DOUBLE)
                   / (CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1.0) * 1e6), 4)
               + 0 AS efficiency
      FROM best CROSS JOIN n GROUP BY n.n""",

    "q_adjusted_rand" -> """
      WITH hp AS (SELECT p, d,
                         CASE WHEN CAST('0x' || substring(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                              THEN 1 ELSE -1 END AS s
                  FROM range(0, 4) t1(p), range(0, 64) t2(d)),
           m AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT vec_id, label, generate_subscripts(qe, 1) - 1 AS d, unnest(qe) AS x FROM m),
           proj AS (SELECT vec_id, label, p, CAST(SUM(s * x) AS BIGINT) AS proj
                    FROM dims JOIN hp USING (d) GROUP BY 1, 2, 3),
           buckets AS (SELECT vec_id, label,
                              CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
                       FROM proj GROUP BY 1, 2),
           cont AS (SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS nij
                    FROM buckets GROUP BY 1, 2),
           cells AS (SELECT SUM(CAST(nij * (nij - 1) // 2 AS HUGEINT)) AS sum_idx,
                            CAST(COUNT(*) AS BIGINT) AS n_cells
                     FROM cont),
           rows_ AS (SELECT SUM(CAST(ai * (ai - 1) // 2 AS HUGEINT)) AS sum_a,
                            CAST(COUNT(*) AS BIGINT) AS k_labels,
                            CAST(SUM(ai) AS BIGINT) AS n
                     FROM (SELECT label, CAST(SUM(nij) AS BIGINT) AS ai
                           FROM cont GROUP BY 1)),
           cols_ AS (SELECT SUM(CAST(bj * (bj - 1) // 2 AS HUGEINT)) AS sum_b,
                            CAST(COUNT(*) AS BIGINT) AS k_buckets
                     FROM (SELECT bucket, CAST(SUM(nij) AS BIGINT) AS bj
                           FROM cont GROUP BY 1))
      SELECT n, k_labels, k_buckets, n_cells,
             ROUND((CAST(sum_idx AS DOUBLE)
                    - CAST(sum_a AS DOUBLE) * CAST(sum_b AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0))
                   / ((CAST(sum_a AS DOUBLE) + CAST(sum_b AS DOUBLE)) / 2.0
                      - CAST(sum_a AS DOUBLE) * CAST(sum_b AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)),
                   6) + 0 AS ari
      FROM cells CROSS JOIN rows_ CROSS JOIN cols_""",

    "q_nmi_clusters" -> """
      WITH hp AS (SELECT p, d,
                         CASE WHEN CAST('0x' || substring(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                              THEN 1 ELSE -1 END AS s
                  FROM range(0, 4) t1(p), range(0, 64) t2(d)),
           m AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT vec_id, label, generate_subscripts(qe, 1) - 1 AS d, unnest(qe) AS x FROM m),
           proj AS (SELECT vec_id, label, p, CAST(SUM(s * x) AS BIGINT) AS proj
                    FROM dims JOIN hp USING (d) GROUP BY 1, 2, 3),
           buckets AS (SELECT vec_id, label,
                              CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
                       FROM proj GROUP BY 1, 2),
           cont AS (SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS nij
                    FROM buckets GROUP BY 1, 2),
           tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cont),
           rows_ AS (SELECT label, CAST(SUM(nij) AS BIGINT) AS ai FROM cont GROUP BY 1),
           cols_ AS (SELECT bucket, CAST(SUM(nij) AS BIGINT) AS bj FROM cont GROUP BY 1),
           hu AS (SELECT -CAST(SUM(CAST(ROUND(CAST(ai AS DOUBLE)
                            * LN(CAST(ai AS DOUBLE) / CAST(n AS DOUBLE)) * 1e8)
                          AS BIGINT)) AS BIGINT) AS hu_e8,
                         CAST(COUNT(*) AS BIGINT) AS k_labels, n
                  FROM rows_ CROSS JOIN tot GROUP BY n),
           hv AS (SELECT -CAST(SUM(CAST(ROUND(CAST(bj AS DOUBLE)
                            * LN(CAST(bj AS DOUBLE) / CAST(n AS DOUBLE)) * 1e8)
                          AS BIGINT)) AS BIGINT) AS hv_e8,
                         CAST(COUNT(*) AS BIGINT) AS k_buckets
                  FROM cols_ CROSS JOIN tot),
           mi AS (SELECT CAST(SUM(CAST(ROUND(CAST(nij AS DOUBLE)
                            * LN(CAST(n AS DOUBLE) * CAST(nij AS DOUBLE)
                                 / (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE))) * 1e8)
                          AS BIGINT)) AS BIGINT) AS mi_e8
                  FROM cont JOIN rows_ USING (label) JOIN cols_ USING (bucket)
                       CROSS JOIN tot)
      SELECT n, k_labels, k_buckets,
             ROUND(CAST(hu_e8 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e8), 6) + 0 AS h_label,
             ROUND(CAST(hv_e8 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e8), 6) + 0 AS h_bucket,
             ROUND(CAST(mi_e8 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e8), 6) + 0 AS mi,
             ROUND(2.0 * CAST(mi_e8 AS DOUBLE) / CAST(hu_e8 + hv_e8 AS DOUBLE), 6)
               + 0 AS nmi
      FROM hu CROSS JOIN hv CROSS JOIN mi""",

    "q_davies_bouldin" -> """
      WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS clabel,
                        list_transform(embedding[1:8], v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT clabel, generate_subscripts(qe, 1) - 1 AS dim, unnest(qe) AS x FROM m),
           cd AS (SELECT clabel, dim,
                         CAST(ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
                  FROM dims GROUP BY 1, 2),
           cent AS (SELECT clabel, list(c ORDER BY dim) AS c_qe FROM cd GROUP BY 1),
           scat AS (SELECT m.clabel, CAST(COUNT(*) AS BIGINT) AS n_members,
                           CAST(SUM(d_e6) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS s_e6
                    FROM (SELECT m.clabel,
                                 CAST(ROUND(SQRT(CAST(list_sum(list_transform(list_zip(m.qe, cent.c_qe),
                                        p -> (p[1]-p[2])*(p[1]-p[2]))) AS DOUBLE)) / 10.0)
                                   AS BIGINT) AS d_e6
                          FROM m JOIN cent ON m.clabel = cent.clabel) m
                    GROUP BY 1),
           pairs AS (SELECT a.clabel,
                            CAST(ROUND(SQRT(CAST(list_sum(list_transform(list_zip(a.c_qe, b.c_qe),
                                   p -> (p[1]-p[2])*(p[1]-p[2]))) AS DOUBLE)) / 10.0)
                              AS BIGINT) AS dc_e6,
                            b.clabel AS clabel2
                     FROM cent a JOIN cent b ON a.clabel <> b.clabel),
           ratios AS (SELECT p.clabel,
                             CAST(MAX((s1.s_e6 + s2.s_e6) * 1000000 // p.dc_e6) AS BIGINT) AS r_max_e6
                      FROM pairs p
                      JOIN scat s1 ON p.clabel = s1.clabel
                      JOIN scat s2 ON p.clabel2 = s2.clabel
                      GROUP BY 1),
           db AS (SELECT CAST(SUM(r_max_e6) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS db_e6
                  FROM ratios)
      SELECT s.clabel AS label, s.n_members, s.s_e6, r.r_max_e6,
             ROUND(CAST(db_e6 AS DOUBLE) / 1e6, 6) + 0 AS db_index
      FROM scat s JOIN ratios r ON s.clabel = r.clabel CROSS JOIN db
      ORDER BY label""",

    "q_calinski_harabasz" -> """
      WITH m AS (SELECT vec_id, CAST(label AS BIGINT) AS clabel,
                        list_transform(embedding[1:8], v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           dims AS (SELECT clabel, generate_subscripts(qe, 1) - 1 AS dim, unnest(qe) AS x FROM m),
           cd AS (SELECT clabel, dim,
                         CAST(ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c
                  FROM dims GROUP BY 1, 2),
           cent AS (SELECT clabel, list(c ORDER BY dim) AS c_qe FROM cd GROUP BY 1),
           gd AS (SELECT dim,
                         CAST(ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS g
                  FROM dims GROUP BY 1),
           gcent AS (SELECT list(g ORDER BY dim) AS g_qe FROM gd),
           sizes AS (SELECT CAST(label AS BIGINT) AS clabel, CAST(COUNT(*) AS BIGINT) AS ni
                     FROM embeddings GROUP BY 1),
           between_ AS (SELECT SUM(CAST(ni AS HUGEINT)
                              * CAST(list_sum(list_transform(list_zip(c_qe, g_qe),
                                  p -> (p[1]-p[2])*(p[1]-p[2]))) AS HUGEINT)) AS b_ss,
                               CAST(SUM(ni) AS BIGINT) AS n,
                               CAST(COUNT(*) AS BIGINT) AS k
                        FROM cent JOIN sizes USING (clabel) CROSS JOIN gcent),
           within_ AS (SELECT SUM(CAST(list_sum(list_transform(list_zip(m.qe, cent.c_qe),
                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS HUGEINT)) AS w_ss
                       FROM m JOIN cent ON m.clabel = cent.clabel)
      SELECT n, k,
             ROUND((CAST(b_ss AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
                   / (CAST(w_ss AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                   6) + 0 AS ch_index
      FROM between_ CROSS JOIN within_""",

    "q_kmedoids_step" -> """
      WITH m AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           med AS (SELECT vec_id AS mid, qe AS m_qe FROM m WHERE vec_id < 3),
           d AS (SELECT vec_id, mid,
                        CAST(list_sum(list_transform(list_zip(qe, m_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d2,
                        ROW_NUMBER() OVER (PARTITION BY vec_id
                          ORDER BY CAST(list_sum(list_transform(list_zip(qe, m_qe),
                             p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT), mid) AS rn
                 FROM m CROSS JOIN med),
           costs AS (SELECT mid AS medoid,
                            CAST(ROUND(SQRT(CAST(d2 AS DOUBLE)) / 10.0) AS BIGINT) AS d_e6
                     FROM d WHERE rn = 1)
      SELECT medoid, CAST(COUNT(*) AS BIGINT) AS n_assigned,
             CAST(SUM(d_e6) AS BIGINT) AS cost_e6,
             CAST(SUM(d_e6) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_cost_e6
      FROM costs GROUP BY 1 ORDER BY medoid""",

    "q_cohen_kappa" -> """
      WITH r AS (SELECT CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT) AS nw,
                        CAST(LENGTH(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS nd
                 FROM documents),
           f AS (SELECT nw >= 30 AS a, nd * 10 >= nw * 4 AS b FROM r),
           c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                        CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                        CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                        CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
                 FROM f)
      SELECT n, n11, n10, n01, n00,
             ROUND(CAST(CAST(n AS HUGEINT) * (n11 + n00)
                        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * n
                          - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                             + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) AS DOUBLE),
                   6) + 0 AS kappa
      FROM c""",

    "q_cucconi_test" -> """
      WITH cell AS (SELECT l_linestatus AS g, CAST(l_quantity AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           comb AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM cell GROUP BY 1),
           ranks AS (SELECT v, ct,
                            2 * (CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) - ct)
                              + ct + 1 AS r2
                     FROM comb),
           tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cell),
           per AS (SELECT g, nn, CAST(SUM(c) AS BIGINT) AS m,
                          SUM(CAST(c AS HUGEINT) * r2 * r2) AS s1_4,
                          SUM(CAST(c AS HUGEINT)
                              * (2 * (nn + 1) - r2) * (2 * (nn + 1) - r2)) AS s2_4
                   FROM cell JOIN ranks USING (v) CROSS JOIN tot
                   GROUP BY 1, 2),
           f AS (SELECT * FROM per WHERE g = 'F')
      SELECT m AS n_f, nn - m AS n_o,
             ROUND((6.0 * CAST(s1_4 AS DOUBLE) / 4.0
                    - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                      * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                   / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                          * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                          * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0), 4) + 0 AS u,
             ROUND((6.0 * CAST(s2_4 AS DOUBLE) / 4.0
                    - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                      * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                   / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                          * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                          * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0), 4) + 0 AS v,
             ROUND(2.0 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0)
                   / ((2.0 * CAST(nn AS DOUBLE) + 1.0)
                      * (8.0 * CAST(nn AS DOUBLE) + 11.0)) - 1.0, 6) + 0 AS rho,
             ROUND((((6.0 * CAST(s1_4 AS DOUBLE) / 4.0
                      - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                        * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                     / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                            * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                            * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0))
                    * ((6.0 * CAST(s1_4 AS DOUBLE) / 4.0
                      - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                        * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                     / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                            * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                            * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0))
                    + ((6.0 * CAST(s2_4 AS DOUBLE) / 4.0
                      - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                        * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                     / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                            * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                            * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0))
                    * ((6.0 * CAST(s2_4 AS DOUBLE) / 4.0
                      - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                        * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                     / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                            * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                            * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0))
                    - 2.0 * (2.0 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0)
                             / ((2.0 * CAST(nn AS DOUBLE) + 1.0)
                                * (8.0 * CAST(nn AS DOUBLE) + 11.0)) - 1.0)
                      * ((6.0 * CAST(s1_4 AS DOUBLE) / 4.0
                        - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                          * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                       / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                              * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                              * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0))
                      * ((6.0 * CAST(s2_4 AS DOUBLE) / 4.0
                        - CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
                          * (2.0 * CAST(nn AS DOUBLE) + 1.0))
                       / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                              * (CAST(nn AS DOUBLE) + 1.0) * (2.0 * CAST(nn AS DOUBLE) + 1.0)
                              * (8.0 * CAST(nn AS DOUBLE) + 11.0) / 5.0)))
                   / (2.0 * (1.0
                      - (2.0 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0)
                         / ((2.0 * CAST(nn AS DOUBLE) + 1.0)
                            * (8.0 * CAST(nn AS DOUBLE) + 11.0)) - 1.0)
                      * (2.0 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0)
                         / ((2.0 * CAST(nn AS DOUBLE) + 1.0)
                            * (8.0 * CAST(nn AS DOUBLE) + 11.0)) - 1.0))), 4) + 0
               AS c_stat
      FROM f""",

    "q_gk_lambda" -> """
      WITH cont AS (SELECT CAST(c_nationkey AS BIGINT) AS x, c_mktsegment AS y,
                           CAST(COUNT(*) AS BIGINT) AS nxy
                    FROM customer GROUP BY 1, 2),
           rm AS (SELECT CAST(SUM(mx) AS BIGINT) AS sum_row_max,
                         CAST(COUNT(*) AS BIGINT) AS k_x
                  FROM (SELECT x, MAX(nxy) AS mx FROM cont GROUP BY 1)),
           cm AS (SELECT CAST(MAX(ny) AS BIGINT) AS max_col,
                         CAST(COUNT(*) AS BIGINT) AS k_y,
                         CAST(SUM(ny) AS BIGINT) AS n
                  FROM (SELECT y, SUM(nxy) AS ny FROM cont GROUP BY 1))
      SELECT n, k_x, k_y, sum_row_max, max_col,
             ROUND(CAST(sum_row_max - max_col AS DOUBLE)
                   / CAST(n - max_col AS DOUBLE), 6) + 0 AS lambda
      FROM rm CROSS JOIN cm""",

    "q_dagostino_k2" -> """
      WITH s AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(d) AS BIGINT) AS s1,
                        SUM(CAST(d AS HUGEINT) * d) AS s2,
                        SUM(CAST(d AS HUGEINT) * d * d) AS s3,
                        SUM(CAST(d AS HUGEINT) * d * d * d) AS s4
                 FROM (SELECT l_returnflag,
                              CAST(ROUND(l_discount*100) AS BIGINT) AS d
                       FROM lineitem)
                 GROUP BY 1),
           m AS (SELECT flag, n,
                        CAST(n AS DOUBLE) AS nd,
                        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                        CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                        CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
                 FROM s),
           mm AS (SELECT flag, n, nd, mean,
                         r2 - mean * mean AS m2,
                         r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
                         r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
                           - 3.0 * mean * mean * mean * mean AS m4
                  FROM m),
           gg AS (SELECT flag, n, nd,
                         m3 / SQRT(m2 * m2 * m2) AS g1,
                         m4 / (m2 * m2) AS b2
                  FROM mm),
           t1 AS (SELECT flag, n, nd, g1, b2,
                         g1 * SQRT((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))) AS y,
                         3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * (nd + 3.0)
                           / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0)) AS beta2
                  FROM gg),
           t2 AS (SELECT flag, n, nd, g1, b2, y,
                         SQRT(2.0 * (beta2 - 1.0)) - 1.0 AS w2
                  FROM t1),
           t3 AS (SELECT flag, n, nd, g1, b2, y, w2,
                         1.0 / SQRT(LN(SQRT(w2))) AS delta,
                         SQRT(2.0 / (w2 - 1.0)) AS alpha
                  FROM t2),
           z1t AS (SELECT flag, n, nd, g1, b2,
                          delta * LN(y / alpha + SQRT((y / alpha) * (y / alpha) + 1.0)) AS z1
                   FROM t3),
           k1 AS (SELECT flag, n, nd, g1, b2, z1,
                         3.0 * (nd - 1.0) / (nd + 1.0) AS eb2,
                         24.0 * nd * (nd - 2.0) * (nd - 3.0)
                           / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0)) AS vb2
                  FROM z1t),
           k2_ AS (SELECT flag, n, nd, g1, b2, z1,
                          (b2 - eb2) / SQRT(vb2) AS x,
                          6.0 * (nd * nd - 5.0 * nd + 2.0)
                            / ((nd + 7.0) * (nd + 9.0))
                            * SQRT(6.0 * (nd + 3.0) * (nd + 5.0)
                                   / (nd * (nd - 2.0) * (nd - 3.0))) AS sb
                   FROM k1),
           k3 AS (SELECT flag, n, g1, b2, z1, x,
                         6.0 + 8.0 / sb * (2.0 / sb + SQRT(1.0 + 4.0 / (sb * sb))) AS a
                  FROM k2_),
           zf AS (SELECT flag, n, g1, b2, z1,
                         ((1.0 - 2.0 / (9.0 * a))
                          - CBRT((1.0 - 2.0 / a)
                                 / (1.0 + x * SQRT(2.0 / (a - 4.0)))))
                           / SQRT(2.0 / (9.0 * a)) AS z2
                  FROM k3)
      SELECT flag, n,
             ROUND(g1, 6) + 0 AS sqrt_b1, ROUND(b2, 6) + 0 AS b2,
             ROUND(z1, 4) + 0 AS z_skew, ROUND(z2, 4) + 0 AS z_kurt,
             ROUND(z1 * z1 + z2 * z2, 4) + 0 AS k2
      FROM zf ORDER BY flag""",

    "q_runs_updown" -> """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1, 2),
           del AS (SELECT event_type, day,
                          rev - LAG(rev) OVER (PARTITION BY event_type ORDER BY day)
                            AS delta
                   FROM daily),
           signs AS (SELECT event_type, day,
                            CASE WHEN delta > 0 THEN 1 ELSE -1 END AS s
                     FROM del WHERE delta IS NOT NULL AND delta <> 0),
           tr AS (SELECT event_type, s,
                         LAG(s) OVER (PARTITION BY event_type ORDER BY day) AS sp
                  FROM signs),
           runs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_deltas,
                           CAST(SUM(CASE WHEN sp IS NOT NULL AND s <> sp
                                         THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
                    FROM tr GROUP BY 1)
      SELECT event_type, n_deltas, n_runs,
             ROUND((CAST(n_runs AS DOUBLE)
                    - (2.0 * CAST(n_deltas AS DOUBLE) - 1.0) / 3.0)
                   / SQRT((16.0 * CAST(n_deltas AS DOUBLE) - 29.0) / 90.0), 4) + 0
               AS z
      FROM runs ORDER BY event_type""",

    "q_tukey_hsd" -> """
      WITH g AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n_g,
                        CAST(SUM(d) AS BIGINT) AS s1,
                        SUM(CAST(d AS HUGEINT) * d) AS s2
                 FROM (SELECT l_returnflag,
                              CAST(ROUND(l_discount*100) AS BIGINT) AS d
                       FROM lineitem)
                 GROUP BY 1),
           mse AS (SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
                          CAST(COUNT(*) AS BIGINT) AS k,
                          SUM(CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                / CAST(n_g AS DOUBLE))
                            / CAST(SUM(n_g) - COUNT(*) AS DOUBLE) AS mse
                   FROM g)
      SELECT a.flag AS flag_i, b.flag AS flag_j,
             a.n_g AS n_i, b.n_g AS n_j,
             ROUND(ABS(CAST(a.s1 AS DOUBLE) / CAST(a.n_g AS DOUBLE)
                       - CAST(b.s1 AS DOUBLE) / CAST(b.n_g AS DOUBLE)), 6) + 0
               AS mean_diff,
             ROUND(ABS(CAST(a.s1 AS DOUBLE) / CAST(a.n_g AS DOUBLE)
                       - CAST(b.s1 AS DOUBLE) / CAST(b.n_g AS DOUBLE))
                   / SQRT(mse / 2.0 * (1.0 / CAST(a.n_g AS DOUBLE)
                                       + 1.0 / CAST(b.n_g AS DOUBLE))), 4) + 0
               AS q_stat
      FROM g a JOIN g b ON a.flag < b.flag CROSS JOIN mse
      ORDER BY flag_i, flag_j""",

    "q_geary_c" -> """
      WITH x0 AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
                         CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sb,
                         CAST(COUNT(*) AS BIGINT) AS nc,
                         CAST(ANY_VALUE(rk) AS BIGINT) AS rk
                  FROM customer
                  JOIN (SELECT n_nationkey, CAST(n_regionkey AS BIGINT) AS rk
                        FROM nation) nn ON c_nationkey = n_nationkey
                  GROUP BY 1),
           x AS (SELECT nk,
                        CAST(CASE WHEN sb >= 0 THEN sb // nc
                                  ELSE -((-sb) // nc) END AS BIGINT) AS x,
                        rk
                 FROM x0),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS sx FROM x),
           den AS (SELECT SUM(CAST(x.x * tot.n - tot.sx AS HUGEINT)
                              * (x.x * tot.n - tot.sx)) AS d4
                   FROM x CROSS JOIN tot),
           num AS (SELECT CAST(COUNT(*) AS BIGINT) AS w,
                          SUM(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x)) AS num
                   FROM x a JOIN x b ON a.rk = b.rk AND a.nk <> b.nk)
      SELECT n, w AS n_pairs,
             ROUND(CAST(n - 1 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(num AS DOUBLE)
                   / (2.0 * CAST(w AS DOUBLE) * CAST(d4 AS DOUBLE)), 6) + 0
               AS geary_c
      FROM tot CROSS JOIN num CROSS JOIN den""",

    "q_tsallis_entropy" -> """
      WITH tok AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
                   FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
                         FROM documents)
                   GROUP BY 1, 2),
           agg AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t,
                          CAST(COUNT(*) AS BIGINT) AS vocab,
                          SUM(CAST(c AS HUGEINT) * c) AS s2,
                          SUM(CAST(c AS HUGEINT) * c * c) AS s3
                   FROM tok GROUP BY 1)
      SELECT lang, t AS n_tokens, vocab,
             ROUND(1.0 - CAST(s2 AS DOUBLE)
                   / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 6) + 0 AS tsallis_q2,
             ROUND((1.0 - CAST(s3 AS DOUBLE)
                    / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)))
                   / 2.0, 6) + 0 AS tsallis_q3
      FROM agg ORDER BY lang""",

    "q_adaboost_round" -> """
      WITH cell AS (SELECT CAST(ROUND(l_discount*100) AS BIGINT) AS d,
                           CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           stumps AS (SELECT t, p FROM range(0, 11) r1(t),
                        (SELECT unnest([CAST(-1 AS BIGINT), CAST(1 AS BIGINT)]) AS p)),
           err AS (SELECT t, p, CAST(SUM(c) AS BIGINT) AS n,
                          CAST(SUM(CASE WHEN (CASE WHEN d >= t THEN p ELSE -p END) <> y
                                        THEN c ELSE 0 END) AS BIGINT) AS e
                   FROM cell CROSS JOIN stumps GROUP BY 1, 2),
           best AS (SELECT * FROM err ORDER BY e, t, p LIMIT 1)
      SELECT CAST(t AS BIGINT) AS threshold, p AS polarity, n, e AS n_err,
             ROUND(CAST(e AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0 AS err_rate,
             ROUND(0.5 * LN((CAST(n AS DOUBLE) - CAST(e AS DOUBLE))
                            / CAST(e AS DOUBLE)), 6) + 0 AS alpha,
             ROUND(2.0 * SQRT(CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
                              * (1.0 - CAST(e AS DOUBLE) / CAST(n AS DOUBLE))), 6)
               + 0 AS z_norm
      FROM best""",

    "q_oee_daily" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_err,
                            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_purch,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS rev
                     FROM events GROUP BY 1),
           best AS (SELECT CAST(MAX(rev) AS BIGINT) AS max_rev FROM daily),
           r AS (SELECT CAST(day AS VARCHAR) AS day, n,
                        (n - n_err) * 1000000 // n AS avail_e6,
                        rev * 1000000 // max_rev AS perf_e6,
                        n_purch * 1000000 // (n_purch + n_err) AS qual_e6
                 FROM daily CROSS JOIN best)
      SELECT day, n, avail_e6, perf_e6, qual_e6,
             ROUND(CAST(avail_e6 AS DOUBLE) * CAST(perf_e6 AS DOUBLE)
                   * CAST(qual_e6 AS DOUBLE) / 1e18, 6) + 0 AS oee
      FROM r ORDER BY day""",

    "q_edit_distance_dedup" -> """
      WITH d AS (SELECT doc_id, lang, n_chars // 8 AS blk,
                        substring(text, 1, 40) AS pfx
                 FROM documents),
           pairs AS (SELECT a.lang,
                            CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
                     FROM d a JOIN d b
                       ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id),
           blocks AS (SELECT lang, CAST(COUNT(DISTINCT blk) AS BIGINT) AS n_blocks
                      FROM d GROUP BY 1),
           agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
                          CAST(SUM(CASE WHEN dist <= 5 THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_near,
                          CAST(SUM(dist) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                            AS mean_dist
                   FROM pairs GROUP BY 1)
      SELECT lang, n_blocks,
             COALESCE(n_cand_pairs, 0) AS n_cand_pairs,
             COALESCE(n_near, 0) AS n_near,
             COALESCE(mean_dist, 0) AS mean_dist
      FROM blocks LEFT JOIN agg USING (lang)
      ORDER BY lang""",

    "q_link_prediction" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
                   FROM edges GROUP BY 1),
           hubs AS (SELECT node AS z, 1000000 // deg AS w_e6 FROM deg),
           pairs AS (SELECT a.u AS z, a.v AS x, b.v AS y FROM edges a JOIN edges b
                     ON a.u = b.u AND a.v < b.v),
           scored AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_common,
                             CAST(SUM(w_e6) AS BIGINT) AS ra_e6
                      FROM pairs JOIN hubs ON pairs.z = hubs.z GROUP BY 1, 2),
           non_edge AS (SELECT * FROM scored s
                        WHERE NOT EXISTS (SELECT 1 FROM e0
                                          WHERE e0.u = s.x AND e0.v = s.y))
      SELECT s.x AS u, s.y AS v, s.n_common, s.ra_e6,
             s.n_common * 1000000 // (dx.deg + dy.deg - s.n_common) AS jaccard_e6,
             CAST(dx.deg * dy.deg AS BIGINT) AS pref_attach
      FROM non_edge s
      JOIN deg dx ON s.x = dx.node
      JOIN deg dy ON s.y = dy.node
      ORDER BY ra_e6 DESC, u, v LIMIT 10""",

    "q_kr20" -> """
      WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                    FROM documents),
           d AS (SELECT doc_id,
                        CAST(LENGTH(tk) AS BIGINT) AS nw,
                        CAST(list_sum(list_transform(tk, t -> LENGTH(t))) AS BIGINT) AS nc,
                        CAST(list_sum(list_transform(tk,
                          t -> CASE WHEN t IN ('the', 'a') THEN 1 ELSE 0 END)) AS BIGINT) AS stop_hits,
                        CAST(LENGTH(list_distinct(tk)) AS BIGINT) AS nd,
                        unnest(tk) AS w
                 FROM base),
           wc AS (SELECT doc_id, nw, nc, stop_hits, nd, w,
                         CAST(COUNT(*) AS BIGINT) AS wcnt
                  FROM d GROUP BY 1, 2, 3, 4, 5, 6),
           docs AS (SELECT doc_id, nw, nc, stop_hits, nd, MAX(wcnt) AS maxw
                    FROM wc GROUP BY 1, 2, 3, 4, 5),
           items AS (SELECT doc_id,
                            CASE WHEN nw >= 30 THEN 1 ELSE 0 END AS i1,
                            CASE WHEN nc >= nw * 3 AND nc <= nw * 10 THEN 1 ELSE 0 END AS i2,
                            CASE WHEN maxw * 100 <= nw * 15 THEN 1 ELSE 0 END AS i3,
                            CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS i4,
                            CASE WHEN nd * 10 >= nw * 4 THEN 1 ELSE 0 END AS i5
                     FROM docs),
           t AS (SELECT i1, i2, i3, i4, i5, i1 + i2 + i3 + i4 + i5 AS t FROM items),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(i1) AS BIGINT) AS c1, CAST(SUM(i2) AS BIGINT) AS c2,
                        CAST(SUM(i3) AS BIGINT) AS c3, CAST(SUM(i4) AS BIGINT) AS c4,
                        CAST(SUM(i5) AS BIGINT) AS c5,
                        CAST(SUM(t) AS BIGINT) AS st,
                        CAST(SUM(t * t) AS BIGINT) AS stt
                 FROM t)
      SELECT n, c1, c2, c3, c4, c5,
             CASE WHEN n * stt - st * st > 0 THEN
               ROUND(1.25 * (1.0
                     - CAST(c1 * (n - c1) + c2 * (n - c2) + c3 * (n - c3)
                            + c4 * (n - c4) + c5 * (n - c5) AS DOUBLE)
                       / CAST(n * stt - st * st AS DOUBLE)), 6) + 0 END AS kr20
      FROM s""",

    "q_split_half" -> """
      WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                    FROM documents),
           d AS (SELECT doc_id,
                        CAST(LENGTH(tk) AS BIGINT) AS nw,
                        CAST(list_sum(list_transform(tk, t -> LENGTH(t))) AS BIGINT) AS nc,
                        CAST(list_sum(list_transform(tk,
                          t -> CASE WHEN t IN ('the', 'a') THEN 1 ELSE 0 END)) AS BIGINT) AS stop_hits,
                        CAST(LENGTH(list_distinct(tk)) AS BIGINT) AS nd,
                        unnest(tk) AS w
                 FROM base),
           wc AS (SELECT doc_id, nw, nc, stop_hits, nd, w,
                         CAST(COUNT(*) AS BIGINT) AS wcnt
                  FROM d GROUP BY 1, 2, 3, 4, 5, 6),
           docs AS (SELECT doc_id, nw, nc, stop_hits, nd, MAX(wcnt) AS maxw
                    FROM wc GROUP BY 1, 2, 3, 4, 5),
           h AS (SELECT (CASE WHEN nw >= 30 THEN 1 ELSE 0 END
                         + CASE WHEN maxw * 100 <= nw * 15 THEN 1 ELSE 0 END
                         + CASE WHEN nd * 10 >= nw * 4 THEN 1 ELSE 0 END) AS a,
                        (CASE WHEN nc >= nw * 3 AND nc <= nw * 10 THEN 1 ELSE 0 END
                         + CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END) AS b
                 FROM docs),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
                        CAST(SUM(a * a) AS BIGINT) AS saa,
                        CAST(SUM(b * b) AS BIGINT) AS sbb,
                        CAST(SUM(a * b) AS BIGINT) AS sab
                 FROM h)
      SELECT n,
             CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
               ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                     / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                            * CAST(n * sbb - sb * sb AS DOUBLE)), 6) + 0 END
               AS r_halves,
             CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0 THEN
               ROUND(2.0 * (CAST(n * sab - sa * sb AS DOUBLE)
                            / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                                   * CAST(n * sbb - sb * sb AS DOUBLE)))
                     / (1.0 + (CAST(n * sab - sa * sb AS DOUBLE)
                               / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                                      * CAST(n * sbb - sb * sb AS DOUBLE)))), 6) + 0
               END AS spearman_brown
      FROM s""",

    "q_item_total" -> """
      WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                    FROM documents),
           d AS (SELECT doc_id,
                        CAST(LENGTH(tk) AS BIGINT) AS nw,
                        CAST(list_sum(list_transform(tk, t -> LENGTH(t))) AS BIGINT) AS nc,
                        CAST(list_sum(list_transform(tk,
                          t -> CASE WHEN t IN ('the', 'a') THEN 1 ELSE 0 END)) AS BIGINT) AS stop_hits,
                        CAST(LENGTH(list_distinct(tk)) AS BIGINT) AS nd,
                        unnest(tk) AS w
                 FROM base),
           wc AS (SELECT doc_id, nw, nc, stop_hits, nd, w,
                         CAST(COUNT(*) AS BIGINT) AS wcnt
                  FROM d GROUP BY 1, 2, 3, 4, 5, 6),
           docs AS (SELECT doc_id, nw, nc, stop_hits, nd, MAX(wcnt) AS maxw
                    FROM wc GROUP BY 1, 2, 3, 4, 5),
           items AS (SELECT doc_id,
                            CASE WHEN nw >= 30 THEN 1 ELSE 0 END AS i1,
                            CASE WHEN nc >= nw * 3 AND nc <= nw * 10 THEN 1 ELSE 0 END AS i2,
                            CASE WHEN maxw * 100 <= nw * 15 THEN 1 ELSE 0 END AS i3,
                            CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS i4,
                            CASE WHEN nd * 10 >= nw * 4 THEN 1 ELSE 0 END AS i5
                     FROM docs),
           long_ AS (SELECT item, x,
                            (i1 + i2 + i3 + i4 + i5) - x AS y
                     FROM (SELECT i1, i2, i3, i4, i5,
                                  unnest(['i1', 'i2', 'i3', 'i4', 'i5']) AS item,
                                  unnest([i1, i2, i3, i4, i5]) AS x
                           FROM items)),
           s AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        CAST(SUM(x * x) AS BIGINT) AS sxx,
                        CAST(SUM(y * y) AS BIGINT) AS syy,
                        CAST(SUM(x * y) AS BIGINT) AS sxy
                 FROM long_ GROUP BY 1)
      SELECT item, n, sx * 1000000 // n AS p_e6,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0 END
               AS r_item_rest
      FROM s ORDER BY item""",

    "q_readability_battery" -> """
      WITH d AS (SELECT lang, string_split(lower(text), ' ') AS tk, text
                 FROM documents),
           c AS (SELECT lang,
                        CAST(LENGTH(tk) AS BIGINT) AS w,
                        CAST(list_sum(list_transform(tk, t -> LENGTH(t))) AS BIGINT) AS ch,
                        CAST(LENGTH(regexp_extract_all(text, '[.!?]+')) + 1 AS BIGINT) AS s,
                        CAST(list_sum(list_transform(tk,
                          t -> CASE WHEN LENGTH(t) > 6 THEN 1 ELSE 0 END)) AS BIGINT) AS lw
                 FROM d),
           agg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                          CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(ch) AS BIGINT) AS tc,
                          CAST(SUM(s) AS BIGINT) AS ts, CAST(SUM(lw) AS BIGINT) AS tlw
                   FROM c GROUP BY 1)
      SELECT lang, n_docs, tw AS n_words,
             ROUND(0.0588 * (CAST(tc AS DOUBLE) / CAST(tw AS DOUBLE) * 100.0)
                   - 0.296 * (CAST(ts AS DOUBLE) / CAST(tw AS DOUBLE) * 100.0)
                   - 15.8, 4) + 0 AS coleman_liau,
             ROUND(4.71 * (CAST(tc AS DOUBLE) / CAST(tw AS DOUBLE))
                   + 0.5 * (CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE))
                   - 21.43, 4) + 0 AS ari,
             ROUND(CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE)
                   + 100.0 * CAST(tlw AS DOUBLE) / CAST(tw AS DOUBLE), 4) + 0 AS lix
      FROM agg ORDER BY lang""",

    "q_hosmer_lemeshow" -> """
      WITH m AS (SELECT label,
                        CAST(list_sum(list_transform(embedding[1:8],
                          v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT))) AS BIGINT) AS s_e7
                 FROM embeddings),
           p AS (SELECT label,
                        CAST(ROUND((0.5 + (CAST(s_e7 AS DOUBLE) / 1e7)
                                    / (2.0 * (1.0 + ABS(CAST(s_e7 AS DOUBLE) / 1e7)))) * 1e6)
                          AS BIGINT) AS p_e6
                 FROM m),
           b AS (SELECT label, p_e6, LEAST(9, p_e6 // 100000) AS bin FROM p),
           g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(p_e6) AS BIGINT) AS sp,
                        CAST(SUM(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_pos
                 FROM b GROUP BY 1),
           t AS (SELECT bin,
                        CAST(ROUND(
                          (CAST(n_pos AS DOUBLE)
                           - CAST(n AS DOUBLE) * (CAST(sp AS DOUBLE)
                                                  / (CAST(n AS DOUBLE) * 1e6)))
                          * (CAST(n_pos AS DOUBLE)
                             - CAST(n AS DOUBLE) * (CAST(sp AS DOUBLE)
                                                    / (CAST(n AS DOUBLE) * 1e6)))
                          / ((CAST(n AS DOUBLE) * (CAST(sp AS DOUBLE)
                                                   / (CAST(n AS DOUBLE) * 1e6)))
                             * (1.0 - CAST(sp AS DOUBLE)
                                      / (CAST(n AS DOUBLE) * 1e6))) * 1e8)
                          AS BIGINT) AS t_e8
                 FROM g)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
             CAST(COUNT(*) - 2 AS BIGINT) AS df,
             ROUND(CAST(SUM(t_e8) AS DOUBLE) / 1e8, 4) + 0 AS hl_chi2
      FROM t""",

    "q_dunnett_control" -> """
      WITH g AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n_g,
                        CAST(SUM(d) AS BIGINT) AS s1,
                        SUM(CAST(d AS HUGEINT) * d) AS s2
                 FROM (SELECT l_returnflag,
                              CAST(ROUND(l_discount*100) AS BIGINT) AS d
                       FROM lineitem)
                 GROUP BY 1),
           mse AS (SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
                          CAST(COUNT(*) AS BIGINT) AS k,
                          SUM(CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                / CAST(n_g AS DOUBLE))
                            / CAST(SUM(n_g) - COUNT(*) AS DOUBLE) AS mse
                   FROM g),
           ctrl AS (SELECT n_g AS n_c, s1 AS s1_c FROM g WHERE flag = 'N')
      SELECT flag, n_g AS n_i, n_c,
             ROUND(CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)
                   - CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) + 0 AS mean_diff,
             ROUND((CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)
                    - CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                   / SQRT(mse * (1.0 / CAST(n_g AS DOUBLE)
                                 + 1.0 / CAST(n_c AS DOUBLE))), 4) + 0 AS t_stat
      FROM g CROSS JOIN ctrl CROSS JOIN mse
      WHERE flag <> 'N'
      ORDER BY flag""",

    "q_games_howell" -> """
      WITH g0 AS (SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n_g,
                         CAST(SUM(d) AS BIGINT) AS s1,
                         SUM(CAST(d AS HUGEINT) * d) AS s2
                  FROM (SELECT l_returnflag,
                               CAST(ROUND(l_discount*100) AS BIGINT) AS d
                        FROM lineitem)
                  GROUP BY 1),
           g AS (SELECT flag, n_g, s1,
                        (CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n_g AS DOUBLE))
                          / CAST(n_g - 1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS v
                 FROM g0)
      SELECT a.flag AS flag_i, b.flag AS flag_j,
             ROUND(ABS(CAST(a.s1 AS DOUBLE) / CAST(a.n_g AS DOUBLE)
                       - CAST(b.s1 AS DOUBLE) / CAST(b.n_g AS DOUBLE))
                   / SQRT(a.v + b.v), 4) + 0 AS t_stat,
             ROUND((a.v + b.v) * (a.v + b.v)
                   / (a.v * a.v / CAST(a.n_g - 1 AS DOUBLE)
                      + b.v * b.v / CAST(b.n_g - 1 AS DOUBLE)), 4) + 0 AS df_welch,
             ROUND((ABS(CAST(a.s1 AS DOUBLE) / CAST(a.n_g AS DOUBLE)
                        - CAST(b.s1 AS DOUBLE) / CAST(b.n_g AS DOUBLE))
                    / SQRT(a.v + b.v)) * SQRT(2.0), 4) + 0 AS q_stat
      FROM g a JOIN g b ON a.flag < b.flag
      ORDER BY flag_i, flag_j""",

    "q_brunner_munzel" -> """
      WITH cell AS (SELECT l_linestatus AS g, CAST(l_quantity AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           comb AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM cell GROUP BY 1),
           ranks AS (SELECT v,
                            2 * (CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) - ct)
                              + ct + 1 AS r2
                     FROM comb),
           within AS (SELECT g, v,
                             2 * (CAST(SUM(c) OVER (PARTITION BY g ORDER BY v)
                                    AS BIGINT) - c) + c + 1 AS r2g
                      FROM cell),
           base AS (SELECT cell.g, cell.v, cell.c, ranks.r2, within.r2g
                    FROM cell JOIN ranks USING (v) JOIN within
                      ON cell.g = within.g AND cell.v = within.v),
           gs AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g,
                         CAST(SUM(c * r2) AS BIGINT) AS sr2
                  FROM base GROUP BY 1),
           dev AS (SELECT base.g,
                          SUM(CAST(base.c AS HUGEINT)
                              * (gs.n_g * (base.r2 - base.r2g) - gs.sr2
                                 + gs.n_g * (gs.n_g + 1))
                              * (gs.n_g * (base.r2 - base.r2g) - gs.sr2
                                 + gs.n_g * (gs.n_g + 1))) AS sdd
                   FROM base JOIN gs ON base.g = gs.g GROUP BY 1),
           st AS (SELECT gs.g, gs.n_g, gs.sr2,
                         CAST(sdd AS DOUBLE)
                           / (4.0 * CAST(gs.n_g AS DOUBLE) * CAST(gs.n_g AS DOUBLE)
                              * CAST(gs.n_g - 1 AS DOUBLE)) AS v_g
                  FROM gs JOIN dev ON gs.g = dev.g),
           f AS (SELECT n_g AS n1, sr2 AS sr1, v_g AS v1 FROM st WHERE g = 'F'),
           o AS (SELECT n_g AS n2, sr2 AS sr2o, v_g AS v2 FROM st WHERE g = 'O')
      SELECT n1, n2,
             ROUND((CAST(sr2o AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE))
                    - (CAST(n2 AS DOUBLE) + 1.0) / 2.0) / CAST(n1 AS DOUBLE), 6)
               + 0 AS p_hat,
             ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   * (CAST(sr2o AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE))
                      - CAST(sr1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)))
                   / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                   / SQRT(CAST(n1 AS DOUBLE) * v1 + CAST(n2 AS DOUBLE) * v2), 4)
               + 0 AS w_stat,
             ROUND((CAST(n1 AS DOUBLE) * v1 + CAST(n2 AS DOUBLE) * v2)
                   * (CAST(n1 AS DOUBLE) * v1 + CAST(n2 AS DOUBLE) * v2)
                   / ((CAST(n1 AS DOUBLE) * v1) * (CAST(n1 AS DOUBLE) * v1)
                      / (CAST(n1 AS DOUBLE) - 1.0)
                      + (CAST(n2 AS DOUBLE) * v2) * (CAST(n2 AS DOUBLE) * v2)
                        / (CAST(n2 AS DOUBLE) - 1.0)), 4) + 0 AS df_bm
      FROM f CROSS JOIN o""",

    "q_source_overlap" -> """
      WITH fp AS (SELECT source,
                         md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS pfp,
                         CAST(COUNT(*) AS BIGINT) AS nd
                  FROM documents GROUP BY 1, 2)
      SELECT a.source AS source, b.source AS source2,
             CAST(COUNT(*) AS BIGINT) AS n_shared_fps,
             CAST(SUM(a.nd * b.nd) AS BIGINT) AS n_cross_pairs
      FROM fp a JOIN fp b ON a.pfp = b.pfp AND a.source < b.source
      GROUP BY 1, 2 ORDER BY source, source2""",

    "q_length_filter_sweep" -> """
      WITH lat AS (SELECT CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT) AS nw,
                          CAST(COUNT(*) AS BIGINT) AS nd
                   FROM documents GROUP BY 1),
           tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS td,
                          CAST(SUM(nd * nw) AS BIGINT) AS tt FROM lat),
           thr AS (SELECT t * 10 AS t FROM range(1, 11) r(t)),
           kept AS (SELECT t, CAST(SUM(nd) AS BIGINT) AS docs_kept,
                           CAST(SUM(nd * nw) AS BIGINT) AS tokens_kept
                    FROM lat CROSS JOIN thr WHERE nw >= t GROUP BY 1)
      SELECT CAST(t AS BIGINT) AS t, docs_kept,
             docs_kept * 1000000 // td AS docs_share_e6,
             tokens_kept, tokens_kept * 1000000 // tt AS tokens_share_e6
      FROM kept CROSS JOIN tot ORDER BY t""",

    "q_packing_efficiency" -> """
      WITH d AS (SELECT lang,
                        CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT) AS nw
                 FROM documents),
           g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(nw) AS BIGINT) AS tokens,
                        CAST(SUM((nw + 511) // 512) AS BIGINT) AS seqs_padded,
                        CAST(SUM((nw + 511) // 512 * 512 - nw) AS BIGINT) AS pad_waste
                 FROM d GROUP BY 1)
      SELECT lang, n_docs, tokens, seqs_padded, pad_waste,
             pad_waste * 1000000 // (seqs_padded * 512) AS waste_share_e6,
             (tokens + 511) // 512 AS seqs_packed_lb,
             (seqs_padded - (tokens + 511) // 512) * 1000000 // seqs_padded
               AS packing_gain_e6
      FROM g ORDER BY lang""",

    "q_span_corruption_plan" -> """
      WITH tok AS (SELECT doc_id, lang,
                          generate_subscripts(tk, 1) - 1 AS pos
                   FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS tk
                         FROM documents)),
           t2 AS (SELECT lang,
                         CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(pos AS VARCHAR)), 1, 8) AS BIGINT) % 20 = 0
                              THEN 1 ELSE 0 END AS starts,
                         CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(pos AS VARCHAR)), 1, 8) AS BIGINT) % 20 = 0
                                OR (pos >= 1 AND CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(pos - 1 AS VARCHAR)), 1, 8) AS BIGINT) % 20 = 0)
                                OR (pos >= 2 AND CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(pos - 2 AS VARCHAR)), 1, 8) AS BIGINT) % 20 = 0)
                              THEN 1 ELSE 0 END AS masked
                  FROM tok)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS tokens,
             CAST(SUM(starts) AS BIGINT) AS spans,
             CAST(SUM(masked) AS BIGINT) AS masked,
             CAST(SUM(masked) AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)
               AS mask_rate_e6
      FROM t2 GROUP BY 1 ORDER BY lang""",

    "q_vocab_prune_sweep" -> """
      WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
           wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
           coc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM wc GROUP BY 1),
           tot AS (SELECT CAST(SUM(m) AS BIGINT) AS tv,
                          CAST(SUM(c * m) AS BIGINT) AS tt FROM coc),
           thr AS (SELECT CAST(1 << CAST(f AS INT) AS BIGINT) AS f
                   FROM range(0, 6) r(f)),
           kept AS (SELECT f, CAST(SUM(m) AS BIGINT) AS vocab_kept,
                           CAST(SUM(c * m) AS BIGINT) AS tokens_covered
                    FROM coc CROSS JOIN thr WHERE c >= f GROUP BY 1)
      SELECT f AS min_freq, vocab_kept,
             vocab_kept * 1000000 // tv AS vocab_share_e6,
             tokens_covered, tokens_covered * 1000000 // tt AS coverage_e6
      FROM kept CROSS JOIN tot ORDER BY min_freq""",

    "q_shard_balance" -> """
      WITH s AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nd,
                        CAST(SUM(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1, 2),
           g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_shards,
                        CAST(SUM(nd) AS BIGINT) AS n_docs,
                        CAST(SUM(chars) AS BIGINT) AS tot_chars,
                        CAST(MAX(chars) AS BIGINT) AS max_chars
                 FROM s GROUP BY 1)
      SELECT lang, n_shards, n_docs, tot_chars, max_chars,
             tot_chars // n_shards AS mean_chars,
             max_chars * 1000000 // (tot_chars // n_shards) AS skew_ratio_e6
      FROM g ORDER BY lang""",

    "q_markov_absorption" -> """
      WITH s AS (SELECT user_id, event_type,
                        LEAD(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS dst
                 FROM events),
           c AS (SELECT event_type AS src, dst, CAST(COUNT(*) AS BIGINT) AS c
                 FROM s WHERE dst IS NOT NULL GROUP BY 1, 2),
           trans AS (SELECT src, dst,
                            CAST(c * 1000000
                              // CAST(SUM(c) OVER (PARTITION BY src) AS BIGINT)
                              AS BIGINT) AS p_e6
                     FROM c),
           a1 AS (SELECT src, p_e6 AS a1_e6 FROM trans WHERE dst = 'purchase'),
           a2i AS (SELECT t.src, CAST(SUM(t.p_e6 * COALESCE(a.a1_e6, 0)) AS BIGINT)
                            AS ind_e12
                   FROM trans t LEFT JOIN a1 a ON t.dst = a.src
                   WHERE t.dst <> 'purchase' GROUP BY 1),
           a2 AS (SELECT COALESCE(i.src, a.src) AS src,
                         COALESCE(a.a1_e6, 0) + COALESCE(i.ind_e12, 0) // 1000000
                           AS a2_e6
                  FROM a2i i FULL OUTER JOIN a1 a ON i.src = a.src),
           a3i AS (SELECT t.src, CAST(SUM(t.p_e6 * COALESCE(a.a2_e6, 0)) AS BIGINT)
                            AS ind_e12
                   FROM trans t LEFT JOIN a2 a ON t.dst = a.src
                   WHERE t.dst <> 'purchase' GROUP BY 1),
           a3 AS (SELECT COALESCE(i.src, a.src) AS src,
                         COALESCE(a.a1_e6, 0) + COALESCE(i.ind_e12, 0) // 1000000
                           AS a3_e6
                  FROM a3i i FULL OUTER JOIN a1 a ON i.src = a.src)
      SELECT COALESCE(a1.src, a2.src, a3.src) AS src,
             CAST(COALESCE(a1_e6, 0) AS BIGINT) AS p1_e6,
             CAST(a2_e6 AS BIGINT) AS a2_e6, CAST(a3_e6 AS BIGINT) AS a3_e6
      FROM a1 FULL OUTER JOIN a2 ON a1.src = a2.src
              FULL OUTER JOIN a3 ON COALESCE(a1.src, a2.src) = a3.src
      ORDER BY src""",

    "q_hawkes_branching" -> """
      WITH s AS (SELECT event_type,
                        epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS gap
                 FROM events),
           g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_with_prev,
                        CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60000000
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_triggered
                 FROM s GROUP BY 1)
      SELECT event_type, n, n_with_prev, n_triggered,
             n_triggered * 1000000 // n_with_prev AS branching_e6
      FROM g ORDER BY event_type""",

    "q_ktruss_step" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v FROM items a JOIN items b
                  ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           support AS (SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS support
                       FROM e0 e
                       JOIN edges a ON e.u = a.u
                       JOIN edges b ON e.v = b.u AND a.v = b.v
                       GROUP BY 1, 2),
           h AS (SELECT COALESCE(s.support, 0) AS support
                 FROM e0 LEFT JOIN support s ON e0.u = s.u AND e0.v = s.v)
      SELECT CAST(support AS BIGINT) AS support,
             CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(CASE WHEN support >= 2 THEN 1 ELSE 0 END AS BIGINT) AS kept_k4
      FROM h GROUP BY support ORDER BY support""",

    "q_adf_stat" -> """
      WITH rev AS (SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS BIGINT) AS m,
                          CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
           pairs AS (SELECT b.rev AS x, a.rev - b.rev AS y
                     FROM rev a JOIN rev b ON a.m = b.m + 1),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                        SUM(CAST(x AS HUGEINT) * x) AS sxx,
                        SUM(CAST(x AS HUGEINT) * y) AS sxy,
                        SUM(CAST(y AS HUGEINT) * y) AS syy
                 FROM pairs)
      SELECT n AS n_obs,
             ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0 AS beta,
             ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   / SQRT((CAST(syy AS DOUBLE)
                           - ((CAST(sy AS DOUBLE)
                               - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
                             * CAST(sy AS DOUBLE)
                           - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                             * CAST(sxy AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 2.0) * CAST(n AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 4) + 0
               AS df_t
      FROM s""",

    "q_max_drawdown" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                     FROM events GROUP BY 1),
           cum AS (SELECT t.day, CAST(SUM(p.x) AS BIGINT) AS c
                   FROM daily t JOIN daily p ON p.day <= t.day
                   GROUP BY 1),
           dd AS (SELECT t.day, t.c, CAST(MAX(p.c) AS BIGINT) AS peak
                  FROM cum t JOIN cum p ON p.day <= t.day
                  GROUP BY 1, 2),
           d2 AS (SELECT day, peak - c AS dd_cents,
                         (peak - c) * 1000000 // peak AS dd_pct_e6
                  FROM dd)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(dd_cents) AS BIGINT) AS max_dd_cents,
             CAST(MAX(dd_pct_e6) AS BIGINT) AS max_dd_pct_e6,
             ROUND(SQRT(CAST(SUM(dd_pct_e6 * dd_pct_e6) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) / 1e6, 6) + 0 AS ulcer_index
      FROM d2""",

    "q_omega_ratio" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                            CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
                     FROM events GROUP BY 1),
           tau AS (SELECT CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS tau
                   FROM daily)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(tau) AS BIGINT) AS tau_cents,
             CAST(SUM(GREATEST(x - tau, 0)) AS BIGINT) AS gains_cents,
             CAST(SUM(GREATEST(tau - x, 0)) AS BIGINT) AS losses_cents,
             ROUND(CAST(SUM(GREATEST(x - tau, 0)) AS DOUBLE)
                   / CAST(SUM(GREATEST(tau - x, 0)) AS DOUBLE), 6) + 0 AS omega
      FROM daily CROSS JOIN tau""",

    "q_horvitz_thompson" -> """
      WITH d AS (SELECT doc_id,
                        CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT) AS nw
                 FROM documents),
           b AS (SELECT doc_id, nw, LEAST(nw // 100, 4) AS band FROM d),
           s AS (SELECT doc_id, nw, band,
                        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % (band + 2) = 0 AS sampled
                 FROM b)
      SELECT CAST(band AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
             CAST(SUM(nw) AS BIGINT) AS true_tokens,
             CAST(SUM(CASE WHEN sampled THEN nw * (band + 2) ELSE 0 END) AS BIGINT)
               AS ht_tokens,
             (CAST(SUM(CASE WHEN sampled THEN nw * (band + 2) ELSE 0 END) AS BIGINT)
              - CAST(SUM(nw) AS BIGINT)) * 1000000 // CAST(SUM(nw) AS BIGINT)
               AS err_e6
      FROM s GROUP BY band ORDER BY band""",

    "q_matryoshka_recall" -> """
      WITH m AS (SELECT vec_id,
                        list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE)*1e7) AS BIGINT)) AS qe
                 FROM embeddings),
           q AS (SELECT vec_id AS qid, qe AS q_qe FROM m WHERE vec_id < 20),
           cand AS (SELECT qid, vec_id AS tid,
                           CAST(list_sum(list_transform(list_zip(qe, q_qe),
                                p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d_full,
                           CAST(list_sum(list_transform(list_zip(qe[1:8], q_qe[1:8]),
                                p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d8,
                           CAST(list_sum(list_transform(list_zip(qe[1:16], q_qe[1:16]),
                                p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d16,
                           CAST(list_sum(list_transform(list_zip(qe[1:32], q_qe[1:32]),
                                p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d32
                    FROM m CROSS JOIN q WHERE vec_id >= 20),
           full_ AS (SELECT qid, tid FROM
                       (SELECT qid, tid, ROW_NUMBER() OVER (PARTITION BY qid
                          ORDER BY d_full, tid) AS rn FROM cand)
                     WHERE rn <= 5),
           o8 AS (SELECT CAST(8 AS BIGINT) AS prefix_dims,
                         CAST(COUNT(*) AS BIGINT) AS n_hit
                  FROM (SELECT qid, tid FROM
                          (SELECT qid, tid, ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY d8, tid) AS rn FROM cand)
                        WHERE rn <= 5) t JOIN full_ USING (qid, tid)),
           o16 AS (SELECT CAST(16 AS BIGINT) AS prefix_dims,
                          CAST(COUNT(*) AS BIGINT) AS n_hit
                   FROM (SELECT qid, tid FROM
                           (SELECT qid, tid, ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY d16, tid) AS rn FROM cand)
                         WHERE rn <= 5) t JOIN full_ USING (qid, tid)),
           o32 AS (SELECT CAST(32 AS BIGINT) AS prefix_dims,
                          CAST(COUNT(*) AS BIGINT) AS n_hit
                   FROM (SELECT qid, tid FROM
                           (SELECT qid, tid, ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY d32, tid) AS rn FROM cand)
                         WHERE rn <= 5) t JOIN full_ USING (qid, tid)),
           u AS (SELECT * FROM o8 UNION ALL SELECT * FROM o16
                 UNION ALL SELECT * FROM o32)
      SELECT prefix_dims, n_hit, n_hit * 1000000 // 100 AS recall_e6
      FROM u ORDER BY prefix_dims""",

    "q_lepage_test" -> """
      WITH cell AS (SELECT l_linestatus AS g, CAST(l_quantity AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           comb AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM cell GROUP BY 1),
           tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cell),
           scores AS (SELECT v,
                             2 * (CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) - ct)
                               + ct + 1 AS r2,
                             LEAST(2 * (CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) - ct)
                                     + ct + 1,
                                   2 * (nn + 1)
                                     - (2 * (CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) - ct)
                                        + ct + 1)) AS a2
                      FROM comb CROSS JOIN tot),
           base AS (SELECT cell.g, cell.c, scores.r2, scores.a2
                    FROM cell JOIN scores USING (v)),
           pop AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
                          SUM(CAST(c AS HUGEINT) * r2) AS sr,
                          SUM(CAST(c AS HUGEINT) * r2 * r2) AS srr,
                          SUM(CAST(c AS HUGEINT) * a2) AS sa,
                          SUM(CAST(c AS HUGEINT) * a2 * a2) AS saa
                   FROM base),
           f AS (SELECT CAST(SUM(c) AS BIGINT) AS m,
                        SUM(CAST(c AS HUGEINT) * r2) AS tw,
                        SUM(CAST(c AS HUGEINT) * a2) AS ta
                 FROM base WHERE g = 'F')
      SELECT m AS n_f, nn - m AS n_o,
             ROUND((CAST(tw AS DOUBLE) - CAST(m AS DOUBLE)
                    * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)))
                   / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                          * (CAST(srr AS DOUBLE) - CAST(nn AS DOUBLE)
                             * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE))
                             * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)))
                          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))), 4) + 0
               AS z_wilcoxon,
             ROUND((CAST(ta AS DOUBLE) - CAST(m AS DOUBLE)
                    * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE)))
                   / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                          * (CAST(saa AS DOUBLE) - CAST(nn AS DOUBLE)
                             * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
                             * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE)))
                          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))), 4) + 0
               AS z_ansari,
             ROUND(((CAST(tw AS DOUBLE) - CAST(m AS DOUBLE)
                     * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)))
                    / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                           * (CAST(srr AS DOUBLE) - CAST(nn AS DOUBLE)
                              * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE))
                              * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)))
                           / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))))
                   * ((CAST(tw AS DOUBLE) - CAST(m AS DOUBLE)
                     * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)))
                    / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                           * (CAST(srr AS DOUBLE) - CAST(nn AS DOUBLE)
                              * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE))
                              * (CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)))
                           / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))))
                   + ((CAST(ta AS DOUBLE) - CAST(m AS DOUBLE)
                     * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE)))
                    / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                           * (CAST(saa AS DOUBLE) - CAST(nn AS DOUBLE)
                              * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
                              * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE)))
                           / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))))
                   * ((CAST(ta AS DOUBLE) - CAST(m AS DOUBLE)
                     * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE)))
                    / SQRT(CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
                           * (CAST(saa AS DOUBLE) - CAST(nn AS DOUBLE)
                              * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
                              * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE)))
                           / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))), 4)
               + 0 AS lepage_l
      FROM pop CROSS JOIN f""",

    "q_winsorized_mean" -> """
      WITH cell AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           cum AS (SELECT g, v, c,
                          CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
                            AS cum
                   FROM cell),
           ng AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM cell GROUP BY 1),
           lo AS (SELECT cum.g, CAST(MIN(v) AS BIGINT) AS lo
                  FROM cum JOIN ng ON cum.g = ng.g
                  WHERE cum * 10 >= n_g GROUP BY 1),
           hi AS (SELECT cum.g, CAST(MIN(v) AS BIGINT) AS hi
                  FROM cum JOIN ng ON cum.g = ng.g
                  WHERE cum * 10 >= n_g * 9 GROUP BY 1),
           w AS (SELECT cell.g, CAST(SUM(c) AS BIGINT) AS n,
                        CAST(SUM(c * GREATEST(LEAST(v, hi), lo)) AS BIGINT) AS sw
                 FROM cell JOIN lo ON cell.g = lo.g JOIN hi ON cell.g = hi.g
                 GROUP BY 1)
      SELECT w.g AS flag, n, lo AS p10_clamp, hi AS p90_clamp,
             ROUND(CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0
               AS winsorized_mean
      FROM w JOIN lo ON w.g = lo.g JOIN hi ON w.g = hi.g
      ORDER BY flag""",

    "q_quartile_dispersion" -> """
      WITH cell AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1),
           cum AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum
                   FROM cell),
           n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell),
           q1 AS (SELECT CAST(MIN(v) AS BIGINT) AS q1 FROM cum CROSS JOIN n
                  WHERE cum * 4 >= n),
           q2 AS (SELECT CAST(MIN(v) AS BIGINT) AS q2 FROM cum CROSS JOIN n
                  WHERE cum * 4 >= n * 2),
           q3 AS (SELECT CAST(MIN(v) AS BIGINT) AS q3 FROM cum CROSS JOIN n
                  WHERE cum * 4 >= n * 3)
      SELECT q1, q2, q3,
             ROUND(CAST(q3 - q1 AS DOUBLE) / CAST(q3 + q1 AS DOUBLE), 6) + 0 AS qcd,
             ROUND(CAST(q1 + q3 AS DOUBLE) / 2.0, 4) + 0 AS midhinge,
             ROUND(CAST(q1 + 2 * q2 + q3 AS DOUBLE) / 4.0, 4) + 0 AS trimean
      FROM q1 CROSS JOIN q2 CROSS JOIN q3""",

    "q_doc_entropy_filter" -> """
      WITH d AS (SELECT doc_id, source,
                        CAST(LENGTH(string_split(lower(text), ' ')) AS BIGINT) AS n,
                        unnest(string_split(lower(text), ' ')) AS w
                 FROM documents),
           terms AS (SELECT doc_id, source, n, w, CAST(COUNT(*) AS BIGINT) AS c
                     FROM d GROUP BY 1, 2, 3, 4),
           t2 AS (SELECT doc_id, source, n,
                         CAST(ROUND(CAST(c AS DOUBLE)
                              * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e8)
                           AS BIGINT) AS t_e8
                  FROM terms),
           docs AS (SELECT doc_id, source, n,
                           -CAST(SUM(t_e8) AS BIGINT) AS s_e8
                    FROM t2 GROUP BY 1, 2, 3),
           h AS (SELECT source,
                        CAST(ROUND(CAST(s_e8 AS DOUBLE)
                             / (CAST(n AS DOUBLE) * 1e8) * 1e4) AS BIGINT) AS h_e4
                 FROM docs)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN h_e4 < 15000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_entropy,
             CAST(SUM(h_e4) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_h_e4
      FROM h GROUP BY 1 ORDER BY source""",

    "q_sprt_monitor" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
                            CAST(SUM(CASE WHEN event_type = 'purchase'
                                          THEN 1 ELSE 0 END) AS BIGINT) AS k
                     FROM events GROUP BY 1),
           l AS (SELECT day,
                        CAST(ROUND((CAST(k AS DOUBLE) * LN(0.22 / 0.18)
                             + CAST(n - k AS DOUBLE) * LN(0.78 / 0.82)) * 1e8)
                          AS BIGINT) AS llr_e8
                 FROM daily),
           c AS (SELECT t.day, CAST(SUM(p.llr_e8) AS BIGINT) AS cum_e8
                 FROM l t JOIN l p ON p.day <= t.day GROUP BY 1)
      SELECT CAST(day AS VARCHAR) AS day,
             ROUND(CAST(cum_e8 AS DOUBLE) / 1e8, 6) + 0 AS cum_llr,
             CASE WHEN CAST(cum_e8 AS DOUBLE) / 1e8 >= LN(19.0) THEN 'accept_h1'
                  WHEN CAST(cum_e8 AS DOUBLE) / 1e8 <= -LN(19.0) THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM c ORDER BY day""",

    "q_user_behavior_entropy" -> """
      WITH c0 AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
                  FROM events GROUP BY 1, 2),
           c1 AS (SELECT user_id, c,
                         CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
                  FROM c0),
           t AS (SELECT user_id, n,
                        CAST(ROUND(CAST(c AS DOUBLE)
                             * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e8)
                          AS BIGINT) AS t_e8
                 FROM c1),
           u AS (SELECT user_id, n, -CAST(SUM(t_e8) AS BIGINT) AS s_e8
                 FROM t GROUP BY 1, 2),
           h AS (SELECT CAST(ROUND(CAST(s_e8 AS DOUBLE)
                             / (CAST(n AS DOUBLE) * 1e8) * 1e4) AS BIGINT) AS h_e4
                 FROM u)
      SELECT h_e4 // 2500 AS band, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(h_e4) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_h_e4
      FROM h GROUP BY 1 ORDER BY band""",

    "q_rare_category_collapse" -> """
      WITH cat AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n
                   FROM part GROUP BY 1),
           tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                          CAST(COUNT(*) AS BIGINT) AS n_before FROM cat),
           agg AS (SELECT nn, n_before,
                          CAST(SUM(CASE WHEN n * 100 < nn THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_collapsed,
                          CAST(SUM(CASE WHEN n * 100 < nn THEN n ELSE 0 END)
                            AS BIGINT) AS rows_other
                   FROM cat CROSS JOIN tot GROUP BY 1, 2)
      SELECT n_before,
             n_before - n_collapsed
               + CASE WHEN n_collapsed > 0 THEN 1 ELSE 0 END AS n_after,
             n_collapsed, rows_other,
             rows_other * 1000000 // nn AS other_share_e6
      FROM agg""",

    "q_relative_risk" -> """
      WITH c2 AS (SELECT CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag = 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
                         CAST(SUM(CASE WHEN l_discount >= 0.06 AND l_returnflag <> 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag = 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
                         CAST(SUM(CASE WHEN l_discount < 0.06 AND l_returnflag <> 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS d
                  FROM lineitem)
      SELECT a, b, c, d,
             ROUND((CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                   / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)), 4) + 0 AS rr,
             ROUND(EXP(LN((CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                          / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)))
                       - 1.959964 * SQRT(1.0 / CAST(a AS DOUBLE)
                                         - 1.0 / CAST(a + b AS DOUBLE)
                                         + 1.0 / CAST(c AS DOUBLE)
                                         - 1.0 / CAST(c + d AS DOUBLE))), 4) + 0
               AS ci_lo,
             ROUND(EXP(LN((CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                          / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)))
                       + 1.959964 * SQRT(1.0 / CAST(a AS DOUBLE)
                                         - 1.0 / CAST(a + b AS DOUBLE)
                                         + 1.0 / CAST(c AS DOUBLE)
                                         - 1.0 / CAST(c + d AS DOUBLE))), 4) + 0
               AS ci_hi,
             ROUND(CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE)
                   - CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE), 6) + 0 AS risk_diff
      FROM c2""",

    "q_prevalence_adjust" -> """
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END)
                          AS BIGINT) AS pos
                 FROM lineitem)
      SELECT n, pos,
             ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0 AS p_observed,
             ROUND(GREATEST(LEAST((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                                   + 0.95 - 1.0) / (0.90 + 0.95 - 1.0), 1.0),
                            0.0), 6) + 0 AS p_adjusted
      FROM s""",

    "q_weighted_kappa" -> """
      WITH cont AS (SELECT LEAST(CAST(ROUND(o_totalprice*100) AS BIGINT) // 5000000,
                                 4) AS i,
                           CAST(substring(o_orderpriority, 1, 1) AS BIGINT) - 1 AS j,
                           CAST(COUNT(*) AS BIGINT) AS o
                    FROM orders GROUP BY 1, 2),
           rows_ AS (SELECT i, CAST(SUM(o) AS BIGINT) AS r FROM cont GROUP BY 1),
           cols_ AS (SELECT j, CAST(SUM(o) AS BIGINT) AS cc FROM cont GROUP BY 1),
           num AS (SELECT SUM(CAST(ABS(i - j) AS HUGEINT) * o) AS svo FROM cont),
           den AS (SELECT SUM(CAST(ABS(rows_.i - cols_.j) AS HUGEINT) * r * cc) AS svrc
                   FROM rows_ CROSS JOIN cols_),
           n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cont)
      SELECT n, CAST(svo AS BIGINT) AS weighted_disagree,
             ROUND(1.0 - CAST(n AS DOUBLE) * CAST(svo AS DOUBLE)
                   / CAST(svrc AS DOUBLE), 6) + 0 AS kappa_w
      FROM n CROSS JOIN num CROSS JOIN den""",

    "q_tukey_fences" -> """
      WITH cell AS (SELECT l_returnflag AS g,
                           CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM lineitem GROUP BY 1, 2),
           cum AS (SELECT g, v, c,
                          CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
                            AS cum
                   FROM cell),
           ng AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM cell GROUP BY 1),
           q1 AS (SELECT cum.g, CAST(MIN(v) AS BIGINT) AS q1
                  FROM cum JOIN ng ON cum.g = ng.g
                  WHERE cum * 4 >= n_g GROUP BY 1),
           q3 AS (SELECT cum.g, CAST(MIN(v) AS BIGINT) AS q3
                  FROM cum JOIN ng ON cum.g = ng.g
                  WHERE cum * 4 >= n_g * 3 GROUP BY 1),
           f AS (SELECT q1.g, q1.q1, q3.q3,
                        2 * q1.q1 - 3 * (q3.q3 - q1.q1) AS lo2,
                        2 * q3.q3 + 3 * (q3.q3 - q1.q1) AS hi2
                 FROM q1 JOIN q3 ON q1.g = q3.g)
      SELECT cell.g AS flag, CAST(SUM(c) AS BIGINT) AS n, f.q1, f.q3,
             CAST(SUM(CASE WHEN v * 2 < lo2 THEN c ELSE 0 END) AS BIGINT) AS n_low,
             CAST(SUM(CASE WHEN v * 2 > hi2 THEN c ELSE 0 END) AS BIGINT) AS n_high,
             (CAST(SUM(CASE WHEN v * 2 < lo2 THEN c ELSE 0 END) AS BIGINT)
              + CAST(SUM(CASE WHEN v * 2 > hi2 THEN c ELSE 0 END) AS BIGINT))
               * 1000000 // CAST(SUM(c) AS BIGINT) AS outlier_rate_e6
      FROM cell JOIN f ON cell.g = f.g
      GROUP BY cell.g, f.q1, f.q3, f.lo2, f.hi2
      ORDER BY flag""",

    "q_likelihood_ratios" -> """
      WITH c2 AS (SELECT CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                         CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                         CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                         CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
                                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
                  FROM lineitem)
      SELECT tp, fp, fn, tn,
             ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) + 0
               AS sensitivity,
             ROUND(CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE), 6) + 0
               AS specificity,
             ROUND((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
                   / (1.0 - CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)), 4) + 0
               AS lr_pos,
             ROUND((1.0 - CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
                   / (CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)), 4) + 0
               AS lr_neg,
             ROUND((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
                   / (1.0 - CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))
                   / ((1.0 - CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
                      / (CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))), 4) + 0
               AS dor
      FROM c2""",

    "q_graph_eccentricity" -> """
      WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           seeds AS MATERIALIZED (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
                     FROM ed GROUP BY u ORDER BY deg DESC, node ASC LIMIT 5),
           f0 AS MATERIALIZED (SELECT node AS seed, node FROM seeds),
           f1 AS MATERIALIZED (SELECT DISTINCT f.seed, e.v AS node FROM f0 f JOIN ed e ON e.u = f.node
                  WHERE NOT EXISTS (SELECT 1 FROM f0 x WHERE x.seed = f.seed AND x.node = e.v)),
           f2 AS MATERIALIZED (SELECT DISTINCT f.seed, e.v AS node FROM f1 f JOIN ed e ON e.u = f.node
                  WHERE NOT EXISTS (SELECT 1 FROM f0 x WHERE x.seed = f.seed AND x.node = e.v)
                    AND NOT EXISTS (SELECT 1 FROM f1 x WHERE x.seed = f.seed AND x.node = e.v)),
           f3 AS MATERIALIZED (SELECT DISTINCT f.seed, e.v AS node FROM f2 f JOIN ed e ON e.u = f.node
                  WHERE NOT EXISTS (SELECT 1 FROM f0 x WHERE x.seed = f.seed AND x.node = e.v)
                    AND NOT EXISTS (SELECT 1 FROM f1 x WHERE x.seed = f.seed AND x.node = e.v)
                    AND NOT EXISTS (SELECT 1 FROM f2 x WHERE x.seed = f.seed AND x.node = e.v)),
           lv AS MATERIALIZED (SELECT seed, node, 1 AS lvl FROM f1
                  UNION ALL SELECT seed, node, 2 FROM f2
                  UNION ALL SELECT seed, node, 3 FROM f3)
      SELECT s.node AS seed, s.deg,
             CAST(COALESCE(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hop1,
             CAST(COALESCE(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hop2,
             CAST(COALESCE(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hop3,
             CAST(COALESCE(MAX(lvl), 0) AS BIGINT) AS ecc3
      FROM seeds s LEFT JOIN lv ON lv.seed = s.node
      GROUP BY 1, 2 ORDER BY seed""",

    "q_graph_diameter2sweep" -> """
      WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           s0 AS MATERIALIZED (SELECT MIN(u) AS node FROM ed),
           l1 AS MATERIALIZED (SELECT DISTINCT v AS node FROM ed JOIN s0 ON ed.u = s0.node
                  WHERE v NOT IN (SELECT node FROM s0)),
           l2 AS MATERIALIZED (SELECT DISTINCT v AS node FROM ed WHERE u IN (SELECT node FROM l1)
                  AND v NOT IN (SELECT node FROM s0 UNION ALL SELECT node FROM l1)),
           l3 AS MATERIALIZED (SELECT DISTINCT v AS node FROM ed WHERE u IN (SELECT node FROM l2)
                  AND v NOT IN (SELECT node FROM s0 UNION ALL SELECT node FROM l1
                                UNION ALL SELECT node FROM l2)),
           sw1 AS MATERIALIZED (SELECT node, 0 AS lvl FROM s0 UNION ALL SELECT node, 1 FROM l1
                   UNION ALL SELECT node, 2 FROM l2 UNION ALL SELECT node, 3 FROM l3),
           far AS MATERIALIZED (SELECT node FROM sw1 ORDER BY lvl DESC, node ASC LIMIT 1),
           m1 AS MATERIALIZED (SELECT DISTINCT v AS node FROM ed JOIN far ON ed.u = far.node
                  WHERE v NOT IN (SELECT node FROM far)),
           m2 AS MATERIALIZED (SELECT DISTINCT v AS node FROM ed WHERE u IN (SELECT node FROM m1)
                  AND v NOT IN (SELECT node FROM far UNION ALL SELECT node FROM m1)),
           m3 AS MATERIALIZED (SELECT DISTINCT v AS node FROM ed WHERE u IN (SELECT node FROM m2)
                  AND v NOT IN (SELECT node FROM far UNION ALL SELECT node FROM m1
                                UNION ALL SELECT node FROM m2)),
           sw2 AS MATERIALIZED (SELECT node, 0 AS lvl FROM far UNION ALL SELECT node, 1 FROM m1
                   UNION ALL SELECT node, 2 FROM m2 UNION ALL SELECT node, 3 FROM m3)
      SELECT (SELECT node FROM s0) AS start_node,
             (SELECT node FROM far) AS periphery_node,
             CAST((SELECT MAX(lvl) FROM sw1) AS BIGINT) AS ecc1,
             CAST((SELECT COUNT(*) FROM sw1) AS BIGINT) AS n_reached1,
             CAST((SELECT MAX(lvl) FROM sw2) AS BIGINT) AS ecc2,
             CAST((SELECT COUNT(*) FROM sw2) AS BIGINT) AS n_reached2,
             CAST(GREATEST((SELECT MAX(lvl) FROM sw1),
                           (SELECT MAX(lvl) FROM sw2)) AS BIGINT) AS diameter_lb""",

    "q_boruvka_step" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v, CAST(COUNT(*) AS BIGINT) AS s
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           edges AS (SELECT u, v, 1000 // s AS w FROM e0
                     UNION ALL SELECT v, u, 1000 // s FROM e0),
           picks AS (SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b, w FROM
                       (SELECT u, v, w,
                               ROW_NUMBER() OVER (PARTITION BY u ORDER BY w ASC, v ASC) AS rn
                        FROM edges)
                     WHERE rn = 1),
           und AS (SELECT a, b, CAST(MAX(w) AS BIGINT) AS w,
                          CAST(COUNT(*) AS BIGINT) AS np
                   FROM picks GROUP BY a, b),
           nodes AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n_nodes FROM edges)
      SELECT n_nodes, CAST(COUNT(*) AS BIGINT) AS n_picked,
             CAST(SUM(w) AS BIGINT) AS total_w,
             CAST(SUM(CASE WHEN np = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual,
             CAST(n_nodes - COUNT(*) AS BIGINT) AS n_components_after
      FROM und CROSS JOIN nodes GROUP BY n_nodes""",

    "q_local_bridges" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           supported AS (SELECT DISTINCT e.u, e.v
                         FROM e0 e JOIN ed a ON a.u = e.u
                                   JOIN ed b ON b.u = e.v AND a.v = b.v),
           deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY u),
           br AS (SELECT e.u, e.v, du.deg AS deg_u, dv.deg AS deg_v
                  FROM e0 e
                  LEFT JOIN supported s ON s.u = e.u AND s.v = e.v
                  JOIN deg du ON du.node = e.u
                  JOIN deg dv ON dv.node = e.v
                  WHERE s.u IS NULL),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM br)
      SELECT u, v, deg_u, deg_v, CAST(deg_u * deg_v AS BIGINT) AS degprod,
             nb AS n_bridges_total
      FROM br CROSS JOIN tot
      ORDER BY degprod DESC, u ASC, v ASC LIMIT 10""",

    "q_dsir_weights" -> """
      WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
                          generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                   FROM documents),
           bg AS (SELECT doc_id, w1, w2 FROM
                    (SELECT doc_id, w AS w1,
                            LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok)
                  WHERE w2 IS NOT NULL),
           f AS (SELECT b.doc_id, d.lang,
                        CAST('0x' || substring(md5(w1 || ' ' || w2), 1, 8) AS BIGINT) % 1024 AS bk
                 FROM bg b JOIN documents d ON d.doc_id = b.doc_id),
           c AS (SELECT bk,
                        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tb,
                        CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS rb
                 FROM f GROUP BY bk),
           t AS (SELECT CAST(SUM(tb) AS BIGINT) AS tt, CAST(SUM(rb) AS BIGINT) AS rt FROM c),
           l AS (SELECT bk,
                        CAST(ROUND((LN(CAST(tb + 1 AS DOUBLE)) - LN(CAST(tt + 1024 AS DOUBLE))
                                    - LN(CAST(rb + 1 AS DOUBLE)) + LN(CAST(rt + 1024 AS DOUBLE)))
                                   * 1e6) AS BIGINT) AS llr_e6
                 FROM c CROSS JOIN t)
      SELECT f.doc_id, f.lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(llr_e6) AS BIGINT) AS score_e6
      FROM f JOIN l USING (bk) WHERE f.lang <> 'en'
      GROUP BY 1, 2 ORDER BY score_e6 DESC, doc_id ASC LIMIT 20""",

    "q_curriculum_schedule" -> """
      WITH s AS (SELECT LEAST(n_chars // 256, 3) AS stage, doc_id, n_chars FROM documents),
           r AS (SELECT stage, doc_id,
                        ROW_NUMBER() OVER (PARTITION BY stage ORDER BY doc_id) AS rn FROM s),
           fd AS (SELECT stage, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                           AS first_docs
                  FROM r WHERE rn <= 5 GROUP BY stage),
           a AS (SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(n_chars) AS BIGINT) AS chars
                 FROM s GROUP BY stage),
           cum AS (SELECT a.stage, CAST(COALESCE(SUM(b.chars), 0) AS BIGINT) AS cum_chars_before
                   FROM a LEFT JOIN a b ON b.stage < a.stage GROUP BY a.stage)
      SELECT a.stage, a.n_docs, a.chars, cum.cum_chars_before, fd.first_docs
      FROM a JOIN cum USING (stage) JOIN fd USING (stage) ORDER BY stage""",

    "q_reservoir_bottomk" -> """
      WITH ev AS (SELECT event_type, event_id,
                         CAST(ROUND(value * 100) AS BIGINT) AS v,
                         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
                           AS BIGINT) AS h
                  FROM events),
           r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                              ORDER BY h ASC, event_id ASC) AS rn FROM ev),
           s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
                        CAST(SUM(v) AS BIGINT) AS sv
                 FROM r WHERE rn <= 32 GROUP BY 1),
           x AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(v) AS BIGINT) AS tv
                 FROM ev GROUP BY 1)
      SELECT x.event_type, n, k,
             ROUND(CAST(sv AS DOUBLE) / CAST(k AS DOUBLE), 4) + 0 AS est_mean_cents,
             ROUND(CAST(tv AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0 AS exact_mean_cents,
             CAST((sv * n - tv * k) * 10000 // (tv * k) AS BIGINT) AS rel_err_e4
      FROM x JOIN s USING (event_type) ORDER BY event_type""",

    "q_yule_walker_ar2" -> """
      WITH raw AS MATERIALIZED (
             SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
             FROM events GROUP BY 1),
           base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
                           CAST(SUM(x*x) AS BIGINT) AS q FROM raw),
           l1 AS (SELECT CAST(SUM(a.x * b.x) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n1,
                         CAST(SUM(a.x) AS BIGINT) AS sa1, CAST(SUM(b.x) AS BIGINT) AS sb1
                  FROM raw a JOIN raw b ON b.t = a.t + 1),
           l2 AS (SELECT CAST(SUM(a.x * b.x) AS BIGINT) AS c2, CAST(COUNT(*) AS BIGINT) AS n2,
                         CAST(SUM(a.x) AS BIGINT) AS sa2, CAST(SUM(b.x) AS BIGINT) AS sb2
                  FROM raw a JOIN raw b ON b.t = a.t + 2),
           last2 AS (SELECT CAST(SUM(CASE WHEN n_later = 0 THEN x END) AS BIGINT) AS xt,
                            CAST(SUM(CASE WHEN n_later = 1 THEN x END) AS BIGINT) AS xt1
                     FROM (SELECT a.t, a.x, COUNT(b.t) AS n_later
                           FROM raw a LEFT JOIN raw b ON b.t > a.t GROUP BY a.t, a.x)
                     WHERE n_later <= 1),
           r AS (SELECT n AS n_days,
                        (CAST(c1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS r1,
                        (CAST(c2 AS DOUBLE) - CAST(sa2 AS DOUBLE) * CAST(sb2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                        / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS r2,
                        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu
                 FROM base, l1, l2)
      SELECT n_days,
             ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) + 0 AS phi1,
             ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) + 0 AS phi2,
             ROUND(1.0 - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r1
                   - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2, 6) + 0 AS innovar_ratio,
             ROUND(mu + (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * (CAST(xt AS DOUBLE) - mu)
                   + ((r2 - r1 * r1) / (1.0 - r1 * r1)) * (CAST(xt1 AS DOUBLE) - mu), 4) + 0
               AS forecast_cents
      FROM r CROSS JOIN last2""",

    "q_hampel_filter" -> """
      WITH raw AS MATERIALIZED (
             SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
             FROM events GROUP BY 1),
           near AS MATERIALIZED (
             SELECT a.t, a.x, b.t AS t2, b.x AS x2
             FROM raw a JOIN raw b ON b.t BETWEEN a.t - 3 AND a.t + 3),
           rnk AS MATERIALIZED (
             SELECT p.t, p.x, p.t2, p.x2, CAST(COUNT(*) AS BIGINT) AS rnk
             FROM near p JOIN raw c ON c.t BETWEEN p.t - 3 AND p.t + 3
                  AND (c.x < p.x2 OR (c.x = p.x2 AND c.t <= p.t2))
             GROUP BY 1, 2, 3, 4),
           rn2 AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY t) AS BIGINT) AS n_win FROM rnk),
           med AS MATERIALIZED (
             SELECT t, x, n_win, CAST(MIN(x2) AS BIGINT) AS med
             FROM rn2 WHERE rnk * 2 >= n_win + 1 GROUP BY 1, 2, 3),
           dev AS MATERIALIZED (
             SELECT m.t, m.x, m.n_win, m.med, n.t2, abs(n.x2 - m.med) AS d
             FROM med m JOIN near n ON n.t = m.t),
           mrnk AS (SELECT p.t, p.x, p.n_win, p.med, p.t2, p.d, CAST(COUNT(*) AS BIGINT) AS rnk
                    FROM dev p JOIN dev q4 ON q4.t = p.t
                         AND (q4.d < p.d OR (q4.d = p.d AND q4.t2 <= p.t2))
                    GROUP BY 1, 2, 3, 4, 5, 6),
           mad AS (SELECT t, x, n_win, med, CAST(MIN(d) AS BIGINT) AS mad
                   FROM mrnk WHERE rnk * 2 >= n_win + 1 GROUP BY 1, 2, 3, 4)
      SELECT t AS day, x AS rev_cents, n_win, med AS med_cents, mad AS mad_cents,
             CAST(CASE WHEN abs(x - med) > mad * 3 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      FROM mad ORDER BY day""",

    "q_price_indexes" -> """
      WITH li AS (SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m,
                         l_partkey AS pk, CAST(l_quantity AS BIGINT) AS qty,
                         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS rev
                  FROM lineitem),
           bounds AS (SELECT MIN(m) AS m0, MAX(m) AS m1 FROM li),
           pm AS (SELECT pk, CASE WHEN m = m1 THEN 1 ELSE 0 END AS cur,
                         CAST(SUM(qty) AS BIGINT) AS q, CAST(SUM(rev) AS BIGINT) AS rev,
                         CAST(SUM(rev) * 100 // SUM(qty) AS BIGINT) AS uv_e2
                  FROM li CROSS JOIN bounds WHERE m = m0 OR m = m1 GROUP BY 1, 2),
           matched AS (SELECT b0.pk, b0.q AS q0, b0.rev AS rev0, b0.uv_e2 AS p0,
                              b1.q AS q1, b1.rev AS rev1, b1.uv_e2 AS p1
                       FROM pm b0 JOIN pm b1 ON b0.pk = b1.pk AND b0.cur = 0 AND b1.cur = 1),
           tots AS (SELECT CAST(SUM(rev0) AS BIGINT) AS t0, CAST(SUM(rev1) AS BIGINT) AS t1
                    FROM matched),
           terms AS (SELECT pk, q0, q1, p0, p1,
                            CAST(ROUND((CAST(rev0 AS DOUBLE) / CAST(t0 AS DOUBLE)
                                        + CAST(rev1 AS DOUBLE) / CAST(t1 AS DOUBLE)) * 0.5
                                       * LN(CAST(p1 AS DOUBLE) / CAST(p0 AS DOUBLE)) * 1e12)
                              AS BIGINT) AS torn_e12
                     FROM matched CROSS JOIN tots)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
             CAST(ROUND(CAST(SUM(p1 * q0) AS DOUBLE) / CAST(SUM(p0 * q0) AS DOUBLE) * 1e6)
               AS BIGINT) AS laspeyres_e6,
             CAST(ROUND(CAST(SUM(p1 * q1) AS DOUBLE) / CAST(SUM(p0 * q1) AS DOUBLE) * 1e6)
               AS BIGINT) AS paasche_e6,
             CAST(ROUND(SQRT(CAST(SUM(p1 * q0) AS DOUBLE) / CAST(SUM(p0 * q0) AS DOUBLE)
                             * CAST(SUM(p1 * q1) AS DOUBLE) / CAST(SUM(p0 * q1) AS DOUBLE)) * 1e6)
               AS BIGINT) AS fisher_e6,
             CAST(ROUND(EXP(CAST(SUM(torn_e12) AS DOUBLE) / 1e12) * 1e6) AS BIGINT)
               AS tornqvist_e6
      FROM terms""",

    "q_chained_laspeyres" -> """
      WITH li AS (SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m,
                         l_partkey AS pk, CAST(l_quantity AS BIGINT) AS qty,
                         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS rev
                  FROM lineitem),
           pm AS MATERIALIZED (
             SELECT m, pk, CAST(SUM(qty) AS BIGINT) AS q,
                    CAST(SUM(rev) * 100 // SUM(qty) AS BIGINT) AS uv_e2
             FROM li GROUP BY 1, 2),
           links AS MATERIALIZED (
             SELECT a.m + 1 AS m, CAST(COUNT(*) AS BIGINT) AS n_matched,
                    CAST(ROUND(CAST(SUM(b.uv_e2 * a.q) AS DOUBLE)
                               / CAST(SUM(a.uv_e2 * a.q) AS DOUBLE) * 1e6) AS BIGINT)
                      AS link_e6,
                    CAST(ROUND(LN(CAST(SUM(b.uv_e2 * a.q) AS DOUBLE)
                                  / CAST(SUM(a.uv_e2 * a.q) AS DOUBLE)) * 1e9) AS BIGINT)
                      AS lnlink_e9
             FROM pm a JOIN pm b ON b.pk = a.pk AND b.m = a.m + 1
             GROUP BY a.m)
      SELECT a.m, a.n_matched, a.link_e6,
             CAST(CAST(SUM(b.lnlink_e9) AS BIGINT) // 1000 AS BIGINT) AS chained_ln_e6
      FROM links a JOIN links b ON b.m <= a.m
      GROUP BY 1, 2, 3 ORDER BY 1""",

    "q_als_user_step" -> """
      WITH ratings AS MATERIALIZED (
             SELECT cust, brand, CAST(COUNT(*) AS BIGINT) AS r FROM
               (SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand,
                       o.o_orderkey AS ok
                FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                JOIN part p ON p.p_partkey = l.l_partkey)
             GROUP BY 1, 2),
           factors AS (SELECT brand,
                              CAST('0x' || substring(md5(brand), 1, 8) AS BIGINT) % 2001
                                - 1000 AS v1,
                              CAST('0x' || substring(md5(brand || '#2'), 1, 8) AS BIGINT) % 2001
                                - 1000 AS v2
                       FROM (SELECT DISTINCT p_brand AS brand FROM part)),
           acc AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS n_brands,
                          CAST(SUM(r) AS BIGINT) AS sum_r,
                          CAST(SUM(v1*v1) AS BIGINT) AS a11, CAST(SUM(v1*v2) AS BIGINT) AS a12,
                          CAST(SUM(v2*v2) AS BIGINT) AS a22,
                          CAST(SUM(r*v1) AS BIGINT) AS b1, CAST(SUM(r*v2) AS BIGINT) AS b2
                   FROM ratings JOIN factors USING (brand) GROUP BY 1)
      SELECT cust, n_brands, sum_r,
             ROUND(((CAST(a22 AS DOUBLE) / 1e8 + 0.1) * (CAST(b1 AS DOUBLE) / 1e4)
                    - (CAST(a12 AS DOUBLE) / 1e8) * (CAST(b2 AS DOUBLE) / 1e4))
                   / ((CAST(a11 AS DOUBLE) / 1e8 + 0.1) * (CAST(a22 AS DOUBLE) / 1e8 + 0.1)
                      - (CAST(a12 AS DOUBLE) / 1e8) * (CAST(a12 AS DOUBLE) / 1e8)), 6) + 0 AS u1,
             ROUND(((CAST(a11 AS DOUBLE) / 1e8 + 0.1) * (CAST(b2 AS DOUBLE) / 1e4)
                    - (CAST(a12 AS DOUBLE) / 1e8) * (CAST(b1 AS DOUBLE) / 1e4))
                   / ((CAST(a11 AS DOUBLE) / 1e8 + 0.1) * (CAST(a22 AS DOUBLE) / 1e8 + 0.1)
                      - (CAST(a12 AS DOUBLE) / 1e8) * (CAST(a12 AS DOUBLE) / 1e8)), 6) + 0 AS u2
      FROM acc ORDER BY n_brands DESC, cust ASC LIMIT 10""",

    "q_slope_one" -> """
      WITH ratings AS MATERIALIZED (
             SELECT cust, brand, CAST(COUNT(*) AS BIGINT) AS r FROM
               (SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand,
                       o.o_orderkey AS ok
                FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                JOIN part p ON p.p_partkey = l.l_partkey)
             GROUP BY 1, 2)
      SELECT a.brand AS brand_i, b.brand AS brand_j,
             CAST(COUNT(*) AS BIGINT) AS n_corated,
             CAST(CAST(SUM(a.r - b.r) AS BIGINT) * 1000000 // COUNT(*) AS BIGINT) AS dev_e6
      FROM ratings a JOIN ratings b ON a.cust = b.cust AND a.brand < b.brand
      GROUP BY 1, 2 ORDER BY n_corated DESC, brand_i ASC, brand_j ASC LIMIT 10""",

    "q_l_diversity" -> """
      WITH rel AS (SELECT c.c_mktsegment AS seg, CAST(c.c_nationkey AS BIGINT) AS nat,
                          o.o_orderpriority AS sens
                   FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
           cells AS (SELECT seg, nat, sens, CAST(COUNT(*) AS BIGINT) AS c
                     FROM rel GROUP BY 1, 2, 3),
           w AS (SELECT seg, nat, c,
                        CAST(SUM(c) OVER (PARTITION BY seg, nat) AS BIGINT) AS n FROM cells),
           t AS (SELECT seg, nat, n,
                        CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                                   * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e8)
                          AS BIGINT) AS term_e8
                 FROM w)
      SELECT seg, nat, n, CAST(COUNT(*) AS BIGINT) AS l_distinct,
             CAST(CAST(SUM(term_e8) AS BIGINT) // 100 AS BIGINT) AS entropy_e6,
             CAST(CASE WHEN COUNT(*) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS ok_l3
      FROM t GROUP BY 1, 2, 3 ORDER BY seg, nat""",

    "q_forecast_reconcile" -> """
      WITH nm AS MATERIALIZED (
             SELECT CAST(c.c_nationkey AS BIGINT) AS nat,
                    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
                    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
             FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
             GROUP BY 1, 2),
           mmax AS (SELECT MAX(m) AS mx FROM nm),
           bu AS (SELECT nat, CAST(SUM(rev) // COUNT(*) AS BIGINT) AS bu_fc
                  FROM nm CROSS JOIN mmax WHERE m BETWEEN mx - 3 AND mx - 1 GROUP BY 1),
           share AS (SELECT nat, CAST(SUM(rev) AS BIGINT) AS tr
                     FROM nm CROSS JOIN mmax WHERE m < mx GROUP BY 1),
           grand AS (SELECT CAST(SUM(tr) AS BIGINT) AS g FROM share),
           tdt AS (SELECT CAST(SUM(mrev) // COUNT(*) AS BIGINT) AS td_total FROM
                     (SELECT m, CAST(SUM(rev) AS BIGINT) AS mrev
                      FROM nm CROSS JOIN mmax
                      WHERE m BETWEEN mx - 3 AND mx - 1 GROUP BY 1)),
           act AS (SELECT nat, rev AS actual FROM nm CROSS JOIN mmax WHERE m = mx)
      SELECT s.nat, CAST(COALESCE(a.actual, 0) AS BIGINT) AS actual_cents,
             CAST(COALESCE(b.bu_fc, 0) AS BIGINT) AS bu_fc_cents,
             CAST(td_total * (s.tr * 1000000 // g) // 1000000 AS BIGINT) AS td_fc_cents,
             CAST(abs(COALESCE(a.actual, 0) - COALESCE(b.bu_fc, 0)) AS BIGINT) AS bu_abs_err,
             CAST(abs(COALESCE(a.actual, 0)
                      - td_total * (s.tr * 1000000 // g) // 1000000) AS BIGINT) AS td_abs_err
      FROM share s CROSS JOIN grand CROSS JOIN tdt
      LEFT JOIN bu b ON b.nat = s.nat
      LEFT JOIN act a ON a.nat = s.nat
      ORDER BY s.nat""",

    "q_jones_plassmann" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (
             SELECT a.pk AS u, b.pk AS v
             FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           pri AS MATERIALIZED (
             SELECT u AS node,
                    CAST('0x' || substring(md5(CAST(u AS VARCHAR)), 1, 8) AS BIGINT) AS h
             FROM (SELECT DISTINCT u FROM ed)),
           beaten AS (SELECT DISTINCT e.u AS node FROM ed e
                      JOIN pri pu ON pu.node = e.u JOIN pri pv ON pv.node = e.v
                      WHERE pv.h > pu.h OR (pv.h = pu.h AND e.v > e.u)),
           sel AS MATERIALIZED (
             SELECT node FROM pri WHERE node NOT IN (SELECT node FROM beaten)),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM pri),
           k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_colored FROM sel),
           c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_conflicts FROM e0
                 WHERE u IN (SELECT node FROM sel) AND v IN (SELECT node FROM sel))
      SELECT n_nodes, n_colored,
             CAST(n_colored * 10000 // n_nodes AS BIGINT) AS frac_e4, n_conflicts
      FROM n, k, c""",

    "q_spectral_bisection_step" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (
             SELECT a.pk AS u, b.pk AS v
             FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           x0 AS MATERIALIZED (
             SELECT u AS node, (u % 2) * 2 - 1 AS x FROM (SELECT DISTINCT u FROM ed)),
           x1 AS MATERIALIZED (
             SELECT e.u AS node, a.x AS x_old,
                    CAST(CAST(COUNT(*) AS BIGINT) * a.x - CAST(SUM(b.x) AS BIGINT)
                      AS BIGINT) AS x_new
             FROM ed e JOIN x0 a ON a.node = e.u JOIN x0 b ON b.node = e.v
             GROUP BY 1, 2),
           sizes AS (SELECT CAST(SUM(CASE WHEN x_new >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                            CAST(SUM(CASE WHEN x_new < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
                     FROM x1),
           cb AS (SELECT CAST(SUM(CASE WHEN (a.x_old >= 0) <> (b.x_old >= 0)
                                       THEN 1 ELSE 0 END) AS BIGINT) AS cut_before
                  FROM e0 JOIN x1 a ON a.node = e0.u JOIN x1 b ON b.node = e0.v),
           ca AS (SELECT CAST(SUM(CASE WHEN (a.x_new >= 0) <> (b.x_new >= 0)
                                       THEN 1 ELSE 0 END) AS BIGINT) AS cut_after
                  FROM e0 JOIN x1 a ON a.node = e0.u JOIN x1 b ON b.node = e0.v)
      SELECT n_pos, n_neg, cut_before, cut_after FROM sizes, cb, ca""",

    "q_densest_subgraph_peel" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (
             SELECT a.pk AS u, b.pk AS v
             FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           deg AS MATERIALIZED (
             SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
               (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
             GROUP BY 1),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0, CAST(SUM(deg) AS BIGINT) AS m2
                   FROM deg),
           keep AS MATERIALIZED (
             SELECT node FROM deg CROSS JOIN tot WHERE deg * n0 > m2),
           kept AS (SELECT CAST(COUNT(*) AS BIGINT) AS m1 FROM e0
                    WHERE u IN (SELECT node FROM keep) AND v IN (SELECT node FROM keep)),
           kn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM keep)
      SELECT n0, CAST(m2 // 2 AS BIGINT) AS m0,
             CAST((m2 // 2) * 1000000 // n0 AS BIGINT) AS rho0_e6,
             n1, m1,
             CAST(CASE WHEN n1 > 0 THEN m1 * 1000000 // n1 ELSE 0 END AS BIGINT) AS rho1_e6,
             CAST(n0 - n1 AS BIGINT) AS n_removed
      FROM tot, kn, kept""",

    "q_lbkeogh_bound" -> """
      WITH daily AS MATERIALIZED (
             SELECT event_type,
                    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) // 100
                      AS BIGINT) AS v
             FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1, 2),
           x AS (SELECT t, v AS x FROM daily WHERE event_type = 'purchase'),
           y AS (SELECT t AS t2, v AS yv FROM daily WHERE event_type = 'click'),
           env AS (SELECT x.t, x.x, MAX(y.yv) AS hi, MIN(y.yv) AS lo,
                          CAST(COUNT(y.yv) AS BIGINT) AS nw
                   FROM x LEFT JOIN y ON y.t2 BETWEEN x.t - 2 AND x.t + 2 GROUP BY 1, 2)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN nw = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nowindow,
             CAST(SUM(CASE WHEN nw > 0 AND (x > hi OR x < lo) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exceed,
             CAST(SUM(CASE WHEN nw > 0 AND x > hi THEN (x - hi) * (x - hi)
                           WHEN nw > 0 AND x < lo THEN (lo - x) * (lo - x)
                           ELSE 0 END) AS BIGINT) AS lb_dollars2
      FROM env""",

    "q_friendship_paradox" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, CAST(SUM(deg) AS BIGINT) AS sd,
                        CAST(SUM(deg * deg) AS BIGINT) AS sd2 FROM deg)
      SELECT n_nodes, CAST(sd // 2 AS BIGINT) AS n_edges,
             CAST(sd * 10000 // n_nodes AS BIGINT) AS mean_deg_e4,
             CAST(sd2 * 10000 // sd AS BIGINT) AS mean_neighbor_deg_e4,
             ROUND(CAST(sd2 AS DOUBLE) * CAST(n_nodes AS DOUBLE)
                   / (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)), 6) + 0 AS paradox_ratio
      FROM t""",

    "q_attribute_assortativity" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (
             SELECT a.pk AS u, b.pk AS v
             FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           cells AS MATERIALIZED (
             SELECT pu.p_brand AS gu, pv.p_brand AS gv, CAST(COUNT(*) AS BIGINT) AS c
             FROM ed JOIN part pu ON pu.p_partkey = ed.u
                     JOIN part pv ON pv.p_partkey = ed.v
             GROUP BY 1, 2),
           tr AS (SELECT CAST(SUM(c) AS BIGINT) AS tr FROM cells WHERE gu = gv),
           ma AS (SELECT gu, CAST(SUM(c) AS BIGINT) AS a FROM cells GROUP BY 1),
           mb AS (SELECT gv AS gu, CAST(SUM(c) AS BIGINT) AS b FROM cells GROUP BY 1),
           sab AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
                          CAST(SUM(a * b) AS BIGINT) AS sab
                   FROM ma JOIN mb USING (gu)),
           e AS (SELECT CAST(SUM(c) AS BIGINT) AS e FROM cells)
      SELECT n_labels, e AS n_directed_edges, tr AS trace,
             ROUND((CAST(e AS DOUBLE) * CAST(tr AS DOUBLE) - CAST(sab AS DOUBLE))
                   / (CAST(e AS DOUBLE) * CAST(e AS DOUBLE) - CAST(sab AS DOUBLE)), 6) + 0
               AS assortativity_r
      FROM sab, tr, e""",

    "q_error_budget_burn" -> """
      WITH daily AS MATERIALIZED (
             SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_err
             FROM events GROUP BY 1)
      SELECT a.t AS day, a.n AS n, a.n_err AS n_err,
             CAST(a.n_err * 1000000 // a.n AS BIGINT) AS err_rate_e6,
             CAST(a.n_err * 1000000 // a.n // 100 AS BIGINT) AS burn_e4,
             CAST(SUM(b.n) AS BIGINT) AS cum_n, CAST(SUM(b.n_err) AS BIGINT) AS cum_err,
             CAST((CAST(SUM(b.n) AS BIGINT) // 100 - CAST(SUM(b.n_err) AS BIGINT)) * 1000000
                  // GREATEST(CAST(SUM(b.n) AS BIGINT) // 100, 1) AS BIGINT)
               AS budget_remaining_e6
      FROM daily a JOIN daily b ON b.t <= a.t
      GROUP BY 1, 2, 3 ORDER BY day""",

    "q_adstock_correlation" -> """
      WITH daily AS MATERIALIZED (
             SELECT t, CAST(cc // 10000 AS BIGINT) AS c, CAST(pc // 10000 AS BIGINT) AS p FROM (
               SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                      CAST(SUM(CASE WHEN event_type = 'click'
                                    THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT)
                        AS cc,
                      CAST(SUM(CASE WHEN event_type = 'purchase'
                                    THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT)
                        AS pc
               FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1)),
           ad AS (SELECT a.t, a.c, a.p,
                         CAST(SUM(b.c * CAST(POW(2.0, 7 - (a.t - b.t)) AS BIGINT)) AS BIGINT)
                           AS ad128
                  FROM daily a JOIN daily b ON b.t BETWEEN a.t - 7 AND a.t
                  GROUP BY 1, 2, 3),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s_c,
                        CAST(SUM(p) AS BIGINT) AS s_p, CAST(SUM(ad128) AS BIGINT) AS s_a,
                        CAST(SUM(c*p) AS BIGINT) AS s_cp, CAST(SUM(c*c) AS BIGINT) AS s_cc,
                        CAST(SUM(p*p) AS BIGINT) AS s_pp, CAST(SUM(ad128*p) AS BIGINT) AS s_ap,
                        CAST(SUM(ad128*ad128) AS BIGINT) AS s_aa
                 FROM ad)
      SELECT n AS n_days,
             ROUND((CAST(n AS DOUBLE) * CAST(s_cp AS DOUBLE)
                    - CAST(s_c AS DOUBLE) * CAST(s_p AS DOUBLE))
                   / (SQRT(CAST(n AS DOUBLE) * CAST(s_cc AS DOUBLE)
                           - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE))
                      * SQRT(CAST(n AS DOUBLE) * CAST(s_pp AS DOUBLE)
                             - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))), 6) + 0 AS corr_raw,
             ROUND((CAST(n AS DOUBLE) * CAST(s_ap AS DOUBLE)
                    - CAST(s_a AS DOUBLE) * CAST(s_p AS DOUBLE))
                   / (SQRT(CAST(n AS DOUBLE) * CAST(s_aa AS DOUBLE)
                           - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                      * SQRT(CAST(n AS DOUBLE) * CAST(s_pp AS DOUBLE)
                             - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))), 6) + 0
               AS corr_adstock
      FROM s""",

    "q_recurrence_quantification" -> """
      WITH raw AS MATERIALIZED (
             SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
             FROM events GROUP BY 1),
           eps AS (SELECT CAST((MAX(x) - MIN(x)) // 10 AS BIGINT) AS eps FROM raw),
           rec AS MATERIALIZED (
             SELECT a.t AS i, b.t AS j, abs(a.x - b.x) <= eps AS r
             FROM raw a JOIN raw b ON b.t > a.t CROSS JOIN eps),
           base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                           CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_rec
                    FROM rec),
           diag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_diag
                    FROM rec p JOIN rec q ON q.i = p.i + 1 AND q.j = p.j + 1
                    WHERE p.r AND q.r),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM raw)
      SELECT n_days, n_pairs, n_rec,
             CAST(n_rec * 1000000 // n_pairs AS BIGINT) AS rr_e6, n_diag,
             CAST(CASE WHEN n_rec > 0 THEN n_diag * 1000000 // n_rec ELSE 0 END AS BIGINT)
               AS det_e6
      FROM n, base, diag""",

    "q_cornish_fisher" -> """
      WITH raw AS MATERIALIZED (
             SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
             FROM events GROUP BY 1),
           mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s1,
                          SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS s2,
                          SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS s3,
                          SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              * CAST(x AS DOUBLE)) AS s4
                   FROM raw),
           emp AS (SELECT CAST(MIN(x) AS BIGINT) AS q95_emp FROM
                     (SELECT a.t, a.x, CAST(COUNT(*) AS BIGINT) AS rn,
                             MAX(nn.nn) AS nn
                      FROM raw a JOIN raw b
                        ON b.x < a.x OR (b.x = a.x AND b.t <= a.t)
                      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM raw) nn
                      GROUP BY a.t, a.x)
                   WHERE rn * 20 >= nn * 19),
           st1 AS (SELECT n AS n_days, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                          SQRT(s2 / CAST(n AS DOUBLE)
                               - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS sd,
                          s2, s3, s4, s1, n, q95_emp
                   FROM mom, emp),
           st2 AS (SELECT n_days, mu, sd, q95_emp,
                          (s3 / CAST(n AS DOUBLE) - 3.0 * mu * (s2 / CAST(n AS DOUBLE))
                           + 2.0 * mu * mu * mu) / (sd * sd * sd) AS g,
                          (s4 / CAST(n AS DOUBLE) - 4.0 * mu * (s3 / CAST(n AS DOUBLE))
                           + 6.0 * mu * mu * (s2 / CAST(n AS DOUBLE))
                           - 3.0 * mu * mu * mu * mu) / (sd * sd * sd * sd) - 3.0 AS k
                   FROM st1),
           st3 AS (SELECT *, CAST(1.6448536269514722 AS DOUBLE) AS z FROM st2)
      SELECT n_days, ROUND(g, 6) + 0 AS skew, ROUND(k, 6) + 0 AS excess_kurtosis,
             ROUND(mu + z * sd, 4) + 0 AS q95_normal,
             ROUND(mu + (z + (z * z - 1.0) * g / 6.0
                         + (z * z * z - 3.0 * z) * k / 24.0
                         - (2.0 * z * z * z - 5.0 * z) * g * g / 36.0) * sd, 4) + 0 AS q95_cf,
             q95_emp
      FROM st3""",

    "q_pinball_loss" -> """
      WITH raw AS MATERIALIZED (
             SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
                    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS x
             FROM events GROUP BY 1),
           cut AS (SELECT MAX(t) - 13 AS tcut FROM raw),
           train AS MATERIALIZED (
             SELECT t, x FROM raw CROSS JOIN cut WHERE t < tcut),
           ranked AS MATERIALIZED (
             SELECT a.t, a.x, CAST(COUNT(*) AS BIGINT) AS rn, MAX(nn.nn) AS nn
             FROM train a JOIN train b ON b.x < a.x OR (b.x = a.x AND b.t <= a.t)
             CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM train) nn
             GROUP BY a.t, a.x),
           qs AS (SELECT CAST(MIN(x) AS BIGINT) AS q, CAST(50 AS BIGINT) AS tau_e2
                  FROM ranked WHERE rn * 2 >= nn
                  UNION ALL
                  SELECT CAST(MIN(x) AS BIGINT), CAST(90 AS BIGINT)
                  FROM ranked WHERE rn * 10 >= nn * 9),
           test AS (SELECT x AS y FROM raw CROSS JOIN cut WHERE t >= tcut)
      SELECT tau_e2, q AS q_pred_cents, CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN y >= q THEN tau_e2 * (y - q)
                           ELSE (100 - tau_e2) * (q - y) END) AS BIGINT) AS loss_e2,
             CAST(CAST(SUM(CASE WHEN y >= q THEN tau_e2 * (y - q)
                                ELSE (100 - tau_e2) * (q - y) END) AS BIGINT)
                  // COUNT(*) AS BIGINT) AS mean_loss_cents_e2
      FROM test CROSS JOIN qs
      GROUP BY tau_e2, q ORDER BY tau_e2""",

    "q_closest_pair_2d" -> """
      WITH pts AS MATERIALIZED (
             SELECT vec_id,
                    CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1e7) AS BIGINT) AS x,
                    CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1e7) AS BIGINT) AS y
             FROM embeddings),
           bounds AS (SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
                      FROM pts),
           cells AS MATERIALIZED (
             SELECT vec_id, x, y, (x - x0) * 32 // (x1 - x0 + 1) AS cx,
                    (y - y0) * 32 // (y1 - y0 + 1) AS cy
             FROM pts CROSS JOIN bounds),
           probe AS (SELECT vec_id AS b, x AS bx, y AS byy,
                            cx + ox AS cx, cy + oy AS cy
                     FROM cells CROSS JOIN
                       (SELECT i // 3 - 1 AS ox, i % 3 - 1 AS oy
                        FROM (SELECT unnest(range(0, 9)) AS i)) o),
           cand AS MATERIALIZED (
             SELECT c.vec_id AS a, p.b,
                    (c.x - p.bx) * (c.x - p.bx) + (c.y - p.byy) * (c.y - p.byy) AS d2
             FROM cells c JOIN probe p ON p.cx = c.cx AND p.cy = c.cy
             WHERE c.vec_id < p.b),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand)
      SELECT CAST(a AS BIGINT) AS vec_a, CAST(b AS BIGINT) AS vec_b,
             CAST(d2 AS BIGINT) AS d2_e14, n_candidates
      FROM cand CROSS JOIN n ORDER BY d2, a, b LIMIT 1""",

    "q_zorder_bucket_tightness" -> """
      WITH pts AS (SELECT vec_id,
                          CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1e7) AS BIGINT) AS x,
                          CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1e7) AS BIGINT) AS y
                   FROM embeddings),
           bounds AS (SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1
                      FROM pts),
           grid AS MATERIALIZED (
             SELECT vec_id, gx, gy,
                    ((gx // 1) % 2) * 1 + ((gy // 1) % 2) * 2
                    + ((gx // 2) % 2) * 4 + ((gy // 2) % 2) * 8
                    + ((gx // 4) % 2) * 16 + ((gy // 4) % 2) * 32
                    + ((gx // 8) % 2) * 64 + ((gy // 8) % 2) * 128
                    + ((gx // 16) % 2) * 256 + ((gy // 16) % 2) * 512
                    + ((gx // 32) % 2) * 1024 + ((gy // 32) % 2) * 2048
                    + ((gx // 64) % 2) * 4096 + ((gy // 64) % 2) * 8192
                    + ((gx // 128) % 2) * 16384 + ((gy // 128) % 2) * 32768 AS morton
             FROM (SELECT vec_id, (x - x0) * 256 // (x1 - x0 + 1) AS gx,
                          (y - y0) * 256 // (y1 - y0 + 1) AS gy
                   FROM pts CROSS JOIN bounds)),
           z AS (SELECT morton // 256 AS bk, gx, gy FROM grid),
           h AS (SELECT CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 256 AS bk, gx, gy FROM grid),
           zb AS (SELECT bk, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(gx) AS BIGINT) AS sx,
                         CAST(SUM(gx*gx) AS BIGINT) AS sxx, CAST(SUM(gy) AS BIGINT) AS sy,
                         CAST(SUM(gy*gy) AS BIGINT) AS syy FROM z GROUP BY bk),
           hb AS (SELECT bk, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(gx) AS BIGINT) AS sx,
                         CAST(SUM(gx*gx) AS BIGINT) AS sxx, CAST(SUM(gy) AS BIGINT) AS sy,
                         CAST(SUM(gy*gy) AS BIGINT) AS syy FROM h GROUP BY bk),
           za AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
                         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_pairs,
                         CAST(SUM(n * sxx - sx * sx + n * syy - sy * sy) AS BIGINT) AS sum_d2
                  FROM zb),
           ha AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
                         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_pairs,
                         CAST(SUM(n * sxx - sx * sx + n * syy - sy * sy) AS BIGINT) AS sum_d2
                  FROM hb)
      SELECT * FROM (
        SELECT 'zorder' AS scheme, n_buckets_used, n_pairs,
               CAST(CASE WHEN n_pairs > 0 THEN sum_d2 * 10000 // n_pairs ELSE 0 END
                 AS BIGINT) AS avg_d2_e4
        FROM za
        UNION ALL
        SELECT 'hash', n_buckets_used, n_pairs,
               CAST(CASE WHEN n_pairs > 0 THEN sum_d2 * 10000 // n_pairs ELSE 0 END
                 AS BIGINT)
        FROM ha)
      ORDER BY scheme""",

    "q_rle_benefit" -> """
      WITH r AS (SELECT CASE WHEN prf IS NULL OR prf <> rf THEN 1 ELSE 0 END AS rf_start,
                        CASE WHEN pls IS NULL OR pls <> ls THEN 1 ELSE 0 END AS ls_start
                 FROM (SELECT l_returnflag AS rf, l_linestatus AS ls,
                              LAG(l_returnflag) OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_returnflag, l_linestatus) AS prf,
                              LAG(l_linestatus) OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_returnflag, l_linestatus) AS pls
                       FROM lineitem)),
           t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                        CAST(SUM(rf_start) AS BIGINT) AS rf_runs,
                        CAST(SUM(ls_start) AS BIGINT) AS ls_runs FROM r)
      SELECT * FROM (
        SELECT 'l_returnflag' AS column_name, n_rows, rf_runs AS n_runs,
               CAST(n_rows * 10000 // rf_runs AS BIGINT) AS rows_per_run_e4 FROM t
        UNION ALL
        SELECT 'l_linestatus', n_rows, ls_runs,
               CAST(n_rows * 10000 // ls_runs AS BIGINT) FROM t)
      ORDER BY column_name""",

    "q_linear_counting" -> """
      WITH b AS (SELECT event_type,
                        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
                        CAST(COUNT(DISTINCT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                                                  AS BIGINT) % 1024) AS BIGINT) AS n_hit
                 FROM events GROUP BY 1)
      SELECT event_type, CAST(1024 AS BIGINT) AS m, n_exact, n_hit,
             CAST(CASE WHEN n_hit >= 1024 THEN -1
                       ELSE CAST(ROUND(-1024.0 * LN(CAST(1024 - n_hit AS DOUBLE) / 1024.0))
                            AS BIGINT) END AS BIGINT) AS est,
             CAST(CASE WHEN n_hit >= 1024 THEN 0
                       ELSE (CAST(ROUND(-1024.0 * LN(CAST(1024 - n_hit AS DOUBLE) / 1024.0))
                             AS BIGINT) - n_exact) * 10000 // n_exact END AS BIGINT) AS err_e4
      FROM b ORDER BY event_type""",

    "q_fm_sketch" -> """
      WITH h AS (SELECT event_type, user_id,
                        CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                          AS BIGINT) AS h
                 FROM events),
           r AS (SELECT event_type, user_id,
                        CASE WHEN h = 0 THEN 32
                             ELSE CAST(ROUND(LOG2(CAST(h & -h AS DOUBLE))) AS BIGINT)
                        END AS rho
                 FROM h),
           a AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
                        CAST(MAX(rho) AS BIGINT) AS max_rho
                 FROM r GROUP BY 1)
      SELECT event_type, n_exact, max_rho,
             CAST(ROUND(POW(2.0, CAST(max_rho AS DOUBLE)) / 0.77351) AS BIGINT) AS est
      FROM a ORDER BY event_type""",

    "q_pcsa" -> """
      WITH h AS (SELECT event_type, user_id,
                        CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                          AS BIGINT) AS h
                 FROM events),
           r AS (SELECT event_type, user_id, h % 64 AS bk,
                        CASE WHEN h // 64 = 0 THEN 26
                             ELSE CAST(ROUND(LOG2(CAST((h // 64) & -(h // 64) AS DOUBLE)))
                                  AS BIGINT)
                        END AS rho
                 FROM h),
           b AS (SELECT event_type, bk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd,
                        CAST(MAX(rho) AS BIGINT) AS m
                 FROM r GROUP BY 1, 2),
           a AS (SELECT event_type, CAST(SUM(nd) AS BIGINT) AS n_exact,
                        CAST(COUNT(*) AS BIGINT) AS n_buckets,
                        CAST(SUM(m) AS BIGINT) AS sum_rho
                 FROM b GROUP BY 1)
      SELECT event_type, n_exact, n_buckets, sum_rho,
             CAST(ROUND(64.0 / 0.77351 * POW(2.0, CAST(sum_rho AS DOUBLE) / 64.0))
               AS BIGINT) AS est
      FROM a ORDER BY event_type""",

    "q_process_bottleneck" -> """
      WITH seq AS (SELECT event_type AS to_type,
                          LAG(event_type) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS from_type,
                          epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS gap_us
                   FROM events),
           t AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
                 FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n, CAST(sum_gap_us // n AS BIGINT) AS mean_gap_us,
             CAST(CASE WHEN from_type = to_type THEN 1 ELSE 0 END AS BIGINT) AS is_rework
      FROM t WHERE n >= 5
      ORDER BY mean_gap_us DESC, from_type ASC, to_type ASC LIMIT 8""",

    "q_clustering_null_model" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS MATERIALIZED (
             SELECT a.pk AS u, b.pk AS v
             FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           tri AS (SELECT CAST(COUNT(*) // 3 AS BIGINT) AS triangles
                   FROM e0 e JOIN ed a ON a.u = e.u
                             JOIN ed b ON b.u = e.v AND a.v = b.v),
           degm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d) AS BIGINT) AS sd,
                           CAST(SUM(d * (d - 1)) AS BIGINT) AS wedges2,
                           CAST(SUM(d * d) AS BIGINT) AS sd2 FROM
                      (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY 1))
      SELECT n AS n_nodes, CAST(sd // 2 AS BIGINT) AS n_edges, triangles,
             CAST(wedges2 // 2 AS BIGINT) AS wedges,
             ROUND(6.0 * CAST(triangles AS DOUBLE) / CAST(wedges2 AS DOUBLE), 6) + 0
               AS c_global,
             ROUND((CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) - CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) - CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE)
                      * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))), 6) + 0 AS c_random
      FROM degm, tri""",

    "q_percolation_threshold" -> """
      WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           e0 AS (SELECT a.pk AS u, b.pk AS v
                  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
           ed AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
           degm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d) AS BIGINT) AS sd,
                           CAST(SUM(d * d) AS BIGINT) AS sd2 FROM
                      (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY 1))
      SELECT n AS n_nodes, CAST(sd // 2 AS BIGINT) AS n_edges,
             ROUND(CAST(sd2 AS DOUBLE) / CAST(sd AS DOUBLE), 6) + 0 AS kappa,
             CAST(CASE WHEN CAST(sd2 AS DOUBLE) / CAST(sd AS DOUBLE) > 2.0
                       THEN 1 ELSE 0 END AS BIGINT) AS giant_component,
             ROUND(CAST(sd AS DOUBLE) / (CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)), 6) + 0
               AS p_critical
      FROM degm""",

    "q_yannakakis_reduction" -> """
      WITH reg AS (SELECT r_regionkey AS rk FROM region WHERE r_name = 'ASIA'),
           nat AS (SELECT n_nationkey AS nk, n_regionkey AS rk FROM nation),
           cust AS (SELECT c_custkey AS ck, c_nationkey AS nk FROM customer),
           ord AS (SELECT o_custkey AS ck FROM orders),
           natd AS MATERIALIZED (SELECT nat.* FROM nat JOIN reg USING (rk)),
           custd AS MATERIALIZED (
             SELECT cust.* FROM cust WHERE nk IN (SELECT nk FROM natd)),
           ordd AS MATERIALIZED (
             SELECT ord.* FROM ord WHERE ck IN (SELECT ck FROM custd)),
           custu AS MATERIALIZED (
             SELECT custd.* FROM custd WHERE ck IN (SELECT ck FROM ordd)),
           natu AS (SELECT natd.* FROM natd WHERE nk IN (SELECT nk FROM custu))
      SELECT * FROM (
        SELECT 'nation' AS relation,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM nat) AS rows_raw,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM natd) AS rows_down,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM natu) AS rows_up
        UNION ALL
        SELECT 'customer', (SELECT CAST(COUNT(*) AS BIGINT) FROM cust),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM custd),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM custu)
        UNION ALL
        SELECT 'orders', (SELECT CAST(COUNT(*) AS BIGINT) FROM ord),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ordd),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ordd)
        UNION ALL
        SELECT '__join_result__', (SELECT CAST(COUNT(*) AS BIGINT) FROM ordd),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ordd),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ordd))
      ORDER BY relation""",

    "q_fd_discovery" -> """
      SELECT lhs, rhs, n_lhs, n_pairs,
             CAST(CASE WHEN n_lhs = n_pairs THEN 1 ELSE 0 END AS BIGINT) AS holds,
             CAST(n_pairs - n_lhs AS BIGINT) AS extra_rhs_values
      FROM (
        SELECT 'customer.c_custkey' AS lhs, 'c_mktsegment' AS rhs,
               (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer) AS n_lhs,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT DISTINCT c_custkey, c_mktsegment FROM customer)) AS n_pairs
        UNION ALL
        SELECT 'customer.c_nationkey', 'c_mktsegment',
               (SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) FROM customer),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer))
        UNION ALL
        SELECT 'orders.o_orderkey', 'o_orderstatus',
               (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT DISTINCT o_orderkey, o_orderstatus FROM orders))
        UNION ALL
        SELECT 'orders.o_custkey', 'o_orderpriority',
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT DISTINCT o_custkey, o_orderpriority FROM orders))
        UNION ALL
        SELECT 'part.p_partkey', 'p_brand',
               (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT) FROM part),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT DISTINCT p_partkey, p_brand FROM part))
        UNION ALL
        SELECT 'part.p_brand', 'p_type',
               (SELECT CAST(COUNT(DISTINCT p_brand) AS BIGINT) FROM part),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                 (SELECT DISTINCT p_brand, p_type FROM part)))
      ORDER BY lhs, rhs""",

    "q_factorized_join_count" -> """
      WITH oc AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
                  FROM orders GROUP BY 1),
           cc AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
                  FROM customer GROUP BY 1),
           f1 AS (SELECT CAST(SUM(ca * cb) AS BIGINT) AS factorized
                  FROM oc JOIN cc USING (k)),
           m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS materialized
                  FROM orders JOIN customer ON c_custkey = o_custkey),
           lo AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
                  FROM lineitem GROUP BY 1),
           oo AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
                  FROM orders GROUP BY 1),
           f2 AS (SELECT CAST(SUM(ca * cb) AS BIGINT) AS factorized
                  FROM lo JOIN oo USING (k)),
           m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS materialized
                  FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
      SELECT * FROM (
        SELECT 'orders_x_customer' AS join_name, factorized, materialized,
               CAST(CASE WHEN factorized = materialized THEN 1 ELSE 0 END AS BIGINT)
                 AS identity_holds
        FROM f1, m1
        UNION ALL
        SELECT 'lineitem_x_orders', factorized, materialized,
               CAST(CASE WHEN factorized = materialized THEN 1 ELSE 0 END AS BIGINT)
        FROM f2, m2)
      ORDER BY join_name""",

    "q_condorcet_copeland" -> """
      WITH rev AS (
        SELECT c_mktsegment AS segment, p_brand AS brand,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rev_cents
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2),
      ballots AS (
        SELECT segment, brand,
               CAST(ROW_NUMBER() OVER (PARTITION BY segment
                 ORDER BY rev_cents DESC, brand) AS BIGINT) AS rk
        FROM rev),
      duels AS (
        SELECT a.brand AS x, b.brand AS y,
               SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS x_wins,
               SUM(CASE WHEN a.rk > b.rk THEN 1 ELSE 0 END) AS y_wins
        FROM ballots a JOIN ballots b
          ON a.segment = b.segment AND a.brand < b.brand
        GROUP BY 1, 2),
      per AS (
        SELECT x AS brand,
               CASE WHEN x_wins > y_wins THEN 1 ELSE 0 END AS mw,
               CASE WHEN x_wins < y_wins THEN 1 ELSE 0 END AS ml
        FROM duels
        UNION ALL
        SELECT y,
               CASE WHEN y_wins > x_wins THEN 1 ELSE 0 END,
               CASE WHEN y_wins < x_wins THEN 1 ELSE 0 END
        FROM duels)
      SELECT brand,
             CAST(SUM(mw) AS BIGINT) AS majority_wins,
             CAST(SUM(ml) AS BIGINT) AS majority_losses,
             CAST(SUM(mw) - SUM(ml) AS BIGINT) AS copeland_score,
             CAST(CASE WHEN SUM(mw) = COUNT(*) THEN 1 ELSE 0 END AS BIGINT)
               AS is_condorcet_winner
      FROM per GROUP BY brand
      ORDER BY copeland_score DESC, brand LIMIT 10""",

    "q_rrf_fusion" -> """
      WITH rev AS (
        SELECT c_mktsegment AS segment, p_brand AS brand,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rev_cents
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2),
      ballots AS (
        SELECT segment, brand,
               CAST(ROW_NUMBER() OVER (PARTITION BY segment
                 ORDER BY rev_cents DESC, brand) AS BIGINT) AS rk
        FROM rev)
      SELECT brand,
             CAST(SUM(1000000000 // (60 + rk)) AS BIGINT) AS rrf_e9,
             CAST(COUNT(*) AS BIGINT) AS n_ballots,
             CAST(MIN(rk) AS BIGINT) AS best_rank,
             CAST(MAX(rk) AS BIGINT) AS worst_rank
      FROM ballots GROUP BY brand
      ORDER BY rrf_e9 DESC, brand LIMIT 10""",

    "q_kemeny_distance" -> """
      WITH rev AS (
        SELECT c_mktsegment AS segment, p_brand AS brand,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rev_cents
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2),
      ballots AS (
        SELECT segment, brand,
               CAST(ROW_NUMBER() OVER (PARTITION BY segment
                 ORDER BY rev_cents DESC, brand) AS BIGINT) AS rk
        FROM rev),
      grev AS (
        SELECT p_brand AS brand,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rev_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1),
      g AS (
        SELECT a.brand, CAST(1 + COUNT(b.brand) AS BIGINT) AS grk
        FROM grev a LEFT JOIN grev b
          ON b.rev_cents > a.rev_cents
             OR (b.rev_cents = a.rev_cents AND b.brand < a.brand)
        GROUP BY a.brand),
      wg AS (
        SELECT segment, ballots.brand AS brand, rk, grk
        FROM ballots JOIN g ON g.brand = ballots.brand)
      SELECT a.segment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN (a.rk < b.rk) <> (a.grk < b.grk)
               THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
             CAST(SUM(CASE WHEN (a.rk < b.rk) <> (a.grk < b.grk)
               THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
               AS kemeny_dist_e6
      FROM wg a JOIN wg b
        ON a.segment = b.segment AND a.brand < b.brand
      GROUP BY 1 ORDER BY segment""",

    "q_bradley_terry_step" -> """
      WITH rev AS (
        SELECT c_mktsegment AS segment, p_brand AS brand,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rev_cents
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2),
      ballots AS (
        SELECT segment, brand,
               CAST(ROW_NUMBER() OVER (PARTITION BY segment
                 ORDER BY rev_cents DESC, brand) AS BIGINT) AS rk
        FROM rev),
      duels AS (
        SELECT a.brand AS x, b.brand AS y,
               CAST(SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins_xy,
               CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM ballots a JOIN ballots b
          ON a.segment = b.segment AND a.brand <> b.brand
        GROUP BY 1, 2),
      w1 AS (
        SELECT x AS brand, CAST(SUM(wins_xy) AS BIGINT) AS wins,
               CAST(SUM(wins_xy) * 1000 AS BIGINT) AS w1_e3
        FROM duels GROUP BY 1),
      den AS (
        SELECT d.x AS brand,
               CAST(SUM(d.n_xy * 1000000000 // (wx.w1_e3 + wy.w1_e3)) AS BIGINT)
                 AS den_e6
        FROM duels d
        JOIN w1 wx ON wx.brand = d.x
        JOIN w1 wy ON wy.brand = d.y
        GROUP BY 1),
      w2 AS (
        SELECT w1.brand AS brand, wins, w1_e3,
               CAST(wins * 1000000000 // den_e6 AS BIGINT) AS w2_e3
        FROM w1 JOIN den ON den.brand = w1.brand),
      r1 AS (
        SELECT a.brand, CAST(1 + COUNT(b.brand) AS BIGINT) AS rank_iter1
        FROM w2 a LEFT JOIN w2 b
          ON b.w1_e3 > a.w1_e3 OR (b.w1_e3 = a.w1_e3 AND b.brand < a.brand)
        GROUP BY a.brand),
      r2 AS (
        SELECT a.brand, CAST(1 + COUNT(b.brand) AS BIGINT) AS rank_iter2
        FROM w2 a LEFT JOIN w2 b
          ON b.w2_e3 > a.w2_e3 OR (b.w2_e3 = a.w2_e3 AND b.brand < a.brand)
        GROUP BY a.brand)
      SELECT w2.brand AS brand, wins, w1_e3, w2_e3, rank_iter1, rank_iter2,
             CAST(rank_iter1 - rank_iter2 AS BIGINT) AS rank_shift
      FROM w2
      JOIN r1 ON r1.brand = w2.brand
      JOIN r2 ON r2.brand = w2.brand
      ORDER BY rank_iter2, brand LIMIT 10""",

  )
}
