package graft.queries

import graft.Tables
import graft.functions.Text
import graft.operators.{Asof, Bloom}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Dsl._

/** SURVEY §2.9 — extended relational + pipeline operators (#50-61).
  *
  * Statistical aggregates, exact percentiles, analytic windows, grouping
  * sets, array build/explode round-trips, as-of and range joins over the
  * event stream, JSON extraction, and the training-data curation ops
  * (deterministic sampling, keep-best dedup, quality filtering). All
  * oracle-checked.
  */
object ExtendedSuite {

  /** Exact decimal second moments: l_quantity is integral (1..50), so
    * scale-1/2 decimals hold every sum exactly and the decimal→double
    * casts are exact (scaled integers < 2^53) in both engines; the final
    * variance arithmetic is then identical IEEE double math on identical
    * operands.
    */
  private def dq(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 1))
  private val dqSql = (x: String) => s"CAST($x AS DECIMAL(12,1))"

  val queries: Seq[Q] = Seq(

    // #50 statistical aggregates from exact decimal moments: sample
    // variance/stddev of l_quantity and its correlation with l_linenumber,
    // all derived from decimal-exact Σx, Σx², Σxy (single pass, map-side
    // partial agg) — not the engines' own stddev/corr, whose float
    // summation order differs across partitions.
    Q("agg_stats", (s, d) => {
      val li = Tables.lineitem(s, d)
      val agg = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum(dq(col("l_quantity"))).cast("double").as("sx"),
        sum(dq(col("l_quantity")) * dq(col("l_quantity"))).cast("double").as("sxx"),
        sum(col("l_linenumber").cast(DecimalType(12, 0))).cast("double").as("sy"),
        sum((col("l_linenumber") * col("l_linenumber")).cast(DecimalType(12, 0)))
          .cast("double").as("syy"),
        sum(dq(col("l_quantity")) * col("l_linenumber").cast(DecimalType(12, 0)))
          .cast("double").as("sxy"))
      agg.select(col("l_returnflag"),
          col("n").cast("long").as("n"),
          ((col("n") * col("sxx") - col("sx") * col("sx")) /
            (col("n") * (col("n") - 1))).as("var_q"),
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
            (col("n") * (col("n") - 1))).as("stddev_q"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_q_ln"))
        .orderBy("l_returnflag")
    },
      Some(s"""WITH m AS (SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(${dqSql("l_quantity")}) AS DOUBLE) AS sx,
                 CAST(SUM(${dqSql("l_quantity")} * ${dqSql("l_quantity")}) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_linenumber AS DECIMAL(12,0))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_linenumber * l_linenumber AS DECIMAL(12,0))) AS DOUBLE) AS syy,
                 CAST(SUM(${dqSql("l_quantity")} * CAST(l_linenumber AS DECIMAL(12,0))) AS DOUBLE) AS sxy
               FROM lineitem GROUP BY l_returnflag)
               SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                 (n*sxx - sx*sx) / (n*(n-1)) AS var_q,
                 sqrt((n*sxx - sx*sx) / (n*(n-1))) AS stddev_q,
                 (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) AS corr_q_ln
               FROM m ORDER BY l_returnflag""")),

    // #51 exact discrete percentiles (no interpolation → values come
    // straight from the data; the one percentile definition that is
    // bit-identical across engines). WITHIN GROUP syntax runs verbatim in
    // both Spark SQL and DuckDB.
    Q("percentile_agg", (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_q,
                 percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_q,
                 percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
      Some("""SELECT l_returnflag,
                percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_q,
                percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_q,
                percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // #52 analytic tiles: ntile/percent_rank/cume_dist over a total order
    // (tie-broken by key) — rank arithmetic is integer-derived, exact.
    Q("window_ntile", (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    },
      Some("""SELECT o_orderkey, o_orderpriority,
                ntile(4) OVER w AS quartile,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cume
              FROM orders
              WINDOW w AS (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey""")),

    // #53 GROUPING SETS (the general form behind rollup/cube); identical
    // SQL both engines, NULL group markers coalesced to a label.
    Q("grouping_sets", (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(groupingSetsSql)
    }, Some(groupingSetsSql)),

    // #54 array build: per-order sorted line-number list (string-joined →
    // byte-identical across engines) + count.
    Q("agg_collect", (s, d) =>
      Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("lines"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
                array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
                COUNT(*) AS n_lines
              FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // #55 explode/unnest round-trip: tokenize a document slice, explode,
    // re-aggregate to a token frequency table.
    Q("explode_unnest", (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(explode(Text.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .orderBy("token"),
      Some("""SELECT token, COUNT(*) AS freq FROM (
                SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
                FROM documents WHERE doc_id < 100) t
              GROUP BY token ORDER BY token""")),

    // #56 as-of join: latest click at-or-before each purchase, per user
    // (graft.operators.Asof: tagged-union + window, one shuffle). Oracle is
    // DuckDB's native ASOF LEFT JOIN. Epoch-µs outputs: exact integers.
    Q("join_asof", (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click").select("user_id", "ts")
      Asof.joinAsof(purchases, clicks, "user_id", "ts", Seq("ts"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("click_us"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("event_id")
    },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
                epoch_us(c.ts) AS click_us,
                epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON p.user_id = c.user_id AND p.ts >= c.ts
              ORDER BY p.event_id""")),

    // #57 range (band) join: per-user event pairs within a 5-minute
    // window. The time axis is banded INTO the equality key (bucket =
    // floor(ts/5min); the right side joins under its own and previous
    // bucket, which covers every in-range pair exactly once) — so the join
    // explodes per (user, bucket), not per user. On a user with n events
    // over a long history, the naive user-only key builds n² candidate
    // pairs; banding builds only the near-diagonal ones.
    Q("join_range", (s, d) => {
      val bucketUs = 300L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"),
          floor(unix_micros(col("ts")) / bucketUs).as("bk"))
      val a = ev.select(col("user_id"), col("ts").as("ts_a"), col("bk"))
      val b0 = ev.select(col("user_id"), col("ts").as("ts_b"), col("bk"))
      val b = b0.unionAll(b0.withColumn("bk", col("bk") - 1))
      a.join(b, Seq("user_id", "bk"))
        .filter(col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTE"))
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
      Some("""SELECT a.user_id, COUNT(*) AS n_pairs
              FROM events a JOIN events b ON a.user_id = b.user_id
                AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
              GROUP BY a.user_id ORDER BY a.user_id""")),

    // #58 JSON extraction from the event props payload + integer rollup.
    Q("json_funcs", (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
                MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
                MAX(CAST(props->>'k' AS BIGINT)) AS max_k
              FROM events WHERE CAST(props->>'k' AS BIGINT) > 50
              GROUP BY event_type ORDER BY event_type""")),

    // #59 deterministic hash sampling (training-data splits that are
    // reproducible across engines and runs — no RNG): md5-prefix buckets
    // give a stable 1/8 sample.
    Q("sample_hash", (s, d) =>
      Tables.documents(s, d)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source FROM documents
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1')
              ORDER BY doc_id""")),

    // #82 on-disk partition pruning: events re-laid-out partitionBy(
    // event_type); a filtered read must prune at the DIRECTORY level
    // (PartitionFilters, plan-audited) — at 100 TB, partition layout is
    // what turns "scan everything" into "scan 1/5th".
    Q("partition_pruning", (s, d) => {
      val dir = s"/tmp/graft_parts/events_" + d.replaceAll("[^a-zA-Z0-9]", "_")
      if (!new java.io.File(dir).exists()) {
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            unix_micros(col("ts")).as("ts_us"), col("event_type"))
          .write.partitionBy("event_type").mode("overwrite").parquet(dir)
      }
      s.read.parquet(dir)
        .filter(col("event_type") === "purchase")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    },
      Some(s"""SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
               FROM events WHERE event_type = 'purchase'
               GROUP BY event_type ORDER BY event_type""")),

    // #85 the end-to-end curation pipeline as ONE declarative plan:
    // exact-dedup keeper selection (#36) ∘ quality gate (#61) ∘
    // deterministic 50% sample (#59) → cleaned corpus + per-source stats.
    // Catalyst fuses all three into a single scan+window pass.
    Q("corpus_clean", (s, d) => {
      val w = Window.partitionBy("fp")
      val digitRatio =
        length(regexp_replace(col("text"), "[^0-9]", "")) / length(col("text"))
      Tables.documents(s, d)
        .withColumn("fp", Text.fingerprint(col("text")))
        .withColumn("keep_dedup", col("doc_id") === min(col("doc_id")).over(w))
        .filter(col("keep_dedup") &&
          col("n_chars") >= 50 && Text.tokenCount(col("text")) >= 5 &&
          digitRatio < 0.3 &&
          // md5-prefix compared as a hex STRING ('80' = bucket 128/256):
          // fixed-width lowercase hex sorts numerically, and byte-wise
          // string comparison is identical in every engine version
          // (hex-parsing casts are not).
          substring(md5(col("doc_id").cast("string")), 1, 2) < "80")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy("source")
    },
      Some("""WITH f AS (
                SELECT doc_id, source, n_chars, text,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
                FROM documents),
              kept AS (
                SELECT * FROM (
                  SELECT doc_id, source, n_chars, text,
                         (doc_id = MIN(doc_id) OVER (PARTITION BY fp)) AS keep_dedup
                  FROM f) t
                WHERE keep_dedup
                  AND n_chars >= 50
                  AND len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) >= 5
                  AND LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) / LENGTH(text) < 0.3
                  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80')
              SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS n_chars
              FROM kept GROUP BY source ORDER BY source""")),

    // #84 unpivot/melt — the inverse of #22 pivot: measure columns to
    // (name, value) rows. Values pass through unchanged → exact oracle.
    Q("unpivot_melt", (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .filter(col("l_orderkey") < 200)
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some("""SELECT l_orderkey, l_linenumber, measure, val FROM (
                UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
                         FROM lineitem WHERE l_orderkey < 200)
                ON l_quantity, l_discount, l_tax INTO NAME measure VALUE val)
              ORDER BY l_orderkey, l_linenumber, measure""")),

    // #83 approximate quantiles (Greenwald-Khanna percentile_approx,
    // rows-only: sketch internals are engine-specific; the exact twin
    // #51 percentile_agg is the oracle-checked counterpart).
    Q("approx_quantile", (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("approx_p99"))
        .orderBy("l_returnflag"), None),

    // #80 histogram binning: fixed-width buckets over order value — the
    // data-profiling primitive behind every distribution dashboard.
    Q("histogram_bins", (s, d) =>
      Tables.orders(s, d)
        .withColumn("bin", floor(col("o_totalprice") / 50000).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("bin"),
      Some(s"""SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
                 COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
               FROM orders GROUP BY bin ORDER BY bin""")),

    // #81 column profiling: per-column cardinality/extremes in one pass
    // over the table per column family — the "describe" a curation
    // pipeline runs before trusting a new corpus drop.
    Q("table_profile", (s, d) => {
      val o = Tables.orders(s, d)
      def prof(c: String, expr0: org.apache.spark.sql.Column) = o.agg(
        lit(c).as("col"), count(lit(1)).as("n_rows"),
        countDistinct(expr0).as("n_distinct"),
        min(expr0).cast("string").as("min_v"), max(expr0).cast("string").as("max_v"))
      prof("o_custkey", col("o_custkey"))
        .unionAll(prof("o_orderstatus", col("o_orderstatus")))
        .unionAll(prof("o_orderpriority", col("o_orderpriority")))
        .orderBy("col")
    },
      Some("""SELECT 'o_custkey' AS col, COUNT(*) AS n_rows,
                COUNT(DISTINCT o_custkey) AS n_distinct,
                CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
                CAST(MAX(o_custkey) AS VARCHAR) AS max_v FROM orders
              UNION ALL
              SELECT 'o_orderstatus', COUNT(*), COUNT(DISTINCT o_orderstatus),
                MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
              UNION ALL
              SELECT 'o_orderpriority', COUNT(*), COUNT(DISTINCT o_orderpriority),
                MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
              ORDER BY col""")),

    // #78 scalar subquery in the projection: each order against the
    // all-orders average (identical SQL both engines; exact decimal avg).
    Q("scalar_subquery", (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(scalarSubquerySql)
    }, Some(scalarSubquerySql)),

    // #79 RANGE window frame: per-user rolling 1-hour event count — the
    // frame is value-based (epoch seconds), not row-based.
    Q("window_range_frame", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("es"))
        .rangeBetween(-3600L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts) div 1000000").as("es"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .select("event_id", "user_id", "n_last_hour")
        .orderBy("event_id")
    },
      Some("""SELECT event_id, user_id,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
              FROM events ORDER BY event_id""")),

    // #77 salted two-phase aggregation: the skew pattern for hot keys.
    // events.event_type has 5 values over 100k+ rows — a direct groupBy
    // sends every hot key's rows to one reducer; salting fans each key
    // over 16 partial aggregates first, then merges 5×16 tiny rows.
    // (AQE also mitigates skew at runtime; salting is the plan-level
    // guarantee.) Oracle = the plain group-by: same result by definition.
    Q("groupby_salted", (s, d) => {
      val salted = Tables.events(s, d)
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
      salted.groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("sv")).cast("double").as("sum_value"))
        .orderBy("event_type")
    },
      Some(s"""SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
               FROM events GROUP BY event_type ORDER BY event_type""")),

    // #74 NULL semantics (the reference explicitly lacks NULLs; first-
    // class here): NULLIF-derived nulls through count/null-safe equality/
    // coalesce.
    Q("null_handling", (s, d) =>
      Tables.orders(s, d)
        .withColumn("st", nullif(col("o_orderstatus"), lit("P")))
        .agg(count(lit(1)).as("n_rows"),
          count(col("st")).as("n_nonnull"),
          sum(when(col("st").isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(col("st") <=> lit("O"), 1L).otherwise(0L)).as("n_nullsafe_eq"),
          count(coalesce(col("st"), lit("P"))).as("n_coalesced")),
      Some("""SELECT COUNT(*) AS n_rows, COUNT(st) AS n_nonnull,
                CAST(SUM(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
                COUNT(COALESCE(st, 'P')) AS n_coalesced
              FROM (SELECT NULLIF(o_orderstatus, 'P') AS st FROM orders) t""")),

    // #75 regex family: extract / extract-all count / match / replace
    // (Java regex and RE2 agree on these patterns).
    Q("regex_funcs", (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract(col("text"), "([0-9]+)", 1).as("first_num"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_nums"),
          when(col("text").rlike("data"), 1).otherwise(0).as("mentions_data"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("len_novowels"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                regexp_extract(text, '([0-9]+)', 1) AS first_num,
                CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums,
                CASE WHEN regexp_matches(text, 'data') THEN 1 ELSE 0 END AS mentions_data,
                CAST(LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER) AS len_novowels
              FROM documents ORDER BY doc_id""")),

    // #76 boolean aggregates: every/any/count_if per group.
    Q("bool_aggs", (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("every(l_quantity > 0)").as("all_pos"),
          expr("any(l_discount > 0.09)").as("any_high_disc"),
          expr("count_if(l_tax = 0)").as("n_notax"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                bool_and(l_quantity > 0) AS all_pos,
                bool_or(l_discount > 0.09) AS any_high_disc,
                COUNT(*) FILTER (WHERE l_tax = 0) AS n_notax
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // #60 keep-best dedup: within each exact-duplicate group keep the
    // longest document (ties → lowest id) — the curation twin of
    // dedup_exact's keep-first policy.
    Q("dedup_keep_best", (s, d) => {
      val w = Window.partitionBy("fp")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), Text.fingerprint(col("text")).as("fp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "fp", "n_chars")
        .orderBy("doc_id")
    },
      Some("""WITH f AS (SELECT doc_id, n_chars,
                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
              FROM documents),
              r AS (SELECT doc_id, fp, n_chars,
                ROW_NUMBER() OVER (PARTITION BY fp
                                   ORDER BY n_chars DESC, doc_id) AS rn
              FROM f)
              SELECT doc_id, fp, n_chars FROM r WHERE rn = 1 ORDER BY doc_id""")),

    // #61 quality filtering: the standard pretraining gate (length band +
    // digit-ratio cap), fully SQL-expressible so the whole filter pushes
    // into the scan pipeline.
    Q("quality_filter", (s, d) => {
      val nTokens = Text.tokenCount(col("text"))
      val digitRatio =
        length(regexp_replace(col("text"), "[^0-9]", "")) / length(col("text"))
      Tables.documents(s, d)
        .filter(col("n_chars") >= 50 && nTokens >= 5 && digitRatio < 0.3)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id, lang, n_chars FROM documents
              WHERE n_chars >= 50
                AND len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) >= 5
                AND LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) / LENGTH(text) < 0.3
              ORDER BY doc_id"""))
  )

  /** #62-64: training-corpus assembly ops (+ #70 custom physical op). */
  val curation: Seq[Q] = Seq(

    // #70 top-k per key via the custom TopKPerKey LogicalPlan/Strategy/
    // SparkPlan (bounded heap per key — O(n log k), no per-partition
    // sort). Oracle = the window row_number formulation in DuckDB.
    Q("topk_per_key", (s, d) =>
      graft.plans.TopK.perKey(Tables.orders(s, d), 3,
          Seq(col("o_orderpriority")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
                SELECT o_orderkey, o_orderpriority, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t
              WHERE rn <= 3 ORDER BY o_orderpriority, o_orderkey""")),

    // #71 bucketed co-located join: both fact tables bucketed (and
    // sorted) on the join key, so the SortMergeJoin runs with NO exchange
    // on either side — at 100 TB, pre-bucketing the stored tables deletes
    // the dominant shuffle from every keyed join against them.
    // (Writes the bucketed tables on first use per session; the measured
    // op is the shuffle-free join itself plus that one-time layout cost.)
    Q("join_bucketed", (s, d) => {
      val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
      val (lt, ot) = (s"lineitem_bkt_$tag", s"orders_bkt_$tag")
      if (!s.catalog.tableExists(lt)) {
        Tables.lineitem(s, d).write.format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"/tmp/graft_buckets/$lt")
          .mode("overwrite").saveAsTable(lt)
        Tables.orders(s, d).write.format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"/tmp/graft_buckets/$ot")
          .mode("overwrite").saveAsTable(ot)
      }
      s.table(ot).hint("merge")
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
      Some(s"""SELECT o_orderpriority, ${dsumSql("l_quantity")} AS sum_qty,
                 COUNT(*) AS n
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // #62 sequence packing: assign docs to fixed token-budget chunks by
    // prefix-sum + integer division, per source shard (the per-shard
    // partitioning is what keeps the window parallel at 100 TB — a global
    // pack would serialize on one partition). Emits per-chunk stats.
    Q("pack_chunks", (s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), Text.tokenCount(col("text")).as("toks"))
        .withColumn("chunk_id",
          floor(coalesce(sum(col("toks")).over(w), lit(0)) / 512).cast("long"))
        .groupBy("source", "chunk_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).cast("long").as("n_tokens"))
        .orderBy("source", "chunk_id")
    },
      Some("""WITH t AS (SELECT source, doc_id,
                CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS INTEGER) AS toks
              FROM documents),
              c AS (SELECT source, doc_id, toks,
                CAST(FLOOR(COALESCE(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT) AS chunk_id
              FROM t)
              SELECT source, chunk_id, COUNT(*) AS n_docs,
                     CAST(SUM(toks) AS BIGINT) AS n_tokens
              FROM c GROUP BY source, chunk_id ORDER BY source, chunk_id""")),

    // #63 kNN classification: majority label of the 5 nearest neighbors
    // (cosine), ties broken by label — composition of the ANN operator
    // with a windowed argmax.
    Q("knn_classify", (s, d) => {
      val embs = Tables.embeddings(s, d)
      val nn = graft.operators.Ann.bruteForce(embs, embs.filter(col("vec_id") % 100 === 0), k = 5)
      val labeled = nn.join(
        embs.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      val votes = labeled.groupBy("query_id", "label")
        .agg(count(lit(1)).as("n_votes"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("n_votes").desc, col("label").asc)
      votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("label").as("predicted"), col("n_votes"))
        .orderBy("query_id")
    },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                         FROM embeddings WHERE vec_id % 100 = 0),
              scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
                                list_cosine_similarity(e.embedding, q.qv) AS cos
                         FROM embeddings e, q WHERE e.vec_id <> q.query_id),
              topk AS (SELECT query_id, label FROM (
                         SELECT query_id, label,
                                ROW_NUMBER() OVER (PARTITION BY query_id
                                                   ORDER BY cos DESC, neighbor_id) AS rank
                         FROM scored) WHERE rank <= 5),
              votes AS (SELECT query_id, label, COUNT(*) AS n_votes
                        FROM topk GROUP BY query_id, label)
              SELECT query_id, label AS predicted, n_votes FROM (
                SELECT query_id, label, n_votes,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY n_votes DESC, label) AS rn
                FROM votes) WHERE rn = 1 ORDER BY query_id""")),

    // #64 weighted source mixing: per-source keep rates applied through
    // deterministic md5 buckets (0-255) — the reproducible version of
    // "sample web at 25%, books at 75%" corpus mixing.
    Q("mix_sources", (s, d) => {
      // Keep rates expressed as md5-prefix hex-string bounds ('40' = 64/256,
      // 'c0' = 192/256): fixed-width lowercase hex sorts numerically, and
      // byte-wise string comparison is stable across engine versions
      // (hex-parsing casts are not).
      val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
      val keepBelow = when(
        col("source").isin("src0", "src1", "src2", "src3", "src4",
          "src5", "src6", "src7", "src8", "src9"), "40").otherwise("c0")
      Tables.documents(s, d)
        .filter(bucket < keepBelow)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
        .orderBy("source")
    },
      Some("""SELECT source, COUNT(*) AS n_kept,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_kept
              FROM documents
              WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                    < CASE WHEN source IN ('src0','src1','src2','src3','src4',
                                           'src5','src6','src7','src8','src9')
                           THEN '40' ELSE 'c0' END
              GROUP BY source ORDER BY source""")),

    // #88 deterministic corpus shuffle: reproducible training order as 256
    // md5 shards with a within-shard rank. Per-shard windows keep the
    // ranking parallel at 100 TB (a single global row_number would
    // serialize on one partition — this is the sharded form trainers
    // actually materialize).
    // Temperature-scaled source mixing — the standard LLM-corpus recipe:
    // per-source sampling probability p_s ∝ w_s^(1/T) with w_s = source
    // size, normalized so the largest source keeps everything. T = 2 here
    // because sqrt is IEEE-correctly-rounded in BOTH engines (unlike
    // pow), so p_s and its 2^32-scaled cutoff are bit-identical
    // cross-engine; selection is the deterministic md5-prefix draw
    // compared as fixed-width hex STRINGS (sorts numerically, no
    // version-sensitive hex casts). Everything is one broadcast of
    // source-level cutoffs — at 100 TB the corpus is scanned once and
    // filtered in codegen, no shuffle beyond the per-source count.
    Q("corpus_mix_temperature", (s, d) => {
      val docs = Tables.documents(s, d)
      val srcN = docs.groupBy("source")
        .agg(count(lit(1)).cast("double").as("n_src"))
      val maxW = srcN.agg(max(sqrt(col("n_src"))).as("w_max"))
      val cut = srcN.crossJoin(broadcast(maxW))
        .withColumn("cutoff",
          floor(sqrt(col("n_src")) / col("w_max") * lit(4294967296.0)).cast("long"))
        .select("source", "cutoff")
      docs.join(broadcast(cut), "source")
        .filter(col("cutoff") >= 4294967296L ||
          substring(md5(col("doc_id").cast("string")), 1, 8) <
            format_string("%08x", col("cutoff")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          min("doc_id").as("mn_id"), max("doc_id").as("mx_id"))
        .orderBy("source")
    },
      Some("""WITH srcn AS (
                SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_src
                FROM documents GROUP BY source),
              mx AS (SELECT MAX(sqrt(n_src)) AS w_max FROM srcn),
              cut AS (SELECT source,
                CAST(FLOOR(sqrt(n_src) / w_max * 4294967296.0) AS BIGINT) AS cutoff
                FROM srcn, mx)
              SELECT d.source, COUNT(*) AS n_kept,
                MIN(d.doc_id) AS mn_id, MAX(d.doc_id) AS mx_id
              FROM documents d JOIN cut c ON d.source = c.source
              WHERE c.cutoff >= 4294967296
                 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < printf('%08x', c.cutoff)
              GROUP BY d.source ORDER BY d.source""")),

    Q("corpus_shuffle", (s, d) => {
      val key = md5(col("doc_id").cast("string"))
      val w = Window.partitionBy("shard").orderBy(col("_k"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), key.as("_k"), substring(key, 1, 2).as("shard"))
        .withColumn("pos_in_shard", row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos_in_shard")
        .orderBy("shard", "pos_in_shard")
    },
      Some("""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
                     ROW_NUMBER() OVER (
                       PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos_in_shard
              FROM documents ORDER BY shard, pos_in_shard""")),

    // #89 eval-set decontamination: flag train docs sharing any word
    // 3-gram with the held-out eval slice (doc_id % 97 == 0) — the
    // n-gram-overlap contamination check run before training. Grams are
    // exploded then equality-joined (shuffle on gram hash, never a
    // cross product), so the plan is the 100 TB shape.
    Q("corpus_decontaminate", (s, d) => {
      val docs = Tables.documents(s, d)
      // native k-gram kernel (r18): value-identical to the former
      // split → filter(size>=3) → transform(slice/concat_ws) chain —
      // Text.wordNgrams yields the same space-joined grams as zero-copy
      // slices and empty arrays (< 3 tokens) explode to nothing
      val grams = docs.select(col("doc_id"),
        explode(Text.wordNgrams(col("text"), 3)).as("gram"))
      val evalGrams = grams.filter(col("doc_id") % 97 === 0)
        .select("gram").distinct()
      val hits = grams.filter(col("doc_id") % 97 =!= 0)
        .join(evalGrams, "gram")
        .groupBy("doc_id").agg(countDistinct(col("gram")).as("n_hits"))
      docs.filter(col("doc_id") % 97 =!= 0).select("doc_id")
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("tainted"))
        .orderBy("doc_id")
    },
      Some("""WITH toks AS (SELECT doc_id,
                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
              FROM documents),
              grams AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
                        FROM toks, UNNEST(range(1, greatest(len(t)-2, 0)+1)) AS u(i)
                        WHERE len(t) >= 3),
              evalset AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
              hits AS (SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hits
                       FROM grams g JOIN evalset e USING (gram)
                       WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id)
              SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                     COALESCE(h.n_hits, 0) > 0 AS tainted
              FROM documents d LEFT JOIN hits h USING (doc_id)
              WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""")),

    // #90 corpus n-gram statistics: top-20 bigrams by frequency with a
    // deterministic tie-break — the frequency table behind contamination
    // and boilerplate analyses. Explode → partial-agg count → TopK: one
    // shuffle of (gram, partial count), never of raw text.
    Q("corpus_ngram_stats", (s, d) => {
      // native bigram kernel (r18): value-identical to the former
      // split → filter(size>=2) → transform(slice/concat_ws) chain (see
      // Text.wordNgrams) — one codegen pass, no token array or per-gram
      // slice/concat allocations in the hot explode path
      Tables.documents(s, d)
        .select(explode(Text.wordNgrams(col("text"), 2)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram").asc)
        .limit(20)
    },
      Some("""WITH toks AS (SELECT
                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
              FROM documents),
              grams AS (SELECT array_to_string(t[i:i+1], ' ') AS gram
                        FROM toks, UNNEST(range(1, greatest(len(t)-1, 0)+1)) AS u(i)
                        WHERE len(t) >= 2)
              SELECT gram, COUNT(*) AS n FROM grams
              GROUP BY gram ORDER BY n DESC, gram LIMIT 20""")),

    // #109 exact stratified sampling: 20% per language, chosen by md5
    // rank — per-stratum window + integer-exact quota, so every stratum
    // keeps exactly ceil(n/5) docs and reruns are reproducible. The
    // windows partition by stratum, so the op parallelizes across strata
    // at corpus scale (contrast a global orderBy-limit sample, which
    // funnels through one sort).
    Q("sample_stratified", (s, d) => {
      val n = Window.partitionBy("lang")
      val rn = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("n_stratum", count(lit(1)).over(n))
        .withColumn("rn", row_number().over(rn).cast("long"))
        .filter(col("rn") <= (col("n_stratum") + 4) / 5)
        .select("doc_id", "lang", "source", "n_stratum", "rn")
        .orderBy("lang", "rn")
    },
      Some("""WITH t AS (SELECT doc_id, lang, source,
                COUNT(*) OVER (PARTITION BY lang) AS n_stratum,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
              SELECT doc_id, lang, source, n_stratum, CAST(rn AS BIGINT) AS rn
              FROM t WHERE rn <= (n_stratum + 4) // 5
              ORDER BY lang, rn""")),

    // #110 decontamination behind a Bloom prefilter: the eval side's
    // 3-grams build a fixed-size bloom (one bounded groupBy-bit_or
    // shuffle), the corpus side's grams probe it BEFORE the equality
    // join, and only bloom-surviving grams — contaminated ones plus the
    // fp rate — reach the shuffle. The exact join then removes false
    // positives, so the result equals exact decontamination (#89, same
    // oracle shape) while the gram shuffle shrinks from |corpus grams| to
    // ~|contaminated grams|. At 100 TB this is the difference between
    // shuffling the whole corpus's gram stream and shuffling a sliver.
    Q("corpus_bloom_decontaminate", (s, d) => {
      val docs = Tables.documents(s, d)
      // same native k-gram kernel as corpus_decontaminate (r18)
      val grams = docs.select(col("doc_id"),
        explode(Text.wordNgrams(col("text"), 3)).as("gram"))
      val evalGrams = grams.filter(col("doc_id") % 89 === 0)
        .select("gram").distinct()
      val bloom = Bloom.build(evalGrams, col("gram"), numBits = 1 << 17)
      val hits = grams.filter(col("doc_id") % 89 =!= 0)
        .filter(Bloom.mightContain(bloom, col("gram")))
        .join(evalGrams, "gram")
        .groupBy("doc_id").agg(countDistinct(col("gram")).as("n_hits"))
      docs.filter(col("doc_id") % 89 =!= 0).select("doc_id")
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("tainted"))
        .orderBy("doc_id")
    },
      Some("""WITH toks AS (SELECT doc_id,
                string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
              FROM documents),
              grams AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
                        FROM toks, UNNEST(range(1, greatest(len(t)-2, 0)+1)) AS u(i)
                        WHERE len(t) >= 3),
              evalset AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 89 = 0),
              hits AS (SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hits
                       FROM grams g JOIN evalset e USING (gram)
                       WHERE g.doc_id % 89 <> 0 GROUP BY g.doc_id)
              SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                     COALESCE(h.n_hits, 0) > 0 AS tainted
              FROM documents d LEFT JOIN hits h USING (doc_id)
              WHERE d.doc_id % 89 <> 0 ORDER BY d.doc_id"""))
  )

  /** #78's SQL — identical in Spark SQL and DuckDB; exact decimal avg so
    * the ratio's operands (and hence the double division) agree bitwise.
    */
  private def scalarSubquerySql: String =
    """SELECT o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) /
      |    (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
      |     FROM orders) AS price_vs_avg
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** #53's SQL — one string, runs verbatim in Spark SQL and DuckDB.
    * (A `def`: object-initialization order must not matter here — `queries`
    * above references it during its own initializer.)
    */
  private def groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY rf, ls""".stripMargin
}
