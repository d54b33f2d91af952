package graft.queries

import graft.Tables
import graft.functions.Text
import graft.operators.{Ann, Dedup, Multimodal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2.4 (dedup), §2.5 (similarity search), §2.6 (text analysis) —
  * the LLM-training-data pipeline operators, over `documents` and
  * `embeddings`.
  *
  * Sketch-based ops (MinHash/SimHash/SRP) are rows-only: their outputs are
  * engine-specific signatures, so the driver checks shape while the
  * ScalaTest specs assert semantics (recall vs exact baselines). Everything
  * SQL-expressible is oracle-checked.
  */
object PipelineSuite {

  val queries: Seq[Q] = Seq(

    // #36 exact dedup (oracle): fingerprint identity, keeper = min doc_id.
    Q("dedup_exact",
      (s, d) => Dedup.exact(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""WITH f AS (SELECT doc_id,
                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
              FROM documents)
              SELECT doc_id, fp,
                     (doc_id = MIN(doc_id) OVER (PARTITION BY fp)) AS keep
              FROM f ORDER BY doc_id""")),

    // #37 MinHash+LSH near-dup report (rows-only: per-doc candidate count
    // and best estimated Jaccard; all docs present).
    Q("dedup_minhash_lsh", (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.perDocReport(docs, Dedup.minhashCandidates(docs), "doc_id", "est_jaccard")
        .orderBy("doc_id")
    }, None),

    // #38 SimHash near-dup report (rows-only).
    Q("dedup_simhash", (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.simhashPairs(docs)
        .withColumn("sim", lit(64) - col("hamming"))
      Dedup.perDocReport(docs, pairs, "doc_id", "sim").orderBy("doc_id")
    }, None),

    // #39 exact n-gram Jaccard on LSH candidates (rows-only).
    Q("dedup_ngram_jaccard", (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.perDocReport(docs, Dedup.ngramJaccard(docs), "doc_id", "jaccard")
        .orderBy("doc_id")
    }, None),

    // #40 embedding-cosine near-dup report (rows-only).
    Q("dedup_embedding", (s, d) => {
      val embs = Tables.embeddings(s, d)
      Dedup.perDocReport(embs, Dedup.embeddingPairs(embs, minCosine = 0.9),
        "vec_id", "cos").orderBy("vec_id")
    }, None),

    // #115 paragraph-level dedup (oracle): the corpus-wide boilerplate
    // remover — every paragraph is fingerprinted, only its FIRST
    // occurrence (min doc_id, then position) survives anywhere in the
    // corpus, and each doc reassembles from its surviving paragraphs in
    // order. One fingerprint-keyed window shuffle + one per-doc
    // aggregation; paragraphs, not documents, ride the shuffle — the
    // granularity at which pretraining corpora actually repeat.
    Q("dedup_paragraph", (s, d) => {
      val paras = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), "\\. ")).as(Seq("pos", "para")))
        .withColumn("fp", md5(lower(trim(col("para")))))
      val w = Window.partitionBy("fp").orderBy(col("doc_id"), col("pos"))
      paras.withColumn("rn", row_number().over(w))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_paras"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          concat_ws(". ", transform(
            array_sort(collect_list(when(col("rn") === 1,
              struct(col("pos"), col("para"))))),
            x => x.getField("para"))).as("kept_text"))
        .orderBy("doc_id")
    },
      Some("""WITH p AS (SELECT doc_id, i AS pos, t[i] AS para
                FROM (SELECT doc_id, string_split(text, '. ') AS t FROM documents),
                     UNNEST(range(1, len(t)+1)) u(i)),
              f AS (SELECT doc_id, pos, para, md5(lower(trim(para))) AS fp FROM p),
              r AS (SELECT doc_id, pos, para,
                ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
              FROM f)
              SELECT doc_id, COUNT(*) AS n_paras,
                     CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, '. ' ORDER BY pos), '') AS kept_text
              FROM r GROUP BY doc_id ORDER BY doc_id""")),

    // #65 duplicate clustering: connected components (min-label
    // propagation) over a duplicate pair graph — here prefix-fingerprint
    // families (the corpus has no byte-exact dups at verify SF). On
    // fingerprint cliques the components are provable in plain SQL — that
    // is the oracle; the same clusters() machinery handles arbitrary LSH
    // pair graphs (spec-verified against union-find).
    Q("dedup_clusters", (s, d) => {
      val w = Window.partitionBy("fp")
      val fp = Tables.documents(s, d)
        .select(col("doc_id"),
          md5(substring(Text.normalize(col("text")), 1, 40)).as("fp"))
        .withColumn("root", min(col("doc_id")).over(w))
        .withColumn("n", count(lit(1)).over(w))
      val pairs = fp.filter(col("n") > 1 && col("doc_id") =!= col("root"))
        .select(col("root").as("id_a"), col("doc_id").as("id_b"))
      Dedup.clusters(pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    },
      Some("""WITH f AS (SELECT doc_id,
                md5(substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), 1, 40)) AS fp
              FROM documents),
              g AS (SELECT doc_id,
                MIN(doc_id) OVER (PARTITION BY fp) AS cluster_id,
                COUNT(*) OVER (PARTITION BY fp) AS n
              FROM f)
              SELECT doc_id, cluster_id FROM g WHERE n > 1 ORDER BY doc_id""")),

    // #41 exact brute-force top-k cosine neighbors (oracle: integer ranks
    // from DuckDB's own list_cosine_similarity — cosine gaps are far above
    // cross-engine float noise).
    Q("ann_bruteforce", (s, d) => {
      val embs = Tables.embeddings(s, d)
      Ann.bruteForce(embs, embs.filter(col("vec_id") % 100 === 0), k = 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                         FROM embeddings WHERE vec_id % 100 = 0),
              scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                                list_cosine_similarity(e.embedding, q.qv) AS cos
                         FROM embeddings e, q WHERE e.vec_id <> q.query_id),
              ranked AS (SELECT query_id, neighbor_id,
                                ROW_NUMBER() OVER (PARTITION BY query_id
                                                   ORDER BY cos DESC, neighbor_id) AS rank
                         FROM scored)
              SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
              ORDER BY query_id, rank""")),

    // #42 SRP-LSH approximate top-k (rows-only; recall vs #41 in the spec).
    Q("ann_lsh", (s, d) => {
      val embs = Tables.embeddings(s, d)
      Ann.lsh(embs, embs.filter(col("vec_id") % 100 === 0), k = 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }, None),

    // #72 IVF approximate top-k (rows-only; recall vs #41 in the spec).
    Q("ann_ivf", (s, d) => {
      val embs = Tables.embeddings(s, d)
      Ann.ivf(embs, embs.filter(col("vec_id") % 100 === 0), k = 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }, None),

    // #111 PQ approximate top-k with exact re-rank (rows-only; recall vs
    // #41 in the spec). The scoring pass touches only m-byte codes — the
    // compressed-domain path for corpora whose float vectors exceed
    // memory at 100 TB.
    Q("ann_pq", (s, d) => {
      val embs = Tables.embeddings(s, d)
      Ann.pq(embs, embs.filter(col("vec_id") % 100 === 0), k = 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }, None),

    // #114 IVF-PQ approximate top-k (rows-only; recall vs #41 in the
    // spec): coarse cells prune WHICH vectors score, PQ codes shrink WHAT
    // scoring reads — the production serving composition of #72 and #111.
    Q("ann_ivfpq", (s, d) => {
      val embs = Tables.embeddings(s, d)
      Ann.ivfpq(embs, embs.filter(col("vec_id") % 100 === 0), k = 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }, None),

    // #43 vector algebra with an exact decimal oracle.
    Q("vector_norms", (s, d) => {
      // float -> double -> decimal: Spark's direct float->decimal cast goes
      // through the float's string repr and disagrees with DuckDB's
      // double-based cast; widening to double first makes both exact.
      val dec = (c: org.apache.spark.sql.Column) => c.cast("double").cast(DecimalType(18, 6))
      Tables.embeddings(s, d)
        .select(col("vec_id"), explode(col("embedding")).as("x"))
        .groupBy("vec_id")
        .agg(count(lit(1)).as("dim"),
          sum(dec(col("x")) * dec(col("x"))).cast("double").as("norm_sq"))
        .orderBy("vec_id")
    },
      Some("""SELECT vec_id, COUNT(*) AS dim,
                CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) AS norm_sq
              FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t
              GROUP BY vec_id ORDER BY vec_id""")),

    // #44 token counting (oracle).
    Q("text_tokencount",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS INTEGER) AS n_tokens,
                CAST(LENGTH(text) AS INTEGER) AS n_chars
              FROM documents ORDER BY doc_id""")),

    // #45 quality scoring (oracle): identical double arithmetic both sides.
    Q("text_quality", (s, d) => {
      val norm = Text.normalize(col("text"))
      val nTokens = Text.tokenCount(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          nTokens.as("n_tokens"),
          (length(translate(norm, " ", "")) / nTokens).as("mean_word_len"),
          (length(regexp_replace(col("text"), "[^0-9]", "")) / length(col("text"))).as("digit_ratio"),
          (least(lit(1.0), nTokens / lit(100.0)) *
            (lit(1.0) - length(regexp_replace(col("text"), "[^0-9]", "")) / length(col("text"))))
            .as("quality_score"))
        .orderBy("doc_id")
    },
      Some("""SELECT doc_id,
                CAST(LENGTH(text) AS INTEGER) AS n_chars,
                CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS INTEGER) AS n_tokens,
                LENGTH(replace(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ', ''))
                  / len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS mean_word_len,
                LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) / LENGTH(text) AS digit_ratio,
                LEAST(1.0, len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) / 100.0)
                  * (1.0 - LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) / LENGTH(text)) AS quality_score
              FROM documents ORDER BY doc_id""")),

    // #117 repetition scoring (oracle): most-frequent-token share per doc
    // — the integer-exact repetition signal quality filters use to drop
    // spam/boilerplate (a doc whose top token is 30% of its text is not
    // prose). All counts are integers and the single ratio division is
    // one correctly-rounded double op, so the oracle is bit-exact.
    Q("text_repetition", (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(Text.normalize(col("text")), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      // top token per doc as ONE aggregation (r18): min_by on the
      // ordering struct (-n, tok) is exactly row_number()=1 over
      // (n DESC, tok ASC) — lexicographic struct order, and tok makes
      // the ordering value unique per group so min_by is deterministic.
      // The two window passes (full sort of every (doc, tok) row,
      // twice) collapse into a partial-agg-able min_by/sum pair on the
      // ObjectHashAggregate path: same two exchanges, zero Sort nodes,
      // and the second shuffle carries one partially-aggregated row per
      // doc per map partition instead of every token row (guide §2.3)
      toks
        .groupBy("doc_id")
        .agg(min_by(struct(col("tok"), col("n")),
            struct((-col("n")).as("neg_n"), col("tok"))).as("best"),
          sum(col("n")).as("n_tokens"))
        .select(col("doc_id"), col("best.tok").as("top_token"),
          col("best.n").as("top_count"), col("n_tokens"),
          (col("best.n").cast("double") / col("n_tokens"))
            .as("repetition_ratio"))
        .orderBy("doc_id")
    },
      Some("""WITH t AS (SELECT doc_id,
                UNNEST(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
              FROM documents),
              c AS (SELECT doc_id, tok, COUNT(*) AS n FROM t GROUP BY doc_id, tok),
              r AS (SELECT doc_id, tok, n,
                CAST(SUM(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS rn
              FROM c)
              SELECT doc_id, tok AS top_token, n AS top_count,
                     n_tokens,
                     CAST(n AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS repetition_ratio
              FROM r WHERE rn = 1 ORDER BY doc_id""")),

    // #46 heuristic language ID (rows-only; determinism + coverage in spec).
    Q("text_langid", (s, d) => {
      val (lang, hits) = Text.langid(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), lang.as("lang_pred"), hits.as("stopword_hits"))
        .orderBy("doc_id")
    }, None),

    // #47 document fingerprinting (oracle; identity used by dedup_exact).
    Q("text_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
              FROM documents ORDER BY doc_id""")),

    // #48 shingle extraction stats (oracle on counts).
    Q("text_shingles",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          size(Text.shingles(col("text"), 3)).as("n_shingles"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS INTEGER) AS n_tokens,
                CAST(CASE WHEN len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) >= 3
                     THEN len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) - 2
                     ELSE 1 END AS INTEGER) AS n_shingles
              FROM documents ORDER BY doc_id""")),

    // #49 multimodal plumbing (rows-only): binary payload + typed metadata
    // struct through a batch-shaped mapPartitions "decoder" (deterministic
    // stub — see Multimodal); per-asset byte features out. The payload
    // table lives NATIVELY in .col since r11 (format v2 BINARY column) —
    // the one pipeline table that previously still required parquet.
    Q("multimodal_meta", (s, d) => {
      val media = mediaFromCole(s, d)
      Multimodal.extractFeatures(media).toDF()
        .join(media.select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.sample_rate").as("sample_rate")),
          "doc_id")
        .orderBy("doc_id")
    }, None),

    // #116 frame sampling (rows-only): nFrames evenly-spaced fixed-size
    // windows per asset, seek offsets computed from metadata — the
    // video/audio curation shape; per-frame rollup proves the explode.
    Q("multimodal_framesample", (s, d) => {
      val media = mediaFromCole(s, d)
      Multimodal.sampleFrames(media).toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          min("offset").as("first_offset"), max("offset").as("last_offset"))
        .orderBy("doc_id")
    }, None)
  )

  /** The media table SERVED FROM .col: payload bytes in a native v2
    * BINARY column, metadata flat beside them (structs flatten at the
    * storage boundary, like every columnar format), re-nested on read to
    * the pipeline's (doc_id, payload, meta) shape.
    */
  private def mediaFromCole(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val dir = ColeSuite.dirFor(d, "media_payload")
    ColeSuite.writeOnce(dir) {
      Multimodal.withPayload(Tables.documents(s, d))
        .select(col("doc_id"), col("payload"),
          col("meta.modality").as("modality"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_bytes").as("n_bytes"))
        .write.format("cole").mode("overwrite").save(dir)
    }
    s.read.format("cole").load(dir)
      .select(col("doc_id"), col("payload"),
        struct(col("modality"), col("width"), col("height"),
          col("sample_rate"), col("n_bytes")).as("meta"))
  }
}
