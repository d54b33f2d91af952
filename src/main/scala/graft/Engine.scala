package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults this engine assumes.
  *
  * Local runs use `local[N]`; on a real cluster only `master` and the
  * partition counts change — every operator in this library is keyed and
  * declarative, so the same plans distribute unchanged.
  */
object Engine {
  def session(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-columnar-engine")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // answer bare MIN/MAX/COUNT from parquet footers (off by default)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // storage-partitioned joins: V2 scans reporting KeyGroupedPartitioning
      // (the COLE source over hive-partitioned tables) join / aggregate on
      // their partition keys with zero Exchange; pushPartValues lets the
      // planner align sides whose partition-value sets differ
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // one-sided storage-partitioned join: when only ONE side is a
      // bucketed COLE table, shuffle just the other side INTO the stored
      // bucketing (Spark evaluates the catalog's bucket function to
      // route) — the 100 TB fact never moves
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      // the COLE warehouse catalog: resolves `cole.<ns>.<table>` to .col
      // directories AND — the part that matters for scale — supplies the
      // FunctionCatalog that lets Spark resolve a scan's reported
      // bucket(n, col) transform. Hash-bucketed fact-fact joins
      // (orders ⋈ lineitem on orderkey) are zero-Exchange ONLY through
      // this catalog; identity-partitioned SPJ covers dimension-grade keys.
      .config("spark.sql.catalog.cole", "graft.sources.cole.ColeCatalog")
      .config("spark.sql.catalog.cole.warehouse",
        sys.env.getOrElse("GRAFT_COLE_WAREHOUSE", "/tmp/graft_cole/warehouse"))
      // runtime bloom filters: a selective join side seeds a bloom that
      // prunes the probe side's scan — the AQE twin of the explicit
      // operators/Bloom prefilter
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // The events table stores TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read as epoch-nanos long and convert explicitly
      // (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
