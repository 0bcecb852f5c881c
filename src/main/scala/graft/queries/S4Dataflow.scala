package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import graft.Tables

/** S4's dataflow semantics re-expressed as batch-verifiable queries
  * (SURVEY.md §7 step 2). Each query maps to a reference operator:
  *
  *  - R7/R8 timed flush window (`river/liner.go:61-92`, `river/jsonr.go:54-96`)
  *    → tumbling event-time window aggregate.
  *  - R6 JSON validate-then-buffer (`river/jsonr.go:99-116`): invalid JSON is
  *    dropped, stream continues → `from_json(...).isNotNull` filter.
  *  - R12 time-partitioned sink key `year=/month=/day=` (`lake/lake.go:79-81`)
  *    → year/month/dayofmonth projection + partition counts.
  *  - R9 corpus concatenation (`river/jsonr.go:81-82`) → order-normalized
  *    string agg (the reference's own order is not arrival order — LevelDB
  *    lexicographic-key quirk, SURVEY.md §1 — so per-batch *set* semantics
  *    is the contract; we sort for determinism).
  *  - R10 non-empty flush guard (`river/liner.go:80-84`) → HAVING count.
  *  - R17 mock rate generator (`test/tool.go:109-147`) → per-hour rate agg.
  *
  * Scale: all are single-shuffle hash aggregates on low-cardinality keys;
  * window bucketing is a per-row projection (no state).
  */
object S4Dataflow {

  /** R7/R8: 5-minute tumbling flush window — per window: record count and
    * total payload bytes (what S4 would have gzipped per flush). */
  def flushWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_records"),
        sum(length(col("props"))).cast("long").as("batch_bytes"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_records"), col("batch_bytes"))
      .orderBy(col("window_start_us"))

  /** R6: JSON validity filter — rows whose props parse as a JSON object,
    * counted per event type (invalid ⇒ dropped, as the reference does). */
  def jsonValidity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(from_json(col("props"), MapType(StringType, StringType)).isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_valid"))
      .orderBy(col("event_type"))

  /** R6 extraction: pull `k` out of the JSON payload and aggregate it. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_valid"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** R12: the sink's Hive-style partition key projection + per-partition
    * object counts (what partition pruning would see downstream). */
  def partitionProjection(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(year(col("ts")).as("year"), month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"))
      .groupBy(col("year"), col("month"), col("day"))
      .agg(count(lit(1)).as("n_records"))
      .orderBy(col("year"), col("month"), col("day"))

  /** R9: corpus concatenation per key AND flush window, order-normalized
    * (sorted) because the reference guarantees only per-batch set
    * semantics (SURVEY.md §1). Grouping by (type, day) bounds a single
    * group's collect_list state to one flush window's worth of records —
    * the real S4 never concatenates beyond one flush either
    * (`river/jsonr.go:72-84`); an unwindowed corpus per type would be
    * unbounded state at 100 TB. */
  def concatAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("_day"))
      .agg(array_join(sort_array(collect_list(col("props"))), "").as("corpus"))
      .select(col("event_type"), unix_micros(col("_day")).as("day_us"),
        length(col("corpus")).cast("long").as("corpus_len"),
        substring(col("corpus"), 1, 64).as("corpus_head"))
      .orderBy(col("event_type"), col("day_us"))

  /** R10: non-empty flush guard — 1-hour windows emitting only when the
    * batch holds at least 3 records (HAVING). */
  def nonEmptyGuard(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") >= 3)
      .select(unix_micros(col("window.start")).as("window_start_us"), col("n_records"))
      .orderBy(col("window_start_us"))

  /** R17: event rate by hour-of-day and type (the mock generator's
    * events/sec, aggregated). */
  def ratePerHour(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy(col("event_type"), col("hour"))

  /** Map/JSON function family over the props payload: parse to a map,
    * explode its keys, per-type key stats (map_keys/element_at on the
    * Spark side ≡ json_keys/json_extract in the oracle). */
  def jsonMapOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        explode(map_keys(from_json(col("props"), MapType(StringType, StringType))))
          .as("key"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("key")).as("n_keys"), count(lit(1)).as("n_pairs"))
      .orderBy(col("event_type"))

  /** Spark 4 VariantType path for dynamic JSON (SURVEY §1 data-model
    * mapping): parse_json → typed variant_get, the engine-native way to
    * keep S4's "schema-free object" semantics queryable without a
    * declared schema. Same answer as the get_json_object form. */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'long')"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  /** Lake-maintenance round trip (operators/Compaction.scala): stage a
    * deliberately fragmented copy of `events` (8 writer tasks per
    * event_type partition — the many-small-files state a micro-batch
    * sink leaves behind), compact every partition to ONE file, then read
    * the COMPACTED table back. Rows must survive the rewrite bit-for-bit
    * (the oracle recounts from the source) and each partition must sit
    * at exactly one file — deterministic, unlike a >1 bound where two
    * salt groups can hash into the same writer task. */
  def compactLake(s: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_compact/" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    graft.operators.Compaction.compact(s, path, Seq("event_type"), filesPerPartition = 1)
    s.read.parquet(path)
      .select(col("event_type"), col("value"), input_file_name().as("_f"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
        countDistinct(col("_f")).as("n_files"))
      .orderBy(col("event_type"))
  }

  /** The targeted-delete maintenance op as an oracle row: build a
    * partitioned lake from events, DELETE every row of the victim users
    * (user_id ≡ 3 mod 10) through [[graft.operators.TargetedDelete]] —
    * pruned rewrite of only the touched partitions — then report
    * per-partition survivor aggregates. The oracle recomputes the same
    * aggregates relationally with the victims excluded, so a green row
    * proves the lake's post-delete CONTENT equals the relational
    * delete; TargetedDeleteSpec separately proves untouched partitions
    * keep their very files. */
  def targetedDelete(s: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_tdelete/" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
    ev.repartition(8)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    val victims = ev.filter(col("user_id") % 10 === 3)
      .select(col("user_id")).distinct()
    graft.operators.TargetedDelete.delete(
      s, path, Seq("event_type"), "user_id", victims)
    s.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s4_compact_lake" -> (compactLake _),
    "s4_targeted_delete" -> (targetedDelete _),
    "s4_flush_window" -> (flushWindow _),
    "s4_json_validity" -> (jsonValidity _),
    "s4_json_extract" -> (jsonExtract _),
    "s4_partition_projection" -> (partitionProjection _),
    "s4_concat_agg" -> (concatAgg _),
    "s4_nonempty_guard" -> (nonEmptyGuard _),
    "s4_rate_per_hour" -> (ratePerHour _),
    "s4_json_map_ops" -> (jsonMapOps _),
    "s4_variant_extract" -> (variantExtract _),
  )

  val oracles: Map[String, String] = Map(
    "s4_compact_lake" ->
      """SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  1 AS n_files
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s4_targeted_delete" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events WHERE user_id % 10 <> 3
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s4_flush_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL 5 minutes, ts)) AS window_start_us,
        | count(*) AS n_records, CAST(sum(length(props)) AS BIGINT) AS batch_bytes
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "s4_json_validity" ->
      """SELECT event_type, count(*) AS n_valid FROM events
        |WHERE json_valid(props) GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s4_json_extract" ->
      """SELECT event_type, count(*) AS n_valid,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |WHERE k IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s4_partition_projection" ->
      """SELECT CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
        | CAST(day(ts) AS INTEGER) AS day, count(*) AS n_records
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "s4_concat_agg" ->
      """SELECT event_type, epoch_us(day) AS day_us,
        | CAST(length(corpus) AS BIGINT) AS corpus_len,
        | substring(corpus, 1, 64) AS corpus_head
        |FROM (SELECT event_type, date_trunc('day', ts) AS day,
        |             string_agg(props, '' ORDER BY props) AS corpus
        |      FROM events GROUP BY event_type, date_trunc('day', ts)) t
        |ORDER BY event_type, day_us""".stripMargin,
    "s4_nonempty_guard" ->
      """SELECT epoch_us(time_bucket(INTERVAL 1 hour, ts)) AS window_start_us,
        | count(*) AS n_records
        |FROM events GROUP BY 1 HAVING count(*) >= 3 ORDER BY 1""".stripMargin,
    "s4_rate_per_hour" ->
      """SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour, count(*) AS n,
        | round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s4_json_map_ops" ->
      """SELECT event_type, count(DISTINCT key) AS n_keys, count(*) AS n_pairs
        |FROM (SELECT event_type, unnest(json_keys(props)) AS key FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s4_variant_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
