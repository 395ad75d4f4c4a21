package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.Tables._

/**
 * Oracle-gated round-trips through the Delta-style table: each query writes
 * testdata into a fresh graft DeltaTable under java.io.tmpdir, runs an
 * operation (query/DML/time travel), and returns a DataFrame whose expected
 * content is expressible as plain SQL over the ORIGINAL parquet — so the
 * driver's DuckDB oracle verifies the whole log/write/read/DML path.
 */
object DeltaQueries {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-dq").toString

  /** Write → Mongo-filtered read back (log, stats, pruning, filter translation). */
  def roundtripFilter(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "lineitem"))
    t.query("""{"l_returnflag":"A","l_quantity":{"$gte":45}}""")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      // (l_orderkey, l_linenumber) is NOT unique in the driver testdata —
      // order by the FULL projection so the sort is total and the oracle
      // compare is deterministic at every SF (ties broke by luck below sf1)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
  }

  /** Copy-on-write delete, then full scan of the survivors. */
  def deleteRows(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "orders"))
    t.delete("""{"o_orderstatus":"F"}""")
    t.toDF()
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Copy-on-write update (field patch on matching rows). */
  def updateRows(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "customer"))
    t.update("""{"c_mktsegment":"BUILDING"}""", """{"c_acctbal": 0}""")
    t.toDF()
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Append twice, then time travel back to version 0. */
  def timeTravel(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val part = t_(s, dir, "part")
    t.write(part)
    t.write(part.filter(col("p_size") > 25)) // extra rows the travel must not see
    t.asOf(0)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** Timestamp-based time travel: append twice, travel to the first commit's
    * wall-clock time, expect only v0's rows (the second write's Spark job
    * guarantees a later-millisecond commit). */
  def timestampTravel(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val part = t_(s, dir, "part")
    t.write(part)
    t.write(part.filter(col("p_size") > 25))
    t.asOfTimestamp(t.commitTimestamp(0))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** RESTORE: mutate the table twice (delete + update), then restore to v0
    * — the read back must be byte-identical to the original data. The
    * restore is a log-only file-diff commit (no data rewrite), so the gate
    * proves the diff/metadata reinstatement path, not the CoW writers. */
  def restoreTable(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "part"))                        // v0
    t.delete("""{"p_size":{"$gte":40}}""")             // v1
    t.update("""{"p_brand":"Brand#11"}""", """{"p_retailprice": 0}""") // v2
    t.restore(0)                                       // v3 → back to v0
    t.toDF()
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** CHECK constraint: valid write accepted, violating write rejected
    * BEFORE commit — the surviving content is exactly the valid rows,
    * which is what the oracle sees. */
  def constraintGate(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val part = t_(s, dir, "part")
    t.write(part) // p_size in [1, 50] — satisfies the constraint
    t.addCheckConstraint("size_pos", "p_size >= 1")
    val rejected =
      try { t.write(part.withColumn("p_size", -col("p_size"))); false }
      catch { case _: graft.delta.ValidationException => true }
    require(rejected, "violating write must be rejected")
    t.toDF()
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** Merge-on-read MERGE: DV-mask matched rows, append merged images and
    * inserts in one commit, zero target files rewritten. Same oracle as
    * d6's CoW merge — two merge paths, one answer. */
  def dvMerge(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val orders = t_(s, dir, "orders")
    t.write(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(0.0))
    val inserts = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000000L)
      .withColumn("o_totalprice", lit(-1.0))
    t.mergeWithDV(updates.unionByName(inserts), Seq("o_orderkey"))
    t.toDF()
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Merge-on-read delete: deletion-vector write path. Same survivors as
    * d2's CoW delete, but zero files rewritten — the matched rows are
    * masked by an inline roaring bitmap the scan applies; the oracle
    * proves the mask is row-exact. */
  def dvDelete(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "orders"))
    t.deleteWithDV("""{"o_orderstatus":"F"}""")
    t.toDF()
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Merge-on-read update: DV-mask the matched rows, append patched
    * images — unmatched rows in matched files never rewritten. Same
    * oracle as d3's CoW update. */
  def dvUpdate(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "customer"))
    t.updateWithDV("""{"c_mktsegment":"BUILDING"}""", """{"c_acctbal": 0}""")
    t.toDF()
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Shallow CLONE, then CoW DML on the clone: the delete rewrites only
    * the touched source-referenced file into the clone's own directory —
    * the gate proves absolute-path reads, clone-isolated DML, and that the
    * final content matches plain SQL over the original data. */
  def cloneDml(s: SparkSession, dir: String): DataFrame = {
    val src = DeltaTable.forPath(s, freshDir())
    src.write(t_(s, dir, "part"))
    val clone = src.cloneTo(freshDir())
    clone.delete("""{"p_size":{"$gte":40}}""")
    clone.toDF()
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** Column rename via column mapping: rename, append THROUGH the new name
    * (new file stores the physical name), filter on the renamed column —
    * the oracle sees one aliased column over the union of both writes. */
  def renameRead(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val cust = t_(s, dir, "customer")
    t.write(cust.filter(col("c_custkey") % 2 === 0))
    t.renameColumn("c_acctbal", "balance")
    t.write(cust.filter(col("c_custkey") % 2 === 1)
      .withColumnRenamed("c_acctbal", "balance"))
    t.query("""{"balance":{"$gte":0}}""")
      .select(col("c_custkey"), col("c_name"), col("balance"))
      .orderBy(col("c_custkey"))
  }

  /** Hive-partitioned write + partition-pruned Mongo query. */
  def partitionPrune(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(events(s, dir), partitionBy = Seq("event_type"))
    t.query("""{"event_type":"purchase","value":{"$gt":50}}""")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .orderBy(col("event_id"))
  }

  /** MERGE upsert: update a tenth of the rows, insert new keys; the final
    * state is a UNION the oracle can reproduce. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val orders = t_(s, dir, "orders")
    t.write(orders)
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", lit(0.0))
    val inserts = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000000L)
      .withColumn("o_totalprice", lit(-1.0))
    t.merge(updates.unionByName(inserts), Seq("o_orderkey"))
    t.toDF()
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Condition merge (the reference's arbitrary `matchCondition`): key
    * equality PLUS a non-equi predicate, as a theta-join MERGE. The probe set
    * is built 1:1 per key so the reference's first-match resolution is
    * deterministic regardless of file/row order — which is what makes the
    * result oracle-reproducible in plain SQL. */
  def mergeCondition(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val cust = t_(s, dir, "customer")
    t.write(cust)
    val probes = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("k"), lit(1000.0).as("cut"))
    t.mergeWithCondition(probes,
      col("t.c_custkey") === col("s.k") && col("t.c_acctbal") < col("s.cut"),
      matched = graft.delta.Merge.MergeAction.UpdateSet(
        Map("c_mktsegment" -> lit("FLAGGED"))),
      insertUnmatched = false)
    t.toDF()
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** MERGE into a CDC-enabled table, then read the change feed for that ONE
    * commit: update pre/post images and inserts must all land under a single
    * version (reference: processMergeMatch/processMergeNoMatch + the CDC
    * records finalized with the commit, src/cdc/index.ts:1975-2046). The feed
    * content is recomputable in SQL from the original parquet, so the oracle
    * verifies merge atomicity AND the change-row capture together. */
  def mergeCdf(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val cust = t_(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    t.write(cust) // v0
    t.enableCDC() // v1
    val updates = cust.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", lit(0.0))
    val inserts = cust.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_custkey", col("c_custkey") + 10000000000L)
      .withColumn("c_acctbal", lit(-1.0))
    val r = t.merge(updates.unionByName(inserts), Seq("c_custkey")) // v2
    t.changes(r.version, r.version)
      .select(col(graft.delta.Cdc.ChangeType), col("c_custkey"), col("c_name"),
        col("c_acctbal"))
      .orderBy(col(graft.delta.Cdc.ChangeType), col("c_custkey"))
  }

  /** CDC: enable the feed, append + delete, read the change rows back. */
  def cdcFeed(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val ev = events(s, dir)
    t.write(ev.filter(col("event_type") === "view")) // v0 (pre-CDC)
    t.enableCDC() // v1
    t.write(ev.filter(col("event_type") === "click")) // v2 → inserts
    t.delete("""{"value":{"$lt":5}}""") // v3 → deletes
    t.changes(2, 3)
      .select(col(graft.delta.Cdc.ChangeType), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col(graft.delta.Cdc.ChangeType), col("event_id"))
  }

  /** Debezium-style CDC envelope over the events table: per-partition dense
    * sequences (Kafka-(partition,offset) semantics), op derived from the
    * event type, before/after as JSON state — every column recomputable in
    * SQL (reference envelope: src/cdc/index.ts:38-93). */
  def cdcEnvelope(s: SparkSession, dir: String): DataFrame = {
    import graft.delta.{CdcEnvelope, CdcSource}
    val ev = events(s, dir).filter(col("event_id") < 2000)
    val op = when(col("event_type") === "purchase", "u")
      .when(col("event_type") === "click", "c").otherwise(lit("r"))
    val before = when(col("event_type") === "purchase",
      to_json(struct(col("event_id"), col("user_id"))))
    val after = to_json(struct(col("event_id"), col("user_id"), col("event_type")))
    CdcEnvelope.fromOps(ev, col("event_id"), op, before, after,
        orderBy = Seq(col("event_id")),
        partitionCol = pmod(col("user_id"), lit(8)).cast("int"),
        source = CdcSource(system = "graft", collection = Some("events")),
        tsNanos = lit(1700000000000000000L))
      .select(col("_id"), col("_seq"), col("_op"), col("_before"), col("_after"),
        col("_ts"), col("_source.system").as("source_system"),
        col("_source.collection").as("source_collection"),
        col("_source.partition").as("source_partition"))
      .orderBy(col("source_partition"), col("_seq"))
  }

  /** Document-row ingestion: untyped JSON docs — sparse fields, a nested
    * object (→ variant JSON string), an integral column beyond ±2^31
    * (→ double) and one within it (→ int32) — written through
    * `writeDocuments` and read back typed (reference inference:
    * src/delta/table.ts:1289-1388). */
  def docIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = DeltaTable.forPath(s, freshDir())
    val docs = events(s, dir).filter(col("event_id") < 1000)
      .select(to_json(struct(
        col("event_id"),
        (col("user_id") * 10000000000L).as("big"),
        when(col("event_type") === "purchase", col("value")).as("value"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("pobj"),
        col("event_type"))).as("doc"))
    t.writeDocuments(docs.as[String])
    t.toDF()
      .select(col("event_id"), col("big"), col("value"), col("pobj"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Fragment a table over many commits, compact, verify content unchanged. */
  def compactScan(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val nation = t_(s, dir, "nation")
    // 5 small commits → fragmented layout, then bin-pack compaction
    (0 until 5).foreach(i => t.write(nation.filter(col("n_nationkey") % 5 === i)))
    graft.delta.Maintenance.compact(t)
    t.toDF().select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  /** Duplicate the data (double append), dedup exact, expect the original. */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    val sup = t_(s, dir, "supplier")
    t.write(sup); t.write(sup) // exact duplicates
    graft.delta.Maintenance.deduplicate(t, graft.delta.Maintenance.DedupStrategy.Exact)
    t.toDF().select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** The full maintenance chain on one table: fragmented + duplicated writes,
    * then compact → exact dedup → z-order (hilbert alias) → vacuum dry-run —
    * content must come out exactly once per original row. Exercises the
    * conflict-checked rewrite commit machinery end to end. */
  def maintenanceChain(s: SparkSession, dir: String): DataFrame = {
    import graft.delta.Maintenance
    val t = DeltaTable.forPath(s, freshDir())
    val sup = t_(s, dir, "supplier")
    // 3 fragmented commits + a duplicate append
    (0 until 3).foreach(i => t.write(sup.filter(col("s_suppkey") % 3 === i)))
    t.write(sup.filter(col("s_suppkey") % 7 === 0)) // duplicates to remove
    Maintenance.compact(t)
    Maintenance.deduplicate(t, Maintenance.DedupStrategy.Exact)
    Maintenance.zOrderCluster(t, Seq("s_nationkey"), targetFiles = 2,
      curveType = "hilbert")
    Maintenance.vacuum(t, retentionHours = 0.0, dryRun = true, enforceMinimum = false)
    t.toDF().select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** Z-order rewrite preserves content (clustering is a physical property). */
  def zorderScan(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "customer"))
    graft.delta.Maintenance.zOrderCluster(t, Seq("c_nationkey", "c_acctbal"), targetFiles = 4)
    t.toDF().select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** m3's twin on the TRUE Hilbert curve (round 15): same corpus, same
    * final SELECT, `curveType=hilbert-true` — clustering is layout-only,
    * so the oracle proves the rewrite reorders without losing/altering a
    * single row while the curve walk is the real Skilling transform. */
  def hilbertScan(s: SparkSession, dir: String): DataFrame = {
    val t = DeltaTable.forPath(s, freshDir())
    t.write(t_(s, dir, "customer"))
    graft.delta.Maintenance.zOrderCluster(t, Seq("c_nationkey", "c_acctbal"),
      targetFiles = 4, curveType = "hilbert-true")
    t.toDF().select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // Tables.t is shadowed by method params named t; tiny alias.
  private def t_(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_delta_roundtrip" -> (roundtripFilter(_, _)),
    "d2_delta_delete" -> (deleteRows(_, _)),
    "d3_delta_update" -> (updateRows(_, _)),
    "d4_delta_timetravel" -> (timeTravel(_, _)),
    "d5_delta_partition_prune" -> (partitionPrune(_, _)),
    "d6_delta_merge" -> (mergeUpsert(_, _)),
    "d11_merge_condition" -> (mergeCondition(_, _)),
    "d7_delta_cdc" -> (cdcFeed(_, _)),
    "d8_cdc_envelope" -> (cdcEnvelope(_, _)),
    "d9_doc_ingest" -> (docIngest(_, _)),
    "d10_timestamp_travel" -> (timestampTravel(_, _)),
    "d12_restore" -> (restoreTable(_, _)),
    "d13_rename_column" -> (renameRead(_, _)),
    "d14_clone_dml" -> (cloneDml(_, _)),
    "d15_dv_delete" -> (dvDelete(_, _)),
    "d16_dv_update" -> (dvUpdate(_, _)),
    "d17_dv_merge" -> (dvMerge(_, _)),
    "d18_check_constraint" -> (constraintGate(_, _)),
    "d19_merge_cdf" -> (mergeCdf(_, _)),
    "m1_compact_scan" -> (compactScan(_, _)),
    "m2_dedup_exact" -> (dedupExact(_, _)),
    "m3_zorder_scan" -> (zorderScan(_, _)),
    "m5_hilbert_scan" -> (hilbertScan(_, _)),
    "m4_maintenance_chain" -> (maintenanceChain(_, _)))

  val oracleSql: Map[String, String] = Map(
    "d1_delta_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin,

    "d2_delta_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "d3_delta_update" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(0 AS DOUBLE) ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "d4_delta_timetravel" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "d10_timestamp_travel" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "d12_restore" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "d18_check_constraint" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "d13_rename_column" ->
      """SELECT c_custkey, c_name, c_acctbal AS balance
        |FROM customer WHERE c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin,

    "d14_clone_dml" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part WHERE p_size < 40
        |ORDER BY p_partkey""".stripMargin,

    "d15_dv_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "d16_dv_update" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(0 AS DOUBLE) ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "d17_dv_merge" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN CAST(0 AS DOUBLE) ELSE o_totalprice END AS o_totalprice,
        |    CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000000, o_custkey, o_orderstatus,
        |    CAST(-1 AS DOUBLE), CAST(o_orderdate AS TIMESTAMP), o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0) merged
        |ORDER BY o_orderkey""".stripMargin,

    "d5_delta_partition_prune" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM events WHERE event_type = 'purchase' AND value > 50
        |ORDER BY event_id""".stripMargin,

    "d6_delta_merge" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN CAST(0 AS DOUBLE) ELSE o_totalprice END AS o_totalprice,
        |    CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000000, o_custkey, o_orderstatus,
        |    CAST(-1 AS DOUBLE), CAST(o_orderdate AS TIMESTAMP), o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0) merged
        |ORDER BY o_orderkey""".stripMargin,

    "d11_merge_condition" ->
      """SELECT c_custkey, c_name, c_acctbal,
        |  CASE WHEN c_custkey % 3 = 0 AND c_acctbal < 1000.0
        |       THEN 'FLAGGED' ELSE c_mktsegment END AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "d19_merge_cdf" ->
      """SELECT * FROM (
        |  SELECT 'update_preimage' AS _change_type, c_custkey, c_name, c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT 'update_postimage', c_custkey, c_name, CAST(0 AS DOUBLE)
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT 'insert', c_custkey + 10000000000, c_name, CAST(-1 AS DOUBLE)
        |  FROM customer WHERE c_custkey % 100 = 0) ch
        |ORDER BY _change_type, c_custkey""".stripMargin,

    "d7_delta_cdc" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS _change_type, event_id, user_id, event_type, value
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT 'delete', event_id, user_id, event_type, value
        |  FROM events WHERE event_type IN ('view','click') AND value < 5) ch
        |ORDER BY _change_type, event_id""".stripMargin,

    "d8_cdc_envelope" ->
      """SELECT CAST(event_id AS VARCHAR) AS _id,
        |  row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) - 1 AS _seq,
        |  CASE WHEN event_type = 'purchase' THEN 'u'
        |       WHEN event_type = 'click' THEN 'c' ELSE 'r' END AS _op,
        |  CASE WHEN event_type = 'purchase'
        |       THEN CAST(to_json(struct_pack(event_id := event_id, user_id := user_id)) AS VARCHAR)
        |       END AS _before,
        |  CAST(to_json(struct_pack(event_id := event_id, user_id := user_id,
        |                           event_type := event_type)) AS VARCHAR) AS _after,
        |  CAST(1700000000000000000 AS BIGINT) AS _ts,
        |  'graft' AS source_system, 'events' AS source_collection,
        |  CAST(user_id % 8 AS INTEGER) AS source_partition
        |FROM events WHERE event_id < 2000
        |ORDER BY source_partition, _seq""".stripMargin,

    "d9_doc_ingest" ->
      """SELECT CAST(event_id AS INTEGER) AS event_id,
        |  CAST(user_id * 10000000000 AS DOUBLE) AS big,
        |  CASE WHEN event_type = 'purchase' THEN value END AS value,
        |  '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}' AS pobj,
        |  event_type
        |FROM events WHERE event_id < 1000
        |ORDER BY event_id""".stripMargin,

    "m1_compact_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "m2_dedup_exact" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "m3_zorder_scan" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "m5_hilbert_scan" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "m4_maintenance_chain" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin)
}
