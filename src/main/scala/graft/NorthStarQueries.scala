package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables._

/**
 * North-star analytics beyond the reference surface (SURVEY §2.4 "absent"
 * list): variant/JSON field extraction, as-of joins, rollup/cube grouping
 * sets, lag/lead analytics, set operations, and an event-time streaming
 * aggregation — each expressed with Spark built-ins and oracle-checked.
 */
object NorthStarQueries {

  /** Open-session state for n23's timeout-based streaming sessionization:
    * epoch-MICROsecond bounds (java.sql.Timestamp would truncate the µs the
    * oracle compares on) and the exact cents sum (DECIMAL(18,2)·100). */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, session_start: java.time.Instant,
                        n: Long, sum_value: Double)

  private[graft] def epochUs(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** n23's group function: gap-close sessions within the batch, keep the
    * open tail in [[org.apache.spark.sql.streaming.GroupState]], and emit it
    * when the event-time timer (last event + gap) passes the watermark —
    * the state-EVICTION path a 100 TB stream needs (without timeouts, one
    * state entry per ever-seen user lives forever). */
  private[graft] def sessionize(gapUs: Long)(
      uid: Long, it: Iterator[(Long, java.time.Instant, Long, Double)],
      state: org.apache.spark.sql.streaming.GroupState[OpenSession])
      : Iterator[SessionOut] = {
    def out(o: OpenSession) = SessionOut(uid,
      java.time.Instant.ofEpochSecond(o.startUs / 1000000L,
        (o.startUs % 1000000L) * 1000L),
      o.n, o.cents / 100.0)
    if (state.hasTimedOut) {
      val o = state.get; state.remove(); Iterator.single(out(o))
    } else if (uid < 0) Iterator.empty // watermark sentinels carry no session
    else {
      val evs = it.toVector.sortBy(e => (epochUs(e._2), e._3))
      var open = state.getOption
      val closed = Vector.newBuilder[SessionOut]
      evs.foreach { e =>
        val us = epochUs(e._2)
        // exact cents (DECIMAL(18,2) HALF_UP), matching Tables.dsum
        val cents = (BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact
        open match {
          case Some(o) if us - o.lastUs < gapUs =>
            open = Some(o.copy(lastUs = us, n = o.n + 1, cents = o.cents + cents))
          case Some(o) =>
            closed += out(o)
            open = Some(OpenSession(us, us, 1L, cents))
          case None =>
            open = Some(OpenSession(us, us, 1L, cents))
        }
      }
      open.foreach { o =>
        state.update(o)
        // timers are millisecond-granular: round UP so the timer can never
        // fire before the true µs deadline
        state.setTimeoutTimestamp((o.lastUs + gapUs + 999L) / 1000L)
      }
      closed.result().iterator
    }
  }

  /** Short stable suffix for per-sf-dir catalog object names: a session
    * can legitimately touch several sf dirs, and a global table name would
    * silently repoint earlier gates at the newest dir's data. */
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Write lineitem/orders bucketed by their join key into the session
    * catalog (external tables under a temp path, 8 buckets, sorted within
    * buckets) and return the (lineitem, orders) table names — DIR-KEYED,
    * so two sf dirs in one session get distinct tables. Idempotent per
    * (catalog, sf dir): re-registering would rewrite the data on every
    * bench sample and measure the WRITE, not the exchange-free join the
    * gate demonstrates. The backing temp dirs are reclaimed at JVM exit
    * via [[TempDirs]]. */
  def bucketedTables(s: SparkSession, dir: String): (String, String) = synchronized {
    val tag = dirTag(dir)
    val (liName, oName) = (s"graft_li_bucketed_$tag", s"graft_o_bucketed_$tag")
    // Idempotence keys on CATALOG existence, not session conf: the catalog
    // is shared across `newSession()` siblings while conf is per-session,
    // so a conf key would let a sibling re-register (and rewrite) a table
    // name another session is mid-query on.
    if (!s.catalog.tableExists(liName) || !s.catalog.tableExists(oName)) {
      val base = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
      TempDirs.deleteOnExit(base)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").format("parquet")
        .option("path", s"$base/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liName)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
        .write.mode("overwrite").format("parquet")
        .option("path", s"$base/o")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(oName)
    }
    (liName, oName)
  }

  /** Streaming parquet source over the sf dir's events table, robust to
    * BOTH on-disk layouts: the driver ships events as a single FILE
    * (`events.parquet`) — the file-stream source needs a directory scan
    * plus a leaf-name glob to reach it — while locally generated scale-up
    * data (graft.tools.ScaleUp) writes a parquet DIRECTORY of part files,
    * where that same glob matches nothing (`pathGlobFilter` filters LEAF
    * file names, so `part-*.parquet` leaves never match "events.parquet"
    * and the stream silently reads zero rows). There the directory itself
    * is the path. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val p = s"$dir/events.parquet"
    val schema = s.read.parquet(p).schema
    if (new java.io.File(p).isDirectory) s.readStream.schema(schema).parquet(p)
    else s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Build (once per session × sf dir) the time-ordered streaming source
    * for n23: three real slices plus two far-future watermark sentinels,
    * mtimes pinned strictly ascending. Reusing the directory across bench
    * samples avoids re-writing the corpus per sample and bounds /tmp
    * garbage to one copy per process. */
  private def sessionSourceDir(s: SparkSession, dir: String): String = synchronized {
    val key = s"graft.n23.src.$dir"
    s.conf.getOption(key).getOrElse {
      val ev = events(s, dir) // NTZ µs
      val srcDir = java.nio.file.Files.createTempDirectory("graft-ss-src").toString
      TempDirs.deleteOnExit(srcDir)
      val b = ev.agg(min(col("ts")).as("a"), max(col("ts")).as("z")).head()
      val (t0, t1) = (b.getAs[java.time.LocalDateTime]("a"),
        b.getAs[java.time.LocalDateTime]("z"))
      val span = java.time.Duration.between(t0, t1).getSeconds
      val (c1, c2) = (t0.plusSeconds(span / 3), t0.plusSeconds(2 * span / 3))
      val evCols = ev.columns.map(col)
      def sentinel(ldt: java.time.LocalDateTime) = s.range(1).select(
          lit(-1L).as("event_id"), lit(ldt).as("ts"), lit(-1L).as("user_id"),
          lit("sentinel").as("event_type"), lit(0.0).as("value"),
          lit("{}").as("props"))
        .select(evCols: _*)
      // The file source admits files in modification-time order; pin
      // STRICTLY ascending mtimes per batch write — an mtime tie could
      // order a watermark sentinel before real data, making every real
      // event late behind a +2h watermark and failing the timer contract.
      val seen = scala.collection.mutable.Set.empty[String]
      Seq(ev.filter(col("ts") <= lit(c1)),
          ev.filter(col("ts") > lit(c1) && col("ts") <= lit(c2)),
          ev.filter(col("ts") > lit(c2)),
          sentinel(t1.plusHours(1)), sentinel(t1.plusHours(2)))
        .zipWithIndex.foreach { case (df, i) =>
          df.coalesce(1).write.mode("append").parquet(srcDir)
          new java.io.File(srcDir).listFiles()
            .filter(f => f.getName.endsWith(".parquet") && seen.add(f.getName))
            .foreach { f =>
              require(f.setLastModified((i + 1) * 60000L),
                s"could not pin mtime on $f — batch ordering would be " +
                  "nondeterministic")
            }
        }
      s.conf.set(key, srcDir)
      srcDir
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- variant/JSON column: extract + aggregate ----
    "n1_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ---- as-of join: latest click at-or-before each purchase, per user ----
    // Composed from existing ops (union + running last_value over a window):
    // no custom operator needed, one shuffle on user_id.
    "n2_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("event_id").as("click_id"), lit(null).cast(LongType).as("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast(LongType).as("click_id"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("click_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      clicks.unionByName(purchases)
        .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("last_click"))
        .orderBy(col("event_id"))
    }),

    // ---- grouping sets: ROLLUP ----
    "n3_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // ---- grouping sets: CUBE ----
    "n4_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // ---- analytic lag/lead over event history ----
    "n5_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir).filter(col("user_id") < 20)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"),
          col("prev_value"), col("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- set operations: INTERSECT ----
    "n6_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // ---- event-time streaming: tumbling-window counts (memory sink) ----
    "n7_stream_window" -> ((s, dir) => {
      // Watermarks require tz-aware TIMESTAMP; the session is UTC so casting
      // the output back to NTZ matches the oracle's naive timestamps.
      val stream = eventsStream(s, dir).transform(Tables.tsLtz)
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.streaming.Streams.runToMemory(agg, "graft_stream_window", "complete", statePartitions = Some(8))
        .select(col("window.start").cast(TimestampNTZType).as("window_start"),
          col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ---- variant shredding: parse-once typed materialization of JSON ----
    "n8_variant_shred" -> ((s, dir) => {
      graft.functions.Variant.shred(events(s, dir),
          "props", Seq("k" -> IntegerType))
        .select(col("event_id"), col("event_type"), col("props_k"))
        .orderBy(col("event_id"))
    }),

    // ---- sliding windows: 1-hour windows every 30 min (streaming) ----
    // Each event lands in exactly duration/slide = 2 overlapping windows;
    // the oracle materializes both window starts per event and aggregates.
    "n10_sliding_window" -> ((s, dir) => {
      val stream = eventsStream(s, dir).transform(Tables.tsLtz)
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.streaming.Streams.runToMemory(agg, "graft_sliding_window", "complete", statePartitions = Some(8))
        .select(col("window.start").cast(TimestampNTZType).as("window_start"),
          col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ---- streaming dedup: stateful dropDuplicates under a watermark ----
    // The streaming analog of exact dedup for continuous ingestion; emits
    // each (user_id, event_type) pair once, state bounded by the watermark.
    "n11_stream_dedup" -> ((s, dir) => {
      val stream = eventsStream(s, dir).transform(Tables.tsLtz)
      val dedup = stream
        .withWatermark("ts", "1 hour")
        .dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      graft.streaming.Streams.runToMemory(dedup, "graft_stream_dedup", "append", statePartitions = Some(8))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // ---- custom streaming state: mapGroupsWithState running counts ----
    // KeyValueGroupedDataset + GroupState is the extension point for state
    // Spark's built-in operators can't express; here a per-user running
    // count (single AvailableNow batch → final totals, oracle-checkable).
    "n12_stateful_counts" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.GroupStateTimeout
      val users = eventsStream(s, dir).select(col("user_id")).as[Long]
      val counted = users.groupByKey(identity)
        .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
          (user, rows, state) =>
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            (user, n)
        }.toDF("user_id", "n")
      graft.streaming.Streams.runToMemory(counted, "graft_stateful_counts", "update", statePartitions = Some(8))
        .orderBy(col("user_id"))
    }),

    // ---- set operations: EXCEPT ----
    "n13_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // ---- exact multi-quantile per group ----
    // One scalar row per (group, quantile) — array-valued result columns
    // can't be sorted/hashed by the oracle harness, so explode positionally.
    "n14_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"),
          typedlit(Seq(0.25, 0.5, 0.75))).as("qs"))
        .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("pos", "value")))
        .select(col("l_returnflag"),
          element_at(typedlit(Seq(0.25, 0.5, 0.75)), col("pos") + 1).as("q"),
          col("value"))
        .orderBy(col("l_returnflag"), col("q"))
    }),

    // ---- time-range join: clicks within 15 min before each purchase ----
    // NOT an inequality join (O(n·m) per user at scale): both sides key on
    // 15-min time bins, purchases probe (bin, bin-1), so the join is a pure
    // equality shuffle on (user_id, bin) and the range check is residual.
    "n15_range_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val binUs = 900000000L // 15 min in µs
      def bin(c: Column) = (unix_micros(c.cast(TimestampType)) / binUs).cast(LongType)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), bin(col("ts")).as("bin"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("pts"),
          explode(array(bin(col("ts")), bin(col("ts")) - 1)).as("bin"))
      purchases.join(clicks, Seq("user_id", "bin"), "left")
        .groupBy(col("event_id"))
        .agg(count(when(col("cts") >= col("pts") - expr("INTERVAL 15 MINUTES") &&
          col("cts") <= col("pts"), 1)).as("n_clicks"))
        .orderBy(col("event_id"))
    }),

    // ---- stream-stream join: purchases ⋈ clicks within 15 min, both sides
    // unbounded streams with watermarked state (the capability the
    // reference's commit-feed model cannot express at all). Inner joins with
    // time bounds emit eagerly; the watermark bounds join state, so state
    // size follows the time window, not the stream length. ----
    "n17_stream_join" -> ((s, dir) => {
      def src = eventsStream(s, dir).transform(Tables.tsLtz)
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"),
          col("event_id").as("click_id"))
        .withWatermark("cts", "1 hour")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("pts"),
          col("event_id").as("purchase_id"))
        .withWatermark("pts", "1 hour")
      val joined = purchases.join(clicks,
        expr("p_user = c_user AND cts >= pts - INTERVAL 15 MINUTES AND cts <= pts"))
        .select(col("purchase_id"), col("click_id"))
      graft.streaming.Streams.runToMemory(joined, "graft_stream_join", "append", statePartitions = Some(8))
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // ---- streaming upsert: readStream → foreachBatch MERGE into the
    //      Delta table (the canonical CDC-apply pattern). Each micro-batch
    //      reduces to per-key latest, drops rows older than the table's
    //      current row (anti-join guard), then key-merges — so the final
    //      state is per-user latest by (ts, event_id) REGARDLESS of batch
    //      arrival order, which is what makes it oracle-checkable. ----
    "n18_stream_merge" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = events(s, dir).filter(col("event_id") < 2000)
      val srcDir = java.nio.file.Files.createTempDirectory("graft-sm-src").toString
      ev.repartition(4).write.mode("overwrite").parquet(srcDir)
      val t = graft.delta.DeltaTable.forPath(s,
        java.nio.file.Files.createTempDirectory("graft-sm").toString)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val w = Window.partitionBy(col("user_id"))
              .orderBy(col("ts").desc, col("event_id").desc)
            val latest = batch.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
            if (t.version < 0) { t.write(latest); () } // first batch seeds the table
            else {
              val cur = t.toDF().select(col("user_id").as("__u"),
                col("ts").as("__t"), col("event_id").as("__e"))
              val fresh = latest.join(cur, latest("user_id") === col("__u") &&
                (col("__t") > latest("ts") ||
                  (col("__t") === latest("ts") && col("__e") >= latest("event_id"))),
                "left_anti")
              if (!fresh.isEmpty) { t.merge(fresh, Seq("user_id")); () }
            }
          }
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      t.toDF()
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // ---- streaming SOURCE over the Delta log (stream-FROM, pairing n18's
    // stream-INTO): `readStream.format("graft-delta")` tails commits as
    // version offsets (graft.streaming.DeltaStreamSource). Three append
    // commits drain as rate-capped tail batches under AvailableNow; the
    // streamed rows must aggregate exactly like a batch read (the oracle
    // proves no row lost or duplicated across batch boundaries).
    "n19_stream_source" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
      val tbl = graft.delta.DeltaTable.forPath(s,
        java.nio.file.Files.createTempDirectory("graft-ss").toString)
      (0 until 3).foreach(k =>
        tbl.write(o.filter(col("o_orderkey") % 30 === k * 10)))
      val name = "n19_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "8")
        .load(tbl.path)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.Streams.drainMemorySink(s, name)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- streaming CHANGE FEED (stream-FROM the CDF): the same scripted
    // DML sequence d7 oracles in batch (`changes(2,3)`), consumed through
    // `readStream.format("graft-delta").option("readChangeFeed", true)` —
    // change rows (insert + delete images) ARE the stream. maxFilesPerTrigger=1
    // forces the insert commit and the delete commit into separate
    // micro-batches, so the gate proves per-version offset bookkeeping: no
    // change row lost or duplicated across batch boundaries, and the drain
    // equals the batch CDF byte-for-byte. ----
    "n27_stream_cdf" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val tbl = graft.delta.DeltaTable.forPath(s,
        java.nio.file.Files.createTempDirectory("graft-cdf").toString)
      val ev = events(s, dir)
      tbl.write(ev.filter(col("event_type") === "view")) // v0 (pre-CDC)
      tbl.enableCDC() // v1
      tbl.write(ev.filter(col("event_type") === "click")) // v2 → inserts
      tbl.delete("""{"value":{"$lt":5}}""") // v3 → deletes
      val name = "n27_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("graft-delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .option("maxFilesPerTrigger", "1")
        .load(tbl.path)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.Streams.drainMemorySink(s, name)
        .select(col(graft.delta.Cdc.ChangeType), col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col(graft.delta.Cdc.ChangeType), col("event_id"))
    }),

    // ---- streaming read THROUGH THE CATALOG: `spark.readStream.table(t)`
    // — the DSv2 micro-batch stream (graft.streaming.GraftMicroBatchStream)
    // over a PARTITIONED catalog table, so the gate exercises partition-
    // value reconstruction from the log, the table-order output
    // permutation (the partition column sits mid-schema), and version
    // pacing (maxFilesPerTrigger splits the three INSERT commits into
    // multiple micro-batches). The drained rows must aggregate exactly
    // like a batch read: no row lost or duplicated across batches. ----
    "n28_stream_table_read" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val cat = graft.plans.GraftSql.ensure(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.nstar")
      val tn = s"$cat.nstar.rst_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      s.sql(s"""CREATE TABLE $tn (o_orderkey BIGINT, o_orderstatus STRING,
               |  o_totalprice DOUBLE) PARTITIONED BY (o_orderstatus)""".stripMargin)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      (0 until 3).foreach(k =>
        o.filter(col("o_orderkey") % 30 === k * 10).writeTo(tn).append())
      val name = "n28_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream
        .option("startingVersion", "1")
        .option("maxFilesPerTrigger", "4")
        .table(tn)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.Streams.drainMemorySink(s, name)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- streaming write THROUGH THE CATALOG: `writeStream.toTable(t)` —
    // the DSv2 streaming sink (graft.streaming.GraftStreamingWrite), where
    // EXECUTORS write parquet directly into the destination's partitioned
    // Hive layout and each epoch lands as one txn-carrying commit
    // (exactly-once). Composed end-to-end: catalog table → readStream
    // .table → filter/derive (incl. the partition band) → toTable →
    // batch read-back, which must equal the same filter/derive in SQL. ----
    "n29_stream_table_write" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val cat = graft.plans.GraftSql.ensure(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.nstar")
      val uid = java.util.UUID.randomUUID().toString.replace("-", "")
      val src = s"$cat.nstar.wsrc_$uid"
      val dst = s"$cat.nstar.wdst_$uid"
      s.sql(s"""CREATE TABLE $src (event_id BIGINT, user_id BIGINT,
               |  event_type STRING, value DOUBLE)""".stripMargin)
      s.sql(s"""CREATE TABLE $dst (event_id BIGINT, user_id BIGINT,
               |  v2 DOUBLE, band STRING) PARTITIONED BY (band)""".stripMargin)
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      (0 until 3).foreach(k =>
        ev.filter(col("event_id") % 3 === k).writeTo(src).append())
      val q = s.readStream.option("startingVersion", "1").table(src)
        .filter(col("event_type") === "click" && col("value") >= 10)
        .selectExpr("event_id", "user_id", "value * 2 AS v2",
          "CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS band")
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-n29").toString)
        .trigger(Trigger.AvailableNow()).toTable(dst)
      q.awaitTermination()
      s.sql(s"SELECT event_id, user_id, v2, band FROM $dst ORDER BY event_id")
    }),

    // ---- streaming IDENTITY allocation (round 13): writeStream.toTable
    // into a GENERATED ALWAYS AS IDENTITY table — each epoch's factory
    // allocates an interleaved lattice slice from the high-water mark a
    // fresh snapshot read, the commit advances the mark, and the next
    // epoch continues above it. Per-row values are nondeterministic
    // (partition interleave, gaps allowed — Delta's identity contract),
    // so the gate checks what IS contracted: every value on the
    // (100, +7) lattice (lat = 0) and zero duplicates (n = nd), per
    // row count the oracle re-derives from `orders`. ----
    "n30_stream_identity" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val cat = graft.plans.GraftSql.ensure(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.nstar")
      val uid = java.util.UUID.randomUUID().toString.replace("-", "")
      val src = s"$cat.nstar.nisrc_$uid"
      val dst = s"$cat.nstar.nidst_$uid"
      s.sql(s"CREATE TABLE $src (o_orderkey BIGINT, o_totalprice DOUBLE)")
      s.sql(s"""CREATE TABLE $dst (rid BIGINT GENERATED ALWAYS AS IDENTITY
               |  (START WITH 100 INCREMENT BY 7),
               |  o_orderkey BIGINT, o_totalprice DOUBLE)""".stripMargin)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      (0 until 3).foreach(k =>
        o.filter(col("o_orderkey") % 30 === k * 10).writeTo(src).append())
      val q = s.readStream.option("startingVersion", "1")
        .option("maxFilesPerTrigger", "4").table(src)
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-n30").toString)
        .trigger(Trigger.AvailableNow()).toTable(dst)
      q.awaitTermination()
      s.sql(s"""SELECT (rid - 100) % 7 AS lat, count(*) AS n,
               |  count(DISTINCT rid) AS nd
               |FROM $dst GROUP BY (rid - 100) % 7""".stripMargin)
    }),

    // ---- streaming CURATION: the text-pipeline operators composed with
    // Structured Streaming — a doubled corpus lands in the Delta table as
    // three append commits, the stream tails them rate-capped, and each
    // micro-batch runs the map-side curation (token-count floor +
    // fingerprint) with a STATEFUL cross-batch exact dedup
    // (dropDuplicates on the fingerprint — first arrival wins, duplicates
    // in LATER batches are dropped by the state store, which is the whole
    // point of the gate). Production corpora would watermark the dedup
    // state by event time; an AvailableNow backfill is finite so the
    // unbounded state is the documented right choice here. The per-lang
    // counts must match a batch COUNT(DISTINCT fp) — no fingerprint lost
    // or double-counted across batch boundaries. ----
    "n20_stream_curation" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      val doubled = d.unionByName(
        d.select((col("doc_id") + 100000).as("doc_id"), col("lang"), col("text")))
      val tbl = graft.delta.DeltaTable.forPath(s,
        java.nio.file.Files.createTempDirectory("graft-sc").toString)
      (0 until 3).foreach(k => tbl.write(doubled.filter(col("doc_id") % 3 === k)))
      val name = "n20_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxFilesPerTrigger", "8")
        .load(tbl.path)
        .filter(graft.functions.TextFunctions.tokenCount(col("text")) >= 50)
        .select(col("lang"),
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        // key the state on (lang, fp), not fp alone: two docs can share a
        // fingerprint under different lang labels, and a global-fp dedup
        // would make the surviving lang depend on arrival order
        .dropDuplicates("lang", "fp")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.Streams.drainMemorySink(s, name)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    }),

    // ---- native VARIANT type: parse-once semi-structured extraction ----
    // Spark 4's VariantType (the reference's parquet/variant.ts encodes the
    // same open format): parse the JSON once into a variant value, extract
    // typed fields with variant_get — no re-parse per field.
    "n16_variant_type" -> ((s, dir) => {
      events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          try_variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.missing", "string").as("m"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(col("m")).as("n_missing"))
        .orderBy(col("event_type"))
    }),

    // ---- session windows: 30-min-gap sessionization per user ----
    // Spark's session_window merges events whose gap is strictly under the
    // duration (next < last+gap); the oracle mirrors that as gaps-and-islands
    // with a `>= gap` session break. One shuffle on user_id.
    "n9_session_window" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("tst", col("ts").cast(TimestampType)) // session TZ is UTC
      ev.groupBy(col("user_id"), session_window(col("tst"), "30 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast(TimestampNTZType).as("session_start"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // ---- timeout-evicted streaming sessionization: n9's 30-min sessions
    // rebuilt with flatMapGroupsWithState + EventTimeTimeout — the custom-
    // state shape that also EVICTS: a session emits either when a
    // later-than-gap event closes it in-batch, or when the event-time
    // timer passes the watermark (so per-user state cannot accumulate
    // forever on an unbounded stream). The source replays events as three
    // time-ordered files (cross-batch sessions must survive batch
    // boundaries) plus two far-future watermark sentinels that flush every
    // still-open session before AvailableNow drains. Must equal the batch
    // gaps-and-islands oracle row for row. ----
    "n23_stream_sessions" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val srcDir = sessionSourceDir(s, dir)
      val schema = s.read.parquet(srcDir).schema
      val typed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .transform(Tables.tsLtz) // watermark needs an instant-typed column
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("event_id").cast("long").as("event_id"), col("value"))
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.time.Instant, Long, Double)]
      val sessions = typed.groupByKey(_._1)
        .flatMapGroupsWithState[OpenSession, SessionOut](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
          sessionize(30L * 60 * 1000000L))
      graft.streaming.Streams.runToMemory(sessions.toDF(),
          "graft_stream_sessions", "append",
          // 8 state partitions BY MEASUREMENT (round-15 sizing pass at
          // sf1): per-partition store maintenance × micro-batch count
          // dominates the stateful shuffle here, so core-count sizing
          // (32) ran 1.2× SLOWER than 8 on both providers
          statePartitions = Some(8))
        .select(col("user_id"),
          col("session_start").cast(TimestampNTZType).as("session_start"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // ---- explicit GROUPING SETS through the SQL entry point (rollup/cube
    // are n3/n4; this is the arbitrary-sets form + grouping() marker —
    // Catalyst expands all sets over ONE scan) ----
    "n25_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
          |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
          |                        (l_returnflag, l_linestatus))
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    }),

    // ---- correlated EXISTS (TPC-H Q4 shape): orders with at least one
    // late-shipped line. Catalyst rewrites the subquery to a LEFT SEMI
    // join on the order key — one shuffle pair, no per-row subquery ----
    "n26_exists_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
          |FROM orders o
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |  AND EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // ---- bucketed co-located join: both sides bucketed by the join key
    // into the session catalog, so the fact⋈fact join runs with NO exchange
    // on either side — the pre-partitioning technique that turns the
    // biggest shuffle of a recurring 100 TB join workload into a pure
    // map-side zip (plan-audited in QueriesSpec: zero Exchange below the
    // join). The only shuffles left are the aggregation's. ----
    "n24_bucketed_join" -> ((s, dir) => {
      val (liName, oName) = bucketedTables(s, dir)
      s.table(liName)
        .join(s.table(oName),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderdate"))
        .agg(dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderdate"))
    }),

    // ---- cohort retention: users grouped by first-seen week, activity
    // counted per (cohort, week). The cohort label rides a user-keyed
    // window; the (cohort, activity) rollup is a distinct-count whose
    // partial aggregation is map-side. Week truncation is ISO-Monday in
    // both engines; the offset is all-integer (days div 7). ----
    "n22_cohort_retention" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      events(s, dir)
        .withColumn("cohort",
          date_trunc("week", min(col("ts")).over(w)).cast(DateType))
        .withColumn("activity", date_trunc("week", col("ts")).cast(DateType))
        .groupBy(col("cohort"), col("activity"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .withColumn("week_offset", expr("datediff(activity, cohort) div 7"))
        .select(col("cohort"), col("week_offset"), col("activity"), col("n_users"))
        .orderBy(col("cohort"), col("week_offset"))
    }),

    // ---- conversion funnel: per user, earliest signup → first purchase at
    // or after it, with integer seconds-to-convert. One user-keyed window
    // (earliest signup broadcast down the partition) and a groupBy that
    // REUSES the window's hash partitioning — a single shuffle end to end.
    "n21_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
      val withS = events(s, dir)
        .withColumn("signup_ts",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("signup_ts").isNotNull)
      withS.groupBy(col("user_id"))
        .agg(first(col("signup_ts")).as("signup_ts"),
          min(when(col("event_type") === "purchase" &&
              col("ts") >= col("signup_ts"), col("ts")))
            .as("first_purchase_ts"))
        .withColumn("converted", col("first_purchase_ts").isNotNull)
        .withColumn("secs_to_convert",
          when(col("converted"),
            expr("(unix_micros(CAST(first_purchase_ts AS TIMESTAMP)) - " +
              "unix_micros(CAST(signup_ts AS TIMESTAMP))) div 1000000")))
        .orderBy(col("user_id"))
    }))

  /** Gaps-and-islands 30-minute sessionization — the single source for
    * BOTH the batch gate (n9) and the streaming gate (n23), which must
    * land on the identical answer. */
  private lazy val SessionOracleSql: String =
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM e)
       |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n,
       |  ${sqlDsum("value")} AS sum_value
       |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // SUM(INTEGER) is HUGEINT (arrow decimal128) in DuckDB but int64 in
    // Spark — cast to BIGINT so the type-sensitive hash compare agrees.
    "n1_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "n2_asof_join" ->
      """SELECT p.event_id, c.event_id AS last_click
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "n3_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "n4_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "n5_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events WHERE user_id < 20
        |ORDER BY user_id, event_id""".stripMargin,

    "n6_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "n7_stream_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "n8_variant_shred" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS props_k
        |FROM events ORDER BY event_id""".stripMargin,

    // Sliding windows: every event belongs to the window starting at its
    // floor-to-30min and the one 30 min before (duration 1 h / slide 30 min).
    "n10_sliding_window" ->
      """SELECT make_timestamp(((epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000)
        |    - j.j) * 1800000000) AS window_start,
        |  event_type, COUNT(*) AS n
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS j) j
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "n11_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "n17_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL 15 MINUTE AND p.ts
        |ORDER BY purchase_id, click_id""".stripMargin,

    "n18_stream_merge" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE event_id < 2000) sub
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "n19_stream_source" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE o_orderkey % 10 = 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "n28_stream_table_read" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders WHERE o_orderkey % 10 = 0
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "n29_stream_table_write" ->
      """SELECT event_id, user_id, value * 2 AS v2,
        |  CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS band
        |FROM events WHERE event_type = 'click' AND value >= 10
        |ORDER BY event_id""".stripMargin,

    // Per-row identity values are nondeterministic (interleaved lattice,
    // gaps allowed), so the oracle checks the CONTRACT: one group, on
    // lattice (lat 0), as many DISTINCT values as rows (n = nd = the
    // streamed row count, re-derived from orders).
    "n30_stream_identity" ->
      """SELECT CAST(0 AS BIGINT) AS lat, count(*) AS n, count(*) AS nd
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,

    // Same post-state algebra as d7 (the batch CDF gate): inserts = the
    // click rows, deletes = every row under the value floor at delete time.
    "n27_stream_cdf" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS _change_type, event_id, user_id, event_type, value
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT 'delete', event_id, user_id, event_type, value
        |  FROM events WHERE event_type IN ('view','click') AND value < 5) ch
        |ORDER BY _change_type, event_id""".stripMargin,

    // The doubled corpus collapses to one row per fingerprint; duplicates
    // share the lang of their original, so per-lang COUNT(DISTINCT fp) is
    // exactly what the streaming dedup must reproduce.
    "n20_stream_curation" ->
      """SELECT lang,
        |  COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n
        |FROM documents
        |WHERE len(string_split(text, ' ')) >= 50
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "n16_variant_type" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
        |        THEN 1 END) AS n_missing
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "n12_stateful_counts" ->
      """SELECT user_id, COUNT(*) AS n FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "n13_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "n14_percentile" ->
      """SELECT l_returnflag, q, value FROM (
        |  SELECT l_returnflag,
        |    unnest(CAST([0.25, 0.5, 0.75] AS DOUBLE[])) AS q,
        |    unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75])) AS value
        |  FROM lineitem GROUP BY l_returnflag) sub
        |ORDER BY l_returnflag, q""".stripMargin,

    "n15_range_join" ->
      """SELECT p.event_id, COUNT(c.user_id) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL 15 MINUTE AND p.ts
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,

    "n9_session_window" ->
      SessionOracleSql,

    // Grouping sets: same SQL, grouping() markers cast to BIGINT on both
    // engines (Spark emits TINYINT, DuckDB INT — the cast aligns them).
    "n25_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // Correlated EXISTS: identical SQL runs on both engines.
    "n26_exists_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Bucketed join: the bucketed copies hold the same rows as the source
    // tables, so the oracle is the plain join.
    "n24_bucketed_join" ->
      s"""SELECT o_orderdate, ${sqlDsum("l_extendedprice")} AS sum_price,
         |  COUNT(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderstatus = 'F'
         |GROUP BY o_orderdate ORDER BY o_orderdate""".stripMargin,

    // Streaming sessionization must land exactly on the batch
    // gaps-and-islands answer (n9's oracle, verbatim).
    "n23_stream_sessions" ->
      SessionOracleSql,

    // Cohort retention: first-seen week per user joined back to activity
    // weeks; ISO-Monday date_trunc in both engines, integer day//7 offset.
    "n22_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT e.user_id, f.cohort, date_trunc('week', e.ts) AS activity
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort, datediff('day', cohort, activity) // 7 AS week_offset,
        |  activity, COUNT(DISTINCT user_id) AS n_users
        |FROM a GROUP BY cohort, activity
        |ORDER BY cohort, week_offset""".stripMargin,

    // Funnel: earliest signup per user, first purchase at-or-after it,
    // integer epoch-µs subtraction for the exact seconds delta.
    "n21_funnel" ->
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        |  GROUP BY e.user_id)
        |SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
        |  p.first_purchase_ts IS NOT NULL AS converted,
        |  CASE WHEN p.first_purchase_ts IS NOT NULL
        |       THEN (epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts))
        |            // 1000000
        |  END AS secs_to_convert
        |FROM s LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin)
}
