package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit state
  * (`flatMapGroupsWithState`) — the stateful-operator capability the
  * reference has no analogue for (its aggregation is per-rotated-file
  * batch SQL, SURVEY §2.C). Sessions close when an inactivity gap
  * appears within the data, or via event-time timeout once the
  * watermark passes session end + gap.
  *
  * State per user is one open session (constant size) — at 100 TB the
  * state store scales with |active users|, not |events|.
  *
  * Precision contract, aligned with the batch operator
  * ([[graft.operators.Sessionize]]) so the two are row-identical on
  * shared input: session BOUNDARY decisions compare millisecond-floored
  * epochs (`unix_millis` semantics — what the batch SQL and the DuckDB
  * oracle use), while session_start/session_end OUTPUTS keep the full
  * microsecond precision of the underlying events.
  */
object StatefulSessionize {

  val GapMs: Long = 30L * 60 * 1000
  val GapUs: Long = GapMs * 1000

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  /** Open-session state: bounds in MICROSECONDS since epoch. */
  case class Open(start: Long, end: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     total_value: Double)

  private def usOf(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000
  }

  private def tsOf(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000))

  private def toSession(uid: Long, s: Open): Session =
    Session(uid, tsOf(s.start), tsOf(s.end),
      s.n, math.round(s.total * 100).toDouble / 100)

  def update(uid: Long, events: Iterator[Ev],
             state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => usOf(e.ts))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = usOf(e.ts)
      open match {
        // ms-floored gap decision — identical to the batch operator's
        // unix_millis(ts) - unix_millis(prev_ts) > GapMs
        case Some(s) if t / 1000 - s.end / 1000 > GapMs =>
          closed += toSession(uid, s)
          open = Some(Open(t, t, 1, e.value))
        case Some(s) =>
          open = Some(Open(s.start, math.max(s.end, t), s.n + 1,
            s.total + e.value))
        case None =>
          open = Some(Open(t, t, 1, e.value))
      }
    }
    open.foreach { s =>
      val timeoutMs = (s.end + GapUs) / 1000
      if (state.getCurrentWatermarkMs() > timeoutMs) {
        // the watermark already passed this session's horizon (a key
        // whose data arrived late relative to other keys' progress):
        // close it NOW — arming the timeout would throw, and the
        // emission is identical to the timeout that can no longer fire.
        // REMOVE the carried state too: the pre-merge state and its
        // previously-armed timeout would otherwise survive this call,
        // and the SAME batch's timed-out pass (Spark runs it after the
        // data pass, and it does not exclude keys that just received
        // data) would fire on the stale state and emit a second,
        // shorter session for the same user.
        state.remove()
        closed += toSession(uid, s)
      } else {
        state.update(s)
        // fires when the (ms) watermark passes this strictly — i.e.
        // wm_ms > (end_us + gap_us) / 1000, the exact predicate the
        // oracle states relationally
        state.setTimeoutTimestamp(timeoutMs)
      }
    }
    closed.result().iterator
  }

  /** events stream (with watermark on `ts`) → closed sessions. */
  def sessions(events: Dataset[Ev]): Dataset[Session] = {
    implicit val openEnc = Encoders.product[Open]
    implicit val sessEnc = Encoders.product[Session]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** The stream's watermark delay in [[streamSessionize]] — also baked
    * into that row's oracle predicate. */
  val StreamDelayMs: Long = 30L * 60 * 1000

  /** q_stream_sessionize: the stateful operator under the oracle gate.
    * The events table is staged as ts-range-partitioned shard files, so
    * the stream takes multiple micro-batches and the watermark advances
    * shard by shard: sessions close mid-stream by in-data gaps AND by
    * event-time timeout, and the final AvailableNow no-data batch
    * flushes every session whose timeout the final watermark passed.
    *
    * The emitted set is exactly characterized relationally: a session
    * is closed iff a later session of the same user exists (gap split),
    * or `wm > (epoch_us(session_end) + gap_us) div 1000` where
    * `wm = epoch_us(max ts) div 1000 - delay_ms` — the DuckDB oracle
    * states that predicate over the batch sessionization, so state
    * carry-over, µs-exact bounds, gap splits, timeout eviction, and
    * replay-idempotent output are all hash-gated. session_idx is
    * assigned post-hoc per user by session_start order; only TRAILING
    * sessions per user are unemitted, so the numbering matches the
    * batch enumeration on the closed prefix. */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-sess").toString
    try {
      // stage time-range shards and land them ONE SHARD PER
      // AvailableNow RUN against a shared checkpoint: the file source's
      // seen-files log guarantees each run reads exactly the newly
      // landed shard, so shard ORDER is the staging order — no mtime
      // dependence at all (the old shape ordered same-run files by
      // explicit java.io mtimes, which object stores and HCFS
      // implementations don't honor uniformly), and the watermark
      // advances monotonically across runs exactly as it does across a
      // production restart. One partitioned write job stages all
      // shards; landing them is pure Hadoop-FS renames.
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("value"))
      val mm = ev.agg(
        min(unix_micros(col("ts").cast("timestamp"))),
        max(unix_micros(col("ts").cast("timestamp")))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val step = (hi - lo) / 4 + 1
      ev.withColumn("__shard",
          floor((unix_micros(col("ts").cast("timestamp")) - lo) / step)
            .cast("int"))
        .repartition(4, col("__shard"))
        .write.mode("overwrite").partitionBy("__shard")
        .parquet(s"$root/staged")
      val srcPath = new org.apache.hadoop.fs.Path(s"$root/src")
      hfs.mkdirs(srcPath)
      val srcSchema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampNTZType),
        StructField("value", DoubleType)))
      def runAvailable(): Unit = {
        // high maxFilesPerTrigger: each run folds ALL its newly landed
        // files into one batch, where arrival order is immaterial (a
        // batch is an unordered set; the watermark advances after it)
        val stream = spark.readStream.schema(srcSchema)
          .option("maxFilesPerTrigger", 64).parquet(s"$root/src")
          // NTZ → instant under the UTC session; Ev carries an instant
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("value"))
          .withWatermark("ts", s"$StreamDelayMs milliseconds")
          .as[Ev]
        val q = sessions(stream).toDF()
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(s"$root/out")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      StreamHarness.withShufflePartitions(spark, 8) {
        // two shards per run: cross-SHARD order is enforced by the run
        // boundary (seen-files log), in-run order doesn't matter (one
        // batch) — the minimum restarts that still exercise watermark
        // advance + session closure across micro-batches
        Seq(Seq(0, 1), Seq(2, 3)).foreach { group =>
          group.foreach { i =>
            val shardDir = new org.apache.hadoop.fs.Path(
              s"$root/staged/__shard=$i")
            val files =
              if (hfs.exists(shardDir))
                hfs.listStatus(shardDir).toSeq
                  .filter(_.getPath.getName.endsWith(".parquet"))
              else Seq.empty
            files.zipWithIndex.foreach { case (st, j) =>
              val dest = new org.apache.hadoop.fs.Path(srcPath,
                s"shard-$i-$j.parquet")
              require(hfs.rename(st.getPath, dest),
                s"staging rename of ${st.getPath} to $dest refused")
            }
          }
          runAvailable() // this run sees exactly this group's new files
        }
      }
      val outSchema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("session_start", TimestampType),
        StructField("session_end", TimestampType),
        StructField("n_events", LongType),
        StructField("total_value", DoubleType)))
      val closed = spark.read.schema(outSchema)
        .option("basePath", s"$root/out").parquet(s"$root/out")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("session_start"))
      graft.operators.Scratch.materializeAndClean(root,
        closed
          .withColumn("session_idx", row_number().over(w).cast("long"))
          .select(col("user_id"), col("session_idx"),
            col("session_start").cast("timestamp_ntz").as("session_start"),
            col("session_end").cast("timestamp_ntz").as("session_end"),
            col("n_events"), col("total_value"))
          .orderBy("user_id", "session_idx"))
    } catch {
      case e: Throwable =>
        graft.operators.Scratch.rm(new java.io.File(root)); throw e
    }
  }
}
