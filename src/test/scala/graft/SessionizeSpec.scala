package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkSpec {

  private val MIN = 60L * 1000000L // one minute in micros

  test("batch sessionization splits on gaps and aggregates") {
    import spark.implicits._
    val ev = Seq(
      Event(1, 0, 10), Event(1, 5 * MIN, 20),           // session 1: 2 events
      Event(1, 60 * MIN, 5),                             // session 2 (55min gap)
      Event(2, 0, 7)).toDS()
    val out = Sessionize.batch(ev, gapMicros = 30 * MIN).collect()
      .sortBy(s => (s.user_id, s.session_start))
    assert(out.toSeq == Seq(
      Session(1, 0, 2, 30), Session(1, 60 * MIN, 1, 5), Session(2, 0, 1, 7)))
  }

  test("incremental stream mosaic is arrival-order independent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.scan.Tile
    import graft.streaming.StreamMosaic
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    def scene(i: Int): Tile = Tile(i, 0, "b", i.toLong * 1000000L, 0, 0, 0, 0, 8, 8,
      Array.tabulate(64)(k => k.toDouble + i * 1000.0))
    def run(order: Seq[Int], name: String): (Int, Long) = {
      val source = MemoryStream[Tile]
      val q = StreamMosaic(source.toDS(), chunk = 8, gridW = 8)
        .writeStream.outputMode("update").format("memory").queryName(name).start()
      try {
        order.foreach { i => source.addData(scene(i)); q.processAllAvailable() }
        val last = spark.table(name).orderBy($"updates".desc).first()
        (last.getAs[Int]("nValid"), last.getAs[Long]("sumV"))
      } finally q.stop()
    }
    val fwd = run(Seq(0, 1, 2), "sm_fwd")
    val rev = run(Seq(2, 1, 0), "sm_rev") // late scenes must not regress state
    assert(fwd == rev)
    assert(fwd._1 == 64 && fwd._2 == (0 until 64).map(_ + 2000L).sum) // scene 2 wins
  }

  test("stream mosaic state universe is the finite grid, not the stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.scan.Tile
    import graft.streaming.StreamMosaic
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // 20 scenes × 1 band over a 2×2-chunk grid: the NoTimeout state must
    // stay at exactly 4 groups however long the stream runs (the scaladoc
    // guard: state is sized by the grid, not by traffic)
    val source = MemoryStream[Tile]
    val q = StreamMosaic(source.toDS(), chunk = 4, gridW = 8)
      .writeStream.outputMode("update").format("memory")
      .queryName("sm_guard").start()
    try {
      (0 until 20).foreach { i =>
        for (yc <- 0 until 2; xc <- 0 until 2)
          source.addData(Tile(i, 0, "b", i.toLong * 1000000L, yc, xc, 0, 0, 4, 4,
            Array.fill(16)(i.toDouble)))
        q.processAllAvailable()
      }
      val snaps = spark.table("sm_guard")
      // group universe == grid chunks (4), never 20×4 stream entries
      assert(snaps.select($"band", $"yChunk", $"xChunk").distinct().count() == 4)
      // every group saw all 20 batches and holds the latest scene
      val last = snaps.groupBy($"yChunk", $"xChunk")
        .agg(org.apache.spark.sql.functions.max($"updates").as("u"))
        .collect()
      assert(last.length == 4 && last.forall(_.getAs[Int]("u") == 20))
      val fin = snaps.orderBy($"updates".desc).first()
      assert(fin.getAs[Long]("sumV") == 16L * 19) // scene 19 wins everywhere
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions matching batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // stateful operators otherwise schedule continuous no-data batches,
    // which starves processAllAvailable — poll the sink instead.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val source = MemoryStream[Event]
    val q = Sessionize.streaming(source.toDS(), gapMicros = 30 * MIN)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      source.addData(Event(1, 0, 10), Event(1, 5 * MIN, 20))
      source.addData(Event(1, 60 * MIN, 5), Event(1, 61 * MIN, 5))
      // the 55-min gap closes session 1; the open session stays in state
      val deadline = System.nanoTime() + 60L * 1000000000L
      var closed = Seq.empty[Session]
      while (closed.isEmpty && System.nanoTime() < deadline) {
        closed = spark.table("sessions_out").as[Session].collect().toSeq
        if (closed.isEmpty) Thread.sleep(250)
      }
      assert(closed == Seq(Session(1, 0, 2, 30)))
    } finally q.stop()
  }
}
