package graft.streaming

// Temporary debug harness (not a test) — run via Test/runMain.
object SessionDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    import graft.streaming.EventStreams.Event
    import java.sql.Timestamp
    implicit val s = spark
    implicit val sq = spark.sqlContext
    def ts(min: Int) = new Timestamp(min * 60000L)
    def ev(id: Long, min: Int, user: Long) = Event(id, ts(min), user, "click", 1.0)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val out = EventStreams.sessionize(mem.toDS())
    val q = out.writeStream.format("memory").queryName("dbg")
      .outputMode("append").start()
    mem.addData(ev(1, 0, 1), ev(2, 5, 1), ev(3, 30, 1))
    q.processAllAvailable()
    println("=== after batch 1: " + spark.table("dbg").collect().mkString("; "))
    mem.addData(ev(9, 300, 2))
    q.processAllAvailable()
    println("=== after batch 2: " + spark.table("dbg").collect().mkString("; "))
    mem.addData(ev(10, 600, 2))
    q.processAllAvailable()
    println("=== after batch 3: " + spark.table("dbg").collect().mkString("; "))
    q.stop()
    spark.stop()
  }
}
