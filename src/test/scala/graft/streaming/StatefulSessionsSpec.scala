package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StatefulSessionsSpec extends SparkSpec {

  import StatefulSessions._

  private def ev(u: Long, s: String) = SessionEvent(u, Timestamp.valueOf(s))

  test("flatMapGroupsWithState closes sessions on gap, keeps state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val out = sessionize(stream.toDS(), gapSeconds = 1800)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_state_test").start()
    try {
      // batch 1: two events 5 min apart (same session), then nothing
      stream.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      assert(spark.table("sess_state_test").isEmpty, "session still open — nothing emitted")

      // batch 2: event 2 h later → closes the first session, opens another;
      // state must have survived the batch boundary
      stream.addData(ev(1, "2024-01-01 12:05:00"))
      q.processAllAvailable()
      val closed = spark.table("sess_state_test").as[ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed(0).events == 2)
      assert(closed(0).session_start == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(closed(0).session_end == Timestamp.valueOf("2024-01-01 10:05:00"))

      // different user in the same batches never mixes state
      stream.addData(ev(2, "2024-01-01 10:00:00"), ev(2, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      val all = spark.table("sess_state_test").as[ClosedSession].collect()
      assert(all.count(_.user_id == 2) == 1)
      assert(all.find(_.user_id == 2).get.events == 1)
    } finally q.stop()
  }
}
