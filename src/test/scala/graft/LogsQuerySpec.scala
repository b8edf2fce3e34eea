package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GetLogsFilter, LogsQuery}

case class TestLog(id: Long, log_index_in_tx: Long, tx_index_in_block: Long,
                   block_number: Long,
                   block_hash: String, transaction_hash: String,
                   contract_address: String, data: String,
                   topic0: String, topic1: Option[String],
                   topic2: Option[String], topic3: Option[String])

/** Unit tests for the flagship query semantics, matching the reference
  * behavior at `src/api.rs:111-195`. */
class LogsQuerySpec extends AnyFunSuite with SparkSpec {

  lazy val logs: DataFrame = {
    import spark.implicits._
    (0L until 200L).map { i =>
      val b = i / 4
      TestLog(i, i % 4, (i / 2) % 2, b, s"0xBlock$b", s"0xtx${i / 2}", s"0xAddr${i % 5}",
        s"d$i", s"0xsig${i % 3}",
        if (i % 2 == 0) Some(s"0xt1-${i % 7}") else None, None, None)
    }.toDF()
  }

  private def ids(f: GetLogsFilter): Seq[Long] =
    LogsQuery.plan(logs, f).collect().map(_.getAs[Long]("id")).toSeq

  test("Q-5: block_hash filter overrides the block range (api.rs:126-139)") {
    val got = ids(GetLogsFilter(blockHash = Some("0xblock3"),
      fromBlock = Some(40), toBlock = Some(45), pageSize = Some(100)))
    assert(got == Seq(12L, 13L, 14L, 15L)) // block 3 only; range ignored
  }

  test("Q-2: case-insensitive equality on block_hash and address (api.rs:127,141)") {
    val byHash = ids(GetLogsFilter(blockHash = Some("0XBLOCK3"), pageSize = Some(100)))
    assert(byHash == Seq(12L, 13L, 14L, 15L))
    val byAddr = ids(GetLogsFilter(contractAddress = Some("0XADDR0"),
      toBlock = Some(4), pageSize = Some(100)))
    assert(byAddr == Seq(0L, 5L, 10L, 15L))
  }

  test("Q-6: cursor returns rows strictly after (block, id), tuple order (api.rs:162-172)") {
    val got = ids(GetLogsFilter(cursorBlock = Some(10), cursorLogId = Some(41),
      pageSize = Some(5)))
    assert(got == Seq(42L, 43L, 44L, 45L, 46L))
  }

  test("Q-6: EITHER cursor field alone enters cursor mode, missing one defaults to 0 (api.rs:116-118)") {
    // only cursorBlock: behaves as (block, id) > (10, 0) — NOT offset
    // mode. Block 10 holds ids 40..43, all with id > 0, so the page
    // starts at 40 (offset mode with page=3 would start at 10).
    val blockOnly = ids(GetLogsFilter(cursorBlock = Some(10), page = Some(3), pageSize = Some(5)))
    assert(blockOnly == Seq(40L, 41L, 42L, 43L, 44L),
      "cursorBlock alone must not degrade to OFFSET pagination")
    // only cursorLogId: (block, id) > (0, 1) — rows after id 1 in block 0, then on
    val idOnly = ids(GetLogsFilter(cursorLogId = Some(1), pageSize = Some(4)))
    assert(idOnly == Seq(2L, 3L, 4L, 5L))
  }

  test("Q-8: page size clamps to [1, 100] (api.rs:26,115)") {
    assert(ids(GetLogsFilter(pageSize = Some(1000))).size == 100)
    assert(ids(GetLogsFilter(pageSize = Some(-3))).size == 1)
  }

  test("Q-9: offset pagination page=3 skips 2 pages, page<1 treated as 1 (api.rs:177-182)") {
    val page3 = ids(GetLogsFilter(page = Some(3), pageSize = Some(10)))
    assert(page3 == (20L until 30L).toSeq)
    val page0 = ids(GetLogsFilter(page = Some(0), pageSize = Some(10)))
    assert(page0 == (0L until 10L).toSeq)
  }

  test("Q-4: topic equality never matches null topics (SQL = semantics)") {
    val got = ids(GetLogsFilter(topic1 = Some("0xt1-0"), pageSize = Some(100)))
    assert(got.nonEmpty && got.forall(i => i % 2 == 0 && i % 7 == 0))
  }

  test("Q-23: next cursor echoes the last row (api.rs:186-195)") {
    val resp = LogsQuery.run(logs, GetLogsFilter(pageSize = Some(10)))
    assert(resp.nextCursorBlock.contains(2L) && resp.nextCursorLogId.contains(9L))
    val empty = LogsQuery.run(logs, GetLogsFilter(fromBlock = Some(9999), pageSize = Some(10)))
    assert(empty.nextCursorBlock.isEmpty && empty.logs.isEmpty)
  }

  test("cursor walk == one-shot scan: no dups, no skips (api.rs:162-163)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val addr = Some(s"0xAddr${rnd.nextInt(5)}")
      val base = GetLogsFilter(contractAddress = addr, pageSize = Some(100))
      val oneShot = ids(base)
      var walked = Vector.empty[Long]
      var f = base.copy(pageSize = Some(1 + rnd.nextInt(6)),
        cursorBlock = Some(-1L), cursorLogId = Some(-1L))
      var done = false
      while (!done) {
        val page = LogsQuery.run(logs, f)
        walked ++= page.logs.map(_.getAs[Long]("id"))
        if (page.logs.length < f.pageSize.get) done = true
        else f = f.copy(cursorBlock = page.nextCursorBlock, cursorLogId = page.nextCursorLogId)
      }
      assert(walked == oneShot.toVector)
    }
  }
}
