package graft.ingest

import graft.evm.EvmDerive.md5hex

/** Deterministic simulated EVM chain (zero-egress stand-in for the
  * reference's JSON-RPC node, `src/main.rs:96-164`): hash-linked
  * nested block envelopes with txs and receipt logs in the
  * reference's encodings (lowercase 0x-hex, decimal-string U256,
  * 0-4 topics — `src/db.rs:84-89,164-167`). A `fork` chain shares the
  * canonical prefix and diverges after the fork point, for reorg
  * tests (FIXTURES.md §2).
  */
object SimChain {

  case class SimLog(log_index_in_tx: Long, contract_address: String,
                    topic0: String, topic1: Option[String],
                    topic2: Option[String], topic3: Option[String], data: String)
  // status is Option: a missing receipt is tolerated as status=None
  // with no logs, like the reference's `Option<i64>` (`src/models.rs:43`,
  // `src/main.rs:219-221,250-253`).
  case class SimTx(tx_hash: String, tx_index_in_block: Long, from_address: String,
                   to_address: String, value: String, gas_used: String, status: Option[Long],
                   logs: Seq[SimLog])
  case class SimBlock(block_number: Long, block_hash: String, parent_hash: String,
                      timestamp: Long, transactions: Seq[SimTx])

  private def h256(s: String): String = "0x" + md5hex(s) + md5hex(s + ":2")
  private def h160(s: String): String = "0x" + md5hex(s).take(40)

  /** One block, computed directly (hash depends only on (salt, n), so
    * any reader — including a streaming source partition — can
    * materialize block n without walking the chain). */
  def blockAt(n: Long, salt: String, parentHash: String): SimBlock = {
    val hash = h256(s"$salt:$n")
    val txs = (0L until (n % 3 + 1)).map { t =>
      val logs = (0L until (t % 2 + 1)).map { l =>
        SimLog(l, h160(s"addr:${(n + t + l) % 7}"),
          "0x" + md5hex(s"sig:${l % 3}"),
          if (l % 2 == 0) Some("0x" + md5hex(s"t1:$n")) else None,
          if (n % 3 == 0) Some("0x" + md5hex(s"t2:$t")) else None,
          None,
          s"0xdata$n-$t-$l")
      }
      SimTx(h256(s"$salt:tx:$n:$t"), t, h160(s"from:${(n + t) % 5}"),
        h160(s"to:${t % 5}"), s"${n + 1}000000000000000000",
        s"${21000 + t * 100}", Some(if ((n + t) % 10 == 0) 0L else 1L), logs)
    }
    SimBlock(n, hash, parentHash, 1704067200L + n * 12, txs)
  }

  /** Block n on a chain that follows `main` until `forkAt` (exclusive)
    * and the `fork` branch after — the single-block view a simulated
    * RPC node serves. `forkAt = None` is the pure canonical chain. */
  def blockOn(n: Long, forkAt: Option[Long]): SimBlock = {
    def saltOf(h: Long): String = if (forkAt.exists(h >= _)) "fork" else "main"
    val parent =
      if (n == 0) h256("genesis-parent") else h256(s"${saltOf(n - 1)}:${n - 1}")
    blockAt(n, saltOf(n), parent)
  }

  /** Hash-linked chain segment `[from, until)` on branch `salt`.
    * Hashes chain through the parent so a divergent branch has
    * different hashes for every block after the fork — reorg
    * detection compares real links. */
  def blocks(from: Long, until: Long, salt: String = "main",
             parentOfFirst: Option[String] = None): Seq[SimBlock] = {
    var parent = parentOfFirst.getOrElse(
      if (from == 0) h256("genesis-parent") else h256(s"main:${from - 1}"))
    (from until until).map { n =>
      val b = blockAt(n, salt, parent)
      parent = b.block_hash
      b
    }
  }

  /** Canonical chain [0, n). */
  def canonical(n: Long): Seq[SimBlock] = blocks(0, n)

  /** A fork branch: shares canonical blocks `[0, forkAt)`, then
    * diverges to different hashes for `[forkAt, until)`. The first
    * fork block's parent is the canonical block at forkAt-1 (that is
    * what makes it a *reorg* rather than a gap). */
  def forked(forkAt: Long, until: Long): Seq[SimBlock] =
    blocks(forkAt, until, salt = "fork",
      parentOfFirst = Some(h256(s"main:${forkAt - 1}")))
}
