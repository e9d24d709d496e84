package graft.cdc

import scala.util.Random

/** Deterministic Debezium-envelope fixture generator for tests and the
  * streaming/SCD2 soak paths. The reference ships no tests (SURVEY §5);
  * these fixtures are reconstructed from its declared schemas
  * (`/root/reference/scripts/pinot_auto/data_gen_pg2.py:60-64`,
  * `connectors/connectors.yaml`) and FIXTURES.md §2.
  */
object CdcFixtures {

  final case class SaleImage(
      id: Int, productName: String, category: String, price: String,
      quantity: Int, saleDate: Int, createdAt: Long)

  final case class CdcOp(
      op: String, before: Option[SaleImage], after: Option[SaleImage],
      tsMs: Long, txId: Long, lsn: Long)

  private def imageJson(img: SaleImage): String =
    s"""{"id":${img.id},"product_name":"${img.productName}",""" +
      s""""category":"${img.category}","price":"${img.price}",""" +
      s""""quantity":${img.quantity},"sale_date":${img.saleDate},""" +
      s""""created_at":${img.createdAt}}"""

  /** Render one op as the Debezium JSON envelope (FIXTURES.md §2). */
  def toJson(e: CdcOp): String = {
    val before = e.before.map(imageJson).getOrElse("null")
    val after = e.after.map(imageJson).getOrElse("null")
    s"""{"payload":{"before":$before,"after":$after,"op":"${e.op}",""" +
      s""""ts_ms":${e.tsMs},"source":{"db":"postgres","table":"source_sales",""" +
      s""""txId":${e.txId},"lsn":${e.lsn}}}}"""
  }

  private val categories = Seq("Electronics", "Clothing", "Home", "Books", "Toys")
  private val products = Map(
    "Electronics" -> Seq("Phone", "Laptop", "Tablet"),
    "Clothing" -> Seq("Shirt", "Jacket", "Shoes"),
    "Home" -> Seq("Lamp", "Chair", "Desk"),
    "Books" -> Seq("Novel", "Manual", "Comics"),
    "Toys" -> Seq("Robot", "Puzzle", "Blocks"))

  private val baseTs = 1718000000000L // 2024-06-10T06:13:20Z

  /** Deterministic random op stream: per key a lifecycle of
    * c → (u | no-op u)* → optional d, with strictly increasing lsn and
    * millisecond-jittered ts (exercises the second-truncation ties,
    * SURVEY §7.4.5). Includes ops Debezium emits that must be filtered:
    * missing-op rows and malformed JSON are appended by [[withNoise]]. */
  def randomStream(seed: Long, nKeys: Int, nOps: Int,
                   minStepMs: Int = 100, maxStepMs: Int = 1500): Seq[CdcOp] = {
    val rnd = new Random(seed)
    var lsn = 1000L
    var tx = 500L
    var tsMs = baseTs
    val state = scala.collection.mutable.Map[Int, SaleImage]()
    val alive = scala.collection.mutable.Set[Int]()
    (0 until nOps).map { i =>
      lsn += rnd.between(1, 5)
      tx += 1
      tsMs += rnd.between(minStepMs, maxStepMs)
      val key = 1000 + rnd.nextInt(nKeys)
      def freshImage: SaleImage = {
        val cat = categories(rnd.nextInt(categories.size))
        SaleImage(key, products(cat)(rnd.nextInt(3)), cat,
          rnd.between(10, 1000).toString, rnd.between(1, 5),
          19700 + rnd.nextInt(30), tsMs * 1000)
      }
      if (!alive.contains(key)) {
        val img = freshImage
        state(key) = img; alive += key
        CdcOp("c", None, Some(img), tsMs, tx, lsn)
      } else rnd.nextInt(10) match {
        case 0 => // delete
          val img = state(key); alive -= key
          CdcOp("d", Some(img), None, tsMs, tx, lsn)
        case 1 | 2 => // no-op update: only sale_date changes → hash-invisible
          val img = state(key).copy(saleDate = 19700 + rnd.nextInt(30))
          val old = state(key); state(key) = img
          CdcOp("u", Some(old), Some(img), tsMs, tx, lsn)
        case _ => // real update
          val old = state(key)
          val img = freshImage
          state(key) = img
          CdcOp("u", Some(old), Some(img), tsMs, tx, lsn)
      }
    }
  }

  /** Append the garbage the parser must survive: envelopes without
    * `$.payload.op` (dropped) and malformed JSON (nulls out → dropped). */
  def withNoise(envelopes: Seq[String], seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val noise = Seq(
      """{"payload":{"ts_ms":1718000000000,"source":{"db":"postgres"}}}""",
      """not json at all""",
      """{"payload": 42}""",
      """{}""")
    rnd.shuffle(envelopes ++ noise)
  }
}
