package graft.mutation

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** MODEL-BASED invariant for the merge-on-read machinery: an arbitrary
  * interleaving of appends, MOR upserts, MOR deletes, POSITION DELETES
  * (deletion vectors), materializations, compactions AND COLUMN RENAMES
  * must read back exactly like a driver-side Map[key -> value] executing
  * the same operations — i.e. equality deletes, sequence scoping,
  * file-bound position tuples, dangling-delete cleanup, delete-aware
  * compaction, materialization and the physical→logical
  * rename chain are all pure REPRESENTATION, never semantics. Every
  * historical snapshot must also replay its recorded model state UNDER
  * THE COLUMN NAMES IT WAS COMMITTED WITH (time travel commutes with MOR
  * and with schema commits). Seeded RNG: failures reproduce. */
class MorPropertySpec extends AnyFunSuite with Matchers with SparkSuite {

  private def freshRoot(): String =
    graft.Scratch.dir("graft_mor_prop") + "/t"

  test("random op sequences: table state == map model, at head and in history") {
    import spark.implicits._
    val rnd = new scala.util.Random(20814)
    for (trial <- 1 to 3) {
      val root = freshRoot()
      val keySpace = 30
      // the CURRENT logical column names — renames move these
      var keyCol = "id"
      var valCol = "v"
      var nameSeq = 0
      def kv(pairs: Seq[(Long, Long)]) = pairs.toDF(keyCol, valCol)
      def randomBatch(): Seq[(Long, Long)] = {
        val n = 1 + rnd.nextInt(6)
        Seq.fill(n)(rnd.nextInt(keySpace).toLong)
          .distinct.map(k => k -> rnd.nextLong(1000000L))
      }
      def readAs(ver: Option[Long], k: String, v: String): Map[Long, Long] =
        VersionedTable.read(spark, root, ver)
          .select(F.col(k), F.col(v))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var model = Map.empty[Long, Long]
      // snapshots of (model, column names) keyed by committed version
      var history = Map.empty[Long, (Map[Long, Long], String, String)]
      val ops = scala.collection.mutable.ArrayBuffer[String]()
      // (op label, committed version) — only ops that actually committed
      val commits = scala.collection.mutable.ArrayBuffer[(String, Long)]()

      // version 0: create
      val b0 = randomBatch()
      VersionedTable.create(spark, root, kv(b0), statCols = Seq(keyCol))
      model = b0.toMap // batch keys are distinct by construction
      history += 0L -> ((model, keyCol, valCol))
      ops += "create"
      commits += (("create", 0L))

      for (_ <- 1 to 14) {
        val v = rnd.nextInt(100) match {
          case r if r < 30 => // MOR upsert
            val b = randomBatch()
            val nv = VersionedTable.morUpsert(spark, root, kv(b), Seq(keyCol))
            model = model ++ b.toMap
            ops += s"upsert(${b.map(_._1).mkString(",")})"
            Some(nv)
          case r if r < 46 => // MOR delete of a random residue class
            val mod = 2 + rnd.nextInt(4)
            val res = rnd.nextInt(mod)
            val (nv, n) = VersionedTable.morDelete(spark, root, Seq(keyCol),
              _.where(F.col(keyCol) % mod === res))
            val victims = model.keySet.filter(_ % mod == res)
            n shouldBe victims.size.toLong
            model = model -- victims
            ops += s"delete(%$mod==$res)"
            if (n > 0) Some(nv) else None
          case r if r < 58 => // POSITION delete (deletion vector) of a class
            val mod = 2 + rnd.nextInt(4)
            val res = rnd.nextInt(mod)
            val (nv, n) = VersionedTable.posDelete(spark, root,
              F.col(keyCol) % mod === res)
            // the live table carries exactly one row per model key, so
            // positions deleted == keys deleted
            val victims = model.keySet.filter(_ % mod == res)
            n shouldBe victims.size.toLong
            model = model -- victims
            ops += s"posdel(%$mod==$res)"
            if (n > 0) Some(nv) else None
          case r if r < 66 => // append fresh rows for keys NOT live (re-insert!)
            val dead = (0L until keySpace.toLong).filterNot(model.contains)
            if (dead.isEmpty) None
            else {
              val b = rnd.shuffle(dead).take(1 + rnd.nextInt(3))
                .map(k => k -> rnd.nextLong(1000000L))
              val nv = VersionedTable.append(spark, root, kv(b),
                statCols = Seq(keyCol))
              model = model ++ b.toMap
              ops += s"append(${b.map(_._1).mkString(",")})"
              Some(nv)
            }
          case r if r < 78 => // materialize the read debt
            val (nv, rw, dr) = VersionedTable.morMaterialize(
              spark, root, statCols = Seq(keyCol))
            ops += s"materialize($rw/$dr)"
            if (dr > 0) Some(nv) else None
          case r if r < 88 => // RENAME a column (metadata-only schema commit)
            nameSeq += 1
            val (from, to) =
              if (rnd.nextBoolean()) { val t = s"k$nameSeq"; val f = keyCol; keyCol = t; (f, t) }
              else { val t = s"m$nameSeq"; val f = valCol; valCol = t; (f, t) }
            val nv = VersionedTable.renameColumn(spark, root, from, to)
            ops += s"rename($from->$to)"
            Some(nv)
          case _ => // compact everything small (here: everything)
            val (nv, merged, _) = VersionedTable.compactSmall(
              spark, root, smallBytes = Long.MaxValue)
            ops += s"compact($merged)"
            if (merged > 0) Some(nv) else None
        }
        v.foreach { ver =>
          history += ver -> ((model, keyCol, valCol))
          commits += ((ops.last, ver))
        }
        // head must equal the model after EVERY op, under CURRENT names
        val head = readAs(None, keyCol, valCol)
        withClue(s"trial=$trial after ${ops.mkString(" -> ")}: ") {
          head shouldBe model
        }
      }
      // time travel: every recorded snapshot still replays its model state
      // under the names it was committed with
      history.foreach { case (ver, (m, k, vc)) =>
        val snap = readAs(Some(ver), k, vc)
        withClue(s"trial=$trial snapshot v$ver of ${ops.mkString(" -> ")}: ") {
          snap shouldBe m
        }
      }
      // changelog replay: for every window whose interior commits are all
      // DATA commits (the documented restriction — maintenance commits
      // rewrite segments, schema commits change surfaced names; neither is
      // changelog-consumable), folding the changelog onto the window's
      // start snapshot must reproduce the window's end snapshot exactly
      def isBoundary(op: String) =
        op.startsWith("materialize") || op.startsWith("compact") ||
          op.startsWith("rename") ||
          // a position-delete commit is changelog-visible only through
          // changelogRows (a plain fold has no file provenance)
          op.startsWith("posdel")
      // maximal boundary-free runs of consecutive commits
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(commits.head))
      commits.toSeq.sliding(2).foreach {
        case Seq(_, c2) =>
          if (isBoundary(c2._1))
            runs += scala.collection.mutable.ArrayBuffer(c2)
          else runs.last += c2
        case _ => ()
      }
      runs.map(_.toSeq).filter(_.length >= 2).foreach { run =>
        val (v1, v2) = (run.head._2, run.last._2)
        val cs = VersionedTable.changelog(spark, root, v1, v2)
        val (_, k2, vc2) = (history(v2)._1, history(v2)._2, history(v2)._3)
        val folded = VersionedTable.applyChangelog(
          VersionedTable.read(spark, root, Some(v1)), cs)
          .select(F.col(k2), F.col(vc2))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        withClue(s"trial=$trial changelog [$v1,$v2] of ${ops.mkString(" -> ")}: ") {
          folded shouldBe history(v2)._1
        }
      }
    }
  }
}
