package graft.pipeline

import graft.SparkSpec
import graft.ops.{Sampling, Staged}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.reflect.io.Directory

/** The corpus sink's layout contract: directory partitioning, bounded
  * file sizes, and disjoint per-file sort-key ranges (the property that
  * makes parquet row-group min/max stats prune point/range reads). */
class CorpusSinkSpec extends SparkSpec {

  private def withTempDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-corpus-sink").toString
    try f(dir)
    finally new Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("round-trips the corpus; split dirs prune; files bounded; per-file doc_id ranges disjoint") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    val corpus = Staged.withStaged {
      Sampling.splitByHash(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    }
    withTempDir { dir =>
      CorpusSink.write(corpus, dir, maxRecordsPerFile = 20L)
      // Hive-style split dirs exist → a split=train read prunes at the
      // FileIndex (PartitionFilters), reading no val/test bytes
      val splits = new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("split=")).toSet
      assert(splits === Set("split=train", "split=val", "split=test"))
      // round-trip: exactly the same rows
      val back = spark.read.parquet(dir)
      assert(back.count() === corpus.count())
      assert(back.exceptAll(corpus).count() === 0 &&
        corpus.exceptAll(back).count() === 0)
      // partition pruning is visible in the plan
      val pruned = back.filter(col("split") === "train")
      assert(pruned.queryExecution.executedPlan.toString.contains(
        "PartitionFilters: [isnotnull(split"), pruned.queryExecution.executedPlan.toString)
      // every file respects maxRecordsPerFile, and within a split the
      // per-file doc_id ranges are disjoint (sorted write → tight,
      // non-overlapping row-group stats)
      splits.foreach { s =>
        val files = new java.io.File(s"$dir/$s").listFiles()
          .map(_.getPath).filter(_.endsWith(".parquet"))
        val ranges = files.map { f =>
          val r = spark.read.parquet(f)
            .agg(min("doc_id"), max("doc_id"), count(lit(1)))
            .as[(Long, Long, Long)].head()
          assert(r._3 <= 20L, s"$f has ${r._3} rows > maxRecordsPerFile")
          (r._1, r._2)
        }.sortBy(_._1)
        ranges.sliding(2).foreach {
          case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlapping file ranges in $s")
          case _ =>
        }
      }
    }
    corpus.unpersist()
  }

  test("compact: row-preserving layout rewrite — file count collapses, batch lineage drops, per-file sort ranges disjoint") {
    import spark.implicits._
    withTempDir { dir =>
      val delta = s"$dir/delta"
      // a month of tiny micro-batches: 40 batch dirs × ~5 rows
      (0 until 40).foreach { b =>
        (b * 5 until b * 5 + 5).map(i => (i.toLong, s"text$i", s"src${i % 3}"))
          .toDF("doc_id", "text", "source")
          .coalesce(1).write.parquet(s"$delta/batch=$b")
      }
      val before = spark.read.option("basePath", delta).parquet(s"$delta/batch=*")
      val nBefore = before.count()
      def parquetFiles(root: String) = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
      }
      assert(parquetFiles(delta).size >= 40)
      val compacted = s"$dir/compacted"
      CorpusSink.compact(spark, delta, compacted, maxRecordsPerFile = 1000L)
      val after = spark.read.parquet(compacted)
      // row-preserving by construction, lineage column dropped
      assert(after.count() === nBefore)
      assert(!after.columns.contains("batch"))
      assert(after.select("doc_id").exceptAll(before.select("doc_id")).count() === 0)
      // the small-files explosion is gone
      val files = parquetFiles(compacted)
      assert(files.size < 40 / 2, s"${files.size} files after compaction")
      // per-file doc_id ranges disjoint (the write()'s range discipline)
      val ranges = files.map { f =>
        val d = spark.read.parquet(f.getPath).agg(min("doc_id"), max("doc_id")).head
        (d.getLong(0), d.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, ranges.toString)
        case _ =>
      }
    }
  }

  test("writeZOrdered: files cover rectangles — a user-slice predicate prunes files the time-sorted layout must all read") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"))
    withTempDir { dir =>
      val zPath = s"$dir/zorder"
      val tPath = s"$dir/timesort"
      CorpusSink.writeZOrdered(ev, "us", "user_id", zPath, nFiles = 16)
      ev.repartitionByRange(16, col("us")).sortWithinPartitions("us")
        .write.parquet(tPath) // the classic single-dimension layout
      def fileStats(path: String): Seq[(Long, Long, Long, Long)] =
        new java.io.File(path).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .toSeq.map { f =>
            spark.read.parquet(f.getAbsolutePath)
              .agg(min("us"), max("us"), min("user_id"), max("user_id"))
              .as[(Long, Long, Long, Long)].collect()(0)
          }
      val (zStats, tStats) = (fileStats(zPath), fileStats(tPath))
      assert(zStats.size > 4 && tStats.size > 4, "need a real file population")
      // box: ALL of time × the middle 1/16 of the user range — the
      // "one user cohort" probe a time-sorted layout cannot skip for
      val (ulo, uhi) = ev.agg(min("user_id"), max("user_id"))
        .as[(Long, Long)].collect()(0)
      val w = (uhi - ulo + 1) / 16
      val (qlo, qhi) = (ulo + 7 * w, ulo + 8 * w)
      def touching(stats: Seq[(Long, Long, Long, Long)]): Int =
        stats.count { case (_, _, umin, umax) => umin <= qhi && umax >= qlo }
      assert(touching(tStats) === tStats.size,
        "time-sorted files all span the full user range — no skipping")
      assert(touching(zStats) < zStats.size,
        s"z-order must prune some files: ${touching(zStats)} of ${zStats.size}")
      // and the layout rewrite is row-preserving
      val back = spark.read.parquet(zPath).as[(Long, Long, Long)].collect().toSet
      assert(back === ev.as[(Long, Long, Long)].collect().toSet)
    }
  }

  test("exportJsonl: checksummed manifest matches the shards; round-trips; shard size bounded") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    withTempDir { dir =>
      val out = s"$dir/release"
      val entries = CorpusSink.exportJsonl(docs, out, maxRecordsPerFile = 64L)
      // manifest totals equal the data
      assert(entries.map(_.rows).sum === docs.count())
      assert(entries.forall(_.rows <= 64L))
      assert(entries.size > 1, "the bound must actually shard")
      // every checksum/length verifies against the bytes on disk
      entries.foreach { e =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out, e.name))
        assert(bytes.length.toLong === e.bytes, e.name)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        assert(md5 === e.md5, e.name)
        assert(bytes.count(_ == '\n') === e.rows, e.name)
      }
      // the written manifest.json agrees with the returned entries
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "manifest.json")), "UTF-8")
      assert(manifest.contains(s""""n_files":${entries.size}"""))
      assert(manifest.contains(s""""total_rows":${docs.count()}"""))
      entries.foreach(e => assert(manifest.contains(e.md5)))
      // round trip: the jsonl shards (manifest excluded by pathGlob)
      val back = spark.read.json(s"$out/part-*")
        .select("doc_id", "lang", "n_chars")
      assert(back.count() === docs.count())
      assert(back.as[(Long, String, Long)].collect().toSet ===
        docs.as[(Long, String, Long)].collect().toSet)
    }
  }

  test("writeOrc: ORC round-trip preserves rows and schema; filters push to the ORC reader") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "source", "n_chars")
    withTempDir { dir =>
      CorpusSink.writeOrc(docs, dir, partitionBy = Seq("lang"),
        maxRecordsPerFile = 50L)
      val langs = new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("lang=")).toSet
      assert(langs.nonEmpty, "Hive-style partition dirs exist")
      val back = spark.read.orc(dir)
        .select("doc_id", "lang", "source", "n_chars")
      assert(back.count() === docs.count())
      assert(back.as[(Long, String, String, Long)].collect().toSet ===
        docs.as[(Long, String, String, Long)].collect().toSet)
      // predicate pushdown reaches the ORC scan (stripe-level skipping
      // at scale); partition filter prunes the lang dirs at the index
      val p = spark.read.orc(dir)
        .filter(col("n_chars") > 100L && col("lang") === "en")
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"), p)
      assert(p.contains("PartitionFilters: [isnotnull(lang"), p)
    }
  }

  test("publish: readers resolve old-or-new through the pointer, never a mixture") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    withTempDir { dir =>
      assert(CorpusSink.current(spark, dir).isEmpty)
      val p1 = CorpusSink.publish(spark, dir)(CorpusSink.write(v1, _,
        partitionBy = Nil))
      assert(CorpusSink.current(spark, dir) === Some(p1))
      assert(spark.read.parquet(p1).count() === 2L)
      // second publish lands a NEW immutable version; the pointer flips
      val p2 = CorpusSink.publish(spark, dir)(CorpusSink.write(v2, _,
        partitionBy = Nil))
      assert(p2 !== p1)
      assert(CorpusSink.current(spark, dir) === Some(p2))
      // the old version is still intact until pruned (lagging readers)
      assert(spark.read.parquet(p1).count() === 2L)
      assert(spark.read.parquet(CorpusSink.current(spark, dir).get)
        .count() === 3L)
      // prune keeps the newest and NEVER the current's target
      val deleted = CorpusSink.prune(spark, dir, keep = 1)
      assert(deleted === Seq(p1))
      assert(CorpusSink.current(spark, dir) === Some(p2))
      assert(spark.read.parquet(p2).count() === 3L)
    }
  }

  test("publish: a crash mid-write leaves the old version readable and nothing visible") {
    import spark.implicits._
    val v1 = Seq((1L, "a")).toDF("doc_id", "text")
    withTempDir { dir =>
      val p1 = CorpusSink.publish(spark, dir)(CorpusSink.write(v1, _,
        partitionBy = Nil))
      // crashed publish: the payload writes PARTIAL output then dies
      intercept[RuntimeException] {
        CorpusSink.publish(spark, dir) { staged =>
          CorpusSink.write(v1, staged, partitionBy = Nil)
          throw new RuntimeException("simulated mid-publish crash")
        }
      }
      // the pointer still serves the old, complete version
      assert(CorpusSink.current(spark, dir) === Some(p1))
      assert(spark.read.parquet(p1).count() === 1L)
      // the orphan is invisible to readers and reclaimable
      assert(CorpusSink.cleanStaging(spark, dir) === 1)
      assert(CorpusSink.cleanStaging(spark, dir) === 0)
      // the next publish proceeds normally with a fresh version number
      val p2 = CorpusSink.publish(spark, dir)(CorpusSink.write(v1, _,
        partitionBy = Nil))
      assert(p2 !== p1)
      assert(CorpusSink.current(spark, dir) === Some(p2))
    }
  }

  test("publish: an interrupted compaction leaves the delta log untouched and the pointer on the old version") {
    import spark.implicits._
    withTempDir { delta =>
      // a delta log of three micro-batches (the streaming intake's shape)
      (0 to 2).foreach { b =>
        Seq((b * 10L, s"t$b", b.toLong)).toDF("doc_id", "text", "batch")
          .write.parquet(s"$delta/batch=$b")
      }
      withTempDir { root =>
        val p1 = CorpusSink.publish(spark, root)(
          CorpusSink.compact(spark, delta, _))
        assert(spark.read.parquet(p1).count() === 3L)
        assert(spark.read.parquet(CorpusSink.current(spark, root).get)
          .columns.toSeq === Seq("doc_id", "text"))
        // compaction dies half-way: the delta log is untouched (the
        // compactor never deletes the only copy), the pointer still
        // serves the previous compacted version
        intercept[RuntimeException] {
          CorpusSink.publish(spark, root) { staged =>
            CorpusSink.compact(spark, delta, staged)
            throw new RuntimeException("simulated compactor crash")
          }
        }
        assert(CorpusSink.current(spark, root) === Some(p1))
        assert(spark.read.option("basePath", delta)
          .parquet(s"$delta/batch=*").count() === 3L)
        CorpusSink.cleanStaging(spark, root)
        // recovery: re-run compacts the SAME delta into a new version
        val p2 = CorpusSink.publish(spark, root)(
          CorpusSink.compact(spark, delta, _))
        assert(spark.read.parquet(p2).count() === 3L)
        assert(CorpusSink.current(spark, root) === Some(p2))
      }
    }
  }

  test("publish: the jsonl release export rides the same protocol, manifest included") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    withTempDir { root =>
      var entries: Seq[CorpusSink.ShardEntry] = Nil
      val p1 = CorpusSink.publish(spark, root) { staged =>
        entries = CorpusSink.exportJsonl(docs, staged)
      }
      assert(entries.map(_.rows).sum === 3L)
      val cur = CorpusSink.current(spark, root).get
      assert(cur === p1)
      // the manifest landed INSIDE the published version
      assert(new java.io.File(
        new java.io.File(new java.net.URI(cur).getPath), "manifest.json")
        .exists() ||
        new java.io.File(cur.stripPrefix("file:"), "manifest.json").exists())
      assert(spark.read.json(s"$cur/part-*").count() === 3L)
    }
  }
}
