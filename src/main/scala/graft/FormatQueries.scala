package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.format._

/** Correctness-gate queries that exercise the TABLE FORMAT layer (SURVEY §2.1,
  * §2.8: scans with pruning, time travel, incremental reads, hidden-partition
  * pruning, metadata-only deletes, equality deletes, schema evolution,
  * snapshot metadata). Each builds a graft table in tmp from the driver's
  * parquet (idempotent, cached per sf dir) and returns a DataFrame whose
  * DuckDB oracle reads the ORIGINAL parquet — so a format bug (lost rows,
  * wrong snapshot, bad pruning) breaks the hash match.
  */
object FormatQueries {

  /** Bump when any table-building logic below changes: cached tables from
    * an older builder would otherwise silently serve stale data. */
  private val BuildVersion = "v3"

  private def tdir(dir: String, name: String): String = {
    val h = Integer.toHexString(dir.hashCode & 0x7fffffff)
    s"${sys.props("java.io.tmpdir")}/graft-tables/$BuildVersion/$h/$name"
  }

  /** Build-once cache: rebuilding per run is wasteful at bench scale. A
    * completion marker guards against reusing a partially-built table after
    * a crashed run. */
  private def withTable(s: SparkSession, dir: String, name: String)
      (build: String => GraftTable): GraftTable = synchronized {
    val loc = tdir(dir, name)
    val marker = java.nio.file.Paths.get(loc, "_build_complete")
    if (GraftTable.exists(loc) && java.nio.file.Files.exists(marker))
      GraftTable.load(s, loc)
    else {
      val dirPath = java.nio.file.Paths.get(loc)
      if (java.nio.file.Files.exists(dirPath)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      val t = build(loc)
      java.nio.file.Files.writeString(marker, "ok")
      t
    }
  }

  private def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(14, 4))

  /** Fresh location for the write-shaped bench query (q134): each
    * invocation writes a new table; the previous invocation's is deleted
    * here (and the final one at JVM exit) so bench passes never
    * accumulate copies in tmp. */
  private var lastWriteBenchDir: Option[String] = None
  private def rmTree(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
  private lazy val writeBenchCleanup: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      synchronized { lastWriteBenchDir.foreach(d =>
        try rmTree(d) catch { case scala.util.control.NonFatal(_) => }) }))
  private def freshWriteBenchDir(): String = synchronized {
    writeBenchCleanup
    lastWriteBenchDir.foreach(rmTree)
    val loc = s"${sys.props("java.io.tmpdir")}/graft-writebench/" +
      java.util.UUID.randomUUID().toString
    lastWriteBenchDir = Some(loc)
    loc
  }

  /** orders split by parity: snapshot 1 = even keys, snapshot 2 = odd keys. */
  private def ordersTwoSnapshots(s: SparkSession, dir: String): GraftTable =
    withTable(s, dir, "orders_2snap") { loc =>
      val o = s.read.parquet(s"$dir/orders.parquet")
      val t = GraftTable.recreate(s, loc, o.schema)
      GraftWrite.append(t, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
      GraftWrite.append(t, o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
      t
    }

  private def orderAgg(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("o_orderpriority"))

  private val orderAggSqlWhere =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
      |FROM orders WHERE %s GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // scan through the format: import → snapshot scan → filter + agg
    "q60_format_scan" -> ((s, dir) => {
      val t = withTable(s, dir, "lineitem_import")(loc =>
        GraftWrite.importParquet(s, loc, s"$dir/lineitem.parquet"))
      t.newScan().filter(Exprs.gtEq("l_shipdate", "1996-01-01")).toDF()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // time travel: read snapshot 1 (even order keys only)
    "q61_time_travel" -> ((s, dir) => {
      val t = ordersTwoSnapshots(s, dir)
      val first = t.snapshots.head.snapshotId
      orderAgg(t.newScan().useSnapshot(first).toDF())
    }),

    // incremental: appends in (s1, s2] = odd order keys only
    "q62_incremental" -> ((s, dir) => {
      val t = ordersTwoSnapshots(s, dir)
      val ids = t.snapshots.map(_.snapshotId)
      orderAgg(t.newScan().appendsBetween(ids.head, ids.last).toDF())
    }),

    // hidden partitioning: month(l_shipdate) partitions prune a range filter
    "q63_partition_prune" -> ((s, dir) => {
      val t = withTable(s, dir, "lineitem_bymonth") { loc =>
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        val tt = GraftTable.recreate(s, loc, li.schema, _.month("l_shipdate"))
        GraftWrite.append(tt, li.coalesce(4))
        tt
      }
      t.newScan()
        .filter(Exprs.and(Exprs.gtEq("l_shipdate", "1995-01-01"),
          Exprs.lt("l_shipdate", "1995-07-01")))
        .toDF()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // metadata-only DELETE: drop whole year partitions, no data rewrite
    "q64_metadata_delete" -> ((s, dir) => {
      val t = withTable(s, dir, "lineitem_byyear_del") { loc =>
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        val tt = GraftTable.recreate(s, loc, li.schema, _.year("l_shipdate"))
        GraftWrite.append(tt, li.coalesce(4))
        Commits.deleteByFilter(tt, Exprs.lt("l_shipdate", "1994-01-01"))
        tt
      }
      t.toDF().groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // equality deletes (v2 row-level): hide customers with negative balance
    "q65_eq_delete" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_eqdel") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.coalesce(2))
        Deletes.deleteByEquality(tt,
          c.filter(col("c_acctbal") < 0).select(col("c_custkey")))
        tt
      }
      t.toDF().groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // key-column rename ACROSS live equality deletes: the first delete set
    // is staged under the original name, the key column is then renamed
    // (metadata-only), and a second set is staged under the NEW name — one
    // scan must apply both, resolving each file's key column through its
    // staged schemaId (reading the pre-rename set by the current name
    // would null-fill and resurrect its deletes)
    "q111_rename_eq_delete" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_rendel") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.coalesce(2))
        Deletes.deleteByEquality(tt,
          c.filter(col("c_acctbal") < 0).select(col("c_custkey")))
        SchemaUpdate(GraftTable.load(s, loc))
          .renameColumn("c_custkey", "c_ckey").commit()
        Deletes.deleteByEquality(GraftTable.load(s, loc),
          c.filter(col("c_custkey") % 7 === 3)
            .select(col("c_custkey").as("c_ckey")))
        GraftTable.load(s, loc)
      }
      t.toDF().groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // key-column TYPE PROMOTION (int→long) across live equality deletes:
    // the first set is staged while the key is int (the delete file
    // physically holds int32, manifests carry 4-byte bounds), the key is
    // promoted, and a second set is staged as long — one scan applies
    // both, bucket partitioning on the promoted key stays stable (Iceberg
    // hashes int as long for exactly this reason, Bucket.java), and the
    // long-literal range filter compares against widened pre-promotion
    // bounds in pruning (reference Conversions.fromByteBuffer width
    // tolerance)
    "q112_promote_eq_delete" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_promote") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val narrow = c.withColumn("c_custkey", col("c_custkey").cast(IntegerType))
        val tt = GraftTable.recreate(s, loc, narrow.schema,
          _.bucket("c_custkey", 4))
        GraftWrite.append(tt, narrow.repartition(2))
        Deletes.deleteByEquality(tt,
          narrow.filter(col("c_acctbal") < 0).select(col("c_custkey")))
        SchemaUpdate(GraftTable.load(s, loc))
          .updateColumnType("c_custkey", LongType).commit()
        Deletes.deleteByEquality(GraftTable.load(s, loc),
          c.filter(col("c_custkey") % 7 === 3).select(col("c_custkey")))
        GraftTable.load(s, loc)
      }
      t.toDF().filter(col("c_custkey") <= lit(1000L))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // SQL DELETE polarity: `NOT IN (1, NULL)` is never TRUE in SQL, so it
    // must delete NOTHING — the null-dropping IN conversion is only
    // row-equivalent in positive position, and pre-round-16 the widened
    // NotIn truncated whole files through the strict evaluator. The
    // follow-up null-free NOT IN delete must still work, which the final
    // aggregate only reproduces if BOTH deletes behaved
    "q116_notin_null_delete" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftnin", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftnin.warehouse", tdir(dir, "ninwh"))
      withTable(s, dir, "ninwh/db/customer_nin") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.coalesce(2))
        s.sql("DELETE FROM graftnin.db.customer_nin " +
          "WHERE c_custkey NOT IN (1, NULL)")
        s.sql("DELETE FROM graftnin.db.customer_nin " +
          "WHERE c_nationkey NOT IN (0, 1, 2, 3, 4, 5, 6, 7)")
        GraftTable.load(s, loc)
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftnin.db.customer_nin GROUP BY 1 ORDER BY 1""")
    }),

    // NOT LIKE 'prefix%' delete with SQL null semantics: Not(startsWith)
    // is irreducible in the NOT rewrite (pre-fix the planner looped
    // forever on it), strict evaluation refuses bare NOT so the delete
    // routes to the row-level three-valued path, and the planted
    // NULL-segment row must SURVIVE (NOT LIKE is never TRUE on NULL)
    "q119_not_like_delete" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftnsw", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftnsw.warehouse", tdir(dir, "nswwh"))
      withTable(s, dir, "nswwh/db/customer_nsw") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        val nullRow = c.limit(1)
          .withColumn("c_custkey", lit(-1L))
          .withColumn("c_acctbal", lit(0.0))
          .withColumn("c_mktsegment", lit(null).cast("string"))
        GraftWrite.append(tt, c.coalesce(2).unionByName(nullRow))
        s.sql("DELETE FROM graftnsw.db.customer_nsw " +
          "WHERE c_mktsegment NOT LIKE 'B%'")
        GraftTable.load(s, loc)
      }
      s.sql("""SELECT COALESCE(c_mktsegment, '<null>') AS seg, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftnsw.db.customer_nsw GROUP BY 1 ORDER BY 1""")
    }),

    // metadata-only LIKE-prefix delete: truncate(1)-partitioned segments
    // are prefix-uniform, so the strict projection proves whole
    // partitions and the DELETE drops files without rewriting any data
    // (the CatalogSpec twin asserts the no-rewrite property; this gate
    // pins the RESULT against DuckDB)
    "q120_like_prefix_delete" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftlpd", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftlpd.warehouse", tdir(dir, "lpdwh"))
      withTable(s, dir, "lpdwh/db/customer_lpd") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          _.truncate("c_mktsegment", 1))
        GraftWrite.append(tt, c.coalesce(2))
        s.sql("DELETE FROM graftlpd.db.customer_lpd " +
          "WHERE c_mktsegment LIKE 'B%'")
        GraftTable.load(s, loc)
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftlpd.db.customer_lpd GROUP BY 1 ORDER BY 1""")
    }),

    // cross-spec merge-on-read: a partition-scoped equality delete
    // committed under an EVOLVED spec must survive a partition-filtered
    // copy-on-write deleteWhere whose filter summary-prunes the delete
    // manifest — partition tuples aren't comparable across specs, so the
    // delete applies conservatively to surviving old-spec files
    // (reference DeleteFileIndex.java never prunes a delete file against
    // an incomparable spec)
    "q109_cross_spec_mor" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_xspec") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          _.identity("c_mktsegment"))
        GraftWrite.append(tt, c.coalesce(2))
        Commits.updateSpec(tt)(_.identity("c_nationkey"))
        Deletes.deleteByEquality(GraftTable.load(s, loc),
          c.filter(col("c_nationkey") === 7 && col("c_custkey") % 2 === 1)
            .select(col("c_nationkey"), col("c_custkey")))
        Deletes.deleteWhere(GraftTable.load(s, loc),
          Exprs.equal("c_nationkey", 10))
        GraftTable.load(s, loc)
      }
      t.toDF().groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // merge-on-read PLANNING at scale: thousands of live global equality
    // deletes with tight disjoint key ranges over range-clustered data —
    // the per-scan interval index must keep task scoping sharp (each task
    // attaches only the delete files its key range admits, ~1/48th of the
    // set) and planning time bounded. Benched since round 14 so an
    // eq-index planning regression shows up in BENCH_r*.json, not only in
    // MetaScaleSpec asserts.
    "q110_mor_eq_planning" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftmorp", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftmorp.warehouse", tdir(dir, "morpwh"))
      withTable(s, dir, "morpwh/db/orders_mor") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.repartitionByRange(48, col("o_orderkey")))
        // force a many-file staged key set (AQE would coalesce it away);
        // range staging keeps per-file key bounds tight and disjoint, so
        // at sf0.1 this leaves ~5k live equality-delete files
        val priorCoalesce =
          s.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        val priorShuffle = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        s.conf.set("spark.sql.shuffle.partitions", "5000")
        try Deletes.deleteByEquality(tt,
          o.filter(col("o_orderkey") % 10 === 7).select(col("o_orderkey")))
        finally {
          s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", priorCoalesce)
          s.conf.set("spark.sql.shuffle.partitions", priorShuffle)
        }
        tt
      }
      // the DSv2 read path: GraftScanBuilder → per-task eq scoping through
      // the interval index → columnar MoR readers
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
               FROM graftmorp.db.orders_mor GROUP BY 1 ORDER BY 1""")
    }),

    // schema evolution: rename + added column are metadata-only
    "q66_schema_evolution" -> ((s, dir) => {
      val t = withTable(s, dir, "supplier_evolved") { loc =>
        val sup = s.read.parquet(s"$dir/supplier.parquet")
        val tt = GraftTable.recreate(s, loc, sup.schema)
        GraftWrite.append(tt, sup.coalesce(1))
        SchemaUpdate(tt).renameColumn("s_acctbal", "balance")
          .addColumn("tier", StringType).commit()
        tt
      }
      t.toDF()
        .select(col("s_suppkey"), col("balance"),
          coalesce(col("tier"), lit("none")).as("tier"))
        .orderBy(col("s_suppkey"))
    }),

    // copy-on-write DELETE WHERE (non-provable predicate → file rewrite)
    "q67_cow_delete" -> ((s, dir) => {
      val t = withTable(s, dir, "nation_cow") { loc =>
        val n = s.read.parquet(s"$dir/nation.parquet")
        val tt = GraftTable.recreate(s, loc, n.schema)
        GraftWrite.append(tt, n.coalesce(1))
        Deletes.deleteWhere(tt, Exprs.equal("n_name", "CHINA"))
        tt
      }
      t.toDF().select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }),

    // snapshot metadata table: operations + record counts are deterministic
    "q68_snapshots_meta" -> ((s, dir) => {
      val t = ordersTwoSnapshots(s, dir)
      MetaTables.snapshots(t)
        .select(col("snapshot_id"), col("operation"),
          element_at(col("summary"), "added-records").cast(LongType).as("added_records"))
        .orderBy(col("snapshot_id"))
    }),

    // rollback: table state returns to snapshot 1
    "q69_rollback" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_rollback") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
        Commits.rollbackTo(tt, tt.snapshots.head.snapshotId)
        tt
      }
      orderAgg(t.toDF())
    }),

    // dynamic partition overwrite: only touched partitions replaced
    "q71_dynamic_overwrite" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_dynover") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema, _.identity("o_orderpriority"))
        GraftWrite.append(tt, o.coalesce(2))
        // replace the 1-URGENT partition with its high-value orders only
        GraftWrite.overwriteDynamic(tt,
          o.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 1000).coalesce(1))
        tt
      }
      orderAgg(t.toDF())
    }),

    // WAP: staged snapshot invisible until cherry-picked; final = full set
    "q72_wap_publish" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_wap") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        val staged = GraftWrite.writeFiles(tt,
          o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
        val (_, stagedId) = Commits.stageAppend(tt, staged, wapId = "audit-1")
        Commits.cherrypick(tt, stagedId)
        tt
      }
      orderAgg(t.toDF())
    }),

    // branch WAP (Iceberg v2 refs; beyond the reference fork): half the
    // orders land on main, the other half commit to an "audit" branch
    // (invisible to main readers), then fast_forward publishes the branch —
    // the final main read must equal the full-table oracle
    "q92_branch_wap" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_branch") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        Commits.createBranch(tt, "audit")
        GraftWrite.appendToBranch(tt, "audit",
          o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
        require(tt.toDF().count() < o.count(),
          "branch write must stay invisible on main before the publish")
        Commits.fastForward(tt, "main",
          tt.metadata.refs("audit").snapshotId)
        tt
      }
      orderAgg(t.toDF())
    }),

    // CDC changelog through the SQL surface: two appends + an equality
    // delete, read back as INSERT/DELETE rows per commit ordinal via
    // CALL create_changelog_view — the oracle rebuilds each commit's
    // row set from the source parquet, so a changelog that misses rows,
    // re-reports dead ones, or mis-orders commits breaks the hash
    "q93_changelog" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftcdc", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcdc.warehouse", tdir(dir, "cdcwh"))
      withTable(s, dir, "cdcwh/db/orders_cdc") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
        Deletes.deleteByEquality(tt,
          o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"))
        tt
      }
      s.sql("""CALL graftcdc.system.create_changelog_view(
                 table => 'db.orders_cdc', changelog_view => 'orders_changes')""")
      s.sql("""SELECT _change_type AS change_type, _change_ordinal AS ordinal,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
               FROM orders_changes GROUP BY 1, 2 ORDER BY ordinal, change_type""")
    }),

    // metadata-only aggregates: full-table COUNT/MIN/MAX answered from
    // manifest metrics via SupportsPushDownAggregates → LocalScan (zero
    // data-file I/O; AggPushdownSpec asserts the plan is a LocalTableScan)
    "q94_agg_pushdown" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftagg", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftagg.warehouse", tdir(dir, "aggwh"))
      withTable(s, dir, "aggwh/db/lineitem_agg")(loc =>
        GraftWrite.importParquet(s, loc, s"$dir/lineitem.parquet"))
      s.sql("""SELECT COUNT(*) AS n, COUNT(l_returnflag) AS n_flag,
               MIN(l_orderkey) AS mn_key, MAX(l_orderkey) AS mx_key,
               MIN(l_shipdate) AS mn_ship, MAX(l_shipdate) AS mx_ship
               FROM graftagg.db.lineitem_agg""")
    }),

    // GROUP BY on an identity partition column folds to per-partition
    // metadata rows (AggPushdown group path — "rows per partition" without
    // touching a data file; AggPushdownSpec asserts the LocalTableScan)
    "q98_partition_agg" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftagg", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftagg.warehouse", tdir(dir, "aggwh"))
      withTable(s, dir, "aggwh/db/orders_parted") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val t = GraftTable.create(s, loc, o.schema, _.identity("o_orderpriority"))
        GraftWrite.append(t, o.repartition(2))
        t
      }
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
               MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key
               FROM graftagg.db.orders_parted
               GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // ANALYZE → committed NDV statistics (Stats.analyze, one distributed
    // HLL++ pass). Gate pins low-cardinality columns where the sketch's
    // sparse representation is exact, so DuckDB's COUNT(DISTINCT) matches.
    "q95_analyze_ndv" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftstats", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftstats.warehouse", tdir(dir, "statswh"))
      withTable(s, dir, "statswh/db/customer_stats")(loc =>
        GraftWrite.importParquet(s, loc, s"$dir/customer.parquet"))
      s.sql("""CALL graftstats.system.analyze_table(
                 table => 'db.customer_stats',
                 columns => 'c_mktsegment,c_nationkey')""")
        .select(col("column").as("col_name"), col("ndv"))
        .orderBy(col("col_name"))
    }),

    // SQL views over the ViewCatalog (GraftViews + GraftViewRules): the
    // view's stored SQL re-resolves against the graft table at read time
    "q96_sql_view" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftview", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftview.warehouse", tdir(dir, "viewwh"))
      withTable(s, dir, "viewwh/db/orders_v")(loc =>
        GraftWrite.importParquet(s, loc, s"$dir/orders.parquet"))
      s.sql("""CREATE OR REPLACE VIEW graftview.db.ord_pri AS
               SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
               FROM graftview.db.orders_v GROUP BY o_orderpriority""")
      s.sql("SELECT * FROM graftview.db.ord_pri ORDER BY o_orderpriority")
    }),

    // streaming upsert (write.upsert.enabled): epoch 1 streams every
    // customer, epoch 2 streams a re-keyed subset with bumped balances;
    // each epoch is ONE RowDelta of equality deletes + data, so the final
    // state is the DuckDB-computed post-upsert table
    "q97_streaming_upsert" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftup", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftup.warehouse", tdir(dir, "upwh"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftup.db")
      withTable(s, dir, "upwh/db/customer_upsert") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val srcLoc = tdir(dir, "upwh") + "/db/up_src"
        val src = GraftTable.recreate(s, srcLoc, c.schema)
        val sink = GraftTable.recreate(s, loc, c.schema)
        Commits.setProperties(sink, Map(
          "write.upsert.enabled" -> "true",
          "write.upsert.key-columns" -> "c_custkey"))
        val ckpt = tdir(dir, "upwh") + "/ckpt_upsert"
        def runOnce(): Unit = {
          val q = s.readStream.table("graftup.db.up_src").writeStream
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("graftup.db.customer_upsert")
          q.awaitTermination(120000)
        }
        GraftWrite.append(src, c.coalesce(2))
        runOnce()
        GraftWrite.append(src, c.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000).coalesce(1))
        runOnce()
        GraftTable.load(s, loc)
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftup.db.customer_upsert GROUP BY 1 ORDER BY 1""")
    }),

    // streaming a BRANCH identifier follows the branch's commit line: the
    // first drain is the branch head's initial load (even orders), then
    // MAIN advances (odd orders — must never surface) and the BRANCH gets
    // the urgent odds; the resumed stream must deliver exactly the branch
    // append. A stream that followed main, or re-pinned instead of
    // following the ref, breaks the hash.
    "q124_branch_stream" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftbs", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftbs.warehouse", tdir(dir, "bswh"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftbs.db")
      withTable(s, dir, "bswh/db/orders_bsink") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val srcLoc = tdir(dir, "bswh") + "/db/orders_bsrc"
        val src = GraftTable.recreate(s, srcLoc, o.schema)
        GraftTable.recreate(s, loc, o.schema)
        val ckpt = tdir(dir, "bswh") + "/ckpt_branch_stream"
        // a rebuild after a crashed partial build must not resume from the
        // previous attempt's checkpoint (offsets point at the wiped src)
        val ckptPath = java.nio.file.Paths.get(ckpt)
        if (java.nio.file.Files.exists(ckptPath)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(ckptPath).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        def runOnce(): Unit = {
          val q = s.readStream
            .table("graftbs.db.`orders_bsrc.branch_feed`").writeStream
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("graftbs.db.orders_bsink")
          // a silent timeout here would surface as an opaque hash
          // mismatch downstream (partially filled sink) — fail loudly
          if (!q.awaitTermination(120000)) {
            q.stop()
            throw new IllegalStateException(
              "q124 branch-stream drain exceeded 120s")
          }
        }
        GraftWrite.append(src, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        Commits.createBranch(src, "feed")
        runOnce() // initial load = the branch head (even orders)
        GraftWrite.append(GraftTable.load(s, srcLoc),
          o.filter(col("o_orderkey") % 2 === 1).coalesce(2)) // main only
        GraftWrite.appendToBranch(GraftTable.load(s, srcLoc), "feed",
          o.filter(col("o_orderkey") % 2 === 1 &&
            col("o_orderpriority") === "1-URGENT").coalesce(1))
        runOnce() // resume: exactly the branch append, never main's
        GraftTable.load(s, loc)
      }
      orderAgg(s.table("graftbs.db.orders_bsink"))
    }),

    // equality-delete compaction: upsert-style history (append, eq-delete,
    // append, eq-delete), then rewriteEqualityDeletes converts every live
    // eq delete into position deletes — visible rows must not move, and
    // only position deletes may remain live
    "q99_eq_delete_compaction" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_eq2pos") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.filter(col("c_custkey") % 2 === 0).coalesce(2))
        Deletes.deleteByEquality(tt,
          c.filter(col("c_acctbal") < 0 && col("c_custkey") % 2 === 0)
            .select(col("c_custkey")))
        GraftWrite.append(tt, c.filter(col("c_custkey") % 2 === 1).coalesce(2))
        Deletes.deleteByEquality(tt,
          c.filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") % 2 === 1)
            .select(col("c_custkey")))
        val res = Actions.forTable(tt).rewriteEqualityDeletes()
        require(res.rewrittenFiles == 2, s"expected 2 eq files converted: $res")
        val live = tt.newScan().planFiles().deleteFiles
        require(live.forall(_._1.content == FileContent.PositionDeletes),
          "eq deletes must be gone after conversion")
        tt
      }
      t.toDF().groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // deletion vectors (iceberg v3 / puffin): on a format-version 3 table a
    // merge-on-read DELETE writes roaring-bitmap DVs instead of parquet
    // position-delete files; scans apply them via one ranged read per data
    // file, and rewritePositionDeletes restores the one-DV-per-file invariant
    "q100_dv_delete" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftdv", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftdv.warehouse", tdir(dir, "dvwh"))
      withTable(s, dir, "dvwh/db/customer_dv") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("format-version" -> "3",
            "write.delete.mode" -> "merge-on-read"))
        GraftWrite.append(tt, c.coalesce(2))
        s.sql("DELETE FROM graftdv.db.customer_dv WHERE c_custkey % 5 = 0")
        val t2 = GraftTable.load(s, loc)
        val dels = t2.newScan().planFiles().deleteFiles.map(_._1)
        require(dels.nonEmpty && dels.forall(_.fileFormat == FileFormats.Puffin),
          "v3 merge-on-read DELETE must produce deletion vectors")
        Actions.forTable(t2).rewritePositionDeletes()
        val after = GraftTable.load(s, loc).newScan().planFiles()
          .deleteFiles.map(_._1)
        require(after.forall(_.fileFormat == FileFormats.Puffin) &&
          after.map(_.referencedDataFile).distinct.size == after.size,
          "compaction must leave one DV per data file")
        t2
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftdv.db.customer_dv GROUP BY 1 ORDER BY 1""")
    }),

    // changelog update images: a v3 merge-on-read UPDATE lands as one
    // RowDelta commit (deletion vectors + replacement rows); the changelog
    // view with identifier_columns pairs each key's DELETE+INSERT into
    // UPDATE_BEFORE/UPDATE_AFTER (iceberg compute-updates semantics)
    "q101_changelog_updates" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftcup", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftcup.warehouse", tdir(dir, "cupwh"))
      withTable(s, dir, "cupwh/db/customer_cdc") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("format-version" -> "3",
            "write.update.mode" -> "merge-on-read"))
        GraftWrite.append(tt, c.coalesce(2))
        s.sql("UPDATE graftcup.db.customer_cdc SET c_acctbal = 0.0 " +
          "WHERE c_acctbal < 0")
        val t2 = GraftTable.load(s, loc)
        require(t2.newScan().planFiles().deleteFiles
          .forall(_._1.fileFormat == FileFormats.Puffin),
          "v3 MoR UPDATE must mask old rows with deletion vectors")
        t2
      }
      s.sql("""CALL graftcup.system.create_changelog_view(
                 table => 'db.customer_cdc',
                 changelog_view => 'customer_changes',
                 identifier_columns => 'c_custkey')""")
      s.sql("""SELECT _change_type AS change_type, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM customer_changes GROUP BY 1 ORDER BY 1""")
    }),

    // changelog net_changes: over (insert evens, insert odds, delete the
    // %5 keys) the net view shows each SURVIVOR exactly once as INSERT —
    // keys born and deleted inside the range leave no trace
    "q108_net_changes" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftnet", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftnet.warehouse", tdir(dir, "netwh"))
      withTable(s, dir, "netwh/db/customer_net") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.filter(col("c_custkey") % 2 === 0).coalesce(2))
        GraftWrite.append(GraftTable.load(s, loc),
          c.filter(col("c_custkey") % 2 === 1).coalesce(2))
        s.sql("DELETE FROM graftnet.db.customer_net WHERE c_custkey % 5 = 0")
        GraftTable.load(s, loc)
      }
      s.sql("""CALL graftnet.system.create_changelog_view(
                 table => 'db.customer_net',
                 changelog_view => 'customer_net_changes',
                 net_changes => true)""")
      s.sql("""SELECT _change_type AS change_type, c_mktsegment AS seg,
               COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM customer_net_changes GROUP BY 1, 2 ORDER BY 1, 2""")
    }),

    // nested initial defaults (iceberg v3): a struct field added with a
    // default backfills old generations, and compaction MATERIALIZES the
    // value physically (the output claims the current schema)
    "q107_nested_defaults" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftnd", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftnd.warehouse", tdir(dir, "ndwh"))
      withTable(s, dir, "ndwh/db/customer_nested") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val withInfo = c.withColumn("c_info",
          struct(col("c_mktsegment").as("seg")))
        val tt = GraftTable.recreate(s, loc, withInfo.schema,
          properties = Map("format-version" -> "3"))
        GraftWrite.append(tt,
          withInfo.filter(col("c_custkey") % 2 === 0).coalesce(2))
        SchemaUpdate(GraftTable.load(s, loc))
          .addColumn("c_info.pri", StringType, initialDefault = Some("std"))
          .commit()
        val gen2 = c.filter(col("c_custkey") % 2 === 1).withColumn("c_info",
          struct(col("c_mktsegment").as("seg"), lit("plus").as("pri")))
        GraftWrite.append(GraftTable.load(s, loc), gen2.coalesce(2))
        // compaction must materialize the backfill physically
        Actions.forTable(GraftTable.load(s, loc))
          .rewriteDataFiles(minInputFiles = 1)
        GraftTable.load(s, loc)
      }
      s.sql("""SELECT c_info.pri AS pri, c_info.seg AS seg, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftnd.db.customer_nested GROUP BY 1, 2 ORDER BY 1, 2""")
    }),

    // row lineage (iceberg v3): a single sorted data file pins _row_id =
    // rank-1 deterministically; a MoR UPDATE masks old rows with DVs and
    // re-inserts them with fresh ids from the advanced next-row-id counter
    // (a contiguous range, so SUM is deterministic) at the new sequence
    "q106_row_lineage" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftlin", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftlin.warehouse", tdir(dir, "linwh"))
      withTable(s, dir, "linwh/db/customer_lineage") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("format-version" -> "3",
            "write.update.mode" -> "merge-on-read"))
        GraftWrite.append(tt, c.coalesce(1).sortWithinPartitions("c_custkey"))
        s.sql("UPDATE graftlin.db.customer_lineage SET c_acctbal = 0.0 " +
          "WHERE c_acctbal < 0")
        val t2 = GraftTable.load(s, loc)
        require(t2.metadata.nextRowId > 0, "lineage bases must be assigned")
        t2
      }
      s.sql("""SELECT
                 CASE WHEN _last_updated_sequence_number = 1
                      THEN 'original' ELSE 'updated' END AS generation,
                 COUNT(*) AS n,
                 SUM(CASE WHEN _last_updated_sequence_number = 1
                          THEN _row_id ELSE 0 END) AS orig_id_sum,
                 SUM(CASE WHEN _last_updated_sequence_number > 1
                          THEN _row_id ELSE 0 END) AS fresh_id_sum,
                 MAX(_last_updated_sequence_number) AS max_seq
               FROM graftlin.db.customer_lineage
               GROUP BY 1 ORDER BY 1""")
    }),

    // initial column defaults (iceberg v3): files predating an added
    // column read its default back — a metadata-only backfill applied by
    // the scan (constant vectors per old-generation group) and
    // materialized by compaction
    "q105_default_values" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftdef", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftdef.warehouse", tdir(dir, "defwh"))
      withTable(s, dir, "defwh/db/customer_defaults") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("format-version" -> "3"))
        GraftWrite.append(tt, c.filter(col("c_custkey") % 2 === 0).coalesce(2))
        SchemaUpdate(tt)
          .addColumn("c_tier", StringType, initialDefault = Some("basic"))
          .commit()
        GraftWrite.append(tt,
          c.filter(col("c_custkey") % 2 === 1)
            .withColumn("c_tier", lit("gold")).coalesce(2))
        tt
      }
      s.sql("""SELECT c_tier, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftdef.db.customer_defaults GROUP BY 1 ORDER BY 1""")
    }),

    // streaming sink: two epochs + a replayed epoch (dedup) = exactly-once
    "q73_streaming_epochs" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_stream") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        val even = c.filter(col("c_custkey") % 2 === 0).coalesce(2)
        val odd = c.filter(col("c_custkey") % 2 === 1).coalesce(2)
        Streaming.commitEpoch(tt, even, epochId = 0)
        Streaming.commitEpoch(tt, odd, epochId = 1)
        Streaming.commitEpoch(tt, odd, epochId = 1) // replay: must no-op
        tt
      }
      t.toDF().groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // micro-batch incremental source: per-poll batch row counts
    "q74_microbatch_source" -> ((s, dir) => {
      val t = ordersTwoSnapshots(s, dir)
      val src = Streaming.incrementalSource(t, startSnapshotId = Some(t.snapshots.head.snapshotId))
      val batch = src.nextBatch().get // snapshots after the first = odd keys
      orderAgg(batch)
    }),

    // transaction: append + delete published in ONE atomic commit
    "q75_transaction" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_txn") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema, _.identity("o_orderpriority"))
        GraftTransaction.begin(tt)
          .appendData(o.coalesce(2))
          .deleteByFilter(Exprs.equal("o_orderpriority", "1-URGENT"))
          .commit()
        tt
      }
      orderAgg(t.toDF())
    }),

    // manifest rewrite: many appends re-clustered; content unchanged
    "q76_manifest_rewrite" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_rwm") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema,
          properties = Map(Commits.ManifestMinMergeCount -> "100"))
        (0 until 4).foreach(i =>
          GraftWrite.append(tt, o.filter(col("o_orderkey") % 4 === i).coalesce(1)))
        Actions.forTable(tt).rewriteManifests()
        tt
      }
      orderAgg(t.toDF())
    }),

    // expire + orphan cleanup leave the live state intact
    "q77_expire_cleanup" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_expire") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        GraftWrite.overwriteAll(tt, o.coalesce(2)) // full reload
        GraftWrite.writeFiles(tt, o.limit(10)) // never committed → orphan
        Actions.forTable(tt).expireSnapshots(System.currentTimeMillis() + 1000)
        Actions.forTable(tt).removeOrphanFiles(System.currentTimeMillis() + 1000)
        tt
      }
      orderAgg(t.toDF())
    }),

    // DSv2 SQL surface: CREATE/INSERT/time-travel through the catalog,
    // physical scan = Spark's vectorized ParquetScan over our pruned plan
    "q78_sql_catalog" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftsql", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftsql.warehouse", tdir(dir, "sqlwh"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftsql.db")
      val marker = java.nio.file.Paths.get(tdir(dir, "sqlwh"), "_part_loaded")
      if (!java.nio.file.Files.exists(marker)) {
        s.sql("DROP TABLE IF EXISTS graftsql.db.part")
        s.sql("""CREATE TABLE graftsql.db.part
                 (p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE)
                 PARTITIONED BY (bucket(8, p_partkey))""")
        s.read.parquet(s"$dir/part.parquet")
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
          .coalesce(2).createOrReplaceTempView("part_src")
        s.sql("INSERT INTO graftsql.db.part SELECT * FROM part_src")
        java.nio.file.Files.writeString(marker, "ok")
      }
      s.sql("""SELECT p_brand, COUNT(*) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
               FROM graftsql.db.part GROUP BY p_brand ORDER BY p_brand""")
    }),

    // v2 position deletes applied inside a DSv2 SQL read: only delete-file
    // PATHS travel in the plan; executors load (file → sorted positions) and
    // filter by the row index Spark's own parquet readers generate
    "q79_pos_delete_sql" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftpos", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftpos.warehouse", tdir(dir, "poswh"))
      withTable(s, dir, "poswh/db/customer_pos") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.coalesce(2))
        // delete every 7th customer by (file, row position)
        val paths = tt.newScan().planFiles().tasks.map(_.file.path)
        val pos = s.read.parquet(paths: _*)
          .select(col("_metadata.file_path").as("file_path"),
            col("_metadata.row_index").as("pos"), col("c_custkey"))
          .filter(col("c_custkey") % 7 === 0)
          .select("file_path", "pos")
        Deletes.deletePositions(tt, pos)
        tt
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftpos.db.customer_pos GROUP BY 1 ORDER BY 1""")
    }),

    // nested schema evolution: rename/add/promote INSIDE a struct are
    // metadata-only; old and new generations align by field id at every
    // struct level (reference UpdateSchema.java:63-129 nested evolution)
    "q80_nested_evolution" -> ((s, dir) => {
      val t = withTable(s, dir, "supplier_nested") { loc =>
        val sup = s.read.parquet(s"$dir/supplier.parquet")
        val withStruct = sup.select(col("s_suppkey"),
          struct(col("s_name").as("name"), col("s_acctbal").as("bal"),
            col("s_nationkey").as("nk")).as("info"))
        val tt = GraftTable.recreate(s, loc, withStruct.schema)
        // generation 1: even supplier keys, original nested layout
        GraftWrite.append(tt, withStruct.filter(col("s_suppkey") % 2 === 0).coalesce(1))
        SchemaUpdate(tt)
          .renameColumn("info.name", "supplier_name")
          .updateColumnType("info.nk", LongType)
          .addColumn("info", "tier", StringType)
          .commit()
        // generation 2: odd keys, evolved nested layout with tier populated
        val evolved = sup.filter(col("s_suppkey") % 2 === 1)
          .select(col("s_suppkey"),
            struct(col("s_name").as("supplier_name"), col("s_acctbal").as("bal"),
              col("s_nationkey").cast(LongType).as("nk"), lit("gold").as("tier")).as("info"))
        GraftWrite.append(tt, evolved.coalesce(1))
        tt
      }
      t.toDF()
        .select(col("s_suppkey"), col("info.supplier_name").as("supplier_name"),
          dbl(col("info.bal")).as("bal"), col("info.nk").as("nk"),
          coalesce(col("info.tier"), lit("none")).as("tier"))
        .orderBy(col("s_suppkey"))
    }),

    // partitioned hive-layout import (SparkTableUtil.java:569-631): files
    // referenced in place; the partition column exists only in directory
    // names and is filled from partition tuples on read; pruning fires on
    // the imported tuples
    "q81_partitioned_import" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_imported") { loc =>
        val src = s"$loc-src"
        s.read.parquet(s"$dir/orders.parquet")
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(src)
        GraftWrite.importParquet(s, loc, src)
      }
      t.toDF()
        .where(col("o_orderpriority").isin("1-URGENT", "3-MEDIUM"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // ORC data-file source (orc/.../ORC.java): table written as ORC via
    // write.format.default; the scan rides Spark's vectorized OrcScan with
    // ORC footer stats feeding the same 3-level pruning as parquet
    "q82_orc_source" -> ((s, dir) => {
      val t = withTable(s, dir, "customer_orc") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("write.format.default" -> "orc"))
        GraftWrite.append(tt, c.filter(col("c_custkey") % 2 === 0).coalesce(2))
        GraftWrite.append(tt, c.filter(col("c_custkey") % 2 === 1).coalesce(2))
        tt
      }
      t.newScan().filter(Exprs.equal("c_mktsegment", "BUILDING")).toDF()
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_nationkey"))
    }),

    // Avro data-file source (core/.../avro/Avro.java + ProjectionDatumReader):
    // container files written and read through the Avro codec; no column
    // stats, so correctness rides projection + residual filtering
    "q83_avro_source" -> ((s, dir) => {
      val t = withTable(s, dir, "supplier_avro") { loc =>
        val sup = s.read.parquet(s"$dir/supplier.parquet")
        val tt = GraftTable.recreate(s, loc, sup.schema,
          properties = Map("write.format.default" -> "avro"))
        GraftWrite.append(tt, sup.filter(col("s_suppkey") % 2 === 0).coalesce(1))
        GraftWrite.append(tt, sup.filter(col("s_suppkey") % 2 === 1).coalesce(1))
        tt
      }
      t.newScan().filter(Exprs.gtEq("s_suppkey", 3L)).toDF()
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("s_acctbal")))).as("sum_bal"))
        .orderBy(col("s_nationkey"))
    }),

    // ORC warehouse federation (the fork's primary interop journey):
    // hive-partitioned ORC layout imported IN PLACE — files referenced,
    // never rewritten; partition column served from directory tuples;
    // ORC footer stats recorded at import
    "q84_orc_import" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_orc_imported") { loc =>
        val src = s"$loc-src"
        s.read.parquet(s"$dir/orders.parquet")
          .write.mode("overwrite").partitionBy("o_orderpriority").orc(src)
        GraftWrite.importOrc(s, loc, src)
      }
      t.toDF()
        .where(col("o_orderpriority").isin("2-HIGH", "5-LOW"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // position deletes on ORC data files (q79's twin over an ORC-backed
    // table): ORC groups targeted by a position delete read row-path with
    // a file-position counter (position deletes are format-agnostic in the
    // reference, core/.../deletes/Deletes.java:70-123). Positions are
    // computed from the written files themselves (the ORC reader streams
    // rows in file order), so the delete targets exact (file, pos) pairs.
    "q85_orc_pos_delete" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftopos", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftopos.warehouse", tdir(dir, "oposwh"))
      withTable(s, dir, "oposwh/db/customer_opos") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("write.format.default" -> "orc"))
        GraftWrite.append(tt, c.coalesce(2))
        // delete every 7th customer by (file, row position), positions read
        // back from the ORC files (one task per file, counter in file order)
        val paths = tt.newScan().planFiles().tasks.map(_.file.path)
        val kf = c.schema("c_custkey")
        val keySchema = StructType(Seq(kf))
        val sconf = new org.apache.spark.util.SerializableConfiguration(
          s.sessionState.newHadoopConf())
        val posRows = s.sparkContext.parallelize(paths, math.max(1, paths.size))
          .flatMap { p =>
            val out = Seq.newBuilder[(String, Long, Long)]
            var i = -1L
            OrcIO.readAll(p, keySchema, sconf.value) { r =>
              i += 1
              out += ((p, i, r.get(0, kf.dataType).asInstanceOf[Number].longValue))
            }
            out.result()
          }
        import s.implicits._
        val pos = posRows.toDF("file_path", "pos", "k")
          .filter(col("k") % 7 === 0).select("file_path", "pos")
        Deletes.deletePositions(tt, pos)
        tt
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftopos.db.customer_opos GROUP BY 1 ORDER BY 1""")
    }),

    // SQL MERGE INTO via SupportsRowLevelOperations (group-based
    // copy-on-write ReplaceData; beyond the reference fork, which exposes
    // only RowDelta primitives): every 20th customer deleted, every other
    // 10th gets +100 balance — the oracle recomputes the post-merge state
    "q86_merge_sql" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftmrg", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftmrg.warehouse", tdir(dir, "mrgwh"))
      withTable(s, dir, "mrgwh/db/customer_merge") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema)
        GraftWrite.append(tt, c.coalesce(4))
        c.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("k"))
          .createOrReplaceTempView("graft_merge_src")
        s.sql("""MERGE INTO graftmrg.db.customer_merge t USING graft_merge_src s
                 ON t.c_custkey = s.k
                 WHEN MATCHED AND s.k % 20 = 0 THEN DELETE
                 WHEN MATCHED THEN UPDATE SET t.c_acctbal = t.c_acctbal + 100""")
        tt
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftmrg.db.customer_merge GROUP BY 1 ORDER BY 1""")
    }),

    // merge-on-read twin of q86 (SupportsDelta → RowDelta): matched rows
    // become position deletes + change data files; the read applies them
    // on the fly. Same post-merge state, so the same oracle formulation.
    "q87_merge_mor" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftmor", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftmor.warehouse", tdir(dir, "morwh"))
      withTable(s, dir, "morwh/db/customer_mor") { loc =>
        val c = s.read.parquet(s"$dir/customer.parquet")
        val tt = GraftTable.recreate(s, loc, c.schema,
          properties = Map("write.merge.mode" -> "merge-on-read"))
        GraftWrite.append(tt, c.coalesce(4))
        c.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey").as("k"))
          .createOrReplaceTempView("graft_mor_src")
        s.sql("""MERGE INTO graftmor.db.customer_mor t USING graft_mor_src s
                 ON t.c_custkey = s.k
                 WHEN MATCHED AND s.k % 20 = 0 THEN DELETE
                 WHEN MATCHED THEN UPDATE SET t.c_acctbal = t.c_acctbal + 100""")
        tt
      }
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftmor.db.customer_mor GROUP BY 1 ORDER BY 1""")
    }),

    // partition-spec evolution (beyond reference): half the table written
    // unpartitioned, the layout evolved to identity(o_orderpriority) in
    // one metadata commit, the other half written under the new spec —
    // the filtered read must agree across both generations
    "q88_spec_evolution" -> ((s, dir) => {
      val t = withTable(s, dir, "orders_specevo") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
        Commits.updateSpec(tt)(_.identity("o_orderpriority"))
        GraftWrite.append(tt, o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
        tt
      }
      t.newScan()
        .filter(Exprs.in("o_orderpriority", Seq("1-URGENT", "4-NOT SPECIFIED")))
        .toDF()
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // SQL stored procedures (Spark 4.1 CALL + ProcedureCatalog; beyond the
    // reference, which ships the same actions as a Java-only API): snapshot
    // management round-trip, bin-pack compaction, manifest rewrite and
    // snapshot expiry all driven through `CALL graftproc.system.*`, then the
    // steady-state content must still match the plain-parquet oracle
    "q89_sql_procedures" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftproc", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftproc.warehouse", tdir(dir, "procwh"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftproc.db")
      val marker = java.nio.file.Paths.get(tdir(dir, "procwh"), "_supplier_loaded")
      if (!java.nio.file.Files.exists(marker)) {
        s.sql("DROP TABLE IF EXISTS graftproc.db.supplier")
        s.sql("""CREATE TABLE graftproc.db.supplier
                 (s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)""")
        s.read.parquet(s"$dir/supplier.parquet")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
          .coalesce(2).createOrReplaceTempView("supplier_src")
        // three append snapshots so the maintenance procedures have work
        (0 to 2).foreach(i => s.sql(
          s"INSERT INTO graftproc.db.supplier SELECT * FROM supplier_src WHERE s_suppkey % 3 = $i"))
        // snapshot management: roll back to the first append, then forward
        val snaps = s.sql(
          "SELECT snapshot_id FROM graftproc.db.`supplier$snapshots` ORDER BY committed_at, snapshot_id")
          .collect().map(_.getLong(0))
        s.sql(s"CALL graftproc.system.rollback_to_snapshot('db.supplier', ${snaps.head})")
        s.sql(s"CALL graftproc.system.set_current_snapshot('db.supplier', ${snaps.last})")
        // maintenance: 3 small files -> 1, manifest rewrite, expiry
        s.sql("CALL graftproc.system.rewrite_data_files('db.supplier')")
        s.sql("CALL graftproc.system.rewrite_manifests('db.supplier')")
        s.sql("""CALL graftproc.system.expire_snapshots(
                   table => 'db.supplier',
                   older_than => TIMESTAMP'2099-01-01 00:00:00')""")
        java.nio.file.Files.writeString(marker, "ok")
      }
      s.sql("""SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
               FROM graftproc.db.supplier GROUP BY s_nationkey ORDER BY s_nationkey""")
    }),

    // sort-clustered rewrite (beyond the reference, which has no sort-order
    // surface): interleaved appends make every file span the whole
    // l_shipdate range; rewriteSorted range-clusters on it so the date
    // filter prunes files by min/max stats alone — the 100 TB clustering
    // story, content-verified against the plain-parquet oracle
    "q90_sorted_rewrite" -> ((s, dir) => {
      val t = withTable(s, dir, "lineitem_sorted") { loc =>
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        val tt = GraftTable.recreate(s, loc, li.schema)
        GraftWrite.append(tt, li.filter(col("l_orderkey") % 2 === 0).coalesce(2))
        GraftWrite.append(tt, li.filter(col("l_orderkey") % 2 === 1).coalesce(2))
        val total = tt.newScan().planFiles().tasks.map(_.file.fileSizeInBytes).sum
        Actions.forTable(tt).rewriteSorted(Seq(("l_shipdate", true)),
          targetSizeBytes = total / 4 + 1)
        tt
      }
      t.newScan()
        .filter(Exprs.and(Exprs.gtEq("l_shipdate", "1996-01-01"),
          Exprs.lt("l_shipdate", "1996-07-01")))
        .toDF()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // z-order rewrite: Morton-interleaved clustering on (p_partkey, p_size)
    // means a range probe on EITHER column prunes files after the rewrite
    // (ZOrderSpec/MaintenanceSpec assert the banding; here the gate verifies
    // the rewritten table's content against the plain-parquet oracle)
    "q91_zorder_rewrite" -> ((s, dir) => {
      val t = withTable(s, dir, "part_zorder") { loc =>
        val p = s.read.parquet(s"$dir/part.parquet")
        val tt = GraftTable.recreate(s, loc, p.schema)
        GraftWrite.append(tt, p.filter(col("p_partkey") % 2 === 0).coalesce(2))
        GraftWrite.append(tt, p.filter(col("p_partkey") % 2 === 1).coalesce(2))
        val total = tt.newScan().planFiles().tasks.map(_.file.fileSizeInBytes).sum
        Actions.forTable(tt).rewriteZOrdered(Seq("p_partkey", "p_size"),
          targetSizeBytes = total / 4 + 1)
        tt
      }
      t.newScan()
        .filter(Exprs.and(Exprs.ltEq("p_size", 15),
          Exprs.lt("p_partkey", 500L)))
        .toDF()
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec(col("p_retailprice")))).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // row-level DML on a BRANCH identifier (public-Iceberg branch DML;
    // beyond the reference fork, which predates refs): CoW DELETE, UPDATE,
    // and a MERGE insert all commit to the branch ref; the result reads
    // BOTH heads — a commit that leaked to main, or a branch read that
    // missed a DML, breaks the hash
    "q121_branch_dml" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graftbr", "graft.connector.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftbr.warehouse", tdir(dir, "brwh"))
      withTable(s, dir, "brwh/db/orders_brdml") { loc =>
        val o = s.read.parquet(s"$dir/orders.parquet")
        val tt = GraftTable.recreate(s, loc, o.schema)
        GraftWrite.append(tt, o.coalesce(4))
        Commits.createBranch(tt, "work")
        val b = "graftbr.db.`orders_brdml.branch_work`"
        s.sql(s"DELETE FROM $b WHERE o_orderpriority = '1-URGENT'")
        s.sql(s"UPDATE $b SET o_custkey = o_custkey + 1000000 " +
          "WHERE o_orderpriority = '2-HIGH'")
        s.sql(s"""MERGE INTO $b t
          USING (SELECT * FROM graftbr.db.orders_brdml
                 WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0) src
          ON t.o_orderkey = src.o_orderkey
          WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority)
          VALUES (src.o_orderkey, -src.o_custkey, src.o_orderstatus,
            src.o_totalprice, src.o_orderdate, src.o_orderpriority)""")
        GraftTable.load(s, loc)
      }
      def agg(src: String, from: String) = s.sql(
        s"""SELECT '$src' AS src, o_orderpriority, COUNT(*) AS n,
           |CAST(SUM(o_custkey) AS BIGINT) AS sum_ck,
           |CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
           |FROM $from GROUP BY o_orderpriority""".stripMargin)
      agg("branch", "graftbr.db.`orders_brdml.branch_work`")
        .unionByName(agg("main", "graftbr.db.orders_brdml"))
        .orderBy(col("src"), col("o_orderpriority"))
    }),

    // steady-state composition: the incremental SCAN (appendsBetween)
    // feeds incremental DEDUP end-to-end — snapshot 1 is the standing
    // corpus, snapshot 2 appends the fresh increment, and the dedup's
    // fresh side IS the incremental scan's output (q113 gets the same
    // slice by filtering; this is the path a production pipeline runs)
    "q122_incremental_scan_dedup" -> ((s, dir) => {
      val t = withTable(s, dir, "documents_2snap") { loc =>
        val d = s.read.parquet(s"$dir/documents.parquet")
        val tt = GraftTable.recreate(s, loc, d.schema)
        GraftWrite.append(tt, d.filter(col("doc_id") % 10 =!= 0).coalesce(2))
        GraftWrite.append(tt, d.filter(col("doc_id") % 10 === 0).coalesce(2))
        tt
      }
      val ids = t.snapshots.map(_.snapshotId)
      val corpus = t.newScan().useSnapshot(ids.head).toDF()
      val fresh = t.newScan().appendsBetween(ids.head, ids.last).toDF()
      graft.ops.Dedup.incrementalJaccardPairs(corpus, fresh,
        n = 3, threshold = 0.5, maxDf = 0)
        .orderBy(col("a"), col("b"))
    }),

    // PERSISTED signature store: the corpus' MinHash signatures live in a
    // graft table (binary-packed, computed once), so the steady-state
    // near-dup job hashes ONLY the fresh increment and re-reads text just
    // for candidate-touched docs. Oracle = exact fresh-touching Jaccard
    // (same construction as q125, which recomputes corpus signatures per
    // run — this is the amortized variant a nightly 100 TB pipeline runs).
    "q127_signature_store" -> ((s, dir) => {
      val store = withTable(s, dir, "doc_sigs") { loc =>
        val d = s.read.parquet(s"$dir/documents.parquet")
        val sigs = graft.ops.Dedup.minhashSignatures(
          d.filter(col("doc_id") % 10 =!= 0), n = 3, bands = 32, rows = 2)
        val tt = GraftTable.recreate(s, loc, sigs.schema)
        GraftWrite.append(tt, sigs.coalesce(2))
        tt
      }
      val d = s.read.parquet(s"$dir/documents.parquet")
      // deliberately NOT using the freshSigs persist hook: measured
      // scale-dependent — at sf0.1 persisting the increment's signatures
      // saved a third (3.47 -> 2.22 s isolated), but at sf1 the SAME
      // change regressed the query 5.7 -> 8.5 s median (the larger plan
      // already reuses the fresh subtree; the cache barrier only adds
      // cost and hides stats). The 100 TB posture wins the tie.
      graft.ops.Dedup.minhashLshPairsFromStore(store.toDF(),
        d.filter(col("doc_id") % 10 === 0), d,
        n = 3, bands = 32, rows = 2, threshold = 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // PERSISTED gram store, production shape: the corpus' hashed grams
    // live in a graft table BUCKETED BY bucket[16](g), computed once — the
    // steady-state exact-Jaccard job tokenizes ONLY the increment, and the
    // touched-gram semi-join rides the storage-partitioned join (store
    // side reports bucket(16, g) KeyGroupedPartitioning through the
    // catalog; only the increment-sized probe side shuffles, into the
    // store's own buckets). Oracle = exact fresh-touching Jaccard (q113's
    // construction) — the layout must not change a single pair.
    "q128_gram_store" -> ((s, dir) => {
      withTable(s, dir, "gswh/db/doc_grams") { loc =>
        val d = s.read.parquet(s"$dir/documents.parquet")
        val grams = graft.ops.Dedup.gramStore(
          d.filter(col("doc_id") % 10 =!= 0), n = 3)
        val tt = GraftTable.recreate(s, loc, grams.schema,
          specBuild = _.bucket("g", 16))
        GraftWrite.append(tt, grams)
        tt
      }
      // the SPJ confs live on an ISOLATED session (newSession shares the
      // context and the physical tables but not SQL confs), so the rest of
      // the gate — possibly planning concurrently — never sees a scan
      // layout it didn't ask for
      val iso = s.newSession()
      iso.conf.set("spark.sql.catalog.graftgs", "graft.connector.GraftCatalog")
      iso.conf.set("spark.sql.catalog.graftgs.warehouse", tdir(dir, "gswh"))
      iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      iso.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      val d = iso.read.parquet(s"$dir/documents.parquet")
      graft.ops.Dedup.incrementalJaccardPairsFromStore(
          iso.table("graftgs.db.doc_grams"),
          d.filter(col("doc_id") % 10 === 0), n = 3, threshold = 0.5, maxDf = 0)
        .orderBy(col("a"), col("b"))
    }),

    // STEADY-STATE store maintenance cycle, two generations: the nightly
    // loop is query-increment-N → APPEND N's grams to the store →
    // query-increment-N+1 against the GROWN store. Built once (three-way
    // doc_id split: corpus = %10 ∉ {0,5}, increment A = %10 = 5,
    // increment B = %10 = 0; the A-append commits a second snapshot), and
    // replayed deterministically via snapshot time travel: generation 1
    // reads VERSION AS OF the pre-append snapshot, generation 2 reads the
    // current head — so the cached build still exercises both store
    // states. A wrong append (lost grams, double grams, bucket misplace)
    // changes generation 2's pairs and breaks the hash.
    "q133_store_maintenance" -> ((s, dir) => {
      val t = withTable(s, dir, "gmwh/db/doc_grams_cycle") { loc =>
        val d = s.read.parquet(s"$dir/documents.parquet")
        val grams0 = graft.ops.Dedup.gramStore(
          d.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5), n = 3)
        val tt = GraftTable.recreate(s, loc, grams0.schema,
          specBuild = _.bucket("g", 16))
        GraftWrite.append(tt, grams0)
        // the nightly append: increment A's grams join the store, landing
        // in the SAME bucket layout (new files, new manifests — the SPJ
        // must keep reporting KeyGroupedPartitioning afterwards)
        GraftWrite.append(tt, graft.ops.Dedup.gramStore(
          d.filter(col("doc_id") % 10 === 5), n = 3))
        GraftTable.load(s, loc)
      }
      val gen1Snap = t.snapshots.map(_.snapshotId).head
      val iso = s.newSession()
      iso.conf.set("spark.sql.catalog.graftgm", "graft.connector.GraftCatalog")
      iso.conf.set("spark.sql.catalog.graftgm.warehouse", tdir(dir, "gmwh"))
      iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      iso.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      val d = iso.read.parquet(s"$dir/documents.parquet")
      val g1 = graft.ops.Dedup.incrementalJaccardPairsFromStore(
          iso.sql(s"SELECT * FROM graftgm.db.doc_grams_cycle VERSION AS OF $gen1Snap"),
          d.filter(col("doc_id") % 10 === 5), n = 3, threshold = 0.5, maxDf = 0)
        .withColumn("gen", lit("g1"))
      val g2 = graft.ops.Dedup.incrementalJaccardPairsFromStore(
          iso.table("graftgm.db.doc_grams_cycle"),
          d.filter(col("doc_id") % 10 === 0), n = 3, threshold = 0.5, maxDf = 0)
        .withColumn("gen", lit("g2"))
      g1.unionByName(g2).orderBy(col("gen"), col("a"), col("b"))
    }),

    // write-shaped headline entry (round 20): a partitioned write of
    // events by day(ts) through the full library write path — spec-field
    // routing, task-local clustering sort, fanout writer, footer metrics,
    // atomic commit. Every invocation writes a FRESH table (the write IS
    // the measurement; withTable caching would time a no-op) and then
    // verifies itself by aggregating the read-back scan, which the oracle
    // checks against the source parquet — a routing bug that loses or
    // duplicates rows breaks the hash match.
    "q134_partitioned_write" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val loc = freshWriteBenchDir()
      val t = GraftTable.create(s, loc, ev.schema, _.day("ts"))
      GraftWrite.append(t, ev)
      GraftTable.load(s, loc).toDF()
        .agg(count(lit(1)).as("row_cnt"),
          countDistinct(to_date(col("ts"))).as("day_cnt"),
          countDistinct(col("user_id")).as("users"))
    }),

    // hash-DISTRIBUTED twin of q134 (round 20): same fresh partitioned
    // write of events by day(ts), with write.distribution-mode=hash — one
    // exchange clusters each day into a single task, so the fanout write
    // runs in parallel instead of funneling through the input's task
    // layout (a single-split input writes ALL ~366 day files from one
    // task in the q134 shape). Same self-check aggregate, same oracle:
    // the layout must not change a single row.
    "q135_distributed_write" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val loc = freshWriteBenchDir()
      val t = GraftTable.create(s, loc, ev.schema, _.day("ts"),
        properties = Map(GraftWrite.DistributionModeKey -> "hash"))
      GraftWrite.append(t, ev)
      GraftTable.load(s, loc).toDF()
        .agg(count(lit(1)).as("row_cnt"),
          countDistinct(to_date(col("ts"))).as("day_cnt"),
          countDistinct(col("user_id")).as("users"))
    }),

    // compaction preserves content (RewriteDataFilesAction)
    "q70_compaction" -> ((s, dir) => {
      val t = withTable(s, dir, "region_compacted") { loc =>
        val r = s.read.parquet(s"$dir/region.parquet")
        val tt = GraftTable.recreate(s, loc, r.schema)
        GraftWrite.append(tt, r.filter(col("r_regionkey") < 2).coalesce(1))
        GraftWrite.append(tt, r.filter(col("r_regionkey") >= 2).coalesce(1))
        Actions.forTable(tt).rewriteDataFiles(minInputFiles = 2)
        tt
      }
      t.toDF().select(col("r_regionkey"), col("r_name")).orderBy(col("r_regionkey"))
    }))

  val oracles: Map[String, String] = Map(
    // branch after DELETE('1-URGENT') + UPDATE(2-HIGH custkey+1e6) +
    // MERGE-reinsert of every third urgent order with negated custkey;
    // main must still equal the untouched source table
    "q121_branch_dml" ->
      """WITH br AS (
        |  SELECT o_orderpriority,
        |         CASE WHEN o_orderpriority = '2-HIGH'
        |              THEN o_custkey + 1000000 ELSE o_custkey END AS ck,
        |         o_totalprice
        |  FROM orders WHERE o_orderpriority <> '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderpriority, -o_custkey AS ck, o_totalprice
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0)
        |SELECT 'branch' AS src, o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(ck) AS BIGINT) AS sum_ck,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
        |FROM br GROUP BY 2
        |UNION ALL
        |SELECT 'main' AS src, o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sum_ck,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY 2
        |ORDER BY src, o_orderpriority""".stripMargin,

    // same exact-Jaccard oracle as q113: the table's two snapshots split
    // documents by doc_id % 10, so incremental-scan-fed dedup must equal
    // the filter-sliced answer
    "q122_incremental_scan_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |  AND (p.a % 10 = 0 OR p.b % 10 = 0)
        |ORDER BY a, b""".stripMargin,

    // exact fresh-touching Jaccard (q113/q125's oracle): the store path is
    // exact-verified with near-certain 32x2 recall, same as q125
    "q127_signature_store" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |  AND (p.a % 10 = 0 OR p.b % 10 = 0)
        |ORDER BY a, b""".stripMargin,

    // exact fresh-touching Jaccard again: with maxDf=0 the store path is
    // bit-identical to q113's recompute-everything answer
    "q128_gram_store" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |  AND (p.a % 10 = 0 OR p.b % 10 = 0)
        |ORDER BY a, b""".stripMargin,

    // exact Jaccard replayed per generation: g1 = pairs touching
    // increment A (%10=5) within corpus∪A (B not yet present); g2 = pairs
    // touching increment B (%10=0) over the full corpus after A's append
    "q133_store_maintenance" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2),
        |j AS (SELECT p.a, p.b,
        |        CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |      FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |      WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5)
        |SELECT 'g1' AS gen, a, b, jaccard FROM j
        |WHERE (a % 10 = 5 OR b % 10 = 5) AND a % 10 <> 0 AND b % 10 <> 0
        |UNION ALL
        |SELECT 'g2' AS gen, a, b, jaccard FROM j
        |WHERE a % 10 = 0 OR b % 10 = 0
        |ORDER BY gen, a, b""".stripMargin,

    // self-check of the partitioned write: counts survive the write +
    // read-back round trip iff no row was lost, duplicated or mis-routed
    "q134_partitioned_write" ->
      """SELECT COUNT(*) AS row_cnt,
        |COUNT(DISTINCT CAST(ts AS DATE)) AS day_cnt,
        |COUNT(DISTINCT user_id) AS users
        |FROM events""".stripMargin,

    // the distributed twin writes the same rows through the same fanout
    // path — identical self-check aggregate, identical oracle
    "q135_distributed_write" ->
      """SELECT COUNT(*) AS row_cnt,
        |COUNT(DISTINCT CAST(ts AS DATE)) AS day_cnt,
        |COUNT(DISTINCT user_id) AS users
        |FROM events""".stripMargin,

    "q60_format_scan" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q61_time_travel" -> orderAggSqlWhere.format("o_orderkey % 2 = 0"),
    "q62_incremental" -> orderAggSqlWhere.format("o_orderkey % 2 = 1"),
    "q124_branch_stream" -> orderAggSqlWhere.format(
      "o_orderkey % 2 = 0 OR (o_orderkey % 2 = 1 AND o_orderpriority = '1-URGENT')"),

    "q63_partition_prune" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q64_metadata_delete" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q65_eq_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_acctbal >= 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q99_eq_delete_compaction" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE (c_custkey % 2 = 0 AND c_acctbal >= 0)
        |   OR (c_custkey % 2 = 1 AND c_mktsegment <> 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q100_dv_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey % 5 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q110_mor_eq_planning" -> orderAggSqlWhere.format("o_orderkey % 10 <> 7"),

    "q111_rename_eq_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE c_acctbal >= 0 AND c_custkey % 7 <> 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q112_promote_eq_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE c_acctbal >= 0 AND c_custkey % 7 <> 3 AND c_custkey <= 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q120_like_prefix_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE c_mktsegment NOT LIKE 'B%'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q119_not_like_delete" ->
      """WITH t AS (SELECT c_mktsegment, c_acctbal FROM customer
        |           UNION ALL SELECT NULL, 0.0)
        |SELECT COALESCE(c_mktsegment, '<null>') AS seg, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM t
        |WHERE c_mktsegment LIKE 'B%' OR c_mktsegment IS NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q116_notin_null_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q109_cross_spec_mor" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE NOT (c_nationkey = 7 AND c_custkey % 2 = 1)
        |  AND c_nationkey <> 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q101_changelog_updates" ->
      """SELECT 'INSERT' AS change_type, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |UNION ALL
        |SELECT 'UPDATE_AFTER', COUNT(*), CAST(0 AS DOUBLE)
        |FROM customer WHERE c_acctbal < 0
        |UNION ALL
        |SELECT 'UPDATE_BEFORE', COUNT(*),
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE)
        |FROM customer WHERE c_acctbal < 0
        |ORDER BY 1""".stripMargin,

    "q108_net_changes" ->
      """SELECT 'INSERT' AS change_type, c_mktsegment AS seg, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey % 5 <> 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q107_nested_defaults" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN 'std' ELSE 'plus' END AS pri,
        |c_mktsegment AS seg, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q106_row_lineage" ->
      """WITH ranked AS (
        |  SELECT c_acctbal,
        |         row_number() OVER (ORDER BY c_custkey) - 1 AS rid
        |  FROM customer
        |), tot AS (SELECT COUNT(*) AS n_total FROM customer)
        |SELECT 'original' AS generation,
        |       COUNT(*) AS n,
        |       CAST(SUM(rid) AS BIGINT) AS orig_id_sum,
        |       CAST(0 AS BIGINT) AS fresh_id_sum,
        |       CAST(1 AS BIGINT) AS max_seq
        |FROM ranked WHERE c_acctbal >= 0
        |UNION ALL
        |SELECT 'updated',
        |       COUNT(*),
        |       CAST(0 AS BIGINT),
        |       CAST((SELECT n_total FROM tot) * COUNT(*)
        |            + COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT),
        |       CAST(2 AS BIGINT)
        |FROM ranked WHERE c_acctbal < 0
        |ORDER BY 1""".stripMargin,

    "q105_default_values" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN 'basic' ELSE 'gold' END AS c_tier,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q66_schema_evolution" ->
      """SELECT s_suppkey, s_acctbal AS balance, 'none' AS tier
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q67_cow_delete" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_name <> 'CHINA' ORDER BY n_nationkey""".stripMargin,

    "q68_snapshots_meta" ->
      """SELECT 1 AS snapshot_id, 'append' AS operation,
        |(SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS added_records
        |UNION ALL
        |SELECT 2, 'append',
        |(SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 1)
        |ORDER BY snapshot_id""".stripMargin,

    "q69_rollback" -> orderAggSqlWhere.format("o_orderkey % 2 = 0"),

    "q70_compaction" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin,

    "q71_dynamic_overwrite" -> orderAggSqlWhere.format(
      "o_orderpriority <> '1-URGENT' OR o_totalprice > 1000"),

    "q72_wap_publish" -> orderAggSqlWhere.format("1=1"),
    "q92_branch_wap" -> orderAggSqlWhere.format("1=1"),

    // commit 0 appended even keys, commit 1 odd keys, commit 2
    // equality-deleted the urgent orders — rebuild that changelog
    "q93_changelog" ->
      """SELECT * FROM (
        |  SELECT 'INSERT' AS change_type, 0 AS ordinal, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT 'INSERT', 1, COUNT(*),
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT 'DELETE', 2, COUNT(*),
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |) ORDER BY ordinal, change_type""".stripMargin,

    "q94_agg_pushdown" ->
      """SELECT COUNT(*) AS n, COUNT(l_returnflag) AS n_flag,
        |MIN(l_orderkey) AS mn_key, MAX(l_orderkey) AS mx_key,
        |MIN(l_shipdate) AS mn_ship, MAX(l_shipdate) AS mx_ship
        |FROM lineitem""".stripMargin,

    "q98_partition_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q95_analyze_ndv" ->
      """SELECT 'c_mktsegment' AS col_name,
        |COUNT(DISTINCT c_mktsegment) AS ndv FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', COUNT(DISTINCT c_nationkey) FROM customer
        |ORDER BY col_name""".stripMargin,

    "q96_sql_view" -> orderAggSqlWhere.format("1=1"),

    "q97_streaming_upsert" ->
      """WITH final AS (
        |  SELECT c_mktsegment,
        |    CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000
        |         ELSE c_acctbal END AS bal
        |  FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(bal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,

    "q73_streaming_epochs" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q74_microbatch_source" -> orderAggSqlWhere.format("o_orderkey % 2 = 1"),

    "q75_transaction" -> orderAggSqlWhere.format("o_orderpriority <> '1-URGENT'"),

    "q76_manifest_rewrite" -> orderAggSqlWhere.format("1=1"),

    "q77_expire_cleanup" -> orderAggSqlWhere.format("1=1"),

    "q91_zorder_rewrite" ->
      """SELECT p_brand, COUNT(*) AS n,
        |CAST(SUM(CAST(p_retailprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM part WHERE p_size <= 15 AND p_partkey < 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q90_sorted_rewrite" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q89_sql_procedures" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |CAST(SUM(CAST(s_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q78_sql_catalog" ->
      """SELECT p_brand, COUNT(*) AS n,
        |CAST(SUM(CAST(p_retailprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q79_pos_delete_sql" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey % 7 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q80_nested_evolution" ->
      """SELECT s_suppkey, s_name AS supplier_name,
        |CAST(s_acctbal AS DOUBLE) AS bal, CAST(s_nationkey AS BIGINT) AS nk,
        |CASE WHEN s_suppkey % 2 = 1 THEN 'gold' ELSE 'none' END AS tier
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "q81_partitioned_import" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q82_orc_source" ->
      """SELECT c_nationkey, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q83_avro_source" ->
      """SELECT s_nationkey, COUNT(*) AS n,
        |CAST(SUM(CAST(s_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM supplier WHERE s_suppkey >= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q84_orc_import" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('2-HIGH', '5-LOW')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the MERGE deleted every 20th customer and added 100 to every other
    // 10th one's balance — recompute that state directly
    "q86_merge_sql" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100
        |  ELSE c_acctbal END AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey % 20 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q88_spec_evolution" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '4-NOT SPECIFIED')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q87: merge-on-read MERGE reaches the same post-merge state as q86
    "q87_merge_mor" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100
        |  ELSE c_acctbal END AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey % 20 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // every 7th customer (by key) was position-deleted from the ORC files,
    // so the surviving set is expressible by key
    "q85_orc_pos_delete" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer WHERE c_custkey % 7 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
