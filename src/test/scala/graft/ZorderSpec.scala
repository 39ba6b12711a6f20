package graft

import graft.queries.Analytics

/** q_zorder_layout (#26l) — the point of the interleave is the
  * per-file bounding-box guarantee: fixing the top `20 - ZFileShift`
  * key bits fixes the top 3 bits of BOTH dimensions, so no file's
  * min/max span can exceed the 128-wide tile in either dimension.
  * That bound (not any data property) is what makes min/max file
  * skipping work for predicates on either dimension.
  */
class ZorderSpec extends SparkSpec {

  private lazy val files =
    Analytics.qZorderLayout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  private val tile = 1L << (Analytics.ZBits - (20 - Analytics.ZFileShift) / 2)

  test("every file's bounding box fits the tile in BOTH dimensions") {
    assert(files.nonEmpty)
    files.foreach { case (f, _, umin, umax, tmin, tmax) =>
      assert(umax - umin < tile, s"file $f user span ${umax - umin} >= $tile")
      assert(tmax - tmin < tile, s"file $f time span ${tmax - tmin} >= $tile")
    }
  }

  test("the layout is a partition: row counts add up to the corpus") {
    val total = Tables.events(spark, sf).count()
    assert(files.map(_._2).sum === total)
  }

  test("point probes prune files on min/max stats alone") {
    // a point predicate can only touch files whose min/max range
    // covers it; with tile-bounded boxes that is a strict subset as
    // soon as the dimension's occupied range exceeds one tile. (The
    // USER dimension at sf0.001 spans only 15 buckets — below one
    // tile — so the meaningful probe at every SF is the time axis;
    // the user axis gets the same guarantee from the tile-bound test.)
    val t = files.head._5 // some occupied hour bucket
    val touched = files.count { case (_, _, _, _, tmin, tmax) => tmin <= t && t <= tmax }
    assert(touched < files.length || files.length == 1,
      s"time probe touches all ${files.length} files — no pruning")
  }
}
