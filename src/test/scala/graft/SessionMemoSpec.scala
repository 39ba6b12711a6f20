package graft

/** Contract of the session-scoped artifact memo. */
class SessionMemoSpec extends SparkSpec {

  test("builds once per key, rebuilds after invalidate, keys are independent") {
    val memo = new SessionMemo[Int]
    var builds = 0
    def build(v: Int): Int = { builds += 1; v }

    assert(memo.getOrBuild(spark, "a")(build(1)) === 1)
    assert(memo.getOrBuild(spark, "a")(build(99)) === 1) // cached, not rebuilt
    assert(builds === 1)
    assert(memo.getOrBuild(spark, "b")(build(2)) === 2)  // distinct key
    assert(builds === 2)
    memo.invalidate(spark, "a")
    assert(memo.getOrBuild(spark, "a")(build(3)) === 3)  // rebuilt after invalidate
    assert(builds === 3)
    assert(memo.getOrBuild(spark, "b")(build(99)) === 2) // other key untouched
    assert(builds === 3)
  }

  test("concurrent callers for one key build exactly once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val memo = new SessionMemo[Long]
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = Await.result(Future.sequence((1 to 8).map { _ =>
      Future {
        memo.getOrBuild(spark, "k") {
          builds.incrementAndGet()
          Thread.sleep(50)
          42L
        }
      }
    }), 30.seconds)
    assert(results.forall(_ === 42L))
    assert(builds.get() === 1)
  }
}
