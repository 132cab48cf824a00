package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multi-JVM serialization smoke (round-12 verdict ask #7): run a
  * representative query set on `local-cluster[2,2,1024]` — real
  * separate executor processes — via [[LocalClusterSmoke]] in a child
  * JVM (two SparkContexts cannot share a JVM, and the suite must not
  * stop the session every other suite shares). What this catches that
  * `local[32]` cannot: non-serializable task closures, codegen
  * expressions referencing driver-only state, Aggregator buffer
  * encoders that only work in-process, DSv2 readers holding
  * non-serializable handles. */
class LocalClusterSpec extends AnyFunSuite {

  test("representative queries run on real separate executor JVMs") {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", cp, "graft.LocalClusterSmoke", "/root/testdata/sf0.001"))
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // the standalone launcher infers the scala suffix from dev build
    // dirs when this is unset and dies with "Cannot find any build
    // directories" in a bare distribution layout
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    assert(code == 0, s"local-cluster smoke failed (exit $code); tail:\n${out.takeRight(4000)}")
    Seq("r5_dsv2_pruned", "d2_minhash_lsh", "v14_ivfsq", "md1_median",
        "k2_hll_sketch", "r20_cdx_fetch", "k10_bloom_prune",
        "r24_focal_mean", "v23_knn_graph_expand", "x45_kcore",
        "s9_stream_admit",
        "j14_spj_band_align", "r34_contour_vertices",
        "r36_contour_polylines", "d15_fuzzy_join",
        "r45_hist_equalize", "x49_scc",
        "r47_basin_outlines", "x48_exact_substr",
        "x53_exact_substr_longest", "x54_index_bucketed",
        "r50_ring_census", "x55_index_append", "x56_shared_arrays",
        "r51_ring_roles", "r52_polygon_census").foreach { n =>
      assert(out.contains(s"$n OK"), s"missing $n marker; tail:\n${out.takeRight(2000)}")
    }
    assert(out.contains("ALL OK"))
  }
}
