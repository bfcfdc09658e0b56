package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CertSpec
import graft.sources.Tables

/** Registry certification for the graph (g-family) queries not already
  * literally cited by GraphSpec/SccSpec — see [[graft.CertSpec]].
  * Cross-checks rebuild the bench graph (distinct
  * (o_custkey%2000 → o_orderkey%2000) edges, self-loops dropped)
  * directly from the raw orders table. */
class GraphCertSpec extends CertSpec {
  import spark.implicits._

  private lazy val edges: Vector[(Long, Long)] =
    Tables.orders(spark, fx)
      .select((col("o_custkey") % 2000).as("src"), (col("o_orderkey") % 2000).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .as[(Long, Long)].collect().toVector
  private lazy val verts: Set[Long] = edges.flatMap(e => Seq(e._1, e._2)).toSet
  private lazy val undirected: Set[(Long, Long)] =
    edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  test("g1_degrees: per-vertex in/out degrees equal the raw edge recompute") {
    val r = rows("g1_degrees")
    assert(r.size == verts.size)
    val outD = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inD = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    r.foreach { x =>
      val id = x.getAs[Long]("id")
      assert(x.getAs[Long]("out_deg") == outD.getOrElse(id, 0L), s"id $id out")
      assert(x.getAs[Long]("in_deg") == inD.getOrElse(id, 0L), s"id $id in")
    }
  }

  test("g3_connected_components: edge endpoints agree; labels are min members") {
    val r = rows("g3_connected_components")
    val lbl = r.map(x => x.getAs[Long]("id") -> x.getAs[Long]("component")).toMap
    assert(lbl.keySet == verts)
    assert(edges.forall(e => lbl(e._1) == lbl(e._2)),
      "every edge must connect vertices of one component")
    for ((c, members) <- lbl.toSeq.groupBy(_._2))
      assert(c == members.map(_._1).min, s"component $c must be its min member id")
  }

  test("g4_triangle_counts: vertex cover and 3-divisible global count") {
    val r = rows("g4_triangle_counts")
    assert(r.map(_.getAs[Long]("id")).toSet == verts)
    val total = r.map(_.getAs[Long]("n_tri")).sum
    assert(total % 3 == 0, "each triangle is counted once per corner")
    // independent recompute: triangles = closed undirected wedges
    val adj = undirected.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val wantTotal = undirected.toSeq.map { case (a, b) =>
      adj(a).intersect(adj(b)).size.toLong
    }.sum // each triangle closes 3 of its edges → total vertex-count = that sum
    assert(total == wantTotal, s"sum of per-vertex counts $total vs $wantTotal")
  }

  test("g5_pagerank_tol: positive ranks summing to N (GraphX normalization)") {
    val r = rows("g5_pagerank_tol")
    assert(r.size == verts.size)
    assert(r.forall(_.getAs[Double]("rank") > 0))
    val s = r.map(_.getAs[Double]("rank")).sum
    assert(math.abs(s - verts.size) < 1e-6 * verts.size, s"sum $s vs N ${verts.size}")
  }

  test("g6_community_sizes: top components by size, straight from g3's labels") {
    val r = rows("g6_community_sizes")
    val want = rows("g3_connected_components")
      .groupBy(_.getAs[Long]("component")).view.mapValues(_.size.toLong)
      .toSeq.sortBy(x => (-x._2, x._1)).take(5)
    assert(r.map(x => (x.getAs[Long]("component"), x.getAs[Long]("n_members"))) == want.toVector)
  }

  test("g7_shortest_paths: five landmarks, zero self-distance, Lipschitz along edges") {
    val r = rows("g7_shortest_paths")
    val lm = r.map(_.getAs[Long]("landmark")).toSet
    assert(lm == Set(0L, 1L, 2L, 3L, 4L))
    val d = r.map(x => (x.getAs[Long]("id"), x.getAs[Long]("landmark")) ->
      x.getAs[Long]("dist")).toMap
    lm.foreach(l => assert(d((l, l)) == 0L, s"landmark $l self-distance"))
    assert(r.forall(_.getAs[Long]("dist") >= 0))
    // BFS layering: along any edge u→v, dist(u,l) <= dist(v,l) + 1 can
    // fail for directed reach, but a FINITE dist(u) with dist(v) known
    // must satisfy dist(u) <= dist(v) + 1 when the walk relaxes u from v
    for ((u, v) <- edges; l <- lm)
      (d.get((u, l)), d.get((v, l))) match {
        case (Some(du), Some(dv)) => assert(du <= dv + 1, s"edge ($u,$v) landmark $l")
        case (None, Some(dv)) => fail(s"$u should reach landmark $l via $v (dist $dv)")
        case _ => ()
      }
  }

  test("g8_label_propagation: total labeling into existing vertex ids") {
    val r = rows("g8_label_propagation")
    assert(r.map(_.getAs[Long]("id")).toSet == verts)
    assert(r.map(_.getAs[Long]("label")).toSet.subsetOf(verts))
  }

  test("g9_kcore: output equals an independent iterative-peeling recompute") {
    val r = rows("g9_kcore")
    // plain-Scala 10-core peeling over the symmetrized graph
    val sym = undirected.flatMap(e => Seq(e, e.swap))
    var live = verts
    var changed = true
    while (changed) {
      val deg = sym.toSeq.filter(e => live(e._1) && live(e._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      val next = live.filter(v => deg.getOrElse(v, 0) >= 10)
      changed = next != live
      live = next
    }
    val coreDeg = sym.toSeq.filter(e => live(e._1) && live(e._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = r.map(x => x.getAs[Long]("id") -> x.getAs[Long]("core_deg")).toMap
    assert(got == coreDeg.toMap, s"10-core mismatch: got ${got.size} vs ${coreDeg.size}")
  }

  test("g11_personalized_pagerank: seeds get the teleport floor; ranks nonnegative") {
    val r = rows("g11_personalized_pagerank")
    assert(r.size == verts.size)
    assert(r.forall(_.getAs[Double]("rank") >= 0))
    val byId = r.map(x => x.getAs[Long]("id") -> x.getAs[Double]("rank")).toMap
    Seq(0L, 1L, 2L).foreach(s =>
      assert(byId(s) >= 0.15 / 3 - 1e-9, s"seed $s must keep its teleport mass"))
    // teleport-free vertices with no in-edges score exactly 0
    val hasIn = edges.map(_._2).toSet
    verts.diff(hasIn).diff(Set(0L, 1L, 2L)).foreach(v =>
      assert(byId(v) == 0.0, s"non-seed source $v must have zero PPR"))
  }

  test("g13_item_jaccard: top-20 co-visitation Jaccard, canonical and descending") {
    val r = rows("g13_item_jaccard")
    assert(r.size <= 20 && r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("item_a") < x.getAs[Long]("item_b")))
    val js = r.map(micro(_, "jaccard"))
    assert(js == js.sortBy(-_) && js.forall(j => j > 0 && j <= 1000000))
    assert(r.forall(_.getAs[Long]("n_users") > 0))
  }

  test("g15_assortativity: edge count matches; r is a correlation in [-1, 1]") {
    val r = rows("g15_assortativity").head
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(math.abs(micro(r, "r")) <= 1000000)
  }

  test("g16_reciprocity: reciprocal-edge count equals the raw recompute") {
    val r = rows("g16_reciprocity").head
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    val es = edges.toSet
    val recip = edges.count(e => es(e.swap)).toLong
    assert(r.getAs[Long]("n_recip") == recip)
    val want = BigDecimal(recip.toDouble / edges.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).*(BigDecimal(1000000)).toLong
    assert(micro(r, "reciprocity") == want)
  }

  test("g18_degree_powerlaw: ln-ln least squares recomputes from the degree histogram") {
    val r = rows("g18_degree_powerlaw").head
    val sym = undirected.flatMap(e => Seq(e, e.swap))
    val hist = sym.toSeq.groupBy(_._1).values.map(_.size).groupBy(identity)
      .view.mapValues(_.size).toSeq
    assert(r.getAs[Long]("n_degrees") == hist.size.toLong)
    val pts = hist.map { case (deg, cnt) => (math.log(deg.toDouble), math.log(cnt.toDouble)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    def q(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(1000000)).toLong
    // ±1 micro: the recompute's summation order differs, so the last
    // ulp of the double can land on the other side of the 6-dp round
    assert(math.abs(micro(r, "slope") - q(slope)) <= 1,
      s"slope ${micro(r, "slope")} vs ${q(slope)}")
    assert(math.abs(micro(r, "intercept") - q(icept)) <= 1)
  }

  test("g19_pagerank_dangling: reference-quirk PR stays positive and mass-bounded") {
    val r = rows("g19_pagerank_dangling")
    assert(r.size == verts.size)
    assert(r.forall(_.getAs[Double]("rank") > 0))
    val s = r.map(_.getAs[Double]("rank")).sum
    // dangling mass is DROPPED by the reference quirk, so the total is
    // at most N and strictly positive
    assert(s > 0 && s <= verts.size.toDouble + 1e-6, s"sum $s")
  }

  test("g20_distance_histogram: cumulative pairs telescope; five zero-distance seeds") {
    val r = rows("g20_distance_histogram")
    assert(r.head.getAs[Long]("dist") == 0 && r.head.getAs[Long]("n_pairs") == 5)
    var run = 0L
    r.foreach { x =>
      run += x.getAs[Long]("n_pairs")
      assert(x.getAs[Long]("cum_pairs") == run)
    }
    val ds = r.map(_.getAs[Long]("dist"))
    assert(ds == ds.sorted && ds.distinct == ds)
  }

  test("g21_harmonic_centrality: bounded by landmarks reached, positive") {
    val r = rows("g21_harmonic_centrality")
    assert(r.nonEmpty)
    r.foreach { x =>
      val nr = x.getAs[Long]("n_reached")
      val h = x.getAs[Double]("harmonic")
      assert(nr >= 1 && nr <= 5)
      assert(h > 0 && h <= nr.toDouble + 1e-9,
        s"id ${x.getAs[Long]("id")}: harmonic $h vs reached $nr")
    }
  }

  test("g24_modularity: q contributions recompute from the community tallies") {
    val r = rows("g24_modularity")
    val m = undirected.size.toLong
    assert(r.map(_.getAs[Long]("deg_sum")).sum == 2 * m,
      "sum of community degree tallies must be 2m")
    assert(r.map(_.getAs[Long]("e_within")).sum <= m)
    r.foreach { x =>
      val e = x.getAs[Long]("e_within").toDouble
      val dg = x.getAs[Long]("deg_sum").toDouble
      val q = e / m - math.pow(dg / (2.0 * m), 2)
      val want = BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLong
      // ±1 micro: double expression order differs from the engine's
      assert(math.abs(micro(x, "q_contrib") - want) <= 1,
        s"community ${x.getAs[Long]("community")}")
    }
  }

  test("g26_weighted_sssp: exact Dijkstra recompute over the deterministic weights") {
    val r = rows("g26_weighted_sssp")
    // distances from v TO a landmark along edge direction = Dijkstra
    // from the landmark over the REVERSED weighted graph
    val radj = edges.map { case (s, d) => (d, (s, 1L + (3 * s + 7 * d) % 9)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = Seq(0L, 1L, 2L, 3L, 4L).filter(verts).flatMap { lm =>
      val dist = scala.collection.mutable.Map[Long, Long](lm -> 0L)
      val done = scala.collection.mutable.Set[Long]()
      val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(Ordering.by(t => -t._1))
      pq.enqueue((0L, lm))
      while (pq.nonEmpty) {
        val (d0, u) = pq.dequeue()
        if (!done(u)) {
          done += u
          for ((v, w) <- radj.getOrElse(u, Vector.empty); nd = d0 + w
               if dist.get(v).forall(nd < _)) {
            dist(v) = nd; pq.enqueue((nd, v))
          }
        }
      }
      dist.toSeq.map { case (id, d) => (id, lm, d) }
    }.toSet
    val got = r.map(x => (x.getAs[Long]("id"), x.getAs[Long]("landmark"),
      x.getAs[Long]("wdist"))).toSet
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
  }

  test("g27_betweenness: exact micro-unit Brandes recompute from the raw edges") {
    val r = rows("g27_betweenness")
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- Seq(0L, 1L, 2L, 3L, 4L) if verts(s)) {
      val dist = scala.collection.mutable.Map[Long, Int](s -> 0)
      val sigma = scala.collection.mutable.Map[Long, Long](s -> 1L)
      val byLevel = scala.collection.mutable.ArrayBuffer[Vector[Long]](Vector(s))
      var frontier = Vector(s)
      var level = 0
      while (frontier.nonEmpty) {
        level += 1
        val nextSig = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for (u <- frontier; v <- adj.getOrElse(u, Vector.empty) if !dist.contains(v))
          nextSig(v) += sigma(u)
        for ((v, sg) <- nextSig) { dist(v) = level; sigma(v) = sg }
        frontier = nextSig.keys.toVector
        if (frontier.nonEmpty) byLevel += frontier
      }
      // backward, deepest level first — the engine's exact integer
      // micro-unit HALF_UP recursion
      val delta = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (lv <- (byLevel.size - 1) to 0 by -1; v <- byLevel(lv)) {
        var dsum = 0L
        for (w <- adj.getOrElse(v, Vector.empty) if dist.get(w).contains(lv + 1))
          dsum += (2 * sigma(v) * (1000000L + delta(w)) + sigma(w)) / (2 * sigma(w))
        delta(v) = dsum
        if (v != s) bc(v) += dsum
      }
    }
    val got = r.map(x => (x.getAs[Long]("id"), micro(x, "btw"))).toMap
    assert(got.keySet == verts)
    verts.foreach { v =>
      assert(got(v) == bc(v), s"vertex $v: got ${got(v)} want ${bc(v)}")
    }
  }

  test("g28_random_walks: exact in-memory md5-walk recompute") {
    val r = rows("g28_random_walks")
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val nbrs: Map[Long, Vector[Long]] = edges.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val want = verts.toVector.flatMap { start =>
      val path = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]((start, 0, start))
      var v = start
      var t = 1
      var alive = true
      while (alive && t <= 6) {
        nbrs.get(v) match {
          case Some(ns) =>
            v = ns((h32(s"$start:$t") % ns.size).toInt)
            path += ((start, t, v)); t += 1
          case None => alive = false
        }
      }
      path
    }.toSet
    val got = r.map(x => (x.getAs[Long]("walk_id"), x.getAs[Int]("step"),
      x.getAs[Long]("v"))).toSet
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
  }

  test("g29_louvain: exact in-memory semi-synchronous greedy-modularity recompute") {
    val r = rows("g29_louvain")
    val sym: Set[(Long, Long)] = edges.flatMap(e => Seq(e, e.swap)).toSet
    val adj: Map[Long, Vector[Long]] = sym.toVector.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val deg: Map[Long, Long] = adj.view.mapValues(_.size.toLong).toMap
    val twoM = sym.size.toLong
    var lbl: Map[Long, Long] = verts.map(v => v -> v).toMap
    for (round <- 1 to 4) {
      val cdeg = lbl.toSeq.groupBy(_._2).view
        .mapValues(_.map(x => deg(x._1)).sum).toMap
      val next = verts.map { v =>
        val c0 = lbl(v)
        val evc = adj(v).groupBy(lbl).view.mapValues(_.size.toLong).toMap
        val cands = (evc.keySet + c0).toVector
        val best = cands.map { c =>
          val e = evc.getOrElse(c, 0L)
          val score = twoM * e - deg(v) * (cdeg(c) - (if (c == c0) deg(v) else 0L))
          (c, score)
        }.minBy { case (c, s) => (-s, if (c == c0) 0 else 1, c) }._1
        v -> (if (v % 2 == round % 2) best else c0)
      }.toMap
      lbl = next
    }
    val got = r.map(x => x.getAs[Long]("id") -> x.getAs[Long]("community")).toMap
    assert(got == lbl, s"first diff: ${(got.toSet -- lbl.toSet).take(3)}")
  }
}
