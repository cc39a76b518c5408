package graft

import graft.operators.{KnnSearch, VectorIndex}
import java.nio.file.Files

class IvfStoreSpec extends SparkSpec {

  test("partitioned IVF store: pruned search matches the inline probe, plan prunes partitions") {
    val path = Files.createTempDirectory("ivf_store").toString
    VectorIndex.writeStore(spark, sfDir, path)

    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    val stored = VectorIndex.searchStore(spark, path, qv, k = 10, nprobe = 4)

    // the partition predicate must reach the file index, not a post-scan
    // filter: PartitionFilters lists centroid_id, and only nprobe of the
    // k=16 directories survive
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid_id"),
      s"partition filter not pushed:\n$plan")

    val inline = VectorIndex.ivfSearch(spark, sfDir, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // stored search includes vec 0 itself (the inline probe excludes the
    // query row); compare on the shared contract: same clusters, same
    // scores for the common ids
    val storedMap = stored.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val common = inline.filter { case (id, _) => storedMap.contains(id) }
    assert(common.nonEmpty)
    common.foreach { case (id, s) => assert(storedMap(id) == s) }
  }
}
