#!/bin/bash
# Capture .explain("formatted") for the r14-touched queries, before/after.
# Usage: capture_plans.sh <tree-dir> <suffix>   (suffix = before|after)
set -e
TREE=$1; SUF=$2
QUERIES="q9_token_stats q10_quality q11_langid q12_fingerprint q47_repetition \
q55_chunk q61_dup_spans q88_fluency q104_chunk_media q112_remove_dup_spans \
q207_maximal_dup_spans q217_fluency3 q90_report q110_family_split \
q59_drop_near_dups q101_drop_near_dups_best q15_dedup_minhash q118_ccnet_buckets \
q20_dbscan q214_dbscan_invariants q216_dbscan_highdim q230_dbscan_dims64 \
q224_dbscan_highdim_predict q223_knn_join_invariants q215_cc_invariants"
cd $TREE
SPARK_GRAFT_CPUS=32 /opt/spark/bin/spark-shell --master "local[32]" \
  --driver-memory 16g --conf spark.sql.shuffle.partitions=32 \
  --conf spark.ui.enabled=false \
  --driver-class-path $TREE/target/scala-2.13/classes 2>/dev/null <<EOF
val names = "$QUERIES".split("\\\\s+").toSeq
val dir = "/root/testdata/sf0.1"
names.foreach { n =>
  try {
    val plan = graft.SparkEntry.queries(n)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val w = new java.io.PrintWriter(s"/root/repo/plans/r14/\${n}_$SUF.txt", "UTF-8")
    try w.println(plan) finally w.close()
    println(s"[plans] wrote \$n")
  } catch { case e: Throwable => println(s"[plans] \$n FAILED: \$e") }
}
System.exit(0)
EOF
