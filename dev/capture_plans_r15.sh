#!/bin/bash
# Capture .explain("formatted") for the r15-touched queries, before/after.
# Usage: capture_plans_r15.sh <tree-dir> <suffix>   (suffix = before|after)
set -e
TREE=$1; SUF=$2
QUERIES="q15_dedup_minhash q59_drop_near_dups q101_drop_near_dups_best \
q110_family_split q108_semantic_dedup q133_fuzzy_decontam \
q33_dedup_cosine_lsh q111_cosine_gate q90_report q118_ccnet_buckets \
q88_fluency q216_dbscan_highdim q230_dbscan_dims64 \
q224_dbscan_highdim_predict q214_dbscan_invariants q215_cc_invariants \
q156_dbscan_vec q157_dbscan_vec_predict q147_dbscan_predict q20_dbscan \
q240_sql_asof_join q245_sql_interval_auto q246_interval_join_auto \
q212_opq_recall q114_dsir_select"
mkdir -p /root/repo/plans/r15
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
    val w = new java.io.PrintWriter(s"/root/repo/plans/r15/\${n}_$SUF.txt", "UTF-8")
    try w.println(plan) finally w.close()
    println(s"[plans] wrote \$n")
  } catch { case e: Throwable => println(s"[plans] \$n FAILED: \$e") }
}
System.exit(0)
EOF
