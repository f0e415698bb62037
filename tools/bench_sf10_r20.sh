#!/bin/bash
# r20 THIRD-decade probe (VERDICT r19): testdata-sf10 = GenScale at 100
# copies of sf0.1 (~60M lineitem rows, 500k documents, 200k embeddings).
# Subset = the declared growers whose asymptote stories the sf1/sf3 tables
# adjudicate, plus the full r19/r20 data-mixing + incremental family —
# NOT the exact gating tiers (op_margin_align raises its 2^15/side guard
# at 100k vectors per side; op_simhash_pairs' radius-12 oracle tier and
# op_dedup_embedding's all-pairs tier are sf3-bounded by design, their
# production twins run here instead). min-of-3 per query via graft.Bench.
cd /root/repo
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
QL="op_importance_weights,op_importance_resample,op_importance_target,op_source_cap,op_pipeline_mix,op_pipeline_full,op_dedup_incremental,op_cdc_chunks,op_cdc_dedup,op_simhash_pairs64,op_margin_align_ann,op_dedup_minhash,op_dedup_resolve,q18_percentiles,q31_percentile_window,op_corr_spearman"
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_BENCH_ONLY="$QL" \
SPARK_GRAFT_BENCH_OUT=bench/bench_sf10_r20.json \
java -Xmx16g $ADDOPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  > /tmp/bench_sf10.log 2>&1
echo "[sf10] exit $?"
