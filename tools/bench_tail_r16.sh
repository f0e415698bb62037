#!/bin/bash
# r16 scale-tail sweep: the 28 most expensive sf1 entries (VERDICT r15 #1)
# measured at sf1 (matched-host reference) then sf3 (second decade).
cd /root/repo
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
QL="op_dedup_embedding,op_simhash_pairs,op_dedup_semantic_auto,op_corr_spearman,op_dedup_resolve,op_dedup_groups,op_lm_score,op_dedup_jaccard,op_cdc_dedup,q25_within_group,q29_range_frame,op_pipeline_curate,op_sim_topk_ivfpq_res,op_containment_pairs,op_graph_components,op_dedup_embedding_lsh,op_textrank,op_sim_topk_ivfpq,q18_percentiles,q05_theta_join,op_cdc_chunks,op_graph_triangles,op_kcore,op_multimodal_neardup,op_minhash_est,op_dedup_minhash,op_bpe_token_count,op_simhash_pairs64,q12_limit_offset"
for sf in "$@"; do
  SPARK_GRAFT_SF_DIR=testdata-$sf SPARK_GRAFT_BENCH_ONLY="$QL" \
  SPARK_GRAFT_BENCH_OUT=bench/bench_${sf}_tail_r16b.json \
  java -Xmx8g $ADDOPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > /tmp/bench_${sf}_tail.log 2>&1
  echo "[$sf] exit $?"
done
